"""Override-vs-default parity for ``pairwise_scores``.

The base hook reproduces the reference's tiled-user multi-negative forward
(``base_pipeline.py:602-607``); the MF/CML overrides exist purely to cut
gather/scatter op count, so their outputs must match the tiled default —
including dropout (masks drawn at the tiled shape from the same rng) and
``y_range`` rescaling — and their gradients must agree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collie_tpu.data.synthetic import generate_implicit_interactions
from collie_tpu.model import (CollaborativeMetricLearningModel,
                              MatrixFactorizationModel)
from collie_tpu.models.base import BasePipeline


@pytest.fixture(scope='module')
def train():
    return generate_implicit_interactions(num_users=60, num_items=45,
                                          num_interactions=900,
                                          num_negative_samples=6, seed=11)


def _ids(model, R=6, B=32, seed=0):
    rng = np.random.default_rng(seed)
    users = jnp.asarray(rng.integers(0, model.hparams['num_users'], B)
                        .astype(np.int32))
    items = jnp.asarray(rng.integers(0, model.hparams['num_items'], (R, B))
                        .astype(np.int32))
    return users, items


def _default_hook(model, params, users, items, training=False, rng=None):
    return BasePipeline.pairwise_scores(model, params, users, items,
                                        training=training, rng=rng)


@pytest.mark.parametrize('kwargs', [
    {},
    {'y_range': (0, 4)},
])
def test_mf_override_matches_default(train, kwargs):
    model = MatrixFactorizationModel(train=train, embedding_dim=8, seed=7,
                                     **kwargs)
    users, items = _ids(model)
    got = model.pairwise_scores(model.params, users, items)
    want = _default_hook(model, model.params, users, items)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mf_override_matches_default_under_dropout(train):
    """Dropout masks must be drawn at the tiled [R*B, d] shape from the same
    rng split, so the override equals the tiled path element-for-element."""
    model = MatrixFactorizationModel(train=train, embedding_dim=8, seed=7,
                                     dropout_p=0.35)
    users, items = _ids(model)
    rng = jax.random.PRNGKey(123)
    got = model.pairwise_scores(model.params, users, items, training=True,
                                rng=rng)
    want = _default_hook(model, model.params, users, items, training=True,
                         rng=rng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_cml_override_matches_default(train):
    model = CollaborativeMetricLearningModel(train=train, embedding_dim=8,
                                             seed=7)
    users, items = _ids(model)
    got = model.pairwise_scores(model.params, users, items)
    want = _default_hook(model, model.params, users, items)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mf_override_gradients_match_default(train):
    model = MatrixFactorizationModel(train=train, embedding_dim=8, seed=7)
    users, items = _ids(model)

    def loss_via(fn):
        def f(params):
            s = fn(model, params, users, items)
            return jnp.sum(jnp.tanh(s))
        return jax.grad(f)(model.params)

    g_override = loss_via(type(model).pairwise_scores)
    g_default = loss_via(_default_hook)
    for key in g_default:
        np.testing.assert_allclose(np.asarray(g_override[key]),
                                   np.asarray(g_default[key]),
                                   rtol=1e-5, atol=1e-6, err_msg=key)


def test_nonlinear_mf_override_matches_default(train):
    from collie_tpu.model import NonlinearMatrixFactorizationModel

    model = NonlinearMatrixFactorizationModel(
        train=train, user_embedding_dim=8, item_embedding_dim=8,
        user_dense_layers_dims=[12, 6], item_dense_layers_dims=[12, 6],
        seed=7)
    users, items = _ids(model)
    got = model.pairwise_scores(model.params, users, items)
    want = _default_hook(model, model.params, users, items)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # dropout active -> must route through the tiled default (identical by
    # construction: assert it matches the base hook with the same rng)
    model_dp = NonlinearMatrixFactorizationModel(
        train=train, user_embedding_dim=8, item_embedding_dim=8,
        user_dense_layers_dims=[12, 6], item_dense_layers_dims=[12, 6],
        dense_dropout_p=0.3, seed=7)
    rng = jax.random.PRNGKey(5)
    got_dp = model_dp.pairwise_scores(model_dp.params, users, items,
                                      training=True, rng=rng)
    want_dp = _default_hook(model_dp, model_dp.params, users, items,
                            training=True, rng=rng)
    np.testing.assert_allclose(np.asarray(got_dp), np.asarray(want_dp),
                               rtol=1e-5, atol=1e-6)


def test_cold_start_override_matches_default_both_stages(train):
    from collie_tpu.model import ColdStartModel

    buckets = np.arange(train.num_items) % 5
    model = ColdStartModel(train=train, item_buckets=buckets,
                           embedding_dim=8, seed=7)
    users, items = _ids(model)
    for stage in ('item_buckets', 'no_buckets'):
        model.set_stage(stage)
        got = model.pairwise_scores(model.params, users, items)
        want = _default_hook(model, model.params, users, items)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6, err_msg=stage)


def test_hybrid_override_matches_default_per_stage(train):
    from collie_tpu.model import HybridModel

    meta = np.random.default_rng(0).integers(0, 3, train.num_items)
    model = HybridModel(train=train, item_metadata=meta.reshape(-1, 1),
                        embedding_dim=8, seed=7,
                        item_metadata_layers_dims=[6],
                        combined_layers_dims=[8])
    users, items = _ids(model)
    got = model.pairwise_scores(model.params, users, items)
    want = _default_hook(model, model.params, users, items)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # metadata stages run the shared tile-after-gather combined-MLP path
    # (round 5) — outputs must still equal the tiled default at every stage
    for _ in ('metadata_only', 'all'):
        model.advance_stage()
        got2 = model.pairwise_scores(model.params, users, items)
        want2 = _default_hook(model, model.params, users, items)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=model.current_stage)


def test_hybrid_override_matches_default_dropout_and_user_meta(train):
    """The hybrid tile-after-gather path under BOTH metadata towers and
    dropout: masks must draw at shapes reshape-equivalent to the tiled
    [R*B, .] path from the same rng splits."""
    from collie_tpu.model import HybridModel

    rng_np = np.random.default_rng(0)
    item_meta = rng_np.normal(size=(train.num_items, 3)).astype(np.float32)
    user_meta = rng_np.normal(size=(train.num_users, 4)).astype(np.float32)
    model = HybridModel(train=train, item_metadata=item_meta,
                        user_metadata=user_meta, embedding_dim=8, seed=7,
                        item_metadata_layers_dims=[6],
                        user_metadata_layers_dims=[5],
                        combined_layers_dims=[8, 4], dropout_p=0.3)
    model.advance_stage()
    model.advance_stage()              # 'all'
    users, items = _ids(model)
    rng = jax.random.PRNGKey(5)
    got = model.pairwise_scores(model.params, users, items, training=True,
                                rng=rng)
    want = _default_hook(model, model.params, users, items, training=True,
                         rng=rng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_hybrid_override_gradients_match_default(train):
    from collie_tpu.model import HybridModel

    meta = np.random.default_rng(0).normal(size=(train.num_items, 3)
                                           ).astype(np.float32)
    model = HybridModel(train=train, item_metadata=meta, embedding_dim=8,
                        seed=7, item_metadata_layers_dims=[6],
                        combined_layers_dims=[8])
    model.advance_stage()
    model.advance_stage()
    users, items = _ids(model)

    def loss_via(fn):
        def f(params):
            s = fn(model, params, users, items)
            return jnp.sum(jnp.tanh(s))
        return jax.grad(f)(model.params)

    g_override = loss_via(type(model).pairwise_scores)
    g_default = loss_via(_default_hook)
    for key in g_default:
        np.testing.assert_allclose(np.asarray(g_override[key]),
                                   np.asarray(g_default[key]),
                                   rtol=1e-5, atol=1e-6, err_msg=key)


def test_hybrid_pretrained_override_matches_default(train):
    """Frozen and unfrozen: the tile-after-gather path must preserve the
    stop_gradient semantics AND the tiled outputs."""
    from collie_tpu.model import HybridPretrainedModel, MatrixFactorizationModel

    donor = MatrixFactorizationModel(train=train, embedding_dim=8, seed=3)
    meta = np.random.default_rng(0).normal(size=(train.num_items, 3)
                                           ).astype(np.float32)
    model = HybridPretrainedModel(train=train, item_metadata=meta,
                                  trained_model=donor,
                                  combined_layers_dims=[8], seed=7)
    users, items = _ids(model)
    for frozen in (True, False):
        model._embeddings_frozen = frozen
        got = model.pairwise_scores(model.params, users, items)
        want = _default_hook(model, model.params, users, items)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

        def f(params):
            return jnp.sum(jnp.tanh(type(model).pairwise_scores(
                model, params, users, items)))
        g = jax.grad(f)(model.params)
        emb_grad = float(jnp.abs(g['user_embeddings']).sum())
        if frozen:
            assert emb_grad == 0.0
        else:
            assert emb_grad > 0.0


@pytest.mark.parametrize('which', ['mlp_mf', 'ncf', 'deep_fm'])
def test_mlp_family_override_matches_default(train, which):
    """Tile-after-gather fast paths (MLP-MF / NCF / DeepFM): user rows are
    gathered once and tiled on-chip; the MLP runs at the tiled shape with
    the identical rng stream, so outputs equal the base hook element for
    element — including under dropout (masks drawn at the same [R*B, .]
    shapes from the same splits)."""
    from collie_tpu.model import (DeepFM, MLPMatrixFactorizationModel,
                                  NeuralCollaborativeFiltering)

    cls = {'mlp_mf': MLPMatrixFactorizationModel,
           'ncf': NeuralCollaborativeFiltering,
           'deep_fm': DeepFM}[which]
    model = cls(train=train, embedding_dim=8, seed=7)
    users, items = _ids(model)
    got = model.pairwise_scores(model.params, users, items)
    want = _default_hook(model, model.params, users, items)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    model_dp = cls(train=train, embedding_dim=8, seed=7, dropout_p=0.35)
    rng = jax.random.PRNGKey(5)
    got_dp = model_dp.pairwise_scores(model_dp.params, users, items,
                                      training=True, rng=rng)
    want_dp = _default_hook(model_dp, model_dp.params, users, items,
                            training=True, rng=rng)
    np.testing.assert_allclose(np.asarray(got_dp), np.asarray(want_dp),
                               rtol=1e-6, atol=1e-6)


def test_mlp_family_override_gradients_match_default(train):
    """Grads through the tile (sum over R) must equal the tiled path's
    scatter accumulation (float-associativity tolerance)."""
    from collie_tpu.model import MLPMatrixFactorizationModel

    model = MLPMatrixFactorizationModel(train=train, embedding_dim=8, seed=7)
    users, items = _ids(model)

    def loss_via(fn):
        def f(params):
            s = fn(model, params, users, items)
            return jnp.sum(jnp.tanh(s))
        return jax.grad(f)(model.params)

    g_override = loss_via(type(model).pairwise_scores)
    g_default = loss_via(_default_hook)
    for key in g_default:
        np.testing.assert_allclose(np.asarray(g_override[key]),
                                   np.asarray(g_default[key]),
                                   rtol=1e-5, atol=1e-6, err_msg=key)


def test_default_hook_shape_for_tower_model(train):
    """R=1 degenerates to a [1, B] row matching score()."""
    from collie_tpu.model import NeuralCollaborativeFiltering

    model = NeuralCollaborativeFiltering(train=train, embedding_dim=8, seed=7)
    users, items = _ids(model, R=1)
    got = model.pairwise_scores(model.params, users, items)
    want = model.score(model.params, users, items[0])
    assert got.shape == (1, users.shape[0])
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
