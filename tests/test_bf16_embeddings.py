"""``embeddings_dtype='bfloat16'``: half-width embedding-table storage.

TPU rationale: factorization training is gather-bandwidth-bound, and the
tables are the only large arrays — bf16 storage halves their HBM footprint
and gather traffic while every score/loss computes in float32 (lookups
upcast right after the row gather, ``ops/embeddings.py::embedding_lookup``).
The reference has no counterpart (torch MF trains fp32 end to end); measured
effect on TPU: +8%% throughput at the dim-32/batch-8192 config
(``benchmarks/profile_train.py`` ``--dtype bf16`` sweep).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from collie_tpu.data import InteractionsDataLoader
from collie_tpu.models import MatrixFactorizationModel, NeuralCollaborativeFiltering
from collie_tpu.training.trainer import CollieTrainer

from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401


@pytest.fixture()
def bf16_model(implicit_train):
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    return MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                    loss='adaptive', seed=0,
                                    embeddings_dtype='bfloat16')


def test_tables_bf16_biases_f32(bf16_model):
    assert bf16_model.params['user_embeddings'].dtype == jnp.bfloat16
    assert bf16_model.params['item_embeddings'].dtype == jnp.bfloat16
    assert bf16_model.params['user_biases'].dtype == jnp.float32
    assert bf16_model.params['item_biases'].dtype == jnp.float32


def test_scores_compute_in_f32(bf16_model):
    preds = bf16_model([0, 1, 2], [0, 1, 2])
    assert np.asarray(preds).dtype == np.float32


def test_invalid_dtype_raises(implicit_train):
    with pytest.raises(ValueError, match='embeddings_dtype'):
        MatrixFactorizationModel(train=implicit_train, embedding_dim=8,
                                 embeddings_dtype='float16')


def test_bf16_training_decreases_loss_and_keeps_dtype(bf16_model):
    losses = []

    class Recorder:
        def log_metrics(self, metrics, step):
            if 'train_loss_epoch' in metrics:
                losses.append(metrics['train_loss_epoch'])

    trainer = CollieTrainer(bf16_model, max_epochs=4, verbosity=0,
                            logger=Recorder(), seed=0)
    trainer.fit(bf16_model)
    assert losses[-1] < losses[0]
    assert bf16_model.params['user_embeddings'].dtype == jnp.bfloat16
    assert np.isfinite(losses).all()


def test_bf16_excluded_from_fused_epoch_kernel(bf16_model, monkeypatch):
    """The Mosaic epoch kernel's envelope is f32; bf16 configs silently take
    the XLA scan path."""
    from collie_tpu.training.scan_engine import _fused_epoch_config

    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '1')
    specs = bf16_model.optimizer_specs()
    active = [True] * len(specs)
    assert _fused_epoch_config(bf16_model, specs, active,
                               bf16_model.train_loader, None) is None


def test_bf16_save_load_roundtrip(bf16_model, tmp_path):
    """npz has no bfloat16: tables round-trip through a lossless f32 upcast
    and load re-applies hparams['embeddings_dtype']."""
    CollieTrainer(bf16_model, max_epochs=1, verbosity=0, seed=0).fit(bf16_model)
    path = str(tmp_path / 'bf16.npz')
    bf16_model.save_model(path)
    loaded = MatrixFactorizationModel(load_model_path=path)
    assert loaded.params['user_embeddings'].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(bf16_model([0, 1], [2, 3])), np.asarray(loaded([0, 1], [2, 3])))


def test_bf16_checkpoint_resume(bf16_model, tmp_path):
    trainer = CollieTrainer(bf16_model, max_epochs=2, verbosity=0, seed=0,
                            checkpoint_dir=str(tmp_path))
    trainer.fit(bf16_model)
    ckpts = sorted(tmp_path.glob('checkpoint_epoch_*.pkl'))
    assert ckpts

    fresh = MatrixFactorizationModel(train=bf16_model.train_loader,
                                     embedding_dim=8, lr=1e-1, loss='adaptive',
                                     seed=0, embeddings_dtype='bfloat16')
    t2 = CollieTrainer(fresh, max_epochs=3, verbosity=0, seed=0)
    t2.resume_from_checkpoint(ckpts[-1])
    t2.fit(fresh)
    assert fresh.hparams['num_epochs_completed'] == 3
    assert fresh.params['user_embeddings'].dtype == jnp.bfloat16


def test_bf16_similarity_and_retrieval(bf16_model):
    from collie_tpu.retrieval import recommend

    CollieTrainer(bf16_model, max_epochs=1, verbosity=0, seed=0).fit(bf16_model)
    sims = bf16_model.item_item_similarity(0)
    assert np.isfinite(sims.to_numpy()).all()
    ids, scores = recommend(bf16_model, [0, 1, 2], k=5)
    assert ids.shape == (3, 5)
    assert np.isfinite(np.asarray(scores)).all()


def test_bf16_evaluation(bf16_model, implicit_sets):
    from collie_tpu.evaluate import evaluate_in_batches
    from collie_tpu.ops import mapk

    CollieTrainer(bf16_model, max_epochs=1, verbosity=0, seed=0).fit(bf16_model)
    score = evaluate_in_batches([mapk], implicit_sets[1], bf16_model,
                                verbose=False)
    assert 0.0 <= float(score) <= 1.0


def test_bf16_non_mf_model_trains(implicit_train):
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    model = NeuralCollaborativeFiltering(train=loader, embedding_dim=8,
                                         lr=1e-2, seed=0,
                                         embeddings_dtype='bfloat16')
    # both embedding-table families cast; MLP tower weights stay f32
    assert model.params['user_embeddings_cf'].dtype == jnp.bfloat16
    assert model.params['user_embeddings_mlp'].dtype == jnp.bfloat16
    assert model.params['mlp_0_weight'].dtype == jnp.float32
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    assert model.params['user_embeddings_cf'].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(model([0, 1], [2, 3]))).all()


def test_bf16_sharded_lookup_upcasts(implicit_train):
    import jax

    from collie_tpu.parallel import make_mesh, shard_table, sharded_embedding_lookup

    if len(jax.devices()) < 2:
        pytest.skip('needs the 8-virtual-device CPU mesh')
    mesh = make_mesh(model=2)
    table = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4) \
        .astype(jnp.bfloat16)
    ids = jnp.array([0, 5, 9, 15, 1, 7, 12, 3])  # divisible by the data axis
    out = sharded_embedding_lookup(shard_table(table, mesh), ids, mesh)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table[ids], dtype=np.float32))


def test_custom_factory_gets_f32_moments(implicit_train):
    """A callable optimizer factory is wrapped in the f32-math shim too: bf16
    params must not give it bf16 Adam moments (the measured -8%-MAP failure
    mode the shim exists to prevent)."""
    import jax
    import optax

    from collie_tpu.training.optimizers import build_transform

    tx = build_transform(lambda learning_rate, **kw: optax.adam(learning_rate),
                         lr=0.1)
    params = {'user_embeddings': jnp.zeros((4, 2), jnp.bfloat16),
              'user_biases': jnp.zeros((4,), jnp.float32)}
    state = tx.init(params)
    mu = jax.tree_util.tree_leaves(state)
    adam_mu = [x for x in mu if hasattr(x, 'shape') and x.shape == (4, 2)]
    assert adam_mu and all(x.dtype == jnp.float32 for x in adam_mu)
    # and the returned update matches the param storage dtype
    grads = {'user_embeddings': jnp.ones((4, 2), jnp.bfloat16),
             'user_biases': jnp.ones((4,), jnp.float32)}
    updates, _ = tx.update(grads, state, params)
    assert updates['user_embeddings'].dtype == jnp.bfloat16


def test_sharded_lookup_backward_accumulates_f32(implicit_train):
    """Row-collision gradients through ``sharded_embedding_lookup`` accumulate
    at f32 and round to storage dtype once — 256 colliding contributions of
    2e-3 must sum to ~0.512, not decay-to-noise as naive bf16 accumulation
    would."""
    import jax

    from collie_tpu.parallel import make_mesh, shard_table, sharded_embedding_lookup

    if len(jax.devices()) < 2:
        pytest.skip('needs the 8-virtual-device CPU mesh')
    mesh = make_mesh(model=2)
    table = jnp.zeros((8, 4), jnp.bfloat16)
    ids = jnp.zeros((256,), jnp.int32)  # every lookup hits row 0

    def loss(t):
        return (sharded_embedding_lookup(t, ids, mesh) * 2e-3).sum()

    grad = jax.grad(loss)(shard_table(table, mesh))
    assert grad.dtype == jnp.bfloat16
    expected = np.float32(256 * 2e-3 * 4 / 4)  # per-element: 256 * 2e-3
    np.testing.assert_allclose(np.asarray(grad[0], dtype=np.float32),
                               np.full(4, 256 * 2e-3, np.float32), rtol=0.01)


def test_bucket_similarity_f32_under_bf16(implicit_train):
    from collie_tpu.models import ColdStartModel

    buckets = np.zeros(implicit_train.num_items, dtype=int)
    m = ColdStartModel(train=implicit_train, item_buckets=buckets,
                       embedding_dim=8, embeddings_dtype='bfloat16', seed=0)
    sims = m.item_bucket_item_similarity(0)
    assert sims.to_numpy().dtype == np.float32
    assert np.isfinite(sims.to_numpy()).all()
