"""Sparse-hardest backward for adaptive losses: the rewrite in
``BasePipeline.calculate_loss`` (score K negatives grad-free, re-score only
the argmax negative with gradient) must match the dense adaptive path in both
loss value and gradients, and must stay disabled whenever its preconditions
(deterministic score, training, K>1) fail."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from collie_tpu.data import InteractionsDataLoader
from collie_tpu.models import MatrixFactorizationModel
from collie_tpu.ops import losses as loss_lib
from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401


def _batch(model, B=64, K=5, seed=0):
    rng = np.random.default_rng(seed)
    U = model.hparams['num_users']
    I = model.hparams['num_items']
    return {
        'users': jnp.asarray(rng.integers(0, U, B, dtype=np.int32)),
        'pos_items': jnp.asarray(rng.integers(0, I, B, dtype=np.int32)),
        'neg_items': jnp.asarray(rng.integers(0, I, (B, K), dtype=np.int32)),
        'mask': jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }


@pytest.mark.parametrize('loss', ['adaptive', 'adaptive_bpr'])
def test_sparse_hardest_matches_dense(implicit_train, monkeypatch, loss):  # noqa: F811
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=64, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss=loss, seed=0)
    assert model._adaptive_base_loss() is not None
    batch = _batch(model)

    def grads(sparse_on):
        monkeypatch.setenv('COLLIE_TPU_SPARSE_ADAPTIVE',
                           '1' if sparse_on else '0')
        fn = lambda p: model.calculate_loss(p, batch, rng=None, training=True)  # noqa: E731
        return jax.value_and_grad(fn)(model.params)

    v_sparse, g_sparse = grads(True)
    v_dense, g_dense = grads(False)
    np.testing.assert_allclose(float(v_sparse), float(v_dense), rtol=1e-6)
    for k in g_dense:
        np.testing.assert_allclose(np.asarray(g_sparse[k]),
                                   np.asarray(g_dense[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_sparse_hardest_with_metadata(implicit_train, monkeypatch):  # noqa: F811
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=64, seed=0)
    num_items = loader.num_items
    meta = {'genre': np.arange(num_items) % 3}
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0,
                                     metadata_for_loss=meta,
                                     metadata_for_loss_weights={'genre': 0.3})
    batch = _batch(model)

    def val(sparse_on):
        monkeypatch.setenv('COLLIE_TPU_SPARSE_ADAPTIVE',
                           '1' if sparse_on else '0')
        return float(model.calculate_loss(model.params, batch, rng=None,
                                          training=True))

    np.testing.assert_allclose(val(True), val(False), rtol=1e-6)


def test_sparse_warp_matches_dense(implicit_train, monkeypatch):  # noqa: F811
    """WARP first-violation sparse backward: loss value and gradients match
    the dense warp_loss path (same selection, same scores)."""
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=64, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='warp', seed=0)
    batch = _batch(model)

    def grads(sparse_on):
        monkeypatch.setenv('COLLIE_TPU_SPARSE_ADAPTIVE',
                           '1' if sparse_on else '0')
        fn = lambda p: model.calculate_loss(p, batch, rng=None, training=True)  # noqa: E731
        return jax.value_and_grad(fn)(model.params)

    v_sparse, g_sparse = grads(True)
    v_dense, g_dense = grads(False)
    np.testing.assert_allclose(float(v_sparse), float(v_dense), rtol=1e-6)
    for k in g_dense:
        np.testing.assert_allclose(np.asarray(g_sparse[k]),
                                   np.asarray(g_dense[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_sparse_warp_with_metadata(implicit_train, monkeypatch):  # noqa: F811
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=64, seed=0)
    num_items = loader.num_items
    meta = {'genre': np.arange(num_items) % 3}
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='warp', seed=0,
                                     metadata_for_loss=meta,
                                     metadata_for_loss_weights={'genre': 0.3})
    batch = _batch(model)

    def val_and_grad(sparse_on):
        monkeypatch.setenv('COLLIE_TPU_SPARSE_ADAPTIVE',
                           '1' if sparse_on else '0')
        fn = lambda p: model.calculate_loss(p, batch, rng=None, training=True)  # noqa: E731
        return jax.value_and_grad(fn)(model.params)

    v_s, g_s = val_and_grad(True)
    v_d, g_d = val_and_grad(False)
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-6)
    for k in g_d:
        np.testing.assert_allclose(np.asarray(g_s[k]), np.asarray(g_d[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_sparse_warp_not_used_at_eval(implicit_train, monkeypatch):  # noqa: F811
    """training=False must keep the dense path (no selection rewrite) — both
    give identical values, so assert on the traced structure instead: the
    sparse WARP path makes two pairwise_scores calls (grad-free pos+negs,
    then the pos+selected re-score pair) and never calls score() directly;
    the dense eval path scores the positive via score() plus one
    pairwise_scores call for all K negatives.  BF16_SELECT is pinned off so
    the selection pass routes through pairwise_scores (the default bf16
    path has its own gather and would not increment the counter)."""
    monkeypatch.setenv('COLLIE_TPU_BF16_SELECT', '0')
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=64, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='warp', seed=0)
    batch = _batch(model)
    calls = {'score': 0, 'pairwise': 0}
    orig_score = model.score
    orig_pairwise = model.pairwise_scores

    def counting_score(*a, **kw):
        calls['score'] += 1
        return orig_score(*a, **kw)

    def counting_pairwise(*a, **kw):
        calls['pairwise'] += 1
        return orig_pairwise(*a, **kw)

    monkeypatch.setenv('COLLIE_TPU_SPARSE_ADAPTIVE', '1')
    monkeypatch.setattr(model, 'score', counting_score)
    monkeypatch.setattr(model, 'pairwise_scores', counting_pairwise)
    model.calculate_loss(model.params, batch, rng=None, training=True)
    train_calls = dict(calls)
    calls['score'] = calls['pairwise'] = 0
    model.calculate_loss(model.params, batch, rng=None, training=False)
    eval_calls = dict(calls)
    assert train_calls == {'score': 0, 'pairwise': 2}
    assert eval_calls == {'score': 1, 'pairwise': 1}


def test_sparse_hardest_preconditions(implicit_train):  # noqa: F811
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=64, seed=0)
    dropout = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                       dropout_p=0.25, loss='adaptive', seed=0)
    assert not dropout._score_is_deterministic()

    plain = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                     loss='adaptive', seed=0)
    assert plain._score_is_deterministic()

    # 'hinge' auto-upgrades to adaptive at K>1 (reference semantics), so the
    # rewrite applies to it too; WARP keeps the dense path (uses all trials)
    hinge = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                     loss='hinge', seed=0)
    assert hinge._adaptive_base_loss() is loss_lib.hinge_loss

    warp = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                    loss='warp', seed=0)
    assert warp._adaptive_base_loss() is None

    # K=1 downgrades to plain hinge - dense path
    from collie_tpu.data import Interactions
    inter1 = Interactions(mat=implicit_train.mat, num_negative_samples=1,
                          allow_missing_ids=True, seed=0)
    loader1 = InteractionsDataLoader(interactions=inter1, batch_size=64,
                                     seed=0)
    with pytest.warns(UserWarning, match='standard hinge'):
        k1 = MatrixFactorizationModel(train=loader1, embedding_dim=8,
                                      loss='adaptive', seed=0)
    assert k1._adaptive_base_loss() is None


def test_env_flip_between_fits_uses_fresh_programs(implicit_train,
                                                   monkeypatch):  # noqa: F811
    """The sparse-selection gate is baked into traced epoch programs, so the
    compiled-fn cache must key on it — flipping COLLIE_TPU_SPARSE_ADAPTIVE
    between fits must build new programs, not silently reuse the old path."""
    from collie_tpu.training import CollieTrainer

    monkeypatch.setenv('COLLIE_TPU_SPARSE_ADAPTIVE', '1')
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0)
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    keys_sparse = set(model._compiled_fn_cache)

    monkeypatch.setenv('COLLIE_TPU_SPARSE_ADAPTIVE', '0')
    trainer = CollieTrainer(model, max_epochs=2, verbosity=0, seed=0)
    trainer.fit(model)
    assert set(model._compiled_fn_cache) - keys_sparse, \
        'dense-path fit reused programs traced with the sparse path'


def test_sparse_hardest_end_to_end_training(implicit_train, monkeypatch):  # noqa: F811
    """Whole fits through both paths land on statistically identical params
    when gradients agree (same seeds, same data).  BF16_SELECT is pinned
    off: the equivalence claim is about the sparse REWRITE (selection +
    f32 re-score == dense autodiff); bf16 selection intentionally rounds
    WHICH negative is picked and is covered by test_bf16_select.py."""
    from collie_tpu.training import CollieTrainer

    def run(flag):
        monkeypatch.setenv('COLLIE_TPU_SPARSE_ADAPTIVE', flag)
        monkeypatch.setenv('COLLIE_TPU_BF16_SELECT', '0')
        loader = InteractionsDataLoader(interactions=implicit_train,
                                        batch_size=1024, shuffle=True, seed=0)
        model = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                         lr=1e-1, loss='adaptive', seed=0)
        CollieTrainer(model, max_epochs=2, verbosity=0, seed=0).fit(model)
        return {k: np.asarray(v) for k, v in model.params.items()}

    p_sparse = run('1')
    p_dense = run('0')
    for k in p_dense:
        np.testing.assert_allclose(p_sparse[k], p_dense[k], atol=5e-4,
                                   err_msg=k)
