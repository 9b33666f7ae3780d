"""bf16 hardest-negative selection (``pairwise_scores_select``).

The no-grad candidate-scoring pass only decides WHICH negative the
sparse-backward rewrites re-score in f32, so it may run at half width
(``COLLIE_TPU_BF16_SELECT``).  These tests pin: exact fallback behavior
when disabled, bf16-vs-f32 score proximity, and bit-identical selection
between the fused and named table layouts (the named path rounds its item
bias through bf16 exactly like the fused table's bias column).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401


@pytest.fixture()
def model(implicit_train):
    from collie_tpu.model import MatrixFactorizationModel

    return MatrixFactorizationModel(train=implicit_train, embedding_dim=8,
                                    lr=0.1, loss='adaptive', seed=3)


def _ids(model, R=6, B=32, seed=0):
    rng = np.random.default_rng(seed)
    users = jnp.asarray(rng.integers(0, model.hparams['num_users'], B)
                        .astype(np.int32))
    items = jnp.asarray(rng.integers(0, model.hparams['num_items'], (R, B))
                        .astype(np.int32))
    return users, items


def test_disabled_matches_f32_pairwise_exactly(model, monkeypatch):
    monkeypatch.setenv('COLLIE_TPU_BF16_SELECT', '0')
    users, items = _ids(model)
    got = model.pairwise_scores_select(model.params, users, items)
    want = model.pairwise_scores(model.params, users, items)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bf16_select_close_to_f32(model, monkeypatch):
    monkeypatch.setenv('COLLIE_TPU_BF16_SELECT', '1')
    users, items = _ids(model)
    got = np.asarray(model.pairwise_scores_select(model.params, users, items))
    want = np.asarray(model.pairwise_scores(model.params, users, items))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-2 * scale)


def test_fused_and_named_layouts_select_identically(model, monkeypatch):
    """Same bf16 rounding in both layouts -> bit-identical selection scores
    (the precondition for fused-vs-named trajectory equality under the
    default COLLIE_TPU_BF16_SELECT)."""
    monkeypatch.setenv('COLLIE_TPU_BF16_SELECT', '1')
    users, items = _ids(model)
    named = model.pairwise_scores_select(model.params, users, items)
    fused = model.pairwise_scores_select(model.fuse_params(model.params),
                                         users, items)
    np.testing.assert_array_equal(np.asarray(named), np.asarray(fused))


def test_subclasses_fall_back_to_f32(implicit_train, monkeypatch):
    """Hybrid/cold-start subclasses score through stage-conditional tables
    the MF fast path does not know about — they must use the exact base
    hook."""
    from collie_tpu.models.cold_start_matrix_factorization import ColdStartModel

    monkeypatch.setenv('COLLIE_TPU_BF16_SELECT', '1')
    buckets = np.arange(implicit_train.num_items) % 3
    cold = ColdStartModel(train=implicit_train, item_buckets=buckets,
                          embedding_dim=8, seed=3)
    users, items = _ids(cold)
    got = cold.pairwise_scores_select(cold.params, users, items)
    want = cold.pairwise_scores(cold.params, users, items)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bf16_select_trains_to_gate_quality(implicit_sets, monkeypatch):
    """End-to-end: a fit with the bf16 selection active must land in the
    same QUALITY regime as the f32 selection.  Selection rounding flips
    near-tied argmaxes, so the two trajectories diverge parameter-wise
    (chaotically) — quality, not parameter distance, is the contract.  The
    full calibrated gate enforcement lives in test_quality_gates.py, which
    runs with the default env — i.e. WITH this path active."""
    from collie_tpu.evaluate import evaluate_in_batches
    from collie_tpu.model import CollieTrainer, MatrixFactorizationModel
    from collie_tpu.ops import mapk

    train, test = implicit_sets

    def fit_map(env):
        monkeypatch.setenv('COLLIE_TPU_BF16_SELECT', env)
        monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '0')
        m = MatrixFactorizationModel(train=train, embedding_dim=10,
                                     lr=0.1, loss='adaptive', seed=7)
        CollieTrainer(m, max_epochs=6, verbosity=0, seed=7).fit(m)
        return evaluate_in_batches([mapk], test, m, k=10, verbose=False)

    map_bf = fit_map('1')
    map_f32 = fit_map('0')
    assert map_bf > 0.5 * map_f32, (
        f'bf16 selection degraded MAP@10: {map_bf:.5f} vs f32 {map_f32:.5f}')
    assert map_bf > 0.01, f'bf16 selection failed to learn: {map_bf:.5f}'
