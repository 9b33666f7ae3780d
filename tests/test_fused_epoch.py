"""Fused whole-epoch Pallas training kernel: numerics parity with the XLA
scan engine, and envelope gating (everything outside the kernel's supported
configuration must silently use the scan path).

The kernel (``ops/pallas/fused_mf_epoch.py``) replaces the scan engine's
per-step gather / K-negative scoring / hinge backward / optax update — the
counterpart of the reference hot loop at
``/root/reference/collie/model/base/base_pipeline.py:618-623`` — with one
``pallas_call`` per epoch.  On CPU it runs in interpret mode, so these tests
exercise the exact kernel program the TPU runs (minus Mosaic lowering).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.fixtures.model_fixtures import (explicit_sets,  # noqa: F401
                                           implicit_sets, implicit_train)

from collie_tpu.data import InteractionsDataLoader
from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
from collie_tpu.training.scan_engine import (_fused_epoch_config,
                                             build_scan_epoch_fns)


def _train_epochs(implicit_train, monkeypatch, fused: bool, *, loss='adaptive',
                  epochs=3, batch_size=1024, dim=8, lr=1e-1, metadata=None,
                  metadata_weights=None, weight_decay=0.0,
                  perturb_user_biases=False):
    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '1' if fused else '0')
    # like-for-like reference: the kernel mirrors the *dense* adaptive
    # computation, while the scan engine defaults to the sparse-hardest
    # backward (same values, different scatter accumulation order — drifts
    # past tolerance over multiple Adam epochs; its own parity is covered by
    # tests/test_sparse_adaptive.py)
    monkeypatch.setenv('COLLIE_TPU_SPARSE_ADAPTIVE', '0')
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=batch_size, shuffle=True,
                                    seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=dim, lr=lr,
                                     loss=loss, seed=0,
                                     weight_decay=weight_decay,
                                     metadata_for_loss=metadata,
                                     metadata_for_loss_weights=metadata_weights)
    if perturb_user_biases:
        # ranking losses give user biases zero data gradient, so only a
        # nonzero starting value exercises their weight-decay update
        model.params['user_biases'] = jnp.asarray(
            np.random.default_rng(9).normal(
                0, 0.1, model.params['user_biases'].shape).astype(np.float32))
    specs = model.optimizer_specs()
    fn, data, S, n = build_scan_epoch_fns(model, specs, [True] * len(specs),
                                          loader, shuffle=True, training=True)
    params = {k: jnp.asarray(v) for k, v in model.params.items()}
    opt_states = tuple(
        jax.jit(spec.transform.init)({k: params[k] for k in spec.keys})
        for spec in specs)
    losses = []
    for e in range(epochs):
        params, opt_states, loss_val = fn(params, opt_states, data,
                                          jax.random.PRNGKey(0), np.int32(e))
        losses.append(float(loss_val))
    return (jax.device_get(params), jax.device_get(opt_states), losses, S)


@pytest.mark.parametrize('loss', ['hinge', 'adaptive', 'bpr', 'adaptive_bpr',
                                  'warp'])
def test_fused_epoch_matches_scan_engine(implicit_train, monkeypatch, loss):
    """Same data, same seed: the fused kernel and the XLA scan engine must
    produce matching params, losses, and *interchangeable* optimizer states
    (including every count leaf — checkpoint/resume must not care which
    engine wrote the state).

    The bpr family runs fewer epochs: its sigmoid gradient is dense (every
    pair contributes), so hardest-negative argmax flips on 1e-7 rounding
    accumulate into visible bias drift faster than hinge's sparse violations
    do.  Long-horizon equivalence is validated statistically on TPU instead
    (``benchmarks/fused_quality.py``)."""
    epochs = 1 if 'bpr' in loss else 3
    p_fused, s_fused, l_fused, S = _train_epochs(
        implicit_train, monkeypatch, fused=True, loss=loss, epochs=epochs)
    p_scan, s_scan, l_scan, _ = _train_epochs(
        implicit_train, monkeypatch, fused=False, loss=loss, epochs=epochs)

    # tolerance: the kernel's matmul-shaped scatter sums duplicate rows in a
    # different order than XLA's scatter-add; O(1e-7) forward deltas amplify
    # through 3 epochs of Adam (sqrt(nu) near zero early on) to O(1e-4)
    for k in p_scan:
        scale = np.maximum(np.abs(p_scan[k]).max(), 1e-3)
        np.testing.assert_allclose(
            p_fused[k], p_scan[k], atol=5e-4 * scale, rtol=0,
            err_msg=f'param {k} diverged between engines')
    np.testing.assert_allclose(l_fused, l_scan, rtol=1e-4)

    flat_f, tree_f = jax.tree_util.tree_flatten(s_fused)
    flat_s, tree_s = jax.tree_util.tree_flatten(s_scan)
    assert tree_f == tree_s, 'optimizer state trees differ between engines'
    for a, b in zip(flat_f, flat_s):
        if np.issubdtype(np.asarray(a).dtype, np.integer):
            np.testing.assert_array_equal(a, b)  # counts must be exact
        else:
            scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-3)
            np.testing.assert_allclose(a, b, atol=5e-4 * scale, rtol=0)


def test_fused_epoch_weight_decay_matches_scan_engine(implicit_train,
                                                      monkeypatch):
    """Torch-coupled weight decay in-kernel: adam embeddings decay via
    add_decayed_weights-then-adam order, the item bias via sgd, and the
    user biases (zero data gradient under ranking losses) via the exact
    closed-form (1-lr*wd)^S — all matching the scan engine's optax chain.
    Plain BPR: its gradient is dense over all K pairs (no hardest-negative
    selection), so the decay term cannot flip a near-tie selection and the
    comparison stays bitwise-meaningful."""
    kw = dict(loss='bpr', weight_decay=1e-3, epochs=1)
    p_fused, s_fused, l_fused, S = _train_epochs(implicit_train, monkeypatch,
                                                 fused=True, **kw)
    p_scan, s_scan, l_scan, _ = _train_epochs(implicit_train, monkeypatch,
                                              fused=False, **kw)
    for k in p_scan:
        scale = np.maximum(np.abs(p_scan[k]).max(), 1e-3)
        np.testing.assert_allclose(p_fused[k], p_scan[k],
                                   atol=5e-4 * scale, rtol=0, err_msg=k)
    np.testing.assert_allclose(l_fused, l_scan, rtol=1e-4)


def test_fused_epoch_user_bias_decay(implicit_train, monkeypatch):
    """User biases start at zero and get zero data gradient from ranking
    losses, so only a perturbed start exercises their decay.  The perturbed
    bias enters the SCAN path's selection scores (constant per row — no
    effect in real arithmetic, but float tie-flips move other params), so
    this test compares only the user biases, whose update is pure decay on
    both engines."""
    kw = dict(loss='adaptive', weight_decay=1e-3, epochs=1,
              perturb_user_biases=True)
    p_fused, _, _, S = _train_epochs(implicit_train, monkeypatch,
                                     fused=True, **kw)
    p_scan, _, _, _ = _train_epochs(implicit_train, monkeypatch,
                                    fused=False, **kw)
    start = np.random.default_rng(9).normal(
        0, 0.1, p_fused['user_biases'].shape).astype(np.float32)
    # the bias group trains at MF's default bias_lr (1e-2), not lr
    expected = start * (1.0 - 1e-2 * 1e-3) ** S
    np.testing.assert_allclose(p_fused['user_biases'], expected,
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(p_fused['user_biases'],
                               p_scan['user_biases'], rtol=1e-5, atol=1e-8)
    assert np.all(np.abs(p_fused['user_biases']) < np.abs(start))


@pytest.mark.parametrize('loss', ['hinge', 'adaptive', 'bpr', 'warp'])
def test_fused_epoch_metadata_matches_scan_engine(implicit_train, monkeypatch,
                                                  loss):
    """Partial-credit item metadata in-kernel: the ideal score gap
    (1 - Σ matched weights) must shift every loss family identically to the
    scan engine's ideal_difference_from_metadata path — including credit on
    the SELECTED negative for adaptive losses and per-trial credit inside
    WARP's first-violation scan."""
    num_items = implicit_train.num_items
    rng = np.random.default_rng(5)
    metadata = {'genre': rng.integers(0, 8, num_items),
                'decade': rng.integers(0, 5, num_items)}
    weights = {'genre': 0.25, 'decade': 0.15}
    epochs = 1 if loss == 'bpr' else 2
    kw = dict(metadata=metadata, metadata_weights=weights, epochs=epochs,
              loss=loss)
    p_fused, _, l_fused, _ = _train_epochs(implicit_train, monkeypatch,
                                           fused=True, **kw)
    p_scan, _, l_scan, _ = _train_epochs(implicit_train, monkeypatch,
                                         fused=False, **kw)
    for k in p_scan:
        scale = np.maximum(np.abs(p_scan[k]).max(), 1e-3)
        np.testing.assert_allclose(p_fused[k], p_scan[k],
                                   atol=5e-4 * scale, rtol=0, err_msg=k)
    np.testing.assert_allclose(l_fused, l_scan, rtol=1e-4)

    # the metadata must actually change the computation vs no-metadata
    p_nometa, _, l_nometa, _ = _train_epochs(implicit_train, monkeypatch,
                                             fused=True, epochs=epochs,
                                             loss=loss)
    assert not np.allclose(l_fused, l_nometa), \
        'metadata had no effect on the fused loss'


def test_fused_envelope_metadata_gating(implicit_train, monkeypatch):
    """Well-formed integer per-item metadata stays on the fused tier; any
    other shape (weights > 1, float fields, wrong length) falls back so the
    scan path raises the reference's own validation errors."""
    num_items = implicit_train.num_items
    rng = np.random.default_rng(5)
    good = {'genre': rng.integers(0, 8, num_items)}

    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, seed=0)

    m = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                 loss='adaptive', seed=0,
                                 metadata_for_loss=good,
                                 metadata_for_loss_weights={'genre': 0.3})
    cfg = _config_for(m, loader, monkeypatch)
    assert cfg is not None and cfg['meta_names'] == ('genre',)

    for metadata, weights in (
            (good, {'genre': 1.5}),                               # Σw > 1
            ({'genre': good['genre'].astype(np.float32)},
             {'genre': 0.3}),                                     # float field
            ({'genre': good['genre'][:-1]}, {'genre': 0.3}),      # wrong len
            (good, None),                                         # no weights
    ):
        m = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0,
                                     metadata_for_loss=metadata,
                                     metadata_for_loss_weights=weights)
        assert _config_for(m, loader, monkeypatch) is None, (metadata, weights)


def _train_explicit_epochs(explicit_sets, monkeypatch, fused: bool, *,
                           loss='mse', y_range=None, epochs=3,
                           batch_size=1024, dim=8, lr=1e-2, weight_decay=0.0):
    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '1' if fused else '0')
    loader = InteractionsDataLoader(interactions=explicit_sets[0],
                                    batch_size=batch_size, shuffle=True,
                                    seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=dim, lr=lr,
                                     loss=loss, y_range=y_range, seed=0,
                                     weight_decay=weight_decay)
    specs = model.optimizer_specs()
    fn, data, S, n = build_scan_epoch_fns(model, specs, [True] * len(specs),
                                          loader, shuffle=True, training=True)
    params = {k: jnp.asarray(v) for k, v in model.params.items()}
    opt_states = tuple(
        jax.jit(spec.transform.init)({k: params[k] for k in spec.keys})
        for spec in specs)
    losses = []
    for e in range(epochs):
        params, opt_states, loss_val = fn(params, opt_states, data,
                                          jax.random.PRNGKey(0), np.int32(e))
        losses.append(float(loss_val))
    return (jax.device_get(params), jax.device_get(opt_states), losses, S)


@pytest.mark.parametrize('loss,y_range,wd', [('mse', None, 0.0),
                                             ('mae', None, 0.0),
                                             ('mse', (1.0, 5.0), 0.0),
                                             ('mse', None, 1e-3)])
def test_fused_explicit_epoch_matches_scan_engine(explicit_sets, monkeypatch,
                                                  loss, y_range, wd):
    """Explicit (pointwise) twin kernel: params, losses, and optimizer states
    must match the XLA scan engine — including the USER bias, which carries
    gradient under pointwise losses (it cancels under the ranking losses),
    and the y_range sigmoid rescale's chain rule."""
    p_fused, s_fused, l_fused, S = _train_explicit_epochs(
        explicit_sets, monkeypatch, fused=True, loss=loss, y_range=y_range,
        weight_decay=wd)
    p_scan, s_scan, l_scan, _ = _train_explicit_epochs(
        explicit_sets, monkeypatch, fused=False, loss=loss, y_range=y_range,
        weight_decay=wd)

    for k in p_scan:
        scale = np.maximum(np.abs(p_scan[k]).max(), 1e-3)
        np.testing.assert_allclose(
            p_fused[k], p_scan[k], atol=5e-4 * scale, rtol=0,
            err_msg=f'param {k} diverged between engines')
    np.testing.assert_allclose(l_fused, l_scan, rtol=1e-4)

    flat_f, tree_f = jax.tree_util.tree_flatten(s_fused)
    flat_s, tree_s = jax.tree_util.tree_flatten(s_scan)
    assert tree_f == tree_s, 'optimizer state trees differ between engines'
    for a, b in zip(flat_f, flat_s):
        if np.issubdtype(np.asarray(a).dtype, np.integer):
            np.testing.assert_array_equal(a, b)
        else:
            scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-3)
            np.testing.assert_allclose(a, b, atol=5e-4 * scale, rtol=0)


def test_fused_explicit_user_bias_learns(explicit_sets, monkeypatch):
    """The explicit kernel must actually move the user biases (a frozen user
    bias would still pass a too-loose parity tolerance)."""
    p_fused, _, _, _ = _train_explicit_epochs(explicit_sets, monkeypatch,
                                              fused=True, epochs=2)
    assert np.abs(p_fused['user_biases']).max() > 1e-4


def test_fused_epoch_through_trainer(implicit_train, monkeypatch):
    """Public-API check: CollieTrainer with the fused engine forced on
    trains to the same params as with it forced off.  BF16_SELECT is
    pinned off: the Pallas kernel selects the hardest negative in f32
    in-kernel, so the equivalence claim is against the f32-selection scan
    (bf16 selection is covered by test_bf16_select.py)."""
    from collie_tpu.training.trainer import CollieTrainer

    def run(fused):
        monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '1' if fused else '0')
        monkeypatch.setenv('COLLIE_TPU_BF16_SELECT', '0')
        model = MatrixFactorizationModel(train=implicit_train,
                                         embedding_dim=8, lr=1e-1,
                                         loss='adaptive', seed=0)
        CollieTrainer(model, max_epochs=2, verbosity=0, seed=0).fit(model)
        return {k: np.asarray(v) for k, v in model.params.items()}

    p_fused, p_scan = run(True), run(False)
    for k in p_scan:
        scale = np.maximum(np.abs(p_scan[k]).max(), 1e-3)
        diff = np.abs(p_fused[k] - p_scan[k])
        # the two compute orders agree except on EXACT hardest-negative
        # score ties (documented measure-zero class): a flipped tie routes
        # one update to a different row, so a handful of elements may sit
        # ~1e-4 apart after 2 epochs while everything else matches to
        # float-association tolerance.  Catch systematic divergence, admit
        # isolated tie flips.
        over = diff > 6e-5 * scale
        assert over.mean() < 0.01, (
            f'{k}: {over.mean():.2%} of elements diverged '
            f'(max {diff.max():.2e})')
        assert diff.max() < 1e-3 * scale, f'{k}: max diff {diff.max():.2e}'


def _config_for(model, loader, monkeypatch, mesh=None):
    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '1')
    specs = model.optimizer_specs()
    return _fused_epoch_config(model, specs, [True] * len(specs), loader,
                               mesh)


def test_fused_envelope_accepts_default_mf(implicit_train, monkeypatch):
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0)
    cfg = _config_for(model, loader, monkeypatch)
    assert cfg is not None and cfg['adaptive'] is True
    model_h = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                       loss='hinge', seed=0)
    cfg_h = _config_for(model_h, loader, monkeypatch)
    # K>1 in the fixture auto-upgrades hinge->adaptive (reference
    # base_pipeline semantics), so just assert the config exists
    assert cfg_h is not None


def test_fused_envelope_rejects_out_of_scope(implicit_train, monkeypatch):
    """Anything the kernel does not implement must fall back: non-MF models,
    dropout, implicit y_range, single-optimizer layouts, non-adam
    embeddings, and mesh training — while warp and weight decay stay on the
    fused tier."""
    from collie_tpu.models.mlp_matrix_factorization import \
        MLPMatrixFactorizationModel

    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, seed=0)

    mlp = MLPMatrixFactorizationModel(train=loader, embedding_dim=8, seed=0)
    assert _config_for(mlp, loader, monkeypatch) is None

    warp = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                    loss='warp', seed=0)
    warp_cfg = _config_for(warp, loader, monkeypatch)
    assert warp_cfg is not None and warp_cfg['loss_kind'] == 'warp'

    wd = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                  loss='adaptive', weight_decay=1e-4, seed=0)
    wd_cfg = _config_for(wd, loader, monkeypatch)
    assert wd_cfg is not None and wd_cfg['wd_emb'] == 1e-4

    for kwargs in ({'dropout_p': 0.5},
                   {'y_range': (0.0, 5.0)},
                   {'optimizer': 'sgd'}, {'bias_optimizer': 'adam'}):
        m = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     seed=0, **kwargs)
        assert _config_for(m, loader, monkeypatch) is None, kwargs

    mf = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                  loss='adaptive', seed=0)
    assert _config_for(mf, loader, monkeypatch, mesh=object()) is None

    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '0')
    specs = mf.optimizer_specs()
    assert _fused_epoch_config(mf, specs, [True] * len(specs), loader,
                               None) is None


def test_fused_envelope_respects_vmem_budget(implicit_train, monkeypatch):
    """A configuration whose tables + score blocks exceed the VMEM plan must
    fall back rather than emit a kernel Mosaic cannot place."""
    from collie_tpu.ops.pallas.fused_mf_epoch import (_VMEM_BUDGET_BYTES,
                                                      fused_vmem_bytes)

    # dim 2048 at 250x500 tables blows the VMEM plan via the moment sets
    assert fused_vmem_bytes(250, 500, 2048, 1024) > _VMEM_BUDGET_BYTES
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, seed=0)
    big = MatrixFactorizationModel(train=loader, embedding_dim=2048, lr=1e-1,
                                   loss='adaptive', seed=0)
    assert _config_for(big, loader, monkeypatch) is None


def test_explicit_kernel_retired_from_auto(explicit_sets, monkeypatch):
    """The explicit pointwise kernel is RETIRED from auto selection (round
    5: 0.51x of the scan at B=256, scoped-VMEM compile failure at B>=1024
    on current libtpu — docs/TUNING.md).  Auto never selects it, in ANY
    table layout; forcing '1' keeps it reachable for the interpret-mode
    numerics tests."""
    train, _ = explicit_sets
    loader = InteractionsDataLoader(interactions=train, batch_size=1024,
                                    seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-2,
                                     loss='mse', seed=0)
    specs = model.optimizer_specs()
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')

    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', 'auto')
    monkeypatch.delenv('COLLIE_TPU_FUSED_TABLES', raising=False)
    assert _fused_epoch_config(model, specs, [True] * len(specs), loader,
                               None) is None

    # retired even for the named-table layout (this combination used to
    # auto-select the kernel, which no longer compiles at this batch size)
    monkeypatch.setenv('COLLIE_TPU_FUSED_TABLES', '0')
    assert _fused_epoch_config(model, specs, [True] * len(specs), loader,
                               None) is None

    monkeypatch.delenv('COLLIE_TPU_FUSED_TABLES', raising=False)
    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '1')
    assert _fused_epoch_config(model, specs, [True] * len(specs), loader,
                               None) is not None


def test_fused_default_gating_is_tpu_only(implicit_train, monkeypatch):
    """COLLIE_TPU_FUSED_EPOCH=auto (the default) only engages on a TPU
    backend — CPU runs would pay interpret-mode cost for nothing."""
    monkeypatch.delenv('COLLIE_TPU_FUSED_EPOCH', raising=False)
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0)
    specs = model.optimizer_specs()
    cfg = _fused_epoch_config(model, specs, [True] * len(specs), loader, None)
    if jax.default_backend() == 'tpu':
        assert cfg is not None
    else:
        assert cfg is None
