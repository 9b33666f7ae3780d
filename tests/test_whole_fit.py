"""Whole-fit single-dispatch engine (``scan_engine.build_scan_fit_fn``):
the on-device plateau scheduler / early stopping / NaN trip must replicate
the per-epoch host loop exactly — same final params, same lr trajectory,
same stopping epoch, same raised errors.

``COLLIE_TPU_WHOLE_FIT=0`` forces the host loop; both paths run the same
jitted epoch programs with the same RNG, so parity is near-bitwise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401

from collie_tpu.data import InteractionsDataLoader
from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
from collie_tpu.training.trainer import CollieTrainer


def _fit(implicit_train, monkeypatch, whole_fit, *, epochs=6, lr=1e-1,
         patience=None, nan_guard=False, scheduler='default', val=None,
         loss='adaptive', **model_kwargs):
    monkeypatch.setenv('COLLIE_TPU_WHOLE_FIT', '1' if whole_fit else '0')
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    kwargs = dict(model_kwargs)
    if scheduler != 'default':
        kwargs['lr_scheduler_func'] = scheduler
    model = MatrixFactorizationModel(train=loader, val=val, embedding_dim=8,
                                     lr=lr, loss=loss, seed=0, **kwargs)
    trainer = CollieTrainer(model, max_epochs=epochs, verbosity=0, seed=0,
                            early_stopping_patience=patience,
                            terminate_on_nan=nan_guard)
    trainer.fit(model)
    params = {k: np.asarray(v) for k, v in model.params.items()}
    return params, trainer, model


def test_whole_fit_matches_per_epoch_loop(implicit_train, monkeypatch):
    p1, t1, m1 = _fit(implicit_train, monkeypatch, True)
    p0, t0, m0 = _fit(implicit_train, monkeypatch, False)
    for k in p0:
        np.testing.assert_allclose(p1[k], p0[k], rtol=0, atol=1e-6,
                                   err_msg=f'param {k}')
    assert m1.hparams['num_epochs_completed'] == \
        m0.hparams['num_epochs_completed'] == 6
    assert t1.best_epoch_loss[0] == t0.best_epoch_loss[0]
    np.testing.assert_allclose(t1.best_epoch_loss[1], t0.best_epoch_loss[1],
                               rtol=1e-6)


def test_whole_fit_scheduler_lr_trajectory(implicit_train, monkeypatch,
                                           capsys):
    """The default MF plateau scheduler (patience=1) must fire at the same
    epochs and leave the same final lr under both engines."""
    from collie_tpu.training.optimizers import get_lr

    def final_lrs(whole_fit):
        monkeypatch.setenv('COLLIE_TPU_WHOLE_FIT', '1' if whole_fit else '0')
        loader = InteractionsDataLoader(interactions=implicit_train,
                                        batch_size=1024, shuffle=True, seed=0)
        model = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                         lr=1e-1, loss='adaptive', seed=0)
        trainer = CollieTrainer(model, max_epochs=10, verbosity=1, seed=0)
        trainer.fit(model)
        out = capsys.readouterr().out
        lr_lines = [l.strip() for l in out.splitlines() if 'lr[' in l]
        return lr_lines, out.count('Epoch ')

    lines1, n1 = final_lrs(True)
    lines0, n0 = final_lrs(False)
    assert n1 == n0 == 10
    assert lines1 == lines0


def test_whole_fit_early_stopping(implicit_train, monkeypatch):
    """All-zero lrs freeze the params; the epoch loss still varies by the
    per-epoch RNG (shuffle + negatives) so improvement is random — both
    engines must stop at the SAME epoch with the same best."""
    p1, t1, m1 = _fit(implicit_train, monkeypatch, True, epochs=20, lr=0.0,
                      bias_lr=0.0, patience=2, scheduler=None)
    p0, t0, m0 = _fit(implicit_train, monkeypatch, False, epochs=20, lr=0.0,
                      bias_lr=0.0, patience=2, scheduler=None)
    assert m1.hparams['num_epochs_completed'] == \
        m0.hparams['num_epochs_completed'] < 20
    assert t1.best_epoch_loss[0] == t0.best_epoch_loss[0]


def test_whole_fit_nan_guard(implicit_train, monkeypatch):
    """A divergent lr must raise FloatingPointError from both engines."""
    for whole_fit in (True, False):
        with pytest.raises(FloatingPointError):
            _fit(implicit_train, monkeypatch, whole_fit, epochs=10, lr=1e18,
                 nan_guard=True, scheduler=None)


def test_whole_fit_with_validation(implicit_sets, monkeypatch):
    """val-loss monitoring: both engines track the same monitored metric."""
    train, val = implicit_sets
    p1, t1, m1 = _fit(train, monkeypatch, True, val=val, epochs=4)
    p0, t0, m0 = _fit(train, monkeypatch, False, val=val, epochs=4)
    for k in p0:
        np.testing.assert_allclose(p1[k], p0[k], rtol=0, atol=1e-6)
    np.testing.assert_allclose(t1.best_epoch_loss[1], t0.best_epoch_loss[1],
                               rtol=1e-6)


def test_whole_fit_logger_replay(implicit_train, monkeypatch):
    """Per-epoch logger metrics are replayed post-dispatch in epoch order."""
    class Rec:
        def __init__(self):
            self.rows = []

        def log_metrics(self, metrics, step=None):
            self.rows.append((step, dict(metrics)))

    monkeypatch.setenv('COLLIE_TPU_WHOLE_FIT', '1')
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0)
    rec = Rec()
    CollieTrainer(model, max_epochs=3, verbosity=0, seed=0,
                  logger=rec).fit(model)
    assert [r[0] for r in rec.rows] == [1, 2, 3]
    assert all('train_loss_epoch' in r[1] for r in rec.rows)


def test_whole_fit_repeat_fit_continues_epochs(implicit_train, monkeypatch):
    """trainer.max_epochs += n; fit(model) resumes from
    num_epochs_completed+1 — the bench.py warm/steady idiom."""
    monkeypatch.setenv('COLLIE_TPU_WHOLE_FIT', '1')
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=0, seed=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 1
    trainer.max_epochs = 4
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 4


def test_whole_fit_identical_refit_reuses_programs(implicit_train,
                                                   monkeypatch):
    """A second identical fit() must re-run cached epoch-block programs, not
    build new ones: whole-fit programs are keyed by power-of-two block
    length, and a fresh compile inside a timed window silently deflated the
    ML-10M benchmark by 2.3x (root cause in docs/BENCHMARKS.md). Guards the
    warm-fit-then-time methodology bench.py and bench_ml10m_scale.py rely on."""
    monkeypatch.setenv('COLLIE_TPU_WHOLE_FIT', '1')
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0)
    trainer = CollieTrainer(model, max_epochs=3, verbosity=0, seed=0)
    trainer.fit(model)
    keys_after_warm = set(model._compiled_fn_cache)
    assert any(k[0] == 'fit_scan' for k in keys_after_warm)

    model.hparams['num_epochs_completed'] = 0
    model._setup_model()
    trainer = CollieTrainer(model, max_epochs=3, verbosity=0, seed=0)
    trainer.fit(model)
    assert set(model._compiled_fn_cache) == keys_after_warm


def test_step_scan_group_matches_per_step(implicit_train, monkeypatch):
    """The grouped-step lax.scan path (per-step engine, G=16) must train to
    the same params as true per-batch dispatch (G=1): identical RNG stream
    (fold_in(base, step0+i)), identical updates."""
    def run(group):
        monkeypatch.setenv('COLLIE_TPU_STEP_SCAN_GROUP', group)
        loader = InteractionsDataLoader(interactions=implicit_train,
                                        batch_size=1024, shuffle=True, seed=0)
        model = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                         lr=1e-1, loss='adaptive', seed=0)
        trainer = CollieTrainer(model, max_epochs=2, verbosity=0, seed=0,
                                epoch_mode='step')
        trainer.fit(model)
        assert trainer.global_step == 2 * len(loader)
        return {k: np.asarray(v) for k, v in model.params.items()}

    p_chunk = run('16')
    p_single = run('1')
    for k in p_single:
        np.testing.assert_allclose(p_chunk[k], p_single[k], rtol=0, atol=1e-6,
                                   err_msg=f'param {k}')


def test_hdf5_loader_seed_reaches_interactions(tmp_path):
    """A seeded HDF5InteractionsDataLoader must construct a seeded
    HDF5Interactions: without forwarding, the interactions fell back to a
    seconds-resolution time seed and two identically-seeded loaders sampled
    different negatives (caught while validating the grouped-step engine)."""
    from collie_tpu.data import HDF5InteractionsDataLoader
    from collie_tpu.data.synthetic import generate_interactions_df
    from collie_tpu.utils import pandas_df_to_hdf5

    df = generate_interactions_df(seed=3)
    path = str(tmp_path / 'inter.h5')
    pandas_df_to_hdf5(df, path)

    def stream():
        loader = HDF5InteractionsDataLoader(
            hdf5_path=path, batch_size=1024, shuffle=True, seed=7,
            num_users=943, num_items=1682, num_negative_samples=4)
        assert loader.interactions.seed == 7
        return [{k: np.asarray(v).copy() for k, v in b.items()}
                for b in loader]

    a, b = stream(), stream()
    for x, y in zip(a, b):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_hdf5_chunked_steps_match_per_step(tmp_path, monkeypatch):
    """Out-of-core training through the grouped-step scan (incl. the tail
    chunk) matches per-batch dispatch bit-for-bit."""
    from collie_tpu.data import HDF5InteractionsDataLoader
    from collie_tpu.data.synthetic import generate_interactions_df
    from collie_tpu.utils import pandas_df_to_hdf5

    df = generate_interactions_df(seed=3)
    path = str(tmp_path / 'inter.h5')
    pandas_df_to_hdf5(df, path)

    def run(group):
        monkeypatch.setenv('COLLIE_TPU_STEP_SCAN_GROUP', group)
        loader = HDF5InteractionsDataLoader(
            hdf5_path=path, batch_size=1024, shuffle=True, seed=0,
            num_users=943, num_items=1682, num_negative_samples=4)
        model = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                         lr=1e-1, loss='adaptive', seed=0)
        CollieTrainer(model, max_epochs=2, verbosity=0, seed=0).fit(model)
        return {k: np.asarray(v) for k, v in model.params.items()}

    p_chunk, p_single = run('16'), run('1')
    for k in p_single:
        np.testing.assert_allclose(p_chunk[k], p_single[k], rtol=0, atol=1e-6)


def test_val_program_rebuilds_when_sampler_env_changes(implicit_sets,
                                                       monkeypatch):
    """The val epoch samples negatives through the same env-gated sampler
    selection as training, so the val program cache key must include the
    path flags: flipping COLLIE_TPU_SAMPLER between fits has to build a new
    ('val', ...) slot, not silently reuse the one with the old sampler baked
    in (the f4dc819 staleness class)."""
    train, test = implicit_sets
    monkeypatch.setenv('COLLIE_TPU_SAMPLER', 'csr')
    loader = InteractionsDataLoader(interactions=train, batch_size=1024,
                                    shuffle=True, seed=0)
    val_loader = InteractionsDataLoader(interactions=test, batch_size=1024,
                                        shuffle=False, seed=0)
    model = MatrixFactorizationModel(train=loader, val=val_loader,
                                     embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0)
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    val_keys = {k for k in model._compiled_fn_cache if k[0] == 'val'}
    assert val_keys, 'expected a val program slot'

    monkeypatch.setenv('COLLIE_TPU_SAMPLER', 'bucketed')
    model.hparams['num_epochs_completed'] = 0
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    val_keys_after = {k for k in model._compiled_fn_cache if k[0] == 'val'}
    assert val_keys_after > val_keys, \
        'changing COLLIE_TPU_SAMPLER must build a new val program slot'


def test_programs_rebuild_when_loss_semantics_change(implicit_train,
                                                     monkeypatch):
    """weight decay / y_range / metadata are baked into compiled programs as
    trace-time constants, so mutating them between fits must key new
    programs (CLAUDE.md cache-invalidation invariant)."""
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0)
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    train_keys = {k for k in model._compiled_fn_cache if k[0] == 'train'}
    assert train_keys

    model.hparams['weight_decay'] = 1e-3
    model.hparams['num_epochs_completed'] = 0
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    train_keys_after = {k for k in model._compiled_fn_cache
                        if k[0] == 'train'}
    assert train_keys_after > train_keys, \
        'mutating weight_decay must build a new train program slot'


def test_fused_epoch_toggle_does_not_rebuild_val_program(implicit_sets,
                                                         monkeypatch):
    """COLLIE_TPU_FUSED_EPOCH never affects a training=False program, so
    toggling it must reuse the cached val program (a rebuild is a 30-90 s
    remote compile on the real chip for a bit-identical program)."""
    train, test = implicit_sets
    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '0')
    val_loader = InteractionsDataLoader(interactions=test, batch_size=1024,
                                        shuffle=False, seed=0)
    model = MatrixFactorizationModel(train=train, val=val_loader,
                                     embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0)
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    val_keys = {k for k in model._compiled_fn_cache if k[0] == 'val'}
    assert len(val_keys) == 1

    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '1')
    model.hparams['num_epochs_completed'] = 0
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    val_keys_after = {k for k in model._compiled_fn_cache if k[0] == 'val'}
    assert val_keys_after == val_keys, \
        'toggling the fused gate must not rebuild the val program'


def test_whole_fit_patience_zero_improving_run_completes(implicit_train,
                                                         monkeypatch):
    """early_stopping_patience=0 must stop on the first NON-improving epoch
    only — the host loop checks patience inside its else branch, so an
    improving run trains to max_epochs.  The on-device check once tripped
    unconditionally (n_no >= 0 holds after an improving epoch too) and
    silently truncated the fit to one epoch."""
    p1, t1, m1 = _fit(implicit_train, monkeypatch, True, epochs=4,
                      patience=0, scheduler=None)
    p0, t0, m0 = _fit(implicit_train, monkeypatch, False, epochs=4,
                      patience=0, scheduler=None)
    assert m1.hparams['num_epochs_completed'] == \
        m0.hparams['num_epochs_completed']
    assert m1.hparams['num_epochs_completed'] >= 2
    for k in p0:
        np.testing.assert_allclose(p1[k], p0[k], rtol=0, atol=1e-6)


def test_whole_fit_falls_back_for_custom_optimizer_factory(implicit_train,
                                                           monkeypatch):
    """A custom optax factory (no injected lr hyperparam) plus the default
    plateau scheduler must fall back to the per-epoch host loop instead of
    crashing at trace time inside build_scan_fit_fn — the host loop only
    needs the injected lr when a plateau reduction actually fires."""
    import optax

    monkeypatch.setenv('COLLIE_TPU_WHOLE_FIT', '1')
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    model = MatrixFactorizationModel(
        train=loader, embedding_dim=8, lr=1e-1, loss='adaptive', seed=0,
        optimizer=lambda learning_rate, **kw: optax.sgd(learning_rate),
        bias_optimizer=None)
    trainer = CollieTrainer(model, max_epochs=2, verbosity=0, seed=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 2
    assert not any(k[0] == 'fit_scan' for k in model._compiled_fn_cache)


def test_metadata_fingerprint_stable_across_fits(implicit_train, monkeypatch):
    """The loss-semantics fingerprint must be computed from the on-device
    metadata arrays: fingerprinting the pre-transfer np arrays gave fit 1 and
    fit 2 different ids and guaranteed a spurious 30-90 s recompile for any
    model with metadata_for_loss."""
    monkeypatch.setenv('COLLIE_TPU_WHOLE_FIT', '1')
    rng = np.random.default_rng(0)
    genres = rng.integers(0, 4, size=implicit_train.num_items)
    meta = {'genre': np.eye(4, dtype=np.float32)[genres].T}
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0,
                                     metadata_for_loss=meta,
                                     metadata_for_loss_weights={'genre': 0.25})
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    keys_after_first = set(model._compiled_fn_cache)
    fp_first = model._loss_semantics_fingerprint()

    model.hparams['num_epochs_completed'] = 0
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    assert model._loss_semantics_fingerprint() == fp_first
    assert set(model._compiled_fn_cache) == keys_after_first, \
        'second identical fit must reuse the cached programs'


def test_metadata_fingerprint_safe_against_id_recycling_without_pinning():
    """Fingerprint tokens are minted per array *generation*: a gc'd array's
    id() can never be recycled onto replacement metadata (which would
    silently reuse the compiled program with the OLD metadata baked in as
    constants) — and stale generations are NOT pinned, so sweeping over
    metadata variants cannot leak device memory."""
    import gc

    from collie_tpu.data.synthetic import generate_interactions_df
    from collie_tpu.utils import df_to_interactions

    df = generate_interactions_df(seed=0)
    inter = df_to_interactions(df, user_col='user_id', item_col='item_id',
                               ratings_col='rating')
    meta = {'genre': np.eye(4, dtype=np.float32)[
        np.zeros(inter.num_items, dtype=np.int64)].T}
    model = MatrixFactorizationModel(train=inter, embedding_dim=8, lr=1e-1,
                                     loss='adaptive', seed=0,
                                     metadata_for_loss=meta,
                                     metadata_for_loss_weights={'genre': 0.25})
    fp1 = model._loss_semantics_fingerprint()
    # same arrays -> same fingerprint (token is cached, not re-minted)
    assert model._loss_semantics_fingerprint() == fp1

    old = model.metadata_for_loss['genre']
    old_id = id(old)
    model.metadata_for_loss = {
        'genre': jnp.asarray(np.eye(4, dtype=np.float32)[
            np.ones(inter.num_items, dtype=np.int64)].T)}
    del old, meta
    gc.collect()
    fp2 = model._loss_semantics_fingerprint()
    assert fp1 != fp2

    # the gc'd generation was evicted (no pin), and even an id() collision
    # with the dead array would mint a fresh token
    assert old_id not in model._loss_fp_refs or \
        model._loss_fp_refs[old_id][1]() is not None
    live_entries = [e for e in model._loss_fp_refs.values() if e[1]() is not None]
    assert len(live_entries) == len(model._loss_fp_refs)


def test_whole_fit_early_stopping_across_flights(implicit_train, monkeypatch):
    """Round-5 flight dispatch: blocks go to device in flights of 4 with one
    host sync per flight, so a stop inside flight 1 must (a) still report
    the same stop epoch/best as the per-epoch loop and (b) leave the
    post-stop epochs (including whole later flights) masked out of the
    replay.  120 epochs = blocks [16 x 7, 8] = two flights."""
    p1, t1, m1 = _fit(implicit_train, monkeypatch, True, epochs=120, lr=0.0,
                      bias_lr=0.0, patience=2, scheduler=None)
    p0, t0, m0 = _fit(implicit_train, monkeypatch, False, epochs=120, lr=0.0,
                      bias_lr=0.0, patience=2, scheduler=None)
    assert m1.hparams['num_epochs_completed'] == \
        m0.hparams['num_epochs_completed'] < 120
    assert t1.best_epoch_loss[0] == t0.best_epoch_loss[0]
    np.testing.assert_allclose(t1.best_epoch_loss[1], t0.best_epoch_loss[1],
                               rtol=1e-6)
    for k in p0:
        np.testing.assert_allclose(p1[k], p0[k], rtol=0, atol=1e-6)
