"""Out-of-core chunked scan tier (``scan_engine.build_hdf5_chunk_make``).

Round-5 replacement for the per-step HDF5 path as the default out-of-core
engine: one dispatched program per chunk of batches, host reads overlapping
device compute.  Reference counterpart: the out-of-core training promise of
``/root/reference/collie/interactions/datasets.py:565-733`` +
``dataloaders.py:297-397``.
"""
import os

import h5py
import numpy as np
import pytest

from collie_tpu.data import HDF5InteractionsDataLoader, write_hdf5_meta
from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
from collie_tpu.training.scan_engine import hdf5_chunk_plan
from collie_tpu.training.trainer import CollieTrainer


def test_chunk_plan_pow2_tail():
    assert hdf5_chunk_plan(41, 16) == [(0, 16), (16, 16), (32, 8), (40, 1)]
    assert hdf5_chunk_plan(3, 16) == [(0, 2), (2, 1)]
    assert hdf5_chunk_plan(16, 16) == [(0, 16)]
    assert hdf5_chunk_plan(1, 64) == [(0, 1)]


def test_chunk_plan_covers_exactly_and_bounds_programs():
    for total in (1, 5, 17, 63, 64, 65, 200, 1023):
        plan = hdf5_chunk_plan(total, 64)
        # contiguous exact cover -> padding can only be the final batch's
        # sub-B remainder, so no scanned step is ever fully padding (which
        # would still decay Adam moments, unlike the per-step engine)
        pos = 0
        for start, steps in plan:
            assert start == pos and steps >= 1
            pos += steps
        assert pos == total
        # program ladder: distinct compile shapes bounded by log2(max)+1
        assert len({s for _, s in plan}) <= 7


def _write_store(path, users, items, num_users, num_items):
    with h5py.File(path, 'w') as f:
        g = f.require_group('interactions')
        g.create_dataset('user_id', data=users)
        g.create_dataset('item_id', data=items)
    write_hdf5_meta(path, num_users, num_items)


@pytest.fixture()
def ragged_store(tmp_path):
    # ragged on purpose: n % B != 0 AND total steps % chunk_steps != 0
    rng = np.random.default_rng(0)
    NU, NI, N = 120, 90, 256 * 9 + 37
    users = rng.integers(0, NU, N).astype(np.int32)
    items = rng.integers(0, NI, N).astype(np.int32)
    path = str(tmp_path / 'x.h5')
    _write_store(path, users, items, NU, NI)
    return path, NU, NI, N


def _fit(path, seed, epochs=3, chunk_steps='4', epoch_mode='auto', **trainer_kw):
    old = os.environ.get('COLLIE_TPU_HDF5_CHUNK_STEPS')
    os.environ['COLLIE_TPU_HDF5_CHUNK_STEPS'] = chunk_steps
    try:
        loader = HDF5InteractionsDataLoader(
            hdf5_path=path, batch_size=256, shuffle=True,
            num_negative_samples=5, seed=seed)
        model = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                         lr=1e-1, loss='adaptive_hinge',
                                         seed=seed)
        trainer = CollieTrainer(model, max_epochs=epochs, verbosity=0,
                                seed=seed, epoch_mode=epoch_mode, **trainer_kw)
        trainer.fit(model)
        return model, trainer
    finally:
        if old is None:
            os.environ.pop('COLLIE_TPU_HDF5_CHUNK_STEPS', None)
        else:
            os.environ['COLLIE_TPU_HDF5_CHUNK_STEPS'] = old


def test_chunked_tier_selected_and_trains(ragged_store):
    path, NU, NI, N = ragged_store
    model, trainer = _fit(path, seed=7)
    # the chunked tier was actually selected (program slot exists) and the
    # tail decomposed into the pow2 ladder (several distinct chunk programs)
    slots = [k for k in model._compiled_fn_cache if k[0] == 'hdf5_train']
    assert len(slots) == 1
    fns = next(iter(model._compiled_fn_cache[slots[0]].values()))['fns']
    assert set(fns) == {4, 2}              # 10 steps = 2x4 + pow2 tail of 2
    for k, v in model.params.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert trainer.last_fit_examples_per_sec is not None
    assert trainer.global_step == 3 * (-(-N // 256))


def test_chunked_tier_deterministic(ragged_store):
    path, *_ = ragged_store
    m1, _ = _fit(path, seed=11)
    m2, _ = _fit(path, seed=11)
    for k in m1.params:
        np.testing.assert_array_equal(np.asarray(m1.params[k]),
                                      np.asarray(m2.params[k]))
    m3, _ = _fit(path, seed=12)
    assert any(
        not np.array_equal(np.asarray(m1.params[k]), np.asarray(m3.params[k]))
        for k in m1.params)


def test_chunked_tier_learns_planted_structure(tmp_path):
    # planted block structure: users < 40 interact only with items < 30 —
    # after a few epochs the model must rank in-block items above random
    rng = np.random.default_rng(3)
    NU, NI, N = 80, 60, 6000
    users = rng.integers(0, 40, N).astype(np.int32)
    items = rng.integers(0, 30, N).astype(np.int32)
    # pin the id extremes so meta inference is exercised consistently
    users[0], items[0] = NU - 1, NI - 1
    users[1], items[1] = 0, 0
    path = str(tmp_path / 'planted.h5')
    _write_store(path, users, items, NU, NI)
    model, _ = _fit(path, seed=5, epochs=12, chunk_steps='8')
    import jax.numpy as jnp
    scores = np.asarray(model.score_all_items(
        model.params, jnp.arange(5, dtype=jnp.int32)))
    in_block = scores[:, :30].mean()
    out_block = scores[:, 30:].mean()
    assert in_block > out_block


def test_chunk_env_zero_falls_back_to_per_step(ragged_store):
    path, *_ = ragged_store
    model, _ = _fit(path, seed=7, epochs=1, chunk_steps='0')
    assert not any(k[0] == 'hdf5_train' for k in model._compiled_fn_cache)
    assert any(k[0] == 'steps' for k in model._compiled_fn_cache)


def test_step_mode_bypasses_chunk_tier(ragged_store):
    path, *_ = ragged_store
    model, _ = _fit(path, seed=7, epochs=1, epoch_mode='step')
    assert not any(k[0] == 'hdf5_train' for k in model._compiled_fn_cache)


def test_read_chunk_matches_store(ragged_store):
    path, NU, NI, N = ragged_store
    loader = HDF5InteractionsDataLoader(hdf5_path=path, batch_size=256,
                                        num_negative_samples=5, seed=0)
    u, i = loader.interactions.read_chunk(100, 300)
    with h5py.File(path, 'r') as f:
        np.testing.assert_array_equal(
            u, f['interactions/user_id'][100:300].astype(np.int32))
        np.testing.assert_array_equal(
            i, f['interactions/item_id'][100:300].astype(np.int32))


def test_chunked_loss_matches_per_step_scale(ragged_store):
    # same data, same model config: the chunked tier's reported epoch loss
    # must sit at the per-step engine's scale (RNG streams differ, so exact
    # equality is not expected — this guards the mean-over-real-steps
    # normalization against padded-step dilution)
    path, *_ = ragged_store
    m_chunk, _ = _fit(path, seed=7, epochs=1)
    m_step, _ = _fit(path, seed=7, epochs=1, epoch_mode='step')

    import jax.numpy as jnp  # noqa: F401
    # re-run one epoch each, capturing the reported loss via verbose replay
    # (fit already ran; easier: compare fresh fits' first-epoch losses)
    losses = {}
    for label, mode, chunk in (('chunk', 'auto', '4'), ('step', 'step', '4')):
        loader = HDF5InteractionsDataLoader(
            hdf5_path=path, batch_size=256, shuffle=True,
            num_negative_samples=5, seed=21)
        model = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                         lr=1e-3, loss='adaptive_hinge',
                                         seed=21)

        class Cap:
            def __init__(self):
                self.metrics = []

            def log_metrics(self, metrics, step):
                self.metrics.append(metrics)

        cap = Cap()
        os.environ['COLLIE_TPU_HDF5_CHUNK_STEPS'] = chunk
        try:
            CollieTrainer(model, max_epochs=1, verbosity=0, seed=21,
                          epoch_mode=mode, logger=cap).fit(model)
        finally:
            os.environ.pop('COLLIE_TPU_HDF5_CHUNK_STEPS', None)
        losses[label] = [m['train_loss_epoch'] for m in cap.metrics
                         if 'train_loss_epoch' in m][0]
    assert losses['chunk'] == pytest.approx(losses['step'], rel=0.05)
