"""Multi-process (multi-host) execution: 2 processes x 4 devices == 1 x 8.

The reference's multi-device story is delegating to Lightning DDP
(``/root/reference/collie/model/base/trainer.py:71-79``); the rebuild's is
JAX's multi-controller model (``collie_tpu.parallel.distributed``).  These
tests spawn REAL separate processes connected through
``jax.distributed.initialize`` (CPU Gloo collectives) and assert that a fit
over the same global 8-device mesh produces the same per-epoch train losses
and eval metrics as the single-process run — per-process epoch feeding and
the cross-process collectives change where data lives, not the math.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

DRIVER = Path(__file__).parent / 'drivers' / 'multiproc_driver.py'
REPO = Path(__file__).resolve().parents[1]


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env['PYTHONPATH'] = os.pathsep.join(
        [str(REPO)] + env.get('PYTHONPATH', '').split(os.pathsep))
    # fresh interpreters must not inherit the suite's forced platform flags
    env.pop('XLA_FLAGS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    return env


def _run_driver(extra, local_devices, num_processes=1, timeout=420,
                expect_ok=True):
    """Launch ``num_processes`` copies of the driver; return proc 0's JSON.

    ``expect_ok=False`` returns the raw ``(rc, stdout, stderr)`` list instead
    (for negative tests that assert a loud failure)."""
    port = _free_port()
    base = [sys.executable, str(DRIVER), '--port', str(port),
            '--local-devices', str(local_devices),
            '--num-processes', str(num_processes)] + extra
    procs = [subprocess.Popen(base + ['--process-id', str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True, env=_env())
             for i in range(num_processes)]
    outs = []
    try:
        for proc in procs:
            out, err = proc.communicate(timeout=timeout)
            outs.append((proc.returncode, out, err))
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
    if not expect_ok:
        return outs
    for rc, out, err in outs:
        assert rc == 0, f'driver failed (rc={rc})\n{out[-2000:]}\n{err[-3000:]}'
    for rc, out, err in outs:
        for line in out.splitlines():
            if line.startswith('RESULT '):
                return json.loads(line[len('RESULT '):])
    raise AssertionError(f'no RESULT line in driver output: {outs[0][1][-2000:]}')


@pytest.fixture(scope='module')
def single_process_result():
    return _run_driver(['--mode', 'train'], local_devices=8)


@pytest.fixture(scope='module')
def two_process_result():
    return _run_driver(['--mode', 'train'], local_devices=4, num_processes=2)


def test_two_process_losses_match_single_process(single_process_result,
                                                 two_process_result):
    single = single_process_result['train_losses']
    multi = two_process_result['train_losses']
    assert len(single) == len(multi) == 3
    np.testing.assert_allclose(multi, single, rtol=1e-4)


def test_two_process_eval_matches_single_process(single_process_result,
                                                 two_process_result):
    assert two_process_result['mapk'] == pytest.approx(
        single_process_result['mapk'], rel=1e-4)
    assert two_process_result['mrr'] == pytest.approx(
        single_process_result['mrr'], rel=1e-4)
    # the fit actually learned something
    assert single_process_result['mapk'] > 0.05


def test_two_process_sharded_checkpoint_resume(tmp_path):
    result = _run_driver(['--mode', 'resume', '--ckpt-dir', str(tmp_path)],
                         local_devices=4, num_processes=2)
    # epochs 3-4 after restore match the uninterrupted run's epochs 3-4
    np.testing.assert_allclose(result['resumed_losses'],
                               result['uninterrupted_losses'][2:], rtol=1e-4)
    # per-shard layout on disk: BOTH processes wrote shard data (round-robin
    # ownership), and no entry is a full item table (128 x 16) — tables are
    # written shard-by-shard, never materialized whole
    shard_dir = tmp_path / 'a' / 'checkpoint_epoch_2.shards'
    files = sorted(p.name for p in shard_dir.iterdir())
    assert 'meta.pkl' in files
    assert 'shards_p0.npz' in files and 'shards_p1.npz' in files
    wrote_2d = []
    for p in range(2):
        with np.load(shard_dir / f'shards_p{p}.npz') as z:
            arrs = [z[name] for name in z.files]
        wrote_2d.append(any(a.ndim == 2 for a in arrs))
        for arr in arrs:
            assert arr.ndim < 2 or arr.shape[0] < 128, (
                'full item table materialized in one shard entry')
    assert all(wrote_2d), 'checkpoint I/O not spread across processes'


from tests.fixtures.loggers import EpochLossLogger as _ListLogger


def _resume_in_process(ckpt, mesh):
    """Restore ``ckpt`` in THIS (single-process) interpreter under ``mesh``
    (None = plain single-device training) and fit to epoch 4."""
    from __graft_entry__ import _tiny_model
    from collie_tpu.training.trainer import CollieTrainer

    model, _ = _tiny_model(batch_size=64)
    logger = _ListLogger()
    trainer = CollieTrainer(model, max_epochs=4, verbosity=0, mesh=mesh,
                            seed=0, logger=logger)
    assert trainer.resume_from_checkpoint(ckpt) == 2
    trainer.fit(model)
    return logger.epoch_losses


@pytest.fixture(scope='module')
def two_process_checkpoint(tmp_path_factory):
    """A per-shard checkpoint written BY a real 2-process x 4-device run,
    plus that topology's uninterrupted 4-epoch loss trajectory."""
    tmp = tmp_path_factory.mktemp('xtopo')
    result = _run_driver(['--mode', 'save', '--ckpt-dir', str(tmp)],
                         local_devices=4, num_processes=2)
    return tmp / 'a' / 'checkpoint_epoch_2.shards', result


def test_restore_two_process_checkpoint_on_single_process_mesh(
        two_process_checkpoint):
    """Topology change: 2 procs x 4 devices -> 1 proc x 8 devices.

    Shard boundaries match the saved ones, but the restoring process must
    read BOTH saved npz files (round-robin ownership spread entries over the
    two writers)."""
    from collie_tpu.parallel import make_mesh

    ckpt, saved = two_process_checkpoint
    losses = _resume_in_process(ckpt, mesh=make_mesh(model=2))
    np.testing.assert_allclose(losses, saved['uninterrupted_losses'][2:],
                               rtol=1e-4)


def test_restore_two_process_checkpoint_on_single_device(
        two_process_checkpoint):
    """Topology change: 2 procs x 4 devices -> ONE device, no mesh.

    The restore sharding (single full-array shard) matches none of the saved
    shard indexes, exercising the assemble-from-overlapping-pieces path in
    ``parallel/checkpoint.py::load_sharded_pytree``."""
    ckpt, saved = two_process_checkpoint
    losses = _resume_in_process(ckpt, mesh=None)
    np.testing.assert_allclose(losses, saved['uninterrupted_losses'][2:],
                               rtol=1e-4)


def test_restore_two_process_checkpoint_on_wider_model_axis(
        two_process_checkpoint):
    """Topology change: saved with model=2 row shards, restored with model=4.

    Every restored shard is half of a saved shard -> the assembly path must
    slice WITHIN saved pieces (not just concatenate whole ones)."""
    from collie_tpu.parallel import make_mesh

    ckpt, saved = two_process_checkpoint
    losses = _resume_in_process(ckpt, mesh=make_mesh(model=4))
    np.testing.assert_allclose(losses, saved['uninterrupted_losses'][2:],
                               rtol=1e-4)


def test_divergent_data_fails_loudly_at_fit_start():
    """DDP-analog safety: if one process holds a different dataset, the
    fit-start fingerprint all-gather must abort the run with a clear error
    instead of training silently wrong (trainer.py fit preamble +
    ``parallel/distributed.py::assert_same_across_processes``)."""
    outs = _run_driver(['--mode', 'train', '--corrupt'],
                       local_devices=4, num_processes=2, expect_ok=False)
    assert any(rc != 0 for rc, _, _ in outs), 'corrupted fit did not fail'
    combined = '\n'.join(err for _, _, err in outs)
    assert 'differs across processes' in combined
