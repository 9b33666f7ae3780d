"""Multi-process (multi-host) execution support.

The reference's whole multi-device story is handing ``gpus=k`` to
PyTorch-Lightning (DDP/NCCL under the hood,
``/root/reference/collie/model/base/trainer.py:71-79``).  The TPU-native
multi-HOST analog is JAX's multi-controller model: every process runs the
same program, ``jax.distributed.initialize`` connects them, ``jax.devices()``
returns the pod-wide device list, and one global ``Mesh`` spans all
processes.  The single-process mesh code (GSPMD shardings, shard_map
collectives) is then already pod-ready — what this module adds is the host
side: creating *global* arrays from per-process uploads so each host feeds
only its addressable shard (``jax.make_array_from_callback`` materializes
exactly the local slices), instead of every host uploading a full replica.

Launch pattern (one process per host; same script everywhere)::

    from collie_tpu.parallel import distributed, make_mesh
    distributed.initialize(coordinator_address='host0:1234',
                           num_processes=N, process_id=i)  # no-op if N == 1
    mesh = make_mesh(model=...)        # spans all N processes' devices
    trainer = CollieTrainer(model, mesh=mesh, ...)
    trainer.fit(model)                 # epoch data fed per-process

On real pods ``initialize()`` with no arguments picks the coordinator from
the TPU environment; the explicit form is what the 2-process CPU tests use.
Every process must hold the same ``Interactions`` (the dataset is host-side
and small next to the tables; the scale axis multi-host buys is chip count
and table HBM) — uploads are sliced per process from it.
"""
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from collie_tpu.parallel.mesh import DATA_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               **kwargs: Any) -> None:
    """Connect this process to the multi-process runtime.

    Thin wrapper over ``jax.distributed.initialize``: a no-op when
    ``num_processes`` is 1 (so single-host scripts can call it
    unconditionally) or when the runtime is already initialized.
    """
    if num_processes == 1:
        return
    # NOTE: do not touch jax.process_count()/jax.devices() here — any backend
    # query initializes XLA, after which jax.distributed.initialize refuses
    # to run.  The already-initialized check reads the runtime state object.
    from jax._src import distributed as _jd
    if getattr(_jd.global_state, 'client', None) is not None:
        return  # already initialized
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_global(x, sharding: NamedSharding):
    """Create a (possibly multi-process) global array with ``sharding``.

    Single-process this is ``jax.device_put``.  Multi-process,
    ``jax.make_array_from_callback`` materializes only the shards addressable
    from this process — each host uploads its slice of ``x`` and nothing
    else, which is the per-process feeding the DDP analog needs.  ``x`` must
    be the same full (global) host array on every process.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array):
        if x.sharding == sharding:
            return x
        if not x.is_fully_addressable:
            raise ValueError(
                'cannot re-shard a non-addressable global array host-side; '
                'pass the host numpy array instead')
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def put_replicated(x, mesh: Mesh):
    """Fully-replicated global array (each process uploads to local devices)."""
    return put_global(x, NamedSharding(mesh, P()))


def put_epoch_array(x, mesh: Mesh, axis: int = 0):
    """Shard a host epoch array over the ``data`` mesh axis on ``axis``.

    Falls back to replication when the dimension does not divide the data
    axis (the scan engine pads its flat epoch arrays so the common leaves
    always shard).
    """
    x = np.asarray(x)
    n_data = mesh.shape[DATA_AXIS]
    if x.ndim > axis and x.shape[axis] % n_data == 0:
        spec = [None] * x.ndim
        spec[axis] = DATA_AXIS
        return put_global(x, NamedSharding(mesh, P(*spec)))
    return put_replicated(x, mesh)


def fingerprint_arrays(*arrays) -> np.ndarray:
    """64-bit content fingerprint of host arrays (dtype + shape + bytes)."""
    import hashlib
    h = hashlib.blake2b(digest_size=8)
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return np.frombuffer(h.digest(), dtype=np.uint64).copy()


def assert_same_across_processes(tag: str, *arrays) -> None:
    """Fail loudly if ``arrays`` differ between processes.

    ``put_global`` requires every process to hold the SAME full host array —
    a divergent copy (e.g. per-host shuffled datasets) would train silently
    wrong, each host uploading different shards of what the program treats
    as one global array.  Lightning's DDP sampler gives the reference this
    for free (``/root/reference/collie/model/base/trainer.py:71-79``); here
    a 64-bit fingerprint is all-gathered at fit start and compared.
    No-op single-process.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    fp = fingerprint_arrays(*arrays)
    all_fp = np.asarray(multihost_utils.process_allgather(fp)).reshape(-1)
    if not (all_fp == all_fp[0]).all():
        bad = [i for i, v in enumerate(all_fp) if v != all_fp[0]]
        raise ValueError(
            f'{tag} differs across processes (fingerprints {all_fp.tolist()}, '
            f'mismatched process ids {bad}): every process must construct '
            'the identical dataset (same arrays, same order, same seed) '
            'before a multi-process fit.')


def fetch(x) -> np.ndarray:
    """Bring a global array to host.  Replicated / fully-addressable arrays
    convert directly; otherwise all-gather the shards across processes."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
