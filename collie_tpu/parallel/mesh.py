"""Device-mesh construction.

The reference's only distribution story is handing ``gpus=k`` to
PyTorch-Lightning (DDP/NCCL under the hood,
``/root/reference/collie/model/base/trainer.py:71-79``).  The TPU-native
replacement (SURVEY §2.8) is one ``jax.sharding.Mesh`` with two axes:

* ``data`` — batch rows are sharded here (data parallelism; the loss
  reduction's cross-device psum is inserted by XLA GSPMD);
* ``model`` — embedding-table rows and their optimizer moments are sharded
  here (tensor parallelism for the only large parameters in the workload).

There is no pipeline or expert axis: the deepest zoo model is a few tiny MLP
layers (reference ``neural_collaborative_filtering.py:133-141``), which stay
replicated.  The sequence-parallel analog is item-axis-sharded full-catalog
scoring at evaluation time (see ``collie_tpu.parallel.sharding``).
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(data: Optional[int] = None,
              model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``data=None`` uses all remaining devices on the data axis.

    On TPU the device grid is laid out with
    ``jax.experimental.mesh_utils.create_device_mesh``, which orders devices
    so mesh neighbors are ICI (torus) neighbors — the ``model`` axis (the
    collective-heavy one: psum/all-gather of sharded-table lookups every
    step) rides nearest-neighbor links instead of whatever order the runtime
    enumerated the chips in.  Multi-host processes (``jax.distributed``
    initialized) see the same global device list from ``jax.devices()``, so
    the identical call builds the pod-wide mesh; put ``model`` within a host
    (ICI) and let ``data`` span hosts (DCN) — see docs/ARCHITECTURE.md.
    """
    explicit_devices = devices is not None
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f'{n} devices not divisible by model={model}'
        data = n // model
    assert data * model == n, (
        f'mesh {data}x{model} does not match {n} available devices'
    )
    if not explicit_devices and devices and devices[0].platform == 'tpu':
        try:
            from jax.experimental import mesh_utils
            dev_array = mesh_utils.create_device_mesh((data, model),
                                                      devices=devices)
        except Exception:
            # unknown topologies (e.g. single chip over a tunnel) fall back
            # to enumeration order — correct, just not locality-optimized
            dev_array = np.asarray(devices).reshape(data, model)
    else:
        dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
