"""Sharding rules for params, optimizer state, and batches.

TPU-native replacement for the reference's Lightning-delegated data
parallelism (SURVEY §2.8): annotate ``NamedSharding``s and let XLA GSPMD
insert the ICI collectives.

Rules:

* embedding / bias tables (leading dim = num_users or num_items) are
  row-sharded over the ``model`` axis when divisible, else replicated;
* every other parameter (MLP towers are tiny) is replicated;
* optimizer moments inherit each parameter's sharding by initializing the
  optax state under ``jit`` from already-sharded params (XLA propagates);
* batch leaves are sharded over the ``data`` axis on their leading dim.
"""
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from collie_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def param_spec(name: str, value: jnp.ndarray, mesh: Mesh) -> P:
    """PartitionSpec for a single flat param."""
    model_size = mesh.shape[MODEL_AXIS]
    shard_rows = (
        model_size > 1
        and value.ndim >= 1
        and value.shape[0] % model_size == 0
        and ('embedding' in name or 'bias' in name)
    )
    if shard_rows:
        return P(MODEL_AXIS, *([None] * (value.ndim - 1)))
    return P()


def param_shardings(params: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, NamedSharding]:
    return {
        name: NamedSharding(mesh, param_spec(name, value, mesh))
        for name, value in params.items()
    }


def shard_params(params: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    shardings = param_shardings(params, mesh)
    return {
        name: jax.device_put(value, shardings[name]) for name, value in params.items()
    }


def shard_batch_fn(mesh: Mesh):
    """Returns ``batch -> batch`` placing every leaf row-sharded over ``data``
    (replicated over ``model``)."""
    def _shard(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        out = {}
        for key, value in batch.items():
            spec = P(DATA_AXIS, *([None] * (np.ndim(value) - 1)))
            out[key] = jax.device_put(jnp.asarray(value), NamedSharding(mesh, spec))
        return out
    return _shard


def init_sharded_opt_states(specs, params: Dict[str, jnp.ndarray]) -> Tuple[Any, ...]:
    """Initialize each spec's optax state under jit so moments inherit the
    (possibly sharded) layout of their params."""
    return tuple(
        jax.jit(spec.transform.init)({k: params[k] for k in spec.keys})
        for spec in specs
    )
