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
    from collie_tpu.parallel.distributed import put_global
    shardings = param_shardings(params, mesh)
    return {
        name: put_global(value, shardings[name]) for name, value in params.items()
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


def make_sharded_init(transform, mesh: Mesh):
    """Optimizer-state init whose outputs carry the params' shardings.

    ``optax``'s ``init`` builds moments with ``zeros_like`` — shape-only, so
    XLA sees the sharded params as unused operands and places every output
    on the default device.  Forcing ``out_shardings`` pins each moment leaf
    (matched to its param by dict key + shape) to its param's sharding and
    everything else (counts, injected lr) replicated — required for moments
    to genuinely shard, and for multi-process fits, where a process-local
    state could not feed the global program at all.
    """
    from jax import tree_util as jtu

    replicated = NamedSharding(mesh, P())
    jitted = {}

    def init(sub_params):
        akey = tuple(sorted(
            (k, v.shape, str(v.dtype), v.sharding)
            for k, v in sub_params.items()))
        if akey not in jitted:
            shapes = jax.eval_shape(transform.init, sub_params)

            def pick(path, aval):
                key = None
                for entry in reversed(path):
                    if isinstance(entry, jtu.DictKey):
                        key = entry.key
                        break
                if key in sub_params and aval.shape == sub_params[key].shape:
                    return sub_params[key].sharding
                return replicated

            out_shardings = jtu.tree_map_with_path(pick, shapes)
            jitted[akey] = jax.jit(transform.init, out_shardings=out_shardings)
        return jitted[akey](sub_params)

    return init


def init_sharded_opt_states(specs, params: Dict[str, jnp.ndarray],
                            mesh: Mesh = None) -> Tuple[Any, ...]:
    """Initialize each spec's optax state so moments inherit the (possibly
    sharded) layout of their params."""
    if mesh is not None:
        return tuple(
            make_sharded_init(spec.transform, mesh)(
                {k: params[k] for k in spec.keys})
            for spec in specs
        )
    return tuple(
        jax.jit(spec.transform.init)({k: params[k] for k in spec.keys})
        for spec in specs
    )
