"""Explicitly-sharded embedding lookup over the ``model`` mesh axis.

Under plain ``jit`` + ``NamedSharding``, a gather from a row-sharded table
lets XLA GSPMD choose the collective — which may be an all-gather of the
*table* (bad when the table is the big thing).  This primitive pins the
efficient schedule with ``shard_map`` (SURVEY §2.8 "explicit shard_map
all-to-all for sharded-embedding lookups"):

1. every device holds rows ``[shard * rows_per_shard, (shard+1) * rows_per_shard)``;
2. each device gathers the requested ids clipped to its local range and
   zeroes the rest;
3. one ``psum`` over the ``model`` axis combines the partial rows.

Communication is ``O(batch x dim)`` (the activations), never
``O(table)``.  The backward of the masked local gather is a local
scatter-add, so gradients shard identically to the table.
"""
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from collie_tpu.ops.embeddings import embedding_lookup
from collie_tpu.parallel.mesh import MODEL_AXIS


def sharded_embedding_lookup(table: jnp.ndarray,
                             ids: jnp.ndarray,
                             mesh: Mesh) -> jnp.ndarray:
    """Lookup ``table[ids]`` where ``table`` is row-sharded over ``model``.

    ``table [num_rows, dim]`` (``num_rows`` divisible by the model-axis
    size), ``ids [batch]`` (replicated over ``model``) -> ``[batch, dim]``
    replicated over ``model``.
    """
    num_rows = table.shape[0]
    n_shards = mesh.shape[MODEL_AXIS]
    assert num_rows % n_shards == 0, (
        f'table rows ({num_rows}) must divide the model axis ({n_shards}); '
        'pad the table or replicate it instead'
    )
    rows_per_shard = num_rows // n_shards

    def local_lookup(table_shard, ids):
        shard = jax.lax.axis_index(MODEL_AXIS)
        start = shard * rows_per_shard
        local = ids - start
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        # via ops.embeddings.embedding_lookup: bf16 tables upcast post-gather
        # AND the backward scatter-add accumulates row collisions at f32
        # (its custom vjp) — forward-only upcasting here would reintroduce
        # the naive-bf16-accumulation gradient loss it exists to prevent
        rows = embedding_lookup(table_shard, safe)
        rows = jnp.where(in_range[:, None], rows, 0.0)
        return jax.lax.psum(rows, MODEL_AXIS)

    data_axes = tuple(name for name in mesh.axis_names if name != MODEL_AXIS)
    return shard_map(
        local_lookup,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(*data_axes) if data_axes else P()),
        out_specs=P(*data_axes) if data_axes else P(),
        check_vma=False,
    )(table, ids)


def shard_table(table: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a table row-sharded over the ``model`` axis."""
    return jax.device_put(table, NamedSharding(mesh, P(MODEL_AXIS, None)))
