"""Pallas TPU kernel: fused tile scoring + per-tile top-k extraction.

The Pallas tier of the rebuild (SURVEY §2.9: the reference has no native
code — all GPU compute is stock torch kernels — so the TPU-native "native
tier" is Mosaic kernels for the hot paths).  This kernel serves the retrieval
hot loop: for each item tile it computes the MF score block
``user_emb @ tile.T + item_bias`` on the MXU and immediately reduces it to the
tile's top-k candidates in VMEM — the ``[block_users, tile]`` score matrix
never reaches HBM; only ``[n_tiles, block_users, 128]`` candidate lanes do,
which a single ``lax.top_k`` merge then collapses.

Mosaic tiling notes: last dims must be 128-lane aligned, so the embedding dim
is zero-padded to a multiple of 128 and the per-tile candidate buffer is one
full 128 lane (k <= 128).  The per-user bias is added outside the kernel — a
constant per row cannot change that row's ranking.

Top-k inside the kernel is k unrolled rounds of (max, lowest-index-of-max via
broadcasted iota, mask) on the VPU — ties resolve to the lowest item index,
matching ``lax.top_k``.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _topk_tile_kernel(user_emb_ref, item_tile_ref,
                      scores_out_ref, ids_out_ref, *, k: int, num_items: int,
                      tile: int):
    tile_idx = pl.program_id(0)
    base = tile_idx * tile

    # MXU: [B, D+] x [D+, T] score block. The item bias rides along as an
    # extra embedding column (user side is the constant 1), so a single
    # matmul produces the fully-biased scores.  HIGHEST precision keeps the
    # scores (and hence the top-k boundary) identical to the non-kernel
    # scoring paths.
    scores = jnp.dot(user_emb_ref[:], item_tile_ref[:].T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    # mask catalog-padding columns
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    valid = (base + col_ids) < num_items
    scores = jnp.where(valid, scores, NEG_INF)

    B = scores.shape[0]
    out_scores = jnp.full((B, _LANE), NEG_INF, dtype=jnp.float32)
    out_ids = jnp.zeros((B, _LANE), dtype=jnp.int32)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (B, _LANE), dimension=1)

    # k rounds of max + lowest-index argmax + mask (fully vectorized selects)
    for j in range(k):
        row_max = jnp.max(scores, axis=1, keepdims=True)
        is_max = scores == row_max
        idx = jnp.min(jnp.where(is_max, col_ids, tile), axis=1, keepdims=True)
        out_scores = jnp.where(lane_ids == j, row_max, out_scores)
        out_ids = jnp.where(lane_ids == j, base + idx, out_ids)
        scores = jnp.where(col_ids == idx, NEG_INF, scores)

    scores_out_ref[0] = out_scores
    ids_out_ref[0] = out_ids


@functools.partial(jax.jit, static_argnames=('k', 'tile', 'interpret'))
def mf_topk_retrieve(user_embeddings: jnp.ndarray,
                     user_biases: jnp.ndarray,
                     item_embeddings: jnp.ndarray,
                     item_biases: jnp.ndarray,
                     k: int = 10,
                     tile: int = 2048,
                     interpret: bool = False):
    """Fused MF top-k over the full catalog.

    ``user_embeddings [B, D]`` (the already-gathered user block),
    ``user_biases [B]``, ``item_embeddings [num_items, D]``,
    ``item_biases [num_items]`` -> ``(top_ids [B, k], top_scores [B, k])``.
    ``B`` should be a multiple of 8 (f32 sublane tiling); ``k <= 128``.
    """
    assert k <= _LANE, f'kernel supports k <= {_LANE}, got {k}'
    B, D = user_embeddings.shape
    num_items = item_embeddings.shape[0]
    n_tiles = -(-num_items // tile)
    padded_items = n_tiles * tile
    D_pad = _round_up(D + 1, _LANE)  # +1 column carries the item bias
    B_pad = _round_up(max(B, 1), 8)

    user_embeddings = jnp.pad(user_embeddings, ((0, B_pad - B), (0, D_pad - D)))
    user_embeddings = user_embeddings.at[:B, D].set(1.0)
    item_embeddings = jnp.pad(item_embeddings,
                              ((0, padded_items - num_items), (0, D_pad - D)))
    item_embeddings = item_embeddings.at[:num_items, D].set(item_biases)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B_pad, D_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B_pad, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_pad, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    kernel = functools.partial(_topk_tile_kernel, k=k, num_items=num_items,
                               tile=tile)
    tile_scores, tile_ids = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, B_pad, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, B_pad, _LANE), jnp.int32),
        ],
        interpret=interpret,
    )(user_embeddings, item_embeddings)

    # final merge: [B, n_tiles * k] candidates -> top-k; re-add the per-user
    # bias (rank-invariant) to report exact scores
    tile_scores = tile_scores[:, :B, :k]
    tile_ids = tile_ids[:, :B, :k]
    cand_scores = tile_scores.transpose(1, 0, 2).reshape(B, n_tiles * k)
    cand_ids = tile_ids.transpose(1, 0, 2).reshape(B, n_tiles * k)
    top_scores, idx = jax.lax.top_k(cand_scores, k)
    return (jnp.take_along_axis(cand_ids, idx, axis=1),
            top_scores + user_biases[:, None])
