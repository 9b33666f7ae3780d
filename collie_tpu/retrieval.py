"""Batch top-k retrieval (serving path).

The reference's only retrieval API is single-user full-catalog scoring
(``get_item_predictions``, ``/root/reference/collie/model/base/base_pipeline.py:656-718``:
score all items, sort in pandas, drop seen rows on the host).  This module is
the production-serving counterpart the TPU rebuild adds:

* **blockwise**: items are scored in tiles and a running top-k is merged per
  tile (``lax.scan`` + ``lax.top_k``), so memory is ``O(batch * (k + tile))``
  — the full ``[batch, num_items]`` score matrix is never materialized,
  which is what makes 10M+-item catalogs feasible;
* **seen filtering on device**: membership against the train/val CSR via
  segmented binary search (``pairs_in_csr``) masks interacted items to -inf
  inside the same fused program;
* **item-sharded** (the sequence-parallel analog for this workload, SURVEY
  §2.8): under a mesh, each device scores its local shard of the catalog and
  computes a local top-k; the k-sized candidates are all-gathered over ICI
  and merged — communication is ``O(devices * k)`` per user, independent of
  catalog size.
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from collie_tpu.ops.device_sampling import pairs_in_csr

NEG_INF = jnp.finfo(jnp.float32).min


def _merge_topk(top_scores, top_ids, tile_scores, tile_ids, k: int):
    """Merge running per-user top-k with a new scored tile."""
    scores = jnp.concatenate([top_scores, tile_scores], axis=1)
    ids = jnp.concatenate([top_ids, tile_ids], axis=1)
    new_scores, idx = jax.lax.top_k(scores, k)
    return new_scores, jnp.take_along_axis(ids, idx, axis=1)


def build_retrieval_fn(model, k: int = 10, item_tile: int = 4096,
                       filter_seen: bool = False,
                       seen_csr=None,
                       mesh=None):
    """Compile ``(params, user_ids[B]) -> (top_ids[B, k], top_scores[B, k])``.

    ``seen_csr``: scipy CSR of interactions to exclude (train and/or val).
    ``mesh``: shard the item axis over the mesh's ``model`` axis.
    """
    num_items = model.hparams['num_items']
    if filter_seen:
        assert seen_csr is not None, 'filter_seen requires ``seen_csr``'
        csr = seen_csr.tocsr()
        csr.sort_indices()
        indptr = jnp.asarray(csr.indptr.astype(np.int32))
        cols = jnp.asarray(csr.indices.astype(np.int32))

    def _local_topk(params, user_ids, start: int, stop: int):
        """Blockwise top-k over the item range [start, stop)."""
        span = stop - start
        n_tiles = -(-span // item_tile)

        B = user_ids.shape[0]
        init = (jnp.full((B, k), NEG_INF), jnp.zeros((B, k), jnp.int32))

        def tile_step(carry, tile_idx):
            top_scores, top_ids = carry
            tile_start = start + tile_idx * item_tile
            scores, ids = _score_range_dyn(params, user_ids, tile_start)
            return _merge_topk(top_scores, top_ids, scores, ids, k), None

        def _score_range_dyn(params, user_ids, tile_start):
            item_ids = tile_start + jnp.arange(item_tile, dtype=jnp.int32)
            scores = model.score_item_block(
                params, user_ids, jnp.minimum(item_ids, num_items - 1))
            valid = (item_ids < stop) & (item_ids < num_items)
            if filter_seen:
                seen = pairs_in_csr(indptr, cols, user_ids[:, None],
                                    jnp.minimum(item_ids, num_items - 1)[None, :])
                valid = valid[None, :] & ~seen
            scores = jnp.where(valid, scores, NEG_INF)
            return scores, jnp.broadcast_to(item_ids[None, :], (B, item_tile))

        (top_scores, top_ids), _ = jax.lax.scan(
            tile_step, init, jnp.arange(n_tiles, dtype=jnp.int32))
        return top_scores, top_ids

    if mesh is None:
        pallas_fn = _maybe_pallas_retrieve(model, k, item_tile, filter_seen)
        if pallas_fn is not None:
            return pallas_fn

        def retrieve(params, user_ids):
            top_scores, top_ids = _local_topk(params, user_ids, 0, num_items)
            return top_ids, top_scores

        return jax.jit(retrieve)

    # item-sharded retrieval: shard_map over the mesh's model axis
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from collie_tpu.parallel.mesh import MODEL_AXIS

    n_shards = mesh.shape[MODEL_AXIS]
    shard_span = -(-num_items // n_shards)

    def retrieve(params, user_ids):
        def shard_body(params, user_ids):
            shard_idx = jax.lax.axis_index(MODEL_AXIS)
            start = shard_idx * shard_span
            # local top-k over this shard's item range (params replicated here;
            # the fully sharded-table variant would gather only the local rows)
            top_scores, top_ids = _local_topk_dynamic(params, user_ids, start)
            # all-gather the k-candidates over ICI, merge locally
            all_scores = jax.lax.all_gather(top_scores, MODEL_AXIS, axis=1, tiled=True)
            all_ids = jax.lax.all_gather(top_ids, MODEL_AXIS, axis=1, tiled=True)
            merged_scores, idx = jax.lax.top_k(all_scores, k)
            return jnp.take_along_axis(all_ids, idx, axis=1), merged_scores

        def _local_topk_dynamic(params, user_ids, start):
            n_tiles = -(-shard_span // item_tile)
            B = user_ids.shape[0]
            init = (jnp.full((B, k), NEG_INF), jnp.zeros((B, k), jnp.int32))

            def tile_step(carry, tile_idx):
                top_scores, top_ids = carry
                tile_start = start + tile_idx * item_tile
                item_ids = tile_start + jnp.arange(item_tile, dtype=jnp.int32)
                scores = model.score_item_block(
                    params, user_ids, jnp.minimum(item_ids, num_items - 1))
                valid = (item_ids < start + shard_span) & (item_ids < num_items)
                if filter_seen:
                    seen = pairs_in_csr(indptr, cols, user_ids[:, None],
                                        jnp.minimum(item_ids, num_items - 1)[None, :])
                    valid = valid[None, :] & ~seen
                scores = jnp.where(valid, scores, NEG_INF)
                ids = jnp.broadcast_to(item_ids[None, :], (B, item_tile))
                return _merge_topk(top_scores, top_ids, scores, ids, k), None

            (ts, ti), _ = jax.lax.scan(tile_step, init,
                                       jnp.arange(n_tiles, dtype=jnp.int32))
            return ts, ti

        return shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, user_ids)

    return jax.jit(retrieve)


def _maybe_pallas_retrieve(model, k: int, item_tile: int, filter_seen: bool):
    """Fused Mosaic kernel fast path for plain MF retrieval.

    Applies when the model is a ``MatrixFactorizationModel`` without seen-item
    filtering (the scan path handles filtering): the score+top-k per item tile
    runs in VMEM (``ops.pallas.retrieval_kernel``), so the [batch, num_items]
    block never touches HBM.  The monotone ``y_range`` sigmoid is applied to
    the k winning scores afterwards (it cannot change the ranking).
    """
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel

    if filter_seen or type(model) is not MatrixFactorizationModel or k > 128:
        return None

    from collie_tpu.ops.pallas.retrieval_kernel import mf_topk_retrieve

    interpret = jax.default_backend() != 'tpu'
    y_range = model.hparams.get('y_range')

    def retrieve(params, user_ids):
        user_emb = params['user_embeddings'][user_ids]
        user_bias = params['user_biases'][user_ids]
        top_ids, top_scores = mf_topk_retrieve(
            user_emb, user_bias, params['item_embeddings'], params['item_biases'],
            k=k, tile=item_tile, interpret=interpret)
        if y_range is not None:
            top_scores = jax.nn.sigmoid(top_scores) * (y_range[1] - y_range[0]) \
                + y_range[0]
        return top_ids, top_scores

    return jax.jit(retrieve)


def recommend(model,
              user_ids,
              k: int = 10,
              filter_seen: bool = True,
              item_tile: int = 4096,
              mesh=None) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k recommendations for a batch of users.

    Returns ``(item_ids [B, k], scores [B, k])`` as numpy.  ``filter_seen``
    excludes items present in the model's train (and val, if any) loaders,
    matching ``get_item_predictions(unseen_items_only=True)`` semantics
    (reference ``base_pipeline.py:705-718``) but batched and fully on device.
    """
    seen_csr = None
    if filter_seen:
        seen_csr = model.train_loader.mat.tocsr()
        if model.val_loader is not None:
            seen_csr = seen_csr + model.val_loader.mat.tocsr()

    cache = getattr(model, '_compiled_fn_cache', None)
    if cache is None:
        cache = model._compiled_fn_cache = {}
    key = ('retrieval', k, item_tile, filter_seen,
           id(mesh) if mesh is not None else None)
    if key not in cache:
        cache[key] = build_retrieval_fn(model, k=k, item_tile=item_tile,
                                        filter_seen=filter_seen,
                                        seen_csr=seen_csr, mesh=mesh)
    retrieve = cache[key]
    user_ids = jnp.asarray(np.asarray(user_ids, dtype=np.int32))
    top_ids, top_scores = retrieve(model.params, user_ids)
    return np.asarray(top_ids), np.asarray(top_scores)
