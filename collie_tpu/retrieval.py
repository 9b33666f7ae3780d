"""Batch top-k retrieval (serving path).

The reference's only retrieval API is single-user full-catalog scoring
(``get_item_predictions``, ``/root/reference/collie/model/base/base_pipeline.py:656-718``:
score all items, sort in pandas, drop seen rows on the host).  This module is
the production-serving counterpart the TPU rebuild adds:

* **dense fast path**: when the ``[batch, num_items]`` score block fits a
  budget (``COLLIE_TPU_RETRIEVAL_DENSE_BUDGET_MB``, 512 default), score the
  whole catalog in one HIGHEST-precision matmul and ``lax.top_k`` — measured
  ~2.4x faster than every non-materializing path on the v5e
  (``benchmarks/retrieval_results.json``);
* **blockwise**: beyond the budget, items are scored in tiles and a running
  top-k is merged per tile (``lax.scan`` + ``lax.top_k``), so memory is
  ``O(batch * (k + tile))`` — the full ``[batch, num_items]`` score matrix
  is never materialized, which is what makes 10M+-item catalogs feasible;
* **seen filtering on device**: membership against the train/val CSR via
  segmented binary search (``pairs_in_csr``) masks interacted items to -inf
  inside the same fused program.  The CSR arrays are jit *arguments* (the same
  discipline as the scan engine's epoch data), so retrieval always filters by
  the caller's current seen set — never a stale closure capture;
* **item-sharded** (the sequence-parallel analog for this workload, SURVEY
  §2.8): under a mesh, each device holds only its local shard of the item
  table(s) (``P('model', None)`` in_specs — per-device memory is
  ``num_items / n_shards`` rows, so catalogs larger than one chip's HBM fit),
  scores its shard of the catalog, and computes a local top-k; the k-sized
  candidates are all-gathered over ICI and merged — communication is
  ``O(devices * k)`` per user, independent of catalog size.
"""
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from collie_tpu.ops.device_sampling import pairs_in_csr

NEG_INF = jnp.finfo(jnp.float32).min


def _require_seen(filter_seen: bool, seen) -> None:
    """Host-side validation shared by every retrieval tier: a missing seen
    CSR must raise clearly at call time, not as an unpack error inside jit
    tracing."""
    if filter_seen and seen is None:
        raise ValueError(
            'filter_seen=True requires seen=(indptr, cols) CSR '
            'arrays of the interactions to exclude')


def _seen_mask(seen, user_ids, item_ids, num_items: int):
    """``[B, T]`` mask of (user, item) pairs present in the seen CSR; item
    ids past the catalog (tile padding) are clamped — they score ``NEG_INF``
    anyway, so their membership result is irrelevant.  Shared by the
    single-device and sharded tiers so the filtering semantics cannot
    diverge."""
    indptr, cols = seen
    return pairs_in_csr(indptr, cols, user_ids[:, None],
                        jnp.minimum(item_ids, num_items - 1)[None, :])


def _merge_topk(top_scores, top_ids, tile_scores, tile_ids, k: int):
    """Merge running per-user top-k with a new scored tile."""
    scores = jnp.concatenate([top_scores, tile_scores], axis=1)
    ids = jnp.concatenate([top_ids, tile_ids], axis=1)
    new_scores, idx = jax.lax.top_k(scores, k)
    return new_scores, jnp.take_along_axis(ids, idx, axis=1)


def build_retrieval_fn(model, k: int = 10, item_tile: int = 4096,
                       filter_seen: bool = False,
                       mesh=None):
    """Compile ``(params, user_ids[B], seen) -> (top_ids[B, k], top_scores[B, k])``.

    ``seen``: ``(indptr, cols)`` device arrays of the CSR of interactions to
    exclude (train and/or val), or ``None`` when ``filter_seen`` is off.
    ``mesh``: shard the item axis (and the item-indexed params) over the
    mesh's ``model`` axis.
    """
    num_items = model.hparams['num_items']

    def _local_topk(params, user_ids, seen, start, stop, n_tiles: int):
        """Blockwise top-k over the item range [start, stop)."""
        B = user_ids.shape[0]
        init = (jnp.full((B, k), NEG_INF), jnp.zeros((B, k), jnp.int32))

        def tile_step(carry, tile_idx):
            top_scores, top_ids = carry
            tile_start = start + tile_idx * item_tile
            item_ids = tile_start + jnp.arange(item_tile, dtype=jnp.int32)
            scores = model.score_item_block(
                params, user_ids, jnp.minimum(item_ids, num_items - 1))
            valid = (item_ids < stop) & (item_ids < num_items)
            if filter_seen:
                valid = valid[None, :] & ~_seen_mask(seen, user_ids, item_ids,
                                                     num_items)
            scores = jnp.where(valid, scores, NEG_INF)
            ids = jnp.broadcast_to(item_ids[None, :], (B, item_tile))
            return _merge_topk(top_scores, top_ids, scores, ids, k), None

        (top_scores, top_ids), _ = jax.lax.scan(
            tile_step, init, jnp.arange(n_tiles, dtype=jnp.int32))
        return top_scores, top_ids

    if mesh is None:
        # Path selection, calibrated on the v5e (benchmarks/bench_retrieval.py,
        # amortized in-jit timing): when the dense [B, num_items] score block
        # fits the budget, XLA's fused matmul + lax.top_k is ~2.4x faster
        # than BOTH non-materializing paths (1.6 vs 3.8 ms pallas / 7.0 ms
        # tiled at 500k items, B=64; same ordering at 2M).  Beyond the
        # budget the block cannot exist, and the Mosaic kernel is the
        # fastest O(B*(k+tile))-memory path (1.8x the tiled scan).
        dense_budget = int(os.environ.get(
            'COLLIE_TPU_RETRIEVAL_DENSE_BUDGET_MB', '512')) * (1 << 20)
        # The budget prices ONLY the [B, num_items] score block — sound for
        # models whose score_item_block is a real matmul override, but the
        # BASE hook vmaps score() over users, and for MLP-family models one
        # un-tiled call materializes [B, num_items, layer_width]
        # intermediates that dwarf the block (13 GB at B=256, 200k items,
        # width 64).  Those models stay on the tiled paths, which bound the
        # same intermediates at [B, item_tile, width].
        from collie_tpu.models.base import BasePipeline
        dense_ok = (type(model).score_item_block
                    is not BasePipeline.score_item_block)

        pallas_fn = _maybe_pallas_retrieve(model, k, item_tile, filter_seen)
        n_tiles = -(-num_items // item_tile)

        @jax.jit
        def _retrieve_jit(params, user_ids, seen=None):
            B = user_ids.shape[0]
            if dense_ok and B * num_items * 4 <= dense_budget:
                item_ids = jnp.arange(num_items, dtype=jnp.int32)
                scores = model.score_item_block(params, user_ids, item_ids)
                if filter_seen:
                    scores = jnp.where(
                        _seen_mask(seen, user_ids, item_ids, num_items),
                        NEG_INF, scores)
                top_scores, top_ids = jax.lax.top_k(scores, k)
                return top_ids, top_scores
            top_scores, top_ids = _local_topk(
                params, user_ids, seen, 0, num_items, n_tiles)
            return top_ids, top_scores

        def retrieve(params, user_ids, seen=None):
            _require_seen(filter_seen, seen)
            B = np.shape(user_ids)[0]
            if pallas_fn is not None and B * num_items * 4 > dense_budget:
                return pallas_fn(params, user_ids, seen)
            return _retrieve_jit(params, user_ids, seen)

        return retrieve

    return _build_sharded_retrieval(model, k, item_tile, filter_seen,
                                    mesh, _local_topk)


def _build_sharded_retrieval(model, k, item_tile, filter_seen, mesh, _local_topk):
    """Item-sharded retrieval: ``shard_map`` over the mesh's ``model`` axis.

    Two tiers:

    * **local-table tier** (``MatrixFactorizationModel``, catalog divisible by
      the axis): the item embedding/bias tables enter the shard body
      row-sharded (``P('model', None)`` in_specs) and every tile is scored
      directly from the *local* shard with local row indices — per-device
      table memory is ``num_items / n_shards`` rows, so catalogs larger than
      one chip's HBM fit (the actual promise of item sharding);
    * **replicated tier** (any other model): params stay replicated and each
      device scores its global item range — compute scales, memory does not.

    Either way each device computes a local top-k, the ``O(devices * k)``
    candidates all-gather over ICI, and the final top-k merges locally.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from collie_tpu.parallel.mesh import MODEL_AXIS
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel

    num_items = model.hparams['num_items']
    num_users = model.hparams['num_users']
    n_shards = mesh.shape[MODEL_AXIS]
    local_tables = (type(model) is MatrixFactorizationModel
                    and num_items % n_shards == 0)
    shard_span = num_items // n_shards if local_tables \
        else -(-num_items // n_shards)
    n_tiles = -(-shard_span // item_tile)
    # user tables ALSO enter row-sharded when divisible: declaring them P()
    # makes GSPMD all-gather the whole table before the shard body — a
    # per-call O(num_users x dim) transfer the round-5 collective account
    # caught (1 MB/call at 4k users; unbounded at serving scale).  The
    # masked-local-gather + psum below moves only the B requested rows.
    local_users = local_tables and num_users % n_shards == 0
    rows_u = num_users // n_shards if local_users else num_users

    param_names = sorted(model.params.keys())

    def _spec_for(name):
        sharded = (local_tables and name.startswith('item')) \
            or (local_users and name.startswith('user'))
        ndim = model.params[name].ndim
        return P(MODEL_AXIS, *([None] * (ndim - 1))) if sharded else P()

    specs = {name: _spec_for(name) for name in param_names}

    def _user_rows(params, name, user_ids):
        """[B, ...] user rows under either user-table layout."""
        leaf = params[name]
        if not local_users:
            return leaf[user_ids]
        u_start = jax.lax.axis_index(MODEL_AXIS) * rows_u
        local = user_ids - u_start
        ok = (local >= 0) & (local < rows_u)
        rows = jnp.take(leaf, jnp.clip(local, 0, rows_u - 1), axis=0)
        rows = jnp.where(ok.reshape((-1,) + (1,) * (rows.ndim - 1)), rows, 0)
        return jax.lax.psum(rows, MODEL_AXIS)

    def _local_topk_from_shard(params, user_ids, seen, start):
        """Blockwise top-k scoring straight off the local table shard."""
        user_emb = _user_rows(params, 'user_embeddings',
                              user_ids).astype(jnp.float32)
        user_bias = _user_rows(params, 'user_biases', user_ids)
        B = user_ids.shape[0]
        init = (jnp.full((B, k), NEG_INF), jnp.zeros((B, k), jnp.int32))

        def tile_step(carry, tile_idx):
            top_scores, top_ids = carry
            local_ids = tile_idx * item_tile + jnp.arange(item_tile,
                                                          dtype=jnp.int32)
            safe = jnp.minimum(local_ids, shard_span - 1)
            item_emb = params['item_embeddings'][safe].astype(jnp.float32)
            scores = (jnp.matmul(user_emb, item_emb.T,
                                 precision=jax.lax.Precision.HIGHEST)
                      + user_bias[:, None]
                      + params['item_biases'][safe][None, :])
            scores = model._apply_y_range(scores)
            global_ids = start + local_ids
            valid = local_ids < shard_span
            if filter_seen:
                valid = valid[None, :] & ~_seen_mask(seen, user_ids, global_ids,
                                                     num_items)
            scores = jnp.where(valid, scores, NEG_INF)
            ids = jnp.broadcast_to(global_ids[None, :], (B, item_tile))
            return _merge_topk(top_scores, top_ids, scores, ids, k), None

        (top_scores, top_ids), _ = jax.lax.scan(
            tile_step, init, jnp.arange(n_tiles, dtype=jnp.int32))
        return top_scores, top_ids

    def retrieve(params, user_ids, seen=None):
        _require_seen(filter_seen, seen)

        def shard_body(params, user_ids, seen):
            shard_idx = jax.lax.axis_index(MODEL_AXIS)
            start = shard_idx * shard_span
            if local_tables:
                top_scores, top_ids = _local_topk_from_shard(
                    params, user_ids, seen, start)
            else:
                top_scores, top_ids = _local_topk(
                    params, user_ids, seen, start,
                    jnp.minimum(start + shard_span, num_items), n_tiles)
            all_scores = jax.lax.all_gather(top_scores, MODEL_AXIS, axis=1,
                                            tiled=True)
            all_ids = jax.lax.all_gather(top_ids, MODEL_AXIS, axis=1, tiled=True)
            merged_scores, idx = jax.lax.top_k(all_scores, k)
            return jnp.take_along_axis(all_ids, idx, axis=1), merged_scores

        seen_spec = None if seen is None else (P(), P())
        return shard_map(
            shard_body, mesh=mesh,
            in_specs=(specs, P(), seen_spec),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, user_ids, seen)

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
    if any(v.dtype != jnp.float32 for v in model.params.values()):
        return None  # bf16 tables: the Mosaic kernel's envelope is f32

    from collie_tpu.ops.pallas.retrieval_kernel import mf_topk_retrieve

    interpret = jax.default_backend() != 'tpu'
    y_range = model.hparams.get('y_range')

    def retrieve(params, user_ids, seen=None):
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


def _seen_arrays(model) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Current train(+val) interactions as sorted-CSR device arrays."""
    seen_csr = model.train_loader.mat.tocsr()
    if model.val_loader is not None:
        seen_csr = seen_csr + model.val_loader.mat.tocsr()
    seen_csr = seen_csr.tocsr()
    seen_csr.sort_indices()
    return (jnp.asarray(seen_csr.indptr.astype(np.int32)),
            jnp.asarray(seen_csr.indices.astype(np.int32)))


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
    The seen set is re-read from the loaders on every call (it is a jit
    argument, not a compile-time constant), so swapping loaders or training on
    more data is reflected immediately; a changed nnz changes the argument
    shape and recompiles, identical data re-runs the cached program.
    """
    num_items = model.hparams['num_items']
    if k > num_items:
        raise ValueError(
            f'``k`` ({k}) must not exceed the number of items ({num_items})'
        )
    seen = _seen_arrays(model) if filter_seen else None

    cache = getattr(model, '_compiled_fn_cache', None)
    if cache is None:
        cache = model._compiled_fn_cache = {}
    key = ('retrieval', model.current_stage, k, item_tile, filter_seen,
           mesh,  # hashes by topology — no id-recycling alias
           # baked into the built program at trace time — changing the
           # budget between calls must rebuild, not reuse a stale path
           os.environ.get('COLLIE_TPU_RETRIEVAL_DENSE_BUDGET_MB', '512'))
    if key not in cache:
        cache[key] = build_retrieval_fn(model, k=k, item_tile=item_tile,
                                        filter_seen=filter_seen, mesh=mesh)
    retrieve = cache[key]
    user_ids = jnp.asarray(np.asarray(user_ids, dtype=np.int32))
    top_ids, top_scores = retrieve(model.params, user_ids, seen)
    return np.asarray(top_ids), np.asarray(top_scores)
