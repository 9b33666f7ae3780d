"""On-device negative sampling.

The reference samples negatives in Python inside ``Dataset.__getitem__``
(``/root/reference/collie/interactions/datasets.py:390-445``).  The host
vectorized sampler (``collie_tpu.data.sampling``) already removes that hot
loop; this module goes further for the scan-based training path: sampling runs
on device, whole-epoch at a time, so the host dispatches ONE program per epoch.

Two exact-mode algorithms:

* ``sample_negatives_impl`` — the host sampler's semantics transplanted:
  bounded redraw rounds against a sorted flat-key array.  Kept for parity
  testing; needs ``num_users * num_items`` to fit int32 and costs a
  searchsorted + row-sort per round.
* ``complement_sample_negatives_impl`` — the fast path: **rejection-free**
  sampling from each user's complement set.  For user ``u`` with ``d_u``
  positives, draw ``r ~ U[0, num_items - d_u)`` and map it to the ``r``-th
  non-positive item via a segmented binary search on
  ``shifted[j] = positives[j] - j`` (strictly increasing per user):
  ``j* = first j with shifted[j] > r``, ``item = r + j*``.  One fully
  vectorized pass, exact by construction, no per-round membership tests, no
  flat-key overflow limit.  An optional dedup round redraws within-row
  duplicates (the reference's exact mode also only best-effort-avoids them
  within its resample budget, ``datasets.py:404-424``).
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _duplicate_within_row_mask(negatives: jnp.ndarray) -> jnp.ndarray:
    """Mark duplicated values within each row (all but the first occurrence).

    ``K`` is small (typically <= 10), so an ``O(K^2)`` pairwise compare on the
    VPU beats sort + scatter by ~2x on TPU for epoch-sized inputs.
    """
    K = negatives.shape[-1]
    eq = negatives[..., :, None] == negatives[..., None, :]      # [..., K, K]
    earlier = jnp.tril(jnp.ones((K, K), dtype=bool), k=-1)
    return (eq & earlier).any(-1)


def build_complement_tables(csr) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side precompute for complement sampling from a scipy CSR matrix.

    Returns ``(indptr [num_users + 1], shifted_cols [nnz])`` where
    ``shifted_cols[indptr[u] + j] = sorted_positives_of_u[j] - j``.
    """
    csr = csr.tocsr()
    csr.sort_indices()
    indptr = csr.indptr.astype(np.int32)
    cols = csr.indices.astype(np.int32)
    rank_within_row = np.arange(len(cols), dtype=np.int32) - np.repeat(
        indptr[:-1], np.diff(indptr))
    return indptr, cols - rank_within_row


def build_padded_complement_table(csr, lane: int = 128
                                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side precompute for the padded (gather-free) complement sampler.

    Returns ``(shifted_pad [num_users, P], row_counts [num_users])`` where row
    ``u`` holds that user's ``shifted`` values (``positives[j] - j``, as in
    :func:`build_complement_tables`) padded to ``P`` — the max row length
    rounded up to a multiple of ``lane`` (TPU lane width) — with sentinel
    ``num_items`` (strictly greater than any draw ``r``, so padding never
    counts).
    """
    csr = csr.tocsr()
    csr.sort_indices()
    num_users, num_items = csr.shape
    indptr = csr.indptr.astype(np.int64)
    counts = np.diff(indptr).astype(np.int32)
    max_len = int(counts.max()) if num_users else 0
    P = max(lane, -(-max_len // lane) * lane)
    shifted_pad = np.full((num_users, P), num_items, dtype=np.int32)
    cols = csr.indices.astype(np.int32)
    rank = np.arange(len(cols), dtype=np.int32) - np.repeat(
        indptr[:-1], counts).astype(np.int32)
    row_of = np.repeat(np.arange(num_users, dtype=np.int64), counts)
    shifted_pad[row_of, rank] = cols - rank
    return shifted_pad, counts


def build_bucketed_complement_tables(csr, example_rows, lane: int = 128,
                                     chunk: int = 8192):
    """Host-side precompute for the DEGREE-BUCKETED gather-free sampler.

    The single padded table reads every example's user row at the max-degree
    width ``P`` — at ML-10M scale the mean degree is ~69 but ``P`` is 2688,
    so 96%+ of the sampling HBM traffic is padding.  Users are instead
    partitioned into power-of-two width buckets (128, 256, 512, ...), each
    with its own ``[users_in_bucket, P_b]`` table, and — the part that makes
    this static-shaped — the EXAMPLE partition is precomputed here on the
    host: which canonical interaction belongs to which bucket depends only on
    its user's degree, not on the epoch shuffle.

    The precompute lays the epoch's examples out in a fixed GROUPED order —
    bucket-major, user-sorted within each bucket — so the epoch program
    draws, counts, and dedups entirely in that order over *contiguous
    static slices* (no per-bucket gathers/scatters of ``[n, K]`` arrays,
    which measured ~0.5 s each at ML-10M scale and dominated sampling), and
    routes negatives to their shuffled batch positions with ONE final gather
    (see :func:`complement_sample_negatives_bucketed_impl`).

    Returns ``(bucket_specs, row_counts, users_g, pos_of)`` as numpy arrays:

    * ``bucket_specs`` — tuple of ``(row_idx [n_b_pad], table [m_b, P_b])``
      per nonempty bucket; ``row_idx`` is the bucket-local user row of each
      grouped slot (chunk padding points at row 0, never read back).
      Concatenated, the specs cover grouped slots ``0 .. N_g``.
    * ``row_counts [num_users]`` — positives per user.
    * ``users_g [N_g]`` — global user id per grouped slot (pads -> user 0).
    * ``pos_of [n_canon]`` — grouped slot of each canonical example.
    """
    csr = csr.tocsr()
    csr.sort_indices()
    num_users, num_items = csr.shape
    indptr = csr.indptr.astype(np.int64)
    counts = np.diff(indptr).astype(np.int32)
    cols = csr.indices.astype(np.int32)
    rank = np.arange(len(cols), dtype=np.int32) - np.repeat(
        indptr[:-1], counts).astype(np.int32)
    shifted = cols - rank

    max_len = int(counts.max()) if num_users else 0
    widths = []
    w = lane
    while True:
        widths.append(w)
        if w >= max(max_len, 1):
            break
        w *= 2
    user_bucket = np.searchsorted(np.asarray(widths), counts)  # deg<=P_b
    example_rows = np.asarray(example_rows, dtype=np.int64)
    n_canon = len(example_rows)
    ex_bucket = user_bucket[example_rows]

    specs = []
    user_local = np.zeros(num_users, dtype=np.int64)
    pos_of = np.zeros(n_canon, dtype=np.int32)
    users_g_parts = []
    offset = 0
    for b, P in enumerate(widths):
        users_b = np.where(user_bucket == b)[0]
        ex_b = np.where(ex_bucket == b)[0].astype(np.int64)
        if len(users_b) == 0 or len(ex_b) == 0:
            continue
        user_local[users_b] = np.arange(len(users_b))
        table = np.full((len(users_b), P), num_items, dtype=np.int32)
        lengths = counts[users_b].astype(np.int64)
        total = int(lengths.sum())
        rows_rep = np.repeat(np.arange(len(users_b)), lengths)
        pos = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths,
                                           lengths)
        src = np.repeat(indptr[users_b], lengths) + pos
        table[rows_rep, pos] = shifted[src]
        # user-sorted within the bucket: the count's table row gathers become
        # runs of repeated rows instead of random accesses
        ex_b = ex_b[np.argsort(example_rows[ex_b], kind='stable')]
        users_of_b = example_rows[ex_b]
        row_b = user_local[users_of_b].astype(np.int32)
        pad = -len(ex_b) % min(chunk, _ceil_pow2(len(ex_b)))
        if pad:
            row_b = np.concatenate([row_b, np.zeros(pad, np.int32)])
            users_of_b = np.concatenate(
                [users_of_b, np.zeros(pad, np.int64)])
        pos_of[ex_b] = offset + np.arange(len(ex_b), dtype=np.int32)
        users_g_parts.append(users_of_b.astype(np.int32))
        offset += len(row_b)
        specs.append((row_b, table))
    users_g = (np.concatenate(users_g_parts) if users_g_parts
               else np.zeros(0, np.int32))
    return specs, counts, users_g, pos_of


def _ceil_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def bucketed_table_bytes(csr, lane: int = 128) -> int:
    """Device bytes the bucketed sampler's tables would occupy — the budget
    check mirror of :func:`padded_table_bytes` (always <= it)."""
    csr = csr.tocsr()
    counts = np.diff(csr.indptr)
    if len(counts) == 0:
        return 0
    widths = lane * (2 ** np.ceil(np.log2(np.maximum(counts, 1) / lane))
                     .clip(min=0)).astype(np.int64)
    return int(widths.sum()) * 4


def complement_sample_negatives_bucketed_impl(rng: jax.Array,
                                              idx: jnp.ndarray,
                                              pos_of: jnp.ndarray,
                                              users_g: jnp.ndarray,
                                              bucket_specs,
                                              row_counts: jnp.ndarray,
                                              num_items: int,
                                              num_negative_samples: int,
                                              dedup_rounds: int = 1,
                                              chunk: int = 8192
                                              ) -> jnp.ndarray:
    """Degree-bucketed complement sampling over a shuffled epoch.

    Same ``item = r + |{j: shifted_j <= r}|`` math as
    :func:`complement_sample_negatives_padded_impl`, but the whole pipeline —
    draws, comparison-counts, dedup redraws — runs in the host-precomputed
    GROUPED order (bucket-major, user-sorted; see
    :func:`build_bucketed_complement_tables`), where every bucket is a
    contiguous static slice.  The epoch shuffle enters exactly once, at the
    very end: ``negatives_grouped[pos_of[idx]]``.  The previous design
    instead scattered the draws into canonical order and gathered counts
    back per round — three ``[n, K]``-sized data movements per draw round,
    measured ~0.5 s EACH at ML-10M scale (4.45M examples), 5-8x the cost of
    the comparison-counts themselves.

    The RNG stream is defined over grouped slots, so draws are iid uniforms
    assigned to examples by a fixed bijection composed with the epoch
    permutation — the same joint distribution as drawing at shuffled
    positions, but NOT bit-identical to the padded/CSR kernels' streams
    (those remain bit-identical to each other).  Positions ``idx`` beyond
    the epoch's real examples (batch padding, mask == 0 downstream) simply
    duplicate example ``idx[0]``'s negatives.
    """
    negatives = complement_sample_negatives_bucketed_grouped_impl(
        rng, users_g, bucket_specs, row_counts, num_items,
        num_negative_samples, dedup_rounds=dedup_rounds, chunk=chunk)
    return negatives[pos_of[idx]]                          # the ONE reorder


def complement_sample_negatives_bucketed_grouped_impl(
        rng: jax.Array,
        users_g: jnp.ndarray,
        bucket_specs,
        row_counts: jnp.ndarray,
        num_items: int,
        num_negative_samples: int,
        dedup_rounds: int = 1,
        chunk: int = 8192) -> jnp.ndarray:
    """The bucketed sampler's core, returning negatives in GROUPED order
    (``[N_g, K]``) — no epoch reorder.

    Split out in round 5: the ``negatives[pos_of[idx]]`` reorder chain
    (a random element gather composed with a random row gather, ~60+ ms of
    the sampler's ~135-180 ms/epoch at the ML-10M config,
    ``benchmarks/sampler_r5.json``) is unnecessary when the caller can
    compose the slot mapping into its OWN epoch gather — the scan engine's
    fast path pre-sorts the packed interaction ids into grouped order at
    build time and fetches ``(ids, negatives)`` rows with one gather
    (``scan_engine.py::_epoch_batches``).  RNG stream identical to
    :func:`complement_sample_negatives_bucketed_impl` (which is now a
    wrapper over this plus the reorder)."""
    K = num_negative_samples
    N_g = users_g.shape[0]
    sizes = jnp.maximum(
        (num_items - row_counts[users_g])[:, None].astype(jnp.int32), 1)

    def count_grouped(r):
        """|{j: shifted <= r}| per (grouped slot, draw): bucket by bucket at
        each bucket's own width, over contiguous slices of ``r`` (draw
        width ``r.shape[-1]`` — K for the base draws, K + spares when the
        dedup spares ride the same pass)."""
        width = r.shape[-1]
        outs = []
        off = 0
        for row_idx_b, table_b in bucket_specs:
            nb = int(row_idx_b.shape[0])
            r_b = r[off:off + nb]                          # static slice
            off += nb

            def one_chunk(args, _table=table_b):
                row_c, r_c = args
                rows_c = _table[row_c]                     # [c, P_b]
                return jnp.sum(rows_c[:, None, :] <= r_c[:, :, None],
                               axis=-1, dtype=jnp.int32)   # [c, width]

            if nb <= chunk:
                outs.append(one_chunk((row_idx_b, r_b)))
            else:
                outs.append(jax.lax.map(
                    one_chunk, (row_idx_b.reshape(-1, chunk),
                                r_b.reshape(-1, chunk, width))
                ).reshape(nb, width))
        return jnp.concatenate(outs, axis=0)

    # Dedup via SPARES, not redraw passes: each dedup round pre-draws 2
    # spare iid complement values per row INSIDE the one comparison-count
    # pass (cost is linear in draw count: +2/K ≈ +20% for K=10), then
    # substitutes the i-th within-row duplicate with the i-th spare — pure
    # elementwise work, no second count pass.  The dense redraw design this
    # replaces paid a full [N_g, K] count per round (1.4 ms of the 2.5 ms
    # sampler at the ML-10M headline config).  Spares are iid uniforms over
    # the complement, assigned independently of the duplicate pattern, so
    # the joint distribution matches the redraw design (the rng stream
    # differs — marginals and independence are what the MAP@10 A/Bs pinned,
    # see docs/BENCHMARKS.md sorted-vs-iid note).  A spare colliding with a
    # kept value (or spares colliding) leaves a residual duplicate — the
    # same accepted residual as a redraw-round miss.
    SPARES_PER_ROUND = 2
    n_spares = SPARES_PER_ROUND * dedup_rounds
    W = K + n_spares

    u01 = jax.random.uniform(rng, (N_g, W))
    r = jnp.minimum((u01 * sizes).astype(jnp.int32), sizes - 1)
    all_draws = r + count_grouped(r)                       # [N_g, W]
    negatives = all_draws[:, :K]
    for round_idx in range(dedup_rounds):
        spares = all_draws[:, K + round_idx * SPARES_PER_ROUND:
                           K + (round_idx + 1) * SPARES_PER_ROUND]
        dup = _duplicate_within_row_mask(negatives)        # [N_g, K]
        # i-th duplicate in the row takes the i-th spare of this round —
        # selected ELEMENTWISE over the two spare columns (take_along_axis
        # here would be ~N_g*K single-element gathers, measured ~6x the
        # whole count pass; see CLAUDE.md's take_along finding)
        dup_rank = jnp.cumsum(dup, axis=1) - 1             # 0-based among dups
        subst = jnp.where(dup_rank == 0, spares[:, :1], spares[:, 1:2])
        use = dup & (dup_rank < SPARES_PER_ROUND)
        negatives = jnp.where(use, subst, negatives)
    return negatives


def padded_table_bytes(csr, lane: int = 128) -> int:
    """Size in bytes of the table :func:`build_padded_complement_table` would
    build — callers use this to auto-select padded vs CSR sampling."""
    csr = csr.tocsr()
    num_users = csr.shape[0]
    counts = np.diff(csr.indptr)
    max_len = int(counts.max()) if len(counts) else 0
    P = max(lane, -(-max_len // lane) * lane)
    return num_users * P * 4


def complement_sample_negatives_padded_impl(rng: jax.Array,
                                            user_ids: jnp.ndarray,
                                            shifted_pad: jnp.ndarray,
                                            row_counts: jnp.ndarray,
                                            num_items: int,
                                            num_negative_samples: int,
                                            dedup_rounds: int = 1
                                            ) -> jnp.ndarray:
    """Gather-free complement sampling: bit-identical to
    :func:`complement_sample_negatives_impl` (same RNG stream, same
    ``item = r + |{j: shifted_j <= r}|`` math) but the segmented binary search
    — ``O(log num_items)`` sequential passes of random scalar HBM gathers,
    the measured 66-75%% of epoch time — is replaced by ONE contiguous row
    gather (``shifted_pad[user]``) and a vectorized comparison-count on the
    VPU.  The count is exact because ``shifted`` is non-decreasing per row and
    padding holds ``num_items`` which no draw ``r`` can reach.

    Preferred whenever ``num_users x P`` fits a configurable budget (tables are
    modest: ML-100K is 943 x 768 x 4B ≈ 2.9 MB); the CSR path remains for
    pathological row-length skew.
    """
    K = num_negative_samples
    shape = user_ids.shape + (K,)
    users = user_ids.astype(jnp.int32)
    complement_size = (num_items - row_counts[users])[..., None].astype(jnp.int32)

    # The comparison-count runs over fixed-size user chunks (lax.map inside
    # the one jitted epoch program): a whole-epoch ``shifted_pad[users]``
    # would materialize [n_examples, P] — 40 GB at ML-10M scale.  Only the
    # RNG draws span the full shape (bit-identity with the CSR path).
    chunk = 8192
    flat_users = users.reshape(-1)
    n = flat_users.shape[0]

    def one_chunk(args):
        u_c, r_c = args
        rows_c = shifted_pad[u_c]                         # [chunk, P]
        return jnp.sum(rows_c[:, None, :] <= r_c[:, :, None], axis=-1,
                       dtype=jnp.int32)                   # [chunk, K]

    def count_le(r):
        """|{j: shifted_pad[u, j] <= r}| per (example, draw), chunked."""
        flat_r = r.reshape(-1, K)
        if n <= chunk:
            return one_chunk((flat_users, flat_r)).reshape(shape)
        pad = -n % chunk
        if pad:
            flat_u = jnp.concatenate([flat_users,
                                      jnp.zeros((pad,), jnp.int32)])
            flat_r = jnp.concatenate(
                [flat_r, jnp.full((pad, K), -1, jnp.int32)])
        else:
            flat_u = flat_users
        cnt = jax.lax.map(one_chunk, (flat_u.reshape(-1, chunk),
                                      flat_r.reshape(-1, chunk, K)))
        return cnt.reshape(-1, K)[:n].reshape(shape)

    def draw(draw_rng, negatives, redraw_mask):
        u01 = jax.random.uniform(draw_rng, shape)
        r = jnp.minimum((u01 * complement_size).astype(jnp.int32),
                        complement_size - 1)
        return jnp.where(redraw_mask, r + count_le(r), negatives)

    rngs = jax.random.split(rng, 1 + dedup_rounds)
    negatives = draw(rngs[0], jnp.zeros(shape, jnp.int32),
                     jnp.ones(shape, dtype=bool))
    for round_idx in range(dedup_rounds):
        dup = _duplicate_within_row_mask(negatives)
        negatives = draw(rngs[1 + round_idx], negatives, dup)
    return negatives


def complement_sample_negatives_impl(rng: jax.Array,
                                     user_ids: jnp.ndarray,
                                     indptr: jnp.ndarray,
                                     shifted_cols: jnp.ndarray,
                                     num_items: int,
                                     num_negative_samples: int,
                                     dedup_rounds: int = 1) -> jnp.ndarray:
    """Draw ``user_ids.shape + (K,)`` negatives, exact w.r.t. each user's
    positives, via segmented binary search (traceable core)."""
    K = num_negative_samples
    shape = user_ids.shape + (K,)
    users = user_ids[..., None].astype(jnp.int32)
    lo0 = indptr[users]                      # segment starts, broadcast over K
    hi0 = indptr[users + 1]
    complement_size = (num_items - (hi0 - lo0)).astype(jnp.int32)

    def draw(draw_rng, negatives, redraw_mask):
        # r ~ U[0, complement_size) per position
        u01 = jax.random.uniform(draw_rng, shape)
        r = jnp.minimum((u01 * complement_size).astype(jnp.int32),
                        complement_size - 1)
        # binary search: first t in [lo, hi) with shifted_cols[t] > r
        lo = jnp.broadcast_to(lo0, shape)
        hi = jnp.broadcast_to(hi0, shape)

        def body(_, carry):
            lo, hi = carry
            active = lo < hi
            mid = (lo + hi) // 2
            mid_safe = jnp.clip(mid, 0, shifted_cols.shape[0] - 1)
            go_left = shifted_cols[mid_safe] > r
            new_hi = jnp.where(active & go_left, mid, hi)
            new_lo = jnp.where(active & ~go_left, mid + 1, lo)
            return new_lo, new_hi

        # num_items upper-bounds any segment length
        n_iters = max(1, int(np.ceil(np.log2(max(2, num_items + 1)))))
        lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
        fresh = r + (lo - lo0)
        return jnp.where(redraw_mask, fresh, negatives)

    rngs = jax.random.split(rng, 1 + dedup_rounds)
    negatives = draw(rngs[0], jnp.zeros(shape, jnp.int32),
                     jnp.ones(shape, dtype=bool))
    for round_idx in range(dedup_rounds):
        dup = _duplicate_within_row_mask(negatives)
        negatives = draw(rngs[1 + round_idx], negatives, dup)
    return negatives


def distinct_complement_sample_negatives_impl(rng: jax.Array,
                                              user_ids: jnp.ndarray,
                                              indptr: jnp.ndarray,
                                              shifted_cols: jnp.ndarray,
                                              num_items: int,
                                              num_negative_samples: int
                                              ) -> jnp.ndarray:
    """Complement sampling with K **distinct** values per row in one pass.

    Sorted-spacing trick: draw K iid values from ``[0, M - K)`` (``M`` = the
    user's complement size), sort the row, add ``arange(K)`` — the results are
    strictly increasing, hence distinct — then map through the same segmented
    binary search as ``complement_sample_negatives_impl`` and random-shuffle
    each row (losses like WARP are order-sensitive).

    Guarantees: never a positive, never a within-row duplicate, single draw +
    single search (~3.5x faster than draw + dedup-redraw).

    .. warning::
        NOT used by the training engine.  Although every marginal statistic
        matches iid sampling, A/B training runs measured a consistent ~25%
        MAP@10 degradation versus iid draws (sorted-spacing induces negative
        correlation within each row's ranks, which interacts badly with
        hardest-negative losses).  ``complement_sample_negatives_impl`` (iid
        draws + dedup round) is the quality-validated default; this variant
        exists for workloads that need duplicate-free rows at minimum cost
        and tolerate the quality caveat.
    """
    K = num_negative_samples
    shape = user_ids.shape + (K,)
    users = user_ids[..., None].astype(jnp.int32)
    lo0 = indptr[users]
    hi0 = indptr[users + 1]
    complement_size = (num_items - (hi0 - lo0)).astype(jnp.int32)

    r_rng, shuffle_rng = jax.random.split(rng)
    span = jnp.maximum(complement_size - K, 1)
    base = jnp.minimum((jax.random.uniform(r_rng, shape) * span).astype(jnp.int32),
                       span - 1)
    r = jnp.sort(base, axis=-1) + jnp.arange(K, dtype=jnp.int32)
    # guard degenerate users whose complement is smaller than K
    r = jnp.minimum(r, jnp.maximum(complement_size - 1, 0))

    lo = jnp.broadcast_to(lo0, shape)
    hi = jnp.broadcast_to(hi0, shape)

    def body(_, carry):
        lo, hi = carry
        active = lo < hi
        mid = (lo + hi) // 2
        mid_safe = jnp.clip(mid, 0, shifted_cols.shape[0] - 1)
        go_left = shifted_cols[mid_safe] > r
        new_hi = jnp.where(active & go_left, mid, hi)
        new_lo = jnp.where(active & ~go_left, mid + 1, lo)
        return new_lo, new_hi

    n_iters = max(1, int(np.ceil(np.log2(max(2, num_items + 1)))))
    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    items = r + (lo - lo0)

    order = jnp.argsort(jax.random.uniform(shuffle_rng, shape), axis=-1)
    return jnp.take_along_axis(items, order, axis=-1)


def contains_pairs(positive_keys: jnp.ndarray,
                   user_ids: jnp.ndarray,
                   item_ids: jnp.ndarray,
                   num_items: int) -> jnp.ndarray:
    """Vectorized membership test against the sorted flat-key positives array.

    Keys use ``positive_keys.dtype`` (int32 by default, since x64 is disabled
    under jit); callers must ensure ``num_users * num_items`` fits that dtype.
    """
    key_dtype = positive_keys.dtype
    keys = user_ids.astype(key_dtype) * num_items + item_ids.astype(key_dtype)
    idx = jnp.searchsorted(positive_keys, keys)
    idx = jnp.minimum(idx, positive_keys.shape[0] - 1)
    return positive_keys[idx] == keys


def pairs_in_csr(indptr: jnp.ndarray,
                 cols: jnp.ndarray,
                 user_ids: jnp.ndarray,
                 item_ids: jnp.ndarray) -> jnp.ndarray:
    """Membership test ``(user, item) in csr`` via segmented binary search over
    each user's sorted column list.  No flat-key construction, so there is no
    ``num_users * num_items`` overflow limit.  Shapes broadcast:
    ``user_ids [...]`` x ``item_ids [...]`` -> bool of the broadcast shape.
    """
    user_ids, item_ids = jnp.broadcast_arrays(jnp.asarray(user_ids), jnp.asarray(item_ids))
    lo = indptr[user_ids]
    hi = indptr[user_ids + 1]
    target = item_ids.astype(cols.dtype)

    def body(_, carry):
        lo, hi = carry
        active = lo < hi
        mid = (lo + hi) // 2
        mid_safe = jnp.clip(mid, 0, cols.shape[0] - 1)
        go_left = cols[mid_safe] >= target
        new_hi = jnp.where(active & go_left, mid, hi)
        new_lo = jnp.where(active & ~go_left, mid + 1, lo)
        return new_lo, new_hi

    max_len = int(np.ceil(np.log2(max(2, cols.shape[0] + 1))))
    lo, hi = jax.lax.fori_loop(0, max_len, body, (lo, hi))
    found = jnp.clip(lo, 0, cols.shape[0] - 1)
    in_range = lo < indptr[user_ids + 1]
    return in_range & (cols[found] == target)


def sample_negatives_impl(rng: jax.Array,
                          user_ids: jnp.ndarray,
                          positive_keys: jnp.ndarray,
                          num_items: int,
                          num_negative_samples: int,
                          exact: bool = True,
                          max_resample_rounds: int = 8) -> jnp.ndarray:
    """Redraw-rounds sampler (host-sampler semantics on device; traceable core)."""
    B = user_ids.shape[0]
    K = num_negative_samples
    rng, draw_rng = jax.random.split(rng)
    negatives = jax.random.randint(draw_rng, (B, K), 0, num_items, dtype=jnp.int32)
    if not exact:
        return negatives

    users = user_ids[:, None].astype(jnp.int32)

    def round_body(_, carry):
        negatives, rng = carry
        bad = contains_pairs(positive_keys,
                             jnp.broadcast_to(users, (B, K)), negatives, num_items)
        bad = bad | _duplicate_within_row_mask(negatives)
        rng, redraw_rng = jax.random.split(rng)
        fresh = jax.random.randint(redraw_rng, (B, K), 0, num_items, dtype=jnp.int32)
        return jnp.where(bad, fresh, negatives), rng

    negatives, _ = jax.lax.fori_loop(0, max_resample_rounds, round_body, (negatives, rng))
    return negatives


sample_negatives = jax.jit(
    sample_negatives_impl,
    static_argnames=('num_items', 'num_negative_samples', 'exact', 'max_resample_rounds'),
)

complement_sample_negatives = jax.jit(
    complement_sample_negatives_impl,
    static_argnames=('num_items', 'num_negative_samples', 'dedup_rounds'),
)

distinct_complement_sample_negatives = jax.jit(
    distinct_complement_sample_negatives_impl,
    static_argnames=('num_items', 'num_negative_samples'),
)
