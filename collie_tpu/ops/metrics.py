"""Ranking / rating metrics computed on-device from full-catalog score blocks.

Rebuild of ``/root/reference/collie/metrics.py`` (``mapk`` at ``:144``, ``mrr``
at ``:201``, ``auc`` at ``:243``).  Two layers:

* ``*_from_scores`` — jit'd jnp kernels over a ``[batch_users, num_items]``
  score block plus a dense 0/1 relevance block.  These replace the reference's
  per-user Python loops: its AUC loops users calling ``torchmetrics.auroc``
  one at a time (``metrics.py:266-282``) and its MRR materializes a full-rank
  topk (``metrics.py:224``); here AUC is the closed-form rank statistic and
  MRR needs only the best-scoring relevant item's rank — both one fused pass.
* host wrappers ``mapk`` / ``mrr`` / ``auc`` with the reference call signature
  ``(targets: csr_matrix, user_ids, preds, k)`` (``metrics.py:144-282``) for
  drop-in use with ``evaluate_in_batches``.

Tie handling: the reference inherits ``torch.topk`` / trapezoidal-AUC tie
behavior; here ranks break ties by strict comparison.  For continuous model
scores the results are identical (verified against the reference's
hand-computed fixture values).
"""
from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy.sparse import csr_matrix


@partial(jax.jit, static_argnames=('k',))
def mapk_from_scores(scores: jnp.ndarray,
                     relevance: jnp.ndarray,
                     k: int) -> jnp.ndarray:
    """MAP@k per the reference's exact formula (``metrics.py:167-198``):
    topk -> binary hits -> ``hits * cumsum(hits) / rank`` summed, divided by
    ``min(k, per-user positives)``; users with no positives contribute 0.

    Returns the per-user AP@k vector (callers average it).
    """
    _, topk_idx = jax.lax.top_k(scores, k)
    hits = jnp.take_along_axis(relevance, topk_idx, axis=1).astype(jnp.float32)
    weights = 1.0 / jnp.arange(1, k + 1, dtype=jnp.float32)
    numerator = (hits * jnp.cumsum(hits, axis=1) * weights).sum(axis=1)
    nnz = relevance.sum(axis=1)
    denominator = jnp.minimum(jnp.float32(k), nnz)
    return jnp.where(denominator > 0, numerator / denominator, 0.0)


@jax.jit
def mrr_from_scores(scores: jnp.ndarray,
                    relevance: jnp.ndarray) -> jnp.ndarray:
    """Reciprocal rank of each user's first relevant item in the full ranking
    (reference ``metrics.py:224-240``), without materializing the ranking:
    the first relevant item is the best-scoring relevant one, and its rank is
    1 + the number of items scored strictly higher.
    """
    rel = relevance > 0
    neg_inf = jnp.finfo(scores.dtype).min
    best_rel_score = jnp.max(jnp.where(rel, scores, neg_inf), axis=1, keepdims=True)
    rank = 1 + (scores > best_rel_score).sum(axis=1)
    has_rel = rel.any(axis=1)
    return jnp.where(has_rel, 1.0 / rank.astype(jnp.float32), 0.0)


@jax.jit
def auc_from_scores(scores: jnp.ndarray,
                    relevance: jnp.ndarray) -> jnp.ndarray:
    """Per-user ROC AUC via the closed-form Mann-Whitney rank statistic:
    ``(Σ ranks_of_positives - P(P+1)/2) / (P * N)``.

    Replaces the reference's per-user Python loop over
    ``torchmetrics.functional.auroc`` (``metrics.py:266-282``).  The sigmoid
    the reference applies first (``metrics.py:273-278``) is rank-preserving,
    so it is omitted.  Degenerate users (all-positive or all-negative rows)
    return 0.5.
    """
    rel = (relevance > 0).astype(jnp.float32)
    order = jnp.argsort(scores, axis=1)  # ascending
    # ranks[u, i] = 1-based rank of item i within user u's scores
    ranks = jnp.empty_like(order)
    ranks = jax.vmap(lambda o: jnp.zeros(o.shape, jnp.int32).at[o].set(
        jnp.arange(1, o.shape[0] + 1, dtype=jnp.int32)))(order)
    num_pos = rel.sum(axis=1)
    num_neg = rel.shape[1] - num_pos
    rank_sum = (ranks.astype(jnp.float32) * rel).sum(axis=1)
    denom = num_pos * num_neg
    auc = (rank_sum - num_pos * (num_pos + 1) / 2) / jnp.maximum(denom, 1.0)
    return jnp.where(denom > 0, auc, 0.5)


def _dense_relevance_block(targets: csr_matrix,
                           user_ids: np.ndarray) -> np.ndarray:
    """Host: slice csr rows for a user batch into a dense 0/1 block."""
    block = targets[np.asarray(user_ids)].toarray()
    return (block > 0).astype(np.float32)


def padded_positives(targets: csr_matrix, user_ids: np.ndarray,
                     max_degree: int = None):
    """Host: per-user positive item lists padded to a fixed width.

    Returns ``(pos_items [U, D] int32, pos_mask [U, D] float32)`` — the
    compact per-user representation consumed by the rank-based metric kernel
    (vs a dense ``[U, num_items]`` relevance block, this uploads
    ``max_degree / num_items`` of the data).
    """
    rows = targets[np.asarray(user_ids)]
    degrees = np.diff(rows.indptr)
    D = int(max_degree if max_degree is not None else max(int(degrees.max()), 1))
    U = len(user_ids)
    pos = np.zeros((U, D), dtype=np.int32)
    mask = np.zeros((U, D), dtype=np.float32)
    for i in range(U):
        d = min(int(degrees[i]), D)
        cols = rows.indices[rows.indptr[i]:rows.indptr[i] + d]
        pos[i, :d] = cols
        mask[i, :d] = 1.0
    return pos, mask


def positive_scores_in_block(scores: jnp.ndarray,
                             pos_items: jnp.ndarray,
                             col_offset: int = 0) -> jnp.ndarray:
    """Each positive's own score, read from the block that holds its column.

    ``scores [B, T]`` covers item columns ``[col_offset, col_offset + T)``;
    ``pos_items [B, D]`` are *global* ids.  Positives outside the block
    contribute 0, so summing (``psum``-ing across item shards) over a
    partition of the catalog yields every positive's true score.
    """
    local = pos_items - col_offset
    in_block = (local >= 0) & (local < scores.shape[1])
    safe = jnp.clip(local, 0, scores.shape[1] - 1)
    gathered = jnp.take_along_axis(scores, safe, axis=1)
    return jnp.where(in_block, gathered, 0.0)


def rank_counts_in_block(scores: jnp.ndarray,
                         pos_scores: jnp.ndarray,
                         pos_items: jnp.ndarray,
                         col_offset: int = 0):
    """Comparison counts that determine each positive's rank.

    ``scores [B, T]`` is a block of item columns ``[col_offset,
    col_offset + T)``; ``pos_scores [B, D]`` are the positives' *global*
    scores (from ``positive_scores_in_block``, psum-merged when sharded) and
    ``pos_items [B, D]`` their global ids.  Returns
    ``(greater, eq_after) [B, D] float32``:

    * ``greater`` — # items in the block scored strictly above the positive;
    * ``eq_after`` — # items tied with the positive at a larger column index
      (reproducing a stable ascending argsort's tie-break exactly).

    Counts are additive over item blocks — summing (or ``psum``-ing across
    item shards of a mesh) them over a partition of the catalog gives the
    global ranks: ``desc = greater + eq_after + 1`` and
    ``asc = num_items - greater - eq_after``.  This replaces a full
    ``argsort`` over the catalog (O(N log^2 N) sort passes on TPU) with one
    O(N * D) compare-reduce fusion on the VPU.
    """
    cols = col_offset + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    block = scores[:, None, :]                       # [B, 1, T]
    pos = pos_scores[:, :, None]                     # [B, D, 1]
    greater = (block > pos).sum(axis=-1).astype(jnp.float32)
    eq_after = ((block == pos) & (cols[:, None, :] > pos_items[:, :, None])
                ).sum(axis=-1).astype(jnp.float32)
    return greater, eq_after


@partial(jax.jit, static_argnames=('k', 'num_items'))
def metrics_from_rank_counts(greater: jnp.ndarray,
                             eq_after: jnp.ndarray,
                             pos_mask: jnp.ndarray,
                             k: int,
                             num_items: int) -> jnp.ndarray:
    """All three ranking metrics from each positive's comparison counts.

    * AUC  = Mann-Whitney from the ascending rank sum;
    * MRR  = 1 / min descending rank;
    * MAP@k = sum over positives with descending rank r <= k of
      (count of positives ranked <= r) / r, over ``min(k, degree)`` —
      identical to the reference's topk formulation for tie-free scores.

    Returns ``[3, batch]`` rows ``(ap@k, reciprocal rank, auc)``.
    """
    pos_desc = greater + eq_after + 1.0              # 1-based descending rank
    pos_asc = num_items - greater - eq_after         # 1-based ascending rank
    big = jnp.float32(num_items + 1)
    pos_desc_masked = jnp.where(pos_mask > 0, pos_desc, big)

    degree = pos_mask.sum(axis=1)
    num_neg = num_items - degree

    # AUC from ascending rank sum
    rank_sum = (pos_asc * pos_mask).sum(axis=1)
    denom = degree * num_neg
    auc_vec = jnp.where(denom > 0,
                        (rank_sum - degree * (degree + 1) / 2) / jnp.maximum(denom, 1.0),
                        0.5)

    # MRR from the best (smallest) descending rank
    best = pos_desc_masked.min(axis=1)
    rr_vec = jnp.where(degree > 0, 1.0 / best, 0.0)

    # MAP@k: sort each user's positive desc-ranks (over D only — cheap);
    # j-th smallest rank r_j contributes (j+1)/r_j when r_j <= k
    sorted_desc = jnp.sort(pos_desc_masked, axis=1)
    j = jnp.arange(1, sorted_desc.shape[1] + 1, dtype=jnp.float32)[None, :]
    contrib = jnp.where(sorted_desc <= k, j / sorted_desc, 0.0)
    ap_vec = jnp.where(degree > 0,
                       contrib.sum(axis=1) / jnp.minimum(jnp.float32(k),
                                                         jnp.maximum(degree, 1.0)),
                       0.0)

    return jnp.stack([ap_vec, rr_vec, auc_vec])


@partial(jax.jit, static_argnames=('k',))
def metrics_from_positive_ranks(scores: jnp.ndarray,
                                pos_items: jnp.ndarray,
                                pos_mask: jnp.ndarray,
                                k: int) -> jnp.ndarray:
    """All three ranking metrics from each user's positive-item ranks.

    The full ``[batch, num_items]`` score block stays on device; the only
    per-user data needed are positive item ids.  Ranks come from
    ``positive_rank_counts`` — one compare-reduce pass over the catalog per
    positive instead of a full argsort (measured ~10x faster at 10k-item
    catalogs; see docs/BENCHMARKS.md).

    Returns ``[3, batch]`` rows ``(ap@k, reciprocal rank, auc)``.
    """
    pos_scores = positive_scores_in_block(scores, pos_items)
    greater, eq_after = rank_counts_in_block(scores, pos_scores, pos_items)
    return metrics_from_rank_counts(greater, eq_after, pos_mask, k,
                                    scores.shape[1])


def _as_score_matrix(preds) -> jnp.ndarray:
    return jnp.asarray(preds, dtype=jnp.float32)


def mapk(targets: csr_matrix,
         user_ids: Union[np.ndarray, jnp.ndarray],
         preds: Union[np.ndarray, jnp.ndarray],
         k: int = 10) -> float:
    """Mean average precision at k (reference ``metrics.py:144-198``)."""
    preds = _as_score_matrix(preds)
    if k > preds.shape[1]:
        raise ValueError(
            f'Ensure ``k`` ({k}) is less than the number of items ({preds.shape[1]})'
        )
    relevance = jnp.asarray(_dense_relevance_block(targets, user_ids))
    return float(mapk_from_scores(preds, relevance, k).mean())


def mrr(targets: csr_matrix,
        user_ids: Union[np.ndarray, jnp.ndarray],
        preds: Union[np.ndarray, jnp.ndarray],
        k: int = None) -> float:
    """Mean reciprocal rank (reference ``metrics.py:201-240``); ``k`` ignored."""
    preds = _as_score_matrix(preds)
    relevance = jnp.asarray(_dense_relevance_block(targets, user_ids))
    return float(mrr_from_scores(preds, relevance).mean())


def auc(targets: csr_matrix,
        user_ids: Union[np.ndarray, jnp.ndarray],
        preds: Union[np.ndarray, jnp.ndarray],
        k: int = None) -> float:
    """Mean per-user ROC AUC (reference ``metrics.py:243-282``); ``k`` ignored."""
    preds = _as_score_matrix(preds)
    relevance = jnp.asarray(_dense_relevance_block(targets, user_ids))
    return float(auc_from_scores(preds, relevance).mean())
