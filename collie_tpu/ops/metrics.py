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
