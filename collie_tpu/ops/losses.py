"""Implicit ranking losses as pure jnp functions.

Rebuild of ``/root/reference/collie/loss/`` (``bpr.py:8,92``, ``hinge.py:8,88``,
``warp.py:8``, ``metadata_utils.py:6``).  Numerics match the reference exactly
(verified against its fixture values in ``tests/test_losses.py``), including:

* the composite ``(loss.sum() + loss.pow(2).sum()) / batch_size`` reduction
  unique to collie (``hinge.py:85``, ``bpr.py:89``, ``warp.py:133``);
* the "partial credit" ideal score difference from categorical item metadata
  (``metadata_utils.py:6-71``);
* collie's *modified* BPR (``ideal - sigmoid(pos - neg)``, not ``-log σ``;
  ``bpr.py:75-89``) and modified WARP rank weight ``log(num_items / tries)``
  (``warp.py:113-120``).

All functions share one signature (``base_pipeline.py:626-634``) so the train
step can swap them statically under ``jit``.  ``many_negative_scores`` follows
the reference's ``[num_negative_samples, batch]`` axis convention.  An extra
``sample_weights`` argument supports the fixed-shape padded batches produced by
the loaders: weighted sums, with the denominator being the weighted count.

Everything here is branch-free, fixed-shape jnp — the WARP first-violation
scan is an argmax over position-weighted masks, not a loop — so XLA fuses each
loss into the surrounding backward pass with no host round-trips.
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import nn as jnn


def ideal_difference_from_metadata(
    positive_items: jnp.ndarray,
    negative_items: jnp.ndarray,
    metadata: Optional[Dict[str, jnp.ndarray]],
    metadata_weights: Optional[Dict[str, float]],
) -> jnp.ndarray:
    """Ideal positive-negative score gap given categorical item metadata
    (reference ``metadata_utils.py:6-71``).

    The gap starts at 1.0 and is reduced by ``metadata_weights[k]`` for every
    metadata field ``k`` on which the negative item matches the positive item.
    Weights must sum to <= 1.
    """
    weight_sum = sum(metadata_weights.values())
    if weight_sum > 1:
        raise ValueError(f'sum of metadata weights was {weight_sum}, must be <=1')

    positive_items = jnp.asarray(positive_items)
    negative_items = jnp.asarray(negative_items)
    match_frac = jnp.zeros(positive_items.shape, dtype=jnp.float32)
    for key, array in metadata.items():
        array = jnp.asarray(array).reshape(-1)
        matches = array[positive_items.astype(jnp.int32)] == \
            array[negative_items.astype(jnp.int32)]
        match_frac = match_frac + matches.astype(jnp.float32) * metadata_weights[key]
    return 1.0 - match_frac


def _ideal_difference_or_one(positive_items, negative_items, metadata, metadata_weights):
    if metadata is not None and len(metadata) > 0:
        return ideal_difference_from_metadata(positive_items=positive_items,
                                              negative_items=negative_items,
                                              metadata=metadata,
                                              metadata_weights=metadata_weights)
    return jnp.float32(1.0)


def _composite_reduction(loss: jnp.ndarray,
                         batch_size: int,
                         sample_weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    """collie's L1+L2 composite reduction ``(Σl + Σl²) / B``
    (reference ``hinge.py:85``), generalized to weighted/padded batches."""
    if sample_weights is None:
        return (loss.sum() + jnp.square(loss).sum()) / batch_size
    w = sample_weights.astype(loss.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    return ((loss * w).sum() + (jnp.square(loss) * w).sum()) / denom


def bpr_loss(positive_scores: jnp.ndarray,
             negative_scores: jnp.ndarray,
             num_items: Optional[Any] = None,
             positive_items: Optional[jnp.ndarray] = None,
             negative_items: Optional[jnp.ndarray] = None,
             metadata: Optional[Dict[str, jnp.ndarray]] = None,
             metadata_weights: Optional[Dict[str, float]] = None,
             sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """collie's modified BPR: ``ideal_difference - sigmoid(pos - neg)``
    with composite reduction (reference ``bpr.py:8-89``)."""
    ideal_difference = _ideal_difference_or_one(positive_items, negative_items,
                                                metadata, metadata_weights)
    loss = ideal_difference - jnn.sigmoid(positive_scores - negative_scores)
    return _composite_reduction(loss, positive_scores.shape[0], sample_weights)


def hinge_loss(positive_scores: jnp.ndarray,
               negative_scores: jnp.ndarray,
               num_items: Optional[Any] = None,
               positive_items: Optional[jnp.ndarray] = None,
               negative_items: Optional[jnp.ndarray] = None,
               metadata: Optional[Dict[str, jnp.ndarray]] = None,
               metadata_weights: Optional[Dict[str, float]] = None,
               sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pairwise hinge: ``max(0, ideal_difference - (pos - neg))`` with composite
    reduction (reference ``hinge.py:8-85``)."""
    ideal_difference = _ideal_difference_or_one(positive_items, negative_items,
                                                metadata, metadata_weights)
    loss = jnp.maximum(ideal_difference - (positive_scores - negative_scores), 0.0)
    return _composite_reduction(loss, positive_scores.shape[0], sample_weights)


def _select_hardest_negatives(many_negative_scores, positive_items, negative_items):
    """Max over the ``num_negative_samples`` axis, plus matching negative-item
    IDs for metadata credit (reference ``hinge.py:157-164``, ``bpr.py:153-160``)."""
    highest_idx = jnp.argmax(many_negative_scores, axis=0)
    batch_range = jnp.arange(many_negative_scores.shape[1])
    highest_scores = many_negative_scores[highest_idx, batch_range]
    if negative_items is not None and positive_items is not None:
        negative_items = jnp.asarray(negative_items)[highest_idx, batch_range]
    return highest_scores, negative_items


def adaptive_bpr_loss(positive_scores: jnp.ndarray,
                      many_negative_scores: jnp.ndarray,
                      num_items: Optional[Any] = None,
                      positive_items: Optional[jnp.ndarray] = None,
                      negative_items: Optional[jnp.ndarray] = None,
                      metadata: Optional[Dict[str, jnp.ndarray]] = None,
                      metadata_weights: Optional[Dict[str, float]] = None,
                      sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """WARP-approximating BPR over the hardest sampled negative
    (reference ``bpr.py:92-167``)."""
    highest, negative_items = _select_hardest_negatives(
        many_negative_scores, positive_items, negative_items)
    return bpr_loss(positive_scores, highest,
                    positive_items=positive_items, negative_items=negative_items,
                    metadata=metadata, metadata_weights=metadata_weights,
                    sample_weights=sample_weights)


def adaptive_hinge_loss(positive_scores: jnp.ndarray,
                        many_negative_scores: jnp.ndarray,
                        num_items: Optional[Any] = None,
                        positive_items: Optional[jnp.ndarray] = None,
                        negative_items: Optional[jnp.ndarray] = None,
                        metadata: Optional[Dict[str, jnp.ndarray]] = None,
                        metadata_weights: Optional[Dict[str, float]] = None,
                        sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """WARP-approximating hinge over the hardest sampled negative
    (reference ``hinge.py:88-171``)."""
    highest, negative_items = _select_hardest_negatives(
        many_negative_scores, positive_items, negative_items)
    return hinge_loss(positive_scores, highest,
                      positive_items=positive_items, negative_items=negative_items,
                      metadata=metadata, metadata_weights=metadata_weights,
                      sample_weights=sample_weights)


def warp_loss(positive_scores: jnp.ndarray,
              many_negative_scores: jnp.ndarray,
              num_items: int,
              positive_items: Optional[jnp.ndarray] = None,
              negative_items: Optional[jnp.ndarray] = None,
              metadata: Optional[Dict[str, jnp.ndarray]] = None,
              metadata_weights: Optional[Dict[str, float]] = None,
              sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """collie's modified WARP (reference ``warp.py:8-154``).

    Per batch row, scans the ``max_trials = num_negative_samples`` sampled
    negatives for the first rank violation
    (``ideal_difference - pos + neg > 0``) and weights its hinge value by
    ``log(num_items / number_of_tries)`` — deliberately harsher than canonical
    WARP's ``log(floor((num_items - 1) / tries))`` (``warp.py:113-120``).  Rows
    with no violation within ``max_trials`` contribute zero loss
    (``warp.py:122-131``).

    The reference's sequential first-violation search + in-place masking
    (``warp.py:136-154``) is expressed here as one branch-free argmax over
    position-weighted binary violations — the fixed-shape formulation XLA needs.
    """
    if negative_items is not None and positive_items is not None:
        positive_items = jnp.broadcast_to(
            jnp.asarray(positive_items)[None, :], many_negative_scores.shape)

    if metadata is not None and len(metadata) > 0:
        ideal_difference = ideal_difference_from_metadata(
            positive_items=positive_items,
            negative_items=negative_items,
            metadata=metadata,
            metadata_weights=metadata_weights,
        ).T  # [K, B] -> [B, K], as the reference transposes (``warp.py:84``)
    else:
        ideal_difference = jnp.float32(1.0)

    batch_size = positive_scores.shape[0]
    max_trials = many_negative_scores.shape[0]

    # hinge value per (row, trial): [B, K]
    hinge = ideal_difference - positive_scores[:, None] + many_negative_scores.T

    first_violation_idx, first_violation_value, loss_weights, \
        should_count_loss = _warp_first_violation(hinge, num_items)

    loss = loss_weights * first_violation_value * should_count_loss
    return _composite_reduction(loss, batch_size, sample_weights)


def _warp_first_violation(hinge: jnp.ndarray, num_items: int):
    """The first-violation scan shared by :func:`warp_loss` and
    :func:`warp_loss_sparse` — functional form of the reference's
    ``_find_first_loss_violation`` + weight/sentinel machinery
    (``warp.py:104-154``).  ``hinge`` is ``[B, K]``; returns
    ``(first_violation_idx, first_violation_value, loss_weights,
    should_count_loss)``, each ``[B]``.  ``first_violation_idx == K`` selects
    the sentinel ones-column ("ran out of attempts"; value 1.0, counted 0)."""
    batch_size, max_trials = hinge.shape
    ones = jnp.ones((batch_size, 1), dtype=hinge.dtype)
    hinge_with_ones = jnp.concatenate([hinge, ones], axis=1)

    violations = (hinge_with_ones > 0).astype(hinge.dtype)
    reverse_positions = jnp.arange(max_trials + 1, 0, -1, dtype=hinge.dtype)
    first_violation_idx = jnp.argmax(violations * reverse_positions, axis=1)

    first_violation_value = jnp.take_along_axis(
        hinge_with_ones, first_violation_idx[:, None], axis=1)[:, 0]

    number_of_tries = (first_violation_idx + 1).astype(hinge.dtype)
    loss_weights = jnp.log(num_items / number_of_tries)
    should_count_loss = (number_of_tries <= max_trials).astype(hinge.dtype)
    return (first_violation_idx, first_violation_value, loss_weights,
            should_count_loss)


def warp_loss_sparse(positive_scores: jnp.ndarray,
                     many_negative_scores_ng: jnp.ndarray,
                     rescore_pair: Any,
                     num_items: int,
                     positive_items: Optional[jnp.ndarray] = None,
                     negative_items: Optional[jnp.ndarray] = None,
                     metadata: Optional[Dict[str, jnp.ndarray]] = None,
                     metadata_weights: Optional[Dict[str, float]] = None,
                     sample_weights: Optional[jnp.ndarray] = None
                     ) -> jnp.ndarray:
    """:func:`warp_loss` with a sparse backward: WARP's gradient only flows
    to the positive and the FIRST VIOLATING negative per row, yet autodiff
    through the dense form still scatter-adds ``K*B`` mostly-zero rows into
    the item table.  Here the first-violation scan runs on gradient-free
    scores (``positive_scores`` may be grad-free too, shapes ``[B]`` /
    ``[K, B]``) and only positive + selected negative are re-scored with
    gradient via ``rescore_pair(items) -> [2, B]`` (row 0 positive, row 1
    selected), so the backward touches ``2B`` rows in one scatter per table.
    Values match :func:`warp_loss` exactly and gradients match wherever
    ``rescore_pair`` reproduces the selection scores (deterministic
    ``score()`` — the caller's precondition).

    Uncounted rows (no violation within ``K`` trials): the dense path's
    selected value is the sentinel constant 1.0 with weight-mask 0, carrying
    zero gradient; here the 0 mask multiplies the re-scored hinge, which
    zeroes both value and gradient identically.
    """
    K, B = many_negative_scores_ng.shape
    pos_ng = jax.lax.stop_gradient(positive_scores)

    ideal_difference = _ideal_difference_or_one(
        positive_items, negative_items, metadata, metadata_weights)
    ideal_bk = (ideal_difference.T if ideal_difference.ndim == 2
                else jnp.broadcast_to(ideal_difference, (B, K)))    # [B, K]

    hinge_ng = ideal_bk - pos_ng[:, None] + many_negative_scores_ng.T
    idx, _, loss_weights, should_count = _warp_first_violation(
        hinge_ng, num_items)

    batch_range = jnp.arange(B)
    safe_idx = jnp.minimum(idx, K - 1)          # sentinel rows are masked out
    selected_items = jnp.asarray(negative_items)[safe_idx, batch_range]
    pair = rescore_pair(selected_items)                             # grad here
    ideal_selected = ideal_bk[batch_range, safe_idx]

    value = ideal_selected - pair[0] + pair[1]
    loss = loss_weights * value * should_count
    return _composite_reduction(loss, B, sample_weights)


def mse_loss(predictions: jnp.ndarray,
             ratings: jnp.ndarray,
             sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean squared error for explicit feedback (reference resolves ``'mse'``
    to ``torch.nn.MSELoss`` at ``base_pipeline.py:286-291``)."""
    sq = jnp.square(predictions - ratings)
    if sample_weights is None:
        return sq.mean()
    w = sample_weights.astype(sq.dtype)
    return (sq * w).sum() / jnp.maximum(w.sum(), 1.0)


def mae_loss(predictions: jnp.ndarray,
             ratings: jnp.ndarray,
             sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean absolute error for explicit feedback (reference ``'mae'`` ->
    ``torch.nn.L1Loss``, ``base_pipeline.py:286-291``)."""
    ab = jnp.abs(predictions - ratings)
    if sample_weights is None:
        return ab.mean()
    w = sample_weights.astype(ab.dtype)
    return (ab * w).sum() / jnp.maximum(w.sum(), 1.0)
