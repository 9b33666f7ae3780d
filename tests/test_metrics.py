"""Metric parity with the reference's deterministic toy problem.

Expected values are the hand-computed constants from
``/root/reference/tests/fixtures/metrics_fixtures.py:68-75``
(``mapk=0.7685185, mrr=0.8333333, auc=0.5277777``) over its 3-user x 4-item
fixture, exercised through both the jit'd ``*_from_scores`` kernels and the
csr-signature host wrappers (``tests/test_metrics.py:101-155`` in the
reference).
"""
import numpy as np
import pytest
from numpy.testing import assert_almost_equal

from collie_tpu.data import Interactions
from collie_tpu.ops import (auc, auc_from_scores, mapk, mapk_from_scores,
                            mrr, mrr_from_scores)


@pytest.fixture()
def implicit_interactions():
    return Interactions(
        users=[0, 0, 0, 1, 1, 1, 2, 2],
        items=[0, 1, 2, 1, 2, 3, 0, 2],
        ratings=[1, 1, 1, 1, 1, 1, 1, 1],
        check_num_negative_samples_is_valid=False,
    )


@pytest.fixture()
def implicit_predicted_scores():
    return np.array([
        [0.9, 0.4, 0.5, 0.7],
        [0.1, 1.2, 1.7, 0.12],
        [-1, -2, -3, 4],
    ], dtype=np.float32)


@pytest.fixture()
def targets(implicit_interactions):
    return implicit_interactions.mat.tocsr()


USER_IDS = np.array([0, 1, 2])


def test_mapk(targets, implicit_predicted_scores):
    score = mapk(targets, USER_IDS, implicit_predicted_scores, k=4)
    assert_almost_equal(score, 0.7685185, decimal=5)


def test_mapk_k_too_large_raises(targets, implicit_predicted_scores):
    with pytest.raises(ValueError):
        mapk(targets, USER_IDS, implicit_predicted_scores, k=5)


def test_mrr(targets, implicit_predicted_scores):
    score = mrr(targets, USER_IDS, implicit_predicted_scores)
    assert_almost_equal(score, 0.8333333, decimal=5)


def test_auc(targets, implicit_predicted_scores):
    score = auc(targets, USER_IDS, implicit_predicted_scores)
    assert_almost_equal(score, 0.5277777, decimal=5)


def test_from_scores_kernels_match_wrappers(targets, implicit_predicted_scores):
    relevance = (targets[USER_IDS].toarray() > 0).astype(np.float32)
    assert_almost_equal(
        float(mapk_from_scores(implicit_predicted_scores, relevance, 4).mean()),
        0.7685185, decimal=5)
    assert_almost_equal(
        float(mrr_from_scores(implicit_predicted_scores, relevance).mean()),
        0.8333333, decimal=5)
    assert_almost_equal(
        float(auc_from_scores(implicit_predicted_scores, relevance).mean()),
        0.5277777, decimal=5)


def test_mapk_user_with_no_positives_contributes_zero():
    scores = np.array([[0.5, 0.2, 0.1, 0.9]], dtype=np.float32)
    relevance = np.zeros((1, 4), dtype=np.float32)
    assert float(mapk_from_scores(scores, relevance, 4).mean()) == 0.0


def test_mrr_user_with_no_positives_contributes_zero():
    scores = np.array([[0.5, 0.2, 0.1, 0.9]], dtype=np.float32)
    relevance = np.zeros((1, 4), dtype=np.float32)
    assert float(mrr_from_scores(scores, relevance).mean()) == 0.0


def test_auc_degenerate_user_is_half():
    scores = np.array([[0.5, 0.2, 0.1, 0.9]], dtype=np.float32)
    assert float(auc_from_scores(scores, np.zeros((1, 4), np.float32)).mean()) == 0.5
    assert float(auc_from_scores(scores, np.ones((1, 4), np.float32)).mean()) == 0.5


def test_auc_perfect_ranking_is_one():
    scores = np.array([[4.0, 3.0, 2.0, 1.0]], dtype=np.float32)
    relevance = np.array([[1, 1, 0, 0]], dtype=np.float32)
    assert float(auc_from_scores(scores, relevance).mean()) == 1.0


def test_auc_matches_sklearn_on_random_problems(rng):
    from sklearn.metrics import roc_auc_score

    for _ in range(5):
        scores = rng.standard_normal((7, 50)).astype(np.float32)
        relevance = (rng.random((7, 50)) < 0.3).astype(np.float32)
        # ensure non-degenerate rows
        relevance[:, 0] = 1.0
        relevance[:, 1] = 0.0
        ours = np.asarray(auc_from_scores(scores, relevance))
        theirs = np.array([
            roc_auc_score(relevance[i], scores[i]) for i in range(len(scores))
        ])
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_metrics_from_positive_ranks_matches_dense_kernels(rng):
    """The rank-based kernel (fused-eval fast path) must agree with the dense
    relevance kernels on random problems."""
    from collie_tpu.ops.metrics import metrics_from_positive_ranks, padded_positives
    from scipy.sparse import csr_matrix

    for trial in range(3):
        U, I, k = 9, 60, 10
        scores = rng.standard_normal((U, I)).astype(np.float32)
        relevance = (rng.random((U, I)) < 0.15).astype(np.float32)
        relevance[:, 0] = 1.0  # no degenerate all-negative rows
        targets = csr_matrix(relevance)
        pos, mask = padded_positives(targets, np.arange(U))
        ap, rr, auc_v = np.asarray(metrics_from_positive_ranks(
            scores, pos, mask, k))
        np.testing.assert_allclose(ap, np.asarray(mapk_from_scores(scores, relevance, k)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(rr, np.asarray(mrr_from_scores(scores, relevance)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(auc_v, np.asarray(auc_from_scores(scores, relevance)),
                                   rtol=1e-5, atol=1e-6)


def test_metrics_from_positive_ranks_toy_values(targets, implicit_predicted_scores):
    from collie_tpu.ops.metrics import metrics_from_positive_ranks, padded_positives

    pos, mask = padded_positives(targets, USER_IDS)
    ap, rr, auc_v = np.asarray(metrics_from_positive_ranks(
        implicit_predicted_scores, pos, mask, 4))
    assert_almost_equal(float(ap.mean()), 0.7685185, decimal=5)
    assert_almost_equal(float(rr.mean()), 0.8333333, decimal=5)
    assert_almost_equal(float(auc_v.mean()), 0.5277777, decimal=5)


def test_rank_counts_reproduce_argsort_ties(rng):
    """Comparison-count ranks must reproduce a stable ascending argsort's
    tie-break exactly — ties resolve by ascending column index."""
    from collie_tpu.ops.metrics import (metrics_from_positive_ranks,
                                        padded_positives)
    from scipy.sparse import csr_matrix

    U, I, k = 6, 40, 5
    # heavy ties: scores quantized to 4 levels
    scores = (rng.integers(0, 4, (U, I))).astype(np.float32)
    relevance = (rng.random((U, I)) < 0.2).astype(np.float32)
    relevance[:, 0] = 1.0
    targets = csr_matrix(relevance)
    pos, mask = padded_positives(targets, np.arange(U))

    # reference: stable ascending argsort -> per-item asc rank
    order = np.argsort(scores, axis=1, kind='stable')
    asc = np.empty_like(order)
    for u in range(U):
        asc[u, order[u]] = np.arange(1, I + 1)
    pos_asc = np.take_along_axis(asc, pos, axis=1).astype(np.float64)
    pos_desc = I + 1 - pos_asc

    from collie_tpu.ops.metrics import (positive_scores_in_block,
                                        rank_counts_in_block)
    pos_scores = positive_scores_in_block(scores, pos)
    greater, eq_after = rank_counts_in_block(scores, pos_scores, pos)
    np.testing.assert_array_equal(np.asarray(greater + eq_after + 1.0) * mask,
                                  pos_desc * mask)
    np.testing.assert_array_equal(np.asarray(I - greater - eq_after) * mask,
                                  pos_asc * mask)
    # full metric kernel stays finite and bounded under ties
    ap, rr, auc_v = np.asarray(metrics_from_positive_ranks(scores, pos, mask, k))
    assert np.isfinite([ap, rr, auc_v]).all()


def test_rank_counts_additive_over_item_blocks(rng):
    """Counts summed over a partition of the catalog equal whole-catalog
    counts — the property the mesh evaluator's psum-merge relies on."""
    from collie_tpu.ops.metrics import (padded_positives,
                                        positive_scores_in_block,
                                        rank_counts_in_block)
    from scipy.sparse import csr_matrix

    U, I = 5, 37
    scores = rng.standard_normal((U, I)).astype(np.float32)
    scores[:, :12] = scores[:, 12:24]  # some ties across block boundaries
    relevance = (rng.random((U, I)) < 0.25).astype(np.float32)
    relevance[:, 0] = 1.0
    targets = csr_matrix(relevance)
    pos, mask = padded_positives(targets, np.arange(U))

    whole_ps = positive_scores_in_block(scores, pos)
    g_whole, ea_whole = rank_counts_in_block(scores, whole_ps, pos)

    splits = [0, 11, 24, I]
    ps_sum = np.zeros_like(np.asarray(whole_ps))
    for a, b in zip(splits[:-1], splits[1:]):
        ps_sum += np.asarray(positive_scores_in_block(scores[:, a:b], pos, a))
    np.testing.assert_allclose(ps_sum, np.asarray(whole_ps), rtol=1e-6)

    g_sum = np.zeros_like(ps_sum)
    ea_sum = np.zeros_like(ps_sum)
    for a, b in zip(splits[:-1], splits[1:]):
        g, ea = rank_counts_in_block(scores[:, a:b], ps_sum, pos, a)
        g_sum += np.asarray(g)
        ea_sum += np.asarray(ea)
    np.testing.assert_array_equal(g_sum, np.asarray(g_whole))
    np.testing.assert_array_equal(ea_sum, np.asarray(ea_whole))


def test_explicit_stateful_metric_protocol(rng):
    """``explicit_evaluate_in_batches`` streams into stateful metric objects
    (update/compute/reset, the torchmetrics protocol of the reference's
    ``metrics.py:465-502``) without buffering predictions."""
    from collie_tpu.data import ExplicitInteractions
    from collie_tpu.evaluate import explicit_evaluate_in_batches
    from collie_tpu.models import MatrixFactorizationModel

    users = np.repeat(np.arange(30), 5)
    items = np.concatenate([rng.choice(60, 5, replace=False) for _ in range(30)])
    ratings = rng.integers(1, 6, len(users))
    inter = ExplicitInteractions(users=users, items=items, ratings=ratings,
                                 allow_missing_ids=True, num_users=30,
                                 num_items=60)
    model = MatrixFactorizationModel(train=inter, embedding_dim=4, loss='mse',
                                     seed=0)

    class StreamingMSE:
        def __init__(self):
            self.sq = 0.0
            self.n = 0
            self.resets = 0

        def update(self, preds, ratings):
            self.sq += float(np.square(preds - ratings).sum())
            self.n += len(ratings)

        def compute(self):
            return self.sq / self.n

        def reset(self):
            self.resets += 1

    streaming = StreamingMSE()
    mse_builtin, mse_streaming = explicit_evaluate_in_batches(
        ['mse', streaming], inter, model, verbose=False)
    assert mse_streaming == pytest.approx(mse_builtin, rel=1e-6)
    assert streaming.resets == 1  # reset always called, as in the reference


def test_evaluators_validate_interaction_types(implicit_interactions):
    """Implicit evaluator rejects explicit data and vice versa (reference
    tests test_bad_evaluate_in_batches_with_explicit_data /
    test_bad_explicit_evaluate_in_batches_with_implicit_data)."""
    from collie_tpu.data import ExplicitInteractions
    from collie_tpu.evaluate import (evaluate_in_batches,
                                     explicit_evaluate_in_batches)
    from collie_tpu.metrics import mapk
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel

    model = MatrixFactorizationModel(train=implicit_interactions,
                                     embedding_dim=4, seed=0)
    mat = implicit_interactions.mat
    explicit = ExplicitInteractions(users=mat.row, items=mat.col,
                                    ratings=np.maximum(mat.data, 1),
                                    allow_missing_ids=True)
    with pytest.raises(ValueError, match='must be of type ``Interactions``'):
        evaluate_in_batches([mapk], explicit, model, verbose=False)
    with pytest.raises(ValueError,
                       match='must be of type ``ExplicitInteractions``'):
        explicit_evaluate_in_batches(['mse'], implicit_interactions, model,
                                     verbose=False)


def test_mapk_user_subset(targets, implicit_predicted_scores):
    """MAP over a user subset (reference ``test_map``,
    tests/test_metrics.py:101-108: users [1, 2] at k=4 -> 0.75)."""
    user_ids = np.array([1, 2])
    score = mapk(targets, user_ids, implicit_predicted_scores[user_ids, :], k=4)
    assert_almost_equal(score, 0.75, decimal=5)


def test_mapk_at_1(targets, implicit_predicted_scores):
    """MAP@1 toy constant (reference ``test_map_1``,
    tests/test_metrics.py:111-118: 2/3)."""
    score = mapk(targets, USER_IDS, implicit_predicted_scores, k=1)
    assert_almost_equal(score, 2 / 3, decimal=5)
