"""Loss numerics parity with the reference.

Expected values are the hand-computed constants from the reference's own test
suite (``/root/reference/tests/test_losses.py:80-215``) over its fixed score
fixtures (``tests/fixtures/loss_fixtures.py:5-83``), so passing here means
bit-level behavioral parity with collie's losses.
"""
import numpy as np
import pytest
from numpy.testing import assert_almost_equal, assert_array_equal

from collie_tpu.ops import (adaptive_bpr_loss,
                            adaptive_hinge_loss,
                            bpr_loss,
                            hinge_loss,
                            ideal_difference_from_metadata,
                            warp_loss)

# fixed score tensor mirroring the reference fixture (loss_fixtures.py:5-11)
SCORES = np.array([
    1.1, 1.3, 4.7, -7.234,
    -1.3, 0.7, 4.7, -2.2468,
    -4.7, 1.3, 3.56, -0.8924,
    4.01, 2.7, 3.7, -5.2468,
    3.89, 12.8, -1.7, -0.8143,
], dtype=np.float32)

POSITIVE_ITEMS = np.array([0, 1, 2, 3])
NEGATIVE_ITEMS = np.array([4, 5, 6, 7])
MANY_NEGATIVE_ITEMS = np.array([
    [4, 5, 6, 7],
    [8, 9, 10, 11],
    [12, 13, 14, 15],
    [16, 17, 18, 19],
])
POSITIVE_SCORES = SCORES[POSITIVE_ITEMS]
NEGATIVE_SCORES = SCORES[NEGATIVE_ITEMS]
MANY_NEGATIVE_SCORES = SCORES[MANY_NEGATIVE_ITEMS]

METADATA_A = np.array([
    0, 1, 1, 2,
    0, 0, 0, 1,
    2, 1, 1, 2,
    0, 0, 1, 2,
    0, 0, 1, 2,
])
METADATA_B = np.array([
    1, 2, 2, 3,
    3, 2, 1, 3,
    3, 2, 2, 2,
    1, 1, 2, 2,
    1, 1, 2, 2,
])


def test_ideal_difference_weight_sum_error():
    with pytest.raises(ValueError, match='must be <=1'):
        ideal_difference_from_metadata(
            positive_items=POSITIVE_ITEMS,
            negative_items=NEGATIVE_ITEMS,
            metadata={'a': METADATA_A, 'b': METADATA_B},
            metadata_weights={'a': .2, 'b': .9},
        )


def test_ideal_difference_a():
    ideal_diff = ideal_difference_from_metadata(
        positive_items=POSITIVE_ITEMS,
        negative_items=NEGATIVE_ITEMS,
        metadata={'a': METADATA_A},
        metadata_weights={'a': .2},
    )
    assert_array_equal(np.asarray(ideal_diff), np.array([.8, 1, 1, 1], dtype=np.float32))


def test_ideal_difference_no_matches():
    ideal_diff = ideal_difference_from_metadata(
        positive_items=POSITIVE_ITEMS,
        negative_items=NEGATIVE_ITEMS,
        metadata={'a': np.array([0, 0, 0, 0, 1, 1, 1, 1, 1])},
        metadata_weights={'a': .2},
    )
    assert_array_equal(np.asarray(ideal_diff), np.ones(4, dtype=np.float32))


def test_ideal_difference_a_and_b():
    ideal_diff = ideal_difference_from_metadata(
        positive_items=np.tile(POSITIVE_ITEMS, (4, 1)),
        negative_items=MANY_NEGATIVE_ITEMS,
        metadata={'a': METADATA_A, 'b': METADATA_B},
        metadata_weights={'a': .2, 'b': .3},
    )
    expected = np.array([
        [.8, .7, 1, .7],
        [1, .5, .5, .8],
        [.5, 1, .5, .8],
        [.5, 1, .5, .8],
    ], dtype=np.float32)
    assert_array_equal(np.round(np.asarray(ideal_diff), 5), expected)


def test_bpr_loss():
    actual = bpr_loss(POSITIVE_SCORES, NEGATIVE_SCORES)
    assert_almost_equal(float(actual), (1.93074 + 1.36897) / 4, decimal=3)


def test_hinge_loss():
    actual = hinge_loss(POSITIVE_SCORES, NEGATIVE_SCORES)
    assert_almost_equal(float(actual), (7.3872 + 37.00656384) / 4, decimal=3)


def test_adaptive_bpr_loss():
    actual = adaptive_bpr_loss(POSITIVE_SCORES, MANY_NEGATIVE_SCORES)
    assert_almost_equal(float(actual), 6.592 / 4, decimal=3)


def test_adaptive_hinge_loss():
    actual = adaptive_hinge_loss(POSITIVE_SCORES, MANY_NEGATIVE_SCORES)
    assert_almost_equal(float(actual), 252.420 / 4, decimal=3)


def test_warp_loss():
    actual = warp_loss(POSITIVE_SCORES, MANY_NEGATIVE_SCORES, num_items=4)
    assert_almost_equal(float(actual), (11.366 + 72.385) / 4, decimal=3)


def test_bpr_loss_metadata():
    actual = bpr_loss(
        POSITIVE_SCORES, NEGATIVE_SCORES,
        positive_items=POSITIVE_ITEMS, negative_items=NEGATIVE_ITEMS,
        metadata={'a': METADATA_A}, metadata_weights={'a': 0.2},
    )
    assert_almost_equal(float(actual), (1.73073 + 1.37570) / 4, decimal=3)


def test_hinge_loss_metadata():
    actual = hinge_loss(
        POSITIVE_SCORES, NEGATIVE_SCORES,
        positive_items=POSITIVE_ITEMS, negative_items=NEGATIVE_ITEMS,
        metadata={'a': METADATA_A}, metadata_weights={'a': 0.2},
    )
    assert_almost_equal(float(actual), (7.3872 + 37.00656384) / 4, decimal=3)


def test_adaptive_bpr_loss_metadata():
    actual = adaptive_bpr_loss(
        POSITIVE_SCORES, MANY_NEGATIVE_SCORES,
        positive_items=POSITIVE_ITEMS, negative_items=MANY_NEGATIVE_ITEMS,
        metadata={'a': METADATA_A, 'b': METADATA_B},
        metadata_weights={'a': 0.2, 'b': 0.3},
    )
    assert_almost_equal(float(actual), (2.746 + 2.088) / 4, decimal=3)


def test_adaptive_hinge_loss_metadata():
    actual = adaptive_hinge_loss(
        POSITIVE_SCORES, MANY_NEGATIVE_SCORES,
        positive_items=POSITIVE_ITEMS, negative_items=MANY_NEGATIVE_ITEMS,
        metadata={'a': METADATA_A, 'b': METADATA_B},
        metadata_weights={'a': 0.2, 'b': 0.3},
    )
    assert_almost_equal(float(actual), 61.2829, decimal=3)


def test_warp_loss_metadata():
    actual = warp_loss(
        POSITIVE_SCORES, MANY_NEGATIVE_SCORES, num_items=4,
        positive_items=POSITIVE_ITEMS, negative_items=MANY_NEGATIVE_ITEMS,
        metadata={'a': METADATA_A, 'b': METADATA_B},
        metadata_weights={'a': 0.2, 'b': 0.3},
    )
    assert_almost_equal(float(actual), (10.390 + 65.063) / 4, decimal=3)


def test_sample_weights_no_op_when_all_ones():
    full = hinge_loss(POSITIVE_SCORES, NEGATIVE_SCORES)
    weighted = hinge_loss(POSITIVE_SCORES, NEGATIVE_SCORES,
                          sample_weights=np.ones(4, dtype=np.float32))
    assert_almost_equal(float(full), float(weighted), decimal=5)


def test_sample_weights_mask_out_padding():
    # padding row 0 in at index 3 and masking it must reproduce the
    # 3-row loss scaled to a 3-row denominator
    padded_pos = np.concatenate([POSITIVE_SCORES[:3], POSITIVE_SCORES[:1]])
    padded_neg = np.concatenate([NEGATIVE_SCORES[:3], NEGATIVE_SCORES[:1]])
    weights = np.array([1, 1, 1, 0], dtype=np.float32)
    masked = hinge_loss(padded_pos, padded_neg, sample_weights=weights)
    unpadded = hinge_loss(POSITIVE_SCORES[:3], NEGATIVE_SCORES[:3])
    assert_almost_equal(float(masked), float(unpadded), decimal=5)


def test_warp_no_violation_contributes_zero():
    # positive scores far above every negative -> zero loss
    pos = np.full(4, 100.0, dtype=np.float32)
    actual = warp_loss(pos, MANY_NEGATIVE_SCORES, num_items=1000)
    assert float(actual) == 0.0
