"""Execute the REFERENCE's loss code and assert ours matches it.

The fixture-constant tests in ``tests/test_losses.py`` pin our numerics to
values re-typed from the reference's suite; this module upgrades that to
parity against the reference *program*: ``/root/reference/collie/loss/*.py``
is loaded under a stub ``collie`` package (those files need only ``torch`` +
intra-package imports — no lightning) and property-tested against
``collie_tpu.ops.losses`` on batches of random score tensors.  If either
side's code changes semantics, these tests fail — no constants involved.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from collie_tpu.ops import losses as jx

REF_LOSS_DIR = Path('/root/reference/collie/loss')

RTOL = 2e-5
ATOL = 1e-5


@pytest.fixture(scope='module')
def ref():
    """Load the reference loss modules under a stub ``collie`` package."""
    if not REF_LOSS_DIR.exists():
        pytest.skip('reference checkout not available')
    pkg = types.ModuleType('collie')
    pkg.__path__ = []
    sys.modules.setdefault('collie', pkg)
    loss_pkg = types.ModuleType('collie.loss')
    loss_pkg.__path__ = [str(REF_LOSS_DIR)]
    sys.modules['collie.loss'] = loss_pkg
    mods = {}
    for name in ('metadata_utils', 'bpr', 'hinge', 'warp'):
        spec = importlib.util.spec_from_file_location(
            f'collie.loss.{name}', REF_LOSS_DIR / f'{name}.py')
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f'collie.loss.{name}'] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _random_case(seed, batch_size, num_negative, num_items=50, n_meta=0):
    rng = np.random.default_rng(seed)
    pos_scores = rng.normal(0, 2, size=batch_size).astype(np.float32)
    neg_scores = rng.normal(0, 2, size=(num_negative, batch_size)).astype(np.float32)
    pos_items = rng.integers(0, num_items, size=batch_size)
    neg_items = rng.integers(0, num_items, size=(num_negative, batch_size))
    metadata, weights = {}, {}
    if n_meta:
        budget = 0.9
        for i in range(n_meta):
            metadata[f'meta_{i}'] = rng.integers(0, 4, size=num_items)
            weights[f'meta_{i}'] = budget / n_meta
    return pos_scores, neg_scores, pos_items, neg_items, metadata, weights


def _t(x):
    return torch.tensor(np.asarray(x))


CASES = [
    # (seed, batch, num_negative, n_meta)
    (0, 1, 2, 0),
    (1, 7, 5, 0),
    (2, 32, 10, 0),
    (3, 7, 5, 1),
    (4, 32, 10, 2),
    (5, 64, 3, 3),
]


@pytest.mark.parametrize('seed,batch,k,n_meta', CASES)
def test_ideal_difference_matches_reference(ref, seed, batch, k, n_meta):
    if n_meta == 0:
        pytest.skip('metadata-only check')
    _, _, pos_items, neg_items, metadata, weights = _random_case(
        seed, batch, k, n_meta=n_meta)
    expected = ref['metadata_utils'].ideal_difference_from_metadata(
        positive_items=_t(np.broadcast_to(pos_items, (k, batch))).long(),
        negative_items=_t(neg_items).long(),
        metadata={key: _t(v) for key, v in metadata.items()},
        metadata_weights=weights,
    ).numpy()
    actual = np.asarray(jx.ideal_difference_from_metadata(
        positive_items=np.broadcast_to(pos_items, (k, batch)),
        negative_items=neg_items,
        metadata=metadata,
        metadata_weights=weights,
    ))
    np.testing.assert_allclose(actual, expected, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize('seed,batch,k,n_meta', CASES)
@pytest.mark.parametrize('loss_name', ['bpr', 'hinge'])
def test_single_negative_losses_match_reference(ref, loss_name, seed, batch,
                                                k, n_meta):
    pos_scores, neg_scores, pos_items, neg_items, metadata, weights = \
        _random_case(seed, batch, k, n_meta=n_meta)
    ref_fn = getattr(ref[loss_name], f'{loss_name}_loss')
    jx_fn = getattr(jx, f'{loss_name}_loss')
    kwargs = {}
    ref_kwargs = {}
    if n_meta:
        kwargs = dict(positive_items=pos_items, negative_items=neg_items[0],
                      metadata=metadata, metadata_weights=weights)
        ref_kwargs = dict(positive_items=_t(pos_items).long(),
                          negative_items=_t(neg_items[0]).long(),
                          metadata={key: _t(v) for key, v in metadata.items()},
                          metadata_weights=weights)
    expected = float(ref_fn(_t(pos_scores), _t(neg_scores[0]), **ref_kwargs))
    actual = float(jx_fn(pos_scores, neg_scores[0], **kwargs))
    assert actual == pytest.approx(expected, rel=RTOL, abs=ATOL)


@pytest.mark.parametrize('seed,batch,k,n_meta', CASES)
@pytest.mark.parametrize('loss_name', ['bpr', 'hinge'])
def test_adaptive_losses_match_reference(ref, loss_name, seed, batch, k,
                                         n_meta):
    pos_scores, neg_scores, pos_items, neg_items, metadata, weights = \
        _random_case(seed, batch, k, n_meta=n_meta)
    ref_fn = getattr(ref[loss_name], f'adaptive_{loss_name}_loss')
    jx_fn = getattr(jx, f'adaptive_{loss_name}_loss')
    kwargs, ref_kwargs = {}, {}
    if n_meta:
        kwargs = dict(positive_items=pos_items, negative_items=neg_items,
                      metadata=metadata, metadata_weights=weights)
        ref_kwargs = dict(positive_items=_t(pos_items).long(),
                          negative_items=_t(neg_items).long(),
                          metadata={key: _t(v) for key, v in metadata.items()},
                          metadata_weights=weights)
    expected = float(ref_fn(_t(pos_scores), _t(neg_scores), **ref_kwargs))
    actual = float(jx_fn(pos_scores, neg_scores, **kwargs))
    assert actual == pytest.approx(expected, rel=RTOL, abs=ATOL)


@pytest.mark.parametrize('seed,batch,k,n_meta', CASES)
def test_warp_loss_matches_reference(ref, seed, batch, k, n_meta):
    pos_scores, neg_scores, pos_items, neg_items, metadata, weights = \
        _random_case(seed, batch, k, n_meta=n_meta)
    num_items = 50
    kwargs, ref_kwargs = {}, {}
    if n_meta:
        kwargs = dict(positive_items=pos_items, negative_items=neg_items,
                      metadata=metadata, metadata_weights=weights)
        ref_kwargs = dict(positive_items=_t(pos_items).long(),
                          negative_items=_t(neg_items).long(),
                          metadata={key: _t(v) for key, v in metadata.items()},
                          metadata_weights=weights)
    expected = float(ref['warp'].warp_loss(
        _t(pos_scores), _t(neg_scores), num_items, **ref_kwargs))
    actual = float(jx.warp_loss(pos_scores, neg_scores, num_items, **kwargs))
    assert actual == pytest.approx(expected, rel=RTOL, abs=ATOL)


def test_warp_no_violation_rows_zero_on_both_sides(ref):
    """Rows whose positives dominate every sampled negative contribute zero."""
    pos_scores = np.full(4, 10.0, dtype=np.float32)
    neg_scores = np.zeros((3, 4), dtype=np.float32)
    expected = float(ref['warp'].warp_loss(_t(pos_scores), _t(neg_scores), 50))
    actual = float(jx.warp_loss(pos_scores, neg_scores, 50))
    assert expected == 0.0
    assert actual == pytest.approx(expected, abs=ATOL)


def test_metadata_weight_validation_matches_reference(ref):
    """Both sides reject metadata weights summing above 1."""
    meta = {'genre': np.zeros(10, dtype=np.int64)}
    with pytest.raises(ValueError):
        ref['metadata_utils'].ideal_difference_from_metadata(
            positive_items=_t([1]).long(), negative_items=_t([2]).long(),
            metadata={'genre': _t(meta['genre'])},
            metadata_weights={'genre': 1.5})
    with pytest.raises(ValueError):
        jx.ideal_difference_from_metadata(
            positive_items=np.array([1]), negative_items=np.array([2]),
            metadata=meta, metadata_weights={'genre': 1.5})
