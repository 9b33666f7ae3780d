"""Feistel epoch shuffle (`ops/shuffle.py`): bijectivity and uniformity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collie_tpu.ops.shuffle import feistel_permutation


@pytest.mark.parametrize('n', [2, 3, 7, 100, 1024, 1025, 99_991, 131_072])
def test_bijection(n):
    p = np.asarray(feistel_permutation(jax.random.PRNGKey(3), n))
    assert p.shape == (n,)
    assert p.min() == 0 and p.max() == n - 1
    assert len(np.unique(p)) == n


def test_keys_give_different_orders():
    a = np.asarray(feistel_permutation(jax.random.PRNGKey(0), 10_000))
    b = np.asarray(feistel_permutation(jax.random.PRNGKey(1), 10_000))
    assert (a != b).mean() > 0.99


def test_positionwise_uniformity():
    """Each source index should land uniformly across destination
    positions over keys: chi-square-ish bound on a coarse histogram."""
    n, trials, bins = 1_000, 200, 10
    land = np.zeros((bins,), np.int64)
    for t in range(trials):
        p = np.asarray(feistel_permutation(jax.random.PRNGKey(t), n))
        # where does source index 0 land?
        pos = int(np.where(p == 0)[0][0])
        land[pos * bins // n] += 1
    expected = trials / bins
    chi2 = ((land - expected) ** 2 / expected).sum()
    # 9 dof; P(chi2 > 27.9) < 0.001
    assert chi2 < 27.9, f'position histogram skewed: {land}'


def test_not_order_preserving():
    """Guards against degenerate affine-like structure: runs of consecutive
    sources must not stay consecutive."""
    p = np.asarray(feistel_permutation(jax.random.PRNGKey(7), 100_000))
    diffs = np.diff(p[:1000])
    assert (np.abs(diffs) == 1).mean() < 0.01
