"""On-device negative-sampler guarantees (mirrors the host-sampler behavioral
tests in ``tests/test_interactions.py``, reference ``test_interactions.py:357-456``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.sparse import coo_matrix

from collie_tpu.ops.device_sampling import (build_complement_tables,
                                            complement_sample_negatives,
                                            sample_negatives)


@pytest.fixture(scope='module')
def problem():
    rng = np.random.default_rng(0)
    num_users, num_items = 50, 200
    rows = rng.integers(0, num_users, 2000)
    cols = rng.integers(0, num_items, 2000)
    mat = coo_matrix((np.ones(len(rows)), (rows, cols)),
                     shape=(num_users, num_items)).tocsr()
    coo = mat.tocoo()
    positives = set(zip(coo.row.tolist(), coo.col.tolist()))
    return mat, positives, num_users, num_items


def test_complement_sampler_never_hits_positives(problem):
    mat, positives, num_users, num_items = problem
    indptr, shifted = build_complement_tables(mat)
    users = jnp.asarray(np.random.default_rng(1).integers(0, num_users, 3000)
                        .astype(np.int32))
    negs = np.asarray(complement_sample_negatives(
        jax.random.PRNGKey(1), users, jnp.asarray(indptr), jnp.asarray(shifted),
        num_items, 10))
    assert negs.min() >= 0 and negs.max() < num_items
    collisions = sum((int(u), int(i)) in positives
                     for u, row in zip(np.asarray(users), negs) for i in row)
    assert collisions == 0


def test_complement_sampler_is_uniform_over_complement(problem):
    mat, _, _, num_items = problem
    indptr, shifted = build_complement_tables(mat)
    users = jnp.zeros(100_000, jnp.int32)
    negs = np.asarray(complement_sample_negatives(
        jax.random.PRNGKey(2), users, jnp.asarray(indptr), jnp.asarray(shifted),
        num_items, 1))[:, 0]
    counts = np.bincount(negs, minlength=num_items)
    pos0 = mat[0].indices
    assert counts[pos0].sum() == 0
    free = np.setdiff1d(np.arange(num_items), pos0)
    # Poisson noise: cv ~ 1/sqrt(mean); allow 3x headroom
    cv = counts[free].std() / counts[free].mean()
    assert cv < 3.0 / np.sqrt(counts[free].mean())


def test_complement_sampler_dedup_round_reduces_duplicates(problem):
    mat, _, num_users, num_items = problem
    indptr, shifted = build_complement_tables(mat)
    users = jnp.asarray(np.random.default_rng(3).integers(0, num_users, 2000)
                        .astype(np.int32))

    def dup_count(dedup_rounds):
        negs = np.asarray(complement_sample_negatives(
            jax.random.PRNGKey(3), users, jnp.asarray(indptr), jnp.asarray(shifted),
            num_items, 10, dedup_rounds=dedup_rounds))
        return sum(len(row) - len(set(row.tolist())) for row in negs)

    without = dup_count(0)
    with_dedup = dup_count(1)
    assert with_dedup < without


def test_complement_sampler_user_with_many_positives(problem):
    """A user holding most of the catalog still samples only from the few
    remaining free items."""
    num_items = 20
    users_arr = np.zeros(17, dtype=np.int64)
    items_arr = np.arange(17)
    mat = coo_matrix((np.ones(17), (users_arr, items_arr)), shape=(1, num_items)).tocsr()
    indptr, shifted = build_complement_tables(mat)
    negs = np.asarray(complement_sample_negatives(
        jax.random.PRNGKey(4), jnp.zeros(500, jnp.int32), jnp.asarray(indptr),
        jnp.asarray(shifted), num_items, 2))
    assert set(np.unique(negs).tolist()) <= {17, 18, 19}


def test_rounds_sampler_matches_guarantees(problem):
    mat, positives, num_users, num_items = problem
    coo = mat.tocoo()
    keys = np.sort(coo.row.astype(np.int64) * num_items + coo.col).astype(np.int32)
    users = jnp.asarray(np.random.default_rng(5).integers(0, num_users, 1000)
                        .astype(np.int32))
    negs = np.asarray(sample_negatives(
        jax.random.PRNGKey(5), users, jnp.asarray(keys), num_items, 5, exact=True))
    collisions = sum((int(u), int(i)) in positives
                     for u, row in zip(np.asarray(users), negs) for i in row)
    assert collisions == 0


def test_approx_sampler_shape_and_range(problem):
    _, _, num_users, num_items = problem
    users = jnp.zeros(100, jnp.int32)
    negs = np.asarray(sample_negatives(
        jax.random.PRNGKey(6), users, jnp.zeros(1, jnp.int32), num_items, 7,
        exact=False))
    assert negs.shape == (100, 7)
    assert negs.min() >= 0 and negs.max() < num_items


def test_distinct_sampler_guarantees(problem):
    from collie_tpu.ops.device_sampling import distinct_complement_sample_negatives

    mat, positives, num_users, num_items = problem
    indptr, shifted = build_complement_tables(mat)
    users = jnp.asarray(np.random.default_rng(9).integers(0, num_users, 3000)
                        .astype(np.int32))
    negs = np.asarray(distinct_complement_sample_negatives(
        jax.random.PRNGKey(9), users, jnp.asarray(indptr), jnp.asarray(shifted),
        num_items, 10))
    # no positives, no within-row duplicates — both guaranteed by construction
    collisions = sum((int(u), int(i)) in positives
                     for u, row in zip(np.asarray(users), negs) for i in row)
    assert collisions == 0
    dups = sum(len(row) - len(set(row.tolist())) for row in negs)
    assert dups == 0
    assert negs.min() >= 0 and negs.max() < num_items


def test_distinct_sampler_marginals_near_uniform(problem):
    from collie_tpu.ops.device_sampling import distinct_complement_sample_negatives

    mat, _, _, num_items = problem
    indptr, shifted = build_complement_tables(mat)
    users = jnp.zeros(50_000, jnp.int32)
    negs = np.asarray(distinct_complement_sample_negatives(
        jax.random.PRNGKey(10), users, jnp.asarray(indptr), jnp.asarray(shifted),
        num_items, 5)).reshape(-1)
    counts = np.bincount(negs, minlength=num_items)
    pos0 = mat[0].indices
    assert counts[pos0].sum() == 0
    free = np.setdiff1d(np.arange(num_items), pos0)
    cv = counts[free].std() / counts[free].mean()
    assert cv < 4.0 / np.sqrt(counts[free].mean())


def test_distinct_sampler_rows_are_shuffled(problem):
    """WARP scans negatives in order — rows must not come back sorted."""
    from collie_tpu.ops.device_sampling import distinct_complement_sample_negatives

    mat, _, num_users, num_items = problem
    indptr, shifted = build_complement_tables(mat)
    users = jnp.zeros(200, jnp.int32)
    negs = np.asarray(distinct_complement_sample_negatives(
        jax.random.PRNGKey(11), users, jnp.asarray(indptr), jnp.asarray(shifted),
        num_items, 8))
    sorted_rows = sum(bool((np.diff(row) > 0).all()) for row in negs)
    assert sorted_rows < 10  # ~1/8! chance per row if properly shuffled
