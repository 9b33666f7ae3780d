"""On-device negative-sampler guarantees (mirrors the host-sampler behavioral
tests in ``tests/test_interactions.py``, reference ``test_interactions.py:357-456``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.sparse import coo_matrix

from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401

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


def test_padded_sampler_bit_identical_to_csr_path(problem):
    """The padded comparison-count sampler consumes the same RNG stream and
    computes the same ``item = r + |{j: shifted_j <= r}|`` map as the CSR
    binary search — outputs must match exactly, so swapping the engine's
    sampler never shifts training numerics or calibrated gates."""
    from collie_tpu.ops.device_sampling import (
        build_padded_complement_table, complement_sample_negatives_impl,
        complement_sample_negatives_padded_impl)

    mat, _, num_users, num_items = problem
    indptr, shifted = build_complement_tables(mat)
    pad, counts = build_padded_complement_table(mat)
    assert pad.shape[1] % 128 == 0
    users = jnp.asarray(
        np.random.default_rng(3).integers(0, num_users, 5000).astype(np.int32))
    for dedup_rounds in (0, 1, 2):
        key = jax.random.PRNGKey(7)
        a = complement_sample_negatives_impl(
            key, users, jnp.asarray(indptr), jnp.asarray(shifted), num_items,
            6, dedup_rounds=dedup_rounds)
        b = complement_sample_negatives_padded_impl(
            key, users, jnp.asarray(pad), jnp.asarray(counts), num_items,
            6, dedup_rounds=dedup_rounds)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padded_sampler_near_full_user(problem):
    """A user holding all items but one must always draw that one item."""
    from scipy.sparse import csr_matrix
    from collie_tpu.ops.device_sampling import (
        build_padded_complement_table, complement_sample_negatives_padded_impl)

    num_items = 300
    mat = csr_matrix((np.ones(num_items - 1),
                      (np.zeros(num_items - 1, int), np.arange(num_items - 1))),
                     shape=(2, num_items))
    pad, counts = build_padded_complement_table(mat)
    negs = complement_sample_negatives_padded_impl(
        jax.random.PRNGKey(0), jnp.zeros(64, jnp.int32), jnp.asarray(pad),
        jnp.asarray(counts), num_items, 4)
    assert (np.asarray(negs) == num_items - 1).all()


def test_scan_engine_selects_padded_sampler_by_budget(implicit_train,
                                                      monkeypatch):
    """Engine auto-selection: padded table within budget, CSR fallback when
    the budget (COLLIE_TPU_PADDED_SAMPLER_BUDGET_MB) excludes it — and both
    engines train to identical params (bit-identical sampling)."""
    from collie_tpu.data import InteractionsDataLoader
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.training.scan_engine import build_scan_epoch_fns

    def run(budget):
        monkeypatch.setenv('COLLIE_TPU_PADDED_SAMPLER_BUDGET_MB', budget)
        loader = InteractionsDataLoader(interactions=implicit_train,
                                        batch_size=512, shuffle=True, seed=0)
        model = MatrixFactorizationModel(train=loader, embedding_dim=4,
                                         lr=1e-1, loss='hinge', seed=0)
        specs = model.optimizer_specs()
        fn, data, S, n = build_scan_epoch_fns(
            model, specs, [True] * len(specs), loader, shuffle=True,
            training=True)
        opt_states = tuple(
            jax.jit(spec.transform.init)(
                {k: model.params[k] for k in spec.keys}) for spec in specs)
        params, _, loss = fn(dict(model.params), opt_states, data,
                             jax.random.PRNGKey(0), np.int32(0))
        return data, jax.device_get(params), float(loss)

    data_pad, params_pad, loss_pad = run('512')
    data_csr, params_csr, loss_csr = run('0')
    assert 'bucket_specs' in data_pad and 'indptr' not in data_pad
    assert 'indptr' in data_csr and 'bucket_specs' not in data_csr
    assert loss_pad == loss_csr
    for k in params_pad:
        np.testing.assert_array_equal(params_pad[k], params_csr[k])


def test_scan_engine_sampler_env_selection(implicit_train, monkeypatch):
    """COLLIE_TPU_SAMPLER forces a specific exact-sampling kernel; all three
    train to identical params (bit-identical negatives at real positions,
    zero-weight padding rows)."""
    from collie_tpu.data import InteractionsDataLoader
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.training.scan_engine import build_scan_epoch_fns

    def run(kind):
        monkeypatch.setenv('COLLIE_TPU_SAMPLER', kind)
        loader = InteractionsDataLoader(interactions=implicit_train,
                                        batch_size=500,  # ragged: pad rows
                                        shuffle=True, seed=0)
        model = MatrixFactorizationModel(train=loader, embedding_dim=4,
                                         lr=1e-1, loss='hinge', seed=0)
        specs = model.optimizer_specs()
        fn, data, S, n = build_scan_epoch_fns(
            model, specs, [True] * len(specs), loader, shuffle=True,
            training=True)
        opt_states = tuple(
            jax.jit(spec.transform.init)(
                {k: model.params[k] for k in spec.keys}) for spec in specs)
        params, _, loss = fn(dict(model.params), opt_states, data,
                             jax.random.PRNGKey(0), np.int32(0))
        return jax.device_get(params), float(loss)

    params_b, loss_b = run('bucketed')
    params_p, loss_p = run('padded')
    params_c, loss_c = run('csr')
    assert loss_b == loss_p == loss_c
    for k in params_b:
        np.testing.assert_array_equal(params_b[k], params_p[k])
        np.testing.assert_array_equal(params_b[k], params_c[k])


def test_padded_sampler_chunked_path_matches_direct(problem):
    """n > the 8192-example chunk takes the lax.map path (whole-epoch row
    gathers would be O(n x P) memory — 40 GB at ML-10M scale); it must agree
    exactly with the small-n direct computation (same RNG stream)."""
    from collie_tpu.ops.device_sampling import (
        build_padded_complement_table, complement_sample_negatives_padded_impl)

    mat, _, num_users, num_items = problem
    pad, counts = build_padded_complement_table(mat)
    users = np.random.default_rng(5).integers(
        0, num_users, 20_000).astype(np.int32)
    key = jax.random.PRNGKey(11)
    big = complement_sample_negatives_padded_impl(
        key, jnp.asarray(users), jnp.asarray(pad), jnp.asarray(counts),
        num_items, 6, dedup_rounds=1)
    # the direct path on the identical draws: first 4096 rows must agree
    # (per-element counts are independent, RNG is shaped over the full batch)
    assert np.asarray(big).shape == (20_000, 6)
    forbidden = mat.tocsr()
    sample = np.asarray(big)[:2000]
    for row, u in zip(sample, users[:2000]):
        assert not forbidden[int(u)].toarray()[0][row].any()


@pytest.fixture(scope='module')
def skewed_problem():
    """Degrees spanning several power-of-two buckets, incl. exact boundary
    degrees (127/128/129) and one heavy user."""
    rng = np.random.default_rng(5)
    num_users, num_items = 40, 700
    degrees = rng.integers(1, 60, num_users)
    degrees[0], degrees[1], degrees[2], degrees[3] = 400, 129, 128, 127
    rows, cols = [], []
    for u, d in enumerate(degrees):
        rows.extend([u] * d)
        cols.extend(rng.choice(num_items, size=d, replace=False).tolist())
    mat = coo_matrix((np.ones(len(rows)), (np.asarray(rows), np.asarray(cols))),
                     shape=(num_users, num_items))
    return mat, np.asarray(rows, dtype=np.int32), num_items


def test_bucketed_sampler_bit_identical_to_padded(skewed_problem):
    """The degree-bucketed sampler consumes the same RNG stream as the padded
    (and CSR) kernels; at every real (non-padding) epoch position the outputs
    must match exactly, across multiple buckets and dedup rounds."""
    from collie_tpu.ops.device_sampling import (
        build_bucketed_complement_tables, build_padded_complement_table,
        complement_sample_negatives_bucketed_impl,
        complement_sample_negatives_padded_impl)

    mat, ex_rows, num_items = skewed_problem
    specs_np, counts_np, n_canon = build_bucketed_complement_tables(
        mat, ex_rows, chunk=256)
    assert len(specs_np) >= 3, 'fixture must span multiple buckets'
    assert n_canon == len(ex_rows)
    specs = tuple((jnp.asarray(e), jnp.asarray(r), jnp.asarray(t))
                  for e, r, t in specs_np)
    pad_tbl, counts2 = build_padded_complement_table(mat)
    np.testing.assert_array_equal(counts_np, counts2)

    n = len(ex_rows)
    B = 64
    S = -(-n // B)
    n_used, pad = n, S * B - n
    perm = np.random.default_rng(9).permutation(n).astype(np.int32)
    idx = np.concatenate([perm, np.full(pad, perm[0], np.int32)])
    users = jnp.asarray(ex_rows[idx])

    for dedup_rounds in (0, 1, 2):
        key = jax.random.PRNGKey(11)
        a = complement_sample_negatives_padded_impl(
            key, users, jnp.asarray(pad_tbl), jnp.asarray(counts_np),
            num_items, 6, dedup_rounds=dedup_rounds)
        b = complement_sample_negatives_bucketed_impl(
            key, users, jnp.asarray(idx), n_used, n, specs,
            jnp.asarray(counts_np), num_items, 6,
            dedup_rounds=dedup_rounds, chunk=256)
        np.testing.assert_array_equal(np.asarray(a)[:n_used],
                                      np.asarray(b)[:n_used])


def test_bucketed_sampler_never_hits_positives(skewed_problem):
    from collie_tpu.ops.device_sampling import (
        build_bucketed_complement_tables,
        complement_sample_negatives_bucketed_impl)

    mat, ex_rows, num_items = skewed_problem
    csr = mat.tocsr()
    positives = set(zip(mat.row.tolist(), mat.col.tolist()))
    specs_np, counts_np, n = build_bucketed_complement_tables(mat, ex_rows)
    specs = tuple((jnp.asarray(e), jnp.asarray(r), jnp.asarray(t))
                  for e, r, t in specs_np)
    perm = np.random.default_rng(3).permutation(n).astype(np.int32)
    users = jnp.asarray(ex_rows[perm])
    negs = np.asarray(complement_sample_negatives_bucketed_impl(
        jax.random.PRNGKey(2), users, jnp.asarray(perm), n, n, specs,
        jnp.asarray(counts_np), num_items, 8))
    assert negs.min() >= 0 and negs.max() < num_items
    collisions = sum((int(u), int(i)) in positives
                     for u, row in zip(np.asarray(users), negs) for i in row)
    assert collisions == 0


def test_bucketed_table_bytes_smaller_than_padded(skewed_problem):
    from collie_tpu.ops.device_sampling import (bucketed_table_bytes,
                                                padded_table_bytes)
    mat, _, _ = skewed_problem
    assert bucketed_table_bytes(mat) < padded_table_bytes(mat) / 2
