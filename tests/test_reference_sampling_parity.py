"""Execute the REFERENCE's negative-sampling code and assert ours matches it.

``/root/reference/collie/interactions/datasets.py:390-445`` defines the
semantics both engines must honor: *exact* mode rejection-samples until each
negative is (a) not one of the user's positives and (b) distinct within the
row, falling back to unchecked uniform draws once a per-row budget is
exhausted; *approximate* mode is one unchecked uniform draw over the catalog.
That file is loaded here under a stub ``collie`` package (it needs only
``torch``/``numpy``/``scipy``/``pandas``/``tqdm`` plus three tiny
``collie.utils`` helpers) and its ``Interactions._negative_sample`` is run
for real against:

* ``collie_tpu.data.sampling.NegativeSampler`` (the host-side per-step path),
* ``collie_tpu.ops.device_sampling.complement_sample_negatives_impl`` (the
  scan engine's on-device segmented-binary-search sampler).

Checked properties: the never-a-positive guarantee, shape/scalar-vs-batch
conventions, and the per-item marginal distribution (uniform over each
user's complement — compared empirically between the two programs, not
against a re-typed constant).  Known, deliberate divergence: the reference
guarantees within-row distinctness; the scan engine keeps iid complement
draws with bounded dedup rounds (quality/throughput tradeoff measured in
docs/BENCHMARKS.md) — so distribution checks compare per-item marginals,
which both leave uniform over the complement.
"""
import importlib.util
import sys
import types
import warnings
from pathlib import Path

import numpy as np
import pytest
from scipy.sparse import coo_matrix, csr_matrix

pytest.importorskip('torch')

REF_DATASETS = Path('/root/reference/collie/interactions/datasets.py')


@pytest.fixture(scope='module')
def ref():
    """Load the reference's datasets.py under a stub ``collie`` package."""
    if not REF_DATASETS.exists():
        pytest.skip('reference checkout not available')

    def _infer(num, array):
        if num == 'infer':
            num = max(array) + 1
        return num

    def _make_mat(users, items, ratings=None, num_users='infer',
                  num_items='infer'):
        num_users = _infer(num_users, users)
        num_items = _infer(num_items, items)
        if ratings is None:
            ratings = np.ones_like(users)
        return coo_matrix((np.array(ratings), (np.array(users), np.array(items))),
                          shape=(num_users, num_items))

    pkg = sys.modules.get('collie')
    if pkg is None:
        pkg = types.ModuleType('collie')
        pkg.__path__ = []
        sys.modules['collie'] = pkg
    utils = types.ModuleType('collie.utils')
    utils.get_random_seed = lambda: 42
    utils._infer_num_if_needed_for_1d_array = _infer
    utils._create_sparse_ratings_matrix_helper = (
        lambda users, items, ratings=None, num_users='infer', num_items='infer':
        _make_mat(users, items, ratings, num_users, num_items))
    sys.modules['collie.utils'] = utils
    pkg.utils = utils

    spec = importlib.util.spec_from_file_location('collie_ref_datasets',
                                                  REF_DATASETS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['collie_ref_datasets'] = mod
    spec.loader.exec_module(mod)
    return mod


def _fixture_arrays(seed=0, num_users=30, num_items=25, per_user=6):
    """Every user interacts with ``per_user`` items; ids are contiguous."""
    rng = np.random.default_rng(seed)
    users, items = [], []
    for u in range(num_users):
        cols = rng.choice(num_items, size=per_user, replace=False)
        users += [u] * per_user
        items += list(cols)
    users, items = np.array(users), np.array(items)
    # guarantee contiguity of item ids
    missing = set(range(num_items)) - set(items.tolist())
    for m in sorted(missing):
        items[rng.integers(0, len(items))] = m
    return users, items


@pytest.fixture(scope='module')
def shared_data():
    users, items = _fixture_arrays()
    positives = set(zip(users.tolist(), items.tolist()))
    return users, items, positives


def _ref_interactions(ref, users, items, **kwargs):
    # remove_duplicate_user_item_pairs=False: the reference's dedup path uses
    # scipy's private ``dok_matrix._update``, removed in modern scipy; the
    # fixtures here are duplicate-free so the path is irrelevant to sampling.
    kwargs.setdefault('remove_duplicate_user_item_pairs', False)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        return ref.Interactions(users=users, items=items,
                                num_negative_samples=kwargs.pop('k', 5),
                                seed=kwargs.pop('seed', 42), **kwargs)


def _our_interactions(users, items, k=5, **kwargs):
    from collie_tpu.data import Interactions
    return Interactions(users=users, items=items, num_negative_samples=k,
                        seed=42, **kwargs)


def test_reference_exact_mode_never_yields_a_positive(ref, shared_data):
    users, items, positives = shared_data
    ds = _ref_interactions(ref, users, items)
    assert ds.positive_items == positives      # lookup set is the COO pairs
    for idx in range(0, len(users), 3):
        (u, i), negs = ds[idx]
        assert (u, i) in positives
        for n in negs:
            assert (u, int(n)) not in positives
        assert len(set(negs.tolist())) == len(negs)   # distinct within row


def test_our_host_sampler_matches_reference_guarantees(shared_data):
    from collie_tpu.data.sampling import NegativeSampler
    users, items, positives = shared_data
    inter = _our_interactions(users, items)
    sampler = NegativeSampler(inter)
    rng = np.random.default_rng(3)
    user_batch = np.arange(30)
    negs = sampler.sample(user_batch, rng)
    assert negs.shape == (30, 5)
    for r, u in enumerate(user_batch):
        for n in negs[r]:
            assert (int(u), int(n)) not in positives
        assert len(set(negs[r].tolist())) == len(negs[r])


def test_device_complement_sampler_matches_reference_guarantee(shared_data):
    import jax
    import jax.numpy as jnp
    from collie_tpu.ops.device_sampling import (build_complement_tables,
                                                complement_sample_negatives_impl)
    users, items, positives = shared_data
    mat = csr_matrix((np.ones_like(users), (users, items)), shape=(30, 25))
    indptr, shifted = map(jnp.asarray, build_complement_tables(mat))
    user_ids = np.repeat(np.arange(30), 4)
    negs = np.asarray(complement_sample_negatives_impl(
        jax.random.PRNGKey(0), user_ids, indptr, shifted,
        num_items=25, num_negative_samples=5))
    for r, u in enumerate(user_ids):
        for n in negs[r]:
            assert (int(u), int(n)) not in positives


def test_exact_marginals_match_reference_program(ref, shared_data):
    """Per-item draw frequency over one user's complement: the reference's
    rejection sampler vs our device sampler, compared to each other."""
    import jax
    import jax.numpy as jnp
    from collie_tpu.ops.device_sampling import (build_complement_tables,
                                                complement_sample_negatives_impl)
    users, items, positives = shared_data
    u = 7
    complement = sorted(set(range(25)) - {i for (uu, i) in positives if uu == u})

    ds = _ref_interactions(ref, users, items)
    n_draws = 3000
    ref_counts = np.zeros(25)
    for _ in range(n_draws):
        for n in ds._negative_sample(u):
            ref_counts[int(n)] += 1

    mat = csr_matrix((np.ones_like(users), (users, items)), shape=(30, 25))
    indptr, shifted = map(jnp.asarray, build_complement_tables(mat))
    user_ids = np.full(n_draws, u)
    negs = np.asarray(complement_sample_negatives_impl(
        jax.random.PRNGKey(1), user_ids, indptr, shifted,
        num_items=25, num_negative_samples=5))
    our_counts = np.bincount(negs.ravel(), minlength=25).astype(float)

    # both support sets are exactly the complement
    assert set(np.nonzero(ref_counts)[0].tolist()) == set(complement)
    assert set(np.nonzero(our_counts)[0].tolist()) == set(complement)
    ref_p = ref_counts[complement] / ref_counts.sum()
    our_p = our_counts[complement] / our_counts.sum()
    tv = 0.5 * np.abs(ref_p - our_p).sum()
    assert tv < 0.05, f'total-variation distance {tv:.3f} between programs'


def test_approximate_mode_matches_reference_shapes_and_distribution(ref,
                                                                    shared_data):
    users, items, _ = shared_data
    ds = _ref_interactions(ref, users, items,
                           max_number_of_samples_to_consider=0)
    assert ds.positive_items == {}        # approx mode skips the lookup set
    np.random.seed(11)
    scalar = ds._negative_sample(3)
    assert scalar.shape == (5,)
    batch = ds._negative_sample(np.arange(10))
    assert batch.shape == (10, 5)

    inter = _our_interactions(users, items,
                              max_number_of_samples_to_consider=0)
    from collie_tpu.data.sampling import NegativeSampler
    sampler = NegativeSampler(inter)
    rng = np.random.default_rng(11)
    ours = sampler.sample(np.arange(10), rng)
    assert ours.shape == (10, 5)

    # both are uniform over the full catalog
    n = 4000
    ref_draws = ds._negative_sample(np.zeros(n, dtype=int)).ravel()
    our_draws = sampler.sample(np.zeros(n, dtype=int), rng).ravel()
    ref_p = np.bincount(ref_draws, minlength=25) / (n * 5)
    our_p = np.bincount(our_draws, minlength=25) / (n * 5)
    tv = 0.5 * np.abs(ref_p - our_p).sum()
    assert tv < 0.05, f'total-variation distance {tv:.3f} between programs'


def test_approx_warning_fires_on_both_sides(ref, shared_data):
    users, items, _ = shared_data
    with pytest.warns(UserWarning, match='Approximate negative'):
        ref.Interactions(users=users, items=items, num_negative_samples=5,
                         max_number_of_samples_to_consider=5, seed=42,
                         remove_duplicate_user_item_pairs=False)
    with pytest.warns(UserWarning, match='Approximate negative'):
        _our_interactions(users, items, k=5,
                          max_number_of_samples_to_consider=5)


def test_reference_budget_fallback_can_yield_positives(ref):
    """The reference's exhausted-budget fallback draws UNCHECKED uniforms
    (datasets.py:417-425) — documents why bounded resampling on our side is
    the same contract, not a weaker one."""
    # 1 user, 4 items, 3 positives, 3 negatives requested with a 1-try budget
    users = np.array([0, 0, 0, 1])
    items = np.array([0, 1, 2, 3])
    ds = _ref_interactions(ref, users, items, k=3,
                           max_number_of_samples_to_consider=1,
                           check_num_negative_samples_is_valid=False)
    hits = 0
    for _ in range(50):
        negs = ds._negative_sample(0)
        hits += sum((0, int(n)) in ds.positive_items for n in negs)
    assert hits > 0
