"""Data-layer behavioral tests, mirroring the reference's guarantees
(``/root/reference/tests/test_interactions.py``): exact negatives never collide
with a user's positives, approximate sampling skips membership machinery,
validation and dedup semantics, loader batch equivalence.
"""
import numpy as np
import pytest

from collie_tpu.data import (ApproximateNegativeSamplingInteractionsDataLoader,
                             ExplicitInteractions,
                             Interactions,
                             InteractionsDataLoader,
                             NegativeSampler)

USERS = [0, 0, 0, 1, 1, 1, 2, 2]
ITEMS = [0, 1, 2, 1, 2, 3, 0, 2]
RATINGS = [1, 2, 3, 4, 5, 4, 3, 2]


@pytest.fixture()
def interactions():
    return Interactions(users=USERS, items=ITEMS, ratings=RATINGS,
                        num_negative_samples=1, seed=42,
                        check_num_negative_samples_is_valid=False)


def test_basic_properties(interactions):
    assert interactions.num_users == 3
    assert interactions.num_items == 4
    assert interactions.num_interactions == 8
    assert len(interactions) == 8


def test_zero_ratings_filtered_with_warning():
    with pytest.warns(UserWarning, match='Filtering these rows out'):
        inter = Interactions(users=[0, 0, 1, 1, 2, 2], items=[0, 1, 1, 2, 0, 2],
                             ratings=[1, 0, 1, 1, 1, 1],
                             check_num_negative_samples_is_valid=False)
    assert inter.num_interactions == 5


def test_missing_ids_raise_without_flag():
    with pytest.raises(ValueError, match='must contain every integer'):
        Interactions(users=[0, 2], items=[0, 1], ratings=[1, 1],
                     check_num_negative_samples_is_valid=False)


def test_missing_ids_allowed_with_flag():
    inter = Interactions(users=[0, 2], items=[0, 1], ratings=[1, 1],
                         allow_missing_ids=True,
                         check_num_negative_samples_is_valid=False)
    assert inter.num_users == 3


def test_duplicate_pairs_removed_keeping_last():
    inter = ExplicitInteractions(users=[0, 0, 1, 0], items=[0, 1, 0, 0],
                                 ratings=[1, 2, 3, 5])
    assert inter.num_interactions == 3
    dense = inter.toarray()
    assert dense[0, 0] == 5  # later value wins, same as the reference's DOK overwrite


def test_num_negative_samples_validation():
    with pytest.raises(AssertionError, match='num_negative_samples'):
        Interactions(users=USERS, items=ITEMS, ratings=RATINGS,
                     num_negative_samples=3,
                     check_num_negative_samples_is_valid=True)


def test_exact_negative_samples_never_positive():
    inter = Interactions(users=USERS, items=ITEMS, ratings=RATINGS,
                         num_negative_samples=1, seed=7,
                         check_num_negative_samples_is_valid=False)
    sampler = NegativeSampler(inter)
    rng = np.random.default_rng(0)
    users = np.array(USERS)
    for _ in range(50):
        negs = sampler.sample(users, rng)
        assert not inter.contains_pairs(
            np.broadcast_to(users[:, None], negs.shape), negs).any()


def test_exact_negative_samples_no_duplicates_within_row():
    rng_data = np.random.default_rng(0)
    users = np.repeat(np.arange(50), 4)
    items = np.concatenate([rng_data.choice(100, 4, replace=False) for _ in range(50)])
    inter = Interactions(users=users, items=items, allow_missing_ids=True,
                         num_users=50, num_items=100,
                         num_negative_samples=10, seed=3,
                         check_num_negative_samples_is_valid=False)
    sampler = NegativeSampler(inter)
    rng = np.random.default_rng(1)
    negs = sampler.sample(users[:50], rng)
    for row in negs:
        assert len(set(row.tolist())) == len(row)


def test_approximate_mode_has_no_guarantees_but_right_shape():
    inter = Interactions(users=USERS, items=ITEMS, ratings=RATINGS,
                         num_negative_samples=2, seed=7,
                         max_number_of_samples_to_consider=0,
                         check_num_negative_samples_is_valid=False)
    assert not inter.exact_negative_sampling
    sampler = NegativeSampler(inter)
    negs = sampler.sample(np.array(USERS), np.random.default_rng(0))
    assert negs.shape == (8, 2)
    assert ((negs >= 0) & (negs < 4)).all()


def test_getitem_shapes(interactions):
    (user, item), negs = interactions[0]
    assert np.isscalar(user) or user.ndim == 0
    assert negs.shape == (1,)
    (users, items), negs = interactions[np.array([0, 1, 2])]
    assert users.shape == (3,)
    assert negs.shape == (3, 1)


def test_explicit_getitem():
    inter = ExplicitInteractions(users=USERS, items=ITEMS, ratings=RATINGS)
    users, items, ratings = inter[np.arange(8)]
    assert set(ratings.tolist()) <= set(RATINGS)


def test_dataloader_batches_cover_all_interactions(interactions):
    loader = InteractionsDataLoader(interactions=interactions, batch_size=3, shuffle=False)
    seen = []
    for batch in loader:
        valid = batch['mask'].astype(bool)
        assert batch['users'].shape == (3,)
        assert batch['neg_items'].shape == (3, 1)
        seen.extend(zip(batch['users'][valid].tolist(), batch['pos_items'][valid].tolist()))
    assert sorted(seen) == sorted(zip(USERS, ITEMS))


def test_dataloader_shuffle_is_deterministic_per_seed(interactions):
    loader_a = InteractionsDataLoader(interactions=interactions, batch_size=4,
                                      shuffle=True, seed=11)
    loader_b = InteractionsDataLoader(interactions=interactions, batch_size=4,
                                      shuffle=True, seed=11)
    batches_a = list(loader_a)
    batches_b = list(loader_b)
    for a, b in zip(batches_a, batches_b):
        np.testing.assert_array_equal(a['users'], b['users'])
        np.testing.assert_array_equal(a['neg_items'], b['neg_items'])


def test_dataloader_reshuffles_across_epochs(interactions):
    loader = InteractionsDataLoader(interactions=interactions, batch_size=8,
                                    shuffle=True, seed=11)
    first = next(iter(loader))
    second = next(iter(loader))
    assert not np.array_equal(first['users'], second['users']) or \
        not np.array_equal(first['pos_items'], second['pos_items'])


def test_approximate_loader_forces_approximate_sampling(interactions):
    loader = ApproximateNegativeSamplingInteractionsDataLoader(
        interactions=interactions, batch_size=4)
    assert loader.approximate_negative_sampling
    assert not loader.interactions.exact_negative_sampling


def test_approximate_loader_rejects_explicit():
    explicit = ExplicitInteractions(users=USERS, items=ITEMS, ratings=RATINGS)
    with pytest.raises(ValueError, match='does not support'):
        ApproximateNegativeSamplingInteractionsDataLoader(interactions=explicit)


def test_explicit_loader_batches():
    explicit = ExplicitInteractions(users=USERS, items=ITEMS, ratings=RATINGS)
    loader = InteractionsDataLoader(interactions=explicit, batch_size=5)
    batches = list(loader)
    assert len(batches) == 2
    assert 'ratings' in batches[0]
    total_valid = sum(int(b['mask'].sum()) for b in batches)
    assert total_valid == 8


def test_loader_proxies_dataset_attributes(interactions):
    loader = InteractionsDataLoader(interactions=interactions, batch_size=4)
    assert loader.num_users == 3
    assert loader.num_items == 4
    assert loader.num_negative_samples == 1
    assert loader.num_interactions == 8
    assert loader.mat is interactions.mat


def test_loader_kwarg_splitting_constructor():
    loader = InteractionsDataLoader(users=USERS, items=ITEMS, ratings=RATINGS,
                                    num_negative_samples=1, seed=1,
                                    check_num_negative_samples_is_valid=False,
                                    batch_size=4)
    assert loader.num_interactions == 8


def test_prefetch_loader_is_drop_in(interactions):
    from collie_tpu.data import PrefetchLoader

    base = InteractionsDataLoader(interactions=interactions, batch_size=3,
                                  shuffle=False)
    wrapped = PrefetchLoader(base)
    assert wrapped.num_users == base.num_users
    assert len(wrapped) == len(base)
    base_batches = list(base)
    wrapped_batches = list(wrapped)
    assert len(wrapped_batches) == len(base_batches)
    np.testing.assert_array_equal(wrapped_batches[0]['users'],
                                  base_batches[0]['users'])


def test_prefetch_loader_propagates_producer_errors():
    from collie_tpu.data import PrefetchLoader

    class Exploding:
        def __iter__(self):
            yield {'users': np.zeros(2)}
            raise RuntimeError('boom')

    with pytest.raises(RuntimeError, match='boom'):
        list(PrefetchLoader(Exploding()))


def test_prefetch_loader_trains_hdf5(tmp_path):
    from collie_tpu.data import HDF5InteractionsDataLoader, PrefetchLoader, write_hdf5_meta
    from collie_tpu.data.synthetic import generate_interactions_df
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.training.trainer import CollieTrainer
    from collie_tpu.utils import pandas_df_to_hdf5

    df = generate_interactions_df(num_users=80, num_items=160, num_interactions=2000,
                                  seed=5)
    path = str(tmp_path / 'p.h5')
    pandas_df_to_hdf5(df, path)
    write_hdf5_meta(path, num_users=80, num_items=160)
    loader = PrefetchLoader(HDF5InteractionsDataLoader(
        hdf5_path=path, batch_size=256, shuffle=True, num_negative_samples=4))
    model = MatrixFactorizationModel(train=loader, embedding_dim=8,
                                     loss='adaptive', seed=0)
    trainer = CollieTrainer(model, max_epochs=2, verbosity=0, seed=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 2


def test_head_and_tail(interactions):
    head = interactions.head(2)
    assert head.shape == (2, 4)
    np.testing.assert_array_equal(head, interactions.toarray()[:2])
    tail = interactions.tail(1)
    np.testing.assert_array_equal(tail, interactions.toarray()[-1:])
    # negative / oversized n handling (reference datasets.py:188-193)
    assert interactions.head(-1).shape[0] == 2
    assert interactions.head(100).shape[0] == 3


def test_interactions_from_dense_matrix():
    dense = np.array([[1, 0, 2], [0, 3, 0]])
    inter = ExplicitInteractions(mat=dense)
    assert inter.num_users == 2
    assert inter.num_items == 3
    assert inter.num_interactions == 3
    np.testing.assert_array_equal(inter.toarray(), dense)


def test_interactions_len_and_minmax(interactions):
    assert len(interactions) == 8
    assert interactions.min_rating == 1
    assert interactions.max_rating == 5


@pytest.mark.parametrize('users,items,ratings', [
    ([0, 1, 2], [0, 1], [1, 1, 1]),       # items short
    ([0, 1], [0, 1, 2], [1, 1, 1]),       # users short
    ([0, 1, 2], [0, 1, 2], [1, 1]),       # ratings short
    ([0, 1], [0, 1, 2], [1]),             # all mismatched
])
def test_mismatched_input_lengths_raise(users, items, ratings):
    """Reference TestInteractionsWithInvalidLengths
    (tests/test_interactions.py:129-159)."""
    with pytest.raises(ValueError):
        Interactions(users=users, items=items, ratings=ratings,
                     check_num_negative_samples_is_valid=False)


def test_hdf5_one_indexed_store_raises(tmp_path):
    """The dim-infer scan validates ids are zero-indexed, as the reference's
    does (``datasets.py:632-650``) — a 1-indexed store would silently shift
    every embedding row."""
    import pandas as pd

    from collie_tpu.data import HDF5Interactions
    from collie_tpu.utils import pandas_df_to_hdf5

    df = pd.DataFrame({'user_id': np.array(USERS) + 1,
                       'item_id': np.array(ITEMS) + 1})
    path = str(tmp_path / 'one_indexed.h5')
    pandas_df_to_hdf5(df, path)
    with pytest.raises(ValueError, match='must both be 0'):
        HDF5Interactions(hdf5_path=path)


def test_all_data_loaders_output_equal(tmp_path):
    """All three loader families yield identical positive streams over the
    same unshuffled data and proxy identical dataset attributes (reference
    ``test_all_data_loaders_output_equal``, tests/test_interactions.py:691-790)."""
    import pandas as pd

    from collie_tpu.data import HDF5InteractionsDataLoader, write_hdf5_meta
    from collie_tpu.utils import pandas_df_to_hdf5

    kwargs = dict(batch_size=3, shuffle=False, drop_last=False, seed=7)
    inter_dl = InteractionsDataLoader(users=USERS, items=ITEMS,
                                      num_negative_samples=2,
                                      check_num_negative_samples_is_valid=False,
                                      **kwargs)
    approx_dl = ApproximateNegativeSamplingInteractionsDataLoader(
        users=USERS, items=ITEMS, num_negative_samples=2,
        check_num_negative_samples_is_valid=False, **kwargs)

    path = str(tmp_path / 'same.h5')
    pandas_df_to_hdf5(pd.DataFrame({'user_id': USERS, 'item_id': ITEMS}), path)
    write_hdf5_meta(path, num_users=3, num_items=4)
    hdf5_dl = HDF5InteractionsDataLoader(hdf5_path=path,
                                         num_negative_samples=2, **kwargs)

    assert inter_dl.num_users == approx_dl.num_users == hdf5_dl.num_users == 3
    assert inter_dl.num_items == approx_dl.num_items == hdf5_dl.num_items == 4
    assert (inter_dl.num_interactions == approx_dl.num_interactions
            == hdf5_dl.num_interactions == 8)
    assert len(inter_dl) == len(approx_dl) == len(hdf5_dl) == 3

    def positive_stream(dl):
        users, items = [], []
        for batch in dl:
            keep = batch['mask'].astype(bool)
            users.extend(batch['users'][keep].tolist())
            items.extend(batch['pos_items'][keep].tolist())
        return users, items

    streams = [positive_stream(dl) for dl in (inter_dl, approx_dl, hdf5_dl)]
    assert streams[0] == streams[1] == streams[2] == (USERS, ITEMS)

    for dl in (inter_dl, approx_dl, hdf5_dl):
        for batch in dl:
            assert batch['neg_items'].shape[-1] == 2


def test_hdf5_loader_drop_last(tmp_path):
    """``drop_last=True`` drops the final partial chunk, matching the
    reference loader's torch-DataLoader semantics (``dataloaders.py:297-397``)."""
    import pandas as pd

    from collie_tpu.data import HDF5InteractionsDataLoader, write_hdf5_meta
    from collie_tpu.utils import pandas_df_to_hdf5

    path = str(tmp_path / 'dl.h5')
    pandas_df_to_hdf5(pd.DataFrame({'user_id': USERS, 'item_id': ITEMS}), path)
    write_hdf5_meta(path, num_users=3, num_items=4)

    dl = HDF5InteractionsDataLoader(hdf5_path=path, batch_size=3,
                                    drop_last=True, seed=0)
    batches = list(dl)
    assert len(dl) == len(batches) == 2
    assert all(batch['mask'].all() for batch in batches)
