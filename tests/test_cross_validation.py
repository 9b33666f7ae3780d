"""Split guarantees mirroring ``/root/reference/tests/test_cross_validation.py:141-288``."""
import numpy as np
import pytest

from collie_tpu.data import ExplicitInteractions, Interactions, random_split, stratified_split
from collie_tpu.data.synthetic import generate_implicit_interactions


@pytest.fixture(scope='module')
def interactions():
    return generate_implicit_interactions(num_users=60, num_items=120,
                                          num_interactions=2500, seed=0,
                                          check_num_negative_samples_is_valid=False)


def test_random_split_proportions(interactions):
    train, test = random_split(interactions, test_p=0.2, seed=42)
    n = len(interactions)
    assert len(train) + len(test) == n
    assert abs(len(test) - 0.2 * n) <= 1
    assert train.num_users == interactions.num_users
    assert train.num_items == interactions.num_items


def test_random_split_with_validation(interactions):
    train, val, test = random_split(interactions, val_p=0.1, test_p=0.2, seed=42)
    n = len(interactions)
    assert len(train) + len(val) + len(test) == n
    assert abs(len(val) - 0.1 * n) <= 1


def test_random_split_no_overlap(interactions):
    train, test = random_split(interactions, test_p=0.2, seed=42)
    train_keys = set(zip(train.mat.row.tolist(), train.mat.col.tolist()))
    test_keys = set(zip(test.mat.row.tolist(), test.mat.col.tolist()))
    assert not train_keys & test_keys


def test_random_split_deterministic(interactions):
    a_train, a_test = random_split(interactions, test_p=0.2, seed=7)
    b_train, b_test = random_split(interactions, test_p=0.2, seed=7)
    np.testing.assert_array_equal(np.sort(a_test.mat.row), np.sort(b_test.mat.row))


def test_stratified_split_every_user_in_every_split(interactions):
    train, test = stratified_split(interactions, test_p=0.2, seed=42)
    all_users = set(np.unique(interactions.mat.row).tolist())
    assert set(np.unique(train.mat.row).tolist()) == all_users
    assert set(np.unique(test.mat.row).tolist()) == all_users


def test_stratified_split_with_validation(interactions):
    train, val, test = stratified_split(interactions, val_p=0.1, test_p=0.2, seed=42)
    all_users = set(np.unique(interactions.mat.row).tolist())
    for split in (train, val, test):
        assert set(np.unique(split.mat.row).tolist()) == all_users
    assert len(train) + len(val) + len(test) == len(interactions)


def test_stratified_split_no_overlap(interactions):
    train, test = stratified_split(interactions, test_p=0.2, seed=42)
    train_keys = set(zip(train.mat.row.tolist(), train.mat.col.tolist()))
    test_keys = set(zip(test.mat.row.tolist(), test.mat.col.tolist()))
    assert not train_keys & test_keys
    assert len(train) + len(test) == len(interactions)


def test_stratified_split_single_interaction_user_raises():
    inter = Interactions(users=[0, 1, 1, 2, 2], items=[0, 1, 2, 0, 2],
                         ratings=[1] * 5, check_num_negative_samples_is_valid=False)
    with pytest.raises(ValueError, match='force_split'):
        stratified_split(inter, test_p=0.3, seed=0)


def test_stratified_split_force_split_puts_singletons_in_train():
    inter = Interactions(users=[0, 1, 1, 2, 2], items=[0, 1, 2, 0, 2],
                         ratings=[1] * 5, check_num_negative_samples_is_valid=False)
    train, test = stratified_split(inter, test_p=0.3, seed=0, force_split=True)
    assert 0 in train.mat.row
    assert 0 not in test.mat.row


def test_splits_preserve_interactions_type(interactions):
    explicit = ExplicitInteractions(mat=interactions.mat,
                                    num_users=interactions.num_users,
                                    num_items=interactions.num_items,
                                    allow_missing_ids=True)
    train, test = stratified_split(explicit, test_p=0.2, seed=1)
    assert isinstance(train, ExplicitInteractions)
    train, test = random_split(explicit, test_p=0.2, seed=1)
    assert isinstance(train, ExplicitInteractions)


def test_invalid_proportions_raise(interactions):
    with pytest.raises(ValueError):
        random_split(interactions, val_p=0.5, test_p=0.6)
    with pytest.raises(ValueError):
        stratified_split(interactions, test_p=0.0)


def test_hdf5_interactions_cannot_be_split(tmp_path):
    """Out-of-core datasets refuse in-memory splits, matching the
    reference's assertion (reference tests test_bad_random_split_
    HDF5Interactions / test_bad_stratified_split_HDF5Interactions)."""
    from collie_tpu.data import HDF5Interactions
    from collie_tpu.data.synthetic import generate_interactions_df
    from collie_tpu.utils import pandas_df_to_hdf5

    df = generate_interactions_df(seed=3)
    path = str(tmp_path / 'inter.h5')
    pandas_df_to_hdf5(df, path)
    h5 = HDF5Interactions(hdf5_path=path, num_users=943, num_items=1682)
    with pytest.raises(AssertionError, match='not supported'):
        random_split(h5)
    with pytest.raises(AssertionError, match='not supported'):
        stratified_split(h5)


@pytest.mark.parametrize('split_fn', [random_split, stratified_split])
@pytest.mark.parametrize('bad_kwargs', [
    dict(val_p=0.9, test_p=0.2),   # combined > 1
    dict(val_p=0.7, test_p=0.3),   # combined == 1
    dict(val_p=-0.1, test_p=0.3),  # negative val_p, combined < 1
    dict(test_p=1.1),              # test_p > 1
    dict(test_p=1),                # test_p == 1
    dict(test_p=-0.7),             # negative test_p
])
def test_splits_with_wrong_p_raise(interactions, split_fn, bad_kwargs):
    """Full bad-proportion matrix of the reference's TestSplitsWithWrongP
    (reference tests/test_cross_validation.py:291-337)."""
    with pytest.raises(ValueError):
        split_fn(interactions, **bad_kwargs, seed=0)
