"""MovieLens module tests mirroring ``/root/reference/tests/test_movielens.py``,
run against the synthetic offline stand-in (the real dataset requires
network; the loaders fall back when ``synthetic_fallback=True``)."""
from unittest import mock

import numpy as np
import pandas as pd
import pytest

from collie_tpu.movielens import (get_movielens_metadata, get_user_metadata,
                                  read_movielens_df, read_movielens_df_item,
                                  read_movielens_df_user)
from collie_tpu.movielens.get_data import GENRE_COLUMNS
from collie_tpu.movielens.visualize import get_recommendation_visualizations


@pytest.fixture(scope='module')
def df():
    return read_movielens_df(decrement_ids=True, synthetic_fallback=True)


@pytest.fixture(scope='module')
def df_item():
    return read_movielens_df_item(synthetic_fallback=True)


@pytest.fixture(scope='module')
def df_user():
    return read_movielens_df_user(synthetic_fallback=True)


def test_read_movielens_df_shape(df):
    assert set(df.columns) == {'user_id', 'item_id', 'rating', 'timestamp'}
    assert df['user_id'].min() == 0
    assert df['item_id'].min() == 0
    assert df['rating'].between(1, 5).all()


def test_read_movielens_df_no_decrement():
    df = read_movielens_df(decrement_ids=False, synthetic_fallback=True)
    assert df['user_id'].min() == 1
    assert df['item_id'].min() == 1


def test_read_movielens_df_item(df_item):
    assert 'movie_title' in df_item.columns
    for genre in GENRE_COLUMNS:
        assert genre in df_item.columns
    assert 'video_release_date' not in df_item.columns


def test_get_movielens_metadata_columns(df_item):
    metadata = get_movielens_metadata(df_item)
    assert metadata.shape[0] == len(df_item)
    genre_cols = [c for c in metadata.columns if c.startswith('genre_')]
    decade_cols = [c for c in metadata.columns if c.startswith('decade_')]
    assert len(genre_cols) == 19
    assert genre_cols[-1] == 'genre_unknown'  # unknown moved to end of genre block
    assert len(decade_cols) >= 1
    # all values binary
    assert metadata.isin([0, 1]).all().all()


def test_get_user_metadata_columns(df_user):
    metadata = get_user_metadata(df_user)
    assert 'age' in metadata.columns
    assert 'gender' in metadata.columns
    assert metadata['gender'].isin([0, 1]).all()
    occupation_cols = [c for c in metadata.columns if c.startswith('occupation_')]
    assert len(occupation_cols) >= 1
    assert list(metadata.columns[:2]) == ['age', 'gender']


def test_offline_without_fallback_raises(tmp_path, monkeypatch):
    import collie_tpu.movielens.get_data as get_data_module

    monkeypatch.setattr(get_data_module, 'DATA_PATH', tmp_path / 'nowhere')
    monkeypatch.setattr(get_data_module, '_download_movielens_100k',
                        mock.Mock(side_effect=OSError('no network')))
    with pytest.raises(RuntimeError, match='synthetic'):
        read_movielens_df(synthetic_fallback=False)


def test_run_movielens_example_end_to_end(tmp_path, monkeypatch):
    """End-to-end CLI test with save mocked, mirroring the reference's
    ``test_run_movielens_example`` (``tests/test_movielens.py:120``)."""
    import collie_tpu.movielens.run as run_module

    monkeypatch.setattr(run_module, 'DATA_PATH', tmp_path)
    with mock.patch.object(run_module.MatrixFactorizationModel, 'save_model') as save_mock:
        run_module.run_movielens_example(epochs=1, synthetic_fallback=True)
        save_mock.assert_called_once()


def test_get_recommendation_visualizations(df, df_item):
    from collie_tpu.data import Interactions
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.utils import convert_to_implicit

    df_imp = convert_to_implicit(df)
    interactions = Interactions(users=df_imp['user_id'], items=df_imp['item_id'],
                                allow_missing_ids=True,
                                check_num_negative_samples_is_valid=False)
    model = MatrixFactorizationModel(train=interactions, embedding_dim=4, seed=0)

    df_user_raw = df.copy()
    df_user_raw['user_id'] += 1
    df_user_raw['item_id'] += 1
    posters = pd.DataFrame({'item_id': np.arange(1, 11),
                            'url': [f'http://example.com/{i}.jpg' for i in range(10)]})

    html = get_recommendation_visualizations(
        model, user_id=1, df_user=df_user_raw, df_item=df_item,
        movielens_posters_df=posters, detailed=True)
    assert '<h3>User 1:</h3>' in html
    assert 'Recommended films:' in html
    assert 'has rated' in html


def test_visualize_requires_one_based_ids(df, df_item):
    from collie_tpu.data import Interactions
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.utils import convert_to_implicit

    df_imp = convert_to_implicit(df)
    interactions = Interactions(users=df_imp['user_id'], items=df_imp['item_id'],
                                allow_missing_ids=True,
                                check_num_negative_samples_is_valid=False)
    model = MatrixFactorizationModel(train=interactions, embedding_dim=4, seed=0)
    posters = pd.DataFrame({'item_id': [1], 'url': ['x']})
    with pytest.raises(ValueError, match='start at ``1``'):
        get_recommendation_visualizations(
            model, user_id=1, df_user=df, df_item=df_item,
            movielens_posters_df=posters)
