"""Host-utility tests mirroring ``/root/reference/tests/test_utils.py``."""
import numpy as np
import pandas as pd
import pytest

from collie_tpu.utils import (Timer, convert_to_implicit, create_ratings_matrix,
                              df_to_html, df_to_interactions, merge_docstrings,
                              pandas_df_to_hdf5,
                              remove_users_with_fewer_than_n_interactions, trunc_normal)


@pytest.fixture()
def df():
    return pd.DataFrame({
        'user_id': [0, 0, 0, 1, 1, 1, 2, 2],
        'item_id': [0, 1, 2, 1, 2, 3, 0, 2],
        'rating': [1, 2, 3, 4, 5, 4, 3, 2],
    })


def test_create_ratings_matrix_dense(df):
    mat = create_ratings_matrix(df)
    assert mat.shape == (3, 4)
    assert mat[1, 2] == 5
    assert mat[0, 3] == 0


def test_create_ratings_matrix_sparse(df):
    mat = create_ratings_matrix(df, sparse=True)
    assert mat.shape == (3, 4)
    assert mat.tocsr()[1, 2] == 5


def test_create_ratings_matrix_requires_zero_based(df):
    df = df.copy()
    df['user_id'] += 1
    with pytest.raises(ValueError, match='must start at 0'):
        create_ratings_matrix(df)


def test_df_to_interactions(df):
    interactions = df_to_interactions(df, check_num_negative_samples_is_valid=False)
    assert interactions.num_users == 3
    assert interactions.num_items == 4
    no_ratings = df_to_interactions(df, ratings_col=None,
                                    check_num_negative_samples_is_valid=False)
    assert (no_ratings.mat.data == 1).all()


def test_convert_to_implicit(df):
    implicit = convert_to_implicit(df)
    # keeps only ratings >= 4, sets them to 1
    assert len(implicit) == 3
    assert (implicit['rating'] == 1).all()


def test_convert_to_implicit_dedup_keeps_last():
    df = pd.DataFrame({'user_id': [0, 0], 'item_id': [1, 1], 'rating': [5, 4]})
    implicit = convert_to_implicit(df)
    assert len(implicit) == 1


def test_convert_to_implicit_dedup_keeps_max_rating():
    """Duplicate (user, item) pairs keep the highest rating — the reference
    sorts by rating before the keep-last dedup (``utils.py:157-161``), so a
    pair ever rated above threshold survives regardless of row order."""
    df = pd.DataFrame({
        'user_id': [0, 0, 1, 1, 2],
        'item_id': [1, 1, 2, 2, 3],
        # the *earlier* occurrence is the high rating: keep-last-without-sort
        # would wrongly drop pairs (0,1) and (1,2)
        'rating': [5, 2, 4, 1, 3],
    })
    implicit = convert_to_implicit(df, min_rating_to_keep=4)
    pairs = set(zip(implicit['user_id'], implicit['item_id']))
    assert pairs == {(0, 1), (1, 2)}
    assert (implicit['rating'] == 1).all()


def test_remove_users_with_fewer_than_n_interactions(df):
    filtered = remove_users_with_fewer_than_n_interactions(df, min_num_of_interactions=3)
    assert set(filtered['user_id']) == {0, 1}


def test_trunc_normal_statistics():
    sample = trunc_normal((100_000,), std=0.1, seed=0)
    assert abs(sample.mean()) < 0.01
    # fmod(2) wraps the tails toward 0, so std shrinks to ~0.88 * requested
    assert 0.08 < sample.std() < 0.095
    assert np.abs(sample).max() <= 0.2 + 1e-6  # fmod(2) bounds at 2 sigma


def test_pandas_df_to_hdf5_append(tmp_path, df):
    path = tmp_path / 'data.h5'
    pandas_df_to_hdf5(df, path)
    pandas_df_to_hdf5(df, path)  # append doubles the rows
    import h5py
    with h5py.File(path, 'r') as f:
        assert f['interactions']['user_id'].shape[0] == 2 * len(df)


def test_df_to_html_images_and_tags():
    df = pd.DataFrame({'poster': ['a.jpg'], 'title': ['Movie']})
    html = df_to_html(df, image_cols=['poster'], html_tags={'title': 'strong'},
                      image_width=300)
    assert '<img src="a.jpg" width=300>' in html
    assert '<strong>Movie</strong>' in html


def test_df_to_html_image_cols_ignore_other_transforms():
    # Reference: "Columns specified as images will make all other
    # transformations to those columns be ignored" (utils.py:366-381).
    df = pd.DataFrame({'poster': ['a.jpg'], 'url': ['http://x'], 'title': ['M']})
    html = df_to_html(df, image_cols=['poster'],
                      hyperlink_cols=['poster', 'url'],
                      html_tags={'poster': 'em', 'title': 'strong'})
    assert '<img src="a.jpg">' in html
    assert '<a' not in html.split('<img src="a.jpg">')[0].split('poster')[-1]
    # image column untouched by hyperlink/tag transforms
    assert '<a target="_blank" href="<img' not in html
    assert '<em><img' not in html
    # non-image hyperlink column gets a new-tab anchor
    assert '<a target="_blank" href="http://x">http://x</a>' in html
    assert '<strong>M</strong>' in html


def test_df_to_html_missing_column_raises():
    df = pd.DataFrame({'a': [1]})
    with pytest.raises(ValueError):
        df_to_html(df, image_cols=['nope'])
    with pytest.raises(ValueError):
        df_to_html(df, hyperlink_cols=['nope'])
    with pytest.raises(ValueError):
        df_to_html(df, html_tags={'nope': 'strong'})


def test_df_to_html_scalar_col_names_and_tag_order():
    # scalar (non-list) column names are accepted, incl. integer columns
    df = pd.DataFrame({0: ['x.png'], 'title': ['M']})
    html = df_to_html(df, image_cols=0, html_tags={'title': ['em', 'strong']})
    assert '<img src="x.png">' in html
    # nested tags wrap outermost-first, reference order
    assert '<em><strong>M</strong></em>' in html


def test_timer_reports_minutes(capsys):
    t = Timer()
    delta = t.timecheck('step done')
    assert delta >= 0
    total = t.time_since_start()
    assert total >= 0
    out = capsys.readouterr().out
    assert 'step done' in out


def test_merge_docstrings_inherits_params():
    class Base:
        def __init__(self, lr=0.1):
            """Init.

            Parameters
            ----------
            lr: float
                Learning rate
            extra: int
                Not in subclass signature
            """

    def sub_init(self, lr=0.2):
        pass

    doc = """Subclass doc.

    Parameters
    ----------
    other: str
        Something
    """
    merged = merge_docstrings(Base, doc, sub_init)
    assert 'lr: float' in merged
    assert 'extra' not in merged  # not accepted by subclass signature


def test_hdf5_interactions_roundtrip(tmp_path, df):
    from collie_tpu.data import HDF5Interactions, HDF5InteractionsDataLoader, write_hdf5_meta

    path = str(tmp_path / 'inter.h5')
    pandas_df_to_hdf5(df, path)
    write_hdf5_meta(path, num_users=3, num_items=4)

    inter = HDF5Interactions(hdf5_path=path, num_negative_samples=2)
    assert inter.num_users == 3
    assert inter.num_items == 4
    assert len(inter) == 8

    (users, items), negs = inter[(0, 5)]
    assert len(users) == 5
    assert negs.shape == (5, 2)

    loader = HDF5InteractionsDataLoader(interactions=inter, batch_size=3, shuffle=True)
    batches = list(loader)
    assert len(batches) == 3
    assert sum(int(b['mask'].sum()) for b in batches) == 8
    with pytest.raises(AttributeError, match='out-of-core'):
        _ = loader.mat


def test_hdf5_infer_dims_without_meta(tmp_path, df):
    from collie_tpu.data import HDF5Interactions

    path = str(tmp_path / 'inter2.h5')
    pandas_df_to_hdf5(df, path)
    inter = HDF5Interactions(hdf5_path=path)
    assert inter.num_users == 3
    assert inter.num_items == 4


def test_hdf5_training_end_to_end(tmp_path):
    """An HDF5-backed loader drives a full training run (analog of the
    reference's HDF5 model-matrix entries)."""
    from collie_tpu.data import HDF5InteractionsDataLoader, write_hdf5_meta
    from collie_tpu.data.synthetic import generate_interactions_df
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.training.trainer import CollieTrainer

    df = generate_interactions_df(num_users=100, num_items=200, num_interactions=3000,
                                  seed=3)
    path = str(tmp_path / 'train.h5')
    pandas_df_to_hdf5(df, path)
    write_hdf5_meta(path, num_users=100, num_items=200)

    loader = HDF5InteractionsDataLoader(hdf5_path=path, batch_size=512, shuffle=True,
                                        num_negative_samples=5)
    model = MatrixFactorizationModel(train=loader, embedding_dim=8, loss='adaptive',
                                     seed=0)
    trainer = CollieTrainer(model, max_epochs=2, verbosity=0, seed=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 2


def test_epoch_timer_logger():
    from collie_tpu.training.profiler import EpochTimer

    timer = EpochTimer()
    timer.log_metrics({'train_loss_epoch': 1.5}, step=1)
    timer.log_metrics({'val_loss_epoch': 1.2}, step=1)
    timer.log_metrics({'train_loss_epoch': 1.0}, step=2)
    summary = timer.summary()
    assert summary['epochs'] == 2
    assert summary['final_train_loss'] == 1.0
    assert summary['final_val_loss'] == 1.2


def test_trace_context_produces_artifacts(tmp_path):
    import jax.numpy as jnp
    from collie_tpu.training.profiler import annotate, trace

    with trace(str(tmp_path)):
        with annotate('toy-matmul'):
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    # jax writes a plugins/profile/<ts>/ tree under the logdir
    produced = list(tmp_path.rglob('*'))
    assert produced, 'trace produced no artifacts'


def test_get_init_arguments_exclude():
    """Reference API: ``exclude`` drops captured args; missing names are
    ignored (reference tests test_get_init_arguments_exclude*)."""
    from collie_tpu.utils import get_init_arguments

    class Foo:
        def __init__(self, a, b=2, c=3, **kwargs):
            self.init_args = get_init_arguments(exclude=['b', 'nonexistent'])

    f = Foo(1, b=5, c=7, extra='x')
    assert f.init_args == {'a': 1, 'c': 7, 'extra': 'x'}


def test_hdf5_head_tail(tmp_path, df):
    """``head``/``tail`` return DataFrame chunks with the reference's
    negative-/over-sized-``n`` clamping (``datasets.py:716-733``)."""
    from collie_tpu.data import HDF5Interactions

    path = str(tmp_path / 'ht.h5')
    pandas_df_to_hdf5(df, path)
    inter = HDF5Interactions(hdf5_path=path)

    head = inter.head(3)
    assert list(head['user_id']) == [0, 0, 0]
    assert list(head['item_id']) == [0, 1, 2]
    # source column order and original row offsets, like the reference's
    # ``store.select`` output
    assert list(head.columns) == ['user_id', 'item_id', 'rating']
    assert list(head.index) == [0, 1, 2]

    tail = inter.tail(2)
    assert list(tail['user_id']) == [2, 2]
    assert list(tail['item_id']) == [0, 2]
    assert list(tail.index) == [6, 7]

    # negative n counts from the other end; oversized n clamps
    assert len(inter.head(-6)) == 2
    assert len(inter.tail(100)) == 8
    assert len(inter.head(0)) == 0


def test_explicit_interactions_num_negative_samples_raises():
    """Explicit datasets have no negative sampling; accessing the attribute
    raises the reference's AttributeError (``datasets.py:539-542``)."""
    from collie_tpu.data import ExplicitInteractions

    inter = ExplicitInteractions(users=[0, 1, 2], items=[0, 1, 2],
                                 ratings=[1.0, 2.0, 3.0])
    with pytest.raises(AttributeError, match='does not exist for explicit'):
        _ = inter.num_negative_samples


def test_hdf5_empty_store_infer_raises(tmp_path):
    """Inferring dims from an empty store is a clear error, not a confusing
    zero-index validation failure."""
    import h5py

    from collie_tpu.data import HDF5Interactions

    path = str(tmp_path / 'empty.h5')
    with h5py.File(path, 'w') as f:
        grp = f.create_group('interactions')
        grp.create_dataset('user_id', data=np.array([], dtype=np.int64),
                           maxshape=(None,), chunks=True)
        grp.create_dataset('item_id', data=np.array([], dtype=np.int64),
                           maxshape=(None,), chunks=True)
    with pytest.raises(ValueError, match='empty HDF5 store'):
        HDF5Interactions(hdf5_path=path)


def test_hdf5_head_includes_columns_added_by_append(tmp_path, df):
    """An append that introduces a new column extends column_order; the
    head/tail views must never silently drop a dataset."""
    from collie_tpu.data import HDF5Interactions

    path = str(tmp_path / 'grow.h5')
    pandas_df_to_hdf5(df[['user_id', 'item_id']], path)
    pandas_df_to_hdf5(df[['user_id', 'item_id', 'rating']], path)
    inter = HDF5Interactions(hdf5_path=path, num_users=3, num_items=4)
    head = inter.head(2)
    assert list(head.columns) == ['user_id', 'item_id', 'rating']
