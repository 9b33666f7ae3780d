"""Shared small synthetic datasets and trained-model fixtures, mirroring the
reference's fixture strategy (``/root/reference/tests/fixtures/model_fixtures.py``)
with synthetic data in place of the downloaded MovieLens 100K."""
import numpy as np
import pytest

from collie_tpu.data import ExplicitInteractions, Interactions, stratified_split
from collie_tpu.data.synthetic import generate_implicit_interactions, generate_interactions_df
from collie_tpu.utils import convert_to_implicit


@pytest.fixture(scope='session')
def implicit_sets():
    inter = generate_implicit_interactions(num_users=250, num_items=500,
                                           num_interactions=20_000, seed=1)
    train, test = stratified_split(inter, test_p=0.2, seed=1, force_split=True)
    return train, test


@pytest.fixture(scope='session')
def implicit_train(implicit_sets):
    return implicit_sets[0]


@pytest.fixture(scope='session')
def implicit_test(implicit_sets):
    return implicit_sets[1]


@pytest.fixture(scope='session')
def explicit_sets():
    df = generate_interactions_df(num_users=250, num_items=500,
                                  num_interactions=20_000, seed=1)
    inter = ExplicitInteractions(users=df['user_id'].values,
                                 items=df['item_id'].values,
                                 ratings=df['rating'].values,
                                 allow_missing_ids=True,
                                 num_users=250, num_items=500)
    train, test = stratified_split(inter, test_p=0.2, seed=1, force_split=True)
    return train, test


@pytest.fixture(scope='session')
def trained_mf_model(implicit_train):
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.training.trainer import CollieTrainer

    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=10,
                                     lr=1e-1, loss='adaptive', seed=0)
    trainer = CollieTrainer(model, max_epochs=10, verbosity=0, seed=0)
    trainer.fit(model)
    return model
