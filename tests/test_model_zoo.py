"""Model-zoo matrix: every architecture trains one epoch, predicts, computes
similarities, and round-trips save/load — the analog of the reference's
31-way parametrized model matrix (``/root/reference/tests/fixtures/model_fixtures.py:120-509``,
``tests/test_model.py:1679-1754``)."""
import numpy as np
import pytest

from collie_tpu.evaluate import evaluate_in_batches
from collie_tpu.models import (CollaborativeMetricLearningModel, DeepFM,
                               MatrixFactorizationModel, MLPMatrixFactorizationModel,
                               NeuralCollaborativeFiltering,
                               NonlinearMatrixFactorizationModel)
from collie_tpu.ops import auc
from collie_tpu.training.trainer import CollieTrainer

from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401

ZOO = [
    pytest.param(MatrixFactorizationModel, {}, id='mf'),
    pytest.param(MatrixFactorizationModel, {'dropout_p': 0.2}, id='mf_dropout'),
    pytest.param(MatrixFactorizationModel, {'y_range': (0, 4)}, id='mf_y_range'),
    pytest.param(MatrixFactorizationModel, {'sparse': True, 'optimizer': 'sparse_adam'},
                 id='mf_sparse_adam'),
    pytest.param(MatrixFactorizationModel, {'bias_optimizer': None}, id='mf_single_opt'),
    pytest.param(MatrixFactorizationModel, {'optimizer': 'adagrad'}, id='mf_adagrad'),
    pytest.param(MatrixFactorizationModel, {'loss': 'bpr'}, id='mf_bpr'),
    pytest.param(MatrixFactorizationModel, {'loss': 'warp'}, id='mf_warp'),
    pytest.param(MLPMatrixFactorizationModel, {}, id='mlp_mf'),
    pytest.param(MLPMatrixFactorizationModel, {'num_layers': 2, 'dropout_p': 0.1},
                 id='mlp_mf_2layer'),
    pytest.param(NonlinearMatrixFactorizationModel, {}, id='nonlinear_mf'),
    pytest.param(NonlinearMatrixFactorizationModel,
                 {'user_dense_layers_dims': [16], 'item_dense_layers_dims': [16],
                  'embedding_dropout_p': 0.1, 'dense_dropout_p': 0.1},
                 id='nonlinear_mf_dropout'),
    pytest.param(NeuralCollaborativeFiltering, {}, id='ncf'),
    pytest.param(NeuralCollaborativeFiltering, {'final_layer': 'sigmoid'},
                 id='ncf_sigmoid'),
    pytest.param(NeuralCollaborativeFiltering, {'final_layer': 'relu'}, id='ncf_relu'),
    pytest.param(NeuralCollaborativeFiltering, {'final_layer': 'leaky_relu'},
                 id='ncf_leaky'),
    pytest.param(DeepFM, {}, id='deep_fm'),
    pytest.param(DeepFM, {'final_layer': 'sigmoid'}, id='deep_fm_sigmoid'),
    pytest.param(CollaborativeMetricLearningModel, {}, id='cml'),
]


@pytest.mark.parametrize('model_cls,model_kwargs', ZOO)
def test_zoo_model_trains_and_predicts(model_cls, model_kwargs, implicit_train, tmp_path):
    model = model_cls(train=implicit_train, lr=1e-2, seed=0, **model_kwargs)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=0, seed=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 1

    preds = model.get_item_predictions(user_id=0, unseen_items_only=True)
    assert len(preds) > 0
    assert np.isfinite(preds.values).all()

    item_sims = model.item_item_similarity(item_id=3)
    assert len(item_sims) == implicit_train.num_items
    user_sims = model.user_user_similarity(user_id=3)
    assert len(user_sims) == implicit_train.num_users

    # save / load round-trip preserves scores
    path = tmp_path / 'model.npz'
    model.save_model(path)
    loaded = model_cls(load_model_path=path)
    users, items = np.array([0, 1, 2]), np.array([5, 6, 7])
    np.testing.assert_allclose(model(users, items), loaded(users, items), rtol=1e-5,
                               atol=1e-6)


def test_ncf_invalid_final_layer_raises(implicit_train):
    model = NeuralCollaborativeFiltering(train=implicit_train, final_layer='nonsense',
                                         seed=0)
    with pytest.raises(ValueError, match='not valid final layer'):
        model(np.array([0]), np.array([0]))


def test_ncf_callable_final_layer(implicit_train):
    import jax.numpy as jnp

    model = NeuralCollaborativeFiltering(train=implicit_train,
                                         final_layer=lambda x: jnp.tanh(x), seed=0)
    scores = model(np.arange(5), np.arange(5))
    assert (np.abs(scores) <= 1).all()


def test_cml_scores_are_distances(implicit_train):
    model = CollaborativeMetricLearningModel(train=implicit_train, seed=0)
    scores = model(np.arange(10), np.arange(10))
    assert (scores >= 0).all()


def test_nonlinear_mf_similarity_uses_post_tower_embeddings(implicit_train):
    model = NonlinearMatrixFactorizationModel(train=implicit_train, seed=0)
    emb = model._get_item_embeddings()
    assert emb.shape == (implicit_train.num_items,
                         model.hparams['item_dense_layers_dims'][-1])


def test_zoo_models_learn(implicit_sets):
    """A few epochs of each main architecture must beat chance AUC."""
    train, test = implicit_sets
    for model_cls, kwargs, lr in [
        (MLPMatrixFactorizationModel, {}, 1e-2),
        (NeuralCollaborativeFiltering, {}, 1e-2),
        (DeepFM, {}, 1e-2),
    ]:
        model = model_cls(train=train, lr=lr, loss='adaptive', seed=0, **kwargs)
        trainer = CollieTrainer(model, max_epochs=5, verbosity=0, seed=0)
        trainer.fit(model)
        auc_score = evaluate_in_batches([auc], test, model, verbose=False)
        assert auc_score > 0.54, f'{model_cls.__name__} AUC {auc_score}'
