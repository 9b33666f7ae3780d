"""Import-surface parity with the reference package layout.

The reference re-exports everything flat from ``collie`` and under the
submodules ``collie.model`` / ``collie.interactions`` / ``collie.loss`` /
``collie.metrics`` / ``collie.cross_validation`` / ``collie.movielens``
(reference ``collie/__init__.py:1-10``).  A reference user must be able to
port by renaming the package.
"""
import importlib

import pytest

FLAT_EXPORTS = [
    # config / utils
    'DATA_PATH', 'Timer', 'convert_to_implicit', 'create_ratings_matrix',
    'df_to_html', 'df_to_interactions', 'get_init_arguments', 'get_random_seed',
    'merge_docstrings', 'pandas_df_to_hdf5',
    'remove_users_with_fewer_than_n_interactions', 'trunc_normal',
    # data
    'ApproximateNegativeSamplingInteractionsDataLoader', 'BaseInteractions',
    'ExplicitInteractions', 'HDF5Interactions', 'HDF5InteractionsDataLoader',
    'Interactions', 'InteractionsDataLoader', 'random_split', 'stratified_split',
    # losses
    'adaptive_bpr_loss', 'adaptive_hinge_loss', 'bpr_loss', 'hinge_loss',
    'ideal_difference_from_metadata', 'warp_loss',
    # metrics / evaluation
    'auc', 'mapk', 'mrr', 'evaluate_in_batches', 'explicit_evaluate_in_batches',
    'get_preds',
    # pipeline / trainers
    'BasePipeline', 'MultiStagePipeline', 'CollieTrainer', 'CollieMinimalTrainer',
    # model zoo
    'MatrixFactorizationModel', 'MLPMatrixFactorizationModel',
    'NonlinearMatrixFactorizationModel', 'NeuralCollaborativeFiltering', 'DeepFM',
    'CollaborativeMetricLearningModel', 'HybridModel', 'HybridPretrainedModel',
    'ColdStartModel',
    # TPU-native additions
    'recommend', 'make_mesh',
]


@pytest.mark.parametrize('name', FLAT_EXPORTS)
def test_flat_export(name):
    import collie_tpu

    assert getattr(collie_tpu, name) is not None


SUBMODULE_EXPORTS = {
    'collie_tpu.model': ['MatrixFactorizationModel', 'CollieTrainer',
                         'CollieMinimalTrainer', 'BasePipeline', 'MultiStagePipeline',
                         'ColdStartModel', 'HybridModel', 'HybridPretrainedModel',
                         'NeuralCollaborativeFiltering', 'DeepFM',
                         'CollaborativeMetricLearningModel',
                         'MLPMatrixFactorizationModel',
                         'NonlinearMatrixFactorizationModel'],
    'collie_tpu.interactions': ['Interactions', 'ExplicitInteractions',
                                'HDF5Interactions', 'InteractionsDataLoader',
                                'ApproximateNegativeSamplingInteractionsDataLoader',
                                'HDF5InteractionsDataLoader'],
    'collie_tpu.loss': ['bpr_loss', 'adaptive_bpr_loss', 'hinge_loss',
                        'adaptive_hinge_loss', 'warp_loss',
                        'ideal_difference_from_metadata'],
    'collie_tpu.metrics': ['auc', 'mapk', 'mrr', 'evaluate_in_batches',
                           'explicit_evaluate_in_batches', 'get_preds'],
    'collie_tpu.cross_validation': ['random_split', 'stratified_split'],
    'collie_tpu.movielens': ['read_movielens_df', 'read_movielens_df_item',
                             'read_movielens_df_user', 'get_movielens_metadata',
                             'get_user_metadata', 'run_movielens_example',
                             'get_recommendation_visualizations'],
}


@pytest.mark.parametrize('module,names', SUBMODULE_EXPORTS.items())
def test_submodule_exports(module, names):
    mod = importlib.import_module(module)
    for name in names:
        assert getattr(mod, name) is not None, f'{module}.{name} missing'


def test_reference_quickstart_shape():
    """The reference README quickstart (``README.md:60-67``) ported verbatim
    modulo package name must run."""
    import numpy as np
    from collie_tpu.cross_validation import stratified_split
    from collie_tpu.interactions import Interactions
    from collie_tpu.metrics import auc, evaluate_in_batches, mapk, mrr
    from collie_tpu.model import CollieTrainer, MatrixFactorizationModel

    rng = np.random.default_rng(0)
    users = np.concatenate([np.arange(100), rng.integers(0, 100, 3000)])
    items = np.concatenate([rng.integers(0, 200, 100), np.arange(200),
                            rng.integers(0, 200, 2800)])
    keys = users * 200 + items
    _, keep = np.unique(keys, return_index=True)
    interactions = Interactions(users=users[keep], items=items[keep],
                                check_num_negative_samples_is_valid=False, seed=0)
    train, test = stratified_split(interactions, test_p=0.2, seed=0,
                                   force_split=True)
    model = MatrixFactorizationModel(train=train, embedding_dim=10, lr=1e-1,
                                     loss='adaptive', seed=0)
    trainer = CollieTrainer(model, max_epochs=2, verbosity=0)
    trainer.fit(model)
    scores = evaluate_in_batches([mapk, mrr, auc], test, model, verbose=False)
    assert len(scores) == 3
