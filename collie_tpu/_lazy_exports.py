"""Lazy attribute resolution for the flat ``collie_tpu`` namespace."""
import importlib

# name -> module path providing it
EXPORTS = {
    # evaluation drivers + host metric wrappers
    'auc': 'collie_tpu.ops.metrics',
    'mapk': 'collie_tpu.ops.metrics',
    'mrr': 'collie_tpu.ops.metrics',
    'get_preds': 'collie_tpu.evaluate',
    'evaluate_in_batches': 'collie_tpu.evaluate',
    'explicit_evaluate_in_batches': 'collie_tpu.evaluate',
    # pipeline core + trainers
    'BasePipeline': 'collie_tpu.models.base',
    'MultiStagePipeline': 'collie_tpu.models.multi_stage',
    'CollieTrainer': 'collie_tpu.training.trainer',
    'CollieMinimalTrainer': 'collie_tpu.training.trainer',
    # model zoo
    'MatrixFactorizationModel': 'collie_tpu.models.matrix_factorization',
    'MLPMatrixFactorizationModel': 'collie_tpu.models.mlp_matrix_factorization',
    'NonlinearMatrixFactorizationModel': 'collie_tpu.models.nonlinear_matrix_factorization',
    'NeuralCollaborativeFiltering': 'collie_tpu.models.neural_collaborative_filtering',
    'DeepFM': 'collie_tpu.models.deep_fm',
    'CollaborativeMetricLearningModel': 'collie_tpu.models.collaborative_metric_learning',
    'HybridModel': 'collie_tpu.models.hybrid_matrix_factorization',
    'HybridPretrainedModel': 'collie_tpu.models.hybrid_pretrained_matrix_factorization',
    'ColdStartModel': 'collie_tpu.models.cold_start_matrix_factorization',
    # serving / retrieval (TPU-native addition)
    'recommend': 'collie_tpu.retrieval',
    'build_retrieval_fn': 'collie_tpu.retrieval',
    # mesh / sharding
    'make_mesh': 'collie_tpu.parallel.mesh',
}


def resolve(name: str):
    module = importlib.import_module(EXPORTS[name])
    return getattr(module, name)
