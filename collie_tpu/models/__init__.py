"""Model zoo: functional pipelines over flat param pytrees."""
from collie_tpu.models.base import BasePipeline, INTERACTIONS_LIKE_INPUT
from collie_tpu.models.matrix_factorization import MatrixFactorizationModel

__all__ = ['BasePipeline', 'INTERACTIONS_LIKE_INPUT', 'MatrixFactorizationModel']


def __getattr__(name):
    """Lazy zoo imports keep ``import collie_tpu.models`` light."""
    _zoo = {
        'MLPMatrixFactorizationModel': 'collie_tpu.models.mlp_matrix_factorization',
        'NonlinearMatrixFactorizationModel': 'collie_tpu.models.nonlinear_matrix_factorization',
        'NeuralCollaborativeFiltering': 'collie_tpu.models.neural_collaborative_filtering',
        'DeepFM': 'collie_tpu.models.deep_fm',
        'CollaborativeMetricLearningModel': 'collie_tpu.models.collaborative_metric_learning',
        'HybridModel': 'collie_tpu.models.hybrid_matrix_factorization',
        'HybridPretrainedModel': 'collie_tpu.models.hybrid_pretrained_matrix_factorization',
        'ColdStartModel': 'collie_tpu.models.cold_start_matrix_factorization',
        'MultiStagePipeline': 'collie_tpu.models.multi_stage',
    }
    if name in _zoo:
        import importlib
        return getattr(importlib.import_module(_zoo[name]), name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
