"""Docstring-machinery tests, the analog of the reference's
``tests/test_docstring.py`` (565 LoC exercising ``merge_docstrings``)."""
import pytest

from collie_tpu.models import (CollaborativeMetricLearningModel, DeepFM,
                               MatrixFactorizationModel, MLPMatrixFactorizationModel,
                               NeuralCollaborativeFiltering,
                               NonlinearMatrixFactorizationModel)
from collie_tpu.utils import _parse_numpydoc_parameters, merge_docstrings


ZOO_CLASSES = [
    MatrixFactorizationModel,
    MLPMatrixFactorizationModel,
    NonlinearMatrixFactorizationModel,
    NeuralCollaborativeFiltering,
    DeepFM,
    CollaborativeMetricLearningModel,
]


@pytest.mark.parametrize('model_cls', ZOO_CLASSES)
def test_zoo_docstrings_inherit_base_parameters(model_cls):
    """Every zoo class merges BasePipeline's common parameter docs for
    parameters it actually accepts (reference pattern: each model calls
    ``merge_docstrings(BasePipeline, __doc__, __init__)``)."""
    doc = model_cls.__doc__
    assert doc is not None
    # common params documented on BasePipeline.__init__ and accepted by all
    for param in ('train', 'val', 'lr', 'loss'):
        assert f'{param}:' in doc, f'{model_cls.__name__} missing {param} docs'


@pytest.mark.parametrize('model_cls', ZOO_CLASSES)
def test_zoo_docstrings_keep_own_parameters(model_cls):
    assert 'embedding_dim' in model_cls.__doc__ or 'user_embedding_dim' in model_cls.__doc__


def test_merge_does_not_add_unaccepted_parameters():
    doc = CollaborativeMetricLearningModel.__doc__
    # CML has no bias terms and no bias optimizer kwarg
    assert 'bias_lr' not in doc


def test_parse_numpydoc_class_level_indent():
    doc = """Title.

    Parameters
    ----------
    alpha: float
        First thing
        continued line
    beta: int
        Second thing

    Returns
    -------
    gamma: str
        Not a parameter
    """
    params = _parse_numpydoc_parameters(doc)
    assert set(params) == {'alpha', 'beta'}
    assert 'continued line' in params['alpha']


def test_parse_numpydoc_method_level_indent():
    def fn():
        """Do.

        Parameters
        ----------
        x: int
            Deeply indented method docstring
        """
    params = _parse_numpydoc_parameters(fn.__doc__)
    assert set(params) == {'x'}


def test_merge_docstrings_no_parameters_section():
    class Base:
        def __init__(self, lr=0.1):
            """No params documented."""

    merged = merge_docstrings(Base, 'Sub doc.', lambda self, lr=0.1: None)
    assert merged == 'Sub doc.'


def test_merge_docstrings_none_subclass_doc():
    class Base:
        def __init__(self, lr=0.1):
            """Init.

            Parameters
            ----------
            lr: float
                Rate
            """

    assert merge_docstrings(Base, None, lambda self: None) is None
