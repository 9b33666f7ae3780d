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


# ---- edge-case matrix mirroring the reference's scenario fixtures
# (``/root/reference/tests/test_docstring.py:271-560``), re-authored --------

class _Base:
    def __init__(self, alpha=1, beta=2, gamma=3):
        """Base init.

        Parameters
        ----------
        alpha: int
            Alpha docs
            with a continuation line.
        beta: int
        gamma: int
            Gamma docs.
        """


def test_merge_inserts_before_following_section():
    """Missing params land at the END of the Parameters section, BEFORE a
    later section — never appended after ``References``."""
    doc = """Child.

    Parameters
    ----------
    delta: float
        Child's own parameter.

    References
    ----------
    .. [1] Some paper.
    """

    merged = merge_docstrings(_Base, doc, lambda self, alpha=1, delta=0.5: None)
    assert 'alpha: int' in merged
    assert merged.index('delta:') < merged.index('alpha:')
    assert merged.index('alpha:') < merged.index('References')
    # only the accepted base param merged
    assert 'beta' not in merged and 'gamma' not in merged


def test_merge_keeps_star_entries_last():
    doc = """Child.

    Parameters
    ----------
    delta: float
        Child's own parameter.
    **kwargs: keyword arguments
        Forwarded to ``_Base``.
    """

    merged = merge_docstrings(
        _Base, doc, lambda self, alpha=1, delta=0.5, **kwargs: None)
    assert merged.index('delta:') < merged.index('alpha:')
    assert merged.index('alpha:') < merged.index('**kwargs')


def test_merge_kwargs_signature_inherits_all_base_params():
    """A ``**kwargs`` child forwards everything, so every base param's docs
    merge even though none appear in the child's signature."""
    doc = """Child.

    Parameters
    ----------
    delta: float
        Child's own parameter.
    """

    merged = merge_docstrings(_Base, doc, lambda self, delta=0.5, **kw: None)
    for name in ('alpha', 'beta', 'gamma'):
        assert f'{name}: int' in merged
    # base order preserved among the merged entries
    assert merged.index('alpha:') < merged.index('beta:') < merged.index('gamma:')


def test_merge_parameters_section_nothing_after():
    doc = """Child with nothing after Parameters.

    Parameters
    ----------
    delta: float
        Child's own parameter.
    """

    merged = merge_docstrings(_Base, doc, lambda self, alpha=1, delta=0.5: None)
    assert merged.index('delta:') < merged.index('alpha:')
    assert 'continuation line' in merged


def test_merge_extra_signature_param_without_docs_anywhere():
    """Signature params documented on NEITHER side merge nothing and raise
    nothing (reference ``test_..._extra_parameter_included_with_no_documentation``)."""
    doc = """Child.

    Parameters
    ----------
    delta: float
        Child's own parameter.
    """

    merged = merge_docstrings(
        _Base, doc, lambda self, delta=0.5, undocumented=None: None)
    assert merged == doc
    assert 'undocumented' not in merged


def test_merge_multi_level_inheritance_chains():
    """Each level merges its immediate base (the models' pattern); a
    grandchild ends up with all three levels' params."""
    class Mid:
        def __init__(self, alpha=1, beta=2, gamma=3, delta=4):
            pass

    mid_doc = merge_docstrings(
        _Base,
        """Mid.

    Parameters
    ----------
    delta: float
        Mid's parameter.
    """,
        Mid.__init__)
    Mid.__doc__ = mid_doc
    Mid.__init__.__doc__ = mid_doc

    grand_doc = merge_docstrings(
        Mid,
        """Grandchild.

    Parameters
    ----------
    epsilon: float
        Grandchild's parameter.
    """,
        lambda self, alpha=1, delta=4, epsilon=5: None)
    assert 'epsilon: float' in grand_doc
    assert 'delta: float' in grand_doc      # from Mid
    assert 'alpha: int' in grand_doc        # from _Base via Mid
    assert 'beta' not in grand_doc          # not accepted by grandchild


def test_merge_indentation_adapts_to_subclass_section():
    """Blocks re-indent to the target section's parameter indentation."""
    class DeepBase:
        def __init__(self, alpha=1):
            """Init.

                Parameters
                ----------
                alpha: int
                    Deeply indented base docs.
            """

    doc = """Child.

    Parameters
    ----------
    delta: float
        Child's own parameter.
    """
    merged = merge_docstrings(DeepBase, doc, lambda self, alpha=1, delta=1: None)
    lines = [ln for ln in merged.split('\n') if ln.strip().startswith('alpha:')]
    assert lines and (len(lines[0]) - len(lines[0].lstrip())) == 4
