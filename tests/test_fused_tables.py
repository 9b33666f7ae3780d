"""Fused [*, D+1] table layout (scan engine MF hot path) equivalence.

The engine carries MF params as ``user_fused [U, D+1]`` / ``item_fused
[I, D+1]`` (bias = last column) so the backward pass emits one scatter per
table instead of two (``COLLIE_TPU_FUSED_TABLES``; see
``training/scan_engine.py`` and the op-cost calibration in
docs/BENCHMARKS.md).  Scoring math, rng streams, dropout mask shapes, and
the optax update path are unchanged — these tests pin the fused layout to
the named layout's exact trajectory, single-device and under a mesh.
"""
import numpy as np
import pytest

from tests.fixtures.loggers import EpochLossLogger
from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401


def _fit(implicit_train, monkeypatch, fused: bool, mesh=None, cls=None,
         **model_kw):
    from collie_tpu.model import CollieTrainer, MatrixFactorizationModel

    monkeypatch.setenv('COLLIE_TPU_FUSED_TABLES', '1' if fused else '0')
    monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '0')   # force generic branch
    cls = cls or MatrixFactorizationModel
    model = cls(train=implicit_train, embedding_dim=6,
                lr=0.1, loss=model_kw.pop('loss', 'adaptive'),
                seed=11, **model_kw)
    logger = EpochLossLogger()
    CollieTrainer(model, max_epochs=3, verbosity=0, seed=11, mesh=mesh,
                  logger=logger).fit(model)
    return model, logger.epoch_losses


@pytest.mark.parametrize('loss', ['adaptive', 'bpr', 'warp'])
def test_fused_tables_match_named_layout(implicit_train, monkeypatch, loss):
    m0, l0 = _fit(implicit_train, monkeypatch, fused=False, loss=loss)
    m1, l1 = _fit(implicit_train, monkeypatch, fused=True, loss=loss)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for k in m0.params:
        np.testing.assert_allclose(np.asarray(m1.params[k]),
                                   np.asarray(m0.params[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_fused_tables_match_with_dropout(implicit_train, monkeypatch):
    m0, l0 = _fit(implicit_train, monkeypatch, fused=False, dropout_p=0.3)
    m1, l1 = _fit(implicit_train, monkeypatch, fused=True, dropout_p=0.3)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for k in m0.params:
        np.testing.assert_allclose(np.asarray(m1.params[k]),
                                   np.asarray(m0.params[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_fused_tables_match_under_mesh(implicit_train, monkeypatch):
    from collie_tpu.parallel import make_mesh

    mesh = make_mesh(model=2)
    m0, l0 = _fit(implicit_train, monkeypatch, fused=False, mesh=mesh)
    m1, l1 = _fit(implicit_train, monkeypatch, fused=True, mesh=mesh)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for k in m0.params:
        np.testing.assert_allclose(np.asarray(m1.params[k]),
                                   np.asarray(m0.params[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def _zoo_classes():
    from collie_tpu.models.mlp_matrix_factorization import MLPMatrixFactorizationModel
    from collie_tpu.models.nonlinear_matrix_factorization import NonlinearMatrixFactorizationModel
    return {'mlp': MLPMatrixFactorizationModel,
            'nonlinear': NonlinearMatrixFactorizationModel}


@pytest.mark.parametrize('which', ['mlp', 'nonlinear'])
def test_fused_tables_extended_zoo(implicit_train, monkeypatch, which):
    """MLP-MF and Nonlinear-MF declare the same fused spec (their bias
    tables are forward-used); dense tower/MLP weights pass through unfused.
    Trajectories must match the named layout exactly."""
    cls = _zoo_classes()[which]
    m0, l0 = _fit(implicit_train, monkeypatch, fused=False, cls=cls)
    assert m0.supports_fused_tables()
    m1, l1 = _fit(implicit_train, monkeypatch, fused=True, cls=cls)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for k in m0.params:
        np.testing.assert_allclose(np.asarray(m1.params[k]),
                                   np.asarray(m0.params[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_fused_tables_extended_zoo_under_mesh(implicit_train, monkeypatch):
    """MLP-MF fused-vs-named trajectory equality must also hold on a mesh
    (the MLP weights replicate; only the tables fuse and shard)."""
    from collie_tpu.parallel import make_mesh

    cls = _zoo_classes()['mlp']
    mesh = make_mesh(model=2)
    m0, l0 = _fit(implicit_train, monkeypatch, fused=False, cls=cls,
                  mesh=mesh)
    m1, l1 = _fit(implicit_train, monkeypatch, fused=True, cls=cls,
                  mesh=mesh)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for k in m0.params:
        np.testing.assert_allclose(np.asarray(m1.params[k]),
                                   np.asarray(m0.params[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_fused_tables_extended_zoo_dropout(implicit_train, monkeypatch):
    """Dropout rng streams are drawn AFTER the fused gather/slice, so masks
    must be identical between layouts (MLP-MF exercises the per-layer
    fold_in stream)."""
    cls = _zoo_classes()['mlp']
    m0, l0 = _fit(implicit_train, monkeypatch, fused=False, cls=cls,
                  dropout_p=0.3)
    m1, l1 = _fit(implicit_train, monkeypatch, fused=True, cls=cls,
                  dropout_p=0.3)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for k in m0.params:
        np.testing.assert_allclose(np.asarray(m1.params[k]),
                                   np.asarray(m0.params[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_bf16_models_stay_on_named_layout(implicit_train, monkeypatch):
    """bf16 tables + f32 biases cannot concat without changing bias storage;
    the gate must refuse (and the fit must still run on the named layout)."""
    from collie_tpu.model import MatrixFactorizationModel

    monkeypatch.setenv('COLLIE_TPU_FUSED_TABLES', '1')
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=6,
                                     lr=0.1, loss='bpr', seed=11,
                                     embeddings_dtype='bfloat16')
    assert not model.supports_fused_tables()
    from collie_tpu.model import CollieTrainer
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=11).fit(model)


def test_other_models_do_not_fuse(implicit_train):
    """Undeclared subclasses must not take the fused path — their extra
    params may be outside the fused contract."""
    from collie_tpu.model import MatrixFactorizationModel

    class Sub(MatrixFactorizationModel):
        pass

    sub = Sub(train=implicit_train, embedding_dim=4, lr=0.1, loss='bpr',
              seed=0)
    assert not sub.supports_fused_tables()


def test_fused_tables_cold_start_both_stages(implicit_train, monkeypatch):
    """ColdStart (round 5) fuses all THREE (embeddings, biases) pairs and
    its optimizer specs are stage-gated — the fused trajectory must match
    the named layout exactly at BOTH stages, including the bucket->item
    copy-over between them."""
    import numpy as _np

    from collie_tpu.model import CollieTrainer
    from collie_tpu.models.cold_start_matrix_factorization import ColdStartModel

    buckets = _np.arange(implicit_train.num_items) % 7

    def run(fused):
        monkeypatch.setenv('COLLIE_TPU_FUSED_TABLES', '1' if fused else '0')
        monkeypatch.setenv('COLLIE_TPU_FUSED_EPOCH', '0')
        model = ColdStartModel(train=implicit_train, item_buckets=buckets,
                               embedding_dim=6, seed=11, loss='adaptive')
        assert model.supports_fused_tables()
        logger = EpochLossLogger()
        trainer = CollieTrainer(model, max_epochs=2, verbosity=0, seed=11,
                                logger=logger)
        trainer.fit(model)                        # item_buckets stage
        model.advance_stage()                     # bucket -> item copy-over
        trainer.max_epochs += 2
        trainer.fit(model)                        # no_buckets stage
        return model, logger.epoch_losses

    m0, l0 = run(False)
    m1, l1 = run(True)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for k in m0.params:
        np.testing.assert_allclose(np.asarray(m1.params[k]),
                                   np.asarray(m0.params[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_fused_tables_ncf_cf_mlp_pair(implicit_train, monkeypatch):
    """NeuMF (round 5) fuses each side's cf + mlp tables into one
    [*, D + mlp_dim] table via custom fuse/unfuse overrides (the halves
    have different widths, unlike the (embeddings, biases) spec).  Fused
    trajectory must match the named layout exactly, incl. dropout."""
    from collie_tpu.model import NeuralCollaborativeFiltering

    for kwargs in ({}, {'dropout_p': 0.3}):
        m0, l0 = _fit(implicit_train, monkeypatch, fused=False,
                      cls=NeuralCollaborativeFiltering, **dict(kwargs))
        assert m0.supports_fused_tables()
        m1, l1 = _fit(implicit_train, monkeypatch, fused=True,
                      cls=NeuralCollaborativeFiltering, **dict(kwargs))
        np.testing.assert_allclose(l1, l0, rtol=1e-5)
        for k in m0.params:
            np.testing.assert_allclose(np.asarray(m1.params[k]),
                                       np.asarray(m0.params[k]),
                                       rtol=2e-5, atol=2e-6, err_msg=k)
