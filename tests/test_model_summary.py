"""Model summary + hyperparameter logging at fit start.

Reference: ``CollieMinimalTrainer._pre_training_setup`` prints a Lightning
``ModelSummary`` when ``verbosity != 0`` and pushes ``model.hparams`` to the
logger (``/root/reference/collie/model/base/trainer.py:404-421``).
"""
import numpy as np
import pytest

from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
from collie_tpu.training.trainer import CollieTrainer

from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401


@pytest.fixture()
def small_model(implicit_train):
    return MatrixFactorizationModel(train=implicit_train, embedding_dim=10,
                                    lr=1e-1, loss='adaptive', seed=0)


def test_summary_printed_at_fit_start(small_model, capsys):
    trainer = CollieTrainer(small_model, max_epochs=1, verbosity=1, seed=0)
    trainer.fit(small_model)
    out = capsys.readouterr().out
    for name in small_model.params:
        assert name in out
    total = sum(int(np.prod(v.shape)) for v in small_model.params.values())
    assert f'{total:,} total' in out
    assert 'trainable params' in out


def test_summary_suppressed(small_model, capsys):
    trainer = CollieTrainer(small_model, max_epochs=1, verbosity=1,
                            enable_model_summary=False, seed=0)
    trainer.fit(small_model)
    out = capsys.readouterr().out
    assert 'trainable params' not in out

    trainer = CollieTrainer(small_model, max_epochs=1, verbosity=0, seed=0)
    trainer.fit(small_model)
    assert 'trainable params' not in capsys.readouterr().out


def test_hparams_logged_at_fit_start(small_model):
    class Logger:
        def __init__(self):
            self.hparams = None
            self.saved = 0
            self.metrics = []

        def log_hyperparams(self, hparams):
            self.hparams = hparams

        def save(self):
            self.saved += 1

        def log_metrics(self, metrics, step):
            self.metrics.append((step, metrics))

    logger = Logger()
    trainer = CollieTrainer(small_model, max_epochs=1, verbosity=0,
                            logger=logger, seed=0)
    trainer.fit(small_model)
    assert logger.hparams is not None
    assert logger.hparams['embedding_dim'] == 10
    assert logger.saved == 1
    assert logger.metrics  # epoch losses still logged


def test_metrics_only_logger_is_fine(small_model):
    """A logger without ``log_hyperparams`` (the protocol documented for
    ``log_metrics``) must not break fit."""
    class Minimal:
        def __init__(self):
            self.metrics = []

        def log_metrics(self, metrics, step):
            self.metrics.append((step, metrics))

    logger = Minimal()
    trainer = CollieTrainer(small_model, max_epochs=1, verbosity=0,
                            logger=logger, seed=0)
    trainer.fit(small_model)
    assert logger.metrics


def test_multi_stage_summary_marks_frozen_params(implicit_train, capsys):
    """In a stage where only some optimizer specs are active, the summary
    marks the others' params frozen."""
    from collie_tpu.models.cold_start_matrix_factorization import ColdStartModel

    buckets = np.arange(implicit_train.num_items) % 3
    model = ColdStartModel(train=implicit_train, item_buckets=buckets,
                           embedding_dim=8, lr=1e-1, seed=0)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=1, seed=0)
    trainer.fit(model)
    out = capsys.readouterr().out
    assert 'frozen' in out
    assert 'stage: item_buckets' in out
