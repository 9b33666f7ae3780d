"""Full-training-state checkpoint/resume (beyond-reference capability: the
reference never saves optimizer state, ``base_pipeline.py:120-123``)."""
import numpy as np
import pytest

from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
from collie_tpu.training.trainer import CollieTrainer

from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401


def test_checkpoint_files_written(tmp_path, implicit_train):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4, seed=0)
    trainer = CollieTrainer(model, max_epochs=3, verbosity=0, seed=0,
                            checkpoint_dir=str(tmp_path),
                            checkpoint_every_n_epochs=2)
    trainer.fit(model)
    files = sorted(p.name for p in tmp_path.glob('checkpoint_epoch_*.pkl'))
    assert files == ['checkpoint_epoch_2.pkl']


def test_resume_reproduces_uninterrupted_run(tmp_path, implicit_train):
    """Training 2 epochs, checkpointing, then resuming for 2 more must equal
    an uninterrupted 4-epoch run exactly (params AND optimizer moments)."""
    def make():
        return MatrixFactorizationModel(train=implicit_train, embedding_dim=4,
                                        lr=1e-2, loss='adaptive', seed=0)

    # uninterrupted 4 epochs
    model_a = make()
    trainer_a = CollieTrainer(model_a, max_epochs=4, verbosity=0, seed=0)
    trainer_a.fit(model_a)

    # 2 epochs + checkpoint, new process-sim: fresh model/trainer + resume
    model_b = make()
    trainer_b = CollieTrainer(model_b, max_epochs=2, verbosity=0, seed=0,
                              checkpoint_dir=str(tmp_path),
                              checkpoint_every_n_epochs=2)
    trainer_b.fit(model_b)

    model_c = make()
    trainer_c = CollieTrainer(model_c, max_epochs=4, verbosity=0, seed=0)
    resumed_epoch = trainer_c.resume_from_checkpoint(
        tmp_path / 'checkpoint_epoch_2.pkl')
    assert resumed_epoch == 2
    trainer_c.fit(model_c)
    assert model_c.hparams['num_epochs_completed'] == 4

    for key in model_a.params:
        np.testing.assert_allclose(np.asarray(model_a.params[key]),
                                   np.asarray(model_c.params[key]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f'resume divergence in {key}')


def test_resume_restores_scheduler_state(tmp_path, implicit_train):
    from collie_tpu.training.schedulers import ReduceLROnPlateau

    model = MatrixFactorizationModel(
        train=implicit_train, embedding_dim=4, lr=1e-6, seed=0,
        lr_scheduler_func=lambda: ReduceLROnPlateau(patience=0, factor=0.5))
    trainer = CollieTrainer(model, max_epochs=3, verbosity=0, seed=0,
                            checkpoint_dir=str(tmp_path))
    trainer.fit(model)

    model2 = MatrixFactorizationModel(
        train=implicit_train, embedding_dim=4, lr=1e-6, seed=0,
        lr_scheduler_func=lambda: ReduceLROnPlateau(patience=0, factor=0.5))
    trainer2 = CollieTrainer(model2, max_epochs=4, verbosity=0, seed=0)
    trainer2.resume_from_checkpoint(tmp_path / 'checkpoint_epoch_3.pkl')
    trainer2.fit(model2)
    # scheduler history (best loss) traveled with the checkpoint
    assert model2.hparams['num_epochs_completed'] == 4
