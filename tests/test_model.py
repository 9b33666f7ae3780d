"""Model + trainer end-to-end tests, mirroring the reference's strategy
(``/root/reference/tests/test_model.py``): trained-model quality gates,
inference APIs, save/load round-trips, loss/optimizer configuration edges.

Quality gates are calibrated on the synthetic planted-structure dataset
(mean minus a wide margin over seeds), playing the role of the reference's
ML-100K mean-5-sigma gates (``test_model.py:785-790``).
"""
import os

import numpy as np
import pytest

from collie_tpu.data import Interactions
from collie_tpu.evaluate import evaluate_in_batches, explicit_evaluate_in_batches, get_preds
from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
from collie_tpu.ops import auc, mapk, mrr
from collie_tpu.training.trainer import CollieMinimalTrainer, CollieTrainer

from tests.fixtures.model_fixtures import (explicit_sets, implicit_sets,  # noqa: F401
                                           implicit_test, implicit_train,
                                           trained_mf_model)


def test_trained_mf_beats_quality_gate(trained_mf_model, implicit_test):
    mapk_score, mrr_score, auc_score = evaluate_in_batches(
        [mapk, mrr, auc], implicit_test, trained_mf_model, verbose=False)
    # calibrated over seeds {0,1,2}: mapk ~0.026 +/- 0.003, auc ~0.60
    assert mapk_score > 0.015
    assert mrr_score > 0.10
    assert auc_score > 0.55


def test_untrained_model_is_near_chance(implicit_train, implicit_test):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=10, seed=0)
    auc_score = evaluate_in_batches([auc], implicit_test, model, verbose=False)
    assert 0.4 < auc_score < 0.6


def test_training_decreases_loss(implicit_train):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=10,
                                     lr=1e-1, loss='adaptive', seed=0)
    losses = []

    class Recorder:
        def log_metrics(self, metrics, step):
            if 'train_loss_epoch' in metrics:
                losses.append(metrics['train_loss_epoch'])

    trainer = CollieTrainer(model, max_epochs=8, verbosity=0, logger=Recorder(), seed=0)
    trainer.fit(model)
    # near convergence the last epoch can wiggle above epoch 1 on some
    # sampler streams — "training reduces loss" is about the trajectory,
    # not the final sample
    assert min(losses[1:]) < losses[0]


def test_epoch_numbering_resumes_across_fit_calls(implicit_train):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4, seed=0)
    trainer = CollieTrainer(model, max_epochs=2, verbosity=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 2
    trainer.max_epochs = 4
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 4


def test_early_stopping(implicit_train):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4,
                                     lr=1e-6, seed=0)  # lr so tiny loss plateaus
    trainer = CollieTrainer(model, max_epochs=50, verbosity=0,
                            early_stopping_patience=2)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] < 50


def test_minimal_trainer_is_same_engine(implicit_train):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4, seed=0)
    trainer = CollieMinimalTrainer(model, max_epochs=1, verbosity=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 1


def test_get_item_predictions(trained_mf_model):
    preds = trained_mf_model.get_item_predictions(user_id=0)
    assert len(preds) == trained_mf_model.hparams['num_items']
    assert preds.iloc[0] >= preds.iloc[-1]
    unseen = trained_mf_model.get_item_predictions(user_id=0, unseen_items_only=True)
    seen = trained_mf_model.train_loader.mat.tocsr()[0].nonzero()[1]
    assert len(unseen) == trained_mf_model.hparams['num_items'] - len(seen)
    assert not set(seen.tolist()) & set(unseen.index.tolist())


def test_get_item_predictions_bad_user_raises(trained_mf_model):
    with pytest.raises(ValueError, match='not in the model'):
        trained_mf_model.get_item_predictions(user_id=10_000)


def test_get_user_predictions(trained_mf_model):
    preds = trained_mf_model.get_user_predictions(item_id=0)
    assert len(preds) == trained_mf_model.hparams['num_users']
    with pytest.raises(ValueError, match='not in the model'):
        trained_mf_model.get_user_predictions(item_id=10_000)


def test_similarity_apis(trained_mf_model):
    sims = trained_mf_model.item_item_similarity(item_id=5)
    assert sims.index[0] == 5  # most similar item is itself
    assert len(sims) == trained_mf_model.hparams['num_items']
    user_sims = trained_mf_model.user_user_similarity(user_id=3)
    assert user_sims.index[0] == 3


def test_score_all_items_matches_pairwise(trained_mf_model):
    import jax.numpy as jnp

    users = jnp.asarray([0, 5, 11])
    block = np.asarray(get_preds(trained_mf_model, users))
    num_items = trained_mf_model.hparams['num_items']
    for row, u in zip(block, [0, 5, 11]):
        pairwise = trained_mf_model(np.full(num_items, u), np.arange(num_items))
        np.testing.assert_allclose(row, pairwise, rtol=2e-4, atol=2e-4)


def test_save_load_roundtrip(tmp_path, trained_mf_model, implicit_test):
    path = tmp_path / 'model.npz'
    trained_mf_model.save_model(path)
    loaded = MatrixFactorizationModel(load_model_path=path)
    assert loaded.hparams['num_users'] == trained_mf_model.hparams['num_users']
    users = np.array([0, 1, 2])
    items = np.array([3, 4, 5])
    np.testing.assert_allclose(trained_mf_model(users, items), loaded(users, items),
                               rtol=1e-6)
    # loaded model evaluates identically
    a = evaluate_in_batches([mapk], implicit_test, trained_mf_model, verbose=False)
    b = evaluate_in_batches([mapk], implicit_test, loaded, verbose=False)
    assert a == pytest.approx(b, abs=1e-6)


def test_y_range_bounds_scores(implicit_train):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4,
                                     y_range=(1.0, 5.0), seed=0)
    scores = model(np.arange(10), np.arange(10))
    assert (scores >= 1.0).all() and (scores <= 5.0).all()


def test_explicit_training_and_eval(explicit_sets):
    train, test = explicit_sets
    model = MatrixFactorizationModel(train=train, embedding_dim=10, lr=1e-2,
                                     loss='mse', y_range=(1, 5), seed=0)
    trainer = CollieTrainer(model, max_epochs=10, verbosity=0)
    trainer.fit(model)
    mse_score, mae_score = explicit_evaluate_in_batches(['mse', 'mae'], test, model)
    # star ratings are 1..5; a learned model must beat the ~1.9 variance of
    # predicting poorly and land under 1.5 MSE on the planted-structure data
    assert mse_score < 1.5
    assert mae_score < 1.1


def test_explicit_loss_with_implicit_data_raises(implicit_train):
    with pytest.raises(ValueError, match='Cannot use WARP'):
        MatrixFactorizationModel(
            train=Interactions(mat=implicit_train.mat, num_negative_samples=1,
                               allow_missing_ids=True,
                               check_num_negative_samples_is_valid=False),
            loss='warp')


def test_adaptive_downgrade_warns(implicit_train):
    single_neg = Interactions(mat=implicit_train.mat, num_negative_samples=1,
                              allow_missing_ids=True,
                              check_num_negative_samples_is_valid=False)
    with pytest.warns(UserWarning, match='standard hinge loss'):
        MatrixFactorizationModel(train=single_neg, loss='adaptive')


def test_invalid_loss_raises(implicit_train):
    with pytest.raises(ValueError, match='not a valid loss'):
        MatrixFactorizationModel(train=implicit_train, loss='nonsense')


def test_no_train_raises():
    with pytest.raises(TypeError, match='must be provided'):
        MatrixFactorizationModel()


def test_mismatched_val_raises(implicit_train):
    other = Interactions(users=[0, 1], items=[0, 1], ratings=[1, 1],
                         check_num_negative_samples_is_valid=False)
    with pytest.raises(AssertionError, match='num_users'):
        MatrixFactorizationModel(train=implicit_train, val=other)


def test_bias_optimizer_specs(implicit_train):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4, seed=0)
    specs = model.optimizer_specs()
    assert {s.name for s in specs} == {'all_but_bias', 'bias'}
    bias_spec = next(s for s in specs if s.name == 'bias')
    assert set(bias_spec.keys) == {'user_biases', 'item_biases'}

    single = MatrixFactorizationModel(train=implicit_train, embedding_dim=4,
                                      bias_optimizer=None, seed=0)
    specs = single.optimizer_specs()
    assert len(specs) == 1 and specs[0].name == 'all'


def test_custom_callable_loss(implicit_train):
    def my_loss(pos, neg, **kwargs):
        import jax.numpy as jnp
        return jnp.maximum(1.0 - (pos - neg), 0.0).mean()

    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4,
                                     loss=my_loss, seed=0)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 1


def test_validation_loop_runs(implicit_sets):
    train, test = implicit_sets
    model = MatrixFactorizationModel(train=train, val=test, embedding_dim=4, seed=0)
    vals = []

    class Recorder:
        def log_metrics(self, metrics, step):
            if 'val_loss_epoch' in metrics:
                vals.append(metrics['val_loss_epoch'])

    trainer = CollieTrainer(model, max_epochs=2, verbosity=0, logger=Recorder())
    trainer.fit(model)
    assert len(vals) == 2


def test_partial_credit_metadata_loss_end_to_end(implicit_train):
    """Training with partial-credit item metadata (tutorial 04 config) runs
    through the scan engine and changes the loss trajectory vs no metadata."""
    rng = np.random.default_rng(0)
    genres = rng.integers(0, 4, implicit_train.num_items)

    def fit(metadata):
        losses = []

        class Recorder:
            def log_metrics(self, metrics, step):
                if 'train_loss_epoch' in metrics:
                    losses.append(metrics['train_loss_epoch'])

        kwargs = {}
        if metadata:
            kwargs = dict(metadata_for_loss={'genre': genres},
                          metadata_for_loss_weights={'genre': 0.25})
        model = MatrixFactorizationModel(train=implicit_train, embedding_dim=8,
                                         lr=1e-1, loss='adaptive', seed=0, **kwargs)
        trainer = CollieTrainer(model, max_epochs=3, verbosity=0, seed=0,
                                logger=Recorder())
        trainer.fit(model)
        return losses

    plain = fit(metadata=False)
    credited = fit(metadata=True)
    assert len(credited) == 3
    # partial credit lowers the ideal difference for metadata matches, so the
    # loss values must differ from the uncredited run
    assert not np.allclose(plain, credited)


def test_warp_loss_trains_end_to_end(implicit_train):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=8,
                                     lr=1e-1, loss='warp', seed=0)
    trainer = CollieTrainer(model, max_epochs=2, verbosity=0, seed=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 2


def test_model_usable_after_nan_abort(implicit_train):
    """If fit raises (NaN guard), the model must hold live buffers — the
    epoch programs donate their inputs, so a naive implementation leaves
    model.params pointing at invalidated arrays."""
    import jax.numpy as jnp

    def exploding_loss(pos, neg, **kwargs):
        return (pos - neg).mean() * jnp.float32(np.nan)

    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4,
                                     loss=exploding_loss, seed=0)
    trainer = CollieTrainer(model, max_epochs=3, verbosity=0, seed=0,
                            terminate_on_nan=True)
    with pytest.raises(FloatingPointError):
        trainer.fit(model)
    # params are live and usable for inference
    scores = model(np.array([0, 1]), np.array([0, 1]))
    assert scores.shape == (2,)


def test_evaluate_in_batches_logger_and_custom_metric(implicit_test, trained_mf_model,
                                                      capsys):
    """Logger integration (reference metrics.py:524-543) and the generic
    per-batch fallback for custom metric callables."""
    logged = {}

    class Logger:
        def log_metrics(self, metrics, step):
            logged.update(metrics)
            logged['step'] = step

    score = evaluate_in_batches([mapk, mrr], implicit_test, trained_mf_model,
                                logger=Logger(), verbose=True)
    out = capsys.readouterr().out
    assert 'Logging metrics' in out
    assert logged['mapk'] == pytest.approx(score[0])
    assert logged['step'] == trained_mf_model.hparams['num_epochs_completed']

    # custom callable metric forces the per-batch path; csr signature like the
    # reference's metric contract
    def hit_rate(targets, user_ids, preds, k):
        top = np.asarray(preds).argsort(axis=1)[:, ::-1][:, :k]
        hits = [(targets[u, list(row)].toarray() > 0).any()
                for u, row in zip(user_ids, top)]
        return float(np.mean(hits))

    hr = evaluate_in_batches([hit_rate], implicit_test, trained_mf_model,
                             verbose=False)
    assert 0.0 <= hr <= 1.0


def test_fused_and_per_batch_eval_agree(implicit_test, trained_mf_model):
    """The fused rank-based fast path and the generic per-batch path must
    produce the same scores."""
    fused = evaluate_in_batches([mapk, mrr, auc], implicit_test, trained_mf_model,
                                verbose=False)

    def mapk_cb(**kw):
        return mapk(**kw)

    def mrr_cb(**kw):
        return mrr(**kw)

    def auc_cb(**kw):
        return auc(**kw)

    per_batch = evaluate_in_batches([mapk_cb, mrr_cb, auc_cb], implicit_test,
                                    trained_mf_model, verbose=False)
    np.testing.assert_allclose(fused, per_batch, rtol=1e-4, atol=1e-5)


def test_api_parity_shims(trained_mf_model):
    """Reference idioms: model.eval(), model.train(), model.to(device)."""
    assert trained_mf_model.eval() is trained_mf_model
    assert trained_mf_model.train() is trained_mf_model
    assert trained_mf_model.to('anything') is trained_mf_model
    assert trained_mf_model.device is not None


def test_dedup_rounds_knob_trains(implicit_train):
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4,
                                     loss='adaptive', seed=0)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=0, seed=0,
                            exact_sampling_dedup_rounds=0)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 1


def test_logger_false_is_accepted(implicit_train):
    """The reference CLI passes ``logger=False`` (Lightning idiom); it must
    mean "no logging", not an object to call."""
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4, seed=0)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=0, logger=False)
    trainer.fit(model)
    assert model.hparams['num_epochs_completed'] == 1


def test_hparams_attribute_access(trained_mf_model):
    """Reference idiom: model.hparams.num_epochs_completed (Lightning-style)."""
    assert trained_mf_model.hparams.num_epochs_completed == \
        trained_mf_model.hparams['num_epochs_completed']
    assert trained_mf_model.hparams.embedding_dim == 10
    trained_mf_model.hparams.custom_field = 7
    assert trained_mf_model.hparams['custom_field'] == 7
    with pytest.raises(AttributeError):
        _ = trained_mf_model.hparams.does_not_exist


def test_similarity_and_preds_bad_ids_raise(trained_mf_model):
    """Out-of-range IDs raise the reference's explicit range errors
    (reference tests test_get_item_preds_err / test_get_user_preds_err /
    test_item_item_similarity_err / test_user_user_similarity_err)."""
    n_items = trained_mf_model.hparams['num_items']
    n_users = trained_mf_model.hparams['num_users']
    with pytest.raises(ValueError, match='not in the model'):
        trained_mf_model.item_item_similarity(item_id=n_items)
    with pytest.raises(ValueError, match='not in the model'):
        trained_mf_model.user_user_similarity(user_id=n_users)
    with pytest.raises(ValueError, match='not in the model'):
        trained_mf_model.get_user_predictions(item_id=n_items)


def test_sparse_with_weight_decay_warns_and_zeroes(implicit_train):
    """Reference ``base_pipeline.py`` zeroes weight decay for sparse
    embeddings with a warning (test_instantiation_of_sparse_model_with_
    weight_decay); the TPU mapping keeps the same API contract."""
    with pytest.warns(UserWarning, match='weight_decay'):
        model = MatrixFactorizationModel(train=implicit_train, sparse=True,
                                         weight_decay=1e-4,
                                         embedding_dim=4, seed=0)
    assert model.hparams['weight_decay'] == 0.0


def test_bad_final_layer_raises():
    """Invalid ``final_layer`` strings raise at forward time (reference
    test_bad_final_layer_of_neucf / test_bad_final_layer_of_deep_fm)."""
    from collie_tpu.models.deep_fm import DeepFM
    from collie_tpu.models.neural_collaborative_filtering import \
        NeuralCollaborativeFiltering

    u = np.repeat(np.arange(30), 5)
    i = np.tile(np.arange(30), 5)
    inter = Interactions(users=u, items=i, num_negative_samples=2,
                         allow_missing_ids=True)
    for cls in (NeuralCollaborativeFiltering, DeepFM):
        model = cls(train=inter, final_layer='bogus', seed=0)
        with pytest.raises(ValueError, match='not valid final layer'):
            model.score(model.params, np.array([0]), np.array([0]))


@pytest.mark.parametrize('change', ['num_users', 'num_items',
                                    'num_negative_samples', 'zero_negatives'])
def test_mismatched_train_and_val_loaders_matrix(implicit_train, change):
    """Reference ``test_mismatched_train_and_val_loaders`` matrix
    (tests/test_model.py:69-98): users/items mismatches assert; a train/val
    negatives split across the 1-vs->1 protocol boundary asserts; zero train
    negatives is a ValueError."""
    import copy

    train = copy.copy(implicit_train)
    val = copy.copy(implicit_train)
    expected = AssertionError
    if change == 'num_users':
        val.num_users = train.num_users + 1
    elif change == 'num_items':
        val.num_items = train.num_items + 1
    elif change == 'num_negative_samples':
        train.num_negative_samples = 1
        val.num_negative_samples = 2
    elif change == 'zero_negatives':
        train.num_negative_samples = 0
        expected = ValueError
    with pytest.raises(expected):
        MatrixFactorizationModel(train=train, val=val, embedding_dim=4)


def test_okay_mismatched_num_negative_samples(implicit_train):
    """Both >1 is fine even when unequal (reference
    ``test_okay_mismatched_train_and_val_loaders``, tests/test_model.py:101-112)."""
    import copy

    train = copy.copy(implicit_train)
    val = copy.copy(implicit_train)
    train.num_negative_samples = 2
    val.num_negative_samples = 3
    model = MatrixFactorizationModel(train=train, val=val, embedding_dim=4,
                                     lr=0.1, seed=0)
    CollieTrainer(model, max_epochs=1, verbosity=0, seed=0).fit(model)
    assert model.hparams['num_epochs_completed'] == 1
