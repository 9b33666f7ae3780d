"""Multi-stage, cold-start, and hybrid model tests, mirroring the reference's
coverage (``/root/reference/tests/test_model.py`` multi-stage/hybrid sections).
"""
import numpy as np
import pytest

from collie_tpu.evaluate import evaluate_in_batches
from collie_tpu.models import (ColdStartModel, HybridModel, HybridPretrainedModel,
                               MatrixFactorizationModel)
from collie_tpu.ops import auc
from collie_tpu.training.trainer import CollieTrainer

from tests.fixtures.model_fixtures import (implicit_sets, implicit_train,  # noqa: F401
                                           trained_mf_model)


@pytest.fixture(scope='module')
def item_metadata(implicit_sets):
    rng = np.random.default_rng(7)
    num_items = implicit_sets[0].num_items
    genres = rng.integers(0, 6, num_items)
    onehot = np.eye(6, dtype=np.float32)[genres]
    return onehot


@pytest.fixture(scope='module')
def user_metadata(implicit_sets):
    rng = np.random.default_rng(8)
    num_users = implicit_sets[0].num_users
    return rng.random((num_users, 4)).astype(np.float32)


@pytest.fixture(scope='module')
def item_buckets(implicit_sets):
    rng = np.random.default_rng(9)
    buckets = rng.integers(0, 12, implicit_sets[0].num_items)
    buckets[0] = 0  # ensure 0-based
    return buckets


# ------------------------------------------------------------------ ColdStart

def test_cold_start_full_progression(implicit_sets, item_buckets, tmp_path):
    train, test = implicit_sets
    model = ColdStartModel(train=train, item_buckets=item_buckets,
                           embedding_dim=10, item_buckets_stage_lr=1e-1,
                           no_buckets_stage_lr=1e-2, loss='adaptive', seed=0)
    assert model.hparams['stage'] == 'item_buckets'
    assert model.hparams['stage_list'] == ['item_buckets', 'no_buckets']

    trainer = CollieTrainer(model, max_epochs=3, verbosity=0, seed=0)
    trainer.fit(model)

    bucket_emb_before = np.asarray(model.params['item_bucket_embeddings'])
    model.advance_stage()
    assert model.hparams['stage'] == 'no_buckets'
    # bucket weights were gathered into the per-item tables
    buckets = np.asarray(item_buckets)
    np.testing.assert_allclose(np.asarray(model.params['item_embeddings']),
                               bucket_emb_before[buckets], rtol=1e-6)

    trainer.max_epochs = 6
    trainer.fit(model)
    auc_score = evaluate_in_batches([auc], test, model, verbose=False)
    assert auc_score > 0.52

    with pytest.raises(ValueError, match='final stage'):
        model.advance_stage()

    # save / load jumps to final stage
    path = tmp_path / 'cold_start.npz'
    model.save_model(path)
    loaded = ColdStartModel(load_model_path=path)
    assert loaded.hparams['stage'] == 'no_buckets'
    users, items = np.array([0, 1]), np.array([2, 3])
    np.testing.assert_allclose(model(users, items), loaded(users, items), rtol=1e-5)


def test_cold_start_bucket_similarity(implicit_sets, item_buckets):
    train, _ = implicit_sets
    model = ColdStartModel(train=train, item_buckets=item_buckets, seed=0)
    sims = model.item_bucket_item_similarity(item_bucket_id=2)
    assert len(sims) == train.num_items


def test_cold_start_bucket_validation(implicit_sets):
    train, _ = implicit_sets
    with pytest.raises(ValueError, match='Length of'):
        ColdStartModel(train=train, item_buckets=[0, 1, 2])
    bad = np.ones(train.num_items, dtype=int)
    with pytest.raises(ValueError, match='start at 0'):
        ColdStartModel(train=train, item_buckets=bad)


def test_cold_start_stage_gates_optimizers(implicit_sets, item_buckets):
    train, _ = implicit_sets
    model = ColdStartModel(train=train, item_buckets=item_buckets, seed=0)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=0, seed=0)
    item_emb_before = np.asarray(model.params['item_embeddings'])
    trainer.fit(model)
    # per-item embeddings must be untouched during the item_buckets stage
    np.testing.assert_array_equal(np.asarray(model.params['item_embeddings']),
                                  item_emb_before)
    assert not np.array_equal(np.asarray(model.params['item_bucket_embeddings']),
                              np.zeros(1))


# -------------------------------------------------------------------- Hybrid

def test_hybrid_model_full_progression(implicit_sets, item_metadata, user_metadata,
                                       tmp_path):
    train, test = implicit_sets
    model = HybridModel(train=train, item_metadata=item_metadata,
                        user_metadata=user_metadata,
                        embedding_dim=10, lr=1e-1, loss='adaptive',
                        item_metadata_layers_dims=[8],
                        user_metadata_layers_dims=[8],
                        combined_layers_dims=[16], seed=0)
    assert model.hparams['stage_list'] == ['matrix_factorization', 'metadata_only', 'all']

    trainer = CollieTrainer(model, max_epochs=2, verbosity=0, seed=0)
    trainer.fit(model)

    model.advance_stage()  # metadata_only
    emb_before = np.asarray(model.params['user_embeddings'])
    trainer.max_epochs = 4
    trainer.fit(model)
    # embeddings frozen during metadata_only
    np.testing.assert_array_equal(np.asarray(model.params['user_embeddings']), emb_before)

    model.advance_stage()  # all
    trainer.max_epochs = 6
    trainer.fit(model)
    auc_score = evaluate_in_batches([auc], test, model, verbose=False)
    assert auc_score > 0.52

    # directory save / load round-trip
    save_dir = tmp_path / 'hybrid'
    model.save_model(save_dir)
    loaded = HybridModel(load_model_path=save_dir)
    assert loaded.hparams['stage'] == 'all'
    users, items = np.array([0, 1]), np.array([2, 3])
    np.testing.assert_allclose(model(users, items), loaded(users, items), rtol=1e-5)


def test_hybrid_model_item_metadata_only(implicit_sets, item_metadata):
    train, _ = implicit_sets
    model = HybridModel(train=train, item_metadata=item_metadata,
                        combined_layers_dims=[8], seed=0)
    model.set_stage('all')
    scores = model(np.arange(5), np.arange(5))
    assert np.isfinite(scores).all()


def test_hybrid_model_user_metadata_only(implicit_sets, user_metadata):
    """User-side metadata tower without item metadata (reference
    test_hybrid_model_stages_progression_user_metadata_only) — trains
    through every stage and scores finitely."""
    from collie_tpu.training.trainer import CollieTrainer

    train, _ = implicit_sets
    model = HybridModel(train=train, user_metadata=user_metadata,
                        combined_layers_dims=[8], seed=0)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=0, seed=0)
    for stage in model.hparams['stage_list']:
        model.set_stage(stage)
        trainer.fit(model)
        trainer.max_epochs += 1
    scores = model(np.arange(5), np.arange(5))
    assert np.isfinite(scores).all()


def test_hybrid_model_requires_metadata(implicit_sets):
    with pytest.raises(ValueError, match='Must provide item metadata'):
        HybridModel(train=implicit_sets[0])


def test_hybrid_save_no_overwrite(implicit_sets, item_metadata, tmp_path):
    train, _ = implicit_sets
    model = HybridModel(train=train, item_metadata=item_metadata,
                        combined_layers_dims=[8], seed=0)
    save_dir = tmp_path / 'hybrid2'
    model.save_model(save_dir)
    with pytest.raises(ValueError, match='overwrite'):
        model.save_model(save_dir)
    model.save_model(save_dir, overwrite=True)


# --------------------------------------------------------- HybridPretrained

def test_hybrid_pretrained_full_flow(implicit_sets, trained_mf_model, item_metadata,
                                     tmp_path):
    train, test = implicit_sets
    donor_emb = np.asarray(trained_mf_model.params['item_embeddings']).copy()

    model = HybridPretrainedModel(train=train, item_metadata=item_metadata,
                                  trained_model=trained_mf_model,
                                  combined_layers_dims=[16], lr=1e-2,
                                  loss='adaptive', seed=0)
    # embeddings copied from the donor
    np.testing.assert_array_equal(np.asarray(model.params['item_embeddings']), donor_emb)

    trainer = CollieTrainer(model, max_epochs=3, verbosity=0, seed=0)
    trainer.fit(model)
    # frozen embeddings unchanged; donor unchanged
    np.testing.assert_array_equal(np.asarray(model.params['item_embeddings']), donor_emb)
    np.testing.assert_array_equal(
        np.asarray(trained_mf_model.params['item_embeddings']), donor_emb)

    auc_score = evaluate_in_batches([auc], test, model, verbose=False)
    assert auc_score > 0.52

    # unfreeze and confirm embeddings now train
    model.unfreeze_embeddings()
    trainer.max_epochs = 4
    trainer.fit(model)
    assert not np.array_equal(np.asarray(model.params['item_embeddings']), donor_emb)

    # directory save / load round-trip
    save_dir = tmp_path / 'hybrid_pre'
    model.save_model(save_dir)
    loaded = HybridPretrainedModel(load_model_path=save_dir)
    users, items = np.array([0, 1]), np.array([2, 3])
    np.testing.assert_allclose(model(users, items), loaded(users, items), rtol=1e-5)


def test_hybrid_pretrained_requires_trained_model(implicit_sets, item_metadata):
    with pytest.raises(ValueError, match='trained_model'):
        HybridPretrainedModel(train=implicit_sets[0], item_metadata=item_metadata)


def test_hybrid_pretrained_load_from_hybrid_model(implicit_sets, trained_mf_model,
                                                  item_metadata):
    train, _ = implicit_sets
    model_a = HybridPretrainedModel(train=train, item_metadata=item_metadata,
                                    trained_model=trained_mf_model,
                                    combined_layers_dims=[16], seed=0)
    model_b = HybridPretrainedModel(train=train, item_metadata=item_metadata,
                                    trained_model=trained_mf_model,
                                    combined_layers_dims=[16], seed=99)
    model_b.load_from_hybrid_model(model_a)
    users, items = np.array([0, 1]), np.array([2, 3])
    np.testing.assert_allclose(model_a(users, items), model_b(users, items), rtol=1e-6)


def test_metadata_with_nans_raises(implicit_sets, trained_mf_model):
    bad = np.full((implicit_sets[0].num_items, 3), np.nan, dtype=np.float32)
    with pytest.raises(ValueError, match='may not contain nulls'):
        HybridPretrainedModel(train=implicit_sets[0], item_metadata=bad,
                              trained_model=trained_mf_model)


def test_cold_start_bucket_validation_matrix(implicit_sets):
    """Full bad-bucket matrix of the reference's TestBadInitializationColdStartModel
    (tests/test_model.py:873-917): 2-d, 1-indexed, too short, too long."""
    train, _ = implicit_sets
    n = train.num_items
    rng = np.random.default_rng(0)

    with pytest.raises(AssertionError, match='1-dimensional'):
        ColdStartModel(train=train, item_buckets=rng.integers(0, 5, (n, 2)))
    with pytest.raises(ValueError, match='start at 0'):
        ColdStartModel(train=train, item_buckets=rng.integers(1, 5, n))
    with pytest.raises(ValueError, match='Length of'):
        ColdStartModel(train=train, item_buckets=np.zeros(n - 1, dtype=int))
    with pytest.raises(ValueError, match='Length of'):
        ColdStartModel(train=train, item_buckets=np.zeros(n + 1, dtype=int))


def test_cold_start_bucket_types_accepted(implicit_sets):
    """Lists and numpy arrays are both accepted and normalized into hparams
    (reference ``test_item_buckets_wrong_type``)."""
    train, _ = implicit_sets
    n = train.num_items
    buckets = np.zeros(n, dtype=int)
    m1 = ColdStartModel(train=train, item_buckets=buckets.tolist())
    m2 = ColdStartModel(train=train, item_buckets=buckets)
    assert m1.hparams['item_buckets'] == m2.hparams['item_buckets']
    assert m1.hparams['num_item_buckets'] == 1
