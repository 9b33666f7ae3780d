"""Compiled-function cache invalidation (CLAUDE.md invariant: anything that
changes the traced computation for the same cache key must miss the cache).

Regression tests for the round-1 advisor findings: stale fused-eval programs
after ``advance_stage``, stale seen-set closures in retrieval, recycled
``id()`` loader keys in the scan engine, and weak_type loss on checkpoint
resume.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collie_tpu.data import Interactions, InteractionsDataLoader
from collie_tpu.evaluate import evaluate_in_batches
from collie_tpu.models import ColdStartModel, MatrixFactorizationModel
from collie_tpu.ops import mapk
from collie_tpu.retrieval import recommend
from collie_tpu.training.trainer import CollieTrainer

from tests.fixtures.model_fixtures import implicit_sets, implicit_train  # noqa: F401


def test_fused_eval_cache_tracks_stage(implicit_sets):
    """``score()`` branches on hparams['stage'] at trace time: after
    ``advance_stage`` the fused evaluator must re-trace, not silently reuse
    the previous stage's program (advisor finding, round 1)."""
    train, test = implicit_sets
    rng = np.random.default_rng(3)
    buckets = rng.integers(0, 8, train.num_items)
    buckets[0] = 0
    model = ColdStartModel(train=train, item_buckets=buckets, embedding_dim=8,
                           loss='adaptive', seed=0)
    trainer = CollieTrainer(model, max_epochs=2, verbosity=0, seed=0)
    trainer.fit(model)

    evaluate_in_batches([mapk], test, model, k=10, verbose=False)
    model.advance_stage()
    # train a step in the new stage so per-item tables diverge from the
    # bucket tables they were initialized from at the stage boundary
    trainer.max_epochs = 3
    trainer.fit(model)
    stage2_score = evaluate_in_batches([mapk], test, model, k=10, verbose=False)

    # each stage traced its own fused-eval program
    fused_keys = [key for key in model._compiled_fn_cache
                  if key[0] == 'fused_eval']
    assert sorted(key[1] for key in fused_keys) == ['item_buckets', 'no_buckets']

    stale = model._compiled_fn_cache
    model._compiled_fn_cache = {}
    stage2_fresh = evaluate_in_batches([mapk], test, model, k=10, verbose=False)
    model._compiled_fn_cache = stale
    assert stage2_score == pytest.approx(stage2_fresh, abs=1e-6), \
        'cached fused-eval program is stale after advance_stage'


def _interactions_for(users, items, num_users, num_items):
    return Interactions(users=np.asarray(users), items=np.asarray(items),
                        allow_missing_ids=True, num_users=num_users,
                        num_items=num_items, num_negative_samples=2, seed=0,
                        check_num_negative_samples_is_valid=False)


def test_recommend_tracks_current_seen_set():
    """Swapping the model's loaders for same-shape data with a *different*
    seen set must change what retrieval filters — the CSR is a jit argument,
    not a compile-time closure constant (advisor finding, round 1)."""
    num_users, num_items = 8, 64
    rng = np.random.default_rng(0)
    base_users = np.repeat(np.arange(num_users), 4)
    base_items = rng.permutation(num_items)[:len(base_users)]
    inter_a = _interactions_for(base_users, base_items, num_users, num_items)

    model = MatrixFactorizationModel(train=inter_a, embedding_dim=4, seed=0)
    ids_a, _ = recommend(model, [0], k=32, filter_seen=True)
    seen_a = set(inter_a.mat.tocsr()[0].indices.tolist())
    assert not seen_a & set(ids_a[0].tolist())

    # same nnz, user 0 interacts with different items
    items_b = base_items.copy()
    items_b[:4] = (base_items[:4] + 17) % num_items
    inter_b = _interactions_for(base_users, items_b, num_users, num_items)
    model.train_loader = InteractionsDataLoader(interactions=inter_b)

    ids_b, _ = recommend(model, [0], k=32, filter_seen=True)
    seen_b = set(inter_b.mat.tocsr()[0].indices.tolist())
    assert not seen_b & set(ids_b[0].tolist()), \
        'retrieval filtered by a stale seen set after the loader changed'


def test_scan_cache_rebuilds_for_new_loader(implicit_train):
    """The scan engine snapshots the loader's epoch data at build time; a new
    loader object must get its own program slot even if it hashes/keys
    identically (id() recycling hazard; advisor finding, round 1) — and
    switching BACK to a previous loader must reuse its slot, not recompile
    (single-slot eviction regression; advisor finding, round 2)."""
    loader_a = InteractionsDataLoader(interactions=implicit_train,
                                      batch_size=1024, shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader_a, embedding_dim=4, seed=0)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=0, seed=0)
    trainer.fit(model)

    key = next(k for k in model._compiled_fn_cache if k[0] == 'train')
    slots = model._compiled_fn_cache[key]
    assert loader_a in slots
    built_a = slots[loader_a]

    loader_b = InteractionsDataLoader(interactions=implicit_train,
                                      batch_size=1024, shuffle=True, seed=1)
    model.train_loader = loader_b
    trainer.max_epochs = 2
    trainer.fit(model)
    slots = model._compiled_fn_cache[key]
    assert loader_b in slots and slots[loader_b] is not built_a
    # alternating back reuses loader_a's slot (both programs stay cached)
    model.train_loader = loader_a
    trainer.max_epochs = 3
    trainer.fit(model)
    assert model._compiled_fn_cache[key][loader_a] is built_a


def test_fused_tables_flag_misses_cache(implicit_train, monkeypatch):
    """COLLIE_TPU_FUSED_TABLES is baked into the traced epoch program, so
    flipping it between fits must key a NEW program, not silently reuse the
    previous layout (round-4 review finding — same class as FUSED_EPOCH)."""
    loader = InteractionsDataLoader(interactions=implicit_train,
                                    batch_size=1024, shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=4, seed=0)
    trainer = CollieTrainer(model, max_epochs=1, verbosity=0, seed=0)

    monkeypatch.setenv('COLLIE_TPU_FUSED_TABLES', '1')
    trainer.fit(model)
    keys_fused = {k for k in model._compiled_fn_cache if k[0] == 'train'}

    monkeypatch.setenv('COLLIE_TPU_FUSED_TABLES', '0')
    trainer.max_epochs = 2
    trainer.fit(model)
    keys_named = {k for k in model._compiled_fn_cache if k[0] == 'train'}
    assert keys_named - keys_fused, (
        'toggling COLLIE_TPU_FUSED_TABLES did not key a new train program')


def test_retrieval_dense_budget_misses_cache(implicit_train, monkeypatch):
    """COLLIE_TPU_RETRIEVAL_DENSE_BUDGET_MB is baked into the built retrieve
    fn; changing it between recommend() calls must rebuild (round-4 review
    finding — a user lowering the budget to escape an OOM must not hit the
    stale dense program)."""
    model = MatrixFactorizationModel(train=implicit_train, embedding_dim=4,
                                     seed=0)
    monkeypatch.setenv('COLLIE_TPU_RETRIEVAL_DENSE_BUDGET_MB', '512')
    ids_a, _ = recommend(model, user_ids=np.arange(4), k=3,
                         filter_seen=False)
    n_before = len(model._compiled_fn_cache)
    monkeypatch.setenv('COLLIE_TPU_RETRIEVAL_DENSE_BUDGET_MB', '0')
    ids_b, _ = recommend(model, user_ids=np.arange(4), k=3,
                         filter_seen=False)
    assert len(model._compiled_fn_cache) > n_before, (
        'budget change reused the stale retrieval program')
    np.testing.assert_array_equal(ids_a, ids_b)  # paths agree on results


def test_match_lr_aval_roundtrip():
    """Checkpoint restore converts leaves through numpy, which can change the
    lr leaf's aval (dtype/weak_type); the trainer rebuilds it from the
    freshly-initialized state's aval so the first post-resume epoch reuses the
    compiled program instead of recompiling (advisor finding, round 1)."""
    from collie_tpu.training.optimizers import (build_transform, get_lr,
                                                match_lr_aval, set_lr)

    transform = build_transform('adam', 0.1)
    params = {'w': jnp.ones((3, 2))}
    fresh = jax.jit(transform.init)(params)

    # simulate checkpoint save/restore incl. an adversarial float64 round trip
    stepped = set_lr(fresh, 0.025)
    host = jax.tree_util.tree_map(np.asarray, stepped)
    host = host._replace(hyperparams={
        **host.hyperparams,
        'learning_rate': np.float64(host.hyperparams['learning_rate'])})
    restored = jax.tree_util.tree_map(jnp.asarray, host)

    fixed = match_lr_aval(restored, fresh)
    assert get_lr(fixed) == pytest.approx(0.025)
    # aval (dtype AND weak_type) matches the freshly-initialized state
    assert jax.typeof(fixed.hyperparams['learning_rate']) == \
        jax.typeof(fresh.hyperparams['learning_rate'])
