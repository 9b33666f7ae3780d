"""Explicit-feedback (MSE, y_range) training throughput: fused explicit
Pallas kernel vs the XLA scan engine, at the reference's explicit quickstart
configuration (MF dim 10, lr 1e-2, loss='mse', y_range=[1, 5] — BASELINE.md
quickstart #2, reference ``README.md:110-117``).

Run on TPU:  python benchmarks/bench_explicit.py [--epochs 20]
Writes ``benchmarks/explicit_results.json``.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_model(fused: bool, inter, batch_size):
    import os
    os.environ['COLLIE_TPU_FUSED_EPOCH'] = '1' if fused else '0'
    from collie_tpu.data import InteractionsDataLoader
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel

    loader = InteractionsDataLoader(interactions=inter,
                                    batch_size=batch_size, shuffle=True,
                                    seed=0)
    return MatrixFactorizationModel(train=loader, embedding_dim=10, lr=1e-2,
                                    loss='mse', y_range=(1.0, 5.0), seed=0)


def timed_fit(fused: bool, inter, epochs: int, batch_size: int):
    from collie_tpu.training.trainer import CollieTrainer

    # warm: identical fit first so the timed window holds zero compiles
    for timed in (False, True):
        model = build_model(fused, inter, batch_size)
        trainer = CollieTrainer(model, max_epochs=epochs, verbosity=0, seed=0)
        start = time.perf_counter()
        trainer.fit(model)
        secs = time.perf_counter() - start
    n = inter.num_interactions * epochs
    return model, n / secs


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:          # run as `python benchmarks/x.py`
        from _watchdog import device_watchdog
    device_watchdog(label='bench_explicit')
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=20)
    parser.add_argument('--batch-size', type=int, default=1024)
    args = parser.parse_args()

    import jax
    from collie_tpu.data import ExplicitInteractions, stratified_split
    from collie_tpu.data.synthetic import generate_interactions_df
    from collie_tpu.evaluate import explicit_evaluate_in_batches

    df = generate_interactions_df(seed=42)
    inter = ExplicitInteractions(users=df['user_id'].values,
                                 items=df['item_id'].values,
                                 ratings=df['rating'].values,
                                 allow_missing_ids=True)
    train, test = stratified_split(inter, test_p=0.2, seed=42,
                                   force_split=True)

    results = {'backend': jax.default_backend(), 'epochs': args.epochs,
               'batch_size': args.batch_size}
    for name, fused in (('scan', False), ('fused', True)):
        model, ex_s = timed_fit(fused, train, args.epochs, args.batch_size)
        mse = float(explicit_evaluate_in_batches(['mse'], test, model,
                                                 verbose=False))
        results[name] = {'examples_per_sec': round(ex_s), 'test_mse': mse}
        print(f'{name}: {ex_s:,.0f} ex/s  test MSE {mse:.5f}', flush=True)
    results['speedup'] = round(results['fused']['examples_per_sec'] /
                               results['scan']['examples_per_sec'], 2)
    print(f"fused/scan speedup: {results['speedup']}x")

    if jax.default_backend() == 'tpu':
        with open(Path(__file__).parent / 'explicit_results.json', 'w') as f:
            json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
