"""Exact vs approximate negative sampling: speed and quality tradeoff.

The reference motivates its approximate loader with "~2x faster at ~1% MAP@10
cost on 1M+ interactions" (``/root/reference/collie/interactions/dataloaders.py:184-187``)
— its exact path is a Python rejection loop.  Here exact sampling is
rejection-free complement sampling on device, so the tradeoff is measured
fresh: throughput and MAP@10/AUC for both modes on the synthetic
ML-100K-scale dataset.

Run on TPU:  python benchmarks/bench_sampling.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def run(mode: str, train, test, trials: int = 5):
    from collie_tpu.data import Interactions, InteractionsDataLoader
    from collie_tpu.evaluate import evaluate_in_batches
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.ops import auc, mapk
    from collie_tpu.training.trainer import CollieTrainer

    data = Interactions(mat=train.mat, num_negative_samples=10,
                        allow_missing_ids=True,
                        check_num_negative_samples_is_valid=False,
                        max_number_of_samples_to_consider=200 if mode == 'exact' else 0,
                        seed=42)
    loader = InteractionsDataLoader(interactions=data, batch_size=1024,
                                    shuffle=True, seed=42)
    model = MatrixFactorizationModel(train=loader, embedding_dim=10, lr=1e-1,
                                     loss='adaptive', seed=0)
    mapks, aucs, rates = [], [], []
    for trial in range(trials):
        model.hparams['seed'] = trial
        model.hparams['num_epochs_completed'] = 0
        model._setup_model()
        trainer = CollieTrainer(model, max_epochs=10, verbosity=0, seed=trial)
        t0 = time.perf_counter()
        trainer.fit(model)
        secs = time.perf_counter() - t0
        mapk_s, auc_s = evaluate_in_batches([mapk, auc], test, model, verbose=False)
        mapks.append(mapk_s)
        aucs.append(auc_s)
        rates.append(len(train) * 10 / secs)
    # first trial includes compile; report steady-state throughput
    return {
        'examples_per_sec': round(float(np.median(rates[1:])), 1),
        'map10_mean': round(float(np.mean(mapks)), 5),
        'map10_std': round(float(np.std(mapks)), 5),
        'auc_mean': round(float(np.mean(aucs)), 5),
    }


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:          # run as `python benchmarks/x.py`
        from _watchdog import device_watchdog
    device_watchdog(label='bench_sampling')
    from collie_tpu.data import stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions

    inter = generate_implicit_interactions(seed=42)
    train, test = stratified_split(inter, test_p=0.2, seed=42, force_split=True)

    results = {}
    for mode in ('exact', 'approximate'):
        results[mode] = run(mode, train, test)
        print(mode, results[mode], flush=True)

    results['speed_ratio_approx_over_exact'] = round(
        results['approximate']['examples_per_sec'] / results['exact']['examples_per_sec'], 3)
    results['map10_cost_of_approx_pct'] = round(
        100 * (results['exact']['map10_mean'] - results['approximate']['map10_mean'])
        / max(results['exact']['map10_mean'], 1e-9), 2)

    out = Path(__file__).parent / 'sampling_tradeoff.json'
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
