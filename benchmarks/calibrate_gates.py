"""Calibrate statistical quality gates: mean - 5*sigma over N training trials.

Reproduces the reference's gate methodology
(``/root/reference/tests/test_model.py:785-790``: thresholds set at
mean - 5 sigma over 30 trials) for this stack's own run-to-run variance on the
synthetic ML-100K-scale dataset.  Writes ``benchmarks/gates.json`` consumed by
``tests/test_quality_gates.py``.

Run on TPU:  python benchmarks/calibrate_gates.py [--trials 30]
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

# allow ``python benchmarks/calibrate_gates.py`` from the repo root
sys.path.insert(0, str(Path(__file__).parent.parent))


def reset_for_trial(model, seed: int) -> None:
    """Re-initialize parameters for a fresh trial while keeping the model's
    compiled-function cache (one compile serves all trials)."""
    model.hparams['seed'] = seed
    model.hparams['num_epochs_completed'] = 0
    model._setup_model()


def run_trial(model, seed: int, test):
    from collie_tpu.evaluate import evaluate_in_batches
    from collie_tpu.ops import auc, mapk, mrr
    from collie_tpu.training.trainer import CollieTrainer

    reset_for_trial(model, seed)
    trainer = CollieTrainer(model, max_epochs=10, verbosity=0, seed=seed)
    trainer.fit(model)
    return evaluate_in_batches([mapk, mrr, auc], test, model, k=10, verbose=False)


def run_explicit_trial(model, seed: int, test):
    from collie_tpu.evaluate import explicit_evaluate_in_batches
    from collie_tpu.training.trainer import CollieTrainer

    reset_for_trial(model, seed)
    trainer = CollieTrainer(model, max_epochs=10, verbosity=0, seed=seed)
    trainer.fit(model)
    return explicit_evaluate_in_batches(['mse'], test, model)


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:          # run as `python benchmarks/x.py`
        from _watchdog import device_watchdog
    device_watchdog(label='calibrate_gates')
    parser = argparse.ArgumentParser()
    parser.add_argument('--trials', type=int, default=30)
    args = parser.parse_args()

    from collie_tpu.data import ExplicitInteractions, stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions, \
        generate_interactions_df

    # implicit config mirrors the reference gate fixture
    # (``tests/fixtures/model_fixtures.py:24-40``: MF dim 10, lr 0.1, 10 epochs,
    # 80/20 stratified) on the synthetic ML-100K-scale dataset
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel

    implicit = generate_implicit_interactions(seed=42)
    train, test = stratified_split(implicit, test_p=0.2, seed=42, force_split=True)
    implicit_model = MatrixFactorizationModel(train=train, embedding_dim=10, lr=1e-1,
                                              loss='adaptive', seed=0)

    results = {'mapk': [], 'mrr': [], 'auc': []}
    for trial in range(args.trials):
        mapk_s, mrr_s, auc_s = run_trial(implicit_model, seed=trial, test=test)
        results['mapk'].append(mapk_s)
        results['mrr'].append(mrr_s)
        results['auc'].append(auc_s)
        print(f'implicit trial {trial}: mapk={mapk_s:.5f} mrr={mrr_s:.5f} '
              f'auc={auc_s:.5f}', flush=True)

    df = generate_interactions_df(seed=42)
    explicit = ExplicitInteractions(users=df['user_id'].values,
                                    items=df['item_id'].values,
                                    ratings=df['rating'].values,
                                    allow_missing_ids=True,
                                    num_users=943, num_items=1682)
    etrain, etest = stratified_split(explicit, test_p=0.2, seed=42, force_split=True)
    explicit_model = MatrixFactorizationModel(train=etrain, embedding_dim=10, lr=1e-2,
                                              loss='mse', y_range=(1, 5), seed=0)
    results['mse'] = []
    for trial in range(args.trials):
        mse = run_explicit_trial(explicit_model, seed=trial, test=etest)
        results['mse'].append(mse)
        print(f'explicit trial {trial}: mse={mse:.5f}', flush=True)

    gates = {}
    for name, values in results.items():
        arr = np.asarray(values)
        sign = 1.0 if name != 'mse' else -1.0  # mse: lower is better
        gate = float(arr.mean() - sign * 5 * arr.std())
        gates[name] = {
            'mean': float(arr.mean()),
            'std': float(arr.std()),
            'gate': gate,
            'direction': 'min' if sign > 0 else 'max',
            'trials': args.trials,
        }
        print(f'{name}: mean={arr.mean():.5f} std={arr.std():.5f} '
              f'gate({"<" if sign < 0 else ">"})={gate:.5f}')

    out = Path(__file__).parent / 'gates.json'
    out.write_text(json.dumps(gates, indent=2))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
