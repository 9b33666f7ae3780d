"""Quality parity of the fused Pallas epoch engine vs the XLA scan engine.

Single-epoch numerics between the engines match to ~5e-6 (see
``tests/test_fused_epoch.py`` and the measurement notes in
``docs/BENCHMARKS.md``), but the adaptive-hinge hardest-negative argmax
amplifies f32 accumulation-order rounding chaotically over many epochs, so
bitwise param comparison is meaningless at 10 epochs.  The meaningful check —
the reference's own methodology
(``/root/reference/tests/test_model.py:785-790``) — is statistical: train the
gate configuration to completion under the fused engine and require every
metric to clear the scan-engine-calibrated gates (mean - 5 sigma,
``benchmarks/gates.json``).

Run on TPU:  python benchmarks/fused_quality.py [--trials 10]
Writes ``benchmarks/fused_quality.json``.
"""
import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:          # run as `python benchmarks/x.py`
        from _watchdog import device_watchdog
    device_watchdog(label='fused_quality')
    parser = argparse.ArgumentParser()
    parser.add_argument('--trials', type=int, default=10)
    args = parser.parse_args()

    os.environ['COLLIE_TPU_FUSED_EPOCH'] = '1'

    from benchmarks.calibrate_gates import run_trial
    from collie_tpu.data import stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.training.scan_engine import _fused_epoch_config

    implicit = generate_implicit_interactions(seed=42)
    train, test = stratified_split(implicit, test_p=0.2, seed=42,
                                   force_split=True)
    model = MatrixFactorizationModel(train=train, embedding_dim=10, lr=1e-1,
                                     loss='adaptive', seed=0)
    specs = model.optimizer_specs()
    cfg = _fused_epoch_config(model, specs, [True] * len(specs),
                              model.train_loader, None)
    assert cfg is not None, 'gate config must be inside the fused envelope'

    results = {'mapk': [], 'mrr': [], 'auc': []}
    for trial in range(args.trials):
        mapk_s, mrr_s, auc_s = run_trial(model, seed=trial, test=test)
        results['mapk'].append(mapk_s)
        results['mrr'].append(mrr_s)
        results['auc'].append(auc_s)
        print(f'fused trial {trial}: mapk={mapk_s:.5f} mrr={mrr_s:.5f} '
              f'auc={auc_s:.5f}', flush=True)

    gates = json.loads((Path(__file__).parent / 'gates.json').read_text())
    out = {'engine': 'fused', 'trials': args.trials, 'metrics': {}}
    ok = True
    for name, values in results.items():
        arr = np.asarray(values)
        gate = gates[name]['gate']
        passed = bool(arr.mean() > gate)
        ok &= passed
        out['metrics'][name] = {
            'mean': float(arr.mean()), 'std': float(arr.std()),
            'scan_gate': gate, 'scan_mean': gates[name]['mean'],
            'passes_scan_gate': passed,
        }
        print(f'{name}: fused mean={arr.mean():.5f} (scan mean='
              f'{gates[name]["mean"]:.5f}, gate>{gate:.5f}) '
              f'{"PASS" if passed else "FAIL"}')
    out['all_pass'] = bool(ok)
    (Path(__file__).parent / 'fused_quality.json').write_text(
        json.dumps(out, indent=2))
    print('wrote fused_quality.json; all_pass =', ok)


if __name__ == '__main__':
    main()
