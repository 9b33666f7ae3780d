"""Bisect the real engine's above-floor step cost at the headline config.

exp_autodiff_gap.py showed the idealized engine step (full math, autodiff,
slice-churn optimizer) runs at ~5.2 ms/step — essentially the 5.06 ms
memory-op floor — yet the measured engine step is 9.38 ms.  The earlier
decomposition ("autodiff residuals ~2.6 ms") is therefore wrong.  This
script times the ACTUAL engine epoch program at the headline config under
one toggled variable per run (subprocess per variant so env knobs bind at
program-build time) to locate the real cost.

Variants:
  base        current defaults (exact bucketed sampler, dedup 1, feistel)
  approx      approximate sampling (iid randint, no complement pass)
  nofeistel   COLLIE_TPU_SHUFFLE=random (sort-based permutation)
  noshuffle   loader shuffle=False (no permutation, no epoch gather)
  nosparse    COLLIE_TPU_SPARSE_ADAPTIVE=0 (dense K*B backward)

Each run: synthetic ML-10M train split, warm fit then steady fit (same
epoch count -> cached programs), prints ms/step and ex/s.

Run: python benchmarks/exp_engine_bisect.py            (orchestrates all)
     python benchmarks/exp_engine_bisect.py --variant base   (one, in-proc)
"""
import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

EPOCHS = 6
B = 65_536

VARIANTS = {
    'base': {},
    'approx': {'_approx_loader': '1'},
    'nofeistel': {'COLLIE_TPU_SHUFFLE': 'random'},
    'noshuffle': {'_noshuffle': '1'},
    'nosparse': {'COLLIE_TPU_SPARSE_ADAPTIVE': '0'},
}


def run_variant(name):
    # bind the variant's env knobs even when run in-proc via --variant (the
    # orchestrator injects them into the subprocess env; a direct run must
    # not silently execute the base config under the variant's label)
    os.environ.update(VARIANTS[name])
    import numpy as np
    from collie_tpu.data import (InteractionsDataLoader,
                                 ApproximateNegativeSamplingInteractionsDataLoader,
                                 stratified_split)
    from collie_tpu.data.synthetic import generate_implicit_interactions
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.training.trainer import CollieTrainer

    inter = generate_implicit_interactions(
        num_users=72_000, num_items=10_000, num_interactions=10_000_000,
        num_negative_samples=10, affinity_bias=3.0, seed=7)
    train, _, _ = stratified_split(inter, val_p=0.05, test_p=0.05, seed=7,
                                   force_split=True)
    cls = (ApproximateNegativeSamplingInteractionsDataLoader
           if os.environ.get('_approx_loader') else InteractionsDataLoader)
    shuffle = not os.environ.get('_noshuffle')
    loader = cls(interactions=train, batch_size=B, shuffle=shuffle, seed=7)
    model = MatrixFactorizationModel(train=loader, embedding_dim=32,
                                     lr=1e-1, loss='adaptive', seed=7)
    trainer = CollieTrainer(model, max_epochs=EPOCHS, verbosity=0, seed=7)
    trainer.fit(model)                                   # warm: compiles
    model.hparams['num_epochs_completed'] = 0
    model.hparams['seed'] = 7
    model._setup_model()
    trainer = CollieTrainer(model, max_epochs=EPOCHS, verbosity=0, seed=7)
    t0 = time.perf_counter()
    trainer.fit(model)
    steady = time.perf_counter() - t0
    steps = -(-len(train) // B) * EPOCHS
    print(json.dumps({'variant': name, 'ms_per_step': round(steady / steps * 1e3, 3),
                      'examples_per_sec': round(len(train) * EPOCHS / steady)}),
          flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--variant', default=None)
    args = parser.parse_args()
    if args.variant:
        try:
            from benchmarks._watchdog import device_watchdog
        except ImportError:
            from _watchdog import device_watchdog
        device_watchdog(label=f'exp_engine_bisect:{args.variant}')
        run_variant(args.variant)
        return
    for name, env in VARIANTS.items():
        e = dict(os.environ)
        e.update(env)
        try:
            r = subprocess.run([sys.executable, __file__, '--variant', name],
                               env=e, capture_output=True, text=True,
                               timeout=1800)
        except subprocess.TimeoutExpired:
            print(json.dumps({'variant': name, 'error': 'timeout'}), flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith('{'):
                print(line, flush=True)
        if r.returncode != 0:
            print(json.dumps({'variant': name, 'error': r.stderr[-500:]}),
                  flush=True)


if __name__ == '__main__':
    main()
