"""Microbench: the bucketed sampler's cost vs chunk size at headline scale.

exp_engine_bisect.py measured the exact bucketed sampler at ~3.3 ms/step
(amortized) at the ML-10M headline config — 5x its count-pass HBM traffic
(4.0 GB/epoch ~= 0.44 ms/step).  Hypothesis: the fixed chunk=8192 turns the
count pass into ~600 SEQUENTIAL lax.map iterations whose per-iteration
overhead, not the gathers, prices the pass.  This times the real
``complement_sample_negatives_bucketed_impl`` on the real headline tables
at several chunk sizes, in one jit per size, host-readback synced.

Run: python benchmarks/exp_sampler_chunk.py
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='exp_sampler_chunk')

    import jax
    import jax.numpy as jnp
    from collie_tpu.data import stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions
    from collie_tpu.ops.device_sampling import (
        build_bucketed_complement_tables,
        complement_sample_negatives_bucketed_impl)

    inter = generate_implicit_interactions(
        num_users=72_000, num_items=10_000, num_interactions=10_000_000,
        num_negative_samples=10, affinity_bias=3.0, seed=7)
    train, _, _ = stratified_split(inter, val_p=0.05, test_p=0.05, seed=7,
                                   force_split=True)
    n = len(train)
    idx = jnp.arange(n, dtype=jnp.int32)
    steps = -(-n // 65_536)

    out = {}
    for chunk in (8192, 65_536, 262_144, 1_048_576):
        specs_np, counts_np, users_g_np, pos_of_np = \
            build_bucketed_complement_tables(train.mat, train.mat.row,
                                             chunk=chunk)
        if chunk == 8192:
            print('buckets:', [(int(r.shape[0]), int(t.shape[1]))
                               for r, t in specs_np], flush=True)
        specs = tuple((jnp.asarray(r), jnp.asarray(t)) for r, t in specs_np)
        counts = jnp.asarray(counts_np)
        users_g = jnp.asarray(users_g_np)
        pos_of = jnp.asarray(pos_of_np)
        fn = jax.jit(partial(
            complement_sample_negatives_bucketed_impl,
            num_items=10_000, num_negative_samples=10, dedup_rounds=1,
            chunk=chunk))
        args = (jax.random.PRNGKey(0), idx, pos_of, users_g, specs, counts)
        float(fn(*args).sum())  # compile
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args).sum())
            best = min(best, time.perf_counter() - t0)
        out[chunk] = {'epoch_ms': round(best * 1e3, 1),
                      'ms_per_step_amortized': round(best * 1e3 / steps, 3)}
        print(chunk, out[chunk], flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
