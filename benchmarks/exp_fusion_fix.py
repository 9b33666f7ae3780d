"""Verify the gather->reduce fusion pathology fix.

exp_count_isolate2.py: a [3.79M, 128] row gather costs 34 ms and the lane
reduction costs 34 ms, but the FUSED gather+reduce costs 674 ms — XLA fuses
the reduction into the gather and emits a ~20x-slower loop.  Candidate
fixes, timed on the real count-pass shapes (N=3.79M, P=128, W=12):

  fused           current: t[rc] -> broadcast compare -> sum   (baseline)
  barrier         optimization_barrier between gather and compare
  matmul_reduce   compare indicators reduced via bf16 MXU matmul
  barrier_scan    barrier variant inside the real chunked lax.map shape

Run: python benchmarks/exp_fusion_fix.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

N = 3_792_896
P = 128
M = 60_000
W = 12
CHUNK = 8192


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='exp_fusion_fix')

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(np.sort(
        rng.integers(0, 10_000, (M, P)).astype(np.int32), 1))
    rows = jnp.asarray(rng.integers(0, M, (N,)).astype(np.int32))
    r = jnp.asarray(rng.integers(0, 10_000, (N, W)).astype(np.int32))

    def bench(name, fn, *args):
        g = jax.jit(lambda *a: fn(*a).sum())
        float(g(*args))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({name: round(best * 1e3, 1)}), flush=True)

    def fused(t, rc, rr):
        g = t[rc]
        return jnp.sum(g[:, None, :] <= rr[:, :, None], axis=-1,
                       dtype=jnp.int32)
    bench('fused', fused, table, rows, r)

    def barrier(t, rc, rr):
        g = jax.lax.optimization_barrier(t[rc])
        return jnp.sum(g[:, None, :] <= rr[:, :, None], axis=-1,
                       dtype=jnp.int32)
    bench('barrier', barrier, table, rows, r)

    onesb = jnp.ones((P, 128), jnp.bfloat16)
    def matmul_reduce(t, rc, rr):
        g = jnp.take(t, rc, axis=0)
        ind = (g[:, None, :] <= rr[:, :, None]).astype(jnp.bfloat16)
        return jnp.einsum('nwp,pk->nwk', ind, onesb,
                          preferred_element_type=jnp.float32)[:, :, 0]
    bench('matmul_reduce', matmul_reduce, table, rows, r)

    rows_s = rows.reshape(-1, CHUNK)
    r_s = r.reshape(-1, CHUNK, W)
    def barrier_scan(t, rows_s, r_s):
        def one_chunk(args):
            rc, rr = args
            g = jax.lax.optimization_barrier(t[rc])
            return jnp.sum(g[:, None, :] <= rr[:, :, None], axis=-1,
                           dtype=jnp.int32)
        return jax.lax.map(one_chunk, (rows_s, r_s))
    bench('barrier_scan', barrier_scan, table, rows_s, r_s)


if __name__ == '__main__':
    main()
