"""Isolate WHAT is slow in the bucketed count pass: gather, compare, or scan.

exp_count_variants.py showed every compare layout/dtype runs ~460 ms over
the headline's biggest bucket — so the compare structure is not the cost.
Candidates left: (a) the [chunk, P] row gather itself, (b) the scan
chunking, (c) the [chunk, W, P] compare intermediate.  Cases:

  gather_scan      scan over chunks, body = rows gather + lane-sum (no
                   compare, no W axis) — prices the gather alone
  gather_flat      ONE gather of all slots, lane-sum (no scan)
  compare_flat     ONE gather + full broadcast-compare-count (no scan)
  compare_noscan_w s_flat but compare built as W separate [N, P] passes
  onerow_scan      scan, body reads the SAME row block every time
                   (loop-invariant-proof: gather replaced by static slice)

Run: python benchmarks/exp_count_isolate.py
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
ITERS = N // CHUNK


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='exp_count_isolate')

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(np.sort(
        rng.integers(0, 10_000, (M, P)).astype(np.int32), 1))
    rows_s = jnp.asarray(rng.integers(0, M, (ITERS, CHUNK)).astype(np.int32))
    r_s = jnp.asarray(rng.integers(0, 10_000, (ITERS, CHUNK, W)
                                   ).astype(np.int32))
    rows_f = rows_s.reshape(-1)
    r_f = r_s.reshape(-1, W)

    def bench(name, fn, *args):
        # build the jitted sum-wrapper ONCE: constructing it inside the timed
        # loop retraces/re-lowers per iteration (advisor round-4 finding)
        g = jax.jit(lambda *a: fn(*a).sum())
        float(g(*args))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({name: round(best * 1e3, 1)}), flush=True)

    def gather_scan(table, rows):
        def step(_, rc):
            return None, jnp.sum(table[rc], axis=-1, dtype=jnp.int32)
        _, out = jax.lax.scan(step, None, rows)
        return out
    bench('gather_scan', gather_scan, table, rows_s)

    bench('gather_flat',
          lambda t, rc: jnp.sum(t[rc], axis=-1, dtype=jnp.int32),
          table, rows_f)

    bench('compare_flat',
          lambda t, rc, rr: jnp.sum(t[rc][:, None, :] <= rr[:, :, None],
                                    axis=-1, dtype=jnp.int32),
          table, rows_f, r_f)

    def compare_w(t, rc, rr):
        g = t[rc]
        return sum(jnp.sum(g <= rr[:, w:w + 1], axis=-1, dtype=jnp.int32)
                   for w in range(W))
    bench('compare_noscan_w', compare_w, table, rows_f, r_f)

    def onerow_scan(table, rows):
        block = table[:CHUNK]            # static slice, no gather
        def step(_, rc):
            return None, jnp.sum(block + rc[:, None], axis=-1,
                                 dtype=jnp.int32)
        _, out = jax.lax.scan(step, None, rows)
        return out
    bench('onerow_scan', onerow_scan, table, rows_s)


if __name__ == '__main__':
    main()
