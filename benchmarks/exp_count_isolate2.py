"""Split the count pass cost into gather vs lane-reduction, with MXU control.

exp_count_isolate.py showed the cost tracks [slots x 128] VOLUME at ~3 GB/s
in every structure (flat/scan, gather/no-gather, compare/no-compare) — the
remaining suspects are the lane-axis reduction's VPU lowering and the
gather's own lowering at 128-wide rows.  Cases (N = 3.79M, P = 128):

  red_iota      sum(axis=-1) over an iota-built [N, P] f32 — reduction only
  red_matmul    [N, P] @ [P, 128] ones (bf16, MXU), slice col 0 — the same
                reduction as a matmul
  take_only     jnp.take rows -> materialized [N, P] output — gather only
  ctrl_d32      the calibrated-fast shape: [N, 32] table gather + row-dot —
                harness sanity control (should be ~120 GB/s-class)
  cmp_matmul    the REAL count: bf16 compare indicators reduced by MXU
                matmul against ones [P, 128], slice col 0

Run: python benchmarks/exp_count_isolate2.py
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


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='exp_count_isolate2')

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(np.sort(
        rng.integers(0, 10_000, (M, P)).astype(np.int32), 1))
    tablef = table.astype(jnp.float32)
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

    def red_iota(n):
        a = jax.lax.broadcasted_iota(jnp.float32, (N, P), 1) * n
        return jnp.sum(a, axis=-1)
    bench('red_iota', red_iota, jnp.float32(1.0))

    ones = jnp.ones((P, 128), jnp.bfloat16)
    def red_matmul(n):
        a = jax.lax.broadcasted_iota(jnp.bfloat16, (N, P), 1) * n
        return (a @ ones)[:, 0]
    bench('red_matmul', red_matmul, jnp.bfloat16(1.0))

    bench('take_only', lambda t, rc: jnp.take(t, rc, axis=0), table, rows)

    t32 = jnp.asarray(rng.standard_normal((M, 32)).astype(np.float32))
    bench('ctrl_d32',
          lambda t, rc: jnp.sum(jnp.take(t, rc, axis=0) * 2.0, axis=-1),
          t32, rows)

    onesb = jnp.ones((P, 128), jnp.bfloat16)
    def cmp_matmul(t, rc, rr):
        g = jnp.take(t, rc, axis=0)                       # [N, P] int32
        ind = (g[:, None, :] <= rr[:, :, None]).astype(jnp.bfloat16)
        return jnp.einsum('nwp,pk->nwk', ind, onesb,
                          preferred_element_type=jnp.float32)[:, :, 0]
    bench('cmp_matmul', cmp_matmul, table, rows, r)


if __name__ == '__main__':
    main()
