"""Microbenchmark: rank-count metric kernel vs the round-1 argsort kernel.

Times ``metrics_from_positive_ranks`` (comparison-count ranks, round 2)
against the round-1 formulation (full per-user argsort + scatter) on the
ambient backend, at ML-100K scale and at a 10k-item catalog.

Run on TPU:  python benchmarks/bench_eval_kernel.py
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from collie_tpu.ops.metrics import metrics_from_positive_ranks


@partial(jax.jit, static_argnames=('k',))
def _argsort_metrics(scores, pos_items, pos_mask, k):
    """Round-1 kernel: full ascending argsort + rank scatter per user."""
    num_items = scores.shape[1]
    order = jnp.argsort(scores, axis=1)
    asc_ranks = jax.vmap(lambda o: jnp.zeros(o.shape, jnp.int32).at[o].set(
        jnp.arange(1, o.shape[0] + 1, dtype=jnp.int32)))(order)
    pos_asc = jnp.take_along_axis(asc_ranks, pos_items, axis=1).astype(jnp.float32)
    pos_desc = num_items + 1 - pos_asc
    big = jnp.float32(num_items + 1)
    pos_desc_masked = jnp.where(pos_mask > 0, pos_desc, big)
    degree = pos_mask.sum(axis=1)
    num_neg = num_items - degree
    rank_sum = (pos_asc * pos_mask).sum(axis=1)
    denom = degree * num_neg
    auc_vec = jnp.where(denom > 0,
                        (rank_sum - degree * (degree + 1) / 2) / jnp.maximum(denom, 1.0),
                        0.5)
    best = pos_desc_masked.min(axis=1)
    rr_vec = jnp.where(degree > 0, 1.0 / best, 0.0)
    sorted_desc = jnp.sort(pos_desc_masked, axis=1)
    j = jnp.arange(1, sorted_desc.shape[1] + 1, dtype=jnp.float32)[None, :]
    contrib = jnp.where(sorted_desc <= k, j / sorted_desc, 0.0)
    ap_vec = jnp.where(degree > 0,
                       contrib.sum(axis=1) / jnp.minimum(jnp.float32(k),
                                                         jnp.maximum(degree, 1.0)),
                       0.0)
    return jnp.stack([ap_vec, rr_vec, auc_vec])


def _time(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench(B, N, D, k=10, seed=0):
    rng = np.random.default_rng(seed)
    scores = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, N, (B, D)).astype(np.int32))
    mask = jnp.asarray((rng.random((B, D)) < 0.8).astype(np.float32))

    t_new = _time(lambda s, p, m: metrics_from_positive_ranks(s, p, m, k),
                  (scores, pos, mask))
    t_old = _time(lambda s, p, m: _argsort_metrics(s, p, m, k),
                  (scores, pos, mask))
    # agreement check (tie-free random scores)
    a = np.asarray(metrics_from_positive_ranks(scores, pos, mask, k))
    b = np.asarray(_argsort_metrics(scores, pos, mask, k))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    return {
        'batch_users': B, 'num_items': N, 'max_degree': D,
        'rank_count_ms': round(t_new * 1e3, 3),
        'argsort_ms': round(t_old * 1e3, 3),
        'speedup': round(t_old / t_new, 2),
        'rank_count_items_per_sec': round(B * N / t_new, 1),
    }


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:          # run as `python benchmarks/x.py`
        from _watchdog import device_watchdog
    device_watchdog(label='bench_eval_kernel')
    results = {
        'backend': jax.default_backend(),
        'ml100k_shape': bench(B=256, N=1682, D=120),
        'catalog_10k': bench(B=256, N=10_000, D=120),
        'catalog_100k': bench(B=64, N=100_000, D=120),
    }
    print(json.dumps(results, indent=2))
    with open('benchmarks/eval_kernel_results.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
