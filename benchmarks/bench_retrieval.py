"""Retrieval kernel wall-clock, amortized inside one jit (round-4 redo).

The round-2/3 numbers for the fused Mosaic retrieval kernel were single-call
wall-clocks through the tunnel — a 0.14-53 ms band that is dispatch noise,
not kernel time (the dispatch + readback floor alone is ~24 ms).  This
benchmark uses the ``microbench_opcost.py`` technique instead: ``ITERS``
kernel calls inside ONE ``lax.scan`` (per-iteration user blocks from the
scan input, so nothing is loop-invariant), host scalar readback as the only
sync, dispatch floor measured by an empty scan of the same length and
subtracted.

Compared paths at the doc config (500k-item catalog, B=64, D=64, k=10):

  pallas      ops/pallas/retrieval_kernel.mf_topk_retrieve (fused tile
              score + on-chip top-k; never materializes [B, num_items])
  xla_tiled   retrieval.py's blockwise scan path (score a 4096-item tile,
              merge running top-k; never materializes [B, num_items])
  xla_topk    materialize [B, num_items] scores, lax.top_k
  xla_sort    materialize + full descending argsort (the round-1 baseline)

Writes benchmarks/retrieval_results.json.  Run: python benchmarks/bench_retrieval.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

CATALOGS = (500_000, 2_000_000)   # second point: does the XLA-vs-pallas
                                  # ordering hold as the block grows 4x?
B = 64
D = 64
K = 10
ITERS = 64
SORT_ITERS = 8          # the full-sort baseline is ~50x slower per call


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='retrieval')

    import jax
    import jax.numpy as jnp

    from collie_tpu.ops.pallas.retrieval_kernel import mf_topk_retrieve

    all_results = {}
    for num_items in CATALOGS:
        all_results[f'catalog_{num_items}'] = run_catalog(num_items)

    out = Path(__file__).parent / 'retrieval_results.json'
    with open(out, 'w') as f:
        json.dump(all_results, f, indent=2)
    print(json.dumps(all_results))


def run_catalog(NUM_ITEMS):
    import jax
    import jax.numpy as jnp

    from collie_tpu.ops.pallas.retrieval_kernel import mf_topk_retrieve

    rng = np.random.default_rng(0)
    item_tab = jnp.asarray(rng.standard_normal((NUM_ITEMS, D)).astype(np.float32))
    item_bias = jnp.asarray(rng.standard_normal(NUM_ITEMS).astype(np.float32))

    def sync(x):
        return float(jax.jit(jnp.sum)(jax.tree_util.tree_leaves(x)[0]))

    def timed(jitted, *args, iters, repeats=3):
        """Per-iteration ms, dispatch floor subtracted, best of ``repeats``."""
        sync(jitted(*args))             # compile
        best = float('inf')
        for _ in range(repeats):
            t0 = time.perf_counter()
            sync(jitted(*args))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / iters       # floor handled by caller

    @jax.jit
    def empty(u_blocks):
        def body(acc, u):
            return acc + 1e-12 * jnp.sum(u), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), u_blocks)
        return out

    # tables enter as ARGUMENTS: a closed-over table becomes an HLO
    # constant and the remote compile uploads the whole gigabyte (HTTP 413
    # at 2M items)
    @jax.jit
    def pallas_path(it, ib, u_blocks, u_biases):
        def body(acc, xs):
            u, ub = xs
            ids, scores = mf_topk_retrieve(u, ub, it, ib, k=K)
            return acc + 1e-12 * (jnp.sum(scores) + jnp.sum(ids)), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), (u_blocks, u_biases))
        return out

    TILE = 4096

    @jax.jit
    def xla_tiled_path(it, ib, u_blocks, u_biases):
        from collie_tpu.retrieval import _merge_topk
        n_tiles = -(-NUM_ITEMS // TILE)
        pad = n_tiles * TILE - NUM_ITEMS
        it_p = jnp.pad(it, ((0, pad), (0, 0)))
        ib_p = jnp.pad(ib, (0, pad), constant_values=-jnp.inf)

        def body(acc, xs):
            u, ub = xs
            init = (jnp.full((B, K), -jnp.inf), jnp.zeros((B, K), jnp.int32))

            def tile_step(carry, t):
                ts, ti = carry
                rows = jax.lax.dynamic_slice_in_dim(it_p, t * TILE, TILE)
                bias = jax.lax.dynamic_slice_in_dim(ib_p, t * TILE, TILE)
                scores = jnp.dot(u, rows.T,
                                 precision=jax.lax.Precision.HIGHEST) \
                    + bias[None, :] + ub[:, None]
                ids = jnp.broadcast_to((t * TILE + jnp.arange(TILE))[None, :],
                                       (B, TILE))
                return _merge_topk(ts, ti, scores, ids, K), None

            (ts, ti), _ = jax.lax.scan(tile_step, init,
                                       jnp.arange(n_tiles, dtype=jnp.int32))
            return acc + 1e-12 * (jnp.sum(ts) + jnp.sum(ti)), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), (u_blocks, u_biases))
        return out

    @jax.jit
    def xla_topk_path(it, ib, u_blocks, u_biases):
        def body(acc, xs):
            u, ub = xs
            # HIGHEST precision: same scoring fidelity as the kernel (a
            # default-precision matmul rounds operands to bf16 and can flip
            # the top-k boundary)
            scores = jnp.dot(u, it.T,
                             precision=jax.lax.Precision.HIGHEST) \
                + ib[None, :] + ub[:, None]
            top_scores, top_ids = jax.lax.top_k(scores, K)
            return acc + 1e-12 * (jnp.sum(top_scores) + jnp.sum(top_ids)), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), (u_blocks, u_biases))
        return out

    @jax.jit
    def xla_sort_path(it, ib, u_blocks, u_biases):
        def body(acc, xs):
            u, ub = xs
            scores = jnp.dot(u, it.T,
                             precision=jax.lax.Precision.HIGHEST) \
                + ib[None, :] + ub[:, None]
            order = jnp.argsort(-scores, axis=1)[:, :K]
            top = jnp.take_along_axis(scores, order, axis=1)
            return acc + 1e-12 * (jnp.sum(top) + jnp.sum(order)), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), (u_blocks, u_biases))
        return out

    u_blocks = jnp.asarray(rng.standard_normal((ITERS, B, D)).astype(np.float32))
    u_biases = jnp.asarray(rng.standard_normal((ITERS, B)).astype(np.float32))

    floor_ms = timed(empty, u_blocks, iters=1)
    print(f'dispatch floor: {floor_ms:.1f} ms', flush=True)

    results = {'config': {'num_items': NUM_ITEMS, 'batch': B, 'dim': D,
                          'k': K, 'iters': ITERS},
               'dispatch_floor_ms': round(floor_ms, 2)}
    paths = [('pallas', pallas_path, ITERS),
             ('xla_tiled', xla_tiled_path, ITERS),
             ('xla_topk', xla_topk_path, ITERS)]
    if NUM_ITEMS <= 1_000_000:        # the full sort is minutes at 4M items
        paths.append(('xla_sort', xla_sort_path, SORT_ITERS))
    for label, fn, iters in paths:
        ub, uw = u_blocks[:iters], u_biases[:iters]
        total_ms = timed(fn, item_tab, item_bias, ub, uw, iters=1)
        per_call = (total_ms - floor_ms) / iters
        results[label + '_ms_per_call'] = round(per_call, 3)
        print(f'{label:10s} {per_call:8.3f} ms/call '
              f'({iters} calls amortized)', flush=True)

    # correctness: kernel output == exact dense scoring on one batch
    # (reference computed HOST-side in f64 — a device matmul at default MXU
    # precision rounds operands to bf16 and its ranking is NOT the truth)
    ids, scores = mf_topk_retrieve(u_blocks[0], u_biases[0], item_tab,
                                   item_bias, k=K)
    dense = (np.asarray(u_blocks[0], dtype=np.float64)
             @ np.asarray(item_tab, dtype=np.float64).T
             + np.asarray(item_bias, dtype=np.float64)[None, :]
             + np.asarray(u_biases[0], dtype=np.float64)[:, None])
    ref_ids = np.argsort(-dense, axis=1)[:, :K]
    assert np.array_equal(np.asarray(ids), ref_ids), 'top-k ids diverge'
    np.testing.assert_allclose(
        np.asarray(scores), np.take_along_axis(dense, ref_ids, axis=1),
        rtol=1e-5)
    results['exact_vs_dense'] = 'ids equal, scores within 1e-5'
    return results


if __name__ == '__main__':
    main()
