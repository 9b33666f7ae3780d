"""Measured-vs-floor accounting for the training step (VERDICT r3 item 7).

``microbench_opcost.py`` calibrated the per-op costs that price a training
step (scatter-add count dominates; gathers are bandwidth-bound; dense Adam
is cheap).  This script turns that calibration into a headroom claim: for
each benchmark config it times a FLOOR PROGRAM — a compiled scan whose body
contains exactly the irreducible memory ops of one scan-engine step and
nothing else — and divides it by the measured end-to-end step time.

Floor body (adaptive loss + pairwise_scores + sparse-hardest semantics,
fused ``[*, D+1]`` table layout — bias rides as the last column, so each
table is gathered once and scattered once; see
``scan_engine.py::COLLIE_TPU_FUSED_TABLES``):

  1 user-row gather [B, D+1],  item-row gathers [B pos + K*B neg +
  B hardest, D+1],  the loss elementwise math,  ONE uniform [K, B] draw
  (the sampler's irreducible entropy),  2 scatter-adds (user table B rows,
  item table 2B rows pos+hardest) and the dense Adam update over both
  tables + moments.

Two structure corrections (round 4, ablation in docs/BENCHMARKS.md): the
candidate block uses the ENGINE's ``[K, B, D+1]`` layout — the earlier
``[B, K, D+1]`` floor was layout-pathological on the VPU (11.1 vs 6.1
ms/step at the headline config) and overstated the floor — and the
no-grad selection einsum runs bf16 with f32 accumulation, matching the
engine's default ``COLLIE_TPU_BF16_SELECT`` path.

What the floor deliberately EXCLUDES (the headroom gap): the exact
sampler's comparison counts + dedup rounds, scheduler/early-stop
bookkeeping, loss reduction, and epoch-boundary work.

Measured step times come from the current benchmark artifacts
(``ml10m_scale_results.json``; gate config value passed/printed by
``bench.py``) — re-run those first for same-day numbers.

Writes benchmarks/roofline.json.  Run: python benchmarks/roofline.py
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 256

CONFIGS = {
    'gate': dict(U=943, I=1682, D=10, B=1024, K=10),
    'ml10m': dict(U=72_000, I=10_000, D=32, B=8192, K=10),
}


def floor_ms_per_step(cfg):
    import jax
    import jax.numpy as jnp

    U, I, D, B, K = cfg['U'], cfg['I'], cfg['D'], cfg['B'], cfg['K']
    rng = np.random.default_rng(0)
    # fused [*, D+1] layout: bias is the last table column
    utab = jnp.asarray(rng.standard_normal((U, D + 1)).astype(np.float32))
    itab = jnp.asarray(rng.standard_normal((I, D + 1)).astype(np.float32))
    # (mu, vu, mi, vi): two user-shaped then two item-shaped moment tables
    moments = tuple(jnp.zeros_like(t) for t in (utab, utab, itab, itab))
    uids = jnp.asarray(rng.integers(0, U, (ITERS, B)).astype(np.int32))
    pids = jnp.asarray(rng.integers(0, I, (ITERS, B)).astype(np.int32))

    def sync(x):
        return float(jax.jit(jnp.sum)(jax.tree_util.tree_leaves(x)[0]))

    @jax.jit
    def empty(key):
        def body(c, _):
            return c * 1.000000001, ()
        out, _ = jax.lax.scan(body, key.astype(jnp.float32).sum(), None,
                              length=ITERS)
        return out

    @jax.jit
    def floor(key, state, uids, pids):
        def body(carry, xs):
            (ut, it, mu, vu, mi, vi, k) = carry
            u, p = xs
            k, sub = jax.random.split(k)
            negs = jax.random.randint(sub, (K, B), 0, I)       # sampler entropy

            ue = jnp.take(ut, u, axis=0)                        # gather B rows
            pe = jnp.take(it, p, axis=0)                        # gather B rows
            # half-width no-grad selection gather (engine default) — the
            # engine's [K, B, D+1] layout, never flattened
            ne = jnp.take(it.astype(jnp.bfloat16), negs, axis=0)
            # bias is column D of each gathered row — sliced post-gather
            pos = (ue[:, :D] * pe[:, :D]).sum(-1) + ue[:, D] + pe[:, D]
            neg = jnp.einsum('bd,kbd->kb', ue[:, :D].astype(jnp.bfloat16),
                             ne[..., :D],
                             preferred_element_type=jnp.float32) \
                + ne[..., D].astype(jnp.float32)
            hard = jnp.argmax(neg, axis=0)
            hids = jnp.take_along_axis(negs, hard[None, :], axis=0)[0]
            he = jnp.take(it, hids, axis=0)                     # re-gather B
            # elementwise "gradient" rows with the loss shape
            viol = jnp.maximum(0.0, 1.0 - (pos - neg.max(0)))
            gu = (he - pe) * viol[:, None]
            gi = jnp.concatenate([-ue * viol[:, None], ue * viol[:, None]])
            rows = jnp.concatenate([p, hids])
            ut = ut.at[u].add(gu)                               # scatter 1
            it = it.at[rows].add(gi)                            # scatter 2
            # dense Adam-ish on both fused tables + moments
            mu = 0.9 * mu + 0.1 * jnp.sign(ut)
            vu = 0.999 * vu + 0.001 * ut * ut
            ut = ut - 0.01 * mu / (jnp.sqrt(vu) + 1e-8)
            mi = 0.9 * mi + 0.1 * jnp.sign(it)
            vi = 0.999 * vi + 0.001 * it * it
            it = it - 0.01 * mi / (jnp.sqrt(vi) + 1e-8)
            return (ut, it, mu, vu, mi, vi, k), ()

        init = (state[0], state[1], state[2], state[3],
                state[4], state[5], key)
        out, _ = jax.lax.scan(body, init, (uids, pids))
        return out[0]

    key = jax.random.PRNGKey(0)
    state = (utab, itab) + moments

    sync(empty(key))
    t0 = time.perf_counter()
    sync(empty(key))
    floor_dispatch = (time.perf_counter() - t0) * 1e3

    sync(floor(key, state, uids, pids))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        sync(floor(key, state, uids, pids))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return (best - floor_dispatch) / ITERS


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='roofline')

    parser = argparse.ArgumentParser()
    parser.add_argument('--gate-ex-per-sec', type=float, default=None,
                        help='measured gate-config throughput (bench.py '
                             'headline); omit to skip the gate row')
    args = parser.parse_args()

    here = Path(__file__).parent
    measured = {}
    ml10m_path = here / 'ml10m_scale_results.json'
    if ml10m_path.exists():
        with open(ml10m_path) as f:
            ml10m = json.load(f)
        measured['ml10m'] = ml10m['train_examples_per_sec_per_chip']
        # the floor must be priced at the batch size the artifact ran with
        CONFIGS['ml10m']['B'] = int(ml10m['config']['batch_size'])
    if args.gate_ex_per_sec:
        measured['gate'] = args.gate_ex_per_sec

    out = {}
    for name, cfg in CONFIGS.items():
        fl = floor_ms_per_step(cfg)
        row = {'config': cfg, 'floor_ms_per_step': round(fl, 3)}
        if name in measured:
            step_ms = cfg['B'] / measured[name] * 1e3
            row['measured_ms_per_step'] = round(step_ms, 3)
            row['measured_examples_per_sec'] = measured[name]
            row['floor_examples_per_sec'] = round(cfg['B'] / fl * 1e3)
            row['efficiency_vs_floor'] = round(fl / step_ms, 3)
        out[name] = row
        print(name, json.dumps(row), flush=True)

    with open(here / 'roofline.json', 'w') as f:
        json.dump(out, f, indent=2)


if __name__ == '__main__':
    main()
