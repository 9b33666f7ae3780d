"""Decompose the headline step's above-floor cost: autodiff vs optimizer churn.

roofline.json says the ML-10M headline step runs at 54% of the memory-op
floor, with ~2.6 ms/step attributed in bulk to "forward/backward structure
above the hand-written floor".  This experiment splits that bulk into the
two candidate causes so the fix targets the right one:

  hand        exact engine math (bf16 selection einsum -> argmax -> f32
              re-score of pos+hardest through fused gathers -> composite
              adaptive-hinge loss) with a HAND-DERIVED backward and a dense
              Adam on the fused tables.  This is the achievable step.
  auto        identical forward, but the backward comes from jax.grad over
              the fused tables (the engine's value_and_grad structure).
              delta(auto - hand) = pure autodiff overhead.
  auto_slice  `auto` plus the engine's optimizer shape-churn: unfuse params
              and DENSE grads to named slices, Adam on embeddings / SGD on
              biases with named moment trees, fuse back.
              delta(auto_slice - auto) = optimizer/fuse churn.

All variants run ITERS steps inside one jit'd scan; sync is by host
readback (block_until_ready is a no-op on axon — CLAUDE.md).

Run: python benchmarks/exp_autodiff_gap.py  [--iters 256]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

U, I, D, B, K = 72_000, 10_000, 32, 65_536, 10


def build(variant, iters):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    utab = jnp.asarray(rng.standard_normal((U, D + 1)).astype(np.float32))
    itab = jnp.asarray(rng.standard_normal((I, D + 1)).astype(np.float32))
    uids = jnp.asarray(rng.integers(0, U, (iters, B)).astype(np.int32))
    pids = jnp.asarray(rng.integers(0, I, (iters, B)).astype(np.int32))

    lr, blr = 0.1, 0.01

    def forward(ut, it, u, p, negs):
        # engine's pairwise_scores_select: bf16 candidate block, f32 biases
        uf = jnp.take(ut, u, axis=0)                                # [B, D+1]
        nf = jnp.take(it.astype(jnp.bfloat16), negs, axis=0)        # [K,B,D+1]
        sel = jnp.einsum('bd,kbd->kb', uf[:, :-1].astype(jnp.bfloat16),
                         nf[..., :-1], preferred_element_type=jnp.float32) \
            + uf[:, -1][None, :] + nf[..., -1].astype(jnp.float32)
        hard = jnp.argmax(sel, axis=0)
        hids = jnp.take_along_axis(negs, hard[None, :], axis=0)[0]
        return uf, hids

    def scores_f32(ut, it, u, p, hids):
        uf = jnp.take(ut, u, axis=0)
        both = jnp.take(it, jnp.stack([p, hids]), axis=0)           # [2,B,D+1]
        dots = jnp.einsum('bd,rbd->rb', uf[:, :-1], both[..., :-1])
        preds = dots + uf[:, -1][None, :] + both[..., -1]
        return preds[0], preds[1]

    def loss_of(ut, it, u, p, hids):
        pos, neg = scores_f32(ut, it, u, p, hids)
        l = jnp.maximum(1.0 - (pos - neg), 0.0)
        return (l.sum() + jnp.square(l).sum()) / B

    def adam_dense(t, m, v, g, c):
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mh = m / (1 - 0.9 ** c)
        vh = v / (1 - 0.999 ** c)
        return t - lr * mh / (jnp.sqrt(vh) + 1e-8), m, v

    def step_hand(carry, xs):
        ut, it, mu, vu, mi, vi, c, k = carry
        u, p = xs
        k, sub = jax.random.split(k)
        negs = jax.random.randint(sub, (K, B), 0, I)
        uf, hids = forward(ut, it, u, p, negs)
        pe = jnp.take(it, p, axis=0)
        he = jnp.take(it, hids, axis=0)
        pos = (uf[:, :-1] * pe[:, :-1]).sum(-1) + uf[:, -1] + pe[:, -1]
        neg = (uf[:, :-1] * he[:, :-1]).sum(-1) + uf[:, -1] + he[:, -1]
        l = jnp.maximum(1.0 - (pos - neg), 0.0)
        g = jnp.where(l > 0, (1.0 + 2.0 * l) / B, 0.0)
        # d pos/d ue = pe, d neg/d ue = he; user-bias grad cancels exactly
        gu = jnp.concatenate([(he[:, :-1] - pe[:, :-1]) * g[:, None],
                              jnp.zeros((B, 1))], axis=1)
        gi_rows = jnp.concatenate(
            [jnp.concatenate([-uf[:, :-1] * g[:, None], -g[:, None]], 1),
             jnp.concatenate([uf[:, :-1] * g[:, None], g[:, None]], 1)])
        gU = jnp.zeros_like(ut).at[u].add(gu)
        gI = jnp.zeros_like(it).at[jnp.concatenate([p, hids])].add(gi_rows)
        c = c + 1
        ut, mu, vu = adam_dense(ut, mu, vu, gU, c)
        it, mi, vi = adam_dense(it, mi, vi, gI, c)
        return (ut, it, mu, vu, mi, vi, c, k), l.sum() / B

    def step_auto(carry, xs):
        ut, it, mu, vu, mi, vi, c, k = carry
        u, p = xs
        k, sub = jax.random.split(k)
        negs = jax.random.randint(sub, (K, B), 0, I)
        _, hids = forward(ut, it, u, p, negs)
        val, (gU, gI) = jax.value_and_grad(loss_of, argnums=(0, 1))(
            ut, it, u, p, hids)
        c = c + 1
        ut, mu, vu = adam_dense(ut, mu, vu, gU, c)
        it, mi, vi = adam_dense(it, mi, vi, gI, c)
        return (ut, it, mu, vu, mi, vi, c, k), val

    def step_auto_slice(carry, xs):
        ut, it, mu, vu, mi, vi, c, k = carry
        u, p = xs
        k, sub = jax.random.split(k)
        negs = jax.random.randint(sub, (K, B), 0, I)
        _, hids = forward(ut, it, u, p, negs)
        val, (gU, gI) = jax.value_and_grad(loss_of, argnums=(0, 1))(
            ut, it, u, p, hids)
        c = c + 1
        # engine churn: unfuse params+grads, per-spec updates on named
        # slices (Adam embeddings, SGD biases), fuse back
        ue, ub = ut[:, :-1], ut[:, -1]
        ie, ib = it[:, :-1], it[:, -1]
        gue, gub = gU[:, :-1], gU[:, -1]
        gie, gib = gI[:, :-1], gI[:, -1]
        mue, mve = mu[:, :-1], vu[:, :-1]
        mie, mvi = mi[:, :-1], vi[:, :-1]
        mue = 0.9 * mue + 0.1 * gue
        mve = 0.999 * mve + 0.001 * gue * gue
        ue = ue - lr * (mue / (1 - 0.9 ** c)) / (
            jnp.sqrt(mve / (1 - 0.999 ** c)) + 1e-8)
        mie = 0.9 * mie + 0.1 * gie
        mvi = 0.999 * mvi + 0.001 * gie * gie
        ie = ie - lr * (mie / (1 - 0.9 ** c)) / (
            jnp.sqrt(mvi / (1 - 0.999 ** c)) + 1e-8)
        ub = ub - blr * gub
        ib = ib - blr * gib
        ut = jnp.concatenate([ue, ub[:, None]], axis=1)
        it = jnp.concatenate([ie, ib[:, None]], axis=1)
        mu = jnp.concatenate([mue, mu[:, -1:]], axis=1)
        vu = jnp.concatenate([mve, vu[:, -1:]], axis=1)
        mi = jnp.concatenate([mie, mi[:, -1:]], axis=1)
        vi = jnp.concatenate([mvi, vi[:, -1:]], axis=1)
        return (ut, it, mu, vu, mi, vi, c, k), val

    step = {'hand': step_hand, 'auto': step_auto,
            'auto_slice': step_auto_slice}[variant]

    @jax.jit
    def run(key, ut, it, uids, pids):
        mu, vu = jnp.zeros_like(ut), jnp.zeros_like(ut)
        mi, vi = jnp.zeros_like(it), jnp.zeros_like(it)
        carry = (ut, it, mu, vu, mi, vi, jnp.float32(0), key)
        out, losses = jax.lax.scan(step, carry, (uids, pids))
        return out[0].sum() + losses.sum()

    key = jax.random.PRNGKey(0)
    return run, (key, utab, itab, uids, pids)


def time_variant(variant, iters):
    run, args = build(variant, iters)
    float(run(*args))  # compile + warm
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / iters


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='exp_autodiff_gap')

    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=256)
    args = parser.parse_args()

    out = {}
    for v in ('hand', 'auto', 'auto_slice'):
        out[v] = round(time_variant(v, args.iters), 3)
        print(f'{v}: {out[v]} ms/step', flush=True)
    out['autodiff_overhead_ms'] = round(out['auto'] - out['hand'], 3)
    out['slice_churn_ms'] = round(out['auto_slice'] - out['auto'], 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
