"""Microbenchmarks framing the at-scale fused-epoch kernel design.

Measures, at the ML-10M shapes (72k-user / 10k-item tables, dim 32,
B=8192, K=10), the per-step cost of every gather/scatter strategy the
kernel could use, so the design is chosen on measured numbers:

  xla_gather / xla_scatter   what the scan engine pays today (jnp.take /
                             .at[].add) — the baseline to beat
  onehot_full                MXU one-hot over the full table (the toy-scale
                             kernel's approach) — expected to blow up at 72k
  onehot_binned              MXU one-hot over 16 user-id bins after a
                             stable sort — the candidate at-scale approach
  pallas_binned              the same binned one-hot inside one Pallas call
                             (VMEM-resident transposed table)

Each timing runs ITERS repetitions inside one jit (the axon tunnel costs
~1-2 ms per dispatch, so per-step costs must be amortized on-device).
Results print as they land (remote compiles are 30-90 s each).

CAVEAT (measured after these benches were first run): a dispatch+readback
round trip over the tunnel costs ~24 ms regardless of payload — numbers at
iters<=50 carry a ~0.5 ms/step floor bias. microbench_opcost.py is the
floor-corrected calibration; the verdicts here (one-hot scatter loses to
XLA scatter at 72k users; full one-hot blows up) hold with the bias removed.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U, I, D, B, K = 72_000, 10_000, 32, 8192, 10
N_BINS = 16
UB = -(-U // N_BINS // 128) * 128          # bin width, lane-aligned
UPAD = N_BINS * UB
C_PAD = 768                                 # static per-bin lane cap


def report(name, ms):
    print(f"{name:32s} {ms:8.3f} ms/step", flush=True)


def _sync(out):
    """Host readback of a device-side scalar reduce — the only real sync on
    the axon backend (block_until_ready returns at dispatch; CLAUDE.md)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jax.jit(jnp.sum)(leaf))


def timeit(name, jitted, *args, iters):
    try:
        _sync(jitted(*args))
        t0 = time.perf_counter()
        _sync(jitted(*args))
        report(name, (time.perf_counter() - t0) / iters * 1e3)
    except Exception as e:
        print(f"{name:32s} FAIL {str(e)[-180:]}", flush=True)


def scanit(step, iters):
    @jax.jit
    def run(tab, ids, grads):
        def body(t, _):
            return step(t, ids, grads), ()
        out, _ = jax.lax.scan(body, tab, None, length=iters)
        return out
    return run


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, U, B).astype(np.int32))
    grads = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    timeit('xla_gather_user_8k', scanit(
        lambda t, i, g: t + 1e-9 * jnp.sum(jnp.take(t, i, axis=0)), 50),
        tab, ids, grads, iters=50)
    timeit('xla_scatter_user_8k', scanit(
        lambda t, i, g: t.at[i].add(g), 50), tab, ids, grads, iters=50)

    iids = jnp.asarray(rng.integers(0, I, (K + 1) * B).astype(np.int32))
    itab = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    igr = jnp.asarray(rng.standard_normal(((K + 1) * B, D)).astype(np.float32))
    timeit('xla_gather_item_90k', scanit(
        lambda t, i, g: t + 1e-9 * jnp.sum(jnp.take(t, i, axis=0)), 50),
        itab, iids, igr, iters=50)
    timeit('xla_scatter_item_90k', scanit(
        lambda t, i, g: t.at[i].add(g), 50), itab, iids, igr, iters=50)

    # dense Adam over both tables (the per-step optimizer cost)
    def adam(t, i, g):
        mu = t * 0.9
        nu = t * t * 0.999
        return t - 0.01 * (mu / 0.9) / (jnp.sqrt(nu / 0.999) + 1e-8)
    timeit('xla_dense_adam_user', scanit(adam, 50), tab, ids, grads, iters=50)

    # full one-hot scatter over 72k users (toy kernel's approach, at scale)
    def onehot_full(t, i, g):
        oh = (i[:, None] == jnp.arange(U)[None, :]).astype(jnp.float32)
        return t + jax.lax.dot_general(
            oh, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    timeit('xla_onehot_full_scatter_72k', scanit(onehot_full, 3),
           tab, ids, grads, iters=3)

    # binned one-hot scatter: stable-sort by user-id bin, 16 bins, static cap
    order = jnp.argsort(ids // UB, stable=True)
    sids, sgrads = ids[order], grads[order]
    counts = jnp.bincount(ids // UB, length=N_BINS)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts).astype(jnp.int32)])

    def onehot_binned(t, si, sg):
        def upd(j, acc):
            o = offs[j]
            w_ids = jax.lax.dynamic_slice(si, (o,), (C_PAD,))
            w_g = jax.lax.dynamic_slice(sg, (o, 0), (C_PAD, D))
            valid = (jnp.arange(C_PAD) + o) < offs[j + 1]
            local = w_ids - j * UB
            oh = (local[:, None] == jnp.arange(UB)[None, :])
            oh = oh.astype(jnp.float32) * valid[:, None].astype(jnp.float32)
            blk = jax.lax.dot_general(
                oh, w_g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (j * UB, 0), (UB, D)) + blk,
                (j * UB, 0))
        out = jax.lax.fori_loop(0, N_BINS, upd,
                                jnp.zeros((UPAD, D), jnp.float32))
        return t + out[:U]
    timeit('xla_onehot_binned_scatter', scanit(onehot_binned, 20),
           tab, sids, sgrads, iters=20)

    # the per-step argsort itself (prep cost the binned design adds)
    timeit('xla_argsort_8k', scanit(
        lambda t, i, g: t + 1e-9 * jnp.sum(jnp.argsort(i // UB, stable=True)),
        50), tab, ids, grads, iters=50)
    timeit('xla_argsort_90k', scanit(
        lambda t, i, g: t + 1e-9 * jnp.sum(jnp.argsort(i // 640, stable=True)),
        50), itab, iids, igr, iters=50)

    # Pallas: binned one-hot gather+scatter, transposed VMEM-resident table
    PITERS = 50

    def pk(sids_ref, offs_ref, g_ref, tab_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = tab_ref[:]

        def bin_body(j, acc):
            o = offs_ref[0, j]
            w_ids = sids_ref[0, pl.ds(o, C_PAD)]
            sub = jax.lax.broadcasted_iota(jnp.int32, (C_PAD, UB), 1)
            pos = jax.lax.broadcasted_iota(jnp.int32, (C_PAD, UB), 0) + o
            local = w_ids - j * UB
            oh = jnp.where((sub == local[:, None])
                           & (pos < offs_ref[0, j + 1]), 1.0, 0.0)
            # gather: [D, UB] @ [UB, C_PAD]^T -> [D, C_PAD]
            rows = jax.lax.dot_general(
                out_ref[:, pl.ds(j * UB, UB)], oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            # scatter: [D, C_PAD] @ [C_PAD, UB] -> [D, UB]
            w_g = g_ref[:, pl.ds(o, C_PAD)]
            blk = jax.lax.dot_general(
                w_g, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            out_ref[:, pl.ds(j * UB, UB)] = \
                out_ref[:, pl.ds(j * UB, UB)] + blk
            return acc + jnp.sum(rows[:8, :128])
        jax.lax.fori_loop(0, N_BINS, bin_body, jnp.float32(0.))

    tab_t = jnp.zeros((D, UPAD), jnp.float32).at[:, :U].set(
        jnp.asarray(np.asarray(tab).T))
    sg_t = jnp.asarray(np.asarray(sgrads).T)                   # [D, B]

    @jax.jit
    def pallas_binned(tp, si, of, g):
        return pl.pallas_call(
            pk, grid=(PITERS,),
            in_specs=[
                pl.BlockSpec((1, B), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_BINS + 1), lambda s: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((D, B), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, UPAD), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((D, UPAD), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D, UPAD), jnp.float32),
        )(si.reshape(1, B), of.reshape(1, N_BINS + 1), g, tp)

    timeit('pallas_binned_gather+scatter', pallas_binned,
           tab_t, sids, offs, sg_t, iters=PITERS)


if __name__ == '__main__':
    main()
