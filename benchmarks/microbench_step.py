"""Ablate the real per-step cost of the ML-10M-scale scan path.

The first microbench round (microbench_gather.py) timed gather/scatter with
ids CONSTANT across scan iterations — XLA hoisted the per-index
preprocessing out of the loop and reported microseconds.  Here every
iteration gets fresh ids (scanned xs), matching the real epoch, and the
full training step is ablated piece by piece:

  gather_only      forward embedding lookups (user + pos + K negs)
  fwd_loss         + scores and adaptive-hinge loss value
  fwd_bwd          + value_and_grad (scatter-add backward)
  fwd_bwd_opt      + optax-exact dual-optimizer update  (the real step)

Run on the real TPU: JAX_PLATFORMS=axon (ambient) — one v5e chip.

CAVEAT (measured after these benches were first run): a dispatch+readback
round trip over the tunnel costs ~24 ms regardless of payload, so at
ITERS=30 every number below carries a +0.8 ms/step floor bias. Absolute
per-op costs live in microbench_opcost.py (512 in-jit iterations, floor
subtracted); this file remains useful for the RELATIVE ablation shape.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

U, I, D, B, K = 72_000, 10_000, 32, 8192, 10
ITERS = 30


def report(name, ms):
    print(f"{name:24s} {ms:8.3f} ms/step", flush=True)


def _sync(out):
    """Host readback of a device-side scalar reduce — the only real sync on
    the axon backend (block_until_ready returns at dispatch; CLAUDE.md)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jax.jit(jnp.sum)(leaf))


def timeit(name, jitted, *args, iters=ITERS):
    try:
        _sync(jitted(*args))
        t0 = time.perf_counter()
        _sync(jitted(*args))
        report(name, (time.perf_counter() - t0) / iters * 1e3)
    except Exception as e:
        print(f"{name:24s} FAIL {str(e)[-180:]}", flush=True)


def scan_over_ids(step):
    """scan over per-iteration id blocks: nothing hoistable."""
    @jax.jit
    def run(tables, users, pos, negs):
        def body(c, xs):
            return step(c, *xs), ()
        out, _ = jax.lax.scan(body, tables, (users, pos, negs))
        return out
    return run


def main():
    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    ie = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    ib = jnp.zeros((I,), jnp.float32)
    users = jnp.asarray(rng.integers(0, U, (ITERS, B)).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, I, (ITERS, B)).astype(np.int32))
    negs = jnp.asarray(rng.integers(0, I, (ITERS, B, K)).astype(np.int32))

    # ---- gathers only ------------------------------------------------------
    def gather_only(c, u, p, n):
        ue, ie, ib = c
        s = (jnp.take(ue, u, axis=0).sum() + jnp.take(ie, p, axis=0).sum()
             + jnp.take(ie, n.reshape(-1), axis=0).sum())
        return (ue + 1e-12 * s, ie, ib)
    timeit('gather_only', scan_over_ids(gather_only), (ue, ie, ib),
           users, pos, negs)

    # ---- + forward loss ----------------------------------------------------
    def fwd(params, u, p, n):
        ue, ie, ib = params
        uu = jnp.take(ue, u, axis=0)                        # [B, D]
        pv = jnp.take(ie, p, axis=0)                        # [B, D]
        nv = jnp.take(ie, n.reshape(-1), axis=0).reshape(B, K, D)
        ps = (uu * pv).sum(-1) + jnp.take(ib, p)
        ns = jnp.einsum('bd,bkd->bk', uu, nv) + jnp.take(ib, n)
        hardest = ns.max(axis=1)
        l = jnp.maximum(1.0 - (ps - hardest), 0.0)
        return (l.sum() + (l * l).sum()) / B

    def fwd_loss(c, u, p, n):
        ue, ie, ib = c
        L = fwd((ue, ie, ib), u, p, n)
        return (ue + 1e-12 * L, ie, ib)
    timeit('fwd_loss', scan_over_ids(fwd_loss), (ue, ie, ib),
           users, pos, negs)

    # ---- + backward --------------------------------------------------------
    def fwd_bwd(c, u, p, n):
        grads = jax.grad(fwd)(c, u, p, n)
        return tuple(x - 1e-9 * g for x, g in zip(c, grads))
    timeit('fwd_bwd', scan_over_ids(fwd_bwd), (ue, ie, ib),
           users, pos, negs)

    # ---- + optax dual optimizer (the real step) ----------------------------
    import optax
    tx_emb = optax.adam(1e-1)
    tx_bias = optax.sgd(1e-2)

    @jax.jit
    def full(carry, users, pos, negs):
        def body(c, xs):
            (ue, ie, ib), s_emb, s_bias = c
            u, p, n = xs
            L, grads = jax.value_and_grad(
                lambda q: fwd((q[0], q[1], q[2]), u, p, n))((ue, ie, ib))
            upd_e, s_emb = tx_emb.update((grads[0], grads[1]), s_emb)
            upd_b, s_bias = tx_bias.update((grads[2],), s_bias)
            return (((ue + upd_e[0], ie + upd_e[1], ib + upd_b[0]),
                     s_emb, s_bias), L)
        out, losses = jax.lax.scan(body, carry, (users, pos, negs))
        return out, losses
    carry0 = ((ue, ie, ib), tx_emb.init((ue, ie)), tx_bias.init((ib,)))
    timeit('fwd_bwd_opt', full, carry0, users, pos, negs)

    # ---- the on-device negative sampler's share ---------------------------
    @jax.jit
    def sample_epoch(key):
        return jax.random.randint(key, (ITERS * B, K), 0, I, dtype=jnp.int32)
    k = jax.random.PRNGKey(0)
    timeit('sample_approx_epoch', sample_epoch, k)

    @jax.jit
    def permute(key):
        return jax.random.permutation(key, ITERS * B)
    timeit('permutation_epoch', permute, k)


if __name__ == '__main__':
    main()
