"""Calibrated per-op costs inside a compiled scan on the v5e.

THE measurement that sets kernel strategy (see CLAUDE.md "Measured
findings"): a dispatch + scalar-readback round trip over the axon tunnel
costs ~24 ms regardless of payload, so every op here runs 512 iterations
inside ONE jit and the floor is subtracted. Headline results (f32, dim-32
tables, 72k users / 10.7k items):

  row gathers        bandwidth-bound (~120 GB/s): 8k rows 17 us, 90k 190 us
  scatter-adds       0.3-0.6 ms NEARLY INDEPENDENT of row count
  take_along [B,I]   1.2 ms — never score-then-select from a dense block
  dense Adam         45 us for both tables

Conclusion: the training step is priced by the NUMBER of scatter ops, not
by data volume — motivates models/base.py::pairwise_scores.

Caveat: bodies must not be loop-invariant (XLA hoists them out of the scan
and the op reports ~0 — the matmul row below demonstrates exactly this).
"""
import time
import jax, jax.numpy as jnp
import numpy as np

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jax.jit(jnp.sum)(leaf))

def timeit(name, jitted, *args, iters):
    _sync(jitted(*args))
    t0 = time.perf_counter()
    _sync(jitted(*args))
    dt = time.perf_counter() - t0
    print(f"{name:36s} {(dt*1e3 - 24) / iters:8.4f} ms/step  (total {dt*1e3:7.1f} ms)", flush=True)

U, D, I = 72_000, 32, 10_677
rng = np.random.default_rng(0)
tab = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
itab = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
N = 512

@jax.jit
def empty(t):
    def body(c, _):
        return c * 1.000000001, ()
    out, _ = jax.lax.scan(body, t, None, length=N)
    return out
timeit(f'mul_table_x{N}', empty, tab, iters=N)

for B in (8192, 32768):
    ids = jnp.asarray(rng.integers(0, U, (N, B)).astype(np.int32))
    @jax.jit
    def g(t, i):
        def body(c, x):
            return c + 1e-12 * jnp.sum(jnp.take(t, x, axis=0)), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), i)
        return out
    timeit(f'gather_{B}', g, tab, ids, iters=N)
    @jax.jit
    def sc(t, i):
        def body(c, x):
            return c.at[x].add(1.0), ()
        out, _ = jax.lax.scan(body, t, i)
        return out
    timeit(f'scatter_{B}', sc, tab, ids, iters=N)

idsI = jnp.asarray(rng.integers(0, I, (N, 90112)).astype(np.int32))
@jax.jit
def gI(t, i):
    def body(c, x):
        return c + 1e-12 * jnp.sum(jnp.take(t, x, axis=0)), ()
    out, _ = jax.lax.scan(body, jnp.float32(0), i)
    return out
timeit('gather_item_90k', gI, itab, idsI, iters=N)
@jax.jit
def scI(t, i):
    def body(c, x):
        return c.at[x].add(1.0), ()
    out, _ = jax.lax.scan(body, t, i)
    return out
timeit('scatter_item_90k', scI, itab, idsI, iters=N)

u = jnp.asarray(rng.standard_normal((8192, D)).astype(np.float32))
@jax.jit
def mm(a, b):
    def body(c, _):
        return c + 1e-12 * (a @ b.T)[0, 0], ()
    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
    return out
timeit('matmul_8192x32x10677', mm, u, itab, iters=N)

# dense adam on both tables
@jax.jit
def adam(ts):
    def body(c, _):
        return jax.tree_util.tree_map(
            lambda t: t - 0.01 * (t * 0.9) / (jnp.sqrt(t * t * 0.999) + 1e-8), c), ()
    out, _ = jax.lax.scan(body, ts, None, length=N)
    return out
timeit('dense_adamish_both_tables', adam, (tab, itab, tab, itab, tab, itab), iters=N)

# take_along: [B, K+1] scalars from [B, I]
s_all = jnp.asarray(rng.standard_normal((8192, I)).astype(np.float32))
cols = jnp.asarray(rng.integers(0, I, (N, 8192, 11)).astype(np.int32))
@jax.jit
def tk(s, c):
    def body(acc, x):
        return acc + 1e-12 * jnp.sum(jnp.take_along_axis(s, x, axis=1)), ()
    out, _ = jax.lax.scan(body, jnp.float32(0), c)
    return out
timeit('take_along_8192x11_from_BI', tk, s_all, cols, iters=N)
