"""O(n) elementwise epoch shuffle: a cycle-walked Feistel bijection.

``jax.random.permutation(key, n)`` lowers to a device SORT of random keys
— measured 95 ms per epoch at n = 10M on the v5e, ~60% of what the whole
grouped sampler costs.  A 4-round Feistel network over the index bits is a
keyed bijection on ``[0, 2^bits)`` computed with ~30 elementwise int ops
per element (no sort, no gather); cycle-walking (re-encrypt until the
value lands below ``n``) restricts it to a bijection on ``[0, n)`` — the
standard format-preserving-encryption construction, so uniformity over
permutations is "PRP-quality": not all ``n!`` orders are reachable, but
batch composition is statistically indistinguishable from a uniform
shuffle for SGD purposes (quality A/B'd at the calibrated gates — see
docs/BENCHMARKS.md).

Cite: replaces the epoch shuffle semantics of the reference's
``DataLoader(shuffle=True)`` (``/root/reference/collie/interactions/
dataloaders.py``) with identical marginal uniformity.
"""
from functools import partial

import jax
import jax.numpy as jnp


def _mix(x: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """murmur3-style avalanche of ``x`` under ``key`` (uint32)."""
    h = (x + key).astype(jnp.uint32)
    h = h * jnp.uint32(0x9E3779B9)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    return h


@partial(jax.jit, static_argnames=('n',))
def feistel_permutation(rng: jax.Array, n: int) -> jnp.ndarray:
    """A keyed bijection of ``jnp.arange(n)`` — O(n) elementwise, no sort.

    4-round Feistel over ``bits = ceil(log2(n))`` index bits (unbalanced
    halves for odd ``bits``), then cycle-walking: the Feistel domain is
    ``[0, 2^bits) < 2n``, so each out-of-range value is re-encrypted until
    it lands in ``[0, n)`` (expected < 1 extra pass; a.s. terminating, and
    a bijection on ``[0, n)`` by the standard FPE argument)."""
    assert n >= 2
    bits = max((n - 1).bit_length(), 2)
    lo_bits = bits // 2
    hi_bits = bits - lo_bits
    lo_mask = jnp.uint32((1 << lo_bits) - 1)
    hi_mask = jnp.uint32((1 << hi_bits) - 1)
    keys = jax.random.randint(rng, (4,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32).astype(jnp.uint32)

    def encrypt(x):
        lo = x & lo_mask
        hi = (x >> lo_bits) & hi_mask
        for i in range(4):
            # unbalanced Feistel: alternate which half is mixed so both
            # widths diffuse
            if i % 2 == 0:
                lo = (lo ^ _mix(hi, keys[i])) & lo_mask
            else:
                hi = (hi ^ _mix(lo, keys[i])) & hi_mask
        return (hi << lo_bits) | lo

    idx = jnp.arange(n, dtype=jnp.uint32)
    e = encrypt(idx)

    def cond(e):
        return jnp.any(e >= n)

    def body(e):
        return jnp.where(e >= n, encrypt(e), e)

    e = jax.lax.while_loop(cond, body, e)
    return e.astype(jnp.int32)
