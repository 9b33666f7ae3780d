"""Embedding-table initializers and lookup helpers.

Rebuild of the reference's embedding layers
(``/root/reference/collie/model/base/layers.py:6-17``): ``ScaledEmbedding``
(normal with std ``1 / (embedding_dim * 2.5)``) and ``ZeroEmbedding`` (zeroed
bias tables).  In the functional design, "layers" are just initialized arrays
in the params pytree plus pure lookup functions, which lets the tables be
row-sharded over a device mesh with no code change.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def scaled_embedding_init(rng: jax.Array,
                          num_embeddings: int,
                          embedding_dim: int,
                          dtype=jnp.float32) -> jnp.ndarray:
    """Normal(0, 1 / (embedding_dim * 2.5)) init (reference ``layers.py:6-10``)."""
    std = 1.0 / (embedding_dim * 2.5)
    return std * jax.random.normal(rng, (num_embeddings, embedding_dim), dtype=dtype)


def zero_embedding_init(num_embeddings: int,
                        embedding_dim: Optional[int] = None,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Zero-initialized table for bias terms (reference ``layers.py:13-17``).

    With ``embedding_dim=None`` a 1-d bias vector is returned (the reference
    uses dim-1 embeddings for biases; a vector is the natural jnp shape).
    """
    shape: Tuple[int, ...] = (num_embeddings,) if embedding_dim is None \
        else (num_embeddings, embedding_dim)
    return jnp.zeros(shape, dtype=dtype)


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Row gather. Under ``jit`` with a row-sharded table this lowers to a
    GSPMD gather + collective; the explicitly-sharded fast path lives in
    ``collie_tpu.parallel``.

    bfloat16 tables (``embeddings_dtype='bfloat16'``) upcast to float32
    right after the gather: HBM traffic stays half-width (the gather reads
    bf16 rows — the point of the option on a bandwidth-bound lookup), XLA
    fuses the convert into the gather, and every downstream score/loss
    computes at full precision.  The backward scatter-add also accumulates
    in float32 (``_bf16_lookup``'s custom vjp): popular rows collide many
    times per batch, and accumulating those collisions in bf16 rounds away
    most of the gradient signal (measured: −8% MAP@10 / −0.04 AUC at the
    gate config with naive bf16 accumulation)."""
    if table.dtype == jnp.bfloat16:
        return _bf16_lookup(table, ids)
    return jnp.take(table, ids, axis=0)


@jax.custom_vjp
def _bf16_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, ids, axis=0).astype(jnp.float32)


def _bf16_lookup_fwd(table, ids):
    return _bf16_lookup(table, ids), (ids, table.shape)


def _bf16_lookup_bwd(res, g):
    ids, shape = res
    # accumulate row collisions at f32, round to storage dtype ONCE
    grad = jnp.zeros(shape, jnp.float32).at[ids].add(g)
    return grad.astype(jnp.bfloat16), None


_bf16_lookup.defvjp(_bf16_lookup_fwd, _bf16_lookup_bwd)


def dropout(rng: Optional[jax.Array],
            x: jnp.ndarray,
            rate: float,
            training: bool) -> jnp.ndarray:
    """Inverted dropout matching ``torch.nn.Dropout`` semantics used on the
    embedding outputs (reference ``matrix_factorization.py:130-138``)."""
    if not training or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def tiled_dropout_dots(user_embeddings: jnp.ndarray,
                       item_embeddings: jnp.ndarray,
                       R: int,
                       B: int,
                       rate: float,
                       training: bool,
                       rng_u,
                       rng_i) -> jnp.ndarray:
    """``[R, B]`` dot products between ``[B, d]`` user rows and ``[R, B, d]``
    item rows — the shared core of the table-models' ``pairwise_scores``
    overrides.  The item rows keep their ``[R, B, d]`` structure (gathered
    with 2-D ids): flattening to ``[R*B, d]`` before the gather would merge
    the data-sharded batch dim into an unshardable axis and make GSPMD
    replicate the block on every device of a mesh.

    Under dropout, masks are drawn at the ``[R, B, d]`` shape from the given
    rngs; the PRNG fills row-major over the same element count, so they
    equal the base hook's tiled ``[R*B, d]`` masks element-for-element (the
    override exists to skip the R-fold user GATHER, not to change the
    math)."""
    if training and rate:
        dim = user_embeddings.shape[1]
        tiled = jnp.broadcast_to(user_embeddings[None], (R, B, dim))
        tiled = dropout(rng_u, tiled, rate, training)
        item_embeddings = dropout(rng_i, item_embeddings, rate, training)
        return (tiled * item_embeddings).sum(axis=-1)
    return jnp.einsum('bd,rbd->rb', user_embeddings, item_embeddings)
