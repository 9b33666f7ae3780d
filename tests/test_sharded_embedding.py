"""Explicit shard_map embedding-lookup primitive tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collie_tpu.parallel import make_mesh
from collie_tpu.parallel.embedding import shard_table, sharded_embedding_lookup


@pytest.fixture(scope='module')
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(data=2, model=4)


def test_lookup_matches_dense_gather(mesh):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, 40).astype(np.int32))
    sharded = shard_table(table, mesh)
    out = sharded_embedding_lookup(sharded, ids, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


def test_lookup_gradient_matches_dense(mesh):
    """The backward pass (local scatter-add + psum transpose) must equal the
    dense gather gradient."""
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 32, 20).astype(np.int32))
    cotangent = jnp.asarray(rng.standard_normal((20, 8)).astype(np.float32))

    def loss_sharded(t):
        return (sharded_embedding_lookup(t, ids, mesh) * cotangent).sum()

    def loss_dense(t):
        return (t[ids] * cotangent).sum()

    g_sharded = jax.grad(loss_sharded)(shard_table(table, mesh))
    g_dense = jax.grad(loss_dense)(table)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_dense), rtol=1e-6)


def test_lookup_requires_divisible_rows(mesh):
    table = jnp.zeros((30, 8))  # 30 not divisible by model=4
    with pytest.raises(AssertionError, match='divide the model axis'):
        sharded_embedding_lookup(table, jnp.zeros(4, jnp.int32), mesh)


def test_lookup_under_jit_keeps_activation_size_communication(mesh):
    """Compiles and runs under jit with the table sharded — the schedule is
    pinned by shard_map, so no table-sized all-gather can appear."""
    rng = np.random.default_rng(2)
    table = shard_table(jnp.asarray(rng.standard_normal((128, 32)).astype(np.float32)),
                        mesh)
    ids = jnp.asarray(rng.integers(0, 128, 64).astype(np.int32))

    @jax.jit
    def fn(t, i):
        return sharded_embedding_lookup(t, i, mesh).sum()

    out = fn(table, ids)
    assert np.isfinite(float(out))
