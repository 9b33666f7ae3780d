"""Whole-epoch-on-device training via ``lax.scan``.

Motivation: with a per-step design every training step costs a host->device
dispatch (plus batch upload and loss download).  On a tunneled or remote TPU
that round trip is ~2 ms — more than the step's compute.  The TPU-native
answer is to make ONE dispatch per epoch: interaction arrays live on device,
and a single jitted program shuffles them (``jax.random.permutation``),
reshapes into ``[steps, batch]``, samples negatives on device
(``collie_tpu.ops.device_sampling``), and ``lax.scan``s the
forward + loss + backward + optimizer update over all steps.

This path activates automatically for in-memory ``InteractionsDataLoader``s
(``CollieTrainer(epoch_mode='auto')``); HDF5/out-of-core or custom loaders use
the per-step path.  Semantics match the per-step engine: same losses, same
stage-gated optimizer updates, same padded-and-masked final batch; only the
negative-sampling RNG stream differs from the host sampler (both are seeded
and deterministic).
"""
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from collie_tpu.data import (ApproximateNegativeSamplingInteractionsDataLoader,
                             ExplicitInteractions, HDF5InteractionsDataLoader,
                             Interactions, InteractionsDataLoader)
from collie_tpu.ops.device_sampling import build_complement_tables, \
    complement_sample_negatives_impl

_SCANNABLE_LOADERS = (InteractionsDataLoader,
                      ApproximateNegativeSamplingInteractionsDataLoader)


def loader_is_scannable(loader) -> bool:
    """True when the loader's epoch can be materialized as device arrays."""
    if not isinstance(loader, _SCANNABLE_LOADERS) or \
            isinstance(loader, HDF5InteractionsDataLoader):
        return False
    return isinstance(loader.interactions, (ExplicitInteractions, Interactions))


def build_scan_epoch_fns(model, specs, active: List[bool], loader,
                         shuffle: bool, mesh=None,
                         training: bool = True,
                         dedup_rounds: int = 1
                         ) -> Tuple[Callable, int, int]:
    """Compile an epoch function over ``loader``'s data.

    Returns ``(epoch_fn, num_steps, num_examples)``.  For ``training=True``:
    ``epoch_fn(params, opt_states, base_rng, epoch_idx) ->
    (params, opt_states, mean_loss)``; for ``training=False`` (validation):
    ``epoch_fn(params, base_rng, epoch_idx) -> mean_loss``.
    """
    inter = loader.interactions
    explicit = isinstance(inter, ExplicitInteractions)
    n = inter.num_interactions
    B = loader.batch_size
    if getattr(loader, 'drop_last', False):
        S = n // B
        n_used = S * B
    else:
        S = -(-n // B)
        n_used = n
    pad = S * B - n_used

    # epoch data is passed to the jitted epoch fn as ARGUMENTS (bundled in
    # ``data``), never captured by closure: closure-captured device arrays
    # become embedded HLO constants, which bloats compiles (megabytes of
    # constants for large datasets) and defeats the persistent compile cache
    data = {
        'rows': jnp.asarray(inter.mat.row.astype(np.int32)),
        'cols': jnp.asarray(inter.mat.col.astype(np.int32)),
        'mask_flat': jnp.concatenate([
            jnp.ones(n_used, dtype=jnp.float32), jnp.zeros(pad, dtype=jnp.float32)]),
    }
    if explicit:
        data['ratings'] = jnp.asarray(inter.mat.data.astype(np.float32))
    else:
        exact = inter.exact_negative_sampling
        K = inter.num_negative_samples
        num_items = inter.num_items
        if exact:
            indptr_np, shifted_np = build_complement_tables(inter.mat)
            data['indptr'] = jnp.asarray(indptr_np)
            data['shifted_cols'] = jnp.asarray(shifted_np)

    data_spec = None
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from collie_tpu.parallel.mesh import DATA_AXIS
        data_spec = P(None, DATA_AXIS)

    def _constrain(x):
        """Shard a ``[steps, batch]`` epoch array over the data axis."""
        if data_spec is None or x is None:
            return x
        from jax.sharding import NamedSharding
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, data_spec))

    def _epoch_batches(data, perm_rng, sample_rng):
        """Materialize the whole epoch on device: shuffled [S, B] id blocks
        plus (for implicit data) all negatives pre-sampled in one fused pass."""
        if shuffle:
            perm = jax.random.permutation(perm_rng, n)[:n_used]
        else:
            perm = jnp.arange(n_used)
        idx = jnp.concatenate([perm, perm[:1].repeat(pad)]) if pad else perm
        users_flat = data['rows'][idx]
        batches = {
            'users': _constrain(users_flat.reshape(S, B)),
            'mask': _constrain(data['mask_flat'].reshape(S, B)),
        }
        if explicit:
            batches['items'] = _constrain(data['cols'][idx].reshape(S, B))
            batches['ratings'] = _constrain(data['ratings'][idx].reshape(S, B))
        else:
            batches['pos_items'] = _constrain(data['cols'][idx].reshape(S, B))
            if exact:
                negs = complement_sample_negatives_impl(
                    sample_rng, users_flat, data['indptr'], data['shifted_cols'],
                    num_items, K, dedup_rounds=dedup_rounds)
            else:
                negs = jax.random.randint(sample_rng, (S * B, K), 0, num_items,
                                          dtype=jnp.int32)
            batches['neg_items'] = negs.reshape(S, B, K)
            if data_spec is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from collie_tpu.parallel.mesh import DATA_AXIS
                batches['neg_items'] = jax.lax.with_sharding_constraint(
                    batches['neg_items'],
                    NamedSharding(mesh, P(None, DATA_AXIS, None)))
        return batches

    if training:
        def epoch_fn(params, opt_states, data, base_rng, epoch_idx):
            rng = jax.random.fold_in(base_rng, epoch_idx)
            perm_rng, sample_rng, dropout_rng = jax.random.split(rng, 3)
            batches = _epoch_batches(data, perm_rng, sample_rng)

            def step(carry, batch):
                params, opt_states, step_i = carry
                loss, grads = jax.value_and_grad(
                    lambda p: model.calculate_loss(
                        p, batch, rng=jax.random.fold_in(dropout_rng, step_i),
                        training=True)
                )(params)
                new_states = list(opt_states)
                for i, spec in enumerate(specs):
                    if not active[i]:
                        continue
                    sub_params = {k: params[k] for k in spec.keys}
                    sub_grads = {k: grads[k] for k in spec.keys}
                    updates, new_states[i] = spec.transform.update(
                        sub_grads, opt_states[i], sub_params)
                    params = {**params,
                              **{k: sub_params[k] + updates[k] for k in spec.keys}}
                return (params, tuple(new_states), step_i + 1), loss

            (params, opt_states, _), losses = jax.lax.scan(
                step, (params, opt_states, jnp.int32(0)), batches)
            return params, opt_states, losses.mean()

        jitted = jax.jit(epoch_fn, donate_argnums=(0, 1))
    else:
        def epoch_fn(params, data, base_rng, epoch_idx):
            rng = jax.random.fold_in(base_rng, epoch_idx)
            perm_rng, sample_rng = jax.random.split(rng)
            batches = _epoch_batches(data, perm_rng, sample_rng)

            def step(_, batch):
                return None, model.calculate_loss(params, batch, rng=None,
                                                  training=False)

            _, losses = jax.lax.scan(step, None, batches)
            return losses.mean()

        jitted = jax.jit(epoch_fn)

    return jitted, data, S, n_used
