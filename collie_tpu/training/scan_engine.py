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
from collie_tpu.ops.device_sampling import (
    bucketed_table_bytes, build_bucketed_complement_tables,
    build_complement_tables, build_padded_complement_table,
    complement_sample_negatives_bucketed_grouped_impl,
    complement_sample_negatives_bucketed_impl,
    complement_sample_negatives_impl, complement_sample_negatives_padded_impl,
    padded_table_bytes)

# Auto-select the gather-free DEGREE-BUCKETED sampler whenever its tables
# (one [users_in_bucket, P_b] table per power-of-two degree bucket) fit this
# budget; beyond it — extreme row-length skew at huge user counts — fall back
# to the CSR binary-search path.  Bucketing reads each example's positives at
# its user's own bucket width instead of the global max degree: at ML-10M
# scale that is ~4x less sampling HBM traffic and ~10x less table memory than
# the single padded table (which remains available via
# COLLIE_TPU_SAMPLER=padded, and is what the bucketed path is bit-identical
# to).  The samplers chunk their row gathers so peak *working* memory stays
# O(8192 x P_b) regardless of epoch size.  Override the budget with
# COLLIE_TPU_PADDED_SAMPLER_BUDGET_MB (0 disables both gather-free paths).
_PADDED_SAMPLER_BUDGET_MB = 1024


def _fused_epoch_config(model, specs, active, loader, mesh):
    """Decide whether this (model, loader, optimizer) combination can train
    through the fused whole-epoch Pallas kernel
    (``ops/pallas/fused_mf_epoch.py``); returns a config dict or None.

    ``COLLIE_TPU_FUSED_EPOCH``: ``auto`` (default — fused on TPU only),
    ``1`` (force, even on CPU where the kernel runs in interpret mode —
    used by the numerics tests), ``0`` (never).  Everything outside the
    kernel's envelope silently uses the XLA scan path (same semantics).
    """
    import os
    gate = os.environ.get('COLLIE_TPU_FUSED_EPOCH', 'auto')
    if gate == '0':
        return None
    if gate != '1' and jax.default_backend() != 'tpu':
        return None
    if mesh is not None or not all(active):
        return None
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    if type(model) is not MatrixFactorizationModel:
        return None
    inter = loader.interactions
    explicit = isinstance(inter, ExplicitInteractions)
    hp = model.hparams
    if hp.get('dropout_p', 0.0):
        return None
    if not explicit and hp.get('y_range') is not None:
        return None
    meta_names = ()
    if model.metadata_for_loss:
        # partial-credit metadata runs in-kernel for ranking losses when it
        # is well-formed (per-item 1-D fields, weights summing <= 1); any
        # other shape falls back so the scan path raises the reference's
        # own validation errors
        weights = model.metadata_for_loss_weights
        if explicit or not weights \
                or set(weights) != set(model.metadata_for_loss):
            return None
        if sum(weights.values()) > 1:
            return None
        num_items = hp['num_items']
        for arr in model.metadata_for_loss.values():
            if jnp.ndim(arr) != 1 or jnp.shape(arr)[0] != num_items \
                    or not jnp.issubdtype(jnp.asarray(arr).dtype, jnp.integer):
                return None
        meta_names = tuple(sorted(model.metadata_for_loss))
    from collie_tpu.ops import losses as L
    if explicit:
        # RETIRED from auto selection (round 5): the pointwise twin kernel
        # has no winning envelope.  Measured at the explicit quickstart
        # config: scan 1.12M vs kernel 1.00M ex/s at B=1024 (round 4), and
        # the round-5 batch sweep found the kernel 0.51x of scan at B=256
        # and failing to compile at B>=1024 on the current libtpu (scoped
        # vmem 16.8M > 16M limit; benchmarks/explicit_sweep notes,
        # docs/TUNING.md).  The explicit step has no K-negative block for
        # the kernel's one-hot MXU gathers to amortize.  '1' still forces
        # it — the numerics tests run it in interpret mode on CPU.
        if gate != '1':
            return None
        _explicit_losses = {L.mse_loss: 'mse', L.mae_loss: 'mae'}
        if model.loss_function not in _explicit_losses:
            return None
        loss_kind = _explicit_losses[model.loss_function]
        adaptive = False
    else:
        _kernel_losses = {L.hinge_loss: ('hinge', False),
                          L.adaptive_hinge_loss: ('hinge', True),
                          L.bpr_loss: ('bpr', False),
                          L.adaptive_bpr_loss: ('bpr', True),
                          L.warp_loss: ('warp', False)}
        if model.loss_function not in _kernel_losses:
            return None
        loss_kind, adaptive = _kernel_losses[model.loss_function]
    # the default dual layout: adam over both embedding tables, sgd biases
    if hp.get('optimizer') not in ('adam', 'sparse_adam'):
        return None
    bias_opt = hp.get('bias_optimizer')
    if bias_opt == 'infer':
        bias_opt = hp.get('optimizer')
    if bias_opt != 'sgd' or len(specs) != 2:
        return None
    by_keys = {tuple(spec.keys): i for i, spec in enumerate(specs)}
    emb_idx = by_keys.get(('item_embeddings', 'user_embeddings'))
    bias_idx = by_keys.get(('item_biases', 'user_biases'))
    if emb_idx is None or bias_idx is None:
        return None
    if any(model.params[k].dtype != jnp.float32 for k in model.params):
        return None
    from collie_tpu.ops.pallas.fused_mf_epoch import (_VMEM_BUDGET_BYTES,
                                                      fused_vmem_bytes)
    if fused_vmem_bytes(hp['num_users'], hp['num_items'],
                        hp['embedding_dim'], loader.batch_size,
                        meta_fields=len(meta_names)) \
            > _VMEM_BUDGET_BYTES:
        return None
    y_range = hp.get('y_range')
    # torch-coupled weight decay runs in-kernel; build_transform zeroes it
    # for 'sparse_adam' (torch.optim.SparseAdam has none) but the sgd bias
    # group keeps it
    wd = float(hp.get('weight_decay', 0.0) or 0.0)
    wd_emb = 0.0 if hp.get('optimizer') == 'sparse_adam' else wd
    return {'adaptive': adaptive, 'loss_kind': loss_kind,
            'explicit': explicit,
            'y_range': tuple(y_range) if y_range is not None else None,
            'meta_names': meta_names,
            'wd_emb': wd_emb, 'wd_bias': wd,
            'emb_idx': emb_idx, 'bias_idx': bias_idx}


def _find_adam_state(state):
    import optax
    if isinstance(state, optax.ScaleByAdamState):
        return state
    if isinstance(state, tuple):
        for v in state:
            found = _find_adam_state(v)
            if found is not None:
                return found
    if isinstance(state, dict):
        for v in state.values():
            found = _find_adam_state(v)
            if found is not None:
                return found
    return None


def _replace_adam_state(state, new_adam):
    import optax
    if isinstance(state, optax.ScaleByAdamState):
        return new_adam
    if isinstance(state, tuple) and hasattr(state, '_fields'):
        return type(state)(*[_replace_adam_state(v, new_adam) for v in state])
    if isinstance(state, tuple):
        return tuple(_replace_adam_state(v, new_adam) for v in state)
    if isinstance(state, dict):
        return {k: _replace_adam_state(v, new_adam) for k, v in state.items()}
    return state


def _bump_wrapper_count(state, steps: int):
    """Advance the per-update counter the fused kernel does not touch.

    ``build_transform`` wraps every optimizer in ``optax.inject_hyperparams``,
    whose ``InjectHyperparamsState.count`` increments once per ``update`` call
    on the XLA scan path (S times per epoch).  The fused kernel performs the
    inner updates itself, so the wrapper counter is advanced here to keep the
    two engines' optimizer states bit-interchangeable (checkpoint/resume,
    engine switching mid-fit)."""
    if hasattr(state, 'count') and hasattr(state, 'hyperparams'):
        return state._replace(count=state.count + steps)
    return state

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
    slot_tail = 0          # set by the slot-domain fast path (bucketed)

    # epoch data is passed to the jitted epoch fn as ARGUMENTS (bundled in
    # ``data``), never captured by closure: closure-captured device arrays
    # become embedded HLO constants, which bloats compiles (megabytes of
    # constants for large datasets) and defeats the persistent compile cache.
    # Under a mesh the flat interaction arrays upload sharded over the
    # ``data`` axis (padded to divisibility — the in-jit gathers only touch
    # indices < n) and the sampler tables replicated; multi-process, each
    # host then feeds ONLY its addressable shards (per-process feeding via
    # jax.make_array_from_callback — see parallel/distributed.py), the
    # multi-host answer to the reference's Lightning-DDP delegation
    # (``/root/reference/collie/model/base/trainer.py:71-79``).
    if mesh is not None:
        from collie_tpu.parallel.distributed import (put_epoch_array,
                                                     put_replicated)
        from collie_tpu.parallel.mesh import DATA_AXIS as _DA
        _n_data = mesh.shape[_DA]
        def _put_epoch(x):
            x = np.asarray(x)
            # pad ANY flat epoch-length array to data-axis divisibility
            # (in-jit gathers only touch real indices)
            if x.ndim == 1 and x.shape[0] % _n_data:
                extra = (-x.shape[0]) % _n_data
                x = np.concatenate([x, np.zeros(extra, x.dtype)])
            return put_epoch_array(x, mesh)

        def _put_table(x):
            return put_replicated(np.asarray(x), mesh)
    else:
        _put_epoch = _put_table = jnp.asarray
    # The epoch shuffle gathers the flat (row, col) arrays by a 10M-element
    # permutation; 4-byte single-element random gathers are latency-bound
    # (~66 ms per 10M-element gather on the v5e), so when the id space fits
    # 31 bits the pair is PACKED into one int32 — one gather + two shifts
    # instead of two gathers.  Bit-identical batches either way.
    item_bits = max(int(inter.num_items - 1).bit_length(), 1)
    packable = ((inter.num_users - 1) << item_bits | (inter.num_items - 1)) \
        < 2 ** 31
    data = {
        'mask_flat': _put_epoch(np.concatenate([
            np.ones(n_used, dtype=np.float32),
            np.zeros(pad, dtype=np.float32)])),
    }
    if packable:
        data['packed'] = _put_epoch(
            (inter.mat.row.astype(np.int64) << item_bits
             | inter.mat.col.astype(np.int64)).astype(np.int32))
    else:
        data['rows'] = _put_epoch(inter.mat.row.astype(np.int32))
        data['cols'] = _put_epoch(inter.mat.col.astype(np.int32))
    if explicit:
        data['ratings'] = _put_epoch(inter.mat.data.astype(np.float32))
    else:
        exact = inter.exact_negative_sampling
        K = inter.num_negative_samples
        num_items = inter.num_items
        if exact:
            import os
            budget_mb = float(os.environ.get(
                'COLLIE_TPU_PADDED_SAMPLER_BUDGET_MB',
                _PADDED_SAMPLER_BUDGET_MB))
            kind = os.environ.get('COLLIE_TPU_SAMPLER', 'auto')
            if kind == 'auto':
                if bucketed_table_bytes(inter.mat) <= budget_mb * 2**20:
                    kind = 'bucketed'
                elif padded_table_bytes(inter.mat) <= budget_mb * 2**20:
                    kind = 'padded'  # unreachable (bucketed <= padded) but
                else:                # kept for explicit env selection
                    kind = 'csr'
            sampler_kind = kind
            if kind == 'bucketed':
                (specs_np, counts_np, users_g_np,
                 pos_of_np) = build_bucketed_complement_tables(
                    inter.mat, inter.mat.row)
                data['bucket_specs'] = tuple(
                    (_put_table(r), _put_table(t)) for r, t in specs_np)
                data['row_counts'] = _put_table(counts_np)
                data['users_g'] = _put_table(users_g_np)
                # ONE-GATHER epoch composition (round 5): the reorder chain
                # packed[idx] + negatives[pos_of[idx]] costs three random
                # [n]-sized gathers per epoch (~2 ms/step of the headline's
                # 9.3, benchmarks/sampler_r5.json).  Pre-sorting the packed
                # ids into GROUPED order on the host lets the epoch fetch
                # (ids, negatives) rows with a single random gather: the
                # grouped negatives compact densely through a MONOTONE
                # gather (quasi-sequential), concat with the pre-sorted ids,
                # and one combined[perm] row gather builds the epoch.  Batch
                # composition stays a uniform shuffle (a fixed bijection
                # composed with the Feistel permutation); each position's
                # negatives still avoid exactly its own example's positives.
                # Engaged when shuffling packable ids; other configurations
                # keep the reorder path (sequential order must be preserved
                # for shuffle=False).
                N_g = len(users_g_np)
                # slot-domain gate: bucket-pad slots become scattered masked
                # positions, so the steps-per-epoch count grows by the pad
                # fraction — negligible at scale (0.33% at ML-10M) but a
                # semantic change at tiny scales where pow2 bucket padding
                # can near-double N_g.  Engage only when pads are <= 2%.
                if packable and shuffle and N_g >= 2 \
                        and (N_g - n) <= 0.02 * n \
                        and os.environ.get('COLLIE_TPU_SLOT_EPOCH',
                                           '1') != '0':
                    # SLOT-DOMAIN epoch (round 5): the reorder chain
                    # packed[idx] + pos_of[idx] + negatives[...] costs two
                    # latency-bound random ELEMENT gathers (~33 ms each per
                    # 5M at ML-10M scale) plus a random row gather per
                    # epoch.  Instead the epoch is drawn over GROUPED SLOTS:
                    # packed ids and a validity bit are placed at slot
                    # positions on the host (bucket-pad slots -> mask 0),
                    # the epoch program concats them with the grouped
                    # negatives into [N_g, 2+K] rows, and ONE
                    # combined[feistel(N_g)] row gather produces the whole
                    # shuffled epoch — no element gathers at all.  Batch
                    # composition stays a uniform shuffle (pad slots are
                    # 0.3% scattered masked positions, the same masked-
                    # example semantics as tail padding); each position's
                    # negatives avoid exactly its own example's positives.
                    # Engaged when shuffling packable ids; other configs
                    # keep the reorder path (shuffle=False must preserve
                    # sequential order).
                    packed_np = (inter.mat.row.astype(np.int64) << item_bits
                                 | inter.mat.col.astype(np.int64)
                                 ).astype(np.int32)
                    packed_slots = np.zeros(N_g, np.int32)
                    packed_slots[pos_of_np] = packed_np
                    slot_mask = np.zeros(N_g, np.int32)
                    slot_mask[pos_of_np] = 1
                    data['packed_slots'] = _put_epoch(packed_slots)
                    data['slot_mask'] = _put_epoch(slot_mask)
                    del data['packed']      # the slot-domain path replaces
                    del data['mask_flat']   # these position-based arrays
                    # the epoch runs over all N_g slots; the real-example
                    # count (throughput accounting, loss normalization by B
                    # with masks) is unchanged
                    S = -(-N_g // B)
                    slot_tail = S * B - N_g
                else:
                    data['pos_of'] = _put_table(pos_of_np)
            elif kind == 'padded':
                pad_np, counts_np = build_padded_complement_table(inter.mat)
                data['shifted_pad'] = _put_table(pad_np)
                data['row_counts'] = _put_table(counts_np)
            else:
                indptr_np, shifted_np = build_complement_tables(inter.mat)
                data['indptr'] = _put_table(indptr_np)
                data['shifted_cols'] = _put_table(shifted_np)

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

    import os as _os
    # 'feistel' (default): O(n) elementwise keyed bijection — the sort
    # behind jax.random.permutation costs 95 ms/epoch at n=10M (measured,
    # ops/shuffle.py docstring).  'sort' keeps the lowered-sort shuffle
    # (and its rng stream).  Part of the trainer's program cache key.
    shuffle_kind = _os.environ.get('COLLIE_TPU_SHUFFLE', 'feistel')

    def _epoch_batches(data, perm_rng, sample_rng):
        """Materialize the whole epoch on device: shuffled [S, B] id blocks
        plus (for implicit data) all negatives pre-sampled in one fused pass."""
        if 'packed_slots' in data:
            # slot-domain one-gather epoch (see the build-time comment).
            # Under a mesh the arrays are padded for shard divisibility;
            # the true slot count is S*B - slot_tail (static).
            N_g = S * B - slot_tail
            if shuffle_kind == 'feistel':
                from collie_tpu.ops.shuffle import feistel_permutation
                sigma = feistel_permutation(perm_rng, N_g)
            else:
                sigma = jax.random.permutation(perm_rng, N_g)
            tail = S * B - N_g
            sidx = jnp.concatenate([sigma, sigma[:1].repeat(tail)]) \
                if tail else sigma
            negs_g = complement_sample_negatives_bucketed_grouped_impl(
                sample_rng, data['users_g'], data['bucket_specs'],
                data['row_counts'], num_items, K, dedup_rounds=dedup_rounds)
            combined = jnp.concatenate(
                [data['packed_slots'][:, None], data['slot_mask'][:, None],
                 negs_g], axis=1)
            rows = combined[sidx]                # the ONE random gather
            if tail:
                # appended tail positions duplicate slot sigma[0] — zero
                # their mask column once here, instead of materializing a
                # position-iota mask array for the whole epoch
                rows = rows.at[N_g:, 1].set(0)
            # the scan consumes the PACKED rows directly (one [S, B, 2+K]
            # buffer instead of four materialized epoch arrays — saves the
            # ~260 MB of separate-array writes per epoch); each step body
            # unpacks its [B, 2+K] block via _unpack_rows, which fuses into
            # the step
            rows = rows.reshape(S, B, 2 + K)
            if data_spec is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from collie_tpu.parallel.mesh import DATA_AXIS
                rows = jax.lax.with_sharding_constraint(
                    rows, NamedSharding(mesh, P(None, DATA_AXIS, None)))
            return {'rows': rows}
        if shuffle and shuffle_kind == 'feistel':
            from collie_tpu.ops.shuffle import feistel_permutation
            perm = feistel_permutation(perm_rng, n)[:n_used]
        elif shuffle:
            perm = jax.random.permutation(perm_rng, n)[:n_used]
        else:
            perm = jnp.arange(n_used)
        idx = jnp.concatenate([perm, perm[:1].repeat(pad)]) if pad else perm
        if 'packed' in data:
            pk = data['packed'][idx]
            users_flat = pk >> item_bits
            cols_flat = pk & ((1 << item_bits) - 1)
        else:
            users_flat = data['rows'][idx]
            cols_flat = data['cols'][idx]
        batches = {
            'users': _constrain(users_flat.reshape(S, B)),
            'mask': _constrain(data['mask_flat'].reshape(S, B)),
        }
        if explicit:
            batches['items'] = _constrain(cols_flat.reshape(S, B))
            batches['ratings'] = _constrain(data['ratings'][idx].reshape(S, B))
        else:
            batches['pos_items'] = _constrain(cols_flat.reshape(S, B))
            if exact and sampler_kind == 'bucketed':
                negs = complement_sample_negatives_bucketed_impl(
                    sample_rng, idx, data['pos_of'], data['users_g'],
                    data['bucket_specs'], data['row_counts'], num_items, K,
                    dedup_rounds=dedup_rounds)
            elif exact and sampler_kind == 'padded':
                negs = complement_sample_negatives_padded_impl(
                    sample_rng, users_flat, data['shifted_pad'],
                    data['row_counts'], num_items, K,
                    dedup_rounds=dedup_rounds)
            elif exact:
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

    def _unpack_rows(batch):
        """Per-step unpack of the slot-domain packed rows — fuses into the
        step body (no-op for named batch dicts)."""
        if 'rows' not in batch:
            return batch
        block = batch['rows']                          # [B, 2+K]
        pk = block[:, 0]
        return {
            'users': pk >> item_bits,
            'pos_items': pk & ((1 << item_bits) - 1),
            'mask': block[:, 1].astype(jnp.float32),
            # bucket-PAD slots (mask 0) drew against their bucket's row 0 —
            # a different user's positives — so their ids can land in
            # [num_items, num_items + deg); clamp before any table gather
            # (jnp out-of-bounds gathers FILL NaN, which survives a zero
            # mask)
            'neg_items': jnp.minimum(block[:, 2:], num_items - 1),
        }

    def _unpack_rows_full(batches):
        """Whole-epoch unpack for consumers needing named [S, B(,K)] arrays
        (the fused-kernel path's operands)."""
        if 'rows' not in batches:
            return batches
        rows = batches['rows']
        pk = rows[..., 0]
        return {
            'users': pk >> item_bits,
            'pos_items': pk & ((1 << item_bits) - 1),
            'mask': rows[..., 1].astype(jnp.float32),
            'neg_items': jnp.minimum(rows[..., 2:], num_items - 1),
        }

    fused_cfg = None
    if training:
        fused_cfg = _fused_epoch_config(model, specs, active, loader, mesh)
    if fused_cfg is not None:
        from collie_tpu.ops.pallas.fused_mf_epoch import (
            fused_mf_epoch, fused_mf_explicit_epoch)
        from collie_tpu.training.optimizers import _find_hyperparams
        emb_idx, bias_idx = fused_cfg['emb_idx'], fused_cfg['bias_idx']
        adaptive = fused_cfg['adaptive']
        loss_kind = fused_cfg['loss_kind']
        interpret = jax.default_backend() != 'tpu'

        def epoch_fn(params, opt_states, data, base_rng, epoch_idx):
            # identical RNG layout to the scan path: same seed -> same
            # permutation and the same sampled negatives
            rng = jax.random.fold_in(base_rng, epoch_idx)
            perm_rng, sample_rng, _ = jax.random.split(rng, 3)
            batches = _unpack_rows_full(
                _epoch_batches(data, perm_rng, sample_rng))

            adam = _find_adam_state(opt_states[emb_idx])
            lr_e = _find_hyperparams(opt_states[emb_idx])['learning_rate']
            lr_b = _find_hyperparams(opt_states[bias_idx])['learning_rate']
            if fused_cfg['explicit']:
                (ue, ie, ub, ib, mu_u, nu_u, mu_i, nu_i, cnt,
                 losses) = fused_mf_explicit_epoch(
                    params['user_embeddings'], params['item_embeddings'],
                    params['user_biases'], params['item_biases'],
                    adam.mu['user_embeddings'], adam.nu['user_embeddings'],
                    adam.mu['item_embeddings'], adam.nu['item_embeddings'],
                    adam.count,
                    batches['users'], batches['items'], batches['ratings'],
                    batches['mask'], lr_e, lr_b,
                    loss_kind=loss_kind, y_range=fused_cfg['y_range'],
                    wd_emb=fused_cfg['wd_emb'], wd_bias=fused_cfg['wd_bias'],
                    interpret=interpret)
                new_params = {**params, 'user_embeddings': ue,
                              'item_embeddings': ie, 'user_biases': ub,
                              'item_biases': ib}
            else:
                meta_names = fused_cfg['meta_names']
                meta_rows = (jnp.stack([
                    jnp.asarray(model.metadata_for_loss[n], jnp.int32)
                    for n in meta_names]) if meta_names else None)
                meta_weights = tuple(
                    float(model.metadata_for_loss_weights[n])
                    for n in meta_names)
                (ue, ie, ib, mu_u, nu_u, mu_i, nu_i, cnt,
                 losses) = fused_mf_epoch(
                    params['user_embeddings'], params['item_embeddings'],
                    params['item_biases'],
                    adam.mu['user_embeddings'], adam.nu['user_embeddings'],
                    adam.mu['item_embeddings'], adam.nu['item_embeddings'],
                    adam.count,
                    batches['users'], batches['pos_items'],
                    batches['neg_items'],
                    batches['mask'], lr_e, lr_b, meta_rows,
                    K=K, adaptive=adaptive, loss_kind=loss_kind,
                    meta_weights=meta_weights,
                    wd_emb=fused_cfg['wd_emb'], wd_bias=fused_cfg['wd_bias'],
                    interpret=interpret)
                new_params = {**params, 'user_embeddings': ue,
                              'item_embeddings': ie, 'item_biases': ib}
                if fused_cfg['wd_bias']:
                    # user biases get ZERO data gradient from pairwise
                    # ranking losses, so their sgd + torch-coupled-decay
                    # update has the exact closed form b *= (1 - lr*wd) per
                    # step — applied here instead of carrying user-bias
                    # state through the kernel
                    decay = (1.0 - lr_b * fused_cfg['wd_bias']) ** S
                    new_params['user_biases'] = \
                        params['user_biases'] * decay
            import optax
            new_adam = optax.ScaleByAdamState(
                count=cnt,
                mu={'item_embeddings': mu_i, 'user_embeddings': mu_u},
                nu={'item_embeddings': nu_i, 'user_embeddings': nu_u})
            new_states = list(opt_states)
            new_states[emb_idx] = _bump_wrapper_count(
                _replace_adam_state(opt_states[emb_idx], new_adam), S)
            new_states[bias_idx] = _bump_wrapper_count(opt_states[bias_idx], S)
            return new_params, tuple(new_states), losses.mean()

        jitted = jax.jit(epoch_fn, donate_argnums=(0, 1))
    elif training:
        # Fused table layout (models declaring ``_FUSED_TABLE_SPEC``: MF,
        # MLP-MF, Nonlinear-MF): carry ``[*, D+1]`` tables with the
        # bias as the last column through the step scan.  The model's score
        # hooks gather each fused row once and slice after the gather, so
        # autodiff emits ONE backward scatter per table instead of two —
        # and the step is priced by scatter count (docs/BENCHMARKS.md).
        # Optimizer updates still run through the exact optax transforms on
        # named slices (dense elementwise — cheap), so every optimizer
        # configuration keeps its semantics bit-for-bit.
        import os as _os
        _fuse_env = _os.environ.get('COLLIE_TPU_FUSED_TABLES', 'auto')
        # stage-gated optimizer specs (multi-stage models) are fine: the
        # optimizer always runs on the UNFUSED named slices of ACTIVE specs
        # only; inactive specs' params round-trip through fuse/unfuse
        # untouched (round 5 — this gate previously required all(active),
        # which kept ColdStart on the 4-scatter named layout)
        fuse_tables = (_fuse_env != '0'
                       and getattr(model, 'supports_fused_tables',
                                   lambda: False)())

        def epoch_fn(params, opt_states, data, base_rng, epoch_idx):
            rng = jax.random.fold_in(base_rng, epoch_idx)
            perm_rng, sample_rng, dropout_rng = jax.random.split(rng, 3)
            batches = _epoch_batches(data, perm_rng, sample_rng)

            def step(carry, batch):
                params, opt_states, step_i = carry
                batch = _unpack_rows(batch)
                loss, grads = jax.value_and_grad(
                    lambda p: model.calculate_loss(
                        p, batch, rng=jax.random.fold_in(dropout_rng, step_i),
                        training=True)
                )(params)
                if fuse_tables:
                    params = model.unfuse_params(params)
                    grads = model.unfuse_params(grads)
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
                if fuse_tables:
                    params = model.fuse_params(params)
                return (params, tuple(new_states), step_i + 1), loss

            if fuse_tables:
                params = model.fuse_params(params)
            (params, opt_states, _), losses = jax.lax.scan(
                step, (params, opt_states, jnp.int32(0)), batches)
            if fuse_tables:
                params = model.unfuse_params(params)
            return params, opt_states, losses.mean()

        jitted = jax.jit(epoch_fn, donate_argnums=(0, 1))
    else:
        def epoch_fn(params, data, base_rng, epoch_idx):
            rng = jax.random.fold_in(base_rng, epoch_idx)
            perm_rng, sample_rng = jax.random.split(rng)
            batches = _epoch_batches(data, perm_rng, sample_rng)

            def step(_, batch):
                return None, model.calculate_loss(params, _unpack_rows(batch),
                                                  rng=None, training=False)

            _, losses = jax.lax.scan(step, None, batches)
            return losses.mean()

        jitted = jax.jit(epoch_fn)

    return jitted, data, S, n_used


def hdf5_chunk_plan(total_steps: int, max_chunk_steps: int
                    ) -> List[Tuple[int, int]]:
    """Decompose an out-of-core epoch into ``(start_step, num_steps)`` chunks.

    Full chunks of ``max_chunk_steps`` first, then the tail breaks into
    power-of-two sub-chunks (the engine's program-ladder idiom): distinct
    chunk-program compilations stay bounded at ``log2(max) + 1``, and — the
    correctness property — only the FINAL batch of the final sub-chunk can be
    partially padded, so no scanned step is ever fully padding (a fully-padded
    step would still decay Adam moments / apply weight decay, diverging from
    the per-step engine which never runs such a step)."""
    plan = []
    done = 0
    while done < total_steps:
        b = max_chunk_steps
        while b > total_steps - done:
            b //= 2
        plan.append((done, b))
        done += b
    return plan


def build_hdf5_chunk_make(model, specs, active: List[bool], loader,
                          shuffle: bool) -> Callable[[int], Callable]:
    """Chunked out-of-core scan tier: factory of per-chunk epoch-segment
    programs for HDF5-backed loaders.

    The per-step path costs ~2 ms of tunnel dispatch per batch, which priced
    the round-4 out-of-core tier at 44% of in-memory throughput
    (``benchmarks/outofcore_results.json``).  TPU-native fix: materialize each
    HDF5 chunk (``COLLIE_TPU_HDF5_CHUNK_STEPS`` batches, default 64) as device
    arrays and dispatch ONE program per chunk — in-chunk device shuffle,
    on-device approximate negatives, ``lax.scan`` over the chunk's steps —
    while the host reads the NEXT chunk from disk.  Dispatch is asynchronous
    (the axon queue returns immediately), so the h5py read of chunk ``c+1``
    overlaps the device compute of chunk ``c`` with no threads; the only
    sync point is the single epoch-loss readback at epoch end.

    Sampling is always approximate for HDF5 data, as in the reference
    (``/root/reference/collie/interactions/datasets.py:664-694``); shuffle is
    chunk-order (host) + in-chunk (device Feistel/permutation), the chunked
    analog of the reference's ``HDF5Interactions`` in-chunk shuffle.

    Returns ``make(num_steps) -> chunk_fn`` where
    ``chunk_fn(params, opt_states, users, items, mask, base_rng, epoch_idx,
    chunk_idx) -> (params, opt_states, loss_sum)`` over flat
    ``[num_steps * B]`` host arrays; ``loss_sum`` is the sum of the chunk's
    per-step losses (the trainer divides the epoch total by the real step
    count — identical mean semantics to the in-memory path)."""
    import os as _os
    inter = loader.interactions
    B = loader.batch_size
    K = inter.num_negative_samples
    num_items = inter.num_items
    shuffle_kind = _os.environ.get('COLLIE_TPU_SHUFFLE', 'feistel')
    _fuse_env = _os.environ.get('COLLIE_TPU_FUSED_TABLES', 'auto')
    fuse_tables = (_fuse_env != '0'
                   and getattr(model, 'supports_fused_tables',
                               lambda: False)())

    def make(num_steps: int) -> Callable:
        C = num_steps * B

        def chunk_fn(params, opt_states, users, items, mask, base_rng,
                     epoch_idx, chunk_idx):
            rng = jax.random.fold_in(
                jax.random.fold_in(base_rng, epoch_idx), chunk_idx)
            perm_rng, sample_rng, dropout_rng = jax.random.split(rng, 3)
            if shuffle and C >= 2:
                if shuffle_kind == 'feistel':
                    from collie_tpu.ops.shuffle import feistel_permutation
                    perm = feistel_permutation(perm_rng, C)
                else:
                    perm = jax.random.permutation(perm_rng, C)
                users_, items_, mask_ = users[perm], items[perm], mask[perm]
            else:
                users_, items_, mask_ = users, items, mask
            negs = jax.random.randint(sample_rng, (C, K), 0, num_items,
                                      dtype=jnp.int32)
            batches = {
                'users': users_.reshape(num_steps, B),
                'pos_items': items_.reshape(num_steps, B),
                'neg_items': negs.reshape(num_steps, B, K),
                'mask': mask_.reshape(num_steps, B),
            }

            def step(carry, batch):
                params, opt_states, step_i = carry
                loss, grads = jax.value_and_grad(
                    lambda p: model.calculate_loss(
                        p, batch, rng=jax.random.fold_in(dropout_rng, step_i),
                        training=True)
                )(params)
                if fuse_tables:
                    params = model.unfuse_params(params)
                    grads = model.unfuse_params(grads)
                new_states = list(opt_states)
                for i, spec in enumerate(specs):
                    if not active[i]:
                        continue
                    sub_params = {k: params[k] for k in spec.keys}
                    sub_grads = {k: grads[k] for k in spec.keys}
                    updates, new_states[i] = spec.transform.update(
                        sub_grads, opt_states[i], sub_params)
                    params = {**params,
                              **{k: sub_params[k] + updates[k]
                                 for k in spec.keys}}
                if fuse_tables:
                    params = model.fuse_params(params)
                return (params, tuple(new_states), step_i + 1), loss

            if fuse_tables:
                params = model.fuse_params(params)
            (params, opt_states, _), losses = jax.lax.scan(
                step, (params, opt_states, jnp.int32(0)), batches)
            if fuse_tables:
                params = model.unfuse_params(params)
            return params, opt_states, losses.sum()

        return jax.jit(chunk_fn, donate_argnums=(0, 1))

    return make


def build_scan_fit_fn(train_epoch_fn, val_epoch_fn, *, monitor_val: bool,
                      sched_kinds: tuple, sched_statics: tuple,
                      es_patience, terminate_on_nan: bool):
    """One jitted dispatch for an ENTIRE ``fit()``: ``lax.scan`` over epochs.

    The per-epoch host round-trip (fetch the epoch loss, step the plateau
    scheduler, check early stopping) costs a full tunnel RPC — measured
    50-80 ms against 0.7-0.9 ms of actual epoch compute at the headline
    config — so the whole decision loop moves on device:

    * ``ReduceLROnPlateau`` / ``StepLR`` stepping (exact semantics of
      ``schedulers.py:34-63``) runs as jnp scalar ops, updating the injected
      learning-rate leaf inside the carried optimizer state (no retrace: the
      update preserves the leaf's weak type).
    * Early stopping (strict-improvement patience, ``trainer.py`` loop) and
      the NaN trip set a ``stopped`` flag; later epochs run through a
      ``lax.cond`` identity branch — semantically the trainer's ``break``.
    * Per-epoch train/val losses, each epoch's post-step learning rates, and
      a ``ran`` mask stream out so the host can replay logging, verbose
      printing, and ``best_epoch_loss`` bookkeeping after the fact.

    On a NaN epoch the scheduler / early-stop state is left untouched
    (matching the host path, which raises before stepping either).

    Returns a jitted ``fit_fn(params, opt_states, train_data, val_data,
    base_rng, epoch_idxs, sched_init, es_init) -> (params, opt_states,
    sched_state, es_state, train_losses, val_losses, lrs, ran)``.
    ``es_state`` is ``(best, n_no_improve, stopped, nan_seen)``.  Buffers are
    NOT donated: if the single dispatch fails, the caller's pre-fit params
    must still be alive.
    """
    from collie_tpu.training.optimizers import _find_hyperparams

    def _sched_step(i, state, lr, monitored):
        kind = sched_kinds[i]
        if kind == 'plateau':
            factor, patience, threshold, min_lr = sched_statics[i]
            best, n_bad = state
            improved = monitored < best * (1.0 - threshold)
            best = jnp.where(improved, monitored, best)
            n_bad = jnp.where(improved, 0, n_bad + 1)
            reduce = n_bad > patience
            n_bad = jnp.where(reduce, 0, n_bad)
            new_lr = jnp.where(reduce, jnp.maximum(lr * factor, min_lr), lr)
            return (best, n_bad), new_lr
        step_size, gamma = sched_statics[i]                    # 'steplr'
        (count,) = state
        count = count + 1
        return (count,), jnp.where(count % step_size == 0, lr * gamma, lr)

    def _current_lrs(opt_states):
        lrs = []
        for i, st in enumerate(opt_states):
            if sched_kinds[i] == 'none':
                lrs.append(jnp.asarray(jnp.nan, jnp.float32))
            else:
                lrs.append(jnp.asarray(_find_hyperparams(st)['learning_rate'],
                                       jnp.float32))
        return tuple(lrs)

    def fit_fn(params, opt_states, train_data, val_data, base_rng,
               epoch_idxs, sched_init, es_init):

        def run(carry, epoch_idx):
            params, opt_states, sched, es = carry
            params, opt_states, train_loss = train_epoch_fn(
                params, opt_states, train_data, base_rng, epoch_idx)
            if monitor_val:
                val_loss = val_epoch_fn(params, val_data, base_rng, epoch_idx)
                monitored = val_loss
            else:
                val_loss = jnp.asarray(jnp.nan, jnp.float32)
                monitored = train_loss
            # host-path parity: the per-epoch loop's NaN guard checks the
            # TRAIN loss only (``trainer.py``), never the val loss
            bad = ~jnp.isfinite(train_loss) if terminate_on_nan \
                else jnp.asarray(False)

            new_states = list(opt_states)
            new_sched = []
            for i in range(len(new_states)):
                if sched_kinds[i] == 'none':
                    new_sched.append(sched[i])
                    continue
                hp = _find_hyperparams(new_states[i])
                s, new_lr = _sched_step(i, sched[i], hp['learning_rate'],
                                        monitored)
                # NaN epoch: host path raises before stepping the scheduler
                s = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(bad, old, new), s, sched[i])
                new_lr = jnp.where(bad, hp['learning_rate'], new_lr)
                new_sched.append(s)
                new_states[i] = new_states[i]._replace(
                    hyperparams={**hp, 'learning_rate': new_lr})

            best_es, n_no, stopped, nan_seen = es
            improved = monitored < best_es
            new_best = jnp.where(improved, monitored, best_es)
            new_n_no = jnp.where(improved, 0, n_no + 1)
            best_es = jnp.where(bad, best_es, new_best)
            n_no = jnp.where(bad, n_no, new_n_no)
            if es_patience is not None:
                # host-path parity: the per-epoch loop checks patience only on
                # NON-improving epochs (``trainer.py`` ``else`` branch), so
                # ``early_stopping_patience=0`` never stops an improving run
                stopped = stopped | ((~bad) & (~improved)
                                     & (n_no >= es_patience))
            nan_seen = nan_seen | bad
            stopped = stopped | bad

            carry = (params, tuple(new_states), tuple(new_sched),
                     (best_es, n_no, stopped, nan_seen))
            return carry, (train_loss, val_loss, _current_lrs(carry[1]),
                           jnp.asarray(True))

        def skip(carry, epoch_idx):
            nan = jnp.asarray(jnp.nan, jnp.float32)
            return carry, (nan, nan, _current_lrs(carry[1]),
                           jnp.asarray(False))

        def body(carry, epoch_idx):
            stopped = carry[3][2]
            return jax.lax.cond(stopped, skip, run, carry, epoch_idx)

        carry0 = (params, opt_states, sched_init, es_init)
        carry, (train_losses, val_losses, lrs, ran) = jax.lax.scan(
            body, carry0, epoch_idxs)
        params, opt_states, sched, es = carry
        return (params, opt_states, sched, es,
                train_losses, val_losses, lrs, ran)

    return jax.jit(fit_fn)
