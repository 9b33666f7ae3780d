"""Per-shard (distributed) checkpointing.

The host-pickle checkpoint (``trainer._write_checkpoint``) gathers every
leaf to one host — fine single-chip, but on a mesh whose point is tables
larger than one HBM it contradicts the sharding story, and multi-process it
cannot even address remote shards.  This format writes each leaf **per mesh
shard**: process ``k`` saves ``shards_p{k}.npz`` holding only the shard data
its devices own (deduplicated: a shard replicated across devices/processes
is written once, by the lowest-index owning process), plus a ``meta.pkl``
skeleton from process 0.  No full table is ever materialized on any host,
saving or loading.

Restore rebuilds global arrays with ``jax.make_array_from_callback`` — each
process reads only the npz entries covering its addressable shards (numpy's
lazy ``NpzFile`` decompresses per entry), so load cost is O(local shards).
The checkpoint directory must be on storage visible to every process (the
usual pod setup; trivially true single-process).

The reference has no equivalent (its ``save_model`` is a single ``.pth``,
``/root/reference/collie/model/base/base_pipeline.py:880-900``) — this is
required by the rebuild's row-sharded-table story, not parity.
"""
import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

_META = 'meta.pkl'


class _Leaf:
    """Pickle-stable placeholder marking array positions in the skeleton."""

    def __reduce__(self):
        return (_make_leaf, ())


def _make_leaf():
    return _LEAF


_LEAF = _Leaf()


def _index_key(index: Tuple) -> Tuple:
    """Hashable, pickle-stable key for an addressable-shard index."""
    return tuple((s.start, s.stop, s.step) for s in index)


def _entry_name(leaf_i: int, key: Tuple) -> str:
    flat = '_'.join('n' if v is None else str(v) for se in key for v in se)
    return f'{leaf_i}__{flat}'


def save_sharded_pytree(dirpath, tree, host_payload: Optional[Dict] = None
                        ) -> None:
    """Write ``tree``'s array leaves per shard under ``dirpath``.

    ``host_payload`` is an arbitrary picklable dict stored in the metadata
    (trainer counters, scheduler objects); it must be identical across
    processes (only process 0's copy is kept).
    """
    dirpath = Path(dirpath)
    dirpath.mkdir(parents=True, exist_ok=True)
    leaves, _ = jax.tree_util.tree_flatten(tree)
    proc = jax.process_index()

    my_entries: Dict[str, np.ndarray] = {}
    leaf_meta = []
    for i, leaf in enumerate(leaves):
        if not isinstance(leaf, jax.Array):
            # host scalars / numpy: process 0 stores them in the meta
            leaf_meta.append(('host', leaf))
            continue
        # each distinct shard gets ONE writer, chosen round-robin among the
        # processes holding it (every process computes the same deterministic
        # assignment), so checkpoint I/O spreads across hosts instead of
        # piling onto process 0 when tables are replicated over ``data``
        holders: Dict[Tuple, set] = {}
        for dev, index in leaf.sharding.devices_indices_map(leaf.shape).items():
            holders.setdefault(_index_key(index), set()).add(dev.process_index)
        owners: Dict[Tuple, int] = {}
        for ordinal, key in enumerate(sorted(holders)):
            procs = sorted(holders[key])
            owners[key] = procs[ordinal % len(procs)]
        seen = set()
        for shard in leaf.addressable_shards:
            key = _index_key(shard.index)
            if key in seen or owners[key] != proc:
                continue
            seen.add(key)
            my_entries[_entry_name(i, key)] = np.asarray(shard.data)
        leaf_meta.append(('array', (leaf.shape, np.dtype(leaf.dtype),
                                    sorted(owners.items()))))

    np.savez(dirpath / f'shards_p{proc}.npz', **my_entries)
    if proc == 0:
        skeleton = jax.tree_util.tree_map(lambda _: _LEAF, tree)
        with open(dirpath / (_META + '.tmp'), 'wb') as f:
            pickle.dump({'skeleton': skeleton, 'leaf_meta': leaf_meta,
                         'host_payload': host_payload or {},
                         'process_count': jax.process_count()}, f)
        (dirpath / (_META + '.tmp')).rename(dirpath / _META)


def is_sharded_checkpoint(path) -> bool:
    return Path(path).is_dir() and (Path(path) / _META).exists()


def load_sharded_pytree(dirpath, shardings_tree) -> Tuple[Any, Dict]:
    """Rebuild the pytree as global arrays under ``shardings_tree``.

    ``shardings_tree`` mirrors the saved tree with a ``jax.sharding.Sharding``
    (or None for host leaves) at each array position — typically produced by
    re-running the same init path that produced the saved state.  Returns
    ``(tree, host_payload)``.  Each process reads only the npz entries its
    addressable shards need.
    """
    dirpath = Path(dirpath)
    with open(dirpath / _META, 'rb') as f:
        meta = pickle.load(f)
    skeleton = meta['skeleton']
    leaf_meta = meta['leaf_meta']

    # lazily-opened npz per process file; entries map for lookup
    files = {}

    def _npz(p):
        if p not in files:
            files[p] = np.load(dirpath / f'shards_p{p}.npz')
        return files[p]

    entry_owner: Dict[str, int] = {}
    for i, (kind, info) in enumerate(leaf_meta):
        if kind != 'array':
            continue
        _, _, owners = info
        for key, owner in owners:
            entry_owner[_entry_name(i, tuple(key))] = owner

    placeholders, treedef = jax.tree_util.tree_flatten(skeleton)
    shard_leaves = jax.tree_util.tree_leaves(shardings_tree)
    if len(shard_leaves) != len(placeholders):
        raise ValueError(
            f'shardings tree has {len(shard_leaves)} leaves; checkpoint '
            f'has {len(placeholders)}')

    out_leaves = []
    for i, (kind, info) in enumerate(leaf_meta):
        if kind == 'host':
            out_leaves.append(info)
            continue
        shape, dtype, owners = info
        sharding = shard_leaves[i]

        def _cb(index, _i=i):
            name = _entry_name(_i, _index_key(index))
            owner = entry_owner.get(name)
            if owner is not None:
                return _npz(owner)[name]
            # restore sharding differs from the saved one: assemble this
            # shard from the overlapping saved pieces (rare path — e.g.
            # loading a mesh-sharded checkpoint on one device)
            want = tuple(
                slice(s.start or 0, s.stop if s.stop is not None else dim)
                for s, dim in zip(index, shape))
            buf = np.empty([s.stop - s.start for s in want], dtype)
            for key, owner in leaf_meta[_i][1][2]:
                saved = tuple(
                    slice(k[0] or 0, k[1] if k[1] is not None else dim)
                    for k, dim in zip(key, shape))
                inter = tuple(slice(max(a.start, b.start), min(a.stop, b.stop))
                              for a, b in zip(want, saved))
                if any(s.start >= s.stop for s in inter):
                    continue
                piece = _npz(owner)[_entry_name(_i, tuple(key))]
                src = tuple(slice(s.start - sv.start, s.stop - sv.start)
                            for s, sv in zip(inter, saved))
                dst = tuple(slice(s.start - w.start, s.stop - w.start)
                            for s, w in zip(inter, want))
                buf[dst] = piece[src]
            return buf

        out_leaves.append(jax.make_array_from_callback(
            tuple(shape), sharding, _cb))

    tree = jax.tree_util.tree_unflatten(treedef, out_leaves)
    return tree, meta['host_payload']
