"""Out-of-core (HDF5) training throughput vs the in-memory scan tier.

Round-4 finding: the per-step HDF5 path ran at 44% of in-memory throughput
and its PrefetchLoader producer thread measured NO benefit (0.973x) — on the
async-dispatch axon backend the per-step host work was never the bottleneck;
the ~2 ms tunnel dispatch per batch was.  Round 5 adds the chunked scan tier
(``scan_engine.build_hdf5_chunk_make``): one dispatched program per
``COLLIE_TPU_HDF5_CHUNK_STEPS`` batches, with the host's h5py read of chunk
``c+1`` overlapping the device compute of chunk ``c``.  Paths measured:

  hdf5_chunk    HDF5InteractionsDataLoader, chunked scan tier (the default)
  hdf5_step     same loader, forced per-step engine (epoch_mode='step')
  hdf5_prefetch PrefetchLoader(loader), per-step engine (producer thread)
  in_memory     Interactions (whole-epoch scan engine, the fast tier)

Timing: first epoch is compile + cache warmup and is discarded; each
remaining epoch is wall-clocked host-side (the epoch loop ends in a host
readback of the epoch loss, which is a true sync point on the axon
backend — block_until_ready is not).

Run on the real TPU: `python benchmarks/bench_outofcore.py` (~5-10 min).
Writes benchmarks/outofcore_results.json.

Reference counterpart: ``collie/interactions/dataloaders.py:297-397``
(HDF5InteractionsDataLoader) — the reference publishes no out-of-core
throughput number of its own.
"""
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

N_INTERACTIONS = 2_000_000
NUM_USERS = 40_000
NUM_ITEMS = 8_000
BATCH_SIZE = 8192
EPOCHS = 4                      # 1 warmup + 3 timed
EMBEDDING_DIM = 32
K_NEG = 10

if os.environ.get('COLLIE_TPU_SMOKE'):      # tiny-scale CI shape check
    N_INTERACTIONS, NUM_USERS, NUM_ITEMS, BATCH_SIZE = 20_000, 500, 300, 1024


def make_data(rng):
    users = rng.integers(0, NUM_USERS, N_INTERACTIONS * 2)
    items = rng.integers(0, NUM_ITEMS, N_INTERACTIONS * 2)
    key = users.astype(np.int64) * NUM_ITEMS + items
    _, first = np.unique(key, return_index=True)
    first = first[:N_INTERACTIONS]
    return users[first].astype(np.int32), items[first].astype(np.int32)


def timed_fit(model_builder, label, epoch_mode='auto'):
    from collie_tpu.model import CollieTrainer
    model = model_builder()
    trainer = CollieTrainer(model=model, max_epochs=1, verbosity=0,
                            epoch_mode=epoch_mode)
    t0 = time.perf_counter()
    trainer.fit(model)                      # compile + warmup epoch
    warmup = time.perf_counter() - t0
    epochs = []
    for _ in range(EPOCHS - 1):
        trainer.max_epochs += 1             # reference-parity mutability
        t0 = time.perf_counter()
        trainer.fit(model)
        epochs.append(time.perf_counter() - t0)
    med = float(np.median(epochs))
    n = model.train_loader.num_interactions
    print(f'{label:16s} warmup {warmup:6.1f}s   epoch {med:6.2f}s   '
          f'{n / med / 1e6:6.2f}M ex/s', flush=True)
    return {'label': label, 'warmup_s': round(warmup, 2),
            'epoch_s': [round(e, 3) for e in epochs],
            'median_epoch_s': round(med, 3),
            'examples_per_sec': round(n / med)}


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:          # run as `python benchmarks/x.py`
        from _watchdog import device_watchdog
    device_watchdog(label='bench_outofcore')
    from collie_tpu.data import (HDF5InteractionsDataLoader, PrefetchLoader,
                                 write_hdf5_meta)
    from collie_tpu.interactions import Interactions
    from collie_tpu.model import MatrixFactorizationModel

    rng = np.random.default_rng(0)
    users, items = make_data(rng)
    print(f'{len(users)} interactions, {NUM_USERS} users, {NUM_ITEMS} items',
          flush=True)

    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, 'interactions.h5')
    import h5py
    with h5py.File(path, 'w') as f:
        g = f.require_group('interactions')
        g.create_dataset('user_id', data=users)
        g.create_dataset('item_id', data=items)
    write_hdf5_meta(path, NUM_USERS, NUM_ITEMS)
    print(f'HDF5 file: {os.path.getsize(path) / 1e6:.1f} MB', flush=True)

    def build_hdf5(prefetch):
        loader = HDF5InteractionsDataLoader(
            hdf5_path=path, batch_size=BATCH_SIZE, shuffle=True,
            num_negative_samples=K_NEG, seed=0)
        if prefetch:
            loader = PrefetchLoader(loader)
        return MatrixFactorizationModel(
            train=loader, embedding_dim=EMBEDDING_DIM, lr=1e-3,
            loss='adaptive_hinge')

    def build_memory():
        inter = Interactions(users=users, items=items,
                             num_negative_samples=K_NEG,
                             allow_missing_ids=True)
        return MatrixFactorizationModel(
            train=inter, embedding_dim=EMBEDDING_DIM, lr=1e-3,
            loss='adaptive_hinge')

    results = [
        timed_fit(lambda: build_hdf5(prefetch=False), 'hdf5_chunk'),
        timed_fit(lambda: build_hdf5(prefetch=False), 'hdf5_step',
                  epoch_mode='step'),
        timed_fit(lambda: build_hdf5(prefetch=True), 'hdf5_prefetch',
                  epoch_mode='step'),
        timed_fit(build_memory, 'in_memory'),
    ]
    by = {r['label']: r for r in results}
    overlap = (by['hdf5_step']['median_epoch_s']
               / by['hdf5_prefetch']['median_epoch_s'])
    chunk_vs_memory = (by['hdf5_chunk']['examples_per_sec']
                       / by['in_memory']['examples_per_sec'])
    chunk_vs_step = (by['hdf5_chunk']['examples_per_sec']
                     / by['hdf5_step']['examples_per_sec'])
    out = {
        'config': {'n_interactions': int(len(users)), 'num_users': NUM_USERS,
                   'num_items': NUM_ITEMS, 'batch_size': BATCH_SIZE,
                   'embedding_dim': EMBEDDING_DIM, 'k_neg': K_NEG,
                   'chunk_steps': int(os.environ.get(
                       'COLLIE_TPU_HDF5_CHUNK_STEPS', '64'))},
        'results': results,
        'prefetch_speedup': round(overlap, 3),
        'chunk_vs_in_memory': round(chunk_vs_memory, 3),
        'chunk_vs_per_step': round(chunk_vs_step, 3),
    }
    if not os.environ.get('COLLIE_TPU_SMOKE'):
        dest = Path(__file__).parent / 'outofcore_results.json'
        dest.write_text(json.dumps(out, indent=2) + '\n')
    print(json.dumps(out['results'], indent=2))
    print(f'prefetch speedup (per-step): {overlap:.3f}x', flush=True)
    print(f'chunk tier vs in-memory: {chunk_vs_memory:.3f}x, '
          f'vs per-step: {chunk_vs_step:.3f}x', flush=True)


if __name__ == '__main__':
    main()
