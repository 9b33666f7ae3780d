"""Price the headline config's EPOCH MATERIALIZATION, piece by piece.

Round-5 bridge measurements: the real step body (autodiff + optax, fused
tables) runs at 5.33 ms/step at the headline config — at the 5.06 ms
roofline floor — while the engine measures 9.34 ms/step.  The entire gap
is therefore `_epoch_batches` (scan_engine.py): the per-epoch shuffle,
packed id gather, exact bucketed negative sampling, and the [S, B(, K)]
reshapes.  This experiment times that sequence and its pieces as separate
amortized jitted programs at the real headline shapes (real training
matrix, real sampler tables):

  all          the full materialization sequence
  sample_only  the bucketed complement sampler alone (count + substitute)
  shuffle_only feistel permutation + packed-pair epoch gather + reshapes
  randint_only the approximate sampler's single randint (baseline)

Run: python benchmarks/exp_headline_materialize.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

U, I, D, B, K = 72_000, 10_000, 32, 65_536, 10
ITERS = 16


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='exp_headline_materialize')

    import jax
    import jax.numpy as jnp
    from collie_tpu.data import stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions
    from collie_tpu.ops.device_sampling import (
        build_bucketed_complement_tables,
        complement_sample_negatives_bucketed_impl)
    from collie_tpu.ops.shuffle import feistel_permutation

    inter = generate_implicit_interactions(
        num_users=U, num_items=I, num_interactions=10_000_000,
        num_negative_samples=K, affinity_bias=3.0, seed=7)
    train, _, _ = stratified_split(inter, val_p=0.05, test_p=0.05, seed=7,
                                   force_split=True)
    n = train.num_interactions
    S = -(-n // B)
    n_used = n
    pad = S * B - n
    print(f'{n} interactions, S={S}', flush=True)

    item_bits = max(int(I - 1).bit_length(), 1)
    packed = jnp.asarray((train.mat.row.astype(np.int64) << item_bits
                          | train.mat.col.astype(np.int64)).astype(np.int32))
    mask_flat = jnp.asarray(np.concatenate([
        np.ones(n_used, np.float32), np.zeros(pad, np.float32)]))
    (specs_np, counts_np, users_g_np,
     pos_of_np) = build_bucketed_complement_tables(train.mat, train.mat.row)
    bucket_specs = tuple((jnp.asarray(r), jnp.asarray(t))
                         for r, t in specs_np)
    row_counts = jnp.asarray(counts_np)
    users_g = jnp.asarray(users_g_np)
    pos_of = jnp.asarray(pos_of_np)

    def materialize(key, with_sample=True, with_shuffle=True):
        perm_rng, sample_rng = jax.random.split(key)
        if with_shuffle:
            perm = feistel_permutation(perm_rng, n)[:n_used]
        else:
            perm = jnp.arange(n_used)
        idx = jnp.concatenate([perm, perm[:1].repeat(pad)]) if pad else perm
        pk = packed[idx]
        users_flat = pk >> item_bits
        cols_flat = pk & ((1 << item_bits) - 1)
        out = [users_flat.reshape(S, B), cols_flat.reshape(S, B),
               mask_flat.reshape(S, B)]
        if with_sample:
            negs = complement_sample_negatives_bucketed_impl(
                sample_rng, idx, pos_of, users_g, bucket_specs, row_counts,
                I, K, dedup_rounds=1)
            out.append(negs.reshape(S, B, K))
        return out

    def bench(name, fn):
        @jax.jit
        def many(key):
            def body(k, _):
                k, sub = jax.random.split(k)
                outs = fn(sub)
                # consume every output so nothing is dead-code eliminated,
                # varying the key per iteration so nothing hoists
                acc = sum(jnp.sum(o[0].astype(jnp.float32)) for o in outs)
                return k, acc
            _, accs = jax.lax.scan(body, key, None, length=ITERS)
            return accs.sum()

        key = jax.random.PRNGKey(0)
        float(many(key))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(key))
            best = min(best, time.perf_counter() - t0)
        per_epoch = best / ITERS
        print(json.dumps({name: {'ms_per_epoch': round(per_epoch * 1e3, 1),
                                 'ms_per_step': round(per_epoch / S * 1e3,
                                                      3)}}), flush=True)
        return per_epoch

    # round-5 slot-domain composition (the shipped fast path): ids + a
    # validity bit at slot positions, one combined[feistel(N_g)] row gather
    from collie_tpu.ops.device_sampling import (
        complement_sample_negatives_bucketed_grouped_impl)
    N_g = users_g.shape[0]
    packed_np = np.zeros(N_g, np.int32)
    packed_np[pos_of_np] = np.asarray(
        (train.mat.row.astype(np.int64) << item_bits
         | train.mat.col.astype(np.int64)).astype(np.int32))
    slot_mask_np = np.zeros(N_g, np.int32)
    slot_mask_np[pos_of_np] = 1
    packed_slots = jnp.asarray(packed_np)
    slot_mask = jnp.asarray(slot_mask_np)
    S_g = -(-N_g // B)
    tail_g = S_g * B - N_g

    def slot_domain(key):
        perm_rng, sample_rng = jax.random.split(key)
        sigma = feistel_permutation(perm_rng, N_g)
        sidx = jnp.concatenate([sigma, sigma[:1].repeat(tail_g)]) \
            if tail_g else sigma
        negs_g = complement_sample_negatives_bucketed_grouped_impl(
            sample_rng, users_g, bucket_specs, row_counts, I, K,
            dedup_rounds=1)
        combined = jnp.concatenate(
            [packed_slots[:, None], slot_mask[:, None], negs_g], axis=1)
        rows = combined[sidx]
        pk = rows[:, 0]
        return [(pk >> item_bits).reshape(S_g, B),
                (pk & ((1 << item_bits) - 1)).reshape(S_g, B),
                rows[:, 1].reshape(S_g, B),
                jnp.minimum(rows[:, 2:], I - 1).reshape(S_g, B, K)]

    results = {}
    results['all'] = bench('all', lambda k: materialize(k))
    results['slot_domain'] = bench('slot_domain', slot_domain)
    results['sample_only'] = bench(
        'sample_only', lambda k: materialize(k, with_shuffle=False))
    results['shuffle_only'] = bench(
        'shuffle_only', lambda k: materialize(k, with_sample=False))

    def randint_only(key):
        negs = jax.random.randint(key, (S * B, K), 0, I, dtype=jnp.int32)
        return [negs.reshape(S, B, K)]
    results['randint_only'] = bench('randint_only', randint_only)

    out = {k: {'ms_per_epoch': round(v * 1e3, 1),
               'ms_per_step': round(v / S * 1e3, 3)}
           for k, v in results.items()}
    (Path(__file__).parent / 'headline_materialize.json').write_text(
        json.dumps(out, indent=2) + '\n')


if __name__ == '__main__':
    main()
