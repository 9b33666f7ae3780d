"""Locate the real cost inside the exact bucketed sampler (round 5).

exp_count_r5.py measured the count-pass core at ~77 ms/epoch regardless of
layout/dtype — but consumed only draw column 0, which lets XLA slice the
compare.  exp_headline_materialize.py priced the FULL sampler call at
250-395 ms/epoch.  This experiment splits the difference with honest
full-output consumption:

  core_full     draws + counts + spare dedup, ALL columns consumed,
                grouped order (no reorder)
  dupmask_real  core_full but with the engine's _duplicate_within_row_mask
  real_seq      the actual complement_sample_negatives_bucketed_impl,
                idx = arange (sequential reorder)
  real_shuf     same, idx = a random permutation (the engine's case)
  reorder_only  gather a precomputed [N_g, K] table by pos_of[perm]

Run: python benchmarks/exp_sampler_r5.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

U, I, B, K = 72_000, 10_000, 65_536, 10
ITERS = 8


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='exp_sampler_r5')

    import jax
    import jax.numpy as jnp
    from collie_tpu.data import stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions
    from collie_tpu.ops.device_sampling import (
        _duplicate_within_row_mask, build_bucketed_complement_tables,
        complement_sample_negatives_bucketed_impl)

    inter = generate_implicit_interactions(
        num_users=U, num_items=I, num_interactions=10_000_000,
        num_negative_samples=K, affinity_bias=3.0, seed=7)
    train, _, _ = stratified_split(inter, val_p=0.05, test_p=0.05, seed=7,
                                   force_split=True)
    n = train.num_interactions
    (specs_np, counts_np, users_g_np,
     pos_of_np) = build_bucketed_complement_tables(train.mat, train.mat.row)
    specs = tuple((jnp.asarray(r), jnp.asarray(t)) for r, t in specs_np)
    row_counts = jnp.asarray(counts_np)
    users_g = jnp.asarray(users_g_np)
    pos_of = jnp.asarray(pos_of_np)
    N_g = users_g.shape[0]
    W = K + 2
    sizes = jnp.maximum((I - row_counts[users_g])[:, None].astype(jnp.int32),
                        1)
    CHUNK = 8192
    perm = jnp.asarray(np.random.default_rng(0).permutation(n)
                       .astype(np.int32))
    seq = jnp.arange(n, dtype=jnp.int32)

    def count_grouped(r):
        outs = []
        off = 0
        for row_idx_b, table_b in specs:
            nb = int(row_idx_b.shape[0])
            r_b = r[off:off + nb]
            off += nb

            def one_chunk(args, _table=table_b):
                row_c, r_c = args
                rows_c = _table[row_c]
                return jnp.sum(rows_c[:, None, :] <= r_c[:, :, None],
                               axis=-1, dtype=jnp.int32)

            if nb <= CHUNK:
                outs.append(one_chunk((row_idx_b, r_b)))
            else:
                outs.append(jax.lax.map(
                    one_chunk, (row_idx_b.reshape(-1, CHUNK),
                                r_b.reshape(-1, CHUNK, W))
                ).reshape(nb, W))
        return jnp.concatenate(outs, axis=0)

    def core(key, dup_fn):
        u01 = jax.random.uniform(key, (N_g, W))
        r = jnp.minimum((u01 * sizes).astype(jnp.int32), sizes - 1)
        all_draws = r + count_grouped(r)
        negatives = all_draws[:, :K]
        spares = all_draws[:, K:K + 2]
        dup = dup_fn(negatives)
        dup_rank = jnp.cumsum(dup, axis=1) - 1
        subst = jnp.where(dup_rank == 0, spares[:, :1], spares[:, 1:2])
        negatives = jnp.where(dup & (dup_rank < 2), subst, negatives)
        return negatives

    def sort_dup(negatives):
        srt = jnp.sort(negatives, axis=1)
        dup = jnp.zeros_like(negatives, dtype=bool)
        return dup.at[:, 1:].set(srt[:, 1:] == srt[:, :-1])

    rnd_table = jnp.asarray(np.random.default_rng(1)
                            .integers(0, I, (N_g, K)).astype(np.int32))

    cases = {
        'core_full': lambda k: core(k, sort_dup),
        'dupmask_real': lambda k: core(k, _duplicate_within_row_mask),
        'real_seq': lambda k: complement_sample_negatives_bucketed_impl(
            k, seq, pos_of, users_g, specs, row_counts, I, K,
            dedup_rounds=1),
        'real_shuf': lambda k: complement_sample_negatives_bucketed_impl(
            k, perm, pos_of, users_g, specs, row_counts, I, K,
            dedup_rounds=1),
        'reorder_only': lambda k: rnd_table[pos_of[perm]]
        + jax.random.randint(k, (1,), 0, 2, dtype=jnp.int32)[0],
    }

    results = {}
    for name, fn in cases.items():
        @jax.jit
        def many(key, _fn=fn):
            def body(k, _):
                k, sub = jax.random.split(k)
                # consume EVERYTHING: full-tensor float sum
                return k, jnp.sum(_fn(sub).astype(jnp.float32))
            _, accs = jax.lax.scan(body, key, None, length=ITERS)
            return accs.sum()

        key = jax.random.PRNGKey(0)
        float(many(key))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(key))
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best / ITERS * 1e3, 1)
        print(json.dumps({name: {'ms_per_epoch': results[name]}}),
              flush=True)

    (Path(__file__).parent / 'sampler_r5.json').write_text(
        json.dumps(results, indent=2) + '\n')


if __name__ == '__main__':
    main()
