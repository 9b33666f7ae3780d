"""Round-5 count-pass variants, timed correctly (amortized inside one jit).

exp_headline_materialize.py priced the exact bucketed sampler at
250-395 ms/epoch at the headline config — 10-40x its theoretical
compare-op + gather cost, pointing at the [chunk, W, P] broadcast-compare
intermediate.  The round-4 exp_count_* experiments probed this but their
timing loops retraced per iteration (ADVICE r4); this one re-runs the
candidates with the real bucket tables and honest amortized timing:

  base        current: [c, W, P] broadcast compare, sum over P
  per_draw    W separate [c, P] compares (small intermediates)
  i16         base but table + draws compared as int16 (num_items < 32768)
  per_draw16  per_draw + int16
  transpose   compare as [W, c, P] (draw-major) — layout probe

Each variant runs the FULL sampler pipeline (draws + counts over every
bucket + spare dedup), so the winner is directly transplantable.

Run: python benchmarks/exp_count_r5.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

U, I, B, K = 72_000, 10_000, 65_536, 10
ITERS = 16


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='exp_count_r5')

    import jax
    import jax.numpy as jnp
    from collie_tpu.data import stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions
    from collie_tpu.ops.device_sampling import build_bucketed_complement_tables

    inter = generate_implicit_interactions(
        num_users=U, num_items=I, num_interactions=10_000_000,
        num_negative_samples=K, affinity_bias=3.0, seed=7)
    train, _, _ = stratified_split(inter, val_p=0.05, test_p=0.05, seed=7,
                                   force_split=True)
    n = train.num_interactions
    (specs_np, counts_np, users_g_np,
     pos_of_np) = build_bucketed_complement_tables(train.mat, train.mat.row)
    print(f'{n} interactions; buckets: '
          f'{[(r.shape[0], t.shape[1]) for r, t in specs_np]}', flush=True)
    specs32 = tuple((jnp.asarray(r), jnp.asarray(t)) for r, t in specs_np)
    specs16 = tuple((jnp.asarray(r), jnp.asarray(t.astype(np.int16)))
                    for r, t in specs_np)
    row_counts = jnp.asarray(counts_np)
    users_g = jnp.asarray(users_g_np)
    N_g = users_g.shape[0]
    W = K + 2
    sizes = jnp.maximum((I - row_counts[users_g])[:, None].astype(jnp.int32),
                        1)
    CHUNK = 8192

    def make_counts(specs, mode):
        def count_grouped(r):
            outs = []
            off = 0
            for row_idx_b, table_b in specs:
                nb = int(row_idx_b.shape[0])
                r_b = r[off:off + nb]
                off += nb
                cast = (lambda x: x.astype(jnp.int16)) if '16' in mode \
                    else (lambda x: x)

                def one_chunk(args, _table=table_b, _cast=cast):
                    row_c, r_c = args
                    rows_c = _table[row_c]                   # [c, P]
                    if mode in ('base', 'i16'):
                        return jnp.sum(
                            rows_c[:, None, :] <= _cast(r_c)[:, :, None],
                            axis=-1, dtype=jnp.int32)
                    if mode in ('per_draw', 'per_draw16'):
                        cols = [jnp.sum(rows_c <= _cast(r_c)[:, w:w + 1],
                                        axis=-1, dtype=jnp.int32)
                                for w in range(W)]
                        return jnp.stack(cols, axis=1)
                    # transpose: draw-major compare
                    rt = _cast(r_c).T                        # [W, c]
                    return jnp.sum(rows_c[None] <= rt[:, :, None],
                                   axis=-1, dtype=jnp.int32).T

                if nb <= CHUNK:
                    outs.append(one_chunk((row_idx_b, r_b)))
                else:
                    outs.append(jax.lax.map(
                        one_chunk, (row_idx_b.reshape(-1, CHUNK),
                                    r_b.reshape(-1, CHUNK, W))
                    ).reshape(nb, W))
            return jnp.concatenate(outs, axis=0)
        return count_grouped

    def make_sampler(specs, mode):
        count_grouped = make_counts(specs, mode)

        def sample(key):
            u01 = jax.random.uniform(key, (N_g, W))
            r = jnp.minimum((u01 * sizes).astype(jnp.int32), sizes - 1)
            all_draws = r + count_grouped(r)
            negatives = all_draws[:, :K]
            spares = all_draws[:, K:K + 2]
            dup = jnp.zeros_like(negatives, dtype=bool)
            srt = jnp.sort(negatives, axis=1)
            # cheap within-row duplicate mask proxy (same op class as the
            # engine's) — identical across variants, so it cancels
            dup = dup.at[:, 1:].set(srt[:, 1:] == srt[:, :-1])
            dup_rank = jnp.cumsum(dup, axis=1) - 1
            subst = jnp.where(dup_rank == 0, spares[:, :1], spares[:, 1:2])
            negatives = jnp.where(dup & (dup_rank < 2), subst, negatives)
            return negatives
        return sample

    results = {}
    for mode, specs in (('base', specs32), ('per_draw', specs32),
                        ('i16', specs16), ('per_draw16', specs16),
                        ('transpose', specs32)):
        sample = make_sampler(specs, mode)

        @jax.jit
        def many(key, _sample=sample):
            def body(k, _):
                k, sub = jax.random.split(k)
                return k, jnp.sum(_sample(sub)[:, 0].astype(jnp.float32))
            _, accs = jax.lax.scan(body, key, None, length=ITERS)
            return accs.sum()

        key = jax.random.PRNGKey(0)
        float(many(key))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(key))
            best = min(best, time.perf_counter() - t0)
        per_epoch = best / ITERS * 1e3
        results[mode] = round(per_epoch, 1)
        print(json.dumps({mode: {'ms_per_epoch': results[mode]}}),
              flush=True)

    (Path(__file__).parent / 'count_r5.json').write_text(
        json.dumps(results, indent=2) + '\n')


if __name__ == '__main__':
    main()
