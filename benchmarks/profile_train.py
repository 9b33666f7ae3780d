"""Training-throughput attribution: where does each microsecond go?

Ablates the whole-epoch scan program (VERDICT round 1, items 3/5): the same
epoch data runs through progressively larger slices of the train step —

  sampling  : on-device shuffle + complement negative sampling only
  forward   : + pos/neg scoring and the loss (no grad)
  backward  : + value_and_grad (dense embedding-table grads via scatter-add)
  optimizer : + every OptimizerSpec update (= the full production epoch)

so (t[stage_i] - t[stage_i-1]) attributes wall-clock to each stage.  Also
sweeps batch size and a bfloat16-embeddings variant at the gate config and at
the dim-32 scale config.

Run on TPU:  python benchmarks/profile_train.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def build_data(num_users, num_items, num_interactions, seed=42):
    from collie_tpu.data.synthetic import generate_implicit_interactions

    return generate_implicit_interactions(num_users=num_users,
                                          num_items=num_items,
                                          num_interactions=num_interactions,
                                          num_negative_samples=10, seed=seed)


def build_stage_fns(model, loader, dedup_rounds=1):
    """Epoch programs for each ablation stage, sharing the scan engine's
    exact epoch-batch materialization."""
    from collie_tpu.training import scan_engine

    specs = model.optimizer_specs()
    active = [True] * len(specs)

    full_fn, data, S, n_used = scan_engine.build_scan_epoch_fns(
        model, specs, active, loader, shuffle=True, training=True,
        dedup_rounds=dedup_rounds)

    inter = loader.interactions
    B = loader.batch_size
    K = inter.num_negative_samples
    num_items = inter.num_items

    from collie_tpu.ops.device_sampling import (
        complement_sample_negatives_bucketed_impl,
        complement_sample_negatives_impl,
        complement_sample_negatives_padded_impl)

    n = inter.num_interactions
    pad = S * B - n_used

    def epoch_batches(data, rng):
        perm_rng, sample_rng = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, n)[:n_used]
        idx = jnp.concatenate([perm, perm[:1].repeat(pad)]) if pad else perm
        users_flat = data['rows'][idx]
        if 'bucket_specs' in data:  # engine auto-selected the bucketed sampler
            negs = complement_sample_negatives_bucketed_impl(
                sample_rng, idx, data['pos_of'], data['users_g'],
                data['bucket_specs'], data['row_counts'], num_items, K,
                dedup_rounds=dedup_rounds)
        elif 'shifted_pad' in data:   # padded sampler (COLLIE_TPU_SAMPLER=padded)
            negs = complement_sample_negatives_padded_impl(
                sample_rng, users_flat, data['shifted_pad'],
                data['row_counts'], num_items, K, dedup_rounds=dedup_rounds)
        else:
            negs = complement_sample_negatives_impl(
                sample_rng, users_flat, data['indptr'], data['shifted_cols'],
                num_items, K, dedup_rounds=dedup_rounds)
        return {
            'users': users_flat.reshape(S, B),
            'pos_items': data['cols'][idx].reshape(S, B),
            'neg_items': negs.reshape(S, B, K),
            'mask': data['mask_flat'].reshape(S, B),
        }

    @jax.jit
    def sampling_only(data, rng):
        batches = epoch_batches(data, rng)
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + x.sum(), batches, jnp.float32(0))

    @jax.jit
    def forward_only(params, data, rng):
        batches = epoch_batches(data, rng)

        def step(carry, batch):
            loss = model.calculate_loss(params, batch, rng=None, training=False)
            return carry + loss, None

        total, _ = jax.lax.scan(step, jnp.float32(0), batches)
        return total

    @jax.jit
    def backward_only(params, data, rng):
        batches = epoch_batches(data, rng)

        def step(carry, batch):
            loss, grads = jax.value_and_grad(
                lambda p: model.calculate_loss(p, batch, rng=None,
                                               training=True))(params)
            gsum = jax.tree_util.tree_reduce(
                lambda acc, g: acc + g.sum(), grads, jnp.float32(0))
            return carry + loss + 0.0 * gsum, None

        total, _ = jax.lax.scan(step, jnp.float32(0), batches)
        return total

    return {
        'sampling': lambda params, opt_states, data, rng:
            sampling_only(data, rng),
        'forward': lambda params, opt_states, data, rng:
            forward_only(params, data, rng),
        'backward': lambda params, opt_states, data, rng:
            backward_only(params, data, rng),
        'optimizer': lambda params, opt_states, data, rng:
            full_fn(dict(params), opt_states, data, rng, np.int32(1)),
    }, data, specs, n_used


def time_stages(model, loader, iters=5):
    stage_fns, data, specs, n_used = build_stage_fns(model, loader)
    # host snapshot BEFORE any donating call: the full epoch fn donates its
    # params/opt_states buffers, which would delete model.params' arrays
    host_params = {k: np.asarray(v) for k, v in model.params.items()}

    def fresh_state():
        params = {k: jnp.asarray(v) for k, v in host_params.items()}
        states = tuple(jax.jit(spec.transform.init)(
            {k: params[k] for k in spec.keys}) for spec in specs)
        jax.block_until_ready((params, states))
        return params, states

    rng = jax.random.PRNGKey(0)
    results = {}
    for name, fn in stage_fns.items():
        params, states = fresh_state()
        out = fn(params, states, data, rng)          # compile + warm
        jax.block_until_ready(out)
        if name == 'optimizer':
            # donating epoch fn: rebuild inputs per lap, time only the call
            laps = []
            for _ in range(iters):
                params, states = fresh_state()
                t1 = time.perf_counter()
                out = fn(params, states, data, rng)
                jax.block_until_ready(out)
                laps.append(time.perf_counter() - t1)
            lap = float(np.median(laps))
        else:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(params, states, data, rng)
            jax.block_until_ready(out)
            lap = (time.perf_counter() - t0) / iters
        results[name] = lap
    results['examples'] = n_used
    return results


def profile_config(num_users, num_items, num_interactions, dim, batch_size,
                   dtype=None):
    from collie_tpu.data import InteractionsDataLoader
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel

    inter = build_data(num_users, num_items, num_interactions)
    loader = InteractionsDataLoader(interactions=inter, batch_size=batch_size,
                                    shuffle=True, seed=0)
    # dtype exercises the SHIPPED path (``embeddings_dtype``): bf16 gathers
    # with f32-accumulated backward and f32 optimizer math — not a bare
    # params cast, whose bf16 moments degrade quality (docs/TUNING.md)
    dtype_name = 'bfloat16' if dtype == jnp.bfloat16 else 'float32'
    model = MatrixFactorizationModel(train=loader, embedding_dim=dim, lr=1e-1,
                                     loss='adaptive', seed=0,
                                     embeddings_dtype=dtype_name)
    stages = time_stages(model, loader)
    n = stages.pop('examples')
    out = {
        'config': {'num_users': num_users, 'num_items': num_items,
                   'interactions': num_interactions, 'dim': dim,
                   'batch_size': batch_size,
                   'dtype': dtype_name},
        'epoch_ms': {k: round(v * 1e3, 2) for k, v in stages.items()},
        'attribution_ms': {
            'sampling': round(stages['sampling'] * 1e3, 2),
            'forward_loss': round((stages['forward'] - stages['sampling']) * 1e3, 2),
            'backward': round((stages['backward'] - stages['forward']) * 1e3, 2),
            'optimizer_update': round(
                (stages['optimizer'] - stages['backward']) * 1e3, 2),
        },
        'examples_per_sec_full': round(n / stages['optimizer'], 1),
    }
    return out


def main():
    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:          # run as `python benchmarks/x.py`
        from _watchdog import device_watchdog
    device_watchdog(label='profile_train')
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('--full-scale', action='store_true',
                        help='also attribute the full ML-10M config '
                             '(10M interactions; adds ~10 min of data gen '
                             'and remote compiles)')
    args = parser.parse_args()

    results = {'backend': jax.default_backend(), 'runs': []}
    # gate config + batch sweep
    for batch in (1024, 4096, 8192):
        results['runs'].append(profile_config(943, 1682, 100_000, 10, batch))
        print(json.dumps(results['runs'][-1]), flush=True)
    # dim-32 scale config (1M interactions) + batch sweep
    for batch in (8192, 32768):
        results['runs'].append(profile_config(69_878, 10_677, 1_000_000, 32,
                                              batch))
        print(json.dumps(results['runs'][-1]), flush=True)
    # bf16 embeddings experiment at the scale config
    results['runs'].append(profile_config(69_878, 10_677, 1_000_000, 32, 8192,
                                          dtype=jnp.bfloat16))
    print(json.dumps(results['runs'][-1]), flush=True)
    if args.full_scale:
        # the configuration bench_ml10m_scale.py trains (degree skew at full
        # size is what separates the samplers)
        results['runs'].append(profile_config(72_000, 10_000, 10_000_000, 32,
                                              8192))
        print(json.dumps(results['runs'][-1]), flush=True)

    if jax.default_backend() == 'tpu':
        with open(Path(__file__).parent / 'profile_train_results.json',
                  'w') as f:
            json.dump(results, f, indent=2)
    else:
        print('# non-TPU backend: not overwriting profile_train_results.json',
              flush=True)


if __name__ == '__main__':
    main()
