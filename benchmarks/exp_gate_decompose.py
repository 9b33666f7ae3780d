"""Decompose the GATE config's above-floor step time (VERDICT r4 weak #3).

roofline.json: the gate config (MF dim 10, B=1024, K=10, ML-100K scale)
measures 0.308 ms/step against a 0.073 ms floor — 24% efficiency, while the
headline config reaches 54%.  The headline gap got a per-op decomposition;
this script gives the gate config the same treatment:

Part A — engine ablation (subprocess per variant, env knobs bind at
program-build time), each timed as best-of-3 steady whole-fit dispatches:

  base        current defaults (exact bucketed sampler, dedup 1, feistel,
              fused tables, bf16 select)
  approx      approximate sampling (iid randint — no count pass, no dedup)
  dedup0      exact sampler, dedup rounds 0
  noshuffle   loader shuffle=False (no feistel, no epoch gather)
  unfused     COLLIE_TPU_FUSED_TABLES=0 (named layout: 4 scatters not 2)

Part B — a floor+scan program: ``lax.scan`` over S steps whose body holds
ONLY the roofline floor ops at gate shapes (fused-layout gathers, loss
math, 2 scatters, dense Adam), amortized across ITERS epochs inside one
jit.  The roofline's floor times the ops WITHOUT scan structure; the delta
between floor+scan and the raw floor is the per-step cost of the scan
machinery itself (carry threading, loop overhead) — cost that NO engine
restructuring at B=1024 can remove short of fusing steps together, which
changes optimizer semantics.

Run: python benchmarks/exp_gate_decompose.py            (orchestrates all)
     python benchmarks/exp_gate_decompose.py --variant base
Writes benchmarks/gate_decompose.json.
"""
import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

EPOCHS = 10
B = 1024
DIM = 10
K = 10
ITERS = 64          # floor+scan amortization epochs inside one jit

VARIANTS = {
    'base': {},
    'approx': {'_approx_loader': '1'},
    'dedup0': {'_dedup0': '1'},
    'noshuffle': {'_noshuffle': '1'},
    'unfused': {'COLLIE_TPU_FUSED_TABLES': '0'},
    # the XLA scan engine instead of the Pallas kernel — pre-flight-dispatch
    # every variant (kernel or scan) landed at ~0.31 ms/step, locating the
    # cost OUTSIDE the step body
    'nokernel': {'COLLIE_TPU_FUSED_EPOCH': '0'},
    'nokernel_approx': {'COLLIE_TPU_FUSED_EPOCH': '0', '_approx_loader': '1'},
    # epoch-count ladder: the slope is the true marginal ms/step, the
    # intercept the per-fit fixed cost (host RPC syncs + dispatch)
    'base40': {'_epochs': '40'},
    'base80': {'_epochs': '80'},
}


def build_gate_data():
    from collie_tpu.data import stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions
    inter = generate_implicit_interactions(num_users=943, num_items=1682,
                                           num_interactions=100_000,
                                           num_negative_samples=K, seed=42)
    train, _ = stratified_split(inter, test_p=0.2, seed=42, force_split=True)
    return train


def run_variant(name):
    os.environ.update(VARIANTS[name])
    from collie_tpu.data import (InteractionsDataLoader,
                                 ApproximateNegativeSamplingInteractionsDataLoader)
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.training.trainer import CollieTrainer

    train = build_gate_data()
    epochs = int(os.environ.get('_epochs', str(EPOCHS)))
    cls = (ApproximateNegativeSamplingInteractionsDataLoader
           if os.environ.get('_approx_loader') else InteractionsDataLoader)
    shuffle = not os.environ.get('_noshuffle')
    dedup = 0 if os.environ.get('_dedup0') else 1
    loader = cls(interactions=train, batch_size=B, shuffle=shuffle, seed=42)
    model = MatrixFactorizationModel(train=loader, embedding_dim=DIM,
                                     lr=1e-1, loss='adaptive', seed=42)
    trainer = CollieTrainer(model, max_epochs=epochs, verbosity=0, seed=42,
                            exact_sampling_dedup_rounds=dedup)
    trainer.fit(model)                                   # warm: compiles
    best = float('inf')
    for _ in range(3):
        model.hparams['num_epochs_completed'] = 0
        model.hparams['seed'] = 42
        model._setup_model()
        trainer = CollieTrainer(model, max_epochs=epochs, verbosity=0,
                                seed=42, exact_sampling_dedup_rounds=dedup)
        t0 = time.perf_counter()
        trainer.fit(model)
        best = min(best, time.perf_counter() - t0)
    steps = -(-len(train) // B) * epochs
    print(json.dumps({'variant': name, 'epochs': epochs,
                      'fit_ms': round(best * 1e3, 1),
                      'ms_per_step': round(best / steps * 1e3, 4),
                      'examples_per_sec': round(len(train) * epochs / best)}),
          flush=True)


def floor_scan_ms_per_step():
    """The roofline floor body, inside the engine's actual scan structure."""
    import jax
    import jax.numpy as jnp

    train = build_gate_data()
    n = train.num_interactions
    S = -(-n // B)
    U, I, D = 943, 1682, DIM

    rng = np.random.default_rng(0)
    tables = {
        'u': jnp.asarray(rng.normal(size=(U, D + 1)).astype(np.float32)),
        'i': jnp.asarray(rng.normal(size=(I, D + 1)).astype(np.float32)),
        'mu_u': jnp.zeros((U, D + 1)), 'nu_u': jnp.zeros((U, D + 1)),
        'mu_i': jnp.zeros((I, D + 1)), 'nu_i': jnp.zeros((I, D + 1)),
    }
    users = jnp.asarray(rng.integers(0, U, (S, B)).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, I, (S, B)).astype(np.int32))

    def epoch(carry, key):
        def step(tb, xs):
            u_ids, p_ids, k = xs
            negs = jax.random.randint(k, (K, B), 0, I, dtype=jnp.int32)
            u_rows = tb['u'][u_ids]                       # [B, D+1]
            p_rows = tb['i'][p_ids]
            n_rows = tb['i'][negs]                        # [K, B, D+1]
            # bf16 no-grad selection einsum (engine default), then the
            # hardest-row gather and the loss math
            scores = jnp.einsum('bd,kbd->kb', u_rows[:, :D].astype(jnp.bfloat16),
                                n_rows[..., :D].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            hardest = jnp.argmax(scores, axis=0)
            h_ids = jnp.take_along_axis(negs, hardest[None], axis=0)[0]
            h_rows = tb['i'][h_ids]
            pos_s = (u_rows[:, :D] * p_rows[:, :D]).sum(-1) \
                + u_rows[:, D] + p_rows[:, D]
            neg_s = (u_rows[:, :D] * h_rows[:, :D]).sum(-1) \
                + u_rows[:, D] + h_rows[:, D]
            el = jnp.maximum(1.0 - (pos_s - neg_s), 0.0)
            loss = (el.sum() + (el * el).sum()) / B
            # backward-shaped scatters: one per table (fused layout)
            gu = jnp.zeros((U, D + 1)).at[u_ids].add(u_rows)
            gi = jnp.zeros((I, D + 1)).at[jnp.concatenate([p_ids, h_ids])] \
                .add(jnp.concatenate([p_rows, h_rows]))
            # dense Adam over both tables + moments
            out = dict(tb)
            for t, g, m, v in (('u', gu, 'mu_u', 'nu_u'),
                               ('i', gi, 'mu_i', 'nu_i')):
                mu = 0.9 * tb[m] + 0.1 * g
                nu = 0.999 * tb[v] + 0.001 * g * g
                out[t] = tb[t] - 0.1 * mu / (jnp.sqrt(nu) + 1e-8)
                out[m], out[v] = mu, nu
            return out, loss

        keys = jax.random.split(key, S)
        carry, losses = jax.lax.scan(step, carry, (users, pos, keys))
        return carry, losses.mean()

    @jax.jit
    def many_epochs(tb, key):
        keys = jax.random.split(key, ITERS)
        tb, losses = jax.lax.scan(epoch, tb, keys)
        return losses.sum()

    key = jax.random.PRNGKey(0)
    float(many_epochs(tables, key))                      # compile
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(many_epochs(tables, key))
        best = min(best, time.perf_counter() - t0)
    return best / (ITERS * S) * 1e3


def engine_body_ms_per_step():
    """The REAL step body (calculate_loss + value_and_grad + the actual
    optax transforms, fused tables) scanned over precomputed batches — no
    sampler, no shuffle, no whole-fit wrapper.  Bridges floor+scan to the
    engine: whatever this costs above floor+scan is autodiff + optimizer
    structure; whatever the engine costs above THIS is epoch machinery."""
    import jax
    import jax.numpy as jnp

    train = build_gate_data()
    from collie_tpu.data import InteractionsDataLoader
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    loader = InteractionsDataLoader(interactions=train, batch_size=B,
                                    shuffle=True, seed=42)
    model = MatrixFactorizationModel(train=loader, embedding_dim=DIM,
                                     lr=1e-1, loss='adaptive', seed=42)
    specs = model.optimizer_specs()
    n = train.num_interactions
    S = -(-n // B)
    rng = np.random.default_rng(0)
    batches = {
        'users': jnp.asarray(rng.integers(0, 943, (S, B)).astype(np.int32)),
        'pos_items': jnp.asarray(rng.integers(0, 1682, (S, B)).astype(np.int32)),
        'neg_items': jnp.asarray(rng.integers(0, 1682, (S, B, K)).astype(np.int32)),
        'mask': jnp.ones((S, B), jnp.float32),
    }
    params = dict(model.params)
    opt_states = tuple(jax.jit(s.transform.init)(
        {k: params[k] for k in s.keys}) for s in specs)
    fuse = model.supports_fused_tables()

    def epoch(carry, _):
        params, opt_states = carry

        def step(inner, batch):
            params, opt_states = inner
            loss, grads = jax.value_and_grad(
                lambda p: model.calculate_loss(p, batch, rng=None,
                                               training=True))(params)
            if fuse:
                params = model.unfuse_params(params)
                grads = model.unfuse_params(grads)
            new_states = list(opt_states)
            for i, spec in enumerate(specs):
                sub_p = {k: params[k] for k in spec.keys}
                sub_g = {k: grads[k] for k in spec.keys}
                upd, new_states[i] = spec.transform.update(
                    sub_g, opt_states[i], sub_p)
                params = {**params,
                          **{k: sub_p[k] + upd[k] for k in spec.keys}}
            if fuse:
                params = model.fuse_params(params)
            return (params, tuple(new_states)), loss

        if fuse:
            params = model.fuse_params(params)
        (params, opt_states), losses = jax.lax.scan(
            step, (params, opt_states), batches)
        if fuse:
            params = model.unfuse_params(params)
        return (params, opt_states), losses.mean()

    @jax.jit
    def many(params, opt_states):
        (params, opt_states), losses = jax.lax.scan(
            epoch, (params, opt_states), None, length=ITERS)
        return losses.sum()

    float(many(params, opt_states))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(params, opt_states))
        best = min(best, time.perf_counter() - t0)
    return best / (ITERS * S) * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--variant', default=None)
    args = parser.parse_args()
    if args.variant:
        try:
            from benchmarks._watchdog import device_watchdog
        except ImportError:
            from _watchdog import device_watchdog
        device_watchdog(label=f'exp_gate_decompose:{args.variant}')
        run_variant(args.variant)
        return

    try:
        from benchmarks._watchdog import device_watchdog
    except ImportError:
        from _watchdog import device_watchdog
    device_watchdog(label='exp_gate_decompose')

    rows = {}
    for name, env in VARIANTS.items():
        e = dict(os.environ)
        e.update(env)
        try:
            r = subprocess.run([sys.executable, __file__, '--variant', name],
                               env=e, capture_output=True, text=True,
                               timeout=1800)
        except subprocess.TimeoutExpired:
            print(json.dumps({'variant': name, 'error': 'timeout'}),
                  flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith('{'):
                print(line, flush=True)
                rows[name] = json.loads(line)
        if r.returncode != 0:
            print(json.dumps({'variant': name, 'error': r.stderr[-500:]}),
                  flush=True)

    fs = floor_scan_ms_per_step()
    print(json.dumps({'floor_plus_scan_ms_per_step': round(fs, 4)}),
          flush=True)
    eb = engine_body_ms_per_step()
    print(json.dumps({'engine_body_ms_per_step': round(eb, 4)}), flush=True)
    out = {'variants': rows, 'floor_plus_scan_ms_per_step': round(fs, 4),
           'engine_body_ms_per_step': round(eb, 4),
           'config': {'B': B, 'dim': DIM, 'k': K, 'epochs': EPOCHS}}
    (Path(__file__).parent / 'gate_decompose.json').write_text(
        json.dumps(out, indent=2) + '\n')


if __name__ == '__main__':
    main()
