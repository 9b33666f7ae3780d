"""Benchmark: MF training throughput + ranking quality vs a torch reference-equivalent.

Trains the flagship ``MatrixFactorizationModel`` on a synthetic ML-100K-scale
implicit dataset (943 users x 1682 items; ML-100K itself requires network
download, unavailable here — see ``collie_tpu/data/synthetic.py``) with the
reference's quality-gate config (dim 10, lr 0.1, adaptive hinge, 10 epochs;
``/root/reference/tests/fixtures/model_fixtures.py:24-40``), measures
steady-state training examples/sec on the jax backend, and compares against a
faithful torch CPU re-implementation of the reference's fast path
(``CollieMinimalTrainer`` + approximate-sampling loader semantics,
``/root/reference/collie/model/base/trainer.py:445-485``).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""
import json
import os
import sys
import time

import numpy as np


def build_data(seed=42):
    from collie_tpu.data import stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions

    inter = generate_implicit_interactions(num_users=943, num_items=1682,
                                           num_interactions=100_000,
                                           num_negative_samples=10, seed=seed)
    return stratified_split(inter, test_p=0.2, seed=seed, force_split=True)


def bench_collie_tpu(train, test, epochs=10, batch_size=1024):
    from collie_tpu.evaluate import evaluate_in_batches
    from collie_tpu.data import InteractionsDataLoader
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.ops import auc, mapk, mrr
    from collie_tpu.training.trainer import CollieTrainer

    loader = InteractionsDataLoader(interactions=train, batch_size=batch_size,
                                    shuffle=True, seed=42)
    model = MatrixFactorizationModel(train=loader, embedding_dim=10, lr=1e-1,
                                     loss='adaptive', seed=42)
    # warm run compiles the exact steady-state fit program (the whole-fit
    # engine keys compiled programs by epoch-block length), then a fresh
    # identical fit is timed end-to-end — compile excluded, every dispatch
    # and host-sync overhead included
    trainer = CollieTrainer(model, max_epochs=epochs, verbosity=0, seed=42)
    trainer.fit(model)
    # best-of-3 fresh fits: the whole fit is ONE dispatch, so the ~24 ms
    # tunnel round trip is 10-18% of a single 0.13 s gate-config fit —
    # same hygiene as bench_ml10m_scale's eval timing
    steady_secs = float('inf')
    for _ in range(3):
        model.hparams['num_epochs_completed'] = 0
        model.hparams['seed'] = 42
        model._setup_model()                    # fresh params, warm caches
        trainer = CollieTrainer(model, max_epochs=epochs, verbosity=0, seed=42)
        t0 = time.perf_counter()
        trainer.fit(model)
        steady_secs = min(steady_secs, time.perf_counter() - t0)
    examples = len(train) * epochs
    examples_per_sec = examples / steady_secs

    # warm once (compiles the fused whole-eval program), then time best-of-3
    # steady-state runs: a single gate-scale eval is ~43 ms against the ~24 ms
    # dispatch floor (CLAUDE.md), so one sample is noise-bound — rounds 1-4
    # swung 31-45M items/s on near-identical code with a single sample
    mapk_score, mrr_score, auc_score = evaluate_in_batches(
        [mapk, mrr, auc], test, model, k=10, batch_size=256, verbose=False)
    eval_secs = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        evaluate_in_batches([mapk, mrr, auc], test, model, k=10,
                            batch_size=256, verbose=False)
        eval_secs = min(eval_secs, time.perf_counter() - t0)
    eval_items_per_sec = (len(np.unique(test.mat.row)) * test.num_items) / eval_secs

    return {
        'examples_per_sec': examples_per_sec,
        'map10': mapk_score,
        'mrr': mrr_score,
        'auc': auc_score,
        'eval_items_per_sec': eval_items_per_sec,
    }


def bench_torch_reference_exact(train, batch_size=1024, max_batches=8):
    """Reference-faithful *default* path baseline: torch CPU with per-sample
    Python rejection sampling against the positive set, exactly as the
    reference's ``Interactions.__getitem__`` does
    (``/root/reference/collie/interactions/datasets.py:404-424``).
    Measures a few batches and extrapolates (it is the slow path by design).
    """
    import random as pyrandom

    import torch

    num_users, num_items = train.num_users, train.num_items
    dim, K = 10, train.num_negative_samples
    torch.manual_seed(42)
    user_emb = torch.nn.Embedding(num_users, dim)
    item_emb = torch.nn.Embedding(num_items, dim)
    opt = torch.optim.Adam(list(user_emb.parameters()) + list(item_emb.parameters()),
                           lr=1e-1)
    positive_items = set(zip(train.mat.row.tolist(), train.mat.col.tolist()))
    rows = train.mat.row
    pyrandom.seed(42)

    import time as _time
    t0 = _time.perf_counter()
    n_done = 0
    for start in range(0, min(len(rows), max_batches * batch_size), batch_size):
        idx = np.arange(start, min(start + batch_size, len(rows)))
        users = torch.from_numpy(rows[idx].astype(np.int64))
        negs = np.empty((len(idx), K), dtype=np.int64)
        for r, u in enumerate(rows[idx]):
            taken = []
            checked = 0
            while len(taken) < K:
                cand = pyrandom.choice(range(num_items))
                while (u, cand) in positive_items or cand in taken:
                    if checked >= 200:
                        break
                    cand = pyrandom.choice(range(num_items))
                    checked += 1
                taken.append(cand)
            negs[r] = taken
        # forward/backward kept minimal — sampling dominates this path
        pos = torch.from_numpy(train.mat.col[idx].astype(np.int64))
        scores = (user_emb(users) * item_emb(pos)).sum(-1)
        neg_scores = (user_emb(users.repeat_interleave(K))
                      * item_emb(torch.from_numpy(negs.reshape(-1)))).sum(-1)
        loss = torch.clamp(1 - (scores.repeat_interleave(K) - neg_scores), min=0).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        n_done += len(idx)
    return n_done / (_time.perf_counter() - t0)


def bench_torch_reference_equivalent(train, epochs=1, batch_size=1024):
    """Reference-equivalent hot loop in torch (CPU): same arch (MF dim 10,
    separate SGD bias optimizer), same adaptive-hinge loss math, same
    approximate-sampling batch semantics — the reference's own fast path."""
    import torch

    num_users, num_items = train.num_users, train.num_items
    dim, K = 10, train.num_negative_samples
    torch.manual_seed(42)
    user_emb = torch.nn.Embedding(num_users, dim)
    item_emb = torch.nn.Embedding(num_items, dim)
    user_emb.weight.data.normal_(0, 1.0 / (dim * 2.5))
    item_emb.weight.data.normal_(0, 1.0 / (dim * 2.5))
    user_bias = torch.nn.Embedding(num_users, 1)
    item_bias = torch.nn.Embedding(num_items, 1)
    user_bias.weight.data.zero_()
    item_bias.weight.data.zero_()

    opt = torch.optim.Adam(list(user_emb.parameters()) + list(item_emb.parameters()), lr=1e-1)
    bias_opt = torch.optim.SGD(list(user_bias.parameters()) + list(item_bias.parameters()),
                               lr=1e-2)

    def forward(u, i):
        return (user_emb(u) * item_emb(i)).sum(-1) + user_bias(u)[:, 0] + item_bias(i)[:, 0]

    rows = torch.from_numpy(train.mat.row.astype(np.int64))
    cols = torch.from_numpy(train.mat.col.astype(np.int64))
    n = len(rows)
    rng = np.random.default_rng(42)

    t0 = time.perf_counter()
    for _ in range(epochs):
        perm = torch.from_numpy(rng.permutation(n))
        for start in range(0, n, batch_size):
            idx = perm[start:start + batch_size]
            users, pos = rows[idx], cols[idx]
            negs = torch.from_numpy(
                rng.integers(0, num_items, size=(K, len(idx))))
            pos_scores = forward(users, pos)
            neg_scores = forward(users.repeat(K), negs.flatten()).view(K, len(idx))
            highest, _ = neg_scores.max(0)
            loss_el = torch.clamp(1.0 - (pos_scores - highest), min=0)
            loss = (loss_el.sum() + loss_el.pow(2).sum()) / len(idx)
            opt.zero_grad()
            bias_opt.zero_grad()
            loss.backward()
            opt.step()
            bias_opt.step()
    secs = time.perf_counter() - t0
    return n * epochs / secs


def _device_watchdog(timeout_s: float = 600.0):
    """Fail loudly if the accelerator tunnel is wedged.

    The axon TPU is reached over a relay; a lost grant leaves every device
    call blocked forever with zero output.  Probe with a trivial dispatch in
    a daemon thread — if it does not complete within ``timeout_s`` (generous:
    a cold remote compile is 30-90 s), print a diagnostic JSON line and exit
    nonzero so the driver records *why* the bench produced no number instead
    of a silent hang."""
    import threading
    import traceback

    done = threading.Event()
    failure = []

    def _probe():
        try:
            import jax
            import jax.numpy as jnp
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        except BaseException:
            failure.append(traceback.format_exc())
        finally:
            done.set()  # a fast *error* must report immediately, not after timeout_s

    threading.Thread(target=_probe, daemon=True).start()
    if not done.wait(timeout_s) or failure:
        import os
        reason = (f'device error during trivial dispatch:\n{failure[0]}'
                  if failure else
                  f'device unreachable: trivial dispatch did not complete '
                  f'within {timeout_s:.0f}s (tunnel/grant wedged?)')
        print(json.dumps({
            'metric': 'mf_train_examples_per_sec',
            'value': 0.0,
            'unit': 'examples/sec',
            'vs_baseline': 0.0,
            'error': reason,
        }), flush=True)
        os._exit(3)


# The torch-CPU baseline is load-volatile: observed 13k-218k ex/s for the SAME
# code across rounds depending on host CPU weather (docs/BENCHMARKS.md), which
# made the driver-recorded `vs_baseline` swing 2x for a monotone ours-side
# number.  Protocol since round 5: the live baseline is best-of-N with the
# 1-minute host load average recorded alongside, AND the headline ratio is
# additionally reported against a PINNED baseline — the median of the four
# round-driver observations of the approximate-path baseline (184.2k, 200.6k,
# 165.1k, 178.0k ex/s -> 181.1k) — so cross-round comparisons have a fixed
# denominator.
PINNED_BASELINE_APPROX_EPS = 181_109.4


def main():
    _device_watchdog()
    train, test = build_data()
    ours = bench_collie_tpu(train, test)
    def _loadavg():
        try:
            return os.getloadavg()[0]
        except OSError:  # pragma: no cover - getloadavg unsupported
            return -1.0

    # the load sentinel brackets the BASELINE runs (they are the
    # load-sensitive part); report the max of before/after
    loadavg = _loadavg()
    # matching-semantics baseline: the reference's default exact-sampling path
    baseline_exact_eps = max(bench_torch_reference_exact(train)
                             for _ in range(2))
    # the reference's opt-in approximate fast path (stronger baseline than our
    # own exact-mode run deserves, reported for transparency); best-of-3 so a
    # transient host-load spike cannot halve the denominator
    baseline_approx_eps = max(bench_torch_reference_equivalent(train)
                              for _ in range(3))
    loadavg = max(loadavg, _loadavg())

    result = {
        'metric': 'mf_train_examples_per_sec',
        'value': round(ours['examples_per_sec'], 1),
        'unit': 'examples/sec',
        # the headline ratio is the CONSERVATIVE one: against the reference's
        # approximate-sampling fast path (its strongest configuration).  The
        # default exact-sampling path's ratio is reported alongside — it is
        # larger, but most of that gap is the reference's Python rejection
        # sampler, not model compute.
        'vs_baseline': round(ours['examples_per_sec'] / baseline_approx_eps, 3),
        'baseline_torch_cpu_approx_examples_per_sec': round(baseline_approx_eps, 1),
        'baseline_torch_cpu_exact_examples_per_sec': round(baseline_exact_eps, 1),
        'vs_exact_sampling_baseline': round(
            ours['examples_per_sec'] / baseline_exact_eps, 3),
        # fixed-denominator ratio for cross-round comparability (see the
        # PINNED_BASELINE_APPROX_EPS protocol note above)
        'vs_pinned_baseline': round(
            ours['examples_per_sec'] / PINNED_BASELINE_APPROX_EPS, 3),
        'pinned_baseline_examples_per_sec': PINNED_BASELINE_APPROX_EPS,
        'host_loadavg_1m': round(loadavg, 2),
        'map10': round(ours['map10'], 5),
        'mrr': round(ours['mrr'], 5),
        'auc': round(ours['auc'], 5),
        'eval_items_per_sec': round(ours['eval_items_per_sec'], 1),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    sys.exit(main())
