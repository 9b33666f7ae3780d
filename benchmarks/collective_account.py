"""Per-step mesh-collective byte account for the sharded train program.

The >90% multi-chip scaling-efficiency target (BASELINE.md) cannot be
measured on the one available chip, so this script makes the claim
checkable the other way around: lower the ACTUAL sharded train epoch
program at the ML-10M headline config on the virtual 8-device mesh, parse
the compiled HLO, and sum the bytes every collective moves.  Combined with
the measured single-chip step time, that yields the ICI bandwidth the
collectives would need so communication stays under 10% of the step —
a number to compare against any TPU generation's spec instead of a
simulated speedup.

Caveats (also printed into the JSON): the HLO comes from the CPU backend's
GSPMD partitioner (the same SPMD pass as TPU; backend-specific collective
SCHEDULING may differ, the partitioning byte counts are the design's), and
all-reduce wire cost is modeled as ring 2(N-1)/N x bytes.

Writes benchmarks/collective_account.json.
Run (no TPU needed):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/collective_account.py
"""
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

# the axon site hook imports jax before this script runs, freezing the
# platform choice from the ambient env — override via config (the same
# trick tests/conftest.py documents)
jax.config.update('jax_platforms', 'cpu')

import numpy as np

# the ML-10M headline config (bench_ml10m_scale.py / roofline.json), data=4
# replicas x model=2 table shards; per-replica batch = 65536 / 4
NUM_USERS, NUM_ITEMS, DIM = 72_000, 10_000, 32
GLOBAL_BATCH = 65_536
N_EXAMPLES = 524_288          # one scan segment's worth; S = N/B steps
MEASURED_STEP_MS = 14.112     # single-chip, roofline.json (B=65536)

_DTYPE_BYTES = {'f32': 4, 'bf16': 2, 'f16': 2, 's32': 4, 'u32': 4,
                's64': 8, 'u64': 8, 'pred': 1, 's8': 1, 'u8': 1,
                'f64': 8, 's16': 2, 'u16': 2}

_COLLECTIVES = ('all-reduce', 'all-gather', 'reduce-scatter',
                'all-to-all', 'collective-permute')

_SHAPE_RE = re.compile(r'(\w+)\[([\d,]*)\]')


def _op_bytes(line: str) -> int:
    """Sum the RESULT-shape bytes of a collective op line (tuple-shaped
    results sum their elements)."""
    lhs = line.split(' = ', 1)
    if len(lhs) != 2:
        return 0
    result = lhs[1]
    # the result type is everything before the op name
    for op in _COLLECTIVES:
        idx = result.find(op)
        if idx >= 0:
            result = result[:idx]
            break
    total = 0
    for dtype, dims in _SHAPE_RE.findall(result):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes(hlo_text: str):
    """{op_kind: [(bytes, line_head), ...]} for every collective op."""
    out = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        if not s or ' = ' not in s:
            continue
        for op in _COLLECTIVES:
            # match the op invocation, not a metadata mention
            if f' {op}(' in s or f' {op}-start(' in s:
                b = _op_bytes(s)
                out.setdefault(op, []).append((b, s[:160]))
                break
    return out


def _account(txt, steps, measured_ms, ring_n):
    """Collective-byte account of one compiled program."""
    found = collective_bytes(txt)
    per_kind = {op: sum(b for b, _ in entries)
                for op, entries in found.items()}
    total = sum(per_kind.values())
    per_step = total / steps
    ring = 2 * (ring_n - 1) / ring_n
    wire_per_step = per_step * ring
    overhead_budget_s = 0.10 * measured_ms / 1e3
    needed_gbps = (wire_per_step / overhead_budget_s / 1e9
                   if overhead_budget_s > 0 else float('inf'))
    return {
        'collective_bytes_per_program_by_kind': per_kind,
        'collective_bytes_per_step': round(per_step),
        'largest_single_collective': max(
            ((b, head) for entries in found.values() for b, head in entries),
            default=(0, ''), key=lambda x: x[0]),
        'ring_wire_bytes_per_step': round(wire_per_step),
        'measured_single_chip_ms_per_step': measured_ms,
        'ici_gbps_needed_for_90pct_scaling': round(needed_gbps, 2),
    }


def eval_account(mesh):
    """Lower the sharded fused-eval program at the ML-10M eval shapes.

    Claim under test (evaluate.py::_build_sharded_eval_fn): per-user
    communication is O(max_test_degree) psum'd counts — independent of
    catalog size — plus the user-row all-to-all.  Abstract-arg lowering:
    nothing executes.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from collie_tpu.data import Interactions, InteractionsDataLoader
    from collie_tpu.evaluate import _build_sharded_eval_fn
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.parallel import shard_params
    from collie_tpu.parallel.mesh import DATA_AXIS

    rng = np.random.default_rng(1)
    users = rng.integers(0, NUM_USERS, 300_000)
    items = rng.integers(0, NUM_ITEMS, 300_000)
    keys = users.astype(np.int64) * NUM_ITEMS + items
    _, keep = np.unique(keys, return_index=True)
    inter = Interactions(users=users[keep], items=items[keep],
                         allow_missing_ids=True, num_users=NUM_USERS,
                         num_items=NUM_ITEMS, num_negative_samples=10,
                         seed=0, check_num_negative_samples_is_valid=False)
    loader = InteractionsDataLoader(interactions=inter, batch_size=8192)
    model = MatrixFactorizationModel(train=loader, embedding_dim=DIM,
                                     lr=1e-1, loss='adaptive', seed=0)
    params = shard_params(dict(model.params), mesh)

    B_eval, Dpos = 512, 16
    S = -(-NUM_USERS // B_eval)
    fn = jax.jit(_build_sharded_eval_fn(model, 10, NUM_ITEMS, mesh))

    def _abs(shape, dtype, spec):
        return jax.ShapeDtypeStruct(shape, dtype,
                                    sharding=NamedSharding(mesh, spec))

    txt = fn.lower(
        params,
        _abs((S, B_eval), np.int32, P(None, DATA_AXIS)),
        _abs((S, B_eval, Dpos), np.int32, P(None, DATA_AXIS, None)),
        _abs((S, B_eval, Dpos), np.float32, P(None, DATA_AXIS, None)),
        _abs((S, B_eval), np.float32, P(None, DATA_AXIS)),
    ).compile().as_text()
    # measured single-chip whole-eval: ml10m_scale_results.json
    # eval_items_per_sec 628.8M over 72k x 10k items -> 1.145 s / S blocks
    measured_block_ms = 1145.0 / S
    row = _account(txt, S, round(measured_block_ms, 3), ring_n=2)
    row['config'] = {'users': NUM_USERS, 'num_items': NUM_ITEMS, 'dim': DIM,
                     'eval_block': B_eval, 'padded_positives': Dpos,
                     'blocks': S,
                     'claim': 'per-user comm O(max_test_degree), '
                              'catalog-size independent'}
    return row


def retrieval_account(mesh):
    """Lower the shard_map retrieval merge at the 500k-catalog bench shapes.

    Claim under test (retrieval.py::_build_sharded_retrieval): each device
    holds num_items/n_shards table rows, computes a local top-k, and only
    O(devices * k) candidates cross ICI.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from collie_tpu.data import Interactions, InteractionsDataLoader
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.parallel import shard_params
    from collie_tpu.retrieval import build_retrieval_fn

    R_ITEMS, R_DIM, R_B, R_K = 500_000, 64, 64, 10
    rng = np.random.default_rng(2)
    users = rng.integers(0, 4096, 20_000)
    items = rng.integers(0, R_ITEMS, 20_000)
    keys = users.astype(np.int64) * R_ITEMS + items
    _, keep = np.unique(keys, return_index=True)
    inter = Interactions(users=users[keep], items=items[keep],
                         allow_missing_ids=True, num_users=4096,
                         num_items=R_ITEMS, num_negative_samples=10,
                         seed=0, check_num_negative_samples_is_valid=False)
    loader = InteractionsDataLoader(interactions=inter, batch_size=8192)
    model = MatrixFactorizationModel(train=loader, embedding_dim=R_DIM,
                                     lr=1e-1, loss='adaptive', seed=0)
    params = shard_params(dict(model.params), mesh)
    fn = build_retrieval_fn(model, k=R_K, item_tile=4096, filter_seen=False,
                            mesh=mesh)
    txt = fn.lower(
        params,
        jax.ShapeDtypeStruct((R_B,), np.int32,
                             sharding=NamedSharding(mesh, P())),
    ).compile().as_text()
    # measured single-chip per-call: retrieval_results.json catalog_500000
    # xla_topk_ms_per_call (the auto-selected dense path)
    row = _account(txt, 1, 1.583, ring_n=2)
    row['config'] = {'num_items': R_ITEMS, 'dim': R_DIM, 'batch': R_B,
                     'k': R_K,
                     'claim': 'O(devices * k) candidate all-gather; '
                              'per-device table memory num_items/n_shards'}
    return row


def main():
    from collie_tpu.data import Interactions, InteractionsDataLoader
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.parallel import make_mesh, shard_params
    from collie_tpu.parallel.sharding import make_sharded_init
    from collie_tpu.training.scan_engine import build_scan_epoch_fns

    assert len(jax.devices()) >= 8, 'need the 8-virtual-device CPU mesh'
    mesh = make_mesh(data=4, model=2)

    rng = np.random.default_rng(0)
    users = rng.integers(0, NUM_USERS, N_EXAMPLES)
    items = rng.integers(0, NUM_ITEMS, N_EXAMPLES)
    keys = users.astype(np.int64) * NUM_ITEMS + items
    _, keep = np.unique(keys, return_index=True)
    inter = Interactions(users=users[keep], items=items[keep],
                         allow_missing_ids=True,
                         num_users=NUM_USERS, num_items=NUM_ITEMS,
                         num_negative_samples=10, seed=0,
                         check_num_negative_samples_is_valid=False)
    loader = InteractionsDataLoader(interactions=inter,
                                    batch_size=GLOBAL_BATCH,
                                    shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=DIM,
                                     lr=1e-1, loss='adaptive', seed=0)
    specs = model.optimizer_specs()
    fn, data, S, n_used = build_scan_epoch_fns(
        model, specs, [True] * len(specs), loader, shuffle=True,
        mesh=mesh, training=True)
    params = shard_params(dict(model.params), mesh)
    opt_states = tuple(
        make_sharded_init(spec.transform, mesh)(
            {k: params[k] for k in spec.keys})
        for spec in specs)
    print(f'lowering sharded epoch program (S={S} steps)...', flush=True)
    txt = fn.lower(params, opt_states, data, jax.random.PRNGKey(0),
                   np.int32(1)).compile().as_text()

    train_row = _account(txt, S, MEASURED_STEP_MS, ring_n=4)
    train_row['config'] = {
        'num_users': NUM_USERS, 'num_items': NUM_ITEMS, 'dim': DIM,
        'global_batch': GLOBAL_BATCH, 'steps_per_epoch': S}

    print('lowering sharded eval program...', flush=True)
    eval_row = eval_account(mesh)
    print('lowering sharded retrieval program...', flush=True)
    retr_row = retrieval_account(mesh)

    result = {
        'mesh': 'data=4 x model=2 (8 virtual CPU devices)',
        'train_step': train_row,
        'eval_block': eval_row,
        'retrieval_call': retr_row,
        'note': ('bytes from the GSPMD-partitioned HLO on the CPU backend; '
                 'wire cost modeled as ring 2(N-1)/N over the relevant '
                 'axis; compare each ici_gbps_needed against the target '
                 'TPU generation\'s per-chip ICI bandwidth'),
    }
    print(json.dumps(result, indent=2))
    with open(Path(__file__).parent / 'collective_account.json', 'w') as f:
        json.dump(result, f, indent=2)


if __name__ == '__main__':
    main()
