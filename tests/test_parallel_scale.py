"""Adversarial-scale communication guards for the mesh programs.

GSPMD's partitioning choices are size-dependent — the 250-user guard in
``test_parallel.py`` runs at a shape where a table all-gather is harmless,
so it could pass while the real configuration regressed.  These tests lower
the ACTUAL train and eval programs at a scale where the wrong choice is
tempting (131,072-row user table, 8 model shards) and assert per-step mesh
communication stays O(batch x dim):

* the train epoch program emits NO table-sized all-gather anywhere;
* the fused eval program emits none INSIDE its scan loop (one at program
  entry would be amortized, inside the loop it multiplies by the number of
  user blocks — today it emits none at all, which the test pins).

VERDICT round 2 item 4 ("re-run the no-table-allgather HLO guard at
adversarial scale (>=100k rows, 8 shards) and across the train AND eval
programs").
"""
import re

import jax
import numpy as np
import pytest

from collie_tpu.data import Interactions, InteractionsDataLoader
from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
from collie_tpu.parallel import make_mesh, shard_params
from collie_tpu.parallel.sharding import make_sharded_init

NUM_USERS = 131_072
NUM_ITEMS = 16_384
DIM = 16
BATCH = 2_048


@pytest.fixture(scope='module')
def mesh8():
    assert len(jax.devices()) == 8
    return make_mesh(data=1, model=8)


@pytest.fixture(scope='module')
def big_model():
    rng = np.random.default_rng(0)
    n = 8_192
    users = rng.integers(0, NUM_USERS, n)
    items = rng.integers(0, NUM_ITEMS, n)
    keys = users * NUM_ITEMS + items
    _, keep = np.unique(keys, return_index=True)
    inter = Interactions(users=users[keep], items=items[keep],
                         allow_missing_ids=True,
                         num_users=NUM_USERS, num_items=NUM_ITEMS,
                         num_negative_samples=5, seed=0,
                         check_num_negative_samples_is_valid=False)
    loader = InteractionsDataLoader(interactions=inter, batch_size=BATCH,
                                    shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=DIM,
                                     lr=1e-1, loss='adaptive', seed=0)
    return model, loader


def _table_allgather_lines(hlo_text):
    # HLO result shapes follow the '=' ("%ag = f32[131072,16]{1,0}
    # all-gather(...)"); match the RESULT shape of all-gather/-start ops.
    # (The round-2 guard matched the lhs NAME and was vacuous — verified by
    # negative control against a forced replicate-resharding program.)
    table_shapes = (rf'f32\[{NUM_USERS},{DIM}\]',
                    rf'f32\[{NUM_ITEMS},{DIM}\]',
                    rf'f32\[{NUM_USERS}\]', rf'f32\[{NUM_ITEMS}\]')
    pattern = re.compile(
        r'=\s*(?:\([^)]*\)\s*)?(' + '|'.join(table_shapes)
        + r')\S*\s+all-gather')
    out = []
    for line in hlo_text.splitlines():
        if 'all-gather' in line and pattern.search(line):
            out.append(line.strip()[:200])
    return out


def test_detector_catches_forced_table_allgather(mesh8):
    """Negative control: a deliberate replicate-resharding of a sharded table
    MUST trip the detector (guards the guard)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    table = jax.device_put(np.zeros((NUM_USERS, DIM), np.float32),
                           NamedSharding(mesh8, P('model', None)))
    w = np.zeros((DIM, DIM), np.float32)
    fn = jax.jit(lambda x: jax.lax.with_sharding_constraint(
        x * 1.0, NamedSharding(mesh8, P())) @ w)
    txt = fn.lower(table).compile().as_text()
    assert _table_allgather_lines(txt), 'detector failed its negative control'


def test_train_step_no_table_allgather_at_scale(mesh8, big_model):
    from collie_tpu.training.scan_engine import build_scan_epoch_fns

    model, loader = big_model
    specs = model.optimizer_specs()
    fn, data, S, n = build_scan_epoch_fns(model, specs, [True] * len(specs),
                                          loader, shuffle=True, mesh=mesh8,
                                          training=True)
    params = shard_params(dict(model.params), mesh8)
    assert not params['user_embeddings'].sharding.is_fully_replicated
    opt_states = tuple(
        make_sharded_init(spec.transform, mesh8)(
            {k: params[k] for k in spec.keys})
        for spec in specs)
    txt = fn.lower(params, opt_states, data, jax.random.PRNGKey(0),
                   np.int32(1)).compile().as_text()
    bad = _table_allgather_lines(txt)
    assert not bad, f'table-sized all-gather at 131k-row scale: {bad}'


def test_moments_shard_with_tables_at_scale(mesh8, big_model):
    model, _ = big_model
    params = shard_params(dict(model.params), mesh8)
    specs = model.optimizer_specs()
    states = tuple(
        make_sharded_init(spec.transform, mesh8)(
            {k: params[k] for k in spec.keys})
        for spec in specs)
    flat = jax.tree_util.tree_leaves(states)
    big = [x for x in flat
           if isinstance(x, jax.Array) and x.ndim == 2
           and x.shape[0] in (NUM_USERS, NUM_ITEMS)]
    assert big, 'expected 2-D moment leaves'
    for x in big:
        assert not x.sharding.is_fully_replicated, 'moment not sharded'


def test_eval_scan_loop_no_table_allgather_at_scale(mesh8, big_model):
    """The fused sharded eval's scan body must not re-gather tables per user
    block — today the program emits no table-sized all-gather at all, which
    this pins (an entry-time gather would still be flagged; loosen to
    loop-body-only if a deliberate entry gather ever lands)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from collie_tpu.evaluate import _build_sharded_eval_fn
    from collie_tpu.parallel.mesh import DATA_AXIS

    model, loader = big_model
    params = shard_params(dict(model.params), mesh8)
    model.params = params
    eval_fn = jax.jit(_build_sharded_eval_fn(model, 10, NUM_ITEMS, mesh8))

    S, B, D = 4, 8, 32
    kw = dict(dtype=np.int32)
    users = np.zeros((S, B), **kw)
    pos = np.zeros((S, B, D), **kw)
    pos_mask = np.zeros((S, B, D), np.float32)
    mask = np.ones((S, B), np.float32)

    def up(x, spec):
        return jax.device_put(x, NamedSharding(mesh8, spec))

    txt = eval_fn.lower(
        params,
        up(users, P(None, DATA_AXIS)),
        up(pos, P(None, DATA_AXIS, None)),
        up(pos_mask, P(None, DATA_AXIS, None)),
        up(mask, P(None, DATA_AXIS)),
    ).compile().as_text()
    bad = _table_allgather_lines(txt)
    assert not bad, f'table-sized all-gather in sharded eval: {bad}'


def test_train_step_collectives_stay_data_sharded():
    """Regression guard for the round-4 flatten bug: every collective in the
    sharded train program must operate on data-SHARDED blocks.  Flattening
    ``[K, B]`` candidate ids to ``[K*B]`` before a table gather merges the
    data-sharded batch dim into an unshardable axis, which made GSPMD
    replicate the gathered ``[B*K, D+1]`` block on every device (an 88 MB
    per-device all-reduce at the ML-10M config).  This lowers the ACTUAL
    train program on a data=4 x model=2 mesh and asserts no collective's
    per-device result exceeds the properly sharded lookup-psum size
    (``K x B/data x (D+1)`` rows, with headroom for sibling tuple
    elements)."""
    from collie_tpu.training.scan_engine import build_scan_epoch_fns

    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(0)
    n = 8_192
    users = rng.integers(0, NUM_USERS, n)
    items = rng.integers(0, NUM_ITEMS, n)
    keys = users * NUM_ITEMS + items
    _, keep = np.unique(keys, return_index=True)
    inter = Interactions(users=users[keep], items=items[keep],
                         allow_missing_ids=True,
                         num_users=NUM_USERS, num_items=NUM_ITEMS,
                         num_negative_samples=5, seed=0,
                         check_num_negative_samples_is_valid=False)
    loader = InteractionsDataLoader(interactions=inter, batch_size=BATCH,
                                    shuffle=True, seed=0)
    model = MatrixFactorizationModel(train=loader, embedding_dim=DIM,
                                     lr=1e-1, loss='adaptive', seed=0)
    specs = model.optimizer_specs()
    fn, data, S, _ = build_scan_epoch_fns(model, specs, [True] * len(specs),
                                          loader, shuffle=True, mesh=mesh,
                                          training=True)
    params = shard_params(dict(model.params), mesh)
    opt_states = tuple(
        make_sharded_init(spec.transform, mesh)(
            {k: params[k] for k in spec.keys})
        for spec in specs)
    txt = fn.lower(params, opt_states, data, jax.random.PRNGKey(0),
                   np.int32(1)).compile().as_text()

    K, n_data = 5, 4
    # sharded lookup-psum block + generous 2x headroom for tuple siblings
    limit = 2 * K * (BATCH // n_data) * (DIM + 1) * 4
    shape_re = re.compile(r'f32\[([\d,]+)\]')
    offenders, seen = [], 0
    for line in txt.splitlines():
        s = line.strip()
        if ' = ' not in s:
            continue
        if not any(f' {op}(' in s or f' {op}-start(' in s
                   for op in ('all-reduce', 'all-gather', 'reduce-scatter',
                              'all-to-all')):
            continue
        seen += 1
        result = s.split(' = ', 1)[1]
        for dims in shape_re.findall(result.split('(')[0]):
            count = 1
            for d in dims.split(','):
                count *= int(d)
            if count * 4 > limit:
                offenders.append(s[:160])
                break
    # guard the guard: a parse that sees no collectives at all would be
    # vacuous (the model/table psum must appear in this program)
    assert seen > 0, 'collective parser matched nothing — detector is vacuous'
    assert not offenders, (
        'oversized (replicated?) collective in sharded train program:\n'
        + '\n'.join(offenders))


def test_sharded_retrieval_no_user_table_allgather(mesh8, big_model):
    """The round-5 collective account caught sharded retrieval all-gathering
    the ENTIRE user table per call (its P() in_spec made GSPMD replicate it
    — O(num_users x dim) on ICI, 1 MB/call at 4k users).  The fix enters
    user tables row-sharded and moves only the B requested rows via a
    masked local gather + psum.  Pin: the lowered retrieval program emits no
    user- or item-table-sized all-gather, and its collectives stay within
    the O(B x dim + devices x k) budget."""
    from collie_tpu.retrieval import build_retrieval_fn

    model, _ = big_model
    params = shard_params(dict(model.params), mesh8)
    assert not params['user_embeddings'].sharding.is_fully_replicated
    fn = build_retrieval_fn(model, k=10, item_tile=4096, filter_seen=False,
                            mesh=mesh8)
    B = 64
    from jax.sharding import NamedSharding, PartitionSpec as P
    txt = fn.lower(
        params,
        jax.ShapeDtypeStruct((B,), np.int32,
                             sharding=NamedSharding(mesh8, P())),
    ).compile().as_text()
    assert not _table_allgather_lines(txt), 'table-sized all-gather in retrieval'

    # every collective's result must fit the per-call budget: B user rows
    # (psum'd) or the devices*k candidate merge, with 4x tuple headroom
    limit = 4 * max(B * (DIM + 1) * 4, 8 * 10 * B * 8)
    shape_re = re.compile(r'(?:f32|s32|u32|bf16)\[([\d,]+)\]')
    offenders, seen = [], 0
    for line in txt.splitlines():
        s = line.strip()
        if ' = ' not in s:
            continue
        if not any(f' {op}(' in s or f' {op}-start(' in s
                   for op in ('all-reduce', 'all-gather', 'reduce-scatter',
                              'all-to-all')):
            continue
        seen += 1
        result = s.split(' = ', 1)[1]
        for dims in shape_re.findall(result.split('(')[0]):
            count = 1
            for d in dims.split(','):
                count *= int(d)
            if count * 4 > limit:
                offenders.append(s[:160])
                break
    assert seen > 0, 'collective parser matched nothing — detector is vacuous'
    assert not offenders, ('oversized collective in sharded retrieval:\n'
                           + '\n'.join(offenders))
