"""Execute the REFERENCE's metrics code and assert ours matches it.

Upgrade of the constants-only pins in ``tests/test_metrics.py`` to parity
against the reference *program*: ``/root/reference/collie/metrics.py`` is
loaded under stub ``pytorch_lightning`` / ``torchmetrics`` / ``collie``
packages (only ``torch``, ``numpy`` and ``scipy.sparse`` do real work in
``mapk``/``mrr``; ``auc`` calls ``torchmetrics.functional.auroc``, which is
stubbed with the exact closed-form Mann-Whitney statistic binary AUROC
reduces to) and property-tested against ``collie_tpu.ops.metrics`` on random
score matrices + CSR targets.  If either side's semantics change, these
tests fail — no re-typed constants involved.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest
from scipy.sparse import csr_matrix

torch = pytest.importorskip('torch')

from collie_tpu.ops import metrics as jx

REF_METRICS = Path('/root/reference/collie/metrics.py')


def _stub_module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for key, value in attrs.items():
        setattr(mod, key, value)
    return mod


def _mann_whitney_auroc(preds: 'torch.Tensor', target: 'torch.Tensor',
                        **_ignored) -> 'torch.Tensor':
    """Binary AUROC via the Mann-Whitney rank statistic (average-rank ties).

    Faithful stand-in for ``torchmetrics.functional.auroc`` on binary
    targets: for tie-free scores the trapezoidal ROC integral torchmetrics
    computes equals this closed form exactly, and ties contribute 0.5 under
    both (average ranks <-> trapezoid through the tied block).
    """
    from scipy.stats import rankdata
    scores = preds.detach().cpu().numpy()
    labels = target.detach().cpu().numpy()
    ranks = rankdata(scores)           # 1-based, average ranks for ties
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return torch.tensor(0.5)
    u = ranks[labels > 0].sum() - n_pos * (n_pos + 1) / 2
    return torch.tensor(u / (n_pos * n_neg))


@pytest.fixture(scope='module')
def ref():
    """Load ``/root/reference/collie/metrics.py`` under stub dependencies."""
    if not REF_METRICS.exists():
        pytest.skip('reference checkout not available')

    class _Logger:            # never instantiated by the functions under test
        pass

    class _Metric:
        pass

    pl = _stub_module('pytorch_lightning')
    loggers = _stub_module('pytorch_lightning.loggers')
    logger_mod = _stub_module('pytorch_lightning.loggers.logger', Logger=_Logger)
    _stub_module('pytorch_lightning.loggers.base', LightningLoggerBase=_Logger)
    pl.loggers = loggers
    loggers.logger = logger_mod

    tm = _stub_module('torchmetrics', Metric=_Metric)
    tm_func = _stub_module('torchmetrics.functional', auroc=_mann_whitney_auroc)
    tm.functional = tm_func

    pkg = sys.modules.get('collie')
    if pkg is None:
        pkg = types.ModuleType('collie')
        pkg.__path__ = []
        sys.modules['collie'] = pkg
    _stub_module('collie.interactions', ExplicitInteractions=object,
                 Interactions=object, InteractionsDataLoader=object)
    _stub_module('collie.model', BasePipeline=object)
    pkg.interactions = sys.modules['collie.interactions']
    pkg.model = sys.modules['collie.model']

    spec = importlib.util.spec_from_file_location('collie.metrics', REF_METRICS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['collie.metrics'] = mod
    spec.loader.exec_module(mod)
    return mod


def _random_case(seed, n_users_total, n_items, batch, density=0.05,
                 with_empty_user=False):
    """Random continuous score matrix + binary CSR targets for a user batch."""
    rng = np.random.default_rng(seed)
    user_ids = rng.choice(n_users_total, size=batch, replace=False)
    preds = rng.normal(0, 3, size=(batch, n_items)).astype(np.float64)
    dense = (rng.random((n_users_total, n_items)) < density).astype(np.float64)
    if with_empty_user:
        dense[user_ids[0]] = 0.0          # exercises the NaN -> 0 path
    else:
        # every evaluated user has at least one positive
        for u in user_ids:
            if dense[u].sum() == 0:
                dense[u, rng.integers(0, n_items)] = 1.0
    targets = csr_matrix(dense)
    return targets, user_ids, preds


CASES = [
    # (seed, n_users_total, n_items, batch, density, with_empty_user)
    (0, 20, 15, 5, 0.20, False),
    (1, 50, 40, 12, 0.10, False),
    (2, 50, 40, 12, 0.10, True),
    (3, 100, 64, 20, 0.05, False),
    (4, 30, 25, 30, 0.30, True),
]


@pytest.mark.parametrize('seed,n_users,n_items,batch,density,empty', CASES)
@pytest.mark.parametrize('k', [1, 5, 10])
def test_mapk_matches_reference(ref, seed, n_users, n_items, batch, density,
                                empty, k):
    targets, user_ids, preds = _random_case(seed, n_users, n_items, batch,
                                            density, empty)
    expected = ref.mapk(targets, user_ids, torch.tensor(preds), k=k)
    actual = jx.mapk(targets, user_ids, preds, k=k)
    assert actual == pytest.approx(expected, rel=1e-5, abs=1e-6)


@pytest.mark.parametrize('seed,n_users,n_items,batch,density,empty', CASES)
def test_mrr_matches_reference(ref, seed, n_users, n_items, batch, density,
                               empty):
    targets, user_ids, preds = _random_case(seed, n_users, n_items, batch,
                                            density, empty)
    expected = ref.mrr(targets, user_ids, torch.tensor(preds), k=None)
    actual = jx.mrr(targets, user_ids, preds, k=None)
    assert actual == pytest.approx(expected, rel=1e-5, abs=1e-6)


@pytest.mark.parametrize('seed,n_users,n_items,batch,density,empty',
                         [c for c in CASES if not c[5]])
def test_auc_matches_reference(ref, seed, n_users, n_items, batch, density,
                               empty):
    # auc rows need both classes present; empty-user rows are undefined in
    # torchmetrics, so only the all-users-have-positives cases apply.
    targets, user_ids, preds = _random_case(seed, n_users, n_items, batch,
                                            density, empty)
    expected = ref.auc(targets, user_ids, torch.tensor(preds), k=None)
    actual = jx.auc(targets, user_ids, preds, k=None)
    assert actual == pytest.approx(expected, rel=1e-5, abs=1e-6)


def test_mapk_k_too_large_raises_on_both_sides(ref):
    targets, user_ids, preds = _random_case(0, 20, 15, 5, 0.2, False)
    with pytest.raises(ValueError):
        ref.mapk(targets, user_ids, torch.tensor(preds), k=16)
    with pytest.raises(ValueError):
        jx.mapk(targets, user_ids, preds, k=16)


def test_rank_count_kernel_matches_reference_mapk(ref):
    """The fused rank-count path (what eval actually runs) against the
    reference program end-to-end, not just the host wrappers."""
    targets, user_ids, preds = _random_case(7, 60, 48, 16, 0.08, False)
    k = 10
    expected_map = ref.mapk(targets, user_ids, torch.tensor(preds), k=k)
    expected_mrr = ref.mrr(targets, user_ids, torch.tensor(preds))
    expected_auc = ref.auc(targets, user_ids, torch.tensor(preds))
    pos, mask = jx.padded_positives(targets, user_ids)
    out = np.asarray(jx.metrics_from_positive_ranks(
        np.asarray(preds, dtype=np.float32), pos, mask, k))
    assert out[0].mean() == pytest.approx(expected_map, rel=1e-4)
    assert out[1].mean() == pytest.approx(expected_mrr, rel=1e-4)
    assert out[2].mean() == pytest.approx(expected_auc, rel=1e-4)
