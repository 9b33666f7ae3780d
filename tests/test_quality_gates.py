"""Statistical quality gates: one trial of the gate config must clear the
mean - 5*sigma thresholds calibrated over 30 trials
(``benchmarks/calibrate_gates.py``; methodology from the reference,
``/root/reference/tests/test_model.py:785-790``).

Config mirrors the reference's gate fixture (MF dim 10, lr 0.1, adaptive
hinge, 10 epochs, 80/20 stratified; ``tests/fixtures/model_fixtures.py:24-40``)
on the synthetic ML-100K-scale dataset.
"""
import json
from pathlib import Path

import pytest

GATES_PATH = Path(__file__).parent.parent / 'benchmarks' / 'gates.json'


@pytest.fixture(scope='module')
def gates():
    return json.loads(GATES_PATH.read_text())


@pytest.fixture(scope='module')
def ml100k_scale_sets():
    from collie_tpu.data import stratified_split
    from collie_tpu.data.synthetic import generate_implicit_interactions

    implicit = generate_implicit_interactions(seed=42)
    return stratified_split(implicit, test_p=0.2, seed=42, force_split=True)


def test_implicit_mf_clears_calibrated_gates(gates, ml100k_scale_sets):
    from collie_tpu.evaluate import evaluate_in_batches
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.ops import auc, mapk, mrr
    from collie_tpu.training.trainer import CollieTrainer

    train, test = ml100k_scale_sets
    model = MatrixFactorizationModel(train=train, embedding_dim=10, lr=1e-1,
                                     loss='adaptive', seed=1234)
    trainer = CollieTrainer(model, max_epochs=10, verbosity=0, seed=1234)
    trainer.fit(model)
    mapk_s, mrr_s, auc_s = evaluate_in_batches([mapk, mrr, auc], test, model,
                                               k=10, verbose=False)
    assert mapk_s > gates['mapk']['gate'], f'MAP@10 {mapk_s} under gate'
    assert mrr_s > gates['mrr']['gate'], f'MRR {mrr_s} under gate'
    assert auc_s > gates['auc']['gate'], f'AUC {auc_s} under gate'


def test_explicit_mf_clears_calibrated_mse_gate(gates):
    from collie_tpu.data import ExplicitInteractions, stratified_split
    from collie_tpu.data.synthetic import generate_interactions_df
    from collie_tpu.evaluate import explicit_evaluate_in_batches
    from collie_tpu.models.matrix_factorization import MatrixFactorizationModel
    from collie_tpu.training.trainer import CollieTrainer

    df = generate_interactions_df(seed=42)
    explicit = ExplicitInteractions(users=df['user_id'].values,
                                    items=df['item_id'].values,
                                    ratings=df['rating'].values,
                                    allow_missing_ids=True,
                                    num_users=943, num_items=1682)
    train, test = stratified_split(explicit, test_p=0.2, seed=42, force_split=True)
    model = MatrixFactorizationModel(train=train, embedding_dim=10, lr=1e-2,
                                     loss='mse', y_range=(1, 5), seed=1234)
    trainer = CollieTrainer(model, max_epochs=10, verbosity=0, seed=1234)
    trainer.fit(model)
    mse = explicit_evaluate_in_batches(['mse'], test, model)
    assert mse < gates['mse']['gate'], f'MSE {mse} over gate'


PARITY_PATH = Path(__file__).parent.parent / 'benchmarks' / 'parity_vs_torch.json'


def test_head_to_head_parity_vs_torch_artifact():
    """Gate on the measured head-to-head vs the torch reference stack
    (``benchmarks/parity_vs_torch.py``; methodology of the reference's
    mean - 5*sigma trials, ``/root/reference/tests/test_model.py:785-790``).

    The artifact is produced on TPU by the harness; this test asserts the
    recorded comparison holds, so a regression that degrades quality must
    either fail the regenerated artifact or show up as a stale config here.
    """
    parity = json.loads(PARITY_PATH.read_text())
    assert parity['config']['trials'] >= 10
    for metric in ('mapk', 'mrr', 'auc'):
        stats = parity['metrics'][metric]
        assert stats['pass'], (
            f'{metric}: collie_tpu mean {stats["collie_tpu_mean"]} below the '
            f'torch-reference gate {stats["gate_torch_mean_minus_5_std"]}'
        )
        # the rebuilt stack must be within a few percent of the reference
        # stack's mean, not merely above the 5-sigma floor
        assert stats['ratio_vs_torch'] > 0.95, (metric, stats['ratio_vs_torch'])
    assert parity['all_pass']
