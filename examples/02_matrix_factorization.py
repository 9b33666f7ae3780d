"""Implicit matrix factorization quickstart (reference ``tutorials/02_matrix_factorization.ipynb``
and the README quickstart config: dim 10, lr 0.1, adaptive hinge, adam).

Run:  python examples/02_matrix_factorization.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _scale import cap_interactions_df, epochs

from collie_tpu.cross_validation import stratified_split
from collie_tpu.interactions import Interactions
from collie_tpu.metrics import auc, evaluate_in_batches, mapk, mrr
from collie_tpu.model import CollieTrainer, MatrixFactorizationModel
from collie_tpu.movielens import read_movielens_df
from collie_tpu.retrieval import recommend
from collie_tpu.utils import convert_to_implicit


def main():
    df = cap_interactions_df(convert_to_implicit(read_movielens_df(synthetic_fallback=True)))
    interactions = Interactions(users=df['user_id'].values, items=df['item_id'].values,
                                allow_missing_ids=True)
    train, test = stratified_split(interactions, test_p=0.2, seed=42)

    model = MatrixFactorizationModel(train=train,
                                     embedding_dim=10,
                                     lr=1e-1,
                                     loss='adaptive')
    trainer = CollieTrainer(model, max_epochs=epochs(10))
    trainer.fit(model)

    mapk_score, mrr_score, auc_score = evaluate_in_batches([mapk, mrr, auc], test, model)
    print(f'MAP@10: {mapk_score:.5f}  MRR: {mrr_score:.5f}  AUC: {auc_score:.5f}')

    # single-user API (reference parity) and batch serving (TPU-native)
    print('user 0 top-5 unseen items:',
          model.get_item_predictions(0, unseen_items_only=True)[:5].index.tolist())
    ids, scores = recommend(model, [0, 1, 2], k=5)
    print('batch recommend:', ids.tolist())

    model.save_model('data/mf_model.npz')
    loaded = MatrixFactorizationModel(load_model_path='data/mf_model.npz')
    print('round-trip ok:', float(loaded([0], [0])[0]) == float(model([0], [0])[0]))


if __name__ == '__main__':
    main()
