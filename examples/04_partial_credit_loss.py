"""Partial-credit metadata losses (reference ``tutorials/04_partial_credit_loss.ipynb``):
sampled negatives sharing a genre with the positive item are penalized less.

Run:  python examples/04_partial_credit_loss.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from _scale import cap_interactions_df, epochs

from collie_tpu.cross_validation import stratified_split
from collie_tpu.interactions import Interactions
from collie_tpu.metrics import auc, evaluate_in_batches, mapk
from collie_tpu.model import CollieTrainer, MatrixFactorizationModel
from collie_tpu.movielens import get_movielens_metadata, read_movielens_df, \
    read_movielens_df_item
from collie_tpu.utils import convert_to_implicit


def main():
    df = cap_interactions_df(convert_to_implicit(read_movielens_df(synthetic_fallback=True)))
    interactions = Interactions(users=df['user_id'].values, items=df['item_id'].values,
                                allow_missing_ids=True, num_items=1682)
    train, test = stratified_split(interactions, test_p=0.2, seed=42)

    # categorical genre label per item from the one-hot metadata
    metadata_df = get_movielens_metadata(read_movielens_df_item(synthetic_fallback=True))
    genre_cols = [c for c in metadata_df.columns if c.startswith('genre_')]
    genres = metadata_df[genre_cols].values.argmax(axis=1)

    for label, kwargs in [
        ('plain adaptive hinge', {}),
        ('partial credit (genre 0.3)',
         dict(metadata_for_loss={'genre': genres},
              metadata_for_loss_weights={'genre': 0.3})),
    ]:
        model = MatrixFactorizationModel(train=train, embedding_dim=10, lr=1e-1,
                                         loss='adaptive', **kwargs)
        trainer = CollieTrainer(model, max_epochs=epochs(10), verbosity=0)
        trainer.fit(model)
        mapk_score, auc_score = evaluate_in_batches([mapk, auc], test, model,
                                                    verbose=False)
        print(f'{label:<28} MAP@10={mapk_score:.5f}  AUC={auc_score:.5f}')


if __name__ == '__main__':
    main()
