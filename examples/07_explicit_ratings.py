"""Explicit star-rating models (reference ``tutorials/quickstart-explicit`` /
``07`` path: MF with MSE, y_range sigmoid rescale onto 1-5 stars).

Run:  python examples/07_explicit_ratings.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _scale import cap_interactions_df, epochs

from collie_tpu.cross_validation import stratified_split
from collie_tpu.interactions import ExplicitInteractions
from collie_tpu.metrics import explicit_evaluate_in_batches
from collie_tpu.model import CollieTrainer, MatrixFactorizationModel
from collie_tpu.movielens import read_movielens_df


def main():
    df = cap_interactions_df(read_movielens_df(synthetic_fallback=True))
    interactions = ExplicitInteractions(users=df['user_id'].values,
                                        items=df['item_id'].values,
                                        ratings=df['rating'].values,
                                        allow_missing_ids=True)
    train, test = stratified_split(interactions, test_p=0.2, seed=42)

    model = MatrixFactorizationModel(train=train,
                                     embedding_dim=10,
                                     lr=1e-2,
                                     loss='mse',
                                     y_range=(1, 5))
    trainer = CollieTrainer(model, max_epochs=epochs(10))
    trainer.fit(model)

    mse, mae = explicit_evaluate_in_batches(['mse', 'mae'], test, model)
    print(f'MSE: {mse:.5f}  MAE: {mae:.5f}')
    print('predicted stars for user 0, items 0-4:',
          [round(float(s), 2) for s in model([0] * 5, list(range(5)))])


if __name__ == '__main__':
    main()
