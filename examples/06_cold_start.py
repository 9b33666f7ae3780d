"""Multi-stage cold-start model (reference ``tutorials/06_multi_stage_models.ipynb``):
train on item genre buckets first, expand to per-item embeddings seeded from
their bucket, and score a brand-new item from its bucket alone.

Run:  python examples/06_cold_start.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _scale import cap_interactions_df, epochs, scaled

from collie_tpu.cross_validation import stratified_split
from collie_tpu.interactions import Interactions
from collie_tpu.metrics import auc, evaluate_in_batches, mapk
from collie_tpu.model import ColdStartModel, CollieTrainer
from collie_tpu.movielens import get_movielens_metadata, read_movielens_df, \
    read_movielens_df_item
from collie_tpu.utils import convert_to_implicit


def main():
    df = cap_interactions_df(convert_to_implicit(read_movielens_df(synthetic_fallback=True)))
    interactions = Interactions(users=df['user_id'].values, items=df['item_id'].values,
                                allow_missing_ids=True, num_items=1682)
    train, test = stratified_split(interactions, test_p=0.2, seed=42)

    # bucket items by primary genre
    metadata_df = get_movielens_metadata(read_movielens_df_item(synthetic_fallback=True))
    genre_cols = [c for c in metadata_df.columns if c.startswith('genre_')]
    item_buckets = metadata_df[genre_cols].values.argmax(axis=1)

    model = ColdStartModel(train=train, item_buckets=item_buckets,
                           embedding_dim=30, item_buckets_stage_lr=1e-1,
                           no_buckets_stage_lr=1e-2, loss='adaptive')
    trainer = CollieTrainer(model, max_epochs=epochs(5), verbosity=0)
    trainer.fit(model)                 # stage: item_buckets
    print('bucket-stage AUC =',
          round(evaluate_in_batches([auc], test, model, verbose=False), 5))

    model.advance_stage()              # bucket embeddings copied into item tables
    trainer.max_epochs += scaled(10, 1)
    trainer.fit(model)                 # stage: no_buckets
    mapk_score, auc_score = evaluate_in_batches([mapk, auc], test, model,
                                                verbose=False)
    print(f'final MAP@10={mapk_score:.5f}  AUC={auc_score:.5f}')

    # a hypothetical new item in bucket 3: most similar existing items
    print('cold-start neighbors of bucket 3:',
          model.item_bucket_item_similarity(3)[:5].index.tolist())


if __name__ == '__main__':
    main()
