"""Hybrid metadata models (reference ``tutorials/05_hybrid_model.ipynb``):
``HybridPretrainedModel`` on top of a trained MF donor, and the fully
trainable multi-stage ``HybridModel``.

Run:  python examples/05_hybrid_model.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _scale import cap_interactions_df, epochs, scaled

from collie_tpu.cross_validation import stratified_split
from collie_tpu.interactions import Interactions
from collie_tpu.metrics import auc, evaluate_in_batches, mapk
from collie_tpu.model import (CollieTrainer, HybridModel, HybridPretrainedModel,
                              MatrixFactorizationModel)
from collie_tpu.movielens import get_movielens_metadata, read_movielens_df, \
    read_movielens_df_item
from collie_tpu.utils import convert_to_implicit


def main():
    df = cap_interactions_df(convert_to_implicit(read_movielens_df(synthetic_fallback=True)))
    interactions = Interactions(users=df['user_id'].values, items=df['item_id'].values,
                                allow_missing_ids=True, num_items=1682)
    train, test = stratified_split(interactions, test_p=0.2, seed=42)
    item_metadata = get_movielens_metadata(
        read_movielens_df_item(synthetic_fallback=True))

    # 1. train the MF donor
    mf = MatrixFactorizationModel(train=train, embedding_dim=30, lr=1e-1,
                                  loss='adaptive')
    CollieTrainer(mf, max_epochs=epochs(10), verbosity=0).fit(mf)
    print('donor MF   MAP@10 =',
          round(evaluate_in_batches([mapk], test, mf, verbose=False), 5))

    # 2. hybrid on frozen pretrained embeddings, then fine-tune unfrozen
    hybrid = HybridPretrainedModel(train=train, item_metadata=item_metadata,
                                   trained_model=mf, combined_layers_dims=[32, 16],
                                   lr=1e-2, loss='adaptive')
    trainer = CollieTrainer(hybrid, max_epochs=epochs(10), verbosity=0)
    trainer.fit(hybrid)
    hybrid.unfreeze_embeddings()
    trainer.max_epochs += scaled(5, 1)
    trainer.fit(hybrid)
    print('hybrid-pretrained MAP@10 =',
          round(evaluate_in_batches([mapk], test, hybrid, verbose=False), 5))

    # 3. fully trainable multi-stage hybrid
    staged = HybridModel(train=train, item_metadata=item_metadata,
                         embedding_dim=30, combined_layers_dims=[32, 16],
                         lr=1e-1, loss='adaptive')
    trainer = CollieTrainer(staged, max_epochs=epochs(6), verbosity=0)
    trainer.fit(staged)                # stage: matrix_factorization
    staged.advance_stage()
    trainer.max_epochs += scaled(4, 1)
    trainer.fit(staged)                # stage: metadata_only
    staged.advance_stage()
    trainer.max_epochs += scaled(4, 1)
    trainer.fit(staged)                # stage: all
    print('multi-stage hybrid MAP@10 =',
          round(evaluate_in_batches([mapk], test, staged, verbose=False), 5))


if __name__ == '__main__':
    main()
