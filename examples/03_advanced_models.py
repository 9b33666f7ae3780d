"""Advanced architectures (reference ``tutorials/03_advanced_matrix_factorization.ipynb``):
MLP-MF, nonlinear MF towers, NeuMF, DeepFM, and collaborative metric learning
on the same implicit data.

Run:  python examples/03_advanced_models.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _scale import cap_interactions_df, epochs

from collie_tpu.cross_validation import stratified_split
from collie_tpu.interactions import Interactions
from collie_tpu.metrics import auc, evaluate_in_batches, mapk
from collie_tpu.model import (CollaborativeMetricLearningModel, CollieTrainer, DeepFM,
                              MLPMatrixFactorizationModel, NeuralCollaborativeFiltering,
                              NonlinearMatrixFactorizationModel)
from collie_tpu.movielens import read_movielens_df
from collie_tpu.utils import convert_to_implicit


def main():
    df = cap_interactions_df(convert_to_implicit(read_movielens_df(synthetic_fallback=True)))
    interactions = Interactions(users=df['user_id'].values, items=df['item_id'].values,
                                allow_missing_ids=True)
    train, test = stratified_split(interactions, test_p=0.2, seed=42)

    zoo = [
        ('MLP-MF', MLPMatrixFactorizationModel(train=train, embedding_dim=16,
                                               num_layers=2, lr=1e-2, loss='adaptive')),
        ('NonlinearMF', NonlinearMatrixFactorizationModel(
            train=train, user_embedding_dim=30, item_embedding_dim=30,
            user_dense_layers_dims=[24, 16], item_dense_layers_dims=[24, 16],
            lr=1e-2, loss='adaptive')),
        ('NeuMF', NeuralCollaborativeFiltering(train=train, embedding_dim=8,
                                               num_layers=3, lr=1e-2,
                                               loss='adaptive')),
        ('DeepFM', DeepFM(train=train, embedding_dim=8, num_layers=2, lr=1e-2,
                          loss='adaptive')),
        ('CML', CollaborativeMetricLearningModel(train=train, embedding_dim=16,
                                                 lr=1e-2, loss='adaptive')),
    ]

    for name, model in zoo:
        trainer = CollieTrainer(model, max_epochs=epochs(8), verbosity=0)
        trainer.fit(model)
        mapk_score, auc_score = evaluate_in_batches([mapk, auc], test, model,
                                                    verbose=False)
        print(f'{name:<12} MAP@10={mapk_score:.5f}  AUC={auc_score:.5f}')


if __name__ == '__main__':
    main()
