"""Multi-chip training and retrieval (TPU-native; no reference counterpart —
the reference delegates multi-GPU entirely to PyTorch Lightning).

Demonstrates the (data, model) mesh: batch sharded over ``data``, embedding
tables + Adam moments row-sharded over ``model``, and item-sharded top-k
retrieval.  Works on real multi-chip TPUs or, for a dry run, on virtual CPU
devices:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/08_multichip_sharding.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _scale import epochs, scaled

import jax

from collie_tpu.cross_validation import stratified_split
from collie_tpu.data.synthetic import generate_implicit_interactions
from collie_tpu.metrics import auc, evaluate_in_batches, mapk
from collie_tpu.model import CollieTrainer, MatrixFactorizationModel
from collie_tpu.parallel import make_mesh
from collie_tpu.retrieval import recommend


def main():
    devices = jax.devices()
    print(f'{len(devices)} devices: {devices[0].platform}')
    model_axis = 2 if len(devices) % 2 == 0 and len(devices) > 1 else 1
    mesh = make_mesh(model=model_axis)
    print(f'mesh: data={mesh.shape["data"]} x model={mesh.shape["model"]}')

    # table sizes divisible by the model axis so rows shard evenly
    interactions = generate_implicit_interactions(num_users=512, num_items=1024,
                                                  num_interactions=scaled(40_000, 8_000),
                                                  seed=0)
    train, test = stratified_split(interactions, test_p=0.2, seed=0,
                                   force_split=True)

    model = MatrixFactorizationModel(train=train, embedding_dim=32, lr=1e-1,
                                     loss='adaptive', seed=0)
    trainer = CollieTrainer(model, max_epochs=epochs(5), verbosity=1, mesh=mesh, seed=0)
    trainer.fit(model)

    mapk_score, auc_score = evaluate_in_batches([mapk, auc], test, model,
                                                verbose=False)
    print(f'MAP@10={mapk_score:.5f}  AUC={auc_score:.5f}')

    ids, _ = recommend(model, [0, 1, 2, 3], k=5, filter_seen=True, mesh=mesh)
    print('item-sharded batch recommend:', ids.tolist())


if __name__ == '__main__':
    main()
