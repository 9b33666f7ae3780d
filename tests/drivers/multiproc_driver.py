"""Multi-process training driver, spawned by tests/test_multiprocess.py.

Each process runs this same script (JAX's multi-controller model): connect
via ``distributed.initialize``, build the identical tiny dataset/model,
train over the GLOBAL 8-device mesh with per-process epoch feeding, then
evaluate mesh-sharded.  Process 0 prints one JSON line; with
``--num-processes 1`` the same script is the single-process baseline the
test compares against.
"""
import argparse
import json
import os
import sys
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--process-id', type=int, default=0)
    p.add_argument('--num-processes', type=int, default=1)
    p.add_argument('--port', type=int, default=12399)
    p.add_argument('--local-devices', type=int, required=True)
    p.add_argument('--model-axis', type=int, default=2)
    p.add_argument('--epochs', type=int, default=3)
    p.add_argument('--mode', choices=['train', 'resume', 'save'],
                   default='train')
    p.add_argument('--corrupt', action='store_true',
                   help='process 1 perturbs one interaction before fit '
                        '(negative test for the fit-start data fingerprint)')
    p.add_argument('--ckpt-dir', default=None)
    args = p.parse_args()

    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    os.environ['XLA_FLAGS'] = (
        f'{flags} --xla_force_host_platform_device_count={args.local_devices}'
    ).strip()
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

    import jax
    jax.config.update('jax_platforms', 'cpu')

    from collie_tpu.parallel import distributed, make_mesh
    distributed.initialize(coordinator_address=f'localhost:{args.port}',
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    from __graft_entry__ import _tiny_model
    from collie_tpu.evaluate import evaluate_in_batches
    from collie_tpu.ops import mapk, mrr
    from collie_tpu.training.trainer import CollieTrainer

    mesh = make_mesh(model=args.model_axis)

    class ListLogger:
        def __init__(self):
            self.epoch_losses = []

        def log_metrics(self, metrics, step):
            if 'train_loss_epoch' in metrics:
                self.epoch_losses.append(float(metrics['train_loss_epoch']))

    if args.mode == 'train':
        model, loader = _tiny_model(batch_size=64)
        if args.corrupt and jax.process_index() == 1:
            mat = loader.interactions.mat
            mat.col[0] = (mat.col[0] + 1) % loader.num_items
        logger = ListLogger()
        trainer = CollieTrainer(model, max_epochs=args.epochs, verbosity=0,
                                mesh=mesh, seed=0, logger=logger)
        trainer.fit(model)
        scores = evaluate_in_batches([mapk, mrr], loader.interactions, model,
                                     k=5, verbose=False, mesh=mesh)
        result = {'train_losses': logger.epoch_losses,
                  'mapk': scores[0], 'mrr': scores[1]}
    elif args.mode == 'save':
        # write a per-shard checkpoint from THIS topology (for the
        # cross-topology restore test, which resumes it in-process on a
        # different mesh), plus the uninterrupted 4-epoch loss trajectory
        ckpt = Path(args.ckpt_dir)
        model, _ = _tiny_model(batch_size=64)
        log1 = ListLogger()
        t1 = CollieTrainer(model, max_epochs=2, verbosity=0, mesh=mesh,
                           seed=0, logger=log1, checkpoint_dir=str(ckpt / 'a'))
        t1.fit(model)

        model3, _ = _tiny_model(batch_size=64)
        log3 = ListLogger()
        t3 = CollieTrainer(model3, max_epochs=4, verbosity=0, mesh=mesh,
                           seed=0, logger=log3)
        t3.fit(model3)
        result = {'first_losses': log1.epoch_losses,
                  'uninterrupted_losses': log3.epoch_losses}
    else:  # resume: fit 2 epochs w/ per-shard checkpoints, restore, fit to 4
        ckpt = Path(args.ckpt_dir)
        model, loader = _tiny_model(batch_size=64)
        log1 = ListLogger()
        t1 = CollieTrainer(model, max_epochs=2, verbosity=0, mesh=mesh,
                           seed=0, logger=log1, checkpoint_dir=str(ckpt / 'a'))
        t1.fit(model)

        model2, _ = _tiny_model(batch_size=64)
        log2 = ListLogger()
        t2 = CollieTrainer(model2, max_epochs=4, verbosity=0, mesh=mesh,
                           seed=0, logger=log2, checkpoint_dir=str(ckpt / 'b'))
        t2.resume_from_checkpoint(ckpt / 'a' / 'checkpoint_epoch_2.shards')
        t2.fit(model2)

        model3, _ = _tiny_model(batch_size=64)
        log3 = ListLogger()
        t3 = CollieTrainer(model3, max_epochs=4, verbosity=0, mesh=mesh,
                           seed=0, logger=log3, checkpoint_dir=str(ckpt / 'c'))
        t3.fit(model3)
        result = {'first_losses': log1.epoch_losses,
                  'resumed_losses': log2.epoch_losses,
                  'uninterrupted_losses': log3.epoch_losses}

    if jax.process_index() == 0:
        print('RESULT ' + json.dumps(result), flush=True)


if __name__ == '__main__':
    main()
