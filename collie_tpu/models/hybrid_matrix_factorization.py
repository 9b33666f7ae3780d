"""Multi-stage hybrid recommender with trainable embeddings + metadata towers.

Rebuild of ``HybridModel``
(``/root/reference/collie/model/hybrid_matrix_factorization.py:28-595``).
Stages (``:43-52``): ``matrix_factorization`` (pure MF, metadata ignored) ->
``metadata_only`` (embeddings frozen; metadata/combined/bias layers train) ->
``all`` (everything trains).  The forward switches on the stage
(``:479-546``): MF dot product, or the combined MLP over
``concat([user_meta_out], user_emb, item_emb, [item_meta_out])`` + biases.
Saving writes a directory with the model plus metadata arrays (``:558-595``).
"""
from typing import Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp

from collie_tpu.config import DATA_PATH
from collie_tpu.models._hybrid_common import (as_float_array, build_combined_params,
                                              build_metadata_tower_params,
                                              combined_prediction, hybrid_pairwise_scores, load_hybrid_metadata,
                                              metadata_tower_output, save_hybrid_model)
from collie_tpu.models.base import INTERACTIONS_LIKE_INPUT
from collie_tpu.models.multi_stage import MultiStagePipeline
from collie_tpu.ops.embeddings import dropout, embedding_lookup, scaled_embedding_init, tiled_dropout_dots, \
    zero_embedding_init
from collie_tpu.training.schedulers import ReduceLROnPlateau
from collie_tpu.utils import get_init_arguments, merge_docstrings


def _default_scheduler():
    return ReduceLROnPlateau(patience=1)


class HybridModel(MultiStagePipeline):
    """Staged MF + metadata-MLP hybrid.

    Parameters
    ----------
    item_metadata: 2-d array / DataFrame, ``num_items x features``
    user_metadata: 2-d array / DataFrame, ``num_users x features``
    embedding_dim: int
    item_metadata_layers_dims / user_metadata_layers_dims: list or None
        Tower widths over the raw metadata before concatenation
    combined_layers_dims: list
        Widths of the combined MLP between the concatenation and the 1-unit
        output layer
    dropout_p: float
    metadata_only_stage_lr / all_stage_lr: float
    metadata_only_stage_optimizer / all_stage_optimizer: str
    """

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 item_metadata=None,
                 user_metadata=None,
                 embedding_dim: int = 30,
                 item_metadata_layers_dims: Optional[List[int]] = None,
                 user_metadata_layers_dims: Optional[List[int]] = None,
                 combined_layers_dims: List[int] = (128, 64, 32),
                 dropout_p: float = 0.0,
                 lr: float = 1e-3,
                 bias_lr: Optional[Union[float, str]] = 1e-2,
                 metadata_only_stage_lr: float = 1e-3,
                 all_stage_lr: float = 1e-4,
                 lr_scheduler_func: Optional[Callable] = _default_scheduler,
                 weight_decay: float = 0.0,
                 optimizer: Union[str, Callable] = 'adam',
                 bias_optimizer: Optional[Union[str, Callable]] = 'sgd',
                 metadata_only_stage_optimizer: Union[str, Callable] = 'adam',
                 all_stage_optimizer: Union[str, Callable] = 'adam',
                 loss: Union[str, Callable] = 'hinge',
                 metadata_for_loss: Optional[Dict] = None,
                 metadata_for_loss_weights: Optional[Dict[str, float]] = None,
                 load_model_path: Optional[str] = None,
                 map_location: Optional[str] = None,
                 **kwargs):
        item_metadata_num_cols = None
        user_metadata_num_cols = None
        optimizer_config_list = None

        self.item_metadata = None
        self.user_metadata = None

        if load_model_path is None:
            if item_metadata is None and user_metadata is None:
                raise ValueError(
                    'Must provide item metadata and/or user metadata for ``HybridModel``.'
                )
            item_metadata = as_float_array(item_metadata)
            user_metadata = as_float_array(user_metadata)
            if item_metadata is not None:
                item_metadata_num_cols = item_metadata.shape[1]
            if user_metadata is not None:
                user_metadata_num_cols = user_metadata.shape[1]

            # stage/optimizer layout mirrors reference ``:204-255``
            if bias_optimizer is not None:
                initial_optimizer_block = [
                    {
                        'lr': lr,
                        'optimizer': optimizer,
                        'parameter_prefix_list': ['user_embedding', 'item_embedding'],
                        'stage': 'matrix_factorization',
                    },
                    {
                        'lr': lr if bias_lr == 'infer' else bias_lr,
                        'optimizer': optimizer if bias_optimizer == 'infer' else bias_optimizer,
                        'parameter_prefix_list': ['user_bias', 'item_bias'],
                        'stage': 'matrix_factorization',
                    },
                ]
            else:
                initial_optimizer_block = [
                    {
                        'lr': lr,
                        'optimizer': optimizer,
                        'parameter_prefix_list': ['user_embedding', 'item_embedding',
                                                  'user_bias', 'item_bias'],
                        'stage': 'matrix_factorization',
                    },
                ]

            optimizer_config_list = initial_optimizer_block + [
                {
                    'lr': metadata_only_stage_lr,
                    'optimizer': metadata_only_stage_optimizer,
                    'parameter_prefix_list': ['item_metadata', 'user_metadata',
                                              'combined', 'user_bias', 'item_bias'],
                    'stage': 'metadata_only',
                },
                {
                    'lr': all_stage_lr,
                    'optimizer': all_stage_optimizer,
                    'parameter_prefix_list': ['user', 'item', 'combined'],
                    'stage': 'all',
                },
            ]

        init_args = get_init_arguments()
        init_args['combined_layers_dims'] = list(combined_layers_dims)
        init_args.pop('item_metadata', None)
        init_args.pop('user_metadata', None)
        super().__init__(optimizer_config_list=optimizer_config_list,
                         item_metadata_num_cols=item_metadata_num_cols,
                         user_metadata_num_cols=user_metadata_num_cols,
                         item_metadata=item_metadata,
                         user_metadata=user_metadata,
                         **init_args)

    __doc__ = merge_docstrings(MultiStagePipeline, __doc__, __init__)

    def _sharded_eval_localizable(self) -> bool:
        # scoring gathers item/user METADATA (non-param arrays) by global id
        return False

    def _setup_model(self, **kwargs) -> None:
        if kwargs.get('item_metadata') is not None:
            self.item_metadata = jnp.asarray(kwargs['item_metadata'])
        if kwargs.get('user_metadata') is not None:
            self.user_metadata = jnp.asarray(kwargs['user_metadata'])
        super()._setup_model(**kwargs)

    def _build_params(self, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        num_users = self.hparams['num_users']
        num_items = self.hparams['num_items']
        dim = self.hparams['embedding_dim']
        rngs = jax.random.split(rng, 5)
        params = {
            'user_embeddings': scaled_embedding_init(rngs[0], num_users, dim),
            'item_embeddings': scaled_embedding_init(rngs[1], num_items, dim),
            'user_biases': zero_embedding_init(num_users),
            'item_biases': zero_embedding_init(num_items),
        }

        item_out = self.hparams.get('item_metadata_num_cols')
        if self.hparams.get('item_metadata_layers_dims') is not None:
            build_metadata_tower_params(params, rngs[2], 'item',
                                        self.hparams['item_metadata_layers_dims'],
                                        self.hparams['item_metadata_num_cols'])
            item_out = self.hparams['item_metadata_layers_dims'][-1]
        user_out = self.hparams.get('user_metadata_num_cols')
        if self.hparams.get('user_metadata_layers_dims') is not None:
            build_metadata_tower_params(params, rngs[3], 'user',
                                        self.hparams['user_metadata_layers_dims'],
                                        self.hparams['user_metadata_num_cols'])
            user_out = self.hparams['user_metadata_layers_dims'][-1]

        combined_in = dim * 2 + (item_out or 0) + (user_out or 0)
        self._n_combined_layers = build_combined_params(
            params, rngs[4], combined_in, self.hparams['combined_layers_dims'])
        return params

    @property
    def n_combined_layers(self) -> int:
        return len(self.hparams['combined_layers_dims']) + 1

    def _n_meta_layers(self, metadata_type: str) -> int:
        dims = self.hparams.get(f'{metadata_type}_metadata_layers_dims')
        return len(dims) if dims is not None else 0

    def score(self, params, users, items, training=False, rng=None):
        p = self.hparams.get('dropout_p', 0.0)
        stage = self.hparams['stage']
        rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4

        if stage == 'matrix_factorization':
            user_emb = dropout(rngs[0], embedding_lookup(params['user_embeddings'], users),
                               p, training)
            item_emb = dropout(rngs[1], embedding_lookup(params['item_embeddings'], items),
                               p, training)
            return ((user_emb * item_emb).sum(axis=1)
                    + params['user_biases'][users] + params['item_biases'][items])

        pieces = []
        if self.user_metadata is not None:
            pieces.append(metadata_tower_output(
                params, self.user_metadata, users, 'user',
                self._n_meta_layers('user'), p, training, rngs[0]))
        pieces.append(embedding_lookup(params['user_embeddings'], users))
        pieces.append(embedding_lookup(params['item_embeddings'], items))
        if self.item_metadata is not None:
            pieces.append(metadata_tower_output(
                params, self.item_metadata, items, 'item',
                self._n_meta_layers('item'), p, training, rngs[1]))

        combined = jnp.concatenate(pieces, axis=1)
        return combined_prediction(params, combined,
                                   params['user_biases'][users],
                                   params['item_biases'][items],
                                   self.n_combined_layers, p, training, rngs[2])

    def pairwise_scores(self, params, users, items, training=False, rng=None):
        """Single-gather fast path for the ``matrix_factorization`` stage
        (identical math to ``score``'s MF branch, dropout masks at the tiled
        shape); the metadata-tower stages run the shared tile-after-gather
        combined-MLP path (``_hybrid_common.hybrid_pairwise_scores`` —
        user-side tables gathered once, backward user scatters shrink from
        R*B to B rows)."""
        if self.hparams['stage'] != 'matrix_factorization':
            # same rng stream layout as score(): split(4), towers 0/1,
            # combined 2
            rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
            return hybrid_pairwise_scores(self, params, users, items, rngs,
                                          training)
        R, B = items.shape
        user_embeddings = embedding_lookup(params['user_embeddings'], users)
        # 2-D ids straight into the gather (structure-preserving on a mesh)
        item_embeddings = embedding_lookup(params['item_embeddings'], items)
        rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
        dots = tiled_dropout_dots(user_embeddings, item_embeddings, R, B,
                                  self.hparams.get('dropout_p', 0.0),
                                  training, rngs[0], rngs[1])
        return (dots + params['user_biases'][users][None, :]
                + params['item_biases'][items])

    def _get_item_embeddings(self) -> jnp.ndarray:
        return self.params['item_embeddings']

    def _get_user_embeddings(self) -> jnp.ndarray:
        return self.params['user_embeddings']

    def save_model(self, path=str(DATA_PATH / 'model'), overwrite: bool = False) -> None:
        """Directory save (reference ``:558-595``)."""
        save_hybrid_model(self, path, overwrite)

    def _load_model_init_helper(self, load_model_path, **kwargs) -> None:
        import os
        load_hybrid_metadata(self, load_model_path)
        super()._load_model_init_helper(
            load_model_path=os.path.join(str(load_model_path), 'model.npz'), **kwargs)
