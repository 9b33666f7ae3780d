"""Hybrid recommender seeded from a trained ``MatrixFactorizationModel``.

Rebuild of ``HybridPretrainedModel``
(``/root/reference/collie/model/hybrid_pretrained_matrix_factorization.py:23-555``):
the same metadata-tower + combined-MLP architecture as ``HybridModel``, but
the user/item embeddings and biases are deep-copied from a trained MF model
(``:241-250``) and can be frozen/unfrozen (``:476-484``).  Single-stage.
Saving writes a directory excluding the donor model (``:486-534``);
``load_from_hybrid_model`` copies hparams + weights from another instance
(``:536-555``).
"""
from typing import Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp

from collie_tpu.config import DATA_PATH
from collie_tpu.models._hybrid_common import (as_float_array, build_combined_params,
                                              build_metadata_tower_params,
                                              combined_prediction, hybrid_pairwise_scores, load_hybrid_metadata,
                                              metadata_tower_output, save_hybrid_model)
from collie_tpu.models.base import INTERACTIONS_LIKE_INPUT, BasePipeline
from collie_tpu.ops.embeddings import embedding_lookup, scaled_embedding_init, \
    zero_embedding_init
from collie_tpu.training.optimizers import OptimizerSpec, build_transform
from collie_tpu.training.schedulers import ReduceLROnPlateau
from collie_tpu.utils import get_init_arguments, merge_docstrings


def _default_scheduler():
    return ReduceLROnPlateau(patience=1)


class HybridPretrainedModel(BasePipeline):
    """Metadata hybrid on top of pretrained MF embeddings.

    Parameters
    ----------
    trained_model: MatrixFactorizationModel
        Trained donor whose embeddings/biases are copied (never mutated)
    item_metadata / user_metadata: 2-d array / DataFrame
    item_metadata_layers_dims / user_metadata_layers_dims: list or None
    combined_layers_dims: list
    freeze_embeddings: bool
        Freeze the copied embeddings (biases stay trainable, as in the
        reference)
    dropout_p: float
    """

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 item_metadata=None,
                 user_metadata=None,
                 trained_model=None,
                 item_metadata_layers_dims: Optional[List[int]] = None,
                 user_metadata_layers_dims: Optional[List[int]] = None,
                 combined_layers_dims: List[int] = (128, 64, 32),
                 freeze_embeddings: bool = True,
                 dropout_p: float = 0.0,
                 lr: float = 1e-3,
                 lr_scheduler_func: Optional[Callable] = _default_scheduler,
                 weight_decay: float = 0.0,
                 optimizer: Union[str, Callable] = 'adam',
                 loss: Union[str, Callable] = 'hinge',
                 metadata_for_loss: Optional[Dict] = None,
                 metadata_for_loss_weights: Optional[Dict[str, float]] = None,
                 load_model_path: Optional[str] = None,
                 map_location: Optional[str] = None,
                 **kwargs):
        item_metadata_num_cols = None
        user_metadata_num_cols = None

        self.item_metadata = None
        self.user_metadata = None
        self._trained_model = trained_model
        self._embeddings_frozen = bool(freeze_embeddings)

        if load_model_path is None:
            if trained_model is None:
                raise ValueError('Must provide ``trained_model`` for ``HybridPretrainedModel``.')
            if item_metadata is None and user_metadata is None:
                raise ValueError(
                    'Must provide item metadata and/or user_metadata for '
                    '``HybridPretrainedModel``.'
                )
            item_metadata = as_float_array(item_metadata)
            user_metadata = as_float_array(user_metadata)
            if item_metadata is not None:
                item_metadata_num_cols = item_metadata.shape[1]
            if user_metadata is not None:
                user_metadata_num_cols = user_metadata.shape[1]

        init_args = get_init_arguments()
        init_args['combined_layers_dims'] = list(combined_layers_dims)
        for consumed in ('item_metadata', 'user_metadata', 'trained_model'):
            init_args.pop(consumed, None)
        super().__init__(item_metadata_num_cols=item_metadata_num_cols,
                         user_metadata_num_cols=user_metadata_num_cols,
                         item_metadata=item_metadata,
                         user_metadata=user_metadata,
                         trained_model=trained_model,
                         **init_args)

    __doc__ = merge_docstrings(BasePipeline, __doc__, __init__)

    def _sharded_eval_localizable(self) -> bool:
        # scoring gathers item/user METADATA (non-param arrays) by global id
        return False

    def _setup_model(self, **kwargs) -> None:
        if kwargs.get('item_metadata') is not None:
            self.item_metadata = jnp.asarray(kwargs['item_metadata'])
        if kwargs.get('user_metadata') is not None:
            self.user_metadata = jnp.asarray(kwargs['user_metadata'])

        if self.hparams.get('load_model_path') is None:
            donor = self._trained_model
            # record donor dims so a load can rebuild the tables (``:256-260``)
            self.hparams['user_num_embeddings'] = donor.params['user_embeddings'].shape[0]
            self.hparams['user_embeddings_dim'] = donor.params['user_embeddings'].shape[1]
            self.hparams['item_num_embeddings'] = donor.params['item_embeddings'].shape[0]
            self.hparams['item_embeddings_dim'] = donor.params['item_embeddings'].shape[1]

        super()._setup_model(**kwargs)

        if self.hparams.get('load_model_path') is None:
            # copy (never alias) the donor weights (``:241-250``)
            donor = self._trained_model
            self.params = {
                **self.params,
                'user_embeddings': jnp.array(donor.params['user_embeddings']),
                'item_embeddings': jnp.array(donor.params['item_embeddings']),
                'user_biases': jnp.array(donor.params['user_biases']),
                'item_biases': jnp.array(donor.params['item_biases']),
            }

    def _build_params(self, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        user_n = self.hparams['user_num_embeddings']
        user_d = self.hparams['user_embeddings_dim']
        item_n = self.hparams['item_num_embeddings']
        item_d = self.hparams['item_embeddings_dim']
        rngs = jax.random.split(rng, 4)
        params = {
            # dummy tables; overwritten by the donor copy or the loaded weights
            'user_embeddings': scaled_embedding_init(rngs[0], user_n, user_d),
            'item_embeddings': scaled_embedding_init(rngs[1], item_n, item_d),
            'user_biases': zero_embedding_init(user_n),
            'item_biases': zero_embedding_init(item_n),
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

        combined_in = user_d + item_d + (item_out or 0) + (user_out or 0)
        build_combined_params(params, jax.random.fold_in(rng, 7), combined_in,
                              self.hparams['combined_layers_dims'])
        return params

    @property
    def n_combined_layers(self) -> int:
        return len(self.hparams['combined_layers_dims']) + 1

    def _n_meta_layers(self, metadata_type: str) -> int:
        dims = self.hparams.get(f'{metadata_type}_metadata_layers_dims')
        return len(dims) if dims is not None else 0

    def score(self, params, users, items, training=False, rng=None):
        p = self.hparams.get('dropout_p', 0.0)
        rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3

        user_emb = embedding_lookup(params['user_embeddings'], users)
        item_emb = embedding_lookup(params['item_embeddings'], items)
        if self._embeddings_frozen:
            # frozen embeddings receive no gradient (reference sets
            # ``requires_grad = False``; they are also excluded from the
            # optimizer below, so stop_gradient keeps semantics identical)
            user_emb = jax.lax.stop_gradient(user_emb)
            item_emb = jax.lax.stop_gradient(item_emb)

        pieces = []
        if self.user_metadata is not None:
            pieces.append(metadata_tower_output(
                params, self.user_metadata, users, 'user',
                self._n_meta_layers('user'), p, training, rngs[0]))
        pieces.append(user_emb)
        pieces.append(item_emb)
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
        """Tile-after-gather combined-MLP path (see
        ``_hybrid_common.hybrid_pairwise_scores``); same rng stream layout as
        ``score`` (split(3): towers 0/1, combined 2), same frozen-embedding
        stop_gradient semantics."""
        rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
        return hybrid_pairwise_scores(
            self, params, users, items, rngs, training,
            stop_grad_embeddings=self._embeddings_frozen)

    def freeze_embeddings(self) -> None:
        """Stop optimizing the copied embedding tables (reference ``:476-479``)."""
        self._embeddings_frozen = True
        self._jit_score_cache = None
        self._jit_score_all_cache = None
        self._compiled_fn_cache = {}

    def unfreeze_embeddings(self) -> None:
        """Resume optimizing the copied embedding tables (reference ``:481-484``)."""
        self._embeddings_frozen = False
        self._jit_score_cache = None
        self._jit_score_all_cache = None
        self._compiled_fn_cache = {}

    def optimizer_specs(self) -> List[OptimizerSpec]:
        keys = sorted(self.params.keys())
        if self._embeddings_frozen:
            keys = [k for k in keys if k not in ('user_embeddings', 'item_embeddings')]
        return [OptimizerSpec(
            name='all',
            transform=build_transform(self.optimizer, self.hparams['lr'],
                                      self.hparams.get('weight_decay', 0.0)),
            keys=keys)]

    def _get_item_embeddings(self) -> jnp.ndarray:
        return self.params['item_embeddings']

    def _get_user_embeddings(self) -> jnp.ndarray:
        return self.params['user_embeddings']

    def save_model(self, path=str(DATA_PATH / 'model'), overwrite: bool = False) -> None:
        """Directory save excluding the donor model (reference ``:486-534``)."""
        save_hybrid_model(self, path, overwrite)

    def _load_model_init_helper(self, load_model_path, **kwargs) -> None:
        import os
        load_hybrid_metadata(self, load_model_path)
        super()._load_model_init_helper(
            load_model_path=os.path.join(str(load_model_path), 'model.npz'), **kwargs)

    def load_from_hybrid_model(self, hybrid_model: 'HybridPretrainedModel') -> None:
        """Copy hparams + weights from another instance (reference ``:536-555``)."""
        for key, value in hybrid_model.hparams.items():
            self.hparams[key] = value
        self.item_metadata = hybrid_model.item_metadata
        self.user_metadata = hybrid_model.user_metadata
        self.params = {k: jnp.array(v) for k, v in hybrid_model.params.items()}
        self._jit_score_cache = None
        self._jit_score_all_cache = None
