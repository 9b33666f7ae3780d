"""Cold-start matrix factorization via item buckets.

Rebuild of ``ColdStartModel``
(``/root/reference/collie/model/cold_start_matrix_factorization.py:21-367``).
Two stages:

1. ``item_buckets`` — MF where item IDs map through the ``item_buckets``
   lookup onto shared bucket embeddings/biases (``:304-309``);
2. ``no_buckets`` — per-item MF; on the transition, bucket embeddings/biases
   are gathered into the per-item tables as initialization (``:217-239``) —
   in the functional design this is a single-gather param re-init.

``item_bucket_item_similarity`` scores all items against a bucket embedding
(``:322-359``); bucket validation mirrors ``:192-204``.
"""
from typing import Callable, Dict, Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from collie_tpu.models.base import INTERACTIONS_LIKE_INPUT
from collie_tpu.models.multi_stage import MultiStagePipeline
from collie_tpu.ops.embeddings import dropout, embedding_lookup, scaled_embedding_init, tiled_dropout_dots, \
    zero_embedding_init
from collie_tpu.training.schedulers import ReduceLROnPlateau
from collie_tpu.utils import get_init_arguments, merge_docstrings


def _default_scheduler():
    return ReduceLROnPlateau(patience=1)


class ColdStartModel(MultiStagePipeline):
    """Bucketed-then-per-item MF for cold-start items.

    Parameters
    ----------
    item_buckets: iterable of int
        Bucket ID for each item ID (length ``num_items``, 0-based)
    embedding_dim: int
    dropout_p: float
    item_buckets_stage_lr / no_buckets_stage_lr: float
    item_buckets_stage_optimizer / no_buckets_stage_optimizer: str
    """

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 item_buckets: Optional[Iterable[int]] = None,
                 embedding_dim: int = 30,
                 dropout_p: float = 0.0,
                 sparse: bool = False,
                 item_buckets_stage_lr: float = 1e-3,
                 no_buckets_stage_lr: float = 1e-3,
                 lr_scheduler_func: Optional[Callable] = _default_scheduler,
                 weight_decay: float = 0.0,
                 item_buckets_stage_optimizer: Union[str, Callable] = 'adam',
                 no_buckets_stage_optimizer: Union[str, Callable] = 'adam',
                 loss: Union[str, Callable] = 'hinge',
                 metadata_for_loss: Optional[Dict] = None,
                 metadata_for_loss_weights: Optional[Dict[str, float]] = None,
                 load_model_path: Optional[str] = None,
                 map_location: Optional[str] = None,
                 **kwargs):
        optimizer_config_list = None
        num_item_buckets = None

        if load_model_path is None:
            optimizer_config_list = [
                {
                    'lr': item_buckets_stage_lr,
                    'optimizer': item_buckets_stage_optimizer
                    if isinstance(item_buckets_stage_optimizer, str) else
                    item_buckets_stage_optimizer,
                    'parameter_prefix_list': [
                        'user_embed', 'user_bias', 'item_bucket_embed', 'item_bucket_bias',
                    ],
                    'stage': 'item_buckets',
                },
                {
                    'lr': no_buckets_stage_lr,
                    'optimizer': no_buckets_stage_optimizer,
                    'parameter_prefix_list': [
                        'user_embed', 'user_bias', 'item_embed', 'item_bias',
                    ],
                    'stage': 'no_buckets',
                },
            ]

            item_buckets = np.asarray(item_buckets)
            assert item_buckets.ndim == 1, (
                f'``item_buckets`` must be 1-dimensional, not {item_buckets.ndim}-dimensional!'
            )
            # wrap raw interactions early so num_items is known for validation
            num_items = train.num_items
            if len(item_buckets) != num_items:
                raise ValueError(
                    'Length of ``item_buckets`` must be equal to the number of items in the '
                    f'dataset: {len(item_buckets)} != {num_items}.'
                )
            if item_buckets.min() != 0:
                raise ValueError(
                    f'``item_buckets`` IDs must start at 0, not {item_buckets.min()}!'
                )
            num_item_buckets = int(item_buckets.max()) + 1
            item_buckets = item_buckets.astype(np.int32).tolist()  # JSON-safe hparam

        init_args = get_init_arguments()
        init_args['item_buckets'] = item_buckets
        super().__init__(optimizer_config_list=optimizer_config_list,
                         num_item_buckets=num_item_buckets,
                         **init_args)
        self._item_buckets_device = jnp.asarray(self.hparams['item_buckets'],
                                                dtype=jnp.int32)

    __doc__ = merge_docstrings(MultiStagePipeline, __doc__, __init__)

    def _sharded_eval_localizable(self) -> bool:
        # the bucket stage maps item ids through the ``item_buckets``
        # constant; only the final per-item stage is pure table gathers
        return self.current_stage == 'no_buckets'

    def _load_model_init_helper(self, *args, **kwargs) -> None:
        super()._load_model_init_helper(*args, **kwargs)
        self._item_buckets_device = jnp.asarray(self.hparams['item_buckets'],
                                                dtype=jnp.int32)

    def _build_params(self, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        num_users = self.hparams['num_users']
        num_items = self.hparams['num_items']
        num_buckets = self.hparams['num_item_buckets']
        dim = self.hparams['embedding_dim']
        rngs = jax.random.split(rng, 3)
        return {
            'user_embeddings': scaled_embedding_init(rngs[0], num_users, dim),
            'item_embeddings': scaled_embedding_init(rngs[1], num_items, dim),
            'item_bucket_embeddings': scaled_embedding_init(rngs[2], num_buckets, dim),
            'user_biases': zero_embedding_init(num_users),
            'item_biases': zero_embedding_init(num_items),
            'item_bucket_biases': zero_embedding_init(num_buckets),
        }

    def set_stage(self, stage: str) -> None:
        """On the bucket -> item transition, gather bucket weights into the
        per-item tables as initialization (reference ``:217-239``)."""
        current_stage = self.hparams.get('stage')
        if stage not in self.hparams['stage_list']:
            raise ValueError(
                f'"{stage}" is not a valid stage, please choose one of '
                f'{self.hparams["stage_list"]}'
            )
        if current_stage == 'item_buckets' and stage == 'no_buckets':
            print('Copying over item embeddings...')
            buckets = self._item_buckets_device
            self.params = {
                **self.params,
                'item_embeddings': self.params['item_bucket_embeddings'][buckets],
                'item_biases': self.params['item_bucket_biases'][buckets],
            }
        super().set_stage(stage)

    # fused [*, D+1] layout (round 5): all three (embeddings, biases) pairs
    # ride as single tables through the scan engine, so the backward emits
    # one scatter per table instead of two — the zoo bench measured the
    # named-layout ColdStart at 0.67x of MF purely from the extra scatters
    _FUSED_TABLE_SPEC = (
        ('user_embeddings', 'user_biases', 'user_fused'),
        ('item_embeddings', 'item_biases', 'item_fused'),
        ('item_bucket_embeddings', 'item_bucket_biases', 'item_bucket_fused'),
    )

    def supports_fused_tables(self) -> bool:
        return self._fused_tables_ok(ColdStartModel)

    def _item_lookup(self, params, items):
        """Stage-conditional item rows/biases under either table layout:
        ``item_buckets`` maps ids through the bucket assignment first."""
        if self.hparams['stage'] == 'item_buckets':
            mapped = self._item_buckets_device[items]
            return self._emb_bias_lookup(
                params, 'item_bucket_embeddings', 'item_bucket_biases',
                'item_bucket_fused', mapped)
        return self._emb_bias_lookup(
            params, 'item_embeddings', 'item_biases', 'item_fused', items)

    def score(self, params, users, items, training=False, rng=None):
        user_embeddings, user_biases = self._emb_bias_lookup(
            params, 'user_embeddings', 'user_biases', 'user_fused', users)
        item_embeddings, item_biases = self._item_lookup(params, items)

        p = self.hparams.get('dropout_p', 0.0)
        rng_u, rng_i = (jax.random.split(rng) if rng is not None else (None, None))
        user_embeddings = dropout(rng_u, user_embeddings, p, training)
        item_embeddings = dropout(rng_i, item_embeddings, p, training)

        return (user_embeddings * item_embeddings).sum(axis=1) + user_biases + item_biases

    def pairwise_scores(self, params, users, items, training=False, rng=None):
        """Single-gather batched scoring (see ``BasePipeline.pairwise_scores``)
        with the stage-conditional item source: ``item_buckets`` maps item IDs
        through the bucket assignment before the (bucket-)table gather.
        2-D ids go straight through the mapping and gather — no flatten
        (structure preservation matters on a mesh; see
        ``BasePipeline._emb_bias_lookup``)."""
        R, B = items.shape
        user_embeddings, user_b = self._emb_bias_lookup(
            params, 'user_embeddings', 'user_biases', 'user_fused', users)
        item_embeddings, item_biases = self._item_lookup(params, items)

        rng_u, rng_i = (jax.random.split(rng) if rng is not None else (None, None))
        dots = tiled_dropout_dots(user_embeddings, item_embeddings, R, B,
                                  self.hparams.get('dropout_p', 0.0),
                                  training, rng_u, rng_i)
        return dots + user_b[None, :] + item_biases

    def item_bucket_item_similarity(self, item_bucket_id: int) -> pd.Series:
        """Cosine similarity of one bucket embedding against every item
        embedding (reference ``:322-359``)."""
        bucket_emb = self.params['item_bucket_embeddings'].astype(jnp.float32)
        bucket_emb = bucket_emb / jnp.linalg.norm(bucket_emb, axis=1, keepdims=True)
        item_emb = self._get_item_embeddings().astype(jnp.float32)
        item_emb = item_emb / jnp.linalg.norm(item_emb, axis=1, keepdims=True)
        sims = bucket_emb[item_bucket_id] @ item_emb.T
        return pd.Series(np.asarray(sims)).sort_values(ascending=False)

    def _get_item_embeddings(self) -> jnp.ndarray:
        return self.params['item_embeddings']

    def _get_user_embeddings(self) -> jnp.ndarray:
        return self.params['user_embeddings']
