"""Nonlinear matrix factorization with user/item dense towers.

Rebuild of ``NonlinearMatrixFactorizationModel``
(``/root/reference/collie/model/nonlinear_matrix_factorization.py:13-244``):
separate leaky-ReLU dense towers transform the user and item embeddings, then
``dot(tower(user), tower(item)) + biases`` with separate embedding vs dense
dropout.  Similarity embeddings are the *post-tower* outputs, cached after
first use (``:214-244``).
"""
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from collie_tpu.models.base import INTERACTIONS_LIKE_INPUT, BasePipeline
from collie_tpu.ops.embeddings import dropout, embedding_lookup, scaled_embedding_init, \
    zero_embedding_init
from collie_tpu.ops.nn import add_linear, linear
from collie_tpu.training.schedulers import ReduceLROnPlateau
from collie_tpu.utils import get_init_arguments, merge_docstrings


def _default_scheduler():
    return ReduceLROnPlateau(patience=1)


class NonlinearMatrixFactorizationModel(BasePipeline):
    """MF with dense towers over each embedding before the dot product.

    Parameters
    ----------
    user_embedding_dim: int
    item_embedding_dim: int
    user_dense_layers_dims: list
        Tower widths applied to the user embedding
    item_dense_layers_dims: list
        Tower widths applied to the item embedding
    embedding_dropout_p: float
        Dropout on the tower outputs before the dot product
    dense_dropout_p: float
        Dropout between tower layers
    bias_lr: float or 'infer'
    bias_optimizer: str or None
    y_range: tuple
    """

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 user_embedding_dim: int = 60,
                 item_embedding_dim: int = 60,
                 user_dense_layers_dims: List[int] = (48, 32),
                 item_dense_layers_dims: List[int] = (48, 32),
                 embedding_dropout_p: float = 0.0,
                 dense_dropout_p: float = 0.0,
                 lr: float = 1e-3,
                 bias_lr: Optional[Union[float, str]] = 1e-2,
                 lr_scheduler_func: Optional[Callable] = _default_scheduler,
                 weight_decay: float = 0.0,
                 optimizer: Union[str, Callable] = 'adam',
                 bias_optimizer: Optional[Union[str, Callable]] = 'sgd',
                 loss: Union[str, Callable] = 'hinge',
                 metadata_for_loss: Optional[Dict] = None,
                 metadata_for_loss_weights: Optional[Dict[str, float]] = None,
                 y_range: Optional[Tuple[float, float]] = None,
                 load_model_path: Optional[str] = None,
                 map_location: Optional[str] = None,
                 **kwargs):
        kwargs = dict(kwargs)
        init_args = get_init_arguments()
        init_args['user_dense_layers_dims'] = list(user_dense_layers_dims)
        init_args['item_dense_layers_dims'] = list(item_dense_layers_dims)
        super().__init__(**init_args)

    __doc__ = merge_docstrings(BasePipeline, __doc__, __init__)

    def _build_params(self, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        num_users = self.hparams['num_users']
        num_items = self.hparams['num_items']
        user_dims = [self.hparams['user_embedding_dim']] + \
            list(self.hparams['user_dense_layers_dims'])
        item_dims = [self.hparams['item_embedding_dim']] + \
            list(self.hparams['item_dense_layers_dims'])

        n_layers = (len(user_dims) - 1) + (len(item_dims) - 1)
        rngs = jax.random.split(rng, 2 + n_layers)
        params = {
            'user_embeddings': scaled_embedding_init(
                rngs[0], num_users, self.hparams['user_embedding_dim']),
            'item_embeddings': scaled_embedding_init(
                rngs[1], num_items, self.hparams['item_embedding_dim']),
            'user_biases': zero_embedding_init(num_users),
            'item_biases': zero_embedding_init(num_items),
        }
        r = 2
        for i in range(len(user_dims) - 1):
            add_linear(params, f'user_dense_{i}', rngs[r], user_dims[i], user_dims[i + 1],
                       init='xavier_normal')
            r += 1
        for i in range(len(item_dims) - 1):
            add_linear(params, f'item_dense_{i}', rngs[r], item_dims[i], item_dims[i + 1],
                       init='xavier_normal')
            r += 1
        return params

    def _tower(self, params, prefix: str, x, n_layers: int, training, rng):
        dense_p = self.hparams.get('dense_dropout_p', 0.0)
        for i in range(n_layers):
            x = jax.nn.leaky_relu(linear(params, f'{prefix}_{i}', x))
            if i < n_layers - 1:
                layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
                x = dropout(layer_rng, x, dense_p, training)
        return x

    # fused [*, D+1] table layout (generic mechanism in ``BasePipeline``):
    # biases are forward-used, so the named layout costs two extra backward
    # scatters per step.  Tower weights pass through unfused.
    _FUSED_TABLE_SPEC = (
        ('user_embeddings', 'user_biases', 'user_fused'),
        ('item_embeddings', 'item_biases', 'item_fused'),
    )

    def supports_fused_tables(self) -> bool:
        return self._fused_tables_ok(NonlinearMatrixFactorizationModel)

    def score(self, params, users, items, training=False, rng=None):
        rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
        user_x, user_b = self._emb_bias_lookup(
            params, 'user_embeddings', 'user_biases', 'user_fused', users)
        item_x, item_b = self._emb_bias_lookup(
            params, 'item_embeddings', 'item_biases', 'item_fused', items)
        user_x = self._tower(params, 'user_dense', user_x,
                             len(self.hparams['user_dense_layers_dims']), training, rngs[0])
        item_x = self._tower(params, 'item_dense', item_x,
                             len(self.hparams['item_dense_layers_dims']), training, rngs[1])

        emb_p = self.hparams.get('embedding_dropout_p', 0.0)
        user_x = dropout(rngs[2], user_x, emb_p, training)
        item_x = dropout(rngs[3], item_x, emb_p, training)

        preds = (user_x * item_x).sum(axis=1) + user_b + item_b

        y_range = self.hparams.get('y_range')
        if y_range is not None:
            preds = jax.nn.sigmoid(preds) * (y_range[1] - y_range[0]) + y_range[0]
        return preds

    def pairwise_scores(self, params, users, items, training=False, rng=None):
        """Deterministic fast path: the user tower's input is the same user
        row for every one of the ``R`` candidates, so it runs ONCE on
        ``[B, d]`` instead of ``R`` times on the tiled ``[R*B, d]`` (and the
        user table is gathered once). Falls back to the tiled base hook when
        dropout is active — the tiled path draws independent masks per
        candidate copy, which a shared user tower cannot reproduce."""
        if training and (self.hparams.get('dense_dropout_p')
                         or self.hparams.get('embedding_dropout_p')):
            return super().pairwise_scores(params, users, items,
                                           training=training, rng=rng)
        R, B = items.shape
        user_rows, user_b = self._emb_bias_lookup(
            params, 'user_embeddings', 'user_biases', 'user_fused', users)
        # 2-D ids straight into the gather; the item tower maps over the
        # leading [R, B] dims unchanged (linear() contracts the last dim)
        item_rows, item_b = self._emb_bias_lookup(
            params, 'item_embeddings', 'item_biases', 'item_fused', items)
        user_x = self._tower(
            params, 'user_dense', user_rows,
            len(self.hparams['user_dense_layers_dims']), False, None)
        item_x = self._tower(
            params, 'item_dense', item_rows,
            len(self.hparams['item_dense_layers_dims']), False, None)
        preds = (jnp.einsum('bd,rbd->rb', user_x, item_x)
                 + user_b[None, :] + item_b)
        y_range = self.hparams.get('y_range')
        if y_range is not None:
            preds = jax.nn.sigmoid(preds) * (y_range[1] - y_range[0]) + y_range[0]
        return preds

    def _get_item_embeddings(self) -> jnp.ndarray:
        """Post-tower item embeddings, cached (reference ``:214-228``)."""
        if getattr(self, '_item_embeddings_cache', None) is None:
            items = jnp.arange(self.hparams['num_items'])
            x = embedding_lookup(self.params['item_embeddings'], items)
            self._item_embeddings_cache = self._tower(
                self.params, 'item_dense', x,
                len(self.hparams['item_dense_layers_dims']), False, None)
        return self._item_embeddings_cache

    def _get_user_embeddings(self) -> jnp.ndarray:
        """Post-tower user embeddings, cached (reference ``:230-244``)."""
        if getattr(self, '_user_embeddings_cache', None) is None:
            users = jnp.arange(self.hparams['num_users'])
            x = embedding_lookup(self.params['user_embeddings'], users)
            self._user_embeddings_cache = self._tower(
                self.params, 'user_dense', x,
                len(self.hparams['user_dense_layers_dims']), False, None)
        return self._user_embeddings_cache
