"""DeepFM.

Rebuild of ``DeepFM`` (``/root/reference/collie/model/deep_fm.py:13-222``), per
arXiv:1703.04247 as the reference implements it: FM term
``sum((u + i) - (u^2 + i^2))`` (``:191-195``) plus an MLP over the
concatenated embeddings, summed, with optional final activation.  The
reference also allocates per-user/item bias tables and two global bias
scalars that its forward never uses (``:138-139``) — reproduced here for
state-dict parity (and, as in the reference, they receive the separate bias
optimizer but no gradient signal).
"""
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from collie_tpu.models.base import INTERACTIONS_LIKE_INPUT, BasePipeline
from collie_tpu.ops.embeddings import dropout, embedding_lookup, scaled_embedding_init, \
    zero_embedding_init
from collie_tpu.ops.nn import add_linear, apply_final_layer, linear, shrinking_mlp_dims
from collie_tpu.training.schedulers import ReduceLROnPlateau
from collie_tpu.utils import get_init_arguments, merge_docstrings


def _default_scheduler():
    return ReduceLROnPlateau(patience=1)


class DeepFM(BasePipeline):
    """Factorization machine + deep MLP over shared embeddings.

    Parameters
    ----------
    embedding_dim: int
    num_layers: int
        Number of shrinking MLP layers
    final_layer: str or callable
        Optional output activation
    dropout_p: float
    bias_lr: float or 'infer'
    bias_optimizer: str or None
    """

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 embedding_dim: int = 8,
                 num_layers: int = 3,
                 final_layer: Optional[Union[str, Callable]] = None,
                 dropout_p: float = 0.0,
                 lr: float = 1e-3,
                 bias_lr: Optional[Union[float, str]] = 1e-2,
                 lr_scheduler_func: Optional[Callable] = _default_scheduler,
                 weight_decay: float = 0.0,
                 optimizer: Union[str, Callable] = 'adam',
                 bias_optimizer: Optional[Union[str, Callable]] = 'sgd',
                 loss: Union[str, Callable] = 'hinge',
                 metadata_for_loss: Optional[Dict] = None,
                 metadata_for_loss_weights: Optional[Dict[str, float]] = None,
                 load_model_path: Optional[str] = None,
                 map_location: Optional[str] = None,
                 **kwargs):
        init_args = get_init_arguments()
        self.final_layer = final_layer
        if callable(final_layer):
            init_args['final_layer'] = None
        super().__init__(**init_args)
        if callable(final_layer):
            self.hparams['final_layer'] = None

    __doc__ = merge_docstrings(BasePipeline, __doc__, __init__)

    def _resolved_final_layer(self):
        return self.final_layer if callable(getattr(self, 'final_layer', None)) \
            else self.hparams.get('final_layer')

    def _build_params(self, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        num_users = self.hparams['num_users']
        num_items = self.hparams['num_items']
        dim = self.hparams['embedding_dim']
        num_layers = self.hparams['num_layers']

        rngs = jax.random.split(rng, 3 + num_layers)
        params = {
            'user_embeddings': scaled_embedding_init(rngs[0], num_users, dim),
            'item_embeddings': scaled_embedding_init(rngs[1], num_items, dim),
            # unused-by-forward bias params, kept for parity (reference ``:138-139``)
            'user_biases': zero_embedding_init(num_users),
            'item_biases': zero_embedding_init(num_items),
            'user_global_bias': jnp.zeros((1,)),
            'item_global_bias': jnp.zeros((1,)),
        }
        input_size = dim * 2
        for i, next_size in enumerate(shrinking_mlp_dims(dim, num_layers)):
            add_linear(params, f'mlp_{i}', rngs[2 + i], input_size, next_size,
                       init='trunc_normal')
            input_size = next_size
        add_linear(params, 'predict', rngs[-1], input_size, 1,
                   init='kaiming_uniform_relu')
        return params

    def score(self, params, users, items, training=False, rng=None):
        user_embeddings = embedding_lookup(params['user_embeddings'], users)
        item_embeddings = embedding_lookup(params['item_embeddings'], items)

        # FM term (reference ``:191-195``)
        embedding_sum = user_embeddings + item_embeddings
        embedding_squared_sum = jnp.square(user_embeddings) + jnp.square(item_embeddings)
        fm_output = (embedding_sum - embedding_squared_sum).sum(axis=1)

        x = jnp.concatenate([user_embeddings, item_embeddings], axis=-1)
        p = self.hparams.get('dropout_p', 0.0)
        for i in range(self.hparams['num_layers']):
            x = jax.nn.relu(linear(params, f'mlp_{i}', x))
            layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
            x = dropout(layer_rng, x, p, training)
        mlp_output = linear(params, 'predict', x)[..., 0]

        prediction = fm_output + mlp_output
        return apply_final_layer(prediction, self._resolved_final_layer())

    def pairwise_scores(self, params, users, items, training=False, rng=None):
        """Tile-AFTER-gather fast path: user rows gathered once ``[B, d]``
        and broadcast on-chip instead of gathering ``R`` copies; item rows
        gather with 2-D ids (structure-preserving — see
        ``_emb_bias_lookup``).  FM term, MLP, rng stream, and final layer
        identical to ``score`` per candidate pair at ``[R, B, .]``, so
        outputs equal the base hook element-for-element incl. dropout; the
        backward's user-table scatter shrinks from R*B to B rows."""
        R, B = items.shape
        dim = self.hparams['embedding_dim']
        user_embeddings = jnp.broadcast_to(
            embedding_lookup(params['user_embeddings'], users)[None],
            (R, B, dim))
        item_embeddings = embedding_lookup(params['item_embeddings'], items)

        embedding_sum = user_embeddings + item_embeddings
        embedding_squared_sum = jnp.square(user_embeddings) + jnp.square(item_embeddings)
        fm_output = (embedding_sum - embedding_squared_sum).sum(axis=-1)

        x = jnp.concatenate([user_embeddings, item_embeddings], axis=-1)
        p = self.hparams.get('dropout_p', 0.0)
        for i in range(self.hparams['num_layers']):
            x = jax.nn.relu(linear(params, f'mlp_{i}', x))
            layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
            x = dropout(layer_rng, x, p, training)
        mlp_output = linear(params, 'predict', x)[..., 0]

        prediction = fm_output + mlp_output
        return apply_final_layer(prediction, self._resolved_final_layer())

    def _get_item_embeddings(self) -> jnp.ndarray:
        return self.params['item_embeddings']

    def _get_user_embeddings(self) -> jnp.ndarray:
        return self.params['user_embeddings']
