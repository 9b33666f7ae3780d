"""MLP matrix factorization.

Rebuild of ``MLPMatrixFactorizationModel``
(``/root/reference/collie/model/mlp_matrix_factorization.py:12-184``):
``score = sigmoid(predict(MLP(concat(user_emb, item_emb)))) + user_bias +
item_bias`` with ReLU + dropout between shrinking layers
(widths per ``:114-128``) and optional ``y_range`` rescale.
"""
from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from collie_tpu.models.base import INTERACTIONS_LIKE_INPUT, BasePipeline
from collie_tpu.ops.embeddings import dropout, embedding_lookup, scaled_embedding_init, \
    zero_embedding_init
from collie_tpu.ops.nn import add_linear, linear, shrinking_mlp_dims
from collie_tpu.training.schedulers import ReduceLROnPlateau
from collie_tpu.utils import get_init_arguments, merge_docstrings


def _default_scheduler():
    return ReduceLROnPlateau(patience=1)


class MLPMatrixFactorizationModel(BasePipeline):
    """MF with the dot product replaced by an MLP over concatenated embeddings.

    Parameters
    ----------
    embedding_dim: int
        Number of latent factors for user and item embeddings
    num_layers: int
        Number of shrinking MLP layers
    dropout_p: float
        Probability of dropout on the MLP layers
    bias_lr: float or 'infer'
        Bias terms learning rate
    bias_optimizer: str or None
        Optimizer for all params named ``*bias*`` (incl. MLP layer biases,
        matching the reference's name-based split)
    y_range: tuple
        ``(min, max)`` sigmoid rescale of the output
    """

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 embedding_dim: int = 30,
                 num_layers: int = 3,
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
                 y_range: Optional[Tuple[float, float]] = None,
                 load_model_path: Optional[str] = None,
                 map_location: Optional[str] = None,
                 **kwargs):
        super().__init__(**get_init_arguments())

    __doc__ = merge_docstrings(BasePipeline, __doc__, __init__)

    def _build_params(self, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        num_users = self.hparams['num_users']
        num_items = self.hparams['num_items']
        dim = self.hparams['embedding_dim']
        num_layers = self.hparams['num_layers']

        rngs = jax.random.split(rng, 3 + num_layers)
        params = {
            'user_embeddings': scaled_embedding_init(rngs[0], num_users, dim),
            'item_embeddings': scaled_embedding_init(rngs[1], num_items, dim),
            'user_biases': zero_embedding_init(num_users),
            'item_biases': zero_embedding_init(num_items),
        }
        input_size = dim * 2
        self._mlp_dims = shrinking_mlp_dims(dim, num_layers)
        for i, next_size in enumerate(self._mlp_dims):
            add_linear(params, f'mlp_{i}', rngs[2 + i], input_size, next_size,
                       init='torch_default')
            input_size = next_size
        add_linear(params, 'predict', rngs[-1], input_size, 1, init='torch_default')
        return params

    # fused [*, D+1] table layout (generic mechanism in ``BasePipeline``):
    # the bias tables are forward-used here, so the named layout costs two
    # extra backward scatters per step.  MLP weights pass through unfused.
    _FUSED_TABLE_SPEC = (
        ('user_embeddings', 'user_biases', 'user_fused'),
        ('item_embeddings', 'item_biases', 'item_fused'),
    )

    def supports_fused_tables(self) -> bool:
        return self._fused_tables_ok(MLPMatrixFactorizationModel)

    def score(self, params, users, items, training=False, rng=None):
        user_embeddings, user_b = self._emb_bias_lookup(
            params, 'user_embeddings', 'user_biases', 'user_fused', users)
        item_embeddings, item_b = self._emb_bias_lookup(
            params, 'item_embeddings', 'item_biases', 'item_fused', items)
        x = jnp.concatenate([user_embeddings, item_embeddings], axis=-1)

        p = self.hparams.get('dropout_p', 0.0)
        num_layers = self.hparams['num_layers']
        for i in range(num_layers):
            x = jax.nn.relu(linear(params, f'mlp_{i}', x))
            layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
            x = dropout(layer_rng, x, p, training)

        mlp_output = jax.nn.sigmoid(linear(params, 'predict', x))[..., 0]
        preds = mlp_output + user_b + item_b

        y_range = self.hparams.get('y_range')
        if y_range is not None:
            preds = jax.nn.sigmoid(preds) * (y_range[1] - y_range[0]) + y_range[0]
        return preds

    def pairwise_scores(self, params, users, items, training=False, rng=None):
        """Tile-AFTER-gather fast path: the base hook gathers ``R`` copies of
        every user row (``score`` on tiled ids); here user rows/biases are
        gathered ONCE ``[B, d]`` and broadcast on-chip to ``[R, B, d]``.
        Item rows gather with 2-D ids (structure-preserving — see
        ``_emb_bias_lookup`` on mesh sharding).  The MLP still runs per
        candidate pair (irreducible) at ``[R, B, .]``, with the identical
        per-layer rng stream; masks fill row-major so outputs equal the
        tiled path element-for-element incl. dropout.  The backward's
        user-table scatter shrinks from R*B to B rows."""
        R, B = items.shape
        user_embeddings, user_b = self._emb_bias_lookup(
            params, 'user_embeddings', 'user_biases', 'user_fused', users)
        item_embeddings, item_b = self._emb_bias_lookup(
            params, 'item_embeddings', 'item_biases', 'item_fused', items)
        dim = user_embeddings.shape[-1]
        x = jnp.concatenate([
            jnp.broadcast_to(user_embeddings[None], (R, B, dim)),
            item_embeddings], axis=-1)

        p = self.hparams.get('dropout_p', 0.0)
        for i in range(self.hparams['num_layers']):
            x = jax.nn.relu(linear(params, f'mlp_{i}', x))
            layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
            x = dropout(layer_rng, x, p, training)

        mlp_output = jax.nn.sigmoid(linear(params, 'predict', x))[..., 0]
        preds = mlp_output + user_b[None, :] + item_b

        y_range = self.hparams.get('y_range')
        if y_range is not None:
            preds = jax.nn.sigmoid(preds) * (y_range[1] - y_range[0]) + y_range[0]
        return preds

    def _get_item_embeddings(self) -> jnp.ndarray:
        return self.params['item_embeddings']

    def _get_user_embeddings(self) -> jnp.ndarray:
        return self.params['user_embeddings']
