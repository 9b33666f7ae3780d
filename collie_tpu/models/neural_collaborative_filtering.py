"""Neural collaborative filtering (NCF / NeuMF).

Rebuild of ``NeuralCollaborativeFiltering``
(``/root/reference/collie/model/neural_collaborative_filtering.py:13-214``),
per arXiv:1708.05031: a GMF branch (elementwise product of dim-``e``
embeddings) in parallel with an MLP branch (its own ``e * 2^(L-1)``-dim
embedding tables feeding a halving MLP), concatenated into a 1-unit predict
layer with optional final activation.  Inits mirror the reference:
trunc-normal(0.01) MLP weights, kaiming-uniform(relu) predict layer, zero
layer biases (``:143-153``).  Similarity embeddings are the concatenated
CF + MLP tables (``:198-214``).  Single optimizer (no bias split).
"""
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from collie_tpu.models.base import INTERACTIONS_LIKE_INPUT, BasePipeline
from collie_tpu.ops.embeddings import dropout, embedding_lookup, scaled_embedding_init
from collie_tpu.ops.nn import add_linear, apply_final_layer, linear
from collie_tpu.training.schedulers import ReduceLROnPlateau
from collie_tpu.utils import get_init_arguments, merge_docstrings


def _default_scheduler():
    return ReduceLROnPlateau(patience=1)


class NeuralCollaborativeFiltering(BasePipeline):
    """NeuMF: GMF branch || halving-MLP branch -> predict layer.

    Parameters
    ----------
    embedding_dim: int
        GMF embedding dim; the MLP branch uses ``embedding_dim * 2^(num_layers-1)``
    num_layers: int
        Number of halving MLP layers
    final_layer: str or callable
        Optional output activation: 'sigmoid' / 'relu' / 'leaky_relu' / callable
    dropout_p: float
        Dropout before each MLP layer
    """

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 embedding_dim: int = 8,
                 num_layers: int = 3,
                 final_layer: Optional[Union[str, Callable]] = None,
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
        init_args = get_init_arguments()
        self.final_layer = final_layer
        if callable(final_layer):
            init_args['final_layer'] = None  # callables are attributes, not hparams
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
        mlp_dim = dim * (2 ** (num_layers - 1))

        rngs = jax.random.split(rng, 5 + num_layers)
        params = {
            'user_embeddings_cf': scaled_embedding_init(rngs[0], num_users, dim),
            'item_embeddings_cf': scaled_embedding_init(rngs[1], num_items, dim),
            'user_embeddings_mlp': scaled_embedding_init(rngs[2], num_users, mlp_dim),
            'item_embeddings_mlp': scaled_embedding_init(rngs[3], num_items, mlp_dim),
        }
        for i in range(num_layers):
            input_size = dim * (2 ** (num_layers - i))
            add_linear(params, f'mlp_{i}', rngs[4 + i], input_size, input_size // 2,
                       init='trunc_normal')
        add_linear(params, 'predict', rngs[-1], dim * 2, 1, init='kaiming_uniform_relu')
        return params

    # ---- fused [*, D + mlp_dim] table layout (round 5) ----------------
    # NeuMF's backward emits FOUR scatters (cf + mlp per side) on the named
    # layout — the zoo bench measured it at 0.75-0.87x of MF, the widest
    # gap in the non-hybrid zoo.  Each side's cf and mlp tables share ids,
    # so they fuse into one [*, D + mlp_dim] table: one gather, one
    # backward scatter per side.  Unlike the (embeddings, biases) spec the
    # two halves have different widths, so the model overrides the generic
    # fuse/unfuse hooks directly.

    def supports_fused_tables(self) -> bool:
        return (type(self) is NeuralCollaborativeFiltering
                and (self.hparams.get('embeddings_dtype') or 'float32')
                == 'float32')

    def fuse_params(self, params):
        fused = dict(params)
        for kind in ('user', 'item'):
            fused[f'{kind}_fused'] = jnp.concatenate(
                [fused.pop(f'{kind}_embeddings_cf'),
                 fused.pop(f'{kind}_embeddings_mlp')], axis=1)
        return fused

    def unfuse_params(self, fused):
        dim = self.hparams['embedding_dim']
        params = dict(fused)
        for kind in ('user', 'item'):
            tab = params.pop(f'{kind}_fused')
            params[f'{kind}_embeddings_cf'] = tab[:, :dim]
            params[f'{kind}_embeddings_mlp'] = tab[:, dim:]
        return params

    def _cf_mlp_lookup(self, params, kind, ids):
        """(cf rows, mlp rows) for ``ids`` under either table layout —
        fused gathers each side's row ONCE and slices after the gather."""
        fused_key = f'{kind}_fused'
        if fused_key in params:
            dim = self.hparams['embedding_dim']
            rows = embedding_lookup(params[fused_key], ids)
            return rows[..., :dim], rows[..., dim:]
        return (embedding_lookup(params[f'{kind}_embeddings_cf'], ids),
                embedding_lookup(params[f'{kind}_embeddings_mlp'], ids))

    def score(self, params, users, items, training=False, rng=None):
        user_cf, user_mlp = self._cf_mlp_lookup(params, 'user', users)
        item_cf, item_mlp = self._cf_mlp_lookup(params, 'item', items)
        output_cf = user_cf * item_cf

        x = jnp.concatenate([user_mlp, item_mlp], axis=-1)
        p = self.hparams.get('dropout_p', 0.0)
        for i in range(self.hparams['num_layers']):
            layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
            x = dropout(layer_rng, x, p, training)
            x = jax.nn.relu(linear(params, f'mlp_{i}', x))

        concat = jnp.concatenate([output_cf, x], axis=-1)
        prediction = linear(params, 'predict', concat)[..., 0]
        return apply_final_layer(prediction, self._resolved_final_layer())

    def pairwise_scores(self, params, users, items, training=False, rng=None):
        """Tile-AFTER-gather fast path: both user tables (cf + mlp) gathered
        once ``[B, d]`` and broadcast on-chip instead of gathering ``R``
        copies of every row; item rows gather with 2-D ids
        (structure-preserving — see ``_emb_bias_lookup``).  Same MLP / rng
        stream / final layer as ``score`` per candidate pair at
        ``[R, B, .]``, so outputs equal the base hook element-for-element
        incl. dropout; the backward's user-table scatters shrink from R*B
        to B rows each."""
        R, B = items.shape
        user_cf, user_mlp = self._cf_mlp_lookup(params, 'user', users)
        item_cf, item_mlp = self._cf_mlp_lookup(params, 'item', items)
        output_cf = user_cf[None] * item_cf

        mlp_dim = user_mlp.shape[-1]
        x = jnp.concatenate([
            jnp.broadcast_to(user_mlp[None], (R, B, mlp_dim)),
            item_mlp,
        ], axis=-1)
        p = self.hparams.get('dropout_p', 0.0)
        for i in range(self.hparams['num_layers']):
            layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
            x = dropout(layer_rng, x, p, training)
            x = jax.nn.relu(linear(params, f'mlp_{i}', x))

        concat = jnp.concatenate([output_cf, x], axis=-1)
        prediction = linear(params, 'predict', concat)[..., 0]
        return apply_final_layer(prediction, self._resolved_final_layer())

    def _get_item_embeddings(self) -> jnp.ndarray:
        return jnp.concatenate([self.params['item_embeddings_cf'],
                                self.params['item_embeddings_mlp']], axis=1)

    def _get_user_embeddings(self) -> jnp.ndarray:
        return jnp.concatenate([self.params['user_embeddings_cf'],
                                self.params['user_embeddings_mlp']], axis=1)
