"""Matrix factorization — the flagship model.

Rebuild of ``MatrixFactorizationModel``
(``/root/reference/collie/model/matrix_factorization.py:12-167``):
``score = dot(user_emb, item_emb) + user_bias + item_bias`` with dropout on
the embeddings (not the biases) and an optional ``y_range`` sigmoid rescale
(``:120-159``).  Keeps collie's signature twist — a separate, slower SGD
optimizer for the bias terms (defaults ``bias_lr=1e-2``,
``bias_optimizer='sgd'``, ``:80-88``) so the model cannot shortcut to
popularity memorization — and the default ``ReduceLROnPlateau(patience=1)``
schedule (``:81-85``).

TPU notes: ``sparse=True`` is accepted for parity but maps to dense tables
(row-shardable over the mesh's ``model`` axis; SURVEY §7); full-catalog
scoring overrides the pairwise path with one embeddings x table matmul on the
MXU.
"""
from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from collie_tpu.models.base import INTERACTIONS_LIKE_INPUT, BasePipeline
from collie_tpu.ops.embeddings import dropout, embedding_lookup, scaled_embedding_init, tiled_dropout_dots, \
    zero_embedding_init
from collie_tpu.training.schedulers import ReduceLROnPlateau
from collie_tpu.utils import get_init_arguments, merge_docstrings


def _default_scheduler():
    return ReduceLROnPlateau(patience=1)


class MatrixFactorizationModel(BasePipeline):
    """Embedding-dot-product recommender with separate bias optimizer.

    Parameters
    ----------
    embedding_dim: int
        Number of latent factors to use for user and item embeddings
    dropout_p: float
        Probability of dropout on the embeddings
    sparse: bool
        Accepted for API parity; on TPU embeddings are dense (sharded) tables
    bias_lr: float or 'infer'
        Bias terms learning rate. If 'infer', set equal to ``lr``
    bias_optimizer: str or None
        Optimizer for the bias terms ('infer' copies ``optimizer``; None
        merges biases into the single optimizer)
    y_range: tuple
        ``(min, max)`` applies a sigmoid rescale of the output score
    """

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 embedding_dim: int = 30,
                 dropout_p: float = 0.0,
                 sparse: bool = False,
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
        rng_user, rng_item = jax.random.split(rng)
        return {
            'user_embeddings': scaled_embedding_init(rng_user, num_users, dim),
            'item_embeddings': scaled_embedding_init(rng_item, num_items, dim),
            'user_biases': zero_embedding_init(num_users),
            'item_biases': zero_embedding_init(num_items),
        }

    # ---- fused [*, D+1] table layout (scan-engine hot path) -----------
    # Generic mechanism in ``BasePipeline`` (see the fused-layout section
    # there); ``tests/test_fused_tables.py`` pins exact-trajectory
    # equivalence fused vs named.

    _FUSED_TABLE_SPEC = (
        ('user_embeddings', 'user_biases', 'user_fused'),
        ('item_embeddings', 'item_biases', 'item_fused'),
    )

    def supports_fused_tables(self) -> bool:
        return self._fused_tables_ok(MatrixFactorizationModel)

    def score(self, params, users, items, training=False, rng=None):
        user_embeddings, user_b = self._emb_bias_lookup(
            params, 'user_embeddings', 'user_biases', 'user_fused', users)
        item_embeddings, item_b = self._emb_bias_lookup(
            params, 'item_embeddings', 'item_biases', 'item_fused', items)

        p = self.hparams.get('dropout_p', 0.0)
        rng_u, rng_i = (jax.random.split(rng) if rng is not None else (None, None))
        user_embeddings = dropout(rng_u, user_embeddings, p, training)
        item_embeddings = dropout(rng_i, item_embeddings, p, training)

        preds = ((user_embeddings * item_embeddings).sum(axis=1)
                 + user_b + item_b)
        return self._apply_y_range(preds)

    def pairwise_scores(self, params, users, items, training=False, rng=None):
        """Single-gather batched scoring: user rows ``[B, d]`` fetched once,
        item rows ``[R, B, d]`` once (2-D ids, structure-preserving), biases
        likewise — versus the base hook's ``R``-fold tiled user gather.
        Reproduces ``score()``'s math per candidate, including dropout:
        masks are drawn at the ``[R, B, d]`` shape from the same rng split
        (row-major fill == the tiled ``[R*B, d]`` draw), so they equal the
        tiled path's masks element-for-element."""
        R, B = items.shape
        user_embeddings, user_b = self._emb_bias_lookup(
            params, 'user_embeddings', 'user_biases', 'user_fused', users)
        # 2-D ids straight into the gather: [R, B, d] rows, no flatten (see
        # _emb_bias_lookup on why structure preservation matters on a mesh)
        item_embeddings, item_b = self._emb_bias_lookup(
            params, 'item_embeddings', 'item_biases', 'item_fused', items)

        rng_u, rng_i = (jax.random.split(rng) if rng is not None else (None, None))
        dots = tiled_dropout_dots(user_embeddings, item_embeddings, R, B,
                                  self.hparams.get('dropout_p', 0.0),
                                  training, rng_u, rng_i)
        preds = dots + user_b[None, :] + item_b
        return self._apply_y_range(preds)

    def pairwise_scores_select(self, params, users, items, training=False,
                               rng=None):
        """bf16 hardest-negative selection (see the base hook): candidate
        item rows gather HALF-width and the dots run on the MXU in bf16
        with f32 accumulation — the ``[K, B, d]`` block is the training
        step's largest HBM term (floor ablation: 11.1 → 6.1 ms/step at the
        ML-10M headline config).  User rows (``[B, d]``, cheap) and biases
        stay f32.  Only the argmax/violation SELECTION sees the rounding;
        the selected pair is re-scored in f32 for the gradient.  Engine
        precondition (`_score_is_deterministic`) means dropout is inactive
        here, so ``training``/``rng`` are irrelevant."""
        if not (self._bf16_select_enabled()
                and type(self) is MatrixFactorizationModel
                and (self.hparams.get('embeddings_dtype') or 'float32')
                == 'float32'):
            # exact-type gate: hybrid/cold-start subclasses score through
            # stage-conditional tables this fast path does not know about
            return super().pairwise_scores_select(
                params, users, items, training=training, rng=rng)
        if 'user_fused' in params:
            uf = embedding_lookup(params['user_fused'], users)       # [B, D+1]
            nf = jnp.take(params['item_fused'].astype(jnp.bfloat16),
                          items, axis=0)                             # [R, B, D+1]
            dots = jnp.einsum('bd,rbd->rb',
                              uf[:, :-1].astype(jnp.bfloat16), nf[..., :-1],
                              preferred_element_type=jnp.float32)
            preds = (dots + uf[:, -1][None, :]
                     + nf[..., -1].astype(jnp.float32))
        else:
            ue = embedding_lookup(params['user_embeddings'], users)
            ne = jnp.take(params['item_embeddings'].astype(jnp.bfloat16),
                          items, axis=0)                             # [R, B, D]
            dots = jnp.einsum('bd,rbd->rb', ue.astype(jnp.bfloat16), ne,
                              preferred_element_type=jnp.float32)
            # item bias rounds through bf16 exactly like the fused table's
            # bias column, so fused and named layouts SELECT identically
            # (pinned by the fused-vs-named trajectory tests)
            nb = params['item_biases'][items].astype(jnp.bfloat16)
            preds = (dots + params['user_biases'][users][None, :]
                     + nb.astype(jnp.float32))
        return jax.lax.stop_gradient(self._apply_y_range(preds))

    def _apply_y_range(self, preds):
        y_range = self.hparams.get('y_range')
        if y_range is not None:
            preds = jax.nn.sigmoid(preds) * (y_range[1] - y_range[0]) + y_range[0]
        return preds

    def score_all_items(self, params, user_ids):
        """Full-catalog scoring as one MXU matmul:
        ``[B, d] x [d, num_items] + biases`` — the TPU-native form of the
        reference's B x num_items cross-product forward (``metrics.py:77-107``)."""
        user_emb = embedding_lookup(params['user_embeddings'], user_ids)
        preds = (
            jnp.matmul(user_emb, params['item_embeddings'].T,
                       precision=jax.lax.Precision.HIGHEST)
            + params['user_biases'][user_ids][:, None]
            + params['item_biases'][None, :]
        )
        return self._apply_y_range(preds)

    def score_item_block(self, params, user_ids, item_ids):
        """One MXU matmul per (user batch x item tile) for blockwise retrieval."""
        user_emb = embedding_lookup(params['user_embeddings'], user_ids)
        item_emb = embedding_lookup(params['item_embeddings'], item_ids)
        preds = (
            jnp.matmul(user_emb, item_emb.T, precision=jax.lax.Precision.HIGHEST)
            + params['user_biases'][user_ids][:, None]
            + params['item_biases'][item_ids][None, :]
        )
        return self._apply_y_range(preds)

    def _get_item_embeddings(self) -> jnp.ndarray:
        return self.params['item_embeddings']

    def _get_user_embeddings(self) -> jnp.ndarray:
        return self.params['user_embeddings']
