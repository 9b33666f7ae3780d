"""Collaborative metric learning.

Rebuild of ``CollaborativeMetricLearningModel``
(``/root/reference/collie/model/collaborative_metric_learning.py:12-132``), per
arXiv:1803.00202: ``score = pairwise_distance(user_emb, item_emb)`` (the
euclidean distance, with torch's ``eps=1e-6`` additive stabilizer) — no bias
terms, single optimizer.  As in the reference, the accepted ``y_range``
hyperparameter is not applied by the forward pass (``:100-124``).
"""
from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from collie_tpu.models.base import INTERACTIONS_LIKE_INPUT, BasePipeline
from collie_tpu.ops.embeddings import embedding_lookup, scaled_embedding_init
from collie_tpu.training.schedulers import ReduceLROnPlateau
from collie_tpu.utils import get_init_arguments, merge_docstrings


def _default_scheduler():
    return ReduceLROnPlateau(patience=1)


class CollaborativeMetricLearningModel(BasePipeline):
    """Metric-space recommender: score is the user-item embedding distance.

    Parameters
    ----------
    embedding_dim: int
    sparse: bool
        Accepted for API parity; dense (sharded) tables on TPU
    y_range: tuple
        Accepted for parity; not applied by the forward pass (as in the
        reference)
    """

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 embedding_dim: int = 30,
                 sparse: bool = False,
                 lr: float = 1e-3,
                 lr_scheduler_func: Optional[Callable] = _default_scheduler,
                 weight_decay: float = 0.0,
                 optimizer: Union[str, Callable] = 'adam',
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
        rng_user, rng_item = jax.random.split(rng)
        dim = self.hparams['embedding_dim']
        return {
            'user_embeddings': scaled_embedding_init(
                rng_user, self.hparams['num_users'], dim),
            'item_embeddings': scaled_embedding_init(
                rng_item, self.hparams['num_items'], dim),
        }

    def score(self, params, users, items, training=False, rng=None):
        user_embeddings = embedding_lookup(params['user_embeddings'], users)
        item_embeddings = embedding_lookup(params['item_embeddings'], items)
        # torch.nn.functional.pairwise_distance semantics: ||u - i + eps||_2
        diff = user_embeddings - item_embeddings + 1e-6
        return jnp.sqrt(jnp.square(diff).sum(axis=-1))

    def pairwise_scores(self, params, users, items, training=False, rng=None):
        """Single-gather batched distances (see ``BasePipeline.pairwise_scores``):
        user rows fetched once and broadcast against ``[R, B, d]`` item rows."""
        R, B = items.shape
        user_embeddings = embedding_lookup(params['user_embeddings'], users)
        # 2-D ids straight into the gather — flattening would merge the
        # data-sharded batch dim and replicate the block on a mesh
        item_embeddings = embedding_lookup(params['item_embeddings'], items)
        diff = user_embeddings[None] - item_embeddings + 1e-6
        return jnp.sqrt(jnp.square(diff).sum(axis=-1))

    def _get_item_embeddings(self) -> jnp.ndarray:
        return self.params['item_embeddings']

    def _get_user_embeddings(self) -> jnp.ndarray:
        return self.params['user_embeddings']
