"""Shared compute + persistence for the hybrid (metadata) models.

Both ``HybridModel`` and ``HybridPretrainedModel`` share one architecture
(reference ``hybrid_matrix_factorization.py:293-546``,
``hybrid_pretrained_matrix_factorization.py:188-464``): optional per-type
metadata MLP towers (leaky-ReLU + dropout, xavier-normal init), a combined
MLP over ``concat([user_meta], user_emb, item_emb, [item_meta])`` ending in a
1-unit layer, plus user/item biases.  Persistence is a directory of
``model.npz`` + metadata arrays (the reference writes ``model.pth`` +
joblib'd pickles, ``hybrid_matrix_factorization.py:558-595``).
"""
import os
import warnings
from pathlib import Path
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from collie_tpu.ops.embeddings import dropout
from collie_tpu.ops.nn import add_linear, linear


def as_float_array(metadata) -> Optional[np.ndarray]:
    """Normalize tensor / DataFrame / ndarray metadata to float32 ndarray."""
    if metadata is None:
        return None
    if isinstance(metadata, pd.DataFrame):
        metadata = metadata.to_numpy()
    return np.asarray(metadata, dtype=np.float32)


def build_metadata_tower_params(params: Dict, rng: jax.Array, metadata_type: str,
                                layers_dims: Optional[List[int]],
                                num_metadata_cols: Optional[int]) -> None:
    """Add ``{type}_metadata_layer_{i}_*`` xavier-normal linears
    (reference ``_configure_metadata_layers``)."""
    if layers_dims is None:
        return
    dims = [num_metadata_cols] + list(layers_dims)
    rngs = jax.random.split(rng, len(dims) - 1)
    for i in range(len(dims) - 1):
        add_linear(params, f'{metadata_type}_metadata_layer_{i}', rngs[i],
                   dims[i], dims[i + 1], init='xavier_normal')


def build_combined_params(params: Dict, rng: jax.Array,
                          combined_dimension_input: int,
                          combined_layers_dims: List[int]) -> int:
    """Add ``combined_layer_{i}_*`` xavier-normal linears ending in 1 unit.
    Returns the layer count."""
    dims = [combined_dimension_input] + list(combined_layers_dims) + [1]
    rngs = jax.random.split(rng, len(dims) - 1)
    for i in range(len(dims) - 1):
        add_linear(params, f'combined_layer_{i}', rngs[i], dims[i], dims[i + 1],
                   init='xavier_normal')
    return len(dims) - 1


def metadata_tower_output(params: Dict, metadata: jnp.ndarray, ids: jnp.ndarray,
                          metadata_type: str, n_layers: int, dropout_p: float,
                          training: bool, rng) -> jnp.ndarray:
    """Gather metadata rows and run them through the (optional) tower
    (reference ``_compute_metadata_output``)."""
    out = metadata[ids, :]
    for i in range(n_layers):
        layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
        out = dropout(layer_rng,
                      jax.nn.leaky_relu(linear(params, f'{metadata_type}_metadata_layer_{i}', out)),
                      dropout_p, training)
    return out


def combined_prediction(params: Dict, combined: jnp.ndarray, user_biases: jnp.ndarray,
                        item_biases: jnp.ndarray, n_combined_layers: int,
                        dropout_p: float, training: bool, rng) -> jnp.ndarray:
    """Combined MLP -> 1 unit + biases (reference ``_compute_prediction``)."""
    out = combined
    for i in range(n_combined_layers - 1):
        layer_rng = jax.random.fold_in(rng, 100 + i) if rng is not None else None
        out = dropout(layer_rng,
                      jax.nn.leaky_relu(linear(params, f'combined_layer_{i}', out)),
                      dropout_p, training)
    return linear(params, f'combined_layer_{n_combined_layers - 1}', out)[..., 0] \
        + user_biases + item_biases


def save_hybrid_model(model, path: Union[str, Path], overwrite: bool) -> None:
    """Directory save: ``model.npz`` + metadata ``.npy`` files
    (reference ``hybrid_matrix_factorization.py:558-595``)."""
    path = str(path)
    if os.path.exists(path) and os.listdir(path) and overwrite is False:
        raise ValueError(f'Data exists in ``path`` at {path} and ``overwrite`` is False.')
    Path(path).mkdir(parents=True, exist_ok=True)
    if model.item_metadata is not None:
        np.save(os.path.join(path, 'item_metadata.npy'), np.asarray(model.item_metadata))
    if model.user_metadata is not None:
        np.save(os.path.join(path, 'user_metadata.npy'), np.asarray(model.user_metadata))
    # base save_model on the directory's model.npz (never contains the
    # pretrained donor model, which is not part of ``params``)
    from collie_tpu.models.base import BasePipeline
    BasePipeline.save_model(model, os.path.join(path, 'model.npz'))


def load_hybrid_metadata(model, load_model_path: Union[str, Path]) -> None:
    """Restore metadata arrays from a hybrid save directory."""
    load_model_path = str(load_model_path)
    item_path = os.path.join(load_model_path, 'item_metadata.npy')
    user_path = os.path.join(load_model_path, 'user_metadata.npy')
    if os.path.exists(item_path):
        model.item_metadata = jnp.asarray(np.load(item_path))
    elif model.hparams.get('item_metadata_layers_dims') is not None:
        warnings.warn('``item_metadata.npy`` not found')
    if os.path.exists(user_path):
        model.user_metadata = jnp.asarray(np.load(user_path))
    elif model.hparams.get('user_metadata_layers_dims') is not None:
        warnings.warn('``user_metadata.npy`` not found')
