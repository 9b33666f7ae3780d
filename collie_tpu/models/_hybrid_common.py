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

from collie_tpu.ops.embeddings import dropout, embedding_lookup
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


def metadata_tower_layers(params: Dict, out: jnp.ndarray, metadata_type: str,
                          n_layers: int, dropout_p: float, training: bool,
                          rng) -> jnp.ndarray:
    """The (optional) metadata MLP over already-gathered rows."""
    for i in range(n_layers):
        layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
        out = dropout(layer_rng,
                      jax.nn.leaky_relu(linear(params, f'{metadata_type}_metadata_layer_{i}', out)),
                      dropout_p, training)
    return out


def metadata_tower_output(params: Dict, metadata: jnp.ndarray, ids: jnp.ndarray,
                          metadata_type: str, n_layers: int, dropout_p: float,
                          training: bool, rng) -> jnp.ndarray:
    """Gather metadata rows and run them through the (optional) tower
    (reference ``_compute_metadata_output``)."""
    return metadata_tower_layers(params, metadata[ids, :], metadata_type,
                                 n_layers, dropout_p, training, rng)


def hybrid_pairwise_scores(model, params, users, items, rngs, training,
                           stop_grad_embeddings: bool = False) -> jnp.ndarray:
    """Tile-AFTER-gather pairwise scoring for the metadata architectures.

    The base hook tiles user ids ``R`` times and scores ``[R*B]`` flat pairs,
    so every user-side gather (embedding rows, metadata rows) moves ``R``
    duplicate copies through HBM and the backward scatters ``R*B`` rows into
    the user table.  Here each user-side table is gathered ONCE (``[B, .]``)
    and broadcast on-chip; item-side gathers keep 2-D ``[R, B]`` ids
    (structure-preserving on a mesh — see ``BasePipeline._emb_bias_lookup``),
    and the combined MLP runs at ``[R, B, .]``.  Outputs equal the base hook
    element-for-element including dropout: ``jax.random.bernoulli`` draws the
    same bits for ``(R*B, h)`` and ``(R, B, h)`` masks, pinned by
    ``tests/test_pairwise_scores.py``.  ``rngs`` is the CALLER's split of the
    pair rng, matching its ``score`` stream layout (the two hybrids split
    into different counts)."""
    R, B = items.shape
    p = model.hparams.get('dropout_p', 0.0)
    user_emb = embedding_lookup(params['user_embeddings'], users)     # [B, D]
    item_emb = embedding_lookup(params['item_embeddings'], items)     # [R,B,D]
    if stop_grad_embeddings:
        user_emb = jax.lax.stop_gradient(user_emb)
        item_emb = jax.lax.stop_gradient(item_emb)

    pieces = []
    if model.user_metadata is not None:
        rows = model.user_metadata[users]                             # [B, F]
        tiled = jnp.broadcast_to(rows[None], (R,) + rows.shape)
        pieces.append(metadata_tower_layers(
            params, tiled, 'user', model._n_meta_layers('user'), p,
            training, rngs[0]))
    pieces.append(jnp.broadcast_to(user_emb[None], (R,) + user_emb.shape))
    pieces.append(item_emb)
    if model.item_metadata is not None:
        pieces.append(metadata_tower_output(
            params, model.item_metadata, items, 'item',
            model._n_meta_layers('item'), p, training, rngs[1]))

    combined = jnp.concatenate(pieces, axis=-1)
    return combined_prediction(params, combined,
                               params['user_biases'][users][None, :],
                               params['item_biases'][items],
                               model.n_combined_layers, p, training, rngs[2])


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
