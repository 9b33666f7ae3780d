"""Dense-layer initializers and appliers for the model zoo's MLP towers.

The reference's towers are ``torch.nn.Linear`` stacks with various inits:
torch's default kaiming-uniform(a=sqrt(5)) (``mlp_matrix_factorization.py``),
xavier-normal (``nonlinear_matrix_factorization.py:145-159``), NCF's
trunc-normal(std=0.01) MLP + kaiming-uniform(relu) predict layer + zero biases
(``neural_collaborative_filtering.py:143-153``).  These are reproduced here as
pure init functions over the flat param dict.

Naming matters: layer bias keys contain ``'bias'``, so — exactly as in the
reference's name-based optimizer split (``base_pipeline.py:460-479``) — MLP
biases are owned by the separate bias optimizer when one is configured.
"""
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def torch_default_linear_init(rng: jax.Array, in_dim: int, out_dim: int
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch.nn.Linear default: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(in_dim)
    w_rng, b_rng = jax.random.split(rng)
    weight = jax.random.uniform(w_rng, (in_dim, out_dim), minval=-bound, maxval=bound)
    bias = jax.random.uniform(b_rng, (out_dim,), minval=-bound, maxval=bound)
    return weight, bias


def xavier_normal_linear_init(rng: jax.Array, in_dim: int, out_dim: int
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """xavier-normal weight + torch-default bias
    (reference ``nonlinear_matrix_factorization.py:145-159``)."""
    std = jnp.sqrt(2.0 / (in_dim + out_dim))
    w_rng, b_rng = jax.random.split(rng)
    weight = std * jax.random.normal(w_rng, (in_dim, out_dim))
    bound = 1.0 / jnp.sqrt(in_dim)
    bias = jax.random.uniform(b_rng, (out_dim,), minval=-bound, maxval=bound)
    return weight, bias


def trunc_normal_linear_init(rng: jax.Array, in_dim: int, out_dim: int,
                             std: float = 0.01) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NCF MLP init: fastai-style approximate truncated normal
    (``normal().fmod_(2) * std``) with zero bias
    (reference ``neural_collaborative_filtering.py:143-153``)."""
    weight = jnp.fmod(jax.random.normal(rng, (in_dim, out_dim)), 2.0) * std
    return weight, jnp.zeros((out_dim,))


def kaiming_uniform_relu_linear_init(rng: jax.Array, in_dim: int, out_dim: int
                                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kaiming-uniform(nonlinearity='relu') weight with zero bias
    (reference predict layers)."""
    bound = jnp.sqrt(6.0 / in_dim)
    weight = jax.random.uniform(rng, (in_dim, out_dim), minval=-bound, maxval=bound)
    return weight, jnp.zeros((out_dim,))


def add_linear(params: Dict[str, jnp.ndarray], prefix: str, rng: jax.Array,
               in_dim: int, out_dim: int, init: str = 'torch_default') -> None:
    """Insert ``{prefix}_weight`` / ``{prefix}_bias`` into the flat dict."""
    init_fn = {
        'torch_default': torch_default_linear_init,
        'xavier_normal': xavier_normal_linear_init,
        'trunc_normal': trunc_normal_linear_init,
        'kaiming_uniform_relu': kaiming_uniform_relu_linear_init,
    }[init]
    weight, bias = init_fn(rng, in_dim, out_dim)
    params[f'{prefix}_weight'] = weight
    params[f'{prefix}_bias'] = bias


def linear(params: Dict[str, jnp.ndarray], prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params[f'{prefix}_weight'] + params[f'{prefix}_bias']


def apply_final_layer(prediction: jnp.ndarray, final_layer) -> jnp.ndarray:
    """The zoo's optional output activation: string or callable
    (reference ``neural_collaborative_filtering.py:184-193``)."""
    if final_layer is None:
        return prediction
    if callable(final_layer):
        return final_layer(prediction)
    if final_layer == 'sigmoid':
        return jax.nn.sigmoid(prediction)
    if final_layer == 'relu':
        return jax.nn.relu(prediction)
    if final_layer == 'leaky_relu':
        return jax.nn.leaky_relu(prediction)
    raise ValueError(f'{final_layer} not valid final layer value!')


def shrinking_mlp_dims(embedding_dim: int, num_layers: int) -> List[int]:
    """The reference's shrinking layer-width formula
    (``mlp_matrix_factorization.py:114-128``): layer i maps to
    ``int(embedding_dim * 2 * (num_layers - i) / (num_layers + 1))``."""
    dims = []
    for i in range(num_layers):
        dims.append(int(embedding_dim * 2 * (num_layers - i) / (num_layers + 1)))
    return dims
