"""Optimizer-spec construction and lr-injection behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collie_tpu.training.optimizers import build_transform, get_lr, set_lr, \
    split_bias_keys


def test_split_bias_keys():
    bias, rest = split_bias_keys(['user_embeddings', 'item_biases', 'mlp_0_bias',
                                  'mlp_0_weight'])
    assert bias == ['item_biases', 'mlp_0_bias']
    assert rest == ['user_embeddings', 'mlp_0_weight']


@pytest.mark.parametrize('name', ['sgd', 'adam', 'adagrad', 'sparse_adam'])
def test_build_transform_strings(name):
    tx = build_transform(name, lr=0.1)
    params = {'w': jnp.ones((4,))}
    state = tx.init(params)
    updates, _ = tx.update({'w': jnp.ones((4,))}, state, params)
    assert np.isfinite(np.asarray(updates['w'])).all()
    assert get_lr(state) == pytest.approx(0.1)


def test_invalid_optimizer_raises():
    with pytest.raises(ValueError, match='not a valid optimizer'):
        build_transform('nonsense', lr=0.1)


def test_set_lr_changes_rate_without_changing_aval():
    """set_lr must preserve the learning rate's abstract value exactly —
    an aval change (e.g. weak_type flip) silently recompiles the epoch
    program after every scheduler step."""
    tx = build_transform('adam', lr=0.1)
    state = tx.init({'w': jnp.ones((4,))})
    old = jnp.asarray(state.hyperparams['learning_rate'])
    new_state = set_lr(state, 0.01)
    new = jnp.asarray(new_state.hyperparams['learning_rate'])
    assert get_lr(new_state) == pytest.approx(0.01)
    assert jax.typeof(old).strip_weak_type() == \
        jax.typeof(new).strip_weak_type()
    assert getattr(old, 'weak_type', False) == getattr(new, 'weak_type', False)


def test_set_lr_no_recompile():
    """Updating the lr must not retrace the jitted update."""
    tx = build_transform('adam', lr=0.1)
    params = {'w': jnp.ones((4,))}
    state = tx.init(params)
    traces = []

    @jax.jit
    def step(params, state):
        traces.append(1)
        updates, state = tx.update({'w': jnp.ones((4,))}, state, params)
        return updates, state

    step(params, state)
    state2 = set_lr(state, 0.01)
    step(params, state2)
    assert len(traces) == 1, 'set_lr triggered a retrace'


def test_weight_decay_is_coupled():
    """torch-style weight decay adds wd*param to the gradient before moments."""
    tx = build_transform('sgd', lr=1.0, weight_decay=0.5)
    params = {'w': jnp.full((2,), 2.0)}
    state = tx.init(params)
    updates, _ = tx.update({'w': jnp.zeros((2,))}, state, params)
    np.testing.assert_allclose(np.asarray(updates['w']), -np.full(2, 1.0))
