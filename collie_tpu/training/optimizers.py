"""Optimizer construction on optax.

Rebuild of the reference's optimizer machinery
(``/root/reference/collie/model/base/base_pipeline.py:342-479`` and
``layers.py:20-63``): string-resolved optimizers ('sgd' / 'adagrad' / 'adam' /
'sparse_adam'), torch-style coupled weight decay (L2 added to the gradient
before moment updates, matching ``torch.optim.Adam(weight_decay=...)``), and
the dual-optimizer scheme where parameters whose name contains ``'bias'`` get
their own optimizer and learning rate.

Instead of torch optimizer objects + the reference's ``MultiOptimizer``
wrapper, each optimizer is an ``OptimizerSpec``: an optax transform plus the
static list of flat-param names it owns (and, for multi-stage models, the
stage it is active in).  The train step applies each active spec to its
parameter subset only, so inactive specs' moments stay frozen — the same
semantics as the reference's stage-gated ``optimizer_step``
(``multi_stage_pipeline.py:226-257``).

Learning rates are injected hyperparameters (part of the optimizer state), so
the host-side ``ReduceLROnPlateau`` scheduler can rescale them between epochs
without recompiling or resetting moments.
"""
import dataclasses
from typing import Any, Callable, List, Optional, Sequence, Union

import optax


@dataclasses.dataclass
class OptimizerSpec:
    """One optimizer over a static subset of flat-dict params."""
    name: str
    transform: optax.GradientTransformation
    keys: List[str]          # flat param names this optimizer owns
    stage: Optional[str] = None  # None -> active in every stage


def _scaler_for(optimizer: str) -> optax.GradientTransformation:
    if optimizer == 'sgd':
        return optax.identity()
    if optimizer == 'adagrad':
        return optax.scale_by_rss(initial_accumulator_value=0.0)
    if optimizer in ('adam', 'sparse_adam'):
        # the reference's 'sparse_adam' is a GPU memory optimization over
        # ``sparse=True`` embeddings; on TPU tables are dense and (optionally)
        # row-sharded, so it maps to plain adam (SURVEY §7 "sparse-embedding story")
        return optax.scale_by_adam()
    raise ValueError(f'{optimizer} is not a valid optimizer!')


def build_transform(optimizer: Union[str, Callable[..., Any]],
                    lr: float,
                    weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Build a single optax transform with torch-coupled weight decay and an
    injected (state-resident, host-mutable) learning rate."""
    if callable(optimizer) and not isinstance(optimizer, str):
        # custom factory: expected to return an optax.GradientTransformation
        # when called with (learning_rate=..., weight_decay=...).  Wrapped in
        # the f32-math shim like the string-built transforms — bf16 params
        # would otherwise give the factory bf16 moments/updates (the measured
        # degradation _f32_optimizer_math documents); identity for f32
        try:
            inner = optimizer(learning_rate=lr, weight_decay=weight_decay)
        except TypeError:
            inner = optimizer(learning_rate=lr)
        return _f32_optimizer_math(inner)

    if optimizer == 'sparse_adam' and weight_decay != 0.0:
        # torch.optim.SparseAdam does not support weight decay
        # (reference ``base_pipeline.py:430-433`` passes no weight_decay)
        weight_decay = 0.0

    scaler = _scaler_for(optimizer)

    @optax.inject_hyperparams
    def _make(learning_rate):
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(scaler)
        parts.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*parts)

    return _f32_optimizer_math(_make(learning_rate=lr))


def _f32_optimizer_math(inner: optax.GradientTransformation
                        ) -> optax.GradientTransformation:
    """Run the optimizer chain at float32 regardless of parameter storage
    dtype.

    With ``embeddings_dtype='bfloat16'`` the tables are stored half-width;
    without this wrapper optax would also keep Adam's mu/nu moments and the
    whole update computation in bf16, which measurably degrades training
    (gate config, 3 seeds: MAP@10 0.0323 vs 0.0349, AUC 0.653 vs 0.676).
    The wrapper upcasts grads/params to f32 for the inner chain (so moments
    init and stay f32) and rounds only the final per-step update back to the
    storage dtype.  Stateless: the inner state (including the injected
    ``hyperparams`` learning rate that ``set_lr``/``get_lr`` mutate) passes
    through untouched, and for all-f32 params every cast is an identity XLA
    drops.  The remaining bf16 cost is storage rounding only — the same
    rounding a post-training cast applies, which measures at zero quality
    cost (``tests/test_bf16_embeddings.py``)."""
    import jax
    import jax.numpy as jnp

    def _f32(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, 'dtype') and x.dtype == jnp.bfloat16 else x, tree)

    def init(params):
        return inner.init(_f32(params))

    def update(updates, state, params=None):
        out, new_state = inner.update(
            _f32(updates), state, _f32(params) if params is not None else None)
        if params is not None:
            out = jax.tree_util.tree_map(
                lambda u, p: u.astype(p.dtype), out, params)
        return out, new_state

    return optax.GradientTransformation(init, update)


def get_lr(opt_state) -> float:
    """Read the injected learning rate out of a transform built by
    ``build_transform``."""
    return float(_find_hyperparams(opt_state)['learning_rate'])


def set_lr(opt_state, new_lr: float):
    """Return ``opt_state`` with the injected learning rate replaced.

    The replacement must carry the exact same abstract value (dtype AND
    weak_type) as the original — an aval mismatch would silently retrigger a
    full recompile of the epoch program on the next step.
    """
    import jax
    import jax.numpy as jnp

    hp = _find_hyperparams(opt_state)
    hp_new = dict(hp)
    old = hp['learning_rate']
    if isinstance(old, jax.Array) and jax.process_count() > 1:
        # multi-process: the new leaf must be a GLOBAL array with the old
        # one's sharding/aval; compute it on device from the old leaf
        new = jax.jit(lambda r: r * 0 + float(new_lr))(old)
    else:
        old = jnp.asarray(old)
        if getattr(old, 'weak_type', False):
            new = jnp.asarray(float(new_lr))       # weakly-typed, like the original
        else:
            new = jnp.asarray(new_lr, dtype=old.dtype)
    hp_new['learning_rate'] = new
    return opt_state._replace(hyperparams=hp_new)


def match_lr_aval(opt_state, reference_opt_state):
    """Rebuild the injected learning-rate leaf to carry ``reference``'s aval.

    Checkpoint restore converts every optimizer-state leaf through numpy,
    which can change the lr scalar's dtype/weak_type; an aval mismatch with
    the compiled epoch program silently retraces (and recompiles, 30-90 s) on
    the first post-resume fit.  ``reference_opt_state`` is a freshly
    initialized state of the same transform — the lr value comes from
    ``opt_state``, the aval from the reference.  States without injected
    hyperparams (custom factories) pass through untouched.
    """
    import jax.numpy as jnp

    try:
        hp = _find_hyperparams(opt_state)
        ref = _find_hyperparams(reference_opt_state)
    except ValueError:
        return opt_state
    ref_lr = jnp.asarray(ref['learning_rate'])
    value = float(jnp.asarray(hp['learning_rate']))
    if ref_lr.weak_type:
        new = jnp.asarray(value)
    else:
        new = jnp.asarray(value, dtype=ref_lr.dtype)
    hp_new = dict(hp)
    hp_new['learning_rate'] = new
    return opt_state._replace(hyperparams=hp_new)


def adopt_lr_aval(opt_state, reference_opt_state):
    """``match_lr_aval`` for global (possibly multi-process) states.

    The replacement lr leaf is computed ON DEVICE from the reference leaf
    (``ref * 0 + value``), so it inherits the fresh leaf's aval — dtype AND
    weak_type — and its (global, replicated) sharding.  Host-side
    ``jnp.asarray`` would produce a process-local array a global-mesh
    program cannot consume.
    """
    import jax

    try:
        hp = _find_hyperparams(opt_state)
        ref = _find_hyperparams(reference_opt_state)
    except ValueError:
        return opt_state
    value = float(jax.device_get(hp['learning_rate']))
    new = jax.jit(lambda r: r * 0 + value)(ref['learning_rate'])
    return opt_state._replace(
        hyperparams={**hp, 'learning_rate': new})


def _find_hyperparams(opt_state):
    if hasattr(opt_state, 'hyperparams'):
        return opt_state.hyperparams
    raise ValueError(
        'Optimizer state carries no injected hyperparams; learning-rate scheduling '
        'requires transforms built by ``build_transform``.'
    )


def split_bias_keys(param_keys: Sequence[str]) -> (list, list):
    """The reference's name-based split: params whose name contains 'bias'
    (``base_pipeline.py:460-479``)."""
    bias = [k for k in param_keys if 'bias' in k]
    rest = [k for k in param_keys if 'bias' not in k]
    return bias, rest
