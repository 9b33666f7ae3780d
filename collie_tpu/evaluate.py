"""Batched full-catalog evaluation drivers.

Rebuild of the evaluation drivers in ``/root/reference/collie/metrics.py``
(``evaluate_in_batches`` at ``:285``, ``explicit_evaluate_in_batches`` at
``:398``, ``get_preds`` at ``:77``).  The device work per user batch is one
jitted ``score_all_items`` call (an MXU matmul for factorization models)
followed by jitted metric kernels; the host only slices csr target rows.
"""
from typing import Any, Callable, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from collie_tpu.data import ExplicitInteractions, Interactions, InteractionsDataLoader
from collie_tpu.ops import metrics as metrics_lib

# cap on the dense relevance block a fused whole-eval dispatch may hold in HBM
_FUSED_EVAL_MAX_ELEMENTS = 512 * 1024 * 1024


def get_preds(model,
              user_ids: Union[np.ndarray, Iterable[int]],
              n_items: int = None,
              device: Optional[str] = None) -> jnp.ndarray:
    """``[len(user_ids), num_items]`` score block (reference ``metrics.py:77-107``).

    ``n_items`` / ``device`` kept for API parity; the catalog size comes from
    the model and placement from jax.
    """
    user_ids = jnp.asarray(np.asarray(user_ids, dtype=np.int32))
    return model._jit_score_all_items(model.params, user_ids)


def evaluate_in_batches(
    metric_list: Iterable[Callable],
    test_interactions: Interactions,
    model,
    k: int = 10,
    batch_size: int = 128,
    logger: Optional[Any] = None,
    verbose: bool = True,
    mesh: Optional[Any] = None,
) -> Union[float, List[float]]:
    """Implicit evaluation driver (reference ``metrics.py:285-395``).

    Scores each batch of test users against the full catalog and applies every
    metric, weighting batch scores by user count.  ``batch_size`` defaults
    higher than the reference's 20 — a user batch is one matmul here, and
    batches are padded to a single shape so XLA compiles once.

    ``mesh``: evaluate across a device mesh (the SP analog, SURVEY §2.8) —
    users are sharded over the ``data`` axis and the catalog over the
    ``model`` axis; each device scores its item shard and the per-positive
    rank counts are ``psum``-merged over ICI, so values match the
    single-device evaluator exactly.  Requires built-in metrics
    (``mapk``/``mrr``/``auc``); custom callables fall back to the
    single-device per-batch path.
    """
    if not isinstance(test_interactions, Interactions):
        raise ValueError(
            '``test_interactions`` must be of type ``Interactions``, not '
            f'{type(test_interactions)}. Try using ``explicit_evaluate_in_batches`` instead.'
        )

    test_users = np.unique(test_interactions.mat.row)
    targets = test_interactions.mat.tocsr()
    if len(test_users) < batch_size:
        batch_size = len(test_users)

    fused = _fused_evaluate(metric_list, test_users, targets, model, k,
                            batch_size, mesh)
    if fused is not None:
        all_scores = fused
        if logger is not None:
            _log_metrics(model=model, logger=logger, metric_list=metric_list,
                         all_scores=all_scores, verbose=verbose)
        return all_scores[0] if len(all_scores) == 1 else all_scores

    accumulators = [0.0] * len(metric_list)
    n_batches = int(np.ceil(len(test_users) / batch_size))
    for i in range(n_batches):
        user_range = test_users[i * batch_size:(i + 1) * batch_size]
        actual = len(user_range)
        padded = user_range
        if actual < batch_size:  # pad to the compiled shape, results sliced off
            padded = np.concatenate([user_range,
                                     np.full(batch_size - actual, user_range[0])])
        preds = np.asarray(get_preds(model, padded))[:actual]
        for metric_ind, metric in enumerate(metric_list):
            score = metric(targets=targets, user_ids=user_range, preds=preds, k=k)
            accumulators[metric_ind] += score * actual

    all_scores = [acc / len(test_users) for acc in accumulators]

    if logger is not None:
        _log_metrics(model=model, logger=logger, metric_list=metric_list,
                     all_scores=all_scores, verbose=verbose)

    return all_scores[0] if len(all_scores) == 1 else all_scores


def _fused_evaluate(metric_list, test_users, targets, model, k: int,
                    batch_size: int, mesh=None) -> Optional[List[float]]:
    """Whole-evaluation-in-one-dispatch fast path.

    When every requested metric is one of the built-in ranking metrics, one
    jitted program scans user blocks — ``score_all_items`` (an MXU matmul for
    factorization models) + the rank-count metric kernel — accumulating
    per-user sums on device.  The host uploads only each user's padded
    positive-item list (``[users, max_test_degree]``), never a dense
    ``[users, num_items]`` relevance matrix, so upload cost is independent of
    catalog size.  One host sync per evaluation.

    Under a ``mesh`` the same program runs in ``shard_map``: users shard over
    the ``data`` axis, the catalog over the ``model`` axis; each device
    scores its item span and the additive rank counts (and each positive's
    own score) are ``psum``-merged over ICI — per-user communication is
    ``O(max_test_degree)``, independent of catalog size.

    Returns None (falling back to the per-batch path) for custom metric
    callables.
    """
    metric_row = {metrics_lib.mapk: 0, metrics_lib.mrr: 1, metrics_lib.auc: 2}
    if not all(m in metric_row for m in metric_list):
        return None
    U = len(test_users)
    num_items = model.hparams['num_items']
    # shrink the user block so the [block, num_items] score buffer stays under
    # the HBM cap — the fused path then works at any catalog size
    batch_size = max(1, min(batch_size, _FUSED_EVAL_MAX_ELEMENTS // num_items))
    if mesh is not None:
        from collie_tpu.parallel.mesh import DATA_AXIS
        n_data = mesh.shape[DATA_AXIS]
        batch_size = max(n_data, (batch_size // n_data) * n_data)

    S = -(-U // batch_size)
    pad = S * batch_size - U
    users_padded = np.concatenate([test_users, np.full(pad, test_users[0])]) \
        if pad else test_users
    pos_items, pos_mask = metrics_lib.padded_positives(targets, users_padded)
    user_mask = np.concatenate([np.ones(U, np.float32), np.zeros(pad, np.float32)])
    D = pos_items.shape[1]

    cache = getattr(model, '_compiled_fn_cache', None)
    if cache is None:
        cache = model._compiled_fn_cache = {}
    # key carries the model's stage: Hybrid/ColdStart ``score()`` branches on
    # hparams['stage'] at trace time, so a function traced in one stage is
    # silently wrong in another (CLAUDE.md cache-invalidation invariant)
    key = ('fused_eval', model.current_stage, k, batch_size, S, D, num_items,
           mesh)  # hashes by topology — no id-recycling alias

    if key not in cache:
        if mesh is None:
            def eval_fn(params, users_blocks, pos_blocks, pos_mask_blocks,
                        mask_blocks):
                def block(carry, xs):
                    users, pos_b, pos_mask_b, mask = xs
                    scores = model.score_all_items(params, users)
                    per_user = metrics_lib.metrics_from_positive_ranks(
                        scores, pos_b, pos_mask_b, k)           # [3, B]
                    return carry + (per_user * mask[None, :]).sum(axis=1), None

                totals, _ = jax.lax.scan(
                    block, jnp.zeros(3),
                    (users_blocks, pos_blocks, pos_mask_blocks, mask_blocks))
                return totals
        else:
            eval_fn = _build_sharded_eval_fn(model, k, num_items, mesh)

        cache[key] = jax.jit(eval_fn)

    if mesh is not None:
        # upload pre-sharded over the data axis; multi-process, each host
        # feeds only its addressable user slice (per-process feeding)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from collie_tpu.parallel.distributed import put_global
        from collie_tpu.parallel.mesh import DATA_AXIS

        def _up(x, ndim):
            spec = P(None, DATA_AXIS, *([None] * (ndim - 2)))
            return put_global(x, NamedSharding(mesh, spec))
    else:
        def _up(x, ndim):
            return jnp.asarray(x)
    totals = np.asarray(cache[key](
        model.params,
        _up(users_padded.astype(np.int32).reshape(S, batch_size), 2),
        _up(pos_items.reshape(S, batch_size, D), 3),
        _up(pos_mask.reshape(S, batch_size, D), 3),
        _up(user_mask.reshape(S, batch_size), 2),
    ))
    return [float(totals[metric_row[m]]) / U for m in metric_list]


def _sharded_eval_param_kinds(model, mesh) -> Optional[dict]:
    """Classify params for the zero-table-allgather eval fast path.

    Returns ``{name: 'user' | 'item' | 'replicated'}`` when the model's
    scoring reads params only through user-id / item-id gathers
    (``model._sharded_eval_localizable()``) and every user/item-leading leaf
    row-shards cleanly over the ``model`` axis; None → the generic
    replicated-params path (which all-gathers the tables once per dispatch).
    """
    from collie_tpu.parallel.mesh import MODEL_AXIS
    from collie_tpu.parallel.sharding import param_spec

    if not getattr(model, '_sharded_eval_localizable', lambda: False)():
        return None
    num_users = model.hparams['num_users']
    num_items = model.hparams['num_items']
    n_model = mesh.shape[MODEL_AXIS]
    if num_users == num_items:          # leading-dim kind would be ambiguous
        return None
    if num_users % n_model or num_items % n_model:
        return None
    kinds = {}
    for name, value in model.params.items():
        lead = value.shape[0] if value.ndim else None
        if lead == num_users:
            kinds[name] = 'user'
        elif lead == num_items:
            kinds[name] = 'item'
        else:
            kinds[name] = 'replicated'
        if kinds[name] != 'replicated' and \
                MODEL_AXIS not in (param_spec(name, value, mesh) or ()):
            return None                 # a table leaf would not be sharded
    return kinds


def _build_sharded_eval_fn(model, k: int, num_items: int, mesh):
    """Item- and user-sharded fused evaluation program (SP analog).

    Each device holds one (data, model) tile: a slice of the user blocks and
    an item span.  Per scan step it scores ``[B/n_data, span]``, reads its
    span's contribution to each positive's score, and psum-merges the rank
    counts over the ``model`` axis; per-user metric sums psum over ``data``
    at the end.  Values are bit-identical to the single-device evaluator
    (verified in tests/test_parallel.py) because the counts are exact
    integers merged exactly.

    Params enter the shard_map in their REAL shardings when the model
    supports it (``_sharded_eval_param_kinds``): item-leading leaves are used
    as local item spans, user rows are fetched with the explicit
    masked-local-gather + psum all-to-all (``parallel/embedding.py``'s
    schedule) — per-dispatch communication is O(batch x dim), never
    O(table), guarded at 131k-row scale by ``tests/test_parallel_scale.py``.
    Models whose score reads item-indexed constants (hybrids; cold-start in
    the bucket stage) fall back to replicated params.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from collie_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from collie_tpu.parallel.sharding import param_spec

    n_model = mesh.shape[MODEL_AXIS]
    span = -(-num_items // n_model)
    neg_inf = jnp.finfo(jnp.float32).min
    kinds = _sharded_eval_param_kinds(model, mesh)
    num_users = model.hparams['num_users']

    def sharded_body(params, users_blocks, pos_blocks, pos_mask_blocks,
                     mask_blocks):
        shard = jax.lax.axis_index(MODEL_AXIS)
        start = shard * span
        item_ids = start + jnp.arange(span, dtype=jnp.int32)
        valid_items = item_ids < num_items

        if kinds is not None:
            rows_u = num_users // n_model
            u_start = shard * rows_u

            def gather_user_leaf(leaf, ids):
                local = ids - u_start
                ok = (local >= 0) & (local < rows_u)
                safe = jnp.clip(local, 0, rows_u - 1)
                rows = jnp.take(leaf, safe, axis=0)
                mask_shape = (len(ids),) + (1,) * (rows.ndim - 1)
                rows = jnp.where(ok.reshape(mask_shape), rows, 0)
                return jax.lax.psum(rows, MODEL_AXIS)

        def block(carry, xs):
            users, pos_b, pos_mask_b, mask = xs
            if kinds is None:
                scores = model.score_item_block(
                    params, users, jnp.minimum(item_ids, num_items - 1))
            else:
                # localized view: user rows all-to-all'd to [B_local, ...]
                # pseudo-tables, item leaves already ARE the local span
                view = {}
                for name, leaf in params.items():
                    if kinds[name] == 'user':
                        view[name] = gather_user_leaf(leaf, users)
                    else:
                        view[name] = leaf
                local_users = jnp.arange(users.shape[0], dtype=jnp.int32)
                local_items = jnp.arange(span, dtype=jnp.int32)
                scores = model.score_item_block(view, local_users, local_items)
            scores = jnp.where(valid_items[None, :], scores, neg_inf)
            pos_scores = jax.lax.psum(
                metrics_lib.positive_scores_in_block(scores, pos_b, start),
                MODEL_AXIS)
            greater, eq_after = metrics_lib.rank_counts_in_block(
                scores, pos_scores, pos_b, start)
            greater = jax.lax.psum(greater, MODEL_AXIS)
            eq_after = jax.lax.psum(eq_after, MODEL_AXIS)
            per_user = metrics_lib.metrics_from_rank_counts(
                greater, eq_after, pos_mask_b, k, num_items)     # [3, B_local]
            return carry + (per_user * mask[None, :]).sum(axis=1), None

        totals, _ = jax.lax.scan(
            block, jnp.zeros(3),
            (users_blocks, pos_blocks, pos_mask_blocks, mask_blocks))
        return jax.lax.psum(totals, DATA_AXIS)

    if kinds is None:
        params_spec = P()
    else:
        params_spec = {name: param_spec(name, value, mesh)
                       for name, value in model.params.items()}

    def eval_fn(params, users_blocks, pos_blocks, pos_mask_blocks, mask_blocks):
        return shard_map(
            sharded_body, mesh=mesh,
            in_specs=(params_spec, P(None, DATA_AXIS), P(None, DATA_AXIS, None),
                      P(None, DATA_AXIS, None), P(None, DATA_AXIS)),
            out_specs=P(),
            check_vma=False,
        )(params, users_blocks, pos_blocks, pos_mask_blocks, mask_blocks)

    return eval_fn


def explicit_evaluate_in_batches(
    metric_list: Iterable[Union[str, Callable]],
    test_interactions: ExplicitInteractions,
    model,
    logger: Optional[Any] = None,
    verbose: bool = True,
    **kwargs,
) -> Union[float, List[float]]:
    """Explicit evaluation driver (reference ``metrics.py:398-502``).

    The reference streams batches into stateful ``torchmetrics.Metric``
    objects.  Accepted metrics here:

    * the strings ``'mse'`` / ``'mae'`` — accumulated in one streaming pass;
    * **stateful metric objects** with the torchmetrics protocol —
      ``update(preds, ratings)`` per batch, ``compute()`` at the end, and
      (if present) ``reset()`` always called in a ``finally`` as the
      reference does (``metrics.py:465-502``) — predictions stream through
      without buffering;
    * plain callables ``(preds, ratings) -> float`` — these buffer all
      predictions in host memory (kept for convenience; prefer a stateful
      object for large test sets).
    """
    if not isinstance(test_interactions, ExplicitInteractions):
        raise ValueError(
            '``test_interactions`` must be of type ``ExplicitInteractions``, not '
            f'{type(test_interactions)}. Try using ``evaluate_in_batches`` instead.'
        )

    def _is_stateful(metric):
        return hasattr(metric, 'update') and hasattr(metric, 'compute')

    loader = InteractionsDataLoader(interactions=test_interactions, **kwargs)
    sq_sum = 0.0
    abs_sum = 0.0
    count = 0
    custom_preds: List[np.ndarray] = []
    custom_ratings: List[np.ndarray] = []
    needs_raw = any(callable(m) and not _is_stateful(m) for m in metric_list)
    stateful = [m for m in metric_list if _is_stateful(m)]

    try:
        for batch in loader:
            valid = batch['mask'].astype(bool)
            preds = model(batch['users'], batch['items'])[valid]
            ratings = batch['ratings'][valid]
            err = preds - ratings
            sq_sum += float(np.square(err).sum())
            abs_sum += float(np.abs(err).sum())
            count += len(ratings)
            for metric in stateful:
                metric.update(preds, ratings)
            if needs_raw:
                custom_preds.append(preds)
                custom_ratings.append(ratings)

        all_scores = []
        for metric in metric_list:
            if metric == 'mse':
                all_scores.append(sq_sum / count)
            elif metric == 'mae':
                all_scores.append(abs_sum / count)
            elif _is_stateful(metric):
                all_scores.append(float(metric.compute()))
            elif callable(metric):
                all_scores.append(float(metric(np.concatenate(custom_preds),
                                               np.concatenate(custom_ratings))))
            else:
                raise ValueError(f'Unrecognized explicit metric: {metric!r}')
    finally:
        for metric in stateful:
            reset = getattr(metric, 'reset', None)
            if callable(reset):
                reset()

    if logger is not None:
        _log_metrics(model=model, logger=logger, metric_list=metric_list,
                     all_scores=all_scores, verbose=verbose)

    return all_scores[0] if len(all_scores) == 1 else all_scores


def _log_metrics(model, logger, metric_list, all_scores, verbose: bool) -> None:
    """Push metric values to a logger keyed by metric name with
    ``num_epochs_completed`` as the step (reference ``metrics.py:524-543``)."""
    step = model.hparams.get('num_epochs_completed')
    names = [
        getattr(m, '__name__', None) or (m if isinstance(m, str) else type(m).__name__)
        for m in metric_list
    ]
    metrics_dict = dict(zip(names, all_scores))
    if verbose:
        print(f'Logging metrics {metrics_dict} to ``logger``...')
    logger.log_metrics(metrics=metrics_dict, step=step)
