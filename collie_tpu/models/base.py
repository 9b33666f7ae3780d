"""``BasePipeline`` — the model core: hparams + pure functional compute.

Rebuild of the reference's ``BasePipeline``
(``/root/reference/collie/model/base/base_pipeline.py:33-900``).  The reference
is a stateful ``LightningModule``; here the idiomatic-JAX split is:

* the **model object** holds hyperparameters, data loaders, and the trained
  parameter pytree (a flat ``{name: array}`` dict), plus all user-facing
  inference / persistence APIs;
* **compute is pure**: subclasses implement ``_build_params(rng)`` and
  ``score(params, users, items, training, rng)``, and the trainer jits
  ``calculate_loss`` (grad + update) once per (model, stage).

Behavioral parity preserved from the reference:

* auto-wrapping raw ``Interactions`` into loaders (train shuffled, val not)
  (``base_pipeline.py:144-147``);
* train/val consistency checks on num_users/items/negatives (``:172-199``);
* hyperparameter capture for save/load (``:201-211``);
* string loss resolution with automatic adaptive upgrade when
  ``num_negative_samples > 1`` and downgrade warnings (``:277-340``);
* the dual bias/non-bias optimizer scheme (``:342-479``), expressed as
  ``OptimizerSpec`` subsets consumed by the trainer;
* batch-shape dispatch between implicit and explicit data (``:582-654``);
* inference APIs ``get_item_predictions`` / ``get_user_predictions`` /
  ``item_item_similarity`` / ``user_user_similarity`` (``:656-864``);
* ``save_model`` persisting ``{params, hparams}`` only — no trainer, no
  optimizer state, no datasets (``:880-900``).
"""
import json
import os
import warnings
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from collie_tpu.config import enable_compilation_cache
from collie_tpu.data import (BaseInteractions, ExplicitInteractions, Interactions,
                             InteractionsDataLoader)
from collie_tpu.ops import losses as loss_lib
from collie_tpu.ops.embeddings import embedding_lookup
from collie_tpu.training.optimizers import OptimizerSpec, build_transform, split_bias_keys
from collie_tpu.utils import get_random_seed

INTERACTIONS_LIKE_INPUT = Union[BaseInteractions, InteractionsDataLoader, None]

enable_compilation_cache()


class HParams(dict):
    """Hyperparameter dict with attribute access, matching the reference's
    Lightning-style ``model.hparams.num_epochs_completed`` idiom
    (``base_pipeline.py:529``) alongside ``model.hparams['...']``."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as err:
            raise AttributeError(name) from err

    def __setattr__(self, name, value):
        self[name] = value


class BasePipeline:
    """Abstract recommender pipeline.  Subclasses MUST implement
    ``_build_params`` and ``score``; ``_get_item_embeddings`` /
    ``_get_user_embeddings`` enable the similarity APIs."""

    def __init__(self,
                 train: INTERACTIONS_LIKE_INPUT = None,
                 val: INTERACTIONS_LIKE_INPUT = None,
                 lr: float = 1e-3,
                 lr_scheduler_func: Optional[Any] = None,
                 weight_decay: float = 0.0,
                 optimizer: Union[str, Callable] = 'adam',
                 loss: Union[str, Callable] = 'hinge',
                 metadata_for_loss: Optional[Dict[str, np.ndarray]] = None,
                 metadata_for_loss_weights: Optional[Dict[str, float]] = None,
                 load_model_path: Optional[Union[str, Path]] = None,
                 map_location: Optional[str] = None,  # API parity; unused on TPU
                 **kwargs):
        """Common pipeline construction (reference ``base_pipeline.py:131-243``).

        Parameters
        ----------
        train: Interactions or InteractionsDataLoader
            Training data. A raw ``Interactions`` is auto-wrapped in an
            ``InteractionsDataLoader`` with ``shuffle=True``
        val: Interactions or InteractionsDataLoader
            Validation data, auto-wrapped with ``shuffle=False``
        lr: float
            Model learning rate
        lr_scheduler_func: callable or scheduler instance
            Learning rate scheduler used during fitting (e.g.
            ``collie_tpu.training.ReduceLROnPlateau``)
        weight_decay: float
            Coupled (torch-style) weight decay added to gradients
        optimizer: str or callable
            One of 'sgd' / 'adagrad' / 'adam' / 'sparse_adam', or a factory
            returning an optax transform
        loss: str or callable
            'bpr' / 'adaptive_bpr' / 'hinge' / 'adaptive_hinge' / 'adaptive' /
            'warp' (implicit) or 'mse' / 'mae' (explicit); adaptive variants
            auto-selected when ``num_negative_samples > 1``
        metadata_for_loss: dict
            Categorical item metadata arrays (``num_items``-long) for
            partial-credit losses
        metadata_for_loss_weights: dict
            Weight per metadata key; weights must sum to <= 1
        load_model_path: str or Path
            Load a previously saved model instead of building a new one
        map_location: str
            Accepted for API parity with the reference; unused on TPU
        """
        if isinstance(train, (Interactions, ExplicitInteractions)):
            train = InteractionsDataLoader(interactions=train, shuffle=True)
        if isinstance(val, (Interactions, ExplicitInteractions)):
            val = InteractionsDataLoader(interactions=val, shuffle=False)

        # datasets are deliberately NOT part of hparams (never saved)
        self.train_loader = train
        self.val_loader = val

        # function-valued settings live as attributes, not hparams
        # (reference ``base_pipeline.py:158-163``)
        self.lr_scheduler_func = lr_scheduler_func
        self.loss = loss
        self.optimizer = optimizer
        self.bias_optimizer = kwargs.get('bias_optimizer')
        self.metadata_for_loss = _as_array_dict(metadata_for_loss)
        self.metadata_for_loss_weights = metadata_for_loss_weights

        self.hparams: Dict[str, Any] = HParams()
        self.params: Dict[str, jnp.ndarray] = {}

        if load_model_path is not None:
            self._load_model_init_helper(load_model_path=load_model_path, **kwargs)
            return

        if self.train_loader is None:
            raise TypeError('``train`` must be provided to all newly-instantiated models!')
        if self.val_loader is not None:
            assert self.train_loader.num_users == self.val_loader.num_users, (
                'Both training and val ``num_users`` must equal: '
                f'{self.train_loader.num_users} != {self.val_loader.num_users}.'
            )
            assert self.train_loader.num_items == self.val_loader.num_items, (
                'Both training and val ``num_items`` must equal: '
                f'{self.train_loader.num_items} != {self.val_loader.num_items}.'
            )
            train_negs = getattr(self.train_loader, 'num_negative_samples', None)
            val_negs = getattr(self.val_loader, 'num_negative_samples', None)
            if train_negs is not None and val_negs is not None:
                err = (
                    'Training and val ``num_negative_samples`` must both equal ``1`` or both '
                    f'be greater than ``1``, not: {train_negs} and {val_negs}.'
                )
                if train_negs == 1:
                    assert val_negs == 1, err
                elif train_negs > 1:
                    assert val_negs > 1, err
                else:
                    raise ValueError(
                        f'``num_negative_samples`` must be greater than 0, not {train_negs}.'
                    )

        # freeze hyperparameters (reference ``save_hyperparameters``,
        # ``base_pipeline.py:201-211``); function-valued / data-valued entries
        # stay attributes only
        self.hparams.update({
            'lr': lr,
            'weight_decay': weight_decay,
            'optimizer': optimizer if isinstance(optimizer, str) else None,
            'loss': loss if isinstance(loss, str) else None,
            'metadata_for_loss_weights': metadata_for_loss_weights,
        })
        for key, value in kwargs.items():
            if key in ('item_metadata', 'user_metadata', 'trained_model'):
                continue
            self.hparams[key] = value
        self.hparams['num_users'] = self.train_loader.num_users
        self.hparams['num_items'] = self.train_loader.num_items
        self.hparams['num_epochs_completed'] = 0
        self.hparams.setdefault('seed', kwargs.get('seed') or get_random_seed())

        for meta_key in ('item_metadata', 'user_metadata'):
            meta_val = kwargs.get(meta_key)
            if meta_val is not None and np.isnan(np.asarray(meta_val, dtype=np.float64)).any():
                raise ValueError(f'``{meta_key}`` may not contain nulls')

        self._configure_loss()

        if self.hparams.get('sparse') and self.hparams.get('weight_decay', 0.0) != 0:
            warnings.warn(
                '``weight_decay`` must be 0 when ``sparse`` is flagged. Setting to 0. '
                '(On TPU, ``sparse`` embeddings map to dense sharded tables; the flag is '
                'honored for optimizer-compatibility parity only.)'
            )
            self.hparams['weight_decay'] = 0.0

        self._setup_model(**kwargs)

    # ------------------------------------------------------------------ setup

    #: storage dtypes accepted for ``embeddings_dtype``.  bfloat16 halves the
    #: tables' HBM footprint and gather bandwidth (the training bottleneck for
    #: factorization models); all compute still runs in float32 — lookups
    #: upcast right after the row gather (``ops.embeddings.embedding_lookup``)
    _EMBEDDINGS_DTYPES = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}

    def _setup_model(self, **kwargs) -> None:
        """Build ``self.params`` from a PRNG key derived from ``hparams['seed']``."""
        rng = jax.random.PRNGKey(self.hparams['seed'])
        self.params = self._apply_embeddings_dtype(self._build_params(rng))

    def _apply_embeddings_dtype(self, params: Dict[str, jnp.ndarray]
                                ) -> Dict[str, jnp.ndarray]:
        """Cast embedding *tables* (keys containing ``'embedding'``, the same
        name convention the bias-optimizer split relies on) to the storage
        dtype from ``hparams['embeddings_dtype']``; biases and tower weights
        stay float32."""
        name = self.hparams.get('embeddings_dtype') or 'float32'
        if name not in self._EMBEDDINGS_DTYPES:
            raise ValueError(
                f"``embeddings_dtype`` must be one of "
                f"{sorted(self._EMBEDDINGS_DTYPES)}, not {name!r}.")
        dtype = self._EMBEDDINGS_DTYPES[name]
        if dtype == jnp.float32:
            return params
        return {k: (v.astype(dtype) if 'embedding' in k else v)
                for k, v in params.items()}

    def _build_params(self, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError('``_build_params`` must be implemented in all subclasses.')

    def score(self,
              params: Dict[str, jnp.ndarray],
              users: jnp.ndarray,
              items: jnp.ndarray,
              training: bool = False,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Pure forward pass: ``(params, user IDs, item IDs) -> scores``."""
        raise NotImplementedError('``score`` must be implemented in all subclasses.')

    def pairwise_scores(self,
                        params: Dict[str, jnp.ndarray],
                        users: jnp.ndarray,
                        items: jnp.ndarray,
                        training: bool = False,
                        rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Score ``R`` candidate items per user: ``[B] users x [R, B] items ->
        [R, B]`` scores.

        This default reproduces the reference's multi-negative forward — one
        ``score()`` call on user IDs tiled ``R`` times
        (``base_pipeline.py:602-607``) — so every model supports it.
        Embedding-table models override it to gather each table ONCE (user
        rows ``[B, d]``, item rows ``[R*B, d]``) and batch the dot products,
        instead of gathering ``R`` copies of every user row: at the ML-10M
        config the tiled user gather alone moves ~10 MB of duplicate rows per
        step through HBM, and on TPU the gather/scatter ops — not FLOPs —
        dominate the training step.
        """
        R, B = items.shape
        flat = self.score(params, jnp.tile(users, R), items.reshape(-1),
                          training=training, rng=rng)
        return flat.reshape(R, B)

    def pairwise_scores_select(self,
                               params: Dict[str, jnp.ndarray],
                               users: jnp.ndarray,
                               items: jnp.ndarray,
                               training: bool = False,
                               rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """No-grad candidate scoring used ONLY to pick the hardest (adaptive
        losses) or first-violating (WARP) negative in ``calculate_loss``'s
        sparse-backward rewrites — the gradient-carrying re-score of the
        selected pair always runs through the f32 ``pairwise_scores``.

        Default: ``stop_gradient(pairwise_scores(...))``.  Table models
        override with a half-width (bf16) row gather + MXU dots with f32
        accumulation: the ``[B, K, d]`` candidate block is the single
        largest HBM term of the training step (floor ablation in
        docs/BENCHMARKS.md), and rounding here can only change WHICH
        negative is selected, never the gradient math."""
        return jax.lax.stop_gradient(
            self.pairwise_scores(params, users, items,
                                 training=training, rng=rng))

    @staticmethod
    def _bf16_select_enabled() -> bool:
        """Env ``COLLIE_TPU_BF16_SELECT=0`` forces the f32 selection pass
        (part of the trainer's compiled-program cache key)."""
        return os.environ.get('COLLIE_TPU_BF16_SELECT', 'auto') != '0'

    # ------------------------------------ fused [*, D+1] table layout hooks
    #
    # The training step is priced by the NUMBER of backward scatter ops
    # (docs/BENCHMARKS.md op-cost calibration: ~0.36 ms each, nearly
    # independent of row count).  In the named layout every forward-used
    # bias table costs an extra scatter per step for 1/(D+1)th of the data.
    # Models that declare ``_FUSED_TABLE_SPEC`` let the scan engine repack
    # ``(embeddings, biases)`` pairs as one ``[*, D+1]`` table (bias = last
    # column); score hooks then gather each fused row ONCE and slice after
    # the gather, so autodiff emits exactly one scatter per table.  Scoring
    # math, rng streams, and the optax update path (which runs on the named
    # layout — the engine unfuses around each optimizer application) are
    # unchanged; ``tests/test_fused_tables.py`` pins exact-trajectory
    # equivalence per supporting model.

    #: ``((emb_key, bias_key, fused_key), ...)`` — empty = no fused layout.
    _FUSED_TABLE_SPEC: tuple = ()

    def supports_fused_tables(self) -> bool:
        """Engine gate — overridden per supporting model (exact-type checked
        there: subclasses may carry params outside the fused contract)."""
        return False

    def _fused_tables_ok(self, exact_type) -> bool:
        """Shared gate body: exact type, a declared spec, and f32 tables
        (bf16 tables + f32 biases cannot concat without silently changing
        bias storage)."""
        return (type(self) is exact_type
                and bool(self._FUSED_TABLE_SPEC)
                and (self.hparams.get('embeddings_dtype') or 'float32')
                == 'float32')

    def fuse_params(self, params):
        """Named layout -> fused layout; non-table keys pass through."""
        fused = dict(params)
        for emb_key, bias_key, fused_key in self._FUSED_TABLE_SPEC:
            fused[fused_key] = jnp.concatenate(
                [fused.pop(emb_key), fused.pop(bias_key)[:, None]], axis=1)
        return fused

    def unfuse_params(self, fused):
        """Fused layout -> named layout; non-table keys pass through."""
        params = dict(fused)
        for emb_key, bias_key, fused_key in self._FUSED_TABLE_SPEC:
            tab = params.pop(fused_key)
            params[emb_key] = tab[:, :-1]
            params[bias_key] = tab[:, -1]
        return params

    @staticmethod
    def _emb_bias_lookup(params, emb_key, bias_key, fused_key, ids):
        """``(embedding rows, bias values)`` for ``ids`` under either layout.

        ``ids`` may be any shape — rows come back as ``ids.shape + (d,)``,
        biases as ``ids.shape``.  Structure-preserving gathers matter under
        a mesh: flattening ``[R, B]`` candidate ids before the gather merges
        the data-sharded batch dim into an unshardable axis, so GSPMD
        replicates the gathered block on every device (measured: the full
        ``[B*K, d+1]`` rows in a per-device all-reduce at the ML-10M config,
        ``benchmarks/collective_account.py``).

        Fused rows are gathered once and sliced post-gather — the slice is
        free (it never re-touches HBM) and keeps the backward pass to one
        scatter per table."""
        if fused_key in params:
            rows = embedding_lookup(params[fused_key], ids)
            return rows[..., :-1], rows[..., -1]
        return embedding_lookup(params[emb_key], ids), params[bias_key][ids]

    # ------------------------------------------------------------- loss setup

    def _configure_loss(self) -> None:
        """String -> loss-function resolution with automatic adaptive
        upgrade/downgrade (reference ``base_pipeline.py:277-340``)."""
        self.loss_function = None

        if callable(self.loss):
            self.loss_function = self.loss
            self.hparams['_is_implicit'] = not isinstance(
                self.train_loader.interactions, ExplicitInteractions)
            return

        self.hparams['_is_implicit'] = False
        if self.loss == 'mse':
            self.loss_function = loss_lib.mse_loss
            return
        if self.loss == 'mae':
            self.loss_function = loss_lib.mae_loss
            return

        self.hparams['_is_implicit'] = True
        num_negative_samples = getattr(self.train_loader, 'num_negative_samples', None)
        if num_negative_samples is None:
            raise ValueError(
                '``num_negative_samples`` attribute not found in ``train_loader`` - are you '
                'using explicit data with an implicit loss function?'
            )
        if self.loss == 'warp':
            if num_negative_samples > 1:
                self.loss_function = loss_lib.warp_loss
                return
            raise ValueError('Cannot use WARP loss with a single negative sample!')
        if 'bpr' in self.loss:
            if num_negative_samples > 1:
                self.loss_function = loss_lib.adaptive_bpr_loss
            else:
                if 'adaptive' in self.loss:
                    warnings.warn(
                        'Adaptive BPR loss specified, but ``num_negative_samples`` == 1. '
                        'Using standard BPR loss instead.'
                    )
                self.loss_function = loss_lib.bpr_loss
            return
        if 'hinge' in self.loss or self.loss == 'adaptive':
            if num_negative_samples > 1:
                self.loss_function = loss_lib.adaptive_hinge_loss
            else:
                if 'adaptive' in self.loss:
                    warnings.warn(
                        'Adaptive hinge loss specified, but ``num_negative_samples`` == 1. '
                        'Using standard hinge loss instead.'
                    )
                self.loss_function = loss_lib.hinge_loss
            return
        raise ValueError(f'{self.loss} is not a valid loss function.')

    # ---------------------------------------------------------- loss compute

    def calculate_loss(self,
                       params: Dict[str, jnp.ndarray],
                       batch: Dict[str, jnp.ndarray],
                       rng: Optional[jax.Array] = None,
                       training: bool = True) -> jnp.ndarray:
        """Batch-shape-dispatched loss (reference ``base_pipeline.py:582-654``).

        Implicit batches carry ``neg_items``; explicit batches carry
        ``ratings`` — the dict-key analog of the reference's nested-vs-flat
        tuple discriminator.  Pure in ``params`` / ``batch`` / ``rng``: the
        trainer jits this via ``jax.value_and_grad``.
        """
        mask = batch.get('mask')
        if 'neg_items' in batch:
            if self.hparams.get('_is_implicit') is False:
                raise ValueError('Explicit loss with implicit data is invalid!')
            users = batch['users']
            pos_items = batch['pos_items']
            neg_items = batch['neg_items'].T  # [K, B], the reference's convention

            rng_pos, rng_neg = _split_or_none(rng)

            K, B = neg_items.shape
            loss_function = self.loss_function

            if K > 1 and training and self._adaptive_base_loss() is not None \
                    and self._score_is_deterministic():
                # Sparse-hardest backward: the adaptive losses' gradient only
                # flows to the argmax negative, yet autodiff-through-max still
                # scatter-adds K*B mostly-zero rows into the item table (the
                # single largest per-step cost at large catalogs - measured
                # 895us of a 3.85ms step at the ML-10M config).  Score all K
                # negatives WITHOUT gradient, then re-score only the hardest
                # one with gradient: the backward touches B rows instead of
                # K*B.  Matches the adaptive loss exactly (same argmax, same
                # scores) up to float associativity; gradients agree except on
                # exact score ties (a measure-zero subgradient choice).
                # Requires a deterministic score() - dropout would decouple the
                # argmax pass from the re-scoring pass.
                neg_preds_ng = self.pairwise_scores_select(
                    params, users, neg_items, training=training, rng=rng_neg)
                highest_idx = jnp.argmax(neg_preds_ng, axis=0)
                hardest_items = neg_items[highest_idx, jnp.arange(B)]
                # positive + hardest-negative scored in ONE pairwise call so
                # table-models' backward scatter-adds each table once
                both = self.pairwise_scores(
                    params, users, jnp.stack([pos_items, hardest_items]),
                    training=training, rng=rng_pos)
                pos_preds, neg_preds = both[0], both[1]
                neg_items_for_loss = hardest_items
                loss_function = self._adaptive_base_loss()
            elif K > 1 and training and self._sparse_selection_enabled() \
                    and self.loss_function is loss_lib.warp_loss \
                    and self._score_is_deterministic():
                # WARP's gradient likewise only reaches the FIRST VIOLATING
                # negative per row: run the first-violation scan on grad-free
                # scores (positive and negatives batched into one pairwise
                # call) and re-score only positive + selected negative (one
                # more pairwise call, so each table is gathered/scattered
                # once).
                all_ng = self.pairwise_scores_select(
                    params, users,
                    jnp.concatenate([pos_items[None], neg_items], axis=0),
                    training=training, rng=rng_neg)
                return loss_lib.warp_loss_sparse(
                    all_ng[0],
                    all_ng[1:],
                    rescore_pair=lambda items: self.pairwise_scores(
                        params, users, jnp.stack([pos_items, items]),
                        training=training, rng=rng_neg),
                    num_items=self.hparams['num_items'],
                    positive_items=pos_items,
                    negative_items=neg_items,
                    metadata=self.metadata_for_loss,
                    metadata_weights=self.metadata_for_loss_weights,
                    sample_weights=mask,
                )
            else:
                pos_preds = self.score(params, users, pos_items,
                                       training=training, rng=rng_pos)
                neg_preds = self.pairwise_scores(params, users, neg_items,
                                                 training=training, rng=rng_neg)
                if K == 1:
                    neg_preds = neg_preds[0]
                    neg_items_for_loss = neg_items[0]
                else:
                    neg_items_for_loss = neg_items

            return _call_loss(
                loss_function,
                pos_preds,
                neg_preds,
                num_items=self.hparams['num_items'],
                positive_items=pos_items,
                negative_items=neg_items_for_loss,
                metadata=self.metadata_for_loss,
                metadata_weights=self.metadata_for_loss_weights,
                sample_weights=mask,
            )
        if 'ratings' in batch:
            if self.hparams.get('_is_implicit') is True:
                raise ValueError('Implicit loss with explicit data is invalid!')
            return self._explicit_loss(params, batch, rng, training, mask)
        raise ValueError(f'Unexpected format for batch with keys: {sorted(batch)}.')

    _DROPOUT_HPARAMS = ('dropout_p', 'dense_dropout_p', 'embedding_dropout_p')

    def _score_is_deterministic(self) -> bool:
        """True when ``score()`` ignores its rng (no active dropout), so two
        scoring passes over the same pairs agree - the precondition for the
        sparse-hardest backward in ``calculate_loss``."""
        return all(not self.hparams.get(name) for name in self._DROPOUT_HPARAMS)

    def _loss_semantics_fingerprint(self) -> tuple:
        """Hashable identity of everything the compiled train/val programs
        bake in as trace-time constants: weight decay (inside the optimizer
        transforms), ``y_range`` / ``dropout_p`` (inside ``score``), and the
        loss-metadata arrays + weights (inside ``calculate_loss``).  Part of
        the trainer's compiled-program cache keys — mutating any of these
        between fits must build a new program (CLAUDE.md cache-invalidation
        invariant).  jnp arrays are immutable, so each distinct metadata
        array gets a monotonically increasing *token* from ``_loss_fp_refs``
        (id -> token, with a weakref callback evicting the entry when the
        array is gc'd) — a recycled ``id()`` therefore mints a NEW token
        instead of silently matching a stale compiled program, and nothing
        is pinned, so refitting with fresh metadata cannot leak HBM."""
        hp = self.hparams
        meta = self.metadata_for_loss or {}
        weights = self.metadata_for_loss_weights or {}
        y_range = hp.get('y_range')
        return (
            float(hp.get('weight_decay', 0.0) or 0.0),
            tuple(float(hp.get(n, 0.0) or 0.0) for n in self._DROPOUT_HPARAMS),
            str(hp.get('embeddings_dtype') or 'float32'),
            tuple(y_range) if y_range is not None else None,
            tuple(sorted(
                (k, float(weights.get(k, 0.0)), self._loss_fp_token(meta[k]),
                 tuple(jnp.shape(meta[k]))) for k in meta)),
        )

    def _loss_fp_token(self, arr) -> int:
        """Stable per-array token for the loss-semantics fingerprint."""
        import weakref

        refs = self.__dict__.setdefault('_loss_fp_refs', {})
        key = id(arr)
        entry = refs.get(key)
        if entry is not None and entry[1]() is arr:
            return entry[0]
        token = self.__dict__.setdefault('_loss_fp_counter', 0) + 1
        self._loss_fp_counter = token
        try:
            ref = weakref.ref(arr, lambda _, refs=refs, key=key: refs.pop(key, None))
        except TypeError:  # non-weakref-able (plain np scalar views etc.)
            ref = lambda a=arr: a  # strong pin — the pre-token behavior
        refs[key] = (token, ref)
        return token

    @staticmethod
    def _sparse_selection_enabled() -> bool:
        """Env ``COLLIE_TPU_SPARSE_ADAPTIVE=0`` disables the sparse-backward
        rewrites (adaptive hardest-negative and WARP first-violation)."""
        return os.environ.get('COLLIE_TPU_SPARSE_ADAPTIVE', '1') != '0'

    def _adaptive_base_loss(self):
        """The non-adaptive loss an adaptive loss delegates to after hardest-
        negative selection (``None`` when the sparse-hardest rewrite does not
        apply).  Env ``COLLIE_TPU_SPARSE_ADAPTIVE=0`` disables the rewrite."""
        if not self._sparse_selection_enabled():
            return None
        if self.loss_function is loss_lib.adaptive_hinge_loss:
            return loss_lib.hinge_loss
        if self.loss_function is loss_lib.adaptive_bpr_loss:
            return loss_lib.bpr_loss
        return None

    def _explicit_loss(self, params, batch, rng, training, mask):
        users = batch['users']
        items = batch['items']
        ratings = batch['ratings'].astype(jnp.float32)
        preds = self.score(params, users, items, training=training, rng=rng)
        try:
            return self.loss_function(preds, ratings, sample_weights=mask)
        except TypeError:
            return self.loss_function(preds, ratings)

    # ----------------------------------------------------------- optimizers

    def optimizer_specs(self) -> List[OptimizerSpec]:
        """Optimizer layout consumed by the trainer: single optimizer, or the
        reference's dual bias/non-bias scheme when ``bias_optimizer`` is set
        (``base_pipeline.py:342-479``)."""
        keys = sorted(self.params.keys())
        lr = self.hparams['lr']
        weight_decay = self.hparams.get('weight_decay', 0.0)

        if self.bias_optimizer is not None:
            bias_optimizer = self.bias_optimizer
            if bias_optimizer == 'infer':
                bias_optimizer = self.optimizer
            bias_lr = self.hparams.get('bias_lr', 'infer')
            if bias_lr == 'infer':
                bias_lr = lr
            bias_keys, rest_keys = split_bias_keys(keys)
            specs = []
            if rest_keys:
                specs.append(OptimizerSpec(
                    name='all_but_bias',
                    transform=build_transform(self.optimizer, lr, weight_decay),
                    keys=rest_keys))
            if bias_keys:
                specs.append(OptimizerSpec(
                    name='bias',
                    transform=build_transform(bias_optimizer, bias_lr, weight_decay),
                    keys=bias_keys))
            return specs

        return [OptimizerSpec(name='all',
                              transform=build_transform(self.optimizer, lr, weight_decay),
                              keys=keys)]

    @property
    def current_stage(self) -> Optional[str]:
        """Single-stage models have no stage; ``MultiStagePipeline`` overrides."""
        return None

    def _sharded_eval_localizable(self) -> bool:
        """True when scoring reads params ONLY through user-id gathers on
        ``[num_users, ...]`` leaves and item-id gathers on ``[num_items, ...]``
        leaves (no id-indexed constants) — enables the sharded evaluator's
        zero-table-allgather fast path (``evaluate._build_sharded_eval_fn``).
        Models that gather non-param arrays by id (hybrids' metadata,
        cold-start's bucket map) override this."""
        return True

    # ------------------------------------------------------------- inference

    def eval(self) -> 'BasePipeline':
        """API parity with the reference's ``model.eval()`` idiom
        (``README.md:66``): inference here is always deterministic
        (dropout only runs inside the training step), so this is a no-op."""
        return self

    def train(self, mode: bool = True) -> 'BasePipeline':
        """API parity with ``torch.nn.Module.train``; training mode is a
        property of the jitted train step, not the model object."""
        return self

    def to(self, device=None) -> 'BasePipeline':
        """API parity with ``model.to(device)``; jax manages placement
        (sharded placement comes from the trainer's ``mesh``)."""
        return self

    @property
    def device(self):
        """Device of the model parameters (first shard when sharded)."""
        for value in self.params.values():
            devices = getattr(value, 'devices', None)
            if callable(devices):
                return next(iter(devices()))
        return None

    def forward(self,
                users: Union[np.ndarray, Iterable[int]],
                items: Union[np.ndarray, Iterable[int]]) -> np.ndarray:
        """Eval-mode scoring of (user, item) ID pairs -> numpy scores."""
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        items = jnp.asarray(np.asarray(items, dtype=np.int32))
        return np.asarray(self._jit_score(self.params, users, items))

    __call__ = forward

    @property
    def _jit_score(self):
        fn = getattr(self, '_jit_score_cache', None)
        if fn is None:
            fn = jax.jit(lambda params, u, i: self.score(params, u, i, training=False))
            self._jit_score_cache = fn
        return fn

    def score_all_items(self,
                        params: Dict[str, jnp.ndarray],
                        user_ids: jnp.ndarray) -> jnp.ndarray:
        """Full-catalog scores ``[len(user_ids), num_items]`` — the primitive
        behind evaluation (reference ``get_preds``, ``metrics.py:77-107``).

        Default: vmap of the pairwise ``score`` over users.  Factorization
        models override this with a single embeddings x table matmul that runs
        on the MXU.
        """
        num_items = self.hparams['num_items']
        items = jnp.arange(num_items, dtype=jnp.int32)

        def one_user(u):
            return self.score(params, jnp.full((num_items,), u, dtype=jnp.int32), items)

        return jax.vmap(one_user)(user_ids)

    @property
    def _jit_score_all_items(self):
        fn = getattr(self, '_jit_score_all_cache', None)
        if fn is None:
            fn = jax.jit(self.score_all_items)
            self._jit_score_all_cache = fn
        return fn

    def score_item_block(self,
                         params: Dict[str, jnp.ndarray],
                         user_ids: jnp.ndarray,
                         item_ids: jnp.ndarray) -> jnp.ndarray:
        """Scores for every (user, item) pair of a user batch x item tile:
        ``[len(user_ids), len(item_ids)]``.

        The tile primitive behind blockwise top-k retrieval
        (``collie_tpu.retrieval``), which never materializes the full
        ``[batch, num_items]`` matrix.  Default: vmap of the pairwise score;
        factorization models override with one MXU matmul over the tile.
        """
        def one_user(u):
            return self.score(params,
                              jnp.full(item_ids.shape, u, dtype=jnp.int32),
                              item_ids)

        return jax.vmap(one_user)(user_ids)

    def get_item_predictions(self,
                             user_id: int = 0,
                             unseen_items_only: bool = False,
                             sort_values: bool = True) -> pd.Series:
        """Predicted scores for every item for one user
        (reference ``base_pipeline.py:656-718``)."""
        if user_id >= self.hparams['num_users']:
            raise ValueError(
                f'``user_id`` {user_id} is not in the model. Expected ID between ``0`` and '
                f'``{self.hparams["num_users"] - 1}``, not ``{user_id}``'
            )
        scores = np.asarray(
            self._jit_score_all_items(self.params, jnp.asarray([user_id], dtype=jnp.int32))
        )[0]
        preds = pd.Series(scores)
        if sort_values:
            preds = preds.sort_values(ascending=False)
        if unseen_items_only:
            seen = [self.train_loader.mat.tocsr()[user_id, :].nonzero()[1]]
            if self.val_loader is not None:
                seen.append(self.val_loader.mat.tocsr()[user_id, :].nonzero()[1])
            preds = preds.drop(np.concatenate(seen))
        return preds

    def get_user_predictions(self,
                             item_id: int = 0,
                             unseen_users_only: bool = False,
                             sort_values: bool = True) -> pd.Series:
        """User counterpart of ``get_item_predictions``
        (reference ``base_pipeline.py:720-783``)."""
        if item_id >= self.hparams['num_items']:
            raise ValueError(
                f'``item_id`` {item_id} is not in the model. Expected ID between ``0`` and '
                f'``{self.hparams["num_items"] - 1}``, not ``{item_id}``'
            )
        users = np.arange(self.hparams['num_users'])
        scores = self.forward(users, np.full_like(users, item_id))
        preds = pd.Series(scores)
        if sort_values:
            preds = preds.sort_values(ascending=False)
        if unseen_users_only:
            seen = [self.train_loader.mat.tocsr()[:, item_id].nonzero()[0]]
            if self.val_loader is not None:
                seen.append(self.val_loader.mat.tocsr()[:, item_id].nonzero()[0])
            preds = preds.drop(np.concatenate(seen))
        return preds

    def item_item_similarity(self, item_id: int) -> pd.Series:
        """Most-similar items by cosine over item embeddings
        (reference ``base_pipeline.py:785-823``)."""
        if item_id >= self.hparams['num_items']:
            raise ValueError(
                f'``item_id`` {item_id} is not in the model. Expected ID between ``0`` and '
                f'``{self.hparams["num_items"] - 1}``, not ``{item_id}``'
            )
        return self._embedding_similarity(self._get_item_embeddings(), item_id)

    def user_user_similarity(self, user_id: int) -> pd.Series:
        """Most-similar users by cosine over user embeddings
        (reference ``base_pipeline.py:825-864``)."""
        if user_id >= self.hparams['num_users']:
            raise ValueError(
                f'``user_id`` {user_id} is not in the model. Expected ID between ``0`` and '
                f'``{self.hparams["num_users"] - 1}``, not ``{user_id}``'
            )
        return self._embedding_similarity(self._get_user_embeddings(), user_id)

    @staticmethod
    def _embedding_similarity(embeddings: jnp.ndarray, idx: int) -> pd.Series:
        embeddings = embeddings.astype(jnp.float32)  # bf16 tables: norm in f32
        emb = embeddings / jnp.linalg.norm(embeddings, axis=1, keepdims=True)
        sims = emb[idx] @ emb.T
        return pd.Series(np.asarray(sims)).sort_values(ascending=False)

    def _get_item_embeddings(self) -> jnp.ndarray:
        raise NotImplementedError(
            '``_get_item_embeddings`` is not implemented in this subclass.'
        )

    def _get_user_embeddings(self) -> jnp.ndarray:
        raise NotImplementedError(
            '``_get_user_embeddings`` is not implemented in this subclass.'
        )

    # ------------------------------------------------------------ persistence

    def save_model(self, filename: Union[str, Path] = 'model.npz') -> None:
        """Persist ``{params, hparams}`` to one ``.npz`` — no trainer or
        optimizer state, matching the reference (``base_pipeline.py:880-900``)."""
        # npz has no bfloat16: store bf16 tables upcast to float32 (lossless)
        # and let load re-apply hparams['embeddings_dtype']
        arrays = {
            f'param:{k}': (np.asarray(v, dtype=np.float32)
                           if v.dtype == jnp.bfloat16 else np.asarray(v))
            for k, v in self.params.items()
        }
        if self.metadata_for_loss is not None:
            arrays.update({
                f'lossmeta:{k}': np.asarray(v) for k, v in self.metadata_for_loss.items()
            })
        arrays.update(self._extra_save_arrays())
        hparams_serializable = {
            k: v for k, v in self.hparams.items() if _json_safe(v)
        }
        hparams_serializable['_model_class'] = type(self).__name__
        arrays['hparams_json'] = np.frombuffer(
            json.dumps(hparams_serializable).encode(), dtype=np.uint8)
        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        np.savez(str(filename), **arrays)

    def _extra_save_arrays(self) -> Dict[str, np.ndarray]:
        """Hook for subclasses (hybrid models save metadata matrices too)."""
        return {}

    def _load_model_init_helper(self, load_model_path: Union[str, Path], **kwargs) -> None:
        """Restore hparams, rebuild the architecture, load weights
        (reference ``base_pipeline.py:245-257``)."""
        with np.load(str(load_model_path), allow_pickle=False) as loaded:
            hparams = json.loads(bytes(loaded['hparams_json']).decode())
            hparams.pop('_model_class', None)
            self.hparams.update(hparams)
            self.hparams['load_model_path'] = str(load_model_path)
            lossmeta = {
                k[len('lossmeta:'):]: np.array(loaded[k])
                for k in loaded.files if k.startswith('lossmeta:')
            }
            if lossmeta:
                self.metadata_for_loss = lossmeta
            self._restore_extra_arrays(loaded, **kwargs)
            self._setup_model(**kwargs)
            self.params = self._apply_embeddings_dtype({
                k[len('param:'):]: jnp.asarray(loaded[k])
                for k in loaded.files if k.startswith('param:')
            })

    def _restore_extra_arrays(self, loaded, **kwargs) -> None:
        """Hook for subclasses to restore extra saved arrays before setup."""


def _split_or_none(rng):
    if rng is None:
        return None, None
    return jax.random.split(rng)


def _call_loss(loss_function, *args, **kwargs):
    """Call custom losses that may not accept the full keyword surface
    (reference passes positionally, ``base_pipeline.py:626-634``)."""
    try:
        return loss_function(*args, **kwargs)
    except TypeError:
        kwargs.pop('sample_weights', None)
        return loss_function(*args, **kwargs)


def _as_array_dict(metadata):
    if metadata is None:
        return None
    return {k: np.asarray(v).reshape(-1) for k, v in metadata.items()}


def _json_safe(value) -> bool:
    try:
        json.dumps(value)
        return True
    except (TypeError, ValueError):
        return False
