"""Fused whole-epoch matrix-factorization training kernel (Mosaic/Pallas).

SURVEY §7 step 7 ("fused lookup + dot + loss" training kernel), sized by the
round-1 profile: after the padded sampler landed, the remaining epoch time at
the gate config is gather/scatter-bound — XLA's dynamic row gathers for
user/pos/K-negative embedding rows and the scatter-add backward run at
~200M rows/s, leaving the MXU idle.  The reference's counterpart hot loop is
the ``neg_preds`` repeat/flatten forward
(``/root/reference/collie/model/base/base_pipeline.py:618-623``) plus torch
autograd + optimizer stepping.

Design (TPU-first, not a translation):

* The whole epoch is ONE ``pallas_call`` with ``grid=(num_steps,)``.  Both
  embedding tables, the item-bias row, and the Adam moments are **VMEM
  resident** for the entire epoch — they live in output windows with constant
  index maps (initialized from the input windows at grid step 0; Mosaic does
  not pre-fill aliased output windows), so state stays on chip across grid
  steps and writes back to HBM once, after the last step.  Input/output
  aliasing makes the HBM update in-place.
* Per step, a batch block ``[B]`` of user/pos ids and ``[K, B]`` negatives is
  streamed in.  Embedding "gathers" are one-hot matmuls on the **MXU**
  (``onehot[C, U] @ table[U, D]``) — no HBM gathers at all — and the
  backward scatter-add is the transposed matmul.
* Scores for the loss come from one all-item matmul per chunk
  (``user_rows @ item_table^T -> [C, I]``); positive and sampled-negative
  scores are masked VPU reductions over that score block.  The hardest
  negative (adaptive losses) is an explicit first-max scan over ``K`` to
  match ``jnp.argmax`` tie-breaking in ``ops/losses.py:112-120``.
* The optimizer update happens **inside the kernel**: optax-exact
  ``scale_by_adam`` (shared count, bias correction, ``eps`` outside the
  sqrt) for the embedding tables and plain SGD for the item biases,
  replicating ``training/optimizers.py::build_transform``'s chain.  User
  biases provably receive zero gradient from pairwise ranking losses (the
  user's bias cancels in ``pos - neg``), so they pass through untouched —
  exactly what the XLA path computes for them.

Numerics: positive scores are read out of the same f32 matmul products the
XLA path computes, so forward values match to float addition-order; the
scatter matmuls sum duplicate rows in a deterministic order that can differ
from XLA's scatter-add order by O(1e-6) — covered by tolerance tests in
``tests/test_fused_epoch.py``.

Supported envelope (checked by ``scan_engine._fused_epoch_config``):
``MatrixFactorizationModel`` with ``dropout_p == 0``, the default
dual-optimizer layout (adam embeddings + sgd biases; torch-coupled weight
decay runs in-kernel), single device, and tables + moments + score blocks
within the VMEM budget; implicit data with hinge / adaptive-hinge / bpr / adaptive-bpr /
warp loss (no ``y_range``; partial-credit item metadata supported in-kernel),
or explicit data with mse / mae loss (``y_range`` supported —
:func:`fused_mf_explicit_epoch`).  Anything else falls back to the XLA scan
engine.
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8

# VMEM plan: input + output copies of tables/moments, grad accumulators, and
# ~5 [C, I] f32 score/grad blocks must fit on chip with headroom for Mosaic's
# own buffers (v5e VMEM is 128 MiB; stay well clear for double-buffering).
_VMEM_BUDGET_BYTES = 32 * 2**20


def _chunk_size(batch_size: int) -> int:
    """Largest power-of-two chunk <= the cap dividing the batch (falls back
    to the whole batch when it is an odd size — still correct, just more
    VMEM).  Default cap 128 since round 5: the current libtpu enforces a
    16 MiB scoped-vmem stack limit and the c=256 blocking overflowed it by
    ~0.3-0.8 MiB at ML-100K shapes (fresh compiles failed; earlier rounds
    rode cached binaries).  ``COLLIE_TPU_FUSED_CHUNK`` overrides."""
    import os
    cap = int(os.environ.get('COLLIE_TPU_FUSED_CHUNK', '128'))
    for c in (256, 128, 64, 32, 16, 8):
        if c <= cap and batch_size % c == 0:
            return c
    return batch_size


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def fused_vmem_bytes(num_users: int, num_items: int, dim: int,
                     batch_size: int, meta_fields: int = 0) -> int:
    """Rough VMEM footprint of the kernel (lane-padded f32)."""
    d = _lane_pad(dim)
    # emb + mu + nu, x2: the input windows stay VMEM-resident alongside the
    # output windows they initialize at grid step 0
    tables = 6 * (num_users + num_items) * d * 4
    grads = (num_users + num_items) * d * 4             # accumulators
    c = _chunk_size(batch_size)
    blocks = 5 * c * _lane_pad(num_items) * 4           # s_all, dS, one-hots
    # user-side chunk blocks: iota_u (i32), uo (f32), + a transposed-matmul
    # operand — user-heavy shapes must not pass the check and then blow VMEM
    # at Mosaic compile time (there is no fallback past this gate)
    blocks += 3 * c * _lane_pad(num_users) * 4
    # partial-credit metadata: the epoch-resident [F, I] table plus each
    # field's where-masked [C, I] temporary inside ideal_for
    blocks += meta_fields * (8 + 2 * c) * _lane_pad(num_items) * 4
    bias = 2 * 8 * (_lane_pad(num_items) + _lane_pad(num_users)) * 4
    return tables + grads + blocks + bias


def _copy_state_windows(pairs, cnt_in, count_ref):
    """Initialize the persistent output windows from the input windows at
    grid step 0 (Mosaic does not pre-fill aliased output windows)."""
    @pl.when(pl.program_id(0) == 0)
    def _init_state():
        for dst, src in pairs:
            dst[:] = src[:]
        count_ref[0, 0] = cnt_in[0, 0]


def _adam_update_tables(table_refs, bc1, bc2, lr_e, wd_emb):
    """Optax-exact ``scale_by_adam`` (shared count, bias correction, ``eps``
    outside the sqrt) with torch-coupled decay added BEFORE the moments —
    replicating ``training/optimizers.py::build_transform``'s chain.  The
    ONE copy of the optimizer numerics both fused kernels trace."""
    for emb_ref, mu_ref, nu_ref, g_ref in table_refs:
        g = g_ref[:]
        if wd_emb:
            g = g + wd_emb * emb_ref[:]
        mu = ADAM_B1 * mu_ref[:] + (1.0 - ADAM_B1) * g
        nu = ADAM_B2 * nu_ref[:] + (1.0 - ADAM_B2) * g * g
        mu_ref[:] = mu
        nu_ref[:] = nu
        emb_ref[:] = emb_ref[:] - lr_e * (mu / bc1) / (jnp.sqrt(nu / bc2)
                                                       + ADAM_EPS)


def _sgd_update_biases(bias_refs, lr_b, wd_bias):
    """Plain sgd with torch-coupled decay for the bias rows."""
    for bias_ref, gb_ref in bias_refs:
        gb = gb_ref[:]
        if wd_bias:
            gb = gb + wd_bias * bias_ref[:]
        bias_ref[:] = bias_ref[:] - lr_b * gb


def _epoch_kernel(users_ref, pos_ref, negs_ref, mask_ref,     # per-step blocks
                  meta_ref,                                   # [F, I] i32 VMEM
                  denoms_ref, bc1_ref, bc2_ref,               # [1, S] SMEM
                  lr_emb_ref, lr_bias_ref,                    # SMEM scalars
                  ue_in, ie_in, ib_in, muu_in, nuu_in, mui_in, nui_in,
                  cnt_in,
                  user_emb_ref, item_emb_ref, item_bias_ref,  # state (out)
                  mu_u_ref, nu_u_ref, mu_i_ref, nu_i_ref, count_ref,
                  loss_ref,                                   # [1, S] SMEM
                  du_ref, di_ref, db_ref,                     # VMEM scratch
                  *, U, I, D, B, K, C, adaptive, loss_kind, meta_weights,
                  wd_emb, wd_bias):
    f32 = jnp.float32

    # Output windows start UNINITIALIZED on Mosaic (input_output_aliases
    # aliases the HBM buffers, not the VMEM windows) — copy the initial state
    # in at the first grid step; the windows persist across steps (constant
    # index maps) and write back to HBM once, after the last step.
    _copy_state_windows(
        ((user_emb_ref, ue_in), (item_emb_ref, ie_in),
         (item_bias_ref, ib_in), (mu_u_ref, muu_in), (nu_u_ref, nuu_in),
         (mu_i_ref, mui_in), (nu_i_ref, nui_in)), cnt_in, count_ref)

    du_ref[:] = jnp.zeros((U, D), f32)
    di_ref[:] = jnp.zeros((I, D), f32)
    db_ref[:] = jnp.zeros((1, I), f32)

    # mask sums are precomputed host-side: Mosaic cannot lower a 1D->scalar
    # vector reduction ("Offset change"), and an SMEM read is free anyway
    denom = denoms_ref[0, pl.program_id(0)]

    n_chunks = B // C

    def chunk_body(c, loss_row):
        sl = pl.ds(c * C, C)
        u = users_ref[0, 0, sl]                                # [C] i32
        p = pos_ref[0, 0, sl]
        w = mask_ref[0, 0, sl]

        # HIGHEST precision everywhere: the MXU otherwise rounds f32 operands
        # to bf16, and 1e-3-level score noise both degrades training and
        # breaks parity with the scan engine's elementwise-dot scores
        hi = jax.lax.Precision.HIGHEST
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (C, U), 1)
        uo = (iota_u == u[:, None]).astype(f32)                # [C, U]
        ug = jnp.dot(uo, user_emb_ref[:], preferred_element_type=f32,
                     precision=hi)                             # [C, D]
        s_all = jax.lax.dot_general(
            ug, item_emb_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=hi)          # [C, I]
        s_b = s_all + item_bias_ref[:]                         # + [1, I]

        iota_i = jax.lax.broadcasted_iota(jnp.int32, (C, I), 1)
        pos_oh = iota_i == p[:, None]
        pos_score = jnp.sum(jnp.where(pos_oh, s_b, 0.0), axis=1)   # [C]

        if meta_weights:
            # "partial credit" ideal score gap (ops/losses.py::
            # ideal_difference_from_metadata, reference metadata_utils.py:
            # 6-71): gather each field's category id for the positive once
            # per chunk via the same one-hot mask-sum the scores use
            pos_meta = [jnp.sum(jnp.where(pos_oh, meta_ref[f:f + 1, :], 0),
                                axis=1) for f in range(len(meta_weights))]

        def ideal_for(neg_oh):
            """Ideal pos-neg gap vs the negatives selected by ``neg_oh``:
            1 minus the summed weights of matching metadata fields."""
            if not meta_weights:
                return 1.0
            ideal = jnp.ones((C,), f32)
            for f, wgt in enumerate(meta_weights):
                neg_meta = jnp.sum(jnp.where(neg_oh, meta_ref[f:f + 1, :], 0),
                                   axis=1)
                ideal = ideal - wgt * (pos_meta[f] == neg_meta).astype(f32)
            return ideal

        def pair_loss_grad(d, ideal):
            """Per-pair composite loss element + score-gradient magnitude.

            ``l`` is the elementwise loss; ``g = w*(1+2l)*dfac/denom`` is
            ``dLoss/d(neg_score) = -dLoss/d(pos_score)`` under the composite
            ``(Σl+Σl²)/Σw`` reduction (``ops/losses.py:69-78``).  ``ideal``
            shifts the margin/target but never the derivative factor."""
            if loss_kind == 'hinge':                          # hinge.py:8-85
                l = jnp.maximum(ideal - d, 0.0)
                dfac = (l > 0.0).astype(f32)
            else:                                             # bpr.py:8-89
                s = jax.nn.sigmoid(d)
                l = ideal - s
                dfac = s * (1.0 - s)
            g = w * (1.0 + 2.0 * l) * dfac / denom
            return l, g

        dS = jnp.where(pos_oh, 1.0, 0.0) * 0.0                 # [C, I] zeros
        if loss_kind == 'warp':
            # collie's modified WARP (ops/losses.py::warp_loss, reference
            # warp.py:8-154): the FIRST violating negative (hinge > 0, in
            # sample order) carries the loss, weighted by
            # log(num_items / tries).  The weights are per-k Python
            # constants — no in-kernel log — and the selection state is one
            # found-flag pass over K, mirroring warp_loss_sparse's B-row
            # backward (gradient reaches only the selected negative).
            import math
            found = jnp.zeros((C,), jnp.bool_)
            first_item = jnp.zeros((C,), jnp.int32)
            first_hinge = jnp.zeros((C,), f32)
            weight = jnp.zeros((C,), f32)
            for k in range(K):
                nk = negs_ref[0, 0, pl.ds(k * B + c * C, C)]
                oh = iota_i == nk[:, None]
                sk = jnp.sum(jnp.where(oh, s_b, 0.0), axis=1)
                hk = ideal_for(oh) - pos_score + sk
                take = jnp.logical_and(hk > 0.0, jnp.logical_not(found))
                first_item = jnp.where(take, nk, first_item)
                first_hinge = jnp.where(take, hk, first_hinge)
                weight = jnp.where(take, f32(math.log(I / (k + 1))), weight)
                found = jnp.logical_or(found, hk > 0.0)
            # rows with no violation: weight == 0 zeroes value and gradient,
            # matching the sentinel should_count_loss mask (warp.py:122-131)
            l = weight * first_hinge
            loss_row = loss_row + ((l + l * l) * w).reshape(1, C)
            g = w * (1.0 + 2.0 * l) * weight / denom
            dS = dS - jnp.where(pos_oh, g[:, None], 0.0)
            dS = dS + jnp.where(iota_i == first_item[:, None],
                                g[:, None], 0.0)
        elif adaptive:
            # One pass over K: track the hardest negative's *item id* (ties:
            # first max wins, matching jnp.argmax in ops/losses.py:112-120),
            # then scatter the gradient with a single one-hot — the item id
            # fully determines dS, so no second pass over K is needed.
            best = jnp.full((C,), -1e30, f32)
            best_item = jnp.zeros((C,), jnp.int32)
            for k in range(K):
                nk = negs_ref[0, 0, pl.ds(k * B + c * C, C)]
                oh = iota_i == nk[:, None]
                sk = jnp.sum(jnp.where(oh, s_b, 0.0), axis=1)
                better = sk > best
                best = jnp.where(better, sk, best)
                best_item = jnp.where(better, nk, best_item)
            # metadata credit applies to the SELECTED negative (selection is
            # by raw score — reference hinge.py:157-164)
            best_oh = iota_i == best_item[:, None]
            l, g = pair_loss_grad(pos_score - best, ideal_for(best_oh))
            loss_row = loss_row + ((l + l * l) * w).reshape(1, C)
            dS = dS - jnp.where(pos_oh, g[:, None], 0.0)
            dS = dS + jnp.where(best_oh, g[:, None], 0.0)
        else:
            for k in range(K):
                nk = negs_ref[0, 0, pl.ds(k * B + c * C, C)]
                oh = iota_i == nk[:, None]
                sk = jnp.sum(jnp.where(oh, s_b, 0.0), axis=1)
                l, g = pair_loss_grad(pos_score - sk, ideal_for(oh))
                loss_row = loss_row + ((l + l * l) * w).reshape(1, C)
                dS = dS - jnp.where(pos_oh, g[:, None], 0.0)
                dS = dS + jnp.where(oh, g[:, None], 0.0)

        db_ref[:] = db_ref[:] + jnp.sum(dS, axis=0, keepdims=True)
        dug = jnp.dot(dS, item_emb_ref[:], preferred_element_type=f32,
                      precision=hi)                            # [C, D]
        di_ref[:] = di_ref[:] + jax.lax.dot_general(
            dS, ug, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hi)
        du_ref[:] = du_ref[:] + jax.lax.dot_general(
            uo, dug, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hi)
        return loss_row

    loss_row = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                 jnp.zeros((1, C), f32))
    # scalar-ize via an MXU dot: [1,C]x[C,1] -> [1,1] (Mosaic has no
    # vector->scalar reduction lowering for this layout)
    loss_tot = jnp.dot(loss_row, jnp.ones((C, 1), f32),
                       preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)
    loss_ref[0, pl.program_id(0)] = loss_tot[0, 0] / denom

    # ---- optax-exact optimizer update, on chip -------------------------
    count_ref[0, 0] = count_ref[0, 0] + 1
    # Adam bias corrections 1-beta^t are precomputed host-side per grid step
    # (Mosaic has no scalar powf lowering) and read from SMEM
    _adam_update_tables(((user_emb_ref, mu_u_ref, nu_u_ref, du_ref),
                         (item_emb_ref, mu_i_ref, nu_i_ref, di_ref)),
                        bc1_ref[0, pl.program_id(0)],
                        bc2_ref[0, pl.program_id(0)],
                        lr_emb_ref[0, 0], wd_emb)
    _sgd_update_biases(((item_bias_ref, db_ref),),
                       lr_bias_ref[0, 0], wd_bias)


def _explicit_epoch_kernel(users_ref, items_ref, ratings_ref, mask_ref,
                           denoms_ref, bc1_ref, bc2_ref,       # [1, S] SMEM
                           lr_emb_ref, lr_bias_ref,            # SMEM scalars
                           ue_in, ie_in, ub_in, ib_in,
                           muu_in, nuu_in, mui_in, nui_in, cnt_in,
                           user_emb_ref, item_emb_ref,
                           user_bias_ref, item_bias_ref,       # state (out)
                           mu_u_ref, nu_u_ref, mu_i_ref, nu_i_ref, count_ref,
                           loss_ref,                           # [1, S] SMEM
                           du_ref, di_ref, dbu_ref, dbi_ref,   # VMEM scratch
                           *, U, I, D, B, C, loss_kind, y_range,
                           wd_emb, wd_bias):
    """Explicit-feedback (MSE/MAE) twin of :func:`_epoch_kernel`.

    Differences from the ranking kernel: no negatives, the USER bias carries
    gradient (pairwise losses cancel it; pointwise losses do not), the
    optional ``y_range`` sigmoid rescale (``models/matrix_factorization.py::
    _apply_y_range``) applies with its chain factor, and the reduction is the
    plain weighted mean of ``ops/losses.py::mse_loss``/``mae_loss`` — not the
    ranking losses' composite ``(Σl+Σl²)/B``."""
    f32 = jnp.float32

    _copy_state_windows(
        ((user_emb_ref, ue_in), (item_emb_ref, ie_in),
         (user_bias_ref, ub_in), (item_bias_ref, ib_in),
         (mu_u_ref, muu_in), (nu_u_ref, nuu_in),
         (mu_i_ref, mui_in), (nu_i_ref, nui_in)), cnt_in, count_ref)

    du_ref[:] = jnp.zeros((U, D), f32)
    di_ref[:] = jnp.zeros((I, D), f32)
    dbu_ref[:] = jnp.zeros((1, U), f32)
    dbi_ref[:] = jnp.zeros((1, I), f32)

    denom = denoms_ref[0, pl.program_id(0)]
    n_chunks = B // C

    def chunk_body(c, loss_row):
        sl = pl.ds(c * C, C)
        u = users_ref[0, 0, sl]                                # [C] i32
        it = items_ref[0, 0, sl]
        r = ratings_ref[0, 0, sl]
        w = mask_ref[0, 0, sl]

        hi = jax.lax.Precision.HIGHEST
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (C, U), 1)
        uo = (iota_u == u[:, None]).astype(f32)                # [C, U]
        ug = jnp.dot(uo, user_emb_ref[:], preferred_element_type=f32,
                     precision=hi)                             # [C, D]
        s_all = jax.lax.dot_general(
            ug, item_emb_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=hi)          # [C, I]
        s_b = s_all + item_bias_ref[:]                         # + [1, I]

        iota_i = jax.lax.broadcasted_iota(jnp.int32, (C, I), 1)
        pos_oh = iota_i == it[:, None]
        raw_items = jnp.sum(jnp.where(pos_oh, s_b, 0.0), axis=1)   # [C]
        ubg = jax.lax.dot_general(
            uo, user_bias_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=hi)          # [C, 1]
        raw = raw_items + ubg[:, 0]

        if y_range is not None:
            lo, span = y_range[0], y_range[1] - y_range[0]
            sig = jax.nn.sigmoid(raw)
            pred = lo + span * sig
            chain = span * sig * (1.0 - sig)
        else:
            pred = raw
            chain = 1.0

        err = pred - r
        if loss_kind == 'mse':
            l = err * err
            dl = 2.0 * err
        else:                                                  # 'mae'
            l = jnp.abs(err)
            dl = jnp.sign(err)
        loss_row = loss_row + (l * w).reshape(1, C)
        g = w * dl * chain / denom                             # [C]

        dS = jnp.where(pos_oh, g[:, None], 0.0)                # [C, I]
        dbi_ref[:] = dbi_ref[:] + jnp.sum(dS, axis=0, keepdims=True)
        dbu_ref[:] = dbu_ref[:] + jax.lax.dot_general(
            g.reshape(1, C), uo, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hi)          # [1, U]
        dug = jnp.dot(dS, item_emb_ref[:], preferred_element_type=f32,
                      precision=hi)                            # [C, D]
        di_ref[:] = di_ref[:] + jax.lax.dot_general(
            dS, ug, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hi)
        du_ref[:] = du_ref[:] + jax.lax.dot_general(
            uo, dug, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hi)
        return loss_row

    loss_row = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                 jnp.zeros((1, C), f32))
    loss_tot = jnp.dot(loss_row, jnp.ones((C, 1), f32),
                       preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)
    loss_ref[0, pl.program_id(0)] = loss_tot[0, 0] / denom

    # ---- optax-exact optimizer update, on chip -------------------------
    count_ref[0, 0] = count_ref[0, 0] + 1
    _adam_update_tables(((user_emb_ref, mu_u_ref, nu_u_ref, du_ref),
                         (item_emb_ref, mu_i_ref, nu_i_ref, di_ref)),
                        bc1_ref[0, pl.program_id(0)],
                        bc2_ref[0, pl.program_id(0)],
                        lr_emb_ref[0, 0], wd_emb)
    _sgd_update_biases(((user_bias_ref, dbu_ref), (item_bias_ref, dbi_ref)),
                       lr_bias_ref[0, 0], wd_bias)


@functools.partial(jax.jit, static_argnames=('loss_kind', 'y_range',
                                             'wd_emb', 'wd_bias',
                                             'interpret'))
def fused_mf_explicit_epoch(user_emb: jnp.ndarray,    # [U, D] f32
                            item_emb: jnp.ndarray,    # [I, D] f32
                            user_bias: jnp.ndarray,   # [U] f32
                            item_bias: jnp.ndarray,   # [I] f32
                            mu_u: jnp.ndarray, nu_u: jnp.ndarray,
                            mu_i: jnp.ndarray, nu_i: jnp.ndarray,
                            count: jnp.ndarray,       # [] i32
                            users: jnp.ndarray,       # [S, B] i32
                            items: jnp.ndarray,       # [S, B] i32
                            ratings: jnp.ndarray,     # [S, B] f32
                            mask: jnp.ndarray,        # [S, B] f32
                            lr_emb: jnp.ndarray, lr_bias: jnp.ndarray,
                            *, loss_kind: str = 'mse',
                            y_range=None,
                            wd_emb: float = 0.0, wd_bias: float = 0.0,
                            interpret: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Run one explicit-feedback training epoch; returns ``(user_emb,
    item_emb, user_bias, item_bias, mu_u, nu_u, mu_i, nu_i, count,
    losses[S])``."""
    U, D = user_emb.shape
    I = item_emb.shape[0]
    S, B = users.shape
    C = _chunk_size(B)

    users3 = users.reshape(S, 1, B)
    items3 = items.reshape(S, 1, B)
    ratings3 = ratings.astype(jnp.float32).reshape(S, 1, B)
    mask3 = mask.reshape(S, 1, B)
    ubias_row = user_bias.reshape(1, U)
    ibias_row = item_bias.reshape(1, I)
    count2 = count.reshape(1, 1).astype(jnp.int32)
    denoms = jnp.maximum(mask.sum(axis=1), 1.0).astype(jnp.float32)\
        .reshape(1, S)
    t = count.astype(jnp.float32) + 1.0 + jnp.arange(S, dtype=jnp.float32)
    bc1s = (1.0 - ADAM_B1 ** t).reshape(1, S)
    bc2s = (1.0 - ADAM_B2 ** t).reshape(1, S)
    lr_e = jnp.asarray(lr_emb, jnp.float32).reshape(1, 1)
    lr_b = jnp.asarray(lr_bias, jnp.float32).reshape(1, 1)

    def full(shape):
        return pl.BlockSpec(shape, lambda s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    assert loss_kind in ('mse', 'mae'), loss_kind
    kernel = functools.partial(_explicit_epoch_kernel, U=U, I=I, D=D, B=B,
                               C=C, loss_kind=loss_kind, y_range=y_range,
                               wd_emb=wd_emb, wd_bias=wd_bias)

    out = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 1, B), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            full((U, D)), full((I, D)), full((1, U)), full((1, I)),
            full((U, D)), full((U, D)), full((I, D)), full((I, D)),
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            full((U, D)), full((I, D)), full((1, U)), full((1, I)),
            full((U, D)), full((U, D)), full((I, D)), full((I, D)),
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), lambda s: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((U, D), jnp.float32),
            jax.ShapeDtypeStruct((I, D), jnp.float32),
            jax.ShapeDtypeStruct((1, U), jnp.float32),
            jax.ShapeDtypeStruct((1, I), jnp.float32),
            jax.ShapeDtypeStruct((U, D), jnp.float32),
            jax.ShapeDtypeStruct((U, D), jnp.float32),
            jax.ShapeDtypeStruct((I, D), jnp.float32),
            jax.ShapeDtypeStruct((I, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
        ],
        input_output_aliases={9: 0, 10: 1, 11: 2, 12: 3, 13: 4, 14: 5,
                              15: 6, 16: 7, 17: 8},
        scratch_shapes=[
            pltpu.VMEM((U, D), jnp.float32),
            pltpu.VMEM((I, D), jnp.float32),
            pltpu.VMEM((1, U), jnp.float32),
            pltpu.VMEM((1, I), jnp.float32),
        ],
        interpret=interpret,
    )(users3, items3, ratings3, mask3, denoms, bc1s, bc2s, lr_e, lr_b,
      user_emb, item_emb, ubias_row, ibias_row, mu_u, nu_u, mu_i, nu_i,
      count2)

    (new_ue, new_ie, new_ub, new_ib,
     new_mu_u, new_nu_u, new_mu_i, new_nu_i, new_count2, losses) = out
    return (new_ue, new_ie, new_ub.reshape(U), new_ib.reshape(I),
            new_mu_u, new_nu_u, new_mu_i, new_nu_i,
            new_count2.reshape(()).astype(count.dtype), losses.reshape(S))


@functools.partial(jax.jit, static_argnames=('K', 'adaptive', 'loss_kind',
                                             'meta_weights', 'wd_emb',
                                             'wd_bias', 'interpret'))
def fused_mf_epoch(user_emb: jnp.ndarray,      # [U, D] f32
                   item_emb: jnp.ndarray,      # [I, D] f32
                   item_bias: jnp.ndarray,     # [I] f32
                   mu_u: jnp.ndarray, nu_u: jnp.ndarray,
                   mu_i: jnp.ndarray, nu_i: jnp.ndarray,
                   count: jnp.ndarray,         # [] i32 (optax adam count)
                   users: jnp.ndarray,         # [S, B] i32
                   pos: jnp.ndarray,           # [S, B] i32
                   negs: jnp.ndarray,          # [S, B, K] i32
                   mask: jnp.ndarray,          # [S, B] f32
                   lr_emb: jnp.ndarray, lr_bias: jnp.ndarray,
                   meta_rows: Optional[jnp.ndarray] = None,  # [F, I] int
                   *, K: int, adaptive: bool, loss_kind: str = 'hinge',
                   meta_weights: Tuple[float, ...] = (),
                   wd_emb: float = 0.0, wd_bias: float = 0.0,
                   interpret: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Run one training epoch; returns ``(user_emb, item_emb, item_bias,
    mu_u, nu_u, mu_i, nu_i, count, losses[S])``.

    ``meta_rows``/``meta_weights``: per-item categorical metadata fields and
    their partial-credit weights (``ideal_difference_from_metadata``); when
    empty, the ideal score gap is the constant 1.0."""
    U, D = user_emb.shape
    I = item_emb.shape[0]
    S, B = users.shape
    C = _chunk_size(B)
    if meta_rows is None or not meta_weights:
        meta_rows = jnp.zeros((1, I), jnp.int32)
        meta_weights = ()
    meta_rows = meta_rows.astype(jnp.int32)
    F = meta_rows.shape[0]

    # [S, 1, K*B], k-major: per-step blocks stream with an (1, 1, K*B)
    # BlockSpec whose sublane dim equals the full axis (Mosaic alignment rule)
    negs_t = jnp.transpose(negs, (0, 2, 1)).reshape(S, 1, K * B)
    users3 = users.reshape(S, 1, B)
    pos3 = pos.reshape(S, 1, B)
    mask3 = mask.reshape(S, 1, B)
    bias_row = item_bias.reshape(1, I)
    count2 = count.reshape(1, 1).astype(jnp.int32)
    denoms = jnp.maximum(mask.sum(axis=1), 1.0).astype(jnp.float32)\
        .reshape(1, S)
    # Adam bias corrections for steps count+1 .. count+S, precomputed (no
    # powf inside Mosaic); matches optax.scale_by_adam's bias_correction
    t = count.astype(jnp.float32) + 1.0 + jnp.arange(S, dtype=jnp.float32)
    bc1s = (1.0 - ADAM_B1 ** t).reshape(1, S)
    bc2s = (1.0 - ADAM_B2 ** t).reshape(1, S)
    lr_e = jnp.asarray(lr_emb, jnp.float32).reshape(1, 1)
    lr_b = jnp.asarray(lr_bias, jnp.float32).reshape(1, 1)

    def full(shape):
        return pl.BlockSpec(shape, lambda s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    assert loss_kind in ('hinge', 'bpr', 'warp'), loss_kind
    kernel = functools.partial(_epoch_kernel, U=U, I=I, D=D, B=B, K=K, C=C,
                               adaptive=adaptive, loss_kind=loss_kind,
                               meta_weights=meta_weights,
                               wd_emb=wd_emb, wd_bias=wd_bias)

    out = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 1, B), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K * B), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            full((F, I)),
            pl.BlockSpec((1, S), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            full((U, D)), full((I, D)), full((1, I)),
            full((U, D)), full((U, D)), full((I, D)), full((I, D)),
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            full((U, D)), full((I, D)), full((1, I)),
            full((U, D)), full((U, D)), full((I, D)), full((I, D)),
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), lambda s: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((U, D), jnp.float32),
            jax.ShapeDtypeStruct((I, D), jnp.float32),
            jax.ShapeDtypeStruct((1, I), jnp.float32),
            jax.ShapeDtypeStruct((U, D), jnp.float32),
            jax.ShapeDtypeStruct((U, D), jnp.float32),
            jax.ShapeDtypeStruct((I, D), jnp.float32),
            jax.ShapeDtypeStruct((I, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
        ],
        input_output_aliases={10: 0, 11: 1, 12: 2, 13: 3, 14: 4, 15: 5,
                              16: 6, 17: 7},
        scratch_shapes=[
            pltpu.VMEM((U, D), jnp.float32),
            pltpu.VMEM((I, D), jnp.float32),
            pltpu.VMEM((1, I), jnp.float32),
        ],
        interpret=interpret,
    )(users3, pos3, negs_t, mask3, meta_rows, denoms, bc1s, bc2s, lr_e, lr_b,
      user_emb, item_emb, bias_row, mu_u, nu_u, mu_i, nu_i, count2)

    (new_user_emb, new_item_emb, new_bias_row,
     new_mu_u, new_nu_u, new_mu_i, new_nu_i, new_count2, losses) = out
    return (new_user_emb, new_item_emb, new_bias_row.reshape(I),
            new_mu_u, new_nu_u, new_mu_i, new_nu_i,
            new_count2.reshape(()).astype(count.dtype), losses.reshape(S))
