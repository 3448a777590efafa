"""Fused Pallas TPU kernels for the CTC forward-backward loss.

Rebuild target: the reference's C++ per-sample alpha/beta loops (SURVEY.md
§3.1 N1) — here as two Pallas kernels that keep the whole DP state resident
in VMEM and stream the (T, B, L) lattice through the sequential TPU grid:

  * grid = ceil(T/Tc) chunks; Pallas pipelines the HBM<->VMEM block DMAs
    automatically (double-buffered) while the kernel walks the chunk with a
    `fori_loop`.  The alpha row (B, Lp) and the int32 norm accumulator are
    VMEM scratch that persists across grid steps (TPU grids run sequentially
    on a core — the canonical Pallas scan pattern).
  * TWO alpha-storage modes (round-2 redesign).  Default: the forward
    kernel writes the (T, B, Lp) renormalized alpha tape and the backward
    kernel streams it back — cheapest when the kernels are VPU-bound (they
    are; see docs/perf_roofline.md) and the tape fits HBM comfortably.
    With `checkpoint_every > 0` (the long-context story, SURVEY.md §7) the
    forward kernel emits only ONE (B, Lp) checkpoint row per chunk — the
    carry at the chunk boundary — and the backward kernel re-runs the alpha
    recurrence for each chunk from its checkpoint into VMEM scratch before
    walking beta backwards through it: alpha memory O(T/Tc) instead of
    O(T).  The recompute is bit-exact: same ops, same order, same renorm
    carries (tested: results identical across modes and intervals).
  * The inner step is the same exact-renormalized log-semiring update as the
    XLA path (ctc_loss_xla.py), built on the ~1-ulp fastmath polynomials —
    identical numerics, so the two implementations cross-check bit-for-bit
    in the test suite up to op-order.
  * The backward kernel runs the grid in REVERSE (index_map flips the chunk
    order), carries beta in scratch, and emits the occupation probabilities
    gamma = exp(alpha + beta~ - logZ) directly — the fused-gradient form
    (SURVEY.md §4.2); the final `exp(lp) - posterior` combine stays in XLA,
    where the posterior is a one-hot MXU matmul fused with the combine
    (ctc_loss_xla._posterior_matmul), not a scatter.

Batch parallelism: the batch is the sublane axis of every vector op — the
reference's thread pool (SURVEY.md §3.1 N4) is just the VPU's width here.

Input blocks are read with implicit boundary padding (the grid need not
divide T; lane padding beyond L is masked in-kernel), so no padded copy of
the (T, B, L) lattice is ever materialized.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc_common import build_ctc_tables, gather_lp_ext
from .ctc_loss_xla import _posterior_to_vocab
from .fastmath import exp32, log1p32
from .semiring import LOG0, LOG0_THRESHOLD

_NORM_CLAMP = 512.0


def _round_to_half(x):
    return jnp.round(x * 2.0) * 0.5


def _logaddexp3_k(a, b, c):
    # Same form as fastmath.logaddexp3_acc: the max term's exp32 is exactly
    # 1.0, so summing all three and subtracting 1 is exact and tie-safe.
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, LOG0)
    u = (
        exp32(a - m_safe) + exp32(b - m_safe) + exp32(c - m_safe)
    ) - 1.0
    out = m_safe + log1p32(jnp.maximum(u, 0.0))
    return jnp.where(m > LOG0_THRESHOLD, out, LOG0)


def _shift_r1(x, lane):
    y = pltpu.roll(x, 1, 1)
    return jnp.where(lane == 0, LOG0, y)


def _shift_r2(x, lane):
    y = pltpu.roll(x, 2, 1)
    return jnp.where(lane < 2, LOG0, y)


def _shift_l1(x, lane, lp_lanes):
    y = pltpu.roll(x, lp_lanes - 1, 1)  # roll takes non-negative shifts
    return jnp.where(lane == lp_lanes - 1, LOG0, y)


def _shift_l2(x, lane, lp_lanes):
    y = pltpu.roll(x, lp_lanes - 2, 1)
    return jnp.where(lane >= lp_lanes - 2, LOG0, y)


def _alpha_step(prev, norm2, lp_t, t, il, skip2, init_mask, lane):
    """One exact-renormalized alpha update — shared verbatim by the forward
    kernel and the backward kernel's recompute phase (bit-exact by
    construction: same ops, same order)."""
    a1 = _shift_r1(prev, lane)
    a2 = jnp.where(skip2 > 0, _shift_r2(prev, lane), LOG0)
    upd_a = _logaddexp3_k(prev, a1, a2) + lp_t
    init_a = jnp.where(init_mask > 0, lp_t, LOG0)
    anew = jnp.where(t == 0, init_a, upd_a)
    anew = jnp.maximum(anew, LOG0)
    m = jnp.max(anew, axis=1, keepdims=True)
    m = _round_to_half(jnp.clip(m, -_NORM_CLAMP, _NORM_CLAMP))
    a_hat = jnp.maximum(anew - m, LOG0)
    upd = t < il  # (B, 1)
    a_next = jnp.where(upd, a_hat, prev)
    n_next = jnp.where(upd, norm2 + (m * 2.0).astype(jnp.int32), norm2)
    return a_next, n_next


def _fwd_kernel(
    L, use_tape,
    lp_ref, skip2_ref, init_mask_ref, end_mask_ref, il_ref,
    a_out_ref, n_out_ref, zhat_ref, normend_ref,
    a_scr, n_scr,
):
    # a_out/n_out: the full renormalized alpha/anorm TAPE blocks when
    # use_tape, else ONE checkpoint row per chunk (the carry at chunk start).
    i = pl.program_id(0)
    tc_len, b, lp_lanes = lp_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, lp_lanes), 1)

    @pl.when(i == 0)
    def _():
        a_scr[:] = jnp.full((b, lp_lanes), LOG0, jnp.float32)
        n_scr[:] = jnp.zeros((b, 1), jnp.int32)

    if not use_tape:
        a_out_ref[0] = a_scr[:]
        n_out_ref[0] = n_scr[:]

    il = il_ref[:]  # (B, 1) int32
    skip2 = skip2_ref[:]  # (B, Lp) f32 0/1
    init_mask = init_mask_ref[:]

    def body(tc, _):
        t = i * tc_len + tc
        lp_t = jnp.where(lane < L, lp_ref[tc], LOG0)  # mask OOB pad lanes
        a_next, n_next = _alpha_step(
            a_scr[:], n_scr[:], lp_t, t, il, skip2, init_mask, lane
        )
        a_scr[:] = a_next
        n_scr[:] = n_next
        if use_tape:
            a_out_ref[tc] = a_next
            n_out_ref[tc] = n_next
        return 0

    jax.lax.fori_loop(0, tc_len, body, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        a = a_scr[:]
        em = end_mask_ref[:] > 0
        am = jnp.where(em, a, LOG0)
        mx = jnp.max(am, axis=1, keepdims=True)
        mx_safe = jnp.maximum(mx, LOG0)
        u = jnp.sum(
            jnp.where(em & (am < mx_safe), exp32(am - mx_safe), 0.0),
            axis=1, keepdims=True,
        )
        n_at_max = jnp.sum(
            jnp.where(em & (am >= mx_safe), 1.0, 0.0), axis=1, keepdims=True
        )
        z = mx_safe + log1p32(u + (n_at_max - 1.0))
        zhat_ref[:] = jnp.where(mx > LOG0_THRESHOLD, z, LOG0)
        normend_ref[:] = n_scr[:]


def _bwd_kernel(
    L, use_tape,
    lp_ref, a_in_ref, n_in_ref, skip2_ref, skip2s_ref, init_mask_ref,
    end_mask_ref, il_ref, zhat_ref, normend_ref, valid_ref,
    gamma_ref,
    b_scr, bn_scr, lpnext_scr, *recompute_scr,
):
    # a_in/n_in: alpha/anorm tape blocks when use_tape, else the chunk's
    # checkpoint row; recompute_scr = (abuf, nbuf) only in checkpoint mode.
    i = pl.program_id(0)
    tc_len, b, lp_lanes = lp_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, lp_lanes), 1)

    @pl.when(i == 0)
    def _():
        b_scr[:] = jnp.full((b, lp_lanes), LOG0, jnp.float32)
        bn_scr[:] = jnp.zeros((b, 1), jnp.int32)
        lpnext_scr[:] = jnp.full((b, lp_lanes), LOG0, jnp.float32)

    il = il_ref[:]
    skip2 = skip2_ref[:]
    skip2s = skip2s_ref[:] > 0  # allowed s -> s+2 (shifted mask)
    init_mask = init_mask_ref[:]
    zhat = zhat_ref[:]  # (B, 1) f32
    normend = normend_ref[:]  # (B, 1) i32
    init_row = jnp.where(end_mask_ref[:] > 0, 0.0, LOG0)
    valid = valid_ref[:] > 0

    # The index_map reverses the chunk order: grid step i holds TIME chunk
    # n_chunks-1-i, so global time indices must use the time-chunk id.
    chunk_id = pl.num_programs(0) - 1 - i

    if use_tape:
        abuf_scr, nbuf_scr = a_in_ref, n_in_ref
    else:
        # phase 1: recompute this chunk's alpha rows from the checkpoint
        abuf_scr, nbuf_scr = recompute_scr

        def alpha_body(tc, carry):
            a_prev, n_prev = carry
            t = chunk_id * tc_len + tc
            lp_t = jnp.where(lane < L, lp_ref[tc], LOG0)
            a_next, n_next = _alpha_step(
                a_prev, n_prev, lp_t, t, il, skip2, init_mask, lane
            )
            abuf_scr[tc] = a_next
            nbuf_scr[tc] = n_next
            return a_next, n_next

        jax.lax.fori_loop(0, tc_len, alpha_body, (a_in_ref[0], n_in_ref[0]))

    # ---- phase 2: walk beta backwards through the chunk, emit gamma --------
    def body(j, _):
        tc = tc_len - 1 - j
        t = chunk_id * tc_len + tc
        lp_t = jnp.where(lane < L, lp_ref[tc], LOG0)
        prev_b = b_scr[:]
        lp_next = lpnext_scr[:]
        bsum = prev_b + lp_next
        b1 = _shift_l1(bsum, lane, lp_lanes)
        b2 = jnp.where(skip2s, _shift_l2(bsum, lane, lp_lanes), LOG0)
        bnew = jnp.maximum(_logaddexp3_k(bsum, b1, b2), LOG0)
        m = jnp.max(bnew, axis=1, keepdims=True)
        m = _round_to_half(jnp.clip(m, -_NORM_CLAMP, _NORM_CLAMP))
        b_hat_cand = jnp.maximum(bnew - m, LOG0)
        bn_cand = bn_scr[:] + (m * 2.0).astype(jnp.int32)

        is_init = t == (il - 1)  # (B, 1)
        is_pad = t >= il
        b_next = jnp.where(is_init, init_row, jnp.where(is_pad, LOG0, b_hat_cand))
        bn_next = jnp.where(is_init | is_pad, 0, bn_cand)
        b_scr[:] = b_next
        bn_scr[:] = bn_next
        lpnext_scr[:] = lp_t

        alpha_t = abuf_scr[tc]
        anorm_t = nbuf_scr[tc]  # (B, 1) i32
        shift = (anorm_t + bn_next - normend).astype(jnp.float32) * 0.5
        log_g = alpha_t + b_next + (shift - zhat)
        g = exp32(jnp.minimum(log_g, 0.0))
        g = jnp.where(valid & jnp.logical_not(is_pad) & (zhat > LOG0_THRESHOLD), g, 0.0)
        gamma_ref[tc] = g
        return 0

    jax.lax.fori_loop(0, tc_len, body, 0)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the 16MB VMEM


def fits_vmem(b_pad, lp_lanes):
    """Can the kernels run at this (padded batch, padded lanes) at all?"""
    row = b_pad * lp_lanes * 4
    # backward kernel at tc=1: 5 streamed rows (lp x2, gamma x2, abuf) +
    # ~12 resident rows (masks, scratch, checkpoints)
    return 17 * row <= _VMEM_BUDGET


def _pick_tc(t_max, b, lp_lanes, checkpoint_every=0):
    """Chunk length under the VMEM budget, on top of ~12 resident (B, Lp)
    rows (masks + carries).  Tape mode streams three double-buffered
    (tc, B, Lp) blocks through the backward kernel (lp, alpha in; gamma
    out); checkpoint mode streams two plus the single-buffered (tc, B, Lp)
    alpha-recompute scratch — 5-6 tc-rows either way."""
    row = b * lp_lanes * 4
    streams = 5 if checkpoint_every else 6
    tc = (_VMEM_BUDGET - 12 * row) // (streams * row)
    tc = max(1, min(256, tc, t_max))
    if checkpoint_every:
        tc = max(1, min(tc, int(checkpoint_every)))
    return tc


def _pad_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    return jax.default_backend() != "tpu"


def _prep(log_probs, targets, input_lengths, target_lengths, blank,
          checkpoint_every=0):
    """Shared prep: tables, emission matrix at padded lane width, masks."""
    t_max, n, num_classes = log_probs.shape
    tables = build_ctc_tables(targets, target_lengths, blank, num_classes)
    L = tables.ext_labels.shape[1]
    lp_lanes = _pad_up(L, 128)
    b_pad = _pad_up(n, 8)
    # (T, N, lp_lanes) directly — on TPU a one-hot MXU matmul, no pad copy
    lp_ext = gather_lp_ext(
        log_probs.astype(jnp.float32), tables, lanes=lp_lanes
    )
    if b_pad != n:
        lp_ext = jnp.pad(lp_ext, ((0, 0), (0, b_pad - n), (0, 0)),
                         constant_values=LOG0)
    tc = _pick_tc(t_max, b_pad, lp_lanes, checkpoint_every)
    n_chunks = -(-t_max // tc)
    use_tape = not checkpoint_every

    pos = jnp.arange(lp_lanes, dtype=jnp.int32)
    tl = jnp.zeros((b_pad,), jnp.int32).at[:n].set(target_lengths.astype(jnp.int32))
    il = jnp.zeros((b_pad,), jnp.int32).at[:n].set(input_lengths.astype(jnp.int32))
    skip2 = jnp.zeros((b_pad, lp_lanes), jnp.float32).at[:n, :L].set(
        tables.skip2.astype(jnp.float32)
    )
    valid = jnp.zeros((b_pad, lp_lanes), jnp.float32).at[:n, :L].set(
        tables.valid.astype(jnp.float32)
    )
    init_mask = (
        (pos[None, :] == 0) | ((pos[None, :] == 1) & (tl[:, None] > 0))
    ).astype(jnp.float32)
    end_mask = (
        (pos[None, :] == 2 * tl[:, None])
        | ((pos[None, :] == 2 * tl[:, None] - 1) & (tl[:, None] > 0))
    ).astype(jnp.float32)
    # Dead padding rows must not produce a finite z: kill their end mask.
    row_live = (jnp.arange(b_pad) < n) & (il > 0)
    end_mask = end_mask * row_live[:, None].astype(jnp.float32)
    meta = dict(
        t_max=t_max, n=n, L=L, lp_lanes=lp_lanes, b_pad=b_pad,
        tc=tc, n_chunks=n_chunks, use_tape=use_tape, tables=tables,
    )
    return lp_ext, skip2, valid, init_mask, end_mask, il, tl, meta


def _run_fwd(lp_ext, skip2, init_mask, end_mask, il, meta):
    tc, n_chunks = meta["tc"], meta["n_chunks"]
    b_pad, lp_lanes, L = meta["b_pad"], meta["lp_lanes"], meta["L"]
    t_max, use_tape = meta["t_max"], meta["use_tape"]
    vspec = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)
    fixed2 = lambda i: (0, 0)
    if use_tape:
        a_spec = vspec((tc, b_pad, lp_lanes), lambda i: (i, 0, 0))
        n_spec = vspec((tc, b_pad, 1), lambda i: (i, 0, 0))
        a_shape = jax.ShapeDtypeStruct((t_max, b_pad, lp_lanes), jnp.float32)
        n_shape = jax.ShapeDtypeStruct((t_max, b_pad, 1), jnp.int32)
    else:
        a_spec = vspec((1, b_pad, lp_lanes), lambda i: (i, 0, 0))
        n_spec = vspec((1, b_pad, 1), lambda i: (i, 0, 0))
        a_shape = jax.ShapeDtypeStruct((n_chunks, b_pad, lp_lanes), jnp.float32)
        n_shape = jax.ShapeDtypeStruct((n_chunks, b_pad, 1), jnp.int32)
    out = pl.pallas_call(
        partial(_fwd_kernel, L, use_tape),
        grid=(n_chunks,),
        in_specs=[
            vspec((tc, b_pad, lp_lanes), lambda i: (i, 0, 0)),
            vspec((b_pad, lp_lanes), fixed2),
            vspec((b_pad, lp_lanes), fixed2),
            vspec((b_pad, lp_lanes), fixed2),
            vspec((b_pad, 1), fixed2),
        ],
        out_specs=[
            a_spec,
            n_spec,
            vspec((b_pad, 1), fixed2),
            vspec((b_pad, 1), fixed2),
        ],
        out_shape=[
            a_shape,
            n_shape,
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, lp_lanes), jnp.float32),
            pltpu.VMEM((b_pad, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(lp_ext, skip2, init_mask, end_mask, il[:, None])
    return out  # (alpha tape | checkpoints), (anorm | ck), z_hat, norm_end2


def _run_bwd(lp_ext, ck_a, ck_n, skip2, valid, init_mask, end_mask, il,
             z_hat, norm_end2, meta):
    tc, n_chunks = meta["tc"], meta["n_chunks"]
    b_pad, lp_lanes, L, t_max = (
        meta["b_pad"], meta["lp_lanes"], meta["L"], meta["t_max"]
    )
    use_tape = meta["use_tape"]
    rev3 = lambda i: (n_chunks - 1 - i, 0, 0)
    fixed2 = lambda i: (0, 0)
    vspec = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)
    if use_tape:
        a_spec = vspec((tc, b_pad, lp_lanes), rev3)
        n_spec = vspec((tc, b_pad, 1), rev3)
        scratch = []
    else:
        a_spec = vspec((1, b_pad, lp_lanes), rev3)
        n_spec = vspec((1, b_pad, 1), rev3)
        scratch = [
            pltpu.VMEM((tc, b_pad, lp_lanes), jnp.float32),
            pltpu.VMEM((tc, b_pad, 1), jnp.int32),
        ]
    # Shifted skip mask: transition s -> s+2 allowed iff skip2[s+2].
    skip2s = jnp.pad(skip2, ((0, 0), (0, 2)))[:, 2:]
    gamma = pl.pallas_call(
        partial(_bwd_kernel, L, use_tape),
        grid=(n_chunks,),
        in_specs=[
            vspec((tc, b_pad, lp_lanes), rev3),
            a_spec,
            n_spec,
            vspec((b_pad, lp_lanes), fixed2),
            vspec((b_pad, lp_lanes), fixed2),
            vspec((b_pad, lp_lanes), fixed2),
            vspec((b_pad, lp_lanes), fixed2),
            vspec((b_pad, 1), fixed2),
            vspec((b_pad, 1), fixed2),
            vspec((b_pad, 1), fixed2),
            vspec((b_pad, lp_lanes), fixed2),
        ],
        out_specs=vspec((tc, b_pad, lp_lanes), rev3),
        out_shape=jax.ShapeDtypeStruct((t_max, b_pad, lp_lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b_pad, lp_lanes), jnp.float32),
            pltpu.VMEM((b_pad, 1), jnp.int32),
            pltpu.VMEM((b_pad, lp_lanes), jnp.float32),
        ] + scratch,
        interpret=_interpret(),
    )(
        lp_ext, ck_a, ck_n, skip2, skip2s, init_mask, end_mask, il[:, None],
        z_hat, norm_end2, valid,
    )
    return gamma


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_nll_pallas(log_probs, targets, input_lengths, target_lengths, blank=0,
                   checkpoint_every=0):
    """Per-sample CTC NLL via the fused Pallas kernels (float32 only).

    Same contract as ctc_nll_xla; used automatically on TPU via
    implementation='auto' (ctc_loss.py).  checkpoint_every > 0 caps the
    chunk length (= alpha checkpoint interval); by default it is chosen to
    fill the VMEM budget."""
    nll, _ = _nll_fwd_impl(
        log_probs, targets, input_lengths, target_lengths, blank,
        checkpoint_every,
    )
    return nll


def _nll_fwd_impl(log_probs, targets, input_lengths, target_lengths, blank,
                  checkpoint_every):
    lp_ext, skip2, valid, init_mask, end_mask, il, tl, meta = _prep(
        log_probs, targets, input_lengths, target_lengths, blank,
        checkpoint_every,
    )
    ck_a, ck_n, z_hat, norm_end2 = _run_fwd(
        lp_ext, skip2, init_mask, end_mask, il, meta
    )
    n = meta["n"]
    finite = z_hat[:n, 0] > LOG0_THRESHOLD
    log_z = z_hat[:n, 0] + norm_end2[:n, 0].astype(jnp.float32) * 0.5
    nll = jnp.where(finite, -log_z, jnp.inf).astype(log_probs.dtype)
    res = (lp_ext, ck_a, ck_n, skip2, valid, init_mask, end_mask, il,
           z_hat, norm_end2, meta)
    return nll, res


def _nll_fwd(log_probs, targets, input_lengths, target_lengths, blank,
             checkpoint_every):
    nll, res = _nll_fwd_impl(
        log_probs, targets, input_lengths, target_lengths, blank,
        checkpoint_every,
    )
    return nll, (log_probs, targets, input_lengths, target_lengths, res)


def _nll_bwd(blank, checkpoint_every, saved, g):
    log_probs, targets, input_lengths, target_lengths, res = saved
    (lp_ext, ck_a, ck_n, skip2, valid, init_mask, end_mask, il,
     z_hat, norm_end2, meta) = res
    z_safe = jnp.where(z_hat > LOG0_THRESHOLD, z_hat, 0.0)
    gamma_pad = _run_bwd(
        lp_ext, ck_a, ck_n, skip2, valid, init_mask, end_mask, il,
        z_safe, norm_end2, meta,
    )
    t_max, n, L = meta["t_max"], meta["n"], meta["L"]
    gamma = gamma_pad[:t_max, :n, :L]
    num_classes = log_probs.shape[-1]
    post = _posterior_to_vocab(gamma, targets, blank, num_classes)
    t_mask = (
        jnp.arange(t_max, dtype=jnp.int32)[:, None]
        < input_lengths[None, :].astype(jnp.int32)
    )
    grad = (jnp.exp(log_probs) - post) * t_mask[:, :, None] * g[None, :, None]
    f0 = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return (
        grad.astype(log_probs.dtype),
        f0(targets),
        f0(input_lengths),
        f0(target_lengths),
    )


ctc_nll_pallas.defvjp(_nll_fwd, _nll_bwd)
