"""Pallas TPU kernels for the RNN-T (transducer) wavefront DP.

Round-3 measured the XLA `lax.scan` transducer loss at 41 M lattice
cells/s on the chip — T+U (=480 at the bench shape) sequential tiny-step
dispatches over a skewed-plane working set of ~2.5 MB.  That is the same
class gap the CTC loss closed with `ctc_loss_pallas.py`: the per-step
math is a handful of VPU ops on one (B, U+1) row; the cost is XLA loop
overhead, not arithmetic.  These kernels apply the house recipe:

  * the skewed blank/label planes (D, B, Up) stream through the
    sequential TPU grid in diagonal chunks (Pallas double-buffers the
    HBM<->VMEM block DMAs) while a `fori_loop` walks the chunk;
  * the alpha row (B, Up-lanes) and its exact half-grid renorm offset
    live in VMEM scratch that persists across grid steps;
  * the backward runs the grid in REVERSE (index_map flips chunk order)
    and fuses the posterior assembly into the beta walk: at step d the
    carry IS beta(diag d+1), exactly the successor the (t, u) posteriors
    need, so `i_blank`/`i_label` are emitted directly and the beta tape
    never touches HBM;
  * every op is the same fastmath primitive in the same order as the
    XLA twin (`rnnt_loss._alpha_scan` / `_plane_posteriors`); the DP
    state evolution (beta carries, renorm offsets, NLL) reproduces the
    scan bit-for-bit, and the emitted posteriors match to <= 1 ulp —
    the only residual freedom is FMA contraction inside the exp32
    polynomial, which XLA may fuse differently in separately compiled
    programs (verified element-by-element in f32: both results bracket
    the f64 value; tests/test_rnnt_pallas.py pins the <=2-ulp bound).
    This is the `ctc_loss_pallas`/`ctc_loss_xla` twin convention
    applied to the transducer family.

NOT here (tried and rejected, chip-measured 2026-08-19): a Pallas
single-pass plane-prep kernel for the from-logits vocabulary reduction.
Mosaic ran every variant of it (lane-reduce and MXU-dot sums, block rows
256-1024) at 2.9-3.7 ms on the (8, 400, 81, 256) bench shape, while
XLA's own fusion of max + exp32 + sum + select-gather — while ALSO
materializing the exp residual the fused backward reuses — runs at
1.07 ms.  The prep therefore stays in XLA (rnnt_loss._logits_forward)
and only the sequential wavefront DP, where XLA pays per-step loop
overhead, is kernelized.

The lane axis is U+1 padded to 128; the batch rides the sublanes —
the reference's per-sample threading (SURVEY.md §3.1 N4) dissolved into
the VPU exactly as in the CTC kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fastmath import exp32, logaddexp2_acc, round_to_half
from .semiring import LOG0, LOG0_THRESHOLD

_VMEM_BUDGET = 12 * 1024 * 1024


def _pad_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    return jax.default_backend() != "tpu"


def wavefront_pallas_supported(n, up):
    """Can the wavefront kernels run at this (batch, U+1)?  One diagonal
    row must fit VMEM alongside ~10 streamed/resident copies."""
    row = _pad_up(n, 8) * _pad_up(up, 128) * 4
    return 14 * row <= _VMEM_BUDGET


def _pick_dc(rows, b_pad, lanes, fat_streams):
    """Diagonal-chunk length: fat_streams double-buffered (dc, B, Lp)
    blocks + ~6 resident rows under the VMEM budget."""
    row = b_pad * lanes * 4
    dc = (_VMEM_BUDGET - 6 * row) // (2 * fat_streams * row)
    return max(1, min(256, dc, rows))


def _shift_r1(x, lane):
    """lane u <- x[u-1], LOG0 into lane 0 (the XLA twin's right-pad)."""
    y = pltpu.roll(x, 1, 1)
    return jnp.where(lane == 0, LOG0, y)


def _shift_l1(x, lane, lanes):
    """lane u <- x[u+1], LOG0 into the last lane (left-pad twin)."""
    y = pltpu.roll(x, lanes - 1, 1)
    return jnp.where(lane == lanes - 1, LOG0, y)


def _renorm(a):
    """_diag_renorm twin: per-sample max on the exact half grid."""
    m = jnp.max(a, axis=1, keepdims=True)
    m = jnp.where(m > LOG0_THRESHOLD, m, 0.0)
    return round_to_half(m)


# ---------------------------------------------------------------------------
# Alpha wavefront
# ---------------------------------------------------------------------------


def _alpha_kernel(up, skb_ref, skl_ref, tape_ref, rcum_ref, a_scr, r_scr):
    i = pl.program_id(0)
    dc, b, lanes = skb_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, lanes), 1)

    @pl.when(i == 0)
    def _():
        a_scr[:] = jnp.where(lane == 0, 0.0, LOG0).astype(jnp.float32)
        r_scr[:] = jnp.zeros((b, 1), jnp.float32)

    def body(j, _):
        a_prev = a_scr[:]
        # alpha(d) from alpha(d-1) and the diag d-1 planes (this block row):
        # blank keeps u, label shifts u-1 -> u.  Identical op order to
        # rnnt_loss._alpha_scan's step (pads become LOG0-filled rolls).
        blank_in = a_prev + skb_ref[j]
        lab_in = _shift_r1(a_prev, lane) + _shift_r1(skl_ref[j], lane)
        a = logaddexp2_acc(blank_in, lab_in)
        # Padding lanes (>= up) would inherit lane up-1's shifted value;
        # the XLA twin's width is exactly up, so kill them before the
        # renorm max.
        a = jnp.where(lane < up, a, LOG0)
        m = _renorm(a)
        a = jnp.maximum(a - m, LOG0)
        r = r_scr[:] + m
        a_scr[:] = a
        r_scr[:] = r
        tape_ref[j] = a
        rcum_ref[j] = r
        return 0

    # Boundary-block padding rows only ever run AFTER every real diagonal
    # (the grid ascends), so the contaminated carry is never read again
    # and their tape writes fall outside the output and are dropped.
    jax.lax.fori_loop(0, dc, body, 0)


def alpha_scan_pallas(sk_b, sk_l):
    """Drop-in twin of `rnnt_loss._alpha_scan`: (D, N, Up) skewed planes ->
    (tape (D, N, Up), rcum (D, N)), bit-identical to the XLA scan."""
    d_total, n, up = sk_b.shape
    lanes = _pad_up(up, 128)
    b_pad = _pad_up(n, 8)
    pad3 = ((0, 0), (0, b_pad - n), (0, lanes - up))
    skb_p = jnp.pad(sk_b, pad3, constant_values=LOG0)
    skl_p = jnp.pad(sk_l, pad3, constant_values=LOG0)

    lane0 = jnp.arange(lanes)[None, :] == 0
    a0 = jnp.where(lane0, 0.0, LOG0).astype(jnp.float32)
    a0 = jnp.broadcast_to(a0, (b_pad, lanes))
    r0 = jnp.zeros((b_pad, 1), jnp.float32)

    d_rows = d_total - 1
    if d_rows == 0:
        tape = a0[None]
        rcum = r0[None]
    else:
        dc = _pick_dc(d_rows, b_pad, lanes, fat_streams=3)
        n_chunks = -(-d_rows // dc)
        vspec = lambda shape: pl.BlockSpec(
            shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        tape_r, rcum_r = pl.pallas_call(
            partial(_alpha_kernel, up),
            grid=(n_chunks,),
            in_specs=[vspec((dc, b_pad, lanes)), vspec((dc, b_pad, lanes))],
            out_specs=[vspec((dc, b_pad, lanes)), vspec((dc, b_pad, 1))],
            out_shape=[
                jax.ShapeDtypeStruct((d_rows, b_pad, lanes), jnp.float32),
                jax.ShapeDtypeStruct((d_rows, b_pad, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((b_pad, lanes), jnp.float32),
                pltpu.VMEM((b_pad, 1), jnp.float32),
            ],
            interpret=_interpret(),
        )(skb_p, skl_p)
        tape = jnp.concatenate([a0[None], tape_r], axis=0)
        rcum = jnp.concatenate([r0[None], rcum_r], axis=0)
    return tape[:, :n, :up], rcum[:, :n, 0]


# ---------------------------------------------------------------------------
# Beta wavefront fused with posterior assembly
# ---------------------------------------------------------------------------


def _post_kernel(up, d_total,
                 skb_ref, skl_ref, at_ref, ar_ref, dterm_ref, uterm_ref,
                 zs_ref, zo_ref, ib_ref, ilab_ref, b_scr, r_scr):
    i = pl.program_id(0)
    dc, b, lanes = skb_ref.shape
    chunk_id = pl.num_programs(0) - 1 - i
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, lanes), 1)

    @pl.when(i == 0)
    def _():
        b_scr[:] = jnp.full((b, lanes), LOG0, jnp.float32)
        r_scr[:] = jnp.zeros((b, 1), jnp.float32)

    dterm = dterm_ref[:]                       # (B, 1) i32
    uterm = uterm_ref[:]
    zs = zs_ref[:]                             # (B, 1) f32
    zo = zo_ref[:]

    def body(j, _):
        jj = dc - 1 - j
        d = chunk_id * dc + jj
        in_range = d < d_total                 # boundary-block padding rows
        skb = skb_ref[jj]
        skl = skl_ref[jj]
        b_next = b_scr[:]                      # beta(diag d+1), renormalized
        r_next = r_scr[:]                      # its exact half-grid offset
        is_term = (d == dterm) & (lane == uterm)

        # ---- posterior emission for diag d (rnnt_loss._plane_posteriors
        # assembly, op order preserved) --------------------------------
        off = ar_ref[jj] + r_next - zo
        off_term = ar_ref[jj] - zo
        small = at_ref[jj] - zs
        lg_blank = (small + skb + jnp.where(is_term, 0.0, b_next)
                    + jnp.where(is_term, off_term, off))
        lab_succ = _shift_l1(b_next, lane, lanes)
        lg_label = small + skl + lab_succ + off
        i_blank = jnp.where(lg_blank > LOG0_THRESHOLD,
                            exp32(jnp.minimum(lg_blank, 0.0)), 0.0)
        i_label = jnp.where(lg_label > LOG0_THRESHOLD,
                            exp32(jnp.minimum(lg_label, 0.0)), 0.0)
        ib_ref[jj] = jnp.where(in_range, i_blank, 0.0)
        ilab_ref[jj] = jnp.where(in_range, i_label, 0.0)

        # ---- beta update diag d+1 -> d (twin of the reverse scan step) --
        blank_in = skb + b_next
        lab_in = skl + lab_succ
        bta = logaddexp2_acc(blank_in, lab_in)
        term = jnp.where(is_term, skb - r_next, LOG0)
        bta = logaddexp2_acc(bta, term)
        bta = jnp.where(lane < up, bta, LOG0)
        m = _renorm(bta)
        bta = jnp.maximum(bta - m, LOG0)
        r_new = r_next + m
        b_scr[:] = jnp.where(in_range, bta, b_next)
        r_scr[:] = jnp.where(in_range, r_new, r_next)
        return 0

    jax.lax.fori_loop(0, dc, body, 0)


def posteriors_pallas(sk_b, sk_l, a_tape, a_rcum, il, ul, z_small, z_off):
    """Fused beta scan + posterior assembly: returns SKEWED
    (i_blank, i_label) node posteriors (D, N, Up), bit-identical to the
    XLA `_plane_posteriors` assembly on the same inputs.  Beta never
    touches HBM — the carry at step d IS the successor diagonal d+1."""
    d_total, n, up = sk_b.shape
    lanes = _pad_up(up, 128)
    b_pad = _pad_up(n, 8)
    pad3 = ((0, 0), (0, b_pad - n), (0, lanes - up))
    padb = (0, b_pad - n)
    skb_p = jnp.pad(sk_b, pad3, constant_values=LOG0)
    skl_p = jnp.pad(sk_l, pad3, constant_values=LOG0)
    at_p = jnp.pad(a_tape, pad3, constant_values=LOG0)
    ar_p = jnp.pad(a_rcum, ((0, 0), padb))[:, :, None]
    il_p = jnp.pad(jnp.asarray(il, jnp.int32), padb)
    ul_p = jnp.pad(jnp.asarray(ul, jnp.int32), padb)
    dterm = (il_p - 1 + ul_p)[:, None]          # padding rows: -1, never hit
    uterm = ul_p[:, None]
    zs = jnp.pad(z_small, padb)[:, None]
    zo = jnp.pad(z_off, padb)[:, None]

    dc = _pick_dc(d_total, b_pad, lanes, fat_streams=5)
    n_chunks = -(-d_total // dc)
    rev3 = lambda i: (n_chunks - 1 - i, 0, 0)
    fixed = lambda i: (0, 0)
    vspec = lambda shape, imap: pl.BlockSpec(
        shape, imap, memory_space=pltpu.VMEM)
    ib, ilab = pl.pallas_call(
        partial(_post_kernel, up, d_total),
        grid=(n_chunks,),
        in_specs=[
            vspec((dc, b_pad, lanes), rev3),
            vspec((dc, b_pad, lanes), rev3),
            vspec((dc, b_pad, lanes), rev3),
            vspec((dc, b_pad, 1), rev3),
            vspec((b_pad, 1), fixed),
            vspec((b_pad, 1), fixed),
            vspec((b_pad, 1), fixed),
            vspec((b_pad, 1), fixed),
        ],
        out_specs=[
            vspec((dc, b_pad, lanes), rev3),
            vspec((dc, b_pad, lanes), rev3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_total, b_pad, lanes), jnp.float32),
            jax.ShapeDtypeStruct((d_total, b_pad, lanes), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, lanes), jnp.float32),
            pltpu.VMEM((b_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(skb_p, skl_p, at_p, ar_p, dterm, uterm, zs, zo)
    return ib[:, :n, :up], ilab[:, :n, :up]


