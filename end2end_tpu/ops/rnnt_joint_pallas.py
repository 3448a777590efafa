"""Online-softmax fused transducer joint — Pallas TPU kernels.

Why this exists (chip-measured 2026-08-19): the chunked fused-joint path
(`rnnt_nll_fused`) is HBM-BOUND on the per-chunk logits buffer, not
MXU-bound — at B=8, T=400, U=80, V=32768, J=128 it runs ~460 ms/iter
regardless of `chunk_t` (32 vs 64: 463 vs 496 ms) and regardless of
bf16 vs f32 joint matmuls (463.1 vs 462.9 ms), because every chunk's
(N, tc, U+1, V) logits are written once and re-read ~2x in the forward
and again under recompute in the backward — ~100 GB of traffic for a
34 GB-equivalent logit volume, ~430 ms at v5e's 819 GB/s.  The MXU work
itself is ~11 ms.

The fix is the flash-attention treatment applied to the joint: the
logits never leave VMEM.

  * forward (`_fwd_kernel`): grid over row blocks of the flattened
    activation h = act(enc_proj + pred_proj) (R = N*T*(U+1) rows, J
    lanes); the FULL (J, V) output projection sits RESIDENT in VMEM as
    bf16 (8 MB at J=128, V=32768); an inner `fori_loop` walks V in
    512-lane tiles: one (rows, J) x (J, 512) MXU dot per tile with f32
    accumulation, an ONLINE max/sum-exp update, the blank column picked
    out of its (static) tile, and the label column reduced via a
    lane-id == target match.  Outputs per row: the two DP plane values
    + the softmax stats (max, log-sum-exp) — 4 floats instead of V.
  * backward: dL/dlogits = p * c - scatter is formed TILE BY TILE in
    registers from the recomputed logits.  `_dh_kernel` (grid over row
    blocks, W resident) accumulates dh = sum_tiles dtile @ W_tile^T;
    `_dw_kernel` (grid v-tiles outer x row blocks inner, the sequential-
    grid accumulator pattern of ctc_loss_pallas) accumulates
    dW_tile = sum_blocks h^T @ dtile and db_tile in VMEM scratch,
    emitting each tile once.  Total matmul volume is 5x the forward —
    ~55 ms of MXU at bf16 — in exchange for retiring ~100 GB of HBM
    traffic.

Numerics: W/h are stored bf16 for the MXU (f32 accumulation), so the
logits carry O(1e-2) absolute error — the same training-quality budget
as `fused_additive_joint(matmul_dtype='bfloat16')`, quantified in
tests/test_rnnt_fused.py::TestBF16Joint.  Within that budget the
softmax/exp use the native XLA/Mosaic lowerings (their ~1e-4 error is
noise against bf16 storage).  This path is therefore the TRAINING fast
path; the f32 `rnnt_nll_fused` XLA path remains the parity-grade
reference (fused == materialized <= 3e-4).

Vocabulary sharding: the online (max, sum) stats combine associatively,
so `rnnt_nll_fused_pallas_vocab_parallel` (end of this file) shards
W's V axis over the mesh and combines the stats with one pmax + one
psum (plus one psum pair for the raw owned blank/label columns) — the
same seam `vocab_parallel.rnnt_nll_fused_vocab_parallel` uses for the
f32 XLA path, now on the kernel fast path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rnnt_loss import rnnt_nll_from_planes
from .semiring import LOG0

_VT = 512                 # V-tile lanes per inner step
_RC = 512                 # activation rows per grid block
_NEG = -3.0e38            # running-max identity (finite, f32)


def _pad_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    return jax.default_backend() != "tpu"


def _fwd_kernel(v, blank, n_vt, h_ref, w_ref, b_ref, y_ref,
                bcol_ref, lcol_ref, m_ref, logs_ref):
    rc, j = h_ref.shape
    hb = h_ref[:].astype(jnp.bfloat16)
    y = y_ref[:]                                   # (rc, 1) i32
    tile_b = blank // _VT
    col_b = blank % _VT

    def tile(t, carry):
        m, s, xb, xy = carry
        acc = jax.lax.dot_general(
            hb, w_ref[:, pl.ds(t * _VT, _VT)],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + b_ref[0, pl.ds(t * _VT, _VT)][None, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rc, _VT), 1) + t * _VT
        acc = jnp.where(lane < v, acc, _NEG)       # mask V padding lanes
        tm = jnp.max(acc, axis=1, keepdims=True)
        m_new = jnp.maximum(m, tm)
        scale = jnp.exp(m - m_new)
        s = s * scale + jnp.sum(jnp.exp(acc - m_new), axis=1, keepdims=True)
        xb = jnp.where(t == tile_b, acc[:, col_b:col_b + 1], xb)
        xy = xy + jnp.sum(jnp.where(lane == y, acc, 0.0), axis=1,
                          keepdims=True)
        return m_new, s, xb, xy

    m0 = jnp.full((rc, 1), _NEG, jnp.float32)
    z0 = jnp.zeros((rc, 1), jnp.float32)
    m, s, xb, xy = jax.lax.fori_loop(0, n_vt, tile, (m0, z0, z0, z0))
    logs = jnp.log(s)
    bcol_ref[:] = (xb - m) - logs
    lcol_ref[:] = (xy - m) - logs
    m_ref[:] = m
    logs_ref[:] = logs


def _dh_kernel(v, blank, n_vt, h_ref, w_ref, b_ref, y_ref, m_ref, logs_ref,
               gb_ref, gl_ref, dh_ref):
    rc, j = h_ref.shape
    hb = h_ref[:].astype(jnp.bfloat16)
    y = y_ref[:]
    m = m_ref[:]
    logs = logs_ref[:]
    gb = gb_ref[:]                                 # (rc, 1), g-scaled
    gl = gl_ref[:]
    c = gb + gl                                    # p * c - scatter
    tile_b = blank // _VT
    col_b = blank % _VT
    oh_b = (jax.lax.broadcasted_iota(jnp.int32, (rc, _VT), 1)
            == col_b).astype(jnp.float32)

    def tile(t, dh):
        w_t = w_ref[:, pl.ds(t * _VT, _VT)]
        acc = jax.lax.dot_general(
            hb, w_t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + b_ref[0, pl.ds(t * _VT, _VT)][None, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rc, _VT), 1) + t * _VT
        p = jnp.where(lane < v, jnp.exp((acc - m) - logs), 0.0)
        # VJP of (b_pl, l_pl) wrt logits: d = gb*oh_blank + gl*oh_y - p*c
        d = -p * c
        d = jnp.where(t == tile_b, d + gb * oh_b, d)
        d = jnp.where(lane == y, d + gl, d)
        dh = dh + jax.lax.dot_general(
            d.astype(jnp.bfloat16), w_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dh

    dh = jax.lax.fori_loop(0, n_vt, tile,
                           jnp.zeros((rc, j), jnp.float32))
    dh_ref[:] = dh


def _dw_kernel(v, blank, n_rows_used, h_ref, y_ref, m_ref, logs_ref,
               gb_ref, gl_ref, w_ref, b_ref, dw_ref, db_ref,
               dw_scr, db_scr):
    # grid = (n_vt, n_rb): v-tile outer, row blocks inner; the scratch
    # accumulates over row blocks and flushes once per v-tile.
    t = pl.program_id(0)
    i = pl.program_id(1)
    rc, j = h_ref.shape

    @pl.when(i == 0)
    def _():
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    hb = h_ref[:].astype(jnp.bfloat16)
    y = y_ref[:]
    m = m_ref[:]
    logs = logs_ref[:]
    gb = gb_ref[:]
    gl = gl_ref[:]
    c = gb + gl
    tile_b = blank // _VT
    col_b = blank % _VT

    acc = jax.lax.dot_general(
        hb, w_ref[:],                              # (J, _VT) tile block
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + b_ref[0][None, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rc, _VT), 1) + t * _VT
    p = jnp.where(lane < v, jnp.exp((acc - m) - logs), 0.0)
    # padding rows (beyond the real R) carry gb = gl = 0 -> d = 0
    d = -p * c
    oh_b = (jax.lax.broadcasted_iota(jnp.int32, (rc, _VT), 1)
            == col_b).astype(jnp.float32)
    d = jnp.where(t == tile_b, d + gb * oh_b, d)
    d = jnp.where(lane == y, d + gl, d)
    dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
        hb, d.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_scr[:] = db_scr[:] + jnp.sum(d, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        dw_ref[:] = dw_scr[:]
        db_ref[:] = db_scr[:]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _joint_planes(h, w, b, y_flat, blank, v):
    out, _ = _joint_planes_fwd_impl(h, w, b, y_flat, blank, v)
    return out


def _joint_planes_fwd_impl(h, w, b, y_flat, blank, v):
    r, j = h.shape
    n_vt = _pad_up(v, _VT) // _VT
    v_pad = n_vt * _VT
    r_pad = _pad_up(r, _RC)
    h_p = jnp.pad(h, ((0, r_pad - r), (0, 0)))
    y_p = jnp.pad(y_flat.astype(jnp.int32), (0, r_pad - r))[:, None]
    w_p = jnp.pad(w, ((0, 0), (0, v_pad - v))).astype(jnp.bfloat16)
    b_p = jnp.pad(b, (0, v_pad - v))[None, :]
    n_rb = r_pad // _RC
    rspec = lambda: pl.BlockSpec((_RC, j), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    cspec = lambda: pl.BlockSpec((_RC, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    bcol, lcol, m, logs = pl.pallas_call(
        partial(_fwd_kernel, v, blank, n_vt),
        grid=(n_rb,),
        in_specs=[rspec(), full((j, v_pad)), full((1, v_pad)), cspec()],
        out_specs=[cspec(), cspec(), cspec(), cspec()],
        out_shape=[jax.ShapeDtypeStruct((r_pad, 1), jnp.float32)] * 4,
        interpret=_interpret(),
    )(h_p, w_p, b_p, y_p)
    res = (h_p, w_p, b_p, y_p, m, logs)
    return (bcol[:r, 0], lcol[:r, 0]), res


def _joint_planes_fwd(h, w, b, y_flat, blank, v):
    out, res = _joint_planes_fwd_impl(h, w, b, y_flat, blank, v)
    return out, res


def _joint_planes_bwd(blank, v, res, gouts):
    g_b, g_l = gouts                               # (R,) cotangents
    h_p, w_p, b_p, y_p, m, logs = res
    r_pad, j = h_p.shape
    v_pad = w_p.shape[1]
    n_vt = v_pad // _VT
    n_rb = r_pad // _RC
    r = g_b.shape[0]
    gb = jnp.pad(g_b, (0, r_pad - r))[:, None]
    gl = jnp.pad(g_l, (0, r_pad - r))[:, None]

    rspec = lambda: pl.BlockSpec((_RC, j), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    cspec = lambda: pl.BlockSpec((_RC, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    dh = pl.pallas_call(
        partial(_dh_kernel, v, blank, n_vt),
        grid=(n_rb,),
        in_specs=[rspec(), full((j, v_pad)), full((1, v_pad)), cspec(),
                  cspec(), cspec(), cspec(), cspec()],
        out_specs=rspec(),
        out_shape=jax.ShapeDtypeStruct((r_pad, j), jnp.float32),
        interpret=_interpret(),
    )(h_p, w_p, b_p, y_p, m, logs, gb, gl)

    rspec2 = lambda: pl.BlockSpec((_RC, j), lambda t, i: (i, 0),
                                  memory_space=pltpu.VMEM)
    cspec2 = lambda: pl.BlockSpec((_RC, 1), lambda t, i: (i, 0),
                                  memory_space=pltpu.VMEM)
    dw, db = pl.pallas_call(
        partial(_dw_kernel, v, blank, r),
        grid=(n_vt, n_rb),
        in_specs=[
            rspec2(), cspec2(), cspec2(), cspec2(), cspec2(), cspec2(),
            pl.BlockSpec((j, _VT), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _VT), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((j, _VT), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _VT), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((j, v_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((j, _VT), jnp.float32),
            pltpu.VMEM((1, _VT), jnp.float32),
        ],
        interpret=_interpret(),
    )(h_p, y_p, m, logs, gb, gl, w_p, b_p)
    return dh[:r], dw[:, :v], db[0, :v], None


_joint_planes.defvjp(_joint_planes_fwd, _joint_planes_bwd)


def rnnt_nll_fused_pallas(enc_proj, pred_proj, w_out, b_out, targets,
                          input_lengths, target_lengths, *, blank: int = 0,
                          activation=jnp.tanh,
                          implementation: str = "auto"):
    """Per-sample transducer NLL with the ONLINE-SOFTMAX fused joint —
    the training fast path for production vocabularies.

    Computes ``logits = W_out · act(enc_proj[t] + pred_proj[u]) + b_out``
    reduced straight to the DP planes inside one Pallas kernel (module
    docstring): the (N, T, U+1, V) logits never exist in HBM, in either
    pass, so the loss runs at MXU speed instead of logit-buffer HBM
    bandwidth.  bf16-storage/f32-accumulate numerics (same budget as
    `fused_additive_joint(matmul_dtype='bfloat16')`).  Differentiable in
    enc_proj, pred_proj, w_out, b_out.

    Args mirror `rnnt_nll_fused` with the standard additive joint made
    explicit (w_out (J, V), b_out (V,)); `implementation` routes the
    wavefront DP exactly as in `rnnt_nll`.
    """
    enc_proj = jnp.asarray(enc_proj, jnp.float32)
    pred_proj = jnp.asarray(pred_proj, jnp.float32)
    w_out = jnp.asarray(w_out, jnp.float32)
    b_out = jnp.asarray(b_out, jnp.float32)
    n, t_max, j = enc_proj.shape
    up = pred_proj.shape[1]
    v = w_out.shape[1]
    targets = jnp.asarray(targets, jnp.int32)
    if targets.ndim != 2 or targets.shape[1] + 1 > up:
        raise ValueError(
            f"targets must be (N, U) with U+1 <= {up}, got {targets.shape}")
    il = jnp.asarray(input_lengths, jnp.int32)
    ul = jnp.asarray(target_lengths, jnp.int32)

    h = activation(enc_proj[:, :, None, :] + pred_proj[:, None, :, :])
    y_ext = jnp.concatenate(
        [targets, jnp.zeros((n, up - targets.shape[1]), jnp.int32)], axis=1)
    y_full = jnp.broadcast_to(y_ext[:, None, :], (n, t_max, up))
    (b_pl, l_pl) = _joint_planes(h.reshape(n * t_max * up, j), w_out,
                                 b_out, y_full.reshape(-1), int(blank),
                                 int(v))
    b_pl = b_pl.reshape(n, t_max, up)
    l_pl = l_pl.reshape(n, t_max, up)
    return rnnt_nll_from_planes(b_pl, l_pl, il, ul,
                                implementation=implementation)


# ---------------------------------------------------------------------------
# Vocab-sharded (TP) online-softmax fused joint.
#
# The module-docstring seam, built: the online (max, sum-exp) stats combine
# associatively across vocabulary shards, so each device walks ONLY its own
# (J, V/D) slice of W_out and the global softmax is assembled with one pmax
# + one psum over ICI; the raw blank/label logit columns (each vocab id has
# exactly one owner) take one psum each.  The TP kernels differ from the
# single-device ones in two ways only:
#
#   * blank is a TRACED per-device relative id (axis_index-dependent), so it
#     is matched by a `lane == rel_blank` compare exactly like the label
#     column instead of a static tile pick — same element, bit-identical;
#   * the forward emits RAW (xb, xy) columns plus local (m, log s) instead
#     of normalized planes, because normalization must wait for the global
#     stats.  Unowned ids are encoded as -1 and match no lane, so their
#     psum contribution is exactly 0.
#
# The backward kernels take the GLOBAL (m, log s) row stats: the per-shard
# dlogits tile `d = gb·1[lane==blank] + gl·1[lane==y] − p·(gb+gl)` is formed
# in registers exactly as in the single-device kernels; dW/db stay
# shard-local (their columns are owned), and dh is returned as this shard's
# PARTIAL contribution — shard_map's transpose of the replicated activation
# input performs the final psum, so the bwd needs no collective of its own.
# ---------------------------------------------------------------------------


def _fwd_kernel_tp(v_loc, n_vt, h_ref, w_ref, b_ref, y_ref, yb_ref,
                   xb_ref, xy_ref, m_ref, logs_ref):
    rc, j = h_ref.shape
    hb = h_ref[:].astype(jnp.bfloat16)
    y = y_ref[:]                                   # (rc, 1) i32, -1 if unowned
    yb = yb_ref[:]                                 # (rc, 1) i32, -1 if unowned

    def tile(t, carry):
        m, s, xb, xy = carry
        acc = jax.lax.dot_general(
            hb, w_ref[:, pl.ds(t * _VT, _VT)],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + b_ref[0, pl.ds(t * _VT, _VT)][None, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rc, _VT), 1) + t * _VT
        acc = jnp.where(lane < v_loc, acc, _NEG)   # mask local-V padding
        tm = jnp.max(acc, axis=1, keepdims=True)
        m_new = jnp.maximum(m, tm)
        scale = jnp.exp(m - m_new)
        s = s * scale + jnp.sum(jnp.exp(acc - m_new), axis=1, keepdims=True)
        xb = xb + jnp.sum(jnp.where(lane == yb, acc, 0.0), axis=1,
                          keepdims=True)
        xy = xy + jnp.sum(jnp.where(lane == y, acc, 0.0), axis=1,
                          keepdims=True)
        return m_new, s, xb, xy

    m0 = jnp.full((rc, 1), _NEG, jnp.float32)
    z0 = jnp.zeros((rc, 1), jnp.float32)
    m, s, xb, xy = jax.lax.fori_loop(0, n_vt, tile, (m0, z0, z0, z0))
    xb_ref[:] = xb                                 # RAW logit, 0 if unowned
    xy_ref[:] = xy
    m_ref[:] = m                                   # LOCAL running max
    logs_ref[:] = jnp.log(s)                       # LOCAL log sum-exp @ m


def _dh_kernel_tp(v_loc, n_vt, h_ref, w_ref, b_ref, y_ref, yb_ref,
                  m_ref, logs_ref, gb_ref, gl_ref, dh_ref):
    rc, j = h_ref.shape
    hb = h_ref[:].astype(jnp.bfloat16)
    y = y_ref[:]
    yb = yb_ref[:]
    m = m_ref[:]                                   # GLOBAL stats
    logs = logs_ref[:]
    gb = gb_ref[:]
    gl = gl_ref[:]
    c = gb + gl

    def tile(t, dh):
        w_t = w_ref[:, pl.ds(t * _VT, _VT)]
        acc = jax.lax.dot_general(
            hb, w_t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + b_ref[0, pl.ds(t * _VT, _VT)][None, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rc, _VT), 1) + t * _VT
        p = jnp.where(lane < v_loc, jnp.exp((acc - m) - logs), 0.0)
        d = -p * c
        d = jnp.where(lane == yb, d + gb, d)
        d = jnp.where(lane == y, d + gl, d)
        dh = dh + jax.lax.dot_general(
            d.astype(jnp.bfloat16), w_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dh

    dh = jax.lax.fori_loop(0, n_vt, tile,
                           jnp.zeros((rc, j), jnp.float32))
    dh_ref[:] = dh                                 # PARTIAL: psum at boundary


def _dw_kernel_tp(v_loc, h_ref, y_ref, yb_ref, m_ref, logs_ref,
                  gb_ref, gl_ref, w_ref, b_ref, dw_ref, db_ref,
                  dw_scr, db_scr):
    t = pl.program_id(0)
    i = pl.program_id(1)
    rc, j = h_ref.shape

    @pl.when(i == 0)
    def _():
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    hb = h_ref[:].astype(jnp.bfloat16)
    y = y_ref[:]
    yb = yb_ref[:]
    m = m_ref[:]
    logs = logs_ref[:]
    gb = gb_ref[:]
    gl = gl_ref[:]
    c = gb + gl

    acc = jax.lax.dot_general(
        hb, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + b_ref[0][None, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rc, _VT), 1) + t * _VT
    p = jnp.where(lane < v_loc, jnp.exp((acc - m) - logs), 0.0)
    d = -p * c
    d = jnp.where(lane == yb, d + gb, d)
    d = jnp.where(lane == y, d + gl, d)
    dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
        hb, d.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_scr[:] = db_scr[:] + jnp.sum(d, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        dw_ref[:] = dw_scr[:]
        db_ref[:] = db_scr[:]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _joint_planes_tp(h, w, b, y_rel, yb_rel, v_loc, axis):
    out, _ = _joint_planes_tp_fwd_impl(h, w, b, y_rel, yb_rel, v_loc, axis)
    return out


def _joint_planes_tp_fwd_impl(h, w, b, y_rel, yb_rel, v_loc, axis):
    r, j = h.shape
    n_vt = _pad_up(v_loc, _VT) // _VT
    v_pad = n_vt * _VT
    r_pad = _pad_up(r, _RC)
    h_p = jnp.pad(h, ((0, r_pad - r), (0, 0)))
    y_p = jnp.pad(y_rel.astype(jnp.int32), (0, r_pad - r),
                  constant_values=-1)[:, None]
    yb_p = jnp.pad(yb_rel.astype(jnp.int32), (0, r_pad - r),
                   constant_values=-1)[:, None]
    w_p = jnp.pad(w, ((0, 0), (0, v_pad - v_loc))).astype(jnp.bfloat16)
    b_p = jnp.pad(b, (0, v_pad - v_loc))[None, :]
    n_rb = r_pad // _RC
    rspec = lambda: pl.BlockSpec((_RC, j), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    cspec = lambda: pl.BlockSpec((_RC, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    xb, xy, m_l, logs_l = pl.pallas_call(
        partial(_fwd_kernel_tp, v_loc, n_vt),
        grid=(n_rb,),
        in_specs=[rspec(), full((j, v_pad)), full((1, v_pad)), cspec(),
                  cspec()],
        out_specs=[cspec(), cspec(), cspec(), cspec()],
        out_shape=[jax.ShapeDtypeStruct((r_pad, 1), jnp.float32)] * 4,
        interpret=_interpret(),
    )(h_p, w_p, b_p, y_p, yb_p)
    # one pmax + one psum assemble the global softmax stats; one psum pair
    # the raw owned columns (exactly one owner each, others contribute 0)
    m = jax.lax.pmax(m_l, axis)
    s = jax.lax.psum(jnp.exp(logs_l + (m_l - m)), axis)
    logs = jnp.log(s)
    xb_g, xy_g = jax.lax.psum((xb, xy), axis)
    b_pl = (xb_g - m) - logs
    l_pl = (xy_g - m) - logs
    res = (h_p, w_p, b_p, y_p, yb_p, m, logs)
    return (b_pl[:r, 0], l_pl[:r, 0]), res


def _joint_planes_tp_fwd(h, w, b, y_rel, yb_rel, v_loc, axis):
    out, res = _joint_planes_tp_fwd_impl(h, w, b, y_rel, yb_rel, v_loc, axis)
    return out, res


def _joint_planes_tp_bwd(v_loc, axis, res, gouts):
    g_b, g_l = gouts
    # The forward's last op per plane is a psum; its transpose is a psum.
    # Doing it here puts this bwd in exactly the position the autodiff of
    # the XLA TP path's in-graph psum would be (shard_map's unchecked
    # transpose splits a replicated output's cotangent across the axis —
    # without this the grads come back divided by the axis size, verified
    # against the unsharded kernel in tests).
    g_b, g_l = jax.lax.psum((g_b, g_l), axis)
    h_p, w_p, b_p, y_p, yb_p, m, logs = res
    r_pad, j = h_p.shape
    v_pad = w_p.shape[1]
    n_vt = v_pad // _VT
    n_rb = r_pad // _RC
    r = g_b.shape[0]
    gb = jnp.pad(g_b, (0, r_pad - r))[:, None]
    gl = jnp.pad(g_l, (0, r_pad - r))[:, None]

    rspec = lambda: pl.BlockSpec((_RC, j), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    cspec = lambda: pl.BlockSpec((_RC, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    dh = pl.pallas_call(
        partial(_dh_kernel_tp, v_loc, n_vt),
        grid=(n_rb,),
        in_specs=[rspec(), full((j, v_pad)), full((1, v_pad)), cspec(),
                  cspec(), cspec(), cspec(), cspec(), cspec()],
        out_specs=rspec(),
        out_shape=jax.ShapeDtypeStruct((r_pad, j), jnp.float32),
        interpret=_interpret(),
    )(h_p, w_p, b_p, y_p, yb_p, m, logs, gb, gl)

    rspec2 = lambda: pl.BlockSpec((_RC, j), lambda t, i: (i, 0),
                                  memory_space=pltpu.VMEM)
    cspec2 = lambda: pl.BlockSpec((_RC, 1), lambda t, i: (i, 0),
                                  memory_space=pltpu.VMEM)
    dw, db = pl.pallas_call(
        partial(_dw_kernel_tp, v_loc),
        grid=(n_vt, n_rb),
        in_specs=[
            rspec2(), cspec2(), cspec2(), cspec2(), cspec2(), cspec2(),
            cspec2(),
            pl.BlockSpec((j, _VT), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _VT), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((j, _VT), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _VT), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((j, v_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((j, _VT), jnp.float32),
            pltpu.VMEM((1, _VT), jnp.float32),
        ],
        interpret=_interpret(),
    )(h_p, y_p, yb_p, m, logs, gb, gl, w_p, b_p)
    return dh[:r], dw[:, :v_loc], db[0, :v_loc], None, None


_joint_planes_tp.defvjp(_joint_planes_tp_fwd, _joint_planes_tp_bwd)


def rnnt_nll_fused_pallas_vocab_parallel(
        enc_proj, pred_proj, w_out, b_out, targets, input_lengths,
        target_lengths, mesh, *, blank: int = 0, activation=jnp.tanh,
        vocab_axis: str = "model", implementation: str = "auto"):
    """`rnnt_nll_fused_pallas` with the joint output projection (J, V)
    VOCAB-SHARDED over the mesh — TP for the transducer TRAINING fast path.

    Each device keeps only its (J, V/D) slice of `w_out` resident in VMEM
    and walks it with the online-softmax kernel; per activation row the
    devices exchange 4 floats (one pmax + three psums of (max, sum-exp,
    raw blank col, raw label col)) instead of V logits — the (N,T,U+1,V)
    joint never exists anywhere, per-device OR gathered.  Gradients flow
    to `enc_proj`/`pred_proj` (psum at the shard_map boundary) and to each
    device's OWN `w_out`/`b_out` shard with no further communication.

    Numerics: the per-shard tile walk is the single-device kernel's
    (bf16-storage/f32-accumulate budget); only the cross-tile (max,
    sum-exp) combine order differs, so sharded tracks unsharded to f32
    roundoff on top of the bf16 budget.  V must divide the mesh's
    `vocab_axis` size (pad `w_out` with columns whose `b_out` is a large
    negative number to round up).  The f32 parity-grade TP path is
    `parallel.vocab_parallel.rnnt_nll_fused_vocab_parallel`.
    """
    from jax.sharding import PartitionSpec as P

    enc_proj = jnp.asarray(enc_proj, jnp.float32)
    pred_proj = jnp.asarray(pred_proj, jnp.float32)
    w_out = jnp.asarray(w_out, jnp.float32)
    b_out = jnp.asarray(b_out, jnp.float32)
    n, t_max, j = enc_proj.shape
    up = pred_proj.shape[1]
    v = w_out.shape[1]
    nd = int(mesh.shape[vocab_axis])
    if v % nd:
        raise ValueError(f"V={v} must divide the '{vocab_axis}' axis size "
                         f"{nd} (pad w_out/b_out)")
    v_loc = v // nd
    targets = jnp.asarray(targets, jnp.int32)
    if targets.ndim != 2 or targets.shape[1] + 1 > up:
        raise ValueError(
            f"targets must be (N, U) with U+1 <= {up}, got {targets.shape}")
    il = jnp.asarray(input_lengths, jnp.int32)
    ul = jnp.asarray(target_lengths, jnp.int32)

    h = activation(enc_proj[:, :, None, :] + pred_proj[:, None, :, :])
    y_ext = jnp.concatenate(
        [targets, jnp.zeros((n, up - targets.shape[1]), jnp.int32)], axis=1)
    y_full = jnp.broadcast_to(y_ext[:, None, :], (n, t_max, up))

    def body(h_flat, y_flat, w_l, b_l):
        v_start = jax.lax.axis_index(vocab_axis).astype(jnp.int32) * v_loc
        rel_y = y_flat - v_start
        y_rel = jnp.where((rel_y >= 0) & (rel_y < v_loc), rel_y, -1)
        rel_b = jnp.int32(blank) - v_start
        yb = jnp.where((rel_b >= 0) & (rel_b < v_loc), rel_b, -1)
        yb_rel = jnp.broadcast_to(yb, y_flat.shape)
        return _joint_planes_tp(h_flat, w_l, b_l, y_rel, yb_rel,
                                int(v_loc), vocab_axis)

    b_pl, l_pl = partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(None, vocab_axis), P(vocab_axis)),
        out_specs=(P(), P()),
        check_vma=False,  # psum-assembled planes are replicated by math
    )(body)(h.reshape(n * t_max * up, j), y_full.reshape(-1), w_out, b_out)
    b_pl = b_pl.reshape(n, t_max, up)
    l_pl = l_pl.reshape(n, t_max, up)
    return rnnt_nll_from_planes(b_pl, l_pl, il, ul,
                                implementation=implementation)
