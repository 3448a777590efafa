"""RNN-T (transducer) loss — TPU-native diagonal-wavefront scan.

Beyond the reference's CTC surface (SURVEY.md §1): the transducer is the
other standard end-to-end ASR loss, included because its lattice DP maps
onto the same TPU machinery this repo builds for CTC.  Math and oracle:
``utils/rnnt_reference.py`` (Graves 2012, arXiv:1211.3711).

TPU-first design
----------------
The (t, u) lattice has dependencies (t-1, u) and (t, u-1) — both on the
PREVIOUS anti-diagonal d-1 = t+u-1.  So unlike CTC (strictly sequential in
T), the transducer DP admits a wavefront scan over d = t+u with a SINGLE
(N, U+1)-row carry and purely elementwise per-step work:

  * the blank/label log-prob planes (N, T, U+1) are SKEWED once up front
    (sk[d, u] = plane[d-u, u], one flat gather) so every scan step reads
    one contiguous diagonal row — no per-step gathers;
  * alpha and beta are both wavefront scans of T+U steps of one
    ``logaddexp2`` each (vs CTC's T steps of logaddexp3 over 2S+1 lanes);
  * per-step renormalization on the exact half-integer grid
    (``round_to_half``, same trick as the CTC kernels) keeps f32 carries in
    a tight band over thousands of diagonals;
  * the gradient is assembled WITHOUT a scan: in skewed space the three
    posterior ingredients of node (t, u) — alpha[t,u], beta[t+1,u],
    beta[t,u+1] — live on diagonals d and d+1, so the full grad is two
    elementwise planes + one unskew gather + a 2-nonzero scatter into V
    (one-hot multiply, XLA-fused).  This is the transducer analog of CTC's
    fused ``exp(lp) - posterior`` backward (SURVEY.md §4.2).

Only the blank/label PLANES (N, T, U+1) flow through the scans; the (V,)
softmax axis is touched exactly twice (one gather in, one fused scatter
out), so the DP cost is independent of vocabulary size.

Semantics: per-sample NLL of the target sequence, lengths respected
(frames t >= T_n and labels u >= U_n are masked; the terminal blank is
taken at (T_n - 1, U_n)).  U_n > T_n is VALID for transducers (a frame may
emit several labels) — there is no CTC-style impossible-alignment case.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fastmath import (exp32, log32, log_softmax32, logaddexp2_acc,
                       round_to_half)
from .semiring import LOG0, LOG0_THRESHOLD


def _skew(x, d_total):
    """(N, T, Up) -> (D, N, Up) with out[d, n, u] = x[n, d-u, u].

    Out-of-range t = d-u (the triangle corners) is filled with LOG0.  One
    flat gather over the (T*Up) trailing axes; the inverse is `_unskew`.
    """
    n, t_max, up = x.shape
    d_idx = jnp.arange(d_total)[:, None]
    u_idx = jnp.arange(up)[None, :]
    t_idx = d_idx - u_idx                       # (D, Up)
    valid = (t_idx >= 0) & (t_idx < t_max)
    flat = jnp.clip(t_idx, 0, t_max - 1) * up + u_idx
    out = jnp.take(x.reshape(n, t_max * up), flat.reshape(-1), axis=1)
    out = out.reshape(n, d_total, up)
    out = jnp.where(valid[None], out, LOG0)
    return jnp.moveaxis(out, 0, 1)              # (D, N, Up)


def _unskew(sk, t_max):
    """(D, N, Up) -> (N, T, Up) with out[n, t, u] = sk[t+u, n, u]."""
    d_total, n, up = sk.shape
    t_idx = jnp.arange(t_max)[:, None]
    u_idx = jnp.arange(up)[None, :]
    flat = (t_idx + u_idx) * up + u_idx         # (T, Up)
    x = jnp.moveaxis(sk, 0, 1).reshape(n, d_total * up)
    return jnp.take(x, flat.reshape(-1), axis=1).reshape(n, t_max, up)


def _diag_renorm(row):
    """Per-step renorm shift on the exact half-integer grid (f32 sums of
    halves are exact, so offsets cancel bit-exactly in posteriors)."""
    m = jnp.max(row, axis=-1)                   # (N,)
    m = jnp.where(m > LOG0_THRESHOLD, m, 0.0)
    return round_to_half(m)


def _resolve_impl(implementation, n, up):
    """'auto' -> the Pallas wavefront kernels on TPU when the diagonal row
    fits VMEM, else the XLA scan (identical numerics on the planes —
    tests/test_rnnt_pallas.py)."""
    if implementation == "auto":
        from .rnnt_loss_pallas import wavefront_pallas_supported
        if (jax.default_backend() == "tpu"
                and wavefront_pallas_supported(n, up)):
            return "pallas"
        return "xla"
    if implementation not in ("xla", "pallas"):
        raise ValueError(f"unknown implementation {implementation!r}")
    return implementation


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _rnnt_nll_lp(lp, targets, input_lengths, target_lengths, blank, v, impl):
    nll, _ = _rnnt_forward(lp, targets, input_lengths, target_lengths, blank,
                           impl)
    return nll


def _planes(lp, targets, target_lengths, blank):
    """Extract the blank plane and the (label-masked) label plane.

    The label gather is a one-hot MXU einsum at HIGHEST precision — exact
    f32 selection (1.0 * x sums with zeros), the same gather-as-matmul
    pattern as the CTC loss prep (ctc_loss_pallas.gather_lp_ext; a trailing
    -axis take_along_axis measures ~8 ns/element on TPU, see
    docs/perf_roofline.md indexing table).
    """
    n, t_max, up, v = lp.shape
    b_pl = lp[..., blank]                                   # (N, T, Up)
    y_ext = jnp.concatenate(
        [targets.astype(jnp.int32),
         jnp.zeros((n, up - targets.shape[1]), jnp.int32)], axis=1)
    onehot_y = jax.nn.one_hot(y_ext, v, dtype=lp.dtype)     # (N, Up, V)
    l_pl = jnp.einsum("ntuv,nuv->ntu", lp, onehot_y,
                      precision=jax.lax.Precision.HIGHEST)
    u_ok = jnp.arange(up)[None] < target_lengths[:, None]   # (N, Up)
    l_pl = jnp.where(u_ok[:, None, :], l_pl, LOG0)
    return b_pl, l_pl, y_ext


def _alpha_scan(sk_b, sk_l, n, up):
    """Wavefront alpha over skewed planes.  Returns (tape (D, N, Up) of
    renormalized diagonals, rcum (D, N) exact offsets): alpha = tape+rcum."""
    d_total = sk_b.shape[0]
    a0 = jnp.full((n, up), LOG0, jnp.float32).at[:, 0].set(0.0)
    # derive the carry inits from the operand so their sharding/varying
    # axes match under shard_map (jnp zeros are replicated literals)
    a0 = a0 + jnp.zeros_like(sk_b[0])
    r0 = jnp.zeros_like(sk_b[0, :, 0])

    def step(carry, x):
        a_prev, r_prev = carry
        skb_d, skl_d = x                        # diag d-1 planes
        blank_in = a_prev + skb_d
        lab_in = (jnp.pad(a_prev, ((0, 0), (1, 0)), constant_values=LOG0)
                  [:, :up]
                  + jnp.pad(skl_d, ((0, 0), (1, 0)), constant_values=LOG0)
                  [:, :up])
        a = logaddexp2_acc(blank_in, lab_in)
        m = _diag_renorm(a)
        a = jnp.maximum(a - m[:, None], LOG0)
        r = r_prev + m
        return (a, r), (a, r)

    (_, _), (tape, rcum) = jax.lax.scan(
        step, (a0, r0), (sk_b[:-1], sk_l[:-1]), unroll=8)
    tape = jnp.concatenate([a0[None], tape], axis=0)
    rcum = jnp.concatenate([r0[None], rcum], axis=0)
    return tape, rcum


def _rnnt_forward(lp, targets, input_lengths, target_lengths, blank,
                  impl="xla"):
    lp = jnp.asarray(lp, jnp.float32)
    n, t_max, up, v = lp.shape
    il = jnp.asarray(input_lengths, jnp.int32)
    ul = jnp.asarray(target_lengths, jnp.int32)
    b_pl, l_pl, y_ext = _planes(lp, targets, ul, blank)
    nll, core = _planes_forward(b_pl, l_pl, il, ul, impl)
    (il, ul, tape, rcum, sk_b, sk_l, z_small, z_off) = core
    return nll, (y_ext, il, ul, tape, rcum, sk_b, sk_l, z_small, z_off)


def _planes_forward(b_pl, l_pl, il, ul, impl="xla"):
    """Wavefront NLL from the two (N, T, U+1) planes (the DP proper —
    everything after the vocabulary axis has been reduced away)."""
    n, t_max, up = b_pl.shape
    d_total = t_max + up - 1
    sk_b = _skew(b_pl, d_total)
    sk_l = _skew(l_pl, d_total)
    if impl == "pallas":
        from .rnnt_loss_pallas import alpha_scan_pallas
        tape, rcum = alpha_scan_pallas(sk_b, sk_l)
    else:
        tape, rcum = _alpha_scan(sk_b, sk_l, n, up)

    # logZ_n = alpha[T_n-1, U_n] + b_pl[T_n-1, U_n], kept SPLIT as
    # (z_small, z_off): z_off is the exact-half-grid renorm offset, so the
    # backward's alpha+beta-logZ cancellation happens on the exact grid
    # (f32 quantization of a ~1e3-magnitude logZ alone costs ~1e-4 in the
    # posteriors at T in the hundreds — measured, tests/test_rnnt.py).
    # Terminal extracts as MASKED SUMS, not advanced-index gathers: the
    # mixed-axis gather form (b_pl[arange, il-1, ul]) lowers to a ~35 ms
    # scalarized loop on TPU at (8, 400, 81) — measured round 3; exactly
    # the per-lane-gather trap documented in docs/perf_roofline.md.  Each
    # mask has ONE hot element per sample, so a plain where+sum is exact
    # (no MXU pass, no reassociation of more than one term) and fuses to
    # a single sweep over the small tapes (~0 ms).
    d_term = il - 1 + ul                                    # (N,)
    oh_d = jnp.arange(d_total)[:, None] == d_term[None]     # (D, N)
    oh_u = jnp.arange(up)[None] == ul[:, None]              # (N, Up)
    oh_t = jnp.arange(t_max)[None] == (il - 1)[:, None]     # (N, T)
    z_off = jnp.sum(jnp.where(oh_d, rcum, 0.0), axis=0)     # exact halves
    b_term = jnp.sum(jnp.where(oh_t[:, :, None] & oh_u[:, None, :],
                               b_pl, 0.0), axis=(1, 2))
    z_small = jnp.sum(jnp.where(oh_d[:, :, None] & oh_u[None, :, :],
                                tape, 0.0), axis=(0, 2)) + b_term
    nll = -(z_small + z_off)
    return nll, (il, ul, tape, rcum, sk_b, sk_l, z_small, z_off)


def _rnnt_fwd(lp, targets, input_lengths, target_lengths, blank, v, impl):
    nll, res = _rnnt_forward(lp, targets, input_lengths, target_lengths,
                             blank, impl)
    return nll, res


def _rnnt_bwd(blank, v, impl, res, g):
    y_ext = res[0]
    gb, gl = _plane_posteriors(res[1:], impl)
    # scatter into V: 2 nonzeros per node -> one-hot combine, XLA-fused
    grad = -gl[:, :, :, None] * jax.nn.one_hot(y_ext, v, dtype=jnp.float32)[:, None]
    grad = grad.at[:, :, :, blank].add(-gb)
    grad = grad * g[:, None, None, None]
    return grad, None, None, None


def _plane_posteriors(res, impl="xla"):
    """(i_blank, i_label) node posteriors (N, T, U+1) from the forward
    residuals — the shared core of both backward passes (lp-level scatter
    and plane-level fused)."""
    il, ul, a_tape, a_rcum, sk_b, sk_l, z_small, z_off = res
    d_total, n, up = sk_b.shape
    t_max = d_total - up + 1

    if impl == "pallas":
        # Fused beta + posterior-assembly kernel: beta never touches HBM;
        # bit-identical to the XLA assembly below on the same residuals.
        from .rnnt_loss_pallas import posteriors_pallas
        i_blank, i_label = posteriors_pallas(
            sk_b, sk_l, a_tape, a_rcum, il, ul, z_small, z_off)
        return _finish_posteriors(i_blank, i_label, il, t_max)

    # ---- beta wavefront (reverse diagonals), same renorm machinery ------
    d_term = il - 1 + ul                                    # (N,)
    u_term = ul

    def step(carry, x):
        b_prev, r_prev = carry                  # beta over diag d+1
        skb_d, skl_d, d = x                     # planes on diag d
        # blank successor (t+1, u): diag d+1, same u; label (t, u+1):
        # diag d+1, u+1 (shift left).  r_prev is diag d+1's offset.
        blank_in = skb_d + b_prev
        lab_in = skl_d + jnp.pad(
            b_prev, ((0, 0), (0, 1)), constant_values=LOG0)[:, 1:]
        bta = logaddexp2_acc(blank_in, lab_in)
        # terminal injection: beta(T_n-1, U_n) gets + exp(b_plane) * 1,
        # expressed on this diag's renormalized scale (offset -r_prev).
        is_term = ((d == d_term)[:, None]
                   & (jnp.arange(up)[None] == u_term[:, None]))
        term = jnp.where(is_term, skb_d - r_prev[:, None], LOG0)
        bta = logaddexp2_acc(bta, term)
        m = _diag_renorm(bta)
        bta = jnp.maximum(bta - m[:, None], LOG0)
        r = r_prev + m
        return (bta, r), (bta, r)

    b0 = jnp.full((n, up), LOG0, jnp.float32) + jnp.zeros_like(sk_b[0])
    ds = jnp.arange(d_total - 1, -1, -1, dtype=jnp.int32)
    (_, _), (b_tape_rev, b_rcum_rev) = jax.lax.scan(
        step, (b0, jnp.zeros_like(sk_b[0, :, 0])),
        (sk_b[::-1], sk_l[::-1], ds), unroll=8)
    b_tape = b_tape_rev[::-1]                   # beta diag d at index d
    b_rcum = b_rcum_rev[::-1]

    # ---- posteriors, assembled per diagonal (no scan) --------------------
    # i_blank(t,u) = exp(alpha[t,u] + b_pl[t,u] + beta[t+1,u] - logZ)
    #   with beta[t+1,u] -> 0 at the terminal node (T_n-1, U_n);
    # i_label(t,u) = exp(alpha[t,u] + l_pl[t,u] + beta[t,u+1] - logZ).
    # In skewed space both successors live on diag d+1.
    b_next = jnp.concatenate(
        [b_tape[1:], jnp.full((1, n, up), LOG0, jnp.float32)], axis=0)
    r_next = jnp.concatenate(
        [b_rcum[1:], jnp.zeros((1, n), jnp.float32)], axis=0)
    d_idx = jnp.arange(d_total)[:, None, None]
    u_idx = jnp.arange(up)[None, None, :]
    is_term = ((d_idx == d_term[None, :, None])
               & (u_idx == u_term[None, :, None]))

    # The large-magnitude parts (renorm offsets, z_off) are all multiples
    # of 0.5 with |.| << 2^22, so their sum/cancellation below is EXACT in
    # f32; only O(1)-magnitude terms carry rounding.  This is what keeps
    # posterior error ~1e-6 instead of ~1e-4 at T in the hundreds.
    off = a_rcum + r_next - z_off[None]                     # (D, N) exact
    off_term = a_rcum - z_off[None]                         # beta_succ == 0
    small = a_tape - z_small[None, :, None]
    lg_blank = (small + sk_b + jnp.where(is_term, 0.0, b_next)
                + jnp.where(is_term, off_term[:, :, None],
                            off[:, :, None]))
    lab_succ = jnp.concatenate(
        [b_next[:, :, 1:], jnp.full((d_total, n, 1), LOG0, jnp.float32)],
        axis=2)
    lg_label = small + sk_l + lab_succ + off[:, :, None]
    i_blank = jnp.where(lg_blank > LOG0_THRESHOLD,
                        exp32(jnp.minimum(lg_blank, 0.0)), 0.0)
    i_label = jnp.where(lg_label > LOG0_THRESHOLD,
                        exp32(jnp.minimum(lg_label, 0.0)), 0.0)
    return _finish_posteriors(i_blank, i_label, il, t_max)


def _finish_posteriors(i_blank, i_label, il, t_max):
    gb = _unskew(i_blank, t_max)                            # (N, T, Up)
    gl = _unskew(i_label, t_max)
    t_ok = (jnp.arange(t_max)[None] < il[:, None])[:, :, None]
    gb = jnp.where(t_ok, gb, 0.0)
    gl = jnp.where(t_ok, gl, 0.0)
    return gb, gl


_rnnt_nll_lp.defvjp(_rnnt_fwd, _rnnt_bwd)


# ---------------------------------------------------------------------------
# Logits-level entry (from_logits=True): the log-softmax is FUSED into the
# custom VJP so the (N, T, U+1, V) log-prob tensor and its gradient are
# never materialized as separate passes.  Forward reduces the logits to the
# two DP planes in one fused sweep that ALSO saves the exponentials
# e = exp32(x - max) as a residual (chip-measured: emitting e costs ~0.3 ms
# of HBM write at the bench shape and removes the backward's entire 66M-
# element exp32 recompute, ~0.8 ms of VPU time); backward is then ONE
# transcendental-free elementwise pass:
#   dL/dlogits[v] = (e[v] / s) * (i_blank + i_label) - i_scatter[v]
# (the transducer analog of CTC's exp(lp) - posterior combine, pushed
# through the log-softmax analytically).  Values of the DP planes are
# bit-identical to log_softmax32-then-gather.  A Pallas single-pass prep
# kernel was tried and REJECTED: Mosaic ran this reduction pattern at
# 2.9-3.7 ms vs XLA's 1.07 ms at (8, 400, 81, 256) — XLA's own fusion of
# max/exp/sum/select-gather is the fast path here (measured 2026-08-19).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _rnnt_nll_logits(x, targets, input_lengths, target_lengths, blank, v,
                     impl):
    nll, _ = _logits_forward(x, targets, input_lengths, target_lengths,
                             blank, impl)
    return nll


def _logits_forward(x, targets, il, ul, blank, impl):
    n, t_max, up, v = x.shape
    il = jnp.asarray(il, jnp.int32)
    ul = jnp.asarray(ul, jnp.int32)
    y_ext = jnp.concatenate(
        [jnp.asarray(targets, jnp.int32),
         jnp.zeros((n, up - targets.shape[1]), jnp.int32)], axis=1)
    m = jnp.max(x, axis=-1)                                 # (N, T, Up)
    e = exp32(x - m[..., None])                             # residual
    s = jnp.sum(e, axis=-1)
    logs = log32(s)
    b_pl = (x[..., blank] - m) - logs
    # label gather as select+sum (exact: one hot element + zeros), fused by
    # XLA into the same sweep as the exp/sum reductions
    oh_y = (jnp.arange(v, dtype=jnp.int32)[None, None, :]
            == y_ext[:, :, None])                           # (N, Up, V)
    xy = jnp.sum(jnp.where(oh_y[:, None], x, 0.0), axis=-1)
    l_pl = (xy - m) - logs
    u_ok = jnp.arange(up)[None] < ul[:, None]               # (N, Up)
    l_pl = jnp.where(u_ok[:, None, :], l_pl, LOG0)
    nll, core = _planes_forward(b_pl, l_pl, il, ul, impl)
    return nll, (y_ext, e, s, core)


def _logits_fwd(x, targets, il, ul, blank, v, impl):
    nll, res = _logits_forward(x, targets, il, ul, blank, impl)
    return nll, res


def _logits_bwd(blank, v, impl, res, g):
    y_ext, e, s, core = res
    gb, gl = _plane_posteriors(core, impl)                  # (N, T, Up)
    gb = gb * g[:, None, None]
    gl = gl * g[:, None, None]
    c = (gb + gl) / s                                       # (N, T, Up)
    viota = jnp.arange(v, dtype=jnp.int32)
    oh_b = viota == blank                                   # (V,)
    oh_y = viota[None, None, :] == y_ext[:, :, None]        # (N, Up, V)
    grad = (e * c[..., None]
            - jnp.where(oh_b, gb[..., None], 0.0)
            - jnp.where(oh_y[:, None], gl[..., None], 0.0))
    return grad, None, None, None


_rnnt_nll_logits.defvjp(_logits_fwd, _logits_bwd)


# ---------------------------------------------------------------------------
# Plane-level entry: the DP behind jax.custom_vjp with gradients delivered
# IN PLANE SPACE (N, T, U+1) — the building block of the fused joint path
# (`rnnt_nll_fused`), where the (V,) axis is reduced away chunk-by-chunk
# and must never be rematerialized whole.
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rnnt_nll_planes(blank_plane, label_plane, input_lengths,
                     target_lengths, impl):
    nll, _ = _planes_nll_fwd_core(blank_plane, label_plane, input_lengths,
                                  target_lengths, impl)
    return nll


def rnnt_nll_from_planes(blank_plane, label_plane, input_lengths,
                         target_lengths, implementation: str = "auto"):
    """Transducer NLL (N,) from precomputed log-prob planes.

    Args:
      blank_plane: (N, T, U+1) log p(blank | t, u).
      label_plane: (N, T, U+1) log p(y_{u+1} | t, u); rows at u >=
        target_lengths may hold anything (masked to log-0 here).
      input_lengths, target_lengths: (N,) as in `rnnt_nll`.
      implementation: 'auto' | 'xla' | 'pallas' — wavefront scan backend
        (bit-identical results; see rnnt_loss_pallas.py).

    Differentiable in both planes (custom VJP: fused posterior gradient,
    no backward scan over V).
    """
    n, _, up = jnp.shape(blank_plane)
    impl = _resolve_impl(implementation, n, up)
    return _rnnt_nll_planes(blank_plane, label_plane, input_lengths,
                            target_lengths, impl)


def _planes_nll_fwd_core(b_pl, l_pl, il, ul, impl):
    b_pl = jnp.asarray(b_pl, jnp.float32)
    l_pl = jnp.asarray(l_pl, jnp.float32)
    il = jnp.asarray(il, jnp.int32)
    ul = jnp.asarray(ul, jnp.int32)
    up = b_pl.shape[2]
    u_ok = jnp.arange(up)[None] < ul[:, None]               # (N, Up)
    l_pl = jnp.where(u_ok[:, None, :], l_pl, LOG0)
    return _planes_forward(b_pl, l_pl, il, ul, impl)


def _planes_nll_fwd(b_pl, l_pl, il, ul, impl):
    nll, core = _planes_nll_fwd_core(b_pl, l_pl, il, ul, impl)
    return nll, core


def _planes_nll_bwd(impl, res, g):
    gb, gl = _plane_posteriors(res, impl)
    gg = g[:, None, None]
    return -gb * gg, -gl * gg, None, None


_rnnt_nll_planes.defvjp(_planes_nll_fwd, _planes_nll_bwd)


def rnnt_nll(log_probs_or_logits, targets, input_lengths, target_lengths,
             blank: int = 0, from_logits: bool = True,
             implementation: str = "auto"):
    """Per-sample transducer negative log-likelihood (N,), differentiable.

    Args:
      log_probs_or_logits: (N, T, U+1, V) joint outputs — raw logits by
        default (log_softmax is applied internally and its gradient flows
        through, torchaudio ``rnnt_loss`` convention); pass
        ``from_logits=False`` for pre-log-softmaxed inputs.
      targets: (N, U) padded int labels (no blanks).
      input_lengths: (N,) frames per sample.
      target_lengths: (N,) labels per sample.  May EXCEED input_lengths
        (transducers can emit several labels per frame).
      blank: blank id.
      implementation: 'auto' | 'xla' | 'pallas'.  'auto' picks the Pallas
        wavefront kernels on TPU (rnnt_loss_pallas.py) and the lax.scan
        twin elsewhere; the DP is bit-identical between the two.
    """
    x = jnp.asarray(log_probs_or_logits, jnp.float32)
    if x.ndim != 4:
        raise ValueError(f"expected (N, T, U+1, V) joint tensor, got "
                         f"{x.shape}")
    n, t_max, up, v = x.shape
    targets = jnp.asarray(targets)
    if targets.ndim != 2:
        raise ValueError("targets must be (N, U) padded")
    if targets.shape[1] + 1 > up:
        raise ValueError(
            f"targets U={targets.shape[1]} needs U+1 <= {up} joint rows")
    impl = _resolve_impl(implementation, n, up)
    il = jnp.asarray(input_lengths, jnp.int32)
    ul = jnp.asarray(target_lengths, jnp.int32)
    if from_logits:
        # Fused logits-level VJP: the log-softmax (fastmath exp32/log32 —
        # XLA's exp/log carry ~1e-4 abs error on TPU, chip-measured
        # 1.03e-4 grad dev at T=300 with jax.nn.log_softmax) is folded
        # into the forward reduction and the one-pass posterior gradient.
        return _rnnt_nll_logits(x, targets, il, ul, int(blank), int(v),
                                impl)
    return _rnnt_nll_lp(x, targets, il, ul, int(blank), int(v), impl)


def rnnt_loss(log_probs_or_logits, targets, input_lengths, target_lengths,
              blank: int = 0, reduction: str = "mean",
              from_logits: bool = True, implementation: str = "auto"):
    """Transducer loss with reduction.

    ``reduction='mean'`` is the plain batch mean (the transducer
    convention, matching torchaudio — NOT torch's CTC per-target-length
    normalization); ``'sum'`` / ``'none'`` as usual.
    """
    nll = rnnt_nll(log_probs_or_logits, targets, input_lengths,
                   target_lengths, blank=blank, from_logits=from_logits,
                   implementation=implementation)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"unknown reduction {reduction!r}")


# ---------------------------------------------------------------------------
# Fused joint: transducer loss WITHOUT materializing the (N, T, U+1, V)
# joint tensor.
# ---------------------------------------------------------------------------

def fused_additive_joint(w_out, b_out, activation=jnp.tanh,
                         matmul_dtype=None):
    """The standard additive joint for `rnnt_nll_fused`:
    ``logits = W_out · act(f + g) + b_out`` over PRE-PROJECTED encoder/
    predictor vectors f, g (project once outside: `enc @ W_enc`,
    `pred @ W_pred` — (N,T,J)/(N,U+1,J) tensors, V-free).

    ``matmul_dtype='bfloat16'`` stores the activation and W_out in bf16
    for the (J, V) output projection with f32 MXU accumulation — the
    TPU-native storage/accumulate split for the FLOPs-dominant matmul of
    fused transducer training (one full-rate MXU pass instead of the
    f32 multi-pass).  Numerics delta vs the f32 path: logits move by
    O(1e-2) absolute (bf16 has ~8 mantissa bits), which perturbs the
    NLL by ~1e-2 relative and the gradients by a few percent pointwise
    while keeping them descent-aligned — quantified in
    tests/test_rnnt_fused.py::TestBF16Joint.  Training-quality, not
    parity-grade: the default (None) keeps full f32 and the fused ==
    materialized <=3e-4 contract."""
    w_out = jnp.asarray(w_out, jnp.float32)
    b_out = jnp.asarray(b_out, jnp.float32)
    if matmul_dtype is None:
        def joint_fn(f_vec, g_vec):
            return activation(f_vec + g_vec) @ w_out + b_out
        return joint_fn

    md = jnp.dtype(matmul_dtype)
    w_c = w_out.astype(md)

    def joint_fn(f_vec, g_vec):
        h = activation(f_vec + g_vec).astype(md)
        out = jax.lax.dot_general(
            h, w_c, dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out + b_out
    return joint_fn


def rnnt_nll_fused(enc_proj, pred_proj, joint_fn, targets, input_lengths,
                   target_lengths, *, blank: int = 0, chunk_t: int = 64,
                   implementation: str = "auto"):
    """Per-sample transducer NLL computed WITHOUT ever materializing the
    (N, T, U+1, V) joint logits — the tensor that makes naive transducer
    training memory-infeasible (B=16, T=400, U=80, V=32k is a 68 GB
    buffer; its two DP planes are 16 MB).

    TPU-native formulation: frames are processed in chunks of `chunk_t` —
    each chunk's (N, tc, U+1, V) logits are built from the projected
    encoder/predictor tensors by `joint_fn`, log-softmaxed, and REDUCED
    immediately to the two DP planes (blank column + one one-hot MXU
    gather of the target labels).  The chunk computation runs under
    ``jax.checkpoint`` inside a sequential ``lax.map``, so the backward
    pass recomputes one chunk of logits at a time and the fused
    plane-space posterior gradient (`rnnt_nll_from_planes`) flows back
    through ``joint_fn`` to the projections and joint weights with peak
    memory O(N·(T + tc·V/chunk-reuse)·U) instead of O(N·T·U·V).  Loss and
    gradients match the materialized `rnnt_nll(..., from_logits=True)`
    path (tests/test_rnnt_fused.py).

    Args:
      enc_proj: (N, T, Je) projected acoustic encodings (e.g. enc @ W_enc).
      pred_proj: (N, U+1, Jp) projected predictor states for the blank-
        prefixed target prefixes (row u encodes targets[:u]).
      joint_fn: ``(f_vec (Je,), g_vec (Jp,)) -> (V,) logits`` — any
        differentiable joint; `fused_additive_joint` builds the standard
        one.
      targets, input_lengths, target_lengths, blank: as in `rnnt_nll`.
      chunk_t: frames per logits chunk (memory/recompute knob).
    """
    enc_proj = jnp.asarray(enc_proj, jnp.float32)
    pred_proj = jnp.asarray(pred_proj, jnp.float32)
    if enc_proj.ndim != 3 or pred_proj.ndim != 3:
        raise ValueError("enc_proj must be (N, T, Je) and pred_proj "
                         f"(N, U+1, Jp), got {enc_proj.shape} / "
                         f"{pred_proj.shape}")
    n, t_max, je = enc_proj.shape
    up = pred_proj.shape[1]
    targets = jnp.asarray(targets)
    if targets.ndim != 2 or targets.shape[1] + 1 > up:
        raise ValueError(
            f"targets must be (N, U) with U+1 <= {up}, got {targets.shape}")
    il = jnp.asarray(input_lengths, jnp.int32)
    ul = jnp.asarray(target_lengths, jnp.int32)
    v = jax.eval_shape(joint_fn,
                       jax.ShapeDtypeStruct((je,), jnp.float32),
                       jax.ShapeDtypeStruct((pred_proj.shape[2],),
                                            jnp.float32)).shape[-1]
    y_ext = jnp.concatenate(
        [targets.astype(jnp.int32),
         jnp.zeros((n, up - targets.shape[1]), jnp.int32)], axis=1)
    onehot_y = jax.nn.one_hot(y_ext, v, dtype=jnp.float32)  # (N, Up, V)
    u_ok = jnp.arange(up)[None] < ul[:, None]               # (N, Up)

    tc = max(1, min(int(chunk_t), t_max))
    n_chunks = -(-t_max // tc)
    t_pad = n_chunks * tc
    encp = jnp.pad(enc_proj, ((0, 0), (0, t_pad - t_max), (0, 0)))

    @jax.checkpoint
    def chunk_planes(enc_c):
        """(N, tc, Je) -> blank/label plane chunks (N, tc, Up)."""
        def one_sample(f_rows, g_rows):
            return jax.vmap(
                lambda f: jax.vmap(lambda gv: joint_fn(f, gv))(g_rows)
            )(f_rows)                                       # (tc, Up, V)
        logits = jax.vmap(one_sample)(enc_c, pred_proj)     # (N, tc, Up, V)
        lp = log_softmax32(logits, axis=-1)
        b_c = lp[..., blank]
        l_c = jnp.einsum("ntuv,nuv->ntu", lp, onehot_y,
                         precision=jax.lax.Precision.HIGHEST)
        return b_c, jnp.where(u_ok[:, None, :], l_c, LOG0)

    enc_chunks = jnp.moveaxis(
        encp.reshape(n, n_chunks, tc, je), 1, 0)            # (C, N, tc, Je)
    b_ch, l_ch = jax.lax.map(chunk_planes, enc_chunks)      # (C, N, tc, Up)
    b_pl = jnp.moveaxis(b_ch, 0, 1).reshape(n, t_pad, up)
    l_pl = jnp.moveaxis(l_ch, 0, 1).reshape(n, t_pad, up)
    t_ok = (jnp.arange(t_pad)[None] < t_max)[:, :, None]    # mask pad frames
    b_pl = jnp.where(t_ok, b_pl, LOG0)
    l_pl = jnp.where(t_ok, l_pl, LOG0)
    return rnnt_nll_from_planes(b_pl, l_pl, il, ul,
                                implementation=implementation)


def rnnt_loss_fused(enc_proj, pred_proj, joint_fn, targets, input_lengths,
                    target_lengths, *, blank: int = 0, chunk_t: int = 64,
                    reduction: str = "mean", implementation: str = "auto"):
    """`rnnt_loss` over the fused (never-materialized) joint — see
    `rnnt_nll_fused`.  Reductions as in `rnnt_loss`."""
    nll = rnnt_nll_fused(enc_proj, pred_proj, joint_fn, targets,
                         input_lengths, target_lengths, blank=blank,
                         chunk_t=chunk_t, implementation=implementation)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"unknown reduction {reduction!r}")


class RNNTLoss:
    """Module-style wrapper mirroring ``CTCLoss`` (ops/ctc_loss.py)."""

    def __init__(self, blank: int = 0, reduction: str = "mean",
                 from_logits: bool = True):
        self.blank = int(blank)
        self.reduction = reduction
        self.from_logits = bool(from_logits)

    def __call__(self, joint, targets, input_lengths, target_lengths):
        return rnnt_loss(joint, targets, input_lengths, target_lengths,
                         blank=self.blank, reduction=self.reduction,
                         from_logits=self.from_logits)
