"""CTC loss as a pure-XLA `jax.lax.scan` with a fused-gradient custom VJP.

This is the rebuild of the reference's C++ forward-backward loss kernel
(SURVEY.md §3.1 N1) in idiomatic JAX: the per-sample alpha DP becomes a
batched, length-masked, renormalized time scan; the backward pass runs the
beta scan and emits the gradient directly (`grad = exp(lp) - posterior`, the
fused form validated against torch.nn.CTCLoss in SURVEY.md §6.2).  The
reference's thread-pool batch parallelism (SURVEY.md §3.1 N4) disappears: the
batch is simply a vectorized axis of every scan step.

Numerical design (see fastmath.py for why):
  * Finite log-zero sentinel (semiring.py) — no infs/nans inside the scans,
    so masked lanes and impossible alignments stay well-defined.
  * ~1-ulp custom exp/log1p polynomials in the log-semiring inner ops; the
    backend's own f32 log carries ~1e-4 error which would random-walk across
    the T-step scan and break torch parity.
  * EXACT renormalization: each step subtracts the row max rounded to the 0.5
    grid and accumulates `2*m` in an int32 carry — zero rounding error in the
    running norm, and the stored per-step alpha rows stay small-magnitude so
    the posterior combine `alpha + beta - logZ` never touches big floats.
    (TF's TPU CTC renormalizes in float, ctc_ops.py:1372; the int-grid trick
    makes the same idea exact.)

Result: f32 loss/grad error vs the float64 oracle is at or below
torch.nn.CTCLoss's own f32 error even at T=1000+ (tests/test_ctc_loss_xla.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ctc_common import build_ctc_tables, gather_lp_ext
from .fastmath import exp32, logaddexp2_acc, logaddexp3_acc, round_to_half
from .semiring import LOG0, LOG0_THRESHOLD, logaddexp2, logaddexp3


def _ops(dtype):
    """(logaddexp3, logaddexp2, exp) for the dtype: custom ~1-ulp f32 polys in
    float32; plain jnp in float64 (the x64 CPU oracle path, where the backend
    transcendentals are accurate)."""
    if dtype == jnp.float64:
        return logaddexp3, logaddexp2, jnp.exp
    return logaddexp3_acc, logaddexp2_acc, exp32

# Per-step renorm shift is clamped to +-_NORM_CLAMP (multiples of 0.5 stored
# in int32): supports |log Z| up to ~1e9 with no overflow at any real T.
_NORM_CLAMP = 512.0


def _shift_right(x, k):
    """x[..., s-k] with log-zero fill (predecessor lookup along states)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x, pad, constant_values=LOG0)[..., :-k]


def _shift_left(x, k):
    """x[..., s+k] with log-zero fill (successor lookup along states)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(0, k)]
    return jnp.pad(x, pad, constant_values=LOG0)[..., k:]


def _shift_left_bool(x, k):
    pad = [(0, 0)] * (x.ndim - 1) + [(0, k)]
    return jnp.pad(x, pad, constant_values=False)[..., k:]


def _renorm_shift(row_max):
    """Round the row max to the 0.5 grid, clamped; return (m_f32, m_i32x2)."""
    m = round_to_half(jnp.clip(row_max, -_NORM_CLAMP, _NORM_CLAMP))
    return m, (m * 2.0).astype(jnp.int32)


def ctc_forward_scan(lp_ext, skip2, input_lengths, target_lengths):
    """Run the alpha scan.

    Returns:
      nll: (N,) negative log likelihood (+inf where alignment impossible).
      log_z: (N,) recombined log likelihood (f32; representation-limited).
      z_hat: (N,) small-magnitude log-likelihood residual (log_z minus the
        exactly-tracked norm) — use this + norms for accurate posteriors.
      alpha_hat: (T, N, L) renormalized alpha rows (small magnitude).
      anorm2: (T, N) int32, 2x the accumulated norm at each step.
    """
    t_max, n, L = lp_ext.shape
    laddexp3, laddexp2, _ = _ops(lp_ext.dtype)
    pos = jnp.arange(L, dtype=jnp.int32)
    il = input_lengths.astype(jnp.int32)
    tl = target_lengths.astype(jnp.int32)

    # t = 0 initialization: alpha[0,0] = lp(blank), alpha[0,1] = lp(l1).
    a0 = jnp.where(pos[None, :] == 0, lp_ext[0], LOG0)
    a0 = jnp.where((pos[None, :] == 1) & (tl[:, None] > 0), lp_ext[0], a0)
    m0, m0_i = _renorm_shift(jnp.max(a0, axis=-1))
    a0_hat = jnp.maximum(a0 - m0[:, None], LOG0)

    def step(carry, xs):
        a_hat, norm2 = carry
        lp_t, t = xs
        a1 = _shift_right(a_hat, 1)
        a2 = jnp.where(skip2, _shift_right(a_hat, 2), LOG0)
        anew = laddexp3(a_hat, a1, a2) + lp_t
        anew = jnp.maximum(anew, LOG0)
        m, m_i = _renorm_shift(jnp.max(anew, axis=-1))
        a_hat_new = jnp.maximum(anew - m[:, None], LOG0)
        upd = (t < il)[:, None]
        a_hat = jnp.where(upd, a_hat_new, a_hat)
        norm2 = jnp.where(t < il, norm2 + m_i, norm2)
        return (a_hat, norm2), (a_hat, norm2)

    ts = jnp.arange(1, t_max, dtype=jnp.int32)
    (a_hat_f, norm2_f), (alpha_rest, anorm_rest) = jax.lax.scan(
        step, (a0_hat, m0_i), (lp_ext[1:], ts)
    )
    alpha_hat = jnp.concatenate([a0_hat[None], alpha_rest], axis=0)
    anorm2 = jnp.concatenate([m0_i[None], anorm_rest], axis=0)

    end1 = jnp.take_along_axis(a_hat_f, (2 * tl)[:, None], axis=1)[:, 0]
    end2 = jnp.take_along_axis(a_hat_f, jnp.maximum(2 * tl - 1, 0)[:, None], axis=1)[:, 0]
    end2 = jnp.where(tl > 0, end2, LOG0)
    z_hat = laddexp2(end1, end2)  # small-magnitude
    log_z = z_hat + norm2_f.astype(lp_ext.dtype) * 0.5
    finite = z_hat > LOG0_THRESHOLD
    nll = jnp.where(finite, -log_z, jnp.inf)
    return nll, jnp.where(finite, log_z, LOG0), z_hat, alpha_hat, anorm2


def ctc_backward_scan(
    lp_ext, alpha_hat, anorm2, z_hat, skip2, input_lengths, target_lengths
):
    """Run the beta~ scan (emission-at-t excluded) and emit the log state
    posteriors `alpha(t) + beta~(t) - logZ`, all in exactly-compensated
    small-magnitude arithmetic.  Returns (T, N, L), <= 0 up to rounding."""
    t_max, n, L = lp_ext.shape
    laddexp3, _, _ = _ops(lp_ext.dtype)
    pos = jnp.arange(L, dtype=jnp.int32)
    il = input_lengths.astype(jnp.int32)
    tl = target_lengths.astype(jnp.int32)
    anorm_end2 = anorm2[-1]  # (N,) int32: 2*norm at the final step

    skip2_succ = _shift_left_bool(skip2, 2)  # transition s -> s+2 allowed
    init_row = jnp.where(
        (pos[None, :] == 2 * tl[:, None])
        | ((pos[None, :] == 2 * tl[:, None] - 1) & (tl[:, None] > 0)),
        0.0,
        LOG0,
    ).astype(lp_ext.dtype)

    # lp_next[t] = lp_ext[t+1]; last row unused (init/pad selection covers it).
    lp_next = jnp.concatenate(
        [lp_ext[1:], jnp.full((1, n, L), LOG0, lp_ext.dtype)], axis=0
    )

    def step(carry, xs):
        b_hat, bnorm2 = carry
        lp_nt, alpha_t, anorm2_t, t = xs
        bsum = b_hat + lp_nt  # beta~[t+1, s'] + lp[t+1, l'(s')], shared norm
        b1 = _shift_left(bsum, 1)
        b2 = jnp.where(skip2_succ, _shift_left(bsum, 2), LOG0)
        bnew = laddexp3(bsum, b1, b2)
        bnew = jnp.maximum(bnew, LOG0)
        m, m_i = _renorm_shift(jnp.max(bnew, axis=-1))
        b_hat_cand = jnp.maximum(bnew - m[:, None], LOG0)
        bnorm2_cand = bnorm2 + m_i

        is_init = (t == il - 1)[:, None]
        is_pad = (t >= il)[:, None]
        b_hat = jnp.where(is_init, init_row, jnp.where(is_pad, LOG0, b_hat_cand))
        bnorm2 = jnp.where(
            is_init[:, 0], 0, jnp.where(is_pad[:, 0], 0, bnorm2_cand)
        ).astype(jnp.int32)

        # log posterior = a_hat + b_hat + (anorm2_t + bnorm2 - anorm_end2)/2
        #                 - z_hat   — the int part is exact.
        shift = (anorm2_t + bnorm2 - anorm_end2).astype(lp_ext.dtype) * 0.5
        ab_t = alpha_t + b_hat + (shift - z_hat)[:, None]
        return (b_hat, bnorm2), ab_t

    # Derive the initial carry from the (possibly mesh-varying) inputs so the
    # scan types match under shard_map autodiff (0*x keeps finiteness: the
    # log-zero convention guarantees lp_ext is finite).
    carry0 = (
        jnp.full((n, L), LOG0, lp_ext.dtype) + 0.0 * lp_ext[0],
        jnp.zeros((n,), jnp.int32) + 0 * il,
    )
    ts = jnp.arange(t_max, dtype=jnp.int32)
    _, log_gamma = jax.lax.scan(
        step, carry0, (lp_next, alpha_hat, anorm2, ts), reverse=True
    )
    return log_gamma


def _posterior_matmul(gamma, targets, blank, num_classes):
    """State-posteriors -> vocabulary via a one-hot MXU matmul.

    The state->vocab map is a per-sample linear operator constant over time,
    so `post = einsum('tbl,blv->tbv', gamma, M)` with one-hot M replaces the
    scatter entirely — on TPU this rides the MXU instead of XLA's scatter
    loops (measured 1.78 ms -> ~0.5 ms for the whole grad combine at
    B=32,T=1000,S=100,V=1024).  One-hot matmul at precision='highest' is
    exact: products are value*1.0 and MXU accumulation is f32.
    """
    t_max, n, L = gamma.shape
    s_max = (L - 1) // 2
    pos = jnp.arange(L, dtype=jnp.int32)
    s_idx = jnp.clip((pos - 1) // 2, 0, max(s_max - 1, 0))
    lab = jnp.where(
        (pos % 2) == 1,
        jnp.take_along_axis(
            targets.astype(jnp.int32),
            jnp.broadcast_to(s_idx[None, :], (n, L)),
            axis=1,
        ) if s_max > 0 else blank,
        blank,
    )  # (N, L); padding labels are harmless (their gamma is exactly 0)
    m = (lab[:, :, None] == jnp.arange(num_classes, dtype=jnp.int32)).astype(
        gamma.dtype
    )  # (N, L, V)
    return jnp.einsum("tbl,blv->tbv", gamma, m, precision="highest")


# Above this many one-hot-matrix elements (N*L*V), fall back to the scatter
# (the dense M would dominate HBM); 2^25 f32 elements = 128 MB.
_POSTERIOR_MATMUL_MAX_ELEMS = 1 << 25


def _posterior_matmul_compact(gamma, targets, blank, num_classes):
    """Label-compacted posterior matmul for production vocabularies
    (SURVEY.md §6.2's TPU 'unique' optimization, compaction form): only the
    S odd (label) states enter the one-hot — the even states are all blank,
    summed into one column add — so the matrix is (N, S, V) instead of
    (N, 2S+1, V) and, unlike the scatter fallback, no (N, V, T) transpose
    of the full lattice is materialized.  Duplicate labels accumulate in
    the f32 MXU reduction exactly like the scatter-add."""
    post_blank = jnp.sum(gamma[..., 0::2], axis=-1)  # (T, N)
    m = (targets.astype(jnp.int32)[:, :, None]
         == jnp.arange(num_classes, dtype=jnp.int32)).astype(gamma.dtype)
    post = jnp.einsum("tbs,bsv->tbv", gamma[..., 1::2], m,
                      precision="highest")
    return post.at[..., blank].add(post_blank)


def _posterior_to_vocab(gamma, targets, blank, num_classes):
    from .ctc_common import _COMPACT_ONEHOT_MAX_ELEMS

    t_max, n, L = gamma.shape
    if n * L * num_classes <= _POSTERIOR_MATMUL_MAX_ELEMS:
        return _posterior_matmul(gamma, targets, blank, num_classes)
    s_max = (L - 1) // 2
    if (jax.default_backend() == "tpu" and s_max > 0
            and n * s_max * num_classes <= _COMPACT_ONEHOT_MAX_ELEMS):
        return _posterior_matmul_compact(gamma, targets, blank, num_classes)
    return _posterior_scatter(gamma, targets, blank, num_classes)


def _posterior_scatter(gamma, targets, blank, num_classes):
    """Scatter state posteriors back to vocabulary space.

    gamma: (T, N, L) occupation probabilities.  Even states are blank; odd
    state 2i+1 carries label targets[n, i].  Duplicate labels accumulate
    (jnp scatter-add), matching the sum over {s : l'(s) = c}.

    Fallback for very large (N, L, V); see _posterior_to_vocab.
    """
    t_max, n, L = gamma.shape
    s_max = (L - 1) // 2
    post_blank = jnp.sum(gamma[..., 0::2], axis=-1)  # (T, N)
    post = jnp.zeros((t_max, n, num_classes), gamma.dtype)
    if s_max > 0:
        # Indices are constant over time: scatter along the MAJOR axis with
        # T-contiguous rows (fast on TPU; ~10x vs minor-axis scatter).
        gamma_odd = jnp.moveaxis(gamma[..., 1::2], 0, 2)  # (N, S, T)
        acc = jnp.zeros((n, num_classes, t_max), gamma.dtype)
        acc = acc.at[
            jnp.arange(n, dtype=jnp.int32)[:, None], targets.astype(jnp.int32), :
        ].add(gamma_odd, mode="drop")
        post = jnp.moveaxis(acc, 2, 0)  # (T, N, C)
    post = post.at[..., blank].add(post_blank)
    return post


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_nll_xla(log_probs, targets, input_lengths, target_lengths, blank=0,
                checkpoint_every=0):
    """Per-sample CTC negative log-likelihood (reduction='none', no options).

    log_probs: (T, N, C) log-softmaxed; targets: (N, S) padded int32.
    Gradient wrt log_probs is the fused exp(lp) - posterior form, computed by
    one backward scan (SURVEY.md §4.2).

    checkpoint_every=0 stores every alpha row for the backward pass (fastest);
    checkpoint_every=K > 0 stores only every K-th scan carry and recomputes
    alpha per chunk in the backward pass — alpha memory drops from O(T*L) to
    O((T/K + K)*L), the long-T scaling mode of SURVEY.md §7 (the gradient
    itself is inherently O(T*C)).
    """
    nll, _ = _fwd_impl(
        log_probs, targets, input_lengths, target_lengths, blank, checkpoint_every
    )
    return nll


def _fwd_impl(log_probs, targets, input_lengths, target_lengths, blank, every):
    num_classes = log_probs.shape[-1]
    tables = build_ctc_tables(targets, target_lengths, blank, num_classes)
    lp_ext = gather_lp_ext(log_probs, tables)
    if every:
        nll, log_z, z_hat, ckpt = ctc_forward_scan_ckpt(
            lp_ext, tables.skip2, input_lengths, target_lengths, every
        )
        return nll, (z_hat, ckpt, None, None, tables)
    nll, log_z, z_hat, alpha_hat, anorm2 = ctc_forward_scan(
        lp_ext, tables.skip2, input_lengths, target_lengths
    )
    return nll, (z_hat, None, alpha_hat, anorm2, tables)


def _ctc_nll_fwd(log_probs, targets, input_lengths, target_lengths, blank, every):
    nll, (z_hat, ckpt, alpha_hat, anorm2, tables) = _fwd_impl(
        log_probs, targets, input_lengths, target_lengths, blank, every
    )
    res = (
        log_probs, targets, input_lengths, target_lengths,
        z_hat, ckpt, alpha_hat, anorm2, tables,
    )
    return nll, res


def _ctc_nll_bwd(blank, every, res, g):
    (
        log_probs, targets, input_lengths, target_lengths,
        z_hat, ckpt, alpha_hat, anorm2, tables,
    ) = res
    t_max, n, num_classes = log_probs.shape
    finite = z_hat > LOG0_THRESHOLD
    z_hat_safe = jnp.where(finite, z_hat, 0.0)

    lp_ext = gather_lp_ext(log_probs, tables)  # cheap regather (major-axis)
    if every:
        log_gamma = ctc_backward_scan_ckpt(
            lp_ext, ckpt, z_hat_safe, tables.skip2,
            input_lengths, target_lengths, every,
        )
    else:
        log_gamma = ctc_backward_scan(
            lp_ext, alpha_hat, anorm2, z_hat_safe, tables.skip2,
            input_lengths, target_lengths,
        )
    _, _, expf = _ops(log_probs.dtype)
    gamma = expf(jnp.minimum(log_gamma, 0.0))
    gamma = jnp.where(finite[None, :, None], gamma, 0.0)
    gamma = jnp.where(tables.valid[None], gamma, 0.0)

    post = _posterior_to_vocab(gamma, targets, blank, num_classes)
    grad = jnp.exp(log_probs) - post
    t_mask = (
        jnp.arange(t_max, dtype=jnp.int32)[:, None]
        < input_lengths[None, :].astype(jnp.int32)
    )
    grad = grad * t_mask[:, :, None] * g[None, :, None]

    f0 = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return (
        grad.astype(log_probs.dtype),
        f0(targets),
        f0(input_lengths),
        f0(target_lengths),
    )


ctc_nll_xla.defvjp(_ctc_nll_fwd, _ctc_nll_bwd)


# ---------------------------------------------------------------------------
# Checkpointed (rematerializing) variant for long T: store one scan carry per
# K-step chunk in the forward pass; the backward pass recomputes each chunk's
# alpha rows from its checkpoint before running the beta scan through it.
# ---------------------------------------------------------------------------


def _make_alpha_step(laddexp3, skip2, il, tl, L, dtype):
    """Alpha step with the t==0 initialization folded in (branchless)."""
    pos = jnp.arange(L, dtype=jnp.int32)
    init_mask = (pos[None, :] == 0) | ((pos[None, :] == 1) & (tl[:, None] > 0))

    def step(carry, lp_t, t):
        a_hat, norm2 = carry
        a1 = _shift_right(a_hat, 1)
        a2 = jnp.where(skip2, _shift_right(a_hat, 2), LOG0)
        upd = laddexp3(a_hat, a1, a2) + lp_t
        init = jnp.where(init_mask, lp_t, LOG0)
        anew = jnp.maximum(jnp.where(t == 0, init, upd), LOG0)
        m, m_i = _renorm_shift(jnp.max(anew, axis=-1))
        a_hat_new = jnp.maximum(anew - m[:, None], LOG0)
        live = (t < il)
        a_hat = jnp.where(live[:, None], a_hat_new, a_hat)
        norm2 = jnp.where(live, norm2 + m_i, norm2)
        return (a_hat, norm2)

    return step


def _pad_chunks(x, every, fill):
    """(T, ...) -> (n_chunks, every, ...) with fill-padding at the tail."""
    t = x.shape[0]
    n_chunks = -(-t // every)
    pad = n_chunks * every - t
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        )
    return x.reshape((n_chunks, every) + x.shape[1:])


def ctc_forward_scan_ckpt(lp_ext, skip2, input_lengths, target_lengths, every):
    """Alpha scan storing one carry per chunk.  Returns (nll, log_z, z_hat,
    ckpt) where ckpt = (a_hat (C,N,L), norm2 (C,N)) carries at chunk starts."""
    t_max, n, L = lp_ext.shape
    laddexp3, laddexp2, _ = _ops(lp_ext.dtype)
    il = input_lengths.astype(jnp.int32)
    tl = target_lengths.astype(jnp.int32)
    step = _make_alpha_step(laddexp3, skip2, il, tl, L, lp_ext.dtype)

    lp_c = _pad_chunks(lp_ext, every, LOG0)
    n_chunks = lp_c.shape[0]
    ts_c = _pad_chunks(jnp.arange(n_chunks * every, dtype=jnp.int32), every, 0)

    def chunk(carry, xs):
        lp_chunk, ts_chunk = xs
        ckpt = carry

        def inner(c, x):
            return step(c, x[0], x[1]), None

        carry2, _ = jax.lax.scan(inner, carry, (lp_chunk, ts_chunk))
        return carry2, ckpt

    carry0 = (jnp.full((n, L), LOG0, lp_ext.dtype), jnp.zeros((n,), jnp.int32))
    (a_hat_f, norm2_f), ckpt = jax.lax.scan(chunk, carry0, (lp_c, ts_c))

    end1 = jnp.take_along_axis(a_hat_f, (2 * tl)[:, None], axis=1)[:, 0]
    end2 = jnp.take_along_axis(a_hat_f, jnp.maximum(2 * tl - 1, 0)[:, None], axis=1)[:, 0]
    end2 = jnp.where(tl > 0, end2, LOG0)
    z_hat = laddexp2(end1, end2)
    log_z = z_hat + norm2_f.astype(lp_ext.dtype) * 0.5
    finite = z_hat > LOG0_THRESHOLD
    nll = jnp.where(finite, -log_z, jnp.inf)
    # Final norm rides along for the posterior shift in the backward pass.
    return nll, jnp.where(finite, log_z, LOG0), z_hat, (ckpt, norm2_f)


def ctc_backward_scan_ckpt(
    lp_ext, ckpt, z_hat, skip2, input_lengths, target_lengths, every
):
    """Chunked beta scan with per-chunk alpha recomputation.  Returns the log
    state posteriors (T, N, L) like ctc_backward_scan."""
    (ckpt_carries, anorm_end2) = ckpt
    t_max, n, L = lp_ext.shape
    laddexp3, _, _ = _ops(lp_ext.dtype)
    pos = jnp.arange(L, dtype=jnp.int32)
    il = input_lengths.astype(jnp.int32)
    tl = target_lengths.astype(jnp.int32)
    astep = _make_alpha_step(laddexp3, skip2, il, tl, L, lp_ext.dtype)

    skip2_succ = _shift_left_bool(skip2, 2)
    init_row = jnp.where(
        (pos[None, :] == 2 * tl[:, None])
        | ((pos[None, :] == 2 * tl[:, None] - 1) & (tl[:, None] > 0)),
        0.0,
        LOG0,
    ).astype(lp_ext.dtype)

    lp_next = jnp.concatenate(
        [lp_ext[1:], jnp.full((1, n, L), LOG0, lp_ext.dtype)], axis=0
    )
    lp_c = _pad_chunks(lp_ext, every, LOG0)
    lpn_c = _pad_chunks(lp_next, every, LOG0)
    n_chunks = lp_c.shape[0]
    ts_c = _pad_chunks(jnp.arange(n_chunks * every, dtype=jnp.int32), every, 0)
    # Padded tail steps have t >= T >= il so the is_pad branch handles them.

    def beta_step(carry, xs):
        b_hat, bnorm2 = carry
        lp_nt, alpha_t, anorm2_t, t = xs
        bsum = b_hat + lp_nt
        b1 = _shift_left(bsum, 1)
        b2 = jnp.where(skip2_succ, _shift_left(bsum, 2), LOG0)
        bnew = jnp.maximum(laddexp3(bsum, b1, b2), LOG0)
        m, m_i = _renorm_shift(jnp.max(bnew, axis=-1))
        b_hat_cand = jnp.maximum(bnew - m[:, None], LOG0)
        bnorm2_cand = bnorm2 + m_i
        is_init = (t == il - 1)[:, None]
        is_pad = (t >= il)[:, None]
        b_hat = jnp.where(is_init, init_row, jnp.where(is_pad, LOG0, b_hat_cand))
        bnorm2 = jnp.where(
            is_init[:, 0], 0, jnp.where(is_pad[:, 0], 0, bnorm2_cand)
        ).astype(jnp.int32)
        shift = (anorm2_t + bnorm2 - anorm_end2).astype(lp_ext.dtype) * 0.5
        ab_t = alpha_t + b_hat + (shift - z_hat)[:, None]
        return (b_hat, bnorm2), ab_t

    def chunk(carry_b, xs):
        ckpt_carry, lp_chunk, lpn_chunk, ts_chunk = xs

        # recompute this chunk's alpha rows from the checkpoint
        def inner_a(c, x):
            new = astep(c, x[0], x[1])
            return new, new

        _, (a_rows, n_rows) = jax.lax.scan(inner_a, ckpt_carry, (lp_chunk, ts_chunk))
        carry_b, gamma_chunk = jax.lax.scan(
            beta_step, carry_b, (lpn_chunk, a_rows, n_rows, ts_chunk), reverse=True
        )
        return carry_b, gamma_chunk

    carry_b0 = (
        jnp.full((n, L), LOG0, lp_ext.dtype) + 0.0 * lp_ext[0],
        jnp.zeros((n,), jnp.int32) + 0 * il,
    )
    _, gamma_chunks = jax.lax.scan(
        chunk, carry_b0, (ckpt_carries, lp_c, lpn_c, ts_c), reverse=True
    )
    return gamma_chunks.reshape(n_chunks * every, n, L)[:t_max]
