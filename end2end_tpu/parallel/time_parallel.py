"""Sequence-parallel (time-sharded) CTC forward over a device mesh.

SURVEY.md §3.3 / §7: the alpha recurrence is a LINEAR recurrence in the log
semiring (⊕ = logaddexp, ⊗ = +), so per-chunk transition operators compose
associatively — the CTC analog of context parallelism for extreme T:

  alpha_t = M_t ⊗ alpha_{t-1},   M_t[s', s] = lp_ext[t, s'] for
                                  s ∈ {s', s'-1, s'-2 (if allowed)}

Each device owns a T/D chunk: it evolves the L x L composite operator of its
chunk locally (banded updates, O(T_local * L^2)), the D tiny operators are
all-gathered over ICI, every device composes its exclusive prefix (D is
small), recovers its true entry state, and the last chunk's owner reads off
the likelihood.  Total comm: one all-gather of (D, N, L, L) log-matrices.

Cost grows by a factor of L over the sequential scan (forward only), so
this pays off only for EXTREME T with small-to-moderate S (SURVEY.md §3.3:
"only worth it for extreme T; NOT in minimum slice").

TRAINABLE (round 2): the custom VJP derives each chunk's alpha ENTRY state
(exclusive prefix composition of the all-gathered chunk operators) and beta
EXIT state (exclusive suffix composition applied to the end indicator),
then runs cheap O(T_local * L) local alpha/beta scans per shard, emitting
the fused gradient `exp(lp) - posterior` for its own time chunk — the
backward pass costs no L^2 work and the same single all-gather as the
forward.  Gradient == the sequential implementations' gradient (tested on
the 8-device CPU mesh).

Numerics: plain jnp logsumexp (no fastmath polys) — tested to ~1e-4 of the
sequential path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ctc_common import build_ctc_tables, gather_lp_ext
from ..ops.semiring import LOG0, LOG0_THRESHOLD


def _compose(b, a):
    """(B ⊗ A)[i, j] = logsumexp_k B[i, k] + A[k, j]; batched over leading dims."""
    x = b[..., :, :, None] + a[..., None, :, :]
    m = jnp.max(x, axis=-2, keepdims=True)
    m_safe = jnp.maximum(m, LOG0)
    out = jnp.squeeze(m_safe, -2) + jnp.log(
        jnp.sum(jnp.exp(x - m_safe), axis=-2)
    )
    return jnp.where(jnp.squeeze(m, -2) > LOG0_THRESHOLD, out, LOG0)


def _chunk_operator(lp_chunk, ts_chunk, skip2, il):
    """Evolve the composite operator of a chunk: (T_c, N, L) -> (N, L, L)."""
    t_c, n, L = lp_chunk.shape
    # derive from the (possibly mesh-varying) input so scan carry types match
    eye = jnp.where(
        jnp.eye(L, dtype=bool)[None], 0.0, LOG0
    ) + 0.0 * lp_chunk[0][:, None, :]

    def step(m_op, xs):
        lp_t, t = xs
        # new row s of the operator combines rows s, s-1, s-2 (banded), then
        # adds the emission lp_t[s]; frozen past each sample's length.
        r0 = m_op
        r1 = jnp.pad(m_op, ((0, 0), (1, 0), (0, 0)), constant_values=LOG0)[:, :-1]
        r2 = jnp.pad(m_op, ((0, 0), (2, 0), (0, 0)), constant_values=LOG0)[:, :-2]
        r2 = jnp.where(skip2[:, :, None], r2, LOG0)
        stack = jnp.stack([r0, r1, r2], axis=0)
        m = jnp.max(stack, axis=0)
        m_safe = jnp.maximum(m, LOG0)
        new = m_safe + jnp.log(jnp.sum(jnp.exp(stack - m_safe), axis=0))
        new = jnp.where(m > LOG0_THRESHOLD, new, LOG0) + lp_t[:, :, None]
        new = jnp.maximum(new, LOG0)
        live = (t < il)[:, None, None]
        return jnp.where(live, new, m_op), None

    op, _ = jax.lax.scan(step, eye, (lp_chunk, ts_chunk))
    return op


def ctc_nll_time_parallel(
    log_probs, targets, input_lengths, target_lengths, mesh: Mesh,
    blank: int = 0, axis_name: str = "time",
):
    """Per-sample CTC NLL with the TIME axis sharded over the mesh.

    log_probs: (T, N, C) with T divisible by the mesh size.  Returns (N,)
    nll identical (to f32 tolerance) to the sequential implementations.
    Differentiable wrt log_probs (time-sharded fused gradient; see module
    docstring).
    """
    return _ctc_nll_tp(
        log_probs, targets, input_lengths, target_lengths, mesh, blank,
        axis_name,
    )


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ctc_nll_tp(
    log_probs, targets, input_lengths, target_lengths, mesh,
    blank, axis_name,
):
    t_max, n, _ = log_probs.shape
    d = mesh.devices.size
    if t_max % d:
        raise ValueError(f"T={t_max} must divide over {d} devices")
    num_classes = log_probs.shape[-1]
    tables = build_ctc_tables(targets, target_lengths, blank, num_classes)
    lp_ext = gather_lp_ext(log_probs, tables)  # (T, N, L)
    L = lp_ext.shape[-1]
    il = jnp.asarray(input_lengths, jnp.int32)
    tl = jnp.asarray(target_lengths, jnp.int32)
    ts = jnp.arange(t_max, dtype=jnp.int32)

    lp_ext = jax.device_put(lp_ext, NamedSharding(mesh, P(axis_name, None, None)))
    ts = jax.device_put(ts, NamedSharding(mesh, P(axis_name)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None, None), P(axis_name), P(), P(), P()),
        out_specs=P(),
        # every device composes the same all-gathered chain, so the output
        # is replicated by construction — the static checker can't see that
        check_vma=False,
    )
    def run(lp_chunk, ts_chunk, skip2, il_, tl_):
        op = _chunk_operator(lp_chunk, ts_chunk, skip2, il_)  # (N, L, L)
        ops = jax.lax.all_gather(op, axis_name)  # (D, N, L, L), time order

        # Every device composes the full chain (D is tiny) — identical
        # replicated result, so out_specs=P() is consistent.  Frozen (past-
        # length) chunk steps left their operator untouched, so the final
        # composition IS alpha at t = il-1 for every sample.
        def fold(acc, o):
            return _compose(o, acc), None

        eye = jnp.where(jnp.eye(L, dtype=bool)[None], 0.0, LOG0) + 0.0 * op
        full, _ = jax.lax.scan(fold, eye, ops)

        # Virtual alpha_{-1}: mass 0 at s=0 only.  M_0 applied to it yields
        # exactly the classic init (s=0 self-loop, s=1 step; the s=2 skip is
        # blocked because state 2 is a blank state).
        pos = jnp.arange(L, dtype=jnp.int32)
        a_init = jnp.where(pos[None, :] == 0, 0.0, LOG0) * jnp.ones(
            (lp_chunk.shape[1], 1), lp_chunk.dtype
        )
        x = full + a_init[:, None, :]
        m = jnp.max(x, axis=-1, keepdims=True)
        m_safe = jnp.maximum(m, LOG0)
        alpha = jnp.squeeze(m_safe, -1) + jnp.log(
            jnp.sum(jnp.exp(x - m_safe), axis=-1)
        )
        alpha = jnp.where(jnp.squeeze(m, -1) > LOG0_THRESHOLD, alpha, LOG0)

        end1 = jnp.take_along_axis(alpha, (2 * tl_)[:, None], axis=1)[:, 0]
        end2 = jnp.take_along_axis(
            alpha, jnp.maximum(2 * tl_ - 1, 0)[:, None], axis=1
        )[:, 0]
        end2 = jnp.where(tl_ > 0, end2, LOG0)
        mx = jnp.maximum(end1, end2)
        z = jnp.where(
            mx > LOG0_THRESHOLD,
            jnp.maximum(end1, end2)
            + jnp.log1p(jnp.exp(-jnp.abs(end1 - end2))),
            LOG0,
        )
        # all devices computed the same full composition; out_specs=P()
        # replicates — take device D-1's (identical) value.
        nll = jnp.where(z > LOG0_THRESHOLD, -z, jnp.inf)
        return nll

    return run(lp_ext, ts, tables.skip2, il, tl)


def _apply_vec(m_op, v):
    """(M ⊗ v)[s'] = logsumexp_s M[s', s] + v[s]; batched over leading dims."""
    x = m_op + v[..., None, :]
    m = jnp.max(x, axis=-1, keepdims=True)
    m_safe = jnp.maximum(m, LOG0)
    out = jnp.squeeze(m_safe, -1) + jnp.log(
        jnp.sum(jnp.exp(x - m_safe), axis=-1)
    )
    return jnp.where(jnp.squeeze(m, -1) > LOG0_THRESHOLD, out, LOG0)


def _logaddexp3_rows(r0, r1, r2):
    stack = jnp.stack([r0, r1, r2], axis=0)
    m = jnp.max(stack, axis=0)
    m_safe = jnp.maximum(m, LOG0)
    out = m_safe + jnp.log(jnp.sum(jnp.exp(stack - m_safe), axis=0))
    return jnp.where(m > LOG0_THRESHOLD, out, LOG0)


def _nll_tp_fwd(log_probs, targets, input_lengths, target_lengths, mesh,
                blank, axis_name):
    nll = _ctc_nll_tp.fun(
        log_probs, targets, input_lengths, target_lengths, mesh, blank,
        axis_name,
    )
    return nll, (log_probs, targets, input_lengths, target_lengths, nll)


def _nll_tp_bwd(mesh, blank, axis_name, res, g):
    """Time-sharded fused gradient: per chunk, recover the alpha entry /
    beta exit boundary states from the composed chunk operators, run local
    O(T_local * L) alpha/beta scans, and emit `exp(lp) - posterior` for the
    chunk's own frames."""
    log_probs, targets, input_lengths, target_lengths, nll = res
    from ..ops.ctc_loss_xla import _posterior_to_vocab

    t_max, n, num_classes = log_probs.shape
    d = mesh.devices.size
    tables = build_ctc_tables(targets, target_lengths, blank, num_classes)
    lp_ext = gather_lp_ext(log_probs, tables)  # (T, N, L)
    L = lp_ext.shape[-1]
    il = jnp.asarray(input_lengths, jnp.int32)
    tl = jnp.asarray(target_lengths, jnp.int32)
    ts = jnp.arange(t_max, dtype=jnp.int32)
    log_z = jnp.where(jnp.isfinite(nll), -nll, 0.0)
    finite = jnp.isfinite(nll)

    lp_ext = jax.device_put(lp_ext, NamedSharding(mesh, P(axis_name, None, None)))
    lp_raw = jax.device_put(log_probs, NamedSharding(mesh, P(axis_name, None, None)))
    ts = jax.device_put(ts, NamedSharding(mesh, P(axis_name)))

    pos = jnp.arange(L, dtype=jnp.int32)
    end_vec = jnp.where(
        (pos[None, :] == 2 * tl[:, None])
        | ((pos[None, :] == 2 * tl[:, None] - 1) & (tl[:, None] > 0)),
        0.0,
        LOG0,
    ).astype(log_probs.dtype)  # (N, L)
    skip2s = jnp.pad(tables.skip2, ((0, 0), (0, 2)))[:, 2:]  # s -> s+2 allowed

    targets_i = jnp.asarray(targets, jnp.int32)
    pos_l = pos

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(axis_name, None, None), P(axis_name, None, None), P(axis_name),
            P(), P(), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )
    def run(lp_chunk, lp_raw_chunk, ts_chunk, skip2, skip2s_, il_,
            end_vec_, log_z_, g_, targets_, finite_, pos_):
        c = jax.lax.axis_index(axis_name)
        op = _chunk_operator(lp_chunk, ts_chunk, skip2, il_)  # (N, L, L)
        ops = jax.lax.all_gather(op, axis_name)  # (D, N, L, L)
        eye = jnp.where(jnp.eye(L, dtype=bool)[None], 0.0, LOG0) + 0.0 * op

        # exclusive prefix composition -> my chunk's alpha ENTRY state
        def pfold(acc, o):
            return _compose(o, acc), acc

        _, prefixes = jax.lax.scan(pfold, eye, ops)  # prefixes[c] excl.
        my_prefix = prefixes[c]
        a_init = jnp.where(
            pos_[None, :] == 0, 0.0, LOG0
        ) * jnp.ones((lp_chunk.shape[1], 1), lp_chunk.dtype)
        a_entry = _apply_vec(my_prefix, a_init)  # (N, L)

        # exclusive suffix composition -> my chunk's beta EXIT state
        # (beta at my last frame): transpose-apply to the end indicator
        def sfold(acc, o):
            return _compose(acc, o), acc

        _, suffixes_rev = jax.lax.scan(sfold, eye, ops[::-1])
        my_suffix = suffixes_rev[::-1][c]  # M_{D-1} ∘ ... ∘ M_{c+1}
        b_exit = _apply_vec(
            jnp.swapaxes(my_suffix, -1, -2), end_vec_
        )  # (N, L)

        # local alpha scan (emits alpha per frame)
        def astep(a, xs):
            lp_t, t = xs
            a1 = jnp.pad(a, ((0, 0), (1, 0)), constant_values=LOG0)[:, :-1]
            a2 = jnp.pad(a, ((0, 0), (2, 0)), constant_values=LOG0)[:, :-2]
            a2 = jnp.where(skip2, a2, LOG0)
            anew = _logaddexp3_rows(a, a1, a2) + lp_t
            anew = jnp.maximum(anew, LOG0)
            a = jnp.where((t < il_)[:, None], anew, a)
            return a, a

        _, alpha = jax.lax.scan(astep, a_entry, (lp_chunk, ts_chunk))

        # local beta scan, walking back from the chunk's last frame; the
        # boundary overrides (t == il-1 -> end indicator; t >= il -> log0)
        # land exactly where the sequential scan puts them.
        def bstep(b_next, xs):
            lp_next, t = xs  # lp at frame t+1 (LOG0 row past the chunk)
            bsum = b_next + lp_next
            b1 = jnp.pad(bsum, ((0, 0), (0, 1)), constant_values=LOG0)[:, 1:]
            b2 = jnp.pad(bsum, ((0, 0), (0, 2)), constant_values=LOG0)[:, 2:]
            b2 = jnp.where(skip2s_, b2, LOG0)
            bnew = jnp.maximum(_logaddexp3_rows(bsum, b1, b2), LOG0)
            is_init = (t == il_ - 1)[:, None]
            is_pad = (t >= il_)[:, None]
            b = jnp.where(is_init, end_vec_, jnp.where(is_pad, LOG0, bnew))
            return b, b

        t_last = ts_chunk[-1]
        b_last = jnp.where(
            (t_last == il_ - 1)[:, None], end_vec_,
            jnp.where((t_last >= il_)[:, None], LOG0, b_exit),
        )
        lp_next = jnp.concatenate(
            [lp_chunk[1:], jnp.full((1,) + lp_chunk.shape[1:], LOG0,
                                    lp_chunk.dtype)],
            axis=0,
        )
        # frame T_local-1 is the boundary (b_last); scan the rest reversed
        _, beta_rev = jax.lax.scan(
            bstep, b_last, (lp_next[:-1][::-1], ts_chunk[:-1][::-1])
        )
        beta = jnp.concatenate([beta_rev[::-1], b_last[None]], axis=0)

        log_gamma = alpha + beta - log_z_[None, :, None]
        gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
        t_mask = (ts_chunk[:, None] < il_[None, :]) & finite_[None, :]
        gamma = jnp.where(t_mask[:, :, None], gamma, 0.0)
        post = _posterior_to_vocab(gamma, targets_, blank, lp_raw_chunk.shape[-1])
        grad = (jnp.exp(lp_raw_chunk) - post) * t_mask[:, :, None]
        return grad * g_[None, :, None]

    grad = run(lp_ext, lp_raw, ts, tables.skip2, skip2s, il, end_vec,
               log_z, g, targets_i, finite, pos_l)
    import numpy as np

    f0 = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return (
        grad.astype(log_probs.dtype),
        f0(targets),
        f0(input_lengths),
        f0(target_lengths),
    )


_ctc_nll_tp.defvjp(_nll_tp_fwd, _nll_tp_bwd)
