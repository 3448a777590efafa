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

Cost grows by a factor of L over the sequential scan, so this pays off only
for EXTREME T with small-to-moderate S (SURVEY.md §3.3: "only worth it for
extreme T; NOT in minimum slice").  Forward (loss) only — training at such T
should use `ctc_loss(..., checkpoint_every=K)` on a batch-sharded mesh
instead.  Numerics: plain jnp logsumexp (no fastmath polys) — this is a
scaling demonstrator, tested to ~1e-4 of the sequential path.
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
    """
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
