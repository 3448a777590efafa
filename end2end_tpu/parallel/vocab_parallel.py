"""Tensor-parallel (vocab-sharded) CTC loss over a device mesh.

SURVEY.md §3.3 notes the reference never needed TP because its configs keep
V <= 1024.  Production BPE vocabularies reach 10^5+, where the (T, N, V)
log-prob / gradient tensors dominate memory — the natural TPU-native
sharding is the VOCAB dim over the mesh ('model' axis), matching how a
tensor-parallel decoder layer already lays out its output projection.

Mechanics (one collective each way):

  forward: each device one-hot-gathers the extended-label emissions it OWNS
  (labels falling in its vocab slice; everything else contributes log-zero),
  a single psum over ICI assembles the replicated (T, N, L) lattice — tiny
  next to V — and the alpha scan runs replicated (compute is O(T*N*L),
  independent of V).

  backward: the beta scan + posteriors run replicated; each device emits its
  OWN grad slice  `(exp(lp_local) - scatter_local(gamma)) * mask * g`  with
  no further communication (the posterior scatter targets only labels the
  device owns).

Assembly is EXACT: every valid lattice state has exactly one owner, so the
psum of `(where(own, lp, 0), own)` pairs reconstructs each cell as
`lp + 0 + ... + 0` bit-exactly, with the owner-count selecting log-zero for
unowned (invalid) states.

Numerics are IDENTICAL to the sequential XLA path (same scans, same
fastmath): tested loss and grad equality on the virtual 8-device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ctc_common import build_ctc_tables
from ..ops.ctc_loss_xla import ctc_backward_scan, ctc_forward_scan
from ..ops.fastmath import exp32, log32
from ..ops.semiring import LOG0, LOG0_THRESHOLD


def _local_lp_ext(lp_local, tables, v_start, v_local):
    """One-hot gather of the emissions this device owns.  Returns
    (values (T, N, L) with lp where owned else 0, owner mask (N, L))."""
    lab = jnp.where(tables.valid, tables.ext_labels, -1)  # (N, L) global ids
    local = lab - v_start
    own = (local >= 0) & (local < v_local)
    idx = jnp.clip(local, 0, v_local - 1)
    g = jnp.take_along_axis(
        jnp.moveaxis(lp_local, 0, 2),  # (N, V_local, T)
        idx[:, :, None],
        axis=1,
    )  # (N, L, T)
    g = jnp.moveaxis(g, 2, 0)  # (T, N, L)
    return jnp.where(own[None, :, :], g, 0.0), own


def _assemble_lp_ext(lp_local, tabs, v_start, v_local, vocab_axis, valid):
    """psum-assemble the replicated (T, N, L) lattice from per-device
    slices; exact because each valid state has exactly one owner."""
    part, own = _local_lp_ext(lp_local, tabs, v_start, v_local)
    summed, cnt = jax.lax.psum(
        (part, own.astype(jnp.float32)), vocab_axis
    )
    lp_ext = jnp.where((cnt > 0)[None], summed, LOG0)
    return jnp.where(valid[None], lp_ext, LOG0)


def ctc_nll_vocab_parallel(
    log_probs, targets, input_lengths, target_lengths, mesh: Mesh,
    blank: int = 0, vocab_axis: str = "model",
):
    """Per-sample CTC NLL with the VOCAB axis sharded over the mesh.

    log_probs: (T, N, V) with V divisible by the mesh's `vocab_axis` size.
    Returns (N,) nll, differentiable wrt log_probs with the gradient sharded
    the same way (each device writes only its vocab slice).
    """
    return _ctc_nll_vp(
        log_probs, targets, input_lengths, target_lengths, mesh, blank,
        vocab_axis,
    )


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ctc_nll_vp(log_probs, targets, input_lengths, target_lengths, mesh,
                blank, vocab_axis):
    nll, _ = _vp_fwd_impl(
        log_probs, targets, input_lengths, target_lengths, mesh, blank,
        vocab_axis, want_residuals=False,
    )
    return nll


def _vp_common(log_probs, targets, target_lengths, mesh, blank, vocab_axis):
    t_max, n, v = log_probs.shape
    d = mesh.shape[vocab_axis]
    if v % d:
        raise ValueError(f"V={v} must divide over {d} '{vocab_axis}' devices")
    tables = build_ctc_tables(
        jnp.asarray(targets, jnp.int32),
        jnp.asarray(target_lengths, jnp.int32), blank, v,
    )
    lp = jax.device_put(
        log_probs, NamedSharding(mesh, P(None, None, vocab_axis))
    )
    return lp, tables, v // d


def _vp_fwd_impl(log_probs, targets, input_lengths, target_lengths, mesh,
                 blank, vocab_axis, want_residuals=True):
    lp, tables, v_local = _vp_common(
        log_probs, targets, target_lengths, mesh, blank, vocab_axis
    )
    il = jnp.asarray(input_lengths, jnp.int32)
    tl = jnp.asarray(target_lengths, jnp.int32)
    # primal-only calls skip the (T, N, L) alpha-tape residuals entirely
    out_specs = (P(), P(), P(), P()) if want_residuals else P()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, vocab_axis), P(), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,  # psum-assembled lattice -> replicated by math
    )
    def run(lp_local, ext_labels, valid, skip2, args):
        il_, tl_ = args
        tabs = type(tables)(ext_labels, skip2, valid)
        lp_ext = _assemble_lp_ext(
            lp_local, tabs, jax.lax.axis_index(vocab_axis) * v_local,
            v_local, vocab_axis, valid,
        )  # (T, N, L) replicated
        nll, _, z_hat, alpha_hat, anorm2 = ctc_forward_scan(
            lp_ext, skip2, il_, tl_
        )
        if not want_residuals:
            return nll
        return nll, z_hat, alpha_hat, anorm2

    out = run(lp, tables.ext_labels, tables.valid, tables.skip2, (il, tl))
    if not want_residuals:
        return out, None
    nll, z_hat, alpha_hat, anorm2 = out
    return nll, (z_hat, alpha_hat, anorm2)


def _vp_fwd(log_probs, targets, input_lengths, target_lengths, mesh, blank,
            vocab_axis):
    nll, res = _vp_fwd_impl(
        log_probs, targets, input_lengths, target_lengths, mesh, blank,
        vocab_axis,
    )
    # residuals include the forward scan's alpha tape so the backward pass
    # runs ONLY the beta scan (matching the sequential path's custom VJP)
    return nll, (log_probs, targets, input_lengths, target_lengths) + res


def _vp_bwd(mesh, blank, vocab_axis, saved, g):
    (log_probs, targets, input_lengths, target_lengths,
     z_hat_r, alpha_hat_r, anorm2_r) = saved
    lp, tables, v_local = _vp_common(
        log_probs, targets, target_lengths, mesh, blank, vocab_axis
    )
    t_max = log_probs.shape[0]
    il = jnp.asarray(input_lengths, jnp.int32)
    tl = jnp.asarray(target_lengths, jnp.int32)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, vocab_axis), P(), P(), P(), P(), P(),
                  P(), P(), P()),
        out_specs=P(None, None, vocab_axis),
        check_vma=False,
    )
    def run(lp_local, ext_labels, valid, skip2, args, g_,
            z_hat, alpha_hat, anorm2):
        il_, tl_ = args
        tabs = type(tables)(ext_labels, skip2, valid)
        v_start = jax.lax.axis_index(vocab_axis) * v_local
        lp_ext = _assemble_lp_ext(
            lp_local, tabs, v_start, v_local, vocab_axis, valid
        )
        finite = z_hat > LOG0_THRESHOLD
        z_hat_safe = jnp.where(finite, z_hat, 0.0)
        log_post = ctc_backward_scan(
            lp_ext, alpha_hat, anorm2, z_hat_safe, skip2, il_, tl_
        )  # (T, N, L)
        # exp32, exactly like the sequential bwd — the vocab-parallel grad
        # is bit-identical to the sequential one
        gamma = exp32(jnp.minimum(log_post, 0.0))
        t_mask = (
            (jnp.arange(t_max, dtype=jnp.int32)[:, None] < il_[None, :])
            & finite[None, :]
        )
        gamma = jnp.where(
            t_mask[:, :, None] & valid[None], gamma, 0.0
        )
        # local posterior scatter: only the labels this device owns
        lab = jnp.where(valid, ext_labels, -1) - v_start  # (N, L) local ids
        own = (lab >= 0) & (lab < v_local)
        idx = jnp.where(own, lab, v_local)  # dump non-owned to a drop slot
        n_ = gamma.shape[1]
        gamma_nlt = jnp.moveaxis(gamma, 0, 2)  # (N, L, T)
        acc = jnp.zeros((n_, v_local + 1, t_max), gamma.dtype)
        acc = acc.at[
            jnp.arange(n_, dtype=jnp.int32)[:, None], idx, :
        ].add(gamma_nlt, mode="drop")
        post_local = jnp.moveaxis(acc[:, :v_local], 2, 0)  # (T, N, V_local)
        grad = (jnp.exp(lp_local) - post_local) * t_mask[:, :, None]
        return grad * g_[None, :, None]

    grad = run(lp, tables.ext_labels, tables.valid, tables.skip2, (il, tl),
               jnp.asarray(g), z_hat_r, alpha_hat_r, anorm2_r)
    f0 = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return (
        grad.astype(log_probs.dtype),
        f0(targets),
        f0(input_lengths),
        f0(target_lengths),
    )


_ctc_nll_vp.defvjp(_vp_fwd, _vp_bwd)


# --------------------------------------------------------------------------
# Vocab-sharded decoding
# --------------------------------------------------------------------------
#
# Decoding over a vocab-sharded lattice never materializes the full (T,N,V)
# on one device: shard_map computes the per-frame winners (greedy) or the
# merged top-K candidate set (beam) with one small collective, and the
# sequential decode runs on those replicated candidates — compute
# independent of V, exactly like the loss above.

_BIG_I32 = np.int32(1 << 30)


def greedy_decode_vocab_parallel(log_probs, input_lengths=None,
                                 mesh: Mesh = None, blank: int = 0,
                                 vocab_axis: str = "model", pad_id: int = -1):
    """`greedy_decode` with the VOCAB axis sharded over the mesh — EXACT
    (identical tokens/lengths/scores incl. argmax tie-breaks).

    Per frame each device reduces its slice; a pmax/pmin pair picks the
    global winner with the smallest global id on ties (jnp.argmax order).
    """
    t_max, n, v = log_probs.shape
    d = mesh.shape[vocab_axis]
    if v % d:
        raise ValueError(f"V={v} must divide over {d} '{vocab_axis}' devices")
    v_local = v // d
    lp = jax.device_put(
        jnp.asarray(log_probs), NamedSharding(mesh, P(None, None, vocab_axis))
    )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(None, None, vocab_axis), out_specs=(P(), P()),
        check_vma=False,  # psum/pmax outputs are replicated by math
    )
    def winners(lp_local):
        best_l = jnp.max(lp_local, axis=-1)                    # (T, N)
        id_l = jnp.argmax(lp_local, axis=-1).astype(jnp.int32)
        gid = id_l + jax.lax.axis_index(vocab_axis) * v_local
        best = jax.lax.pmax(best_l, vocab_axis)
        # smallest global id among the devices holding the max
        cand = jnp.where(best_l >= best, gid, _BIG_I32)
        ids = jax.lax.pmin(cand, vocab_axis)
        return ids, best

    ids, best = winners(lp)
    from ..ops.greedy import greedy_decode_from_path

    return greedy_decode_from_path(ids, best, input_lengths, blank=blank,
                                   pad_id=pad_id)


def beam_topk_prep_vocab_parallel(log_probs, mesh: Mesh, prune_k: int,
                                  blank: int = 0,
                                  vocab_axis: str = "model"):
    """Merged per-frame top-K over a vocab-sharded lattice.

    Each device takes a local top-k of its slice; one tiled all_gather
    (K*d tiny scalars per frame) plus a replicated top_k merge reproduces
    the GLOBAL `lax.top_k` exactly, tie-breaks included (the gather
    concatenates in device order, so equal values keep ascending-global-id
    order).  Returns replicated (lpk (T,N,K), ck (T,N,K), lpb (T,N))."""
    t_max, n, v = log_probs.shape
    d = mesh.shape[vocab_axis]
    if v % d:
        raise ValueError(f"V={v} must divide over {d} '{vocab_axis}' devices")
    v_local = v // d
    k = min(prune_k, v)
    k_local = min(k, v_local)
    lp = jax.device_put(
        jnp.asarray(log_probs), NamedSharding(mesh, P(None, None, vocab_axis))
    )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(None, None, vocab_axis), out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def prep(lp_local):
        v_start = jax.lax.axis_index(vocab_axis) * v_local
        lv, li = jax.lax.top_k(lp_local, k_local)
        gi = li.astype(jnp.int32) + v_start
        lv_all = jax.lax.all_gather(lv, vocab_axis, axis=2, tiled=True)
        gi_all = jax.lax.all_gather(gi, vocab_axis, axis=2, tiled=True)
        lpk, sel = jax.lax.top_k(lv_all, k)
        ck = jnp.take_along_axis(gi_all, sel, axis=2)
        # blank row: owned by exactly one device
        bl = blank - v_start
        own = (bl >= 0) & (bl < v_local)
        lpb = jax.lax.psum(
            jnp.where(own, lp_local[:, :, jnp.clip(bl, 0, v_local - 1)], 0.0),
            vocab_axis,
        )
        return lpk, ck, lpb

    return prep(lp)


def beam_search_decode_vocab_parallel(
    log_probs, input_lengths=None, mesh: Mesh = None, beam_width: int = 8,
    blank: int = 0, prune_k: int | None = None, max_symbols: int | None = None,
    lm=None, lm_alpha: float = 0.0, lm_beta: float = 0.0,
    vocab_axis: str = "model", implementation: str = "auto",
    return_timestamps: bool = False, token_min_logp: float | None = None,
    lm_chunk_t: int = 128, guide_lm=None,
):
    """`beam_search_decode` with the VOCAB axis sharded over the mesh.

    shard_map computes the merged top-K prep (above); the beam step runs on
    the replicated candidates — through the Pallas kernel on TPU when it
    applies (`implementation='auto'`, same routing as the single-device
    decode), else the candidate-only XLA scan (`beam_search_from_topk`).
    Both have identical candidate-only semantics: exact at prune_k >= V,
    else the documented repeat-prune.  LM fusion works unchanged (tables
    replicated; scoring touches candidates only).

    `implementation='chunked'` opts word-level / hashed / neural LMs into
    the chunked kernel path on the replicated candidates (the production
    BPE + word-LM regime at large V: sharded top-K prep feeds
    `beam_search_chunked_lm_from_topk`) — sharded == unsharded bitwise,
    since the merged prep reproduces global `lax.top_k` exactly.
    """
    from ..ops.beam_search import beam_search_from_topk
    from ..ops.beam_search_pallas import (
        beam_pallas_supported,
        beam_search_pallas_from_topk,
    )

    t_max, n, v = log_probs.shape
    if input_lengths is None:
        input_lengths = np.full((n,), t_max, np.int32)
    k = min(prune_k or v, v)
    s_cap = int(max_symbols or min(t_max, 512))
    lpk, ck, lpb = beam_topk_prep_vocab_parallel(
        log_probs, mesh, k, blank=blank, vocab_axis=vocab_axis
    )
    if token_min_logp is not None:
        # same mask as the single-device paths (applied to the MERGED
        # global candidates, so sharded == unsharded exactly)
        from ..ops.beam_search import apply_token_min_logp

        lpk, ck = apply_token_min_logp(lpk, ck, float(token_min_logp))
    if implementation not in ("auto", "pallas", "chunked", "xla"):
        raise ValueError(f"invalid implementation {implementation!r}")
    if guide_lm is not None and implementation != "chunked":
        raise ValueError("guide_lm is only meaningful with "
                         "implementation='chunked'")
    if implementation == "chunked":
        from ..ops.beam_chunked import beam_search_chunked_lm_from_topk

        return beam_search_chunked_lm_from_topk(
            lpk, ck, lpb, input_lengths, v=v, beam_width=beam_width,
            blank=blank, max_symbols=s_cap, lm=lm, lm_alpha=lm_alpha,
            lm_beta=lm_beta, chunk_t=lm_chunk_t,
            return_timestamps=return_timestamps, guide_lm=guide_lm,
        )
    if implementation != "xla":
        ok, reason = beam_pallas_supported(t_max, v, beam_width, k, lm,
                                           dtype=lpk.dtype)
        on_tpu = jax.default_backend() == "tpu"
        if implementation == "pallas" and not ok:
            raise ValueError(f"implementation='pallas' unsupported: {reason}")
        if ok and (on_tpu or implementation == "pallas"):
            return beam_search_pallas_from_topk(
                lpk, ck, lpb, input_lengths, beam_width=beam_width,
                blank=blank, max_symbols=s_cap, v=v, lm=lm,
                lm_alpha=lm_alpha, lm_beta=lm_beta,
                return_timestamps=return_timestamps,
            )
    return beam_search_from_topk(
        lpk, ck, lpb, input_lengths, int(beam_width), int(blank), s_cap,
        lm=lm, lm_alpha=float(lm_alpha), lm_beta=float(lm_beta),
        return_timestamps=return_timestamps,
    )


# ---------------------------------------------------------------------------
# Vocab-sharded FUSED transducer loss: TP for the joint projection.
#
# Two implementations, mirroring the single-device pair:
#   * rnnt_nll_fused_vocab_parallel (below) — f32 parity-grade, chunked XLA
#     logits with one all_gather + three psums per chunk;
#   * rnnt_nll_fused_pallas_vocab_parallel (re-exported from
#     ops/rnnt_joint_pallas.py) — the online-softmax KERNEL fast path,
#     bf16-storage budget, 4 floats exchanged per activation row.
# ---------------------------------------------------------------------------

from ..ops.rnnt_joint_pallas import (  # noqa: F401  (re-export: TP fast path)
    rnnt_nll_fused_pallas_vocab_parallel,
)

def rnnt_nll_fused_vocab_parallel(
        enc_proj, pred_proj, w_out, b_out, targets, input_lengths,
        target_lengths, mesh: Mesh, *, blank: int = 0, chunk_t: int = 64,
        activation=jnp.tanh, vocab_axis: str = "model"):
    """Fused-joint transducer NLL with the joint OUTPUT PROJECTION
    vocab-sharded over the mesh — TP for transducer training.

    The additive joint's ``(J, V)`` output matrix is the only V-sized
    parameter; sharding it over `vocab_axis` makes every per-chunk logits
    buffer ``(N, tc, U+1, V/D)`` shard-local.  Each device computes its
    logits slice, the log-softmax denominator is assembled with one
    all_gather+max (pmax has no differentiation rule — see the inline
    comment) + one psum per chunk, and the blank/label planes (each vocab
    entry has exactly one owner) with one psum each — all riding ICI.
    The replicated planes then run the wavefront DP (`rnnt_nll_from_
    planes`, fused plane-space posterior gradient); grads flow to
    `enc_proj`/`pred_proj` (replicated) and to each device's OWN
    `w_out`/`b_out` shard with no further communication.

    Combines with the chunked recompute of `rnnt_nll_fused` (chunks under
    ``jax.checkpoint`` inside ``lax.map``): peak per-device memory is
    O(N·T·U + N·tc·U·V/D).

    Args mirror `rnnt_nll_fused` with the additive joint spelled out
    (`w_out` (J, V), `b_out` (V,)); V must divide evenly by the mesh's
    `vocab_axis` size (pad `w_out` with columns whose `b_out` is a large
    negative number to round up — they then never win mass).
    """
    from ..ops.rnnt_loss import rnnt_nll_from_planes

    enc_proj = jnp.asarray(enc_proj, jnp.float32)
    pred_proj = jnp.asarray(pred_proj, jnp.float32)
    w_out = jnp.asarray(w_out, jnp.float32)
    b_out = jnp.asarray(b_out, jnp.float32)
    n, t_max, je = enc_proj.shape
    up = pred_proj.shape[1]
    j, v = w_out.shape
    nd = int(mesh.shape[vocab_axis])
    if v % nd != 0:
        raise ValueError(f"V={v} must divide the '{vocab_axis}' axis size "
                         f"{nd} (pad w_out/b_out)")
    v_loc = v // nd
    targets = jnp.asarray(targets)
    il = jnp.asarray(input_lengths, jnp.int32)
    ul = jnp.asarray(target_lengths, jnp.int32)
    y_ext = jnp.concatenate(
        [targets.astype(jnp.int32),
         jnp.zeros((n, up - targets.shape[1]), jnp.int32)], axis=1)
    u_ok = jnp.arange(up)[None] < ul[:, None]

    tc = max(1, min(int(chunk_t), t_max))
    n_chunks = -(-t_max // tc)
    t_pad = n_chunks * tc
    encp = jnp.pad(enc_proj, ((0, 0), (0, t_pad - t_max), (0, 0)))

    def shard_fn(encp_s, pred_s, w_l, b_l):
        v_start = jax.lax.axis_index(vocab_axis).astype(jnp.int32) * v_loc
        rel_b = blank - v_start                       # scalar per device
        own_b = (rel_b >= 0) & (rel_b < v_loc)
        rel_y = y_ext - v_start                       # (N, Up)
        own_y = (rel_y >= 0) & (rel_y < v_loc)
        oh_y = (jax.nn.one_hot(jnp.where(own_y, rel_y, 0), v_loc,
                               dtype=jnp.float32)
                * own_y[..., None].astype(jnp.float32))

        @jax.checkpoint
        def chunk_planes(enc_c):
            z = activation(enc_c[:, :, None, :] + pred_s[:, None])
            logits_l = z @ w_l + b_l                  # (N, tc, Up, v_loc)
            # max across shards via all_gather (pmax has no diff rule even
            # under stop_gradient); m is stability-only so its gradient is
            # cut before the collective.
            m_loc = jnp.max(jax.lax.stop_gradient(logits_l), axis=-1)
            m = jnp.max(jax.lax.all_gather(m_loc, vocab_axis), axis=0)
            # fastmath exp/log (same primitives as the unsharded fused
            # path's log_softmax32) so sharded == unsharded stays tight
            # on TPU, where XLA's default exp/log carry ~1e-4 abs error.
            se = jax.lax.psum(
                jnp.sum(exp32(logits_l - m[..., None]), axis=-1),
                vocab_axis)
            lse = m + log32(se)
            lp_l = logits_l - lse[..., None]
            b_c = jax.lax.psum(
                jnp.where(own_b,
                          jnp.take(lp_l, jnp.clip(rel_b, 0, v_loc - 1),
                                   axis=-1),
                          0.0), vocab_axis)
            l_c = jax.lax.psum(
                jnp.einsum("ntuv,nuv->ntu", lp_l, oh_y,
                           precision=jax.lax.Precision.HIGHEST),
                vocab_axis)
            return b_c, jnp.where(u_ok[:, None, :], l_c, LOG0)

        enc_chunks = jnp.moveaxis(
            encp_s.reshape(n, n_chunks, tc, je), 1, 0)
        b_ch, l_ch = jax.lax.map(chunk_planes, enc_chunks)
        b_pl = jnp.moveaxis(b_ch, 0, 1).reshape(n, t_pad, up)
        l_pl = jnp.moveaxis(l_ch, 0, 1).reshape(n, t_pad, up)
        return b_pl, l_pl

    b_pl, l_pl = partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(None, vocab_axis), P(vocab_axis)),
        out_specs=(P(), P()),
        check_vma=False,  # psum-assembled planes are replicated by math
    )(shard_fn)(encp, pred_proj, w_out, b_out)
    t_ok = (jnp.arange(t_pad)[None] < t_max)[:, :, None]
    b_pl = jnp.where(t_ok, b_pl, LOG0)
    l_pl = jnp.where(t_ok, l_pl, LOG0)
    return rnnt_nll_from_planes(b_pl, l_pl, il, ul)
