"""Prefix beam search as a fixed-width, shape-static `jax.lax.scan`.

Rebuild of the reference's C++ prefix beam-search decoder (SURVEY.md §3.1 N3).
The reference runs a per-sample dynamic hash-map beam loop on a CPU thread
pool; under XLA that control flow must compile once, so the beam state is a
static `(W, S_cap)` token matrix plus per-beam `(p_blank, p_non_blank)` in
log space and two 32-bit rolling prefix hashes (SURVEY.md §4.4, §7.3).

Per frame:
  1. top-K vocabulary pruning (`prune_k`),
  2. W "stay" candidates (blank extension + repeat-last, prefix unchanged)
     and W*K "extend" candidates (new prefixes),
  3. prefix merging: because live beams are always distinct prefixes, the only
     possible duplicates are extend-candidates equal to a stay-candidate's
     prefix; those are detected by hash equality and combined with logaddexp
     (the correctness property SURVEY.md §6.3 demands — never max),
  4. masked top-W pruning, gathering parent token rows for the survivors.

Batch parallelism is `jax.vmap` (the reference's thread pool, SURVEY.md §3.1
N4, dissolves into a vectorized axis).  Optional shallow-fusion LM hook: any
object implementing the `ShallowFusionLM` protocol in `lm.py` scores extend
candidates; its per-beam state rides along in the scan carry.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .semiring import LOG0, LOG0_THRESHOLD, logaddexp2
from .fastmath import log_softmax_acc

_M1 = np.uint32(2654435761)
_M2 = np.uint32(0x85EBCA6B)
_SEED1 = np.uint32(1)
_SEED2 = np.uint32(7)
_DEAD = np.uint32(0xDEAD0000)


def _top_w_iterative(scores, w):
    """Exact top-w of a 1-D score vector by repeated argmax (first-index tie
    break, same as lax.top_k).  Inside the decode scan this compiles to a few
    VPU fusions instead of a per-step SORT — the sort was ~36% of the beam
    loop on v5e (see scripts/profile_beam.py).  w is small and static."""
    n = scores.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    s = scores
    vals, idxs = [], []
    for _ in range(w):
        i = jnp.argmax(s).astype(jnp.int32)
        vals.append(s[i])
        idxs.append(i)
        s = jnp.where(iota == i, -jnp.inf, s)
    return jnp.stack(vals), jnp.stack(idxs)


def _masked_logsumexp(x, mask, axis):
    """logsumexp over `axis` counting only `mask`; empty -> LOG0.  Finite-safe."""
    xm = jnp.where(mask, x, LOG0)
    m = jnp.max(xm, axis=axis)
    m_safe = jnp.maximum(m, LOG0)
    s = jnp.sum(jnp.where(mask, jnp.exp(x - jnp.expand_dims(m_safe, axis)), 0.0), axis=axis)
    out = m_safe + jnp.log(jnp.maximum(s, 1e-38))
    return jnp.where(m > LOG0_THRESHOLD, out, LOG0)


def _beam_init_state(W, s_cap, lm=None, dtype=jnp.float32):
    """Initial per-sample beam state (the scan carry / streaming state)."""
    arange_w = jnp.arange(W, dtype=jnp.uint32)
    tokens0 = jnp.full((W, s_cap), -1, jnp.int32)
    times0 = jnp.full((W, s_cap), -1, jnp.int32)  # emission frame per token
    lens0 = jnp.zeros((W,), jnp.int32)
    last0 = jnp.full((W,), -1, jnp.int32)
    pb0 = jnp.where(jnp.arange(W) == 0, 0.0, LOG0).astype(dtype)
    pnb0 = jnp.full((W,), LOG0, dtype)
    # Dead padding beams get unique hashes so they can never merge with live
    # prefixes; beam 0 is the (live) empty prefix.
    h1_0 = jnp.where(jnp.arange(W) == 0, _SEED1, _DEAD + arange_w)
    h2_0 = jnp.where(jnp.arange(W) == 0, _SEED2, _DEAD + arange_w)
    # no-LM placeholder is (W, 1), not (W, 0): zero-size leaves can't be
    # checkpointed (orbax), and streaming states round-trip through orbax
    lm_state0 = (lm.init_state(W) if lm is not None
                 else jnp.zeros((W, 1), jnp.int32))
    lm_score0 = jnp.zeros((W,), dtype)  # accumulated alpha*lm + beta bonus
    return (tokens0, times0, lens0, last0, pb0, pnb0, h1_0, h2_0, lm_state0,
            lm_score0)


def _beam_search_single(lp, lpk, ck_all, il, W, K, s_cap, blank, lm=None,
                        lm_alpha=0.0, lm_beta=0.0, state0=None, lpb=None,
                        t0=0, stay_from_topk=False):
    """Beam search for ONE sample (or one streaming chunk of one sample).

    lp: (T, V); lpk/ck_all: (T, K) per-frame top-K values/ids precomputed
    OUTSIDE the scan (the vocabulary prune is beam-state independent, so
    hoisting it turns T sequential small top-ks into one big batched one —
    the dominant cost at large V); il: scalar length (frames ≥ il are
    frozen — in streaming, il counts from the chunk's own frame 0).
    state0 resumes from a previous chunk's carry.

    CANDIDATE-ONLY mode (`lp=None, lpb=(T,)` blank log-probs): the scan
    never touches the full vocab row — the repeat-last "stay" term reads
    from the top-K set instead (exact when K >= V; otherwise the same
    documented prune as the Pallas kernel).  This is the mode used when the
    vocabulary is SHARDED over a mesh (parallel/vocab_parallel.py): only
    the merged top-K candidates and the blank row are replicated."""
    from_topk = lp is None
    if not from_topk:
        t_max, v = lp.shape
    arange_w = jnp.arange(W, dtype=jnp.uint32)

    def step(state, xs):
        tokens, times, lens, last, pb, pnb, h1, h2, lm_state, lm_score = state
        if from_topk:
            lpk_t, ck, lpb_t, t = xs
        else:
            lp_t, lpk_t, ck, t = xs
        total = logaddexp2(pb, pnb)

        # --- stay candidates: same prefix --------------------------------
        if from_topk:
            ck_i = ck.astype(jnp.int32)
            lp_last = jnp.max(
                jnp.where(ck_i[None, :] == last[:, None], lpk_t[None, :],
                          LOG0),
                axis=1,
            )
            blank_lp = lpb_t
        else:
            if stay_from_topk:
                # token_min_logp active: a below-threshold token is banned
                # as a REPEAT too (pyctcdecode semantics — the repeat is a
                # token proposal), so read the stay term from the masked
                # candidate set like the kernel does
                ck_i = ck.astype(jnp.int32)
                lp_last = jnp.max(
                    jnp.where(ck_i[None, :] == last[:, None],
                              lpk_t[None, :], LOG0),
                    axis=1,
                )
            else:
                lp_last = lp_t[jnp.clip(last, 0, v - 1)]
            blank_lp = lp_t[blank]
        pb_stay = total + blank_lp
        pnb_stay = jnp.where(last >= 0, pnb + lp_last, LOG0)

        # --- extend candidates: prefix + c (pre-pruned vocab) -------------
        lpk = lpk_t
        ck = ck.astype(jnp.int32)
        same = ck[None, :] == last[:, None]  # (W, K)
        base = jnp.where(same, pb[:, None], total[:, None])
        pnb_ext = base + lpk[None, :]
        invalid = ((ck[None, :] == blank) | (lens[:, None] >= s_cap)
                   | (ck[None, :] < 0))  # -1 = token_min_logp-masked slot
        pnb_ext = jnp.where(invalid, LOG0, pnb_ext)
        cku = ck.astype(jnp.uint32) + 1
        h1e = h1[:, None] * _M1 + cku[None, :]
        h2e = h2[:, None] * _M2 + cku[None, :]

        if lm is not None:
            lm_lp, lm_state_ext = lm.score(lm_state, ck)  # (W, K), pytree
            lm_delta = lm_alpha * lm_lp + lm_beta
        else:
            lm_state_ext = None
            lm_delta = jnp.zeros((W, K), lpk_t.dtype)
        lm_score_ext = lm_score[:, None] + lm_delta  # (W, K)

        # --- merge extends that recreate an existing beam's prefix -------
        match = (
            (h1[:, None, None] == h1e[None, :, :])
            & (h2[:, None, None] == h2e[None, :, :])
            & ~invalid[None, :, :]
        )  # (W_stay, W, K)
        add = _masked_logsumexp(
            jnp.broadcast_to(pnb_ext[None, :, :], match.shape), match, axis=(1, 2)
        )
        pnb_stay = logaddexp2(pnb_stay, add)
        matched = jnp.any(match, axis=0)  # (W, K)
        pnb_ext = jnp.where(matched, LOG0, pnb_ext)

        # --- rank all W + W*K candidates (LM-adjusted), keep top W -------
        cand_pb = jnp.concatenate([pb_stay, jnp.full((W * K,), LOG0, lpk_t.dtype)])
        cand_pnb = jnp.concatenate([pnb_stay, pnb_ext.reshape(-1)])
        cand_lm = jnp.concatenate([lm_score, lm_score_ext.reshape(-1)])
        cand_score = logaddexp2(cand_pb, cand_pnb) + cand_lm
        vals, sel = _top_w_iterative(cand_score, W)
        # When fewer finite candidates than W exist, the repeated argmax
        # re-picks index 0 (its RANKING score was killed, but its pb/pnb are
        # still finite) — without this mask such picks would be zombie
        # duplicates of a live beam carrying full probability mass, which
        # later re-merge and multiply-count that mass.
        alive = vals > LOG0_THRESHOLD
        is_stay = sel < W
        parent = jnp.where(is_stay, sel, (sel - W) // K).astype(jnp.int32)
        kk = jnp.where(is_stay, 0, (sel - W) % K).astype(jnp.int32)
        c_sel = ck[kk]

        new_tokens = tokens[parent]
        new_times = times[parent]
        parent_len = lens[parent]
        slot = jnp.arange(s_cap, dtype=jnp.int32)[None, :] == parent_len[:, None]
        emit_slot = slot & (~is_stay)[:, None]
        new_tokens = jnp.where(emit_slot, c_sel[:, None], new_tokens)
        # t0: global frame offset (streaming chunks record utterance-global
        # emission frames; 0 for one-shot decodes)
        new_times = jnp.where(emit_slot, t + t0, new_times)
        new_lens = jnp.minimum(
            jnp.where(is_stay, parent_len, parent_len + 1), s_cap
        )
        new_lens = jnp.where(alive, new_lens, 0)
        new_last = jnp.where(alive & ~is_stay, c_sel,
                             jnp.where(alive, last[parent], -1))
        new_h1 = jnp.where(is_stay, h1[parent], h1e[parent, kk])
        new_h1 = jnp.where(alive, new_h1, _DEAD + arange_w)
        new_h2 = jnp.where(is_stay, h2[parent], h2e[parent, kk])
        new_h2 = jnp.where(alive, new_h2, _DEAD + arange_w)
        new_pb = jnp.where(alive, cand_pb[sel], LOG0)
        new_pnb = jnp.where(alive, cand_pnb[sel], LOG0)
        new_lm_score = jnp.where(alive, cand_lm[sel], 0.0)
        if lm is not None:
            new_lm_state = lm.select(lm_state, lm_state_ext, parent, kk, is_stay)
        else:
            new_lm_state = lm_state

        # freeze past the sample's length
        upd = t < il
        out = []
        for new, old in (
            (new_tokens, tokens), (new_times, times), (new_lens, lens),
            (new_last, last),
            (new_pb, pb), (new_pnb, pnb), (new_h1, h1), (new_h2, h2),
            (new_lm_state, lm_state), (new_lm_score, lm_score),
        ):
            out.append(jax.tree.map(lambda a, b: jnp.where(upd, a, b), new, old))
        return tuple(out), None

    if state0 is None:
        state0 = _beam_init_state(W, s_cap, lm, lpk.dtype)
    ts = jnp.arange(lpk.shape[0], dtype=jnp.int32)
    xs = (lpk, ck_all, lpb, ts) if from_topk else (lp, lpk, ck_all, ts)
    return jax.lax.scan(step, state0, xs)[0]


def _beam_rank(state, W, lm=None, lm_alpha=0.0):
    """Rank a final beam state: (tokens, lens, scores, times), best first.

    times: per-token EMISSION FRAME indices aligned with tokens (-1 pad) —
    the frame at which each symbol joined the (surviving construction of
    the) prefix, the beam-search analog of greedy_decode_with_timestamps."""
    tokens, times, lens, last, pb, pnb, h1, h2, lm_state, lm_score = state
    scores = logaddexp2(pb, pnb) + lm_score
    if lm is not None:
        scores = scores + lm_alpha * lm.final(lm_state)
    scores, order = jax.lax.top_k(scores, W)
    scores = jnp.where(scores > LOG0_THRESHOLD, scores, -jnp.inf)
    return tokens[order], lens[order], scores, times[order]


@partial(
    jax.jit,
    static_argnames=(
        "beam_width", "blank", "max_symbols", "lm", "lm_alpha", "lm_beta",
        "return_timestamps",
    ),
)
def beam_search_from_topk(lpk, ck, lpb, input_lengths, beam_width, blank,
                          max_symbols, lm=None, lm_alpha=0.0, lm_beta=0.0,
                          return_timestamps=False):
    """Batched beam search from PRECOMPUTED per-frame candidates.

    lpk/ck: (T, N, K) top-K log-probs / token ids; lpb: (T, N) blank
    log-probs.  Candidate-only semantics (see _beam_search_single): exact
    when the K candidates cover the vocab, else the Pallas kernel's
    documented repeat-prune.  Used by the vocab-sharded (tensor-parallel)
    decode, where only the merged top-K is replicated across the mesh.
    Returns (tokens (N, W, max_symbols), lengths (N, W), scores (N, W),
    times (N, W, max_symbols) emission-frame indices).
    """
    fn = lambda lpk_s, ck_s, lpb_s, il_s: _beam_search_single(
        None, lpk_s, ck_s, il_s, W=beam_width, K=lpk.shape[2],
        s_cap=max_symbols, blank=blank, lm=lm, lm_alpha=lm_alpha,
        lm_beta=lm_beta, lpb=lpb_s,
    )
    state = jax.vmap(fn, in_axes=(1, 1, 1, 0))(
        lpk, ck.astype(jnp.int32), lpb, jnp.asarray(input_lengths, jnp.int32)
    )
    rank = partial(_beam_rank, W=beam_width, lm=lm, lm_alpha=lm_alpha)
    out = jax.vmap(rank)(state)
    return out if return_timestamps else out[:3]


def apply_token_min_logp(lpk, ck, token_min_logp):
    """pyctcdecode-style absolute candidate pruning (`token_min_logp`):
    drop top-K slots whose log-prob is below the threshold, always
    keeping each frame's best token (slot 0 — candidates are sorted
    descending).  Dropped slots become ck = -1 / lp = LOG0, which every
    implementation (XLA scan, Pallas kernel, chunked) already treats as
    'no candidate', so the paths stay in exact agreement."""
    if token_min_logp is None:
        return lpk, ck
    keep = lpk >= token_min_logp
    keep = keep.at[..., 0].set(True)
    return (jnp.where(keep, lpk, LOG0),
            jnp.where(keep, ck, -1).astype(ck.dtype))


@partial(
    jax.jit,
    static_argnames=(
        "beam_width", "blank", "prune_k", "max_symbols", "lm", "lm_alpha",
        "lm_beta", "approx_topk", "token_min_logp",
    ),
)
def _beam_search_batched(
    log_probs, input_lengths, beam_width, blank, prune_k, max_symbols, lm,
    lm_alpha, lm_beta, approx_topk=False, token_min_logp=None,
):
    t_max, n, v = log_probs.shape
    # Hoist the per-frame vocabulary prune out of the scan: one batched
    # top-k over all (T*N) frames at once.
    if approx_topk and prune_k < v:
        lpk, ck = jax.lax.approx_max_k(log_probs, prune_k)
    else:
        lpk, ck = jax.lax.top_k(log_probs, prune_k)  # (T, N, K)
    lpk, ck = apply_token_min_logp(lpk, ck, token_min_logp)
    fn = partial(
        _beam_search_single,
        W=beam_width,
        K=prune_k,
        s_cap=max_symbols,
        blank=blank,
        lm=lm,
        lm_alpha=lm_alpha,
        lm_beta=lm_beta,
        stay_from_topk=token_min_logp is not None,
    )
    state = jax.vmap(fn, in_axes=(1, 1, 1, 0))(
        log_probs, lpk, ck.astype(jnp.int32), input_lengths
    )
    rank = partial(_beam_rank, W=beam_width, lm=lm, lm_alpha=lm_alpha)
    return jax.vmap(rank)(state)


def beam_search_decode(
    log_probs,
    input_lengths=None,
    beam_width: int = 8,
    blank: int = 0,
    prune_k: int | None = None,
    max_symbols: int | None = None,
    lm=None,
    lm_alpha: float = 0.0,
    lm_beta: float = 0.0,
    approx_topk: bool = False,
    implementation: str = "auto",
    lm_chunk_t: int = 128,
    return_timestamps: bool = False,
    token_min_logp: float | None = None,
    guide_lm=None,
    from_logits: bool = False,
    batch_first: bool = False,
):
    """Batched CTC prefix beam search.

    Args:
      log_probs: (T, N, C) log-probabilities.  `from_logits=True` applies
        log_softmax first (raw network outputs); `batch_first=True` accepts
        (N, T, C) — both mirror the reference's decoder conveniences.
      input_lengths: (N,) valid frame counts (default: T).
      beam_width: number of live prefixes W.
      prune_k: per-frame vocabulary pruning (top-K); None = full vocab
        (exact w.r.t. the reference algorithm).
      max_symbols: static cap on decoded length (default min(T, 512)).
        Unlike the reference's unbounded C++ loop this freezes prefix
        growth at the cap; a returned length equal to max_symbols means
        the beam saturated (BeamSearchCTCDecoder warns when that happens).
      lm / lm_alpha / lm_beta: optional shallow-fusion LM (see lm.py) with
        weight alpha and per-token insertion bonus beta — the TPU-native
        replacement for the reference's KenLM hook (SURVEY.md §3.1 N6).
      approx_topk: use the TPU-native approximate top-k for the per-frame
        vocabulary prune (faster on large V; the prune is heuristic anyway).
      implementation: 'auto' (Pallas kernel on TPU when it applies, else
        the XLA scan — never changes results), 'pallas' (force the fused
        kernel; raises if unsupported), 'chunked' (opt in to the chunked-LM
        kernel path for word-level / hashed LMs, see below), or 'xla' (the
        scan: exact per-frame LM fusion, any config).
      lm_chunk_t: steering granularity of the chunked LM path (frames per
        kernel chunk; the LM re-ranks beams at each boundary).  Chunked
        semantics (ops/beam_chunked.py): every hypothesis's score is exact,
        but the LM influences pruning once per chunk instead of per frame —
        which is why 'auto' keeps these LMs on the exact scan and 'chunked'
        is an explicit opt-in to the ~order-of-magnitude speedup.
      return_timestamps: also return per-token EMISSION FRAME indices —
        the frame at which each symbol joined the (surviving construction
        of the) prefix; the beam analog of greedy_decode_with_timestamps.
      token_min_logp: absolute per-frame candidate threshold
        (pyctcdecode's knob, e.g. -5.0): tokens with log p below it are
        never proposed as extensions, except each frame's single best
        token, which is always kept.  Applied identically on every
        implementation (the dropped slots simply leave the candidate
        set), composing with prune_k.
      guide_lm: only with implementation='chunked' — a dense `NGramLM`
        fused in-kernel purely to steer per-frame pruning between chunk
        boundaries (scores stay exactly the `lm`-fused scores; see
        beam_search_chunked_lm).

    Returns:
      tokens: (N, W, max_symbols) int32, -1 padded, best beam first.
      lengths: (N, W) int32.
      scores: (N, W) float log p(prefix | x) (LM-adjusted when lm is given);
        -inf for dead padding beams.
      times: (N, W, max_symbols) int32, -1 padded (only when
        return_timestamps).
    """
    log_probs = jnp.asarray(log_probs)
    if batch_first:
        log_probs = jnp.swapaxes(log_probs, 0, 1)
    if log_probs.dtype in (jnp.bfloat16, jnp.float16):
        # decoding is f32 everywhere (scores/merging); upcasting here keeps
        # half-precision model outputs on the fast Pallas route.  float64
        # stays f64 and falls back to the XLA scan (the kernel is f32-only).
        log_probs = log_probs.astype(jnp.float32)
    if from_logits:
        log_probs = log_softmax_acc(log_probs, axis=-1)
    t_max, n, v = log_probs.shape
    if input_lengths is None:
        input_lengths = jnp.full((n,), t_max, jnp.int32)
    if prune_k is None:
        prune_k = v
    prune_k = min(prune_k, v)
    if max_symbols is None:
        max_symbols = min(t_max, 512)
    if implementation not in ("auto", "pallas", "chunked", "xla"):
        raise ValueError(f"invalid implementation {implementation!r}")
    if guide_lm is not None and implementation != "chunked":
        raise ValueError("guide_lm is only meaningful with "
                         "implementation='chunked' (it steers between "
                         "chunk boundaries)")
    if implementation != "xla":
        from .beam_search_pallas import beam_pallas_supported, beam_search_pallas

        ok, reason = beam_pallas_supported(t_max, v, beam_width, prune_k,
                                           lm, dtype=log_probs.dtype)
        on_tpu = jax.default_backend() == "tpu"
        if implementation == "pallas" and not ok:
            raise ValueError(f"implementation='pallas' unsupported: {reason}")
        if implementation != "chunked" and ok and (
                on_tpu or implementation == "pallas"):
            return beam_search_pallas(
                log_probs, input_lengths, beam_width=beam_width, blank=blank,
                prune_k=prune_k, max_symbols=max_symbols,
                approx_topk=approx_topk,
                lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta,
                return_timestamps=return_timestamps,
                token_min_logp=token_min_logp,
            )
        # LM configs the fused kernel can't take (word-level / hashed /
        # large-vocab LMs) can run on the CHUNKED kernel path — EXPLICIT
        # opt-in only (implementation='chunked'): it changes LM steering
        # from per-frame to per-chunk, and 'auto' never silently changes
        # results (the repo's exactness-first convention).
        if implementation == "chunked":
            if lm is None or not hasattr(lm, "score_chunk"):
                raise ValueError(
                    "implementation='chunked' requires an lm with "
                    "score_chunk")
            ok_nolm, why = beam_pallas_supported(
                t_max, v, beam_width, prune_k, lm=None,
                dtype=log_probs.dtype)
            if not ok_nolm:
                raise ValueError(
                    f"implementation='chunked' unsupported: {why}")
            from .beam_chunked import beam_search_chunked_lm

            return beam_search_chunked_lm(
                log_probs, input_lengths, beam_width=beam_width,
                blank=blank, prune_k=prune_k, max_symbols=max_symbols,
                lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta,
                chunk_t=lm_chunk_t,
                return_timestamps=return_timestamps,
                token_min_logp=token_min_logp,
                guide_lm=guide_lm,
            )
        if implementation == "auto" and on_tpu and not ok:
            import logging

            hint = (
                "; implementation='chunked' runs this LM on the kernel at "
                "~10-20x (chunk-granular steering, exact scores)"
                if lm is not None and hasattr(lm, "score_chunk") else ""
            )
            logging.getLogger(__name__).info(
                "beam_search_decode: falling back to the XLA scan (%s)%s",
                reason, hint,
            )
    out = _beam_search_batched(
        log_probs,
        jnp.asarray(input_lengths, jnp.int32),
        int(beam_width),
        int(blank),
        int(prune_k),
        int(max_symbols),
        lm,
        float(lm_alpha),
        float(lm_beta),
        bool(approx_topk),
        None if token_min_logp is None else float(token_min_logp),
    )
    return out if return_timestamps else out[:3]


class BeamSearchCTCDecoder:
    """Class-style decoder mirroring the reference's beam-search decoder API
    (SURVEY.md §3.2 P3): holds static config, `decode()` returns the best
    hypothesis per sample, `decode_beams()` all beams with scores."""

    def __init__(
        self,
        beam_width: int = 8,
        blank: int = 0,
        labels=None,
        prune_k: int | None = None,
        max_symbols: int | None = None,
        lm=None,
        lm_alpha: float = 0.0,
        lm_beta: float = 0.0,
        implementation: str = "auto",
        lm_chunk_t: int = 128,
        token_min_logp: float | None = None,
        from_logits: bool = False,
        batch_first: bool = False,
    ):
        self.beam_width = beam_width
        self.blank = blank
        self.labels = list(labels) if labels is not None else None
        self.prune_k = prune_k
        self.max_symbols = max_symbols
        self.lm = lm
        self.lm_alpha = lm_alpha
        self.lm_beta = lm_beta
        self.implementation = implementation
        self.lm_chunk_t = lm_chunk_t
        self.token_min_logp = token_min_logp
        self.from_logits = from_logits
        self.batch_first = batch_first

    def _to_text(self, ids):
        return "".join(self.labels[c] for c in ids) if self.labels else ids

    def decode_beams(self, log_probs, input_lengths=None,
                     return_timestamps=False):
        log_probs = jnp.asarray(log_probs)
        if self.batch_first:
            log_probs = jnp.swapaxes(log_probs, 0, 1)
        t_max, n, _ = log_probs.shape
        if input_lengths is None:
            input_lengths = np.full((n,), t_max, np.int32)
        out = jax.device_get(
            beam_search_decode(
                log_probs,
                jnp.asarray(input_lengths, jnp.int32),
                beam_width=self.beam_width,
                blank=self.blank,
                prune_k=self.prune_k,
                max_symbols=self.max_symbols,
                lm=self.lm,
                lm_alpha=self.lm_alpha,
                lm_beta=self.lm_beta,
                implementation=self.implementation,
                lm_chunk_t=self.lm_chunk_t,
                return_timestamps=return_timestamps,
                token_min_logp=self.token_min_logp,
                from_logits=self.from_logits,
            )
        )
        tokens, lengths, scores = out[:3]
        times = out[3] if return_timestamps else None
        s_cap = self.max_symbols or min(t_max, 512)
        if (lengths >= s_cap).any():
            import warnings

            warnings.warn(
                f"beam(s) saturated the max_symbols cap ({s_cap}); prefix "
                "growth was frozen there — raise max_symbols for very long "
                "transcripts (semantic divergence from the unbounded "
                "reference algorithm)"
            )
        res = []
        for i in range(n):
            beams = []
            for w in range(self.beam_width):
                if not np.isfinite(scores[i, w]):
                    continue
                ids = tokens[i, w, : lengths[i, w]].tolist()
                entry = (self._to_text(ids), float(scores[i, w]))
                if return_timestamps:
                    entry += (times[i, w, : lengths[i, w]].tolist(),)
                beams.append(entry)
            res.append(beams)
        return res

    def decode(self, log_probs, input_lengths=None):
        beams = self.decode_beams(log_probs, input_lengths)
        texts = [b[0][0] if b else self._to_text([]) for b in beams]
        scores = [b[0][1] if b else float("-inf") for b in beams]
        return texts, scores
