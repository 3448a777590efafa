"""Chunked Pallas beam search with LM steering — kernel-speed decoding for
word-level and arbitrary-order n-gram LMs.

The reference fuses KenLM queries into its C++ beam loop per frame
(SURVEY.md §3.1 N6, §4.4); the round-2 rebuild could only do that in-kernel
for dense bigrams, so word/hashed LMs fell back to the ~30x-slower XLA scan
(their open-addressing probes need per-lane dynamic gather, which Mosaic
does not expose).  This module removes that cliff with a TWO-LEVEL design:

  * the Pallas beam kernel (beam_search_pallas.py) advances CHUNK_T frames
    at full kernel speed, carrying an accumulated per-beam LM bonus that
    participates in candidate RANKING (so the LM steers pruning), with its
    full beam state exported at the chunk boundary;
  * between chunks, XLA reconstructs each surviving beam's tokens emitted
    during the chunk (associative-scan backtrace over the chunk's
    backpointer codes) and replays them through the LM's VECTORIZED
    `score_chunk` (lm.py) — open-addressing word/gram lookups are plain
    batched XLA gathers out here — then folds `alpha*logp + beta*n_tokens`
    into the carried bonus before the next chunk.

Semantics: the LM steers the search at chunk granularity instead of per
frame.  Every surviving hypothesis's SCORE is exact (identical to fused
scoring of the same prefix, like ops/rescore.py); what chunking can change
is which tail hypotheses survive intermediate pruning.  chunk_t=T degrades
to no-LM decoding + exact rescoring; chunk_t -> 1 approaches fused
per-frame steering at the XLA scan's cost.  On peaked (high-confidence)
lattices the beam sets match the fused scan exactly — tested.

Works with ANY LM implementing `score_chunk` (all four lm.py classes);
the acoustic beam mechanics keep the kernel's documented repeat-prune
semantics (exact at prune_k >= V).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .semiring import LOG0, LOG0_THRESHOLD, logaddexp2
from .indexing import compact_rows, flat_take, ladder_take
from .beam_search_pallas import (
    _LANES,
    _backtrace,
    _input_tc,
    _pad_up,
    _run_beam_kernel,
    beam_state_init,
)


def _chunk_tc(chunk_t, K, c_pad=0):
    """Inner kernel time-chunk: the largest divisor of chunk_t within the
    VMEM-budget cap (grid steps must tile the chunk exactly)."""
    cap = min(chunk_t, _input_tc(K, c_pad))
    while chunk_t % cap:
        cap -= 1
    return cap


def _compose_ladder(a, b):
    """Lane-map composition fn(a, b)[w] = b[a[w]] as a compare-select
    ladder over the small static trailing beam dim (take_along_axis on a
    trailing lane axis is ~30x slower on TPU — see ops/indexing.py)."""
    return ladder_take(b, a)


def _chunk_emissions(bp_c, ck_c, W, K, chunk_t):
    """Per-chunk token replay inputs from backpointer codes.

    bp_c: (chunk_t, W, b_pad) codes; ck_c: (chunk_t, K, b_pad) top-K ids.
    Returns (lane0 (b_pad, W) ancestor lane at chunk start for each
    end-of-chunk beam lane, toks (b_pad, W, chunk_t) FRAME-ALIGNED emitted
    tokens (-1 at non-emitting frames), n_emit (b_pad, W)).
    """
    code = jnp.moveaxis(bp_c, 1, 2)  # (C, b_pad, W)
    g = jnp.where(code < W, code, (code - W) // K)
    # suffix lane-map compositions; lane occupied AFTER frame t by final
    # beam w is s_comp[t+1][w] (identity at the last frame)
    s_comp = jax.lax.associative_scan(_compose_ladder, g, reverse=True,
                                      axis=0)
    b_pad = code.shape[1]
    ident = jnp.broadcast_to(jnp.arange(W, dtype=code.dtype), (1, b_pad, W))
    lane_after = jnp.concatenate([s_comp[1:], ident], axis=0)
    lane0 = s_comp[0]  # (b_pad, W)

    code_sel = ladder_take(code, lane_after)  # (C, b_pad, W)
    emit = code_sel >= W
    k_sel = jnp.where(emit, (code_sel - W) % K, 0)
    ck_t = jnp.moveaxis(ck_c, 1, 2)  # (C, b_pad, K)
    ch = flat_take(ck_t, k_sel)  # (C, b_pad, W)

    n_emit = jnp.sum(emit.astype(jnp.int32), axis=0)  # (b_pad, W)
    toks = jnp.moveaxis(jnp.where(emit, ch, -1), 0, 2)  # (b_pad, W, C)
    return lane0, toks, n_emit


@partial(
    jax.jit,
    static_argnames=("W", "K", "s_cap", "blank", "interpret", "chunk_t",
                     "t_max", "n", "v", "lm", "lm_alpha", "lm_beta",
                     "token_min_logp"),
)
def _beam_chunked_jit(log_probs, il, W, K, s_cap, blank, interpret, chunk_t,
                      t_max, n, v, lm, lm_alpha, lm_beta,
                      token_min_logp=None, guide_table=None,
                      guide_cls_map=None):
    from .topk_pallas import topk_pallas, topk_pallas_fits_vmem

    # --- full-lattice top-K prep (identical routing to the no-LM kernel) --
    if interpret or v <= 256 or not topk_pallas_fits_vmem(n, v):
        lpk, ck = jax.lax.top_k(log_probs, K)
    else:
        lpk, ck = topk_pallas(log_probs, K)
    from .beam_search import apply_token_min_logp

    lpk, ck = apply_token_min_logp(lpk, ck, token_min_logp)
    lpb = log_probs[:, :, blank]
    return _beam_chunked_from_topk_jit(
        lpk, ck, lpb, il, W, K, s_cap, blank, interpret, chunk_t, t_max, n,
        v, lm, lm_alpha, lm_beta, guide_table=guide_table,
        guide_cls_map=guide_cls_map)


@partial(
    jax.jit,
    static_argnames=("W", "K", "s_cap", "blank", "interpret", "chunk_t",
                     "t_max", "n", "v", "lm", "lm_alpha", "lm_beta"),
)
def _beam_chunked_from_topk_jit(lpk, ck, lpb, il, W, K, s_cap, blank,
                                interpret, chunk_t, t_max, n, v, lm,
                                lm_alpha, lm_beta, guide_table=None,
                                guide_cls_map=None):
    """Chunked decode from PRECOMPUTED per-frame candidates (lpk/ck (T,N,K),
    lpb (T,N)) — the seam the vocab-sharded decoder enters through after its
    merged top-K prep (parallel/vocab_parallel.py).

    `guide_table` rows are context SYMBOL ids (v + 1 rows, char-scale) or,
    with `guide_cls_map` (V,) also given, context CLASSES (QuantizedBigram-
    Guide — any vocab; the kernel then tracks class-of-last from a streamed
    per-candidate class block)."""
    ck = ck.astype(jnp.int32)
    use_cls = guide_cls_map is not None
    b_pad = _pad_up(max(n, 1), _LANES)
    t_pad = _pad_up(t_max, chunk_t)
    n_chunks = t_pad // chunk_t
    n_ctx = int(guide_table.shape[0]) if guide_table is not None else 0
    c_pad = _pad_up(n_ctx, 8) if n_ctx else 0
    # the streamed class block costs one extra c-row of bytes per frame
    tc = _chunk_tc(chunk_t, K, c_pad + (1 if use_cls else 0))

    lpk_full = jnp.full((t_pad, K, b_pad), LOG0, jnp.float32)
    lpk_full = lpk_full.at[:t_max, :, :n].set(jnp.moveaxis(lpk, 2, 1))
    ck_full = jnp.full((t_pad, K, b_pad), -2, jnp.int32)
    ck_full = ck_full.at[:t_max, :, :n].set(jnp.moveaxis(ck, 2, 1))
    lpb_full = jnp.full((t_pad, 1, b_pad), LOG0, jnp.float32)
    lpb_full = lpb_full.at[:t_max, 0, :n].set(lpb)
    il_full = jnp.zeros((1, b_pad), jnp.int32).at[0, :n].set(il)

    in_specs_shapes = [
        ((tc, K, _LANES), lambda bt, i: (i, 0, bt)),
        ((tc, K, _LANES), lambda bt, i: (i, 0, bt)),
        ((tc, 1, _LANES), lambda bt, i: (i, 0, bt)),
        ((1, _LANES), lambda bt, i: (0, bt)),
    ]
    if n_ctx:
        in_specs_shapes.append(
            ((tc, c_pad, K, _LANES), lambda bt, i: (i, 0, 0, bt)))
    if use_cls:
        in_specs_shapes.append(((tc, K, _LANES), lambda bt, i: (i, 0, bt)))
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_specs = [pl.BlockSpec(s, m, memory_space=pltpu.VMEM)
                for s, m in in_specs_shapes]

    m_rows = W * b_pad  # LM-state row index = w * b_pad + b
    state0 = beam_state_init(W, b_pad)
    lm_state0 = lm.init_state(m_rows)

    xs = (
        lpk_full.reshape(n_chunks, chunk_t, K, b_pad),
        ck_full.reshape(n_chunks, chunk_t, K, b_pad),
        lpb_full.reshape(n_chunks, chunk_t, 1, b_pad),
        jnp.arange(n_chunks, dtype=jnp.int32),
    )
    if n_ctx:
        # per-frame GUIDE increments alpha*guide(ck | context) + beta in
        # the kernel's layout.  The guide only STEERS mid-chunk pruning;
        # its accumulated bonus is replaced by the exact `lm` replay bonus
        # at every chunk boundary.
        ckc = jnp.clip(ck, 0, v - 1)
        if use_cls:
            # class-keyed (QuantizedBigramGuide, any vocab): table[c, ck]
            # as one flat 1-D gather (the fast TPU form — a V-wide one-hot
            # einsum would materialize (T, N, K, V)), then the streamed
            # per-candidate class block the kernel's class register eats.
            flat = guide_table.reshape(-1)
            c_iota = jnp.arange(n_ctx, dtype=jnp.int32)
            col = flat[c_iota[:, None, None, None] * v + ckc[None]]
            col = jnp.moveaxis(col, (0, 3), (1, 2))  # (T, C, K, N)
            cls_ck = guide_cls_map.astype(jnp.int32)[ckc]  # (T, N, K)
            cls_full = jnp.zeros((t_pad, K, b_pad), jnp.int32)
            cls_full = cls_full.at[:t_max, :, :n].set(
                jnp.moveaxis(cls_ck, 2, 1))
        else:
            # symbol-keyed (char-scale): one-hot MXU emission directly in
            # the kernel layout (same as the fused path — 21x faster than
            # gather+transpose at these shapes, bit-exact).
            oh = jax.nn.one_hot(ckc, v, dtype=jnp.float32)
            col = jnp.einsum("tnkv,cv->tckn", oh, guide_table,
                             precision=jax.lax.Precision.HIGHEST)
        col = lm_alpha * col + lm_beta
        lm_full = jnp.zeros((t_pad, c_pad, K, b_pad), jnp.float32)
        lm_full = lm_full.at[:t_max, :n_ctx, :, :n].set(col)
        xs = xs + (lm_full.reshape(n_chunks, chunk_t, c_pad, K, b_pad),)
        if use_cls:
            xs = xs + (cls_full.reshape(n_chunks, chunk_t, K, b_pad),)

    def body(carry, x):
        kstate, lm_state = carry
        if use_cls:
            lpk_c, ck_c, lpb_c, ci, lm_c, cls_c = x
        elif n_ctx:
            lpk_c, ck_c, lpb_c, ci, lm_c = x
        else:
            lpk_c, ck_c, lpb_c, ci = x
        pre_bonus = kstate[8]  # exact replay bonus up to this chunk
        il_c = il_full - ci * chunk_t
        kin = ([lpk_c, ck_c, lpb_c, il_c] + ([lm_c] if n_ctx else [])
               + ([cls_c] if use_cls else []))
        bp_c, _, _, kstate = _run_beam_kernel(
            kin, in_specs, chunk_t, tc, b_pad,
            W, K, s_cap, blank, n_ctx, interpret, state_in=kstate,
            use_cls=use_cls,
        )
        lane0, toks, n_emit = _chunk_emissions(bp_c, ck_c, W, K, chunk_t)
        # re-home LM state: end-of-chunk lane w descends from lane0[b, w].
        # The permutation is within each batch column over the W beam rows,
        # so it is a W-way select ladder, not a row gather.
        src = lane0.T  # (W, b_pad)

        def rehome(a):
            aw = a.reshape((W, b_pad) + a.shape[1:])
            idx = src.reshape((W, b_pad) + (1,) * (a.ndim - 1))
            out = jnp.zeros_like(aw)
            for w in range(W):
                out = jnp.where(idx == w, aw[w][None], out)
            return out.reshape(a.shape)

        lm_state = jax.tree.map(rehome, lm_state)
        toks_m = compact_rows(
            jnp.moveaxis(toks, 0, 1).reshape(m_rows, chunk_t))
        delta, lm_state = lm.score_chunk(lm_state, toks_m)
        bonus = (lm_alpha * delta.reshape(W, b_pad)
                 + lm_beta * jnp.moveaxis(n_emit, 0, 1).astype(jnp.float32))
        if n_ctx:
            # discard the kernel-accumulated GUIDE bonus: re-home the
            # exact pre-chunk replay bonus to the surviving beams and add
            # this chunk's exact replay bonus — final scores carry only
            # the true `lm` fusion, the guide having steered pruning
            base8 = rehome(pre_bonus.reshape(m_rows)).reshape(W, b_pad)
        else:
            base8 = kstate[8]
        kstate = kstate[:8] + (base8 + bonus,) + kstate[9:]
        return (kstate, lm_state), bp_c

    (kstate, lm_state), bp = jax.lax.scan(body, (state0, lm_state0), xs)
    bp = bp.reshape(t_pad, W, b_pad)
    pb, pnb, lm_bonus = kstate[0], kstate[1], kstate[8]
    scores = logaddexp2(pb, pnb) + lm_bonus
    scores = scores + lm_alpha * lm.final(lm_state).reshape(W, b_pad)
    return _backtrace(bp, ck, scores, W, K, s_cap, t_max, n)


def _resolve_guide(guide_lm, t_max, v, W, k):
    """Validate a `guide_lm` and return its kernel inputs
    (guide_table, guide_cls_map) — (None, None) when absent.

    Accepts a dense `NGramLM` (symbol-keyed, vocab + 1 <= 64 context rows)
    or a `QuantizedBigramGuide` (class-keyed: ANY vocab, n_classes + 1
    <= 64 rows — the lift of the char-scale cap)."""
    if guide_lm is None:
        return None, None
    from .beam_search_pallas import _LM_CTX_CAP, beam_pallas_supported
    from .lm import NGramLM, QuantizedBigramGuide

    if isinstance(guide_lm, QuantizedBigramGuide):
        if guide_lm._v != v:
            raise ValueError(f"guide_lm vocab ({guide_lm._v}) != lattice "
                             f"vocab ({v})")
        if guide_lm._n_classes + 1 > _LM_CTX_CAP:
            raise ValueError(
                f"QuantizedBigramGuide supports n_classes + 1 <= "
                f"{_LM_CTX_CAP} context rows (got "
                f"{guide_lm._n_classes + 1})")
        if W > 32:
            raise ValueError("guide_lm fusion supports beam_width <= 32")
        return guide_lm._table, guide_lm._cls_map
    if not isinstance(guide_lm, NGramLM):
        raise ValueError("guide_lm must be a dense NGramLM (symbol-keyed, "
                         "fused in-kernel) or a QuantizedBigramGuide "
                         "(class-keyed, any vocab)")
    ok_g, why = beam_pallas_supported(t_max, v, W, k, lm=guide_lm)
    if not ok_g:
        raise ValueError(f"guide_lm outside the fused-kernel envelope: "
                         f"{why}")
    return guide_lm._table, None


def beam_search_chunked_lm_from_topk(lpk, ck, lpb, input_lengths, *,
                                     v: int, beam_width: int = 8,
                                     blank: int = 0,
                                     max_symbols: int | None = None,
                                     lm=None, lm_alpha: float = 0.0,
                                     lm_beta: float = 0.0,
                                     chunk_t: int = 128, interpret=None,
                                     return_timestamps: bool = False,
                                     guide_lm=None):
    """`beam_search_chunked_lm` from precomputed per-frame candidates.

    lpk/ck: (T, N, K) top-K values/global ids; lpb: (T, N) blank row; `v`
    the FULL vocab size (candidate ids index it).  Used by the
    vocab-sharded decoder (parallel/vocab_parallel.py), whose merged top-K
    prep reproduces global `lax.top_k` exactly — so sharded-chunked ==
    unsharded-chunked bitwise."""
    from .beam_search_pallas import beam_pallas_supported

    if lm is None or not hasattr(lm, "score_chunk"):
        raise ValueError("beam_search_chunked_lm_from_topk requires an lm "
                         "with score_chunk")
    t_max, n, k = lpk.shape
    ok, reason = beam_pallas_supported(t_max, v, int(beam_width), k, lm=None)
    if not ok:  # the ACOUSTIC kernel envelope (the LM side is chunk-scored)
        raise ValueError(f"beam_search_chunked_lm_from_topk: {reason}")
    guide_table, guide_cls_map = _resolve_guide(
        guide_lm, t_max, int(v), int(beam_width), k)
    W = int(beam_width)
    s_cap = int(max_symbols or min(t_max, 512))
    chunk_t = int(min(chunk_t, _pad_up(t_max, 8)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _beam_chunked_from_topk_jit(
        jnp.asarray(lpk, jnp.float32), jnp.asarray(ck),
        jnp.asarray(lpb, jnp.float32),
        jnp.asarray(input_lengths, jnp.int32), W, k, s_cap, int(blank),
        bool(interpret), chunk_t, t_max, n, int(v), lm, float(lm_alpha),
        float(lm_beta), guide_table=guide_table,
        guide_cls_map=guide_cls_map)
    return out if return_timestamps else out[:3]


def beam_search_chunked_lm(log_probs, input_lengths=None, beam_width: int = 8,
                           blank: int = 0, prune_k: int | None = None,
                           max_symbols: int | None = None, lm=None,
                           lm_alpha: float = 0.0, lm_beta: float = 0.0,
                           chunk_t: int = 128, interpret=None,
                           return_timestamps: bool = False,
                           token_min_logp: float | None = None,
                           guide_lm=None):
    """Kernel-speed beam search with chunk-granular LM steering.

    Same returns as `beam_search_decode`; `lm` must implement the
    `score_chunk` protocol (all lm.py classes do).  `chunk_t` trades
    steering granularity against speed (see module docstring); the default
    128 re-ranks the beams every 128 frames.

    `guide_lm` (optional): fused IN-KERNEL purely to steer pruning PER
    FRAME between chunk boundaries — its accumulated bonus is replaced by
    the exact `lm` replay bonus at every boundary, so returned scores are
    exactly the `lm`-fused scores; only which beams survive mid-chunk
    pruning improves.  Either a dense `NGramLM` (symbol-keyed contexts:
    vocab + 1 <= 64 rows, char-scale) or a `QuantizedBigramGuide`
    (class-keyed contexts: ANY vocab, n_classes + 1 <= 64 — build with
    QuantizedBigramGuide.from_bigram).  Steered with the same
    lm_alpha/lm_beta.
    """
    from .beam_search_pallas import beam_pallas_supported

    if lm is None:
        raise ValueError("beam_search_chunked_lm requires an lm; use "
                         "beam_search_pallas for no-LM decoding")
    if not hasattr(lm, "score_chunk"):
        raise ValueError(f"{type(lm).__name__} does not implement "
                         "score_chunk")
    log_probs = jnp.asarray(log_probs, jnp.float32)
    t_max, n, v = log_probs.shape
    ok, reason = beam_pallas_supported(t_max, v, int(beam_width), prune_k,
                                       lm=None)
    if not ok:  # the ACOUSTIC kernel envelope (the LM side is chunk-scored)
        raise ValueError(f"beam_search_chunked_lm: {reason}")
    guide_table, guide_cls_map = _resolve_guide(
        guide_lm, t_max, v, int(beam_width),
        min(int(prune_k or v), v))
    if input_lengths is None:
        input_lengths = np.full((n,), t_max, np.int32)
    W = int(beam_width)
    K = min(int(prune_k or v), v)
    s_cap = int(max_symbols or min(t_max, 512))
    chunk_t = int(min(chunk_t, _pad_up(t_max, 8)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _beam_chunked_jit(
        log_probs, jnp.asarray(input_lengths, jnp.int32), W, K, s_cap,
        int(blank), bool(interpret), chunk_t, t_max, n, v, lm,
        float(lm_alpha), float(lm_beta),
        token_min_logp=(None if token_min_logp is None
                        else float(token_min_logp)),
        guide_table=guide_table, guide_cls_map=guide_cls_map,
    )
    return out if return_timestamps else out[:3]
