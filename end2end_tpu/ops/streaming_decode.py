"""Incremental (streaming) CTC decoding with explicit carried state.

models/streaming.py handles long-form audio by stitching the whole lattice
and decoding once — simple, but latency is the full utterance.  This module
is the bounded-latency alternative: feed lattice CHUNKS as they arrive and
carry the decoder state across calls.  Because both decoders are
single-pass left-to-right scans, streaming is EXACT: stepping chunks
[0:c), [c:2c), ... reproduces the one-shot decode over [0:T) bit for bit
(the chunk boundary just splits the scan; tested in
tests/test_streaming_decode.py).

State is an ordinary JAX pytree: it can be donated, checkpointed, or
sharded over a batch mesh like any other array, and `finish()` is pure —
call it mid-stream for partial (best-so-far) hypotheses without disturbing
the stream.

The reference has no streaming API (its C++ decoders are whole-utterance
calls, SURVEY.md §4.3/4.4); this is the TPU-native production extension for
long-form / live ASR.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .beam_search import _beam_init_state, _beam_rank, _beam_search_single


def _bcast(x, n):
    return jnp.broadcast_to(x[None], (n,) + x.shape)


# --------------------------------------------------------------------------
# Greedy
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("blank", "s_cap"))
def _greedy_stream_step(state, log_probs, chunk_lengths, blank, s_cap):
    buf, count, prev_id, score = state
    t_max, n, _ = log_probs.shape
    il = chunk_lengths
    best = jnp.max(log_probs, axis=-1)
    ids_nt = jnp.argmax(log_probs, axis=-1).astype(jnp.int32).T  # (N, T)
    t_mask = jnp.arange(t_max, dtype=jnp.int32)[None, :] < il[:, None]
    # the collapse carries across the chunk boundary: the first frame's
    # "previous path symbol" is the last valid frame of the prior chunk
    prev = jnp.concatenate([prev_id[:, None], ids_nt[:, :-1]], axis=1)
    keep = (ids_nt != blank) & (ids_nt != prev) & t_mask
    pos = count[:, None] + jnp.cumsum(keep, axis=1) - 1
    scatter_idx = jnp.where(keep & (pos < s_cap), pos, s_cap)
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    buf = buf.at[rows, scatter_idx].set(ids_nt, mode="drop")
    count = count + jnp.sum(keep, axis=1).astype(jnp.int32)
    # path symbol at the last valid frame (unchanged for empty chunks)
    last_valid = jnp.clip(il - 1, 0, t_max - 1)
    new_prev = ids_nt[jnp.arange(n), last_valid]
    prev_id = jnp.where(il > 0, new_prev, prev_id)
    score = score + jnp.sum(jnp.where(t_mask, best.T, 0.0), axis=1)
    return buf, count, prev_id, score


class StreamingGreedyDecoder:
    """Chunk-at-a-time greedy CTC decoding; exact vs the one-shot decoder.

    Usage::

        dec = StreamingGreedyDecoder(blank=0, max_symbols=512)
        state = dec.init(batch_size)
        for chunk, chunk_len in stream:      # chunk: (Tc, N, V)
            state = dec.step(state, chunk, chunk_len)
        tokens, lengths, scores = dec.finish(state)
    """

    def __init__(self, blank: int = 0, max_symbols: int = 512,
                 pad_id: int = -1):
        self.blank = int(blank)
        self.max_symbols = int(max_symbols)
        self.pad_id = int(pad_id)

    def init(self, batch_size: int):
        n = batch_size
        return (
            jnp.full((n, self.max_symbols), self.pad_id, jnp.int32),
            jnp.zeros((n,), jnp.int32),
            jnp.full((n,), -1, jnp.int32),   # path symbol before frame 0
            jnp.zeros((n,), jnp.float32),
        )

    def step(self, state, log_probs, chunk_lengths=None):
        log_probs = jnp.asarray(log_probs)
        t_max, n, _ = log_probs.shape
        if chunk_lengths is None:
            chunk_lengths = jnp.full((n,), t_max, jnp.int32)
        return _greedy_stream_step(
            state, log_probs, jnp.asarray(chunk_lengths, jnp.int32),
            self.blank, self.max_symbols,
        )

    def finish(self, state):
        buf, count, _, score = state
        return buf, jnp.minimum(count, self.max_symbols), score


# --------------------------------------------------------------------------
# Beam
# --------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("W", "K", "s_cap", "blank", "lm", "lm_alpha", "lm_beta",
                     "approx_topk"),
)
def _beam_stream_step(state, log_probs, chunk_lengths, W, K, s_cap, blank,
                      lm, lm_alpha, lm_beta, approx_topk):
    t_max, n, v = log_probs.shape
    if approx_topk and K < v:
        lpk, ck = jax.lax.approx_max_k(log_probs, K)
    else:
        lpk, ck = jax.lax.top_k(log_probs, K)

    core, offset = state

    def one(lp_s, lpk_s, ck_s, il_s, st, off):
        return _beam_search_single(
            lp_s, lpk_s, ck_s, il_s, W=W, K=K, s_cap=s_cap, blank=blank,
            lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta, state0=st, t0=off,
        )

    core = jax.vmap(one, in_axes=(1, 1, 1, 0, 0, 0))(
        log_probs, lpk, ck.astype(jnp.int32), chunk_lengths, core, offset
    )
    return core, offset + chunk_lengths


@partial(jax.jit, static_argnames=("W", "lm", "lm_alpha"))
def _beam_stream_finish(state, W, lm, lm_alpha):
    core, _ = state
    return jax.vmap(partial(_beam_rank, W=W, lm=lm, lm_alpha=lm_alpha))(core)


class StreamingBeamDecoder:
    """Chunk-at-a-time prefix beam search; exact vs the one-shot XLA scan.

    Same hypothesis state as `beam_search_decode(implementation='xla')` —
    token matrices, (p_blank, p_non_blank), prefix hashes, and the LM carry
    — exposed as an explicit pytree.  `finish()` is pure: call it any time
    for the current best hypotheses (partial results) and keep streaming.

    For finished samples pass `chunk_lengths=0` in later steps (their state
    freezes, exactly like frames past `input_lengths` in the one-shot call).
    """

    def __init__(self, beam_width: int = 8, blank: int = 0,
                 prune_k: int | None = None, max_symbols: int = 512,
                 lm=None, lm_alpha: float = 0.0, lm_beta: float = 0.0,
                 approx_topk: bool = False):
        self.beam_width = int(beam_width)
        self.blank = int(blank)
        self.prune_k = prune_k
        self.max_symbols = int(max_symbols)
        self.lm = lm
        self.lm_alpha = float(lm_alpha)
        self.lm_beta = float(lm_beta)
        self.approx_topk = bool(approx_topk)

    def init(self, batch_size: int):
        single = _beam_init_state(self.beam_width, self.max_symbols, self.lm)
        core = jax.tree.map(lambda x: _bcast(x, batch_size), single)
        # per-sample global frame offset (for utterance-global timestamps)
        return core, jnp.zeros((batch_size,), jnp.int32)

    def step(self, state, log_probs, chunk_lengths=None):
        log_probs = jnp.asarray(log_probs)
        t_max, n, v = log_probs.shape
        if chunk_lengths is None:
            chunk_lengths = np.full((n,), t_max, np.int32)
        k = min(self.prune_k or v, v)
        return _beam_stream_step(
            state, log_probs, jnp.asarray(chunk_lengths, jnp.int32),
            self.beam_width, k, self.max_symbols, self.blank,
            self.lm, self.lm_alpha, self.lm_beta, self.approx_topk,
        )

    def finish(self, state, return_timestamps: bool = False):
        out = _beam_stream_finish(state, self.beam_width, self.lm,
                                  self.lm_alpha)
        return out if return_timestamps else out[:3]


# --------------------------------------------------------------------------
# Transducer (RNN-T) — greedy and ALSD beam, chunk-at-a-time
# --------------------------------------------------------------------------

class StreamingRNNTGreedyDecoder:
    """Chunk-at-a-time greedy transducer decoding; exact vs the one-shot
    `rnnt_greedy_decode` (same scan, split at chunk boundaries — the
    cursor freezes at the chunk edge and resumes identically).

    Unlike CTC, the transducer consumes ENCODER chunks (N, Tc, H), not
    log-prob chunks — the joint runs inside.  The greedy cursor never
    looks back, so no frame history is carried.  Tokens/lengths/times
    are bit-exact vs one-shot; scores past a bound symbol cap match to
    f32 summation order (the vectorized blank-tail fast path).

    Usage::

        dec = StreamingRNNTGreedyDecoder(pred_step, init_hidden, joint_fn)
        state = dec.init(batch_size)
        for chunk, chunk_len in stream:      # chunk: (N, Tc, H)
            state = dec.step(state, chunk, chunk_len)
        tokens, lengths, scores = dec.finish(state)

    `finish()` is pure — call it mid-stream for partial hypotheses.
    """

    def __init__(self, predictor_step, init_hidden, joint_fn, *,
                 blank: int = 0, max_symbols: int = 256,
                 max_symbols_per_frame: int = 4, lookahead: int = 1):
        self.pred_step = predictor_step
        self.init_hidden = init_hidden
        self.joint_fn = joint_fn
        self.blank = int(blank)
        self.s_cap = int(max_symbols)
        self.mpf = int(max_symbols_per_frame)
        self.lookahead = int(lookahead)

    def init(self, batch_size: int):
        from .rnnt_decode import _greedy_carry0

        n = batch_size
        hidden0 = jax.tree.map(
            lambda x: _bcast(jnp.asarray(x), n), self.init_hidden)
        return (_greedy_carry0(n, self.s_cap, hidden0),
                jnp.zeros((n,), jnp.int32))

    def step(self, state, encoder_chunk, chunk_lengths=None):
        from .rnnt_decode import _rnnt_greedy_scan

        carry, avail = state
        enc = jnp.asarray(encoder_chunk, jnp.float32)
        n, tc, _ = enc.shape
        if chunk_lengths is None:
            chunk_lengths = np.full((n,), tc, np.int32)
        cl = jnp.asarray(chunk_lengths, jnp.int32)
        avail_new = avail + cl
        carry = _rnnt_greedy_scan(
            enc, avail_new, avail_new, avail, carry, self.pred_step,
            self.joint_fn, self.blank, self.s_cap, self.mpf,
            tc + self.s_cap, self.lookahead)
        return carry, avail_new

    def finish(self, state, return_timestamps: bool = False):
        carry, _ = state
        _, u, _, _, tokens, times, score = carry
        out = (tokens, jnp.minimum(u, self.s_cap), score, times)
        return out if return_timestamps else out[:3]


class StreamingRNNTBeamDecoder:
    """Chunk-at-a-time ALSD transducer beam search; exact vs the one-shot
    `rnnt_beam_decode` (same scan; a sample freezes whole — all beams
    together, preserving the alignment-length sync d = t + u — whenever
    any live beam needs a frame beyond the chunk edge).

    ALSD beams at the same step sit at DIFFERENT frames (t = d - u), so
    resuming needs a bounded lookback: the state carries the last
    `max_symbols` encoder frames — exactly the worst-case beam t-spread
    (u differs by at most the symbol cap), so streaming is exact
    UNCONDITIONALLY, with O(N * max_symbols * H) carried frames.
    (One refinement: once a hypothesis is symbol-capped, its remaining
    all-blank mass is summed in one vectorized pass — see
    rnnt_decode._rnnt_beam_scan — so SCORES past the cap match the
    one-shot decode to f32 summation order ~1e-5; tokens, lengths, and
    timestamps stay bit-exact, and so do scores while the cap is slack.)

    LM shallow fusion (`lm=`, ops/lm.py protocol or NeuralLM) rides the
    carried state across chunks like every other beam component.

    `finish()` is pure AND closing: it runs the final drain (remaining
    frames + trailing blanks) on a copy of the state, so mid-stream calls
    give exact best-so-far hypotheses without disturbing the stream.
    """

    def __init__(self, predictor_step, init_hidden, joint_fn, *,
                 beam_width: int = 4, prune_k: int | None = None,
                 blank: int = 0, max_symbols: int = 256,
                 lm=None, lm_alpha: float = 0.0, lm_beta: float = 0.0,
                 lookahead: int = 1):
        self.pred_step = predictor_step
        self.init_hidden = init_hidden
        self.joint_fn = joint_fn
        self.W = int(beam_width)
        self.prune_k = prune_k
        self.blank = int(blank)
        self.s_cap = int(max_symbols)
        self.lm = lm
        self.lm_alpha = float(lm_alpha)
        self.lm_beta = float(lm_beta)
        self.lookahead = int(lookahead)

    def _k(self, h_enc):
        probe = jax.eval_shape(self.joint_fn,
                               jax.ShapeDtypeStruct((h_enc,), jnp.float32),
                               self.init_hidden)
        v = probe.shape[-1]
        k = (int(self.prune_k) if self.prune_k is not None
             else min(2 * self.W, v - 1))
        return max(1, min(k, v - 1))

    def init(self, batch_size: int, h_enc: int):
        """h_enc: encoder feature size (sizes the carried frame history)."""
        from .rnnt_decode import _beam_carry0

        n = batch_size
        hidden0 = jax.tree.map(
            lambda x: _bcast(_bcast(jnp.asarray(x), self.W), n),
            self.init_hidden)
        carry = _beam_carry0(n, self.W, self.s_cap, hidden0, self.lm)
        hist = jnp.zeros((n, self.s_cap, h_enc), jnp.float32)
        return carry, hist, jnp.zeros((n,), jnp.int32)

    def step(self, state, encoder_chunk, chunk_lengths=None):
        from .rnnt_decode import _rnnt_beam_scan

        carry, hist, avail = state
        enc = jnp.asarray(encoder_chunk, jnp.float32)
        n, tc, h_enc = enc.shape
        if chunk_lengths is None:
            chunk_lengths = np.full((n,), tc, np.int32)
        cl = jnp.asarray(chunk_lengths, jnp.int32)
        lb = self.s_cap
        enc_eff = jnp.concatenate([hist, enc], axis=1)   # frames avail-lb..
        avail_new = avail + cl
        far = jnp.full((n,), np.int32(2 ** 30))          # stream still open
        carry = _rnnt_beam_scan(
            enc_eff, far, avail_new, avail - lb, carry, self.pred_step,
            self.joint_fn, self.blank, self.W, self._k(h_enc), self.s_cap,
            tc + self.s_cap, lm=self.lm, lm_alpha=self.lm_alpha,
            lm_beta=self.lm_beta, lookahead=self.lookahead)
        hist_new = jax.vmap(
            lambda e, o: jax.lax.dynamic_slice_in_dim(e, o, lb, axis=0)
        )(enc_eff, cl)
        return carry, hist_new, avail_new

    def finish(self, state, return_timestamps: bool = False):
        from .rnnt_decode import _rnnt_beam_finish, _rnnt_beam_scan

        carry, hist, avail = state
        n, lb, h_enc = hist.shape
        # close the stream on a copy: remaining lookback frames + trailing
        # blanks until every live hypothesis has consumed frame avail-1
        carry = _rnnt_beam_scan(
            hist, avail, avail, avail - lb, carry, self.pred_step,
            self.joint_fn, self.blank, self.W, self._k(h_enc), self.s_cap,
            lb + self.s_cap + 1, lm=self.lm, lm_alpha=self.lm_alpha,
            lm_beta=self.lm_beta, lookahead=self.lookahead)
        out = _rnnt_beam_finish(carry, self.W, lm=self.lm,
                                lm_alpha=self.lm_alpha)
        return out if return_timestamps else out[:3]
