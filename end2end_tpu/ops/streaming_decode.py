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
