"""Shallow-fusion language models for the beam-search decoder.

TPU-native replacement for the reference's KenLM hook (SURVEY.md §3.1 N6):
instead of calling out to a C++ n-gram library per hypothesis (impossible
inside a compiled scan), the LM is a set of DEVICE ARRAYS queried with
gathers, and its per-beam state rides in the `lax.scan` carry.

Protocol (duck-typed; used by beam_search.py when `lm=` is given):

  init_state(W) -> state           pytree of (W, ...) arrays, one per beam
  score(state, ck) -> (lm_lp, state_ext)
      ck: (K,) int32 candidate tokens for this frame.
      lm_lp: (W, K) log p_LM(ck[k] | beam w's prefix).
      state_ext: pytree of (W, K, ...) arrays — state after extending.
  select(state, state_ext, parent, kk, is_stay) -> state
      gather the surviving beams' states (stay: state[parent];
      extend: state_ext[parent, kk]).
  final(state) -> (W,) end-of-sequence bonus added once at the end.

The decoder applies `lm_alpha * lm_lp + lm_beta` per emitted token (alpha =
LM weight, beta = insertion bonus — the reference's alpha/beta knobs).

LM objects are STATIC jit arguments (hashed by identity): reuse one instance
across calls or every new instance recompiles.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class NGramLM:
    """Token-level n-gram LM with dense tables (n = 1 or 2).

    For bigram: `table[prev, next] = log p(next | prev)` with a dedicated
    start row used when the prefix is empty.  State = last token id per beam
    (-1 for the empty prefix).  Tables live in device memory; scoring is one
    gather per frame.  Build tables from an ARPA file with
    `end2end_tpu.utils.arpa.load_arpa` (uses the native C parser when built).
    """

    def __init__(self, bigram_logp, start_logp=None, eos_logp=None):
        """bigram_logp: (V, V) log p(next|prev); start_logp: (V,) log p(next|<s>)
        (defaults to uniform 0); eos_logp: (V,) log p(</s>|last) (default 0)."""
        bigram_logp = jnp.asarray(bigram_logp, jnp.float32)
        v = bigram_logp.shape[0]
        if start_logp is None:
            start_logp = jnp.zeros((v,), jnp.float32)
        # Row V = start-of-sequence context.
        self._table = jnp.concatenate(
            [bigram_logp, jnp.asarray(start_logp, jnp.float32)[None, :]], axis=0
        )
        self._eos = (
            jnp.asarray(eos_logp, jnp.float32)
            if eos_logp is not None
            else jnp.zeros((v,), jnp.float32)
        )
        self._v = v

    def init_state(self, w):
        return jnp.full((w,), -1, jnp.int32)  # last token; -1 = start

    def score(self, state, ck):
        ctx = jnp.where(state < 0, self._v, state)  # (W,)
        rows = self._table[ctx]  # (W, V)
        lm_lp = rows[:, ck]  # (W, K)
        state_ext = jnp.broadcast_to(ck[None, :], lm_lp.shape).astype(jnp.int32)
        return lm_lp, state_ext

    def select(self, state, state_ext, parent, kk, is_stay):
        return jnp.where(is_stay, state[parent], state_ext[parent, kk])

    def final(self, state):
        last = jnp.clip(state, 0, self._v - 1)
        return jnp.where(state >= 0, self._eos[last], 0.0)


class UniformLM(NGramLM):
    """Degenerate LM assigning log p = const to every token (for testing:
    with alpha it only adds a per-token constant, acting as a length bonus)."""

    def __init__(self, vocab_size, logp=0.0):
        super().__init__(jnp.full((vocab_size, vocab_size), logp, jnp.float32))


def bigram_from_counts(counts, smoothing: float = 1.0):
    """Dense bigram log-probs from a (V, V) count matrix (add-k smoothing)."""
    counts = np.asarray(counts, np.float64) + smoothing
    probs = counts / counts.sum(axis=1, keepdims=True)
    return np.log(probs).astype(np.float32)
