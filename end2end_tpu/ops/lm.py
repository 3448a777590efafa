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


class WordNGramLM:
    """Word-level shallow fusion — the reference's KenLM behavior: hypotheses
    are scored with a WORD bigram each time a word completes (at the space
    token and at end of utterance), not per character (SURVEY.md §3.1 N6,
    §4.4 "[KenLM: on word boundary, add alpha*lm_logp + beta]").

    TPU-native mechanics: per-beam state is (previous word id, rolling hash
    of the word being typed, its length); completed words resolve to word
    ids through a device-side open-addressing hash table (one gather + 4
    linear probes, fully vectorized); the word-bigram table is dense
    (vocab_words^2 — fine for the few-thousand-word LMs used with char CTC;
    larger LMs would bucket the bigrams by hash the same way).

    Build from an ARPA word LM with `from_arpa`, or pass tables directly.
    Unknown words (hash misses) score `unk_logp` and condition as <unk>.
    """

    _MULT = np.uint32(31)
    _SEED = np.uint32(5381)
    _PROBES = 4

    def __init__(self, word_spellings, bigram_logp, start_logp, space_id,
                 unigram_logp=None, eos_logp=None, unk_logp=-13.8):
        """word_spellings: list of tuples of CHAR ids (the label alphabet's
        ids) for each word; bigram_logp (Wv, Wv); start_logp (Wv,);
        eos_logp (Wv,) optional; space_id: the word-separator label id."""
        wv = len(word_spellings)
        self._wv = wv
        self._space = int(space_id)
        self._unk = wv + 1  # context row for unknown words; wv = <s>
        bigram_logp = np.asarray(bigram_logp, np.float32)
        start_logp = np.asarray(start_logp, np.float32)
        if unigram_logp is None:
            unigram_logp = np.full((wv,), unk_logp, np.float32)
        unigram_logp = np.asarray(unigram_logp, np.float32)
        # Extended table: rows = context (words, <s>, <unk>);
        # cols = next word (words, then col wv = <unk> next-word).
        ext = np.full((wv + 2, wv + 1), unk_logp, np.float32)
        ext[:wv, :wv] = bigram_logp
        ext[wv, :wv] = start_logp
        ext[wv + 1, :wv] = unigram_logp  # unk context backs off to unigrams
        self._table = jnp.asarray(ext)
        self._eos = jnp.asarray(
            np.concatenate([
                np.asarray(eos_logp, np.float32) if eos_logp is not None
                else np.zeros((wv,), np.float32),
                np.zeros((2,), np.float32),
            ])
        )

        # open-addressing hash table: word spell-hash -> word id
        m = 1
        while m < 4 * max(wv, 1):
            m *= 2
        keys = np.zeros((m,), np.uint32)
        vals = np.full((m,), self._unk, np.int32)
        for wid, spell in enumerate(word_spellings):
            h = self._SEED
            for c in spell:
                h = h * self._MULT + np.uint32(int(c) + 1)
            if h == 0:
                raise ValueError("degenerate word hash")
            idx = int(h) & (m - 1)
            for p in range(self._PROBES):
                j = (idx + p) & (m - 1)
                if keys[j] == 0:
                    keys[j] = h
                    vals[j] = wid
                    break
                if keys[j] == h:
                    raise ValueError(f"word hash collision for word {wid}")
            else:
                raise ValueError("hash table overfull; increase size")
        self._m = m
        self._keys = jnp.asarray(keys)
        self._vals = jnp.asarray(vals)
        self._unk_logp = float(unk_logp)

    @classmethod
    def from_arpa(cls, path, words, alphabet, space_symbol=" ", **kw):
        """words: list of word strings; alphabet: utils.text.Alphabet."""
        from ..utils.arpa import load_arpa

        uni, bigram, start, eos = load_arpa(path, list(words))
        spellings = [tuple(alphabet.encode(w)) for w in words]
        space_id = alphabet.encode(space_symbol)[0]
        return cls(spellings, bigram, start, space_id,
                   unigram_logp=uni, eos_logp=eos, **kw)

    # -- hash lookup --------------------------------------------------------
    def _lookup(self, h):
        """(W,) uint32 spell-hashes -> (W,) word ids (unk on miss)."""
        idx0 = (h & jnp.uint32(self._m - 1)).astype(jnp.int32)
        wid = jnp.full(h.shape, self._unk, jnp.int32)
        found = jnp.zeros(h.shape, bool)
        for p in range(self._PROBES):
            j = (idx0 + p) % self._m
            hit = (self._keys[j] == h) & ~found
            wid = jnp.where(hit, self._vals[j], wid)
            found = found | hit
        return wid

    # -- ShallowFusionLM protocol --------------------------------------------
    def init_state(self, w):
        return (
            jnp.full((w,), self._wv, jnp.int32),      # prev word = <s>
            jnp.full((w,), self._SEED, jnp.uint32),   # rolling word hash
            jnp.zeros((w,), jnp.int32),               # chars in current word
        )

    def score(self, state, ck):
        prev, curh, curlen = state
        w = prev.shape[0]
        k = ck.shape[0]
        is_space = (ck == self._space)[None, :]  # (1, K)
        wid = self._lookup(curh)  # (W,) word completed by a space now
        # completed-word score; empty words (double space) score 0
        complete_lp = self._table[prev, jnp.minimum(wid, self._wv)]
        complete_lp = jnp.where(wid == self._unk, self._unk_logp, complete_lp)
        complete_lp = jnp.where(curlen > 0, complete_lp, 0.0)  # (W,)
        lm_lp = jnp.where(is_space, complete_lp[:, None], 0.0)  # (W, K)

        new_prev = jnp.where(
            is_space, jnp.where(curlen > 0, wid, prev)[:, None],
            prev[:, None],
        ).astype(jnp.int32)
        cku = ck.astype(jnp.uint32) + 1
        new_hash = jnp.where(
            is_space, jnp.uint32(self._SEED),
            curh[:, None] * self._MULT + cku[None, :],
        )
        new_len = jnp.where(is_space, 0, curlen[:, None] + 1).astype(jnp.int32)
        return lm_lp, (new_prev, new_hash, new_len)

    def select(self, state, state_ext, parent, kk, is_stay):
        out = []
        for s, se in zip(state, state_ext):
            out.append(jnp.where(is_stay, s[parent], se[parent, kk]))
        return tuple(out)

    def final(self, state):
        """Complete the trailing word (utterances rarely end in a space)."""
        prev, curh, curlen = state
        wid = self._lookup(curh)
        lp = self._table[prev, jnp.minimum(wid, self._wv)]
        lp = jnp.where(wid == self._unk, self._unk_logp, lp)
        trailing = jnp.where(curlen > 0, lp, 0.0)
        ended = jnp.where(curlen > 0, wid, prev)
        return trailing + self._eos[jnp.minimum(ended, self._wv + 1)]
