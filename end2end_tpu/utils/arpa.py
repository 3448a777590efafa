"""ARPA n-gram file loading -> dense LM tables for shallow fusion.

The reference vendored KenLM (SURVEY.md §3.1 N6) and queried it per
hypothesis on the CPU.  On TPU, per-hypothesis host callbacks are impossible
inside a compiled scan, so the model is materialized ONCE into dense
device-resident tables (unigram + backoff-completed bigram + <s>/</s> rows)
consumed by `ops.lm.NGramLM` with pure gathers.

Parsing uses the native C parser (csrc/e2e_native.cpp, ~10x faster) when the
toolchain is available, else the pure-Python fallback here — identical
output, cross-checked in tests/test_native.py.
"""

from __future__ import annotations

import numpy as np

from ..ops.semiring import LOG0
from . import native

_LN10 = np.log(10.0)


def parse_arpa_python(path: str, vocab: list[str]):
    """Pure-Python ARPA parser; same contract as native.parse_arpa_native."""
    v = len(vocab)
    word_id = {w: i for i, w in enumerate(vocab)}
    uni = np.full(v, LOG0, np.float32)
    bo = np.zeros(v, np.float32)
    start = np.full(v, LOG0, np.float32)
    eos = np.full(v, LOG0, np.float32)
    bigrams = []
    unk_lp, start_bo, eos_uni = LOG0, 0.0, None
    section = 0
    with open(path) as f:
        for line in f:
            s = line.strip()
            if s == "\\1-grams:":
                section = 1
                continue
            if s == "\\2-grams:":
                section = 2
                continue
            if s in ("\\end\\", "\\3-grams:"):
                section = 3
                continue
            parts = s.split()
            if section == 1 and len(parts) >= 2:
                lp = float(parts[0]) * _LN10
                w = parts[1]
                b = float(parts[2]) * _LN10 if len(parts) >= 3 else 0.0
                if w in ("<unk>", "<UNK>"):
                    unk_lp = lp
                elif w == "<s>":
                    start_bo = b
                elif w == "</s>":
                    eos_uni = lp
                elif w in word_id:
                    uni[word_id[w]] = lp
                    bo[word_id[w]] = b
            elif section == 2 and len(parts) == 3:
                lp = float(parts[0]) * _LN10
                w1, w2 = parts[1], parts[2]
                if w2 == "</s>":
                    if w1 in word_id:
                        eos[word_id[w1]] = lp
                elif w2 in word_id:
                    if w1 == "<s>":
                        start[word_id[w2]] = lp
                    elif w1 in word_id:
                        bigrams.append((word_id[w1], word_id[w2], lp))
    uni = np.where(uni <= LOG0, unk_lp, uni).astype(np.float32)
    bigram = bo[:, None] + uni[None, :]
    for w1, w2, lp in bigrams:
        bigram[w1, w2] = lp
    start = np.where(start <= LOG0, start_bo + uni, start).astype(np.float32)
    # Unseen "w </s>" bigrams back off to bo(w) + p(</s>); with no </s>
    # unigram at all, the end-of-sentence bonus is neutral (0).
    eos_fill = (bo + eos_uni) if eos_uni is not None else np.zeros(v)
    eos = np.where(eos <= LOG0, eos_fill, eos).astype(np.float32)
    return uni, bigram.astype(np.float32), start, eos


def load_arpa(path: str, vocab: list[str], prefer_native: bool = True):
    """(unigram, bigram, start, eos) natural-log tables for the vocab."""
    if prefer_native and native.available():
        out = native.parse_arpa_native(path, vocab)
        if out is not None:
            return out
    return parse_arpa_python(path, vocab)


def ngram_lm_from_arpa(path: str, vocab: list[str], prefer_native: bool = True):
    """Build an `ops.lm.NGramLM` directly from an ARPA file."""
    from ..ops.lm import NGramLM

    _, bigram, start, eos = load_arpa(path, vocab, prefer_native)
    return NGramLM(bigram, start_logp=start, eos_logp=eos)


def parse_arpa_order(path: str, vocab: list[str], prefer_native: bool = True):
    """Generic ARPA parser for ANY order (KenLM parity, SURVEY.md §3.1 N6).

    Returns (order, ngrams) where ngrams[k] (1-based) is a list of
    (ids_tuple, logp, backoff) with natural-log scores.  Token ids are vocab
    indices; <s> is id len(vocab), </s> is len(vocab)+1.  N-grams containing
    <unk> or out-of-vocab words are dropped except the <unk> unigram, whose
    log-prob is returned in ngrams["unk"].

    Uses the native C parser when built (cross-checked in tests), else the
    pure-Python fallback below.
    """
    if prefer_native and native.available():
        out = native.parse_arpa_order_native(path, vocab)
        if out is not None:
            return out
    v = len(vocab)
    word_id = {w: i for i, w in enumerate(vocab)}
    word_id["<s>"] = v
    word_id["</s>"] = v + 1
    ngrams: dict = {"unk": None}
    order = 0
    section = 0
    with open(path) as f:
        for line in f:
            s = line.strip()
            if s.startswith("\\") and s.endswith("-grams:"):
                section = int(s[1:-7])
                order = max(order, section)
                ngrams.setdefault(section, [])
                continue
            if s == "\\end\\":
                break
            parts = s.split()
            if section < 1 or len(parts) < section + 1:
                continue
            lp = float(parts[0]) * _LN10
            words = parts[1 : 1 + section]
            bo = (
                float(parts[1 + section]) * _LN10
                if len(parts) > section + 1
                else 0.0
            )
            if section == 1 and words[0] in ("<unk>", "<UNK>"):
                ngrams["unk"] = lp
                continue
            if any(w not in word_id for w in words):
                continue
            ids = tuple(word_id[w] for w in words)
            ngrams[section].append((ids, lp, bo))
    return order, ngrams


class ArpaScorer:
    """Host-side dict-based backoff scorer — exact ARPA/KenLM semantics in
    float64.  The independent oracle for the hashed device tables
    (ops.lm.HashedNGramLM) and for LM-fused beam search tests."""

    def __init__(self, order, ngrams, vocab_size, unk_logp=None):
        self.order = int(order)
        self.v = int(vocab_size)
        self.bos = self.v
        self.eos = self.v + 1
        self.tab = {
            k: {ids: (lp, bo) for ids, lp, bo in ngrams.get(k, [])}
            for k in range(1, self.order + 1)
        }
        u = ngrams.get("unk")
        self.unk = float(unk_logp if unk_logp is not None
                         else (u if u is not None else -23.0))

    @classmethod
    def from_file(cls, path, vocab, **kw):
        # pure-Python float64 parse: this is the ORACLE — keep it independent
        # of the float32 native parser it helps validate
        order, ngrams = parse_arpa_order(path, list(vocab), prefer_native=False)
        return cls(order, ngrams, len(vocab), **kw)

    def score(self, context, w):
        """log p(w | context) with full backoff.  context: token id sequence
        (include bos at the start of an utterance); w: token id."""
        ctx = tuple(context[-(self.order - 1):]) if self.order > 1 else ()
        acc = 0.0
        for k in range(self.order, 0, -1):
            need = k - 1
            if need <= len(ctx):
                c = ctx[len(ctx) - need:]
                g = c + (int(w),)
                if g in self.tab[k]:
                    return self.tab[k][g][0] + acc
                if k > 1 and c in self.tab[k - 1]:
                    acc += self.tab[k - 1][c][1]
        return self.unk + acc
