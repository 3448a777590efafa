"""Vectorized chunk scoring (`score_chunk`) vs sequential protocol replay.

The chunked kernel decode (ops/beam_chunked.py) replays each beam's
emitted tokens through the LM once per chunk with NO per-frame scan; these
tests assert that replay is EXACTLY the fold of the per-token protocol
(`score`/`select` with a single candidate) over the same stream — total
log-prob, advanced state, and the `final()` bonus computed from it — for
every LM class, across random streams, random chunk splits, words cut by
chunk boundaries, double spaces, unknown words, and empty chunks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu.ops.lm import (
    HashedNGramLM,
    HashedWordNGramLM,
    NGramLM,
    WordNGramLM,
    bigram_from_counts,
)

_TRIGRAM_ARPA = """\
\\data\\
ngram 1=6
ngram 2=6
ngram 3=4

\\1-grams:
-0.8 a -0.3
-0.9 b -0.2
-1.2 c
-0.5 <s> -0.4
-1.0 </s>
-2.0 <unk>

\\2-grams:
-0.4 <s> a -0.1
-0.7 a b -0.2
-0.6 b c
-0.9 a a
-1.1 c </s>
-0.8 b a -0.15

\\3-grams:
-0.2 <s> a b
-0.5 a b c
-0.9 b a a
-0.3 a b </s>

\\end\\
"""

_WORD_TRIGRAM_ARPA = """\
\\data\\
ngram 1=6
ngram 2=5
ngram 3=3

\\1-grams:
-0.9 cat -0.3
-1.0 dog -0.2
-1.3 ox
-0.5 <s> -0.4
-1.0 </s>
-2.5 <unk>

\\2-grams:
-0.4 <s> cat -0.1
-0.6 cat dog -0.2
-0.8 dog ox
-1.0 ox cat
-0.9 cat </s>

\\3-grams:
-0.3 <s> cat dog
-0.5 cat dog ox
-0.7 dog ox cat

\\end\\
"""


def _sequential_replay(lm, stream):
    """Fold the per-token protocol over a stream (the rescore_nbest loop)."""
    state = lm.init_state(1)
    total = 0.0
    zero = jnp.zeros((1,), jnp.int32)
    nostay = jnp.zeros((1,), bool)
    for tok in stream:
        lm_lp, st_ext = lm.score(state, jnp.asarray([tok], jnp.int32))
        total += float(lm_lp[0, 0])
        state = lm.select(state, st_ext, zero, zero, nostay)
    return total, state


def _chunked_replay(lm, stream, chunk, n_chunks):
    """score_chunk over fixed-size -1-padded chunks (trailing empties)."""
    state = lm.init_state(1)
    total = 0.0
    for i in range(n_chunks):
        part = stream[i * chunk: (i + 1) * chunk]
        toks = np.full((1, chunk), -1, np.int32)
        toks[0, : len(part)] = part
        lp, state = lm.score_chunk(state, jnp.asarray(toks))
        total += float(lp[0])
    return total, state


def _assert_state_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _check(lm, stream, chunk):
    n_chunks = max(1, -(-len(stream) // chunk)) + 1  # + one empty chunk
    t_seq, s_seq = _sequential_replay(lm, stream)
    t_chk, s_chk = _chunked_replay(lm, stream, chunk, n_chunks)
    np.testing.assert_allclose(t_chk, t_seq, atol=1e-4, rtol=1e-5)
    _assert_state_equal(s_chk, s_seq)
    np.testing.assert_allclose(
        np.asarray(lm.final(s_chk)), np.asarray(lm.final(s_seq)), atol=1e-6
    )


def _word_streams(rng, space_id, char_ids, n=12, max_len=40):
    """Random char streams: words (known spellings get generated naturally),
    double spaces, leading/trailing spaces, chunk-boundary word cuts."""
    streams = [[], [space_id], [space_id, space_id],
               list(char_ids[:2]) + [space_id] + list(char_ids[:1])]
    for _ in range(n):
        ln = int(rng.integers(1, max_len))
        s = [int(space_id) if rng.random() < 0.25
             else int(rng.choice(char_ids)) for _ in range(ln)]
        streams.append(s)
    return streams


@pytest.mark.parametrize("chunk", [1, 3, 8])
def test_ngram_lm_chunk_matches_sequential(rng, chunk):
    v = 7
    lm = NGramLM(bigram_from_counts(rng.integers(0, 20, (v, v))),
                 start_logp=rng.standard_normal(v).astype(np.float32),
                 eos_logp=rng.standard_normal(v).astype(np.float32))
    for _ in range(8):
        ln = int(rng.integers(0, 30))
        stream = [int(x) for x in rng.integers(0, v, ln)]
        _check(lm, stream, chunk)


@pytest.mark.parametrize("chunk", [2, 5])
def test_hashed_ngram_lm_chunk_matches_sequential(rng, tmp_path, chunk):
    f = tmp_path / "lm.arpa"
    f.write_text(_TRIGRAM_ARPA)
    lm = HashedNGramLM.from_arpa(str(f), ["_", "a", "b", "c"])
    for _ in range(10):
        ln = int(rng.integers(0, 25))
        stream = [int(x) for x in rng.integers(1, 4, ln)]
        _check(lm, stream, chunk)


@pytest.mark.parametrize("chunk", [1, 4, 9])
def test_word_bigram_lm_chunk_matches_sequential(rng, chunk):
    # alphabet: 0=blank, 1='a', 2='b', 3=' '; words a, b, ab, ba, abb
    words = [(1,), (2,), (1, 2), (2, 1), (1, 2, 2)]
    wv = len(words)
    bigram = np.log(np.maximum(
        rng.random((wv, wv)).astype(np.float32), 1e-3))
    start = rng.standard_normal(wv).astype(np.float32)
    eos = rng.standard_normal(wv).astype(np.float32)
    uni = rng.standard_normal(wv).astype(np.float32)
    lm = WordNGramLM(words, bigram, start, space_id=3, unigram_logp=uni,
                     eos_logp=eos, unk_logp=-17.0)
    for stream in _word_streams(rng, 3, [1, 2]):
        _check(lm, stream, chunk)


@pytest.mark.parametrize("chunk", [1, 4, 9])
def test_hashed_word_lm_chunk_matches_sequential(rng, tmp_path, chunk):
    from end2end_tpu.utils.text import Alphabet

    f = tmp_path / "words.arpa"
    f.write_text(_WORD_TRIGRAM_ARPA)
    alphabet = Alphabet(["_", "c", "a", "t", "d", "o", "g", "x", " "])
    lm = HashedWordNGramLM.from_arpa(str(f), ["cat", "dog", "ox"], alphabet)
    space = alphabet.encode(" ")[0]
    chars = [alphabet.encode(ch)[0] for ch in "catdogx"]
    # include streams spelling real words so hits AND misses both occur
    def seq(text):
        return [alphabet.encode(ch)[0] for ch in text]
    streams = [seq("cat dog ox"), seq("cat do"), seq("  cat"),
               seq("tacocat dog "), seq("ox")]
    streams += _word_streams(rng, space, chars)
    for stream in streams:
        _check(lm, stream, chunk)


# --- prefix-boundary (BPE-style) word LMs --------------------------------
# Subword vocab: ids 0 '▁ca', 1 't', 2 '▁d', 3 'og', 4 '▁ox', 5 'x';
# boundary (word-starter) tokens = {0, 2, 4}; spellings include them.
_BPE_BND = [0, 2, 4]
_BPE_SPELL = [(0, 1), (2, 3), (4,)]  # cat, dog, ox


def _bpe_streams(rng, n=12, max_len=24):
    streams = [[], [1], [0, 1], [0, 1, 2, 3, 4],   # cat dog ox
               [4, 4, 4], [1, 5, 0, 1],            # unmarked lead word
               [0, 1, 1, 2, 3]]                    # unknown 'catt'
    for _ in range(n):
        ln = int(rng.integers(1, max_len))
        streams.append([int(x) for x in rng.integers(0, 6, ln)])
    return streams


@pytest.mark.parametrize("chunk", [1, 4, 9])
def test_prefix_hashed_word_lm_chunk_matches_sequential(
        rng, tmp_path, chunk):
    f = tmp_path / "words.arpa"
    f.write_text(_WORD_TRIGRAM_ARPA)
    lm = HashedWordNGramLM.from_arpa(
        str(f), ["cat", "dog", "ox"], spellings=_BPE_SPELL,
        boundary_ids=_BPE_BND)
    for stream in _bpe_streams(rng):
        _check(lm, stream, chunk)


@pytest.mark.parametrize("chunk", [1, 4, 9])
def test_prefix_word_bigram_chunk_matches_sequential(rng, chunk):
    wv = len(_BPE_SPELL)
    bigram = np.log(np.maximum(
        rng.random((wv, wv)).astype(np.float32), 1e-3))
    lm = WordNGramLM(_BPE_SPELL, bigram,
                     rng.standard_normal(wv).astype(np.float32), None,
                     unigram_logp=rng.standard_normal(wv).astype(np.float32),
                     eos_logp=rng.standard_normal(wv).astype(np.float32),
                     unk_logp=-11.0, boundary_ids=_BPE_BND)
    for stream in _bpe_streams(rng):
        _check(lm, stream, chunk)


def test_prefix_mode_equals_separator_twin(rng, tmp_path):
    """Oracle: prefix-boundary segmentation == a separator-mode twin of
    the SAME LM decoding the stream with an explicit separator inserted
    before every boundary token (word spellings unchanged — in prefix
    mode the boundary token is part of its word)."""
    f = tmp_path / "words.arpa"
    f.write_text(_WORD_TRIGRAM_ARPA)
    sep = 9  # unused token id
    lm_p = HashedWordNGramLM.from_arpa(
        str(f), ["cat", "dog", "ox"], spellings=_BPE_SPELL,
        boundary_ids=_BPE_BND)
    from end2end_tpu.utils.arpa import parse_arpa_order

    order, ngrams = parse_arpa_order(str(f), ["cat", "dog", "ox"])
    lm_s = HashedWordNGramLM(_BPE_SPELL, order, ngrams, sep)
    for stream in _bpe_streams(rng, n=8):
        t_p, s_p = _sequential_replay(lm_p, stream)
        twin = []
        for t in stream:
            if t in _BPE_BND:
                twin.append(sep)
            twin.append(t)
        t_s, s_s = _sequential_replay(lm_s, twin)
        np.testing.assert_allclose(t_p, t_s, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(lm_p.final(s_p)), np.asarray(lm_s.final(s_s)),
            atol=1e-6)


def test_boundary_mode_arg_validation():
    with pytest.raises(ValueError):
        HashedWordNGramLM([(0,)], 1, {1: [((0,), -1.0, 0.0)]}, 3,
                          boundary_ids=[0])
    with pytest.raises(ValueError):
        HashedWordNGramLM([(0,)], 1, {1: [((0,), -1.0, 0.0)]}, None)
