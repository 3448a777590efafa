"""Shallow-fusion LM hook in the beam-search decoder."""

import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu import beam_search_decode
from end2end_tpu.ops.lm import NGramLM, UniformLM, bigram_from_counts


def log_softmax_np(x):
    return x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))


def _best(tokens, lengths):
    return np.asarray(tokens)[0, 0, : int(np.asarray(lengths)[0, 0])].tolist()


def test_alpha_zero_is_no_lm(rng):
    B, T, V = 2, 12, 6
    lp = log_softmax_np(rng.standard_normal((T, B, V))).astype(np.float32)
    lm = NGramLM(bigram_from_counts(rng.integers(1, 50, (V, V))))
    t0, l0, s0 = beam_search_decode(lp, beam_width=4)
    t1, l1, s1 = beam_search_decode(lp, beam_width=4, lm=lm, lm_alpha=0.0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)


def test_lm_breaks_acoustic_tie(rng):
    """Acoustically ambiguous second token; bigram LM must decide it."""
    V, T = 4, 3
    # Frame 0: token 1 certain.  Frame 1: blank.  Frame 2: tokens 2,3 tied.
    lp = np.full((T, 1, V), -12.0, np.float32)
    lp[0, 0, 1] = -0.01
    lp[1, 0, 0] = -0.01
    lp[2, 0, 2] = -0.8
    lp[2, 0, 3] = -0.8
    lp = log_softmax_np(lp.astype(np.float64)).astype(np.float32)

    big = np.full((V, V), np.log(0.01), np.float32)
    big[1, 2] = np.log(0.9)  # after 1, prefer 2
    lm_prefers_2 = NGramLM(big)
    t, l, s = beam_search_decode(lp, beam_width=4, lm=lm_prefers_2, lm_alpha=1.0)
    assert _best(t, l) == [1, 2]

    big2 = big.copy()
    big2[1, 2] = np.log(0.01)
    big2[1, 3] = np.log(0.9)  # after 1, prefer 3
    lm_prefers_3 = NGramLM(big2)
    t, l, s = beam_search_decode(lp, beam_width=4, lm=lm_prefers_3, lm_alpha=1.0)
    assert _best(t, l) == [1, 3]


def test_uniform_lm_is_length_bonus(rng):
    """UniformLM(logp=0) + beta acts as a pure insertion bonus: higher beta
    must never shorten the best hypothesis."""
    B, T, V = 1, 10, 5
    lp = log_softmax_np(rng.standard_normal((T, B, V)) * 0.5).astype(np.float32)
    lm = UniformLM(V)
    lens = []
    for beta in (0.0, 2.0, 6.0):
        t, l, s = beam_search_decode(lp, beam_width=6, lm=lm, lm_alpha=1.0, lm_beta=beta)
        lens.append(int(np.asarray(l)[0, 0]))
    assert lens[0] <= lens[1] <= lens[2]
    assert lens[2] > lens[0]  # a big bonus must actually lengthen output


def test_eos_bonus_reranks(rng):
    V, T = 4, 2
    lp = np.full((T, 1, V), -8.0, np.float32)
    lp[0, 0, 1] = -0.7
    lp[0, 0, 2] = -0.75
    lp[1, 0, 0] = -0.01
    lp = log_softmax_np(lp.astype(np.float64)).astype(np.float32)
    eos = np.zeros(V, np.float32)
    eos[2] = 5.0  # strongly prefer ending on token 2
    lm = NGramLM(np.zeros((V, V), np.float32), eos_logp=eos)
    t, l, s = beam_search_decode(lp, beam_width=4, lm=lm, lm_alpha=1.0)
    assert _best(t, l) == [2]


def _peaked(seq, V, score=-0.01, off=-14.0):
    lp = np.full((len(seq), 1, V), off, np.float32)
    for t, c in enumerate(seq):
        lp[t, 0, c] = score
    return log_softmax_np(lp.astype(np.float64)).astype(np.float32)


def test_word_lm_scores_at_boundaries(rng):
    """Word-level fusion: an acoustically ambiguous word is resolved by the
    WORD bigram when the space lands (reference's KenLM behavior)."""
    from end2end_tpu.ops.lm import WordNGramLM

    # alphabet: 0=blank, 1='a', 2='b', 3=' '
    V = 4
    words = [(1,), (2,), (1, 2)]  # "a", "b", "ab"
    wv = 3
    bigram = np.full((wv, wv), np.log(0.05), np.float32)
    start = np.full((wv,), np.log(1 / 3), np.float32)
    bigram[0, 1] = np.log(0.9)  # after "a", word "b" is very likely

    lm = WordNGramLM(words, bigram, start, space_id=3)

    # frames: 'a' SPACE then ambiguous ('a' vs 'b') then SPACE
    T = 6
    lp = np.full((T, 1, V), -14.0, np.float32)
    lp[0, 0, 1] = -0.01      # 'a'
    lp[1, 0, 3] = -0.01      # ' '
    lp[2, 0, 0] = -0.01      # blank
    lp[3, 0, 1] = -0.7       # 'a' vs 'b' tie-ish
    lp[3, 0, 2] = -0.72
    lp[4, 0, 3] = -0.01      # ' '
    lp[5, 0, 0] = -0.01      # blank
    lp = log_softmax_np(lp.astype(np.float64)).astype(np.float32)

    t0, l0, s0 = beam_search_decode(lp, beam_width=4)
    assert _best(t0, l0) == [1, 3, 1, 3]  # acoustics alone pick 'a a '
    t1, l1, s1 = beam_search_decode(lp, beam_width=4, lm=lm, lm_alpha=1.0)
    assert _best(t1, l1) == [1, 3, 2, 3]  # word bigram flips to 'a b '


def test_word_lm_trailing_word_and_unknown(rng):
    from end2end_tpu.ops.lm import WordNGramLM

    V = 4
    words = [(1,), (2,)]
    bigram = np.full((2, 2), np.log(0.1), np.float32)
    start = np.array([np.log(0.9), np.log(0.01)], np.float32)
    lm = WordNGramLM(words, bigram, start, space_id=3, unk_logp=-30.0)

    # no trailing space: final() must still score the last word.
    lp = _peaked([1, 0], V)     # "a"
    lp2 = _peaked([2, 0], V)    # "b"
    _, _, sa = beam_search_decode(lp, beam_width=2, lm=lm, lm_alpha=1.0)
    _, _, sb = beam_search_decode(lp2, beam_width=2, lm=lm, lm_alpha=1.0)
    # same acoustics, but start("a") >> start("b")
    assert float(sa[0, 0]) > float(sb[0, 0]) + 2.0

    # unknown word ("ab" not in vocab) draws the unk penalty
    lp3 = _peaked([1, 2, 0], V)  # "ab"
    _, _, su = beam_search_decode(lp3, beam_width=2, lm=lm, lm_alpha=1.0)
    assert float(su[0, 0]) < float(sa[0, 0]) - 10.0


def test_word_lm_from_arpa(tmp_path):
    from end2end_tpu.ops.lm import WordNGramLM
    from end2end_tpu.utils.text import Alphabet

    arpa = (
        "\\data\\\nngram 1=5\nngram 2=2\n\n\\1-grams:\n"
        "-0.5 <unk>\n-0.4 <s> -0.2\n-0.5 </s>\n-0.7 cat -0.2\n-0.9 dog -0.2\n\n"
        "\\2-grams:\n-0.2 cat dog\n-1.5 <s> dog\n\n\\end\\\n"
    )
    f = tmp_path / "words.arpa"
    f.write_text(arpa)
    alphabet = Alphabet(["_", "c", "a", "t", "d", "o", "g", " "])
    lm = WordNGramLM.from_arpa(str(f), ["cat", "dog"], alphabet)
    # "cat dog" should outscore "dog dog" under the LM on equal acoustics
    def seq(text):
        return [alphabet.encode(ch)[0] for ch in text]
    lp_cd = _peaked(seq("cat dog"), len(alphabet))
    lp_dd = _peaked(seq("dog dog"), len(alphabet))
    _, _, s_cd = beam_search_decode(lp_cd, beam_width=2, lm=lm, lm_alpha=1.0)
    _, _, s_dd = beam_search_decode(lp_dd, beam_width=2, lm=lm, lm_alpha=1.0)
    assert float(s_cd[0, 0]) > float(s_dd[0, 0])


# ---------------------------------------------------------------------------
# Arbitrary-order hashed n-gram LM (KenLM parity, SURVEY.md §3.1 N6)
# ---------------------------------------------------------------------------

_LN10 = np.log(10.0)

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

_VOCAB = ["_", "a", "b", "c"]  # index = label id; 0 is blank (never scored)
_A, _B, _C = 1, 2, 3


def _write_arpa(tmp_path, text=_TRIGRAM_ARPA, name="lm.arpa"):
    f = tmp_path / name
    f.write_text(text)
    return str(f)


def test_arpa_scorer_hand_values(tmp_path):
    from end2end_tpu.utils.arpa import ArpaScorer

    sc = ArpaScorer.from_file(_write_arpa(tmp_path), _VOCAB)
    bos, eos = sc.bos, sc.eos
    # direct hits
    np.testing.assert_allclose(sc.score((bos,), _A), -0.4 * _LN10, rtol=1e-12)
    np.testing.assert_allclose(sc.score((bos, _A), _B), -0.2 * _LN10, rtol=1e-12)
    np.testing.assert_allclose(sc.score((_A, _B), _C), -0.5 * _LN10, rtol=1e-12)
    # backoff chains (hand-computed)
    # (b c) a: no trigram, bo(b c)=0; (c) a: no bigram, bo(c)=0; uni(a)
    np.testing.assert_allclose(sc.score((_B, _C), _A), -0.8 * _LN10, rtol=1e-12)
    # (a) c: no bigram -> bo(a) + uni(c) = -0.3 + -1.2
    np.testing.assert_allclose(sc.score((_A,), _C), -1.5 * _LN10, rtol=1e-12)
    # (b c) </s>: no trigram, bo(b c)=0 -> bigram c </s> = -1.1
    np.testing.assert_allclose(sc.score((_B, _C), eos), -1.1 * _LN10, rtol=1e-12)
    # context longer than order-1 truncates
    np.testing.assert_allclose(
        sc.score((bos, _C, _A, _B), _C), sc.score((_A, _B), _C), rtol=1e-12
    )


@pytest.mark.parametrize("dense_full", [None, False])
def test_hashed_tables_match_scorer_exhaustive(tmp_path, dense_full):
    """Device tables == dict oracle on EVERY (context, token) pair
    reachable with histories up to length 3 (incl. bos and empty slots) —
    on BOTH query paths: the build-time-resolved dense score table
    (dense_full=None auto-builds it at this vocab size) and the hashed
    backoff chain (dense_full=False, the large-id-space path)."""
    import itertools

    from end2end_tpu.ops.lm import HashedNGramLM
    from end2end_tpu.utils.arpa import ArpaScorer

    path = _write_arpa(tmp_path)
    lm = HashedNGramLM.from_arpa(path, _VOCAB, dense_full=dense_full)
    assert (lm._t._full is not None) == (dense_full is None)
    sc = ArpaScorer.from_file(path, _VOCAB)
    assert lm.order == 3
    toks = [_A, _B, _C]
    ctxs = [()]
    for n in (1, 2, 3):
        ctxs += [c for c in itertools.product(toks, repeat=n)]
    for ctx in ctxs:
        full = (sc.bos,) + ctx
        win = np.full((1, lm.order - 1), -1, np.int32)
        tail = full[-(lm.order - 1):]
        win[0, lm.order - 1 - len(tail):] = tail
        for w in toks + [sc.eos]:
            got = float(lm._t.score(jnp.asarray(win), jnp.asarray([w]))[0])
            want = sc.score(full, w)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                       err_msg=f"ctx={ctx} w={w}")


def test_trigram_beam_fusion_matches_numpy_oracle(tmp_path, rng):
    """Done-criterion (VERDICT #5): beam fusion with a 3-gram ARPA matches an
    independent oracle — the float64 dict-based scorer + dict-based beam."""
    from end2end_tpu.ops.lm import HashedNGramLM
    from end2end_tpu.utils.arpa import ArpaScorer
    from end2end_tpu.utils.reference_impl import beam_search_decode_ref

    path = _write_arpa(tmp_path)
    lm = HashedNGramLM.from_arpa(path, _VOCAB)
    sc = ArpaScorer.from_file(path, _VOCAB)
    B, T, V, W = 3, 10, 4, 4
    lp = log_softmax_np(rng.standard_normal((T, B, V)) * 1.6).astype(np.float32)
    il = np.array([10, 7, 9], np.int32)
    alpha, beta = 0.7, 0.25

    toks, lens, scores = beam_search_decode(
        lp, il, beam_width=W, lm=lm, lm_alpha=alpha, lm_beta=beta
    )
    ref = beam_search_decode_ref(
        np.asarray(lp, np.float64), il, beam_width=W,
        lm=sc, lm_alpha=alpha, lm_beta=beta,
    )
    toks, lens, scores = map(np.asarray, (toks, lens, scores))
    for b in range(B):
        want = dict(ref[b])
        got = {
            tuple(toks[b, w, : lens[b, w]].tolist()): float(scores[b, w])
            for w in range(W) if np.isfinite(scores[b, w])
        }
        assert set(got) == set(want), (b, set(got) ^ set(want))
        for pref, s in got.items():
            np.testing.assert_allclose(s, want[pref], rtol=1e-4, atol=5e-4)


def test_dense_full_table_matches_hashed_bitwise(tmp_path, rng):
    """The dense full-score table (backoff chain resolved at BUILD time, one
    gather per query) is BITWISE identical to the hashed chain on score()
    and score_sequence(), exhaustively over windows that include the
    sentinel ids (-2 unk, -1 empty, bos) and out-of-range ids."""
    import itertools

    from end2end_tpu.ops.lm import HashedNGramLM

    V = 7
    ngrams = {1: [], 2: [], 3: [], "unk": -8.0}
    for a in range(V + 2):
        ngrams[1].append(((a,), float(rng.uniform(-4, -1)),
                          float(rng.uniform(-1, 0))))
    for _ in range(40):
        g = tuple(int(x) for x in rng.integers(0, V + 2, 2))
        ngrams[2].append((g, float(rng.uniform(-3, -0.5)),
                          float(rng.uniform(-1, 0))))
    for _ in range(120):
        g = tuple(int(x) for x in rng.integers(0, V + 2, 3))
        ngrams[3].append((g, float(rng.uniform(-2, -0.3)), 0.0))
    lm_f = HashedNGramLM(3, ngrams, V)
    lm_h = HashedNGramLM(3, ngrams, V, dense_full=False)
    assert lm_f._t._full is not None and lm_h._t._full is None

    ids = list(range(-2, V + 2)) + [99]  # 99 = out-of-range -> miss row
    wins = jnp.asarray(
        np.array(list(itertools.product(ids, ids)), np.int32))
    ws = jnp.asarray(np.array(ids, np.int32))
    sf = np.asarray(lm_f._t.score(wins[:, None, :], ws[None, :]))
    sh = np.asarray(lm_h._t.score(wins[:, None, :], ws[None, :]))
    np.testing.assert_array_equal(sf, sh)

    full = rng.integers(-1, V + 2, (32, 11)).astype(np.int32)
    qf = np.asarray(lm_f._t.score_sequence(jnp.asarray(full), 8))
    qh = np.asarray(lm_h._t.score_sequence(jnp.asarray(full), 8))
    np.testing.assert_array_equal(qf, qh)


def test_fourgram_tables(tmp_path):
    """Order-4 path: parser + hashed tables + backoff through 3 levels."""
    from end2end_tpu.ops.lm import HashedNGramLM
    from end2end_tpu.utils.arpa import ArpaScorer

    arpa = _TRIGRAM_ARPA.replace("\\end\\", """\\4-grams:
-0.15 <s> a b c
-0.45 a b c a

\\end\\""").replace("ngram 3=4", "ngram 3=4\nngram 4=2")
    path = _write_arpa(tmp_path, arpa, "lm4.arpa")
    lm = HashedNGramLM.from_arpa(path, _VOCAB)
    sc = ArpaScorer.from_file(path, _VOCAB)
    assert lm.order == 4 and sc.order == 4
    import itertools

    for ctx in itertools.product([_A, _B, _C], repeat=3):
        for w in (_A, _B, _C, sc.eos):
            win = np.asarray([ctx], np.int32)
            got = float(lm._t.score(jnp.asarray(win), jnp.asarray([w]))[0])
            np.testing.assert_allclose(
                got, sc.score((sc.bos,) + ctx, w), rtol=1e-6, atol=1e-6
            )
    # the 4-gram hit itself
    np.testing.assert_allclose(
        sc.score((sc.bos, _A, _B), _C), -0.15 * _LN10, rtol=1e-12
    )


def test_hashed_word_lm_trigram(tmp_path, rng):
    """Word-level trigram fusion: the word choice depends on TWO previous
    words — impossible for the dense bigram WordNGramLM, the whole point of
    the hashed-order upgrade."""
    from end2end_tpu.ops.lm import HashedWordNGramLM
    from end2end_tpu.utils.text import Alphabet

    # trigram: after "a b" the word "c" is near-certain; after "b b" it's "a"
    arpa = (
        "\\data\\\nngram 1=6\nngram 2=4\nngram 3=2\n\n\\1-grams:\n"
        "-1.9 <unk>\n-0.3 <s> -0.2\n-0.9 </s>\n"
        "-0.5 a -0.2\n-0.5 b -0.2\n-0.9 c -0.2\n\n"
        "\\2-grams:\n-0.4 <s> a -0.1\n-0.4 a b -0.1\n-0.5 b b -0.1\n-0.9 b c\n\n"
        "\\3-grams:\n-0.05 a b c\n-0.1 b b a\n\n\\end\\\n"
    )
    f = tmp_path / "tri_words.arpa"
    f.write_text(arpa)
    alphabet = Alphabet(["_", "a", "b", "c", " "])
    lm = HashedWordNGramLM.from_arpa(str(f), ["a", "b", "c"], alphabet)
    assert lm.order == 3

    def seq(text):
        return [alphabet.encode(ch)[0] for ch in text]

    # ambiguous third word between 'a' and 'c' on equal acoustics
    def lp_for(third):
        return _peaked(seq(f"a b {third}"), len(alphabet))

    _, _, s_c = beam_search_decode(lp_for("c"), beam_width=4, lm=lm, lm_alpha=1.0)
    _, _, s_a = beam_search_decode(lp_for("a"), beam_width=4, lm=lm, lm_alpha=1.0)
    # trigram "a b c" (-0.05) crushes backoff path for "a b a"
    assert float(s_c[0, 0]) > float(s_a[0, 0]) + 1.0

    # and the context actually matters: after "b b", 'a' wins over 'c'
    def lp2(third):
        return _peaked(seq(f"b b {third}"), len(alphabet))

    _, _, s2a = beam_search_decode(lp2("a"), beam_width=4, lm=lm, lm_alpha=1.0)
    _, _, s2c = beam_search_decode(lp2("c"), beam_width=4, lm=lm, lm_alpha=1.0)
    assert float(s2a[0, 0]) > float(s2c[0, 0])


def test_hashed_word_lm_matches_scorer(tmp_path):
    """Word-level hashed scores == the dict oracle over word ids, including
    trailing-word completion and </s> in final()."""
    from end2end_tpu.ops.lm import HashedWordNGramLM
    from end2end_tpu.utils.arpa import ArpaScorer, parse_arpa_order
    from end2end_tpu.utils.text import Alphabet

    arpa = (
        "\\data\\\nngram 1=6\nngram 2=4\nngram 3=2\n\n\\1-grams:\n"
        "-1.9 <unk>\n-0.3 <s> -0.2\n-0.9 </s>\n"
        "-0.5 a -0.2\n-0.5 b -0.2\n-0.9 c -0.2\n\n"
        "\\2-grams:\n-0.4 <s> a -0.1\n-0.4 a b -0.1\n-0.5 b b -0.1\n-0.9 b c\n\n"
        "\\3-grams:\n-0.05 a b c\n-0.1 b b a\n\n\\end\\\n"
    )
    f = tmp_path / "tri_words2.arpa"
    f.write_text(arpa)
    words = ["a", "b", "c"]
    alphabet = Alphabet(["_", "a", "b", "c", " "])
    lm = HashedWordNGramLM.from_arpa(str(f), words, alphabet)
    sc = ArpaScorer.from_file(str(f), words)

    # decode "a b" with a trailing (no-space) "c": fused total must equal
    # alpha * [p(a|<s>) + p(b|<s> a) + p(c|a b) + p(</s>|b c)] exactly.
    def seq(text):
        return [alphabet.encode(ch)[0] for ch in text]

    lp = _peaked(seq("a b c"), len(alphabet))
    _, _, s_lm = beam_search_decode(lp, beam_width=2, lm=lm, lm_alpha=1.0)
    _, _, s_0 = beam_search_decode(lp, beam_width=2)
    got = float(s_lm[0, 0]) - float(s_0[0, 0])
    want = (
        sc.score((sc.bos,), 0) + sc.score((sc.bos, 0), 1)
        + sc.score((0, 1), 2) + sc.score((1, 2), sc.eos)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
