"""Shallow-fusion LM hook in the beam-search decoder."""

import jax.numpy as jnp
import numpy as np

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
