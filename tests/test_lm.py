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
