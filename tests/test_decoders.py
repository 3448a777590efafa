"""Greedy and prefix beam-search decoders vs the NumPy oracle.

SURVEY.md §5.2 item 4: greedy == loop decode on random inputs; beam-1 ==
greedy on peaked inputs; beam == exhaustive/oracle beam on tiny (T,V);
prefix-merge correctness (logaddexp, never max).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu import (
    BeamSearchCTCDecoder,
    GreedyCTCDecoder,
    beam_search_decode,
    greedy_decode,
)
from end2end_tpu.utils.reference_impl import beam_search_decode_ref, greedy_decode_ref


def log_softmax_np(x):
    return x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))


@pytest.mark.parametrize("B,T,V", [(8, 60, 29), (4, 40, 96), (3, 25, 7)])
def test_greedy_matches_oracle(rng, B, T, V):
    lp = log_softmax_np(rng.standard_normal((T, B, V)) * 2).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    tokens, lengths, scores = jax.jit(lambda x: greedy_decode(x, il))(jnp.asarray(lp))
    ref = greedy_decode_ref(lp, il)
    for b in range(B):
        got = np.asarray(tokens)[b, : int(lengths[b])].tolist()
        assert got == ref[b], (b, got, ref[b])
    # scores = sum of per-frame best log-probs over valid frames
    want_scores = [lp[: il[b], b].max(-1).sum() for b in range(B)]
    np.testing.assert_allclose(np.asarray(scores), want_scores, rtol=1e-5)


def test_greedy_nonzero_blank(rng):
    B, T, V = 3, 30, 11
    lp = log_softmax_np(rng.standard_normal((T, B, V))).astype(np.float32)
    il = np.full(B, T, np.int32)
    tokens, lengths, _ = greedy_decode(lp, il, blank=5)
    ref = greedy_decode_ref(lp, il, blank=5)
    for b in range(B):
        assert np.asarray(tokens)[b, : int(lengths[b])].tolist() == ref[b]


def test_greedy_decoder_class_labels(rng):
    labels = ["_", "a", "b", "c"]
    # path: a a _ b b c -> "abc" ; with explicit argmax construction
    path = [1, 1, 0, 2, 2, 3]
    lp = np.full((6, 1, 4), -9.0, np.float32)
    for t, c in enumerate(path):
        lp[t, 0, c] = -0.01
    texts, scores = GreedyCTCDecoder(blank=0, labels=labels).decode(lp)
    assert texts == ["abc"]


@pytest.mark.parametrize("W", [2, 4, 16])
def test_beam_matches_oracle_small(rng, W):
    B, T, V = 3, 12, 5
    lp = log_softmax_np(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.array([12, 9, 6], np.int32)
    tokens, lengths, scores = beam_search_decode(lp, il, beam_width=W)
    ref = beam_search_decode_ref(lp.astype(np.float64), il, beam_width=W)
    for b in range(B):
        # Oracle and JAX implement the identical algorithm: same top beams,
        # same scores (up to f32).  Compare the full beam set as score-sorted
        # prefix lists (ties can permute; compare as multiset by prefix).
        got = {
            tuple(np.asarray(tokens)[b, w, : int(lengths[b, w])].tolist()): float(
                scores[b, w]
            )
            for w in range(W)
            if np.isfinite(scores[b, w])
        }
        want = dict(ref[b])
        assert set(got) == set(map(tuple, want)), (b, got.keys(), want.keys())
        for p, s in got.items():
            np.testing.assert_allclose(s, want[p], rtol=2e-4, atol=2e-4)


def test_beam_exact_vs_exhaustive(rng):
    """Wide beam on tiny lattice == exact posterior over collapsed outputs."""
    from tests.test_reference_impl import _exhaustive_prefix_scores

    T, V = 5, 3
    logits = rng.standard_normal((T, V)) * 2
    lp = log_softmax_np(logits).astype(np.float32)
    tokens, lengths, scores = beam_search_decode(
        lp[:, None, :], np.array([T], np.int32), beam_width=48
    )
    exact = _exhaustive_prefix_scores(lp.astype(np.float64))
    got = {
        tuple(np.asarray(tokens)[0, w, : int(lengths[0, w])].tolist()): float(scores[0, w])
        for w in range(48)
        if np.isfinite(scores[0, w])
    }
    # Every surviving beam's score must equal the exact collapsed posterior.
    for p, s in got.items():
        np.testing.assert_allclose(s, exact[p], rtol=1e-4, atol=1e-4)
    # And the best prefix must be the true argmax.
    best = max(exact.items(), key=lambda kv: kv[1])[0]
    assert max(got.items(), key=lambda kv: kv[1])[0] == best


def test_beam_prune_k_exact_when_full(rng):
    B, T, V = 2, 10, 6
    lp = log_softmax_np(rng.standard_normal((T, B, V))).astype(np.float32)
    il = np.full(B, T, np.int32)
    t1, l1, s1 = beam_search_decode(lp, il, beam_width=4, prune_k=V)
    t2, l2, s2 = beam_search_decode(lp, il, beam_width=4)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


def test_beam_length_masking(rng):
    """Frames past input_length must not affect the result."""
    B, T, V = 2, 14, 5
    lp = log_softmax_np(rng.standard_normal((T, B, V))).astype(np.float32)
    il = np.array([8, 14], np.int32)
    t1, l1, s1 = beam_search_decode(lp, il, beam_width=4)
    lp2 = lp.copy()
    lp2[8:, 0, :] = log_softmax_np(rng.standard_normal((6, V))).astype(np.float32)
    t2, l2, s2 = beam_search_decode(lp2, il, beam_width=4)
    np.testing.assert_array_equal(np.asarray(t1)[0], np.asarray(t2)[0])
    np.testing.assert_allclose(np.asarray(s1)[0], np.asarray(s2)[0])


def test_beam_decoder_class(rng):
    labels = ["_", "a", "b"]
    path = [1, 0, 2, 2]
    lp = np.full((4, 1, 3), -8.0, np.float32)
    for t, c in enumerate(path):
        lp[t, 0, c] = -0.01
    dec = BeamSearchCTCDecoder(beam_width=4, blank=0, labels=labels)
    texts, scores = dec.decode(lp)
    assert texts == ["ab"]
    beams = dec.decode_beams(lp)[0]
    assert beams[0][0] == "ab" and len(beams) <= 4
    assert all(beams[i][1] >= beams[i + 1][1] for i in range(len(beams) - 1))


def test_beam_max_symbols_cap(rng):
    B, T, V = 1, 30, 4
    lp = log_softmax_np(rng.standard_normal((T, B, V))).astype(np.float32)
    tokens, lengths, scores = beam_search_decode(
        lp, np.array([T], np.int32), beam_width=2, max_symbols=5
    )
    assert np.asarray(lengths).max() <= 5
    assert np.asarray(tokens).shape[-1] == 5


def test_greedy_timestamps(rng):
    from end2end_tpu.ops.greedy import greedy_decode_with_timestamps

    # path: _ a a _ b b c: 'a' fires at frame 1, 'b' at 4, 'c' at 6
    path = [0, 1, 1, 0, 2, 2, 3]
    lp = np.full((7, 1, 4), -9.0, np.float32)
    for t, c in enumerate(path):
        lp[t, 0, c] = -0.01
    toks, lens, scores, times = greedy_decode_with_timestamps(lp, np.array([7]))
    assert np.asarray(toks)[0, :3].tolist() == [1, 2, 3]
    assert np.asarray(times)[0, :3].tolist() == [1, 4, 6]
    assert int(lens[0]) == 3
    # consistency with plain greedy on random input
    B, T, V = 4, 30, 9
    lp = np.asarray(
        rng.standard_normal((T, B, V)).astype(np.float32)
    )
    il = rng.integers(10, T + 1, B).astype(np.int32)
    t1, l1, s1 = greedy_decode(lp, il)
    t2, l2, s2, tt = greedy_decode_with_timestamps(lp, il)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # timestamps strictly increasing over emitted tokens
    for b in range(B):
        ts = np.asarray(tt)[b, : int(l2[b])]
        assert np.all(np.diff(ts) > 0) and np.all(ts >= 0) and np.all(ts < il[b])


def test_word_spans_from_beam_timestamps(rng):
    from end2end_tpu import beam_search_decode
    from end2end_tpu.utils.text import asr_alphabet, word_spans

    alphabet = asr_alphabet()
    ids = alphabet.encode("hi me")  # h i ' ' m e
    path = []
    for c in ids:
        path += [c, 0]  # one frame per char + blank
    V = len(alphabet)
    lp = np.full((len(path), 1, V), -12.0, np.float32)
    for t, c in enumerate(path):
        lp[t, 0, c] = -0.01
    lp = lp - np.log(np.sum(np.exp(lp), -1, keepdims=True))
    toks, lens, _, times = beam_search_decode(lp, beam_width=2,
                                              return_timestamps=True)
    n = int(lens[0, 0])
    space_id = alphabet.encode(" ")[0]
    spans = word_spans(np.asarray(toks)[0, 0, :n],
                       np.asarray(times)[0, 0, :n], space_id, alphabet)
    # chars emit at frames 0,2,4,6,8 -> "hi"=[0,2], "me"=[6,8]
    assert spans == [("hi", 0, 2), ("me", 6, 8)], spans


def test_word_spans_boundary_regime():
    """BPE prefix-boundary word segmentation (boundary tokens START a new
    word and belong to it) — the word-span analog of the word LMs'
    boundary_ids regime."""
    from end2end_tpu.utils.text import word_spans

    # ids 5 and 7 are word starters ('▁x'-style); others continue a word
    ids = [5, 2, 3, 7, 1, 5, 4]
    times = [0, 3, 4, 9, 11, 20, 22]
    spans = word_spans(ids, times, boundary_ids=[5, 7])
    assert spans == [([5, 2, 3], 0, 4), ([7, 1], 9, 11), ([5, 4], 20, 22)], (
        spans)
    # a leading non-boundary fragment still forms a (partial) word
    spans = word_spans([2, 5, 1], [1, 2, 3], boundary_ids=[5])
    assert spans == [([2], 1, 1), ([5, 1], 2, 3)], spans
    # exactly one regime must be chosen
    import pytest

    with pytest.raises(ValueError):
        word_spans(ids, times)
    with pytest.raises(ValueError):
        word_spans(ids, times, space_id=1, boundary_ids=[5])


def test_from_logits_and_batch_first(rng):
    """The reference's decoder conveniences: raw-logit inputs (normalized
    internally) and batch-first activations give identical decodes to the
    manually normalized time-major call (SURVEY.md §3.2 P1/P3)."""
    B, T, V = 4, 40, 17
    logits = (rng.standard_normal((T, B, V)) * 2).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    lp = log_softmax_np(logits).astype(np.float32)

    want = greedy_decode(lp, il)
    got = greedy_decode(logits, il, from_logits=True)
    got_bf = greedy_decode(np.swapaxes(logits, 0, 1), il, from_logits=True,
                           batch_first=True)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(want, got_bf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    w_toks, w_lens, w_scores = beam_search_decode(lp, il, beam_width=4)
    g_toks, g_lens, g_scores = beam_search_decode(
        np.swapaxes(logits, 0, 1), il, beam_width=4, from_logits=True,
        batch_first=True)
    np.testing.assert_array_equal(np.asarray(w_toks), np.asarray(g_toks))
    np.testing.assert_allclose(np.asarray(w_scores), np.asarray(g_scores),
                               rtol=1e-5, atol=1e-5)

    # class wrappers carry the same flags
    texts_w, scores_w = GreedyCTCDecoder().decode(lp, il)
    texts_g, scores_g = GreedyCTCDecoder(
        from_logits=True, batch_first=True).decode(
            np.swapaxes(logits, 0, 1), il)
    assert texts_w == texts_g
    np.testing.assert_allclose(scores_w, scores_g, rtol=1e-5)
    b_w = BeamSearchCTCDecoder(beam_width=3).decode(lp, il)
    b_g = BeamSearchCTCDecoder(beam_width=3, from_logits=True,
                               batch_first=True).decode(
                                   np.swapaxes(logits, 0, 1), il)
    # texts identical; scores only allclose — the internal log_softmax of
    # the transposed layout rounds differently in f32 (~1e-6)
    assert b_w[0] == b_g[0]
    np.testing.assert_allclose(b_w[1], b_g[1], rtol=1e-5, atol=1e-5)
