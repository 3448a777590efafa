"""Streaming decoders (ops/streaming_decode.py) vs one-shot decoding.

Both decoders are left-to-right scans, so chunked streaming must reproduce
the one-shot result EXACTLY — the chunk boundary only splits the scan.
"""

import numpy as np

from end2end_tpu import (
    StreamingBeamDecoder,
    StreamingGreedyDecoder,
    beam_search_decode,
    greedy_decode,
)


def lsm(x):
    return x - np.log(np.sum(np.exp(x), -1, keepdims=True))


def _chunk_lens(il, lo, hi):
    return np.clip(il - lo, 0, hi - lo).astype(np.int32)


def _stream(dec, lp, il, splits):
    n = lp.shape[1]
    state = dec.init(n)
    lo = 0
    for hi in splits:
        state = dec.step(state, lp[lo:hi], _chunk_lens(il, lo, hi))
        lo = hi
    return state


def test_streaming_greedy_equals_oneshot(rng):
    T, B, V = 20, 5, 7
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    want_t, want_l, want_s = [np.asarray(a) for a in greedy_decode(lp, il)]

    dec = StreamingGreedyDecoder(max_symbols=T)
    state = _stream(dec, lp, il, [7, 13, 20])
    got_t, got_l, got_s = [np.asarray(a) for a in dec.finish(state)]
    np.testing.assert_array_equal(got_l, want_l)
    np.testing.assert_allclose(got_s, want_s, atol=1e-5)
    for b in range(B):
        np.testing.assert_array_equal(
            got_t[b, : got_l[b]], want_t[b, : want_l[b]]
        )


def test_streaming_greedy_boundary_repeat_collapse(rng):
    # a token run crossing the chunk boundary must still collapse to one
    path = [1, 1, 0, 2, 2, 2, 2, 0, 2, 3]
    V = 5
    lp = np.full((len(path), 1, V), -12.0, np.float32)
    for t, c in enumerate(path):
        lp[t, 0, c] = -0.01
    lp = lsm(lp.astype(np.float64)).astype(np.float32)
    il = np.array([len(path)], np.int32)
    want_t, want_l, _ = [np.asarray(a) for a in greedy_decode(lp, il)]
    assert want_t[0, : want_l[0]].tolist() == [1, 2, 2, 3]

    dec = StreamingGreedyDecoder(max_symbols=16)
    # split mid-run of the 2s (after frame 5)
    state = _stream(dec, lp, il, [5, 10])
    got_t, got_l, _ = [np.asarray(a) for a in dec.finish(state)]
    assert got_t[0, : got_l[0]].tolist() == [1, 2, 2, 3]


def _beam_eq(got, want, W):
    gt, gl, gs = [np.asarray(a) for a in got]
    wt, wl, ws = [np.asarray(a) for a in want]
    np.testing.assert_array_equal(gl, wl)
    np.testing.assert_allclose(gs, ws, atol=1e-5, rtol=1e-6)
    for b in range(gt.shape[0]):
        for w in range(W):
            if np.isfinite(ws[b, w]):
                np.testing.assert_array_equal(
                    gt[b, w, : gl[b, w]], wt[b, w, : wl[b, w]]
                )


def test_streaming_beam_equals_oneshot(rng):
    T, B, V, W = 18, 4, 6, 8
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    want = beam_search_decode(lp, il, beam_width=W, max_symbols=16,
                              implementation="xla")
    dec = StreamingBeamDecoder(beam_width=W, max_symbols=16)
    state = _stream(dec, lp, il, [5, 11, 18])
    _beam_eq(dec.finish(state), want, W)


def test_streaming_beam_pruned_equals_oneshot(rng):
    T, B, V, W, K = 15, 3, 12, 4, 6
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.full(B, T, np.int32)
    want = beam_search_decode(lp, il, beam_width=W, prune_k=K,
                              max_symbols=16, implementation="xla")
    dec = StreamingBeamDecoder(beam_width=W, prune_k=K, max_symbols=16)
    state = _stream(dec, lp, il, [4, 8, 15])
    _beam_eq(dec.finish(state), want, W)


def test_streaming_beam_with_hashed_lm(rng):
    from end2end_tpu.ops.lm import HashedNGramLM

    V, W = 4, 4
    grams = {
        1: [((t,), -1.5 - 0.1 * t, -0.4) for t in range(V)]
           + [((V,), -0.1, -0.2), ((V + 1,), -2.0, 0.0)],
        2: [((1, 2), -0.3, -0.5), ((V, 1), -0.5, -0.3)],
        3: [((1, 2, 3), -0.2, 0.0)],
        "unk": -9.0,
    }
    lm = HashedNGramLM(3, grams, vocab_size=V)
    T, B = 12, 3
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.array([12, 9, 11], np.int32)
    kw = dict(beam_width=W, lm=lm, lm_alpha=0.8, lm_beta=0.2)
    want = beam_search_decode(lp, il, max_symbols=16,
                              implementation="xla", **kw)
    dec = StreamingBeamDecoder(max_symbols=16, **kw)
    state = _stream(dec, lp, il, [4, 9, 12])
    _beam_eq(dec.finish(state), want, W)


def test_streaming_beam_with_composite_hotword_lm(rng):
    """Streaming == one-shot with a stacked LM (bigram + hotwords +
    prefix-boundary word LM) — the composite's tuple state must ride the
    stream carry like any other protocol state."""
    from end2end_tpu.ops.lm import (
        CompositeLM, HotwordBoostLM, NGramLM, WordNGramLM,
        bigram_from_counts,
    )

    V, W = 5, 4
    wv_spell = [(1, 2), (3,), (1, 4)]
    word = WordNGramLM(
        wv_spell,
        np.log(np.maximum(rng.random((3, 3)).astype(np.float32), 0.05)),
        rng.standard_normal(3).astype(np.float32), None,
        unigram_logp=rng.standard_normal(3).astype(np.float32),
        unk_logp=-4.0, boundary_ids=[1, 3])
    lm = CompositeLM(
        [NGramLM(bigram_from_counts(rng.integers(0, 20, (V, V)))),
         HotwordBoostLM([(1, 2), (3, 2)], weight=0.6, complete_bonus=0.4),
         word],
        weights=[1.0, 1.0, 0.8])
    T, B = 12, 3
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.array([12, 9, 11], np.int32)
    kw = dict(beam_width=W, lm=lm, lm_alpha=0.7, lm_beta=0.15)
    want = beam_search_decode(lp, il, max_symbols=16,
                              implementation="xla", **kw)
    dec = StreamingBeamDecoder(max_symbols=16, **kw)
    state = _stream(dec, lp, il, [4, 9, 12])
    _beam_eq(dec.finish(state), want, W)


def test_streaming_beam_partial_finish_is_pure(rng):
    T, B, V, W = 12, 2, 5, 4
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.full(B, T, np.int32)
    want = beam_search_decode(lp, il, beam_width=W, max_symbols=16,
                              implementation="xla")
    dec = StreamingBeamDecoder(beam_width=W, max_symbols=16)
    state = dec.init(B)
    state = dec.step(state, lp[:6], _chunk_lens(il, 0, 6))
    # mid-stream peek: must equal a one-shot decode of the first 6 frames,
    # and must not disturb the stream
    part = dec.finish(state)
    want6 = beam_search_decode(lp[:6], np.full(B, 6, np.int32), beam_width=W,
                               max_symbols=16, implementation="xla")
    _beam_eq(part, want6, W)
    state = dec.step(state, lp[6:], _chunk_lens(il, 6, T))
    _beam_eq(dec.finish(state), want, W)


def test_streaming_state_checkpoint_roundtrip(rng, tmp_path):
    # a decoder stream survives a process restart: save the state pytree
    # mid-stream (orbax), restore, continue — identical to uninterrupted
    from end2end_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    T, B, V, W = 14, 2, 5, 4
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.full(B, T, np.int32)
    dec = StreamingBeamDecoder(beam_width=W, max_symbols=16)
    state = dec.init(B)
    state = dec.step(state, lp[:7], _chunk_lens(il, 0, 7))
    save_checkpoint(str(tmp_path / "stream"), state)
    restored = restore_checkpoint(str(tmp_path / "stream"), state)
    state2 = dec.step(restored, lp[7:], _chunk_lens(il, 7, T))
    want = beam_search_decode(lp, il, beam_width=W, max_symbols=16,
                              implementation="xla")
    _beam_eq(dec.finish(state2), want, W)


def test_streaming_beam_timestamps_are_global(rng):
    # emission frames from chunked streaming must be utterance-global and
    # equal the one-shot decode's timestamps
    T, B, V, W = 16, 3, 6, 4
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    wt, wl, ws, wtm = beam_search_decode(
        lp, il, beam_width=W, max_symbols=16, implementation="xla",
        return_timestamps=True)
    dec = StreamingBeamDecoder(beam_width=W, max_symbols=16)
    state = _stream(dec, lp, il, [5, 9, 16])
    gt, gl, gs, gtm = dec.finish(state, return_timestamps=True)
    gt, gl, gtm = map(np.asarray, (gt, gl, gtm))
    wt, wl, wtm = map(np.asarray, (wt, wl, wtm))
    np.testing.assert_array_equal(gl, wl)
    for b in range(B):
        for w in range(W):
            if np.isfinite(np.asarray(ws)[b, w]):
                np.testing.assert_array_equal(gt[b, w, : gl[b, w]],
                                              wt[b, w, : wl[b, w]])
                np.testing.assert_array_equal(gtm[b, w, : gl[b, w]],
                                              wtm[b, w, : wl[b, w]])
