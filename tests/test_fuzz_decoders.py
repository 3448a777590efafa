"""Randomized differential fuzz across the decoder implementations.

Each round draws random shapes/lengths and checks mutual agreement:
  * beam: Pallas kernel == XLA scan == float64 NumPy oracle (full vocab —
    the exact regime — so beam SETS and scores must match),
  * greedy: vectorized == a plain python loop,
  * streaming: a random chunking of the same lattice == one-shot.

Shapes stay tiny so the whole sweep is seconds; the seeds are fixed for
reproducibility (any failure prints the round's config).
"""

import numpy as np
import pytest

from end2end_tpu import (
    StreamingBeamDecoder,
    beam_search_decode,
    greedy_decode,
)
from end2end_tpu.utils.reference_impl import beam_search_decode_ref

ROUNDS = 8


def lsm(x):
    return x - np.log(np.sum(np.exp(x), -1, keepdims=True))


def _sets(tokens, lens, scores, W):
    out = []
    for b in range(tokens.shape[0]):
        out.append({
            tuple(np.asarray(tokens)[b, w, : int(lens[b, w])].tolist()):
                float(np.asarray(scores)[b, w])
            for w in range(W)
            if np.isfinite(np.asarray(scores)[b, w])
        })
    return out


@pytest.mark.parametrize("seed", range(ROUNDS))
def test_fuzz_beam_three_way(seed):
    rng = np.random.default_rng(1000 + seed)
    B = int(rng.integers(1, 4))
    T = int(rng.integers(3, 14))
    V = int(rng.integers(2, 7))
    W = int(rng.integers(2, 9))
    scale = float(rng.uniform(0.5, 2.5))
    cfg = dict(B=B, T=T, V=V, W=W, scale=scale)
    lp = lsm(rng.standard_normal((T, B, V)) * scale).astype(np.float32)
    il = rng.integers(1, T + 1, B).astype(np.int32)

    p = _sets(*beam_search_decode(lp, il, beam_width=W,
                                  implementation="pallas"), W)
    x = _sets(*beam_search_decode(lp, il, beam_width=W,
                                  implementation="xla"), W)
    ref = beam_search_decode_ref(np.asarray(lp, np.float64), il,
                                 beam_width=W)
    for b in range(B):
        # the dict oracle keeps alignment-impossible prefixes at -inf;
        # the device decoders mark those beams dead — filter alike
        want = {k: v for k, v in ref[b] if np.isfinite(v)}
        assert set(p[b]) == set(x[b]) == set(want), (cfg, b)
        for pref in want:
            np.testing.assert_allclose(p[b][pref], want[pref], atol=1e-3,
                                       rtol=1e-3, err_msg=str((cfg, b)))
            np.testing.assert_allclose(x[b][pref], want[pref], atol=1e-3,
                                       rtol=1e-3, err_msg=str((cfg, b)))


@pytest.mark.parametrize("seed", range(ROUNDS))
def test_fuzz_greedy_vs_python_loop(seed):
    rng = np.random.default_rng(2000 + seed)
    B = int(rng.integers(1, 5))
    T = int(rng.integers(1, 20))
    V = int(rng.integers(2, 9))
    blank = int(rng.integers(0, V))
    lp = lsm(rng.standard_normal((T, B, V)) * 2).astype(np.float32)
    il = rng.integers(0, T + 1, B).astype(np.int32)
    toks, lens, scores = [np.asarray(a) for a in
                          greedy_decode(lp, il, blank=blank)]
    for b in range(B):
        out, prev, sc = [], -1, 0.0
        for t in range(il[b]):
            c = int(np.argmax(lp[t, b]))
            sc += float(lp[t, b, c])
            if c != blank and c != prev:
                out.append(c)
            prev = c
        assert toks[b, : lens[b]].tolist() == out, (seed, b)
        np.testing.assert_allclose(scores[b], sc, atol=1e-4)


@pytest.mark.parametrize("seed", range(ROUNDS))
def test_fuzz_streaming_random_chunking(seed):
    rng = np.random.default_rng(3000 + seed)
    B = int(rng.integers(1, 4))
    T = int(rng.integers(4, 16))
    V = int(rng.integers(3, 7))
    W = int(rng.integers(2, 7))
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(1, T + 1, B).astype(np.int32)
    # random chunk boundaries (possibly including empty chunks)
    n_cuts = int(rng.integers(1, 4))
    cuts = sorted(set(rng.integers(1, T, n_cuts).tolist()) | {T})
    want = [np.asarray(a) for a in beam_search_decode(
        lp, il, beam_width=W, max_symbols=16, implementation="xla")]
    dec = StreamingBeamDecoder(beam_width=W, max_symbols=16)
    state = dec.init(B)
    lo = 0
    for hi in cuts:
        cl = np.clip(il - lo, 0, hi - lo).astype(np.int32)
        state = dec.step(state, lp[lo:hi], cl)
        lo = hi
    got = [np.asarray(a) for a in dec.finish(state)]
    np.testing.assert_array_equal(got[1], want[1], err_msg=str((seed, cuts)))
    np.testing.assert_allclose(got[2], want[2], atol=1e-5)
    for b in range(B):
        for w in range(W):
            if np.isfinite(want[2][b, w]):
                np.testing.assert_array_equal(
                    got[0][b, w, : got[1][b, w]],
                    want[0][b, w, : want[1][b, w]],
                )


@pytest.mark.parametrize("seed", range(ROUNDS))
def test_fuzz_beam_lm_pallas_vs_xla(seed):
    # randomized in-kernel LM fusion (full vocab -> exact) vs the scan
    from end2end_tpu.ops.lm import NGramLM

    rng = np.random.default_rng(4000 + seed)
    B = int(rng.integers(1, 4))
    T = int(rng.integers(3, 12))
    V = int(rng.integers(3, 8))
    W = int(rng.integers(2, 8))
    alpha = float(rng.uniform(0.1, 2.0))
    beta = float(rng.uniform(-0.5, 0.8))
    lm = NGramLM(
        lsm(rng.standard_normal((V, V)) * 2).astype(np.float32),
        start_logp=rng.standard_normal(V).astype(np.float32),
        eos_logp=rng.standard_normal(V).astype(np.float32),
    )
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(1, T + 1, B).astype(np.int32)
    kw = dict(beam_width=W, lm=lm, lm_alpha=alpha, lm_beta=beta)
    p = _sets(*beam_search_decode(lp, il, implementation="pallas", **kw), W)
    x = _sets(*beam_search_decode(lp, il, implementation="xla", **kw), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), (seed, b, set(p[b]) ^ set(x[b]))
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=1e-3,
                                       rtol=1e-3, err_msg=str((seed, b)))
