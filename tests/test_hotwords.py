"""HotwordBoostLM (pyctcdecode's hotwords) and CompositeLM.

Oracle: a brute-force NumPy matcher — token j earns `weight` iff some
phrase prefix equals a suffix of the stream ending at j, plus
`complete_bonus` iff a full phrase ends at j.  The device implementation
(suffix-hash lookups over a token window) must match it exactly, via both
the per-token protocol and the vectorized chunk replay.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu import beam_search_decode
from end2end_tpu.ops.lm import CompositeLM, HotwordBoostLM, NGramLM

from .test_lm_chunk import _chunked_replay, _sequential_replay


def _oracle_bonus(phrases, weight, cb, stream):
    prefixes = {p[:l] for p in phrases for l in range(1, len(p) + 1)}
    complete = set(phrases)
    total = 0.0
    for j in range(len(stream)):
        sufs = {tuple(stream[max(0, j + 1 - l): j + 1])
                for l in range(1, j + 2)}
        if sufs & prefixes:
            total += weight
        if sufs & complete:
            total += cb
    return total


PHRASES = [(1, 2, 3), (2, 3, 4), (4,), (1, 1)]


@pytest.mark.parametrize("cb", [0.0, 2.5])
def test_hotword_matches_bruteforce_oracle(rng, cb):
    lm = HotwordBoostLM(PHRASES, weight=1.0, complete_bonus=cb)
    streams = [[], [4], [1, 2, 3, 4], [1, 1, 1], [0, 5, 0],
               [1, 2, 3, 4, 1, 2]]  # incl. suffix re-entry 123->234
    for _ in range(10):
        streams.append([int(x) for x in
                        rng.integers(0, 6, int(rng.integers(1, 20)))])
    for s in streams:
        want = _oracle_bonus(PHRASES, 1.0, cb, s)
        t_seq, st_seq = _sequential_replay(lm, s)
        t_chk, st_chk = _chunked_replay(lm, s, 5, len(s) // 5 + 2)
        np.testing.assert_allclose(t_seq, want, atol=1e-6, err_msg=str(s))
        np.testing.assert_allclose(t_chk, want, atol=1e-6, err_msg=str(s))
        np.testing.assert_array_equal(np.asarray(st_seq), np.asarray(st_chk))


def test_hotword_suffix_reentry():
    """'1 2 3 4' must re-enter phrase (2,3,4) at the 4 — every token of
    the stream continues SOME phrase prefix."""
    lm = HotwordBoostLM([(1, 2, 3), (2, 3, 4)], weight=1.0)
    t, _ = _sequential_replay(lm, [1, 2, 3, 4])
    np.testing.assert_allclose(t, 4.0, atol=1e-6)


def test_hotword_steers_beam_search(rng):
    """An acoustically ambiguous frame flips toward the hotword."""
    T, V = 6, 5
    lp = np.full((T, 1, V), -8.0, np.float32)
    # clear '1 2' then an ambiguous frame: 3 barely ahead of 4
    for t, tok in enumerate([1, 2]):
        lp[t, 0, :] = -8.0
        lp[t, 0, tok] = -0.01
    lp[2, 0, 3] = -0.60
    lp[2, 0, 4] = -0.70
    lp[3:, 0, 0] = -0.01
    lp = jnp.asarray(lp - np.log(np.exp(lp).sum(-1, keepdims=True)))
    il = jnp.asarray([T], jnp.int32)
    plain, _, _ = beam_search_decode(lp, il, beam_width=4)
    assert np.asarray(plain)[0, 0, :3].tolist()[:3] == [1, 2, 3]
    lm = HotwordBoostLM([(1, 2, 4)], weight=1.0)
    boosted, ln, _ = beam_search_decode(lp, il, beam_width=4, lm=lm,
                                        lm_alpha=0.5)
    assert np.asarray(boosted)[0, 0, : int(ln[0, 0])].tolist() == [1, 2, 4]


def test_composite_is_weighted_sum(rng):
    v = 6
    lm_a = NGramLM(np.log(np.maximum(rng.random((v, v)), 1e-3)).astype(
        np.float32), eos_logp=rng.standard_normal(v).astype(np.float32))
    lm_b = HotwordBoostLM(PHRASES, weight=1.0, complete_bonus=1.0)
    comp = CompositeLM([lm_a, lm_b], weights=[0.7, 1.3])
    for _ in range(6):
        s = [int(x) for x in rng.integers(0, v, int(rng.integers(0, 15)))]
        ta, sa = _sequential_replay(lm_a, s)
        tb, sb = _sequential_replay(lm_b, s)
        tc, sc = _sequential_replay(comp, s)
        np.testing.assert_allclose(tc, 0.7 * ta + 1.3 * tb, atol=1e-5)
        fa = 0.7 * np.asarray(lm_a.final(sa)) + 1.3 * np.asarray(
            lm_b.final(sb))
        np.testing.assert_allclose(np.asarray(comp.final(sc)), fa,
                                   atol=1e-6)
        tck, sck = _chunked_replay(comp, s, 4, len(s) // 4 + 2)
        np.testing.assert_allclose(tck, tc, atol=1e-5)
        for x, y in zip(sck, sc):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_composite_single_member_equals_bare_lm(rng):
    """decode(lm=CompositeLM([lm])) == decode(lm=lm) — same beams/scores."""
    from .test_lm_chunk import _TRIGRAM_ARPA  # noqa: F401  (doc pointer)

    v = 5
    lm = NGramLM(np.log(np.maximum(rng.random((v, v)), 1e-3)).astype(
        np.float32), eos_logp=rng.standard_normal(v).astype(np.float32))
    lp = jnp.asarray(np.log(
        rng.dirichlet(np.ones(v), size=(12, 3)).astype(np.float32)))
    il = jnp.asarray([12, 9, 11], jnp.int32)
    # pin both to the scan: on TPU a bare NGramLM routes to the in-kernel
    # fused path while CompositeLM falls back, and the two differ by f32
    # rounding — this test is about the CompositeLM identity, not parity
    t1, l1, s1 = beam_search_decode(lp, il, beam_width=4, lm=lm,
                                    lm_alpha=0.6, lm_beta=0.2,
                                    implementation="xla")
    t2, l2, s2 = beam_search_decode(lp, il, beam_width=4,
                                    lm=CompositeLM([lm]), lm_alpha=0.6,
                                    lm_beta=0.2, implementation="xla")
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_composite_hotword_chunked_equals_rescored(rng):
    """Single-chunk chunked decode with a composite (bigram + hotwords) ==
    no-LM kernel decode + exact post-hoc rescoring — the chunked path's
    exact limit, for the stacked-LM configuration."""
    from end2end_tpu import rescore_nbest
    from end2end_tpu.ops.beam_chunked import beam_search_chunked_lm
    from end2end_tpu.ops.beam_search_pallas import beam_search_pallas

    B, T, V, W = 3, 16, 5, 6
    v = V
    lm = CompositeLM(
        [NGramLM(np.log(np.maximum(rng.random((v, v)), 1e-3)).astype(
            np.float32)),
         HotwordBoostLM([(1, 2), (3,)], weight=1.0, complete_bonus=0.5)],
        weights=[1.0, 0.8])
    lp = jnp.asarray(np.log(
        rng.dirichlet(np.ones(V) * 0.5, size=(T, B)).astype(np.float32)))
    il = jnp.asarray(rng.integers(T // 2, T + 1, B), jnp.int32)
    ct, cl, cs = beam_search_chunked_lm(lp, il, beam_width=W, lm=lm,
                                        lm_alpha=0.7, lm_beta=0.2,
                                        chunk_t=64)
    nt, nl, ns = beam_search_pallas(lp, il, beam_width=W)
    rt, rl, rs = rescore_nbest(nt, nl, ns, lm, lm_alpha=0.7, lm_beta=0.2)

    def sets(tk, ln, sc):
        return [{tuple(np.asarray(tk)[b, w, : int(ln[b, w])].tolist()):
                 float(sc[b, w]) for w in range(W)
                 if np.isfinite(sc[b, w])} for b in range(B)]

    c_sets, r_sets = sets(ct, cl, cs), sets(rt, rl, rs)
    for b in range(B):
        assert set(c_sets[b]) == set(r_sets[b]), b
        for pref in c_sets[b]:
            np.testing.assert_allclose(c_sets[b][pref], r_sets[b][pref],
                                       atol=5e-4, rtol=2e-4)


def test_hotword_validation():
    with pytest.raises(ValueError):
        HotwordBoostLM([])
    with pytest.raises(ValueError):
        HotwordBoostLM([()])
    with pytest.raises(ValueError):
        CompositeLM([])
    with pytest.raises(ValueError):
        CompositeLM([HotwordBoostLM([(1,)])], weights=[1.0, 2.0])
