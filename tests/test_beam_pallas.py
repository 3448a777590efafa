"""Experimental Pallas beam-search kernel vs the XLA scan decoder.

Interpret mode on CPU; the kernel compiles and runs on the real chip
(scripts/bench_beam_pallas.py / diag_beam_kernel.py).  At prune_k >= V the
kernel is EXACT w.r.t. the reference algorithm; with pruning it adds the
documented repeat-prune assumption.
"""

import numpy as np
import pytest

from end2end_tpu import beam_search_decode
from end2end_tpu.ops.beam_search_pallas import beam_search_pallas


def lsm(x):
    return x - np.log(np.sum(np.exp(x), -1, keepdims=True))


def _beam_sets(tokens, lens, scores, W):
    out = []
    for b in range(tokens.shape[0]):
        out.append({
            tuple(np.asarray(tokens)[b, w, : int(lens[b, w])].tolist()):
                float(np.asarray(scores)[b, w])
            for w in range(W)
            if np.isfinite(np.asarray(scores)[b, w])
        })
    return out


@pytest.mark.parametrize("B,T,V,W", [(3, 12, 6, 4), (2, 15, 8, 8)])
def test_pallas_beam_exact_full_vocab(rng, B, T, V, W):
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    p = _beam_sets(*beam_search_pallas(lp, il, beam_width=W), W)
    x = _beam_sets(*beam_search_decode(lp, il, beam_width=W), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), (b, set(p[b]) ^ set(x[b]))
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=5e-4, rtol=2e-4)


def test_pallas_beam_repeats_and_cap(rng):
    path = [1, 1, 0, 1, 1, 2, 2, 0, 2]
    lp = np.full((9, 1, 4), -12.0, np.float32)
    for t, c in enumerate(path):
        lp[t, 0, c] = -0.01
    lp = lsm(lp.astype(np.float64)).astype(np.float32)
    pt, pl_, ps = beam_search_pallas(lp, beam_width=4)
    xt, xl, xs = beam_search_decode(lp, beam_width=4)
    assert pt[0, 0, : pl_[0, 0]].tolist() == np.asarray(xt)[0, 0, : int(xl[0, 0])].tolist()
    pt, pl_, ps = beam_search_pallas(lp, beam_width=4, max_symbols=2)
    assert pl_.max() <= 2


def test_pallas_beam_pruned_top1_on_peaked(rng):
    B, T, V, W, K = 4, 30, 20, 8, 8
    lp = np.full((T, B, V), np.log(0.003 / (V - 1)), np.float32)
    ids = np.where(rng.random((T, B)) < 0.5, 0, rng.integers(1, V, (T, B)))
    for t in range(T):
        lp[t, np.arange(B), ids[t]] = np.log(0.997)
    lp = lsm(lp.astype(np.float64)).astype(np.float32)
    il = np.array([30, 25, 20, 30], np.int32)
    pt, pl_, ps = beam_search_pallas(lp, il, beam_width=W, prune_k=K)
    xt, xl, xs = beam_search_decode(lp, il, beam_width=W, prune_k=K)
    for b in range(B):
        assert pt[b, 0, : pl_[b, 0]].tolist() == np.asarray(xt)[b, 0, : int(xl[b, 0])].tolist()


def test_pallas_beam_constraint_errors(rng):
    lp = lsm(rng.standard_normal((5, 1, 4))).astype(np.float32)
    with pytest.raises(ValueError, match="beam_width"):
        beam_search_pallas(lp, beam_width=64)


def test_pallas_beam_multi_batch_tile(rng):
    # n > 128 exercises the second grid dimension (two batch tiles)
    B, T, V, W = 130, 6, 5, 4
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(2, T + 1, B).astype(np.int32)
    p = _beam_sets(*beam_search_pallas(lp, il, beam_width=W), W)
    x = _beam_sets(*beam_search_decode(lp, il, beam_width=W), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), b
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=5e-4, rtol=2e-4)


def test_pallas_beam_width16(rng):
    # W=16 exercises the two-vreg sublane dimension AND W > finite
    # candidates in the early frames (the zombie-mass regression).
    B, T, V, W = 2, 10, 6, 16
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    p = _beam_sets(*beam_search_pallas(lp, beam_width=W), W)
    x = _beam_sets(*beam_search_decode(lp, beam_width=W), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), b
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=5e-4,
                                       rtol=2e-4)


def test_beam_no_zombie_mass_vs_numpy_oracle(rng):
    # Regression: when fewer finite candidates than W exist (tiny V, early
    # frames), the repeated-argmax selection used to duplicate a live beam's
    # mass into the dead slots ("zombies"), which later re-merged and
    # multiply-counted probability.  Both implementations must match the
    # dict-based float64 NumPy oracle, which cannot have zombies.
    from end2end_tpu.utils.reference_impl import beam_search_decode_ref

    B, T, V, W = 3, 7, 3, 8
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.array([7, 5, 6], np.int32)
    ref = beam_search_decode_ref(np.asarray(lp, np.float64), il, beam_width=W)
    for impl in ("pallas", "xla"):
        got = _beam_sets(
            *beam_search_decode(lp, il, beam_width=W, implementation=impl), W
        )
        for b in range(B):
            want = dict(ref[b])
            assert set(got[b]) == set(want), (impl, b)
            for pref, sc in got[b].items():
                np.testing.assert_allclose(sc, want[pref], atol=5e-4,
                                           rtol=2e-4, err_msg=f"{impl} {b}")


def test_beam_decode_routes_to_pallas(rng):
    # implementation='pallas' forces the kernel (interpret mode on CPU) and
    # must agree with the XLA scan through the SAME public entry point
    B, T, V, W = 2, 12, 6, 4
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    p = _beam_sets(*beam_search_decode(lp, beam_width=W, implementation="pallas"), W)
    x = _beam_sets(*beam_search_decode(lp, beam_width=W, implementation="xla"), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), b


def test_beam_decode_pallas_rejects_unsupported_lm(rng):
    from end2end_tpu.ops.lm import HashedNGramLM, NGramLM

    lp = lsm(rng.standard_normal((5, 1, 4))).astype(np.float32)
    # hashed (arbitrary-order) LMs are not in-kernel fusable
    hlm = HashedNGramLM(2, {1: [((0,), -1.0, 0.0)]}, vocab_size=4)
    with pytest.raises(ValueError, match="LM"):
        beam_search_decode(lp, beam_width=4, lm=hlm, implementation="pallas")
    # dense bigram with mismatched vocab
    lm = NGramLM(np.zeros((3, 3), np.float32))
    with pytest.raises(ValueError, match="vocab"):
        beam_search_decode(lp, beam_width=4, lm=lm, implementation="pallas")
    # dense bigram too large for the in-kernel select ladder
    big = NGramLM(np.zeros((100, 100), np.float32))
    lp_big = lsm(rng.standard_normal((5, 1, 100))).astype(np.float32)
    with pytest.raises(ValueError, match="context rows"):
        beam_search_decode(lp_big, beam_width=4, lm=big,
                           implementation="pallas")


def _rand_bigram_lm(rng, v, eos=True):
    from end2end_tpu.ops.lm import NGramLM, bigram_from_counts

    bigram = bigram_from_counts(rng.integers(0, 20, (v, v)))
    start = lsm(rng.standard_normal((1, v)))[0].astype(np.float32)
    eos_lp = (rng.standard_normal(v).astype(np.float32) * 0.5) if eos else None
    return NGramLM(bigram, start_logp=start, eos_logp=eos_lp)


@pytest.mark.parametrize("B,T,V,W,alpha,beta", [
    (3, 14, 6, 4, 0.6, 0.4),
    (2, 18, 10, 8, 1.2, -0.3),
])
def test_pallas_beam_lm_fusion_matches_xla(rng, B, T, V, W, alpha, beta):
    # In-kernel dense-bigram LM fusion must reproduce the XLA scan's shallow
    # fusion (same candidate ranking, merging, and </s> bonus).
    lm = _rand_bigram_lm(rng, V)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    p = _beam_sets(*beam_search_decode(
        lp, il, beam_width=W, lm=lm, lm_alpha=alpha, lm_beta=beta,
        implementation="pallas"), W)
    x = _beam_sets(*beam_search_decode(
        lp, il, beam_width=W, lm=lm, lm_alpha=alpha, lm_beta=beta,
        implementation="xla"), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), (b, set(p[b]) ^ set(x[b]))
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=5e-4,
                                       rtol=2e-4)


def test_pallas_beam_lm_fusion_multitile(rng):
    # a second batch tile (n > 128) with LM fusion on; full vocab -> exact
    B, T, V, W = 130, 8, 8, 4
    lm = _rand_bigram_lm(rng, V, eos=False)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(3, T + 1, B).astype(np.int32)
    p = _beam_sets(*beam_search_decode(
        lp, il, beam_width=W, lm=lm, lm_alpha=0.8, lm_beta=0.2,
        implementation="pallas"), W)
    x = _beam_sets(*beam_search_decode(
        lp, il, beam_width=W, lm=lm, lm_alpha=0.8, lm_beta=0.2,
        implementation="xla"), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), b
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=5e-4,
                                       rtol=2e-4)


def test_pallas_beam_lm_fusion_pruned_top1_on_peaked(rng):
    # prune_k < V with LM fusion: top-1 agreement on peaked lattices (the
    # repeat-prune divergence documented in beam_search_pallas.py can move
    # tail beams on diffuse random lattices, same as the no-LM pruned test)
    B, T, V, W, K = 4, 24, 16, 8, 8
    lm = _rand_bigram_lm(rng, V)
    lp = np.full((T, B, V), np.log(0.003 / (V - 1)), np.float32)
    ids = np.where(rng.random((T, B)) < 0.5, 0, rng.integers(1, V, (T, B)))
    for t in range(T):
        lp[t, np.arange(B), ids[t]] = np.log(0.997)
    lp = lsm(lp.astype(np.float64)).astype(np.float32)
    il = np.array([24, 20, 16, 24], np.int32)
    pt, pl_, _ = beam_search_decode(lp, il, beam_width=W, prune_k=K, lm=lm,
                                    lm_alpha=0.5, lm_beta=0.1,
                                    implementation="pallas")
    xt, xl, _ = beam_search_decode(lp, il, beam_width=W, prune_k=K, lm=lm,
                                   lm_alpha=0.5, lm_beta=0.1,
                                   implementation="xla")
    for b in range(B):
        assert (np.asarray(pt)[b, 0, : int(pl_[b, 0])].tolist()
                == np.asarray(xt)[b, 0, : int(xl[b, 0])].tolist())


def test_pallas_beam_lm_changes_the_winner(rng):
    # sanity: the fused LM actually influences decoding — an LM that
    # strongly prefers token 2 after token 1 flips an acoustically
    # ambiguous second emission
    V = 4
    from end2end_tpu.ops.lm import NGramLM

    bigram = np.full((V, V), -8.0, np.float32)
    bigram[1, 2] = -0.05  # after "1", LM wants "2"
    lm = NGramLM(bigram)
    lp = np.full((4, 1, V), -9.0, np.float32)
    lp[0, 0, 1] = -0.01   # clear "1"
    lp[1, 0, 0] = -0.7    # frame 1: blank
    lp[2, 0, 2] = -0.69   # frame 2: "2" vs "3" nearly tied, "3" slightly
    lp[2, 0, 3] = -0.68   # ahead acoustically
    lp[3, 0, 0] = -0.01
    lp = lsm(lp.astype(np.float64)).astype(np.float32)
    no_lm, _, _ = beam_search_decode(lp, beam_width=4,
                                     implementation="pallas")
    with_lm, wl, _ = beam_search_decode(
        lp, beam_width=4, lm=lm, lm_alpha=1.0, implementation="pallas")
    assert no_lm[0, 0, 0] == 1 and no_lm[0, 0, 1] == 3
    assert with_lm[0, 0, : wl[0, 0]].tolist() == [1, 2]


def test_beam_saturation_warns(rng):
    from end2end_tpu import BeamSearchCTCDecoder

    # alternating tokens force one emission per frame -> cap saturates
    path = [1, 2, 1, 2, 1, 2]
    lp = np.full((6, 1, 4), -12.0, np.float32)
    for t, c in enumerate(path):
        lp[t, 0, c] = -0.01
    lp = lsm(lp.astype(np.float64)).astype(np.float32)
    dec = BeamSearchCTCDecoder(beam_width=2, max_symbols=3)
    with pytest.warns(UserWarning, match="saturated"):
        dec.decode(lp)


def test_beam_timestamps_match_across_impls_and_greedy(rng):
    from end2end_tpu import greedy_decode_with_timestamps

    # random lattice: pallas and xla must emit identical timestamps
    B, T, V, W = 3, 14, 6, 4
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    pt, pl_, ps, ptm = beam_search_decode(lp, il, beam_width=W,
                                          implementation="pallas",
                                          return_timestamps=True)
    xt, xl, xs, xtm = beam_search_decode(lp, il, beam_width=W,
                                         implementation="xla",
                                         return_timestamps=True)
    pt, pl_, ptm, xt, xl, xtm = map(np.asarray, (pt, pl_, ptm, xt, xl, xtm))
    for b in range(B):
        for w in range(W):
            if pt[b, w, : pl_[b, w]].tolist() == xt[b, w, : xl[b, w]].tolist():
                np.testing.assert_array_equal(
                    ptm[b, w, : pl_[b, w]], xtm[b, w, : xl[b, w]],
                    err_msg=str((b, w)),
                )
    # peaked lattice: beam-1 emission frames == greedy timestamps
    path = [0, 1, 1, 0, 2, 0, 3, 3, 3, 0, 1]
    lpp = np.full((len(path), 1, 5), -12.0, np.float32)
    for t, c in enumerate(path):
        lpp[t, 0, c] = -0.01
    lpp = lsm(lpp.astype(np.float64)).astype(np.float32)
    bt, bl, _, btm = beam_search_decode(lpp, beam_width=1,
                                        implementation="pallas",
                                        return_timestamps=True)
    gt, gl, _, gtm = greedy_decode_with_timestamps(lpp)
    n = int(gl[0])
    assert np.asarray(bt)[0, 0, :n].tolist() == np.asarray(gt)[0, :n].tolist()
    np.testing.assert_array_equal(np.asarray(btm)[0, 0, :n],
                                  np.asarray(gtm)[0, :n])


def test_pallas_beam_width32(rng):
    # W=32 (four-vreg sublane dim; wide accuracy-focused beams): full set
    # parity with the XLA scan — 10x the scan on chip (README table)
    B, T, V, W = 2, 10, 8, 32
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    p = _beam_sets(*beam_search_decode(lp, beam_width=W,
                                       implementation="pallas"), W)
    x = _beam_sets(*beam_search_decode(lp, beam_width=W,
                                       implementation="xla"), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), b
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=5e-4,
                                       rtol=2e-4)


def test_pallas_beam_lm_fusion_large_v_full_prune(rng):
    # V=63 (the top of the in-kernel LM envelope) at prune_k=None: the
    # per-frame LM increment block is ~2 MB, forcing the time-chunk length
    # down to tc=1 — the config that used to allocate >16 MB of scoped VMEM
    # with the old tc >= 8 floor (advisor finding, round 2).  On the real
    # chip this verifies the kernel compiles and fits VMEM; in interpret
    # mode it still exercises the tc=1 chunked grid.
    B, T, V, W = 2, 12, 63, 8
    lm = _rand_bigram_lm(rng, V)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    p = _beam_sets(*beam_search_decode(
        lp, il, beam_width=W, lm=lm, lm_alpha=0.7, lm_beta=0.2,
        implementation="pallas"), W)
    x = _beam_sets(*beam_search_decode(
        lp, il, beam_width=W, lm=lm, lm_alpha=0.7, lm_beta=0.2,
        implementation="xla"), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), (b, set(p[b]) ^ set(x[b]))
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=5e-4,
                                       rtol=2e-4)


def test_pallas_beam_lm_fusion_width32(rng):
    # round-3: the W <= 16 in-kernel LM cap is lifted — wide beams run the
    # context select ladder as a fori_loop (constant Mosaic code size).
    # Full-vocab prune -> exact: full beam-set parity with the XLA scan.
    B, T, V, W = 2, 10, 6, 32
    lm = _rand_bigram_lm(rng, V)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    p = _beam_sets(*beam_search_decode(
        lp, beam_width=W, lm=lm, lm_alpha=0.7, lm_beta=0.2,
        implementation="pallas"), W)
    x = _beam_sets(*beam_search_decode(
        lp, beam_width=W, lm=lm, lm_alpha=0.7, lm_beta=0.2,
        implementation="xla"), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), b
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=5e-4,
                                       rtol=2e-4)


@pytest.mark.parametrize("thresh", [-2.0, -0.7])
def test_token_min_logp_pallas_matches_xla(rng, thresh):
    """token_min_logp masks candidates identically on both paths (incl.
    the stay/repeat term), so kernel and scan must agree exactly."""
    B, T, V, W = 3, 14, 6, 4
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    p = _beam_sets(*beam_search_pallas(lp, il, beam_width=W,
                                       token_min_logp=thresh), W)
    x = _beam_sets(*beam_search_decode(lp, il, beam_width=W,
                                       implementation="xla",
                                       token_min_logp=thresh), W)
    for b in range(B):
        assert set(p[b]) == set(x[b]), (b, set(p[b]) ^ set(x[b]))
        for pref in p[b]:
            np.testing.assert_allclose(p[b][pref], x[b][pref], atol=5e-4,
                                       rtol=2e-4)


def test_token_min_logp_semantics(rng):
    """Below-threshold tokens never decode (except each frame's best);
    an ineffective threshold changes nothing."""
    B, T, V, W = 2, 16, 7, 4
    lp = lsm(rng.standard_normal((T, B, V)) * 2.0).astype(np.float32)
    il = np.full(B, T, np.int32)
    base = beam_search_decode(lp, il, beam_width=W, implementation="xla")
    loose = beam_search_decode(lp, il, beam_width=W, implementation="xla",
                               token_min_logp=-1e9)
    for a, b in zip(base, loose):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # impossible-high threshold: only frame argmaxes remain as candidates
    tt, tl, _ = beam_search_decode(lp, il, beam_width=W,
                                   implementation="xla",
                                   token_min_logp=0.0)
    argmaxes = {(b, int(c)) for b in range(B) for c in np.argmax(lp[:, b], -1)}
    for b in range(B):
        for w in range(W):
            for c in np.asarray(tt)[b, w, : int(tl[b, w])]:
                assert (b, int(c)) in argmaxes


def test_token_min_logp_bans_below_threshold_repeat(rng):
    """A frame where the last token's prob is under the threshold (and not
    the frame's best) must not extend via the repeat/stay path either —
    pyctcdecode semantics, same on both implementations."""
    V = 4
    lp = np.full((3, 1, V), -9.0, np.float32)
    lp[0, 0, 1] = -0.01          # clear '1'
    lp[1, 0, 2] = -0.1           # best is '2'; '1' repeat is weak
    lp[1, 0, 1] = -3.0
    lp[2, 0, 0] = -0.01          # blank
    lp = lsm(lp.astype(np.float64)).astype(np.float32)
    for impl in ("xla", "pallas"):
        fn = (beam_search_pallas if impl == "pallas"
              else lambda *a, **k: beam_search_decode(
                  *a, implementation="xla", **k))
        tk, ln, sc = fn(lp, beam_width=4, token_min_logp=-2.0)
        sets = _beam_sets(tk, ln, sc, 4)[0]
        # '1 1' requires the banned weak repeat of '1' at frame 1
        assert (1, 1) not in sets, impl
        assert (1,) in sets or (1, 2) in sets, impl
