"""Tests for ops.confidence — entropy-family confidence estimation."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu.ops.confidence import (
    aggregate_confidence,
    frame_confidence,
    greedy_decode_with_confidence,
    token_confidence,
    word_confidences,
)

METHODS = ["max_prob", "shannon", "tsallis", "renyi"]


def _lp(p):
    p = np.asarray(p, np.float64)
    return jnp.asarray(np.log(p / p.sum(-1, keepdims=True)), jnp.float32)


@pytest.mark.parametrize("method", METHODS)
def test_uniform_and_onehot_extremes(method):
    v = 8
    uni = _lp(np.ones((1, v)))
    hot = _lp(np.full((1, v), 1e-12) + np.eye(v)[:1] * 1.0)
    c_uni = float(frame_confidence(uni, method=method)[0])
    c_hot = float(frame_confidence(hot, method=method)[0])
    lo = 1.0 / v if method == "max_prob" else 0.0
    assert abs(c_uni - lo) < 1e-5
    assert c_hot > 0.999
    assert 0.0 <= c_uni <= 1.0 and 0.0 <= c_hot <= 1.0


def test_shannon_hand_computed():
    p = np.array([[0.9, 0.1]])
    h = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1))
    want = 1.0 - h / math.log(2.0)
    got = float(frame_confidence(_lp(p), method="shannon")[0])
    assert abs(got - want) < 1e-5


def test_tsallis_renyi_hand_computed():
    p = np.array([[0.7, 0.2, 0.1]])
    a = 0.5
    spa = (p ** a).sum()
    v = 3
    ts = (spa - 1.0) / (1.0 - a)
    ts_max = (v ** (1.0 - a) - 1.0) / (1.0 - a)
    want_ts = 1.0 - ts / ts_max
    got_ts = float(frame_confidence(_lp(p), method="tsallis", alpha=a)[0])
    assert abs(got_ts - want_ts) < 1e-5
    want_ry = 1.0 - (math.log(spa) / (1.0 - a)) / math.log(v)
    got_ry = float(frame_confidence(_lp(p), method="renyi", alpha=a)[0])
    assert abs(got_ry - want_ry) < 1e-5


@pytest.mark.parametrize("method", METHODS)
def test_sharper_is_more_confident(method):
    v = 10
    rows = np.stack([np.full(v, 1.0),                  # uniform
                     np.r_[3.0, np.ones(v - 1)],       # mild peak
                     np.r_[30.0, np.ones(v - 1)],      # strong peak
                     np.r_[1000.0, np.ones(v - 1)]])   # near one-hot
    conf = np.asarray(frame_confidence(_lp(rows), method=method))
    assert np.all(np.diff(conf) > 0)


def test_exclude_blank_conditions_on_emission():
    # blank dominates, but the non-blank mass is ALL on one token: the
    # conditional distribution is peaked even though the full one is not
    p = np.array([[0.5, 0.495, 0.005]])
    full = float(frame_confidence(_lp(p), method="shannon")[0])
    cond = float(frame_confidence(_lp(p), method="shannon",
                                  exclude_blank=True)[0])
    assert cond > 0.9 and full < 0.5  # conditional near-certain, full is not
    with pytest.raises(ValueError, match="exclude_blank"):
        frame_confidence(_lp(np.ones((1, 2))), exclude_blank=True)


def test_token_confidence_gather():
    t, n = 6, 2
    fc = jnp.asarray(np.arange(t * n, dtype=np.float32).reshape(t, n) / 100)
    times = jnp.asarray([[0, 3, 5, 0], [2, 4, 0, 0]], jnp.int32)
    lengths = jnp.asarray([3, 2], jnp.int32)
    tc = np.asarray(token_confidence(fc, times, lengths))
    fcn = np.asarray(fc)
    assert tc[0, 0] == fcn[0, 0] and tc[0, 1] == fcn[3, 0]
    assert tc[0, 2] == fcn[5, 0] and tc[1, 0] == fcn[2, 1]
    assert tc[1, 1] == fcn[4, 1]
    assert tc[0, 3] == 0.0 and tc[1, 2] == 0.0  # masked beyond length


def test_token_confidence_beam_shape():
    t, n, w, s = 5, 2, 3, 4
    rng = np.random.default_rng(0)
    fc = jnp.asarray(rng.random((t, n), dtype=np.float32))
    times = jnp.asarray(rng.integers(0, t, (n, w, s)), jnp.int32)
    lengths = jnp.asarray(rng.integers(0, s + 1, (n, w)), jnp.int32)
    tc = np.asarray(token_confidence(fc, times, lengths))
    assert tc.shape == (n, w, s)
    fcn = np.asarray(fc)
    for b in range(n):
        for k in range(w):
            for j in range(s):
                want = (fcn[int(times[b, k, j]), b]
                        if j < int(lengths[b, k]) else 0.0)
                assert abs(tc[b, k, j] - want) < 1e-7


def test_aggregations():
    tc = jnp.asarray([[0.9, 0.5, 0.8, 0.0], [0.4, 0.0, 0.0, 0.0]])
    lengths = jnp.asarray([3, 1], jnp.int32)
    mean = np.asarray(aggregate_confidence(tc, lengths, "mean"))
    mn = np.asarray(aggregate_confidence(tc, lengths, "min"))
    pr = np.asarray(aggregate_confidence(tc, lengths, "prod"))
    assert abs(mean[0] - (0.9 + 0.5 + 0.8) / 3) < 1e-6
    assert abs(mn[0] - 0.5) < 1e-6
    assert abs(pr[0] - 0.9 * 0.5 * 0.8) < 1e-6
    assert abs(mean[1] - 0.4) < 1e-6 and abs(mn[1] - 0.4) < 1e-6
    # empty hypothesis -> neutral 1.0
    empty = np.asarray(
        aggregate_confidence(tc, jnp.asarray([0, 0], jnp.int32), "mean"))
    assert np.allclose(empty, 1.0)
    with pytest.raises(ValueError, match="aggregation"):
        aggregate_confidence(tc, lengths, "median")


def test_greedy_decode_with_confidence_end_to_end():
    from end2end_tpu.ops.greedy import greedy_decode_with_timestamps

    rng = np.random.default_rng(1)
    t, n, v = 20, 3, 7
    lp = jnp.asarray(
        np.log(rng.dirichlet(np.full(v, 0.3), size=(t, n))), jnp.float32)
    il = jnp.asarray([20, 15, 1], jnp.int32)
    toks, lens, scores, times, tc, uc = greedy_decode_with_confidence(
        lp, il, method="tsallis", aggregation="mean")
    toks2, lens2, scores2, times2 = greedy_decode_with_timestamps(lp, il)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
    np.testing.assert_array_equal(np.asarray(times), np.asarray(times2))
    # token confidences = frame confidence at the emission frames
    fc = np.asarray(frame_confidence(lp, method="tsallis",
                                     exclude_blank=True))
    for b in range(n):
        for j in range(int(lens[b])):
            assert abs(float(tc[b, j]) - fc[int(times[b, j]), b]) < 1e-6
        assert np.all(np.asarray(tc[b, int(lens[b]):]) == 0.0)
    want_uc = [float(np.mean(np.asarray(tc[b, : int(lens[b])])))
               if int(lens[b]) else 1.0 for b in range(n)]
    assert np.allclose(np.asarray(uc), want_uc, atol=1e-6)
    assert np.all((np.asarray(uc) >= 0) & (np.asarray(uc) <= 1))


def test_greedy_confidence_peaked_vs_noisy():
    # same decoded string, peaked vs diffuse lattice: confidence must rank
    v, t = 5, 8
    seq = [1, 2, 3]

    def lat(strength):
        a = np.full((t, 1, v), 1.0)
        for i, s in enumerate(seq):
            a[2 * i, 0, s] = strength
            a[2 * i + 1, 0, 0] = strength
        a[6:, 0, 0] = strength
        return jnp.asarray(np.log(a / a.sum(-1, keepdims=True)), jnp.float32)

    il = jnp.asarray([t], jnp.int32)
    out_hi = greedy_decode_with_confidence(lat(1000.0), il)
    out_lo = greedy_decode_with_confidence(lat(3.0), il)
    assert np.array_equal(np.asarray(out_hi[0][0, :3]), seq)
    assert np.array_equal(np.asarray(out_lo[0][0, :3]), seq)
    assert float(out_hi[5][0]) > float(out_lo[5][0]) + 0.2


def test_word_confidences():
    from end2end_tpu.utils.text import asr_alphabet

    ab = asr_alphabet()
    ids = ab.encode("hi yo")
    times = [0, 1, 2, 4, 5]
    conf = [0.9, 0.8, 1.0, 0.6, 0.7]
    out = word_confidences(ids, times, conf, space_id=ab.encode(" ")[0],
                           alphabet=ab, how="min")
    assert [w for w, *_ in out] == ["hi", "yo"]
    assert out[0][1:] == (0, 1, 0.8)
    assert out[1][1:] == (4, 5, 0.6)
    out_mean = word_confidences(ids, times, conf, space_id=ab.encode(" ")[0],
                                alphabet=ab, how="mean")
    assert abs(out_mean[0][3] - 0.85) < 1e-9
    with pytest.raises(ValueError, match="exactly one"):
        word_confidences(ids, times, conf)


def test_errors():
    with pytest.raises(ValueError, match="method"):
        frame_confidence(jnp.zeros((1, 4)), method="gibbs")
    with pytest.raises(ValueError, match="alpha"):
        frame_confidence(jnp.zeros((1, 4)), method="tsallis", alpha=1.5)
