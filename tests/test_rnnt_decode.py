"""Transducer greedy decoding tests — NumPy loop oracle, caps, masking."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from end2end_tpu.ops.neural_lm import gru_step, random_gru_params
from end2end_tpu.ops.rnnt_decode import additive_joint, rnnt_greedy_decode


try:
    import pytest
except ImportError:  # pragma: no cover
    pytest = None

if pytest is not None:
    @pytest.fixture(autouse=True)
    def _oracle_matmul_precision():
        """ORACLE-PARITY tests: decode scores compare against host/f64
        oracles at ~1e-3 tolerances.  On TPU the default f32 matmul runs
        a bf16 MXU pass (CLAUDE.md MXU trap), drifting GRU/joint logits
        ~1e-3 per step — cumulative scores then miss the tolerance
        (measured 3.4e-2 over a 49-nat sum, tokens/timestamps still
        exact; chip run 2026-08-20).  Parity tests pin the precision;
        perf rows (bench.py) keep the fast default."""
        with jax.default_matmul_precision("highest"):
            yield



def _setup(seed, n=3, t=12, v=6, h_enc=8, emb=4, hid=5):
    rng = np.random.default_rng(seed)
    enc = rng.normal(size=(n, t, h_enc)).astype(np.float32)
    params = jax.tree.map(jnp.asarray,
                          random_gru_params(rng, v, emb_dim=emb,
                                            hidden_dim=hid))
    w_enc = rng.normal(size=(h_enc, 7)).astype(np.float32) * 0.5
    w_pred = rng.normal(size=(hid, 7)).astype(np.float32) * 0.5
    b_j = rng.normal(size=(7,)).astype(np.float32) * 0.1
    w_out = rng.normal(size=(7, v)).astype(np.float32)
    b_out = rng.normal(size=(v,)).astype(np.float32) * 0.1
    pred = partial(gru_step, params)
    joint = additive_joint(jnp.asarray(w_enc), jnp.asarray(w_pred),
                           jnp.asarray(b_j), jnp.asarray(w_out),
                           jnp.asarray(b_out))
    init_h = jnp.zeros((hid,), jnp.float32)
    return enc, pred, init_h, joint, (w_enc, w_pred, b_j, w_out, b_out)


def _oracle(enc, pred_step, init_h, joint_mats, il, blank=0, cap=4,
            s_cap=256):
    """Per-sample Python greedy loop sharing only the single-sample step
    functions (the batching/scan machinery under test is not shared)."""
    w_enc, w_pred, b_j, w_out, b_out = joint_mats
    outs, lens, scores, times = [], [], [], []
    for b in range(enc.shape[0]):
        h = np.asarray(init_h)
        t, syms = 0, 0
        toks, tms = [], []
        score = 0.0
        while t < il[b]:
            z = np.tanh(enc[b, t] @ w_enc + h @ w_pred + b_j)
            logits = z @ w_out + b_out
            lp = logits - np.log(np.exp(logits - logits.max()).sum()) \
                - logits.max()
            k = int(np.argmax(lp))
            if k == blank or syms >= cap or len(toks) >= s_cap:
                score += lp[blank]
                t += 1
                syms = 0
            else:
                score += lp[k]
                toks.append(k)
                tms.append(t)
                h = np.asarray(pred_step(jnp.asarray(h), jnp.int32(k)))
                syms += 1
        outs.append(toks)
        lens.append(len(toks))
        scores.append(score)
        times.append(tms)
    return outs, lens, scores, times


class TestGreedy:
    def test_matches_python_loop(self):
        enc, pred, init_h, joint, mats = _setup(0)
        il = np.array([12, 9, 12])
        toks, lens, scores, tms = rnnt_greedy_decode(
            enc, il, pred, init_h, joint, max_symbols=16,
            return_timestamps=True)
        o_toks, o_lens, o_scores, o_tms = _oracle(enc, pred, init_h, mats,
                                                  il, s_cap=16)
        toks, lens = np.asarray(toks), np.asarray(lens)
        for b in range(3):
            assert lens[b] == o_lens[b]
            assert list(toks[b, :lens[b]]) == o_toks[b]
            assert list(np.asarray(tms)[b, :lens[b]]) == o_tms[b]
            assert abs(float(np.asarray(scores)[b]) - o_scores[b]) < 1e-3
        # -1 padding past each length
        for b in range(3):
            assert np.all(toks[b, lens[b]:] == -1)

    def test_per_frame_cap_forces_advance(self):
        # a joint that always prefers token 1 must emit exactly
        # max_symbols_per_frame tokens per frame
        n, t, v, h = 1, 5, 4, 3
        enc = np.zeros((n, t, h), np.float32)

        def joint(f, hid):
            return jnp.asarray([0.0, 5.0, 1.0, 1.0])

        def pred(hid, tok):
            return hid

        toks, lens, _ = rnnt_greedy_decode(
            enc, [t], pred, jnp.zeros((2,)), joint, max_symbols=64,
            max_symbols_per_frame=3)
        assert int(lens[0]) == t * 3
        assert np.all(np.asarray(toks)[0, :15] == 1)

    def test_length_masking(self):
        enc, pred, init_h, joint, mats = _setup(1)
        full = rnnt_greedy_decode(enc, [12, 12, 12], pred, init_h, joint,
                                  max_symbols=16)
        short = rnnt_greedy_decode(enc, [12, 7, 12], pred, init_h, joint,
                                   max_symbols=16)
        # samples 0/2 unchanged; sample 1 is a prefix decode
        np.testing.assert_array_equal(np.asarray(full[0])[0],
                                      np.asarray(short[0])[0])
        np.testing.assert_array_equal(np.asarray(full[0])[2],
                                      np.asarray(short[0])[2])
        o_toks, o_lens, _, _ = _oracle(enc, pred, init_h, mats,
                                       np.array([12, 7, 12]), s_cap=16)
        s_toks = np.asarray(short[0])
        assert list(s_toks[1, :int(short[1][1])]) == o_toks[1]

    def test_zero_length_sample(self):
        enc, pred, init_h, joint, _ = _setup(2)
        toks, lens, scores = rnnt_greedy_decode(enc, [12, 0, 3], pred,
                                                init_h, joint,
                                                max_symbols=16)
        assert int(lens[1]) == 0
        assert float(scores[1]) == 0.0
        assert np.all(np.asarray(toks)[1] == -1)


class TestFactoredJoint:
    """FactoredAdditiveJoint: the decoders hoist the frame projection out
    of the sequential loop — outputs must match the plain closure."""

    def _factored(self, mats):
        from end2end_tpu.ops.rnnt_decode import FactoredAdditiveJoint
        return FactoredAdditiveJoint(*mats)

    def test_call_protocol_matches_plain(self):
        # The instance is itself a protocol joint_fn (unprojected input)
        # for consumers that don't know about the factoring.
        enc, pred, init_h, joint, mats = _setup(3)
        fj = self._factored(mats)
        f = jnp.asarray(enc[0, 0])
        h = jnp.asarray(np.random.default_rng(0).normal(size=(5,))
                        .astype(np.float32))
        np.testing.assert_allclose(np.asarray(fj(f, h)),
                                   np.asarray(joint(f, h)), atol=1e-6)

    def test_greedy_factored_matches_plain(self):
        enc, pred, init_h, joint, mats = _setup(4)
        fj = self._factored(mats)
        il = np.array([12, 7, 10])
        tp, lp_, sp, mp = rnnt_greedy_decode(enc, il, pred, init_h, joint,
                                             max_symbols=16,
                                             return_timestamps=True)
        tf_, lf, sf, mf = rnnt_greedy_decode(enc, il, pred, init_h, fj,
                                             max_symbols=16,
                                             return_timestamps=True)
        np.testing.assert_array_equal(np.asarray(tp), np.asarray(tf_))
        np.testing.assert_array_equal(np.asarray(lp_), np.asarray(lf))
        np.testing.assert_array_equal(np.asarray(mp), np.asarray(mf))
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sf),
                                   atol=1e-4)

    def test_beam_factored_matches_plain(self):
        from end2end_tpu.ops.rnnt_decode import rnnt_beam_decode
        enc, pred, init_h, joint, mats = _setup(5)
        fj = self._factored(mats)
        il = np.array([12, 9, 12])
        tp, lp_, sp = rnnt_beam_decode(enc, il, pred, init_h, joint,
                                       beam_width=4, max_symbols=16)
        tf_, lf, sf = rnnt_beam_decode(enc, il, pred, init_h, fj,
                                       beam_width=4, max_symbols=16)
        np.testing.assert_array_equal(np.asarray(tp), np.asarray(tf_))
        np.testing.assert_array_equal(np.asarray(lp_), np.asarray(lf))
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sf),
                                   atol=1e-4)

    def test_streaming_greedy_factored_exact_vs_oneshot(self):
        from end2end_tpu.ops.streaming_decode import (
            StreamingRNNTGreedyDecoder)
        enc, pred, init_h, joint, mats = _setup(6)
        fj = self._factored(mats)
        il = np.array([12, 12, 12])
        one = rnnt_greedy_decode(enc, il, pred, init_h, fj, max_symbols=16)
        dec = StreamingRNNTGreedyDecoder(pred, init_h, fj, max_symbols=16)
        st = dec.init(3)
        for lo, hi in ((0, 5), (5, 8), (8, 12)):
            st = dec.step(st, enc[:, lo:hi])
        toks, lens, scores = dec.finish(st)
        np.testing.assert_array_equal(np.asarray(one[0]), np.asarray(toks))
        np.testing.assert_array_equal(np.asarray(one[1]), np.asarray(lens))
        np.testing.assert_allclose(np.asarray(one[2]), np.asarray(scores),
                                   atol=1e-4)


class TestLookahead:
    """lookahead=F: F-frame windowed greedy steps — tokens/lengths/times
    bit-identical to lookahead=1, scores to f32 re-association."""

    def _parity(self, enc, pred, init_h, joint, il, F, **kw):
        a = rnnt_greedy_decode(enc, il, pred, init_h, joint,
                               return_timestamps=True, **kw)
        b = rnnt_greedy_decode(enc, il, pred, init_h, joint,
                               lookahead=F, return_timestamps=True, **kw)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
        np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]),
                                   atol=1e-4)

    def test_random_joint_f2_f4_f8(self):
        enc, pred, init_h, joint, mats = _setup(7)
        il = np.array([12, 9, 11])
        for F in (2, 4, 8):
            self._parity(enc, pred, init_h, joint, il, F, max_symbols=16)

    def test_blank_dominated(self):
        # Bias the joint output toward blank so windows consume runs of
        # blanks — the regime lookahead exists for.
        enc, pred, init_h, joint, mats = _setup(8, t=20)
        w_enc, w_pred, b_j, w_out, b_out = mats
        b_out = b_out.copy()
        b_out[0] += 4.0                                   # blank = 0
        from end2end_tpu.ops.rnnt_decode import additive_joint
        joint = additive_joint(*[jnp.asarray(m) for m in
                                 (w_enc, w_pred, b_j, w_out, b_out)])
        il = np.array([20, 17, 20])
        self._parity(enc, pred, init_h, joint, il, 4, max_symbols=16)

    def test_factored_joint_lookahead(self):
        from end2end_tpu.ops.rnnt_decode import FactoredAdditiveJoint
        enc, pred, init_h, joint, mats = _setup(9)
        fj = FactoredAdditiveJoint(*mats)
        il = np.array([12, 12, 10])
        self._parity(enc, pred, init_h, fj, il, 4, max_symbols=16)

    def test_per_frame_cap_forced_blank(self):
        # A joint that always prefers one token exercises the
        # consecutive-emission cap inside the window (forced blank at
        # frame 0, emission later in the same window).
        enc, pred, init_h, joint, mats = _setup(10)
        w_enc, w_pred, b_j, w_out, b_out = mats
        b_out = b_out.copy()
        b_out[3] += 6.0
        from end2end_tpu.ops.rnnt_decode import additive_joint
        joint = additive_joint(*[jnp.asarray(m) for m in
                                 (w_enc, w_pred, b_j, w_out, b_out)])
        il = np.array([12, 12, 12])
        self._parity(enc, pred, init_h, joint, il, 4,
                     max_symbols=32, max_symbols_per_frame=2)

    def test_oracle_parity_lookahead(self):
        enc, pred, init_h, joint, mats = _setup(11)
        il = np.array([12, 9, 12])
        toks, lens, scores, tms = rnnt_greedy_decode(
            enc, il, pred, init_h, joint, max_symbols=16, lookahead=4,
            return_timestamps=True)
        o_toks, o_lens, o_scores, o_tms = _oracle(enc, pred, init_h, mats,
                                                  il, s_cap=16)
        for b in range(3):
            L = int(lens[b])
            assert L == o_lens[b]
            assert list(np.asarray(toks)[b][:L]) == o_toks[b]
            assert list(np.asarray(tms)[b][:L]) == o_tms[b]
            np.testing.assert_allclose(float(scores[b]), o_scores[b],
                                       atol=1e-4)

    def test_streaming_lookahead_exact_vs_oneshot(self):
        from end2end_tpu.ops.streaming_decode import (
            StreamingRNNTGreedyDecoder)
        enc, pred, init_h, joint, mats = _setup(12, t=16)
        il = np.array([16, 16, 16])
        one = rnnt_greedy_decode(enc, il, pred, init_h, joint,
                                 max_symbols=16, lookahead=4)
        dec = StreamingRNNTGreedyDecoder(pred, init_h, joint,
                                         max_symbols=16, lookahead=4)
        st = dec.init(3)
        for lo, hi in ((0, 5), (5, 11), (11, 16)):
            st = dec.step(st, enc[:, lo:hi])
        toks, lens, scores = dec.finish(st)
        np.testing.assert_array_equal(np.asarray(one[0]), np.asarray(toks))
        np.testing.assert_array_equal(np.asarray(one[1]), np.asarray(lens))
        np.testing.assert_allclose(np.asarray(one[2]), np.asarray(scores),
                                   atol=1e-4)
