"""Transducer serving extras: confidence estimation and MWER training.

Mirrors test_confidence.py / test_mwer.py for the RNN-T family:
confidence values are checked against a float64 NumPy recomputation of
the joint softmax at each emission point (the exact distribution the
greedy scan sampled), and the MWER loss against an independent oracle
(f64 DP hypothesis scores + posterior regret), finite differences, and
the equal-errors invariants.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from end2end_tpu.ops.confidence import (rnnt_greedy_decode_with_confidence,
                                        rnnt_token_confidence)
from end2end_tpu.ops.mwer import rnnt_mwer_loss
from end2end_tpu.ops.rnnt_decode import rnnt_beam_decode, rnnt_greedy_decode
from end2end_tpu.utils.rnnt_reference import rnnt_loss_ref
from tests.test_rnnt_beam import _lattice, _np_joint_lp, _setup


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



def _np_conf(lp_row, method, blank, exclude_blank):
    lp = np.asarray(lp_row, np.float64)
    v = lp.shape[-1]
    if exclude_blank:
        lp = np.delete(lp, blank)
        lp = lp - np.log(np.exp(lp).sum())
        v -= 1
    p = np.exp(lp)
    if method == "max_prob":
        return p.max()
    if method == "shannon":
        h = -(p * lp).sum()
        return np.clip(1.0 - h / np.log(v), 0.0, 1.0)
    raise ValueError(method)


class TestRNNTConfidence:
    def test_values_match_f64_recomputation(self):
        n, t_max, v = 3, 10, 6
        enc, pred, init_h, joint = _setup(4, n=n, t=t_max, v=v, scale=1.2)
        il = np.array([t_max, t_max - 2, t_max - 4], np.int32)
        toks, lens, _, times = rnnt_greedy_decode(
            enc, il, pred, init_h, joint, max_symbols=6,
            return_timestamps=True)
        for method in ("max_prob", "shannon"):
            tc, utt = rnnt_token_confidence(
                enc, toks, lens, jnp.where(times < 0, 0, times), pred,
                init_h, joint, method=method, exclude_blank=True,
                aggregation="mean")
            tc = np.asarray(tc)
            for b in range(n):
                L = int(np.asarray(lens)[b])
                h = np.asarray(init_h)
                for u in range(L):
                    t_u = int(np.asarray(times)[b, u])
                    lp = _np_joint_lp(enc[b, t_u], h, joint)
                    want = _np_conf(lp, method, 0, True)
                    np.testing.assert_allclose(tc[b, u], want, atol=2e-5)
                    h = np.asarray(pred(jnp.asarray(h),
                                        jnp.int32(np.asarray(toks)[b, u])))
                assert np.all(tc[b, L:] == 0.0)

    def test_wrapper_composes(self):
        n, t_max, v = 2, 8, 5
        enc, pred, init_h, joint = _setup(9, n=n, t=t_max, v=v, scale=1.0)
        il = np.full((n,), t_max, np.int32)
        out = rnnt_greedy_decode_with_confidence(
            enc, il, pred, init_h, joint, max_symbols=5)
        toks, lens, scores, times, tc, utt = out
        ref = rnnt_greedy_decode(enc, il, pred, init_h, joint,
                                 max_symbols=5, return_timestamps=True)
        for a, b in zip(ref, (toks, lens, scores, times)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        tc2, utt2 = rnnt_token_confidence(
            enc, toks, lens, jnp.where(times < 0, 0, times), pred, init_h,
            joint)
        np.testing.assert_array_equal(np.asarray(tc), np.asarray(tc2))
        np.testing.assert_array_equal(np.asarray(utt), np.asarray(utt2))
        # aggregations behave
        u = np.asarray(utt)
        assert np.all((u >= 0.0) & (u <= 1.0))

    def test_beam_shapes(self):
        n, t_max, v, W = 2, 8, 5, 3
        enc, pred, init_h, joint = _setup(13, n=n, t=t_max, v=v, scale=1.1)
        il = np.full((n,), t_max, np.int32)
        toks, lens, scores, times = rnnt_beam_decode(
            enc, il, pred, init_h, joint, beam_width=W, max_symbols=4,
            return_timestamps=True)
        tc, utt = rnnt_token_confidence(
            enc, toks, jnp.maximum(lens, 0), jnp.where(times < 0, 0, times),
            pred, init_h, joint, aggregation="min")
        assert np.asarray(tc).shape == (n, W, 4)
        assert np.asarray(utt).shape == (n, W)
        # top beam's confidences are finite and in range where valid
        tcn = np.asarray(tc)
        assert np.all((tcn >= 0.0) & (tcn <= 1.0))

    def test_peaked_is_more_confident(self):
        n, t_max, v = 1, 8, 6
        enc_d, pred, init_h, joint = _setup(21, n=n, t=t_max, v=v,
                                            scale=0.3)
        enc_p = enc_d * 8.0                     # peaked joint rows
        il = np.full((n,), t_max, np.int32)
        outs = []
        for e in (enc_d, enc_p):
            _, lens, _, _, tc, utt = rnnt_greedy_decode_with_confidence(
                e, il, pred, init_h, joint, max_symbols=6)
            outs.append((np.asarray(lens), np.asarray(utt)))
        if outs[0][0][0] > 0 and outs[1][0][0] > 0:
            assert outs[1][1][0] > outs[0][1][0] - 1e-6


class TestRNNTMWER:
    def _problem(self, seed, n=2, t=8, v=5, s_ref=3):
        enc, pred, init_h, joint = _setup(seed, n=n, t=t, v=v, scale=1.2)
        rng = np.random.default_rng(seed + 100)
        ref = rng.integers(1, v, size=(n, s_ref)).astype(np.int32)
        rl = rng.integers(1, s_ref + 1, size=(n,)).astype(np.int32)
        il = np.full((n,), t, np.int32)
        return enc, pred, init_h, joint, ref, rl, il

    def test_value_matches_f64_oracle(self):
        n, t_max, v, W, s_cap = 2, 8, 5, 3, 4
        enc, pred, init_h, joint, ref, rl, il = self._problem(31, n=n,
                                                              t=t_max, v=v)
        loss, aux = rnnt_mwer_loss(
            enc, il, ref, rl, pred, init_h, joint, beam_width=W,
            max_symbols=s_cap, scale=1.0, reduction="none",
            return_aux=True)
        toks, lens, dec_scores = rnnt_beam_decode(
            enc, il, pred, init_h, joint, beam_width=W,
            max_symbols=s_cap)
        toks, lens, dec_scores = map(np.asarray, (toks, lens, dec_scores))
        for b in range(n):
            scores, errs = [], []
            for w in range(W):
                if dec_scores[b, w] <= -1e9:
                    continue
                y = toks[b, w, :lens[b, w]].astype(np.int64)
                lat = _lattice(enc[b, :il[b]], y.tolist(), pred, init_h,
                               joint)
                nll, _ = rnnt_loss_ref(lat[None], y[None], [il[b]],
                                       [len(y)], blank=0)
                scores.append(-nll[0])
                # token-level edit distance vs reference
                import difflib
                a = toks[b, w, :lens[b, w]].tolist()
                r = ref[b, :rl[b]].tolist()
                dp = np.zeros((len(a) + 1, len(r) + 1), np.int64)
                dp[:, 0] = np.arange(len(a) + 1)
                dp[0, :] = np.arange(len(r) + 1)
                for i in range(1, len(a) + 1):
                    for j in range(1, len(r) + 1):
                        dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                                       dp[i - 1, j - 1]
                                       + (a[i - 1] != r[j - 1]))
                errs.append(dp[-1, -1])
            scores = np.asarray(scores, np.float64)
            errs = np.asarray(errs, np.float64)
            p = np.exp(scores - scores.max())
            p = p / p.sum()
            want = float((p * (errs - errs.mean())).sum())
            np.testing.assert_allclose(float(np.asarray(loss)[b]), want,
                                       atol=2e-3)

    def test_equal_errors_zero_loss_and_grad(self):
        n, t_max, v = 1, 6, 4
        enc, pred, init_h, joint, ref, rl, il = self._problem(7, n=n,
                                                              t=t_max, v=v)
        # reference chosen so every hypothesis has the SAME error count:
        # impossible to guarantee in general — instead use W=1 (single
        # valid hypothesis: regret vs its own mean is identically 0)
        def loss_fn(e):
            return rnnt_mwer_loss(e, il, ref, rl, pred, init_h, joint,
                                  beam_width=1, max_symbols=3,
                                  reduction="sum")
        val, g = jax.value_and_grad(loss_fn)(jnp.asarray(enc))
        np.testing.assert_allclose(float(val), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)

    def test_finite_differences(self):
        n, t_max, v = 1, 5, 4
        enc, pred, init_h, joint, ref, rl, il = self._problem(11, n=n,
                                                              t=t_max, v=v)

        def loss_fn(e):
            return rnnt_mwer_loss(e, il, ref, rl, pred, init_h, joint,
                                  beam_width=3, max_symbols=3,
                                  reduction="sum")

        e0 = jnp.asarray(enc)
        g = np.asarray(jax.grad(loss_fn)(e0))
        rng = np.random.default_rng(0)
        for _ in range(4):
            i = rng.integers(0, enc.shape[1])
            j = rng.integers(0, enc.shape[2])
            eps = 1e-3
            ep = np.array(enc); ep[0, i, j] += eps
            em = np.array(enc); em[0, i, j] -= eps
            fd = (float(loss_fn(jnp.asarray(ep)))
                  - float(loss_fn(jnp.asarray(em)))) / (2 * eps)
            np.testing.assert_allclose(g[0, i, j], fd, atol=5e-3)

    def test_training_descends(self):
        n, t_max, v = 2, 8, 5
        enc, pred, init_h, joint, ref, rl, il = self._problem(17, n=n,
                                                              t=t_max, v=v)

        def loss_fn(e):
            l, aux = rnnt_mwer_loss(e, il, ref, rl, pred, init_h, joint,
                                    beam_width=3, max_symbols=4,
                                    reduction="mean", return_aux=True)
            return l, aux["expected_error"].mean()

        e = jnp.asarray(enc)
        (_, err0), _ = jax.value_and_grad(loss_fn, has_aux=True)(e)
        step = jax.jit(lambda x: x - 1.0 * jax.grad(
            lambda y: loss_fn(y)[0])(x))
        for _ in range(10):
            e = step(e)
        _, err1 = loss_fn(e)
        assert float(err1) <= float(err0) + 1e-6
