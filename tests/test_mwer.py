"""MWER / MBR training loss: float64 oracle parity, finite-difference
gradients, invariants, and a training smoke test.

Oracle strategy (SURVEY.md §5.2): every moving part is checked against an
independent slow implementation — word segmentation/hashing vs a Python
split-and-hash, the loss value vs a float64 NumPy composition of
`ctc_loss_ref` + softmax + regret, and the gradient vs central finite
differences through the f64 XLA scoring path (the N-best list is held
fixed so the objective is smooth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu import beam_search_decode
from end2end_tpu.ops.mwer import mwer_loss, mwer_loss_from_nbest, word_id_hashes
from end2end_tpu.utils.metrics import edit_distance
from end2end_tpu.utils.reference_impl import ctc_loss_ref

FNV_OFFSET = 2166136261
FNV_PRIME = 16777619


def _fnv(ids):
    h = FNV_OFFSET
    for t in ids:
        h = ((h ^ (int(t) + 1)) * FNV_PRIME) & 0xFFFFFFFF
    return np.int32(np.uint32(h))


def _words(ids, space_id):
    out, cur = [], []
    for t in ids:
        if t == space_id:
            if cur:
                out.append(tuple(cur))
            cur = []
        else:
            cur.append(int(t))
    if cur:
        out.append(tuple(cur))
    return out


def _rand_problem(rng, b=3, t=24, s=6, v=7):
    logits = rng.standard_normal((t, b, v)) * 2.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    il = jnp.asarray(rng.integers(t // 2, t + 1, b), jnp.int32)
    tl = jnp.asarray(rng.integers(1, s + 1, b), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, v, (b, s)), jnp.int32)
    return lp, tgt, il, tl


class TestWordIdHashes:
    def test_vs_python_oracle(self):
        rng = np.random.default_rng(0)
        space = 3
        toks = rng.integers(0, 6, (5, 4, 12)).astype(np.int32)
        lens = rng.integers(0, 13, (5, 4)).astype(np.int32)
        wh, wc = word_id_hashes(toks, lens, space)
        wh, wc = np.asarray(wh), np.asarray(wc)
        for i in range(5):
            for j in range(4):
                words = _words(toks[i, j, : lens[i, j]], space)
                assert wc[i, j] == len(words)
                for k, wd in enumerate(words):
                    assert wh[i, j, k] == _fnv(wd), (i, j, k, wd)

    def test_edge_cases(self):
        # all separators, empty, single word, no separators
        toks = np.array(
            [[3, 3, 3, 3], [0, 0, 0, 0], [3, 5, 3, 3], [1, 2, 4, 5]],
            np.int32,
        )
        lens = np.array([4, 0, 4, 4], np.int32)
        wh, wc = word_id_hashes(toks, lens, 3)
        assert np.asarray(wc).tolist() == [0, 0, 1, 1]
        assert int(np.asarray(wh)[2, 0]) == _fnv((5,))
        assert int(np.asarray(wh)[3, 0]) == _fnv((1, 2, 4, 5))


def _oracle_mwer(lp_f64, il, hyp, hyp_len, ref, ref_len, scale=1.0,
                 err="token", space_id=None):
    """float64 NumPy composition: ctc_loss_ref scores + softmax + regret."""
    n, w, _ = hyp.shape
    losses = np.zeros(n)
    exp_errs = np.zeros(n)
    for i in range(n):
        scores, errs, valid = [], [], []
        for j in range(w):
            hl = int(hyp_len[i, j])
            seq = hyp[i, j, :hl]
            nll, _ = ctc_loss_ref(
                lp_f64[:, i: i + 1],
                np.asarray(seq, np.int64)[None],
                np.asarray([il[i]]),
                np.asarray([hl]),
            )
            s = -float(nll[0])
            scores.append(s)
            valid.append(np.isfinite(s))
            r = ref[i, : ref_len[i]]
            if err == "word":
                errs.append(edit_distance(_words(seq, space_id),
                                          _words(r, space_id)))
            else:
                errs.append(edit_distance(list(seq), list(r)))
        scores = np.array(scores)
        errs = np.array(errs, np.float64)
        valid = np.array(valid)
        if not valid.any():
            continue
        z = np.where(valid, scale * scores, -np.inf)
        z = z - z.max()
        p = np.exp(z) / np.exp(z).sum()
        mean_err = errs[valid].mean()
        losses[i] = float((p * np.where(valid, errs - mean_err, 0.0)).sum())
        exp_errs[i] = float((p * np.where(valid, errs, 0.0)).sum())
    return losses, exp_errs


class TestMWERValue:
    @pytest.mark.parametrize("err,space_id", [("token", None), ("word", 2)])
    def test_vs_f64_oracle(self, err, space_id):
        rng = np.random.default_rng(1)
        lp, tgt, il, tl = _rand_problem(rng)
        hyp, hyp_len, scores = beam_search_decode(
            lp, il, beam_width=4, max_symbols=8, implementation="xla")
        with jax.enable_x64(True):
            loss, aux = mwer_loss_from_nbest(
                jnp.asarray(np.asarray(lp), jnp.float64), il,
                hyp, hyp_len, tgt, tl,
                hyp_valid=jnp.isfinite(scores),
                err=err, space_id=space_id,
                reduction="none", return_aux=True)
        o_loss, o_exp = _oracle_mwer(
            np.asarray(lp, np.float64), np.asarray(il),
            np.asarray(hyp), np.asarray(hyp_len),
            np.asarray(tgt), np.asarray(tl),
            err=err, space_id=space_id)
        np.testing.assert_allclose(np.asarray(loss), o_loss, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(aux["expected_error"]), o_exp, atol=1e-9)

    def test_equal_errors_zero_loss_zero_grad(self):
        # hypotheses all at the same distance from the reference -> the
        # regret is identically 0 whatever the posterior: loss == 0, grad == 0
        rng = np.random.default_rng(2)
        lp, _, il, _ = _rand_problem(rng, b=2, t=12, s=4, v=5)
        ref = jnp.asarray([[1, 2, 3, 4], [2, 3, 4, 1]], jnp.int32)
        ref_len = jnp.asarray([4, 4], jnp.int32)
        # each hypothesis = reference with ONE substitution -> error 1 each
        hyp = jnp.stack(
            [ref.at[:, 0].set(5), ref.at[:, 1].set(5), ref.at[:, 2].set(5)],
            axis=1,
        )
        hyp_len = jnp.full((2, 3), 4, jnp.int32)

        def f(x):
            return mwer_loss_from_nbest(x, il, hyp, hyp_len, ref, ref_len)

        loss, grad = jax.value_and_grad(f)(lp)
        assert abs(float(loss)) < 1e-6
        assert float(jnp.max(jnp.abs(grad))) < 1e-6

    def test_posterior_shifts_toward_low_error(self):
        # with the N-best held FIXED, the mean error is a constant of the
        # input, so descending the MWER loss must descend the expected
        # error itself: one small gradient step reduces it
        rng = np.random.default_rng(3)
        lp, tgt, il, tl = _rand_problem(rng, b=4, t=20, s=5, v=6)
        hyp, hyp_len, scores = beam_search_decode(
            lp, il, beam_width=4, max_symbols=8, implementation="xla")
        hyp_valid = jnp.isfinite(scores)

        def f(x):
            return mwer_loss_from_nbest(
                x, il, hyp, hyp_len, tgt, tl, hyp_valid=hyp_valid,
                reduction="sum")

        def exp_err(x):
            _, aux = mwer_loss_from_nbest(
                x, il, hyp, hyp_len, tgt, tl, hyp_valid=hyp_valid,
                reduction="sum", return_aux=True)
            return float(jnp.sum(aux["expected_error"]))

        g = jax.grad(f)(lp)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.max(jnp.abs(g))) > 0.0
        before = exp_err(lp)
        after = exp_err(lp - 0.5 * g)
        assert after < before


class TestMWERGradient:
    def test_finite_differences_f64(self):
        if jax.default_backend() == "tpu":
            pytest.skip("TPU has no float64 (enable_x64 computes in f32 there)")
        rng = np.random.default_rng(4)
        with jax.enable_x64(True):
            lp, tgt, il, tl = _rand_problem(rng, b=2, t=10, s=3, v=5)
            lp = jnp.asarray(np.asarray(lp), jnp.float64)
            hyp, hyp_len, scores = beam_search_decode(
                lp, il, beam_width=3, max_symbols=5, implementation="xla")
            hyp_valid = jnp.isfinite(scores)

            def f(x):
                return mwer_loss_from_nbest(
                    x, il, hyp, hyp_len, tgt, tl, hyp_valid=hyp_valid,
                    reduction="sum")

            g = np.asarray(jax.grad(f)(lp))
            x0 = np.asarray(lp, np.float64)
            eps = 1e-6
            idx = [tuple(rng.integers(0, d) for d in x0.shape)
                   for _ in range(12)]
            for ix in idx:
                xp, xm = x0.copy(), x0.copy()
                xp[ix] += eps
                xm[ix] -= eps
                fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (
                    2 * eps)
                assert abs(fd - g[ix]) < 1e-5 * max(1.0, abs(fd)), (ix, fd, g[ix])


class TestMWEREndToEnd:
    def test_jit_and_reductions(self):
        rng = np.random.default_rng(5)
        lp, tgt, il, tl = _rand_problem(rng)
        f = jax.jit(lambda x: mwer_loss(x, tgt, il, tl, beam_width=3,
                                        max_symbols=8, implementation="xla"))
        v = float(f(lp))
        assert np.isfinite(v)
        per = mwer_loss(lp, tgt, il, tl, beam_width=3, max_symbols=8,
                        implementation="xla", reduction="none")
        s = mwer_loss(lp, tgt, il, tl, beam_width=3, max_symbols=8,
                      implementation="xla", reduction="sum")
        np.testing.assert_allclose(float(jnp.mean(per)), v, rtol=1e-6)
        np.testing.assert_allclose(float(jnp.sum(per)), float(s), rtol=1e-6)

    def test_training_reduces_expected_error(self):
        # tiny end-to-end fine-tune: direct-logit MWER descent drives the
        # expected token error of the N-best posterior down
        rng = np.random.default_rng(6)
        b, t, s, v = 2, 16, 4, 6
        logits = jnp.asarray(rng.standard_normal((t, b, v)))
        tgt = jnp.asarray(rng.integers(1, v, (b, s)), jnp.int32)
        il = jnp.full((b,), t, jnp.int32)
        tl = jnp.full((b,), s, jnp.int32)

        @jax.jit
        def step(x):
            def f(x):
                return mwer_loss(x, tgt, il, tl, beam_width=4, max_symbols=6,
                                 implementation="xla", from_logits=True)
            return x - 5.0 * jax.grad(f)(x)

        def exp_err(x):
            _, aux = mwer_loss(x, tgt, il, tl, beam_width=4, max_symbols=6,
                               implementation="xla", from_logits=True,
                               return_aux=True)
            return float(jnp.sum(aux["expected_error"]))

        before = exp_err(logits)
        for _ in range(8):
            logits = step(logits)
        after = exp_err(logits)
        assert after < before
