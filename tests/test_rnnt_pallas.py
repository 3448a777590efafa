"""Pallas wavefront RNN-T kernels vs the XLA scan twin.

Contract (the ctc_loss_pallas/ctc_loss_xla convention applied to the
transducer): on the SAME DP planes the two implementations run the same
fastmath primitives in the same order — NLL values agree bit-for-bit
and the posterior gradients to <= 2 ulp (the exp32 polynomial's FMA
contraction is the one thing XLA may do differently in separately
compiled programs; measured: a single 1-ulp element, with the f64 truth
between the two results).  The from-logits plane prep
(`plane_prep_pallas`) reduces the vocabulary axis in one pass whose sum
order differs from XLA's reduction tree, so full-loss parity there is
~1e-5, and oracle parity stays within the family's 1e-4 budget.

On CPU the kernels run in interpreter mode (same ops, no Mosaic), so
these tests pin the numerics contract everywhere; the chip suite
(E2E_TPU=1) re-runs them compiled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu import rnnt_nll, rnnt_nll_from_planes
from end2end_tpu.utils.rnnt_reference import rnnt_logits_grad_ref


def _random_problem(rng, n=4, t=7, u=3, v=9, blank=0):
    logits = rng.standard_normal((n, t, u + 1, v)).astype(np.float32) * 2.0
    targets = rng.integers(1, v, size=(n, u)).astype(np.int32)
    il = rng.integers(2, t + 1, size=(n,)).astype(np.int32)
    il[0] = t
    ul = rng.integers(0, u + 1, size=(n,)).astype(np.int32)
    ul[0] = u
    return logits, targets, il, ul


def _planes_from(logits, targets, blank=0):
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    n, t, up, v = lp.shape
    y_ext = jnp.concatenate(
        [jnp.asarray(targets, jnp.int32),
         jnp.zeros((n, up - targets.shape[1]), jnp.int32)], axis=1)
    b_pl = lp[..., blank]
    l_pl = jnp.take_along_axis(lp, y_ext[:, None, :, None], axis=-1)[..., 0]
    return b_pl, l_pl


class TestPlaneLevelBitExact:
    """Same planes in -> bitwise-identical NLL and plane gradients."""

    def test_nll_bitwise(self):
        rng = np.random.default_rng(0)
        logits, targets, il, ul = _random_problem(rng)
        b_pl, l_pl = _planes_from(logits, targets)
        args = (b_pl, l_pl, il, ul)
        nll_x = rnnt_nll_from_planes(*args, implementation="xla")
        nll_p = rnnt_nll_from_planes(*args, implementation="pallas")
        np.testing.assert_array_equal(np.asarray(nll_x), np.asarray(nll_p))

    def test_plane_grads_ulp(self):
        # Posteriors = exp32(identical lg values); the polynomial's FMA
        # contraction may differ between the two compiled programs, so
        # the bound here is ulps, not bitwise (module docstring).
        rng = np.random.default_rng(1)
        logits, targets, il, ul = _random_problem(rng, n=3, t=9, u=4, v=6)
        b_pl, l_pl = _planes_from(logits, targets)

        def loss(impl, bp, lp_):
            return jnp.sum(
                rnnt_nll_from_planes(bp, lp_, il, ul, implementation=impl))

        gx = jax.grad(lambda bp, lp_: loss("xla", bp, lp_),
                      argnums=(0, 1))(b_pl, l_pl)
        gp = jax.grad(lambda bp, lp_: loss("pallas", bp, lp_),
                      argnums=(0, 1))(b_pl, l_pl)
        np.testing.assert_allclose(np.asarray(gx[0]), np.asarray(gp[0]),
                                   atol=3e-7, rtol=3e-7)
        np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gp[1]),
                                   atol=3e-7, rtol=3e-7)

    def test_bitwise_across_shapes(self):
        # U > T (valid for transducers), empty targets, long diagonals
        # crossing several kernel chunks, single-sample batches.
        rng = np.random.default_rng(2)
        for (n, t, u, v) in [(1, 3, 5, 4), (2, 12, 0, 5), (5, 30, 7, 8),
                             (8, 4, 4, 16)]:
            logits, targets, il, ul = _random_problem(
                rng, n=n, t=t, u=max(u, 0), v=v)
            b_pl, l_pl = _planes_from(logits, targets)
            nll_x = rnnt_nll_from_planes(b_pl, l_pl, il, ul,
                                         implementation="xla")
            nll_p = rnnt_nll_from_planes(b_pl, l_pl, il, ul,
                                         implementation="pallas")
            np.testing.assert_array_equal(np.asarray(nll_x),
                                          np.asarray(nll_p))


class TestFullLossParity:
    """from_logits path: prep reduction order differs -> ~1e-5 parity."""

    def test_loss_and_grad_close(self):
        rng = np.random.default_rng(3)
        logits, targets, il, ul = _random_problem(rng, n=4, t=11, u=5, v=17)

        def total(impl, x):
            return jnp.sum(rnnt_nll(x, targets, il, ul,
                                    implementation=impl))

        x = jnp.asarray(logits)
        lx, gx = jax.value_and_grad(lambda a: total("xla", a))(x)
        lp_, gp = jax.value_and_grad(lambda a: total("pallas", a))(x)
        np.testing.assert_allclose(float(lx), float(lp_), atol=5e-5,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gp),
                                   atol=1e-5)

    def test_nonzero_blank(self):
        rng = np.random.default_rng(4)
        n, t, u, v = 3, 6, 3, 7
        logits = rng.standard_normal((n, t, u + 1, v)).astype(np.float32)
        targets = rng.integers(0, v - 1, size=(n, u)).astype(np.int32)
        il = np.full((n,), t, np.int32)
        ul = np.full((n,), u, np.int32)
        a = rnnt_nll(logits, targets, il, ul, blank=v - 1,
                     implementation="xla")
        b = rnnt_nll(logits, targets, il, ul, blank=v - 1,
                     implementation="pallas")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=1e-6)


class TestOracleThroughPallas:
    """The pallas path holds the family's f64-oracle budgets on its own."""

    def test_grad_vs_f64_oracle(self):
        rng = np.random.default_rng(5)
        logits, targets, il, ul = _random_problem(rng, n=3, t=8, u=4, v=6)
        l_ref, g_ref = rnnt_logits_grad_ref(logits, targets, il, ul)
        nll = rnnt_nll(logits, targets, il, ul, implementation="pallas")
        np.testing.assert_allclose(np.asarray(nll), l_ref, atol=1e-4,
                                   rtol=4e-6)
        g = jax.grad(lambda x: jnp.sum(
            rnnt_nll(x, targets, il, ul, implementation="pallas")))(
                jnp.asarray(logits))
        np.testing.assert_allclose(np.asarray(g), g_ref, atol=1e-4)

    def test_from_log_probs_pallas(self):
        rng = np.random.default_rng(6)
        logits, targets, il, ul = _random_problem(rng, n=2, t=6, u=3, v=5)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        a = rnnt_nll(lp, targets, il, ul, from_logits=False,
                     implementation="pallas")
        b = rnnt_nll(lp, targets, il, ul, from_logits=False,
                     implementation="xla")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRouting:
    def test_auto_matches_explicit(self):
        rng = np.random.default_rng(7)
        logits, targets, il, ul = _random_problem(rng, n=2, t=5, u=2, v=4)
        auto = rnnt_nll(logits, targets, il, ul, implementation="auto")
        explicit = rnnt_nll(
            logits, targets, il, ul,
            implementation=("pallas" if jax.default_backend() == "tpu"
                            else "xla"))
        np.testing.assert_array_equal(np.asarray(auto),
                                      np.asarray(explicit))

    def test_bad_implementation_raises(self):
        rng = np.random.default_rng(8)
        logits, targets, il, ul = _random_problem(rng, n=1, t=4, u=2, v=4)
        with pytest.raises(ValueError):
            rnnt_nll(logits, targets, il, ul, implementation="cuda")
