"""Pallas CTC kernels vs the XLA scan and torch (interpret mode on CPU).

On CPU these run through the Pallas interpreter (tiny shapes only); the same
code compiles to Mosaic on the real TPU (exercised by bench.py / E2E_TPU=1).
The Pallas and XLA paths use the same fastmath numerics, so agreement is
expected to near-f32-exactness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu import ctc_loss
from end2end_tpu.ops.ctc_loss_pallas import ctc_nll_pallas
from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla
from tests.conftest import random_ctc_problem
from tests.test_ctc_loss_xla import torch_loss_grad


def pallas_loss_grad(lp, tgt, il, tl, blank=0):
    @jax.jit
    def f(x):
        nll = ctc_nll_pallas(x, tgt, il, tl, blank)
        grad = jax.grad(lambda y: jnp.sum(ctc_nll_pallas(y, tgt, il, tl, blank)))(x)
        return nll, grad

    nll, grad = f(jnp.asarray(lp))
    return np.asarray(nll), np.asarray(grad)


@pytest.mark.parametrize("B,T,S,V", [(3, 20, 6, 12), (2, 33, 5, 29)])
def test_pallas_matches_xla_and_torch(rng, B, T, S, V):
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    p_loss, p_grad = pallas_loss_grad(lp, tgt, il, tl)

    @jax.jit
    def fx(x):
        nll = ctc_nll_xla(x, tgt, il, tl, 0)
        grad = jax.grad(lambda y: jnp.sum(ctc_nll_xla(y, tgt, il, tl, 0)))(x)
        return nll, grad

    x_loss, x_grad = map(np.asarray, fx(jnp.asarray(lp)))
    np.testing.assert_allclose(p_loss, x_loss, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(p_grad, x_grad, rtol=1e-5, atol=1e-6)

    t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl)
    np.testing.assert_allclose(p_loss, t_loss, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(p_grad, t_grad, rtol=1e-4, atol=1e-4)


def test_pallas_repeated_labels_nonzero_blank(rng):
    B, T, V = 2, 18, 7
    lp, _, _, _ = random_ctc_problem(rng, B, T, 4, V)
    tgt = np.array([[2, 2, 3, 3], [1, 1, 1, 4]], dtype=np.int32)
    tl = np.array([4, 4], np.int32)
    il = np.array([18, 13], np.int32)
    for blank in (0, 6):
        p_loss, p_grad = pallas_loss_grad(lp, tgt, il, tl, blank)
        t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl, blank=blank)
        np.testing.assert_allclose(p_loss, t_loss, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(p_grad, t_grad, rtol=1e-4, atol=1e-4)


def test_pallas_zero_and_impossible(rng):
    T, B, V = 4, 2, 5
    lp = np.log(np.full((T, B, V), 1.0 / V, dtype=np.float32))
    tgt = np.array([[1, 1, 1], [2, 3, 0]], dtype=np.int32)
    il = np.array([4, 4], np.int32)
    tl = np.array([3, 2], np.int32)
    p_loss, p_grad = pallas_loss_grad(lp, tgt, il, tl)
    assert np.isinf(p_loss[0]) and np.isfinite(p_loss[1])
    assert np.all(np.isfinite(p_grad))
    # zero target length
    tl2 = np.array([0, 2], np.int32)
    p_loss2, p_grad2 = pallas_loss_grad(lp, tgt, il, tl2)
    t_loss2, t_grad2 = torch_loss_grad(lp, tgt, il, tl2)
    np.testing.assert_allclose(p_loss2, t_loss2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p_grad2, t_grad2, rtol=1e-4, atol=1e-4)


def test_pallas_odd_batch_and_t(rng):
    """Batch not a multiple of 8 and T not a multiple of the chunk length."""
    B, T, S, V = 5, 37, 7, 11
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    p_loss, p_grad = pallas_loss_grad(lp, tgt, il, tl)
    t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl)
    np.testing.assert_allclose(p_loss, t_loss, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(p_grad, t_grad, rtol=1e-4, atol=1e-4)


def test_ctc_loss_api_pallas_impl(rng):
    B, T, S, V = 2, 16, 4, 9
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    a = ctc_loss(lp, tgt, il, tl, reduction="mean", implementation="pallas")
    b = ctc_loss(lp, tgt, il, tl, reduction="mean", implementation="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pallas_multichunk_grid(rng, monkeypatch):
    """Regression: the backward kernel runs the grid in REVERSE; global time
    indices must use the time-chunk id, not the grid step (this was wrong
    and invisible in single-chunk configs)."""
    import end2end_tpu.ops.ctc_loss_pallas as P

    monkeypatch.setattr(P, "_pick_tc", lambda *a, **k: 8)
    B, T, S, V = 3, 37, 6, 9
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    p_loss, p_grad = pallas_loss_grad(lp, tgt, il, tl)

    @jax.jit
    def fx(x):
        nll = ctc_nll_xla(x, tgt, il, tl, 0)
        grad = jax.grad(lambda y: jnp.sum(ctc_nll_xla(y, tgt, il, tl, 0)))(x)
        return nll, grad

    x_loss, x_grad = map(np.asarray, fx(jnp.asarray(lp)))
    np.testing.assert_allclose(p_loss, x_loss, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(p_grad, x_grad, rtol=1e-5, atol=1e-6)


def test_large_batch_vmem_budget(rng):
    """Regression: huge (B, L) must pick a small chunk (or auto-fall back to
    xla) instead of blowing the 16MB VMEM budget."""
    import end2end_tpu.ops.ctc_loss_pallas as P

    assert P._pick_tc(1000, 512, 256) >= 1
    row = 512 * 256 * 4
    tc = P._pick_tc(1000, 512, 256)
    assert 12 * row + 5 * tc * row <= P._VMEM_BUDGET
    assert not P.fits_vmem(2048, 1024)  # absurd shapes -> xla fallback
    # and a modest multi-chunk config still matches the XLA path
    B, T, S, V = 48, 40, 70, 9  # Lp = 256, b_pad = 48
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    p_loss, p_grad = pallas_loss_grad(lp, tgt, il, tl)

    @jax.jit
    def fx(x):
        nll = ctc_nll_xla(x, tgt, il, tl, 0)
        grad = jax.grad(lambda y: jnp.sum(ctc_nll_xla(y, tgt, il, tl, 0)))(x)
        return nll, grad

    x_loss, x_grad = map(np.asarray, fx(jnp.asarray(lp)))
    np.testing.assert_allclose(p_loss, x_loss, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(p_grad, x_grad, rtol=1e-5, atol=1e-6)


def test_pallas_multichunk_edge_cases(rng, monkeypatch):
    """Multi-chunk grid x variable lengths x zero target length x impossible
    alignment, in one batch."""
    import end2end_tpu.ops.ctc_loss_pallas as P

    monkeypatch.setattr(P, "_pick_tc", lambda *a, **k: 4)
    T, B, V = 24, 4, 6
    lp, _, _, _ = random_ctc_problem(rng, B, T, 4, V)
    tgt = np.array(
        [[1, 2, 3, 4], [2, 2, 2, 2], [5, 0, 0, 0], [1, 1, 1, 1]], np.int32
    )
    il = np.array([24, 5, 17, 3], np.int32)   # sample 3: T=3 < needed 7
    tl = np.array([4, 4, 1, 4], np.int32)
    tl2 = tl.copy(); tl2[2] = 0               # and a zero-target sample
    for tlv in (tl, tl2):
        p_loss, p_grad = pallas_loss_grad(lp, tgt, il, tlv)
        t_loss, t_grad = torch_loss_grad(lp, tgt, il, tlv)
        fin = np.isfinite(t_loss)
        np.testing.assert_allclose(p_loss[fin], t_loss[fin], rtol=1e-5, atol=1e-4)
        assert np.isinf(p_loss[~fin]).all() if (~fin).any() else True
        np.testing.assert_allclose(
            p_grad[:, fin], t_grad[:, fin], rtol=1e-4, atol=1e-4
        )


def test_pallas_checkpoint_every(rng):
    """checkpoint_every on the pallas path caps the chunk length; results are
    bit-identical regardless of the interval (the recompute reruns the exact
    same renormalized update from the chunk checkpoints)."""
    B, T, S, V = 3, 50, 8, 12
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)

    def run(ck):
        f = lambda y: jnp.sum(
            ctc_loss(y, tgt, il, tl, reduction="none",
                     implementation="pallas", checkpoint_every=ck)
        )
        v, g = jax.value_and_grad(f)(jnp.asarray(lp))
        return np.asarray(v), np.asarray(g)

    v0, g0 = run(0)       # auto chunking
    for ck in (7, 16, 50):
        v, g = run(ck)
        np.testing.assert_array_equal(v, v0)
        np.testing.assert_array_equal(g, g0)
