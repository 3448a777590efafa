"""RNN-T (transducer) loss tests — oracle parity, gradients, edge cases.

Oracles (no torchaudio in this environment):
  * float64 NumPy alpha/beta DP (utils/rnnt_reference.py);
  * brute-force path enumeration on tiny shapes (independent of the DP);
  * an independent torch float64 implementation differentiated by torch
    AUTOGRAD (no hand-derived gradient shared with the JAX path);
  * central finite differences on the logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu.ops.rnnt_loss import RNNTLoss, rnnt_loss, rnnt_nll
from end2end_tpu.utils.rnnt_reference import (
    rnnt_logits_grad_ref,
    rnnt_loss_paths,
    rnnt_loss_ref,
)


def _rand(rng, n, t, u, v):
    logits = rng.normal(size=(n, t, u + 1, v)).astype(np.float32)
    targets = rng.integers(1, v, size=(n, u))
    return logits, targets


def _torch_rnnt_nll(logits, targets, il, ul, blank=0):
    """Independent torch f64 transducer NLL (alpha DP via torch ops only;
    gradients come from torch autograd, not a hand-derived formula)."""
    import torch

    x = torch.tensor(np.asarray(logits, np.float64), requires_grad=True)
    lp = torch.log_softmax(x, dim=-1)
    losses = []
    for b in range(x.shape[0]):
        T, U = int(il[b]), int(ul[b])
        y = [int(t) for t in targets[b, :U]]
        alpha = [[None] * (U + 1) for _ in range(T)]
        alpha[0][0] = torch.zeros((), dtype=torch.float64)
        for t in range(T):
            for u in range(U + 1):
                terms = []
                if alpha[t][u] is not None:
                    terms.append(alpha[t][u])
                if t > 0:
                    terms.append(alpha[t - 1][u] + lp[b, t - 1, u, blank])
                if u > 0:
                    terms.append(alpha[t][u - 1] + lp[b, t, u - 1, y[u - 1]])
                alpha[t][u] = torch.logsumexp(torch.stack(terms), dim=0)
        losses.append(-(alpha[T - 1][U] + lp[b, T - 1, U, blank]))
    total = torch.stack(losses)
    total.sum().backward()
    return total.detach().numpy(), x.grad.numpy()


class TestOracleParity:
    def test_loss_and_grad_vs_f64_oracle(self):
        rng = np.random.default_rng(0)
        logits, y = _rand(rng, 4, 9, 5, 7)
        il = np.array([9, 6, 8, 9])
        ul = np.array([5, 3, 0, 4])
        l_ref, g_ref = rnnt_logits_grad_ref(logits, y, il, ul)
        nll = rnnt_nll(logits, y, il, ul)
        np.testing.assert_allclose(np.asarray(nll), l_ref, atol=1e-4,
                                   rtol=4e-6)
        g = jax.grad(lambda x: jnp.sum(rnnt_nll(x, y, il, ul)))(
            jnp.asarray(logits))
        np.testing.assert_allclose(np.asarray(g), g_ref, atol=1e-4)
        # padded (t >= T_n, u > U_n) joint slices must get zero grad
        g_np = np.asarray(g)
        assert np.all(g_np[1, 6:] == 0.0)
        assert np.all(g_np[1, :, 4:] == 0.0)

    def test_log_probs_input_vs_f64_oracle(self):
        rng = np.random.default_rng(1)
        logits, y = _rand(rng, 3, 6, 3, 5)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        il = np.array([6, 6, 4])
        ul = np.array([3, 1, 2])
        l_ref, g_ref = rnnt_loss_ref(lp, y, il, ul)
        nll = rnnt_nll(lp, y, il, ul, from_logits=False)
        np.testing.assert_allclose(np.asarray(nll), l_ref, atol=1e-4,
                                   rtol=4e-6)
        g = jax.grad(lambda x: jnp.sum(
            rnnt_nll(x, y, il, ul, from_logits=False)))(jnp.asarray(lp))
        np.testing.assert_allclose(np.asarray(g), g_ref, atol=1e-4)

    def test_brute_force_paths_tiny(self):
        rng = np.random.default_rng(2)
        for _ in range(4):
            logits, y = _rand(rng, 1, 4, 2, 4)
            lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1),
                            np.float64)
            want = rnnt_loss_paths(lp[0], y[0])
            got = float(rnnt_nll(lp, y, [4], [2], from_logits=False)[0])
            assert abs(got - want) < 1e-5

    def test_torch_autograd_twin(self):
        rng = np.random.default_rng(3)
        logits, y = _rand(rng, 3, 8, 4, 6)
        il = np.array([8, 5, 7])
        ul = np.array([4, 4, 2])
        l_t, g_t = _torch_rnnt_nll(logits, y, il, ul)
        nll = rnnt_nll(logits, y, il, ul)
        np.testing.assert_allclose(np.asarray(nll), l_t, atol=1e-4,
                                   rtol=4e-6)
        g = jax.grad(lambda x: jnp.sum(rnnt_nll(x, y, il, ul)))(
            jnp.asarray(logits))
        np.testing.assert_allclose(np.asarray(g), g_t, atol=1e-4)

    def test_finite_differences(self):
        rng = np.random.default_rng(4)
        logits, y = _rand(rng, 1, 4, 2, 4)
        il, ul = [4], [2]
        g = np.asarray(jax.grad(
            lambda x: jnp.sum(rnnt_nll(x, y, il, ul)))(jnp.asarray(
                logits, jnp.float32)))
        eps = 1e-3
        rngc = np.random.default_rng(5)
        for _ in range(20):
            idx = tuple(rngc.integers(0, s) for s in logits.shape)
            p = logits.copy().astype(np.float64)
            m = logits.copy().astype(np.float64)
            p[idx] += eps
            m[idx] -= eps
            num = (rnnt_logits_grad_ref(p, y, il, ul)[0].sum()
                   - rnnt_logits_grad_ref(m, y, il, ul)[0].sum()) / (2 * eps)
            assert abs(num - g[idx]) < 1e-3


class TestSemantics:
    def test_u_longer_than_t_is_valid(self):
        # transducers may emit several labels per frame: U > T is legal
        rng = np.random.default_rng(6)
        logits, y = _rand(rng, 2, 3, 5, 6)
        il = np.array([3, 2])
        ul = np.array([5, 4])
        l_ref, _ = rnnt_logits_grad_ref(logits, y, il, ul)
        nll = rnnt_nll(logits, y, il, ul)
        assert np.all(np.isfinite(np.asarray(nll)))
        np.testing.assert_allclose(np.asarray(nll), l_ref, atol=1e-4,
                                   rtol=4e-6)

    def test_empty_target(self):
        rng = np.random.default_rng(7)
        logits, _ = _rand(rng, 1, 5, 2, 4)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1),
                        np.float64)
        # all-blank path probability
        want = -sum(lp[0, t, 0, 0] for t in range(5))
        got = float(rnnt_nll(lp, np.zeros((1, 2), np.int32), [5], [0],
                             from_logits=False)[0])
        assert abs(got - want) < 1e-5

    def test_padding_invariance(self):
        rng = np.random.default_rng(8)
        logits, y = _rand(rng, 2, 6, 3, 5)
        il = np.array([5, 6])
        ul = np.array([2, 3])
        base = np.asarray(rnnt_nll(logits, y, il, ul))
        # widen T and U padding with junk; answers must not move
        pad = rng.normal(size=(2, 9, 6, 5)).astype(np.float32)
        pad[:, :6, :4] = logits
        y_pad = np.concatenate([y, rng.integers(1, 5, size=(2, 2))], axis=1)
        padded = np.asarray(rnnt_nll(pad, y_pad, il, ul))
        np.testing.assert_allclose(padded, base, atol=1e-5)

    def test_reductions_and_module(self):
        rng = np.random.default_rng(9)
        logits, y = _rand(rng, 3, 5, 2, 4)
        il = np.array([5, 5, 4])
        ul = np.array([2, 1, 2])
        nll = np.asarray(rnnt_nll(logits, y, il, ul))
        assert abs(float(rnnt_loss(logits, y, il, ul, reduction="mean"))
                   - nll.mean()) < 1e-6
        assert abs(float(rnnt_loss(logits, y, il, ul, reduction="sum"))
                   - nll.sum()) < 1e-6
        np.testing.assert_allclose(
            np.asarray(rnnt_loss(logits, y, il, ul, reduction="none")), nll)
        mod = RNNTLoss(reduction="sum")
        assert abs(float(mod(logits, y, il, ul)) - nll.sum()) < 1e-6

    def test_jit_and_vmapability(self):
        rng = np.random.default_rng(10)
        logits, y = _rand(rng, 2, 5, 3, 4)
        il = np.array([5, 4])
        ul = np.array([3, 2])
        f = jax.jit(lambda x: rnnt_nll(x, y, il, ul))
        np.testing.assert_allclose(np.asarray(f(logits)),
                                   np.asarray(rnnt_nll(logits, y, il, ul)),
                                   atol=1e-6)

    def test_long_t_f32_stability(self):
        # renormalized wavefront must stay close to f64 at T in the hundreds
        rng = np.random.default_rng(11)
        n, t, u, v = 2, 300, 20, 16
        logits, y = _rand(rng, n, t, u, v)
        il = np.array([t, t - 7])
        ul = np.array([u, u - 3])
        l_ref, g_ref = rnnt_logits_grad_ref(logits, y, il, ul)
        nll = np.asarray(rnnt_nll(logits, y, il, ul))
        np.testing.assert_allclose(nll, l_ref, atol=1e-4, rtol=4e-6)
        g = np.asarray(jax.grad(
            lambda x: jnp.sum(rnnt_nll(x, y, il, ul)))(jnp.asarray(logits)))
        np.testing.assert_allclose(g, g_ref, atol=1e-4)

    def test_training_descends(self):
        rng = np.random.default_rng(12)
        logits, y = _rand(rng, 2, 6, 3, 5)
        il = np.array([6, 6])
        ul = np.array([3, 3])
        x = jnp.asarray(logits)
        fn = jax.jit(jax.value_and_grad(
            lambda x: rnnt_loss(x, y, il, ul, reduction="mean")))
        l0, g = fn(x)
        for _ in range(25):
            x = x - 0.5 * g
            l1, g = fn(x)
        assert float(l1) < float(l0) - 0.5


class TestValidation:
    def test_bad_shapes_raise(self):
        rng = np.random.default_rng(13)
        logits, y = _rand(rng, 1, 4, 3, 4)
        with pytest.raises(ValueError):
            rnnt_nll(logits[0], y, [4], [3])  # 3-D joint
        with pytest.raises(ValueError):
            rnnt_nll(logits, np.zeros((1, 5), np.int32), [4], [5])  # U+1 > Up
