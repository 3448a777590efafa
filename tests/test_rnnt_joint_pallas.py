"""Online-softmax fused joint kernel vs the bf16 XLA reference.

The kernel's numerics budget is bf16 logit storage (module docstring),
so the oracle here is the SAME joint computed with bf16-quantized
matmuls in plain XLA, materialized, through `rnnt_nll` — value parity
~1e-3 relative and gradient cosine alignment, plus invariance checks
(variable lengths, nonzero blank, V not a multiple of the tile).
"""

import jax
import jax.numpy as jnp
import numpy as np

from end2end_tpu.ops.rnnt_joint_pallas import rnnt_nll_fused_pallas
from end2end_tpu.ops.rnnt_loss import rnnt_nll


def _setup(seed, n=2, t=7, u=3, v=11, j=8):
    rng = np.random.default_rng(seed)
    enc_p = jnp.asarray(rng.normal(size=(n, t, j)).astype(np.float32))
    pred_p = jnp.asarray(rng.normal(size=(n, u + 1, j)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(j, v)) / np.sqrt(j))
                    .astype(np.float32))
    b = jnp.asarray(0.1 * rng.normal(size=(v,)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(1, v, (n, u)).astype(np.int32))
    il = jnp.asarray(np.array([t, t - 2], np.int32)[:n])
    ul = jnp.asarray(np.array([u, 1], np.int32)[:n])
    return enc_p, pred_p, w, b, tgt, il, ul


def _ref_bf16(enc_p, pred_p, w, b, tgt, il, ul, blank=0):
    """Materialized joint with bf16-quantized matmul, plain XLA."""
    h = jnp.tanh(enc_p[:, :, None, :] + pred_p[:, None, :, :])
    logits = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b
    return rnnt_nll(logits, tgt, il, ul, blank=blank)


class TestJointPlanesParity:
    def test_value_close_to_bf16_reference(self):
        enc_p, pred_p, w, b, tgt, il, ul = _setup(0)
        got = rnnt_nll_fused_pallas(enc_p, pred_p, w, b, tgt, il, ul)
        ref = _ref_bf16(enc_p, pred_p, w, b, tgt, il, ul)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_nonzero_blank_and_ragged_v(self):
        # v = 11 is far from the 512 tile; also exercise blank != 0
        enc_p, pred_p, w, b, tgt, il, ul = _setup(1, v=13)
        tgt = jnp.where(tgt == 5, 6, tgt)          # keep blank out
        got = rnnt_nll_fused_pallas(enc_p, pred_p, w, b, tgt, il, ul,
                                    blank=5)
        ref = _ref_bf16(enc_p, pred_p, w, b, tgt, il, ul, blank=5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_grads_aligned_with_bf16_reference(self):
        enc_p, pred_p, w, b, tgt, il, ul = _setup(2)

        def tot_pl(e, p, ww, bb):
            return jnp.sum(rnnt_nll_fused_pallas(e, p, ww, bb, tgt, il,
                                                 ul))

        def tot_ref(e, p, ww, bb):
            return jnp.sum(_ref_bf16(e, p, ww, bb, tgt, il, ul))

        g_pl = jax.grad(tot_pl, argnums=(0, 1, 2, 3))(enc_p, pred_p, w, b)
        g_rf = jax.grad(tot_ref, argnums=(0, 1, 2, 3))(enc_p, pred_p, w, b)
        for a, c, name in zip(g_pl, g_rf, ("enc", "pred", "w", "b")):
            a = np.asarray(a).ravel()
            c = np.asarray(c).ravel()
            cos = float(a @ c / (np.linalg.norm(a) * np.linalg.norm(c)
                                 + 1e-30))
            assert cos > 0.995, f"{name}: cos={cos}"
            # the kernel also quantizes the backward matmul inputs
            # to bf16 (the reference keeps f32 cotangents) -> ~1e-2 budget
            np.testing.assert_allclose(a, c, atol=1.5e-2)

    def test_training_descends(self):
        enc_p, pred_p, w, b, tgt, il, ul = _setup(3)

        def loss(ww):
            return jnp.mean(rnnt_nll_fused_pallas(enc_p, pred_p, ww, b,
                                                  tgt, il, ul))

        l0 = float(loss(w))
        step = jax.jit(lambda ww: ww - 0.1 * jax.grad(loss)(ww))
        for _ in range(10):
            w = step(w)
        assert float(loss(w)) < l0 - 0.05


class TestVocabParallelKernel:
    """TP variant of the online-softmax kernel: sharded == unsharded.

    The per-shard tile walk is bit-identical to the single-device kernel
    (same bf16 products, same f32 tile accumulation); only the cross-tile
    (max, sum-exp) combine order differs, so value+grads must agree to f32
    roundoff — tolerances here are 1e-4-grade, NOT the bf16 1e-2 budget.
    """

    def _mesh(self, d=4):
        import pytest
        from jax.sharding import Mesh

        if len(jax.devices()) < d:
            pytest.skip(f"needs >= {d} devices")
        return Mesh(np.asarray(jax.devices()[:d]), ("model",))

    def _parity(self, seed, v, blank=0, d=4, n=2, t=7, u=3, j=8):
        from end2end_tpu.ops.rnnt_joint_pallas import (
            rnnt_nll_fused_pallas_vocab_parallel)

        mesh = self._mesh(d)
        enc_p, pred_p, w, b, tgt, il, ul = _setup(seed, n=n, t=t, u=u,
                                                  v=v, j=j)
        if blank:
            tgt = jnp.where(tgt == blank, (blank + 1) % v, tgt)

        def l_ref(e, p, ww, bb):
            return jnp.sum(rnnt_nll_fused_pallas(e, p, ww, bb, tgt, il, ul,
                                                 blank=blank))

        def l_tp(e, p, ww, bb):
            return jnp.sum(rnnt_nll_fused_pallas_vocab_parallel(
                e, p, ww, bb, tgt, il, ul, mesh, blank=blank))

        v_ref, g_ref = jax.value_and_grad(l_ref, argnums=(0, 1, 2, 3))(
            enc_p, pred_p, w, b)
        v_tp, g_tp = jax.value_and_grad(l_tp, argnums=(0, 1, 2, 3))(
            enc_p, pred_p, w, b)
        np.testing.assert_allclose(float(v_tp), float(v_ref), rtol=0,
                                   atol=2e-4)
        for a, c, name in zip(g_ref, g_tp, ("enc_proj", "pred_proj",
                                            "w_out", "b_out")):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(a), rtol=0, atol=5e-4,
                err_msg=f"TP-kernel gradient mismatch for {name}")

    def test_tp_matches_unsharded_kernel(self):
        self._parity(seed=4, v=16)

    def test_tp_blank_owned_by_middle_device(self):
        # v=16 over 4 devices -> v_loc=4; blank=9 lives on device 2, so the
        # raw-blank psum and the lane==rel_blank bwd path cross shards.
        self._parity(seed=5, v=16, blank=9)

    def test_tp_value_close_to_f32_reference(self):
        # absolute sanity vs the f32 materialized path (bf16 budget)
        from end2end_tpu.ops.rnnt_joint_pallas import (
            rnnt_nll_fused_pallas_vocab_parallel)

        mesh = self._mesh(4)
        enc_p, pred_p, w, b, tgt, il, ul = _setup(6, v=12)
        got = rnnt_nll_fused_pallas_vocab_parallel(
            enc_p, pred_p, w, b, tgt, il, ul, mesh)
        ref = _ref_bf16(enc_p, pred_p, w, b, tgt, il, ul)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_tp_rejects_indivisible_vocab(self):
        import pytest

        from end2end_tpu.ops.rnnt_joint_pallas import (
            rnnt_nll_fused_pallas_vocab_parallel)

        mesh = self._mesh(4)
        with pytest.raises(ValueError, match="divide"):
            rnnt_nll_fused_pallas_vocab_parallel(
                jnp.zeros((1, 4, 3)), jnp.zeros((1, 3, 3)),
                jnp.zeros((3, 9)), jnp.zeros((9,)),
                jnp.zeros((1, 2), jnp.int32), jnp.array([4]),
                jnp.array([2]), mesh)
