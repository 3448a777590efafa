"""XLA scan CTC loss vs torch.nn.CTCLoss and the float64 NumPy oracle.

SURVEY.md §5.2 items 1-3: parity on the BASELINE.json configs (scaled-down
where needed for CPU test time), all reductions, zero_infinity, repeated
labels, variable lengths, nonzero blank.

Gradient comparison policy: both torch-f32 and jax-f32 accumulate differently,
so for longer lattices we compare BOTH against the float64 NumPy oracle and
require the jax error to be within a small factor of the torch error (plus a
floor), rather than demanding bit-level f32 agreement (SURVEY.md §9 "hard
parts": bit-for-bit across backends is not a real target; BASELINE.json
operationalizes parity as <1e-4 max loss deviation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from end2end_tpu import ctc_loss
from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla
from end2end_tpu.utils.reference_impl import ctc_loss_ref
from tests.conftest import random_ctc_problem


def torch_loss_grad(lp_np, tgt, il, tl, blank=0, reduction="none", zero_infinity=False):
    lp = torch.tensor(lp_np, requires_grad=True)
    loss = torch.nn.functional.ctc_loss(
        lp,
        torch.tensor(np.asarray(tgt), dtype=torch.long),
        torch.tensor(np.asarray(il), dtype=torch.long),
        torch.tensor(np.asarray(tl), dtype=torch.long),
        blank=blank,
        reduction=reduction,
        zero_infinity=zero_infinity,
    )
    total = loss.sum() if reduction == "none" else loss
    total.backward()
    return loss.detach().numpy(), lp.grad.numpy()


def jax_loss_grad(lp, tgt, il, tl, blank=0):
    @jax.jit
    def f(x):
        nll = ctc_nll_xla(x, tgt, il, tl, blank)
        grad = jax.grad(lambda y: jnp.sum(ctc_nll_xla(y, tgt, il, tl, blank)))(x)
        return nll, grad

    nll, grad = f(jnp.asarray(lp))
    return np.asarray(nll), np.asarray(grad)


@pytest.mark.parametrize(
    "B,T,S,V",
    [
        (4, 50, 20, 29),   # BASELINE config 1 exactly
        (8, 120, 30, 29),  # LibriSpeech-style, scaled down
        (8, 64, 16, 96),   # OCR-style
        (4, 96, 12, 128),  # BPE-style
    ],
)
def test_loss_grad_parity_f32(rng, B, T, S, V):
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    j_loss, j_grad = jax_loss_grad(lp, tgt, il, tl)
    t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl)
    ref_loss, ref_grad = ctc_loss_ref(lp.astype(np.float64), tgt, il, tl)
    # The BASELINE.json headline accuracy bar:
    np.testing.assert_allclose(j_loss, t_loss, rtol=1e-5, atol=1e-4)
    # Gradient: jax-f32 error vs f64 oracle must be comparable to torch-f32's.
    j_err = np.max(np.abs(j_grad - ref_grad))
    t_err = np.max(np.abs(t_grad - ref_grad))
    assert j_err <= max(3.0 * t_err, 2e-5), (j_err, t_err)
    np.testing.assert_allclose(j_grad, t_grad, rtol=1e-3, atol=3e-4)


def test_loss_grad_vs_numpy_oracle_f64(rng):
    if jax.default_backend() == "tpu":
        pytest.skip("TPU has no float64 (enable_x64 computes in f32 there)")
    B, T, S, V = 3, 40, 10, 17
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V, dtype=np.float64)
    with jax.enable_x64(True):
        j_loss, j_grad = jax_loss_grad(lp, tgt, il, tl)
        ref_loss, ref_grad = ctc_loss_ref(lp, tgt, il, tl)
        np.testing.assert_allclose(j_loss, ref_loss, rtol=1e-9)
        np.testing.assert_allclose(j_grad, ref_grad, rtol=1e-8, atol=1e-12)


def test_repeated_labels_and_blank(rng):
    B, T, V = 2, 20, 6
    lp, _, _, _ = random_ctc_problem(rng, B, T, 4, V)
    tgt = np.array([[2, 2, 2, 2], [1, 1, 3, 3]], dtype=np.int32)
    tl = np.array([4, 4], dtype=np.int32)
    il = np.array([20, 15], dtype=np.int32)
    for blank in (0, 5):
        j_loss, j_grad = jax_loss_grad(lp, tgt, il, tl, blank)
        t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl, blank=blank)
        np.testing.assert_allclose(j_loss, t_loss, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(j_grad, t_grad, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
def test_reductions_match_torch(rng, reduction):
    B, T, S, V = 5, 30, 8, 12
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    tl[0] = 0  # include an empty target (mean divides by clamp(tl, 1))

    @jax.jit
    def f(x):
        loss = ctc_loss(x, tgt, il, tl, reduction=reduction, implementation="xla")
        grad = jax.grad(
            lambda y: jnp.sum(
                ctc_loss(y, tgt, il, tl, reduction=reduction, implementation="xla")
            )
        )(x)
        return loss, grad

    loss, grad = f(jnp.asarray(lp))
    t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl, reduction=reduction)
    np.testing.assert_allclose(np.asarray(loss), t_loss, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad), t_grad, rtol=1e-4, atol=1e-4)


def test_zero_infinity(rng):
    # Sample 0: impossible alignment (repeated labels need more frames).
    T, B, V = 4, 2, 5
    lp = np.log(np.full((T, B, V), 1.0 / V, dtype=np.float32))
    tgt = np.array([[1, 1, 1], [2, 3, 0]], dtype=np.int32)
    il = np.array([4, 4], dtype=np.int32)
    tl = np.array([3, 2], dtype=np.int32)

    def make(zi):
        @jax.jit
        def f(x):
            loss = ctc_loss(
                x, tgt, il, tl, reduction="none", zero_infinity=zi, implementation="xla"
            )
            grad = jax.grad(
                lambda y: jnp.sum(
                    ctc_loss(
                        y, tgt, il, tl, reduction="none", zero_infinity=zi, implementation="xla"
                    )
                )
            )(x)
            return loss, grad

        return f

    loss_none, _ = make(False)(jnp.asarray(lp))
    assert np.isinf(np.asarray(loss_none)[0]) and np.isfinite(np.asarray(loss_none)[1])

    loss_zi, grad_zi = make(True)(jnp.asarray(lp))
    t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl, zero_infinity=True)
    np.testing.assert_allclose(
        np.asarray(loss_zi), np.where(np.isinf(t_loss), 0.0, t_loss), rtol=1e-5
    )
    assert np.all(np.asarray(grad_zi)[:, 0, :] == 0.0)
    np.testing.assert_allclose(np.asarray(grad_zi)[:, 1], t_grad[:, 1], rtol=1e-4, atol=1e-4)


def test_flat_1d_targets(rng):
    B, T, S, V = 3, 25, 6, 10
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    flat = np.concatenate([tgt[n, : tl[n]] for n in range(B)])
    loss_flat = jax.jit(
        lambda x: ctc_loss(x, flat, il, tl, reduction="none", implementation="xla")
    )(jnp.asarray(lp))
    loss_pad = jax.jit(
        lambda x: ctc_loss(x, tgt, il, tl, reduction="none", implementation="xla")
    )(jnp.asarray(lp))
    np.testing.assert_allclose(np.asarray(loss_flat), np.asarray(loss_pad), rtol=1e-6)


def test_zero_target_length_grad(rng):
    B, T, S, V = 2, 10, 3, 6
    lp, tgt, il, _ = random_ctc_problem(rng, B, T, S, V)
    tl = np.array([0, 2], dtype=np.int32)
    j_loss, j_grad = jax_loss_grad(lp, tgt, il, tl)
    t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl)
    np.testing.assert_allclose(j_loss, t_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(j_grad, t_grad, rtol=1e-4, atol=1e-4)


def test_padding_invariance(rng):
    """Padding T or S further must not change results (bucketing soundness)."""
    B, T, S, V = 3, 20, 6, 11
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    loss1, g1 = jax_loss_grad(lp, tgt, il, tl)
    lp_pad = np.concatenate([lp, rng.standard_normal((7, B, V)).astype(np.float32)], 0)
    tgt_pad = np.concatenate([tgt, rng.integers(1, V, (B, 4)).astype(np.int32)], 1)
    loss2, g2 = jax_loss_grad(lp_pad, tgt_pad, il, tl)
    np.testing.assert_allclose(loss1, loss2, rtol=1e-6)
    np.testing.assert_allclose(g1, g2[:T], rtol=1e-5, atol=1e-6)
    assert np.all(g2[T:] == 0.0)


def test_jit_cache_reuse_across_lengths(rng):
    """Lengths are data, not shapes: one compile serves all length vectors."""
    B, T, S, V = 2, 15, 4, 7
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    f = jax.jit(
        lambda x, il_, tl_: ctc_loss(x, tgt, il_, tl_, reduction="none", implementation="xla")
    )
    f(jnp.asarray(lp), il, tl)
    il2 = np.maximum(il - 3, 1).astype(np.int32)
    tl2 = np.maximum(tl - 1, 1).astype(np.int32)
    f(jnp.asarray(lp), il2, tl2)
    assert f._cache_size() == 1


@pytest.mark.parametrize("every", [4, 7, 30, 64])
def test_checkpointed_remat_matches_full(rng, every):
    """checkpoint_every must not change loss or grad (only memory/compute)."""
    B, T, S, V = 3, 30, 7, 11
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)

    @jax.jit
    def full(x):
        nll = ctc_nll_xla(x, tgt, il, tl, 0)
        g = jax.grad(lambda y: jnp.sum(ctc_nll_xla(y, tgt, il, tl, 0)))(x)
        return nll, g

    def make_ckpt(k):
        @jax.jit
        def f(x):
            nll = ctc_nll_xla(x, tgt, il, tl, 0, k)
            g = jax.grad(lambda y: jnp.sum(ctc_nll_xla(y, tgt, il, tl, 0, k)))(x)
            return nll, g

        return f

    nll0, g0 = map(np.asarray, full(jnp.asarray(lp)))
    nll1, g1 = map(np.asarray, make_ckpt(every)(jnp.asarray(lp)))
    np.testing.assert_allclose(nll1, nll0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-7)


def test_bf16_inputs_accepted(rng):
    """bf16 log-probs upcast internally; loss matches f32 to bf16 tolerance."""
    B, T, S, V = 2, 20, 5, 8
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    f32 = ctc_loss(lp, tgt, il, tl, reduction="none", implementation="xla")
    bf = ctc_loss(
        jnp.asarray(lp, jnp.bfloat16), tgt, il, tl, reduction="none",
        implementation="xla",
    )
    np.testing.assert_allclose(np.asarray(bf), np.asarray(f32), rtol=2e-2, atol=0.3)
    g = jax.grad(
        lambda x: jnp.sum(
            ctc_loss(x, tgt, il, tl, reduction="none", implementation="xla")
        )
    )(jnp.asarray(lp, jnp.bfloat16))
    assert g.dtype == jnp.bfloat16


def test_fuzz_random_shapes_vs_torch(rng):
    """Randomized sweep: shapes, blanks, lengths, repeats — loss + grad must
    track torch across the board (broad shallow net under the targeted tests)."""
    for trial in range(8):
        B = int(rng.integers(1, 6))
        T = int(rng.integers(4, 40))
        S = int(rng.integers(1, max(2, T // 3)))
        V = int(rng.integers(3, 40))
        blank = int(rng.integers(0, V))
        lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
        # labels must avoid the blank id
        tgt = np.where(tgt == blank, (blank + 1) % V, tgt).astype(np.int32)
        j_loss, j_grad = jax_loss_grad(lp, tgt, il, tl, blank)
        t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl, blank=blank)
        np.testing.assert_allclose(
            j_loss, t_loss, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: B={B},T={T},S={S},V={V},blank={blank}",
        )
        np.testing.assert_allclose(
            j_grad, t_grad, rtol=1e-3, atol=3e-4,
            err_msg=f"trial {trial}: B={B},T={T},S={S},V={V},blank={blank}",
        )


def test_compact_emission_and_posterior_match_reference_paths(rng):
    """The production-vocab (label-compacted) one-hot paths — used on TPU
    above the dense-one-hot size caps — must equal the gather / scatter
    forms exactly, including duplicate labels and padded targets."""
    import jax.numpy as jnp

    from end2end_tpu.ops.ctc_common import (
        _lp_ext_compact, build_ctc_tables, gather_lp_ext,
    )
    from end2end_tpu.ops.ctc_loss_xla import (
        _posterior_matmul_compact, _posterior_scatter,
    )

    B, T, S, V, blank = 3, 12, 6, 11, 0
    lp = rng.standard_normal((T, B, V)).astype(np.float32)
    targets = rng.integers(1, V, (B, S)).astype(np.int32)
    targets[0, 2] = targets[0, 1]  # duplicate labels must accumulate
    tl = np.array([S, 3, 1], np.int32)
    tables = build_ctc_tables(jnp.asarray(targets), jnp.asarray(tl), blank, V)

    want = np.asarray(gather_lp_ext(jnp.asarray(lp), tables, lanes=128))
    got = np.asarray(_lp_ext_compact(jnp.asarray(lp), tables, 128))
    np.testing.assert_array_equal(got, want)

    L = tables.ext_labels.shape[1]
    gamma = rng.random((T, B, L)).astype(np.float32)
    gamma = gamma * np.asarray(tables.valid, np.float32)[None]
    want_p = np.asarray(_posterior_scatter(
        jnp.asarray(gamma), jnp.asarray(targets), blank, V))
    got_p = np.asarray(_posterior_matmul_compact(
        jnp.asarray(gamma), jnp.asarray(targets), blank, V))
    np.testing.assert_allclose(got_p, want_p, atol=1e-6, rtol=1e-6)


def test_from_logits_batch_first_vs_torch(rng):
    """Raw-logit input (from_logits=True, gradient flowing through the
    internal log_softmax) and batch-first layout match the torch
    composition log_softmax(logits) -> ctc_loss, gradients w.r.t. the
    LOGITS (the reference's CTCLoss normalized raw network outputs
    internally — SURVEY.md §3.2 P1)."""
    B, T, S, V = 5, 60, 18, 23
    logits = (rng.standard_normal((T, B, V)) * 2).astype(np.float32)
    _, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)

    x = torch.tensor(logits, requires_grad=True)
    t_loss = torch.nn.functional.ctc_loss(
        torch.nn.functional.log_softmax(x, dim=-1),
        torch.tensor(np.asarray(tgt), dtype=torch.long),
        torch.tensor(np.asarray(il), dtype=torch.long),
        torch.tensor(np.asarray(tl), dtype=torch.long),
        reduction="mean", zero_infinity=True,
    )
    t_loss.backward()

    def f(y):
        return ctc_loss(y, tgt, il, tl, reduction="mean", zero_infinity=True,
                        from_logits=True, batch_first=True)

    j_loss, j_grad = jax.jit(jax.value_and_grad(f))(
        jnp.asarray(np.swapaxes(logits, 0, 1)))
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.swapaxes(np.asarray(j_grad), 0, 1),
                               x.grad.numpy(), rtol=1e-3, atol=3e-4)
