"""Full-size BASELINE.json config parity vs torch.nn.CTCLoss.

SURVEY.md §5.2 item 1 at the EXACT config sizes: loss AND input-gradient
parity per config (gradients are additionally cross-checked at full size
pallas-vs-xla on the chip by scripts/parity_sweep.py and vs torch at
scaled sizes in test_ctc_loss_xla).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla
from tests.conftest import random_ctc_problem

CONFIGS = {
    "synthetic-char": (4, 50, 20, 29),
    "librispeech-char": (32, 1000, 200, 29),
    "ocr": (64, 256, 64, 96),
    "bpe-asr": (16, 1500, 150, 1024),
    "metric": (32, 1000, 100, 1024),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_full_config_loss_parity(rng, name):
    B, T, S, V = CONFIGS[name]
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)

    f = jax.jit(lambda x: ctc_nll_xla(x, tgt, il, tl, 0))
    j_loss = np.asarray(f(jnp.asarray(lp))).astype(np.float64)

    t_loss = torch.nn.functional.ctc_loss(
        torch.tensor(lp),
        torch.tensor(tgt, dtype=torch.long),
        torch.tensor(il, dtype=torch.long),
        torch.tensor(tl, dtype=torch.long),
        blank=0,
        reduction="none",
    ).numpy().astype(np.float64)

    # Absolute tolerance scales with the f32 ulp of the loss magnitude —
    # both sides are f32; at T=1500 losses reach ~1e4 where one ulp is ~1e-3.
    ulp = np.spacing(np.abs(t_loss).max().astype(np.float32)).astype(np.float64)
    atol = max(1e-4, 20 * ulp)
    np.testing.assert_allclose(j_loss, t_loss, rtol=2e-6, atol=atol)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_full_config_grad_parity(rng, name):
    """Input-gradient parity at the EXACT config sizes (§5.2 item 1; grads
    were previously asserted vs torch only at scaled sizes).

    A flat jax-vs-torch atol of 1e-4 is PHYSICALLY IMPOSSIBLE at full size:
    torch's own f32 gradient deviates from the float64 truth by up to 0.023
    at the bpe-asr config (T=1500; measured 2026-08-20 — the unrenormalized
    beta scan accumulates f32 error in T), so any f32 implementation can
    only be 1e-4-close to torch if it reproduces torch's ERROR.  The
    meaningful full-size contract, asserted here against an f64 ground
    truth (the same scan in float64 on CPU, itself 1e-8-verified against
    the NumPy oracle in test_ctc_loss_xla):

      1. our f32 gradient is at least as accurate as torch-f32, and
      2. within 1e-4 of the truth wherever torch is too (so at configs
         where f32 error is small, both reduce to the plain atol-1e-4
         parity the spec asks for)."""
    B, T, S, V = CONFIGS[name]
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)

    f = jax.jit(jax.grad(lambda x: jnp.sum(ctc_nll_xla(x, tgt, il, tl, 0))))
    j_grad = np.asarray(f(jnp.asarray(lp))).astype(np.float64)

    lp_t = torch.tensor(lp, requires_grad=True)
    loss = torch.nn.functional.ctc_loss(
        lp_t,
        torch.tensor(tgt, dtype=torch.long),
        torch.tensor(il, dtype=torch.long),
        torch.tensor(tl, dtype=torch.long),
        blank=0,
        reduction="sum",
    )
    loss.backward()
    t_grad = lp_t.grad.numpy().astype(np.float64)

    # f64 ground truth on CPU (the TPU has no f64).
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True):
        g64 = jax.jit(
            jax.grad(lambda x: jnp.sum(ctc_nll_xla(x, tgt, il, tl, 0)))
        )(jax.device_put(lp.astype(np.float64), cpu))
    g64 = np.asarray(g64)

    jax_err = float(np.abs(j_grad - g64).max())
    torch_err = float(np.abs(t_grad - g64).max())
    assert jax_err <= max(1e-4, torch_err), (
        f"{name}: jax f32 grad error vs f64 truth {jax_err:.2e} exceeds both "
        f"1e-4 and torch's own error {torch_err:.2e}")
    # Direct parity at the spec tolerance wherever torch itself is accurate.
    if torch_err <= 5e-5:
        np.testing.assert_allclose(j_grad, t_grad, rtol=1e-3, atol=1e-4)
