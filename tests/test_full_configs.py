"""Full-size BASELINE.json config parity vs torch.nn.CTCLoss.

SURVEY.md §5.2 item 1 at the EXACT config sizes (loss; gradients are
cross-checked at full size pallas-vs-xla on the chip by
scripts/parity_sweep.py and vs torch at scaled sizes in test_ctc_loss_xla).
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
