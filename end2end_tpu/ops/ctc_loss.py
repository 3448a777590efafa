"""Public CTC loss API — mirrors the reference's `ctc_loss(...)` surface.

Contract (SURVEY.md §6.1, pinned from torch/nn/functional.py:3094-3167 of the
installed torch wheel, which BASELINE.json names as the parity oracle):

  ctc_loss(log_probs, targets, input_lengths, target_lengths,
           blank=0, reduction='mean', zero_infinity=False)

  * log_probs: (T, N, C) time-major, already log-softmaxed.
  * targets: (N, S) padded, or 1-D concatenated (unpacked at this layer —
    TPU kernels take dense padded labels only, like TF's TPU CTC).
  * reduction='mean' divides each sample's loss by max(target_length, 1),
    then averages over the batch; 'sum' sums; 'none' returns (N,).
  * zero_infinity zeroes infinite losses and their gradients.

Implementations: 'xla' (lax.scan, runs anywhere) and 'pallas' (fused TPU
kernel); 'auto' picks pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ctc_loss_xla import ctc_nll_xla
from .fastmath import log_softmax_acc

_IMPLEMENTATIONS = ("auto", "xla", "pallas")


def _unpack_flat_targets(targets, target_lengths, batch):
    """Convert 1-D concatenated targets to padded (N, S) at the host level."""
    targets = np.asarray(targets)
    lengths = np.asarray(target_lengths)
    s_max = int(lengths.max()) if lengths.size else 0
    out = np.zeros((batch, max(s_max, 1)), dtype=np.int32)
    off = 0
    for n in range(batch):
        ln = int(lengths[n])
        out[n, :ln] = targets[off : off + ln]
        off += ln
    return out


def _resolve_impl(implementation):
    if implementation not in _IMPLEMENTATIONS:
        raise ValueError(
            f"implementation must be one of {_IMPLEMENTATIONS}, got {implementation!r}"
        )
    if implementation != "auto":
        return implementation
    if jax.default_backend() == "tpu":
        try:  # pallas kernel present and importable?
            from . import ctc_loss_pallas  # noqa: F401

            return "pallas"
        except ImportError:
            return "xla"
    return "xla"


def ctc_nll(log_probs, targets, input_lengths, target_lengths, blank=0,
            implementation="auto", checkpoint_every=0):
    """Per-sample negative log likelihood (reduction='none', no zero_infinity).

    checkpoint_every > 0 bounds the alpha-rematerialization interval: on the
    XLA path it selects the chunked long-T scan (alpha memory O(T/K + K));
    on the pallas path it caps the kernel chunk length (which IS the
    checkpoint interval — the kernels never materialize the alpha tape)."""
    impl = _resolve_impl(implementation)
    if impl == "pallas":
        from .ctc_loss_pallas import ctc_nll_pallas, fits_vmem

        s_max = jnp.shape(targets)[-1]
        lp_lanes = -(-(2 * s_max + 1) // 128) * 128
        b_pad = -(-jnp.shape(log_probs)[1] // 8) * 8
        if not fits_vmem(b_pad, lp_lanes):
            if implementation == "auto":
                return ctc_nll_xla(
                    log_probs, targets, input_lengths, target_lengths, blank,
                    checkpoint_every,
                )
            raise ValueError(
                f"pallas CTC kernels cannot host batch={b_pad} x lattice="
                f"{lp_lanes} in VMEM; use implementation='xla' (or 'auto') "
                "or shard the batch"
            )
        return ctc_nll_pallas(
            log_probs, targets, input_lengths, target_lengths, blank,
            int(checkpoint_every),
        )
    return ctc_nll_xla(
        log_probs, targets, input_lengths, target_lengths, blank, checkpoint_every
    )


def ctc_loss(
    log_probs,
    targets,
    input_lengths,
    target_lengths,
    blank: int = 0,
    reduction: str = "mean",
    zero_infinity: bool = False,
    implementation: str = "auto",
    checkpoint_every: int = 0,
    from_logits: bool = False,
    batch_first: bool = False,
):
    """CTC loss with torch.nn.CTCLoss-compatible semantics.  Jit-friendly:
    all options are static; lengths are data (no recompiles across lengths).

    `from_logits=True` applies `log_softmax` over the vocab axis first (the
    reference's CTCLoss took raw network outputs and normalized internally —
    SURVEY.md §3.2 P1 "optional log_softmax"; gradients flow through the
    softmax).  `batch_first=True` accepts (N, T, C) activations (the
    reference's non-time-major layout) and transposes to torch's (T, N, C).

    Infeasible samples (target cannot fit in input_length frames) score
    +inf like torch.  One deliberate divergence: with zero_infinity=False
    their GRADIENTS stay finite here (the fused exp(lp + alpha + beta -
    loss) backward underflows against loss = inf), where torch propagates
    NaN through inf.backward().  Both are conventions over an undefined
    quantity; finite grads never poison the rest of the batch."""
    if reduction not in ("none", "mean", "sum"):
        raise ValueError(f"invalid reduction {reduction!r}")
    log_probs = jnp.asarray(log_probs)
    if log_probs.ndim != 3:
        raise ValueError(f"log_probs must be (T, N, C); got {log_probs.shape}")
    if batch_first:
        log_probs = jnp.swapaxes(log_probs, 0, 1)
    if log_probs.dtype in (jnp.bfloat16, jnp.float16):
        # kernels compute in f32; custom-VJP grads come back in f32 and are
        # cast to the caller's dtype by the autodiff convert rule
        log_probs = log_probs.astype(jnp.float32)
    if from_logits:
        log_probs = log_softmax_acc(log_probs, axis=-1)
    n = log_probs.shape[1]
    if not isinstance(targets, jax.core.Tracer) and np.asarray(targets).ndim == 1:
        targets = _unpack_flat_targets(targets, target_lengths, n)
    targets = jnp.asarray(targets, dtype=jnp.int32)
    input_lengths = jnp.asarray(input_lengths, dtype=jnp.int32)
    target_lengths = jnp.asarray(target_lengths, dtype=jnp.int32)

    nll = ctc_nll(
        log_probs, targets, input_lengths, target_lengths, blank, implementation,
        checkpoint_every,
    )
    if zero_infinity:
        nll = jnp.where(jnp.isinf(nll), 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    denom = jnp.maximum(target_lengths, 1).astype(nll.dtype)
    return jnp.mean(nll / denom)


class CTCLoss:
    """Module-style wrapper mirroring the reference's `CTCLoss` nn.Module
    (SURVEY.md §3.2 P1).  Stateless; holds the static configuration."""

    def __init__(self, blank=0, reduction="mean", zero_infinity=False,
                 implementation="auto", from_logits=False, batch_first=False):
        self.blank = blank
        self.reduction = reduction
        self.zero_infinity = zero_infinity
        self.implementation = implementation
        self.from_logits = from_logits
        self.batch_first = batch_first

    def __call__(self, log_probs, targets, input_lengths, target_lengths):
        return ctc_loss(
            log_probs,
            targets,
            input_lengths,
            target_lengths,
            blank=self.blank,
            reduction=self.reduction,
            zero_infinity=self.zero_infinity,
            implementation=self.implementation,
            from_logits=self.from_logits,
            batch_first=self.batch_first,
        )


def ctc_loss_jit(blank=0, reduction="mean", zero_infinity=False,
                 implementation="auto", checkpoint_every=0,
                 from_logits=False, batch_first=False):
    """Return a jitted ctc_loss closure with the static options baked in."""
    return jax.jit(
        partial(
            ctc_loss,
            blank=blank,
            reduction=reduction,
            zero_infinity=zero_infinity,
            implementation=implementation,
            checkpoint_every=checkpoint_every,
            from_logits=from_logits,
            batch_first=batch_first,
        )
    )
