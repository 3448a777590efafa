"""Log-semiring primitives shared by the CTC loss and decoders.

The CTC forward-backward dynamic program and prefix beam search both operate in
the log semiring ``(⊕ = logaddexp, ⊗ = +)``.  On TPU we avoid ``-inf``
arithmetic entirely (``-inf - -inf -> nan`` inside masked lanes) by using a
large *finite* "log zero" sentinel, the same trick TF's TPU CTC uses
(tensorflow/python/ops/ctc_ops.py:577 uses ``log_0 ≈ -709``; we use a far
larger magnitude so that sums of many log-zeros stay unambiguously below any
reachable log-probability).  See SURVEY.md §6.2 / §9 "hard parts".
"""

from __future__ import annotations

import jax.numpy as jnp

# Finite stand-in for log(0).  Any lattice value below LOG0_THRESHOLD is
# treated as "impossible".  exp(LOG0) == 0 exactly in float32.
LOG0 = -1.0e30
LOG0_THRESHOLD = -1.0e29


def logaddexp2(a, b):
    """Numerically stable ``log(exp(a) + exp(b))`` with finite log-zeros."""
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, LOG0)  # keep subtraction finite
    out = m_safe + jnp.log1p(jnp.exp(-jnp.abs(a - b)))
    # If both inputs are log-zero the result is log-zero.
    return jnp.where(m > LOG0_THRESHOLD, out, LOG0)


def logaddexp3(a, b, c):
    """Stable 3-way logaddexp in the finite-log-zero convention.

    This is the inner operation of the CTC alpha/beta recurrences
    (SURVEY.md §4.1): each lattice cell combines up to three predecessors.
    """
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, LOG0)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m > LOG0_THRESHOLD, out, LOG0)


def safe_clamp(x):
    """Clamp log-domain values into the finite representable band."""
    return jnp.maximum(x, LOG0)
