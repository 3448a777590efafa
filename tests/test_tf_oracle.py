"""Second oracle: tf.nn.ctc_loss (SURVEY.md §5.2 item 2).

Catches bug classes the torch oracle might share with our mental model.
TF's ctc_loss computes the gradient wrt LOGITS (through the softmax), whereas
ours/torch's is wrt log-probs; feeding log-softmax outputs as "logits" makes
the losses directly comparable.  For gradients, both frameworks are
differentiated wrt the SAME raw logits — ours composed as
`ctc_loss(log_softmax(logits))` (JAX chains the fused custom_vjp through the
log-softmax Jacobian), TF via GradientTape on `tf.nn.ctc_loss(logits)` —
so the logits-gradients must agree exactly.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from end2end_tpu.utils.reference_impl import ctc_loss_ref
from tests.conftest import random_ctc_problem


def test_loss_matches_tf(rng):
    B, T, S, V = 4, 30, 8, 12
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V, dtype=np.float64)
    losses, _ = ctc_loss_ref(lp, tgt, il, tl, blank=0)

    # TF wants batch-major labels with its blank configured; logits time-major
    # with logits_time_major=True.  blank_index=0 matches our convention.
    tf_loss = tf.nn.ctc_loss(
        labels=tf.constant(tgt, tf.int32),
        logits=tf.constant(lp.astype(np.float32), tf.float32),
        label_length=tf.constant(tl, tf.int32),
        logit_length=tf.constant(il, tf.int32),
        logits_time_major=True,
        blank_index=0,
    ).numpy()
    np.testing.assert_allclose(losses, tf_loss, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("implementation", ["xla", "pallas"])
def test_logits_gradient_matches_tf(rng, implementation):
    # Differentiate BOTH frameworks wrt the same raw (un-normalized) logits:
    # the second oracle for the fused backward pass, independent of torch.
    import jax
    import jax.numpy as jnp

    from end2end_tpu import ctc_loss

    B, T, S, V = 4, 24, 7, 12
    rngl = np.random.default_rng(7)
    logits = rngl.standard_normal((T, B, V)).astype(np.float32) * 2.0
    tgt = rngl.integers(1, V, (B, S)).astype(np.int32)
    il = np.full(B, T, np.int32)
    tl = rngl.integers(3, S + 1, B).astype(np.int32)

    def total_loss(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(lp, jnp.asarray(tgt), jnp.asarray(il),
                        jnp.asarray(tl), reduction="sum",
                        implementation=implementation)

    jax_grad = np.asarray(jax.grad(total_loss)(jnp.asarray(logits)))

    lg_tf = tf.Variable(tf.constant(logits, tf.float32))
    with tf.GradientTape() as tape:
        tf_loss = tf.reduce_sum(tf.nn.ctc_loss(
            labels=tf.constant(tgt, tf.int32),
            logits=lg_tf,
            label_length=tf.constant(tl, tf.int32),
            logit_length=tf.constant(il, tf.int32),
            logits_time_major=True,
            blank_index=0,
        ))
    tf_grad = tape.gradient(tf_loss, lg_tf).numpy()
    np.testing.assert_allclose(jax_grad, tf_grad, rtol=1e-3, atol=2e-4)
