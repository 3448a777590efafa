"""Second oracle: tf.nn.ctc_loss (SURVEY.md §5.2 item 2).

Catches bug classes the torch oracle might share with our mental model.
TF's ctc_loss computes the gradient wrt LOGITS (through the softmax), whereas
ours/torch's is wrt log-probs; for comparison we feed log-softmax outputs as
"logits" — then TF's loss matches, and its logits-gradient equals the
log-probs-gradient up to the softmax Jacobian, so we compare losses only
(gradients are cross-checked against torch and the f64 oracle elsewhere).
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
