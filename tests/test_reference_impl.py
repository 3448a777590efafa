"""NumPy reference implementation vs torch.nn.CTCLoss (the judge's oracle).

SURVEY.md §5.2 items 1 and 3: the float64 NumPy loops are the ground truth the
fast JAX paths are later compared against, so they must first match torch.
"""

import numpy as np
import pytest
import torch

from end2end_tpu.utils.reference_impl import (
    beam_search_decode_ref,
    ctc_loss_ref,
    greedy_decode_ref,
)
from tests.conftest import random_ctc_problem


def torch_loss_grad(log_probs, targets, il, tl, blank=0, dtype=torch.float64):
    lp = torch.tensor(log_probs, dtype=dtype, requires_grad=True)
    loss = torch.nn.functional.ctc_loss(
        lp,
        torch.tensor(targets, dtype=torch.long),
        torch.tensor(il, dtype=torch.long),
        torch.tensor(tl, dtype=torch.long),
        blank=blank,
        reduction="sum",
        zero_infinity=False,
    )
    loss_none = torch.nn.functional.ctc_loss(
        lp.detach(),
        torch.tensor(targets, dtype=torch.long),
        torch.tensor(il, dtype=torch.long),
        torch.tensor(tl, dtype=torch.long),
        blank=blank,
        reduction="none",
        zero_infinity=False,
    )
    loss.backward()
    return loss_none.detach().numpy(), lp.grad.numpy()


@pytest.mark.parametrize("B,T,S,V", [(4, 50, 20, 29), (3, 17, 5, 7), (2, 8, 3, 4)])
def test_loss_and_grad_match_torch(rng, B, T, S, V):
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V, dtype=np.float64)
    losses, grads = ctc_loss_ref(lp, tgt, il, tl, blank=0)
    tl_loss, tl_grad = torch_loss_grad(lp, tgt, il, tl, blank=0)
    np.testing.assert_allclose(losses, tl_loss, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(grads, tl_grad, rtol=1e-8, atol=1e-10)


def test_repeated_labels(rng):
    # Repeated labels exercise the disallowed s-2 skip.
    B, T, S, V = 2, 12, 4, 5
    lp, _, il, tl = random_ctc_problem(rng, B, T, S, V, dtype=np.float64)
    tgt = np.array([[2, 2, 2, 2], [1, 1, 3, 3]], dtype=np.int32)
    tl = np.array([4, 4], dtype=np.int32)
    il = np.array([12, 10], dtype=np.int32)
    losses, grads = ctc_loss_ref(lp, tgt, il, tl, blank=0)
    t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl)
    np.testing.assert_allclose(losses, t_loss, rtol=1e-10)
    np.testing.assert_allclose(grads, t_grad, rtol=1e-8, atol=1e-10)


def test_nonzero_blank(rng):
    B, T, S, V = 3, 15, 5, 8
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V, dtype=np.float64)
    tgt = np.where(tgt == 3, 1, tgt)  # blank=3 must not appear in targets
    losses, grads = ctc_loss_ref(lp, tgt, il, tl, blank=3)
    t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl, blank=3)
    np.testing.assert_allclose(losses, t_loss, rtol=1e-10)
    np.testing.assert_allclose(grads, t_grad, rtol=1e-8, atol=1e-10)


def test_impossible_alignment_is_inf(rng):
    # T < required frames for repeated labels -> loss inf.
    T, B, V = 4, 1, 5
    lp = np.log(np.full((T, B, V), 1.0 / V))
    tgt = np.array([[1, 1, 1]], dtype=np.int32)  # needs >= 5 frames (blanks between)
    losses, grads = ctc_loss_ref(lp, tgt, np.array([4]), np.array([3]))
    assert np.isinf(losses[0])
    assert np.all(np.isfinite(grads))


def test_zero_target_length(rng):
    B, T, S, V = 2, 10, 3, 6
    lp, tgt, il, _ = random_ctc_problem(rng, B, T, S, V, dtype=np.float64)
    tl = np.array([0, 2], dtype=np.int32)
    losses, grads = ctc_loss_ref(lp, tgt, il, tl)
    t_loss, t_grad = torch_loss_grad(lp, tgt, il, tl)
    np.testing.assert_allclose(losses, t_loss, rtol=1e-10)
    np.testing.assert_allclose(grads, t_grad, rtol=1e-8, atol=1e-10)


def test_greedy_matches_manual():
    # T=6, V=3, blank=0; constructed argmax path 1,1,0,2,2,1 -> [1,2,1]
    path = [1, 1, 0, 2, 2, 1]
    T, V = len(path), 3
    lp = np.full((T, 1, V), -5.0)
    for t, c in enumerate(path):
        lp[t, 0, c] = -0.1
    out = greedy_decode_ref(lp, [T])
    assert out[0] == [1, 2, 1]


def test_beam1_equals_greedy_on_peaked(rng):
    # With a very peaked distribution, beam-1 best prefix == greedy output.
    B, T, V = 3, 20, 6
    ids = rng.integers(0, V, size=(T, B))
    lp = np.full((T, B, V), -20.0)
    for t in range(T):
        for b in range(B):
            lp[t, b, ids[t, b]] = -1e-6
    greedy = greedy_decode_ref(lp, [T] * B)
    beams = beam_search_decode_ref(lp, [T] * B, beam_width=1)
    for b in range(B):
        assert list(beams[b][0][0]) == greedy[b]


def _exhaustive_prefix_scores(lp, blank=0):
    """Brute-force: enumerate ALL alignment paths, collapse, sum probabilities."""
    T, V = lp.shape
    from itertools import product

    scores = {}
    for path in product(range(V), repeat=T):
        p = sum(lp[t, c] for t, c in enumerate(path))
        # collapse
        seq = []
        prev = -1
        for c in path:
            if c != blank and c != prev:
                seq.append(c)
            prev = c
        key = tuple(seq)
        scores[key] = np.logaddexp(scores.get(key, -np.inf), p)
    return scores


def test_beam_matches_exhaustive_tiny(rng):
    T, V = 5, 3
    logits = rng.standard_normal((T, V)) * 2
    lp = logits - np.log(np.sum(np.exp(logits), axis=-1, keepdims=True))
    exact = _exhaustive_prefix_scores(lp)
    # Beam wide enough to be exhaustive over prefixes.
    beams = beam_search_decode_ref(lp[:, None, :], [T], beam_width=1000)[0]
    got = dict(beams)
    for prefix, score in exact.items():
        assert prefix in got
        np.testing.assert_allclose(got[prefix], score, rtol=1e-9)


def test_prefix_merging_is_logaddexp():
    # Two alignment families reaching the same prefix must merge additively.
    # lp chosen so prefix (1,) arises via paths [1,1], [1,0], [0,1], [1] etc.
    T, V = 2, 2
    lp = np.log(np.array([[0.4, 0.6], [0.5, 0.5]]))
    exact = _exhaustive_prefix_scores(lp)
    beams = dict(beam_search_decode_ref(lp[:, None, :], [T], beam_width=10)[0])
    for k, v in exact.items():
        np.testing.assert_allclose(beams[k], v, rtol=1e-12)
