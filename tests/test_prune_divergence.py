"""Adversarial quantification of the kernel's repeat-prune divergence.

The Pallas beam kernel reads the repeat-last ("stay") probability from the
frame's top-K candidate set (beam_search_pallas.py); the XLA scan — like
the reference's C++ decoder — reads it from the full vocabulary row.  At
prune_k >= V they are identical (tested elsewhere); with pruning they can
diverge exactly when a beam's last symbol falls outside a frame's top-K.

These tests CONSTRUCT that worst case on purpose: every other frame makes
one symbol strong (so beams end with it), then the next frame demotes it to
rank K+1 — just below the prune line — while keeping real probability mass
on the repeat, so the kernel's stay term reads log-zero where the scan
reads a finite value.  The asserted bounds are measured-with-margin and
recorded in STATUS.md; they are the quantitative version of the "documented
repeat-prune assumption".

(Divergence is measured kernel-vs-scan at the SAME prune_k — isolating the
stay-term approximation — and kernel-vs-exact (prune_k=V), bounding total
pruning damage on these adversarial lattices.)
"""

import numpy as np
import pytest

from end2end_tpu import beam_search_decode
from end2end_tpu.ops.beam_search_pallas import beam_search_pallas


def lsm(x):
    return x - np.log(np.sum(np.exp(x), -1, keepdims=True))


def _adversarial_lattice(rng, B, T, V, K):
    """Maximize stay-term divergence: strong symbol on even frames, demoted
    to rank K+1 (with real repeat mass) on odd frames, blank kept strong."""
    lp = rng.standard_normal((T, B, V)) * 1.0
    for t in range(0, T - 1, 2):
        c = 1 + (t // 2) % (V - 1)
        lp[t, :, c] += 4.0          # strong -> becomes beams' last symbol
        lp[t + 1, :, 0] += 2.0      # blank strong (stay pressure)
        others = [x for x in range(V) if x not in (0, c)]
        boost = rng.permutation(others)[:K]
        lp[t + 1, :, boost] += 3.0  # push the victim below the top-K line
        lp[t + 1, :, c] += 2.0      # ...but keep real mass on repeat-last
    return lsm(lp).astype(np.float32)


def _metrics(pt, pl_, ps, xt, xl, xs, W, B):
    top1, gaps, jac = 0, [], []
    pt, pl_, ps = np.asarray(pt), np.asarray(pl_), np.asarray(ps)
    xt, xl, xs = np.asarray(xt), np.asarray(xl), np.asarray(xs)
    for b in range(B):
        a = pt[b, 0, : pl_[b, 0]].tolist()
        c = xt[b, 0, : xl[b, 0]].tolist()
        top1 += a == c
        if a == c:
            gaps.append(abs(float(ps[b, 0]) - float(xs[b, 0])))
        sp = {tuple(pt[b, w, : pl_[b, w]].tolist())
              for w in range(W) if np.isfinite(ps[b, w])}
        sx = {tuple(xt[b, w, : xl[b, w]].tolist())
              for w in range(W) if np.isfinite(xs[b, w])}
        jac.append(len(sp & sx) / max(len(sp | sx), 1))
    return top1, (max(gaps) if gaps else 0.0), float(np.mean(jac))


@pytest.mark.parametrize("W,K", [(4, 4), (8, 8), (8, 16), (16, 8)])
def test_repeat_prune_divergence_bounds(W, K):
    """Round-4: the kernel streams a 2x candidate window for the STAY
    lookup (extensions still prune at K), so the engineered demote-to-
    rank-K+1 repeat keeps its exact probability.  Measured on this
    construction (seed 7, B=8, T=40, V=24): top-1 agreement 32/32 across
    the grid (every config 8/8), matching-top-1 score gap <= 0.13,
    beam-set Jaccard mean >= 0.95 (round 3, K-wide window: 29/32, worst
    6/8, gap 0.70, Jaccard >= 0.6).  Asserted with a small margin;
    STATUS.md cites these numbers.  (An optimistic lpk-min floor for
    missing repeats was tried instead and REJECTED: it inflates weak
    repeats and DROPPED agreement to 27/32.)"""
    rng = np.random.default_rng(7)
    B, T, V = 8, 40, 24
    lp = _adversarial_lattice(rng, B, T, V, K)
    pt, pl_, ps = beam_search_pallas(lp, beam_width=W, prune_k=K)
    xt, xl, xs = beam_search_decode(lp, beam_width=W, prune_k=K,
                                    implementation="xla")
    top1, gap, jac = _metrics(pt, pl_, ps, xt, xl, xs, W, B)
    assert top1 >= B - 1, (W, K, top1)
    assert gap <= 0.3, (W, K, gap)
    assert jac >= 0.9, (W, K, jac)

    # vs the exact (prune_k = V) decode: total pruning damage on the same
    # adversarial inputs — the scan shares most of it, the kernel adds the
    # stay-term part on top.
    et, el, es = beam_search_decode(lp, beam_width=W, implementation="xla")
    top1_e, _, jac_e = _metrics(pt, pl_, ps, et, el, es, W, B)
    assert top1_e >= B - 3, (W, K, top1_e)
    assert jac_e >= 0.4, (W, K, jac_e)


def test_divergence_vanishes_without_demotion(rng):
    """Control: the same generator WITHOUT the rank-K+1 demotion (plain
    diffuse lattices) keeps kernel and scan in full top-1 agreement — the
    divergence is specifically the engineered stay-term case."""
    B, T, V, W, K = 8, 40, 24, 8, 16
    lp = lsm(rng.standard_normal((T, B, V)) * 1.0).astype(np.float32)
    pt, pl_, ps = beam_search_pallas(lp, beam_width=W, prune_k=K)
    xt, xl, xs = beam_search_decode(lp, beam_width=W, prune_k=K,
                                    implementation="xla")
    top1, gap, jac = _metrics(pt, pl_, ps, xt, xl, xs, W, B)
    assert top1 >= B - 1
    assert jac >= 0.8
