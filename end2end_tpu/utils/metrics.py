"""Evaluation metrics for ASR/OCR: edit distance, WER, CER.

The standard companions to a CTC decoder (the reference library leaves
scoring to the caller; every production deployment needs them next to the
decoder, so they live here).  Two forms:

  * `edit_distance` / `wer` / `cer` / `corpus_wer`: plain NumPy Levenshtein
    for host-side scoring of decoded strings/id-lists.
  * `batch_edit_distance`: a jittable, batched DP over padded id matrices —
    device-side scoring of whole eval batches (decode + score inside one
    jit for validation loops).  Anti-diagonal formulation: sweeping
    diagonals keeps two static-shape carry rows, so the scan is
    shape-static and vectorized over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def edit_distance(a, b) -> int:
    """Levenshtein distance between two sequences (lists/arrays/strings)."""
    a, b = list(a), list(b)
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = np.arange(len(b) + 1)
    cur = np.empty(len(b) + 1, np.int64)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
        prev, cur = cur, prev
    return int(prev[len(b)])


def wer(ref: str, hyp: str) -> float:
    """Word error rate between two strings (whitespace tokenization)."""
    r, h = ref.split(), hyp.split()
    if not r:
        return 0.0 if not h else float("inf")
    return edit_distance(r, h) / len(r)


def cer(ref: str, hyp: str) -> float:
    """Character error rate between two strings."""
    if not ref:
        return 0.0 if not hyp else float("inf")
    return edit_distance(ref, hyp) / len(ref)


def corpus_wer(refs, hyps) -> float:
    """Corpus-level WER: total edits over total reference words."""
    edits = words = 0
    for r, h in zip(refs, hyps):
        edits += edit_distance(r.split(), h.split())
        words += len(r.split())
    return edits / max(words, 1)


@jax.jit
def batch_edit_distance(a, a_lens, b, b_lens):
    """Batched Levenshtein on device: a (N, La), b (N, Lb) int32 padded
    (padding ignored via the length masks).  Returns (N,) int32 distances
    between a[i, :a_lens[i]] and b[i, :b_lens[i]].

    Anti-diagonal DP over diagonals k = i + j: cell (i, j) needs
    D[i-1, j], D[i, j-1], D[i-1, j-1], all on the previous two diagonals,
    so the scan carry is two (N, La+1) rows (slot index = i).
    """
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    n, la = a.shape
    _, lb = b.shape
    a_lens = jnp.asarray(a_lens, jnp.int32)
    b_lens = jnp.asarray(b_lens, jnp.int32)
    if la == 0 or lb == 0:
        return jnp.maximum(a_lens, b_lens).astype(jnp.int32)
    big = jnp.int32(la + lb + 1)
    i_idx = jnp.arange(la + 1, dtype=jnp.int32)

    d_prev2 = jnp.zeros((n, la + 1), jnp.int32)      # diag 0: D[0,0] = 0
    d_prev = jnp.full((n, la + 1), big, jnp.int32)   # diag 1: D[0,1]=D[1,0]=1
    d_prev = d_prev.at[:, 0].set(1).at[:, 1].set(1)

    def step(carry, k):
        d_prev2, d_prev = carry
        j_idx = k - i_idx  # (La+1,)
        ai = a[:, jnp.clip(i_idx - 1, 0, la - 1)]
        bj = jnp.take_along_axis(
            b, jnp.broadcast_to(jnp.clip(j_idx - 1, 0, lb - 1), (n, la + 1)),
            axis=1,
        )
        sub = jnp.roll(d_prev2, 1, axis=1) + (ai != bj)  # D[i-1, j-1]
        dele = jnp.roll(d_prev, 1, axis=1) + 1           # D[i-1, j]
        ins = d_prev + 1                                 # D[i, j-1]
        d = jnp.minimum(sub, jnp.minimum(dele, ins))
        d = jnp.where(i_idx == 0, j_idx, d)              # boundary D[0, j] = j
        d = jnp.where(j_idx == 0, i_idx, d)              # boundary D[i, 0] = i
        d = jnp.where((j_idx >= 0) & (j_idx <= lb), d, big)
        # each (a_len, b_len) target sits on exactly one diagonal
        hit = (i_idx[None] == a_lens[:, None]) & (
            j_idx[None] == b_lens[:, None]
        )
        return (d_prev, d), jnp.sum(jnp.where(hit, d, 0), axis=1)

    ks = jnp.arange(2, la + lb + 1, dtype=jnp.int32)
    _, outs = jax.lax.scan(step, (d_prev2, d_prev), ks)
    from_scan = jnp.sum(outs, axis=0)  # exactly one diagonal contributes
    # empty-side cases never enter the scan's k >= 2 target diagonals
    # correctly when the other side is 0 or 1 long, but the boundary rows
    # make those hits exact too; only fully-empty pairs need the override
    return jnp.where(
        (a_lens == 0) | (b_lens == 0), jnp.maximum(a_lens, b_lens),
        from_scan,
    ).astype(jnp.int32)
