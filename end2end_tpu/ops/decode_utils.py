"""Decode-side lattice preprocessing.

Blank collapse (Blank Collapse: Compressing CTC emission for the faster
decoding, arXiv:2210.17017 — PAPERS.md): frames whose blank probability
exceeds a threshold contribute (almost) only a common blank factor to every
hypothesis, so they can be removed before beam search.  On trained, peaked
CTC models this typically removes 50-90% of frames; beam-search cost is
linear in T, so decoding speeds up by the same factor.  Scores shift by the
dropped common blank mass (ranking is preserved up to the paper's epsilon
argument); exact greedy/loss paths are unaffected (they don't use this).

`blank_collapse` is jit-friendly (static shapes: compacted frames are
front-packed into the same-T buffer, with new lengths as data); the host-side
`collapse_and_bucket` additionally re-buckets the now-shorter batch so the
beam scan actually runs fewer steps.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..utils.bucketing import DEFAULT_T_EDGES, bucket_size


def blank_collapse(log_probs, input_lengths=None, blank: int = 0,
                   threshold: float = 0.98):
    """Front-pack frames whose blank probability is below `threshold`.

    Args: log_probs (T, N, C); input_lengths (N,).
    Returns (packed_log_probs (T, N, C), new_lengths (N,)): kept frames of
    each sample moved to the front (order preserved); tail frames are
    padding (never read by downstream length-masked decoders).
    """
    log_probs = jnp.asarray(log_probs)
    t_max, n, _ = log_probs.shape
    if input_lengths is None:
        input_lengths = jnp.full((n,), t_max, jnp.int32)
    il = jnp.asarray(input_lengths, jnp.int32)
    log_thresh = jnp.float32(math.log(threshold))
    t_mask = jnp.arange(t_max, dtype=jnp.int32)[:, None] < il[None, :]
    # Collapse RUNS of confident blanks to their first frame (removing them
    # entirely would delete the separator between repeated tokens and merge
    # e.g. "6 _ 6" into "6" — the paper keeps one blank per run).
    is_cb = (log_probs[:, :, blank] >= log_thresh) & t_mask
    prev_cb = jnp.concatenate([jnp.zeros((1, n), bool), is_cb[:-1]], axis=0)
    keep = (~(is_cb & prev_cb)) & t_mask  # (T, N)
    pos = jnp.cumsum(keep, axis=0) - 1
    scatter_idx = jnp.where(keep, pos, t_max)  # out-of-bounds -> dropped
    packed = jnp.zeros_like(log_probs)
    packed = packed.at[scatter_idx, jnp.arange(n)[None, :], :].set(
        log_probs, mode="drop"
    )
    new_lengths = jnp.sum(keep, axis=0).astype(jnp.int32)
    return packed, new_lengths


def collapse_and_bucket(log_probs, input_lengths=None, blank: int = 0,
                        threshold: float = 0.98, t_edges=DEFAULT_T_EDGES):
    """Host-side: blank-collapse then slice T down to a bucket edge.

    Returns numpy (packed (T', N, C), new_lengths (N,)) with
    T' = bucket_size(max(new_lengths)) <= T, so downstream compiled decoders
    run proportionally fewer scan steps (one compile per bucket).
    """
    packed, new_lengths = blank_collapse(log_probs, input_lengths, blank, threshold)
    packed = np.asarray(packed)
    new_lengths = np.asarray(new_lengths)
    t_new = bucket_size(max(int(new_lengths.max()), 1), t_edges)
    t_new = min(t_new, packed.shape[0])
    return packed[:t_new], new_lengths
