"""Greedy (best-path) CTC decoding, fully vectorized for TPU.

Rebuild of the reference's C++ greedy decoder kernel (SURVEY.md §3.1 N2): the
per-sample loop `argmax -> collapse repeats -> strip blanks` becomes one XLA
program over the whole batch — argmax over the vocab axis, a shift-compare
dedup mask, a blank mask, and a cumsum-scatter compaction (SURVEY.md §4.3).
No Pallas kernel is needed; XLA fuses this into a few elementwise passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from .fastmath import log_softmax_acc


def greedy_decode(log_probs, input_lengths=None, blank: int = 0, pad_id: int = -1,
                  from_logits: bool = False, batch_first: bool = False):
    """Decode the best path and collapse it.

    Args:
      log_probs: (T, N, C) log-probabilities (or logits — argmax is invariant).
      input_lengths: (N,) valid frame counts; defaults to T for all samples.
      blank: blank label id.
      pad_id: fill value for padded positions of the output token matrix.
      from_logits: normalize with log_softmax first (tokens are unchanged —
        argmax is invariant — but `scores` become true path log-probs).
      batch_first: accept (N, T, C) activations (transposed internally).

    Returns:
      tokens: (N, T) int32, decoded label ids left-aligned, pad_id elsewhere.
      lengths: (N,) int32 decoded lengths.
      scores: (N,) float, sum over valid frames of the best-path log-prob.

    For per-token emission frames use `greedy_decode_with_timestamps`.
    """
    log_probs = jnp.asarray(log_probs)
    if batch_first:
        log_probs = jnp.swapaxes(log_probs, 0, 1)
    if from_logits:
        log_probs = log_softmax_acc(log_probs, axis=-1)
    t_max, n, _ = log_probs.shape
    if input_lengths is None:
        input_lengths = jnp.full((n,), t_max, dtype=jnp.int32)
    best = jnp.max(log_probs, axis=-1)  # (T, N)
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)  # (T, N)
    return greedy_decode_from_path(ids, best, input_lengths, blank=blank,
                                   pad_id=pad_id)


def greedy_decode_from_path(ids, best, input_lengths=None, blank: int = 0,
                            pad_id: int = -1):
    """Collapse a PRECOMPUTED best path (same returns as `greedy_decode`).

    ids: (T, N) per-frame argmax token ids; best: (T, N) their log-probs.
    Used when the argmax itself is computed elsewhere — e.g. over a
    vocab-SHARDED lattice on a device mesh (parallel/vocab_parallel.py),
    where only the per-frame winners are replicated."""
    ids = jnp.asarray(ids, jnp.int32)
    t_max, n = ids.shape
    if input_lengths is None:
        input_lengths = jnp.full((n,), t_max, dtype=jnp.int32)
    il = jnp.asarray(input_lengths, dtype=jnp.int32)
    ids_nt = ids.T  # (N, T)
    t_mask = jnp.arange(t_max, dtype=jnp.int32)[None, :] < il[:, None]

    prev = jnp.concatenate(
        [jnp.full((n, 1), -1, jnp.int32), ids_nt[:, :-1]], axis=1
    )
    keep = (ids_nt != blank) & (ids_nt != prev) & t_mask

    pos = jnp.cumsum(keep, axis=1) - 1  # output slot for kept symbols
    scatter_idx = jnp.where(keep, pos, t_max)  # out-of-bounds -> dropped
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    tokens = jnp.full((n, t_max), pad_id, jnp.int32)
    tokens = tokens.at[rows, scatter_idx].set(ids_nt, mode="drop")
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    scores = jnp.sum(jnp.where(t_mask, best.T, 0.0), axis=1)
    return tokens, lengths, scores


def greedy_decode_with_timestamps(log_probs, input_lengths=None, blank: int = 0,
                                  pad_id: int = -1, from_logits: bool = False,
                                  batch_first: bool = False):
    """greedy_decode + the FRAME INDEX at which each emitted token first
    fires (the start of its repeat run) — the cheap streaming-friendly
    alternative to full forced alignment (ops/alignment.py).

    Returns (tokens (N, T), lengths (N,), scores (N,), times (N, T) int32
    frame indices aligned with `tokens`, pad_id where tokens is padded)."""
    log_probs = jnp.asarray(log_probs)
    if batch_first:
        log_probs = jnp.swapaxes(log_probs, 0, 1)
    if from_logits:
        log_probs = log_softmax_acc(log_probs, axis=-1)
    t_max, n, _ = log_probs.shape
    if input_lengths is None:
        input_lengths = jnp.full((n,), t_max, dtype=jnp.int32)
    il = jnp.asarray(input_lengths, dtype=jnp.int32)

    best = jnp.max(log_probs, axis=-1)
    ids_nt = jnp.argmax(log_probs, axis=-1).astype(jnp.int32).T
    t_mask = jnp.arange(t_max, dtype=jnp.int32)[None, :] < il[:, None]
    prev = jnp.concatenate([jnp.full((n, 1), -1, jnp.int32), ids_nt[:, :-1]], axis=1)
    keep = (ids_nt != blank) & (ids_nt != prev) & t_mask
    pos = jnp.cumsum(keep, axis=1) - 1
    scatter_idx = jnp.where(keep, pos, t_max)
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    frame_ids = jnp.broadcast_to(jnp.arange(t_max, dtype=jnp.int32)[None, :], (n, t_max))
    tokens = jnp.full((n, t_max), pad_id, jnp.int32).at[rows, scatter_idx].set(
        ids_nt, mode="drop"
    )
    times = jnp.full((n, t_max), pad_id, jnp.int32).at[rows, scatter_idx].set(
        frame_ids, mode="drop"
    )
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    scores = jnp.sum(jnp.where(t_mask, best.T, 0.0), axis=1)
    return tokens, lengths, scores, times


class GreedyCTCDecoder:
    """Class-style greedy decoder mirroring the reference's decoder API
    (SURVEY.md §3.2 P3): optional label alphabet, `decode()` returns python
    lists (or joined strings when labels are given) plus path scores."""

    def __init__(self, blank: int = 0, labels=None, from_logits: bool = False,
                 batch_first: bool = False):
        self.blank = blank
        self.labels = list(labels) if labels is not None else None
        self.batch_first = bool(batch_first)
        self._fn = jax.jit(lambda lp, il: greedy_decode(
            lp, il, blank=blank, from_logits=from_logits))

    def decode(self, log_probs, input_lengths=None):
        log_probs = jnp.asarray(log_probs)
        if self.batch_first:
            log_probs = jnp.swapaxes(log_probs, 0, 1)
        t_max, n, _ = log_probs.shape
        if input_lengths is None:
            input_lengths = np.full((n,), t_max, dtype=np.int32)
        tokens, lengths, scores = jax.device_get(
            self._fn(log_probs, jnp.asarray(input_lengths, jnp.int32))
        )
        out = []
        for i in range(n):
            ids = tokens[i, : lengths[i]].tolist()
            out.append("".join(self.labels[c] for c in ids) if self.labels else ids)
        return out, scores.tolist()
