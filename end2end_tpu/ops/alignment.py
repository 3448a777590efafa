"""CTC forced alignment: the Viterbi (max-semiring) twin of the loss.

Given log-probs and a target sequence, find the most probable alignment path
— which frames emit which target label and which are blank.  Same extended
lattice and transition rules as the loss (docs/ctc_math.md), with `max` in
place of `logaddexp`, plus a backtrace.

Everything is shape-static: the choice tape is a (T, N, L) int8 scan output,
the backtrace is a second (reverse) scan — both compile once per bucket, and
per-sample lengths are data.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ctc_common import build_ctc_tables, gather_lp_ext
from .semiring import LOG0, LOG0_THRESHOLD


class ForcedAlignment(NamedTuple):
    """labels[t, n]: emitted label id per frame (blank id on blank frames,
    -1 past input_length).  positions[t, n]: index into the target sequence
    (-1 on blank/padding frames).  scores[n]: best-path log-probability
    (-inf if no alignment exists)."""

    labels: jnp.ndarray
    positions: jnp.ndarray
    scores: jnp.ndarray


def ctc_forced_alignment(
    log_probs, targets, input_lengths, target_lengths, blank: int = 0
):
    """Most-probable CTC alignment of `targets` to `log_probs` (T, N, C)."""
    log_probs = jnp.asarray(log_probs)
    t_max, n, num_classes = log_probs.shape
    targets = jnp.asarray(targets, jnp.int32)
    il = jnp.asarray(input_lengths, jnp.int32)
    tl = jnp.asarray(target_lengths, jnp.int32)
    tables = build_ctc_tables(targets, tl, blank, num_classes)
    lp_ext = gather_lp_ext(log_probs, tables)  # (T, N, L)
    L = lp_ext.shape[-1]
    pos = jnp.arange(L, dtype=jnp.int32)
    skip2 = tables.skip2

    # --- Viterbi forward: delta scan + per-cell predecessor choice --------
    d0 = jnp.where(pos[None, :] == 0, lp_ext[0], LOG0)
    d0 = jnp.where((pos[None, :] == 1) & (tl[:, None] > 0), lp_ext[0], d0)

    def fwd(carry, xs):
        d = carry
        lp_t, t = xs
        d1 = jnp.pad(d, ((0, 0), (1, 0)), constant_values=LOG0)[:, :-1]
        d2 = jnp.where(
            skip2, jnp.pad(d, ((0, 0), (2, 0)), constant_values=LOG0)[:, :-2], LOG0
        )
        best = jnp.maximum(jnp.maximum(d, d1), d2)
        choice = jnp.where(
            d2 >= best, 2, jnp.where(d1 >= best, 1, 0)
        ).astype(jnp.int8)
        d_new = jnp.maximum(best + lp_t, LOG0)
        live = (t < il)[:, None]
        return jnp.where(live, d_new, d), jnp.where(live, choice, 0)

    ts = jnp.arange(1, t_max, dtype=jnp.int32)
    d_final, choices_rest = jax.lax.scan(fwd, d0, (lp_ext[1:], ts))
    # choices[t] explains the transition INTO time t (t >= 1).
    choices = jnp.concatenate(
        [jnp.zeros((1, n, L), jnp.int8), choices_rest], axis=0
    )

    end1 = jnp.take_along_axis(d_final, (2 * tl)[:, None], axis=1)[:, 0]
    end2 = jnp.take_along_axis(d_final, jnp.maximum(2 * tl - 1, 0)[:, None], axis=1)[:, 0]
    end2 = jnp.where(tl > 0, end2, LOG0)
    scores = jnp.maximum(end1, end2)
    e_star = jnp.where(end1 >= end2, 2 * tl, jnp.maximum(2 * tl - 1, 0))

    # --- backtrace: reverse scan over t ------------------------------------
    # state at t = state at t+1 minus the choice that led into t+1.
    choices_next = jnp.concatenate(
        [choices[1:], jnp.zeros((1, n, L), jnp.int8)], axis=0
    )

    def back(carry, xs):
        s_next = carry  # state at t+1 (valid when t+1 < il)
        ch_next, t = xs
        idx = jnp.clip(s_next, 0, L - 1)
        step_back = jnp.take_along_axis(ch_next, idx[:, None], axis=1)[:, 0]
        s_t = jnp.where(
            t == il - 1,
            e_star,
            jnp.where(t >= il, -1, s_next - step_back.astype(jnp.int32)),
        )
        return s_t, s_t

    ts_all = jnp.arange(t_max, dtype=jnp.int32)
    _, states = jax.lax.scan(
        back, jnp.full((n,), -1, jnp.int32), (choices_next, ts_all), reverse=True
    )  # (T, N)

    valid = states >= 0
    # gather emitted label per frame: ext_labels (N, L) indexed by states (T, N)
    idx = jnp.clip(states, 0, L - 1)
    labels = jax.vmap(lambda e, s: e[s], in_axes=(0, 1), out_axes=1)(
        tables.ext_labels, idx
    )
    labels = jnp.where(valid, labels, -1)
    positions = jnp.where(valid & (idx % 2 == 1), (idx - 1) // 2, -1)
    scores = jnp.where(scores > LOG0_THRESHOLD, scores, -jnp.inf)
    return ForcedAlignment(labels=labels, positions=positions, scores=scores)
