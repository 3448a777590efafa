"""Shared lattice-table construction for the CTC forward-backward DP.

The extended label sequence l' = [b, l1, b, l2, ..., lS, b] (length 2S+1) and
its transition-permission masks are the same for every implementation (XLA
scan, Pallas kernel, NumPy oracle).  Everything here is static-shape: the
lattice is built at the padded S_max and masked with per-sample lengths, so a
single compiled program serves a whole (T, S) bucket (SURVEY.md §4.5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .semiring import LOG0


class CTCTables(NamedTuple):
    """Per-batch static lattice tables, all shaped (N, L) with L = 2*S_max+1.

    ext_labels: vocabulary id emitted at each lattice state (blank at even s).
    skip2: True where the s-2 "skip" transition INTO state s is allowed
      (s odd, s >= 3, and the two labels differ — the repeated-label rule).
    valid: True for states s < 2*target_length+1 (per-sample lattice width).
    """

    ext_labels: jnp.ndarray
    skip2: jnp.ndarray
    valid: jnp.ndarray


def build_ctc_tables(
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int,
    num_classes: int,
) -> CTCTables:
    """Build the extended-label lattice tables from padded (N, S) targets."""
    targets = jnp.asarray(targets, dtype=jnp.int32)
    if targets.ndim != 2:
        raise ValueError(f"targets must be (N, S) padded; got shape {targets.shape}")
    n, s_max = targets.shape
    L = 2 * s_max + 1
    pos = jnp.arange(L, dtype=jnp.int32)
    is_odd = (pos % 2) == 1
    lab_idx = jnp.clip((pos - 1) // 2, 0, max(s_max - 1, 0))
    if s_max == 0:
        ext = jnp.full((n, 1), blank, dtype=jnp.int32)
        skip2 = jnp.zeros((n, 1), dtype=bool)
    else:
        tgt_at = jnp.clip(targets[:, lab_idx], 0, num_classes - 1)  # (N, L)
        prev_at = jnp.clip(targets[:, jnp.maximum(lab_idx - 1, 0)], 0, num_classes - 1)
        ext = jnp.where(is_odd[None, :], tgt_at, blank).astype(jnp.int32)
        skip2 = is_odd[None, :] & (pos[None, :] >= 3) & (tgt_at != prev_at)
    valid = pos[None, :] < (2 * target_lengths[:, None].astype(jnp.int32) + 1)
    return CTCTables(ext_labels=ext, skip2=skip2, valid=valid)


# Above this many one-hot elements (N * L_padded * V) the dense matrix would
# dominate HBM; fall back to the gather.  2^25 f32 elements = 128 MB.
_ONEHOT_MAX_ELEMS = 1 << 25
# The label-COMPACTED one-hot (N * (S+1) * V) is allowed larger: at
# production vocabs it replaces a full-lattice transpose that costs more
# HBM than the matrix.  2^27 f32 elements = 512 MB.
_COMPACT_ONEHOT_MAX_ELEMS = 1 << 27


def state_onehot(tables: CTCTables, num_classes: int, lanes: int | None = None,
                 dtype=jnp.float32):
    """One-hot state->vocab matrix M (N, L_or_lanes, V): M[b,l,v] = 1 iff
    lattice state l of sample b emits vocab id v and the state is valid.
    Rows beyond L (lane padding) and invalid states are all-zero."""
    ext = jnp.where(tables.valid, tables.ext_labels, -1)  # invalid -> no v
    if lanes is not None and lanes > ext.shape[1]:
        ext = jnp.pad(ext, ((0, 0), (0, lanes - ext.shape[1])),
                      constant_values=-1)
    v_iota = jnp.arange(num_classes, dtype=jnp.int32)
    return (ext[:, :, None] == v_iota).astype(dtype)


def _lp_ext_compact(log_probs, tables: CTCTables, width: int):
    """Production-vocab emission path (SURVEY.md §6.2 "unique"
    optimization, label-compaction form): one-hot over the S TARGET slots
    plus one blank slot instead of the 2S+1 states — even states all read
    the blank column, so the matmul nearly halves and the L-state row is
    two interleaved copies.  Avoids both the 2x-larger state one-hot and
    the gather path's full-lattice transpose (the dominant HBM cost at
    V=32k).  Bit-identical to the gather (one-hot 'highest' matmuls copy)."""
    t_max, n, v = log_probs.shape
    L = tables.ext_labels.shape[1]
    s_max = (L - 1) // 2
    lp32 = jnp.maximum(log_probs.astype(jnp.float32), LOG0)  # -inf-safe
    # slot 0 = blank (state 0's label), slots 1..S = target labels
    slots = jnp.concatenate(
        [tables.ext_labels[:, :1], tables.ext_labels[:, 1::2]], axis=1)
    m = (slots[:, :, None]
         == jnp.arange(v, dtype=jnp.int32)).astype(jnp.float32)
    lp_all = jnp.einsum("tbv,bsv->tbs", lp32, m,
                        precision="highest")  # (T, N, S_max + 1)
    lp_blank, lp_lab = lp_all[..., 0], lp_all[..., 1:]
    pairs = jnp.stack(
        [jnp.broadcast_to(lp_blank[:, :, None], (t_max, n, s_max)), lp_lab],
        axis=-1,
    ).reshape(t_max, n, 2 * s_max)  # states 0..2S-1: b l b l ...
    lp_ext = jnp.concatenate([pairs, lp_blank[:, :, None]], axis=-1)
    lp_ext = jnp.where(tables.valid[None], lp_ext, LOG0)
    if width > L:
        lp_ext = jnp.pad(lp_ext, ((0, 0), (0, 0), (0, width - L)),
                         constant_values=LOG0)
    return lp_ext


def gather_lp_ext(log_probs: jnp.ndarray, tables: CTCTables,
                  lanes: int | None = None) -> jnp.ndarray:
    """Per-state emission log-probs: (T, N, C) -> (T, N, L) (or (T, N, lanes)
    when `lanes` is given, with log-zero lane padding for free).

    Invalid (padded) lattice states are masked to log-zero, which (a) keeps
    them from ever contributing to valid states in either scan direction and
    (b) keeps the renormalization max finite.

    On TPU this is a one-hot MXU matmul: the state->vocab index map is a
    per-sample linear operator constant over time, and einsum at
    precision='highest' reconstructs each f32 value exactly (bf16x3 operand
    split, f32 accumulation, products are value*1.0) — so it is bit-identical
    to the gather while avoiding XLA's scatter/gather loops.  Elsewhere (and
    for huge N*L*V) it stays a major-axis gather.
    """
    n, L = tables.ext_labels.shape
    v = log_probs.shape[-1]
    width = lanes or L
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and n * width * v <= _ONEHOT_MAX_ELEMS:
        lp32 = jnp.maximum(log_probs.astype(jnp.float32), LOG0)  # -inf-safe
        m = state_onehot(tables, log_probs.shape[-1], lanes=width)
        lp_ext = jnp.einsum("tbv,blv->tbl", lp32, m, precision="highest")
        # zero rows (invalid/pad states) must read as log-zero
        live = jnp.pad(
            tables.valid, ((0, 0), (0, width - L))
        ) if width > L else tables.valid
        return jnp.where(live[None], lp_ext, LOG0).astype(log_probs.dtype)
    s_max = (L - 1) // 2
    if (on_tpu and s_max > 0
            and n * (s_max + 1) * v <= _COMPACT_ONEHOT_MAX_ELEMS):
        return _lp_ext_compact(log_probs, tables, width).astype(
            log_probs.dtype)
    # The state->vocab index map is constant over time, so gather along the
    # MAJOR axis with T-contiguous rows (fast row-copy on TPU) instead of a
    # per-element minor-axis gather (~30x faster on v5e: 3ms vs 88ms at
    # T=1000, B=32, V=1024, L=201).
    x1 = jnp.moveaxis(log_probs, 0, 2)  # (N, C, T)
    g = jnp.take_along_axis(x1, tables.ext_labels[:, :, None], axis=1)  # (N, L, T)
    lp_ext = jnp.where(tables.valid[None, :, :], jnp.moveaxis(g, 2, 0), LOG0)
    if width > L:
        lp_ext = jnp.pad(
            lp_ext, ((0, 0), (0, 0), (0, width - L)), constant_values=LOG0
        )
    return lp_ext
