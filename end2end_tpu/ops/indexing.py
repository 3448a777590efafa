"""TPU-friendly replacements for XLA's slow indexed ops.

Measured on v5e (chained methodology, (1024, 128) operands): plain 1-D
table gathers run at 3.5-5 G elem/s, but `take_along_axis` with per-row
indices along a 128-wide trailing axis lowers to a batched-gather path at
~0.13 G elem/s (~30x slower), and scatter compaction costs ~0.5 ms per
call; `lax.sort_key_val`, `cumsum`, and select ladders are all cheap.
These helpers route around the slow forms:

  * flat_take     — row-wise take_along_axis as ONE flat 1-D gather.
  * ladder_take   — take over a SMALL static trailing dim as a
                    compare-select ladder (~25 G elem/s at W=8).
  * compact_rows  — left-justify valid (-1-padded) entries per row with a
                    single sort instead of a cumsum scatter.

Used by the chunked LM decode (beam_chunked.py) and the LM chunk scorers
(lm.py), where these patterns dominated the round-3 profile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def take1d(table, idx):
    """`table[idx]` for a 1-D table (kept for call-site uniformity with
    flat_take; a plain 1-D gather is already the fast form).

    NOTE (round-3 hard-won): do NOT bitcast integer operands to f32 around
    gathers — small ints become f32 denormals, and somewhere in the fused
    TPU gather pipelines denormals get flushed to zero, silently corrupting
    the values (caught by the on-chip suite; CPU never flushes).  Measured
    gather cost is dtype-insensitive anyway (~10-20 ns per gathered row).
    """
    return table[idx]


def flat_take(arr, idx):
    """`jnp.take_along_axis(arr, idx, axis=-1)` via one flat 1-D gather.

    arr: (..., C); idx: (..., K) int32 row-wise indices into the last axis
    (caller guarantees 0 <= idx < C).  Avoids take_along_axis's batched
    lowering on lane-wide trailing axes.  Values pass through in their own
    dtype — see take1d's note on why there is no f32 bitcast here.
    """
    c = arr.shape[-1]
    lead = arr.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    flat = arr.reshape(rows * c)
    row_id = jnp.arange(rows, dtype=jnp.int32).reshape(lead + (1,))
    return flat[row_id * c + idx]


def ladder_take(arr, idx):
    """Take over a small STATIC trailing dim by compare-select ladder.

    arr: (..., W); idx int32 in [0, W), either (...,) (one take per row —
    returns (...,)) or (..., K) (K takes per row — returns (..., K), the
    take_along_axis shape).  Compiles to W fused selects — no gather.
    Use when W is a small static (beam width / top-K slot count).
    """
    w = arr.shape[-1]
    squeeze = idx.ndim == arr.ndim - 1
    if squeeze:
        idx = idx[..., None]
    out = jnp.zeros(jnp.broadcast_shapes(arr.shape[:-1] + (1,), idx.shape),
                    arr.dtype)
    for x in range(w):
        out = jnp.where(idx == x, arr[..., x:x + 1], out)
    return out[..., 0] if squeeze else out


def compact_rows(vals, fill=-1, valid=None):
    """Left-justify each row's valid entries, preserving order.

    vals: (..., C); entries equal to `fill` (or where `valid` is False)
    are pushed to the row's end and replaced by `fill`.  One stable
    sort_key_val — no scatter.
    """
    c = vals.shape[-1]
    if valid is None:
        valid = vals != fill
    key = jnp.where(valid, 0, 1).astype(jnp.int32)
    _, out = jax.lax.sort_key_val(key, jnp.where(valid, vals, fill),
                                  dimension=vals.ndim - 1, is_stable=True)
    return out
