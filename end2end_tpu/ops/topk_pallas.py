"""Exact top-K over the vocabulary as a Pallas TPU kernel.

XLA's `lax.top_k` lowers to a full bitonic sort of the V-wide lane dim —
measured 11.6 ms for (T=1000, B=32, V=1024, K=16) on v5e, which made it 61%
of the beam-decode budget (`approx_max_k` is 8.9 ms at recall 1.0 and still
tie-unstable).  A CTC decoder only needs the K largest entries, so this
kernel does K iterative max-extractions over a VMEM-resident block instead:
HBM traffic is one read of the lattice, and the compute is K cheap
elementwise/reduce passes rather than O(log^2 V) sort stages.

Layout: natural (T, B, V) input — frames in sublanes, vocab in lanes, no
transpose.  Each grid step loads a (tc, B, V) block and extracts K
(value, index) pairs per (t, b) cell.

Tie-breaking matches `lax.top_k` exactly for finite values: equal values
yield the smaller index first (the per-pass argmin-of-iota).  The one
divergence: among multiple EXACTLY -inf entries the same (smallest) index
is reported repeatedly instead of distinct ones — such candidates carry no
probability mass, so downstream beam scores are unaffected.

Used by the beam decoder (beam_search_pallas.py) on TPU; the reference's
decoder (SURVEY.md §3.1 N3) does per-frame candidate pruning inside its C++
loop — this is that pruning as a standalone TPU kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(1 << 30)
_NEG_INF = np.float32(-np.inf)


def _pad_up(x, m):
    return (x + m - 1) // m * m


def topk_pallas_fits_vmem(b, v):
    """Whether the kernel's MINIMUM block (tc=1) fits scoped VMEM: one
    double-buffered input block plus the scratch copy, with headroom."""
    b_pad = _pad_up(b, 8)
    v_pad = _pad_up(v, 128)
    return 3 * b_pad * v_pad * 4 <= (12 << 20)


# Extractions per scratch round-trip: E-1 of the E masked blocks stay in
# registers/VMEM temporaries inside one loop body, so the scratch is
# read+written ceil(K/E) times instead of K.  (E live temporaries per body;
# keep E small — a fully unrolled K-deep pure-value loop measured 22 MB of
# scoped VMEM at K=16 with a 1 MB block, over the 16 MB limit.)  On-chip
# sweep at the metric beam config (T=1000,B=32,V=1024,K=16): E=1 1.16 ms
# standalone / 8.0k seq/s beam-8; E=2 1.16/8.5k; E=4 1.05/9.2k; E=8 1.01
# standalone but 8.5k beam-8 (the extra live temporaries crowd the beam
# kernel's other VMEM blocks) — so E=4.
_EXTRACT_PER_PASS = 4


def _topk_kernel(K, x_ref, val_ref, idx_ref, x_s):
    # The extraction passes MUTATE the block in a VMEM scratch (flat in K);
    # each pass extracts _EXTRACT_PER_PASS entries on in-register masked
    # copies before writing the block back once.
    x_s[...] = x_ref[...]  # (tc, B, V)
    tc, b, v = x_s.shape
    E = _EXTRACT_PER_PASS
    iota = jax.lax.broadcasted_iota(jnp.int32, (tc, b, v), 2)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, b, K), 2)
    vals0 = jnp.full((tc, b, K), _NEG_INF, jnp.float32)
    idxs0 = jnp.zeros((tc, b, K), jnp.int32)

    def body(p, carry):
        vals, idxs = carry
        x = x_s[...]
        for e in range(E):
            m = jnp.max(x, axis=-1, keepdims=True)  # (tc, b, 1)
            sel = jnp.min(jnp.where(x >= m, iota, _BIG), axis=-1,
                          keepdims=True)
            x = jnp.where(iota == sel, _NEG_INF, x)
            k = E * p + e
            vals = jnp.where(k_iota == k, m, vals)
            idxs = jnp.where(k_iota == k, sel, idxs)
        x_s[...] = x
        return vals, idxs

    vals, idxs = jax.lax.fori_loop(0, (K + E - 1) // E, body, (vals0, idxs0))
    val_ref[...] = vals
    idx_ref[...] = idxs


@partial(jax.jit, static_argnames=("k", "interpret"))
def topk_pallas(x, k: int, interpret: bool = False):
    """Exact (values, indices) top-k over the last dim of (T, B, V) f32.

    Same contract as `jax.lax.top_k`: values sorted descending, ties by
    ascending index (see module docstring for the -inf-tie caveat).
    """
    t_max, b, v = x.shape
    if k > v:
        raise ValueError(f"k={k} > V={v}")
    if not topk_pallas_fits_vmem(b, v):
        raise ValueError(
            f"topk_pallas: one (B={b}, V={v}) row tile exceeds the VMEM "
            "budget; use jax.lax.top_k (the beam decoder falls back "
            "automatically)")
    x = x.astype(jnp.float32)

    b_pad = _pad_up(b, 8)
    v_pad = _pad_up(v, 128)
    # Block budget: the extraction loop runs in a VMEM scratch (scoped VMEM
    # flat in k — see _topk_kernel), so the block size is set purely by
    # pipelining: ~1 MB measures fastest at the metric config (1.05 ms at
    # T=1000,B=32,V=1024,K=16 with E=4; 2 MB blocks were 3x slower).
    budget = 1 << 20
    tc = max(1, min(t_max, budget // (b_pad * v_pad * 4)))
    t_pad = _pad_up(t_max, tc)
    if (t_pad, b_pad, v_pad) != (t_max, b, v):
        x = jnp.pad(
            x,
            ((0, t_pad - t_max), (0, b_pad - b), (0, v_pad - v)),
            constant_values=_NEG_INF,
        )

    kern = partial(_topk_kernel, k)
    vspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                             memory_space=pltpu.VMEM)
    vals, idxs = pl.pallas_call(
        kern,
        grid=(t_pad // tc,),
        in_specs=[vspec((tc, b_pad, v_pad), lambda i: (i, 0, 0))],
        out_specs=[
            vspec((tc, b_pad, k), lambda i: (i, 0, 0)),
            vspec((tc, b_pad, k), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, b_pad, k), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tc, b_pad, v_pad), jnp.float32)],
        interpret=interpret,
    )(x)
    return vals[:t_max, :b], idxs[:t_max, :b]
