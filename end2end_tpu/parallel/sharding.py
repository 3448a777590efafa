"""Multi-chip parallelism for the CTC stack.

The reference is a single-process CPU library whose only parallelism is a
thread pool over batch items (SURVEY.md §3.3).  The TPU-native counterpart is
batch-dimension sharding over a `jax.sharding.Mesh`: losses and decoders are
per-sample, so data parallelism is exact — each chip owns a batch shard, the
only communication is the final mean/sum reduction, which XLA lowers to a
`psum` over ICI (SURVEY.md §3.3, §7 comm-backend row: no NCCL/MPI analog
needed; JAX collectives + GSPMD own the wire).

Two styles, both exposed:
  * `shard_batch(...)` + plain jit — GSPMD partitions the compiled program
    from input shardings (recommended: composes with any surrounding model).
  * `ctc_loss_data_parallel(...)` — explicit `jax.shard_map` with a psum-mean
    inside, for callers who want guaranteed-local compute + one collective.

Tested on a virtual 8-device CPU mesh (tests/test_sharding.py); the same code
drives N real chips over ICI unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ctc_loss_xla import ctc_nll_xla
from ..ops.greedy import greedy_decode


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over the first n devices (default: all local devices)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(mesh: Mesh, log_probs, targets, input_lengths, target_lengths,
                axis_name: str = "data"):
    """Place a CTC problem with the batch dim sharded over the mesh.

    log_probs is (T, N, C) — batch is axis 1; everything else axis 0.
    """
    s_lp = NamedSharding(mesh, P(None, axis_name, None))
    s_n = NamedSharding(mesh, P(axis_name))
    return (
        jax.device_put(log_probs, s_lp),
        jax.device_put(targets, NamedSharding(mesh, P(axis_name, None))),
        jax.device_put(input_lengths, s_n),
        jax.device_put(target_lengths, s_n),
    )


def ctc_loss_data_parallel(
    log_probs, targets, input_lengths, target_lengths,
    mesh: Mesh, blank: int = 0, reduction: str = "mean",
    zero_infinity: bool = False, axis_name: str = "data",
):
    """Explicit shard_map data-parallel CTC loss.

    Each device runs the full forward-backward on its batch shard (zero
    communication); 'mean'/'sum' reductions psum across the mesh.  Gradients
    flow through (shard_map is differentiable; the custom VJP runs per-shard).
    """
    n = log_probs.shape[1]
    if n % mesh.devices.size:
        raise ValueError(
            f"batch {n} must divide evenly over {mesh.devices.size} devices"
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name, None), P(axis_name), P(axis_name)),
        out_specs=P(axis_name) if reduction == "none" else P(),
    )
    def shard_fn(lp, tgt, il, tl):
        nll = ctc_nll_xla(lp, tgt, il, tl, blank)
        if zero_infinity:
            nll = jnp.where(jnp.isinf(nll), 0.0, nll)
        if reduction == "none":
            return nll
        if reduction == "sum":
            return jax.lax.psum(jnp.sum(nll), axis_name)
        denom = jnp.maximum(tl, 1).astype(nll.dtype)
        return jax.lax.psum(jnp.sum(nll / denom), axis_name) / n

    return shard_fn(log_probs, targets, input_lengths, target_lengths)


def rnnt_loss_data_parallel(
    joint, targets, input_lengths, target_lengths,
    mesh: Mesh, blank: int = 0, reduction: str = "mean",
    from_logits: bool = True, axis_name: str = "data",
):
    """Explicit shard_map data-parallel transducer loss.

    Same shape as `ctc_loss_data_parallel`: each device runs the wavefront
    DP (ops/rnnt_loss.py) on its batch shard with zero communication;
    'mean'/'sum' psum across the mesh ('mean' is the plain batch mean —
    the transducer convention, see rnnt_loss)."""
    from ..ops.rnnt_loss import rnnt_nll

    n = joint.shape[0]
    if n % mesh.devices.size:
        raise ValueError(
            f"batch {n} must divide evenly over {mesh.devices.size} devices"
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name) if reduction == "none" else P(),
    )
    def shard_fn(j, tgt, il, tl):
        nll = rnnt_nll(j, tgt, il, tl, blank=blank, from_logits=from_logits)
        if reduction == "none":
            return nll
        if reduction == "sum":
            return jax.lax.psum(jnp.sum(nll), axis_name)
        return jax.lax.psum(jnp.sum(nll), axis_name) / n

    return shard_fn(joint, targets, input_lengths, target_lengths)


def greedy_decode_data_parallel(log_probs, input_lengths, mesh: Mesh,
                                blank: int = 0, axis_name: str = "data"):
    """Batch-sharded greedy decode: zero communication, pure map."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name)),
        out_specs=(P(axis_name, None), P(axis_name), P(axis_name)),
    )
    def shard_fn(lp, il):
        return greedy_decode(lp, il, blank=blank)

    return shard_fn(log_probs, input_lengths)


def _check_batch(n, mesh):
    if n % mesh.devices.size:
        raise ValueError(
            f"batch {n} must divide evenly over {mesh.devices.size} devices"
        )


def rnnt_greedy_decode_data_parallel(encoder_out, input_lengths,
                                     predictor_step, init_hidden, joint_fn,
                                     mesh: Mesh, axis_name: str = "data",
                                     **kwargs):
    """Batch-sharded transducer greedy decode (ops/rnnt_decode.py).

    The decode is per-sample — cursors, predictor state, and token buffers
    all carry a leading batch axis — so DP is exact and communication-free:
    each device runs the full frame-synchronous scan on its batch shard.
    Predictor params / joint weights live inside `predictor_step` /
    `joint_fn` closures as concrete arrays and are replicated as shard_map
    constants (pass them pre-sharded via GSPMD if they ever need to be
    model-sharded too).  kwargs are `rnnt_greedy_decode`'s (blank,
    max_symbols, lookahead, return_timestamps, ...)."""
    from ..ops.rnnt_decode import rnnt_greedy_decode

    _check_batch(encoder_out.shape[0], mesh)
    n_out = 4 if kwargs.get("return_timestamps") else 3

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name),) * n_out,
        check_vma=False,  # per-sample map, no collectives: the decode's
        # internal scan carries start as unvarying constants
    )
    def shard_fn(enc, il):
        return rnnt_greedy_decode(enc, il, predictor_step, init_hidden,
                                  joint_fn, **kwargs)

    return shard_fn(encoder_out, jnp.asarray(input_lengths, jnp.int32))


def rnnt_beam_decode_data_parallel(encoder_out, input_lengths,
                                   predictor_step, init_hidden, joint_fn,
                                   mesh: Mesh, axis_name: str = "data",
                                   **kwargs):
    """Batch-sharded ALSD transducer beam search — exact, zero
    communication (beam state is per-sample; see
    `rnnt_greedy_decode_data_parallel` for the closure convention).
    kwargs are `rnnt_beam_decode`'s (beam_width, prune_k, lookahead, lm,
    ...); LM tables inside `lm` are replicated shard_map constants."""
    from ..ops.rnnt_decode import rnnt_beam_decode

    _check_batch(encoder_out.shape[0], mesh)
    n_out = 4 if kwargs.get("return_timestamps") else 3

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name),) * n_out,
        check_vma=False,  # per-sample map, no collectives: the decode's
        # internal scan carries start as unvarying constants
    )
    def shard_fn(enc, il):
        return rnnt_beam_decode(enc, il, predictor_step, init_hidden,
                                joint_fn, **kwargs)

    return shard_fn(encoder_out, jnp.asarray(input_lengths, jnp.int32))


class DataParallelStreamingRNNT:
    """Batch-shard a streaming transducer decoder's carried state over a
    mesh (SURVEY.md §5.2 item 6 for the RNN-T family).

    Wraps a `StreamingRNNTGreedyDecoder` or `StreamingRNNTBeamDecoder`
    (ops/streaming_decode.py): every leaf of the carried state — (t, u)
    cursors, predictor hidden, beam hashes/scores/token buffers, LM state,
    frame history, availability counters — has a leading batch axis, so
    the state lives sharded on the devices across the stream's whole
    lifetime and each `step`/`finish` is a communication-free shard_map.
    Results are exactly the wrapped decoder's (same compiled scans on the
    shard).

      dp = DataParallelStreamingRNNT(dec, mesh)
      st = dp.init(batch, h_enc)           # state placed sharded
      st = dp.step(st, chunk, chunk_len)   # chunk (N, Tc, H) batch-sharded
      tokens, lens, scores = dp.finish(st)
    """

    def __init__(self, decoder, mesh: Mesh, axis_name: str = "data"):
        self.dec = decoder
        self.mesh = mesh
        self.axis = axis_name

    def _shard(self, tree):
        s = NamedSharding(self.mesh, P(self.axis))
        return jax.device_put(tree, jax.tree.map(lambda _: s, tree))

    def init(self, batch_size: int, *args):
        _check_batch(batch_size, self.mesh)
        return self._shard(self.dec.init(batch_size, *args))

    def step(self, state, encoder_chunk, chunk_lengths=None):
        n, tc, _ = encoder_chunk.shape
        if chunk_lengths is None:
            chunk_lengths = np.full((n,), tc, np.int32)
        p = P(self.axis)

        @partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(p, p, p), out_specs=p, check_vma=False,
        )
        def shard_fn(st, chunk, cl):
            return self.dec.step(st, chunk, cl)

        return shard_fn(state, jnp.asarray(encoder_chunk, jnp.float32),
                        jnp.asarray(chunk_lengths, jnp.int32))

    def finish(self, state, return_timestamps: bool = False):
        p = P(self.axis)
        n_out = 4 if return_timestamps else 3

        @partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(p,), out_specs=(p,) * n_out, check_vma=False,
        )
        def shard_fn(st):
            return self.dec.finish(st, return_timestamps=return_timestamps)

        return shard_fn(state)
