"""RNN-T (transducer) greedy decoding — frame-synchronous, one XLA scan.

Companion to ``ops/rnnt_loss.py`` (the transducer family is beyond the
reference's CTC surface — see that module's docstring).  Decoding a
transducer is inherently sequential in a way CTC is not: the joint network
consumes the PREDICTOR state, which depends on the tokens emitted so far,
so there is no precomputable (T, V) lattice.  The TPU-native shape of that
loop:

  * one ``lax.scan`` over a static step budget of T + S_cap steps — each
    step either consumes a frame (blank) or emits a token (label), and a
    greedy pass never needs more steps than frames + emissions;
  * the whole batch advances in lockstep through the scan, but each
    sample's (t, u) cursor advances independently through masks — no
    dynamic shapes, no per-sample host loops (the reference decodes
    per-sample inside C++ threads; SURVEY.md §3.1 N2/N4);
  * the predictor step and the joint run batched over N once per step
    (MXU matmuls for real models), never per candidate.

Protocol (matches the functional GRU in ``ops/neural_lm.py``):
  predictor_step(hidden, token) -> hidden'   (single sample; vmapped here)
  joint_fn(f_vec, hidden) -> (V,) logits     (single sample; vmapped here)

``max_symbols_per_frame`` bounds consecutive emissions at one frame (the
standard transducer safety valve against non-blank loops); when the cap
hits, the decoder consumes the frame's blank and moves on.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .indexing import flat_take


@partial(jax.jit, static_argnames=("pred_step", "joint_fn", "blank",
                                   "s_cap", "max_per_frame", "n_steps"))
def _rnnt_greedy_jit(enc, il, hidden0, pred_step, joint_fn, blank, s_cap,
                     max_per_frame, n_steps):
    n, t_max, h_enc = enc.shape
    enc_flat = enc.reshape(n * t_max, h_enc)
    row0 = jnp.arange(n, dtype=jnp.int32) * t_max
    u_iota = jnp.arange(s_cap, dtype=jnp.int32)[None]      # (1, s_cap)

    step_b = jax.vmap(pred_step)
    joint_b = jax.vmap(joint_fn)

    def body(carry, _):
        t, u, syms, hidden, tokens, times, score = carry
        f_t = enc_flat[row0 + jnp.minimum(t, t_max - 1)]    # (N, H)
        lp = jax.nn.log_softmax(joint_b(f_t, hidden), axis=-1)
        k = jnp.argmax(lp, axis=-1).astype(jnp.int32)       # (N,)
        active = t < il
        forced = (syms >= max_per_frame) | (u >= s_cap)
        is_blank = (k == blank) | forced | ~active
        emit = active & ~is_blank

        wmask = emit[:, None] & (u_iota == u[:, None])      # (N, s_cap)
        tokens = jnp.where(wmask, k[:, None], tokens)
        times = jnp.where(wmask, t[:, None], times)

        hidden_adv = step_b(hidden, k)
        hidden = jax.tree.map(
            lambda a, b: jnp.where(
                emit.reshape((n,) + (1,) * (a.ndim - 1)), a, b),
            hidden_adv, hidden)

        lp_blank = lp[:, blank]
        lp_k = flat_take(lp, k[:, None])[:, 0]
        score = score + jnp.where(active,
                                  jnp.where(is_blank, lp_blank, lp_k), 0.0)
        t = t + is_blank.astype(jnp.int32) * active.astype(jnp.int32)
        u = u + emit.astype(jnp.int32)
        syms = jnp.where(is_blank, 0, syms + 1)
        return (t, u, syms, hidden, tokens, times, score), None

    zi = jnp.zeros((n,), jnp.int32)
    tokens0 = jnp.full((n, s_cap), -1, jnp.int32)
    times0 = jnp.full((n, s_cap), -1, jnp.int32)
    carry0 = (zi, zi, zi, hidden0, tokens0, times0,
              jnp.zeros((n,), jnp.float32))
    (t, u, _, _, tokens, times, score), _ = jax.lax.scan(
        body, carry0, None, length=n_steps)
    return tokens, u, score, times


def rnnt_greedy_decode(encoder_out, input_lengths, predictor_step,
                       init_hidden, joint_fn, *, blank: int = 0,
                       max_symbols: int | None = None,
                       max_symbols_per_frame: int = 4,
                       return_timestamps: bool = False):
    """Batched greedy transducer decoding.

    Args:
      encoder_out: (N, T, H_enc) acoustic encoder outputs.
      input_lengths: (N,) valid frames per sample.
      predictor_step: `(hidden, token) -> hidden'` for ONE sample (pytree
        hidden, scalar int32 token); vmapped over the batch here.  E.g.
        `partial(gru_step, params)` from ops/neural_lm.py.
      init_hidden: per-sample initial predictor state WITHOUT the batch
        axis (broadcast here), i.e. the state encoding the empty prefix
        (bake in an SOS step if the model uses one).
      joint_fn: `(f_vec, hidden) -> (V,) logits` for one sample; vmapped.
      blank: blank id.
      max_symbols: cap on total emitted tokens (default min(T, 256)); also
        the width of the returned token buffer.
      max_symbols_per_frame: consecutive-emission cap per frame.
      return_timestamps: also return per-token emission frames (N, S_cap).

    Returns:
      (tokens (N, S_cap) int32 -1-padded, lengths (N,), scores (N,)) and,
      with `return_timestamps`, times (N, S_cap).  `scores` is the log
      probability of the decoded alignment path (greedy path score).
    """
    enc = jnp.asarray(encoder_out, jnp.float32)
    if enc.ndim != 3:
        raise ValueError(f"encoder_out must be (N, T, H), got {enc.shape}")
    n, t_max, _ = enc.shape
    if input_lengths is None:
        input_lengths = np.full((n,), t_max, np.int32)
    il = jnp.asarray(input_lengths, jnp.int32)
    s_cap = int(max_symbols or min(t_max, 256))
    hidden0 = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (n,) + jnp.asarray(x).shape),
        init_hidden)
    n_steps = t_max + s_cap
    out = _rnnt_greedy_jit(enc, il, hidden0, predictor_step, joint_fn,
                           int(blank), s_cap, int(max_symbols_per_frame),
                           n_steps)
    return out if return_timestamps else out[:3]


def additive_joint(w_enc, w_pred, b_joint, w_out, b_out):
    """The standard additive transducer joint as a protocol `joint_fn`:
    ``logits = W_out · tanh(W_enc f + W_pred h + b) + b_out``.

    Returns a closure suitable for `rnnt_greedy_decode` / the fused loss;
    `hidden` is the predictor output vector (for composite predictor
    states pass a wrapper that extracts the output leaf).
    """
    def joint_fn(f_vec, h_vec):
        z = jnp.tanh(f_vec @ w_enc + h_vec @ w_pred + b_joint)
        return z @ w_out + b_out
    return joint_fn
