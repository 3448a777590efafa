"""Confidence estimation for CTC decodes (production serving surface).

The reference's ecosystem (NeMo-style ASR serving) attaches confidence
scores to recognition results so downstream consumers can gate on them
(reject low-confidence utterances, flag words for review).  This module
provides the standard entropy-family frame confidences computed directly
from the log-probability lattice, gathered per emitted token at its
emission frame, and aggregated per word / utterance — all jittable and
shape-static so the whole decode+confidence pipeline compiles into the
decode program (the gathers ride `ops.indexing.flat_take`, the measured
TPU-fast path).

Methods (all map a frame's distribution to [0, 1]; 1 = fully peaked):

  * ``max_prob``  — probability of the argmax token.
  * ``shannon``   — 1 − H(p)/ln V (linearly normalized Shannon entropy).
  * ``tsallis``   — 1 − S_α(p)/S_α(uniform), S_α = (Σp^α − 1)/(1 − α);
                    the NeMo default family, α ∈ (0, 1), default 1/3.
  * ``renyi``     — 1 − H_α(p)/ln V, H_α = ln(Σp^α)/(1 − α).

``exclude_blank=True`` conditions the distribution on "a token is emitted"
(renormalizes over non-blank symbols) before measuring — the usual choice
for per-token confidence, since blank mass says nothing about WHICH token
fires.  Aggregations: mean / min / prod (probability semantics).  An empty
hypothesis aggregates to 1.0 (the neutral element — nothing to be unsure
about); gate on length separately.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from .fastmath import exp32, log32, log_softmax_acc
from .indexing import flat_take

_METHODS = ("max_prob", "shannon", "tsallis", "renyi")
_AGGREGATIONS = ("mean", "min", "prod")


def frame_confidence(log_probs, method: str = "tsallis", alpha: float = 1 / 3,
                     blank: int = 0, exclude_blank: bool = False):
    """Per-frame confidence from a (T, N, V) (or any (..., V)) log-prob
    lattice.  Returns (...,) float32 in [0, 1]."""
    if method not in _METHODS:
        raise ValueError(f"invalid method {method!r} (want one of {_METHODS})")
    lp = jnp.asarray(log_probs, jnp.float32)
    v = lp.shape[-1]
    if exclude_blank:
        if v < 3:
            raise ValueError("exclude_blank needs at least 2 non-blank symbols")
        lp = jnp.where(jnp.arange(v) == blank, -jnp.inf, lp)
        lp = lp - jax.nn.logsumexp(lp, axis=-1, keepdims=True)
        v = v - 1
    if method == "max_prob":
        return jnp.exp(jnp.max(lp, axis=-1))
    # ln V is a host f64 constant: jnp.log would lower to the chip's
    # native f32 log, whose ~1e-5-class error lands in every frame score.
    log_v = float(np.log(float(v)))
    if method == "shannon":
        p = jnp.exp(lp)
        h = -jnp.sum(jnp.where(p > 0, p * lp, 0.0), axis=-1)
        return jnp.clip(1.0 - h / log_v, 0.0, 1.0)
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    # sum_c p^alpha via fastmath exp32 (~1 ulp): each term is in [0, 1]
    # since alpha*lp <= 0 (exp32 maps the -inf of excluded lanes to 0),
    # so the direct sum needs no logsumexp.  The TPU's native exp/log
    # carry ~1e-5-class error that breaks hand-computed parity on chip.
    sum_pa = jnp.sum(exp32(alpha * lp), axis=-1)
    if method == "tsallis":
        s = (sum_pa - 1.0) / (1.0 - alpha)
        s_max = (float(v) ** (1.0 - alpha) - 1.0) / (1.0 - alpha)
        return jnp.clip(1.0 - s / s_max, 0.0, 1.0)
    # renyi; sum p^alpha >= 1 for alpha < 1, inside log32's normal domain
    h = log32(sum_pa) / (1.0 - alpha)
    return jnp.clip(1.0 - h / log_v, 0.0, 1.0)


def token_confidence(frame_conf, times, lengths, time_axis_first: bool = True):
    """Gather per-token confidence at each token's emission frame.

    frame_conf: (T, N) (or (N, T) with time_axis_first=False) from
    `frame_confidence`; times: (N, ..., S) int32 emission frames as
    returned by the timestamped decoders (greedy (N, S); beam (N, W, S));
    lengths: (N, ...) decoded lengths.  Positions at or beyond the length
    return 0.  Jittable; one flat gather."""
    conf_nt = jnp.asarray(frame_conf, jnp.float32)
    if time_axis_first:
        conf_nt = conf_nt.T
    times = jnp.asarray(times, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    n, t = conf_nt.shape
    s = times.shape[-1]
    flat_idx = jnp.clip(times.reshape(n, -1), 0, t - 1)
    conf = flat_take(conf_nt, flat_idx).reshape(times.shape)
    valid = jnp.arange(s, dtype=jnp.int32) < lengths[..., None]
    return jnp.where(valid, conf, 0.0)


def aggregate_confidence(token_conf, lengths, how: str = "mean"):
    """Reduce per-token confidences (..., S) over each hypothesis's valid
    prefix.  how: 'mean' | 'min' | 'prod'.  Empty hypotheses give 1.0."""
    if how not in _AGGREGATIONS:
        raise ValueError(
            f"invalid aggregation {how!r} (want one of {_AGGREGATIONS})")
    token_conf = jnp.asarray(token_conf, jnp.float32)
    lengths = jnp.asarray(lengths, jnp.int32)
    s = token_conf.shape[-1]
    valid = jnp.arange(s, dtype=jnp.int32) < lengths[..., None]
    if how == "mean":
        total = jnp.sum(jnp.where(valid, token_conf, 0.0), axis=-1)
        return jnp.where(lengths > 0, total / jnp.maximum(lengths, 1), 1.0)
    if how == "min":
        return jnp.min(jnp.where(valid, token_conf, jnp.inf), axis=-1).clip(
            max=1.0)
    return jnp.prod(jnp.where(valid, token_conf, 1.0), axis=-1)


def greedy_decode_with_confidence(log_probs, input_lengths=None,
                                  blank: int = 0, method: str = "tsallis",
                                  alpha: float = 1 / 3,
                                  exclude_blank: bool = True,
                                  aggregation: str = "mean",
                                  pad_id: int = -1,
                                  from_logits: bool = False,
                                  batch_first: bool = False):
    """`greedy_decode_with_timestamps` + per-token and per-utterance
    confidence, in one compiled program.

    Returns (tokens (N, T), lengths (N,), scores (N,), times (N, T),
    token_conf (N, T) float32 [0 where padded], utt_conf (N,) float32).
    """
    from .greedy import greedy_decode_with_timestamps

    lp = jnp.asarray(log_probs)
    if batch_first:
        lp = jnp.swapaxes(lp, 0, 1)
    if from_logits:
        lp = log_softmax_acc(lp, axis=-1)
    tokens, lengths, scores, times = greedy_decode_with_timestamps(
        lp, input_lengths, blank=blank, pad_id=pad_id)
    fc = frame_confidence(lp, method=method, alpha=alpha, blank=blank,
                          exclude_blank=exclude_blank)
    tc = token_confidence(fc, jnp.where(times == pad_id, 0, times), lengths)
    return tokens, lengths, scores, times, tc, aggregate_confidence(
        tc, lengths, aggregation)


def word_confidences(ids, times, token_conf, space_id=None, alphabet=None,
                     boundary_ids=None, how: str = "min"):
    """Word-level (word, start_frame, end_frame, confidence) tuples —
    `utils.text.word_spans` joined with per-token confidences.

    ids/times/token_conf: ONE hypothesis's decoded ids, emission frames,
    and token confidences, trimmed to the decoded length.  Boundary
    regimes as in word_spans (exactly one of space_id / boundary_ids).
    Host-side convenience for presenting results."""
    if how not in _AGGREGATIONS:
        raise ValueError(
            f"invalid aggregation {how!r} (want one of {_AGGREGATIONS})")
    import numpy as np

    ids = [int(i) for i in ids]
    times_l = [int(t) for t in times]
    conf = [float(c) for c in token_conf]
    boundary = frozenset(int(b) for b in boundary_ids or ())
    if (space_id is None) == (not boundary):
        raise ValueError("pass exactly one of space_id / boundary_ids")
    out = []
    cur = []  # list of (id, time, conf)

    def flush():
        if cur:
            word = (alphabet.decode([i for i, _, _ in cur])
                    if alphabet is not None else [i for i, _, _ in cur])
            cs = [c for _, _, c in cur]
            agg = (float(np.mean(cs)) if how == "mean"
                   else float(min(cs)) if how == "min"
                   else float(np.prod(cs)))
            out.append((word, cur[0][1], cur[-1][1], agg))
        cur.clear()

    for i, t, c in zip(ids, times_l, conf):
        if space_id is not None and i == int(space_id):
            flush()
            continue
        if boundary and i in boundary:
            flush()
        cur.append((i, t, c))
    flush()
    return out


# --------------------------------------------------------------------------
# Transducer (RNN-T) confidence
# --------------------------------------------------------------------------

def rnnt_token_confidence(encoder_out, tokens, lengths, times,
                          predictor_step, init_hidden, joint_fn,
                          method: str = "tsallis", alpha: float = 1 / 3,
                          blank: int = 0, exclude_blank: bool = True,
                          aggregation: str = "mean"):
    """Entropy-family confidence for decoded TRANSDUCER hypotheses.

    The distribution that emitted token u is the joint softmax at
    (frame times[u], predictor state after tokens[:u]) — both are pure
    functions of the decode outputs, so the rows are recomputed here
    EXACTLY as the scan saw them (same predictor unroll, same joint):
    one batched predictor sweep over the hypothesis + one batched joint
    call per token position, no decoder changes.  Works for greedy
    shapes (tokens (N, S), times (N, S)) and beam shapes ((N, W, S)).

    Returns (token_conf, utterance_conf) with token_conf matching the
    tokens shape (0 where padded) and utterance_conf (N,) or (N, W).
    """
    enc = jnp.asarray(encoder_out, jnp.float32)
    tokens = jnp.asarray(tokens, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    times = jnp.asarray(times, jnp.int32)
    n, t_max, h_enc = enc.shape
    lead = tokens.shape[:-1]            # (N,) or (N, W)
    s = tokens.shape[-1]
    m = int(np.prod(lead))
    w = m // n
    toks = jnp.maximum(tokens.reshape(m, s), 0)
    lens = lengths.reshape(m)
    tms = jnp.clip(times.reshape(m, s), 0, t_max - 1)

    h0 = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (m,) + jnp.asarray(x).shape),
        init_hidden)
    step_b = jax.vmap(predictor_step)

    def step(h, tok_col):
        h2 = step_b(h, tok_col)
        return h2, h
    # prefix states h_u BEFORE consuming token u, for u = 0..S-1
    _, states = jax.lax.scan(step, h0, toks.T)          # (S, M, ...)

    # encoder rows at the emission frames (flat row gather)
    samp = jnp.arange(m, dtype=jnp.int32)[:, None] // max(w, 1)
    f_rows = enc.reshape(n * t_max, h_enc)[samp * t_max + tms]  # (M, S, H)

    joint_b = jax.vmap(joint_fn)

    def lp_col(args):
        f_col, h_col = args
        return log_softmax_acc(joint_b(f_col, h_col), axis=-1)
    lp = jax.lax.map(lp_col, (jnp.moveaxis(f_rows, 1, 0), states))  # (S,M,V)

    fc = frame_confidence(lp, method=method, alpha=alpha, blank=blank,
                          exclude_blank=exclude_blank).T        # (M, S)
    valid = jnp.arange(s, dtype=jnp.int32)[None] < lens[:, None]
    tc = jnp.where(valid, fc, 0.0)
    utt = aggregate_confidence(tc, lens, aggregation)
    return tc.reshape(lead + (s,)), utt.reshape(lead)


def rnnt_greedy_decode_with_confidence(encoder_out, input_lengths,
                                       predictor_step, init_hidden,
                                       joint_fn, blank: int = 0,
                                       max_symbols=None,
                                       max_symbols_per_frame: int = 4,
                                       method: str = "tsallis",
                                       alpha: float = 1 / 3,
                                       exclude_blank: bool = True,
                                       aggregation: str = "mean"):
    """`rnnt_greedy_decode` + per-token and per-utterance confidence in
    one compiled program (the transducer twin of
    `greedy_decode_with_confidence`).

    Returns (tokens, lengths, scores, times, token_conf, utt_conf).
    """
    from .rnnt_decode import rnnt_greedy_decode

    tokens, lengths, scores, times = rnnt_greedy_decode(
        encoder_out, input_lengths, predictor_step, init_hidden, joint_fn,
        blank=blank, max_symbols=max_symbols,
        max_symbols_per_frame=max_symbols_per_frame,
        return_timestamps=True)
    tc, utt = rnnt_token_confidence(
        encoder_out, tokens, lengths, jnp.where(times < 0, 0, times),
        predictor_step, init_hidden, joint_fn, method=method, alpha=alpha,
        blank=blank, exclude_blank=exclude_blank, aggregation=aggregation)
    return tokens, lengths, scores, times, tc, utt
