"""Minimum expected word/token error rate (MWER / MBR) training loss.

Sequence-discriminative fine-tuning for CTC models, built from this
library's own primitives and fully on-device:

  1. decode an N-best list with the (non-differentiable) beam search,
  2. score each hypothesis EXACTLY under the model — the CTC negative log
     likelihood of the hypothesis as if it were the target, i.e. the sum
     over all alignments that collapse to it (`ctc_nll`, differentiable
     through the fused custom-VJP backward),
  3. renormalize the hypothesis scores into an N-best posterior,
  4. loss = posterior-weighted error regret vs the uniform N-best mean:
         L = sum_i  p_hat_i * (E_i - mean_j E_j)
     (Prabhavalkar et al. 2018, "Minimum Word Error Rate Training for
     Attention-based Sequence-to-Sequence Models", eq. 3 — the uniform-mean
     baseline keeps the value informative and the gradient variance low).

Gradients flow through the posterior only (the standard MWER estimator):
the N-best list and the error counts are treated as constants
(`stop_gradient`), and each hypothesis score is the exact CTC alignment
marginal, so the gradient teaches the model to redistribute probability
mass within the N-best toward low-error hypotheses.

Errors are Levenshtein distances computed on device with the jittable
anti-diagonal DP (`utils.metrics.batch_edit_distance`):

  * `err='token'` — distance on raw token id sequences (sMBR-style;
    exact for character models, where tokens ARE the eval unit).
  * `err='word'`, `space_id=` — sequences are segmented at a separator
    token and each word is replaced by a rolling FNV-1a hash of its token
    ids; the distance then counts whole-word edits (true WER up to
    astronomically unlikely 32-bit hash collisions between distinct words
    inside one utterance pair).

The reference library has no training objectives beyond the CTC loss
itself (SURVEY.md §1); MWER is the production fine-tuning step its users
graduate to, and it composes entirely from surfaces the reference DOES
have (beam N-best + loss), which is why it ships here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.metrics import batch_edit_distance
from .ctc_loss import ctc_nll
from .beam_search import beam_search_decode
from .fastmath import log_softmax_acc

_FNV_OFFSET = jnp.uint32(2166136261)
_FNV_PRIME = jnp.uint32(16777619)


def word_id_hashes(tokens, lengths, space_id: int, w_cap: int | None = None):
    """Segment padded token id rows at `space_id` and hash each word.

    tokens: (..., S) int32 padded; lengths: (...,) valid counts.
    Returns (word_hashes (..., w_cap) int32, word_counts (...,) int32) where
    word_hashes[i, k] is an FNV-1a hash of the k-th word's token ids
    (empty words from leading/trailing/double separators are skipped).
    Shape-static: w_cap defaults to S//2 + 1 (the maximum possible words).
    """
    tokens = jnp.asarray(tokens, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    batch_shape = tokens.shape[:-1]
    s = tokens.shape[-1]
    if w_cap is None:
        w_cap = s // 2 + 1
    flat = tokens.reshape(-1, s)
    flat_len = lengths.reshape(-1)
    n = flat.shape[0]

    def emit(out, nw, h, close):
        out = jnp.where(
            close[:, None]
            & (jnp.arange(w_cap)[None, :] == jnp.minimum(nw, w_cap - 1)[:, None]),
            h[:, None].astype(jnp.int32),
            out,
        )
        return out, nw + close.astype(jnp.int32)

    def step(carry, x):
        h, in_word, nw, out = carry
        tok, pos = x
        valid = pos < flat_len
        is_sep = valid & (tok == space_id)
        is_tok = valid & (tok != space_id)
        # a separator closes an open word BEFORE this position extends one
        close = is_sep & in_word
        out, nw = emit(out, nw, h, close)
        # extend the rolling hash with this token (+1 keeps id 0 visible)
        h_ext = (h ^ (tok + 1).astype(jnp.uint32)) * _FNV_PRIME
        h = jnp.where(is_tok, h_ext, jnp.where(is_sep, _FNV_OFFSET, h))
        in_word = (in_word | is_tok) & ~is_sep
        return (h, in_word, nw, out), None

    h0 = jnp.full((n,), _FNV_OFFSET)
    in0 = jnp.zeros((n,), bool)
    nw0 = jnp.zeros((n,), jnp.int32)
    out0 = jnp.zeros((n, w_cap), jnp.int32)
    (h, in_word, nw, out), _ = jax.lax.scan(
        step,
        (h0, in0, nw0, out0),
        (flat.T, jnp.arange(s, dtype=jnp.int32)),
    )
    # flush the final word (sequence end closes it)
    out, nw = emit(out, nw, h, in_word)
    return out.reshape(*batch_shape, w_cap), nw.reshape(batch_shape)


def _nbest_errors(hyp_tokens, hyp_lengths, ref_tokens, ref_lengths,
                  err: str, space_id):
    """(N, W) int32 Levenshtein errors of every hypothesis vs its reference."""
    n, w, s_cap = hyp_tokens.shape
    s_ref = ref_tokens.shape[-1]
    if err == "word":
        if space_id is None:
            raise ValueError("err='word' requires space_id")
        hyp_tokens, hyp_lengths = word_id_hashes(
            hyp_tokens, hyp_lengths, space_id)
        ref_tokens, ref_lengths = word_id_hashes(
            ref_tokens, ref_lengths, space_id)
        s_cap = hyp_tokens.shape[-1]
        s_ref = ref_tokens.shape[-1]
    elif err != "token":
        raise ValueError(f"invalid err {err!r} (want 'token' or 'word')")
    flat_hyp = hyp_tokens.reshape(n * w, s_cap)
    flat_hyp_len = hyp_lengths.reshape(n * w)
    rep_ref = jnp.repeat(ref_tokens, w, axis=0)
    rep_ref_len = jnp.repeat(ref_lengths, w, axis=0)
    d = batch_edit_distance(flat_hyp, flat_hyp_len, rep_ref, rep_ref_len)
    return d.reshape(n, w)


def mwer_loss_from_nbest(
    log_probs,
    input_lengths,
    hyp_tokens,
    hyp_lengths,
    ref_tokens,
    ref_lengths,
    hyp_valid=None,
    blank: int = 0,
    err: str = "token",
    space_id: int | None = None,
    scale: float = 1.0,
    reduction: str = "mean",
    score_implementation: str = "xla",
    return_aux: bool = False,
):
    """MWER loss over an externally supplied N-best list.

    Args:
      log_probs: (T, N, C) log-softmaxed activations (differentiable input).
      input_lengths: (N,) valid frame counts.
      hyp_tokens: (N, W, S_cap) int32 N-best token ids (no blanks).
      hyp_lengths: (N, W) int32 hypothesis lengths.
      ref_tokens: (N, S_ref) int32 reference transcripts (padded).
      ref_lengths: (N,) int32.
      hyp_valid: optional (N, W) bool — dead N-best slots to exclude
        (defaults to all valid; infeasible hypotheses whose CTC score is
        -inf are excluded automatically).
      err: 'token' (id-level edits) or 'word' (requires space_id).
      scale: posterior sharpness — p_hat = softmax(scale * score).
      reduction: 'none' | 'mean' | 'sum' over the batch.
      score_implementation: ctc_nll implementation for hypothesis scoring
        ('xla' default: vmaps over the W axis without W-fold activation
        materialization; the lattice work is inherently W x one loss).
      return_aux: also return a dict with the posterior, per-hyp errors,
        expected error, and hypothesis scores.

    Returns loss (scalar or (N,)), or (loss, aux) with return_aux.
    """
    if reduction not in ("none", "mean", "sum"):
        raise ValueError(f"invalid reduction {reduction!r}")
    log_probs = jnp.asarray(log_probs)
    hyp_tokens = jnp.asarray(hyp_tokens, jnp.int32)
    hyp_lengths = jnp.asarray(hyp_lengths, jnp.int32)
    ref_tokens = jnp.asarray(ref_tokens, jnp.int32)
    ref_lengths = jnp.asarray(ref_lengths, jnp.int32)
    input_lengths = jnp.asarray(input_lengths, jnp.int32)
    n, w, _ = hyp_tokens.shape

    # exact per-hypothesis CTC alignment marginal, differentiable;
    # vmap over the W axis broadcasts log_probs inside the scan (no
    # (T, N*W, C) materialization)
    nll = jax.vmap(
        lambda tok, ln: ctc_nll(
            log_probs, tok, input_lengths, ln, blank, score_implementation),
        in_axes=(1, 1),
        out_axes=1,
    )(hyp_tokens, hyp_lengths)          # (N, W)
    score = -nll

    errors = jax.lax.stop_gradient(
        _nbest_errors(hyp_tokens, hyp_lengths, ref_tokens, ref_lengths,
                      err, space_id)
    ).astype(log_probs.dtype)           # (N, W)
    return _combine_mwer(score, errors, hyp_valid, scale, reduction,
                         return_aux)


def _combine_mwer(score, errors, hyp_valid, scale, reduction, return_aux):
    """Posterior-weighted regret over (N, W) hypothesis scores — the
    loss-family-agnostic half of MWER, shared by the CTC and transducer
    entries (the score is the only differentiable input)."""
    valid = jnp.isfinite(score)
    if hyp_valid is not None:
        valid = valid & jnp.asarray(hyp_valid, bool)
    any_valid = jnp.any(valid, axis=1)

    neg_inf = jnp.asarray(-jnp.inf, score.dtype)
    logits = jnp.where(valid, scale * score, neg_inf)
    # guard fully-dead rows before softmax (softmax of all -inf is NaN)
    safe_logits = jnp.where(any_valid[:, None], logits, 0.0)
    posterior = jax.nn.softmax(safe_logits, axis=1)
    posterior = jnp.where(valid, posterior, 0.0)

    n_valid = jnp.maximum(jnp.sum(valid, axis=1), 1).astype(errors.dtype)
    mean_err = jnp.sum(jnp.where(valid, errors, 0.0), axis=1) / n_valid
    regret = errors - mean_err[:, None]
    per_sample = jnp.sum(jnp.where(valid, posterior * regret, 0.0), axis=1)
    per_sample = jnp.where(any_valid, per_sample, 0.0)

    if reduction == "mean":
        loss = jnp.mean(per_sample)
    elif reduction == "sum":
        loss = jnp.sum(per_sample)
    else:
        loss = per_sample
    if not return_aux:
        return loss
    expected_err = jnp.sum(jnp.where(valid, posterior * errors, 0.0), axis=1)
    aux = {
        "posterior": posterior,
        "errors": errors,
        "expected_error": jnp.where(any_valid, expected_err, 0.0),
        "scores": score,
        "valid": valid,
    }
    return loss, aux


def mwer_loss(
    log_probs,
    targets,
    input_lengths,
    target_lengths,
    beam_width: int = 4,
    blank: int = 0,
    prune_k: int | None = 16,
    max_symbols: int | None = None,
    lm=None,
    lm_alpha: float = 0.0,
    lm_beta: float = 0.0,
    err: str = "token",
    space_id: int | None = None,
    scale: float = 1.0,
    reduction: str = "mean",
    implementation: str = "auto",
    score_implementation: str = "xla",
    from_logits: bool = False,
    batch_first: bool = False,
    return_aux: bool = False,
):
    """Self-contained MWER loss: beam-decode an N-best list from the model's
    own activations, then `mwer_loss_from_nbest` on it.  All knobs are
    static (jit-friendly).  The decode runs under `stop_gradient` (the
    N-best list is a constant of the gradient); `implementation` routes the
    decode (Pallas kernel on TPU under 'auto'), `score_implementation` the
    differentiable hypothesis scoring.

    Typical fine-tuning composite: `ctc_loss(...) + lambda_mwer *
    mwer_loss(...)` (the CTC term regularizes the discriminative one).
    """
    log_probs = jnp.asarray(log_probs)
    if batch_first:
        log_probs = jnp.swapaxes(log_probs, 0, 1)
    if from_logits:
        log_probs = log_softmax_acc(log_probs, axis=-1)
    tokens, lengths, scores = beam_search_decode(
        jax.lax.stop_gradient(log_probs),
        input_lengths,
        beam_width=beam_width,
        blank=blank,
        prune_k=prune_k,
        max_symbols=max_symbols,
        lm=lm,
        lm_alpha=lm_alpha,
        lm_beta=lm_beta,
        implementation=implementation,
    )
    # dead beam slots surface as -inf decode scores
    hyp_valid = jnp.isfinite(scores)
    return mwer_loss_from_nbest(
        log_probs,
        input_lengths,
        tokens,
        lengths,
        targets,
        target_lengths,
        hyp_valid=hyp_valid,
        blank=blank,
        err=err,
        space_id=space_id,
        scale=scale,
        reduction=reduction,
        score_implementation=score_implementation,
        return_aux=return_aux,
    )


def rnnt_mwer_loss(
    encoder_out,
    input_lengths,
    targets,
    target_lengths,
    predictor_step,
    init_hidden,
    joint_fn,
    beam_width: int = 4,
    blank: int = 0,
    prune_k: int | None = None,
    max_symbols: int | None = None,
    lm=None,
    lm_alpha: float = 0.0,
    lm_beta: float = 0.0,
    err: str = "token",
    space_id: int | None = None,
    scale: float = 1.0,
    reduction: str = "mean",
    score_implementation: str = "auto",
    return_aux: bool = False,
):
    """MWER / MBR sequence-discriminative loss for the TRANSDUCER — the
    `mwer_loss` twin with ALSD N-best and exact `rnnt_nll` hypothesis
    scoring (Prabhavalkar et al. 2018 applied to RNN-T).

    The N-best list comes from `rnnt_beam_decode` under stop_gradient
    (the list is a constant of the gradient; LM fusion allowed — it only
    shapes the list).  Each hypothesis is then scored by its EXACT
    sequence log-probability: the predictor is unrolled over the
    hypothesis tokens, the joint lattice (N, T, S+1, V) is built for ONE
    hypothesis at a time (`lax.map` over the beam axis — peak memory is
    one lattice, not W), and `rnnt_nll` differentiates through
    `encoder_out` and any predictor/joint parameters captured in the
    closures (build them from traced params inside your loss function,
    the standard pattern).  Posterior-weighted regret as in `mwer_loss`.

    Args mirror `rnnt_beam_decode` + the `mwer_loss` knobs.  Returns loss
    (scalar or (N,)), or (loss, aux) with return_aux.
    """
    from .rnnt_decode import rnnt_beam_decode
    from .rnnt_loss import rnnt_nll

    if reduction not in ("none", "mean", "sum"):
        raise ValueError(f"invalid reduction {reduction!r}")
    enc = jnp.asarray(encoder_out, jnp.float32)
    il = jnp.asarray(input_lengths, jnp.int32)
    ref_tokens = jnp.asarray(targets, jnp.int32)
    ref_lengths = jnp.asarray(target_lengths, jnp.int32)
    n = enc.shape[0]

    hyp_tokens, hyp_lengths, dec_scores = rnnt_beam_decode(
        jax.lax.stop_gradient(enc), il, predictor_step, init_hidden,
        joint_fn, beam_width=beam_width, prune_k=prune_k, blank=blank,
        max_symbols=max_symbols, lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta)
    hyp_valid = jnp.isfinite(dec_scores) & (dec_scores > -1e29)
    s_cap = hyp_tokens.shape[-1]

    step_b = jax.vmap(predictor_step)
    h0 = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (n,) + jnp.asarray(x).shape),
        init_hidden)

    def hyp_nll(tok_len):
        tokens, lengths = tok_len                  # (N, S), (N,)
        toks = jnp.maximum(tokens, 0)

        def step(h, tok_col):
            h2 = step_b(h, tok_col)
            return h2, h2

        _, hs = jax.lax.scan(step, h0, toks.T)     # (S, N, ...)
        states = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0),
            h0, hs)                                # (S+1, N, ...)

        def one_sample(enc_n, hs_n):
            return jax.vmap(
                lambda f: jax.vmap(lambda h: joint_fn(f, h))(hs_n)
            )(enc_n)                               # (T, S+1, V)

        states_n = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1), states)
        logits = jax.vmap(one_sample)(enc, states_n)   # (N, T, S+1, V)
        return rnnt_nll(logits, toks, il, lengths, blank=blank,
                        implementation=score_implementation)

    # one hypothesis lattice at a time (W-fold peak memory would defeat
    # the point of scoring exactly)
    nll = jax.lax.map(hyp_nll, (jnp.moveaxis(hyp_tokens, 1, 0),
                                jnp.moveaxis(hyp_lengths, 1, 0)))
    score = -jnp.moveaxis(nll, 0, 1)               # (N, W)

    errors = jax.lax.stop_gradient(
        _nbest_errors(hyp_tokens, hyp_lengths, ref_tokens, ref_lengths,
                      err, space_id)).astype(jnp.float32)
    return _combine_mwer(score, errors, hyp_valid, scale, reduction,
                         return_aux)
