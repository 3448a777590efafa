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

A joint_fn exposing ``precompute_frames`` / ``from_projected`` (see
`FactoredAdditiveJoint`) gets the frame-side projection hoisted out of
the sequential loop — one batched MXU matmul up front instead of one
matmul per while_loop step on the latency-critical chain.

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


def _resolve_joint(joint_fn, enc):
    """Factored-joint fast path: if `joint_fn` exposes `precompute_frames`
    (see FactoredAdditiveJoint), project the encoder frames ONCE as a
    batched MXU matmul and hand the sequential loop the per-step
    `from_projected` call — the frame-side projection leaves the
    sequential dependency chain entirely.  Plain joint_fns pass through.
    `joint_fn` is a static argument, so this branches at trace time."""
    if hasattr(joint_fn, "precompute_frames"):
        return joint_fn.precompute_frames(enc), joint_fn.from_projected
    return enc, joint_fn


@partial(jax.jit, static_argnames=("pred_step", "joint_fn", "blank",
                                   "s_cap", "max_per_frame", "n_steps",
                                   "lookahead"))
def _rnnt_greedy_scan(enc, il, avail, t_off, carry0, pred_step, joint_fn,
                      blank, s_cap, max_per_frame, n_steps, lookahead=1):
    """The greedy decode over ONE encoder chunk, resumable.

    `carry0` holds per-sample (t, u, syms, hidden, tokens, times, score)
    with GLOBAL frame cursors t; `enc` is this chunk's frames (global
    frames [t_off, t_off + Tc)), `avail` (N,) the global frame count
    available so far.  A sample whose cursor reaches the chunk edge
    simply freezes (nothing advances), so stepping chunks reproduces the
    one-shot decode — the one-shot call IS this function with avail = il
    and t_off = 0.

    Round-4 fast path: the sequential loop is a `while_loop` that EXITS
    as soon as every sample is finished or symbol-capped (decisions and
    token/time buffers are identical to the fixed-length scan), and the
    remaining all-blank TAIL of capped samples — whose predictor state
    can never change again — is accounted in ONE batched joint pass
    (Σ_t log p(blank | t, h_final)).  Token/length/time outputs are
    bit-identical to the plain scan; the tail's blank mass is a
    vectorized frame sum, so SCORES past the cap match to f32 summation
    order (~1e-6) rather than bitwise — before the cap binds nothing
    differs at all.  At the bench shape (B=16, T=400, V=256, s_cap=128,
    emission-saturated random joints) this cuts 528 sequential steps to
    ~170 + one batched pass.

    `lookahead=F > 1` evaluates the joint for F CONSECUTIVE frames per
    sequential step (one (N*F)-row batched joint — the predictor state is
    loop-invariant while blanks are consumed) and consumes the leading
    run of blank frames plus at most one emission in a single step.
    Decisions are per-frame argmaxes of the same logits, so tokens,
    lengths, and timestamps are BIT-IDENTICAL to lookahead=1; scores sum
    the same per-frame terms (masked window sum vs sequential adds, f32
    re-association only).  Blank-dominated workloads — the realistic ASR
    regime, ~90% blank frames — cut sequential steps up to F×; the extra
    per-step rows ride the same dispatch latency."""
    enc, joint_one = _resolve_joint(joint_fn, enc)
    n, t_max, h_enc = enc.shape
    enc_flat = enc.reshape(n * t_max, h_enc)
    row0 = jnp.arange(n, dtype=jnp.int32) * t_max
    u_iota = jnp.arange(s_cap, dtype=jnp.int32)[None]      # (1, s_cap)

    step_b = jax.vmap(pred_step)
    joint_b = jax.vmap(joint_one)

    def step(carry):
        it, t, u, syms, hidden, tokens, times, score = carry
        t_loc = jnp.clip(t - t_off, 0, t_max - 1)
        f_t = enc_flat[row0 + t_loc]                        # (N, H)
        # Only argmax + two gathered log-probs are needed: one logsumexp
        # and two gathers instead of normalizing the full (N, V) row
        # (tokens bit-identical; scores move by f32 re-association ulps).
        logits = joint_b(f_t, hidden)                       # (N, V)
        m = jnp.max(logits, axis=-1)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1))
        k = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # (N,)
        active = (t < il) & (t < avail)
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

        lp_blank = logits[:, blank] - lse
        lp_k = flat_take(logits, k[:, None])[:, 0] - lse
        score = score + jnp.where(active,
                                  jnp.where(is_blank, lp_blank, lp_k), 0.0)
        t = t + is_blank.astype(jnp.int32) * active.astype(jnp.int32)
        u = u + emit.astype(jnp.int32)
        syms = jnp.where(is_blank, 0, jnp.where(emit, syms + 1, syms))
        return (it + 1, t, u, syms, hidden, tokens, times, score)

    F = int(lookahead)
    f_iota = jnp.arange(F, dtype=jnp.int32)[None]           # (1, F)

    def step_window(carry):
        """Lookahead step: consume the leading run of blank frames in the
        F-frame window (predictor state is invariant across blanks), then
        at most one emission — per-frame decisions identical to step()."""
        it, t, u, syms, hidden, tokens, times, score = carry
        t_loc = jnp.clip(t[:, None] + f_iota - t_off[:, None],
                         0, t_max - 1)                      # (N, F)
        f_nf = enc_flat[(row0[:, None] + t_loc).reshape(-1)]
        f_nf = f_nf.reshape(n, F, -1)                       # (N, F, H)
        logits = jax.vmap(jax.vmap(joint_one, in_axes=(0, None)))(
            f_nf, hidden)                                   # (N, F, V)
        m = jnp.max(logits, axis=-1)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), axis=-1))
        k_f = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (N, F)

        t_glob = t[:, None] + f_iota                        # (N, F)
        valid = (t_glob < il[:, None]) & (t_glob < avail[:, None])
        # forced blanks: total-symbol cap (any frame — u is invariant until
        # the window's single emission); consecutive-emission cap (frame 0
        # only — later frames follow >=1 consumed blank, so syms is 0 there)
        blank_eff = ((k_f == blank) | (u >= s_cap)[:, None]
                     | ((f_iota == 0) & (syms >= max_per_frame)[:, None]))
        consume = valid & blank_eff                         # leading blanks
        lead = jnp.cumprod(consume.astype(jnp.int32), axis=1).astype(bool)
        j = jnp.sum(lead.astype(jnp.int32), axis=1)         # (N,) 0..F

        sel = f_iota == jnp.minimum(j, F - 1)[:, None]      # stop frame
        stop_valid = jnp.any(sel & valid, axis=1)
        stop_blank = jnp.any(sel & blank_eff, axis=1)
        emit = (j < F) & stop_valid & ~stop_blank           # (N,)

        k = jnp.sum(jnp.where(sel, k_f, 0), axis=1)         # (N,)
        t_new = t + j                                       # emission frame
        wmask = emit[:, None] & (u_iota == u[:, None])      # (N, s_cap)
        tokens = jnp.where(wmask, k[:, None], tokens)
        times = jnp.where(wmask, t_new[:, None], times)

        hidden_adv = step_b(hidden, k)
        hidden = jax.tree.map(
            lambda a, b: jnp.where(
                emit.reshape((n,) + (1,) * (a.ndim - 1)), a, b),
            hidden_adv, hidden)

        lp_blank = logits[..., blank] - lse                 # (N, F)
        score = score + jnp.sum(jnp.where(lead, lp_blank, 0.0), axis=1)
        logits_stop = jnp.sum(jnp.where(sel[..., None], logits, 0.0),
                              axis=1)                       # (N, V)
        lse_stop = jnp.sum(jnp.where(sel, lse, 0.0), axis=1)
        lp_k = flat_take(logits_stop, k[:, None])[:, 0] - lse_stop
        score = score + jnp.where(emit, lp_k, 0.0)

        t = t_new
        u = u + emit.astype(jnp.int32)
        syms = jnp.where(emit, jnp.where(j > 0, 1, syms + 1),
                         jnp.where(j > 0, 0, syms))
        return (it + 1, t, u, syms, hidden, tokens, times, score)

    if F > 1:
        step = step_window

    def cond(carry):
        it, t, u, syms, hidden, tokens, times, score = carry
        live = (t < il) & (t < avail) & (u < s_cap)
        return (it < n_steps) & jnp.any(live)

    carry = jax.lax.while_loop(cond, step, (jnp.int32(0),) + tuple(carry0))
    _, t, u, syms, hidden, tokens, times, score = carry

    # ---- vectorized all-blank tail for symbol-capped samples ------------
    limit = jnp.minimum(il, avail)                          # (N,)
    capped = (u >= s_cap) & (t < limit)
    t_iota = jnp.arange(t_max, dtype=jnp.int32)[None]       # (1, Tc)
    logits = jax.vmap(lambda e_n, h_n: jax.vmap(
        lambda f: joint_one(f, h_n))(e_n))(enc, hidden)     # (N, Tc, V)
    lpb_all = jax.nn.log_softmax(logits, axis=-1)[..., blank]
    tmask = ((t_iota >= (t - t_off)[:, None])
             & (t_iota < (limit - t_off)[:, None]))
    tail = jnp.sum(jnp.where(tmask, lpb_all, 0.0), axis=1)
    score = score + jnp.where(capped, tail, 0.0)
    t = jnp.where(capped, limit, t)
    return (t, u, syms, hidden, tokens, times, score)


def _greedy_carry0(n, s_cap, hidden0):
    zi = jnp.zeros((n,), jnp.int32)
    return (zi, zi, zi, hidden0,
            jnp.full((n, s_cap), -1, jnp.int32),
            jnp.full((n, s_cap), -1, jnp.int32),
            jnp.zeros((n,), jnp.float32))


def rnnt_greedy_decode(encoder_out, input_lengths, predictor_step,
                       init_hidden, joint_fn, *, blank: int = 0,
                       max_symbols: int | None = None,
                       max_symbols_per_frame: int = 4,
                       lookahead: int = 1,
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
      lookahead: frames evaluated per sequential step (>=1).  Tokens,
        lengths, and timestamps are bit-identical for every value; scores
        match to f32 re-association.  >1 pays off on blank-dominated
        (realistic ASR) joints — up to `lookahead`x fewer sequential
        steps; 4-8 is a good range.
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
    carry = _rnnt_greedy_scan(
        enc, il, il, jnp.zeros_like(il), _greedy_carry0(n, s_cap, hidden0),
        predictor_step, joint_fn, int(blank), s_cap,
        int(max_symbols_per_frame), n_steps, int(lookahead))
    _, u, _, _, tokens, times, score = carry
    out = (tokens, u, score, times)
    return out if return_timestamps else out[:3]


_M1 = np.uint32(2654435761)        # dual rolling-hash multipliers — same
_M2 = np.uint32(0x85EBCA6B)        # scheme as ops/beam_search.py
_SEED1 = np.uint32(1)
_SEED2 = np.uint32(7)
_DEAD = np.uint32(0xDEAD0000)


def _masked_logsumexp(x, mask, axis):
    """logsumexp over `axis` counting only `mask`; empty -> LOG0."""
    from .semiring import LOG0, LOG0_THRESHOLD

    xm = jnp.where(mask, x, LOG0)
    m = jnp.max(xm, axis=axis)
    m_safe = jnp.maximum(m, LOG0)
    s = jnp.sum(jnp.where(mask, jnp.exp(x - jnp.expand_dims(m_safe, axis)),
                          0.0), axis=axis)
    out = m_safe + jnp.log(jnp.maximum(s, 1e-38))
    return jnp.where(m > LOG0_THRESHOLD, out, LOG0)


def _lm_score_nw(lm, state, ck):
    """Score per-beam candidate ids through the ShallowFusionLM protocol.

    The protocol's `score(state, ck)` takes ONE sample's (W, ...) state and
    a SHARED (K,) candidate id vector (the CTC frame-global prune).  ALSD
    proposes per-beam ids (N, W, K), so each beam is scored as its own
    width-1 protocol call (leaves sliced to (1, ...)), vmapped over beams
    and samples — every lm.py / NeuralLM implementation works unchanged,
    and the deferred-advance batching inside the LMs still sees a full
    (W,)-batched select.
    """
    def per_sample(st, ckn):
        st1 = jax.tree.map(lambda l: l[:, None], st)
        lp, ext = jax.vmap(lm.score)(st1, ckn)
        return lp[:, 0], jax.tree.map(lambda l: l[:, 0], ext)
    return jax.vmap(per_sample)(state, ck)


@partial(jax.jit, static_argnames=("pred_step", "joint_fn", "blank", "W",
                                   "K", "s_cap", "n_steps", "lm",
                                   "lm_alpha", "lm_beta", "lookahead"))
def _rnnt_beam_scan(enc, il, avail, t_off, carry0, pred_step, joint_fn,
                    blank, W, K, s_cap, n_steps, lm=None, lm_alpha=0.0,
                    lm_beta=0.0, lookahead=1):
    """Batched ALSD transducer beam search over ONE encoder chunk,
    resumable (see rnnt_beam_decode / StreamingRNNTBeamDecoder).

    Streaming semantics: ALSD keeps every live hypothesis of a sample at
    the same alignment length d = t + u, but different beams sit at
    different t — so the freeze at a chunk edge is WHOLE-SAMPLE: the
    moment any live beam's cursor needs a frame >= `avail`, that sample
    holds its entire carry until the next chunk supplies the frame.
    Pausing all beams together keeps the step counter d aligned, so the
    resumed trajectory — and therefore the exact prefix-merge invariant —
    is identical to the one-shot scan (which IS this function with
    avail = il, t_off = 0; frames are indexed at t - t_off)."""
    from .semiring import LOG0, LOG0_THRESHOLD

    enc, joint_one = _resolve_joint(joint_fn, enc)
    n, t_max, h_enc = enc.shape
    enc_flat = enc.reshape(n * t_max, h_enc)
    row0 = jnp.arange(n, dtype=jnp.int32)[:, None] * t_max   # (N, 1)
    u_iota = jnp.arange(s_cap, dtype=jnp.int32)[None, None]  # (1, 1, s_cap)
    C = W * (K + 1)
    arange_w = jnp.arange(W, dtype=jnp.uint32)
    arange_c = jnp.arange(C, dtype=jnp.uint32)
    cand_parent = jnp.repeat(jnp.arange(W, dtype=jnp.int32), K + 1)  # (C,)
    cand_is_tok = jnp.tile(
        jnp.arange(K + 1, dtype=jnp.int32) > 0, W)                   # (C,)

    step_b = jax.vmap(jax.vmap(pred_step))
    joint_b = jax.vmap(jax.vmap(joint_one))

    def select_core(t, u, score, h1, h2, lm_state, lp_blank, lpk, ck):
        """One EXACT ALSD candidate-generation + merge + top-W selection
        from NORMALIZED candidate log-probs (lp_blank (N, W); lpk/ck
        (N, W, K)).  Shared verbatim by the stepwise body and the
        lookahead mini-steps so the two paths cannot drift.  Returns the
        new (t, u, score, hash) state plus the selection metadata callers
        need to advance buffers / the predictor (parent, emit, tok, pt,
        pu) and the sample-level chunk-edge freeze flag."""
        alive = score > LOG0_THRESHOLD                       # (N, W)
        finished = (t >= il[:, None]) & alive
        live = alive & ~finished
        # chunk-edge freeze (one-shot: avail == il, never triggers)
        frozen = jnp.any(live & (t >= avail[:, None]), axis=1)  # (N,)

        # --- candidate generation: 1 blank/hold + K token extensions -----
        sc_b = score + jnp.where(live, lp_blank, 0.0)        # hold when done
        sc_b = jnp.where(alive, sc_b, LOG0)
        can_emit = live & (u < s_cap)
        # Shallow fusion: each token extension pays its LM delta UP FRONT
        # (steers pruning); hash-equal candidates share a prefix, hence an
        # identical cumulative LM total, so the exact logaddexp merge below
        # is untouched by the bonus.  Blank/hold candidates carry no delta.
        if lm is not None:
            lm_lp, lm_ext = _lm_score_nw(lm, lm_state, ck)   # (N, W, K)
            lpk = lpk + lm_alpha * lm_lp + lm_beta
        else:
            lm_ext = None
        sc_k = jnp.where(can_emit[:, :, None], score[:, :, None] + lpk, LOG0)

        cand_sc = jnp.concatenate([sc_b[:, :, None], sc_k], axis=2)
        cand_sc = cand_sc.reshape(n, C)
        cand_tok = jnp.concatenate(
            [jnp.full((n, W, 1), -1, jnp.int32), ck], axis=2).reshape(n, C)
        ch1 = jnp.concatenate(
            [h1[:, :, None], h1[:, :, None] * _M1 + ck.astype(jnp.uint32)],
            axis=2).reshape(n, C)
        ch2 = jnp.concatenate(
            [h2[:, :, None], h2[:, :, None] * _M2 + ck.astype(jnp.uint32)],
            axis=2).reshape(n, C)
        cand_dead = cand_sc <= LOG0_THRESHOLD
        ch1 = jnp.where(cand_dead, _DEAD + np.uint32(0x100) + arange_c, ch1)
        ch2 = jnp.where(cand_dead, _DEAD + np.uint32(0x100) + arange_c, ch2)

        # --- exact merge: equal prefix => same (t, u) state under the ----
        # ALSD invariant (module docstring), so hash-equal candidates are
        # the same search state and their alignment masses logaddexp.
        eq = (ch1[:, :, None] == ch1[:, None, :]) \
            & (ch2[:, :, None] == ch2[:, None, :])           # (N, C, C)
        first = jnp.argmax(eq, axis=2).astype(jnp.int32)     # first equal
        is_rep = first == jnp.arange(C, dtype=jnp.int32)[None, :]
        merged = _masked_logsumexp(cand_sc[:, None, :], eq, axis=2)
        merged = jnp.where(is_rep, merged, LOG0)

        new_score, sel = jax.lax.top_k(merged, W)            # (N, W) sorted
        parent = jnp.take_along_axis(
            cand_parent[None].repeat(n, 0), sel, axis=1)     # (N, W)
        emit = jnp.take_along_axis(
            cand_is_tok[None].repeat(n, 0), sel, axis=1) > 0
        tok = jnp.take_along_axis(cand_tok, sel, axis=1)
        nh1 = jnp.take_along_axis(ch1, sel, axis=1)
        nh2 = jnp.take_along_axis(ch2, sel, axis=1)
        new_alive = new_score > LOG0_THRESHOLD
        emit = emit & new_alive

        gpar = lambda a: jnp.take_along_axis(a, parent, axis=1)
        pt, pu = gpar(t), gpar(u)
        pfin = jnp.take_along_axis(finished, parent, axis=1)
        new_t = jnp.where(pfin | emit, pt, pt + 1)
        new_u = pu + emit.astype(jnp.int32)

        nh1 = jnp.where(new_alive, nh1, _DEAD + arange_w[None])
        nh2 = jnp.where(new_alive, nh2, _DEAD + arange_w[None])
        new_u = jnp.where(new_alive, new_u, 0)
        new_t = jnp.where(new_alive, new_t, 0)
        return dict(t=new_t, u=new_u, score=new_score, h1=nh1, h2=nh2,
                    parent=parent, emit=emit, tok=tok, pt=pt, pu=pu,
                    sel=sel, lm_ext=lm_ext, frozen=frozen)

    def body(carry, _):
        it, t, u, score, h1, h2, tokens, times, hidden, lm_state = carry
        t_loc = jnp.clip(t - t_off[:, None], 0, t_max - 1)
        f = enc_flat[(row0 + t_loc).reshape(-1)]
        f = f.reshape(n, W, h_enc)
        # Normalize only what the candidates read: blank + top-K rows get
        # a shared per-row logsumexp instead of a full (N, W, V) normalize
        # (top-K order on logits == on log-probs; scores move by ulps).
        logits = joint_b(f, hidden)                          # (N, W, V)
        m = jnp.max(logits, axis=-1)
        lse = m + jnp.log(
            jnp.sum(jnp.exp(logits - m[..., None]), axis=-1))
        lp_blank = logits[..., blank] - lse
        lgnb = logits.at[..., blank].set(LOG0)
        lgk, ck = jax.lax.top_k(lgnb, K)                     # (N, W, K)
        lpk = lgk - lse[..., None]

        s = select_core(t, u, score, h1, h2, lm_state, lp_blank, lpk, ck)
        parent, emit, tok = s["parent"], s["emit"], s["tok"]

        ptokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
        ptimes = jnp.take_along_axis(times, parent[:, :, None], axis=1)
        wmask = emit[:, :, None] & (u_iota == s["pu"][:, :, None])
        new_tokens = jnp.where(wmask, tok[:, :, None], ptokens)
        new_times = jnp.where(wmask, s["pt"][:, :, None], ptimes)

        # deferred predictor advance: ONE batched step per surviving beam
        phid = jax.tree.map(
            lambda a: jnp.take_along_axis(
                a, parent.reshape((n, W) + (1,) * (a.ndim - 2)), axis=1),
            hidden)
        hid_adv = step_b(phid, jnp.maximum(tok, 0))
        new_hidden = jax.tree.map(
            lambda a, b: jnp.where(
                emit.reshape((n, W) + (1,) * (a.ndim - 2)), a, b),
            hid_adv, phid)

        if lm is not None:
            # LM-state re-homing mirrors the predictor: representative
            # candidate of a merged set has the merged prefix's state.
            kk = jnp.maximum(s["sel"] % (K + 1) - 1, 0).astype(jnp.int32)
            new_lm_state = jax.vmap(lm.select)(lm_state, s["lm_ext"],
                                               parent, kk, ~emit)
        else:
            new_lm_state = lm_state

        new_carry = (s["t"], s["u"], s["score"], s["h1"], s["h2"],
                     new_tokens, new_times, new_hidden, new_lm_state)
        # frozen samples hold their ENTIRE carry (the step never happened)
        hold = jax.tree.map(
            lambda a, b: jnp.where(
                s["frozen"].reshape((n,) + (1,) * (a.ndim - 1)), b, a),
            new_carry, carry[1:])
        return (it + 1,) + tuple(hold), None

    F = int(lookahead)
    f_iota_w = jnp.arange(F, dtype=jnp.int32)[None, None]     # (1, 1, F)

    def window_body(carry, _):
        """Lookahead window: evaluate the joint for F CONSECUTIVE frames of
        every beam in ONE batched pass (the predictor state — and hence the
        joint's h-side — is loop-invariant while only blanks are selected),
        then replay up to F EXACT ALSD steps from the precomputed candidate
        log-probs inside the same dispatch, stopping at the first step that
        selects any emission (that step is applied in full) or freezes at a
        chunk edge.  Each mini-step runs the same `select_core` as the
        stepwise body, so beams, merges, and scores are step-identical; the
        predictor advance and the token/time/hash/hidden buffer moves are
        deferred past the mini-scan through the composed beam permutation
        (blank steps only ever PERMUTE those buffers; the single emission
        is applied once at the end).  Blank-dominated workloads cut
        sequential dispatches up to F-fold."""
        it, t, u, score, h1, h2, tokens, times, hidden, lm_state = carry
        t_loc = jnp.clip(t[:, :, None] + f_iota_w - t_off[:, None, None],
                         0, t_max - 1)                        # (N, W, F)
        f = enc_flat[(row0[:, :, None] + t_loc).reshape(-1)]
        f = f.reshape(n, W, F, h_enc)
        logits = jax.vmap(jax.vmap(jax.vmap(
            joint_one, in_axes=(0, None))))(f, hidden)        # (N, W, F, V)
        m = jnp.max(logits, axis=-1)
        lse = m + jnp.log(
            jnp.sum(jnp.exp(logits - m[..., None]), axis=-1))
        lpb_w = logits[..., blank] - lse                      # (N, W, F)
        lgnb = logits.at[..., blank].set(LOG0)
        lgk, ck_w = jax.lax.top_k(lgnb, K)                    # (N, W, F, K)
        lpk_w = lgk - lse[..., None]

        def mini(st, j):
            stopped, mt, mu, msc, perm, emit_p, tok_p, pu_p, pt_p = st
            h1c = jnp.take_along_axis(h1, perm, axis=1)
            h2c = jnp.take_along_axis(h2, perm, axis=1)
            lpb_j = jnp.take_along_axis(
                jax.lax.dynamic_slice_in_dim(lpb_w, j, 1, 2)[:, :, 0],
                perm, axis=1)
            lpk_j = jnp.take_along_axis(
                jax.lax.dynamic_slice_in_dim(lpk_w, j, 1, 2)[:, :, 0, :],
                perm[:, :, None], axis=1)
            ck_j = jnp.take_along_axis(
                jax.lax.dynamic_slice_in_dim(ck_w, j, 1, 2)[:, :, 0, :],
                perm[:, :, None], axis=1)
            s = select_core(mt, mu, msc, h1c, h2c, None, lpb_j, lpk_j, ck_j)
            any_emit = jnp.any(s["emit"], axis=1)             # (N,)
            apply = ~stopped & ~s["frozen"]
            ap = lambda new, old: jnp.where(
                apply.reshape((n,) + (1,) * (new.ndim - 1)), new, old)
            mt = ap(s["t"], mt)
            mu = ap(s["u"], mu)
            msc = ap(s["score"], msc)
            perm = ap(jnp.take_along_axis(perm, s["parent"], axis=1), perm)
            rec = apply & any_emit                            # stop step
            rc = lambda new, old: jnp.where(
                rec.reshape((n,) + (1,) * (new.ndim - 1)), new, old)
            emit_p = rc(s["emit"], emit_p)
            tok_p = rc(s["tok"], tok_p)
            pu_p = rc(s["pu"], pu_p)
            pt_p = rc(s["pt"], pt_p)
            stopped = stopped | s["frozen"] | rec
            return (stopped, mt, mu, msc, perm, emit_p, tok_p, pu_p,
                    pt_p), None

        perm0 = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32)[None], (n, W))
        init = (jnp.zeros((n,), bool), t, u, score, perm0,
                jnp.zeros((n, W), bool), jnp.full((n, W), -1, jnp.int32),
                jnp.zeros((n, W), jnp.int32), jnp.zeros((n, W), jnp.int32))
        (stopped, mt, mu, msc, perm, emit_p, tok_p, pu_p, pt_p), _ = \
            jax.lax.scan(mini, init, jnp.arange(F))

        # Deferred buffer moves: all pre-stop steps only permuted beams.
        alive_f = msc > LOG0_THRESHOLD
        base_h1 = jnp.take_along_axis(h1, perm, axis=1)
        base_h2 = jnp.take_along_axis(h2, perm, axis=1)
        tok_u = jnp.maximum(tok_p, 0).astype(jnp.uint32)
        nh1 = jnp.where(emit_p, base_h1 * _M1 + tok_u, base_h1)
        nh2 = jnp.where(emit_p, base_h2 * _M2 + tok_u, base_h2)
        nh1 = jnp.where(alive_f, nh1, _DEAD + arange_w[None])
        nh2 = jnp.where(alive_f, nh2, _DEAD + arange_w[None])

        ptokens = jnp.take_along_axis(tokens, perm[:, :, None], axis=1)
        ptimes = jnp.take_along_axis(times, perm[:, :, None], axis=1)
        wmask = emit_p[:, :, None] & (u_iota == pu_p[:, :, None])
        new_tokens = jnp.where(wmask, tok_p[:, :, None], ptokens)
        new_times = jnp.where(wmask, pt_p[:, :, None], ptimes)

        phid = jax.tree.map(
            lambda a: jnp.take_along_axis(
                a, perm.reshape((n, W) + (1,) * (a.ndim - 2)), axis=1),
            hidden)
        hid_adv = step_b(phid, jnp.maximum(tok_p, 0))
        new_hidden = jax.tree.map(
            lambda a, b: jnp.where(
                emit_p.reshape((n, W) + (1,) * (a.ndim - 2)), a, b),
            hid_adv, phid)

        return (it + 1, mt, mu, msc, nh1, nh2, new_tokens, new_times,
                new_hidden, lm_state), None

    if F > 1:
        if lm is not None:
            raise ValueError("lookahead > 1 requires lm=None (shallow-"
                             "fusion LM state advances per step)")
        body = window_body

    # Round-4 fast path: a while_loop that exits once no beam can change
    # anything but its own blank-tail score — every live beam is either
    # symbol-capped (its predictor, prefix, and hash are frozen; only
    # Σ log p(blank) remains) or waiting at a chunk edge.  The remaining
    # all-blank consumption is then ONE batched joint pass per beam
    # (same trade as the greedy fast path; scores past the cap match the
    # step-by-step scan to f32 summation order, everything else exactly).
    def cond(carry):
        it, t, u, score, *_ = carry
        from .semiring import LOG0_THRESHOLD as _THR

        alive = score > _THR
        live = alive & (t < il[:, None])
        frozen = jnp.any(live & (t >= avail[:, None]), axis=1)
        progressing = live & (u < s_cap) & ~frozen[:, None]
        return (it < n_steps) & jnp.any(progressing)

    carry = jax.lax.while_loop(
        lambda c: cond(c), lambda c: body(c, None)[0],
        (jnp.int32(0),) + tuple(carry0))
    _, t, u, score, h1, h2, tokens, times, hidden, lm_state = carry

    # ---- vectorized all-blank tail for symbol-capped live beams ---------
    alive = score > LOG0_THRESHOLD
    lim = jnp.minimum(il, avail)                             # (N,)
    tailable = alive & (u >= s_cap) & (t < lim[:, None])     # (N, W)
    logits = jax.vmap(
        lambda e_n, h_n: jax.vmap(
            lambda h_w: jax.vmap(lambda f: joint_one(f, h_w))(e_n)
        )(h_n)
    )(enc, hidden)                                           # (N, W, Tc, V)
    lpb_all = jax.nn.log_softmax(logits, axis=-1)[..., blank]
    t_iota = jnp.arange(t_max, dtype=jnp.int32)[None, None]  # (1, 1, Tc)
    tmask = ((t_iota >= (t - t_off[:, None])[:, :, None])
             & (t_iota < (lim - t_off)[:, None, None]))
    tail = jnp.sum(jnp.where(tmask, lpb_all, 0.0), axis=2)   # (N, W)
    score = jnp.where(tailable, score + tail, score)
    t = jnp.where(tailable, lim[:, None], t)
    return (t, u, score, h1, h2, tokens, times, hidden, lm_state)


def _beam_carry0(n, W, s_cap, hidden0, lm):
    from .semiring import LOG0

    arange_w = jnp.arange(W, dtype=jnp.uint32)
    zi = jnp.zeros((n, W), jnp.int32)
    score0 = jnp.where(jnp.arange(W)[None] == 0, 0.0, LOG0)
    score0 = jnp.broadcast_to(score0, (n, W)).astype(jnp.float32)
    h1_0 = jnp.broadcast_to(
        jnp.where(jnp.arange(W) == 0, _SEED1, _DEAD + arange_w)[None],
        (n, W))
    h2_0 = jnp.broadcast_to(
        jnp.where(jnp.arange(W) == 0, _SEED2, _DEAD + arange_w)[None],
        (n, W))
    tokens0 = jnp.full((n, W, s_cap), -1, jnp.int32)
    times0 = jnp.full((n, W, s_cap), -1, jnp.int32)
    if lm is not None:
        st0 = lm.init_state(W)
        lm_state0 = jax.tree.map(
            lambda l: jnp.broadcast_to(l[None], (n,) + l.shape), st0)
    else:
        lm_state0 = jnp.zeros((n, W), jnp.int32)
    return (zi, zi, score0, h1_0, h2_0, tokens0, times0, hidden0,
            lm_state0)


@partial(jax.jit, static_argnames=("W", "lm", "lm_alpha"))
def _rnnt_beam_finish(carry, W, lm=None, lm_alpha=0.0):
    """Rank a beam carry (pure — mid-stream partials are fine): applies
    the end-of-sequence LM bonus and sorts by final score (the blank-tail
    fast path and the LM bonus both post-date the scan's last top-k)."""
    from .semiring import LOG0_THRESHOLD

    t, u, score, h1, h2, tokens, times, hidden, lm_state = carry
    if lm is not None:
        score = jnp.where(score > LOG0_THRESHOLD,
                          score + lm_alpha * jax.vmap(lm.final)(lm_state),
                          score)
    score, order = jax.lax.top_k(score, W)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    times = jnp.take_along_axis(times, order[:, :, None], axis=1)
    u = jnp.take_along_axis(u, order, axis=1)
    return tokens, u, score, times


def rnnt_beam_decode(encoder_out, input_lengths, predictor_step,
                     init_hidden, joint_fn, *, beam_width: int = 4,
                     prune_k: int | None = None, blank: int = 0,
                     max_symbols: int | None = None,
                     lookahead: int = 1,
                     return_timestamps: bool = False,
                     lm=None, lm_alpha: float = 0.0, lm_beta: float = 0.0):
    """Batched transducer beam search — ALSD, one shape-static scan.

    Alignment-length synchronous decoding (Saon et al. 2020): every live
    hypothesis at scan step d has consumed-frames + emitted-tokens = d, so
    two hypotheses with the SAME label prefix are the same lattice state
    (same t, same u, same predictor state) and merging them by dual rolling
    prefix hash + logaddexp is EXACT — the merged beam score is the total
    probability of every surviving alignment of that prefix, the transducer
    analog of the CTC prefix merge (ops/beam_search.py).  Hypotheses that
    consume their final frame's blank become FINISHED and compete for beam
    slots with frozen scores; after T + S_cap steps every survivor is
    finished.  Per step the joint and the predictor advance run batched
    over N*W once (deferred advance: only surviving emitting beams step the
    predictor — never per candidate), the same MXU-batching discipline as
    NeuralLM fusion (ops/neural_lm.py).

    Args are as `rnnt_greedy_decode` plus:
      beam_width: beams kept per sample (W).
      prune_k: non-blank tokens proposed per beam per step (default
        min(2*W, V-1); V-1 = exhaustive).
      max_symbols: emitted-token cap per hypothesis = returned buffer width
        (default min(T, 256)).
      lookahead: frames whose joints are evaluated per sequential dispatch
        (>= 1; requires lm=None).  Each dispatch replays up to `lookahead`
        EXACT ALSD steps from the batched joint outputs (the predictor
        state is loop-invariant while every beam selects blank) and stops
        at the first step that selects any emission — beams, merges,
        tokens, lengths, and timestamps are step-identical to lookahead=1;
        scores differ only by f32 re-association of the same per-frame
        terms.  CAVEAT (chip-measured 2026-08-20, STATUS.md known-gaps):
        the window pays only when ALL W beams select blank for runs of
        frames.  At W >= 4 the selected top-W nearly always contains an
        emission even on ~5%-emission-rate joints, so each dispatch pays
        `lookahead` joint passes + mini-step replays to advance ~1 step
        (measured ~22x SLOWER at W=4, F=8).  Use lookahead > 1 only for
        W <= 2 or strongly peaked joints where all-beam blank runs are
        real; the default 1 is right for typical beams (greedy decode's
        `lookahead` keeps its win — single-hypothesis blank runs are
        common).
      lm / lm_alpha / lm_beta: optional shallow-fusion LM — ANY
        `ShallowFusionLM` protocol object from ops/lm.py (dense/hashed
        token n-gram, word-boundary, hotword, composite) or a `NeuralLM`
        (ops/neural_lm.py).  Every token extension candidate is ranked
        with `lm_alpha * log p_LM(c | prefix) + lm_beta` added (shallow
        fusion steers the pruning, exactly as in the CTC beam scan);
        LM state rides the ALSD carry, advances only on surviving
        emissions (deferred, batched — one protocol `select` per step),
        and `lm_alpha * lm.final(state)` is added at the end.  Returned
        scores INCLUDE the LM bonus (the ops/beam_search.py convention);
        with `lm=None` results are unchanged.

    Returns:
      (tokens (N, W, S_cap) -1-padded, lengths (N, W), scores (N, W)) plus
      times (N, W, S_cap) with `return_timestamps`; beams sorted by
      descending merged log-probability.  `scores[n, w]` is the summed
      probability of all in-beam complete alignments of that label
      sequence — with `beam_width` >= the reachable-state count and
      `prune_k = V-1` it equals `-rnnt_nll` of the sequence exactly.
    """
    enc = jnp.asarray(encoder_out, jnp.float32)
    if enc.ndim != 3:
        raise ValueError(f"encoder_out must be (N, T, H), got {enc.shape}")
    n, t_max, _ = enc.shape
    if input_lengths is None:
        input_lengths = np.full((n,), t_max, np.int32)
    il = jnp.asarray(input_lengths, jnp.int32)
    s_cap = int(max_symbols or min(t_max, 256))
    W = int(beam_width)
    probe = jax.eval_shape(lambda f, h: joint_fn(f, h),
                           jax.ShapeDtypeStruct(enc.shape[2:], jnp.float32),
                           init_hidden)
    v = probe.shape[-1]
    K = int(prune_k) if prune_k is not None else min(2 * W, v - 1)
    K = max(1, min(K, v - 1))
    hidden0 = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None, None],
                                   (n, W) + jnp.asarray(x).shape),
        init_hidden)
    n_steps = t_max + s_cap
    carry = _rnnt_beam_scan(
        enc, il, il, jnp.zeros_like(il),
        _beam_carry0(n, W, s_cap, hidden0, lm),
        predictor_step, joint_fn, int(blank), W, K, s_cap, n_steps,
        lm=lm, lm_alpha=float(lm_alpha), lm_beta=float(lm_beta),
        lookahead=int(lookahead))
    out = _rnnt_beam_finish(carry, W, lm=lm, lm_alpha=float(lm_alpha))
    return out if return_timestamps else out[:3]


def additive_joint(w_enc, w_pred, b_joint, w_out, b_out):
    """The standard additive transducer joint as a protocol `joint_fn`:
    ``logits = W_out · tanh(W_enc f + W_pred h + b) + b_out``.

    Returns a closure suitable for `rnnt_greedy_decode` / the fused loss;
    `hidden` is the predictor output vector (for composite predictor
    states pass a wrapper that extracts the output leaf).

    For decoding, prefer `FactoredAdditiveJoint` — same math, but the
    decoders hoist the frame projection out of the sequential loop.
    """
    def joint_fn(f_vec, h_vec):
        z = jnp.tanh(f_vec @ w_enc + h_vec @ w_pred + b_joint)
        return z @ w_out + b_out
    return joint_fn


class FactoredAdditiveJoint:
    """`additive_joint` with the encoder-side projection factored out of
    the sequential decode loop.

    ``W_enc f`` is loop-invariant per frame: the decoders (greedy scan,
    ALSD beam, streaming wrappers) detect `precompute_frames` and compute
    the whole utterance's ``enc @ W_enc`` ONCE as a batched MXU matmul
    before entering the while_loop; each sequential step then runs only
    the predictor-dependent half (``tanh(f_proj + W_pred h + b) @ W_out``)
    — one fewer matmul on the latency-critical dependency chain.  Same
    math as `additive_joint` (scores differ by f32 matmul tiling only,
    tokens identical; parity-tested in tests/test_rnnt.py).

    Also a plain protocol `joint_fn`: calling the instance with an
    UNPROJECTED frame vector applies the full joint, so every consumer
    that doesn't know about the factoring (serving confidence, MWER,
    the loss) works unchanged.
    """

    def __init__(self, w_enc, w_pred, b_joint, w_out, b_out):
        self.w_enc = jnp.asarray(w_enc, jnp.float32)
        self.w_pred = jnp.asarray(w_pred, jnp.float32)
        self.b_joint = jnp.asarray(b_joint, jnp.float32)
        self.w_out = jnp.asarray(w_out, jnp.float32)
        self.b_out = jnp.asarray(b_out, jnp.float32)

    def precompute_frames(self, enc):
        """(..., H_enc) -> (..., J): the batched frame-side projection."""
        return enc @ self.w_enc

    def from_projected(self, f_proj, h_vec):
        """Protocol joint on a PRE-PROJECTED frame row."""
        z = jnp.tanh(f_proj + h_vec @ self.w_pred + self.b_joint)
        return z @ self.w_out + self.b_out

    def __call__(self, f_vec, h_vec):
        return self.from_projected(f_vec @ self.w_enc, h_vec)
