"""Post-hoc N-best LM rescoring for decoded beam lists.

The production pattern that complements shallow fusion (SURVEY.md §3.1 N6):
decode FAST without the LM (the Pallas kernel path, beam_search_pallas.py),
then add the exact shallow-fusion bonus to every surviving hypothesis and
re-rank.  The bonus an LM-fused decode attaches to a prefix ``y`` is a pure
function of the prefix,

    alpha * (sum_j log p_LM(y_j | y_<j) + final(y)) + beta * len(y),

so rescoring reproduces the fused decoder's SCORES exactly for every prefix
the no-LM beam kept (what can differ is the candidate set itself, since the
LM no longer steers the search — the usual fusion-vs-rescoring trade).

Works with ANY ShallowFusionLM protocol object (lm.py): LMs exposing
`score_chunk` are rescored in ONE vectorized chunk replay over all N*W
hypotheses (no positional scan — word-level LMs touch their tables only at
each hypothesis's actual word count); others fall back to the per-position
protocol scan (single candidate per beam, vmapped over hypotheses).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("lm", "lm_alpha", "lm_beta", "resort"))
def rescore_nbest(tokens, lengths, scores, lm, lm_alpha: float = 0.0,
                  lm_beta: float = 0.0, resort: bool = True, times=None):
    """Add shallow-fusion LM bonuses to an N-best list and re-rank.

    Args:
      tokens: (N, W, S) int32, -1 padded — as returned by
        `beam_search_decode`.
      lengths: (N, W) int32.
      scores: (N, W) float log-scores (acoustic); -inf marks dead beams.
      lm / lm_alpha / lm_beta: shallow-fusion LM and weights (lm.py).
      resort: re-rank beams by the rescored totals (best first).
      times: optional (N, W, S) per-token emission frames from
        `beam_search_decode(..., return_timestamps=True)`; co-sorted with
        the beams so timestamped N-best lists stay aligned after re-ranking.

    Returns:
      (tokens, lengths, new_scores) with
      `new_scores = scores + alpha*(lm logp + final) + beta*len`,
      re-sorted per sample when `resort`; plus `times` (same order as
      tokens) when a times array was given.
    """
    n, w, s_cap = tokens.shape
    nw = n * w
    toks = tokens.reshape(nw, s_cap)
    state0 = lm.init_state(nw)

    if hasattr(lm, "score_chunk"):
        # One vectorized chunk replay over the whole hypothesis (every lm.py
        # class; exactly equals the positional scan below — tests/
        # test_lm_chunk.py) instead of s_cap sequential protocol steps.
        lm_sum, state = lm.score_chunk(state0, toks)
        return _finish(tokens, lengths, scores, lm, lm_alpha, lm_beta,
                       resort, times, lm_sum, state)

    def step(state, tok):
        # tok: (nw,) this position's token per hypothesis (-1 = past end)
        valid = tok >= 0
        tok_safe = jnp.where(valid, tok, 0).astype(jnp.int32)

        def one(state_b, tok_b):
            st = jax.tree.map(lambda x: x[None], state_b)  # fake W=1
            lm_lp, st_ext = lm.score(st, tok_b[None])       # (1, 1), K=1
            zero = jnp.zeros((1,), jnp.int32)
            st_new = lm.select(st, st_ext, zero, zero,
                               jnp.zeros((1,), bool))
            return lm_lp[0, 0], jax.tree.map(lambda x: x[0], st_new)

        lm_lp, state_ext = jax.vmap(one)(state, tok_safe)
        # past-end positions contribute nothing and keep their state
        state = jax.tree.map(
            lambda new, old: jnp.where(
                valid.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            ),
            state_ext, state,
        )
        return state, jnp.where(valid, lm_lp, 0.0)

    state, lm_lps = jax.lax.scan(step, state0, toks.T)  # scan over positions
    lm_sum = lm_lps.sum(axis=0)                          # (nw,)
    return _finish(tokens, lengths, scores, lm, lm_alpha, lm_beta, resort,
                   times, lm_sum, state)


def _finish(tokens, lengths, scores, lm, lm_alpha, lm_beta, resort, times,
            lm_sum, state):
    n, w, _ = tokens.shape
    nw = n * w
    bonus = (lm_alpha * (lm_sum + lm.final(state))
             + lm_beta * lengths.reshape(nw).astype(jnp.float32))
    new_scores = jnp.where(
        jnp.isfinite(scores.reshape(nw)),
        scores.reshape(nw) + bonus,
        -jnp.inf,
    ).reshape(n, w)
    if resort:
        new_scores, order = jax.lax.top_k(new_scores, w)
        tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
        lengths = jnp.take_along_axis(lengths, order, axis=1)
        if times is not None:
            times = jnp.take_along_axis(times, order[:, :, None], axis=1)
    if times is not None:
        return tokens, lengths, new_scores, times
    return tokens, lengths, new_scores
