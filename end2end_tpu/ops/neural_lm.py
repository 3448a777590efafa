"""On-device NEURAL-LM shallow fusion for the beam decoders.

The reference's LM hook is KenLM — an n-gram library called per hypothesis
on the host (SURVEY.md §3.1 N6).  `ops/lm.py` rebuilds that n-gram regime
with device tables; this module generalizes the same protocol to *neural*
LMs (RNN / GRU / any step-function next-token model), which is what
production ASR increasingly fuses instead of n-grams.  TPU-native shape:
the per-beam recurrent state rides in the `lax.scan` carry and every LM
step is batched over beams, so fusion costs (W, H) × (H, V) MXU matmuls
per frame — no host calls, no dynamic shapes.

Deferred-advance state layout
-----------------------------
A naive protocol implementation would need the advanced hidden for every
(beam, candidate) extension — W·K network steps per frame.  Instead the
state is

    (hidden, pending)   hidden: pytree of (W, ...) — state after the
                        beam's prefix EXCEPT its last token;
                        pending: (W,) int32 — that last token (-1: none).

`score()` advances each beam by its pending token ONCE (W vmapped steps),
log-softmaxes the next-token distribution from the advanced hidden, and
all K extensions share it; `select()` commits the advanced hidden for
every survivor (stay beams keep pending = -1, extensions set pending to
the new token).  Each consumed token therefore costs exactly one network
step per surviving beam, the same as sequential rescoring.

Works on every LM-capable decode path: the exact-fusion XLA scan
(`beam_search_decode(lm=...)`), the chunked kernel path
(`implementation='chunked'`, via `score_chunk`), N-best rescoring
(`rescore_nbest`), and the streaming decoders (the state is an ordinary
pytree in the carried decode state).

LM objects are STATIC jit arguments (hashed by identity): reuse one
instance across calls or every new instance recompiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _where_rows(mask, a, b):
    """Per-leaf `where` with a (W,) mask broadcast over trailing dims."""
    return jax.tree.map(
        lambda x, y: jnp.where(mask.reshape(mask.shape + (1,) * (x.ndim - 1)),
                               x, y),
        a, b)


class NeuralLM:
    """Shallow-fusion adapter for any stateful next-token model.

    Args:
      step_fn: `(hidden, token_id) -> hidden'` — consume one token
        (UNBATCHED: hidden is a single beam's pytree, token a scalar
        int32; batching over beams is vmapped here).
      logp_fn: `(hidden) -> (V,)` next-token scores for a single beam.
        Log-softmaxed here unless `normalize=False` (pass False when the
        model already emits log-probs, or for exact-table test LMs).
      init_hidden: pytree of per-beam initial state, WITHOUT the leading
        beam axis (e.g. `jnp.zeros((H,))`).  Condition on `<s>` by baking
        it in: `init_hidden = step_fn(zeros, s_id)`.
      vocab_size: V of `logp_fn`'s output (must cover every candidate id).
      eos_id: optional token id whose log-prob is added once per finished
        hypothesis by `final()` (KenLM's `</s>`); None = no EOS bonus.
      normalize: apply `jax.nn.log_softmax` to `logp_fn`'s output.

    The decoder applies `lm_alpha * logp + lm_beta` per emitted token,
    identically to the n-gram LMs.
    """

    def __init__(self, step_fn, logp_fn, init_hidden, vocab_size,
                 eos_id=None, normalize=True):
        self._step = step_fn
        self._raw_logp = logp_fn
        self._h0 = jax.tree.map(jnp.asarray, init_hidden)
        self._v = int(vocab_size)
        self._eos = None if eos_id is None else int(eos_id)
        self._norm = bool(normalize)

    # -- building blocks ---------------------------------------------------

    def _logp_rows(self, h):
        """(W, V) next-token log-probs from batched hidden."""
        out = jax.vmap(self._raw_logp)(h)
        return jax.nn.log_softmax(out, axis=-1) if self._norm else out

    def _advance(self, h, pending):
        """Consume each beam's pending token (no-op where pending < 0)."""
        stepped = jax.vmap(self._step)(h, jnp.maximum(pending, 0))
        return _where_rows(pending >= 0, stepped, h)

    # -- lm.py protocol ------------------------------------------------------

    def init_state(self, w):
        h = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (w,) + x.shape), self._h0)
        return h, jnp.full((w,), -1, jnp.int32)

    def score(self, state, ck):
        h, pending = state
        h_eff = self._advance(h, pending)
        logp = self._logp_rows(h_eff)                      # (W, V)
        lm_lp = logp[:, jnp.clip(ck, 0, self._v - 1)]      # (W, K)
        ckb = jnp.broadcast_to(ck[None, :].astype(jnp.int32),
                               (lm_lp.shape[0], ck.shape[0]))
        return lm_lp, (h_eff, ckb)

    def select(self, state, state_ext, parent, kk, is_stay):
        h_eff, ckb = state_ext
        # every survivor's prefix includes its parent's pending token, so
        # the advanced hidden is committed for stay AND extend alike
        new_h = jax.tree.map(lambda x: x[parent], h_eff)
        new_pending = jnp.where(is_stay, jnp.int32(-1), ckb[parent, kk])
        return new_h, new_pending

    def final(self, state):
        h, pending = state
        if self._eos is None:
            return jnp.zeros(pending.shape, jnp.float32)
        h_eff = self._advance(h, pending)
        return self._logp_rows(h_eff)[:, self._eos]

    def score_chunk(self, state, toks):
        """Vectorized chunk replay (chunked kernel path / rescore_nbest):
        toks (M, C) int32 in emission order, -1 padded at the END.
        Exactly equals folding score()/select() token by token (same
        advance order, same gathered rows)."""
        h, pending = state
        m = pending.shape[0]

        def body(carry, tok_col):
            h, pending = carry
            h_eff = self._advance(h, pending)
            valid = tok_col >= 0
            lp = self._logp_rows(h_eff)[
                jnp.arange(m), jnp.clip(tok_col, 0, self._v - 1)]
            new_h = _where_rows(valid, h_eff, h)
            new_pending = jnp.where(valid, tok_col, pending)
            return (new_h, new_pending), jnp.where(valid, lp, 0.0)

        (h, pending), lps = jax.lax.scan(body, (h, pending), toks.T)
        return lps.sum(axis=0), (h, pending)

    # -- ready-made recurrent cell ------------------------------------------

    @classmethod
    def gru(cls, params, eos_id=None, normalize=True, precision=None):
        """A single-layer GRU LM from a dict of arrays (no framework dep);
        see `gru_step`/`gru_logits` for the layout — those are module-level
        FUNCTIONAL forms so the same cell is trainable with jax.grad
        (examples/lm_decode_demo.py trains one and fuses it here).

        hidden0 = zeros(H).  `precision` feeds every dot (None = default
        TPU bf16 MXU pass; use jax.lax.Precision.HIGHEST for
        exactness-sensitive comparisons — see CLAUDE.md MXU note).
        """
        p = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
        h_dim = p["wz"].shape[1]
        v = p["emb"].shape[0]
        return cls(partial(gru_step, p, precision=precision),
                   partial(gru_logits, p, precision=precision),
                   jnp.zeros((h_dim,), jnp.float32), v,
                   eos_id=eos_id, normalize=normalize)


def gru_step(params, h, tok, precision=None):
    """One GRU step: consume token id `tok` from hidden `h` (H,).

    params: emb (V, E) token embeddings; wz, wr, wh (E + H, H) and
    bz, br, bh (H,) gate/candidate weights applied to concat([x, h]);
    wo (H, V), bo (V,) output projection (used by `gru_logits`).
    Functional (params first) so the cell trains with jax.grad.
    """
    x = params["emb"][tok]
    xh = jnp.concatenate([x, h])
    z = jax.nn.sigmoid(jnp.dot(xh, params["wz"], precision=precision)
                       + params["bz"])
    r = jax.nn.sigmoid(jnp.dot(xh, params["wr"], precision=precision)
                       + params["br"])
    xrh = jnp.concatenate([x, r * h])
    cand = jnp.tanh(jnp.dot(xrh, params["wh"], precision=precision)
                    + params["bh"])
    return (1.0 - z) * h + z * cand


def gru_logits(params, h, precision=None):
    """Next-token logits (V,) from hidden `h` (H,)."""
    return jnp.dot(h, params["wo"], precision=precision) + params["bo"]


def random_gru_params(rng, vocab_size, emb_dim=32, hidden_dim=64,
                      scale=0.5):
    """Random GRU-LM parameters (tests / demos).  rng: np.random.Generator."""
    def w(*shape):
        return (rng.standard_normal(shape) * scale
                / np.sqrt(shape[0])).astype(np.float32)

    e, h, v = emb_dim, hidden_dim, vocab_size
    return {
        "emb": w(v, e),
        "wz": w(e + h, h), "bz": np.zeros((h,), np.float32),
        "wr": w(e + h, h), "br": np.zeros((h,), np.float32),
        "wh": w(e + h, h), "bh": np.zeros((h,), np.float32),
        "wo": w(h, v), "bo": np.zeros((v,), np.float32),
    }
