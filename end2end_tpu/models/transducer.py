"""Conformer-Transducer: encoder + GRU predictor + additive joint.

The transducer assembly companion to `models/pipeline.py`'s Conformer-CTC
(the reference's surface is CTC-only — SURVEY.md §1; the transducer family
is the beyond-reference extension built on the same machinery, see
`ops/rnnt_loss.py`).  Three trainable parts in one params pytree:

  * ``enc``   — `ConformerEncoder` (flax), reused unchanged: its final
    Dense simply projects to ``enc_dim`` features instead of CTC logits;
  * ``pred``  — the functional GRU cell from `ops/neural_lm.py` (params
    pytree, trains with `jax.grad`, and IS the single-sample
    `predictor_step` protocol the decoders consume — no adapter layer);
  * ``joint`` — the standard additive joint
    ``W_out·tanh(W_e f + W_p h + b) + b_out``.

Training materializes the full (N, T', U+1, V) joint lattice once and
feeds `rnnt_loss` (whose wavefront DP then never touches V again); at
demo/bucket scales this is the right TPU trade — one big fused MXU
einsum + elementwise tanh, no per-step host work.  Decoding never builds
the lattice: the greedy/ALSD-beam scans call the joint on (N[, W]) rows
per step (`ops/rnnt_decode.py`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.neural_lm import gru_step, random_gru_params
from ..ops.rnnt_decode import (FactoredAdditiveJoint, rnnt_beam_decode,
                               rnnt_greedy_decode)
from ..ops.rnnt_loss import rnnt_loss
from .conformer import ConformerEncoder


@dataclass(frozen=True)
class TransducerConfig:
    vocab_size: int = 32          # includes blank at id 0
    n_mels: int = 80              # input feature dim
    d_model: int = 144
    num_layers: int = 2
    num_heads: int = 4
    conv_kernel: int = 15
    subsample: bool = True
    enc_dim: int = 144            # encoder output feature width
    emb_dim: int = 64             # predictor token embedding
    pred_hidden: int = 128        # predictor GRU state
    joint_dim: int = 128


class ConformerTransducer:
    """Features (N, T, F) + lengths -> transducer loss / decode."""

    def __init__(self, config: TransducerConfig = TransducerConfig()):
        self.config = config
        # vocab_size here is just the final Dense width = feature dim
        self.encoder = ConformerEncoder(
            vocab_size=config.enc_dim,
            d_model=config.d_model,
            num_layers=config.num_layers,
            num_heads=config.num_heads,
            conv_kernel=config.conv_kernel,
            subsample=config.subsample,
        )

    # -- params ------------------------------------------------------------
    def init(self, rng, example_feats, example_lengths, seed: int = 0):
        c = self.config
        enc_params = self.encoder.init(rng, jnp.asarray(example_feats),
                                       jnp.asarray(example_lengths))
        nprng = np.random.default_rng(seed)
        pred = jax.tree.map(
            jnp.asarray,
            random_gru_params(nprng, c.vocab_size, emb_dim=c.emb_dim,
                              hidden_dim=c.pred_hidden))

        def w(*shape):
            fan_in = shape[0]
            return jnp.asarray(
                (nprng.standard_normal(shape) / np.sqrt(fan_in))
                .astype(np.float32))

        joint = {
            "w_enc": w(c.enc_dim, c.joint_dim),
            "w_pred": w(c.pred_hidden, c.joint_dim),
            "b": jnp.zeros((c.joint_dim,), jnp.float32),
            "w_out": w(c.joint_dim, c.vocab_size),
            "b_out": jnp.zeros((c.vocab_size,), jnp.float32),
        }
        return {"enc": enc_params, "pred": pred, "joint": joint}

    # -- pieces ------------------------------------------------------------
    def encode(self, params, feats, lengths):
        return self.encoder.apply(params["enc"], jnp.asarray(feats),
                                  jnp.asarray(lengths))

    def _pred_states(self, pred_params, targets):
        """(N, U) target ids -> (N, U+1, H) prefix states (h_0 = zeros)."""
        targets = jnp.asarray(targets, jnp.int32)
        n = targets.shape[0]
        h0 = jnp.zeros((n, self.config.pred_hidden), jnp.float32)

        def step(h, tok_col):
            h2 = jax.vmap(lambda hh, tt: gru_step(pred_params, hh, tt))(
                h, tok_col)
            return h2, h2

        _, hs = jax.lax.scan(step, h0, targets.T)       # (U, N, H)
        return jnp.concatenate([h0[None], hs], axis=0).transpose(1, 0, 2)

    def joint_logits(self, params, enc, pred_states):
        """(N, T, E) x (N, U+1, H) -> (N, T, U+1, V) joint logits."""
        j = params["joint"]
        z = jnp.tanh(
            jnp.einsum("nte,ed->ntd", enc, j["w_enc"])[:, :, None]
            + jnp.einsum("nuh,hd->nud", pred_states, j["w_pred"])[:, None]
            + j["b"])
        return jnp.einsum("ntud,dv->ntuv", z, j["w_out"]) + j["b_out"]

    # -- training ----------------------------------------------------------
    def loss(self, params, feats, lengths, targets, target_lengths,
             reduction: str = "mean"):
        enc, enc_len = self.encode(params, feats, lengths)
        hs = self._pred_states(params["pred"], targets)
        logits = self.joint_logits(params, enc, hs)
        return rnnt_loss(logits, targets, enc_len, target_lengths,
                         blank=0, reduction=reduction, from_logits=True)

    # -- inference ---------------------------------------------------------
    def decoder_fns(self, params):
        """(predictor_step, init_hidden, joint_fn) protocol triple for the
        ops/rnnt_decode.py scans and the streaming decoders.  The joint is
        a `FactoredAdditiveJoint`, so the decode scans hoist the frame
        projection out of their sequential loops (same math)."""
        c = self.config
        j = params["joint"]
        return (partial(gru_step, params["pred"]),
                jnp.zeros((c.pred_hidden,), jnp.float32),
                FactoredAdditiveJoint(j["w_enc"], j["w_pred"], j["b"],
                                      j["w_out"], j["b_out"]))

    def decode(self, params, feats, lengths, beam_width: int = 0,
               prune_k: int | None = None, max_symbols: int | None = None,
               return_timestamps: bool = False, lm=None,
               lm_alpha: float = 0.0, lm_beta: float = 0.0,
               lookahead: int = 1):
        """Greedy when beam_width == 0, else ALSD beam search (optionally
        LM-fused — any ops/lm.py protocol LM or NeuralLM).

        Greedy returns (tokens (N, S), lengths, scores); beam returns the
        full sorted beam (tokens (N, W, S), lengths, scores).  Timestamps
        (emission frames in ENCODER frames — multiply by the subsampling
        factor for feature frames) appended when requested.  `lookahead`
        (greedy, and beam when lm is None) evaluates that many frames per
        sequential step — worth 4-8 on blank-dominated (realistic) audio;
        tokens/lengths/times are bit-identical either way.
        """
        enc, enc_len = self.encode(params, feats, lengths)
        pred, init_h, joint = self.decoder_fns(params)
        if beam_width == 0:
            return rnnt_greedy_decode(
                enc, enc_len, pred, init_h, joint, blank=0,
                max_symbols=max_symbols, lookahead=lookahead,
                return_timestamps=return_timestamps)
        return rnnt_beam_decode(
            enc, enc_len, pred, init_h, joint, blank=0,
            beam_width=beam_width, prune_k=prune_k,
            max_symbols=max_symbols, return_timestamps=return_timestamps,
            lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta,
            lookahead=lookahead if lm is None else 1)
