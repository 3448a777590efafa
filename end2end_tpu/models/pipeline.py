"""Conformer-CTC ASR pipeline: waveform -> log-mel -> encoder -> CTC.

BASELINE.json config 5 ("log-mel frontend + encoder logits -> fused CTC beam
decode, B=8 long-form audio"): the consumer-facing assembly of the library —
one jittable function from raw audio to decoded hypotheses, plus the matching
training-loss step.  Everything is static-shape; per-sample lengths flow as
data, so one compiled program serves a bucket of audio lengths.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.beam_search import beam_search_decode
from ..ops.ctc_loss import ctc_loss
from ..ops.greedy import greedy_decode
from .conformer import ConformerEncoder
from .frontend import log_mel_spectrogram, num_frames


@dataclass(frozen=True)
class PipelineConfig:
    vocab_size: int = 32  # includes blank at id 0
    sample_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 80
    d_model: int = 256
    num_layers: int = 4
    num_heads: int = 4


class ConformerCTCPipeline:
    """End-to-end ASR: holds the encoder definition + static config.

    Usage:
      pipe = ConformerCTCPipeline(config)
      params = pipe.init(jax.random.key(0), example_samples)
      logits, out_len = pipe.encode(params, waveforms, num_samples)
      loss = pipe.loss(params, waveforms, num_samples, targets, target_lengths)
      tokens, lengths, scores = pipe.decode(params, waveforms, num_samples,
                                            beam_width=8)
    """

    def __init__(self, config: PipelineConfig = PipelineConfig()):
        self.config = config
        self.encoder = ConformerEncoder(
            vocab_size=config.vocab_size,
            d_model=config.d_model,
            num_layers=config.num_layers,
            num_heads=config.num_heads,
        )

    # -- feature extraction ------------------------------------------------
    def features(self, waveforms):
        c = self.config
        return log_mel_spectrogram(
            waveforms, c.sample_rate, c.n_fft, c.hop_length, c.n_mels
        )

    def feature_lengths(self, num_samples):
        c = self.config
        return num_frames(num_samples, c.n_fft, c.hop_length)

    # -- model -------------------------------------------------------------
    def init(self, rng, example_waveforms, example_num_samples=None):
        feats = self.features(example_waveforms)
        n = feats.shape[0]
        if example_num_samples is None:
            example_num_samples = np.full(
                (n,), np.asarray(example_waveforms).shape[-1]
            )
        lens = self.feature_lengths(example_num_samples)
        return self.encoder.init(rng, feats, lens)

    def encode(self, params, waveforms, num_samples):
        feats = self.features(waveforms)
        lens = self.feature_lengths(num_samples)
        return self.encoder.apply(params, feats, lens)

    # -- training loss -----------------------------------------------------
    def loss(self, params, waveforms, num_samples, targets, target_lengths,
             blank: int = 0, implementation: str = "auto"):
        logits, out_len = self.encode(params, waveforms, num_samples)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return ctc_loss(
            jnp.moveaxis(log_probs, 0, 1),  # (N, T, V) -> (T, N, V)
            targets,
            out_len,
            target_lengths,
            blank=blank,
            reduction="mean",
            zero_infinity=True,
            implementation=implementation,
        )

    # -- inference ---------------------------------------------------------
    def decode(self, params, waveforms, num_samples, beam_width: int = 0,
               blank: int = 0, prune_k: Optional[int] = None,
               lm=None, lm_alpha: float = 0.0, lm_beta: float = 0.0):
        """Greedy when beam_width == 0, else fused prefix beam search."""
        logits, out_len = self.encode(params, waveforms, num_samples)
        log_probs = jnp.moveaxis(jax.nn.log_softmax(logits, axis=-1), 0, 1)
        if beam_width == 0:
            return greedy_decode(log_probs, out_len, blank=blank)
        tokens, lengths, scores = beam_search_decode(
            log_probs, out_len, beam_width=beam_width, blank=blank,
            prune_k=prune_k, lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta,
        )
        return tokens[:, 0], lengths[:, 0], scores[:, 0]
