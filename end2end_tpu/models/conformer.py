"""Conformer encoder for CTC ASR (flax.linen) — BASELINE.json config 5's
"log-mel frontend + encoder logits" consumer demo, built TPU-first:

  * all shapes static; per-sample lengths are masks (bucketing-compatible);
  * attention masks padded frames; convolutions are masked before mixing so
    padding never leaks into valid frames;
  * batch norm is replaced by layer norm in the conv module (stateless —
    the standard choice for inference-friendly Conformer variants);
  * dims default to multiples of 128 so Dense/attention matmuls tile the MXU.

This is a consumer demo of the loss/decoder library, not a trainer framework
(the reference had no trainer either — SURVEY.md §1); nevertheless the model
trains (see tests: loss drops under adamw) and is the flagship model used by
__graft_entry__.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _length_mask(lengths, t_max):
    return jnp.arange(t_max)[None, :] < lengths[:, None]


class ConvSubsampling(nn.Module):
    """Two stride-2 convs: (N, T, F) -> (N, T//4, d_model); lengths //4.

    Activations are re-masked after every conv: 'SAME' convs write bias-
    derived values into padding frames, and without re-masking the amount of
    padding (the bucket size) would leak into boundary frames — results must
    depend on lengths only (bucket invariance)."""

    d_model: int = 256

    @nn.compact
    def __call__(self, x, lengths):
        # Explicit symmetric padding, NOT 'SAME': XLA's SAME padding is
        # asymmetric depending on input-length parity, which would shift the
        # stride-2 window alignment with the bucket size and break bucket
        # invariance.  out length = ceil(in/2) either way.
        ceil2 = lambda v: -(-v // 2)
        pad = ((1, 1), (1, 1))
        x = x[..., None]  # (N, T, F, 1)
        x = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding=pad)(x)
        x = nn.swish(x)
        l1 = ceil2(jnp.asarray(lengths))
        x = x * _length_mask(l1, x.shape[1])[:, :, None, None]
        x = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding=pad)(x)
        x = nn.swish(x)
        l2 = ceil2(l1)
        x = x * _length_mask(l2, x.shape[1])[:, :, None, None]
        n, t, f, c = x.shape
        return nn.Dense(self.d_model)(x.reshape(n, t, f * c))

    @staticmethod
    def out_length(lengths):
        # Conv 'SAME' stride 2, twice: ceil(ceil(T/2)/2)
        ceil2 = lambda x: -(-x // 2)
        return ceil2(ceil2(jnp.asarray(lengths)))


class FeedForward(nn.Module):
    d_model: int
    expansion: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.d_model * self.expansion)(y)
        y = nn.swish(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model)(y)
        return nn.Dropout(self.dropout, deterministic=deterministic)(y)


class MHSA(nn.Module):
    d_model: int
    num_heads: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        y = nn.LayerNorm()(x)
        attn_mask = mask[:, None, None, :] & mask[:, None, :, None]
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(y, y, mask=attn_mask)
        return nn.Dropout(self.dropout, deterministic=deterministic)(y)


class ConvModule(nn.Module):
    d_model: int
    kernel_size: int = 15
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        y = nn.LayerNorm()(x)
        y = y * mask[..., None]  # keep padding out of the depthwise mix
        y = nn.Dense(2 * self.d_model)(y)  # pointwise
        y = nn.glu(y, axis=-1)
        y = nn.Conv(
            self.d_model,
            (self.kernel_size,),
            feature_group_count=self.d_model,
        )(y)
        y = nn.LayerNorm()(y)  # stateless stand-in for batch norm
        y = nn.swish(y)
        y = nn.Dense(self.d_model)(y)  # pointwise
        return nn.Dropout(self.dropout, deterministic=deterministic)(y)


class ConformerBlock(nn.Module):
    d_model: int
    num_heads: int = 4
    conv_kernel: int = 15
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        x = x + 0.5 * FeedForward(self.d_model, dropout=self.dropout)(x, deterministic)
        x = x + MHSA(self.d_model, self.num_heads, self.dropout)(x, mask, deterministic)
        x = x + ConvModule(self.d_model, self.conv_kernel, self.dropout)(
            x, mask, deterministic
        )
        x = x + 0.5 * FeedForward(self.d_model, dropout=self.dropout)(x, deterministic)
        return nn.LayerNorm()(x)


def sinusoidal_positions(t_max: int, d: int):
    pos = np.arange(t_max)[:, None]
    div = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
    pe = np.zeros((t_max, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class ConformerEncoder(nn.Module):
    """Log-mel features (N, T, F) + lengths -> CTC logits (N, T', V).

    vocab_size INCLUDES the blank (id 0 by convention, matching the loss)."""

    vocab_size: int
    d_model: int = 256
    num_layers: int = 4
    num_heads: int = 4
    conv_kernel: int = 15
    dropout: float = 0.0
    subsample: bool = True

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True):
        # Zero padding frames BEFORE any conv so padding content can never
        # leak into valid frames (bucket invariance: results depend on
        # lengths, not on what the padding happens to contain).
        feats = feats * _length_mask(jnp.asarray(lengths), feats.shape[1])[..., None]
        if self.subsample:
            x = ConvSubsampling(self.d_model)(feats, lengths)
            out_len = ConvSubsampling.out_length(lengths)
        else:
            x = nn.Dense(self.d_model)(feats)
            out_len = jnp.asarray(lengths)
        t_max = x.shape[1]
        x = x + jnp.asarray(sinusoidal_positions(t_max, self.d_model))
        mask = _length_mask(out_len, t_max)
        for _ in range(self.num_layers):
            x = ConformerBlock(
                self.d_model, self.num_heads, self.conv_kernel, self.dropout
            )(x, mask, deterministic)
        logits = nn.Dense(self.vocab_size)(x)
        return logits, out_len
