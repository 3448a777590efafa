"""CRNN-style OCR text-line recognizer (BASELINE.json config 3:
"OCR text-line recognition, prefix beam search width 10").

The reference library served OCR as well as ASR (SURVEY.md §1); this is the
OCR consumer demo: a convolutional feature extractor collapses the image
height, columns become the CTC time axis, a small bidirectional mixing stack
(here: masked self-attention blocks — recurrence-free, TPU-first) produces
per-column logits over the character set + blank.

Everything static-shape: image width buckets play the role of T buckets;
per-sample valid widths flow as data.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .conformer import ConformerBlock, _length_mask, sinusoidal_positions


class CRNNFeatures(nn.Module):
    """(N, H, W, 1) grayscale text lines -> (N, W/4, d_model) column features."""

    d_model: int = 128

    @nn.compact
    def __call__(self, images, widths):
        # re-mask the width axis after every mixing stage so the bucketed
        # padding amount can't leak into valid columns (bucket invariance)
        # max_pool is VALID (floor(w/2)); stride-1 SAME convs are alignment-
        # independent, so only the mask widths need the floor arithmetic.
        x = images
        x = nn.Conv(32, (3, 3))(x)
        x = nn.relu(x)
        x = x * _length_mask(jnp.asarray(widths), x.shape[2])[:, None, :, None]
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # H/2, W/2
        w1 = jnp.asarray(widths) // 2
        x = nn.Conv(64, (3, 3))(x)
        x = nn.relu(x)
        x = x * _length_mask(w1, x.shape[2])[:, None, :, None]
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # H/4, W/4
        w2 = w1 // 2
        x = nn.Conv(self.d_model, (3, 3))(x)
        x = nn.relu(x)
        x = x * _length_mask(w2, x.shape[2])[:, None, :, None]
        # collapse the remaining height into features
        n, h, w, c = x.shape
        x = jnp.mean(x, axis=1)  # (N, W/4, d_model) — height pooled
        return x

    @staticmethod
    def out_width(widths):
        return jnp.asarray(widths) // 4  # two VALID (2,2) max-pools


class OCRRecognizer(nn.Module):
    """Images + column widths -> CTC logits (N, W', vocab) and widths."""

    vocab_size: int  # includes blank (id 0)
    d_model: int = 128
    num_layers: int = 2
    num_heads: int = 4

    @nn.compact
    def __call__(self, images, widths, deterministic: bool = True):
        images = jnp.asarray(images, jnp.float32)
        if images.ndim == 3:
            images = images[..., None]
        # zero the padded columns so convs can't leak padding content
        w_in = images.shape[2]
        col_mask = _length_mask(jnp.asarray(widths), w_in)  # (N, W)
        images = images * col_mask[:, None, :, None]
        x = CRNNFeatures(self.d_model)(images, widths)
        out_w = CRNNFeatures.out_width(widths)
        t_max = x.shape[1]
        x = x + jnp.asarray(sinusoidal_positions(t_max, self.d_model))
        mask = _length_mask(out_w, t_max)
        for _ in range(self.num_layers):
            x = ConformerBlock(self.d_model, self.num_heads, conv_kernel=7)(
                x, mask, deterministic
            )
        return nn.Dense(self.vocab_size)(x), out_w
