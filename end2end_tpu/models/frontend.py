"""Log-mel audio frontend (the Conformer-CTC inference pipeline's input stage,
BASELINE.json config 5).

Pure-jnp: framing is a strided gather, the STFT is XLA's native rfft (MXU/VPU
friendly), and the mel projection is one matmul.  The mel filterbank is built
host-side once (Slaney-style triangles, HTK mel scale) and closed over as a
constant.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@lru_cache(maxsize=8)
def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int, fmin: float, fmax: float):
    """(n_fft//2+1, n_mels) triangular filterbank, numpy float32."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def log_mel_spectrogram(
    waveform,
    sample_rate: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    eps: float = 1e-10,
):
    """(N, num_samples) float32 -> (N, frames, n_mels) log-mel features.

    frames = 1 + (num_samples - n_fft) // hop_length.  Also returns a helper
    for converting sample counts to frame counts: use `num_frames(...)`.
    """
    waveform = jnp.asarray(waveform, jnp.float32)
    if waveform.ndim == 1:
        waveform = waveform[None, :]
    n, num_samples = waveform.shape
    frames = 1 + max(0, (num_samples - n_fft)) // hop_length
    idx = (
        np.arange(frames, dtype=np.int32)[:, None] * hop_length
        + np.arange(n_fft, dtype=np.int32)[None, :]
    )
    framed = waveform[:, idx]  # (N, frames, n_fft)
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    spec = jnp.fft.rfft(framed * window, axis=-1)
    power = jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))
    fb = jnp.asarray(
        mel_filterbank(n_mels, n_fft, sample_rate, fmin, fmax or sample_rate / 2.0)
    )
    mel = jnp.einsum("ntf,fm->ntm", power, fb)
    return jnp.log(jnp.maximum(mel, eps))


def num_frames(num_samples, n_fft: int = 400, hop_length: int = 160):
    """Sample counts -> frame counts (per sample; jnp- and int-friendly)."""
    return 1 + jnp.maximum(jnp.asarray(num_samples) - n_fft, 0) // hop_length
