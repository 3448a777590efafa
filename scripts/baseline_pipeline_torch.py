#!/usr/bin/env python
"""Reference-class CPU baseline for BASELINE.json config 5 (the Conformer-CTC
long-form pipeline): torch-CPU encoder of the SAME architecture and shapes as
`models/pipeline.py` (log-mel frontend -> conv subsampling -> 4 Conformer
blocks -> CTC logits) followed by the pure-Python prefix beam search
(`utils/reference_impl.beam_search_decode_ref`) — i.e. what a user of the
reference library would run on CPU: torch model forward + host beam decode.

Workload (matches bench.py's `bench_pipeline` row): B=8 long-form audio,
30 s @ 16 kHz (480k samples) -> 3000 log-mel frames -> T'=750 after 4x
subsampling; d_model=256, 4 layers, 4 heads, V=32, beam width 8, prune 16.

1 torch thread (this box has 1 vCPU).  Random weights — throughput only.
"""

import time

import jax

# Must precede any device use: keep the (later) end2end_tpu import off the
# tunneled TPU backend — this is a CPU baseline (see tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch
import torch.nn as nn

torch.set_num_threads(1)

B, SECONDS, SR = 8, 30, 16000
N_FFT, HOP, N_MELS = 400, 160, 80
D, LAYERS, HEADS, V = 256, 4, 4, 32
W, K = 8, 16


def log_mel(wav):  # (B, S) -> (B, T, n_mels)
    window = torch.hann_window(N_FFT)
    spec = torch.stft(wav, N_FFT, HOP, window=window, return_complex=True,
                      center=True, pad_mode="reflect")
    power = spec.abs() ** 2  # (B, F, T)
    # Triangular mel filterbank (same construction as models/frontend.py).
    f = np.linspace(0, SR / 2, N_FFT // 2 + 1)
    mel_pts = np.linspace(0, 2595 * np.log10(1 + (SR / 2) / 700), N_MELS + 2)
    hz_pts = 700 * (10 ** (mel_pts / 2595) - 1)
    fb = np.zeros((N_MELS, len(f)), np.float32)
    for m in range(N_MELS):
        lo, c, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        fb[m] = np.clip(np.minimum((f - lo) / max(c - lo, 1e-9),
                                   (hi - f) / max(hi - c, 1e-9)), 0, None)
    mel = torch.einsum("mf,bft->btm", torch.from_numpy(fb), power)
    return torch.log(mel + 1e-6)


class FeedForward(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm, self.w1, self.w2 = nn.LayerNorm(D), nn.Linear(D, 4 * D), \
            nn.Linear(4 * D, D)

    def forward(self, x):
        return self.w2(nn.functional.silu(self.w1(self.norm(x))))


class ConvModule(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1, self.pw1 = nn.LayerNorm(D), nn.Linear(D, 2 * D)
        self.dw = nn.Conv1d(D, D, 15, padding=7, groups=D)
        self.norm2, self.pw2 = nn.LayerNorm(D), nn.Linear(D, D)

    def forward(self, x):
        y = nn.functional.glu(self.pw1(self.norm1(x)), dim=-1)
        y = self.dw(y.transpose(1, 2)).transpose(1, 2)
        return self.pw2(nn.functional.silu(self.norm2(y)))


class Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.ff1, self.ff2, self.conv = FeedForward(), FeedForward(), ConvModule()
        self.norm_a, self.attn = nn.LayerNorm(D), nn.MultiheadAttention(
            D, HEADS, batch_first=True)
        self.norm_out = nn.LayerNorm(D)

    def forward(self, x):
        x = x + 0.5 * self.ff1(x)
        a = self.norm_a(x)
        x = x + self.attn(a, a, a, need_weights=False)[0]
        x = x + self.conv(x)
        x = x + 0.5 * self.ff2(x)
        return self.norm_out(x)


class Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(1, D, 3, stride=2, padding=1)
        self.c2 = nn.Conv2d(D, D, 3, stride=2, padding=1)
        self.proj = nn.Linear(D * (N_MELS // 4), D)
        self.blocks = nn.ModuleList(Block() for _ in range(LAYERS))
        self.out = nn.Linear(D, V)

    def forward(self, feats):  # (B, T, M)
        x = feats[:, None]  # (B, 1, T, M)
        x = nn.functional.silu(self.c1(x))
        x = nn.functional.silu(self.c2(x))
        b, c, t, m = x.shape
        x = self.proj(x.permute(0, 2, 3, 1).reshape(b, t, m * c))
        for blk in self.blocks:
            x = blk(x)
        return self.out(x)


def main():
    from end2end_tpu.utils.reference_impl import beam_search_decode_ref

    rng = np.random.default_rng(0)
    wav = torch.from_numpy(
        rng.standard_normal((B, SECONDS * SR)).astype(np.float32))
    model = Encoder().eval()

    with torch.no_grad():
        # warm one tiny forward
        model(log_mel(wav[:1, : SR]))
        print("warmed", flush=True)
        t0 = time.perf_counter()
        feats = log_mel(wav)
        print(f"log_mel done {time.perf_counter() - t0:.1f}s", flush=True)
        logits = model(feats)
        t_enc = time.perf_counter() - t0
        print(f"encoder done {t_enc:.1f}s", flush=True)
        lp = torch.log_softmax(logits, -1).numpy()  # (B, T', V)
    t0 = time.perf_counter()
    beam_search_decode_ref(np.moveaxis(lp, 0, 1), [lp.shape[1]] * B,
                           beam_width=W, prune_k=K)
    t_dec = time.perf_counter() - t0
    total = t_enc + t_dec
    print(f"frontend+encoder: {t_enc:.2f} s  beam decode: {t_dec:.2f} s  "
          f"total: {total:.2f} s/iter = {B / total:.3f} seq/s "
          f"(T'={lp.shape[1]}, V={V}, W={W}, K={K})")


if __name__ == "__main__":
    main()
