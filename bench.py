#!/usr/bin/env python
"""Benchmark harness — emits ONE JSON line with the headline metric.

Headline (BASELINE.json): CTC loss+grad lattice cells/sec/chip on
B=32, T=1000, S=100, V=1024; cells = B*T*(2S+1).  Baseline: measured
PyTorch-CPU = 6.4M cells/s (BASELINE.md); target >10x => >64M cells/s.

Run with --all for the full config table (all BASELINE.json workloads +
decoders).  Runs on the default backend (the real TPU chip under the driver).
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from end2end_tpu import beam_search_decode, ctc_loss, greedy_decode  # noqa: E402

BASELINE_CELLS_PER_S = 6.4e6  # torch CPU, BASELINE.md


def make_problem(B, T, S, V, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((T, B, V)).astype(np.float32) * 2.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = rng.integers(1, V, (B, S)).astype(np.int32)
    il = np.full(B, T, np.int32)
    tl = np.full(B, S, np.int32)
    return jax.device_put(lp), jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl)


def time_fn(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_loss_grad(B, T, S, V, implementation="auto", iters=20):
    lp, tgt, il, tl = make_problem(B, T, S, V)

    @jax.jit
    def step(x):
        loss, grad = jax.value_and_grad(
            lambda y: ctc_loss(
                y, tgt, il, tl, reduction="mean", zero_infinity=True,
                implementation=implementation,
            )
        )(x)
        return loss, grad

    dt = time_fn(step, lp, iters=iters)
    cells = B * T * (2 * S + 1)
    return dt, cells / dt


def bench_greedy(B, T, V, iters=20):
    lp, _, il, _ = make_problem(B, T, 10, V)
    fn = jax.jit(lambda x: greedy_decode(x, il))
    dt = time_fn(fn, lp, iters=iters)
    return dt, B / dt


def bench_beam(B, T, V, W, K, iters=5):
    lp, _, il, _ = make_problem(B, T, 10, V)

    def fn(x):
        return beam_search_decode(x, il, beam_width=W, prune_k=K, max_symbols=256)

    dt = time_fn(fn, lp, iters=iters)
    return dt, B / dt


def bench_beam_collapsed(B, T, V, W, K, iters=5, blank_frac=0.7, peak=0.995):
    """Beam decode on a trained-model-like peaked lattice after blank
    collapse (arXiv:2210.17017).  Returns (dt, seq/s, kept-frame ratio)."""
    from end2end_tpu.ops.decode_utils import collapse_and_bucket

    rng = np.random.default_rng(0)
    lp = np.full((T, B, V), np.log((1 - peak) / (V - 1)), np.float32)
    ids = np.where(rng.random((T, B)) < blank_frac, 0,
                   rng.integers(1, V, (T, B)))
    for t in range(T):
        lp[t, np.arange(B), ids[t]] = np.log(peak)
    il = np.full(B, T, np.int32)
    packed, new_len = collapse_and_bucket(lp, il)
    packed = jax.device_put(jnp.asarray(packed))
    new_len = jnp.asarray(new_len)

    def fn(x):
        return beam_search_decode(x, new_len, beam_width=W, prune_k=K,
                                  max_symbols=256)

    dt = time_fn(fn, packed, iters=iters)
    return dt, B / dt, packed.shape[0] / T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="full config table")
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if args.all:
        rows = []
        for name, (B, T, S, V) in {
            "synthetic-char": (4, 50, 20, 29),
            "librispeech-char": (32, 1000, 200, 29),
            "ocr": (64, 256, 64, 96),
            "bpe-asr": (16, 1500, 150, 1024),
            "metric": (32, 1000, 100, 1024),
        }.items():
            dt, cps = bench_loss_grad(B, T, S, V, args.impl, args.iters)
            rows.append((f"loss+grad {name} B={B},T={T},S={S},V={V}",
                         f"{dt*1e3:8.2f} ms/iter  {cps/1e6:10.1f} M cells/s"))
            print(rows[-1][0], rows[-1][1], file=sys.stderr)
        dt, sps = bench_greedy(32, 1000, 1024, args.iters)
        print(f"greedy B=32,T=1000,V=1024 {dt*1e3:8.2f} ms/iter {sps:9.0f} seq/s",
              file=sys.stderr)
        for W, K in ((8, 16), (16, 32)):
            dt, sps = bench_beam(32, 1000, 1024, W, K)
            print(f"beam-{W} (prune {K}) B=32,T=1000,V=1024 {dt*1e3:8.2f} ms/iter "
                  f"{sps:9.1f} seq/s", file=sys.stderr)
        dt, sps, ratio = bench_beam_collapsed(32, 1000, 1024, 8, 16)
        print(f"beam-8 + blank-collapse (peaked lattice, keep={ratio:.0%}) "
              f"{dt*1e3:8.2f} ms/iter {sps:9.1f} seq/s", file=sys.stderr)

    dt, cps = bench_loss_grad(32, 1000, 100, 1024, args.impl, args.iters)
    print(json.dumps({
        "metric": "ctc_loss+grad lattice cells/sec/chip (B=32,T=1000,S=100,V=1024)",
        "value": round(cps / 1e6, 2),
        "unit": "M cells/s",
        "vs_baseline": round(cps / BASELINE_CELLS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
