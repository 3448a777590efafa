#!/usr/bin/env python
"""Benchmark the C++ host decoder (csrc/e2e_native.cpp) on this box's CPU.

Why: the reference's own C++ beam decoder was unavailable to measure
(BASELINE.md — only the pure-Python prefix beam, 1.1 seq/s, bounds the slow
end).  Our csrc decoder is the same kind of artifact (threaded C++
unordered_map prefix beam with top-K pruning), so its throughput on this
1-vCPU box is a defensible *reference-class C++* baseline for the TPU
kernel's seq/s numbers.

Pure CPU — no jax import (safe to run while the chip is busy).

Usage: python scripts/bench_native.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from end2end_tpu.utils.native import available, beam_search_cpu, greedy_decode_cpu


def log_softmax_np(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))


def main():
    assert available(), "native library unavailable"
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.default_rng(0)

    # the BASELINE.json metric beam config
    B, T, V, W, K = 32, 1000, 1024, 8, 16
    lp = log_softmax_np(rng.standard_normal((T, B, V)) * 2).astype(np.float32)
    il = np.full(B, T, np.int32)

    # warm-up (first call builds/loads the .so)
    beam_search_cpu(lp[:50], np.full(B, 50, np.int32), beam_width=W,
                    prune_k=K, n_threads=1)

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        beam_search_cpu(lp, il, beam_width=W, prune_k=K, n_threads=1)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"beam-{W} (prune {K}) B={B},T={T},V={V}, C++ 1 thread: "
          f"{dt:.3f} s/batch = {B / dt:.1f} seq/s")

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        greedy_decode_cpu(lp, il)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"greedy B={B},T={T},V={V}, C++: {dt:.3f} s/batch = "
          f"{B / dt:.1f} seq/s")


if __name__ == "__main__":
    main()
