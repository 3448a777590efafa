#!/usr/bin/env python
"""Benchmark harness — emits ONE JSON line with the headline metric.

Headline (BASELINE.json): CTC loss+grad lattice cells/sec/chip on
B=32, T=1000, S=100, V=1024; cells = B*T*(2S+1).  Baseline: measured
PyTorch-CPU = 6.4M cells/s (BASELINE.md); target >10x => >64M cells/s.

Methodology: the TPU here sits behind a tunnel whose dispatch/sync overhead
dwarfs kernel time, so each measurement chains R data-dependent iterations
INSIDE one jitted program (each iteration consumes the previous gradient /
scores) and reads one scalar; true per-iter = (t(R) - t(1)) / (R - 1) —
dispatch and RTT cancel.  See scripts/bench_verify.py for the validation.

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


def make_lattice(B, T, V, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((T, B, V)).astype(np.float32) * 2.0
    return jax.device_put(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))


def chained_time(make_run, r_long=9):
    """t(1), t(r_long) of one-jit chained runs; returns true secs/iter."""
    run1, runl = make_run(1), make_run(r_long)
    float(run1())
    float(runl())
    t0 = time.perf_counter()
    float(run1())
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(runl())
    tl = time.perf_counter() - t0
    return max(tl - t1, 1e-9) / (r_long - 1)


def bench_loss_grad(B, T, S, V, implementation="auto", r_long=9):
    rng = np.random.default_rng(0)
    lp = make_lattice(B, T, V)
    tgt = jnp.asarray(rng.integers(1, V, (B, S)).astype(np.int32))
    il = jnp.asarray(np.full(B, T, np.int32))
    tl = jnp.asarray(np.full(B, S, np.int32))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                v, g = jax.value_and_grad(
                    lambda y: ctc_loss(
                        y, tgt, il, tl, reduction="mean", zero_infinity=True,
                        implementation=implementation,
                    )
                )(c)
                return c + 1e-6 * g, v

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(lp)

    dt = chained_time(make_run, r_long)
    return dt, B * T * (2 * S + 1) / dt


def bench_greedy(B, T, V, r_long=17):
    lp = make_lattice(B, T, V)
    il = jnp.asarray(np.full(B, T, np.int32))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = greedy_decode(c, il)
                return c + 1e-6 * scores.sum(), scores[0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(lp)

    dt = chained_time(make_run, r_long)
    return dt, B / dt


def bench_beam(B, T, V, W, K, r_long=9, collapse=False, seed=0):
    if collapse:
        from end2end_tpu.ops.decode_utils import collapse_and_bucket

        rng = np.random.default_rng(seed)
        peak = 0.995
        lp_np = np.full((T, B, V), np.log((1 - peak) / (V - 1)), np.float32)
        ids = np.where(rng.random((T, B)) < 0.7, 0, rng.integers(1, V, (T, B)))
        for t in range(T):
            lp_np[t, np.arange(B), ids[t]] = np.log(peak)
        lp_np, new_len = collapse_and_bucket(lp_np, np.full(B, T, np.int32))
        lp = jax.device_put(jnp.asarray(lp_np))
        il = jnp.asarray(new_len)
        keep_ratio = lp_np.shape[0] / T
    else:
        lp = make_lattice(B, T, V)
        il = jnp.asarray(np.full(B, T, np.int32))
        keep_ratio = 1.0

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = beam_search_decode(
                    c, il, beam_width=W, prune_k=K, max_symbols=256
                )
                return c + 1e-6 * scores.sum(), scores[0, 0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(lp)

    dt = chained_time(make_run, r_long)
    return dt, B / dt, keep_ratio


def bench_beam_lm(B, T, V, W, K, r_long=9):
    """Char-vocab beam decode with the in-kernel dense-bigram LM fusion."""
    from end2end_tpu.ops.lm import NGramLM, bigram_from_counts

    rng = np.random.default_rng(0)
    lm = NGramLM(bigram_from_counts(rng.integers(0, 20, (V, V))))
    lp = make_lattice(B, T, V)
    il = jnp.asarray(np.full(B, T, np.int32))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = beam_search_decode(
                    c, il, beam_width=W, prune_k=K, max_symbols=256,
                    lm=lm, lm_alpha=0.6, lm_beta=0.3,
                )
                return c + 1e-6 * scores.sum(), scores[0, 0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(lp)

    dt = chained_time(make_run, r_long)
    return dt, B / dt


BASELINE_GREEDY_SEQ_PER_S = 399.0  # torch-CPU argmax + py collapse, BASELINE.md
BASELINE_BEAM_SEQ_PER_S = 1.1      # pure-Python prefix beam, BASELINE.md


def emit(metric, value, unit, baseline):
    """One JSON metric line on stdout (the driver parses the LAST line)."""
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 2),
        "unit": unit,
        "vs_baseline": round(float(value) / baseline, 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="full config table")
    ap.add_argument("--impl", default="auto")
    args = ap.parse_args()

    if args.all:
        for name, (B, T, S, V, r) in {
            "synthetic-char": (4, 50, 20, 29, 129),
            "librispeech-char": (32, 1000, 200, 29, 9),
            "ocr": (64, 256, 64, 96, 17),
            "bpe-asr": (16, 1500, 150, 1024, 9),
        }.items():
            dt, cps = bench_loss_grad(B, T, S, V, args.impl, r_long=r)
            print(f"loss+grad {name} B={B},T={T},S={S},V={V} "
                  f"{dt*1e3:8.2f} ms/iter {cps/1e6:10.1f} M cells/s",
                  file=sys.stderr)
        dt, sps, _ = bench_beam(32, 1000, 1024, 16, 32)
        print(f"beam-16 (prune 32) B=32,T=1000,V=1024 {dt*1e3:8.2f} ms/iter "
              f"{sps:9.1f} seq/s", file=sys.stderr)
        dt, sps, ratio = bench_beam(32, 1000, 1024, 8, 16, collapse=True)
        print(f"beam-8 + blank-collapse (peaked, keep={ratio:.0%}) "
              f"{dt*1e3:8.2f} ms/iter {sps:9.1f} seq/s", file=sys.stderr)
        dt, sps = bench_beam_lm(128, 1000, 29, 8, 16)
        print(f"beam-8 + bigram LM fused in-kernel B=128,T=1000,V=29 "
              f"{dt*1e3:8.2f} ms/iter {sps:9.1f} seq/s", file=sys.stderr)

    # Default (driver-captured) emission: decoder metrics first, then the
    # loss headline as the FINAL line (the driver parses the last line).
    dt, sps = bench_greedy(32, 1000, 1024)
    emit("greedy_decode seq/s (B=32,T=1000,V=1024)", sps, "seq/s",
         BASELINE_GREEDY_SEQ_PER_S)
    dt, sps, _ = bench_beam(32, 1000, 1024, 8, 16)
    emit("beam8_decode seq/s (B=32,T=1000,V=1024,prune=16)", sps, "seq/s",
         BASELINE_BEAM_SEQ_PER_S)
    dt, cps = bench_loss_grad(32, 1000, 100, 1024, args.impl)
    emit("ctc_loss+grad lattice cells/sec/chip (B=32,T=1000,S=100,V=1024)",
         cps / 1e6, "M cells/s", BASELINE_CELLS_PER_S / 1e6)


if __name__ == "__main__":
    main()
