#!/usr/bin/env python
"""Benchmark harness — emits the full BASELINE table as JSON metric lines.

The LAST stdout line is the headline metric (driver contract,
BASELINE.json): CTC loss+grad lattice cells/sec/chip on B=32, T=1000,
S=100, V=1024; cells = B*T*(2S+1).  Baseline: measured PyTorch-CPU =
6.4M cells/s (BASELINE.md); target >10x => >64M cells/s.  Earlier lines
cover every other BASELINE.md workload: the four remaining loss configs,
a production-vocab (V=32768) loss row, greedy decode, beam-8/beam-16
decode, the fused-LM / chunked-word-LM beam rows, and the N-best
rescoring pipeline row.

Methodology: the TPU here sits behind a tunnel whose dispatch/sync overhead
dwarfs kernel time, so each measurement chains R data-dependent iterations
INSIDE one jitted program (each iteration consumes the previous gradient /
scores) and reads one scalar; true per-iter = (t(R) - t(1)) / (R - 1) —
dispatch and RTT cancel.  Each reported number is the MEDIAN of 3 such
paired estimates (chip-state variance between single estimates was the
round-2 spread flagged in VERDICT.md).  See scripts/bench_verify.py for
the methodology validation.

Run `python bench.py` for the driver table; `--quick` emits only the
headline (and skips the slow large-vocab row); `--impl xla|pallas` forces
a loss implementation.
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

# PyTorch-CPU baselines, measured on this machine (BASELINE.md; the V=32768
# row measured 2026-08-17 with the same harness: 23.4 s/iter, 1 thread).
BASELINE_LOSS_CELLS_PER_S = {
    "synthetic-char": 8.2e6,
    "librispeech-char": 10.1e6,
    "ocr": 9.3e6,
    "bpe-asr": 4.9e6,
    "large-vocab": 0.14e6,
    "metric": 6.4e6,
}
BASELINE_GREEDY_SEQ_PER_S = 399.0  # torch-CPU argmax + py collapse
BASELINE_BEAM_SEQ_PER_S = 1.1      # pure-Python prefix beam (width 8)
# Pure-Python prefix beam at BASELINE configs 3/4's exact decode shapes,
# measured 2026-08-20 (beam_search_decode_ref, 1 vCPU): OCR W=10,K=16 at
# T=256,V=96 -> 437.6 ms/seq; BPE W=16,K=32 at T=1500,V=1024 -> 12.11 s/seq.
BASELINE_BEAM_OCR_SEQ_PER_S = 2.29
BASELINE_BEAM_BPE_SEQ_PER_S = 0.083
# Config 5 end-to-end long-form pipeline: torch-CPU conformer-256x4 encoder
# (1 thread, 8.0 s) + pure-Python beam-8 decode (5.2 s) at B=8, 30 s audio
# = 13.2 s/iter (scripts/baseline_pipeline_torch.py, measured 2026-08-20).
BASELINE_PIPELINE_SEQ_PER_S = 0.605
# Fastest practical pure-torch wavefront DP + autograd, 1 thread, measured
# 2026-08-18 (scripts/baseline_rnnt_torch.py): 1287 ms/iter at the row's
# config.  torch ships no native transducer loss.
BASELINE_RNNT_CELLS_PER_S = 0.201e6
# Per-sample NumPy host-loop decode baselines (same convention as the CTC
# pure-Python beam row), measured 2026-08-19 at the bench config
# (scripts/baseline_rnnt_torch.py --decode): greedy 69.1 ms/seq, ALSD
# beam-4 750.7 ms/seq.
BASELINE_RNNT_GREEDY_SEQ_PER_S = 14.5
# blank-dominated (realistic ASR) greedy workload, 5% emission rate:
# scripts/baseline_rnnt_torch.py --decode-rt (measured 2026-08-19)
BASELINE_RNNT_GREEDY_RT_SEQ_PER_S = 23.8
BASELINE_RNNT_BEAM_SEQ_PER_S = 1.33
# blank-dominated ALSD dict-beam host loop (same blank-biased joint as the
# greedy rt row): scripts/baseline_rnnt_torch.py --decode-beam-rt,
# measured 2026-08-20: 700.0 ms/seq.
BASELINE_RNNT_BEAM_RT_SEQ_PER_S = 1.43
# Chunked fused-joint loss+grad in torch (checkpointed chunks + autograd,
# 1 thread), measured 2026-08-19 at V=4096: 233.6 s/iter; the V=32768
# constant extrapolates x8 (the joint matmul dominates, linear in V).
BASELINE_RNNT_FUSED_CELLS_PER_S = 139.0

LOSS_CONFIGS = {
    # name: (B, T, S, V, r_long)
    "synthetic-char": (4, 50, 20, 29, 129),
    "librispeech-char": (32, 1000, 200, 29, 9),
    "ocr": (64, 256, 64, 96, 17),
    "bpe-asr": (16, 1500, 150, 1024, 9),
    "large-vocab": (16, 1000, 100, 32768, 3),
    "metric": (32, 1000, 100, 1024, 9),
}


def make_lattice(B, T, V, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((T, B, V)).astype(np.float32) * 2.0
    return jax.device_put(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))


def chained_time(make_run, r_long=9, reps=3):
    """Median of `reps` paired (t(1), t(r_long)) chained estimates.

    The raw delta is used — NO lower clamp.  A clamp like max(delta, eps)
    biases the median UP when the per-iter time is comparable to tunnel
    noise (the round-4 greedy row published a physically impossible
    4.5M seq/s that way); instead, callers pick r_long large enough that
    the chained delta dwarfs the noise, and `emit` enforces a physical
    HBM-bandwidth floor on every row.  A non-positive median means the
    measurement is pure noise — fail loudly rather than publish it."""
    run1, runl = make_run(1), make_run(r_long)
    float(run1())
    float(runl())
    est = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run1())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(runl())
        tl = time.perf_counter() - t0
        est.append((tl - t1) / (r_long - 1))
    med = float(np.median(est))
    if med <= 0:
        print(f"bench: non-positive chained estimate {med:.3e}s "
              f"(r_long={r_long} too small for this op vs timing noise) — "
              "refusing to publish", file=sys.stderr, flush=True)
        sys.exit(4)
    return med


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
                # Chain iterations through a SCALAR of (loss, grad) into a
                # one-element update: keeps true data dependence (no
                # overlap/hoisting) without the full-lattice read+write the
                # old `c + 1e-6*g` added per iteration (~3 extra HBM passes
                # — 30% of the measurement at V=32k).
                return c.at[0, 0, 0].add(1e-9 * (v + g.sum())), v

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(lp)

    dt = chained_time(make_run, r_long)
    return dt, B * T * (2 * S + 1) / dt


def bench_greedy(B, T, V, r_long=129):
    # r_long=129: the ~0.2 ms op needs ~25 ms of chained work so the paired
    # delta dwarfs tunnel timing noise (round 4's r=17 published noise).
    lp = make_lattice(B, T, V)
    il = jnp.asarray(np.full(B, T, np.int32))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = greedy_decode(c, il)
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0]

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
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0, 0]

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
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0, 0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(lp)

    dt = chained_time(make_run, r_long)
    return dt, B / dt


def _word_trigram_lm(V, seed=1):
    """2000-word hashed TRIGRAM word LM — the reference's KenLM regime."""
    from end2end_tpu.ops.lm import HashedWordNGramLM

    rng = np.random.default_rng(seed)
    spell = set()
    while len(spell) < 2000:
        ln = int(rng.integers(2, 9))
        spell.add(tuple(int(x) for x in rng.integers(1, V - 1, ln)))
    spellings = sorted(spell)
    wv = len(spellings)
    ngrams = {1: [], 2: [], 3: [], "unk": -6.0}
    for w in range(wv):
        ngrams[1].append(((w,), float(rng.uniform(-6, -1)),
                          float(rng.uniform(-1, 0))))
    for g in {tuple(int(x) for x in rng.integers(0, wv, 2))
              for _ in range(6 * wv)}:
        ngrams[2].append((g, float(rng.uniform(-4, -0.5)),
                          float(rng.uniform(-1, 0))))
    for g in {tuple(int(x) for x in rng.integers(0, wv, 3))
              for _ in range(8 * wv)}:
        ngrams[3].append((g, float(rng.uniform(-3, -0.3)), 0.0))
    return HashedWordNGramLM(spellings, 3, ngrams, V - 1)


def bench_beam_word_lm(B, T, V, W, K, r_long=9, chunk_t=128):
    """Word-TRIGRAM beam decode on the chunked kernel path.  Round 2 could
    only run this on the XLA scan (165 seq/s at this exact workload); the
    chunked path steers at chunk granularity instead.  chunk_t=128 is the
    measured optimum (chip 2026-08-21: 64/128/256 -> 9158/9625/7293 seq/s
    — the per-chunk replay/backtrace work grows with chunk length, so
    boundary amortization has a shallow optimum, not a linear win)."""
    from end2end_tpu.ops.beam_chunked import beam_search_chunked_lm

    lm = _word_trigram_lm(V)
    lp = make_lattice(B, T, V)
    il = jnp.asarray(np.full(B, T, np.int32))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = beam_search_chunked_lm(
                    c, il, beam_width=W, prune_k=K, max_symbols=256,
                    lm=lm, lm_alpha=0.8, lm_beta=0.4, chunk_t=chunk_t,
                )
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0, 0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(lp)

    dt = chained_time(make_run, r_long)
    return dt, B / dt


def bench_rescore(B, T, V, W, K, r_long=9, max_symbols=256):
    """The other production word-LM pattern: no-LM decode on the Pallas
    kernel, then EXACT shallow-fusion rescoring of all W surviving beams
    (`rescore_nbest`, same word-trigram LM as the chunked row — the
    fusion-vs-rescoring trade measured on the same workload)."""
    from end2end_tpu.ops.rescore import rescore_nbest

    lm = _word_trigram_lm(V)
    lp = make_lattice(B, T, V)
    il = jnp.asarray(np.full(B, T, np.int32))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = beam_search_decode(
                    c, il, beam_width=W, prune_k=K, max_symbols=max_symbols
                )
                toks, lens, scores = rescore_nbest(
                    toks, lens, scores, lm, lm_alpha=0.8, lm_beta=0.4
                )
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0, 0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(lp)

    dt = chained_time(make_run, r_long)
    return dt, B / dt


def bench_pipeline(B=8, seconds=30, r_long=3, W=8, K=16):
    """End-to-end Conformer-CTC long-form pipeline (BASELINE config 5):
    waveform -> log-mel -> encoder -> fused beam decode in ONE jitted
    program.  Baseline: the same architecture in torch-CPU (1 thread) +
    the pure-Python prefix beam (scripts/baseline_pipeline_torch.py)."""
    from end2end_tpu.models.pipeline import ConformerCTCPipeline, PipelineConfig

    pipe = ConformerCTCPipeline(PipelineConfig(
        vocab_size=32, d_model=256, num_layers=4, num_heads=4))
    rng = np.random.default_rng(0)
    n_samp = seconds * 16000
    wav = jax.device_put(jnp.asarray(
        rng.standard_normal((B, n_samp)).astype(np.float32)))
    ns = jnp.asarray(np.full(B, n_samp, np.int32))
    params = pipe.init(jax.random.key(0), wav, ns)

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = pipe.decode(
                    params, c, ns, beam_width=W, prune_k=K)
                return c.at[0, 0].add(1e-6 * scores.sum()), scores[0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(wav)

    dt = chained_time(make_run, r_long)
    return dt, B / dt


def bench_rnnt_loss(B, T, U, V, r_long=9):
    """Transducer loss+grad (diagonal-wavefront scan, ops/rnnt_loss.py).
    Baseline: the fastest practical pure-torch CPU implementation (same
    wavefront DP, autograd backward) — scripts/baseline_rnnt_torch.py."""
    from end2end_tpu import rnnt_loss

    rng = np.random.default_rng(0)
    logits = jax.device_put(jnp.asarray(
        rng.standard_normal((B, T, U + 1, V)).astype(np.float32)))
    tgt = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    il = jnp.asarray(np.full(B, T, np.int32))
    ul = jnp.asarray(np.full(B, U, np.int32))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                v, g = jax.value_and_grad(
                    lambda y: rnnt_loss(y, tgt, il, ul, reduction="mean")
                )(c)
                return c.at[0, 0, 0, 0].add(1e-9 * (v + g.sum())), v

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(logits)

    dt = chained_time(make_run, r_long)
    return dt, B * T * (U + 1) / dt


def bench_rnnt_fused(B, T, U, V, J=128, chunk_t=64, r_long=3):
    """Fused-joint transducer loss+grad at production vocab — the joint
    tensor (8.5 G elements ≈ 34 GB f32 materialized) is never built (ops/rnnt_loss.py
    rnnt_nll_fused).  Baseline: the same chunked-planes formulation in
    torch (checkpointed chunks + autograd), scripts/baseline_rnnt_torch.py
    --fused."""
    from end2end_tpu import fused_additive_joint, rnnt_loss_fused

    rng = np.random.default_rng(0)
    enc_p = jax.device_put(jnp.asarray(
        rng.standard_normal((B, T, J)).astype(np.float32)))
    pred_p = jax.device_put(jnp.asarray(
        rng.standard_normal((B, U + 1, J)).astype(np.float32)))
    w_out = jnp.asarray(
        (rng.standard_normal((J, V)) / np.sqrt(J)).astype(np.float32))
    joint = fused_additive_joint(w_out, jnp.zeros((V,), jnp.float32))
    tgt = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    il = jnp.asarray(np.full(B, T, np.int32))
    ul = jnp.asarray(np.full(B, U, np.int32))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                v_, g = jax.value_and_grad(
                    lambda e: rnnt_loss_fused(e, pred_p, joint, tgt, il, ul,
                                              chunk_t=chunk_t,
                                              reduction="mean"))(c)
                return c.at[0, 0, 0].add(1e-9 * (v_ + g.sum())), v_

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(enc_p)

    dt = chained_time(make_run, r_long)
    return dt, B * T * (U + 1) / dt


def bench_rnnt_fused_pallas(B, T, U, V, J=128, r_long=5):
    """Online-softmax fused joint (ops/rnnt_joint_pallas.py): the logits
    never exist in HBM in either pass (bf16-storage f32-accumulate MXU;
    chip-measured 74 ms/iter vs ~460-540 ms for every chunked-XLA
    configuration at this shape — the chunked path is HBM-bound on the
    logit buffer).  Baseline: the torch chunked-checkpoint formulation
    (scripts/baseline_rnnt_torch.py --fused)."""
    from end2end_tpu.ops.rnnt_joint_pallas import rnnt_nll_fused_pallas

    rng = np.random.default_rng(0)
    enc_p = jax.device_put(jnp.asarray(
        rng.standard_normal((B, T, J)).astype(np.float32)))
    pred_p = jax.device_put(jnp.asarray(
        rng.standard_normal((B, U + 1, J)).astype(np.float32)))
    w_out = jnp.asarray(
        (rng.standard_normal((J, V)) / np.sqrt(J)).astype(np.float32))
    b_out = jnp.zeros((V,), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    il = jnp.asarray(np.full(B, T, np.int32))
    ul = jnp.asarray(np.full(B, U, np.int32))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                v_, g = jax.value_and_grad(
                    lambda e: jnp.mean(rnnt_nll_fused_pallas(
                        e, pred_p, w_out, b_out, tgt, il, ul)))(c)
                return c.at[0, 0, 0].add(1e-9 * (v_ + g.sum())), v_

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(enc_p)

    dt = chained_time(make_run, r_long)
    return dt, B * T * (U + 1) / dt


def _rnnt_decoder(N, T, V, seed=0, h_enc=256, emb=128, hid=256, jdim=256,
                  blank_bias=0.0):
    """Production-flavored transducer decode setup: (N, T, 256) encoder
    outputs, GRU-256 predictor, 256-dim additive joint.  `blank_bias`
    biases the joint's blank output (blank_bias=1.1 gives a ~5% emission
    rate — the blank-dominated realistic ASR regime; 0.0 is the
    emission-saturated random joint)."""
    from functools import partial

    from end2end_tpu.ops.neural_lm import gru_step, random_gru_params
    from end2end_tpu.ops.rnnt_decode import FactoredAdditiveJoint

    rng = np.random.default_rng(seed)
    enc = jax.device_put(jnp.asarray(
        rng.normal(size=(N, T, h_enc)).astype(np.float32)))
    params = jax.tree.map(jnp.asarray,
                          random_gru_params(rng, V, emb_dim=emb,
                                            hidden_dim=hid))

    def w(*shape):
        return jnp.asarray((rng.standard_normal(shape) * 0.5
                            / np.sqrt(shape[0])).astype(np.float32))

    # Factored joint: the recommended decode configuration — the frame
    # projection leaves the sequential loop (one batched MXU matmul).
    # Draw order matches scripts/baseline_rnnt_torch.py (same RNG stream).
    w_e, w_p, b_j, w_o = w(h_enc, jdim), w(hid, jdim), 0.1 * w(jdim), \
        w(jdim, V)
    b_out = 0.1 * w(V)
    if blank_bias:
        b_out = b_out.at[0].add(blank_bias)
    joint = FactoredAdditiveJoint(w_e, w_p, b_j, w_o, b_out)
    pred = partial(gru_step, params)
    init_h = jnp.zeros((hid,), jnp.float32)
    il = jnp.asarray(np.full(N, T, np.int32))
    return enc, il, pred, init_h, joint


def bench_rnnt_greedy(N, T, V, r_long=9, s_cap=128):
    """Batched frame-synchronous greedy transducer decode
    (ops/rnnt_decode.py).  Baseline: the per-sample NumPy greedy loop
    (scripts/baseline_rnnt_torch.py --decode), the reference-class host
    formulation."""
    from end2end_tpu.ops.rnnt_decode import rnnt_greedy_decode

    enc, il, pred, init_h, joint = _rnnt_decoder(N, T, V)

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = rnnt_greedy_decode(
                    c, il, pred, init_h, joint, max_symbols=s_cap)
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(enc)

    dt = chained_time(make_run, r_long)
    return dt, N / dt


def bench_rnnt_greedy_rt(N, T, V, r_long=9, s_cap=128, lookahead=8):
    """Greedy transducer decode on the BLANK-DOMINATED workload (~5%
    emission rate — the realistic ASR regime) with `lookahead` frames
    evaluated per sequential step: the leading run of blank frames is
    consumed in one step (predictor state is loop-invariant across
    blanks), cutting the sequential step count up to lookahead-fold.
    Baseline: the same host NumPy loop on the same workload
    (scripts/baseline_rnnt_torch.py --decode-rt)."""
    from end2end_tpu.ops.rnnt_decode import rnnt_greedy_decode

    enc, il, pred, init_h, joint = _rnnt_decoder(N, T, V, blank_bias=1.1)

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = rnnt_greedy_decode(
                    c, il, pred, init_h, joint, max_symbols=s_cap,
                    lookahead=lookahead)
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(enc)

    dt = chained_time(make_run, r_long)
    return dt, N / dt


def bench_rnnt_beam(N, T, V, W, r_long=5, s_cap=128):
    """ALSD transducer beam search (ops/rnnt_decode.py), exhaustive
    per-beam candidates (prune_k default).  Baseline: the per-sample
    Python ALSD dict-beam loop (scripts/baseline_rnnt_torch.py --decode)."""
    from end2end_tpu.ops.rnnt_decode import rnnt_beam_decode

    enc, il, pred, init_h, joint = _rnnt_decoder(N, T, V)

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = rnnt_beam_decode(
                    c, il, pred, init_h, joint, beam_width=W,
                    max_symbols=s_cap)
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0, 0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(enc)

    dt = chained_time(make_run, r_long)
    return dt, N / dt


def bench_rnnt_beam_rt(N, T, V, W, r_long=5, s_cap=128, lookahead=8):
    """ALSD beam with `lookahead` frames' joints per sequential dispatch
    (ops/rnnt_decode.py window_body; tokens bit-identical to
    lookahead=1).  NOT emitted as a default bench row: chip measurement
    (2026-08-20, this workload) showed the window LOSES ~22x vs
    lookahead=1 — with W=4 the probability that ANY selected beam emits
    is ~1 per ALSD step even at a ~5% top-1 emission rate, so every
    dispatch pays F joint evals + F select_cores to advance ~1 step.
    The greedy (W=1) lookahead row keeps its win; see STATUS.md "Known
    gaps" for the measured analysis and the withdrawn-lever note.
    Kept callable for manual probes."""
    from end2end_tpu.ops.rnnt_decode import rnnt_beam_decode

    enc, il, pred, init_h, joint = _rnnt_decoder(N, T, V, blank_bias=1.1)

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = rnnt_beam_decode(
                    c, il, pred, init_h, joint, beam_width=W,
                    max_symbols=s_cap, lookahead=lookahead)
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0, 0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(enc)

    dt = chained_time(make_run, r_long)
    return dt, N / dt


def bench_rnnt_beam_lm(N, T, V, W, r_long=5, s_cap=128):
    """ALSD transducer beam search WITH bigram shallow fusion — the LM
    state rides the ALSD carry, advance deferred to survivors
    (ops/rnnt_decode.py lm=).  Baseline: the Python dict-beam loop (same
    class as the no-LM row; LM adds one table gather per candidate)."""
    from end2end_tpu.ops.lm import NGramLM
    from end2end_tpu.ops.rnnt_decode import rnnt_beam_decode

    enc, il, pred, init_h, joint = _rnnt_decoder(N, T, V)
    rng = np.random.default_rng(1)
    tbl = rng.normal(size=(V, V)).astype(np.float32)
    tbl = tbl - np.log(np.exp(tbl).sum(1, keepdims=True))
    lm = NGramLM(jnp.asarray(tbl))

    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = rnnt_beam_decode(
                    c, il, pred, init_h, joint, beam_width=W,
                    max_symbols=s_cap, lm=lm, lm_alpha=0.5, lm_beta=0.2)
                return c.at[0, 0, 0].add(1e-6 * scores.sum()), scores[0, 0]

            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()

        return lambda: run(enc)

    dt = chained_time(make_run, r_long)
    return dt, N / dt


# Generous per-chip HBM bandwidth ceiling (B/s).  v5e is ~0.82 TB/s, v5p
# ~2.8 TB/s; 3.5 TB/s passes any real chip while still catching the
# noise-artifact class (round 4 published a greedy row implying 18 TB/s).
HBM_BW_CEILING = 3.5e12


def emit(metric, value, unit, baseline, dt=None, min_hbm_bytes=None):
    """One JSON metric line on stdout (the driver parses the LAST line).

    When (dt, min_hbm_bytes) are given, the row must be PHYSICALLY possible:
    the op provably moves at least min_hbm_bytes through HBM per iteration
    (e.g. one read of the input lattice), so dt below min_hbm_bytes /
    HBM_BW_CEILING can only be a measurement artifact — fail loudly
    instead of publishing it."""
    if dt is not None and min_hbm_bytes is not None:
        implied = min_hbm_bytes / dt
        if implied > HBM_BW_CEILING:
            print(f"bench: IMPOSSIBLE row '{metric}': {dt*1e6:.1f} us/iter "
                  f"implies {implied/1e12:.1f} TB/s HBM (>= "
                  f"{min_hbm_bytes/1e6:.0f} MB must move per iter; ceiling "
                  f"{HBM_BW_CEILING/1e12:.1f} TB/s) — measurement artifact, "
                  "refusing to publish", file=sys.stderr, flush=True)
            sys.exit(4)
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 2),
        "unit": unit,
        "vs_baseline": round(float(value) / baseline, 2),
    }), flush=True)


def _tunnel_watchdog(timeout_s=600):
    """Fail fast instead of hanging forever if the TPU tunnel is dead.

    The tunneled chip occasionally wedges (stale claim on the relay —
    observed round 3): every device op then blocks indefinitely, which
    would hang the driver's bench run.  Probe with one trivial op on a
    watchdog timer; legitimate first-compiles take 20-60 s (Pallas cold
    compile up to ~240 s), so the bound is generous.  On timeout, exit
    nonzero with a diagnostic — an honest infra failure beats a hang."""
    import os
    import threading

    timeout_s = float(os.environ.get("E2E_BENCH_WATCHDOG_S", timeout_s))
    done = threading.Event()

    def arm():
        if not done.wait(timeout_s):
            print(f"bench: TPU tunnel unresponsive after {timeout_s}s — "
                  "aborting (no metrics emitted)", file=sys.stderr,
                  flush=True)
            os._exit(3)

    threading.Thread(target=arm, daemon=True).start()
    jnp.ones((8,)).sum().block_until_ready()
    done.set()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="headline metric only")
    ap.add_argument("--all", action="store_true",
                    help="(kept for compatibility; the full table is now "
                         "the default)")
    ap.add_argument("--impl", default="auto")
    args = ap.parse_args()

    _tunnel_watchdog()

    if not args.quick:
        # The four non-headline loss configs + the production-vocab row.
        for name in ("synthetic-char", "librispeech-char", "ocr", "bpe-asr",
                     "large-vocab"):
            B, T, S, V, r = LOSS_CONFIGS[name]
            dt, cps = bench_loss_grad(B, T, S, V, args.impl, r_long=r)
            emit(f"ctc_loss+grad {name} (B={B},T={T},S={S},V={V})",
                 cps / 1e6, "M cells/s", BASELINE_LOSS_CELLS_PER_S[name] / 1e6,
                 dt=dt, min_hbm_bytes=4 * T * B * V)  # grad write alone

        dt, sps = bench_greedy(32, 1000, 1024)
        emit("greedy_decode seq/s (B=32,T=1000,V=1024)", sps, "seq/s",
             BASELINE_GREEDY_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 32 * 1000 * 1024)  # argmax lattice read
        dt, sps, _ = bench_beam(32, 1000, 1024, 8, 16)
        emit("beam8_decode seq/s (B=32,T=1000,V=1024,prune=16)", sps, "seq/s",
             BASELINE_BEAM_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 32 * 1000 * 1024)
        dt, sps, _ = bench_beam(32, 1000, 1024, 16, 32)
        emit("beam16_decode seq/s (B=32,T=1000,V=1024,prune=32)", sps,
             "seq/s", BASELINE_BEAM_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 32 * 1000 * 1024)
        # BASELINE.json configs 3 and 4 at their EXACT decode shapes.
        dt, sps, _ = bench_beam(64, 256, 96, 10, 16, r_long=17)
        emit("beam10_decode OCR seq/s (B=64,T=256,V=96,prune=16)", sps,
             "seq/s", BASELINE_BEAM_OCR_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 64 * 256 * 96)
        dt, sps, _ = bench_beam(16, 1500, 1024, 16, 32)
        emit("beam16_decode BPE seq/s (B=16,T=1500,V=1024,prune=32)", sps,
             "seq/s", BASELINE_BEAM_BPE_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 16 * 1500 * 1024)
        # BASELINE.json config 5: the end-to-end long-form pipeline.
        dt, sps = bench_pipeline(8, 30)
        emit("pipeline_longform seq/s (B=8,30s audio,conformer-256x4,beam8)",
             sps, "seq/s", BASELINE_PIPELINE_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 8 * 30 * 16000)
        dt, sps = bench_beam_lm(128, 1000, 29, 8, 16)
        emit("beam8+bigramLM_fused seq/s (B=128,T=1000,V=29)", sps, "seq/s",
             BASELINE_BEAM_SEQ_PER_S, dt=dt, min_hbm_bytes=4 * 128 * 1000 * 29)
        dt, sps = bench_beam_word_lm(128, 1000, 29, 8, 16)
        emit("beam8+wordTRIGRAM_chunked seq/s (B=128,T=1000,V=29,2k words)",
             sps, "seq/s", BASELINE_BEAM_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 128 * 1000 * 29)
        dt, sps = bench_rescore(128, 1000, 29, 8, 16)
        emit("beam8+wordTRIGRAM_rescore seq/s (B=128,T=1000,V=29,2k words)",
             sps, "seq/s", BASELINE_BEAM_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 128 * 1000 * 29)
        dt, cps = bench_rnnt_loss(8, 400, 80, 256)
        emit("rnnt_loss+grad lattice cells/s (B=8,T=400,U=80,V=256)",
             cps / 1e6, "M cells/s", BASELINE_RNNT_CELLS_PER_S / 1e6,
             dt=dt, min_hbm_bytes=4 * 8 * 400 * 81 * 256)  # grad write
        dt, sps = bench_rnnt_greedy(16, 400, 256)
        emit("rnnt_greedy seq/s (B=16,T=400,V=256,GRU-256)", sps, "seq/s",
             BASELINE_RNNT_GREEDY_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 16 * 400 * 256)  # encoder read
        dt, sps = bench_rnnt_greedy_rt(16, 400, 256)
        emit("rnnt_greedy_rt seq/s (B=16,T=400,V=256,blank-dom,"
             "lookahead=8)", sps, "seq/s", BASELINE_RNNT_GREEDY_RT_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 16 * 400 * 256)
        dt, sps = bench_rnnt_beam(16, 400, 256, 4)
        emit("rnnt_beam4 seq/s (B=16,T=400,V=256,GRU-256)", sps, "seq/s",
             BASELINE_RNNT_BEAM_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 16 * 400 * 256)
        dt, sps = bench_rnnt_beam_lm(16, 400, 256, 4)
        emit("rnnt_beam4+bigramLM seq/s (B=16,T=400,V=256,GRU-256)", sps,
             "seq/s", BASELINE_RNNT_BEAM_SEQ_PER_S,
             dt=dt, min_hbm_bytes=4 * 16 * 400 * 256)
        dt, cps = bench_rnnt_fused(8, 400, 80, 32768)
        emit("rnnt_fused_f32_loss+grad cells/s (B=8,T=400,U=80,V=32768,"
             "J=128)", cps / 1e6, "M cells/s",
             BASELINE_RNNT_FUSED_CELLS_PER_S / 1e6)
        dt, cps = bench_rnnt_fused_pallas(8, 400, 80, 32768)
        emit("rnnt_fused_loss+grad cells/s (B=8,T=400,U=80,V=32768,J=128)",
             cps / 1e6, "M cells/s", BASELINE_RNNT_FUSED_CELLS_PER_S / 1e6)

    # Headline LAST (the driver parses the final line).
    B, T, S, V, r = LOSS_CONFIGS["metric"]
    dt, cps = bench_loss_grad(B, T, S, V, args.impl, r_long=r)
    emit("ctc_loss+grad lattice cells/sec/chip (B=32,T=1000,S=100,V=1024)",
         cps / 1e6, "M cells/s", BASELINE_LOSS_CELLS_PER_S["metric"] / 1e6,
         dt=dt, min_hbm_bytes=4 * T * B * V)


if __name__ == "__main__":
    main()
