"""Chunked-LM beam decode throughput vs the XLA scan (VERDICT r2 item 1).

Measures beam-8 decoding with word-level / hashed n-gram LMs — the configs
that previously fell off the kernel path onto the ~30x-slower scan — via
the chunked kernel pipeline (ops/beam_chunked.py), on the chained-iteration
methodology bench.py documents.

Usage: python scripts/bench_beam_chunked.py [B] [T] [V]
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from end2end_tpu import beam_search_decode
from end2end_tpu.ops.beam_chunked import beam_search_chunked_lm
from end2end_tpu.ops.lm import (
    HashedNGramLM, HashedWordNGramLM, NGramLM, WordNGramLM,
    bigram_from_counts,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
V = int(sys.argv[3]) if len(sys.argv) > 3 else 29
W, K = 8, 16
SPACE = V - 1  # last label is the word separator


def make_word_lms(rng, n_words=2000, order=3):
    """Synthetic word LMs over random spellings (chars 1..V-2)."""
    spell = set()
    while len(spell) < n_words:
        ln = int(rng.integers(2, 9))
        spell.add(tuple(int(x) for x in rng.integers(1, V - 1, ln)))
    spellings = sorted(spell)
    wv = len(spellings)
    bos, eos = wv, wv + 1
    ngrams = {1: [], 2: [], 3: [], "unk": -6.0}
    for w in range(wv):
        ngrams[1].append(((w,), float(rng.uniform(-6, -1)),
                          float(rng.uniform(-1, 0))))
    ngrams[1].append(((bos,), -99.0, float(rng.uniform(-1, 0))))
    ngrams[1].append(((eos,), float(rng.uniform(-4, -1)), 0.0))
    seen2 = set()
    for _ in range(6 * wv):
        g = (int(rng.integers(0, wv)), int(rng.integers(0, wv)))
        if g not in seen2:
            seen2.add(g)
            ngrams[2].append((g, float(rng.uniform(-4, -0.5)),
                              float(rng.uniform(-1, 0))))
    seen3 = set()
    if order >= 3:
        for _ in range(8 * wv):
            g = tuple(int(x) for x in rng.integers(0, wv, 3))
            if g not in seen3:
                seen3.add(g)
                ngrams[3].append((g, float(rng.uniform(-3, -0.3)), 0.0))
    word3 = HashedWordNGramLM(spellings, order, ngrams, SPACE)
    # dense word bigram over the same spellings
    dense = np.log(np.maximum(
        rng.random((wv, wv)).astype(np.float32) * 0.01, 1e-4))
    word2 = WordNGramLM(spellings, dense,
                        rng.uniform(-6, -1, wv).astype(np.float32), SPACE,
                        unk_logp=-6.0)
    return word3, word2


def make_token_trigram(rng):
    ngrams = {1: [], 2: [], 3: [], "unk": -8.0}
    for a in range(V):
        ngrams[1].append(((a,), float(rng.uniform(-4, -1)),
                          float(rng.uniform(-1, 0))))
        for b in range(V):
            if rng.random() < 0.5:
                ngrams[2].append(((a, b), float(rng.uniform(-3, -0.5)),
                                  float(rng.uniform(-1, 0))))
    for _ in range(8 * V * V):
        g = tuple(int(x) for x in rng.integers(0, V, 3))
        ngrams[3].append((g, float(rng.uniform(-2, -0.3)), 0.0))
    return HashedNGramLM(3, {k: list(dict((tuple(i), (i, l, b))
                         for i, l, b in v).values()) if isinstance(v, list)
                         else v for k, v in ngrams.items()}, V)


def chained(make_run, r_long=9, reps=3):
    run1, runl = make_run(1), make_run(r_long)
    float(run1()); float(runl())
    est = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run1()); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(runl()); tl = time.perf_counter() - t0
        est.append(max(tl - t1, 1e-9) / (r_long - 1))
    return float(np.median(est))


def bench(fn_builder, label):
    def make_run(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = fn_builder(c)
                return c + 1e-6 * scores.sum(), scores[0, 0]
            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()
        return lambda: run(lp)
    dt = chained(make_run)
    print(f"{label:58s} {dt*1e3:8.2f} ms/iter {B/dt:10.1f} seq/s",
          flush=True)
    return B / dt


rng = np.random.default_rng(0)
logits = rng.standard_normal((T, B, V)).astype(np.float32) * 2.0
lp = jax.device_put(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
il = jnp.asarray(np.full(B, T, np.int32))

word3, word2 = make_word_lms(rng)
tok3 = make_token_trigram(rng)

print(f"B={B} T={T} V={V} W={W} K={K}  backend={jax.default_backend()}",
      flush=True)
for chunk_t in (64, 128, 256):
    bench(lambda c, ct=chunk_t: beam_search_chunked_lm(
        c, il, beam_width=W, prune_k=K, max_symbols=256, lm=word3,
        lm_alpha=0.8, lm_beta=0.4, chunk_t=ct),
        f"chunked word-TRIGRAM (2k words, chunk_t={chunk_t})")
bench(lambda c: beam_search_chunked_lm(
    c, il, beam_width=W, prune_k=K, max_symbols=256, lm=word2,
    lm_alpha=0.8, lm_beta=0.4, chunk_t=128),
    "chunked word-bigram dense (2k words, chunk_t=128)")
bench(lambda c: beam_search_chunked_lm(
    c, il, beam_width=W, prune_k=K, max_symbols=256, lm=tok3,
    lm_alpha=0.8, lm_beta=0.4, chunk_t=128),
    "chunked hashed token-trigram (chunk_t=128)")
if os.environ.get("SKIP_SCAN", "0") != "1":
    bench(lambda c: beam_search_decode(
        c, il, beam_width=W, prune_k=K, max_symbols=256, lm=word3,
        lm_alpha=0.8, lm_beta=0.4, implementation="xla"),
        "XLA scan word-TRIGRAM (the round-2 fallback)")


# rescore_nbest throughput (VERDICT r2 weak #6): kernel no-LM decode +
# exact word-trigram rescoring of the full N-best list
from end2end_tpu import rescore_nbest  # noqa: E402
from end2end_tpu.ops.beam_search_pallas import beam_search_pallas  # noqa: E402


def bench_rescore():
    def fn(c):
        t, ln, s = beam_search_pallas(c, il, beam_width=W, prune_k=K,
                                      max_symbols=256)
        return rescore_nbest(t, ln, s, word3, lm_alpha=0.8, lm_beta=0.4)
    bench(lambda c: fn(c), "no-LM kernel decode + word-TRIGRAM rescore_nbest")


bench_rescore()

# neural-LM fusion (ops/neural_lm.py): GRU char LM at a production-ish
# size; chunked kernel path, rescoring pattern, and (unless skipped) the
# exact per-frame scan fusion
from end2end_tpu import NeuralLM  # noqa: E402
from end2end_tpu.ops.neural_lm import random_gru_params  # noqa: E402

gru = NeuralLM.gru(random_gru_params(rng, V, emb_dim=64, hidden_dim=256))
bench(lambda c: beam_search_chunked_lm(
    c, il, beam_width=W, prune_k=K, max_symbols=256, lm=gru,
    lm_alpha=0.8, lm_beta=0.4, chunk_t=128),
    "chunked GRU NeuralLM (H=256, chunk_t=128)")


def bench_gru_rescore():
    def fn(c):
        t, ln, s = beam_search_pallas(c, il, beam_width=W, prune_k=K,
                                      max_symbols=256)
        return rescore_nbest(t, ln, s, gru, lm_alpha=0.8, lm_beta=0.4)
    bench(lambda c: fn(c), "no-LM kernel decode + GRU NeuralLM rescore_nbest")


bench_gru_rescore()
if os.environ.get("SKIP_SCAN", "0") != "1":
    bench(lambda c: beam_search_decode(
        c, il, beam_width=W, prune_k=K, max_symbols=256, lm=gru,
        lm_alpha=0.8, lm_beta=0.4, implementation="xla"),
        "XLA scan GRU NeuralLM (exact per-frame fusion)")
