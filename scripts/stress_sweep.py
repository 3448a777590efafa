"""Deep offline differential stress sweep (not part of the CI suite).

Hundreds of randomized rounds of the same differential checks the fuzz
tests run, over wider shape/parameter ranges:

  * loss+grad vs torch.nn.CTCLoss: random (B, T, S, V), random blank,
    all reductions, zero_infinity with deliberately impossible samples,
    1-D concatenated targets.
  * beam: Pallas (interpret) == XLA scan == float64 dict oracle at full
    vocab; LM-fused pallas == xla with random bigram LMs.

Usage: python scripts/stress_sweep.py [rounds] [seed]
Prints one line per batch and a final PASS/FAIL summary.

Every round compiles fresh programs (random shapes), and the CPU LLVM JIT
never fully releases executable mappings even after jax.clear_caches() —
at ~150 accumulated round-compiles the JIT starts failing with "Cannot
allocate memory" (map-count exhaustion, not RSS).  So the driver runs the
sweep in BATCHES of rounds, each in a fresh subprocess (--batch mode);
batch b is seeded SEED+b, so any failure reproduces standalone with
`--batch b` and the same seed.
"""
import os
import subprocess
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# Force CPU unconditionally BEFORE any backend-initializing call: probing
# jax.default_backend() first would itself initialize the TPU plugin (the
# env-ordering pitfall in CLAUDE.md), making the guard a no-op and silently
# hogging the single-client TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # for the time-parallel rounds

import torch

from end2end_tpu import beam_search_decode, ctc_loss, rescore_nbest
from end2end_tpu.ops.beam_chunked import beam_search_chunked_lm
from end2end_tpu.ops.beam_search_pallas import beam_search_pallas
from end2end_tpu.ops.lm import (
    HashedNGramLM, NGramLM, WordNGramLM, bigram_from_counts,
)
from end2end_tpu.utils.reference_impl import beam_search_decode_ref

_args = [a for a in sys.argv[1:] if a != "--batch"]
BATCH_MODE = "--batch" in sys.argv[1:]
ROUNDS = int(_args[0]) if len(_args) > 0 else 300
SEED = int(_args[1]) if len(_args) > 1 else 12345
BATCH_ROUNDS = 10  # rounds per subprocess (fresh LLVM JIT each batch)


def lsm(x):
    return x - np.log(np.sum(np.exp(x), -1, keepdims=True))


def torch_ctc(lp, tgt, il, tl, blank, reduction, zero_inf):
    t = torch.tensor(lp, requires_grad=True)
    loss = torch.nn.functional.ctc_loss(
        t, torch.tensor(tgt), torch.tensor(il), torch.tensor(tl),
        blank=blank, reduction=reduction, zero_infinity=zero_inf,
    )
    out = loss.sum() if reduction == "none" else loss
    out.backward()
    return (loss.detach().numpy(), t.grad.numpy())


def loss_round(rng, i):
    B = int(rng.integers(1, 6))
    T = int(rng.integers(6, 90))
    S = int(rng.integers(1, min(22, T)))
    V = int(rng.integers(3, 40))
    blank = int(rng.integers(0, V))
    reduction = ["none", "sum", "mean"][int(rng.integers(3))]
    zero_inf = bool(rng.integers(2))
    lp = lsm(rng.standard_normal((T, B, V)) * 2).astype(np.float32)
    others = [c for c in range(V) if c != blank]
    tgt = rng.choice(others, (B, S)).astype(np.int32)
    il = rng.integers(max(T // 2, 1), T + 1, B).astype(np.int32)
    tl = rng.integers(1, S + 1, B).astype(np.int32)
    if zero_inf and B > 1:
        tl[0] = S  # likely-impossible sample now and then
        il[0] = max(int(rng.integers(1, max(S, 2))), 1)
    cfg = (i, B, T, S, V, blank, reduction, zero_inf)
    want_loss, want_grad = torch_ctc(lp, tgt, il, tl, blank, reduction,
                                     zero_inf)

    import jax.numpy as jnp

    def f(x):
        out = ctc_loss(x, jnp.asarray(tgt), jnp.asarray(il), jnp.asarray(tl),
                       blank=blank, reduction=reduction,
                       zero_infinity=zero_inf)
        return out.sum() if reduction == "none" else out

    got_grad = np.asarray(jax.grad(f)(jnp.asarray(lp)))
    got_loss = np.asarray(ctc_loss(
        jnp.asarray(lp), jnp.asarray(tgt), jnp.asarray(il), jnp.asarray(tl),
        blank=blank, reduction=reduction, zero_infinity=zero_inf))
    np.testing.assert_allclose(got_loss, want_loss, rtol=2e-4, atol=2e-4,
                               err_msg=str(cfg))
    if not zero_inf:
        # Samples that are INFEASIBLE (torch loss = inf) have undefined
        # grads under zero_infinity=False — torch propagates NaN through
        # inf.backward(); this library's fused backward stays FINITE (the
        # exp(lp + alpha + beta - loss) form underflows against loss=inf).
        # Both are defensible; exclude those columns from the differential
        # (caught by seed 2026, round 3).
        per, _ = torch_ctc(lp, tgt, il, tl, blank, "none", False)
        bad = ~np.isfinite(per)
        if bad.any():
            got_grad = got_grad.copy()
            want_grad = want_grad.copy()
            got_grad[:, bad, :] = 0.0
            want_grad[:, bad, :] = 0.0
    np.testing.assert_allclose(got_grad, want_grad, rtol=2e-3, atol=5e-4,
                               err_msg=str(cfg))


def beam_round(rng, i):
    B = int(rng.integers(1, 4))
    T = int(rng.integers(3, 18))
    V = int(rng.integers(2, 9))
    W = int(rng.integers(2, 10))
    lp = lsm(rng.standard_normal((T, B, V)) *
             float(rng.uniform(0.4, 3.0))).astype(np.float32)
    il = rng.integers(1, T + 1, B).astype(np.int32)
    cfg = (i, B, T, V, W)
    outs = {}
    for impl in ("pallas", "xla"):
        tk, ln, sc = [np.asarray(a) for a in beam_search_decode(
            lp, il, beam_width=W, implementation=impl)]
        outs[impl] = [
            {tuple(tk[b, w, : ln[b, w]].tolist()): sc[b, w]
             for w in range(W) if np.isfinite(sc[b, w])}
            for b in range(B)
        ]
    ref = beam_search_decode_ref(np.asarray(lp, np.float64), il,
                                 beam_width=W)
    for b in range(B):
        want = {k: v for k, v in ref[b] if np.isfinite(v)}
        for impl in ("pallas", "xla"):
            got = outs[impl][b]
            assert set(got) == set(want), (cfg, impl, b,
                                           set(got) ^ set(want))
            for pref in want:
                np.testing.assert_allclose(got[pref], want[pref], atol=2e-3,
                                           rtol=2e-3, err_msg=str((cfg, b)))


def lm_round(rng, i):
    B = int(rng.integers(1, 3))
    T = int(rng.integers(3, 14))
    V = int(rng.integers(3, 8))
    W = int(rng.integers(2, 8))
    lm = NGramLM(
        lsm(rng.standard_normal((V, V)) * 2).astype(np.float32),
        start_logp=rng.standard_normal(V).astype(np.float32),
        eos_logp=rng.standard_normal(V).astype(np.float32),
    )
    alpha = float(rng.uniform(0.1, 2.0))
    beta = float(rng.uniform(-0.6, 0.8))
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(1, T + 1, B).astype(np.int32)
    cfg = (i, B, T, V, W, alpha, beta)
    res = {}
    for impl in ("pallas", "xla"):
        tk, ln, sc = [np.asarray(a) for a in beam_search_decode(
            lp, il, beam_width=W, lm=lm, lm_alpha=alpha, lm_beta=beta,
            implementation=impl)]
        res[impl] = [
            {tuple(tk[b, w, : ln[b, w]].tolist()): sc[b, w]
             for w in range(W) if np.isfinite(sc[b, w])}
            for b in range(B)
        ]
    for b in range(B):
        assert set(res["pallas"][b]) == set(res["xla"][b]), (cfg, b)
        for pref in res["pallas"][b]:
            np.testing.assert_allclose(res["pallas"][b][pref],
                                       res["xla"][b][pref], atol=2e-3,
                                       rtol=2e-3, err_msg=str((cfg, b)))


def _random_lm(rng, V):
    """A random LM of a random kind (token bigram / hashed token trigram /
    dense word bigram / BPE prefix-boundary word bigram / composite
    bigram+hotwords / GRU NeuralLM)."""
    kind = int(rng.integers(6))
    if kind == 5:  # neural GRU LM (round-3 feature, ops/neural_lm.py)
        from end2end_tpu import NeuralLM
        from end2end_tpu.ops.neural_lm import random_gru_params

        return NeuralLM.gru(
            random_gru_params(rng, V, emb_dim=int(rng.integers(3, 9)),
                              hidden_dim=int(rng.integers(4, 13))),
            eos_id=int(rng.integers(0, V)) if rng.integers(2) else None)
    if kind == 3:  # BPE prefix-boundary word LM (round-3 feature)
        from end2end_tpu.ops.lm import WordNGramLM as _W

        n_b = int(rng.integers(1, max(V // 2, 2)))
        bnd = sorted(rng.choice(np.arange(1, V), n_b, replace=False)
                     .tolist())
        words, seen = [], set()
        for _ in range(int(rng.integers(2, 7))):
            w = (int(rng.choice(bnd)),) + tuple(
                int(x) for x in rng.integers(1, V,
                                             int(rng.integers(0, 3))))
            if w not in seen:
                seen.add(w)
                words.append(w)
        wv = len(words)
        return _W(words,
                  np.log(np.maximum(rng.random((wv, wv)), 1e-3)).astype(
                      np.float32),
                  rng.standard_normal(wv).astype(np.float32), None,
                  unigram_logp=rng.standard_normal(wv).astype(np.float32),
                  unk_logp=float(rng.uniform(-9, -3)), boundary_ids=bnd)
    if kind == 4:  # composite: bigram + hotword booster (round-3 feature)
        from end2end_tpu.ops.lm import CompositeLM, HotwordBoostLM

        phrases, seen = [], set()
        for _ in range(int(rng.integers(1, 5))):
            p = tuple(int(x) for x in
                      rng.integers(0, V, int(rng.integers(1, 4))))
            if p not in seen:
                seen.add(p)
                phrases.append(p)
        return CompositeLM(
            [NGramLM(bigram_from_counts(rng.integers(0, 20, (V, V)))),
             HotwordBoostLM(phrases, weight=float(rng.uniform(0.2, 1.5)),
                            complete_bonus=float(rng.uniform(0, 1)))],
            weights=[1.0, float(rng.uniform(0.3, 1.5))])
    if kind == 0:
        return NGramLM(bigram_from_counts(rng.integers(0, 20, (V, V))),
                       start_logp=rng.standard_normal(V).astype(np.float32),
                       eos_logp=rng.standard_normal(V).astype(np.float32))
    if kind == 1:
        ngrams = {1: [], 2: [], 3: [], "unk": float(rng.uniform(-9, -4))}
        for a in range(V):
            ngrams[1].append(((a,), float(rng.uniform(-4, -1)),
                              float(rng.uniform(-1, 0))))
        seen = set()
        for _ in range(3 * V * V):
            o = int(rng.integers(2, 4))
            g = tuple(int(x) for x in rng.integers(0, V + 2, o))
            if g not in seen:
                seen.add(g)
                ngrams[o].append((g, float(rng.uniform(-3, -0.3)),
                                  float(rng.uniform(-1, 0))))
        # half the rounds pin the hashed backoff chain (dense_full=False),
        # half take the auto dense full-score table — both query paths
        # stay under the sweep's differential oracles
        return HashedNGramLM(3, ngrams, V,
                             dense_full=False if rng.integers(2) else None)
    words, space = [], V - 1
    seen = set()
    for _ in range(int(rng.integers(2, 7))):
        w = tuple(int(x) for x in
                  rng.integers(1, max(space, 2), int(rng.integers(1, 4))))
        if w not in seen:
            seen.add(w)
            words.append(w)
    wv = len(words)
    return WordNGramLM(
        words, np.log(np.maximum(rng.random((wv, wv)), 1e-3)).astype(
            np.float32),
        rng.standard_normal(wv).astype(np.float32), space,
        unk_logp=float(rng.uniform(-9, -3)))


def chunked_round(rng, i):
    """Single-chunk chunked-LM decode == no-LM kernel decode + exact
    rescoring (the chunked path's exact limit, ops/beam_chunked.py), for a
    random LM kind, random shapes, random alpha/beta."""
    B = int(rng.integers(1, 4))
    T = int(rng.integers(4, 16))
    V = int(rng.integers(4, 9))
    W = int(rng.integers(2, 9))
    lm = _random_lm(rng, V)
    alpha = float(rng.uniform(0.1, 1.6))
    beta = float(rng.uniform(-0.5, 0.7))
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(1, T + 1, B).astype(np.int32)
    cfg = (i, B, T, V, W, type(lm).__name__)
    ct, cl, cs = [np.asarray(a) for a in beam_search_chunked_lm(
        lp, il, beam_width=W, lm=lm, lm_alpha=alpha, lm_beta=beta,
        chunk_t=T + 8)]
    nt, nl, ns = beam_search_pallas(lp, il, beam_width=W)
    rt, rl, rs = [np.asarray(a) for a in rescore_nbest(
        nt, nl, ns, lm, lm_alpha=alpha, lm_beta=beta)]
    for b in range(B):
        got = {tuple(ct[b, w, : cl[b, w]].tolist()): cs[b, w]
               for w in range(W) if np.isfinite(cs[b, w])}
        want = {tuple(rt[b, w, : rl[b, w]].tolist()): rs[b, w]
                for w in range(W) if np.isfinite(rs[b, w])}
        assert set(got) == set(want), (cfg, b, set(got) ^ set(want))
        for pref in want:
            np.testing.assert_allclose(got[pref], want[pref], atol=2e-3,
                                       rtol=2e-3, err_msg=str((cfg, b)))


def prune_round(rng, i):
    """Kernel-pruned decode == the XLA scan's candidate-only mode at the
    same prune_k (identical documented semantics incl. the stay-term
    prune) — the differential form of the repeat-prune contract."""
    import jax.numpy as jnp

    from end2end_tpu.ops.beam_search import beam_search_from_topk

    B = int(rng.integers(1, 4))
    T = int(rng.integers(4, 18))
    V = int(rng.integers(6, 14))
    W = int(rng.integers(2, 8))
    K = int(rng.integers(2, V))
    blank = 0
    lp = lsm(rng.standard_normal((T, B, V)) *
             float(rng.uniform(0.5, 2.5))).astype(np.float32)
    il = rng.integers(1, T + 1, B).astype(np.int32)
    cfg = (i, B, T, V, W, K)
    pt, pl_, ps = [np.asarray(a) for a in beam_search_pallas(
        lp, il, beam_width=W, prune_k=K)]
    lpk, ck = jax.lax.top_k(jnp.asarray(lp), K)
    xt, xl, xs = [np.asarray(a) for a in beam_search_from_topk(
        lpk, ck, jnp.asarray(lp)[:, :, blank], il, beam_width=W,
        blank=blank, max_symbols=min(T, 512))]
    for b in range(B):
        got = {tuple(pt[b, w, : pl_[b, w]].tolist()): ps[b, w]
               for w in range(W) if np.isfinite(ps[b, w])}
        want = {tuple(xt[b, w, : xl[b, w]].tolist()): xs[b, w]
                for w in range(W) if np.isfinite(xs[b, w])}
        assert set(got) == set(want), (cfg, b, set(got) ^ set(want))
        for pref in want:
            np.testing.assert_allclose(got[pref], want[pref], atol=2e-3,
                                       rtol=2e-3, err_msg=str((cfg, b)))


def token_min_round(rng, i):
    """token_min_logp: kernel == scan with the same absolute candidate
    threshold (both read the identically-masked candidate set, including
    the repeat/stay term)."""
    B = int(rng.integers(1, 4))
    T = int(rng.integers(4, 16))
    V = int(rng.integers(4, 10))
    W = int(rng.integers(2, 7))
    thr = float(rng.uniform(-3.5, -0.3))
    lp = lsm(rng.standard_normal((T, B, V)) *
             float(rng.uniform(0.5, 2.5))).astype(np.float32)
    il = rng.integers(1, T + 1, B).astype(np.int32)
    cfg = (i, B, T, V, W, round(thr, 3))
    pt, pl_, ps = [np.asarray(a) for a in beam_search_pallas(
        lp, il, beam_width=W, token_min_logp=thr)]
    xt, xl, xs = [np.asarray(a) for a in beam_search_decode(
        lp, il, beam_width=W, implementation="xla", token_min_logp=thr)]
    for b in range(B):
        got = {tuple(pt[b, w, : pl_[b, w]].tolist()): ps[b, w]
               for w in range(W) if np.isfinite(ps[b, w])}
        want = {tuple(xt[b, w, : xl[b, w]].tolist()): xs[b, w]
                for w in range(W) if np.isfinite(xs[b, w])}
        assert set(got) == set(want), (cfg, b, set(got) ^ set(want))
        for pref in want:
            np.testing.assert_allclose(got[pref], want[pref], atol=2e-3,
                                       rtol=2e-3, err_msg=str((cfg, b)))


def guide_round(rng, i):
    """guide_lm == lm (dense bigram): guided chunked decode == the fused
    pallas decode exactly (identical per-frame steering, exact replay)."""
    from end2end_tpu.ops.lm import NGramLM as _N

    B = int(rng.integers(1, 4))
    T = int(rng.integers(6, 20))
    V = int(rng.integers(4, 9))
    W = int(rng.integers(2, 7))
    chunk = int(rng.integers(3, T + 2))
    lm = _N(bigram_from_counts(rng.integers(0, 20, (V, V))),
            start_logp=rng.standard_normal(V).astype(np.float32),
            eos_logp=rng.standard_normal(V).astype(np.float32))
    alpha = float(rng.uniform(0.1, 1.5))
    beta = float(rng.uniform(-0.4, 0.6))
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(1, T + 1, B).astype(np.int32)
    cfg = (i, B, T, V, W, chunk)
    gt, gl, gs = [np.asarray(a) for a in beam_search_chunked_lm(
        lp, il, beam_width=W, lm=lm, lm_alpha=alpha, lm_beta=beta,
        chunk_t=chunk, guide_lm=lm)]
    ft, fl, fs = [np.asarray(a) for a in beam_search_pallas(
        lp, il, beam_width=W, lm=lm, lm_alpha=alpha, lm_beta=beta)]
    for b in range(B):
        got = {tuple(gt[b, w, : gl[b, w]].tolist()): gs[b, w]
               for w in range(W) if np.isfinite(gs[b, w])}
        want = {tuple(ft[b, w, : fl[b, w]].tolist()): fs[b, w]
                for w in range(W) if np.isfinite(fs[b, w])}
        assert set(got) == set(want), (cfg, b, set(got) ^ set(want))
        for pref in want:
            np.testing.assert_allclose(got[pref], want[pref], atol=2e-3,
                                       rtol=2e-3, err_msg=str((cfg, b)))


def time_parallel_round(rng, i):
    """Time-sharded (SP) fused gradient == sequential custom-VJP gradient
    on the virtual 8-device mesh, random shapes/lengths."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla
    from end2end_tpu.parallel.time_parallel import ctc_nll_time_parallel

    B = int(rng.integers(1, 4))
    T = int(rng.integers(3, 13)) * 8  # multiple of the mesh size
    S = int(rng.integers(1, 7))
    V = int(rng.integers(4, 16))
    lp = lsm(rng.standard_normal((T, B, V)) * 2).astype(np.float32)
    tgt = rng.integers(1, V, (B, S)).astype(np.int32)
    il = rng.integers(max(T // 2, 1), T + 1, B).astype(np.int32)
    tl = np.minimum(rng.integers(1, S + 1, B),
                    np.maximum(il // 3, 1)).astype(np.int32)
    cfg = (i, B, T, S, V)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("time",))
    w = rng.standard_normal(B).astype(np.float32)

    def tp_loss(x):
        return jnp.sum(
            ctc_nll_time_parallel(x, tgt, il, tl, mesh=mesh) * w)

    def seq_loss(x):
        return jnp.sum(ctc_nll_xla(x, tgt, il, tl, 0) * w)

    g_tp = np.asarray(jax.jit(jax.grad(tp_loss))(jnp.asarray(lp)))
    g_seq = np.asarray(jax.jit(jax.grad(seq_loss))(jnp.asarray(lp)))
    np.testing.assert_allclose(g_tp, g_seq, rtol=2e-3, atol=5e-4,
                               err_msg=str(cfg))


def rnnt_round(rng, i):
    """Transducer loss+grad vs the float64 loop oracle on random shapes,
    blanks and lengths (incl. U > T, valid for transducers); every 3rd
    round also checks ALSD beam exactness at full state coverage (beam
    score == total alignment log-prob by exhaustive path enumeration)."""
    import jax.numpy as jnp

    from end2end_tpu.ops.rnnt_loss import rnnt_nll
    from end2end_tpu.utils.rnnt_reference import rnnt_loss_ref

    B = int(rng.integers(1, 5))
    T = int(rng.integers(2, 18))
    U = int(rng.integers(1, 8))
    V = int(rng.integers(3, 14))
    blank = int(rng.integers(0, V))
    lp = lsm(rng.standard_normal((B, T, U + 1, V)) * 2).astype(np.float32)
    others = [c for c in range(V) if c != blank]
    tgt = rng.choice(others, (B, U)).astype(np.int32)
    il = rng.integers(1, T + 1, B).astype(np.int32)
    ul = rng.integers(1, U + 1, B).astype(np.int32)
    cfg = (i, B, T, U, V, blank)

    def f(x):
        return jnp.sum(rnnt_nll(x, tgt, il, ul, blank=blank,
                                from_logits=False))

    got, g = jax.jit(jax.value_and_grad(f))(jnp.asarray(lp))
    want, gref = rnnt_loss_ref(lp, tgt, il, ul, blank=blank)
    np.testing.assert_allclose(float(got), want.sum(), rtol=2e-4,
                               atol=2e-3, err_msg=str(cfg))
    np.testing.assert_allclose(np.asarray(g), gref, atol=3e-4,
                               err_msg=str(cfg))

    if i % 3 == 0:
        from functools import partial

        from end2end_tpu.ops.neural_lm import gru_step, random_gru_params
        from end2end_tpu.ops.rnnt_decode import (additive_joint,
                                                 rnnt_beam_decode)
        from end2end_tpu.utils.rnnt_reference import rnnt_loss_paths

        v, t_max, s_cap = 3, int(rng.integers(2, 5)), 3
        enc = rng.standard_normal((1, t_max, 6)).astype(np.float32)
        params = jax.tree.map(jnp.asarray, random_gru_params(
            rng, v, emb_dim=3, hidden_dim=4))
        mats = [rng.standard_normal(s).astype(np.float32) * c for s, c in
                [((6, 5), .5), ((4, 5), .5), ((5,), .1), ((5, v), 1.),
                 ((v,), .1)]]
        pred = partial(gru_step, params)
        joint = additive_joint(*[jnp.asarray(m) for m in mats])
        toks, lens, scores = rnnt_beam_decode(
            enc, np.array([t_max], np.int32), pred,
            jnp.zeros((4,), jnp.float32), joint, beam_width=16,
            prune_k=v - 1, max_symbols=s_cap)
        toks, lens, scores = map(np.asarray, (toks, lens, scores))
        # rebuild each decoded sequence's exact log-prob via the pred/joint
        for w in range(16):
            if scores[0, w] <= -1e9:
                continue
            y = toks[0, w, :lens[0, w]].tolist()
            hs = [np.zeros((4,), np.float32)]
            for tok in y:
                hs.append(np.asarray(pred(jnp.asarray(hs[-1]),
                                          jnp.int32(tok))))
            lat = []
            for t in range(t_max):
                row = []
                for h in hs:
                    z = np.asarray(joint(jnp.asarray(enc[0, t]),
                                         jnp.asarray(h)), np.float64)
                    row.append(z - (z.max()
                                    + np.log(np.exp(z - z.max()).sum())))
                lat.append(np.stack(row))
            ref = -rnnt_loss_paths(np.stack(lat), np.array(y, np.int64))
            np.testing.assert_allclose(scores[0, w], ref, atol=2e-3,
                                       err_msg=f"beam {cfg} y={y}")


def lm_train_round(rng, i):
    """Kneser-Ney estimation: every conditional distribution the emitted
    backoff model defines sums to exactly 1 through the float64 ArpaScorer
    (probs + backoffs + unk chain jointly), random corpora / orders /
    discount regimes / unk handling."""
    import math

    from end2end_tpu.utils.arpa import ArpaScorer
    from end2end_tpu.utils.lm_train import train_ngram_lm

    v = int(rng.integers(2, 9))
    order = int(rng.integers(1, 5))
    skew = float(rng.uniform(0.0, 2.5))
    w = (np.arange(v) + 1.0) ** skew
    w /= w.sum()
    sents = [
        [str(t) for t in rng.choice(v, size=int(rng.integers(1, 10)), p=w)]
        for _ in range(int(rng.integers(1, 25)))
    ]
    kw = {}
    if rng.integers(2):
        kw["include_unk"] = False
    if rng.integers(2):
        kw["discount"] = float(rng.uniform(0.1, 0.95))
    order, ngrams, vocab = train_ngram_lm(sents, order=order, **kw)
    sc = ArpaScorer(order, ngrams, len(vocab))
    vv = len(vocab)
    cfg = (i, vv, order, len(sents), kw)
    for _ in range(6):
        ctx = [int(rng.integers(0, vv + 6))
               for _ in range(int(rng.integers(0, 4)))]
        total = sum(math.exp(sc.score(ctx, t)) for t in range(vv))
        total += math.exp(sc.score(ctx, sc.eos))
        if kw.get("include_unk", True):
            total += math.exp(sc.score(ctx, vv + 9))  # the <unk> chain
        assert abs(total - 1.0) < 1e-9, (cfg, ctx, total)


def mwer_round(rng, i):
    """mwer_loss_from_nbest == float64 NumPy composition (ctc_loss_ref
    hypothesis scores + softmax posterior + error regret), random shapes,
    token- and word-level errors."""
    import jax.numpy as jnp

    from end2end_tpu.ops.mwer import mwer_loss_from_nbest
    from end2end_tpu.utils.metrics import edit_distance
    from end2end_tpu.utils.reference_impl import ctc_loss_ref

    b = int(rng.integers(1, 4))
    t = int(rng.integers(8, 30))
    s = int(rng.integers(2, 7))
    v = int(rng.integers(4, 9))
    w_beam = int(rng.integers(2, 5))
    err = "word" if rng.integers(2) else "token"
    space = 2 if err == "word" else None
    scale = float(rng.uniform(0.3, 2.0))
    lp = lsm(rng.standard_normal((t, b, v)) * 2).astype(np.float32)
    tgt = rng.integers(1, v, (b, s)).astype(np.int32)
    il = rng.integers(t // 2, t + 1, b).astype(np.int32)
    tl = rng.integers(1, s + 1, b).astype(np.int32)
    cfg = (i, b, t, s, v, w_beam, err, scale)
    hyp, hyp_len, hscores = beam_search_decode(
        jnp.asarray(lp), jnp.asarray(il), beam_width=w_beam,
        max_symbols=s + 2, implementation="xla")
    loss = np.asarray(mwer_loss_from_nbest(
        jnp.asarray(lp), jnp.asarray(il), hyp, hyp_len,
        jnp.asarray(tgt), jnp.asarray(tl),
        hyp_valid=jnp.isfinite(hscores), err=err, space_id=space,
        scale=scale, reduction="none"))
    hyp, hyp_len = np.asarray(hyp), np.asarray(hyp_len)

    def words(ids):
        out, cur = [], []
        for tok in ids:
            if tok == space:
                if cur:
                    out.append(tuple(cur))
                cur = []
            else:
                cur.append(int(tok))
        if cur:
            out.append(tuple(cur))
        return out

    for bi in range(b):
        scores, errs, valid = [], [], []
        for j in range(w_beam):
            hl = int(hyp_len[bi, j])
            seq = hyp[bi, j, :hl]
            nll, _ = ctc_loss_ref(
                np.asarray(lp[:, bi: bi + 1], np.float64),
                np.asarray(seq, np.int64)[None],
                np.asarray([il[bi]]), np.asarray([hl]))
            sc = -float(nll[0])
            scores.append(sc)
            valid.append(np.isfinite(sc) and np.isfinite(
                float(np.asarray(hscores)[bi, j])))
            r = tgt[bi, : tl[bi]]
            errs.append(edit_distance(words(seq), words(r)) if err == "word"
                        else edit_distance(list(seq), list(r)))
        scores, errs = np.array(scores), np.array(errs, np.float64)
        valid = np.array(valid)
        if not valid.any():
            assert abs(loss[bi]) < 1e-6, cfg
            continue
        z = np.where(valid, scale * scores, -np.inf)
        z = z - z.max()
        p = np.exp(z) / np.exp(z).sum()
        mean_err = errs[valid].mean()
        want = float((p * np.where(valid, errs - mean_err, 0.0)).sum())
        np.testing.assert_allclose(loss[bi], want, atol=2e-3, rtol=2e-3,
                                   err_msg=str((cfg, bi)))


def confidence_round(rng, i):
    """frame/token/aggregate confidence == float64 NumPy recomputation,
    random method / alpha / blank handling / timestamp shapes."""
    from end2end_tpu.ops.confidence import (
        aggregate_confidence, frame_confidence, token_confidence)

    t = int(rng.integers(3, 20))
    b = int(rng.integers(1, 4))
    v = int(rng.integers(3, 30))
    method = ["max_prob", "shannon", "tsallis", "renyi"][int(rng.integers(4))]
    alpha = float(rng.uniform(0.1, 0.9))
    excl = bool(rng.integers(2))
    lp32 = lsm(rng.standard_normal((t, b, v)) * 3).astype(np.float32)
    cfg = (i, t, b, v, method, alpha, excl)
    got = np.asarray(frame_confidence(lp32, method=method, alpha=alpha,
                                      exclude_blank=excl))
    p = np.exp(np.asarray(lp32, np.float64))
    if excl:
        p[..., 0] = 0.0
        p = p / p.sum(-1, keepdims=True)
        veff = v - 1
    else:
        veff = v
    if method == "max_prob":
        want = p.max(-1)
    elif method == "shannon":
        h = -(np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0)), 0.0)
              ).sum(-1)
        want = np.clip(1.0 - h / np.log(veff), 0.0, 1.0)
    elif method == "tsallis":
        sa = (p ** alpha).sum(-1)
        smax = (veff ** (1 - alpha) - 1) / (1 - alpha)
        want = np.clip(1.0 - ((sa - 1) / (1 - alpha)) / smax, 0.0, 1.0)
    else:
        want = np.clip(
            1.0 - (np.log((p ** alpha).sum(-1)) / (1 - alpha))
            / np.log(veff), 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4,
                               err_msg=str(cfg))
    # token gather + aggregation vs loops
    s = int(rng.integers(1, 7))
    times = rng.integers(0, t, (b, s)).astype(np.int32)
    lens = rng.integers(0, s + 1, b).astype(np.int32)
    tc = np.asarray(token_confidence(got.astype(np.float32), times, lens))
    for bi in range(b):
        for j in range(s):
            want_tc = got[times[bi, j], bi] if j < lens[bi] else 0.0
            np.testing.assert_allclose(tc[bi, j], want_tc, atol=2e-6,
                                       err_msg=str((cfg, bi, j)))
    how = ["mean", "min", "prod"][int(rng.integers(3))]
    agg = np.asarray(aggregate_confidence(tc, lens, how))
    for bi in range(b):
        row = tc[bi, : lens[bi]]
        if lens[bi] == 0:
            want_a = 1.0
        elif how == "mean":
            want_a = row.mean()
        elif how == "min":
            want_a = row.min()
        else:
            want_a = row.prod()
        np.testing.assert_allclose(agg[bi], want_a, atol=2e-6,
                                   err_msg=str((cfg, bi, how)))


def run_batch(n_rounds, seed):
    """One batch of rounds in THIS process (fresh LLVM JIT state)."""
    rng = np.random.default_rng(seed)
    for i in range(n_rounds):
        loss_round(rng, i)
        beam_round(rng, i)
        lm_round(rng, i)
        chunked_round(rng, i)
        prune_round(rng, i)
        token_min_round(rng, i)
        guide_round(rng, i)
        lm_train_round(rng, i)
        rnnt_round(rng, i)
        mwer_round(rng, i)
        confidence_round(rng, i)
        if i % 5 == 0:  # costlier (mesh compiles); every 5th round
            time_parallel_round(rng, i)


def main():
    if BATCH_MODE:  # child: ROUNDS rounds seeded SEED, then exit
        run_batch(ROUNDS, SEED)
        return
    done = 0
    batch = 0
    while done < ROUNDS:
        n = min(BATCH_ROUNDS, ROUNDS - done)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--batch",
             str(n), str(SEED + batch)],
            env=os.environ, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        if r.returncode != 0:
            print(f"FAIL: batch {batch} (seed {SEED + batch}) rc="
                  f"{r.returncode}; reproduce with --batch {n} "
                  f"{SEED + batch}", flush=True)
            sys.exit(1)
        done += n
        batch += 1
        print(f"{done}/{ROUNDS} rounds clean", flush=True)
    print(f"PASS: {ROUNDS} rounds x (loss-vs-torch + 3-way beam + LM "
          "pallas==xla + chunked==rescore (6 LM kinds incl. BPE-boundary, "
          "composite+hotwords, and GRU NeuralLM) + prune-parity + "
          "token_min_logp parity + guided-chunked==fused + KN-estimation "
          "sum-to-one + MWER f64-oracle + confidence f64-recompute + "
          "time-parallel grad) all clean", flush=True)


if __name__ == "__main__":
    main()
