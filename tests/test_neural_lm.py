"""Neural-LM shallow fusion (ops/neural_lm.py).

Validation strategy:
  * EXACT decoder-integration check: a NeuralLM whose step/logp functions
    reproduce a dense bigram table (one-hot context hidden @ table, HIGHEST
    precision) must make `beam_search_decode` IDENTICAL to the same decode
    with `NGramLM` — every protocol method exercised through the real scan,
    compared bitwise.
  * `score_chunk` == folding `score()`/`select()` token by token (the
    replay contract the chunked kernel path and `rescore_nbest` rely on),
    including -1 end padding and the post-chunk state.
  * with a real GRU LM: single-chunk chunked decode == no-LM kernel decode
    + exact `rescore_nbest` (the exact limit); small-chunk chunked decode
    matches the fused scan on peaked lattices; streaming beam == one-shot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_tpu import (
    NGramLM,
    NeuralLM,
    StreamingBeamDecoder,
    beam_search_decode,
    rescore_nbest,
)
from end2end_tpu.ops.beam_chunked import beam_search_chunked_lm
from end2end_tpu.ops.beam_search_pallas import beam_search_pallas
from end2end_tpu.ops.neural_lm import random_gru_params


def lsm(x):
    return x - np.log(np.sum(np.exp(x), -1, keepdims=True))


def _beam_sets(tokens, lens, scores, W):
    out = []
    for b in range(tokens.shape[0]):
        out.append({
            tuple(np.asarray(tokens)[b, w, : int(lens[b, w])].tolist()):
                float(np.asarray(scores)[b, w])
            for w in range(W)
            if np.isfinite(np.asarray(scores)[b, w])
        })
    return out


def _peaked_lattice(rng, B, T, V, peak=0.9995, blank_frac=0.5):
    lp = np.full((T, B, V), np.log((1 - peak) / (V - 1)), np.float32)
    ids = np.where(rng.random((T, B)) < blank_frac, 0,
                   rng.integers(1, V, (T, B)))
    for t in range(T):
        lp[t, np.arange(B), ids[t]] = np.log(peak)
    return lsm(lp.astype(np.float64)).astype(np.float32)


def _bigram_pair(rng, V):
    """(NGramLM, NeuralLM) computing the SAME bigram scores: the neural
    hidden is the one-hot context row (V = start), logp = hidden @ table
    at HIGHEST precision (one nonzero product -> exact f32)."""
    table = np.log(np.maximum(rng.random((V, V)), 0.05)).astype(np.float32)
    start = rng.standard_normal(V).astype(np.float32)
    ngram = NGramLM(table, start_logp=start)
    full = jnp.asarray(np.concatenate([table, start[None]], axis=0))

    def step(h, tok):
        return jax.nn.one_hot(tok, V + 1, dtype=jnp.float32)

    def logp(h):
        return jnp.dot(h, full, precision=jax.lax.Precision.HIGHEST)

    neural = NeuralLM(step, logp,
                      jax.nn.one_hot(V, V + 1, dtype=jnp.float32),
                      V, normalize=False)
    return ngram, neural


def test_neural_reproduces_ngram_decode_bitwise(rng):
    T, B, V, W = 17, 4, 6, 8
    ngram, neural = _bigram_pair(rng, V)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    kw = dict(beam_width=W, max_symbols=16, lm_alpha=0.7, lm_beta=0.25,
              implementation="xla", return_timestamps=True)
    nt, nl, ns, ntm = beam_search_decode(lp, il, lm=ngram, **kw)
    mt, ml, ms, mtm = beam_search_decode(lp, il, lm=neural, **kw)
    np.testing.assert_array_equal(np.asarray(nt), np.asarray(mt))
    np.testing.assert_array_equal(np.asarray(nl), np.asarray(ml))
    np.testing.assert_array_equal(np.asarray(ntm), np.asarray(mtm))
    np.testing.assert_array_equal(np.asarray(ns), np.asarray(ms))


def test_neural_reproduces_ngram_with_pruning(rng):
    T, B, V, W = 14, 3, 9, 4
    ngram, neural = _bigram_pair(rng, V)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.full(B, T, np.int32)
    kw = dict(beam_width=W, prune_k=5, max_symbols=12, lm_alpha=1.1,
              implementation="xla")
    want = beam_search_decode(lp, il, lm=ngram, **kw)
    got = beam_search_decode(lp, il, lm=neural, **kw)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_score_chunk_equals_fold(rng):
    V, M, C = 7, 5, 9
    lm = NeuralLM.gru(random_gru_params(rng, V, emb_dim=6, hidden_dim=10),
                      eos_id=2)
    toks = rng.integers(0, V, (M, C)).astype(np.int32)
    nv = rng.integers(0, C + 1, M)
    for i in range(M):
        toks[i, nv[i]:] = -1

    lp_chunk, st_chunk = lm.score_chunk(lm.init_state(M), jnp.asarray(toks))

    st = lm.init_state(M)
    rows = jnp.arange(M, dtype=jnp.int32)
    acc = np.zeros(M, np.float64)
    for c in range(C):
        col = jnp.asarray(toks[:, c])
        lm_lp, ext = lm.score(st, col)          # ck = this column (K = M)
        is_stay = col < 0
        st = lm.select(st, ext, rows, rows, is_stay)
        acc += np.where(np.asarray(is_stay), 0.0,
                        np.asarray(lm_lp)[np.arange(M), np.arange(M)])
    np.testing.assert_allclose(np.asarray(lp_chunk), acc, atol=1e-5,
                               rtol=1e-6)

    # the two final states represent the same prefixes: identical scores
    # for any next candidate set, and identical EOS bonuses
    ck = jnp.arange(V, dtype=jnp.int32)
    lp_a, _ = lm.score(st_chunk, ck)
    lp_b, _ = lm.score(st, ck)
    np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_b),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lm.final(st_chunk)),
                               np.asarray(lm.final(st)), atol=1e-6)


def test_gru_single_chunk_equals_rescored_nolm_decode(rng):
    B, T, V, W = 3, 18, 5, 8
    lm = NeuralLM.gru(random_gru_params(rng, V, emb_dim=8, hidden_dim=12),
                      eos_id=1)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    a, b_ = 0.8, 0.3
    ct, cl, cs = beam_search_chunked_lm(lp, il, beam_width=W, lm=lm,
                                        lm_alpha=a, lm_beta=b_, chunk_t=64)
    nt, nl, ns = beam_search_pallas(lp, il, beam_width=W)
    rt, rl, rs = rescore_nbest(nt, nl, ns, lm, lm_alpha=a, lm_beta=b_)
    c_sets = _beam_sets(ct, cl, cs, W)
    r_sets = _beam_sets(rt, rl, rs, W)
    for i in range(B):
        assert set(c_sets[i]) == set(r_sets[i]), i
        for pref in c_sets[i]:
            np.testing.assert_allclose(c_sets[i][pref], r_sets[i][pref],
                                       atol=5e-4, rtol=2e-4)


def test_gru_chunked_matches_fused_scan_on_peaked(rng):
    B, T, V, W = 3, 24, 5, 8
    lm = NeuralLM.gru(random_gru_params(rng, V, emb_dim=8, hidden_dim=12))
    lp = _peaked_lattice(rng, B, T, V)
    il = np.full(B, T, np.int32)
    a, b_ = 0.6, 0.2
    xt, xl, xs = beam_search_decode(lp, il, beam_width=W, lm=lm, lm_alpha=a,
                                    lm_beta=b_, implementation="xla")
    ct, cl, cs = beam_search_chunked_lm(lp, il, beam_width=W, lm=lm,
                                        lm_alpha=a, lm_beta=b_, chunk_t=6)
    x_sets, c_sets = _beam_sets(xt, xl, xs, W), _beam_sets(ct, cl, cs, W)
    for i in range(B):
        # repo convention for approximate beam paths on peaked lattices:
        # top-1 must agree (chunk steering may reorder the tail)
        x_top = max(x_sets[i], key=x_sets[i].get)
        c_top = max(c_sets[i], key=c_sets[i].get)
        assert x_top == c_top, i
        np.testing.assert_allclose(x_sets[i][x_top], c_sets[i][c_top],
                                   atol=5e-4, rtol=2e-4)


def test_streaming_beam_with_gru_equals_oneshot(rng):
    T, B, V, W = 15, 3, 6, 4
    lm = NeuralLM.gru(random_gru_params(rng, V, emb_dim=6, hidden_dim=8),
                      eos_id=3)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.full(B, T, np.int32)
    want = beam_search_decode(lp, il, beam_width=W, max_symbols=16, lm=lm,
                              lm_alpha=0.9, lm_beta=0.1,
                              implementation="xla")
    dec = StreamingBeamDecoder(beam_width=W, max_symbols=16, lm=lm,
                               lm_alpha=0.9, lm_beta=0.1)
    state = dec.init(B)
    for lo, hi in ((0, 4), (4, 9), (9, 15)):
        state = dec.step(state, lp[lo:hi],
                         np.clip(il - lo, 0, hi - lo).astype(np.int32))
    got = dec.finish(state)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_rescore_nbest_with_gru_matches_manual(rng):
    B, T, V, W = 2, 12, 5, 4
    lm = NeuralLM.gru(random_gru_params(rng, V, emb_dim=6, hidden_dim=8),
                      eos_id=2)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.full(B, T, np.int32)
    nt, nl, ns = beam_search_decode(lp, il, beam_width=W,
                                    implementation="xla")
    a, b_ = 0.7, 0.4
    rt, rl, rs = rescore_nbest(nt, nl, ns, lm, lm_alpha=a, lm_beta=b_,
                               resort=False)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(nt))
    toks = np.asarray(nt).reshape(B * W, -1).astype(np.int32)
    lens = np.asarray(nl).reshape(B * W)
    mask = np.arange(toks.shape[1])[None, :] < lens[:, None]
    toks = np.where(mask, toks, -1)
    lm_sum, st = lm.score_chunk(lm.init_state(B * W), jnp.asarray(toks))
    want = (np.asarray(ns).reshape(-1)
            + a * (np.asarray(lm_sum) + np.asarray(lm.final(st)))
            + b_ * lens)
    got = np.asarray(rs).reshape(-1)
    fin = np.isfinite(got)
    np.testing.assert_allclose(got[fin], want[fin], atol=1e-4)


def _tiny_transformer_lm(rng, V, d=8, l_max=32):
    """1-layer causal-attention decoder LM with a KV-CACHE pytree state —
    exercises NeuralLM with a structured (multi-leaf, mixed-dtype) hidden:
    state = (K cache (L, d), V cache (L, d), last-token embedding (d,),
    position scalar).  BOS is baked into init_hidden via one step."""
    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           / np.sqrt(shape[0]))

    emb, wq, wk, wv, wo = w(V + 1, d), w(d, d), w(d, d), w(d, d), w(d, V)

    def step(h, tok):
        ck, cv, _, pos = h
        x = emb[tok]
        p = jnp.minimum(pos, l_max - 1)
        ck = jax.lax.dynamic_update_index_in_dim(ck, x @ wk, p, 0)
        cv = jax.lax.dynamic_update_index_in_dim(cv, x @ wv, p, 0)
        return ck, cv, x, pos + 1

    def logp(h):
        ck, cv, x, pos = h
        q = x @ wq
        att = ck @ q / np.sqrt(d)
        att = jnp.where(jnp.arange(l_max) < pos, att, -1e30)
        ctx = jax.nn.softmax(att) @ cv
        return ctx @ wo

    empty = (jnp.zeros((l_max, d), jnp.float32),
             jnp.zeros((l_max, d), jnp.float32),
             jnp.zeros((d,), jnp.float32), jnp.int32(0))
    return NeuralLM(step, logp, step(empty, jnp.int32(V)), V)


def test_transformer_kv_cache_lm_score_chunk_equals_fold(rng):
    V, M, C = 6, 4, 7
    lm = _tiny_transformer_lm(rng, V)
    toks = rng.integers(0, V, (M, C)).astype(np.int32)
    nv = rng.integers(0, C + 1, M)
    for i in range(M):
        toks[i, nv[i]:] = -1
    lp_chunk, st_chunk = lm.score_chunk(lm.init_state(M), jnp.asarray(toks))
    st = lm.init_state(M)
    rows = jnp.arange(M, dtype=jnp.int32)
    acc = np.zeros(M, np.float64)
    for c in range(C):
        col = jnp.asarray(toks[:, c])
        lm_lp, ext = lm.score(st, col)
        st = lm.select(st, ext, rows, rows, col < 0)
        acc += np.where(np.asarray(col) < 0, 0.0,
                        np.asarray(lm_lp)[np.arange(M), np.arange(M)])
    np.testing.assert_allclose(np.asarray(lp_chunk), acc, atol=1e-5)
    ck = jnp.arange(V, dtype=jnp.int32)
    np.testing.assert_allclose(np.asarray(lm.score(st_chunk, ck)[0]),
                               np.asarray(lm.score(st, ck)[0]), atol=1e-6)


def test_transformer_kv_cache_lm_decodes_on_every_path(rng):
    B, T, V, W = 2, 14, 6, 4
    lm = _tiny_transformer_lm(rng, V)
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.full(B, T, np.int32)
    a, b_ = 0.7, 0.2
    xt, xl, xs = beam_search_decode(lp, il, beam_width=W, lm=lm, lm_alpha=a,
                                    lm_beta=b_, implementation="xla")
    assert np.isfinite(np.asarray(xs)[:, 0]).all()
    # single-chunk chunked == no-LM decode + exact rescoring
    ct, cl, cs = beam_search_chunked_lm(lp, il, beam_width=W, lm=lm,
                                        lm_alpha=a, lm_beta=b_, chunk_t=64)
    nt, nl, ns = beam_search_pallas(lp, il, beam_width=W)
    rt, rl, rs = rescore_nbest(nt, nl, ns, lm, lm_alpha=a, lm_beta=b_)
    c_sets, r_sets = _beam_sets(ct, cl, cs, W), _beam_sets(rt, rl, rs, W)
    for i in range(B):
        assert set(c_sets[i]) == set(r_sets[i]), i
        for pref in c_sets[i]:
            np.testing.assert_allclose(c_sets[i][pref], r_sets[i][pref],
                                       atol=5e-4, rtol=2e-4)


def test_guided_chunked_gru_peaked_matches_scan(rng):
    """guide_lm (dense char bigram, in-kernel) steering a chunked GRU
    NeuralLM decode: on peaked lattices the guided chunked decode matches
    the fused scan top-1 exactly (scores included)."""
    from end2end_tpu.ops.lm import NGramLM, bigram_from_counts

    B, T, V, W = 3, 30, 5, 8
    lm = NeuralLM.gru(random_gru_params(rng, V, emb_dim=8, hidden_dim=12))
    guide = NGramLM(bigram_from_counts(rng.integers(0, 20, (V, V))))
    lp = _peaked_lattice(rng, B, T, V)
    il = rng.integers(T - 6, T + 1, B).astype(np.int32)
    a, b_ = 0.7, 0.2
    ct, cl, cs = beam_search_chunked_lm(lp, il, beam_width=W, lm=lm,
                                        lm_alpha=a, lm_beta=b_, chunk_t=7,
                                        guide_lm=guide)
    xt, xl, xs = beam_search_decode(lp, il, beam_width=W, lm=lm,
                                    lm_alpha=a, lm_beta=b_,
                                    implementation="xla")
    for i in range(B):
        top_c = np.asarray(ct)[i, 0, : int(cl[i, 0])].tolist()
        top_x = np.asarray(xt)[i, 0, : int(xl[i, 0])].tolist()
        assert top_c == top_x, i
        np.testing.assert_allclose(float(cs[i, 0]), float(xs[i, 0]),
                                   atol=2e-3, rtol=1e-4)
