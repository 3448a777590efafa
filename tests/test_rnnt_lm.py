"""LM shallow fusion in the ALSD transducer beam search.

Oracle: the per-sample Python dict ALSD loop from test_rnnt_beam.py,
extended with the same dense-bigram bonus (alpha * log p_LM(c|prev) +
beta on every emission) — independent pruning/merging code, so beam
sets, ordering, and scores must all agree.  Plus: the LM actually
steers the search on a constructed ambiguity, the plumbing is neutral
at alpha=beta=0, and a NeuralLM rides the same hook.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from end2end_tpu.ops.lm import NGramLM, UniformLM
from end2end_tpu.ops.neural_lm import NeuralLM
from end2end_tpu.ops.rnnt_decode import rnnt_beam_decode
from tests.test_rnnt_beam import _alsd_oracle, _np_joint_lp, _setup


try:
    import pytest
except ImportError:  # pragma: no cover
    pytest = None

if pytest is not None:
    @pytest.fixture(autouse=True)
    def _oracle_matmul_precision():
        """ORACLE-PARITY tests: decode scores compare against host/f64
        oracles at ~1e-3 tolerances.  On TPU the default f32 matmul runs
        a bf16 MXU pass (CLAUDE.md MXU trap), drifting GRU/joint logits
        ~1e-3 per step — cumulative scores then miss the tolerance
        (measured 3.4e-2 over a 49-nat sum, tokens/timestamps still
        exact; chip run 2026-08-20).  Parity tests pin the precision;
        perf rows (bench.py) keep the fast default."""
        with jax.default_matmul_precision("highest"):
            yield



def _alsd_lm_oracle(enc_b, il_b, pred, init_h, joint, W, K, s_cap, blank,
                    n_steps, table, alpha, beta):
    """Dict-ALSD with dense-bigram shallow fusion.  table[prev+1, c]
    (row 0 = start context) — NGramLM semantics, float64."""
    live = {(): (0.0, np.asarray(init_h))}
    finished = {}
    if il_b == 0:
        return [((), 0.0)]
    for d in range(n_steps):
        cand, hid = {}, {}

        def add(key, s, h=None):
            if key in cand:
                cand[key] = np.logaddexp(cand[key], s)
            else:
                cand[key] = s
                if h is not None:
                    hid[key] = h

        for p, s in finished.items():
            add(("F",) + p, s)
        for p, (s, h) in live.items():
            t = d - len(p)
            lp = _np_joint_lp(enc_b[t], h, joint)
            if t + 1 >= il_b:
                add(("F",) + p, s + lp[blank])
            else:
                add(p, s + lp[blank], h)
            if len(p) < s_cap:
                nb = np.argsort(-np.delete(lp, blank))[:K]
                nb = nb + (nb >= blank)
                prev = p[-1] if p else -1
                for k in nb:
                    bonus = alpha * table[prev + 1, int(k)] + beta
                    add(p + (int(k),), s + lp[k] + bonus,
                        np.asarray(pred(jnp.asarray(h), jnp.int32(k))))
        keep = sorted(cand, key=lambda key: -cand[key])[:W]
        live, new_fin = {}, {}
        for key in keep:
            if key and key[0] == "F":
                new_fin[key[1:]] = cand[key]
            else:
                live[key] = (cand[key], hid[key])
        finished = new_fin
        if not live:
            break
    return sorted(finished.items(), key=lambda kv: -kv[1])


def _bigram(v, seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(v, v)) * 1.5
    tbl = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    start = rng.normal(size=(v,))
    start = start - np.log(np.exp(start).sum())
    full = np.concatenate([start[None], tbl], axis=0)  # row 0 = <s>
    lm = NGramLM(jnp.asarray(tbl, jnp.float32),
                 start_logp=jnp.asarray(start, jnp.float32))
    return lm, full


class TestLMOracleParity:
    def test_matches_dict_oracle_with_lm(self):
        n, t_max, v, W, K, s_cap = 3, 8, 6, 4, 4, 5
        alpha, beta = 0.7, 0.25
        enc, pred, init_h, joint = _setup(7, n=n, t=t_max, v=v, scale=1.3)
        il = np.array([t_max, t_max - 2, t_max], np.int32)
        lm, table = _bigram(v, 21)
        toks, lens, scores = rnnt_beam_decode(
            enc, il, pred, init_h, joint, beam_width=W, prune_k=K,
            blank=0, max_symbols=s_cap, lm=lm, lm_alpha=alpha,
            lm_beta=beta)
        toks, lens, scores = map(np.asarray, (toks, lens, scores))
        for b in range(n):
            oracle = _alsd_lm_oracle(enc[b], int(il[b]), pred, init_h,
                                     joint, W, K, s_cap, 0,
                                     t_max + s_cap, table, alpha, beta)
            got = [(tuple(toks[b, w, :lens[b, w]].tolist()),
                    float(scores[b, w]))
                   for w in range(W) if scores[b, w] > -1e9]
            assert got[0][0] == oracle[0][0]
            odict = dict(oracle)
            for y, s in got:
                assert y in odict
                np.testing.assert_allclose(s, odict[y], atol=2e-3)

    def test_alpha_zero_beta_zero_is_neutral(self):
        n, t_max, v = 2, 7, 5
        enc, pred, init_h, joint = _setup(3, n=n, t=t_max, v=v, scale=1.2)
        il = np.full((n,), t_max, np.int32)
        lm, _ = _bigram(v, 5)
        base = rnnt_beam_decode(enc, il, pred, init_h, joint,
                                beam_width=4, max_symbols=4)
        fused = rnnt_beam_decode(enc, il, pred, init_h, joint,
                                 beam_width=4, max_symbols=4,
                                 lm=lm, lm_alpha=0.0, lm_beta=0.0)
        for a, b in zip(base, fused):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestLMSteering:
    def test_lm_flips_ambiguous_top1(self):
        """Acoustically near-tied tokens: a bigram that loves one of them
        must put it on top; a bigram that loves the other must flip it."""
        n, t_max, v = 1, 6, 4
        enc, pred, init_h, joint = _setup(9, n=n, t=t_max, v=v, scale=0.3)
        il = np.full((n,), t_max, np.int32)

        def lm_loving(tok):
            tbl = np.full((v, v), -8.0, np.float32)
            tbl[:, tok] = -0.05
            start = np.full((v,), -8.0, np.float32)
            start[tok] = -0.05
            return NGramLM(jnp.asarray(tbl), start_logp=jnp.asarray(start))

        outs = {}
        for tok in (1, 2):
            toks, lens, _ = rnnt_beam_decode(
                enc, il, pred, init_h, joint, beam_width=4,
                max_symbols=4, lm=lm_loving(tok), lm_alpha=3.0,
                lm_beta=0.0)
            outs[tok] = tuple(np.asarray(toks)[0, 0,
                                               :int(np.asarray(lens)[0, 0])])
        assert outs[1] != outs[2]
        assert all(t == 1 for t in outs[1])
        assert all(t == 2 for t in outs[2])

    def test_uniform_beta_is_length_penalty(self):
        """UniformLM(logp=0): beta acts as a pure per-emission bonus, so a
        strongly negative beta must shorten the top-1 hypothesis."""
        n, t_max, v = 2, 8, 5
        enc, pred, init_h, joint = _setup(13, n=n, t=t_max, v=v, scale=0.8)
        il = np.full((n,), t_max, np.int32)
        lm = UniformLM(v, logp=0.0)
        lens_at = []
        for beta in (0.0, -4.0):
            _, lens, _ = rnnt_beam_decode(
                enc, il, pred, init_h, joint, beam_width=4,
                max_symbols=6, lm=lm, lm_alpha=1.0, lm_beta=beta)
            lens_at.append(np.asarray(lens)[:, 0])
        assert np.all(lens_at[1] <= lens_at[0])
        assert np.any(lens_at[1] < lens_at[0])


class TestNeuralLMFusion:
    def test_neural_lm_reproduces_ngram_decode(self):
        """A one-hot-hidden NeuralLM wrapping the same bigram table must
        reproduce the NGramLM-fused ALSD decode (the test_neural_lm.py
        identity, through the transducer hook)."""
        n, t_max, v = 2, 7, 5
        enc, pred, init_h, joint = _setup(17, n=n, t=t_max, v=v, scale=1.1)
        il = np.full((n,), t_max, np.int32)
        lm, table = _bigram(v, 31)
        tbl = jnp.asarray(table, jnp.float32)      # (V+1, V), row 0 = <s>

        def step_fn(hidden, token):
            return jax.nn.one_hot(token + 1, v + 1, dtype=jnp.float32)

        def logp_fn(hidden):
            return jnp.einsum("c,cv->v", hidden, tbl,
                              precision=jax.lax.Precision.HIGHEST)

        nlm = NeuralLM(step_fn, logp_fn,
                       jax.nn.one_hot(0, v + 1, dtype=jnp.float32),
                       v, normalize=False)
        a = rnnt_beam_decode(enc, il, pred, init_h, joint, beam_width=4,
                             max_symbols=4, lm=lm, lm_alpha=0.8,
                             lm_beta=0.1)
        b = rnnt_beam_decode(enc, il, pred, init_h, joint, beam_width=4,
                             max_symbols=4, lm=nlm, lm_alpha=0.8,
                             lm_beta=0.1)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5)
