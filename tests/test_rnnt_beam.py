"""Transducer ALSD beam search tests.

Oracles (sharing only the single-sample predictor/joint step functions):
  * exhaustive sequence enumeration + `rnnt_loss_paths` — with W covering
    every reachable lattice state and prune_k = V-1, each finished beam's
    merged score must EQUAL the sequence's total alignment probability;
  * a per-sample Python dict ALSD loop (independent pruning/merge code);
  * the subset invariant: any beam's merged score can never exceed the
    sequence log-probability computed by the f64 DP (`rnnt_loss_ref`).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from end2end_tpu.ops.neural_lm import gru_step, random_gru_params
from end2end_tpu.ops.rnnt_decode import (additive_joint, rnnt_beam_decode,
                                         rnnt_greedy_decode)
from end2end_tpu.utils.rnnt_reference import rnnt_loss_paths, rnnt_loss_ref


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



def _setup(seed, n=3, t=10, v=6, h_enc=8, emb=4, hid=5, scale=1.0):
    rng = np.random.default_rng(seed)
    enc = (rng.normal(size=(n, t, h_enc)) * scale).astype(np.float32)
    params = jax.tree.map(jnp.asarray,
                          random_gru_params(rng, v, emb_dim=emb,
                                            hidden_dim=hid))
    w_enc = rng.normal(size=(h_enc, 7)).astype(np.float32) * 0.5
    w_pred = rng.normal(size=(hid, 7)).astype(np.float32) * 0.5
    b_j = rng.normal(size=(7,)).astype(np.float32) * 0.1
    w_out = rng.normal(size=(7, v)).astype(np.float32)
    b_out = rng.normal(size=(v,)).astype(np.float32) * 0.1
    pred = partial(gru_step, params)
    joint = additive_joint(jnp.asarray(w_enc), jnp.asarray(w_pred),
                           jnp.asarray(b_j), jnp.asarray(w_out),
                           jnp.asarray(b_out))
    init_h = jnp.zeros((hid,), jnp.float32)
    return enc, pred, init_h, joint


def _np_joint_lp(enc_bt, h, joint):
    """log-softmaxed joint row for one (frame, hidden) pair, float64."""
    logits = np.asarray(joint(jnp.asarray(enc_bt), jnp.asarray(h)),
                        np.float64)
    m = logits.max()
    return logits - (m + np.log(np.exp(logits - m).sum()))


def _lattice(enc_b, y, pred, init_h, joint):
    """(T, U+1, V) f64 lattice for sample enc_b and label sequence y."""
    t_max = enc_b.shape[0]
    hs = [np.asarray(init_h)]
    for tok in y:
        hs.append(np.asarray(pred(jnp.asarray(hs[-1]), jnp.int32(tok))))
    lat = np.stack([
        np.stack([_np_joint_lp(enc_b[t], h, joint) for h in hs])
        for t in range(t_max)])
    return lat  # (T, U+1, V)


def test_beam_exhaustive_scores():
    """W >= all reachable states, K = V-1: every finished beam's score must
    equal the sequence's exact total alignment log-probability."""
    v, t_max, s_cap = 3, 4, 3
    enc, pred, init_h, joint = _setup(0, n=2, t=t_max, v=v)
    il = np.array([t_max, t_max - 1], np.int32)
    toks, lens, scores = rnnt_beam_decode(
        enc, il, pred, init_h, joint, beam_width=16, prune_k=v - 1,
        blank=0, max_symbols=s_cap)
    toks, lens, scores = map(np.asarray, (toks, lens, scores))

    for b in range(2):
        # exact per-sequence log-probs by exhaustive path enumeration
        seqs = [()]
        for L in range(1, s_cap + 1):
            grid = np.stack(np.meshgrid(*([np.arange(1, v)] * L)),
                            axis=-1).reshape(-1, L)
            seqs += [tuple(r) for r in grid]
        exact = {}
        for y in seqs:
            lat = _lattice(enc[b, :il[b]], y, pred, init_h, joint)
            exact[y] = -rnnt_loss_paths(lat, np.array(y, np.int64), blank=0)
        order = sorted(exact, key=lambda y: -exact[y])
        n_beams = int((scores[b] > -1e9).sum())
        assert n_beams >= 10
        for w in range(n_beams):
            y = tuple(toks[b, w, :lens[b, w]].tolist())
            assert y in exact
            np.testing.assert_allclose(scores[b, w], exact[y], atol=2e-3)
        # the decoded ranking matches the exact ranking on the beams kept
        top = [tuple(toks[b, w, :lens[b, w]].tolist())
               for w in range(min(4, n_beams))]
        assert top == order[:len(top)]


def _alsd_oracle(enc_b, il_b, pred, init_h, joint, W, K, s_cap, blank,
                 n_steps):
    """Per-sample Python ALSD with dict merging (independent of the scan)."""
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
                for k in nb:
                    add(p + (int(k),), s + lp[k],
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


def test_beam_matches_python_alsd_oracle():
    n, t_max, v, W, K, s_cap = 3, 8, 6, 4, 4, 5
    enc, pred, init_h, joint = _setup(7, n=n, t=t_max, v=v, scale=1.3)
    il = np.array([t_max, t_max - 2, t_max], np.int32)
    toks, lens, scores = rnnt_beam_decode(
        enc, il, pred, init_h, joint, beam_width=W, prune_k=K, blank=0,
        max_symbols=s_cap)
    toks, lens, scores = map(np.asarray, (toks, lens, scores))
    for b in range(n):
        oracle = _alsd_oracle(enc[b], int(il[b]), pred, init_h, joint,
                              W, K, s_cap, 0, t_max + s_cap)
        got = [(tuple(toks[b, w, :lens[b, w]].tolist()),
                float(scores[b, w]))
               for w in range(W) if scores[b, w] > -1e9]
        assert got[0][0] == oracle[0][0]
        odict = dict(oracle)
        for y, s in got:
            assert y in odict
            np.testing.assert_allclose(s, odict[y], atol=2e-3)


def test_beam_score_never_exceeds_sequence_logprob():
    """Merged beam mass is a subset of the sequence's alignments."""
    n, t_max, v, s_cap = 2, 10, 6, 6
    enc, pred, init_h, joint = _setup(3, n=n, t=t_max, v=v, scale=1.5)
    il = np.array([t_max, t_max - 3], np.int32)
    toks, lens, scores = rnnt_beam_decode(
        enc, il, pred, init_h, joint, beam_width=4, prune_k=3, blank=0,
        max_symbols=s_cap)
    toks, lens, scores = map(np.asarray, (toks, lens, scores))
    for b in range(n):
        for w in range(4):
            if scores[b, w] <= -1e9:
                continue
            y = toks[b, w, :lens[b, w]].astype(np.int64)
            lat = _lattice(enc[b, :il[b]], y.tolist(), pred, init_h, joint)
            nll, _ = rnnt_loss_ref(lat[None], y[None], [il[b]], [len(y)],
                                   blank=0)
            assert scores[b, w] <= -nll[0] + 2e-3


def test_beam_top1_at_least_greedy():
    """With the greedy path's states inside a wide beam, the merged top-1
    score must be >= the greedy single-path score."""
    n, t_max, v = 3, 12, 6
    enc, pred, init_h, joint = _setup(11, n=n, t=t_max, v=v, scale=1.2)
    il = np.array([t_max, t_max - 1, t_max - 4], np.int32)
    _, _, g_scores = rnnt_greedy_decode(
        enc, il, pred, init_h, joint, blank=0, max_symbols=8,
        max_symbols_per_frame=t_max)
    _, _, b_scores = rnnt_beam_decode(
        enc, il, pred, init_h, joint, beam_width=8, prune_k=v - 1,
        blank=0, max_symbols=8)
    assert np.all(np.asarray(b_scores[:, 0]) >=
                  np.asarray(g_scores) - 1e-3)


def test_beam_zero_length_and_timestamps():
    n, t_max, v = 2, 6, 5
    enc, pred, init_h, joint = _setup(5, n=n, t=t_max, v=v)
    il = np.array([0, t_max], np.int32)
    toks, lens, scores, times = rnnt_beam_decode(
        enc, il, pred, init_h, joint, beam_width=4, blank=0,
        max_symbols=4, return_timestamps=True)
    toks, lens, scores, times = map(np.asarray, (toks, lens, scores, times))
    assert lens[0, 0] == 0 and abs(scores[0, 0]) < 1e-6
    for w in range(4):
        L = lens[1, w]
        if scores[1, w] <= -1e9:
            continue
        ts = times[1, w, :L]
        assert np.all(ts >= 0) and np.all(ts < il[1])
        assert np.all(np.diff(ts) >= 0)          # emission frames monotone
        assert np.all(times[1, w, L:] == -1)


class TestBeamLookahead:
    """lookahead=F replays F exact ALSD mini-steps per dispatch from one
    batched joint pass (rnnt_decode window_body): beams/tokens/lengths/
    timestamps must be IDENTICAL to the stepwise scan; scores re-associate
    the same f32 per-frame terms."""

    def _blank_biased(self, seed, n, t, v, bias, scale=1.0):
        import jax.numpy as jnp

        enc, pred, init_h, joint0 = _setup(seed, n=n, t=t, v=v, scale=scale)
        # rebuild the additive joint with a blank-biased output bias
        rng = np.random.default_rng(seed)
        w_enc = rng.normal(size=(8, 7)).astype(np.float32) * 0.5
        w_pred = rng.normal(size=(5, 7)).astype(np.float32) * 0.5
        b_j = rng.normal(size=(7,)).astype(np.float32) * 0.1
        w_out = rng.normal(size=(7, v)).astype(np.float32)
        b_out = rng.normal(size=(v,)).astype(np.float32) * 0.1
        b_out[0] += bias
        joint = additive_joint(jnp.asarray(w_enc), jnp.asarray(w_pred),
                               jnp.asarray(b_j), jnp.asarray(w_out),
                               jnp.asarray(b_out))
        return enc, pred, init_h, joint

    def _check(self, enc, il, pred, init_h, joint, F, **kw):
        ref = rnnt_beam_decode(enc, il, pred, init_h, joint,
                               return_timestamps=True, **kw)
        got = rnnt_beam_decode(enc, il, pred, init_h, joint, lookahead=F,
                               return_timestamps=True, **kw)
        for i, (a, b) in enumerate(zip(ref, got)):
            a, b = np.asarray(a), np.asarray(b)
            if i == 2:
                np.testing.assert_allclose(a, b, atol=2e-5)
            else:
                np.testing.assert_array_equal(a, b)

    def test_identical_emission_saturated(self):
        n, t_max, v = 4, 14, 7
        enc, pred, init_h, joint = _setup(23, n=n, t=t_max, v=v, scale=1.1)
        il = np.array([t_max, t_max - 1, t_max - 5, 3], np.int32)
        for F in (2, 4, 8):
            self._check(enc, il, pred, init_h, joint, F,
                        beam_width=4, max_symbols=8)

    def test_identical_blank_dominated(self):
        n, t_max, v = 3, 30, 9
        enc, pred, init_h, joint = self._blank_biased(5, n, t_max, v, 2.5)
        il = np.array([t_max, t_max - 7, t_max], np.int32)
        for F in (3, 8):
            self._check(enc, il, pred, init_h, joint, F,
                        beam_width=4, max_symbols=16)

    def test_identical_capped_and_narrow(self):
        """Small s_cap exercises the symbol-cap + blank-tail interaction;
        W=2/K=1 exercises degenerate widths."""
        n, t_max, v = 3, 12, 6
        enc, pred, init_h, joint = _setup(31, n=n, t=t_max, v=v, scale=1.4)
        il = np.array([t_max, 5, t_max - 2], np.int32)
        self._check(enc, il, pred, init_h, joint, 5,
                    beam_width=4, max_symbols=2)
        self._check(enc, il, pred, init_h, joint, 4,
                    beam_width=2, max_symbols=6, prune_k=1)
        self._check(enc, il, pred, init_h, joint, 16,
                    beam_width=8, max_symbols=6, prune_k=v - 1)

    def test_matches_python_alsd_oracle(self):
        n, t_max, v, W, K, s_cap = 3, 8, 6, 4, 4, 5
        enc, pred, init_h, joint = _setup(7, n=n, t=t_max, v=v, scale=1.3)
        il = np.array([t_max, t_max - 2, t_max], np.int32)
        toks, lens, scores = rnnt_beam_decode(
            enc, il, pred, init_h, joint, beam_width=W, prune_k=K, blank=0,
            max_symbols=s_cap, lookahead=4)
        toks, lens, scores = map(np.asarray, (toks, lens, scores))
        for b in range(n):
            oracle = _alsd_oracle(enc[b], int(il[b]), pred, init_h, joint,
                                  W, K, s_cap, 0, t_max + s_cap)
            got = [(tuple(toks[b, w, :lens[b, w]].tolist()),
                    float(scores[b, w]))
                   for w in range(W) if scores[b, w] > -1e9]
            assert got[0][0] == oracle[0][0]
            odict = dict(oracle)
            for y, s in got:
                assert y in odict
                np.testing.assert_allclose(s, odict[y], atol=2e-3)

    def test_streaming_exact_with_lookahead(self):
        from end2end_tpu.ops.streaming_decode import StreamingRNNTBeamDecoder

        import jax.numpy as jnp

        n, t_max, v, W = 3, 14, 6, 4
        enc, pred, init_h, joint = self._blank_biased(13, n, t_max, v, 1.5)
        il = np.array([t_max, t_max - 3, 6], np.int32)

        def stream(F, cuts):
            dec = StreamingRNNTBeamDecoder(pred, init_h, joint,
                                           beam_width=W, prune_k=4,
                                           max_symbols=5, lookahead=F)
            st = dec.init(n, enc.shape[2])
            t = 0
            for nxt in list(cuts) + [t_max]:
                if nxt <= t:
                    continue
                cl = np.clip(np.asarray(il) - t, 0, nxt - t).astype(np.int32)
                st = dec.step(st, jnp.asarray(enc[:, t:nxt]), cl)
                t = nxt
            return dec.finish(st, return_timestamps=True)

        # Compare streaming F=4 against streaming F=1 at the SAME cuts:
        # streaming-vs-one-shot already re-associates capped beams' blank
        # tails (documented ~1e-3 class bound on scores); the lookahead
        # claim is about the window replay, not that split.
        for cuts in ([5, 9], [3], []):
            ref, got = stream(1, cuts), stream(4, cuts)
            for i, (a, b) in enumerate(zip(ref, got)):
                a, b = np.asarray(a), np.asarray(b)
                if i == 2:
                    np.testing.assert_allclose(a, b, atol=2e-5)
                else:
                    np.testing.assert_array_equal(a, b)

    def test_rejects_lm(self):
        import pytest

        from end2end_tpu.ops.lm import NGramLM, bigram_from_counts

        n, t_max, v = 2, 6, 5
        enc, pred, init_h, joint = _setup(5, n=n, t=t_max, v=v)
        lm = NGramLM(bigram_from_counts(
            np.random.default_rng(0).integers(0, 5, (v, v))))
        with pytest.raises(ValueError, match="lookahead"):
            rnnt_beam_decode(enc, np.full(n, t_max, np.int32), pred,
                             init_h, joint, beam_width=2, lookahead=4,
                             lm=lm, lm_alpha=0.5)
