"""N-best rescoring (ops/rescore.py).

The rescoring bonus is a pure function of the prefix:
``alpha * (sum_j lm(y_j | y_<j) + final(y)) + beta * len(y)``.  Each test
computes that bonus with an INDEPENDENT float64 oracle (plain NumPy loops /
the dict-based ArpaScorer) and asserts `rescore_nbest` added exactly it to
every surviving hypothesis.  (Rescored scores are NOT compared against
LM-fused decoding: fusion steers the per-frame pruning, so the acoustic
mass of a prefix legitimately differs between the two — the documented
fusion-vs-rescoring trade.)
"""

import numpy as np

from end2end_tpu import beam_search_decode, rescore_nbest
from end2end_tpu.ops.lm import (
    HashedNGramLM,
    HashedWordNGramLM,
    NGramLM,
    WordNGramLM,
    bigram_from_counts,
)


def lsm(x):
    return x - np.log(np.sum(np.exp(x), -1, keepdims=True))


def _check_bonus(base, rescored, bonus_fn):
    t0, l0, s0 = [np.asarray(a) for a in base]
    rt, rl, rs = [np.asarray(a) for a in rescored]
    n, w = s0.shape
    checked = 0
    for b in range(n):
        for j in range(w):
            if not np.isfinite(s0[b, j]):
                assert not np.isfinite(rs[b, j])
                continue
            y = t0[b, j, : l0[b, j]].tolist()
            np.testing.assert_allclose(
                rs[b, j] - s0[b, j], bonus_fn(y), atol=1e-4, rtol=1e-4,
                err_msg=str((b, y)),
            )
            checked += 1
    assert checked >= n  # at least one live beam per sample


def _decode_and_rescore(rng, lm, alpha, beta, B=3, T=8, V=4, W=8):
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T - 2, T + 1, B).astype(np.int32)
    base = beam_search_decode(lp, il, beam_width=W)
    rescored = rescore_nbest(*base, lm=lm, lm_alpha=alpha, lm_beta=beta,
                             resort=False)
    return base, rescored


def test_rescore_bigram_bonus_matches_numpy(rng):
    V, alpha, beta = 4, 0.7, 0.3
    bigram = bigram_from_counts(rng.integers(0, 10, (V, V)))
    start = rng.standard_normal(V).astype(np.float32)
    eos = rng.standard_normal(V).astype(np.float32) * 0.5
    lm = NGramLM(bigram, start_logp=start, eos_logp=eos)

    def bonus(y):
        if not y:
            return 0.0
        lp = start[y[0]] + sum(bigram[y[i - 1], y[i]]
                               for i in range(1, len(y))) + eos[y[-1]]
        return alpha * lp + beta * len(y)

    base, rescored = _decode_and_rescore(rng, lm, alpha, beta)
    _check_bonus(base, rescored, bonus)


_ARPA = """\\data\\
ngram 1=5
ngram 2=3
ngram 3=2

\\1-grams:
-0.5\t<s>\t-0.3
-1.0\t</s>
-0.6\ta\t-0.3
-0.9\tb\t-0.25
-1.2\tc

\\2-grams:
-0.4\t<s> a\t-0.15
-0.2\ta b\t-0.1
-0.7\tb c

\\3-grams:
-0.5\ta b c
-0.35\t<s> a b

\\end\\
"""


def _write_arpa(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(_ARPA)
    return str(p)


def test_rescore_hashed_trigram_bonus_matches_arpa_scorer(tmp_path, rng):
    from end2end_tpu.utils.arpa import ArpaScorer

    vocab = ["<pad>", "a", "b", "c"]  # token 0 = blank, never decoded
    path = _write_arpa(tmp_path)
    lm = HashedNGramLM.from_arpa(path, vocab)
    sc = ArpaScorer.from_file(path, vocab)
    alpha, beta = 0.9, 0.2

    def bonus(y):
        if not y:
            return 0.0
        lp = 0.0
        for j in range(len(y)):
            lp += sc.score((sc.bos,) + tuple(y[:j]), y[j])
        lp += sc.score((sc.bos,) + tuple(y), sc.eos)
        return alpha * lp + beta * len(y)

    base, rescored = _decode_and_rescore(rng, lm, alpha, beta)
    _check_bonus(base, rescored, bonus)


def test_rescore_word_bigram_bonus_matches_numpy(rng):
    # char vocab: 0=blank, 1='a', 2='b', 3=' '
    spellings = [(1,), (2,), (1, 2)]  # words: "a", "b", "ab"
    wv = len(spellings)
    alpha, beta = 0.8, 0.1
    bigram = (rng.standard_normal((wv, wv)) - 2.0).astype(np.float32)
    start = (rng.standard_normal(wv) - 1.0).astype(np.float32)
    eos = rng.standard_normal(wv).astype(np.float32)
    unk = -13.8
    lm = WordNGramLM(spellings, bigram, start, space_id=3, eos_logp=eos,
                     unk_logp=unk)
    spell2id = {tuple(s): i for i, s in enumerate(spellings)}

    def bonus(y):
        # word-boundary scoring: complete a word at each space + at the end
        lp, prev, cur = 0.0, None, []  # prev None = <s>
        UNK = -1

        def complete():
            nonlocal lp, prev, cur
            if not cur:
                return
            wid = spell2id.get(tuple(cur), UNK)
            if wid == UNK:
                lp += unk
                prev = UNK
            else:
                if prev is None:
                    lp += start[wid]
                elif prev == UNK:
                    lp += unk  # unk context backs off to default unigram
                else:
                    lp += bigram[prev, wid]
                prev = wid
            cur = []

        for c in y:
            if c == 3:
                complete()
            else:
                cur.append(c)
        complete()
        if prev is not None and prev != UNK:
            lp += eos[prev]
        return alpha * lp + beta * len(y)

    base, rescored = _decode_and_rescore(rng, lm, alpha, beta, V=4, T=10)
    _check_bonus(base, rescored, bonus)


def test_rescore_hashed_word_lm_known_sequence(tmp_path):
    """Peaked lattice decoding to a KNOWN char sequence; hand-scored
    word-trigram bonus via the ArpaScorer over word ids."""
    from end2end_tpu.utils.arpa import ArpaScorer, parse_arpa_order

    words = ["a", "b", "c"]
    path = _write_arpa(tmp_path)
    order, ngrams = parse_arpa_order(path, words)
    spellings = [(1,), (2,), (3,)]  # 'a'->1, 'b'->2, 'c'->3; space=4
    lm = HashedWordNGramLM(spellings, order, ngrams, space_id=4)
    sc = ArpaScorer.from_file(path, words)
    alpha, beta = 1.0, 0.0

    # "a b c" as char ids with blanks: 1 4 2 4 3
    seq = [1, 0, 4, 0, 2, 4, 0, 3]
    V = 6
    lp = np.full((len(seq), 1, V), -14.0, np.float32)
    for t, c in enumerate(seq):
        lp[t, 0, c] = -0.01
    lp = lsm(lp.astype(np.float64)).astype(np.float32)
    base = beam_search_decode(lp, beam_width=2)
    t0, l0, s0 = [np.asarray(a) for a in base]
    assert t0[0, 0, : l0[0, 0]].tolist() == [1, 4, 2, 4, 3]
    rt, rl, rs = [np.asarray(a) for a in rescore_nbest(
        *base, lm=lm, lm_alpha=alpha, lm_beta=beta, resort=False)]
    # words: a | b | c with contexts (<s>), (<s> a), (a b); then </s>
    want = (sc.score((sc.bos,), 0) + sc.score((sc.bos, 0), 1)
            + sc.score((0, 1), 2) + sc.score((1, 2), sc.eos))
    np.testing.assert_allclose(rs[0, 0] - s0[0, 0], want, atol=1e-4)


def test_rescore_identity_and_beta(rng):
    V, W = 5, 4
    lp = lsm(rng.standard_normal((7, 2, V)) * 1.5).astype(np.float32)
    base = beam_search_decode(lp, beam_width=W)
    lm = NGramLM(np.zeros((V, V), np.float32))
    t0, l0, s0 = base
    # alpha=0, beta=0: pure identity (order already sorted)
    t1, l1, s1 = rescore_nbest(t0, l0, s0, lm=lm)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-6)
    assert np.array_equal(np.asarray(t1), np.asarray(t0))
    # beta only: adds beta * length to every finite beam
    t2, l2, s2 = rescore_nbest(t0, l0, s0, lm=lm, lm_beta=0.5, resort=False)
    want = np.where(np.isfinite(np.asarray(s0)),
                    np.asarray(s0) + 0.5 * np.asarray(l0), -np.inf)
    np.testing.assert_allclose(np.asarray(s2), want, atol=1e-5)


def test_rescore_resort_reranks(rng):
    # an LM that strongly prefers token 2 after 1 must promote "1 2"
    V = 4
    bigram = np.full((V, V), -9.0, np.float32)
    bigram[1, 2] = -0.01
    lm = NGramLM(bigram)
    lp = np.full((4, 1, V), -9.0, np.float32)
    lp[0, 0, 1] = -0.01
    lp[1, 0, 0] = -0.7
    lp[2, 0, 2] = -0.69
    lp[2, 0, 3] = -0.60  # acoustically "3" wins
    lp[3, 0, 0] = -0.01
    lp = lsm(lp.astype(np.float64)).astype(np.float32)
    base = beam_search_decode(lp, beam_width=4)
    t0, l0, s0 = [np.asarray(a) for a in base]
    assert t0[0, 0, : l0[0, 0]].tolist() == [1, 3]
    rt, rl, rs = rescore_nbest(*base, lm=lm, lm_alpha=1.0)
    rt, rl = np.asarray(rt), np.asarray(rl)
    assert rt[0, 0, : rl[0, 0]].tolist() == [1, 2]
    assert np.all(np.diff(np.asarray(rs)[0]) <= 1e-6)  # sorted desc


def test_rescore_cosorts_timestamps(rng):
    # times from return_timestamps=True must follow the re-ranked beam
    # order (advisor finding, round 2): each (tokens-row, times-row) pair
    # from the base decode must survive rescoring intact.
    B, T, V, W = 3, 10, 5, 8
    lp = lsm(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    lm = NGramLM(bigram_from_counts(rng.integers(0, 20, (V, V))))
    t0, l0, s0, tm0 = beam_search_decode(lp, beam_width=W,
                                         return_timestamps=True)
    rt, rl, rs, rtm = rescore_nbest(t0, l0, s0, lm, lm_alpha=0.9,
                                    lm_beta=0.3, times=tm0)
    t0, tm0, rt, rtm = [np.asarray(a) for a in (t0, tm0, rt, rtm)]
    rl, rs = np.asarray(rl), np.asarray(rs)
    base_pairs = {
        (tuple(t0[b, w].tolist()), tuple(tm0[b, w].tolist()))
        for b in range(B) for w in range(W)
    }
    assert not np.all(rs == np.asarray(s0))  # the LM actually rescored
    for b in range(B):
        for w in range(W):
            if not np.isfinite(rs[b, w]):
                continue
            pair = (tuple(rt[b, w].tolist()), tuple(rtm[b, w].tolist()))
            assert pair in base_pairs, (b, w)
            # tokens and times stay index-aligned after the re-sort
            assert (rtm[b, w, : rl[b, w]] >= 0).all()
            assert (rtm[b, w, rl[b, w]:] == -1).all()
