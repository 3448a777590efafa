"""Tests for utils.lm_train — Kneser-Ney ARPA estimation.

Correctness is pinned by the one property that validates probabilities,
backoff weights, and the <unk> chain JOINTLY: every conditional
distribution the emitted backoff model defines must sum to exactly 1 when
evaluated through the float64 ArpaScorer oracle's backoff procedure.
"""

import math
import os

import numpy as np
import pytest

from end2end_tpu.utils.arpa import ArpaScorer, parse_arpa_order
from end2end_tpu.utils.lm_train import (
    render_arpa,
    train_ngram_arpa,
    train_ngram_lm,
    word_lm_from_corpus,
)

_LN10 = math.log(10.0)


def _corpus(rng, v=8, n_sent=40, max_len=12):
    """Skewed random corpus: token i drawn with weight ~ (i+1)^2."""
    w = (np.arange(v) + 1.0) ** 2
    w /= w.sum()
    return [
        [str(t) for t in rng.choice(v, size=rng.integers(1, max_len + 1),
                                    p=w)]
        for _ in range(n_sent)
    ]


def _contexts(scorer, vocab_size, rng, n=40):
    """Random contexts incl. empty, <s>-initial, and unseen-token ones."""
    v = vocab_size
    ctxs = [[], [scorer.bos], [scorer.bos, 0], [v + 5]]  # v+5: unseen id
    for _ in range(n):
        length = int(rng.integers(0, 4))
        ctx = [int(rng.integers(0, v + 6)) for _ in range(length)]
        ctxs.append(ctx)
    return ctxs


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_sum_to_one_every_context(order):
    rng = np.random.default_rng(order)
    order_out, ngrams, vocab = train_ngram_lm(_corpus(rng), order=order)
    assert order_out == order
    v = len(vocab)
    sc = ArpaScorer(order, ngrams, v)
    unk_id = v + 7  # matches no stored gram at any level: the <unk> chain
    for ctx in _contexts(sc, v, rng):
        total = sum(math.exp(sc.score(ctx, w)) for w in range(v))
        total += math.exp(sc.score(ctx, sc.eos))
        total += math.exp(sc.score(ctx, unk_id))
        assert abs(total - 1.0) < 1e-9, (ctx, total)


def test_sum_to_one_without_unk_mass():
    rng = np.random.default_rng(7)
    _, ngrams, vocab = train_ngram_lm(_corpus(rng), order=3,
                                      include_unk=False)
    v = len(vocab)
    sc = ArpaScorer(3, ngrams, v)
    for ctx in ([], [0], [1, 2]):
        total = sum(math.exp(sc.score(ctx, w)) for w in range(v))
        total += math.exp(sc.score(ctx, sc.eos))
        assert abs(total - 1.0) < 1e-9
    # <unk> is a -99 placeholder, not real mass
    assert math.exp(sc.score([], v + 7)) < 1e-20


def test_arpa_roundtrip_through_parser(tmp_path):
    rng = np.random.default_rng(1)
    order, ngrams, vocab = train_ngram_lm(_corpus(rng), order=3)
    path = os.path.join(tmp_path, "lm.arpa")
    with open(path, "w") as f:
        f.write(render_arpa(order, ngrams, vocab))
    order2, parsed = parse_arpa_order(path, vocab, prefer_native=False)
    assert order2 == order
    assert abs(parsed["unk"] - ngrams["unk"]) < 1e-6
    for k in range(1, order + 1):
        want = {ids: (lp, bo) for ids, lp, bo in ngrams[k]}
        got = {ids: (lp, bo) for ids, lp, bo in parsed[k]}
        assert set(got) == set(want), f"order-{k} gram sets differ"
        for ids, (lp, bo) in want.items():
            assert abs(got[ids][0] - lp) < 2e-6 * max(1.0, abs(lp))
            assert abs(got[ids][1] - bo) < 2e-6 * max(1.0, abs(bo))


def test_train_ngram_arpa_text_form():
    rng = np.random.default_rng(2)
    text = train_ngram_arpa(_corpus(rng, n_sent=10), order=2)
    assert text.startswith("\\data\\")
    assert "\\1-grams:" in text and "\\2-grams:" in text
    assert "<unk>" in text and "<s>" in text and "</s>" in text
    assert text.rstrip().endswith("\\end\\")


def test_mle_limit_on_dominant_bigram():
    # one bigram dominates its context: the smoothed conditional must come
    # out close to (and below) the raw ML estimate
    sents = [["a", "b"]] * 50 + [["a", "c"]] * 2 + [["c", "b"], ["b", "a"]]
    _, ngrams, vocab = train_ngram_lm(sents, order=2)
    sc = ArpaScorer(2, ngrams, len(vocab))
    ia, ib = vocab.index("a"), vocab.index("b")
    p = math.exp(sc.score([ia], ib))
    ml = 50 / 52
    assert 0.85 * ml <= p <= ml + 1e-9


def test_kneser_ney_continuation_effect():
    # "sanfrancisco" pathology: token 'f' is frequent but ONLY ever follows
    # 's'; token 'd' is rarer overall but follows many histories.  The KN
    # continuation unigram must prefer 'd' in a fresh (unseen) context even
    # though raw frequency prefers 'f'.
    sents = [["s", "f"]] * 20 + [["a", "d"], ["b", "d"], ["c", "d"],
                                 ["e", "d"], ["g", "d"]]
    _, ngrams, vocab = train_ngram_lm(sents, order=2)
    sc = ArpaScorer(2, ngrams, len(vocab))
    fresh = [len(vocab) + 5]  # unseen context -> pure unigram backoff
    p_f = sc.score(fresh, vocab.index("f"))
    p_d = sc.score(fresh, vocab.index("d"))
    assert p_d > p_f


def test_heldout_perplexity_beats_uniform():
    rng = np.random.default_rng(3)
    train, held = _corpus(rng, n_sent=60), _corpus(rng, n_sent=10)
    _, ngrams, vocab = train_ngram_lm(train, order=3)
    sc = ArpaScorer(3, ngrams, len(vocab))
    wid = {w: i for i, w in enumerate(vocab)}
    lp, n = 0.0, 0
    for s in held:
        ids = [wid[w] for w in s]
        hist = [sc.bos]
        for w in ids + [sc.eos]:
            lp += sc.score(hist, w)
            hist.append(w)
            n += 1
    uniform_lp = -n * math.log(len(vocab) + 1)
    assert lp > uniform_lp  # beats uniform on held-out text


def test_device_tables_match_oracle():
    import jax.numpy as jnp

    from end2end_tpu.ops.lm import HashedNGramLM

    rng = np.random.default_rng(4)
    order, ngrams, vocab = train_ngram_lm(_corpus(rng, v=6), order=3)
    v = len(vocab)
    lm = HashedNGramLM(order, ngrams, v)
    sc = ArpaScorer(order, ngrams, v, unk_logp=ngrams["unk"])
    # score every candidate token from a batch of histories via the
    # ShallowFusionLM protocol: state rows are the last (order-1) ids,
    # -1-padded on the left, with <s> opening the utterance
    n_ctx = max(order - 1, 1)
    hists = [[], [0], [1, 2], [3, 1], [2, 4, 1]]
    state = jnp.asarray(
        [([-1] * n_ctx + [v] + h)[-n_ctx:] for h in hists], jnp.int32)
    lp = np.asarray(lm.score(state, jnp.arange(v, dtype=jnp.int32))[0])
    for b, h in enumerate(hists):
        for w in range(v):
            want = sc.score([sc.bos] + h, w)
            assert abs(lp[b, w] - want) < 1e-4, (h, w, lp[b, w], want)
    # end-of-utterance scores
    fin = np.asarray(lm.final(state))
    for b, h in enumerate(hists):
        want = sc.score([sc.bos] + h, sc.eos)
        assert abs(fin[b] - want) < 1e-4, (h, fin[b], want)


def test_word_lm_from_corpus_decodes():
    # end-to-end: train a word bigram from text, fuse it into beam search,
    # and check it steers an ambiguous lattice toward the corpus-frequent
    # word.
    import jax.numpy as jnp

    from end2end_tpu.ops.beam_search import beam_search_decode
    from end2end_tpu.utils.text import asr_alphabet

    alphabet = asr_alphabet()
    sents = [["the", "cat"]] * 12 + [["the", "cab"]]
    lm = word_lm_from_corpus(sents, alphabet, order=2)

    ids = alphabet.encode("the cat")
    ids_b = alphabet.encode("the cab")
    t_id, b_id = ids[-1], ids_b[-1]
    T, V = len(ids) + 2, len(alphabet)
    lat = np.full((T, 1, V), -12.0, np.float32)
    for t, c in enumerate(ids[:-1]):
        lat[t, 0, c] = -0.05
    # last char genuinely ambiguous between 't' and 'b'
    lat[len(ids) - 1, 0, t_id] = -0.75
    lat[len(ids) - 1, 0, b_id] = -0.65
    lat[len(ids):, 0, 0] = -0.05  # blanks
    lat = jnp.asarray(lat - np.log(np.exp(lat).sum(-1, keepdims=True)))
    il = jnp.asarray([T], jnp.int32)

    def best(lm_):
        toks, lens, _ = beam_search_decode(
            lat, il, beam_width=4, max_symbols=12, lm=lm_, lm_alpha=1.0,
            implementation="xla")
        return alphabet.decode(np.asarray(toks[0, 0, : int(lens[0, 0])]))

    assert best(None) == "the cab"   # acoustics alone prefer 'b'
    assert best(lm) == "the cat"     # corpus statistics flip it


def test_errors():
    with pytest.raises(ValueError, match="order"):
        train_ngram_lm([["a"]], order=0)
    with pytest.raises(ValueError, match="empty"):
        train_ngram_lm([])
    with pytest.raises(ValueError, match="outside vocab"):
        train_ngram_lm([["a", "zzz"]], vocab=["a"])
