"""Native C++ host runtime: beam search, greedy, ARPA parser.

The native beam decoder is an independent implementation of the same
algorithm as both the NumPy oracle and the JAX scan — three-way agreement is
strong evidence of correctness (SURVEY.md §5).
"""

import os
import tempfile

import numpy as np
import pytest

from end2end_tpu.utils import native
from end2end_tpu.utils.arpa import load_arpa, parse_arpa_python
from end2end_tpu.utils.reference_impl import beam_search_decode_ref, greedy_decode_ref

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def log_softmax_np(x):
    return x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))


def test_native_greedy_matches_oracle(rng):
    B, T, V = 6, 50, 29
    lp = log_softmax_np(rng.standard_normal((T, B, V))).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    tokens, lens = native.greedy_decode_cpu(lp, il)
    ref = greedy_decode_ref(lp, il)
    for b in range(B):
        assert tokens[b, : lens[b]].tolist() == ref[b]


@pytest.mark.parametrize("W,threads", [(4, 1), (8, 4)])
def test_native_beam_matches_oracle(rng, W, threads):
    B, T, V = 4, 15, 6
    lp = log_softmax_np(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = np.array([15, 11, 8, 15], np.int32)
    tokens, lens, scores = native.beam_search_cpu(
        lp, il, beam_width=W, n_threads=threads
    )
    ref = beam_search_decode_ref(lp.astype(np.float64), il, beam_width=W)
    for b in range(B):
        got = {
            tuple(tokens[b, w, : lens[b, w]].tolist()): float(scores[b, w])
            for w in range(W)
            if np.isfinite(scores[b, w])
        }
        want = dict(ref[b])
        assert set(got) == set(map(tuple, want))
        for p, s in got.items():
            np.testing.assert_allclose(s, want[p], rtol=1e-4, atol=1e-4)


ARPA = """\
\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-0.30103 <unk>
-0.69897 <s> -0.30103
-0.52 </s>
-0.60206 a -0.17609
-0.90309 b -0.22185
-1.20412 c

\\2-grams:
-0.30103 <s> a
-0.47712 a b
-0.60206 b c
-0.95424 b </s>

\\end\\
"""


def _write_arpa():
    f = tempfile.NamedTemporaryFile("w", suffix=".arpa", delete=False)
    f.write(ARPA)
    f.close()
    return f.name


def test_arpa_python_parser_semantics():
    path = _write_arpa()
    vocab = ["a", "b", "c", "d"]
    uni, bigram, start, eos = parse_arpa_python(path, vocab)
    ln10 = np.log(10.0)
    np.testing.assert_allclose(uni[0], -0.60206 * ln10, rtol=1e-6)  # a
    np.testing.assert_allclose(uni[3], -0.30103 * ln10, rtol=1e-6)  # d -> <unk>
    # explicit bigram a->b
    np.testing.assert_allclose(bigram[0, 1], -0.47712 * ln10, rtol=1e-6)
    # backoff bigram a->c = bo(a) + p(c)
    np.testing.assert_allclose(
        bigram[0, 2], (-0.17609 + -1.20412) * ln10, rtol=1e-6
    )
    # start: explicit <s> a; backoff <s> b = bo(<s>) + p(b)
    np.testing.assert_allclose(start[0], -0.30103 * ln10, rtol=1e-6)
    np.testing.assert_allclose(start[1], (-0.30103 + -0.90309) * ln10, rtol=1e-6)
    # eos: b </s>
    np.testing.assert_allclose(eos[1], -0.95424 * ln10, rtol=1e-6)
    os.unlink(path)


def test_arpa_native_matches_python():
    path = _write_arpa()
    vocab = ["a", "b", "c", "d"]
    py = parse_arpa_python(path, vocab)
    nat = native.parse_arpa_native(path, vocab)
    assert nat is not None
    for a, b in zip(py, nat):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # and the loader prefers native with identical output
    ld = load_arpa(path, vocab)
    for a, b in zip(py, ld):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    os.unlink(path)


def test_native_beam_vs_jax_beam(rng):
    """Native C++ vs JAX scan decoder: same beams on the same inputs."""
    from end2end_tpu import beam_search_decode

    B, T, V, W = 3, 12, 5, 4
    lp = log_softmax_np(rng.standard_normal((T, B, V))).astype(np.float32)
    il = np.full(B, T, np.int32)
    nt, nl, ns = native.beam_search_cpu(lp, il, beam_width=W)
    jt, jl, js = beam_search_decode(lp, il, beam_width=W)
    for b in range(B):
        got_n = {tuple(nt[b, w, : nl[b, w]].tolist()) for w in range(W) if np.isfinite(ns[b, w])}
        got_j = {
            tuple(np.asarray(jt)[b, w, : int(jl[b, w])].tolist())
            for w in range(W)
            if np.isfinite(np.asarray(js)[b, w])
        }
        assert got_n == got_j


def test_arpa_lm_without_explicit_eos_keeps_beams_finite(rng):
    """Regression: unseen "w </s>" bigrams must back off, not nuke beams."""
    import tempfile

    from end2end_tpu import beam_search_decode
    from end2end_tpu.utils.arpa import ngram_lm_from_arpa

    arpa = (
        "\\data\\\nngram 1=4\nngram 2=1\n\n\\1-grams:\n"
        "-0.3 <unk>\n-0.5 <s> -0.2\n-0.5 </s>\n-0.6 a -0.2\n\n"
        "\\2-grams:\n-0.1 a a\n\n\\end\\\n"
    )
    f = tempfile.NamedTemporaryFile("w", suffix=".arpa", delete=False)
    f.write(arpa)
    f.close()
    lm = ngram_lm_from_arpa(f.name, ["_", "a", "b"])
    lp = log_softmax_np(rng.standard_normal((6, 1, 3))).astype(np.float32)
    tokens, lengths, scores = beam_search_decode(
        lp, beam_width=3, lm=lm, lm_alpha=1.0
    )
    assert np.isfinite(np.asarray(scores)[0, 0])
    os.unlink(f.name)


def test_jax_beam_vs_native_stress(rng):
    """Broader randomized cross-check: JAX scan vs native C++ beam on larger
    lattices than the exhaustive tests can reach."""
    from end2end_tpu import beam_search_decode

    B, T, V, W = 4, 50, 20, 8
    lp = log_softmax_np(rng.standard_normal((T, B, V)) * 1.5).astype(np.float32)
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    nt, nl, ns = native.beam_search_cpu(lp, il, beam_width=W)
    jt, jl, js = beam_search_decode(lp, il, beam_width=W)
    for b in range(B):
        # top-1 identical; full sets may differ in the tail only via f32 ties
        assert nt[b, 0, : nl[b, 0]].tolist() == np.asarray(jt)[b, 0, : int(jl[b, 0])].tolist()
        np.testing.assert_allclose(float(ns[b, 0]), float(np.asarray(js)[b, 0]), rtol=2e-4)


def test_native_arpa_order_parser_matches_python(tmp_path):
    """Generic-order native ARPA parser == pure-Python parser, gram for gram."""
    from end2end_tpu.utils import native
    from end2end_tpu.utils.arpa import parse_arpa_order

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    arpa = (
        "\\data\\\nngram 1=6\nngram 2=4\nngram 3=3\nngram 4=1\n\n\\1-grams:\n"
        "-1.9 <unk>\n-0.3 <s> -0.2\n-0.9 </s>\n"
        "-0.5 a -0.25\n-0.5 b -0.2\n-0.9 c\n\n"
        "\\2-grams:\n-0.4 <s> a -0.1\n-0.4 a b -0.1\n-0.5 b b\n-0.9 b c -0.05\n\n"
        "\\3-grams:\n-0.05 a b c -0.01\n-0.1 b b a\n-0.2 a b </s>\n\n"
        "\\4-grams:\n-0.15 <s> a b c\n\n\\end\\\n"
    )
    f = tmp_path / "order.arpa"
    f.write_text(arpa)
    vocab = ["a", "b", "c"]
    o_py, ng_py = parse_arpa_order(str(f), vocab, prefer_native=False)
    out = native.parse_arpa_order_native(str(f), vocab)
    assert out is not None
    o_nat, ng_nat = out
    assert o_nat == o_py == 4
    import numpy as np

    np.testing.assert_allclose(ng_nat["unk"], ng_py["unk"], rtol=1e-6)
    for k in range(1, 5):
        a = sorted(ng_py[k])
        b = sorted(ng_nat[k])
        assert [x[0] for x in a] == [x[0] for x in b], k
        for (ia, la, ba), (ib, lb, bb) in zip(a, b):
            np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(ba, bb, rtol=1e-5, atol=1e-6)



def test_native_beam_lm_matches_jax(rng):
    """C++ bigram shallow fusion (the reference's KenLM-in-C++ role) ==
    both JAX decoders, full vocab (exact regime): 4-way LM agreement."""
    from end2end_tpu import beam_search_decode
    from end2end_tpu.ops.lm import NGramLM, bigram_from_counts
    from end2end_tpu.utils.native import beam_search_cpu

    B, T, V, W = 3, 12, 6, 6
    alpha, beta = 0.8, 0.3
    bigram = bigram_from_counts(rng.integers(0, 10, (V, V)))
    start = rng.standard_normal(V).astype(np.float32)
    eos = rng.standard_normal(V).astype(np.float32) * 0.5
    lm = NGramLM(bigram, start_logp=start, eos_logp=eos)
    lp = rng.standard_normal((T, B, V)).astype(np.float32) * 1.5
    lp = lp - np.log(np.sum(np.exp(lp), -1, keepdims=True))
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)

    nt, nl, ns = beam_search_cpu(
        lp, il, beam_width=W, lm_table=np.asarray(lm._table),
        lm_eos=np.asarray(lm._eos), lm_alpha=alpha, lm_beta=beta,
    )
    for impl in ("pallas", "xla"):
        jt, jl, js = [np.asarray(a) for a in beam_search_decode(
            lp, il, beam_width=W, lm=lm, lm_alpha=alpha, lm_beta=beta,
            implementation=impl)]
        for b in range(B):
            nset = {tuple(nt[b, w, : nl[b, w]].tolist()): ns[b, w]
                    for w in range(W) if np.isfinite(ns[b, w])}
            jset = {tuple(jt[b, w, : jl[b, w]].tolist()): js[b, w]
                    for w in range(W) if np.isfinite(js[b, w])}
            assert set(nset) == set(jset), (impl, b)
            for pref in nset:
                np.testing.assert_allclose(nset[pref], jset[pref],
                                           atol=1e-3, rtol=1e-3,
                                           err_msg=f"{impl} {b}")
