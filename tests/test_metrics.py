"""Evaluation metrics (utils/metrics.py)."""

import numpy as np
import pytest

from end2end_tpu.utils.metrics import (
    batch_edit_distance,
    cer,
    corpus_wer,
    edit_distance,
    wer,
)


def test_edit_distance_known_cases():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "") == 3
    assert edit_distance("abc", "abc") == 0
    assert edit_distance([1, 2, 3], [1, 3]) == 1
    assert edit_distance("flaw", "lawn") == 2


def test_wer_cer():
    assert wer("the cat sat", "the cat sat") == 0.0
    np.testing.assert_allclose(wer("the cat sat", "the bat sat"), 1 / 3)
    np.testing.assert_allclose(wer("a b c d", "a c d"), 1 / 4)
    np.testing.assert_allclose(cer("abcd", "abed"), 1 / 4)
    assert wer("", "") == 0.0
    assert wer("", "x") == float("inf")
    np.testing.assert_allclose(
        corpus_wer(["a b", "c d e"], ["a b", "c x e"]), 1 / 5
    )


@pytest.mark.parametrize("seed", range(6))
def test_batch_edit_distance_matches_scalar(seed):
    rng = np.random.default_rng(100 + seed)
    N = int(rng.integers(1, 6))
    La = int(rng.integers(1, 12))
    Lb = int(rng.integers(1, 12))
    V = int(rng.integers(2, 6))
    a = rng.integers(0, V, (N, La)).astype(np.int32)
    b = rng.integers(0, V, (N, Lb)).astype(np.int32)
    al = rng.integers(0, La + 1, N).astype(np.int32)
    bl = rng.integers(0, Lb + 1, N).astype(np.int32)
    got = np.asarray(batch_edit_distance(a, al, b, bl))
    for i in range(N):
        want = edit_distance(a[i, : al[i]].tolist(), b[i, : bl[i]].tolist())
        assert got[i] == want, (seed, i, a[i, :al[i]], b[i, :bl[i]])


def test_batch_edit_distance_decode_pipeline(rng):
    # realistic use: score greedy output against padded references on device
    from end2end_tpu import greedy_decode

    path = [1, 1, 0, 2, 0, 3, 3, 0, 1]
    V = 5
    lp = np.full((len(path), 1, V), -12.0, np.float32)
    for t, c in enumerate(path):
        lp[t, 0, c] = -0.01
    lp = lp - np.log(np.sum(np.exp(lp), -1, keepdims=True))
    toks, lens, _ = greedy_decode(lp)  # decodes [1, 2, 3, 1]
    ref = np.array([[1, 2, 3, 2]], np.int32)  # one substitution
    d = batch_edit_distance(toks, lens, ref, np.array([4], np.int32))
    assert int(d[0]) == 1


def test_docs_site_builds(tmp_path):
    """L5 docs-site artifact (SURVEY.md §2): the static generator renders
    every page plus the docstring API reference without errors."""
    import subprocess
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "site"
    r = subprocess.run(
        [sys.executable, os.path.join(root, "docs", "build_docs.py"),
         str(out)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    pages = {p.name for p in out.iterdir()}
    assert {"index.html", "api.html", "ctc_math.html",
            "parallelism.html", "perf_roofline.html"} <= pages
    api = (out / "api.html").read_text()
    assert "ctc_loss" in api and "beam_search_decode" in api
