"""CTC forced alignment (Viterbi + backtrace) vs brute force."""

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np

from end2end_tpu.ops.alignment import ctc_forced_alignment


def log_softmax_np(x):
    return x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))


def _collapse(path, blank=0):
    out, prev = [], -1
    for c in path:
        if c != blank and c != prev:
            out.append(c)
        prev = c
    return out


def _brute_best_path(lp, target, blank=0):
    """Best path among those collapsing to `target` (tiny T, V only)."""
    T, V = lp.shape
    best, best_p = None, -np.inf
    for path in product(range(V), repeat=T):
        if _collapse(path, blank) != list(target):
            continue
        p = sum(lp[t, c] for t, c in enumerate(path))
        if p > best_p:
            best, best_p = path, p
    return best, best_p


def test_alignment_matches_brute_force(rng):
    T, V = 6, 4
    for trial in range(5):
        lp = log_softmax_np(rng.standard_normal((T, 1, V)) * 2).astype(np.float32)
        target = [1, 2] if trial % 2 == 0 else [3, 3]
        tgt = np.array([target], np.int32)
        out = ctc_forced_alignment(
            lp, tgt, np.array([T], np.int32), np.array([len(target)], np.int32)
        )
        want_path, want_p = _brute_best_path(lp[:, 0, :], target)
        np.testing.assert_allclose(float(out.scores[0]), want_p, rtol=1e-5)
        got_path = np.asarray(out.labels)[:, 0].tolist()
        assert got_path == list(want_path), (got_path, want_path)


def test_alignment_properties(rng):
    B, T, S, V = 3, 25, 5, 8
    lp = log_softmax_np(rng.standard_normal((T, B, V))).astype(np.float32)
    tgt = rng.integers(1, V, (B, S)).astype(np.int32)
    il = np.array([25, 18, 12], np.int32)
    tl = np.array([5, 4, 3], np.int32)
    out = jax.jit(lambda x: ctc_forced_alignment(x, tgt, il, tl))(jnp.asarray(lp))
    labels = np.asarray(out.labels)
    positions = np.asarray(out.positions)
    for n in range(B):
        # collapsing the aligned frame labels reproduces the target
        path = labels[: il[n], n].tolist()
        assert _collapse(path) == tgt[n, : tl[n]].tolist()
        # padding frames are -1
        assert np.all(labels[il[n]:, n] == -1)
        # positions are monotone over non-blank frames and cover 0..tl-1
        ps = positions[: il[n], n]
        nz = ps[ps >= 0]
        assert nz.max() == tl[n] - 1 and nz.min() == 0
        assert np.all(np.diff(nz) >= 0)
        # scores <= log-likelihood (best path <= sum of paths)
    from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla

    nll = np.asarray(ctc_nll_xla(jnp.asarray(lp), tgt, il, tl, 0))
    assert np.all(np.asarray(out.scores) <= -nll + 1e-4)


def test_alignment_impossible(rng):
    T, V = 3, 4
    lp = log_softmax_np(rng.standard_normal((T, 1, V))).astype(np.float32)
    tgt = np.array([[1, 1]], np.int32)  # needs >= 3 frames: 1 b 1 — T=3 OK
    out = ctc_forced_alignment(lp, tgt, np.array([3]), np.array([2]))
    assert np.isfinite(float(out.scores[0]))
    tgt2 = np.array([[1, 1, 2]], np.int32)  # needs >= 5 frames
    out2 = ctc_forced_alignment(lp, tgt2, np.array([3]), np.array([3]))
    assert np.isneginf(float(out2.scores[0]))
