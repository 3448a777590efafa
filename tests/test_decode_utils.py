"""Blank-collapse decode pruning (arXiv:2210.17017)."""

import jax
import jax.numpy as jnp
import numpy as np

from end2end_tpu import beam_search_decode, greedy_decode
from end2end_tpu.ops.decode_utils import blank_collapse, collapse_and_bucket


def peaked_lattice(rng, T, N, V, blank_frac=0.6, peak=0.995):
    """Trained-model-like lattice: most frames are confident blanks."""
    lp = np.full((T, N, V), np.log((1 - peak) / (V - 1)), np.float32)
    for n in range(N):
        for t in range(T):
            c = 0 if rng.random() < blank_frac else int(rng.integers(1, V))
            lp[t, n, c] = np.log(peak)
    return lp


def test_collapse_drops_only_confident_blanks(rng):
    T, N, V = 40, 3, 6
    lp = peaked_lattice(rng, T, N, V)
    il = np.array([40, 30, 20], np.int32)
    packed, new_len = jax.jit(lambda x: blank_collapse(x, il))(jnp.asarray(lp))
    packed, new_len = np.asarray(packed), np.asarray(new_len)
    for n in range(N):
        cb = [lp[t, n, 0] >= np.log(0.98) for t in range(il[n])]
        want = [t for t in range(il[n]) if not (cb[t] and t > 0 and cb[t - 1])]
        assert new_len[n] == len(want)
        np.testing.assert_array_equal(packed[: len(want), n], lp[want, n])


def test_collapse_preserves_decode_on_peaked(rng):
    T, N, V = 60, 4, 8
    lp = peaked_lattice(rng, T, N, V, blank_frac=0.7)
    il = np.full(N, T, np.int32)
    base_t, base_l, base_s = beam_search_decode(lp, il, beam_width=4)
    packed, new_len = collapse_and_bucket(lp, il)
    assert packed.shape[0] < T  # actually shrank
    col_t, col_l, col_s = beam_search_decode(packed, new_len, beam_width=4)
    for n in range(N):
        a = np.asarray(base_t)[n, 0, : int(base_l[n, 0])].tolist()
        b = np.asarray(col_t)[n, 0, : int(col_l[n, 0])].tolist()
        assert a == b, (n, a, b)
    # greedy is exactly preserved too (argmax of kept frames)
    g0 = greedy_decode(lp, il)
    g1 = greedy_decode(packed, new_len)
    for n in range(N):
        np.testing.assert_array_equal(
            np.asarray(g0[0])[n, : int(g0[1][n])],
            np.asarray(g1[0])[n, : int(g1[1][n])],
        )


def test_collapse_noop_on_flat_lattice(rng):
    """Uniform lattices have no confident blanks: nothing is dropped."""
    T, N, V = 20, 2, 5
    lp = np.log(np.full((T, N, V), 1.0 / V, np.float32))
    packed, new_len = blank_collapse(lp)
    np.testing.assert_array_equal(np.asarray(new_len), [T, T])
    np.testing.assert_allclose(np.asarray(packed), lp)


def test_collapse_all_blank(rng):
    """Fully-confident-blank audio collapses to zero frames -> empty decode."""
    T, N, V = 10, 1, 4
    lp = np.full((T, N, V), -9.0, np.float32)
    lp[:, :, 0] = -1e-4
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), -1))
    packed, new_len = collapse_and_bucket(lp)
    assert int(new_len[0]) == 1  # one representative frame per blank run
    toks, lens, scores = beam_search_decode(packed, new_len, beam_width=2)
    assert int(lens[0, 0]) == 0  # still decodes to the empty string
