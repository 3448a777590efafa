"""Bucketing: padded results identical, one compile per bucket.

SURVEY.md §5.2 item 5.
"""

import jax
import jax.numpy as jnp
import numpy as np

from end2end_tpu import ctc_loss
from end2end_tpu.utils.bucketing import (
    BucketSpec,
    bucket_pad,
    bucket_size,
    geometric_edges,
)
from tests.conftest import random_ctc_problem


def test_bucket_size():
    edges = (32, 64, 128)
    assert bucket_size(1, edges) == 32
    assert bucket_size(32, edges) == 32
    assert bucket_size(33, edges) == 64
    assert bucket_size(129, edges) == 136  # beyond ladder: 8-aligned


def test_geometric_edges_monotone():
    e = geometric_edges(32, 4096)
    assert all(a < b for a, b in zip(e, e[1:]))
    assert e[0] == 32 and e[-1] >= 4096
    assert all(x % 8 == 0 for x in e)


def test_bucket_pad_preserves_results(rng):
    B, T, S, V = 3, 45, 9, 12
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    base = np.asarray(ctc_loss(lp, tgt, il, tl, reduction="none", implementation="xla"))
    lp2, tgt2, il2, tl2 = bucket_pad(lp, tgt, il, tl)
    assert lp2.shape[0] in geometric_edges(32, 4096)
    got = np.asarray(ctc_loss(lp2, tgt2, il2, tl2, reduction="none", implementation="xla"))
    np.testing.assert_allclose(base, got, rtol=1e-6)


def test_one_compile_per_bucket(rng):
    """Batches with different raw lengths in the same bucket reuse one program."""
    spec = BucketSpec(t_edges=(64,), s_edges=(16,))

    @jax.jit
    def f(lp, tgt, il, tl):
        return ctc_loss(lp, tgt, il, tl, reduction="none", implementation="xla")

    for t_raw, s_raw in ((40, 9), (55, 12), (64, 16), (33, 5)):
        lp, tgt, il, tl = random_ctc_problem(rng, 2, t_raw, s_raw, 10)
        args = bucket_pad(lp, tgt, il, tl, spec)
        f(*map(jnp.asarray, args))
    assert f._cache_size() == 1
