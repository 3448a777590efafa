"""topk_pallas vs lax.top_k (interpret mode on CPU; TPU path is identical)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from end2end_tpu.ops.topk_pallas import topk_pallas


@pytest.mark.parametrize(
    "T,B,V,K",
    # odd K and K=1 exercise the pair-extraction loop's half-pair tail
    [(7, 3, 40, 5), (33, 9, 130, 16), (4, 1, 8, 8), (3, 2, 10, 1)],
)
def test_topk_matches_lax(rng, T, B, V, K):
    x = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
    v0, i0 = jax.lax.top_k(x, K)
    v1, i1 = topk_pallas(x, K, interpret=True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_topk_tie_break_matches_lax(rng):
    # Peaked distribution: uniform tail = massive exact ties.  lax.top_k
    # breaks ties by ascending index; the kernel must match bit for bit.
    T, B, V, K = 6, 2, 64, 16
    x = np.full((T, B, V), np.float32(np.log(0.003 / (V - 1))))
    x[:, :, 17] = np.float32(np.log(0.997))
    x = jnp.asarray(x)
    v0, i0 = jax.lax.top_k(x, K)
    v1, i1 = topk_pallas(x, K, interpret=True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_topk_k_equals_v_sorts(rng):
    x = jnp.asarray(rng.standard_normal((5, 2, 12)).astype(np.float32))
    v1, i1 = topk_pallas(x, 12, interpret=True)
    v0, i0 = jax.lax.top_k(x, 12)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    with pytest.raises(ValueError, match="k="):
        topk_pallas(x, 13, interpret=True)


def test_topk_vmem_guard():
    # huge rows can't fit the kernel's minimum block: explicit error here,
    # and the beam decoder's auto route falls back to lax.top_k
    import jax.numpy as jnp
    import pytest

    from end2end_tpu.ops.topk_pallas import (
        topk_pallas,
        topk_pallas_fits_vmem,
    )

    assert topk_pallas_fits_vmem(32, 1024)
    assert not topk_pallas_fits_vmem(64, 32768)
    with pytest.raises(ValueError, match="VMEM"):
        topk_pallas(jnp.zeros((4, 64, 32768), jnp.float32), 16,
                    interpret=True)
