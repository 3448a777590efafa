"""Multi-chip batch sharding on the virtual 8-device CPU mesh.

SURVEY.md §5.2 item 6: only batch sharding exists (the loss is per-sample);
assert sharded == unsharded for loss, grad, and decode, and that GSPMD-style
plain-jit on sharded inputs also works.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from end2end_tpu import ctc_loss, greedy_decode
from end2end_tpu.parallel.sharding import (
    ctc_loss_data_parallel,
    greedy_decode_data_parallel,
    make_mesh,
    shard_batch,
)
from tests.conftest import random_ctc_problem

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs_devices
@pytest.mark.parametrize("reduction", ["none", "mean", "sum"])
def test_data_parallel_loss_matches(rng, reduction):
    B, T, S, V = 16, 30, 8, 12
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    mesh = make_mesh(8)
    args = shard_batch(mesh, jnp.asarray(lp), tgt, il, tl)
    got = jax.jit(
        lambda *a: ctc_loss_data_parallel(*a, mesh=mesh, reduction=reduction)
    )(*args)
    want = ctc_loss(lp, tgt, il, tl, reduction=reduction, implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


@needs_devices
def test_data_parallel_grad_matches(rng):
    B, T, S, V = 8, 24, 6, 10
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    mesh = make_mesh(8)
    args = shard_batch(mesh, jnp.asarray(lp), tgt, il, tl)

    g_sharded = jax.jit(
        jax.grad(lambda x: ctc_loss_data_parallel(x, *args[1:], mesh=mesh))
    )(args[0])
    g_local = jax.grad(
        lambda x: ctc_loss(x, tgt, il, tl, reduction="mean", implementation="xla")
    )(jnp.asarray(lp))
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_local), rtol=1e-5, atol=1e-7
    )


@needs_devices
def test_gspmd_plain_jit_on_sharded_inputs(rng):
    """No shard_map at all: jit partitions from input shardings."""
    B, T, S, V = 16, 20, 5, 9
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    mesh = make_mesh(8)
    args = shard_batch(mesh, jnp.asarray(lp), tgt, il, tl)
    f = jax.jit(lambda *a: ctc_loss(*a, reduction="none", implementation="xla"))
    got = f(*args)
    want = ctc_loss(lp, tgt, il, tl, reduction="none", implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@needs_devices
def test_data_parallel_greedy(rng):
    B, T, V = 16, 25, 8
    lp, _, il, _ = random_ctc_problem(rng, B, T, 5, V)
    mesh = make_mesh(8)
    s_lp, _, s_il, _ = shard_batch(mesh, jnp.asarray(lp), np.zeros((B, 1), np.int32), il, il)
    toks, lens, scores = jax.jit(
        lambda a, b: greedy_decode_data_parallel(a, b, mesh=mesh)
    )(s_lp, s_il)
    toks0, lens0, scores0 = greedy_decode(lp, il)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks0))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens0))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores0), rtol=1e-6)


@needs_devices
def test_uneven_batch_raises(rng):
    B, T, S, V = 6, 10, 3, 5
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="divide evenly"):
        ctc_loss_data_parallel(jnp.asarray(lp), tgt, il, tl, mesh=mesh)


@needs_devices
def test_time_parallel_loss_matches_sequential(rng):
    """Sequence/context parallelism: T sharded over the mesh (SURVEY.md §3.3).

    The per-chunk L x L log-semiring operators compose associatively; the
    result must match the sequential scan."""
    from end2end_tpu.parallel.time_parallel import ctc_nll_time_parallel
    from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla

    B, T, S, V = 4, 64, 6, 10
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("time",))
    got = jax.jit(
        lambda x: ctc_nll_time_parallel(x, tgt, il, tl, mesh=mesh)
    )(jnp.asarray(lp))
    want = ctc_nll_xla(jnp.asarray(lp), tgt, il, tl, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@needs_devices
def test_time_parallel_repeated_labels_and_variable_lengths(rng):
    from end2end_tpu.parallel.time_parallel import ctc_nll_time_parallel
    from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla

    B, T, V = 2, 32, 6
    lp, _, _, _ = random_ctc_problem(rng, B, T, 4, V)
    tgt = np.array([[2, 2, 3, 3], [1, 1, 1, 4]], dtype=np.int32)
    tl = np.array([4, 3], np.int32)
    il = np.array([32, 21], np.int32)  # length NOT aligned to chunk edges
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("time",))
    got = jax.jit(
        lambda x: ctc_nll_time_parallel(x, tgt, il, tl, mesh=mesh)
    )(jnp.asarray(lp))
    want = ctc_nll_xla(jnp.asarray(lp), tgt, il, tl, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@needs_devices
def test_time_parallel_grad_matches_sequential(rng):
    """SURVEY.md §3.3 SP/CP row, round-2: the time-sharded loss is
    TRAINABLE — its fused gradient (per-chunk boundary states from the
    composed operators + local alpha/beta scans) must match the sequential
    custom-VJP gradient on the 8-device mesh."""
    from end2end_tpu.parallel.time_parallel import ctc_nll_time_parallel
    from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla

    B, T, S, V = 3, 64, 5, 8
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    il = np.array([64, 43, 29], np.int32)  # lengths across chunk boundaries
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("time",))

    def tp_loss(x):
        return jnp.sum(ctc_nll_time_parallel(x, tgt, il, tl, mesh=mesh) * 1.0)

    def seq_loss(x):
        return jnp.sum(ctc_nll_xla(x, tgt, il, tl, 0))

    g_tp = jax.jit(jax.grad(tp_loss))(jnp.asarray(lp))
    g_seq = jax.jit(jax.grad(seq_loss))(jnp.asarray(lp))
    np.testing.assert_allclose(
        np.asarray(g_tp), np.asarray(g_seq), rtol=1e-4, atol=2e-4
    )

    # weighted upstream gradient scales per sample
    w = jnp.asarray([0.5, 2.0, -1.0], jnp.float32)
    g_tp_w = jax.jit(
        jax.grad(lambda x: jnp.sum(
            ctc_nll_time_parallel(x, tgt, il, tl, mesh=mesh) * w))
    )(jnp.asarray(lp))
    g_seq_w = jax.jit(
        jax.grad(lambda x: jnp.sum(ctc_nll_xla(x, tgt, il, tl, 0) * w))
    )(jnp.asarray(lp))
    np.testing.assert_allclose(
        np.asarray(g_tp_w), np.asarray(g_seq_w), rtol=1e-4, atol=2e-4
    )


@needs_devices
def test_time_parallel_grad_impossible_sample_is_zero(rng):
    from end2end_tpu.parallel.time_parallel import ctc_nll_time_parallel

    B, T, V = 2, 16, 5
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    tgt = np.array([[1, 2, 1], [2, 2, 2]], np.int32)
    tl = np.array([3, 3], np.int32)
    il = np.array([16, 4], np.int32)  # sample 1: T=4 < needed 7 -> inf loss
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("time",))
    nll = ctc_nll_time_parallel(jnp.asarray(lp), tgt, il, tl, mesh=mesh)
    assert np.isinf(np.asarray(nll)[1])
    g = jax.jit(
        jax.grad(lambda x: jnp.sum(jnp.where(
            jnp.isfinite(ctc_nll_time_parallel(x, tgt, il, tl, mesh=mesh)),
            ctc_nll_time_parallel(x, tgt, il, tl, mesh=mesh), 0.0)))
    )(jnp.asarray(lp))
    g = np.asarray(g)
    assert np.all(g[:, 1, :] == 0.0)  # impossible sample: zero gradient
    assert np.isfinite(g).all()


@needs_devices
def test_vocab_parallel_loss_and_grad_match_sequential(rng):
    """Tensor parallelism done the CTC way: the VOCAB dim sharded over the
    mesh (SURVEY.md §3.3 TP row).  Loss assembles the (T, N, L) lattice with
    one psum; the gradient is emitted shard-local.  Both must equal the
    sequential path bit-for-bit (the assembly is exact)."""
    from end2end_tpu.parallel.vocab_parallel import ctc_nll_vocab_parallel
    from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla

    B, T, S, V = 3, 40, 6, 64  # V/8 = 8 per device
    lp, tgt, il, tl = random_ctc_problem(rng, B, T, S, V)
    il = np.array([40, 25, 33], np.int32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))

    nll_vp = jax.jit(
        lambda x: ctc_nll_vocab_parallel(x, tgt, il, tl, mesh=mesh)
    )(jnp.asarray(lp))
    nll_seq = ctc_nll_xla(jnp.asarray(lp), tgt, il, tl, 0)
    np.testing.assert_array_equal(np.asarray(nll_vp), np.asarray(nll_seq))

    w = jnp.asarray([1.0, 0.5, 2.0], jnp.float32)
    g_vp = jax.jit(jax.grad(
        lambda x: jnp.sum(ctc_nll_vocab_parallel(x, tgt, il, tl, mesh=mesh) * w)
    ))(jnp.asarray(lp))
    g_seq = jax.jit(jax.grad(
        lambda x: jnp.sum(ctc_nll_xla(x, tgt, il, tl, 0) * w)
    ))(jnp.asarray(lp))
    np.testing.assert_array_equal(np.asarray(g_vp), np.asarray(g_seq))


@needs_devices
def test_vocab_parallel_impossible_and_blank_ownership(rng):
    """Blank lives on one shard; impossible samples produce inf loss and
    zero grad; V not divisible raises."""
    from end2end_tpu.parallel.vocab_parallel import ctc_nll_vocab_parallel

    B, T, V = 2, 12, 32
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    tgt = np.array([[5, 5, 5], [9, 9, 2]], np.int32)
    tl = np.array([3, 3], np.int32)
    il = np.array([12, 3], np.int32)  # sample 1: adjacent repeat needs >= 4
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    nll = ctc_nll_vocab_parallel(jnp.asarray(lp), tgt, il, tl, mesh=mesh)
    assert np.isfinite(np.asarray(nll)[0]) and np.isinf(np.asarray(nll)[1])
    g = jax.jit(jax.grad(lambda x: jnp.sum(jnp.where(
        jnp.isfinite(ctc_nll_vocab_parallel(x, tgt, il, tl, mesh=mesh)),
        ctc_nll_vocab_parallel(x, tgt, il, tl, mesh=mesh), 0.0))))(jnp.asarray(lp))
    assert np.all(np.asarray(g)[:, 1, :] == 0.0)

    import pytest

    with pytest.raises(ValueError, match="divide"):
        ctc_nll_vocab_parallel(jnp.asarray(lp)[:, :, :30], tgt, il, tl, mesh=mesh)


@needs_devices
def test_vocab_parallel_greedy_matches_sequential(rng):
    """Vocab-sharded greedy decode == unsharded, exactly (incl. argmax
    tie-breaks via the pmax/pmin winner merge)."""
    from end2end_tpu.ops.greedy import greedy_decode
    from end2end_tpu.parallel.vocab_parallel import (
        greedy_decode_vocab_parallel,
    )

    B, T, V = 5, 30, 64
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    # inject exact ties to exercise the smallest-id tie-break across shards
    lp[4, 0, 3] = lp[4, 0, 40] = lp[4, 0].max() + 1.0
    lp[9, 2, 8] = lp[9, 2, 9] = lp[9, 2].max() + 1.0
    il = rng.integers(T // 2, T + 1, B).astype(np.int32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    got = greedy_decode_vocab_parallel(jnp.asarray(lp), il, mesh=mesh)
    want = greedy_decode(jnp.asarray(lp), il)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_devices
def test_vocab_parallel_beam_prep_matches_global_topk(rng):
    """The all_gather + merge reproduces global lax.top_k exactly,
    tie-breaks included."""
    from end2end_tpu.parallel.vocab_parallel import (
        beam_topk_prep_vocab_parallel,
    )

    B, T, V, K = 3, 12, 64, 10
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    lp[2, 1, 5] = lp[2, 1, 37]  # cross-shard exact tie
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    lpk, ck, lpb = beam_topk_prep_vocab_parallel(jnp.asarray(lp), mesh, K)
    wv, wi = jax.lax.top_k(jnp.asarray(lp), K)
    np.testing.assert_array_equal(np.asarray(lpk), np.asarray(wv))
    np.testing.assert_array_equal(np.asarray(ck), np.asarray(wi))
    np.testing.assert_array_equal(np.asarray(lpb), np.asarray(lp)[:, :, 0])


@needs_devices
def test_vocab_parallel_beam_matches_candidate_decode(rng):
    """Vocab-sharded beam decode == the single-device candidate-only scan
    on the same merged top-K; and at K >= V it equals the full XLA scan
    (candidate-only mode is exact with full-vocab candidates)."""
    from end2end_tpu.ops.beam_search import (
        beam_search_decode,
        beam_search_from_topk,
    )
    from end2end_tpu.parallel.vocab_parallel import (
        beam_search_decode_vocab_parallel,
    )

    B, T, V, W = 3, 14, 16, 6
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    lp = np.asarray(lp, np.float32)
    il = np.array([14, 9, 12], np.int32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))

    # exact regime: K = V
    got = beam_search_decode_vocab_parallel(
        jnp.asarray(lp), il, mesh=mesh, beam_width=W, max_symbols=16
    )
    want = beam_search_decode(lp, il, beam_width=W, max_symbols=16,
                              implementation="xla")
    gt, gl, gs = [np.asarray(a) for a in got]
    wt, wl, ws = [np.asarray(a) for a in want]
    np.testing.assert_array_equal(gl, wl)
    np.testing.assert_allclose(gs, ws, atol=1e-5, rtol=1e-6)
    for b in range(B):
        for w in range(W):
            if np.isfinite(ws[b, w]):
                np.testing.assert_array_equal(gt[b, w, : gl[b, w]],
                                              wt[b, w, : wl[b, w]])

    # pruned regime: equals the same candidate-only decode run unsharded
    K = 6
    got_p = beam_search_decode_vocab_parallel(
        jnp.asarray(lp), il, mesh=mesh, beam_width=W, prune_k=K,
        max_symbols=16,
    )
    lpk, ck = jax.lax.top_k(jnp.asarray(lp), K)
    want_p = beam_search_from_topk(
        lpk, ck, jnp.asarray(lp)[:, :, 0], il, W, 0, 16
    )
    for a, b in zip(got_p, want_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@needs_devices
def test_vocab_parallel_beam_token_min_logp_matches_unsharded(rng):
    """token_min_logp applied to the MERGED global candidates: the
    vocab-sharded decode equals the unsharded decode with the same
    threshold exactly (same masked candidate set, same stay semantics)."""
    from end2end_tpu.ops.beam_search import beam_search_decode
    from end2end_tpu.parallel.vocab_parallel import (
        beam_search_decode_vocab_parallel,
    )

    B, T, V, W = 3, 14, 16, 6
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    lp = np.asarray(lp, np.float32)
    il = np.array([14, 9, 12], np.int32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    got = beam_search_decode_vocab_parallel(
        jnp.asarray(lp), il, mesh=mesh, beam_width=W, max_symbols=16,
        token_min_logp=-2.5,
    )
    want = beam_search_decode(lp, il, beam_width=W, max_symbols=16,
                              implementation="xla", token_min_logp=-2.5)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-6)


@needs_devices
def test_vocab_parallel_beam_with_lm(rng):
    """LM fusion over the vocab-sharded decode (tables replicated; scoring
    touches only the merged candidates) == unsharded XLA scan at K = V."""
    from end2end_tpu.ops.beam_search import beam_search_decode
    from end2end_tpu.ops.lm import NGramLM, bigram_from_counts
    from end2end_tpu.parallel.vocab_parallel import (
        beam_search_decode_vocab_parallel,
    )

    B, T, V, W = 2, 12, 16, 4
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    lp = np.asarray(lp, np.float32)
    il = np.full(B, T, np.int32)
    lm = NGramLM(bigram_from_counts(rng.integers(0, 10, (V, V))))
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    kw = dict(beam_width=W, lm=lm, lm_alpha=0.7, lm_beta=0.2, max_symbols=16)
    got = beam_search_decode_vocab_parallel(jnp.asarray(lp), il, mesh=mesh,
                                            **kw)
    want = beam_search_decode(lp, il, implementation="xla", **kw)
    gt, gl, gs = [np.asarray(a) for a in got]
    wt, wl, ws = [np.asarray(a) for a in want]
    np.testing.assert_array_equal(gl, wl)
    np.testing.assert_allclose(gs, ws, atol=1e-5, rtol=1e-6)


@needs_devices
def test_vocab_parallel_beam_pallas_route(rng):
    """The Pallas-kernel route of the vocab-sharded decode (the on-TPU
    default) == the candidate-only XLA scan, both on the merged top-K."""
    from end2end_tpu.parallel.vocab_parallel import (
        beam_search_decode_vocab_parallel,
    )

    B, T, V, W = 3, 12, 16, 4
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    il = np.array([12, 8, 10], np.int32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    for K in (None, 6):
        got = beam_search_decode_vocab_parallel(
            jnp.asarray(lp), il, mesh=mesh, beam_width=W, prune_k=K,
            max_symbols=10, implementation="pallas",
        )
        want = beam_search_decode_vocab_parallel(
            jnp.asarray(lp), il, mesh=mesh, beam_width=W, prune_k=K,
            max_symbols=10, implementation="xla",
        )
        gt, gl, gs = [np.asarray(a) for a in got]
        wt, wl, ws = [np.asarray(a) for a in want]
        np.testing.assert_array_equal(gl, wl)
        np.testing.assert_allclose(gs, ws, atol=5e-4, rtol=2e-4)
        for b in range(B):
            for w in range(W):
                if np.isfinite(ws[b, w]):
                    np.testing.assert_array_equal(
                        gt[b, w, : gl[b, w]], wt[b, w, : wl[b, w]]
                    )


@needs_devices
def test_streaming_state_shards_over_batch(rng):
    """The streaming decoder state is an ordinary pytree: shard it with
    P('data') and step with sharded chunks under plain jit (GSPMD) —
    results equal the unsharded stream."""
    from jax.sharding import NamedSharding
    from end2end_tpu import StreamingBeamDecoder, beam_search_decode

    T, B, V, W = 12, 16, 6, 4
    lp = np.asarray(
        random_ctc_problem(rng, B, T, 3, V)[0], np.float32
    )
    il = np.full(B, T, np.int32)
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P(None, "data", None))

    dec = StreamingBeamDecoder(beam_width=W, max_symbols=10)
    state = jax.device_put(
        dec.init(B),
        jax.tree.map(lambda x: NamedSharding(mesh, P("data")), dec.init(B)),
    )
    for lo, hi in ((0, 6), (6, 12)):
        chunk = jax.device_put(jnp.asarray(lp[lo:hi]), shard)
        state = dec.step(state, chunk, np.full(B, hi - lo, np.int32))
    got = [np.asarray(a) for a in dec.finish(state)]
    want = [np.asarray(a) for a in beam_search_decode(
        lp, il, beam_width=W, max_symbols=10, implementation="xla")]
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_allclose(got[2], want[2], atol=1e-5)
    for b in range(B):
        for w in range(W):
            if np.isfinite(want[2][b, w]):
                np.testing.assert_array_equal(
                    got[0][b, w, : got[1][b, w]],
                    want[0][b, w, : want[1][b, w]],
                )


@needs_devices
def test_vocab_parallel_beam_with_neural_lm_matches_unsharded(rng):
    """Protocol LMs ride the vocab-sharded decode unchanged (the scan runs
    on the merged replicated candidates): a GRU NeuralLM decode sharded
    over the vocab axis == the unsharded exact-fusion scan."""
    from end2end_tpu import NeuralLM
    from end2end_tpu.ops.beam_search import beam_search_decode
    from end2end_tpu.ops.neural_lm import random_gru_params
    from end2end_tpu.parallel.vocab_parallel import (
        beam_search_decode_vocab_parallel,
    )

    B, T, V, W = 3, 12, 16, 4
    lm = NeuralLM.gru(random_gru_params(rng, V, emb_dim=6, hidden_dim=8),
                      eos_id=2)
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    lp = np.asarray(lp, np.float32)
    il = np.array([12, 8, 10], np.int32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    got = beam_search_decode_vocab_parallel(
        jnp.asarray(lp), il, mesh=mesh, beam_width=W, max_symbols=12,
        lm=lm, lm_alpha=0.8, lm_beta=0.3,
    )
    want = beam_search_decode(lp, il, beam_width=W, max_symbols=12, lm=lm,
                              lm_alpha=0.8, lm_beta=0.3,
                              implementation="xla")
    gt, gl, gs = [np.asarray(a) for a in got]
    wt, wl, ws = [np.asarray(a) for a in want]
    np.testing.assert_array_equal(gl, wl)
    np.testing.assert_allclose(gs, ws, atol=1e-5, rtol=1e-6)
    for b in range(B):
        for w in range(W):
            if np.isfinite(ws[b, w]):
                np.testing.assert_array_equal(gt[b, w, : gl[b, w]],
                                              wt[b, w, : wl[b, w]])


@needs_devices
def test_vocab_parallel_chunked_word_lm_matches_unsharded(rng):
    """implementation='chunked' under vocab sharding — the production
    large-V BPE + word-LM regime: the merged top-K prep feeds the chunked
    kernel path on replicated candidates, so sharded == unsharded exactly
    (same candidate set, same replay)."""
    from end2end_tpu.ops.beam_chunked import beam_search_chunked_lm
    from end2end_tpu.ops.lm import NGramLM, WordNGramLM, bigram_from_counts
    from end2end_tpu.parallel.vocab_parallel import (
        beam_search_decode_vocab_parallel,
    )

    B, T, V, W, K = 3, 14, 16, 4, 8
    lp, _, _, _ = random_ctc_problem(rng, B, T, 3, V)
    lp = np.asarray(lp, np.float32)
    il = np.array([14, 9, 12], np.int32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))

    words = [(1,), (2,), (1, 2), (2, 1)]
    wv = len(words)
    bigram = np.log(np.maximum(rng.random((wv, wv)).astype(np.float32), 1e-3))
    start = rng.standard_normal(wv).astype(np.float32)
    lm = WordNGramLM(words, bigram, start, space_id=3,
                     unigram_logp=rng.standard_normal(wv).astype(np.float32),
                     unk_logp=-13.0)
    guide = NGramLM(bigram_from_counts(rng.integers(0, 10, (V, V))))

    for g in (None, guide):
        got = beam_search_decode_vocab_parallel(
            jnp.asarray(lp), il, mesh=mesh, beam_width=W, prune_k=K,
            max_symbols=16, lm=lm, lm_alpha=0.7, lm_beta=0.3,
            implementation="chunked", lm_chunk_t=5, guide_lm=g,
        )
        want = beam_search_chunked_lm(
            lp, il, beam_width=W, prune_k=K, max_symbols=16, lm=lm,
            lm_alpha=0.7, lm_beta=0.3, chunk_t=5, guide_lm=g,
        )
        gt, gl, gs = [np.asarray(a) for a in got]
        wt, wl, ws = [np.asarray(a) for a in want]
        np.testing.assert_array_equal(gt, wt)
        np.testing.assert_array_equal(gl, wl)
        np.testing.assert_allclose(gs, ws, atol=1e-6)

    # non-chunked implementations reject guide_lm
    import pytest

    with pytest.raises(ValueError):
        beam_search_decode_vocab_parallel(
            jnp.asarray(lp), il, mesh=mesh, beam_width=W, lm=lm,
            guide_lm=guide,
        )


@needs_devices
@pytest.mark.parametrize("reduction", ["none", "mean", "sum"])
def test_rnnt_data_parallel_loss_matches(rng, reduction):
    from end2end_tpu.ops.rnnt_loss import rnnt_loss
    from end2end_tpu.parallel.sharding import rnnt_loss_data_parallel

    B, T, U, V = 8, 12, 4, 9
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    tgt = rng.integers(1, V, (B, U)).astype(np.int32)
    il = rng.integers(T // 2, T + 1, (B,)).astype(np.int32)
    ul = rng.integers(1, U + 1, (B,)).astype(np.int32)
    mesh = make_mesh(8)
    got = jax.jit(lambda *a: rnnt_loss_data_parallel(
        *a, mesh=mesh, reduction=reduction))(
            jnp.asarray(logits), jnp.asarray(tgt), jnp.asarray(il),
            jnp.asarray(ul))
    want = rnnt_loss(logits, tgt, il, ul, reduction=reduction)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@needs_devices
def test_rnnt_data_parallel_grad_matches(rng):
    from end2end_tpu.ops.rnnt_loss import rnnt_loss
    from end2end_tpu.parallel.sharding import rnnt_loss_data_parallel

    B, T, U, V = 8, 10, 3, 7
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    tgt = rng.integers(1, V, (B, U)).astype(np.int32)
    il = np.full(B, T, np.int32)
    ul = np.full(B, U, np.int32)
    mesh = make_mesh(8)
    g_sharded = jax.jit(jax.grad(lambda x: rnnt_loss_data_parallel(
        x, jnp.asarray(tgt), jnp.asarray(il), jnp.asarray(ul),
        mesh=mesh)))(jnp.asarray(logits))
    g_local = jax.grad(lambda x: rnnt_loss(x, tgt, il, ul))(
        jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local),
                               rtol=1e-5, atol=1e-7)


def _rnnt_decode_setup(rng, n=8, t=20, v=13, h_enc=12, emb=8, hid=12,
                       jdim=12):
    from functools import partial

    from end2end_tpu.ops.neural_lm import gru_step, random_gru_params
    from end2end_tpu.ops.rnnt_decode import FactoredAdditiveJoint

    enc = jnp.asarray(rng.normal(size=(n, t, h_enc)).astype(np.float32))
    params = jax.tree.map(jnp.asarray,
                          random_gru_params(rng, v, emb_dim=emb,
                                            hidden_dim=hid))

    def w(*s):
        return jnp.asarray(
            (rng.standard_normal(s) * 0.5 / np.sqrt(s[0])).astype(np.float32))

    joint = FactoredAdditiveJoint(w(h_enc, jdim), w(hid, jdim),
                                  0.1 * w(jdim), w(jdim, v), 0.1 * w(v))
    pred = partial(gru_step, params)
    init_h = jnp.zeros((hid,), jnp.float32)
    il = jnp.asarray(rng.integers(t // 2, t + 1, n).astype(np.int32))
    return enc, il, pred, init_h, joint


def _assert_decode_matches(ref, got, score_idx=2):
    for i, (a, b) in enumerate(zip(ref, got)):
        a, b = np.asarray(a), np.asarray(b)
        if i == score_idx:
            np.testing.assert_allclose(a, b, atol=1e-5)
        else:
            np.testing.assert_array_equal(a, b)


@needs_devices
def test_rnnt_data_parallel_greedy_matches(rng):
    from end2end_tpu.ops.rnnt_decode import rnnt_greedy_decode
    from end2end_tpu.parallel.sharding import (
        rnnt_greedy_decode_data_parallel)

    enc, il, pred, init_h, joint = _rnnt_decode_setup(rng)
    mesh = make_mesh(8)
    for kw in (dict(max_symbols=8), dict(max_symbols=8, lookahead=4),
               dict(max_symbols=8, return_timestamps=True)):
        ref = rnnt_greedy_decode(enc, il, pred, init_h, joint, **kw)
        got = rnnt_greedy_decode_data_parallel(enc, il, pred, init_h,
                                               joint, mesh, **kw)
        _assert_decode_matches(ref, got)


@needs_devices
def test_rnnt_data_parallel_beam_matches(rng):
    from end2end_tpu.ops.rnnt_decode import rnnt_beam_decode
    from end2end_tpu.parallel.sharding import rnnt_beam_decode_data_parallel

    enc, il, pred, init_h, joint = _rnnt_decode_setup(rng)
    mesh = make_mesh(8)
    for kw in (dict(beam_width=4, max_symbols=8),
               dict(beam_width=4, max_symbols=8, lookahead=4),
               dict(beam_width=2, max_symbols=6, prune_k=3,
                    return_timestamps=True)):
        ref = rnnt_beam_decode(enc, il, pred, init_h, joint, **kw)
        got = rnnt_beam_decode_data_parallel(enc, il, pred, init_h, joint,
                                             mesh, **kw)
        _assert_decode_matches(ref, got)


@needs_devices
def test_rnnt_data_parallel_beam_with_lm(rng):
    """Shallow-fusion LM tables replicate as shard_map constants; the LM
    state rides the per-sample carry, so DP stays exact."""
    from end2end_tpu.ops.lm import NGramLM, bigram_from_counts
    from end2end_tpu.ops.rnnt_decode import rnnt_beam_decode
    from end2end_tpu.parallel.sharding import rnnt_beam_decode_data_parallel

    enc, il, pred, init_h, joint = _rnnt_decode_setup(rng, v=9)
    lm = NGramLM(bigram_from_counts(rng.integers(0, 8, (9, 9))))
    mesh = make_mesh(8)
    kw = dict(beam_width=4, max_symbols=6, lm=lm, lm_alpha=0.5, lm_beta=0.1)
    ref = rnnt_beam_decode(enc, il, pred, init_h, joint, **kw)
    got = rnnt_beam_decode_data_parallel(enc, il, pred, init_h, joint,
                                         mesh, **kw)
    _assert_decode_matches(ref, got)


@needs_devices
def test_rnnt_streaming_state_shards_over_batch(rng):
    """The carried streaming state (cursors, predictor hidden, beams, frame
    history) lives batch-sharded on the mesh across step/finish."""
    from end2end_tpu.ops.streaming_decode import (
        StreamingRNNTBeamDecoder, StreamingRNNTGreedyDecoder)
    from end2end_tpu.parallel.sharding import DataParallelStreamingRNNT

    enc, il, pred, init_h, joint = _rnnt_decode_setup(rng)
    n, t_max, h_enc = enc.shape
    mesh = make_mesh(8)
    for dec in (StreamingRNNTGreedyDecoder(pred, init_h, joint,
                                           max_symbols=8),
                StreamingRNNTBeamDecoder(pred, init_h, joint, beam_width=4,
                                         max_symbols=8, lookahead=4)):
        dp = DataParallelStreamingRNNT(dec, mesh)
        init_args = (n,) if isinstance(dec, StreamingRNNTGreedyDecoder) \
            else (n, h_enc)
        st, st_r = dp.init(*init_args), dec.init(*init_args)
        # every state leaf is batch-sharded on the mesh
        for leaf in jax.tree.leaves(st):
            assert leaf.sharding.spec == P("data"), leaf.sharding
        for lo, hi in [(0, 7), (7, 14), (14, t_max)]:
            chunk = enc[:, lo:hi]
            cl = np.clip(np.asarray(il) - lo, 0, hi - lo).astype(np.int32)
            st = dp.step(st, chunk, cl)
            st_r = dec.step(st_r, chunk, cl)
        got = dp.finish(st, return_timestamps=True)
        ref = dec.finish(st_r, return_timestamps=True)
        _assert_decode_matches(ref, got)
