"""Frontend + Conformer-CTC pipeline (BASELINE.json config 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from end2end_tpu.models.conformer import ConformerEncoder, ConvSubsampling
from end2end_tpu.models.frontend import log_mel_spectrogram, mel_filterbank, num_frames
from end2end_tpu.models.pipeline import ConformerCTCPipeline, PipelineConfig

CFG = PipelineConfig(vocab_size=8, d_model=32, num_layers=1, num_heads=2, n_mels=16)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(80, 400, 16000, 0.0, 8000.0)
    assert fb.shape == (201, 80)
    assert (fb >= 0).all()
    assert (fb.sum(axis=0) > 0).all()  # every mel bin covers some energy


def test_log_mel_shapes_and_lengths(rng):
    wav = rng.standard_normal((2, 16000)).astype(np.float32)
    feats = log_mel_spectrogram(wav, n_mels=16)
    frames = int(num_frames(16000))
    assert feats.shape == (2, frames, 16)
    assert np.isfinite(np.asarray(feats)).all()
    # sine at 1kHz must peak near the 1kHz mel bin region
    t = np.arange(16000) / 16000
    sine = np.sin(2 * np.pi * 1000 * t)[None].astype(np.float32)
    fs = np.asarray(log_mel_spectrogram(sine, n_mels=40))
    peak_bin = fs.mean(axis=(0, 1)).argmax()
    assert 5 < peak_bin < 25  # roughly the 1kHz neighborhood on a 40-mel scale


def test_subsample_lengths():
    lens = jnp.asarray([1, 2, 3, 4, 7, 8, 100])
    out = ConvSubsampling.out_length(lens)
    want = [-(-(-(-l // 2)) // 2) for l in [1, 2, 3, 4, 7, 8, 100]]
    want = [int(np.ceil(np.ceil(l / 2) / 2)) for l in [1, 2, 3, 4, 7, 8, 100]]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_encoder_shapes_and_padding_independence(rng):
    enc = ConformerEncoder(vocab_size=8, d_model=32, num_layers=1, num_heads=2)
    feats = rng.standard_normal((2, 40, 16)).astype(np.float32)
    lens = np.array([40, 24], np.int32)
    params = enc.init(jax.random.key(0), jnp.asarray(feats), jnp.asarray(lens))
    logits, out_len = enc.apply(params, jnp.asarray(feats), jnp.asarray(lens))
    assert logits.shape == (2, 10, 8)
    np.testing.assert_array_equal(np.asarray(out_len), [10, 6])
    # Changing padding frames of sample 1 must not change its valid logits.
    feats2 = feats.copy()
    feats2[1, 24:, :] = 123.0
    logits2, _ = enc.apply(params, jnp.asarray(feats2), jnp.asarray(lens))
    np.testing.assert_allclose(
        np.asarray(logits)[1, :6], np.asarray(logits2)[1, :6], rtol=2e-4, atol=2e-5
    )


def test_pipeline_loss_and_decode(rng):
    pipe = ConformerCTCPipeline(CFG)
    wav = rng.standard_normal((2, 4000)).astype(np.float32)
    ns = np.array([4000, 3000], np.int32)
    params = pipe.init(jax.random.key(0), wav, ns)
    tgt = rng.integers(1, 8, (2, 4)).astype(np.int32)
    tl = np.array([4, 2], np.int32)
    loss = jax.jit(lambda p: pipe.loss(p, wav, ns, tgt, tl))(params)
    assert np.isfinite(float(loss))
    toks, lens, scores = jax.jit(lambda p: pipe.decode(p, wav, ns))(params)
    assert toks.shape[0] == 2
    btoks, blens, bscores = jax.jit(lambda p: pipe.decode(p, wav, ns, beam_width=4))(params)
    assert btoks.shape[0] == 2
    # beam best score should not be worse than greedy's best-path bound
    assert np.all(np.asarray(bscores) > -1e5)


def test_pipeline_overfits_tiny_batch(rng):
    """End-to-end trainability: adamw on one tiny batch drives the loss down."""
    pipe = ConformerCTCPipeline(CFG)
    wav = rng.standard_normal((2, 2400)).astype(np.float32)
    ns = np.array([2400, 2400], np.int32)
    tgt = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    tl = np.array([3, 3], np.int32)
    params = pipe.init(jax.random.key(1), wav, ns)
    opt = optax.adamw(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(
            lambda p: pipe.loss(p, wav, ns, tgt, tl, implementation="xla")
        )(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(15):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses


def test_ocr_recognizer_shapes_and_training(rng):
    """OCR family (BASELINE config 3): shapes, padding independence, and a
    few training steps with CTC loss + beam-10 decode."""
    import optax

    from end2end_tpu import beam_search_decode, ctc_loss
    from end2end_tpu.models.ocr import OCRRecognizer

    V = 12
    model = OCRRecognizer(vocab_size=V, d_model=32, num_layers=1, num_heads=2)
    imgs = rng.standard_normal((2, 16, 48)).astype(np.float32)
    widths = np.array([48, 32], np.int32)
    params = model.init(jax.random.key(0), jnp.asarray(imgs), jnp.asarray(widths))
    logits, out_w = model.apply(params, jnp.asarray(imgs), jnp.asarray(widths))
    assert logits.shape == (2, 12, V)
    np.testing.assert_array_equal(np.asarray(out_w), [12, 8])

    # padding-content independence
    imgs2 = imgs.copy()
    imgs2[1, :, 32:] = 55.0
    logits2, _ = model.apply(params, jnp.asarray(imgs2), jnp.asarray(widths))
    np.testing.assert_allclose(
        np.asarray(logits)[1, :8], np.asarray(logits2)[1, :8], rtol=2e-4, atol=2e-5
    )

    # trains + decodes with beam width 10
    tgt = np.array([[1, 2, 3], [4, 5, 0]], np.int32)
    tl = np.array([3, 2], np.int32)
    opt = optax.adamw(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            lg, ow = model.apply(p, jnp.asarray(imgs), jnp.asarray(widths))
            lp = jnp.moveaxis(jax.nn.log_softmax(lg, -1), 0, 1)
            return ctc_loss(lp, tgt, ow, tl, implementation="xla")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(12):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    lg, ow = model.apply(params, jnp.asarray(imgs), jnp.asarray(widths))
    lp = jnp.moveaxis(jax.nn.log_softmax(lg, -1), 0, 1)
    toks, lens, scores = beam_search_decode(lp, ow, beam_width=10)
    assert toks.shape[:2] == (2, 10)


def test_checkpoint_save_restore(rng, tmp_path):
    """Checkpoint/resume (SURVEY.md §7): params round-trip through orbax."""
    from end2end_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    pipe = ConformerCTCPipeline(CFG)
    wav = rng.standard_normal((1, 2400)).astype(np.float32)
    params = pipe.init(jax.random.key(0), wav)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    fresh = pipe.init(jax.random.key(99), wav)  # different init
    restored = restore_checkpoint(path, fresh)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        restored,
    )


def test_alphabets():
    from end2end_tpu.utils.text import Alphabet, asr_alphabet, ocr_alphabet

    a = asr_alphabet()
    assert len(a) == 29
    ids = a.encode("hello world")
    assert a.decode(ids) == "hello world"
    assert a.decode([0, 8, 0, 9, -1, 99]) == "hi"
    o = ocr_alphabet()
    assert len(o) == 96
    assert o.decode(o.encode("Hello, World! 42")) == "Hello, World! 42"


def test_long_form_streaming(rng):
    """Chunked long-form transcription (config 5): chunking arithmetic and
    consistency with direct decoding for audio fitting in one chunk."""
    from end2end_tpu.models.streaming import chunk_waveform, transcribe_long_form

    # chunking arithmetic
    wav = rng.standard_normal(10000).astype(np.float32)
    chunks, valid = chunk_waveform(wav, 4000, 800)
    assert chunks.shape == (3, 4000)
    np.testing.assert_array_equal(valid, [4000, 4000, 3600])
    np.testing.assert_allclose(chunks[1, :800], wav[3200:4000])  # overlap

    pipe = ConformerCTCPipeline(CFG)
    short = rng.standard_normal(3200).astype(np.float32)
    params = pipe.init(jax.random.key(0), short[None], np.array([3200]))

    # single-chunk long-form == direct pipeline decode
    toks, length, score = transcribe_long_form(
        pipe, params, short, chunk_seconds=0.5, overlap_seconds=0.05
    )
    dtoks, dlens, dscores = pipe.decode(params, short[None], np.array([3200]))
    np.testing.assert_array_equal(
        np.asarray(toks)[:length], np.asarray(dtoks)[0, : int(dlens[0])]
    )

    # genuinely multi-chunk long audio decodes without error, beam + greedy
    long = rng.standard_normal(40000).astype(np.float32)
    gt, gl, gs = transcribe_long_form(pipe, params, long, 0.5, 0.05)
    bt, bl, bs = transcribe_long_form(pipe, params, long, 0.5, 0.05, beam_width=4)
    assert gl >= 0 and bl >= 0 and np.isfinite(gs) and np.isfinite(bs)


def test_encoder_bucket_shape_invariance(rng):
    """Same sample padded to DIFFERENT bucket sizes must give identical valid
    logits — padding amount, not just padding content, must be inert."""
    # T=18 is deliberately NOT a multiple of 4: XLA 'SAME' padding would
    # shift the stride-2 alignment with input parity (regression: the
    # subsampler uses explicit symmetric padding instead).
    enc = ConformerEncoder(vocab_size=8, d_model=32, num_layers=1, num_heads=2)
    feats = rng.standard_normal((1, 18, 16)).astype(np.float32)
    lens = np.array([18], np.int32)
    params = enc.init(jax.random.key(0), jnp.asarray(feats), jnp.asarray(lens))
    lg1, ol1 = enc.apply(params, jnp.asarray(feats), jnp.asarray(lens))
    for pad_to in (30, 48):
        feats_pad = np.concatenate(
            [feats, np.zeros((1, pad_to - 18, 16), np.float32)], axis=1
        )
        lg2, ol2 = enc.apply(params, jnp.asarray(feats_pad), jnp.asarray(lens))
        assert int(ol1[0]) == int(ol2[0]) == 5
        np.testing.assert_allclose(
            np.asarray(lg1)[0, :5], np.asarray(lg2)[0, :5], rtol=2e-4, atol=1e-5
        )


def test_long_form_incremental_equals_stitched(rng):
    """transcribe_long_form_streaming (encode+decode per chunk, bounded
    latency) must reproduce the stitched-lattice transcribe_long_form
    exactly — same trims, and the streaming decoders are exact."""
    from end2end_tpu.models.streaming import (
        transcribe_long_form,
        transcribe_long_form_streaming,
    )

    pipe = ConformerCTCPipeline(CFG)
    short = rng.standard_normal(3200).astype(np.float32)
    params = pipe.init(jax.random.key(0), short[None], np.array([3200]))
    long = rng.standard_normal(40000).astype(np.float32)

    for bw in (0, 4):
        want = transcribe_long_form(pipe, params, long, 0.5, 0.05,
                                    beam_width=bw)
        partials = []
        got = transcribe_long_form_streaming(
            pipe, params, long, 0.5, 0.05, beam_width=bw,
            partial_cb=lambda t, l, i: partials.append((i, l)),
        )
        assert int(got[1]) == int(want[1]), bw
        np.testing.assert_array_equal(
            np.asarray(got[0])[: got[1]], np.asarray(want[0])[: want[1]]
        )
        np.testing.assert_allclose(float(got[2]), float(want[2]), atol=1e-3)
        assert len(partials) == 6  # one live update per chunk
        assert [i for i, _ in partials] == list(range(6))
        assert partials[-1][1] == int(got[1])
