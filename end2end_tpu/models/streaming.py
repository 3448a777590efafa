"""Long-form audio inference by chunked encoding + stitched CTC decode
(BASELINE.json config 5: "fused CTC beam decode, B=8 long-form audio").

Arbitrarily long audio cannot ride one static shape; the TPU-native recipe:
  1. split the waveform into fixed-size overlapping chunks (one static
     encoder shape, reused for every chunk — no recompiles),
  2. encode all chunks as ONE batch (chunk axis = batch axis: the encoder is
     already batch-parallel),
  3. trim half the overlap from each side in encoder-frame units and
     concatenate the logits along time,
  4. run the (greedy or beam) decoder ONCE over the stitched lattice.

CTC's per-frame independence makes the stitch principled: only frames near
chunk edges lose context, and those are the trimmed ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.beam_search import beam_search_decode
from ..ops.greedy import greedy_decode
from .conformer import ConvSubsampling
from .frontend import num_frames


def chunk_waveform(waveform, chunk_samples: int, overlap_samples: int):
    """(num_samples,) -> (n_chunks, chunk_samples) with the given overlap;
    the tail chunk is zero-padded.  Returns (chunks, n_valid_samples)."""
    waveform = np.asarray(waveform, np.float32).reshape(-1)
    hop = chunk_samples - overlap_samples
    if hop <= 0:
        raise ValueError("overlap must be smaller than the chunk")
    n = max(1, int(np.ceil(max(len(waveform) - overlap_samples, 1) / hop)))
    chunks = np.zeros((n, chunk_samples), np.float32)
    valid = np.zeros(n, np.int32)
    for i in range(n):
        lo = i * hop
        piece = waveform[lo : lo + chunk_samples]
        chunks[i, : len(piece)] = piece
        valid[i] = len(piece)
    return chunks, valid




def _chunk_plan(pipe, waveform, chunk_seconds, overlap_seconds):
    """Shared chunking/trim arithmetic for both long-form paths — the
    stitched and streaming transcribers MUST consume identical trimmed
    lattice slices (their exactness equivalence depends on it).
    Returns (chunks, valid, lo_trim, hi_trim)."""
    c = pipe.config
    chunk_samples = int(chunk_seconds * c.sample_rate)
    overlap_samples = int(overlap_seconds * c.sample_rate)
    chunks, valid = chunk_waveform(waveform, chunk_samples, overlap_samples)
    ov_frames = int(
        np.asarray(ConvSubsampling.out_length(num_frames(overlap_samples, c.n_fft, c.hop_length)))
    )
    lo_trim = ov_frames // 2
    hi_trim = ov_frames - lo_trim
    return chunks, valid, lo_trim, hi_trim


def transcribe_long_form(
    pipe,
    params,
    waveform,
    chunk_seconds: float = 10.0,
    overlap_seconds: float = 1.0,
    beam_width: int = 0,
    blank: int = 0,
    **beam_kwargs,
):
    """Transcribe one long waveform with a ConformerCTCPipeline.

    Returns (tokens, length, score) for the stitched utterance (beam: best
    hypothesis).  Encoder runs once over the chunk batch; a single decode
    runs over the stitched lattice.
    """
    chunks, valid, lo_trim, hi_trim = _chunk_plan(
        pipe, waveform, chunk_seconds, overlap_seconds
    )
    n = chunks.shape[0]

    logits, out_len = pipe.encode(params, chunks, valid)  # (n, T', V)
    logits = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    out_len = np.asarray(out_len)

    pieces = []
    for i in range(n):
        lo = lo_trim if i > 0 else 0
        hi = out_len[i] - (hi_trim if i < n - 1 else 0)
        pieces.append(logits[i, lo:max(hi, lo)])
    lattice = np.concatenate(pieces, axis=0)[:, None, :]  # (T_total, 1, V)
    t_total = np.array([lattice.shape[0]], np.int32)

    if beam_width == 0:
        toks, lens, scores = greedy_decode(lattice, t_total, blank=blank)
        return toks[0], int(lens[0]), float(scores[0])
    toks, lens, scores = beam_search_decode(
        lattice, t_total, beam_width=beam_width, blank=blank, **beam_kwargs
    )
    return toks[0, 0], int(lens[0, 0]), float(scores[0, 0])


def transcribe_long_form_streaming(
    pipe,
    params,
    waveform,
    chunk_seconds: float = 10.0,
    overlap_seconds: float = 1.0,
    beam_width: int = 0,
    blank: int = 0,
    max_symbols: int = 512,
    partial_cb=None,
    **beam_kwargs,
):
    """Bounded-latency long-form transcription: encode each chunk as it
    arrives and ADVANCE the decoder immediately (ops/streaming_decode.py) —
    no full-lattice stitch, so latency is one chunk, not the utterance.

    Produces the SAME result as `transcribe_long_form` (identical trimmed
    lattice slices; the streaming decoders are exact vs one-shot).  After
    each chunk `partial_cb(tokens, length, chunk_index)` is called with the
    current best hypothesis (the pure mid-stream `finish()`), e.g. for live
    caption updates.  Returns (tokens, length, score) like the one-shot.
    """
    from ..ops.streaming_decode import (
        StreamingBeamDecoder,
        StreamingGreedyDecoder,
    )

    chunks, valid, lo_trim, hi_trim = _chunk_plan(
        pipe, waveform, chunk_seconds, overlap_seconds
    )
    n = chunks.shape[0]

    if beam_width == 0:
        dec = StreamingGreedyDecoder(blank=blank, max_symbols=max_symbols)
    else:
        dec = StreamingBeamDecoder(beam_width=beam_width, blank=blank,
                                   max_symbols=max_symbols, **beam_kwargs)
    state = dec.init(1)
    for i in range(n):
        # one static encoder shape, reused every chunk (no recompiles)
        logits, out_len = pipe.encode(params, chunks[i : i + 1], valid[i : i + 1])
        lp = jax.nn.log_softmax(logits, axis=-1)  # (1, T', V)
        lo = lo_trim if i > 0 else 0
        hi = max(int(out_len[0]) - (hi_trim if i < n - 1 else 0), lo)
        piece = jnp.moveaxis(lp[:, lo:hi], 0, 1)  # (Tc, 1, V)
        if piece.shape[0]:
            state = dec.step(state, piece,
                             np.array([piece.shape[0]], np.int32))
        if partial_cb is not None:
            toks, lens, _ = dec.finish(state)
            best = toks[0, 0] if beam_width else toks[0]
            blen = int(lens[0, 0]) if beam_width else int(lens[0])
            partial_cb(np.asarray(best)[:blen], blen, i)
    toks, lens, scores = dec.finish(state)
    if beam_width == 0:
        return toks[0], int(lens[0]), float(scores[0])
    return toks[0, 0], int(lens[0, 0]), float(scores[0, 0])


def transcribe_long_form_rnnt(
    model,
    params,
    feats,
    chunk_frames: int = 400,
    overlap_frames: int = 32,
    beam_width: int = 0,
    max_symbols: int = 512,
    partial_cb=None,
    lm=None,
    lm_alpha: float = 0.0,
    lm_beta: float = 0.0,
    prune_k=None,
):
    """Bounded-latency long-form TRANSDUCER transcription.

    The RNN-T analog of `transcribe_long_form_streaming`: split the
    feature sequence (T_f, F) into overlapping fixed-size chunks (one
    static encoder shape), encode each chunk as it "arrives", trim half
    the overlap in encoder frames, and ADVANCE the streaming transducer
    decoder (ops/streaming_decode.StreamingRNNT*Decoder) — latency is one
    chunk.  Result == the one-shot greedy/ALSD decode over the stitched
    trimmed encoder sequence (the streaming decoders are exact vs
    one-shot; tested in tests/test_rnnt_streaming.py).

    `partial_cb(tokens, length, chunk_index)` gets live partial
    hypotheses after each chunk (the pure mid-stream `finish()`).
    Returns (tokens, length, score) of the best hypothesis.
    """
    from ..ops.streaming_decode import (
        StreamingRNNTBeamDecoder,
        StreamingRNNTGreedyDecoder,
    )

    feats = np.asarray(feats, np.float32)
    if feats.ndim != 2:
        raise ValueError(f"feats must be (T_f, F), got {feats.shape}")
    hop = chunk_frames - overlap_frames
    if hop <= 0:
        raise ValueError("overlap must be smaller than the chunk")
    t_f = feats.shape[0]
    n = max(1, int(np.ceil(max(t_f - overlap_frames, 1) / hop)))
    sub = getattr(model.config, "subsample", False)
    ov_out = (int(np.asarray(ConvSubsampling.out_length(overlap_frames)))
              if sub else overlap_frames)
    lo_trim = ov_out // 2
    hi_trim = ov_out - lo_trim

    pred, init_h, joint = model.decoder_fns(params)
    if beam_width == 0:
        dec = StreamingRNNTGreedyDecoder(pred, init_h, joint,
                                         max_symbols=max_symbols)
        state = dec.init(1)
    else:
        dec = StreamingRNNTBeamDecoder(
            pred, init_h, joint, beam_width=beam_width, prune_k=prune_k,
            max_symbols=max_symbols, lm=lm, lm_alpha=lm_alpha,
            lm_beta=lm_beta)
        state = dec.init(1, model.config.enc_dim)

    for i in range(n):
        lo_f = i * hop
        piece = feats[lo_f:lo_f + chunk_frames]
        valid = piece.shape[0]
        if valid < chunk_frames:
            piece = np.pad(piece, ((0, chunk_frames - valid), (0, 0)))
        enc, out_len = model.encode(params, piece[None],
                                    np.array([valid], np.int32))
        lo = lo_trim if i > 0 else 0
        hi = max(int(out_len[0]) - (hi_trim if i < n - 1 else 0), lo)
        if hi > lo:
            state = dec.step(state, enc[:, lo:hi],
                             np.array([hi - lo], np.int32))
        if partial_cb is not None:
            toks, lens, _ = dec.finish(state)
            best = toks[0, 0] if beam_width else toks[0]
            blen = int(lens[0, 0]) if beam_width else int(lens[0])
            partial_cb(np.asarray(best)[:blen], blen, i)
    toks, lens, scores = dec.finish(state)
    if beam_width == 0:
        return toks[0], int(lens[0]), float(scores[0])
    return toks[0, 0], int(lens[0, 0]), float(scores[0, 0])
