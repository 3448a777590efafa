"""Streaming transducer decoding — exactness vs the one-shot scans.

The streaming decoders are the SAME scans split at chunk boundaries
(greedy: the cursor freezes at the chunk edge; beam: whole-sample freeze
preserving the ALSD step alignment, with a max_symbols-deep frame
lookback making the split exact unconditionally).  So every test here
demands EXACT equality with the one-shot decode — tokens, lengths,
scores, and timestamps — across chunkings, including uneven per-sample
chunk lengths, plus pure mid-stream partials, LM fusion across chunks,
and a checkpoint round-trip of the carried state.

One carve-out: GREEDY scores once the symbol cap binds.  The greedy
decoder accounts the post-cap all-blank tail in one vectorized frame
sum (rnnt_decode._rnnt_greedy_scan fast path), so chunk-partitioned
tail sums reassociate f32 addition — scores match to ~1e-5 there while
tokens/lengths/times stay bit-exact (and everything is bit-exact when
the cap never binds).
"""


def _assert_decode_equal(ref, got, score_idx=2):
    for i, (a, b) in enumerate(zip(ref, got)):
        if i == score_idx:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

import jax
import jax.numpy as jnp
import numpy as np

from end2end_tpu.ops.lm import NGramLM
from end2end_tpu.ops.rnnt_decode import rnnt_beam_decode, rnnt_greedy_decode
from end2end_tpu.ops.streaming_decode import (StreamingRNNTBeamDecoder,
                                              StreamingRNNTGreedyDecoder)
from tests.test_rnnt_beam import _setup
from tests.test_rnnt_lm import _bigram


def _stream(dec_state, dec, enc, il, cuts):
    """Feed enc (N, T, H) in pieces split at global frame indices cuts."""
    t = 0
    for nxt in list(cuts) + [enc.shape[1]]:
        if nxt <= t:
            continue
        piece = enc[:, t:nxt]
        cl = np.clip(np.asarray(il) - t, 0, nxt - t).astype(np.int32)
        dec_state = dec.step(dec_state, piece, cl)
        t = nxt
    return dec_state


class TestGreedyStreaming:
    def test_exact_vs_one_shot_various_chunkings(self):
        n, t_max, v = 3, 12, 6
        enc, pred, init_h, joint = _setup(11, n=n, t=t_max, v=v, scale=1.2)
        il = np.array([t_max, t_max - 1, t_max - 5], np.int32)
        ref = rnnt_greedy_decode(enc, il, pred, init_h, joint,
                                 max_symbols=8, return_timestamps=True)
        for cuts in ([4, 8], [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11], [7],
                     []):
            dec = StreamingRNNTGreedyDecoder(pred, init_h, joint,
                                             max_symbols=8)
            st = _stream(dec.init(n), dec, jnp.asarray(enc), il, cuts)
            got = dec.finish(st, return_timestamps=True)
            _assert_decode_equal(ref, got)

    def test_midstream_partial_is_prefix_consistent(self):
        n, t_max, v = 2, 10, 5
        enc, pred, init_h, joint = _setup(2, n=n, t=t_max, v=v, scale=1.1)
        il = np.full((n,), t_max, np.int32)
        dec = StreamingRNNTGreedyDecoder(pred, init_h, joint, max_symbols=8)
        st = dec.init(n)
        st = dec.step(st, jnp.asarray(enc[:, :5]),
                      np.full((n,), 5, np.int32))
        toks_mid, lens_mid, _ = dec.finish(st)
        # partial == one-shot decode of the first 5 frames
        ref = rnnt_greedy_decode(enc[:, :5], np.full((n,), 5, np.int32),
                                 pred, init_h, joint, max_symbols=8)
        np.testing.assert_array_equal(np.asarray(toks_mid),
                                      np.asarray(ref[0]))
        # stream continues unaffected by the finish() read
        st = dec.step(st, jnp.asarray(enc[:, 5:]),
                      np.full((n,), t_max - 5, np.int32))
        full = dec.finish(st)
        ref_full = rnnt_greedy_decode(enc, il, pred, init_h, joint,
                                      max_symbols=8)
        _assert_decode_equal(ref_full, full)


class TestBeamStreaming:
    def test_exact_vs_one_shot_various_chunkings(self):
        n, t_max, v, W = 3, 10, 6, 4
        enc, pred, init_h, joint = _setup(7, n=n, t=t_max, v=v, scale=1.3)
        il = np.array([t_max, t_max - 2, t_max - 4], np.int32)
        ref = rnnt_beam_decode(enc, il, pred, init_h, joint, beam_width=W,
                               prune_k=4, max_symbols=5,
                               return_timestamps=True)
        for cuts in ([3, 6], [2, 4, 6, 8], [9], []):
            dec = StreamingRNNTBeamDecoder(pred, init_h, joint,
                                           beam_width=W, prune_k=4,
                                           max_symbols=5)
            st = _stream(dec.init(n, enc.shape[2]), dec, jnp.asarray(enc),
                         il, cuts)
            got = dec.finish(st, return_timestamps=True)
            _assert_decode_equal(ref, got)

    def test_lm_fusion_streams_exactly(self):
        n, t_max, v, W = 2, 8, 5, 4
        enc, pred, init_h, joint = _setup(19, n=n, t=t_max, v=v, scale=1.1)
        il = np.full((n,), t_max, np.int32)
        lm, _ = _bigram(v, 40)
        ref = rnnt_beam_decode(enc, il, pred, init_h, joint, beam_width=W,
                               max_symbols=4, lm=lm, lm_alpha=0.6,
                               lm_beta=0.2)
        dec = StreamingRNNTBeamDecoder(pred, init_h, joint, beam_width=W,
                                       max_symbols=4, lm=lm, lm_alpha=0.6,
                                       lm_beta=0.2)
        st = _stream(dec.init(n, enc.shape[2]), dec, jnp.asarray(enc), il,
                     [3, 5])
        got = dec.finish(st)
        _assert_decode_equal(ref, got)

    def test_state_checkpoint_roundtrip(self):
        """The carried state is a plain pytree: serialize to host numpy
        mid-stream, restore, and the decode is unchanged."""
        n, t_max, v, W = 2, 10, 6, 4
        enc, pred, init_h, joint = _setup(23, n=n, t=t_max, v=v, scale=1.0)
        il = np.full((n,), t_max, np.int32)
        dec = StreamingRNNTBeamDecoder(pred, init_h, joint, beam_width=W,
                                       max_symbols=5)
        st = dec.init(n, enc.shape[2])
        st = dec.step(st, jnp.asarray(enc[:, :6]),
                      np.full((n,), 6, np.int32))
        # checkpoint: device -> host -> device
        leaves, treedef = jax.tree.flatten(st)
        saved = [np.asarray(x) for x in leaves]
        restored = jax.tree.unflatten(treedef,
                                      [jnp.asarray(x) for x in saved])
        st2 = dec.step(restored, jnp.asarray(enc[:, 6:]),
                       np.full((n,), t_max - 6, np.int32))
        st1 = dec.step(st, jnp.asarray(enc[:, 6:]),
                       np.full((n,), t_max - 6, np.int32))
        for x, y in zip(dec.finish(st1), dec.finish(st2)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        ref = rnnt_beam_decode(enc, il, pred, init_h, joint, beam_width=W,
                               max_symbols=5)
        _assert_decode_equal(ref, dec.finish(st2))

    def test_zero_length_sample(self):
        n, t_max, v = 2, 6, 5
        enc, pred, init_h, joint = _setup(5, n=n, t=t_max, v=v)
        il = np.array([0, t_max], np.int32)
        ref = rnnt_beam_decode(enc, il, pred, init_h, joint, beam_width=4,
                               max_symbols=4)
        dec = StreamingRNNTBeamDecoder(pred, init_h, joint, beam_width=4,
                                       max_symbols=4)
        st = _stream(dec.init(n, enc.shape[2]), dec, jnp.asarray(enc), il,
                     [2])
        for a, b in zip(ref, dec.finish(st)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLongFormRNNT:
    def test_long_form_equals_stitched_one_shot(self):
        from end2end_tpu.models.streaming import transcribe_long_form_rnnt
        from end2end_tpu.models.transducer import (ConformerTransducer,
                                                   TransducerConfig)
        from end2end_tpu.ops.rnnt_decode import (rnnt_beam_decode,
                                                 rnnt_greedy_decode)

        cfg = TransducerConfig(vocab_size=9, n_mels=8, d_model=16,
                               num_layers=1, num_heads=2, enc_dim=16,
                               emb_dim=8, pred_hidden=12, joint_dim=12,
                               subsample=False)
        model = ConformerTransducer(cfg)
        rng = np.random.default_rng(0)
        t_f = 50
        feats = rng.standard_normal((t_f, cfg.n_mels)).astype(np.float32)
        params = model.init(jax.random.key(0), feats[None],
                            np.array([t_f], np.int32))

        chunk_frames, overlap = 20, 4
        hop = chunk_frames - overlap
        lo_trim, hi_trim = overlap // 2, overlap - overlap // 2
        pieces = []
        n = int(np.ceil((t_f - overlap) / hop))
        for i in range(n):
            piece = feats[i * hop: i * hop + chunk_frames]
            valid = piece.shape[0]
            if valid < chunk_frames:
                piece = np.pad(piece, ((0, chunk_frames - valid), (0, 0)))
            enc, out_len = model.encode(params, piece[None],
                                        np.array([valid], np.int32))
            lo = lo_trim if i > 0 else 0
            hi = max(int(out_len[0]) - (hi_trim if i < n - 1 else 0), lo)
            pieces.append(np.asarray(enc)[0, lo:hi])
        stitched = np.concatenate(pieces, axis=0)[None]
        pred, init_h, joint = model.decoder_fns(params)
        t_tot = np.array([stitched.shape[1]], np.int32)

        got = transcribe_long_form_rnnt(
            model, params, feats, chunk_frames=chunk_frames,
            overlap_frames=overlap, max_symbols=16)
        ref = rnnt_greedy_decode(stitched, t_tot, pred, init_h, joint,
                                 max_symbols=16)
        assert got[1] == int(np.asarray(ref[1])[0])
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(ref[0])[0])

        partials = []
        got_b = transcribe_long_form_rnnt(
            model, params, feats, chunk_frames=chunk_frames,
            overlap_frames=overlap, beam_width=3, max_symbols=16,
            partial_cb=lambda toks, ln, i: partials.append((i, ln)))
        ref_b = rnnt_beam_decode(stitched, t_tot, pred, init_h, joint,
                                 beam_width=3, max_symbols=16)
        assert got_b[1] == int(np.asarray(ref_b[1])[0, 0])
        np.testing.assert_array_equal(np.asarray(got_b[0]),
                                      np.asarray(ref_b[0])[0, 0])
        np.testing.assert_allclose(got_b[2],
                                   float(np.asarray(ref_b[2])[0, 0]),
                                   atol=1e-5)
        assert len(partials) == n
