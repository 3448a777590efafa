"""Tests for utils.subtitles — SRT/VTT rendering and cue grouping."""

import pytest

from end2end_tpu.utils.subtitles import group_word_spans, to_srt, to_vtt


SPANS = [("the", 0, 4), ("cat", 8, 12), ("sat", 16, 20)]


def test_srt_format():
    srt = to_srt(SPANS, frame_duration_s=0.1)
    blocks = srt.strip().split("\n\n")
    assert len(blocks) == 3
    assert blocks[0].splitlines() == [
        "1", "00:00:00,000 --> 00:00:00,500", "the"]
    assert blocks[1].splitlines() == [
        "2", "00:00:00,800 --> 00:00:01,300", "cat"]
    assert blocks[2].startswith("3\n00:00:01,600 --> 00:00:02,100")


def test_vtt_format_and_offset():
    vtt = to_vtt(SPANS, frame_duration_s=0.1, offset_s=3600.0)
    lines = vtt.splitlines()
    assert lines[0] == "WEBVTT"
    assert "01:00:00.000 --> 01:00:00.500" in vtt
    assert "01:00:00.800 --> 01:00:01.300" in vtt


def test_hour_rollover_and_ms_rounding():
    srt = to_srt([("x", 0, 0)], frame_duration_s=3599.9995)
    # end = 3599.9995 s -> rounds to 3600000 ms == exactly 01:00:00,000
    assert "00:00:00,000 --> 01:00:00,000" in srt


def test_group_by_gap_duration_words():
    fd = 0.1
    # big pause after 'cat' (gap 3 s) -> new cue
    spans = [("the", 0, 4), ("cat", 8, 12), ("sat", 45, 50)]
    cues = group_word_spans(spans, fd, max_gap_s=1.0)
    assert cues == [("the cat", 0, 12), ("sat", 45, 50)]
    # duration cap
    long = [(f"w{i}", i * 30, i * 30 + 5) for i in range(6)]
    cues = group_word_spans(long, fd, max_gap_s=10.0, max_duration_s=6.0)
    assert all((c[2] + 1 - c[1]) * fd <= 6.3 for c in cues)
    assert sum(len(c[0].split()) for c in cues) == 6
    # word-count cap
    dense = [(f"w{i}", i * 2, i * 2 + 1) for i in range(25)]
    cues = group_word_spans(dense, fd, max_gap_s=10.0, max_duration_s=100.0,
                            max_words=12)
    assert [len(c[0].split()) for c in cues] == [12, 12, 1]


def test_group_preserves_min_confidence():
    spans = [("the", 0, 4, 0.9), ("cat", 8, 12, 0.4), ("sat", 45, 50, 0.8)]
    cues = group_word_spans(spans, 0.1, max_gap_s=1.0)
    assert cues[0] == ("the cat", 0, 12, 0.4)
    assert cues[1] == ("sat", 45, 50, 0.8)
    # 4-tuple cues render fine (confidence ignored in the text)
    assert "the cat" in to_srt(cues, 0.1)


def test_decoder_to_subtitles_end_to_end():
    import jax.numpy as jnp
    import numpy as np

    import end2end_tpu as e2e
    from end2end_tpu.utils.text import asr_alphabet, word_spans

    ab = asr_alphabet()
    ids = ab.encode("hi yo")
    t = 2 * len(ids) + 2
    a = np.full((t, 1, len(ab)), 1e-3)
    for i, c in enumerate(ids):
        a[2 * i, 0, c] = 5.0
        a[2 * i + 1, 0, 0] = 5.0
    a[2 * len(ids):, 0, 0] = 5.0
    lp = jnp.asarray(np.log(a / a.sum(-1, keepdims=True)), jnp.float32)
    toks, lens, _, times = e2e.greedy_decode_with_timestamps(
        lp, jnp.asarray([t], jnp.int32))
    n = int(lens[0])
    spans = word_spans(np.asarray(toks[0, :n]), np.asarray(times[0, :n]),
                       space_id=ab.encode(" ")[0], alphabet=ab)
    srt = to_srt(group_word_spans(spans, 0.04), 0.04)
    assert "hi yo" in srt and "-->" in srt


def test_rnnt_decoder_to_subtitles_end_to_end():
    """Transducer timestamps drive the same subtitle path as CTC.

    `rnnt_greedy_decode(..., return_timestamps=True)` emission frames plug
    straight into `word_spans` -> `group_word_spans` -> `to_srt` — the
    serving pipeline the reference's decoder-timings role implies
    (SURVEY §6.3), transducer edition.
    """
    import jax.numpy as jnp
    import numpy as np

    from end2end_tpu.ops.rnnt_decode import rnnt_greedy_decode
    from end2end_tpu.utils.text import asr_alphabet, word_spans

    ab = asr_alphabet()
    ids = ab.encode("hi yo")
    t = 2 * len(ids) + 2
    # Encoder frames ARE the joint logits (joint ignores the predictor);
    # per-frame cap 1 makes each peaked frame emit its token exactly once.
    enc = np.zeros((1, t, len(ab)), np.float32)
    for i, c in enumerate(ids):
        enc[0, 2 * i, c] = 5.0  # odd frames peak nothing -> blank advances

    toks, lens, _, times = rnnt_greedy_decode(
        enc, jnp.asarray([t], jnp.int32),
        lambda hid, tok: hid, jnp.zeros((1,), jnp.float32),
        lambda f, hid: f, max_symbols_per_frame=1, return_timestamps=True)
    n = int(lens[0])
    assert [int(x) for x in toks[0, :n]] == list(ids)
    assert [int(x) for x in times[0, :n]] == [2 * i for i in range(len(ids))]
    spans = word_spans(np.asarray(toks[0, :n]), np.asarray(times[0, :n]),
                       space_id=ab.encode(" ")[0], alphabet=ab)
    assert [s[0] for s in spans] == ["hi", "yo"]
    srt = to_srt(group_word_spans(spans, 0.04, max_gap_s=0.05), 0.04)
    assert "hi" in srt and "yo" in srt and "-->" in srt


def test_errors():
    with pytest.raises(ValueError, match="positive"):
        to_srt(SPANS, 0.0)
    with pytest.raises(ValueError, match="positive"):
        group_word_spans(SPANS, -1.0)
