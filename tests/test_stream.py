"""Streaming input: incremental frame segmentation + commit-freeing.

Parity target: the reference decodes from any std::io::Read with
incremental buffering and commit-frees (reader.rs:15-30, 335-365); here
the same contract holds at the picture granularity the batch pipeline
consumes (io/stream.py).
"""

import io

import numpy as np
import pytest

from h263_tpu import DecoderOption, H263Decoder, PictureTypeCode
from h263_tpu.io.stream import FrameSegmenter, decode_stream, iter_stream_frames
from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture

SORENSON = DecoderOption.SORENSON_SPARK_BITSTREAM


def _gop(seed=0, w=32, h=32, n=5):
    rng = np.random.default_rng(seed)
    nmb = (w // 16) * (h // 16)
    frames = [encode_sorenson_picture(
        w, h, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[int(rng.integers(1, 128)) * 8] * 6)
         for _ in range(nmb)], temporal_reference=0)]
    for tr in range(1, n):
        frames.append(encode_sorenson_picture(
            w, h, PictureTypeCode.P_FRAME,
            [MBSpec(kind="inter", mvd=[(2, -2)],
                    blocks=[[(0, 4)], [], [], [], [], []])
             for _ in range(nmb)], temporal_reference=tr))
    return frames


@pytest.mark.parametrize("chunk", [1, 3, 7, 64, 100000])
def test_segmenter_recovers_frames_any_chunking(chunk):
    frames = _gop()
    blob = b"".join(frames)
    seg = FrameSegmenter()
    got = []
    for ofs in range(0, len(blob), chunk):
        seg.feed(blob[ofs:ofs + chunk])
        got.extend(seg.frames())
    got.extend(seg.finish())
    assert len(got) == len(frames)
    # Segment boundaries are start codes; a payload may carry the previous
    # frame's byte-alignment padding in front of nothing (it ends where the
    # next PSC begins), so each recovered frame must *start* with its
    # original bytes.
    for g, f in zip(got, frames):
        assert g[:len(f)] == f


def test_decode_stream_matches_whole_buffer():
    frames = _gop(seed=3)
    blob = b"".join(frames)
    ref = H263Decoder(SORENSON, backend="numpy")
    expect = [np.asarray(ref.decode_next_picture(f).as_luma()) for f in frames]

    dec = H263Decoder(SORENSON, backend="numpy")
    got = [np.asarray(p.as_luma())
           for p in decode_stream(io.BytesIO(blob), dec, chunk_size=11)]
    assert len(got) == len(expect)
    for a, b in zip(got, expect):
        np.testing.assert_array_equal(a, b)


def test_decode_stream_from_chunk_iterable():
    frames = _gop(seed=4, n=3)
    blob = b"".join(frames)
    chunks = [blob[i:i + 17] for i in range(0, len(blob), 17)]
    dec = H263Decoder(SORENSON, backend="numpy")
    got = list(decode_stream(iter(chunks), dec))
    assert len(got) == 3


def test_garbage_prefix_resyncs():
    """Bytes ahead of the first start code are discarded (the reference's
    in-error unlimited scan, reader.rs:236-256)."""
    frames = _gop(seed=5, n=2)
    blob = b"\xde\xad\xbe\xef\x01\x02" + b"".join(frames)
    seg = FrameSegmenter()
    seg.feed(blob)
    got = list(seg.frames()) + list(seg.finish())
    assert len(got) == 2
    assert seg.bytes_discarded == 6


def test_commit_frees_consumed_bytes():
    """Buffered bytes stay bounded by one in-flight picture (commit-free)."""
    frames = _gop(seed=6, n=40, w=48, h=48)
    blob = b"".join(frames)
    seg = FrameSegmenter()
    high_water = 0
    n = 0
    for ofs in range(0, len(blob), 256):
        seg.feed(blob[ofs:ofs + 256])
        for _ in seg.frames():
            n += 1
        high_water = max(high_water, seg.buffered)
    n += len(list(seg.finish()))
    assert n == 40
    max_frame = max(len(f) for f in frames)
    assert high_water <= max_frame + 256 + 3


def test_buffer_limit():
    seg = FrameSegmenter(max_buffer=1024)
    seg.feed(b"\x00\x00\x80" + b"\x55" * 512)  # synced, no next boundary
    list(seg.frames())
    with pytest.raises(MemoryError):
        seg.feed(b"\x55" * 1024)


def test_iter_stream_frames_empty_and_garbage_only():
    assert list(iter_stream_frames(io.BytesIO(b""))) == []
    assert list(iter_stream_frames(io.BytesIO(b"\x01\x02\x03" * 100))) == []


def _psc_frame(version=0, n=40):
    """A fake Sorenson-shaped payload starting with a byte-aligned PSC."""
    third = 0x80 | (version << 2)
    return b"\x00\x00" + bytes([third]) + bytes(range(1, n))


def test_standard_flavor_ignores_gob_and_eos_codes():
    """Byte-aligned GOB headers (GN>=1) and EOS inside a standard picture
    must not split it — only GN=0 third bytes (0x80-0x83) are pictures."""
    pic1 = (b"\x00\x00\x82" + b"\x11" * 20
            + b"\x00\x00\x84" + b"\x22" * 10     # GOB #1 header: mid-picture
            + b"\x00\x00\xfc" + b"\x33" * 4)     # EOS-shaped code
    pic2 = b"\x00\x00\x80" + b"\x44" * 8
    seg = FrameSegmenter(flavor="standard")
    seg.feed(pic1 + pic2)
    frames = list(seg.frames()) + list(seg.finish())
    assert frames == [pic1, pic2]


def test_sorenson_flavor_accepts_version1_start():
    """Sorenson v1 pictures start with third byte 0x84-0x87."""
    a = _psc_frame(version=1, n=12)
    b = _psc_frame(version=0, n=9)
    seg = FrameSegmenter()
    seg.feed(a + b)
    assert list(seg.frames()) + list(seg.finish()) == [a, b]


def test_finish_without_frames_call_drains_everything():
    """feed() then finish() alone must yield every picture, split."""
    a, b, c = _psc_frame(n=20), _psc_frame(n=15), _psc_frame(n=7)
    seg = FrameSegmenter()
    seg.feed(a + b + c)
    assert list(seg.finish()) == [a, b, c]


def test_segmenter_reusable_after_finish():
    a, b = _psc_frame(n=25), _psc_frame(n=13)
    seg = FrameSegmenter()
    seg.feed(a)
    list(seg.frames())          # leaves a stale scan offset behind
    assert list(seg.finish()) == [a]
    seg.feed(b"garbage" + b)    # second, unrelated stream
    assert list(seg.finish()) == [b]


def test_unknown_flavor_rejected():
    import pytest

    with pytest.raises(ValueError, match="flavor"):
        FrameSegmenter(flavor="mpeg")
