"""FLV demuxing + decode of a synthetic FLV container."""

import struct

import numpy as np

from h263_tpu import DecoderOption, H263Decoder, PictureTypeCode
from h263_tpu.io import iter_flv_video_tags
from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture


def _build_flv(payloads):
    out = bytearray()
    out += b"FLV\x01\x01" + struct.pack(">I", 9)  # header, video-only flag
    out += struct.pack(">I", 0)                   # first PreviousTagSize
    ts = 0
    for i, p in enumerate(payloads):
        body = bytes([((1 if i == 0 else 2) << 4) | 2]) + p
        out += bytes([9]) + len(body).to_bytes(3, "big")
        out += ts.to_bytes(3, "big") + b"\x00" + b"\x00\x00\x00"
        out += body
        out += struct.pack(">I", 11 + len(body))
        ts += 33
    # plus an audio tag to be skipped
    out += bytes([8]) + (4).to_bytes(3, "big") + ts.to_bytes(3, "big")
    out += b"\x00" + b"\x00\x00\x00" + b"\xde\xad\xbe\xef"
    out += struct.pack(">I", 15)
    return bytes(out)


def test_flv_roundtrip_decode():
    f0 = encode_sorenson_picture(
        32, 32, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[800] * 6)] * 4, temporal_reference=0)
    f1 = encode_sorenson_picture(
        32, 32, PictureTypeCode.P_FRAME,
        [MBSpec(kind="uncoded")] * 4, temporal_reference=1)
    flv = _build_flv([f0, f1])

    tags = list(iter_flv_video_tags(flv))
    assert len(tags) == 2
    assert tags[0].frame_type == 1 and tags[0].codec_id == 2
    assert tags[0].payload == f0 and tags[1].payload == f1
    assert tags[1].timestamp_ms == 33

    dec = H263Decoder(DecoderOption.SORENSON_SPARK_BITSTREAM, backend="numpy")
    for tag in tags:
        dec.decode_next_picture(tag.payload)
    assert dec.get_last_picture().as_luma().shape == (32, 32)


def test_flv_garbage_and_truncation():
    assert list(iter_flv_video_tags(b"")) == []
    assert list(iter_flv_video_tags(b"NOT AN FLV FILE")) == []
    f0 = encode_sorenson_picture(
        16, 16, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[800] * 6)], temporal_reference=0)
    flv = _build_flv([f0])
    for cut in range(0, len(flv), 7):
        list(iter_flv_video_tags(flv[:cut]))  # must not raise


def test_video_command_frames_skipped():
    """frame_type 5 (video info/command) tags carry a command byte, not a
    picture — they must not be yielded as decodable payloads."""
    from h263_tpu.io.flv import iter_flv_video_tags

    flv = bytearray(_build_flv([b"\x00\x00\x82" + b"\x01" * 8]))
    # Append a command tag: frame_type 5, codec 2, one command byte.
    body = bytes([(5 << 4) | 2, 0x00])
    flv += bytes([9]) + len(body).to_bytes(3, "big")
    flv += (99).to_bytes(3, "big") + b"\x00" + b"\x00\x00\x00" + body
    flv += struct.pack(">I", 11 + len(body))
    tags = list(iter_flv_video_tags(bytes(flv)))
    assert len(tags) == 1 and tags[0].frame_type == 1
