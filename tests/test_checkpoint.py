"""Checkpoint/resume: suspending mid-GOP and resuming must be bit-exact."""

import numpy as np

from h263_tpu import DecoderOption, H263Decoder, PictureTypeCode
from h263_tpu.parallel import BatchedStreamDecoder
from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture
from h263_tpu.utils.checkpoint import (
    load_batched_state,
    load_decoder_state,
    save_batched_state,
    save_decoder_state,
)

SORENSON = DecoderOption.SORENSON_SPARK_BITSTREAM


def _gop(seed, width=32, height=32, n=6):
    rng = np.random.default_rng(seed)
    nmb = (width // 16) * (height // 16)
    frames = [encode_sorenson_picture(
        width, height, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[int(rng.integers(1, 128)) * 8] * 6)
         for _ in range(nmb)], temporal_reference=0)]
    for tr in range(1, n):
        frames.append(encode_sorenson_picture(
            width, height, PictureTypeCode.P_FRAME,
            [MBSpec(kind="inter",
                    mvd=[(int(rng.integers(-4, 5)) * 2,
                          int(rng.integers(-4, 5)) * 2)],
                    blocks=[[(0, int(rng.integers(1, 6)))], [], [], [], [], []])
             for _ in range(nmb)], temporal_reference=tr))
    return frames


def test_single_stream_roundtrip():
    frames = _gop(1)
    ref = H263Decoder(SORENSON, backend="numpy")
    dec = H263Decoder(SORENSON, backend="numpy")
    for f in frames[:3]:
        ref.decode_next_picture(f)
        dec.decode_next_picture(f)

    blob = save_decoder_state(dec)
    resumed = load_decoder_state(blob)

    for f in frames[3:]:
        a = ref.decode_next_picture(f)
        b = resumed.decode_next_picture(f)
        np.testing.assert_array_equal(a.as_luma(), b.as_luma())
        np.testing.assert_array_equal(a.as_chroma_b(), b.as_chroma_b())


def test_jax_to_numpy_backend_migration():
    frames = _gop(2)
    dec = H263Decoder(SORENSON, backend="jax")
    for f in frames[:3]:
        dec.decode_next_picture(f)
    resumed = load_decoder_state(save_decoder_state(dec), backend="numpy")
    ref = H263Decoder(SORENSON, backend="numpy")
    for f in frames[:3]:
        ref.decode_next_picture(f)
    for f in frames[3:]:
        a = ref.decode_next_picture(f)
        b = resumed.decode_next_picture(f)
        np.testing.assert_array_equal(a.as_luma(), b.as_luma())


def test_batched_roundtrip():
    n = 3
    streams = [_gop(10 + i) for i in range(n)]
    ref = BatchedStreamDecoder(n, 32, 32, SORENSON)
    dec = BatchedStreamDecoder(n, 32, 32, SORENSON)
    for t in range(3):
        bufs = [streams[i][t] for i in range(n)]
        ref.decode_step(bufs)
        dec.decode_step(bufs)

    resumed = load_batched_state(save_batched_state(dec))
    for t in range(3, 6):
        bufs = [streams[i][t] for i in range(n)]
        ya, _, _ = ref.decode_step(bufs)
        yb, _, _ = resumed.decode_step(bufs)
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


def test_batched_roundtrip_split_transport():
    """Checkpoint/resume across the large-picture split transport (720p):
    decoding resumes bit-exactly mid-GOP."""
    from h263_tpu.native import ensure_built
    if not ensure_built():
        pytest.skip("native front-end unavailable")
    from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture
    from h263_tpu.types import PictureTypeCode

    W, H, mbw, mbh = 1280, 720, 80, 45
    rng = np.random.default_rng(7)
    f0 = encode_sorenson_picture(
        W, H, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[int(rng.integers(1, 120)) * 8] * 6)
         for _ in range(mbw * mbh)], quantizer=7)
    f1 = encode_sorenson_picture(
        W, H, PictureTypeCode.P_FRAME,
        [MBSpec(kind="inter", mvd=[(1, -3)],
                blocks=[[(0, 8)], [], [], [], [], []]
                if k % 9 == 0 else [[], [], [], [], [], []])
         for k in range(mbw * mbh)], quantizer=7, temporal_reference=1)

    dec = BatchedStreamDecoder(2, W, H)
    assert dec._split
    dec.decode_step([f0, f0])
    resumed = load_batched_state(save_batched_state(dec))
    assert resumed._split
    ya = np.asarray(dec.decode_step([f1, f1])[0])
    yb = np.asarray(resumed.decode_step([f1, f1])[0])
    np.testing.assert_array_equal(ya, yb)
