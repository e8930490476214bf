"""Bitstream fault tolerance (SURVEY §5.3): corrupt, truncated, and hostile
inputs must fail cleanly — never crash, never poison decoder state."""

import numpy as np
import pytest

from h263_tpu import DecoderOption, H263Decoder, PictureTypeCode
from h263_tpu.parallel import BatchedStreamDecoder
from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture
from h263_tpu.types import H263Error

SORENSON = DecoderOption.SORENSON_SPARK_BITSTREAM


def _valid_stream(n=3, width=32, height=32):
    rng = np.random.default_rng(0)
    nmb = (width // 16) * (height // 16)
    frames = [encode_sorenson_picture(
        width, height, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[800] * 6,
                blocks=[[(0, 5)], [], [], [], [], []])] * nmb,
        temporal_reference=0)]
    for tr in range(1, n):
        frames.append(encode_sorenson_picture(
            width, height, PictureTypeCode.P_FRAME,
            [MBSpec(kind="inter", mvd=[(2, -2)],
                    blocks=[[(1, 3)], [], [], [], [], []])] * nmb,
            temporal_reference=tr))
    return frames


class TestSingleStream:
    def test_bit_flips_never_crash(self):
        """Flip every byte of a valid frame; decode must either succeed or
        raise H263Error — no crashes, no numpy errors."""
        frames = _valid_stream()
        base = frames[1]
        for pos in range(len(base)):
            for mask in (0x01, 0x80, 0xFF):
                d = H263Decoder(SORENSON, backend="numpy")
                d.decode_next_picture(frames[0])
                corrupted = bytearray(base)
                corrupted[pos] ^= mask
                try:
                    d.decode_next_picture(bytes(corrupted))
                except H263Error:
                    # failed decode leaves state intact
                    assert d.get_last_picture() is not None
                # either way the decoder must still work afterwards
                d2_pic = d.decode_next_picture(frames[0])
                assert d2_pic is not None

    def test_truncations_never_crash(self):
        frames = _valid_stream()
        base = frames[1]
        d0 = H263Decoder(SORENSON, backend="numpy")
        d0.decode_next_picture(frames[0])
        ref_y = d0.get_last_picture().as_luma().copy()
        for cut in range(len(base)):
            d = H263Decoder(SORENSON, backend="numpy")
            d.decode_next_picture(frames[0])
            try:
                d.decode_next_picture(base[:cut])
            except H263Error:
                np.testing.assert_array_equal(
                    d.get_last_picture().as_luma(), ref_y)

    def test_garbage_input(self):
        rng = np.random.default_rng(7)
        d = H263Decoder(SORENSON, backend="numpy")
        for n in (0, 1, 3, 17, 100):
            blob = bytes(rng.integers(0, 256, n).astype(np.uint8))
            with pytest.raises(H263Error):
                d.decode_next_picture(blob)

    def test_all_zero_and_all_one_buffers(self):
        d = H263Decoder(SORENSON, backend="numpy")
        with pytest.raises(H263Error):
            d.decode_next_picture(b"\x00" * 64)
        with pytest.raises(H263Error):
            d.decode_next_picture(b"\xff" * 64)


class TestBatchedIsolation:
    def test_bad_stream_fails_alone(self):
        """A corrupt stream must raise during its parse without shipping a
        malformed batch to the device (SURVEY §7 hard part 5)."""
        n = 3
        frames = [_valid_stream() for _ in range(n)]
        dec = BatchedStreamDecoder(n, 32, 32, SORENSON, coef_transport="u32")
        dec.decode_step([frames[i][0] for i in range(n)])

        bufs = [frames[0][1], b"\x00\x01\x02\x03", frames[2][1]]
        with pytest.raises(H263Error):
            for i, b in enumerate(bufs):
                dec.parse_one_packed(i, b, dec.next_packed_batch())
        # healthy streams keep decoding
        dec2 = BatchedStreamDecoder(n, 32, 32, SORENSON)
        dec2.decode_step([frames[i][0] for i in range(n)])
        dec2.decode_step([frames[i][1] for i in range(n)])


class TestNativePythonErrorParity:
    def test_corrupt_frames_raise_same_error_class(self):
        """Fuzz: for random corruptions, the C++ and Python front-ends agree
        on accept/reject (and on the buffer-level outcome when accepted)."""
        import os

        from h263_tpu.bitio import BitReader
        from h263_tpu.parser.frame import parse_frame
        from h263_tpu.parser.picture import decode_picture
        from h263_tpu.native import ensure_built, parse_frame_native

        if not ensure_built():
            pytest.skip("native unavailable")
        rng = np.random.default_rng(3)
        base = _valid_stream()[0]
        agree = 0
        for trial in range(300):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                buf[int(rng.integers(0, len(buf)))] ^= int(rng.integers(1, 256))
            buf = bytes(buf)

            def run_py():
                r = BitReader(buf)
                pic = decode_picture(r, SORENSON, None)
                return parse_frame(r, pic, SORENSON, pic.options,
                                   *pic.format.width_and_height())

            def run_c():
                r = BitReader(buf)
                pic = decode_picture(r, SORENSON, None)
                f, _ = parse_frame_native(buf, r.pos, pic, SORENSON,
                                          pic.options,
                                          *pic.format.width_and_height())
                return f

            try:
                fp = run_py()
                ok_py = True
            except Exception as e:
                ok_py, err_py = False, type(e)
            try:
                fc = run_c()
                ok_c = True
            except Exception as e:
                ok_c, err_c = False, type(e)

            assert ok_py == ok_c, f"trial {trial}: py={ok_py} c={ok_c}"
            if ok_py:
                np.testing.assert_array_equal(fp.coeffs_y, fc.coeffs_y)
                np.testing.assert_array_equal(fp.mvs, fc.mvs)
                agree += 1
            else:
                assert err_py is err_c, (trial, err_py, err_c)
        assert agree > 0  # some corruptions still decode


class TestStandardBatchedRobustness:
    """The standard-H.263 batched packed path (Python headers + native
    packed MB parse) must fail cleanly and atomically on corrupt input."""

    def _gop(self):
        from h263_tpu.testing.encoder import encode_standard_picture
        nmb = 8 * 6
        f0 = encode_standard_picture(
            128, 96, PictureTypeCode.I_FRAME,
            [MBSpec(kind="intra", intradc=[800] * 6)] * nmb)
        f1 = encode_standard_picture(
            128, 96, PictureTypeCode.P_FRAME,
            [MBSpec(kind="inter", mvd=[(2, 0)])] * nmb,
            temporal_reference=1)
        return f0, f1

    def test_corrupt_stream_raises_and_state_survives(self):
        from h263_tpu.types import DecoderOption, H263Error
        f0, f1 = self._gop()
        dec = BatchedStreamDecoder(2, 128, 96, DecoderOption.NONE)
        y0 = np.asarray(dec.decode_step([f0, f0])[0])
        with pytest.raises(H263Error):
            dec.decode_step([f1, b"\x00\x00\x8f\xff\xff"],
                            transport="packed")
        # state untouched by the failed step: the good P-frame still decodes
        y1 = np.asarray(dec.decode_step([f1, f1])[0])
        ref = BatchedStreamDecoder(2, 128, 96, DecoderOption.NONE)
        ref.decode_step([f0, f0], transport="dense")
        y1_ref = np.asarray(ref.decode_step([f1, f1], transport="dense")[0])
        np.testing.assert_array_equal(y1, y1_ref)

    def test_random_garbage_never_crashes(self):
        from h263_tpu.types import DecoderOption, H263Error
        f0, _ = self._gop()
        rng = np.random.default_rng(9)
        dec = BatchedStreamDecoder(2, 128, 96, DecoderOption.NONE)
        dec.decode_step([f0, f0])
        for _ in range(30):
            junk = rng.integers(0, 256, int(rng.integers(1, 60)),
                                dtype=np.uint8).tobytes()
            try:
                dec.decode_step([f0, junk], transport="packed")
            except H263Error:
                pass


def test_truncated_tail_fill_no_stale_state_packed():
    """Regression (round 2): a legally truncated frame (EOF tail-fill,
    state.rs:419-427) must synthesize empty INTER MV(0,0) tail macroblocks
    — not reuse the motion vectors a previous step left in the reused
    packed-batch buffers."""
    from h263_tpu.native import ensure_built
    if not ensure_built():
        pytest.skip("native front-end unavailable")
    from h263_tpu.parallel.batch import BatchedStreamDecoder

    W = H = 48
    nmb = 9
    f0 = encode_sorenson_picture(
        W, H, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[200 + i * 40] * 6)
         for i in range(nmb)])
    f1 = encode_sorenson_picture(  # fills the MV buffers with +/-8s
        W, H, PictureTypeCode.P_FRAME,
        [MBSpec(kind="inter", mvd=[(8, -8)],
                blocks=[[(0, 5)], [], [], [], [], []])] * nmb,
        temporal_reference=1)
    f2 = encode_sorenson_picture(  # only 3 of 9 MBs present
        W, H, PictureTypeCode.P_FRAME,
        [MBSpec(kind="inter", mvd=[(2, 2)])] * 3,
        temporal_reference=2)

    ref = H263Decoder(SORENSON, backend="numpy")
    for f in (f0, f1, f2):
        pic = ref.decode_next_picture(f)
    want = np.asarray(pic.as_luma())

    for tr in ("u32", "d24"):
        dec = BatchedStreamDecoder(1, W, H, SORENSON, coef_transport=tr)
        for f in (f0, f1):
            dec.decode_step([f])
        got = np.asarray(dec.decode_step([f2])[0])[0]
        np.testing.assert_array_equal(got, want, err_msg=tr)
