"""The reference implementation's own inline test vectors, ported verbatim.

Round 1's parity evidence chained back to self-derived goldens; these
vectors originate in the reference tree (ruffle-rs/h263-rs) and anchor the
VLC tables, bit reader, block parser, YUV conversion, and deblock filter
against data we did NOT author.  Table-walk bit patterns, golden images,
and quartet tables are extracted mechanically from the Rust `#[cfg(test)]`
modules by ref_vectors/extract_vectors.py into JSON (provenance recorded in
each fixture); the reader and decode_block cases are ported by hand below
with their reference line cited.

Reference files:
  h263/src/parser/reader.rs:444-560      (11 reader tests)
  h263/src/parser/macroblock.rs:551-1010 (MCBPC-I/P, MODB, CBPY, MVD walks)
  h263/src/parser/block.rs:757-2124      (TCOEF walk + 8 decode_block cases)
  yuv/src/bt601.rs:198-483               (scalar anchors + golden images)
  deblock/src/deblock.rs:319-559         (quartet table + 11x17 goldens)
"""

import json
import pathlib

import numpy as np
import pytest

from h263_tpu.bitio import BitReader
from h263_tpu.types import (
    BitstreamExhausted,
    Block,
    DecoderOption,
    MacroblockType,
    Picture,
    PictureOption,
    PictureTypeCode,
    TCoefficient,
)
from h263_tpu.vlc_tables import (
    CBPY,
    MCBPC_I,
    MCBPC_P,
    MODB,
    MVD,
    TCOEF,
    VLC_ESCAPE,
    VLC_INVALID,
    VLC_STUFFING,
)

VEC = pathlib.Path(__file__).parent / "ref_vectors"


def load(name):
    return json.loads((VEC / name).read_text())


# ---------------------------------------------------------------------------
# Bit reader — reader.rs:444-560, ported by hand (API calls, not data).
# ---------------------------------------------------------------------------


class TestReader:
    def test_read_unaligned_bits(self):  # reader.rs:448-458
        r = BitReader(bytes([0xFF, 0x72, 0x1C, 0x1F]))
        assert r.read_bits(3) == 0x07
        assert r.read_bits(6) == 0x3E
        assert r.read_bits(23) == 0x721C1F
        with pytest.raises(BitstreamExhausted):
            r.read_bits(1)

    def test_read_signed_bits(self):  # reader.rs:460-481 (both variants)
        r = BitReader(bytes([0xFF, 0x40, 0x72, 0x1C, 0x1F]))
        assert r.read_signed_bits(3) == -1
        assert r.read_signed_bits(6) == -2
        assert r.read_signed_bits(8) == -0x80
        assert r.read_signed_bits(23) == -0xDE3E1
        with pytest.raises(BitstreamExhausted):
            r.read_bits(1)

    def test_peek_bits(self):  # reader.rs:483-493
        r = BitReader(bytes([0xFF, 0x72, 0x1C, 0x1F]))
        assert r.peek_bits(3) == 0x07
        assert r.peek_bits(6) == 0x3F
        assert r.peek_bits(23) == 0x7FB90E
        with pytest.raises(BitstreamExhausted):
            r.peek_bits(64)

    def test_read_u8(self):  # reader.rs:495-503
        r = BitReader(bytes([0xFE, 0x73, 0xF3]))
        assert r.read_u8() == 0xFE
        assert r.read_u8() == 0x73
        assert r.read_u8() == 0xF3

    def test_read_u8_unaligned(self):  # reader.rs:505-515
        r = BitReader(bytes([0xFE, 0x73, 0xF3]))
        r.skip_bits(2)
        assert r.read_u8() == 0xF9
        assert r.read_u8() == 0xCF
        with pytest.raises(BitstreamExhausted):
            r.read_u8()

    def test_read_u16(self):  # reader.rs:517-524
        r = BitReader(bytes([0xFE, 0x73, 0x50, 0xF3]))
        assert r.read_bits(16) == 0xFE73
        assert r.read_bits(16) == 0x50F3

    def test_read_u32(self):  # reader.rs:526-532
        r = BitReader(bytes([0xFE, 0x73, 0x50, 0xF3]))
        assert r.read_bits(32) == 0xFE7350F3

    def test_aligned_start_code(self):  # reader.rs:534-540
        r = BitReader(bytes([0x00, 0x00, 0x80, 0x00]))
        assert r.recognize_start_code(False) == 0

    def test_stuffed_start_code(self):  # reader.rs:542-551
        r = BitReader(bytes([0x00, 0x00, 0x08, 0x00]))
        assert r.recognize_start_code(False) is None
        r.skip_bits(1)
        assert r.recognize_start_code(False) == 3

    def test_resynchronize_to_start_code(self):  # reader.rs:553-559
        r = BitReader(bytes([0x13, 0x80, 0x00, 0x40, 0x00]))
        assert r.recognize_start_code(True) == 9


# ---------------------------------------------------------------------------
# VLC table walks — macroblock.rs + block.rs bit patterns from JSON.
# ---------------------------------------------------------------------------

_LUTS = {
    "MCBPC_I_TABLE": MCBPC_I,
    "MCBPC_P_TABLE": MCBPC_P,
    "MODB_TABLE": MODB,
    "CBPY_TABLE_INTRA": CBPY,
    "MVD_TABLE": MVD,
    "TCOEF_TABLE": TCOEF,
}

_RUST_MB_TYPE = {
    "Intra": MacroblockType.INTRA,
    "IntraQ": MacroblockType.INTRA_Q,
    "Inter": MacroblockType.INTER,
    "InterQ": MacroblockType.INTER_Q,
    "Inter4V": MacroblockType.INTER_4V,
    "Inter4Vq": MacroblockType.INTER_4V_Q,
}


def _expected_symbol(table: str, exp):
    """Map a fixture expected-value to our LUT's decoded representation."""
    if table in ("MCBPC_I_TABLE", "MCBPC_P_TABLE"):
        if exp == "stuffing":
            return VLC_STUFFING
        if exp == "invalid":
            return VLC_INVALID
        return (_RUST_MB_TYPE[exp["mb_type"]], exp["cb"], exp["cr"])
    if table == "MODB_TABLE":
        return tuple(exp)
    if table == "CBPY_TABLE_INTRA":
        return VLC_INVALID if exp is None else tuple(exp)
    if table == "MVD_TABLE":
        # Reference stores full-pel f32; our table stores half-pel ints.
        return VLC_INVALID if exp is None else round(exp * 2)
    if table == "TCOEF_TABLE":
        if exp is None:
            return VLC_INVALID
        if exp == "escape":
            return VLC_ESCAPE
        return (int(exp["last"]), exp["run"], exp["level"])
    raise AssertionError(table)


def _run_walk(walk):
    r = BitReader(bytes(walk["bit_pattern"]))
    lut = _LUTS[walk["table"]]
    for i, exp in enumerate(walk["expected"]):
        got = r.read_vlc(lut)
        want = _expected_symbol(walk["table"], exp)
        assert got == want, (
            f"{walk['source_fn']} symbol {i}: got {got!r}, want {want!r}")


MB_WALKS = load("macroblock.json")["walks"]


@pytest.mark.parametrize("walk", MB_WALKS, ids=[w["source_fn"] for w in MB_WALKS])
def test_macroblock_table_walks(walk):
    _run_walk(walk)


def test_tcoef_table_walk():
    walk = load("tcoef.json")["walk"]
    assert len(walk["expected"]) == 102  # all short-form rows of Table 16
    _run_walk(walk)


# ---------------------------------------------------------------------------
# decode_block cases — block.rs:1707-2124, ported by hand.
# IntraDc::from_level(0x318): FLC byte 0x63 decodes to level 0x318 = 792.
# ---------------------------------------------------------------------------


def _dummy_picture(ptype=PictureTypeCode.I_FRAME, version=None):
    return Picture(version=version, temporal_reference=0, format=None,
                   options=PictureOption.NONE, picture_type=ptype, quantizer=1)


def _decode(data, mb_type, tcoef_present, picture, options=DecoderOption(0)):
    from h263_tpu.parser.block import decode_block

    return decode_block(BitReader(bytes(data)), options, picture,
                        PictureOption.NONE, mb_type, tcoef_present)


LONG_35_1216 = [TCoefficient(False, 3, 5), TCoefficient(False, 12, 16)]


class TestDecodeBlock:
    def test_empty_inter_block(self):  # block.rs:1708-1750
        got = _decode([0x00], MacroblockType.INTER, False,
                      _dummy_picture(PictureTypeCode.P_FRAME))
        assert got == Block(intradc=None, tcoef=[])

    def test_empty_intra_block(self):  # block.rs:1752-1794
        got = _decode([0x63], MacroblockType.INTRA, False, _dummy_picture())
        assert got == Block(intradc=0x318, tcoef=[])

    def test_long_coded_inter_block(self):  # block.rs:1796-1849
        got = _decode([0x06, 0x0C, 0x14, 0x1C, 0xC1, 0x00],
                      MacroblockType.INTER, True, _dummy_picture())
        assert got == Block(intradc=None, tcoef=LONG_35_1216)

    def test_long_coded_intra_block(self):  # block.rs:1851-1904
        got = _decode([0x63, 0x06, 0x0C, 0x14, 0x1C, 0xC1, 0x00],
                      MacroblockType.INTRA, True, _dummy_picture())
        assert got == Block(intradc=0x318, tcoef=LONG_35_1216)

    def test_short_coded_inter_block(self):  # block.rs:1906-1959
        got = _decode([0x03, 0x00, 0x14], MacroblockType.INTER, True,
                      _dummy_picture())
        assert got == Block(intradc=None, tcoef=[
            TCoefficient(True, 5, 2), TCoefficient(True, 0, 3)])

    def test_short_coded_intra_block(self):  # block.rs:1961-2014
        got = _decode([0x63, 0x03, 0x00, 0x14], MacroblockType.INTRA, True,
                      _dummy_picture())
        assert got == Block(intradc=0x318, tcoef=[
            TCoefficient(True, 5, 2), TCoefficient(True, 0, 3)])

    def test_sorenson_long_coded_intra_block(self):  # block.rs:2016-2069
        got = _decode([0x63, 0x06, 0x06, 0x14, 0x1A, 0x61, 0x00],
                      MacroblockType.INTRA, True,
                      _dummy_picture(version=1),
                      DecoderOption.SORENSON_SPARK_BITSTREAM)
        assert got == Block(intradc=0x318, tcoef=LONG_35_1216)

    def test_sorenson_xlong_coded_intra_block(self):  # block.rs:2071-2123
        got = _decode([0x63, 0x07, 0x06, 0x01, 0x41, 0xE6, 0x01, 0x00],
                      MacroblockType.INTRA, True,
                      _dummy_picture(version=1),
                      DecoderOption.SORENSON_SPARK_BITSTREAM)
        assert got == Block(intradc=0x318, tcoef=LONG_35_1216)


# ---------------------------------------------------------------------------
# YUV — bt601.rs golden values/images from JSON.
# ---------------------------------------------------------------------------


def _yuv_planes(img):
    w = img["y_width"]
    y = np.asarray(img["y"], dtype=np.uint8)
    h = 0 if w == 0 else len(img["y"]) // w
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return (y.reshape(h, w),
            np.asarray(img["cb"], dtype=np.uint8).reshape(ch, cw),
            np.asarray(img["cr"], dtype=np.uint8).reshape(ch, cw),
            np.asarray(img["rgba"], dtype=np.uint8).reshape(h, w, 4))


class TestYuvReferenceVectors:
    FIX = load("yuv.json")

    def test_scalar_anchors(self):  # bt601.rs:198-225
        from h263_tpu.ops.yuv import golden_yuv420_to_rgba

        for case in self.FIX["scalar"]:
            y, u, v = case["yuv"]
            got = golden_yuv420_to_rgba(
                np.full((1, 1), y, np.uint8), np.full((1, 1), u, np.uint8),
                np.full((1, 1), v, np.uint8))
            assert got[0, 0, :3].tolist() == case["rgb"], case

    @pytest.mark.parametrize("idx", range(len(FIX["images"])))
    def test_golden_images_numpy(self, idx):  # bt601.rs:329-483
        from h263_tpu.ops.yuv import golden_yuv420_to_rgba

        y, cb, cr, want = _yuv_planes(self.FIX["images"][idx])
        got = golden_yuv420_to_rgba(y, cb, cr)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("idx", range(len(FIX["images"])))
    def test_golden_images_jnp(self, idx):
        from h263_tpu.ops.yuv import yuv420_to_rgba_jnp

        y, cb, cr, want = _yuv_planes(self.FIX["images"][idx])
        if y.size == 0:
            pytest.skip("empty picture — host returns empty without dispatch")
        got = np.asarray(yuv420_to_rgba_jnp(y, cb, cr))
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Deblock — deblock.rs quartet table + 11x17 golden images from JSON.
# The reference's scalar `process` is our trunc-mode path.
# ---------------------------------------------------------------------------


class TestDeblockReferenceVectors:
    FIX = load("deblock.json")

    @staticmethod
    def _process_scalar(q, strength):
        from h263_tpu.ops.deblock import _process_np

        arrs = [np.asarray([v], np.int32) for v in q]
        return [int(x[0]) for x in _process_np(*arrs, strength, False)]

    def test_quartets(self):  # deblock.rs:352-440
        for case in self.FIX["quartets"]:
            got = self._process_scalar(case["input"], case["strength"])
            assert got == case["output"], case
            # Direction symmetry (deblock.rs:426-429).
            rev = self._process_scalar(case["input"][::-1], case["strength"])
            assert rev[::-1] == case["output"], case
            # Brightness-inversion symmetry (deblock.rs:431-438).
            inv = self._process_scalar(
                [255 - v for v in case["input"]], case["strength"])
            assert [255 - v for v in inv] == case["output"], case

    def test_process_const_noop(self):  # deblock.rs:324-334, vectorized
        from h263_tpu.ops.deblock import _process_np

        vals = np.arange(256, dtype=np.int32)
        for strength in range(1, 13):
            for floor_mode in (False, True):
                out = _process_np(vals, vals, vals, vals, strength, floor_mode)
                for o in out:
                    np.testing.assert_array_equal(o, vals)

    def test_process_symmetric_noop(self):  # deblock.rs:336-349, vectorized
        from h263_tpu.ops.deblock import _process_np

        outer, inner = np.meshgrid(np.arange(256), np.arange(256))
        outer = outer.ravel().astype(np.int32)
        inner = inner.ravel().astype(np.int32)
        for strength in (1, 4, 8, 12):
            for floor_mode in (False, True):
                a, b, c, d = _process_np(outer, inner, inner, outer,
                                         strength, floor_mode)
                np.testing.assert_array_equal(a, outer)
                np.testing.assert_array_equal(b, inner)
                np.testing.assert_array_equal(c, inner)
                np.testing.assert_array_equal(d, outer)

    @pytest.mark.parametrize("strength", [4, 8, 12])
    def test_golden_image_numpy(self, strength):  # deblock.rs:442-558
        from h263_tpu.ops.deblock import golden_deblock

        img = self.FIX["image"]
        w = img["width"]
        data = np.asarray(img["data"], np.uint8).reshape(-1, w)
        want = np.asarray(img["expected"][str(strength)], np.uint8).reshape(-1, w)
        np.testing.assert_array_equal(golden_deblock(data, strength), want)

    @pytest.mark.parametrize("strength", [4, 8, 12])
    def test_golden_image_jnp(self, strength):
        from h263_tpu.ops.deblock import deblock_jnp

        img = self.FIX["image"]
        w = img["width"]
        data = np.asarray(img["data"], np.uint8).reshape(-1, w)
        want = np.asarray(img["expected"][str(strength)], np.uint8).reshape(-1, w)
        np.testing.assert_array_equal(np.asarray(deblock_jnp(data, strength)),
                                      want)
