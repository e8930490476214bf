"""Syntax-layer tests: picture headers, macroblocks, blocks.

Bit patterns are hand-assembled from the spec layouts (and via the
test encoder), then decoded and checked field by field.
"""

import pytest

from h263_tpu.bitio import BitReader
from h263_tpu.parser import decode_block, decode_macroblock, decode_picture
from h263_tpu.testing.encoder import BitWriter, MBSpec, encode_sorenson_picture
from h263_tpu.types import (
    DecoderOption,
    InvalidIntraDc,
    MacroblockKind,
    MacroblockType,
    MotionVectorRange,
    Picture,
    PictureOption,
    PictureTypeCode,
    SourceFormatKind,
)


def _sorenson_picture_header(**kw):
    """Parse the header of an encoded Sorenson picture."""
    data = encode_sorenson_picture(macroblocks=[], **kw)
    r = BitReader(data)
    pic = decode_picture(r, DecoderOption.SORENSON_SPARK_BITSTREAM, None)
    return pic, r


class TestSorensonHeader:
    def test_cif_iframe(self):
        pic, _ = _sorenson_picture_header(
            width=352, height=288, picture_type=PictureTypeCode.I_FRAME,
            quantizer=12, temporal_reference=77, version=1)
        assert pic.version == 1
        assert pic.temporal_reference == 77
        assert pic.format.kind is SourceFormatKind.FULL_CIF
        assert pic.format.width_and_height() == (352, 288)
        assert pic.picture_type is PictureTypeCode.I_FRAME
        assert pic.quantizer == 12
        assert pic.motion_vector_range is MotionVectorRange.UNLIMITED
        assert not (pic.options & PictureOption.USE_DEBLOCKER)

    def test_custom_8bit_dims_and_deblocker(self):
        pic, _ = _sorenson_picture_header(
            width=100, height=62, picture_type=PictureTypeCode.P_FRAME,
            quantizer=4, deblocker=True)
        assert pic.format.width_and_height() == (100, 62)
        assert pic.picture_type is PictureTypeCode.P_FRAME
        assert pic.options & PictureOption.USE_DEBLOCKER

    def test_custom_16bit_dims(self):
        pic, _ = _sorenson_picture_header(
            width=640, height=480, picture_type=PictureTypeCode.I_FRAME,
            quantizer=8)
        assert pic.format.width_and_height() == (640, 480)

    def test_disposable_pframe_and_pei(self):
        pic, _ = _sorenson_picture_header(
            width=176, height=144,
            picture_type=PictureTypeCode.DISPOSABLE_P_FRAME,
            quantizer=8, extra=b"\xDE\xAD")
        assert pic.picture_type is PictureTypeCode.DISPOSABLE_P_FRAME
        assert pic.picture_type.is_disposable()
        assert pic.extra == b"\xDE\xAD"

    def test_160x120_shorthand(self):
        pic, _ = _sorenson_picture_header(
            width=160, height=120, picture_type=PictureTypeCode.I_FRAME)
        assert pic.format.width_and_height() == (160, 120)


class TestStandardHeader:
    def test_basic_cif_iframe(self):
        w = BitWriter()
        w.write_bits(1, 17)      # PSC
        w.write_bits(0, 5)       # GN = 0 (picture)
        w.write_bits(42, 8)      # TR
        # PTYPE: '10' + split/doc/freeze=000 + format=011 (CIF)
        w.write_code("10").write_code("000").write_code("011")
        # low 5: I-flag(1) umv(0) sac(0) ap(0) pb(0)
        # (parity note: the reference maps bit 9 SET to IFrame)
        w.write_code("10000")
        w.write_bits(13, 5)      # PQUANT
        w.write_bits(0, 1)       # CPM off
        w.write_bits(0, 1)       # PEI end
        pic = decode_picture(BitReader(w.to_bytes()), DecoderOption.NONE, None)
        assert pic.version is None
        assert pic.temporal_reference == 42
        assert pic.format.kind is SourceFormatKind.FULL_CIF
        assert pic.picture_type is PictureTypeCode.I_FRAME
        assert pic.quantizer == 13
        assert not pic.has_plusptype

    def test_gob_yields_none(self):
        w = BitWriter()
        w.write_bits(1, 17)
        w.write_bits(3, 5)       # GN = 3: a real GOB, not a picture
        w.write_bits(0, 10)
        r = BitReader(w.to_bytes())
        assert decode_picture(r, DecoderOption.NONE, None) is None
        assert r.pos == 0  # rolled back

    def test_pframe_with_umv_option(self):
        w = BitWriter()
        w.write_bits(1, 17)
        w.write_bits(0, 5)
        w.write_bits(7, 8)
        w.write_code("10").write_code("000").write_code("011")
        w.write_code("01000")    # P-frame, UMV on
        w.write_bits(5, 5)
        w.write_bits(0, 1)
        w.write_bits(0, 1)
        pic = decode_picture(BitReader(w.to_bytes()), DecoderOption.NONE, None)
        assert pic.picture_type is PictureTypeCode.P_FRAME
        assert pic.options & PictureOption.UNRESTRICTED_MOTION_VECTORS


def _dummy_picture(ptype=PictureTypeCode.I_FRAME, version=None) -> Picture:
    return Picture(picture_type=ptype, version=version, quantizer=8)


class TestMacroblock:
    def test_iframe_intra_mb(self):
        w = BitWriter()
        w.write_code("1")        # MCBPC: INTRA, no chroma
        w.write_code("0011")     # CBPY: 0000 (intra sense)
        mb = decode_macroblock(BitReader(w.to_bytes()), _dummy_picture(),
                               PictureOption.NONE)
        assert mb.kind is MacroblockKind.CODED
        assert mb.mb_type is MacroblockType.INTRA
        assert mb.coded_block_pattern.codes_luma == (False,) * 4
        assert not mb.coded_block_pattern.codes_chroma_b

    def test_pframe_uncoded(self):
        w = BitWriter()
        w.write_bits(1, 1)       # COD=1
        mb = decode_macroblock(
            BitReader(w.to_bytes()),
            _dummy_picture(PictureTypeCode.P_FRAME), PictureOption.NONE)
        assert mb.kind is MacroblockKind.UNCODED

    def test_pframe_inter_with_mv(self):
        w = BitWriter()
        w.write_bits(0, 1)       # COD=0
        w.write_code("1")        # MCBPC: INTER, no chroma
        w.write_code("11")       # CBPY intra-sense 1111 -> inter 0000
        w.write_code("010")      # MVD x = +0.5
        w.write_code("0011")     # MVD y = -1.0
        mb = decode_macroblock(
            BitReader(w.to_bytes()),
            _dummy_picture(PictureTypeCode.P_FRAME), PictureOption.NONE)
        assert mb.mb_type is MacroblockType.INTER
        assert mb.coded_block_pattern.codes_luma == (False,) * 4
        assert mb.motion_vector.x == 1 and mb.motion_vector.y == -2

    def test_pframe_interq_dquant(self):
        w = BitWriter()
        w.write_bits(0, 1)
        w.write_code("011")      # INTER+Q
        w.write_code("11")       # CBPY
        w.write_bits(0b01, 2)    # DQUANT = -2
        w.write_code("1")        # MVD x=0
        w.write_code("1")        # MVD y=0
        mb = decode_macroblock(
            BitReader(w.to_bytes()),
            _dummy_picture(PictureTypeCode.P_FRAME), PictureOption.NONE)
        assert mb.mb_type is MacroblockType.INTER_Q
        assert mb.d_quantizer == -2

    def test_inter4v_reads_four_mvs(self):
        w = BitWriter()
        w.write_bits(0, 1)
        w.write_code("010")      # INTER4V
        w.write_code("11")
        for _ in range(4):
            w.write_code("010")  # x=+0.5
            w.write_code("010")  # y=+0.5
        mb = decode_macroblock(
            BitReader(w.to_bytes()),
            _dummy_picture(PictureTypeCode.P_FRAME), PictureOption.NONE)
        assert mb.mb_type is MacroblockType.INTER_4V
        assert len(mb.addl_motion_vectors) == 3

    def test_stuffing(self):
        w = BitWriter()
        w.write_code("000000001")
        mb = decode_macroblock(BitReader(w.to_bytes()), _dummy_picture(),
                               PictureOption.NONE)
        assert mb.kind is MacroblockKind.STUFFING


class TestBlock:
    def _decode(self, w, mb_type=MacroblockType.INTRA, present=True,
                options=DecoderOption.NONE, picture=None):
        return decode_block(BitReader(w.to_bytes()), options,
                            picture or _dummy_picture(), PictureOption.NONE,
                            mb_type, present)

    def test_intradc_only(self):
        w = BitWriter()
        w.write_bits(0x40, 8)    # INTRADC FLC 64 -> level 512
        blk = self._decode(w, present=False)
        assert blk.intradc == 512
        assert blk.tcoef == []

    def test_intradc_255_is_1024(self):
        w = BitWriter()
        w.write_bits(0xFF, 8)
        blk = self._decode(w, present=False)
        assert blk.intradc == 1024

    def test_invalid_intradc(self):
        for bad in (0, 128):
            w = BitWriter()
            w.write_bits(bad, 8)
            with pytest.raises(InvalidIntraDc):
                self._decode(w, present=False)

    def test_short_tcoef_run(self):
        # inter block: (0,0,+1) then (last, run=2, -1)
        w = BitWriter()
        w.write_code("10").write_bits(0, 1)       # (0,0,1) sign +
        w.write_code("001110").write_bits(1, 1)   # (1,2,1) sign -
        blk = self._decode(w, mb_type=MacroblockType.INTER)
        assert blk.intradc is None
        assert [(t.run, t.level) for t in blk.tcoef] == [(0, 1), (2, -1)]

    def test_escape_8bit(self):
        w = BitWriter()
        w.write_code("0000011")       # ESCAPE
        w.write_bits(1, 1)            # LAST
        w.write_bits(5, 6)            # RUN
        w.write_bits((-100) & 0xFF, 8)
        blk = self._decode(w, mb_type=MacroblockType.INTER)
        assert [(t.run, t.level, t.is_short) for t in blk.tcoef] == [(5, -100, False)]

    def test_sorenson_v1_escape_widths(self):
        pic = _dummy_picture(version=1)
        # 7-bit escape, level -64
        w = BitWriter()
        w.write_code("0000011").write_bits(0, 1)
        w.write_bits(1, 1).write_bits(3, 6).write_bits((-64) & 0x7F, 7)
        blk = self._decode(w, mb_type=MacroblockType.INTER,
                           options=DecoderOption.SORENSON_SPARK_BITSTREAM,
                           picture=pic)
        assert blk.tcoef[0].level == -64 and blk.tcoef[0].run == 3
        # 11-bit escape, level 600
        w = BitWriter()
        w.write_code("0000011").write_bits(1, 1)
        w.write_bits(1, 1).write_bits(0, 6).write_bits(600, 11)
        blk = self._decode(w, mb_type=MacroblockType.INTER,
                           options=DecoderOption.SORENSON_SPARK_BITSTREAM,
                           picture=pic)
        assert blk.tcoef[0].level == 600

    def test_sorenson_v0_uses_8bit_escape(self):
        pic = _dummy_picture(version=0)
        w = BitWriter()
        w.write_code("0000011")
        w.write_bits(1, 1).write_bits(0, 6).write_bits(77, 8)
        blk = self._decode(w, mb_type=MacroblockType.INTER,
                           options=DecoderOption.SORENSON_SPARK_BITSTREAM,
                           picture=pic)
        assert blk.tcoef[0].level == 77
