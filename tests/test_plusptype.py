"""PLUSPTYPE header paths: UFEP/OPPTYPE/MPPTYPE, CPFMT, UUI, option
carry-forward — hand-assembled bit patterns per H.263 5.1.4."""

import numpy as np
import pytest

from h263_tpu import DecoderOption, H263Decoder
from h263_tpu.bitio import BitReader
from h263_tpu.parser import decode_picture
from h263_tpu.testing.encoder import BitWriter, MBSpec, encode_macroblock
from h263_tpu.types import (
    MotionVectorRange,
    PictureOption,
    PictureTypeCode,
    PixelAspectRatio,
    SourceFormatKind,
)


def _plusptype_header(w_pix=176, h_pix=144, ptype_bits="000", umv=True,
                      ufep=True, tr=5, quant=9):
    w = BitWriter()
    w.write_bits(1, 17)          # PSC
    w.write_bits(0, 5)           # GN
    w.write_bits(tr, 8)          # TR
    w.write_code("10000")        # PTYPE: '10' + no split/doc/freeze
    w.write_code("111")          # source format 7 => PLUSPTYPE
    if ufep:
        w.write_code("001")      # UFEP: OPPTYPE present
        w.write_code("110")      # OPPTYPE fmt = custom
        w.write_bits(0, 1)       # custom PCF off
        w.write_bits(1 if umv else 0, 1)
        w.write_bits(0, 9)       # sac/ap/aic/df/ss/rps/isd/aiv/mq off
        w.write_code("1000")     # mandatory tail
    else:
        w.write_code("000")      # UFEP: no OPPTYPE
    w.write_code(ptype_bits)     # MPPTYPE picture type
    w.write_code("000")          # rprp/rru/rounding off
    w.write_code("001")          # mandatory tail
    w.write_bits(0, 1)           # CPM off
    if ufep:
        # CPFMT: PAR=0001 (square), PWI, '1', PHI (8 bits used by parser)
        w.write_bits(0b0001, 4)
        w.write_bits(w_pix // 4 - 1, 9)
        w.write_bits(1, 1)
        w.write_bits(h_pix // 4, 9)
        if umv:
            w.write_bits(1, 1)   # UUI: '1' => Extended range
    w.write_bits(quant, 5)
    w.write_bits(0, 1)           # PEI end
    return w


def test_plusptype_custom_format():
    w = _plusptype_header()
    pic = decode_picture(BitReader(w.to_bytes()), DecoderOption.NONE, None)
    assert pic.has_plusptype and pic.has_opptype
    assert pic.format.kind is SourceFormatKind.EXTENDED
    assert pic.format.width_and_height() == (176, 144)
    assert pic.format.custom.pixel_aspect_ratio is PixelAspectRatio.SQUARE
    assert pic.picture_type is PictureTypeCode.I_FRAME
    assert pic.options & PictureOption.UNRESTRICTED_MOTION_VECTORS
    assert pic.motion_vector_range is MotionVectorRange.EXTENDED
    assert pic.quantizer == 9
    assert pic.temporal_reference == 5


def test_plusptype_without_opptype_carries_options_forward():
    """UFEP=0 carries OPPTYPE options forward from the previous header.

    Previous picture must itself lack a stated format here: the reference
    treats `previous.format != current.format` (None vs Some) as an RPRP
    trigger and bails unimplemented (picture.rs:760-770) — see the quirk
    test below.
    """
    first = _plusptype_header(ufep=False)
    pic1 = decode_picture(BitReader(first.to_bytes()), DecoderOption.NONE, None)
    assert pic1.format is None

    # hand the carry-forward a previous header with UMV set
    pic1.options |= PictureOption.UNRESTRICTED_MOTION_VECTORS
    second = _plusptype_header(ufep=False, ptype_bits="001", tr=6)
    pic2 = decode_picture(BitReader(second.to_bytes()), DecoderOption.NONE, pic1)
    assert pic2.has_plusptype and not pic2.has_opptype
    assert pic2.options & PictureOption.UNRESTRICTED_MOTION_VECTORS
    assert pic2.picture_type is PictureTypeCode.P_FRAME
    assert pic2.format is None  # inherited later by the state machine


def test_format_change_triggers_unimplemented_rprp():
    """Parity quirk: a header whose stated format differs from the previous
    header's (incl. None vs custom) hits the reference's unimplemented
    RPRP path (picture.rs:760-770)."""
    import pytest

    from h263_tpu.types import UnimplementedDecoding

    first = _plusptype_header()
    pic1 = decode_picture(BitReader(first.to_bytes()), DecoderOption.NONE, None)
    second = _plusptype_header(ufep=False, ptype_bits="001", tr=6)
    with pytest.raises(UnimplementedDecoding):
        decode_picture(BitReader(second.to_bytes()), DecoderOption.NONE, pic1)


def test_plusptype_e2e_decode_with_umv():
    """Full decode of a PLUSPTYPE custom-format picture; UMV fixed codes
    for motion vectors (reader.rs:298-324 path)."""
    nmb = (176 // 16) * (144 // 16)
    w = _plusptype_header()
    for _ in range(nmb):
        encode_macroblock(w, MBSpec(kind="intra", intradc=[800] * 6),
                          PictureTypeCode.I_FRAME, None)
    f0 = w.to_bytes()

    # P-frame with UMV-coded motion vectors.  UMV code '1' = 0; '0 00' = +1.
    w2 = _plusptype_header(ptype_bits="001", tr=6)
    for _ in range(nmb):
        w2.write_bits(0, 1)      # COD coded
        w2.write_code("1")       # MCBPC INTER no chroma
        w2.write_code("11")      # CBPY (inter sense: none coded)
        w2.write_code("000")     # UMV x: '0' then '00' => +1 halfpel
        w2.write_code("1")       # UMV y: 0
    f1 = w2.to_bytes()

    dj = H263Decoder(DecoderOption.NONE, backend="jax")
    dn = H263Decoder(DecoderOption.NONE, backend="numpy")
    for buf in (f0, f1):
        pj = dj.decode_next_picture(buf)
        pn = dn.decode_next_picture(buf)
        np.testing.assert_array_equal(np.asarray(pj.as_luma()), pn.as_luma())
    assert dn.get_last_picture().as_luma().shape == (144, 176)


def test_cpfmt_phi_8bit_quirk():
    """The reference reads only 8 of CPFMT's 9 PHI bits (picture.rs:384);
    heights >= 1024 therefore alias.  Parity check: h=1024 -> PHI=256 ->
    8-bit truncation -> height 0."""
    w = _plusptype_header(w_pix=176, h_pix=1024)
    pic = decode_picture(BitReader(w.to_bytes()), DecoderOption.NONE, None)
    assert pic.format.width_and_height() == (176, 0)


def test_plusptype_umv_batched_packed_transport():
    """The same PLUSPTYPE+UMV stream through the batched packed transport
    (Python headers + native packed MB parse) matches the single-stream
    decoder bit for bit."""
    from h263_tpu.native import ensure_built
    from h263_tpu.parallel import BatchedStreamDecoder

    if not ensure_built():
        pytest.skip("native front-end unavailable")

    nmb = (176 // 16) * (144 // 16)
    w = _plusptype_header()
    for _ in range(nmb):
        encode_macroblock(w, MBSpec(kind="intra", intradc=[800] * 6),
                          PictureTypeCode.I_FRAME, None)
    f0 = w.to_bytes()
    w2 = _plusptype_header(ptype_bits="001", tr=6)
    for _ in range(nmb):
        w2.write_bits(0, 1)
        w2.write_code("1")
        w2.write_code("11")
        w2.write_code("000")
        w2.write_code("1")
    f1 = w2.to_bytes()

    dec = BatchedStreamDecoder(2, 176, 144, DecoderOption.NONE)
    ref = H263Decoder(DecoderOption.NONE, backend="numpy")
    for buf in (f0, f1):
        y, cb, cr = dec.decode_step([buf, buf], transport="packed")
        pic = ref.decode_next_picture(buf)
        np.testing.assert_array_equal(np.asarray(y)[0], pic.as_luma())
        np.testing.assert_array_equal(np.asarray(y)[1], pic.as_luma())


def test_rpsmf_mapping_matches_reference():
    """picture.rs:477-497: the raw RPSMF bits are NOT the flag values —
    RESERVED is set when bit 0x4 is ABSENT, 0x2 requests NACKs, 0x1
    requests ACKs.  (Previously the raw bits were cast to the flag enum,
    making every decoded value wrong.)"""
    from h263_tpu.types import ReferencePictureSelectionMode as RPSM

    def hdr(rpsmf_bits):
        w = BitWriter()
        w.write_bits(1, 17)
        w.write_bits(0, 5)
        w.write_bits(5, 8)
        w.write_code("10000")
        w.write_code("111")          # PLUSPTYPE
        w.write_code("001")          # UFEP: OPPTYPE
        w.write_code("010")          # fmt QCIF
        w.write_bits(0, 1)
        w.write_bits(0, 1)
        w.write_bits(0b000001000, 9)  # REFERENCE_PICTURE_SELECTION on
        w.write_code("1000")
        w.write_code("000")
        w.write_code("000")
        w.write_code("001")
        w.write_bits(0, 1)            # CPM
        w.write_bits(rpsmf_bits, 3)   # RPSMF
        w.write_bits(0, 1)            # TRPI absent
        w.write_code("01")            # BCM: none
        w.write_bits(9, 5)
        w.write_bits(0, 1)
        return w.to_bytes()

    cases = {
        0b100: RPSM(0),
        0b101: RPSM.REQUEST_ACKNOWLEDGEMENT,
        0b110: RPSM.REQUEST_NEGATIVE_ACKNOWLEDGEMENT,
        0b111: (RPSM.REQUEST_ACKNOWLEDGEMENT
                | RPSM.REQUEST_NEGATIVE_ACKNOWLEDGEMENT),
        0b000: RPSM.RESERVED,
        0b001: RPSM.RESERVED | RPSM.REQUEST_ACKNOWLEDGEMENT,
        0b010: RPSM.RESERVED | RPSM.REQUEST_NEGATIVE_ACKNOWLEDGEMENT,
    }
    for raw, want in cases.items():
        pic = decode_picture(BitReader(hdr(raw)), DecoderOption.NONE, None)
        assert pic.reference_picture_selection_mode == want, bin(raw)
