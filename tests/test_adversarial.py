"""Adversarial PEI-chain and MCBPC-stuffing streams (VERDICT r3 #7).

Real Flash-era encoders used PEI spare bytes and macroblock stuffing in
ways the synthetic corpora never exercise: long PEI chains whose payload
bytes masquerade as start-code prefixes, and stuffing macroblocks
scattered through both I and P pictures (the reference consumes and
ignores them — macroblock.rs:465-470 maps MCBPC stuffing to a decode
retry without advancing the MB address).  These streams must decode
bit-identically on all three front-ends: the Python reference path, the
native batch parse behind BatchedStreamDecoder, and the device entropy
automaton.
"""

import numpy as np
import pytest

from h263_tpu import H263Decoder
from h263_tpu.parallel.batch import BatchedStreamDecoder
from h263_tpu.parallel.device_batch import DeviceFrontendDecoder
from h263_tpu.parser import decode_picture
from h263_tpu.bitio import BitReader
from h263_tpu.testing.encoder import (MBSpec, encode_sorenson_picture,
                                      encode_standard_picture, BitWriter)
from h263_tpu.types import DecoderOption, PictureTypeCode

SORENSON = DecoderOption.SORENSON_SPARK_BITSTREAM
W, H = 96, 80
NMB = (W // 16) * (-(-H // 16))


def _mbs_intra(rng, stuff_every=0):
    mbs = []
    for i in range(NMB):
        if stuff_every and i % stuff_every == stuff_every - 1:
            # A stuffing MB is EXTRA symbol traffic before this position's
            # real MB — it does not consume an MB address.
            mbs.append(MBSpec(kind="stuffing"))
        mbs.append(MBSpec(
            kind="intra",
            intradc=[int(rng.integers(1, 254)) * 8 for _ in range(6)],
            blocks=[[(0, int(rng.integers(1, 6)))], [], [], [], [], []]))
    return mbs


def _mbs_inter(rng, stuff_every=0):
    mbs = []
    for i in range(NMB):
        if stuff_every and i % stuff_every == 0:
            mbs.append(MBSpec(kind="stuffing"))
        if i % 3 == 0:
            mbs.append(MBSpec(
                kind="inter",
                mvd=[(int(rng.integers(-6, 7)), int(rng.integers(-4, 5)))],
                blocks=[[(0, 2)], [], [(1, -3)], [], [], []]))
        else:
            mbs.append(MBSpec(kind="uncoded"))
    return mbs


# PEI payloads chosen adversarially: zero runs (start-code prefix shape),
# 0x80 (PSC tail byte patterns), and a full 0x00..0xff ramp.
_PEI_CHAINS = [
    b"\x00" * 16,
    b"\x00\x00\x80\x00\x00\x80" * 5,
    bytes(range(256))[:48],
]


@pytest.mark.parametrize("pei", _PEI_CHAINS, ids=["zeros", "pscish", "ramp"])
def test_pei_stuffing_gop_three_frontends_agree(pei):
    rng = np.random.default_rng(hash(pei) % 2**32)
    f0 = encode_sorenson_picture(W, H, PictureTypeCode.I_FRAME,
                                 _mbs_intra(rng, stuff_every=4),
                                 quantizer=7, extra=pei)
    f1 = encode_sorenson_picture(W, H, PictureTypeCode.P_FRAME,
                                 _mbs_inter(rng, stuff_every=5),
                                 quantizer=7, temporal_reference=3,
                                 extra=pei)
    f2 = encode_sorenson_picture(W, H, PictureTypeCode.P_FRAME,
                                 _mbs_inter(rng), quantizer=7,
                                 temporal_reference=6,
                                 extra=pei * 2)

    single = H263Decoder(SORENSON, backend="numpy")
    host = BatchedStreamDecoder(2, W, H, SORENSON)
    dev = DeviceFrontendDecoder(2, W, H, SORENSON)
    for t, f in enumerate((f0, f1, f2)):
        pic = single.decode_next_picture(f)
        gy = np.asarray(pic.as_luma())
        yh, cbh, crh = host.decode_step([f, f])
        yd, cbd, crd = dev.decode_step([f, f])
        np.testing.assert_array_equal(np.asarray(yh)[0], gy,
                                      err_msg=f"host frame {t}")
        np.testing.assert_array_equal(np.asarray(yd)[0], gy,
                                      err_msg=f"device frame {t}")
        np.testing.assert_array_equal(np.asarray(cbh), np.asarray(cbd),
                                      err_msg=f"cb frame {t}")
        np.testing.assert_array_equal(np.asarray(crh), np.asarray(crd),
                                      err_msg=f"cr frame {t}")
    assert (dev.fetch_status() == 0).all()


def test_pei_chain_standard_header():
    """A standard (non-Sorenson) picture header carrying a long PEI chain
    parses to the same picture fields as the chain-free header (PEI is
    spare info — picture.rs:218-226 consumes PSPARE bytes untyped)."""
    base = encode_standard_picture(176, 144, PictureTypeCode.I_FRAME,
                                   [], quantizer=9)
    r0 = BitReader(base)
    p0 = decode_picture(r0, DecoderOption.NONE, None)

    w = BitWriter()
    w.write_bits(1, 17)
    w.write_bits(0, 5)
    w.write_bits(0, 8)
    w.write_code("10")
    w.write_code("000")
    w.write_bits(2, 3)                 # QCIF
    w.write_bits(1, 1)                 # I
    w.write_bits(0, 4)                 # umv/sac/ap/pb off
    w.write_bits(9, 5)                 # PQUANT
    w.write_bits(0, 1)                 # CPM off
    for b in b"\x00\x00\x80" * 21:     # 63-byte adversarial PEI chain
        w.write_bits(1, 1)
        w.write_bits(b, 8)
    w.write_bits(0, 1)                 # PEI end
    r1 = BitReader(w.to_bytes())
    p1 = decode_picture(r1, DecoderOption.NONE, None)

    assert p1.format == p0.format
    assert p1.quantizer == p0.quantizer
    assert p1.picture_type == p0.picture_type
    assert len(p1.extra) == 63


def test_stuffing_only_frame_is_uncoded():
    """A P-frame whose MB layer is nothing but stuffing symbols + uncoded
    MBs must reproduce the reference planes exactly (pure symbol noise,
    zero pixel effect)."""
    rng = np.random.default_rng(7)
    f0 = encode_sorenson_picture(W, H, PictureTypeCode.I_FRAME,
                                 _mbs_intra(rng), quantizer=6)
    mbs = []
    for _ in range(NMB):
        mbs.append(MBSpec(kind="stuffing"))
        mbs.append(MBSpec(kind="uncoded"))
    f1 = encode_sorenson_picture(W, H, PictureTypeCode.P_FRAME, mbs,
                                 quantizer=6, temporal_reference=2)
    host = BatchedStreamDecoder(1, W, H, SORENSON)
    y0, _, _ = host.decode_step([f0])
    y1, _, _ = host.decode_step([f1])
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
