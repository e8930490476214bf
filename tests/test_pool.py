"""Mixed-resolution stream pool."""

import numpy as np

from h263_tpu import DecoderOption, H263Decoder, PictureTypeCode
from h263_tpu.parallel.pool import StreamPool
from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture

SORENSON = DecoderOption.SORENSON_SPARK_BITSTREAM


def _frames(seed, w, h, n=3):
    rng = np.random.default_rng(seed)
    nmb = (-(-w // 16)) * (-(-h // 16))
    out = [encode_sorenson_picture(
        w, h, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[int(rng.integers(1, 128)) * 8] * 6)
         for _ in range(nmb)], temporal_reference=0)]
    for tr in range(1, n):
        out.append(encode_sorenson_picture(
            w, h, PictureTypeCode.P_FRAME,
            [MBSpec(kind="inter", mvd=[(2, 0)],
                    blocks=[[(0, 3)], [], [], [], [], []])] * nmb,
            temporal_reference=tr))
    return out


def test_pool_mixed_resolutions():
    streams = {
        "cif_a": (352, 288, _frames(1, 352, 288)),
        "cif_b": (352, 288, _frames(2, 352, 288)),
        "qcif": (176, 144, _frames(3, 176, 144)),
        "tiny": (32, 32, _frames(4, 32, 32)),
    }
    pool = StreamPool(SORENSON)
    refs = {}
    for sid, (w, h, frames) in streams.items():
        pool.add_stream(sid, w, h)
        refs[sid] = H263Decoder(SORENSON, backend="numpy")

    for t in range(3):
        out = pool.decode_step({sid: s[2][t] for sid, s in streams.items()})
        for sid, (w, h, frames) in streams.items():
            pic = refs[sid].decode_next_picture(frames[t])
            y, cb, cr = out[sid]
            np.testing.assert_array_equal(y, pic.as_luma(), err_msg=sid)
            np.testing.assert_array_equal(cb, pic.as_chroma_b())
    rgba = pool.present_rgba(deblock=False)
    assert rgba["cif_a"].shape == (288, 352, 4)
    assert rgba["tiny"].shape == (32, 32, 4)
