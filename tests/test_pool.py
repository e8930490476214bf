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


def test_pool_dynamic_join_leave_recycle():
    """Streams join mid-run (slot recycle + bucket growth), leave, and the
    pool's output stays bit-exact vs independent single-stream decoders."""
    pool = StreamPool(SORENSON)
    refs = {}

    def start(sid, seed, w=32, h=32, n=6):
        pool.add_stream(sid, w, h)
        refs[sid] = (H263Decoder(SORENSON, backend="numpy"),
                     _frames(seed, w, h, n=n))

    def check(out, sid, t):
        dec, frames = refs[sid]
        pic = dec.decode_next_picture(frames[t])
        y, cb, cr = out[sid]
        np.testing.assert_array_equal(y, pic.as_luma(), err_msg=f"{sid}@{t}")
        np.testing.assert_array_equal(cr, pic.as_chroma_r(), err_msg=sid)

    start("a", 1)
    start("b", 2)
    out = pool.decode_step({"a": refs["a"][1][0], "b": refs["b"][1][0]})
    check(out, "a", 0); check(out, "b", 0)

    # c joins after the bucket finalized (forces growth: no free slots)
    start("c", 3)
    out = pool.decode_step({"a": refs["a"][1][1], "b": refs["b"][1][1],
                            "c": refs["c"][1][0]})
    check(out, "a", 1); check(out, "b", 1); check(out, "c", 0)

    # b leaves; its slot pads. a and c continue bit-exactly.
    pool.remove_stream("b")
    out = pool.decode_step({"a": refs["a"][1][2], "c": refs["c"][1][1]})
    assert set(out) == {"a", "c"}
    check(out, "a", 2); check(out, "c", 1)

    # d recycles b's slot with fresh state (its I-frame decodes clean)
    start("d", 4)
    out = pool.decode_step({"a": refs["a"][1][3], "c": refs["c"][1][2],
                            "d": refs["d"][1][0]})
    check(out, "a", 3); check(out, "c", 2); check(out, "d", 0)


def test_pool_absent_stream_keeps_state():
    """A registered stream that skips steps resumes bit-exactly: its slot
    pads with skip frames and neither its planes nor its header state move."""
    pool = StreamPool(SORENSON)
    fa = _frames(7, 32, 32, n=4)
    fb = _frames(8, 32, 32, n=4)
    pool.add_stream("a", 32, 32)
    pool.add_stream("b", 32, 32)
    ra = H263Decoder(SORENSON, backend="numpy")
    rb = H263Decoder(SORENSON, backend="numpy")

    pool.decode_step({"a": fa[0], "b": fb[0]})
    ra.decode_next_picture(fa[0]); rb.decode_next_picture(fb[0])

    # b sits out two steps while a decodes
    for t in (1, 2):
        out = pool.decode_step({"a": fa[t]})
        assert set(out) == {"a"}
        pic = ra.decode_next_picture(fa[t])
        np.testing.assert_array_equal(out["a"][0], pic.as_luma())

    # b resumes with ITS OWN frame 1 (P-frame onto its frame-0 reference)
    out = pool.decode_step({"a": fa[3], "b": fb[1]})
    pa = ra.decode_next_picture(fa[3])
    pb = rb.decode_next_picture(fb[1])
    np.testing.assert_array_equal(out["a"][0], pa.as_luma())
    np.testing.assert_array_equal(out["b"][0], pb.as_luma(), err_msg="b resumed")


def test_pool_resolution_switch_rebuckets():
    """A stream switching CIF->QCIF at an I-frame rebuckets transparently
    and matches a single-stream decoder across the switch."""
    pool = StreamPool(SORENSON)
    cif = _frames(11, 48, 32, n=2)       # "CIF" bucket (small dims for speed)
    qcif = _frames(12, 32, 16, n=3)      # post-switch GOP at new dims
    other = _frames(13, 32, 16, n=5)     # a stream already at the new dims
    pool.add_stream("x", 48, 32)
    pool.add_stream("o", 32, 16)
    ref = H263Decoder(SORENSON, backend="numpy")
    refo = H263Decoder(SORENSON, backend="numpy")

    seq = [cif[0], cif[1], qcif[0], qcif[1], qcif[2]]  # switch at t=2
    for t, fx in enumerate(seq):
        out = pool.decode_step({"x": fx, "o": other[t]})
        pic = ref.decode_next_picture(fx)
        po = refo.decode_next_picture(other[t])
        np.testing.assert_array_equal(out["x"][0], pic.as_luma(),
                                      err_msg=f"x@{t}")
        np.testing.assert_array_equal(out["o"][0], po.as_luma())
    assert pool._dims["x"] == (32, 16)
    rgba = pool.present_rgba(deblock=False)
    assert rgba["x"].shape == (16, 32, 4)


def test_pool_resolution_switch_on_pframe_rejected():
    """Dims change on a non-I frame is a per-stream error (no reference
    exists at the new size)."""
    import pytest
    from h263_tpu.types import PictureFormatInvalid

    pool = StreamPool(SORENSON)
    a = _frames(14, 32, 32, n=2)
    b = _frames(15, 48, 48, n=3)
    pool.add_stream("s", 32, 32)
    pool.decode_step({"s": a[0]})
    with pytest.raises(PictureFormatInvalid):
        pool.decode_step({"s": b[1]})  # P-frame at foreign dims
