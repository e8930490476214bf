"""Checkpoint/resume: suspending mid-GOP and resuming must be bit-exact."""

import io
import json
import pickle

import numpy as np
import pytest

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

    dec = BatchedStreamDecoder(2, W, H, coef_transport="split")
    assert dec._split
    dec.decode_step([f0, f0])
    resumed = load_batched_state(save_batched_state(dec),
                                 coef_transport="split")
    assert resumed._split
    ya = np.asarray(dec.decode_step([f1, f1])[0])
    yb = np.asarray(resumed.decode_step([f1, f1])[0])
    np.testing.assert_array_equal(ya, yb)


def test_v2_format_is_versioned_npz():
    """The blob is a zip (np.savez) with a JSON meta member — no pickle."""
    dec = H263Decoder(SORENSON, backend="numpy")
    for f in _gop(3)[:2]:
        dec.decode_next_picture(f)
    blob = save_decoder_state(dec)
    assert blob.startswith(b"PK\x03\x04")
    z = np.load(io.BytesIO(blob), allow_pickle=False)
    meta = json.loads(bytes(z["meta"]).decode("utf-8"))
    assert meta["format_version"] == 2
    assert meta["kind"] == "decoder"
    assert len(meta["pictures"]) >= 1
    # Every plane referenced by meta exists as a real array member.
    for p in meta["pictures"]:
        for suffix in ("y", "cb", "cr"):
            assert z[f"{p['planes']}_{suffix}"].dtype == np.uint8


def _v1_decoder_blob(dec) -> bytes:
    """Reproduce the round-1 pickle writer byte-for-byte in schema."""
    pictures = {}
    for tr, pic in dec.reference_states.items():
        pictures[tr] = {
            "header": pic.picture_header,
            "format": pic.format,
            "luma": np.asarray(pic.luma),
            "chroma_b": np.asarray(pic.chroma_b),
            "chroma_r": np.asarray(pic.chroma_r),
        }
    return pickle.dumps({
        "version": 1,
        "decoder_options": int(dec.decoder_options),
        "backend": dec.backend,
        "last_picture": dec.last_picture,
        "reference_picture": dec.reference_picture,
        "running_options": int(dec.running_options),
        "pictures": pictures,
    })


def test_v1_blob_still_loads():
    """Cross-version load: a round-1 pickle checkpoint resumes bit-exactly."""
    frames = _gop(4)
    ref = H263Decoder(SORENSON, backend="numpy")
    dec = H263Decoder(SORENSON, backend="numpy")
    for f in frames[:3]:
        ref.decode_next_picture(f)
        dec.decode_next_picture(f)
    resumed = load_decoder_state(_v1_decoder_blob(dec))
    for f in frames[3:]:
        a = ref.decode_next_picture(f)
        b = resumed.decode_next_picture(f)
        np.testing.assert_array_equal(a.as_luma(), b.as_luma())


def _gop_4v(seed, width=32, height=32, n=6):
    """GOP whose P-frames carry INTER4V MBs (varied block MVs): flips the
    fused transport's sticky full-MV mode (batch.py _mv_full)."""
    rng = np.random.default_rng(seed)
    nmb = (width // 16) * (height // 16)
    frames = [encode_sorenson_picture(
        width, height, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[int(rng.integers(1, 128)) * 8] * 6)
         for _ in range(nmb)], temporal_reference=0)]
    for tr in range(1, n):
        mbs = []
        for _ in range(nmb):
            if rng.random() < 0.5:
                mbs.append(MBSpec(
                    kind="inter",
                    mvd=[(2, 0), (0, 2), (-2, 0), (0, -2)],
                    blocks=[[(0, 3)], [], [], [], [], []]))
            else:
                mbs.append(MBSpec(
                    kind="inter", mvd=[(0, 0)],
                    blocks=[[], [], [], [], [], []]))
        frames.append(encode_sorenson_picture(
            width, height, PictureTypeCode.P_FRAME, mbs,
            temporal_reference=tr))
    return frames


def test_batched_sticky_state_survives():
    """The slim->full MV flip (_mv_full) and standard-format sticky
    (_std_prev_fmt) are part of the checkpointed state."""
    n = 2
    streams = [_gop_4v(20 + i) for i in range(n)]
    ref = BatchedStreamDecoder(n, 32, 32, SORENSON)
    dec = BatchedStreamDecoder(n, 32, 32, SORENSON)
    for t in range(3):
        bufs = [streams[i][t] for i in range(n)]
        ref.decode_step(bufs)
        dec.decode_step(bufs)
    assert dec._mv_full  # the 4V frames flipped the sticky mode

    resumed = load_batched_state(save_batched_state(dec))
    assert resumed._mv_full == dec._mv_full
    np.testing.assert_array_equal(resumed._std_prev_fmt, dec._std_prev_fmt)
    for t in range(3, 6):
        bufs = [streams[i][t] for i in range(n)]
        ya, _, _ = ref.decode_step(bufs)
        yb, _, _ = resumed.decode_step(bufs)
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


def test_batched_standard_h263_roundtrip():
    """Standard-H.263 batched resume: format inheritance state survives so
    post-resume P-frames decode bit-exactly."""
    from h263_tpu.testing.encoder import encode_standard_picture

    nmb = 8 * 6  # SQCIF (standard pictures must use a standard format)
    frames = [encode_standard_picture(
        128, 96, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[800] * 6)] * nmb)]
    for tr in range(1, 5):
        frames.append(encode_standard_picture(
            128, 96, PictureTypeCode.P_FRAME,
            [MBSpec(kind="inter", mvd=[(2, 0)],
                    blocks=[[(0, 4)], [], [], [], [], []])] * nmb,
            temporal_reference=tr))
    ref = BatchedStreamDecoder(2, 128, 96, DecoderOption.NONE)
    dec = BatchedStreamDecoder(2, 128, 96, DecoderOption.NONE)
    for f in frames[:2]:
        ref.decode_step([f, f])
        dec.decode_step([f, f])

    resumed = load_batched_state(save_batched_state(dec))
    np.testing.assert_array_equal(resumed._std_prev_fmt, dec._std_prev_fmt)
    assert (np.asarray(resumed._std_prev_fmt) >= 0).all()
    for f in frames[2:]:
        ya, _, _ = ref.decode_step([f, f])
        yb, _, _ = resumed.decode_step([f, f])
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


def test_device_frontend_roundtrip():
    """DeviceFrontendDecoder mid-GOP save/resume is bit-exact and carries
    the presentation + repair sidecar state."""
    from h263_tpu.parallel.device_batch import DeviceFrontendDecoder
    from h263_tpu.utils.checkpoint import (load_device_frontend_state,
                                           save_device_frontend_state)

    n = 3
    streams = [_gop(30 + i) for i in range(n)]
    ref = DeviceFrontendDecoder(n, 32, 32, SORENSON)
    dec = DeviceFrontendDecoder(n, 32, 32, SORENSON)
    for t in range(3):
        bufs = [streams[i][t] for i in range(n)]
        ref.decode_step(bufs)
        dec.decode_step(bufs)

    blob = save_device_frontend_state(dec)
    resumed = load_device_frontend_state(blob)
    np.testing.assert_array_equal(resumed._last_quant, dec._last_quant)
    np.testing.assert_array_equal(resumed._last_deblock, dec._last_deblock)
    assert resumed._pictures == dec._pictures
    assert resumed._last_buffers == [bytes(b) for b in dec._last_buffers]
    np.testing.assert_array_equal(resumed.fetch_status(), dec.fetch_status())
    for t in range(3, 6):
        bufs = [streams[i][t] for i in range(n)]
        ya, cba, _ = ref.decode_step(bufs)
        yb, cbb, _ = resumed.decode_step(bufs)
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
        np.testing.assert_array_equal(np.asarray(cba), np.asarray(cbb))


def test_pool_roundtrip_mixed_buckets():
    """Whole-pool checkpoint: membership, slot maps, free slots, and
    pending registrations all survive; resumed decode is bit-exact."""
    from h263_tpu.parallel.pool import StreamPool
    from h263_tpu.utils.checkpoint import load_pool_state, save_pool_state

    gop_a = _gop(40)
    gop_b = _gop(41)
    gop_c = _gop(42, width=48, height=32)
    gop_d = _gop(43, width=64, height=48)

    def build():
        pool = StreamPool()
        pool.add_stream("a", 32, 32)
        pool.add_stream(5, 32, 32)        # int stream id
        pool.add_stream("c", 48, 32)
        for t in range(3):
            pool.decode_step({"a": gop_a[t], 5: gop_b[t], "c": gop_c[t]})
        pool.remove_stream(5)             # leaves a free slot behind
        pool.add_stream("d", 64, 48)      # pending: never decoded yet
        return pool

    ref = build()
    pool = build()
    resumed = load_pool_state(save_pool_state(pool))

    assert resumed._dims == pool._dims
    assert resumed._pending == pool._pending
    for key, bucket in pool._buckets.items():
        rb = resumed._buckets[key]
        assert rb.slots == bucket.slots
        assert rb.free == bucket.free
    for t in range(3, 5):
        bufs = {"a": gop_a[t], "c": gop_c[t], "d": gop_d[t - 3]}
        ra = ref.decode_step(dict(bufs))
        rb = resumed.decode_step(dict(bufs))
        for sid in bufs:
            ya, _, _ = ra[sid]
            yb, _, _ = rb[sid]
            np.testing.assert_array_equal(ya, yb, err_msg=f"{sid} t={t}")


def test_pool_device_frontend_roundtrip():
    """Pool checkpoint over device-front-end buckets."""
    from h263_tpu.parallel.pool import StreamPool
    from h263_tpu.utils.checkpoint import load_pool_state, save_pool_state

    gops = [_gop(50), _gop(51)]

    def build():
        pool = StreamPool(frontend="device")
        pool.add_stream("x", 32, 32)
        pool.add_stream("y", 32, 32)
        for t in range(3):
            pool.decode_step({"x": gops[0][t], "y": gops[1][t]})
        return pool

    ref = build()
    resumed = load_pool_state(save_pool_state(build()))
    assert resumed.frontend == "device"
    for t in range(3, 6):
        bufs = {"x": gops[0][t], "y": gops[1][t]}
        ra = ref.decode_step(dict(bufs))
        rb = resumed.decode_step(dict(bufs))
        for sid in bufs:
            np.testing.assert_array_equal(ra[sid][0], rb[sid][0])


def test_pool_checkpoint_rejects_unserializable():
    """Non-str/int stream ids and non-JSON decoder kwargs fail loudly."""
    from h263_tpu.parallel.pool import StreamPool
    from h263_tpu.utils.checkpoint import save_pool_state

    pool = StreamPool()
    pool.add_stream(("tuple", "sid"), 32, 32)
    with pytest.raises(TypeError, match="stream id"):
        save_pool_state(pool)

    pool2 = StreamPool(pallas=object())
    with pytest.raises(TypeError, match="decoder_kwargs"):
        save_pool_state(pool2)


def test_picture_dict_roundtrip_all_fields():
    """Every Picture header field survives the JSON schema."""
    from h263_tpu.types import (BPictureQuantizer, MotionVectorRange, Picture,
                                PictureOption, PictureTypeCode,
                                ReferencePictureSelectionMode,
                                ScalabilityLayer, SliceSubmode, SourceFormat)
    from h263_tpu.utils.checkpoint import picture_from_dict, picture_to_dict

    pic = Picture(
        version=1,
        temporal_reference=345,
        format=SourceFormat.extended(180, 140),
        options=PictureOption.USE_DEBLOCKER | PictureOption.ADVANCED_PREDICTION,
        has_plusptype=True,
        has_opptype=True,
        picture_type=PictureTypeCode.PB_FRAME,
        motion_vector_range=MotionVectorRange.EXTENDED,
        slice_submode=SliceSubmode.RECTANGULAR_SLICES,
        scalability_layer=ScalabilityLayer(3, None),
        reference_picture_selection_mode=(
            ReferencePictureSelectionMode.REQUEST_ACKNOWLEDGEMENT),
        prediction_reference=77,
        quantizer=13,
        multiplex_bitstream=2,
        pb_reference=5,
        pb_quantizer=BPictureQuantizer.SEVEN,
        extra=b"\x01\x02",
    )
    d = json.loads(json.dumps(picture_to_dict(pic)))  # force JSON round-trip
    back = picture_from_dict(d)
    assert back == pic
    assert picture_from_dict(picture_to_dict(None)) is None
