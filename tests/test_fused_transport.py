"""Fused single-leaf transport (round 3): parity + edge cases.

The production Sorenson batch path ships each step as ONE uint8 leaf of
per-stream rows [int8 MVs | INTER bitmask | delta24 coefficients]
(entropy.cpp h263_sorenson_decode_batch_fused ->
reconstruct.reconstruct_frame_packed_d24_fused).  These tests pin it
against the legacy three-leaf d24 transport and the scalar reference
decoder (decoder/state.py), including the sticky slim->full MV row flip
and the EOF tail-fill semantics (state.rs:419-427).
"""

import numpy as np
import pytest

from h263_tpu.decoder.state import H263Decoder
from h263_tpu.testing import build_batched_decoder
from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture
from h263_tpu.types import DecoderOption, PictureTypeCode

SORENSON = DecoderOption.SORENSON_SPARK_BITSTREAM


def _native_or_skip():
    from h263_tpu.native import ensure_built

    if not ensure_built():
        pytest.skip("native front-end unavailable")


def _decoder(n, w, h, fused: bool, **kw):
    return build_batched_decoder(n, w, h, SORENSON, fused=fused, **kw)


def _random_gop(w, h, n_frames, seed, fourv_frames=()):
    rng = np.random.default_rng(seed)
    mbw, mbh = -(-w // 16), -(-h // 16)
    nmb = mbw * mbh
    frames = [encode_sorenson_picture(
        w, h, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[int(rng.integers(1, 128)) * 8] * 6,
                blocks=[[(int(rng.integers(0, 3)), int(rng.integers(1, 9)))],
                        [], [], [], [], []])
         for _ in range(nmb)])]
    for tr in range(1, n_frames):
        mbs = []
        for _ in range(nmb):
            r = rng.random()
            if r < 0.25:
                mbs.append(MBSpec(kind="uncoded"))
                continue
            n_mv = 4 if tr in fourv_frames and r < 0.6 else 1
            mvd = [(int(rng.integers(-5, 6)), int(rng.integers(-5, 6)))
                   for _ in range(n_mv)]
            acs = [(int(rng.integers(0, 4)), int(rng.integers(1, 8)))
                   for _ in range(int(rng.integers(0, 3)))]
            mbs.append(MBSpec(kind="inter", mvd=mvd,
                              blocks=[acs, [], [], [], [], []]))
        frames.append(encode_sorenson_picture(
            w, h, PictureTypeCode.P_FRAME, mbs, temporal_reference=tr))
    return frames


def _run(dec, frame_lists):
    outs = []
    for bufs in frame_lists:
        y, cb, cr = dec.decode_step(bufs)
        outs.append((np.asarray(y), np.asarray(cb), np.asarray(cr)))
    return outs


class TestFusedParity:
    def test_matches_legacy_transport_random_gop(self):
        """Fused and three-leaf d24 transports are bit-identical over a
        mixed GOP with distinct per-stream content."""
        _native_or_skip()
        n, w, h = 3, 96, 64
        gops = [_random_gop(w, h, 8, seed=40 + i) for i in range(n)]
        lists = [[gops[i][t] for i in range(n)] for t in range(8)]
        a = _run(_decoder(n, w, h, fused=True), lists)
        b = _run(_decoder(n, w, h, fused=False), lists)
        for t, (pa, pb) in enumerate(zip(a, b)):
            for name, x, y in zip(("y", "cb", "cr"), pa, pb):
                np.testing.assert_array_equal(x, y,
                                              err_msg=f"frame {t} {name}")

    def test_varied_mv_flip_matches_scalar_reference(self):
        """The slim->full MV row flip (first INTER4V frame re-ships over
        the legacy transport, later parses write stride-8 rows) stays
        bit-exact against the scalar reference decoder."""
        _native_or_skip()
        n, w, h = 2, 64, 48
        frames = _random_gop(w, h, 7, seed=9, fourv_frames=(3, 5))
        dec = _decoder(n, w, h, fused=True)
        ref = H263Decoder(SORENSON, backend="numpy")
        assert dec._mv_full is False
        for t, f in enumerate(frames):
            y, cb, cr = dec.decode_step([f] * n)
            pic = ref.decode_next_picture(f)
            for i in range(n):
                np.testing.assert_array_equal(
                    np.asarray(y)[i], pic.as_luma(),
                    err_msg=f"frame {t} stream {i} luma")
                np.testing.assert_array_equal(
                    np.asarray(cb)[i], pic.as_chroma_b())
                np.testing.assert_array_equal(
                    np.asarray(cr)[i], pic.as_chroma_r())
        assert dec._mv_full is True  # flip happened

    def test_truncated_tail_fill(self):
        """EOF tail-fill (state.rs:419-427) through the fused transport:
        tail MBs are empty INTER MV(0,0), never a previous step's stale
        staging-row contents."""
        _native_or_skip()
        w = h = 48
        nmb = 9
        f0 = encode_sorenson_picture(
            w, h, PictureTypeCode.I_FRAME,
            [MBSpec(kind="intra", intradc=[200 + i * 40] * 6)
             for i in range(nmb)])
        f1 = encode_sorenson_picture(  # fills MV rows with +/-8s
            w, h, PictureTypeCode.P_FRAME,
            [MBSpec(kind="inter", mvd=[(8, -8)],
                    blocks=[[(0, 5)], [], [], [], [], []])] * nmb,
            temporal_reference=1)
        f2 = encode_sorenson_picture(  # only 3 of 9 MBs present
            w, h, PictureTypeCode.P_FRAME,
            [MBSpec(kind="inter", mvd=[(2, 2)])] * 3,
            temporal_reference=2)
        ref = H263Decoder(SORENSON, backend="numpy")
        for f in (f0, f1, f2):
            pic = ref.decode_next_picture(f)
        want = np.asarray(pic.as_luma())

        dec = _decoder(1, w, h, fused=True)
        for f in (f0, f1):
            dec.decode_step([f])
        got = np.asarray(dec.decode_step([f2])[0])[0]
        np.testing.assert_array_equal(got, want)

    def test_odd_mb_count_bitmask(self):
        """nmb not a multiple of 8 (here 3x2=6): the INTER bitmask's unused
        trailing bits must not leak into the decoded planes — intra MBs in
        the last partial byte stay intra."""
        _native_or_skip()
        n, w, h = 2, 48, 32  # mbw=3, mbh=2 -> nmb=6, ib_sz=1 w/ 2 spare bits
        frames = _random_gop(w, h, 6, seed=77)
        a = _run(_decoder(n, w, h, fused=True), [[f] * n for f in frames])
        b = _run(_decoder(n, w, h, fused=False), [[f] * n for f in frames])
        for t, (pa, pb) in enumerate(zip(a, b)):
            for name, x, y in zip(("y", "cb", "cr"), pa, pb):
                np.testing.assert_array_equal(x, y,
                                              err_msg=f"frame {t} {name}")

    def test_masked_slots(self):
        """StreamPool's mask path through the fused parse: masked slots
        decode the skip frame (planes preserved, header state untouched)."""
        _native_or_skip()
        n, w, h = 3, 48, 48
        frames = _random_gop(w, h, 4, seed=5)
        dec = _decoder(n, w, h, fused=True)
        dec.decode_step([frames[0]] * n)
        y1, _, _ = dec.decode_step([frames[1]] * n)
        y1 = np.asarray(y1)
        # Step 2: slot 1 masked out -> keeps its frame-1 plane.
        mask = [True, False, True]
        y2, _, _ = dec.decode_step([frames[2]] * n, mask=mask)
        y2 = np.asarray(y2)
        np.testing.assert_array_equal(y2[1], y1[1])
        assert not np.array_equal(y2[0], y1[0])
        np.testing.assert_array_equal(y2[0], y2[2])

    def test_bucket_ladder_cut(self):
        """The native-chosen cut is a ladder value >= the batch max count,
        and sparse steps ship the tiny bucket."""
        _native_or_skip()
        n, w, h = 2, 352, 288
        dec = _decoder(n, w, h, fused=True)
        nmb = dec.mb_w * dec.mb_h
        f0 = encode_sorenson_picture(
            w, h, PictureTypeCode.I_FRAME,
            [MBSpec(kind="intra", intradc=[512] * 6)] * nmb)
        f1 = encode_sorenson_picture(
            w, h, PictureTypeCode.P_FRAME,
            [MBSpec(kind="uncoded")] * nmb, temporal_reference=1)
        dec.decode_step([f0] * n)
        packed = dec._packed[dec._packed_idx]
        assert packed.fused_valid
        assert packed.cut in dec._ladder
        assert packed.cut >= int(packed.counts.max())
        dec.decode_step([f1] * n)
        packed = dec._packed[dec._packed_idx]
        assert packed.cut == dec.pack_cap_tiny  # all-uncoded: tiny bucket


class TestDisposableFrames:
    def test_disposable_pframe_reference_quirk(self):
        """DisposableP through the batched fused path matches the scalar
        decoder.  The reference's get_reference_picture quirk
        (state.rs:72-78) returns the LAST picture whenever a backward
        reference exists — so a P-frame after a disposable frame predicts
        from the disposable frame itself, which is exactly the batched
        decoder's ref-plane chaining.  Note the companion quirk (pinned in
        PARITY.md): DisposableP frames with CODED macroblocks fail with
        UnimplementedDecoding in the reference (macroblock.rs:461-464) —
        decodable disposable frames are all-uncoded, as here."""
        _native_or_skip()
        n, w, h = 2, 64, 48
        nmb = (w // 16) * (h // 16)
        rng = np.random.default_rng(17)

        def p_frame(kind, tr):
            if kind is PictureTypeCode.DISPOSABLE_P_FRAME:
                # All-uncoded, one-padded: ANY coded MB in a DisposableP
                # (even stuffing, even decoded from padding bits) hits the
                # reference's UnimplementedDecoding quirk
                # (macroblock.rs:461-464), so the pad bits must read as
                # excess UNCODED macroblocks (COD=1).
                return encode_sorenson_picture(
                    w, h, kind, [MBSpec(kind="uncoded")] * nmb,
                    temporal_reference=tr, pad_bit=1)
            mbs = [MBSpec(kind="inter",
                          mvd=[(int(rng.integers(-4, 5)),
                                int(rng.integers(-4, 5)))],
                          blocks=[[(0, int(rng.integers(1, 9)))],
                                  [], [], [], [], []])
                   for _ in range(nmb)]
            return encode_sorenson_picture(w, h, kind, mbs,
                                           temporal_reference=tr)

        frames = [encode_sorenson_picture(
            w, h, PictureTypeCode.I_FRAME,
            [MBSpec(kind="intra", intradc=[int(rng.integers(1, 128)) * 8] * 6)
             for _ in range(nmb)])]
        frames.append(p_frame(PictureTypeCode.P_FRAME, 1))
        frames.append(p_frame(PictureTypeCode.DISPOSABLE_P_FRAME, 2))
        frames.append(p_frame(PictureTypeCode.P_FRAME, 3))
        frames.append(p_frame(PictureTypeCode.DISPOSABLE_P_FRAME, 4))
        frames.append(p_frame(PictureTypeCode.P_FRAME, 5))

        dec = _decoder(n, w, h, fused=True)
        ref = H263Decoder(SORENSON, backend="numpy")
        for t, f in enumerate(frames):
            y, cb, cr = dec.decode_step([f] * n)
            pic = ref.decode_next_picture(f)
            np.testing.assert_array_equal(
                np.asarray(y)[0], pic.as_luma(),
                err_msg=f"frame {t} ({'IPdPdP'[t]})")
            np.testing.assert_array_equal(
                np.asarray(cb)[0], pic.as_chroma_b(), err_msg=f"frame {t}")


def test_injected_fused_programs_require_packed_program():
    """Injected fused programs without a matching legacy packed program
    are rejected: the slim->full MV flip step re-ships one frame over the
    packed path, which must not silently run a locally-built (unsharded)
    jit against mesh-sharded planes."""
    from h263_tpu.parallel.batch import BatchedStreamDecoder

    dummy = lambda *a, **k: None  # noqa: E731 — never called
    with pytest.raises(ValueError, match="packed_reconstruct_fn"):
        BatchedStreamDecoder(2, 32, 32, SORENSON,
                             fused_reconstruct_fns={False: dummy, True: dummy})
