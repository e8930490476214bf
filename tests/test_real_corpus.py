"""Decode parity on a genuinely independent (ffmpeg-encoded) FLV1 corpus.

The fixtures under tests/fixtures/ were produced entirely by ffmpeg (via
OpenCV): encoder, bitstream, container, and the golden luma planes all
come from a codebase sharing nothing with this repository.  This breaks
the encoder/decoder circularity of the round-1 corpus (VERDICT.md Weak
#9): a transcription error in vlc_tables.py or the header parser would
fail these tests grossly.

ffmpeg's IDCT differs from the reference's float IDCT, so ±1 pixel skew
is expected (both are within the H.263 IDCT accuracy envelope); the
assertions are max |Y diff| <= 1 with >= 99% exactly equal pixels per
frame.  Our own decode paths (numpy vs jax backends, single-stream vs
batched packed transport) must agree bit-exactly with EACH OTHER.
"""

import pathlib

import numpy as np
import pytest

from h263_tpu import DecoderOption, H263Decoder
from h263_tpu.io.flv import iter_flv_video_tags
from h263_tpu.parallel import BatchedStreamDecoder

FIX = pathlib.Path(__file__).parent / "fixtures"
SORENSON = DecoderOption.SORENSON_SPARK_BITSTREAM

CORPUS = [("qcif", 176, 144), ("cif", 352, 288)]


def _load(name):
    data = (FIX / f"ffmpeg_flv1_{name}.flv").read_bytes()
    golden = np.load(FIX / f"ffmpeg_flv1_{name}_luma.npz")["luma"]
    tags = [t.payload for t in iter_flv_video_tags(data)]
    assert len(tags) == len(golden)
    return tags, golden


@pytest.mark.parametrize("name,w,h", CORPUS)
def test_single_stream_vs_ffmpeg(name, w, h):
    tags, golden = _load(name)
    dec = H263Decoder(SORENSON, backend="numpy")
    for t, payload in enumerate(tags):
        pic = dec.decode_next_picture(payload)
        y = np.asarray(pic.as_luma())
        assert y.shape == (h, w)
        diff = np.abs(y.astype(np.int32) - golden[t].astype(np.int32))
        assert diff.max() <= 1, f"frame {t}: max Y diff {diff.max()}"
        exact = (diff == 0).mean()
        assert exact >= 0.99, f"frame {t}: only {exact:.2%} pixels exact"


@pytest.mark.parametrize("name,w,h", CORPUS)
def test_numpy_jax_backends_agree(name, w, h):
    tags, _ = _load(name)
    a = H263Decoder(SORENSON, backend="numpy")
    b = H263Decoder(SORENSON, backend="jax")
    for t, payload in enumerate(tags):
        pa = a.decode_next_picture(payload)
        pb = b.decode_next_picture(payload)
        np.testing.assert_array_equal(
            np.asarray(pa.as_luma()), np.asarray(pb.as_luma()),
            err_msg=f"frame {t} luma")
        np.testing.assert_array_equal(
            np.asarray(pa.as_chroma_b()), np.asarray(pb.as_chroma_b()),
            err_msg=f"frame {t} cb")
        np.testing.assert_array_equal(
            np.asarray(pa.as_chroma_r()), np.asarray(pb.as_chroma_r()),
            err_msg=f"frame {t} cr")


@pytest.mark.parametrize("name,w,h", CORPUS)
def test_batched_packed_path_matches_single(name, w, h):
    """The production path (native batch parse + packed transport) decodes
    the real corpus bit-identically to the single-stream decoder."""
    from h263_tpu.native import ensure_built

    if not ensure_built():
        pytest.skip("native front-end unavailable")
    tags, golden = _load(name)
    single = H263Decoder(SORENSON, backend="numpy")
    batched = BatchedStreamDecoder(2, w, h, SORENSON)
    for t, payload in enumerate(tags):
        pic = single.decode_next_picture(payload)
        y, cb, cr = batched.decode_step([payload, payload])
        y = np.asarray(y)
        np.testing.assert_array_equal(y[0], np.asarray(pic.as_luma()),
                                      err_msg=f"frame {t} luma")
        np.testing.assert_array_equal(y[0], y[1], err_msg=f"frame {t} lanes")
        np.testing.assert_array_equal(np.asarray(cb)[0],
                                      np.asarray(pic.as_chroma_b()),
                                      err_msg=f"frame {t} cb")
        diff = np.abs(y[0].astype(np.int32) - golden[t].astype(np.int32))
        assert diff.max() <= 1, f"frame {t}: max Y diff {diff.max()}"
