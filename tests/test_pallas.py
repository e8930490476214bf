"""Pallas kernel parity (interpret mode on the CPU mesh).

The fused IDCT-residual kernel must be bit-exact with the golden oracle for
every sparsity class, including in-kernel class derivation.
"""

import numpy as np
import pytest

from h263_tpu.ops.idct import golden_idct_block
from h263_tpu.ops.idct_pallas import idct_residual_pallas
from h263_tpu.types import (
    BLOCK_CLASS_DC,
    BLOCK_CLASS_FULL,
    BLOCK_CLASS_VERT,
    BLOCK_CLASS_ZERO,
)

rng = np.random.default_rng(99)


def _blocks(n, kind):
    c = np.zeros((n, 8, 8), dtype=np.int16)
    if kind == "dc":
        c[:, 0, 0] = rng.integers(-2048, 2048, n)
    elif kind == "vert":
        c[:, :, 0] = rng.integers(-2048, 2048, (n, 8))
    elif kind == "horiz":
        c[:, 0, :] = rng.integers(-2048, 2048, (n, 8))
    elif kind == "full":
        c[:] = rng.integers(-2048, 2048, (n, 8, 8))
    return c


_CLASS_OF = {"zero": BLOCK_CLASS_ZERO, "dc": BLOCK_CLASS_DC,
             "vert": BLOCK_CLASS_VERT, "horiz": BLOCK_CLASS_FULL,
             "full": BLOCK_CLASS_FULL}


@pytest.mark.parametrize("kind", ["zero", "dc", "vert", "horiz", "full"])
def test_kernel_matches_golden(kind):
    n = 200  # exercises tile padding (200 -> 256 lanes)
    c = _blocks(n, kind)
    got = np.asarray(idct_residual_pallas(
        c.reshape(n, 64), interpret=True))
    for i in range(n):
        want = golden_idct_block(c[i].astype(np.float32), _CLASS_OF[kind])
        np.testing.assert_array_equal(got[i].reshape(8, 8), want,
                                      err_msg=f"{kind} block {i}")


def test_mixed_classes_single_tile():
    kinds = ["zero", "dc", "vert", "horiz", "full"] * 26  # 130 blocks
    c = np.concatenate([_blocks(1, k) for k in kinds])
    got = np.asarray(idct_residual_pallas(c.reshape(-1, 64), interpret=True))
    for i, k in enumerate(kinds):
        want = golden_idct_block(c[i].astype(np.float32), _CLASS_OF[k])
        np.testing.assert_array_equal(got[i].reshape(8, 8), want)


def test_batched_leading_axes():
    c = _blocks(64, "full").reshape(4, 16, 64)
    got = np.asarray(idct_residual_pallas(c, interpret=True))
    assert got.shape == (4, 16, 64)
    flat = c.reshape(-1, 8, 8)
    for i in range(64):
        want = golden_idct_block(flat[i].astype(np.float32), BLOCK_CLASS_FULL)
        np.testing.assert_array_equal(got.reshape(-1, 64)[i].reshape(8, 8), want)


class TestYuvPallas:
    @pytest.mark.parametrize("shape", [(16, 16), (17, 11), (288, 352), (9, 130)])
    def test_matches_golden(self, shape):
        from h263_tpu.ops.yuv import golden_yuv420_to_rgba
        from h263_tpu.ops.yuv_pallas import yuv420_to_rgba_pallas

        h, w = shape
        r = np.random.default_rng(h * 31 + w)
        y = r.integers(0, 256, (h, w), dtype=np.uint8)
        cb = r.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
        cr = r.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
        want = golden_yuv420_to_rgba(y, cb, cr)
        got = np.asarray(yuv420_to_rgba_pallas(y, cb, cr, interpret=True))
        np.testing.assert_array_equal(got, want)


def test_pallas_pipeline_matches_xla():
    """Full batched decode with the Pallas IDCT path (interpret mode on
    CPU) must match the XLA path bit-for-bit."""
    from h263_tpu import DecoderOption, PictureTypeCode
    from h263_tpu.parallel import BatchedStreamDecoder
    from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture

    SOR = DecoderOption.SORENSON_SPARK_BITSTREAM
    rng2 = np.random.default_rng(17)
    nmb = 4
    frames = [encode_sorenson_picture(
        32, 32, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[int(rng2.integers(1, 128)) * 8] * 6,
                blocks=[[(0, int(rng2.integers(1, 20)))], [], [], [], [], []])
         for _ in range(nmb)], temporal_reference=0)]
    for tr in (1, 2):
        frames.append(encode_sorenson_picture(
            32, 32, PictureTypeCode.P_FRAME,
            [MBSpec(kind="inter", mvd=[(3, -5)],
                    blocks=[[(1, 7)], [], [(0, -4)], [], [], []])] * nmb,
            temporal_reference=tr))

    d_xla = BatchedStreamDecoder(2, 32, 32, SOR)
    d_pal = BatchedStreamDecoder(2, 32, 32, SOR, pallas="interpret")
    for f in frames:
        yx, cbx, crx = d_xla.decode_step([f, f])
        yp, cbp, crp = d_pal.decode_step([f, f])
        np.testing.assert_array_equal(np.asarray(yx), np.asarray(yp))
        np.testing.assert_array_equal(np.asarray(cbx), np.asarray(cbp))
        np.testing.assert_array_equal(np.asarray(crx), np.asarray(crp))


class TestDeblockPallas:
    @pytest.mark.parametrize("shape", [(16, 16), (24, 32), (17, 11),
                                       (48, 9), (64, 100), (288, 352)])
    @pytest.mark.parametrize("strength", [1, 8, 12])
    def test_matches_golden(self, shape, strength):
        from h263_tpu.ops.deblock import golden_deblock
        from h263_tpu.ops.deblock_pallas import deblock_pallas

        r = np.random.default_rng(shape[0] * 7 + strength)
        plane = r.integers(0, 256, shape, dtype=np.uint8)
        want = golden_deblock(plane, strength)
        got = np.asarray(deblock_pallas(plane, strength, interpret=True))
        np.testing.assert_array_equal(got, want)
