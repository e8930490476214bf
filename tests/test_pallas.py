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
