"""Pallas TPU kernel: BT.601 YUV 4:2:0 -> RGBA (planar outputs).

Pure elementwise integer math on the VPU; the chroma planes arrive
pre-replicated to luma resolution (an XLA repeat the compiler fuses into
the surrounding program).  Emits planar R, G, B so the kernel works on
natural (row, column) tiles; the caller interleaves RGBA with one XLA
stack (a layout transform XLA performs during the device->host copy or the
consumer fuses away).

Bit-exact with ops/yuv.py (all-integer arithmetic, order-free).
"""

from __future__ import annotations

import functools

import numpy as np

LANES = 128
SUBLANES = 8


def _kernel(y_ref, cb_ref, cr_ref, r_ref, g_ref, b_ref):
    import jax.numpy as jnp

    y = y_ref[...].astype(jnp.int32) - 16
    cb = cb_ref[...].astype(jnp.int32) - 128
    cr = cr_ref[...].astype(jnp.int32) - 128

    gray = y * 76309
    r = (gray + cr * 104597 + 32768) >> 16
    g = (gray + cr * -53279 + cb * -25675 + 32768) >> 16
    b = (gray + cb * 132201 + 32768) >> 16

    clip = lambda v: jnp.clip(v, 0, 255).astype(jnp.uint8)
    r_ref[...] = clip(r)
    g_ref[...] = clip(g)
    b_ref[...] = clip(b)


@functools.lru_cache(maxsize=8)
def _build_call(rows: int, cols: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_r = -(-rows // SUBLANES)
    n_c = -(-cols // LANES)

    spec = pl.BlockSpec((SUBLANES, LANES), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)

    def fn(y, cbx, crx):
        return pl.pallas_call(
            _kernel,
            out_shape=[jax.ShapeDtypeStruct((rows, cols), np.uint8)] * 3,
            grid=(n_r, n_c),
            in_specs=[spec, spec, spec],
            out_specs=[spec, spec, spec],
            interpret=interpret,
        )(y, cbx, crx)

    return jax.jit(fn)


def yuv420_to_rgba_pallas(y, cb, cr, interpret: bool = False):
    """uint8 y [H, W], cb/cr [ceil(H/2), ceil(W/2)] -> RGBA uint8 [H, W, 4].

    Bit-exact with golden_yuv420_to_rgba.
    """
    import jax.numpy as jnp

    h, w = y.shape
    hp = -(-h // SUBLANES) * SUBLANES
    wp = -(-w // LANES) * LANES

    iy = (jnp.arange(hp) // 2).clip(0, cb.shape[0] - 1)[:, None]
    ix = (jnp.arange(wp) // 2).clip(0, cb.shape[1] - 1)[None, :]
    cbx = jnp.asarray(cb)[iy, ix]
    crx = jnp.asarray(cr)[iy, ix]
    yp = jnp.zeros((hp, wp), jnp.uint8).at[:h, :w].set(jnp.asarray(y))

    r, g, b = _build_call(hp, wp, interpret)(yp, cbx, crx)
    a = jnp.full((h, w), 255, jnp.uint8)
    return jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w], a], axis=-1)
