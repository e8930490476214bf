"""Annex-J-inspired post-process deblocking filter.

Parity with the reference `deblock` crate (deblock/src/deblock.rs).  One
non-obvious constraint dominates this file: the reference mixes two integer
division semantics —

  * its SIMD path uses arithmetic shifts (FLOOR division: deblock.rs:107-109)
  * its scalar remainder path uses Rust `/` (TRUNCATION toward zero:
    deblock.rs:34-36)

These disagree for negative odd intermediates, so bit-exact output must
reproduce the reference's exact SIMD/scalar coverage map:

  * horizontal edges: columns [0, 8*(w//8)) floor, the rest trunc
  * vertical edges:   rows    [0, 8*(h//8)) floor, the rest trunc

A and D samples are written back with WRAPPING u8 casts (deblock.rs:38,41);
B and C clamp to [0, 255].
"""

from __future__ import annotations

import numpy as np

# Table J.2/H.263 (deblock.rs:5-8); index by QUANT, [0] unused.
QUANT_TO_STRENGTH = np.array(
    [0, 1, 1, 2, 2, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 7, 7, 8, 8, 8, 9, 9, 9,
     10, 10, 10, 11, 11, 11, 12, 12, 12], dtype=np.int32)


def _updown(x, strength, xp):
    """Figure J.2 ramp: sign(x) * max(0, |x| - max(0, 2*(|x| - strength)))."""
    ax = xp.abs(x)
    return xp.sign(x) * xp.maximum(0, ax - xp.maximum(0, 2 * (ax - strength)))


def _div_floor(x, shift):
    """Floor division by 2**shift — NB the argument is a SHIFT COUNT,
    unlike _div_trunc_np's divisor (the paired call sites divide by the
    same constants: _div_floor(x, 3) == floor(x/8) vs _div_trunc_np(x, 8))."""
    return x >> shift


def _div_trunc_np(x, d):
    return np.where(x >= 0, x // d, -((-x) // d))


def _process_np(a, b, c, d, strength, floor_mode):
    """One ABCD quartet update (vectorized); returns new (a, b, c, d) int32."""
    a = a.astype(np.int32)
    b = b.astype(np.int32)
    c = c.astype(np.int32)
    d = d.astype(np.int32)
    num = a - 4 * b + 4 * c - d
    diff = a - d
    if floor_mode:
        dd = _div_floor(num, 3)
        d2_in = _div_floor(diff, 2)
    else:
        dd = _div_trunc_np(num, 8)
        d2_in = _div_trunc_np(diff, 4)
    d1 = _updown(dd, strength, np)
    lim = _div_floor(d1, 1) if floor_mode else _div_trunc_np(d1, 2)
    lim = np.abs(lim)
    d2 = np.clip(d2_in, -lim, lim)
    na = (a - d2) & 0xFF           # wrapping cast
    nb = np.clip(b + d1, 0, 255)
    nc = np.clip(c - d1, 0, 255)
    nd = (d + d2) & 0xFF           # wrapping cast
    return na, nb, nc, nd


def golden_deblock(plane: np.ndarray, strength: int) -> np.ndarray:
    """Deblock one u8 plane [H, W]; horizontal edges first (deblock.rs:305-315)."""
    out = plane.astype(np.int32).copy()
    h, w = out.shape
    simd_w = (w // 8) * 8

    # Horizontal edges: rows at y = 8k while y <= h-2 (deblock.rs:136-181).
    for ey in range(8, h - 1, 8):
        rows = [out[ey - 2], out[ey - 1], out[ey], out[ey + 1]]
        quart = [r.copy() for r in rows]
        if simd_w:
            res = _process_np(*[q[:simd_w] for q in quart], strength, True)
            for r, v in zip(rows, res):
                r[:simd_w] = v
        if simd_w < w:
            res = _process_np(*[q[simd_w:] for q in quart], strength, False)
            for r, v in zip(rows, res):
                r[simd_w:] = v

    # Vertical edges (deblock.rs:185-299), only when width >= 10.
    if w >= 10:
        simd_h = (h // 8) * 8
        n_chunks = (w - 2) // 8
        cols_a = np.array([2 + 8 * k + 4 for k in range(n_chunks)])
        for base, nrows, floor_mode in ((0, simd_h, True), (simd_h, h - simd_h, False)):
            if nrows == 0 or n_chunks == 0:
                continue
            rows = slice(base, base + nrows)
            a = out[rows][:, cols_a].copy()
            b = out[rows][:, cols_a + 1].copy()
            c = out[rows][:, cols_a + 2].copy()
            d = out[rows][:, cols_a + 3].copy()
            na, nb, nc, nd = _process_np(a, b, c, d, strength, floor_mode)
            out[rows, cols_a + 0] = na
            out[rows, cols_a + 1] = nb
            out[rows, cols_a + 2] = nc
            out[rows, cols_a + 3] = nd

    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# JAX implementation
# ---------------------------------------------------------------------------


def _process_jnp(a, b, c, d, strength, floor_mode):
    import jax.numpy as jnp

    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    c = c.astype(jnp.int32)
    d = d.astype(jnp.int32)

    def div_trunc(x, dd):
        return jnp.where(x >= 0, x // dd, -((-x) // dd))

    num = a - 4 * b + 4 * c - d
    diff = a - d
    if floor_mode:
        dd = num >> 3
        d2_in = diff >> 2
    else:
        dd = div_trunc(num, 8)
        d2_in = div_trunc(diff, 4)
    s = jnp.int32(strength) if isinstance(strength, int) else strength.astype(jnp.int32)
    ax = jnp.abs(dd)
    d1 = jnp.sign(dd) * jnp.maximum(0, ax - jnp.maximum(0, 2 * (ax - s)))
    lim = jnp.abs(d1 >> 1) if floor_mode else jnp.abs(div_trunc(d1, 2))
    d2 = jnp.clip(d2_in, -lim, lim)
    na = (a - d2) & 0xFF
    nb = jnp.clip(b + d1, 0, 255)
    nc = jnp.clip(c - d1, 0, 255)
    nd = (d + d2) & 0xFF
    return na, nb, nc, nd


def deblock_jnp(plane, strength):
    """Bit-exact jnp deblock of a u8 plane [..., H, W] (static H, W).

    `strength` may be a scalar int or a broadcastable array (per-stream).
    """
    import jax.numpy as jnp

    plane = jnp.asarray(plane)
    h, w = plane.shape[-2], plane.shape[-1]
    out = plane.astype(jnp.int32)
    simd_w = (w // 8) * 8

    edge_rows = list(range(8, h - 1, 8))
    if edge_rows:
        ey = jnp.asarray(edge_rows)
        a = out[..., ey - 2, :]
        b = out[..., ey - 1, :]
        c = out[..., ey, :]
        d = out[..., ey + 1, :]
        col = jnp.arange(w)
        fa, fb, fc, fd = _process_jnp(a, b, c, d, strength, True)
        if simd_w < w:  # scalar-remainder columns use the trunc path
            ta, tb, tc, td = _process_jnp(a, b, c, d, strength, False)
            sel = lambda f, t: jnp.where(col < simd_w, f, t)
        else:  # every production shape: w%8==0, trunc pass is dead
            ta, tb, tc, td = fa, fb, fc, fd
            sel = lambda f, t: f
        out = out.at[..., ey - 2, :].set(sel(fa, ta))
        out = out.at[..., ey - 1, :].set(sel(fb, tb))
        out = out.at[..., ey, :].set(sel(fc, tc))
        out = out.at[..., ey + 1, :].set(sel(fd, td))

    if w >= 10:
        simd_h = (h // 8) * 8
        n_chunks = (w - 2) // 8
        if n_chunks:
            ca = jnp.asarray([2 + 8 * k + 4 for k in range(n_chunks)])
            row = jnp.arange(h)[:, None]
            a = out[..., :, ca]
            b = out[..., :, ca + 1]
            c = out[..., :, ca + 2]
            d = out[..., :, ca + 3]
            fa, fb, fc, fd = _process_jnp(a, b, c, d, strength, True)
            if simd_h < h:
                ta, tb, tc, td = _process_jnp(a, b, c, d, strength, False)
                sel = lambda f, t: jnp.where(row < simd_h, f, t)
            else:
                ta, tb, tc, td = fa, fb, fc, fd
                sel = lambda f, t: f
            out = out.at[..., :, ca].set(sel(fa, ta))
            out = out.at[..., :, ca + 1].set(sel(fb, tb))
            out = out.at[..., :, ca + 2].set(sel(fc, tc))
            out = out.at[..., :, ca + 3].set(sel(fd, td))

    return out.astype(jnp.uint8)
