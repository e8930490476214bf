"""Pallas TPU kernel: fused two-pass Annex-J deblocking filter.

Both filter passes (horizontal edges, then vertical) run on one VMEM-resident
plane — a single HBM round trip instead of two.  Instead of gathering edge
quartets, each pass works on whole-plane shifted copies:

  horizontal: A,B,C,D = plane rolled by 0,-1,-2,-3 rows, rows masked to
              y ≡ 6,7 (mod 8) above each 8k edge (and y+2 <= H-2 rule)
  vertical:   the same with lane rolls and column masks at 8k+6..8k+9

The reference's mixed rounding zones (floor-shift SIMD vs trunc-div scalar;
see ops/deblock.py) are reproduced with static row/column zone masks.
Bit-exact with golden_deblock.
"""

from __future__ import annotations

import functools

import numpy as np

LANES = 128
SUBLANES = 8


def _filter(a, b, c, d, strength, floor_mode):
    """Vectorized ABCD quartet update (deblock.rs:29-42 / :99-127).

    floor_mode selects arithmetic-shift (SIMD-path) vs trunc (scalar-path)
    division; returns (na, nb, nc, nd) as int32 with the reference's
    wrapping casts applied to A/D.
    """
    import jax.numpy as jnp

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
    ax = jnp.abs(dd)
    d1 = jnp.sign(dd) * jnp.maximum(0, ax - jnp.maximum(0, 2 * (ax - strength)))
    lim = jnp.abs(d1 >> 1) if floor_mode else jnp.abs(div_trunc(d1, 2))
    d2 = jnp.clip(d2_in, -lim, lim)
    na = (a - d2) & 0xFF
    nb = jnp.clip(b + d1, 0, 255)
    nc = jnp.clip(c - d1, 0, 255)
    nd = (d + d2) & 0xFF
    return na, nb, nc, nd


def _mix_zone(a, b, c, d, strength, zone_floor):
    """Blend floor-mode and trunc-mode results by the static zone mask."""
    import jax.numpy as jnp

    fa, fb, fc, fd = _filter(a, b, c, d, strength, True)
    ta, tb, tc, td = _filter(a, b, c, d, strength, False)
    mix = lambda f, t: jnp.where(zone_floor, f, t)
    return mix(fa, ta), mix(fb, tb), mix(fc, tc), mix(fd, td)


def _make_kernel(h, w, hp, wp):
    import jax
    import jax.numpy as jnp

    simd_w = (w // 8) * 8
    simd_h = (h // 8) * 8
    n_chunks = (w - 2) // 8 if w >= 10 else 0

    def kernel(strength_ref, plane_ref, out_ref):
        from jax.experimental.pallas import tpu as pltpu

        p = plane_ref[...].astype(jnp.int32)      # [hp, wp]
        s = strength_ref[0]

        rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)

        def a_row_ok(r):
            # quartet anchored at A-row r (edge y=r+2): 8k+6, edge <= h-2
            return ((r % 8) == 6) & (r + 2 <= h - 2) & (r + 2 >= 8)

        def a_col_ok(c):
            # quartet anchored at A-col c: 8k+6 for k < (w-2)//8
            return ((c % 8) == 6) & (c >= 6) & (c < 6 + 8 * n_chunks)

        # ---- horizontal edges: quartets at rows 8k+6..8k+9 (edge y=8k+8)
        # pltpu.roll requires non-negative shifts: roll by size-k reads
        # element [i+k].
        a = p
        b = pltpu.roll(p, hp - 1, 0)
        c = pltpu.roll(p, hp - 2, 0)
        d = pltpu.roll(p, hp - 3, 0)
        zone = cols < simd_w                       # floor vs trunc columns
        na, nb, nc, nd = _mix_zone(a, b, c, d, s, zone)
        col_ok = cols < w
        vals = (na, nb, nc, nd)
        for delta in range(4):
            mask = a_row_ok(rows - delta) & col_ok
            v = vals[delta] if delta == 0 else pltpu.roll(vals[delta], delta, 0)
            p = jnp.where(mask, v, p)

        # ---- vertical edges: quartets at cols 8k+6..8k+9, k < (w-2)//8
        if n_chunks:
            a = p
            b = pltpu.roll(p, wp - 1, 1)
            c = pltpu.roll(p, wp - 2, 1)
            d = pltpu.roll(p, wp - 3, 1)
            zone = rows < simd_h                   # floor vs trunc rows
            na, nb, nc, nd = _mix_zone(a, b, c, d, s, zone)
            row_ok = rows < h
            vals = (na, nb, nc, nd)
            for delta in range(4):
                mask = a_col_ok(cols - delta) & row_ok
                v = vals[delta] if delta == 0 else pltpu.roll(vals[delta], delta, 1)
                p = jnp.where(mask, v, p)

        out_ref[...] = p.astype(jnp.uint8)

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(h: int, w: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hp = -(-h // SUBLANES) * SUBLANES
    wp = -(-w // LANES) * LANES
    kernel = _make_kernel(h, w, hp, wp)

    def fn(plane, strength):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((hp, wp), np.uint8),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(strength, plane)

    return jax.jit(fn)


def deblock_pallas(plane, strength: int, interpret: bool = False):
    """Deblock one uint8 plane [H, W]; bit-exact with golden_deblock."""
    import jax.numpy as jnp

    h, w = plane.shape
    hp = -(-h // SUBLANES) * SUBLANES
    wp = -(-w // LANES) * LANES
    padded = jnp.zeros((hp, wp), jnp.uint8).at[:h, :w].set(jnp.asarray(plane))
    s = jnp.asarray([strength], dtype=jnp.int32)
    out = _build_call(h, w, interpret)(padded, s)
    return out[:h, :w]
