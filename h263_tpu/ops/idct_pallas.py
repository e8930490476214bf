"""Pallas TPU kernel: fused sparse-class IDCT residual.

Layout: blocks ride the 128-wide lane dimension, the 64 in-block coefficient
positions ride sublanes — so one (64, 128) VMEM tile holds 128 blocks and
every arithmetic step is a full-width VPU op.  The kernel fuses:

  1. sparsity-class derivation from the dense nonzero pattern (the same
     information inverse_rle computes host-side; see ops/idct.py),
  2. the class-exact f32 IDCT (sequential-order multiply-adds — bit-exact
     with the reference's accumulation, never an MXU matmul, which would
     reassociate),
  3. the trunc(v/4 + sign*0.5) rounding and [-256, 255] clip.

The MXU is deliberately NOT used here: a 64x64 one-shot IDCT matmul would
collapse the two 1-D passes into a single dot product with different f32
rounding, breaking bit-exact parity (see ops/idct.py module docs).

The cosine basis enters through SMEM and is applied as unrolled
scalar-times-vector FMAs, which keeps the reference's accumulation order
explicit in the op sequence.
"""

from __future__ import annotations

import functools

import numpy as np

from .idct import BASIS_F32

LANES = 128


def _kernel(basis_ref, coeffs_ref, out_ref):
    import jax
    import jax.numpy as jnp

    x16 = coeffs_ref[...]                       # int16 [64, 128]
    x = x16.astype(jnp.float32)
    c3 = x.reshape(8, 8, LANES)                 # (y, xfreq, lane)

    def idct_mid(t):
        # t: (a, 8, L) -> (a, 8, L): out[a, i] = sum_f t[a, f] * B[f, i],
        # accumulated in f order (bit-exact with idct.rs:52-65).  Each
        # FMA-contraction hazard: see ops/idct.py idct1d_last.  Mosaic's
        # strict-rounding behavior is asserted on hardware by bench.py's
        # regression check.
        outs = []
        for i in range(8):
            acc = t[:, 0, :] * basis_ref[0, i]
            for f in range(1, 8):
                acc = acc + t[:, f, :] * basis_ref[f, i]
            outs.append(acc)
        return jnp.stack(outs, axis=1)

    def round_clip(v):
        bias = jnp.where(v < 0, jnp.float32(-0.5), jnp.float32(0.5))
        return jnp.clip(jnp.trunc(v / jnp.float32(4.0) + bias),
                        -256, 255).astype(jnp.int32)

    # ---- FULL path (also exact for the reference's Horiz class) ----
    stage_a = idct_mid(c3)                      # (y, i, L)
    inter = jnp.transpose(stage_a, (1, 0, 2))   # (i, y, L)
    stage_b = idct_mid(inter)                   # (x, j, L)
    full = round_clip(jnp.transpose(stage_b, (1, 0, 2)))  # (y, x, L)

    # ---- VERT path: 1-D IDCT of column 0, scale by B00 after the sum ----
    col0 = c3[:, 0, :]                          # (f, L)
    rows = []
    for y in range(8):
        acc = col0[0] * basis_ref[0, y]
        for f in range(1, 8):
            acc = acc + col0[f] * basis_ref[f, y]
        rows.append(acc)
    vert_v = jnp.stack(rows, axis=0) * basis_ref[0, 0]   # (y, L)
    vert = jnp.broadcast_to(round_clip(vert_v)[:, None, :], (8, 8, LANES))

    # ---- DC path: exact power-of-two scaling ----
    dc = c3[0, 0, :]                            # (L,)
    dcv = dc * jnp.float32(0.5) / jnp.float32(4.0)
    bias = jnp.where(dc < 0, jnp.float32(-0.5), jnp.float32(0.5))
    dcr = jnp.clip(jnp.trunc(dcv + bias), -256, 255).astype(jnp.int32)
    dcfull = jnp.broadcast_to(dcr[None, None, :], (8, 8, LANES))

    # ---- class derivation from the nonzero pattern ----
    # Integer reductions (sums of |coeff|) instead of boolean any():
    # Mosaic cannot relayout sublane-reduced i1 vectors.
    xi = jnp.abs(x16.astype(jnp.int32))         # [64, L]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (64, LANES), 0)
    col_sel = ((row_ids % 8) != 0).astype(jnp.int32)  # x > 0 positions
    total = jnp.sum(xi, axis=0)                 # [L]
    off_row0 = jnp.sum(xi[8:, :], axis=0)       # y > 0 mass
    off_col0 = jnp.sum(xi * col_sel, axis=0)    # x > 0 mass

    # Exclusive integer masks (ZERO handled by zeroing at the end).
    m_dc = ((off_row0 == 0) & (off_col0 == 0)).astype(jnp.int32)
    m_vert = ((off_col0 == 0) & (off_row0 > 0)).astype(jnp.int32)
    m_full = 1 - m_dc - m_vert
    m_any = (total > 0).astype(jnp.int32)

    res = (dcfull * m_dc[None, None, :]
           + vert * m_vert[None, None, :]
           + full * m_full[None, None, :]) * m_any[None, None, :]

    out_ref[...] = res.reshape(64, LANES)


@functools.lru_cache(maxsize=8)
def _build_call(n_tiles: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbp = n_tiles * LANES

    def fn(coeffs_t):
        return pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((64, nbp), np.int32),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((8, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((64, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((64, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(BASIS_F32, coeffs_t)

    return jax.jit(fn)


def idct_residual_pallas(dense_blocks, interpret: bool = False):
    """Fused IDCT residual: int16 [..., NB, 64] -> int32 [..., NB, 64].

    Derives sparsity classes in-kernel; bit-exact with
    ops.idct.golden_idct_block for every class.  Leading axes (e.g. the
    stream batch) are folded into the block axis.
    """
    import jax.numpy as jnp

    lead = dense_blocks.shape[:-2]
    nb = dense_blocks.shape[-2]
    flat = dense_blocks.reshape(-1, 64)
    total = flat.shape[0]
    n_tiles = -(-total // LANES)
    pad = n_tiles * LANES - total
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 64), flat.dtype)], axis=0)
    coeffs_t = flat.T  # [64, NBp]
    res_t = _build_call(n_tiles, interpret)(coeffs_t)
    res = res_t.T[:total]
    return res.reshape(*lead, nb, 64)
