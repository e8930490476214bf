"""RETIRED (round 5): Pallas TPU kernel harness for the entropy automaton.

Kept for reference only — this module is NOT part of the package and has
no production dispatch path.  Why it was retired (VERDICT r4 #5):

* Mosaic REJECTS the kernel at lowering: the automaton's VLC-table
  gathers (per-lane int index into a flat [T] LUT) hit
  `_gather_lowering_rule`'s `indices.shape == operand.shape + (1,)`
  assertion — Mosaic's only vector gather is `tpu.dynamic_gather`, a
  same-shape take_along_axis (per-sublane or per-lane), so a [S]-indices-
  into-[8k]-table lookup would need ~64 broadcast+select+gather ops per
  lookup (the table spans 64 lane rows).  A one-hot matmul alternative is
  ~2M MACs/lookup at T=8k.  Neither beats XLA:TPU's native 1D gather.
* The kernel therefore NEVER executed on v5e; every hardware "pallas"
  number ever recorded was the sticky XLA fallback (counter
  device_frontend_pallas_fallback=1 on HW, 2026-08-19).  A dispatch path
  that cannot succeed is risk + benchmark-confusion surface, so the
  harness moved here and the fallback machinery was deleted.
* The XLA while_loop harness IS the production path: automaton compute
  is ~flat in S (docs/DEVFE_COMPUTE_SWEEP_r3) and e2e serving runs at
  >10x the north star without a Mosaic kernel.

If a future Mosaic grows a LUT-gather primitive, start from
`tpu.dynamic_gather` batching (jax/_src/pallas/mosaic/lowering.py) and
re-add the harness behind get_device_step_fn; the interpreter-mode parity
tests that used to pin this file lived at
tests/test_device_frontend.py::TestPallasHarness (git history, round 3).

Original module docstring follows.

Runs the SAME step function as the XLA harness
(parser/device_frontend.py::make_step) inside one Pallas kernel, keeping
the per-lane decode state in VMEM scratch across a sequential grid over
tape chunks:

  grid = (T // chunk,); each grid step runs up to `chunk` automaton
  iterations and writes one (chunk, S) block of each emission tape
  straight to its output; lane state persists in scratch between grid
  steps (TPU grids execute sequentially on a core).

Motivation: the XLA while_loop harness round-trips ~20 small arrays
through HBM every iteration; here the whole interpreter state stays
resident, so per-iteration cost is VPU work only.  The tape layout is
(T, S) — a tape row per iteration is a contiguous lane-major store.

The VLC tables ride in as kernel inputs (prefetch into VMEM), not inline
constants.  Correctness is interpreter-checked on CPU
(tests/test_device_frontend.py::TestPallasHarness); the TPU lowering
shares every op with the XLA path except the ref plumbing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..parser import device_frontend as df

# State fields round-tripped through VMEM scratch between grid steps, in
# order.  hi/lo are uint32; everything else int32.
_SCALAR_FIELDS = ("phase", "bitpos", "valid", "wcur", "mb", "blk", "zz",
                  "quant", "cbp", "mtype", "mvd_k", "n_mvd", "blk_discard",
                  "mvd_c", "mvd_xtmp", "status")
_U32_FIELDS = ("hi", "lo")


def parse_frames_pallas(data_u32, start_bit, nbits, quant0, ptype,
                        sorenson_v1, *, mbh: int, mbw: int, tape_len: int,
                        chunk: int = 256, interpret: bool = False,
                        width=None, height=None):
    """Drop-in equivalent of df.parse_frames_device via a Pallas kernel.

    Returns the same dict (tapes [S, T], status [S]); `iterations` is
    reported as tape_len (the kernel always sweeps the full grid — lanes
    that finish early spin through cheap masked no-ops)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, Lw = data_u32.shape
    T = -(-tape_len // chunk) * chunk
    grid = T // chunk
    RING = mbw + 2

    tables = dict(mcbpc_i=jnp.asarray(df.MCBPC_I_ARR),
                  mcbpc_p=jnp.asarray(df.MCBPC_P_ARR),
                  cbpy=jnp.asarray(df.CBPY_ARR),
                  mvd=jnp.asarray(df.MVD_ARR),
                  tcoef=jnp.asarray(df.TCOEF_ARR))
    table_names = list(tables)

    def kernel(data_ref, sb_ref, nb_ref, q0_ref, pt_ref, v1_ref,
               *refs):
        tab_refs = refs[:len(table_names)]
        (ord_ref, val_ref, ridx_ref, rval_ref, rflg_ref, status_ref) = \
            refs[len(table_names):len(table_names) + 6]
        scratch = refs[len(table_names) + 6:]

        tabs = {n: r[...] for n, r in zip(table_names, tab_refs)}
        init_state, step = df.make_step(
            data_ref[...].astype(jnp.uint32), nb_ref[...], pt_ref[...],
            v1_ref[...], mbh=mbh, mbw=mbw, tables=tabs,
            width=width, height=height)

        def store_state(st):
            for i, f in enumerate(_SCALAR_FIELDS):
                scratch[i][...] = st[f]
            n = len(_SCALAR_FIELDS)
            for i, f in enumerate(_U32_FIELDS):
                scratch[n + i][...] = st[f]
            scratch[n + 2][...] = st["cur_quad"]
            scratch[n + 3][...] = st["ring"]

        def load_state():
            st = {f: scratch[i][...]
                  for i, f in enumerate(_SCALAR_FIELDS)}
            n = len(_SCALAR_FIELDS)
            for i, f in enumerate(_U32_FIELDS):
                st[f] = scratch[n + i][...]
            st["cur_quad"] = scratch[n + 2][...]
            st["ring"] = scratch[n + 3][...]
            return st

        @pl.when(pl.program_id(0) == 0)
        def _():
            store_state(init_state(sb_ref[...], q0_ref[...]))

        # Sentinel-fill this chunk's tape blocks; the loop overwrites the
        # rows it reaches.
        ord_ref[...] = jnp.full((chunk, S), 2 ** 30, jnp.int32)
        val_ref[...] = jnp.zeros((chunk, S), jnp.int32)
        ridx_ref[...] = jnp.full((chunk, S), 2 ** 30, jnp.int32)
        rval_ref[...] = jnp.zeros((chunk, S), jnp.int32)
        rflg_ref[...] = jnp.zeros((chunk, S), jnp.int32)

        st = load_state()

        def flat(st):
            return ([st[f] for f in _SCALAR_FIELDS]
                    + [st[f] for f in _U32_FIELDS]
                    + [st["cur_quad"], st["ring"]])

        def unflat(xs):
            st = dict(zip(_SCALAR_FIELDS, xs))
            n = len(_SCALAR_FIELDS)
            st.update(dict(zip(_U32_FIELDS, xs[n:n + 2])))
            st["cur_quad"] = xs[n + 2]
            st["ring"] = xs[n + 3]
            return st

        def cond(carry):
            t = carry[0]
            phase = carry[1]  # _SCALAR_FIELDS[0] == "phase"
            return (t < chunk) & jnp.any(phase < df.PH_DONE)

        def body(carry):
            t = carry[0]
            st2, em = step(unflat(list(carry[1:])))
            ord_ref[pl.ds(t, 1), :] = em["coe_ord"][None, :]
            val_ref[pl.ds(t, 1), :] = em["coe_val"][None, :]
            ridx_ref[pl.ds(t, 1), :] = em["rec_idx"][None, :]
            rval_ref[pl.ds(t, 1), :] = em["rec_val"][None, :]
            rflg_ref[pl.ds(t, 1), :] = em["rec_flg"][None, :]
            return tuple([t + 1] + flat(st2))

        carry = jax.lax.while_loop(cond, body, tuple([jnp.int32(0)]
                                                     + flat(st)))
        st = unflat(list(carry[1:]))
        store_state(st)
        status_ref[...] = jnp.where(
            (st["phase"] < df.PH_DONE) & (st["status"] == 0),
            df.ST_TAPE_OVERFLOW, st["status"])

    in_specs = (
        [pl.BlockSpec((S, Lw), lambda i: (0, 0))]           # data
        + [pl.BlockSpec((S,), lambda i: (0,))] * 5          # per-stream meta
        + [pl.BlockSpec(tables[n].shape, lambda i: (0,))    # VLC tables
           for n in table_names]
    )
    out_specs = (
        [pl.BlockSpec((chunk, S), lambda i: (i, 0))] * 5    # tapes (T, S)
        + [pl.BlockSpec((S,), lambda i: (0,))]              # status
    )
    out_shape = (
        [jax.ShapeDtypeStruct((T, S), jnp.int32)] * 5
        + [jax.ShapeDtypeStruct((S,), jnp.int32)]
    )
    scratch_shapes = (
        [pltpu.VMEM((S,), jnp.int32) for _ in _SCALAR_FIELDS]
        + [pltpu.VMEM((S,), jnp.uint32) for _ in _U32_FIELDS]
        + [pltpu.VMEM((S, 8), jnp.int32),
           pltpu.VMEM((S, RING, 8), jnp.int32)]
    )

    fn = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )
    outs = fn(data_u32.astype(jnp.int32), jnp.asarray(start_bit),
              jnp.asarray(nbits), jnp.asarray(quant0), jnp.asarray(ptype),
              jnp.asarray(sorenson_v1), *[tables[n] for n in table_names])
    coe_ord, coe_val, rec_idx, rec_val, rec_flg, status = outs
    return dict(coe_ord=coe_ord.T, coe_val=coe_val.T,
                rec_idx=rec_idx.T, rec_val=rec_val.T, rec_flg=rec_flg.T,
                status=status, iterations=jnp.int32(T))
