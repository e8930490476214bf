"""Hardware profile of the device entropy front-end (parser/device_frontend).

Measures, on the real TPU, what the CPU mesh cannot: per-harness (XLA
while_loop vs Pallas kernel) step time, compile wall time, and the batch-
size scaling of the lockstep automaton.  The automaton's wall-clock is its
serial iteration count (max symbols over lanes) x per-iteration cost; if
the per-iteration cost is latency-bound rather than S-bound, LARGER
batches raise frames/s/chip nearly linearly — the host front-end can't do
that (host parse scales linearly with S on one core).  This tool answers
whether that's true.

Trap-aware (CLAUDE.md "AXON READBACK TRAP"): ALL timing runs before the
first device->host fetch of a computed array; validation (status counts +
plane equality vs the host front-end) happens at the very end.

Usage (real TPU):   python tools/prof_devfe.py --sizes 256,512,1024
CPU sanity:         python tools/prof_devfe.py --cpu --sizes 8 --frames 6
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure(dec, lists, passes, label):
    S = dec.n
    F = len(lists)
    t0 = time.perf_counter()
    y, _, _ = dec.decode_step(lists[0])
    y.block_until_ready()
    compile_s = time.perf_counter() - t0
    print(f"  [{label}] first step (compile) {compile_s:.1f}s",
          file=sys.stderr)
    for t in range(1, F):
        y, _, _ = dec.decode_step(lists[t])
    y.block_until_ready()
    best = None
    worst = None
    for p in range(passes):
        t0 = time.perf_counter()
        for t in range(2, F):
            y, cb, cr = dec.decode_step(lists[t])
        y.block_until_ready()
        fps = S * (F - 2) / (time.perf_counter() - t0)
        best = fps if best is None else max(best, fps)
        worst = fps if worst is None else min(worst, fps)
        print(f"  [{label}] pass {p}: {fps:.1f} f/s/chip", file=sys.stderr)
    return dict(best_fps=round(best, 1), worst_fps=round(worst, 1),
                compile_s=round(compile_s, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512,1024",
                    help="comma-separated batch sizes to sweep (xla harness)")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--harnesses", default="xla",
                    help="parse harnesses to compare ('xla' is the only "
                         "production value; the Pallas harness was retired "
                         "— docs/retired/parse_pallas.py)")
    ap.add_argument("--tape-per-mb", type=int, default=16)
    ap.add_argument("--unroll", type=int, default=4,
                    help="xla-harness automaton steps per while_loop body "
                         "(compile time vs loop overhead)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS; this uses jax.config)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}", file=sys.stderr)
    on_cpu = jax.default_backend() == "cpu"
    pallas = "off" if on_cpu else "tpu"

    from bench import build_corpus
    from h263_tpu.parallel.batch import BatchedStreamDecoder
    from h263_tpu.parallel.device_batch import DeviceFrontendDecoder
    from h263_tpu.types import DecoderOption

    sizes = [int(s) for s in args.sizes.split(",")]
    harnesses = args.harnesses.split(",")
    F, W, H = args.frames, 352, 288
    mbs = (-(-W // 16)) * (-(-H // 16))
    tape = args.tape_per_mb * mbs

    n_corp = 24
    distinct = [build_corpus(W, H, F, seed=100 + c) for c in range(n_corp)]

    def lists_for(S):
        return [[distinct[s % n_corp][t] for s in range(S)]
                for t in range(F)]

    res = {"harness": {}, "sweep_xla": {}, "host_ref": None}

    # Host front-end reference at the first size (same corpus slice).
    S0 = sizes[0]
    lists0 = lists_for(S0)
    host = BatchedStreamDecoder(S0, W, H,
                                DecoderOption.SORENSON_SPARK_BITSTREAM,
                                pallas=pallas,
                                coef_transport="d24")
    res["host_ref"] = {f"S{S0}": measure(host, lists0, args.passes,
                                         f"host S={S0}")}

    # Harness comparison at S0.
    dfes = {}
    for harness in harnesses:
        try:
            dfe = DeviceFrontendDecoder(
                S0, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pallas=pallas, tape_len=tape, max_frame_bytes=8192,
                harness=harness, unroll=args.unroll)
            res["harness"][harness] = measure(dfe, lists0, args.passes,
                                              f"devfe/{harness} S={S0}")
            dfes[harness] = dfe
        except Exception as e:
            res["harness"][harness] = {"error": repr(e)[:200]}
            print(f"  [devfe/{harness}] FAILED: {e!r}", file=sys.stderr)

    # Batch-size sweep, xla harness (answers the S-scaling question).
    for S in sizes[1:]:
        try:
            dfe = DeviceFrontendDecoder(
                S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pallas=pallas, tape_len=tape, max_frame_bytes=8192,
                harness="xla", unroll=args.unroll)
            res["sweep_xla"][f"S{S}"] = measure(
                dfe, lists_for(S), args.passes, f"devfe/xla S={S}")
        except Exception as e:
            res["sweep_xla"][f"S{S}"] = {"error": repr(e)[:200]}
            print(f"  [devfe/xla S={S}] FAILED: {e!r}", file=sys.stderr)

    # ---- validation LAST: these are the process's first readbacks --------
    val = {}
    try:
        if "xla" in dfes:
            import jax.numpy as jnp

            dfe = dfes["xla"]
            for t in range(F):
                y, _, _ = host.decode_step(lists0[t])
            for t in range(F):
                y2, _, _ = dfe.decode_step(lists0[t])
            val["plane_match_vs_host"] = bool(np.asarray(
                jnp.array_equal(y, y2)))
            val["status_ok_streams"] = int(np.asarray(
                (dfe.last_status == 0).sum()))
    except Exception as e:
        val["error"] = repr(e)[:200]
    res["validation"] = val
    from h263_tpu.utils.trace import get_counters

    res["counters"] = {k: v for k, v in get_counters().items()
                       if "fallback" in k or "device_frontend" in k}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
