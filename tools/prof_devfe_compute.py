"""Compute-isolated S-scaling profile of the device entropy front-end.

prof_devfe.py measures decode_step end-to-end, which on a degraded tunnel
window is dominated by the payload transfer (CLAUDE.md "Degraded-bandwidth
windows": a whole session measured 25-80x below normal bandwidth).  This
tool answers the question that survives such a window: what does the
AUTOMATON + reconstruct cost on device, per step, as a function of S?

Method: for each frame, run DeviceFrontendDecoder's host prep into a fresh
staging buffer and device_put it UP FRONT (all F frames resident before
any timing); then time a loop that calls the decoder's jitted step
function directly, carrying reference planes forward.  No host work, no
transfer, no readback inside the timed region (trap-aware: the only
readback is the final validation, after all timing).

If per-step device time is ~flat in S (latency/serial-iteration bound),
frames/s/chip scales ~linearly with S and the device front-end beats the
1-core host parse ceiling at large S; if it grows ~linearly with S, the
automaton is throughput-bound and the ceiling argument dies.  CLAUDE.md
records the open question ("re-sweep S-scaling on a healthy window") —
this tool removes the window from the equation for the compute half.

Usage (real TPU): python tools/prof_devfe_compute.py --sizes 256,512,1024
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def stage_all(dec, lists):
    """Host-prep every frame and device_put the staged payloads; returns
    [(dev_stage, dev_meta)] per frame.  Uses decode_step's own staging by
    stepping the decoder once per frame with a throwaway fn? No — simpler:
    replicate the prep through the decoder's internal helpers so the
    staged bytes are EXACTLY what decode_step would ship."""
    import jax

    staged = []
    # One bucket for the whole run (max over steps) so the timed loop hits
    # a single compiled executable; decode_step's per-step ladder would
    # otherwise flip buckets between steps and recompile mid-timing.
    bucket = max(dec._pick_bucket(buffers) for buffers in lists)
    for buffers in lists:
        Lw = bucket // 4
        stage = np.zeros((dec.n, Lw, 4), dtype=np.uint8)
        meta = np.zeros((5, dec.n), dtype=np.int32)
        if dec._prep is not None:
            bufs = [dec._skip_frame_bytes() if b is None else b
                    for b in buffers]
            failed = dec._prep.prepare(bufs, stage, meta)
            if failed:
                raise RuntimeError("prep rejected a corpus frame")
        else:
            raise RuntimeError("native prep unavailable")
        staged.append((jax.device_put(stage), jax.device_put(meta)))
    return staged


def measure_compute(dec, staged, passes, label):
    S = dec.n
    F = len(staged)

    def run_once(t):
        ds, dm = staged[t]
        y, cb, cr, status = dec._fn(ds, dm[0], dm[1], dm[2], dm[3], dm[4],
                                    dec.ref_y, dec.ref_cb, dec.ref_cr)
        dec.ref_y, dec.ref_cb, dec.ref_cr = y, cb, cr
        return y, status

    t0 = time.perf_counter()
    y, _ = run_once(0)
    y.block_until_ready()
    compile_s = time.perf_counter() - t0
    print(f"  [{label}] compile {compile_s:.1f}s", file=sys.stderr)
    for t in range(1, F):
        y, _ = run_once(t)
    y.block_until_ready()

    best = worst = None
    for p in range(passes):
        t0 = time.perf_counter()
        for t in range(2, F):
            y, status = run_once(t)
        y.block_until_ready()
        dt = time.perf_counter() - t0
        fps = S * (F - 2) / dt
        ms = dt / (F - 2) * 1e3
        best = fps if best is None else max(best, fps)
        worst = fps if worst is None else min(worst, fps)
        print(f"  [{label}] pass {p}: {fps:.1f} f/s/chip "
              f"({ms:.2f} ms/step)", file=sys.stderr)
    return dict(best_fps=round(best, 1), worst_fps=round(worst, 1),
                ms_per_step_best=round(S / best * 1e3, 3) if best else None,
                compile_s=round(compile_s, 1)), status


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512,1024")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--tape-per-mb", type=int, default=16)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--harness", default="xla")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}", file=sys.stderr)
    on_cpu = jax.default_backend() == "cpu"
    pallas = "off" if on_cpu else "tpu"

    from bench import build_corpus
    from h263_tpu.parallel.device_batch import DeviceFrontendDecoder
    from h263_tpu.types import DecoderOption

    F, W, H = args.frames, 352, 288
    mbs = (-(-W // 16)) * (-(-H // 16))
    tape = args.tape_per_mb * mbs
    n_corp = 24
    distinct = [build_corpus(W, H, F, seed=100 + c) for c in range(n_corp)]

    res = {"sweep": {}, "harness": args.harness, "unroll": args.unroll}
    last = None
    for S in [int(s) for s in args.sizes.split(",")]:
        lists = [[distinct[s % n_corp][t] for s in range(S)]
                 for t in range(F)]
        try:
            # payload='rows': stage_all stages rows buffers and
            # measure_compute calls the 9-arg rows signature; 'auto' now
            # resolves to ragged when the native prep is present, which
            # silently broke every sweep size (ADVICE r3, medium).
            dec = DeviceFrontendDecoder(
                S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pallas=pallas, tape_len=tape, max_frame_bytes=8192,
                harness=args.harness, unroll=args.unroll,
                payload="rows")
            staged = stage_all(dec, lists)
            row, status = measure_compute(dec, staged, args.passes,
                                          f"compute S={S}")
            res["sweep"][f"S{S}"] = row
            last = status
        except Exception as e:
            res["sweep"][f"S{S}"] = {"error": repr(e)[:200]}
            print(f"  [S={S}] FAILED: {e!r}", file=sys.stderr)

    # Validation LAST (first readback of a computed array -> trap).
    if last is not None:
        res["last_status_ok"] = int(np.asarray((last == 0).sum()))
    from h263_tpu.utils.trace import get_counters

    res["counters"] = {k: v for k, v in get_counters().items()
                       if "fallback" in k or "device_frontend" in k}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
