"""Benchmark: concurrent CIF Sorenson Spark decode throughput on one chip.

Headline metric (round 3 on): DISTINCT per-stream content — each stream
decodes its own corpus, the realistic serving regime.  The shared
one-buffer-for-all-streams regime is still measured and reported (it keeps
round-over-round comparability, but its predictor-warm host parse measures
~1.3-1.6x faster than realistic content — CLAUDE.md "Shared-corpus
inflation").

Stages measured:
  * host entropy decode (serial per stream; scales with host cores)
  * end-to-end sequential steps (parse -> one fused transfer -> dispatch)
  * device reconstruction in isolation (transfer + IDCT/mocomp/clamp)
  * presentation (deblock + BT.601 RGBA) on device
  * 720p secondary pass (budget permitting) — tracked per VERDICT r2 #5

Pipelined mode (submit_step) is measured as a DIAGNOSTIC only: on this
1-host-core box the tunnel transfer is CPU-bound, so overlapping it with
the parse just time-slices the core (worker-side transfer inflates ~3x,
parse slows, net wash-to-loss — see tools/prof_pipeline.py, round 3).
Sequential stepping is the deployment default on 1-core hosts; pipelining
pays only when a spare core can own the transfer.

Prints the result as a JSON line:
  {"metric": "cif_decode_frames_per_sec_per_chip", "value": ..., "unit":
   "frames/s", "vs_baseline": value / 30000}
The LAST line on stdout is the authoritative record.  A crash-safe
preliminary line (detail.strict_rounding == "pending", no 720p) precedes
the 720p section and the strict-rounding gate, each of which can block on
a 30-600 s tunnel compile; the final line supersedes it — with the
headline zeroed if the bit-exactness gate fails.  Two forked watchdogs
keep the record non-empty even if the TPU tunnel is down or dies mid-run:
init hang -> zeroed record (--init-timeout); mid-run hang -> the last
emitted line is replayed and the process killed (--overall-timeout).

vs_baseline is against the north-star target of 1000 concurrent real-time
CIF streams per chip = 30000 frames/s (BASELINE.json; the reference
publishes no numbers of its own — BASELINE.md).

Flags: --streams N --frames N --width W --height H --json-only
       --corpus shared|distinct --no-720p --budget S
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# Last-resort init watchdog.  When the TPU tunnel is unreachable the axon
# plugin blocks INSIDE `import jax` / device init in C code (observed
# 2026-08-17..18: a 300 s probe never returned from the import), so no
# in-process timeout (signal or thread) is guaranteed to fire.  A forked
# child shares our stdout: if the parent has not written the sentinel file
# within the timeout, the child prints a zeroed-headline JSON record —
# which becomes the LAST stdout line once it SIGKILLs the parent — so the
# driver's round artifact records the outage instead of hanging forever.
_WATCHDOG_SRC = r"""
import json, os, signal, sys, time
sent, ppid, timeout = sys.argv[1], int(sys.argv[2]), float(sys.argv[3])
sidecar = sys.argv[4] if len(sys.argv) > 4 else None
deadline = time.time() + timeout
while time.time() < deadline:
    if os.path.exists(sent):
        sys.exit(0)
    try:
        os.kill(ppid, 0)
    except OSError:
        break  # parent crashed without disarming: record the outage below
    time.sleep(2)
if os.path.exists(sent):
    sys.exit(0)
# Timed out, or the parent died to a raised plugin/XLA error (as real a
# tunnel death as a hang): either way, end the stream with an
# authoritative JSON record — the replayed sidecar line, or zeroed.
# Mid-run mode: replay the last JSON line the parent managed to emit (the
# crash-safe preliminary) so the driver records real numbers, not silence.
line = None
if sidecar and os.path.exists(sidecar):
    lines = [l for l in open(sidecar).read().splitlines() if l.strip()]
    line = lines[-1] if lines else None
if line is None:
    err, note = (("tpu_init_timeout", "jax import/device init did not "
                  "complete; TPU tunnel presumed down") if sidecar is None
                 else ("bench_hung", "bench produced no record within the "
                       "overall timeout (tunnel died mid-run?)"))
    line = json.dumps({
        "metric": "cif_decode_frames_per_sec_per_chip",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "detail": {"error": err, "timeout_s": timeout, "note": note},
    })
print(line, flush=True)
try:
    os.kill(ppid, signal.SIGKILL)
except OSError:
    pass
"""


def _spawn_watchdog(timeout_s: float, sidecar: str = None):
    """Arm a kill-and-report watchdog; returns a callable that disarms it.

    Without `sidecar` (init phase): emits a zeroed record on timeout.
    With `sidecar` (mid-run phase): replays the parent's last emitted JSON
    line — the tunnel can die mid-compile AFTER init succeeded, which
    would otherwise hang the bench past any numbers it already measured."""
    sentinel = f"/tmp/h263_bench_wd_{os.getpid()}_{timeout_s:.0f}"
    try:
        os.unlink(sentinel)
    except OSError:
        pass
    argv = [sys.executable, "-c", _WATCHDOG_SRC, sentinel, str(os.getpid()),
            str(float(timeout_s))]
    if sidecar is not None:
        argv.append(sidecar)
    child = subprocess.Popen(argv)

    def disarm():
        with open(sentinel, "w"):
            pass
        try:
            child.wait(timeout=10)
        except subprocess.TimeoutExpired:  # pragma: no cover
            child.kill()
        try:
            os.unlink(sentinel)
        except OSError:
            pass

    return disarm


def build_corpus(width: int, height: int, n_frames: int, seed: int = 7):
    """One I-frame + P-frames with mixed MVs/coefficients.

    NB: sharing ONE buffer across all streams lets the branch predictor
    memorize the exact symbol sequence and keeps the frame bytes in L1 —
    measured ~1.6x faster host parse than realistic distinct-content
    streams.  The benchmark therefore measures BOTH regimes and headlines
    the distinct one (a pool of corpora cycled over streams)."""
    from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture
    from h263_tpu.types import PictureTypeCode

    rng = np.random.default_rng(seed)
    mbw, mbh = -(-width // 16), -(-height // 16)

    frames = []
    mbs = []
    for _ in range(mbw * mbh):
        dc = int(rng.integers(1, 128)) * 8
        acs = [(int(rng.integers(0, 3)), int(rng.integers(1, 10)))
               for _ in range(int(rng.integers(1, 5)))]
        mbs.append(MBSpec(kind="intra", intradc=[dc] * 6,
                          blocks=[acs, [], [], [], [], []]))
    frames.append(encode_sorenson_picture(
        width, height, PictureTypeCode.I_FRAME, mbs, temporal_reference=0))

    for tr in range(1, n_frames):
        mbs = []
        for _ in range(mbw * mbh):
            roll = rng.random()
            if roll < 0.2:
                mbs.append(MBSpec(kind="uncoded"))
                continue
            mvd = (int(rng.integers(-6, 7)), int(rng.integers(-6, 7)))
            acs = [(int(rng.integers(0, 4)), int(rng.integers(1, 8)))
                   for _ in range(int(rng.integers(0, 4)))]
            mbs.append(MBSpec(kind="inter", mvd=[mvd],
                              blocks=[acs, [], [], [], [], []]))
        frames.append(encode_sorenson_picture(
            width, height, PictureTypeCode.P_FRAME, mbs, temporal_reference=tr & 0xFF))
    return frames


def verify_strict_rounding(dec, width: int, height: int):
    """Assert the device backend performs reference-strict f32 rounding,
    reusing the given (already-constructed) batched decoder — no extra jit
    signatures.

    Decodes a crafted two-frame sequence whose IDCT output flips by one if
    the backend contracts mul+add into FMAs (skipping the product rounding
    the reference performs): dequantized coefficients {735, -555, 215} at
    positions (2,0),(3,0),(2,2) yield residual 28 strict / 27 contracted at
    pixel (0,2).
    """
    from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture
    from h263_tpu.types import PictureTypeCode

    nmb = (-(-width // 16)) * (-(-height // 16))
    f0 = encode_sorenson_picture(
        width, height, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[1024] * 6)] * nmb,
        temporal_reference=0)
    # quant 5: levels 73, -55, 21 dequantize to exactly 735, -555, 215.
    f1 = encode_sorenson_picture(
        width, height, PictureTypeCode.P_FRAME,
        [MBSpec(kind="inter", mvd=[(0, 0)],
                blocks=[[(5, 73), (0, -55), (5, 21)], [], [], [], [], []])]
        + [MBSpec(kind="uncoded")] * (nmb - 1),
        quantizer=5, temporal_reference=1)

    dec.decode_step([f0] * dec.n)
    y, _, _ = dec.decode_step([f1] * dec.n)
    # Fetch ONE device-sliced scalar, not the 26 MB batch plane: the first
    # readback is already slow over the tunnel (and flips the process into
    # synchronous mode); a full-array fetch can stall for minutes.
    got = int(np.asarray(y[0, 0, 2]))
    assert got == 128 + 28, (
        f"device backend is not reference-strict: pixel = {got}, expected "
        f"156 (strict) — 155 indicates FMA contraction")


def stage_summary():
    """Mean/max ms for the decode_step stages since the last reset."""
    from h263_tpu.utils import trace

    m = trace.get_metrics()
    out = {}
    for k in ("host_parse", "transfer", "reconstruct_dispatch",
              "bucket_slice", "reclaim_wait"):
        if k in m:
            out[k] = {"mean_ms": m[k]["mean_ms"], "max_ms": m[k]["max_ms"]}
    trace.reset_metrics()
    return out


def measure_e2e(dec, frame_lists, budget_left, passes=3):
    """Warm pass (untimed, steady-state) + up to `passes` timed passes over
    frames 2..F; returns (best_fps, worst_fps, stage_metrics)."""
    from h263_tpu.utils import trace

    S = dec.n
    F = len(frame_lists)
    y, _, _ = dec.decode_step(frame_lists[0])
    y, _, _ = dec.decode_step(frame_lists[1])
    y.block_until_ready()
    # Steady-state warm pass: first-pass effects (icache/predictor warmup,
    # CPU frequency ramp, lazily-bound buffers) measured ~15-40% slower
    # than steady state; serving throughput is the steady-state number.
    for t in range(2, F):
        y, _, _ = dec.decode_step(frame_lists[t])
    y.block_until_ready()
    trace.reset_metrics()
    best, worst = 0.0, float("inf")
    t_end = time.perf_counter() + budget_left
    for rep in range(passes):
        if rep and time.perf_counter() > t_end:
            break
        t0 = time.perf_counter()
        for t in range(2, F):
            y, cb, cr = dec.decode_step(frame_lists[t])
        y.block_until_ready()
        fps = S * (F - 2) / (time.perf_counter() - t0)
        best = max(best, fps)
        worst = min(worst, fps)
    return best, worst, stage_summary()


def main():
    bench_t0 = time.perf_counter()
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--width", type=int, default=352)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--pack-per-mb", type=int, default=10,
                    help="packed-transport capacity in coefficients per "
                         "macroblock (smaller = fewer transfer bytes; "
                         "overflow falls back to the dense transport)")
    ap.add_argument("--transport", default="d24", choices=["u32", "d24"],
                    help="packed coefficient transport: delta-coded 3 B "
                         "(d24, default; ships fused with MVs+flags as ONE "
                         "transfer leaf) or combined-u32 4 B")
    ap.add_argument("--pallas", default=None, choices=["off", "tpu"],
                    help="reconstruction kernels: XLA ops (off) or fused "
                         "Mosaic kernels (tpu).  Default: tpu on TPU "
                         "backends (the Mosaic IDCT benches ~10%% faster "
                         "end-to-end), off on CPU")
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--corpus", default="distinct",
                    choices=["shared", "distinct"],
                    help="headline corpus: 'distinct' (per-stream content — "
                         "realistic serving, the default) or 'shared' (one "
                         "buffer for all streams — predictor-warm, ~1.3-"
                         "1.6x optimistic on the host stage).  Both regimes "
                         "are measured and reported either way")
    ap.add_argument("--distinct-corpora", type=int, default=24,
                    help="number of distinct stream corpora cycled over "
                         "the batch for the distinct-content measurements")
    ap.add_argument("--serve-streams", type=int, default=1024,
                    help="batch size for the device-front-end SERVING "
                         "shape (the headline path); the automaton's "
                         "per-step cost is flat in S so larger batches "
                         "raise frames/s/chip nearly linearly")
    ap.add_argument("--no-720p", action="store_true",
                    help="skip the 720p secondary measurement")
    ap.add_argument("--budget", type=float, default=600.0,
                    help="soft wall-clock budget (s); extra best-of passes "
                         "and the 720p section are skipped once exceeded")
    ap.add_argument("--init-timeout", type=float, default=600.0,
                    help="hard bound (s) on jax import + device discovery; "
                         "if exceeded (TPU tunnel down) a zeroed JSON "
                         "record is emitted and the bench aborts instead "
                         "of hanging.  <=0 disables the watchdog")
    ap.add_argument("--overall-timeout", type=float, default=5400.0,
                    help="hard bound (s) on the whole bench after init; on "
                         "expiry the last emitted JSON line (the crash-"
                         "safe preliminary) is replayed and the process "
                         "is killed — covers the tunnel dying mid-compile. "
                         "<=0 disables")
    args = ap.parse_args()

    disarm_watchdog = (_spawn_watchdog(args.init_timeout)
                       if args.init_timeout > 0 else (lambda: None))
    import jax

    jax.devices()  # force platform init under the watchdog
    disarm_watchdog()
    sidecar = f"/tmp/h263_bench_last_{os.getpid()}.json"
    try:
        os.unlink(sidecar)
    except OSError:
        pass
    disarm_overall = (_spawn_watchdog(args.overall_timeout, sidecar)
                      if args.overall_timeout > 0 else (lambda: None))

    def emit(obj):
        line = json.dumps(obj)
        with open(sidecar, "a") as f:
            f.write(line + "\n")
        print(line, flush=True)

    # NB: do NOT enable the persistent compilation cache here: the axon
    # plugin's executable deserialization produces a pathologically slow
    # binary (~100x per-step regression, observed 885 ms vs 8 ms steps).

    from h263_tpu.parallel.batch import BatchedStreamDecoder
    from h263_tpu.types import DecoderOption
    from h263_tpu.utils import trace

    trace.trace_enabled(True)

    log = (lambda *a: None) if args.json_only else (
        lambda *a: print(*a, file=sys.stderr))

    def budget_left():
        return args.budget - (time.perf_counter() - bench_t0)

    log(f"devices: {jax.devices()}")
    if args.pallas is None:
        args.pallas = "off" if jax.default_backend() == "cpu" else "tpu"
    log(f"pallas kernels: {args.pallas}")
    S, F, W, H = args.streams, args.frames, args.width, args.height

    t0 = time.perf_counter()
    corpus = build_corpus(W, H, F)
    log(f"corpus: {F} frames encoded in {time.perf_counter() - t0:.2f}s "
        f"({sum(len(b) for b in corpus)} bytes)")
    t0 = time.perf_counter()
    n_corp = max(2, args.distinct_corpora)
    distinct = [build_corpus(W, H, F, seed=100 + c) for c in range(n_corp)]
    log(f"distinct corpora: {n_corp} encoded in "
        f"{time.perf_counter() - t0:.2f}s")

    shared_lists = [[corpus[t]] * S for t in range(F)]
    dist_lists = [[distinct[s % n_corp][t] for s in range(S)]
                  for t in range(F)]

    from h263_tpu.native import ensure_built

    native = ensure_built()
    log(f"native front-end: {native}")

    mbs_per_frame = (-(-W // 16)) * (-(-H // 16))
    dec = BatchedStreamDecoder(S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
                               pack_cap=args.pack_per_mb * mbs_per_frame,
                               pallas=args.pallas,
                               coef_transport=args.transport)
    log(f"coefficient transport: {args.transport} "
        f"(fused single-leaf: {dec._fused_enabled})")

    # --- host stage in isolation (the production packed batch parse) --------
    host_probe = BatchedStreamDecoder(
        S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
        pack_cap=args.pack_per_mb * mbs_per_frame,
        coef_transport=args.transport)
    pk = host_probe.next_packed_batch()

    def probe(lists):
        # Full warm pass first: first-walk effects (predictor/icache/CPU
        # frequency) measured 15-40% slower than steady state.
        for t in range(F):
            host_probe.parse_batch_packed(lists[t], pk)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for t in range(1, F):
                host_probe.parse_batch_packed(lists[t], pk)
            best = max(best, S * (F - 1) / (time.perf_counter() - t0))
        return best

    # Each regime's probe runs immediately before its end-to-end section:
    # the box's throughput drifts between minutes, and separating them
    # produced artifacts where the parse-only rate read BELOW the e2e rate
    # (different windows).  Adjacency keeps the pair comparable.
    trace.reset_metrics()
    host_fps = probe(shared_lists)
    log(f"host entropy decode: {host_fps:.1f} frames/s/core "
        f"(best of 3 passes, shared corpus)")
    seq_fps, seq_worst, stages_shared = measure_e2e(
        dec, shared_lists, budget_left())
    log(f"end-to-end sequential: {seq_fps:.1f} frames/s/chip "
        f"(batch={S}, shared corpus, best of 3; worst {seq_worst:.1f})")
    log(f"  stages: { {k: v['mean_ms'] for k, v in stages_shared.items()} }")

    host_distinct_fps = probe(dist_lists)
    log(f"host entropy decode: {host_distinct_fps:.1f} frames/s/core "
        f"(best of 3 passes, DISTINCT per-stream content)")
    seq_distinct_fps, seq_distinct_worst, stages_distinct = measure_e2e(
        dec, dist_lists, budget_left())
    log(f"end-to-end sequential: {seq_distinct_fps:.1f} frames/s/chip "
        f"(DISTINCT content, best of 3; worst {seq_distinct_worst:.1f})")
    log(f"  stages: { {k: v['mean_ms'] for k, v in stages_distinct.items()} }")

    # --- pipelined mode: diagnostic only (see module docstring) -------------
    # Re-prime references with the shared GOP so the pipelined steps decode
    # coherent content (ADVICE r2).
    y, _, _ = dec.decode_step(shared_lists[0])
    y, _, _ = dec.decode_step(shared_lists[1])
    y.block_until_ready()
    t0 = time.perf_counter()
    last = None
    for last in dec.decode_stream_pipelined(
            shared_lists[1 + (t % (F - 1))] for t in range(2 * F)):
        pass
    last[0].block_until_ready()
    pipe_dt = time.perf_counter() - t0
    pipe_fps = S * 2 * F / pipe_dt
    log(f"end-to-end pipelined (diagnostic): {pipe_fps:.1f} frames/s/chip "
        f"({1e3 * pipe_dt / (2 * F):.2f} ms/step)")
    trace.reset_metrics()

    e2e_fps = seq_distinct_fps if args.corpus == "distinct" else seq_fps
    e2e_worst = (seq_distinct_worst if args.corpus == "distinct"
                 else seq_worst)

    # --- device stage in isolation (packed transfer + reconstruct, reusing
    # the last packed host batch) ---------------------------------------------
    # NB: keep every device->host fetch AFTER all timing: the axon tunnel
    # client permanently switches this process to a ~1 s synchronous
    # dispatch mode after the first readback of a computed array (measured:
    # 8 ms/step before, ~990 ms/step after, irreversibly).
    packed = dec._packed[dec._packed_idx]
    y, cb, cr = dec.step_packed(packed)
    y.block_until_ready()
    reps = max(F - 1, 4)
    device_fps = 0.0
    for rep in range(3):
        if rep and budget_left() < 0:
            break
        t0 = time.perf_counter()
        for _ in range(reps):
            y, cb, cr = dec.step_packed(packed)
        y.block_until_ready()
        device_fps = max(device_fps, S * reps / (time.perf_counter() - t0))
    log(f"device stage (packed transfer+compute): {device_fps:.1f} "
        f"frames/s/chip (best of 3 passes)")

    # --- presentation (deblock + BT.601 RGBA, on device) --------------------
    # Not part of the headline decode metric; reported as a detail field.
    # Guarded: any failure here must not kill the benchmark.
    present_fps = None
    try:
        rgba = dec.present_rgba(deblock=True)
        rgba.block_until_ready()
        reps_p = 8
        t0 = time.perf_counter()
        for _ in range(reps_p):
            rgba = dec.present_rgba(deblock=True)
        rgba.block_until_ready()
        present_dt = time.perf_counter() - t0
        present_fps = S * reps_p / present_dt
        log(f"present (deblock+RGBA): {present_fps:.1f} frames/s/chip "
            f"({1e3 * present_dt / reps_p:.2f} ms/step)")
    except Exception as e:  # pragma: no cover
        log(f"present measurement skipped: {e!r}")

    result = {
        "metric": "cif_decode_frames_per_sec_per_chip",
        "value": round(e2e_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(e2e_fps / 30000.0, 4),
        "detail": {
            "headline_regime": args.corpus,
            "headline_path": "host",
            "device_frontend": "pending",
            "device_frontend_validation": None,
            "end_to_end_worst_fps": round(e2e_worst, 1),
            "host_parse_fps_per_core": round(host_fps, 1),
            "host_parse_distinct_fps_per_core": round(host_distinct_fps, 1),
            "present_rgba_fps": (round(present_fps, 1)
                                 if present_fps else None),
            "device_stage_fps": round(device_fps, 1),
            "end_to_end_shared_fps": round(seq_fps, 1),
            "end_to_end_shared_worst_fps": round(seq_worst, 1),
            "end_to_end_distinct_fps": round(seq_distinct_fps, 1),
            "end_to_end_distinct_worst_fps": round(seq_distinct_worst, 1),
            "end_to_end_pipelined_diagnostic_fps": round(pipe_fps, 1),
            "stages_ms_shared": stages_shared,
            "stages_ms_distinct": stages_distinct,
            "p720": None,
            "strict_rounding": "pending",
            "transport": args.transport,
            "fused_transport": bool(dec._fused_enabled),
            "native_frontend": bool(native),
            "streams": S, "frames": F, "width": W, "height": H,
            "baseline_note": "vs north-star 1000 real-time CIF streams/chip (30000 f/s); reference publishes no numbers",
        },
    }
    # First crash-safe preliminary: the device-front-end section below can
    # block on a 30-600 s tunnel compile; if the tunnel dies there, the
    # mid-run watchdog replays this host-path line instead of zeroing.
    emit(result)

    # --- device entropy front-end: the serving path (round 3) ---------------
    # Raw frame bytes ship to the device (the smallest possible transport)
    # and the VLC automaton decodes all streams as lockstep vector lanes
    # (parser/device_frontend.py).  Hardware-validated bit-exact vs the
    # host front-end (tools/soak_hw.py --frontend device, 2026-08-18) and
    # re-validated at the END of this run (the plane-equality fetch is a
    # readback — it must stay after all timing; see the trap note above).
    # Measured on a healthy window 2026-08-18: S=512 2.1 ms/step drained
    # (~245k f/s/chip), S=1024 2.55 ms/step (~401k) — the automaton's
    # per-step cost is flat in S, so the serving shape is the largest
    # batch the content mix sustains; 1024 streams/chip is the north-star
    # fleet shape.  The HEADLINE value is this path at --serve-streams
    # when it times successfully; validation failure at the end demotes
    # the headline back to the host path (never silently).
    devfe = None
    dfe_val = None            # S-sized decoder kept alive for validation
    serve_status = None       # serving-shape per-lane status (device array)
    headline_path = "host"
    devfe_fps = devfe_worst = None
    if budget_left() > 150:
        devfe = {}
        from h263_tpu.parallel.device_batch import DeviceFrontendDecoder

        # Tape budget: the corpus I-frame costs ~9.5 automaton iterations
        # per MB (1 header + 6 INTRADC + 1-4 ACs); 16 clears it with
        # margin.  8 would overflow frame 0 and poison the whole section.
        def make_dfe(n):
            return DeviceFrontendDecoder(
                n, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pallas=args.pallas, tape_len=16 * mbs_per_frame,
                max_frame_bytes=8192, harness="xla")

        try:
            dfe_val = make_dfe(S)
            best_d, worst_d, stages_d = measure_e2e(
                dfe_val, dist_lists, budget_left())
            devfe["xla"] = {
                "end_to_end_distinct_fps": round(best_d, 1),
                "end_to_end_distinct_worst_fps": round(worst_d, 1),
                "stages_ms": stages_d,
            }
            devfe_fps, devfe_worst = best_d, worst_d
            headline_path = f"device_frontend_xla_S{S}"
            log(f"device front-end e2e: {best_d:.1f} frames/s/chip "
                f"distinct (S={S}, worst {worst_d:.1f})")
        except Exception as e:  # pragma: no cover
            log(f"device front-end [xla S={S}] failed: {e!r}")
            devfe["xla"] = {"error": repr(e)[:200]}
            dfe_val = None
        S_serve = args.serve_streams
        if (dfe_val is not None and S_serve > S
                and budget_left() > 90):
            try:
                serve_lists = [[distinct[s % n_corp][t]
                                for s in range(S_serve)] for t in range(F)]
                dfe_serve = make_dfe(S_serve)
                best_s, worst_s, stages_s = measure_e2e(
                    dfe_serve, serve_lists, budget_left())
                devfe["xla_serve"] = {
                    "streams": S_serve,
                    "end_to_end_distinct_fps": round(best_s, 1),
                    "end_to_end_distinct_worst_fps": round(worst_s, 1),
                    "stages_ms": stages_s,
                }
                devfe_fps, devfe_worst = best_s, worst_s
                headline_path = f"device_frontend_xla_S{S_serve}"
                log(f"device front-end e2e: {best_s:.1f} frames/s/chip "
                    f"distinct (SERVING shape S={S_serve}, worst "
                    f"{worst_s:.1f})")
                # Keep only the tiny per-lane status array for the
                # end-of-run validation; free the big buffers now (the
                # 720p section needs the HBM).
                serve_status = dfe_serve.last_status
                del dfe_serve, serve_lists
            except Exception as e:  # pragma: no cover
                log(f"device front-end serving shape failed: {e!r}")
                devfe["xla_serve"] = {"error": repr(e)[:200]}
    else:
        log("device front-end skipped: budget exhausted")

    if devfe_fps is not None:
        e2e_fps, e2e_worst = devfe_fps, devfe_worst
        result["value"] = round(e2e_fps, 1)
        result["vs_baseline"] = round(e2e_fps / 30000.0, 4)
        result["detail"]["end_to_end_worst_fps"] = round(e2e_worst, 1)
    result["detail"]["headline_path"] = headline_path
    result["detail"]["device_frontend"] = devfe
    result["detail"]["device_frontend_validation"] = (
        "pending" if dfe_val is not None else None)
    # Second crash-safe preliminary: the 720p section and the strict gate
    # can each hit a 30-600 s tunnel compile; if an outer timeout kills the
    # process there, the CIF+devfe result above still reaches stdout.  The
    # final (superset) line below supersedes it when everything completes.
    emit(result)

    # --- 720p secondary metric (VERDICT r2 #5) ------------------------------
    p720 = None
    # Generous gate: the CIF sections can eat most of the budget in a
    # slow-compile tunnel window, and VERDICT r2 #5 wants the 720p numbers
    # in the driver artifact every round.  The preliminary JSON line above
    # already protects the CIF headline if this section is killed.
    if not args.no_720p and budget_left() > 60:
        try:
            W7, H7, S7, F7 = 1280, 720, 64, 8
            t0 = time.perf_counter()
            corp7 = [build_corpus(W7, H7, F7, seed=70 + c) for c in range(4)]
            lists7 = [[corp7[s % 4][t] for s in range(S7)] for t in range(F7)]
            lists7s = [[corp7[0][t]] * S7 for t in range(F7)]
            log(f"720p corpora encoded in {time.perf_counter() - t0:.1f}s")
            mbs7 = (-(-W7 // 16)) * (-(-H7 // 16))
            dec7 = BatchedStreamDecoder(
                S7, W7, H7, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pack_cap=args.pack_per_mb * mbs7, pallas=args.pallas,
                coef_transport="d24")
            best7, worst7, stages7 = measure_e2e(dec7, lists7, budget_left())
            best7s, worst7s, _ = measure_e2e(dec7, lists7s, budget_left())
            p720 = {"end_to_end_distinct_fps": round(best7, 1),
                    "end_to_end_distinct_worst_fps": round(worst7, 1),
                    "end_to_end_shared_fps": round(best7s, 1),
                    "end_to_end_shared_worst_fps": round(worst7s, 1),
                    "streams": S7,
                    "realtime_streams_distinct": round(best7 / 30.0, 1),
                    "realtime_streams_shared": round(best7s / 30.0, 1),
                    "stages_ms": stages7}
            log(f"720p e2e: {best7:.1f} frames/s/chip distinct (worst "
                f"{worst7:.1f}; = {best7 / 30.0:.0f} real-time streams), "
                f"{best7s:.1f} shared (= {best7s / 30.0:.0f} streams)")
        except Exception as e:  # pragma: no cover
            log(f"720p measurement skipped: {e!r}")
    elif not args.no_720p:
        log("720p measurement skipped: budget exhausted")
    result["detail"]["p720"] = p720

    # --- second CIF sample, minutes after the first --------------------------
    # The box's throughput drifts in multi-minute windows (CLAUDE.md
    # "Benchmark variance": identical code measured 22.8k-35.8k distinct
    # e2e across runs; the host probe alone spans 24k-40k f/s/core).
    # Three adjacent passes cannot escape a degraded window, so re-measure
    # both regimes here — the 720p section above provides the time
    # separation.  Folding rule: each sample is one window; the reported
    # worst is the HEALTHIEST window's internal worst (max over samples of
    # the per-sample worst).  A min over all passes would let one transient
    # noisy-neighbor window permanently define the round's worst even after
    # a later sample proves the box recovered (observed 2026-08-17: first
    # sample 25.8k/18.7k distinct, second 31.8k/28.5k minutes later).  All
    # sample pairs stay in the detail so nothing is hidden.
    if budget_left() > 30:
        s2_best, s2_worst, _ = measure_e2e(dec, shared_lists, budget_left())
        d2_best, d2_worst, _ = measure_e2e(dec, dist_lists, budget_left())
        log(f"second sample: shared {s2_best:.1f} (worst {s2_worst:.1f}), "
            f"distinct {d2_best:.1f} (worst {d2_worst:.1f}) frames/s/chip")
        result["detail"]["cif_sample_pairs_best_worst"] = {
            "shared": [[round(seq_fps, 1), round(seq_worst, 1)],
                       [round(s2_best, 1), round(s2_worst, 1)]],
            "distinct": [[round(seq_distinct_fps, 1),
                          round(seq_distinct_worst, 1)],
                         [round(d2_best, 1), round(d2_worst, 1)]],
        }
        seq_fps = max(seq_fps, s2_best)
        seq_worst = max(seq_worst, s2_worst)
        seq_distinct_fps = max(seq_distinct_fps, d2_best)
        seq_distinct_worst = max(seq_distinct_worst, d2_worst)
        d = result["detail"]
        if headline_path == "host":
            # Host path is the headline only when the device front-end
            # section was skipped or failed; fold the second sample in.
            e2e_fps = (seq_distinct_fps if args.corpus == "distinct"
                       else seq_fps)
            e2e_worst = (seq_distinct_worst if args.corpus == "distinct"
                         else seq_worst)
            result["value"] = round(e2e_fps, 1)
            result["vs_baseline"] = round(e2e_fps / 30000.0, 4)
            d["end_to_end_worst_fps"] = round(e2e_worst, 1)
        d["end_to_end_shared_fps"] = round(seq_fps, 1)
        d["end_to_end_shared_worst_fps"] = round(seq_worst, 1)
        d["end_to_end_distinct_fps"] = round(seq_distinct_fps, 1)
        d["end_to_end_distinct_worst_fps"] = round(seq_distinct_worst, 1)
    else:
        log("second CIF sample skipped: budget exhausted")

    # --- device front-end validation (MUST stay after all timing) -----------
    # These are the process's first readbacks of computed arrays (sync-mode
    # trap; see note above): replay the distinct GOP through both
    # front-ends, then fetch an on-device plane-equality scalar and the
    # per-lane status counts.  A failed validation DEMOTES the headline
    # back to the host path — a serving path that doesn't match the host
    # decoder bit-for-bit has no throughput claim.
    # NB: on a bare CPU backend (no conftest) the two distinct jitted
    # programs fuse differently and FMA-contract differently, so the
    # planes legitimately diverge by the known 1-ulp IDCT artifact; with
    # --xla_disable_hlo_passes=fusion (or on TPU, which is
    # reference-strict) they are bit-identical (verified CIF-scale).
    if dfe_val is not None:
        val_ok = False
        try:
            import jax.numpy as jnp

            for t in range(F):
                y, _, _ = dec.decode_step(dist_lists[t])
            for t in range(F):
                y2, _, _ = dfe_val.decode_step(dist_lists[t])
            eq = jnp.array_equal(y, y2)
            ok_count = (dfe_val.last_status == 0).sum()
            devfe["status_ok_streams"] = int(np.asarray(ok_count))
            devfe["plane_match_vs_host"] = bool(np.asarray(eq))
            val_ok = (devfe["plane_match_vs_host"]
                      and devfe["status_ok_streams"] == S)
            if serve_status is not None:
                n_ok = int(np.asarray((serve_status == 0).sum()))
                devfe["serve_status_ok_streams"] = n_ok
                val_ok = val_ok and n_ok == args.serve_streams
            log(f"device front-end validation: "
                f"{devfe['status_ok_streams']}/{S} ok, planes match "
                f"host: {devfe['plane_match_vs_host']}")
        except Exception as e:  # pragma: no cover
            log(f"device front-end validation FAILED to run: {e!r}")
            devfe["validation_error"] = repr(e)[:200]
        result["detail"]["device_frontend_validation"] = (
            "ok" if val_ok else "FAILED")
        if not val_ok and headline_path.startswith("device_frontend"):
            demoted_fps = (seq_distinct_fps if args.corpus == "distinct"
                           else seq_fps)
            demoted_worst = (seq_distinct_worst if args.corpus == "distinct"
                             else seq_worst)
            result["value"] = round(demoted_fps, 1)
            result["vs_baseline"] = round(demoted_fps / 30000.0, 4)
            result["detail"]["end_to_end_worst_fps"] = round(
                demoted_worst, 1)
            result["detail"]["headline_path"] = "host (devfe demoted)"
            log("device front-end validation FAILED -> headline demoted "
                "to the host path")

    # Correctness gate last (it reads back a pixel — see note above).  On
    # failure the FINAL line (the one a tail-parsing driver records) zeroes
    # the headline: a build that fails bit-exactness has no throughput.
    try:
        verify_strict_rounding(dec, W, H)
    except Exception:
        result["value"] = 0.0
        result["vs_baseline"] = 0.0
        result["detail"]["strict_rounding"] = "FAILED"
        emit(result)
        disarm_overall()
        raise
    log("strict f32 rounding verified on device")
    result["detail"]["strict_rounding"] = "verified"

    emit(result)
    disarm_overall()
    try:
        os.unlink(sidecar)
    except OSError:
        pass


if __name__ == "__main__":
    main()
