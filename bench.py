"""Benchmark: concurrent CIF Sorenson Spark decode throughput on one chip.

Headline metric: DISTINCT per-stream content — each stream decodes its own
corpus, the realistic serving regime.  Two production paths are measured
side by side and the headline is the MAX of the two by worst-pass fps
(VERDICT r3 #3 — the device front-end is promoted only where it actually
wins, never speculatively):

  * host path: native host entropy decode -> ONE fused uint8 leaf/step ->
    device reconstruction (parallel/batch.py)
  * device front-end: raw frame bytes -> on-device VLC automaton ->
    reconstruction (parallel/device_batch.py), at the serving shape
    --serve-streams (per-step cost is ~flat in S, so big batches win)

Artifact robustness (VERDICT r3 #1 — round 3 recorded rc=124/parsed=null):

  * The correctness gates (strict f32 rounding + device-front-end
    bit-exactness vs the host decoder) run in a FORKED CHILD at bench
    start, on tiny shapes, concurrently with the parent's compiles.  The
    child does its own readbacks (the axon sync-dispatch trap is
    per-process) and writes a JSON verdict the parent folds into every
    subsequent emission — the gates are timeout-proof instead of
    last-in-line.
  * ONE result record is upgraded in place and re-emitted after EVERY
    section, so whatever kills the process, the last stdout line is a
    complete final-format record.
  * Every section is budget-gated (--budget, default 1100 s soft) and the
    bench exits 0 with whatever it has — the driver requires a clean exit
    to parse the record at all.
  * Finalize cannot wedge: gates fold from a FILE before any device
    readback; every finalize device interaction runs in a bounded thread
    (first timeout marks the tunnel wedged, the rest are skipped); and an
    in-process deadline thread (--exit-deadline) emits the record and
    exits 0 even if the main thread is stuck in a C-level tunnel call
    (round-4 rehearsal: a finalize readback wedged ~40 min -> rc=137).

Stages measured: host entropy decode (both corpus regimes), end-to-end
sequential steps for both paths, device reconstruction in isolation,
presentation (deblock + BT.601 RGBA), 720p through both paths (VERDICT
r3 #4), and a second CIF sample minutes later (window-drift folding).

Prints the result as a JSON line:
  {"metric": "cif_decode_frames_per_sec_per_chip", "value": ..., "unit":
   "frames/s", "vs_baseline": value / 30000}
The LAST line on stdout is the authoritative record.  Two forked
watchdogs keep the record non-empty even if the TPU tunnel is down or
dies mid-run: init hang -> zeroed record (--init-timeout); mid-run hang ->
the last emitted line is replayed and the process killed
(--overall-timeout).

vs_baseline is against the north-star target of 1000 concurrent real-time
CIF streams per chip = 30000 frames/s (BASELINE.json; the reference
publishes no numbers of its own — BASELINE.md).

Flags: --streams N --frames N --width W --height H --json-only
       --corpus shared|distinct --no-720p --budget S --serve-streams N
       --no-gates --gates-timeout S
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
# crash-safe record) so the driver records real numbers, not silence.
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
    # Own session: the driver wraps the bench in GNU `timeout`, which
    # signals the whole process GROUP at expiry — round 3's watchdogs died
    # with the parent and never replayed the record (rc=124, parsed=null).
    # A detached watchdog survives the group kill, notices the parent's
    # death within ~2 s, replays the last emitted JSON line as the final
    # stdout line, and exits.
    child = subprocess.Popen(argv, start_new_session=True)

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


def measure_e2e(dec, frame_lists, budget_left, passes=3, window=0):
    """Warm pass (untimed, steady-state) + up to `passes` timed passes over
    frames 2..F; returns (best_fps, worst_fps, stages_best, stages_worst).

    Stage summaries are captured PER PASS and the summaries of the best
    and worst passes are returned separately (VERDICT r4 #7: a worst-pass
    outlier must be attributable to transfer vs dispatch vs prep from the
    record alone, not inferred from a best-pass mean).

    window > 0: decode through decode_steps in windows of `window` frames
    (the K-frame megastep — one device dispatch and one transfer leaf per
    K frames, amortizing the per-call host RPC floor that bounds the
    serving shape).  Frames 2..F are trimmed to a multiple of `window` so
    every pass replays the same (T, payload-rung) program shapes.
    """
    from h263_tpu.utils import trace

    S = dec.n
    F = len(frame_lists)
    if window:
        usable = ((F - 2) // window) * window
        if usable == 0:
            raise ValueError(
                f"megastep window {window} needs >= {window + 2} frames, "
                f"corpus has {F}")
        wins = [frame_lists[2 + k * window: 2 + (k + 1) * window]
                for k in range(usable // window)]

        def one_pass():
            for wlists in wins:
                ys, _, _ = dec.decode_steps(wlists)
            ys.block_until_ready()
            return S * usable

        # Seed the reference planes (I-frame rides in the first window)
        # and compile the T-frame program + the I-window's payload rung.
        ys, _, _ = dec.decode_steps(frame_lists[:window])
        ys.block_until_ready()
    else:
        def one_pass():
            for t in range(2, F):
                y, _, _ = dec.decode_step(frame_lists[t])
            y.block_until_ready()
            return S * (F - 2)

        y, _, _ = dec.decode_step(frame_lists[0])
        y, _, _ = dec.decode_step(frame_lists[1])
        y.block_until_ready()
    # Steady-state warm pass: first-pass effects (icache/predictor warmup,
    # CPU frequency ramp, lazily-bound buffers) measured ~15-40% slower
    # than steady state; serving throughput is the steady-state number.
    one_pass()
    best, worst = 0.0, float("inf")
    stages_best = stages_worst = None
    t_end = time.perf_counter() + budget_left
    for rep in range(passes):
        if rep and time.perf_counter() > t_end:
            break
        trace.reset_metrics()
        t0 = time.perf_counter()
        n_frames = one_pass()
        fps = n_frames / (time.perf_counter() - t0)
        st = stage_summary()
        if fps > best:
            best, stages_best = fps, st
        if fps < worst:
            worst, stages_worst = fps, st
    return best, worst, stages_best, stages_worst


# ---------------------------------------------------------------------------
# Correctness-gate child (VERDICT r3 #2)
# ---------------------------------------------------------------------------

def run_gates_child(out_path: str, budget_s: float, args=None) -> int:
    """Run the on-hardware correctness gates in THIS (child) process on
    tiny shapes and write a JSON verdict to `out_path`.

    Runs concurrently with the parent's sections from bench start: the
    axon readback trap is per-process (CLAUDE.md), so this child may fetch
    pixels freely, assert, report, and die — the gates no longer queue
    behind every timed section (round 3's artifact recorded both gates
    "pending" because the driver's timeout starved them).

    Gates:
      * strict f32 rounding through the production fused-transport host
        path + reconstruction kernels (the FMA-contraction hazard the
        reference's sequential accumulation defines,
        /root/reference/h263/src/decoder/cpu/idct.rs:119-131).
      * device front-end bit-exactness: an 8-frame GOP decoded through
        both front-ends must produce identical planes and all-ok lane
        status (the serving path has no throughput claim otherwise).

    All decode dispatches are issued BEFORE the first readback; the
    readbacks are a handful of on-device-reduced scalars.

    Serve-shape certification (VERDICT r4 #2): the parent can never
    reliably read its own S=1024 lane statuses (the axon readback trap
    wedged the r4 finalize and left status_ok_streams "unread"), so this
    child ALSO replays the parent's full serve content — same S, same
    corpora, same shapes — through both the single-step and K-megastep
    device-front-end paths, reduces the [T, S] statuses to scalars ON
    DEVICE, and reports the ok-lane counts + megastep-vs-single plane
    equality in its verdict file.  The driver record then proves S=1024
    correctness even when the parent's own bounded fetch times out.
    """
    report = {"ok": False, "strict_rounding": "pending",
              "devfe_match": "pending", "devfe_status_ok": None,
              "devfe_distinct_match": "pending",
              "devfe_distinct_bad_lanes": None,
              "streams": 4, "backend": None, "payload_layout": None,
              "serve_cert": None,
              "wall_s": None, "error": None}
    t0 = time.perf_counter()

    def flush():
        report["wall_s"] = round(time.perf_counter() - t0, 1)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f)
        os.replace(tmp, out_path)

    flush()
    # Self-watchdog: the jax import / a tunnel compile can hang in C code.
    disarm = _spawn_watchdog(budget_s) if budget_s > 0 else (lambda: None)
    try:
        import jax

        # The axon plugin ignores JAX_PLATFORMS from the environment; honor
        # it through jax.config so off-TPU smoke tests of the bench (and
        # the forked gate child, which inherits the env) stay off the
        # tunnel (same pinning as tests/conftest.py).
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            jax.config.update("jax_platforms", "cpu")
        jax.devices()
        disarm()
        backend = jax.default_backend()
        report["backend"] = backend
        if backend == "cpu":
            # Mirrors tests/conftest.py: XLA:CPU's fusion emitter
            # FMA-contracts f32 mul+add, which both fails the strict gate
            # and makes the two (differently-fused) jitted programs
            # legitimately diverge by 1 ulp.  If the spawner didn't
            # disable the pass, the gates below would report backend
            # properties, not decoder bugs — record that.
            if "xla_disable_hlo_passes" not in os.environ.get("XLA_FLAGS", ""):
                report["note"] = ("cpu backend without fusion-pass disable: "
                                  "gates test XLA:CPU fusion, not the decoder")
        import jax.numpy as jnp

        from h263_tpu.parallel.batch import BatchedStreamDecoder
        from h263_tpu.parallel.device_batch import DeviceFrontendDecoder
        from h263_tpu.types import DecoderOption

        pallas = "off" if backend == "cpu" else "tpu"
        W, H, S, F = 176, 144, 4, 8
        nmb = (-(-W // 16)) * (-(-H // 16))
        corpus = build_corpus(W, H, F, seed=31)
        lists = [[corpus[t]] * S for t in range(F)]

        dec = BatchedStreamDecoder(
            S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
            pack_cap=10 * nmb, pallas=pallas, coef_transport="d24")
        dfe = DeviceFrontendDecoder(
            S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
            pallas=pallas, tape_len=16 * nmb, max_frame_bytes=8192,
            harness="xla")
        report["payload_layout"] = dfe.payload
        flush()

        # Dispatch both GOPs fully before any readback.
        for t in range(F):
            y1, cb1, cr1 = dec.decode_step(lists[t])
        for t in range(F):
            y2, cb2, cr2 = dfe.decode_step(lists[t])
        eq = (jnp.array_equal(y1, y2) & jnp.array_equal(cb1, cb2)
              & jnp.array_equal(cr1, cr2))
        n_ok = (dfe.last_status == 0).sum()

        # Distinct-content certification for the parent's serve sections:
        # the parent can NEVER cheaply read its own lane statuses (the
        # axon trap conversion measured ~212 s in a minimal process and
        # wedged >40 min in the full bench), so the CHILD certifies that
        # every corpus in the parent's distinct pool decodes through the
        # devfe with all lanes status-ok and planes equal to the host
        # decoder — at the same per-MB tape budget (16/MB) the serve
        # sections use.  A silently-errored lane decodes a cheap identity
        # frame, which would INFLATE the parent's serve numbers; this
        # gate is what makes them trustworthy.  QCIF here, CIF there:
        # tape need is per-MB, so the budget check carries over.  Reuses
        # the S=4 programs compiled above — zero extra compiles; all
        # dispatches land before the first readback.
        n_corp = 24
        dist = [build_corpus(W, H, F, seed=100 + c) for c in range(n_corp)]
        sweep = []
        for g in range(0, n_corp, S):
            group = dist[g:g + S]
            dh = BatchedStreamDecoder(
                S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pack_cap=10 * nmb, pallas=pallas, coef_transport="d24")
            dv = DeviceFrontendDecoder(
                S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pallas=pallas, tape_len=16 * nmb, max_frame_bytes=8192,
                harness="xla")
            for t in range(F):
                hy, hcb, hcr = dh.decode_step(
                    [group[s][t] for s in range(S)])
                vy, vcb, vcr = dv.decode_step(
                    [group[s][t] for s in range(S)])
            sweep.append((
                jnp.array_equal(hy, vy) & jnp.array_equal(hcb, vcb)
                & jnp.array_equal(hcr, vcr),
                (dv.last_status != 0).sum()))

        # Strict-rounding gate (this performs the child's first readback).
        try:
            verify_strict_rounding(dec, W, H)
            report["strict_rounding"] = "ok"
        except AssertionError as e:
            report["strict_rounding"] = f"FAILED: {e}"
        flush()

        report["devfe_match"] = "ok" if bool(np.asarray(eq)) else "FAILED"
        report["devfe_status_ok"] = int(np.asarray(n_ok))
        flush()
        bad_groups = [g for g, (e, _) in enumerate(sweep)
                      if not bool(np.asarray(e))]
        bad_lanes = sum(int(np.asarray(b)) for _, b in sweep)
        report["devfe_distinct_bad_lanes"] = bad_lanes
        report["devfe_distinct_match"] = (
            "ok" if not bad_groups and bad_lanes == 0
            else f"FAILED: groups {bad_groups}, {bad_lanes} errored lanes")
        report["ok"] = (report["strict_rounding"] == "ok"
                        and report["devfe_match"] == "ok"
                        and report["devfe_status_ok"] == S
                        and report["devfe_distinct_match"] == "ok")
        flush()

        # Serve-shape certification (VERDICT r4 #2) — AFTER the primary
        # verdicts so its big compiles never delay them.  Exact parent
        # serve shapes: same W/H, the same distinct corpora (seeds 100+c),
        # the serving batch size, and the parent's tape/payload params.
        # The process is already in the axon post-readback sync mode here,
        # so each dispatch costs ~1 s — the loop below is minutes, which
        # is why it runs last and flushes incrementally.
        S_big = getattr(args, "serve_streams", 0) if args else 0
        K = getattr(args, "megastep", 0) if args else 0
        if S_big > 0 and (backend != "cpu" or os.environ.get(
                "H263_BENCH_FORCE_SERVE_CERT")):
            Wc, Hc, Fc = args.width, args.height, args.frames
            mbs_c = (-(-Wc // 16)) * (-(-Hc // 16))
            n_corp = max(2, args.distinct_corpora)
            usable = max(K, (Fc // K) * K) if K > 0 else Fc
            corp = [build_corpus(Wc, Hc, Fc, seed=100 + c)
                    for c in range(n_corp)]
            cert_lists = [[corp[s % n_corp][t % Fc] for s in range(S_big)]
                          for t in range(usable)]
            cert = {"streams": S_big, "frames": usable,
                    "megastep_window": K,
                    "status_ok_streams": "pending",
                    "bad_lane_frames_single": None,
                    "bad_lane_frames_megastep": None,
                    "megastep_match": "pending" if K > 0 else "n/a"}
            report["serve_cert"] = cert
            flush()
            d1 = DeviceFrontendDecoder(
                S_big, Wc, Hc, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pallas=pallas, tape_len=16 * mbs_c, max_frame_bytes=8192,
                harness="xla")
            bad1 = jnp.zeros((), jnp.int32)
            for t in range(usable):
                d1.decode_step(cert_lists[t])
                bad1 = bad1 + (d1.last_status != 0).sum().astype(jnp.int32)
            cert["bad_lane_frames_single"] = int(np.asarray(bad1))
            cert["status_ok_streams"] = int(
                np.asarray((d1.last_status == 0).sum()))
            flush()

            def drop_staged(dec_obj):
                # Release the decoder's staged step outputs (the reuse
                # gate's in_flight refs).  At the serving shape the K=8
                # stacked [T, S, H, W] outputs are ~2.5 GB per ping-pong
                # slot and this child SHARES the chip's HBM with the
                # parent's still-alive serve/720p decoders — the r5
                # rehearsal-3 TPU worker crash happened exactly at the
                # combined peak.  Certification has no throughput goal,
                # so blocking + dropping after every dispatch is free.
                for pp in getattr(dec_obj, "_stage_pp", {}).values():
                    infl = pp.get("in_flight")
                    if not infl:
                        continue
                    for i, fl in enumerate(infl):
                        if fl is not None:
                            for a in fl:
                                a.block_until_ready()
                            infl[i] = None

            drop_staged(d1)
            if K > 0:
                # Defer the megastep cert until the parent has freed its
                # serving/720p decoders (it touches <out>.parent_done
                # right after) — the T-frame program's stacked outputs
                # plus the parent's live decoders crashed the TPU worker
                # twice at the combined peak (rehearsals 3-4); the
                # single-step cert above is lighter and runs
                # concurrently just fine.  Bounded: proceed anyway after
                # 900 s (a dead parent must not starve the verdict).
                t_wait = time.perf_counter()
                while (not os.path.exists(out_path + ".parent_done")
                       and time.perf_counter() - t_wait < 900.0):
                    time.sleep(5)
                # The megastep cert keeps dying to transient TPU-worker /
                # tunnel faults in degraded-window minutes (rehearsals
                # 3-5: "TPU worker process crashed or restarted" exactly
                # here while the parent observed wedged readbacks) — so
                # on a runtime error, cool down and retry once with a
                # fresh decoder; a second failure records an explicit
                # environment error instead of leaving "pending" (the
                # fold demotes only on FAILED / nonzero bad counts).
                for attempt in (1, 2):
                    try:
                        dm = DeviceFrontendDecoder(
                            S_big, Wc, Hc,
                            DecoderOption.SORENSON_SPARK_BITSTREAM,
                            pallas=pallas, tape_len=16 * mbs_c,
                            max_frame_bytes=8192, harness="xla")
                        bad_m = jnp.zeros((), jnp.int32)
                        for k0 in range(0, usable, K):
                            dm.decode_steps(cert_lists[k0:k0 + K])
                            bad_m = bad_m + (
                                dm.last_status_steps != 0).sum(
                                ).astype(jnp.int32)
                            drop_staged(dm)
                        eq_m = (jnp.array_equal(d1.ref_y, dm.ref_y)
                                & jnp.array_equal(d1.ref_cb, dm.ref_cb)
                                & jnp.array_equal(d1.ref_cr, dm.ref_cr))
                        cert["bad_lane_frames_megastep"] = int(
                            np.asarray(bad_m))
                        cert["megastep_match"] = (
                            "ok" if bool(np.asarray(eq_m)) else "FAILED")
                        break
                    except Exception as em:  # pragma: no cover - env faults
                        cert["megastep_match"] = (
                            f"error: {em!r:.200}")
                        flush()
                        if attempt == 1:
                            dm = None
                            time.sleep(90)
                if str(cert["megastep_match"]).startswith("error"):
                    # Full-shape megastep cert failed on an environment
                    # fault both times (it has never once succeeded in a
                    # bench child at S=2048/K=8 while the parent runs the
                    # same program fine — rehearsals 3-6).  Certify the
                    # megastep-vs-single plane equality at a smaller
                    # batch instead: the T-frame scan program is
                    # structurally identical, only the lane count
                    # differs, so this still pins the K-frame path's
                    # correctness ON HARDWARE; the record says which
                    # shape proved it.
                    try:
                        S_f = min(512, S_big)
                        fb_lists = [[corp[s % n_corp][t % Fc]
                                     for s in range(S_f)]
                                    for t in range(usable)]
                        df1 = DeviceFrontendDecoder(
                            S_f, Wc, Hc,
                            DecoderOption.SORENSON_SPARK_BITSTREAM,
                            pallas=pallas, tape_len=16 * mbs_c,
                            max_frame_bytes=8192, harness="xla")
                        for t in range(usable):
                            df1.decode_step(fb_lists[t])
                        drop_staged(df1)
                        dfm = DeviceFrontendDecoder(
                            S_f, Wc, Hc,
                            DecoderOption.SORENSON_SPARK_BITSTREAM,
                            pallas=pallas, tape_len=16 * mbs_c,
                            max_frame_bytes=8192, harness="xla")
                        bad_f = jnp.zeros((), jnp.int32)
                        for k0 in range(0, usable, K):
                            dfm.decode_steps(fb_lists[k0:k0 + K])
                            bad_f = bad_f + (
                                dfm.last_status_steps != 0).sum(
                                ).astype(jnp.int32)
                            drop_staged(dfm)
                        eq_f = (jnp.array_equal(df1.ref_y, dfm.ref_y)
                                & jnp.array_equal(df1.ref_cb, dfm.ref_cb)
                                & jnp.array_equal(df1.ref_cr, dfm.ref_cr))
                        cert["megastep_fallback"] = {
                            "streams": S_f,
                            "bad_lane_frames": int(np.asarray(bad_f)),
                            "match": ("ok" if bool(np.asarray(eq_f))
                                      else "FAILED")}
                    except Exception as ef:  # pragma: no cover
                        cert["megastep_fallback"] = {
                            "error": repr(ef)[:200]}
                    flush()
            cert["cert_ok"] = (
                cert["status_ok_streams"] == S_big
                and cert["bad_lane_frames_single"] == 0
                and (K == 0 or (cert["bad_lane_frames_megastep"] == 0
                                and cert["megastep_match"] == "ok")))
            flush()
    except Exception as e:  # pragma: no cover
        report["error"] = repr(e)[:300]
        flush()
        return 1
    return 0 if report["ok"] else 1


def main():
    bench_t0 = time.perf_counter()
    import threading

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
    ap.add_argument("--serve-streams", type=int, default=2048,
                    help="batch size for the device-front-end serving "
                         "shape; the automaton's per-step cost is ~flat in "
                         "S so larger batches raise frames/s/chip nearly "
                         "linearly (measured 2026-08-21: S=2048 single-step "
                         "547k / K=4 megastep 626-629k f/s in a healthy "
                         "moment vs 274-338k / 410-605k at S=1024; "
                         "degraded-window mode is byte-bound and therefore "
                         "~S-invariant).  0 skips the section")
    ap.add_argument("--megastep", type=int, default=8,
                    help="K-frame megastep window for the device-front-end "
                         "serving shape (decode_steps: one transfer leaf + "
                         "one dispatch per K frames, amortizing the host "
                         "RPC floor).  Default 8: interleaved same-window "
                         "A/B 2026-08-21 measured K=8 median 497k vs K=4 "
                         "414k f/s at S=2048 and K=8 >= K=4 in every group "
                         "incl. degraded; 720p S=256 K=8 verified no-OOM. "
                         "0 skips the megastep section")
    ap.add_argument("--no-720p", action="store_true",
                    help="skip the 720p secondary measurement")
    ap.add_argument("--budget", type=float, default=1100.0,
                    help="soft wall-clock budget (s); compile-bearing "
                         "sections are skipped once the remaining budget "
                         "cannot absorb a worst-case tunnel compile, and "
                         "the bench always exits 0 with a complete record")
    ap.add_argument("--exit-deadline", type=float, default=1560.0,
                    help="hard in-process deadline (s): a daemon thread "
                         "emits the current record and os._exit(0)s at "
                         "this wall time even if the main thread is wedged "
                         "in a C-level tunnel call (round-4 rehearsal: a "
                         "finalize readback wedged ~40 min in a degraded "
                         "window and the run died to SIGKILL, rc=137).  "
                         "Works whenever the wedged call releases the GIL; "
                         "the forked --overall-timeout watchdog remains "
                         "the last resort when it doesn't.  <=0 disables")
    ap.add_argument("--init-timeout", type=float, default=600.0,
                    help="hard bound (s) on jax import + device discovery; "
                         "if exceeded (TPU tunnel down) a zeroed JSON "
                         "record is emitted and the bench aborts instead "
                         "of hanging.  <=0 disables the watchdog")
    ap.add_argument("--overall-timeout", type=float, default=2400.0,
                    help="hard bound (s) on the whole bench after init; on "
                         "expiry the last emitted JSON line (a complete "
                         "record) is replayed and the process is killed — "
                         "covers the tunnel dying mid-compile.  <=0 disables")
    ap.add_argument("--no-gates", action="store_true",
                    help="skip the forked correctness-gate child (testing)")
    ap.add_argument("--gates-timeout", type=float, default=1500.0,
                    help="bound (s) on the gate child's whole run (the "
                         "megastep half of the serve cert waits for the "
                         "parent's finalize-time HBM frees, so the child "
                         "budget must reach past the parent's timed "
                         "sections; its verdict file flushes after every "
                         "sub-verdict either way)")
    ap.add_argument("--run-gates", metavar="OUT", default=None,
                    help=argparse.SUPPRESS)  # internal: gate-child mode
    args = ap.parse_args()

    if args.run_gates:
        sys.exit(run_gates_child(args.run_gates, args.gates_timeout, args))

    disarm_watchdog = (_spawn_watchdog(args.init_timeout)
                       if args.init_timeout > 0 else (lambda: None))

    # Spawn the gate child BEFORE the parent's own jax init: its tiny-shape
    # compiles overlap the parent's corpus building and big compiles.  Its
    # stdout/stderr go to a log file — the parent's stdout carries only
    # JSON records.
    gates_path = f"/tmp/h263_bench_gates_{os.getpid()}.json"
    gates_log = f"/tmp/h263_bench_gates_{os.getpid()}.log"
    gates_child = None
    for p in (gates_path, gates_path + ".tmp", gates_path + ".parent_done"):
        try:
            os.unlink(p)
        except OSError:
            pass
    if not args.no_gates:
        gates_child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--run-gates", gates_path,
             "--gates-timeout", str(args.gates_timeout),
             # Serve-shape certification params (VERDICT r4 #2): the child
             # replays the parent's exact serve content and reports the
             # S=1024 lane statuses the parent cannot safely read itself.
             "--serve-streams", str(args.serve_streams),
             "--frames", str(args.frames),
             "--width", str(args.width),
             "--height", str(args.height),
             "--megastep", str(args.megastep),
             "--distinct-corpora", str(args.distinct_corpora)],
            stdout=open(gates_log, "w"), stderr=subprocess.STDOUT)

    import jax

    # See run_gates_child: the axon plugin ignores the env var; honor it
    # via jax.config so `JAX_PLATFORMS=cpu python bench.py` really runs CPU.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    jax.devices()  # force platform init under the watchdog
    disarm_watchdog()
    sidecar = f"/tmp/h263_bench_last_{os.getpid()}.json"
    try:
        os.unlink(sidecar)
    except OSError:
        pass
    disarm_overall = (_spawn_watchdog(args.overall_timeout, sidecar)
                      if args.overall_timeout > 0 else (lambda: None))

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
    mbs_per_frame = (-(-W // 16)) * (-(-H // 16))

    # ---- the ONE record, upgraded in place and emitted after every section
    result = {
        "metric": "cif_decode_frames_per_sec_per_chip",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "detail": {
            "headline_regime": args.corpus,
            "headline_path": None,
            "sections_completed": [],
            "host_parse_fps_per_core": None,
            "host_parse_distinct_fps_per_core": None,
            "end_to_end_shared_fps": None,
            "end_to_end_shared_worst_fps": None,
            "end_to_end_distinct_fps": None,
            "end_to_end_distinct_worst_fps": None,
            "end_to_end_worst_fps": None,
            "end_to_end_pipelined_diagnostic_fps": None,
            "device_stage_fps": None,
            "present_rgba_fps": None,
            "devfe_serve": None,
            "device_frontend_validation": "pending",
            "stages_ms_shared": None,
            "stages_ms_distinct": None,
            "p720": None,
            "gates": None,
            "strict_rounding": "pending",
            "transport": args.transport,
            "fused_transport": None,
            "native_frontend": None,
            "streams": S, "frames": F, "width": W, "height": H,
            "serve_streams": args.serve_streams,
            "elapsed_s": None,
            "baseline_note": ("vs north-star 1000 real-time CIF streams/"
                              "chip (30000 f/s); reference publishes no "
                              "numbers"),
        },
    }
    detail = result["detail"]

    _emit_lock = threading.Lock()

    def emit(section=None):
        if section:
            detail["sections_completed"].append(section)
        detail["elapsed_s"] = round(time.perf_counter() - bench_t0, 1)
        line = json.dumps(result)
        with _emit_lock:
            with open(sidecar, "a") as f:
                f.write(line + "\n")
            print(line, flush=True)

    # Hard in-process deadline (round-4 rehearsal, rc=137): if the main
    # thread is wedged in a C-level tunnel call at the deadline, this
    # daemon thread emits the current (complete, final-format) record as
    # the last stdout line and exits 0.  Tunnel RPC waits release the GIL,
    # so the thread runs even mid-wedge; a GIL-holding wedge falls through
    # to the forked SIGKILL watchdog.
    def _deadline_exit():
        delay = args.exit_deadline - (time.perf_counter() - bench_t0)
        if delay > 0:
            time.sleep(delay)
        try:
            detail["sections_completed"].append("deadline_exit")
            emit()
        except Exception:  # pragma: no cover
            pass
        try:
            if gates_child is not None and gates_child.poll() is None:
                gates_child.kill()
        except Exception:  # pragma: no cover
            pass
        os._exit(0)

    if args.exit_deadline > 0:
        threading.Thread(target=_deadline_exit, daemon=True).start()

    _wedged = {"flag": False}

    def bounded_device(fn, timeout_s, label):
        """Run a device interaction in a daemon thread with a deadline;
        returns (value, None) or (None, reason).  The first timeout marks
        the tunnel wedged and every later interaction is skipped — a
        wedged call holds the runtime's dispatch path, so piling more
        threads onto it only wedges them too."""
        if _wedged["flag"]:
            return None, "skipped (tunnel wedged)"
        out = {}

        def run():
            try:
                out["v"] = fn()
            except Exception as e:  # pragma: no cover
                out["e"] = repr(e)[:200]

        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(timeout_s)
        if th.is_alive():
            _wedged["flag"] = True
            log(f"{label}: no result within {timeout_s:.0f}s -> tunnel "
                f"marked wedged; skipping remaining device interactions")
            return None, f"timeout>{timeout_s:.0f}s"
        if "e" in out:
            return None, out["e"]
        return out.get("v", True), None

    # The driver bounds the bench with GNU `timeout` (SIGTERM).  If it
    # fires while Python bytecode is running, emit the current record as
    # the last stdout line and leave cleanly; if the process is wedged in
    # a C-level tunnel compile, the handler can't run and the detached
    # mid-run watchdog replays the sidecar instead.
    import signal as _signal

    def _on_term(signum, frame):  # pragma: no cover - driver-kill path
        detail.setdefault("sections_completed", []).append("sigterm")
        emit()
        os._exit(0)

    _signal.signal(_signal.SIGTERM, _on_term)

    def poll_gates(wait_s: float = 0.0):
        """Fold the gate child's verdict (if available) into the record.
        Returns True once a final verdict (ok or failed) has landed."""
        if args.no_gates:
            return True
        deadline = time.perf_counter() + wait_s
        while True:
            g = None
            if os.path.exists(gates_path):
                try:
                    with open(gates_path) as f:
                        g = json.load(f)
                except (OSError, ValueError):
                    g = None
            if g is not None:
                detail["gates"] = g
                detail["strict_rounding"] = g["strict_rounding"]
                dmatch = g.get("devfe_distinct_match", "ok")
                if g["devfe_match"] != "pending" and dmatch != "pending":
                    detail["device_frontend_validation"] = (
                        "ok" if (g["devfe_match"] == "ok"
                                 and g["devfe_status_ok"]
                                 == g.get("streams", 4)
                                 and dmatch == "ok")
                        else "FAILED")
                done = (g["error"] is not None
                        or (g["strict_rounding"] != "pending"
                            and g["devfe_match"] != "pending"
                            and dmatch != "pending"))
                if done:
                    return True
            if time.perf_counter() >= deadline:
                return False
            time.sleep(2)

    # Headline bookkeeping: candidate paths, each (best_fps, worst_fps).
    paths = {}

    def refresh_headline():
        """Headline = the path with the best WORST-pass fps (tie: best)."""
        if not paths:
            return
        name, (best, worst) = max(
            paths.items(), key=lambda kv: (kv[1][1], kv[1][0]))
        result["value"] = round(best, 1)
        result["vs_baseline"] = round(best / 30000.0, 4)
        detail["headline_path"] = name
        detail["end_to_end_worst_fps"] = round(worst, 1)

    # ---- corpora ----------------------------------------------------------
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
    detail["native_frontend"] = bool(native)
    emit("init")

    # ---- section A: host path, both CIF regimes ---------------------------
    dec = None
    seq_fps = seq_worst = seq_distinct_fps = seq_distinct_worst = None
    try:
        dec = BatchedStreamDecoder(
            S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
            pack_cap=args.pack_per_mb * mbs_per_frame, pallas=args.pallas,
            coef_transport=args.transport)
        detail["fused_transport"] = bool(dec._fused_enabled)
        log(f"coefficient transport: {args.transport} "
            f"(fused single-leaf: {dec._fused_enabled})")

        host_probe = BatchedStreamDecoder(
            S, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
            pack_cap=args.pack_per_mb * mbs_per_frame,
            coef_transport=args.transport)
        pk = host_probe.next_packed_batch()

        def probe(lists):
            # Full warm pass first: first-walk effects (predictor/icache/
            # CPU frequency) measured 15-40% slower than steady state.
            for t in range(F):
                host_probe.parse_batch_packed(lists[t], pk)
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for t in range(1, F):
                    host_probe.parse_batch_packed(lists[t], pk)
                best = max(best, S * (F - 1) / (time.perf_counter() - t0))
            return best

        # Each regime's probe runs immediately before its end-to-end
        # section: the box's throughput drifts between minutes, and
        # separating them produced artifacts where the parse-only rate read
        # BELOW the e2e rate (different windows).
        trace.reset_metrics()
        host_fps = probe(shared_lists)
        detail["host_parse_fps_per_core"] = round(host_fps, 1)
        log(f"host entropy decode: {host_fps:.1f} frames/s/core "
            f"(best of 3 passes, shared corpus)")
        seq_fps, seq_worst, stages_shared, stages_shared_w = measure_e2e(
            dec, shared_lists, budget_left())
        detail["end_to_end_shared_fps"] = round(seq_fps, 1)
        detail["end_to_end_shared_worst_fps"] = round(seq_worst, 1)
        detail["stages_ms_shared"] = stages_shared
        detail["stages_ms_shared_worst"] = stages_shared_w
        log(f"end-to-end sequential: {seq_fps:.1f} frames/s/chip "
            f"(batch={S}, shared corpus, best of 3; worst {seq_worst:.1f})")
        log(f"  stages: { {k: v['mean_ms'] for k, v in stages_shared.items()} }")

        host_distinct_fps = probe(dist_lists)
        detail["host_parse_distinct_fps_per_core"] = round(
            host_distinct_fps, 1)
        log(f"host entropy decode: {host_distinct_fps:.1f} frames/s/core "
            f"(best of 3 passes, DISTINCT per-stream content)")
        (seq_distinct_fps, seq_distinct_worst, stages_distinct,
         stages_distinct_w) = measure_e2e(dec, dist_lists, budget_left())
        detail["end_to_end_distinct_fps"] = round(seq_distinct_fps, 1)
        detail["end_to_end_distinct_worst_fps"] = round(
            seq_distinct_worst, 1)
        detail["stages_ms_distinct"] = stages_distinct
        detail["stages_ms_distinct_worst"] = stages_distinct_w
        log(f"end-to-end sequential: {seq_distinct_fps:.1f} frames/s/chip "
            f"(DISTINCT content, best of 3; worst {seq_distinct_worst:.1f})")
        log(f"  stages: { {k: v['mean_ms'] for k, v in stages_distinct.items()} }")

        paths["host"] = ((seq_distinct_fps, seq_distinct_worst)
                         if args.corpus == "distinct"
                         else (seq_fps, seq_worst))
        refresh_headline()
    except Exception as e:  # pragma: no cover
        log(f"host-path section failed: {e!r}")
        detail["host_path_error"] = repr(e)[:200]
    poll_gates()
    emit("host_cif")

    # ---- section A2: cheap host-path diagnostics (no new big compiles) ----
    if dec is not None and budget_left() > 60:
        try:
            # Pipelined mode: diagnostic only — on this 1-host-core box the
            # tunnel transfer is CPU-bound, so overlapping it with the
            # parse just time-slices the core (tools/prof_pipeline.py).
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
            detail["end_to_end_pipelined_diagnostic_fps"] = round(pipe_fps, 1)
            log(f"end-to-end pipelined (diagnostic): {pipe_fps:.1f} "
                f"frames/s/chip ({1e3 * pipe_dt / (2 * F):.2f} ms/step)")
            trace.reset_metrics()

            # Device stage in isolation (packed transfer + reconstruct).
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
                device_fps = max(device_fps,
                                 S * reps / (time.perf_counter() - t0))
            detail["device_stage_fps"] = round(device_fps, 1)
            log(f"device stage (packed transfer+compute): {device_fps:.1f} "
                f"frames/s/chip (best of 3 passes)")
        except Exception as e:  # pragma: no cover
            log(f"host-path diagnostics failed: {e!r}")
        emit("host_diagnostics")

    # ---- section A3: presentation (deblock + BT.601 RGBA) ------------------
    # One new compile; not part of the headline decode metric.
    if dec is not None and budget_left() > 240:
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
            detail["present_rgba_fps"] = round(present_fps, 1)
            log(f"present (deblock+RGBA): {present_fps:.1f} frames/s/chip "
                f"({1e3 * present_dt / reps_p:.2f} ms/step)")
        except Exception as e:  # pragma: no cover
            log(f"present measurement skipped: {e!r}")
        emit("present")

    # ---- section B: device front-end at the serving shape ------------------
    # Raw frame bytes ship to the device (the smallest possible transport)
    # and the VLC automaton decodes all streams as lockstep vector lanes
    # (parser/device_frontend.py).  Hardware-validated bit-exact
    # (tools/soak_hw.py --frontend device); the gate child re-validates
    # every run.  Compute-isolated cost is ~flat in S
    # (docs/DEVFE_COMPUTE_SWEEP_r3.json), so the serving shape is the
    # largest batch the content mix sustains.
    dfe_serve = None
    serve_status = None
    serve_status_steps = None
    S_serve = args.serve_streams
    if S_serve > 0 and budget_left() > 300:
        try:
            from h263_tpu.parallel.device_batch import DeviceFrontendDecoder

            serve_lists = [[distinct[s % n_corp][t] for s in range(S_serve)]
                           for t in range(F)]
            # Tape budget: the corpus I-frame costs ~9.5 automaton
            # iterations per MB (1 header + 6 INTRADC + 1-4 ACs); 16
            # clears it with margin.
            dfe_serve = DeviceFrontendDecoder(
                S_serve, W, H, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pallas=args.pallas, tape_len=16 * mbs_per_frame,
                max_frame_bytes=8192, harness="xla")
            best_s, worst_s, stages_s, stages_s_w = measure_e2e(
                dfe_serve, serve_lists, budget_left())
            detail["devfe_serve"] = {
                "streams": S_serve,
                "payload_layout": dfe_serve.payload,
                "end_to_end_distinct_fps": round(best_s, 1),
                "end_to_end_distinct_worst_fps": round(worst_s, 1),
                "stages_ms": stages_s,
                "stages_ms_worst": stages_s_w,
            }
            paths["devfe_serve"] = (best_s, worst_s)
            refresh_headline()
            log(f"device front-end e2e: {best_s:.1f} frames/s/chip "
                f"distinct (serving shape S={S_serve}, worst {worst_s:.1f}, "
                f"payload={dfe_serve.payload})")
            # Keep only the tiny per-lane status array for the end-of-run
            # check; the serve lists stay (second sample reuses them).
            serve_status = dfe_serve.last_status
        except Exception as e:  # pragma: no cover
            log(f"device front-end serving shape failed: {e!r}")
            detail["devfe_serve"] = {"error": repr(e)[:200]}
            dfe_serve = None
        poll_gates()
        emit("devfe_serve")

        # K-frame megastep (VERDICT r4 #3): same decoder, but decode_steps
        # ships K frames in ONE transfer leaf and runs K automaton frames
        # per dispatch — the single-frame serve step is host-RPC-floor-
        # bound (prep + transfer RPC + dispatch RPC, all host-side), so
        # the megastep amortizes that floor K ways and exposes the
        # device automaton as the bound instead.
        if dfe_serve is not None and args.megastep > 0 and budget_left() > 180:
            try:
                best_m, worst_m, stages_m, stages_m_w = measure_e2e(
                    dfe_serve, serve_lists, budget_left(),
                    window=args.megastep)
                detail["devfe_serve"]["megastep"] = {
                    "window": args.megastep,
                    "end_to_end_distinct_fps": round(best_m, 1),
                    "end_to_end_distinct_worst_fps": round(worst_m, 1),
                    "stages_ms": stages_m,
                    "stages_ms_worst": stages_m_w,
                }
                paths["devfe_megastep"] = (best_m, worst_m)
                refresh_headline()
                log(f"device front-end megastep e2e: {best_m:.1f} frames/s/"
                    f"chip distinct (K={args.megastep}, worst {worst_m:.1f})")
                serve_status_steps = dfe_serve.last_status_steps
            except Exception as e:  # pragma: no cover
                log(f"megastep section failed: {e!r}")
                detail["devfe_serve"]["megastep"] = {"error": repr(e)[:200]}
            emit("devfe_megastep")
    else:
        log("device front-end serving section skipped "
            f"(serve_streams={S_serve}, budget_left={budget_left():.0f})")

    # ---- section C: 720p through both paths (VERDICT r3 #4) ----------------
    dfe7_status = None
    if not args.no_720p and budget_left() > 300:
        p720 = {}
        try:
            # 16 frames so the K=8 megastep window has a full usable
            # window after the 2 seed frames (measure_e2e trims to a
            # multiple of K).
            W7, H7, S7, F7 = 1280, 720, 64, 16
            t0 = time.perf_counter()
            corp7 = [build_corpus(W7, H7, F7, seed=70 + c) for c in range(4)]
            lists7 = [[corp7[s % 4][t] for s in range(S7)] for t in range(F7)]
            log(f"720p corpora encoded in {time.perf_counter() - t0:.1f}s")
            mbs7 = (-(-W7 // 16)) * (-(-H7 // 16))
            dec7 = BatchedStreamDecoder(
                S7, W7, H7, DecoderOption.SORENSON_SPARK_BITSTREAM,
                pack_cap=args.pack_per_mb * mbs7, pallas=args.pallas,
                coef_transport="d24")
            best7, worst7, stages7, stages7w = measure_e2e(
                dec7, lists7, budget_left())
            p720["host"] = {
                "end_to_end_distinct_fps": round(best7, 1),
                "end_to_end_distinct_worst_fps": round(worst7, 1),
                "realtime_streams_distinct": round(best7 / 30.0, 1),
                "stages_ms": stages7, "stages_ms_worst": stages7w}
            p720["streams"] = S7
            detail["p720"] = p720
            log(f"720p host-path e2e: {best7:.1f} frames/s/chip distinct "
                f"(worst {worst7:.1f}; = {best7 / 30.0:.0f} real-time "
                f"streams)")
            del dec7  # free HBM before the devfe 720p program compiles
            emit("p720_host")
        except Exception as e:  # pragma: no cover
            log(f"720p host measurement skipped: {e!r}")
            p720["host"] = {"error": repr(e)[:200]}
            detail["p720"] = p720
        # 720p through the device front-end: the host parse is ~10x worse
        # at 720p (396 -> 3600 MBs/frame), so the automaton's win should
        # be LARGEST here.  Tape and payload cap sized for 720p frames.
        if budget_left() > 300 and "error" not in p720.get("host", {}):
            try:
                from h263_tpu.parallel.device_batch import (
                    DeviceFrontendDecoder,
                )

                # The devfe serves a LARGER batch than the host path: the
                # automaton's device cost is ~flat in S (latency-bound,
                # DEVFE_COMPUTE_SWEEP) while the per-dispatch host floor is
                # not, so the serving shape amortizes it over 4x the
                # streams.  Measured 2026-08-21 (prof_megastep 720p,
                # mixed-health window): S=256 single 42-63k f/s vs S=64
                # 12-45k; S=256 K=4 megastep best 108.7k = 3,623 real-time
                # 720p streams/chip vs 73.3k at S=64.
                S7D = 256
                lists7d = [[corp7[s % 4][t] for s in range(S7D)]
                           for t in range(F7)]
                maxb = max(len(b) for corp in corp7 for b in corp)
                cap7 = max(8192, ((maxb + 4095) // 4096) * 4096)
                dfe7 = DeviceFrontendDecoder(
                    S7D, W7, H7, DecoderOption.SORENSON_SPARK_BITSTREAM,
                    pallas=args.pallas, tape_len=16 * mbs7,
                    max_frame_bytes=cap7, harness="xla")
                best7d, worst7d, stages7d, stages7dw = measure_e2e(
                    dfe7, lists7d, budget_left())
                p720["devfe"] = {
                    "streams": S7D,
                    "end_to_end_distinct_fps": round(best7d, 1),
                    "end_to_end_distinct_worst_fps": round(worst7d, 1),
                    "realtime_streams_distinct": round(best7d / 30.0, 1),
                    "payload_layout": dfe7.payload,
                    "max_frame_bytes": cap7,
                    "stages_ms": stages7d, "stages_ms_worst": stages7dw}
                log(f"720p devfe e2e: {best7d:.1f} frames/s/chip distinct "
                    f"(worst {worst7d:.1f}; = {best7d / 30.0:.0f} real-time "
                    f"streams)")
                if args.megastep > 0 and budget_left() > 120:
                    try:
                        b7m, w7m, st7m, st7mw = measure_e2e(
                            dfe7, lists7d, budget_left(),
                            window=args.megastep)
                        p720["devfe"]["megastep"] = {
                            "window": args.megastep,
                            "end_to_end_distinct_fps": round(b7m, 1),
                            "end_to_end_distinct_worst_fps": round(w7m, 1),
                            "realtime_streams_distinct": round(b7m / 30.0, 1),
                            "stages_ms": st7m, "stages_ms_worst": st7mw}
                        log(f"720p devfe megastep e2e: {b7m:.1f} frames/s/"
                            f"chip (worst {w7m:.1f}; = {b7m / 30.0:.0f} "
                            f"real-time streams)")
                    except Exception as e:  # pragma: no cover
                        log(f"720p megastep skipped: {e!r}")
                        p720["devfe"]["megastep"] = {"error": repr(e)[:200]}
                # Keep only the tiny per-lane status array for the
                # finalize readback; free the decoder's HBM now.
                dfe7_status = dfe7.last_status
                del dfe7
            except Exception as e:  # pragma: no cover
                log(f"720p devfe measurement skipped: {e!r}")
                p720["devfe"] = {"error": repr(e)[:200]}
        emit("p720")
    elif not args.no_720p:
        log("720p measurement skipped: budget exhausted")

    # ---- section D: second CIF sample, minutes after the first -------------
    # The box's throughput drifts in multi-minute windows (CLAUDE.md
    # "Benchmark variance").  Folding rule: each sample is one window; the
    # reported worst is the HEALTHIEST window's internal worst (max over
    # samples of the per-sample worst).  A min over all passes would let
    # one transient noisy-neighbor window permanently define the round's
    # worst even after a later sample proves the box recovered.  All
    # sample pairs stay in the detail so nothing is hidden.
    if dec is not None and seq_fps is not None and budget_left() > 45:
        try:
            s2_best, s2_worst, _, s2_stw = measure_e2e(dec, shared_lists,
                                                       budget_left())
            d2_best, d2_worst, _, d2_stw = measure_e2e(dec, dist_lists,
                                                       budget_left())
            # Worst-pass attribution (VERDICT r4 #7): the recorded
            # diagnostic follows the globally WORST pass seen, whichever
            # sample produced it.
            if s2_worst < seq_worst:
                detail["stages_ms_shared_worst"] = s2_stw
            if d2_worst < seq_distinct_worst:
                detail["stages_ms_distinct_worst"] = d2_stw
            log(f"second sample: shared {s2_best:.1f} (worst {s2_worst:.1f}"
                f"), distinct {d2_best:.1f} (worst {d2_worst:.1f}) "
                f"frames/s/chip")
            pairs = {
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
            detail["end_to_end_shared_fps"] = round(seq_fps, 1)
            detail["end_to_end_shared_worst_fps"] = round(seq_worst, 1)
            detail["end_to_end_distinct_fps"] = round(seq_distinct_fps, 1)
            detail["end_to_end_distinct_worst_fps"] = round(
                seq_distinct_worst, 1)
            paths["host"] = ((seq_distinct_fps, seq_distinct_worst)
                             if args.corpus == "distinct"
                             else (seq_fps, seq_worst))
            # Devfe serve second sample (cheap: everything is compiled).
            if dfe_serve is not None and budget_left() > 20:
                sv2_best, sv2_worst, _, sv2_stw = measure_e2e(
                    dfe_serve, serve_lists, budget_left())
                log(f"second sample devfe serve: {sv2_best:.1f} (worst "
                    f"{sv2_worst:.1f}) frames/s/chip")
                pairs["devfe_serve"] = [
                    [detail["devfe_serve"]["end_to_end_distinct_fps"],
                     detail["devfe_serve"]["end_to_end_distinct_worst_fps"]],
                    [round(sv2_best, 1), round(sv2_worst, 1)]]
                b0, w0 = paths["devfe_serve"]
                if sv2_worst < w0:
                    detail["devfe_serve"]["stages_ms_worst"] = sv2_stw
                paths["devfe_serve"] = (max(b0, sv2_best),
                                        max(w0, sv2_worst))
                detail["devfe_serve"]["end_to_end_distinct_fps"] = round(
                    paths["devfe_serve"][0], 1)
                detail["devfe_serve"]["end_to_end_distinct_worst_fps"] = (
                    round(paths["devfe_serve"][1], 1))
                serve_status = dfe_serve.last_status
                # Megastep second sample (compiled; one warm + timed pass).
                if ("megastep" in detail.get("devfe_serve", {})
                        and "error" not in detail["devfe_serve"]["megastep"]
                        and budget_left() > 20):
                    m2_best, m2_worst, _, m2_stw = measure_e2e(
                        dfe_serve, serve_lists, budget_left(),
                        window=args.megastep)
                    log(f"second sample devfe megastep: {m2_best:.1f} "
                        f"(worst {m2_worst:.1f}) frames/s/chip")
                    ms = detail["devfe_serve"]["megastep"]
                    pairs["devfe_megastep"] = [
                        [ms["end_to_end_distinct_fps"],
                         ms["end_to_end_distinct_worst_fps"]],
                        [round(m2_best, 1), round(m2_worst, 1)]]
                    b0, w0 = paths["devfe_megastep"]
                    if m2_worst < w0:
                        ms["stages_ms_worst"] = m2_stw
                    paths["devfe_megastep"] = (max(b0, m2_best),
                                               max(w0, m2_worst))
                    ms["end_to_end_distinct_fps"] = round(
                        paths["devfe_megastep"][0], 1)
                    ms["end_to_end_distinct_worst_fps"] = round(
                        paths["devfe_megastep"][1], 1)
                    serve_status_steps = dfe_serve.last_status_steps
            detail["cif_sample_pairs_best_worst"] = pairs
            refresh_headline()
        except Exception as e:  # pragma: no cover
            log(f"second sample failed: {e!r}")
        emit("second_sample")
    else:
        log("second CIF sample skipped: budget exhausted")

    # ---- finalize: gates first (file reads), then BOUNDED readbacks --------
    # Round-4 rehearsal lesson (rc=137): the parent's first readback —
    # a fresh tiny compile + the axon sync-dispatch trap + a degraded
    # window — wedged ~40 min, and the gate child's verdict (on disk 10
    # minutes before the kill) never got folded.  Order now: fold gates
    # (file read, cannot wedge), emit a final-shaped record, THEN attempt
    # device readbacks, each in a bounded thread.  The status fetches pull
    # the raw [S] int32 arrays (already-computed step outputs: pure
    # transfer, no fresh compile) and reduce on the host.
    poll_gates()
    emit("finalize_start")

    if dfe_serve is not None and serve_status is not None:
        st, err = bounded_device(lambda: np.asarray(serve_status), 120.0,
                                 "devfe serve status readback")
        if st is not None:
            n_ok = int((st == 0).sum())
            detail["devfe_serve"]["status_ok_streams"] = n_ok
            if n_ok != S_serve:
                log(f"devfe serve status: only {n_ok}/{S_serve} lanes ok "
                    f"-> demoting devfe from the headline")
                paths.pop("devfe_serve", None)
                refresh_headline()
        else:
            detail["devfe_serve"]["status_ok_streams"] = f"unread: {err}"
    if (serve_status_steps is not None
            and "megastep" in (detail.get("devfe_serve") or {})):
        stm, errm = bounded_device(
            lambda: np.asarray(serve_status_steps), 90.0,
            "devfe megastep status readback")
        ms = detail["devfe_serve"]["megastep"]
        if stm is not None:
            n_bad = int((stm != 0).sum())
            ms["bad_lane_frames_last_window"] = n_bad
            if n_bad:
                log(f"devfe megastep status: {n_bad} bad lane-frames in "
                    f"the last window -> demoting megastep")
                paths.pop("devfe_megastep", None)
                refresh_headline()
        else:
            ms["bad_lane_frames_last_window"] = f"unread: {errm}"

    def fold_serve_cert():
        """Fold the gate child's S=1024 serve certification (VERDICT r4
        #2) into the record: the child's device-reduced lane statuses
        stand in whenever the parent's own bounded fetch timed out, so
        status_ok_streams is a NUMBER even under a late wedge — and a
        failed certification demotes the corresponding path."""
        cert = (detail.get("gates") or {}).get("serve_cert")
        dsv = detail.get("devfe_serve")
        if not cert or not isinstance(dsv, dict):
            return
        dsv["serve_cert"] = cert
        n_ok = cert.get("status_ok_streams")
        if not isinstance(dsv.get("status_ok_streams"), int) \
                and isinstance(n_ok, int):
            dsv["status_ok_streams"] = n_ok
            dsv["status_ok_source"] = "gate_child_cert"
        if isinstance(n_ok, int) and (
                n_ok != cert.get("streams")
                or cert.get("bad_lane_frames_single", 0)):
            if "devfe_serve" in paths:
                log("serve cert: single-step lane errors -> demoting devfe")
                paths.pop("devfe_serve", None)
                refresh_headline()
        bad_m = cert.get("bad_lane_frames_megastep")
        fb = cert.get("megastep_fallback") or {}
        if (cert.get("megastep_match") == "FAILED"
                or (isinstance(bad_m, int) and bad_m)
                or fb.get("match") == "FAILED"
                or fb.get("bad_lane_frames")):
            if "devfe_megastep" in paths:
                log("serve cert: megastep mismatch/errors -> demoting "
                    "megastep")
                paths.pop("devfe_megastep", None)
                refresh_headline()
    if (dfe7_status is not None and detail.get("p720")
            and "devfe" in detail["p720"]):
        st7, err7 = bounded_device(lambda: np.asarray(dfe7_status), 90.0,
                                   "720p devfe status readback")
        if st7 is not None:
            detail["p720"]["devfe"]["status_ok_streams"] = int(
                (st7 == 0).sum())
        else:
            detail["p720"]["devfe"]["status_ok_streams"] = f"unread: {err7}"

    # The parent's serving-shape device work is DONE — drop the two big
    # decoders so their HBM (reference planes + the reuse gate's staged
    # step outputs; the K=8 serve megastep holds ~2.5 GB per ping-pong
    # slot, the 720p decoders several GB more) frees before the gate
    # child's serve certification runs its own S=serve_streams decoders
    # on the SAME chip.  The r5 rehearsal-3 child died to a TPU worker
    # crash at exactly that combined-footprint peak.  The tiny [S]
    # status arrays stay, and `dec` (CIF S=256, ~0.1 GB) stays alive for
    # the in-process strict-gate fallback below.
    import gc

    dfe_serve = dfe7 = None  # noqa: F841 (free HBM for the cert child)
    gc.collect()
    try:
        # Signal the cert child that the chip is now mostly free — it
        # holds its megastep cert (the big T-frame program) for this.
        with open(gates_path + ".parent_done", "w"):
            pass
    except OSError:
        pass

    # Wait for the gate child's final verdict, bounded by the exit
    # deadline (file polls only — the child measured 1604 s wall when
    # queued behind the parent's compiles on a degrading window, so the
    # wait is as long as the deadline allows, not a fixed fraction of the
    # section budget).
    if args.exit_deadline > 0:
        wait_s = max(0.0, (args.exit_deadline - 90.0)
                     - (time.perf_counter() - bench_t0))
    else:
        wait_s = max(0.0, min(args.gates_timeout, budget_left() + 120.0))
    gates_done = poll_gates(wait_s=wait_s)
    if gates_done and not args.no_gates and gates_child is not None:
        # The serve certification is an addendum the child writes AFTER
        # the primary verdicts; wait for it (file polls only) while the
        # exit deadline allows and the child is still alive.
        def cert_pending():
            cert = (detail.get("gates") or {}).get("serve_cert")
            if args.serve_streams <= 0:
                return False
            if cert is None or cert.get("status_ok_streams") == "pending":
                return True
            if args.megastep <= 0:
                return False
            m = str(cert.get("megastep_match"))
            # After a full-shape environment error the child runs a
            # smaller-batch fallback cert — keep waiting for its outcome.
            return (m == "pending"
                    or (m.startswith("error")
                        and "megastep_fallback" not in cert))

        cert_deadline = time.perf_counter() + max(0.0, min(
            600.0,
            (args.exit_deadline - 120.0) - (time.perf_counter() - bench_t0)
            if args.exit_deadline > 0 else budget_left() + 120.0))
        while (cert_pending() and time.perf_counter() < cert_deadline
               and gates_child.poll() is None):
            time.sleep(5)
            poll_gates()
        poll_gates()
    fold_serve_cert()
    if not args.no_gates and not gates_done:
        log("gate child did not finish in time")
        if detail["strict_rounding"] == "pending":
            detail["strict_rounding"] = "gate_child_timeout"
        if detail["device_frontend_validation"] == "pending":
            detail["device_frontend_validation"] = "gate_child_timeout"
    if gates_child is not None and gates_child.poll() is None:
        gates_child.kill()

    # In-process strict gate, only when the child delivered no strict
    # verdict (it reuses dec's compiled program + one sliced-scalar
    # readback; still bounded — it is a device interaction).
    if dec is not None and str(detail["strict_rounding"]) in (
            "pending", "gate_child_timeout"):
        def _strict_inproc():
            verify_strict_rounding(dec, W, H)
            return True

        okv, errv = bounded_device(_strict_inproc, 240.0,
                                   "in-process strict gate")
        if okv:
            log("strict f32 rounding verified in-process")
            detail["strict_rounding"] = "ok"
        elif errv and "AssertionError" in errv:
            log(f"in-process strict gate FAILED: {errv}")
            detail["strict_rounding"] = f"FAILED: {errv}"
        else:
            log(f"in-process strict gate unavailable: {errv}")

    # A failed bit-exactness gate zeroes the headline: a build that is not
    # reference-strict has no throughput claim.  A failed devfe validation
    # demotes the devfe path (the host path keeps its claim).
    if str(detail["strict_rounding"]).startswith("FAILED"):
        result["value"] = 0.0
        result["vs_baseline"] = 0.0
        detail["headline_path"] = "none (strict gate failed)"
    elif detail["device_frontend_validation"] == "FAILED":
        if "devfe_serve" in paths:
            paths.pop("devfe_serve")
            refresh_headline()
            detail["headline_path"] = (detail["headline_path"] or "host") + \
                " (devfe demoted: validation failed)"

    emit("final")

    # Post-record status fetch: the serve/720p lane-status readbacks are
    # pure upside now that the final record is out — if the tunnel lets
    # them through late, re-emit an upgraded final; if not, "unread"
    # stands.  (Rehearsal #2: the FIRST readback wedged >120 s even on a
    # healthy window — the axon trap conversion, not the window.)
    if (serve_status is not None
            and isinstance(detail.get("devfe_serve"), dict)
            and not isinstance(
                detail["devfe_serve"].get("status_ok_streams"), int)):
        # Deliberate second attempt: the trap conversion measured ~212 s
        # in a minimal process, so the 120 s first attempt often loses —
        # with the record already emitted this retry is pure upside.
        # Bounded well under the exit deadline so a truly wedged tunnel
        # still exits cleanly (and early enough for the driver).
        _wedged["flag"] = False
        late_wait = 600.0
        if args.exit_deadline > 0:
            late_wait = max(0.0, min(600.0, (args.exit_deadline - 240.0)
                                     - (time.perf_counter() - bench_t0)))
        st, err = bounded_device(lambda: np.asarray(serve_status),
                                 late_wait, "late devfe status readback")
        if st is not None:
            n_ok = int((st == 0).sum())
            detail["devfe_serve"]["status_ok_streams"] = n_ok
            if n_ok != S_serve:
                paths.pop("devfe_serve", None)
                refresh_headline()
                detail["headline_path"] = (
                    f"{detail['headline_path']} (devfe demoted: "
                    f"{S_serve - n_ok} lanes errored)")
            if (dfe7_status is not None and detail.get("p720")
                    and "devfe" in detail["p720"]):
                st7, _ = bounded_device(lambda: np.asarray(dfe7_status),
                                        60.0, "late 720p status readback")
                if st7 is not None:
                    detail["p720"]["devfe"]["status_ok_streams"] = int(
                        (st7 == 0).sum())
            poll_gates()
            fold_serve_cert()
            emit("final_status")

    disarm_overall()
    try:
        os.unlink(sidecar)
    except OSError:
        pass
    # os._exit, not sys.exit: a bounded_device thread may still be wedged
    # inside a C-level tunnel call; interpreter teardown then cancels it
    # mid-unwind and the C++ runtime aborts ("terminate called ... FATAL:
    # exception not rethrown") — rehearsal #2 recorded a perfect final
    # line and still exited 134.  Skip destructors entirely.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
