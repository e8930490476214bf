#!/bin/bash
# Hardware-return runbook: the measurement order to run, one process per
# tool, the moment the TPU tunnel comes back (CLAUDE.md "Device entropy
# front-end": the device front-end has never run on hardware).
#
# Each step is its own process because of the axon readback trap — a
# process that has fetched a computed array is permanently ~1 s/dispatch,
# so no tool may inherit another's poisoned runtime.  Order matters:
# cheapest/highest-information first, so a tunnel that dies again mid-
# session still leaves the most valuable artifacts.
#
# Usage:  bash tools/hw_session.sh [outdir]     (default /tmp/hw_$(date +%s))
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_$(date +%s)}
mkdir -p "$OUT"
echo "artifacts -> $OUT"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date -u +%H:%M:%S), timeout ${tmo}s) ==="
    timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
    local rc=$?
    echo "    rc=$rc  (log: $OUT/$name.log)"
    tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

# 1. Device front-end profile: per-iteration cost, batch-size scaling.
run prof_devfe 2400 python tools/prof_devfe.py --sizes 256,512,1024

# 1b. Megastep A/B: single-step vs decode_steps windows at the serving
#     shape (order-balanced; r5's headline lever).
run prof_megastep 2700 python tools/prof_megastep.py --streams 1024

# 2. The driver's own artifact: full bench (both CIF regimes, 720p,
#    device front-end sections, strict gate).  Watchdogs keep it
#    crash-safe: the outer timeout must EXCEED init+overall watchdog
#    deadlines or the replay-on-hang record never gets written.
run bench 6000 python bench.py --init-timeout 600 --overall-timeout 4800

# 3. Bit-exactness soak through the host front-end (the production path)
#    and the device front-end.
run soak_host 2400 python tools/soak_hw.py
run soak_device 2400 python tools/soak_hw.py --frontend device --frames 60

# 4. Pipelined-mode diagnostic only if the host gained cores since r3
#    (CLAUDE.md: buried on 1-core hosts).
if [ "$(nproc)" -gt 1 ]; then
    run prof_pipeline 1800 python tools/prof_pipeline.py
fi

echo "=== done ($(date -u +%H:%M:%S)); record results in CLAUDE.md /"
echo "    BASELINE bookkeeping and commit the logs' key numbers ==="
