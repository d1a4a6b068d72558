#!/bin/bash
# Round-5 TPU chain, part 3 (fresh VM: the compile cache is empty, so
# every cell pays a cold 3-8 min remote compile — order configs by VERDICT
# priority so a mid-chain outage still lands the most important rows):
#   1. infer rows (bs=1/bs=32) for all 6 north-star configs at HEAD, in
#      priority order: flagship (resolve the bs=32 574.9-vs-741 regression
#      artifact, VERDICT r4 weak 1), EN-GDF-PN-S1/S2 (never measured,
#      BASELINE.md:57-58), EN-GDF-PN2-S0 (committed row below the 5x bar,
#      weak 2), then the refresh rows.
#   2. train rows via the bs=32 -> grad-accum -> halving ladder
#      (post-linearization-fix; VERDICT r4 next 4).
#   3. bench.py preview of the round headline.
#   4. fresh flagship bs=1 trace for the next shaving pass.
# Same resilience pattern as tools/tpu_job_chain.sh: poll until the axon
# backend answers, run jobs SEQUENTIALLY in fresh interpreters, retry once.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=/root/.axon_site
LOG=${TPU_CHAIN_LOG:-/tmp/tpu_chain_r5c.log}
ORDER=EN-GDF-PN-S0,EN-GDF-PN-S1,EN-GDF-PN-S2,EN-GDF-PN2-S0,MV-GDF-PN-S1,EN-CDF-PN2-S2

wait_tpu() {
  while true; do
    echo "=== [$(date +%H:%M:%S)] probing TPU..." >> "$LOG"
    if timeout 240 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
      echo "=== [$(date +%H:%M:%S)] TPU up" >> "$LOG"
      return 0
    fi
    sleep 180
  done
}

run_job() {
  local name="$1"; shift
  local tmo="$1"; shift
  for attempt in 1 2; do
    wait_tpu
    echo "=== [$(date +%H:%M:%S)] $name (attempt $attempt) ===" >> "$LOG"
    if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
      echo "=== [$(date +%H:%M:%S)] $name OK" >> "$LOG"
      return 0
    fi
    echo "=== [$(date +%H:%M:%S)] $name FAILED (attempt $attempt)" >> "$LOG"
    sleep 60
  done
  return 1
}

run_job "infer rows (6 configs, priority order)" 21600 \
    python tools/bench_sweep.py --skip-train --configs "$ORDER" \
        --out BENCH_SWEEP.json
run_job "train rows (bs=32 ladder)" 21600 \
    python tools/bench_sweep.py --train-only --configs "$ORDER" \
        --out BENCH_SWEEP.json
run_job "bench.py preview" 3600 python bench.py
run_job "flagship bs=1 trace" 3600 \
    python tools/capture_trace.py --bs 1 --iters 40 --out /tmp/traces_r5_bs1
echo "=== [$(date +%H:%M:%S)] chain r5c done ===" >> "$LOG"
