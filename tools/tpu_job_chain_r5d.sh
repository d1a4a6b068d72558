#!/bin/bash
# Round-5 TPU chain, part 4 (takeover after the part-3 train ladder landed
# the flagship + S1 bs=32 rows; the remaining configs' accum=1/2 rungs are
# known-hopeless helper 500s, so they run at --train-rungs 32:4 only):
#   1. bench.py preview of the round headline (warm cache — fast).
#   2. fresh flagship bs=1 device trace at HEAD (the committed
#      TRACE_SUMMARY_BS1.txt predates the r5 CF radar feed).
#   3. bs=32 accum=4 train rows for the configs the part-3 ladder never
#      reached — also flips BENCH_SWEEP.json partial:false on completion.
# Same resilience pattern as tools/tpu_job_chain.sh: poll until the axon
# backend answers, run jobs SEQUENTIALLY in fresh interpreters, retry once.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=/root/.axon_site
LOG=${TPU_CHAIN_LOG:-/tmp/tpu_chain_r5d.log}

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

run_job "bench.py preview" 3600 python bench.py
run_job "flagship bs=1 trace" 3600 \
    python tools/capture_trace.py --bs 1 --iters 40 --out /tmp/traces_r5_bs1
run_job "flagship bs=32 trace" 3600 \
    python tools/capture_trace.py --bs 32 --iters 20 --out /tmp/traces_r5_bs32
run_job "train rows 32:4 (remaining configs)" 14400 \
    python tools/bench_sweep.py --train-only \
        --configs EN-GDF-PN-S2,EN-GDF-PN2-S0,MV-GDF-PN-S1,EN-CDF-PN2-S2 \
        --train-rungs 32:4 --out BENCH_SWEEP.json
echo "=== [$(date +%H:%M:%S)] chain r5d done ===" >> "$LOG"
