#!/bin/bash
# Round-5 TPU chain, part 2 (after the linearization fix + CF radar feed
# landed):
#   1. re-measure the 6-config INFER rows with the production CF radar
#      input (the 14:28 sweep fed NHWC, paying the entry relayout the CF
#      chaining exists to kill),
#   2. land TRAIN rows with the fixed avg_pool_same_cf (every train cell of
#      the first r5 sweep failed on the pre-fix import,
#      TRAIN_COMPILE_BISECT.json),
#   3. compile-check the driver contract entry() with the CF radar example,
#   4. fresh flagship bs=1 trace + summary for the next shaving round,
#   5. bench.py preview of the round headline.
# Same resilience pattern as tools/tpu_job_chain.sh: poll until the axon
# backend answers, run jobs SEQUENTIALLY in fresh interpreters, retry once.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=/root/.axon_site
LOG=${TPU_CHAIN_LOG:-/tmp/tpu_chain_r5b.log}

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

run_job "infer re-measure (CF radar, 6 configs)" 14400 \
    python tools/bench_sweep.py --skip-train --out BENCH_SWEEP.json
run_job "train rows (post-linearization-fix)" 21600 \
    python tools/bench_sweep.py --train-only --out BENCH_SWEEP.json
run_job "entry() compile check (CF radar)" 3600 \
    python -c "import __graft_entry__ as g, jax; fn, a = g.entry(); jax.jit(fn).lower(*a).compile(); print('entry ok')"
run_job "flagship bs=1 trace" 3600 \
    python tools/capture_trace.py --bs 1 --iters 40 --out /tmp/traces_r5_bs1
run_job "bench.py preview" 3600 python bench.py
echo "=== [$(date +%H:%M:%S)] chain r5b done ===" >> "$LOG"
