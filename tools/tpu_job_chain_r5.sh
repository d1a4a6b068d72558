#!/bin/bash
# Round-5 TPU artifact chain (VERDICT r4 next 1/2/3/8): re-measure every
# BASELINE config at HEAD (the committed sweep mixed pre-/post-gate rows),
# then A/B the RadarConv variants at S1/S2 widths to validate the fuse-gate
# constants that were calibrated on S0 only.  Same resilience pattern as
# tools/tpu_job_chain.sh: poll until the axon backend answers, run jobs
# SEQUENTIALLY in fresh interpreters, retry each once.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=/root/.axon_site
LOG=${TPU_CHAIN_LOG:-/tmp/tpu_chain_r5.log}

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

# All 6 north-star configs at HEAD; upserts into BENCH_SWEEP.json and flips
# partial:false once every BASELINE config carries a HEAD-revision row.
run_job "bench sweep (6 configs @ HEAD)" 21600 \
    python tools/bench_sweep.py --out BENCH_SWEEP.json
# Gate-constant validation at the widths that never fuse today
# (S1 tail cin=12/30, S2 tail cin=16/36; VERDICT r4 weak 7 / next 8).
run_job "radarconv AB S1" 7200 \
    python tools/radarconv_batch_ab.py --phi S1 --out /tmp/radarconv_ab_s1.json
run_job "radarconv AB S2" 7200 \
    python tools/radarconv_batch_ab.py --phi S2 --out /tmp/radarconv_ab_s2.json
echo "=== [$(date +%H:%M:%S)] chain r5 done ===" >> "$LOG"
