#!/bin/bash
# Round-5 chain part 5: A/B the small-channel FMA conv reformulation
# (ops/smallconv.py) on the flagship at bs=1 + bs=32, off arm first
# (pre-change behavior, warm cache) then on arm (fresh compile).
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=/root/.axon_site
LOG=${TPU_CHAIN_LOG:-/tmp/tpu_chain_r5e.log}

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

ACHELOUS_SMALLCONV_FMA=0 run_job "cfconv_ab off" 5400 \
    env ACHELOUS_SMALLCONV_FMA=0 python tools/cfconv_ab.py --tag off
ACHELOUS_SMALLCONV_FMA=1 run_job "cfconv_ab on" 5400 \
    env ACHELOUS_SMALLCONV_FMA=1 python tools/cfconv_ab.py --tag on
echo "=== [$(date +%H:%M:%S)] chain r5e done ===" >> "$LOG"
