#!/bin/bash
# Round-5 chain part 6 (waits for r5e): third A/B arm — FMA on AND the
# fused RadarConv kernel disabled (ACHELOUS_DEFORM_FUSE_MAX_BATCH=0), so
# bs=1 routes through the unfused CF path (pool + FMA offset/mask convs +
# cfio sampling kernel).  RADARCONV_AB's fused-wins-at-bs1 verdict was
# measured against the OLD XLA glue; the FMA reformulation may flip it.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=/root/.axon_site
LOG=${TPU_CHAIN_LOG:-/tmp/tpu_chain_r5f.log}

while kill -0 "$(cat /tmp/chain_r5e.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

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

run_job "cfconv_ab on_nofuse bs1" 5400 \
    env ACHELOUS_SMALLCONV_FMA=1 ACHELOUS_DEFORM_FUSE_MAX_BATCH=0 \
    python tools/cfconv_ab.py --tag on_nofuse --bs 1
echo "=== [$(date +%H:%M:%S)] chain r5f done ===" >> "$LOG"
