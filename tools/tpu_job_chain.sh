#!/bin/bash
# Resilient TPU artifact chain for the axon tunnel's multi-hour outages
# (.claude/skills/verify/SKILL.md "OUTAGES"): poll until the backend
# answers, then run the hardware jobs SEQUENTIALLY — never two TPU jobs at
# once on this tunnel — retrying each once after a fresh availability
# check.  Detach with:  setsid tools/tpu_job_chain.sh &
#
# A failed backend init is cached for the life of a process, so both the
# probe and every job run in fresh interpreters.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=/root/.axon_site
LOG=${TPU_CHAIN_LOG:-/tmp/tpu_job_chain.log}

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

# Round-4 order (VERDICT r3 "next" items): the deform tile sweep feeds the
# headline-perf fix (next 1), the 3 remaining sweep configs complete the
# measurement matrix (next 2; bench_sweep.py now MERGES into
# BENCH_SWEEP.json, ADVICE r3), then the trace/MFU artifacts (next 4),
# then re-measure the RCNet ladder post-optimizations, the kernel
# equality gate, and a fresh headline bench with whatever kernel defaults
# landed by then.
# DEFORM_TILE_SWEEP.json landed 2026-08-18 (caps >8192 don't help; see its
# note) — the bs=1 trace is now the headline-latency diagnostic: at bs=1
# RCNet is 2.1 ms of the 3.6 ms pipeline and the cost is batch-size-
# independent, so the trace must say which ops (pallas fixed cost vs the
# surrounding small convs) hold the time.
run_job "trace capture bs=1"   3600  python tools/capture_trace.py --bs 1 --iters 100 --out traces_bs1
timeout 1800 python tools/trace_summary.py traces_bs1 --topk 40 > TRACE_SUMMARY_BS1.txt 2>> "$LOG"
run_job "trace capture bs=32"  3600  python tools/capture_trace.py --bs 32 --out traces
timeout 1800 python tools/trace_summary.py traces --topk 40 > TRACE_SUMMARY.txt 2>> "$LOG"
# all 4 configs: the flagship's train row re-measures at bs=32 now that the
# batch rides in the timing carry instead of 250 MB of HLO constants (the
# remote-compile helper's HTTP 413 length limit was the r3 "OOM")
run_job "bench sweep (4 configs)" 18000 \
    python tools/bench_sweep.py --out BENCH_SWEEP.json
run_job "MFU probe"            7200  python tools/mfu_probe.py --out MFU.json
run_job "latency ablation"     7200  python tools/latency_ablation.py --out LATENCY_ABLATION.json
run_job "kernel equality gate" 3600  python tools/tpu_kernel_check.py --out TPU_KERNELS.json
run_job "headline bench"       3600  python bench.py
run_job "MFU crosscheck"       7200  python tools/mfu_crosscheck.py --out MFU_CROSSCHECK.json
echo "=== [$(date +%H:%M:%S)] chain done ===" >> "$LOG"
