#!/bin/bash
# Headline scheduling-lever sweep on a quiet chip (BENCHMARKS.md
# "Round-4 encoder-gap probes"). If a scale_bench build holds the TPU,
# bench.py itself pauses it via the chip-handoff protocol
# (utils/tpu_lease.py) and resumes it after each run, so this script
# just sweeps the knobs back to back.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-headline_sweep.log}

run() {
  local label="$1"; shift
  echo "[sweep $(date -u +%H:%M:%S)] $label" | tee -a "$LOG"
  env "$@" timeout 900 python bench.py >>"$LOG" 2>&1
  echo "[sweep] rc=$?" >>"$LOG"
}

run "baseline unroll=1"
run "unroll=3" MSE_SCAN_UNROLL=3
run "unroll=9" MSE_SCAN_UNROLL=9
run "attn_nq=1 (traceback on)" MSE_ATTN_NQ=1 JAX_TRACEBACK_FILTERING=off
run "attn_nq=4 (traceback on)" MSE_ATTN_NQ=4 JAX_TRACEBACK_FILTERING=off
run "unroll=3 + attn_nq=4" MSE_SCAN_UNROLL=3 MSE_ATTN_NQ=4 JAX_TRACEBACK_FILTERING=off
echo "[sweep $(date -u +%H:%M:%S)] done" | tee -a "$LOG"
