#!/usr/bin/env bash
# One-shot TPU measurement pass for when the tunnel is healthy.
# Runs each benchmark in its own process (keeps executables-per-process
# low on the tunneled platform) and appends JSON lines to the log.
# Usage: nohup bash benchmarks/run_all_tpu.sh > /tmp/tpu_measure.log 2>&1 &
set -u -o pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ($(date +%H:%M:%S))"
  timeout 3600 python "$@" 2>&1 | { grep -v -i warning || true; }
  echo "=== exit $? ($(date +%H:%M:%S))"
}

run benchmarks/conv2d_kernel_bench.py   # decides PALLAS_CONV2D default
run benchmarks/microbench.py            # resample + network + step pieces
run bench.py                            # the flagship one-line metric
run benchmarks/recon_bench.py
