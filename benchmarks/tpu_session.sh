#!/bin/bash
# On-chip measurement session (round 5).  ALL phases run inside ONE
# python process (benchmarks/run_session.py): every fresh process pays
# the tunnel's device-claim stall (60 s - 30 min), and a killed process
# degrades the worker ~8-100x until the service recycles it — so: one
# process, one generous timeout, never kill TPU work mid-flight.
set -x
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_session.log}
exec >> "$LOG" 2>&1
echo "=== tpu_session $(date) commit $(git rev-parse --short HEAD) ==="

# Main session: pin -> bench -> profiles -> slope -> btf -> sweep ->
# golden, all in one process (one claim).
timeout 21600 python -u benchmarks/run_session.py

# COLD-START criterion (round-5 VERDICT #1): fresh compilation cache +
# fresh process; startup_breakdown separates the tunnel's claim stall
# from framework lower+compile.
TCNN_TPU_CACHE_DIR=$(mktemp -d) TCNN_BENCH_SKIP_VARIANT=1 \
  TCNN_BENCH_SKIP_TFLOPS=1 TCNN_BENCH_STEPS=100 \
  timeout 3600 python -u bench.py
# Warm-cache rerun.
TCNN_BENCH_SKIP_VARIANT=1 TCNN_BENCH_SKIP_TFLOPS=1 TCNN_BENCH_STEPS=100 \
  timeout 3600 python -u bench.py

echo "=== tpu_session done $(date) ==="

# Preserve evidence: copy the session log into the repo and commit
# every artifact this session regenerates.
mkdir -p benchmarks/logs
cp "$LOG" "benchmarks/logs/tpu_session_$(date +%Y%m%dT%H%M%S).log" || true
git add bench_result_ours.json benchmarks/last_onchip_bench.json \
        benchmarks/tflops_pinned.json benchmarks/golden_image_fit.json \
        benchmarks/btf_onchip.json benchmarks/serving_onchip.json \
        benchmarks/logs 2>/dev/null || true
git diff --cached --quiet || git commit -m \
  "On-chip measurement artifacts (auto-committed by tpu_session.sh)" || true
