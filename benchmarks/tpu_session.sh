#!/bin/bash
# On-chip measurement session for round 3 wrap-up.  Run when the axon
# tunnel is alive; logs to /tmp/tpu_session.log.  Order: the headline
# bench FIRST (the single number the round is judged on — a tunnel
# drop mid-session must not lose it), then the kernel A/Bs that decide
# defaults, then the long artifact regenerations.
set -x
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_session.log}
exec >> "$LOG" 2>&1
echo "=== tpu_session $(date) commit $(git rev-parse --short HEAD) ==="

# 0. Fresh headline bench (also exercises the TFLOPS probe consistency
#    criterion and records compile+warmup seconds).
timeout 3600 python -u bench.py

# 1. Step decomposition (where do the 24.9 ms go?)
timeout 2400 python -u benchmarks/microbench_r3.py profile

# 2. Pair-packed kernel A/B on the CoherentAdd variant + reference hash
MB_VARIANTS=add_mm,add_mmp timeout 2400 python -u benchmarks/microbench_r3.py bwd
MB_VARIANTS=add_mm,add_mmp timeout 2400 python -u benchmarks/microbench_r3.py fwd

# 2b. End-to-end sort+segment route vs the MXU route (ROOFLINE
#     candidate (b) measured as a full grid backward, not just the
#     standalone sort primitive)
MB_VARIANTS=prime_mm,prime_sortseg timeout 2400 python -u benchmarks/microbench_r3.py bwd

# 3. Batch-tile sweep on the scatter (guides TCNN_TPU_MM_TILE default)
for tile in 2048 4096 8192; do
  TCNN_TPU_MM_TILE=$tile MB_VARIANTS=prime_mm \
    timeout 1800 python -u benchmarks/microbench_r3.py bwd
done

# 4. Full-step modes (reference config): mm vs mmp-engaged
MB_STEP_MODES=mm,mmp timeout 2400 python -u benchmarks/microbench_r3.py step

# 4b. Compile-time probe: kernel-class count vs cold compile seconds
#     (VERDICT #9).  MERGE_CAP 32768 folds the level-5 class into the
#     merged one (4 Mosaic kernels instead of 6) at ~+1.7 ms/step of
#     padding MACs; measure whether the compile saving is worth a
#     faster-iteration env recommendation.  Cold cache via a throwaway
#     cache dir.
for cap in 16384 32768; do
  TCNN_TPU_MM_MERGE_CAP=$cap TCNN_TPU_CACHE_DIR=$(mktemp -d) \
    timeout 1800 python -u benchmarks/microbench_r3.py step
done

# 5. Regenerate the protocol sweep artifact (fused small-batch dispatch
#    + scan-chunked inference fixes must be reflected in the committed
#    JSON — round-2's artifact predates both).
timeout 5400 python -u benchmarks/sweep.py --out bench_result_ours.json

# 6. Naive-JAX baseline re-measure (README ratio provenance)
timeout 3600 python -u benchmarks/bench_baseline.py || true

# 7. Headline bench again at the session's end: if the tunnel survived
#    this long the compile cache is warm — records the warm-cache
#    compile+warmup number alongside run 0's cold one.
timeout 2400 python -u bench.py

echo "=== tpu_session done $(date) ==="

# 8. Preserve evidence even when no interactive session is alive to do
#    it: copy the session log into the repo and commit every artifact
#    this session regenerates.  Without this, a tunnel revival that
#    happens between agent sessions would leave the measurements
#    stranded in /tmp.
mkdir -p benchmarks/logs
cp "$LOG" "benchmarks/logs/tpu_session_$(date +%Y%m%dT%H%M%S).log" || true
git add bench_result_ours.json benchmarks/last_onchip_bench.json \
        benchmarks/baseline_result.json benchmarks/logs 2>/dev/null || true
git diff --cached --quiet || git commit -m \
  "On-chip measurement artifacts (auto-committed by tpu_session.sh)" || true
