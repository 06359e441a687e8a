#!/bin/bash
# On-chip measurement session (round 4).  Run when the axon tunnel is
# alive; logs to /tmp/tpu_session.log.  Order: the headline bench FIRST
# (the single number the round is judged on — a tunnel drop mid-session
# must not lose it), then the artifact regenerations the round-3
# verdict flagged as stale, then A/Bs.
set -x
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_session.log}
exec >> "$LOG" 2>&1
echo "=== tpu_session $(date) commit $(git rev-parse --short HEAD) ==="

# 0. Fresh headline bench (median-of-3 TFLOPS probe, compile+warmup).
timeout 3600 python -u bench.py

# 1. Per-kernel step decomposition — the committed profile artifact
#    (VERDICT missing #3): training and inference.
timeout 2400 python -u benchmarks/profile_step.py train
timeout 2400 python -u benchmarks/profile_step.py infer

# 2. Regenerate the protocol sweep artifact (VERDICT missing #1):
#    2^14..2^21 × {fused, XLA-MLP}, scan-chunked inference.
timeout 7200 python -u benchmarks/sweep.py --out bench_result_ours.json

# 3. Golden image-fit artifact (fresh producing_commit, current policy
#    + dispatch — the committed one recorded the pre-MXU 203 ms/step).
timeout 3600 python -u benchmarks/golden.py || true

# 4. BTF-scale bench — exercises the serial-kernel route on chip for
#    the first time (VERDICT #5).
timeout 3600 python -u benchmarks/bench_btf.py 200 16

# 4b. Serving-bundle bucket-ladder latency (round-4 VERDICT #4).
timeout 2400 python -u benchmarks/bench_serving.py || true

# 5. Naive-JAX baseline re-measure (README ratio provenance).
timeout 3600 python -u benchmarks/bench_baseline.py || true

# 6. Slope-protocol step decomposition (cross-check of the trace
#    profile; the loss+grads row now consumes gradients).
timeout 2400 python -u benchmarks/microbench_r3.py profile

# 7. Pair-packed kernel A/B on the CoherentAdd variant (decides the
#    mmp default for adjacency-capable levels).
MB_VARIANTS=add_mm,add_mmp timeout 2400 python -u benchmarks/microbench_r3.py bwd
MB_STEP_MODES=mm,mmp timeout 2400 python -u benchmarks/microbench_r3.py step

# 8. Cold-cache compile probe (VERDICT weak #8): cold vs warm.
TCNN_TPU_CACHE_DIR=$(mktemp -d) timeout 1800 python -u benchmarks/microbench_r3.py step
timeout 1800 python -u benchmarks/microbench_r3.py step

# 9. Headline bench again at the session's end (warm-cache compile
#    number + a same-session repeat for the TFLOPS-probe ±8% check).
timeout 2400 python -u bench.py

echo "=== tpu_session done $(date) ==="

# 10. Preserve evidence even when no interactive session is alive:
#     copy the session log into the repo and commit every artifact this
#     session regenerates.
mkdir -p benchmarks/logs
cp "$LOG" "benchmarks/logs/tpu_session_$(date +%Y%m%dT%H%M%S).log" || true
git add bench_result_ours.json benchmarks/last_onchip_bench.json \
        benchmarks/baseline_result.json benchmarks/golden_image_fit.json \
        benchmarks/btf_onchip.json benchmarks/serving_onchip.json \
        benchmarks/logs 2>/dev/null || true
git diff --cached --quiet || git commit -m \
  "On-chip measurement artifacts (auto-committed by tpu_session.sh)" || true
