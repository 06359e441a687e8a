#!/bin/bash
# On-chip measurement session (round 5).  Run when the axon tunnel is
# alive; logs to /tmp/tpu_session.log.  Order: pin the TFLOPS
# denominator first (bench.py reads it), then the headline bench, then
# artifact regenerations, then A/Bs, then the COLD-CACHE criterion run.
set -x
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_session.log}
exec >> "$LOG" 2>&1
echo "=== tpu_session $(date) commit $(git rev-parse --short HEAD) ==="

# 0. Pin the sustained-TFLOPS roofline denominator (round-5 VERDICT #5):
#    >=20 readings across 4 shapes, median+MAD, committed artifact.
timeout 2400 python -u benchmarks/tflops_pin.py

# 1. Fresh headline bench (claim-absorbed, phase-split startup timings;
#    TFLOPS probe is now a sanity check against the pinned value).
timeout 3600 python -u bench.py

# 2. Per-kernel step decomposition with the FIXED parser (round-5
#    VERDICT #3): leaf-exclusive spans + named-scope attribution.
timeout 2400 python -u benchmarks/profile_step.py train
timeout 2400 python -u benchmarks/profile_step.py infer

# 3. Reproducible scan-slope decomposition (round-5 VERDICT #4):
#    median of 5 readings per row, negative slopes rejected, artifact
#    benchmarks/logs/profile_slope.json.
MB_REPS=5 timeout 3600 python -u benchmarks/microbench_r3.py profile

# 4. Protocol sweep with per-row route labels (round-5 VERDICT #7);
#    rerun twice at 2^16 to check whether the round-4 dip reproduces.
timeout 7200 python -u benchmarks/sweep.py --out bench_result_ours.json
timeout 1800 python -u benchmarks/sweep.py --min-pow 15 --max-pow 17 \
    --iters-scale 0.5 --out benchmarks/logs/sweep_dip_recheck.json

# 5. BTF: official artifact (grouped serial scatter) + decomposition +
#    group-size A/B (round-5 VERDICT #2).
timeout 3600 python -u benchmarks/bench_btf.py 200 16
MB_REPS=3 timeout 3000 python -u benchmarks/microbench_btf.py all \
    benchmarks/logs/btf_decomposition.json
for CAP in 524288 1048576; do
  TCNN_TPU_SERIAL_GROUP_ROWS=$CAP MB_REPS=3 timeout 2400 \
    python -u benchmarks/microbench_btf.py profile \
    benchmarks/logs/btf_groupcap_$CAP.json
done

# 6. Golden image-fit artifact (grouped-scatter code change → fresh
#    producing_commit for the convergence numbers).
timeout 3600 python -u benchmarks/golden.py || true

# 7. COLD-START criterion (round-5 VERDICT #1): fresh compilation cache
#    + fresh process; the JSON line's startup_breakdown separates the
#    tunnel's device-claim stall from framework lower+compile.
TCNN_TPU_CACHE_DIR=$(mktemp -d) TCNN_BENCH_SKIP_VARIANT=1 \
  TCNN_BENCH_SKIP_TFLOPS=1 TCNN_BENCH_STEPS=100 \
  timeout 1800 python -u bench.py
# Warm-cache rerun for the warm number.
TCNN_BENCH_SKIP_VARIANT=1 TCNN_BENCH_SKIP_TFLOPS=1 TCNN_BENCH_STEPS=100 \
  timeout 1800 python -u bench.py

echo "=== tpu_session done $(date) ==="

# 8. Preserve evidence: copy the session log into the repo and commit
#    every artifact this session regenerates.
mkdir -p benchmarks/logs
cp "$LOG" "benchmarks/logs/tpu_session_$(date +%Y%m%dT%H%M%S).log" || true
git add bench_result_ours.json benchmarks/last_onchip_bench.json \
        benchmarks/tflops_pinned.json benchmarks/golden_image_fit.json \
        benchmarks/btf_onchip.json benchmarks/serving_onchip.json \
        benchmarks/logs 2>/dev/null || true
git diff --cached --quiet || git commit -m \
  "On-chip measurement artifacts (auto-committed by tpu_session.sh)" || true
