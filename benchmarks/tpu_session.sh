#!/bin/bash
# On-chip measurement session for round 3 wrap-up.  Run when the axon
# tunnel is alive; logs to /tmp/tpu_session.log.  Order: cheapest
# diagnostics first, artifact regeneration last, so a tunnel drop
# mid-way still leaves usable numbers.
set -x
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_session.log}
exec >> "$LOG" 2>&1
echo "=== tpu_session $(date) commit $(git rev-parse --short HEAD) ==="

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

# 5. Regenerate the protocol sweep artifact (fused small-batch dispatch
#    + scan-chunked inference fixes must be reflected in the committed
#    JSON — round-2's artifact predates both).
timeout 5400 python -u benchmarks/sweep.py --out bench_result_ours.json

# 6. Fresh headline bench (also exercises the TFLOPS probe consistency)
timeout 3600 python -u bench.py

# 7. Naive-JAX baseline re-measure (README ratio provenance)
timeout 3600 python -u benchmarks/bench_baseline.py || true

echo "=== tpu_session done $(date) ==="
