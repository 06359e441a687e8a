"""BTF-scale on-chip benchmark (round-3 VERDICT #5).

The flagship image config never touches the serial pair kernels any
more (every level fits the matmul MAC budget); ``config_btf.json``
(4-D CoherentAdd HashGrid, log2_hashmap=19 → 2^19-row levels, composed
with OneBlob) is the config that exercises the per-level dispatch's
SERIAL route (grid_ops._route_levels: size·F·P over budget) on real
hardware.  Reference spec: the 4-D grid case the fork enables,
/root/reference/include/tiny-cuda-nn/encodings/grid.h:1177 and the
composite encoding (composite.h).

Emits one JSON artifact (benchmarks/btf_onchip.json) with:
  * single-chip training samples/s at the BTF geometry (scan-chunked,
    one dispatch per chunk — same protocol as bench.py),
  * the per-level route decision (which levels ran MXU-matmul vs
    serial pair kernels) so the ROOFLINE serial row is attributable,
  * producing_commit.

Usage: python benchmarks/bench_btf.py [n_steps] [batch_pow] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main(argv):
    n_steps = int(argv[1]) if len(argv) > 1 else 200
    batch = 1 << (int(argv[2]) if len(argv) > 2 else 16)
    out = argv[3] if len(argv) > 3 else os.path.join(
        os.path.dirname(__file__), "btf_onchip.json")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("TCNN_TPU_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax_comp")))

    import tcnn_tpu as tcnn
    from tcnn_tpu.ops import grid_ops

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "samples"))
    from fit_btf import synthetic_btf

    model = tcnn.create_from_config(
        6, 3, os.path.join(os.path.dirname(__file__), "..", "configs",
                           "config_btf.json"),
        policy=tcnn.BF16_POLICY)
    tr = model.trainer
    state = tr.initial_state()

    # Route report: replicate the dispatch decision for the 4-D grid.
    route = {}
    try:
        spec = model.network.encoding.nested[0].spec
        meta = tuple((True, lv.size, lv.offset) for lv in spec.levels)
        mm, serial = grid_ops._route_levels(
            (spec.n_features_per_level, 1 << spec.n_dims, meta),
            jnp.bfloat16, batch)
        groups = grid_ops._serial_level_groups(
            meta, serial, spec.n_features_per_level, True)
        route = {
            "mm_levels": mm,
            "serial_levels": serial,
            "serial_scatter_groups": groups,
            "note": "serial levels scatter in VMEM-budget groups on the "
                    "Pallas pair kernels (round-5 fix: one whole-table "
                    "call silently fell back to XLA scatter)",
            "level_sizes": [lv.size for lv in spec.levels],
        }
    except Exception as e:  # report-only; never block the measurement
        route = {"error": repr(e)}

    def sample(key):
        x = jax.random.uniform(key, (batch, 6))
        return x, synthetic_btf(x)

    chunk = min(20, n_steps)
    n_loops = max(n_steps // chunk, 1)
    n_steps = n_loops * chunk

    step_fn = tr.step_fn()

    @jax.jit
    def run_chunk(state, key):
        def body(st, i):
            x, t = sample(jax.random.fold_in(key, i))
            st, loss = step_fn(st, x, t)
            return st, loss

        st, losses = jax.lax.scan(body, state, jnp.arange(chunk))
        return st, losses[-1]

    # Warmup sync MUST be a data readback: on the axon tunnel
    # block_until_ready acks at ENQUEUE, so the first execution's load
    # stall otherwise leaks into the timed region — the round-4
    # artifact's 1256 ms/step contained exactly that (plus the
    # ungrouped-scatter XLA fallback this round fixed).
    t0 = time.time()
    state, loss = run_chunk(state, jax.random.key(0))
    float(loss)
    compile_s = time.time() - t0

    # Degraded-worker guard (same failure mode bench.py probes for): a
    # killed predecessor process leaves the tunnel worker ~8-100x slow
    # until the service recycles it.  Probe a chunk; if it is wildly
    # slow, wait and retry before measuring.
    for attempt in range(5):
        tc = time.time()
        state, loss = run_chunk(state, jax.random.key(10 + attempt))
        float(loss)
        probe = time.time() - tc
        if probe < 30.0:
            break
        print(f"warning: degraded device (probe chunk {probe:.1f}s), "
              f"retry {attempt + 1}/5 in 60s", file=sys.stderr, flush=True)
        time.sleep(60)

    chunk_times = []
    t0 = time.time()
    for i in range(n_loops):
        tc = time.time()
        state, loss = run_chunk(state, jax.random.key(100 + i))
        float(loss)                   # readback = true sync
        chunk_times.append(round(time.time() - tc, 3))
    final_loss = float(loss)
    dt = time.time() - t0
    print(f"per-chunk seconds: {chunk_times}", file=sys.stderr, flush=True)
    # Median chunk = stall-robust throughput; total wall reported too.
    med_chunk = sorted(chunk_times)[len(chunk_times) // 2]

    res = {
        "metric": "BTF-fit training throughput (4-D CoherentAdd "
                  "HashGrid 2^19 + OneBlob + FusedMLP 64x3)",
        "samples_per_sec": round(chunk * batch / med_chunk, 1),
        "ms_per_step": round(med_chunk / chunk * 1e3, 3),
        "protocol": "median chunk of "
                    f"{n_loops}x{chunk}-step scanned dispatches, "
                    "readback-synced (robust to the tunnel's "
                    "multi-minute nondeterministic stalls; all chunk "
                    "times recorded)",
        "chunk_seconds": chunk_times,
        "wall_samples_per_sec": round(n_steps * batch / dt, 1),
        "batch_size": batch,
        "n_steps": n_steps,
        "final_loss": final_loss,
        "compile_warmup_seconds": round(compile_s, 1),
        "route": route,
        "device": str(jax.devices()[0]),
        "producing_commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True,
            text=True).stdout.strip(),
    }
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main(sys.argv)
