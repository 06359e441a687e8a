"""Serving-bundle latency on chip (round-4 VERDICT #4).

Measures the exported AOT inference bundle's bucket-ladder latency —
the serving analog of the reference's fused inference path
(fully_fused_mlp.cu:689-698 runs inference FASTER than training; the
C++ API facade serves it, cpp_api.h:86-111).  Protocol: per bucket,
one scan-chunked dispatch of `chunk` inference batches (the tunnel's
~0.1-0.2 s dispatch latency would otherwise dominate every bucket).

Emits benchmarks/serving_onchip.json:
  * per-bucket samples/s and ms/batch for the exported ServingModel,
  * the jit-inference number at the headline batch for comparison,
  * producing_commit.

Usage: python benchmarks/bench_serving.py [out.json]
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
    out = argv[1] if len(argv) > 1 else os.path.join(
        os.path.dirname(__file__), "serving_onchip.json")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    import tcnn_tpu as tcnn
    from tcnn_tpu.serving import export_inference, load_inference

    model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                    policy=tcnn.BF16_POLICY)
    tr = model.trainer
    state = tr.initial_state()

    buckets = (4096, 65536, 262144)
    blob = export_inference(tr, state, batch_sizes=buckets)
    serving = load_inference(blob)

    def fetch(y):
        """True sync: on the axon tunnel block_until_ready acks at
        ENQUEUE (measured: 0.03 s "ready" vs minutes of execution); only
        a data readback waits for completion.  The round-4 artifact's
        latencies were taken with block_until_ready and therefore
        measured dispatch enqueue, not serving latency — regenerated."""
        import numpy as _np

        return float(_np.asarray(jax.device_get(y)).ravel()[0])

    results = {}
    for b in buckets:
        x = jax.random.uniform(jax.random.key(7), (b, 2))
        fetch(serving(x))                       # warm the bucket
        # Chunked timing: serving bundles are single-call AOT
        # artifacts, so chain dispatches back-to-back and subtract the
        # dispatch floor measured on an empty repeat.
        reps = max(4, (1 << 21) // b)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = serving(x)
        fetch(y)
        dt = time.perf_counter() - t0
        results[str(b)] = {
            "ms_per_batch": round(dt / reps * 1e3, 3),
            "samples_per_sec": round(reps * b / dt, 1),
            "reps": reps,
        }
        print(f"bucket {b}: {dt / reps * 1e3:.2f} ms/batch "
              f"({reps * b / dt:.3g} samples/s)", flush=True)

    # jit-inference comparison at the headline batch (scan-chunked: the
    # dispatch-latency-free number bench.py reports).
    B = 262144
    chunk = 16

    def infer_chunk(params, key):
        def body(carry, i):
            x = jax.random.uniform(jax.random.fold_in(key, i), (B, 2))
            y = model.network.inference(params, x + carry * 1e-30)
            return y[0, 0].astype(jnp.float32), None

        o, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(chunk))
        return o

    params = tr.inference_params(state)
    f = jax.jit(infer_chunk)
    fetch(f(params, jax.random.key(1)))
    t0 = time.perf_counter()
    fetch(f(params, jax.random.key(2)))
    dt = time.perf_counter() - t0
    jit_sps = chunk * B / dt
    print(f"jit scan-chunked inference: {jit_sps:.3g} samples/s", flush=True)

    commit = subprocess.run(["git", "rev-parse", "HEAD"],
                            capture_output=True, text=True,
                            cwd=os.path.dirname(__file__)).stdout.strip()
    with open(out, "w") as fo:
        json.dump({"buckets": results,
                   "jit_scan_chunked_samples_per_sec": round(jit_sps, 1),
                   "batch_headline": B,
                   "producing_commit": commit}, fo, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main(sys.argv)
