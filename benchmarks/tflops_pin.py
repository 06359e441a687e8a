"""Pin the sustained-MXU-TFLOPS roofline denominator (round-5 VERDICT
#5: bench.py's per-run probe accepted triples spanning ±9%, and one
round-4 run returned null — every "x% of MXU bound" claim inherited
that spread).

Protocol: for each matmul shape, time chained in-dispatch matmuls at
two chain lengths (slope cancels upload + dispatch), k times; ≥ 20
readings total across shapes.  Report per-shape and pooled MEDIAN +
MAD.  The committed artifact (benchmarks/tflops_pinned.json) IS the
roofline denominator; bench.py's in-run probe becomes a sanity check
against it (tflops_vs_pinned_ratio) and never reports null.

Readings outside (0, 250] TF are rejected: v5e peak is 197 bf16 TF,
and the tunnel occasionally acks a readback early (impossible values)
or hiccups for seconds (negative slopes).

Usage: python benchmarks/tflops_pin.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np

SHAPES = (
    # (m, k, n, n_lo, n_hi) — chain lengths sized so the hi-chain slope
    # signal is ~0.3-0.6 s per reading.
    (4096, 4096, 4096, 20, 500),
    (8192, 8192, 8192, 4, 64),
    (2048, 2048, 2048, 80, 2000),
    (512, 32768, 512, 40, 1000),   # skinny: grid-kernel-like aspect
)
READS_PER_SHAPE = 6
PHYS_CAP_TF = 250.0


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "tflops_pinned.json")
    import jax
    import jax.numpy as jnp

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).ravel()[0])

    # Absorb the tunnel's idle-reclaim stall before timing anything.
    fetch(jax.jit(lambda: jnp.zeros(()))())

    per_shape = {}
    all_reads = []
    for (m, k, n, n_lo, n_hi) in SHAPES:
        a = jax.random.normal(jax.random.key(9), (m, k)).astype(jnp.bfloat16)
        bmat = jax.random.normal(jax.random.key(10), (k, n)).astype(jnp.bfloat16)
        if k != n:
            # y @ bmat is shape-preserving only when bmat is square
            # (k == n); otherwise multiply back to (m, k) each step.
            back = jax.random.normal(jax.random.key(11),
                                     (n, k)).astype(jnp.bfloat16)

            # Readback is ONE element ([:1,:1] slice, data-dependent):
            # device_get of the full product rode the flaky tunnel link
            # and dominated the reading noise.
            def chain_fn(steps):
                def body(i, y):
                    z = (y @ bmat).astype(jnp.bfloat16)      # (m, n)
                    return (z @ back).astype(jnp.bfloat16)   # (m, k)

                return jax.jit(lambda x: jax.lax.fori_loop(
                    0, steps, body, x)[:1, :1])

            flops_per_step = 2 * m * k * n + 2 * m * n * k
        else:
            def chain_fn(steps):
                return jax.jit(lambda x: jax.lax.fori_loop(
                    0, steps, lambda i, y: (y @ bmat).astype(jnp.bfloat16),
                    x)[:1, :1])

            flops_per_step = 2 * m * k * n

        f_lo, f_hi = chain_fn(n_lo), chain_fn(n_hi)
        fetch(f_lo(a))
        fetch(f_hi(a))
        reads = []
        attempts = 0
        while len(reads) < READS_PER_SHAPE and attempts < 4 * READS_PER_SHAPE:
            attempts += 1
            t0 = time.perf_counter()
            fetch(f_lo(a))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(f_hi(a))
            t_hi = time.perf_counter() - t0
            slope = t_hi - t_lo
            if slope <= 0.03:
                print(f"{m}x{k}x{n}: rejected slope {slope:.3f}s",
                      flush=True)
                continue
            tf = (n_hi - n_lo) * flops_per_step / slope / 1e12
            if not (0 < tf <= PHYS_CAP_TF):
                print(f"{m}x{k}x{n}: rejected {tf:.0f} TF (early ack)",
                      flush=True)
                continue
            reads.append(round(tf, 2))
        per_shape[f"{m}x{k}x{n}"] = reads
        all_reads.extend(reads)
        med = float(np.median(reads)) if reads else None
        print(f"{m}x{k}x{n}: {reads} median {med}", flush=True)

    # Pool only shapes with enough accepted readings to be credible
    # (a stall-era shape contributing one absurd reading must not skew
    # the pin); require a minimum pool or refuse to write.
    pooled = [r for reads in per_shape.values() if len(reads) >= 3
              for r in reads]
    if len(pooled) < 9:
        print(f"only {len(pooled)} credible readings — NOT writing a "
              "pin; rerun when the worker is settled")
        return
    all_reads = pooled
    arr = np.asarray(all_reads, np.float64)
    med = float(np.median(arr))
    mad = float(np.median(np.abs(arr - med)))
    res = {
        "pinned_sustained_bf16_tflops": round(med, 2),
        "mad_tflops": round(mad, 2),
        "mad_frac": round(mad / med, 4) if med else None,
        "n_readings": int(arr.size),
        "per_shape_readings": per_shape,
        "protocol": "chained in-dispatch bf16 matmuls, slope over two "
                    "chain lengths (cancels upload+dispatch), readback "
                    f"sync; {READS_PER_SHAPE} readings/shape, rejects "
                    "slope<=30ms and readings outside (0, 250] TF",
        "device": str(jax.devices()[0]),
        "producing_commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True,
            text=True).stdout.strip(),
    }
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: res[k] for k in
                      ("pinned_sustained_bf16_tflops", "mad_tflops",
                       "mad_frac", "n_readings")}))
    print("wrote", out)


if __name__ == "__main__":
    main()
