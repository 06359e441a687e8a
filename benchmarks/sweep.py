"""Full benchmark sweep — the reference's bench_ours.cu protocol
(benchmarks/image/bench_ours.cu:188-336): batch sizes 2^14..2^21 ×
methods {FullyFusedMLP, MLP(CutlassMLP-equivalent)}, mean training and
inference samples/s, dumped to bench_result_ours.json with the same
top-level structure so downstream comparison tooling keeps working.

Each (method, batch) cell measures a jitted lax.scan of training steps
(one dispatch per chunk — the CUDA-graph-replay analog) with on-device
data generation inside the loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_result_ours.json")
    ap.add_argument("--min-pow", type=int, default=14)
    ap.add_argument("--max-pow", type=int, default=21)
    ap.add_argument("--config", default=os.path.join(
        os.path.dirname(__file__), "..", "configs", "config_oneblob.json"))
    ap.add_argument("--iters-scale", type=float, default=1.0,
                    help="scale factor on the per-batch iteration count "
                         "(use <1 for smoke runs)")
    args = ap.parse_args()

    import jax
    import numpy as np

    import tcnn_tpu as tcnn
    from tcnn_tpu.utils.image import ImageSampler, bench_image, synthetic_image

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tcnn_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    def fetch(x):
        """True sync: on the tunnel, block_until_ready reports enqueue;
        only a data readback waits for completion."""
        return float(np.asarray(jax.device_get(x)).ravel()[0])

    img, _name = bench_image()
    if img.shape[0] * img.shape[1] < (1 << 21):
        # Pool must exceed the largest batch (2^21): 2048² → 4.2M pixels.
        img = synthetic_image(2048, 2048)
    sampler = ImageSampler(img)

    base_cfg = tcnn.load_config(args.config)
    results = {"tcnn_tpu": {}}

    for method, otype in (("fully_fused", "FullyFusedMLP"),
                          ("cutlass", "MLP")):
        method_results = []
        for p in range(args.min_pow, args.max_pow + 1):
            batch_size = 1 << p
            cfg = json.loads(json.dumps(base_cfg))
            cfg["network"]["otype"] = otype
            model = tcnn.create_from_config(2, 3, cfg, policy=tcnn.BF16_POLICY)
            state = model.trainer.initial_state()

            # Match the reference's step-count scaling
            # (bench_ours.cu:196-197): more steps for smaller batches.
            n_iters = max(1000 * (1 << 18) // batch_size, 250)
            n_iters = max(int(n_iters * args.iters_scale), 10)
            # Chunk ≤ 20: keeps every dispatch short (tunnel-watchdog
            # safe) while amortizing host round trips.
            chunk = min(max(n_iters // 10, 10), 20)
            n_chunks = max(n_iters // chunk, 1)
            warmup_chunks = max(n_chunks // 2, 1)

            # Pool passed as jit argument, NOT closure-captured (large
            # captured arrays become constants in the compiled program).
            loop = model.trainer.make_training_loop(
                lambda k, pool, b=batch_size:
                    ImageSampler.sample_from_pool(k, pool, b),
                chunk, sample_data=sampler.pool_data())
            key = jax.random.key(0)
            for i in range(warmup_chunks):
                state, losses = loop(state, jax.random.fold_in(key, i))
            fetch(losses)
            t0 = time.perf_counter()
            for i in range(n_chunks):
                state, losses = loop(state, jax.random.fold_in(key, 1000 + i))
            final_loss = fetch(losses[-1:])
            train_tp = n_chunks * chunk * batch_size / (time.perf_counter() - t0)

            # Inference: scan-chunked like training (one dispatch per
            # chunk of batches, inputs generated in-loop, serialized by
            # a data-dependent carry) — serial per-batch dispatches
            # would measure tunnel dispatch latency, not the device
            # (round-2 sweep artifact showed inference BELOW training
            # throughput for exactly that reason).
            params = model.trainer.inference_params(state)
            import jax.numpy as jnp

            def infer_chunk(p, key):
                def body(carry, i):
                    x = jax.random.uniform(
                        jax.random.fold_in(key, i), (batch_size, 2))
                    y = model.network.inference(
                        p, x + carry * jnp.float32(1e-30))
                    return y[0, 0].astype(jnp.float32), None

                out, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(chunk))
                return out

            infer = jax.jit(infer_chunk)
            fetch(infer(params, jax.random.key(1)))  # compile+warm
            n_inf_chunks = max(n_chunks, 2)
            t0 = time.perf_counter()
            for i in range(n_inf_chunks):
                carry = infer(params, jax.random.fold_in(key, 5000 + i))
            fetch(carry)
            infer_tp = (n_inf_chunks * chunk * batch_size
                        / (time.perf_counter() - t0))

            # Route label (round-5 VERDICT #7): which implementation
            # actually ran this cell.  "fully_fused" rows below the
            # FusedMLP batch-dispatch threshold execute the XLA chain
            # (models/networks/fused_mlp.py PALLAS_MIN_BATCH), like the
            # reference's arch-based network selection — the label makes
            # that explicit instead of implying the Pallas kernel ran.
            net = model.network.network if hasattr(
                model.network, "network") else model.network
            if method == "fully_fused":
                thresh = getattr(net, "PALLAS_MIN_BATCH", None)
                pallas = bool(getattr(net, "use_pallas", False)
                              and thresh is not None
                              and batch_size >= thresh)
                route = ("pallas fused_mlp kernel" if pallas else
                         f"XLA matmul chain (batch < 2^"
                         f"{(thresh or 0).bit_length() - 1} dispatch "
                         "threshold)")
            else:
                route = "XLA matmul chain (MLP/CutlassMLP-equivalent)"

            cell = {
                "batch_size": batch_size,
                "training_throughput": train_tp,
                "inference_throughput": infer_tp,
                "training_loss": final_loss,
                "mlp_route": route,
            }
            method_results.append(cell)
            print(f"{method} 2^{p}: train {train_tp:.3e}/s "
                  f"infer {infer_tp:.3e}/s loss {cell['training_loss']:.4f} "
                  f"[{route}]", flush=True)
        results["tcnn_tpu"][method] = method_results

    import subprocess

    results["meta"] = {
        "config": os.path.basename(args.config),
        "producing_commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True,
            text=True).stdout.strip(),
        "device": str(jax.devices()[0]),
        "known_anomalies": {
            "train_dip_at_2^16": (
                "training throughput at B=2^16 is reproducibly ~30% "
                "below both neighbors PER SAMPLE (round-5 probe: "
                "8.82-8.85e7 samples/s across chunk sizes 10/20/40 and "
                "repeats, vs 1.1-1.2e8 at 2^15 and 1.39e8 at 2^17; "
                "11.3 ns/sample vs 8.3/7.2).  Identical on both "
                "methods, which share the XLA-chain MLP route and all "
                "data/loss/optimizer code at this batch — i.e. an XLA "
                "codegen anomaly for some op at exactly a 65536-sized "
                "dimension, not a framework dispatch decision.  "
                "Inference at 2^16 shows no dip."),
        },
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
