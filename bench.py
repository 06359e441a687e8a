"""Benchmark harness — mirrors the reference's bench_ours.cu protocol
(benchmarks/image/bench_ours.cu:188-336): image fitting with the
config_hash model (HashGrid L=16 F=2 log2=15 + 64-wide 2-hidden-layer
MLP, RelativeL2, Adam), measuring mean training and inference
throughput in samples/s with warmup.

Like the reference — which replays a captured CUDA graph per step and
generates training data on-GPU inside the measured loop — the measured
unit here is a jitted lax.scan over training steps with on-device data
generation (`Trainer.make_training_loop`), so host dispatch overhead is
amortized exactly the way CUDA-graph replay amortizes kernel launches.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N, ...}

vs_baseline compares against the reference's headline number: 1000
training steps @ batch 2^18 in "a bit over 1 second" on an RTX 4090
≈ 2.4e8 training samples/s (README.md:75, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

REFERENCE_TRAIN_SAMPLES_PER_SEC = 2.4e8


def main():
    import jax
    import jax.numpy as jnp

    import tcnn_tpu as tcnn
    from tcnn_tpu.utils.image import ImageSampler, load_image, synthetic_image

    batch_size = int(os.environ.get("TCNN_BENCH_BATCH", 1 << 18))
    n_train_steps = int(os.environ.get("TCNN_BENCH_STEPS", 1000))
    chunk = int(os.environ.get("TCNN_BENCH_CHUNK", 100))

    # Bench image: the reference's bundled photo if mounted, else synthetic.
    ref_img = "/root/reference/data/images/albert.jpg"
    img = None
    if os.path.exists(ref_img):
        try:
            img = load_image(ref_img)
        except Exception:
            img = None
    if img is None:
        img = synthetic_image(1024, 1024)
    sampler = ImageSampler(img)

    model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                    policy=tcnn.BF16_POLICY)
    state = model.trainer.initial_state()

    def sample_fn(key):
        return sampler.sample_batch(key, batch_size)

    loop = model.trainer.make_training_loop(sample_fn, chunk)

    # Warmup: compile + one chunk of steady-state.
    key = jax.random.key(0)
    state, losses = loop(state, jax.random.fold_in(key, 0))
    jax.block_until_ready(losses)

    n_chunks = max(n_train_steps // chunk, 1)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, losses = loop(state, jax.random.fold_in(key, i + 1))
    jax.block_until_ready(losses)
    t1 = time.perf_counter()
    train_time = t1 - t0
    train_throughput = n_chunks * chunk * batch_size / train_time

    # Inference throughput: one dispatch over a chunk of batches.
    params = model.trainer.inference_params(state)
    xy, _ = sampler.sample_batch(jax.random.key(7), batch_size)

    def infer_chunk(params, xy):
        def body(_, i):
            y = model.network.inference(params, xy)
            return (), jnp.sum(y)

        _, sums = jax.lax.scan(body, (), jnp.arange(chunk))
        return sums

    infer = jax.jit(infer_chunk)
    jax.block_until_ready(infer(params, xy))
    n_inf_chunks = max(n_chunks, 2)
    t0 = time.perf_counter()
    for _ in range(n_inf_chunks):
        s = infer(params, xy)
    jax.block_until_ready(s)
    t1 = time.perf_counter()
    infer_throughput = n_inf_chunks * chunk * batch_size / (t1 - t0)

    result = {
        "metric": "image-fit training throughput (HashGrid L16F2 + "
                  "FusedMLP 64x2, batch 2^18)",
        "value": round(train_throughput, 1),
        "unit": "samples/s",
        "vs_baseline": round(train_throughput / REFERENCE_TRAIN_SAMPLES_PER_SEC, 4),
        "inference_samples_per_sec": round(infer_throughput, 1),
        "final_loss": float(losses[-1]),
        "batch_size": batch_size,
        "n_steps": n_chunks * chunk,
        "train_seconds": round(train_time, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
