"""Framework-comparison harness — the reference's
``benchmarks/image/bench_tensorflow.py`` rebuilt for TPU.

The reference compares its fused CUDA path against the same model
written naively in TensorFlow v1 + XLA on the same GPU.  The honest
TPU equivalent compares against the same model written NAIVELY in JAX
on the same TPU — plain jnp ops, (B, features) AoS layouts, XLA
autodiff for the grid scatter, no Pallas kernels, fp32 — i.e. what a
user would write without this framework.  (A TensorFlow variant is
included for completeness but only runs on CPU in this image — TF has
no access to the axon TPU — so its numbers measure a different chip;
pass --tf to run it anyway.)

Protocol matches bench_ours.cu / benchmarks/sweep.py: training
throughput at batch 2^18 over the image-fit task, scan-compiled chunks,
readback-synced timing.  Output: one JSON line per framework.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np


def naive_jax_throughput(batch: int, steps: int, chunk: int) -> dict:
    """The config_hash model written as straight-line jnp, no tcnn_tpu."""
    import jax
    import jax.numpy as jnp

    L, F, LOG2, BASE, SCALE = 16, 2, 15, 16, 1.5
    WIDTH, HIDDEN = 64, 2
    PRIMES = (1, 2654435761, 805459861)

    # Level geometry identical to the framework/reference.
    scales = [2.0 ** (l * math.log2(SCALE)) * BASE - 1.0 for l in range(L)]
    resolutions = [int(math.ceil(s)) + 1 for s in scales]
    sizes, offsets = [], []
    off = 0
    for r in resolutions:
        sz = min(-(-r * r // 8) * 8, 1 << LOG2)
        sizes.append(sz)
        offsets.append(off)
        off += sz
    n_entries = off

    def encode(table, x):
        outs = []
        for l in range(L):
            pos = x * scales[l] + 0.5
            cell = jnp.floor(pos)
            f = pos - cell
            cell = cell.astype(jnp.int32).astype(jnp.uint32)
            feats = 0.0
            for cx in (0, 1):
                for cy in (0, 1):
                    cc = cell + jnp.asarray([cx, cy], jnp.uint32)
                    if resolutions[l] ** 2 <= sizes[l]:
                        idx = cc[:, 0] + cc[:, 1] * jnp.uint32(resolutions[l])
                    else:
                        idx = ((cc[:, 0] * jnp.uint32(PRIMES[0]))
                               ^ (cc[:, 1] * jnp.uint32(PRIMES[1])))
                    idx = (idx % jnp.uint32(sizes[l])
                           + jnp.uint32(offsets[l])).astype(jnp.int32)
                    w = ((f[:, 0] if cx else 1 - f[:, 0])
                         * (f[:, 1] if cy else 1 - f[:, 1]))
                    feats = feats + w[:, None] * table[idx]
            outs.append(feats)
        return jnp.concatenate(outs, axis=1)          # (B, L·F) AoS

    def forward(params, x):
        h = encode(params["table"], x)
        for w in params["ws"][:-1]:
            h = jnp.maximum(h @ w, 0.0)
        return h @ params["ws"][-1]

    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "table": jax.random.uniform(k1, (n_entries, F), jnp.float32,
                                    -1e-4, 1e-4),
        "ws": [jax.random.normal(k2, (L * F, WIDTH)) * 0.1,
               jax.random.normal(k3, (WIDTH, WIDTH)) * 0.1,
               jax.random.normal(k4, (WIDTH, 3)) * 0.1],
    }

    def loss_fn(params, x, t):
        pred = forward(params, x)
        return jnp.mean((pred - t) ** 2 / (jax.lax.stop_gradient(pred) ** 2
                                           + 0.01))

    def sgd_chunk(params, key):
        def body(p, i):
            k = jax.random.fold_in(key, i)
            x = jax.random.uniform(k, (batch, 2))
            t = jax.random.uniform(jax.random.fold_in(k, 1), (batch, 3))
            l, g = jax.value_and_grad(loss_fn)(p, x, t)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-2 * b, p, g)
            return p, l

        return jax.lax.scan(body, params, jnp.arange(chunk))

    jchunk = jax.jit(sgd_chunk, donate_argnums=(0,))

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).ravel()[0])

    t0 = time.perf_counter()
    params, losses = jchunk(params, jax.random.fold_in(key, 9))
    fetch(losses[-1:])
    compile_s = time.perf_counter() - t0

    n_chunks = max(steps // chunk, 1)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        params, losses = jchunk(params, jax.random.fold_in(key, 10 + i))
    fetch(losses[-1:])
    dt = time.perf_counter() - t0
    return {
        "framework": "naive-jax (no tcnn_tpu kernels, AoS, XLA scatter)",
        "device": str(jax.devices()[0]),
        "training_throughput": round(n_chunks * chunk * batch / dt, 1),
        "batch_size": batch,
        "n_steps": n_chunks * chunk,
        "compile_seconds": round(compile_s, 1),
    }


def tf_throughput(batch: int, steps: int) -> dict:
    """TensorFlow (CPU-only in this image) variant, for completeness."""
    import tensorflow as tf

    L, F, LOG2, BASE, SCALE = 16, 2, 15, 16, 1.5
    n_entries = 0
    scales = [2.0 ** (l * math.log2(SCALE)) * BASE - 1.0 for l in range(L)]
    resolutions = [int(math.ceil(s)) + 1 for s in scales]
    sizes = [min(-(-r * r // 8) * 8, 1 << LOG2) for r in resolutions]
    offsets = np.cumsum([0] + sizes[:-1]).tolist()
    n_entries = sum(sizes)

    table = tf.Variable(tf.random.uniform((n_entries, F), -1e-4, 1e-4))
    ws = [tf.Variable(tf.random.normal((L * F, 64)) * 0.1),
          tf.Variable(tf.random.normal((64, 64)) * 0.1),
          tf.Variable(tf.random.normal((64, 3)) * 0.1)]
    opt = tf.keras.optimizers.SGD(1e-2)

    @tf.function(jit_compile=True)
    def step(x, t):
        with tf.GradientTape() as tape:
            outs = []
            for l in range(L):
                pos = x * scales[l] + 0.5
                cell = tf.floor(pos)
                f = pos - cell
                cell = tf.cast(cell, tf.int64)
                feats = 0.0
                for cx in (0, 1):
                    for cy in (0, 1):
                        cc = cell + tf.constant([cx, cy], tf.int64)
                        if resolutions[l] ** 2 <= sizes[l]:
                            idx = cc[:, 0] + cc[:, 1] * resolutions[l]
                        else:
                            idx = tf.bitwise.bitwise_xor(
                                cc[:, 0], cc[:, 1] * 2654435761)
                        idx = idx % sizes[l] + offsets[l]
                        w = ((f[:, 0] if cx else 1 - f[:, 0])
                             * (f[:, 1] if cy else 1 - f[:, 1]))
                        feats = feats + w[:, None] * tf.gather(table, idx)
                outs.append(feats)
            h = tf.concat(outs, axis=1)
            for w_ in ws[:-1]:
                h = tf.nn.relu(h @ w_)
            pred = h @ ws[-1]
            loss = tf.reduce_mean(
                (pred - t) ** 2 / (tf.stop_gradient(pred) ** 2 + 0.01))
        grads = tape.gradient(loss, [table] + ws)
        opt.apply_gradients(zip(grads, [table] + ws))
        return loss

    x = tf.random.uniform((batch, 2))
    t = tf.random.uniform((batch, 3))
    step(x, t)  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = step(x, t)
    _ = float(loss)
    dt = time.perf_counter() - t0
    return {
        "framework": "tensorflow+xla (CPU in this image)",
        "training_throughput": round(steps * batch / dt, 1),
        "batch_size": batch,
        "n_steps": steps,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 18)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--tf", action="store_true",
                    help="also run the TensorFlow (CPU) variant")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "baseline_result.json"))
    args = ap.parse_args()

    results = [naive_jax_throughput(args.batch, args.steps, args.chunk)]
    print(json.dumps(results[0]))
    if args.tf:
        results.append(tf_throughput(min(args.batch, 1 << 14), 10))
        print(json.dumps(results[1]))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
