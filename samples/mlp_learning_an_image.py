"""Image-fitting sample — the reference's flagship demo
(samples/mlp_learning_an_image.cu) rebuilt on the TPU framework.

Learns (x, y) -> RGB from a single image with a config-driven model;
dumps predicted images at steps 10/100/1000 like the reference
(README "10 steps / 100 steps / 1000 steps" comparison).

Usage:
    python samples/mlp_learning_an_image.py [image.jpg] [config.json] [n_steps]
"""

from __future__ import annotations

import os
import sys
import time

try:  # installed package (pip install -e .) or repo checkout
    import tcnn_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tcnn
from tcnn_tpu.utils import metrics
from tcnn_tpu.utils.image import ImageSampler, load_image, synthetic_image


def write_image(path: str, img: np.ndarray) -> None:
    img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(img8).save(path)
        return
    except ImportError:
        pass
    np.save(path + ".npy", img)


def main(argv):
    image_path = argv[1] if len(argv) > 1 else None
    config_path = argv[2] if len(argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "configs", "config_hash.json")
    n_steps = int(argv[3]) if len(argv) > 3 else 1000
    batch_size = 1 << 18

    if image_path and os.path.exists(image_path):
        img = load_image(image_path)
    else:
        print("No image given; using synthetic 1024x1024 test image")
        img = synthetic_image(1024, 1024)
    sampler = ImageSampler(img)
    print(f"Image: {sampler.width}x{sampler.height}")

    model = tcnn.create_from_config(2, 3, config_path,
                                    policy=tcnn.BF16_POLICY)
    state = model.trainer.initial_state()
    print(f"Model: {model.network.hyperparams()}")
    print(f"n_params: {model.trainer.n_params(state)}")

    coords = sampler.full_grid_coords()
    ref = np.asarray(sampler.image).reshape(-1, 3)

    def predict_full(state, chunk=1 << 18):
        """Full-image inference in fixed-size chunks: one multi-million-
        row dispatch is both slow to move over the tunnel and heavy on
        the compiler; 2^18-row chunks reuse the training-batch shape."""
        n = coords.shape[0]
        pad = (-n) % chunk
        cpad = jnp.pad(coords, ((0, pad), (0, 0))) if pad else coords
        outs = [np.asarray(model.trainer.inference(state,
                                                   cpad[i:i + chunk]))
                for i in range(0, n + pad, chunk)]
        return np.concatenate(outs, axis=0)[:n]

    key = jax.random.key(1337)
    dump_at = {10, 100, 1000}
    t_start = time.perf_counter()
    interval = 10
    prev_t = t_start
    for i in range(1, n_steps + 1):
        key, sub = jax.random.split(key)
        xy, rgb = sampler.sample_batch(sub, batch_size)
        state, loss = model.trainer.training_step(state, xy, rgb)

        if i % interval == 0:
            jax.block_until_ready(loss)
            now = time.perf_counter()
            throughput = interval * batch_size / (now - prev_t)
            print(f"Step#{i}: loss={float(loss):.6f} "
                  f"time={1e6*(now - prev_t):.0f}[µs] "
                  f"throughput={throughput:.2e}[samples/s]")
            prev_t = now
            if i >= 100:
                interval = 100

        if i in dump_at:
            pred = predict_full(state)
            mse = metrics.mean_MSE(pred, ref)
            print(f"  PSNR@{i}: {metrics.mse2psnr(mse):.2f} dB")
            write_image(f"{i}.jpg",
                        pred.reshape(sampler.height, sampler.width, 3))

    total = time.perf_counter() - t_start
    pred = predict_full(state)
    mse = metrics.mean_MSE(pred, ref)
    print(f"Finished {n_steps} steps in {total:.2f}s "
          f"({n_steps * batch_size / total:.2e} samples/s), "
          f"final PSNR {metrics.mse2psnr(mse):.2f} dB")


if __name__ == "__main__":
    main(sys.argv)
