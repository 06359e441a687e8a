"""Image fitting through the PyTorch bindings — the reference's
``samples/mlp_learning_an_image_pytorch.py`` rebuilt over
``tcnn_tpu.bindings.torch_interop``.

Mirrors the reference sample's structure: a
``NetworkWithInputEncoding`` torch.nn.Module (forward/backward run in
the native framework, parameters live in torch), a manual relative-L2
loss written in torch (reference sample lines ~120-130), and
``torch.optim.Adam`` at lr 0.01.  Dumps predictions at steps
10/100/1000 like the native sample.

Usage:
    python samples/mlp_learning_an_image_pytorch.py [image.jpg] [n_steps]
"""

from __future__ import annotations

import os
import sys
import time

try:  # installed package (pip install -e .) or repo checkout
    import tcnn_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch

from tcnn_tpu.bindings import torch_interop as tcnn_torch
from tcnn_tpu.utils import metrics
from tcnn_tpu.utils.image import bench_image, load_image


def write_image(path: str, img: np.ndarray) -> None:
    arr = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:
        np.save(path + ".npy", arr)


def main(argv):
    n_steps = int(argv[2]) if len(argv) > 2 else 1000
    batch_size = 2 ** 14  # torch interop crosses host; keep batches modest

    if len(argv) > 1 and os.path.exists(argv[1]):
        img = load_image(argv[1])
    else:
        # Standalone-first fixture resolution (repo fixture.png, then
        # the reference photo if mounted, then synthetic).
        img, _name = bench_image()
    h, w = img.shape[:2]

    model = tcnn_torch.NetworkWithInputEncoding(
        n_input_dims=2, n_output_dims=3,
        encoding_config={"otype": "HashGrid", "n_levels": 16,
                         "n_features_per_level": 2, "log2_hashmap_size": 15,
                         "base_resolution": 16, "per_level_scale": 1.5},
        network_config={"otype": "FullyFusedMLP", "n_neurons": 64,
                        "n_hidden_layers": 2, "activation": "ReLU",
                        "output_activation": "None"})
    print(model)
    optimizer = torch.optim.Adam(model.parameters(), lr=0.01)

    target_full = torch.from_numpy(
        np.asarray(img, np.float32).reshape(-1, 3))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords_full = torch.from_numpy(np.stack(
        [(xs.ravel() + 0.5) / w, (ys.ravel() + 0.5) / h],
        axis=-1).astype(np.float32))

    rng = np.random.RandomState(1337)
    dump_at = {10, 100, 1000}
    t0 = time.perf_counter()
    prev_t = t0
    interval = 10
    for i in range(1, n_steps + 1):
        idx = torch.from_numpy(
            rng.randint(0, h * w, size=batch_size))
        xy = coords_full[idx]
        rgb = target_full[idx]

        pred = model(xy)
        # Manual relative L2, exactly as the reference torch sample.
        relative_l2_error = (pred - rgb) ** 2 / (pred.detach() ** 2 + 0.01)
        loss = relative_l2_error.mean()

        optimizer.zero_grad()
        loss.backward()
        optimizer.step()

        if i % interval == 0:
            now = time.perf_counter()
            print(f"Step#{i}: loss={loss.item():.6f} "
                  f"time={1e6 * (now - prev_t):.0f}[µs]")
            prev_t = now
            if i >= 100:
                interval = 100

        if i in dump_at:
            with torch.no_grad():
                pred = model(coords_full).clamp(0, 1).numpy()
            mse = metrics.mean_MSE(pred, target_full.numpy())
            print(f"  PSNR@{i}: {metrics.mse2psnr(mse):.2f} dB")
            write_image(f"{i}_pytorch.jpg", pred.reshape(h, w, 3))

    total = time.perf_counter() - t0
    print(f"Finished {n_steps} steps in {total:.2f}s")


if __name__ == "__main__":
    main(sys.argv)
