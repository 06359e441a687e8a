"""Image IO + on-device pixel sampling for the image-fitting workloads.

Counterpart of the reference's GPU-texture sampler
(samples/mlp_learning_an_image.cu:101-160) and scripts/common.py image
helpers.  The reference uploads the image to a CUDA texture and samples
bilinearly per random (x, y); here the image lives in device HBM and a
jitted gather does the sampling — random batch generation happens
on-device from a threaded PRNG key, so the training loop never touches
the host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_image(path: str) -> np.ndarray:
    """Load an image as float32 (H, W, 3) in [0, 1].

    Uses PIL if available, else imageio, else raises; synthetic
    fallbacks live in ``synthetic_image``."""
    try:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        return img
    except ImportError:
        pass
    try:
        import imageio.v2 as imageio

        img = np.asarray(imageio.imread(path), np.float32)
        if img.max() > 1.0:
            img = img / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        return img[..., :3]
    except ImportError as e:
        raise RuntimeError(
            "No image library available (PIL/imageio); use synthetic_image()"
        ) from e


def synthetic_image(height: int = 512, width: int = 512,
                    seed: int = 0) -> np.ndarray:
    """Deterministic synthetic test image with multi-scale structure
    (smooth gradients + mid-frequency waves + sharp edges) so that both
    coarse and fine hash-grid levels have signal to fit."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    u, v = xs / width, ys / height
    img = np.zeros((height, width, 3), np.float32)
    img[..., 0] = 0.5 + 0.5 * np.sin(2 * np.pi * (3 * u + v))
    img[..., 1] = 0.5 + 0.5 * np.cos(2 * np.pi * (u - 2 * v) + 1.0)
    img[..., 2] = u * v
    # mid frequencies
    for c in range(3):
        fx, fy = rng.randint(5, 20, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img[..., c] += 0.15 * np.sin(2 * np.pi * (fx * u + fy * v) + ph)
    # sharp circles
    for _ in range(6):
        cx, cy, r = rng.uniform(0.1, 0.9), rng.uniform(0.1, 0.9), rng.uniform(0.05, 0.2)
        mask = ((u - cx) ** 2 + (v - cy) ** 2) < r ** 2
        img[mask] += rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


class ImageSampler:
    """On-device bilinear image sampler (texture-unit replacement).

    ``sample_batch(key, n)`` → (xy in [0,1]^2, rgb) with xy uniform
    random, matching the reference's training-data generator
    (mlp_learning_an_image.cu:229-243, which samples the CUDA texture
    with linear filtering at random uvs).
    """

    def __init__(self, image: np.ndarray):
        self.image = jnp.asarray(image, jnp.float32)
        self.height, self.width = image.shape[:2]
        self._jit_sample_at = jax.jit(self.sample_at)

    def sample_at(self, xy: jax.Array) -> jax.Array:
        """Bilinear lookup at normalized coords (B, 2) [x, y] in [0,1]."""
        img = self.image
        h, w = self.height, self.width
        # Texel-center convention: uv·size − 0.5.
        fx = xy[:, 0] * w - 0.5
        fy = xy[:, 1] * h - 0.5
        x0f = jnp.floor(fx)
        y0f = jnp.floor(fy)
        tx = fx - x0f
        ty = fy - y0f
        # Clamp-to-edge on BOTH corners independently (so uv just
        # outside the texel centers degrades to the edge texel).
        x0i = x0f.astype(jnp.int32)
        y0i = y0f.astype(jnp.int32)
        x0 = jnp.clip(x0i, 0, w - 1)
        y0 = jnp.clip(y0i, 0, h - 1)
        x1 = jnp.clip(x0i + 1, 0, w - 1)
        y1 = jnp.clip(y0i + 1, 0, h - 1)
        c00 = img[y0, x0]
        c01 = img[y0, x1]
        c10 = img[y1, x0]
        c11 = img[y1, x1]
        tx = tx[:, None]
        ty = ty[:, None]
        return ((1 - ty) * ((1 - tx) * c00 + tx * c01)
                + ty * ((1 - tx) * c10 + tx * c11))

    def sample_batch(self, key: jax.Array, n: int) -> Tuple[jax.Array, jax.Array]:
        xy = jax.random.uniform(key, (n, 2), jnp.float32)
        return xy, self._jit_sample_at(xy)

    def full_grid_coords(self) -> jax.Array:
        """Pixel-center coords of the full image, for inference dumps
        (mlp_learning_an_image.cu:190-204)."""
        ys, xs = jnp.mgrid[0:self.height, 0:self.width]
        u = (xs.astype(jnp.float32) + 0.5) / self.width
        v = (ys.astype(jnp.float32) + 0.5) / self.height
        return jnp.stack([u.ravel(), v.ravel()], axis=-1)


def mse2psnr(mse: float) -> float:
    return float(-10.0 * np.log10(max(mse, 1e-12)))
