"""Neural BTF regression sample — the fork's motivating workload.

A BTF (bidirectional texture function) maps (u, v, light dir, view dir)
to reflected RGB.  The reference fork enables 4-D grids precisely for
this (grid.h:1177 enables ``case 4:``); the canonical setup encodes the
4 "spatial-ish" dims (uv + half-vector parameterization) with a hash
grid composed with OneBlob for the remaining angular dims — see
configs/config_btf.json.

With no measured BTF dataset bundled, this sample fits a synthetic but
non-trivial BTF: a spatially-varying microfacet-style BRDF whose
roughness/albedo are driven by procedural textures.  6-D input:
(u, v, lx, ly, vx, vy) with directions parameterized by their xy
components in [0,1]^2.

Usage: python samples/fit_btf.py [n_steps] [batch_pow]
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


def _dir_from_xy(xy):
    """(B,2) in [0,1]^2 -> unit vectors on the upper hemisphere."""
    d = xy * 2.0 - 1.0
    xz = jnp.clip(1.0 - jnp.sum(d * d, axis=-1, keepdims=True), 1e-4, 1.0)
    return jnp.concatenate([d, jnp.sqrt(xz)], axis=-1)


def synthetic_btf(x6):
    """Ground-truth BTF: spatially-varying Blinn-Phong-ish reflectance."""
    uv = x6[:, 0:2]
    l = _dir_from_xy(x6[:, 2:4])
    v = _dir_from_xy(x6[:, 4:6])
    h = l + v
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)

    # Procedural spatial textures: albedo + roughness + bump phase.
    u, w = uv[:, 0], uv[:, 1]
    albedo = jnp.stack([
        0.5 + 0.4 * jnp.sin(2 * jnp.pi * (3 * u + w)),
        0.5 + 0.4 * jnp.cos(2 * jnp.pi * (u - 2 * w)),
        0.4 + 0.3 * jnp.sin(2 * jnp.pi * (5 * u * w + 0.3)),
    ], axis=-1)
    shininess = 5.0 + 60.0 * (0.5 + 0.5 * jnp.sin(2 * jnp.pi * (2 * u + 3 * w)))
    ndl = jnp.clip(l[:, 2], 0.0, 1.0)[:, None]
    ndh = jnp.clip(h[:, 2], 0.0, 1.0)[:, None]
    spec = (ndh ** shininess[:, None])
    return albedo * ndl + 0.8 * spec


def main(argv):
    n_steps = int(argv[1]) if len(argv) > 1 else 1000
    batch = 1 << (int(argv[2]) if len(argv) > 2 else 16)

    model = tcnn.create_from_config(
        6, 3, os.path.join(os.path.dirname(__file__), "..", "configs",
                           "config_btf.json"),
        policy=tcnn.BF16_POLICY)
    state = model.trainer.initial_state()
    print(f"BTF model: n_params={model.trainer.n_params(state)}")

    def sample_fn(key):
        x = jax.random.uniform(key, (batch, 6))
        return x, synthetic_btf(x)

    chunk = min(50, n_steps)
    n_loops = max(n_steps // chunk, 1)
    n_steps = n_loops * chunk            # actual steps run
    loop = model.trainer.make_training_loop(sample_fn, chunk)
    key = jax.random.key(0)
    t0 = time.perf_counter()
    for i in range(n_loops):
        state, losses = loop(state, jax.random.fold_in(key, i))
        if i % 4 == 0:
            jax.block_until_ready(losses)
            print(f"step {(i + 1) * chunk}: loss={float(losses[-1]):.6f}",
                  flush=True)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0

    # Held-out evaluation.
    xe = jax.random.uniform(jax.random.key(99), (1 << 16, 6))
    ye = synthetic_btf(xe)
    pred = model.trainer.inference(state, xe)
    mse = float(jnp.mean((pred - ye) ** 2))
    rel = float(jnp.mean((pred - ye) ** 2 / (ye ** 2 + 0.01)))
    print(f"{n_steps} steps in {dt:.2f}s "
          f"({n_steps * batch / dt:.3e} samples/s) "
          f"held-out MSE={mse:.6f} relL2={rel:.6f}")


if __name__ == "__main__":
    main(sys.argv)
