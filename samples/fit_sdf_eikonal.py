"""SDF fitting with eikonal regularization — the double-backward demo.

Re-creation of the reference's second-order smoke test
(scripts/test_grid_bwdbwd.py:80-102): train HashGrid+MLP to fit the
signed distance field of a sphere with the loss

    L = |f(x_surf)|^2  +  λ · (|∇x f(x)| − 1)^2

whose gradient w.r.t. params flows through ∇x f — i.e. requires
backward-backward through the grid encoding.  Smoothstep interpolation
makes ∇x f continuous (the reference requires the same,
test_grid_bwdbwd.py config).

Usage: python samples/fit_sdf_eikonal.py [n_steps] [batch_pow]
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

import tcnn_tpu as tcnn

CONFIG = {
    "loss": {"otype": "L2"},              # unused: custom loss below
    "optimizer": {"otype": "Adam", "learning_rate": 1e-3},
    "encoding": {"otype": "HashGrid", "n_levels": 8,
                 "n_features_per_level": 2, "log2_hashmap_size": 15,
                 "base_resolution": 4, "per_level_scale": 1.5,
                 "interpolation": "Smoothstep"},
    "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                "n_hidden_layers": 2, "activation": "ReLU",
                "output_activation": "None"},
}

CENTER = jnp.asarray([0.5, 0.5, 0.5])
RADIUS = 0.3


def true_sdf(x):
    return jnp.linalg.norm(x - CENTER, axis=-1) - RADIUS


def main(argv):
    n_steps = int(argv[1]) if len(argv) > 1 else 500
    batch = 1 << (int(argv[2]) if len(argv) > 2 else 14)

    model = tcnn.create_from_config(3, 1, CONFIG, policy=tcnn.Policy())
    net = model.network
    opt = model.optimizer
    params = net.init(jax.random.key(0))
    layout = net.param_layout(params)
    opt_state = opt.init(params, layout)

    def f(p, x):
        return net.apply(p, x)[:, 0]

    def loss_fn(p, key):
        k1, k2 = jax.random.split(key)
        # Surface samples: random directions scaled to the sphere.
        d = jax.random.normal(k1, (batch, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        x_surf = CENTER + RADIUS * d
        surf_loss = jnp.mean(f(p, x_surf) ** 2)

        # Eikonal: |∇x f| == 1 on volume samples (second order w.r.t.
        # params through the input gradient).
        x_vol = jax.random.uniform(k2, (batch, 3), minval=0.05, maxval=0.95)
        # Per-sample input gradients via one reverse pass: f is
        # sample-wise, so ∇x Σ_b f(x_b) rows ARE the per-sample ∇x f
        # (batched equivalent of vmap(grad), ~B× cheaper to compile).
        grad_x = jax.grad(lambda xx: jnp.sum(f(p, xx)))(x_vol)
        grad_norm = jnp.sqrt(jnp.sum(grad_x * grad_x, axis=-1) + 1e-12)
        eik_loss = jnp.mean((grad_norm - 1.0) ** 2)
        return surf_loss + 0.1 * eik_loss, (surf_loss, eik_loss)

    @jax.jit
    def step(params, opt_state, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key)
        opt_state, params = opt.step(opt_state, grads, params)
        return params, opt_state, loss, aux

    key = jax.random.key(1)
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, (sl, el) = step(params, opt_state, sub)
        if i % 50 == 0 or i == n_steps - 1:
            print(f"step {i}: loss={float(loss):.6f} "
                  f"surface={float(sl):.6f} eikonal={float(el):.6f}",
                  flush=True)
    print(f"{n_steps} steps in {time.perf_counter()-t0:.1f}s")

    # Evaluate SDF accuracy near the surface.
    xs = jax.random.uniform(jax.random.key(7), (1 << 14, 3),
                            minval=0.2, maxval=0.8)
    err = jnp.mean(jnp.abs(f(params, xs) - true_sdf(xs)))
    print(f"mean |sdf error| on volume samples: {float(err):.4f}")


if __name__ == "__main__":
    main(sys.argv)
