"""NeRF-style radiance field demo — the instant-ngp architecture.

The final SURVEY §7/M5 app: a neural field with the instant-ngp model
split that tiny-cuda-nn powers downstream (README.md lists instant-ngp
as the flagship consumer):

    density net : HashGrid(3-D pos) → FusedMLP → [σ_raw | 15 features]
    color net   : Composite[Identity(features), SH(view dir)] → FusedMLP → RGB

trained by volume-rendering random rays through a synthetic emissive
scene (three colored Gaussian blobs) and regressing the composited
color against an analytically rendered ground truth.  Exercises, in
one app: 3-D hash grids, Composite dim-slicing, SphericalHarmonics,
FusedMLP, a custom rendering loss through `jax.grad`, and the
coarse-to-fine `max_level` schedule (grid.h:69-92 semantics) that
instant-ngp uses during early training.

Usage: python samples/fit_nerf_field.py [n_steps] [batch_pow] [out.jpg]
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

# ---------------------------------------------------------------- scene
# Emission-absorption volume in [0,1]^3: three Gaussian density blobs,
# each with its own emission color.

BLOB_CENTERS = jnp.asarray([[0.35, 0.40, 0.45],
                            [0.62, 0.55, 0.50],
                            [0.50, 0.68, 0.42]])
BLOB_SIGMA = jnp.asarray([0.07, 0.09, 0.06])
BLOB_DENSITY = jnp.asarray([28.0, 22.0, 30.0])
BLOB_COLOR = jnp.asarray([[0.9, 0.25, 0.15],
                          [0.15, 0.7, 0.95],
                          [0.95, 0.85, 0.2]])
BACKGROUND = jnp.asarray([0.03, 0.03, 0.05])


def true_field(x):
    """Analytic (σ, rgb) of the synthetic scene at points x (B,3)."""
    d2 = jnp.sum((x[:, None, :] - BLOB_CENTERS[None]) ** 2, axis=-1)
    w = BLOB_DENSITY * jnp.exp(-0.5 * d2 / BLOB_SIGMA ** 2)  # (B,3blobs)
    sigma = jnp.sum(w, axis=-1)
    rgb = (w @ BLOB_COLOR) / (sigma[:, None] + 1e-8)
    return sigma, rgb


# --------------------------------------------------------------- model

N_FEATURES = 16          # density head: 1 raw sigma + 15 geo features
SH_DEGREE = 4            # 16 view-direction basis functions

DENSITY_CFG = {
    "encoding": {"otype": "HashGrid", "n_levels": 12,
                 "n_features_per_level": 2, "log2_hashmap_size": 17,
                 "base_resolution": 16, "per_level_scale": 1.45},
    "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                "n_hidden_layers": 1, "activation": "ReLU",
                "output_activation": "None"},
}
COLOR_CFG = {
    # instant-ngp's color head: geo features pass through untouched,
    # the view direction (mapped to [0,1]^3) is SH-encoded.
    "encoding": {"otype": "Composite", "nested": [
        {"otype": "Identity", "n_dims_to_encode": N_FEATURES - 1},
        {"otype": "SphericalHarmonics", "degree": SH_DEGREE,
         "n_dims_to_encode": 3},
    ]},
    "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                "n_hidden_layers": 2, "activation": "ReLU",
                "output_activation": "Sigmoid"},
}


def build_model(policy):
    density_net = tcnn.create_network_with_input_encoding(
        3, N_FEATURES, DENSITY_CFG["encoding"], DENSITY_CFG["network"],
        policy=policy)
    color_net = tcnn.create_network_with_input_encoding(
        (N_FEATURES - 1) + 3, 3, COLOR_CFG["encoding"],
        COLOR_CFG["network"], policy=policy)
    return density_net, color_net


def model_field(density_net, color_net, params, x, d, max_level_frac=None):
    """(σ, rgb) of the learned field at points x viewed from dirs d."""
    kw = {}
    if max_level_frac is not None:
        # Coarse-to-fine: per-sample level mask, grid.h:69-92 semantics.
        kw["max_level_per_element"] = jnp.full(
            (x.shape[0],), max_level_frac, jnp.float32)
    h = density_net.apply(params["density"], x, **kw)
    sigma = jax.nn.softplus(h[:, 0].astype(jnp.float32))
    color_in = jnp.concatenate(
        [h[:, 1:].astype(jnp.float32), d * 0.5 + 0.5], axis=-1)
    rgb = color_net.apply(params["color"], color_in).astype(jnp.float32)
    return sigma, rgb


# ----------------------------------------------------------- rendering

T_NEAR, T_FAR = 0.05, 1.8


def render(field_fn, rays_o, rays_d, n_samples, key=None):
    """Quadrature emission-absorption rendering along rays (B,3)."""
    b = rays_o.shape[0]
    t = jnp.linspace(T_NEAR, T_FAR, n_samples + 1)[:-1]
    dt = (T_FAR - T_NEAR) / n_samples
    if key is not None:  # stratified jitter
        t = t + jax.random.uniform(key, (b, n_samples)) * dt
    else:
        t = jnp.broadcast_to(t + 0.5 * dt, (b, n_samples))
    x = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]  # (B,S,3)
    inside = jnp.all((x > 0.0) & (x < 1.0), axis=-1)            # (B,S)
    xq = jnp.clip(x, 1e-6, 1.0 - 1e-6).reshape(-1, 3)
    dq = jnp.broadcast_to(rays_d[:, None, :], x.shape).reshape(-1, 3)
    sigma, rgb = field_fn(xq, dq)
    sigma = (sigma.reshape(b, n_samples) * inside)
    rgb = rgb.reshape(b, n_samples, 3)
    alpha = 1.0 - jnp.exp(-sigma * dt)                           # (B,S)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]),
                             trans[:, :-1]], axis=-1)
    w = alpha * trans                                            # (B,S)
    out = jnp.einsum("bs,bsc->bc", w, rgb)
    return out + trans[:, -1:] * (1.0 - alpha[:, -1:]) * BACKGROUND


def sample_rays(key, batch):
    """Random rays: origins on a radius-1.2 sphere looking at random
    points inside the volume."""
    k1, k2 = jax.random.split(key)
    o = jax.random.normal(k1, (batch, 3))
    o = jnp.asarray([0.5, 0.5, 0.5]) + 1.2 * o / jnp.linalg.norm(
        o, axis=-1, keepdims=True)
    target = jax.random.uniform(k2, (batch, 3), minval=0.25, maxval=0.75)
    d = target - o
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def camera_rays(res, azimuth=0.6, elevation=0.45, radius=1.4, fov=0.55):
    """Pinhole camera orbiting the volume center, for eval renders."""
    center = jnp.asarray([0.5, 0.5, 0.5])
    eye = center + radius * jnp.asarray([
        jnp.cos(elevation) * jnp.cos(azimuth),
        jnp.cos(elevation) * jnp.sin(azimuth),
        jnp.sin(elevation)])
    fwd = (center - eye) / jnp.linalg.norm(center - eye)
    right = jnp.cross(fwd, jnp.asarray([0.0, 0.0, 1.0]))
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)
    px = (jnp.arange(res) + 0.5) / res - 0.5
    u, v = jnp.meshgrid(px, -px, indexing="xy")
    d = (fwd[None, None] + fov * (u[..., None] * right[None, None]
                                  + v[..., None] * up[None, None]))
    d = d.reshape(-1, 3)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(eye, d.shape)
    return o, d


# ------------------------------------------------------------ training

def main(argv):
    n_steps = int(argv[1]) if len(argv) > 1 else 400
    batch = 1 << (int(argv[2]) if len(argv) > 2 else 12)
    out_path = argv[3] if len(argv) > 3 else None
    n_samples = int(os.environ.get("NERF_SAMPLES", 48))
    res = int(os.environ.get("NERF_EVAL_RES", 128))

    policy = tcnn.BF16_POLICY if jax.devices()[0].platform == "tpu" \
        else tcnn.Policy()
    density_net, color_net = build_model(policy)
    k0, k1 = jax.random.split(jax.random.key(0))
    params = {"density": density_net.init(k0), "color": color_net.init(k1)}
    layout = {"density": density_net.param_layout(params["density"]),
              "color": color_net.param_layout(params["color"])}
    opt = tcnn.create_optimizer({"otype": "Adam", "learning_rate": 5e-3,
                                 "epsilon": 1e-9})
    opt_state = opt.init(params, layout)

    def loss_fn(p, key, max_level_frac):
        ko, kt = jax.random.split(key)
        rays_o, rays_d = sample_rays(ko, batch)
        gt = render(lambda x, d: true_field(x), rays_o, rays_d,
                    n_samples, key=None)
        pred = render(
            lambda x, d: model_field(density_net, color_net, p, x, d,
                                     max_level_frac=max_level_frac),
            rays_o, rays_d, n_samples, key=kt)
        return jnp.mean((pred - gt) ** 2)

    @jax.jit
    def train_step(p, opt_state, key, max_level_frac):
        loss, grads = jax.value_and_grad(loss_fn)(p, key, max_level_frac)
        opt_state, p = opt.step(opt_state, grads, p)
        return p, opt_state, loss

    key = jax.random.key(42)
    warm = min(n_steps // 4, 100)  # coarse-to-fine ramp length
    t0 = time.perf_counter()
    for i in range(n_steps):
        # instant-ngp-style coarse-to-fine: unlock grid levels linearly
        # over the warmup window (static after warm → one compiled step).
        frac = min((i + 1) / max(warm, 1), 1.0) if i < warm else 1.0
        params, opt_state, loss = train_step(
            params, opt_state, jax.random.fold_in(key, i),
            jnp.float32(frac))
        if i % max(n_steps // 10, 1) == 0 or i == n_steps - 1:
            print(f"step {i:5d}  loss {float(loss):.6f}  "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # Eval: render a held-out camera, PSNR vs the analytic render.
    rays_o, rays_d = camera_rays(res)

    @jax.jit
    def render_pred(p, o, d):
        return render(lambda x, vd: model_field(density_net, color_net,
                                                p, x, vd), o, d, n_samples)

    @jax.jit
    def render_gt(o, d):
        return render(lambda x, vd: true_field(x), o, d, n_samples * 2)

    chunk = 1 << 14
    pred, gt = [], []
    for s in range(0, rays_o.shape[0], chunk):
        pred.append(render_pred(params, rays_o[s:s + chunk],
                                rays_d[s:s + chunk]))
        gt.append(render_gt(rays_o[s:s + chunk], rays_d[s:s + chunk]))
    pred = jnp.concatenate(pred).reshape(res, res, 3)
    gt = jnp.concatenate(gt).reshape(res, res, 3)
    mse = float(jnp.mean((pred - gt) ** 2))
    from tcnn_tpu.utils.image import mse2psnr, write_image
    print(f"eval PSNR {mse2psnr(mse):.2f} dB  (mse {mse:.6f})")
    if out_path:
        import numpy as np
        write_image(out_path, np.asarray(
            jnp.concatenate([gt, pred], axis=1)))
        print(f"wrote {out_path} (left: ground truth, right: learned)")
    return mse


if __name__ == "__main__":
    main(sys.argv)
