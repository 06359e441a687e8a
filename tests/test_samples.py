"""Smoke tests for the sample apps (SURVEY §7 M5).

The image-fitting sample is covered by the golden-convergence test;
here the remaining field apps get fast end-to-end runs asserting the
training losses actually fall — the JAX analog of the reference's
sample-as-regression-test strategy (SURVEY §4 item 4).
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import pytest

SAMPLES = os.path.join(os.path.dirname(__file__), "..", "samples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SAMPLES, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestNerfFieldSample:
    def test_short_training_reduces_loss(self):
        nf = _load("fit_nerf_field")
        import tcnn_tpu as tcnn

        density_net, color_net = nf.build_model(tcnn.Policy())
        k0, k1 = jax.random.split(jax.random.key(0))
        params = {"density": density_net.init(k0),
                  "color": color_net.init(k1)}
        layout = {"density": density_net.param_layout(params["density"]),
                  "color": color_net.param_layout(params["color"])}
        opt = tcnn.create_optimizer(
            {"otype": "Adam", "learning_rate": 5e-3})
        opt_state = opt.init(params, layout)
        batch, n_samples = 256, 8

        def loss_fn(p, key, frac):
            ko, kt = jax.random.split(key)
            rays_o, rays_d = nf.sample_rays(ko, batch)
            gt = nf.render(lambda x, d: nf.true_field(x), rays_o, rays_d,
                           n_samples)
            pred = nf.render(
                lambda x, d: nf.model_field(density_net, color_net, p, x,
                                            d, max_level_frac=frac),
                rays_o, rays_d, n_samples, key=kt)
            return jnp.mean((pred - gt) ** 2)

        @jax.jit
        def step(p, s, key, frac):
            loss, grads = jax.value_and_grad(loss_fn)(p, key, frac)
            s, p = opt.step(s, grads, p)
            return p, s, loss

        key = jax.random.key(7)
        losses = []
        for i in range(80):
            frac = jnp.float32(min((i + 1) / 10, 1.0))
            params, opt_state, loss = step(
                params, opt_state, jax.random.fold_in(key, i), frac)
            losses.append(float(loss))
        # Windowed comparison: per-step losses are noisy at batch 256.
        head = sum(losses[:10]) / 10
        tail = sum(losses[-10:]) / 10
        assert tail < 0.6 * head, (head, tail)

    def test_render_shapes_and_range(self):
        nf = _load("fit_nerf_field")
        rays_o, rays_d = nf.camera_rays(8)
        assert rays_o.shape == (64, 3) and rays_d.shape == (64, 3)
        img = nf.render(lambda x, d: nf.true_field(x), rays_o, rays_d, 16)
        assert img.shape == (64, 3)
        assert bool(jnp.all(jnp.isfinite(img)))
        assert float(img.min()) >= 0.0 and float(img.max()) <= 1.5


class TestEncKwargsThroughComposedModel:
    def test_max_level_per_element_forwards(self):
        # NWIE.apply(**enc_kwargs) must reach the grid encoding —
        # per-element masking at frac=0 (only level 0 live) must differ
        # from the unmasked output, and inference must accept it too.
        import tcnn_tpu as tcnn
        net = tcnn.create_network_with_input_encoding(
            3, 4,
            {"otype": "HashGrid", "n_levels": 4,
             "n_features_per_level": 2, "log2_hashmap_size": 10,
             "base_resolution": 4, "per_level_scale": 1.6},
            {"otype": "MLP", "n_neurons": 16, "n_hidden_layers": 1},
            policy=tcnn.Policy())
        params = net.init(jax.random.key(0))
        x = jax.random.uniform(jax.random.key(1), (32, 3))
        frac0 = jnp.zeros((32,), jnp.float32)
        y_masked = net.apply(params, x, max_level_per_element=frac0)
        y_full = net.apply(params, x)
        assert y_masked.shape == y_full.shape
        assert not bool(jnp.allclose(y_masked, y_full))
        y_inf = net.inference(params, x, max_level_per_element=frac0)
        assert bool(jnp.allclose(y_masked, y_inf, atol=1e-5))
