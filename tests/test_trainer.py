"""Trainer + config + checkpoint tests, including the golden image-fit
convergence smoke test (SURVEY.md §4: the image sample doubles as the
regression test in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tcnn
from tcnn_tpu.utils import metrics, serialization
from tcnn_tpu.utils.image import ImageSampler, synthetic_image


def small_hash_config(network_otype="MLP"):
    return {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {"otype": "HashGrid", "n_levels": 8,
                     "n_features_per_level": 2, "log2_hashmap_size": 12,
                     "base_resolution": 8, "per_level_scale": 1.5},
        "network": {"otype": network_otype, "n_neurons": 32,
                    "n_hidden_layers": 2, "activation": "ReLU",
                    "output_activation": "None"},
    }


class TestConfigFactory:
    def test_bundled_configs_build(self):
        for path in ["configs/config_hash.json", "configs/config_oneblob.json",
                     "configs/config_btf.json"]:
            n_in = 6 if "btf" in path else 2
            model = tcnn.create_from_config(n_in, 3, path)
            st = model.trainer.initial_state()
            x = jax.random.uniform(jax.random.key(0), (128, n_in))
            y = model.trainer.forward(st, x)
            assert y.shape == (128, 3)

    def test_comment_tolerant_json(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text('{\n// a comment\n"loss": {"otype": "L2"}\n}')
        cfg = tcnn.load_config(str(p))
        assert cfg["loss"]["otype"] == "L2"

    def test_trainable_model_bundle(self):
        m = tcnn.create_from_config(2, 3, small_hash_config())
        assert isinstance(m.loss, tcnn.RelativeL2Loss)
        assert isinstance(m.optimizer, tcnn.Adam)
        assert isinstance(m.network, tcnn.NetworkWithInputEncoding)
        assert isinstance(m.trainer, tcnn.Trainer)


class TestTraining:
    def test_loss_decreases_on_image_fit(self):
        img = synthetic_image(64, 64)
        sampler = ImageSampler(img)
        model = tcnn.create_from_config(2, 3, small_hash_config())
        state = model.trainer.initial_state()
        key = jax.random.key(0)
        losses = []
        for i in range(100):
            key, sub = jax.random.split(key)
            xy, rgb = sampler.sample_batch(sub, 1024)
            state, loss = model.trainer.training_step(state, xy, rgb)
            losses.append(float(loss))
        assert losses[-1] < 0.2 * losses[0]

    def test_image_fit_reaches_reasonable_psnr(self):
        """Golden-task regression: tiny image, 300 steps, PSNR floor."""
        img = synthetic_image(32, 32, seed=3)
        sampler = ImageSampler(img)
        model = tcnn.create_from_config(2, 3, small_hash_config())
        state = model.trainer.initial_state()
        key = jax.random.key(1)
        for i in range(300):
            key, sub = jax.random.split(key)
            xy, rgb = sampler.sample_batch(sub, 2048)
            state, _ = model.trainer.training_step(state, xy, rgb)
        coords = sampler.full_grid_coords()
        pred = model.trainer.inference(state, coords)
        ref = sampler.image.reshape(-1, 3)
        p = metrics.psnr(np.asarray(pred), np.asarray(ref))
        assert p > 20.0, f"PSNR {p:.2f} too low"

    def test_per_sample_pdf(self):
        model = tcnn.create_from_config(2, 3, small_hash_config())
        state = model.trainer.initial_state()
        x = jax.random.uniform(jax.random.key(2), (256, 2))
        t = jax.random.uniform(jax.random.key(3), (256, 3))
        pdf = jnp.full((256, 3), 2.0)
        state, loss_w = model.trainer.training_step(state, x, t, pdf)
        assert np.isfinite(float(loss_w))

    def test_step_counter(self):
        model = tcnn.create_from_config(2, 3, small_hash_config())
        state = model.trainer.initial_state()
        x = jax.random.uniform(jax.random.key(4), (64, 2))
        t = jax.random.uniform(jax.random.key(5), (64, 3))
        for _ in range(3):
            state, _ = model.trainer.training_step(state, x, t)
        assert int(state.step) == 3

    def test_ema_inference_uses_custom_weights(self):
        cfg = small_hash_config()
        cfg["optimizer"] = {"otype": "EMA", "decay": 0.95,
                            "nested": {"otype": "Adam",
                                       "learning_rate": 1e-2}}
        model = tcnn.create_from_config(2, 3, cfg)
        state = model.trainer.initial_state()
        x = jax.random.uniform(jax.random.key(6), (256, 2))
        t = jax.random.uniform(jax.random.key(7), (256, 3))
        for _ in range(5):
            state, _ = model.trainer.training_step(state, x, t)
        y_train = np.asarray(model.trainer.forward(state, x))
        y_inf = np.asarray(model.trainer.inference(state, x))
        assert not np.allclose(y_train, y_inf)


class TestSerialization:
    def test_roundtrip(self, tmp_path):
        model = tcnn.create_from_config(2, 3, small_hash_config())
        state = model.trainer.initial_state()
        x = jax.random.uniform(jax.random.key(8), (128, 2))
        t = jax.random.uniform(jax.random.key(9), (128, 3))
        for _ in range(3):
            state, _ = model.trainer.training_step(state, x, t)
        data = model.trainer.serialize(state)
        path = str(tmp_path / "ckpt.json")
        serialization.save(path, data)

        model2 = tcnn.create_from_config(2, 3, small_hash_config())
        state2 = model2.trainer.deserialize(serialization.load(path))
        np.testing.assert_allclose(
            np.asarray(model.trainer.forward(state, x)),
            np.asarray(model2.trainer.forward(state2, x)), rtol=1e-6)
        # Optimizer state must also resume identically.
        s1, l1 = model.trainer.training_step(state, x, t)
        s2, l2 = model2.trainer.training_step(state2, x, t)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    def test_without_optimizer_state(self):
        model = tcnn.create_from_config(2, 3, small_hash_config())
        state = model.trainer.initial_state()
        data = model.trainer.serialize(state, serialize_optimizer=False)
        assert "optimizer" not in data
        state2 = model.trainer.deserialize(data)
        assert int(state2.step) == 0

    def test_shape_mismatch_raises(self):
        model = tcnn.create_from_config(2, 3, small_hash_config())
        state = model.trainer.initial_state()
        data = model.trainer.serialize(state)
        other = tcnn.create_from_config(2, 4, small_hash_config())
        with pytest.raises(ValueError):
            other.trainer.deserialize(data)


class TestModuleAPI:
    """Parity with the reference's explicit differentiation API
    (object.h:121-374)."""

    def test_forward_backward(self):
        model = tcnn.create_from_config(2, 3, small_hash_config()).network
        params = model.init(jax.random.key(10))
        x = jax.random.uniform(jax.random.key(11), (32, 2))
        y, ctx = model.forward(params, x)
        dL_dy = jnp.ones_like(y)
        dparams, dx = model.backward(ctx, dL_dy)
        assert dx.shape == x.shape
        g = jax.grad(lambda p: jnp.sum(model.apply(p, x)))(params)
        for a, b in zip(jax.tree_util.tree_leaves(dparams),
                        jax.tree_util.tree_leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_input_gradient_one_hot_probe(self):
        enc = tcnn.FrequencyEncoding(2, 2)
        x = jax.random.uniform(jax.random.key(12), (4, 2))
        g = enc.input_gradient({}, x, dim=0)
        # dim 0 is sin(πx_0): d/dx_0 = π·cos(πx_0), d/dx_1 = 0.
        np.testing.assert_allclose(
            np.asarray(g[:, 0]),
            np.asarray(jnp.pi * jnp.cos(jnp.pi * x[:, 0])), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g[:, 1]), 0.0, atol=1e-6)


class TestRuntimeHyperparams:
    """≈ trainer.h:213-224 update_hyperparams + trainer.h:114-123
    output perturbation."""

    def test_update_learning_rate_takes_effect(self):
        m = tcnn.create_from_config(2, 3, small_hash_config())
        st = m.trainer.initial_state()
        x = jax.random.uniform(jax.random.key(0), (256, 2))
        t = jax.random.uniform(jax.random.key(1), (256, 3))
        st, _ = m.trainer.training_step(st, x, t)

        m.trainer.update_hyperparams(
            {"optimizer": {"otype": "Adam", "learning_rate": 0.0}})
        assert m.optimizer.learning_rate == 0.0
        # Materialize before stepping: training_step donates the state.
        p_before = [np.asarray(p) for p in jax.tree_util.tree_leaves(st.params)]
        st2, _ = m.trainer.training_step(st, x, t)
        p_after = jax.tree_util.tree_leaves(st2.params)
        for a, b in zip(p_before, p_after):
            np.testing.assert_allclose(a, np.asarray(b))

    def test_unknown_key_rejected(self):
        m = tcnn.create_from_config(2, 3, small_hash_config())
        with pytest.raises(NotImplementedError):
            m.trainer.update_hyperparams({"optimizer": {"bogus": 1}})

    def test_wrapper_forwards_nested(self):
        cfg = small_hash_config()
        cfg["optimizer"] = {"otype": "ExponentialDecay",
                            "decay_start": 100, "decay_interval": 100,
                            "decay_base": 0.5,
                            "nested": {"otype": "Adam", "learning_rate": 1e-2}}
        m = tcnn.create_from_config(2, 3, cfg)
        m.trainer.update_hyperparams(
            {"optimizer": {"nested": {"learning_rate": 3e-3}}})
        assert abs(m.optimizer.nested(0).learning_rate - 3e-3) < 1e-12

    def test_output_perturbation_dithers_loss(self):
        cfg = small_hash_config()
        m = tcnn.create_from_config(2, 3, cfg)
        m.trainer.perturbation_sigma = 0.1
        m.trainer.invalidate_jit_cache()
        st = m.trainer.initial_state()
        x = jax.random.uniform(jax.random.key(0), (256, 2))
        t = jax.random.uniform(jax.random.key(1), (256, 3))
        # Same state/batch but different step counters -> different
        # noise.  training_step donates the state, so evaluate the loss
        # undonated instead.
        l1 = m.trainer.loss_value_and_grads(st.params, x, t, step=st.step)[0]
        l2 = m.trainer.loss_value_and_grads(st.params, x, t,
                                            step=st.step + 7)[0]
        assert float(l1) != float(l2)
        # And training still converges with dithering on.
        st2 = m.trainer.initial_state()
        losses = []
        for i in range(30):
            k = jax.random.fold_in(jax.random.key(5), i)
            xb = jax.random.uniform(k, (512, 2))
            tb = jnp.concatenate([xb, xb[:, :1]], axis=1)
            st2, loss = m.trainer.training_step(st2, xb, tb)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
