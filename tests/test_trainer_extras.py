"""Round-2 trainer surface: external output-gradient training
(trainer.h:97-123), the public sharding-aware step factory, and the
multi-host launch helpers."""

import jax
import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tcnn
from tcnn_tpu.parallel import DataParallel
from tcnn_tpu.parallel.launch import (initialize_distributed,
                                      shard_host_local_batch)


def _model():
    return tcnn.create_from_config(2, 3, {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "n_features_per_level": 2, "log2_hashmap_size": 8,
                     "base_resolution": 4, "per_level_scale": 1.5},
        "network": {"otype": "MLP", "n_neurons": 16, "n_hidden_layers": 1},
    })


class TestExternalDLDy:
    def test_matches_loss_driven_step(self):
        """Feeding d(L2 mean)/dy externally must reproduce the
        loss-driven step's parameter update exactly."""
        m1, m2 = _model(), _model()
        s1 = m1.trainer.initial_state()
        s2 = m2.trainer.initial_state()
        x = jax.random.uniform(jax.random.key(1), (128, 2))
        t = jax.random.uniform(jax.random.key(2), (128, 3))

        s1, _ = m1.trainer.training_step(s1, x, t)

        pred = m2.trainer.forward(s2, x)
        dL_dy = 2.0 * (pred - t) / t.size  # d(mean L2)/dy
        s2, pred_out = m2.trainer.training_step_external_dL_dy(s2, x, dL_dy)

        assert pred_out.shape == (128, 3)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_returns_prediction(self):
        m = _model()
        s = m.trainer.initial_state()
        x = jax.random.uniform(jax.random.key(3), (64, 2))
        dy = jnp.zeros((64, 3))
        want = np.asarray(m.trainer.forward(s, x))  # before donation
        s2, pred = m.trainer.training_step_external_dL_dy(s, x, dy)
        np.testing.assert_allclose(np.asarray(pred), want,
                                   rtol=1e-5, atol=1e-6)
        assert int(s2.step) == 1


class TestMakeTrainingStep:
    def test_plain_step_matches_training_step(self):
        m1, m2 = _model(), _model()
        s1 = m1.trainer.initial_state()
        s2 = m2.trainer.initial_state()
        step = m2.trainer.make_training_step()
        x = jax.random.uniform(jax.random.key(4), (128, 2))
        t = jax.random.uniform(jax.random.key(5), (128, 3))
        s1, l1 = m1.trainer.training_step(s1, x, t)
        s2, l2 = step(s2, x, t)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    def test_with_pdf(self):
        m = _model()
        s = m.trainer.initial_state()
        step = m.trainer.make_training_step(with_pdf=True)
        x = jax.random.uniform(jax.random.key(6), (128, 2))
        t = jax.random.uniform(jax.random.key(7), (128, 3))
        pdf = jnp.full((128, 1), 1.0)
        s, loss = step(s, x, t, pdf)
        assert np.isfinite(float(loss))

    def test_dp_with_pdf(self):
        m = _model()
        dp = DataParallel()
        s = dp.replicate(m.trainer.initial_state())
        step = dp.make_training_step(m.trainer, with_pdf=True)
        b = 64 * dp.n_devices
        x = dp.shard_batch(jax.random.uniform(jax.random.key(8), (b, 2)))
        t = dp.shard_batch(jax.random.uniform(jax.random.key(9), (b, 3)))
        pdf = dp.shard_batch(jnp.full((b, 1), 1.0))
        s, loss = step(s, x, t, pdf)
        assert np.isfinite(float(loss))


class TestLaunchHelpers:
    def test_initialize_single_process_noop(self):
        initialize_distributed(num_processes=1)  # must not raise

    def test_shard_host_local_batch(self):
        dp = DataParallel()
        b = 16 * dp.n_devices
        (x,) = shard_host_local_batch(
            dp, np.random.RandomState(0).rand(b, 2).astype(np.float32))
        assert x.shape == (b, 2)
        assert x.sharding == dp.batch_sharding
