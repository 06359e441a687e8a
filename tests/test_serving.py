"""AOT serving bundles (tcnn_tpu.serving): export → load → serve
parity, batch bucketing, and custom-weights baking.

The reference's serving surface is the C++ API facade (cpp_api.h:86-111,
a full-framework dependency); here the serving unit is a serialized
jax.export artifact callable without any model code."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tcnn
from tcnn_tpu import serving


def _model(optimizer=None):
    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": optimizer or {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "n_features_per_level": 2, "log2_hashmap_size": 10,
                     "base_resolution": 4, "per_level_scale": 1.5},
        "network": {"otype": "MLP", "n_neurons": 32, "n_hidden_layers": 2},
    }
    return tcnn.create_from_config(2, 3, cfg)


def _trained_state(model, steps=3):
    state = model.trainer.initial_state()
    key = jax.random.key(0)
    for i in range(steps):
        key, k1, k2 = jax.random.split(key, 3)
        x = jax.random.uniform(k1, (512, 2))
        t = jax.random.uniform(k2, (512, 3))
        state, _ = model.trainer.training_step(state, x, t)
    return state


class TestServing:
    def test_roundtrip_parity_and_bucketing(self, tmp_path):
        model = _model()
        state = _trained_state(model)
        path = tmp_path / "model.tcnnz"
        serving.export_inference(model.trainer, state, str(path),
                                 batch_sizes=(256, 1024))
        srv = serving.load_inference(str(path))
        assert srv.batch_sizes == [256, 1024]
        assert (srv.n_input_dims, srv.n_output_dims) == (2, 3)
        # off-bucket batch sizes pad+slice; on-bucket exact
        for b in (100, 256, 700, 1024):
            x = jax.random.uniform(jax.random.key(b), (b, 2))
            y = srv(x)
            y_ref = model.trainer.inference(state, x)
            assert y.shape == (b, 3)
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                       rtol=1e-5, atol=1e-6)

    def test_bytes_roundtrip_no_file(self):
        model = _model()
        state = _trained_state(model, steps=1)
        data = serving.export_inference(model.trainer, state,
                                        batch_sizes=(256,))
        assert isinstance(data, bytes)
        srv = serving.load_inference(data)
        x = jax.random.uniform(jax.random.key(1), (256, 2))
        np.testing.assert_allclose(
            np.asarray(srv(x)),
            np.asarray(model.trainer.inference(state, x)),
            rtol=1e-5, atol=1e-6)

    def test_oversized_batch_raises(self):
        model = _model()
        state = _trained_state(model, steps=1)
        srv = serving.load_inference(serving.export_inference(
            model.trainer, state, batch_sizes=(256,)))
        with pytest.raises(ValueError, match="largest exported bucket"):
            srv(jnp.zeros((300, 2)))
        with pytest.raises(ValueError, match="expected"):
            srv(jnp.zeros((256, 5)))

    def test_custom_weights_baked(self):
        """EMA custom weights (trainer.h:329-333) must be what the
        bundle serves, not the raw fast params."""
        model = _model(optimizer={
            "otype": "EMA", "decay": 0.5,
            "nested": {"otype": "Adam", "learning_rate": 1e-2}})
        state = _trained_state(model, steps=4)
        srv = serving.load_inference(serving.export_inference(
            model.trainer, state, batch_sizes=(256,)))
        x = jax.random.uniform(jax.random.key(2), (256, 2))
        y_ema = model.trainer.inference(state, x)     # uses custom weights
        y_raw = model.trainer.forward(state, x)       # raw params
        np.testing.assert_allclose(np.asarray(srv(x)), np.asarray(y_ema),
                                   rtol=1e-5, atol=1e-6)
        assert not np.allclose(np.asarray(y_ema), np.asarray(y_raw),
                               rtol=1e-5, atol=1e-6)

    def test_default_buckets(self):
        assert serving.default_buckets(1 << 18, 1 << 14) == (
            1 << 14, 1 << 15, 1 << 16, 1 << 17, 1 << 18)
        assert serving.default_buckets(300, 256) == (256, 512)
        with pytest.raises(ValueError, match="min_batch"):
            serving.default_buckets(1024, 0)     # would loop forever
        with pytest.raises(ValueError, match="min_batch"):
            serving.default_buckets(1024, -2)
        with pytest.raises(ValueError, match="max_batch"):
            serving.default_buckets(0)

    def test_truncated_bundle_rejected_at_load(self):
        """meta lists a bucket whose artifact is missing → clear
        load-time error, not a KeyError at request time."""
        import io
        import json
        import zipfile

        model = _model()
        state = model.trainer.initial_state()
        blob = serving.export_inference(model.trainer, state,
                                        batch_sizes=(64, 256))
        src = io.BytesIO(blob)
        out = io.BytesIO()
        with zipfile.ZipFile(src) as zin, \
                zipfile.ZipFile(out, "w") as zout:
            for name in zin.namelist():
                if name != "batch_256.jaxexport":
                    zout.writestr(name, zin.read(name))
        with pytest.raises(ValueError, match="missing artifacts"):
            serving.load_inference(out.getvalue())


class TestTrainStepExport:
    """AOT-exported TRAINING step (round-5: the jax.export analog of
    the reference's install-time AOT build, CMakeLists.txt:261-263) —
    loadable with no model code, numerically identical to the live
    jitted step."""

    def _model(self):
        import tcnn_tpu as tcnn

        return tcnn.create_from_config(2, 3, {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {"otype": "Adam", "learning_rate": 0.01},
            "encoding": {"otype": "HashGrid", "n_levels": 4,
                         "log2_hashmap_size": 8, "base_resolution": 4},
            "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                        "n_hidden_layers": 2},
        })

    def test_export_load_matches_live_step(self, tmp_path):
        from tcnn_tpu.serving import export_train_step, load_train_step

        model = self._model()
        tr = model.trainer
        state = tr.initial_state()
        b = 512
        p = str(tmp_path / "train_step.jaxexport")
        export_train_step(tr, state, b, p)
        step = load_train_step(p)

        x = jax.random.uniform(jax.random.key(1), (b, 2))
        t = jax.random.uniform(jax.random.key(2), (b, 3))
        s_live, l_live = tr.training_step(tr.initial_state(), x, t)
        s_aot, l_aot = step(tr.initial_state(), x, t)
        np.testing.assert_allclose(float(l_aot), float(l_live), rtol=1e-6)
        for a, bb in zip(jax.tree_util.tree_leaves(s_aot.params),
                         jax.tree_util.tree_leaves(s_live.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(bb, np.float32),
                                       rtol=1e-5, atol=1e-6)

    def test_multi_step_training_progresses(self):
        from tcnn_tpu.serving import export_train_step, load_train_step

        model = self._model()
        tr = model.trainer
        state = tr.initial_state()
        b = 512
        step = load_train_step(export_train_step(tr, state, b))
        x = jax.random.uniform(jax.random.key(1), (b, 2))
        t = jax.random.uniform(jax.random.key(2), (b, 3))
        losses = []
        for _ in range(20):
            state, loss = step(state, x, t)
            losses.append(float(loss))
        assert losses[-1] < 0.3 * losses[0]
