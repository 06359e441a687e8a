"""Snapshot EXPORT in the reference format (round-2 verdict item 7):
export → import round-trips bit-exactly for params and Adam state, in
both nlohmann on-disk forms.  A committed reference-format fixture
lives at tests/fixtures/ref_snapshot.json."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tcnn
from tcnn_tpu.utils import cuda_export, cuda_import

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ref_snapshot.json")


def _model():
    return tcnn.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 3,
                     "n_features_per_level": 2, "log2_hashmap_size": 8,
                     "base_resolution": 4, "per_level_scale": 2.0},
        "network": {"otype": "MLP", "n_neurons": 16, "n_hidden_layers": 2},
    })


def _trained_state(model, n=3):
    tr = model.trainer
    state = tr.initial_state()
    key = jax.random.key(0)
    for i in range(n):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        x = jax.random.uniform(k1, (256, 2))
        t = jax.random.uniform(k2, (256, 3))
        state, _ = tr.training_step(state, x, t)
    return state


def _assert_state_equal(a, b, exact=True):
    la = jax.tree_util.tree_leaves(a.params)
    lb = jax.tree_util.tree_leaves(b.params)
    for x, y in zip(la, lb):
        if exact:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-3, atol=1e-4)
    for key in ("mu", "nu", "param_steps"):
        xa = jax.tree_util.tree_leaves(a.opt_state[key])
        xb = jax.tree_util.tree_leaves(b.opt_state[key])
        for x, y in zip(xa, xb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestExportRoundtrip:
    def test_json_roundtrip_bit_exact(self, tmp_path):
        model = _model()
        state = _trained_state(model)
        data = cuda_export.export_snapshot(model.trainer, state,
                                           serialize_optimizer=True)
        path = tmp_path / "snap.json"
        cuda_export.save_snapshot(path, data, form="json")
        state2 = cuda_import.import_trainer_state(model.trainer, str(path))
        _assert_state_equal(state, state2, exact=True)
        assert int(state2.opt_state["step"]) == int(state.opt_state["step"])

    def test_msgpack_roundtrip(self, tmp_path):
        pytest.importorskip("msgpack")
        model = _model()
        state = _trained_state(model)
        data = cuda_export.export_snapshot(model.trainer, state,
                                           serialize_optimizer=True)
        path = tmp_path / "snap.msgpack"
        cuda_export.save_snapshot(path, data, form="msgpack")
        state2 = cuda_import.import_trainer_state(model.trainer, str(path))
        _assert_state_equal(state, state2, exact=True)

    def test_half_precision_export(self, tmp_path):
        model = _model()
        state = _trained_state(model)
        data = cuda_export.export_snapshot(model.trainer, state,
                                           params_type="__half")
        path = tmp_path / "snap_hp.json"
        cuda_export.save_snapshot(path, data, form="json")
        p2 = cuda_import.import_params(model.trainer.model, str(path))
        _assert_state_equal(
            type(state)(params=p2, opt_state=state.opt_state,
                        step=state.step),
            state, exact=False)

    def test_padding_is_zero(self):
        """The reference re-inserts 16-wide alignment padding; exported
        padded columns must be zero so the strict importer accepts the
        file (and a CUDA-side consumer sees an identical function)."""
        model = _model()
        state = _trained_state(model)
        data = cuda_export.export_snapshot(model.trainer, state)
        flat = np.frombuffer(data["params_binary"], "<f4")
        net = model.trainer.model.network
        rows, cols = cuda_import._ref_matrix_dims(net)[0]
        m0 = flat[:rows * cols].reshape(rows, cols)
        assert cols >= 16 and np.abs(m0[:, net.n_input_dims:]).max() == 0

    def test_committed_fixture_imports(self):
        """The committed reference-format fixture stays loadable (guards
        the on-disk format against drift)."""
        model = _model()
        state2 = cuda_import.import_trainer_state(model.trainer, FIXTURE)
        assert int(state2.opt_state["step"]) == 3
        with open(FIXTURE) as f:
            raw = json.load(f)
        assert raw["params_type"] == "float"
        assert isinstance(raw["params_binary"], dict)
        assert raw["params_binary"].get("subtype", "x") is None


class TestLargeStepCounters:
    def test_param_steps_above_2pow24_exact(self, tmp_path):
        """u32 step counters must survive export bit-exactly — an f32
        intermediate would round 2^24+1 to 2^24 (long-training resume
        would then debias with wrong per-param steps)."""
        model = _model()
        state = _trained_state(model)
        big = jax.tree_util.tree_map(
            lambda s: jnp.full_like(s, np.uint32((1 << 24) + 1)),
            state.opt_state["param_steps"])
        state.opt_state["param_steps"] = big
        data = cuda_export.export_snapshot(model.trainer, state,
                                           serialize_optimizer=True)
        ps = np.frombuffer(data["optimizer"]["param_steps_binary"],
                           dtype="<u4")
        assert (ps[ps != 0] == (1 << 24) + 1).all()
        path = tmp_path / "snap.json"
        cuda_export.save_snapshot(path, data, form="json")
        state2 = cuda_import.import_trainer_state(model.trainer, str(path))
        for leaf in jax.tree_util.tree_leaves(
                state2.opt_state["param_steps"]):
            arr = np.asarray(leaf)
            assert (arr[arr != 0] == (1 << 24) + 1).all()


class TestNonGridAndWrappedExport:
    def test_paramless_encoding_exports_network_only(self):
        """Frequency/OneBlob encodings have no params ({} tree): the
        exported buffer is just the padded network matrices."""
        model = tcnn.create_from_config(2, 3, {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
            "encoding": {"otype": "Frequency", "n_frequencies": 4},
            "network": {"otype": "MLP", "n_neurons": 16,
                        "n_hidden_layers": 1},
        })
        state = model.trainer.initial_state()
        data = cuda_export.export_snapshot(model.trainer, state)
        n = np.frombuffer(data["params_binary"], dtype="<f4").size
        assert data["n_params"] == n > 0

    def test_composite_encoding_exports(self):
        model = tcnn.create_from_config(4, 3, {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
            "encoding": {"otype": "Composite", "nested": [
                {"otype": "HashGrid", "n_levels": 2,
                 "n_features_per_level": 2, "log2_hashmap_size": 7,
                 "base_resolution": 4, "n_dims_to_encode": 2},
                {"otype": "OneBlob", "n_bins": 4, "n_dims_to_encode": 2},
            ]},
            "network": {"otype": "MLP", "n_neurons": 16,
                        "n_hidden_layers": 1},
        })
        state = model.trainer.initial_state()
        data = cuda_export.export_snapshot(model.trainer, state)
        assert data["n_params"] > 0

    def test_wrapper_optimizer_unwraps_to_adam(self, tmp_path):
        """EMA-wrapped Adam (a standard reference config) exports its
        nested Adam moments instead of refusing."""
        model = tcnn.create_from_config(2, 3, {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {"otype": "EMA", "decay": 0.99,
                          "nested": {"otype": "Adam",
                                     "learning_rate": 3e-3}},
            "encoding": {"otype": "HashGrid", "n_levels": 3,
                         "n_features_per_level": 2,
                         "log2_hashmap_size": 8, "base_resolution": 4,
                         "per_level_scale": 2.0},
            "network": {"otype": "MLP", "n_neurons": 16,
                        "n_hidden_layers": 1},
        })
        state = _trained_state(model)
        data = cuda_export.export_snapshot(model.trainer, state,
                                           serialize_optimizer=True)
        assert data["optimizer"]["base_learning_rate"] == \
            pytest.approx(3e-3)
        mu = np.frombuffer(data["optimizer"]["first_moments_binary"],
                           dtype="<f4")
        ours = np.concatenate([
            np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(
                state.opt_state["nested"]["mu"])])
        # Same nonzero mass (layouts differ by matrix padding).
        assert mu.size >= ours.size
        np.testing.assert_allclose(np.sort(np.abs(mu[mu != 0])),
                                   np.sort(np.abs(ours[ours != 0])),
                                   rtol=1e-6)

    def test_default_form_is_msgpack(self, tmp_path):
        model = _model()
        state = _trained_state(model, n=1)
        data = cuda_export.export_snapshot(model.trainer, state)
        path = tmp_path / "snap.msgpack"
        cuda_export.save_snapshot(path, data)   # default form
        import msgpack
        with open(path, "rb") as f:
            loaded = msgpack.unpackb(f.read(), raw=False)
        assert isinstance(loaded["params_binary"], bytes), \
            "default form must keep binary values native (CUDA-loadable)"
