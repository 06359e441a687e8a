"""CUDA-snapshot importer tests (SURVEY §5: keep a JSON-binary import
path so CUDA-produced snapshots can be cross-checked).

A reference-format snapshot is synthesized byte-for-byte per
trainer.h:275-315 / gpu_memory_json.h:37-72 / adam.h:278-299 —
row-major (out, in) padded weight matrices followed by the grid table —
and imported; inference through the imported params must match the
same math computed directly from the source matrices.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tcnn
from tcnn_tpu.utils import cuda_import


def _as_nlohmann_binary(arr: np.ndarray):
    return {"bytes": [int(b) for b in arr.tobytes()], "subtype": None}


def _make_model():
    return tcnn.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "n_features_per_level": 2, "log2_hashmap_size": 8,
                     "base_resolution": 4, "per_level_scale": 2.0},
        "network": {"otype": "MLP", "n_neurons": 16, "n_hidden_layers": 2,
                    "activation": "ReLU", "output_activation": "None"},
    })


def _synth_snapshot(model, rs, params_type="float", with_optimizer=False):
    """Reference param buffer: [W0 (16, 16-padded-in=16) RM][W1 (16,16)]
    [W2 (16-padded-out, 16)][grid]."""
    net = model.network.network
    enc = model.network.encoding
    in_pad = cuda_import.next_multiple(net.n_input_dims, 16)
    out_pad = cuda_import.next_multiple(net.n_output_dims, 16)
    w = net.n_neurons

    m0 = rs.randn(w, in_pad).astype(np.float32)
    m0[:, net.n_input_dims:] = 0.0  # padding columns zero
    m1 = rs.randn(w, w).astype(np.float32)
    m2 = rs.randn(out_pad, w).astype(np.float32)
    grid = (rs.randn(enc.n_params()) * 1e-2).astype(np.float32)

    flat = np.concatenate([m0.ravel(), m1.ravel(), m2.ravel(), grid])
    if params_type == "__half":
        payload = flat.astype(np.float16)
    else:
        payload = flat
    data = {
        "n_params": int(flat.size),
        "params_type": params_type,
        "params_binary": _as_nlohmann_binary(payload),
    }
    if with_optimizer:
        data["optimizer"] = {
            "current_step": 7,
            "base_learning_rate": 1e-2,
            "first_moments_binary": _as_nlohmann_binary(
                np.arange(flat.size, dtype=np.float32)),
            "second_moments_binary": _as_nlohmann_binary(
                np.ones(flat.size, np.float32)),
            "param_steps_binary": _as_nlohmann_binary(
                np.full(flat.size, 7, np.uint32)),
        }
    return data, (m0, m1, m2, grid)


class TestImportParams:
    def test_inference_matches_source_matrices(self):
        model = _make_model()
        rs = np.random.RandomState(0)
        snap, (m0, m1, m2, grid) = _synth_snapshot(model, rs)

        params = cuda_import.import_params(model.network, snap)
        x = jax.random.uniform(jax.random.key(1), (32, 2))
        y = np.asarray(model.network.apply(params, x).astype(jnp.float32))

        # Ground truth straight from the reference matrices.
        enc = model.network.encoding
        feats = np.asarray(enc.apply(
            {"grid": jnp.asarray(grid)}, x).astype(jnp.float32))
        h = np.maximum(feats @ m0[:, :feats.shape[1]].T, 0)
        h = np.maximum(h @ m1.T, 0)
        want = (h @ m2.T)[:, :3]
        np.testing.assert_allclose(y, want, rtol=2e-2, atol=2e-2)

    def test_half_precision_snapshot(self):
        model = _make_model()
        rs = np.random.RandomState(1)
        snap, _ = _synth_snapshot(model, rs, params_type="__half")
        params = cuda_import.import_params(model.network, snap)
        n = sum(np.asarray(l).size
                for l in jax.tree_util.tree_leaves(params))
        assert n == model.network.n_params(params)

    def test_json_text_roundtrip(self):
        model = _make_model()
        rs = np.random.RandomState(2)
        snap, _ = _synth_snapshot(model, rs)
        params_direct = cuda_import.import_params(model.network, snap)
        params_text = cuda_import.import_params(
            model.network, json.dumps(snap).encode("utf-8"))
        for a, b in zip(jax.tree_util.tree_leaves(params_direct),
                        jax.tree_util.tree_leaves(params_text)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_nonzero_padding_rejected(self):
        model = _make_model()
        rs = np.random.RandomState(3)
        snap, _ = _synth_snapshot(model, rs)
        # HashGrid output 8 == our input width, so padding columns only
        # exist when in_pad > n_input_dims; force one nonzero byte in a
        # padded column if there is padding, else skip.
        net = model.network.network
        in_pad = cuda_import.next_multiple(net.n_input_dims, 16)
        if in_pad == net.n_input_dims:
            return
        flat = cuda_import._binary_to_np(snap["params_binary"], np.float32)
        flat = flat.copy()
        flat[net.n_input_dims] = 1.0  # row 0, first padded column
        snap["params_binary"] = _as_nlohmann_binary(flat)
        try:
            cuda_import.import_params(model.network, snap)
        except ValueError as e:
            assert "padded" in str(e)
        else:
            raise AssertionError("expected ValueError")

    def test_optimizer_state_import(self):
        model = _make_model()
        rs = np.random.RandomState(4)
        snap, _ = _synth_snapshot(model, rs, with_optimizer=True)
        state = cuda_import.import_trainer_state(model.trainer, snap)
        os_ = state.opt_state
        assert int(os_["step"]) == 7
        # nu was all-ones; every imported leaf must be ones.
        for leaf in jax.tree_util.tree_leaves(os_["nu"]):
            assert float(jnp.min(leaf)) == 1.0 and float(jnp.max(leaf)) == 1.0
        for leaf in jax.tree_util.tree_leaves(os_["param_steps"]):
            assert int(leaf.ravel()[0]) == 7
        # Training continues from the imported state.
        x = jax.random.uniform(jax.random.key(5), (256, 2))
        t = jax.random.uniform(jax.random.key(6), (256, 3))
        state2, loss = model.trainer.training_step(state, x, t)
        assert np.isfinite(float(loss))
