"""Config-space integration fuzz: random-but-deterministic factory
configs must build, train, infer, and checkpoint without error.

Spirit of the reference's stress scripts (scripts/test_random_input.py
— randomized shapes through the full stack); here the randomness spans
the CONFIG space: every encoding x network x loss x optimizer-wrapper
combination the JSON factory accepts.
"""

import itertools
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tcnn_tpu as tcnn

ENCODINGS = [
    {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
     "log2_hashmap_size": 7, "base_resolution": 2, "per_level_scale": 2.0},
    {"otype": "DenseGrid", "n_levels": 3, "n_features_per_level": 1,
     "base_resolution": 3, "per_level_scale": 1.5,
     "interpolation": "Smoothstep"},
    {"otype": "OneBlob", "n_bins": 8},
    {"otype": "Frequency", "n_frequencies": 6},
    {"otype": "TriangleWave", "n_frequencies": 5},
    {"otype": "Identity", "scale": 2.0, "offset": -0.5},
    {"otype": "Composite", "nested": [
        {"n_dims_to_encode": 1, "otype": "OneBlob", "n_bins": 4},
        {"otype": "Identity"}]},
]

NETWORKS = [
    {"otype": "FullyFusedMLP", "n_neurons": 16, "n_hidden_layers": 1,
     "activation": "ReLU", "output_activation": "None"},
    {"otype": "CutlassMLP", "n_neurons": 24, "n_hidden_layers": 2,
     "activation": "Squareplus", "output_activation": "Sigmoid"},
    {"otype": "MLP", "n_neurons": 32, "n_hidden_layers": 0,
     "activation": "Sine", "output_activation": "None"},
]

LOSSES = ["RelativeL2", "L1", "MAPE", "SMAPE", "L2",
          "RelativeL2Luminance"]

OPTIMIZERS = [
    {"otype": "Adam", "learning_rate": 1e-2},
    {"otype": "Novograd", "learning_rate": 1e-2},
    {"otype": "SGD", "learning_rate": 1e-3, "l2_reg": 0.0},
    {"otype": "EMA", "decay": 0.9,
     "nested": {"otype": "Adam", "learning_rate": 1e-2}},
    {"otype": "ExponentialDecay", "decay_base": 0.5, "decay_start": 1,
     "decay_interval": 2, "decay_end": 100,
     "nested": {"otype": "Lookahead", "alpha": 0.5, "n_steps": 2,
                "nested": {"otype": "Adam", "learning_rate": 1e-2}}},
    {"otype": "Batched", "batch_size_multiplier": 2,
     "nested": {"otype": "Average", "n_samples": 3,
                "nested": {"otype": "SGD", "learning_rate": 1e-3}}},
]


def _cases():
    """Deterministic pseudo-random sample of the cross product."""
    rng = np.random.RandomState(1234)
    combos = list(itertools.product(
        range(len(ENCODINGS)), range(len(NETWORKS)),
        range(len(LOSSES)), range(len(OPTIMIZERS))))
    idx = rng.choice(len(combos), size=14, replace=False)
    return [combos[i] for i in sorted(idx)]


@pytest.mark.parametrize("ei,ni,li,oi", _cases())
def test_random_config_end_to_end(ei, ni, li, oi):
    cfg = {
        "loss": {"otype": LOSSES[li]},
        "optimizer": OPTIMIZERS[oi],
        "encoding": ENCODINGS[ei],
        "network": NETWORKS[ni],
    }
    n_in, n_out, b = 2, 3, 256
    model = tcnn.create_from_config(n_in, n_out, cfg)
    state = model.trainer.initial_state()
    key = jax.random.key(ei * 1000 + ni * 100 + li * 10 + oi)
    x = jax.random.uniform(jax.random.fold_in(key, 0), (b, n_in))
    y = jax.random.uniform(jax.random.fold_in(key, 1), (b, n_out))
    losses = []
    for i in range(4):
        state, loss = model.trainer.training_step(state, x, y)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), (cfg, losses)
    pred = model.trainer.inference(state, x)
    assert pred.shape == (b, n_out)
    assert bool(jnp.isfinite(pred).all())
    # checkpoint round-trip preserves inference exactly
    blob = model.trainer.serialize(state)
    blob = json.loads(json.dumps(blob))  # must be JSON-serializable
    state2 = model.trainer.deserialize(blob)
    pred2 = model.trainer.inference(state2, x)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred2))
