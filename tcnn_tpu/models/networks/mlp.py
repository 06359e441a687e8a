"""MLP network — the general, XLA-compiled matmul chain.

TPU counterpart of the reference's CutlassMLP (src/cutlass_mlp.cu,
networks/cutlass_mlp.h): a bias-free layer chain

    h_0 = act(x W_0);  h_i = act(h_{i-1} W_i);  y = out_act(h_n W_out)

expressed as jnp matmuls under jit.  Where the CUDA version needs a
GEMM library with hand-fused activation epilogues and split-k wgrad
GEMMs on side streams (cutlass_matmul.h:126-263), XLA fuses the
activation into the matmul and schedules the backward GEMMs itself —
this file is intentionally just math.  The Pallas FusedMLP
(networks/fused_mlp.py) is the performance path for the 16..128-wide
regime; this class is the arbitrary-width fallback and the ground truth
the fused kernel is tested against.

Weight convention: batch-major activations (B, D); W_i has shape
(fan_in, fan_out).  Like the reference, there are NO biases.

n_hidden_layers semantics match the reference (cutlass_mlp.cu:46-67):
the total number of matmuls is n_hidden_layers + 1; n_hidden_layers=0
degenerates to a single input→output matmul.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ...common import Activation, Policy
from ...module import Network
from ...ops.activations import apply_activation
from ...registry import register_network


def xavier_uniform(key, fan_in: int, fan_out: int, scale: float = 1.0,
                   dtype=jnp.float32) -> jax.Array:
    """U(±scale·√(6/(fan_in+fan_out))) (gpu_matrix.h:284-299)."""
    a = scale * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -a, a)


def siren_uniform(key, fan_in: int, fan_out: int, scale: float = 1.0,
                  first: bool = False, dtype=jnp.float32) -> jax.Array:
    """SIREN init (gpu_matrix.h:335-370): U(±scale·√(6/fan_in)); the
    first layer uses U(±scale·30/fan_in) per https://vsitzmann.github.io/siren/."""
    a = scale * (30.0 / fan_in if first else math.sqrt(6.0 / fan_in))
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -a, a)


class MLP(Network):
    def __init__(
        self,
        n_input_dims: int,
        n_output_dims: int,
        n_neurons: int = 128,
        n_hidden_layers: int = 5,
        activation: Activation = Activation.RELU,
        output_activation: Activation = Activation.NONE,
        policy: Optional[Policy] = None,
        otype: str = "MLP",
    ):
        super().__init__(policy)
        self.n_input_dims = n_input_dims
        self.n_output_dims = n_output_dims
        self.n_neurons = int(n_neurons)
        self._n_hidden_layers = int(n_hidden_layers)
        self.activation = activation
        self.output_activation = output_activation
        self.otype = otype

    # layer dims: [in] + [W]*(H-? ) ... total matmuls = H+1 (H>=1),
    # or 1 matmul if H == 0.
    def _layer_dims(self) -> List[tuple]:
        H, W = self._n_hidden_layers, self.n_neurons
        if H == 0:
            return [(self.n_input_dims, self.n_output_dims)]
        dims = [(self.n_input_dims, W)]
        dims += [(W, W)] * (H - 1)
        dims += [(W, self.n_output_dims)]
        return dims

    @property
    def width(self) -> int:
        return self.n_neurons

    @property
    def n_hidden_layers(self) -> int:
        return self._n_hidden_layers

    def init(self, key):
        dims = self._layer_dims()
        keys = jax.random.split(key, len(dims))
        ws = []
        for i, ((fi, fo), k) in enumerate(zip(dims, keys)):
            if self.activation == Activation.SINE:
                ws.append(siren_uniform(k, fi, fo, first=(i == 0),
                                        dtype=self.policy.param_dtype))
            else:
                ws.append(xavier_uniform(k, fi, fo, dtype=self.policy.param_dtype))
        return {"layers": ws}

    def param_layout(self, params):
        return {"layers": ["matrix"] * len(params["layers"])}

    def apply(self, params, x):
        ws = params["layers"]
        cdt = self.policy.compute_dtype
        h = x.astype(cdt)
        for w in ws[:-1]:
            h = jnp.dot(h, w.astype(cdt), preferred_element_type=jnp.float32)
            h = apply_activation(h, self.activation).astype(cdt)
        y = jnp.dot(h, ws[-1].astype(cdt), preferred_element_type=jnp.float32)
        y = apply_activation(y, self.output_activation)
        return y.astype(self.policy.output_dtype)

    def hyperparams(self) -> Dict[str, Any]:
        return {
            "otype": self.otype,
            "activation": self.activation.value,
            "output_activation": self.output_activation.value,
            "n_neurons": self.n_neurons,
            "n_hidden_layers": self._n_hidden_layers,
        }


def make_mlp(cfg: Dict[str, Any], n_input_dims: int, n_output_dims: int,
             policy: Optional[Policy] = None, otype: str = "MLP") -> MLP:
    return MLP(
        n_input_dims=n_input_dims,
        n_output_dims=n_output_dims,
        n_neurons=cfg.get("n_neurons", 128),
        n_hidden_layers=cfg.get("n_hidden_layers", 5),
        activation=Activation.from_string(cfg.get("activation", "ReLU")),
        output_activation=Activation.from_string(
            cfg.get("output_activation", "None")),
        policy=policy,
        otype=otype,
    )


# "CutlassMLP" accepted for config compatibility; it is the same XLA
# matmul chain here (there is no CUTLASS on TPU, nor a need for it).
register_network(
    ["MLP", "CutlassMLP"],
    lambda cfg, n_in, n_out, policy=None: make_mlp(cfg, n_in, n_out, policy))
