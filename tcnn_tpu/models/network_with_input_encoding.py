"""Encoding ∘ Network composition (network_with_input_encoding.h:41-190).

The reference composes the two modules with an intermediate buffer in
the encoding's preferred layout and aligns the encoding's padded output
to the network's minimum alignment; under XLA the intermediate is just
a value and the network consumes the encoding's exact width, so the
whole alignment dance disappears (kernels that want lane-aligned widths
pad internally).

Parameters are the dict {"encoding": ..., "network": ...}.  The
reference packs a flat [network params][encoding params] buffer
(network_with_input_encoding.h:115-130); here the pytree keeps the two
groups named.  Note that the canonical (alphabetical) leaf order is
encoding-first — Composite optimizers using ``n_params_to_optimize``
offsets follow that pytree order, while kind-based selection
("matrix"/"other") is order-independent and preferred.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

from ..common import Policy
from ..module import Encoding, Module, Network


class NetworkWithInputEncoding(Module):
    def __init__(self, encoding: Encoding, network: Network,
                 policy: Optional[Policy] = None):
        super().__init__(policy or network.policy)
        if network.n_input_dims != encoding.n_output_dims:
            raise ValueError(
                f"network n_input_dims ({network.n_input_dims}) must equal "
                f"encoding n_output_dims ({encoding.n_output_dims})")
        self.encoding = encoding
        self.network = network
        self.n_input_dims = encoding.n_input_dims
        self.n_output_dims = network.n_output_dims

    def init(self, key):
        k_enc, k_net = jax.random.split(key)
        return {
            "encoding": self.encoding.init(k_enc),
            "network": self.network.init(k_net),
        }

    def param_layout(self, params):
        return {
            "encoding": self.encoding.param_layout(params["encoding"]),
            "network": self.network.param_layout(params["network"]),
        }

    def grid_specs(self, prefix: tuple = ()) -> dict:
        return self.encoding.grid_specs(prefix + ("encoding",))

    @property
    def _use_soa(self) -> bool:
        # SoA (feature-major) hand-off — the encoding's preferred layout
        # flows straight into the network kernel, exactly the
        # preferred_output_layout negotiation of the reference
        # (network_with_input_encoding.h:70-81), minus the transpose
        # kernel the reference needs for AoS consumers.
        return (getattr(self.encoding, "prefers_soa", False)
                and getattr(self.network, "accepts_soa_input", False))

    @property
    def supports_soa_output(self) -> bool:
        """True when apply(..., output_soa=True) can return (D_out, B)
        feature-major predictions — the layout the trainer's loss path
        consumes at full lane occupancy."""
        return getattr(self.network, "supports_soa_output", False)

    def apply(self, params, x, output_soa: bool = False, **enc_kwargs):
        # Extra keyword args flow to the encoding — the reference
        # drives per-encoding runtime knobs (e.g. the per-element
        # max_level array, grid.h:69-92) through the composed model the
        # same way (network_with_input_encoding.h:70-81 passes the
        # forward context straight into the nested encoding).
        net_kwargs = ({"output_soa": True}
                      if output_soa and self.supports_soa_output else {})
        if self._use_soa:
            feats = self.encoding.apply(params["encoding"], x, soa=True,
                                        **enc_kwargs)
            y = self.network.apply(params["network"], feats,
                                   input_soa=True, **net_kwargs)
        else:
            feats = self.encoding.apply(params["encoding"], x, **enc_kwargs)
            y = self.network.apply(params["network"], feats, **net_kwargs)
        if output_soa and not net_kwargs:
            y = y.T
        return y

    def inference(self, params, x, output_soa: bool = False, **enc_kwargs):
        net_kwargs = ({"output_soa": True}
                      if output_soa and self.supports_soa_output else {})
        if self._use_soa:
            feats = self.encoding.inference(params["encoding"], x, soa=True,
                                            **enc_kwargs)
            y = self.network.inference(params["network"], feats,
                                       input_soa=True, **net_kwargs)
        else:
            feats = self.encoding.inference(params["encoding"], x,
                                            **enc_kwargs)
            y = self.network.inference(params["network"], feats,
                                       **net_kwargs)
        if output_soa and not net_kwargs:
            y = y.T
        return y

    def hyperparams(self) -> Dict[str, Any]:
        return {
            "otype": "NetworkWithInputEncoding",
            "encoding": self.encoding.hyperparams(),
            "network": self.network.hyperparams(),
        }
