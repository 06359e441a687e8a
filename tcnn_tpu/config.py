"""JSON config → model factory (≈ include/tiny-cuda-nn/config.h:46-63).

``create_from_config(n_input_dims, n_output_dims, config)`` accepts the
reference's JSON schema (DOCUMENTATION.md) unchanged — the bundled
reference configs (config_hash.json etc.) build and train directly —
and returns a TrainableModel bundle.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Any, Dict, Optional, Union

from .common import Policy
from .losses import Loss
from .module import Encoding, Module, Network
from .models.network_with_input_encoding import NetworkWithInputEncoding
from .optimizers import Optimizer, create_optimizer
from .registry import encodings as _encodings
from .registry import losses as _losses
from .registry import networks as _networks
from .trainer import Trainer

# Import for registration side effects.
from .models.encodings import basic as _basic_encodings  # noqa: F401
from .models.encodings import grid as _grid_encoding  # noqa: F401
from .models.networks import mlp as _mlp  # noqa: F401
from .models.networks import fused_mlp as _fused_mlp  # noqa: F401


def load_config(path_or_json: Union[str, Dict[str, Any]]) -> Dict[str, Any]:
    """Load a JSON config, tolerating // comments like the reference
    sample does (mlp_learning_an_image.cu:151)."""
    if isinstance(path_or_json, dict):
        return path_or_json
    with open(path_or_json) as f:
        text = f.read()
    text = re.sub(r"//[^\n]*", "", text)
    return json.loads(text)


def create_encoding(n_input_dims: int, cfg: Dict[str, Any],
                    policy: Optional[Policy] = None) -> Encoding:
    """≈ create_encoding<T> (src/encoding.cu:132-159); the reference
    defaults a missing otype to OneBlob (encoding.cu:133)."""
    otype = cfg.get("otype", "OneBlob")
    return _encodings.create(otype, n_input_dims, cfg, policy=policy)


def create_network(cfg: Dict[str, Any], n_input_dims: int, n_output_dims: int,
                   policy: Optional[Policy] = None) -> Network:
    """≈ create_network<T> (src/network.cu:97-138)."""
    otype = cfg.get("otype", "MLP")
    return _networks.create(otype, cfg, n_input_dims, n_output_dims,
                            policy=policy)


def create_loss(cfg: Dict[str, Any]) -> Loss:
    """≈ create_loss<T> (src/loss.cu:85-105); default RelativeL2."""
    otype = cfg.get("otype", "RelativeL2")
    return _losses.create(otype, cfg)


def create_network_with_input_encoding(
    n_input_dims: int, n_output_dims: int,
    encoding_cfg: Dict[str, Any], network_cfg: Dict[str, Any],
    policy: Optional[Policy] = None,
) -> NetworkWithInputEncoding:
    enc = create_encoding(n_input_dims, encoding_cfg, policy=policy)
    net = create_network(network_cfg, enc.n_output_dims, n_output_dims,
                         policy=policy)
    return NetworkWithInputEncoding(enc, net, policy=policy)


@dataclasses.dataclass
class TrainableModel:
    """≈ TrainableModel (config.h:46-51)."""
    loss: Loss
    optimizer: Optimizer
    network: Module          # NetworkWithInputEncoding
    trainer: Trainer


def create_from_config(
    n_input_dims: int,
    n_output_dims: int,
    config: Union[str, Dict[str, Any]],
    policy: Optional[Policy] = None,
    seed: int = 1337,
) -> TrainableModel:
    cfg = load_config(config)
    loss = create_loss(cfg.get("loss", {}))
    optimizer = create_optimizer(cfg.get("optimizer", {}))
    model = create_network_with_input_encoding(
        n_input_dims, n_output_dims,
        cfg.get("encoding", {"otype": "Identity"}),
        cfg.get("network", {}),
        policy=policy,
    )
    trainer = Trainer(model, optimizer, loss, seed=seed, policy=policy)
    return TrainableModel(loss=loss, optimizer=optimizer, network=model,
                          trainer=trainer)
