"""tcnn_tpu — a TPU-native tiny-neural-network framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of
tiny-cuda-nn (reference: mandyxmq/NeuralBTF-tiny-cuda-nn): tiny MLPs
with trainable input encodings (multiresolution hash grids, one-blob,
frequency, spherical harmonics, ...), config-driven model assembly,
ten losses, ten optimizers, mixed precision, full first- and
second-order differentiation, and data-parallel scaling over TPU
meshes.

Quick start (mirrors the reference's README usage):

    import tcnn_tpu as tcnn
    model = tcnn.create_from_config(n_input_dims=2, n_output_dims=3,
                                    config="configs/config_hash.json")
    state = model.trainer.initial_state()
    state, loss = model.trainer.training_step(state, xs, targets)
    rgb = model.trainer.inference(state, xs)
"""

from .common import (Activation, BATCH_SIZE_GRANULARITY, GridType, HashType,
                     InterpolationType, Policy, ReductionType, BF16_POLICY,
                     DEFAULT_POLICY)
from .module import Encoding, Module, Network
from .losses import (ConstantGradientLoss, CrossEntropyLoss, L1Loss, L2Loss,
                     Loss, MapeLoss, RelativeL1Loss, RelativeL2Loss,
                     RelativeL2LuminanceLoss, SmapeLoss, VarianceLoss)
from .optimizers import (Adam, Average, Batched, Composite, EMA,
                         ExponentialDecay, Lookahead, Novograd, Optimizer,
                         SGD, create_optimizer)
from .models.encodings.basic import (CompositeEncoding, EmptyEncoding,
                                     FrequencyEncoding, IdentityEncoding,
                                     OneBlobEncoding,
                                     SphericalHarmonicsEncoding,
                                     TriangleWaveEncoding)
from .models.encodings.grid import GridEncoding
from .models.networks.mlp import MLP
from .models.networks.fused_mlp import FusedMLP
from .models.network_with_input_encoding import NetworkWithInputEncoding
from .trainer import Trainer, TrainerState
from .config import (TrainableModel, create_encoding, create_from_config,
                     create_loss, create_network,
                     create_network_with_input_encoding, load_config)
from . import serving
from .registry import (register_encoding, register_loss, register_network,
                       register_optimizer)

__version__ = "0.1.0"

__all__ = [
    "Activation", "Adam", "Average", "BATCH_SIZE_GRANULARITY", "BF16_POLICY",
    "Batched", "Composite", "CompositeEncoding", "ConstantGradientLoss",
    "CrossEntropyLoss", "DEFAULT_POLICY", "EMA", "EmptyEncoding", "Encoding",
    "ExponentialDecay", "FrequencyEncoding", "FusedMLP", "GridEncoding",
    "GridType", "HashType", "IdentityEncoding", "InterpolationType", "L1Loss",
    "L2Loss", "Lookahead", "Loss", "MLP", "MapeLoss", "Module", "Network",
    "NetworkWithInputEncoding", "Novograd", "OneBlobEncoding", "Optimizer",
    "Policy", "ReductionType", "RelativeL1Loss", "RelativeL2Loss",
    "RelativeL2LuminanceLoss", "SGD", "SmapeLoss",
    "SphericalHarmonicsEncoding", "Trainer", "TrainerState",
    "TrainableModel", "TriangleWaveEncoding", "VarianceLoss",
    "create_encoding", "create_from_config", "create_loss", "create_network",
    "create_network_with_input_encoding", "create_optimizer", "load_config",
    "register_encoding", "register_loss", "register_network",
    "register_optimizer",
]
