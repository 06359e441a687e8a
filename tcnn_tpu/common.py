"""Common definitions: enums, dtype policy, constants.

TPU-native rebuild of the reference's ``common.h`` vocabulary
(reference: include/tiny-cuda-nn/common.h:99-340).  Only the *concepts*
survive — enums for activations/grid types/interpolation, and a mixed
precision policy.  The reference's fp16 loss-scaling machinery
(common.h:229-233, static loss scale of 128) is intentionally dropped:
on TPU we compute in bfloat16 (same exponent range as fp32) and
accumulate matmuls in fp32 on the MXU, so gradients never underflow the
way fp16 CUDA gradients do.  ``loss_scale`` is kept as an API knob
(default 1.0) for bit-compat experiments only.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax.numpy as jnp

# Batch-size granularity of the reference (common.h:235).  We do not
# *require* it (XLA handles ragged batches fine), but benchmarks and the
# fused Pallas kernels prefer batches that are multiples of this.
BATCH_SIZE_GRANULARITY = 256

# Hash primes of the reference's grid hashes (common_device.h:646-664).
PRIME_HASH_FACTORS = (
    1958374283, 2654435761, 805459861, 3674653429,
    2097192037, 1434869437, 2165219737,
)
COHERENT_PRIME_HASH_FACTORS = (
    1, 2654435761, 805459861, 3674653429,
    2097192037, 1434869437, 2165219737,
)
REVERSED_PRIME_HASH_FACTORS = tuple(reversed(PRIME_HASH_FACTORS))

MAX_N_GRID_LEVELS = 128  # grid_interface.h:84


class Activation(enum.Enum):
    NONE = "None"
    RELU = "ReLU"
    LEAKY_RELU = "LeakyReLU"
    EXPONENTIAL = "Exponential"
    SINE = "Sine"
    SIGMOID = "Sigmoid"
    SQUAREPLUS = "Squareplus"
    SOFTPLUS = "Softplus"
    TANH = "Tanh"

    @classmethod
    def from_string(cls, s: str) -> "Activation":
        for a in cls:
            if a.value.lower() == s.lower():
                return a
        raise ValueError(f"Invalid activation name: {s}")


class GridType(enum.Enum):
    HASH = "Hash"
    DENSE = "Dense"
    TILED = "Tiled"

    @classmethod
    def from_string(cls, s: str) -> "GridType":
        for a in cls:
            if a.value.lower() == s.lower():
                return a
        raise ValueError(f"Invalid grid type: {s}")


class HashType(enum.Enum):
    PRIME = "Prime"
    COHERENT_PRIME = "CoherentPrime"
    REVERSED_PRIME = "ReversedPrime"
    RNG = "Rng"
    # TPU-native extension (not in the reference): like CoherentPrime
    # (factor 1 on dim 0) but dim 0 is ADDED after the XOR of the other
    # dims, so the two interpolation corners along dim 0 always land on
    # ADJACENT table rows.  That adjacency lets the grid kernels fetch
    # and scatter corner PAIRS (one memory transaction for two
    # corners), halving the per-update work that dominates the training
    # step on TPU.  Statistically equivalent to CoherentPrime (uniform,
    # coherent along dim 0); convergence parity is pinned by the golden
    # image-fit artifact.
    COHERENT_ADD = "CoherentAdd"

    @classmethod
    def from_string(cls, s: str) -> "HashType":
        for a in cls:
            if a.value.lower() == s.lower():
                return a
        raise ValueError(f"Invalid hash type: {s}")


class InterpolationType(enum.Enum):
    NEAREST = "Nearest"
    LINEAR = "Linear"
    SMOOTHSTEP = "Smoothstep"

    @classmethod
    def from_string(cls, s: str) -> "InterpolationType":
        for a in cls:
            if a.value.lower() == s.lower():
                return a
        raise ValueError(f"Invalid interpolation type: {s}")


class ReductionType(enum.Enum):
    CONCATENATION = "Concatenation"
    SUM = "Sum"
    PRODUCT = "Product"

    @classmethod
    def from_string(cls, s: str) -> "ReductionType":
        for a in cls:
            if a.value.lower() == s.lower():
                return a
        raise ValueError(f"Invalid reduction type: {s}")


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy.

    Replaces the reference's ``network_precision_t`` compile-time choice
    (common.h:99-124): parameters are kept as fp32 masters; compute is
    done in ``compute_dtype`` (bf16 on TPU for MXU throughput, fp32 for
    parity testing); outputs surfaced to the user are ``output_dtype``.
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


# Global defaults; f32 keeps unit tests exact.  Benchmarks/pipelines pass
# an explicit bf16-compute policy.
DEFAULT_POLICY = Policy()
BF16_POLICY = Policy(compute_dtype=jnp.bfloat16)


def default_policy() -> Policy:
    return DEFAULT_POLICY


def next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
