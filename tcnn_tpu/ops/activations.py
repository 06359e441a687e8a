"""Activation functions.

The nine activations of the reference (common_device.h:103-304,
DOCUMENTATION.md "Activation Functions"), implemented as plain jnp maps.
Derivatives come from JAX autodiff — the reference's hand-written
``warp_activation_backward``/``_backward_in`` fragment kernels are a CUDA
artifact; XLA fuses act/act' into the surrounding matmuls by itself.

K_ACT = 10 "zoom" factor for Squareplus/Softplus matches the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import Activation

K_ACT = 10.0


def apply_activation(x: jax.Array, act: Activation) -> jax.Array:
    if act == Activation.NONE:
        return x
    if act == Activation.RELU:
        return jnp.maximum(x, 0)
    if act == Activation.LEAKY_RELU:
        return jnp.maximum(x, 0) + 0.01 * jnp.minimum(x, 0)
    if act == Activation.EXPONENTIAL:
        return jnp.exp(x)
    if act == Activation.SINE:
        return jnp.sin(x)
    if act == Activation.SIGMOID:
        return jax.nn.sigmoid(x)
    if act == Activation.SQUAREPLUS:
        # X = K_ACT*x; 0.5*(X + sqrt(X^2+4))/K_ACT
        xk = x * K_ACT
        return 0.5 * (xk + jnp.sqrt(xk * xk + 4.0)) / K_ACT
    if act == Activation.SOFTPLUS:
        # X = K_ACT*x; log(exp(X)+1)/K_ACT  (numerically stable form)
        return jax.nn.softplus(x * K_ACT) / K_ACT
    if act == Activation.TANH:
        return jnp.tanh(x)
    raise ValueError(f"Unsupported activation: {act}")


def activation_derivative(x: jax.Array, act: Activation) -> jax.Array:
    """d(act)/dx evaluated at pre-activation ``x``.

    Used by explicit-backward code paths (Pallas kernels); everything
    else uses autodiff.
    """
    if act == Activation.NONE:
        return jnp.ones_like(x)
    if act == Activation.RELU:
        return (x > 0).astype(x.dtype)
    if act == Activation.LEAKY_RELU:
        return jnp.where(x > 0, jnp.asarray(1.0, x.dtype), jnp.asarray(0.01, x.dtype))
    if act == Activation.EXPONENTIAL:
        return jnp.exp(x)
    if act == Activation.SINE:
        return jnp.cos(x)
    if act == Activation.SIGMOID:
        s = jax.nn.sigmoid(x)
        return s * (1 - s)
    if act == Activation.SQUAREPLUS:
        xk = x * K_ACT
        return 0.5 * (1.0 + xk / jnp.sqrt(xk * xk + 4.0))
    if act == Activation.SOFTPLUS:
        return jax.nn.sigmoid(x * K_ACT)
    if act == Activation.TANH:
        t = jnp.tanh(x)
        return 1 - t * t
    raise ValueError(f"Unsupported activation: {act}")


def is_invertible(act: Activation) -> bool:
    """Whether act' can be computed from the *output* value alone
    (reference: warp_activation_backward, common_device.h:171-236)."""
    return act in (
        Activation.NONE,
        Activation.RELU,
        Activation.LEAKY_RELU,
        Activation.EXPONENTIAL,
        Activation.SIGMOID,
        Activation.TANH,
    )
