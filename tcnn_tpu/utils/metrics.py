"""Error metrics (scripts/common.py:32-149 equivalents)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def L1(img, ref):
    return jnp.abs(img - ref)


def APE(img, ref):  # absolute percentage error
    return L1(img, ref) / (1e-2 + jnp.abs(ref))


def SAPE(img, ref):  # symmetric APE
    return L1(img, ref) / (1e-2 + (jnp.abs(ref) + jnp.abs(img)) / 2)


def MSE(img, ref):
    return (img - ref) ** 2


def RSE(img, ref):  # relative squared error
    return MSE(img, ref) / (1e-2 + ref * ref)


def MAE(img, ref):
    return float(jnp.mean(L1(img, ref)))


def MAPE(img, ref):
    return float(jnp.mean(APE(img, ref)))


def SMAPE(img, ref):
    return float(jnp.mean(SAPE(img, ref)))


def mean_MSE(img, ref):
    return float(jnp.mean(MSE(img, ref)))


def MRSE(img, ref):
    return float(jnp.mean(RSE(img, ref)))


def mse2psnr(mse: float) -> float:
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def psnr(img, ref) -> float:
    return mse2psnr(mean_MSE(img, ref))
