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


def trim(error, skip: float = 1e-6):
    """Mean of the error array with the extreme ``skip`` fraction of
    values dropped from each tail (common.py:93-97)."""
    err = np.sort(np.asarray(error).ravel())
    k = int(skip * err.size)
    return err[k:err.size - k].mean()


def luminance(a):
    """Rec.709 luma of a gamma-1/2.2-encoded copy (common.py:99-101)."""
    a = np.maximum(0, np.asarray(a)) ** 0.4545454545
    return (0.2126 * a[..., 0] + 0.7152 * a[..., 1] + 0.0722 * a[..., 2])
