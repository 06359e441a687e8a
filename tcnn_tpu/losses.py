"""Losses.

The reference's ten losses (src/loss.cu:57-65 + losses/constant.h), each
a per-element map producing ``values`` (already divided by the total
element count, so the scalar loss is just their sum) and an explicit
prediction gradient (losses/l2.h:40-75 et al.).

Here each loss is a pure function

    values = loss.values(prediction, target, pdf)   # (B, D) fp32
    scalar = loss(prediction, target, pdf)          # = values.sum()

whose *autodiff* gradient equals the reference's hand-written gradient.
Where the reference's gradient deliberately deviates from the true
derivative — relative losses treat their normalizer as a constant
(e.g. relative_l2.h:74 differentiates diff²/(pred²+ε) only through
``diff``) — we wrap the normalizer in ``stop_gradient`` so jax.grad
reproduces the reference semantics exactly.

The reference's fp16 loss_scale=128 protocol (common.h:229-233) is
unnecessary with bf16/fp32 compute and is not replicated; a
``loss_scale`` argument exists on the Trainer for experimentation only.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .registry import register_loss

_sg = jax.lax.stop_gradient


class Loss:
    """Base class. Subclasses implement elementwise(prediction, target, pdf)."""

    # True when elementwise() treats every element identically, i.e.
    # the loss value is invariant to the (B, D) vs feature-major (D, B)
    # layout of prediction/target.  The trainer's fast path feeds such
    # losses SoA predictions straight from the fused MLP kernel (full
    # lane occupancy); channel-mixing losses (luminance) and per-dim
    # broadcasts keep the AoS path.
    channel_agnostic = True

    def elementwise(self, prediction, target, pdf):
        raise NotImplementedError

    def values(self, prediction, target, pdf: Optional[jax.Array] = None):
        """Per-element loss values, pre-divided by n_total = B·D
        (matching l2.h:63-71: values[i] sums to the scalar loss)."""
        prediction = prediction.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if pdf is None:
            pdf = jnp.ones_like(target)
        n_total = prediction.shape[0] * prediction.shape[1]
        return self.elementwise(prediction, target, pdf) / n_total

    def __call__(self, prediction, target, pdf: Optional[jax.Array] = None):
        with jax.named_scope("tcnn_loss"):
            return jnp.sum(self.values(prediction, target, pdf))

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": type(self).__name__.replace("Loss", "")}

    def update_hyperparams(self, cfg: Dict[str, Any]) -> None:
        """Losses are stateless in the reference too; only reject
        attempts to change anything (≈ Object::update_hyperparams)."""
        cfg = {k: v for k, v in cfg.items() if k.lower() != "otype"}
        if cfg:
            raise NotImplementedError(
                f"{type(self).__name__} cannot update {list(cfg)}")


class L2Loss(Loss):
    """diff²/pdf (l2.h:40-75)."""

    def elementwise(self, prediction, target, pdf):
        diff = prediction - target
        return diff * diff / pdf


class RelativeL2Loss(Loss):
    """diff²/(sg(pred)²+0.01)/pdf (relative_l2.h:67-74)."""

    def elementwise(self, prediction, target, pdf):
        diff = prediction - target
        denom = _sg(prediction) ** 2 + 0.01
        return diff * diff / denom / pdf


class RelativeL2LuminanceLoss(Loss):
    """Normalized by luminance of the prediction
    (relative_l2_luminance.h:39-90).  Expects RGB predictions; for
    dims ≥ 6 the twin-RGB pair (e.g. diffuse+specular) is summed before
    taking the luminance, exactly like the reference.
    """

    channel_agnostic = False          # mixes RGB channels along dim 1

    def elementwise(self, prediction, target, pdf):
        r, g, b = prediction[:, 0], prediction[:, 1], prediction[:, 2]
        if prediction.shape[1] >= 6:
            r = r + prediction[:, 3]
            g = g + prediction[:, 4]
            b = b + prediction[:, 5]
        lum = 0.299 * r + 0.587 * g + 0.114 * b
        denom = _sg(lum) ** 2 + 0.01
        diff = prediction - target
        return diff * diff / denom[:, None] / pdf


class L1Loss(Loss):
    """|diff|/pdf (l1.h:71)."""

    def elementwise(self, prediction, target, pdf):
        return jnp.abs(prediction - target) / pdf


class RelativeL1Loss(Loss):
    """|diff|/(sg(|pred|)+1e-2)/pdf (relative_l1.h:71-73)."""

    def elementwise(self, prediction, target, pdf):
        denom = _sg(jnp.abs(prediction)) + 1e-2
        return jnp.abs(prediction - target) / denom / pdf


class MapeLoss(Loss):
    """|diff|/(|target|+1e-2)/pdf (mape.h:72-74)."""

    def elementwise(self, prediction, target, pdf):
        return jnp.abs(prediction - target) / (jnp.abs(target) + 1e-2) / pdf


class SmapeLoss(Loss):
    """|diff|/(sg(½(|pred|+|target|))+1e-2)/pdf (smape.h:72-74)."""

    def elementwise(self, prediction, target, pdf):
        denom = _sg(0.5 * (jnp.abs(prediction) + jnp.abs(target))) + 1e-2
        return jnp.abs(prediction - target) / denom / pdf


class CrossEntropyLoss(Loss):
    """−target·log(pred)/pdf; prediction must be a PDF
    (cross_entropy.h:69-73)."""

    def elementwise(self, prediction, target, pdf):
        return -target * jnp.log(prediction) / pdf


class VarianceLoss(Loss):
    """Importance-sampling variance loss (variance_is.h:69-76):
    value = t²/pdf·(1/pred − 1/pdf); gradient = −t²/pdf/pred²."""

    def elementwise(self, prediction, target, pdf):
        factor = target * target / pdf
        return factor / prediction - _sg(factor / pdf)


class ConstantGradientLoss(Loss):
    """Injects a fixed per-dim gradient; values are zero
    (losses/constant.h:42-70).  Not exposed in the registry, mirroring
    the reference (internal use only)."""

    channel_agnostic = False          # (D,)-vector broadcast along dim 1

    def __init__(self, constant_gradient: Sequence[float]):
        self.constant_gradient = jnp.asarray(constant_gradient, jnp.float32)

    def elementwise(self, prediction, target, pdf):
        # value ≡ 0 with d/dpred = constant_gradient/pdf, via the
        # (g·pred − sg(g·pred)) identity.
        g = self.constant_gradient[None, :] / pdf
        contrib = g * prediction
        return contrib - _sg(contrib)

    def values(self, prediction, target, pdf=None):
        # Reference does NOT divide constant gradients by n_total
        # (constant.h:68: gradient = loss_scale·g/pdf, no /n).
        prediction = prediction.astype(jnp.float32)
        if pdf is None:
            pdf = jnp.ones_like(prediction)
        return self.elementwise(prediction, prediction, pdf)


def _register():
    register_loss(["L2", "MSE"], lambda cfg: L2Loss())
    register_loss(["RelativeL2"], lambda cfg: RelativeL2Loss())
    register_loss(["RelativeL2Luminance"], lambda cfg: RelativeL2LuminanceLoss())
    register_loss(["L1", "MAE"], lambda cfg: L1Loss())
    register_loss(["RelativeL1"], lambda cfg: RelativeL1Loss())
    register_loss(["MAPE"], lambda cfg: MapeLoss())
    register_loss(["SMAPE"], lambda cfg: SmapeLoss())
    register_loss(["CrossEntropy"], lambda cfg: CrossEntropyLoss())
    register_loss(["Variance"], lambda cfg: VarianceLoss())


_register()
