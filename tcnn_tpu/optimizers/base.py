"""Optimizer protocol.

Functional rebuild of the reference optimizer interface
(optimizer.h:39-63).  The reference mutates three raw buffers
``(fp32 master, T weights, T grads)`` in-place; here an optimizer is a
pure state machine over parameter pytrees:

    state                = opt.init(params, layout)
    state, new_params    = opt.step(state, grads, params)
    inference_params     = opt.custom_weights(state, new_params)  # or None

``layout`` is a pytree of ``"matrix"``/``"other"`` strings with the same
structure as ``params`` (see Module.param_layout): the reference
distinguishes weight-matrix params (layer_sizes-covered prefix) from
everything else (hash tables) for L2 reg, learning-rate factors, and
lazy stepping (adam.h:76-118).

``step`` takes an optional ``lr_scale`` so wrapper optimizers
(ExponentialDecay) can drive the nested learning rate functionally
instead of via the reference's mutable ``set_learning_rate``.

All ``step`` implementations are jit-compatible pure functions; the
Trainer jits the whole (grad, step) composition.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Any
State = Any

tree_map = jax.tree_util.tree_map


def zeros_like_tree(params: Params):
    return tree_map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)


def weight_decay(relative: jax.Array, absolute: jax.Array, weight: jax.Array):
    """(1−rel)·w − copysign(abs, w) (common_device.h:870-873)."""
    return (1.0 - relative) * weight - jnp.copysign(absolute, weight)


class Optimizer:
    def init(self, params: Params, layout: Params) -> State:
        raise NotImplementedError

    def _init_attr(self, name: str):
        """Fetch layout metadata recorded by ``init`` with a clear error
        when ``step`` is called on a never-initialized optimizer (e.g. a
        state restored in a fresh process without going through
        Trainer.initial_state / deserialize)."""
        try:
            return getattr(self, name)
        except AttributeError:
            raise RuntimeError(
                f"{type(self).__name__}.step/custom_weights called before "
                "init(): call init(params, layout) — or restore state via "
                "Trainer.initial_state()/Trainer.deserialize(), which do — "
                "so the parameter layout is known") from None

    def step(self, state: State, grads: Params, params: Params,
             lr_scale=1.0) -> Tuple[State, Params]:
        raise NotImplementedError

    def custom_weights(self, state: State, params: Params) -> Optional[Params]:
        """Weights to use for inference if different from the trained
        ones (≈ Optimizer::custom_weights, optimizer.h:52; used by
        Average/EMA)."""
        return None

    @property
    def learning_rate(self) -> float:
        return 0.0

    def n_nested(self) -> int:
        return 0

    def nested(self, idx: int) -> "Optimizer":
        raise IndexError

    def hyperparams(self) -> Dict[str, Any]:
        raise NotImplementedError

    #: json key -> attribute name; drives the generic
    #: :meth:`update_hyperparams`.  Each concrete optimizer lists the
    #: same keys its reference counterpart accepts at runtime.
    _HYPERPARAM_ATTRS: Dict[str, str] = {}

    def update_hyperparams(self, cfg: Dict[str, Any]) -> None:
        """Runtime hyperparameter update (≈ Object::update_hyperparams,
        object.h:56-61; per-optimizer impls e.g. adam.h:240-270,
        sgd.h:116-124).  Callers that hold jitted step closures must
        re-jit afterwards — ``Trainer.update_hyperparams`` does this
        automatically."""
        for k, v in cfg.items():
            if k.lower() == "otype":
                continue
            attr = self._HYPERPARAM_ATTRS.get(k)
            if attr is None:
                raise NotImplementedError(
                    f"{type(self).__name__} does not support updating {k!r}")
            cur = getattr(self, attr)
            setattr(self, attr, type(cur)(v))

    @property
    def name(self) -> str:
        return str(self.hyperparams().get("otype", type(self).__name__))
