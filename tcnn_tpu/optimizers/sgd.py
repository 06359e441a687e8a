"""Plain SGD with L2 regularization (optimizers/sgd.h:44-70)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .base import Optimizer, tree_map


class SGD(Optimizer):
    _HYPERPARAM_ATTRS = {"learning_rate": "lr",
                         "l2_reg": "l2_reg"}  # sgd.h:116-124

    def __init__(self, learning_rate: float = 1e-3, l2_reg: float = 1e-8):
        self.lr = float(learning_rate)
        self.l2_reg = float(l2_reg)

    def init(self, params, layout):
        self._layout = layout
        return {"step": jnp.zeros((), jnp.uint32)}

    def step(self, state, grads, params, lr_scale=1.0):
        import jax

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_kind = treedef.flatten_up_to(self._init_attr('_layout'))
        new_p = []
        for p, g, kind in zip(flat_p, flat_g, flat_kind):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            if kind == "matrix":
                # L2 reg on matrix params only (sgd.h:58, matching Adam).
                g = g + self.l2_reg * p32
            new_p.append((p32 - self.lr * lr_scale * g).astype(p.dtype))
        return {"step": state["step"] + 1}, treedef.unflatten(new_p)

    @property
    def learning_rate(self):
        return self.lr

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "SGD", "learning_rate": self.lr, "l2_reg": self.l2_reg}


class Novograd(Optimizer):
    """Novograd (optimizers/novograd.h:45-120): per-layer second moment
    v_l = EMA of Σ g² over the layer; per-param first moment
    m = β1·m + (1−β1)·g/(√v_l+ε); update = decayed_w − lr·m.

    Like the reference (which iterates only over layer_sizes-covered
    matrices, novograd.h:122-150), only "matrix" leaves are optimized;
    non-matrix params (hash tables) are left untouched.
    """

    _HYPERPARAM_ATTRS = {
        "learning_rate": "lr", "beta1": "beta1", "beta2": "beta2",
        "epsilon": "epsilon", "relative_decay": "relative_decay",
        "absolute_decay": "absolute_decay",
    }  # novograd.h:187-213

    def __init__(self, learning_rate: float = 1e-3, beta1: float = 0.9,
                 beta2: float = 0.999, epsilon: float = 1e-8,
                 relative_decay: float = 0.0, absolute_decay: float = 0.0):
        self.lr = float(learning_rate)
        self.beta1 = float(beta1)
        self.beta2 = float(beta2)
        self.epsilon = float(epsilon)
        self.relative_decay = float(relative_decay)
        self.absolute_decay = float(absolute_decay)

    def init(self, params, layout):
        self._layout = layout
        return {
            "mu": tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            "v": tree_map(lambda p: jnp.zeros((), jnp.float32), params),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, grads, params, lr_scale=1.0):
        import jax

        from .base import weight_decay

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_mu = treedef.flatten_up_to(state["mu"])
        flat_v = treedef.flatten_up_to(state["v"])
        flat_kind = treedef.flatten_up_to(self._init_attr('_layout'))
        lr = self.lr * lr_scale

        new_p, new_mu, new_v = [], [], []
        for p, g, mu, v, kind in zip(flat_p, flat_g, flat_mu, flat_v, flat_kind):
            if kind != "matrix":
                new_p.append(p); new_mu.append(mu); new_v.append(v)
                continue
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            norm_sq = jnp.sum(g * g)
            v2 = self.beta2 * v + (1 - self.beta2) * norm_sq
            mu2 = self.beta1 * mu + (1 - self.beta1) * g / (jnp.sqrt(v2) + self.epsilon)
            decayed = weight_decay(self.relative_decay * lr,
                                   self.absolute_decay * lr, p32)
            new_p.append((decayed - lr * mu2).astype(p.dtype))
            new_mu.append(mu2)
            new_v.append(v2)
        return (
            {"mu": treedef.unflatten(new_mu), "v": treedef.unflatten(new_v),
             "step": state["step"] + 1},
            treedef.unflatten(new_p),
        )

    @property
    def learning_rate(self):
        return self.lr

    def hyperparams(self) -> Dict[str, Any]:
        return {
            "otype": "Novograd",
            "learning_rate": self.lr,
            "beta1": self.beta1,
            "beta2": self.beta2,
            "epsilon": self.epsilon,
            "relative_decay": self.relative_decay,
            "absolute_decay": self.absolute_decay,
        }
