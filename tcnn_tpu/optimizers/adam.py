"""Adam / AdaBound optimizer.

Faithful functional rebuild of the reference's fused adam_step kernel
(optimizers/adam.h:48-180) as vectorized jnp, including its
hash-grid-specific behaviors:

  * **per-parameter step counters** — non-matrix params (hash-table
    entries) only advance their Adam step when their gradient is
    nonzero, so rarely-touched table entries are debiased by *their own*
    age (adam.h:103-105);
  * L2 regularization applied to matrix params only (adam.h:89-91);
  * ``non_matrix_learning_rate_factor`` for table entries (adam.h:98-101);
  * AdaBound effective-lr clamping (adam.h:156-160 / step():152-159);
  * relative/absolute weight decay and optional weight clipping.

The kernel's ``gradient / loss_scale`` unscaling is dropped (no fp16
loss scaling on TPU); the fp32→fp16 weight write-back pair becomes the
Trainer's dtype policy.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .base import Optimizer, weight_decay, tree_map


class Adam(Optimizer):
    def __init__(
        self,
        learning_rate: float = 1e-3,
        beta1: float = 0.9,
        beta2: float = 0.999,
        epsilon: float = 1e-8,
        l2_reg: float = 1e-8,
        relative_decay: float = 0.0,
        absolute_decay: float = 0.0,
        adabound: bool = False,
        non_matrix_learning_rate_factor: float = 1.0,
        optimize_matrix_params: bool = True,
        optimize_non_matrix_params: bool = True,
        clipping_magnitude: float = 0.0,
    ):
        self.lr = float(learning_rate)
        self.beta1 = float(beta1)
        self.beta2 = float(beta2)
        self.epsilon = float(epsilon)
        self.l2_reg = float(l2_reg)
        self.relative_decay = float(relative_decay)
        self.absolute_decay = float(absolute_decay)
        self.adabound = bool(adabound)
        self.non_matrix_lr_factor = float(non_matrix_learning_rate_factor)
        self.optimize_matrix = bool(optimize_matrix_params)
        self.optimize_non_matrix = bool(optimize_non_matrix_params)
        self.clipping_magnitude = float(clipping_magnitude)

    def init(self, params, layout):
        # Layout is static metadata (same pytree structure as params,
        # "matrix"/"other" leaves); kept on the object, not in traced state.
        self._layout = layout
        return {
            "mu": tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            "nu": tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            "param_steps": tree_map(
                lambda p: jnp.zeros(p.shape, jnp.uint32), params),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, grads, params, lr_scale=1.0):
        with jax.named_scope("tcnn_adam"):
            return self._step(state, grads, params, lr_scale)

    def _step(self, state, grads, params, lr_scale=1.0):
        t = state["step"] + 1

        if self.adabound:
            # AdaBound lr bounds from the *global* step (adam.h:152-159).
            tf = t.astype(jnp.float32)
            lower = 0.1 - 0.1 / ((1.0 - self.beta2) * tf + 1.0)
            upper = 0.1 + 0.1 / ((1.0 - self.beta2) * tf)
        else:
            lower = jnp.float32(0.0)
            upper = jnp.float32(jnp.finfo(jnp.float32).max)

        def leaf_step(p, g, mu, nu, steps, kind):
            is_matrix = kind == "matrix"
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)

            if is_matrix:
                update = jnp.full(p.shape, self.optimize_matrix)
                g = g + self.l2_reg * p32
            else:
                update = (g != 0) & self.optimize_non_matrix

            new_mu = jnp.where(update, self.beta1 * mu + (1 - self.beta1) * g, mu)
            new_nu = jnp.where(update, self.beta2 * nu + (1 - self.beta2) * g * g, nu)
            new_steps = steps + update.astype(jnp.uint32)

            lr = self.lr * lr_scale
            if not is_matrix:
                lr = lr * self.non_matrix_lr_factor
            # Per-param debiasing by each param's own step count
            # (adam.h:106-108).
            ts = new_steps.astype(jnp.float32)
            lr = lr * jnp.sqrt(1 - self.beta2 ** ts) / (1 - self.beta1 ** ts)

            eff_lr = jnp.clip(lr / (jnp.sqrt(new_nu) + self.epsilon), lower, upper)
            decayed = weight_decay(self.relative_decay * lr,
                                   self.absolute_decay * lr, p32)
            new_p = decayed - eff_lr * new_mu
            if self.clipping_magnitude != 0.0:
                new_p = jnp.clip(new_p, -self.clipping_magnitude,
                                 self.clipping_magnitude)
            new_p = jnp.where(update, new_p, p32).astype(p.dtype)
            return new_p, new_mu, new_nu, new_steps

        layout = self._init_attr('_layout')
        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_mu = treedef.flatten_up_to(state["mu"])
        flat_nu = treedef.flatten_up_to(state["nu"])
        flat_st = treedef.flatten_up_to(state["param_steps"])
        flat_kind = treedef.flatten_up_to(layout)

        new_p, new_mu, new_nu, new_st = [], [], [], []
        for p, g, mu, nu, st, kind in zip(flat_p, flat_g, flat_mu, flat_nu,
                                          flat_st, flat_kind):
            a, b, c, d = leaf_step(p, g, mu, nu, st, kind)
            new_p.append(a); new_mu.append(b); new_nu.append(c); new_st.append(d)

        unflatten = treedef.unflatten
        new_state = {
            "mu": unflatten(new_mu),
            "nu": unflatten(new_nu),
            "param_steps": unflatten(new_st),
            "step": t,
        }
        return new_state, unflatten(new_p)

    @property
    def learning_rate(self):
        return self.lr

    # Runtime-updatable knobs (adam.h:240-270), consumed by the generic
    # Optimizer.update_hyperparams.
    _HYPERPARAM_ATTRS = {
        "learning_rate": "lr", "beta1": "beta1", "beta2": "beta2",
        "epsilon": "epsilon", "l2_reg": "l2_reg",
        "relative_decay": "relative_decay",
        "absolute_decay": "absolute_decay",
        "non_matrix_learning_rate_factor": "non_matrix_lr_factor",
        "clipping_magnitude": "clipping_magnitude",
    }

    def hyperparams(self) -> Dict[str, Any]:
        return {
            "otype": "Adam",
            "learning_rate": self.lr,
            "beta1": self.beta1,
            "beta2": self.beta2,
            "epsilon": self.epsilon,
            "l2_reg": self.l2_reg,
            "relative_decay": self.relative_decay,
            "absolute_decay": self.absolute_decay,
            "adabound": self.adabound,
            "non_matrix_learning_rate_factor": self.non_matrix_lr_factor,
            "optimize_matrix_params": self.optimize_matrix,
            "optimize_non_matrix_params": self.optimize_non_matrix,
            "clipping_magnitude": self.clipping_magnitude,
        }
