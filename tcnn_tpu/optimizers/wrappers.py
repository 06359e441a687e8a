"""Wrapper optimizers: Average, Batched, Composite, EMA,
ExponentialDecay, Lookahead.

Functional rebuilds of the reference wrappers (optimizers/{average,
batched,composite,ema,exponential_decay,lookahead}.h).  Each wraps a
nested optimizer and transforms its schedule, gradients, or weights;
"every N steps" logic uses lax.cond so the whole composition stays
jittable inside the Trainer's training_step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from .base import Optimizer, tree_map


class _Nesting(Optimizer):
    def __init__(self, nested: Optimizer):
        self._nested = nested

    def n_nested(self) -> int:
        return 1

    def nested(self, idx: int) -> Optimizer:
        if idx != 0:
            raise IndexError
        return self._nested

    @property
    def learning_rate(self):
        return self._nested.learning_rate

    def update_hyperparams(self, cfg):
        # Wrappers forward "nested" updates like the reference wrappers
        # do (e.g. exponential_decay.h update_hyperparams).
        cfg = dict(cfg)
        nested_cfg = cfg.pop("nested", None)
        if nested_cfg:
            self._nested.update_hyperparams(nested_cfg)
        super().update_hyperparams(cfg)


class EMA(_Nesting):
    """EMA of the optimized weights, used for inference only
    (optimizers/ema.h:44-135).  Stores the raw accumulator and debiases
    at read time — numerically identical (in fp32) to the reference's
    store-debiased formulation.  Follows nested custom weights if the
    nested optimizer provides them (ema.h:110-114)."""

    _HYPERPARAM_ATTRS = {"decay": "decay",
                         "full_precision": "full_precision"}  # ema.h

    def __init__(self, nested: Optimizer, decay: float = 0.99,
                 full_precision: bool = False):
        super().__init__(nested)
        self.decay = float(decay)
        # Reference flag (ema.h): keep the EMA in fp32 regardless of T.
        # This implementation ALWAYS accumulates in fp32, so the flag is
        # accepted for config parity and recorded, but changes nothing.
        self.full_precision = bool(full_precision)

    def init(self, params, layout):
        return {
            "nested": self._nested.init(params, layout),
            "ema": tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, grads, params, lr_scale=1.0):
        nstate, new_params = self._nested.step(state["nested"], grads, params,
                                               lr_scale)
        tracked = self._nested.custom_weights(nstate, new_params)
        if tracked is None:
            tracked = new_params
        ema = tree_map(
            lambda e, w: self.decay * e + (1 - self.decay) * w.astype(jnp.float32),
            state["ema"], tracked)
        return {"nested": nstate, "ema": ema, "step": state["step"] + 1}, new_params

    def custom_weights(self, state, params):
        t = state["step"].astype(jnp.float32)
        debias = 1.0 / (1.0 - self.decay ** jnp.maximum(t, 1.0))
        return tree_map(lambda e, p: (e * debias).astype(p.dtype),
                        state["ema"], params)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "EMA", "decay": self.decay,
                "full_precision": self.full_precision,
                "nested": self._nested.hyperparams()}


class Average(_Nesting):
    """Arithmetic mean of the last N weight snapshots for inference
    (optimizers/average.h:44-110).  Keeps a ring buffer plus a running
    sum (sum += new − evicted) like the reference."""

    _HYPERPARAM_ATTRS = {"n_samples": "n_samples"}  # average.h

    def __init__(self, nested: Optimizer, n_samples: int = 128):
        super().__init__(nested)
        self.n_samples = int(n_samples)

    @staticmethod
    def _window(state) -> int:
        """Ring size of THIS state (its buffer's leading dim) — an
        updated n_samples only applies to freshly init()ed states, like
        the reference's reallocate-on-update (average.h:112-120)."""
        leaves = jax.tree_util.tree_leaves(state["buffer"])
        return leaves[0].shape[0] if leaves else 1

    def init(self, params, layout):
        return {
            "nested": self._nested.init(params, layout),
            "buffer": tree_map(
                lambda p: jnp.zeros((self.n_samples,) + p.shape, jnp.float32),
                params),
            "sum": tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, grads, params, lr_scale=1.0):
        nstate, new_params = self._nested.step(state["nested"], grads, params,
                                               lr_scale)
        tracked = self._nested.custom_weights(nstate, new_params)
        if tracked is None:
            tracked = new_params
        slot = (state["step"] % self._window(state)).astype(jnp.int32)

        def upd(buf, s, w):
            w32 = w.astype(jnp.float32)
            evicted = buf[slot]
            return buf.at[slot].set(w32), s + w32 - evicted

        flat_buf, treedef = jax.tree_util.tree_flatten(state["buffer"])
        flat_sum = treedef.flatten_up_to(state["sum"])
        flat_w = treedef.flatten_up_to(tracked)
        new_buf, new_sum = [], []
        for b, s, w in zip(flat_buf, flat_sum, flat_w):
            nb, ns = upd(b, s, w)
            new_buf.append(nb); new_sum.append(ns)
        return {
            "nested": nstate,
            "buffer": treedef.unflatten(new_buf),
            "sum": treedef.unflatten(new_sum),
            "step": state["step"] + 1,
        }, new_params

    def custom_weights(self, state, params):
        n = jnp.minimum(jnp.maximum(state["step"], 1),
                        self._window(state))
        n = n.astype(jnp.float32)
        return tree_map(lambda s, p: (s / n).astype(p.dtype),
                        state["sum"], params)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "Average", "n_samples": self.n_samples,
                "nested": self._nested.hyperparams()}


class Batched(_Nesting):
    """Gradient accumulation: steps the nested optimizer once every
    ``batch_size_multiplier`` calls with the averaged gradient
    (optimizers/batched.h:44-90)."""

    _HYPERPARAM_ATTRS = {"batch_size_multiplier": "multiplier"}  # batched.h

    def __init__(self, nested: Optimizer, batch_size_multiplier: int = 16):
        super().__init__(nested)
        self.multiplier = int(batch_size_multiplier)

    def init(self, params, layout):
        return {
            "nested": self._nested.init(params, layout),
            "accum": tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            "count": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, grads, params, lr_scale=1.0):
        accum = tree_map(lambda a, g: a + g.astype(jnp.float32),
                         state["accum"], grads)
        count = state["count"] + 1
        do_step = count >= self.multiplier

        def take_step(op):
            nstate, accum_, params_ = op
            mean_grads = tree_map(lambda a: a / self.multiplier, accum_)
            nstate2, params2 = self._nested.step(nstate, mean_grads, params_,
                                                 lr_scale)
            return nstate2, tree_map(jnp.zeros_like, accum_), params2

        def no_step(op):
            nstate, accum_, params_ = op
            return nstate, accum_, params_

        nstate, accum, new_params = jax.lax.cond(
            do_step, take_step, no_step, (state["nested"], accum, params))
        count = jnp.where(do_step, 0, count).astype(jnp.uint32)
        return {"nested": nstate, "accum": accum, "count": count}, new_params

    def custom_weights(self, state, params):
        return self._nested.custom_weights(state["nested"], params)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "Batched", "batch_size_multiplier": self.multiplier,
                "nested": self._nested.hyperparams()}


class Lookahead(_Nesting):
    """Lookahead (optimizers/lookahead.h:43-100): every n_steps,
    slow ← slow + α(fast − slow) and the fast weights reset to slow."""

    _HYPERPARAM_ATTRS = {"alpha": "alpha",
                         "n_steps": "n_steps"}  # lookahead.h

    def __init__(self, nested: Optimizer, alpha: float = 0.5, n_steps: int = 16):
        super().__init__(nested)
        self.alpha = float(alpha)
        self.n_steps = int(n_steps)

    def init(self, params, layout):
        return {
            "nested": self._nested.init(params, layout),
            # copy=True: astype(f32) of f32 params ALIASES them, and the
            # Trainer's donated jitted step would then receive the same
            # buffer twice (params + slow) -> runtime error.
            "slow": tree_map(
                lambda p: jnp.array(p, jnp.float32, copy=True), params),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, grads, params, lr_scale=1.0):
        nstate, fast = self._nested.step(state["nested"], grads, params, lr_scale)
        step = state["step"] + 1
        sync = (step % self.n_steps) == 0

        def do_sync(op):
            slow, fast_ = op
            new_slow = tree_map(
                lambda s, f: s + self.alpha * (f.astype(jnp.float32) - s),
                slow, fast_)
            return new_slow, tree_map(lambda s, f: s.astype(f.dtype),
                                      new_slow, fast_)

        def no_sync(op):
            return op

        slow, fast = jax.lax.cond(sync, do_sync, no_sync, (state["slow"], fast))
        return {"nested": nstate, "slow": slow, "step": step}, fast

    def custom_weights(self, state, params):
        return self._nested.custom_weights(state["nested"], params)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "Lookahead", "alpha": self.alpha,
                "n_steps": self.n_steps,
                "nested": self._nested.hyperparams()}


class ExponentialDecay(_Nesting):
    """Piecewise-constant exponential lr decay driving the nested
    optimizer (optimizers/exponential_decay.h:44-90): whenever
    decay_start ≤ step ≤ decay_end and (step − decay_start) %
    decay_interval == 0, the lr factor multiplies by decay_base.
    ``step`` is the nested pre-step counter, exactly like the reference.
    """

    _HYPERPARAM_ATTRS = {
        "decay_base": "decay_base", "decay_start": "decay_start",
        "decay_end": "decay_end", "decay_interval": "decay_interval",
    }  # exponential_decay.h:92-110

    def __init__(self, nested: Optimizer, decay_base: float = 0.1,
                 decay_start: int = 10000, decay_end: int = 10000000,
                 decay_interval: int = 10000):
        super().__init__(nested)
        self.decay_base = float(decay_base)
        self.decay_start = int(decay_start)
        self.decay_end = int(decay_end)
        self.decay_interval = int(decay_interval)

    def init(self, params, layout):
        return {
            "nested": self._nested.init(params, layout),
            "factor": jnp.ones((), jnp.float32),
            "step": jnp.zeros((), jnp.uint32),
        }

    def step(self, state, grads, params, lr_scale=1.0):
        step = state["step"]
        hit = ((step >= self.decay_start)
               & (step <= self.decay_end)
               & (((step - self.decay_start) % self.decay_interval) == 0))
        factor = jnp.where(hit, state["factor"] * self.decay_base,
                           state["factor"])
        nstate, new_params = self._nested.step(
            state["nested"], grads, params, lr_scale * factor)
        return {"nested": nstate, "factor": factor, "step": step + 1}, new_params

    def custom_weights(self, state, params):
        return self._nested.custom_weights(state["nested"], params)

    def hyperparams(self) -> Dict[str, Any]:
        return {
            "otype": "ExponentialDecay",
            "decay_base": self.decay_base,
            "decay_start": self.decay_start,
            "decay_end": self.decay_end,
            "decay_interval": self.decay_interval,
            "nested": self._nested.hyperparams(),
        }


class Composite(Optimizer):
    """Partitions the parameter pytree between nested optimizers
    (optimizers/composite.h:44-130).

    The reference splits the flat parameter vector by per-nested
    ``n_params_to_optimize`` offsets; the canonical use is one
    optimizer for the network matrices and one for the encoding tables
    (params are laid out [network][encoding],
    network_with_input_encoding.h:115-130).  Here the same contract is
    expressed over the *canonical leaf order* of the pytree: each
    nested optimizer takes leaves until its ``n_params_to_optimize``
    is exhausted; boundaries must align with leaf boundaries.
    A ``"params"`` selector of "matrix"/"other" is also accepted as the
    idiomatic alternative.
    """

    def __init__(self, nested: List[Optimizer],
                 n_params_each: Optional[List[int]] = None,
                 kinds_each: Optional[List[str]] = None,
                 learning_rate_factor: float = 1.0):
        self._nested_list = nested
        self.n_params_each = n_params_each
        self.kinds_each = kinds_each
        # Global multiplier on every nested learning rate
        # (composite.h:93-99: set_learning_rate scales each nested's
        # BASE lr by the factor; here it composes with lr_scale).
        self.learning_rate_factor = float(learning_rate_factor)
        if (n_params_each is None) == (kinds_each is None):
            raise ValueError(
                "Composite: specify exactly one of n_params_to_optimize "
                "(per nested config) or params ('matrix'/'other')")

    def n_nested(self):
        return len(self._nested_list)

    def nested(self, idx):
        return self._nested_list[idx]

    def _assign(self, params, layout) -> List[int]:
        """Leaf index -> nested optimizer index."""
        leaves = jax.tree_util.tree_leaves(params)
        kinds = jax.tree_util.tree_leaves(
            jax.tree_util.tree_structure(params).flatten_up_to(layout))
        assign = []
        if self.kinds_each is not None:
            kind_to_opt = {k: i for i, k in enumerate(self.kinds_each)}
            for leaf, kind in zip(leaves, kinds):
                if kind not in kind_to_opt:
                    raise ValueError(f"Composite: no nested optimizer for '{kind}'")
                assign.append(kind_to_opt[kind])
        else:
            counts = list(self.n_params_each)
            opt_idx = 0
            for leaf in leaves:
                while opt_idx < len(counts) and counts[opt_idx] == 0:
                    opt_idx += 1
                if opt_idx >= len(counts):
                    raise ValueError("Composite: more params than covered by "
                                     "n_params_to_optimize")
                if counts[opt_idx] < leaf.size:
                    raise ValueError(
                        "Composite: n_params_to_optimize boundary does not "
                        f"align with a parameter-leaf boundary (leaf size "
                        f"{leaf.size}, remaining {counts[opt_idx]})")
                counts[opt_idx] -= leaf.size
                assign.append(opt_idx)
        return assign

    def _split(self, tree, assign, treedef):
        flat = treedef.flatten_up_to(tree)
        groups = [[] for _ in self._nested_list]
        for leaf, a in zip(flat, assign):
            groups[a].append(leaf)
        return groups

    def init(self, params, layout):
        flat, treedef = jax.tree_util.tree_flatten(params)
        self._treedef = treedef
        self._assignment = self._assign(params, layout)
        kinds = treedef.flatten_up_to(layout)
        p_groups = self._split(params, self._assignment, treedef)
        k_groups = [[] for _ in self._nested_list]
        for k, a in zip(kinds, self._assignment):
            k_groups[a].append(k)
        return {
            "nested": tuple(
                opt.init(tuple(pg), tuple(kg))
                for opt, pg, kg in zip(self._nested_list, p_groups, k_groups)),
        }

    def step(self, state, grads, params, lr_scale=1.0):
        treedef = self._init_attr('_treedef')
        assign = self._assignment
        p_groups = self._split(params, assign, treedef)
        g_groups = self._split(grads, assign, treedef)
        new_states, new_groups = [], []
        for opt, st, pg, gg in zip(self._nested_list, state["nested"],
                                   p_groups, g_groups):
            st2, p2 = opt.step(st, tuple(gg), tuple(pg),
                               lr_scale * self.learning_rate_factor)
            new_states.append(st2)
            new_groups.append(list(p2))
        # Reassemble in canonical leaf order.
        iters = [iter(g) for g in new_groups]
        flat = [next(iters[a]) for a in assign]
        return {"nested": tuple(new_states)}, treedef.unflatten(flat)

    def custom_weights(self, state, params):
        treedef = self._init_attr('_treedef')
        assign = self._assignment
        p_groups = self._split(params, assign, treedef)
        cw_groups = []
        any_custom = False
        for opt, st, pg in zip(self._nested_list, state["nested"], p_groups):
            cw = opt.custom_weights(st, tuple(pg))
            if cw is not None:
                any_custom = True
            cw_groups.append(list(cw) if cw is not None else list(pg))
        if not any_custom:
            return None
        iters = [iter(g) for g in cw_groups]
        flat = [next(iters[a]) for a in assign]
        return treedef.unflatten(flat)

    @property
    def learning_rate(self):
        # The composite's "learning rate" IS the factor
        # (composite.h:92-94).
        return self.learning_rate_factor

    def update_hyperparams(self, cfg):
        # composite.h:156-163: a "nested" ARRAY is forwarded
        # element-wise to the nested optimizers.
        cfg = dict(cfg)
        nested_cfg = cfg.pop("nested", None)
        if nested_cfg:
            if not isinstance(nested_cfg, (list, tuple)):
                raise ValueError(
                    "Composite.update_hyperparams: 'nested' must be an "
                    "array with one entry per nested optimizer")
            for opt, sub in zip(self._nested_list, nested_cfg):
                opt.update_hyperparams(sub)
        if "learning_rate_factor" in cfg:
            self.learning_rate_factor = float(cfg.pop("learning_rate_factor"))
        super().update_hyperparams(cfg)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "Composite",
                "learning_rate_factor": self.learning_rate_factor,
                "nested": [o.hyperparams() for o in self._nested_list]}
