"""Shampoo second-order optimizer.

Functional rebuild of the reference's Shampoo (optimizers/shampoo.h,
~1050 LoC of cuBLAS batched GEMMs + a coupled-Newton inverse-4th-root
on three CUDA side streams).  Algorithm per weight matrix G (m×n):

    m_t = debiased-EMA_β1(g);  v_t = debiased-EMA_β2(g²)
    momentum = m_t/(√v_t+ε)                     (shampoo.h:167-192)
    L = debiased-EMA_β3(P Pᵀ), R = debiased-EMA_β3(Pᵀ P)
        where P = momentum if cg_on_momentum else g (shampoo.h:719-765)
    every K steps: L_root = (sym(L)·(1−id)+id·I)^(−1/4), same for R
        (shampoo_symmetrize_batched :195-221, inverse_pth_root :435-630)
    shampoo_momentum = debiased-EMA_β_shampoo(L_root · momentum · R_root)
    lr_eff = lr·‖momentum‖_F/‖shampoo_momentum‖_F   (frobenius_normalization,
                                                     shampoo_step_batched :225-262)
    w ← weight_decay(w) − lr_eff·shampoo_momentum

Non-matrix params (hash tables) get the plain momentum update
(shampoo_step_remaining :265-282).

TPU-native deviations (documented, intentional):
  * inverse 4th root via eigh (batched, fp32) instead of coupled
    Newton — XLA lowers symmetric eigendecomposition natively and the
    matrices are ≤256², so this is cheap and unconditionally stable;
  * the root refresh updates ALL preconditioners every
    ``update_interval`` steps (10 early, then 200 — same cadence
    constants, shampoo.h:832-838) rather than round-robining batches
    of same-shaped matrices across interleaved streams; under jit the
    whole refresh is one fused computation, so there is nothing to
    amortize.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .base import Optimizer, weight_decay


def _inverse_4th_root_psd(a: jax.Array, identity_strength: float) -> jax.Array:
    """(sym(A)·(1−s) + s·I)^(−1/4) via eigendecomposition."""
    m = a.shape[-1]
    sym = 0.5 * (a + a.T) * (1.0 - identity_strength)
    sym = sym + identity_strength * jnp.eye(m, dtype=a.dtype)
    w, v = jnp.linalg.eigh(sym)
    w = jnp.maximum(w, 1e-12)
    return (v * (w ** -0.25)[None, :]) @ v.T


class Shampoo(Optimizer):
    _HYPERPARAM_ATTRS = {
        "learning_rate": "lr", "beta1": "beta1", "beta2": "beta2",
        "beta3": "beta3", "beta_shampoo": "beta_shampoo",
        "epsilon": "epsilon", "identity": "identity_strength",
        "cg_on_momentum": "cg_on_momentum", "l2_reg": "l2_reg",
        "relative_decay": "relative_decay",
        "absolute_decay": "absolute_decay",
        "frobenius_normalization": "frobenius_normalization",
    }  # shampoo.h update_hyperparams

    def __init__(
        self,
        learning_rate: float = 1e-3,
        beta1: float = 0.9,
        beta2: float = 0.99,
        beta3: float = 0.9,
        beta_shampoo: float = 0.9,
        epsilon: float = 1e-8,
        identity: float = 0.01,
        cg_on_momentum: bool = True,
        l2_reg: float = 1e-5,
        relative_decay: float = 0.0,
        absolute_decay: float = 0.0,
        frobenius_normalization: bool = True,
    ):
        self.lr = float(learning_rate)
        self.beta1 = float(beta1)
        self.beta2 = float(beta2)
        self.beta3 = float(beta3)
        self.beta_shampoo = float(beta_shampoo)
        self.epsilon = float(epsilon)
        self.identity_strength = float(identity)
        self.cg_on_momentum = bool(cg_on_momentum)
        self.l2_reg = float(l2_reg)
        self.relative_decay = float(relative_decay)
        self.absolute_decay = float(absolute_decay)
        self.frobenius_normalization = bool(frobenius_normalization)

    def init(self, params, layout):
        self._layout = layout
        flat, treedef = jax.tree_util.tree_flatten(params)
        kinds = treedef.flatten_up_to(layout)
        # State mirrors the PARAMS tree (mu/nu per leaf, matrix-only
        # preconditioner dicts in a parallel tree) rather than a
        # positionally-keyed list: mirrored paths end with the param's
        # own path, which is what lets HybridParallel row-shard a grid
        # table's mu/nu alongside the table itself.
        per_mat = []
        for p, kind in zip(flat, kinds):
            if kind == "matrix" and p.ndim == 2:
                m, n = p.shape
                per_mat.append({
                    "L": jnp.zeros((m, m), jnp.float32),
                    "R": jnp.zeros((n, n), jnp.float32),
                    "L_root": jnp.eye(m, dtype=jnp.float32),
                    "R_root": jnp.eye(n, dtype=jnp.float32),
                    "shampoo_mu": jnp.zeros(p.shape, jnp.float32),
                })
            else:
                per_mat.append({})
        zeros = lambda tree: jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), tree)
        self._treedef = treedef
        return {"mu": zeros(params), "nu": zeros(params),
                "mat": treedef.unflatten(per_mat),
                "step": jnp.zeros((), jnp.uint32)}

    def _debias(self, beta: float, t):
        """(alpha, beta) pair of the reference's debiased EMA: the stored
        value is already bias-corrected at every step."""
        bt = beta ** t
        bt1 = beta ** jnp.maximum(t - 1.0, 0.0)
        alpha = (1 - beta) / (1 - bt)
        scaled_beta = beta * (1 - bt1) / (1 - bt)
        return alpha, scaled_beta

    def step(self, state, grads, params, lr_scale=1.0):
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        a1, b1 = self._debias(self.beta1, tf)
        a2, b2 = self._debias(self.beta2, tf)
        a3, b3 = self._debias(self.beta3, tf)
        a_s, b_s = self._debias(self.beta_shampoo, tf)
        lr = self.lr * lr_scale

        # Root refresh cadence (shampoo.h:832-838).
        interval = jnp.where(t < 100, jnp.uint32(10), jnp.uint32(200))
        refresh = (t == 1) | ((t % interval) == 0)

        treedef = self._init_attr('_treedef')
        flat_p = treedef.flatten_up_to(params)
        flat_g = treedef.flatten_up_to(grads)
        kinds = treedef.flatten_up_to(self._layout)
        flat_mu = treedef.flatten_up_to(state["mu"])
        flat_nu = treedef.flatten_up_to(state["nu"])
        flat_mat = treedef.flatten_up_to(state["mat"])

        new_mu, new_nu, new_mat, new_p = [], [], [], []
        for p, g, mu0, nu0, st, kind in zip(flat_p, flat_g, flat_mu,
                                            flat_nu, flat_mat, kinds):
            g = g.astype(jnp.float32) + self.l2_reg * p.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            mu = b1 * mu0 + a1 * g
            nu = b2 * nu0 + a2 * g * g
            momentum = mu / (jnp.sqrt(nu) + self.epsilon)
            st2 = dict(st)

            if "L" in st and p.ndim == 2:
                src = momentum if self.cg_on_momentum else g
                L = b3 * st["L"] + a3 * (src @ src.T)
                R = b3 * st["R"] + a3 * (src.T @ src)

                def do_refresh(ops):
                    L_, R_ = ops
                    return (_inverse_4th_root_psd(L_, self.identity_strength),
                            _inverse_4th_root_psd(R_, self.identity_strength))

                def no_refresh(ops):
                    del ops
                    return st["L_root"], st["R_root"]

                L_root, R_root = jax.lax.cond(refresh, do_refresh, no_refresh,
                                              (L, R))
                precond = L_root @ momentum @ R_root
                sh_mu = b_s * st["shampoo_mu"] + a_s * precond
                if self.frobenius_normalization:
                    adam_norm = jnp.sqrt(jnp.sum(momentum * momentum))
                    sh_norm = jnp.sqrt(jnp.sum(sh_mu * sh_mu)) + 1e-30
                    lr_eff = lr * adam_norm / sh_norm
                else:
                    lr_eff = jnp.float32(lr)
                update = sh_mu
                st2.update({"L": L, "R": R, "L_root": L_root,
                            "R_root": R_root, "shampoo_mu": sh_mu})
            else:
                lr_eff = jnp.float32(lr)
                update = momentum

            decayed = weight_decay(self.relative_decay * lr_eff,
                                   self.absolute_decay * lr_eff, p32)
            new_p.append((decayed - lr_eff * update).astype(p.dtype))
            new_mu.append(mu)
            new_nu.append(nu)
            new_mat.append(st2)

        return ({"mu": treedef.unflatten(new_mu),
                 "nu": treedef.unflatten(new_nu),
                 "mat": treedef.unflatten(new_mat), "step": t},
                treedef.unflatten(new_p))

    @property
    def learning_rate(self):
        return self.lr

    def hyperparams(self) -> Dict[str, Any]:
        return {
            "otype": "Shampoo",
            "learning_rate": self.lr,
            "beta1": self.beta1,
            "beta2": self.beta2,
            "beta3": self.beta3,
            "beta_shampoo": self.beta_shampoo,
            "epsilon": self.epsilon,
            "identity": self.identity_strength,
            "cg_on_momentum": self.cg_on_momentum,
            "l2_reg": self.l2_reg,
            "relative_decay": self.relative_decay,
            "absolute_decay": self.absolute_decay,
            "frobenius_normalization": self.frobenius_normalization,
        }
