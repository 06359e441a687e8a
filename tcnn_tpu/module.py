"""Differentiable-module protocol.

TPU-native replacement for the reference's object model
(object.h:45-374).  The reference threads a single raw parameter buffer
through every module via ``set_params`` pointer offsets because CUDA
kernels want contiguous memory; here modules are *pure functions over
pytrees*:

    params = module.init(jax.random.key(0))
    y      = module.apply(params, x)

and all differentiation — ``backward`` (dL/dx + dL/dparams) and
``backward_backward_input`` (object.h:270-340) — is derived from
``apply`` with jax.vjp/jvp.  The explicit convenience wrappers below
exist for API parity with the reference; idiomatic user code just calls
``jax.grad`` on whatever composition it likes.

Conventions (deliberately different from the reference, TPU-idiomatic):
  * batch-major arrays ``(batch, dims)`` (row-major → (8k, 128) TPU
    tiles); the reference is column-major ``(dims, batch)``.
  * no output padding is observable: ``apply`` returns exactly
    ``n_output_dims`` columns.  Alignment padding is an internal detail
    of kernels that need it.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .common import Policy, default_policy

Params = Any  # a pytree of jnp arrays


class Module:
    """Base differentiable module (≈ DifferentiableObject, object.h:121)."""

    #: populated by subclasses
    n_input_dims: int
    n_output_dims: int

    def __init__(self, policy: Optional[Policy] = None):
        self.policy = policy or default_policy()

    # ---- parameters -------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        """Initialize parameters (≈ initialize_params, object.h:94)."""
        raise NotImplementedError

    def param_layout(self, params: Params) -> Params:
        """Pytree of per-leaf metadata strings, same structure as params.

        ``"matrix"`` marks weight-matrix leaves (get L2 reg & full lr in
        Adam, ≈ layer_sizes() coverage, adam.h:76-91); ``"other"`` marks
        everything else (hash tables etc., which get
        non_matrix_learning_rate_factor and lazy stepping).
        """
        return jax.tree_util.tree_map(lambda _: "matrix", params)

    def n_params(self, params: Params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

    def grid_specs(self, prefix: tuple = ()) -> dict:
        """``{param_path: GridSpec}`` for every grid table among this
        module's params (paths as plain key tuples mirroring the params
        pytree: str for dict keys, int for sequence positions).  Used
        by the model-parallel layer to row-shard tables
        (:mod:`tcnn_tpu.parallel.table_parallel`); modules without grid
        tables return ``{}``, containers merge their children's."""
        return {}

    # ---- compute ----------------------------------------------------
    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        """Forward pass: (B, n_input_dims) -> (B, n_output_dims)."""
        raise NotImplementedError

    def inference(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        """Forward without gradient bookkeeping (≈ object.h:147).

        Under jit, XLA dead-code-eliminates unused residuals, so this is
        simply ``apply``; subclasses may override with a cheaper kernel
        (e.g. the fused-MLP inference kernel skips storing activations).
        Layout kwargs (e.g. ``soa``) pass through to ``apply``.
        """
        return self.apply(params, x, **kwargs)

    # ---- explicit differentiation API (parity with object.h) --------
    def forward(self, params: Params, x: jax.Array):
        """Returns (y, ctx) where ctx is the pullback closure
        (≈ forward_impl returning a Context, object.h:188)."""
        y, vjp_fn = jax.vjp(lambda p, xx: self.apply(p, xx), params, x)
        return y, vjp_fn

    def backward(self, ctx, dL_dy: jax.Array) -> Tuple[Params, jax.Array]:
        """(dL_dparams, dL_dinput) from a saved forward context."""
        dparams, dx = ctx(dL_dy)
        return dparams, dx

    def backward_backward_input(
        self,
        params: Params,
        x: jax.Array,
        dL_dy: jax.Array,
        dL_ddLdx: jax.Array,
    ) -> Tuple[jax.Array, Params, jax.Array]:
        """Second-order: given upstream gradient w.r.t. dL/dx, return
        (dL2_ddLdy, dL2_dparams, dL2_dx)  (≈ object.h:270-340).

        Implemented as jvp-of-vjp; unlike the reference (grid.h:902-1026
        implements only three Hessian blocks) this is complete for every
        module, since JAX composes derivatives automatically.
        """

        def input_grad(p, xx, g):
            _, vjp_fn = jax.vjp(lambda px, xi: self.apply(px, xi), p, xx)
            _, dx = vjp_fn(g)
            return dx

        # dL2/d{params, x, dL_dy} of <input_grad(params, x, dL_dy), dL_ddLdx>
        def scalar(p, xx, g):
            return jnp.vdot(input_grad(p, xx, g).astype(jnp.float32),
                            dL_ddLdx.astype(jnp.float32))

        grads = jax.grad(scalar, argnums=(0, 1, 2))(params, x, dL_dy)
        dparams, dx, ddLdy = grads
        return ddLdy, dparams, dx

    def input_gradient(self, params: Params, x: jax.Array, dim: int) -> jax.Array:
        """d y[dim] / d x via a one-hot probe (≈ object.h:342-366)."""
        y, vjp_fn = jax.vjp(lambda xx: self.apply(params, xx), x)
        onehot = jnp.zeros_like(y).at[:, dim].set(1.0)
        (dx,) = vjp_fn(onehot)
        return dx

    # ---- config -----------------------------------------------------
    def hyperparams(self) -> Dict[str, Any]:
        """JSON-roundtrippable config (≈ Object::hyperparams)."""
        raise NotImplementedError

    @property
    def name(self) -> str:
        return str(self.hyperparams().get("otype", type(self).__name__))


class Encoding(Module):
    """Input encoding base (≈ encoding.h:39-73).

    Encodings map raw coordinates to features.  The reference's
    padded-output/alignment machinery collapses to ``n_output_dims``
    here; ``pad_to`` optionally appends constant-1 columns to match the
    reference's pad-with-1 convention (identity.h:63) when a consumer
    requests aligned widths.
    """

    def required_output_alignment(self) -> int:
        return 1

    def apply_padded(self, params: Params, x: jax.Array, padded_width: int) -> jax.Array:
        y = self.apply(params, x)
        pad = padded_width - y.shape[-1]
        if pad < 0:
            raise ValueError("padded width below encoding output width")
        if pad == 0:
            return y
        ones = jnp.ones((y.shape[0], pad), dtype=y.dtype)
        return jnp.concatenate([y, ones], axis=-1)


class Network(Module):
    """Network base (≈ network.h:40-57)."""

    @property
    def width(self) -> int:
        raise NotImplementedError

    @property
    def n_hidden_layers(self) -> int:
        raise NotImplementedError

    def layer_sizes(self, params: Params) -> List[Tuple[int, int]]:
        return [tuple(w.shape) for w in jax.tree_util.tree_leaves(params)]
