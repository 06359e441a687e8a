"""Trainer — owns parameters + optimizer state, runs jitted train steps.

TPU-native rebuild of the reference Trainer (trainer.h:47-361).  The
mapping of mechanisms:

  * single raw param buffer [fp32 master | fp16 weights | fp16 grads]
    (trainer.h:75, :322-336)    →  a fp32 param pytree; compute-dtype
    casting happens inside the jitted step (dtype policy); gradients
    are jax.grad outputs, never materialized buffers.
  * CUDA-graph capture of forward+loss+backward (trainer.h:176-183)
    →  one ``jax.jit`` over the whole (loss, grad, optimizer) step
    with donated params/opt-state (XLA compiles a single executable —
    the same "no per-kernel launch overhead" effect, plus fusion).
  * loss readback via reduce_sum (trainer.h:205-211)  →  the scalar
    loss is an output of the jitted step; callers decide when to
    device-sync.
  * optimizer custom_weights for inference (trainer.h:329-333)
    →  ``inference_params()``.
  * serialize/deserialize params+optimizer state (trainer.h:275-315)
    →  utils/serialization.py (msgpack-free npz/json-binary).

``training_step`` returns (new_state, loss_value) and is safe to call
in a tight Python loop: all arrays stay on device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .common import Policy
from .losses import Loss
from .module import Module
from .optimizers import Optimizer


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainerState:
    params: Any            # fp32 master params (pytree)
    opt_state: Any
    step: jax.Array        # uint32

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


class Trainer:
    def __init__(
        self,
        model: Module,
        optimizer: Optimizer,
        loss: Loss,
        seed: int = 1337,
        policy: Optional[Policy] = None,
        perturbation_sigma: Optional[float] = None,
    ):
        self.model = model
        self.optimizer = optimizer
        self.loss = loss
        self.policy = policy or model.policy
        self.seed = seed
        # Optional logistic output perturbation for dithering
        # (trainer.h:114-123): during training, predictions are jittered
        # with logistic noise of this scale before the loss.
        self.perturbation_sigma = perturbation_sigma
        self._jit_cache: Dict[Any, Any] = {}

    # -- state --------------------------------------------------------
    def initial_state(self, key: Optional[jax.Array] = None) -> TrainerState:
        if key is None:
            key = jax.random.key(self.seed)
        params = self.model.init(key)
        layout = self.model.param_layout(params)
        opt_state = self.optimizer.init(params, layout)
        return TrainerState(params=params, opt_state=opt_state,
                            step=jnp.zeros((), jnp.uint32))

    def n_params(self, state: TrainerState) -> int:
        return self.model.n_params(state.params)

    # -- core step ----------------------------------------------------
    def loss_value_and_grads(self, params, x, target, pdf=None, step=None,
                             noise_key_salt=None):
        """``noise_key_salt``: optional extra value folded into the
        perturbation-noise key — under shard_map data parallelism each
        shard passes its ``axis_index`` so shards draw independent
        noise (same key + local batch shape would otherwise repeat one
        noise pattern on every shard)."""
        # SoA fast path: channel-agnostic losses consume feature-major
        # (D_out, B) predictions straight from the fused MLP kernel.
        # An AoS (B, 3) f32 array is (8,128)-tiled with 3 of 128 lanes
        # used, so every elementwise op on it runs at ~2% lane
        # efficiency — the flagship's loss reduction alone measured
        # 0.59 ms/step on the AoS layout.
        import os

        def _on_tpu():
            try:
                return jax.default_backend() == "tpu"
            except Exception:
                return False

        # TPU-only: the layout win comes from the fused-MLP kernel
        # emitting (D_out, B) directly; on CPU/GPU the XLA fallback's
        # transposed cotangent can hit unsupported bf16 dot layouts
        # and there is no lane-occupancy problem to fix.
        use_soa = (pdf is None
                   and os.environ.get("TCNN_TPU_SOA_LOSS", "1") != "0"
                   and _on_tpu()
                   and getattr(self.model, "supports_soa_output", False)
                   and getattr(self.loss, "channel_agnostic", False))

        def scalar_loss(p):
            if use_soa:
                pred = self.model.apply(p, x,
                                        output_soa=True).astype(jnp.float32)
                tgt = target.T
            else:
                pred = self.model.apply(p, x).astype(jnp.float32)
                tgt = target
            if self.perturbation_sigma and step is not None:
                key = jax.random.fold_in(jax.random.key(self.seed ^ 0x5eed),
                                         step)
                if noise_key_salt is not None:
                    key = jax.random.fold_in(key, noise_key_salt)
                noise = jax.random.logistic(key, pred.shape, jnp.float32)
                pred = pred + self.perturbation_sigma * noise
            return self.loss(pred, tgt, pdf)

        return jax.value_and_grad(scalar_loss)(params)

    def _training_step(self, state: TrainerState, x, target, pdf):
        loss_value, grads = self.loss_value_and_grads(
            state.params, x, target, pdf, step=state.step)
        opt_state, params = self.optimizer.step(state.opt_state, grads,
                                                state.params)
        return TrainerState(params=params, opt_state=opt_state,
                            step=state.step + 1), loss_value

    @functools.cached_property
    def _jitted_step(self):
        return jax.jit(self._training_step, donate_argnums=(0,))

    @functools.cached_property
    def _jitted_step_no_pdf(self):
        return jax.jit(lambda s, x, t: self._training_step(s, x, t, None),
                       donate_argnums=(0,))

    def training_step(self, state: TrainerState, x, target,
                      pdf=None) -> Tuple[TrainerState, jax.Array]:
        """One forward+backward+optimize step (≈ trainer.h:163-190)."""
        if pdf is None:
            return self._jitted_step_no_pdf(state, x, target)
        return self._jitted_step(state, x, target, pdf)

    def step_fn(self, *, with_pdf: bool = False):
        """Public UNJITTED step body ``(state, x, target[, pdf]) ->
        (state, loss)`` — for callers composing their own jit/scan/
        shard_map around the step (DataParallel, the multi-host
        launcher).  Use :meth:`make_training_step` for a ready-jitted
        version."""
        if with_pdf:
            return self._training_step
        return lambda state, x, target: self._training_step(
            state, x, target, None)

    def make_training_step(self, *, with_pdf: bool = False,
                           in_shardings=None, out_shardings=None,
                           donate_state: bool = True):
        """Public jitted step factory — the supported way to compile
        this trainer's step under explicit shardings (DataParallel uses
        it; single- and multi-chip paths share the same step function).

        Returns ``step(state, x, target[, pdf]) -> (state, loss)``.
        """
        if with_pdf:
            fn = self._training_step
        else:
            def fn(state, x, target):
                return self._training_step(state, x, target, None)
        kwargs = {}
        if in_shardings is not None:
            kwargs["in_shardings"] = in_shardings
        if out_shardings is not None:
            kwargs["out_shardings"] = out_shardings
        return jax.jit(fn, donate_argnums=(0,) if donate_state else (),
                       **kwargs)

    # -- training from external output gradients ----------------------
    def _training_step_external(self, state: TrainerState, x, dL_dy):
        def fwd(p):
            return self.model.apply(p, x).astype(jnp.float32)

        pred, vjp = jax.vjp(fwd, state.params)
        (grads,) = vjp(dL_dy.astype(jnp.float32))
        opt_state, params = self.optimizer.step(state.opt_state, grads,
                                                state.params)
        return TrainerState(params=params, opt_state=opt_state,
                            step=state.step + 1), pred

    @functools.cached_property
    def _jitted_step_external(self):
        return jax.jit(self._training_step_external, donate_argnums=(0,))

    def training_step_external_dL_dy(
            self, state: TrainerState, x, dL_dy
    ) -> Tuple[TrainerState, jax.Array]:
        """Training step driven by externally-supplied output gradients
        instead of a loss (``Trainer::training_step``'s ``external_dL_dy``
        overload, trainer.h:97-123).  Returns (new_state, prediction) —
        the reference likewise hands back the forward output so callers
        can build their own loss pipelines around it."""
        return self._jitted_step_external(state, x, dL_dy)

    # -- multi-step loops (CUDA-graph-replay analog) ------------------
    def make_training_loop(self, sample_fn, n_steps: int, sample_data=None):
        """Compile ``n_steps`` training steps into ONE executable.

        The reference replays a captured CUDA graph per step to kill
        launch overhead (trainer.h:176-183); on TPU the same idea goes
        further: a ``lax.scan`` over steps amortizes *dispatch* latency
        entirely (one host→device round trip per ``n_steps``), and
        data generation runs on-device inside the loop.

        Args:
          sample_fn: ``key -> (x, target)`` — or, when ``sample_data``
            is given, ``(key, data) -> (x, target)``; traced inside the
            scan (e.g. an ImageSampler generating random pixel batches).
          n_steps: static step count per call.
          sample_data: optional device pytree (e.g. a pixel pool) passed
            through as a jit *argument*.  Large arrays must flow this
            way — a closure capture would embed them as constants in
            the compiled program.

        Returns a jitted ``loop(state, key) -> (state, losses[n_steps])``.
        """
        has_data = sample_data is not None

        def loop(state, key, data):
            def body(st, i):
                k = jax.random.fold_in(key, i)
                x, t = sample_fn(k, data) if has_data else sample_fn(k)
                st, loss = self._training_step(st, x, t, None)
                return st, loss

            return jax.lax.scan(body, state, jnp.arange(n_steps))

        jitted = jax.jit(loop, donate_argnums=(0,))
        return lambda state, key: jitted(state, key, sample_data)

    def training_loop(self, state: TrainerState, xs, targets):
        """Run one training step per pool entry, all in one dispatch.

        xs/targets: (P, B, D) stacked batch pools living on device."""
        n = xs.shape[0]
        key = (n, xs.shape, targets.shape)
        if key not in self._jit_cache:
            def loop(state, xs, ts):
                def body(st, i):
                    x = jax.lax.dynamic_index_in_dim(xs, i, 0, keepdims=False)
                    t = jax.lax.dynamic_index_in_dim(ts, i, 0, keepdims=False)
                    st, loss = self._training_step(st, x, t, None)
                    return st, loss

                return jax.lax.scan(body, state, jnp.arange(n))

            self._jit_cache[key] = jax.jit(loop, donate_argnums=(0,))
        return self._jit_cache[key](state, xs, targets)

    # -- inference ----------------------------------------------------
    def inference_params(self, state: TrainerState):
        """Params to use for inference — the optimizer's custom weights
        (EMA/Average) if any (trainer.h:329-333)."""
        cw = self.optimizer.custom_weights(state.opt_state, state.params)
        return cw if cw is not None else state.params

    @functools.cached_property
    def _jitted_inference(self):
        return jax.jit(lambda p, x: self.model.inference(p, x))

    def inference(self, state: TrainerState, x) -> jax.Array:
        return self._jitted_inference(self.inference_params(state), x)

    @functools.cached_property
    def _jitted_forward(self):
        return jax.jit(lambda p, x: self.model.apply(p, x))

    def forward(self, state: TrainerState, x) -> jax.Array:
        return self._jitted_forward(state.params, x)

    def evaluate_loss(self, state: TrainerState, x, target, pdf=None) -> jax.Array:
        pred = self.forward(state, x)
        return self.loss(pred.astype(jnp.float32), target, pdf)

    # -- runtime hyperparameters ---------------------------------------
    def update_hyperparams(self, cfg: Dict[str, Any]) -> None:
        """Runtime update of loss/optimizer hyperparams
        (trainer.h:213-224).  Invalidate all jitted step closures so the
        new values take effect on the next call."""
        if "optimizer" in cfg:
            self.optimizer.update_hyperparams(cfg["optimizer"])
        if "loss" in cfg:
            self.loss.update_hyperparams(cfg["loss"])
        self.invalidate_jit_cache()

    def invalidate_jit_cache(self) -> None:
        for attr in ("_jitted_step", "_jitted_step_no_pdf",
                     "_jitted_step_external", "_jitted_inference",
                     "_jitted_forward"):
            self.__dict__.pop(attr, None)
        self._jit_cache.clear()

    # -- checkpointing ------------------------------------------------
    def serialize(self, state: TrainerState,
                  serialize_optimizer: bool = True) -> Dict[str, Any]:
        from .utils import serialization

        return serialization.serialize_trainer(self, state, serialize_optimizer)

    def deserialize(self, data: Dict[str, Any],
                    state: Optional[TrainerState] = None) -> TrainerState:
        from .utils import serialization

        return serialization.deserialize_trainer(self, data, state)
