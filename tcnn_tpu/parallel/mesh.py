"""Data-parallel scaling over a TPU mesh.

The reference is strictly single-GPU (SURVEY.md §2.9); this subsystem is
the *new* TPU-native scaling story prescribed by BASELINE.json: shard
the sample batch (pixels/rays) over all chips, replicate parameters,
and let XLA all-reduce parameter gradients over ICI (the psum appears
automatically from jit's partitioner given the shardings, and XLA
overlaps it with the remaining backward computation — the role the
reference's side-stream wgrad GEMMs play on one GPU,
fully_fused_mlp.cu:782-829).

Usage:
    dp = DataParallel()                       # all visible devices
    state = dp.replicate(trainer.initial_state())
    step = dp.make_training_step(trainer)
    state, loss = step(state, dp.shard_batch(x), dp.shard_batch(y))

Multi-host: call jax.distributed.initialize() before constructing
DataParallel (standard JAX runtime; DCN handled by the same mesh).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch_over(x: jax.Array, sharding: NamedSharding,
                     n_devices: int) -> jax.Array:
    """Place a (B, ...) array batch-sharded; shared by DataParallel and
    HybridParallel so the divisibility contract lives in one place."""
    if x.shape[0] % n_devices:
        raise ValueError(
            f"batch size {x.shape[0]} not divisible by mesh size "
            f"{n_devices}")
    return jax.device_put(x, sharding)


class DataParallel:
    """Pure data parallelism: batch sharded on ``data``, params
    replicated, gradient psum inserted by the jit partitioner."""

    def __init__(self, mesh: Optional[Mesh] = None, axis_name: str = "data"):
        self.axis_name = axis_name
        self.mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
        self.batch_sharding = NamedSharding(self.mesh, P(axis_name))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def n_devices(self) -> int:
        return self.mesh.size

    # -- placement ----------------------------------------------------
    def shard_batch(self, x: jax.Array) -> jax.Array:
        """Place a (B, ...) array with B sharded across the mesh."""
        return shard_batch_over(x, self.batch_sharding, self.n_devices)

    def replicate(self, tree: Any) -> Any:
        return jax.device_put(tree, self.replicated)

    # -- compiled steps -----------------------------------------------
    def make_training_step(self, trainer, with_pdf: bool = False,
                           use_shard_map: bool = True):
        """Compile the trainer's step data-parallel over the mesh.

        Two equivalent lowerings:

        * ``use_shard_map=True`` (the default): the step body runs
          per-shard inside :func:`jax.shard_map` — each device computes
          loss+grads on ITS batch shard (so the Pallas kernels see a
          plain local batch and need no SPMD partitioning rules), then
          grads/loss are ``pmean``-ed over ICI and the optimizer update
          runs replicated.  This is the production path: it is the only
          lowering under which pallas_call executes data-parallel.
        * ``use_shard_map=False``: plain jit with shardings, leaving
          partitioning to XLA's SPMD pass.  Correct for the pure-XLA
          compute path; XLA cannot partition pallas_call, so this
          lowering is only for kernel-free runs / comparison.

        Output-perturbation training (perturbation_sigma) runs under
        shard_map too: each shard folds its ``axis_index`` into the
        noise key, so shards draw independent logistic noise (same
        distribution as single-device training, different stream —
        without the salt every shard would repeat one noise pattern).

        The gradient all-reduce over ICI is the TPU replacement for the
        reference's side-stream wgrad overlap
        (fully_fused_mlp.cu:782-829): XLA overlaps the psum with the
        remaining backward chain.
        """
        state_s = self.replicated
        batch_s = self.batch_sharding
        n_batch_args = 3 if with_pdf else 2
        if not use_shard_map:
            return trainer.make_training_step(
                with_pdf=with_pdf,
                in_shardings=(state_s,) + (batch_s,) * n_batch_args,
                out_shardings=(state_s, state_s),
            )
        fn = self.step_shard_map(trainer, with_pdf=with_pdf)
        return jax.jit(fn, donate_argnums=(0,))

    def step_shard_map(self, trainer, with_pdf: bool = False):
        """UNJITTED shard_map-wrapped step ``(state, x, target[, pdf])
        -> (state, loss)`` — for callers composing their own jit/scan
        around the data-parallel step (scaling bench, the multi-host
        launcher, custom loops)."""
        from tcnn_tpu.trainer import TrainerState

        axis = self.axis_name

        def _per_shard(state, x, target, pdf):
            salt = (jax.lax.axis_index(axis)
                    if trainer.perturbation_sigma else None)
            loss_value, grads = trainer.loss_value_and_grads(
                state.params, x, target, pdf, step=state.step,
                noise_key_salt=salt)
            # Per-shard losses are means over the local batch; equal
            # shard sizes make pmean the exact global mean.  Gradients
            # of a mean likewise combine by pmean.
            loss_value = jax.lax.pmean(loss_value, axis)
            grads = jax.lax.pmean(grads, axis)
            opt_state, params = trainer.optimizer.step(
                state.opt_state, grads, state.params)
            return (TrainerState(params=params, opt_state=opt_state,
                                 step=state.step + 1), loss_value)

        P_b, P_r = P(self.axis_name), P()
        if with_pdf:
            return jax.shard_map(
                _per_shard, mesh=self.mesh,
                in_specs=(P_r, P_b, P_b, P_b),
                out_specs=(P_r, P_r), check_vma=False)
        return jax.shard_map(
            lambda state, x, target: _per_shard(state, x, target, None),
            mesh=self.mesh,
            in_specs=(P_r, P_b, P_b),
            out_specs=(P_r, P_r), check_vma=False)

    def make_inference(self, trainer, use_shard_map: bool = True):
        """Batch-sharded inference; shard_map (default) hands each
        device a plain local batch so the Pallas fused-MLP kernel runs
        per-shard without SPMD partitioning rules."""
        if use_shard_map:
            fn = jax.shard_map(
                lambda params, x: trainer.model.inference(params, x),
                mesh=self.mesh,
                in_specs=(P(), P(self.axis_name)),
                out_specs=P(self.axis_name), check_vma=False)
            return jax.jit(fn)
        return jax.jit(
            lambda params, x: trainer.model.inference(params, x),
            in_shardings=(self.replicated, self.batch_sharding),
            out_shardings=self.batch_sharding,
        )
