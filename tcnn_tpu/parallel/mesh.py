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

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


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
        if x.shape[0] % self.n_devices:
            raise ValueError(
                f"batch size {x.shape[0]} not divisible by mesh size "
                f"{self.n_devices}")
        return jax.device_put(x, self.batch_sharding)

    def replicate(self, tree: Any) -> Any:
        return jax.device_put(tree, self.replicated)

    # -- compiled steps -----------------------------------------------
    def make_training_step(self, trainer, with_pdf: bool = False):
        """jit the trainer's step with explicit shardings: donated
        replicated state, batch-sharded inputs (x, target, and the
        importance-sampling pdf when ``with_pdf``), replicated outputs.

        The resulting executable contains the cross-replica all-reduce
        of parameter gradients (one psum per parameter group, which XLA
        schedules concurrently with unrelated backward work)."""
        state_s = self.replicated
        batch_s = self.batch_sharding
        n_batch_args = 3 if with_pdf else 2
        return trainer.make_training_step(
            with_pdf=with_pdf,
            in_shardings=(state_s,) + (batch_s,) * n_batch_args,
            out_shardings=(state_s, state_s),
        )

    def make_inference(self, trainer):
        return jax.jit(
            lambda params, x: trainer.model.inference(params, x),
            in_shardings=(self.replicated, self.batch_sharding),
            out_shardings=self.batch_sharding,
        )
