"""Hybrid data × model parallelism: row-sharded grid tables.

The reference is strictly single-GPU (SURVEY.md §2.9), so its hash
tables are bounded by one device's memory.  This module adds the
TPU-native scaling axis the reference cannot have: a 2-D
``(data, model)`` mesh where

* the sample batch is sharded FLAT over the whole mesh (every device
  holds distinct samples — MLP and loss compute scale with all chips),
  and
* every grid ENCODING TABLE (and its optimizer state) is row-sharded
  over ``model`` — each device holds a contiguous ``n_entries/n_model``
  row range of each table, so BTF-scale grids (4-D composites at
  log2_hashmap_size ≥ 21) can exceed a single chip's HBM.

Execution model (inside :func:`jax.shard_map`; the Megatron-style
sharded-embedding pattern): every rank ``all_gather``s its model
group's batch, interpolates ONLY the corner rows it owns for all of it
(out-of-shard corners get zero weight, see
:func:`tcnn_tpu.ops.grid_ops.sharded_tables`), and a ``psum_scatter``
over ``model`` simultaneously sums the partial features and returns
each rank exactly its own batch columns.  Gather work per device stays
at the model group's batch (a sample may touch any shard — that is
irreducible), while MLP/loss work shards ``n_model``× further.  Table
gradients need no collective of their own: the all_gather transpose
routes every rank's cotangents to the owning shard, and the
(elementwise) optimizer updates each shard locally.  MLP parameters
stay replicated with a gradient ``pmean`` over the whole mesh.

Usage::

    hp = HybridParallel(n_model=4)            # all devices, 4-way tables
    state = hp.shard_state(model.trainer.initial_state())
    step = hp.make_training_step(model.trainer)
    state, loss = step(state, hp.shard_batch(x), hp.shard_batch(y))

Tables whose row count does not divide ``n_model`` (and every non-grid
parameter) are left replicated automatically.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import grid_ops


def make_hybrid_mesh(n_model: int,
                     devices: Optional[Sequence[jax.Device]] = None,
                     data_axis: str = "data",
                     model_axis: str = "model") -> Mesh:
    """(n_devices/n_model, n_model) mesh; model axis innermost so table
    psums ride the fastest ICI links."""
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % n_model:
        raise ValueError(
            f"{len(devices)} devices not divisible by n_model={n_model}")
    arr = np.asarray(devices).reshape(len(devices) // n_model, n_model)
    return Mesh(arr, (data_axis, model_axis))


def _is_grid_table_path(path) -> bool:
    """Grid tables are the flat 1-D leaves stored under a 'grid' key
    (GridEncoding.init); optimizer state mirrors the param tree, so its
    mu/nu/steps for the table match the same path suffix."""
    for entry in path:
        if isinstance(entry, jax.tree_util.DictKey) and entry.key == "grid":
            return True
    return False


class HybridParallel:
    """Data-parallel batch + model-parallel (row-sharded) grid tables."""

    def __init__(self, mesh: Optional[Mesh] = None, *,
                 n_model: Optional[int] = None,
                 devices: Optional[Sequence[jax.Device]] = None,
                 data_axis: str = "data", model_axis: str = "model"):
        if mesh is None:
            if n_model is None:
                raise ValueError("pass a 2-D mesh or n_model")
            mesh = make_hybrid_mesh(n_model, devices, data_axis, model_axis)
        if (data_axis not in mesh.axis_names
                or model_axis not in mesh.axis_names):
            raise ValueError(
                f"mesh axes {mesh.axis_names} must include "
                f"'{data_axis}' and '{model_axis}'")
        self.mesh = mesh
        self.data_axis = data_axis
        self.model_axis = model_axis
        self.n_data = mesh.shape[data_axis]
        self.n_model = mesh.shape[model_axis]
        # The batch shards FLAT over the whole mesh (all devices hold
        # distinct samples): MLP/loss compute scales with every chip,
        # not just the data axis.
        self.batch_sharding = NamedSharding(mesh, P((data_axis, model_axis)))
        self.replicated = NamedSharding(mesh, P())

    @property
    def n_devices(self) -> int:
        return self.mesh.size

    # -- sharding specs -------------------------------------------------
    def _leaf_spec(self, path, leaf) -> P:
        if (_is_grid_table_path(path) and getattr(leaf, "ndim", None) == 1
                and leaf.shape[0] % self.n_model == 0):
            return P(self.model_axis)
        return P()

    def specs(self, tree: Any) -> Any:
        """PartitionSpec pytree for a params / opt-state / TrainerState
        tree: grid tables (and their mirrored optimizer moments) sharded
        on ``model``, everything else replicated."""
        return jax.tree_util.tree_map_with_path(self._leaf_spec, tree)

    # -- placement ------------------------------------------------------
    def shard_state(self, tree: Any) -> Any:
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(
                leaf, NamedSharding(self.mesh, self._leaf_spec(path, leaf))),
            tree)

    def shard_batch(self, x: jax.Array) -> jax.Array:
        if x.shape[0] % self.n_devices:
            raise ValueError(
                f"batch size {x.shape[0]} not divisible by mesh size "
                f"{self.n_devices}")
        return jax.device_put(x, self.batch_sharding)

    # -- compiled steps ---------------------------------------------------
    def step_shard_map(self, trainer, with_pdf: bool = False):
        """UNJITTED shard_map training step ``(state, x, target[, pdf])
        -> (state, loss)``; compose your own jit/scan around it.

        Returns a ``make(state_example)`` factory (the shard_map specs
        depend on the state's tree structure).
        """
        from tcnn_tpu.trainer import TrainerState

        data_axis, model_axis, n_model = \
            self.data_axis, self.model_axis, self.n_model

        def make(state_example):
            state_spec = self.specs(state_example)
            param_specs = state_spec.params

            def _per_shard(state, x, target, pdf):
                salt = ((jax.lax.axis_index(data_axis) * n_model
                         + jax.lax.axis_index(model_axis))
                        if trainer.perturbation_sigma else None)
                with grid_ops.sharded_tables(model_axis, n_model):
                    loss_value, grads = trainer.loss_value_and_grads(
                        state.params, x, target, pdf, step=state.step,
                        noise_key_salt=salt)
                # Gradient combination (equal shard sizes make every
                # pmean the exact mean of local-mean losses):
                # * replicated leaves (MLP, non-grid encodings): each
                #   rank holds the grad of ITS local loss → pmean over
                #   the whole mesh, standard flat DP.
                # * sharded tables: the all_gather transpose already
                #   summed every model rank's local-loss cotangents
                #   into the owning shard (Σ_ranks loss), so the grad
                #   of the group-MEAN loss is that ÷ n_model, then
                #   pmean over `data`.  No collective touches the
                #   table rows themselves.
                grads = jax.tree_util.tree_map(
                    lambda spec, g:
                    jax.lax.pmean(g, data_axis) / n_model
                    if spec == P(model_axis)
                    else jax.lax.pmean(g, (data_axis, model_axis)),
                    param_specs, grads,
                    is_leaf=lambda v: isinstance(v, P))
                loss_value = jax.lax.pmean(loss_value,
                                           (data_axis, model_axis))
                opt_state, params = trainer.optimizer.step(
                    state.opt_state, grads, state.params)
                return (TrainerState(params=params, opt_state=opt_state,
                                     step=state.step + 1), loss_value)

            P_b = P((data_axis, model_axis))
            if with_pdf:
                return jax.shard_map(
                    _per_shard, mesh=self.mesh,
                    in_specs=(state_spec, P_b, P_b, P_b),
                    out_specs=(state_spec, P()), check_vma=False)
            return jax.shard_map(
                lambda s, x, t: _per_shard(s, x, t, None), mesh=self.mesh,
                in_specs=(state_spec, P_b, P_b),
                out_specs=(state_spec, P()), check_vma=False)

        return make

    def make_training_step(self, trainer, with_pdf: bool = False):
        """Jitted hybrid step.  shard_map in/out specs depend on the
        state's tree structure, so the returned callable builds (and
        caches) the wrapped step from the first state it sees."""
        make = self.step_shard_map(trainer, with_pdf=with_pdf)
        cache = {}

        def step(state, *batch):
            key = jax.tree_util.tree_structure(state)
            if key not in cache:
                cache[key] = jax.jit(make(state), donate_argnums=(0,))
            return cache[key](state, *batch)

        return step

    def make_inference(self, trainer):
        """Batch-sharded, table-sharded inference."""
        model_axis, n_model = self.model_axis, self.n_model

        def _infer(params, x):
            with grid_ops.sharded_tables(model_axis, n_model):
                return trainer.model.inference(params, x)

        cache = {}

        P_b = P((self.data_axis, self.model_axis))

        def infer(params, x):
            key = jax.tree_util.tree_structure(params)
            if key not in cache:
                fn = jax.shard_map(
                    _infer, mesh=self.mesh,
                    in_specs=(self.specs(params), P_b),
                    out_specs=P_b, check_vma=False)
                cache[key] = jax.jit(fn)
            return cache[key](params, x)

        return infer
