"""Hybrid data × model parallelism: row-sharded grid tables.

The reference is strictly single-GPU (SURVEY.md §2.9), so its hash
tables are bounded by one device's memory.  This module adds the
TPU-native scaling axis the reference cannot have: a 2-D
``(data, model)`` mesh where

* the sample batch is sharded FLAT over the whole mesh (every device
  holds distinct samples — MLP and loss compute scale with all chips),
  and
* every grid ENCODING TABLE (and its optimizer state) is row-sharded
  over ``model`` in a BLOCK-CYCLIC layout — each device holds rows
  [i·S_l/n, (i+1)·S_l/n) of EVERY level l (so a shard is itself a
  valid smaller grid with static geometry and the production Pallas /
  MXU kernels run on it unchanged) — letting BTF-scale grids (4-D
  composites at log2_hashmap_size ≥ 21) exceed a single chip's HBM.

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

    hp = HybridParallel(n_model=4, model=model)  # 4-way tables
    state = hp.shard_state(model.trainer.initial_state())
    step = hp.make_training_step(model.trainer)
    state, loss = step(state, hp.shard_batch(x), hp.shard_batch(y))
    canonical = hp.gather_state(state)           # for checkpoint/export

``model`` (the module / TrainableModel / Trainer) provides the grid
specs the block-cyclic permutation needs; tables whose level sizes do
not all divide ``n_model`` (and every non-grid parameter) are left
replicated automatically.  The device→host inverse lives in
:meth:`HybridParallel.gather_state`: checkpoints and reference-format
exports always see the canonical row order.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
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


def _norm_path(path) -> Tuple:
    """jax.tree_util key path → plain key tuple (str / int), matching
    the paths :meth:`tcnn_tpu.module.Module.grid_specs` reports."""
    out = []
    for entry in path:
        if isinstance(entry, jax.tree_util.DictKey):
            out.append(entry.key)
        elif isinstance(entry, jax.tree_util.SequenceKey):
            out.append(entry.idx)
        elif isinstance(entry, jax.tree_util.GetAttrKey):
            out.append(entry.name)
        elif isinstance(entry, jax.tree_util.FlattenedIndexKey):
            out.append(entry.key)
        else:  # pragma: no cover - future key kinds
            out.append(str(entry))
    return tuple(out)


def _tree_key(tree) -> Tuple:
    """Cache key for spec-dependent wrappers: tree structure plus every
    leaf's shape (the PartitionSpecs are shape-dependent)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return treedef, tuple(getattr(l, "shape", ()) for l in leaves)


def _resolve_module(model):
    """Accept the module itself, a Trainer, or a TrainableModel."""
    if hasattr(model, "grid_specs"):
        return model
    for attr in ("model", "network"):
        sub = getattr(model, attr, None)
        if sub is not None and hasattr(sub, "grid_specs"):
            return sub
    trainer = getattr(model, "trainer", None)
    if trainer is not None and hasattr(trainer.model, "grid_specs"):
        return trainer.model
    raise TypeError(
        f"cannot resolve a module with grid_specs() from {type(model)}")


class HybridParallel:
    """Data-parallel batch + model-parallel (row-sharded) grid tables.

    ``model`` — the module (or its Trainer / TrainableModel bundle) —
    supplies per-table :class:`GridSpec`s: row-sharding uses the
    block-cyclic layout (:func:`grid_ops.block_cyclic_perm`), which
    needs the level geometry.  Without it every table stays replicated.
    """

    def __init__(self, mesh: Optional[Mesh] = None, *,
                 n_model: Optional[int] = None,
                 devices: Optional[Sequence[jax.Device]] = None,
                 data_axis: str = "data", model_axis: str = "model",
                 model: Any = None):
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
        # {table param path: (GridSpec, block-cyclic perm, inverse
        # perm)} for every grid whose levels split n_model ways; perms
        # are computed once (host numpy) and reused for every matching
        # leaf (params AND the mirrored optimizer moments / wrapper
        # weight copies).
        self._tables = {}
        if model is not None and self.n_model > 1:
            for path, spec in _resolve_module(model).grid_specs().items():
                if grid_ops.shardable_levels(spec, self.n_model):
                    perm = grid_ops.block_cyclic_perm(spec, self.n_model)
                    self._tables[path] = (spec, perm, np.argsort(perm))

    @property
    def n_devices(self) -> int:
        return self.mesh.size

    # -- sharding specs -------------------------------------------------
    def _table_perm(self, path, leaf) -> Optional[Tuple]:
        """``(perm, inverse_perm)`` if this leaf is a grid table or one
        of its per-param mirrors (optimizer moments, wrapper weight
        copies / ring buffers — their paths END with the param's path).
        Mirrors may carry leading batch-like axes (e.g. the Average
        optimizer's ``(n_samples, N)`` ring buffer): the table rows are
        always the LAST axis."""
        ndim = getattr(leaf, "ndim", 0)
        if ndim < 1:
            return None
        norm = _norm_path(path)
        for tpath, (spec, perm, inv) in self._tables.items():
            if norm[-len(tpath):] == tpath and leaf.shape[-1] == perm.size:
                return perm, inv
        return None

    def _leaf_spec(self, path, leaf) -> P:
        if self._table_perm(path, leaf) is not None:
            return P(*([None] * (leaf.ndim - 1)), self.model_axis)
        return P()

    def specs(self, tree: Any) -> Any:
        """PartitionSpec pytree for a params / opt-state / TrainerState
        tree: grid tables (and their mirrored optimizer moments) sharded
        on ``model``, everything else replicated."""
        return jax.tree_util.tree_map_with_path(self._leaf_spec, tree)

    # -- placement ------------------------------------------------------
    def shard_state(self, tree: Any) -> Any:
        """Place a params / opt-state / TrainerState tree on the mesh:
        grid-table leaves (and their per-param mirrors) are permuted
        into the block-cyclic device layout and sharded over ``model``;
        everything else is replicated.  Inverse: :meth:`gather_state`.
        """
        def place(path, leaf):
            hit = self._table_perm(path, leaf)
            if hit is None:
                return jax.device_put(
                    leaf, NamedSharding(self.mesh, P()))
            perm, _ = hit
            return jax.device_put(
                jnp.asarray(leaf)[..., perm],
                NamedSharding(self.mesh, self._leaf_spec(path, leaf)))

        return jax.tree_util.tree_map_with_path(place, tree)

    def gather_state(self, tree: Any) -> Any:
        """Inverse of :meth:`shard_state`: fully replicated host-order
        arrays with table leaves back in the canonical row order —
        what checkpoints and reference-format exports must see."""
        def unplace(path, leaf):
            hit = self._table_perm(path, leaf)
            arr = jax.device_get(leaf)
            if hit is None:
                return arr
            return arr[..., hit[1]]

        return jax.tree_util.tree_map_with_path(unplace, tree)

    def shard_batch(self, x: jax.Array) -> jax.Array:
        from .mesh import shard_batch_over

        return shard_batch_over(x, self.batch_sharding, self.n_devices)

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
            # Key on structure AND leaf shapes: the in_specs depend on
            # leaf.shape (table-size match), so two states with equal
            # treedefs but different table sizes must not share specs.
            key = _tree_key(state)
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
            key = _tree_key(params)
            if key not in cache:
                fn = jax.shard_map(
                    _infer, mesh=self.mesh,
                    in_specs=(self.specs(params), P_b),
                    out_specs=P_b, check_vma=False)
                cache[key] = jax.jit(fn)
            return cache[key](params, x)

        return infer
