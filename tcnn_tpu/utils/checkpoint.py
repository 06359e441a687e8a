"""Production checkpoint/resume via orbax (sharded-aware, async).

Two checkpoint systems coexist by design (SURVEY.md §5):

* :mod:`tcnn_tpu.utils.serialization` / ``cuda_export`` — the
  REFERENCE-parity JSON(+binary) snapshots (trainer.h:275-315) for
  cross-framework validation; replicated canonical layout only.
* this module — the TPU-native production path: orbax checkpoints of
  the whole :class:`TrainerState` pytree that (a) preserve device
  shardings, so a :class:`HybridParallel` run checkpoints its
  block-cyclic table shards in place (each host writes only the shards
  it owns — no gather, multi-host safe) and restores them sharded, and
  (b) can save asynchronously so training continues while the write
  drains to disk.

Usage::

    from tcnn_tpu.utils import checkpoint as ckpt
    ckpt.save_checkpoint(path, state)                    # one-shot
    state = ckpt.restore_checkpoint(path, like=state0)   # shardings from like

    mgr = ckpt.make_manager(dir, max_to_keep=3, save_interval_steps=100)
    for ...:
        state, loss = step(state, x, t)
        ckpt.save_step(mgr, state)        # no-op between intervals
    state = ckpt.restore_latest(mgr, like=state0)
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.fspath(path))


def _abstract_like(like: Any) -> Any:
    """Abstract pytree carrying shapes/dtypes AND target shardings."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x, like)


_LAYOUT_NAME = "table_layout.json"


def check_layout_tag(directory: str, layout: dict) -> None:
    """Record/validate the table layout baked into checkpointed arrays.

    A :class:`HybridParallel` run checkpoints grid tables in its
    block-cyclic device row order, so a checkpoint is only meaningful
    under the SAME layout (e.g. the same ``n_model``).  First call
    writes ``table_layout.json`` beside the checkpoints (process 0);
    later calls raise if ``layout`` differs — resuming with a different
    ``--n-model`` would silently restore permuted tables otherwise.
    """
    import json

    path = os.path.join(_abs(directory), _LAYOUT_NAME)
    if os.path.exists(path):
        with open(path) as fh:
            recorded = json.load(fh)
        if recorded != layout:
            raise ValueError(
                f"checkpoint dir {directory} was written with table "
                f"layout {recorded}, but this run uses {layout}; "
                "resuming would silently restore permuted grid tables. "
                "Use a fresh --ckpt-dir or match the recorded layout.")
    elif jax.process_index() == 0:
        os.makedirs(_abs(directory), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(layout, fh)


def save_checkpoint(path: str, state: Any, *, force: bool = True) -> None:
    """Write ``state`` (any pytree; sharded leaves stay sharded) to
    ``path`` (a directory), blocking until durable."""
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_abs(path), state, force=force)


def restore_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``like`` supplies the tree structure, dtypes, and — crucially —
    the target SHARDINGS: pass the same state the run would otherwise
    start from (e.g. ``hp.shard_state(trainer.initial_state())`` for a
    hybrid run) and each leaf lands directly on its devices.
    """
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_abs(path), _abstract_like(like))


def make_manager(directory: str, *, max_to_keep: int = 3,
                 save_interval_steps: int = 1,
                 async_save: bool = True):
    """Step-indexed checkpoint manager: keeps the newest
    ``max_to_keep``, saves every ``save_interval_steps`` steps,
    asynchronously by default (training continues while the previous
    write drains; the manager blocks only if a save is still in
    flight when the next one starts)."""
    ocp = _ocp()
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        save_interval_steps=save_interval_steps,
        enable_async_checkpointing=async_save,
    )
    return ocp.CheckpointManager(_abs(directory), options=options)


def save_step(manager, state: Any, step: Optional[int] = None) -> bool:
    """Save ``state`` at its step index (TrainerState.step by default);
    returns False when skipped by the save interval."""
    ocp = _ocp()
    if step is None:
        step = int(jax.device_get(state.step))
    return manager.save(step, args=ocp.args.StandardSave(state))


def restore_latest(manager, like: Any) -> Optional[Any]:
    """Restore the newest step (shardings from ``like``); None if the
    directory has no checkpoints yet."""
    ocp = _ocp()
    step = manager.latest_step()
    if step is None:
        return None
    manager.wait_until_finished()
    return manager.restore(
        step, args=ocp.args.StandardRestore(_abstract_like(like)))
