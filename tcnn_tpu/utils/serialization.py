"""Checkpoint (de)serialization.

The reference serializes params + optimizer state as JSON with embedded
base64 binary blobs (trainer.h:275-315, gpu_memory_json.h:37-72,
adam.h:278-299).  The TPU build keeps the same *shape* of contract —
a JSON-compatible dict with a ``params_binary``-equivalent payload —
expressed over pytrees:

  * ``serialize_trainer``   → dict {n_params, params (flat leaves as
    base64 npy blobs), optimizer state, step}
  * ``save/load``           → single-file .npz-style container

Checkpoints are host-side dicts; use json.dump / pickle / your own
transport.  All leaves round-trip bit-exactly (fp32 master params).
"""

from __future__ import annotations

import base64
import io
import json
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _encode_array(x) -> Dict[str, Any]:
    x = np.asarray(jax.device_get(x))
    buf = io.BytesIO()
    np.save(buf, x, allow_pickle=False)
    return {"__ndarray__": base64.b64encode(buf.getvalue()).decode("ascii")}


def _decode_array(d: Dict[str, Any]) -> np.ndarray:
    raw = base64.b64decode(d["__ndarray__"])
    return np.load(io.BytesIO(raw), allow_pickle=False)


def tree_to_json(tree) -> Any:
    """Pytree of arrays → JSON-compatible nested structure."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {
        "treedef": str(treedef),
        "leaves": [_encode_array(l) for l in leaves],
    }


def tree_from_json(data: Any, like) -> Any:
    """Inverse of tree_to_json; ``like`` provides the treedef and leaf
    dtypes/shapes for validation."""
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = [jnp.asarray(_decode_array(d)) for d in data["leaves"]]
    if len(leaves) != len(leaves_like):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, model expects "
            f"{len(leaves_like)}")
    for got, want in zip(leaves, leaves_like):
        if got.shape != want.shape:
            raise ValueError(
                f"checkpoint leaf shape {got.shape} != model {want.shape}")
    leaves = [l.astype(w.dtype) for l, w in zip(leaves, leaves_like)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def check_replicated(tree, what: str = "state") -> None:
    """Refuse device-sharded leaves: fetching them would checkpoint the
    DEVICE layout (e.g. HybridParallel's block-cyclic table order), not
    the canonical one.  Gather first (``hp.gather_state(state)``)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        sh = getattr(leaf, "sharding", None)
        if sh is not None and not sh.is_fully_replicated:
            raise ValueError(
                f"{what} leaf {jax.tree_util.keystr(path)} is device-"
                f"sharded ({sh}); serialize the canonical layout via "
                f"HybridParallel.gather_state(state) first")


def serialize_trainer(trainer, state, serialize_optimizer: bool = True
                      ) -> Dict[str, Any]:
    """≈ Trainer::serialize (trainer.h:275-288)."""
    check_replicated(state, "TrainerState")
    data: Dict[str, Any] = {
        "otype": "Trainer",
        "n_params": trainer.model.n_params(state.params),
        "params_type": "float",
        "params": tree_to_json(state.params),
        "step": int(jax.device_get(state.step)),
        "hyperparams": {
            "model": trainer.model.hyperparams(),
            "loss": trainer.loss.hyperparams(),
            "optimizer": trainer.optimizer.hyperparams(),
        },
    }
    if serialize_optimizer:
        data["optimizer"] = tree_to_json(state.opt_state)
    return data


def deserialize_trainer(trainer, data: Dict[str, Any], state=None):
    """≈ Trainer::deserialize (trainer.h:290-315)."""
    from ..trainer import TrainerState

    if state is None:
        state = trainer.initial_state()
    params = tree_from_json(data["params"], state.params)
    if "optimizer" in data:
        opt_state = tree_from_json(data["optimizer"], state.opt_state)
    else:
        opt_state = state.opt_state
    return TrainerState(
        params=params,
        opt_state=opt_state,
        step=jnp.asarray(data.get("step", 0), jnp.uint32),
    )


def save(path: str, data: Dict[str, Any]) -> None:
    with open(path, "w") as f:
        json.dump(data, f)


def load(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)
