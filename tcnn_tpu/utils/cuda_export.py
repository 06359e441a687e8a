"""Exporter to the reference (tiny-cuda-nn) CUDA snapshot format.

Inverse of :mod:`cuda_import` — writes the nlohmann JSON-with-binary
structure of ``Trainer::serialize`` (trainer.h:275-287) and Adam's
``serialize`` (adam.h:278-287):

    {"n_params": N, "params_type": "float"|"__half",
     "params_binary": <bytes>,
     "optimizer": {"current_step": s, "base_learning_rate": lr,
                   "first_moments_binary": <f32>,
                   "second_moments_binary": <f32>,
                   "param_steps_binary": <u32>}}

so a CUDA-side ``Trainer::deserialize`` can consume TPU-trained params
(and vice versa for cross-validation whenever a GPU is available).

Buffer layout written (the reference's, network_with_input_encoding.h:
115-130): network weight matrices first, each ROW-MAJOR (out, in) with
the reference's 16-wide padding re-inserted as zeros (the import's
strict check requires padded columns to be zero, so export→import
round-trips bit-exactly), followed by the grid tables flat.

Two on-disk forms, matching what nlohmann emits: text JSON with binary
values rendered ``{"bytes": [...], "subtype": null}``, or msgpack with
native bin values (``json::to_msgpack`` / ``from_msgpack``).
"""

from __future__ import annotations

import json
from typing import Any, Dict

import numpy as np

from .cuda_import import _ref_matrix_dims


def _export_matrix(ours: np.ndarray, ref_shape,
                   dtype=np.float32) -> np.ndarray:
    """Our (in, out) matrix → reference RM (out_pad, in_pad) flat, with
    zero padding."""
    rows, cols = ref_shape
    ours = np.asarray(ours, dtype)
    in_dim, out_dim = ours.shape
    m = np.zeros((rows, cols), dtype)
    m[:out_dim, :in_dim] = ours.T
    return m.reshape(-1)


def _flatten_reference_layout(model, tree,
                              dtype=np.float32) -> np.ndarray:
    """Param-shaped pytree → reference-layout flat buffer.

    ``dtype`` must stay exact for the tree's values — integer state
    (Adam ``param_steps`` u32 counters) is flattened with
    ``dtype=np.uint32`` so counters above 2^24 survive (an f32 pass
    would round them)."""
    network = getattr(model, "network", model)
    encoding = getattr(model, "encoding", None)
    if encoding is not None:
        net_tree = tree["network"]
        enc_tree = tree["encoding"]
    else:
        net_tree, enc_tree = tree, None
    dims = _ref_matrix_dims(network)
    mats = [_export_matrix(np.asarray(m, dtype), rd, dtype)
            for m, rd in zip(net_tree["layers"], dims)]
    parts = mats
    if enc_tree is not None:
        # Encoding params flat, in the encoding's own param order —
        # {"grid": table} for grids, {} for paramless encodings, nested
        # containers for Composite (nested params in order, matching
        # the reference's [network|encoding] buffer layout,
        # network_with_input_encoding.h:115-130).
        import jax

        parts = mats + [np.asarray(leaf, dtype).reshape(-1)
                        for leaf in jax.tree_util.tree_leaves(enc_tree)]
    return np.concatenate(parts) if parts else np.zeros((0,), dtype)


def export_snapshot(trainer, state, serialize_optimizer: bool = False,
                    params_type: str = "float") -> Dict[str, Any]:
    """TrainerState → reference-format snapshot dict (binary values as
    python ``bytes``; use :func:`save_snapshot` to serialize)."""
    import jax

    from .serialization import check_replicated

    check_replicated(state, "TrainerState")
    params_np = jax.device_get(state.params)
    flat = _flatten_reference_layout(trainer.model, params_np)
    if params_type == "float":
        blob = flat.astype("<f4").tobytes()
    elif params_type == "__half":
        blob = flat.astype("<f2").tobytes()
    else:
        raise ValueError(f"unknown params_type {params_type!r}")

    data: Dict[str, Any] = {
        "n_params": int(flat.size),
        "params_type": params_type,
        "params_binary": blob,
    }
    if serialize_optimizer:
        os_ = jax.device_get(state.opt_state)
        # Unwrap wrapper optimizers (EMA/Average/Lookahead/...) down to
        # the Adam core — the reference's nested serialize does the
        # same descent (e.g. ema.h recurses into its nested optimizer).
        opt_obj = trainer.optimizer
        while (isinstance(os_, dict) and "nested" in os_
               and not {"mu", "nu"} <= set(os_)):
            os_ = os_["nested"]
            opt_obj = getattr(opt_obj, "_nested", opt_obj)
        if not (isinstance(os_, dict) and {"mu", "nu"} <= set(os_)):
            raise ValueError(
                "optimizer state is not Adam-shaped (mu/nu); only Adam "
                "snapshots exist in the reference format (adam.h:278-287)")
        mu = _flatten_reference_layout(trainer.model, os_["mu"])
        nu = _flatten_reference_layout(trainer.model, os_["nu"])
        opt: Dict[str, Any] = {
            "current_step": int(os_.get("step", state.step)),
            "base_learning_rate": float(opt_obj.learning_rate),
            "first_moments_binary": mu.astype("<f4").tobytes(),
            "second_moments_binary": nu.astype("<f4").tobytes(),
        }
        if "param_steps" in os_:
            ps = _flatten_reference_layout(trainer.model, os_["param_steps"],
                                           dtype=np.uint32)
            opt["param_steps_binary"] = ps.astype("<u4").tobytes()
        data["optimizer"] = opt
    return data


def _to_text_json(data):
    """Render binary values the way nlohmann prints them in text JSON."""
    if isinstance(data, bytes):
        return {"bytes": list(data), "subtype": None}
    if isinstance(data, dict):
        return {k: _to_text_json(v) for k, v in data.items()}
    if isinstance(data, list):
        return [_to_text_json(v) for v in data]
    return data


def save_snapshot(path, data: Dict[str, Any], form: str = "msgpack") -> None:
    """Write a snapshot dict produced by :func:`export_snapshot`.

    form="msgpack" (default): nlohmann ``json::from_msgpack`` restores
    binary values natively — the form a CUDA-side
    ``Trainer::deserialize`` can actually consume.
    form="json": text JSON in nlohmann's binary RENDERING
    (``{"bytes": [...], "subtype": null}``).  Note nlohmann's
    ``json::parse`` does NOT turn that rendering back into binary
    values, so this form round-trips through :mod:`cuda_import` (which
    understands it) but not through the CUDA reference directly.
    """
    if form == "json":
        with open(path, "w") as f:
            json.dump(_to_text_json(data), f)
    elif form == "msgpack":
        import msgpack

        with open(path, "wb") as f:
            f.write(msgpack.packb(data, use_bin_type=True))
    else:
        raise ValueError(f"unknown form {form!r}")
