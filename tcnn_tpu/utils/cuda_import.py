"""Importer for reference (tiny-cuda-nn) CUDA training snapshots.

The reference's ``Trainer::serialize`` (trainer.h:275-315) emits
nlohmann JSON with binary blobs (gpu_memory_json.h:37-72):

    {"n_params": N, "params_type": "__half"|"float",
     "params_binary": <bytes>,
     "optimizer": {"current_step": s, "base_learning_rate": lr,
                   "first_moments_binary": <f32 bytes>,
                   "second_moments_binary": <f32 bytes>,
                   "param_steps_binary": <u32 bytes>}}   # adam.h:278-299

In text-JSON dumps, nlohmann renders binary values as
``{"bytes": [..], "subtype": null}``; in msgpack/CBOR dumps they are
native binary.  Both forms are handled.

Parameter buffer ordering (network_with_input_encoding.h:115-130):
``[network params][encoding params]``, where the network's weight
matrices are stored consecutively as ROW-MAJOR (out_dim, in_dim)
matrices (fully_fused_mlp.cu:855-878) — input layer
(width, padded_in), hidden (width, width)×(H−1), output
(padded_out, width) — and the grid encoding's hash tables follow in
level-major order (identical to this framework's flat layout).  This
framework stores matrices as (in_dim, out_dim) with ``y = x @ W``, so
each imported matrix is transposed and sliced free of the reference's
alignment padding.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..common import next_multiple

# The reference's tensor-core alignment for network input/output widths
# (network.h / src/network.cu:76-95 minimum_alignment).
_REF_WIDTH_ALIGNMENT = 16


def load_snapshot(path_or_data) -> Dict[str, Any]:
    """Load a reference snapshot from a path (JSON text or msgpack),
    raw bytes, or an already-parsed dict."""
    if isinstance(path_or_data, dict):
        return path_or_data
    if isinstance(path_or_data, (bytes, bytearray)):
        raw = bytes(path_or_data)
    else:
        with open(path_or_data, "rb") as f:
            raw = f.read()
    # Text JSON?
    try:
        return json.loads(raw.decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError):
        pass
    try:
        import msgpack  # optional; nlohmann's to_msgpack output

        return msgpack.unpackb(raw, raw=False)
    except ImportError as e:
        raise ValueError(
            "snapshot is not text JSON and the msgpack package is "
            "unavailable to decode a binary dump") from e


def _binary_to_np(value, dtype) -> np.ndarray:
    """Decode a nlohmann binary value (either representation)."""
    if isinstance(value, dict) and "bytes" in value:
        raw = bytes(bytearray(int(b) & 0xFF for b in value["bytes"]))
    elif isinstance(value, (bytes, bytearray)):
        raw = bytes(value)
    elif isinstance(value, list):  # plain array of byte ints
        raw = bytes(bytearray(int(b) & 0xFF for b in value))
    else:
        raise ValueError(f"unsupported binary encoding: {type(value)}")
    return np.frombuffer(raw, dtype=dtype)


def _ref_matrix_dims(network) -> List[Tuple[int, int]]:
    """(rows, cols) of each reference weight matrix, reference padding
    applied (fully_fused_mlp.cu:866-878 / cutlass_mlp.h:114-120)."""
    in_pad = next_multiple(network.n_input_dims, _REF_WIDTH_ALIGNMENT)
    out_pad = next_multiple(network.n_output_dims, _REF_WIDTH_ALIGNMENT)
    w, h = network.n_neurons, network.n_hidden_layers
    if h == 0:
        return [(out_pad, in_pad)]
    return [(w, in_pad)] + [(w, w)] * (h - 1) + [(out_pad, w)]


def _import_matrix(flat: np.ndarray, ours_shape: Tuple[int, int],
                   ref_shape: Tuple[int, int], name: str) -> np.ndarray:
    """One RM (out, in) reference matrix → our (in, out), padding
    stripped.  Dropped padding-input columns must be all-zero —
    nonzero weights there would change the function."""
    rows, cols = ref_shape
    m = flat.reshape(rows, cols).astype(np.float32)
    ours_in, ours_out = ours_shape
    if cols < ours_in or rows < ours_out:
        raise ValueError(
            f"{name}: reference matrix {ref_shape} smaller than model "
            f"matrix {ours_shape}")
    dropped_in = m[:, ours_in:]
    if dropped_in.size and np.abs(dropped_in).max() > 0:
        raise ValueError(
            f"{name}: reference snapshot has nonzero weights on padded "
            f"input columns [{ours_in}:{cols}) — the padded features "
            "act as biases and cannot be dropped faithfully")
    return np.ascontiguousarray(m[:ours_out, :ours_in].T)


def _moment_matrix(seg: np.ndarray, ours_shape, ref_shape) -> np.ndarray:
    """Like _import_matrix but without the zero-padding check —
    optimizer moments on padded lanes are simply dropped."""
    rows, cols = ref_shape
    ours_in, ours_out = ours_shape
    return np.ascontiguousarray(seg.reshape(rows, cols)[:ours_out, :ours_in].T)


def _split_buffer(model, flat: np.ndarray, strict: bool = True):
    """Split a reference-layout flat buffer into this framework's param
    pytree (numpy leaves).  ``strict`` enables the nonzero-padding check
    (params); moments/step-counter buffers pass strict=False."""
    network = getattr(model, "network", model)
    encoding = getattr(model, "encoding", None)

    dims = _ref_matrix_dims(network)
    ours_dims = [(int(a), int(b)) for a, b in network._layer_dims()]
    pos = 0
    mats = []
    for i, ((rows, cols), od) in enumerate(zip(dims, ours_dims)):
        n = rows * cols
        seg = flat[pos:pos + n]
        mats.append(_import_matrix(seg, od, (rows, cols), f"layer {i}")
                    if strict else _moment_matrix(seg, od, (rows, cols)))
        pos += n

    if encoding is None:
        if strict and pos != flat.size:
            raise ValueError(
                f"snapshot has {flat.size} params; network needs {pos}")
        return {"layers": mats}
    n_enc = encoding.n_params()
    if pos + n_enc != flat.size:
        raise ValueError(
            f"snapshot has {flat.size} params; model needs "
            f"{pos + n_enc} (network {pos} + encoding {n_enc})")
    return {"network": {"layers": mats},
            "encoding": {"grid": flat[pos:pos + n_enc]}}


def import_params(model, snapshot) -> Any:
    """Reference snapshot → this framework's param pytree (fp32).

    ``model`` is a NetworkWithInputEncoding-style module (attributes
    .network/.encoding) or a bare MLP module.
    """
    data = load_snapshot(snapshot)
    ptype = data.get("params_type", "float")
    dtype = {"float": np.float32, "__half": np.float16}.get(ptype)
    if dtype is None:
        raise ValueError(f"unknown params_type {ptype!r}")
    flat = _binary_to_np(data["params_binary"], dtype).astype(np.float32)
    if "n_params" in data and int(data["n_params"]) != flat.size:
        raise ValueError(
            f"n_params={data['n_params']} but binary holds {flat.size}")
    params = _split_buffer(model, flat)
    _warn_nonreference_hash(model)
    import jax

    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.ascontiguousarray(a), jnp.float32), params)


def _warn_nonreference_hash(model) -> None:
    """Warn when importing reference params into a grid whose hash type
    the reference does not implement (e.g. the TPU-native CoherentAdd):
    the table blobs are copied verbatim but lookups hash differently,
    so the imported model computes a different function.  Reference
    snapshots should be loaded into hash=CoherentPrime/Prime configs
    (the reference's own hash set, common_device.h:648-707)."""
    import warnings

    from ..common import HashType

    def grids(mod):
        if mod is None:
            return
        spec = getattr(mod, "spec", None)
        if spec is not None and hasattr(spec, "hash_type"):
            yield spec
        for child in (getattr(mod, "nested", None) or []):
            yield from grids(child)
        for attr in ("encoding", "network"):
            sub = getattr(mod, attr, None)
            if sub is not None and sub is not mod:
                yield from grids(sub)

    ref_hashes = {HashType.PRIME, HashType.COHERENT_PRIME,
                  HashType.REVERSED_PRIME, HashType.RNG}
    for spec in grids(model):
        if any(lv.use_hash for lv in spec.levels) and \
                spec.hash_type not in ref_hashes:
            warnings.warn(
                f"importing a reference CUDA snapshot into a grid with "
                f"hash={spec.hash_type.value!r}, which the reference "
                f"does not implement: hash-level lookups will differ "
                f"from the snapshot's producer. Use a CoherentPrime/"
                f"Prime config for reference snapshots.",
                stacklevel=3)


def import_trainer_state(trainer, snapshot, state=None):
    """Reference snapshot → TrainerState: params plus (when present and
    the optimizer is Adam-shaped) first/second moments, per-param step
    counters, and the global step (adam.h:278-299)."""
    data = load_snapshot(snapshot)
    if state is None:
        state = trainer.initial_state()
    params = import_params(trainer.model, data)
    state = type(state)(params=params, opt_state=state.opt_state,
                        step=state.step)

    opt = data.get("optimizer")
    os_ = state.opt_state
    if opt and isinstance(os_, dict) and {"mu", "nu"} <= set(os_):
        import jax

        def remap(buffer: np.ndarray, like):
            tree = _split_buffer(trainer.model, buffer, strict=False)
            leaves, _ = jax.tree_util.tree_flatten(tree)
            leaves_like, treedef = jax.tree_util.tree_flatten(like)
            return treedef.unflatten([
                jnp.asarray(np.ascontiguousarray(l).reshape(w.shape),
                            w.dtype)
                for l, w in zip(leaves, leaves_like)])

        mu = remap(_binary_to_np(opt["first_moments_binary"], np.float32),
                   os_["mu"])
        nu = remap(_binary_to_np(opt["second_moments_binary"], np.float32),
                   os_["nu"])
        new_os = dict(os_)
        new_os["mu"], new_os["nu"] = mu, nu
        if "param_steps_binary" in opt and "param_steps" in os_:
            new_os["param_steps"] = remap(
                _binary_to_np(opt["param_steps_binary"], np.uint32),
                os_["param_steps"])
        if "current_step" in opt and "step" in os_:
            new_os["step"] = jnp.asarray(np.uint32(opt["current_step"]))
        state = type(state)(params=state.params, opt_state=new_os,
                            step=state.step)
    return state
