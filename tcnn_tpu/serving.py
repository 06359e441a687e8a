"""AOT-exported inference artifacts for production serving.

The reference serves inference through its C++ API facade
(cpp_api.h:86-111): a serving process must carry the whole
CUDA/template stack plus the model config.  The TPU-native serving
unit is instead an ahead-of-time exported, serialized StableHLO
artifact (:mod:`jax.export`): build once from a trained state — the
inference params (incl. EMA/Average custom weights,
trainer.h:329-333) are baked into the artifact as constants — then
``load()`` and call it from any process with NO model code, config,
or framework state, letting XLA compile the portable program for the
local device.

Batching: XLA programs are static-shape, so the exporter compiles a
LADDER of batch buckets (powers of two by default); ``ServingModel``
pads a request up to the smallest bucket and slices the result — the
same batch-granularity trick as the reference's torch binding
(modules.py:176-192, BATCH_SIZE_GRANULARITY=256, common.h:235).

Bundle format: a zip archive holding ``meta.json`` (dims, dtypes,
bucket list, producing platforms) and one serialized jax.export
artifact per bucket.  Artifacts trace the inference path of the
EXPORTING process's backend — export on TPU bakes the Pallas/MXU
kernels (TPU-only artifact), export on CPU bakes the portable XLA
path; pass ``platforms=`` for an explicit multi-platform lowering of
platform-independent models.

Usage::

    from tcnn_tpu import serving
    serving.export_inference(model.trainer, state, "model.tcnnz",
                             batch_sizes=(1 << 14, 1 << 16, 1 << 18))
    ...
    srv = serving.load_inference("model.tcnnz")   # any process
    y = srv(x)                                    # (B, n_in) -> (B, n_out)
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

_META_NAME = "meta.json"
_FORMAT_VERSION = 1


def default_buckets(max_batch: int, min_batch: int = 256) -> Tuple[int, ...]:
    """Power-of-two bucket ladder [min_batch .. ≥max_batch]."""
    if max_batch < 1:
        raise ValueError("max_batch must be positive")
    if min_batch < 1:
        raise ValueError("min_batch must be positive")
    out = []
    b = int(min_batch)
    while True:
        out.append(b)
        if b >= max_batch:
            return tuple(out)
        b *= 2


def export_inference(trainer, state, path: Optional[str] = None, *,
                     batch_sizes: Sequence[int] = (1 << 14, 1 << 18),
                     platforms: Optional[Sequence[str]] = None,
                     input_dtype=jnp.float32) -> bytes:
    """Export the trainer's inference function as a serving bundle.

    Args:
      trainer: a :class:`tcnn_tpu.trainer.Trainer`.
      state: the trained :class:`TrainerState` (inference params — the
        optimizer's custom weights when present — are baked in).
      path: optional file to write the bundle to.
      batch_sizes: the static batch buckets to compile, ascending.
      platforms: optional explicit lowering platforms (e.g.
        ``("tpu", "cpu")``); default = the current backend.
      input_dtype: dtype of the serving input array.

    Returns the bundle bytes (also written to ``path`` if given).
    """
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"bad batch_sizes {batch_sizes}")
    from .utils.serialization import check_replicated

    # A device-sharded state (HybridParallel) is in the block-cyclic
    # layout — baking it into an UNSHARDED artifact would serve wrong
    # tables.  Gather to canonical order first.
    check_replicated(state, "TrainerState")
    params = jax.device_get(trainer.inference_params(state))
    model = trainer.model
    n_in, n_out = model.n_input_dims, model.n_output_dims

    def infer(x):
        return model.inference(jax.tree_util.tree_map(jnp.asarray, params),
                               x)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    arts = {}
    for b in batch_sizes:
        exp = jax_export.export(jax.jit(infer), **kwargs)(
            jax.ShapeDtypeStruct((b, n_in), input_dtype))
        arts[b] = exp.serialize()
        plats = exp.platforms

    meta = {
        "format_version": _FORMAT_VERSION,
        "n_input_dims": n_in,
        "n_output_dims": n_out,
        "input_dtype": np.dtype(input_dtype).name,
        "batch_sizes": batch_sizes,
        "platforms": list(plats),
        "hyperparams": getattr(model, "hyperparams", lambda: {})(),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META_NAME, json.dumps(meta, indent=1, default=str))
        for b, blob in arts.items():
            z.writestr(f"batch_{b}.jaxexport", blob)
    data = buf.getvalue()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


class ServingModel:
    """A loaded serving bundle: ``srv(x)`` for any batch size ≤ the
    largest bucket (padded up to the smallest fitting bucket, result
    sliced back — modules.py:176-192's granularity trick)."""

    def __init__(self, meta: dict, artifacts: dict):
        self.meta = meta
        self.n_input_dims = int(meta["n_input_dims"])
        self.n_output_dims = int(meta["n_output_dims"])
        self.batch_sizes = sorted(int(b) for b in meta["batch_sizes"])
        self.platforms = tuple(meta.get("platforms", ()))
        self._input_dtype = np.dtype(meta.get("input_dtype", "float32"))
        missing = set(self.batch_sizes) - set(artifacts)
        if missing:
            raise ValueError(
                f"bundle meta lists buckets {self.batch_sizes} but is "
                f"missing artifacts for {sorted(missing)} — truncated or "
                "hand-assembled bundle")
        self._fns = {
            b: jax.jit(jax_export.deserialize(blob).call)
            for b, blob in artifacts.items()
        }

    def bucket_for(self, batch: int) -> int:
        for b in self.batch_sizes:
            if batch <= b:
                return b
        raise ValueError(
            f"batch {batch} exceeds the largest exported bucket "
            f"{self.batch_sizes[-1]} — split the request or re-export "
            f"with a larger bucket")

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, self._input_dtype)
        if x.ndim != 2 or x.shape[1] != self.n_input_dims:
            raise ValueError(
                f"expected (B, {self.n_input_dims}) input, got {x.shape}")
        b = x.shape[0]
        bucket = self.bucket_for(b)
        if bucket != b:
            x = jnp.pad(x, ((0, bucket - b), (0, 0)))
        y = self._fns[bucket](x)
        return y[:b]


def load_inference(path_or_bytes) -> ServingModel:
    """Load a serving bundle written by :func:`export_inference`."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        src = io.BytesIO(path_or_bytes)
    else:
        src = path_or_bytes
    with zipfile.ZipFile(src, "r") as z:
        meta = json.loads(z.read(_META_NAME).decode())
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported bundle format {meta.get('format_version')}")
        arts = {}
        for name in z.namelist():
            if name.startswith("batch_") and name.endswith(".jaxexport"):
                arts[int(name[len("batch_"):-len(".jaxexport")])] = \
                    z.read(name)
    return ServingModel(meta, arts)


# ---------------------------------------------------------------------------
# AOT-exported TRAINING step.
#
# The reference is an AOT-compiled C++ library: create_from_config →
# first training_step costs milliseconds (CMakeLists.txt:261-263 builds
# arch-specialized kernels once at install time).  The JAX analog: a
# jax.export artifact of the donated training step — built once per
# (config, batch), loadable in any process with NO model code and NO
# tracing (the host-side trace+lower, ~3-6 s for the flagship, is paid
# at export; the backend compile remains cache-eligible on load).
# ---------------------------------------------------------------------------


def export_train_step(trainer, state, batch: int,
                      path: Optional[str] = None, *,
                      platforms: Optional[Sequence[str]] = None,
                      input_dtype=jnp.float32) -> bytes:
    """Export ``(state, x, target) -> (state, loss)`` as a jax.export
    artifact at a static batch size.

    Unlike :func:`export_inference` the STATE stays an argument (the
    caller trains), so the artifact pairs with an initial state built by
    the exporting process — ``state`` here is only used for its
    shapes/dtypes.  Returns the serialized bytes (written to ``path``
    if given); load with :func:`load_train_step`.
    """
    from .utils.serialization import check_replicated

    check_replicated(state, "TrainerState")
    _register_trainer_state_serialization()
    model = trainer.model
    n_in, n_out = model.n_input_dims, model.n_output_dims
    step = trainer.step_fn()

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exp = jax_export.export(jax.jit(step, donate_argnums=(0,)), **kwargs)(
        jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state),
        jax.ShapeDtypeStruct((batch, n_in), input_dtype),
        jax.ShapeDtypeStruct((batch, n_out), input_dtype))
    data = exp.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


_TRAINER_STATE_REGISTERED = False


def _register_trainer_state_serialization() -> None:
    """jax.export needs custom pytree nodes registered for
    serialization; idempotent (the loader needs it too so deserialized
    artifacts rebuild TrainerState outputs)."""
    global _TRAINER_STATE_REGISTERED
    if _TRAINER_STATE_REGISTERED:
        return
    from .trainer import TrainerState

    jax_export.register_pytree_node_serialization(
        TrainerState,
        serialized_name="tcnn_tpu.trainer.TrainerState",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: None,
    )
    _TRAINER_STATE_REGISTERED = True


def load_train_step(path_or_bytes):
    """Load an :func:`export_train_step` artifact.

    Returns a jitted ``step(state, x, target) -> (state, loss)`` that
    runs without any model/config code in the process.
    """
    _register_trainer_state_serialization()
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    return jax.jit(jax_export.deserialize(blob).call)
