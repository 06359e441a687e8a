"""PyTorch interop — API parity with the reference's torch bindings.

The reference ships pybind11 + torch.autograd bindings
(bindings/torch/tinycudann/modules.py): ``tcnn.NetworkWithInputEncoding``,
``tcnn.Network``, ``tcnn.Encoding`` are torch.nn.Modules whose
forward/backward (and double-backward, modules.py:120-160) run in the
CUDA framework while parameters live in torch.

Here the same surface is provided over the JAX framework: a
``torch.nn.Module`` holding the parameter pytree as torch Parameters
(flattened into one fp32 vector, matching the reference's single
params tensor) whose autograd Function calls the jitted JAX
forward/VJP.  First- and second-order autograd work: backward is
implemented with a second autograd.Function so that
``torch.autograd.grad(..., create_graph=True)`` composes, exactly
mirroring ``_module_function_backward``.

Torch in this image is CPU-only, so tensors cross the boundary via
NumPy (zero-copy on CPU through dlpack where possible).  On a TPU host
this layer is for *compatibility and testing*, not the performance
path — production code should stay in JAX end-to-end.

The reference's fp16 ``loss_scale`` multiply/divide protocol
(modules.py:126-157) does not exist here: gradients are fp32
throughout.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

try:
    import torch
    from torch import nn

    TORCH_AVAILABLE = True
except ImportError:  # pragma: no cover
    TORCH_AVAILABLE = False
    nn = type("nn", (), {"Module": object})  # type: ignore


def _to_jax(t) -> jax.Array:
    return jnp.asarray(t.detach().cpu().numpy())


def _to_torch(a) -> "torch.Tensor":
    return torch.from_numpy(np.asarray(jax.device_get(a)))


class _FlatModel:
    """Flattens a Module's param pytree to one fp32 vector and exposes
    jitted value/VJP/VJP-of-VJP entry points (the reference keeps all
    params in a single torch tensor too, modules.py:176)."""

    def __init__(self, module, seed: int = 1337):
        self.module = module
        params = module.init(jax.random.key(seed))
        leaves, self.treedef = jax.tree_util.tree_flatten(params)
        self.shapes = [l.shape for l in leaves]
        self.sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.n_params = sum(self.sizes)
        self._initial = np.concatenate(
            [np.asarray(l, np.float32).ravel() for l in leaves]
        ) if leaves else np.zeros((0,), np.float32)

        def unflatten(flat):
            out, off = [], 0
            for shape, size in zip(self.shapes, self.sizes):
                out.append(flat[off:off + size].reshape(shape))
                off += size
            return jax.tree_util.tree_unflatten(self.treedef, out)

        def apply_flat(flat, x):
            return self.module.apply(unflatten(flat), x)

        self._fwd = jax.jit(apply_flat)

        def vjp(flat, x, dy):
            y, pull = jax.vjp(apply_flat, flat, x)
            dflat, dx = pull(dy)
            return dflat, dx

        self._vjp = jax.jit(vjp)

        # Double backward: gradient of <vjp(flat,x,dy), (c_flat, c_x)>
        # w.r.t. (flat, x, dy) — the three outputs of
        # _module_function_backward.backward (modules.py:133-160).
        def vjp2(flat, x, dy, c_flat, c_x):
            def inner(flat_, x_, dy_):
                dflat, dx = vjp(flat_, x_, dy_)
                return (jnp.vdot(dflat, c_flat)
                        + jnp.vdot(dx.astype(jnp.float32),
                                   c_x.astype(jnp.float32)))

            return jax.grad(inner, argnums=(0, 1, 2))(flat, x, dy)

        self._vjp2 = jax.jit(vjp2)

    def initial_params(self) -> np.ndarray:
        return self._initial.copy()


if TORCH_AVAILABLE:

    class _ModuleFunctionBackward(torch.autograd.Function):
        @staticmethod
        def forward(ctx, native, params, x, dy):
            ctx.native = native
            ctx.save_for_backward(params, x, dy)
            dflat, dx = native._vjp(_to_jax(params), _to_jax(x), _to_jax(dy))
            return _to_torch(dflat), _to_torch(dx)

        @staticmethod
        def backward(ctx, c_params, c_x):
            native = ctx.native
            params, x, dy = ctx.saved_tensors
            dflat, dx, ddy = native._vjp2(
                _to_jax(params), _to_jax(x), _to_jax(dy),
                _to_jax(c_params), _to_jax(c_x))
            return (None, _to_torch(dflat), _to_torch(dx), _to_torch(ddy))

    class _ModuleFunction(torch.autograd.Function):
        @staticmethod
        def forward(ctx, native, params, x):
            ctx.native = native
            ctx.save_for_backward(params, x)
            y = native._fwd(_to_jax(params), _to_jax(x))
            return _to_torch(y)

        @staticmethod
        def backward(ctx, dy):
            native = ctx.native
            params, x = ctx.saved_tensors
            # Second autograd.Function so backward itself is
            # differentiable (double backward), mirroring
            # _module_function.backward → _module_function_backward.apply.
            dparams, dx = _ModuleFunctionBackward.apply(native, params, x, dy)
            return None, dparams, dx

    # The reference pads every batch up to batch_size_granularity (256)
    # before dispatch and slices the result (modules.py:181-192).  Here
    # the same padding ALSO caps jit recompilation: any batch size in
    # (k·256, (k+1)·256] shares one compiled executable.
    BATCH_GRANULARITY = 256

    class TorchModule(nn.Module):
        """Base torch module backed by the JAX framework
        (≈ tinycudann.modules.Module)."""

        def __init__(self, jax_module, seed: int = 1337):
            super().__init__()
            self.jax_module = jax_module
            self.native = _FlatModel(jax_module, seed)
            self.seed = seed
            self.n_input_dims = jax_module.n_input_dims
            self.n_output_dims = jax_module.n_output_dims
            # Params are fp32 throughout (no fp16 loss-scale protocol
            # needed); attributes kept for reference API parity
            # (modules.py:167-174).
            self.dtype = torch.float32
            self.loss_scale = 1.0
            self.params = nn.Parameter(
                torch.from_numpy(self.native.initial_params()))

        def forward(self, x):
            if x.shape[-1] != self.n_input_dims:
                raise ValueError(
                    f"expected {self.n_input_dims} input dims, got "
                    f"{x.shape[-1]}")
            b = x.shape[0]
            g = BATCH_GRANULARITY
            pb = (b + g - 1) // g * g
            xp = x if b == pb else torch.nn.functional.pad(
                x, [0, 0, 0, pb - b])
            y = _ModuleFunction.apply(self.native, self.params,
                                      xp.to(torch.float32))
            return y[:b].to(self.dtype)

        def _make_jax_module(self):
            raise NotImplementedError(
                "pickling requires a concrete subclass")

        def __getstate__(self):
            # Like the reference (modules.py:194-199): drop the
            # unpicklable native entries; parameters travel via the
            # regular nn.Module state.
            state = self.__dict__.copy()
            del state["native"]
            del state["jax_module"]
            return state

        def __setstate__(self, state):
            self.__dict__.update(state)
            self.jax_module = self._make_jax_module()
            self.native = _FlatModel(self.jax_module, self.seed)

        def extra_repr(self):
            return (f"otype={self.jax_module.name}, "
                    f"n_params={self.native.n_params}, seed={self.seed}, "
                    f"dtype={self.dtype}")

    class NetworkWithInputEncoding(TorchModule):
        def __init__(self, n_input_dims, n_output_dims, encoding_config,
                     network_config, seed: int = 1337):
            from ..config import create_network_with_input_encoding

            self.encoding_config = encoding_config
            self.network_config = network_config
            self._n_out_requested = n_output_dims
            super().__init__(create_network_with_input_encoding(
                n_input_dims, n_output_dims, encoding_config, network_config),
                seed=seed)

        def _make_jax_module(self):
            from ..config import create_network_with_input_encoding

            return create_network_with_input_encoding(
                self.n_input_dims, self._n_out_requested,
                self.encoding_config, self.network_config)

    class Network(TorchModule):
        def __init__(self, n_input_dims, n_output_dims, network_config,
                     seed: int = 1337):
            from ..config import create_network

            self.network_config = network_config
            self._n_out_requested = n_output_dims
            super().__init__(create_network(network_config, n_input_dims,
                                            n_output_dims), seed=seed)

        def _make_jax_module(self):
            from ..config import create_network

            return create_network(self.network_config, self.n_input_dims,
                                  self._n_out_requested)

    class Encoding(TorchModule):
        def __init__(self, n_input_dims, encoding_config, seed: int = 1337,
                     dtype=None):
            from ..config import create_encoding

            self.encoding_config = encoding_config
            if dtype not in (None, torch.float32, torch.float16):
                raise ValueError(
                    "Encoding only supports fp32 or fp16 precision, "
                    f"but got {dtype}")
            super().__init__(create_encoding(n_input_dims, encoding_config),
                             seed=seed)
            # Reference semantics (modules.py:311-326): dtype selects the
            # OUTPUT precision; None = the optimally performing one,
            # which for fp32-parameter JAX modules is fp32.
            if dtype is not None:
                self.dtype = dtype

        def _make_jax_module(self):
            from ..config import create_encoding

            return create_encoding(self.n_input_dims, self.encoding_config)


def free_temporary_memory():
    """API analog of tinycudann.free_temporary_memory (modules.py:77-81).

    The reference frees its CUDA memory arena; here the equivalents are
    XLA's live-buffer pool and jit caches.  Collects Python garbage
    (dropping references to device buffers) and clears JAX's compiled-
    computation caches so the backend can release the memory."""
    import gc

    gc.collect()
    jax.clear_caches()
