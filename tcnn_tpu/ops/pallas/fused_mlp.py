"""Fused multi-layer MLP Pallas kernels.

TPU-native rebuild of the reference's fully fused MLP
(src/fully_fused_mlp.cu): the entire layer chain runs in ONE kernel per
pass, with every weight matrix resident in VMEM for the kernel's whole
lifetime and per-program batch tiles streaming through the MXU.  The
mapping from the CUDA design:

  CUDA (fully_fused_mlp.cu)                TPU (this file)
  ---------------------------------------  -------------------------------
  threadblock owns 128-row batch chunk     grid program owns a TILE_B-row tile
  weights in wmma register fragments       weights in VMEM, MXU matmuls
  activations in shared memory (+8 skew)   activations in VMEM registers
  fp16 tensor cores + loss scaling         bf16/f32 MXU with fp32 accumulate
  backward: fused dgrad kernel +           one backward kernel: dgrad chain
    split-k wgrad CUTLASS GEMMs on           + wgrad accumulation into a
    side streams (:782-829)                  revisited output block (TPU grid
                                             is sequential, so += is exact
                                             and deterministic)
  stored forward activations               stored pre-activations z_k,
    (act-transfer epilogues)                 act/act' recomputed on the VPU

Shape contract: hidden width W ∈ {16,32,64,128}; the batch is padded to
a multiple of TILE_B by the wrapper.  Layers: z_1 = x W_0,
h_k = act(z_k), z_{k+1} = h_k W_k, y = out_act(h_H W_out).

Derivatives are provided via jax.custom_vjp (second order falls back to
autodiff of the jnp reference path — fused bwd-bwd is not needed for
MLPs in practice; the grid encoding owns the bwd-bwd hot path).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...common import Activation, cdiv, next_multiple
from . import interpret_mode
from ..activations import activation_derivative, apply_activation

# Default batch tile; 256 rows keeps the MXU busy at every width while
# the full activation stash stays small (H·256·128·4B = 640 KB at H=5).
TILE_B = 256


def _replicated(shape):
    """BlockSpec for an operand fully resident in VMEM across the grid."""
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _batch_tiled(shape_tail: Tuple[int, ...]):
    return pl.BlockSpec((TILE_B,) + shape_tail, lambda i: (i,) + (0,) * len(shape_tail),
                        memory_space=pltpu.VMEM)


def _fwd_kernel(act: Activation, out_act: Activation, n_hidden: int,
                x_ref, w_in_ref, w_hid_ref, w_out_ref, y_ref, z_ref):
    """One batch tile through the whole MLP; stashes pre-activations."""
    h = x_ref[...]
    z = jnp.dot(h, w_in_ref[...], preferred_element_type=jnp.float32)
    z_ref[0, :, :] = z
    h = apply_activation(z, act).astype(h.dtype)
    for k in range(n_hidden - 1):
        z = jnp.dot(h, w_hid_ref[k], preferred_element_type=jnp.float32)
        z_ref[k + 1, :, :] = z
        h = apply_activation(z, act).astype(h.dtype)
    z_out = jnp.dot(h, w_out_ref[...], preferred_element_type=jnp.float32)
    y_ref[...] = apply_activation(z_out, out_act)


def _bwd_kernel(act: Activation, out_act: Activation, n_hidden: int,
                x_ref, w_in_ref, w_hid_ref, w_out_ref, z_ref, g_ref,
                dx_ref, dw_in_ref, dw_hid_ref, dw_out_ref):
    """Backward for one batch tile.

    dgrad chain mirrors kernel_mlp_fused_backward
    (fully_fused_mlp.cu:150-259); weight gradients accumulate across
    sequentially-visited grid programs into shared output blocks —
    the deterministic TPU replacement of the reference's split-k
    side-stream GEMMs.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero_wgrads():
        dw_in_ref[...] = jnp.zeros_like(dw_in_ref)
        dw_hid_ref[...] = jnp.zeros_like(dw_hid_ref)
        dw_out_ref[...] = jnp.zeros_like(dw_out_ref)

    cdt = x_ref.dtype
    # Recompute output pre-activation from the last hidden activation.
    h_last = apply_activation(z_ref[n_hidden - 1, :, :], act).astype(cdt)
    z_out = jnp.dot(h_last, w_out_ref[...], preferred_element_type=jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    dz = g * activation_derivative(z_out, out_act)           # (TB, Dout) f32
    dz_c = dz.astype(cdt)

    # Output layer wgrad: h_lastᵀ dz.
    dw_out_ref[...] += jax.lax.dot_general(
        h_last, dz_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # dgrad into the last hidden activation.
    dh = jax.lax.dot_general(
        dz_c, w_out_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    for k in range(n_hidden - 1, 0, -1):
        z_k = z_ref[k, :, :]
        dz_k = dh * activation_derivative(z_k, act)
        dz_kc = dz_k.astype(cdt)
        h_prev = apply_activation(z_ref[k - 1, :, :], act).astype(cdt)
        dw_hid_ref[k - 1] += jax.lax.dot_general(
            h_prev, dz_kc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = jax.lax.dot_general(
            dz_kc, w_hid_ref[k - 1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # Input layer.
    dz_1 = dh * activation_derivative(z_ref[0, :, :], act)
    dz_1c = dz_1.astype(cdt)
    dw_in_ref[...] += jax.lax.dot_general(
        x_ref[...], dz_1c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[...] = jax.lax.dot_general(
        dz_1c, w_in_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def _pad_batch(x, tile):
    b = x.shape[0]
    pb = next_multiple(max(b, 1), tile)
    if pb != b:
        x = jnp.pad(x, ((0, pb - b), (0, 0)))
    return x, b


def _stack_hidden(ws: Sequence[jax.Array], width: int, dtype):
    """Stack the (H−1) hidden (W, W) matrices; H=1 yields an empty
    placeholder with one dummy layer so BlockSpecs stay rank-stable."""
    hid = [w.astype(dtype) for w in ws]
    if hid:
        return jnp.stack(hid, axis=0), len(hid)
    return jnp.zeros((1, width, width), dtype), 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_mlp(weights: Tuple[jax.Array, ...], x, act: Activation,
               out_act: Activation, compute_dtype, output_dtype):
    y, _ = _fused_mlp_fwd_impl(weights, x, act, out_act, compute_dtype,
                               output_dtype, stash=False)
    return y


def _fused_mlp_fwd_impl(weights, x, act, out_act, compute_dtype,
                        output_dtype, stash: bool):
    w_in, *w_mid, w_out = weights
    n_hidden = len(w_mid) + 1           # number of width-W layers
    width = w_in.shape[1]
    d_in, d_out = w_in.shape[0], w_out.shape[1]

    xp, b = _pad_batch(x.astype(compute_dtype), TILE_B)
    pb = xp.shape[0]
    grid = (pb // TILE_B,)

    w_in_c = w_in.astype(compute_dtype)
    w_hid_c, n_stack = _stack_hidden(w_mid, width, compute_dtype)
    w_out_c = w_out.astype(compute_dtype)

    kernel = functools.partial(_fwd_kernel, act, out_act, n_hidden)
    y, z = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _batch_tiled((d_in,)),
            _replicated((d_in, width)),
            _replicated((max(n_stack, 1), width, width)),
            _replicated((width, d_out)),
        ],
        out_specs=[
            _batch_tiled((d_out,)),
            pl.BlockSpec((n_hidden, TILE_B, width),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pb, d_out), jnp.float32),
            jax.ShapeDtypeStruct((n_hidden, pb, width), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(xp, w_in_c, w_hid_c, w_out_c)
    y = y[:b].astype(output_dtype)
    if stash:
        return y, (xp, z, b)
    return y, None


def _fused_mlp_vjp_fwd(weights, x, act, out_act, compute_dtype, output_dtype):
    y, (xp, z, _) = _fused_mlp_fwd_impl(weights, x, act, out_act,
                                        compute_dtype, output_dtype, stash=True)
    return y, (weights, x, xp, z)


def _fused_mlp_vjp_bwd(act, out_act, compute_dtype, output_dtype,
                       residuals, g):
    weights, x_orig, xp, z = residuals
    b = x_orig.shape[0]
    w_in, *w_mid, w_out = weights
    n_hidden = len(w_mid) + 1
    width = w_in.shape[1]
    d_in, d_out = w_in.shape[0], w_out.shape[1]
    pb = xp.shape[0]
    grid = (pb // TILE_B,)

    gp = g.astype(jnp.float32)
    if gp.shape[0] != pb:
        gp = jnp.pad(gp, ((0, pb - gp.shape[0]), (0, 0)))

    w_in_c = w_in.astype(compute_dtype)
    w_hid_c, n_stack = _stack_hidden(w_mid, width, compute_dtype)
    w_out_c = w_out.astype(compute_dtype)

    kernel = functools.partial(_bwd_kernel, act, out_act, n_hidden)
    dx, dw_in, dw_hid, dw_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _batch_tiled((d_in,)),
            _replicated((d_in, width)),
            _replicated((max(n_stack, 1), width, width)),
            _replicated((width, d_out)),
            pl.BlockSpec((n_hidden, TILE_B, width), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            _batch_tiled((d_out,)),
        ],
        out_specs=[
            _batch_tiled((d_in,)),
            _replicated((d_in, width)),
            _replicated((max(n_stack, 1), width, width)),
            _replicated((width, d_out)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pb, d_in), jnp.float32),
            jax.ShapeDtypeStruct((d_in, width), jnp.float32),
            jax.ShapeDtypeStruct((max(n_stack, 1), width, width), jnp.float32),
            jax.ShapeDtypeStruct((width, d_out), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(xp, w_in_c, w_hid_c, w_out_c, z, gp)

    dweights = ([dw_in.astype(w_in.dtype)]
                + [dw_hid[k].astype(w.dtype) for k, w in enumerate(w_mid)]
                + [dw_out.astype(w_out.dtype)])
    dx = dx[:b].astype(x_orig.dtype)
    return tuple(dweights), dx


_fused_mlp.defvjp(_fused_mlp_vjp_fwd, _fused_mlp_vjp_bwd)


def fused_mlp_apply(weights: List[jax.Array], x: jax.Array, *,
                    activation: Activation, output_activation: Activation,
                    compute_dtype=jnp.bfloat16, output_dtype=jnp.float32):
    """Public entry: apply the fused MLP to (B, D_in) inputs."""
    return _fused_mlp(tuple(weights), x, activation, output_activation,
                      compute_dtype, output_dtype)
