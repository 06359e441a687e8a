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
  backward: fused dgrad kernel +           one backward kernel: recomputes the
    split-k wgrad CUTLASS GEMMs on           forward per tile (tiny MLPs are
    side streams (:782-829)                  compute-cheap), then dgrad chain
                                             + wgrad accumulation into
                                             revisited output blocks (TPU grid
                                             is sequential, so += is exact
                                             and deterministic)
  stored forward activations               nothing stored: recompute-in-
    (act-transfer epilogues)                 backward — on this hardware the
                                             extra MXU work is far cheaper
                                             than streaming an activation
                                             stash through HBM

Shape contract: hidden width W ∈ {16,32,64,128}; the batch is padded to
a multiple of the batch tile by the wrapper.  Layers: z_1 = x W_0,
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

def TILE_B() -> int:
    """Batch tile (rows per grid program), env-tunable for on-chip A/B.

    Default 2048: at the reference widths the per-tile dots are tiny
    (e.g. 2048×64×64), so the kernel is GRID-OVERHEAD bound, not
    VMEM bound — 512-row tiles put the flagship at 512 grid steps and
    ~1.4 ms/step measured on chip (~20× the ~0.07 ms FLOP cost of the
    64×2 MLP at B=2^18).  2048 keeps bwd VMEM (recomputed activations,
    ~8·W·tile·4 B) under ~4 MB at W=128.
    """
    import os

    return int(os.environ.get("TCNN_TPU_MLP_TILE", 2048))


def _replicated(shape):
    """BlockSpec for an operand fully resident in VMEM across the grid."""
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _batch_tiled(shape_tail: Tuple[int, ...]):
    return pl.BlockSpec((TILE_B(),) + shape_tail, lambda i: (i,) + (0,) * len(shape_tail),
                        memory_space=pltpu.VMEM)


def _in_matmul(x, w, soa_in: bool):
    """x (TB, D) @ w (D, W) — or x given SoA as (D, TB); the MXU takes
    the transposed contraction natively, no relayout."""
    if soa_in:
        return jax.lax.dot_general(x, w, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _out_matmul(h, w_out, soa_out: bool):
    """h (TB, W) @ w_out (W, Dout) — AoS (TB, Dout), or TRANSPOSED
    (Dout, TB) when ``soa_out``, via swapped dot operands (no relayout:
    the MXU contracts either orientation natively).  The SoA output
    keeps the (tiny) Dout on sublanes and the batch on lanes, so every
    downstream elementwise/loss op runs at full lane occupancy instead
    of Dout/128 (measured: the flagship's loss reduction alone cost
    0.59 ms/step on (2^18, 3) AoS arrays)."""
    if soa_out:
        return jax.lax.dot_general(w_out, h, (((0,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    return jnp.dot(h, w_out, preferred_element_type=jnp.float32)


def _fwd_kernel(act: Activation, out_act: Activation, n_hidden: int,
                soa_in: bool, soa_out: bool, x_ref, w_in_ref, w_hid_ref,
                w_out_ref, y_ref):
    """One batch tile through the whole MLP."""
    z = _in_matmul(x_ref[...], w_in_ref[...], soa_in)
    h = apply_activation(z, act).astype(x_ref.dtype)
    for k in range(n_hidden - 1):
        z = jnp.dot(h, w_hid_ref[k], preferred_element_type=jnp.float32)
        h = apply_activation(z, act).astype(h.dtype)
    z_out = _out_matmul(h, w_out_ref[...], soa_out)
    y_ref[...] = apply_activation(z_out, out_act).astype(y_ref.dtype)


def _bwd_kernel(act: Activation, out_act: Activation, n_hidden: int,
                soa_in: bool, soa_out: bool, x_ref, w_in_ref, w_hid_ref,
                w_out_ref, g_ref, dx_ref, dw_in_ref, dw_hid_ref,
                dw_out_ref):
    """Backward for one batch tile, forward recomputed in-kernel.

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
    # Recompute the forward, keeping pre-activations in VMEM values.
    zs = []
    z = _in_matmul(x_ref[...], w_in_ref[...], soa_in)
    zs.append(z)
    h = apply_activation(z, act).astype(cdt)
    hs = [h]
    for k in range(n_hidden - 1):
        z = jnp.dot(h, w_hid_ref[k], preferred_element_type=jnp.float32)
        zs.append(z)
        h = apply_activation(z, act).astype(cdt)
        hs.append(h)
    z_out = _out_matmul(h, w_out_ref[...], soa_out)

    g = g_ref[...].astype(jnp.float32)
    dz = g * activation_derivative(z_out, out_act)  # (TB, Dout) / SoA (Dout, TB)
    dz_c = dz.astype(cdt)

    if soa_out:
        # SoA cotangent (Dout, TB): both dots consume it transposed —
        # no relayout anywhere.
        dw_out_ref[...] += jax.lax.dot_general(
            hs[-1], dz_c, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = jax.lax.dot_general(
            dz_c, w_out_ref[...], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        # Output layer wgrad: h_lastᵀ dz.
        dw_out_ref[...] += jax.lax.dot_general(
            hs[-1], dz_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # dgrad into the last hidden activation.
        dh = jax.lax.dot_general(
            dz_c, w_out_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    for k in range(n_hidden - 1, 0, -1):
        dz_k = dh * activation_derivative(zs[k], act)
        dz_kc = dz_k.astype(cdt)
        dw_hid_ref[k - 1] += jax.lax.dot_general(
            hs[k - 1], dz_kc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = jax.lax.dot_general(
            dz_kc, w_hid_ref[k - 1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # Input layer.
    dz_1 = dh * activation_derivative(zs[0], act)
    dz_1c = dz_1.astype(cdt)
    if soa_in:
        # x (D, TB): dw = x @ dz; dx (D, TB) = w @ dzᵀ.
        dw_in_ref[...] += jax.lax.dot_general(
            x_ref[...], dz_1c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_ref[...] = jax.lax.dot_general(
            w_in_ref[...], dz_1c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    else:
        dw_in_ref[...] += jax.lax.dot_general(
            x_ref[...], dz_1c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_ref[...] = jax.lax.dot_general(
            dz_1c, w_in_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def _pad_batch(x, tile, axis=0):
    b = x.shape[axis]
    pb = next_multiple(max(b, 1), tile)
    if pb != b:
        pads = [(0, 0), (0, 0)]
        pads[axis] = (0, pb - b)
        x = jnp.pad(x, pads)
    return x, b


def _stack_hidden(ws: Sequence[jax.Array], width: int, dtype):
    """Stack the (H−1) hidden (W, W) matrices; H=1 yields an empty
    placeholder with one dummy layer so BlockSpecs stay rank-stable."""
    hid = [w.astype(dtype) for w in ws]
    if hid:
        return jnp.stack(hid, axis=0), len(hid)
    return jnp.zeros((1, width, width), dtype), 0


def _x_spec(d_in: int, soa_in: bool):
    """Input block spec: (TILE_B(), d_in) rows — or (d_in, TILE_B()) SoA."""
    if soa_in:
        return pl.BlockSpec((d_in, TILE_B()), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    return _batch_tiled((d_in,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _fused_mlp(weights: Tuple[jax.Array, ...], x, act: Activation,
               out_act: Activation, compute_dtype, output_dtype,
               soa_in: bool, soa_out: bool):
    return _fused_mlp_fwd_impl(weights, x, act, out_act, compute_dtype,
                               output_dtype, soa_in, soa_out)


def _fused_mlp_fwd_impl(weights, x, act, out_act, compute_dtype,
                        output_dtype, soa_in, soa_out):
    w_in, *w_mid, w_out = weights
    n_hidden = len(w_mid) + 1           # number of width-W layers
    width = w_in.shape[1]
    d_in, d_out = w_in.shape[0], w_out.shape[1]
    b_axis = 1 if soa_in else 0

    xp, b = _pad_batch(x.astype(compute_dtype), TILE_B(), axis=b_axis)
    pb = xp.shape[b_axis]
    grid = (pb // TILE_B(),)

    w_in_c = w_in.astype(compute_dtype)
    w_hid_c, n_stack = _stack_hidden(w_mid, width, compute_dtype)
    w_out_c = w_out.astype(compute_dtype)

    kernel = functools.partial(_fwd_kernel, act, out_act, n_hidden,
                               soa_in, soa_out)
    out_spec = (_x_spec(d_out, True) if soa_out
                else _batch_tiled((d_out,)))
    out_shape = ((d_out, pb) if soa_out else (pb, d_out))
    with jax.named_scope("tcnn_mlp_fwd"):
        y = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _x_spec(d_in, soa_in),
                _replicated((d_in, width)),
                _replicated((max(n_stack, 1), width, width)),
                _replicated((width, d_out)),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            interpret=interpret_mode(),
            name="fused_mlp_fwd",
        )(xp, w_in_c, w_hid_c, w_out_c)
    y = y[:, :b] if soa_out else y[:b]
    return y.astype(output_dtype)


def _fused_mlp_vjp_fwd(weights, x, act, out_act, compute_dtype, output_dtype,
                       soa_in, soa_out):
    # Re-enter the custom_vjp (not the raw pallas impl): under nested
    # differentiation (bwd-bwd) this fwd is itself traced, and only the
    # wrapped call keeps the kernel opaque to AD.
    y = _fused_mlp(weights, x, act, out_act, compute_dtype, output_dtype,
                   soa_in, soa_out)
    # Residuals: just the inputs — backward recomputes activations.
    return y, (weights, x)


def _jnp_mlp_ref(weights, x, act, out_act, compute_dtype, output_dtype,
                 soa_in, soa_out=False):
    """Identical-math jnp forward — the differentiable ground truth the
    kernels are tested against; used to derive second-order derivatives
    of the backward op below."""
    w_in, *w_mid, w_out = weights
    h = (x.T if soa_in else x).astype(compute_dtype)
    z = jnp.dot(h, w_in.astype(compute_dtype),
                preferred_element_type=jnp.float32)
    h = apply_activation(z, act).astype(compute_dtype)
    for w in w_mid:
        z = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        h = apply_activation(z, act).astype(compute_dtype)
    z_out = jnp.dot(h, w_out.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
    y = apply_activation(z_out, out_act).astype(output_dtype)
    return y.T if soa_out else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _fused_mlp_bwd_op(weights, x, g, act, out_act, compute_dtype,
                      output_dtype, soa_in, soa_out):
    """The backward pass as a differentiable op.

    Mirrors the reference's two-level autograd structure
    (_module_function_backward, bindings/torch/tinycudann/modules.py:
    120-160): the primal is the fused Pallas backward kernel; its OWN
    vjp (second order — eikonal losses etc.) is derived by
    differentiating the jnp reference backward, which JAX can transform
    freely.  MLP second order is off the hot path, so the jnp route
    costs nothing in training."""
    return _fused_mlp_bwd_kernel_call(weights, x, g, act, out_act,
                                      compute_dtype, output_dtype, soa_in,
                                      soa_out)


def _fused_mlp_bwd_op_fwd(weights, x, g, act, out_act, compute_dtype,
                          output_dtype, soa_in, soa_out):
    # Re-enter the custom op (NOT the raw kernel): under nested
    # differentiation this fwd is itself traced, and only the custom-
    # vjp-wrapped call keeps the kernel opaque to AD.
    out = _fused_mlp_bwd_op(weights, x, g, act, out_act,
                            compute_dtype, output_dtype, soa_in, soa_out)
    return out, (weights, x, g)


def _fused_mlp_bwd_op_bwd(act, out_act, compute_dtype, output_dtype, soa_in,
                          soa_out, residuals, cot):
    weights, x, g = residuals

    def ref_bwd(weights, x, g):
        _, vjp = jax.vjp(
            lambda w, xx: _jnp_mlp_ref(w, xx, act, out_act, compute_dtype,
                                       output_dtype, soa_in, soa_out),
            weights, x)
        dw, dx = vjp(g)
        return tuple(dw), dx

    _, vjp2 = jax.vjp(ref_bwd, weights, x, g)
    return vjp2(cot)


_fused_mlp_bwd_op.defvjp(_fused_mlp_bwd_op_fwd, _fused_mlp_bwd_op_bwd)


def _fused_mlp_vjp_bwd(act, out_act, compute_dtype, output_dtype, soa_in,
                       soa_out, residuals, g):
    weights, x_orig = residuals
    return _fused_mlp_bwd_op(weights, x_orig, g, act, out_act,
                             compute_dtype, output_dtype, soa_in, soa_out)


def _fused_mlp_bwd_kernel_call(weights, x_orig, g, act, out_act,
                               compute_dtype, output_dtype, soa_in,
                               soa_out):
    b_axis = 1 if soa_in else 0
    b = x_orig.shape[b_axis]
    w_in, *w_mid, w_out = weights
    n_hidden = len(w_mid) + 1
    width = w_in.shape[1]
    d_in, d_out = w_in.shape[0], w_out.shape[1]

    xp, _ = _pad_batch(x_orig.astype(compute_dtype), TILE_B(), axis=b_axis)
    pb = xp.shape[b_axis]
    grid = (pb // TILE_B(),)

    gp = g.astype(jnp.float32)
    g_b_axis = 1 if soa_out else 0
    if gp.shape[g_b_axis] != pb:
        pads = [(0, 0), (0, 0)]
        pads[g_b_axis] = (0, pb - gp.shape[g_b_axis])
        gp = jnp.pad(gp, pads)

    w_in_c = w_in.astype(compute_dtype)
    w_hid_c, n_stack = _stack_hidden(w_mid, width, compute_dtype)
    w_out_c = w_out.astype(compute_dtype)

    dx_shape = (d_in, pb) if soa_in else (pb, d_in)
    kernel = functools.partial(_bwd_kernel, act, out_act, n_hidden, soa_in,
                               soa_out)
    with jax.named_scope("tcnn_mlp_bwd"):
        dx, dw_in, dw_hid, dw_out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _x_spec(d_in, soa_in),
                _replicated((d_in, width)),
                _replicated((max(n_stack, 1), width, width)),
                _replicated((width, d_out)),
                _x_spec(d_out, True) if soa_out else _batch_tiled((d_out,)),
            ],
            out_specs=[
                _x_spec(d_in, soa_in),
                _replicated((d_in, width)),
                _replicated((max(n_stack, 1), width, width)),
                _replicated((width, d_out)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(dx_shape, jnp.float32),
                jax.ShapeDtypeStruct((d_in, width), jnp.float32),
                jax.ShapeDtypeStruct((max(n_stack, 1), width, width),
                                     jnp.float32),
                jax.ShapeDtypeStruct((width, d_out), jnp.float32),
            ],
            interpret=interpret_mode(),
            name="fused_mlp_bwd",
        )(xp, w_in_c, w_hid_c, w_out_c, gp)

    dweights = ([dw_in.astype(w_in.dtype)]
                + [dw_hid[k].astype(w.dtype) for k, w in enumerate(w_mid)]
                + [dw_out.astype(w_out.dtype)])
    dx = (dx[:, :b] if soa_in else dx[:b]).astype(x_orig.dtype)
    return tuple(dweights), dx


_fused_mlp.defvjp(_fused_mlp_vjp_fwd, _fused_mlp_vjp_bwd)


def fused_mlp_apply(weights: List[jax.Array], x: jax.Array, *,
                    activation: Activation, output_activation: Activation,
                    compute_dtype=jnp.bfloat16, output_dtype=jnp.float32,
                    input_soa: bool = False, output_soa: bool = False):
    """Apply the fused MLP to (B, D_in) inputs — or (D_in, B) when
    ``input_soa`` (the grid encoding's native layout; the MXU contracts
    the transposed operand directly, so no relayout happens anywhere).
    Output is (B, D_out), or (D_out, B) when ``output_soa`` — the
    feature-major layout the training loss path consumes at full lane
    occupancy (see :func:`_out_matmul`)."""
    return _fused_mlp(tuple(weights), x, activation, output_activation,
                      compute_dtype, output_dtype, input_soa, output_soa)
