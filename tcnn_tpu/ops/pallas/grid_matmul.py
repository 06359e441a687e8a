"""MXU one-hot matmul kernels for the grid encoding's gather + scatter.

The grid backward is a scatter-add of M = B·L·2^D weighted gradient
rows into per-level feature tables (reference: atomicAdd,
grid.h:214-320).  Round 2's Pallas serial scatter is scalar-ISSUE bound
at ~9.5 ns per packed pair — a hard floor for any design that touches
rows one at a time, because the TPU has ONE scalar unit and no gather/
scatter hardware.  These kernels take the opposite approach: express
the scatter (and the forward gather) as DENSE matmuls against one-hot
matrices, so the work runs on the MXU/VPU at vector rates:

  scatter:  grad[hi, lo·F+f] = Σ_u  1[idx_hi(u)=hi] · W[lo·F+f, u]
            with W[n, u] = 1[idx_lo(u)=n//F] · w(u) · dy(n%F, u)
            — ONE (HI, T)x(T→, N) contraction per update tile; the
            one-hot factorization idx = hi·128 + lo keeps the compare
            cost at (R/128 + 128·F) vector lanes per update instead
            of R.

  gather:   Z[n, u]   = Σ_hi tabT[n, hi] · 1[idx_hi(u)=hi]
            y[f, u]   = Σ_lo 1[idx_lo(u)=lo] · Z[lo·F+f, u]
            cols[f,b] = Σ_c  w_c(b) · y_c[f, b]
            — the level table (tiny: KBs..MBs) stays VMEM-resident as
            the matmul operand; interpolation weights are applied
            in-kernel so only the (L·F, B) feature columns ever leave.

Per-update cost is ≈ R_pad·F MACs (MXU) + ~(R_pad/128 + 3·128·F)
vector lanes (VPU): at the flagship geometry (R=2^15, F=2) that is
~0.8 ns/update on a v5e vs the serial kernel's 9.5 ns/pair — and it is
*hash-type agnostic* (no corner-adjacency requirement), so reference
CoherentPrime/Prime/RNG configs run the fast path too.  For very large
levels (R·F ≳ 2^19, e.g. BTF-sized 2^19-row tables) the MAC cost per
update exceeds the serial kernel's issue cost and the caller dispatches
to the serial pair kernel instead (see grid_ops dispatch).

Precision: the MXU multiplies bf16 operands with fp32 accumulation.
One-hot operands are exact in bf16; the VALUE operand (table entries /
w·dy products) is bf16-rounded.  For bf16 tables this matches the
reference's fp16 compute params (trainer.h:68-87).  For f32 tables the
value operand is SPLIT into two bf16 terms (v = bf16(v) + bf16(v -
bf16(v)), ~2^-17 relative error) at 2x the MAC cost — still far below
the serial kernel.  Accumulation order is fixed by the grid program
order, so results are deterministic (stronger than the reference's
atomics).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode

_LO = 128          # lanes of the one-hot "lo" factor (idx = hi*_LO + lo)
_DEF_TILE = 4096   # updates per grid step (per corner)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def batch_tile(b: int) -> int:
    """Largest power-of-two tile ≤ _DEF_TILE dividing b; 0 = no tile
    (caller falls back to an XLA path)."""
    p2 = b & (-b)
    t = min(_DEF_TILE, p2)
    return t if t >= 512 else 0


def _value_passes(dtype) -> int:
    """bf16 values are exact in one pass; f32 values split into two
    bf16 terms (hi + residual)."""
    return 1 if dtype == jnp.bfloat16 else 2


def _split_bf16(v: jax.Array, n_passes: int):
    """v (f32/bf16) -> list of bf16 terms summing to ~v."""
    if n_passes == 1:
        return [v.astype(jnp.bfloat16)]
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return [hi, lo]


# ---------------------------------------------------------------------------
# Scatter: dflat[level tables] += one_hot(idx)^T @ (w * dy)
# ---------------------------------------------------------------------------


def _scatter_kernel(c: int, f: int, hi_n: int, n_passes: int,
                    idx_ref, w_ref, dy_ref, out_ref):
    """One (level, batch-tile) step: accumulate all C corners' updates
    into the level's (HI, 128·F) gradient block.

    idx_ref: (C, T) int32 LEVEL-LOCAL rows.   w_ref: (C, T) f32.
    dy_ref:  (F, T) f32 output cotangent.     out_ref: (1, HI, N) f32.
    """
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    n = _LO * f
    tt = idx_ref.shape[2]
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tt), 0)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, tt), 0)
    lo_of_n = iota_n // f
    f_of_n = iota_n % f

    # dy rows replicated to the (N, T) pattern: row n holds dy[n % F].
    dpat = jnp.zeros((n, tt), jnp.float32)
    for k in range(f):
        dpat = jnp.where(f_of_n == k, dy_ref[0, k:k + 1, :], dpat)

    acc = jnp.zeros((hi_n, n), jnp.float32)
    for ci in range(c):
        idx = idx_ref[0, ci:ci + 1, :]
        hihot = (iota_hi == (idx // _LO)).astype(jnp.bfloat16)
        wd = w_ref[0, ci:ci + 1, :] * dpat         # (N, T) f32 values
        lo_mask = lo_of_n == (idx % _LO)
        for term in _split_bf16(wd, n_passes):
            w_t = jnp.where(lo_mask, term, jnp.bfloat16(0))
            acc = acc + jax.lax.dot_general(
                hihot, w_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[...] += acc[None]


def scatter_levels_matmul(idx_local: jax.Array, w: jax.Array,
                          dcols: jax.Array, r_pad: int, f: int,
                          c: int, value_dtype=jnp.float32) -> jax.Array:
    """Scatter w·dcols into Lg per-level gradient blocks via MXU.

    Args:
      idx_local: (Lg·C, B) int32 level-LOCAL rows in [0, size_l).
      w:         (Lg·C, B) f32 corner weights (same ordering).
      dcols:     (Lg·F, B) f32 SoA output cotangent.
      r_pad:     common padded row count (multiple of 128) ≥ every
                 level's size.
      value_dtype: dtype whose precision the value operand should
                 carry (bf16 → single pass, f32 → two-term split).

    Returns (Lg, r_pad, F) f32 per-level gradient tables (rows ≥ size_l
    are zero).  Deterministic.
    """
    lc, b = idx_local.shape
    lg = lc // c
    t = batch_tile(b)
    hi_n = r_pad // _LO
    n = _LO * f
    n_passes = _value_passes(value_dtype)
    if t == 0:
        raise ValueError(f"batch {b} has no usable tile")

    # 3-D operands (Lg, C, B) so each block covers the full (C,·) dims
    # — Mosaic requires block dims to be 8/128-aligned OR equal to the
    # whole array dimension, and C/F are small.
    kernel = functools.partial(_scatter_kernel, c, f, hi_n, n_passes)
    out = pl.pallas_call(
        kernel,
        grid=(lg, b // t),
        in_specs=[
            pl.BlockSpec((1, c, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, c, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, f, t), lambda l, tb: (l, 0, tb)),
        ],
        out_specs=pl.BlockSpec((1, hi_n, n), lambda l, tb: (l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((lg, hi_n, n), jnp.float32),
        interpret=interpret_mode(),
    )(idx_local.astype(jnp.int32).reshape(lg, c, b),
      w.astype(jnp.float32).reshape(lg, c, b),
      dcols.astype(jnp.float32).reshape(lg, f, b))
    # (Lg, HI, 128·F) -> (Lg, r_pad, F): row hi·128+lo, feature f lives
    # at [hi, lo·F+f] — a pure reshape of the row-major layout.
    return out.reshape(lg, r_pad, f)


# ---------------------------------------------------------------------------
# Gather + interpolate: cols[f, b] = Σ_c w_c(b) · table[idx_c(b), f]
# ---------------------------------------------------------------------------


def _gather_kernel(c: int, f: int, hi_n: int, n_passes: int,
                   tab_ref, idx_ref, w_ref, out_ref):
    """One (level, batch-tile) step: interpolated feature columns.

    tab_ref: (1, P·N, HI) bf16 — P = n_passes value terms of the
             level's table, transposed: tab[p·N + lo·F+f, hi] =
             term_p(table[hi·128+lo, f]).
    idx_ref: (1, C, T) int32 level-local rows.  w_ref: (1, C, T) f32.
    out_ref: (1, F, T) f32 interpolated columns.
    """
    n = _LO * f
    tt = idx_ref.shape[2]
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tt), 0)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, tt), 0)
    lo_of_n = iota_n // f
    f_of_n = iota_n % f

    acc = jnp.zeros((f, tt), jnp.float32)
    for ci in range(c):
        idx = idx_ref[0, ci:ci + 1, :]
        hihot = (iota_hi == (idx // _LO)).astype(jnp.bfloat16)
        z = jnp.zeros((n, tt), jnp.float32)
        for p in range(n_passes):
            z = z + jax.lax.dot_general(
                tab_ref[0, p * n:(p + 1) * n, :], hihot,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        sel = jnp.where(lo_of_n == (idx % _LO), z, 0.0)
        w_c = w_ref[0, ci:ci + 1, :]
        rows = []
        for k in range(f):
            rows.append(jnp.sum(jnp.where(f_of_n == k, sel, 0.0),
                                axis=0, keepdims=True))
        acc = acc + w_c * jnp.concatenate(rows, axis=0)
    out_ref[...] = acc[None]


def pack_tables(flat: jax.Array, sizes: Sequence[int],
                offsets: Sequence[int], f: int, r_pad: int,
                value_dtype=jnp.float32) -> jax.Array:
    """Level segments of a flat table -> the kernel's transposed
    operand (Lg, P·128·F, HI) bf16.

    For f32 tables (P=2) the second term block carries the bf16
    rounding residual, recovering ~2^-17 relative accuracy from two
    bf16 matmuls."""
    n_passes = _value_passes(value_dtype)
    hi_n = r_pad // _LO
    mats = []
    for size, off in zip(sizes, offsets):
        seg = jax.lax.dynamic_slice_in_dim(flat, off * f, size * f)
        seg = jnp.pad(seg.astype(jnp.float32), (0, (r_pad - size) * f))
        m2 = seg.reshape(hi_n, _LO * f)
        terms = _split_bf16(m2, n_passes)
        mats.append(jnp.concatenate(
            [tm for tm in terms], axis=1).T)   # (P·N, HI)
    return jnp.stack(mats, axis=0)


def _gather_levels_matmul_impl(tabT: jax.Array, idx_local: jax.Array,
                               w: jax.Array, f: int, c: int,
                               n_passes: int) -> jax.Array:
    """Fused gather + n-linear interpolation over Lg levels via MXU.

    tabT: (Lg, P·128·F, HI) bf16 from :func:`pack_tables`.
    idx_local: (Lg·C, B) int32 level-local rows; w: (Lg·C, B) f32.
    Returns (Lg·F, B) f32 interpolated SoA feature columns.
    """
    lc, b = idx_local.shape
    lg = lc // c
    pn, hi_n = tabT.shape[1], tabT.shape[2]
    t = batch_tile(b)
    if t == 0:
        raise ValueError(f"batch {b} has no usable tile")

    kernel = functools.partial(_gather_kernel, c, f, hi_n, n_passes)
    out = pl.pallas_call(
        kernel,
        grid=(lg, b // t),
        in_specs=[
            pl.BlockSpec((1, pn, hi_n), lambda l, tb: (l, 0, 0)),
            pl.BlockSpec((1, c, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, c, t), lambda l, tb: (l, 0, tb)),
        ],
        out_specs=pl.BlockSpec((1, f, t), lambda l, tb: (l, 0, tb)),
        out_shape=jax.ShapeDtypeStruct((lg, f, b), jnp.float32),
        interpret=interpret_mode(),
    )(tabT, idx_local.astype(jnp.int32).reshape(lg, c, b),
      w.astype(jnp.float32).reshape(lg, c, b))
    return out.reshape(lg * f, b)


# ---------------------------------------------------------------------------
# Differentiable wrappers.  Raw pallas_calls inside a custom_vjp fwd
# rule fail to linearize under second-order differentiation, so — like
# the serial kernels in scatter.py — each direction carries its own
# custom_vjp defined in terms of jnp math (takes) for the rare nested
# paths.  First-order training touches only the kernels.
# ---------------------------------------------------------------------------


def _dtype_of(s: str):
    return jnp.bfloat16 if "bfloat16" in s else jnp.float32


def assemble_flat(blocks: jax.Array, sizes, offsets, f: int,
                  n_flat: int) -> jax.Array:
    """(Lg, r_pad, F) per-level blocks -> FLAT (n_flat,) table grads."""
    part = jnp.zeros((n_flat,), jnp.float32)
    for gi, (size, off) in enumerate(zip(sizes, offsets)):
        part = jax.lax.dynamic_update_slice(
            part, blocks[gi, :size].reshape(-1), (off * f,))
    return part


def _lazy_feats(flat, idx_local, offsets, f, c):
    """(Lg, C, B, F) gathered features — jnp takes, DCE'd when the
    consumer (input gradients / second order) is unused."""
    lg = len(offsets)
    b = idx_local.shape[1]
    table2d = flat.reshape(-1, f).astype(jnp.float32)
    offs = jnp.asarray(np.array(offsets, np.int32)).reshape(lg, 1, 1)
    idx3 = idx_local.reshape(lg, c, b) + offs
    return jnp.stack([jnp.take(table2d, idx3[l], axis=0)
                      for l in range(lg)], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def mm_gather(flat: jax.Array, idx_local: jax.Array, w: jax.Array,
              sizes: Tuple[int, ...], offsets: Tuple[int, ...],
              f: int, c: int, r_pad: int) -> jax.Array:
    """Fused gather+interpolate of Lg levels from a flat table.

    Returns (Lg·F, B) f32 columns; linear in ``flat``, bilinear with
    ``w``.  Reverse-differentiable to any order.
    """
    tabT = pack_tables(flat, sizes, offsets, f, r_pad, flat.dtype)
    return _gather_levels_matmul_impl(tabT, idx_local, w, f, c,
                                      _value_passes(flat.dtype))


def _mm_gather_fwd(flat, idx_local, w, sizes, offsets, f, c, r_pad):
    return (mm_gather(flat, idx_local, w, sizes, offsets, f, c, r_pad),
            (flat, idx_local, w))


def _mm_gather_bwd(sizes, offsets, f, c, r_pad, res, ct):
    flat, idx_local, w = res
    dflat = mm_scatter(idx_local, w, ct, sizes, offsets, f, c, r_pad,
                       flat.shape[0], str(flat.dtype)).astype(flat.dtype)
    fr = _lazy_feats(flat, idx_local, offsets, f, c)
    lg = len(sizes)
    b = w.shape[1]
    ct3 = ct.reshape(lg, f, b)
    dw = fr[..., 0] * ct3[:, None, 0, :]
    for k in range(1, f):
        dw = dw + fr[..., k] * ct3[:, None, k, :]
    return dflat, None, dw.reshape(lg * c, b)


mm_gather.defvjp(_mm_gather_fwd, _mm_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def mm_scatter(idx_local: jax.Array, w: jax.Array, dcols: jax.Array,
               sizes: Tuple[int, ...], offsets: Tuple[int, ...],
               f: int, c: int, r_pad: int, n_flat: int,
               value_dtype_str: str) -> jax.Array:
    """Deterministic MXU scatter of ``w·dcols`` -> FLAT (n_flat,) f32
    table gradient (levels outside sizes/offsets untouched=0)."""
    blocks = scatter_levels_matmul(idx_local, w, dcols, r_pad, f, c,
                                   _dtype_of(value_dtype_str))
    return assemble_flat(blocks, sizes, offsets, f, n_flat)


def _mm_scatter_fwd(idx_local, w, dcols, sizes, offsets, f, c, r_pad,
                    n_flat, value_dtype_str):
    return (mm_scatter(idx_local, w, dcols, sizes, offsets, f, c, r_pad,
                       n_flat, value_dtype_str),
            (idx_local, w, dcols))


def _mm_scatter_bwd(sizes, offsets, f, c, r_pad, n_flat, value_dtype_str,
                    res, ct_flat):
    """VJP of the bilinear (w, dcols) ↦ scatter(w·dcols) map (second
    order only; first-order training never reaches this)."""
    idx_local, w, dcols = res
    lg = len(sizes)
    b = w.shape[1]
    g = _lazy_feats(ct_flat, idx_local, offsets, f, c)  # (Lg, C, B, F)
    dc3 = dcols.reshape(lg, f, b).astype(jnp.float32)
    dw = g[..., 0] * dc3[:, None, 0, :]
    for k in range(1, f):
        dw = dw + g[..., k] * dc3[:, None, k, :]
    wr = w.reshape(lg, c, b).astype(jnp.float32)
    ddc = jnp.stack([jnp.sum(wr * g[..., k], axis=1) for k in range(f)],
                    axis=1).reshape(lg * f, b)
    return None, dw.reshape(lg * c, b), ddc


mm_scatter.defvjp(_mm_scatter_fwd, _mm_scatter_bwd)
