"""Hi-block BINNED one-hot scatter — the sub-O(M·R_pad) design attempt.

The production scatter (grid_matmul._scatter_kernel) contracts every
update against the level's FULL hi range: per update per feature that
is R_pad MACs (R_pad = 32768 at the flagship's hash levels).  This
module implements the obvious sparse improvement — partition the
updates by the TOP BIT of their row index and contract each partition
only against its half of the table — exactly the "Pallas-native
binning/compaction pass" the round-3 review asked to see built and
measured (compaction via in-kernel prefix offsets, not XLA lax.sort).

Design (G = 2 halves, per (level, batch-tile) kernel step):

  1. bucket bit  b(u) = idx(u) ≥ R_pad/2                     (VPU)
  2. in-tile ranks via cumsum along the tile                  (VPU)
  3. dest(u) = b·CAP + rank(u) with CAP = 5T/8 — a COMPACTING
     permutation with per-bucket capacity slack 1.25          (VPU)
  4. permutation matrix P[d, u] = 1[dest(u) = d] and payload
     rows (hi', lo, w·dy terms) moved by ONE matmul Y @ Pᵀ    (VPU+MXU)
  5. each half contracts its CAP compacted columns against a
     128-row hi' one-hot — 16384·1.25 MACs/update/feature
     instead of 32768                                         (MXU)

Exactness: integer payload rows (hi' < 128, lo < 128) are exact in
bf16 (integers ≤ 256); garbage columns beyond a bucket's count carry
all-zero payload and contribute exact zeros.  Bucket-capacity
overflow (a tile whose half-count exceeds CAP — probability
~e^(-T/32) per tile under a uniform hash) is detected OUTSIDE the
kernel by a cheap XLA count reduction, and the caller falls back to
the dense kernel for the whole class via lax.cond, so results are
exact for every input.

THE MEASURED VERDICT (keep with the code): the MAC saving is bounded
by 2× while step 4's permutation costs ~T one-hot-build lanes per
update on the VPU — an order of magnitude more than the dense
kernel's entire one-hot build — and the payload matmul runs at M≈6
against a 128-wide MXU.  On-chip numbers live in ROOFLINE.md; this
route stays opt-in (TCNN_TPU_SCATTER=binned2) as the documented,
measured refutation of "just bin the scatter" on this hardware.

Reference spec this replaces: the atomicAdd grid backward,
/root/reference/include/tiny-cuda-nn/encodings/grid.h:214-320.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import interpret_mode
from .grid_matmul import _LO, _split_bf16, _value_passes

# Smaller tile than the dense kernels: the permutation build is
# O(T) lanes per update, so tile size trades MXU efficiency (bigger
# K in the half-contractions) against VPU permutation cost.
_BIN_TILE = 512


def _cap(t: int) -> int:
    """Per-bucket capacity: 5T/8 rounded up to a 128 multiple
    (slack 1.25 over the T/2 mean; overflow ~e^(-T/32) per tile)."""
    return (5 * t // 8 + 127) // 128 * 128


def _binned_kernel(c: int, f: int, hi_n: int, n_passes: int, t: int,
                   idx_ref, w_ref, dc_ref, out_ref):
    """One (level, batch-tile) step of the binned scatter.

    idx_ref: (1, C, T) i32 level-local rows; w_ref (1, C, T) f32;
    dc_ref (1, F, T) f32.  out_ref (F, HI, 128) f32 with HI = hi_n.
    """
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    cap = _cap(t)
    half_rows = (hi_n // 2) * _LO
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (2 * cap, t), 0)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n // 2, t), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LO, t), 0)

    accs = [[jnp.zeros((hi_n // 2, _LO), jnp.float32) for _ in range(f)]
            for _ in range(2)]
    for ci in range(c):
        idx = idx_ref[0, ci:ci + 1, :]
        w_row = w_ref[0, ci:ci + 1, :]
        bit = (idx >= half_rows).astype(jnp.int32)
        # In-tile prefix ranks (the "in-kernel prefix offsets").
        r1 = jnp.cumsum(bit, axis=1)
        r0 = jnp.cumsum(1 - bit, axis=1)
        dest = jnp.where(bit == 1, cap + r1 - 1, r0 - 1)
        # Overflow safety inside the kernel: clamp into the bucket
        # (the caller's count check routes overflowing classes to the
        # dense kernel, so a clamped dest is never actually used).
        dest = jnp.minimum(dest, cap - 1 + bit * cap)

        # Permutation one-hot — THE dominant cost: (2·CAP, T) lanes.
        p_mat = (iota_d == dest).astype(jnp.bfloat16)

        # Payload: integer rows + value terms, all exact in bf16.
        idx_h = idx - bit * half_rows
        hi_row = (idx_h // _LO).astype(jnp.bfloat16)
        lo_row = (idx_h % _LO).astype(jnp.bfloat16)
        val_rows = []
        for fi in range(f):
            v = w_row * dc_ref[0, fi:fi + 1, :]
            val_rows.extend(_split_bf16(v, n_passes))
        y = jnp.concatenate([hi_row, lo_row] + val_rows, axis=0)

        # Move the payload into bucket-compacted columns: Y @ Pᵀ.
        yp = jax.lax.dot_general(
            y, p_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (rows, 2·CAP)

        for g in range(2):
            seg = yp[:, g * cap:(g + 1) * cap]
            hi_i = seg[0:1, :].astype(jnp.int32)
            lo_i = seg[1:2, :].astype(jnp.int32)
            hihot = (iota_hi[:, :cap] == hi_i).astype(jnp.bfloat16)
            lohot = (iota_lo[:, :cap] == lo_i).astype(jnp.bfloat16)
            for fi in range(f):
                for p in range(n_passes):
                    vrow = seg[2 + fi * n_passes + p:
                               3 + fi * n_passes + p, :].astype(jnp.bfloat16)
                    w_t = lohot * vrow
                    accs[g][fi] = accs[g][fi] + jax.lax.dot_general(
                        hihot, w_t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
    halves = [jnp.stack(accs[g]) for g in range(2)]       # (F, HI/2, 128)
    out_ref[...] += jnp.concatenate(halves, axis=1)


def scatter_levels_binned2(idx_local: jax.Array, w: jax.Array,
                           dcols: jax.Array, r_pad: int, f: int,
                           c: int, value_dtype=jnp.float32) -> jax.Array:
    """Binned G=2 scatter over per-level classes (merged unsupported).

    Same contract as grid_matmul.scatter_levels_matmul (per-level
    mode): returns (n_lvl, r_pad, F) f32 gradient blocks,
    deterministic.  Falls back to the dense kernel via lax.cond when
    any (slot, tile) bucket overflows its capacity, so it is exact for
    every input.
    """
    from . import grid_matmul as gm

    lc, b = idx_local.shape
    n_lvl = lc // c
    t = min(_BIN_TILE, gm.batch_tile(b) or _BIN_TILE)
    if b % t:
        raise ValueError(f"batch {b} not divisible by bin tile {t}")
    hi_n = r_pad // _LO
    if hi_n % 2:
        raise ValueError("binned2 needs an even hi block count")
    n_passes = _value_passes(value_dtype)
    cap = _cap(t)

    def binned(_):
        kernel = functools.partial(_binned_kernel, c, f, hi_n, n_passes, t)
        out = pl.pallas_call(
            kernel,
            grid=(n_lvl, b // t),
            in_specs=[
                pl.BlockSpec((1, c, t), lambda l, tb: (l, 0, tb)),
                pl.BlockSpec((1, c, t), lambda l, tb: (l, 0, tb)),
                pl.BlockSpec((1, f, t), lambda l, tb: (l, 0, tb)),
            ],
            out_specs=pl.BlockSpec((f, hi_n, _LO), lambda l, tb: (l, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_lvl * f, hi_n, _LO),
                                           jnp.float32),
            interpret=interpret_mode(),
            name="binned_scatter",
        )(idx_local.astype(jnp.int32).reshape(n_lvl, c, b),
          w.astype(jnp.float32).reshape(n_lvl, c, b),
          dcols.astype(jnp.float32).reshape(n_lvl, f, b))
        return out.reshape(n_lvl, f, hi_n, _LO).transpose(0, 2, 3, 1) \
                  .reshape(n_lvl, r_pad, f)

    def dense(_):
        return gm.scatter_levels_matmul(idx_local, w, dcols, r_pad, f,
                                        c, value_dtype, merged=False)

    # Cheap XLA-side capacity check: per (slot, tile) bucket counts.
    bit = (idx_local.reshape(n_lvl * c, b // t, t)
           >= (hi_n // 2) * _LO).astype(jnp.int32)
    c1 = bit.sum(axis=2)
    c0 = t - c1
    overflow = jnp.any(jnp.maximum(c0, c1) > cap)
    return jax.lax.cond(overflow, dense, binned, operand=None)
