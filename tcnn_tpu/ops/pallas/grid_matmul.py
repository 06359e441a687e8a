"""MXU one-hot matmul kernels for the grid encoding's gather + scatter.

The grid backward is a scatter-add of M = B·L·2^D weighted gradient
rows into per-level feature tables (reference: atomicAdd,
grid.h:214-320).  Round 2's Pallas serial scatter is scalar-ISSUE bound
at ~9.5 ns per packed pair — a hard floor for any design that touches
rows one at a time, because the TPU has ONE scalar unit and no gather/
scatter hardware.  These kernels take the opposite approach: express
the scatter (and the forward gather) as DENSE matmuls against one-hot
matrices, so the work runs on the MXU/VPU at vector rates:

  scatter:  grad_f[hi, lo] = Σ_s 1[idx_hi(s)=hi] · W_f[lo, s]
            with W_f[lo, s] = 1[idx_lo(s)=lo] · (w·dy_f)(s)
            — one (HI, T)x(T→, 128) contraction per (slot, feature);
            the factorization idx = hi·128 + lo keeps the one-hot
            build cost at (R/128 + 128) vector lanes per update
            instead of R.

  gather:   z_f[lo, s] = Σ_hi tab_f[lo, hi] · 1[idx_hi(s)=hi]
            y_f[s]     = Σ_lo 1[idx_lo(s)=lo] · z_f[lo, s]
            out[l·F+f] = Σ_c w_c · y_f
            — the level table (tiny: KBs..MBs) stays VMEM-resident as
            the matmul operand; interpolation weights are applied
            in-kernel so only the (L·F, B) feature columns ever leave.

A "slot" s is a (level, corner) pair.  Two dispatch modes share the
kernels:

  * per-level (merged=False): pallas grid dim runs over levels, each
    grid step handling that level's C corner slots against its own
    (r_pad-row) table block.
  * merged (merged=True): several SMALL levels are concatenated into
    ONE virtual table (level-local rows shifted by intra-class
    offsets) and all their Lg·C slots run in a single grid step.
    Rationale: the MXU processes 128-row tiles, so a 300-row level
    costs the same contraction as a 16384-row one — merging levels
    until the virtual table fills ~128 hi-rows removes that padding
    waste entirely (on the flagship geometry, per-level padding is
    ~27% of all MACs).

Per-update cost is ≈ R_pad·F MACs (MXU) + ~(R_pad/128 + 128·(1+F·P))
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

from . import interpret_mode

_LO = 128          # lanes of the one-hot "lo" factor (idx = hi*_LO + lo)


def _def_tile() -> int:
    """Updates per grid step (per slot); env-tunable for on-chip A/B
    (larger tiles amortize one-hot builds over more MXU work but raise
    VMEM pressure)."""
    import os

    return int(os.environ.get("TCNN_TPU_MM_TILE", 4096))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def batch_tile(b: int) -> int:
    """Largest power-of-two tile ≤ the tile budget dividing b; 0 = no
    tile (caller falls back to an XLA path).

    The env budget is rounded DOWN to a power of two first: the grid
    is ``b // tile`` programs, so a non-divisor tile would silently
    skip the batch tail (wrong numerics, no error)."""
    budget = _def_tile()
    budget = 1 << (budget.bit_length() - 1) if budget >= 1 else 0
    p2 = b & (-b)
    t = min(budget, p2)
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


def _intra_offsets(sizes: Sequence[int]) -> Tuple[int, ...]:
    """Row offsets of each level inside the merged virtual table."""
    return tuple(int(x) for x in np.concatenate(
        [[0], np.cumsum(np.array(sizes, np.int64))[:-1]]))


def _virtualize_idx(idx_local: jax.Array, sizes, c: int,
                    merged: bool) -> jax.Array:
    """Level-local (Lg·C, B) rows -> kernel row space (adds intra-class
    offsets in merged mode)."""
    if not merged:
        return idx_local
    intra = np.repeat(np.array(_intra_offsets(sizes), np.int32), c)
    return idx_local + jnp.asarray(intra)[:, None]


# ---------------------------------------------------------------------------
# Scatter: dtables[f, hi, lo] += Σ_slots one_hot(idx)^T @ (w · dy_f)
# ---------------------------------------------------------------------------


def _onehot_mode() -> str:
    """One-hot build route:

    * "i32" — i32 iota compare + i1→bf16 mask cast (an (8,128)-tiled
      i1 relayouts/packs to the bf16 tiling at the cast).
    * "arith" — bf16 relu(1−|iota−v|), no masks.  Measured SLOWER on
      chip round 4a (flagship step: 24.8 vs 21.5 ms — the 3-op chain +
      iota convert outweighs the mask cast).

    A third route was built and killed: "sel" (bf16 iota compare whose
    (16,128)-born i1 mask drives a relayout-free bf16 select).  Mosaic
    on real v5e REJECTS bf16 comparisons inside TPU kernels ("Target
    does not support this comparison", remote-compile 500), so the
    route only ever ran in interpret mode and was removed.
    """
    import os

    return os.environ.get("TCNN_TPU_ONEHOT", "i32")


def _bf16_iota(n: int, tt: int):
    """(n, T) bf16 iota (tpu.iota is integer-only: build i32, convert).
    Callers hoist this out of their slot loops — one build per kernel
    invocation, reused by every one-hot."""
    return jax.lax.broadcasted_iota(
        jnp.int32, (n, tt), 0).astype(jnp.bfloat16)


def _arith_onehot(iota_b, v):
    """EXACT bf16 one-hot of a (1, T) i32 row against a prebuilt bf16
    iota with values < 256: relu(1 − |iota − v|) — integers ≤ 256 are
    exact in bf16 and any miss distance ≥ 1 clamps to 0.  No compares,
    no i1 masks."""
    d = iota_b - v.astype(jnp.bfloat16)
    one = jnp.ones((), jnp.bfloat16)
    return jnp.maximum(one - jnp.abs(d), jnp.zeros((), jnp.bfloat16))


def _onehot_pair(idx, hi_n: int, tt: int, iotas=None):
    """(hi one-hot, lo one-hot) bf16 matrices for a (1, T) i32 row of
    kernel-space indices.

    Default route: i32 iota compare + i1→bf16 mask cast by
    MULTIPLICATION-compatible astype (an i32-born i1 mask is
    (8,128)-tiled and Mosaic cannot relayout it for a bf16 select,
    so the mask is materialized as bf16 0/1 and applied by multiply).
    TCNN_TPU_ONEHOT=arith selects the alternative arithmetic build
    relu(1 − |iota − v|) — exact for values ≤ 256, no i1 masks —
    which measured SLOWER on chip (see :func:`_onehot_mode`).
    """
    hi = idx // _LO
    lo = idx % _LO
    if hi_n <= 256 and _onehot_mode() == "arith":
        iota_hi_b, iota_lo_b = iotas or (_bf16_iota(hi_n, tt),
                                         _bf16_iota(_LO, tt))
        return (_arith_onehot(iota_hi_b, hi),
                _arith_onehot(iota_lo_b, lo))
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tt), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LO, tt), 0)
    # Mask by MULTIPLICATION, not select (see docstring).
    hihot = (iota_hi == hi).astype(jnp.bfloat16)
    lohot = (iota_lo == lo).astype(jnp.bfloat16)
    return hihot, lohot


def _scatter_kernel(cc: int, c: int, f: int, hi_n: int, n_passes: int,
                    idx_ref, w_ref, dc_ref, out_ref):
    """One (table-block, batch-tile) step: accumulate all CC slots'
    updates into the block's per-feature (HI, 128) gradient planes.

    idx_ref: (1, CC, T) int32 kernel-space rows.
    w_ref:   (1, CC, T) f32 corner weights.
    dc_ref:  (1, (CC//C)·F, T) f32 SoA output cotangent rows — the
             w·dy value product and its bf16 term split happen HERE
             (in VMEM), not on the XLA side: per update that is F·P
             extra VPU lanes, and it saves materializing + reading a
             (P·CC·F, B) bf16 operand through HBM per class.
    out_ref: (1, HI, F·128) f32 — feature-packed lane blocks
             (feature fi's lo lanes live at columns [fi·128, fi·128+128)).
    """
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    tt = idx_ref.shape[2]
    use_arith = hi_n <= 256 and _onehot_mode() != "i32"
    iotas = (_bf16_iota(hi_n, tt), _bf16_iota(_LO, tt)) if use_arith else None
    # FEATURE-PACKED accumulator: all F features ride ONE
    # (hi_n, T)×(T, F·128) dot per (slot, pass) — identical MACs to F
    # separate N=128 dots, F× fewer MXU issues (each with its own
    # pipeline fill against the same hihot operand).
    acc = jnp.zeros((hi_n, f * _LO), jnp.float32)
    for ci in range(cc):
        idx = idx_ref[0, ci:ci + 1, :]
        hihot, lohot = _onehot_pair(idx, hi_n, tt, iotas)
        w_row = w_ref[0, ci:ci + 1, :]
        base = (ci // c) * f
        terms = [_split_bf16(
            w_row * dc_ref[0, base + fi:base + fi + 1, :], n_passes)
            for fi in range(f)]
        for p in range(n_passes):
            w_t = jnp.concatenate([lohot * terms[fi][p]
                                   for fi in range(f)], axis=0)
            acc = acc + jax.lax.dot_general(
                hihot, w_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[...] += acc[None]


def scatter_levels_matmul(idx_local: jax.Array, w: jax.Array,
                          dcols: jax.Array, r_pad: int, f: int,
                          c: int, value_dtype=jnp.float32,
                          merged: bool = False) -> jax.Array:
    """Scatter w·dcols into per-level gradient blocks via MXU.

    Args:
      idx_local: (Lg·C, B) int32 rows in KERNEL space — level-local in
                 per-level mode, virtual-table rows in merged mode.
      w:         (Lg·C, B) f32 corner weights (same ordering).
      dcols:     (Lg·F, B) f32 SoA output cotangent.
      r_pad:     padded row count (multiple of 128) of each table
                 block — per level (per-level mode) or of the single
                 virtual table (merged mode).
      value_dtype: dtype whose precision the value operand should
                 carry (bf16 → single pass, f32 → two-term split).

    Returns (n_blocks, r_pad, F) f32 gradient blocks (n_blocks = Lg in
    per-level mode, 1 in merged mode; rows past each level's extent
    are zero).  Deterministic.
    """
    lc, b = idx_local.shape
    n_lvl = lc // c
    lg, cc = (1, lc) if merged else (n_lvl, c)
    t = batch_tile(b)
    hi_n = r_pad // _LO
    n_passes = _value_passes(value_dtype)
    if t == 0:
        raise ValueError(f"batch {b} has no usable tile")

    # The w·dy product and its bf16 term split happen IN-KERNEL; the
    # operands here are just reshaped views of arrays the step already
    # materializes (corner weights + SoA cotangent), so the scatter
    # adds no XLA-side prep pass over the batch.
    fdc = (cc // c) * f
    kernel = functools.partial(_scatter_kernel, cc, c, f, hi_n, n_passes)
    out = pl.pallas_call(
        kernel,
        grid=(lg, b // t),
        in_specs=[
            pl.BlockSpec((1, cc, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, cc, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, fdc, t), lambda l, tb: (l, 0, tb)),
        ],
        out_specs=pl.BlockSpec((1, hi_n, f * _LO), lambda l, tb: (l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((lg, hi_n, f * _LO), jnp.float32),
        interpret=interpret_mode(),
        name="mm_scatter",
    )(idx_local.astype(jnp.int32).reshape(lg, cc, b),
      w.astype(jnp.float32).reshape(lg, cc, b),
      dcols.astype(jnp.float32).reshape(lg, fdc, b))
    # (lg, HI, F·128) -> (lg, r_pad, F): the kernel's feature-packed
    # lane blocks put row hi·128+lo, feature fi at [l, hi, fi·128+lo].
    return out.reshape(lg, hi_n, f, _LO).transpose(0, 1, 3, 2) \
              .reshape(lg, r_pad, f)


# ---------------------------------------------------------------------------
# Pair-packed scatter (dense/tiled strides or HashType.CoherentAdd):
# both dim-0 corners of a pair land on table rows (r, r+1), so ONE
# one-hot contraction per PAIR serves both — the odd corner's value
# rides the lane lo+1 of the same value column.  Lane wraps (lo == 127,
# odd row in the NEXT hi block) accumulate into a per-block carry plane
# folded outside the kernel; level wraps (odd row == level's last + 1
# ≡ level's first, grid.h hash % size) are zero-weighted in-kernel and
# corrected outside, mirroring the serial pair kernels.  Cuts the MXU
# work ~25% (main dots halve; +1 carry dot per pair) and the one-hot
# builds ~2× vs the unpaired kernels.
# ---------------------------------------------------------------------------


def paired_mm_enabled() -> bool:
    """Opt-in until measured on hardware (TCNN_TPU_MM_PAIRED=1)."""
    import os

    return bool(os.environ.get("TCNN_TPU_MM_PAIRED"))


def _onehot_paired(idx, hi_n: int, tt: int, iotas=None):
    """(hihot, lo_e, lo_o, wrap) bf16 matrices for pair-packed kernels
    (even row one-hot, odd = lane lo+1, lane-wrap mask at lo==127);
    arithmetic bf16 builds for hi_n ≤ 256 as in :func:`_onehot_pair`
    (at lo==127, lo+1==128 matches no lane — exactly the lane-wrap
    convention, whose mass rides ``wrap``)."""
    hi = idx // _LO
    lo = idx % _LO
    if hi_n <= 256 and _onehot_mode() != "i32":
        one = jnp.ones((), jnp.bfloat16)
        zero = jnp.zeros((), jnp.bfloat16)
        lo_b = lo.astype(jnp.bfloat16)
        iota_hi_b, iota_lo_b = iotas or (_bf16_iota(hi_n, tt),
                                         _bf16_iota(_LO, tt))
        hihot = _arith_onehot(iota_hi_b, hi)
        lo_e = _arith_onehot(iota_lo_b, lo)
        lo_o = _arith_onehot(iota_lo_b, lo + 1)
        wrap = jnp.maximum(one - jnp.abs(lo_b - (_LO - 1)), zero)
        return hihot, lo_e, lo_o, wrap
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tt), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LO, tt), 0)
    # bf16 0/1 masks + multiplication instead of i1 selects: Mosaic
    # cannot relayout an i32-born i1 mask to the (16,128) tiling a
    # bf16 select needs (see _onehot_pair).
    hihot = (iota_hi == hi).astype(jnp.bfloat16)
    lo_e = (iota_lo == lo).astype(jnp.bfloat16)
    lo_o = (iota_lo == lo + 1).astype(jnp.bfloat16)
    wrap = (lo == _LO - 1).astype(jnp.bfloat16)
    return hihot, lo_e, lo_o, wrap


def _scatter_kernel_paired(ccp: int, cp: int, f: int, hi_n: int,
                           n_passes: int, idx_ref, we_ref, wo_ref,
                           dc_ref, out_ref, carry_ref):
    """One (table-block, batch-tile) step over CCP corner-PAIR slots.

    idx_ref: (1, CCP, T) int32 kernel-space EVEN-corner rows.
    we_ref/wo_ref: (1, CCP, T) f32 even/odd corner weights (odd
             weights pre-zeroed at level-wrap rows); the w·dy products
             and bf16 term splits happen in-kernel (see
             :func:`_scatter_kernel`).
    dc_ref:  (1, (CCP//CP)·F, T) f32 SoA cotangent rows.
    out_ref: (F, HI, 128) f32 main gradient planes.
    carry_ref: (1, HI, 128) f32; column p·F + f holds the lane-wrap
               mass destined for row (hi+1)·128 (folded by the caller).
    """
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        carry_ref[...] = jnp.zeros_like(carry_ref)

    tt = idx_ref.shape[2]
    use_arith = hi_n <= 256 and _onehot_mode() != "i32"
    iotas = (_bf16_iota(hi_n, tt), _bf16_iota(_LO, tt)) if use_arith else None
    accs = [jnp.zeros((hi_n, _LO), jnp.float32) for _ in range(f)]
    acc_c = jnp.zeros((hi_n, _LO), jnp.float32)
    for ci in range(ccp):
        idx = idx_ref[0, ci:ci + 1, :]
        hihot, lo_e, lo_o, wrap = _onehot_paired(idx, hi_n, tt, iotas)
        we_row = we_ref[0, ci:ci + 1, :]
        wo_row = wo_ref[0, ci:ci + 1, :]
        wc_rows = []
        for fi in range(f):
            dc_row = dc_ref[0, (ci // cp) * f + fi:(ci // cp) * f + fi + 1, :]
            terms_e = _split_bf16(we_row * dc_row, n_passes)
            terms_o = _split_bf16(wo_row * dc_row, n_passes)
            for p in range(n_passes):
                w_t = lo_e * terms_e[p] + lo_o * terms_o[p]
                accs[fi] = accs[fi] + jax.lax.dot_general(
                    hihot, w_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                wc_rows.append(wrap * terms_o[p])
        # One stacked carry contraction per pair: the wrapped odd mass
        # rides rows of a single (128, T) value operand.
        wc = jnp.concatenate(
            wc_rows + [jnp.zeros((_LO - len(wc_rows), tt), jnp.bfloat16)],
            axis=0)
        acc_c = acc_c + jax.lax.dot_general(
            hihot, wc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[...] += jnp.stack(accs)
    carry_ref[...] += acc_c[None]


def scatter_levels_matmul_paired(idx_e: jax.Array, w_e: jax.Array,
                                 w_o: jax.Array, dcols: jax.Array,
                                 r_pad: int, f: int, c: int,
                                 value_dtype=jnp.float32,
                                 merged: bool = False):
    """Pair-packed MXU scatter.

    Args:
      idx_e: (Lg·C/2, B) int32 EVEN-corner rows in KERNEL space (the
             odd corner is implicitly idx_e+1; level wraps must already
             be zero-weighted in w_o).
      w_e/w_o: (Lg·C/2, B) f32 corner weights.
      dcols: (Lg·F, B) f32 SoA output cotangent.

    Returns (blocks, carry): blocks (n_blocks, r_pad, F) f32 as the
    unpaired kernel; carry (n_blocks, r_pad//128, F) f32 lane-wrap mass
    destined for rows (hi+1)·128 (top row always zero).
    """
    lcp, b = idx_e.shape
    cp = c // 2
    n_lvl = lcp // cp
    lg, ccp = (1, lcp) if merged else (n_lvl, cp)
    t = batch_tile(b)
    hi_n = r_pad // _LO
    n_passes = _value_passes(value_dtype)
    if t == 0:
        raise ValueError(f"batch {b} has no usable tile")

    fdc = (ccp // cp) * f
    kernel = functools.partial(_scatter_kernel_paired, ccp, cp, f, hi_n,
                               n_passes)
    out, carry = pl.pallas_call(
        kernel,
        grid=(lg, b // t),
        in_specs=[
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, fdc, t), lambda l, tb: (l, 0, tb)),
        ],
        out_specs=[
            pl.BlockSpec((f, hi_n, _LO), lambda l, tb: (l, 0, 0)),
            pl.BlockSpec((1, hi_n, _LO), lambda l, tb: (l, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lg * f, hi_n, _LO), jnp.float32),
            jax.ShapeDtypeStruct((lg, hi_n, _LO), jnp.float32),
        ],
        interpret=interpret_mode(),
        name="mm_scatter_paired",
    )(idx_e.astype(jnp.int32).reshape(lg, ccp, b),
      w_e.astype(jnp.float32).reshape(lg, ccp, b),
      w_o.astype(jnp.float32).reshape(lg, ccp, b),
      dcols.astype(jnp.float32).reshape(lg, fdc, b))
    blocks = out.reshape(lg, f, hi_n, _LO).transpose(0, 2, 3, 1) \
                .reshape(lg, r_pad, f)
    # carry column fi·P+p -> (lg, hi_n, F), summing the value passes.
    cc3 = carry.reshape(lg, hi_n, _LO)[:, :, :n_passes * f] \
               .reshape(lg, hi_n, f, n_passes).sum(axis=3)
    return blocks, cc3


# ---------------------------------------------------------------------------
# XOR-paired kernels: share ONE hi-block one-hot between both dim-0
# corners of a sample.  The even/odd corner rows of a pair land in the
# SAME 128-row hi block with high probability whenever the indexing is
# low-bit structured:
#   * dense/tiled strides (stride_0 = 1): idx_o = idx_e + 1 (mod size)
#     — same hi unless lo == 127 or the level wraps;
#   * HashType.CoherentAdd: idx_o = idx_e + 1 (mod size) by
#     construction;
#   * HashType.CoherentPrime with a power-of-two level size (every
#     capped hash level): factors[0] == 1 (common_device.h:653) and
#     ``% 2^k`` is a bitmask, so idx = (c0 ^ m) & (2^k−1) and
#     incrementing c0 flips only bits [0, t] with t = count of
#     trailing ones — the hi bits (≥7) match unless t ≥ 7, i.e. with
#     probability 127/128 under uniform inputs.  This covers the
#     REFERENCE's default hash (grid.h: HashType::CoherentPrime).
# When the pair shares hi, one (hi_n, T)×(T, 128) contraction per
# (feature, pass) serves BOTH corners (the odd value rides its own lo
# lane of the same value column) — HALVING the MXU cost that dominates
# the unpaired kernels.  The rare non-shared ("carry") odd corners are
# COMPACTED in-kernel: a log-shift prefix sum ranks them, a (K, T)
# one-hot permutation matmul moves their (hi, lo, value) payload into
# K ≤ 256 columns, and one tiny (hi_n, K) contraction scatters them
# exactly.  The kernel takes the FULL odd index, so level wrap-around
# needs no special casing (a wrapped odd corner simply lands in a
# different hi block and rides the carry path).  Capacity overflow
# (> K carries in one (slot, tile)) is detected by the caller with a
# cheap XLA count and the whole class falls back to the dense kernel
# via lax.cond, so results are exact for EVERY input; K is sized so
# uniform data overflows with negligible probability.
# Deterministic (fixed accumulation order), like every kernel here.
# ---------------------------------------------------------------------------


def xor_pair_mode(n_passes: int = 1) -> frozenset:
    """Directions routed to the XOR-paired kernels for a class whose
    value operand needs ``n_passes`` bf16 terms.

    TCNN_TPU_MM_XOR ∈ {"auto" (default), "0", "gather", "scatter",
    "1"/"both"}.  Auto resolves by table dtype, following the on-chip
    A/B (flagship geometry, B=2^18):

    * P=2 (f32 tables): BOTH directions — xor wins decisively, the
      halved large-dot MACs dominate: grid fwd+bwd 30.52 ms (xor) vs
      38.06 (dense), fwd-only 17.79 vs 19.26.
    * P=1 (bf16 tables, the bf16-policy flagship): NONE — xor LOSES in
      every combination (step 20.92 ms off vs 22.89 both / 23.29
      gather-only / 23.08 both+noguard): with the big dots halved in
      count the carry machinery's SMALL side matmuls (z_c, the (1,K)
      re-injection, the compact move) are issue-bound on the MXU, and
      the dest prologue + cond operands add XLA-side passes.

    See ROOFLINE.md round-4 table."""
    import os

    v = os.environ.get("TCNN_TPU_MM_XOR", "auto")
    if v == "auto":
        v = "both" if n_passes >= 2 else "0"
    if v == "0":
        return frozenset()
    if v in ("1", "both"):
        return frozenset(("gather", "scatter"))
    return frozenset((v,))


def xor_carry_cap() -> int:
    """Carry-column capacity K per (slot, batch-tile); 128-multiple.

    Sizing: carries per (slot, 4096-tile) are ~Poisson(T·rate) with
    rate ≤ 1/128 + 0.5/(res−1) ≤ ~1.6% for eligible levels
    (grid_ops._xor_ok), i.e. mean ≤ 65 — K=128 leaves ≥ 8σ headroom,
    and overflow only costs a dense-kernel fallback step, never
    correctness."""
    import os

    return int(os.environ.get("TCNN_TPU_XOR_K", 128))


def _xor_diag() -> tuple:
    """Perf-diagnosis switches (NOT for production use):
    TCNN_TPU_XOR_NOGUARD=1 skips the overflow lax.cond (assumes no
    overflow); TCNN_TPU_XOR_NOCARRY=1 drops the carry pass entirely
    (WRONG numerics — isolates its cost on chip)."""
    import os

    return (bool(os.environ.get("TCNN_TPU_XOR_NOGUARD")),
            bool(os.environ.get("TCNN_TPU_XOR_NOCARRY")))


def _carry_compact(dest, iota_k, payload_rows):
    """Compact the masked columns of ``payload_rows`` into the first K
    columns (K = iota_k rows).

    dest: (1, T) i32 carry ranks from :func:`xor_dest` (−1 at
    non-carry columns, computed in the XLA prologue at full batch
    efficiency — an in-kernel lane cumsum runs on (1, T) rows at 1/8
    sublane occupancy).  payload_rows: list of (1, T) bf16 rows
    (already masked).
    Returns (len(rows), K) f32 compacted payload — column j holds the
    j-th carry column's payload, zero past the count.  Carries beyond
    K were clamped by xor_dest and their tiles routed to the dense
    kernel by the overflow cond."""
    p_c = (iota_k == dest).astype(jnp.bfloat16)
    y = jnp.concatenate(payload_rows, axis=0)    # (rows, T) bf16
    return jax.lax.dot_general(
        y, p_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32), p_c


def xor_dest(idx_e_v: jax.Array, idx_o_v: jax.Array, b: int):
    """Carry ranks + overflow flag for the XOR-paired kernels.

    idx_*_v: (slots, B) KERNEL-space rows.  Returns (dest, ok):
    dest (slots, B) i32 — per-(slot, batch-tile) rank of each carry
    column (hi_e != hi_o), −1 elsewhere; ok scalar bool — no
    (slot, tile) exceeds the carry capacity K."""
    t = batch_tile(b)
    k_cap = min(xor_carry_cap(), t)
    m = (idx_e_v // _LO) != (idx_o_v // _LO)
    m3 = m.reshape(m.shape[0], b // t, t)
    ranks = jnp.cumsum(m3.astype(jnp.int32), axis=2)
    dest = jnp.where(m3, ranks - 1, -1)
    ok = jnp.max(ranks[..., -1]) <= k_cap
    return dest.reshape(m.shape[0], b), ok


def _scatter_kernel_xor(ccp: int, cp: int, f: int, hi_n: int,
                        n_passes: int, k_cap: int, idx_e_ref, idx_o_ref,
                        dest_ref, w_e_ref, w_o_ref, dc_ref, out_ref):
    """One (table-block, batch-tile) step over CCP corner-PAIR slots.

    idx_e_ref/idx_o_ref: (1, CCP, T) int32 kernel-space rows of the
    even/odd corner (odd = FULL index — wraps and hash carries welcome).
    dest_ref: (1, CCP, T) int32 carry ranks (xor_dest).
    w_e_ref/w_o_ref: (1, CCP, T) f32 corner weights.
    dc_ref: (1, (CCP//CP)·F, T) f32 SoA cotangent rows.
    out_ref: (F, HI, 128) f32 gradient planes.
    """
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    tt = idx_e_ref.shape[2]
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tt), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LO, tt), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k_cap, tt), 0)
    iota_hi_k = jax.lax.broadcasted_iota(jnp.int32, (hi_n, k_cap), 0)
    iota_lo_k = jax.lax.broadcasted_iota(jnp.int32, (_LO, k_cap), 0)
    accs = [jnp.zeros((hi_n, _LO), jnp.float32) for _ in range(f)]
    for ci in range(ccp):
        idx_e = idx_e_ref[0, ci:ci + 1, :]
        idx_o = idx_o_ref[0, ci:ci + 1, :]
        dest = dest_ref[0, ci:ci + 1, :]
        hi_e = idx_e // _LO
        hi_o = idx_o // _LO
        lo_o = idx_o % _LO
        m_i = (dest >= 0).astype(jnp.int32)
        mb = m_i.astype(jnp.bfloat16)
        w_e_row = w_e_ref[0, ci:ci + 1, :]
        w_o_row = w_o_ref[0, ci:ci + 1, :]
        hihot = (iota_hi == hi_e).astype(jnp.bfloat16)
        lo_e_hot = (iota_lo == (idx_e % _LO)).astype(jnp.bfloat16)
        lo_o_hot = ((iota_lo == lo_o).astype(jnp.bfloat16)
                    * (1.0 - mb))
        # Masking is by 0/1 MULTIPLY (Mosaic cannot relayout an
        # i32-born i1 mask to bf16 select tiling, and bf16-born
        # compares are rejected by the v5e target outright).  Caveat:
        # a non-finite value in a masked-out lane becomes 0·Inf = NaN
        # and contaminates the plane, where a select would zero it;
        # only reachable when the incoming cotangent is already
        # non-finite (diverged training).
        payload = [(hi_o * m_i).astype(jnp.bfloat16),
                   (lo_o * m_i).astype(jnp.bfloat16)]
        for fi in range(f):
            dc_row = dc_ref[0, (ci // cp) * f + fi:(ci // cp) * f + fi + 1, :]
            terms_e = _split_bf16(w_e_row * dc_row, n_passes)
            terms_o = _split_bf16(w_o_row * dc_row, n_passes)
            for p in range(n_passes):
                w_t = lo_e_hot * terms_e[p] + lo_o_hot * terms_o[p]
                accs[fi] = accs[fi] + jax.lax.dot_general(
                    hihot, w_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                payload.append(terms_o[p] * mb)
        if _xor_diag()[1]:          # NOCARRY diagnosis mode
            continue
        yc, _ = _carry_compact(dest, iota_k, payload)
        hihot_c = (iota_hi_k == yc[0:1].astype(jnp.int32)) \
            .astype(jnp.bfloat16)
        lohot_c = (iota_lo_k == yc[1:2].astype(jnp.int32)) \
            .astype(jnp.bfloat16)
        for fi in range(f):
            for p in range(n_passes):
                r = 2 + fi * n_passes + p
                w_tc = lohot_c * yc[r:r + 1].astype(jnp.bfloat16)
                accs[fi] = accs[fi] + jax.lax.dot_general(
                    hihot_c, w_tc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
    out_ref[...] += jnp.stack(accs)


def scatter_levels_matmul_xor(idx_e: jax.Array, idx_o: jax.Array,
                              dest: jax.Array,
                              w_e: jax.Array, w_o: jax.Array,
                              dcols: jax.Array, r_pad: int, f: int,
                              c: int, value_dtype=jnp.float32,
                              merged: bool = False) -> jax.Array:
    """XOR-paired MXU scatter (see the section comment).

    idx_e/idx_o: (Lg·C/2, B) int32 KERNEL-space even/odd corner rows
    (idx_o is the full odd index — no adjacency assumption).
    dest: (Lg·C/2, B) int32 carry ranks from :func:`xor_dest`.
    w_e/w_o: (Lg·C/2, B) f32.  dcols: (Lg·F, B) f32 SoA cotangent.
    Returns (n_blocks, r_pad, F) f32 — same contract as
    :func:`scatter_levels_matmul`.  EXACT only when no (slot, tile)
    has more than xor_carry_cap() carries; callers must guard with
    xor_dest's ok flag (mm_scatter does).
    """
    lcp, b = idx_e.shape
    cp = c // 2
    n_lvl = lcp // cp
    lg, ccp = (1, lcp) if merged else (n_lvl, cp)
    t = batch_tile(b)
    hi_n = r_pad // _LO
    n_passes = _value_passes(value_dtype)
    k_cap = min(xor_carry_cap(), t or 0)
    if t == 0:
        raise ValueError(f"batch {b} has no usable tile")

    fdc = (ccp // cp) * f
    kernel = functools.partial(_scatter_kernel_xor, ccp, cp, f, hi_n,
                               n_passes, k_cap)
    out = pl.pallas_call(
        kernel,
        grid=(lg, b // t),
        in_specs=[
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, fdc, t), lambda l, tb: (l, 0, tb)),
        ],
        out_specs=pl.BlockSpec((f, hi_n, _LO), lambda l, tb: (l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((lg * f, hi_n, _LO), jnp.float32),
        interpret=interpret_mode(),
        name="mm_scatter_xor",
    )(idx_e.astype(jnp.int32).reshape(lg, ccp, b),
      idx_o.astype(jnp.int32).reshape(lg, ccp, b),
      dest.astype(jnp.int32).reshape(lg, ccp, b),
      w_e.astype(jnp.float32).reshape(lg, ccp, b),
      w_o.astype(jnp.float32).reshape(lg, ccp, b),
      dcols.astype(jnp.float32).reshape(lg, fdc, b))
    return out.reshape(lg, f, hi_n, _LO).transpose(0, 2, 3, 1) \
              .reshape(lg, r_pad, f)


def _gather_kernel_xor(ccp: int, f: int, cp: int, hi_n: int,
                       n_passes: int, k_cap: int, tab_ref, idx_e_ref,
                       idx_o_ref, dest_ref, w2_ref, out_ref):
    """XOR-paired fused gather + interpolation.

    tab_ref: (1, P·F·128, HI) bf16 (pack_tables layout).
    idx_e_ref/idx_o_ref: (1, CCP, T) int32 even/odd corner rows.
    dest_ref: (1, CCP, T) int32 carry ranks (xor_dest).
    w2_ref: (1, 2·CCP, T) f32 interleaved (even, odd) weights.
    out_ref: (1, n_lvl·F, T) f32.
    """
    tt = idx_e_ref.shape[2]
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tt), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LO, tt), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k_cap, tt), 0)
    iota_hi_k = jax.lax.broadcasted_iota(jnp.int32, (hi_n, k_cap), 0)
    iota_lo_k = jax.lax.broadcasted_iota(jnp.int32, (_LO, k_cap), 0)
    n_lvl = ccp // cp

    rows = []
    for l in range(n_lvl):
        accs = [jnp.zeros((1, tt), jnp.float32) for _ in range(f)]
        for cj in range(cp):
            ci = l * cp + cj
            idx_e = idx_e_ref[0, ci:ci + 1, :]
            idx_o = idx_o_ref[0, ci:ci + 1, :]
            dest = dest_ref[0, ci:ci + 1, :]
            hi_o = idx_o // _LO
            lo_o = idx_o % _LO
            m_i = (dest >= 0).astype(jnp.int32)
            shared = dest < 0
            hihot = (iota_hi == idx_e // _LO).astype(jnp.bfloat16)
            lo_e_hot = iota_lo == (idx_e % _LO)
            lo_o_hot = (iota_lo == lo_o) & shared
            nocarry = _xor_diag()[1]
            if not nocarry:
                yc, p_c = _carry_compact(
                    dest, iota_k,
                    [(hi_o * m_i).astype(jnp.bfloat16),
                     (lo_o * m_i).astype(jnp.bfloat16)])
                hihot_c = (iota_hi_k == yc[0:1].astype(jnp.int32)) \
                    .astype(jnp.bfloat16)
                lohot_c = iota_lo_k == yc[1:2].astype(jnp.int32)
            w_e = w2_ref[0, 2 * ci:2 * ci + 1, :]
            w_o = w2_ref[0, 2 * ci + 1:2 * ci + 2, :]
            for fi in range(f):
                z = jnp.zeros((_LO, tt), jnp.float32)
                z_c = jnp.zeros((_LO, k_cap), jnp.float32)
                for p in range(n_passes):
                    r = (p * f + fi) * _LO
                    z = z + jax.lax.dot_general(
                        tab_ref[0, r:r + _LO, :], hihot,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if not nocarry:
                        z_c = z_c + jax.lax.dot_general(
                            tab_ref[0, r:r + _LO, :], hihot_c,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                y_e = jnp.sum(jnp.where(lo_e_hot, z, 0.0), axis=0,
                              keepdims=True)
                y_o = jnp.sum(jnp.where(lo_o_hot, z, 0.0), axis=0,
                              keepdims=True)
                if not nocarry:
                    y_ck = jnp.sum(jnp.where(lohot_c, z_c, 0.0), axis=0,
                                   keepdims=True)           # (1, K)
                    # Re-inject compacted carry values at their
                    # original columns (P_c is the forward permutation;
                    # bf16 term split keeps f32-table precision
                    # through the MXU).
                    for term in _split_bf16(y_ck, n_passes):
                        y_o = y_o + jax.lax.dot_general(
                            term, p_c, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                accs[fi] = accs[fi] + w_e * y_e + w_o * y_o
        rows.extend(accs)
    out_ref[...] = jnp.concatenate(rows, axis=0)[None]


def _gather_levels_matmul_xor_impl(tabT: jax.Array, idx_e: jax.Array,
                                   idx_o: jax.Array, dest: jax.Array,
                                   w2: jax.Array,
                                   f: int, c: int, n_passes: int,
                                   merged: bool = False) -> jax.Array:
    """XOR-paired gather wrapper (same contract as the paired impl:
    returns (Lg·F, B) f32 columns; w2 row 2·pair+eo).  Exact only under
    the carry-capacity guard (see scatter_levels_matmul_xor)."""
    lcp, b = idx_e.shape
    cp = c // 2
    n_lvl = lcp // cp
    lg, ccp = (1, lcp) if merged else (n_lvl, cp)
    pn, hi_n = tabT.shape[1], tabT.shape[2]
    t = batch_tile(b)
    if t == 0:
        raise ValueError(f"batch {b} has no usable tile")
    k_cap = min(xor_carry_cap(), t)

    kernel = functools.partial(_gather_kernel_xor, ccp, f, cp, hi_n,
                               n_passes, k_cap)
    out = pl.pallas_call(
        kernel,
        grid=(lg, b // t),
        in_specs=[
            pl.BlockSpec((1, pn, hi_n), lambda l, tb: (l, 0, 0)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, 2 * ccp, t), lambda l, tb: (l, 0, tb)),
        ],
        out_specs=pl.BlockSpec((1, (ccp // cp) * f, t),
                               lambda l, tb: (l, 0, tb)),
        out_shape=jax.ShapeDtypeStruct((lg, (ccp // cp) * f, b),
                                       jnp.float32),
        interpret=interpret_mode(),
        name="mm_gather_xor",
    )(tabT, idx_e.astype(jnp.int32).reshape(lg, ccp, b),
      idx_o.astype(jnp.int32).reshape(lg, ccp, b),
      dest.astype(jnp.int32).reshape(lg, ccp, b),
      w2.astype(jnp.float32).reshape(lg, 2 * ccp, b))
    return out.reshape(n_lvl * f, b)


# ---------------------------------------------------------------------------
# Gather + interpolate: cols[l·F+f, b] = Σ_c w_c(b) · table_l[idx_c(b), f]
# ---------------------------------------------------------------------------


def _gather_kernel(cc: int, f: int, c: int, hi_n: int, n_passes: int,
                   tab_ref, idx_ref, w_ref, out_ref):
    """One (table-block, batch-tile) step: interpolated feature columns
    of the block's n_lvl = CC//C levels.

    tab_ref: (1, P·F·128, HI) bf16 — row (p·F+f)·128 + lo holds
             term_p(table[hi·128+lo, f]) across the HI lanes.
    idx_ref: (1, CC, T) int32 kernel-space rows.  w_ref: (1, CC, T) f32.
    out_ref: (1, n_lvl·F, T) f32 interpolated columns.
    """
    tt = idx_ref.shape[2]
    n_lvl = cc // c
    use_arith = hi_n <= 256 and _onehot_mode() != "i32"
    iotas = (_bf16_iota(hi_n, tt), _bf16_iota(_LO, tt)) if use_arith else None

    rows = []
    for l in range(n_lvl):
        accs = [jnp.zeros((1, tt), jnp.float32) for _ in range(f)]
        for cj in range(c):
            ci = l * c + cj
            idx = idx_ref[0, ci:ci + 1, :]
            # hihot (bf16, arith build) feeds the MXU; the lo SELECT
            # over the f32 dot output needs an (8,128)-tiled i1 mask,
            # i.e. an i32-born compare (Mosaic: matmul accumulators
            # must be 32-bit, so a bf16-select route is unavailable).
            hihot, _ = _onehot_pair(idx, hi_n, tt, iotas)
            lohot = jax.lax.broadcasted_iota(
                jnp.int32, (_LO, tt), 0) == (idx % _LO)
            w_c = w_ref[0, ci:ci + 1, :]
            # FEATURE-PACKED dot: for a fixed pass p the F features'
            # 128-row table strips are contiguous in the pack layout,
            # so all F ride ONE (F·128, HI)×(HI, T) contraction —
            # identical MACs, F× fewer MXU issues per corner.
            z = jnp.zeros((f * _LO, tt), jnp.float32)
            for p in range(n_passes):
                r = p * f * _LO
                z = z + jax.lax.dot_general(
                    tab_ref[0, r:r + f * _LO, :], hihot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            for fi in range(f):
                y = jnp.sum(jnp.where(lohot, z[fi * _LO:(fi + 1) * _LO],
                                      0.0), axis=0, keepdims=True)
                accs[fi] = accs[fi] + w_c * y
        rows.extend(accs)
    out_ref[...] = jnp.concatenate(rows, axis=0)[None]


def _gather_kernel_paired(ccp: int, f: int, cp: int, hi_n: int,
                          n_passes: int, tab_ref, tab0s_ref, idx_ref,
                          w_ref, out_ref):
    """Pair-packed gather: one z contraction per corner PAIR.

    tab_ref: (1, P·F·128, HI) bf16 (pack_tables layout).
    tab0s_ref: (1, 128, HI) bf16 — row p·F+f holds the lo=0 table rows
               SHIFTED one hi block left (table[(hi+1)·128], feature f,
               term p): the lane-wrap odd value (lo==127 → next block).
    idx_ref: (1, CCP, T) int32 EVEN rows.  w_ref: (1, 2·CCP, T) f32,
             row 2·ci + eo (odd weights pre-zeroed at level wraps).
    out_ref: (1, n_lvl·F, T) f32.
    """
    tt = idx_ref.shape[2]
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tt), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LO, tt), 0)
    iota_hi_b = (_bf16_iota(hi_n, tt)
                 if hi_n <= 256 and _onehot_mode() != "i32" else None)
    n_lvl = ccp // cp

    rows = []
    for l in range(n_lvl):
        accs = [jnp.zeros((1, tt), jnp.float32) for _ in range(f)]
        for cj in range(cp):
            ci = l * cp + cj
            idx = idx_ref[0, ci:ci + 1, :]
            hi = idx // _LO
            lo = idx % _LO
            if iota_hi_b is not None:
                # Arithmetic bf16 hi one-hot (exact for hi < 256); the
                # lo masks stay i32-born bools for the f32 selects.
                hihot = _arith_onehot(iota_hi_b, hi)
            else:
                hihot = (iota_hi == hi).astype(jnp.bfloat16)
            lo_e = iota_lo == lo
            lo_o = iota_lo == lo + 1
            wrap = lo == _LO - 1
            w_e = w_ref[0, 2 * ci:2 * ci + 1, :]
            w_o = w_ref[0, 2 * ci + 1:2 * ci + 2, :]
            zw = jax.lax.dot_general(
                tab0s_ref[0], hihot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (128, tt)
            for fi in range(f):
                z = jnp.zeros((_LO, tt), jnp.float32)
                zw_f = jnp.zeros((1, tt), jnp.float32)
                for p in range(n_passes):
                    r = (p * f + fi) * _LO
                    z = z + jax.lax.dot_general(
                        tab_ref[0, r:r + _LO, :], hihot,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    zw_f = zw_f + zw[p * f + fi:p * f + fi + 1, :]
                y_e = jnp.sum(jnp.where(lo_e, z, 0.0), axis=0,
                              keepdims=True)
                y_o = (jnp.sum(jnp.where(lo_o, z, 0.0), axis=0,
                               keepdims=True)
                       + jnp.where(wrap, zw_f, 0.0))
                accs[fi] = accs[fi] + w_e * y_e + w_o * y_o
        rows.extend(accs)
    out_ref[...] = jnp.concatenate(rows, axis=0)[None]


def _shifted_lo0_rows(tabT: jax.Array, f: int, n_passes: int) -> jax.Array:
    """(n_blocks, P·F·128, HI) pack -> (n_blocks, 128, HI) operand whose
    row p·F+f is the lo=0 row shifted one hi block left (the lane-wrap
    odd-corner values); remaining rows zero."""
    lo0 = tabT[:, ::_LO, :]                       # (nb, P·F, HI)
    shifted = jnp.concatenate(
        [lo0[:, :, 1:], jnp.zeros_like(lo0[:, :, :1])], axis=2)
    nb, pf, hi_n = shifted.shape
    return jnp.concatenate(
        [shifted, jnp.zeros((nb, _LO - pf, hi_n), shifted.dtype)], axis=1)


def pack_tables(flat: jax.Array, sizes: Sequence[int],
                offsets: Sequence[int], f: int, r_pad: int,
                value_dtype=jnp.float32,
                merged: bool = False) -> jax.Array:
    """Level segments of a flat table -> the gather kernel's transposed
    operand (n_blocks, P·F·128, HI) bf16.

    Per-level mode: one block per level, each padded to r_pad rows.
    Merged mode: ONE block holding all levels' rows concatenated (the
    virtual table), padded to r_pad.

    For f32 tables (P=2) the second term block carries the bf16
    rounding residual, recovering ~2^-17 relative accuracy from two
    bf16 matmuls."""
    n_passes = _value_passes(value_dtype)
    hi_n = r_pad // _LO
    segs = [jax.lax.dynamic_slice_in_dim(flat, off * f, size * f)
            for size, off in zip(sizes, offsets)]
    if merged:
        segs = [jnp.concatenate(segs)]
    mats = []
    for seg in segs:
        seg = jnp.pad(seg.astype(jnp.float32),
                      (0, r_pad * f - seg.shape[0]))
        m3 = seg.reshape(hi_n, _LO, f)
        terms = _split_bf16(m3, n_passes)            # each (hi, lo, f)
        t4 = jnp.stack(terms)                        # (P, hi, lo, f)
        mats.append(t4.transpose(0, 3, 2, 1).reshape(
            n_passes * f * _LO, hi_n))
    return jnp.stack(mats, axis=0)


def _gather_levels_matmul_impl(tabT: jax.Array, idx_kernel: jax.Array,
                               w: jax.Array, f: int, c: int,
                               n_passes: int,
                               merged: bool = False) -> jax.Array:
    """Fused gather + n-linear interpolation over Lg levels via MXU.

    tabT: (n_blocks, P·F·128, HI) bf16 from :func:`pack_tables`.
    idx_kernel: (Lg·C, B) int32 kernel-space rows; w: (Lg·C, B) f32.
    Returns (Lg·F, B) f32 interpolated SoA feature columns.
    """
    lc, b = idx_kernel.shape
    n_lvl = lc // c
    lg, cc = (1, lc) if merged else (n_lvl, c)
    pn, hi_n = tabT.shape[1], tabT.shape[2]
    t = batch_tile(b)
    if t == 0:
        raise ValueError(f"batch {b} has no usable tile")

    kernel = functools.partial(_gather_kernel, cc, f, c, hi_n, n_passes)
    out = pl.pallas_call(
        kernel,
        grid=(lg, b // t),
        in_specs=[
            pl.BlockSpec((1, pn, hi_n), lambda l, tb: (l, 0, 0)),
            pl.BlockSpec((1, cc, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, cc, t), lambda l, tb: (l, 0, tb)),
        ],
        out_specs=pl.BlockSpec((1, (cc // c) * f, t),
                               lambda l, tb: (l, 0, tb)),
        out_shape=jax.ShapeDtypeStruct((lg, (cc // c) * f, b),
                                       jnp.float32),
        interpret=interpret_mode(),
        name="mm_gather",
    )(tabT, idx_kernel.astype(jnp.int32).reshape(lg, cc, b),
      w.astype(jnp.float32).reshape(lg, cc, b))
    return out.reshape(n_lvl * f, b)


def _gather_levels_matmul_paired_impl(tabT: jax.Array, idx_e: jax.Array,
                                      w2: jax.Array, f: int, c: int,
                                      n_passes: int,
                                      merged: bool = False) -> jax.Array:
    """Pair-packed fused gather + interpolation.

    idx_e: (Lg·C/2, B) int32 kernel-space EVEN rows.
    w2: (Lg·C, B) f32 interleaved (even, odd) weights, row 2·pair + eo,
        odd weights pre-zeroed at level wraps.
    Returns (Lg·F, B) f32 columns (EXCLUDING the level-wrap term, which
    the caller adds).
    """
    lcp, b = idx_e.shape
    cp = c // 2
    n_lvl = lcp // cp
    lg, ccp = (1, lcp) if merged else (n_lvl, cp)
    pn, hi_n = tabT.shape[1], tabT.shape[2]
    t = batch_tile(b)
    if t == 0:
        raise ValueError(f"batch {b} has no usable tile")

    tab0s = _shifted_lo0_rows(tabT, f, n_passes)
    kernel = functools.partial(_gather_kernel_paired, ccp, f, cp, hi_n,
                               n_passes)
    out = pl.pallas_call(
        kernel,
        grid=(lg, b // t),
        in_specs=[
            pl.BlockSpec((1, pn, hi_n), lambda l, tb: (l, 0, 0)),
            pl.BlockSpec((1, _LO, hi_n), lambda l, tb: (l, 0, 0)),
            pl.BlockSpec((1, ccp, t), lambda l, tb: (l, 0, tb)),
            pl.BlockSpec((1, 2 * ccp, t), lambda l, tb: (l, 0, tb)),
        ],
        out_specs=pl.BlockSpec((1, (ccp // cp) * f, t),
                               lambda l, tb: (l, 0, tb)),
        out_shape=jax.ShapeDtypeStruct((lg, (ccp // cp) * f, b),
                                       jnp.float32),
        interpret=interpret_mode(),
        name="mm_gather_paired",
    )(tabT, tab0s, idx_e.astype(jnp.int32).reshape(lg, ccp, b),
      w2.astype(jnp.float32).reshape(lg, 2 * ccp, b))
    return out.reshape(n_lvl * f, b)


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
                  n_flat: int, merged: bool = False) -> jax.Array:
    """Per-level gradient blocks -> FLAT (n_flat,) table grads.

    blocks: (Lg, r_pad, F) in per-level mode; (1, r_pad, F) holding the
    virtual table in merged mode."""
    intra = _intra_offsets(sizes) if merged else None
    part = jnp.zeros((n_flat,), jnp.float32)
    for gi, (size, off) in enumerate(zip(sizes, offsets)):
        src = (blocks[0, intra[gi]:intra[gi] + size] if merged
               else blocks[gi, :size])
        part = jax.lax.dynamic_update_slice(
            part, src.reshape(-1), (off * f,))
    return part


def _pair_split(idx_local, w, sizes, c):
    """Full corner arrays -> even rows, even/odd weights, level-wrap
    mask (odd corner at a level's last row wraps to its first row,
    mirroring the serial pair kernels' convention)."""
    n_lvl = len(sizes)
    b = w.shape[1]
    idx3 = idx_local.reshape(n_lvl, c, b)
    ws3 = w.astype(jnp.float32).reshape(n_lvl, c, b)
    idx_e = idx3[:, 0::2, :]
    last = jnp.asarray(np.array(sizes, np.int32).reshape(n_lvl, 1, 1)) - 1
    wrap = idx_e == last
    w_e = ws3[:, 0::2, :]
    w_o = ws3[:, 1::2, :]
    w_o_in = jnp.where(wrap, 0.0, w_o)
    return idx_e, w_e, w_o, w_o_in, wrap


def level_wrap_correction(w_o, wrap, dc3, f):
    """(L, F) wrapped odd-corner mass per level: Σ_{pairs,batch}
    w_o·dcols where the pair wraps (odd corner past the level's last
    row lands on its FIRST row).  Shared by the MXU paired scatter and
    the serial pair kernels' wrap fix-up in grid_ops — the single
    definition of the wrap convention's value math."""
    w_wrap = jnp.where(wrap, w_o, 0.0)             # (L, C/2, B)
    return jnp.stack(
        [jnp.sum(w_wrap * dc3[:, None, k, :], axis=(1, 2))
         for k in range(f)], axis=1)               # (L, F)


def feats_dot_ct(fr, ct3, f):
    """d/dw of the interpolation: Σ_k feats[l,c,b,k]·ct[l,k,b] →
    (L, C, B).  fr is (L, C, B, F), ct3 is (L, F, B)."""
    dw = fr[..., 0] * ct3[:, None, 0, :]
    for k in range(1, f):
        dw = dw + fr[..., k] * ct3[:, None, k, :]
    return dw


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _mm_gather(flat: jax.Array, idx_local: jax.Array, w: jax.Array,
               sizes: Tuple[int, ...], offsets: Tuple[int, ...],
               f: int, c: int, r_pad: int, merged: bool,
               paired) -> jax.Array:
    tabT = pack_tables(flat, sizes, offsets, f, r_pad, flat.dtype, merged)
    n_passes = _value_passes(flat.dtype)
    if not paired:
        idx_v = _virtualize_idx(idx_local, sizes, c, merged)
        return _gather_levels_matmul_impl(tabT, idx_v, w, f, c,
                                          n_passes, merged)
    if paired == "xor":
        n_lvl = len(sizes)
        b = w.shape[1]
        cp = c // 2
        idx3 = idx_local.reshape(n_lvl, c, b)
        ws3 = w.astype(jnp.float32).reshape(n_lvl, c, b)
        idx_ev = _virtualize_idx(idx3[:, 0::2, :].reshape(-1, b),
                                 sizes, cp, merged)
        idx_ov = _virtualize_idx(idx3[:, 1::2, :].reshape(-1, b),
                                 sizes, cp, merged)
        w2 = jnp.stack([ws3[:, 0::2, :], ws3[:, 1::2, :]],
                       axis=2).reshape(n_lvl * cp * 2, b)
        dest, ok = xor_dest(idx_ev, idx_ov, b)
        xor_fn = lambda: _gather_levels_matmul_xor_impl(
            tabT, idx_ev, idx_ov, dest, w2, f, c, n_passes, merged)
        if _xor_diag()[0]:          # NOGUARD diagnosis mode
            return xor_fn()
        return jax.lax.cond(
            ok, xor_fn,
            lambda: _gather_levels_matmul_impl(
                tabT, _virtualize_idx(idx_local, sizes, c, merged),
                w, f, c, n_passes, merged))
    n_lvl = len(sizes)
    b = w.shape[1]
    cp = c // 2
    idx_e, w_e, w_o, w_o_in, wrap = _pair_split(idx_local, w, sizes, c)
    idx_ev = _virtualize_idx(idx_e.reshape(-1, b), sizes, cp, merged)
    w2 = jnp.stack([w_e, w_o_in], axis=2).reshape(n_lvl * cp * 2, b)
    cols = _gather_levels_matmul_paired_impl(tabT, idx_ev, w2, f, c,
                                             n_passes, merged)
    # Level-wrap term: the wrapped odd corner reads the level's FIRST
    # row (full-precision side read, matching _interpolate_paired).
    n_rows = flat.shape[0] // f
    e0 = jnp.take(flat.reshape(n_rows, f).astype(jnp.float32),
                  jnp.asarray(np.array(offsets, np.int32)), axis=0)
    w_wrap = jnp.where(wrap, w_o, 0.0)            # (n_lvl, cp, B)
    corr = jnp.einsum("lpb,lk->lkb", w_wrap, e0).reshape(n_lvl * f, b)
    return cols + corr


def _mm_gather_fwd(flat, idx_local, w, sizes, offsets, f, c, r_pad,
                   merged, paired):
    return (_mm_gather(flat, idx_local, w, sizes, offsets, f, c, r_pad,
                       merged, paired),
            (flat, idx_local, w))


def _mm_gather_bwd(sizes, offsets, f, c, r_pad, merged, paired, res, ct):
    flat, idx_local, w = res
    dflat = mm_scatter(idx_local, w, ct, sizes, offsets, f, c, r_pad,
                       flat.shape[0], str(flat.dtype),
                       merged, paired).astype(flat.dtype)
    fr = _lazy_feats(flat, idx_local, offsets, f, c)
    lg = len(sizes)
    b = w.shape[1]
    dw = feats_dot_ct(fr, ct.reshape(lg, f, b), f)
    return dflat, None, dw.reshape(lg * c, b)


_mm_gather.defvjp(_mm_gather_fwd, _mm_gather_bwd)


def _norm_paired(paired):
    """False | True/"carry" (strict-adjacency pair kernels) | "xor"."""
    if paired is True:
        return "carry"
    return paired or False


def mm_gather(flat: jax.Array, idx_local: jax.Array, w: jax.Array,
              sizes: Tuple[int, ...], offsets: Tuple[int, ...],
              f: int, c: int, r_pad: int,
              merged: bool = False, paired=False) -> jax.Array:
    """Fused gather+interpolate of Lg levels from a flat table.

    idx_local is LEVEL-local in both modes (merged-mode intra-class
    offsets are added internally).  ``paired``: "carry" (or True)
    selects the strict-adjacency pair-packed kernels; "xor" the
    XOR-paired kernels (overflow-guarded, any index pairs).
    Returns (Lg·F, B) f32 columns; linear in ``flat``, bilinear with
    ``w``.  Reverse-differentiable to any order.
    """
    return _mm_gather(flat, idx_local, w, tuple(sizes), tuple(offsets),
                      f, c, r_pad, bool(merged), _norm_paired(paired))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11))
def _mm_scatter(idx_local: jax.Array, w: jax.Array, dcols: jax.Array,
                sizes: Tuple[int, ...], offsets: Tuple[int, ...],
                f: int, c: int, r_pad: int, n_flat: int,
                value_dtype_str: str, merged: bool,
                paired) -> jax.Array:
    if not paired:
        import os

        idx_v = _virtualize_idx(idx_local, sizes, c, merged)
        if (os.environ.get("TCNN_TPU_SCATTER") == "binned2"
                and not merged and (r_pad // _LO) % 2 == 0):
            # Opt-in sub-O(M·R_pad) design attempt — measured slower
            # (see ops/pallas/binned_scatter.py + ROOFLINE.md).
            from .binned_scatter import scatter_levels_binned2

            blocks = scatter_levels_binned2(idx_v, w, dcols, r_pad, f,
                                            c, _dtype_of(value_dtype_str))
        else:
            blocks = scatter_levels_matmul(idx_v, w, dcols, r_pad, f, c,
                                           _dtype_of(value_dtype_str),
                                           merged)
        return assemble_flat(blocks, sizes, offsets, f, n_flat, merged)
    if paired == "xor":
        n_lvl = len(sizes)
        b = w.shape[1]
        cp = c // 2
        idx3 = idx_local.reshape(n_lvl, c, b)
        ws3 = w.astype(jnp.float32).reshape(n_lvl, c, b)
        idx_ev = _virtualize_idx(idx3[:, 0::2, :].reshape(-1, b),
                                 sizes, cp, merged)
        idx_ov = _virtualize_idx(idx3[:, 1::2, :].reshape(-1, b),
                                 sizes, cp, merged)
        dest, ok = xor_dest(idx_ev, idx_ov, b)
        xor_fn = lambda: scatter_levels_matmul_xor(
            idx_ev, idx_ov, dest, ws3[:, 0::2, :].reshape(-1, b),
            ws3[:, 1::2, :].reshape(-1, b), dcols, r_pad, f, c,
            _dtype_of(value_dtype_str), merged)
        if _xor_diag()[0]:          # NOGUARD diagnosis mode
            blocks = xor_fn()
        else:
            blocks = jax.lax.cond(
                ok, xor_fn,
                lambda: scatter_levels_matmul(
                    _virtualize_idx(idx_local, sizes, c, merged), w,
                    dcols, r_pad, f, c, _dtype_of(value_dtype_str),
                    merged))
        return assemble_flat(blocks, sizes, offsets, f, n_flat, merged)
    n_lvl = len(sizes)
    b = w.shape[1]
    cp = c // 2
    idx_e, w_e, w_o, w_o_in, wrap = _pair_split(idx_local, w, sizes, c)
    idx_ev = _virtualize_idx(idx_e.reshape(-1, b), sizes, cp, merged)
    blocks, carry = scatter_levels_matmul_paired(
        idx_ev, w_e.reshape(-1, b), w_o_in.reshape(-1, b), dcols,
        r_pad, f, c, _dtype_of(value_dtype_str), merged)
    # Lane-wrap fold: mass for (hi+1)·128 accumulated at carry[hi]
    # (the top block's carry is structurally zero: its only lo==127
    # row is r_pad-1, which is level-wrap-zeroed when it exists).
    blocks = blocks.at[:, _LO::_LO, :].add(carry[:, :-1, :])
    part = assemble_flat(blocks, sizes, offsets, f, n_flat, merged)
    # Level-wrap: wrapped odd mass lands on each level's FIRST row.
    dc3 = dcols.astype(jnp.float32).reshape(n_lvl, f, b)
    corr = level_wrap_correction(w_o, wrap, dc3, f)  # (n_lvl, F)
    tgt = jnp.asarray(np.array(
        [offsets[l] * f + k for l in range(n_lvl) for k in range(f)],
        np.int32))
    return part.at[tgt].add(corr.reshape(-1))


def _mm_scatter_fwd(idx_local, w, dcols, sizes, offsets, f, c, r_pad,
                    n_flat, value_dtype_str, merged, paired):
    return (_mm_scatter(idx_local, w, dcols, sizes, offsets, f, c,
                        r_pad, n_flat, value_dtype_str, merged, paired),
            (idx_local, w, dcols))


def _mm_scatter_bwd(sizes, offsets, f, c, r_pad, n_flat, value_dtype_str,
                    merged, paired, res, ct_flat):
    """VJP of the bilinear (w, dcols) ↦ scatter(w·dcols) map (second
    order only; first-order training never reaches this)."""
    idx_local, w, dcols = res
    lg = len(sizes)
    b = w.shape[1]
    g = _lazy_feats(ct_flat, idx_local, offsets, f, c)  # (Lg, C, B, F)
    dc3 = dcols.reshape(lg, f, b).astype(jnp.float32)
    dw = feats_dot_ct(g, dc3, f)
    wr = w.reshape(lg, c, b).astype(jnp.float32)
    ddc = jnp.stack([jnp.sum(wr * g[..., k], axis=1) for k in range(f)],
                    axis=1).reshape(lg * f, b)
    return None, dw.reshape(lg * c, b), ddc


_mm_scatter.defvjp(_mm_scatter_fwd, _mm_scatter_bwd)


def mm_scatter(idx_local: jax.Array, w: jax.Array, dcols: jax.Array,
               sizes: Tuple[int, ...], offsets: Tuple[int, ...],
               f: int, c: int, r_pad: int, n_flat: int,
               value_dtype_str: str,
               merged: bool = False, paired=False) -> jax.Array:
    """Deterministic MXU scatter of ``w·dcols`` -> FLAT (n_flat,) f32
    table gradient (levels outside sizes/offsets untouched=0).
    idx_local is LEVEL-local in both modes; ``paired``: "carry" (or
    True) selects the strict-adjacency pair kernel, "xor" the
    XOR-paired kernel (overflow-guarded, any index pairs)."""
    return _mm_scatter(idx_local, w, dcols, tuple(sizes),
                       tuple(offsets), f, c, r_pad, n_flat,
                       value_dtype_str, bool(merged),
                       _norm_paired(paired))
