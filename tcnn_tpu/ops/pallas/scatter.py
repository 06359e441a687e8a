"""Deterministic row scatter-add / gather pair for feature tables.

The grid encoding's backward pass is a scatter-add of ~B·L·2^D weighted
gradient rows into the feature table (the reference does this with
nondeterministic CUDA ``atomicAdd``, grid.h:214-320).  XLA's TPU
scatter costs ~68 ns per scattered row on v5e (serialized row
read-modify-write through HBM); this Pallas kernel keeps the WHOLE
gradient table resident in VMEM in a lane-packed layout and applies
updates in a serial scalar loop at ~19 ns/row — deterministic by
construction (single core, program order).

Layout: a logical ``(n_rows, F)`` f32 table is packed as
``(ceil(n_rows·F/128), 128)`` so VMEM is dense (an ``(n, F<128)`` VMEM
buffer would pad each row to 128 lanes and blow the 16 MB budget
64×/F).  Entry ``r`` lives at packed row ``r·F // 128``, lanes
``r·F % 128 … +F``.

AD: ``fast_take`` (gather) and ``scatter_add_rows`` are linear and each
other's transpose; both carry a ``jax.custom_vjp`` whose backward calls
the other, so reverse-mode differentiation composes to any order
(bwd-bwd through the grid encoding stays fast).  Forward-mode (jvp) of
these ops is not defined — the reference's bindings are also
reverse-only (modules.py:120-160) — but ``grid_encode`` catches the
custom_vjp TypeError under a jvp trace and falls back to the
identical-math jnp path, so jacfwd/jvp work on default settings
(tests/test_grid.py::TestForwardMode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode

# Updates processed per grid step; SMEM windows (idx: 4·TILE bytes,
# grads: 4·TILE·F bytes, double-buffered) stay well under the 1 MB SMEM.
_TILE = 16384


def _tile_for(f: int) -> int:
    """Scale the SMEM tile down with F so the double-buffered gradient
    window (2·4·TILE·F bytes) stays within the SMEM budget at F=4/8."""
    return _TILE * 2 // max(f, 2)
_UNROLL = 16
# Up to two independent VMEM accumulators, summed at the end: the
# serial read-modify-write dependency chain on ONE accumulator is the
# bottleneck (~11.6 ns/row); alternating updates between two buffers
# pipelines the VMEM latency.  Determinism is preserved — the split and
# both add orders are fixed by program order.  Large tables (BTF-sized
# 4-D grids) fall back to one accumulator, then to XLA scatter, to stay
# inside the 128 MB VMEM.
_N_ACC = 2
_LANES = 128
# The chip has 128 MB VMEM; leave headroom for stream buffers and the
# pipeline.  The scoped (stack) limit defaults to 16 MB, so kernels
# sized beyond that must raise vmem_limit_bytes explicitly.
_VMEM_BUDGET = 110 * 1024 * 1024


def _pick_n_acc(rows: int) -> int:
    """Accumulators that fit VMEM; 0 means use the XLA scatter path."""
    table_bytes = rows * _LANES * 4
    for n in range(_N_ACC, 0, -1):
        if table_bytes * (n + 1) <= _VMEM_BUDGET:   # accs + output block
            return n
    return 0


def max_group_rows(f: int, paired: bool, n_acc: int = _N_ACC) -> int:
    """Largest TABLE row count a single serial-kernel call can keep
    VMEM-resident with ``n_acc`` accumulators (+ the output block).

    Callers scattering into tables beyond this (BTF-scale 4-D grids:
    15 levels x 2^19 rows = 62 MB packed) must partition the levels
    into groups at or under it and invoke the kernel per group with
    group-local indices — otherwise the impl's own ``_pick_n_acc``
    check silently routes the WHOLE scatter to XLA's serialized
    read-modify-write (~68 ns/row; measured as the 1256 ms/step BTF
    backward of round 4)."""
    packed_max = _VMEM_BUDGET // (_LANES * 4) // (n_acc + 1)
    rows = packed_max * _LANES // max(f, 1)
    if paired:
        rows //= 2  # slot accumulator is a double view of the table
    # Keep the packed-layout alignment: group boundaries stay exact
    # when each group's flat extent is lane-aligned.
    return max(rows - rows % _LANES, 0)


def _compiler_params(rows: int, n_acc: int):
    need = rows * _LANES * 4 * (n_acc + 1) + 8 * 1024 * 1024
    if need <= 16 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need, 128 * 1024 * 1024))


def _packed_rows(n_rows: int, f: int) -> int:
    return pl.cdiv(n_rows * f, _LANES)


def _scatter_kernel(f: int, idx_ref, g_ref, out_ref, *acc_refs):
    """Serial scatter-add of (idx, g[F]) updates into the packed table.

    The accumulators live in VMEM across all grid steps (revisited
    output block); updates stream through SMEM.  TPU grid execution is
    sequential, so `+=` is exact and deterministic.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for acc in acc_refs:
            acc[...] = jnp.zeros_like(acc)

    per_row = _LANES // f
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            r = idx_ref[i]
            row = r // per_row
            lane0 = (r % per_row) * f
            add = jnp.where(lanes == lane0, g_ref[f * i], 0.0)
            for k in range(1, f):
                add = add + jnp.where(lanes == lane0 + k, g_ref[f * i + k], 0.0)
            acc_refs[u % len(acc_refs)][pl.ds(row, 1), :] += add
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0] // _UNROLL, body, 0)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        total = acc_refs[0][...]
        for acc in acc_refs[1:]:
            total = total + acc[...]
        out_ref[...] = total


def _scatter_add_packed(idx: jax.Array, g: jax.Array, n_rows: int,
                        f: int) -> jax.Array:
    """(M,) int32 idx + (M, F) f32 grads -> (n_rows, F) f32 table grads."""
    m = idx.shape[0]
    tile = _tile_for(f)
    pm = pl.cdiv(max(m, 1), tile) * tile
    rows = _packed_rows(n_rows, f)
    n_acc = _pick_n_acc(rows)
    if n_acc == 0 or _LANES % f != 0:
        # Table too large for VMEM residency, or F doesn't divide the
        # lane count (the packed layout assumes it; the reference
        # statically forbids such F too, grid.h:1186-1196): XLA scatter
        # (also deterministic, ~10x slower per row).
        out = jnp.zeros((n_rows, f), jnp.float32)
        out = out.at[idx].add(g.astype(jnp.float32))
        return out.reshape(-1)
    if pm != m:
        # Padding scatters 0.0 into row 0 — harmless.
        idx = jnp.pad(idx, (0, pm - m))
        g = jnp.pad(g, ((0, pm - m), (0, 0)))

    kernel = functools.partial(_scatter_kernel, f)
    packed = pl.pallas_call(
        kernel,
        grid=(pm // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile * f,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, _LANES), jnp.float32)
                        for _ in range(n_acc)],
        compiler_params=_compiler_params(rows, n_acc),
        interpret=interpret_mode(),
        name="serial_scatter_packed",
    )(idx.astype(jnp.int32), g.astype(jnp.float32).reshape(-1))
    return packed.reshape(-1)[: n_rows * f]  # FLAT (n_rows·f,)


def _scatter_cols_kernel(f: int, idx_ref, *rest):
    """Like _scatter_kernel but with F separate flat gradient streams —
    callers produce per-feature (M,) arrays (dense 1-D layout) instead
    of an (M, F) matrix whose minor dim would be lane-padded."""
    g_refs = rest[:f]
    out_ref = rest[f]
    acc_refs = rest[f + 1:]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for acc in acc_refs:
            acc[...] = jnp.zeros_like(acc)

    per_row = _LANES // f
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            r = idx_ref[i]
            row = r // per_row
            lane0 = (r % per_row) * f
            add = jnp.where(lanes == lane0, g_refs[0][i], 0.0)
            for k in range(1, f):
                add = add + jnp.where(lanes == lane0 + k, g_refs[k][i], 0.0)
            acc_refs[u % len(acc_refs)][pl.ds(row, 1), :] += add
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0] // _UNROLL, body, 0)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        total = acc_refs[0][...]
        for acc in acc_refs[1:]:
            total = total + acc[...]
        out_ref[...] = total


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_add_cols(idx: jax.Array, gs: Tuple[jax.Array, ...],
                     n_rows: int) -> jax.Array:
    """Deterministic scatter-add with per-feature flat gradient streams.

    ``gs`` is a tuple of F (M,) f32 arrays (feature f of update i is
    gs[f][i]); returns the FLAT (n_rows·F,) gradient table.
    """
    return _scatter_add_cols_impl(idx, gs, n_rows)


def _scatter_add_cols_impl(idx, gs, n_rows):
    f = len(gs)
    m = idx.shape[0]
    tile = _tile_for(f)
    rows = _packed_rows(n_rows, f)
    n_acc = _pick_n_acc(rows)
    if n_acc == 0 or _LANES % f != 0:
        out = jnp.zeros((n_rows, f), jnp.float32)
        out = out.at[idx].add(
            jnp.stack([g.astype(jnp.float32) for g in gs], axis=-1))
        return out.reshape(-1)
    pm = pl.cdiv(max(m, 1), tile) * tile
    if pm != m:
        idx = jnp.pad(idx, (0, pm - m))
        gs = tuple(jnp.pad(g, (0, pm - m)) for g in gs)

    kernel = functools.partial(_scatter_cols_kernel, f)
    packed = pl.pallas_call(
        kernel,
        grid=(pm // tile,),
        in_specs=[pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * (1 + f),
        out_specs=pl.BlockSpec((rows, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, _LANES), jnp.float32)
                        for _ in range(n_acc)],
        compiler_params=_compiler_params(rows, n_acc),
        interpret=interpret_mode(),
        name="serial_scatter_cols",
    )(idx.astype(jnp.int32), *[g.astype(jnp.float32) for g in gs])
    return packed.reshape(-1)[: n_rows * f]


def _scatter_cols_fwd(idx, gs, n_rows):
    return scatter_add_cols(idx, gs, n_rows), (idx, len(gs))


def _scatter_cols_bwd(n_rows, res, dflat):
    idx, f = res
    # dgs[f][i] = dflat[idx[i]·F + f] — F dense scalar gathers.
    dgs = tuple(jnp.take(dflat, idx * f + k) for k in range(f))
    return None, dgs


scatter_add_cols.defvjp(_scatter_cols_fwd, _scatter_cols_bwd)


# ---------------------------------------------------------------------------
# Differentiable linear pair: fast_take <-> scatter_add_rows.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_add_rows(idx: jax.Array, g: jax.Array, n_rows: int) -> jax.Array:
    """Deterministic ``zeros((n_rows, F)).at[idx].add(g)`` at ~19 ns/row.

    F = g.shape[1] must be a power of two ≤ 128.
    """
    f = g.shape[1]
    return _scatter_add_packed(idx, g, n_rows, f).reshape(n_rows, f)


def _scatter_fwd(idx, g, n_rows):
    return scatter_add_rows(idx, g, n_rows), idx


def _scatter_bwd(n_rows, idx, dtable):
    # d/dg (scatter_add)ᵀ = gather at idx; idx is integer (no tangent).
    del n_rows
    return None, fast_take(dtable, idx)


scatter_add_rows.defvjp(_scatter_fwd, _scatter_bwd)


@jax.custom_vjp
def fast_take(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` whose transpose is the Pallas scatter-add.

    The primal IS XLA's gather (already issue-bound at its floor);
    only the backward is overridden, replacing XLA's slow scatter.
    """
    return jnp.take(table, idx, axis=0)


def _take_fwd(table, idx):
    return jnp.take(table, idx, axis=0), (idx, table.shape[0])


def _take_bwd(res, dy):
    idx, n_rows = res
    return scatter_add_rows(idx, dy, n_rows), None


fast_take.defvjp(_take_fwd, _take_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fast_take_flat(flat_table: jax.Array, idx: jax.Array, f: int) -> jax.Array:
    """Gather F-feature rows from a FLAT ``(n_rows·F,)`` table.

    Flat storage keeps the table (and its optimizer state) in compact
    1-D layout — a skinny ``(N, F<128)`` array is lane-padded 128/F× by
    the TPU tiling, multiplying every dense pass over it (Adam, casts)
    by the same factor.  The cotangent comes back flat from the packed
    Pallas scatter, so no relayout appears anywhere in the train step.
    """
    return jnp.take(flat_table.reshape(-1, f), idx, axis=0)


def _take_flat_fwd(flat_table, idx, f):
    n_rows = flat_table.shape[0] // f
    return jnp.take(flat_table.reshape(n_rows, f), idx, axis=0), (idx, n_rows)


def _take_flat_bwd(f, res, dy):
    idx, n_rows = res
    return scatter_add_rows_flat(idx, dy, n_rows, f), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def scatter_add_rows_flat(idx: jax.Array, g: jax.Array, n_rows: int,
                          f: int) -> jax.Array:
    """Like scatter_add_rows but returns the FLAT ``(n_rows·f,)`` table."""
    return _scatter_add_packed(idx, g, n_rows, f)


def _scatter_flat_fwd(idx, g, n_rows, f):
    return scatter_add_rows_flat(idx, g, n_rows, f), idx


def _scatter_flat_bwd(n_rows, f, idx, dflat):
    return None, fast_take_flat(dflat, idx, f)


scatter_add_rows_flat.defvjp(_scatter_flat_fwd, _scatter_flat_bwd)
fast_take_flat.defvjp(_take_flat_fwd, _take_flat_bwd)


# ---------------------------------------------------------------------------
# Fused weighted scatter: g = w · dy formed INSIDE the kernel.
#
# The grid encoding's table gradient is Σ over updates of
# w[s,b] · dL/dy[level(s)·F+k, b] scattered into corner rows.  Building
# those products in XLA materializes F dense (M,) gradient streams
# (~270 MB/step at the flagship batch) that the kernel then re-reads;
# the CUDA reference instead forms the product in-register inside
# kernel_grid_backward (grid.h:214-320).  This kernel is the TPU
# equivalent: the corner weights stream through SMEM next to the
# indices, the SoA cotangent (L·F, B) streams through SMEM a
# (F, TILE) block at a time, and the multiply happens on the scalar
# unit right before the masked VMEM accumulate.
# ---------------------------------------------------------------------------


def _weighted_kernel(f, idx_ref, w_ref, *rest):
    d_refs = rest[:f]          # per-feature (tile,) slices of flat dcols
    out_ref = rest[f]
    acc_refs = rest[f + 1:]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for acc in acc_refs:
            acc[...] = jnp.zeros_like(acc)

    per_row = _LANES // f
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            r = idx_ref[i]
            w = w_ref[i]
            row = r // per_row
            lane0 = (r % per_row) * f
            add = jnp.where(lanes == lane0, w * d_refs[0][i], 0.0)
            for k in range(1, f):
                add = add + jnp.where(lanes == lane0 + k,
                                      w * d_refs[k][i], 0.0)
            acc_refs[u % len(acc_refs)][pl.ds(row, 1), :] += add
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0] // _UNROLL, body, 0)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        total = acc_refs[0][...]
        for acc in acc_refs[1:]:
            total = total + acc[...]
        out_ref[...] = total


def _weighted_tile(b: int, f: int) -> int:
    """Largest SMEM tile that divides the per-segment batch b (the
    dcols stream maps need tiles that never straddle a level/corner
    segment boundary).  0 = no usable tile → caller falls back.

    Floor is 1024: Mosaic requires 1-D int32 SMEM blocks to be
    T(1024)-aligned on real TPU — 256/512 tiles fail to compile with an
    XLA/Mosaic layout mismatch (tiles are powers of two, so >=1024 also
    guarantees the alignment)."""
    p2 = b & (-b)  # largest power-of-two divisor
    tile = min(_tile_for(f), p2)
    return tile if tile >= 1024 else 0


def _scatter_weighted_xla(idx, w, dcols, n_rows, f, c):
    lf, b = dcols.shape
    n_lvl = lf // f
    # (L, C, B, F) product, flattened to the update stream's order.
    g = (w.reshape(n_lvl, c, b, 1)
         * dcols.reshape(n_lvl, 1, f, b).transpose(0, 1, 3, 2))
    out = jnp.zeros((n_rows, f), jnp.float32)
    return out.at[idx].add(g.reshape(-1, f).astype(jnp.float32)).reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def scatter_add_weighted(idx: jax.Array, w: jax.Array, dcols: jax.Array,
                         n_rows: int, f: int, c: int) -> jax.Array:
    """Deterministic scatter of ``w·dcols`` products into a flat table.

    Args:
      idx:   (M,) int32 table row per update, M = L·C·B, level-major
             then corner-major then batch (segment s = l·C + c).
      w:     (M,) f32 corner interpolation weights, same order.
      dcols: (L·F, B) f32 SoA output cotangent (level-major rows).
      n_rows, f, c: static table rows, features/level, corners.

    Returns the FLAT (n_rows·f,) f32 gradient table where row
    ``idx[s·B+b]`` accumulates ``w[s·B+b] · dcols[(s//c)·F+k, b]`` in
    feature lane k — update order, hence determinism, fixed by the
    serial TPU grid.
    """
    return _scatter_weighted_impl(idx, w, dcols, n_rows, f, c)


def _scatter_weighted_impl(idx, w, dcols, n_rows, f, c):
    lf, b = dcols.shape
    m = idx.shape[0]
    rows = _packed_rows(n_rows, f)
    n_acc = _pick_n_acc(rows)
    tile = _weighted_tile(b, f)
    if n_acc == 0 or _LANES % f != 0 or tile == 0:
        return _scatter_weighted_xla(idx, w, dcols, n_rows, f, c)

    bt = b // tile  # dcols blocks per (level, corner) segment
    kernel = functools.partial(_weighted_kernel, f)
    # The SoA cotangent streams through SMEM as F per-feature windows
    # into the SAME flat (L·F·B,) array: feature k of tile t starts at
    # element ((level·f + k)·B + batch_offset), i.e. 1-D block index
    # (level·f + k)·bt + batch_block.  1-D blocks sidestep the TPU's
    # 8×128 block-shape rule, and each window moves only the f·4
    # bytes/update actually consumed.  Index maps stay plain lax
    # div/rem — jnp's Python operators carry sign-correction selects.
    import numpy as _np

    def _dmap(k):
        def m_(t):
            lvl = jax.lax.div(t, _np.int32(c * bt))
            return ((lvl * f + k) * bt + jax.lax.rem(t, _np.int32(bt)),)

        return m_

    flat_d = dcols.astype(jnp.float32).reshape(-1)
    packed = pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec((tile,), _dmap(k), memory_space=pltpu.SMEM)
             for k in range(f)],
        out_specs=pl.BlockSpec((rows, _LANES), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, _LANES), jnp.float32)
                        for _ in range(n_acc)],
        compiler_params=_compiler_params(rows, n_acc),
        interpret=interpret_mode(),
        name="serial_scatter_weighted",
    )(idx.astype(jnp.int32), w.astype(jnp.float32),
      *([flat_d] * f))
    return packed.reshape(-1)[: n_rows * f]


def _scatter_weighted_fwd(idx, w, dcols, n_rows, f, c):
    return (scatter_add_weighted(idx, w, dcols, n_rows, f, c),
            (idx, w, dcols))


def _scatter_weighted_bwd(n_rows, f, c, res, ct):
    """VJP of the bilinear (w, dcols) ↦ scatter(w·dcols) map.

    Only reached under second-order differentiation of the grid
    encoding (eikonal/SDF losses); first-order training never comes
    here.  The gather uses fast_take_flat so a further derivative stays
    on the Pallas pair.
    """
    idx, w, dcols = res
    lf, b = dcols.shape
    n_lvl = lf // f
    g = fast_take_flat(ct, idx, f).astype(jnp.float32)  # (M, F)
    gr = g.reshape(n_lvl, c, b, f)
    dcr = dcols.reshape(n_lvl, f, b).astype(jnp.float32)
    # dw[l,c,b] = Σ_k dcols[l,k,b] · g[l,c,b,k]
    dw = jnp.zeros((n_lvl, c, b), jnp.float32)
    for k in range(f):
        dw = dw + gr[..., k] * dcr[:, None, k, :]
    # d_dcols[l,k,b] = Σ_c w[l,c,b] · g[l,c,b,k]
    wr = w.reshape(n_lvl, c, b).astype(jnp.float32)
    ddc = jnp.stack([jnp.sum(wr * gr[..., k], axis=1) for k in range(f)],
                    axis=1).reshape(lf, b)
    return None, dw.reshape(-1), ddc


scatter_add_weighted.defvjp(_scatter_weighted_fwd, _scatter_weighted_bwd)


# ---------------------------------------------------------------------------
# Pair-packed weighted scatter: ONE serial-loop iteration commits BOTH
# interpolation corners along dim 0.
#
# The serial scatter is scalar-ISSUE bound (~16 instruction slots per
# update; extra accumulators measured to change nothing), so the only
# lever is fewer/denser updates.  When the two dim-0 corners of a
# sample land on ADJACENT table rows — always true for dense/tiled
# indexing (stride 1), and true for hash levels under the TPU-native
# HashType.CoherentAdd — their 2F feature lanes are contiguous in the
# packed (rows, 128) layout, so one (2, 128) read-modify-write covers
# both corners: ~19 slots per PAIR instead of ~32 for two updates.
#
# The rare wrap-around pair (even corner on a level's last entry, odd
# corner wrapping to its first) is handled OUTSIDE the kernel: the
# caller zeroes the odd weight and adds the wrapped contribution via a
# dense per-level reduction (see grid_ops._grid_interpolate_vjp_bwd).
# ---------------------------------------------------------------------------


def _pair_kernel(f, idx_ref, we_ref, wo_ref, *rest):
    """Serial pair scatter into the SLOT (double-view) accumulator.

    idx_ref holds SLOT indices: slot j of region A covers table entries
    (2j, 2j+1), region B entries (2j+1, 2j+2); every adjacent pair maps
    to exactly one slot = 2F contiguous, 2F-ALIGNED lanes, so each
    iteration is a single aligned (1, 128) read-modify-write and no
    pair ever straddles a packed row.  The caller merges A + shift(B)
    back to the flat table with one dense XLA add.
    """
    d_refs = rest[:f]
    out_ref = rest[f]
    acc_refs = rest[f + 1:]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for acc in acc_refs:
            acc[...] = jnp.zeros_like(acc)

    spr = _LANES // (2 * f)  # slots per packed row
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    # Loop-invariant per-feature lane masks (slot starts are 2F-aligned,
    # so the in-slot feature index is lane % f; hoisted by the compiler).
    fmasks = [(lanes % f) == k for k in range(f)]

    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            s = idx_ref[i]
            w_e = we_ref[i]
            w_o = wo_ref[i]
            row = s // spr
            g0 = (s % spr) * (2 * f)
            dpat = jnp.where(fmasks[0], d_refs[0][i], 0.0)
            for k in range(1, f):
                dpat = jnp.where(fmasks[k], d_refs[k][i], dpat)
            # Unsigned window trick: t = lanes - g0; one compare covers
            # the in-slot test (negatives wrap to huge uint32).
            t = (lanes - g0).astype(jnp.uint32)
            wpat = jnp.where(t < f, w_e, w_o)
            add = jnp.where(t < 2 * f, dpat * wpat, 0.0)
            acc_refs[u % len(acc_refs)][pl.ds(row, 1), :] += add
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0] // _UNROLL, body, 0)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        total = acc_refs[0][...]
        for acc in acc_refs[1:]:
            total = total + acc[...]
        out_ref[...] = total


def _scatter_pairs_xla(idx_e, w_e, w_o, dcols, n_rows, f, cp):
    lf, b = dcols.shape
    n_lvl = lf // f
    d = dcols.reshape(n_lvl, 1, f, b).transpose(0, 1, 3, 2)  # (L,1,B,F)
    g_e = (w_e.reshape(n_lvl, cp, b, 1) * d).reshape(-1, f)
    g_o = (w_o.reshape(n_lvl, cp, b, 1) * d).reshape(-1, f)
    out = jnp.zeros((n_rows, f), jnp.float32)
    out = out.at[idx_e].add(g_e.astype(jnp.float32))
    out = out.at[jnp.minimum(idx_e + 1, n_rows - 1)].add(
        g_o.astype(jnp.float32))
    return out.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def scatter_add_weighted_pairs(idx_e, w_e, w_o, dcols, n_rows: int, f: int,
                               cp: int):
    """Deterministic paired scatter of both dim-0 corners.

    idx_e: (Mp,) int32 EVEN-corner rows (odd corner is row+1; wrapped
           pairs must arrive with w_o == 0).
    w_e/w_o: (Mp,) f32 corner weights, level-major, even-corner-major.
    dcols: (Lp·F, B) f32 SoA cotangent of the PAIRED levels only.
    cp: corner pairs per level (2^(D-1)).
    Returns the FLAT (n_rows·f,) gradient table.
    """
    return _scatter_pairs_impl(idx_e, w_e, w_o, dcols, n_rows, f, cp)


def _scatter_pairs_impl(idx_e, w_e, w_o, dcols, n_rows, f, cp):
    lf, b = dcols.shape
    m = idx_e.shape[0]
    # Slot accumulator is DOUBLE the table (regions A and B).
    h_a = n_rows // 2
    rows2 = _packed_rows(2 * h_a * 2, f)  # = ceil(n_rows*2F/128)
    n_acc = _pick_n_acc(rows2)
    tile = _weighted_tile(b, f)
    if (n_acc == 0 or _LANES % (2 * f) != 0 or tile == 0
            or n_rows % 2 != 0):
        return _scatter_pairs_xla(idx_e, w_e, w_o, dcols, n_rows, f, cp)

    # Slot index: even rows land in region A (slot r/2 holds entries
    # (r, r+1)), odd rows in region B (slot H+(r-1)/2 holds (r, r+1)).
    slot = (idx_e >> 1) + (idx_e & 1) * jnp.int32(h_a)

    bt = b // tile
    kernel = functools.partial(_pair_kernel, f)
    import numpy as _np

    def _dmap(k):
        def m_(t):
            lvl = jax.lax.div(t, _np.int32(cp * bt))
            return ((lvl * f + k) * bt + jax.lax.rem(t, _np.int32(bt)),)

        return m_

    flat_d = dcols.astype(jnp.float32).reshape(-1)
    packed = pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec((tile,), _dmap(k), memory_space=pltpu.SMEM)
             for k in range(f)],
        out_specs=pl.BlockSpec((rows2, _LANES), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows2, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows2, _LANES), jnp.float32)
                        for _ in range(n_acc)],
        compiler_params=_compiler_params(rows2, n_acc),
        interpret=interpret_mode(),
        name="serial_scatter_pairs",
    )(slot.astype(jnp.int32), w_e.astype(jnp.float32),
      w_o.astype(jnp.float32), *([flat_d] * f))
    # Merge the double-view regions back to the flat table: region A is
    # already flat-ordered; region B is the same entries shifted one
    # table row (F lanes).  The truncated tail of B holds only
    # wrap-zeroed odd halves, so dropping it is exact.
    arr = packed.reshape(-1)
    n_flat = n_rows * f
    a_flat = arr[:n_flat]
    b_flat = arr[h_a * 2 * f: h_a * 2 * f + n_flat]
    return a_flat + jnp.pad(b_flat[: n_flat - f], (f, 0))


def _scatter_pairs_fwd(idx_e, w_e, w_o, dcols, n_rows, f, cp):
    return (scatter_add_weighted_pairs(idx_e, w_e, w_o, dcols, n_rows, f,
                                       cp),
            (idx_e, w_e, w_o, dcols))


def _scatter_pairs_bwd(n_rows, f, cp, res, ct):
    idx_e, w_e, w_o, dcols = res
    lf, b = dcols.shape
    n_lvl = lf // f
    g_e = fast_take_flat(ct, idx_e, f).astype(jnp.float32)
    g_o = fast_take_flat(ct, jnp.minimum(idx_e + 1, n_rows - 1),
                         f).astype(jnp.float32)
    dcr = dcols.reshape(n_lvl, f, b).astype(jnp.float32)
    ger = g_e.reshape(n_lvl, cp, b, f)
    gor = g_o.reshape(n_lvl, cp, b, f)
    dw_e = jnp.zeros((n_lvl, cp, b), jnp.float32)
    dw_o = jnp.zeros((n_lvl, cp, b), jnp.float32)
    for k in range(f):
        dw_e = dw_e + ger[..., k] * dcr[:, None, k, :]
        dw_o = dw_o + gor[..., k] * dcr[:, None, k, :]
    wer = w_e.reshape(n_lvl, cp, b).astype(jnp.float32)
    wor = w_o.reshape(n_lvl, cp, b).astype(jnp.float32)
    ddc = jnp.stack(
        [jnp.sum(wer * ger[..., k] + wor * gor[..., k], axis=1)
         for k in range(f)], axis=1).reshape(lf, b)
    return None, dw_e.reshape(-1), dw_o.reshape(-1), ddc


scatter_add_weighted_pairs.defvjp(_scatter_pairs_fwd, _scatter_pairs_bwd)
