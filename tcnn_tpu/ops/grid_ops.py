"""Multiresolution grid encoding — index math and jnp compute path.

TPU-native rebuild of the reference's grid encoding
(encodings/grid.h:48-650, common_device.h:631-718).  The CUDA version
hand-writes forward gather, backward atomic scatter-add, and three
second-order kernels; here the forward pass is expressed as pure jnp
(gather + n-linear interpolation) and ALL derivatives come from XLA's
autodiff:

  * backward w.r.t. the table is the transpose of gather — a
    deterministic scatter-add (XLA sorts/serializes on TPU), which is a
    *stronger* guarantee than the reference's nondeterministic
    atomicAdd (grid.h:214-320 tolerates races, test_grid_bwdbwd.py:137
    sets nondet_tol).
  * backward w.r.t. the input differentiates the interpolation weights
    (dy/dx, grid.h:322-349).
  * second order (grid.h:351-623's three Hessian blocks) falls out of
    jvp-of-vjp composition and is complete, including the blocks the
    reference leaves unimplemented.

Level geometry matches the reference exactly:
  scale(l)    = 2^(l·log2(per_level_scale)) · base_resolution − 1
  resolution  = ceil(scale) + 1            (common_device.h:709-718)
  pos         = x·scale + 0.5; cell = floor(pos); f = pos − cell
                                           (pos_fract, common_device.h:826-868)
  params/level = min(resolution^D rounded up to 8, caps per grid type)
                                           (grid.h:692-718)
  index: dense strided while stride ≤ table size, else spatial hash,
  finally % table size                     (grid_index, common_device.h:690-707)
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..common import (
    COHERENT_PRIME_HASH_FACTORS,
    GridType,
    HashType,
    InterpolationType,
    MAX_N_GRID_LEVELS,
    PRIME_HASH_FACTORS,
    REVERSED_PRIME_HASH_FACTORS,
    next_multiple,
)

_MAX_PARAMS = 2 ** 31  # uint32_max/2 cap (grid.h:696)


def hash_factors(hash_type: HashType, n_dims: int) -> Tuple[int, ...]:
    """LCG hash factors (common_device.h:648-661).  HashType.RNG has no
    factors — call sites route it to pcg32_hash.rng_hash instead."""
    if hash_type == HashType.PRIME:
        f = PRIME_HASH_FACTORS
    elif hash_type == HashType.COHERENT_PRIME:
        f = COHERENT_PRIME_HASH_FACTORS
    elif hash_type == HashType.REVERSED_PRIME:
        f = REVERSED_PRIME_HASH_FACTORS
    else:
        raise ValueError(f"hash type {hash_type} has no LCG factors")
    if n_dims > len(f):
        raise ValueError(f"grid hash supports at most {len(f)} dims")
    return f[:n_dims]


def _hash_coords(hash_type: HashType, coords: Sequence[jax.Array]) -> jax.Array:
    """Spatial hash of per-dim uint32 coordinate arrays
    (grid_hash, common_device.h:678-691)."""
    if hash_type == HashType.RNG:
        from . import pcg32_hash

        return pcg32_hash.rng_hash(list(coords))
    if hash_type == HashType.COHERENT_ADD:
        # dim 0 ADDED after the XOR: hash(c0+1, rest) == hash(c0, rest)+1
        # (mod 2^32), so corner pairs along dim 0 are table-adjacent —
        # the property the paired grid kernels exploit.
        factors = hash_factors(HashType.COHERENT_PRIME, len(coords))
        h = jnp.zeros_like(coords[0])
        for d in range(1, len(coords)):
            h = h ^ (coords[d] * jnp.uint32(factors[d]))
        return h + coords[0]
    factors = hash_factors(hash_type, len(coords))
    h = coords[0] * jnp.uint32(factors[0])
    for d in range(1, len(coords)):
        h = h ^ (coords[d] * jnp.uint32(factors[d]))
    return h


def grid_scale(level: int, log2_per_level_scale: float, base_resolution: int) -> float:
    """float32 math exactly as the reference's host/device grid_scale
    (common_device.h:709-714: ``exp2f(level·log2_pls)·base − 1.0f``).
    f64 here could land on the other side of an integer for
    near-integer scales, shifting ceil() → resolution → the whole
    level geometry vs reference-trained checkpoints."""
    s = np.float32(np.float32(level) * np.float32(log2_per_level_scale))
    return float(np.exp2(s) * np.float32(base_resolution) - np.float32(1.0))


def grid_resolution(scale: float) -> int:
    return int(np.ceil(np.float32(scale))) + 1


@dataclasses.dataclass(frozen=True)
class LevelSpec:
    """Static (trace-time) constants of one grid level."""
    scale: float
    resolution: int
    offset: int          # offset into the table, in feature-vector entries
    size: int            # number of feature-vector entries in this level
    use_hash: bool
    strides: Tuple[int, ...]       # per-dim stride (uint32 wrapped)
    stride_mask: Tuple[bool, ...]  # dim participates in dense index accumulation


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static description of a full multiresolution grid."""
    n_dims: int
    n_levels: int
    n_features_per_level: int
    grid_type: GridType
    hash_type: HashType
    interpolation: InterpolationType
    levels: Tuple[LevelSpec, ...]
    n_entries: int   # total feature-vector entries (table rows)
    # Stochastic interpolation (grid.h:284-299): the backward routes
    # each (sample, level)'s FULL output gradient to ONE corner chosen
    # with probability equal to its interpolation weight, instead of
    # weighting.  Deterministic here: the per-(sample, level) uniforms
    # come from a fixed counter-based seed, exactly like the
    # reference's random_val(1337, i + level·num_elements).
    stochastic_interpolation: bool = False

    @property
    def n_params(self) -> int:
        return self.n_entries * self.n_features_per_level

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level


def make_grid_spec(
    n_dims: int,
    n_levels: int,
    n_features_per_level: int,
    log2_hashmap_size: int,
    base_resolution: int,
    per_level_scale: float,
    grid_type: GridType = GridType.HASH,
    hash_type: HashType = HashType.COHERENT_PRIME,
    interpolation: InterpolationType = InterpolationType.LINEAR,
    stochastic_interpolation: bool = False,
) -> GridSpec:
    """Build the level/offset table (grid.h:686-731)."""
    if n_levels > MAX_N_GRID_LEVELS:
        raise ValueError(f"n_levels={n_levels} exceeds {MAX_N_GRID_LEVELS}")
    # f32 like the reference's std::log2(float) (grid.h:694, :784).
    log2_pls = float(np.log2(np.float32(per_level_scale)))
    levels: List[LevelSpec] = []
    offset = 0
    for l in range(n_levels):
        scale = grid_scale(l, log2_pls, base_resolution)
        res = grid_resolution(scale)

        dense = res ** n_dims
        params_in_level = min(dense, _MAX_PARAMS)
        params_in_level = next_multiple(params_in_level, 8)
        if grid_type == GridType.TILED:
            params_in_level = min(params_in_level, base_resolution ** n_dims)
        elif grid_type == GridType.HASH:
            params_in_level = min(params_in_level, 1 << log2_hashmap_size)

        # Dense stride accumulation with the reference's early-exit
        # (common_device.h:692-697): dims stop contributing once the
        # running stride exceeds the table size.  uint32 wraparound kept.
        strides = []
        mask = []
        stride = 1
        for _ in range(n_dims):
            participates = stride <= params_in_level
            strides.append(stride % (2 ** 32))
            mask.append(participates)
            if participates:
                stride = (stride * res) % (2 ** 32)
        use_hash = grid_type == GridType.HASH and params_in_level < stride
        levels.append(LevelSpec(
            scale=scale, resolution=res, offset=offset, size=params_in_level,
            use_hash=use_hash, strides=tuple(strides), stride_mask=tuple(mask)))
        offset += params_in_level

    return GridSpec(
        n_dims=n_dims, n_levels=n_levels,
        n_features_per_level=n_features_per_level,
        grid_type=grid_type, hash_type=hash_type, interpolation=interpolation,
        levels=tuple(levels), n_entries=offset,
        stochastic_interpolation=stochastic_interpolation)


def _corner_offsets(n_dims: int) -> np.ndarray:
    """(2^D, D) array of 0/1 corner offsets, corner-major bit order
    matching the reference's ``idx & (1<<dim)`` convention (grid.h:125)."""
    n = 1 << n_dims
    out = np.zeros((n, n_dims), dtype=np.int64)
    for c in range(n):
        for d in range(n_dims):
            out[c, d] = (c >> d) & 1
    return out


def level_indices(spec: GridSpec, level: LevelSpec, pos_grid: jax.Array) -> jax.Array:
    """Table row indices for integer grid coords.

    pos_grid: (..., D) uint32 → (...,) int32 row index *within the whole
    table* (level offset included).
    """
    if level.use_hash:
        idx = _hash_coords(spec.hash_type,
                           [pos_grid[..., d] for d in range(spec.n_dims)])
    else:
        idx = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(spec.n_dims):
            if level.stride_mask[d]:
                idx = idx + pos_grid[..., d] * jnp.uint32(level.strides[d])
    idx = idx % jnp.uint32(level.size)
    return (idx + jnp.uint32(level.offset)).astype(jnp.int32)


def _interp_weight(f: jax.Array, interp: InterpolationType) -> jax.Array:
    """Map the cell-relative fraction to an interpolation weight.

    Linear: identity.  Smoothstep: 3f²−2f³ (C¹, so second-order input
    grads exist; common_device.h:801-811).  Nearest: a 0/1 step — its
    autodiff derivative is exactly the reference's zero dy/dx.
    """
    if interp == InterpolationType.LINEAR:
        return f
    if interp == InterpolationType.SMOOTHSTEP:
        return f * f * (3.0 - 2.0 * f)
    if interp == InterpolationType.NEAREST:
        return (f > 0.5).astype(f.dtype)
    raise ValueError(f"bad interpolation {interp}")


# -- model-parallel (row-sharded) tables --------------------------------
#
# The reference is strictly single-GPU, so its hash tables are bounded
# by one device's memory.  TPU-natively we row-shard each grid table
# over a mesh axis in a BLOCK-CYCLIC layout: every LEVEL splits into n
# equal row blocks, and shard i holds block i of every level
# (:func:`block_cyclic_perm` maps the canonical flat layout to this
# one).  The per-shard geometry is therefore STATIC — a shard is just a
# smaller grid with level sizes size/n — so the production kernels
# (MXU one-hot matmul, serial Pallas scatter) run per shard unchanged;
# out-of-shard corners get zero weight and contribute exactly nothing.
# Each table row is owned by exactly one shard, so the psum_scatter
# over the axis reassembles the exact full-table interpolation, and
# autodiff lands each row's gradient ONLY on the owning shard (the
# table grads are sharded state — no collective of their own).
_TABLE_SHARDING: contextvars.ContextVar[Optional[Tuple[str, int]]] = \
    contextvars.ContextVar("tcnn_table_sharding", default=None)


def shardable_levels(spec: GridSpec, n_shards: int) -> bool:
    """True iff every level's row count divides ``n_shards`` ways.

    Hash/dense levels are 8-row aligned (grid.h:698), so shard counts
    of 2/4/8 qualify; TILED grids cap levels at base_resolution^D
    AFTER the alignment (grid.h:702) and may therefore be unshardable
    (e.g. base 3, 2-D → 9-row levels)."""
    return all(lv.size % n_shards == 0 for lv in spec.levels)


def block_cyclic_perm(spec: GridSpec, n_shards: int) -> np.ndarray:
    """Flat-element permutation canonical → block-cyclic sharded layout.

    ``new_flat = old_flat[perm]``; shard i of the NamedSharding over the
    permuted array then holds rows [i·size/n, (i+1)·size/n) of every
    level, concatenated in level order — the layout
    :func:`sharded_tables` compute expects.  Apply ``np.argsort(perm)``
    to invert (for checkpointing/export in the canonical layout).
    """
    if not shardable_levels(spec, n_shards):
        raise ValueError(
            f"grid not block-cyclic shardable {n_shards} ways: level "
            f"sizes {[lv.size for lv in spec.levels]}")
    rows = np.concatenate([
        np.arange(lv.offset + m * (lv.size // n_shards),
                  lv.offset + (m + 1) * (lv.size // n_shards))
        for m in range(n_shards) for lv in spec.levels])
    f = spec.n_features_per_level
    return (rows[:, None] * f + np.arange(f)[None, :]).reshape(-1)


@contextlib.contextmanager
def sharded_tables(axis_name: str, n_shards: int):
    """Trace-time context: grid tables are row-sharded ``n_shards``-ways
    over mesh axis ``axis_name`` (use inside :func:`jax.shard_map`).

    Under the context, ``grid_encode`` expects (a) its table argument
    to be this rank's BLOCK-CYCLIC row shard (block ``i`` of every
    level — produce it with :func:`block_cyclic_perm`) and (b) its
    batch argument to be this rank's slice of the model group's batch:
    it all_gathers the batch, interpolates locally owned rows for all
    of it, and psum_scatters the partial features so every rank gets
    exactly its own output columns (downstream compute stays
    batch-sharded).

    Gradient convention: per-rank reverse mode sums every rank's LOCAL
    loss cotangents into the table shards (the all_gather transpose),
    i.e. table grads correspond to Σ_ranks loss_rank.  For grads of the
    group-MEAN loss divide the table-shard grads by ``n_shards`` —
    ``HybridParallel``'s step does this.
    """
    token = _TABLE_SHARDING.set((axis_name, int(n_shards)))
    try:
        yield
    finally:
        _TABLE_SHARDING.reset(token)


def _interpolate_sharded(spec: GridSpec, live, flat, idx, ws, fc,
                         axis_name: str, n_shards: int,
                         fast_scatter: bool):
    """Per-shard interpolation of a row-sharded table + reduce-scatter.

    ``flat`` is the LOCAL block-cyclic shard: rows
    [sid·S_l/n, (sid+1)·S_l/n) of EVERY level l, concatenated in level
    order (:func:`block_cyclic_perm`).  The shard is therefore itself a
    valid smaller grid — level sizes S_l/n, offsets O_l/n — with STATIC
    geometry identical on every rank, so the production kernel dispatch
    (:func:`_grid_interpolate`: MXU one-hot matmul / serial Pallas
    pairs) runs per shard unchanged; sharding even IMPROVES routing,
    since per-shard level sizes shrink n× toward the matmul MAC budget.

    ``idx``/``ws`` cover the whole model group's gathered batch
    (Bg = n_shards·B_local columns).  Out-of-shard corners get zero
    weight and a clipped (in-bounds, value-irrelevant) local index;
    each table row is owned by exactly one shard, so the
    ``psum_scatter`` over ``axis_name`` both sums the per-shard partial
    features exactly and hands every rank just ITS B_local output
    columns (the Megatron-sharded-embedding pattern: the MLP downstream
    runs batch-sharded over the model axis too).

    Pairing survives sharding: a shard-level block is a contiguous
    global row range, so dim-0-adjacent corner pairs stay adjacent
    except across block boundaries — and a boundary-straddling pair has
    exactly the shape of a level wrap (even corner on the block's last
    row, odd mass due on SOME block's first row), which the paired
    kernels' wrap machinery already handles: on the even corner's owner
    the odd weight is masked to zero (wrap fires vacuously), and on the
    odd corner's owner the even index is pinned to the shard-level's
    last row so the wrap correction lands the odd mass on the
    shard-level's first row — the exact owning row, both for block
    boundaries and for the true level wrap (idx % size → row 0, owned
    by shard 0).
    """
    F, C = fc[0], fc[1]
    if not shardable_levels(spec, n_shards):
        raise ValueError(
            f"sharded_tables({axis_name}, {n_shards}): level sizes "
            f"{[lv.size for lv in spec.levels]} do not all divide "
            f"{n_shards} ways (hash/dense levels are 8-row aligned, so "
            f"2/4/8 qualify; TILED levels are capped at base^D after "
            f"alignment and may not be)")
    rows_local = spec.n_entries // n_shards
    if flat.size != rows_local * F:
        raise ValueError(
            f"sharded_tables({axis_name}, {n_shards}): expected a local "
            f"table shard of {rows_local * F} params, got {flat.size} "
            f"(full table is {spec.n_params})")
    Bg = ws.shape[1]
    if Bg % n_shards:
        raise ValueError(
            f"sharded_tables: gathered batch {Bg} not divisible by "
            f"n_shards={n_shards}")
    levels = [spec.levels[li] for li in live]
    L = len(levels)

    def col3(vals):
        return jnp.asarray(np.asarray(vals, np.int32).reshape(-1, 1, 1))

    off_g = col3([lv.offset for lv in levels])           # global offsets
    size_g = col3([lv.size for lv in levels])
    size_s = col3([lv.size // n_shards for lv in levels])
    off_s = col3([lv.offset // n_shards for lv in levels])
    pair_ok = [(not lv.use_hash) or spec.hash_type == HashType.COHERENT_ADD
               for lv in levels]

    sid = jax.lax.axis_index(axis_name).astype(jnp.int32)
    idx3 = idx.reshape(L, C, Bg)
    r = idx3 - off_g                                     # level-local rows
    lo = sid * size_s
    in_shard = (r >= lo) & (r < lo + size_s)
    local = jnp.clip(r - lo, 0, size_s - 1) + off_s
    if any(pair_ok):
        # Even-corner wrap pinning (see docstring): where the even
        # corner is out-of-shard but its odd partner ((r+1) % S, the
        # universal pairing convention — idx rows carry `% size`) owns
        # THIS shard's block-first row, point the even index at the
        # shard-level's last row so the paired kernels' wrap correction
        # scatters/gathers the odd mass at the block-first row.  The
        # even weight is already masked to zero, and unpaired/matmul
        # paths are untouched by construction (w_e = 0 there too).
        pmask = jnp.asarray(np.asarray(pair_ok, np.bool_)
                            .reshape(-1, 1, 1))
        r_e = r[:, 0::2]
        r_o = jnp.where(r_e == size_g - 1, 0, r_e + 1)
        in_o = (r_o >= lo) & (r_o < lo + size_s)
        pin = pmask & ~in_shard[:, 0::2] & in_o
        local = local.at[:, 0::2].set(
            jnp.where(pin, off_s + size_s - 1, local[:, 0::2]))
    idx_l = local.reshape(L, C * Bg)
    ws_m = (ws.reshape(L, C, Bg)
            * in_shard.astype(ws.dtype)).reshape(L * C, Bg)

    shard_meta = tuple(
        (pair_ok[p], lv.size // n_shards, lv.offset // n_shards)
        for p, lv in enumerate(levels))
    if fast_scatter:
        try:
            cols_partial = _grid_interpolate(flat, idx_l, ws_m, ws_m,
                                             (F, C, shard_meta))
        except TypeError as e:  # forward-mode tracer (see grid_encode)
            if "custom_vjp" not in str(e):
                raise
            cols_partial = _interpolate_ref(flat, idx_l, ws_m, (F, C))
    else:
        cols_partial = _interpolate_ref(flat, idx_l, ws_m, (F, C))
    return jax.lax.psum_scatter(cols_partial, axis_name,
                                scatter_dimension=1, tiled=True)


def _default_fast_scatter() -> bool:
    """Pallas deterministic-scatter backward on real TPU; pure-XLA
    scatter on CPU (tests run the kernel in interpret mode anyway via
    TCNN_TPU_FORCE_FAST_SCATTER)."""
    if os.environ.get("TCNN_TPU_FORCE_FAST_SCATTER"):
        return True
    if os.environ.get("TCNN_TPU_DISABLE_PALLAS"):
        return False
    try:
        # Only actual TPU backends: the Pallas kernel is pltpu-specific
        # (a GPU backend must not try to lower it).
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pallas_backend_ok() -> bool:
    """Can the Pallas kernels execute here?  Real TPU lowers them;
    CPU runs them in interpret mode (tests).  Any other backend (GPU)
    must fall back to pure-XLA math even on paths that structurally
    need the custom VJP (stochastic interpolation, forced kernels) —
    pltpu kernels cannot lower there."""
    try:
        return jax.default_backend() in ("tpu", "cpu")
    except Exception:
        return False


def _const_col(values, dtype) -> jax.Array:
    """(L, 1) trace-time constant column from per-level scalars."""
    return jnp.asarray(np.asarray(values, dtype).reshape(-1, 1))


def _build_indices_weights(spec: GridSpec, x: jax.Array,
                           live: Sequence[int]):
    """Level-batched corner indices and interpolation weights.

    One set of (L, B)-shaped ops covers every live level at once (the
    per-level constants — scale, strides, size, offset — become (L, 1)
    columns), instead of L·C·D separate (B,)-shaped ops: that cuts the
    emitted HLO graph ~L× (compile time) with identical per-element
    math.  Levels are grouped into contiguous runs sharing the same
    indexing mode (hash vs dense-stride pattern), mirroring the
    reference's per-level branch in grid_index (common_device.h:690-707).

    Returns:
      idx: (L, C·B) int32 whole-table row indices (offsets folded in),
           corner-major within a level (reference bit order, grid.h:125).
      ws:  (L·C, B) f32 corner weights, segment s = l·C + c.
      ws_bwd: like ws but the weights the BACKWARD scatter uses —
        identical to ws unless spec.stochastic_interpolation, where it
        is the stochastic one-hot corner selection.
    """
    B = x.shape[0]
    D = spec.n_dims
    C = 1 << D
    levels = [spec.levels[li] for li in live]
    L = len(levels)
    corner_bits = _corner_offsets(D)

    scales = _const_col([lv.scale for lv in levels], np.float32)
    cells: List[jax.Array] = []
    w1s: List[jax.Array] = []
    for d in range(D):
        pos = x[:, d].astype(jnp.float32)[None, :] * scales + 0.5
        cf = jnp.floor(pos)
        # (uint32)(int)floorf — wraps negatives exactly like CUDA.
        cells.append(cf.astype(jnp.int32).astype(jnp.uint32))
        w1s.append(_interp_weight(pos - cf, spec.interpolation))

    # Corner weights: Π_d (f_d if corner bit set else 1−f_d), (L, B).
    def corner_weights(per_dim):
        out = []
        for c in range(C):
            w = per_dim[0] if corner_bits[c, 0] else 1.0 - per_dim[0]
            for d in range(1, D):
                w = w * (per_dim[d] if corner_bits[c, d] else 1.0 - per_dim[d])
            out.append(w)
        return jnp.stack(out, axis=1).reshape(L * C, B)

    ws = corner_weights(w1s)
    if spec.stochastic_interpolation:
        # Stochastic interpolation (grid.h:284-299): one fixed-seed
        # uniform per (level, sample) picks a single corner per dim
        # (corner+1 iff u < fract); the backward scatters the FULL
        # gradient there.  Fixed seed == the reference's
        # random_val(1337, ...) — deterministic across steps.
        u_full = jax.random.uniform(jax.random.key(1337),
                                    (spec.n_levels, B))
        u = (u_full if L == spec.n_levels
             else u_full[jnp.asarray(np.array(live))])
        ws_bwd = corner_weights([(u < w1).astype(jnp.float32)
                                 for w1 in w1s])
    else:
        ws_bwd = ws

    # Contiguous level runs sharing an indexing mode.
    runs: List[Tuple[Tuple, List[int]]] = []
    for p, lv in enumerate(levels):
        mode = (lv.use_hash, None if lv.use_hash else lv.stride_mask)
        if runs and runs[-1][0] == mode:
            runs[-1][1].append(p)
        else:
            runs.append((mode, [p]))

    run_idx = []
    for (use_hash, mask), ps in runs:
        p0, p1 = ps[0], ps[-1] + 1
        corner_idx = []
        if use_hash:
            for c in range(C):
                corner_idx.append(_hash_coords(
                    spec.hash_type,
                    [cells[d][p0:p1] + jnp.uint32(corner_bits[c, d])
                     for d in range(D)]))
        else:
            strides = [
                _const_col([levels[p].strides[d] for p in ps], np.uint32)
                for d in range(D)]
            for c in range(C):
                h = jnp.zeros((p1 - p0, B), jnp.uint32)
                for d in range(D):
                    if mask[d]:
                        h = h + ((cells[d][p0:p1]
                                  + jnp.uint32(corner_bits[c, d]))
                                 * strides[d])
                corner_idx.append(h)
        raw = jnp.stack(corner_idx, axis=1)          # (Lr, C, B)
        # Per-level mod with SCALAR divisors: XLA strength-reduces
        # x % const to multiply-high + shift (and to a bitwise AND for
        # the power-of-two hash sizes); a broadcast (Lr, 1) divisor
        # would force a generic ~20-op division sequence per element,
        # which measurably dominates the whole index construction.
        rows = []
        for ri, p in enumerate(ps):
            lv = levels[p]
            rows.append((raw[ri] % jnp.uint32(lv.size)
                         + jnp.uint32(lv.offset)).astype(jnp.int32))
        run_idx.append(jnp.stack(rows, axis=0))      # (Lr, C, B) int32
    idx = jnp.concatenate(run_idx, axis=0).reshape(L, C * B)
    return idx, ws, ws_bwd


def _cols_from_feats(feats: jax.Array, ws: jax.Array, fc) -> jax.Array:
    """(L·C·B, F) gathered features × (L·C, B) weights → (L·F, B) SoA."""
    f, c = fc[0], fc[1]
    lc, b = ws.shape
    n_lvl = lc // c
    fr = feats.reshape(n_lvl, c, b, f).astype(jnp.float32)
    wr = ws.reshape(n_lvl, c, b)
    colk = [jnp.sum(fr[..., k] * wr, axis=1) for k in range(f)]  # (L, B) ea.
    return jnp.stack(colk, axis=1).reshape(n_lvl * f, b)


def _interpolate_ref(flat, idx, ws, fc):
    """Identical-math jnp interpolation (autodiff ground truth).

    Per-level gathers (rows of ``idx``): level-local index ranges make
    L small takes ~30% faster than one fused take on v5e.
    """
    f = fc[0]
    table2d = flat.reshape(-1, f)
    feats = jnp.concatenate(
        [jnp.take(table2d, idx[l], axis=0) for l in range(idx.shape[0])],
        axis=0)
    return _cols_from_feats(feats, ws, fc)


def _interpolate_paired(flat, idx, ws, fc):
    """Paired gather: ONE (2F)-wide take fetches BOTH dim-0 corners.

    Requires every level's dim-0 corner rows to be table-adjacent
    (dense/tiled indexing or HashType.CoherentAdd).  The table is
    viewed twice — row j of view A holds entries (2j, 2j+1), row j of
    view B holds (2j+1, 2j+2) — so the pair starting at ANY row r is
    one take at ``(r>>1) + (r&1)·H``: gather issue count halves, which
    is the forward's entire cost (XLA takes are issue-bound and
    width-independent).  Wrap-around pairs read the level's first entry
    via a tiny L-row side gather (matching the paired scatter's wrap
    correction, so forward and backward stay exact transposes).
    """
    f, c, lv_meta = fc
    n_rows = flat.shape[0] // f
    L = idx.shape[0]
    b = ws.shape[1]
    cp = c // 2
    idx3 = idx.reshape(L, c, b)
    idx_e = idx3[:, 0::2, :]                      # (L, cp, B)

    h = n_rows // 2
    a2 = flat[: h * 2 * f].reshape(h, 2 * f)
    btail = flat[f:]
    pad = (-btail.shape[0]) % (2 * f)
    b2 = jnp.pad(btail, (0, pad)).reshape(-1, 2 * f)
    t2 = jnp.concatenate([a2, b2], axis=0)
    j = (idx_e >> 1) + (idx_e & 1) * h
    pairs = jnp.stack([jnp.take(t2, j[l], axis=0) for l in range(L)],
                      axis=0).astype(jnp.float32)  # (L, cp, B, 2F)

    feats_e = pairs[..., :f]
    feats_o = pairs[..., f:]
    last = jnp.asarray(np.array([[[m[2] + m[1] - 1]] for m in lv_meta],
                                np.int32))
    first_rows = jnp.asarray(np.array([m[2] for m in lv_meta], np.int32))
    e0 = jnp.take(flat.reshape(n_rows, f), first_rows,
                  axis=0).astype(jnp.float32)      # (L, F)
    wrap = (idx_e == last)[..., None]
    feats_o = jnp.where(wrap, e0[:, None, None, :], feats_o)

    ws3 = ws.reshape(L, c, b)
    w_e = ws3[:, 0::2, :]
    w_o = ws3[:, 1::2, :]
    colk = [jnp.sum(feats_e[..., k] * w_e + feats_o[..., k] * w_o, axis=1)
            for k in range(f)]
    return jnp.stack(colk, axis=1).reshape(L * f, b)


# ---------------------------------------------------------------------------
# Per-level routing between the three fast implementations:
#   * "mm"     — MXU one-hot matmul kernels (ops/pallas/grid_matmul):
#                fully vectorized, hash-type agnostic; per-update cost
#                grows with the level's table size, so only levels up
#                to a MAC budget qualify.
#   * "paired" — serial Pallas pair kernels (ops/pallas/scatter): cost
#                is per-UPDATE (scalar-issue bound), independent of
#                table size; needs dim-0-adjacent corner rows
#                (dense/tiled strides or HashType.CoherentAdd).
#   * "single" — serial unpaired / XLA fallback.
# Forward and backward route independently (any path is an exact
# transpose of any other).  Budgets are in value-operand MACs per
# update (size·F·n_passes); defaults come from the measured serial
# costs (~4.75 ns/update paired, ~9.5 unpaired) vs the MXU rate.
# ---------------------------------------------------------------------------


def _mm_budgets():
    if os.environ.get("TCNN_TPU_DISABLE_MM"):
        return -1, -1
    return (int(os.environ.get("TCNN_TPU_MM_BUDGET_PAIRED", 400_000)),
            int(os.environ.get("TCNN_TPU_MM_BUDGET_UNPAIRED", 800_000)))


def _mm_max_rows():
    """Hard VMEM guard for the matmul kernels: the hi one-hot is
    (size/128, tile) bf16 — at the default 4096 tile a 2^16-row level
    costs 4 MB of VMEM for that operand alone.  Levels past this cap
    go serial regardless of MAC budget."""
    return int(os.environ.get("TCNN_TPU_MM_MAX_ROWS", 1 << 16))


def _xor_flag(m, direction, n_passes) -> bool:
    """XOR-pair eligibility of an lv_meta row for one direction
    ("gather"/"scatter") at a value-pass count (the auto default is
    on for P=2 f32 tables, off for P=1 bf16 — see
    grid_matmul.xor_pair_mode); the row flag is absent on the 3-tuple
    metas built by the sharded path, where xor pairing stays off."""
    from .pallas.grid_matmul import xor_pair_mode

    return (len(m) > 3 and bool(m[3])
            and direction in xor_pair_mode(n_passes))


def _route_levels(fc, flat_dtype, b):
    """-> (mm_levels, serial_levels) position lists into lv_meta."""
    from .pallas.grid_matmul import _value_passes, batch_tile

    f, _, lv_meta = fc[0], fc[1], fc[2]
    bud_p, bud_u = _mm_budgets()
    n_passes = _value_passes(flat_dtype)
    mm, serial = [], []
    usable = batch_tile(b) != 0 and _pallas_backend_ok()
    for i, m in enumerate(lv_meta):
        p, size = m[0], m[1]
        budget = bud_p if p else bud_u
        # XOR pairing halves the per-update MAC bill, doubling the
        # table size at which the matmul kernels beat the serial ones
        # (counted only when the SCATTER direction runs xor — the
        # backward dominates the per-level cost this routing weighs).
        cost = size * f * n_passes // (
            2 if _xor_flag(m, "scatter", n_passes) else 1)
        if usable and cost <= budget and size <= _mm_max_rows():
            mm.append(i)
        else:
            serial.append(i)
    return mm, serial


def _mm_classes(lv_meta, positions, b=1 << 18):
    """Group mm levels into dispatch classes -> [(levels, r_pad,
    merged)].

    Every level in a class contracts against the CLASS's padded row
    count, so merging is a trade: it removes per-level padding waste
    (a 300-row level alone still pays a 1024-row contraction) but
    makes every merged level pay the whole virtual table.  The merge
    prefix is therefore chosen by exact MAC cost: sort ascending,
    take the prefix k (possibly 0) minimizing

        k · pad(Σ_{i<k} size_i)  +  Σ_{i≥k} pad(size_i)

    — on the flagship geometry this merges only the two sub-1024-row
    levels (cost 2·1024 either way) and stops, where the round-3
    fixed 16384-row cap merged five levels into a 12288-row virtual
    table whose contraction each of them then paid (+1.2 ms/pass
    measured on chip).  TCNN_TPU_MM_MERGE_CAP overrides the prefix
    choice with the old greedy row-cap behavior for A/B.
    Remaining levels get per-level blocks, classed by equal padded
    size so no level pays a larger level's padding."""
    pad = lambda n: next_multiple(n, 1024)
    by_size = sorted(positions, key=lambda i: (lv_meta[i][1], i))
    sizes = [lv_meta[i][1] for i in by_size]
    cap_env = os.environ.get("TCNN_TPU_MM_MERGE_CAP")
    if cap_env is not None:
        merge_cap = int(cap_env)
        merged, rest, tot = [], [], 0
        for i in by_size:
            if tot + lv_meta[i][1] <= merge_cap:
                merged.append(i)
                tot += lv_meta[i][1]
            else:
                rest.append(i)
    else:
        per_level = [pad(s) for s in sizes]
        suffix = [0] * (len(sizes) + 1)
        for j in range(len(sizes) - 1, -1, -1):
            suffix[j] = suffix[j + 1] + per_level[j]
        best_k, best_cost, run = 0, suffix[0], 0
        for k in range(1, len(sizes) + 1):
            run += sizes[k - 1]
            cost = k * pad(run) + suffix[k]
            if cost < best_cost:
                best_k, best_cost = k, cost
        merged, rest = by_size[:best_k], by_size[best_k:]
        tot = sum(sizes[:best_k])
    out = []
    if len(merged) >= 2:
        out.append((sorted(merged), pad(tot), True))
    elif merged:
        rest += merged
    classes = {}
    for i in rest:
        classes.setdefault(pad(lv_meta[i][1]), []).append(i)
    # Launch-aware absorption (round 5, OFF by default — measured to
    # LOSE): the trace profile shows the small per-level classes each
    # cost ~0.36 ms while their MAC shares are 0.05-0.35 ms, suggesting
    # ~0.3 ms of fixed launch/ramp recoverable by absorbing small
    # classes into larger ones (levels pad up to the bigger r_pad —
    # per-level blocks make this numerically exact).  The on-chip A/B
    # refutes the model: 6→3 launches/direction measured 20.96 vs
    # 20.66 ms/step (benchmarks/logs/absorb_ab_r5.log) — the small
    # classes' exclusive-trace time is NOT a recoverable fixed cost
    # (their grid steps overlap the big class's pipeline; padding MACs
    # are pure addition).  Kept A/B-able: TCNN_TPU_MM_LAUNCH_ROWS=N
    # enables absorption of up to N extra padded rows per saved launch.
    lrows_env = os.environ.get("TCNN_TPU_MM_LAUNCH_ROWS")
    launch_rows = int(lrows_env) if lrows_env is not None else 0
    pads = sorted(classes)
    k = 0
    while k + 1 < len(pads):
        r_small, r_big = pads[k], pads[k + 1]
        extra = len(classes[r_small]) * (r_big - r_small)
        if extra <= launch_rows:
            classes[r_big] = classes[r_big] + classes[r_small]
            del classes[r_small]
            pads.pop(k)
        else:
            k += 1
    for r_pad in sorted(classes):
        out.append((sorted(classes[r_pad]), r_pad, False))
    return out


def _mm_class_plan(lv_meta, positions, direction, n_passes=1,
                   b=1 << 18):
    """_mm_classes plus pair-packing for one direction.

    XOR-pair-eligible levels (lv_meta[3]) whose ``direction`` is
    enabled in grid_matmul.xor_pair_mode(n_passes) (auto default: both
    directions for P=2 f32 tables where xor measured −20% on chip,
    none for P=1 bf16 where it measured slower — see that docstring)
    are classed separately and dispatched to the XOR-paired kernels —
    halved large-dot MXU cost, overflow-guarded.  Of the remainder,
    TCNN_TPU_MM_PAIRED routes strict-adjacency levels to the legacy
    carry-plane pair kernels (kept for A/B).
    Yields (levels, r_pad, merged, paired)."""
    from .pallas.grid_matmul import paired_mm_enabled

    pos_x = [i for i in positions
             if _xor_flag(lv_meta[i], direction, n_passes)]
    rest = [i for i in positions
            if not _xor_flag(lv_meta[i], direction, n_passes)]
    for levels, r_pad, mg in _mm_classes(lv_meta, pos_x, b):
        yield levels, r_pad, mg, "xor"
    if not paired_mm_enabled():
        for levels, r_pad, mg in _mm_classes(lv_meta, rest, b):
            yield levels, r_pad, mg, False
        return
    pos_p = [i for i in rest if lv_meta[i][0]]
    pos_u = [i for i in rest if not lv_meta[i][0]]
    for pos, pr in ((pos_p, "carry"), (pos_u, False)):
        for levels, r_pad, mg in _mm_classes(lv_meta, pos, b):
            yield levels, r_pad, mg, pr


def _sel_rows(arr, levels):
    """Level-row selection — a free slice for the (universal in
    practice) contiguous case, gather otherwise."""
    if list(levels) == list(range(levels[0], levels[-1] + 1)):
        return arr[levels[0]:levels[-1] + 1]
    return arr[jnp.asarray(np.array(levels))]


def _localize_idx(idx3_rows, lv_meta, levels):
    """Global (Lg, C, B) rows -> level-local (Lg·C, B)."""
    offs = _const_col([lv_meta[i][2] for i in levels], np.int32)
    return (idx3_rows - offs[:, :, None]).reshape(-1, idx3_rows.shape[-1])


def _interp_fwd_dispatch(flat, idx, ws, fc):
    """Forward: route each level to the matmul gather or the take-based
    paths.  Returns the (L·F, B) f32 interpolated columns."""
    if len(fc) < 3 or not fc[2]:
        return _interpolate_ref(flat, idx, ws, fc)
    f, c, lv_meta = fc
    lc, b = ws.shape
    mm, serial = _route_levels(fc, flat.dtype, b)
    if not mm:
        return _take_fwd_group(flat, idx, ws, fc,
                               list(range(len(lv_meta))))

    from .pallas import grid_matmul as gm

    n_lvl = lc // c
    idx3 = idx.reshape(n_lvl, c, b)
    ws3 = ws.reshape(n_lvl, c, b)
    from .pallas.grid_matmul import _value_passes

    pieces = {}
    for levels, r_pad, mg, pr in _mm_class_plan(
            lv_meta, mm, "gather", _value_passes(flat.dtype), b):
        idx_local = _localize_idx(_sel_rows(idx3, levels), lv_meta, levels)
        w_g = _sel_rows(ws3, levels).reshape(-1, b)
        tag = "x" if pr == "xor" else ("p" if pr else "")
        with jax.named_scope(f"tcnn_gather_mm{tag}_r{r_pad}"):
            cols_g = gm.mm_gather(
                flat, idx_local, w_g,
                tuple(lv_meta[i][1] for i in levels),
                tuple(lv_meta[i][2] for i in levels), f, c, r_pad, mg, pr)
        for gi, i in enumerate(levels):
            pieces[i] = cols_g[gi * f:(gi + 1) * f]
    if serial:
        with jax.named_scope("tcnn_gather_serial"):
            cols_s = _take_fwd_group(flat, idx, ws, fc, serial)
        for gi, i in enumerate(serial):
            pieces[i] = cols_s[gi * f:(gi + 1) * f]
    return jnp.concatenate([pieces[i] for i in range(len(lv_meta))], axis=0)


def _take_fwd_group(flat, idx, ws, fc, levels):
    """Take-based forward for a subset of levels (paired when legal)."""
    f, c, lv_meta = fc[0], fc[1], (fc[2] if len(fc) > 2 else None)
    lc, b = ws.shape
    n_lvl = lc // c
    if n_lvl != len(levels):
        idx = _sel_rows(idx.reshape(n_lvl, c, b), levels).reshape(len(levels), c * b)
        ws = _sel_rows(ws.reshape(n_lvl, c, b), levels).reshape(-1, b)
    sub_meta = tuple(lv_meta[i] for i in levels) if lv_meta else None
    sub_fc = (f, c, sub_meta) if sub_meta is not None else (f, c)
    n_rows = flat.shape[0] // f
    if (sub_meta and all(m[0] for m in sub_meta) and n_rows % 2 == 0):
        return _interpolate_paired(flat, idx, ws, sub_fc)
    return _interpolate_ref(flat, idx, ws, sub_fc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _grid_interpolate(flat, idx, ws, ws_bwd, fc):
    """All levels' gather + interpolation with a hand-rolled VJP.

    Forward and backward each route EVERY level to one of three
    implementations (see _route_levels): the MXU one-hot matmul kernels
    (fully vectorized — the default for levels whose tables fit the MAC
    budget, any hash type), the serial Pallas pair kernels (scalar
    issue-bound but size-independent — large CoherentAdd/dense levels),
    or the serial/XLA fallback.  The weight multiply happens inside the
    kernels, so no dense gradient stream is ever materialized (the CUDA
    reference's kernel_grid_backward does the same fusion in-register,
    grid.h:214-320).

    Args: flat (N·F,) table; idx (L, C·B) int32 rows (level offsets
    folded in); ws (L·C, B) f32 corner weights; fc static
    (F, C, level_meta) with level_meta a tuple of per-live-level
    (paired, size, offset).
    Returns (L·F, B) f32 SoA feature columns, level-major.
    """
    return _interp_fwd_dispatch(flat, idx, ws, fc)


def _grid_interpolate_vjp_fwd(flat, idx, ws, ws_bwd, fc):
    # Residuals carry the (tiny) table instead of the (batch-sized)
    # gathered features: d/dws re-gathers lazily in the bwd, and XLA
    # dead-code-eliminates that when input gradients are unused.
    return _interp_fwd_dispatch(flat, idx, ws, fc), (idx, ws_bwd, flat)


def _grid_interpolate_vjp_bwd(fc, res, dcols):
    from .pallas import grid_matmul as gm
    from .pallas.scatter import (scatter_add_weighted,
                                 scatter_add_weighted_pairs)

    f, c, lv_meta = fc
    idx, ws_scatter, flat = res
    n_flat = flat.shape[0]
    lc, b = ws_scatter.shape
    n_lvl = lc // c
    n_rows = n_flat // f
    idx3 = idx.reshape(n_lvl, c, b)
    ws3 = ws_scatter.reshape(n_lvl, c, b)
    dc3 = dcols.reshape(n_lvl, f, b)

    if (os.environ.get("TCNN_TPU_SCATTER") == "sortseg"
            or not _pallas_backend_ok()):
        # Design candidate (b) — sort + segment-sum (see
        # ops/sort_scatter.py).  Kept runnable end-to-end so the
        # ROOFLINE.md shoot-out stays reproducible; never the default
        # on TPU/CPU.  Doubles as the pure-XLA backward for backends
        # (GPU) where the pltpu kernels cannot lower but the custom
        # VJP is still structurally required (stochastic
        # interpolation) — deterministic there too, unlike XLA's
        # atomic GPU scatter-add.
        from .sort_scatter import sort_segment_scatter

        vals = (ws3[:, :, None, :]
                * dc3[:, None, :, :]).transpose(0, 1, 3, 2).reshape(-1, f)
        dflat = sort_segment_scatter(
            idx3.reshape(-1), vals, n_rows).reshape(-1)
        return _finish_interp_bwd(dflat, flat, idx3, dc3, fc)

    mm, serial = _route_levels(fc, flat.dtype, b)
    paired = [i for i in serial if lv_meta[i][0]]
    unpaired = [i for i in serial if not lv_meta[i][0]]

    from .pallas.grid_matmul import _value_passes as _vp

    dflat = None
    for levels, r_pad, mg, pr in _mm_class_plan(lv_meta, mm, "scatter",
                                                _vp(flat.dtype), b):
        idx_local = _localize_idx(_sel_rows(idx3, levels), lv_meta, levels)
        w_g = _sel_rows(ws3, levels).reshape(-1, b)
        dc_g = _sel_rows(dc3, levels).reshape(-1, b)
        tag = "x" if pr == "xor" else ("p" if pr else "")
        with jax.named_scope(f"tcnn_scatter_mm{tag}_r{r_pad}"):
            part = gm.mm_scatter(
                idx_local, w_g, dc_g,
                tuple(lv_meta[i][1] for i in levels),
                tuple(lv_meta[i][2] for i in levels), f, c, r_pad,
                n_flat, str(flat.dtype), mg, pr)
        dflat = part if dflat is None else dflat + part

    # Serial levels run in VMEM-budget GROUPS of table-contiguous
    # levels, each group a kernel call with GROUP-LOCAL rows.  One call
    # over all levels would size the kernel's accumulator by the WHOLE
    # table; beyond ~2.4M rows (f=2, paired) the kernel's own VMEM
    # check then silently routes everything to XLA's serialized
    # read-modify-write scatter — measured as the round-4 BTF backward:
    # 15 x 2^19-row levels in one call = 62 MB packed = XLA fallback at
    # ~68 ns/row = ~1.1 s/step.  Grouped, the same levels stay on the
    # serial pair kernels at ~14 ns/pair.
    def _merge(dflat, piece, base_row):
        if dflat is None:
            if piece.shape[0] == n_flat:
                return piece
            dflat = jnp.zeros((n_flat,), piece.dtype)
        # Level row ranges are disjoint across mm classes and serial
        # groups, and every prior contribution left this range zero, so
        # an overwrite IS the add.
        return jax.lax.dynamic_update_slice(dflat, piece, (base_row * f,))

    if unpaired:
        with jax.named_scope("tcnn_scatter_serial"):
            for group in _serial_level_groups(lv_meta, unpaired, f, False):
                base = lv_meta[group[0]][2]
                rows_g = sum(lv_meta[i][1] for i in group)
                piece = scatter_add_weighted(
                    (_sel_rows(idx3, group) - base).reshape(-1),
                    _sel_rows(ws3, group).reshape(-1),
                    _sel_rows(dc3, group).reshape(-1, b), rows_g, f, c)
                dflat = _merge(dflat, piece, base)
    if paired:
        with jax.named_scope("tcnn_scatter_pairs"):
            for group in _serial_level_groups(lv_meta, paired, f, True):
                base = lv_meta[group[0]][2]
                rows_g = sum(lv_meta[i][1] for i in group)
                idx_p = _sel_rows(idx3, group)
                ws_p = _sel_rows(ws3, group)
                idx_e = idx_p[:, 0::2, :]        # even dim-0 corners
                w_e = ws_p[:, 0::2, :]
                w_o = ws_p[:, 1::2, :]
                dc_p = _sel_rows(dc3, group)
                # Wrap-around pairs: even corner on the level's LAST
                # entry → the odd corner wraps to the level's FIRST.
                # Zero the in-kernel odd weight and add the wrapped
                # mass via a dense per-level reduction (exact; the
                # kernel stays branch-free).
                last = jnp.asarray(np.array(
                    [[[lv_meta[i][2] + lv_meta[i][1] - 1]]
                     for i in group], np.int32))  # (Lp, 1, 1)
                wrap = idx_e == last
                w_o_in = jnp.where(wrap, 0.0, w_o)
                piece = scatter_add_weighted_pairs(
                    (idx_e - base).reshape(-1), w_e.reshape(-1),
                    w_o_in.reshape(-1), dc_p.reshape(-1, b), rows_g, f,
                    c // 2)
                corr = gm.level_wrap_correction(w_o, wrap, dc_p,
                                                f)  # (Lp, F)
                tgt = jnp.asarray(np.array(
                    [(lv_meta[i][2] - base) * f + k for i in group
                     for k in range(f)], np.int32))
                piece = piece.at[tgt].add(corr.reshape(-1))
                dflat = _merge(dflat, piece, base)
    if dflat is None:
        dflat = jnp.zeros((n_flat,), jnp.float32)
    return _finish_interp_bwd(dflat, flat, idx3, dc3, fc)


def _serial_level_groups(lv_meta, levels, f: int, paired: bool):
    """Partition ``levels`` (positions into lv_meta, ascending) into
    table-contiguous groups whose combined row count keeps the serial
    scatter kernel's accumulator VMEM-resident (scatter.max_group_rows
    with two pipelined accumulators).  A single level over the cap gets
    its own group — the kernel then degrades for THAT level only
    (1 accumulator, or XLA past ~2x the cap) instead of dragging every
    level to the fallback."""
    from .pallas.scatter import max_group_rows

    cap_env = os.environ.get("TCNN_TPU_SERIAL_GROUP_ROWS")
    cap = int(cap_env) if cap_env else max_group_rows(f, paired)
    groups = []
    cur, cur_rows, cur_end = [], 0, None
    for i in levels:
        size, off = lv_meta[i][1], lv_meta[i][2]
        if cur and (off != cur_end or cur_rows + size > cap):
            groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(i)
        cur_rows += size
        cur_end = off + size
    if cur:
        groups.append(cur)
    return groups


def _finish_interp_bwd(dflat, flat, idx3, dc3, fc):
    """Shared tail of the interpolate VJP: cotangent dtype + d/dws."""
    f, c, _ = fc
    n_lvl, _, b = idx3.shape
    n_rows = flat.shape[0] // f
    # Cotangent dtype must match the primal table's (bf16 compute
    # copies get bf16 grads — the reference's half grad accumulation,
    # grid.h:655-666; the fp32 masters recover precision at the cast).
    dflat = dflat.astype(flat.dtype)

    # d/dws[l,c,b] = Σ_k dcols[l·F+k, b] · feats[l,c,b,k] — feats
    # re-gathered lazily from the table (only needed for input
    # gradients; XLA dead-code-eliminates the takes when dx is unused).
    from .pallas import grid_matmul as gm

    with jax.named_scope("tcnn_dws"):
        table2d = flat.reshape(n_rows, f).astype(jnp.float32)
        fr = jnp.stack([jnp.take(table2d, idx3[l], axis=0)
                        for l in range(n_lvl)], axis=0)   # (L, C, B, F)
        dws = gm.feats_dot_ct(fr, dc3, f)
    # ws_bwd gets a zero cotangent: in the stochastic case it is an
    # indicator (zero derivative a.e.); otherwise it aliases ws whose
    # cotangent is dws.
    lc = n_lvl * c
    return (dflat, None, dws.reshape(lc, b),
            jnp.zeros((lc, b), jnp.float32))


_grid_interpolate.defvjp(_grid_interpolate_vjp_fwd, _grid_interpolate_vjp_bwd)


def grid_encode(
    spec: GridSpec,
    table: jax.Array,
    x: jax.Array,
    max_level: Optional[int] = None,
    fast_scatter: Optional[bool] = None,
    soa: bool = False,
    max_level_per_element: Optional[jax.Array] = None,
) -> jax.Array:
    """Forward grid encoding.

    Args:
      spec:  static grid description.
      table: (n_entries, F) feature table (the trainable params).
      x:     (B, D) coordinates, typically in [0, 1]^D.
      max_level: optional static level cutoff — levels ≥ max_level emit
        zeros (and receive zero grads), matching the reference's
        max_level masking (grid.h:69-92).
      max_level_per_element: optional traced (B,) float array of
        per-SAMPLE level fractions in [0, 1] (the reference's
        ``max_level_gpu``, grid.h:69-92): sample b uses levels
        l < max_level_per_element[b]·n_levels + 1e-3; masked levels
        emit zeros and receive zero grads for that sample only (the
        coarse-to-fine schedules of instant-ngp).  Composes with the
        static ``max_level`` cutoff.
      soa: emit (L·F, B) instead of (B, L·F).  SoA is the reference's
        preferred grid layout (grid.h:1053-1055) and the TPU-efficient
        one: assembling (B, L·F) from per-level pieces is a minor-dim
        concat of 2-wide strips — lane-strided shuffles that cost more
        than the whole gather when the result must materialize for a
        Pallas consumer.  Feature-major rows stack for free.

    Returns (B, L·F) features (or the SoA transpose), level-major
    (level l occupies rows/columns [l·F, (l+1)·F)).

    ``fast_scatter`` selects the Pallas deterministic scatter-add for
    the table-gradient transpose (reverse-mode only); the default picks
    it on TPU backends.  The forward gather is XLA's (already at its
    issue-rate floor); only d/dtable changes, and both paths are
    deterministic and numerically identical modulo fp32 add order.
    """
    if x.ndim != 2 or x.shape[1] != spec.n_dims:
        raise ValueError(f"expected (B, {spec.n_dims}) input, got {x.shape}")
    if fast_scatter is None:
        fast_scatter = _default_fast_scatter()
    F = spec.n_features_per_level
    # Accept flat (n_entries·F,) or (n_entries, F) tables; flat is the
    # canonical param storage (compact 1-D layout — a skinny (N, F)
    # array is lane-padded 128/F× on TPU, taxing every optimizer pass).
    flat = table.reshape(-1)
    B = x.shape[0]
    C = 1 << spec.n_dims

    live = [li for li in range(spec.n_levels)
            if max_level is None or li < max_level]
    shard_ctx = _TABLE_SHARDING.get()
    if shard_ctx is None and flat.size != spec.n_params:
        # A wrong-size table (stale checkpoint after a spec change,
        # mis-shaped array) would otherwise gather clamped garbage
        # silently (jnp.take clips out-of-range rows).  The sharded
        # path validates its shard size in _interpolate_sharded.
        raise ValueError(
            f"table has {flat.size} elements but the grid spec needs "
            f"{spec.n_params} ({spec.n_entries} rows × "
            f"{spec.n_features_per_level} features)")
    sharded_mode = (shard_ctx is not None and shard_ctx[1] > 1
                    and flat.size != spec.n_params)
    if sharded_mode and spec.stochastic_interpolation:
        # A full-size table under the context means this grid was left
        # replicated and follows the ordinary paths (sharded_mode off).
        raise NotImplementedError(
            "sharded_tables does not support stochastic_interpolation "
            "(the backward scatter weights differ from the forward's)")
    if live:
        x_in = x
        if sharded_mode:
            # Model-parallel tables: the batch is sharded over the
            # model axis too, but every rank's samples may touch every
            # table shard — gather the model group's batch, build
            # indices/weights for all of it, and let the psum_scatter
            # in _interpolate_sharded hand back just our columns.
            x_in = jax.lax.all_gather(x, shard_ctx[0], axis=0, tiled=True)
            if max_level_per_element is not None:
                max_level_per_element = jax.lax.all_gather(
                    max_level_per_element.reshape(-1), shard_ctx[0],
                    axis=0, tiled=True)
        # named_scope: propagates into XLA op_metadata so profiler
        # traces attribute this stage by name (profile_step.py).
        with jax.named_scope("tcnn_idx_build"):
            idx, ws, ws_bwd = _build_indices_weights(spec, x_in, live)
        if max_level_per_element is not None:
            # Per-sample coarse-to-fine masking (grid.h:69-92): level l
            # is live for sample b iff l < frac[b]·n_levels + 1e-3.
            # Zeroing the corner weights zeroes the sample's output on
            # masked levels AND (weights enter every scatter/gather
            # path multiplicatively) its table and input gradients.
            frac = max_level_per_element.astype(jnp.float32).reshape(1, -1)
            lvl_col = _const_col(live, np.float32)         # (L, 1)
            live_mask = (lvl_col < frac * float(spec.n_levels)
                         + 1e-3).astype(jnp.float32)       # (L, B)
            C_ = 1 << spec.n_dims
            mask_lc = jnp.repeat(live_mask, C_, axis=0)    # (L·C, B)
            ws = ws * mask_lc
            ws_bwd = ws_bwd * mask_lc
        if sharded_mode:
            # Model-parallel tables (sharded_tables context): ``flat``
            # is this mesh position's block-cyclic row shard, itself a
            # valid smaller grid — the production kernels run on it
            # unchanged when fast_scatter is on.
            cols = _interpolate_sharded(spec, live, flat, idx, ws,
                                        (F, C), shard_ctx[0],
                                        shard_ctx[1], fast_scatter)
        elif fast_scatter or spec.stochastic_interpolation:
            # Stochastic interpolation always needs the custom VJP (the
            # scatter weights differ from the forward weights).
            # Per-level pairing eligibility: dense/tiled stride
            # indexing always has dim-0-adjacent corner rows; hash
            # levels only under the additive coherent hash.  The 4th
            # element marks XOR-pair eligibility (shared-hi corner
            # pairs; see grid_matmul's XOR-paired section): adjacency
            # levels qualify when the carry rate (lane crossings
            # 1/128 + level wraps ~0.5/(res−1)) stays small, and
            # CoherentPrime power-of-two levels qualify because
            # factors[0] == 1 and % 2^k is a bitmask.
            def _xor_ok(lv):
                adjacent = ((not lv.use_hash)
                            or spec.hash_type == HashType.COHERENT_ADD)
                if adjacent:
                    return lv.resolution >= 64
                return (spec.hash_type == HashType.COHERENT_PRIME
                        and lv.size & (lv.size - 1) == 0)

            lv_meta = tuple(
                ((not lv.use_hash)
                 or spec.hash_type == HashType.COHERENT_ADD,
                 lv.size, lv.offset, _xor_ok(lv))
                for lv in (spec.levels[li] for li in live))
            try:
                cols = _grid_interpolate(flat, idx, ws, ws_bwd,
                                         (F, C, lv_meta))
            except TypeError as e:
                # Forward-mode (jvp/jacfwd) tracer: custom_vjp is
                # reverse-only, so fall back to the pure-jnp math
                # whose jvp JAX derives (identical values; the same
                # escape the reference lacks entirely — its bindings
                # are reverse-only, modules.py:120-160).  Stochastic
                # interpolation keeps the custom VJP semantics and
                # stays reverse-only.
                if ("custom_vjp" not in str(e)
                        or spec.stochastic_interpolation):
                    raise
                cols = _interpolate_ref(flat, idx, ws, (F, C))
        else:
            cols = _interpolate_ref(flat, idx, ws, (F, C))
    else:
        cols = jnp.zeros((0, B), jnp.float32)
    if len(live) != spec.n_levels:
        # Re-insert zero rows for max_level-masked levels
        # (grid.h:69-92): masked levels emit zeros and get zero grads.
        parts = []
        it = 0
        zeros = jnp.zeros((F, B), jnp.float32)
        for li in range(spec.n_levels):
            if li in set(live):
                parts.append(cols[it * F:(it + 1) * F])
                it += 1
            else:
                parts.append(zeros)
        cols = jnp.concatenate(parts, axis=0)
    # Feature-major (L·F, B) SoA — major-dim layout, no lane shuffles.
    # The AoS view is one well-optimized XLA transpose.
    out = cols.astype(table.dtype)
    return out if soa else out.T


def init_grid_params(key: jax.Array, spec: GridSpec, scale: float = 1.0,
                     dtype=jnp.float32) -> jax.Array:
    """U(−1e-4, 1e-4)·scale init (grid.h:1059-1062)."""
    return jax.random.uniform(
        key, (spec.n_entries, spec.n_features_per_level), dtype=dtype,
        minval=-1e-4 * scale, maxval=1e-4 * scale)
