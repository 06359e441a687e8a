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

import dataclasses
import math
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
    if hash_type == HashType.PRIME:
        f = PRIME_HASH_FACTORS
    elif hash_type == HashType.COHERENT_PRIME:
        f = COHERENT_PRIME_HASH_FACTORS
    elif hash_type == HashType.REVERSED_PRIME:
        f = REVERSED_PRIME_HASH_FACTORS
    else:
        raise NotImplementedError(
            f"Hash type {hash_type} is not implemented (reference supports it "
            "via pcg32 skip-ahead; add if ever needed in practice)")
    if n_dims > len(f):
        raise ValueError(f"grid hash supports at most {len(f)} dims")
    return f[:n_dims]


def grid_scale(level: int, log2_per_level_scale: float, base_resolution: int) -> float:
    return float(2.0 ** (level * log2_per_level_scale) * base_resolution - 1.0)


def grid_resolution(scale: float) -> int:
    return int(math.ceil(scale)) + 1


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
) -> GridSpec:
    """Build the level/offset table (grid.h:686-731)."""
    if n_levels > MAX_N_GRID_LEVELS:
        raise ValueError(f"n_levels={n_levels} exceeds {MAX_N_GRID_LEVELS}")
    log2_pls = math.log2(per_level_scale)
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
        levels=tuple(levels), n_entries=offset)


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
        factors = hash_factors(spec.hash_type, spec.n_dims)
        idx = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(spec.n_dims):
            idx = idx ^ (pos_grid[..., d] * jnp.uint32(factors[d]))
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


def _default_fast_scatter() -> bool:
    """Pallas deterministic-scatter backward on real TPU; pure-XLA
    scatter on CPU (tests run the kernel in interpret mode anyway via
    TCNN_TPU_FORCE_FAST_SCATTER)."""
    import os

    if os.environ.get("TCNN_TPU_FORCE_FAST_SCATTER"):
        return True
    if os.environ.get("TCNN_TPU_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _grid_interpolate(flat, idx, ws, fc):
    """All levels' interpolation with a hand-rolled VJP.

    fwd: one gather at ``idx`` (all levels & corners, segment-major:
    segment s = l·C + c), then cols[l·F+k] = Σ_c ws[l·C+c] ⊙
    feats_segment(l,c)[:, k].  The custom bwd builds per-feature FLAT
    gradient streams for ONE Pallas scatter over the whole table —
    autodiff would route the cotangent through (M, F) skinny
    intermediates whose lane padding costs more than the scatter
    itself, and per-level scatters would re-zero the table 16×.

    Args: flat (N·F,) table; idx (L·C·B,) int32 (level offsets already
    folded in); ws tuple of L·C (B,) f32 corner weights; fc static
    (F, C).
    Returns tuple of L·F (B,) f32 columns, level-major.
    """
    cols, _ = _grid_interpolate_fwd_impl(flat, idx, ws, fc)
    return cols


def _grid_interpolate_fwd_impl(flat, idx, ws, fc):
    f, c = fc
    b = ws[0].shape[0]
    n_levels = len(ws) // c
    # Per-level gathers (idx is a tuple): per-level index locality makes
    # 16 small takes ~30% faster than one fused take on v5e.
    table2d = flat.reshape(-1, f)
    feats = [jnp.take(table2d, ix, axis=0).astype(jnp.float32) for ix in idx]
    cols = []
    for l in range(n_levels):
        for k in range(f):
            col = jnp.zeros((b,), jnp.float32)
            for ci in range(c):
                col = col + feats[l][ci * b:(ci + 1) * b, k] * ws[l * c + ci]
            cols.append(col)
    return tuple(cols), tuple(feats)


def _grid_interpolate_vjp_fwd(flat, idx, ws, fc):
    cols, feats = _grid_interpolate_fwd_impl(flat, idx, ws, fc)
    return cols, (idx, ws, feats, flat.shape[0])


def _grid_interpolate_vjp_bwd(fc, res, dcols):
    from .pallas.scatter import scatter_add_cols

    f, c = fc
    idx, ws, feats, n_flat = res
    n_seg = len(ws)
    b = ws[0].shape[0]
    # d/dtable: segment s = l·C + ci gets g_k = ws[s] ⊙ dcols[l·F+k];
    # ONE scatter over the whole table (per-level scatters would re-zero
    # the 5.6 MB gradient accumulator L times).
    gs = tuple(
        jnp.concatenate([ws[s] * dcols[(s // c) * f + k]
                         for s in range(n_seg)])
        for k in range(f))
    dflat = scatter_add_cols(jnp.concatenate(idx), gs, n_flat // f)
    # d/dws[s] = Σ_k dcols[l·F+k] ⊙ feats_level(s//c)[segment s%c][:, k].
    dws = []
    for s in range(n_seg):
        l, ci = divmod(s, c)
        dw = jnp.zeros((b,), jnp.float32)
        for k in range(f):
            dw = dw + dcols[l * f + k] * feats[l][ci * b:(ci + 1) * b, k]
        dws.append(dw)
    return dflat, None, tuple(dws)


_grid_interpolate.defvjp(_grid_interpolate_vjp_fwd, _grid_interpolate_vjp_bwd)


def grid_encode(
    spec: GridSpec,
    table: jax.Array,
    x: jax.Array,
    max_level: Optional[int] = None,
    fast_scatter: Optional[bool] = None,
    soa: bool = False,
) -> jax.Array:
    """Forward grid encoding.

    Args:
      spec:  static grid description.
      table: (n_entries, F) feature table (the trainable params).
      x:     (B, D) coordinates, typically in [0, 1]^D.
      max_level: optional static level cutoff — levels ≥ max_level emit
        zeros (and receive zero grads), matching the reference's
        max_level masking (grid.h:69-92).
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
    n_rows = flat.shape[0] // F
    take_fn = lambda fl, i: jnp.take(  # noqa: E731
        fl.reshape(n_rows, F), i, axis=0)
    B = x.shape[0]
    D = spec.n_dims
    C = 1 << D
    corner_bits = _corner_offsets(D)  # (C, D) numpy, python-level

    # Dense per-dim formulation: every intermediate is a (B,)-shaped
    # array (compact layout on TPU).  The (B, C, D) broadcast version
    # forces padded tiled layouts for the skinny minor dims, which
    # dominates the step cost on real hardware.
    xs = [x[:, d].astype(jnp.float32) for d in range(D)]

    cols = []        # L·F dense (B,) feature columns (slow path / zeros)
    all_idx = []     # fast path: per-live-level (C·B,) index arrays
    all_ws = []      # fast path: per-live-level C corner-weight arrays
    live_levels = []
    for li, level in enumerate(spec.levels):
        if max_level is not None and li >= max_level:
            cols.extend(jnp.zeros((B,), dtype=jnp.float32) for _ in range(F))
            continue
        cells, w1s = [], []
        for d in range(D):
            pos = xs[d] * level.scale + 0.5
            cell_f = jnp.floor(pos)
            # (uint32)(int)floorf — wraps negatives exactly like CUDA.
            cells.append(cell_f.astype(jnp.int32).astype(jnp.uint32))
            w1s.append(_interp_weight(pos - cell_f, spec.interpolation))

        # One gather covering all corners: idx laid out corner-major.
        if level.use_hash:
            factors = hash_factors(spec.hash_type, D)
            corner_idx = []
            for c in range(C):
                h = jnp.zeros((B,), jnp.uint32)
                for d in range(D):
                    h = h ^ ((cells[d] + jnp.uint32(corner_bits[c, d]))
                             * jnp.uint32(factors[d]))
                corner_idx.append(h)
        else:
            corner_idx = []
            for c in range(C):
                h = jnp.zeros((B,), jnp.uint32)
                for d in range(D):
                    if level.stride_mask[d]:
                        h = h + ((cells[d] + jnp.uint32(corner_bits[c, d]))
                                 * jnp.uint32(level.strides[d]))
                corner_idx.append(h)
        idx = jnp.concatenate(corner_idx)                       # (C·B,)
        idx = (idx % jnp.uint32(level.size) + jnp.uint32(level.offset)
               ).astype(jnp.int32)
        ws = []
        for c in range(C):
            w = jnp.ones((B,), jnp.float32)
            for d in range(D):
                w = w * (w1s[d] if corner_bits[c, d] else 1.0 - w1s[d])
            ws.append(w)
        if fast_scatter:
            # Defer: one fused gather+scatter over ALL levels below.
            all_idx.append(idx)
            all_ws.extend(ws)
            live_levels.append(li)
        else:
            feats = take_fn(flat, idx).astype(jnp.float32)      # (C·B, F)
            for f in range(F):
                col = jnp.zeros((B,), jnp.float32)
                for c in range(C):
                    col = col + feats[c * B:(c + 1) * B, f] * ws[c]
                cols.append(col)
    if fast_scatter and all_idx:
        live_cols = _grid_interpolate(flat, tuple(all_idx),
                                      tuple(all_ws), (F, C))
        # Re-interleave with any masked-level zero columns.
        it = iter(live_cols)
        live_set = set(live_levels)
        merged = []
        zi = 0
        for li in range(spec.n_levels):
            if li in live_set:
                merged.extend(next(it) for _ in range(F))
            else:
                merged.extend(cols[zi + k] for k in range(F))
                zi += F
        cols = merged
    # Feature-major stack: (L·F, B) — major-dim stacking, no lane
    # shuffles.  The AoS view is one well-optimized XLA transpose.
    out = jnp.stack(cols, axis=0).astype(table.dtype)
    return out if soa else out.T


def init_grid_params(key: jax.Array, spec: GridSpec, scale: float = 1.0,
                     dtype=jnp.float32) -> jax.Array:
    """U(−1e-4, 1e-4)·scale init (grid.h:1059-1062)."""
    return jax.random.uniform(
        key, (spec.n_entries, spec.n_features_per_level), dtype=dtype,
        minval=-1e-4 * scale, maxval=1e-4 * scale)
