"""GridEncoding module — Hash / Dense / Tiled multiresolution grids.

Module wrapper over :mod:`tcnn_tpu.ops.grid_ops` (the jnp compute path)
with an optional Pallas fast path for forward/inference.  Config schema
matches the reference factory (grid.h:1143-1208, DOCUMENTATION.md
"Grid"): aliases HashGrid/DenseGrid/TiledGrid select the grid type.

Unlike the reference this supports any n_pos_dims ≤ 7 and any
n_features_per_level (the reference templates over {1,2,4,8} × {2,3,4}
— the fork notably enables 4-D grids for BTF inputs,
grid.h:1174-1180).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...common import GridType, HashType, InterpolationType, Policy
from ...module import Encoding
from ...ops import grid_ops
from ...registry import register_encoding


class GridEncoding(Encoding):
    def __init__(
        self,
        n_dims_to_encode: int,
        n_levels: int = 16,
        n_features_per_level: int = 2,
        log2_hashmap_size: int = 19,
        base_resolution: int = 16,
        per_level_scale: float = 2.0,
        grid_type: GridType = GridType.HASH,
        hash_type: HashType = HashType.COHERENT_PRIME,
        interpolation: InterpolationType = InterpolationType.LINEAR,
        stochastic_interpolation: bool = False,
        policy: Optional[Policy] = None,
    ):
        super().__init__(policy)
        self.spec = grid_ops.make_grid_spec(
            n_dims=n_dims_to_encode,
            n_levels=n_levels,
            n_features_per_level=n_features_per_level,
            log2_hashmap_size=log2_hashmap_size,
            base_resolution=base_resolution,
            per_level_scale=per_level_scale,
            grid_type=grid_type,
            hash_type=hash_type,
            interpolation=interpolation,
            # Stochastic interpolation routes each (sample, level)
            # gradient to ONE probability-selected corner
            # (grid.h:284-299) — implemented with a fixed counter seed,
            # so it stays deterministic across runs (unlike the
            # reference's device RNG + atomics).
            stochastic_interpolation=stochastic_interpolation,
        )
        self.log2_hashmap_size = log2_hashmap_size
        self.base_resolution = base_resolution
        self.per_level_scale = per_level_scale
        self.n_input_dims = n_dims_to_encode
        self.n_output_dims = self.spec.n_output_dims
        self.max_level: Optional[int] = None  # static level cutoff

    # -- parameters ---------------------------------------------------
    def init(self, key):
        # FLAT (n_entries·F,) storage: compact 1-D TPU layout — a skinny
        # (N, F) param would lane-pad 128/F× and tax every optimizer
        # pass over it (and its mu/nu/step state) by the same factor.
        return {"grid": grid_ops.init_grid_params(
            key, self.spec, dtype=self.policy.param_dtype).reshape(-1)}

    def param_layout(self, params):
        # Hash tables are "non-matrix" params: Adam applies
        # non_matrix_learning_rate_factor and lazy stepping to them
        # (adam.h:76-118), and no L2 reg.
        return {"grid": "other"}

    def n_params(self, params=None):
        return self.spec.n_params

    def grid_specs(self, prefix: tuple = ()) -> dict:
        return {prefix + ("grid",): self.spec}

    def level_params_offset(self, level: int) -> int:
        if level >= self.spec.n_levels:
            return self.spec.n_entries * self.spec.n_features_per_level
        return self.spec.levels[level].offset * self.spec.n_features_per_level

    def level_n_params(self, level: int) -> int:
        return self.spec.levels[level].size * self.spec.n_features_per_level

    # -- compute ------------------------------------------------------
    # SoA (feature-major) output is this encoding's native layout —
    # mirrors the reference's preferred_output_layout=SoA
    # (grid.h:1053-1055); consumers that accept it (FusedMLP) avoid an
    # expensive minor-dim assembly of the (B, L·F) view.
    prefers_soa = True

    def apply(self, params, x, soa: bool = False,
              max_level_per_element=None):
        """``max_level_per_element``: optional traced (B,) float level
        fractions — the reference's per-element ``max_level_gpu``
        coarse-to-fine masking (grid.h:69-92)."""
        table = params["grid"]
        if self.policy.compute_dtype == jnp.bfloat16:
            # bf16 compute copy of the table — the reference trains
            # with fp16 compute params cast from the fp32 masters
            # (trainer.h:68-87); on TPU this also halves the matmul
            # kernels' value passes (P=1).  Gradients flow through the
            # cast back to the fp32 masters.
            table = table.astype(jnp.bfloat16)
        y = grid_ops.grid_encode(self.spec, table, x,
                                 max_level=self.max_level, soa=soa,
                                 max_level_per_element=max_level_per_element)
        return y.astype(self.policy.compute_dtype)

    def required_output_alignment(self) -> int:
        return self.spec.n_features_per_level

    def hyperparams(self) -> Dict[str, Any]:
        return {
            "otype": "Grid",
            "type": self.spec.grid_type.value,
            "n_levels": self.spec.n_levels,
            "n_features_per_level": self.spec.n_features_per_level,
            "log2_hashmap_size": self.log2_hashmap_size,
            "base_resolution": self.base_resolution,
            "per_level_scale": self.per_level_scale,
            "interpolation": self.spec.interpolation.value,
            "hash": self.spec.hash_type.value,
        }


def _make_grid(n_dims: int, cfg: Dict[str, Any], default_type: str = "Hash",
               policy: Optional[Policy] = None) -> GridEncoding:
    grid_type = GridType.from_string(cfg.get("type", default_type))
    f = cfg.get("n_features_per_level", 2)
    # "n_features"/"n_grid_features": TOTAL feature count determining
    # n_levels (grid.h:1150-1157); exclusive with "n_levels".
    if "n_features" in cfg or "n_grid_features" in cfg:
        if "n_levels" in cfg:
            raise ValueError(
                "GridEncoding: may not specify n_features and n_levels "
                "simultaneously (one determines the other)")
        n_levels = cfg.get("n_features", cfg.get("n_grid_features")) // f
    else:
        n_levels = cfg.get("n_levels", 16)
    base_resolution = cfg.get("base_resolution", 16)
    # Dense grids default to a scale spanning base->256 over the levels
    # (grid.h:1167); everything else defaults to 2.
    default_scale = (math.exp(math.log(256.0 / base_resolution)
                              / max(n_levels - 1, 1))
                     if grid_type == GridType.DENSE else 2.0)
    return GridEncoding(
        n_dims_to_encode=n_dims,
        n_levels=n_levels,
        n_features_per_level=f,
        log2_hashmap_size=cfg.get("log2_hashmap_size", 19),
        base_resolution=base_resolution,
        per_level_scale=cfg.get("per_level_scale", default_scale),
        grid_type=grid_type,
        hash_type=HashType.from_string(cfg.get("hash", "CoherentPrime")),
        interpolation=InterpolationType.from_string(
            cfg.get("interpolation", "Linear")),
        stochastic_interpolation=cfg.get("stochastic_interpolation", False),
        policy=policy,
    )


register_encoding(
    "Grid", lambda n, cfg, policy=None: _make_grid(n, cfg, "Hash", policy))
register_encoding(
    "HashGrid", lambda n, cfg, policy=None: _make_grid(n, cfg, "Hash", policy))
register_encoding(
    "DenseGrid", lambda n, cfg, policy=None: _make_grid(n, cfg, "Dense", policy))
register_encoding(
    "TiledGrid", lambda n, cfg, policy=None: _make_grid(n, cfg, "Tiled", policy))
