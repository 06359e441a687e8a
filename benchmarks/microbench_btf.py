"""BTF-geometry step decomposition + serial-route A/B on real TPU.

Round-5 VERDICT #2: the fork's motivating workload (4-D CoherentAdd
HashGrid, log2_hashmap=19 → 15 serial 2^19-row levels + OneBlob,
`configs/config_btf.json`) measured 1256 ms/step in round 4 with no
decomposition.  Code reading found the cause — the serial scatter was
called ONCE over the whole 7.7M-row table, whose VMEM accumulator
cannot fit, so `_pick_n_acc` silently routed the ENTIRE backward to
XLA's serialized scatter (~68 ns/row × 15.7M updates ≈ 1.1 s) — fixed
by VMEM-budget level grouping (grid_ops._serial_level_groups).  This
bench is the measured proof + the per-stage roofline at this geometry.

Rows (scan-slope protocol, median of MB_REPS ≥ 3):
  * idx+weights build (6-D composite: 4-D grid + OneBlob)
  * grid fwd only                (gather: XLA paired take route)
  * grid fwd+bwd                 (adds the grouped serial pair scatter)
  * full training step
  * synthetic: XLA paired take rate at 2^19 rows (ns/pair)
  * synthetic: grouped pair-scatter rate (ns/pair)

Floor arithmetic (ROOFLINE.md BTF section): Mp = B·15·2^(D-1) =
65536·15·8 = 7.86M pairs/direction; serial pair kernels measured
~14 ns/pair at flagship scale ⇒ ~110 ms scatter; forward take at the
measured XLA gather rate.  The step target from the VERDICT: ≤ ~300 ms
(≥ 200k samples/s) or a measured account of what resists.

Usage: python benchmarks/microbench_btf.py [all|profile|ab] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np

from microbench_r3 import fetch, slope, PROFILE_ROWS


def main(which="all", out=None):
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("TCNN_TPU_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax_comp")))
    import jax.numpy as jnp

    import tcnn_tpu as tcnn
    from tcnn_tpu.ops import grid_ops

    os.environ.setdefault("MB_REPS", "3")
    B = int(os.environ.get("MB_BATCH", 1 << 16))
    out = out or os.path.join(os.path.dirname(__file__), "logs",
                              "btf_decomposition.json")

    # The grid half of config_btf.json, standalone (4-D CoherentAdd).
    from tcnn_tpu.common import HashType

    spec = grid_ops.make_grid_spec(4, 16, 2, 19, 16, 1.5,
                                   hash_type=HashType.COHERENT_ADD)
    table = grid_ops.init_grid_params(jax.random.key(0), spec) \
        .reshape(-1).astype(jnp.bfloat16)
    lv_meta = tuple((True, lv.size, lv.offset) for lv in spec.levels)
    mm, serial = grid_ops._route_levels((2, 16, lv_meta), jnp.bfloat16, B)
    groups = grid_ops._serial_level_groups(lv_meta, serial, 2, True)
    print(f"BTF grid: rows={spec.n_entries} B={B} mm={mm} "
          f"serial groups={[len(g) for g in groups]}", flush=True)

    def scan_over(body, K, init, *consts):
        def run(key, init, *consts):
            def step(carry, i):
                return body(carry, jax.random.fold_in(key, i),
                            *consts), None

            o, _ = jax.lax.scan(step, init, jnp.arange(K))
            return jax.tree_util.tree_leaves(o)[0].ravel()[0]

        jitted = jax.jit(run)
        return lambda key: jitted(key, init, *consts)

    ks = (2, 6)

    if which in ("all", "profile"):
        live = list(range(spec.n_levels))

        def body_idx(c, key):
            x = jax.random.uniform(key, (B, 4))
            idx, ws, _ = grid_ops._build_indices_weights(spec, x, live)
            return c + jnp.sum(idx[0, :1].astype(jnp.float32)) + ws[0, 0]

        slope(lambda K: scan_over(body_idx, K, jnp.float32(0)), ks=ks,
              label="idx+weights build (4-D)")

        def body_fwd(c, key, tab):
            x = jax.random.uniform(key, (B, 4))
            y = grid_ops.grid_encode(spec, tab, x, fast_scatter=True)
            return c + jnp.sum(y.astype(jnp.float32))

        slope(lambda K: scan_over(body_fwd, K, jnp.float32(0), table),
              ks=ks, label="grid fwd (paired XLA take)")

        def body_bwd(tb, key):
            x = jax.random.uniform(key, (B, 4))

            def loss(t):
                y = grid_ops.grid_encode(spec, t, x, fast_scatter=True)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            return tb + jnp.bfloat16(1e-3) * jax.grad(loss)(tb)

        slope(lambda K: scan_over(body_bwd, K, table), ks=ks,
              label="grid fwd+bwd (grouped pair scatter)")

        # Full training step on the exact config_btf.json model.
        model = tcnn.create_from_config(
            6, 3, os.path.join(os.path.dirname(__file__), "..", "configs",
                               "config_btf.json"),
            policy=tcnn.BF16_POLICY)
        tr = model.trainer
        state = tr.initial_state()
        t = jax.random.uniform(jax.random.key(1), (B, 3))

        def body_step(st, key, t):
            x = jax.random.uniform(key, (B, 6))
            st, _ = tr._training_step(st, x, t, None)
            return st

        slope(lambda K: scan_over(body_step, K, state, t), ks=ks,
              label=f"full BTF step B={B}")

    if which in ("all", "ab"):
        # Synthetic rates at the BTF table scale, one serial GROUP
        # (pairs at uniform rows of a group-sized table).
        from tcnn_tpu.ops.pallas.scatter import (max_group_rows,
                                                 scatter_add_weighted_pairs)

        g_rows = min(max_group_rows(2, True), 4 * (1 << 19))
        g_rows -= g_rows % (1 << 19)
        n_lvl_g = g_rows >> 19
        mp = n_lvl_g * 8 * B
        idx_e = jax.random.randint(jax.random.key(3), (mp,), 0,
                                   g_rows - 1, jnp.int32)
        dc = jax.random.normal(jax.random.key(4),
                               (n_lvl_g * 2, B), jnp.float32)
        w = jax.random.uniform(jax.random.key(5), (mp,), jnp.float32)

        def body_sc(c, key, idx_e, w, dc):
            o = scatter_add_weighted_pairs(idx_e, w + c * 0, w, dc,
                                           g_rows, 2, 8)
            return c + o[0]

        per = slope(lambda K: scan_over(body_sc, K, jnp.float32(0),
                                        idx_e, w, dc), ks=ks,
                    label=f"pair-scatter kernel alone ({n_lvl_g} lvls, "
                          f"{mp / 1e6:.1f}M pairs)")
        if per:
            print(f"  -> {per / mp * 1e9:.2f} ns/pair", flush=True)

        # XLA paired take rate at the same scale.
        tab2 = jax.random.normal(jax.random.key(6), (g_rows // 2, 4),
                                 jnp.bfloat16)
        j = jax.random.randint(jax.random.key(7), (mp,), 0,
                               g_rows // 2 - 1, jnp.int32)

        def body_take(c, key, tab2, j):
            j2 = j + (c * 0).astype(jnp.int32)
            rows = jnp.take(tab2, j2, axis=0)
            return c + jnp.sum(rows[:1].astype(jnp.float32))

        per = slope(lambda K: scan_over(body_take, K, jnp.float32(0),
                                        tab2, j), ks=ks,
                    label=f"XLA paired take alone ({mp / 1e6:.1f}M rows)")
        if per:
            print(f"  -> {per / mp * 1e9:.2f} ns/row-pair", flush=True)

    res = {
        "batch": B,
        "route": {"mm": mm, "serial_group_sizes": [len(g) for g in groups]},
        "rows": PROFILE_ROWS,
        "device": str(jax.devices()[0]),
        "producing_commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True,
            text=True).stdout.strip(),
    }
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all",
         sys.argv[2] if len(sys.argv) > 2 else None)
