"""Cold-compile time audit of the flagship training step (round-5
VERDICT #1: cold start measured 452.6 s vs the ≤60 s bar; this script
answers WHERE the time goes so the fix targets the real cost).

With a FRESH persistent-cache dir it times, for each program:
  trace+lower  (jax tracing + StableHLO emission — pure host python)
  compile      (XLA passes + Mosaic kernel compiles, possibly remote)

Programs, smallest to largest:
  - one mm_gather / mm_scatter class kernel per flagship class
  - fused MLP fwd / bwd
  - the full training step (jit, no scan)
  - the scanned 10-step loop (what bench.py compiles)

Usage: python benchmarks/compile_audit.py [out.json]
Env: CA_SKIP_PIECES=1 to only do step+loop; MB_BATCH to change batch.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

ROWS = []


def timed(label, lower_fn):
    t0 = time.perf_counter()
    lowered = lower_fn()
    t_lower = time.perf_counter() - t0
    text = None
    n_custom = None
    try:
        text = lowered.as_text()
        n_custom = text.count("tpu_custom_call")
        hlo_bytes = len(text)
    except Exception:
        hlo_bytes = None
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    row = {"program": label, "lower_s": round(t_lower, 2),
           "compile_s": round(t_compile, 2),
           "stablehlo_bytes": hlo_bytes,
           "n_pallas_custom_calls": n_custom}
    ROWS.append(row)
    print(json.dumps(row), flush=True)
    return row


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "benchmarks/logs/compile_audit.json"
    cache = os.environ.get("TCNN_TPU_CACHE_DIR") or tempfile.mkdtemp(
        prefix="jaxcache_audit_")
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import tcnn_tpu as tcnn
    from tcnn_tpu.ops import grid_ops
    from tcnn_tpu.ops.pallas import grid_matmul as gm

    t0 = time.perf_counter()
    dev = jax.devices()[0]
    init_s = time.perf_counter() - t0
    print(f"device {dev} init {init_s:.1f}s cache={cache}", flush=True)

    B = int(os.environ.get("MB_BATCH", 1 << 18))
    model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                    policy=tcnn.BF16_POLICY)
    tr = model.trainer
    state = tr.initial_state()
    tgt = jax.random.uniform(jax.random.key(1), (B, 3))

    if not os.environ.get("CA_SKIP_PIECES"):
        # Per-class kernels, standalone.
        spec = model.network.encoding.spec
        lv_meta = tuple(((not lv.use_hash), lv.size, lv.offset, False)
                        for lv in spec.levels)
        f, c = spec.n_features_per_level, 1 << spec.n_dims
        flat = jnp.zeros((spec.n_params,), jnp.bfloat16)
        mm, _ = grid_ops._route_levels((f, c, lv_meta), jnp.bfloat16, B)
        for levels, r_pad, mg, pr in grid_ops._mm_class_plan(
                lv_meta, mm, "scatter", 1):
            lg = len(levels)
            idx = jnp.zeros((lg * c, B), jnp.int32)
            w = jnp.zeros((lg * c, B), jnp.float32)
            dc = jnp.zeros((lg * f, B), jnp.float32)
            sizes = tuple(lv_meta[i][1] for i in levels)
            offs = tuple(lv_meta[i][2] for i in levels)

            def sc(idx, w, dc):
                return gm.mm_scatter(idx, w, dc, sizes, offs, f, c, r_pad,
                                     spec.n_params, "bfloat16", mg, pr)

            timed(f"mm_scatter r_pad={r_pad} lg={lg}",
                  lambda: jax.jit(sc).lower(idx, w, dc))

            def ga(flat, idx, w):
                return gm.mm_gather(flat, idx, w, sizes, offs, f, c,
                                    r_pad, mg, pr)

            timed(f"mm_gather r_pad={r_pad} lg={lg}",
                  lambda: jax.jit(ga).lower(flat, idx, w))

        # MLP fwd/bwd.
        from tcnn_tpu.models.networks.fused_mlp import FusedMLP
        net = FusedMLP(32, 3, n_neurons=64, n_hidden_layers=2,
                       policy=tcnn.BF16_POLICY)
        mp = net.init(jax.random.key(2))
        xm = jnp.zeros((B, 32), jnp.float32)
        timed("mlp fwd", lambda: jax.jit(
            lambda p, x: net.apply(p, x)).lower(mp, xm))
        timed("mlp fwd+bwd", lambda: jax.jit(jax.grad(
            lambda p, x: jnp.sum(net.apply(p, x).astype(jnp.float32))))
            .lower(mp, xm))

    # Full training step (one step, jitted).
    x = jnp.zeros((B, 2), jnp.float32)
    timed("full step (no scan)", lambda: jax.jit(
        lambda s, x, t: tr._training_step(s, x, t, None)).lower(
            state, x, tgt))

    # Scanned 10-step loop: what bench.py compiles.
    def loop(s, key):
        def body(carry, i):
            xx = jax.random.uniform(jax.random.fold_in(key, i), (B, 2))
            carry, loss = tr._training_step(carry, xx, tgt, None)
            return carry, loss

        import jax as _j
        return _j.lax.scan(body, s, jnp.arange(10))

    timed("scan-10 loop", lambda: jax.jit(loop).lower(
        state, jax.random.key(0)))

    res = {"device": str(dev), "init_s": round(init_s, 1),
           "cache_dir": cache, "batch": B, "rows": ROWS}
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fo:
        json.dump(res, fo, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
