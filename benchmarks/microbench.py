"""Scan-slope microbenchmarks — trustworthy op timing on the tunnel.

On the axon tunnel, (a) jax.block_until_ready reports enqueue, not
completion, and (b) every dispatch round-trips argument/output buffers
at ~100-350 MB/s.  The only honest timing is to repeat the op K times
INSIDE one compiled dispatch (lax.scan with a data dependency), fetch a
scalar, and fit time(K) = fixed + K·per_op over two K values.

Usage: python benchmarks/microbench.py [op ...]
Ops: step grid_fwd grid_bwd mlp adam loss gather scatter all
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np


def fetch(x):
    import jax

    return float(np.asarray(jax.device_get(x)).ravel()[0])


def slope(make_loop, ks=(4, 16), label=""):
    """make_loop(K) -> jitted fn(key) -> scalar-ish; returns per-op s."""
    times = {}
    for k in ks:
        f = make_loop(k)
        import jax

        fetch(f(jax.random.key(0)))  # compile+warm
        t0 = time.time()
        fetch(f(jax.random.key(1)))
        times[k] = time.time() - t0
    per = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    fixed = times[ks[0]] - ks[0] * per
    print(f"{label}: {per * 1e3:.2f} ms/op (fixed {fixed * 1e3:.0f} ms)",
          flush=True)
    return per


def main(which):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tcnn_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import tcnn_tpu as tcnn
    from tcnn_tpu.common import HashType
    from tcnn_tpu.ops import grid_ops

    B = int(os.environ.get("MB_BATCH", 1 << 18))
    spec = grid_ops.make_grid_spec(2, 16, 2, 15, 16, 1.5,
                                   hash_type=HashType.COHERENT_ADD)
    table = grid_ops.init_grid_params(jax.random.key(0), spec)
    model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                    policy=tcnn.BF16_POLICY)
    tr = model.trainer
    state = tr.initial_state()

    def scan_over(body, K, init):
        def run(key):
            def step(carry, i):
                return body(carry, jax.random.fold_in(key, i)), None

            out, _ = jax.lax.scan(step, init, jnp.arange(K))
            return jax.tree_util.tree_leaves(out)[0].ravel()[0]

        return jax.jit(run)

    if "step" in which or "all" in which:
        t = jax.random.uniform(jax.random.key(1), (B, 3))

        def body(st, key):
            x = jax.random.uniform(key, (B, 2))
            st, _ = tr._training_step(st, x, t, None)
            return st

        slope(lambda K: scan_over(body, K, state), label=f"train step B={B}")

    if "grid_fwd" in which or "all" in which:
        def body(c, key):
            x = jax.random.uniform(key, (B, 2))
            y = grid_ops.grid_encode(spec, table, x)
            return c + jnp.sum(y.astype(jnp.float32))

        slope(lambda K: scan_over(body, K, jnp.float32(0)),
              label=f"grid fwd B={B}")

    if "grid_bwd" in which or "all" in which:
        def body(tb, key):
            x = jax.random.uniform(key, (B, 2))
            g = jax.grad(lambda tb: jnp.sum(
                grid_ops.grid_encode(spec, tb, x).astype(jnp.float32)))(tb)
            return tb + 1e-9 * g

        slope(lambda K: scan_over(body, K, table), label=f"grid fwd+bwd B={B}")

    if "mlp" in which or "all" in which:
        from tcnn_tpu.common import Activation
        from tcnn_tpu.ops.pallas import fused_mlp as kmod

        ws = [jax.random.normal(jax.random.key(2), (32, 64)) * 0.1,
              jax.random.normal(jax.random.key(3), (64, 64)) * 0.1,
              jax.random.normal(jax.random.key(4), (64, 16)) * 0.1]

        def body(ws, key):
            x = jax.random.uniform(key, (B, 32))
            g = jax.grad(lambda ws: kmod.fused_mlp_apply(
                ws, x, activation=Activation.RELU,
                output_activation=Activation.NONE).sum())(list(ws))
            return tuple(w + 1e-9 * gw for w, gw in zip(ws, g))

        slope(lambda K: scan_over(body, K, tuple(ws)),
              label=f"pallas MLP fwd+bwd B={B}")

    if "adam" in which or "all" in which:
        _, grads = tr.loss_value_and_grads(
            state.params, jax.random.uniform(jax.random.key(5), (B, 2)),
            jax.random.uniform(jax.random.key(6), (B, 3)))

        def body(carry, key):
            os_, p = carry
            # Vary the grads per iteration (a loop-invariant optimizer
            # step would be hoisted out of the scan by XLA).
            s = jax.random.uniform(key, ())
            g = jax.tree_util.tree_map(lambda a: a * s, grads)
            os_, p = tr.optimizer.step(os_, g, p)
            return (os_, p)

        slope(lambda K: scan_over(body, K, (state.opt_state, state.params)),
              label="adam step")

    if "loss" in which or "all" in which:
        t = jax.random.uniform(jax.random.key(1), (B, 3))

        def body(c, key):
            p = jax.random.uniform(key, (B, 3))
            return c + tr.loss(p, t)

        slope(lambda K: scan_over(body, K, jnp.float32(0)),
              label=f"loss B={B}")

    if "gather" in which or "all" in which:
        N = spec.n_entries
        M = B * 4 * 16

        def body(c, key):
            idx = jax.random.randint(key, (M,), 0, N, jnp.int32)
            return c + jnp.sum(jnp.take(table, idx, axis=0).astype(jnp.float32))

        slope(lambda K: scan_over(body, K, jnp.float32(0)), ks=(2, 6),
              label=f"XLA take {M} rows")

    if "scatterw" in which or "all" in which:
        from tcnn_tpu.ops.pallas.scatter import scatter_add_weighted

        N = spec.n_entries
        L_, C_ = 16, 4
        M = B * C_ * L_
        w = jax.random.uniform(jax.random.key(8), (M,))
        dc = jax.random.normal(jax.random.key(9), (L_ * 2, B))

        def body(c, key):
            idx = jax.random.randint(key, (M,), 0, N, jnp.int32)
            out = scatter_add_weighted(idx, w * c, dc, N, 2, C_)
            return c + 1e-12 * jnp.sum(out)

        slope(lambda K: scan_over(body, K, jnp.float32(1)), ks=(2, 6),
              label=f"pallas weighted scatter {M} rows")

    if "scatter" in which or "all" in which:
        from tcnn_tpu.ops.pallas.scatter import scatter_add_rows

        N = spec.n_entries
        M = B * 4 * 16
        g = jax.random.normal(jax.random.key(7), (M, 2))

        def body(c, key):
            idx = jax.random.randint(key, (M,), 0, N, jnp.int32)
            out = scatter_add_rows(idx, g * c, N)
            return c + 1e-12 * jnp.sum(out)

        slope(lambda K: scan_over(body, K, jnp.float32(1)), ks=(2, 6),
              label=f"pallas scatter {M} rows")


def main2(which):
    """Composition variants: where does step − (grid_bwd + mlp) go?"""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tcnn_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import tcnn_tpu as tcnn
    from tcnn_tpu.common import HashType
    from tcnn_tpu.ops import grid_ops

    B = int(os.environ.get("MB_BATCH", 1 << 18))
    spec = grid_ops.make_grid_spec(2, 16, 2, 15, 16, 1.5,
                                   hash_type=HashType.COHERENT_ADD)
    table = grid_ops.init_grid_params(jax.random.key(0), spec).reshape(-1)
    model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                    policy=tcnn.BF16_POLICY)
    tr = model.trainer
    state = tr.initial_state()
    t3 = jax.random.uniform(jax.random.key(1), (B, 3))

    def scan_over(body, K, init):
        def run(key):
            def step(carry, i):
                return body(carry, jax.random.fold_in(key, i)), None

            out, _ = jax.lax.scan(step, init, jnp.arange(K))
            return jax.tree_util.tree_leaves(out)[0].ravel()[0]

        return jax.jit(run)

    if "gradfull" in which or "all2" in which:
        def body(p, key):
            x = jax.random.uniform(key, (B, 2))
            _, g = tr.loss_value_and_grads(p, x, t3)
            return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b, p, g)

        slope(lambda K: scan_over(body, K, state.params),
              label=f"loss_value_and_grads B={B}")

    if "gridloss" in which or "all2" in which:
        # grid -> loss directly (no MLP): isolates grid+loss coupling.
        def body(tb, key):
            x = jax.random.uniform(key, (B, 2))

            def f(tb):
                y = grid_ops.grid_encode(spec, tb, x).astype(jnp.float32)
                return jnp.sum((y[:, :3] - t3) ** 2)

            g = jax.grad(f)(tb)
            return tb + 1e-9 * g

        slope(lambda K: scan_over(body, K, table),
              label=f"grid->loss grad B={B}")

    if "gridsoa" in which or "all2" in which:
        # Forward with the SoA output FORCED to materialize (the fused
        # consumer case) — isolates the producer-side layout cost that
        # plain sum-fusion benches hide.
        def body(c, key):
            x = jax.random.uniform(key, (B, 2))
            y = grid_ops.grid_encode(spec, table, x, soa=True)
            y = jax.lax.optimization_barrier(y)
            return c + jnp.sum(y.astype(jnp.float32))

        slope(lambda K: scan_over(body, K, jnp.float32(0)),
              label=f"grid fwd soa+materialize B={B}")

    if "gridbwdmat" in which or "all2" in which:
        # Backward with a REAL (data-dependent) cotangent, no transpose:
        # cotangent = y itself (d sum(y²)/dy = 2y), still SoA layout.
        def body(tb, key):
            x = jax.random.uniform(key, (B, 2))

            def f(tb):
                y = grid_ops.grid_encode(spec, tb, x, soa=True)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            g = jax.grad(f)(tb)
            return tb + 1e-9 * g

        slope(lambda K: scan_over(body, K, table.reshape(-1)),
              label=f"grid fwd+bwd real-cotangent soa B={B}")

    if "transpose" in which or "all2" in which:
        # Cost of one (B, 32) -> (32, B) relayout at this batch.
        y0 = jax.random.normal(jax.random.key(8), (B, 32))

        def body(c, key):
            y = y0 * c
            yt = jax.lax.optimization_barrier(y).T
            yt = jax.lax.optimization_barrier(yt)
            return c + 1e-12 * jnp.sum(yt)

        slope(lambda K: scan_over(body, K, jnp.float32(1)),
              label=f"transpose (B,32)->(32,B) B={B}")

    if "gridmlp" in which or "all2" in which:
        # grid -> fused MLP -> sum: the model composition without loss.
        net = model.network

        def body(p, key):
            x = jax.random.uniform(key, (B, 2))

            def f(p):
                return jnp.sum(net.apply(p, x).astype(jnp.float32))

            g = jax.grad(f)(p)
            return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b, p, g)

        slope(lambda K: scan_over(body, K, state.params),
              label=f"grid->MLP grad B={B}")


if __name__ == "__main__":
    args = sys.argv[1:] or ["all"]
    main(args)
    main2(args)
