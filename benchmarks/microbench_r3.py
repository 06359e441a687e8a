"""Round-3 microbench: grid gather/scatter design shoot-out on real TPU.

Measures, at the flagship geometry (HashGrid L16 F2 hashmap=2^15,
B=2^18), each of the candidate reduction architectures against each
other (VERDICT round-2 asked for at least two implemented + measured):

  fwd:  take-paired gather (round-2)  vs  MXU matmul gather (round-3)
  bwd:  serial pair scatter (round-2) vs  MXU matmul scatter (round-3)
                                      vs  sort+segment-sum (XLA)
  step: full training step with each routing

Timing protocol per the axon-tunnel rules: K reps inside ONE dispatch
(lax.scan with data dependency), scalar readback, slope over two Ks.
Usage:  python benchmarks/microbench_r3.py [fwd|bwd|sort|step|all]
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


def sort_segment_scatter(idx, g, n_rows):
    """Design candidate (b) — now a shared op so the end-to-end grid
    route (TCNN_TPU_SCATTER=sortseg) and this standalone bench measure
    the same code."""
    from tcnn_tpu.ops.sort_scatter import sort_segment_scatter as impl

    return impl(idx, g, n_rows)


def main(which):
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # TCNN_TPU_CACHE_DIR=<tmpdir> gives a cold cache for compile-time
    # probes (tpu_session.sh step 4b).
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("TCNN_TPU_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax_comp")))
    import jax.numpy as jnp

    import tcnn_tpu as tcnn
    from tcnn_tpu.common import HashType
    from tcnn_tpu.ops import grid_ops

    B = int(os.environ.get("MB_BATCH", 1 << 18))
    spec = grid_ops.make_grid_spec(2, 16, 2, 15, 16, 1.5,
                                   hash_type=HashType.COHERENT_ADD)
    spec_prime = grid_ops.make_grid_spec(2, 16, 2, 15, 16, 1.5,
                                         hash_type=HashType.COHERENT_PRIME)
    table = grid_ops.init_grid_params(jax.random.key(0), spec).reshape(-1)
    if os.environ.get("MB_TABLE") == "bf16":
        # Inference-relevant variant: bf16 compute tables (P=1), the
        # dtype the bf16-policy model feeds grid_encode.
        table = table.astype(jnp.bfloat16)
    print(f"table rows={spec.n_entries} B={B} dtype={table.dtype}",
          flush=True)

    def scan_over(body, K, init):
        def run(key):
            def step(carry, i):
                return body(carry, jax.random.fold_in(key, i)), None

            out, _ = jax.lax.scan(step, init, jnp.arange(K))
            return jax.tree_util.tree_leaves(out)[0].ravel()[0]

        return jax.jit(run)

    def set_mm(mode):
        """mode: True/'mm', False/'serial', 'mmp' (mm + paired), or
        'sortseg' (end-to-end sort+segment-sum backward route)."""
        os.environ.pop("TCNN_TPU_DISABLE_MM", None)
        os.environ.pop("TCNN_TPU_MM_PAIRED", None)
        os.environ.pop("TCNN_TPU_SCATTER", None)
        if mode in (False, "serial"):
            os.environ["TCNN_TPU_DISABLE_MM"] = "1"
        elif mode == "mmp":
            os.environ["TCNN_TPU_MM_PAIRED"] = "1"
        elif mode == "sortseg":
            os.environ["TCNN_TPU_SCATTER"] = "sortseg"

    # Variant selection via MB_VARIANTS (comma list of
    # {add,prime}_{mm,mmp,serial,sortseg}; mmp = pair-packed matmul
    # kernels, sortseg = sort+segment-sum backward).
    # Default keeps the compile count low — remote compiles cost
    # minutes each on the tunnel.
    variants = os.environ.get("MB_VARIANTS", "prime_mm,add_serial").split(",")

    def variant_list():
        out = []
        for v in variants:
            name, mode = v.split("_")
            sp = {"add": spec, "prime": spec_prime}[name]
            out.append((v, sp, mode))
        return out

    if which in ("fwd", "all"):
        for vname, sp, mm in variant_list():
            set_mm(mm)

            def body(c, key):
                x = jax.random.uniform(key, (B, 2))
                y = grid_ops.grid_encode(sp, table, x, fast_scatter=True)
                return c + jnp.sum(y.astype(jnp.float32))

            slope(lambda K: scan_over(body, K, jnp.float32(0)),
                  label=f"grid fwd {vname}")
        set_mm(True)

    if which in ("bwd", "all"):
        for vname, sp, mm in variant_list():
            set_mm(mm)

            def body(tb, key):
                x = jax.random.uniform(key, (B, 2))

                def loss(t):
                    y = grid_ops.grid_encode(sp, t, x, fast_scatter=True)
                    return jnp.sum(y.astype(jnp.float32) ** 2)

                return tb + 1e-3 * jax.grad(loss)(tb)

            slope(lambda K: scan_over(body, K, table),
                  label=f"grid fwd+bwd {vname}")
        set_mm(True)

    if which in ("sort", "all"):
        # Sort+segment candidate, hash levels only (10 levels x C*B).
        m = 10 * 4 * B
        idx = jax.random.randint(jax.random.key(3), (m,), 0,
                                 spec.n_entries, jnp.int32)
        g = jax.random.normal(jax.random.key(4), (m, 2))

        def body(c, key):
            i2 = idx ^ jax.random.randint(key, (), 0, 4, jnp.int32)
            out = sort_segment_scatter(i2, g, spec.n_entries)
            return c + out.ravel()[0]

        slope(lambda K: scan_over(body, K, jnp.float32(0)), ks=(2, 6),
              label=f"sort+segment scatter m={m}")

    if which == "profile":
        # Decompose the flagship step: index/weight build, grid fwd,
        # grid fwd+bwd, MLP fwd+bwd, Adam, loss+grad, full step.  Each
        # stage via the same scan-slope protocol; differences between
        # consecutive rows localize the cost.
        from tcnn_tpu.models.networks.fused_mlp import FusedMLP

        sp = spec_prime
        live = list(range(sp.n_levels))

        def body_idx(c, key):
            x = jax.random.uniform(key, (B, 2))
            idx, ws, _ = grid_ops._build_indices_weights(sp, x, live)
            return c + jnp.sum(idx[0, :1].astype(jnp.float32)) + ws[0, 0]

        slope(lambda K: scan_over(body_idx, K, jnp.float32(0)),
              label="idx+weights build")

        net = FusedMLP(32, 3, n_neurons=64, n_hidden_layers=2,
                       policy=tcnn.BF16_POLICY)
        mlp_params = net.init(jax.random.key(2))
        xm = jax.random.normal(jax.random.key(5), (B, 32))

        def body_mlp(c, key):
            xk = xm + c                      # genuine carry dependency

            def loss(p):
                return jnp.sum(net.apply(p, xk).astype(jnp.float32))

            g = jax.grad(loss)(mlp_params)
            return c + 0.0 * g["layers"][0].astype(jnp.float32).ravel()[0]

        slope(lambda K: scan_over(body_mlp, K, jnp.float32(0)),
              label="MLP fwd+bwd (B,32)->3")

        model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                        policy=tcnn.BF16_POLICY)
        tr = model.trainer
        state = tr.initial_state()
        t = jax.random.uniform(jax.random.key(1), (B, 3))

        def body_fwd_only(c, key):
            # Forward+loss only: grads deliberately unused, so XLA
            # dead-code-eliminates the whole backward.
            x = jax.random.uniform(key, (B, 2))
            loss, _ = tr.loss_value_and_grads(state.params, x, t,
                                              None, step=state.step)
            return c + loss

        slope(lambda K: scan_over(body_fwd_only, K, jnp.float32(0)),
              label="fwd+loss only (bwd DCE'd)")

        def body_loss(st, key):
            # Grads CONSUMED via a parameter update so the backward
            # survives DCE (the round-3 artifact's 'loss+grads' row
            # silently measured forward-only — grads fed nothing).
            x = jax.random.uniform(key, (B, 2))
            loss, grads = tr.loss_value_and_grads(st.params, x, t,
                                                  None, step=st.step)
            new_params = jax.tree_util.tree_map(
                lambda p, g: (p.astype(jnp.float32)
                              - 1e-9 * g.astype(jnp.float32)).astype(p.dtype),
                st.params, grads)
            import tcnn_tpu

            return tcnn_tpu.trainer.TrainerState(
                params=new_params, opt_state=st.opt_state,
                step=st.step + 1)

        slope(lambda K: scan_over(body_loss, K, state),
              label="loss+grads (no opt)")

        def body_opt(st, key):
            # Optimizer in isolation: synthetic grads derived from the
            # carry (data dependency) with the params' own pytree
            # structure; localizes the full-step minus loss+grads gap.
            g = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.float32) * 1e-6, st.params)
            opt_state, params = tr.optimizer.step(st.opt_state, g,
                                                  st.params)
            import tcnn_tpu

            return tcnn_tpu.trainer.TrainerState(
                params=params, opt_state=opt_state, step=st.step + 1)

        slope(lambda K: scan_over(body_opt, K, state),
              label="optimizer.step only")

        step_fn = tr.step_fn()

        def body_step(st, key):
            x = jax.random.uniform(key, (B, 2))
            st, _ = step_fn(st, x, t)
            return st

        slope(lambda K: scan_over(body_step, K, state),
              label=f"full step B={B}")
        return

    if which in ("step", "all"):
        model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                        policy=tcnn.BF16_POLICY)
        tr = model.trainer
        state = tr.initial_state()
        t = jax.random.uniform(jax.random.key(1), (B, 3))

        for mode in os.environ.get("MB_STEP_MODES", "mm,serial").split(","):
            set_mm(mode)

            def body(st, key):
                x = jax.random.uniform(key, (B, 2))
                st, _ = tr._training_step(st, x, t, None)
                return st

            slope(lambda K: scan_over(body, K, state),
                  label=f"train step B={B} mode={mode}")
        set_mm(True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
