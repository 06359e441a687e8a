"""Grid gather/scatter design shoot-out + step decomposition on real TPU.

Measures, at the flagship geometry (HashGrid L16 F2 hashmap=2^15,
B=2^18), the candidate reduction architectures against each other
(round-2 VERDICT asked for at least two implemented + measured):

  fwd:  take-paired gather (round-2)  vs  MXU matmul gather (round-3)
  bwd:  serial pair scatter (round-2) vs  MXU matmul scatter (round-3)
                                      vs  sort+segment-sum (XLA)
  step: full training step with each routing
  profile: scan-slope decomposition of the flagship step

Timing protocol per the axon-tunnel rules: K reps inside ONE dispatch
(lax.scan with data dependency), scalar readback, slope over two Ks.
Round-5 hardening (VERDICT #4 — the round-4 rows were single readings
with a 30% run-to-run spread and occasional NEGATIVE slopes):

  * each row repeats its timed readings MB_REPS times (default 5 in
    profile mode) against the SAME compiled executables; the reported
    value is the MEDIAN slope with the (max-min)/median spread;
  * negative-slope readings are rejected as protocol failures (a slow
    outlier in the K=4 reading) and retried, never averaged in;
  * profile mode writes benchmarks/logs/profile_slope.json so STATUS/
    ROOFLINE quote a committed artifact instead of one console line.

All device-sized arrays are passed to the jitted loops as ARGUMENTS.
Closure-capturing them bakes them into the StableHLO as dense
constants, which costs minutes of host-side lowering per body (229 s
measured for ONE 3 MB constant inside a scan — the round-4 "remote
compiles take minutes" lore was exactly this) and bloats every
compile-cache entry.

Usage:  python benchmarks/microbench_r3.py [fwd|bwd|sort|step|profile|all]
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


def fetch(x):
    import jax

    return float(np.asarray(jax.device_get(x)).ravel()[0])


PROFILE_ROWS = []


def slope(make_loop, ks=(4, 16), label="", reps=None, max_extra=4):
    """Median-of-reps scan-slope timing.

    make_loop(k) -> jitted fn(key) running k scan iterations.  Each rep
    times BOTH chain lengths with fresh keys against the same compiled
    executables; per-op cost is the slope.  Negative slopes are
    protocol failures (timing noise exceeding the K-difference signal)
    — rejected and retried up to ``max_extra`` times, never averaged.
    """
    import jax

    reps = int(reps if reps is not None else os.environ.get("MB_REPS", "1"))
    fns = {}
    for k in ks:
        fns[k] = make_loop(k)
        fetch(fns[k](jax.random.key(0)))  # compile + warm
    vals, fixeds, rejected = [], [], 0
    tries = 0
    while len(vals) < reps and tries < reps + max_extra:
        tries += 1
        times = {}
        for k in ks:
            t0 = time.time()
            fetch(fns[k](jax.random.key(1000 + tries)))
            times[k] = time.time() - t0
        per = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
        if per <= 0:
            rejected += 1
            print(f"{label}: REJECTED negative slope "
                  f"({per * 1e3:.2f} ms/op, protocol noise)", flush=True)
            continue
        vals.append(per)
        fixeds.append(times[ks[0]] - ks[0] * per)
    if not vals:
        print(f"{label}: NO credible reading ({rejected} rejected)",
              flush=True)
        return None
    vals.sort()
    med = vals[len(vals) // 2] if len(vals) % 2 else (
        vals[len(vals) // 2 - 1] + vals[len(vals) // 2]) / 2
    spread = (vals[-1] - vals[0]) / med if len(vals) > 1 else 0.0
    fixed = sorted(fixeds)[len(fixeds) // 2]
    tag = (f" [median of {len(vals)}, spread {spread * 100:.0f}%"
           + (f", {rejected} rejected" if rejected else "") + "]"
           if reps > 1 else "")
    print(f"{label}: {med * 1e3:.2f} ms/op (fixed {fixed * 1e3:.0f} ms)"
          f"{tag}", flush=True)
    PROFILE_ROWS.append({
        "label": label, "ms_per_op": round(med * 1e3, 3),
        "readings_ms": [round(v * 1e3, 3) for v in vals],
        "spread_frac": round(spread, 4), "rejected_negative": rejected,
        "ks": list(ks),
    })
    return med


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
    # probes (tpu_session.sh cold/warm step).
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

    def scan_over(body, K, init, *consts):
        """jitted fn(key) scanning ``body(carry, key_i, *consts)`` K
        times.  ``init`` and ``consts`` flow as jit ARGUMENTS (closure
        capture of device arrays = dense constants = minutes of
        lowering; see module docstring)."""
        def run(key, init, *consts):
            def step(carry, i):
                return body(carry, jax.random.fold_in(key, i),
                            *consts), None

            out, _ = jax.lax.scan(step, init, jnp.arange(K))
            return jax.tree_util.tree_leaves(out)[0].ravel()[0]

        jitted = jax.jit(run)
        return lambda key: jitted(key, init, *consts)

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

            def body(c, key, tab, sp=sp):
                x = jax.random.uniform(key, (B, 2))
                y = grid_ops.grid_encode(sp, tab, x, fast_scatter=True)
                return c + jnp.sum(y.astype(jnp.float32))

            slope(lambda K: scan_over(body, K, jnp.float32(0), table),
                  label=f"grid fwd {vname}")
        set_mm(True)

    if which in ("bwd", "all"):
        for vname, sp, mm in variant_list():
            set_mm(mm)

            def body(tb, key, sp=sp):
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

        def body(c, key, idx, g):
            i2 = idx ^ jax.random.randint(key, (), 0, 4, jnp.int32)
            out = sort_segment_scatter(i2, g, spec.n_entries)
            return c + out.ravel()[0]

        slope(lambda K: scan_over(body, K, jnp.float32(0), idx, g),
              ks=(2, 6), label=f"sort+segment scatter m={m}")

    if which == "profile":
        # Decompose the flagship step: index/weight build, grid fwd,
        # grid fwd+bwd, MLP fwd+bwd, Adam, loss+grad, full step.  Each
        # stage via the same scan-slope protocol; differences between
        # consecutive rows localize the cost.  MB_REPS defaults to 5
        # here (VERDICT r4 #4: single readings had 30% run-to-run
        # spread; medians + spreads are committed to the JSON artifact).
        os.environ.setdefault("MB_REPS", "5")
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

        def body_mlp(c, key, mlp_params, xm):
            xk = xm + c                      # genuine carry dependency

            def loss(p):
                return jnp.sum(net.apply(p, xk).astype(jnp.float32))

            g = jax.grad(loss)(mlp_params)
            return c + 0.0 * g["layers"][0].astype(jnp.float32).ravel()[0]

        slope(lambda K: scan_over(body_mlp, K, jnp.float32(0),
                                  mlp_params, xm),
              label="MLP fwd+bwd (B,32)->3")

        model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                        policy=tcnn.BF16_POLICY)
        tr = model.trainer
        state = tr.initial_state()
        t = jax.random.uniform(jax.random.key(1), (B, 3))

        def body_fwd_only(c, key, params, t):
            # Forward+loss only: grads deliberately unused, so XLA
            # dead-code-eliminates the whole backward.
            x = jax.random.uniform(key, (B, 2))
            loss, _ = tr.loss_value_and_grads(params, x, t, None,
                                              step=jnp.uint32(1))
            return c + loss

        slope(lambda K: scan_over(body_fwd_only, K, jnp.float32(0),
                                  state.params, t),
              label="fwd+loss only (bwd DCE'd)")

        def body_loss(st, key, t):
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

        slope(lambda K: scan_over(body_loss, K, state, t),
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

        def body_step(st, key, t):
            x = jax.random.uniform(key, (B, 2))
            st, _ = step_fn(st, x, t)
            return st

        slope(lambda K: scan_over(body_step, K, state, t),
              label=f"full step B={B}")

        out = os.path.join(os.path.dirname(__file__), "logs",
                           "profile_slope.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump({
                "protocol": "scan-slope (K=4 vs K=16 chained steps in "
                            "one dispatch, data-dependent carry, "
                            "readback sync); per-row median of "
                            f"{os.environ['MB_REPS']} readings, "
                            "negative slopes rejected",
                "batch": B,
                "rows": PROFILE_ROWS,
                "device": str(jax.devices()[0]),
                "producing_commit": subprocess.run(
                    ["git", "rev-parse", "HEAD"], capture_output=True,
                    text=True).stdout.strip(),
            }, f, indent=1)
        print(f"wrote {out}", flush=True)
        return

    if which in ("step", "all"):
        model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                        policy=tcnn.BF16_POLICY)
        tr = model.trainer
        state = tr.initial_state()
        t = jax.random.uniform(jax.random.key(1), (B, 3))

        for mode in os.environ.get("MB_STEP_MODES", "mm,serial").split(","):
            set_mm(mode)

            def body(st, key, t):
                x = jax.random.uniform(key, (B, 2))
                st, _ = tr._training_step(st, x, t, None)
                return st

            slope(lambda K: scan_over(body, K, state, t),
                  label=f"train step B={B} mode={mode}")
        set_mm(True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
