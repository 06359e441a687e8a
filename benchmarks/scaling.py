"""Scaling-efficiency benchmark: samples/s/device at 1..N devices.

BASELINE.md's north star asks for ≥0.9 scaling efficiency going from
one chip to N.  This harness measures data-parallel training
throughput per device over growing sub-meshes and reports
efficiency(n) = throughput(n) / (n · throughput(1)).

It runs unchanged on
  * the virtual 8-device CPU mesh (default here; validates the
    measurement logic and the shard_map DP step without a pod):
        python benchmarks/scaling.py
  * real multi-chip/multi-host TPU (run on every host):
        TCNN_SCALING_REAL=1 python benchmarks/scaling.py

The step goes through the PRODUCTION shard_map lowering in both modes;
on a real TPU mesh the Pallas kernels engage automatically.  On the
virtual CPU mesh the kernels stay off by default (interpret-mode
kernels serialize on the host CPU and would measure the interpreter,
not scaling) — kernels-on-mesh correctness is covered by
tests/test_sharding.py and __graft_entry__.dryrun_multichip instead;
set TCNN_TPU_FORCE_FAST_SCATTER=1 to engage them here anyway.

Timing uses the scan-slope method (benchmarks/microbench.py): K steps
inside ONE compiled dispatch, scalar readback, slope over two K values
— honest on the axon tunnel, harmless on CPU.

Writes benchmarks/scaling_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np


def main():
    real = os.environ.get("TCNN_SCALING_REAL")
    if not real:
        os.environ.setdefault(
            "XLA_FLAGS",
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")

    import jax

    if not real:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
        except Exception:
            pass
    else:
        from tcnn_tpu.parallel.launch import initialize_distributed

        initialize_distributed()

    import jax.numpy as jnp

    import tcnn_tpu as tcnn
    from tcnn_tpu.parallel import DataParallel, make_mesh

    n_all = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= n_all]
    per_device_batch = int(os.environ.get("TCNN_SCALING_BATCH", 1 << 14))

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).ravel()[0])

    def build(n):
        dp = DataParallel(make_mesh(jax.devices()[:n]))
        model = tcnn.create_from_config(2, 3, {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
            "encoding": {"otype": "HashGrid", "n_levels": 16,
                         "n_features_per_level": 2, "log2_hashmap_size": 15,
                         "base_resolution": 16, "per_level_scale": 1.5},
            "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                        "n_hidden_layers": 2},
        }, policy=tcnn.BF16_POLICY if real else None)
        return dp, model

    results = {}
    for n in sizes:
        dp, model = build(n)
        trainer = model.trainer
        batch = per_device_batch * n
        batch_s = dp.batch_sharding

        # The PRODUCTION lowering: shard_map per-shard step (Pallas
        # kernels see a plain local batch; grads pmean over the mesh).
        sm_step = dp.step_shard_map(trainer)

        def make_loop(k):
            def loop(state, key):
                def body(st, i):
                    kk = jax.random.fold_in(key, i)
                    x = jax.lax.with_sharding_constraint(
                        jax.random.uniform(kk, (batch, 2)), batch_s)
                    t = jax.lax.with_sharding_constraint(
                        jax.random.uniform(jax.random.fold_in(kk, 1),
                                           (batch, 3)), batch_s)
                    st, loss = sm_step(st, x, t)
                    return st, loss

                _, losses = jax.lax.scan(body, state, jnp.arange(k))
                return losses[-1]

            return jax.jit(loop, in_shardings=(dp.replicated, None))

        state = dp.replicate(trainer.initial_state())
        times = {}
        ks = (2, 8)
        for k in ks:
            f = make_loop(k)
            fetch(f(state, jax.random.key(0)))  # compile + warm
            t0 = time.perf_counter()
            fetch(f(state, jax.random.key(1)))
            times[k] = time.perf_counter() - t0
        per_step = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
        sps = batch / per_step
        results[n] = {"samples_per_sec": sps,
                      "samples_per_sec_per_device": sps / n,
                      "step_ms": per_step * 1e3,
                      "global_batch": batch}
        print(f"n={n}: {sps:,.0f} samples/s "
              f"({sps / n:,.0f}/device, step {per_step * 1e3:.2f} ms)",
              flush=True)

    base = results[sizes[0]]["samples_per_sec"]
    for n in sizes:
        results[n]["efficiency"] = results[n]["samples_per_sec"] / (n * base)
        print(f"n={n}: efficiency {results[n]['efficiency']:.3f}")

    # Hybrid data × model parallelism on the full mesh: tables
    # row-shard n_model-ways (the memory-capacity axis), batch stays
    # flat over all devices.  Reported alongside DP so the artifact
    # shows the capacity/throughput trade on the same silicon.
    hybrid = None
    if n_all >= 4 and n_all % 2 == 0:
        from tcnn_tpu.parallel import HybridParallel

        n_model = int(os.environ.get("TCNN_SCALING_N_MODEL", 2))
        _, model = build(n_all)
        hp = HybridParallel(n_model=n_model, model=model)
        trainer = model.trainer
        state = hp.shard_state(trainer.initial_state())
        grid = state.params["encoding"]["grid"]
        shard_bytes = max(s.data.nbytes for s in grid.addressable_shards)
        assert shard_bytes * n_model <= grid.nbytes + n_model * 4, (
            "table not actually sharded")
        batch = per_device_batch * n_all
        step = hp.make_training_step(trainer)
        xk = jax.random.uniform(jax.random.key(2), (batch, 2))
        tk = jax.random.uniform(jax.random.key(3), (batch, 3))
        xs, ts = hp.shard_batch(xk), hp.shard_batch(tk)
        state, _ = jax.block_until_ready(step(state, xs, ts))  # compile
        times = {}
        for k in (2, 8):
            # The step donates its state input — keep chaining the
            # returned state instead of reusing a consumed buffer.
            t0 = time.perf_counter()
            for _ in range(k):
                state, loss = step(state, xs, ts)
            fetch(loss)
            times[k] = time.perf_counter() - t0
        per_step = (times[8] - times[2]) / 6
        hybrid = {
            "n_devices": n_all,
            "n_model": n_model,
            "samples_per_sec": batch / per_step,
            "step_ms": per_step * 1e3,
            "table_bytes_per_device": shard_bytes,
            "table_bytes_total": grid.nbytes,
        }
        print(f"hybrid (data={n_all // n_model} × model={n_model}): "
              f"{batch / per_step:,.0f} samples/s, table shard "
              f"{shard_bytes / 1e6:.2f} MB/device of {grid.nbytes / 1e6:.2f} "
              f"MB total", flush=True)

    out = {
        "device": str(jax.devices()[0]),
        "n_devices_available": n_all,
        "per_device_batch": per_device_batch,
        "virtual_cpu_mesh": not bool(real),
        "results": results,
        "hybrid_table_parallel": hybrid,
    }
    if not real:
        out["note"] = (
            "Virtual CPU mesh: all N 'devices' share one physical CPU, so "
            "per-device throughput necessarily drops ~Nx and the efficiency "
            "column does NOT measure real scaling — this run validates the "
            "harness, shardings, and collectives.  Run with "
            "TCNN_SCALING_REAL=1 on every host of a pod for real numbers "
            "(BASELINE.md target: >=0.9).")
    path = os.path.join(os.path.dirname(__file__), "scaling_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
