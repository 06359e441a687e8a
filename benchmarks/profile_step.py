"""Per-kernel on-chip decomposition of the flagship training step.

Runs N jitted steps under jax.profiler with a perfetto trace, then
aggregates device-side kernel durations by (fusion/custom-call) name.
Output: benchmarks/logs/profile_step.json — the committed evidence for
ROOFLINE.md's gap analysis (round-3 VERDICT missing #3).

Usage: python benchmarks/profile_step.py [train|infer] [out.json]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def run_and_trace(mode: str, trace_dir: str, n_steps: int = 12):
    import jax
    import jax.numpy as jnp
    import tcnn_tpu as tcnn

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    B = int(os.environ.get("MB_BATCH", 1 << 18))
    model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                    policy=tcnn.BF16_POLICY)
    tr = model.trainer
    state = tr.initial_state()
    t = jax.random.uniform(jax.random.key(1), (B, 3))
    # ONE scanned dispatch of n_steps-1 steps, matching
    # microbench_r3.slope's protocol exactly: per-dispatch traces on
    # the tunnel showed ~3x the scan-steady-state step time
    # (dispatch-serialized execution pads every kernel), which made
    # the committed per-kernel numbers incomparable with the headline.
    if mode == "train":
        def loop(s, key):
            def body(carry, i):
                x = jax.random.uniform(jax.random.fold_in(key, i), (B, 2))
                carry, loss = tr._training_step(carry, x, t, None)
                return carry, loss

            return jax.lax.scan(body, s, jnp.arange(n_steps - 1))

        loop = jax.jit(loop)
        state2, _ = loop(state, jax.random.key(7))  # compile + warm
        jax.block_until_ready(state2.params)
        with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
            _, losses = loop(state, jax.random.key(8))
            jax.block_until_ready(losses)
    else:
        params = tr.inference_params(state)

        def iloop(p, key):
            def body(carry, i):
                x = jax.random.uniform(jax.random.fold_in(key, i), (B, 2))
                y = model.network.inference(p, x + carry * 1e-30)
                return y[0, 0].astype(jnp.float32), None

            return jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(n_steps - 1))

        iloop = jax.jit(iloop)
        jax.block_until_ready(iloop(params, jax.random.key(7)))
        with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
            jax.block_until_ready(iloop(params, jax.random.key(8)))
    return n_steps - 1


def parse_trace(trace_dir: str, n_steps: int):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no perfetto trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # Device-lane complete events: pid/tid correspond to TPU device
    # lanes; host python lanes carry "/host:" process names.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device:" in n.lower() or "xla" in n.lower()}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e6  # us -> s
        # Skip trace-framework rows
        if name.startswith(("process_", "thread_")):
            continue
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    per_step = {k: v / n_steps for k, v in
                sorted(agg.items(), key=lambda kv: -kv[1])}
    return per_step, total / n_steps, pid_names


def classify(name: str) -> str:
    n = name.lower()
    if "gather_kernel" in n or "gather_levels" in n:
        return "pallas gather (grid fwd)"
    if "scatter_kernel" in n or "scatter_levels" in n:
        return "pallas scatter (grid bwd)"
    if "mlp" in n or "fused_mlp" in n:
        return "pallas fused MLP"
    if n.startswith(("fusion", "loop_fusion", "input_fusion", "output_fusion")):
        return "XLA fusion"
    if "copy" in n:
        return "copy/transpose"
    if "convolution" in n or n.startswith("dot") or "gemm" in n:
        return "XLA matmul"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    out = sys.argv[2] if len(sys.argv) > 2 else f"benchmarks/logs/profile_step_{mode}.json"
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/tcnn_trace_" + mode)
    n = run_and_trace(mode, trace_dir)
    per_kernel, step_total, pid_names = parse_trace(trace_dir, n)
    groups = {}
    for k, v in per_kernel.items():
        groups[classify(k)] = groups.get(classify(k), 0.0) + v
    import subprocess
    commit = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                            text=True).stdout.strip()
    res = {
        "mode": mode,
        "batch": int(os.environ.get("MB_BATCH", 1 << 18)),
        "device_total_ms_per_step": step_total * 1e3,
        "groups_ms": {k: v * 1e3 for k, v in
                      sorted(groups.items(), key=lambda kv: -kv[1])},
        "top_kernels_ms": {k: v * 1e3 for k, v in
                           list(per_kernel.items())[:40]},
        "producing_commit": commit,
    }
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"device_total_ms_per_step": res["device_total_ms_per_step"],
                      "groups_ms": res["groups_ms"]}, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
