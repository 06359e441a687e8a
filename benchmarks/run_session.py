"""One-process on-chip measurement session.

Round-5 lesson: every fresh process pays the tunnel's device-claim
stall (60 s to 30 min, worst after heavy predecessors), and a KILLED
process (manual or timeout) degrades the worker ~8-100x until the
service recycles it.  Running every bench in ONE python process pays
ONE claim and never kills anything.  tpu_session.sh invokes this.

Phases (each guarded — one failure never sinks the rest):
  pin      tflops_pin            -> benchmarks/tflops_pinned.json
  bench    bench.py              -> stdout JSON + last_onchip_bench.json
  profile  profile_step train+infer -> benchmarks/logs/profile_step_*.json
  slope    microbench_r3 profile (MB_REPS=5) -> logs/profile_slope.json
  btf      bench_btf             -> benchmarks/btf_onchip.json
  sweep    sweep.py              -> bench_result_ours.json
  golden   golden.py             -> benchmarks/golden_image_fit.json

Usage: python benchmarks/run_session.py [phase ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.getcwd())
sys.path.insert(0, os.path.join(os.getcwd(), "benchmarks"))

ALL = ("pin", "bench", "profile", "slope", "btf", "sweep", "golden")


def _guard(name, fn):
    print(f"\n=== {name} {time.strftime('%H:%M:%S')} ===", flush=True)
    try:
        fn()
    except SystemExit:
        pass
    except Exception as e:
        print(f"{name} FAILED: {e!r}", flush=True)


def main(phases):
    phases = phases or list(ALL)

    if "pin" in phases:
        def run():
            import tflops_pin
            sys.argv = ["tflops_pin.py"]
            tflops_pin.main()

        _guard("tflops_pin", run)

    if "bench" in phases:
        def run():
            import bench
            bench.main()

        _guard("bench.py", run)

    if "profile" in phases:
        def run():
            import profile_step
            sys.argv = ["profile_step.py", "train"]
            profile_step.main()
            sys.argv = ["profile_step.py", "infer"]
            profile_step.main()

        _guard("profile_step", run)

    if "slope" in phases:
        def run():
            os.environ.setdefault("MB_REPS", "5")
            import microbench_r3
            microbench_r3.main("profile")

        _guard("microbench profile", run)

    if "btf" in phases:
        def run():
            import bench_btf
            bench_btf.main(["bench_btf.py", "100", "16"])

        _guard("bench_btf", run)

    if "sweep" in phases:
        def run():
            import sweep
            sys.argv = ["sweep.py", "--out", "bench_result_ours.json"]
            sweep.main()

        _guard("sweep", run)

    if "golden" in phases:
        def run():
            import runpy
            sys.argv = ["golden.py"]
            runpy.run_path(os.path.join("benchmarks", "golden.py"),
                           run_name="__main__")

        _guard("golden", run)

    print(f"\n=== session done {time.strftime('%H:%M:%S')} ===", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
