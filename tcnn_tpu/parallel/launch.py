"""Multi-host launch utilities + per-host data feeding.

The reference is strictly single-GPU (SURVEY.md §2.9); multi-host
scaling is new TPU-native design.  JAX's multi-controller model: every
host runs the SAME program; after :func:`initialize_distributed`,
``jax.devices()`` spans all hosts' chips, a ``Mesh`` built over them is
global, and jit-compiled steps insert ICI/DCN collectives
automatically.  Each host feeds only its local shard of the batch
(``shard_host_local_batch``).

Run as a module for a self-contained multi-host training smoke/bench:

    # on every host of the pod (or once for single-host):
    python -m tcnn_tpu.parallel.launch --steps 100 --batch 262144

    # non-TPU / manual clusters:
    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 \
        JAX_PROCESS_ID=0 python -m tcnn_tpu.parallel.launch ...
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (multi-host).

    On Cloud TPU pods all arguments are auto-detected.  Elsewhere pass
    them explicitly or via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID.  No-op for single-process runs (num_processes == 1)
    and when called twice.  Must run before any device use.
    """
    import jax

    if getattr(initialize_distributed, "_done", False):
        return
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if num_processes == 1 and coordinator_address is None:
        initialize_distributed._done = True
        return

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except ValueError:
        if kwargs:
            raise
        # No cluster auto-detection available → single-process run.
    initialize_distributed._done = True


def shard_host_local_batch(dp, *host_arrays) -> Tuple:
    """Assemble global batch arrays from per-host local shards.

    Each process passes the (B_global / n_processes, ...) slice it
    loaded; the result is a global jax.Array sharded over the DP mesh
    without any cross-host data movement.
    """
    import jax

    return tuple(
        jax.make_array_from_process_local_data(dp.batch_sharding,
                                               np.asarray(a))
        for a in host_arrays)


def _main() -> None:
    import argparse
    import time

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=1 << 18,
                        help="global batch size")
    parser.add_argument("--chunk", type=int, default=10,
                        help="training steps per compiled dispatch")
    parser.add_argument("--n-model", type=int, default=1,
                        help="row-shard grid tables N-ways over a model "
                             "mesh axis (hybrid data × model parallelism; "
                             "1 = pure DP)")
    parser.add_argument("--ckpt-dir", type=str, default=None,
                        help="orbax checkpoint directory: auto-resumes "
                             "from the newest step on startup and saves "
                             "every --ckpt-every steps (async, sharded "
                             "leaves written in place by their owning "
                             "hosts) — restart-based elastic recovery")
    parser.add_argument("--ckpt-every", type=int, default=0,
                        help="save interval in steps (default: once per "
                             "compiled chunk)")
    args = parser.parse_args()

    initialize_distributed()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import tcnn_tpu as tcnn
    from .mesh import DataParallel

    hybrid = args.n_model > 1
    if hybrid:
        from .table_parallel import HybridParallel
    else:
        dp = DataParallel()
    if jax.process_index() == 0:
        extra = (f" (hybrid: tables sharded {args.n_model}-way)"
                 if hybrid else "")
        print(f"mesh: {len(jax.devices())} devices over "
              f"{jax.process_count()} processes{extra}")

    model = tcnn.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 16,
                     "n_features_per_level": 2, "log2_hashmap_size": 15,
                     "base_resolution": 16, "per_level_scale": 1.5},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }, policy=tcnn.BF16_POLICY)
    trainer = model.trainer
    state0 = trainer.initial_state()
    if hybrid:
        dp = HybridParallel(n_model=args.n_model, model=model)
        state = dp.shard_state(state0)
        state_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(dp.mesh, s), dp.specs(state0),
            is_leaf=lambda v: isinstance(v, P))
    else:
        state = dp.replicate(state0)
        state_shardings = dp.replicated

    # On-device data generation inside one compiled multi-step loop:
    # every chip draws its own (sharded) batch shard, so no host feeding
    # is on the measured path (per-host feeding is exercised separately
    # by shard_host_local_batch in tests).
    batch_s = dp.batch_sharding
    # PRODUCTION lowering: the shard_map-wrapped per-shard step, so the
    # Pallas kernels (fused MLP, grid matmul/scatter — default-on on
    # TPU) each see a plain local batch; a bare jit+shardings step
    # cannot partition pallas_call (see mesh.py docstring).
    sm_step = (dp.step_shard_map(trainer)(state0) if hybrid
               else dp.step_shard_map(trainer))

    def loop(state, key):
        def body(st, i):
            k = jax.random.fold_in(key, i)
            x = jax.lax.with_sharding_constraint(
                jax.random.uniform(k, (args.batch, 2)), batch_s)
            t = jax.lax.with_sharding_constraint(
                jax.random.uniform(jax.random.fold_in(k, 1),
                                   (args.batch, 3)), batch_s)
            return sm_step(st, x, t)

        return jax.lax.scan(body, state, jnp.arange(args.chunk))

    jloop = jax.jit(loop, in_shardings=(state_shardings, None),
                    out_shardings=(state_shardings, dp.replicated),
                    donate_argnums=(0,))

    # Restart-based elastic recovery (SURVEY.md §5: the reference's
    # recovery = restart from a serialized snapshot; here the snapshot
    # is an orbax checkpoint that keeps sharded leaves sharded).
    mgr = None
    resume_step = 0
    if args.ckpt_dir:
        from ..utils import checkpoint as ckpt

        # The tables' block-cyclic row order is baked into the saved
        # arrays; refuse to resume under a different layout.
        ckpt.check_layout_tag(args.ckpt_dir, {"n_model": args.n_model})
        # Steps are only visited at chunk granularity; orbax's interval
        # policy is `step % interval == 0`, so a non-multiple interval
        # would save rarely or never — round up to a chunk multiple.
        every = args.ckpt_every or args.chunk
        every_r = ((every + args.chunk - 1) // args.chunk) * args.chunk
        if every_r != every and jax.process_index() == 0:
            print(f"ckpt-every {every} rounded up to {every_r} "
                  f"(chunk multiple)")
        mgr = ckpt.make_manager(args.ckpt_dir, max_to_keep=3,
                                save_interval_steps=every_r)
        resumed = ckpt.restore_latest(mgr, like=state)
        if resumed is not None:
            state = resumed
            resume_step = int(mgr.latest_step())
            if jax.process_index() == 0:
                print(f"resumed from step {resume_step}")

    key = jax.random.key(jax.process_count())  # same key on all hosts
    state, losses = jloop(state, jax.random.fold_in(key, 0))
    float(np.asarray(jax.device_get(losses[-1])))  # sync after compile

    n_chunks = max(args.steps // args.chunk, 1)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, losses = jloop(state, jax.random.fold_in(key, i + 1))
        if mgr is not None:
            # Step computed on the host (warmup chunk + i+1 bench
            # chunks past the resume point): reading state.step back
            # would force a device sync every chunk and serialize
            # dispatch with compute.
            ckpt.save_step(mgr, state,
                           step=resume_step + (i + 2) * args.chunk)
    final = float(np.asarray(jax.device_get(losses[-1])))
    dt = time.perf_counter() - t0
    if mgr is not None:
        mgr.wait_until_finished()
        mgr.close()
    if jax.process_index() == 0:
        sps = n_chunks * args.chunk * args.batch / dt
        print(f"trained {n_chunks * args.chunk} steps of batch "
              f"{args.batch} in {dt:.2f}s: {sps:,.0f} samples/s "
              f"({sps / dp.n_devices:,.0f}/device), final loss {final:.5f}")


if __name__ == "__main__":
    _main()
