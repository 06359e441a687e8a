"""Scatter-kernel variant shootout on real TPU (throwaway experiment).

Variants of the weighted scatter's inner loop, timed with the
scan-slope method at the flagship update count (16.7M):
  A: current — scalar w * d per feature inside the wheres
  B: selects first, ONE vector multiply by w at the end
  C: no weight at all (old scatter_add_cols baseline floor)
  D: B with 32x unroll
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tcnn_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

LANES = 128
TILE = 16384
F = 2
N_ACC = 2

N_ROWS = 734000  # ~ flagship table entries
ROWS = (N_ROWS * F + LANES - 1) // LANES
B = 1 << 18
L, C = 16, 4
M = L * C * B
BT = B // TILE


def kernel(mode, unroll, idx_ref, w_ref, d0_ref, d1_ref, out_ref, *accs):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for acc in accs:
            acc[...] = jnp.zeros_like(acc)

    per_row = LANES // F
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def body(j, _):
        for u in range(unroll):
            i = j * unroll + u
            r = idx_ref[i]
            row = r // per_row
            lane0 = (r % per_row) * F
            if mode == "A":
                w = w_ref[i]
                add = jnp.where(lanes == lane0, w * d0_ref[i], 0.0)
                add = add + jnp.where(lanes == lane0 + 1, w * d1_ref[i], 0.0)
            elif mode == "B":
                add = jnp.where(lanes == lane0, d0_ref[i], 0.0)
                add = add + jnp.where(lanes == lane0 + 1, d1_ref[i], 0.0)
                add = add * w_ref[i]
            else:  # C
                add = jnp.where(lanes == lane0, d0_ref[i], 0.0)
                add = add + jnp.where(lanes == lane0 + 1, d1_ref[i], 0.0)
            accs[u % len(accs)][pl.ds(row, 1), :] += add
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0] // unroll, body, 0)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        total = accs[0][...]
        for acc in accs[1:]:
            total = total + acc[...]
        out_ref[...] = total


def make(mode, unroll=16, n_acc=N_ACC):
    def dmap(k):
        def m_(t):
            lvl = jax.lax.div(t, np.int32(C * BT))
            return ((lvl * F + k) * BT + jax.lax.rem(t, np.int32(BT)),)
        return m_

    def run(idx, w, flat_d):
        return pl.pallas_call(
            functools.partial(kernel, mode, unroll),
            grid=(M // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda t: (t,), memory_space=pltpu.SMEM),
                pl.BlockSpec((TILE,), lambda t: (t,), memory_space=pltpu.SMEM),
                pl.BlockSpec((TILE,), dmap(0), memory_space=pltpu.SMEM),
                pl.BlockSpec((TILE,), dmap(1), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.float32)
                            for _ in range(n_acc)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(idx, w, flat_d, flat_d)
    return run


def fetch(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def slope(fn, label, ks=(2, 6)):
    times = {}
    for k in ks:
        def loop(key):
            def bd(c, i):
                idx = jax.random.randint(jax.random.fold_in(key, i), (M,),
                                         0, N_ROWS, jnp.int32)
                out = fn(idx, w * c, flat_d)
                return c + 1e-12 * jnp.sum(out), None
            c, _ = jax.lax.scan(bd, jnp.float32(1), jnp.arange(k))
            return c
        f = jax.jit(loop)
        fetch(f(jax.random.key(0)))
        t0 = time.time()
        fetch(f(jax.random.key(1)))
        times[k] = time.time() - t0
    per = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    print(f"{label}: {per*1e3:.1f} ms ({per*1e9/M:.2f} ns/row)", flush=True)


w = jax.random.uniform(jax.random.key(1), (M,))
flat_d = jax.random.normal(jax.random.key(2), (L * F * B,))

which = sys.argv[1:] or ["A", "B", "C"]
for mode in which:
    if mode == "D":
        slope(make("B", unroll=32), "D=B/unroll32")
    elif mode == "E4":
        slope(make("B", unroll=16, n_acc=4), "E4=B/4acc")
    elif mode == "E8":
        slope(make("B", unroll=16, n_acc=8), "E8=B/8acc")
    elif mode == "E8u32":
        slope(make("B", unroll=32, n_acc=8), "E8u32=B/8acc/unroll32")
    elif mode == "E16u32":
        slope(make("B", unroll=32, n_acc=16), "E16u32=B/16acc/unroll32")
    else:
        slope(make(mode), mode)
