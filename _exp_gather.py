"""Probe: does a width-4 sliced gather cost the same per-slice as a
width-2 row take?  If yes, corner pair-packing halves the forward
gather cost."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tcnn_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N = 734000
F = 2
flat = jax.random.normal(jax.random.key(0), (N * F + F,))
table2d = flat[:N * F].reshape(N, F)
M = 1 << 24           # 16.7M single rows
MP = M // 2           # 8.4M pairs


def fetch(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def slope(make, label, ks=(2, 6)):
    times = {}
    for k in ks:
        f = make(k)
        fetch(f(jax.random.key(0)))
        t0 = time.time()
        fetch(f(jax.random.key(1)))
        times[k] = time.time() - t0
    per = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    print(f"{label}: {per*1e3:.1f} ms", flush=True)


def scan_over(body, K):
    def run(key):
        def step(c, i):
            return body(c, jax.random.fold_in(key, i)), None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K))
        return c
    return jax.jit(run)


def take_body(c, key):
    idx = jax.random.randint(key, (M,), 0, N, jnp.int32)
    return c + jnp.sum(jnp.take(table2d, idx, axis=0))


def pair_body(c, key):
    idx = jax.random.randint(key, (MP,), 0, N - 1, jnp.int32)
    starts = (idx * F)[:, None]
    g = jax.lax.gather(
        flat, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,)),
        slice_sizes=(2 * F,), mode="clip")
    return c + jnp.sum(g)


def pair_dslice_body(c, key):
    # variant: gather via take of a strided 2F-wide VIEW is impossible;
    # instead take twice at idx and idx+1 (upper bound reference).
    idx = jax.random.randint(key, (MP,), 0, N - 1, jnp.int32)
    return (c + jnp.sum(jnp.take(table2d, idx, axis=0))
            + jnp.sum(jnp.take(table2d, idx + 1, axis=0)))


which = sys.argv[1:] or ["take", "pair"]
if "take" in which:
    slope(lambda K: scan_over(take_body, K), f"take {M} rows x{F}")
if "pair" in which:
    slope(lambda K: scan_over(pair_body, K), f"gather {MP} slices x{2*F}")
if "two" in which:
    slope(lambda K: scan_over(pair_dslice_body, K), f"2x take {MP}")


def taket2_body(c, key):
    # 8.4M takes of (N/2, 4)-wide rows — the paired-fetch candidate.
    t2 = jnp.concatenate([table2d[: (N // 2) * 2].reshape(N // 2, 2 * F),
                          jnp.pad(flat[F:N * F], (0, F)).reshape(-1, 2 * F)],
                         axis=0)
    idx = jax.random.randint(key, (MP,), 0, N // 2, jnp.int32)
    return c + jnp.sum(jnp.take(t2, idx, axis=0))


if "taket2" in which:
    slope(lambda K: scan_over(taket2_body, K), f"take {MP} rows x{2*F} (T2)")
