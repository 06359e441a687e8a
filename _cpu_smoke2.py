import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, numpy as np
from tcnn_tpu.ops import grid_ops
from tcnn_tpu.common import HashType, GridType
os.environ['TCNN_TPU_PALLAS_INTERPRET']='1'

def check(spec, B, label, include_one=True):
    table = jax.random.normal(jax.random.key(1), (spec.n_entries, spec.n_features_per_level)) * 0.1
    x = jax.random.uniform(jax.random.key(2), (B, spec.n_dims))
    if include_one:
        x = x.at[0].set(1.0)  # wrap-edge: top corner
        x = x.at[1, 0].set(1.0)
    ys = grid_ops.grid_encode(spec, table, x, fast_scatter=False)
    yf = grid_ops.grid_encode(spec, table, x, fast_scatter=True)
    ok_f = np.allclose(np.asarray(ys), np.asarray(yf), atol=1e-5)
    gs = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(spec, t, x, fast_scatter=False).astype(jnp.float32)**2))(table)
    gf = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(spec, t, x, fast_scatter=True).astype(jnp.float32)**2))(table)
    err = float(jnp.abs(gs - gf).max())
    ok_b = np.allclose(np.asarray(gs), np.asarray(gf), atol=1e-3)
    print(f"{label}: fwd={ok_f} bwd={ok_b} (maxerr {err:.2e})")
    assert ok_f and ok_b

# CoherentAdd hash 2D (all levels paired; mix of dense low + hash high)
check(grid_ops.make_grid_spec(2, 6, 2, 8, 4, 1.7, hash_type=HashType.COHERENT_ADD), 4096, "CoherentAdd 2D")
# CoherentPrime (dense levels paired, hash unpaired — split streams)
check(grid_ops.make_grid_spec(2, 6, 2, 8, 4, 1.7, hash_type=HashType.COHERENT_PRIME), 4096, "CoherentPrime 2D mixed")
# Dense only
check(grid_ops.make_grid_spec(2, 4, 2, 12, 4, 1.5, grid_type=GridType.DENSE), 4096, "Dense 2D")
# Tiled (mod wraps heavily)
check(grid_ops.make_grid_spec(2, 4, 2, 12, 4, 2.0, grid_type=GridType.TILED), 4096, "Tiled 2D")
# 3D CoherentAdd, F=4
check(grid_ops.make_grid_spec(3, 4, 4, 8, 4, 1.6, hash_type=HashType.COHERENT_ADD), 2048, "CoherentAdd 3D F4")
# second order through pairs
spec = grid_ops.make_grid_spec(2, 3, 2, 8, 4, 1.7, hash_type=HashType.COHERENT_ADD)
table = jax.random.normal(jax.random.key(3), (spec.n_entries, 2)) * 0.1
x = jax.random.uniform(jax.random.key(4), (512, 2), minval=0.2, maxval=0.8)
from jax.test_util import check_grads
check_grads(lambda t: grid_ops.grid_encode(spec, t, x, fast_scatter=True), (table,), order=2, modes=['rev'], atol=1e-2, rtol=1e-2)
print("2nd order ok")
