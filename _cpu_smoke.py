import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, numpy as np
from tcnn_tpu.ops import grid_ops
assert jax.default_backend() == 'cpu'
spec = grid_ops.make_grid_spec(2, 4, 2, 10, 4, 1.5)
table = jax.random.normal(jax.random.key(1), (spec.n_entries, 2))
x = jax.random.uniform(jax.random.key(2), (64, 2))
y_slow = grid_ops.grid_encode(spec, table, x, fast_scatter=False)
os.environ['TCNN_TPU_PALLAS_INTERPRET']='1'
y_fast = grid_ops.grid_encode(spec, table, x, fast_scatter=True)
print('fwd match:', np.allclose(np.asarray(y_slow), np.asarray(y_fast)))
g_slow = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(spec, t, x, fast_scatter=False)**2))(table)
g_fast = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(spec, t, x, fast_scatter=True)**2))(table)
print('bwd match:', np.allclose(np.asarray(g_slow), np.asarray(g_fast), atol=1e-5))
gx_s = jax.grad(lambda x: jnp.sum(grid_ops.grid_encode(spec, table, x, fast_scatter=False)**2))(x)
gx_f = jax.grad(lambda x: jnp.sum(grid_ops.grid_encode(spec, table, x, fast_scatter=True)**2))(x)
print('dx match:', np.allclose(np.asarray(gx_s), np.asarray(gx_f), atol=1e-4))
y_m = grid_ops.grid_encode(spec, table, x, max_level=2, fast_scatter=True)
print('mask ok:', float(jnp.abs(y_m[:, 4:]).max()) == 0.0, y_m.shape)
# Bigger B so the Pallas weighted kernel actually engages (tile>=256):
B = 4096
xb = jax.random.uniform(jax.random.key(3), (B, 2))
gs = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(spec, t, xb, fast_scatter=False)**2))(table)
gf = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(spec, t, xb, fast_scatter=True)**2))(table)
print('kernel bwd match (B=4096):', np.allclose(np.asarray(gs), np.asarray(gf), atol=1e-4),
      float(jnp.abs(gs - gf).max()))
