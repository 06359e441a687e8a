import os, time
import jax, jax.numpy as jnp, numpy as np
from tcnn_tpu.ops import grid_ops
from tcnn_tpu.common import HashType
print("backend:", jax.default_backend())
for ht in (HashType.COHERENT_ADD, HashType.COHERENT_PRIME):
    spec = grid_ops.make_grid_spec(2, 4, 2, 10, 4, 1.5, hash_type=ht)
    table = jax.random.normal(jax.random.key(1), (spec.n_entries, 2))
    B = 4096
    x = jax.random.uniform(jax.random.key(3), (B, 2)).at[0].set(1.0)
    f = jax.jit(jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(spec, t, x, fast_scatter=True).astype(jnp.float32)**2)))
    g = f(table)
    g_cpu = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(spec, t, x, fast_scatter=False).astype(jnp.float32)**2))(table)
    print(ht.value, "tpu kernel vs slow:", np.allclose(np.asarray(g), np.asarray(g_cpu), atol=1e-3), float(jnp.abs(g-g_cpu).max()))
