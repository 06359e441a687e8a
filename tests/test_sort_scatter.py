"""Sort+segment-sum scatter (design candidate (b)) — parity tests.

The route is opt-in (`TCNN_TPU_SCATTER=sortseg`) and exists so the
ROOFLINE.md shoot-out is reproducible end-to-end; these tests pin that
it computes the SAME gradients as the production dispatch.
Reference spec: kernel_grid_backward, grid.h:214-320.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.common import GridType, HashType
from tcnn_tpu.ops import grid_ops
from tcnn_tpu.ops.sort_scatter import sort_segment_scatter


class TestSortSegmentScatterOp:
    @pytest.mark.parametrize("m,n_rows,f", [(1024, 64, 2), (333, 7, 4),
                                            (64, 256, 1)])
    def test_matches_dense_scatter(self, m, n_rows, f):
        k1, k2 = jax.random.split(jax.random.key(0))
        idx = jax.random.randint(k1, (m,), 0, n_rows, jnp.int32)
        vals = jax.random.normal(k2, (m, f), jnp.float32)
        got = sort_segment_scatter(idx, vals, n_rows)
        want = jnp.zeros((n_rows, f)).at[idx].add(vals)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_all_updates_one_row(self):
        vals = jnp.ones((50, 2))
        got = sort_segment_scatter(jnp.full((50,), 3, jnp.int32), vals, 8)
        want = jnp.zeros((8, 2)).at[3].set(50.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_deterministic(self):
        idx = jax.random.randint(jax.random.key(5), (4096,), 0, 16,
                                 jnp.int32)
        vals = jax.random.normal(jax.random.key(6), (4096, 2))
        a = np.asarray(sort_segment_scatter(idx, vals, 16))
        b = np.asarray(sort_segment_scatter(idx, vals, 16))
        assert (a == b).all()


class TestSortsegGridRoute:
    @pytest.mark.parametrize("grid_type,hash_type", [
        (GridType.HASH, HashType.COHERENT_PRIME),
        (GridType.HASH, HashType.COHERENT_ADD),
        (GridType.TILED, HashType.COHERENT_PRIME),
    ])
    def test_grid_grads_match_default_route(self, grid_type, hash_type):
        spec = grid_ops.make_grid_spec(
            2, 4, 2, 9, 4, 1.6, grid_type=grid_type, hash_type=hash_type)
        table = grid_ops.init_grid_params(jax.random.key(0),
                                          spec).reshape(-1)
        x = jax.random.uniform(jax.random.key(1), (64, 2))
        dy = jax.random.normal(jax.random.key(2),
                               (64, spec.n_levels
                                * spec.n_features_per_level))

        def run():
            def loss(t):
                y = grid_ops.grid_encode(spec, t, x, fast_scatter=True)
                return jnp.sum(y.astype(jnp.float32) * dy)

            return jax.grad(loss)(table)

        ref = np.asarray(run())
        os.environ["TCNN_TPU_SCATTER"] = "sortseg"
        try:
            got = np.asarray(run())
        finally:
            os.environ.pop("TCNN_TPU_SCATTER", None)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_input_grads_unaffected(self):
        spec = grid_ops.make_grid_spec(3, 3, 2, 8, 4, 1.5)
        table = grid_ops.init_grid_params(jax.random.key(0),
                                          spec).reshape(-1)
        x = jax.random.uniform(jax.random.key(1), (32, 3))

        def loss(xx):
            y = grid_ops.grid_encode(spec, table, xx, fast_scatter=True)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        ref = np.asarray(jax.grad(loss)(x))
        os.environ["TCNN_TPU_SCATTER"] = "sortseg"
        try:
            got = np.asarray(jax.grad(loss)(x))
        finally:
            os.environ.pop("TCNN_TPU_SCATTER", None)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
