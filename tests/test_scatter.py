"""Deterministic Pallas scatter-add / fast_take pair.

Runs the kernel in interpreter mode on CPU (conftest forces CPU); the
same code path compiles on TPU.  Ground truth is np.add.at — the exact
semantics the reference implements with atomicAdd (grid.h:214-320),
minus the nondeterminism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.ops import grid_ops
from tcnn_tpu.ops.pallas.scatter import fast_take, scatter_add_rows


def _np_scatter(idx, g, n_rows):
    out = np.zeros((n_rows, g.shape[1]), np.float32)
    np.add.at(out, np.asarray(idx), np.asarray(g))
    return out


class TestScatterKernel:
    @pytest.mark.parametrize("f", [1, 2, 4, 8])
    def test_matches_np_add_at(self, f):
        key = jax.random.key(0)
        idx = jax.random.randint(key, (3000,), 0, 257, jnp.int32)
        g = jax.random.normal(jax.random.key(1), (3000, f), jnp.float32)
        out = scatter_add_rows(idx, g, 257)
        np.testing.assert_allclose(np.asarray(out), _np_scatter(idx, g, 257),
                                   rtol=1e-5, atol=1e-4)

    def test_non_tile_multiple_update_count(self):
        # Padding path: M not a multiple of the kernel tile.
        idx = jax.random.randint(jax.random.key(0), (777,), 0, 100, jnp.int32)
        g = jax.random.normal(jax.random.key(1), (777, 2), jnp.float32)
        out = scatter_add_rows(idx, g, 100)
        np.testing.assert_allclose(np.asarray(out), _np_scatter(idx, g, 100),
                                   rtol=1e-5, atol=1e-4)

    def test_deterministic(self):
        idx = jax.random.randint(jax.random.key(0), (4096,), 0, 64, jnp.int32)
        g = jax.random.normal(jax.random.key(1), (4096, 2), jnp.float32)
        a = np.asarray(scatter_add_rows(idx, g, 64))
        b = np.asarray(scatter_add_rows(idx, g, 64))
        np.testing.assert_array_equal(a, b)


class TestFastTakeAD:
    def test_take_grad_is_scatter(self):
        tab = jax.random.normal(jax.random.key(0), (300, 2))
        idx = jax.random.randint(jax.random.key(1), (1000,), 0, 300, jnp.int32)
        co = jax.random.normal(jax.random.key(2), (1000, 2))

        g_fast = jax.grad(lambda t: jnp.sum(fast_take(t, idx) * co))(tab)
        g_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, idx, axis=0) * co))(tab)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-4)

    def test_second_order_rev_over_rev(self):
        tab = jax.random.normal(jax.random.key(0), (50, 2))
        idx = jax.random.randint(jax.random.key(1), (200,), 0, 50, jnp.int32)

        def loss(t):
            y = fast_take(t, idx)
            return jnp.sum(jnp.sin(y) ** 2)

        def ref(t):
            y = jnp.take(t, idx, axis=0)
            return jnp.sum(jnp.sin(y) ** 2)

        # grad-of-grad-norm: second-order through scatter<->take pair.
        g2 = jax.grad(lambda t: jnp.sum(jax.grad(loss)(t) ** 2))(tab)
        r2 = jax.grad(lambda t: jnp.sum(jax.grad(ref)(t) ** 2))(tab)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(r2),
                                   rtol=1e-4, atol=1e-4)


class TestGridFastScatter:
    def _spec(self, interp=grid_ops.InterpolationType.SMOOTHSTEP):
        return grid_ops.make_grid_spec(2, 4, 2, 10, 4, 1.5,
                                       interpolation=interp)

    def test_grid_table_grads_match_reference_path(self):
        spec = self._spec()
        table = grid_ops.init_grid_params(jax.random.key(0), spec)
        x = jax.random.uniform(jax.random.key(1), (128, 2))
        co = jax.random.normal(jax.random.key(2),
                               (128, spec.n_output_dims), jnp.float32)

        def loss(fast):
            def f(t):
                y = grid_ops.grid_encode(spec, t, x, fast_scatter=fast)
                return jnp.sum(y.astype(jnp.float32) * co)
            return f

        g_fast = jax.grad(loss(True))(table)
        g_ref = jax.grad(loss(False))(table)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_grid_bwd_bwd_matches(self):
        # Eikonal-style: grad wrt params THROUGH grad wrt input.
        spec = self._spec()
        table = grid_ops.init_grid_params(jax.random.key(0), spec)
        x = jax.random.uniform(jax.random.key(1), (32, 2),
                               minval=0.1, maxval=0.9)

        def eik(fast):
            def f(t):
                gx = jax.grad(lambda xx: jnp.sum(
                    grid_ops.grid_encode(spec, t, xx, fast_scatter=fast)
                    .astype(jnp.float32)))(x)
                return jnp.sum(gx * gx)
            return f

        h_fast = jax.grad(eik(True))(table)
        h_ref = jax.grad(eik(False))(table)
        np.testing.assert_allclose(np.asarray(h_fast), np.asarray(h_ref),
                                   rtol=1e-4, atol=1e-6)


class TestLayoutAndFallbacks:
    def test_soa_output_is_transpose(self):
        spec = grid_ops.make_grid_spec(2, 4, 2, 10, 4, 1.5)
        table = grid_ops.init_grid_params(jax.random.key(0), spec)
        x = jax.random.uniform(jax.random.key(1), (64, 2))
        a = grid_ops.grid_encode(spec, table, x, soa=False)
        b = grid_ops.grid_encode(spec, table, x, soa=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b).T)

    def test_large_table_xla_fallback(self, monkeypatch):
        # Force the VMEM budget below the table size: the scatter must
        # fall back to the XLA path and still match np.add.at.
        from tcnn_tpu.ops.pallas import scatter as sc

        monkeypatch.setattr(sc, "_VMEM_BUDGET", 1)
        idx = jax.random.randint(jax.random.key(0), (2000,), 0, 300, jnp.int32)
        g = jax.random.normal(jax.random.key(1), (2000, 2), jnp.float32)
        out = sc.scatter_add_rows(idx, g, 300)
        np.testing.assert_allclose(np.asarray(out), _np_scatter(idx, g, 300),
                                   rtol=1e-5, atol=1e-4)
        gs = (g[:, 0], g[:, 1])
        out2 = sc.scatter_add_cols(idx, gs, 300)
        np.testing.assert_allclose(np.asarray(out2).reshape(300, 2),
                                   _np_scatter(idx, g, 300),
                                   rtol=1e-5, atol=1e-4)


class TestWeightedKernels:
    """Direct unit tests of the fused weighted scatter kernels against
    the XLA fallback formulas (interpret mode on CPU)."""

    @pytest.mark.parametrize("f", [1, 2, 4])
    def test_weighted_matches_xla(self, f):
        from tcnn_tpu.ops.pallas import scatter as sc

        L_, C_, B_ = 3, 4, 1024
        n_rows = 500
        key = jax.random.key(f)
        idx = jax.random.randint(key, (L_ * C_ * B_,), 0, n_rows, jnp.int32)
        w = jax.random.uniform(jax.random.fold_in(key, 1), (L_ * C_ * B_,))
        dc = jax.random.normal(jax.random.fold_in(key, 2), (L_ * f, B_))
        got = sc.scatter_add_weighted(idx, w, dc, n_rows, f, C_)
        want = sc._scatter_weighted_xla(idx, w, dc, n_rows, f, C_)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("f", [1, 2, 4])
    def test_pairs_match_xla(self, f):
        from tcnn_tpu.ops.pallas import scatter as sc

        L_, CP_, B_ = 3, 2, 1024
        n_rows = 500
        key = jax.random.key(10 + f)
        # Even base rows < n_rows - 1 so idx+1 is always in range.
        idx = jax.random.randint(key, (L_ * CP_ * B_,), 0, n_rows - 1,
                                 jnp.int32)
        w_e = jax.random.uniform(jax.random.fold_in(key, 1), (L_ * CP_ * B_,))
        w_o = jax.random.uniform(jax.random.fold_in(key, 2), (L_ * CP_ * B_,))
        dc = jax.random.normal(jax.random.fold_in(key, 3), (L_ * f, B_))
        got = sc.scatter_add_weighted_pairs(idx, w_e, w_o, dc, n_rows, f, CP_)
        want = sc._scatter_pairs_xla(idx, w_e, w_o, dc, n_rows, f, CP_)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)

    def test_pairs_last_packed_row(self):
        """A pair whose even corner is the table's second-to-last entry
        exercises the padded accumulator row."""
        from tcnn_tpu.ops.pallas import scatter as sc

        f, CP_, B_ = 2, 1, 1024
        n_rows = 512
        idx = jnp.full((B_,), n_rows - 2, jnp.int32)
        w_e = jnp.ones((B_,))
        w_o = jnp.ones((B_,))
        dc = jnp.ones((f, B_))
        got = np.asarray(sc.scatter_add_weighted_pairs(
            idx, w_e, w_o, dc, n_rows, f, CP_)).reshape(n_rows, f)
        assert got[n_rows - 2, 0] == B_ and got[n_rows - 1, 1] == B_
        assert np.abs(got[: n_rows - 2]).max() == 0

    def test_weighted_second_order(self):
        from jax.test_util import check_grads

        from tcnn_tpu.ops.pallas import scatter as sc

        # B >= 1024 keeps the Pallas kernel engaged (smaller batches
        # fall back to XLA since the Mosaic T(1024) SMEM-alignment fix).
        L_, C_, B_ = 2, 4, 1024
        n_rows = 300
        key = jax.random.key(7)
        idx = jax.random.randint(key, (L_ * C_ * B_,), 0, n_rows, jnp.int32)
        w = jax.random.uniform(jax.random.fold_in(key, 1), (L_ * C_ * B_,))
        dc = jax.random.normal(jax.random.fold_in(key, 2), (L_ * 2, B_))
        check_grads(
            lambda w, dc: jnp.sum(
                sc.scatter_add_weighted(idx, w, dc, n_rows, 2, C_) ** 2),
            (w, dc), order=2, modes=["rev"], atol=1e-2, rtol=1e-2)

    def test_small_batch_falls_back_to_xla(self):
        """Batches whose largest power-of-two divisor is < 1024 cannot
        use the SMEM-streamed kernels on real TPU (Mosaic T(1024)
        layout rule); they must fall back to XLA and stay correct."""
        from tcnn_tpu.ops.pallas import scatter as sc

        assert sc._weighted_tile(512, 2) == 0
        assert sc._weighted_tile(256, 2) == 0
        assert sc._weighted_tile(1024, 2) >= 1024
        L_, C_, B_ = 2, 4, 512
        n_rows = 128
        key = jax.random.key(9)
        idx = jax.random.randint(key, (L_ * C_ * B_,), 0, n_rows, jnp.int32)
        w = jax.random.uniform(jax.random.fold_in(key, 1), (L_ * C_ * B_,))
        dc = jax.random.normal(jax.random.fold_in(key, 2), (L_ * 2, B_))
        got = sc.scatter_add_weighted(idx, w, dc, n_rows, 2, C_)
        want = sc._scatter_weighted_xla(idx, w, dc, n_rows, 2, C_)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
