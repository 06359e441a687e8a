"""Grid encoding tests — level geometry against the reference's
formulas, interpolation against hand math, and the gradcheck suite
replacing scripts/test_grid_bwdbwd.py (first AND second order, hash and
dense, linear and smoothstep)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import tcnn_tpu as tcnn
from tcnn_tpu.common import GridType, HashType, InterpolationType
from tcnn_tpu.ops import grid_ops


def key(i=0):
    return jax.random.key(i)


class TestGridSpec:
    def test_level_geometry_matches_reference_formulas(self):
        # grid_scale/grid_resolution in FLOAT32, exactly like the
        # reference host code (common_device.h:709-718 exp2f/ceilf;
        # grid.h:694 std::log2(float)).  f32 vs f64 genuinely differ
        # here: at per_level_scale=1.5, level 3's scale is exp2f(3·
        # log2f(1.5))·16−1 = 53.0 EXACTLY in f32 (verified against
        # libm exp2f) → resolution 54, while f64 gives 53.0000…01 →
        # resolution 55 — the wrong geometry for reference checkpoints.
        spec = grid_ops.make_grid_spec(
            n_dims=2, n_levels=4, n_features_per_level=2,
            log2_hashmap_size=15, base_resolution=16, per_level_scale=1.5)
        lg = np.float32(np.log2(np.float32(1.5)))
        for l, level in enumerate(spec.levels):
            scale = float(np.exp2(np.float32(l) * lg) * np.float32(16)
                          - np.float32(1))
            assert abs(level.scale - scale) < 1e-4
            assert level.resolution == int(np.ceil(np.float32(scale))) + 1
        assert spec.levels[3].scale == 53.0
        assert spec.levels[3].resolution == 54   # f64 math would say 55

    def test_offsets_rounded_to_8(self):
        spec = grid_ops.make_grid_spec(2, 4, 2, 15, 16, 1.5)
        for level in spec.levels:
            assert level.offset % 8 == 0
            assert level.size % 8 == 0 or level.size == min(
                level.size, 1 << 15)

    def test_hash_kicks_in_when_dense_exceeds_table(self):
        spec = grid_ops.make_grid_spec(3, 8, 2, 10, 4, 2.0,
                                       grid_type=GridType.HASH)
        dense_fits = [lvl.resolution ** 3 <= (1 << 10) for lvl in spec.levels]
        for lvl, fits in zip(spec.levels, dense_fits):
            assert lvl.use_hash == (not fits)

    def test_dense_never_hashes(self):
        spec = grid_ops.make_grid_spec(2, 6, 2, 10, 4, 1.5,
                                       grid_type=GridType.DENSE)
        assert not any(l.use_hash for l in spec.levels)

    def test_tiled_caps_at_base_resolution(self):
        spec = grid_ops.make_grid_spec(2, 6, 2, 19, 4, 2.0,
                                       grid_type=GridType.TILED)
        for lvl in spec.levels:
            assert lvl.size <= 4 ** 2 + 8  # base_res^D (round-to-8 applied
            # before the tiled cap, grid.h:700-706, so cap is exact)
            assert lvl.size <= 16

    def test_n_params(self):
        # config_hash-like: 16 levels, F=2, log2=15, base 16, scale 1.5.
        spec = grid_ops.make_grid_spec(2, 16, 2, 15, 16, 1.5)
        assert spec.n_params == spec.n_entries * 2
        assert spec.n_output_dims == 32


class TestGridForward:
    def test_bilinear_interpolation_exact(self):
        """One dense 2-D level: compare against hand-rolled bilerp."""
        spec = grid_ops.make_grid_spec(
            n_dims=2, n_levels=1, n_features_per_level=1,
            log2_hashmap_size=19, base_resolution=4, per_level_scale=2.0,
            grid_type=GridType.DENSE)
        lvl = spec.levels[0]
        table = jax.random.normal(key(1), (spec.n_entries, 1))
        x = jnp.array([[0.37, 0.61]])
        y = float(grid_ops.grid_encode(spec, table, x)[0, 0])

        # Hand math: pos = x·scale + 0.5 (pos_fract, common_device.h:826).
        tab = np.asarray(table)[:, 0]
        res = lvl.resolution
        pos = np.array([0.37, 0.61]) * lvl.scale + 0.5
        cell = np.floor(pos).astype(int)
        f = pos - cell
        acc = 0.0
        for cx in (0, 1):
            for cy in (0, 1):
                w = (f[0] if cx else 1 - f[0]) * (f[1] if cy else 1 - f[1])
                idx = ((cell[0] + cx) + (cell[1] + cy) * res) % lvl.size
                acc += w * tab[idx]
        assert abs(y - acc) < 1e-5

    def test_output_is_level_major(self):
        spec = grid_ops.make_grid_spec(2, 3, 2, 10, 4, 2.0)
        table = jax.random.normal(key(2), (spec.n_entries, 2))
        x = jax.random.uniform(key(3), (5, 2))
        y = grid_ops.grid_encode(spec, table, x)
        assert y.shape == (5, 6)
        # Zeroing level 1's rows only affects columns [2, 4).
        t2 = table.at[spec.levels[1].offset:spec.levels[2].offset].set(0.0)
        y2 = grid_ops.grid_encode(spec, t2, x)
        np.testing.assert_allclose(np.asarray(y[:, :2]), np.asarray(y2[:, :2]))
        np.testing.assert_allclose(np.asarray(y[:, 4:]), np.asarray(y2[:, 4:]))
        assert np.abs(np.asarray(y2[:, 2:4])).max() < 1e-6

    def test_max_level_masking(self):
        enc = tcnn.GridEncoding(2, n_levels=4, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4)
        params = enc.init(key(4))
        x = jax.random.uniform(key(5), (3, 2))
        enc.max_level = 2
        y = np.asarray(enc.apply(params, x))
        assert np.abs(y[:, 4:]).max() == 0.0
        assert np.abs(y[:, :4]).max() > 0.0

    def test_4d_grid(self):
        """The fork's raison d'être: 4-D grids (grid.h:1177)."""
        enc = tcnn.GridEncoding(4, n_levels=4, n_features_per_level=2,
                                log2_hashmap_size=8, base_resolution=3)
        params = enc.init(key(6))
        x = jax.random.uniform(key(7), (32, 4))
        y = enc.apply(params, x)
        assert y.shape == (32, 8)
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_hash_types_differ(self):
        xs = jax.random.uniform(key(8), (64, 3))
        outs = []
        for ht in (HashType.PRIME, HashType.COHERENT_PRIME,
                   HashType.REVERSED_PRIME):
            spec = grid_ops.make_grid_spec(3, 2, 1, 6, 16, 2.0, hash_type=ht)
            table = jax.random.normal(key(9), (spec.n_entries, 1))
            outs.append(np.asarray(grid_ops.grid_encode(spec, table, xs)))
        assert not np.allclose(outs[0], outs[1])
        assert not np.allclose(outs[1], outs[2])

    def test_nearest_interpolation_picks_corner(self):
        spec = grid_ops.make_grid_spec(
            2, 1, 1, 19, 4, 2.0, grid_type=GridType.DENSE,
            interpolation=InterpolationType.NEAREST)
        table = jax.random.normal(key(10), (spec.n_entries, 1))
        x = jax.random.uniform(key(11), (32, 2))
        y = np.asarray(grid_ops.grid_encode(spec, table, x))[:, 0]
        assert all(any(abs(v - t) < 1e-6 for t in np.asarray(table)[:, 0])
                   for v in y)


class TestRngHash:
    """HashType.Rng — pcg32 skip-ahead hash (common_device.h:678-691,
    pcg32.h).  The traced uint32-limb implementation must be bit-exact
    to the pure-Python pcg32 model."""

    @pytest.mark.parametrize("d", [2, 3, 4])
    def test_vectorized_matches_host_model(self, d):
        from tcnn_tpu.ops import pcg32_hash

        rs = np.random.RandomState(d)
        coords = rs.randint(0, 2 ** 32, size=(d, 64), dtype=np.uint64)
        coords = coords.astype(np.uint32)
        got = np.asarray(pcg32_hash.rng_hash(
            [jnp.asarray(coords[i]) for i in range(d)]))
        want = np.array([pcg32_hash.rng_hash_host(coords[:, j])
                         for j in range(64)], np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_known_scalar_value(self):
        # Anchor one value against the hand-traced pcg32 sequence:
        # advance(0) leaves the seeded state; output is then fixed.
        from tcnn_tpu.ops import pcg32_hash

        state, inc = pcg32_hash.pcg32_state_after_seed(1337)
        want = pcg32_hash.pcg32_output(state)
        got = int(np.asarray(pcg32_hash.rng_hash(
            [jnp.zeros((1,), jnp.uint32), jnp.zeros((1,), jnp.uint32)]))[0])
        assert got == want

    def test_grid_encode_with_rng_hash(self):
        spec = grid_ops.make_grid_spec(3, 3, 2, 6, 8, 1.5,
                                       hash_type=HashType.RNG)
        table = jax.random.normal(key(30), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(31), (32, 3))
        y = grid_ops.grid_encode(spec, table, x)
        assert y.shape == (32, 6)
        assert bool(jnp.all(jnp.isfinite(y)))
        # Differs from the prime hashes (it is a different hash).
        spec_p = grid_ops.make_grid_spec(3, 3, 2, 6, 8, 1.5,
                                         hash_type=HashType.PRIME)
        y_p = grid_ops.grid_encode(spec_p, table, x)
        assert not np.allclose(np.asarray(y), np.asarray(y_p))
        # Gradients flow.
        g = jax.grad(lambda t: float(0) + jnp.sum(
            grid_ops.grid_encode(spec, t, x) ** 2))(table)
        assert float(jnp.abs(g).max()) > 0


class TestGridGradients:
    """Replaces scripts/test_grid_bwdbwd.py's gradcheck suite.

    The reference implements three second-order Hessian blocks by hand
    (grid.h:351-650, ✓ ddLdx_dx / ddLdx_ddLdy / ddLdx_dgrid); here ALL
    blocks come from autodiff, so check_grads(order=2) covers a strict
    superset — and deterministically (no atomicAdd nondet_tol needed).
    """

    @pytest.mark.parametrize("grid_type", [GridType.HASH, GridType.DENSE])
    @pytest.mark.parametrize("interp",
                             [InterpolationType.LINEAR,
                              InterpolationType.SMOOTHSTEP])
    def test_table_grads(self, grid_type, interp):
        spec = grid_ops.make_grid_spec(2, 2, 2, 6, 4, 2.0,
                                       grid_type=grid_type,
                                       interpolation=interp)
        table = jax.random.normal(key(12), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(13), (8, 2), minval=0.1, maxval=0.9)
        check_grads(lambda t: grid_ops.grid_encode(spec, t, x), (table,),
                    order=2, modes=["rev"], atol=1e-2, rtol=1e-2)

    def test_input_grads_smoothstep_second_order(self):
        # Smoothstep is C¹ so d²y/dx² exists (the reference's
        # bwd-bwd-input kernel needs smoothstep too, grid.h:457-623).
        spec = grid_ops.make_grid_spec(
            2, 2, 2, 6, 4, 2.0, interpolation=InterpolationType.SMOOTHSTEP)
        table = jax.random.normal(key(14), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(15), (4, 2), minval=0.3, maxval=0.45)
        check_grads(lambda x: grid_ops.grid_encode(spec, table, x), (x,),
                    order=2, modes=["rev"], atol=5e-2, rtol=5e-2)

    def test_input_grads_linear_first_order(self):
        spec = grid_ops.make_grid_spec(2, 2, 2, 6, 4, 2.0)
        table = jax.random.normal(key(16), (spec.n_entries, 2)) * 0.1
        # Stay away from cell boundaries where linear interp is not diff'able.
        x = jnp.asarray(np.random.RandomState(0).uniform(0.31, 0.34, (4, 2)),
                        jnp.float32)
        check_grads(lambda x: grid_ops.grid_encode(spec, table, x), (x,),
                    order=1, modes=["rev"], atol=5e-2, rtol=5e-2)

    def test_f3_fast_path_grads_correct(self):
        """F=3 does not divide the 128-lane packed layout; the fast
        path must fall back to the XLA scatter and still produce grads
        matching the slow path (the round-1 advisor found this case
        silently wrong)."""
        spec = grid_ops.make_grid_spec(2, 3, 3, 8, 4, 1.7)
        table = jax.random.normal(key(40), (spec.n_entries, 3)) * 0.1
        x = jax.random.uniform(key(41), (2048, 2))

        def loss(fast):
            return lambda t: jnp.sum(grid_ops.grid_encode(
                spec, t, x, fast_scatter=fast) ** 2)

        g_fast = jax.grad(loss(True))(table)
        g_slow = jax.grad(loss(False))(table)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow),
                                   rtol=1e-4, atol=1e-5)

    def test_stochastic_interpolation(self):
        """grid.h:284-299: stochastic backward routes each (sample,
        level) gradient entirely to ONE corner; forward is unchanged.
        Deterministic here (fixed counter seed)."""
        kw = dict(n_dims=2, n_levels=2, n_features_per_level=1,
                  log2_hashmap_size=8, base_resolution=4,
                  per_level_scale=2.0)
        spec_s = grid_ops.make_grid_spec(**kw, stochastic_interpolation=True)
        spec_d = grid_ops.make_grid_spec(**kw)
        table = jax.random.normal(key(50), (spec_s.n_entries, 1))
        x = jax.random.uniform(key(51), (1, 2), minval=0.3, maxval=0.7)

        # Forward identical to deterministic interpolation.
        np.testing.assert_allclose(
            np.asarray(grid_ops.grid_encode(spec_s, table, x)),
            np.asarray(grid_ops.grid_encode(spec_d, table, x)), rtol=1e-6)

        # Backward: ONE nonzero table entry per level, magnitude == the
        # full cotangent (weight 1.0), at one of the 4 corner rows.
        g = jax.grad(lambda t: jnp.sum(
            grid_ops.grid_encode(spec_s, t, x)))(table)
        g = np.asarray(g)[:, 0]
        for lv in spec_s.levels:
            seg = g[lv.offset:lv.offset + lv.size]
            nz = np.nonzero(seg)[0]
            assert len(nz) == 1, f"expected 1 corner hit, got {len(nz)}"
            np.testing.assert_allclose(seg[nz[0]], 1.0, rtol=1e-6)

        # Deterministic across runs.
        g2 = jax.grad(lambda t: jnp.sum(
            grid_ops.grid_encode(spec_s, t, x)))(table)
        assert bool(jnp.all(jnp.asarray(g[:, None]) == g2))

        # Statistical soundness: over many samples the stochastic
        # gradient's expectation matches the deterministic gradient.
        xb = jax.random.uniform(key(52), (8192, 2))
        gs = jax.grad(lambda t: jnp.sum(
            grid_ops.grid_encode(spec_s, t, xb)))(table)
        gd = jax.grad(lambda t: jnp.sum(
            grid_ops.grid_encode(spec_d, t, xb)))(table)
        # Totals agree exactly (each sample contributes mass 1/level).
        np.testing.assert_allclose(float(jnp.sum(gs)), float(jnp.sum(gd)),
                                   rtol=1e-3)

    def test_backward_deterministic(self):
        """Bit-identical grads across runs — stronger than the
        reference's atomicAdd (nondet_tol=1e-3 in test_grid_bwdbwd)."""
        spec = grid_ops.make_grid_spec(3, 4, 2, 8, 4, 1.5)
        table = jax.random.normal(key(17), (spec.n_entries, 2))
        x = jax.random.uniform(key(18), (4096, 3))

        def loss(t):
            return jnp.sum(grid_ops.grid_encode(spec, t, x) ** 2)

        g1 = jax.jit(jax.grad(loss))(table)
        g2 = jax.jit(jax.grad(loss))(table)
        assert bool(jnp.all(g1 == g2))

    def test_bwdbwd_api(self):
        """Module-level backward_backward_input parity (object.h:270)."""
        enc = tcnn.GridEncoding(2, n_levels=2, n_features_per_level=2,
                                log2_hashmap_size=6, base_resolution=4,
                                interpolation=InterpolationType.SMOOTHSTEP)
        params = enc.init(key(19))
        x = jax.random.uniform(key(20), (4, 2), minval=0.2, maxval=0.8)
        dL_dy = jax.random.normal(key(21), (4, enc.n_output_dims))
        dL_ddLdx = jax.random.normal(key(22), (4, 2))
        ddLdy, dparams, dx = enc.backward_backward_input(
            params, x, dL_dy, dL_ddLdx)
        assert ddLdy.shape == dL_dy.shape
        assert dx.shape == x.shape
        assert jax.tree_util.tree_structure(
            dparams) == jax.tree_util.tree_structure(params)


class TestOddRowCountPairedForward:
    """Round-2 advisor (high): the paired double-view forward is only
    valid for an even TOTAL table row count.  TILED grids with
    base_resolution=3 produce a 9-row level (sizes below 8 are not
    rounded), so the fast path must fall back — forward AND backward —
    to the reference math."""

    def _spec(self):
        return grid_ops.make_grid_spec(
            2, 3, 2, 10, 3, 2.0, grid_type=GridType.TILED,
            hash_type=HashType.COHERENT_ADD)

    def test_total_rows_odd(self):
        spec = self._spec()
        assert spec.n_entries % 2 == 1  # the regression precondition

    def test_forward_matches_reference_path(self):
        spec = self._spec()
        table = jax.random.normal(key(70), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(71), (512, 2))
        y_fast = grid_ops.grid_encode(spec, table, x, fast_scatter=True)
        y_ref = grid_ops.grid_encode(spec, table, x, fast_scatter=False)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_table_grads_match(self):
        spec = self._spec()
        table = jax.random.normal(key(72), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(73), (512, 2))

        def loss(fast):
            return lambda t: jnp.sum(grid_ops.grid_encode(
                spec, t, x, fast_scatter=fast) ** 2)

        g_fast = jax.grad(loss(True))(table)
        g_slow = jax.grad(loss(False))(table)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow),
                                   rtol=1e-4, atol=1e-5)


class TestPerElementMaxLevel:
    """Per-sample coarse-to-fine masking — the reference's
    ``max_level_gpu`` device array (grid.h:69-92): sample b keeps
    levels l < frac[b]·n_levels + 1e-3; masked levels emit zeros and
    get zero grads for that sample."""

    def _setup(self):
        spec = grid_ops.make_grid_spec(2, 4, 2, 10, 4, 2.0)
        table = jax.random.normal(key(80), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(81), (1024, 2))
        # Sample fractions hitting 0, 1/L .. 1 boundaries.
        frac = jnp.asarray(
            np.random.RandomState(3).choice(
                [0.0, 0.25, 0.5, 0.75, 1.0], size=1024).astype(np.float32))
        return spec, table, x, frac

    @pytest.mark.parametrize("fast", [False, True])
    def test_masked_levels_zero(self, fast):
        spec, table, x, frac = self._setup()
        y = grid_ops.grid_encode(spec, table, x, fast_scatter=fast,
                                 max_level_per_element=frac)
        y = np.asarray(y)                      # (B, L·F)
        n_keep = np.minimum(
            np.floor(np.asarray(frac) * spec.n_levels + 1e-3).astype(int)
            + (np.mod(np.asarray(frac) * spec.n_levels, 1.0) == 0),
            spec.n_levels)
        # reference rule: level live iff level < frac*L + 1e-3
        for b in range(0, 1024, 97):
            live = np.arange(spec.n_levels) < (
                float(frac[b]) * spec.n_levels + 1e-3)
            for l in range(spec.n_levels):
                seg = y[b, l * 2:(l + 1) * 2]
                if not live[l]:
                    assert np.all(seg == 0), (b, l, seg)

    @pytest.mark.parametrize("fast", [False, True])
    def test_unmasked_levels_match_plain(self, fast):
        spec, table, x, _ = self._setup()
        frac = jnp.ones((1024,), jnp.float32)  # everything live
        y_m = grid_ops.grid_encode(spec, table, x, fast_scatter=fast,
                                   max_level_per_element=frac)
        y = grid_ops.grid_encode(spec, table, x, fast_scatter=fast)
        np.testing.assert_allclose(np.asarray(y_m), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("fast", [False, True])
    def test_grads_masked_per_sample(self, fast):
        """Table grads must exclude masked (sample, level) updates —
        compare against manually restricting the batch."""
        spec, table, x, _ = self._setup()
        b_half = 512
        frac = jnp.concatenate([jnp.zeros((b_half,)),
                                jnp.ones((1024 - b_half,))])

        g_masked = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=fast,
            max_level_per_element=frac) ** 2))(table)
        # frac=0 samples keep ONLY level 0 (reference rule: masked iff
        # level >= frac·L + 1e-3), so the manual equivalent is the
        # second half at full depth plus the first half at the static
        # max_level=1 cutoff.
        g_manual = jax.grad(lambda t: (
            jnp.sum(grid_ops.grid_encode(
                spec, t, x[b_half:], fast_scatter=fast) ** 2)
            + jnp.sum(grid_ops.grid_encode(
                spec, t, x[:b_half], fast_scatter=fast,
                max_level=1) ** 2)))(table)
        np.testing.assert_allclose(np.asarray(g_masked),
                                   np.asarray(g_manual),
                                   rtol=1e-3, atol=1e-4)


class TestForwardMode:
    """Forward-mode (jvp) differentiation through the reference jnp
    path (``fast_scatter=False``).

    The fast Pallas/matmul paths are reverse-only (like the reference
    bindings, modules.py:120-160) — their custom_vjp wrappers reject
    jvp by design.  The pure-jnp path has no custom rules, so XLA's
    native forward mode works to any order; these tests pin that as a
    supported (documented) capability beyond reference parity."""

    def _setup(self):
        spec = grid_ops.make_grid_spec(
            2, 3, 2, 6, 4, 1.6, grid_type=GridType.HASH,
            interpolation=InterpolationType.SMOOTHSTEP)
        table = grid_ops.init_grid_params(key(0), spec).reshape(-1) * 1e4
        x = jax.random.uniform(key(1), (8, 2))
        return spec, table, x

    def test_jacfwd_matches_jacrev_table(self):
        spec, table, x = self._setup()
        f = lambda t: grid_ops.grid_encode(spec, t, x, fast_scatter=False)
        jf = jax.jacfwd(f)(table)
        jr = jax.jacrev(f)(table)
        np.testing.assert_allclose(np.asarray(jf), np.asarray(jr),
                                   rtol=1e-5, atol=1e-6)

    def test_jacfwd_matches_jacrev_input(self):
        spec, table, x = self._setup()
        f = lambda xx: grid_ops.grid_encode(spec, table, xx,
                                            fast_scatter=False)
        jf = jax.jacfwd(f)(x)
        jr = jax.jacrev(f)(x)
        np.testing.assert_allclose(np.asarray(jf), np.asarray(jr),
                                   rtol=1e-4, atol=1e-5)

    def test_fwd_of_rev_second_order(self):
        """Hessian via jacfwd∘grad == jacrev∘grad (forward-over-reverse
        is the memory-cheap second-order composition)."""
        spec, table, x = self._setup()
        g = lambda xx: jnp.sum(grid_ops.grid_encode(
            spec, table, xx, fast_scatter=False) ** 2)
        h_fr = jax.jacfwd(jax.grad(g))(x)
        h_rr = jax.jacrev(jax.grad(g))(x)
        np.testing.assert_allclose(np.asarray(h_fr), np.asarray(h_rr),
                                   rtol=1e-3, atol=1e-4)

    def test_fast_path_jvp_falls_back(self):
        """Under a forward-mode trace the fast path auto-falls back to
        the jnp math (custom_vjp kernels are reverse-only), so jvp
        works on default settings and matches the jnp path."""
        spec, table, x = self._setup()
        v = jnp.ones_like(table)
        y_f, t_f = jax.jvp(lambda t: grid_ops.grid_encode(
            spec, t, x, fast_scatter=True), (table,), (v,))
        y_s, t_s = jax.jvp(lambda t: grid_ops.grid_encode(
            spec, t, x, fast_scatter=False), (table,), (v,))
        np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_s),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                                   rtol=1e-3, atol=1e-4)

    def test_stochastic_stays_reverse_only(self):
        """Stochastic interpolation keeps its custom-VJP scatter
        weights and rejects jvp (the fallback would silently change
        backward semantics)."""
        import dataclasses

        spec, table, x = self._setup()
        sspec = dataclasses.replace(spec, stochastic_interpolation=True)
        with pytest.raises(TypeError, match="custom_vjp"):
            jax.jvp(lambda t: grid_ops.grid_encode(
                sspec, t, x, fast_scatter=True), (table,), (table,))

    def test_check_grads_fwd_mode(self):
        spec, table, x = self._setup()
        f = lambda t, xx: jnp.sum(jnp.cos(grid_ops.grid_encode(
            spec, t, xx, fast_scatter=False)))
        check_grads(f, (table, x), order=2, modes=["fwd"],
                    rtol=2e-2, atol=2e-2)


class TestGridFactoryParity:
    """Config-factory behaviors of grid.h:1145-1205."""

    def test_n_features_determines_n_levels(self):
        enc = tcnn.create_encoding(2, {"otype": "HashGrid",
                                       "n_features": 24,
                                       "n_features_per_level": 2})
        assert enc.spec.n_levels == 12
        enc = tcnn.create_encoding(2, {"otype": "HashGrid",
                                       "n_grid_features": 16})
        assert enc.spec.n_levels == 8

    def test_n_features_and_n_levels_conflict(self):
        with pytest.raises(ValueError, match="n_features and n_levels"):
            tcnn.create_encoding(2, {"otype": "HashGrid",
                                     "n_features": 24, "n_levels": 12})

    def test_dense_default_per_level_scale(self):
        # Dense default: exp(log(256/base)/(n_levels-1)) (grid.h:1167).
        import math
        enc = tcnn.create_encoding(2, {"otype": "DenseGrid",
                                       "n_levels": 5,
                                       "base_resolution": 16})
        expected = math.exp(math.log(256.0 / 16.0) / 4)
        assert abs(enc.per_level_scale - expected) < 1e-6
        # Hash grids keep the flat 2.0 default.
        enc = tcnn.create_encoding(2, {"otype": "HashGrid"})
        assert enc.per_level_scale == 2.0


class TestSerialGroupedScatter:
    """BTF-scale serial scatter runs in VMEM-budget GROUPS of
    table-contiguous levels, one kernel call per group with group-local
    rows (grid_ops._serial_level_groups).  Round-5 fix: one whole-table
    call sized its accumulator by ALL levels, so past ~2.4M rows the
    kernel's VMEM check silently routed the entire backward to XLA's
    serialized scatter (the 1256 ms/step BTF backward of round 4)."""

    def test_group_partitioning(self):
        # Synthetic metas: (paired, size, offset); contiguous except a
        # gap before the last level.
        lv_meta = ((True, 1000, 0), (True, 1000, 1000), (True, 1000, 2000),
                   (True, 1000, 4000))
        import tcnn_tpu.ops.pallas.scatter as sc
        orig = sc.max_group_rows
        try:
            sc.max_group_rows = lambda f, paired, n_acc=2: 2000
            groups = grid_ops._serial_level_groups(lv_meta, [0, 1, 2, 3],
                                                   2, True)
        finally:
            sc.max_group_rows = orig
        # Cap splits {0,1} from {2}; the offset gap isolates {3}.
        assert groups == [[0, 1], [2], [3]]

    def test_single_oversized_level_is_own_group(self):
        lv_meta = ((True, 5000, 0), (True, 100, 5000))
        import tcnn_tpu.ops.pallas.scatter as sc
        orig = sc.max_group_rows
        try:
            sc.max_group_rows = lambda f, paired, n_acc=2: 2000
            groups = grid_ops._serial_level_groups(lv_meta, [0, 1], 2, True)
        finally:
            sc.max_group_rows = orig
        assert groups == [[0], [1]]

    @pytest.mark.parametrize("hash_type", [HashType.COHERENT_ADD,
                                           HashType.COHERENT_PRIME])
    def test_grouped_grads_match_reference(self, monkeypatch, hash_type):
        """Force multi-group partitioning with a tiny VMEM cap; grads
        must match the jnp autodiff reference exactly (paired levels →
        grouped pair kernels incl. per-group wrap correction; unpaired
        → grouped weighted scatter)."""
        import tcnn_tpu.ops.pallas.scatter as sc

        spec = grid_ops.make_grid_spec(2, 6, 2, 10, 4, 2.0,
                                       hash_type=hash_type)
        # Several levels over the cap → >1 group (verify partitioning).
        paired = hash_type == HashType.COHERENT_ADD
        lv_meta = tuple((paired, lv.size, lv.offset) for lv in spec.levels)
        monkeypatch.setattr(sc, "max_group_rows",
                            lambda f, p, n_acc=2: 1100)
        monkeypatch.setenv("TCNN_TPU_DISABLE_MM", "1")
        groups = grid_ops._serial_level_groups(
            lv_meta, list(range(6)), 2, paired)
        assert len(groups) >= 3

        table = jax.random.normal(key(60), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(61), (2048, 2))

        def loss(fast):
            return lambda t: jnp.sum(
                grid_ops.grid_encode(spec, t, x, fast_scatter=fast) ** 2)

        g_grouped = jax.grad(loss(True))(table)
        g_ref = jax.grad(loss(False))(table)
        np.testing.assert_allclose(np.asarray(g_grouped),
                                   np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_grouped_second_order(self, monkeypatch):
        """Eikonal-style grad-of-grad through the grouped scatter."""
        import tcnn_tpu.ops.pallas.scatter as sc

        spec = grid_ops.make_grid_spec(
            2, 4, 2, 10, 4, 2.0, hash_type=HashType.COHERENT_ADD,
            interpolation=InterpolationType.SMOOTHSTEP)
        monkeypatch.setattr(sc, "max_group_rows",
                            lambda f, p, n_acc=2: 1100)
        monkeypatch.setenv("TCNN_TPU_DISABLE_MM", "1")
        table = jax.random.normal(key(62), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(63), (64, 2), minval=0.3, maxval=0.45)
        check_grads(lambda t: grid_ops.grid_encode(spec, t, x), (table,),
                    order=2, modes=["rev"], atol=1e-2, rtol=1e-2)
