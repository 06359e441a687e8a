"""Tests for the MXU one-hot matmul grid kernels (ops/pallas/grid_matmul)
and their routing inside grid_ops.

The matmul path is the default fast path for levels whose tables fit
the MAC budget — any hash type, any F.  Ground truth is the jnp path
(fast_scatter=False).  f32 tables go through the two-term bf16 split
(~2^-17 relative), so tolerances here are ~1e-4.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from tcnn_tpu.common import GridType, HashType, InterpolationType
from tcnn_tpu.ops import grid_ops
from tcnn_tpu.ops.pallas import grid_matmul as gm


def key(i=0):
    return jax.random.key(i)


def _mk(hash_type=HashType.COHERENT_PRIME, n_levels=4, f=2, hashmap=7,
        base=4, scale=1.8, **kw):
    return grid_ops.make_grid_spec(2, n_levels, f, hashmap, base, scale,
                                   hash_type=hash_type, **kw)


RTOL = 2e-4


class TestMatmulPathParity:
    @pytest.mark.parametrize("hash_type", [
        HashType.COHERENT_PRIME, HashType.PRIME, HashType.REVERSED_PRIME,
        HashType.COHERENT_ADD, HashType.RNG])
    def test_forward_and_grads_all_hash_types(self, hash_type):
        """The matmul kernels are hash-type agnostic — the reference's
        own hash set (common_device.h:648-707) runs the fast path too,
        unlike the pairing-based kernels."""
        spec = _mk(hash_type)
        assert any(lv.use_hash for lv in spec.levels)
        table = jax.random.normal(key(1), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(2), (1024, 2))

        def run(fast):
            def loss(t):
                y = grid_ops.grid_encode(spec, t, x, fast_scatter=fast)
                return jnp.sum(y ** 2), y
            (l, y), g = jax.value_and_grad(loss, has_aux=True)(table)
            return y, g

        y_f, g_f = run(True)
        y_s, g_s = run(False)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                                   rtol=RTOL, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-4)

    def test_f3_routes_through_matmul(self):
        """F=3 divides neither 128 nor the packed-pair layout; the
        matmul kernels handle ANY F natively."""
        spec = _mk(n_levels=3, f=3)
        mm, serial = grid_ops._route_levels(
            (3, 4, tuple((True, lv.size, lv.offset) for lv in spec.levels)),
            jnp.float32, 1024)
        assert mm == [0, 1, 2] and serial == []

    def test_mixed_routing_big_levels_serial(self, monkeypatch):
        """Levels above the MAC budget go to the serial kernels; the
        combined result must still match the jnp path."""
        monkeypatch.setenv("TCNN_TPU_MM_BUDGET_PAIRED", "600")
        monkeypatch.setenv("TCNN_TPU_MM_BUDGET_UNPAIRED", "600")
        spec = _mk(HashType.COHERENT_ADD, n_levels=5, hashmap=9)
        meta = tuple((True, lv.size, lv.offset) for lv in spec.levels)
        mm, serial = grid_ops._route_levels((2, 4, meta), jnp.float32, 1024)
        assert mm and serial, (mm, serial)  # genuinely mixed
        table = jax.random.normal(key(3), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(4), (1024, 2))
        g_f = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=True) ** 2))(table)
        g_s = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=False) ** 2))(table)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-4)

    def test_second_order_through_matmul(self):
        spec = _mk(n_levels=2, hashmap=6,
                   interpolation=InterpolationType.SMOOTHSTEP)
        table = jax.random.normal(key(5), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(6), (512, 2), minval=0.1, maxval=0.9)
        check_grads(
            lambda t: grid_ops.grid_encode(spec, t, x, fast_scatter=True),
            (table,), order=2, modes=["rev"], atol=1e-2, rtol=1e-2)

    def test_input_grads_through_matmul(self):
        spec = _mk(n_levels=2, hashmap=6,
                   interpolation=InterpolationType.SMOOTHSTEP)
        table = jax.random.normal(key(7), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(8), (512, 2), minval=0.3, maxval=0.45)
        gx_f = jax.grad(lambda x: jnp.sum(grid_ops.grid_encode(
            spec, table, x, fast_scatter=True) ** 2))(x)
        gx_s = jax.grad(lambda x: jnp.sum(grid_ops.grid_encode(
            spec, table, x, fast_scatter=False) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_s),
                                   rtol=1e-3, atol=1e-4)

    def test_deterministic(self):
        spec = _mk()
        table = jax.random.normal(key(9), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(10), (2048, 2))
        f = jax.jit(jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=True) ** 2)))
        g1, g2 = f(table), f(table)
        assert np.array_equal(np.asarray(g1), np.asarray(g2))

    def test_bf16_table_single_pass(self):
        """bf16 tables use the single-pass kernel (reference fp16
        compute-param parity, trainer.h:68-87); tolerance is bf16's."""
        spec = _mk(n_levels=3)
        table = (jax.random.normal(key(11), (spec.n_entries, 2)) * 0.1
                 ).astype(jnp.bfloat16)
        x = jax.random.uniform(key(12), (1024, 2))
        y_f = grid_ops.grid_encode(spec, table, x, fast_scatter=True)
        y_s = grid_ops.grid_encode(spec, table, x, fast_scatter=False)
        np.testing.assert_allclose(
            np.asarray(y_f, np.float32), np.asarray(y_s, np.float32),
            rtol=2e-2, atol=1e-3)


class TestKernelUnits:
    def test_scatter_levels_matmul_naive(self):
        rng = np.random.RandomState(0)
        Lg, C, F, B, r_pad = 2, 4, 2, 512, 256
        sizes = [200, 256]
        idxl = jnp.asarray(np.concatenate(
            [rng.randint(0, s, (C, B)) for s in sizes]).astype(np.int32))
        w = jnp.asarray(rng.rand(Lg * C, B).astype(np.float32))
        dc = jnp.asarray(rng.randn(Lg * F, B).astype(np.float32))
        out = np.asarray(gm.scatter_levels_matmul(idxl, w, dc, r_pad, F, C))
        want = np.zeros((Lg, r_pad, F), np.float32)
        idxn, wn, dcn = map(np.asarray, (idxl, w, dc))
        for l in range(Lg):
            for c in range(C):
                for b in range(B):
                    want[l, idxn[l * C + c, b]] += (
                        wn[l * C + c, b] * dcn[l * F:(l + 1) * F, b])
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

    def test_gather_matches_take(self):
        rng = np.random.RandomState(1)
        Lg, C, F, B, r_pad = 2, 4, 2, 512, 256
        sizes, offsets = (200, 130), (0, 200)
        n_rows = 330
        flat = jnp.asarray(rng.randn(n_rows * F).astype(np.float32))
        idxl = jnp.asarray(np.concatenate(
            [rng.randint(0, s, (C, B)) for s in sizes]).astype(np.int32))
        w = jnp.asarray(rng.rand(Lg * C, B).astype(np.float32))
        cols = np.asarray(gm.mm_gather(flat, idxl, w, sizes, offsets,
                                       F, C, r_pad))
        flat2 = np.asarray(flat).reshape(n_rows, F)
        want = np.zeros((Lg * F, B), np.float32)
        idxn, wn = np.asarray(idxl), np.asarray(w)
        for l in range(Lg):
            for c in range(C):
                feats = flat2[idxn[l * C + c] + offsets[l]]
                for k in range(F):
                    want[l * F + k] += wn[l * C + c] * feats[:, k]
        np.testing.assert_allclose(cols, want, rtol=1e-4, atol=1e-4)

    def test_mm_gather_grads(self):
        """First- and second-order grads vs an identical-math jnp
        implementation.  Analytic comparison, not finite differences —
        the two-term bf16 split makes the kernel's output piecewise
        (steps ~2^-17·scale) which numerical differencing amplifies by
        1/eps into noise."""
        rng = np.random.RandomState(2)
        C, F, B, r_pad = 4, 2, 512, 128
        sizes, offsets = (100,), (0,)
        flat = jnp.asarray(rng.randn(100 * F).astype(np.float32))
        idxl = jnp.asarray(rng.randint(0, 100, (C, B)).astype(np.int32))
        w = jnp.asarray(rng.rand(C, B).astype(np.float32))

        def ref(fl, w):
            t2 = fl.reshape(-1, F)
            cols = jnp.zeros((F, B))
            for c in range(C):
                feats = jnp.take(t2, idxl[c], axis=0)
                cols = cols + w[c][None, :] * feats.T
            return jnp.sum(cols ** 2)

        def fast(fl, w):
            return jnp.sum(gm.mm_gather(fl, idxl, w, sizes, offsets,
                                        F, C, r_pad) ** 2)

        g_r = jax.grad(ref, (0, 1))(flat, w)
        g_f = jax.grad(fast, (0, 1))(flat, w)
        for a, b in zip(g_r, g_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)
        # Second order: d²/dflat² of grad-norm² (reverse-over-reverse).
        h_r = jax.grad(lambda fl: jnp.sum(
            jax.grad(ref)(fl, w) ** 2))(flat)
        h_f = jax.grad(lambda fl: jnp.sum(
            jax.grad(fast)(fl, w) ** 2))(flat)
        np.testing.assert_allclose(np.asarray(h_r), np.asarray(h_f),
                                   rtol=1e-2, atol=1e-2)

    def test_batch_tile_rules(self, monkeypatch):
        monkeypatch.delenv("TCNN_TPU_MM_TILE", raising=False)
        assert gm.batch_tile(2 ** 18) == 4096
        assert gm.batch_tile(1536) == 512
        assert gm.batch_tile(768) == 0   # largest pow2 divisor 256
        assert gm.batch_tile(100) == 0

    def test_batch_tile_env_non_power_of_two(self, monkeypatch):
        """A free-form TCNN_TPU_MM_TILE must never yield a non-divisor
        tile (the kernel grid would silently skip the batch tail)."""
        monkeypatch.setenv("TCNN_TPU_MM_TILE", "3000")
        t = gm.batch_tile(4096)
        assert t == 2048 and 4096 % t == 0
        monkeypatch.setenv("TCNN_TPU_MM_TILE", "513")
        assert gm.batch_tile(4096) == 512   # floors to 512
        monkeypatch.setenv("TCNN_TPU_MM_TILE", "0")
        assert gm.batch_tile(4096) == 0


class TestMergedClasses:
    """Merged mode: several small levels share ONE virtual table block
    (concatenated rows) so they stop paying per-level 128-row MXU
    padding."""

    def _setup(self, rng, sizes, F=2, C=4, B=512):
        Lg = len(sizes)
        offsets = tuple(int(x) for x in
                        np.concatenate([[7], 7 + np.cumsum(sizes)[:-1]]))
        n_rows = 7 + sum(sizes) + 3
        flat = jnp.asarray(rng.randn(n_rows * F).astype(np.float32))
        idxl = jnp.asarray(np.concatenate(
            [rng.randint(0, s, (C, B)) for s in sizes]).astype(np.int32))
        w = jnp.asarray(rng.rand(Lg * C, B).astype(np.float32))
        return flat, idxl, w, offsets, n_rows

    def test_merged_gather_matches_per_level(self):
        rng = np.random.RandomState(7)
        sizes = (200, 130, 77)
        flat, idxl, w, offsets, _ = self._setup(rng, sizes)
        a = np.asarray(gm.mm_gather(flat, idxl, w, sizes, offsets,
                                    2, 4, 512, merged=False))
        b = np.asarray(gm.mm_gather(flat, idxl, w, sizes, offsets,
                                    2, 4, 512, merged=True))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_merged_scatter_matches_per_level(self):
        rng = np.random.RandomState(8)
        sizes = (200, 130, 77)
        flat, idxl, w, offsets, n_rows = self._setup(rng, sizes)
        dc = jnp.asarray(rng.randn(3 * 2, 512).astype(np.float32))
        a = np.asarray(gm.mm_scatter(idxl, w, dc, sizes, offsets, 2, 4,
                                     512, n_rows * 2, "float32", False))
        b = np.asarray(gm.mm_scatter(idxl, w, dc, sizes, offsets, 2, 4,
                                     512, n_rows * 2, "float32", True))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_merged_grads_match(self):
        rng = np.random.RandomState(9)
        sizes = (100, 60)
        flat, idxl, w, offsets, _ = self._setup(rng, sizes, B=512)

        def loss(m):
            def f(fl, w):
                return jnp.sum(gm.mm_gather(fl, idxl, w, sizes, offsets,
                                            2, 4, 256, merged=m) ** 2)
            return jax.grad(f, (0, 1))(flat, w)

        for a, b in zip(loss(False), loss(True)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_flagship_class_plan(self, monkeypatch):
        """config_hash geometry.  Default (absorption off — the
        launch-absorption A/B measured it SLOWER, see _mm_classes):
        MAC-exact invariants hold — no level contracts against more
        rows than its own 1024-padded size (the round-3 fixed-cap
        greedy merged five levels into a 12288-row virtual table each
        then paid — +1.2 ms/pass on chip).  With
        TCNN_TPU_MM_LAUNCH_ROWS set, small classes absorb into larger
        ones, bounded by the allowance per saved launch."""
        spec = grid_ops.make_grid_spec(2, 16, 2, 15, 16, 1.5)
        meta = tuple((True, lv.size, lv.offset) for lv in spec.levels)
        mm, serial = grid_ops._route_levels((2, 4, meta), jnp.bfloat16,
                                            1 << 18)
        assert serial == []
        pad = lambda n: (n + 1023) // 1024 * 1024

        # Default: absorption OFF (measured slower on chip, see
        # _mm_classes) — the MAC-exact invariants hold.
        classes = grid_ops._mm_classes(meta, mm)
        for levels, r_pad, mg in classes:
            for i in levels:
                assert r_pad <= pad(meta[i][1]) or (
                    mg and r_pad <= sum(pad(meta[j][1]) for j in levels))
        total = sum(len(levels) * r_pad for levels, r_pad, _ in classes)
        assert total <= sum(pad(m[1]) for m in meta)
        n_exact = len(classes)

        monkeypatch.setenv("TCNN_TPU_MM_LAUNCH_ROWS", "12000")
        absorbed = grid_ops._mm_classes(meta, mm, b=1 << 18)
        n_abs = len(absorbed)
        assert n_abs < n_exact  # launches actually saved at this geometry
        total_abs = sum(len(levels) * r_pad
                        for levels, r_pad, _ in absorbed)
        # Extra padded rows bounded by the launch allowance per saved
        # launch (absorption is exact numerically; this checks cost).
        assert total_abs - total <= (n_exact - n_abs) * 12000
        # Same level set, no duplicates.
        flat = sorted(i for levels, _, _ in absorbed for i in levels)
        assert flat == sorted(mm)

    def test_grid_encode_parity_with_merged_classes(self, monkeypatch):
        """End-to-end grid_encode with a class plan that includes a
        merged class must match the jnp path.  The cost-based planner
        no longer merges at this geometry (merging only ever ties or
        loses at the 1024-row pad floor), so the legacy fixed-cap
        greedy is forced via env to keep merged-mode parity covered."""
        monkeypatch.setenv("TCNN_TPU_MM_MERGE_CAP", "16384")
        spec = grid_ops.make_grid_spec(2, 6, 2, 11, 4, 2.0)
        meta = tuple((True, lv.size, lv.offset) for lv in spec.levels)
        mm, _ = grid_ops._route_levels((2, 4, meta), jnp.float32, 1024)
        assert any(cl[2] for cl in grid_ops._mm_classes(meta, mm))
        table = jax.random.normal(key(13), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(14), (1024, 2))
        g_f = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=True) ** 2))(table)
        g_s = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=False) ** 2))(table)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-4)


class TestPairedMatmul:
    """Pair-packed MXU kernels (TCNN_TPU_MM_PAIRED=1): one one-hot
    contraction serves both dim-0 corners; lane wraps (lo==127) ride a
    carry plane, level wraps (row size-1 -> row 0) the outside
    correction.  Ground truth: the jnp path and the unpaired kernels."""

    @pytest.fixture(autouse=True)
    def _enable(self, monkeypatch):
        monkeypatch.setenv("TCNN_TPU_MM_PAIRED", "1")

    @pytest.mark.parametrize("hash_type,interp", [
        (HashType.COHERENT_ADD, InterpolationType.LINEAR),
        (HashType.COHERENT_ADD, InterpolationType.SMOOTHSTEP),
    ])
    def test_forward_and_grads_coherent_add(self, hash_type, interp):
        spec = _mk(hash_type, n_levels=4, hashmap=9, interpolation=interp)
        assert any(lv.use_hash for lv in spec.levels)
        table = jax.random.normal(key(21), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(22), (1024, 2))

        def run(fast):
            def loss(t):
                y = grid_ops.grid_encode(spec, t, x, fast_scatter=fast)
                return jnp.sum(y ** 2), y
            (l, y), g = jax.value_and_grad(loss, has_aux=True)(table)
            return y, g

        y_f, g_f = run(True)
        y_s, g_s = run(False)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                                   rtol=RTOL, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("gtype", [GridType.DENSE, GridType.TILED])
    def test_dense_tiled_paired(self, gtype):
        spec = _mk(n_levels=3, base=5, scale=1.7, grid_type=gtype)
        table = jax.random.normal(key(23), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(24), (1024, 2))
        g_f = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=True) ** 2))(table)
        g_s = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=False) ** 2))(table)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-4)

    def test_class_plan_partitions_by_pairing(self):
        # Mixed meta: paired + unpaired levels must land in separate
        # classes; with the env off, one combined plan.
        meta = ((True, 300, 0), (False, 300, 300), (True, 280, 600))
        plans = list(grid_ops._mm_class_plan(meta, [0, 1, 2], "scatter"))
        paired_levels = sorted(sum((lv for lv, _, _, pr in plans if pr), []))
        unpaired_levels = sorted(sum((lv for lv, _, _, pr in plans
                                      if not pr), []))
        assert paired_levels == [0, 2] and unpaired_levels == [1]

    def _naive(self, idx_full, w_full, dcols, n_flat, f, offsets, sizes):
        n_lvl, c, b = idx_full.shape
        out = np.zeros((n_flat,), np.float32)
        dc = np.asarray(dcols, np.float32).reshape(n_lvl, f, b)
        for l in range(n_lvl):
            for ci in range(c):
                for bi in range(b):
                    r = offsets[l] + int(idx_full[l, ci, bi])
                    for k in range(f):
                        out[r * f + k] += (float(w_full[l, ci, bi])
                                           * dc[l, k, bi])
        return out

    def _crafted(self, sizes, b=512, f=2, seed=30):
        """Full corner arrays (c=2: one dim-0 pair) with even rows
        forced onto lane-wrap (lo=127) and level-wrap (size-1) rows."""
        rng = np.random.RandomState(seed)
        n_lvl = len(sizes)
        idx_e = np.stack([rng.randint(0, s, size=(1, b)) for s in sizes])
        # Force edge rows into every level's stream.
        for l, s in enumerate(sizes):
            idx_e[l, 0, 0] = s - 1                 # level wrap
            if s > 128:
                idx_e[l, 0, 1] = 127               # lane wrap
            if s > 256:
                idx_e[l, 0, 2] = 255
        idx_o = (idx_e + 1) % np.array(sizes).reshape(n_lvl, 1, 1)
        idx_full = np.stack([idx_e, idx_o], axis=2).reshape(n_lvl, 2, b)
        w_full = rng.rand(n_lvl, 2, b).astype(np.float32)
        dcols = rng.randn(n_lvl * f, b).astype(np.float32)
        return idx_full, w_full, dcols

    @pytest.mark.parametrize("merged", [False, True])
    def test_scatter_paired_exact_wraps(self, merged):
        sizes = (300, 290)
        offsets = (0, 300)
        f = 2
        r_pad = 512 if not merged else 640
        n_flat = 590 * f
        idx_full, w_full, dcols = self._crafted(sizes, f=f)
        got = gm.mm_scatter(
            jnp.asarray(idx_full.reshape(-1, idx_full.shape[2])),
            jnp.asarray(w_full.reshape(-1, w_full.shape[2])),
            jnp.asarray(dcols), sizes, offsets, f, 2, r_pad, n_flat,
            "float32", merged, True)
        want = self._naive(idx_full, w_full, dcols, n_flat, f, offsets,
                           sizes)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-3)

    @pytest.mark.parametrize("merged", [False, True])
    def test_gather_paired_exact_wraps(self, merged):
        sizes = (300, 290)
        offsets = (0, 300)
        f = 2
        r_pad = 512 if not merged else 640
        n_flat = 590 * f
        idx_full, w_full, _ = self._crafted(sizes, f=f, seed=31)
        flat = (np.random.RandomState(32).randn(n_flat) * 0.1
                ).astype(np.float32)
        got = gm.mm_gather(
            jnp.asarray(flat),
            jnp.asarray(idx_full.reshape(-1, idx_full.shape[2])),
            jnp.asarray(w_full.reshape(-1, w_full.shape[2])),
            sizes, offsets, f, 2, r_pad, merged, True)
        # Naive: cols[l*f+k] = sum_c w * table[off + idx][k]
        t2 = flat.reshape(-1, f)
        b = idx_full.shape[2]
        want = np.zeros((len(sizes) * f, b), np.float32)
        for l in range(len(sizes)):
            for ci in range(2):
                rows = offsets[l] + idx_full[l, ci]
                for k in range(f):
                    want[l * f + k] += w_full[l, ci] * t2[rows, k]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-3)

    def test_second_order_paired(self, monkeypatch):
        """Mixed second order d/dx d/dt through the paired rules must
        match the jnp path analytically (grid_encode is linear in t, so
        finite-difference probes only see bf16 value quantization —
        compare exact VJP-of-VJP programs instead)."""
        spec = _mk(HashType.COHERENT_ADD, n_levels=3, hashmap=9,
                   interpolation=InterpolationType.SMOOTHSTEP)
        table = jax.random.normal(key(25), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(26), (512, 2), minval=0.1, maxval=0.9)
        v = jax.random.normal(key(29), table.shape)

        def cross(fast):
            def inner(t, xx):
                y = grid_ops.grid_encode(spec, t, xx, fast_scatter=fast)
                return jnp.sum(jnp.sin(y))
            return jax.grad(
                lambda xx: jnp.vdot(jax.grad(inner)(table, xx), v))(x)

        got = cross(True)
        monkeypatch.delenv("TCNN_TPU_MM_PAIRED")
        want_mm = cross(True)
        want = cross(False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want_mm),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-2, atol=1e-3)

    def test_deterministic_paired(self):
        spec = _mk(HashType.COHERENT_ADD, hashmap=9)
        table = jax.random.normal(key(27), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(28), (2048, 2))
        fn = jax.jit(jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=True) ** 2)))
        g1, g2 = fn(table), fn(table)
        assert np.array_equal(np.asarray(g1), np.asarray(g2))

    @pytest.mark.parametrize("f", [1, 4])
    def test_paired_any_f(self, f):
        spec = _mk(HashType.COHERENT_ADD, n_levels=3, f=f, hashmap=9)
        table = jax.random.normal(key(33), (spec.n_entries, f)) * 0.1
        x = jax.random.uniform(key(34), (512, 2))
        g_f = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=True) ** 2))(table)
        g_s = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=False) ** 2))(table)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-4)

    def test_paired_bf16_tables(self):
        spec = _mk(HashType.COHERENT_ADD, n_levels=3, hashmap=9)
        table = (jax.random.normal(key(35), (spec.n_entries, 2)) * 0.1
                 ).astype(jnp.bfloat16)
        x = jax.random.uniform(key(36), (1024, 2))
        y_f = grid_ops.grid_encode(spec, table, x, fast_scatter=True)
        y_s = grid_ops.grid_encode(spec, table, x, fast_scatter=False)
        np.testing.assert_allclose(
            np.asarray(y_f, np.float32), np.asarray(y_s, np.float32),
            rtol=2e-2, atol=1e-3)

    def test_paired_3d(self):
        """C=8 corners -> 4 dim-0 pairs (the BTF-style multi-dim case)."""
        spec = grid_ops.make_grid_spec(3, 3, 2, 9, 4, 1.6,
                                       hash_type=HashType.COHERENT_ADD)
        table = jax.random.normal(key(37), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(38), (512, 3))
        g_f = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=True) ** 2))(table)
        g_s = jax.grad(lambda t: jnp.sum(grid_ops.grid_encode(
            spec, t, x, fast_scatter=False) ** 2))(table)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-4)
        y_f = grid_ops.grid_encode(spec, table, x, fast_scatter=True)
        y_s = grid_ops.grid_encode(spec, table, x, fast_scatter=False)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                                   rtol=RTOL, atol=1e-5)


class TestBinnedScatter:
    """The G=2 binned scatter (TCNN_TPU_SCATTER=binned2) — the
    measured sub-O(M·R_pad) design attempt — must be EXACT against the
    dense kernel, including the capacity-overflow fallback."""

    def _data(self, rng, n_lvl=2, r_pad=1024, c=4, f=2, b=1024):
        sizes = tuple([r_pad - 64] * n_lvl)
        offsets = tuple(np.cumsum([0] + list(sizes))[:-1])
        idx = rng.randint(0, sizes[0], (n_lvl * c, b)).astype(np.int32)
        w = rng.rand(n_lvl * c, b).astype(np.float32)
        dc = rng.randn(n_lvl * f, b).astype(np.float32)
        return (jnp.asarray(idx), jnp.asarray(w), jnp.asarray(dc),
                sizes, offsets)

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_parity_vs_dense(self, monkeypatch, dtype):
        rng = np.random.RandomState(11)
        idx, w, dc, sizes, offsets = self._data(rng)
        n_flat = (sum(sizes) + 64 * len(sizes)) * 2
        args = (idx, w, dc, sizes, offsets, 2, 4, 1024, n_flat, dtype)
        dense = np.asarray(gm.mm_scatter(*args))
        monkeypatch.setenv("TCNN_TPU_SCATTER", "binned2")
        binned = np.asarray(gm.mm_scatter(*args))
        np.testing.assert_allclose(binned, dense, rtol=1e-5, atol=1e-5)

    def test_overflow_falls_back_exactly(self, monkeypatch):
        """All indices in ONE half overflow the bucket capacity — the
        count check must route to the dense kernel (same numbers)."""
        rng = np.random.RandomState(12)
        idx, w, dc, sizes, offsets = self._data(rng, n_lvl=1)
        idx = idx % 256 + 512          # every row in the upper half
        n_flat = (sizes[0] + 64) * 2
        args = (idx, w, dc, sizes, offsets, 2, 4, 1024, n_flat, "float32")
        dense = np.asarray(gm.mm_scatter(*args))
        monkeypatch.setenv("TCNN_TPU_SCATTER", "binned2")
        binned = np.asarray(gm.mm_scatter(*args))
        np.testing.assert_allclose(binned, dense, rtol=1e-5, atol=1e-5)


class TestXorPaired:
    """XOR-paired kernels (opt-in via TCNN_TPU_MM_XOR — measured
    slower than the dense kernels on chip at P=1): one hi-block
    one-hot serves both dim-0 corners; rare non-shared odd corners
    ride an in-kernel compacted carry pass; capacity overflow falls
    back to the dense kernel via lax.cond.  Ground truth: the unpaired
    kernels and the jnp path."""

    def _pairs(self, rng, sizes, b=512, structured=True):
        """CoherentPrime-structured (idx_e, idx_o) per level: pow2 mod
        of c0 ^ m and (c0+1) ^ m — carry rate ≈ 1/128."""
        n_lvl = len(sizes)
        c0 = rng.randint(0, 1 << 20, (n_lvl, 1, b)).astype(np.uint32)
        m = rng.randint(0, 1 << 20, (n_lvl, 1, b)).astype(np.uint32)
        out_e, out_o = [], []
        for l, s in enumerate(sizes):
            if structured:
                assert s & (s - 1) == 0
                e = ((c0[l] ^ m[l]) & (s - 1)).astype(np.int32)
                o = (((c0[l] + 1) ^ m[l]) & (s - 1)).astype(np.int32)
            else:
                e = rng.randint(0, s, (1, b)).astype(np.int32)
                o = rng.randint(0, s, (1, b)).astype(np.int32)
            out_e.append(e)
            out_o.append(o)
        idx_e = np.stack(out_e)              # (L, 1, b) — C=2 pairs=1
        idx_o = np.stack(out_o)
        idx_full = np.stack([idx_e, idx_o], axis=2).reshape(n_lvl, 2, b)
        return idx_full

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    @pytest.mark.parametrize("merged", [False, True])
    def test_scatter_parity(self, dtype, merged):
        rng = np.random.RandomState(5)
        sizes = (512, 512)
        offsets = (0, 512)
        r_pad = 512 if not merged else 1024
        b = 512
        idx_full = self._pairs(rng, sizes, b)
        w = rng.rand(2 * 2, b).astype(np.float32)
        dc = rng.randn(2 * 2, b).astype(np.float32)
        args = (jnp.asarray(idx_full.reshape(-1, b)), jnp.asarray(w),
                jnp.asarray(dc), sizes, offsets, 2, 2, r_pad,
                1024 * 2, dtype, merged)
        dense = np.asarray(gm.mm_scatter(*args, paired=False))
        xor = np.asarray(gm.mm_scatter(*args, paired="xor"))
        np.testing.assert_allclose(xor, dense, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("merged", [False, True])
    def test_gather_parity_and_grads(self, merged):
        rng = np.random.RandomState(6)
        sizes = (512, 512)
        offsets = (0, 512)
        r_pad = 512 if not merged else 1024
        b = 512
        idx_full = self._pairs(rng, sizes, b)
        w = rng.rand(2 * 2, b).astype(np.float32)
        flat = (rng.randn(1024 * 2) * 0.1).astype(np.float32)
        args = (jnp.asarray(idx_full.reshape(-1, b)), jnp.asarray(w),
                sizes, offsets, 2, 2, r_pad, merged)
        dense = np.asarray(gm.mm_gather(jnp.asarray(flat), *args,
                                        paired=False))
        xor = np.asarray(gm.mm_gather(jnp.asarray(flat), *args,
                                      paired="xor"))
        np.testing.assert_allclose(xor, dense, rtol=1e-5, atol=1e-6)
        check_grads(
            lambda t: gm.mm_gather(t, *args, paired="xor"),
            (jnp.asarray(flat),), order=2, modes=["rev"],
            rtol=1e-2, atol=1e-3)

    def test_overflow_falls_back_exactly(self):
        """Unstructured pairs (carry rate ~3/4 at hi_n=4 — way past
        any capacity) must produce dense-kernel numbers via the cond."""
        rng = np.random.RandomState(7)
        sizes = (512,)
        b = 512
        idx_full = self._pairs(rng, sizes, b, structured=False)
        carry = (idx_full[:, 0] // 128) != (idx_full[:, 1] // 128)
        assert carry.sum() > 256  # genuinely overflows K
        w = rng.rand(2, b).astype(np.float32)
        dc = rng.randn(2, b).astype(np.float32)
        args = (jnp.asarray(idx_full.reshape(-1, b)), jnp.asarray(w),
                jnp.asarray(dc), sizes, (0,), 2, 2, 512, 1024,
                "float32")
        dense = np.asarray(gm.mm_scatter(*args, paired=False))
        xor = np.asarray(gm.mm_scatter(*args, paired="xor"))
        np.testing.assert_allclose(xor, dense, rtol=1e-6, atol=1e-6)

    def test_wraps_ride_carry_path(self):
        """Dense +1 adjacency with forced level/lane wraps: the xor
        kernel needs NO wrap special-casing (full odd index)."""
        rng = np.random.RandomState(8)
        sizes = (300,)
        b = 512
        idx_e = rng.randint(0, 300, (1, b)).astype(np.int32)
        idx_e[0, :8] = [299, 127, 255, 128, 0, 298, 129, 126]
        idx_o = (idx_e + 1) % 300
        idx_full = np.stack([idx_e, idx_o], axis=1)   # (1, 2, b)
        w = rng.rand(2, b).astype(np.float32)
        dc = rng.randn(2, b).astype(np.float32)
        args = (jnp.asarray(idx_full.reshape(-1, b)), jnp.asarray(w),
                jnp.asarray(dc), sizes, (0,), 2, 2, 512, 600 * 2,
                "float32")
        dense = np.asarray(gm.mm_scatter(*args, paired=False))
        xor = np.asarray(gm.mm_scatter(*args, paired="xor"))
        np.testing.assert_allclose(xor, dense, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("directions", ["gather", "both"])
    def test_grid_encode_end_to_end_xor_matches_jnp(self, monkeypatch,
                                                    directions):
        """Flagship-shaped CoherentPrime spec routes its pow2 hash
        levels to the xor kernels (default: gather direction only);
        results must match the pure-jnp path (values + table grads)."""
        monkeypatch.setenv("TCNN_TPU_MM_XOR", directions)
        spec = _mk(HashType.COHERENT_PRIME, n_levels=5, hashmap=9,
                   base=4, scale=2.0)
        meta_live = [lv for lv in spec.levels]
        assert any(lv.use_hash and lv.size & (lv.size - 1) == 0
                   for lv in meta_live)
        table = jax.random.normal(key(31), (spec.n_entries, 2)) * 0.1
        x = jax.random.uniform(key(32), (1024, 2))

        def run(fast):
            def loss(t):
                y = grid_ops.grid_encode(spec, t, x, fast_scatter=fast)
                return jnp.sum(y ** 2), y
            (_, y), g = jax.value_and_grad(loss, has_aux=True)(table)
            return y, g

        y_f, g_f = run(True)
        y_s, g_s = run(False)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                                   rtol=RTOL, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-4)

    def test_class_plan_separates_xor_levels(self, monkeypatch):
        monkeypatch.setenv("TCNN_TPU_MM_XOR", "both")
        meta = ((True, 512, 0, True), (False, 512, 512, False),
                (True, 512, 1024, True))
        plans = list(grid_ops._mm_class_plan(meta, [0, 1, 2], "gather"))
        xor_levels = sorted(sum((lv for lv, _, _, pr in plans
                                 if pr == "xor"), []))
        other = sorted(sum((lv for lv, _, _, pr in plans
                            if pr != "xor"), []))
        assert xor_levels == [0, 2] and other == [1]

    def test_route_budget_halved_for_xor(self, monkeypatch):
        monkeypatch.setenv("TCNN_TPU_MM_BUDGET_UNPAIRED", "2000")
        # Routing only counts the halving when the SCATTER direction
        # runs xor (the default is gather-only).
        monkeypatch.setenv("TCNN_TPU_MM_XOR", "both")
        # size*f = 2048 > budget unpaired; with xor flag the effective
        # cost halves and the level routes to the matmul kernels.
        meta_xor = ((False, 1024, 0, True),)
        meta_plain = ((False, 1024, 0, False),)
        mm_x, _ = grid_ops._route_levels((2, 4, meta_xor), jnp.bfloat16,
                                         1 << 12)
        mm_p, _ = grid_ops._route_levels((2, 4, meta_plain),
                                         jnp.bfloat16, 1 << 12)
        assert mm_x == [0] and mm_p == []

    @pytest.mark.parametrize("mode", ["i32", "arith"])
    def test_onehot_modes_parity(self, monkeypatch, mode):
        """Every one-hot build route (i32 compare+cast, bf16-arith)
        must produce identical numbers through both the xor and dense
        kernels.  (A bf16-select route existed briefly; Mosaic on real
        v5e rejects bf16 compares, so it was removed.)"""
        monkeypatch.setenv("TCNN_TPU_ONEHOT", mode)
        rng = np.random.RandomState(9)
        sizes = (512,)
        b = 512
        idx_full = self._pairs(rng, sizes, b)
        w = rng.rand(2, b).astype(np.float32)
        dc = rng.randn(2, b).astype(np.float32)
        args = (jnp.asarray(idx_full.reshape(-1, b)), jnp.asarray(w),
                jnp.asarray(dc), sizes, (0,), 2, 2, 512, 1024,
                "float32")
        got_x = np.asarray(gm.mm_scatter(*args, paired="xor"))
        got_d = np.asarray(gm.mm_scatter(*args))
        monkeypatch.setenv("TCNN_TPU_ONEHOT", "i32")
        ref = np.asarray(gm.mm_scatter(*args))
        np.testing.assert_allclose(got_d, ref, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(got_x, ref, rtol=1e-6, atol=1e-6)
