"""Multi-device data-parallel tests on the virtual 8-device CPU mesh
(SURVEY.md §4: the standard JAX trick replacing multi-host hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import tcnn_tpu as tcnn
from tcnn_tpu.parallel import (DataParallel, HybridParallel, make_hybrid_mesh,
                               make_mesh)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices")


def config():
    return {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "n_features_per_level": 2, "log2_hashmap_size": 10,
                     "base_resolution": 4, "per_level_scale": 1.5},
        "network": {"otype": "MLP", "n_neurons": 32, "n_hidden_layers": 2},
    }


class TestDataParallel:
    def test_mesh_covers_all_devices(self):
        dp = DataParallel()
        assert dp.n_devices == len(jax.devices())

    def test_sharded_step_matches_single_device(self):
        """DP training over 8 devices must produce the same loss curve
        as single-device training (psum of grads == full-batch grads)."""
        model_a = tcnn.create_from_config(2, 3, config())
        model_b = tcnn.create_from_config(2, 3, config())
        state_a = model_a.trainer.initial_state()
        state_b = model_b.trainer.initial_state()

        dp = DataParallel()
        step_b = dp.make_training_step(model_b.trainer)
        state_b = dp.replicate(state_b)

        key = jax.random.key(0)
        losses_a, losses_b = [], []
        for i in range(5):
            key, k1, k2 = jax.random.split(key, 3)
            x = jax.random.uniform(k1, (8 * 64, 2))
            t = jax.random.uniform(k2, (8 * 64, 3))
            state_a, la = model_a.trainer.training_step(state_a, x, t)
            state_b, lb = step_b(state_b, dp.shard_batch(x), dp.shard_batch(t))
            losses_a.append(float(la))
            losses_b.append(float(lb))
        np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5)

    def test_sharded_inference(self):
        model = tcnn.create_from_config(2, 3, config())
        state = model.trainer.initial_state()
        dp = DataParallel()
        infer = dp.make_inference(model.trainer)
        x = jax.random.uniform(jax.random.key(1), (8 * 32, 2))
        y = infer(dp.replicate(state.params), dp.shard_batch(x))
        y_ref = model.trainer.forward(state, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_indivisible_batch_raises(self):
        dp = DataParallel()
        with pytest.raises(ValueError, match="not divisible"):
            dp.shard_batch(jnp.zeros((dp.n_devices * 4 + 1, 2)))

    def test_submesh(self):
        mesh = make_mesh(jax.devices()[:4])
        dp = DataParallel(mesh)
        assert dp.n_devices == 4
        model = tcnn.create_from_config(2, 3, config())
        state = dp.replicate(model.trainer.initial_state())
        step = dp.make_training_step(model.trainer)
        x = jax.random.uniform(jax.random.key(2), (4 * 16, 2))
        t = jax.random.uniform(jax.random.key(3), (4 * 16, 3))
        state, loss = step(state, dp.shard_batch(x), dp.shard_batch(t))
        assert np.isfinite(float(loss))


class TestShardMapWithKernels:
    """Round-3: the production Pallas kernels must run data-parallel.
    shard_map hands each device a plain local batch, so pallas_call
    needs no SPMD partitioning rules; grads pmean over the mesh.  Here
    the kernels are FORCED on (interpret mode on CPU) with a per-shard
    batch large enough for the kernel tile floors."""

    def _config(self):
        return {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
            "encoding": {"otype": "HashGrid", "n_levels": 4,
                         "n_features_per_level": 2, "log2_hashmap_size": 10,
                         "base_resolution": 4, "per_level_scale": 1.5},
            "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                        "n_hidden_layers": 2},
        }

    @pytest.mark.parametrize("paired", [False, True])
    def test_loss_curve_matches_single_device(self, monkeypatch, paired):
        monkeypatch.setenv("TCNN_TPU_FORCE_FAST_SCATTER", "1")
        cfg = self._config()
        if paired:
            # Pair-packed kernels (CoherentAdd gives hash levels dim-0
            # adjacency) must shard identically.
            monkeypatch.setenv("TCNN_TPU_MM_PAIRED", "1")
            cfg["encoding"]["hash"] = "CoherentAdd"
        model_a = tcnn.create_from_config(2, 3, cfg)
        model_b = tcnn.create_from_config(2, 3, cfg)
        state_a = model_a.trainer.initial_state()
        dp = DataParallel()
        step_b = dp.make_training_step(model_b.trainer, use_shard_map=True)
        state_b = dp.replicate(model_b.trainer.initial_state())

        b = dp.n_devices * 512  # ≥ kernel tile floor per shard
        key = jax.random.key(7)
        for i in range(3):
            key, k1, k2 = jax.random.split(key, 3)
            x = jax.random.uniform(k1, (b, 2))
            t = jax.random.uniform(k2, (b, 3))
            state_a, la = model_a.trainer.training_step(state_a, x, t)
            state_b, lb = step_b(state_b, dp.shard_batch(x),
                                 dp.shard_batch(t))
            np.testing.assert_allclose(float(la), float(lb), rtol=2e-4)
        # Params end up equal too (same math, fp add order aside).
        pa = jax.tree_util.tree_leaves(state_a.params)
        pb = jax.tree_util.tree_leaves(jax.device_get(state_b.params))
        for a_, b_ in zip(pa, pb):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=5e-3, atol=5e-4)

    def test_sharded_inference_with_fused_mlp(self, monkeypatch):
        monkeypatch.setenv("TCNN_TPU_FORCE_FAST_SCATTER", "1")
        model = tcnn.create_from_config(2, 3, self._config())
        state = model.trainer.initial_state()
        dp = DataParallel()
        infer = dp.make_inference(model.trainer, use_shard_map=True)
        x = jax.random.uniform(jax.random.key(1), (dp.n_devices * 512, 2))
        y = infer(dp.replicate(state.params), dp.shard_batch(x))
        y_ref = model.trainer.forward(state, x)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(y_ref, np.float32),
                                   rtol=2e-2, atol=2e-3)


class TestPerturbationUnderShardMap:
    def test_perturbed_step_runs_and_dithers(self):
        """perturbation_sigma trainers run under the shard_map lowering
        (each shard salts the noise key with its axis_index — without
        the salt every shard would repeat one noise pattern; with the
        old jit fallback the Pallas kernels could not partition at
        all).  The perturbed loss must differ from the unperturbed one
        and training must stay finite."""
        model = tcnn.create_from_config(2, 3, config())
        model.trainer.perturbation_sigma = 0.1
        ref = tcnn.create_from_config(2, 3, config())

        dp = DataParallel()
        step = dp.make_training_step(model.trainer)
        step_ref = dp.make_training_step(ref.trainer)
        state = dp.replicate(model.trainer.initial_state())
        state_ref = dp.replicate(ref.trainer.initial_state())

        key = jax.random.key(3)
        x = dp.shard_batch(jax.random.uniform(
            jax.random.fold_in(key, 0), (8 * 64, 2)))
        t = dp.shard_batch(jax.random.uniform(
            jax.random.fold_in(key, 1), (8 * 64, 3)))
        state, loss_p = step(state, x, t)
        state_ref, loss_r = step_ref(state_ref, x, t)
        assert np.isfinite(float(loss_p))
        # Same init + same data: only the injected noise separates them.
        assert abs(float(loss_p) - float(loss_r)) > 1e-6

    def test_shard_noise_streams_differ(self):
        """The axis_index salt must give each shard its own noise: the
        per-shard losses of identical per-shard data must differ."""
        from jax.sharding import PartitionSpec as P

        model = tcnn.create_from_config(2, 3, config())
        tr = model.trainer
        tr.perturbation_sigma = 0.5
        dp = DataParallel()
        n = dp.n_devices
        state = tr.initial_state()

        x1 = jax.random.uniform(jax.random.key(5), (64, 2))
        t1 = jax.random.uniform(jax.random.key(6), (64, 3))
        # Identical data on every shard; per-shard (pre-pmean) losses
        # must still differ because each shard salts with axis_index.
        def local_loss(state, x, target):
            salt = jax.lax.axis_index(dp.axis_name)
            loss, _ = tr.loss_value_and_grads(
                state.params, x, target, None, step=state.step,
                noise_key_salt=salt)
            return loss.reshape(1)

        f = jax.jit(jax.shard_map(
            local_loss, mesh=dp.mesh,
            in_specs=(P(), P(dp.axis_name), P(dp.axis_name)),
            out_specs=P(dp.axis_name), check_vma=False))
        x_rep = jnp.tile(x1, (n, 1))
        t_rep = jnp.tile(t1, (n, 1))
        per_shard = np.asarray(f(dp.replicate(state), x_rep, t_rep))
        assert len(np.unique(per_shard)) > 1, per_shard


class TestHybridTableParallel:
    """Model-parallel (row-sharded) grid tables on a (data, model) mesh
    — the TPU-native scaling axis for tables larger than one chip's HBM
    (the reference, single-GPU, has no analog; SURVEY.md §2.9).  Each
    device interpolates only its own table rows and the partial feature
    columns psum over the model axis; table grads and optimizer state
    stay shard-local."""

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    @pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
    def test_loss_curve_matches_single_device(self, shape):
        n_data, n_model = shape
        model_a = tcnn.create_from_config(2, 3, config())
        model_b = tcnn.create_from_config(2, 3, config())
        state_a = model_a.trainer.initial_state()

        hp = HybridParallel(n_model=n_model,
                            devices=jax.devices()[:n_data * n_model],
                            model=model_b)
        assert (hp.n_data, hp.n_model) == (n_data, n_model)
        state_b = hp.shard_state(model_b.trainer.initial_state())

        # The grid table (and its Adam moments) must actually be
        # sharded n_model-ways; the MLP weights stay replicated.
        grid = state_b.params["encoding"]["grid"]
        shard_shapes = {s.data.shape for s in grid.addressable_shards}
        assert shard_shapes == {(grid.shape[0] // n_model,)}
        mu_grid = state_b.opt_state["mu"]["encoding"]["grid"]
        assert {s.data.shape for s in mu_grid.addressable_shards} == \
            {(grid.shape[0] // n_model,)}
        w = jax.tree_util.tree_leaves(state_b.params["network"])[0]
        assert {s.data.shape for s in w.addressable_shards} == {w.shape}

        step_b = hp.make_training_step(model_b.trainer)
        key = jax.random.key(11)
        for i in range(4):
            key, k1, k2 = jax.random.split(key, 3)
            x = jax.random.uniform(k1, (n_data * 64, 2))
            t = jax.random.uniform(k2, (n_data * 64, 3))
            state_a, la = model_a.trainer.training_step(state_a, x, t)
            state_b, lb = step_b(state_b, hp.shard_batch(x),
                                 hp.shard_batch(t))
            # Same math modulo fp32 add order (per-shard partial sums
            # psum in a different order than the corner loop), which
            # Adam's rsqrt amplifies a little over the steps.
            np.testing.assert_allclose(float(la), float(lb), rtol=5e-4)
        # Reassembled (gather_state inverts the block-cyclic layout)
        # sharded tables equal the single-device ones.
        ga = np.asarray(state_a.params["encoding"]["grid"])
        gb = hp.gather_state(state_b).params["encoding"]["grid"]
        np.testing.assert_allclose(ga, np.asarray(gb), rtol=5e-3, atol=1e-6)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_sharded_inference(self):
        model = tcnn.create_from_config(2, 3, config())
        state = model.trainer.initial_state()
        hp = HybridParallel(n_model=4, model=model)
        infer = hp.make_inference(model.trainer)
        x = jax.random.uniform(jax.random.key(1), (hp.n_data * 32, 2))
        y = infer(hp.shard_state(state.params), hp.shard_batch(x))
        y_ref = model.trainer.forward(state, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_composite_btf_style_grids(self):
        """BTF-style 4-D input: two 2-D grids composited — BOTH nested
        tables shard over the model axis."""
        cfg = {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
            "encoding": {"otype": "Composite", "nested": [
                {"otype": "HashGrid", "n_dims_to_encode": 2, "n_levels": 4,
                 "n_features_per_level": 2, "log2_hashmap_size": 10,
                 "base_resolution": 4, "per_level_scale": 1.5},
                {"otype": "HashGrid", "n_dims_to_encode": 2, "n_levels": 4,
                 "n_features_per_level": 2, "log2_hashmap_size": 10,
                 "base_resolution": 4, "per_level_scale": 1.5},
            ]},
            "network": {"otype": "MLP", "n_neurons": 32,
                        "n_hidden_layers": 2},
        }
        model_a = tcnn.create_from_config(4, 3, cfg)
        model_b = tcnn.create_from_config(4, 3, cfg)
        state_a = model_a.trainer.initial_state()
        hp = HybridParallel(n_model=2, model=model_b)
        state_b = hp.shard_state(model_b.trainer.initial_state())
        n_sharded = sum(
            1 for leaf in jax.tree_util.tree_leaves(state_b.params)
            if {s.data.shape for s in leaf.addressable_shards}
            != {leaf.shape})
        assert n_sharded == 2, "both nested grid tables must shard"
        step_b = hp.make_training_step(model_b.trainer)
        key = jax.random.key(13)
        for i in range(3):
            key, k1, k2 = jax.random.split(key, 3)
            x = jax.random.uniform(k1, (hp.n_data * 64, 4))
            t = jax.random.uniform(k2, (hp.n_data * 64, 3))
            state_a, la = model_a.trainer.training_step(state_a, x, t)
            state_b, lb = step_b(state_b, hp.shard_batch(x),
                                 hp.shard_batch(t))
            np.testing.assert_allclose(float(la), float(lb), rtol=5e-4)

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    def test_second_order_through_sharded_tables(self):
        """Eikonal-style grad-of-grad (SDF training, the reference's
        test_grid_bwdbwd use case): d/dtable of mean(|dy/dx|²) through
        the sharded path must match the unsharded value — the
        all_gather/psum_scatter pair are linear, so their transposes
        compose to any differentiation order."""
        from jax.sharding import PartitionSpec as P

        from tcnn_tpu.ops import grid_ops

        spec = grid_ops.make_grid_spec(
            n_dims=2, n_levels=3, n_features_per_level=2,
            log2_hashmap_size=8, base_resolution=4, per_level_scale=1.5)
        n = 4
        assert spec.n_entries % n == 0
        table = jax.random.normal(jax.random.key(0),
                                  (spec.n_params,)) * 1e-2
        x = jax.random.uniform(jax.random.key(1), (n * 64, 2))

        def eik_loss(t, xx):
            g = jax.grad(lambda xv: grid_ops.grid_encode(spec, t, xv).sum())(xx)
            return jnp.mean(g * g)

        g_ref = jax.grad(eik_loss)(table, x)

        mesh = make_mesh(jax.devices()[:n], axis_name="model")
        perm = grid_ops.block_cyclic_perm(spec, n)

        def per_shard(t_shard, x_shard):
            def local(ts):
                with grid_ops.sharded_tables("model", n):
                    return eik_loss(ts, x_shard)
            # Σ_ranks local-mean → group mean: ÷ n (sharded_tables
            # gradient convention).
            return jax.grad(local)(t_shard) / n

        g_sh = jax.jit(jax.shard_map(
            per_shard, mesh=mesh, in_specs=(P("model"), P("model")),
            out_specs=P("model"), check_vma=False))(table[perm], x)
        # g_sh is in the device (block-cyclic) layout; invert it.
        np.testing.assert_allclose(np.asarray(g_sh)[np.argsort(perm)],
                                   np.asarray(g_ref), rtol=1e-5, atol=1e-9)

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    def test_per_element_max_level_sharded(self):
        """The per-sample coarse-to-fine mask (grid.h:69-92) must ride
        the all_gather with its batch: sharded outputs == unsharded."""
        from jax.sharding import PartitionSpec as P

        from tcnn_tpu.ops import grid_ops

        spec = grid_ops.make_grid_spec(
            n_dims=2, n_levels=4, n_features_per_level=2,
            log2_hashmap_size=8, base_resolution=4, per_level_scale=1.5)
        n = 4
        table = jax.random.normal(jax.random.key(0),
                                  (spec.n_params,)) * 1e-2
        x = jax.random.uniform(jax.random.key(1), (n * 32, 2))
        frac = jax.random.uniform(jax.random.key(2), (n * 32,))
        y_ref = grid_ops.grid_encode(spec, table, x,
                                     max_level_per_element=frac)

        mesh = make_mesh(jax.devices()[:n], axis_name="model")
        perm = grid_ops.block_cyclic_perm(spec, n)

        def per_shard(t_shard, x_shard, frac_shard):
            with grid_ops.sharded_tables("model", n):
                return grid_ops.grid_encode(
                    spec, t_shard, x_shard, max_level_per_element=frac_shard)

        y = jax.jit(jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("model"), P("model"), P("model")),
            out_specs=P("model"), check_vma=False))(table[perm], x, frac)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=5e-8)

    def test_replicated_table_falls_through(self):
        """Under the sharded_tables context a FULL-size table (a grid
        left replicated, e.g. indivisible rows) must compute the
        ordinary unsharded path."""
        from jax.sharding import PartitionSpec as P

        from tcnn_tpu.ops import grid_ops

        spec = grid_ops.make_grid_spec(
            n_dims=2, n_levels=3, n_features_per_level=2,
            log2_hashmap_size=8, base_resolution=4, per_level_scale=1.5)
        table = jax.random.normal(jax.random.key(0),
                                  (spec.n_params,)) * 1e-2
        x = jax.random.uniform(jax.random.key(1), (len(jax.devices()) * 8, 2))
        y_ref = grid_ops.grid_encode(spec, table, x)

        mesh = make_mesh()

        def f(table, x):
            with grid_ops.sharded_tables("data", mesh.size):
                return grid_ops.grid_encode(spec, table, x)

        y = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=P("data"), check_vma=False))(table, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-7)

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    @pytest.mark.parametrize("opt_cfg", [
        {"otype": "Shampoo", "learning_rate": 1e-2},
        {"otype": "Average", "n_samples": 3,
         "nested": {"otype": "Adam", "learning_rate": 1e-2}},
    ])
    def test_nontrivial_optimizer_state_shards(self, opt_cfg):
        """Optimizer states whose mirrors are NOT flat Adam-style trees
        must still train with sharded tables: Shampoo (params-mirrored
        mu/nu + matrix-only preconditioners) and Average (ring buffer
        with a leading n_samples axis, table rows on the LAST axis)."""
        cfg = dict(config(), optimizer=opt_cfg)
        model_a = tcnn.create_from_config(2, 3, cfg)
        model_b = tcnn.create_from_config(2, 3, cfg)
        state_a = model_a.trainer.initial_state()
        hp = HybridParallel(n_model=2, devices=jax.devices()[:4],
                            model=model_b)
        state_b = hp.shard_state(model_b.trainer.initial_state())

        # The table's state mirrors must be sharded like the table.
        grid = state_b.params["encoding"]["grid"]
        n = grid.shape[0]
        if opt_cfg["otype"] == "Shampoo":
            mu = state_b.opt_state["mu"]["encoding"]["grid"]
            assert {s.data.shape for s in mu.addressable_shards} == \
                {(n // 2,)}
        else:
            buf = state_b.opt_state["buffer"]["encoding"]["grid"]
            assert buf.shape == (3, n)
            assert {s.data.shape for s in buf.addressable_shards} == \
                {(3, n // 2)}

        step_b = hp.make_training_step(model_b.trainer)
        key = jax.random.key(5)
        for i in range(3):
            key, k1, k2 = jax.random.split(key, 3)
            x = jax.random.uniform(k1, (128, 2))
            t = jax.random.uniform(k2, (128, 3))
            state_a, la = model_a.trainer.training_step(state_a, x, t)
            state_b, lb = step_b(state_b, hp.shard_batch(x),
                                 hp.shard_batch(t))
            np.testing.assert_allclose(float(la), float(lb), rtol=5e-4)
        ga = np.asarray(state_a.params["encoding"]["grid"])
        gathered = hp.gather_state(state_b)
        gb = gathered.params["encoding"]["grid"]
        np.testing.assert_allclose(ga, np.asarray(gb), rtol=5e-3, atol=1e-6)
        if opt_cfg["otype"] == "Average":
            # Ring buffer gathers back to canonical row order too.
            ba = np.asarray(
                state_a.opt_state["buffer"]["encoding"]["grid"])
            bb = np.asarray(gathered.opt_state["buffer"]["encoding"]["grid"])
            np.testing.assert_allclose(ba, bb, rtol=5e-3, atol=1e-6)

    def test_bad_mesh_raises(self):
        if len(jax.devices()) % 3:
            with pytest.raises(ValueError, match="divisible"):
                make_hybrid_mesh(3)
        with pytest.raises(ValueError, match="n_model"):
            HybridParallel()


class TestJitShardingsLowering:
    def test_jit_lowering_matches_shard_map(self):
        """use_shard_map=False (plain jit + shardings, the kernel-free
        comparison lowering) must produce the same loss curve as the
        production shard_map lowering on the XLA compute path."""
        model_a = tcnn.create_from_config(2, 3, config())
        model_b = tcnn.create_from_config(2, 3, config())
        dp = DataParallel()
        step_a = dp.make_training_step(model_a.trainer, use_shard_map=True)
        step_b = dp.make_training_step(model_b.trainer, use_shard_map=False)
        state_a = dp.replicate(model_a.trainer.initial_state())
        state_b = dp.replicate(model_b.trainer.initial_state())
        key = jax.random.key(7)
        for i in range(3):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            x = dp.shard_batch(jax.random.uniform(k1, (8 * 64, 2)))
            t = dp.shard_batch(jax.random.uniform(k2, (8 * 64, 3)))
            state_a, la = step_a(state_a, x, t)
            state_b, lb = step_b(state_b, x, t)
            np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)


class TestShardedTablesWithKernels:
    """Block-cyclic table shards are themselves valid smaller grids
    (grid_ops._interpolate_sharded), so the production kernels — the
    MXU one-hot matmul and the serial Pallas pair/unpaired scatters —
    run per shard UNCHANGED.  Forced on here (interpret mode on CPU),
    with routing pinned to each implementation via the MAC-budget env
    knobs; parity is asserted against the unsharded pure-jnp path,
    covering block-boundary pairs and level wraps (log2_hashmap_size=6
    → 64-row levels in 16-row blocks under 512 random samples/rank)."""

    def _spec(self, hash_type=None, grid_type=None, base_resolution=4):
        from tcnn_tpu.common import GridType, HashType

        from tcnn_tpu.ops import grid_ops

        kw = {}
        if hash_type is not None:
            kw["hash_type"] = HashType.from_string(hash_type)
        if grid_type is not None:
            kw["grid_type"] = GridType.from_string(grid_type)
        return grid_ops.make_grid_spec(
            n_dims=2, n_levels=4, n_features_per_level=2,
            log2_hashmap_size=6, base_resolution=base_resolution,
            per_level_scale=1.6, **kw)

    def _data(self, spec, n):
        table = jax.random.normal(jax.random.key(0),
                                  (spec.n_params,)) * 1e-2
        x = jax.random.uniform(jax.random.key(1), (n * 512, 2))
        dy = jax.random.normal(jax.random.key(2),
                               (n * 512, spec.n_levels
                                * spec.n_features_per_level))
        return table, x, dy

    def _route(self, monkeypatch, route):
        monkeypatch.setenv("TCNN_TPU_FORCE_FAST_SCATTER", "1")
        budget = "1000000000" if route == "mm" else "0"
        monkeypatch.setenv("TCNN_TPU_MM_BUDGET_PAIRED", budget)
        monkeypatch.setenv("TCNN_TPU_MM_BUDGET_UNPAIRED", budget)

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    @pytest.mark.parametrize("route", ["mm", "serial"])
    @pytest.mark.parametrize("variant", [
        ("CoherentAdd", None, 4),    # paired hash levels (+ true wraps)
        ("CoherentPrime", None, 4),  # unpaired hash levels
        (None, "Tiled", 4),          # dense strides + tiled % wraps
    ])
    def test_fwd_and_table_grad_parity(self, monkeypatch, route, variant):
        from tcnn_tpu.ops import grid_ops

        hash_type, grid_type, base_res = variant
        self._route(monkeypatch, route)
        spec = self._spec(hash_type, grid_type, base_res)
        n = 4
        perm = grid_ops.block_cyclic_perm(spec, n)
        table, x, dy = self._data(spec, n)

        y_ref = grid_ops.grid_encode(spec, table, x, fast_scatter=False)
        g_ref = jax.grad(lambda t: jnp.vdot(
            grid_ops.grid_encode(spec, t, x, fast_scatter=False),
            dy))(table)

        mesh = make_mesh(jax.devices()[:n], axis_name="model")

        def per_shard(t_shard, x_shard, dy_shard):
            def local(ts):
                with grid_ops.sharded_tables("model", n):
                    y = grid_ops.grid_encode(spec, ts, x_shard)
                # Σ_ranks of the local vdot == the global vdot, so the
                # table grads need no ÷n here.
                return jnp.vdot(y, dy_shard), y
            (_, y), g = jax.value_and_grad(local, has_aux=True)(t_shard)
            return y, g

        y, g = jax.jit(jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("model"), P("model"), P("model")),
            out_specs=(P("model"), P("model")), check_vma=False))(
                table[perm], x, dy)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-3, atol=1e-7)
        np.testing.assert_allclose(np.asarray(g)[np.argsort(perm)],
                                   np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-7)

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    def test_mm_paired_packing_parity(self, monkeypatch):
        """The pair-packed MXU kernels (TCNN_TPU_MM_PAIRED) must see
        the same wrap semantics through the shard-level meta."""
        from tcnn_tpu.ops import grid_ops

        self._route(monkeypatch, "mm")
        monkeypatch.setenv("TCNN_TPU_MM_PAIRED", "1")
        spec = self._spec("CoherentAdd")
        n = 4
        perm = grid_ops.block_cyclic_perm(spec, n)
        table, x, dy = self._data(spec, n)
        g_ref = jax.grad(lambda t: jnp.vdot(
            grid_ops.grid_encode(spec, t, x, fast_scatter=False),
            dy))(table)

        mesh = make_mesh(jax.devices()[:n], axis_name="model")

        def per_shard(t_shard, x_shard, dy_shard):
            def local(ts):
                with grid_ops.sharded_tables("model", n):
                    return jnp.vdot(
                        grid_ops.grid_encode(spec, ts, x_shard), dy_shard)
            return jax.grad(local)(t_shard)

        g = jax.jit(jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("model"), P("model"), P("model")),
            out_specs=P("model"), check_vma=False))(table[perm], x, dy)
        np.testing.assert_allclose(np.asarray(g)[np.argsort(perm)],
                                   np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-7)

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    @pytest.mark.parametrize("route", ["mm", "serial"])
    def test_second_order_through_sharded_kernels(self, monkeypatch, route):
        """Eikonal grad-of-grad with the kernels engaged per shard."""
        from tcnn_tpu.ops import grid_ops

        self._route(monkeypatch, route)
        spec = self._spec("CoherentAdd")
        n = 4
        perm = grid_ops.block_cyclic_perm(spec, n)
        table = jax.random.normal(jax.random.key(0),
                                  (spec.n_params,)) * 1e-2
        x = jax.random.uniform(jax.random.key(1), (n * 512, 2))

        def eik_loss(t, xx, fast):
            g = jax.grad(lambda xv: grid_ops.grid_encode(
                spec, t, xv, fast_scatter=fast).sum())(xx)
            return jnp.mean(g * g)

        g_ref = jax.grad(lambda t: eik_loss(t, x, False))(table)

        mesh = make_mesh(jax.devices()[:n], axis_name="model")

        def per_shard(t_shard, x_shard):
            def local(ts):
                with grid_ops.sharded_tables("model", n):
                    return eik_loss(ts, x_shard, True)
            return jax.grad(local)(t_shard) / n

        g = jax.jit(jax.shard_map(
            per_shard, mesh=mesh, in_specs=(P("model"), P("model")),
            out_specs=P("model"), check_vma=False))(table[perm], x)
        np.testing.assert_allclose(np.asarray(g)[np.argsort(perm)],
                                   np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-8)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_hybrid_step_with_kernels(self, monkeypatch):
        """End-to-end HybridParallel training step with the production
        kernels engaged: loss curve matches single-device."""
        monkeypatch.setenv("TCNN_TPU_FORCE_FAST_SCATTER", "1")
        cfg = config()
        cfg["encoding"]["hash"] = "CoherentAdd"
        model_a = tcnn.create_from_config(2, 3, cfg)
        model_b = tcnn.create_from_config(2, 3, cfg)
        state_a = model_a.trainer.initial_state()
        hp = HybridParallel(n_model=2, model=model_b)
        state_b = hp.shard_state(model_b.trainer.initial_state())
        step_b = hp.make_training_step(model_b.trainer)
        key = jax.random.key(23)
        for i in range(3):
            key, k1, k2 = jax.random.split(key, 3)
            x = jax.random.uniform(k1, (hp.n_devices * 512, 2))
            t = jax.random.uniform(k2, (hp.n_devices * 512, 3))
            state_a, la = model_a.trainer.training_step(state_a, x, t)
            state_b, lb = step_b(state_b, hp.shard_batch(x),
                                 hp.shard_batch(t))
            np.testing.assert_allclose(float(la), float(lb), rtol=5e-4)


class TestShardedTablesFuzz:
    """Randomized grid-spec × shard-count parity sweep for the
    block-cyclic sharded path with kernels engaged — hardens the
    shard-localization (especially the paired wrap pinning) against
    shapes beyond the hand-picked cases."""

    def _cases():
        rng = np.random.RandomState(99)
        cases = []
        for _ in range(40):
            cases.append((
                int(rng.choice([2, 3])),            # n_dims
                int(rng.randint(2, 5)),             # n_levels
                int(rng.choice([1, 2, 4])),         # F
                int(rng.choice([5, 6, 7])),         # log2_hashmap_size
                int(rng.choice([3, 4, 5])),         # base_resolution
                float(rng.choice([1.4, 1.6, 2.0])),
                str(rng.choice(["Hash", "Tiled", "Dense"])),
                str(rng.choice(["CoherentAdd", "CoherentPrime", "Prime"])),
                int(rng.choice([2, 4])),            # n_shards
                str(rng.choice(["mm", "serial"])),
            ))
        # dedupe, keep a manageable subset
        out = sorted(set(cases))
        return out[::3][:10]

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    @pytest.mark.parametrize("case", _cases())
    def test_random_spec_parity(self, monkeypatch, case):
        from tcnn_tpu.common import GridType, HashType
        from tcnn_tpu.ops import grid_ops

        (D, L, F, log2, base, pls, gtype, htype, n, route) = case
        monkeypatch.setenv("TCNN_TPU_FORCE_FAST_SCATTER", "1")
        budget = "1000000000" if route == "mm" else "0"
        monkeypatch.setenv("TCNN_TPU_MM_BUDGET_PAIRED", budget)
        monkeypatch.setenv("TCNN_TPU_MM_BUDGET_UNPAIRED", budget)
        spec = grid_ops.make_grid_spec(
            n_dims=D, n_levels=L, n_features_per_level=F,
            log2_hashmap_size=log2, base_resolution=base,
            per_level_scale=pls, grid_type=GridType.from_string(gtype),
            hash_type=HashType.from_string(htype))
        if not grid_ops.shardable_levels(spec, n):
            pytest.skip(f"level sizes {[lv.size for lv in spec.levels]} "
                        f"not {n}-shardable (left replicated by design)")
        perm = grid_ops.block_cyclic_perm(spec, n)
        table = jax.random.normal(jax.random.key(3),
                                  (spec.n_params,)) * 1e-2
        x = jax.random.uniform(jax.random.key(4), (n * 512, D))
        dy = jax.random.normal(jax.random.key(5), (n * 512, L * F))

        y_ref = grid_ops.grid_encode(spec, table, x, fast_scatter=False)
        g_ref = jax.grad(lambda t: jnp.vdot(
            grid_ops.grid_encode(spec, t, x, fast_scatter=False),
            dy))(table)

        mesh = make_mesh(jax.devices()[:n], axis_name="model")

        def per_shard(t_shard, x_shard, dy_shard):
            def local(ts):
                with grid_ops.sharded_tables("model", n):
                    y = grid_ops.grid_encode(spec, ts, x_shard)
                return jnp.vdot(y, dy_shard), y
            (_, y), g = jax.value_and_grad(local, has_aux=True)(t_shard)
            return y, g

        y, g = jax.jit(jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P("model"), P("model"), P("model")),
            out_specs=(P("model"), P("model")), check_vma=False))(
                table[perm], x, dy)
        # Tolerance bounds the mm path's two-term bf16-split error
        # (~2^-17 relative per pass, a few corners accumulated), which
        # the unsharded fast path exhibits identically.
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=5e-3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g)[np.argsort(perm)],
                                   np.asarray(g_ref),
                                   rtol=5e-3, atol=1e-6)


class TestShardedSerializationGuard:
    """Checkpoints/exports must see the canonical row order, never the
    block-cyclic device layout: serializing a sharded state raises
    with a gather_state pointer; gather_state round-trips exactly."""

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    def test_sharded_state_refused_then_gathered_ok(self):
        model = tcnn.create_from_config(2, 3, config())
        hp = HybridParallel(n_model=2, model=model)
        state0 = model.trainer.initial_state()
        blob0 = model.trainer.serialize(state0)
        state = hp.shard_state(state0)
        with pytest.raises(ValueError, match="gather_state"):
            model.trainer.serialize(state)
        from tcnn_tpu.utils import cuda_export
        with pytest.raises(ValueError, match="gather_state"):
            cuda_export.export_snapshot(model.trainer, state)
        from tcnn_tpu import serving
        with pytest.raises(ValueError, match="gather_state"):
            serving.export_inference(model.trainer, state,
                                     batch_sizes=(256,))
        gathered = hp.gather_state(state)
        blob1 = model.trainer.serialize(gathered)
        a = jax.tree_util.tree_leaves(blob0["params"])
        b = jax.tree_util.tree_leaves(blob1["params"])
        for x, y in zip(a, b):
            assert x == y  # bit-identical canonical order round-trip
