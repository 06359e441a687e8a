"""Orbax production checkpoints (utils/checkpoint.py): sharded-aware
save/restore + the step-indexed manager.  Complements the
reference-parity JSON snapshots (test_trainer / test_cuda_export)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tcnn
from tcnn_tpu.utils import checkpoint as ckpt


def _config():
    return {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "n_features_per_level": 2, "log2_hashmap_size": 10,
                     "base_resolution": 4, "per_level_scale": 1.5},
        "network": {"otype": "MLP", "n_neurons": 32, "n_hidden_layers": 2},
    }


def _train(model, state, steps=2):
    key = jax.random.key(0)
    for i in range(steps):
        key, k1, k2 = jax.random.split(key, 3)
        x = jax.random.uniform(k1, (512, 2))
        t = jax.random.uniform(k2, (512, 3))
        state, _ = model.trainer.training_step(state, x, t)
    return state


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(jax.device_get(x)),
                                      np.asarray(jax.device_get(y)))


class TestCheckpoint:
    def test_roundtrip_replicated(self, tmp_path):
        model = tcnn.create_from_config(2, 3, _config())
        state = _train(model, model.trainer.initial_state())
        ckpt.save_checkpoint(tmp_path / "ck", state)
        back = ckpt.restore_checkpoint(tmp_path / "ck",
                                       like=model.trainer.initial_state())
        _assert_tree_equal(state, back)
        # restored state trains on
        back, loss = model.trainer.training_step(
            back, jnp.zeros((512, 2)), jnp.zeros((512, 3)))
        assert np.isfinite(float(loss))

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    def test_roundtrip_sharded_state(self, tmp_path):
        """HybridParallel block-cyclic shards checkpoint IN PLACE (no
        gather) and restore with their shardings."""
        from tcnn_tpu.parallel import HybridParallel

        model = tcnn.create_from_config(2, 3, _config())
        hp = HybridParallel(n_model=2, model=model)
        state = hp.shard_state(model.trainer.initial_state())
        step = hp.make_training_step(model.trainer)
        x = jax.random.uniform(jax.random.key(1), (hp.n_devices * 64, 2))
        t = jax.random.uniform(jax.random.key(2), (hp.n_devices * 64, 3))
        state, _ = step(state, hp.shard_batch(x), hp.shard_batch(t))

        ckpt.save_checkpoint(tmp_path / "ck", state)
        like = hp.shard_state(model.trainer.initial_state())
        back = ckpt.restore_checkpoint(tmp_path / "ck", like=like)
        grid = back.params["encoding"]["grid"]
        assert not grid.sharding.is_fully_replicated, "sharding restored"
        _assert_tree_equal(state, back)
        # restored sharded state steps on
        back, loss = step(back, hp.shard_batch(x), hp.shard_batch(t))
        assert np.isfinite(float(loss))

    def test_manager_interval_retention_and_restore(self, tmp_path):
        model = tcnn.create_from_config(2, 3, _config())
        state = model.trainer.initial_state()
        mgr = ckpt.make_manager(tmp_path / "run", max_to_keep=2,
                                save_interval_steps=2, async_save=False)
        key = jax.random.key(3)
        saved = []
        for i in range(5):
            key, k1, k2 = jax.random.split(key, 3)
            x = jax.random.uniform(k1, (512, 2))
            t = jax.random.uniform(k2, (512, 3))
            state, _ = model.trainer.training_step(state, x, t)
            if ckpt.save_step(mgr, state):
                saved.append(int(jax.device_get(state.step)))
        assert saved, "interval saves happened"
        assert mgr.latest_step() == saved[-1]
        assert len(mgr.all_steps()) <= 2, "retention enforced"
        back = ckpt.restore_latest(mgr, like=model.trainer.initial_state())
        assert int(jax.device_get(back.step)) == saved[-1]
        mgr.close()

    def test_restore_latest_empty(self, tmp_path):
        model = tcnn.create_from_config(2, 3, _config())
        mgr = ckpt.make_manager(tmp_path / "empty", async_save=False)
        assert ckpt.restore_latest(
            mgr, like=model.trainer.initial_state()) is None
        mgr.close()

    def test_layout_tag_records_then_refuses_mismatch(self, tmp_path):
        d = str(tmp_path / "tagged")
        ckpt.check_layout_tag(d, {"n_model": 2})      # records
        ckpt.check_layout_tag(d, {"n_model": 2})      # same: ok
        with pytest.raises(ValueError, match="permuted grid tables"):
            ckpt.check_layout_tag(d, {"n_model": 4})  # mismatch
