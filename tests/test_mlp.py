"""MLP / FusedMLP tests: math against hand-rolled matmuls, init
statistics, and the Pallas fused kernel (interpret mode on CPU) against
the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tcnn
from tcnn_tpu.common import Activation


def key(i=0):
    return jax.random.key(i)


class TestMLP:
    def test_matches_manual_matmuls(self):
        mlp = tcnn.MLP(n_input_dims=4, n_output_dims=3, n_neurons=16,
                       n_hidden_layers=2, activation=Activation.RELU)
        params = mlp.init(key(1))
        x = jax.random.normal(key(2), (8, 4))
        y = np.asarray(mlp.apply(params, x))
        h = np.asarray(x)
        ws = [np.asarray(w) for w in params["layers"]]
        h = np.maximum(h @ ws[0], 0)
        h = np.maximum(h @ ws[1], 0)
        expect = h @ ws[2]
        np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-5)

    def test_layer_shapes(self):
        mlp = tcnn.MLP(n_input_dims=10, n_output_dims=7, n_neurons=32,
                       n_hidden_layers=3)
        params = mlp.init(key(3))
        shapes = [w.shape for w in params["layers"]]
        assert shapes == [(10, 32), (32, 32), (32, 32), (32, 7)]

    def test_zero_hidden_layers_is_single_matmul(self):
        # cutlass_mlp.cu:64-67 supports n_hidden_layers == 0.
        mlp = tcnn.MLP(n_input_dims=4, n_output_dims=2, n_hidden_layers=0)
        params = mlp.init(key(4))
        assert [w.shape for w in params["layers"]] == [(4, 2)]
        x = jax.random.normal(key(5), (8, 4))
        np.testing.assert_allclose(
            np.asarray(mlp.apply(params, x)),
            np.asarray(x) @ np.asarray(params["layers"][0]),
            rtol=1e-5, atol=1e-6)

    def test_xavier_init_range(self):
        mlp = tcnn.MLP(n_input_dims=64, n_output_dims=64, n_neurons=64,
                       n_hidden_layers=2)
        params = mlp.init(key(6))
        w = np.asarray(params["layers"][1])
        bound = np.sqrt(6.0 / 128.0)
        assert np.abs(w).max() <= bound + 1e-6
        assert np.abs(w).max() > bound * 0.8  # actually fills the range

    def test_siren_init_first_layer_scaled(self):
        mlp = tcnn.MLP(n_input_dims=2, n_output_dims=1, n_neurons=64,
                       n_hidden_layers=2, activation=Activation.SINE)
        params = mlp.init(key(7))
        w0 = np.abs(np.asarray(params["layers"][0])).max()
        w1 = np.abs(np.asarray(params["layers"][1])).max()
        assert w0 <= 30.0 / 2 + 1e-5
        assert w1 <= np.sqrt(6.0 / 64) + 1e-6

    @pytest.mark.parametrize("act", list(Activation))
    def test_all_activations_differentiable(self, act):
        mlp = tcnn.MLP(n_input_dims=4, n_output_dims=2, n_neurons=16,
                       n_hidden_layers=1, activation=act)
        params = mlp.init(key(8))
        x = jax.random.normal(key(9), (4, 4)) * 0.1

        g = jax.grad(lambda p: jnp.sum(mlp.apply(p, x) ** 2))(params)
        assert all(bool(jnp.all(jnp.isfinite(w)))
                   for w in g["layers"])


class TestFusedMLP:
    def _pair(self, width=64, h=2, act=Activation.RELU,
              out_act=Activation.NONE, d_in=32, d_out=16):
        fused = tcnn.FusedMLP(
            n_input_dims=d_in, n_output_dims=d_out, n_neurons=width,
            n_hidden_layers=h, activation=act, output_activation=out_act,
            use_pallas=True)
        ref = tcnn.MLP(
            n_input_dims=d_in, n_output_dims=d_out, n_neurons=width,
            n_hidden_layers=h, activation=act, output_activation=out_act)
        params = ref.init(key(10))
        return fused, ref, params

    def test_width_restriction(self):
        with pytest.raises(ValueError, match="widths"):
            tcnn.FusedMLP(n_input_dims=4, n_output_dims=4, n_neurons=48,
                          n_hidden_layers=2)

    @pytest.mark.parametrize("width", [16, 32, 64, 128])
    def test_forward_matches_reference(self, width):
        fused, ref, params = self._pair(width=width)
        x = jax.random.uniform(key(11), (300, 32))  # non-multiple of tile
        y_f = np.asarray(fused.apply(params, x))
        y_r = np.asarray(ref.apply(params, x))
        assert y_f.shape == y_r.shape == (300, 16)
        np.testing.assert_allclose(y_f, y_r, rtol=1e-4, atol=1e-4)

    def test_backward_matches_reference(self):
        fused, ref, params = self._pair(width=32, h=3,
                                        act=Activation.LEAKY_RELU)
        x = jax.random.uniform(key(12), (256, 32))
        t = jax.random.uniform(key(13), (256, 16))

        def loss(m):
            def f(p, xx):
                return jnp.sum((m.apply(p, xx) - t) ** 2)
            return f

        gf_p, gf_x = jax.grad(loss(fused), argnums=(0, 1))(params, x)
        gr_p, gr_x = jax.grad(loss(ref), argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                                   rtol=1e-3, atol=1e-3)
        for a, b in zip(gf_p["layers"], gr_p["layers"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_single_hidden_layer(self):
        fused, ref, params = self._pair(width=16, h=1)
        x = jax.random.uniform(key(14), (64, 32))
        np.testing.assert_allclose(np.asarray(fused.apply(params, x)),
                                   np.asarray(ref.apply(params, x)),
                                   rtol=1e-4, atol=1e-4)

    def test_sine_activation(self):
        fused, ref, params = self._pair(width=32, h=2, act=Activation.SINE,
                                        out_act=Activation.SIGMOID)
        x = jax.random.uniform(key(15), (128, 32))
        np.testing.assert_allclose(np.asarray(fused.apply(params, x)),
                                   np.asarray(ref.apply(params, x)),
                                   rtol=1e-4, atol=1e-4)


class TestFusedMLPSecondOrder:
    """Eikonal-style grad-of-grad through the Pallas path (interpret
    mode on CPU).  The backward op carries its own custom_vjp — the
    reference's two-level autograd structure (modules.py:120-160)."""

    def test_pallas_second_order_matches_jnp(self):
        from tcnn_tpu.models.networks.fused_mlp import FusedMLP

        kw = dict(n_input_dims=16, n_output_dims=1, n_neurons=32,
                  n_hidden_layers=2, activation=Activation.RELU,
                  output_activation=Activation.NONE)
        net_p = FusedMLP(use_pallas=True, **kw)
        net_j = FusedMLP(use_pallas=False, **kw)
        p = net_p.init(jax.random.key(0))
        x = jax.random.uniform(jax.random.key(1), (64, 16))

        def eik(net):
            def f(p):
                gx = jax.grad(lambda xx: jnp.sum(
                    net.apply(p, xx).astype(jnp.float32)))(x)
                return jnp.sum(gx * gx)
            return f

        h_p = jax.grad(eik(net_p))(p)
        h_j = jax.grad(eik(net_j))(p)
        for a, b in zip(jax.tree_util.tree_leaves(h_p),
                        jax.tree_util.tree_leaves(h_j)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=1e-4)


class TestFusedMLPForwardMode:
    def test_jvp_falls_back_to_xla_chain(self):
        """jvp through FusedMLP auto-falls back to the identical-math
        XLA chain (the Pallas custom_vjp is reverse-only)."""
        fused = tcnn.FusedMLP(n_input_dims=32, n_output_dims=16,
                              n_neurons=64, n_hidden_layers=2,
                              use_pallas=True)
        ref = tcnn.MLP(n_input_dims=32, n_output_dims=16, n_neurons=64,
                       n_hidden_layers=2)
        params = ref.init(jax.random.key(40))
        x = jax.random.uniform(jax.random.key(41), (256, 32))
        v = jax.tree_util.tree_map(jnp.ones_like, params)
        y_f, t_f = jax.jvp(lambda p: fused.apply(p, x), (params,), (v,))
        y_r, t_r = jax.jvp(lambda p: ref.apply(p, x), (params,), (v,))
        np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                                   rtol=1e-4, atol=1e-4)


class TestSoAOutput:
    """output_soa=True returns (D_out, B) feature-major predictions —
    same values and same weight gradients as the AoS path, on both the
    forced-kernel route and the XLA fallback."""

    def _setup(self):
        from tcnn_tpu.models.networks.fused_mlp import FusedMLP
        from tcnn_tpu.common import Policy

        net = FusedMLP(8, 3, n_neurons=32, n_hidden_layers=2,
                       use_pallas=True)
        params = net.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (256, 8))
        return net, params, x

    def test_forward_parity(self):
        net, params, x = self._setup()
        y = net.apply(params, x)
        y_soa = net.apply(params, x, output_soa=True)
        assert y_soa.shape == (3, 256)
        np.testing.assert_allclose(np.asarray(y_soa), np.asarray(y).T,
                                   rtol=1e-5, atol=1e-5)

    def test_soa_in_and_out(self):
        net, params, x = self._setup()
        y = net.apply(params, x)
        y2 = net.apply(params, x.T, input_soa=True, output_soa=True)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y).T,
                                   rtol=1e-5, atol=1e-5)

    def test_grad_parity(self):
        net, params, x = self._setup()

        def loss_aos(p):
            y = net.apply(p, x)
            return jnp.sum(y.astype(jnp.float32) ** 2 * 0.01)

        def loss_soa(p):
            y = net.apply(p, x, output_soa=True)
            return jnp.sum(y.astype(jnp.float32) ** 2 * 0.01)

        g_a = jax.grad(loss_aos)(params)
        g_s = jax.grad(loss_soa)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_a),
                        jax.tree_util.tree_leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_xla_fallback_parity(self):
        from tcnn_tpu.models.networks.fused_mlp import FusedMLP

        net = FusedMLP(8, 3, n_neurons=32, n_hidden_layers=2,
                       use_pallas=False)
        params = net.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (64, 8))
        y = net.apply(params, x)
        y_soa = net.apply(params, x, output_soa=True)
        np.testing.assert_allclose(np.asarray(y_soa), np.asarray(y).T,
                                   rtol=1e-6, atol=1e-6)

    def test_trainer_uses_soa_path(self):
        """The trainer's SoA plumbing: the model advertises
        supports_soa_output and loss_value_and_grads matches the AoS
        loss value (on CPU the trainer keeps the AoS route — the SoA
        fast path is TPU-only — so this pins the equality both ways)."""
        import tcnn_tpu as tcnn

        model = tcnn.create_from_config(
            2, 3, {"encoding": {"otype": "HashGrid", "n_levels": 4,
                                "log2_hashmap_size": 10},
                   "network": {"otype": "FullyFusedMLP", "n_neurons": 32,
                               "n_hidden_layers": 2},
                   "loss": {"otype": "RelativeL2"},
                   "optimizer": {"otype": "Adam"}})
        tr = model.trainer
        assert getattr(tr.model, "supports_soa_output", False)
        state = tr.initial_state()
        x = jax.random.uniform(jax.random.key(3), (512, 2))
        t = jax.random.uniform(jax.random.key(4), (512, 3))
        loss_soa, grads = tr.loss_value_and_grads(state.params, x, t)

        pred = tr.model.apply(state.params, x).astype(jnp.float32)
        loss_aos = tr.loss(pred, t, None)
        np.testing.assert_allclose(float(loss_soa), float(loss_aos),
                                   rtol=1e-5)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(grads))
