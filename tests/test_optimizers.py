"""Optimizer tests — Adam against a NumPy re-derivation of the
reference kernel (adam.h:48-180) including lazy hash-grid stepping, and
behavioral tests for every wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tcnn


def tree_allclose(a, b, **kw):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


class TestAdam:
    def test_matches_reference_math(self):
        """Simulate adam_step (adam.h:103-118) in NumPy and compare."""
        lr, b1, b2, eps, l2 = 1e-2, 0.9, 0.999, 1e-8, 1e-4
        opt = tcnn.Adam(learning_rate=lr, beta1=b1, beta2=b2, epsilon=eps,
                        l2_reg=l2)
        params = {"w": jnp.asarray([[0.5, -0.3], [0.2, 0.8]])}
        layout = {"w": "matrix"}
        state = opt.init(params, layout)

        w = np.asarray(params["w"], np.float64)
        mu = np.zeros_like(w)
        nu = np.zeros_like(w)
        for t in range(1, 4):
            g = np.full_like(w, 0.1 * t)
            state, params = opt.step(state, {"w": jnp.asarray(g, jnp.float32)},
                                     params)
            geff = g + l2 * w
            mu = b1 * mu + (1 - b1) * geff
            nu = b2 * nu + (1 - b2) * geff ** 2
            lr_t = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
            w = w - lr_t / (np.sqrt(nu) + eps) * mu
            np.testing.assert_allclose(np.asarray(params["w"]), w,
                                       rtol=1e-4, atol=1e-6)

    def test_lazy_non_matrix_stepping(self):
        """Zero-grad hash-table entries must not advance their moments
        or step counters (adam.h:76-79, :103-105)."""
        opt = tcnn.Adam(learning_rate=0.1)
        params = {"grid": jnp.asarray([1.0, 2.0, 3.0])}
        layout = {"grid": "other"}
        state = opt.init(params, layout)
        grads = {"grid": jnp.asarray([0.0, 0.5, 0.0])}
        state, params = opt.step(state, grads, params)
        assert float(params["grid"][0]) == 1.0  # untouched
        assert float(params["grid"][2]) == 3.0
        assert float(params["grid"][1]) != 2.0
        np.testing.assert_array_equal(np.asarray(state["param_steps"]["grid"]),
                                      [0, 1, 0])

    def test_non_matrix_lr_factor(self):
        opt = tcnn.Adam(learning_rate=0.1, non_matrix_learning_rate_factor=0.0)
        params = {"grid": jnp.asarray([1.0])}
        state = opt.init(params, {"grid": "other"})
        _, params2 = opt.step(state, {"grid": jnp.asarray([0.5])}, params)
        np.testing.assert_allclose(np.asarray(params2["grid"]), [1.0])

    def test_no_l2_on_non_matrix(self):
        opt = tcnn.Adam(learning_rate=0.1, l2_reg=100.0)
        params = {"grid": jnp.asarray([1.0]), "w": jnp.asarray([[1.0]])}
        layout = {"grid": "other", "w": "matrix"}
        state = opt.init(params, layout)
        grads = {"grid": jnp.asarray([0.0]), "w": jnp.asarray([[0.0]])}
        _, params2 = opt.step(state, grads, params)
        assert float(params2["grid"][0]) == 1.0     # zero grad + lazy
        assert float(params2["w"][0, 0]) != 1.0     # l2 reg pulls matrix

    def test_adabound_bounds_step(self):
        """At t=1 with β2=0.999 the AdaBound window is [1e-4, 100.1]
        (adam.h:152-159), so an absurd lr=1e3 is clamped: the step is
        upper·mu ≈ 10, vs ≈1000 unclamped."""
        params = {"w": jnp.asarray([[1.0]])}
        g = {"w": jnp.asarray([[1.0]])}

        opt = tcnn.Adam(learning_rate=1e3, adabound=True)
        state = opt.init(params, {"w": "matrix"})
        _, p_bound = opt.step(state, g, params)
        delta_bound = abs(float(p_bound["w"][0, 0]) - 1.0)

        opt2 = tcnn.Adam(learning_rate=1e3, adabound=False)
        state2 = opt2.init(params, {"w": "matrix"})
        _, p_free = opt2.step(state2, g, params)
        delta_free = abs(float(p_free["w"][0, 0]) - 1.0)

        np.testing.assert_allclose(delta_bound, 10.01, rtol=1e-3)
        assert delta_free > 100 * delta_bound * 0.9


class TestSGD:
    def test_step(self):
        opt = tcnn.SGD(learning_rate=0.5, l2_reg=0.0)
        params = {"w": jnp.asarray([[2.0]])}
        state = opt.init(params, {"w": "matrix"})
        _, p2 = opt.step(state, {"w": jnp.asarray([[1.0]])}, params)
        assert float(p2["w"][0, 0]) == 1.5


class TestNovograd:
    def test_decreases_loss(self):
        opt = tcnn.Novograd(learning_rate=0.05)
        w = {"w": jnp.asarray([[1.0, -2.0]])}
        state = opt.init(w, {"w": "matrix"})
        for _ in range(50):
            g = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(w)
            state, w = opt.step(state, g, w)
        assert float(jnp.sum(w["w"] ** 2)) < 0.5

    def test_skips_non_matrix(self):
        opt = tcnn.Novograd(learning_rate=0.5)
        params = {"grid": jnp.asarray([1.0])}
        state = opt.init(params, {"grid": "other"})
        _, p2 = opt.step(state, {"grid": jnp.asarray([1.0])}, params)
        assert float(p2["grid"][0]) == 1.0


class TestWrappers:
    def _simple(self):
        params = {"w": jnp.asarray([1.0])}
        layout = {"w": "matrix"}
        return params, layout

    def test_ema_custom_weights(self):
        opt = tcnn.EMA(tcnn.SGD(learning_rate=0.1, l2_reg=0.0), decay=0.5)
        params, layout = self._simple()
        state = opt.init(params, layout)
        g = {"w": jnp.asarray([1.0])}
        state, params = opt.step(state, g, params)   # w: 1.0 -> 0.9
        cw = opt.custom_weights(state, params)
        # debiased EMA after 1 step equals the tracked weight exactly.
        np.testing.assert_allclose(float(cw["w"][0]), 0.9, rtol=1e-6)
        state, params = opt.step(state, g, params)   # w -> 0.8
        cw = opt.custom_weights(state, params)
        # raw ema = .5*(.45) wait: compute debiased: (0.5·0.45+0.5·0.8)/(1-0.25)
        expect = (0.5 * (0.5 * 0.9) + 0.5 * 0.8) / (1 - 0.25)
        np.testing.assert_allclose(float(cw["w"][0]), expect, rtol=1e-6)

    def test_average_custom_weights(self):
        opt = tcnn.Average(tcnn.SGD(learning_rate=0.1, l2_reg=0.0), n_samples=2)
        params, layout = self._simple()
        state = opt.init(params, layout)
        g = {"w": jnp.asarray([1.0])}
        state, params = opt.step(state, g, params)   # 0.9
        state, params = opt.step(state, g, params)   # 0.8
        state, params = opt.step(state, g, params)   # 0.7 (evicts 0.9)
        cw = opt.custom_weights(state, params)
        np.testing.assert_allclose(float(cw["w"][0]), (0.8 + 0.7) / 2,
                                   rtol=1e-6)

    def test_batched_steps_every_n(self):
        opt = tcnn.Batched(tcnn.SGD(learning_rate=1.0, l2_reg=0.0),
                           batch_size_multiplier=4)
        params, layout = self._simple()
        state = opt.init(params, layout)
        for i in range(3):
            state, params = opt.step(state, {"w": jnp.asarray([1.0])}, params)
            assert float(params["w"][0]) == 1.0  # not yet
        state, params = opt.step(state, {"w": jnp.asarray([1.0])}, params)
        np.testing.assert_allclose(float(params["w"][0]), 0.0)  # mean grad 1.0

    def test_lookahead_sync(self):
        opt = tcnn.Lookahead(tcnn.SGD(learning_rate=0.1, l2_reg=0.0),
                             alpha=0.5, n_steps=2)
        params, layout = self._simple()
        state = opt.init(params, layout)
        g = {"w": jnp.asarray([1.0])}
        state, params = opt.step(state, g, params)   # fast: 0.9
        assert abs(float(params["w"][0]) - 0.9) < 1e-6
        state, params = opt.step(state, g, params)   # fast: 0.8 -> sync
        # slow = 1.0 + 0.5·(0.8−1.0) = 0.9; fast reset to slow.
        np.testing.assert_allclose(float(params["w"][0]), 0.9, rtol=1e-6)

    def test_exponential_decay(self):
        opt = tcnn.ExponentialDecay(
            tcnn.SGD(learning_rate=1.0, l2_reg=0.0),
            decay_base=0.5, decay_start=2, decay_end=100, decay_interval=2)
        params, layout = self._simple()
        state = opt.init(params, layout)
        g = {"w": jnp.asarray([1.0])}
        deltas = []
        w_prev = float(params["w"][0])
        for _ in range(5):
            state, params = opt.step(state, g, params)
            w = float(params["w"][0])
            deltas.append(round(w_prev - w, 6))
            w_prev = w
        # steps 0,1 at lr 1.0; steps 2,3 at 0.5; step 4 at 0.25.
        assert deltas == [1.0, 1.0, 0.5, 0.5, 0.25]

    def test_composite_by_kind(self):
        opt = tcnn.Composite(
            [tcnn.SGD(learning_rate=1.0, l2_reg=0.0),
             tcnn.SGD(learning_rate=0.0, l2_reg=0.0)],
            kinds_each=["matrix", "other"])
        params = {"w": jnp.asarray([1.0]), "grid": jnp.asarray([1.0])}
        layout = {"w": "matrix", "grid": "other"}
        state = opt.init(params, layout)
        g = {"w": jnp.asarray([1.0]), "grid": jnp.asarray([1.0])}
        _, p2 = opt.step(state, g, params)
        assert float(p2["w"][0]) == 0.0
        assert float(p2["grid"][0]) == 1.0

    def test_composite_by_offsets(self):
        opt = tcnn.Composite(
            [tcnn.SGD(learning_rate=1.0, l2_reg=0.0),
             tcnn.SGD(learning_rate=0.0, l2_reg=0.0)],
            n_params_each=[2, 3])
        params = (jnp.zeros(2), jnp.ones(3))
        layout = ("matrix", "matrix")
        state = opt.init(params, layout)
        g = (jnp.ones(2), jnp.ones(3))
        _, p2 = opt.step(state, g, params)
        np.testing.assert_allclose(np.asarray(p2[0]), -1.0)
        np.testing.assert_allclose(np.asarray(p2[1]), 1.0)

    def test_composite_learning_rate_factor(self):
        """composite.h:93-99,151-163: the factor scales every nested lr;
        update_hyperparams forwards a "nested" array and the factor."""
        opt = tcnn.create_optimizer({
            "otype": "Composite", "learning_rate_factor": 0.5,
            "nested": [
                {"otype": "SGD", "learning_rate": 1.0, "l2_reg": 0.0,
                 "params": "matrix"},
                {"otype": "SGD", "learning_rate": 1.0, "l2_reg": 0.0,
                 "params": "other"},
            ]})
        assert opt.learning_rate == 0.5
        params = {"w": jnp.asarray([1.0]), "grid": jnp.asarray([1.0])}
        layout = {"w": "matrix", "grid": "other"}
        state = opt.init(params, layout)
        g = {"w": jnp.asarray([1.0]), "grid": jnp.asarray([1.0])}
        _, p2 = opt.step(state, g, params)
        # lr 1.0 scaled by factor 0.5 on both partitions
        assert float(p2["w"][0]) == 0.5
        assert float(p2["grid"][0]) == 0.5
        opt.update_hyperparams({
            "learning_rate_factor": 2.0,
            "nested": [{"learning_rate": 0.25}, {"learning_rate": 0.5}]})
        assert opt.learning_rate == 2.0
        assert opt.nested(0).learning_rate == 0.25
        assert opt.hyperparams()["learning_rate_factor"] == 2.0
        _, p3 = opt.step(state, g, params)
        assert float(p3["w"][0]) == 0.5    # 1 - 0.25*2
        assert float(p3["grid"][0]) == 0.0  # 1 - 0.5*2

    def test_composite_misaligned_raises(self):
        opt = tcnn.Composite(
            [tcnn.SGD(), tcnn.SGD()], n_params_each=[1, 4])
        params = (jnp.zeros(2), jnp.ones(3))
        with pytest.raises(ValueError, match="boundary"):
            opt.init(params, ("matrix", "matrix"))


class TestShampoo:
    def test_decreases_quadratic_loss(self):
        opt = tcnn.create_optimizer({"otype": "Shampoo",
                                     "learning_rate": 0.05})
        key = jax.random.key(0)
        A = jax.random.normal(key, (8, 8)) * 0.3 + jnp.eye(8)
        params = {"w": jax.random.normal(jax.random.key(1), (8, 8))}
        layout = {"w": "matrix"}
        state = opt.init(params, layout)

        def loss(p):
            return jnp.sum((A @ p["w"] - jnp.eye(8)) ** 2)

        l0 = float(loss(params))
        for _ in range(60):
            g = jax.grad(loss)(params)
            state, params = opt.step(state, g, params)
        assert float(loss(params)) < 0.5 * l0

    def test_non_matrix_gets_momentum_update(self):
        opt = tcnn.create_optimizer({"otype": "Shampoo",
                                     "learning_rate": 0.1})
        params = {"grid": jnp.asarray([1.0, 2.0])}
        state = opt.init(params, {"grid": "other"})
        _, p2 = opt.step(state, {"grid": jnp.asarray([1.0, 1.0])}, params)
        assert float(p2["grid"][0]) < 1.0


class TestFactory:
    def test_nested_json(self):
        opt = tcnn.create_optimizer({
            "otype": "ExponentialDecay", "decay_base": 0.33,
            "nested": {"otype": "EMA", "decay": 0.9,
                       "nested": {"otype": "Adam", "learning_rate": 2e-3}}})
        assert isinstance(opt, tcnn.ExponentialDecay)
        assert isinstance(opt.nested(0), tcnn.EMA)
        assert isinstance(opt.nested(0).nested(0), tcnn.Adam)
        assert opt.nested(0).nested(0).lr == 2e-3

    def test_default_is_adam(self):
        assert isinstance(tcnn.create_optimizer({}), tcnn.Adam)


class TestRuntimeHyperparams:
    """Every reference optimizer supports update_hyperparams with the
    same keys it takes at construction (sgd.h:116-124, novograd.h:187,
    shampoo.h, ema.h, average.h, batched.h, lookahead.h,
    exponential_decay.h:92-110)."""

    def test_scalar_optimizers(self):
        for cfg, key, attr in [
            ({"otype": "SGD"}, "learning_rate", "lr"),
            ({"otype": "Novograd"}, "beta1", "beta1"),
            ({"otype": "Shampoo"}, "beta_shampoo", "beta_shampoo"),
        ]:
            opt = tcnn.create_optimizer(cfg)
            opt.update_hyperparams({key: 0.123})
            assert getattr(opt, attr) == 0.123
        opt = tcnn.create_optimizer({"otype": "Shampoo"})
        opt.update_hyperparams({"cg_on_momentum": False})
        assert opt.cg_on_momentum is False

    def test_wrappers_and_nested_forwarding(self):
        opt = tcnn.create_optimizer({
            "otype": "ExponentialDecay", "decay_base": 0.5,
            "nested": {"otype": "EMA", "decay": 0.9,
                       "nested": {"otype": "Adam", "learning_rate": 1.0}}})
        opt.update_hyperparams({
            "decay_base": 0.25,
            "nested": {"decay": 0.95,
                       "nested": {"learning_rate": 0.5}}})
        assert opt.decay_base == 0.25
        assert opt.nested(0).decay == 0.95
        assert opt.nested(0).nested(0).lr == 0.5
        for otype, key, attr, val in [
            ("Batched", "batch_size_multiplier", "multiplier", 4),
            ("Lookahead", "alpha", "alpha", 0.75),
            ("Average", "n_samples", "n_samples", 3),
        ]:
            o = tcnn.create_optimizer(
                {"otype": otype, "nested": {"otype": "SGD"}})
            o.update_hyperparams({key: val})
            assert getattr(o, attr) == val

    def test_unknown_key_still_raises(self):
        opt = tcnn.create_optimizer({"otype": "SGD"})
        with pytest.raises(NotImplementedError, match="bogus"):
            opt.update_hyperparams({"bogus": 1})

    def test_average_window_follows_state(self):
        """Existing states keep their ring size after an n_samples
        update; new states use the new size (reference reallocates,
        average.h:112-120)."""
        opt = tcnn.Average(tcnn.SGD(learning_rate=0.0, l2_reg=0.0),
                           n_samples=2)
        params = {"w": jnp.asarray([0.0])}
        state = opt.init(params, {"w": "matrix"})
        opt.update_hyperparams({"n_samples": 8})
        g = {"w": jnp.asarray([0.0])}
        st = state
        for _ in range(5):
            st, params = opt.step(st, g, params)
        # old state: window of 2 still
        assert tcnn.Average._window(st) == 2
        st_new = opt.init(params, {"w": "matrix"})
        assert tcnn.Average._window(st_new) == 8

    def test_ema_full_precision_flag(self):
        opt = tcnn.create_optimizer({
            "otype": "EMA", "decay": 0.5, "full_precision": True,
            "nested": {"otype": "SGD"}})
        assert opt.full_precision is True
        assert opt.hyperparams()["full_precision"] is True
