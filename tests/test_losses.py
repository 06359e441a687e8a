"""Loss tests — values and the reference's (deliberately non-autodiff)
gradient semantics (losses/*.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tcnn


def data(b=8, d=3, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    pred = jax.random.uniform(k1, (b, d), minval=0.1, maxval=1.0)
    target = jax.random.uniform(k2, (b, d), minval=0.1, maxval=1.0)
    pdf = jax.random.uniform(k3, (b, d), minval=0.5, maxval=2.0)
    return pred, target, pdf


def grad_of(loss, pred, target, pdf=None):
    return jax.grad(lambda p: loss(p, target, pdf))(pred)


class TestValues:
    def test_l2(self):
        pred, target, pdf = data()
        n = pred.size
        v = tcnn.L2Loss().values(pred, target, pdf)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray((pred - target) ** 2 / pdf / n),
            rtol=1e-6)

    def test_l1(self):
        pred, target, _ = data()
        v = tcnn.L1Loss()(pred, target)
        np.testing.assert_allclose(
            float(v), float(jnp.mean(jnp.abs(pred - target))), rtol=1e-6)

    def test_relative_l2(self):
        pred, target, _ = data()
        n = pred.size
        v = tcnn.RelativeL2Loss().values(pred, target)
        expect = (pred - target) ** 2 / (pred ** 2 + 0.01) / n
        np.testing.assert_allclose(np.asarray(v), np.asarray(expect),
                                   rtol=1e-6)

    def test_mape_smape(self):
        pred, target, _ = data()
        n = pred.size
        v = tcnn.MapeLoss().values(pred, target)
        expect = jnp.abs(pred - target) / (jnp.abs(target) + 1e-2) / n
        np.testing.assert_allclose(np.asarray(v), np.asarray(expect), rtol=1e-6)
        v = tcnn.SmapeLoss().values(pred, target)
        expect = jnp.abs(pred - target) / (
            0.5 * (jnp.abs(pred) + jnp.abs(target)) + 1e-2) / n
        np.testing.assert_allclose(np.asarray(v), np.asarray(expect), rtol=1e-6)

    def test_cross_entropy(self):
        pred, target, pdf = data()
        n = pred.size
        v = tcnn.CrossEntropyLoss().values(pred, target, pdf)
        expect = -target * jnp.log(pred) / pdf / n
        np.testing.assert_allclose(np.asarray(v), np.asarray(expect), rtol=1e-5)

    def test_variance(self):
        pred, target, pdf = data()
        n = pred.size
        v = tcnn.VarianceLoss().values(pred, target, pdf)
        factor = target * target / pdf / n
        expect = factor / pred - factor / pdf
        np.testing.assert_allclose(np.asarray(v), np.asarray(expect), rtol=1e-5)

    def test_luminance(self):
        pred, target, _ = data(d=3)
        n = pred.size
        v = tcnn.RelativeL2LuminanceLoss().values(pred, target)
        lum = 0.299 * pred[:, 0] + 0.587 * pred[:, 1] + 0.114 * pred[:, 2]
        expect = (pred - target) ** 2 / (lum[:, None] ** 2 + 0.01) / n
        np.testing.assert_allclose(np.asarray(v), np.asarray(expect), rtol=1e-5)


class TestGradientSemantics:
    """The reference treats relative-loss normalizers as constants in
    the gradient (e.g. relative_l2.h:74); stop_gradient must reproduce
    that exactly."""

    def test_l2_grad(self):
        pred, target, pdf = data()
        n = pred.size
        g = grad_of(tcnn.L2Loss(), pred, target, pdf)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(2 * (pred - target) / pdf / n), rtol=1e-5)

    def test_relative_l2_grad_ignores_normalizer(self):
        pred, target, _ = data()
        n = pred.size
        g = grad_of(tcnn.RelativeL2Loss(), pred, target)
        expect = 2 * (pred - target) / (pred ** 2 + 0.01) / n
        np.testing.assert_allclose(np.asarray(g), np.asarray(expect), rtol=1e-5)

    def test_relative_l1_grad(self):
        pred, target, _ = data()
        n = pred.size
        g = grad_of(tcnn.RelativeL1Loss(), pred, target)
        expect = jnp.sign(pred - target) / (jnp.abs(pred) + 1e-2) / n
        np.testing.assert_allclose(np.asarray(g), np.asarray(expect), rtol=1e-5)

    def test_smape_grad(self):
        pred, target, _ = data()
        n = pred.size
        g = grad_of(tcnn.SmapeLoss(), pred, target)
        expect = jnp.sign(pred - target) / (
            0.5 * (jnp.abs(pred) + jnp.abs(target)) + 1e-2) / n
        np.testing.assert_allclose(np.asarray(g), np.asarray(expect), rtol=1e-5)

    def test_cross_entropy_grad(self):
        pred, target, pdf = data()
        n = pred.size
        g = grad_of(tcnn.CrossEntropyLoss(), pred, target, pdf)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(-target / pred / pdf / n), rtol=1e-5)

    def test_variance_grad(self):
        pred, target, pdf = data()
        n = pred.size
        g = grad_of(tcnn.VarianceLoss(), pred, target, pdf)
        expect = -(target * target) / pdf / (pred * pred) / n
        np.testing.assert_allclose(np.asarray(g), np.asarray(expect), rtol=1e-5)

    def test_luminance_grad(self):
        pred, target, _ = data(d=3)
        n = pred.size
        g = grad_of(tcnn.RelativeL2LuminanceLoss(), pred, target)
        lum = 0.299 * pred[:, 0] + 0.587 * pred[:, 1] + 0.114 * pred[:, 2]
        expect = 2 * (pred - target) / (lum[:, None] ** 2 + 0.01) / n
        np.testing.assert_allclose(np.asarray(g), np.asarray(expect), rtol=1e-5)

    def test_constant_gradient(self):
        pred, target, _ = data(d=3)
        loss = tcnn.ConstantGradientLoss([0.5, -1.0, 2.0])
        g = grad_of(loss, pred, target)
        np.testing.assert_allclose(
            np.asarray(g),
            np.broadcast_to([0.5, -1.0, 2.0], pred.shape), rtol=1e-6)
        assert abs(float(loss(pred, target))) < 1e-6


class TestFactory:
    def test_all_registered(self):
        for name in ["L2", "RelativeL2", "RelativeL2Luminance", "L1",
                     "RelativeL1", "MAPE", "SMAPE", "CrossEntropy",
                     "Variance"]:
            assert isinstance(tcnn.create_loss({"otype": name}), tcnn.Loss)

    def test_default_is_relative_l2(self):
        # src/loss.cu default.
        assert isinstance(tcnn.create_loss({}), tcnn.RelativeL2Loss)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            tcnn.create_loss({"otype": "nope"})
