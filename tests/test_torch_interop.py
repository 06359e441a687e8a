"""Torch-bindings parity tests (replacing bindings/torch tests:
gradient flow, double backward, context semantics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import tcnn_tpu as tcnn
from tcnn_tpu.bindings.torch_interop import (Encoding, Network,
                                             NetworkWithInputEncoding)

ENC_CFG = {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
           "log2_hashmap_size": 9, "base_resolution": 4,
           "per_level_scale": 1.5, "interpolation": "Smoothstep"}
NET_CFG = {"otype": "MLP", "n_neurons": 16, "n_hidden_layers": 2,
           "activation": "ReLU", "output_activation": "None"}


class TestForward:
    def test_network_with_input_encoding(self):
        m = NetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG)
        x = torch.rand(64, 2)
        y = m(x)
        assert y.shape == (64, 3)
        assert y.dtype == torch.float32

    def test_matches_jax_path(self):
        m = NetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG)
        x = torch.rand(32, 2)
        y_torch = m(x).detach().numpy()
        # Rebuild the same params pytree in JAX and compare.
        flat = jnp.asarray(m.params.detach().numpy())
        y_jax = np.asarray(m.native._fwd(flat, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(y_torch, y_jax, rtol=1e-5, atol=1e-6)

    def test_encoding_only(self):
        m = Encoding(2, {"otype": "Frequency", "n_frequencies": 4})
        x = torch.rand(16, 2)
        assert m(x).shape == (16, 16)

    def test_network_only(self):
        m = Network(8, 4, NET_CFG)
        x = torch.rand(16, 8)
        assert m(x).shape == (16, 4)

    def test_wrong_width_raises(self):
        m = Network(8, 4, NET_CFG)
        with pytest.raises(ValueError, match="input dims"):
            m(torch.rand(16, 5))


class TestBackward:
    def test_param_and_input_grads(self):
        m = NetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG)
        x = torch.rand(64, 2, requires_grad=True)
        y = m(x)
        loss = (y ** 2).sum()
        loss.backward()
        assert m.params.grad is not None
        assert torch.isfinite(m.params.grad).all()
        assert x.grad is not None

    def test_grads_match_jax(self):
        m = NetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG)
        x_np = np.random.RandomState(0).rand(32, 2).astype(np.float32)
        x = torch.tensor(x_np, requires_grad=True)
        (m(x) ** 2).sum().backward()

        flat = jnp.asarray(m.params.detach().numpy())
        gp, gx = jax.grad(
            lambda p, xx: jnp.sum(m.native._fwd(p, xx) ** 2),
            argnums=(0, 1))(flat, jnp.asarray(x_np))
        np.testing.assert_allclose(m.params.grad.numpy(), np.asarray(gp),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(x.grad.numpy(), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5)

    def test_training_with_torch_optimizer(self):
        m = NetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG)
        opt = torch.optim.Adam(m.parameters(), lr=1e-2)
        x = torch.rand(256, 2)
        t = torch.rand(256, 3)
        losses = []
        for _ in range(30):
            opt.zero_grad()
            loss = ((m(x) - t) ** 2).mean()
            loss.backward()
            opt.step()
            losses.append(float(loss))
        assert losses[-1] < 0.5 * losses[0]


class TestDoubleBackward:
    def test_grad_of_input_grad(self):
        """Eikonal-style use: loss on dL/dx needs double backward
        through the grid (the fork's main extension use-case,
        scripts/test_grid_bwdbwd.py)."""
        m = NetworkWithInputEncoding(2, 1, ENC_CFG, NET_CFG)
        x = torch.rand(16, 2, requires_grad=True)
        y = m(x)
        (dydx,) = torch.autograd.grad(y.sum(), x, create_graph=True)
        eikonal = ((dydx.norm(dim=-1) - 1.0) ** 2).mean()
        eikonal.backward()
        assert m.params.grad is not None
        assert torch.isfinite(m.params.grad).all()
        assert torch.isfinite(x.grad).all()

    def test_gradgradcheck_small(self):
        enc = Encoding(2, {"otype": "OneBlob", "n_bins": 4})
        x = torch.rand(4, 2, dtype=torch.float32) * 0.6 + 0.2
        x.requires_grad_(True)
        # float32 gradcheck needs loose tolerances.
        assert torch.autograd.gradcheck(
            lambda xx: enc(xx), (x,), eps=1e-3, atol=1e-2, rtol=1e-2,
            nondet_tol=0.0)


class TestModuleProtocol:
    """Reference module niceties: pickling (modules.py:194-206), seed,
    Encoding dtype (modules.py:311-326), batch-granularity padding
    (modules.py:181-192)."""

    def test_pickle_roundtrip(self):
        import io
        import pickle

        m = NetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG)
        x = torch.rand(32, 2)
        with torch.no_grad():
            m.params += 0.01  # move off the init so state matters
        y0 = m(x).detach().numpy()
        m2 = pickle.loads(pickle.dumps(m))
        np.testing.assert_allclose(m2(x).detach().numpy(), y0,
                                   rtol=1e-6, atol=1e-7)
        # torch.save/load of the whole module goes through pickle too
        buf = io.BytesIO()
        torch.save(m, buf)
        buf.seek(0)
        m3 = torch.load(buf, weights_only=False)
        np.testing.assert_allclose(m3(x).detach().numpy(), y0,
                                   rtol=1e-6, atol=1e-7)
        # grads still flow after reconstruction
        m3(x).sum().backward()
        assert m3.params.grad is not None

    def test_pickle_encoding_and_network(self):
        import pickle

        for m in (Encoding(2, {"otype": "Frequency", "n_frequencies": 4}),
                  Network(8, 4, NET_CFG)):
            x = torch.rand(16, m.n_input_dims)
            y0 = m(x).detach().numpy()
            m2 = pickle.loads(pickle.dumps(m))
            np.testing.assert_allclose(m2(x).detach().numpy(), y0,
                                       rtol=1e-6, atol=1e-7)

    def test_seed_changes_init(self):
        a = Network(8, 4, NET_CFG, seed=1)
        b = Network(8, 4, NET_CFG, seed=2)
        assert not torch.equal(a.params, b.params)
        c = Network(8, 4, NET_CFG, seed=1)
        assert torch.equal(a.params, c.params)

    def test_encoding_dtype_half(self):
        m = Encoding(2, {"otype": "Frequency", "n_frequencies": 4},
                     dtype=torch.float16)
        y = m(torch.rand(16, 2))
        assert y.dtype == torch.float16
        with pytest.raises(ValueError, match="fp32 or fp16"):
            Encoding(2, {"otype": "Frequency", "n_frequencies": 4},
                     dtype=torch.int32)

    def test_odd_batch_sizes(self):
        """Any batch size works; sizes in the same granularity bucket
        share one jit executable (reference pads to 256)."""
        m = NetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG)
        for b in (1, 7, 255, 300):
            x = torch.rand(b, 2, requires_grad=True)
            y = m(x)
            assert y.shape == (b, 3)
            y.sum().backward()
            assert x.grad.shape == (b, 2)
            assert torch.isfinite(x.grad).all()
