"""Native C++ data-loader tests (builds with g++ on first use)."""

import numpy as np
import pytest

from tcnn_tpu.utils.image import ImageSampler, synthetic_image
from tcnn_tpu.utils.native_loader import (NativeImageSampler,
                                          PrefetchingSampler,
                                          native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def img():
    return synthetic_image(64, 48)


class TestNativeSampler:
    def test_deterministic_across_calls(self, img):
        s = NativeImageSampler(img)
        xy1, v1 = s.sample(10000, seed=42)
        xy2, v2 = s.sample(10000, seed=42)
        np.testing.assert_array_equal(xy1, xy2)
        np.testing.assert_array_equal(v1, v2)

    def test_deterministic_across_thread_counts(self, img):
        s1 = NativeImageSampler(img, n_threads=1)
        s8 = NativeImageSampler(img, n_threads=8)
        xy1, v1 = s1.sample(50000, seed=7)
        xy8, v8 = s8.sample(50000, seed=7)
        np.testing.assert_array_equal(xy1, xy8)
        np.testing.assert_array_equal(v1, v8)

    def test_matches_jax_bilinear_sampler(self, img):
        """The C++ bilinear fetch must agree with the on-device jitted
        sampler (utils/image.py) — same texel-center convention."""
        native = NativeImageSampler(img)
        device = ImageSampler(img)
        xy, v_native = native.sample(4096, seed=3)
        v_jax = np.asarray(device.sample_at(xy))
        np.testing.assert_allclose(v_native, v_jax, atol=2e-6)

    def test_full_grid_recovers_image(self, img):
        s = NativeImageSampler(img)
        xy, val = s.full_grid()
        np.testing.assert_allclose(
            val.reshape(img.shape), img, atol=1e-6)

    def test_uv_in_unit_square(self, img):
        s = NativeImageSampler(img)
        xy, _ = s.sample(100000, seed=0)
        assert xy.min() >= 0.0 and xy.max() < 1.0


class TestPrefetch:
    def test_stream_of_batches(self, img):
        s = NativeImageSampler(img)
        pf = PrefetchingSampler(s, batch_size=1024, seed=5, depth=2)
        try:
            batches = [next(pf) for _ in range(5)]
            for xy, val in batches:
                assert xy.shape == (1024, 2)
                assert val.shape == (1024, 3)
            # successive batches differ
            assert not np.array_equal(batches[0][0], batches[1][0])
        finally:
            pf.close()
