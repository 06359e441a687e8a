"""Image IO parity with the reference's scripts/common.py: sRGB
conversions, the fp16 .bin interchange format, trim/luminance."""

import numpy as np
import pytest

from tcnn_tpu.utils.image import (linear_to_srgb, read_image,
                                  srgb_to_linear, write_image)
from tcnn_tpu.utils.metrics import luminance, trim


class TestColorSpace:
    def test_roundtrip(self):
        x = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
        np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x,
                                   atol=1e-6)

    def test_known_values(self):
        # Both branches of the piecewise curve (common.py:52-58).
        np.testing.assert_allclose(srgb_to_linear(np.float32(0.04)),
                                   0.04 / 12.92, rtol=1e-6)
        np.testing.assert_allclose(
            srgb_to_linear(np.float32(0.5)),
            ((0.5 + 0.055) / 1.055) ** 2.4, rtol=1e-6)
        np.testing.assert_allclose(linear_to_srgb(np.float32(0.002)),
                                   12.92 * 0.002, rtol=1e-6)


class TestBinFormat:
    def test_roundtrip(self, tmp_path):
        img = np.random.RandomState(0).rand(5, 7, 4).astype(np.float32)
        p = str(tmp_path / "img.bin")
        write_image(p, img)
        back = read_image(p)
        assert back.shape == (5, 7, 4)
        np.testing.assert_allclose(back, img.astype(np.float16), atol=1e-3)

    def test_rgb_padded_to_4(self, tmp_path):
        img = np.random.RandomState(1).rand(4, 4, 3).astype(np.float32)
        p = str(tmp_path / "img.bin")
        write_image(p, img)
        back = read_image(p)
        assert back.shape == (4, 4, 4)
        np.testing.assert_allclose(back[..., 3], 1.0)

    def test_layout_matches_reference(self, tmp_path):
        """(h, w) int32 header then h*w*4 fp16 (common.py:60-67)."""
        import struct

        img = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4) / 24
        p = str(tmp_path / "img.bin")
        write_image(p, img)
        raw = open(p, "rb").read()
        h, w = struct.unpack("ii", raw[:8])
        assert (h, w) == (2, 3)
        vals = np.frombuffer(raw, np.float16, offset=8)
        np.testing.assert_allclose(vals, img.ravel().astype(np.float16))


class TestPngRoundtrip:
    def test_srgb_encode_decode(self, tmp_path):
        pytest.importorskip("PIL")
        img = np.random.RandomState(2).rand(6, 6, 3).astype(np.float32)
        p = str(tmp_path / "img.png")
        write_image(p, img)
        back = read_image(p)
        # 8-bit quantization through the sRGB curve
        np.testing.assert_allclose(back, img, atol=2 / 255.0)


class TestMetricHelpers:
    def test_trim_drops_tails(self):
        e = np.concatenate([np.full(1000, 1.0), [1e9], [-1e9]])
        assert trim(e, skip=0.01) == pytest.approx(1.0)

    def test_luminance_weights(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[..., 1] = 1.0
        np.testing.assert_allclose(luminance(img), 0.7152, rtol=1e-6)
