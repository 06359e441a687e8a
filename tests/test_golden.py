"""Golden-convergence artifact gate.

benchmarks/golden.py (run on real hardware) commits a PSNR trajectory
for the reference's albert.jpg image-fit at steps 10/100/1000
(README.md:69-79's comparison points).  This test pins the committed
artifact to reference-comparable thresholds so a convergence regression
cannot land silently — CI validates the artifact; hardware runs refresh
it.
"""

import json
import os

import pytest

_ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                         "golden_image_fit.json")

# Regression pins for the config_hash 1000-step albert.jpg fit.  The
# 1000-step bar is reference-comparable (instant-ngp-class quality;
# both rounds measured ~34 dB here); the 10/100-step bars pin the
# measured early trajectory so optimizer/encoding regressions surface.
_THRESHOLDS = {"10": 1.5, "100": 25.0, "1000": 31.0}


@pytest.mark.skipif(not os.path.exists(_ARTIFACT),
                    reason="golden artifact not generated yet "
                           "(run benchmarks/golden.py on hardware)")
def test_golden_psnr_trajectory():
    with open(_ARTIFACT) as f:
        data = json.load(f)
    assert data["image"] == "albert.jpg", (
        "golden artifact must be produced against the reference image")
    psnr = data["psnr_db"]
    for step, bar in _THRESHOLDS.items():
        assert float(psnr[step]) >= bar, (
            f"PSNR@{step} = {psnr[step]} dB below the {bar} dB bar")
    # Monotone improvement across the reference's comparison points.
    assert psnr["10"] < psnr["100"] < psnr["1000"]
