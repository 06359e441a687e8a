"""Test configuration.

Tests run on CPU with 8 virtual devices (the standard JAX trick for
exercising multi-chip sharding without a pod — SURVEY.md §4) and with
Pallas kernels in interpreter mode.  Benchmarks (bench.py) run on the
real TPU instead.
"""

import os

# Hard-force CPU: the dev box exposes a real TPU by default, but the
# test suite must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The dev image's sitecustomize force-registers the axon TPU backend and
# sets jax_platforms="axon,cpu"; backends initialize lazily, so we can
# still steer to pure CPU here.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it

jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.devices()
assert len(jax.devices()) >= 8, jax.devices()
