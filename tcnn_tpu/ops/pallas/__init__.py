"""Pallas TPU kernels (the performance path).

Every kernel here has an identical-math jnp reference implementation
elsewhere in ops/ or models/ that serves as its ground truth in tests.
On CPU (or with TCNN_TPU_PALLAS_INTERPRET=1) kernels run in Pallas
interpreter mode so the full code path is testable without TPU
hardware.
"""

from __future__ import annotations

import os

import jax


def interpret_mode() -> bool:
    if os.environ.get("TCNN_TPU_PALLAS_INTERPRET"):
        return True
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return True
