"""FusedMLP — the TPU counterpart of FullyFusedMLP.

The reference's FullyFusedMLP (src/fully_fused_mlp.cu) performs the
entire multi-layer forward (or backward) pass in ONE CUDA kernel with
weights staged in registers/shared memory.  The TPU-native equivalent
is a Pallas kernel (ops/pallas/fused_mlp.py) that:

  * pins ALL layer weights in VMEM for the whole grid (they are tiny:
    128×128×bf16 = 32 KB/layer vs ~16 MB VMEM);
  * tiles the batch across grid programs, each running the unrolled
    layer loop on the MXU with fused activations — activations never
    touch HBM between layers (the exact property that makes the CUDA
    kernel fast);
  * uses fp32 MXU accumulation, eliminating the reference's fp16
    loss-scaling machinery.

Like the reference, widths are restricted to {16, 32, 64, 128}
(fully_fused_mlp.cu:893-896); arbitrary widths go to ``MLP``.  The
backward pass is jax.custom_vjp-backed by dedicated Pallas kernels
(forward with stashed activations + fused dgrad/wgrad backward).

When Pallas is unavailable (CPU tests) or disabled, apply() falls back
to the identical-math jnp chain, which is also the ground truth the
kernels are verified against.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...common import Activation, Policy
from ...registry import register_network
from .mlp import MLP


def _pallas_supported() -> bool:
    if os.environ.get("TCNN_TPU_DISABLE_PALLAS"):
        return False
    if os.environ.get("TCNN_TPU_FORCE_FAST_SCATTER"):
        # One switch engages the FULL production kernel path off-TPU
        # (interpret mode) — used by the multichip dry run and the
        # shard_map tests.
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


class FusedMLP(MLP):
    SUPPORTED_WIDTHS = (16, 32, 64, 128)

    def __init__(self, *args, use_pallas: Optional[bool] = None, **kwargs):
        super().__init__(*args, otype="FullyFusedMLP", **kwargs)
        if self.n_neurons not in self.SUPPORTED_WIDTHS:
            raise ValueError(
                f"FullyFusedMLP only supports widths {self.SUPPORTED_WIDTHS} "
                f"(got {self.n_neurons}); use otype=MLP/CutlassMLP for "
                "arbitrary widths")
        self.use_pallas = (_pallas_supported() if use_pallas is None
                           else use_pallas)
        # Explicit use_pallas=True pins the kernel regardless of batch
        # (tests exercise it at small sizes); auto-detection dispatches
        # by batch size below.
        self._explicit_pallas = use_pallas is not None

    # Accepts (D_in, B) feature-major input (the grid encoding's native
    # layout) — the kernel contracts the transposed operand on the MXU.
    accepts_soa_input = True
    # Can emit (D_out, B) feature-major output (the trainer's loss path
    # consumes it at full lane occupancy: a (B, 3) f32 array is
    # (8,128)-tiled with 3 of 128 lanes used, so every elementwise op
    # on it runs at ~2% efficiency — 0.59 ms/step measured for the
    # flagship's loss reduction alone).
    supports_soa_output = True

    # Below this batch the Pallas kernel's fixed costs (launch +
    # pipeline ramp + materializing the input at the kernel boundary,
    # which XLA would otherwise fuse away) outweigh its MXU advantage —
    # the round-2 sweep measured plain XLA ahead for batches < 2^17.
    # Like the reference's network factory picking FullyFused vs
    # Cutlass by arch (src/network.cu:48-74), dispatch by batch size.
    @property
    def PALLAS_MIN_BATCH(self):
        # Read at call time, like every other TCNN_TPU_* knob (so
        # monkeypatched env changes after import take effect).
        return int(os.environ.get("TCNN_TPU_FUSED_MIN_BATCH", 1 << 17))

    def apply(self, params, x, input_soa: bool = False,
              output_soa: bool = False):
        batch = x.shape[1] if input_soa else x.shape[0]
        forced = bool(os.environ.get("TCNN_TPU_FORCE_FAST_SCATTER"))
        if (self.use_pallas and self._n_hidden_layers >= 1
                and (self._explicit_pallas or forced
                     or batch >= self.PALLAS_MIN_BATCH)):
            from ...ops.pallas import fused_mlp as kernels

            try:
                return kernels.fused_mlp_apply(
                    params["layers"], x,
                    activation=self.activation,
                    output_activation=self.output_activation,
                    compute_dtype=self.policy.compute_dtype,
                    output_dtype=self.policy.output_dtype,
                    input_soa=input_soa,
                    output_soa=output_soa,
                )
            except TypeError as e:
                # Forward-mode (jvp/jacfwd) tracer: the kernel's
                # custom_vjp is reverse-only; the identical-math XLA
                # chain below supports jvp to any order.
                if "custom_vjp" not in str(e):
                    raise
        y = super().apply(params, x.T if input_soa else x)
        return y.T if output_soa else y

    def inference(self, params, x, input_soa: bool = False,
                  output_soa: bool = False):
        # Same entry point: the custom_vjp forward already avoids
        # stashing activations unless a gradient is actually pulled
        # (XLA DCEs the residual outputs in inference graphs).
        return self.apply(params, x, input_soa=input_soa,
                          output_soa=output_soa)


# "MegakernelMLP" is the reference's legacy alias for the fully fused
# network (src/network.cu:50 treats the two otypes identically).
register_network(
    ["FullyFusedMLP", "MegakernelMLP"],
    lambda cfg, n_in, n_out, policy=None: FusedMLP(
        n_input_dims=n_in,
        n_output_dims=n_out,
        n_neurons=cfg.get("n_neurons", 128),
        n_hidden_layers=cfg.get("n_hidden_layers", 5),
        activation=Activation.from_string(cfg.get("activation", "ReLU")),
        output_activation=Activation.from_string(
            cfg.get("output_activation", "None")),
        policy=policy,
    ))
