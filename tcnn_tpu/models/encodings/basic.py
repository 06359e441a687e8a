"""Parameter-free coordinate encodings.

TPU-native rebuilds of the reference encodings:
  * Identity        (encodings/identity.h:45-85)
  * Frequency       (encodings/frequency.h:45-103)  — NeRF sin/cos
  * TriangleWave    (encodings/triangle_wave.h:46-109)
  * OneBlob         (encodings/oneblob.h:46-164)    — quartic-kernel CDF
  * SphericalHarmonics (encodings/spherical_harmonics.h, common_device.h:339-629)
  * Empty           (encodings/empty.h:46-90)

All are pure jnp maps; backward passes come from autodiff (the
reference's hand-written backward kernels compute exactly the analytic
derivatives that JAX derives here, e.g. frequency_encoding_backward ≡
d/dx of sin(2^k π x)).  Everything vectorizes over the batch dimension
and fuses into neighbouring ops under jit — no bespoke kernels needed;
these are bandwidth-trivial compared to grid/MLP.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ...common import Policy, ReductionType
from ...module import Encoding
from ...registry import register_encoding


class IdentityEncoding(Encoding):
    """y = x * scale + offset (identity.h:45-85)."""

    def __init__(self, n_dims_to_encode: int, scale: float = 1.0, offset: float = 0.0,
                 policy: Optional[Policy] = None):
        super().__init__(policy)
        self.n_input_dims = n_dims_to_encode
        self.n_output_dims = n_dims_to_encode
        self.scale = float(scale)
        self.offset = float(offset)

    def init(self, key):
        return {}

    def apply(self, params, x):
        del params
        return x * self.scale + self.offset

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "Identity", "scale": self.scale, "offset": self.offset}


class FrequencyEncoding(Encoding):
    """NeRF positional encoding (frequency.h:45-103).

    Per input dim d and frequency k ∈ [0, n_frequencies):
        out[d, 2k]   = sin(2^k π x_d)
        out[d, 2k+1] = sin(2^k π x_d + π/2) = cos(2^k π x_d)
    laid out dim-major exactly like the reference
    (j = d * 2F + 2k + is_cos).
    """

    def __init__(self, n_frequencies: int, n_dims_to_encode: int,
                 policy: Optional[Policy] = None):
        super().__init__(policy)
        self.n_frequencies = int(n_frequencies)
        self.n_input_dims = n_dims_to_encode
        self.n_output_dims = n_dims_to_encode * self.n_frequencies * 2

    def init(self, key):
        return {}

    def apply(self, params, x):
        del params
        # (B, D) -> (B, D, F)
        freqs = jnp.asarray([2.0 ** k for k in range(self.n_frequencies)], x.dtype)
        phase = x[..., :, None] * freqs * math.pi  # (B, D, F)
        sin = jnp.sin(phase)
        cos = jnp.cos(phase)
        out = jnp.stack([sin, cos], axis=-1)  # (B, D, F, 2)
        return out.reshape(x.shape[0], self.n_output_dims)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "Frequency", "n_frequencies": self.n_frequencies}


class TriangleWaveEncoding(Encoding):
    """Triangle-wave encoding (triangle_wave.h:46-109; NRC paper).

    Per dim d, frequency k: v = x_d·2^(k-1) + k/4 (phase shift to
    disambiguate locations); out = |frac(v) - 0.5|·4 - 1.
    """

    def __init__(self, n_frequencies: int, n_dims_to_encode: int,
                 policy: Optional[Policy] = None):
        super().__init__(policy)
        self.n_frequencies = int(n_frequencies)
        self.n_input_dims = n_dims_to_encode
        self.n_output_dims = n_dims_to_encode * self.n_frequencies

    def init(self, key):
        return {}

    def apply(self, params, x):
        del params
        ks = jnp.arange(self.n_frequencies, dtype=x.dtype)
        scaled = x[..., :, None] * (2.0 ** (ks - 1.0))  # (B, D, F)
        val = scaled + ks * 0.25
        frac = val - jnp.floor(val)
        out = jnp.abs(frac - 0.5) * 4.0 - 1.0
        return out.reshape(x.shape[0], self.n_output_dims)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "TriangleWave", "n_frequencies": self.n_frequencies}


def _quartic_cdf(x, inv_radius: float):
    """CDF of the quartic kernel (common_device.h:915-920)."""
    u = x * inv_radius
    u2 = u * u
    u4 = u2 * u2
    return jnp.clip((15.0 / 16.0) * u * (1 - (2.0 / 3.0) * u2 + (1.0 / 5.0) * u4) + 0.5,
                    0.0, 1.0)


class OneBlobEncoding(Encoding):
    """OneBlob encoding with wraparound (oneblob.h:98-127).

    out[d, k] = C((k+1)/n - x_d) - C(k/n - x_d) where
    C(t) = Q(t) + Q(t-1) + Q(t+1) and Q is the quartic-kernel CDF with
    inverse radius n_bins.  The three-term sum implements the
    wraparound of the subwarp-aligned CUDA kernel.
    """

    def __init__(self, n_bins: int, n_dims_to_encode: int,
                 policy: Optional[Policy] = None):
        super().__init__(policy)
        self.n_bins = int(n_bins)
        self.n_input_dims = n_dims_to_encode
        self.n_output_dims = n_dims_to_encode * self.n_bins

    def init(self, key):
        return {}

    def apply(self, params, x):
        del params
        n = self.n_bins
        boundaries = jnp.arange(n + 1, dtype=x.dtype) / n  # (n+1,)
        t = boundaries - x[..., :, None]  # (B, D, n+1)
        cdf = _quartic_cdf(t, n) + _quartic_cdf(t - 1.0, n) + _quartic_cdf(t + 1.0, n)
        out = cdf[..., 1:] - cdf[..., :-1]  # (B, D, n)
        return out.reshape(x.shape[0], self.n_output_dims)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "OneBlob", "n_bins": self.n_bins}


def _double_factorial(n: int) -> float:
    r = 1.0
    while n > 1:
        r *= n
        n -= 2
    return r


class SphericalHarmonicsEncoding(Encoding):
    """Real spherical harmonics of a direction vector
    (spherical_harmonics.h:63-98; polynomials in common_device.h:339-418).

    Input is 3-D in [0,1]^3, remapped to [-1,1]^3 (v = 2u - 1).  Output
    is degree^2 coefficients, indexed i = l(l+1)+m, with the
    Condon-Shortley phase included (this reproduces the instant-ngp /
    reference sign convention, e.g. Y_1^{±1} = -0.4886·{y,x}).

    Instead of the reference's sympy-generated polynomial blob
    (scripts/gen_sh.py) we evaluate the associated-Legendre recurrence
    at trace time — degree is static, so XLA sees straight-line code,
    and autodiff supplies the gradient that common_device.h:420-629
    hand-writes.  Values agree with the reference polynomials on the
    unit sphere (the sympy output bakes in |v|=1 identities, so
    off-sphere inputs may differ; SH inputs are directions by contract).
    """

    def __init__(self, degree: int, n_dims_to_encode: int = 3,
                 policy: Optional[Policy] = None):
        super().__init__(policy)
        if n_dims_to_encode != 3:
            raise ValueError("SphericalHarmonics requires 3 input dims")
        if not (1 <= degree <= 8):
            raise ValueError(f"SH degree must be in [1, 8], got {degree}")
        self.degree = int(degree)
        self.n_input_dims = 3
        self.n_output_dims = self.degree ** 2

    def init(self, key):
        return {}

    def apply(self, params, v):
        del params
        x = v[:, 0] * 2.0 - 1.0
        y = v[:, 1] * 2.0 - 1.0
        z = v[:, 2] * 2.0 - 1.0
        L = self.degree
        # A_m = Re((x+iy)^m), B_m = Im((x+iy)^m): sin^m(theta)·{cos,sin}(m phi)
        A = [jnp.ones_like(x)]
        B = [jnp.zeros_like(x)]
        for m in range(1, L):
            a_prev, b_prev = A[m - 1], B[m - 1]
            A.append(x * a_prev - y * b_prev)
            B.append(x * b_prev + y * a_prev)
        # Semi-normalized associated Legendre P̂_l^m = P_l^m / sin^m(theta)
        # (polynomial in z), with Condon-Shortley phase.
        P: Dict[tuple, jax.Array] = {}
        for m in range(0, L):
            pmm = ((-1.0) ** m) * _double_factorial(2 * m - 1)
            P[(m, m)] = jnp.full_like(z, pmm) if m > 0 else jnp.ones_like(z)
            if m + 1 < L:
                P[(m + 1, m)] = z * (2 * m + 1) * P[(m, m)]
            for l in range(m + 2, L):
                P[(l, m)] = ((2 * l - 1) * z * P[(l - 1, m)]
                             - (l + m - 1) * P[(l - 2, m)]) / (l - m)
        outs: List[jax.Array] = [None] * (L * L)  # type: ignore
        for l in range(L):
            for m in range(0, l + 1):
                k = math.sqrt((2 * l + 1) / (4 * math.pi)
                              * math.factorial(l - m) / math.factorial(l + m))
                if m == 0:
                    outs[l * (l + 1)] = k * P[(l, 0)]
                else:
                    sk = math.sqrt(2.0) * k
                    outs[l * (l + 1) + m] = sk * A[m] * P[(l, m)]
                    outs[l * (l + 1) - m] = sk * B[m] * P[(l, m)]
        return jnp.stack(outs, axis=-1)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "SphericalHarmonics", "degree": self.degree}


class EmptyEncoding(Encoding):
    """Consumes inputs, produces nothing (empty.h:46-90).

    Useful inside Composite to mask out dimensions.  Output width is 0;
    padding (if requested via apply_padded) is all-ones like the
    reference.
    """

    def __init__(self, n_dims_to_encode: int, policy: Optional[Policy] = None):
        super().__init__(policy)
        self.n_input_dims = n_dims_to_encode
        self.n_output_dims = 0

    def init(self, key):
        return {}

    def apply(self, params, x):
        del params
        return jnp.zeros((x.shape[0], 0), dtype=x.dtype)

    def hyperparams(self) -> Dict[str, Any]:
        return {"otype": "Empty"}


class CompositeEncoding(Encoding):
    """Applies nested encodings to slices of the input
    (composite.h:135-230).

    Dim assignment follows the reference: each nested config may give
    ``n_dims_to_encode`` (and optionally ``dims_to_encode_begin``); at
    most one may omit it and receives all remaining dims.  Reduction is
    Concatenation (default), Sum, or Product (composite.h:47-133); for
    Sum/Product all nested output widths must match.

    The reference runs nested encodings on separate CUDA side streams
    (SyncedMultiStream); under jit XLA schedules the independent
    subgraphs concurrently on its own, so no analog is needed.
    """

    def __init__(self, nested_cfgs: List[Dict[str, Any]], n_dims_to_encode: int,
                 reduction: str = "Concatenation", policy: Optional[Policy] = None):
        super().__init__(policy)
        from ...config import create_encoding  # circular-safe local import

        self.reduction = ReductionType.from_string(reduction)
        self.n_input_dims = n_dims_to_encode

        total_specified = 0
        any_begin = any("dims_to_encode_begin" in c for c in nested_cfgs)
        for c in nested_cfgs:
            total_specified += int(c.get("n_dims_to_encode", 0))
        unspecified = None if any_begin else n_dims_to_encode - total_specified
        if unspecified is not None and unspecified < 0:
            raise ValueError("Composite: nested encodings encode more dims than available")

        self.nested: List[Encoding] = []
        self.slices: List[tuple] = []  # (begin, n_dims)
        offset = 0
        for c in nested_cfgs:
            if "n_dims_to_encode" in c:
                if "dims_to_encode_begin" in c:
                    offset = int(c["dims_to_encode_begin"])
                nd = int(c["n_dims_to_encode"])
            else:
                if unspecified is None:
                    raise ValueError(
                        "Composite: may only leave 'n_dims_to_encode' unspecified "
                        "for a single nested encoding")
                nd = unspecified
                unspecified = None
            if nd > 0:
                self.nested.append(create_encoding(nd, c, policy=policy))
                self.slices.append((offset, nd))
            offset += nd

        widths = [e.n_output_dims for e in self.nested]
        if self.reduction == ReductionType.CONCATENATION:
            self.n_output_dims = sum(widths)
        else:
            if len(set(widths)) > 1:
                raise ValueError(
                    f"Composite({self.reduction.value}): nested output widths "
                    f"must match, got {widths}")
            self.n_output_dims = widths[0] if widths else 0

    def init(self, key):
        keys = jax.random.split(key, max(len(self.nested), 1))
        return tuple(e.init(k) for e, k in zip(self.nested, keys))

    def param_layout(self, params):
        return tuple(e.param_layout(p) for e, p in zip(self.nested, params))

    def grid_specs(self, prefix: tuple = ()) -> dict:
        out = {}
        for i, e in enumerate(self.nested):
            out.update(e.grid_specs(prefix + (i,)))
        return out

    def apply(self, params, x):
        outs = []
        for enc, p, (begin, nd) in zip(self.nested, params, self.slices):
            outs.append(enc.apply(p, x[:, begin:begin + nd]))
        if self.reduction == ReductionType.CONCATENATION:
            return jnp.concatenate(outs, axis=-1) if outs else jnp.zeros(
                (x.shape[0], 0), dtype=x.dtype)
        acc = outs[0]
        for o in outs[1:]:
            acc = acc + o if self.reduction == ReductionType.SUM else acc * o
        return acc

    def hyperparams(self) -> Dict[str, Any]:
        return {
            "otype": "Composite",
            "reduction": self.reduction.value,
            "nested": [e.hyperparams() for e in self.nested],
        }


def _register():
    register_encoding(
        ["Identity", "Linear"],
        lambda n_dims, cfg, policy=None: IdentityEncoding(
            n_dims, cfg.get("scale", 1.0), cfg.get("offset", 0.0), policy=policy))
    register_encoding(
        ["Frequency", "PositionalEncoding", "NeRFEncoding"],
        lambda n_dims, cfg, policy=None: FrequencyEncoding(
            cfg.get("n_frequencies", 12), n_dims, policy=policy))
    register_encoding(
        "TriangleWave",
        lambda n_dims, cfg, policy=None: TriangleWaveEncoding(
            cfg.get("n_frequencies", 12), n_dims, policy=policy))
    register_encoding(
        "OneBlob",
        lambda n_dims, cfg, policy=None: OneBlobEncoding(
            cfg.get("n_bins", 16), n_dims, policy=policy))
    register_encoding(
        ["SphericalHarmonics", "SH"],
        lambda n_dims, cfg, policy=None: SphericalHarmonicsEncoding(
            cfg.get("degree", 4), n_dims, policy=policy))
    register_encoding(
        ["Empty", "Zero", "None"],
        lambda n_dims, cfg, policy=None: EmptyEncoding(n_dims, policy=policy))
    register_encoding(
        "Composite",
        lambda n_dims, cfg, policy=None: CompositeEncoding(
            cfg["nested"], n_dims, cfg.get("reduction", "Concatenation"),
            policy=policy))
    # NRC / OneBlobFrequency aliases (src/encoding.cu:70-100): composite of
    # TriangleWave (spatial) + OneBlob (appearance) + Identity (rest).
    def _nrc(n_dims, cfg, policy=None):
        return CompositeEncoding(
            [
                {"n_dims_to_encode": 3, "otype": "TriangleWave",
                 "n_frequencies": cfg.get("n_frequencies", 12)},
                {"n_dims_to_encode": 5, "otype": "OneBlob",
                 "n_bins": cfg.get("n_bins", 4)},
                {"otype": "Identity"},
            ],
            n_dims, policy=policy)
    register_encoding(["NRC", "OneBlobFrequency"], _nrc)


_register()
