"""HashType.Rng — the reference's pcg32 skip-ahead grid hash.

Reference semantics (common_device.h:678-691 ``rng_hash`` +
dependencies/pcg32/pcg32.h): pack the D grid coordinates into a 64-bit
``step`` (coordinate i XORed in at bit offset i·(64/D)), construct
``pcg32(seed)`` (default seed 1337, stream 1), ``advance(step)`` via
the LCG jump-ahead, and return ``next_uint()``.

TPU twist: jax runs with x64 disabled, so there is no uint64 — all
64-bit arithmetic here is emulated with uint32 limb pairs.  The
jump-ahead's per-iteration (cur_mult, cur_plus) sequence depends only
on the increment, never on data, so the 64 pairs are precomputed
exactly in Python; the traced per-element work is 64 select+multiply
steps on (…,)-shaped uint32 arrays.  The final state-to-output
transform is pcg32's xorshift-rotate.

This hash is exact to the reference bit-for-bit (see
tests/test_grid.py::TestRngHash against the pure-Python model).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PCG32_MULT = 0x5851F42D4C957F2D
_M64 = (1 << 64) - 1

_U = jnp.uint32


def _u32c(v: int):
    return jnp.uint32(v & 0xFFFFFFFF)


# -- exact host-side pcg32 model (also the test oracle) ---------------------

def pcg32_state_after_seed(initstate: int, initseq: int = 1) -> Tuple[int, int]:
    """(state, inc) after pcg32::seed (pcg32.h:53-59)."""
    inc = ((initseq << 1) | 1) & _M64
    state = inc  # next_uint() from state 0: state = 0·MULT + inc
    state = (state + initstate) & _M64
    state = (state * PCG32_MULT + inc) & _M64
    return state, inc


def pcg32_output(state: int) -> int:
    """next_uint()'s output function of the pre-bump state (pcg32.h:62-68)."""
    xorshifted = (((state >> 18) ^ state) >> 27) & 0xFFFFFFFF
    rot = state >> 59
    return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF


def pcg32_advanced_state(state: int, inc: int, delta: int) -> int:
    """state after advance(delta) (pcg32.h:145-166)."""
    cur_mult, cur_plus = PCG32_MULT, inc
    acc_mult, acc_plus = 1, 0
    delta &= _M64
    while delta > 0:
        if delta & 1:
            acc_mult = (acc_mult * cur_mult) & _M64
            acc_plus = (acc_plus * cur_mult + cur_plus) & _M64
        cur_plus = ((cur_mult + 1) * cur_plus) & _M64
        cur_mult = (cur_mult * cur_mult) & _M64
        delta >>= 1
    return (acc_mult * state + acc_plus) & _M64


def rng_hash_host(pos_grid: Sequence[int], seed: int = 1337) -> int:
    """Pure-Python reference of the whole rng_hash (the test oracle)."""
    d = len(pos_grid)
    nbits = 64 // d
    step = 0
    for i, p in enumerate(pos_grid):
        step ^= (int(p) & 0xFFFFFFFF) << (i * nbits)
    state, inc = pcg32_state_after_seed(seed)
    return pcg32_output(pcg32_advanced_state(state, inc, step))


@functools.lru_cache(maxsize=None)
def _advance_constants(inc: int) -> Tuple[Tuple[int, int], ...]:
    """The 64 (cur_mult, cur_plus) pairs of the jump-ahead loop."""
    out = []
    cur_mult, cur_plus = PCG32_MULT, inc
    for _ in range(64):
        out.append((cur_mult, cur_plus))
        cur_plus = ((cur_mult + 1) * cur_plus) & _M64
        cur_mult = (cur_mult * cur_mult) & _M64
    return tuple(out)


# -- uint32 limb-pair arithmetic (traced) -----------------------------------

def _mul32_wide(a, b):
    """Full 64-bit product of two u32 arrays as (lo, hi) u32."""
    a0 = a & _U(0xFFFF)
    a1 = a >> _U(16)
    b0 = b & _U(0xFFFF)
    b1 = b >> _U(16)
    lo = a * b
    m1 = a0 * b1
    m2 = a1 * b0
    mid = (a0 * b0 >> _U(16)) + (m1 & _U(0xFFFF)) + (m2 & _U(0xFFFF))
    hi = a1 * b1 + (m1 >> _U(16)) + (m2 >> _U(16)) + (mid >> _U(16))
    return lo, hi


def _mul64_const(al, ah, c: int):
    """(al, ah) · c mod 2^64 with a Python-int constant c."""
    cl, ch = _u32c(c), _u32c(c >> 32)
    lo, hi = _mul32_wide(al, cl)
    return lo, hi + al * ch + ah * cl


def _add64(al, ah, bl, bh):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return lo, ah + bh + carry


def rng_hash(pos_grid: List[jax.Array], seed: int = 1337) -> jax.Array:
    """Vectorized rng_hash over per-dim uint32 coordinate arrays.

    pos_grid: D same-shaped uint32 arrays; returns a uint32 array of
    that shape, bit-exact to the reference's rng_hash.
    """
    d = len(pos_grid)
    nbits = 64 // d
    shape = pos_grid[0].shape
    zeros = jnp.zeros(shape, jnp.uint32)

    # step = XOR_i (u64)pos[i] << (i·nbits), as (lo, hi) limbs.
    step_lo, step_hi = zeros, zeros
    for i, p in enumerate(pos_grid):
        p = p.astype(jnp.uint32)
        sh = i * nbits
        if sh == 0:
            step_lo = step_lo ^ p
        elif sh < 32:
            step_lo = step_lo ^ (p << _U(sh))
            step_hi = step_hi ^ (p >> _U(32 - sh))
        else:
            step_hi = step_hi ^ (p << _U(sh - 32))

    state0, inc = pcg32_state_after_seed(seed)
    consts = _advance_constants(inc)

    am_l, am_h = jnp.ones(shape, jnp.uint32), zeros    # acc_mult = 1
    ap_l, ap_h = zeros, zeros                          # acc_plus = 0
    for j in range(64):
        limb = step_lo if j < 32 else step_hi
        bit = (limb >> _U(j % 32)) & _U(1)
        mask = bit != 0
        cm, cp = consts[j]
        nm_l, nm_h = _mul64_const(am_l, am_h, cm)
        tp_l, tp_h = _mul64_const(ap_l, ap_h, cm)
        np_l, np_h = _add64(tp_l, tp_h, _u32c(cp), _u32c(cp >> 32))
        am_l = jnp.where(mask, nm_l, am_l)
        am_h = jnp.where(mask, nm_h, am_h)
        ap_l = jnp.where(mask, np_l, ap_l)
        ap_h = jnp.where(mask, np_h, ap_h)

    # S = acc_mult·state0 + acc_plus  (the advanced state).
    sm_l, sm_h = _mul64_const(am_l, am_h, state0)
    s_l, s_h = _add64(sm_l, sm_h, ap_l, ap_h)

    # Output function on S: xorshifted = u32(((S>>18)^S)>>27), rot=S>>59.
    t_l = (s_l >> _U(18)) | (s_h << _U(14))
    t_h = s_h >> _U(18)
    x_l = t_l ^ s_l
    x_h = t_h ^ s_h
    xorshifted = (x_l >> _U(27)) | (x_h << _U(5))
    rot = s_h >> _U(27)
    return (xorshifted >> rot) | (xorshifted << ((~rot + _U(1)) & _U(31)))
