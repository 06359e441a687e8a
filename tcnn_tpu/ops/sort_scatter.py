"""Sort + segment-sum deterministic scatter-add — design candidate (b).

The round-2 verdict asked for at least two implemented-and-measured
vectorized alternatives to the serial grid scatter (reference spec:
kernel_grid_backward's atomicAdd scatter, grid.h:214-320).  Candidate
(a), the MXU one-hot matmul (`pallas/grid_matmul.py`), won the
shoot-out and is the production default; THIS module is candidate (b),
kept runnable end-to-end so the comparison stays reproducible
(`TCNN_TPU_SCATTER=sortseg`, measured by
`benchmarks/microbench_r3.py bwd` with the ``*_sortseg`` variants; see
ROOFLINE.md for the analysis and numbers).

All XLA ops: sort the updates by destination row, segment-sum runs by
cumulative-sum differencing at segment ends, then ONE scatter of at
most n_rows per-row totals.  Deterministic by construction (a fixed
sort order fixes the f32 accumulation order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_segment_scatter(idx: jax.Array, vals: jax.Array,
                         n_rows: int) -> jax.Array:
    """Scatter-add ``vals`` (M, F) into rows ``idx`` (M,) of a zero
    (n_rows, F) table, deterministically, via sort + segment sums.

    The cumsum runs over the full sorted stream; per-segment totals are
    differences of the cumsum at consecutive segment ends, so only ONE
    O(M) scan and one ≤n_rows scatter are needed (no per-segment loop).
    """
    order = jnp.argsort(idx)
    si = jnp.take(idx, order)
    sv = jnp.take(vals, order, axis=0)
    cs = jnp.cumsum(sv.astype(jnp.float32), axis=0)
    is_last = jnp.concatenate([si[1:] != si[:-1],
                               jnp.ones((1,), bool)])
    # Segment ends in increasing position; ≤ n_rows distinct rows, so
    # padding with the final position yields zero diffs (exact).
    end_pos = jnp.nonzero(is_last, size=n_rows,
                          fill_value=si.shape[0] - 1)[0]
    ends = jnp.take(cs, end_pos, axis=0)
    rows = jnp.take(si, end_pos)
    totals = jnp.concatenate([ends[:1], ends[1:] - ends[:-1]], axis=0)
    out = jnp.zeros((n_rows, vals.shape[1]), jnp.float32)
    return out.at[rows].add(totals, indices_are_sorted=False,
                            unique_indices=False)
