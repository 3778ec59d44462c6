"""Distributed 2-D skyline (Pareto frontier) — the multi-criteria
top-set operator (best users by spend AND activity, best documents by
quality AND length, ...).

Dominance is the SQL NOT EXISTS rule: a row is dominated iff some row
is >= in both dimensions and > in at least one; duplicate points do not
dominate each other, so exact duplicates of a frontier point all
survive.

Classic two-phase distributed skyline: the local skyline of any block
is a SUPERSET of the global skyline's members in that block (a
dominating row in another block would also dominate locally if present
— dominance is transitive and block-independent), so phase 1 prunes
each block to its local frontier in one vectorized pass and phase 2
re-runs the identical kernel over the union of the candidates. The
merge input is Σ per-block frontier sizes — for random data the
expected frontier of an n-row block is O(log n), so the merge side is
tiny; the documented worst case (every block already sorted
anti-correlated) degrades the MERGE input to O(rows), not the answer.

Kernel: sort by (x desc, y desc); within an equal-x group the max y is
the first row; a row survives iff its y equals its group max AND that
max strictly exceeds the running y-max of all strictly-greater-x
groups. One sort + two vectorized scans, no Python row loop."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _skyline_block(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    if t.num_rows == 0:
        return t
    order = pc.sort_indices(t, sort_keys=[(x_col, "descending"),
                                          (y_col, "descending")])
    srt = t.take(order)
    x = srt.column(x_col).to_numpy(zero_copy_only=False)
    y = srt.column(y_col).to_numpy(zero_copy_only=False)
    n = len(x)
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = x[1:] != x[:-1]
    grp_id = np.cumsum(new_grp) - 1
    starts = np.flatnonzero(new_grp)
    grp_max = y[starts]                      # y desc within group
    # The max-x group's frontier point is kept unconditionally (nothing
    # has greater x, so nothing can dominate it) — no running-max
    # sentinel, which would be dtype-dependent (iinfo(...).min is 0 for
    # unsigned, undefined for bool) and wrongly drop a y==sentinel point.
    strict = np.ones(len(starts), dtype=bool)
    if len(starts) > 1:
        strict[1:] = grp_max[1:] > np.maximum.accumulate(grp_max[:-1])
    keep = (y == grp_max[grp_id]) & strict[grp_id]
    return srt.filter(pa.array(keep))


def pareto_front_2d(ds: Dataset, *, x_col: str, y_col: str) -> Dataset:
    """Non-dominated rows of ``ds`` under maximize-(x_col, y_col),
    all other columns carried through."""
    local = ds.map_batches(lambda t: _skyline_block(t, x_col, y_col),
                           batch_format="pyarrow")
    return local.repartition(1).map_batches(
        lambda t: _skyline_block(t, x_col, y_col), batch_format="pyarrow")
