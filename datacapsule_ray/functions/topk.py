"""Generic distributed per-group top-k (SQL ``row_number() OVER
(PARTITION BY g ORDER BY ...) <= k``) without per-group Python: one
global sort on ``[group] + order_cols``, a vectorized positional take
of each group run's first k rows per block, and a driver-side re-top-k
of the block-edge run PREFIXES (≤2k rows per block — O(blocks·k) even
when a hot key spans many blocks, never O(groups) or O(hot-key rows)).

This is the ``top3_orders_per_customer`` kernel (pipelines/
relational.py) factored out for reuse — per-source document caps, any
"keep N best per key" policy stage of a training-data pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset


def per_group_topk(ds: Dataset, *, group_col: str, order_cols: list[str],
                   descending: list[bool], k: int) -> Dataset:
    """Keep each group's first ``k`` rows under ``ORDER BY order_cols``
    (``descending[i]`` per column; ties must be broken by the last
    order column being unique per group, as in the SQL contract)."""
    srt = ds.sort([group_col] + list(order_cols),
                  descending=[False] + list(descending))

    def block_topk(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("edge", pa.array([], type=pa.bool_()))
        gv = t.column(group_col).to_numpy(zero_copy_only=False)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = gv[1:] != gv[:-1]
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        pos = np.arange(n) - starts[run_id]
        is_edge_run = (run_id == 0) | (run_id == run_id[-1])
        # EVERY run keeps only its first k rows — including edge runs:
        # within the global sort a group's fragments are block-ordered,
        # so its global top-k is a prefix of the fragment concatenation
        # and a row past its own fragment's first k can never qualify
        # (k rows of the same group precede it). Bounds the driver
        # fixup at 2k rows per block even when a hot key spans blocks.
        keep = pos < k
        out = t.take(pa.array(np.flatnonzero(keep)))
        return out.append_column("edge", pa.array(is_edge_run[keep]))

    from ..traverse import drop_empty_blocks, filter_select

    partial = drop_empty_blocks(
        srt.map_batches(block_topk, batch_format="pyarrow"))
    interior = filter_select(partial, "edge", False, drop=["edge"])
    edge_df = partial.filter(expr="edge == True").to_pandas()
    if not len(edge_df):
        return interior
    fixed = (edge_df.drop(columns=["edge"])
             .sort_values([group_col] + list(order_cols),
                          ascending=[True] + [not d for d in descending],
                          kind="stable")
             .groupby(group_col, group_keys=False).head(k))
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(fixed.reset_index(drop=True),
                             preserve_index=False)))
