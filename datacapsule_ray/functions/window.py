"""Distributed rolling-window aggregate (SQL ``SUM(v) OVER (PARTITION
BY g ORDER BY ... ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``) — the
streaming-window operator of the training/events family.

One global range-partitioning sort by ``[group] + order_cols``, then a
fully vectorized in-block pass: per-run cumulative sums with window
clamping at run starts (``roll[i] = cs0[i+1] - cs0[max(start, i-w+1)]``,
no Python per row). Only rows whose window can cross a block boundary
ride a raw channel to the driver:

  * HEAD rows — the first ``min(w-1, run_len)`` rows of each block's
    FIRST run (their window may reach into the previous block's
    fragment of the same group);
  * TAIL context — the last ``min(w-1, run_len)`` rows of each block's
    LAST run (the values a following fragment's heads may need).

Driver residency is therefore bounded by ``2·(w-1)`` rows per block —
O(blocks·w), never O(groups) or O(hot-group rows). The driver re-sorts
that mini-table by the same keys; for every head row the true ``w-1``
preceding rows of its group are PRESENT in the mini-table (in-block
predecessors of a head row are heads themselves; cross-block
predecessors are in the previous fragments' tails, chained suffixes
covering any fragment shorter than ``w-1``), so a plain per-group
pandas rolling over it recomputes the exact sums.

Values are aggregated as int64 (callers pass integer cents — the
repo-wide convention that keeps Ray/DuckDB hash-identical; float sums
would differ by association order)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset


def rolling_sum(ds: Dataset, *, group_col: str, order_cols: list[str],
                value_col: str, w: int, id_col: str,
                out_col: str = "roll_sum") -> Dataset:
    """``(id_col, out_col)`` — per-group rolling sum of the current row
    and the ``w-1`` preceding rows under ``ORDER BY order_cols`` (ROWS
    frame; the final order column must make rows unique per group, as
    in the SQL contract). ``value_col`` must be integer-typed."""
    if w < 1:
        raise ValueError("w must be >= 1")
    keys = [group_col] + list(order_cols)
    srt = ds.sort(keys)
    # columns the raw channel carries BESIDES the id (which may itself
    # be an order column — e.g. event_id as the uniqueness tiebreak)
    carry = [c for c in dict.fromkeys([group_col, *order_cols, value_col])
             if c != id_col]

    def block_roll(t: pa.Table) -> pa.Table:
        n = t.num_rows
        base = pa.table({
            id_col: t.column(id_col), out_col: t.column(value_col),
            **{c: t.column(c) for c in carry},
        })
        if n == 0:
            return base.append_column("ch", pa.array([], type=pa.int8()))
        gv = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = gv[1:] != gv[:-1]
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        pos = np.arange(n) - starts[run_id]
        cs0 = np.concatenate(([0], np.cumsum(v.astype(np.int64))))
        lo = np.maximum(starts[run_id], np.arange(n) - w + 1)
        roll = cs0[np.arange(1, n + 1)] - cs0[lo]
        # channels: 0 = exact in-block result (emitted as-is), 1 =
        # head (window may cross into the previous block — driver
        # recomputes), 2 = DUPLICATED context copies of the last run's
        # last w-1 rows (driver-only; their originals still ship on
        # channel 0/1, so nothing is lost).
        ch = np.zeros(n, dtype=np.int8)
        ch[(run_id == 0) & (pos < w - 1)] = 1
        last_run = run_id == run_id[-1]
        tail_idx = np.flatnonzero(last_run & (pos >= pos[-1] - w + 2))
        idx_all = np.concatenate((np.arange(n), tail_idx))
        ch_all = np.concatenate(
            (ch, np.full(len(tail_idx), 2, dtype=np.int8)))
        sub = t.take(pa.array(idx_all))
        out = pa.table({
            id_col: sub.column(id_col),
            out_col: pa.array(
                np.concatenate((roll, roll[tail_idx])), type=pa.int64()),
            **{c: sub.column(c) for c in carry},
        })
        return out.append_column("ch", pa.array(ch_all))

    from ..traverse import drop_empty_blocks, filter_select

    partial = drop_empty_blocks(
        srt.map_batches(block_roll, batch_format="pyarrow"))
    interior = filter_select(partial, "ch", 0,
                             drop=["ch", *carry])
    edge_df = (partial.filter(expr="ch != 0")
               .select_columns([id_col, "ch", *carry]).to_pandas())
    if not len(edge_df):
        return interior
    # dedup rows shipped on both channels (head wins: ch asc keeps 1)
    mini = (edge_df.sort_values([*keys, "ch"], kind="stable")
            .drop_duplicates(subset=[id_col], keep="first"))
    grp = mini.groupby(group_col, group_keys=False, sort=False)
    mini = mini.assign(**{out_col: grp[value_col].apply(
        lambda s: s.rolling(w, min_periods=1).sum()).astype(np.int64)})
    fixed = mini[mini["ch"] == 1][[id_col, out_col]]
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(fixed.reset_index(drop=True),
                             preserve_index=False)))
