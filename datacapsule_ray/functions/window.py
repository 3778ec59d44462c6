"""Distributed rolling-window aggregates — the streaming-window
operators of the training/events family.

Two frame shapes, one boundary protocol:

* ROWS frame (``rolling_agg`` / ``rolling_sum``): SQL ``AGG(v) OVER
  (PARTITION BY g ORDER BY ... ROWS BETWEEN w-1 PRECEDING AND CURRENT
  ROW)`` for AGG in SUM / AVG / MIN / MAX / COUNT.
* RANGE frame (``rolling_range_agg``): SQL ``AGG(v) OVER (PARTITION BY
  g ORDER BY ts RANGE BETWEEN <delta> PRECEDING AND CURRENT ROW)`` for
  AGG in SUM / AVG / COUNT / MIN / MAX / NDISTINCT — the time-window
  shape (rate limits, windowed stats). RANGE's CURRENT ROW bound
  includes ORDER-BY PEERS (rows with equal ts), matching SQL exactly.
  MIN/MAX have no cumsum trick for variable-width windows: they use a
  vectorized sparse-table RMQ (O(n log n) build, two gathers per row);
  NDISTINCT (COUNT(DISTINCT v) OVER RANGE, for low-cardinality
  categorical v) uses chunked per-code prefix sums.

One global range-partitioning sort by ``[group] + order``, then a fully
vectorized in-block pass (per-run cumulative sums with window clamping
at run starts; per-run ``searchsorted`` for the time frame; C-speed
pandas rolling for MIN/MAX). Only rows whose window can cross a block
boundary ride a raw channel to the driver:

  * HEAD rows — rows of each block's FIRST run whose window may reach
    into the previous block's fragment of the same group (first
    ``w-1`` rows for ROWS; rows with ``ts <= first_ts + delta`` for
    RANGE, plus last-run rows with ``ts == last_ts`` whose PEERS may
    continue into the next block);
  * TAIL context — the last run's window-reachable suffix (last
    ``w-1`` rows for ROWS; rows with ``ts >= last_ts - delta`` for
    RANGE), duplicated for the driver only.

Driver residency is bounded by ``2·(w-1)`` rows per block for ROWS
(O(blocks·w)) and by the rows inside one ``delta`` of each block edge
for RANGE (time-bounded — never O(groups) or O(hot-group rows)). The
driver re-sorts that mini-table by the same keys; for every head row
the true preceding window of its group is PRESENT (in-block
predecessors of a head row are heads themselves; cross-block
predecessors are in the previous fragments' tails, chained suffixes
covering any fragment shorter than the window), so one re-run of the
same kernel over the mini-table recomputes the exact aggregates.

Values are aggregated as int64 (callers pass integer cents — the
repo-wide convention that keeps Ray/DuckDB hash-identical; float sums
would differ by association order). AVG divides the exact int64 sum by
the exact count once, matching DuckDB's integer-AVG semantics
bit-for-bit."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from .dedup import _run_change_mask  # the shared sorted-run kernel

_ROWS_AGGS = ("sum", "mean", "min", "max", "count")
_RANGE_AGGS = ("sum", "mean", "count", "min", "max", "ndistinct")


def _runs(gv: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(run_id, run starts, position-in-run) for a group column that is
    contiguous per key (true after the global sort)."""
    n = len(gv)
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = gv[1:] != gv[:-1]
    run_id = np.cumsum(new_run) - 1
    starts = np.flatnonzero(new_run)
    pos = np.arange(n) - starts[run_id]
    return run_id, starts, pos


def _rows_kernel(gv: np.ndarray, v: np.ndarray | None, w: int,
                 agg: str) -> np.ndarray:
    """Exact per-row ROWS-frame aggregate over one sorted block."""
    n = len(gv)
    run_id, starts, pos = _runs(gv)
    idx = np.arange(n)
    lo = np.maximum(starts[run_id], idx - w + 1)
    cnt = idx - lo + 1
    if agg == "count":
        return cnt.astype(np.int64)
    if agg in ("sum", "mean"):
        cs0 = np.concatenate(([0], np.cumsum(v.astype(np.int64))))
        s = cs0[idx + 1] - cs0[lo]
        if agg == "sum":
            return s
        return s / cnt  # one exact-int division → float64, DuckDB AVG parity
    # min/max: pandas' C rolling kernel over plain numeric arrays (no
    # object boxing); run_id is ascending so group order == row order
    r = (pd.DataFrame({"g": run_id, "v": v.astype(np.int64)})
         .groupby("g", sort=False)["v"]
         .rolling(w, min_periods=1))
    out = (r.min() if agg == "min" else r.max()).to_numpy()
    return out.astype(np.int64)


def _range_kernel(gv: np.ndarray, ts: np.ndarray, v: np.ndarray | None,
                  delta: int, agg: str) -> np.ndarray:
    """Exact per-row RANGE-frame aggregate (ts in [ts_i - delta, ts_i],
    PEERS included) over one sorted block. Python loops runs, not rows —
    each run is two vectorized searchsorteds."""
    n = len(gv)
    run_id, starts, _ = _runs(gv)
    ends = np.append(starts[1:], n)
    lo = np.empty(n, dtype=np.int64)
    hi = np.empty(n, dtype=np.int64)
    for s, e in zip(starts, ends):
        t_run = ts[s:e]
        lo[s:e] = s + np.searchsorted(t_run, t_run - delta, side="left")
        hi[s:e] = s + np.searchsorted(t_run, t_run, side="right")
    if agg == "count":
        return hi - lo
    if agg == "ndistinct":
        return _window_ndistinct(v, lo, hi)
    if agg in ("min", "max"):
        return _rmq(v.astype(np.int64), lo, hi, is_min=(agg == "min"))
    cs0 = np.concatenate(([0], np.cumsum(v.astype(np.int64))))
    s = cs0[hi] - cs0[lo]
    if agg == "mean":
        return s / (hi - lo)  # exact-int sum / count → DuckDB AVG parity
    return s


def _window_ndistinct(v: np.ndarray, lo: np.ndarray,
                      hi: np.ndarray) -> np.ndarray:
    """Vectorized per-row COUNT(DISTINCT v[lo:hi]) for window bounds
    that never cross run boundaries. Designed for LOW-CARDINALITY
    categorical values (event types, labels): values factorize to codes
    and each 64-code chunk gets one prefix-sum matrix — distinct count
    = how many codes have a nonzero count inside the window. Memory is
    O(n · 64) per chunk regardless of total cardinality; a high-
    cardinality column degrades to ceil(T/64) passes, never to a
    per-row Python loop."""
    codes = pd.factorize(v)[0]
    n = len(codes)
    t_total = int(codes.max()) + 1 if n else 0
    out = np.zeros(n, dtype=np.int64)
    chunk = 64
    for t0 in range(0, t_total, chunk):
        width = min(chunk, t_total - t0)
        rel = codes - t0
        sel = np.flatnonzero((rel >= 0) & (rel < width))
        onehot = np.zeros((n + 1, width), dtype=np.int32)
        onehot[sel + 1, rel[sel]] = 1
        cs = np.cumsum(onehot, axis=0)
        out += ((cs[hi] - cs[lo]) > 0).sum(axis=1)
    return out


def _rmq(v: np.ndarray, lo: np.ndarray, hi: np.ndarray,
         *, is_min: bool) -> np.ndarray:
    """Vectorized range-min/max queries [lo, hi) over one array via a
    sparse table: O(n log n) build, every query two overlapping
    power-of-two gathers. Variable-width windows (RANGE frames) have no
    cumsum trick — this is the min/max analogue. lo/hi never cross run
    boundaries (the caller clamps them per run), so one block-global
    table serves every run."""
    length = hi - lo  # >= 1 (hi includes the current row's peers)
    # floor(log2(L)) exactly: frexp's exponent (L = m·2^e, 0.5 <= m < 1)
    k = np.frexp(length.astype(np.float64))[1].astype(np.int64) - 1
    maxk = int(k.max()) if len(k) else 0
    st = [v]
    for j in range(1, maxk + 1):
        half = 1 << (j - 1)
        prev = st[-1]
        st.append(np.minimum(prev[:-half], prev[half:]) if is_min
                  else np.maximum(prev[:-half], prev[half:]))
    out = np.empty(len(lo), dtype=np.int64)
    for j in range(maxk + 1):
        m = k == j
        if not m.any():
            continue
        a = st[j][lo[m]]
        b = st[j][hi[m] - (1 << j)]
        out[m] = np.minimum(a, b) if is_min else np.maximum(a, b)
    return out


def _out_type(agg: str) -> pa.DataType:
    return pa.float64() if agg == "mean" else pa.int64()


def _ts_np_us(a: np.ndarray) -> np.ndarray:
    """datetime64[any unit] → int64 MICROSECONDS (ns floored); integer
    arrays pass through in their own units. One normalizer for worker
    and driver so a pandas datetime64[ns] mini-table can never disagree
    with the Arrow timestamp[us] blocks on scale."""
    if a.dtype.kind == "M":
        unit = np.datetime_data(a.dtype)[0]
        i = a.view(np.int64)
        scale = {"s": 1_000_000, "ms": 1_000, "us": 1}.get(unit)
        if scale is None:  # ns
            return i // 1_000
        return i * scale
    return a.astype(np.int64)


def rolling_agg(ds: Dataset, *, group_col: str, order_cols: list[str],
                value_col: str | None, w: int, id_col: str,
                agg: str = "sum", out_col: str = "roll") -> Dataset:
    """``(id_col, out_col)`` — per-group ROWS-frame aggregate of the
    current row and the ``w-1`` preceding rows under ``ORDER BY
    order_cols`` (the final order column must make rows unique per
    group, as in the SQL contract). ``value_col`` must be integer-typed
    (ignored for ``agg="count"``)."""
    if w < 1:
        raise ValueError("w must be >= 1")
    if agg not in _ROWS_AGGS:
        raise ValueError(f"agg must be one of {_ROWS_AGGS}")
    value_col = value_col if agg != "count" else None
    keys = [group_col] + list(order_cols)
    srt = ds.sort(keys)
    # columns the raw channel carries BESIDES the id (which may itself
    # be an order column — e.g. event_id as the uniqueness tiebreak)
    carry = [c for c in dict.fromkeys(
        [group_col, *order_cols] + ([value_col] if value_col else []))
        if c != id_col]
    otype = _out_type(agg)

    def block_roll(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                id_col: t.column(id_col),
                out_col: pa.array([], type=otype),
                **{c: t.column(c) for c in carry},
            }).append_column("ch", pa.array([], type=pa.int8()))
        gv = t.column(group_col).to_numpy(zero_copy_only=False)
        v = (t.column(value_col).to_numpy(zero_copy_only=False)
             if value_col else None)
        run_id, starts, pos = _runs(gv)
        roll = _rows_kernel(gv, v, w, agg)
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
                np.concatenate((roll, roll[tail_idx])), type=otype),
            **{c: sub.column(c) for c in carry},
        })
        return out.append_column("ch", pa.array(ch_all))

    def fixup(mini: pd.DataFrame) -> pd.DataFrame:
        gv = mini[group_col].to_numpy()
        v = (mini[value_col].to_numpy() if value_col
             else None)
        return mini.assign(**{out_col: _rows_kernel(gv, v, w, agg)})

    return _assemble(srt, block_roll, fixup, keys=keys, id_col=id_col,
                     out_col=out_col, carry=carry)


def rolling_sum(ds: Dataset, *, group_col: str, order_cols: list[str],
                value_col: str, w: int, id_col: str,
                out_col: str = "roll_sum") -> Dataset:
    """Back-compat wrapper: ROWS-frame rolling SUM."""
    return rolling_agg(ds, group_col=group_col, order_cols=order_cols,
                       value_col=value_col, w=w, id_col=id_col,
                       agg="sum", out_col=out_col)


def rolling_range_agg(ds: Dataset, *, group_col: str, ts_col: str,
                      value_col: str | None, delta: int, id_col: str,
                      agg: str = "sum", out_col: str = "roll") -> Dataset:
    """``(id_col, out_col)`` — per-group RANGE-frame aggregate: all rows
    of the group with ``ts`` in ``[ts_i - delta, ts_i]`` (SQL ``RANGE
    BETWEEN delta PRECEDING AND CURRENT ROW``; ORDER-BY peers included,
    exactly like SQL). ``ts_col`` may be any-unit timestamp (normalized
    to MICROSECONDS — ``delta`` is always µs for timestamps; ns
    sub-microsecond precision is floored) or an integer column
    (``delta`` in the column's own units)."""
    if delta < 0:
        raise ValueError("delta must be >= 0")
    if agg not in _RANGE_AGGS:
        raise ValueError(f"agg must be one of {_RANGE_AGGS}")
    value_col = value_col if agg != "count" else None
    keys = [group_col, ts_col, id_col]
    srt = ds.sort(keys)
    carry = [c for c in dict.fromkeys(
        [group_col, ts_col] + ([value_col] if value_col else []))
        if c != id_col]
    otype = _out_type(agg)

    def _ts_i64(col) -> np.ndarray:
        return _ts_np_us(col.to_numpy(zero_copy_only=False))

    def block_roll(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                id_col: t.column(id_col),
                out_col: pa.array([], type=otype),
                **{c: t.column(c) for c in carry},
            }).append_column("ch", pa.array([], type=pa.int8()))
        gv = t.column(group_col).to_numpy(zero_copy_only=False)
        ts = _ts_i64(t.column(ts_col))
        v = (t.column(value_col).to_numpy(zero_copy_only=False)
             if value_col else None)
        run_id, starts, pos = _runs(gv)
        roll = _range_kernel(gv, ts, v, delta, agg)
        ch = np.zeros(n, dtype=np.int8)
        # heads: first-run rows whose window may reach the previous
        # fragment (ts - delta <= the fragment's first ts)
        ch[(run_id == 0) & (ts <= ts[0] + delta)] = 1
        # peer heads: last-run rows tied with the block's last ts — the
        # RANGE frame includes PEERS, which may continue in the next
        # block, so their in-block result may undercount
        last_run = run_id == run_id[-1]
        ch[last_run & (ts == ts[-1])] = 1
        # tail context: the last run's delta-reachable suffix
        tail_idx = np.flatnonzero(last_run & (ts >= ts[-1] - delta))
        idx_all = np.concatenate((np.arange(n), tail_idx))
        ch_all = np.concatenate(
            (ch, np.full(len(tail_idx), 2, dtype=np.int8)))
        sub = t.take(pa.array(idx_all))
        out = pa.table({
            id_col: sub.column(id_col),
            out_col: pa.array(
                np.concatenate((roll, roll[tail_idx])), type=otype),
            **{c: sub.column(c) for c in carry},
        })
        return out.append_column("ch", pa.array(ch_all))

    def fixup(mini: pd.DataFrame) -> pd.DataFrame:
        gv = mini[group_col].to_numpy()
        ts = _ts_np_us(mini[ts_col].to_numpy())
        v = mini[value_col].to_numpy() if value_col else None
        return mini.assign(
            **{out_col: _range_kernel(gv, ts, v, delta, agg)})

    return _assemble(srt, block_roll, fixup, keys=keys, id_col=id_col,
                     out_col=out_col, carry=carry)


def _assemble(srt: Dataset, block_roll, fixup, *, keys: list[str],
              id_col: str, out_col: str, carry: list[str]) -> Dataset:
    """Shared boundary protocol: interior rows stream through; head +
    context rows form the driver mini-table, the same kernel re-runs
    over it (every window row of a head row is present — module
    docstring), and the recomputed heads union back in."""
    from ..traverse import drop_empty_blocks, filter_select

    partial = drop_empty_blocks(
        srt.map_batches(block_roll, batch_format="pyarrow"))
    interior = filter_select(partial, "ch", 0, drop=["ch", *carry])
    edge_df = (partial.filter(expr="ch != 0")
               .select_columns([id_col, "ch", *carry]).to_pandas())
    if not len(edge_df):
        return interior
    # dedup rows shipped on both channels (head wins: ch asc keeps 1)
    mini = (edge_df.sort_values([*keys, "ch"], kind="stable")
            .drop_duplicates(subset=[id_col], keep="first"))
    mini = fixup(mini)
    fixed = mini[mini["ch"] == 1][[id_col, out_col]]
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(fixed.reset_index(drop=True),
                             preserve_index=False)))


# --- navigation / ranking windows --------------------------------------------

def lag_lead(ds: Dataset, *, group_col: str, order_cols: list[str],
             value_col: str, offset: int = 1, kind: str = "lag",
             id_col: str, default: int | None = None,
             out_col: str = "nav") -> Dataset:
    """``(id_col, out_col)`` — SQL ``LAG(value, offset)`` / ``LEAD(value,
    offset) OVER (PARTITION BY group ORDER BY order_cols)``. Rows with no
    offset-th neighbor in their group get ``default`` (null when None —
    pass an int to keep the output int64 for hash-stable oracles via
    ``COALESCE``).

    Same boundary protocol as the rolling family, mirrored for LEAD:
    the ``offset`` rows adjacent to each block edge ride the driver
    channel (heads recomputed there, the facing edge of the neighboring
    block shipped as context), so driver residency is O(blocks·offset).
    """
    if offset < 1:
        raise ValueError("offset must be >= 1")
    if kind not in ("lag", "lead"):
        raise ValueError("kind must be 'lag' or 'lead'")
    keys = [group_col] + list(order_cols)
    srt = ds.sort(keys)
    carry = [c for c in dict.fromkeys([group_col, *order_cols, value_col])
             if c != id_col]

    def nav_values(gv: np.ndarray, v: np.ndarray) -> pa.Array:
        n = len(gv)
        run_id, starts, pos = _runs(gv)
        idx = np.arange(n)
        if kind == "lag":
            src = idx - offset
            valid = src >= starts[run_id]
        else:
            ends = np.append(starts[1:], n)
            src = idx + offset
            valid = src <= ends[run_id] - 1
        out = np.where(valid, v[np.clip(src, 0, n - 1)],
                       0 if default is None else default)
        mask = None if default is not None else ~valid
        return pa.array(out.astype(np.int64), type=pa.int64(),
                        mask=mask)

    def block_roll(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                id_col: t.column(id_col),
                out_col: pa.array([], type=pa.int64()),
                **{c: t.column(c) for c in carry},
            }).append_column("ch", pa.array([], type=pa.int8()))
        gv = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        run_id, starts, pos = _runs(gv)
        nav = nav_values(gv, v)
        ch = np.zeros(n, dtype=np.int8)
        last_run = run_id == run_id[-1]
        if kind == "lag":
            # heads look BACK across the block edge; context is the
            # facing tail of this block for the next one
            ch[(run_id == 0) & (pos < offset)] = 1
            ctx_idx = np.flatnonzero(last_run & (pos >= pos[-1] - offset + 1))
        else:
            # LEAD mirrors: heads look FORWARD, context is this block's
            # leading rows for the previous block's heads
            ch[last_run & (pos >= pos[-1] - offset + 1)] = 1
            ctx_idx = np.flatnonzero((run_id == 0) & (pos < offset))
        idx_all = np.concatenate((np.arange(n), ctx_idx))
        ch_all = np.concatenate(
            (ch, np.full(len(ctx_idx), 2, dtype=np.int8)))
        sub = t.take(pa.array(idx_all))
        out = pa.table({
            id_col: sub.column(id_col),
            out_col: pa.concat_arrays(
                [nav, nav.take(pa.array(ctx_idx))]),
            **{c: sub.column(c) for c in carry},
        })
        return out.append_column("ch", pa.array(ch_all))

    def fixup(mini: pd.DataFrame) -> pd.DataFrame:
        gv = mini[group_col].to_numpy()
        v = mini[value_col].to_numpy()
        nav = nav_values(gv, v)
        if default is not None:  # no nulls possible → plain int64
            return mini.assign(
                **{out_col: nav.to_numpy(zero_copy_only=False)})
        # ArrowDtype keeps null ints int64 through the pandas hop — a
        # plain .to_numpy() would promote the default=None path to
        # float64 and schema-clash with the interior int64 blocks
        col = pd.Series(pd.arrays.ArrowExtensionArray(
            pa.chunked_array([nav])), index=mini.index)
        return mini.assign(**{out_col: col})

    return _assemble(srt, block_roll, fixup, keys=keys, id_col=id_col,
                     out_col=out_col, carry=carry)


def _rn_probe(block: pa.Table, group_col: str):
    """(first_group, first_run_len, last_group, last_run_len, n) — the
    per-block metadata the ROW_NUMBER offset chain needs."""
    gv = block.column(group_col).to_numpy(zero_copy_only=False)
    n = len(gv)
    _, starts, _ = _runs(gv)
    first_run_len = int(starts[1]) if len(starts) > 1 else n
    last_run_len = n - int(starts[-1])
    return gv[0], first_run_len, gv[-1], last_run_len, n


def _rn_emit(block: pa.Table, group_col: str, id_col: str, out_col: str,
             first_run_offset: int, keep_group: bool = False) -> pa.Table:
    gv = block.column(group_col).to_numpy(zero_copy_only=False)
    run_id, starts, pos = _runs(gv)
    rn = pos + 1
    rn[run_id == 0] += first_run_offset
    cols = {id_col: block.column(id_col),
            out_col: pa.array(rn.astype(np.int64))}
    if keep_group:
        cols[group_col] = block.column(group_col)
    return pa.table(cols)


def row_number(ds: Dataset, *, group_col: str, order_cols: list[str],
               id_col: str, out_col: str = "rn",
               keep_group: bool = False) -> Dataset:
    """``(id_col, out_col)`` — SQL ``ROW_NUMBER() OVER (PARTITION BY
    group ORDER BY order_cols)`` (the final order column must make rows
    unique per group, as in the SQL contract).

    ROW_NUMBER's frame is UNBOUNDED PRECEDING, so the rolling family's
    bounded boundary channel cannot express it. This is one of the rare
    drop-to-raw-Ray operators: the sorted dataset's block refs are
    walked IN DATASET ORDER (Ray's range-partitioning sort guarantees
    inter-block order — the partitioning assumption this operator
    documents and relies on); a tiny probe task per block returns
    (first/last group, edge run lengths), the driver chains fragment
    offsets across blocks in O(blocks), and one emit task per block
    writes the numbered rows. Nothing but the O(blocks) probe rows ever
    lands on the driver; blocks are never concatenated."""
    import ray

    srt = ds.sort([group_col] + list(order_cols)).materialize()
    try:
        refs = [block_ref
                for bundle in srt.iter_internal_ref_bundles()
                for block_ref, meta in zip(bundle.block_refs, bundle.metadata)
                if (meta.num_rows or 0) > 0]
    except Exception:  # pragma: no cover — internal API moved; degrade
        # single-task fallback: one global pass (correct, not scalable)
        refs = None
    probe = ray.remote(num_cpus=0.25)(_rn_probe)
    emit = ray.remote(num_cpus=0.5)(_rn_emit)
    if refs is None:
        one = srt.repartition(1)
        tbl = pa.concat_tables(
            [tb for tb in ray.get(one.to_arrow_refs()) if len(tb)])
        return rd.from_arrow(
            ray.get(emit.remote(tbl, group_col, id_col, out_col, 0,
                                keep_group)))
    if not refs:
        return srt.map_batches(
            lambda t: pa.table({id_col: t.column(id_col),
                                out_col: pa.array([], type=pa.int64())}),
            batch_format="pyarrow")
    metas = ray.get([probe.remote(r, group_col) for r in refs])
    offsets: list[int] = []
    carry_g: object = object()  # matches no group value
    carry_n = 0
    for fg, frl, lg, lrl, n in metas:
        off = carry_n if fg == carry_g else 0
        offsets.append(off)
        if fg == lg and frl == n:  # single-run block: run keeps growing
            carry_g, carry_n = lg, off + n
        else:
            carry_g, carry_n = lg, lrl
    out_refs = [emit.remote(r, group_col, id_col, out_col, off, keep_group)
                for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def _rank_probe(block: pa.Table, group_col: str, order_cols: list[str]):
    """Per-block metadata for the RANK/DENSE_RANK offset chain:
    (first_group, first_key, first_run_len, first_run_ndistinct,
     last_group, last_key, last_run_len, last_run_ndistinct,
     last_tie_start_in_last_run, n)."""
    gv = block.column(group_col).to_numpy(zero_copy_only=False)
    n = len(gv)
    ocols = [block.column(c).to_numpy(zero_copy_only=False)
             for c in order_cols]
    run_change = _run_change_mask(gv)
    tie_change = _run_change_mask(gv, *ocols)
    starts = np.flatnonzero(run_change)
    first_run_len = int(starts[1]) if len(starts) > 1 else n
    last_start = int(starts[-1])
    f_ndist = int(tie_change[:first_run_len].sum())
    l_ndist = int(tie_change[last_start:].sum())
    l_tie_start = int(np.flatnonzero(tie_change)[-1]) - last_start
    fkey = tuple(o[0] for o in ocols)
    lkey = tuple(o[-1] for o in ocols)
    return (gv[0], fkey, first_run_len, f_ndist,
            gv[-1], lkey, n - last_start, l_ndist, l_tie_start, n)


def _rank_emit(block: pa.Table, group_col: str, order_cols: list[str],
               id_col: str, out_col: str, dense: bool,
               cn: int, cd: int, merged: bool, crank: int,
               keep_group: bool = False) -> pa.Table:
    gv = block.column(group_col).to_numpy(zero_copy_only=False)
    ocols = [block.column(c).to_numpy(zero_copy_only=False)
             for c in order_cols]
    run_change = _run_change_mask(gv)
    tie_change = _run_change_mask(gv, *ocols)
    run_id = np.cumsum(run_change) - 1
    starts = np.flatnonzero(run_change)
    tie_id = np.cumsum(tie_change) - 1
    tie_starts = np.flatnonzero(tie_change)
    run_start = starts[run_id]
    first = run_id == 0
    if dense:
        # dense index of the row's tie sub-run within its group run
        out = tie_id - tie_id[run_start] + 1
        # when the first sub-run continues the previous block's last
        # key, the carried dense count already includes it
        out[first] += cd - (1 if merged else 0)
    else:
        out = tie_starts[tie_id] - run_start + 1
        out[first] += cn
        if merged:
            # the merged sub-run's rank was fixed where the tie STARTED
            # (an earlier block) — not derivable in-block
            out[first & (tie_id == 0)] = crank
    cols = {id_col: block.column(id_col),
            out_col: pa.array(out.astype(np.int64))}
    if keep_group:
        cols[group_col] = block.column(group_col)
    return pa.table(cols)


def rank_window(ds: Dataset, *, group_col: str, order_cols: list[str],
                id_col: str, method: str = "rank",
                out_col: str = "rnk",
                keep_group: bool = False) -> Dataset:
    """``(id_col, out_col)`` — SQL ``RANK()`` / ``DENSE_RANK() OVER
    (PARTITION BY group ORDER BY order_cols)`` with exact SQL tie
    semantics (ties share a rank; RANK leaves gaps, DENSE_RANK does
    not). Order-key ties MAY recur across rows and span blocks.

    Same block-offset-chain shape as ``row_number`` (and the same
    range-partitioned-sort ordering assumption), with the carry extended
    to (rows, distinct keys, last key, last key's global rank) so a tie
    group straddling any number of block boundaries keeps one rank."""
    import ray

    if method not in ("rank", "dense_rank"):
        raise ValueError("method must be 'rank' or 'dense_rank'")
    dense = method == "dense_rank"
    srt = ds.sort([group_col] + list(order_cols)).materialize()
    try:
        refs = [block_ref
                for bundle in srt.iter_internal_ref_bundles()
                for block_ref, meta in zip(bundle.block_refs, bundle.metadata)
                if (meta.num_rows or 0) > 0]
    except Exception:  # pragma: no cover — internal API moved; degrade
        refs = None
    probe = ray.remote(num_cpus=0.25)(_rank_probe)
    emit = ray.remote(num_cpus=0.5)(_rank_emit)
    if refs is None:
        one = srt.repartition(1)
        tbl = pa.concat_tables(
            [tb for tb in ray.get(one.to_arrow_refs()) if len(tb)])
        return rd.from_arrow(ray.get(emit.remote(
            tbl, group_col, list(order_cols), id_col, out_col, dense,
            0, 0, False, 0, keep_group)))
    if not refs:
        return srt.map_batches(
            lambda t: pa.table({id_col: t.column(id_col),
                                out_col: pa.array([], type=pa.int64())}),
            batch_format="pyarrow")
    metas = ray.get([probe.remote(r, group_col, list(order_cols))
                     for r in refs])
    params: list[tuple[int, int, bool, int]] = []
    carry_g: object = object()  # matches no group value
    cn = cd = crank = 0
    ckey: object = object()
    for fg, fkey, frl, fnd, lg, lkey, lrl, lnd, lts, n in metas:
        cont = fg == carry_g
        in_n, in_d = (cn, cd) if cont else (0, 0)
        merged = cont and fkey == ckey
        params.append((in_n, in_d, merged, crank))
        if fg == lg and frl == n:  # single-run block: run keeps growing
            out_d = in_d + fnd - (1 if merged else 0)
            if fnd == 1 and merged:
                out_rank = crank  # whole block extends one tie group
            else:
                out_rank = in_n + lts + 1
            carry_g, cn, cd, ckey, crank = lg, in_n + n, out_d, lkey, out_rank
        else:
            carry_g, cn, cd, ckey, crank = lg, lrl, lnd, lkey, lts + 1
    out_refs = [emit.remote(r, group_col, list(order_cols), id_col,
                            out_col, dense, p_cn, p_cd, p_m, p_r,
                            keep_group)
                for r, (p_cn, p_cd, p_m, p_r) in zip(refs, params)]
    return rd.from_arrow_refs(out_refs)


def _cum_probe(block: pa.Table, group_col: str, value_col: str):
    """(first_group, first_run_len, first_run_sum, last_group,
    last_run_len, last_run_sum, n) for the running-sum offset chain."""
    gv = block.column(group_col).to_numpy(zero_copy_only=False)
    v = block.column(value_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n = len(gv)
    _, starts, _ = _runs(gv)
    first_run_len = int(starts[1]) if len(starts) > 1 else n
    last_start = int(starts[-1])
    return (gv[0], first_run_len, int(v[:first_run_len].sum()),
            gv[-1], n - last_start, int(v[last_start:].sum()), n)


def _cum_emit(block: pa.Table, group_col: str, value_col: str,
              id_col: str, out_col: str, first_run_offset: int) -> pa.Table:
    gv = block.column(group_col).to_numpy(zero_copy_only=False)
    v = block.column(value_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    run_id, starts, pos = _runs(gv)
    cs = np.cumsum(v)
    # per-run cumulative: subtract the sum before each run's start
    run_base = np.concatenate(([0], cs))[starts[run_id]]
    out = cs - run_base
    out[run_id == 0] += first_run_offset
    return pa.table({id_col: block.column(id_col),
                     out_col: pa.array(out.astype(np.int64))})


def running_sum(ds: Dataset, *, group_col: str, order_cols: list[str],
                value_col: str, id_col: str,
                out_col: str = "running_sum") -> Dataset:
    """``(id_col, out_col)`` — SQL ``SUM(value) OVER (PARTITION BY group
    ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``: the running total.

    Completes the frame family: bounded ROWS (``rolling_agg``), time
    RANGE (``rolling_range_agg``), and now UNBOUNDED PRECEDING — whose
    boundary state is a single int per group fragment, so it uses the
    ``row_number`` block-offset chain (same range-partitioned-sort
    ordering assumption) with the carry holding the group's running sum
    instead of its row count. ``value_col`` must be integer-typed."""
    import ray

    srt = ds.sort([group_col] + list(order_cols)).materialize()
    try:
        refs = [block_ref
                for bundle in srt.iter_internal_ref_bundles()
                for block_ref, meta in zip(bundle.block_refs, bundle.metadata)
                if (meta.num_rows or 0) > 0]
    except Exception:  # pragma: no cover — internal API moved; degrade
        refs = None
    probe = ray.remote(num_cpus=0.25)(_cum_probe)
    emit = ray.remote(num_cpus=0.5)(_cum_emit)
    if refs is None:
        one = srt.repartition(1)
        tbl = pa.concat_tables(
            [tb for tb in ray.get(one.to_arrow_refs()) if len(tb)])
        return rd.from_arrow(ray.get(emit.remote(
            tbl, group_col, value_col, id_col, out_col, 0)))
    if not refs:
        return srt.map_batches(
            lambda t: pa.table({id_col: t.column(id_col),
                                out_col: pa.array([], type=pa.int64())}),
            batch_format="pyarrow")
    metas = ray.get([probe.remote(r, group_col, value_col) for r in refs])
    offsets: list[int] = []
    carry_g: object = object()
    carry_s = 0
    for fg, frl, frs, lg, lrl, lrs, n in metas:
        off = carry_s if fg == carry_g else 0
        offsets.append(off)
        if fg == lg and frl == n:  # single-run block: sum keeps growing
            carry_g, carry_s = lg, off + frs
        else:
            carry_g, carry_s = lg, lrs
    out_refs = [emit.remote(r, group_col, value_col, id_col, out_col, off)
                for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def _with_group_sizes(ranked: Dataset, ds: Dataset, group_col: str,
                      num_partitions: int = 4) -> Dataset:
    """Attach each group's total row count to a ranked (id, value,
    group) dataset: one distributed groupby-count (|groups| rows) and
    one hash join — both group-keyed, nothing driver-side."""
    from ray.data.aggregate import Count

    from ..traverse import drop_empty_blocks

    counts = (ds.select_columns([group_col]).groupby(group_col)
              .aggregate(Count(alias_name="_gn")))
    # launder BOTH join inputs: schema-less empty blocks (groupby over
    # an empty range partition) poison the hash-join partitioner with
    # "No match for key field" (traverse.drop_empty_blocks note)
    return drop_empty_blocks(ranked).join(
        drop_empty_blocks(counts), join_type="inner",
        num_partitions=num_partitions, on=(group_col,))


def ntile(ds: Dataset, *, group_col: str, order_cols: list[str],
          id_col: str, k: int, out_col: str = "tile",
          num_partitions: int = 4) -> Dataset:
    """``(id_col, out_col)`` — SQL ``NTILE(k) OVER (PARTITION BY group
    ORDER BY order_cols)``: rows split into k buckets per group, sizes
    differing by at most one, earlier buckets larger (exact SQL rule:
    with n = |group|, q = n//k, r = n%k, the first r buckets hold q+1
    rows). Composition: ``row_number`` + a group-size join + one map."""
    import pyarrow.compute as pc  # noqa: F401 — keep import surface

    if k < 1:
        raise ValueError("k must be >= 1")
    rn = row_number(ds, group_col=group_col, order_cols=order_cols,
                    id_col=id_col, out_col="_rn", keep_group=True)
    sized = _with_group_sizes(rn, ds, group_col, num_partitions)

    def assign(t: pa.Table) -> pa.Table:
        i = t.column("_rn").to_numpy(zero_copy_only=False)
        n = t.column("_gn").to_numpy(zero_copy_only=False)
        q, r = n // k, n % k
        big = r * (q + 1)  # rows covered by the q+1-sized buckets
        in_big = i <= big
        tile = np.where(in_big,
                        (i - 1) // np.maximum(q + 1, 1) + 1,
                        r + (i - big - 1) // np.maximum(q, 1) + 1)
        return pa.table({id_col: t.column(id_col),
                         out_col: pa.array(tile.astype(np.int64))})

    return sized.map_batches(assign, batch_format="pyarrow")


def percent_rank(ds: Dataset, *, group_col: str, order_cols: list[str],
                 id_col: str, out_col: str = "pct_rank",
                 num_partitions: int = 4) -> Dataset:
    """``(id_col, out_col)`` — SQL ``PERCENT_RANK() OVER (PARTITION BY
    group ORDER BY order_cols)`` = (rank - 1) / (n - 1), 0.0 for
    single-row groups. One exact-int division → float64, bit-identical
    to the SQL double division."""
    rnk = rank_window(ds, group_col=group_col, order_cols=order_cols,
                      id_col=id_col, method="rank", out_col="_rnk",
                      keep_group=True)
    sized = _with_group_sizes(rnk, ds, group_col, num_partitions)

    def assign(t: pa.Table) -> pa.Table:
        r = t.column("_rnk").to_numpy(zero_copy_only=False)
        n = t.column("_gn").to_numpy(zero_copy_only=False)
        out = (r - 1) / np.maximum(n - 1, 1)
        return pa.table({id_col: t.column(id_col),
                         out_col: pa.array(out.astype(np.float64))})

    return sized.map_batches(assign, batch_format="pyarrow")


def cume_dist(ds: Dataset, *, group_col: str, order_cols: list[str],
              id_col: str, out_col: str = "cume",
              num_partitions: int = 4) -> Dataset:
    """``(id_col, out_col)`` — SQL ``CUME_DIST() OVER (PARTITION BY
    group ORDER BY order_cols)`` = rows-with-key-<=-current / n.

    Composition: rows <= current = n - rank_desc + 1, and a DESCENDING
    rank is an ascending ``rank_window`` over the NEGATED keys — so
    ``order_cols`` must be integer-typed (the engine's cents/epoch
    convention). One exact-int division → float64, bit-identical to
    the SQL double division."""
    import pyarrow.compute as pc

    keep = [group_col, id_col] + [c for c in order_cols
                                  if c not in (group_col, id_col)]

    def neg(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in keep}
        for c in order_cols:
            cols[f"_neg_{c}"] = pc.negate_checked(
                pc.cast(t.column(c), pa.int64()))
        return pa.table(cols)

    negated = ds.map_batches(neg, batch_format="pyarrow")
    rnk = rank_window(negated, group_col=group_col,
                      order_cols=[f"_neg_{c}" for c in order_cols],
                      id_col=id_col, method="rank", out_col="_rnk",
                      keep_group=True)
    sized = _with_group_sizes(rnk, ds, group_col, num_partitions)

    def assign(t: pa.Table) -> pa.Table:
        r = t.column("_rnk").to_numpy(zero_copy_only=False)
        n = t.column("_gn").to_numpy(zero_copy_only=False)
        out = (n - r + 1) / n
        return pa.table({id_col: t.column(id_col),
                         out_col: pa.array(out.astype(np.float64))})

    return sized.map_batches(assign, batch_format="pyarrow")
