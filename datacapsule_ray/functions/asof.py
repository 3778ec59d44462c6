"""Distributed AS-OF join: each left row picks the latest right row of
the same key with ``right.ts <= left.ts`` (the classic point-in-time /
most-recent-fact join; SQL engines expose it as ``ASOF JOIN``).

Ray-Data-first plan — one range-partitioning sort plus two maps over the
SAME materialized sorted blocks:

1. tag both sides (right src=0, left src=1) into one aligned schema and
   ``sort(key, ts, src, tiebreak)`` — right sorts before left at equal
   ts, making the bound inclusive; the sorted dataset is materialized so
   both passes see identical block boundaries;
2. pass 1 emits ONE summary row per block (first-row identity, last key,
   last right row for the last key, single-key flag). The driver orders
   the O(#blocks) summaries by first-row identity (sort guarantees
   disjoint, ordered ranges) and computes each block's CARRY — the
   latest right row for the key run that enters the block from previous
   blocks — in one forward pass. Driver state is O(#blocks), never
   O(rows) or O(keys);
3. pass 2 re-maps the same blocks: a vectorized forward-fill
   (``np.maximum.accumulate`` over right-row indices, reset at key-run
   starts) resolves every left row in-block; rows of the block's first
   run with no in-block right row take the broadcast carry.

Both passes stay in ARROW end-to-end: the aligned union necessarily has
nulls (r_ts/r_value on left rows, left payload on right rows), and an
arrow→pandas conversion would decay int64-with-nulls to float64 —
silently corrupting nanosecond-epoch timestamps and hashed ids above
2^53. Values cross the driver only as Arrow scalars / ``to_pylist``
python ints, which are exact.

Within-block work is all numpy; the only shuffle is the sort. Ties on
(key, ts) between right rows resolve to the largest ``tiebreak`` value
(deterministic; matches ORDER BY semantics with a unique tiebreak).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def _aligned(left: Dataset, right: Dataset, key: str, ts_col: str,
             tiebreak_col: str, value_cols: list[str]) -> Dataset:
    """Tag + align the two sides into one schema:
    left cols ∪ {src, r_<value>..., r_ts}."""
    l_schema = left.schema()
    l_fields = dict(zip(l_schema.names, l_schema.types))
    r_schema = right.schema()
    r_fields = dict(zip(r_schema.names, r_schema.types))

    def _require_non_null(t: pa.Table, side: str) -> None:
        # the block summaries and run detection assume non-null key/ts/
        # tiebreak: a null key decays to NaN in to_numpy (breaking run
        # equality) and a null-first sort would misalign the driver's
        # null-last summary ordering — fail loudly at entry instead
        for c in (key, ts_col, tiebreak_col):
            if t.column(c).null_count:
                raise ValueError(
                    f"asof_join: {side} column {c!r} contains nulls; "
                    f"key, ts and tiebreak must be non-null")

    def tag_left(t: pa.Table) -> pa.Table:
        _require_non_null(t, "left")
        n = len(t)
        out = {c: t.column(c) for c in l_fields}
        out["src"] = pa.array(np.ones(n, dtype=np.int8))
        out["r_ts"] = pa.nulls(n, type=r_fields[ts_col])
        for v in value_cols:
            out[f"r_{v}"] = pa.nulls(n, type=r_fields[v])
        return pa.table(out)

    def tag_right(t: pa.Table) -> pa.Table:
        _require_non_null(t, "right")
        n = len(t)
        out = {}
        for c, typ in l_fields.items():
            if c in (key, ts_col, tiebreak_col):
                out[c] = t.column(c)
            else:
                out[c] = pa.nulls(n, type=typ)
        out["src"] = pa.array(np.zeros(n, dtype=np.int8))
        out["r_ts"] = t.column(ts_col)
        for v in value_cols:
            out[f"r_{v}"] = t.column(v)
        return pa.table(out)

    return (left.map_batches(tag_left, batch_format="pyarrow")
            .union(right.map_batches(tag_right, batch_format="pyarrow")))


def _np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def asof_join(left: Dataset, right: Dataset, *, key: str, ts_col: str,
              tiebreak_col: str, value_cols: list[str],
              join_type: str = "inner") -> Dataset:
    """AS-OF join ``left`` to ``right`` on ``key`` with
    ``right[ts_col] <= left[ts_col]`` (latest match wins).

    ``tiebreak_col`` must be a unique-per-row integer column present in
    BOTH inputs (it fixes the order of equal-(key, ts) rows and makes
    block identities unique). Output: every left column plus
    ``<v>_asof`` for each value col and ``ts_asof`` (the matched right
    row's timestamp). ``join_type='inner'`` drops unmatched left rows;
    ``'left'`` keeps them with nulls."""
    if join_type not in ("inner", "left"):
        raise ValueError("join_type must be 'inner' or 'left'")
    l_cols = list(left.schema().names)
    srt = _aligned(left, right, key, ts_col, tiebreak_col, value_cols
                   ).sort([key, ts_col, "src", tiebreak_col]).materialize()

    c_cols = ["c_ts"] + [f"c_{v}" for v in value_cols]
    r_cols = ["r_ts"] + [f"r_{v}" for v in value_cols]

    def summarize(t: pa.Table) -> pa.Table:
        sch = t.schema
        out_schema = pa.schema(
            [("f_key", sch.field(key).type), ("f_ts", sch.field(ts_col).type),
             ("f_src", pa.int8()), ("f_uid", sch.field(tiebreak_col).type),
             ("l_key", sch.field(key).type), ("single", pa.bool_()),
             ("has_r", pa.bool_())]
            + [(c, sch.field(r).type) for c, r in zip(c_cols, r_cols)])
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        keyv = _np(t.column(key))
        src = _np(t.column("src"))
        last_run = keyv == keyv[-1]
        r_in_last = np.flatnonzero(last_run & (src == 0))
        has_r = len(r_in_last) > 0
        last_r = int(r_in_last[-1]) if has_r else 0
        cols = {
            "f_key": t.column(key).take(pa.array([0])),
            "f_ts": t.column(ts_col).take(pa.array([0])),
            "f_src": t.column("src").take(pa.array([0])).cast(pa.int8()),
            "f_uid": t.column(tiebreak_col).take(pa.array([0])),
            "l_key": t.column(key).take(pa.array([n - 1])),
            "single": pa.array([bool((keyv == keyv[0]).all())]),
            "has_r": pa.array([has_r]),
        }
        for c, r in zip(c_cols, r_cols):
            cols[c] = (t.column(r).take(pa.array([last_r])) if has_r
                       else pa.nulls(1, type=sch.field(r).type))
        return pa.table(cols, schema=out_schema)

    # O(#blocks) summaries gathered as ARROW (a pandas gather would
    # decay nullable int c_* columns to float64), ordered by first-row
    # identity — the sort guarantees disjoint, ordered block ranges
    from ..traverse import gather_table

    s_tbl = gather_table(srt.map_batches(summarize, batch_format="pyarrow"))

    def _null_last(v):
        # Arrow's sort places nulls LAST; the driver ordering of block
        # summaries must match, and a bare tuple compare would raise
        # TypeError on None vs int/str/datetime
        return (v is None, v)

    rows = sorted(s_tbl.to_pylist(),
                  key=lambda r: tuple(_null_last(r[c]) for c in
                                      ("f_key", "f_ts", "f_src", "f_uid")))
    # single forward pass, O(#blocks): `prev_carry` is the latest right
    # row of the key run ending at the previous block's tail (None when
    # that run has produced no right row yet, or the run began mid-block
    # — a multi-key block without a right row in its last run). The
    # backward-scan formulation of the same recurrence is O(#blocks^2)
    # when one hot key spans many right-less blocks.
    carries: dict = {}
    prev_lkey = None
    prev_carry: dict | None = None
    have_prev = False
    for s in rows:
        fk = s["f_key"]
        if have_prev and prev_lkey == fk and prev_carry is not None:
            carries[(fk, s["f_ts"], int(s["f_src"]), int(s["f_uid"]))] = \
                prev_carry
        if s["has_r"]:
            cur = {c: s[c] for c in c_cols}
        elif s["single"] and have_prev and prev_lkey == fk:
            cur = prev_carry          # run continues, no new right rows
        else:
            cur = None                # new run (or run began mid-block)
        prev_lkey, prev_carry, have_prev = s["l_key"], cur, True
    carries_ref = ray.put(carries)

    out_names = l_cols + ["ts_asof"] + [f"{v}_asof" for v in value_cols]

    def resolve(t: pa.Table) -> pa.Table:
        sch = t.schema
        out_schema = pa.schema(
            [(c, sch.field(c).type) for c in l_cols]
            + [(o, sch.field(r).type)
               for o, r in zip(out_names[len(l_cols):], r_cols)])
        if t.num_rows == 0:
            return out_schema.empty_table()
        # cached per-worker deserialize: a bare ray.get inside the task
        # would re-deserialize the O(#blocks) carries dict on EVERY
        # batch (the problem _cached_get exists for, ssjoin.py:75-80)
        from .ssjoin import _cached_get

        carry = _cached_get(carries_ref).get(
            (t.column(key)[0].as_py(), t.column(ts_col)[0].as_py(),
             int(t.column("src")[0].as_py()),
             int(t.column(tiebreak_col)[0].as_py())))
        n = t.num_rows
        keyv = _np(t.column(key))
        newk = np.ones(n, dtype=bool)
        newk[1:] = keyv[1:] != keyv[:-1]
        run_start = np.maximum.accumulate(
            np.where(newk, np.arange(n), -1))
        src = _np(t.column("src"))
        filled = np.maximum.accumulate(
            np.where(src == 0, np.arange(n), -1))
        valid = filled >= run_start
        in_first_run = run_start == 0
        use_carry = (~valid) & in_first_run & (carry is not None)
        lmask = src == 1
        left_idx = np.flatnonzero(lmask)
        res = t.select(l_cols).take(pa.array(left_idx))
        # matched right-row positions per left row (0 where unmatched —
        # masked to null below, so the placeholder value is never read)
        take_pos = np.where(valid, filled, 0)[left_idx]
        lvalid = pa.array(valid[left_idx])
        lcarry = pa.array(use_carry[left_idx])
        for o, cc, r in zip(out_names[len(l_cols):], c_cols, r_cols):
            typ = sch.field(r).type
            vals = t.column(r).take(pa.array(take_pos))
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            out = pc.if_else(lvalid, vals, pa.scalar(None, type=typ))
            if carry is not None:
                out = pc.if_else(lcarry, pa.scalar(carry[cc], type=typ), out)
            res = res.append_column(o, out)
        if join_type == "inner":
            res = res.filter(pc.or_(lvalid, lcarry))
        return res
        # NOTE: every column above stays in its ARROW type end-to-end —
        # int64 epoch-ns timestamps and >2^53 hashed ids survive exactly
        # (a pandas pass would round them through float64)

    return srt.map_batches(resolve, batch_format="pyarrow")
