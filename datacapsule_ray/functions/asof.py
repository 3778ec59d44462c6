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
   blocks — by scanning backward while the key matches. Driver state is
   O(#blocks), never O(rows) or O(keys);
3. pass 2 re-maps the same blocks: a vectorized forward-fill
   (``np.maximum.accumulate`` over right-row indices, reset at key-run
   starts) resolves every left row in-block; rows of the block's first
   run with no in-block right row take the broadcast carry.

Within-block work is all numpy; the only shuffle is the sort. Ties on
(key, ts) between right rows resolve to the largest ``tiebreak`` value
(deterministic; matches ORDER BY semantics with a unique tiebreak).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

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

    def tag_left(t: pa.Table) -> pa.Table:
        n = len(t)
        out = {c: t.column(c) for c in l_fields}
        out["src"] = pa.array(np.ones(n, dtype=np.int8))
        out["r_ts"] = pa.nulls(n, type=r_fields[ts_col])
        for v in value_cols:
            out[f"r_{v}"] = pa.nulls(n, type=r_fields[v])
        return pa.table(out)

    def tag_right(t: pa.Table) -> pa.Table:
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

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            # dtypes derived from the (schema-carrying) empty block —
            # hardcoded int64/datetime here would concat mismatched
            # dtypes into `summaries` for string keys / integer ts
            return pd.DataFrame(
                {"f_key": pd.Series(dtype=df[key].dtype),
                 "f_ts": pd.Series(dtype=df[ts_col].dtype),
                 "f_src": pd.Series(dtype="int8"),
                 "f_uid": pd.Series(dtype=df[tiebreak_col].dtype),
                 "l_key": pd.Series(dtype=df[key].dtype),
                 "single": pd.Series(dtype=bool),
                 "has_r": pd.Series(dtype=bool),
                 "c_ts": pd.Series(dtype="object"),
                 **{f"c_{v}": pd.Series(dtype="object")
                    for v in value_cols}})
        first = df.iloc[0]
        lk = df[key].iloc[-1]
        sub = df[(df[key] == lk) & (df["src"] == 0)]
        has_r = len(sub) > 0
        row = {"f_key": first[key], "f_ts": first[ts_col],
               "f_src": first["src"], "f_uid": first[tiebreak_col],
               "l_key": lk, "single": bool((df[key] == first[key]).all()),
               "has_r": has_r,
               # None (not NaT): c_ts is only read when has_r, and NaT
               # would force non-datetime ts columns to object anyway
               "c_ts": sub["r_ts"].iloc[-1] if has_r else None}
        for v in value_cols:
            row[f"c_{v}"] = sub[f"r_{v}"].iloc[-1] if has_r else None
        return pd.DataFrame([row])

    summaries = (srt.map_batches(summarize, batch_format="pandas")
                 .to_pandas()
                 .sort_values(["f_key", "f_ts", "f_src", "f_uid"],
                              kind="stable").reset_index(drop=True))
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
    for i in range(len(summaries)):
        s = summaries.iloc[i]
        fk = s["f_key"]
        if have_prev and prev_lkey == fk and prev_carry is not None:
            carries[(fk, s["f_ts"], int(s["f_src"]), int(s["f_uid"]))] = \
                prev_carry
        if s["has_r"]:
            cur = {"ts": s["c_ts"],
                   **{v: s[f"c_{v}"] for v in value_cols}}
        elif s["single"] and have_prev and prev_lkey == fk:
            cur = prev_carry          # run continues, no new right rows
        else:
            cur = None                # new run (or run began mid-block)
        prev_lkey, prev_carry, have_prev = s["l_key"], cur, True
    carries_ref = ray.put(carries)

    def _out_dtype(dt):
        """The ONE dtype a matched column keeps across ALL batches:
        native datetime (NaT is representable), else the pandas
        nullable extension dtype (plain NaT/NaN assignment would flip
        int ts columns to object or float64 only in batches that HAVE
        unmatched rows, producing inconsistent block schemas)."""
        if pd.api.types.is_datetime64_any_dtype(dt):
            return dt
        if pd.api.types.is_unsigned_integer_dtype(dt):
            return "UInt64"
        if pd.api.types.is_integer_dtype(dt):
            return "Int64"
        if pd.api.types.is_float_dtype(dt):
            return "Float64"
        return "object"

    def _null_out(s: pd.Series, mask: np.ndarray, carry_mask: np.ndarray,
                  carry_val) -> pd.Series:
        s = s.astype(_out_dtype(s.dtype))
        s[mask] = pd.NaT if pd.api.types.is_datetime64_any_dtype(s) else pd.NA
        if carry_val is not None:
            s[carry_mask] = carry_val
        return s

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = l_cols + ["ts_asof"] + [f"{v}_asof" for v in value_cols]
        if df.empty:
            empty = {c: pd.Series(dtype=df[c].dtype) if c in df.columns
                     else pd.Series(dtype="object") for c in l_cols}
            empty["ts_asof"] = pd.Series(dtype=_out_dtype(
                df["r_ts"].dtype if "r_ts" in df.columns else "object"))
            for v in value_cols:
                rc = f"r_{v}"
                empty[f"{v}_asof"] = pd.Series(dtype=_out_dtype(
                    df[rc].dtype if rc in df.columns else "object"))
            return pd.DataFrame(empty)[out_cols]
        # cached per-worker deserialize: a bare ray.get inside the task
        # would re-deserialize the O(#blocks) carries dict on EVERY
        # batch (the problem _cached_get exists for, ssjoin.py:75-80)
        from .ssjoin import _cached_get

        carry = _cached_get(carries_ref).get(
            (df[key].iloc[0], df[ts_col].iloc[0],
             int(df["src"].iloc[0]), int(df[tiebreak_col].iloc[0])))
        n = len(df)
        keyv = df[key].to_numpy()
        newk = np.ones(n, dtype=bool)
        newk[1:] = keyv[1:] != keyv[:-1]
        run_start = np.maximum.accumulate(
            np.where(newk, np.arange(n), -1))
        src = df["src"].to_numpy()
        filled = np.maximum.accumulate(
            np.where(src == 0, np.arange(n), -1))
        valid = filled >= run_start
        in_first_run = run_start == 0
        use_carry = (~valid) & in_first_run & (carry is not None)
        lmask = src == 1
        res = df.loc[lmask, l_cols].copy()
        take = np.where(valid, filled, 0)
        lvalid = valid[lmask]
        lcarry = use_carry[lmask]
        ts_out = pd.Series(df["r_ts"].to_numpy()[take][lmask],
                           index=res.index)
        res["ts_asof"] = _null_out(
            ts_out, ~lvalid, lcarry,
            carry["ts"] if carry is not None else None)
        for v in value_cols:
            v_out = pd.Series(df[f"r_{v}"].to_numpy()[take][lmask],
                              index=res.index)
            res[f"{v}_asof"] = _null_out(
                v_out, ~lvalid, lcarry,
                carry[v] if carry is not None else None)
        if join_type == "inner":
            res = res[lvalid | lcarry]
        return res.reset_index(drop=True)

    return srt.map_batches(resolve, batch_format="pandas")
