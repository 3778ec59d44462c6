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
        cols = {"f_key": pd.Series(dtype="int64"),
                "f_ts": pd.Series(dtype="datetime64[us]"),
                "f_src": pd.Series(dtype="int8"),
                "f_uid": pd.Series(dtype="int64"),
                "l_key": pd.Series(dtype="int64"),
                "single": pd.Series(dtype=bool),
                "has_r": pd.Series(dtype=bool),
                "c_ts": pd.Series(dtype="datetime64[us]"),
                **{f"c_{v}": pd.Series(dtype="object") for v in value_cols}}
        if df.empty:
            return pd.DataFrame(cols)
        first = df.iloc[0]
        lk = df[key].iloc[-1]
        sub = df[(df[key] == lk) & (df["src"] == 0)]
        has_r = len(sub) > 0
        row = {"f_key": first[key], "f_ts": first[ts_col],
               "f_src": first["src"], "f_uid": first[tiebreak_col],
               "l_key": lk, "single": bool((df[key] == first[key]).all()),
               "has_r": has_r,
               "c_ts": sub["r_ts"].iloc[-1] if has_r else pd.NaT}
        for v in value_cols:
            row[f"c_{v}"] = sub[f"r_{v}"].iloc[-1] if has_r else None
        return pd.DataFrame([row])

    summaries = (srt.map_batches(summarize, batch_format="pandas")
                 .to_pandas()
                 .sort_values(["f_key", "f_ts", "f_src", "f_uid"],
                              kind="stable").reset_index(drop=True))
    carries: dict = {}
    for i in range(len(summaries)):
        s = summaries.iloc[i]
        fk = s["f_key"]
        for j in range(i - 1, -1, -1):
            p = summaries.iloc[j]
            if p["l_key"] != fk:
                break
            if p["has_r"]:
                carries[(fk, s["f_ts"], int(s["f_src"]), int(s["f_uid"]))] = {
                    "ts": p["c_ts"],
                    **{v: p[f"c_{v}"] for v in value_cols}}
                break
            if not p["single"]:
                break
    carries_ref = ray.put(carries)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = l_cols + ["ts_asof"] + [f"{v}_asof" for v in value_cols]
        if df.empty:
            return pd.DataFrame({c: pd.Series(dtype="object")
                                 for c in out_cols})
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
        ts_out[~lvalid] = pd.NaT
        if carry is not None:
            ts_out[lcarry] = carry["ts"]
        res["ts_asof"] = ts_out
        for v in value_cols:
            v_out = pd.Series(df[f"r_{v}"].to_numpy()[take][lmask],
                              index=res.index)
            v_out[~lvalid] = None
            if carry is not None:
                v_out[lcarry] = carry[v]
            res[f"{v}_asof"] = v_out
        if join_type == "inner":
            res = res[lvalid | lcarry]
        return res.reset_index(drop=True)

    return srt.map_batches(resolve, batch_format="pandas")
