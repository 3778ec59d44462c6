"""Mergeable sketches for pre-aggregation at scale.

HyperLogLog (Flajolet et al. 2007, with the standard small-range
correction): each batch reduces to ONE register vector; register vectors
merge by elementwise max — so a distinct count over 100 TB shuffles
``n_blocks × 2^p`` bytes instead of every key (the sketch pattern from
the Ray guide's aggregation-at-scale notes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _hll_registers(values: pd.Series, p: int) -> np.ndarray:
    """One HLL register vector (uint8[2^p]) for a batch of values."""
    m = 1 << p
    h = pd.util.hash_pandas_object(values, index=False).to_numpy()  # uint64
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rank = leading zeros of the remaining 64-p bits, + 1
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        cur[mask] = cur[mask] << np.uint64(shift)
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:  # small-range correction
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds: Dataset, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): per-batch register vectors →
    one elementwise-max merge. Standard error ≈ 1.04/sqrt(2^p)
    (~1.6% at p=12)."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = _hll_registers(batch.column(col).to_pandas(), p)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in partials:
        merged = np.maximum(merged, np.frombuffer(row["regs"], dtype=np.uint8))
    return _hll_estimate(merged)


def hll_distinct_by_key(ds: Dataset, key: str, col: str, p: int = 10) -> pd.DataFrame:
    """Approximate distinct-col per key group: per-batch (key, registers)
    partials, merged per key driver-side (partials are tiny: one 2^p-byte
    vector per key per block)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, sub in df.groupby(key, sort=False):
            rows.append({key: k, "regs": _hll_registers(sub[col], p).tobytes()})
        if not rows:
            # typed empty frame: pd.DataFrame([]) has ZERO columns and
            # would emit a schema-mismatched block (and an all-empty
            # dataset would KeyError in the driver groupby below)
            return pd.DataFrame({key: df[key], "regs": pd.Series(dtype="object")})
        return pd.DataFrame(rows)

    partials = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pandas", batch_size=65536).to_pandas()
    if partials.empty or "regs" not in partials.columns:
        # an ALL-empty dataset bypasses map_batches entirely and lands
        # here with the raw (key, col) schema — or no columns at all
        kcol = (partials[key] if key in partials.columns
                else pd.Series(dtype="object"))
        return pd.DataFrame({key: kcol,
                             "approx_distinct": pd.Series(dtype="float64")})
    out = []
    for k, sub in partials.groupby(key, sort=False):
        merged = np.zeros(1 << p, dtype=np.uint8)
        for b in sub["regs"]:
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        out.append({key: k, "approx_distinct": _hll_estimate(merged)})
    if not out:
        return pd.DataFrame({key: partials[key],
                             "approx_distinct": pd.Series(dtype="float64")})
    return pd.DataFrame(out).sort_values(key).reset_index(drop=True)


# --- mergeable equi-depth quantile sketch -----------------------------------

def _compact_points(vals: np.ndarray, weights: np.ndarray,
                    k: int) -> tuple[np.ndarray, np.ndarray]:
    """Weighted points → k equi-depth points (values at the centers of k
    equal-mass buckets, each carrying total/k weight). Deterministic; a
    single compaction's rank error is <= half a bucket of ITS OWN mass,
    so summing over B compacted blocks keeps the global rank error
    <= total/(2k) — the 1/(2k) relative bound quoted below."""
    order = np.argsort(vals, kind="stable")
    v = vals[order]
    cw = np.cumsum(weights[order].astype(np.float64))
    total = cw[-1]
    targets = (np.arange(k) + 0.5) * (total / k)
    idx = np.minimum(np.searchsorted(cw, targets, side="left"), len(v) - 1)
    return v[idx], np.full(k, total / k)


def approx_quantiles_by_key(ds: Dataset, key: str, col: str,
                            qs: list[tuple[float, str]],
                            k: int = 1024) -> pd.DataFrame:
    """Approximate per-key quantiles of an UNBOUNDED numeric column via
    a mergeable equi-depth summary — the companion to
    ``quantiles.grouped_exact_quantiles`` when the value domain is too
    wide for an exact histogram. Each block compacts its values to at
    most k weighted points per key; the driver merges O(blocks x keys
    x k) points and reads values at the target ranks. Relative rank
    error is bounded by ~1/(2k) (0.05% at the default k), verified by
    the accuracy test. ``qs`` is a list of (q, out_name)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, sub in df.groupby(key, sort=False):
            vals = sub[col].to_numpy(dtype=np.float64)
            if len(vals) <= k:
                v, w = np.sort(vals), np.ones(len(vals))
            else:
                v, w = _compact_points(vals, np.ones(len(vals)), k)
            rows.append(pd.DataFrame({key: kv, "v": v, "w": w}))
        if not rows:
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="float64"),
                                 "w": pd.Series(dtype="float64")})
        return pd.concat(rows, ignore_index=True)

    pts = (ds.select_columns([key, col])
           .map_batches(partial, batch_format="pandas").to_pandas())
    out = []
    for kv, sub in pts.groupby(key, sort=True):
        order = np.argsort(sub["v"].to_numpy(), kind="stable")
        v = sub["v"].to_numpy()[order]
        cw = np.cumsum(sub["w"].to_numpy()[order])
        total = cw[-1]
        row = {key: kv}
        for q, name in qs:
            i = min(int(np.searchsorted(cw, q * total, side="left")),
                    len(v) - 1)
            row[name] = v[i]
        out.append(row)
    return pd.DataFrame(out)


# --- bounded-memory heavy hitters -------------------------------------------

def heavy_hitters(ds: Dataset, col: str, *, k: int = 4096,
                  top: int = 20) -> pd.DataFrame:
    """Top-``top`` most frequent values with BOUNDED per-block memory:
    each block keeps only its ``k`` most frequent values (exact local
    counts) plus one scalar — the count of its (k+1)-th value, the
    per-block undercount bound for anything it dropped (the truncated
    summary is mergeable like Misra-Gries, with the same Σ-bound shape;
    Misra/Gries 1982, Metwally et al.'s SpaceSaving guarantee).

    Output: (``col``, count_lo, count_hi, exact) where the true count
    lies in [count_lo, count_hi]; ``exact`` is True when EVERY block
    held all its distinct values (total eps 0 — counts are then exact
    and the top list equals the exact answer, which is what a SQL
    oracle checks at test scale). At web scale some blocks truncate and
    the interval honestly widens. Shuffle volume: ≤ (k+1) rows per
    block, never the value domain. Ties break on the value ascending
    (deterministic)."""
    from ray.data.aggregate import Sum

    # NULL values are EXCLUDED from the count (value_counts drops them)
    # — a documented divergence from SQL GROUP BY's null group; callers
    # counting a nullable column should pre-filter or fill explicitly.
    def partial(t: pa.Table) -> pa.Table:
        col_type = t.schema.field(col).type
        vc = t.column(col).to_pandas().value_counts()  # exact in-block
        kept = vc.iloc[:k]
        eps = int(vc.iloc[k]) if len(vc) > k else 0
        # one marker row per block carries the block's drop bound on a
        # separate channel. Its value-column slot is a TYPED null (an
        # object-dtype None marker through pandas became a null-typed
        # Arrow column that schema-clashed with string/int blocks);
        # marker rows are filtered by `kind` before the groupby, so the
        # null never reaches a key.
        return pa.table({
            col: pa.array(kept.index.tolist() + [None], type=col_type),
            "cnt": pa.array(kept.to_numpy().astype(np.int64).tolist()
                            + [eps], type=pa.int64()),
            "kind": pa.array(["v"] * len(kept) + ["m"], type=pa.string()),
        })

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).materialize()
    psch = partials.schema()
    if psch is None or "kind" not in psch.names:
        # an ALL-empty dataset bypasses map_batches entirely and lands
        # here with the raw (col,) schema — return a typed empty frame
        return pd.DataFrame({col: pd.Series(dtype="object"),
                             "count_lo": pd.Series(dtype="int64"),
                             "count_hi": pd.Series(dtype="int64"),
                             "exact": pd.Series(dtype="bool")})
    total_eps = int(partials.filter(expr="kind == 'm'")
                    .to_pandas()["cnt"].sum())
    merged = (partials.filter(expr="kind == 'v'")
              .groupby(col).aggregate(Sum("cnt", alias_name="count_lo")))
    # distributed top-N on the merged candidates (≤ blocks × k rows)
    out = (merged.sort(["count_lo", col], descending=[True, False])
           .limit(top).to_pandas())
    out["count_lo"] = out["count_lo"].astype("int64")
    out["count_hi"] = out["count_lo"] + total_eps
    out["exact"] = total_eps == 0
    return out
