"""Distributed rolling-window aggregate (functions/window.py) pinned to
pandas groupby().rolling() across partitionings, window sizes, and a
single giant group spanning every block."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from datacapsule_ray.functions.window import rolling_sum


def _ref(df: pd.DataFrame, w: int) -> pd.DataFrame:
    srt = df.sort_values(["g", "ts", "id"], kind="stable")
    roll = (srt.groupby("g", group_keys=False, sort=False)["v"]
            .apply(lambda s: s.rolling(w, min_periods=1).sum())
            .astype(np.int64))
    return (pd.DataFrame({"id": srt["id"], "roll_sum": roll})
            .sort_values("id").reset_index(drop=True))


def _run(df: pd.DataFrame, w: int, n_blocks: int) -> pd.DataFrame:
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = rolling_sum(ds, group_col="g", order_cols=["ts", "id"],
                      value_col="v", w=w, id_col="id")
    return got.to_pandas().sort_values("id").reset_index(drop=True)


@pytest.mark.parametrize("n_blocks,w", [(1, 3), (5, 3), (9, 1), (7, 5)])
def test_rolling_sum_matches_pandas(n_blocks, w):
    rng = np.random.default_rng(31)
    n = 400
    df = pd.DataFrame({
        "g": rng.integers(0, 12, size=n),
        "ts": rng.integers(0, 50, size=n),   # heavy ts ties -> id breaks
        "id": np.arange(n),
        "v": rng.integers(-100, 100, size=n).astype(np.int64),
    })
    pd.testing.assert_frame_equal(_run(df, w, n_blocks), _ref(df, w),
                                  check_dtype=False)


def test_rolling_sum_single_giant_group():
    """One group across every block: every block boundary is a window
    boundary, the driver channel stays at 2(w-1) rows per block."""
    n = 256
    df = pd.DataFrame({"g": np.zeros(n, dtype=np.int64),
                       "ts": np.arange(n), "id": np.arange(n),
                       "v": np.arange(n, dtype=np.int64)})
    pd.testing.assert_frame_equal(_run(df, 4, 16), _ref(df, 4),
                                  check_dtype=False)


# --- generalized ROWS aggregates (mean/min/max/count) ------------------------

def _ref_agg(df: pd.DataFrame, w: int, agg: str) -> pd.DataFrame:
    srt = df.sort_values(["g", "ts", "id"], kind="stable")
    r = (srt.groupby("g", group_keys=False, sort=False)["v"]
         .apply(lambda s: getattr(s.rolling(w, min_periods=1), agg)()))
    if agg != "mean":
        r = r.astype(np.int64)
    return (pd.DataFrame({"id": srt["id"], "roll": r})
            .sort_values("id").reset_index(drop=True))


@pytest.mark.parametrize("agg", ["mean", "min", "max", "count"])
@pytest.mark.parametrize("n_blocks,w", [(1, 3), (7, 4)])
def test_rolling_agg_matches_pandas(agg, n_blocks, w):
    from datacapsule_ray.functions.window import rolling_agg

    rng = np.random.default_rng(47)
    n = 300
    df = pd.DataFrame({
        "g": rng.integers(0, 9, size=n),
        "ts": rng.integers(0, 40, size=n),
        "id": np.arange(n),
        "v": rng.integers(-100, 100, size=n).astype(np.int64),
    })
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = rolling_agg(ds, group_col="g", order_cols=["ts", "id"],
                      value_col="v", w=w, id_col="id", agg=agg,
                      out_col="roll").to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _ref_agg(df, w, agg),
                                  check_dtype=False)


# --- RANGE (time) frame ------------------------------------------------------

def _ref_range(df: pd.DataFrame, delta: int, agg: str) -> pd.DataFrame:
    """Brute-force per-row SQL RANGE semantics (peers included)."""
    out = np.empty(len(df),
                   dtype=np.float64 if agg == "mean" else np.int64)
    srt = df.sort_values(["g", "ts", "id"], kind="stable").reset_index(drop=True)
    for i in range(len(srt)):
        g, t = srt.loc[i, "g"], srt.loc[i, "ts"]
        win = srt[(srt["g"] == g) & (srt["ts"] >= t - delta)
                  & (srt["ts"] <= t)]
        out[i] = (win["v"].sum() if agg == "sum"
                  else len(win) if agg == "count"
                  else win["v"].min() if agg == "min"
                  else win["v"].max() if agg == "max"
                  else np.int64(win["v"].sum()) / np.int64(len(win)))
    name = f"range_{agg}"
    return (pd.DataFrame({"id": srt["id"], name: out})
            .sort_values("id").reset_index(drop=True))


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max", "mean"])
@pytest.mark.parametrize("n_blocks", [1, 8])
def test_rolling_range_matches_bruteforce(agg, n_blocks):
    """Heavy ts ties: peers straddling block boundaries are the case the
    peer-head channel exists for."""
    from datacapsule_ray.functions.window import rolling_range_agg

    rng = np.random.default_rng(53)
    n = 250
    df = pd.DataFrame({
        "g": rng.integers(0, 6, size=n),
        "ts": rng.integers(0, 30, size=n).astype(np.int64),  # many ties
        "id": np.arange(n),
        "v": rng.integers(-50, 50, size=n).astype(np.int64),
    })
    name = f"range_{agg}"
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = rolling_range_agg(ds, group_col="g", ts_col="ts",
                            value_col=None if agg == "count" else "v",
                            delta=5, id_col="id", agg=agg,
                            out_col=name).to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _ref_range(df, 5, agg),
                                  check_dtype=False)


def test_rolling_range_single_giant_group_timestamps():
    """One group, timestamp[us] column, every boundary within delta."""
    from datacapsule_ray.functions.window import rolling_range_agg

    n = 128
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.arange(n) * 7, unit="s")
    df = pd.DataFrame({"g": np.zeros(n, dtype=np.int64), "ts": ts,
                       "id": np.arange(n),
                       "v": np.arange(n, dtype=np.int64)})
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(10)
    delta_us = 21 * 1_000_000  # 3 rows back
    got = rolling_range_agg(ds, group_col="g", ts_col="ts", value_col="v",
                            delta=delta_us, id_col="id", agg="sum",
                            out_col="s").to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    ref = (pd.Series(np.arange(n, dtype=np.int64))
           .rolling(4, min_periods=1).sum().astype(np.int64))
    assert got["s"].tolist() == ref.tolist()


@pytest.mark.parametrize("n_blocks,n_types", [(1, 5), (8, 5), (6, 150)])
def test_rolling_range_ndistinct_matches_bruteforce(n_blocks, n_types):
    """COUNT(DISTINCT v) OVER RANGE: low-cardinality strings plus a
    >64-code case that exercises the chunked prefix-sum path."""
    from datacapsule_ray.functions.window import rolling_range_agg

    rng = np.random.default_rng(67)
    n = 250
    df = pd.DataFrame({
        "g": rng.integers(0, 6, size=n),
        "ts": rng.integers(0, 30, size=n).astype(np.int64),  # many ties
        "id": np.arange(n),
        "v": [f"t{i}" for i in rng.integers(0, n_types, size=n)],
    })
    srt = df.sort_values(["g", "ts", "id"], kind="stable").reset_index(drop=True)
    ref = np.empty(n, dtype=np.int64)
    for i in range(n):
        g, t = srt.loc[i, "g"], srt.loc[i, "ts"]
        win = srt[(srt["g"] == g) & (srt["ts"] >= t - 5) & (srt["ts"] <= t)]
        ref[i] = win["v"].nunique()
    expect = (pd.DataFrame({"id": srt["id"], "nd": ref})
              .sort_values("id").reset_index(drop=True))
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = rolling_range_agg(ds, group_col="g", ts_col="ts", value_col="v",
                            delta=5, id_col="id", agg="ndistinct",
                            out_col="nd").to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


# --- navigation / ranking windows --------------------------------------------

@pytest.mark.parametrize("kind", ["lag", "lead"])
@pytest.mark.parametrize("n_blocks,offset", [(1, 1), (8, 1), (8, 3)])
def test_lag_lead_matches_pandas(kind, n_blocks, offset):
    from datacapsule_ray.functions.window import lag_lead

    rng = np.random.default_rng(61)
    n = 300
    df = pd.DataFrame({
        "g": rng.integers(0, 8, size=n),
        "ts": rng.integers(0, 40, size=n),
        "id": np.arange(n),
        "v": rng.integers(-100, 100, size=n).astype(np.int64),
    })
    srt = df.sort_values(["g", "ts", "id"], kind="stable")
    shift = offset if kind == "lag" else -offset
    ref = (srt.groupby("g", sort=False)["v"].shift(shift)
           .fillna(-1).astype(np.int64))
    ref = (pd.DataFrame({"id": srt["id"], "nav": ref})
           .sort_values("id").reset_index(drop=True))
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = lag_lead(ds, group_col="g", order_cols=["ts", "id"],
                   value_col="v", offset=offset, kind=kind, id_col="id",
                   default=-1).to_pandas().sort_values("id")
    assert got["nav"].tolist() == ref["nav"].tolist()


def test_lag_null_default_stays_int64():
    """default=None: missing predecessors are NULLS in an int64 column —
    never a float64 promotion (ids/cents above 2^53 would corrupt)."""
    from datacapsule_ray.functions.window import lag_lead

    n = 64
    df = pd.DataFrame({"g": np.repeat([1, 2], n // 2),
                       "ts": np.tile(np.arange(n // 2), 2),
                       "id": np.arange(n),
                       "v": np.arange(n, dtype=np.int64)})
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(6)
    out = lag_lead(ds, group_col="g", order_cols=["ts", "id"],
                   value_col="v", offset=1, kind="lag", id_col="id",
                   default=None)
    sch = dict(zip(out.schema().names, out.schema().types))
    assert str(sch["nav"]) == "int64"
    got = out.to_pandas().sort_values("id").reset_index(drop=True)
    assert got["nav"].isna().sum() == 2  # one per group head
    assert got.loc[1, "nav"] == 0  # second row of group 1 sees the first


@pytest.mark.parametrize("n_blocks", [1, 7, 16])
def test_row_number_matches_pandas(n_blocks):
    from datacapsule_ray.functions.window import row_number

    rng = np.random.default_rng(71)
    n = 400
    df = pd.DataFrame({
        "g": rng.integers(0, 5, size=n),  # few groups → runs span blocks
        "ts": rng.integers(0, 50, size=n),
        "id": np.arange(n),
    })
    srt = df.sort_values(["g", "ts", "id"], kind="stable")
    ref = srt.groupby("g", sort=False).cumcount() + 1
    ref = (pd.DataFrame({"id": srt["id"], "rn": ref})
           .sort_values("id").reset_index(drop=True))
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = (row_number(ds, group_col="g", order_cols=["ts", "id"],
                      id_col="id").to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert got["rn"].tolist() == ref["rn"].tolist()


def test_row_number_single_giant_group():
    """One group across every block exercises the offset chain's
    single-run carry accumulation."""
    from datacapsule_ray.functions.window import row_number

    n = 333
    df = pd.DataFrame({"g": np.zeros(n, dtype=np.int64),
                       "ts": np.arange(n), "id": np.arange(n)})
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(11)
    got = (row_number(ds, group_col="g", order_cols=["ts", "id"],
                      id_col="id").to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert got["rn"].tolist() == list(range(1, n + 1))


@pytest.mark.parametrize("method,pd_method", [("rank", "min"),
                                              ("dense_rank", "dense")])
@pytest.mark.parametrize("n_blocks", [1, 9])
def test_rank_window_matches_pandas(method, pd_method, n_blocks):
    """Heavy value ties (few distinct values, few groups) so tie groups
    recur and span block boundaries — the carry's merge path."""
    from datacapsule_ray.functions.window import rank_window

    rng = np.random.default_rng(83)
    n = 400
    df = pd.DataFrame({
        "g": rng.integers(0, 4, size=n),
        "id": np.arange(n),
        "v": rng.integers(0, 7, size=n).astype(np.int64),  # massive ties
    })
    ref = (df.groupby("g")["v"].rank(method=pd_method).astype(np.int64))
    ref = (pd.DataFrame({"id": df["id"], "rnk": ref})
           .sort_values("id").reset_index(drop=True))
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = (rank_window(ds, group_col="g", order_cols=["v"], id_col="id",
                       method=method).to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert got["rnk"].tolist() == ref["rnk"].tolist()


def test_rank_window_single_value_giant_group():
    """One group, ONE value everywhere: a single tie group spanning every
    block — rank must stay 1 for all rows (the fnd==1 merged carry)."""
    from datacapsule_ray.functions.window import rank_window

    n = 200
    df = pd.DataFrame({"g": np.zeros(n, dtype=np.int64),
                       "id": np.arange(n),
                       "v": np.full(n, 42, dtype=np.int64)})
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    for method in ("rank", "dense_rank"):
        got = rank_window(ds, group_col="g", order_cols=["v"], id_col="id",
                          method=method).to_pandas()
        assert got["rnk"].tolist() == [1] * n


@pytest.mark.parametrize("n_blocks", [1, 9])
def test_running_sum_matches_pandas(n_blocks):
    from datacapsule_ray.functions.window import running_sum

    rng = np.random.default_rng(97)
    n = 350
    df = pd.DataFrame({
        "g": rng.integers(0, 4, size=n),
        "ts": rng.integers(0, 50, size=n),
        "id": np.arange(n),
        "v": rng.integers(-100, 100, size=n).astype(np.int64),
    })
    srt = df.sort_values(["g", "ts", "id"], kind="stable")
    ref = srt.groupby("g", sort=False)["v"].cumsum()
    ref = (pd.DataFrame({"id": srt["id"], "rs": ref})
           .sort_values("id").reset_index(drop=True))
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = (running_sum(ds, group_col="g", order_cols=["ts", "id"],
                       value_col="v", id_col="id", out_col="rs")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["rs"].tolist() == ref["rs"].tolist()


def test_running_sum_single_giant_group():
    from datacapsule_ray.functions.window import running_sum

    n = 300
    df = pd.DataFrame({"g": np.zeros(n, dtype=np.int64),
                       "ts": np.arange(n), "id": np.arange(n),
                       "v": np.ones(n, dtype=np.int64)})
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(12)
    got = (running_sum(ds, group_col="g", order_cols=["ts", "id"],
                       value_col="v", id_col="id", out_col="rs")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["rs"].tolist() == list(range(1, n + 1))


@pytest.mark.parametrize("n_blocks", [1, 8])
@pytest.mark.parametrize("k", [1, 3, 4])
def test_ntile_matches_sql_rule(n_blocks, k):
    from datacapsule_ray.functions.window import ntile

    rng = np.random.default_rng(101)
    n = 230  # group sizes NOT divisible by k → the r remainder path
    df = pd.DataFrame({
        "g": rng.integers(0, 5, size=n),
        "ts": rng.integers(0, 60, size=n),
        "id": np.arange(n),
    })
    srt = df.sort_values(["g", "ts", "id"], kind="stable")
    rn = srt.groupby("g", sort=False).cumcount().to_numpy() + 1
    gn = srt.groupby("g", sort=False)["g"].transform("size").to_numpy()
    q, r = gn // k, gn % k
    big = r * (q + 1)
    ref = np.where(rn <= big, (rn - 1) // np.maximum(q + 1, 1) + 1,
                   r + (rn - big - 1) // np.maximum(q, 1) + 1)
    ref = (pd.DataFrame({"id": srt["id"], "tile": ref.astype(np.int64)})
           .sort_values("id").reset_index(drop=True))
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = (ntile(ds, group_col="g", order_cols=["ts", "id"], id_col="id",
                 k=k).to_pandas().sort_values("id").reset_index(drop=True))
    assert got["tile"].tolist() == ref["tile"].tolist()


def test_percent_rank_matches_pandas():
    from datacapsule_ray.functions.window import percent_rank

    rng = np.random.default_rng(103)
    n = 260
    df = pd.DataFrame({
        "g": rng.integers(0, 5, size=n),
        "id": np.arange(n),
        "v": rng.integers(0, 9, size=n).astype(np.int64),  # heavy ties
    })
    gn = df.groupby("g")["g"].transform("size")
    rnk = df.groupby("g")["v"].rank(method="min")
    ref = ((rnk - 1) / (gn - 1).clip(lower=1)).to_numpy()
    ref = (pd.DataFrame({"id": df["id"], "p": ref})
           .sort_values("id").reset_index(drop=True))
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(7)
    got = (percent_rank(ds, group_col="g", order_cols=["v"], id_col="id",
                        out_col="p").to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert np.allclose(got["p"].to_numpy(), ref["p"].to_numpy(), atol=0)


def test_rmq_kernel_matches_numpy():
    """Sparse-table RMQ vs per-query numpy over random [lo, hi)."""
    from datacapsule_ray.functions.window import _rmq

    rng = np.random.default_rng(71)
    v = rng.integers(-10**9, 10**9, size=500).astype(np.int64)
    lo = rng.integers(0, 500, size=2000)
    hi = np.minimum(lo + rng.integers(1, 64, size=2000), 500)
    lo = np.minimum(lo, hi - 1)
    for is_min in (True, False):
        got = _rmq(v, lo, hi, is_min=is_min)
        want = np.array([(v[a:b].min() if is_min else v[a:b].max())
                         for a, b in zip(lo, hi)])
        assert (got == want).all()
    # single-element and full-array windows
    assert _rmq(v, np.array([0]), np.array([500]), is_min=True)[0] == v.min()
    assert _rmq(v, np.array([7]), np.array([8]), is_min=False)[0] == v[7]


@pytest.mark.parametrize("n_blocks", [1, 8])
def test_cume_dist_matches_pandas(n_blocks):
    from datacapsule_ray.functions.window import cume_dist

    rng = np.random.default_rng(83)
    n = 300
    df = pd.DataFrame({
        "g": rng.integers(0, 7, size=n),
        "id": np.arange(n),
        "v": rng.integers(0, 20, size=n).astype(np.int64),  # heavy ties
    })
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = (cume_dist(ds, group_col="g", order_cols=["v"], id_col="id",
                     out_col="cd").to_pandas()
           .sort_values("id").reset_index(drop=True))
    ref = (df.groupby("g")["v"].rank(method="max", pct=True)
           .rename("cd"))  # pandas max-rank pct == SQL CUME_DIST
    want = (pd.DataFrame({"id": df["id"], "cd": ref})
            .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
