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
    out = np.empty(len(df), dtype=np.int64)
    srt = df.sort_values(["g", "ts", "id"], kind="stable").reset_index(drop=True)
    for i in range(len(srt)):
        g, t = srt.loc[i, "g"], srt.loc[i, "ts"]
        win = srt[(srt["g"] == g) & (srt["ts"] >= t - delta)
                  & (srt["ts"] <= t)]
        out[i] = win["v"].sum() if agg == "sum" else len(win)
    name = "range_sum" if agg == "sum" else "range_count"
    return (pd.DataFrame({"id": srt["id"], name: out})
            .sort_values("id").reset_index(drop=True))


@pytest.mark.parametrize("agg", ["sum", "count"])
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
    name = "range_sum" if agg == "sum" else "range_count"
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = rolling_range_agg(ds, group_col="g", ts_col="ts",
                            value_col="v" if agg == "sum" else None,
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
