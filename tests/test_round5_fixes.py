"""Round-5 regression tests for the r4 ADVICE findings: the
empty-stage funnel crash, the trend-stats int64 overflow bound, the
skyline unsigned/bool sentinel, and the string-id minlabel distributed
path."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from datacapsule_ray.pipelines import relational as r


def _write_events_df(tmp_path, df) -> str:
    d = os.path.join(tmp_path, "events.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "part-0.parquet"))
    return str(tmp_path)


def _events_df(rows):
    return pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.array([u for u, _, _ in rows], dtype=np.int64),
        "ts": [t for _, t, _ in rows],
        "event_type": [e for _, _, e in rows],
        "value": np.zeros(len(rows)),
        "props": ["{}"] * len(rows),
    })


def test_funnel_zero_click_events_short_circuits(tmp_path):
    """A corpus with no 'click' events at all must yield [n, 0, 0],
    not crash Ray 2.49's hash join on a fully-empty side."""
    ts0 = pd.Timestamp("2024-01-01")
    rows = [(0, ts0, "view"), (1, ts0, "view"),
            (1, ts0 + pd.Timedelta(seconds=3), "purchase")]
    got = r.user_funnel_stages(_write_events_df(tmp_path, _events_df(rows)))
    assert got["n_users"].tolist() == [2, 0, 0]


def test_funnel_zero_converting_users_short_circuits(tmp_path):
    """Clicks exist but none strictly after a view: stage 2 converts 0
    users, and stage 3 must short-circuit instead of joining an empty
    prev side."""
    ts0 = pd.Timestamp("2024-01-01")
    rows = [
        # click precedes (or ties) the first view for every user
        (0, ts0 + pd.Timedelta(seconds=5), "view"), (0, ts0, "click"),
        (1, ts0, "view"), (1, ts0, "click"),
        (1, ts0 + pd.Timedelta(seconds=9), "purchase"),
    ]
    got = r.user_funnel_stages(_write_events_df(tmp_path, _events_df(rows)))
    assert got["n_users"].tolist() == [2, 0, 0]


def test_funnel_no_view_events_short_circuits(tmp_path):
    """Stage 1 itself empty: all three stages are 0."""
    ts0 = pd.Timestamp("2024-01-01")
    rows = [(0, ts0, "click"),
            (0, ts0 + pd.Timedelta(seconds=1), "purchase")]
    got = r.user_funnel_stages(_write_events_df(tmp_path, _events_df(rows)))
    assert got["n_users"].tolist() == [0, 0, 0]


def test_trend_stats_survive_wide_time_span(tmp_path):
    """Events spread over ~30 years with thousands of rows per user:
    the old seconds-since-epoch Σx² wrapped int64 here; the hour-bucket
    per-user-rebased stats must stay exact (vs a numpy int64-free
    object-dtype reference)."""
    n = 4000
    rng = np.random.default_rng(55)
    secs = np.sort(rng.integers(0, 30 * 365 * 24 * 3600, size=n))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(secs, unit="s"),
        "event_type": ["view"] * n,
        "value": rng.integers(0, 10000, size=n).astype(np.float64) / 100.0,
        "props": ["{}"] * n,
    })
    got = r.user_value_trend_stats(
        _write_events_df(tmp_path, df)).to_pandas()
    assert len(got) == 1
    x = (secs // 3600).astype(object)  # python ints: no wraparound
    x = x - min(x)
    y = np.round(df["value"].to_numpy() * 100).astype(np.int64).astype(object)
    row = got.iloc[0]
    assert row["n"] == n
    assert row["sum_x"] == sum(x)
    assert row["sum_y"] == sum(y)
    assert row["sum_xy"] == sum(a * b for a, b in zip(x, y))
    assert row["sum_x2"] == sum(a * a for a in x)
    assert row["sum_y2"] == sum(b * b for b in y)
    # and each reported value provably fits int64 (no silent wrap)
    for c in ("sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"):
        assert abs(int(row[c])) < np.iinfo(np.int64).max


def test_skyline_unsigned_zero_y_frontier_point():
    """uint y with y==0 in the max-x group: the old iinfo-min sentinel
    (0 for unsigned) dropped the point; it is on the frontier and must
    survive."""
    from datacapsule_ray.functions.skyline import pareto_front_2d

    t = pa.table({"x": pa.array([10, 3, 1], type=pa.uint32()),
                  "y": pa.array([0, 5, 7], type=pa.uint32())})
    got = pareto_front_2d(rd.from_arrow(t), x_col="x", y_col="y").to_pandas()
    assert sorted(zip(got["x"].tolist(), got["y"].tolist())) == \
        [(1, 7), (3, 5), (10, 0)]


def test_skyline_bool_y_column():
    """bool y raised in np.iinfo before the fix; dominance semantics
    hold (False in the max-x group survives only if on the frontier)."""
    from datacapsule_ray.functions.skyline import pareto_front_2d

    t = pa.table({"x": pa.array([5, 5, 2, 1], type=pa.int64()),
                  "y": pa.array([False, True, True, False])})
    got = pareto_front_2d(rd.from_arrow(t), x_col="x", y_col="y").to_pandas()
    # (5, True) dominates (5, False), (2, True) and (1, False)
    assert sorted(zip(got["x"].tolist(), got["y"].tolist())) == [(5, True)]


def test_minlabel_string_ids_distributed_path():
    """String node ids through the forced join-rounds path (the old
    label-sum convergence check errored on strings); must equal the
    driver path and exact CC."""
    from datacapsule_ray.functions.minlabel import minlabel_components

    edges = [("ant", "bee"), ("bee", "cat"), ("dog", "eel"), ("fox", "ant")]
    t = pa.table({"id_a": pa.array([a for a, _ in edges]),
                  "id_b": pa.array([b for _, b in edges])})
    ds = rd.from_arrow(t).repartition(2)
    dist = (minlabel_components(ds, rounds=6, driver_limit=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    fast = (minlabel_components(ds, rounds=6).to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(dist, fast)
    want = {"ant": "ant", "bee": "ant", "cat": "ant", "fox": "ant",
            "dog": "dog", "eel": "dog"}
    assert dict(zip(dist["node"], dist["lbl"])) == want
