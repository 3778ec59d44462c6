"""Round-4c operators — PERCENTILE_CONT (interpolated grouped
quantiles), winsorized grouped mean, Gini–Simpson label diversity, and
the RANGE-frame AVG — pinned against DuckDB / pandas references under
forced multi-file inputs (the test_round4b_ops.py convention)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from datacapsule_ray.pipelines import relational as r


def _write_events(tmp_path, n=600, n_files=8, seed=11) -> str:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, size=n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 72 * 3600, size=n), unit="s"),
        "event_type": rng.choice(
            ["click", "view", "purchase", "signup", "error"], size=n),
        "value": rng.integers(0, 10000, size=n).astype(np.float64) / 100.0,
        "props": ["{}"] * n,
    })
    d = os.path.join(tmp_path, "events.parquet")
    os.makedirs(d, exist_ok=True)
    order = rng.permutation(n)
    for i, part in enumerate(np.array_split(order, n_files)):
        pq.write_table(pa.Table.from_pandas(df.iloc[part],
                                            preserve_index=False),
                       os.path.join(d, f"part-{i}.parquet"))
    return str(tmp_path), df


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    return _write_events(tmp_path_factory.mktemp("r4c"))


def _duck(df: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("events", df)
    return con.sql(sql).df()


def test_cont_quantiles_bitexact_vs_duckdb(events_dir):
    """quantile_cont parity must be BIT-exact (check_exact) — the
    float64 q*(n-1) rank rule, not just close interpolation."""
    sf_dir, df = events_dir
    got = (r.events_value_quantiles_cont(sf_dir)
           .sort_values("event_type").reset_index(drop=True))
    want = _duck(df, """
        SELECT event_type,
               quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.5)
                   AS median_cont_cents,
               quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.9)
                   AS p90_cont_cents
        FROM events GROUP BY event_type ORDER BY event_type
    """)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_cont_quantiles_interpolation_rule():
    """The DuckDB bracket: [1,2,4,8] q=0.95 → 7.399999999999999 (rank
    0.95*3 = 2.8499999999999996, NOT 2.85), q=0.5 → 3.0."""
    from datacapsule_ray.functions.quantiles import grouped_cont_quantiles

    ds = rd.from_arrow(pa.table({"k": ["a"] * 4,
                                 "v": pa.array([1, 2, 4, 8],
                                               type=pa.int64())}))
    out = grouped_cont_quantiles(ds, "k", "v",
                                 [(0.5, "p50"), (0.95, "p95")])
    assert out["p50"].iloc[0] == 3.0
    assert out["p95"].iloc[0] == 4 + (0.95 * 3 - 2) * 4  # 7.399999999999999


def test_cont_quantiles_rejects_bad_fraction():
    from datacapsule_ray.functions.quantiles import grouped_cont_quantiles

    ds = rd.from_arrow(pa.table({"k": ["a"], "v": pa.array([1])}))
    with pytest.raises(ValueError):
        grouped_cont_quantiles(ds, "k", "v", [(1.5, "bad")])


def test_winsorized_matches_reference(events_dir):
    """Clip each value into its type's exact [p05, p95] quantile_disc
    band, then mean — vs a DuckDB mirror of the whole composition."""
    sf_dir, df = events_dir
    got = (r.events_value_winsorized(sf_dir).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    want = _duck(df, """
        WITH e AS (SELECT event_type,
                          CAST(ROUND(value*100) AS BIGINT) AS c
                   FROM events),
             q AS (SELECT event_type,
                          quantile_disc(c, 0.05) AS lo,
                          quantile_disc(c, 0.95) AS hi
                   FROM e GROUP BY event_type)
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(GREATEST(q.lo, LEAST(q.hi, e.c)))
                   AS BIGINT) AS wsum_cents,
               CAST(SUM(GREATEST(q.lo, LEAST(q.hi, e.c)))
                   AS DOUBLE) / COUNT(*) AS winsorized_mean_cents
        FROM e JOIN q USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type
    """)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_winsorized_band_actually_clips(events_dir):
    """The winsorized mean must differ from the raw mean when the band
    excludes tails (guards against a no-op clip)."""
    sf_dir, df = events_dir
    got = r.events_value_winsorized(sf_dir).to_pandas()
    raw = (df.assign(c=(df["value"] * 100).round().astype(np.int64))
           .groupby("event_type")["c"].mean())
    merged = got.set_index("event_type")["winsorized_mean_cents"]
    assert any(abs(merged[k] - raw[k]) > 1e-9 for k in raw.index)


def test_type_diversity_matches_reference(events_dir):
    sf_dir, df = events_dir
    got = (r.user_type_diversity(sf_dir).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    rows = []
    for uid, sub in df.groupby("user_id"):
        cnt = sub["event_type"].value_counts()
        n = int(cnt.sum())
        ssq = int((cnt.astype(np.int64) ** 2).sum())
        rows.append({"user_id": uid, "n_events": n,
                     "type_diversity": 1.0 - ssq / (n * n)})
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_type_diversity_extremes():
    """Single-type user → 0.0 exactly; uniform 5-type user → 0.8."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        n = 10
        df = pd.DataFrame({
            "event_id": np.arange(2 * n, dtype=np.int64),
            "user_id": np.repeat([0, 1], n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(2 * n), unit="s"),
            "event_type": ["click"] * n + ["click", "error", "purchase",
                                           "signup", "view"] * 2,
            "value": np.ones(2 * n), "props": ["{}"] * (2 * n),
        })
        d = os.path.join(tmp, "events.parquet")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(d, "part-0.parquet"))
        got = (r.user_type_diversity(tmp).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        assert got["type_diversity"].tolist() == [0.0, 0.8]


def _streak_ref(df: pd.DataFrame) -> pd.DataFrame:
    """Pandas gaps-and-islands reference."""
    days = (df.assign(d=df["ts"].dt.floor("D").astype("int64")
                      // 86_400_000_000_000)
            .drop_duplicates(["user_id", "d"])
            .sort_values(["user_id", "d"]))
    rows = []
    for uid, sub in days.groupby("user_id"):
        d = sub["d"].to_numpy()
        best = cur = 1
        for i in range(1, len(d)):
            cur = cur + 1 if d[i] == d[i - 1] + 1 else 1
            best = max(best, cur)
        rows.append({"user_id": uid, "max_streak_days": best})
    return pd.DataFrame(rows)


def test_day_streaks_multiblock(events_dir):
    sf_dir, df = events_dir
    got = (r.user_day_streaks(sf_dir).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _streak_ref(df), check_dtype=False)


def test_day_streaks_single_user_chained_across_blocks(tmp_path):
    """One user, 60 days with planted gaps after day 9 and day 34
    (streaks 10 / 25 / 23), one day per parquet fragment: every
    fragment is an edge run and the driver fold must CHAIN islands
    across many fragments to find the 25."""
    days = np.concatenate([np.arange(0, 10),        # 10-day streak
                           np.arange(12, 37),       # 25-day streak
                           np.arange(40, 63)])      # 23-day streak
    n = len(days)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(days * 24, unit="h")
        + pd.to_timedelta(np.arange(n) % 7, unit="min"),
        "event_type": ["click"] * n,
        "value": np.ones(n), "props": ["{}"] * n,
    })
    d = os.path.join(tmp_path, "events.parquet")
    os.makedirs(d)
    for i in range(n):  # one day per fragment
        pq.write_table(pa.Table.from_pandas(df.iloc[[i]],
                                            preserve_index=False),
                       os.path.join(d, f"part-{i:03d}.parquet"))
    got = r.user_day_streaks(str(tmp_path)).to_pandas()
    assert got["max_streak_days"].tolist() == [25]


def test_day_streaks_interleaved_users_with_gaps(tmp_path):
    """Two users interleaved across 6 fragments, different gap
    placements; pinned against the pandas reference."""
    rng = np.random.default_rng(5)
    recs = []
    eid = 0
    for uid, present in ((0, [0, 1, 2, 5, 6, 7, 8, 20]),
                         (1, [3, 4, 5, 6, 10, 11, 30, 31, 32, 33])):
        for day in present:
            for _ in range(rng.integers(1, 4)):  # dup events per day
                recs.append({"event_id": eid, "user_id": uid,
                             "ts": pd.Timestamp("2024-03-01")
                             + pd.to_timedelta(day * 24, unit="h")
                             + pd.to_timedelta(
                                 int(rng.integers(0, 86399)), unit="s"),
                             "event_type": "view", "value": 1.0,
                             "props": "{}"})
                eid += 1
    df = pd.DataFrame(recs)
    d = os.path.join(tmp_path, "events.parquet")
    os.makedirs(d)
    order = rng.permutation(len(df))
    for i, part in enumerate(np.array_split(order, 6)):
        pq.write_table(pa.Table.from_pandas(df.iloc[part],
                                            preserve_index=False),
                       os.path.join(d, f"part-{i}.parquet"))
    got = (r.user_day_streaks(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert got["max_streak_days"].tolist() == [4, 4]


# --- degree-split exact triangle counting -----------------------------------

def _tri(edges, deg_cap=64, n_blocks=1):
    from datacapsule_ray.functions.triangles import triangle_count_lowdeg

    t = pa.table({"id_a": pa.array([a for a, _ in edges],
                                   type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges],
                                   type=pa.int64())})
    ds = rd.from_arrow(t).repartition(n_blocks)
    return triangle_count_lowdeg(ds, deg_cap=deg_cap).to_pandas().iloc[0]


def _clique(nodes):
    return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]


@pytest.mark.parametrize("n_blocks", [1, 6])
def test_triangles_clique_plus_path(n_blocks):
    """K5 (10 edges, 10 triangles) + a 3-node path (0 triangles)."""
    edges = _clique([0, 1, 2, 3, 4]) + [(10, 11), (11, 12)]
    row = _tri(edges, n_blocks=n_blocks)
    assert row["n_edges"] == 12
    assert row["n_nodes"] == 8
    assert row["n_hub_nodes"] == 0
    assert row["n_triangles_low"] == 10
    # K5 wedges under the total order: sum C(outdeg,2) over outdegs
    # 4,3,2,1,0 = 6+3+1 = 10. The path's center has only IN-edges
    # under degree orientation, so it contributes no oriented wedge —
    # compact-forward wedges are out-edge pairs, not all 2-paths
    assert row["n_wedges_low"] == 10


def test_triangles_hub_split_excludes_high_degree():
    """A star hub of degree 8 is excluded at cap=4; the K4 hanging off
    two leaves still counts its 4 triangles."""
    hub_edges = [(100, i) for i in range(8)]          # hub deg 8
    k4 = _clique([0, 1, 2, 3])                        # deg 3+... <= cap
    edges = hub_edges + k4
    row = _tri(edges, deg_cap=4)
    assert row["n_hub_nodes"] == 1
    assert row["n_edges_low"] == len(k4)
    assert row["n_triangles_low"] == 4
    assert row["n_edges"] == len(edges)


def test_triangles_join_fallback_matches_broadcast():
    """broadcast_cap=0 forces the two-hash-join degree attach; results
    must be identical to the broadcast path."""
    from datacapsule_ray.functions.triangles import triangle_count_lowdeg

    edges = _clique([0, 1, 2, 3, 4]) + [(10, 11), (11, 12)] + \
        [(100, i) for i in range(8)]
    t = pa.table({"id_a": pa.array([a for a, _ in edges],
                                   type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges],
                                   type=pa.int64())})
    ds = rd.from_arrow(t).repartition(4)
    bc = triangle_count_lowdeg(ds, deg_cap=4).to_pandas()
    jn = triangle_count_lowdeg(ds, deg_cap=4,
                               broadcast_cap=0).to_pandas()
    pd.testing.assert_frame_equal(bc, jn)


def test_triangles_open_wedges_not_counted():
    """Two triangles sharing an edge: 2 triangles, wedge count from
    the degree-ordered orientation."""
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    row = _tri(edges)
    assert row["n_triangles_low"] == 2


def test_range_avg_is_exact_sum_over_count(events_dir):
    """range_avg == range_sum / range_count row-for-row (the exact-int
    division rule), on the multi-file input."""
    sf_dir, _ = events_dir
    avg = (r.user_range_avg_30m(sf_dir).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    s = (r.user_range_sum_30m(sf_dir).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    c = (r.user_range_count_30m(sf_dir).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    want = s["range_sum_cents"].to_numpy() / c["range_n_events"].to_numpy()
    assert avg["range_avg_cents"].to_numpy().tolist() == want.tolist()


def test_user_funnel_stages_vs_duckdb(events_dir):
    """Ordered funnel counts on the multi-file events input."""
    sf_dir, df = events_dir
    got = r.user_funnel_stages(sf_dir)
    want = _duck(df, """
        WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
             t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2
                    FROM events e JOIN t1 USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts > t1.ts1
                    GROUP BY e.user_id),
             t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3
                    FROM events e JOIN t2 USING (user_id)
                    WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
                    GROUP BY e.user_id)
        SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
        UNION ALL SELECT '2_click_after_view', CAST(COUNT(*) AS BIGINT) FROM t2
        UNION ALL SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM t3
    """)
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # monotone: each stage can only lose users
    n = got["n_users"].to_numpy()
    assert n[0] >= n[1] >= n[2] >= 0


def test_funnel_strictly_after_semantics(tmp_path):
    """A click AT the first view's ts must NOT convert (strict >); a
    later purchase converts only off a qualifying click."""
    ts0 = pd.Timestamp("2024-01-01")
    rows = [
        # user 0: view@0, click@0 (tie -> no), click@5 (yes), purchase@9
        (0, ts0, "view"), (0, ts0, "click"),
        (0, ts0 + pd.Timedelta(seconds=5), "click"),
        (0, ts0 + pd.Timedelta(seconds=9), "purchase"),
        # user 1: purchase precedes click -> stage3 no
        (1, ts0, "view"), (1, ts0 + pd.Timedelta(seconds=1), "purchase"),
        (1, ts0 + pd.Timedelta(seconds=2), "click"),
        # user 2: no view at all
        (2, ts0, "click"), (2, ts0 + pd.Timedelta(seconds=1), "purchase"),
    ]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.array([u for u, _, _ in rows], dtype=np.int64),
        "ts": [t for _, t, _ in rows],
        "event_type": [e for _, _, e in rows],
        "value": np.zeros(len(rows)),
        "props": ["{}"] * len(rows),
    })
    d = os.path.join(tmp_path, "events.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "part-0.parquet"))
    got = r.user_funnel_stages(str(tmp_path))
    assert got["n_users"].tolist() == [2, 2, 1]


def test_events_value_outliers_flags_planted_spike(tmp_path):
    """A planted 100x spike in an otherwise tight distribution must be
    the only flagged row."""
    n = 200
    rng = np.random.default_rng(5)
    vals = rng.integers(990, 1011, size=n).astype(np.float64) / 100.0
    vals[17] = 999.99
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.arange(n), unit="s"),
        "event_type": ["click"] * n,
        "value": vals,
        "props": ["{}"] * n,
    })
    d = os.path.join(tmp_path, "events.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "part-0.parquet"))
    got = (r.events_value_outliers(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["is_outlier"].sum() == 1
    assert got.loc[17, "is_outlier"] == 1


def test_embedding_dim_stats_partials_merge_exactly(tmp_path):
    """Per-dimension integer moments: multi-file distributed partials
    must equal a single-pass numpy reference bit-for-bit."""
    from datacapsule_ray.pipelines.docops import embedding_dim_stats

    rng = np.random.default_rng(23)
    n, d = 300, 16
    mat = rng.standard_normal((n, d)).astype(np.float32)
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row for row in mat],
        "label": np.zeros(n, dtype=np.int32),
    })
    dd = os.path.join(tmp_path, "embeddings.parquet")
    os.makedirs(dd, exist_ok=True)
    for i, part in enumerate(np.array_split(np.arange(n), 5)):
        t = pa.table({
            "vec_id": pa.array(df["vec_id"].iloc[part]),
            "embedding": pa.array([mat[j] for j in part],
                                  type=pa.list_(pa.float32())),
            "label": pa.array(df["label"].iloc[part]),
        })
        pq.write_table(t, os.path.join(dd, f"part-{i}.parquet"))
    got = (embedding_dim_stats(str(tmp_path), dim=d).to_pandas()
           .sort_values("i").reset_index(drop=True))
    f64 = mat.astype(np.float64)
    q6 = np.trunc(f64 * 1e6 + np.copysign(0.5, f64)).astype(np.int64)
    q3 = np.trunc(f64 * 1e3 + np.copysign(0.5, f64)).astype(np.int64)
    assert got["sum_e6"].to_numpy().tolist() == q6.sum(axis=0).tolist()
    assert got["sumsq_e3"].to_numpy().tolist() == (q3 * q3).sum(axis=0).tolist()
    assert (got["n"] == n).all()


# --- 2-D skyline --------------------------------------------------------------

def _brute_skyline(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any((bx >= x and by >= y and (bx > x or by > y))
                        for j, (bx, by) in enumerate(pts) if j != i)
        if not dominated:
            out.append((x, y))
    return sorted(out)


@pytest.mark.parametrize("n_blocks", [1, 6])
def test_pareto_front_matches_bruteforce(n_blocks):
    from datacapsule_ray.functions.skyline import pareto_front_2d

    rng = np.random.default_rng(41)
    n = 400
    x = rng.integers(0, 50, size=n).astype(np.int64)
    y = rng.integers(0, 50, size=n).astype(np.int64)
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(x), "y": pa.array(y)})
    ds = rd.from_arrow(t).repartition(n_blocks)
    got = pareto_front_2d(ds, x_col="x", y_col="y").to_pandas()
    want = _brute_skyline(list(zip(x.tolist(), y.tolist())))
    assert sorted(zip(got["x"], got["y"])) == want


def test_pareto_front_keeps_duplicate_frontier_points():
    """Exact duplicates of a frontier point do not dominate each other:
    all survive (the SQL NOT-EXISTS strict-dominance rule)."""
    from datacapsule_ray.functions.skyline import pareto_front_2d

    t = pa.table({"id": pa.array([0, 1, 2, 3], type=pa.int64()),
                  "x": pa.array([10, 10, 5, 1], type=pa.int64()),
                  "y": pa.array([3, 3, 9, 1], type=pa.int64())})
    got = pareto_front_2d(rd.from_arrow(t).repartition(2),
                          x_col="x", y_col="y").to_pandas()
    assert sorted(got["id"].tolist()) == [0, 1, 2]


def test_pareto_front_anticorrelated_worst_case():
    """Every point on the frontier (x + y = const): nothing may be
    pruned, in any partitioning."""
    from datacapsule_ray.functions.skyline import pareto_front_2d

    n = 100
    x = np.arange(n, dtype=np.int64)
    t = pa.table({"x": pa.array(x), "y": pa.array(n - 1 - x)})
    got = pareto_front_2d(rd.from_arrow(t).repartition(7),
                          x_col="x", y_col="y").to_pandas()
    assert len(got) == n


# --- k-core peeling ------------------------------------------------------------

def _kcore_pd(edges, k, rounds):
    e = list(edges)
    for _ in range(rounds):
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        e2 = [(a, b) for a, b in e if a in keep and b in keep]
        if len(e2) == len(e):
            break
        e = e2
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return dict(sorted(deg.items()))


@pytest.mark.parametrize("n_blocks", [1, 4])
def test_kcore_clique_survives_chain_peels(n_blocks):
    """A 4-clique is its own 2-core; a path hanging off it peels away
    one endpoint per round (exercises multi-round iteration)."""
    from datacapsule_ray.functions.kcore import kcore

    clique = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    path = [(3, 10), (10, 11), (11, 12)]
    edges = clique + path
    t = pa.table({"id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges], type=pa.int64())})
    got = (kcore(rd.from_arrow(t).repartition(n_blocks), k=2, rounds=4)
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = _kcore_pd(edges, 2, 4)
    assert dict(zip(got["node"], got["deg"])) == want
    assert set(got["node"]) == {0, 1, 2, 3}        # the clique only
    assert (got["deg"] == 3).all()


def test_kcore_k3_empties_sparse_graph():
    """No triangle-dense region: the 3-core is empty and the engine
    returns an empty (node, deg) table, not an error."""
    from datacapsule_ray.functions.kcore import kcore

    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]  # 4-cycle: 2-core, no 3-core
    t = pa.table({"id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges], type=pa.int64())})
    got = kcore(rd.from_arrow(t).repartition(2), k=3, rounds=4).to_pandas()
    assert len(got) == 0
    cyc = kcore(rd.from_arrow(t).repartition(2), k=2, rounds=4).to_pandas()
    assert sorted(cyc["node"]) == [0, 1, 2, 3] and (cyc["deg"] == 2).all()


def test_kcore_random_matches_reference():
    from datacapsule_ray.functions.kcore import kcore

    rng = np.random.default_rng(59)
    pairs = set()
    while len(pairs) < 120:
        a, b = rng.integers(0, 40, size=2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    edges = sorted(pairs)
    t = pa.table({"id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges], type=pa.int64())})
    got = kcore(rd.from_arrow(t).repartition(5), k=3, rounds=6).to_pandas()
    want = _kcore_pd(edges, 3, 6)
    assert dict(zip(got["node"], got["deg"])) == want


# --- bounded min-label propagation ---------------------------------------------

def _cc_pd(edges):
    import collections
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lbl = {}
    for s in adj:
        if s in lbl:
            continue
        comp = {s}
        frontier = {s}
        while frontier:
            nxt = set().union(*(adj[v] for v in frontier)) - comp
            comp |= nxt
            frontier = nxt
        m = min(comp)
        for v in comp:
            lbl[v] = m
    return dict(sorted(lbl.items()))


@pytest.mark.parametrize("n_blocks", [1, 5])
def test_minlabel_components_matches_exact_cc(n_blocks):
    """rounds >= eccentricity ==> bounded propagation == exact CC."""
    from datacapsule_ray.functions.minlabel import minlabel_components

    rng = np.random.default_rng(71)
    pairs = set()
    while len(pairs) < 80:
        a, b = rng.integers(0, 60, size=2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    edges = sorted(pairs)
    t = pa.table({"id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges], type=pa.int64())})
    got = (minlabel_components(rd.from_arrow(t).repartition(n_blocks),
                               rounds=60)  # >= any diameter here
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert dict(zip(got["node"], got["lbl"])) == _cc_pd(edges)


def test_minlabel_bounded_rounds_is_distance_capped():
    """On a path 0-1-2-3-4-5, after 2 rounds each node holds the min id
    within distance 2 — the defined (oracle-mirrorable) semantics."""
    from datacapsule_ray.functions.minlabel import minlabel_components

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    t = pa.table({"id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges], type=pa.int64())})
    got = (minlabel_components(rd.from_arrow(t).repartition(3), rounds=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert got["lbl"].tolist() == [0, 0, 0, 1, 2, 3]


def test_minlabel_early_stop_equals_full_rounds():
    """Label-sum early stop must not change the result (monotone
    labels: equal sum == converged)."""
    from datacapsule_ray.functions.minlabel import minlabel_components

    edges = [(0, 1), (1, 2), (10, 11)]
    t = pa.table({"id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges], type=pa.int64())})
    a = (minlabel_components(rd.from_arrow(t), rounds=2).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (minlabel_components(rd.from_arrow(t), rounds=50).to_pandas()
         .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_event_type_cooccurrence_vs_duckdb(events_dir):
    sf_dir, df = events_dir
    got = (r.event_type_cooccurrence(sf_dir).to_pandas()
           .sort_values(["type_a", "type_b"]).reset_index(drop=True))
    want = _duck(df, """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
             per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
                     FROM ut GROUP BY event_type)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both,
               ANY_VALUE(pa.n_users) AS n_a, ANY_VALUE(pb.n_users) AS n_b
        FROM ut a JOIN ut b ON a.user_id = b.user_id
                           AND a.event_type < b.event_type
        JOIN per pa ON pa.event_type = a.event_type
        JOIN per pb ON pb.event_type = b.event_type
        GROUP BY a.event_type, b.event_type
        ORDER BY type_a, type_b
    """)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_user_value_trend_stats_slope_recoverable(events_dir):
    """The six sufficient statistics must reproduce numpy's per-user
    OLS slope (the point of shipping them)."""
    sf_dir, df = events_dir
    got = (r.user_value_trend_stats(sf_dir).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    base = pd.Timestamp("2024-01-01")
    for _, row in got.iterrows():
        sub = df[df["user_id"] == row["user_id"]]
        # x = hour buckets rebased to the user's first event (the r5
        # int64-overflow-safe definition)
        x = (((sub["ts"] - base).dt.total_seconds() // 3600)
             .astype(np.int64).to_numpy())
        x = x - x.min()
        y = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
        n = len(sub)
        assert row["n"] == n
        num = row["n"] * row["sum_xy"] - row["sum_x"] * row["sum_y"]
        den = row["n"] * row["sum_x2"] - row["sum_x"] ** 2
        if den:
            slope = num / den
            want = np.polyfit(x, y, 1)[0]
            assert abs(slope - want) < 1e-6 * max(1.0, abs(want))


def test_kcore_driver_and_distributed_paths_agree():
    """The size probe must be invisible: driver_limit=0 (forced join
    rounds) == default (vectorized driver loop)."""
    from datacapsule_ray.functions.kcore import kcore

    rng = np.random.default_rng(83)
    pairs = set()
    while len(pairs) < 100:
        a, b = rng.integers(0, 35, size=2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    edges = sorted(pairs)
    t = pa.table({"id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges], type=pa.int64())})
    ds = rd.from_arrow(t).repartition(4)
    fast = (kcore(ds, k=3, rounds=5).to_pandas()
            .sort_values("node").reset_index(drop=True))
    dist = (kcore(ds, k=3, rounds=5, driver_limit=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist)


def test_minlabel_driver_and_distributed_paths_agree():
    from datacapsule_ray.functions.minlabel import minlabel_components

    rng = np.random.default_rng(89)
    pairs = set()
    while len(pairs) < 70:
        a, b = rng.integers(0, 50, size=2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    edges = sorted(pairs)
    t = pa.table({"id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                  "id_b": pa.array([b for _, b in edges], type=pa.int64())})
    ds = rd.from_arrow(t).repartition(3)
    fast = (minlabel_components(ds, rounds=4).to_pandas()
            .sort_values("node").reset_index(drop=True))
    dist = (minlabel_components(ds, rounds=4, driver_limit=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist)


def test_neardup_cluster_sizes_histogram_shape(tmp_path):
    """Planted corpus: one 3-doc near-dup clique + one pair + singletons
    -> histogram {3: 1, 2: 1}; singletons never appear (edge-touched
    nodes only)."""
    from datacapsule_ray.pipelines.docops import neardup_cluster_sizes

    texts = {
        0: "alpha beta gamma delta epsilon",
        1: "alpha beta gamma delta epsilon",
        2: "alpha beta gamma delta epsilon",
        10: "zeta eta theta iota kappa",
        11: "zeta eta theta iota kappa",
        20: "totally different words here now",
        21: "another unrelated document text",
    }
    df = pd.DataFrame({
        "doc_id": np.array(list(texts), dtype=np.int64),
        "text": list(texts.values()),
        "lang": ["en"] * len(texts),
        "source": ["src0"] * len(texts),
        "n_chars": np.array([len(t) for t in texts.values()],
                            dtype=np.int64),
    })
    d = os.path.join(tmp_path, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "part-0.parquet"))
    got = (neardup_cluster_sizes(str(tmp_path)).to_pandas()
           .sort_values("cluster_size").reset_index(drop=True))
    assert dict(zip(got["cluster_size"], got["n_clusters"])) == {2: 1, 3: 1}


def test_doc_oov_stats_planted_vocab(tmp_path):
    """min_df=3 vocabulary: tokens in >=3 docs are in-vocab; rare
    tokens count toward n_oov with their occurrence mass; an empty doc
    surfaces as (0, 0)."""
    from datacapsule_ray.pipelines.docops import doc_oov_stats

    texts = {
        0: "common common rare1",
        1: "common other",
        2: "common other",
        3: "other rare2 rare2",
        4: "",
    }
    df = pd.DataFrame({
        "doc_id": np.array(list(texts), dtype=np.int64),
        "text": list(texts.values()),
        "lang": ["en"] * len(texts),
        "source": ["src0"] * len(texts),
        "n_chars": np.array([len(t) for t in texts.values()],
                            dtype=np.int64),
    })
    d = os.path.join(tmp_path, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "part-0.parquet"))
    got = (doc_oov_stats(str(tmp_path), min_df=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # vocab: common (3 docs), other (3 docs); rare1/rare2 OOV
    assert got["n_tokens"].tolist() == [3, 2, 2, 3, 0]
    assert got["n_oov"].tolist() == [1, 0, 0, 2, 0]


def test_doc_oov_stats_all_in_vocab(tmp_path):
    """Fully-in-vocabulary corpus exercises the empty-OOV short
    circuit."""
    from datacapsule_ray.pipelines.docops import doc_oov_stats

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["same words here"] * 4,
        "lang": ["en"] * 4,
        "source": ["src0"] * 4,
        "n_chars": np.full(4, 15, dtype=np.int64),
    })
    d = os.path.join(tmp_path, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "part-0.parquet"))
    got = (doc_oov_stats(str(tmp_path), min_df=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["n_tokens"].tolist() == [3, 3, 3, 3]
    assert got["n_oov"].tolist() == [0, 0, 0, 0]


# --- Levenshtein<=1 fuzzy name join ---------------------------------------------

def _lev(a, b):
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[lb]


@pytest.mark.parametrize("n_blocks", [1, 4])
def test_lev1_pairs_match_bruteforce(n_blocks):
    """Random short strings incl. unicode: deletion-neighborhood join
    == brute-force levenshtein==1 over distinct names."""
    from datacapsule_ray.functions.fuzzyjoin import lev1_name_pairs

    rng = np.random.default_rng(97)
    alphabet = list("abcde") + ["é", "漢"]
    names = list({"".join(rng.choice(alphabet, size=rng.integers(1, 6)))
                  for _ in range(120)})
    t = pa.table({"name": pa.array(names * 2, type=pa.string())})  # dups
    got = (lev1_name_pairs(rd.from_arrow(t).repartition(n_blocks),
                           name_col="name").to_pandas())
    got_pairs = sorted(zip(got["name_a"], got["name_b"]))
    want = sorted((a, b) for i, a in enumerate(names)
                  for b in names[i + 1:] if _lev(a, b) == 1)
    want = sorted((min(a, b), max(a, b)) for a, b in want)
    assert got_pairs == want


def test_one_edit_mask_cases():
    from datacapsule_ray.functions.fuzzyjoin import (_one_edit_mask,
                                                     _utf32_matrix)

    names = ["abc", "abd", "ab", "abcd", "xbc", "abc", "ba", "b"]
    mat, lens = _utf32_matrix(names)
    cases = [
        (0, 1, True),   # substitution
        (0, 2, True),   # deletion (last)
        (0, 3, True),   # insertion (last)
        (0, 4, True),   # substitution (first)
        (0, 5, False),  # identical -> distance 0, not 1
        (2, 6, True),   # "ab" vs "ba": distance 2? no wait
        (6, 7, True),   # "ba" vs "b": delete last
    ]
    iu = np.array([a for a, _, _ in cases])
    ju = np.array([b for _, b, _ in cases])
    got = _one_edit_mask(mat, lens, iu, ju)
    # "ab" vs "ba" is distance 2 (swap) -> False
    want = [True, True, True, True, False, False, True]
    assert got.tolist() == want
