"""Round-4b operators — partition-frame window edges (FIRST/LAST_VALUE),
exact grouped moments, ROLLUP — pinned against pandas/DuckDB references
under forced multi-file inputs so every block boundary is exercised
(the generic oracle test at sf0.001 reads one block per table)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datacapsule_ray.pipelines import relational as r


def _write_events(tmp_path, n=600, n_files=8, seed=7) -> str:
    """A synthetic sf_dir whose events table is split across n_files
    parquet fragments with users deliberately spanning fragments."""
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        # few users + shuffled file assignment => every user spans files
        "user_id": rng.integers(0, 7, size=n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 72 * 3600, size=n), unit="s"),
        "event_type": rng.choice(["click", "view", "purchase"], size=n),
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
    return _write_events(tmp_path_factory.mktemp("r4b"))


def test_first_last_value_multiblock(events_dir):
    sf_dir, df = events_dir
    got = (r.user_first_last_value(sf_dir).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    srt = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    cents = (srt["value"] * 100).round().astype(np.int64)
    g = pd.DataFrame({"user_id": srt["user_id"], "cents": cents}).groupby(
        "user_id", sort=True)
    want = pd.DataFrame({
        "user_id": np.array(sorted(df["user_id"].unique()), dtype=np.int64),
        "first_value_cents": g["cents"].first().to_numpy(),
        "last_value_cents": g["cents"].last().to_numpy(),
    })
    pd.testing.assert_frame_equal(got, want)


def test_first_last_value_single_user_spanning_all_blocks(tmp_path):
    """One user across every fragment: the whole result rides the
    driver fixup channel and must still pick the global first/last."""
    n, n_files = 200, 10
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.arange(n), unit="min"),
        "event_type": ["click"] * n,
        "value": np.linspace(1.0, 3.0, n).round(2),
        "props": ["{}"] * n,
    })
    d = os.path.join(tmp_path, "events.parquet")
    os.makedirs(d)
    rng = np.random.default_rng(3)
    order = rng.permutation(n)
    for i, part in enumerate(np.array_split(order, n_files)):
        pq.write_table(pa.Table.from_pandas(df.iloc[part],
                                            preserve_index=False),
                       os.path.join(d, f"part-{i}.parquet"))
    got = r.user_first_last_value(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got["first_value_cents"].iloc[0] == 100
    assert got["last_value_cents"].iloc[0] == 300


def test_events_value_stats_multiblock_vs_duckdb(events_dir):
    sf_dir, df = events_dir
    got = (r.events_value_stats(sf_dir).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", df)
    want = con.sql("""
        WITH s AS (
          SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(c) AS DOUBLE) AS sx, CAST(SUM(c*c) AS DOUBLE) AS sxx,
                 CAST(SUM(h) AS DOUBLE) AS sh, CAST(SUM(h*h) AS DOUBLE) AS shh,
                 CAST(SUM(c*h) AS DOUBLE) AS sxh
          FROM (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS c,
                       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h FROM events)
          GROUP BY event_type)
        SELECT event_type, CAST(n AS BIGINT) AS n_events,
               CAST(sx AS BIGINT) AS sum_value_cents,
               sqrt((n*sxx - sx*sx) / (n*(n-1))) AS stddev_cents,
               (n*sxh - sx*sh) / sqrt((n*sxx - sx*sx) * (n*shh - sh*sh))
                   AS corr_value_hour
        FROM s ORDER BY event_type
    """).df()
    # bit-identical floats: both sides evaluate the same IEEE tree over
    # the same exact integer sums (the hash-gate requirement)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_events_value_stats_matches_pandas_definitions(events_dir):
    """The mirrored-sum formulas really are STDDEV_SAMP / CORR (up to
    float tolerance) — guards against a silently wrong derivation."""
    sf_dir, df = events_dir
    got = (r.events_value_stats(sf_dir).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    cents = (df["value"] * 100).round().astype(np.int64)
    hour = df["ts"].dt.hour.astype(np.int64)
    by = pd.DataFrame({"event_type": df["event_type"], "c": cents,
                       "h": hour}).groupby("event_type", sort=True)
    np.testing.assert_allclose(got["stddev_cents"],
                               by["c"].std(ddof=1), rtol=1e-12)
    np.testing.assert_allclose(
        got["corr_value_hour"],
        by[["c", "h"]].apply(lambda g: g["c"].corr(g["h"])), rtol=1e-9)


def test_revenue_rollup_levels_consistent():
    sf_dir = "/root/testdata/sf0.001"
    out = r.revenue_rollup(sf_dir)
    finest = out[(out["l_returnflag"] != "ALL")
                 & (out["l_linestatus"] != "ALL")]
    lvl1 = out[(out["l_returnflag"] != "ALL")
               & (out["l_linestatus"] == "ALL")]
    total = out[(out["l_returnflag"] == "ALL")
                & (out["l_linestatus"] == "ALL")]
    assert len(total) == 1
    assert finest["revenue_cents"].sum() == total["revenue_cents"].iloc[0]
    assert lvl1["revenue_cents"].sum() == total["revenue_cents"].iloc[0]
    assert finest["n_rows"].sum() == total["n_rows"].iloc[0]
    # each returnflag subtotal equals the sum of its finest rows
    for rf, grp in finest.groupby("l_returnflag"):
        assert (lvl1.loc[lvl1["l_returnflag"] == rf, "revenue_cents"].iloc[0]
                == grp["revenue_cents"].sum())


# --- chunk-level (C4-style) cross-corpus dedup ------------------------------

def _write_docs(tmp_path, texts, n_files=4, seed=11):
    import ray.data as rd  # noqa: F401 - parity with other fixtures
    n = len(texts)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * n,
        "source": ["src0"] * n,
        "n_chars": [len(t) for t in texts],
    })
    d = os.path.join(tmp_path, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    for i, part in enumerate(np.array_split(order, n_files)):
        pq.write_table(pa.Table.from_pandas(df.iloc[part],
                                            preserve_index=False),
                       os.path.join(d, f"part-{i}.parquet"))
    return str(tmp_path), df


def _chunk_ref(df, width=3, min_df=2):
    """Sequential reference: per-doc disjoint word windows, drop chunks
    in >= min_df distinct docs, reassemble."""
    rows = []
    for _, r_ in df.iterrows():
        w = r_["text"].split(" ")
        for ci in range(-(-len(w) // width)):
            rows.append((r_["doc_id"], ci,
                         " ".join(w[ci * width:(ci + 1) * width])))
    cdf = pd.DataFrame(rows, columns=["doc_id", "ci", "chunk"])
    dfreq = cdf.groupby("chunk")["doc_id"].nunique()
    hot = set(dfreq[dfreq >= min_df].index)
    cdf["keep"] = (~cdf["chunk"].isin(hot)).astype(int)
    out = []
    for doc, g in cdf.groupby("doc_id"):
        g = g.sort_values("ci")
        kept = g[g["keep"] == 1]["chunk"].tolist()
        if kept:
            out.append((doc, " ".join(kept), len(kept),
                        int((g["keep"] == 0).sum())))
    return pd.DataFrame(out, columns=["doc_id", "text_clean", "n_kept",
                                      "n_removed"]).reset_index(drop=True)


_BOILER = "copyright acme corp all rights reserved"  # 2 chunks at width 3


@pytest.fixture(scope="module")
def chunk_docs(tmp_path_factory):
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = []
    for i in range(40):
        body = " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        texts.append(f"{_BOILER} {body}" if i % 3 == 0 else body)
    texts.append(_BOILER)          # doc that is ONLY boilerplate → dropped
    return _write_docs(tmp_path_factory.mktemp("chunks"), texts)


def test_chunk_dedup_matches_reference(chunk_docs):
    from datacapsule_ray.functions.chunkdedup import chunk_dedup
    import ray.data as rd
    sf_dir, df = chunk_docs
    got = (chunk_dedup(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                       columns=["doc_id", "text"]),
                       width=3, min_df=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _chunk_ref(df, width=3, min_df=2)
    pd.testing.assert_frame_equal(got, want)
    # the pure-boilerplate doc is gone, the boilerplate never survives
    assert 40 not in set(got["doc_id"])
    assert not got["text_clean"].str.contains("copyright").any()


def test_chunk_dedup_join_fallback_parity(chunk_docs):
    """broadcast_limit=0 forces the distributed LEFT ANTI path; output
    must be identical to the broadcast path."""
    from datacapsule_ray.functions.chunkdedup import chunk_dedup
    import ray.data as rd
    sf_dir, df = chunk_docs
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    a = (chunk_dedup(ds, width=3, min_df=2)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (chunk_dedup(ds, width=3, min_df=2, broadcast_limit=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_chunk_dedup_no_hot_chunks(tmp_path):
    """min_df above every df: output reassembles every doc unchanged."""
    from datacapsule_ray.functions.chunkdedup import chunk_dedup
    import ray.data as rd
    texts = ["one two three four five", "six seven eight", "nine ten"]
    sf_dir, df = _write_docs(tmp_path, texts, n_files=2)
    got = (chunk_dedup(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                       columns=["doc_id", "text"]),
                       width=3, min_df=99)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["text_clean"].tolist() == texts
    assert (got["n_removed"] == 0).all()


# --- cohort retention / z-score / CUBE / semi-join --------------------------

def test_weekly_retention_multiblock(events_dir):
    sf_dir, df = events_dir
    got = (r.user_weekly_retention(sf_dir).to_pandas()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    week = (df["ts"].values.astype("datetime64[D]").astype(np.int64) // 7)
    tmp = pd.DataFrame({"user_id": df["user_id"], "week": week})
    firsts = tmp.groupby("user_id")["week"].min().rename("cohort_week")
    j = tmp.join(firsts, on="user_id")
    j["week_offset"] = j["week"] - j["cohort_week"]
    want = (j.groupby(["cohort_week", "week_offset"])["user_id"].nunique()
            .rename("n_users").reset_index()
            .sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: week-0 retention covers every user exactly once per cohort
    assert (got.groupby("cohort_week").apply(
        lambda g: g.loc[g["week_offset"] == g["week_offset"].min(),
                        "n_users"].iloc[0] > 0,
        include_groups=False)).all()


def test_zscore_multiblock_bitexact(events_dir):
    sf_dir, df = events_dir
    got = (r.events_value_zscore(sf_dir).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", df)
    want = con.sql("""
        WITH s AS (
          SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(c) AS DOUBLE) AS sx, CAST(SUM(c*c) AS DOUBLE) AS sxx
          FROM (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS c
                FROM events) GROUP BY event_type)
        SELECT e.event_id,
               (CAST(CAST(ROUND(e.value*100) AS BIGINT) AS DOUBLE) - s.sx/s.n)
               / sqrt((s.n*s.sxx - s.sx*s.sx) / (s.n*(s.n-1))) AS value_z
        FROM events e JOIN s USING (event_type) ORDER BY e.event_id
    """).df()
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # and it really is a z-score: per-type mean ~0, sample std ~1
    z = got.set_index("event_id")["value_z"]
    by = df.set_index("event_id").loc[z.index, "event_type"]
    for _, grp in z.groupby(by.values):
        assert abs(grp.mean()) < 1e-9
        assert abs(grp.std(ddof=1) - 1.0) < 1e-9


def test_cube_is_rollup_plus_linestatus_level():
    cube = r.revenue_cube("/root/testdata/sf0.001")
    roll = r.revenue_rollup("/root/testdata/sf0.001")
    # the rollup rows are a subset; the extra level is (ALL, linestatus)
    merged = cube.merge(roll, how="outer", indicator=True,
                        on=list(cube.columns))
    extra = merged[merged["_merge"] == "left_only"]
    assert (extra["l_returnflag"] == "ALL").all()
    assert (extra["l_linestatus"] != "ALL").all()
    total = cube[(cube["l_returnflag"] == "ALL")
                 & (cube["l_linestatus"] == "ALL")]
    assert extra["revenue_cents"].sum() == total["revenue_cents"].iloc[0]


def test_semi_anti_partition_customers():
    """semi ∪ anti = all customers, semi ∩ anti = ∅."""
    from datacapsule_ray.traverse import gather_table
    sf = "/root/testdata/sf0.001"
    witho = gather_table(r.customers_with_orders(sf)).to_pandas()
    without = gather_table(r.customers_without_orders(sf)).to_pandas()
    import pyarrow.parquet as _pq
    n_cust = _pq.read_metadata(f"{sf}/customer.parquet").num_rows
    assert len(witho) + len(without) == n_cust
    assert not set(witho["c_custkey"]) & set(without["c_custkey"])


# --- Bloom membership sketch -------------------------------------------------

def test_bloom_no_false_negatives_and_sane_fp_rate():
    from datacapsule_ray.functions.bloom import (bloom_contains,
                                                 _hash_pairs,
                                                 _probe_positions)
    import numpy as np
    members = pa.array([f"member-{i}" for i in range(500)])
    others = pa.array([f"other-{i}" for i in range(5000)])
    n_bits, k = 1 << 12, 4  # deliberately tight: ~8 bits/key
    bm = np.zeros(n_bits // 8, dtype=np.uint8)
    pos = _probe_positions(_hash_pairs(members), n_bits, k).reshape(-1)
    np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                     (1 << (pos & np.uint64(7))).astype(np.uint8))
    assert bloom_contains(bm, members, k=k).all()          # never FN
    fp = bloom_contains(bm, others, k=k).mean()
    assert 0 < fp < 0.3  # tight filter DOES false-positive, but sanely


def test_incremental_dedup_bloom_matches_plain_with_planted_dups(tmp_path):
    """Planted cross-parity dups force the bloom-hit branch and the
    exact verification join; output must equal the plain anti-join."""
    from datacapsule_ray.pipelines.docops import (incremental_dedup_bloom,
                                                  incremental_dedup_docs)
    rng = np.random.default_rng(9)
    vocab = ["red", "blue", "green", "gold"]
    texts = [" ".join(rng.choice(vocab, size=6)) + f" u{i}"
             for i in range(60)]
    for odd in (1, 7, 21, 33):          # odd doc duplicates an even doc
        texts[odd] = texts[odd - 1]
    sf_dir, _ = _write_docs(tmp_path, texts, n_files=3)
    a = (incremental_dedup_docs(sf_dir).to_pandas()["doc_id"]
         .sort_values().tolist())
    b = (incremental_dedup_bloom(sf_dir).to_pandas()["doc_id"]
         .sort_values().tolist())
    assert a == b
    assert 1 not in b and 7 not in b and 21 not in b and 33 not in b
    assert 3 in b  # a non-dup odd doc survives


def test_bloom_build_merges_across_blocks():
    from datacapsule_ray.functions.bloom import bloom_build, bloom_contains
    import ray.data as rd
    vals = [f"v{i}" for i in range(300)]
    ds = rd.from_arrow(pa.table({"s": pa.array(vals)})).repartition(7)
    bm = bloom_build(ds, "s")
    assert bloom_contains(bm, pa.array(vals)).all()


# --- fixed-point integer PageRank -------------------------------------------

def _pagerank_ref(edges, iters=3, unit=10**9):
    """Sequential reference of the fixed-point spec."""
    from collections import defaultdict
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    base = (15 * unit) // 100
    pr = {n: unit for n in nodes}
    for _ in range(iters):
        nxt = {n: base for n in nodes}
        for s, d in edges:
            nxt[d] += (pr[s] * 85) // (100 * outdeg[s])
        pr = nxt
    return pr


@pytest.mark.parametrize("n_blocks", [1, 5])
def test_pagerank_matches_sequential_reference(n_blocks):
    from datacapsule_ray.functions.pagerank import pagerank_fixed
    import ray.data as rd
    rng = np.random.default_rng(17)
    names = [f"n{i}" for i in range(40)]
    edges = sorted({(names[a], names[b])
                    for a, b in rng.integers(0, 40, size=(300, 2))
                    if a != b})
    # a dangling node (out-edges none, in-edges some) and a pure source
    edges.append(("n0", "sink"))
    edges.append(("source_only", "n1"))
    ds = rd.from_arrow(pa.table({
        "src": [s for s, _ in edges], "dst": [d for _, d in edges],
    })).repartition(n_blocks)
    got = (pagerank_fixed(ds, src_col="src", dst_col="dst", iters=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    ref = _pagerank_ref(edges)
    want = (pd.DataFrame({"node": list(ref), "pr": list(ref.values())})
            .sort_values("node").reset_index(drop=True))
    want["pr"] = want["pr"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    # dangling sink keeps receiving; pure source settles at base
    assert ref["source_only"] == 150000000


def test_pagerank_mass_is_conserved_up_to_floor_loss():
    """Total pr stays <= N*unit and > damped lower bound: floor loss
    and dangling leakage only ever REMOVE mass (spec sanity)."""
    from datacapsule_ray.functions.pagerank import pagerank_fixed
    import ray.data as rd
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    ds = rd.from_arrow(pa.table({"src": [s for s, _ in edges],
                                 "dst": [d for _, d in edges]}))
    got = pagerank_fixed(ds, iters=3).to_pandas()
    unit = 10**9
    assert got["pr"].sum() <= 3 * unit
    assert got["pr"].sum() > int(3 * unit * 0.5)


# --- set ops / MAD / distributed range join ---------------------------------

@pytest.fixture(scope="module")
def setop_events(tmp_path_factory):
    """Synthetic events where the click/purchase user sets genuinely
    differ (the driver tables are degenerate: every user does both)."""
    n = 300
    rng = np.random.default_rng(23)
    uid = rng.integers(0, 30, size=n).astype(np.int64)
    et = np.where(uid < 10, "click",            # 0-9 click only
                  np.where(uid < 20, "purchase",  # 10-19 purchase only
                           rng.choice(["click", "purchase"], size=n)))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": uid,
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 96 * 3600, size=n), unit="s"),
        "event_type": et,
        "value": rng.integers(0, 5000, size=n).astype(np.float64) / 100.0,
        "props": ["{}"] * n,
    })
    tmp = tmp_path_factory.mktemp("setops")
    d = os.path.join(tmp, "events.parquet")
    os.makedirs(d)
    order = rng.permutation(n)
    for i, part in enumerate(np.array_split(order, 5)):
        pq.write_table(pa.Table.from_pandas(df.iloc[part],
                                            preserve_index=False),
                       os.path.join(d, f"part-{i}.parquet"))
    return str(tmp), df


def test_set_ops_intersect_except(setop_events):
    sf_dir, df = setop_events
    clicks = set(df.loc[df.event_type == "click", "user_id"])
    purch = set(df.loc[df.event_type == "purchase", "user_id"])
    both = sorted(r.users_click_and_purchase(sf_dir)
                  .to_pandas()["user_id"])
    only = sorted(r.users_click_not_purchase(sf_dir)
                  .to_pandas()["user_id"])
    assert both == sorted(clicks & purch)
    assert only == sorted(clicks - purch)
    assert only and both  # non-degenerate fixture


def test_events_value_mad_matches_reference(setop_events):
    sf_dir, df = setop_events
    got = r.events_value_mad(sf_dir)
    cents = (df["value"] * 100).round().astype(np.int64)
    for _, row in got.iterrows():
        c = np.sort(cents[df["event_type"] == row["event_type"]].to_numpy())
        med = c[-(-len(c) // 2) - 1]  # quantile_disc(0.5): ceil(n/2)-th
        assert row["median_cents"] == med
        a = np.sort(np.abs(c - med))
        assert row["mad_cents"] == a[-(-len(a) // 2) - 1]


def test_range_join_dist_matches_broadcast():
    sf = "/root/testdata/sf0.001"
    a = (r.events_in_windows(sf).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (r.events_in_windows_dist(sf).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    a["window_start"] = a["window_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
