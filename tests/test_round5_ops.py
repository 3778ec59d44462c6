"""Round-5 operator additions: GROUPING SETS (the arbitrary-subset
generalization of the ROLLUP/CUBE one-shuffle re-aggregation —
VERDICT r4 item 8)."""

import duckdb
import numpy as np
import pandas as pd

from datacapsule_ray.pipelines import relational as r

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="stable").reset_index(drop=True)


def test_revenue_grouping_sets_matches_duckdb():
    got = r.revenue_grouping_sets(SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    want = con.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               COALESCE(CAST(ship_year AS VARCHAR), 'ALL') AS ship_year,
               CAST(SUM(rev_c) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_rows
        FROM (SELECT l_returnflag, l_linestatus,
                     CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
                         AS ship_year,
                     CAST(ROUND(l_extendedprice*(1-l_discount)*100)
                          AS BIGINT) AS rev_c
              FROM lineitem)
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag, ship_year),
                                (ship_year), ())
    """).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_exact=True)


def test_grouping_sets_internal_consistency():
    out = r.revenue_grouping_sets(SF)
    total = out[(out["l_returnflag"] == "ALL")
                & (out["l_linestatus"] == "ALL")
                & (out["ship_year"] == "ALL")]
    assert len(total) == 1
    # each requested set partitions the fact table, so each sums to the
    # grand total
    rf_ls = out[(out["l_returnflag"] != "ALL")
                & (out["l_linestatus"] != "ALL")]
    rf_y = out[(out["l_returnflag"] != "ALL")
               & (out["ship_year"] != "ALL")]
    y = out[(out["l_returnflag"] == "ALL")
            & (out["l_linestatus"] == "ALL")
            & (out["ship_year"] != "ALL")]
    for part in (rf_ls, rf_y, y):
        assert part["n_rows"].sum() == total["n_rows"].iloc[0]
        assert part["revenue_cents"].sum() == total["revenue_cents"].iloc[0]
    # measures come back as int64 (driver hash is representation-
    # sensitive)
    assert out["revenue_cents"].dtype == np.int64
    assert out["n_rows"].dtype == np.int64


def test_events_daily_unpivot_matches_duckdb():
    got = r.events_daily_unpivot(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.sql("""
        WITH p AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 COUNT(*) FILTER (event_type = 'click')    AS n_click,
                 COUNT(*) FILTER (event_type = 'view')     AS n_view,
                 COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                 COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
                 COUNT(*) FILTER (event_type = 'error')    AS n_error
          FROM events GROUP BY 1)
        SELECT day, substring(name, 3) AS event_type,
               CAST(value AS BIGINT) AS n_events
        FROM (UNPIVOT p ON n_click, n_view, n_purchase, n_signup, n_error
              INTO NAME name VALUE value)
    """).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_exact=True)
    # unpivot of the pivot is lossless: re-pivoting gives the wide table
    wide = r.events_daily_pivot(SF).to_pandas()
    back = got.pivot(index="day", columns="event_type",
                     values="n_events").reset_index()
    for ty in ["click", "view", "purchase", "signup", "error"]:
        merged = wide.merge(back, on="day")
        assert (merged[f"n_{ty}"] == merged[ty]).all()


def test_reaggregate_grouping_sets_arbitrary_subsets():
    """The helper handles sets that are neither a rollup nor a cube,
    on a synthetic finest grain."""
    finest = pd.DataFrame({
        "a": ["x", "x", "y", "y"],
        "b": ["1", "2", "1", "2"],
        "c": ["p", "p", "q", "q"],
        "m": [1, 2, 3, 4],
    })
    out = r._reaggregate_grouping_sets(
        finest, ["a", "b", "c"], (("a", "c"), ("b",)), ["m"])
    ac = out[(out["a"] != "ALL")].set_index(["a", "c"])["m"]
    assert ac.loc[("x", "p")] == 3 and ac.loc[("y", "q")] == 7
    b = out[(out["b"] != "ALL")].set_index("b")["m"]
    assert b.loc["1"] == 4 and b.loc["2"] == 6
    # no grand-total row was requested, so none appears
    assert not ((out["a"] == "ALL") & (out["b"] == "ALL")
                & (out["c"] == "ALL")).any()
