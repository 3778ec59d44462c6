"""Driver-style correctness harness: run every ``queries()`` entry that
has an ``oracle_sql()`` twin and compare row count, schema (column
names), and an order-insensitive value hash — the same comparison the
external driver performs at sf=0.01. Runs here at sf0.001 for speed."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from tests.conftest import SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name, con):
    ray_df = _canon(_to_df(entrymod.queries()[name](SF_DIR)))
    sql_df = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"schema mismatch: {list(ray_df.columns)} vs {list(sql_df.columns)}")
    assert len(ray_df) == len(sql_df), f"row count {len(ray_df)} vs {len(sql_df)}"
    # value comparison, order-insensitive (both canonically sorted)
    for col in ray_df.columns:
        a, b = ray_df[col], sql_df[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False,
                check_exact=False, rtol=0, atol=1e-9)
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), f"col {col}"


def test_all_oracle_keys_have_queries():
    q = entrymod.queries()
    missing = [k for k in entrymod.oracle_sql() if k not in q]
    assert not missing


def test_rows_only_queries_execute():
    """Queries without an oracle still must run and return a stable shape."""
    q = entrymod.queries()
    rows_only = [k for k in q if k not in entrymod.oracle_sql()
                 and not k.startswith("kg_")]  # kg_* covered by e2e suite
    for name in rows_only:
        df = _to_df(q[name](SF_DIR))
        assert df is not None and len(df.columns) >= 1, name
