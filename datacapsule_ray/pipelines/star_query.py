"""SQL access to the materialized star schema — the data half of the
reference's NL→SQL channel (A6, dspy_query_db.py:24-148).

The reference generates SQL with an LLM and runs it on SQLite; the LLM
part is serving-side and out of scope (SURVEY.md §2.3), but the contract
it depends on — a queryable species/distributions/numerical_traits/
descriptions schema — is this module: DuckDB views over the pipeline's
parquet checkpoints, plus the reference's canned statistical queries
(e.g. distinct families, dspy_query_db.py:64-67) as ready functions.
"""

from __future__ import annotations

import duckdb

STAR_TABLES = ("species", "distributions", "numerical_traits", "descriptions")


def connect_star(ckpt_root: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the four star tables registered as views
    over the pipeline's parquet checkpoint directories."""
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{ckpt_root}/{t}/part-*/*.parquet')")
    return con


def query_star(ckpt_root: str, sql: str):
    """Run an arbitrary statistical query (G8) over the star schema."""
    con = connect_star(ckpt_root)
    try:
        return con.sql(sql).arrow()  # materialize while the connection lives
    finally:
        con.close()


def distinct_families(ckpt_root: str):
    """SELECT DISTINCT family (dspy_query_db.py:64-67 parity)."""
    return query_star(ckpt_root,
                      "SELECT DISTINCT family FROM species ORDER BY family")


def species_count_by_family(ckpt_root: str):
    return query_star(ckpt_root, """
        SELECT family, COUNT(*) AS n_species
        FROM species GROUP BY family ORDER BY family""")


def avg_trait_by_type(ckpt_root: str):
    return query_star(ckpt_root, """
        SELECT trait_type, trait_name, COUNT(*) AS n,
               ROUND(AVG(value), 4) AS avg_value, unit
        FROM numerical_traits
        GROUP BY trait_type, trait_name, unit
        ORDER BY trait_type, trait_name, unit""")
