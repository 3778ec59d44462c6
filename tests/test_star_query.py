"""Star-schema SQL channel (A6 data contract): DuckDB over the pipeline's
checkpoints must agree with the oracle's row sets."""

import pytest

from datacapsule_ray import fixtures
from datacapsule_ray.oracle import build_oracle
from datacapsule_ray.pipelines.build_graph import KGPipeline
from datacapsule_ray.pipelines.star_query import (
    connect_star, distinct_families, species_count_by_family, query_star,
)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sq_corpus"))
    files = fixtures.write_corpus(d, 40, seed=6, docs_per_file=20)
    ck = str(tmp_path_factory.mktemp("sq_ck"))
    pipe = KGPipeline(ck)
    pipe.run_all(files, with_vectors=False)
    oracle = build_oracle(fixtures.records(40, seed=6),
                          [f"doc-{i:08d}" for i in range(40)])
    return ck, oracle


def test_distinct_families(built):
    ck, oracle = built
    got = distinct_families(ck).column("family").to_pylist()
    want = sorted({r["family"] for r in oracle.species_rows})
    assert got == want


def test_species_count_by_family(built):
    ck, oracle = built
    got = {r["family"]: r["n_species"]
           for r in species_count_by_family(ck).to_pylist()}
    from collections import Counter

    want = Counter(r["family"] for r in oracle.species_rows)
    assert got == dict(want)


def test_arbitrary_statistical_query(built):
    ck, oracle = built
    t = query_star(ck, "SELECT COUNT(*) AS n FROM distributions")
    assert t.column("n")[0].as_py() == len(oracle.distribution_rows)
    t2 = query_star(ck, """
        SELECT s.family, COUNT(d.location) AS n_locs
        FROM species s JOIN distributions d ON s.species_id = d.species_id
        GROUP BY s.family ORDER BY s.family""")
    assert t2.num_rows >= 1


def test_star_views_register(built):
    ck, _ = built
    con = connect_star(ck)
    tables = {r[0] for r in con.sql(
        "SELECT view_name FROM duckdb_views() WHERE NOT internal").fetchall()}
    assert {"species", "distributions", "numerical_traits", "descriptions"} <= tables


# --- NL→SQL generation (A6) -------------------------------------------------

def test_nl_query_count(built):
    from datacapsule_ray.pipelines.star_query import NLQueryEngine

    ck, oracle = built
    out = NLQueryEngine(ck).query_database("数据库里有多少种物种？")
    assert out["success"] and out["row_count"] == 1
    assert out["results"][0]["n_species"] == len(oracle.species_rows)
    assert out["sql"].upper().startswith("SELECT")
    assert out["explanation"]


def test_nl_query_location_uses_like(built):
    """The reference's hard rule: location matching MUST be LIKE '%…%'
    (dspy_query_db.py:27-28) — a species distributed in 东海 must be
    found even though its location strings can embed more context."""
    from datacapsule_ray.pipelines.star_query import NLQueryEngine

    ck, oracle = built
    eng = NLQueryEngine(ck)
    out = eng.query_database("分布在东海的物种有哪些？")
    assert out["success"]
    assert "LIKE '%东海%'" in out["sql"]
    want_ids = {r["species_id"] for r in oracle.distribution_rows
                if "东海" in r["location"]}
    want = sorted(r["chinese_name"] for r in oracle.species_rows
                  if r["species_id"] in want_ids)
    got = [r["chinese_name"] for r in out["results"]]
    assert got == want


def test_nl_query_by_family(built):
    from datacapsule_ray.pipelines.star_query import NLQueryEngine

    ck, oracle = built
    from collections import Counter

    out = NLQueryEngine(ck).query_database("各科的物种数量是多少？")
    assert out["success"]
    got = {r["family"]: r["n_species"] for r in out["results"]}
    assert got == dict(Counter(r["family"] for r in oracle.species_rows))


def test_nl_query_no_template_is_error_envelope(built):
    from datacapsule_ray.pipelines.star_query import NLQueryEngine

    ck, _ = built
    out = NLQueryEngine(ck).query_database("写一首关于海洋的诗")
    assert out["success"] is False and "error" in out


def test_nl_query_readonly_guard(built):
    from datacapsule_ray.pipelines.star_query import NLQueryEngine

    ck, _ = built

    class Evil:
        def generate(self, q, s):
            return "DROP TABLE species", "nope"

    out = NLQueryEngine(ck, generator=Evil()).query_database("x")
    assert out["success"] is False and "read-only" in out["error"]


def test_nl_query_guard_rejects_multistatement(built):
    """The read-only guard must use the PARSER: a 'SELECT 1; COPY ...'
    completion starts with SELECT but is two statements — duckdb's
    con.sql would execute both, so the guard must reject it (and any
    single non-SELECT statement) before execution."""
    from datacapsule_ray.pipelines.star_query import NLQueryEngine

    ck = built[0]

    class EvilGen:
        def __init__(self, sql):
            self.sql = sql

        def generate(self, q, schema):
            return self.sql, "evil"

    import os
    target = "/tmp/star_query_guard_should_not_exist.csv"
    if os.path.exists(target):
        os.remove(target)
    out = NLQueryEngine(ck, generator=EvilGen(
        f"SELECT 1; COPY (SELECT 42) TO '{target}'")).query_database("q")
    assert not out["success"]
    assert "read-only" in out["error"]
    assert not os.path.exists(target)
    out = NLQueryEngine(ck, generator=EvilGen(
        "DROP TABLE species")).query_database("q")
    assert not out["success"]


def test_nl_query_rules_escape_injection(built):
    """A question whose captured fragment contains a quote must not
    break out of the LIKE literal (the fragment is data, never SQL)."""
    from datacapsule_ray.pipelines.star_query import NLQueryEngine

    ck = built[0]
    out = NLQueryEngine(ck).query_database(
        "分布在x'; COPY (SELECT 1) TO '/tmp/inj.csv'; --的物种")
    # either a clean empty result or a parse error envelope — but never
    # a second executed statement
    import os
    assert not os.path.exists("/tmp/inj.csv")
    if out["success"]:
        assert out["row_count"] == 0
