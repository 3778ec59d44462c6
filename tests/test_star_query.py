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
