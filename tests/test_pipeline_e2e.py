"""Golden end-to-end conformance (SURVEY.md §5.2-§5.4): the distributed
pipeline must reproduce the sequential oracle's triple set exactly
(P/R = 1.0 target for deterministic extractors), plus node merge, edge
dedup, star schema, and the span pass-through invariant."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datacapsule_ray import fixtures
from datacapsule_ray.oracle import build_oracle
from datacapsule_ray.pipelines.build_graph import KGPipeline


@pytest.fixture(scope="module")
def built(mid_corpus, tmp_path_factory):
    d, files = mid_corpus
    ckpt = str(tmp_path_factory.mktemp("ckpt_mid"))
    pipe = KGPipeline(ckpt, emitter_concurrency=2)
    out = pipe.run_all(files, files_per_partition=1)
    return pipe, out


@pytest.fixture(scope="module")
def oracle_mid():
    recs = fixtures.records(134, seed=42)
    doc_ids = [f"doc-{i:08d}" for i in range(134)]
    return build_oracle(recs, doc_ids)


def test_triples_exact_match(built, oracle_mid):
    _, out = built
    got = sorted(
        tuple(r)
        for r in out["triples"].to_pandas()[
            ["subj", "pred", "obj", "subj_type", "obj_type", "doc_id"]
        ].itertuples(index=False)
    )
    want = sorted(oracle_mid.triples)
    # P/R report (BASELINE target >= 0.95; deterministic extractor -> 1.0)
    gs, ws = set(got), set(want)
    inter = len(gs & ws)
    precision = inter / max(1, len(gs))
    recall = inter / max(1, len(ws))
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert got == want


def test_edges_dedup(built, oracle_mid):
    _, out = built
    df = out["edges"].to_pandas()
    got = {(r.src, r.rel, r.dst): r.n_dups for r in df.itertuples(index=False)}
    assert got == oracle_mid.edges


def test_nodes_merge(built, oracle_mid):
    _, out = built
    df = out["nodes"].to_pandas()
    got = {
        r.node_id: (r.node_type, r.name, r.中文学名, r.拉丁学名, r.命名年份, r.作者)
        for r in df.itertuples(index=False)
    }
    want = {}
    for node_id, (ntype, name, attrs, _p, _s) in oracle_mid.nodes.items():
        want[node_id] = (
            ntype, name,
            attrs.get("中文学名"), attrs.get("拉丁学名"),
            attrs.get("命名年份"), attrs.get("作者"),
        )
    assert got == want


def test_adjacency_consistent(built, oracle_mid):
    _, out = built
    adj = out["adjacency"].to_pandas()
    # union of adjacency chunks == edge set; degrees match
    edges = set()
    for r in adj.itertuples(index=False):
        for item in r.adj:
            edges.add((r.src, item["rel"], item["dst"]))
    assert edges == set(oracle_mid.edges.keys())
    deg = adj.groupby("src")["degree"].first()
    from collections import Counter

    want_deg = Counter(src for src, _, _ in oracle_mid.edges)
    assert dict(deg) == dict(want_deg)


def test_adjacency_join_strategy_matches_broadcast(built, oracle_mid):
    """The hash-join degree path (planet-scale) must produce the same
    edge set and degrees as the broadcast path."""
    from datacapsule_ray.stages.graph import build_adjacency

    pipe, out = built
    edges = pipe.store.read_stage("edges", columns=["src", "rel", "dst"])
    adj = build_adjacency(edges, degree_strategy="join",
                          join_partitions=2).to_pandas()
    got = set()
    for r in adj.itertuples(index=False):
        for item in r.adj:
            got.add((r.src, item["rel"], item["dst"]))
    assert got == set(oracle_mid.edges.keys())
    from collections import Counter

    want_deg = Counter(src for src, _, _ in oracle_mid.edges)
    deg = adj.groupby("src")["degree"].first()
    assert dict(deg) == dict(want_deg)


def test_star_schema(built, oracle_mid):
    _, out = built
    species = out["species"].to_pandas().sort_values("species_id")
    want_species = sorted(oracle_mid.species_rows, key=lambda r: r["species_id"])
    assert len(species) == len(want_species) == 134
    for got_row, want_row in zip(species.to_dict("records"), want_species):
        for k, v in want_row.items():
            g = got_row[k]
            if v is None:
                assert g is None or (isinstance(g, float) and g != g), (k, g)
            else:
                assert g == v, (k, g, v)

    dist = out["distributions"].to_pandas()
    got_d = sorted(map(tuple, dist[["species_id", "location"]].itertuples(index=False)))
    want_d = sorted((r["species_id"], r["location"]) for r in oracle_mid.distribution_rows)
    assert got_d == want_d

    traits = out["numerical_traits"].to_pandas()
    got_t = sorted(map(tuple, traits.itertuples(index=False)))
    want_t = sorted(
        (r["species_id"], r["trait_type"], r["trait_name"], r["value"], r["unit"])
        for r in oracle_mid.trait_rows
    )
    assert got_t == want_t

    desc = out["descriptions"].to_pandas()
    got_de = sorted(map(tuple, desc.itertuples(index=False)))
    want_de = sorted(
        (r["species_id"], r["description_type"], r["content"])
        for r in oracle_mid.description_rows
    )
    assert got_de == want_de


def test_span_passthrough_invariant(built, mid_corpus):
    """Per-row invariant: output span sequence (kind, text, media_ref,
    order) byte-equals the input (BASELINE.json input_hint)."""
    pipe, out = built
    _, files = mid_corpus
    inp = pa.concat_tables([pq.read_table(f, columns=["doc_id", "spans"]) for f in files])
    got = out["records"].to_pandas()[["doc_id", "spans"]]
    got_map = {
        r.doc_id: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans]
        for r in got.itertuples(index=False)
    }
    inp_df = inp.to_pandas()
    for r in inp_df.itertuples(index=False):
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans]
        assert got_map[r.doc_id] == want


def test_lineage_present(built):
    pipe, _ = built
    rows = pipe.lineage()
    stages = {r["stage"] for r in rows}
    assert {"records", "emissions", "edges", "nodes"} <= stages
    for r in rows:
        assert r["rows_out"] >= 0 and r["wall_ms"] >= 0 and r["content_hash"]


def test_node_type_histogram(built, oracle_mid):
    from collections import Counter

    from datacapsule_ray.stages.graph import node_type_histogram

    _, out = built
    hist = node_type_histogram(out["nodes"]).to_pandas()
    got = dict(zip(hist["node_type"], hist["count()"]))
    want = Counter(v[0] for v in oracle_mid.nodes.values())
    assert got == dict(want)
    assert got["种"] == 134
    assert got["界"] == 1
