"""GraphML export round-trip (S2): the exported graph must reload with
identical node/edge sets and attributes."""

import pyarrow as pa

from datacapsule_ray import fixtures
from datacapsule_ray.export import write_graphml
from datacapsule_ray.oracle import build_oracle


def test_graphml_roundtrip(tmp_path):
    import networkx as nx

    recs = fixtures.records(20, seed=4)
    g = build_oracle(recs, [f"doc-{i:08d}" for i in range(20)])
    nodes = pa.table({
        "node_id": list(g.nodes),
        "node_type": [v[0] for v in g.nodes.values()],
        "name": [v[1] for v in g.nodes.values()],
    })
    edges = pa.table({
        "src": [e[0] for e in g.edges],
        "rel": [e[1] for e in g.edges],
        "dst": [e[2] for e in g.edges],
    })

    class _DS:  # minimal Dataset-like shim
        def __init__(self, t):
            self._t = t

        def to_pandas(self):
            return self._t.to_pandas()

    path = str(tmp_path / "g.graphml")
    n = write_graphml(_DS(nodes), _DS(edges), path)
    assert n == len(g.nodes)

    back = nx.read_graphml(path)
    assert set(back.nodes) == set(g.nodes)
    assert {(u, v) for u, v in back.edges} == {(e[0], e[2]) for e in g.edges}
    some_species = recs[0]["中文学名"]
    assert back.nodes[some_species]["node_type"] == "种"
    # edge relation attribute preserved
    rels = nx.get_edge_attributes(back, "relation")
    assert rels[(recs[0]["属"], some_species)] == "包含"
