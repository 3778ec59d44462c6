"""Traversal-layer tests (J2-J5 parity): hierarchy-monotonic DFS over the
materialized graph must answer the reference's recall-tool queries."""

import pyarrow as pa
import pytest

from datacapsule_ray import fixtures
from datacapsule_ray.oracle import build_oracle
from datacapsule_ray.traverse import GraphIndex, expand_frontier


@pytest.fixture(scope="module")
def graph():
    recs = fixtures.records(60, seed=9)
    doc_ids = [f"doc-{i:08d}" for i in range(60)]
    g = build_oracle(recs, doc_ids)
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
    return GraphIndex(nodes, edges), g, recs


def test_get_node_attribute(graph):
    gi, g, recs = graph
    a = gi.get_node_attribute(recs[0]["中文学名"])
    assert a["node_type"] == "种"


def test_species_to_family(graph):
    gi, g, recs = graph
    sp = recs[3]["中文学名"]
    found = gi.find_nodes_by_node_type(sp, "科")
    assert found == {recs[3]["科"]}


def test_family_to_species(graph):
    gi, g, recs = graph
    fam = recs[0]["科"]
    want = {r["中文学名"] for r in recs if r["科"] == fam}
    found = gi.find_nodes_by_node_type(fam, "种")
    assert found == want


def test_species_to_locations(graph):
    gi, g, recs = graph
    sp = recs[1]["中文学名"]
    # oracle: the 分布于 targets of this species
    want = {e[2] for e in g.edges if e[0] == sp and e[1] == "分布于"}
    found = gi.find_nodes_by_node_type(sp, "自然分布地")
    assert found == want


def test_kingdom_reaches_all_species(graph):
    gi, g, recs = graph
    found = gi.find_nodes_by_node_type("动物界", "种")
    assert found == {r["中文学名"] for r in recs}


def test_batch_find(graph):
    gi, g, recs = graph
    sps = [recs[0]["中文学名"], recs[1]["中文学名"]]
    found = gi.batch_find_nodes_by_node_type(sps, "属")
    assert found == {recs[0]["属"], recs[1]["属"]}


def test_distributed_find_matches_index(graph):
    """The dataset-resident traversal (join-per-round BFS) must agree
    with GraphIndex's DFS on the tree-shaped corpus graph — descent,
    ascent, attribute targets, and the kingdom→species full fan-out."""
    import ray.data as rd

    from datacapsule_ray.traverse import (build_typed_adjacency,
                                          find_nodes_by_type_distributed)

    gi, g, recs = graph
    nodes_ds = rd.from_arrow(pa.table({
        "node_id": list(g.nodes),
        "node_type": [v[0] for v in g.nodes.values()],
    }))
    edges_ds = rd.from_arrow(pa.table({
        "src": [e[0] for e in g.edges],
        "rel": [e[1] for e in g.edges],
        "dst": [e[2] for e in g.edges],
    }))
    adj = build_typed_adjacency(nodes_ds, edges_ds).materialize()

    cases = [
        ([recs[3]["中文学名"]], "科"),          # ascent
        ([recs[0]["科"]], "种"),               # descent to leaf level
        ([recs[1]["中文学名"]], "自然分布地"),   # attribute target
        (["动物界"], "种"),                     # full fan-out
        ([recs[0]["中文学名"]], "中文学名"),     # same-level self hit
        (["不存在的节点"], "种"),               # missing start → empty
    ]
    for starts, target in cases:
        want = set()
        for s in starts:
            want |= gi.find_nodes_by_node_type(s, target)
        df = find_nodes_by_type_distributed(
            adj, nodes_ds, starts, target).to_pandas()
        got = set(df["node_id"]) if len(df) else set()
        assert got == want, (starts, target, got ^ want)


def test_distributed_find_tiny_graph_and_shared_target_level():
    """Two regressions: (1) tiny/hash-unlucky graphs crashed the
    chained typing joins on Ray's schema-less empty partitions;
    (2) a second type sharing the target's LEVEL must be collected
    (the DFS source_level == target_level entry case)."""
    import ray.data as rd

    from datacapsule_ray.traverse import (build_typed_adjacency,
                                          find_nodes_by_type_distributed)

    HIER = {"A": 1, "B": 2, "C": 2, "D": 3}
    nodes_t = pa.table({"node_id": ["a", "c", "d"],
                        "node_type": ["A", "C", "D"]})
    edges_t = pa.table({"src": ["a", "c"], "rel": ["r", "r"],
                        "dst": ["c", "d"]})
    nodes_ds = rd.from_arrow(nodes_t)
    adj = build_typed_adjacency(nodes_ds, rd.from_arrow(edges_t),
                                hierarchy=HIER).materialize()  # (1): no crash
    gi = GraphIndex(nodes_t, edges_t, hierarchy=HIER, leaf_level=7)

    for start, target in [("d", "B"), ("a", "D"), ("d", "A"), ("c", "C")]:
        want = gi.find_nodes_by_node_type(start, target)
        df = find_nodes_by_type_distributed(
            adj, nodes_ds, [start], target, hierarchy=HIER).to_pandas()
        got = set(df["node_id"]) if len(df) else set()
        assert got == want, (start, target, got, want)


def test_distributed_find_random_trees():
    """Randomized parity sweep: on seeded random typed trees (4
    hierarchy levels + attribute leaves), the dataset-resident
    traversal must equal the in-memory DFS for every (start, target)
    combination — ascent, descent, and attribute targets across
    arbitrary shapes, not just the corpus fixture."""
    import numpy as np
    import ray.data as rd

    from datacapsule_ray.traverse import (build_typed_adjacency,
                                          find_nodes_by_type_distributed)

    HIER = {"L1": 1, "L2": 2, "L3": 3, "L4": 4, "attr": 8}
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        names = {1: ["r0"]}
        for lvl, n in ((2, 3), (3, 6), (4, 12)):
            names[lvl] = [f"n{lvl}_{i}" for i in range(n)]
        nodes, types, edges = [], [], []
        for lvl in (1, 2, 3, 4):
            for nm in names[lvl]:
                nodes.append(nm)
                types.append(f"L{lvl}")
                if lvl > 1:
                    parent = names[lvl - 1][rng.integers(len(names[lvl - 1]))]
                    edges.append((parent, nm))
        for i in range(10):
            host = names[4][rng.integers(len(names[4]))]
            nodes.append(f"a{i}")
            types.append("attr")
            edges.append((host, f"a{i}"))

        nodes_t = pa.table({"node_id": nodes, "node_type": types})
        edges_t = pa.table({"src": [e[0] for e in edges],
                            "rel": ["contains"] * len(edges),
                            "dst": [e[1] for e in edges]})
        gi = GraphIndex(nodes_t, edges_t, hierarchy=HIER, leaf_level=4)
        adj = build_typed_adjacency(
            rd.from_arrow(nodes_t), rd.from_arrow(edges_t),
            hierarchy=HIER).materialize()
        nodes_ds = rd.from_arrow(nodes_t)

        starts = ["r0", names[2][0], names[3][-1], names[4][0]]
        for start in starts:
            for target in ("L1", "L2", "L3", "L4", "attr"):
                want = gi.find_nodes_by_node_type(start, target)
                df = find_nodes_by_type_distributed(
                    adj, nodes_ds, [start], target, hierarchy=HIER,
                    leaf_level=4).to_pandas()
                got = set(df["node_id"]) if len(df) else set()
                assert got == want, (seed, start, target, got ^ want)


def test_expand_frontier_matches_index(graph):
    import ray.data as rd

    gi, g, recs = graph
    edges_ds = rd.from_arrow(pa.table({
        "src": [e[0] for e in g.edges],
        "rel": [e[1] for e in g.edges],
        "dst": [e[2] for e in g.edges],
    }))
    sp = recs[5]["中文学名"]
    got = expand_frontier(edges_ds, {sp}, rounds=1)
    assert got == set(gi._neighbors(sp))
    # two rounds = neighbors-of-neighbors minus start
    got2 = expand_frontier(edges_ds, {sp}, rounds=2)
    want2 = set(gi._neighbors(sp))
    for n in list(want2):
        want2 |= set(gi._neighbors(n))
    want2 -= {sp}
    assert got2 == want2


def test_distributed_find_same_level_start_does_not_expand():
    """A start node AT the target level is a self-hit that must NOT
    expand (the DFS returns before recursing): with two adjacent
    same-level leaves, find(a, 种) is {a}, never {a, b}."""
    import ray.data as rd

    from datacapsule_ray.traverse import (build_typed_adjacency,
                                          find_nodes_by_type_distributed)

    HIER = {"属": 6, "种": 7}
    nodes_t = pa.table({"node_id": ["g", "a", "b"],
                        "node_type": ["属", "种", "种"]})
    edges_t = pa.table({"src": ["g", "a"], "rel": ["r", "near"],
                        "dst": ["a", "b"]})
    nodes_ds = rd.from_arrow(nodes_t)
    adj = build_typed_adjacency(nodes_ds, rd.from_arrow(edges_t),
                                hierarchy=HIER).materialize()
    gi = GraphIndex(nodes_t, edges_t, hierarchy=HIER)

    want = gi.find_nodes_by_node_type("a", "种")
    assert want == {"a"}
    df = find_nodes_by_type_distributed(
        adj, nodes_ds, ["a"], "种", hierarchy=HIER).to_pandas()
    got = set(df["node_id"]) if len(df) else set()
    assert got == want


def test_distributed_find_level_skipping_chain_completes():
    """Level-oscillating chains are longer than the distinct-level
    count: each hop is monotone toward the target FROM THE CURRENT
    node, so a 1,7,2,6,2,6,...,4 path is valid for the DFS. The
    visited-set loop must follow it to the end — a rounds-by-level-
    count cap silently truncated it."""
    import ray.data as rd

    from datacapsule_ray.traverse import (build_typed_adjacency,
                                          find_nodes_by_type_distributed)

    HIER = {"T1": 1, "T2": 2, "T4": 4, "T6": 6, "T7": 7}
    lvls = ["T1", "T7", "T2", "T6", "T2", "T6", "T2", "T6", "T2", "T6", "T4"]
    names = [f"n{i}" for i in range(len(lvls))]
    nodes_t = pa.table({"node_id": names, "node_type": lvls})
    edges_t = pa.table({"src": names[:-1],
                        "rel": ["r"] * (len(names) - 1),
                        "dst": names[1:]})
    nodes_ds = rd.from_arrow(nodes_t)
    adj = build_typed_adjacency(nodes_ds, rd.from_arrow(edges_t),
                                hierarchy=HIER).materialize()
    gi = GraphIndex(nodes_t, edges_t, hierarchy=HIER)

    want = gi.find_nodes_by_node_type("n0", "T4")
    assert want == {names[-1]}, "DFS itself must reach the chain end"
    df = find_nodes_by_type_distributed(
        adj, nodes_ds, ["n0"], "T4", hierarchy=HIER).to_pandas()
    got = set(df["node_id"]) if len(df) else set()
    assert got == want
