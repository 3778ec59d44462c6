"""Bounded BFS hop levels from a seed node — SQL-checkable graph
reachability (the shortest-path face of the traversal family).

The reference walks its KG breadth-first on the driver
(`rag_pre_model.py` / `react_tools.py` neighbor expansion, one hop per
tool call); here the same "how far is every node from a seed"
semantics runs as distributed min-plus label propagation: after
``max_hops`` synchronous rounds every node holds its exact BFS
distance from the seed, clipped at ``max_hops`` (unreachable and
farther nodes are not emitted). Deterministic and mirrorable by a
bounded ``WITH RECURSIVE`` DuckDB oracle — the minlabel/pagerank
fixed-iteration convention.

Same size-probe shape as ``minlabel.minlabel_components``: pair sets
under ``driver_limit`` rows run the identical relaxation vectorized on
the driver over ONLY the edge rows (near-dup pair graphs are orders of
magnitude smaller than the corpus); larger sets take join rounds whose
shuffle volume is O(rounds * |E|). Tests pin both paths to each other.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _bfs_rounds_np(a_idx, b_idx, n_nodes: int, seed_idx: int,
                   max_hops: int):
    """Vectorized bounded min-plus relaxation over factorized edges —
    the same deterministic function as the distributed join rounds.
    Returns int64 hop per node; ``max_hops + 1`` means unreached."""
    import numpy as np

    inf = max_hops + 1
    dist = np.full(n_nodes, inf, dtype=np.int64)
    dist[seed_idx] = 0
    for _ in range(max_hops):
        nd = dist.copy()
        np.minimum.at(nd, a_idx, dist[b_idx] + 1)
        np.minimum.at(nd, b_idx, dist[a_idx] + 1)
        if (nd == dist).all():  # monotone: unchanged == converged
            break
        dist = nd
    return dist


def bfs_levels(edges: Dataset, *, max_hops: int,
               a_col: str = "id_a", b_col: str = "id_b",
               seed=None, num_partitions: int = 4,
               driver_limit: int = 2_000_000) -> Dataset:
    """``(node, hop)`` for every node within ``max_hops`` undirected
    hops of ``seed`` (seed itself at hop 0). ``seed=None`` picks the
    globally minimum node id in the edge set — deterministic without a
    caller-side scan."""
    from ..traverse import drop_empty_blocks
    from .dedup import _col_type

    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")

    def pick(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column(a_col), "b": t.column(b_col)})

    e = edges.map_batches(pick, batch_format="pyarrow").materialize()
    n_edges = e.count()
    if n_edges == 0:
        # a fully-filtered input may arrive schema-less; the id type is
        # unknowable, so default the empty result to int64 ids
        import ray.data as rd
        return rd.from_arrow(pa.schema(
            [("node", pa.int64()), ("hop", pa.int64())]).empty_table())
    id_type = _col_type(e, "a")
    out_schema = pa.schema([("node", id_type), ("hop", pa.int64())])

    if n_edges <= driver_limit:
        import numpy as np
        import ray.data as rd

        df = e.to_pandas()
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        nodes, flat_idx = np.unique(np.concatenate((a, b)),
                                    return_inverse=True)
        a_idx, b_idx = flat_idx[:len(a)], flat_idx[len(a):]
        if seed is None:
            seed_idx = 0
        else:
            pos = int(np.searchsorted(nodes, seed))
            if pos >= len(nodes) or nodes[pos] != seed:
                # seed touches no edge: hop-0 singleton, exactly what
                # the distributed path's no-join-match rounds return
                return rd.from_arrow(pa.table({
                    "node": pa.array([seed], type=id_type),
                    "hop": pa.array([0], type=pa.int64())}))
            seed_idx = pos
        dist = _bfs_rounds_np(a_idx, b_idx, len(nodes), seed_idx,
                              max_hops)
        keep = dist <= max_hops
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes[keep], type=id_type),
            "hop": pa.array(dist[keep], type=pa.int64())}))

    # distributed bounded relaxation: labels hold only DISCOVERED
    # nodes; each round attaches the frontier's hops to its neighbors
    # (two edge-keyed joins) and keeps the per-node minimum.
    if seed is None:
        # true global min over BOTH endpoint columns — min("a") alone
        # only equals it for canonical a<b pair lists, and the driver
        # path (nodes[0] of the unique union) must stay path-equal on
        # ANY input
        seed = min(e.min("a"), e.min("b"))
    import ray.data as rd

    labels = rd.from_arrow(pa.table({
        "node": pa.array([seed], type=id_type),
        "hop": pa.array([0], type=pa.int64())}))

    def bump(node_col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t.column(node_col),
                "hop": pc.add(t.column("hop"), 1)})
        return fn

    for _ in range(max_hops):
        la = drop_empty_blocks(
            e.join(labels, join_type="inner",
                   num_partitions=num_partitions,
                   on=("a",), right_on=("node",))
            .map_batches(bump("b"), batch_format="pyarrow"), out_schema)
        lb = drop_empty_blocks(
            e.join(labels, join_type="inner",
                   num_partitions=num_partitions,
                   on=("b",), right_on=("node",))
            .map_batches(bump("a"), batch_format="pyarrow"), out_schema)
        labels = drop_empty_blocks(
            labels.union(la).union(lb)
            .groupby("node").min("hop")
            .map_batches(lambda t: pa.table({
                "node": t.column("node"),
                "hop": pc.cast(t.column("min(hop)"), pa.int64())}),
                batch_format="pyarrow"), out_schema).materialize()

    def clip(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t.column("hop"), max_hops))

    return labels.map_batches(clip, batch_format="pyarrow")
