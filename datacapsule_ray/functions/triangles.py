"""Distributed exact triangle counting — the clustering-structure
member of the graph-analytics family (PageRank in pagerank.py,
connected components in dedup.py, degree in stages/graph.py). In a
near-dup pipeline, triangles measure dup-cluster TRANSITIVITY: a
Jaccard>=0.9 graph whose wedges mostly close is clique-structured (safe
to collapse per component); open wedges flag chained borderline pairs.

Algorithm: compact-forward over a DEGREE-ORDERED orientation
(Latapy 2008; the standard distributed formulation). Every edge is
oriented from its lower-(degree, id) endpoint to the higher one, wedges
are enumerated by a self-join on the source, and a second join tests
the closing edge — each triangle is counted exactly once from its
lowest-ordered vertex.

The scale decision — and why there is a ``deg_cap``: wedge volume is
Σ_v C(outdeg(v), 2). Degree ordering minimizes it (O(m^1.5) on
arbitrary graphs), but a SINGLE k-clique still owns ~k³/6 wedges — the
sf0.1 dup corpus contains a ~1,900-node clique, i.e. 3·10⁸ wedges for
a count that is combinatorially forced anyway. The standard hub split
applies: count EXACTLY on the subgraph of nodes with degree <= cap
(wedges bounded by n·cap²/2 — skew-proof by construction), and report
hub mass (nodes/edges above the cap) alongside so nothing is silently
dropped. Hub-internal triangles are a dense-matrix problem, not a
shuffle problem; for dup QA the hubs are the ALREADY-OBVIOUS clusters.

Input contract: ``edges`` holds UNIQUE UNDIRECTED pairs with
``a < b`` per row and no self-loops (what ssjoin/minhash pair
emitters produce).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def triangle_count_lowdeg(edges: Dataset, *, a_col: str = "id_a",
                          b_col: str = "id_b", deg_cap: int = 64,
                          num_partitions: int = 4,
                          broadcast_cap: int = 2_000_000) -> "pa.Table":
    """One-row table: (n_edges, n_nodes, n_hub_nodes, n_edges_low,
    n_wedges_low, n_triangles_low) — exact triangles among nodes of
    degree <= deg_cap, plus the hub mass excluded by the cap.

    Degree attach follows the repo's broadcast-with-probe convention
    (ssjoin.py expansion strategy): when the LOW-degree node table fits
    under ``broadcast_cap`` rows it ships once via ``ray.put`` and the
    filter+orient is one searchsorted map over the edges — replacing
    two Acero join exchanges whose fixed cost dominates at bench scale;
    a billion-node low set takes the join path."""
    from ..functions.ssjoin import _cached_get
    from ..traverse import drop_empty_blocks as _deb
    from .dedup import _col_type

    def pick(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column(a_col), "b": t.column(b_col)})

    e = edges.map_batches(pick, batch_format="pyarrow").materialize()
    id_type = _col_type(e, "a")

    def explode(t: pa.Table) -> pa.Table:
        # local partial count per endpoint (the quantiles.py combine
        # shape): emitted volume is <= 2 rows per distinct node per
        # block, so the groupby shuffles node-sized data, not edges
        nodes = pa.concat_arrays([
            t.column("a").combine_chunks(), t.column("b").combine_chunks()])
        return (pa.table({"node": nodes})
                .group_by(["node"], use_threads=False)
                .aggregate([([], "count_all")])
                .rename_columns(["node", "c"]))

    # materialized: deg feeds four consumers (two counts, two joins) —
    # without pinning, each re-runs the explode+groupby over e
    deg = _deb(e.map_batches(explode, batch_format="pyarrow")
               .groupby("node").sum("c")
               .map_batches(lambda t: t.rename_columns(["node", "deg"]),
                            batch_format="pyarrow"),
               pa.schema([("node", id_type), ("deg", pa.int64())])
               ).materialize()

    n_edges = e.count()
    n_nodes = deg.count()
    n_hub = deg.filter(expr=f"deg > {deg_cap}").count()

    def _proj(mapping: dict):
        """NAME-based projection — join output column order is an
        implementation detail."""
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({new: t.column(old)
                             for new, old in mapping.items()})
        return fn

    def _orient(a, b, da, db) -> pa.Table:
        """(deg, id)-ordered orientation of already-low edges."""
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "src": pa.array(np.where(fwd, a, b), type=id_type),
            "dst": pa.array(np.where(fwd, b, a), type=id_type),
            "ddeg": pa.array(np.where(fwd, db, da).astype(np.int64)),
        })

    low_schema = pa.schema([("src", id_type), ("dst", id_type),
                            ("ddeg", pa.int64())])
    low_nodes = deg.filter(expr=f"deg <= {deg_cap}")
    # limit(cap+1) probes the size in the same pass that collects
    ldf = low_nodes.limit(broadcast_cap + 1).to_pandas()
    if len(ldf) <= broadcast_cap:
        keys = ldf["node"].to_numpy()
        order = np.argsort(keys, kind="stable")
        keys_ref = ray.put(keys[order])
        degs_ref = ray.put(ldf["deg"].to_numpy()[order])

        def orient_bcast(t: pa.Table) -> pa.Table:
            keys = _cached_get(keys_ref)
            degs = _cached_get(degs_ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)

            def look(x):
                if not len(keys):
                    return (np.zeros(len(x), dtype=bool),
                            np.zeros(len(x), dtype=np.int64))
                i = np.searchsorted(keys, x)
                ok = i < len(keys)
                i[~ok] = 0
                ok &= keys[i] == x
                return ok, degs[i]

            ok_a, da = look(a)
            ok_b, db = look(b)
            keep = ok_a & ok_b
            return _orient(a[keep], b[keep], da[keep], db[keep])

        low_src = e.map_batches(orient_bcast, batch_format="pyarrow")
    else:
        # join fallback: attach both endpoint degrees (two hash joins
        # on the node id)
        j1 = _deb(e.join(low_nodes, join_type="inner",
                         num_partitions=num_partitions,
                         on=("a",), right_on=("node",))
                  .map_batches(_proj({"a": "a", "b": "b",
                                      "deg_a": "deg"}),
                               batch_format="pyarrow"))
        j2 = _deb(j1.join(low_nodes, join_type="inner",
                          num_partitions=num_partitions,
                          on=("b",), right_on=("node",))
                  .map_batches(_proj({"a": "a", "b": "b",
                                      "deg_a": "deg_a",
                                      "deg_b": "deg"}),
                               batch_format="pyarrow"))

        def orient_join(t: pa.Table) -> pa.Table:
            return _orient(
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
                t.column("deg_a").to_numpy(zero_copy_only=False),
                t.column("deg_b").to_numpy(zero_copy_only=False))

        low_src = j2.map_batches(orient_join, batch_format="pyarrow")

    low = _deb(low_src, low_schema).materialize()  # wedge self-join ×2 + close
    n_edges_low = low.count()
    if n_edges_low == 0:
        # a block-less empty Dataset has no schema for the joins below
        return _result(n_edges, n_nodes, n_hub, 0, 0, 0)

    low2 = low.map_batches(_proj({"src2": "src", "v": "dst",
                                  "vdeg": "ddeg"}),
                           batch_format="pyarrow")
    wedges_all = _deb(low.join(low2, join_type="inner",
                               num_partitions=num_partitions,
                               on=("src",), right_on=("src2",)))

    def open_wedges(t: pa.Table) -> pa.Table:
        """(v, w) with (deg,id)-order v ≺ w — each unordered wedge
        once; the strict compare also drops the self-paired edge."""
        d1 = t.column("ddeg").to_numpy(zero_copy_only=False)
        d2 = t.column("vdeg").to_numpy(zero_copy_only=False)
        x = t.column("dst").to_numpy(zero_copy_only=False)
        y = t.column("v").to_numpy(zero_copy_only=False)
        keep = (d1 < d2) | ((d1 == d2) & (x < y))
        t = t.filter(pa.array(keep))
        return pa.table({"wv": t.column("dst"), "ww": t.column("v")})

    # materialize: count() below would otherwise re-run the self-join
    # when the closing join consumes wedges a second time
    wedges = _deb(wedges_all.map_batches(open_wedges,
                                         batch_format="pyarrow"),
                  pa.schema([("wv", id_type), ("ww", id_type)])
                  ).materialize()
    n_wedges = wedges.count()
    if n_wedges == 0:
        return _result(n_edges, n_nodes, n_hub, n_edges_low, 0, 0)
    # closing edge is oriented v→w under the SAME total order, so one
    # inner join on both endpoints tests existence exactly
    closed = _deb(wedges.join(
        low.map_batches(lambda t: t.select(["src", "dst"]),
                        batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("wv", "ww"), right_on=("src", "dst")))
    return _result(n_edges, n_nodes, n_hub, n_edges_low, n_wedges,
                   closed.count())


def _result(n_edges: int, n_nodes: int, n_hub: int, n_low: int,
            n_wedges: int, n_tri: int) -> pa.Table:
    return pa.table({
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "n_nodes": pa.array([n_nodes], type=pa.int64()),
        "n_hub_nodes": pa.array([n_hub], type=pa.int64()),
        "n_edges_low": pa.array([n_low], type=pa.int64()),
        "n_wedges_low": pa.array([n_wedges], type=pa.int64()),
        "n_triangles_low": pa.array([n_tri], type=pa.int64()),
    })
