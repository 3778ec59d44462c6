"""Distributed PageRank in exact fixed-point integer arithmetic — the
graph-centrality member of the graph-analytics family (degree G2,
traversal J3, connected components in functions/dedup.py). Web-corpus
pipelines weight documents by link centrality (harmonic/PageRank over
the host graph); this is that operator over any (src, dst) edge table.

Fixed-point spec (what makes a DISTRIBUTED PageRank oracle-checkable):

    pr_0(v)    = unit                       (integer mass per node)
    pr_k+1(v)  = floor(0.15 * unit)
               + Σ_{u→v} floor(pr_k(u) * 85 // (100 * outdeg(u)))

All arithmetic is int64: sums are order-independent, so the result is
bit-identical however Ray partitions the shuffle — and expressible in
SQL as ``//`` integer division, giving a FULL DuckDB oracle (floating
PageRank sums contributions in nondeterministic order and could never
hash-match). Floor division leaks ≤1/unit of mass per edge per
iteration and dangling nodes leak their whole damped mass — both are
part of the spec, identical on both sides.

Plan shape per iteration (the Pregel-via-joins pattern):
  edges⋈outdeg is joined ONCE (static); each iteration is one hash
  join (pr on src) + one groupby-sum (contributions on dst) + one left
  join back to the node set. O(iters) shuffles of edge-sized tables,
  nothing driver-resident.

Overflow bound: pr(v) ≤ N·unit; contribution products ≤ pr·85 —
int64-safe to N·unit ≈ 10^17 (e.g. 10^8 nodes at unit=10^9)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

UNIT = 1_000_000_000


def _pagerank_rounds_np(src_idx, dst_idx, n_nodes: int, sv,
                        iters: int, unit: int):
    """Vectorized fixed-point rounds over factorized edges — the same
    deterministic int64 function as the distributed join rounds (sums
    are order-independent, so scatter-add == groupby-sum). ``sv`` is
    the 0/1 teleport mask (all-ones for global PageRank)."""
    base = (15 * unit) // 100
    outdeg = np.bincount(src_idx, minlength=n_nodes).astype(np.int64)
    pr = sv * np.int64(unit)
    for _ in range(iters):
        contrib = (pr[src_idx] * 85) // (100 * outdeg[src_idx])
        acc = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(acc, dst_idx, contrib)
        pr = sv * np.int64(base) + acc
    return pr


def _driver_pagerank(e: Dataset, sv_of, iters: int, unit: int,
                     id_type: pa.DataType) -> Dataset:
    """Driver path for bench-scale graphs (the minlabel/bfs_levels
    size-probe convention): pulls ONLY the (src, dst) edge rows,
    factorizes, runs the identical fixed-point rounds vectorized.
    Distributed joins pay ~10 fixed exchange costs per run, which a
    165k-edge graph never amortizes; tests pin both paths equal."""
    import ray.data as rd

    df = e.to_pandas()
    s = df["src"].to_numpy()
    d = df["dst"].to_numpy()
    nodes, flat = np.unique(np.concatenate((s, d)), return_inverse=True)
    src_idx, dst_idx = flat[:len(s)], flat[len(s):]
    sv = sv_of(nodes)
    pr = _pagerank_rounds_np(src_idx, dst_idx, len(nodes), sv, iters,
                             unit)
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, type=id_type),
        "pr": pa.array(pr, type=pa.int64())}))


def pagerank_fixed(edges: Dataset, *, src_col: str = "src",
                   dst_col: str = "dst", iters: int = 3,
                   unit: int = UNIT, num_partitions: int = 4,
                   driver_limit: int = 2_000_000) -> Dataset:
    """(node, pr) after ``iters`` fixed-point iterations."""
    import ray.data as rd

    from ..traverse import drop_empty_blocks as _deb

    base = (15 * unit) // 100

    def pick(cols: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({new: t.column(old) for old, new in cols.items()})
        return fn

    # pin the working set: everything below reads the edge table 3+
    # times (outdeg, node set, per-iteration contribution joins) and
    # iterative reuse without materialize re-executes the upstream
    # pipeline once per consumer per iteration (the functions/
    # clustering.py projection convention)
    e = edges.map_batches(pick({src_col: "src", dst_col: "dst"}),
                          batch_format="pyarrow").materialize()
    if e.count() <= driver_limit:
        from .dedup import _col_type

        return _driver_pagerank(
            e, lambda nodes: np.ones(len(nodes), dtype=np.int64),
            iters, unit, _col_type(e, "src"))

    def local_distinct(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return (t.select([col]).group_by([col], use_threads=False)
                    .aggregate([]))
        return fn

    nodes = _deb(
        e.map_batches(local_distinct("src"), batch_format="pyarrow")
        .map_batches(pick({"src": "node"}), batch_format="pyarrow")
        .union(e.map_batches(local_distinct("dst"), batch_format="pyarrow")
               .map_batches(pick({"dst": "node"}), batch_format="pyarrow"))
        .groupby("node").count()
        .map_batches(lambda t: t.select(["node"]), batch_format="pyarrow"),
        pa.schema([("node", pa.string())]))

    outdeg = e.groupby("src").count().map_batches(
        lambda t: t.rename_columns(["src", "outdeg"]),
        batch_format="pyarrow")
    # static across iterations: join the degree onto the edges once
    e_deg = _deb(e.join(outdeg, join_type="inner",
                        num_partitions=num_partitions, on=("src",)))

    def init_pr(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "pr": pa.array(np.full(t.num_rows, unit,
                                                dtype=np.int64))})

    pr = nodes.map_batches(init_pr, batch_format="pyarrow")
    if iters <= 0:
        return pr

    # nodes with NO in-edges receive no contribution ever: their pr is
    # the constant `base` after every iteration ≥ 1. Computing that set
    # ONCE (anti-join against the distinct-dst side) replaces the
    # per-iteration nodes-LEFT-JOIN-contributions exchange with a lazy
    # union — one hash join per iteration instead of two.
    dsts = _deb(e.map_batches(local_distinct("dst"), batch_format="pyarrow")
                .groupby("dst").count()
                .map_batches(lambda t: t.select(["dst"]),
                             batch_format="pyarrow"),
                pa.schema([("dst", pa.string())]))

    def base_pr(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "pr": pa.array(np.full(t.num_rows, base,
                                                dtype=np.int64))})

    no_in = _deb(nodes.join(dsts, join_type="left_anti",
                            num_partitions=num_partitions,
                            on=("node",), right_on=("dst",))
                 .map_batches(base_pr, batch_format="pyarrow"),
                 pa.schema([("node", pa.string()), ("pr", pa.int64())]))

    for _ in range(iters):
        j = _deb(e_deg.join(pr, join_type="inner",
                            num_partitions=num_partitions,
                            on=("src",), right_on=("node",)))

        def contrib(t: pa.Table) -> pa.Table:
            p = t.column("pr").to_numpy(zero_copy_only=False)
            d = t.column("outdeg").to_numpy(zero_copy_only=False)
            return pa.table({"dst": t.column("dst"),
                             "c": pa.array((p * 85) // (100 * d))})

        def apply_base(t: pa.Table) -> pa.Table:
            t = t.rename_columns(["node", "c"])
            return pa.table({"node": t.column("node"),
                             "pr": pc.add(pc.cast(t.column("c"), pa.int64()),
                                          pa.scalar(base, type=pa.int64()))})

        with_in = _deb(
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst").sum("c")
            .map_batches(apply_base, batch_format="pyarrow"),
            pa.schema([("node", pa.string()), ("pr", pa.int64())]))
        pr = with_in.union(no_in)
    return pr


def personalized_pagerank_fixed(edges: Dataset, seeds: Dataset, *,
                                src_col: str = "src",
                                dst_col: str = "dst", iters: int = 3,
                                unit: int = UNIT,
                                num_partitions: int = 4,
                                driver_limit: int = 2_000_000
                                ) -> Dataset:
    """Personalized PageRank: ``pagerank_fixed``'s fixed-point integer
    spec with the teleport mass restricted to ``seeds`` (one 'node'
    column) — "centrality as seen from these roots", the
    recommendation/relevance flavor of the centrality family:

        pr_0(v)   = unit                     if v in S else 0
        pr_k+1(v) = [v in S]*floor(0.15*unit)
                  + Sum_{u->v} pr_k(u)*85 // (100*outdeg(u))

    All-int64 arithmetic (order-independent sums -> SQL-oracle
    hash-exact, the pagerank_fixed rationale). Every node of the edge
    set is emitted, including pr=0 nodes unreached from the seeds.
    Bench-scale edge sets take the vectorized driver path (the
    ``_driver_pagerank`` size probe); past ``driver_limit`` each
    iteration is one hash join (pr on src), one groupby-sum, and one
    left join onto the seed-flagged node set — O(iters) edge-sized
    shuffles, nothing driver-resident."""
    import ray.data as rd  # noqa: F401  (parity with pagerank_fixed)

    from ..traverse import drop_empty_blocks as _deb

    base = (15 * unit) // 100

    def pick(cols: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({new: t.column(old)
                             for old, new in cols.items()})
        return fn

    e = edges.map_batches(pick({src_col: "src", dst_col: "dst"}),
                          batch_format="pyarrow").materialize()
    if e.count() <= driver_limit and seeds.count() <= driver_limit:
        from .dedup import _col_type

        seed_vals = np.unique(seeds.select_columns(
            ["node"]).to_pandas()["node"].to_numpy())

        def sv_of(nodes_arr):
            if len(seed_vals) == 0:
                return np.zeros(len(nodes_arr), dtype=np.int64)
            idx = np.minimum(np.searchsorted(seed_vals, nodes_arr),
                             len(seed_vals) - 1)
            return (seed_vals[idx] == nodes_arr).astype(np.int64)

        return _driver_pagerank(e, sv_of, iters, unit,
                                _col_type(e, "src"))

    def local_distinct(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return (t.select([col]).group_by([col], use_threads=False)
                    .aggregate([]))
        return fn

    nodes = _deb(
        e.map_batches(local_distinct("src"), batch_format="pyarrow")
        .map_batches(pick({"src": "node"}), batch_format="pyarrow")
        .union(e.map_batches(local_distinct("dst"),
                             batch_format="pyarrow")
               .map_batches(pick({"dst": "node"}),
                            batch_format="pyarrow"))
        .groupby("node").count()
        .map_batches(lambda t: t.select(["node"]),
                     batch_format="pyarrow"),
        pa.schema([("node", pa.string())]))

    def mark_seed(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "sv": pa.array(np.ones(t.num_rows,
                                                dtype=np.int64))})

    # distinct BEFORE the flag join: duplicate seed rows would fan
    # out the node set and double-count every contribution (the driver
    # path np.unique-dedups; both paths must agree)
    seed_marked = (seeds.select_columns(["node"])
                   .groupby("node").count()
                   .map_batches(lambda t: t.select(["node"]),
                                batch_format="pyarrow")
                   .map_batches(mark_seed, batch_format="pyarrow"))
    # seed flag attached ONCE; every iteration reuses these blocks
    flagged = _deb(nodes.join(seed_marked, join_type="left_outer",
                              num_partitions=num_partitions,
                              on=("node",)),
                   pa.schema([("node", pa.string()),
                              ("sv", pa.int64())])).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "sv": pc.fill_null(t.column("sv"), 0)}),
        batch_format="pyarrow").materialize()

    def init_pr(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "pr": pc.multiply(t.column("sv"),
                              pa.scalar(unit, type=pa.int64()))})

    pr = flagged.map_batches(init_pr, batch_format="pyarrow")
    if iters <= 0:
        return pr

    outdeg = e.groupby("src").count().map_batches(
        lambda t: t.rename_columns(["src", "outdeg"]),
        batch_format="pyarrow")
    e_deg = _deb(e.join(outdeg, join_type="inner",
                        num_partitions=num_partitions, on=("src",)))

    def contrib(t: pa.Table) -> pa.Table:
        p = t.column("pr").to_numpy(zero_copy_only=False)
        d = t.column("outdeg").to_numpy(zero_copy_only=False)
        return pa.table({"dst": t.column("dst"),
                         "c": pa.array((p * 85) // (100 * d))})

    for _ in range(iters):
        j = _deb(e_deg.join(pr, join_type="inner",
                            num_partitions=num_partitions,
                            on=("src",), right_on=("node",)))
        contribs = _deb(
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst").sum("c"),
            pa.schema([("dst", pa.string()), ("sum(c)", pa.int64())]))
        pr = _deb(flagged.join(contribs, join_type="left_outer",
                               num_partitions=num_partitions,
                               on=("node",), right_on=("dst",)),
                  pa.schema([("node", pa.string()), ("sv", pa.int64()),
                             ("sum(c)", pa.int64())])).map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "pr": pc.add(
                    pc.multiply(t.column("sv"),
                                pa.scalar(base, type=pa.int64())),
                    pc.cast(pc.fill_null(t.column("sum(c)"), 0),
                            pa.int64()))}),
            batch_format="pyarrow")
    return pr.map_batches(lambda t: t.select(["node", "pr"]),
                          batch_format="pyarrow")
