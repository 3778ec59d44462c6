"""Distributed k-core peeling — the density member of the
graph-analytics family (triangles.py measures transitivity, this
measures COHESION). In a near-dup pipeline the 2-core separates
clustered duplication (every node keeps >=2 dup partners after pruning
hangers-on) from pair-noise (isolated borderline pairs peel away).

Algorithm: synchronous peeling. Each round recomputes degrees over the
CURRENT edge subset (per-block partial counts -> one node-keyed
groupby, the triangles.py explode shape) and keeps only edges whose
BOTH endpoints still have degree >= k (two distributed semi-joins).
Rounds are bounded by ``rounds`` so the result is a fixed-point-free
deterministic function mirrorable by an unrolled SQL oracle (the
pagerank.py convention); peeling converges when an entire round removes
nothing, detected by the edge count (filters only remove edges, so an
unchanged count means an unchanged set) — remaining rounds are no-ops
and are skipped.

Output: the degree table of the final edge subset — (node, deg) for
every node with at least one surviving edge. At convergence this is
exactly the k-core and its internal degrees.

Scale: each round shuffles node-sized degree partials plus two
edge-keyed semi-join exchanges; nothing lands on the driver but the
per-round edge count. Skewed hubs are harmless — degree partials
pre-aggregate per block before the groupby."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _degree_table(e: Dataset, id_type: pa.DataType) -> Dataset:
    from ..traverse import drop_empty_blocks

    def explode(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            t.column("a").combine_chunks(), t.column("b").combine_chunks()])
        return (pa.table({"node": nodes})
                .group_by(["node"], use_threads=False)
                .aggregate([([], "count_all")])
                .rename_columns(["node", "c"]))

    return drop_empty_blocks(
        e.map_batches(explode, batch_format="pyarrow")
        .groupby("node").sum("c")
        .map_batches(lambda t: pa.table({
            "node": t.column("node"),
            "deg": pc.cast(t.column("sum(c)"), pa.int64())}),
            batch_format="pyarrow"),
        pa.schema([("node", id_type), ("deg", pa.int64())]))


def kcore(edges: Dataset, *, k: int, rounds: int, a_col: str = "id_a",
          b_col: str = "id_b", num_partitions: int = 4) -> Dataset:
    """(node, deg) after ``rounds`` synchronous k-core peel rounds over
    unique undirected ``a < b`` edges (ssjoin/minhash pair contract)."""
    from ..traverse import drop_empty_blocks
    from .dedup import _col_type

    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")

    def pick(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column(a_col), "b": t.column(b_col)})

    e = edges.map_batches(pick, batch_format="pyarrow").materialize()
    id_type = _col_type(e, "a")
    e_schema = pa.schema([("a", id_type), ("b", id_type)])
    n_prev = e.count()
    for _ in range(rounds):
        if n_prev == 0:
            break
        # launder: a filtered-out range partition emits schema-less
        # empty blocks that poison the Acero semi-join partitioner
        keep = drop_empty_blocks(
            _degree_table(e, id_type)
            .filter(expr=f"deg >= {k}").select_columns(["node"]),
            pa.schema([("node", id_type)])).materialize()
        if keep.count() == 0:
            # whole graph peeled away; a semi-join against a fully
            # empty right side would crash the hash-shuffle aggregator
            import ray.data as rd
            e = rd.from_arrow(e_schema.empty_table())
            break
        e = drop_empty_blocks(
            e.join(keep, join_type="left_semi",
                   num_partitions=num_partitions,
                   on=("a",), right_on=("node",)), e_schema)
        e = drop_empty_blocks(
            e.join(keep, join_type="left_semi",
                   num_partitions=num_partitions,
                   on=("b",), right_on=("node",)), e_schema).materialize()
        n_now = e.count()
        if n_now == n_prev:  # full round removed nothing: converged
            break
        n_prev = n_now
    return _degree_table(e, id_type)
