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


def _kcore_rounds_np(a_idx, b_idx, n_nodes: int, k: int, rounds: int):
    """Vectorized bounded peel over factorized edges: per round one
    bincount degree pass and one boolean edge filter — the same
    deterministic function as the distributed rounds."""
    import numpy as np

    alive = np.ones(len(a_idx), dtype=bool)
    n_prev = len(a_idx)
    for _ in range(rounds):
        if n_prev == 0:
            break
        deg = (np.bincount(a_idx[alive], minlength=n_nodes)
               + np.bincount(b_idx[alive], minlength=n_nodes))
        keep = deg >= k
        alive &= keep[a_idx] & keep[b_idx]
        n_now = int(alive.sum())
        if n_now == n_prev:  # full round removed nothing: converged
            break
        n_prev = n_now
    return alive


def kcore(edges: Dataset, *, k: int, rounds: int, a_col: str = "id_a",
          b_col: str = "id_b", num_partitions: int = 4,
          driver_limit: int = 2_000_000) -> Dataset:
    """(node, deg) after ``rounds`` synchronous k-core peel rounds over
    unique undirected ``a < b`` edges (ssjoin/minhash pair contract).

    Size probe (the connected_components convention): pair sets under
    ``driver_limit`` rows run the identical peel loop vectorized on the
    driver (bincount degrees + boolean filter per round) — candidate
    pairs are orders of magnitude rarer than docs, and the join rounds'
    fixed shuffle cost dwarfs the numpy loop at bench scale. Larger
    pair sets take the distributed rounds; tests pin both paths."""
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

    if n_prev <= driver_limit:
        import numpy as np
        import ray.data as rd

        df = e.to_pandas()
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        nodes, flat_idx = np.unique(np.concatenate((a, b)),
                                    return_inverse=True)
        a_idx, b_idx = flat_idx[:len(a)], flat_idx[len(a):]
        alive = _kcore_rounds_np(a_idx, b_idx, len(nodes), k, rounds)
        deg = (np.bincount(a_idx[alive], minlength=len(nodes))
               + np.bincount(b_idx[alive], minlength=len(nodes)))
        touched = deg > 0
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes[touched], type=id_type),
            "deg": pa.array(deg[touched].astype(np.int64))}))
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
