"""Graph materialization — the shuffles (G1/G2, SURVEY.md §7.3).

- Edge dedup: the same triple is re-emitted once per document that
  mentions it (taxonomy roots: once per doc — planet-sized hot keys at
  10^12 docs). Phase 1 collapses duplicates inside each batch with a
  vectorized local distinct (the salt is the batch), so the global
  groupby on (subj, pred, obj) sees at most one row per key per batch —
  the salted two-phase aggregate the north rule requires.
- Node merge: NetworkX ``add_node`` idempotency
  (tools/entity_extraction.py:93-247) becomes pick-best-row per node_id
  with merge priority (species attrs > first write, keyed by (prio, seq))
  — SURVEY.md §7.4. Same two-phase structure.
- Adjacency: groupby(src) → list<struct<rel,dst>>, chunked so a
  planet-degree node never materializes one giant row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..schema import NODES_SCHEMA

_NODE_ATTRS = ["node_id", "node_type", "name", "中文学名", "拉丁学名", "命名年份", "作者"]


def _local_edge_dedup(batch: pa.Table) -> pa.Table:
    """Phase-1 distinct on (subj,pred,obj) within a batch, keeping a dup count."""
    df = pd.DataFrame({
        "subj": batch.column("subj").to_pandas(),
        "pred": batch.column("pred").to_pandas(),
        "obj": batch.column("obj").to_pandas(),
    })
    g = df.groupby(["subj", "pred", "obj"], sort=False).size().reset_index(name="n_dups")
    return pa.Table.from_pandas(g, preserve_index=False)


def dedup_edges(triples: Dataset) -> Dataset:
    """(subj,pred,obj,...) triples → distinct edges (src, rel, dst, n_dups)."""
    partial = triples.select_columns(["subj", "pred", "obj"]).map_batches(
        _local_edge_dedup, batch_format="pyarrow"
    )
    agg = partial.groupby(["subj", "pred", "obj"]).aggregate(
        Sum("n_dups", alias_name="n_dups")
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["src", "rel", "dst", "n_dups"]),
        batch_format="pyarrow",
    )


_SEP = "\x1f"
_NULL = "\x01"
_PAYLOAD_COLS = ["node_type", "name", "中文学名", "拉丁学名", "命名年份", "作者"]


def _local_node_best(batch: pa.Table) -> pa.Table:
    """Phase-1: best (prio, seq) row per node_id within a batch, with the
    whole candidate row packed into one sortable string:

        <prio:1><seq:015d> ␟ node_type ␟ name ␟ attrs…

    The fixed-width rank prefix makes lexicographic MIN == min((prio,
    seq)) — so the global merge is a single *native vectorized*
    ``groupby(node_id).aggregate(Min(packed))`` instead of per-group
    Python (the map_groups version was the pipeline's hottest stage)."""
    df = batch.select(_NODE_ATTRS + ["prio", "seq"]).to_pandas()
    df = df.sort_values(["prio", "seq"], kind="stable").drop_duplicates(
        "node_id", keep="first"
    )
    rank = (df["prio"].astype(str)
            + df["seq"].map(lambda s: format(s, "015d")))
    packed = rank
    for c in _PAYLOAD_COLS:
        packed = packed + _SEP + df[c].fillna(_NULL)
    return pa.Table.from_pandas(
        pd.DataFrame({"node_id": df["node_id"], "packed": packed}),
        preserve_index=False)


def _unpack_nodes(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    parts = pc.split_pattern(batch.column("packed"), _SEP)
    cols: dict[str, pa.Array] = {"node_id": batch.column("node_id")}
    for i, c in enumerate(_PAYLOAD_COLS):
        vals = pc.list_element(parts, i + 1)
        cols[c] = pc.if_else(pc.equal(vals, _NULL),
                             pa.nulls(len(batch), pa.string()), vals)
    return pa.table({f.name: cols[f.name] for f in NODES_SCHEMA})


def merge_nodes(node_candidates: Dataset) -> Dataset:
    """Node-candidate rows → merged nodes table (G1, salted two-phase)."""
    from ray.data.aggregate import Min

    partial = node_candidates.map_batches(_local_node_best, batch_format="pyarrow")
    best = partial.groupby("node_id").aggregate(Min("packed", alias_name="packed"))
    return best.map_batches(_unpack_nodes, batch_format="pyarrow")


def build_adjacency(edges: Dataset, chunk_size: int = 1024) -> Dataset:
    """edges → (src, chunk, degree, adj: list<struct<rel,dst>>) rows.

    Chunking caps per-row adjacency size so hot nodes (台湾海域 degree 64
    in the reference artifact; 动物界 degree ~#docs at scale) become
    multiple bounded rows instead of one unbounded one."""

    def to_adj(group: pd.DataFrame) -> pd.DataFrame:
        src = group["src"].iloc[0]
        rels = group["rel"].to_numpy()
        dsts = group["dst"].to_numpy()
        degree = len(group)
        rows = []
        for c, start in enumerate(range(0, degree, chunk_size)):
            stop = min(start + chunk_size, degree)
            rows.append({
                "src": src,
                "chunk": c,
                "degree": degree,
                "adj": [{"rel": r, "dst": d} for r, d in zip(rels[start:stop], dsts[start:stop])],
            })
        return pd.DataFrame(rows)

    return edges.groupby("src").map_groups(to_adj, batch_format="pandas")


def node_type_histogram(nodes: Dataset) -> Dataset:
    """G3 parity: node count per node_type (entity_extraction.py:261-269)."""
    return nodes.groupby("node_type").count()


def split_emissions(emissions: Dataset) -> tuple[Dataset, Dataset]:
    """Tagged emissions stream → (triples, node_candidates) views.

    Each view filters + projects with vectorized Arrow kernels; the
    upstream emissions come from a checkpoint so the extract pass is not
    re-executed per view."""
    import pyarrow.compute as pc

    triples = emissions.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "triple")).select(
            ["subj", "pred", "obj", "subj_type", "obj_type", "doc_id"]
        ),
        batch_format="pyarrow",
    )
    nodes = emissions.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "node")).select(
            _NODE_ATTRS + ["prio", "seq"]
        ),
        batch_format="pyarrow",
    )
    return triples, nodes
