"""GraphML export + import (S2/S3 parity).

- Export mirrors tools/entity_extraction.py:253-255 (nx.write_graphml):
  small-scale conformance diffing only — collects the nodes/edges
  tables driver-side. Production output stays columnar
  (nodes/edges/adjacency parquet); never call this on a planet-scale
  graph.
- Import (``read_graphml``) reads a reference-produced GraphML artifact
  (react_tools.py:45-49 loads the same file into NetworkX at query
  init) into the engine's nodes/edges tables — stdlib ElementTree, no
  networkx dependency — so traversal/vector stages can run directly on
  the reference's shipped graph (round-trip conformance in
  tests/test_reference_parity.py).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

_NODE_COLS = ["node_id", "node_type", "name", "中文学名", "拉丁学名", "命名年份", "作者"]


def write_graphml(nodes: Dataset | pa.Table, edges: Dataset | pa.Table,
                  path: str) -> int:
    """Write nodes+edges as GraphML; returns node count."""
    nt = nodes.to_pandas()  # Dataset and pa.Table both expose this
    et = edges.to_pandas()
    try:
        import networkx as nx

        g = nx.DiGraph()
        for row in nt.to_dict("records"):
            node_id = row.pop("node_id")
            attrs = {k: v for k, v in row.items() if v is not None and v == v}
            g.add_node(node_id, **attrs)
        for row in et.to_dict("records"):
            g.add_edge(row["src"], row["dst"], relation=row["rel"])
        nx.write_graphml(g, path, encoding="utf-8")
        return g.number_of_nodes()
    except ImportError:
        from xml.sax.saxutils import escape, quoteattr

        # minimal writer emitting the same key/data layout networkx
        # does, so read_graphml round-trips attributes either way.
        # Edge endpoints missing from the nodes table are emitted as
        # attribute-less nodes — exactly what nx.add_edge auto-adds —
        # so the artifact and the return count match the nx path.
        attr_cols = [c for c in nt.columns if c != "node_id"]
        known = {str(n) for n in nt["node_id"]}
        extra: list[str] = []
        seen_extra: set[str] = set()
        for row in et.to_dict("records"):
            for nid in (str(row["src"]), str(row["dst"])):
                if nid not in known and nid not in seen_extra:
                    seen_extra.add(nid)
                    extra.append(nid)
        with open(path, "w", encoding="utf-8") as f:
            f.write("<?xml version='1.0' encoding='utf-8'?>\n"
                    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
            for i, c in enumerate(attr_cols):
                f.write(f'<key id="n{i}" for="node" attr.name={quoteattr(c)} '
                        'attr.type="string"/>\n')
            f.write('<key id="e0" for="edge" attr.name="relation" '
                    'attr.type="string"/>\n<graph edgedefault="directed">\n')
            for row in nt.to_dict("records"):
                f.write(f'<node id={quoteattr(str(row["node_id"]))}>')
                for i, c in enumerate(attr_cols):
                    v = row.get(c)
                    if v is not None and v == v:
                        f.write(f'<data key="n{i}">{escape(str(v))}</data>')
                f.write("</node>\n")
            for nid in extra:
                f.write(f"<node id={quoteattr(nid)}></node>\n")
            for row in et.to_dict("records"):
                f.write(f'<edge source={quoteattr(str(row["src"]))} '
                        f'target={quoteattr(str(row["dst"]))}>'
                        f'<data key="e0">{escape(str(row["rel"]))}</data></edge>\n')
            f.write("</graph></graphml>\n")
        return len(nt) + len(extra)


def read_graphml(path: str) -> tuple[pa.Table, pa.Table]:
    """GraphML → (nodes, edges) Arrow tables (S3,
    react_tools.py:45-49).

    Stdlib ElementTree (iterparse — bounded memory), honoring the
    artifact's <key> declarations. Duplicate node ids merge with
    last-write-wins attrs and re-adds without attrs keep existing
    values — NetworkX ``add_node`` semantics, the same merge contract
    as the G1 shuffle. Returns nodes with the engine's NODES_SCHEMA
    columns and edges as (src, rel, dst)."""
    import xml.etree.ElementTree as ET

    ns = "{http://graphml.graphdrawing.org/xmlns}"
    keys: dict[str, str] = {}  # key id → attr.name
    nodes: dict[str, dict] = {}
    edges: list[tuple[str, str | None, str]] = []
    for _, el in ET.iterparse(path, events=("end",)):
        tag = el.tag.removeprefix(ns)
        if tag == "key":
            keys[el.get("id")] = el.get("attr.name")
        elif tag == "node":
            attrs = {keys.get(d.get("key")): (d.text or "")
                     for d in el if d.tag.removeprefix(ns) == "data"}
            attrs.pop(None, None)
            nodes.setdefault(el.get("id"), {}).update(attrs)
            el.clear()
        elif tag == "edge":
            rel = None
            for d in el:
                if (d.tag.removeprefix(ns) == "data"
                        and keys.get(d.get("key")) == "relation"):
                    rel = d.text or ""
            edges.append((el.get("source"), rel, el.get("target")))
            el.clear()
    node_rows = {c: [] for c in _NODE_COLS}
    for nid, attrs in nodes.items():
        node_rows["node_id"].append(nid)
        for c in _NODE_COLS[1:]:
            node_rows[c].append(attrs.get(c))
    nodes_t = pa.table({c: pa.array(v, type=pa.string())
                        for c, v in node_rows.items()})
    edges_t = pa.table({
        "src": pa.array([e[0] for e in edges], type=pa.string()),
        "rel": pa.array([e[1] for e in edges], type=pa.string()),
        "dst": pa.array([e[2] for e in edges], type=pa.string()),
    })
    return nodes_t, edges_t
