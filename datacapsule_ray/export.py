"""GraphML export (S2 parity, tools/entity_extraction.py:253-255).

For small-scale conformance diffing against reference artifacts only:
collects the nodes/edges tables driver-side and writes GraphML via
networkx (gated behind import — absent networkx falls back to a minimal
writer). Production output stays columnar (nodes/edges/adjacency
parquet); never call this on a planet-scale graph.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset


def write_graphml(nodes: Dataset | pa.Table, edges: Dataset | pa.Table,
                  path: str) -> int:
    """Write nodes+edges as GraphML; returns node count."""
    nt = nodes.to_pandas() if hasattr(nodes, "to_pandas") else nodes.to_pandas()
    et = edges.to_pandas() if hasattr(edges, "to_pandas") else edges.to_pandas()
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
    except ImportError:  # pragma: no cover - networkx present in this env
        from xml.sax.saxutils import escape

        with open(path, "w", encoding="utf-8") as f:
            f.write('<?xml version="1.0" encoding="utf-8"?>\n'
                    '<graphml><graph edgedefault="directed">\n')
            for row in nt.to_dict("records"):
                f.write(f'<node id="{escape(str(row["node_id"]))}"/>\n')
            for row in et.to_dict("records"):
                f.write(f'<edge source="{escape(str(row["src"]))}" '
                        f'target="{escape(str(row["dst"]))}"/>\n')
            f.write("</graph></graphml>\n")
        return len(nt)
