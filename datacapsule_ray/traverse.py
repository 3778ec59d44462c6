"""Graph traversal over the materialized nodes/edges tables — the
query-side contract of the reference's ReActTools (react_tools.py:42-210),
re-expressed without a resident NetworkX graph.

Two tiers:
- ``GraphIndex``: an in-memory adjacency built once from the tables and
  shareable via ``ray.put`` (the A4 replacement for graphs that fit a
  node — exactly what the serving layer held). Reproduces the
  reference's hierarchy-monotonic DFS semantics bug-for-bug
  (react_tools.py:92-181), including the visited-set and the
  early-return when the target level ≤ source level.
- ``expand_frontier``: distributed k-round expansion for graphs too
  large for one node — each round is a vectorized semi-join of the
  broadcast frontier against the edges Dataset (no shuffle; the
  frontier is the small side).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from ray.data import Dataset

from .schema import NODE_HIERARCHY


class GraphIndex:
    """Adjacency + attribute maps from the nodes/edges tables.

    Mirrors ReActTools: ``find_nodes_by_node_type`` (react_tools.py:80-89),
    ``get_node_attribute`` (:184-190), ``get_adjacent_node_descriptions``
    (:192-210), plus the batch variant with the *intended* semantics of
    dspy_inference.py:64-78 (the reference loops over the whole list by
    mistake at :76 — documented divergence)."""

    def __init__(self, nodes: pa.Table, edges: pa.Table, *,
                 hierarchy: dict[str, int] | None = None,
                 leaf_level: int = 7) -> None:
        # hierarchy is data, not a constant: the same traversal semantics
        # apply to any typed DAG (the agent runs it over the relational
        # region→nation→customer graph with its own level map).
        # leaf_level = the deepest level that participates in recursion,
        # at which distinct type names are equivalent (species semantics:
        # 种 == 中文学名 at level 7, react_tools.py:118-122).
        self.hierarchy = NODE_HIERARCHY if hierarchy is None else hierarchy
        self.leaf_level = leaf_level
        self.attrs: dict[str, dict] = {}
        for row in nodes.to_pylist():
            node_id = row.pop("node_id")
            self.attrs[node_id] = {k: v for k, v in row.items() if v is not None}
        self.out_adj: dict[str, list[tuple[str, str]]] = defaultdict(list)
        self.in_adj: dict[str, list[tuple[str, str]]] = defaultdict(list)
        for row in edges.to_pylist():
            self.out_adj[row["src"]].append((row["rel"], row["dst"]))
            self.in_adj[row["dst"]].append((row["rel"], row["src"]))

    @classmethod
    def from_datasets(cls, nodes: Dataset, edges: Dataset,
                      **kwargs) -> "GraphIndex":
        # straight Arrow materialization — the pandas round trip copied
        # every string into object dtype (≈3x peak memory) only to
        # convert back
        import ray

        def gather(ds: Dataset) -> pa.Table:
            return pa.concat_tables(ray.get(ds.to_arrow_refs()),
                                    promote_options="default")

        return cls(gather(nodes), gather(edges), **kwargs)

    # --- J2 ---
    def get_node_attribute(self, node_id: str) -> dict:
        return self.attrs[node_id]

    def nodes_count(self) -> int:
        return len(self.attrs)

    def _neighbors(self, node: str) -> list[str]:
        # set-union of out- and in-neighbors (react_tools.py:134-136);
        # sorted for deterministic traversal order (the reference's order
        # is dict-insertion dependent)
        ns = {d for _, d in self.out_adj.get(node, ())}
        ns |= {s for _, s in self.in_adj.get(node, ())}
        return sorted(ns)

    # --- J3 ---
    def find_nodes_by_node_type(self, start_node: str, attr_name: str) -> set[str]:
        checked: list[str] = []
        nodes: set[str] = set()
        self._find_recursive(start_node, attr_name, nodes, checked)
        return nodes

    def _find_recursive(self, node: str, target: str, nodes: set, checked: list) -> None:
        checked.append(node)
        if node not in self.attrs:
            return
        source_type = self.attrs[node].get("node_type")
        if not source_type:
            return
        source_level = self.hierarchy.get(source_type, float("inf"))
        target_level = self.hierarchy.get(target, float("inf"))
        if source_level == target_level:
            nodes.add(node)
            return
        for neighbor in self._neighbors(node):
            if neighbor in checked:
                continue
            ntype = self.attrs.get(neighbor, {}).get("node_type")
            if not ntype:
                continue
            nlevel = self.hierarchy.get(ntype, float("inf"))
            if ntype == target or (nlevel == self.leaf_level
                                   and nlevel == target_level):
                nodes.add(neighbor)
                if target_level <= source_level:
                    return
            elif nlevel <= self.leaf_level:
                if target_level < source_level and nlevel < source_level:
                    self._find_recursive(neighbor, target, nodes, checked)
                elif target_level > source_level and nlevel > source_level:
                    self._find_recursive(neighbor, target, nodes, checked)

    # --- J5 (intended semantics) ---
    def batch_find_nodes_by_node_type(self, start_nodes: list[str],
                                      attr_name: str) -> set[str]:
        out: set[str] = set()
        for node in start_nodes:
            out |= self.find_nodes_by_node_type(node, attr_name)
        return out

    # --- J4 ---
    def get_adjacent_node_descriptions(self, nodenames: list[str]) -> list[str]:
        result: set[str] = set()
        for name in nodenames:
            for neighbor in self._neighbors(name):
                desc = self.attrs.get(neighbor, {}).get("description")
                if desc:
                    result.add(desc)
        return list(result)


def expand_frontier(edges: Dataset, frontier: set[str], *, rounds: int = 1,
                    direction: str = "both") -> set[str]:
    """Distributed neighbor expansion: k rounds of broadcast semi-join of
    the frontier against the edges table. Each round is one map_batches
    pass (frontier rides the closure → object store once); visited nodes
    are excluded driver-side (the frontier is small by assumption —
    document: per-round frontier must fit on the driver)."""
    import pyarrow.compute as pc

    if direction not in ("out", "in", "both"):
        # fail at the call site — an unknown value would otherwise
        # surface as an opaque concat_tables([]) error inside a worker
        raise ValueError(f"direction must be 'out', 'in' or 'both', "
                         f"got {direction!r}")
    visited = set(frontier)
    cur = set(frontier)
    for _ in range(rounds):
        if not cur:
            break
        fr = pa.array(sorted(cur))

        def hop(t: pa.Table) -> pa.Table:
            outs = []
            if direction in ("out", "both"):
                m = pc.is_in(t.column("src"), value_set=fr)
                outs.append(t.filter(m).select(["dst"]).rename_columns(["node"]))
            if direction in ("in", "both"):
                m = pc.is_in(t.column("dst"), value_set=fr)
                outs.append(t.filter(m).select(["src"]).rename_columns(["node"]))
            return pa.concat_tables(outs)

        hopped = edges.map_batches(hop, batch_format="pyarrow").to_pandas()
        nxt = set(hopped["node"]) - visited
        visited |= nxt
        cur = nxt
    return visited - set(frontier)
