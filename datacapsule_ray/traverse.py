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
        return cls(gather_table(nodes), gather_table(edges), **kwargs)

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
        # visited is a SET: the reference appends to a list and does O(n)
        # membership scans (react_tools.py:99), which is quadratic on the
        # kingdom→species fan-out; order is never read, so set semantics
        # are identical
        checked: set[str] = set()
        nodes: set[str] = set()
        self._find_recursive(start_node, attr_name, nodes, checked)
        return nodes

    def _find_recursive(self, node: str, target: str, nodes: set, checked: set) -> None:
        checked.add(node)
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


def gather_table(ds: Dataset) -> pa.Table:
    """Materialize a SMALL Dataset as one Arrow table — straight block
    fetch, no pandas round trip (which copies every string into object
    dtype, ≈3x peak memory, only to convert back). Broadcast-side use
    only: the caller asserts the dataset fits one node."""
    import ray

    return pa.concat_tables(ray.get(ds.to_arrow_refs()),
                            promote_options="default")


def pin_empty_null_columns(t: pa.Table,
                           typ: pa.DataType | None = None) -> pa.Table:
    """On a 0-row table, replace null-typed columns — the Arrow decay
    of empty pandas object columns — with ``typ`` (default string) so
    empty blocks cannot schema-clash with typed non-empty blocks
    (pa.concat_tables raises ArrowInvalid on the mix)."""
    if t.num_rows:
        return t
    typ = typ or pa.string()
    for i, f in enumerate(t.schema):
        if pa.types.is_null(f.type):
            t = t.set_column(i, f.name, pa.array([], typ))
    return t


def filter_select(ds: Dataset, col: str, value, *,
                  columns: list[str] | None = None,
                  drop: list[str] | None = None) -> Dataset:
    """``ds[col] == value`` filter + projection in ONE map_batches
    kernel. Ray 2.49's fused Filter->Project passes a block whose
    filter result is EMPTY through *unprojected* (the marker column
    survives on the 0-row block), so a chained
    ``.filter(expr=...).select_columns(...)`` emits blocks that
    disagree on schema — the "RefBundle with a different schema"
    warning, and a hazard for schema-sensitive consumers (unions,
    joins). One kernel projects every block it sees. (Fully empty
    INPUT blocks still bypass map_batches kernels; launder those with
    drop_empty_blocks where they can occur.)"""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        out = t.filter(pc.equal(t.column(col), value))
        if columns is not None:
            out = out.select(columns)
        if drop:
            out = out.drop_columns(drop)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


_INF_LEVEL = 1 << 30  # stand-in for float('inf') in int64 level columns


def drop_empty_blocks(ds: Dataset, empty_schema: pa.Schema | None = None
                      ) -> Dataset:
    """Launder a join output for use as a further join input: Ray
    2.49's hash join materializes received-nothing partitions as
    SCHEMA-LESS empty tables (ArrowBlockBuilder().build() with zero
    shards, join.py:105-111), empty blocks bypass map_batches, and a
    schema-less block poisons the partitioner of the next join with
    "No match for key field" errors. Rebuilding the dataset from only
    its non-empty block refs removes them — block refs and metadata
    only; no table ever lands on the driver.

    ``empty_schema`` is returned when EVERY block is empty; callers
    that guarantee at least one surviving row may omit it (the
    materialized dataset passes through unchanged in that case)."""
    import ray.data as rd

    mat = ds.materialize()
    try:
        refs = [block_ref
                for bundle in mat.iter_internal_ref_bundles()
                for block_ref, meta in zip(bundle.block_refs, bundle.metadata)
                if (meta.num_rows or 0) > 0]
    except Exception:  # pragma: no cover - internal API moved; degrade
        return mat
    if not refs:
        if empty_schema is None:
            return mat
        return rd.from_arrow(empty_schema.empty_table())
    return rd.from_arrow_refs(refs)


def build_typed_adjacency(nodes: Dataset, edges: Dataset, *,
                          hierarchy: dict[str, int] | None = None,
                          num_partitions: int = 8) -> Dataset:
    """Both-direction adjacency rows annotated with node types/levels:
    columns (node, node_lvl, other, other_type, other_lvl). Built ONCE
    with two distributed hash joins (edges ⋈ nodes on each endpoint) and
    reused across every traversal — the planet-scale substrate for
    ``find_nodes_by_type_distributed`` (nothing ever lands on the
    driver; type lookup is part of the join, not a broadcast dict)."""
    hier = NODE_HIERARCHY if hierarchy is None else hierarchy

    def typed(t: pa.Table) -> pa.Table:
        # falsy node_type → _INF_LEVEL + 1 (the DFS's `if not
        # source_type: return` dead-end — _INF_LEVEL alone marks a
        # TYPED node whose type is outside the hierarchy, which the
        # DFS still expands)
        lv = [hier.get(x, _INF_LEVEL) if x else _INF_LEVEL + 1
              for x in t.column("node_type").to_pylist()]
        return pa.table({"nid": t.column("node_id").cast(pa.string()),
                         "ntype": t.column("node_type").cast(pa.string()),
                         "nlvl": pa.array(lv, pa.int64())})

    # materialized: both endpoint joins consume nt, and a lazy nt would
    # re-execute the full nodes scan + type map for the second join
    nt = nodes.map_batches(typed, batch_format="pyarrow").materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        src = t.column("src").cast(pa.string())
        dst = t.column("dst").cast(pa.string())
        return pa.concat_tables([pa.table({"node": src, "other": dst}),
                                 pa.table({"node": dst, "other": src})])

    adj = edges.map_batches(both_dirs, batch_format="pyarrow")
    j1 = adj.join(nt, join_type="inner", num_partitions=num_partitions,
                  on=("node",), right_on=("nid",))
    j1 = j1.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "node_lvl": t.column("nlvl"),
                            "other": t.column("other")}),
        batch_format="pyarrow")
    # launder between the chained joins — see drop_empty_blocks
    j1 = drop_empty_blocks(j1, pa.schema([("node", pa.string()),
                                           ("node_lvl", pa.int64()),
                                           ("other", pa.string())]))
    j2 = j1.join(nt, join_type="inner", num_partitions=num_partitions,
                 on=("other",), right_on=("nid",))
    out_schema = pa.schema([("node", pa.string()), ("node_lvl", pa.int64()),
                            ("other", pa.string()),
                            ("other_type", pa.string()),
                            ("other_lvl", pa.int64())])
    out = j2.map_batches(
        lambda t: (pa.table({"node": t.column("node"),
                             "node_lvl": t.column("node_lvl"),
                             "other": t.column("other"),
                             "other_type": t.column("ntype"),
                             "other_lvl": t.column("nlvl")})
                   if "node" in t.column_names
                   else out_schema.empty_table()),
        batch_format="pyarrow")
    return drop_empty_blocks(out, out_schema)


def find_nodes_by_type_distributed(typed_adj: Dataset, nodes: Dataset,
                                   start_nodes: list[str], target_type: str,
                                   *, hierarchy: dict[str, int] | None = None,
                                   leaf_level: int = 7) -> Dataset:
    """J3 at planet scale: the hierarchy-monotonic traversal with the
    RESULT set fully dataset-resident. Each round broadcasts the
    frontier (one ``is_in`` semi-join over the typed adjacency — no
    shuffle) and classifies matched neighbors vectorized; target-typed
    hits accumulate as a Dataset union and are distinct-reduced ONCE at
    the end, so the potentially huge last-hop fan-out (every species
    under a kingdom, every customer under a nation) never lands on the
    driver. Driver residency is the frontier + visited set only — the
    *interior* hierarchy nodes (levels strictly between source and
    target), which the hierarchy shape keeps small; the visited set
    (the DFS's `checked`) guarantees termination on any graph shape,
    including level-skipping edges a rounds-by-level-count cap would
    silently truncate.

    (A join-per-round frontier was tried and rejected: Ray 2.49's hash
    join materializes received-nothing partitions as schema-less empty
    tables — ArrowBlockBuilder().build() at join.py:105-111 — which
    poisons chained joins over sparse frontiers with "No match for key
    field" errors. The broadcast semi-join is also strictly cheaper at
    any frontier size that fits the object store.)

    Set-semantics parity with ``GraphIndex.find_nodes_by_node_type`` on
    tree-shaped hierarchies (the corpus contract; pinned by
    tests/test_traverse.py::test_distributed_find_matches_index). On a
    multi-parent DAG the in-memory DFS's early-return can drop
    alternate ancestors; this returns the complete set (superset,
    documented divergence)."""
    import pyarrow.compute as pc

    hier = NODE_HIERARCHY if hierarchy is None else hierarchy
    target_lvl = hier.get(target_type, _INF_LEVEL)

    # source nodes at the target's level match themselves AND STOP (the
    # DFS's source_level == target_level early case returns before
    # expanding, react_tools.py / GraphIndex._find_recursive:104-106 —
    # seeding them into the frontier would wrongly collect their
    # target-level neighbors too). A falsy node_type maps to a level no
    # target can equal (the DFS's `if not source_type: return`).
    sset = pa.array(sorted(set(start_nodes)), pa.string())
    self_hits = nodes.map_batches(
        lambda t: (lambda m: pa.table(
            {"node_id": t.column("node_id").cast(pa.string()).filter(m)}))(
            pc.and_(pc.is_in(t.column("node_id").cast(pa.string()),
                             value_set=sset),
                    pc.equal(pa.array(
                        [hier.get(x, _INF_LEVEL) if x else _INF_LEVEL + 1
                         for x in t.column("node_type").to_pylist()],
                        pa.int64()), target_lvl))),
        batch_format="pyarrow").materialize()
    self_ids = set(self_hits.to_pandas()["node_id"]) \
        if self_hits.count() else set()

    frontier = pa.array(sorted(set(start_nodes) - self_ids), pa.string())
    hits: list[Dataset] = [self_hits]
    # a driver-side visited set (the DFS's `checked`) both guarantees
    # termination on any graph — including level-skipping / cyclic edges,
    # where a fixed rounds-by-level-count cap silently truncated — and
    # keeps each interior node expanded exactly once. Its size is the
    # interior-node count, which the hierarchy shape keeps small.
    visited = set(start_nodes)
    while len(frontier):
        fr = frontier

        def classify(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "other" not in t.column_names:
                return pa.table({"other": pa.array([], pa.string()),
                                 "is_hit": pa.array([], pa.bool_())})
            t = t.filter(pc.is_in(t.column("node"), value_set=fr))
            # untyped frontier nodes (node_lvl == _INF_LEVEL + 1, only
            # reachable via start_nodes) are dead ends: the DFS's
            # `if not source_type: return` neither hits nor expands them
            t = t.filter(pc.less_equal(
                t.column("node_lvl"), pa.scalar(_INF_LEVEL, pa.int64())))
            cur = t.column("node_lvl")
            nlvl = t.column("other_lvl")
            ntype = t.column("other_type")
            is_hit = pc.or_(
                pc.equal(ntype, target_type),
                pc.and_(pc.equal(nlvl, leaf_level),
                        pc.equal(pa.scalar(target_lvl, pa.int64()),
                                 leaf_level)))
            desc = pc.and_(pc.greater(pa.scalar(target_lvl, pa.int64()), cur),
                           pc.greater(nlvl, cur))
            asc = pc.and_(pc.less(pa.scalar(target_lvl, pa.int64()), cur),
                          pc.less(nlvl, cur))
            mono = pc.and_(pc.or_(desc, asc),
                           pc.less_equal(nlvl, leaf_level))
            # a recursed-into node AT the target level is itself a hit
            # (the DFS's source_level == target_level early case fires
            # on entry) — without this, a second type sharing the
            # target's level would be silently dropped
            lvl_hit = pc.and_(mono, pc.equal(nlvl,
                                             pa.scalar(target_lvl,
                                                       pa.int64())))
            full_hit = pc.or_(is_hit, lvl_hit)
            t = (t.append_column("__hit", full_hit)
                  .filter(pc.or_(full_hit, mono)))
            return pa.table({"other": t.column("other"),
                             "is_hit": t.column("__hit")})

        classified = typed_adj.map_batches(
            classify, batch_format="pyarrow").materialize()
        hits.append(classified.filter(expr="is_hit == True").map_batches(
            lambda t: (pa.table({"node_id": t.column("other")})
                       if "other" in t.column_names
                       else pa.table({"node_id": pa.array([], pa.string())})),
            batch_format="pyarrow"))
        # interior nodes to the driver — O(levels-between) cardinality
        fdf = (classified.filter(expr="is_hit == False")
               .map_batches(
                   lambda t: (pa.table({"fid": pc.unique(t.column("other"))})
                              if "other" in t.column_names
                              else pa.table({"fid": pa.array([],
                                                            pa.string())})),
                   batch_format="pyarrow").to_pandas())
        nxt = (set(fdf["fid"]) if len(fdf) else set()) - visited
        visited |= nxt
        frontier = pa.array(sorted(nxt), pa.string())

    out = hits[0]
    for h in hits[1:]:
        out = out.union(h)
    return out.groupby("node_id").count().map_batches(
        lambda t: (t.select(["node_id"]) if "node_id" in t.column_names
                   else pa.table({"node_id": pa.array([], pa.string())})),
        batch_format="pyarrow")


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
        # an all-empty edges dataset never runs hop() (empty blocks
        # bypass map_batches) and lands here with the raw edges schema
        nxt = (set(hopped["node"]) if "node" in hopped.columns
               else set()) - visited
        visited |= nxt
        cur = nxt
    return visited - set(frontier)
