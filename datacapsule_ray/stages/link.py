"""Entity linking / canonicalization stage (A3).

The reference resolves fuzzy surfaces → exact node names only at query
time (vector search with top_k=1, threshold 0.65 —
dspy_inference.py:80-123). The north rule moves linking to construction
time: an alias/synonym dictionary is broadcast once via ``ray.put`` and a
stateful actor pool rewrites location-mention surfaces to canonical IDs
inside ``map_batches`` — a broadcast-small-side join, never a shuffle
(SURVEY.md §2.4 J6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class LinkerActor:
    """Canonicalize 自然分布地 surfaces in the emissions stream.

    ``alias_ref`` is an ``ObjectRef`` to the alias dict — placed in the
    object store ONCE on the driver and fetched ONCE per actor (zero-copy
    shared on the same node), not re-shipped per batch."""

    def __init__(self, alias_ref) -> None:
        self.aliases: dict[str, str] = ray.get(alias_ref)

    def _map_col(self, col: pa.ChunkedArray | pa.Array, mask: np.ndarray) -> pa.Array:
        vals = col.to_pylist()
        get = self.aliases.get
        out = [get(v, v) if (m and v is not None) else v for v, m in zip(vals, mask)]
        return pa.array(out, type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        obj_type = batch.column("obj_type").to_numpy(zero_copy_only=False)
        node_type = batch.column("node_type").to_numpy(zero_copy_only=False)
        loc_triple = obj_type == "自然分布地"
        loc_node = node_type == "自然分布地"
        if not loc_triple.any() and not loc_node.any():
            return batch
        cols = {name: batch.column(name) for name in batch.column_names}
        if loc_triple.any():
            cols["obj"] = self._map_col(batch.column("obj"), loc_triple)
        if loc_node.any():
            cols["node_id"] = self._map_col(batch.column("node_id"), loc_node)
            cols["name"] = self._map_col(batch.column("name"), loc_node)
        return pa.table(cols)
