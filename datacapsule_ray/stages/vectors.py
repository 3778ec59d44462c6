"""Embedding stage (A2) + brute-force vector search (T1/T2).

- Text formatting mirrors react_tools.py:244-250 (entity) and :264-268
  (relation) exactly.
- The default embedder is a deterministic text-hash → unit vector (tests
  are hermetic; FIXTURES.md §5); a real embedding client drops into the
  same actor interface with ``batch_size=MAX_BATCH_SIZE`` — unlike the
  reference, which declares MAX_BATCH_SIZE=100 but embeds one text per
  HTTP call (react_tools.py:253, :225-232).
- Search mirrors nanovector_db.py:69-101 + react_tools.py:281-327:
  cosine similarity, k=100 pre-filter, node_type filter, threshold,
  sort desc, top_k.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..schema import EMBED_DIM


def _opt_part(prefix: str, col) -> pa.Array:
    """', <prefix>: <value>' where value is non-null, '' otherwise —
    one vectorized join + null fill (no per-row Python)."""
    import pyarrow.compute as pc

    joined = pc.binary_join_element_wise(f", {prefix}: ", col, "")
    return pc.fill_null(joined, "")


def entity_desc_batch(batch: pa.Table) -> pa.Table:
    """Entity embedding text (M17): '实体ID: {id}, 类型: {t}, 名称: {n}'
    with null attrs omitted — react_tools.py:244-250 format, built with
    Arrow string kernels."""
    import pyarrow.compute as pc

    text = pc.binary_join_element_wise(
        pc.binary_join_element_wise("实体ID: ", batch.column("node_id"), ""),
        _opt_part("类型", batch.column("node_type")),
        _opt_part("名称", batch.column("name")),
        "")
    return pa.table({
        "entity_id": batch.column("node_id"),
        "entity_type": batch.column("node_type"),
        "entity_name": batch.column("name"),
        "text": text,
    })


def relation_desc_batch(batch: pa.Table) -> pa.Table:
    """Relation embedding text: '关系: 从 {s} 到 {t}, 类型: {r}'
    (react_tools.py:264-268), Arrow string kernels."""
    import pyarrow.compute as pc

    text = pc.binary_join_element_wise(
        pc.binary_join_element_wise(
            "关系: 从 ", batch.column("src"), " 到 ", batch.column("dst"), ""),
        _opt_part("类型", batch.column("rel")),
        "")
    return pa.table({
        "source_id": batch.column("src"),
        "target_id": batch.column("dst"),
        "relation_type": batch.column("rel"),
        "text": text,
    })


def _hash_matrix(texts: list[str], dim: int) -> np.ndarray:
    """Deterministic embeddings: sha256 digest blocks → centered bytes →
    L2-normalized float32 rows. One hashlib call per 32 dims per text;
    the byte→float conversion is a single vectorized reshape."""
    n_blocks = (dim + 31) // 32
    buf = bytearray()
    for t in texts:
        data = t.encode("utf-8")
        for b in range(n_blocks):
            buf += hashlib.sha256(b.to_bytes(2, "big") + data).digest()
    mat = (np.frombuffer(bytes(buf), dtype=np.uint8)
           .reshape(len(texts), n_blocks * 32)[:, :dim]
           .astype(np.float32) - 127.5)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def hash_embed(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic unit vector from sha256 (test embedder)."""
    return _hash_matrix([text], dim)[0]


class HashEmbedder:
    """Actor-pool embedding stage: adds a fixed-size-list 'embedding'
    column and drops 'text'. Swap for an HTTP/model client by replacing
    __init__ (client setup) and _embed (batched call)."""

    def __init__(self, dim: int = EMBED_DIM) -> None:
        self.dim = dim

    def _embed(self, texts: list[str]) -> np.ndarray:
        return _hash_matrix(texts, self.dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        mat = self._embed(texts)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), self.dim)
        return batch.drop_columns(["text"]).append_column("embedding", emb)


def build_entity_vectors(nodes: Dataset, dim: int = EMBED_DIM,
                         concurrency: int | tuple = 4, batch_size: int = 4096,
                         embedder_cls=None,
                         embedder_kwargs: dict | None = None) -> Dataset:
    """``embedder_cls`` swaps the actor-pool embedder (default
    HashEmbedder; clients.RemoteEmbedder for a real endpoint)."""
    cls = embedder_cls or HashEmbedder
    kwargs = {"dim": dim, **(embedder_kwargs or {})}
    return nodes.map_batches(entity_desc_batch, batch_format="pyarrow").map_batches(
        cls, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def build_relation_vectors(edges: Dataset, dim: int = EMBED_DIM,
                           concurrency: int | tuple = 4, batch_size: int = 4096,
                           embedder_cls=None,
                           embedder_kwargs: dict | None = None) -> Dataset:
    cls = embedder_cls or HashEmbedder
    kwargs = {"dim": dim, **(embedder_kwargs or {})}
    return edges.map_batches(relation_desc_batch, batch_format="pyarrow").map_batches(
        cls, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def _topk_batch(batch: pa.Table, q: np.ndarray, k: int, id_cols: list[str]) -> pa.Table:
    """Partial top-k within one block: cosine via a single matmul."""
    if len(batch) == 0:  # reshape(0, -1) on a zero-size array raises
        sub = batch.select(id_cols)
        return sub.append_column(
            "similarity", pa.array([], type=pa.float64()))
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    mat = np.asarray(emb.flatten(), dtype=np.float32).reshape(len(batch), -1)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = (mat @ q) / (norms * np.linalg.norm(q))
    if len(sims) > k:
        idx = np.argpartition(-sims, k)[:k]
    else:
        idx = np.arange(len(sims))
    sub = batch.select(id_cols).take(pa.array(idx))
    return sub.append_column("similarity", pa.array(sims[idx], type=pa.float64()))


def search_entities(entity_vectors: Dataset, query_text: str, *,
                    node_type: str | None = None, top_k: int = 5,
                    better_than_threshold: float = 0.7,
                    dim: int = EMBED_DIM,
                    embed_fn=hash_embed) -> pa.Table:
    """Distributed brute-force entity search (react_tools.py:281-327):
    per-block partial top-100 (map_batches) → global sort desc → type +
    threshold filter → top_k. Returns a small driver-side table."""
    import pyarrow.compute as pc

    q = embed_fn(query_text, dim)
    pre = entity_vectors.map_batches(
        lambda t: _topk_batch(t, q, 100, ["entity_id", "entity_type", "entity_name"]),
        batch_format="pyarrow",
    )
    top = pre.sort("similarity", descending=True).limit(100)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    if node_type is not None:
        t = t.filter(pc.equal(t.column("entity_type"), node_type))
    t = t.filter(pc.greater_equal(t.column("similarity"), better_than_threshold))
    return t.slice(0, top_k)


def search_relations(relation_vectors: Dataset, query_text: str, *,
                     top_k: int = 5, better_than_threshold: float = 0.7,
                     dim: int = EMBED_DIM, embed_fn=hash_embed) -> pa.Table:
    import pyarrow.compute as pc

    q = embed_fn(query_text, dim)
    pre = relation_vectors.map_batches(
        lambda t: _topk_batch(t, q, 100, ["source_id", "target_id", "relation_type"]),
        batch_format="pyarrow",
    )
    top = pre.sort("similarity", descending=True).limit(100)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    t = t.filter(pc.greater_equal(t.column("similarity"), better_than_threshold))
    return t.slice(0, top_k)
