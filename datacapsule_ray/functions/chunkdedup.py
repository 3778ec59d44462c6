"""Sub-document (chunk-level) cross-corpus deduplication — the
C4/RefinedWeb "remove lines repeated across many documents" pass,
adapted to word-window chunks (boilerplate headers, license blocks,
navigation text repeat VERBATIM across pages; whole-doc dedup never
sees them).

Shape (reference has no such operator; this is training-data-pipeline
coverage like functions/dedup.py):

1. **Chunking** (streaming map): each doc's token stream is cut into
   disjoint ``width``-word windows → (id, ci, chunk) rows. Arrow
   ``split_pattern`` tokenizes; window boundaries come from the list
   offsets in numpy. Only the chunk-string assembly itself is a Python
   loop (strings have to be built element-wise in any engine).
2. **Document frequency** (ONE shuffle): a doc lives in exactly one
   input row, so per-batch local distinct (chunk, doc) pairs are
   already globally distinct — ``groupby(chunk).count()`` over them IS
   COUNT(DISTINCT doc). No second distinct pass.
3. **Hot set**: chunks with df >= ``min_df``. Broadcast via ``ray.put``
   while it fits ``broadcast_limit`` (boilerplate sets are small by
   nature: df >= k caps the set at corpus_chunks/k); a distributed
   LEFT ANTI join on the chunk key takes over past that — the same
   size-probe + fallback convention as pipelines/docops.py's
   contamination drop.
4. **Reassembly** (ONE sort exchange): chunks re-derived streaming
   (cheaper than shuffling them twice), marked keep/drop, then
   ``sort(id, ci)`` + per-block run-joins; the ≤2 edge runs per block
   are re-joined driver-side — O(blocks) rows, never O(docs). Docs
   whose every chunk was hot drop out (SQL ``HAVING SUM(keep) > 0``).

At 100 TB the shuffles carry (chunk, id) pairs and kept chunks once
each; a production variant would shuffle 8-byte chunk fingerprints and
re-derive text at reassembly — exact chunk strings are kept here so
the operator is bit-exact against its SQL oracle (the fingerprint
variant exists as functions/text.py fingerprints + this same plan)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

BROADCAST_LIMIT = 2_000_000


def _chunk_table(t: pa.Table, id_col: str, text_col: str,
                 width: int) -> pa.Table:
    """(id, ci, chunk): disjoint width-word windows per doc (the tail
    window may be shorter). Empty texts yield zero chunks."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    toks = pc.split_pattern(t.column(text_col), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    vals = toks.values.to_numpy(zero_copy_only=False)
    lens = offsets[1:] - offsets[:-1]
    n_chunks = -(-lens // width)  # ceil
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], type=t.schema.field(id_col).type),
                         "ci": pa.array([], type=pa.int64()),
                         "chunk": pa.array([], type=pa.string())})
    doc_of = np.repeat(np.arange(len(ids)), n_chunks)
    cum = np.zeros(len(ids), dtype=np.int64)
    cum[1:] = np.cumsum(n_chunks)[:-1]
    ci = np.arange(total, dtype=np.int64) - cum[doc_of]
    starts = offsets[:-1][doc_of] + ci * width
    ends = np.minimum(starts + width, offsets[1:][doc_of])
    chunks = [" ".join(vals[s:e]) for s, e in zip(starts, ends)]
    return pa.table({id_col: pa.array(ids[doc_of]),
                     "ci": pa.array(ci),
                     "chunk": pa.array(chunks, type=pa.string())})


def hot_chunks(ds: Dataset, *, id_col: str = "doc_id",
               text_col: str = "text", width: int = 3,
               min_df: int = 4) -> Dataset:
    """Chunks appearing in >= min_df distinct docs, with their df."""

    def local_pairs(t: pa.Table) -> pa.Table:
        c = _chunk_table(t, id_col, text_col, width)
        # per-batch distinct (chunk, doc): docs never span batches, so
        # this is globally distinct already
        return (c.select(["chunk", id_col])
                 .group_by(["chunk", id_col], use_threads=False)
                 .aggregate([]))

    df = (ds.map_batches(local_pairs, batch_format="pyarrow")
            .groupby("chunk").count()
            .map_batches(lambda t: t.rename_columns(["chunk", "df"]),
                         batch_format="pyarrow"))
    return df.filter(expr=f"df >= {min_df}")


def chunk_dedup(ds: Dataset, *, id_col: str = "doc_id",
                text_col: str = "text", width: int = 3, min_df: int = 4,
                broadcast_limit: int = BROADCAST_LIMIT) -> Dataset:
    """Remove every chunk whose exact text occurs in >= min_df distinct
    docs; returns (id, text_clean, n_kept, n_removed), docs with no
    surviving chunk dropped."""
    import ray
    import ray.data as rd

    from ..traverse import drop_empty_blocks as _deb

    hot = _deb(hot_chunks(ds, id_col=id_col, text_col=text_col,
                          width=width, min_df=min_df)
               .select_columns(["chunk"]),
               pa.schema([("chunk", pa.string())]))
    n_hot = hot.count()  # free: the laundering materialized it

    id_type = pa.int64()

    if n_hot <= broadcast_limit:
        hot_ref = ray.put(pa.concat_tables(
            [pa.table({"chunk": b["chunk"]})
             for b in hot.iter_batches(batch_format="pyarrow")]
            or [pa.table({"chunk": pa.array([], type=pa.string())})]
        ).column("chunk").combine_chunks())

        def mark(t: pa.Table) -> pa.Table:
            c = _chunk_table(t, id_col, text_col, width)
            drop = pc.is_in(c.column("chunk"), value_set=ray.get(hot_ref))
            return c.append_column(
                "keep", pc.cast(pc.invert(drop), pa.int64()))

        marked = ds.map_batches(mark, batch_format="pyarrow")
    else:  # pragma: no cover - exercised only at hot-set blowup scale
        def chunks_of(t: pa.Table) -> pa.Table:
            return _chunk_table(t, id_col, text_col, width)

        all_chunks = ds.map_batches(chunks_of, batch_format="pyarrow")
        hot_marked = hot.map_batches(
            lambda t: t.append_column("__hot", pa.array(
                np.ones(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow")
        joined = all_chunks.join(hot_marked, join_type="left_outer",
                                 num_partitions=max(8, n_hot // 500_000),
                                 on=("chunk",))

        def finish_mark(t: pa.Table) -> pa.Table:
            keep = pc.cast(pc.is_null(t.column("__hot")), pa.int64())
            return (t.drop_columns(["__hot"]).append_column("keep", keep))

        marked = joined.map_batches(finish_mark, batch_format="pyarrow")

    srt = marked.sort([id_col, "ci"])

    out_schema = pa.schema([
        (id_col, id_type), ("text_clean", pa.string()),
        ("n_kept", pa.int64()), ("n_removed", pa.int64()),
        ("min_ci", pa.int64()), ("edge", pa.bool_()),
    ])

    def run_join(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ci = t.column("ci").to_numpy(zero_copy_only=False)
        keep = t.column("keep").to_numpy(zero_copy_only=False)
        chunk = t.column("chunk").to_numpy(zero_copy_only=False)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n)
        kept_text = [" ".join(chunk[s:e][keep[s:e] == 1])
                     for s, e in zip(starts, ends)]
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = edge[-1] = True
        return pa.table({
            id_col: pa.array(ids[starts]),
            "text_clean": pa.array(kept_text, type=pa.string()),
            "n_kept": pa.array(np.add.reduceat(keep, starts)),
            "n_removed": pa.array(
                (ends - starts) - np.add.reduceat(keep, starts)),
            "min_ci": pa.array(ci[starts]),
            "edge": pa.array(edge),
        }, schema=out_schema)

    partial = _deb(srt.map_batches(run_join, batch_format="pyarrow"))

    def interior_fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t.column("edge"), False),
                             pc.greater(t.column("n_kept"), 0)))
        return t.select([id_col, "text_clean", "n_kept", "n_removed"])

    interior = partial.map_batches(interior_fn, batch_format="pyarrow")
    edge_df = partial.filter(expr="edge == True").to_pandas()
    if not len(edge_df):
        return interior
    # a doc's partials cover disjoint contiguous ci ranges; min_ci
    # restores global order regardless of block arrival order
    edge_df = edge_df.sort_values([id_col, "min_ci"], kind="stable")
    g = edge_df.groupby(id_col, sort=False)
    fixed = pa.table({
        id_col: pa.array(g[id_col].first().to_numpy()),
        "text_clean": pa.array(
            [" ".join(p for p in parts if p)
             for parts in g["text_clean"].agg(list)], type=pa.string()),
        "n_kept": pa.array(g["n_kept"].sum().to_numpy().astype(np.int64)),
        "n_removed": pa.array(
            g["n_removed"].sum().to_numpy().astype(np.int64)),
    })
    fixed = fixed.filter(pc.greater(fixed.column("n_kept"), 0))
    return interior.union(rd.from_arrow(fixed))
