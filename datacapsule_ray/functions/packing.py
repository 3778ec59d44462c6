"""Sequence packing: greedy assignment of documents into fixed
token-capacity bins — the standard pre-training batching step (each bin
becomes one training sequence of ~``cap`` tokens; T5/GPT-style data
pipelines pack per shard).

Semantics (deliberately per-PARTITION, the practitioner contract):
documents are packed in their in-partition order; a document joins the
current bin unless it would overflow ``cap``, which starts a new bin;
a document LARGER than ``cap`` gets a bin of its own (callers decide
whether to split/truncate those downstream — flagged ``oversized``).
Packing state is a sequential scan by construction, so exact GLOBAL
greedy packing cannot parallelize; per-partition packing is both the
industry-standard semantics and embarrassingly parallel. Bin identity
is content-derived (the first document id in the bin), so results are
independent of block numbering and stable under resume.

The per-block kernel loops over BINS, not documents: each bin boundary
is one ``np.searchsorted`` into the token prefix-sum — O(bins log n)
per block, vectorized within.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _pack_block(tokens: np.ndarray, cap: int) -> np.ndarray:
    """Greedy bin index per doc (0-based, block-local)."""
    n = len(tokens)
    bins = np.empty(n, dtype=np.int64)
    cs = np.cumsum(tokens)
    start = 0
    b = 0
    while start < n:
        base = cs[start - 1] if start else 0
        if tokens[start] > cap:
            end = start + 1          # oversized doc → its own bin
        else:
            # largest end with sum(tokens[start:end]) <= cap
            end = int(np.searchsorted(cs, base + cap, side="right"))
            end = max(end, start + 1)
        bins[start:end] = b
        b += 1
        start = end
    return bins


def pack_sequences(ds: Dataset, *, token_col: str = "n_tokens",
                   id_col: str = "doc_id", cap: int = 2048) -> Dataset:
    """Per-partition greedy packing plan.

    Output columns: ``id_col`` (one row per input doc), ``bin_id`` (the
    first doc id of the doc's bin — content-derived, deterministic),
    ``bin_tokens`` (total tokens in the bin), ``n_docs_in_bin``, and
    ``oversized`` (the doc alone exceeds ``cap``)."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")

    def pack(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if n == 0:
            return pa.table({
                id_col: ids,
                "bin_id": pa.array([], type=ids.type),
                "bin_tokens": pa.array([], type=pa.int64()),
                "n_docs_in_bin": pa.array([], type=pa.int64()),
                "oversized": pa.array([], type=pa.bool_()),
            })
        # null token counts → 0 IN ARROW (a null int column decays to
        # float64/NaN in to_numpy, and NaN.astype(int64) is INT64_MIN —
        # which would corrupt the prefix sums and every bin in the block)
        import pyarrow.compute as pc

        tok_col = t.column(token_col)
        if isinstance(tok_col, pa.ChunkedArray):
            tok_col = tok_col.combine_chunks()
        if tok_col.null_count:
            tok_col = pc.fill_null(tok_col, 0)
        tokens = tok_col.to_numpy(zero_copy_only=False).astype(np.int64)
        bins = _pack_block(tokens, cap)
        nbins = int(bins[-1]) + 1
        totals = np.zeros(nbins, dtype=np.int64)
        np.add.at(totals, bins, tokens)
        counts = np.bincount(bins, minlength=nbins).astype(np.int64)
        firsts = np.zeros(nbins, dtype=np.int64)
        change = np.ones(n, dtype=bool)
        change[1:] = bins[1:] != bins[:-1]
        firsts[bins[change]] = np.flatnonzero(change)
        return pa.table({
            id_col: ids,
            "bin_id": ids.take(pa.array(firsts[bins])),
            "bin_tokens": pa.array(totals[bins]),
            "n_docs_in_bin": pa.array(counts[bins]),
            "oversized": pa.array(tokens > cap),
        })

    return ds.map_batches(pack, batch_format="pyarrow")


def pack_sequences_ref(ids: list, tokens: list[int], cap: int) -> list[dict]:
    """Sequential reference implementation (one partition) for tests."""
    out: list[dict] = []
    cur: list[int] = []
    cur_tok = 0

    def flush():
        for i in cur:
            out.append({"id": ids[i], "bin_id": ids[cur[0]],
                        "bin_tokens": cur_tok, "n_docs_in_bin": len(cur),
                        "oversized": tokens[i] > cap})

    for i, tk in enumerate(tokens):
        if cur and cur_tok + tk > cap:
            flush()
            cur, cur_tok = [], 0
        cur.append(i)
        cur_tok += tk
    if cur:
        flush()
    return out
