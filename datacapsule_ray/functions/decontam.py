"""Benchmark decontamination: flag corpus documents that share any word
n-gram with a (small) benchmark/eval set — the standard pre-training
hygiene pass (GPT-3 App. C and Llama use 8–13-gram overlap removal; the
driver query uses n=4 because the synthetic corpus vocabulary is tiny).

Two-pass broadcast-side pattern (same shape as the frequent-token
broadcast in ``ssjoin.py``):

  pass 1  n-gram hashes of the BENCHMARK docs → per-block distinct →
          one driver-side union (a benchmark is fixed-size by nature —
          10^5..10^7 grams, never corpus-scale; ``broadcast_cap``
          enforces that assumption loudly) → sorted u64 array,
          ``ray.put`` once;
  pass 2  streaming ``map_batches`` over the corpus: vectorized gram
          hashing (ONE u64 hash call over the batch's flat tokens +
          n-1 fused multiply-adds), membership via ``searchsorted``
          against the broadcast array, per-doc DISTINCT-hit counts from
          one ``np.unique`` over composite (doc, gram) keys. No
          shuffle anywhere — the corpus-side pass is embarrassingly
          parallel, which is what lets it run over 100 TB.

Gram equality is decided on 64-bit polynomial hashes of the token-hash
sequence — equivalent to comparing the space-joined shingle strings a
SQL oracle compares, modulo hash collisions (~2^-64 per candidate
pair; ``ssjoin.py`` documents the same stance for its token hashes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from .dedup import _stable_u64

# odd multiplier for the rolling polynomial combine; uint64 arithmetic
# wraps (numpy unsigned ops are modular, no warnings)
_P = np.uint64(0x9E3779B97F4A7C15)


def flat_gram_hashes(hs: np.ndarray, lens: np.ndarray, n: int):
    """Polynomial n-gram hashes over a flat per-doc token-hash array.

    ``hs`` is the concatenation of every doc's token hashes, ``lens``
    the per-doc token counts. Returns ``(g, n_grams)`` where ``g`` is
    the flat array of gram hashes (doc-boundary-straddling grams
    removed) and ``n_grams[i] = max(lens[i] - n + 1, 0)``. Fully
    vectorized: n-1 multiply-add passes over the flat array plus an
    O(docs) boundary-mask loop (the ``rolling_fingerprints_batch``
    pattern in ``text.py``)."""
    n_grams = np.maximum(lens - n + 1, 0)
    m = len(hs) - n + 1
    if m <= 0 or int(n_grams.sum()) == 0:
        return np.zeros(0, dtype=np.uint64), n_grams
    g_all = hs[:m].astype(np.uint64, copy=True)
    for j in range(1, n):
        g_all = g_all * _P + hs[j:j + m]
    keep = np.zeros(m, dtype=bool)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    for s, k in zip(starts, n_grams):  # O(docs), not O(tokens)
        if k:
            keep[s:s + k] = True
    return g_all[keep], n_grams


def _batch_gram_hashes(texts: list, n: int):
    """texts → (flat gram hashes, per-doc gram counts). One
    ``_stable_u64`` call for the whole batch."""
    tok_lists = [(t or "").split() for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = [tok for toks in tok_lists for tok in toks]
    if not flat:
        return np.zeros(0, dtype=np.uint64), np.zeros(len(texts), np.int64)
    return flat_gram_hashes(_stable_u64(flat), lens, n)


def decontaminate(ds: Dataset, is_bench, *, n: int = 4,
                  text_col: str = "text", id_col: str = "doc_id",
                  broadcast_cap: int = 50_000_000,
                  stats: dict | None = None) -> Dataset:
    """Per-doc benchmark-overlap counts for the NON-benchmark docs that
    hit (doc_id, n_hits = distinct overlapping grams; clean docs are
    absent — at web scale almost everything is clean, so the hit list
    is the small side).

    ``is_bench(batch: pa.Table) -> pa.BooleanArray`` marks the
    benchmark membership of each row (e.g. an id-range or source
    predicate); benchmark rows define the gram set and are excluded
    from the output."""

    def bench_grams(batch: pa.Table) -> pa.Table:
        mask = is_bench(batch)
        texts = batch.column(text_col).filter(mask).to_pylist()
        g, _ = _batch_gram_hashes(texts, n)
        return pa.table({"g": pa.array(np.unique(g), type=pa.uint64())})

    from ..traverse import gather_table

    gt = gather_table(ds.select_columns([id_col, text_col])
                      .map_batches(bench_grams, batch_format="pyarrow"))
    bench = np.unique(gt.column("g").to_numpy(zero_copy_only=False)
                      if gt.num_rows else np.zeros(0, dtype=np.uint64))
    if len(bench) > broadcast_cap:
        raise ValueError(
            f"benchmark gram set ({len(bench)}) exceeds broadcast_cap "
            f"({broadcast_cap}): that is corpus-scale, not a benchmark — "
            "shrink the benchmark predicate or raise the cap")
    if stats is not None:
        stats["bench_grams"] = int(len(bench))
    bench_ref = ray.put(bench)

    def scan(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)  # numpy over plasma: zero-copy
        mask = is_bench(batch)
        keep = pa.compute.invert(mask)
        ids = batch.column(id_col).filter(keep)
        texts = batch.column(text_col).filter(keep).to_pylist()
        g, n_grams = _batch_gram_hashes(texts, n)
        id_type = batch.column(id_col).type
        empty = pa.table({id_col: pa.array([], type=id_type),
                          "n_hits": pa.array([], type=pa.int64())})
        # test b (the plasma-backed copy), NOT the driver-local bench:
        # referencing `bench` here would capture the whole gram array
        # in the pickled closure, duplicating the ray.put broadcast
        if len(g) == 0 or len(b) == 0:
            return empty
        pos = np.searchsorted(b, g)
        pos[pos == len(b)] = 0
        hit = b[pos] == g
        if not hit.any():
            return empty
        doc_of = np.repeat(np.arange(len(texts)), n_grams)
        # distinct (doc, gram) hits: composite sort-free unique
        comp = np.stack([doc_of[hit], g[hit].astype(np.int64)], axis=1)
        uniq = np.unique(comp, axis=0)
        docs, counts = np.unique(uniq[:, 0], return_counts=True)
        return pa.table({id_col: ids.take(pa.array(docs)),
                         "n_hits": pa.array(counts, type=pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow")
