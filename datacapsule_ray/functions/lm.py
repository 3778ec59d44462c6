"""Corpus-trained bigram language-model scoring — the CCNet-style
"perplexity filter" of the text-quality family (a small LM trained on
the corpus scores each document; outliers are junk or contamination).

Two passes, both streaming:

1. TRAIN: bigram and unigram hash counts via block-local
   ``np.unique`` partials + one count groupby each (the
   ``_frequent_token_df`` shape). The model tables are
   vocabulary-sized, not corpus-sized; ``model_cap`` bounds the
   driver-collected model (rarest entries dropped COUNTED — at real
   scale you prune by min-count, the standard LM cut, and the drop
   accounting shows exactly how much mass left).
2. SCORE: the (sorted-array, counts) model broadcast once via
   ``ray.put``; each doc's mean negative log2 of add-one-smoothed
   bigram probabilities -log2((c(ab)+1)/(c(a)+V)) is one vectorized
   searchsorted per batch.

Scores are floats (log), so the oracle story is rows-only + a
pure-python reference parity pytest (the HLL/sketch convention);
within a doc the mean is computed in input token order — deterministic
under any partitioning because scoring is row-local.

Token/gram hashing is shared with decontamination and the ssjoin
(``decontam._batch_gram_hashes``), so "same bigram" means the same
thing across the whole text family.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

logger = logging.getLogger(__name__)


def _hash_counts(ds: Dataset, text_col: str, n: int) -> Dataset:
    """(gram u64-hash, count) over the corpus: block-local unique+count
    partials, one groupby-sum."""
    from .decontam import _batch_gram_hashes

    def partial(t: pa.Table) -> pa.Table:
        g, _ = _batch_gram_hashes(t.column(text_col).to_pylist(), n)
        uq, cnt = np.unique(g, return_counts=True)
        return pa.table({"g": pa.array(uq.view(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "g").sum("n")


def bigram_lm_scores(ds: Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id",
                     model_cap: int = 5_000_000,
                     stats: dict | None = None) -> Dataset:
    """(id, n_bigrams, nll_bits): mean negative log2 add-one-smoothed
    bigram probability per document under the corpus-trained model.
    Documents with no bigram (fewer than 2 tokens) are not emitted."""
    counts2 = _hash_counts(ds, text_col, 2).to_pandas()
    counts1 = _hash_counts(ds, text_col, 1).to_pandas()
    vocab_n = len(counts1)
    dropped = 0
    for name, frame in (("bigram", counts2), ("unigram", counts1)):
        if len(frame) > model_cap:
            frame.sort_values(["sum(n)", "g"], ascending=[False, True],
                              inplace=True)
            n_drop = len(frame) - model_cap
            dropped += n_drop
            frame.drop(frame.index[model_cap:], inplace=True)
            logger.warning("bigram_lm_scores: %s model capped at %d "
                           "(dropped rarest %d entries)", name,
                           model_cap, n_drop)
    if stats is not None:
        stats["dropped_model_entries"] = dropped
        stats["vocab_n"] = vocab_n

    def pack(frame) -> tuple[np.ndarray, np.ndarray]:
        g = frame["g"].to_numpy().view(np.uint64)
        n = frame["sum(n)"].to_numpy().astype(np.int64)
        order = np.argsort(g)
        return g[order], n[order]

    model_ref = ray.put((pack(counts2), pack(counts1), vocab_n))

    def lookup(keys: np.ndarray, tab: tuple[np.ndarray, np.ndarray]
               ) -> np.ndarray:
        gk, gn = tab
        if len(gk) == 0:
            return np.zeros(len(keys), dtype=np.int64)
        idx = np.minimum(np.searchsorted(gk, keys), len(gk) - 1)
        return np.where(gk[idx] == keys, gn[idx], 0)

    def score(t: pa.Table) -> pa.Table:
        from ..functions.ssjoin import _cached_get
        from .decontam import _batch_gram_hashes

        bi_tab, uni_tab, v = _cached_get(model_ref)
        texts = t.column(text_col).to_pylist()
        bg, n_bg = _batch_gram_hashes(texts, 2)
        ug, n_ug = _batch_gram_hashes(texts, 1)
        # context unigram of bigram i is token i within its doc
        starts_u = np.concatenate(([0], np.cumsum(n_ug)))
        ctx = np.concatenate([
            ug[starts_u[i]:starts_u[i] + n_bg[i]]
            for i in range(len(texts))]) if len(bg) else ug[:0]
        cb = lookup(bg, bi_tab)
        cu = lookup(ctx, uni_tab)
        bits = -np.log2((cb + 1.0) / (cu + float(v)))
        ends = np.cumsum(n_bg)
        starts = ends - n_bg
        keep = n_bg > 0
        sums = np.add.reduceat(bits, starts[keep]) if keep.any() else \
            np.zeros(0)
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(keep)),
            "n_bigrams": pa.array(n_bg[keep]),
            "nll_bits": pa.array(sums / n_bg[keep])})

    return ds.map_batches(score, batch_format="pyarrow")
