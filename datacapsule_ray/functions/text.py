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


def token_stats_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Per-doc integer stats: n_tokens (whitespace), n_chars, n_stop_en,
    n_punct_chars. Integers only so a SQL oracle can match exactly.
    Null text counts as empty (like the siblings' ``(t or '')``)."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.utf8_split_whitespace(trimmed)
    # ONE list_value_length call: raw lengths drive the flat parent
    # index; the n_tokens copy is normalized for the empty-string case
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    n_tokens = lengths.astype(np.int64).copy()
    # empty string splits to [''] in SQL but [] here; normalize: 0 tokens
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    n_tokens[empty] = 0
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)

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
    """Heuristic quality features: mean token length, stopword ratio —
    the usual pre-training quality filters.

    mean_token_len is EXACT (sum of per-token utf8 lengths / tokens):
    the previous chars-minus-separators formula assumed exactly one
    separator between tokens, inflating the mean for whitespace-padded
    or double-spaced documents."""
    stats = token_stats_batch(batch, text_col, id_col)
    n_tokens = stats.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    n_stop = stats.column("n_stop_en").to_numpy(zero_copy_only=False).astype(np.float64)

    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    tok_chars = pc.utf8_length(toks.flatten()).to_numpy(
        zero_copy_only=False).astype(np.float64)
    parent = np.repeat(np.arange(len(texts)), lengths)
    total_tok_chars = np.zeros(len(texts), dtype=np.float64)
    np.add.at(total_tok_chars, parent, tok_chars)

    denom = np.maximum(n_tokens, 1.0)
    return stats.append_column(
        "mean_token_len", pa.array(total_tok_chars / denom)
    ).append_column(
        "stop_ratio", pa.array(n_stop / denom)
    )


def lang_hit_counts(texts: pa.Array | pa.ChunkedArray,
                    profiles: dict[str, pa.Array]) -> np.ndarray:
    """(n_docs × n_profiles) stopword hit-count matrix — the shared
    vectorized kernel of ``LangIdActor`` (argmax voting) and
    ``docops.doc_lang_marker_counts`` (raw evidence columns): lower/
    trim/split once, one ``pc.is_in`` per profile, per-doc sums via a
    parent-index scatter-add."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # null text counts as empty — a null list would make
    # list_value_length float64/NaN and crash the np.repeat below
    texts = pc.fill_null(texts, "")
    toks = pc.utf8_split_whitespace(
        pc.utf8_lower(pc.utf8_trim_whitespace(texts)))
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    parent = np.repeat(np.arange(len(texts)), lengths)
    scores = np.zeros((len(texts), len(profiles)), dtype=np.int64)
    for j, prof in enumerate(profiles.values()):
        hit = pc.is_in(flat, value_set=prof)
        np.add.at(scores[:, j], parent,
                  hit.to_numpy(zero_copy_only=False).astype(np.int64))
    return scores


class LangIdActor:
    """Actor-pool language-ID stage: stopword-profile voting.

    Profiles live in actor state (loaded once per actor — the A1 shape);
    scoring is vectorized (``lang_hit_counts``)."""

    def __init__(self) -> None:
        self.profiles = {
            lang: pa.array(sorted(words)) for lang, words in LANG_PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = lang_hit_counts(batch.column("text"), self.profiles)
        langs = list(self.profiles)
        best = np.asarray(langs, dtype=object)[scores.argmax(axis=1)]
        best[scores.max(axis=1) == 0] = "und"
        return batch.append_column("lang_guess", pa.array(best, type=pa.string()))


def lang_id(ds: Dataset, concurrency=(1, 4)) -> Dataset:
    return ds.map_batches(LangIdActor, batch_format="pyarrow",
                          concurrency=concurrency)


def md5_hex_batch(texts: pa.Array | pa.ChunkedArray) -> list[str]:
    """Per-row md5 hex digests of an Arrow string column straight off
    the column's UTF-8 data buffer: offsets come from the Arrow offsets
    buffer, each row hashes a memoryview SLICE — no per-row Python
    string materialization or ``.encode()`` copy (those dominated the
    old ``to_pylist`` loop). The digest itself is contract-bound to md5
    (SQL ``md5()`` parity), so one C call per row remains; nulls hash
    like '' (the ``(t or '')`` convention)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if pa.types.is_large_string(texts.type):
        off_dtype = np.int64
    else:
        texts = texts.cast(pa.string())
        off_dtype = np.int32
    bufs = texts.buffers()  # [validity, offsets, data]
    itemsize = np.dtype(off_dtype).itemsize
    offsets = np.frombuffer(bufs[1], dtype=off_dtype,
                            count=len(texts) + 1,
                            offset=texts.offset * itemsize)
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    return [md5(data[offsets[i]:offsets[i + 1]]).hexdigest()
            for i in range(len(texts))]


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """MD5 content fingerprint (exact-dedup key; matches SQL md5())."""
    fps = md5_hex_batch(batch.column(text_col))
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


def bigram_counts(ds: Dataset, *, top_n: int = 20, text_col: str = "text",
                  id_col: str = "doc_id") -> Dataset:
    """Corpus-wide top-N word bigrams — the n-gram-count family (word
    count's big sibling). Per-batch partial counts (vectorized
    ``np.char.add`` over the flat token array with doc-boundary pairs
    masked out) keep the shuffle at batch-vocabulary size; a (bigram)
    groupby sums partials; deterministic order (n DESC, bigram ASC)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # fully vectorized: Arrow tokenize → dictionary-encode → count
        # bigrams as packed int64 code pairs (np.unique on ints beats
        # string value_counts), decode once per distinct bigram
        texts = pc.fill_null(batch.column(text_col), "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        dic = pc.dictionary_encode(flat)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # pair i is (flat[i], flat[i+1]); mask pairs that cross docs.
        # (a trimmed-empty doc contributes one '' token, but it can
        # only pair across its own doc boundary — always masked)
        ends = np.cumsum(lens)
        valid = np.ones(len(flat) - 1, dtype=bool)
        cross = ends[(ends > 0) & (ends < len(flat))] - 1
        valid[cross] = False
        V = np.int64(len(dic.dictionary))
        packed = codes[:-1][valid] * V + codes[1:][valid]
        uniq, cnt = np.unique(packed, return_counts=True)
        lhs = dic.dictionary.take(pa.array(uniq // V)).cast(pa.string())
        rhs = dic.dictionary.take(pa.array(uniq % V)).cast(pa.string())
        return pa.table({
            "bigram": pc.binary_join_element_wise(lhs, rhs, " "),
            "n": pa.array(cnt.astype(np.int64))})

    counts = (ds.select_columns([id_col, text_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("bigram").aggregate(Sum("n", alias_name="n")))
    return (counts.sort(["n", "bigram"], descending=[True, False])
            .limit(top_n))


def top_distinctive_terms(ds: Dataset, *, text_col: str = "text",
                          id_col: str = "doc_id",
                          num_partitions: int = 4) -> Dataset:
    """Per-doc most distinctive term under a pure-integer TF-IDF rank:
    highest term frequency, then LOWEST document frequency, then the
    lexicographically first token (float-free, so a SQL oracle matches
    hash-for-hash). tf rows shuffle once for the df count, once for the
    tf⋈df join, then one sort + per-doc first-row selection with the
    usual block-boundary fixup (driver sees O(blocks) rows)."""
    import pandas as pd

    import ray.data as rd
    from ray.data.aggregate import Count

    def tf_rows(batch: pa.Table) -> pa.Table:
        # fully vectorized (the old per-doc np.unique loop dominated
        # this stage): Arrow tokenize → dictionary-encode the flat
        # token array → lexsort pure-int (code, parent) pairs → run
        # boundaries give each doc's distinct tokens + counts. One id
        # `take` keeps the input id type (string or int64).
        import pyarrow.compute as pc

        texts = pc.fill_null(batch.column(text_col), "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return pa.table({
                id_col: pa.array([], type=batch.column(id_col).type),
                "token": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64())})
        dic = pc.dictionary_encode(flat)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(texts)), lengths)
        order = np.lexsort((codes, parent))
        p_s, c_s = parent[order], codes[order]
        change = np.ones(len(order), dtype=bool)
        change[1:] = (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(order)))
        ids = batch.column(id_col).take(pa.array(p_s[starts]))
        tokens = dic.dictionary.take(pa.array(c_s[starts])).cast(pa.string())
        out = pa.table({id_col: ids, "token": tokens,
                        "tf": pa.array(counts.astype(np.int64))})
        # a trimmed-EMPTY doc splits to [''] in Arrow (Python .split()
        # gives []) — drop the empty-token rows so empty docs emit
        # nothing, like the old per-doc loop
        return out.filter(pc.not_equal(out.column("token"), ""))

    tf = ds.select_columns([id_col, text_col]).map_batches(
        tf_rows, batch_format="pyarrow").materialize()
    df = tf.groupby("token").aggregate(Count(alias_name="df"))
    joined = tf.join(df, join_type="inner", num_partitions=num_partitions,
                     on=("token",))

    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("tf_neg", pc.negate(t.column("tf")))

    srt = joined.map_batches(neg, batch_format="pyarrow").sort(
        [id_col, "tf_neg", "df", "token"]).materialize()

    def first_per_doc(t: pa.Table) -> pa.Table:
        # Arrow in/out: id types ride through untouched (string or
        # int64) and every block carries one schema
        n = t.num_rows
        t = t.select([id_col, "token", "tf", "df"])
        if n == 0:
            return t.append_column("edge", pa.array([], type=pa.bool_()))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        new = np.ones(n, dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        out = t.take(pa.array(starts))
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = edge[-1] = True
        return out.append_column("edge", pa.array(edge))

    firsts = srt.map_batches(first_per_doc, batch_format="pyarrow").materialize()
    interior = firsts.filter(expr="edge == False").map_batches(
        lambda t: t.select([id_col, "token", "tf", "df"]),
        batch_format="pyarrow")
    edge_df = firsts.filter(expr="edge == True").to_pandas()
    if not len(edge_df):
        return interior
    # fragments of a doc split across blocks: the global sort order
    # means the best row is the (tf DESC, df ASC, token ASC)-min among
    # the per-block firsts
    edge_df["tf_neg"] = -edge_df["tf"]
    fixed = (edge_df.sort_values([id_col, "tf_neg", "df", "token"],
                                 kind="stable")
             .drop_duplicates(id_col)[[id_col, "token", "tf", "df"]])
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(fixed.reset_index(drop=True),
                             preserve_index=False)))


# ---------------------------------------------------------------------------
# Repetition stats (Gopher-style quality signal) and regex redaction
# ---------------------------------------------------------------------------

def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Per-doc token-repetition signal (Gopher-style quality rules —
    Rae et al. 2021 §A1.1 use duplicate-line/most-common-ngram
    fractions as filters; this is the whitespace-token analogue over
    the synthetic corpus, all-integer so the DuckDB oracle matches
    exactly):

    - ``n_tokens``: non-empty whitespace tokens
    - ``n_distinct_tokens``: distinct tokens in the doc
    - ``dup_token_count``: n_tokens - n_distinct (the duplicate mass —
      divide by n_tokens for the Gopher fraction)
    - ``top_token_count``: occurrences of the most frequent token

    Fully vectorized: dictionary-encode the flat token column once,
    then one ``np.unique`` over ``parent * K + code`` composite keys
    gives every per-(doc, token) count; per-doc reductions are
    bincount / maximum.at over those group rows — no per-row Python.
    """
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    n = len(texts)
    flat = toks.flatten()
    parent = np.repeat(np.arange(n, dtype=np.int64), lengths)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]

    n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
    if len(flat):
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        grp, counts = np.unique(parent * k + codes, return_counts=True)
        docs_of = grp // k
        n_distinct = np.bincount(docs_of, minlength=n).astype(np.int64)
        top = np.zeros(n, dtype=np.int64)
        np.maximum.at(top, docs_of, counts)
    else:
        n_distinct = np.zeros(n, dtype=np.int64)
        top = np.zeros(n, dtype=np.int64)

    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens": pa.array(n_tokens),
        "n_distinct_tokens": pa.array(n_distinct),
        "dup_token_count": pa.array(n_tokens - n_distinct),
        "top_token_count": pa.array(top),
    })


def repetition_stats(ds: Dataset, text_col: str = "text",
                     id_col: str = "doc_id") -> Dataset:
    return ds.map_batches(
        lambda t: repetition_stats_batch(t, text_col, id_col),
        batch_format="pyarrow")


# RE2-safe presets (pyarrow.compute and DuckDB both run RE2, so one
# pattern string serves the Ray stage AND its SQL oracle verbatim).
# C4-style cleaning (Raffel et al. 2020 §2.2 strip pages by token
# patterns; modern pipelines redact instead of dropping).
PII_PRESETS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d().\-]{6,}\d",
}


def redact_batch(batch: pa.Table, patterns: list[str] | None = None,
                 replacement: str = "<REDACTED>", *,
                 text_col: str = "text", id_col: str = "doc_id",
                 out_col: str = "clean_text") -> pa.Table:
    """Redact every match of ``patterns`` (default: all PII_PRESETS)
    with ``replacement`` — ONE alternation compiled into ONE
    ``pc.replace_substring_regex`` kernel call per batch (RE2 global
    leftmost-non-overlapping replace, identical to DuckDB
    ``regexp_replace(..., 'g')``). Null text passes through as null,
    like SQL."""
    pats = list(PII_PRESETS.values()) if patterns is None else patterns
    combined = "|".join(f"(?:{p})" for p in pats)
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    cleaned = pc.replace_substring_regex(
        texts, pattern=combined, replacement=replacement)
    return pa.table({id_col: batch.column(id_col), out_col: cleaned})


def redact(ds: Dataset, patterns: list[str] | None = None,
           replacement: str = "<REDACTED>", *, text_col: str = "text",
           id_col: str = "doc_id", out_col: str = "clean_text") -> Dataset:
    return ds.map_batches(
        lambda t: redact_batch(t, patterns, replacement, text_col=text_col,
                               id_col=id_col, out_col=out_col),
        batch_format="pyarrow")


def normalize_batch(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Canonical text normalization (the pass that runs BEFORE exact
    dedup in a web pipeline so trivially-reformatted copies collapse):
    lowercase → collapse runs of whitespace to one space → trim. Emits
    the normalized md5 (the dedup key) and the normalized length, all
    via Arrow kernels + the buffer-sliced md5 (``md5_hex_batch``); the
    full normalized text stays out of the output on purpose (the
    fingerprint is what downstream joins on). Matches DuckDB
    ``md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))`` —
    both regex engines are RE2."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # trim ' ' only (== DuckDB trim()): after the ASCII-\s collapse the
    # string edges hold either ' ' or NON-ASCII whitespace (U+3000 …),
    # which DuckDB's trim leaves in place — utf8_trim_whitespace would
    # strip it and break fp parity
    norm = pc.utf8_trim(pc.replace_substring_regex(
        pc.utf8_lower(texts), pattern=r"\s+", replacement=" "),
        characters=" ")
    # null text → null outputs (SQL null propagation, not md5(''))
    fp = pa.array(md5_hex_batch(norm), type=pa.string())
    if norm.null_count:
        fp = pc.if_else(pc.is_null(norm), pa.scalar(None, pa.string()), fp)
    return pa.table({
        id_col: batch.column(id_col),
        "norm_fp": fp,
        "n_chars_norm": pc.cast(pc.utf8_length(norm), pa.int64()),
    })


def normalize(ds: Dataset, *, text_col: str = "text",
              id_col: str = "doc_id") -> Dataset:
    return ds.map_batches(
        lambda t: normalize_batch(t, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")
