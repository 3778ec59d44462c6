"""Deduplication operators for training-data pipelines.

- exact:  content-hash partition + per-group first (min id wins)
- MinHash+LSH: shingle → minhash signature → banded bucket groupby →
  candidate pairs → signature-Jaccard verify → min-label connected
  components (Broder, "On the resemblance and containment of
  documents", 1997; banding per Leskovec/Rajaraman/Ullman, MMDS ch.3)
- SimHash: 64-bit simhash → banded buckets → Hamming-verified pairs
  (Charikar, "Similarity estimation techniques from rounding
  algorithms", STOC 2002)
- embedding cosine near-dup: random-hyperplane LSH buckets → in-bucket
  cosine verify (same Charikar rounding scheme)

All hashing is seeded/stable across processes. The shuffles are
groupbys on hash keys (uniform by construction — no salting needed;
bucket sizes are bounded by band width choice, and verification work is
per-bucket pairwise, so pathological buckets are capped by
``max_bucket`` with a logged drop count rather than a silent blowup).
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

logger = logging.getLogger(__name__)

_MERSENNE = (1 << 61) - 1


def _stable_u64(texts: list[str]) -> np.ndarray:
    return pd.util.hash_pandas_object(pd.Series(texts, dtype=object),
                                      index=False).to_numpy()


def _run_change_mask(*keys: np.ndarray) -> np.ndarray:
    """True where a sorted block starts a new key run (row 0 always
    True): the shared kernel of every sorted-scan combine in this
    module (pair dedup, keep-best, bucket verify, ssjoin's rep scan).

    Keys are compared per COLUMN on purpose: stacking them into one
    matrix (``df[key_cols].to_numpy()``) would promote mixed
    int32/uint64 columns to float64, where distinct 64-bit hashes
    within one ulp (~2^11 near 2^63) compare equal and MERGE adjacent
    runs."""
    n = len(keys[0])
    change = np.zeros(n, dtype=bool)
    if n:
        change[0] = True
        for a in keys:
            change[1:] |= a[1:] != a[:-1]
    return change


# --- exact dedup ------------------------------------------------------------

def exact_dedup(ds: Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> Dataset:
    """One row per distinct content hash: (fingerprint, keep id, copies).

    Two-phase: md5 inside map_batches (vectorizable work, uniform key),
    then a groupby-aggregate — Min(id) is 'keep first', Count is the
    duplicate multiplicity. At 100 TB this is the cheapest dedup: one
    shuffle of (hash, id) pairs, never the payload."""

    def add_hash(batch: pa.Table) -> pa.Table:
        from .text import md5_hex_batch

        fps = md5_hex_batch(batch.column(text_col))
        return pa.table({
            "fingerprint": pa.array(fps, type=pa.string()),
            id_col: batch.column(id_col),
        })

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("fingerprint")
        .aggregate(Min(id_col, alias_name="keep_id"),
                   Count(alias_name="n_copies"))
    )


def keep_best_dedup(ds: Dataset, *, group_col: str = "fingerprint",
                    score_col: str = "score",
                    id_col: str = "doc_id") -> Dataset:
    """One row per group: the member with the HIGHEST score (ties →
    smallest id) plus the group size — the quality-aware keep policy
    (CCNet/FineWeb-style curation) complementing ``exact_dedup``'s
    keep-first.

    Input: any (group_col, id_col, score_col) dataset. One global range
    exchange: sort by (group, -score, id), then each block reduces every
    run to its first row + run length. Runs touching a block boundary
    ride a raw channel (their per-block best + partial count) and are
    re-combined driver-side — ≤ 2 groups per block, bounded by block
    count, never by data size. Output columns: (group_col, id_col,
    score_col, n_copies) with id/score taken from the kept member."""
    import ray.data as rd

    base_cols = [group_col, id_col, score_col]
    sort_keys = [group_col, score_col, id_col]  # best first within group
    srt = ds.sort(sort_keys, descending=[False, True, False])

    def block(t: pa.Table) -> pa.Table:
        # Arrow in/out: one block schema across the interior + fixup
        # channels, and ids/scores never ride a pandas object/float
        # promotion
        n = t.num_rows
        t = t.select(base_cols)
        if not n:
            return (t.append_column("n_copies",
                                    pa.array([], type=pa.int64()))
                     .append_column("edge", pa.array([], type=pa.bool_())))
        starts = np.flatnonzero(_run_change_mask(
            t.column(group_col).to_numpy(zero_copy_only=False)))
        nruns = len(starts)
        counts = np.diff(np.append(starts, n))
        out = t.take(pa.array(starts))
        edge = np.zeros(nruns, dtype=bool)
        edge[0] = edge[-1] = True  # runs that may straddle block bounds
        return (out.append_column("n_copies",
                                  pa.array(counts.astype(np.int64)))
                   .append_column("edge", pa.array(edge)))

    from ..traverse import drop_empty_blocks, filter_select

    # drop empty sorted partitions: they bypass kernels and ride
    # downstream as schema-less blocks (see _bucket_verify)
    partial = drop_empty_blocks(
        srt.map_batches(block, batch_format="pyarrow"))
    interior = filter_select(partial, "edge", False, drop=["edge"])
    edge_df = partial.filter(expr="edge == True").to_pandas()
    if not len(edge_df):
        return interior
    frag = edge_df.drop(columns=["edge"]).sort_values(
        sort_keys, ascending=[True, False, True], kind="stable")
    best = frag.drop_duplicates(group_col, keep="first")[base_cols]
    totals = frag.groupby(group_col, sort=False, as_index=False)[
        "n_copies"].sum()
    fixed = best.merge(totals, on=group_col)[base_cols + ["n_copies"]]
    return interior.union(
        rd.from_arrow(pa.Table.from_pandas(fixed, preserve_index=False)))


def _col_type(ds: Dataset, col: str) -> pa.DataType:
    """Arrow type of one column. ray.data's Schema wrapper has
    names/types but no .field accessor, and for PANDAS-block datasets
    the types are numpy/python (object dtype = strings here — the only
    non-numeric id shape the pipelines carry)."""
    sch = ds.schema()
    t = dict(zip(sch.names, sch.types))[col]
    if isinstance(t, pa.DataType):
        return t
    if t is object or str(t) == "object":
        return pa.string()
    return pa.from_numpy_dtype(np.dtype(t))


def _bucket_verify(banded: Dataset, key_cols: list[str], verify_tbl,
                   pair_value_col: str, stats: dict | None = None,
                   presorted: bool = False,
                   id_type: pa.DataType | None = None,
                   raw_cap: int | None = None,
                   raw_cap_col: str | None = None) -> Dataset:
    """Run a pairwise verification kernel per bucket WITHOUT
    groupby().map_groups (which builds one pandas frame per group —
    measured dominant for 10^4-10^5 tiny LSH buckets).

    Sorts by the bucket key, loops buckets inside each block building
    flat output arrays, and re-verifies the ≤2 buckets that straddle
    each block boundary driver-side (their raw rows ride a second
    channel) — exact, no missed cross-block pairs.

    ``verify_tbl(sub: pa.Table) -> (id_a list, id_b list, value list,
    n_dropped)`` where ``n_dropped`` counts rows the kernel truncated
    from a pathological hot bucket. The total dropped-row count is
    LOGGED (warning) and written into ``stats['dropped_rows']`` when a
    dict is passed — hot-bucket truncation is never silent.

    ``id_type`` is the Arrow type of the ids the kernel emits (defaults
    to int64). Pass ``pa.string()`` for string doc ids — the int-only
    Int64 channel would otherwise raise on the first string id.

    ``raw_cap``/``raw_cap_col``: worker-side cap on the boundary raw
    channel. A hot bucket spanning block boundaries would otherwise
    ship ALL its rows (signatures included) to the driver before the
    kernel's own head(max_bucket) ever runs. Each boundary FRAGMENT
    keeps only its ``raw_cap`` smallest rows by ``raw_cap_col`` — a
    row among the bucket's global cap-smallest is also among its own
    fragment's cap-smallest, so the driver merge still sees the exact
    rows the kernel's sort+head would keep, and driver residency is
    bounded by blocks × raw_cap instead of the hot-bucket size.
    Per-fragment drop counts feed the same ``dropped_rows`` total, so
    fragment-drops + kernel-drops == the uncapped count. Pass the SAME
    column the kernel sorts by before its head()."""
    import ray

    import pyarrow.compute as pc

    import ray.data as rd

    id_type = id_type or pa.int64()

    # ``presorted``: the caller guarantees rows with equal keys are
    # contiguous within every block and a key spanning blocks appears
    # only as a block's first/last bucket (true after any global sort,
    # preserved by row-order-preserving maps) — the boundary raw
    # channel then stays exact without paying a second sort.
    srt = banded if presorted else banded.sort(key_cols)
    base = banded.schema()
    data_cols = list(base.names)
    # ONE explicit Arrow schema for every emitted block: the pair
    # columns plus the raw channel's data columns (typed from the input
    # schema, null on pair rows). Pair-only blocks used to omit the data
    # columns entirely, so blocks of one dataset disagreed on schema —
    # Ray's "RefBundle with a different schema" warning and undefined
    # downstream behavior.
    _reserved = {"id_a", "id_b", pair_value_col, "kind"}
    out_fields = ([("id_a", id_type), ("id_b", id_type),
                   (pair_value_col, pa.float64()), ("kind", pa.string())]
                  + [(n, t) for n, t in zip(base.names, base.types)
                     if n not in _reserved])
    out_names = [n for n, _ in out_fields]

    def channel_table(n: int, present: dict) -> pa.Table:
        """One emitted channel against the ONE explicit schema: absent
        columns are typed nulls (Arrow holds nulls natively — no
        nullable-Int64 pandas promotion dance needed)."""
        return pa.Table.from_arrays(
            [present.get(name, pa.nulls(n, type=typ))
             for name, typ in out_fields], names=out_names)

    def pair_table(parts_a, parts_b, parts_v) -> pa.Table:
        npairs = sum(len(x) for x in parts_a)
        ids_a = np.concatenate(parts_a) if parts_a else []
        ids_b = np.concatenate(parts_b) if parts_b else []
        vals = (np.concatenate(parts_v) if parts_v
                else np.zeros(0, dtype=np.float64))
        return channel_table(npairs, {
            # from_pandas=True maps the object/str path's None to null;
            # uint64 ids >= 2^63 survive because id_type is uint64 then
            "id_a": pa.array(ids_a, type=id_type, from_pandas=True),
            "id_b": pa.array(ids_b, type=id_type, from_pandas=True),
            pair_value_col: pa.array(vals, type=pa.float64()),
            "kind": pa.array(["pair"] * npairs, type=pa.string()),
        })

    def process_block(t: pa.Table) -> pa.Table:
        # Arrow in, Arrow out (r3 verdict item 5): the pandas input
        # conversion boxed every signature/embedding list cell into a
        # Python object on the hottest shuffle combine. Accumulate
        # per-bucket RESULT ARRAYS and concatenate once — .extend() of
        # ndarrays boxes every element, which dominated wall time on
        # clique-dense buckets emitting millions of pairs.
        n = t.num_rows
        t = t.combine_chunks()
        parts_a: list[np.ndarray] = []
        parts_b: list[np.ndarray] = []
        parts_v: list[np.ndarray] = []
        dropped = 0
        raw_idx: list[np.ndarray] = []
        if n:
            change = _run_change_mask(
                *(t.column(kc).to_numpy(zero_copy_only=False)
                  for kc in key_cols))
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            for i, (s, e) in enumerate(zip(starts, ends)):
                if i == 0 or i == len(starts) - 1:
                    # boundary bucket → driver fixup; cap the fragment
                    # worker-side (see docstring — exact under the
                    # kernel's own sort(raw_cap_col) + head(raw_cap))
                    if raw_cap is not None and e - s > raw_cap:
                        frag = t.column(raw_cap_col).slice(s, e - s)
                        keep = pc.sort_indices(frag).to_numpy()[:raw_cap]
                        raw_idx.append(s + np.sort(keep))
                        dropped += (e - s) - raw_cap
                    else:
                        raw_idx.append(np.arange(s, e))
                    continue
                if e - s < 2:
                    continue
                a, b, v, d = verify_tbl(t.slice(s, e - s))
                # preserve the kernel's id dtype: forcing int64 here
                # would silently WRAP uint64 ids >= 2^63 negative
                parts_a.append(np.asarray(a))
                parts_b.append(np.asarray(b))
                parts_v.append(np.asarray(v, dtype=np.float64))
                dropped += d
        out = [pair_table(parts_a, parts_b, parts_v)]
        if dropped:
            # the drop count rides the VALUE column (ids stay typed —
            # a count stuffed into a string id column would not survive)
            out.append(channel_table(1, {
                pair_value_col: pa.array([float(dropped)]),
                "kind": pa.array(["drop"], type=pa.string())}))
        if raw_idx:
            ridx = np.concatenate(raw_idx)
            rt = t.take(pa.array(ridx))
            present = {name: rt.column(name).combine_chunks()
                       for name in data_cols if name not in _reserved}
            present["kind"] = pa.array(["raw"] * len(ridx),
                                       type=pa.string())
            out.append(channel_table(len(ridx), present))
        return pa.concat_tables(out)

    from ..traverse import drop_empty_blocks

    # drop the sort's empty range partitions: they BYPASS map_batches
    # kernels and ride through every downstream stage as schema-less
    # 0-column blocks (free here — the dataset is materialized anyway)
    mixed = drop_empty_blocks(
        srt.map_batches(process_block, batch_format="pyarrow"),
        pa.schema([pa.field(n, t) for n, t in out_fields]))

    def pick_pairs(t: pa.Table) -> pa.Table:
        # filter + project + cast in ONE kernel (a chained
        # .filter().select_columns() leaves empty filter results
        # unprojected — see traverse.filter_select)
        t = t.filter(pc.equal(t.column("kind"), "pair"))
        return pa.table({
            "id_a": pc.cast(t.column("id_a"), id_type),
            "id_b": pc.cast(t.column("id_b"), id_type),
            pair_value_col: pc.cast(t.column(pair_value_col), pa.float64()),
        })

    pairs = mixed.map_batches(pick_pairs, batch_format="pyarrow")
    total_dropped = 0
    for tb in ray.get(mixed.filter(expr="kind == 'drop'")
                      .select_columns([pair_value_col]).to_arrow_refs()):
        if len(tb):
            total_dropped += int(pc.sum(tb.column(pair_value_col)).as_py())
    raw_tbls = [tb for tb in ray.get(
        mixed.filter(expr="kind == 'raw'").to_arrow_refs()) if len(tb)]
    if raw_tbls:
        # boundary buckets re-verified driver-side over Arrow slices —
        # bounded by blocks x raw_cap rows, never by data size
        rt = pa.concat_tables([tb.select(data_cols) for tb in raw_tbls])
        rt = rt.sort_by([(k, "ascending") for k in key_cols])
        change = _run_change_mask(
            *(rt.column(k).to_numpy(zero_copy_only=False)
              for k in key_cols))
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], rt.num_rows)
        parts_a, parts_b, parts_v = [], [], []
        for s, e in zip(starts, ends):
            if e - s >= 2:
                a, b, v, d = verify_tbl(rt.slice(s, e - s))
                parts_a.append(np.asarray(a))
                parts_b.append(np.asarray(b))
                parts_v.append(np.asarray(v, dtype=np.float64))
                total_dropped += d
        if any(len(x) for x in parts_a):
            ft = pair_table(parts_a, parts_b, parts_v).select(
                ["id_a", "id_b", pair_value_col])
            pairs = pairs.union(rd.from_arrow(ft))
    if total_dropped:
        logger.warning(
            "LSH bucket cap truncated %d rows from hot buckets; candidate "
            "pairs involving those rows were not verified (raise max_bucket "
            "or tighten the banding to split the hot bucket)", total_dropped)
    if stats is not None:
        stats["dropped_rows"] = total_dropped
    return pairs


def _dedup_pairs(pairs: Dataset, value_col: str) -> Dataset:
    """(id_a,id_b) pairs can surface from multiple bands — keep one
    (min ``value_col``).

    Sort by (id_a,id_b) + vectorized per-block min-combine instead of
    ``groupby().aggregate`` — the native aggregate's shuffle carries
    multi-second fixed overhead per call (measured 6-8s on an 80k-row
    table where the sort path is ~0.3s) and at cluster scale this is
    one range exchange instead of a hash exchange. Exactness at block
    boundaries uses the `_bucket_verify` trick: the first and last
    group of every block ride a raw channel and are re-combined
    driver-side (≤ 2 groups per block — bounded by block count, never
    by data size)."""
    import ray.data as rd

    import ray

    import pyarrow.compute as pc

    srt = pairs.sort(["id_a", "id_b"])

    def block(t: pa.Table) -> pa.Table:
        # Arrow in, Arrow out: empty blocks keep the input's typed
        # schema for free (ids may be strings, value may be integer —
        # the pandas version needed null-column pinning), and string id
        # columns never box into Python objects
        n = len(t)
        t = t.select(["id_a", "id_b", value_col]).combine_chunks()
        if not n:
            return t.append_column("kind", pa.array([], pa.string()))
        a, b = t.column("id_a"), t.column("id_b")
        # run-change detection via shifted Arrow compares — works for
        # string ids without boxing
        change = np.empty(n, dtype=bool)
        change[0] = True
        if n > 1:
            ne_a = pc.not_equal(a.slice(1), a.slice(0, n - 1))
            ne_b = pc.not_equal(b.slice(1), b.slice(0, n - 1))
            change[1:] = pc.or_(ne_a, ne_b).to_numpy(zero_copy_only=False)
        gid = np.cumsum(change) - 1
        ngroups = int(gid[-1]) + 1
        v = pc.cast(t.column(value_col),
                    pa.float64()).to_numpy(zero_copy_only=False)
        mins = np.full(ngroups, np.inf)
        np.minimum.at(mins, gid, v)  # exact for hamming/iu_code < 2^52
        first = np.flatnonzero(change)
        # interior groups are complete within this block; the first and
        # last group may straddle a block boundary → raw channel
        interior_idx = pa.array(first[1:ngroups - 1])
        out = pa.table({
            "id_a": a.take(interior_idx),
            "id_b": b.take(interior_idx),
            value_col: pa.array(mins[1:ngroups - 1]).cast(
                t.column(value_col).type),
            "kind": pa.array(["pair"] * max(0, ngroups - 2),
                             type=pa.string()),
        })
        raw_mask = (gid == 0) | (gid == ngroups - 1)
        raw = t.filter(pa.array(raw_mask)).append_column(
            "kind", pa.array(["raw"] * int(raw_mask.sum()),
                             type=pa.string()))
        return pa.concat_tables([out, raw])

    from ..traverse import drop_empty_blocks, filter_select

    # drop empty sorted partitions — they bypass kernels and surface as
    # schema-less blocks downstream (see _bucket_verify)
    mixed = drop_empty_blocks(srt.map_batches(block, batch_format="pyarrow"))
    deduped = filter_select(mixed, "kind", "pair",
                            columns=["id_a", "id_b", value_col])
    raw_tbls = [tb for tb in ray.get(
        mixed.filter(expr="kind == 'raw'")
        .select_columns(["id_a", "id_b", value_col])
        .to_arrow_refs()) if len(tb)]
    if raw_tbls:
        fixed = (pa.TableGroupBy(pa.concat_tables(raw_tbls),
                                 ["id_a", "id_b"], use_threads=False)
                 .aggregate([(value_col, "min")])
                 .rename_columns(["id_a", "id_b", value_col]))
        deduped = deduped.union(rd.from_arrow(fixed))
    return deduped


# --- MinHash + LSH ----------------------------------------------------------

def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_SHINGLE_B = np.uint64(1000003)


def _combine_token_hashes(hs: np.ndarray, k: int) -> np.ndarray:
    """k-gram shingle hashes from per-token hashes via a degree-(k-1)
    polynomial in uint64 (wrapping) — no gram-string materialization.
    Hashing shingles (vs hashing the joined string) preserves Jaccard
    up to negligible collisions (Broder 1997; MMDS ch.3)."""
    n = len(hs)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        if n < k:
            g = np.uint64(0)
            for j in range(n):
                g = g * _SHINGLE_B + hs[j]
            return np.array([g], dtype=np.uint64)
        out = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            out += hs[j:n - k + 1 + j] * (_SHINGLE_B ** np.uint64(k - 1 - j))
    return out


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return _combine_token_hashes(_stable_u64(toks), k)


class MinHasher:
    """Actor stage: text → minhash signature (uint64[num_perm]).

    Permutation params are built once per actor (seeded). Signatures for
    the WHOLE batch come from one flat pipeline: all docs' shingle
    hashes concatenated, the (shingles × num_perm) permuted values
    computed in bounded-memory chunks, and per-doc column minima taken
    with ``np.minimum.reduceat`` at doc offsets — no per-document
    matrices or Python-level loop over docs (min is idempotent to
    duplicate shingles, so no per-doc unique either)."""

    # (chunk_shingles × num_perm × 8B) temporary ≈ 8 MB — small enough
    # to stay cache-friendly on a shared memory bus (sweep-measured:
    # small chunks are both faster and far less variance-prone)
    _CHUNK_SHINGLES = 16384

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 13,
                 text_col: str = "text", id_col: str = "doc_id") -> None:
        self.a, self.b = _minhash_params(num_perm, seed)
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (n, p): (a*x + b) mod M, then column-min
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def _signatures(self, texts: list) -> np.ndarray:
        n = len(texts)
        sigs = np.full((n, self.num_perm), _MERSENNE, dtype=np.uint64)
        tok_lists = [(t or "").split() for t in texts]
        flat = [tok for toks in tok_lists for tok in toks]
        if not flat:
            return sigs
        tok_hs = _stable_u64(flat)  # ONE hash call for the whole batch
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        tok_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
        gram_arrays = []
        counts = np.zeros(n, dtype=np.int64)
        for i in range(n):  # numpy slice + 3 mults per doc, no strings
            if lens[i] == 0:
                continue
            g = _combine_token_hashes(tok_hs[tok_start[i]:tok_start[i] + lens[i]],
                                      self.k)
            gram_arrays.append(g)
            counts[i] = len(g)
        hs = np.concatenate(gram_arrays)
        nonempty = np.flatnonzero(counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))[nonempty]
        # chunk along the shingle axis, aligned to doc starts so each
        # reduceat segment stays within one chunk
        pos = 0
        while pos < len(nonempty):
            end = pos + 1
            while (end < len(nonempty)
                   and starts[end] - starts[pos] < self._CHUNK_SHINGLES):
                end += 1
            lo = starts[pos]
            hi = (starts[end] if end < len(nonempty) else len(hs))
            vals = (hs[lo:hi, None] * self.a[None, :] + self.b[None, :]) \
                % np.uint64(_MERSENNE)
            idx = starts[pos:end] - lo
            sigs[nonempty[pos:end]] = np.minimum.reduceat(vals, idx, axis=0)
            pos = end
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = self._signatures(texts) if texts else \
            np.zeros((0, self.num_perm), dtype=np.uint64)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel(), type=pa.uint64()), self.num_perm),
        })


def _band_rows(batch: pa.Table, bands: int, rows_per_band: int,
               id_col: str) -> pa.Table:
    """signature rows → (band, bucket, id, sig) exploded rows."""
    sig = batch.column("sig")
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    n = len(batch)
    num_perm = bands * rows_per_band
    mat = np.asarray(sig.flatten(), dtype=np.uint64).reshape(n, num_perm)
    ids = batch.column(id_col)
    # fully vectorized explode: band index repeats, per-band bucket hashes
    # computed column-wise, signatures tiled once
    buckets = np.empty((bands, n), dtype=np.uint64)
    for b in range(bands):
        chunk = mat[:, b * rows_per_band:(b + 1) * rows_per_band]
        buckets[b] = pd.util.hash_pandas_object(
            pd.DataFrame(chunk), index=False).to_numpy()
    out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
    tiled_ids = pa.concat_arrays(
        [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids] * bands)
    return pa.table({
        "band": pa.array(out_band),
        "bucket": pa.array(buckets.ravel()),
        id_col: tiled_ids,
        "sig": pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(mat, (bands, 1)).ravel(), type=pa.uint64()), num_perm),
    })


def minhash_lsh_pairs(ds: Dataset, *, num_perm: int = 64, bands: int = 16,
                      k: int = 3, threshold: float = 0.7, seed: int = 13,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bucket: int = 200, concurrency=(1, 4),
                      stats: dict | None = None) -> Dataset:
    """Candidate near-duplicate pairs with signature-estimated Jaccard.

    shingle→minhash (actor pool) → band explode → groupby(band,bucket)
    → pairwise verify within bucket. Output: (id_a, id_b, est_jaccard)
    with id_a < id_b, deduplicated across bands. Hot buckets beyond
    ``max_bucket`` are truncated with a logged drop count (and
    ``stats['dropped_rows']`` when a dict is passed)."""
    if num_perm % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_perm ({num_perm}) — a "
            "non-divisor would truncate the signature silently")
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "k": k, "seed": seed,
                               "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)
    banded = sigs.map_batches(
        lambda t: _band_rows(t, bands, rows_per_band, id_col),
        batch_format="pyarrow")

    def verify(group: pa.Table):
        g = group.sort_by(id_col).slice(0, max_bucket)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        sig = g.column("sig")
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        # fixed_size_list → contiguous (m, num_perm) view, zero-copy
        # (the pandas path boxed every signature into an object cell)
        mat = sig.flatten().to_numpy(zero_copy_only=False).reshape(
            g.num_rows, -1)
        eq = (mat[:, None, :] == mat[None, :, :]).mean(axis=2)
        iu = np.triu_indices(len(ids), 1)
        jac = eq[iu]
        keep = jac >= threshold
        return (ids[iu[0][keep]], ids[iu[1][keep]], jac[keep],
                max(0, group.num_rows - max_bucket))

    pairs = _bucket_verify(banded, ["band", "bucket"], verify, "est_jaccard",
                           stats=stats,
                           id_type=_col_type(ds, id_col),
                           raw_cap=max_bucket, raw_cap_col=id_col)
    return _dedup_pairs(pairs, "est_jaccard")


def connected_components(pairs: Dataset, ids: Dataset, *, id_col: str = "doc_id",
                         max_rounds: int = 10,
                         driver_limit: int = 2_000_000) -> Dataset:
    """Min-label propagation over dup pairs → (id, component) rows.

    Converges in O(cluster diameter) rounds; near-dup clusters are tiny
    so a handful suffices. Small pair sets (the common case — candidates
    are orders of magnitude rarer than docs) run the label loop
    driver-side over ONLY the edge-touched ids (bounded by 2·n_pairs —
    never the corpus id column, which may be 10^11 rows), then overlay
    the resulting small mapping onto the distributed id stream: isolated
    ids are their own component, a pure streaming map. Larger pair sets
    switch to the distributed variant (hash-join rounds over Datasets).
    Returns every input id with its component label (= min id in its
    cluster)."""
    import ray

    import ray.data as rd  # noqa: F401 — parity with distributed path

    # materialized once: count() below plus the edge pull (or the
    # distributed variant's per-round joins) would otherwise re-execute
    # the candidate-pair plan — an LSH pipeline — multiple times
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs > driver_limit:
        return connected_components_distributed(
            pairs, ids, id_col=id_col, max_rounds=max_rounds)

    def identity_labels(t: pa.Table) -> pa.Table:
        return pa.table({"id": t.column(id_col), "comp": t.column(id_col)})

    ids = ids.select_columns([id_col])
    if n_pairs == 0:
        return ids.map_batches(identity_labels, batch_format="pyarrow")
    edges = pairs.select_columns(["id_a", "id_b"]).to_pandas()
    # label propagation restricted to edge-touched nodes (≤ 2·n_pairs)
    touched = np.unique(np.concatenate(
        [edges["id_a"].to_numpy(), edges["id_b"].to_numpy()]))
    both = pd.concat([
        edges.rename(columns={"id_a": "u", "id_b": "v"}),
        edges.rename(columns={"id_a": "v", "id_b": "u"})[["u", "v"]],
    ])
    # Stays int64 throughout: a reindex with misses would introduce
    # NaN → float64, which corrupts 63-bit ids above 2^53 — every node
    # in `both` is in `touched` by construction, so no miss can occur.
    # values must be a COPY: pandas would otherwise share one buffer
    # between values and index, and the in-place .loc writes below
    # would silently corrupt the index labels
    comp = pd.Series(touched.copy(), index=touched)
    changed = False
    for _ in range(max_rounds):
        # vectorized min-label pull: neighbor labels → per-node min
        # → elementwise minimum update (no per-node Python loop)
        upd = both["v"].map(comp).groupby(both["u"].to_numpy()).min()
        cur = comp.loc[upd.index]
        better_idx = upd.index[upd.to_numpy() < cur.to_numpy()]
        changed = len(better_idx) > 0
        if not changed:
            break
        comp.loc[better_idx] = upd.loc[better_idx]
    if changed:
        logger.warning(
            "connected_components did not converge within %d rounds: a "
            "duplicate chain's diameter exceeds the round budget, so "
            "component labels (keep/drop decisions) may be split — "
            "raise max_rounds", max_rounds)
    # broadcast the small touched→comp mapping once; each batch does a
    # vectorized sorted-array lookup, untouched ids label themselves
    mapping_ref = ray.put((touched, comp.to_numpy()))

    def overlay(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(mapping_ref)
        idv = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(idv) == 0:
            return pa.table({"id": t.column(id_col),
                             "comp": t.column(id_col)})
        pos = np.clip(np.searchsorted(keys, idv), 0, len(keys) - 1)
        hit = keys[pos] == idv
        out = np.where(hit, vals[pos], idv)
        return pa.table({"id": t.column(id_col),
                         "comp": pa.array(out, type=t.column(id_col).type)})

    return ids.map_batches(overlay, batch_format="pyarrow")


def connected_components_distributed(pairs: Dataset, ids: Dataset, *,
                                     id_col: str = "doc_id",
                                     max_rounds: int = 10,
                                     num_partitions: int = 4) -> Dataset:
    """Distributed min-label propagation: each round hash-joins current
    labels onto the (symmetrized) edge list, takes the per-node min of
    neighbor labels, and merges it into the label table. All-Dataset, no
    driver materialization — the scale path for huge candidate graphs.

    Convergence check per round costs one count(); rounds are bounded by
    ``max_rounds`` regardless."""
    import pyarrow.compute as pc

    import ray.data as rd

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"u": t.column("id_a"), "v": t.column("id_b")}),
            pa.table({"u": t.column("id_b"), "v": t.column("id_a")}),
        ])

    labels = ids.select_columns([id_col]).map_batches(
        lambda t: pa.table({"id": t.column(id_col), "comp": t.column(id_col)}),
        batch_format="pyarrow").materialize()
    if pairs.count() == 0:  # empty Datasets lose schema → join would fail
        return labels
    edges = pairs.select_columns(["id_a", "id_b"]).map_batches(
        symmetrize, batch_format="pyarrow").materialize()

    n_changed = 0
    for _ in range(max_rounds):
        # neighbor-label pull: edges ⋈ labels on v → min label per u
        lab_v = labels.map_batches(
            lambda t: t.rename_columns(["v", "comp_v"]), batch_format="pyarrow")
        pulled = edges.join(lab_v, join_type="inner",
                            num_partitions=num_partitions, on=("v",))
        cand = pulled.groupby("u").aggregate(Min("comp_v", alias_name="cand"))
        cand = cand.map_batches(
            lambda t: t.rename_columns(["id", "cand"]), batch_format="pyarrow")
        merged = labels.join(cand, join_type="left_outer",
                             num_partitions=num_partitions, on=("id",))

        def take_min(t: pa.Table) -> pa.Table:
            comp = t.column("comp")
            cd = t.column("cand")
            better = pc.and_kleene(pc.is_valid(cd), pc.less(cd, comp))
            better = pc.fill_null(better, False)
            return pa.table({"id": t.column("id"),
                             "comp": pc.if_else(better, cd, comp),
                             "changed": better})

        updated = merged.map_batches(take_min, batch_format="pyarrow").materialize()
        n_changed = updated.filter(expr="changed == True").count()
        labels = updated.drop_columns(["changed"]).materialize()
        if n_changed == 0:
            break
    else:
        logger.warning(
            "connected_components_distributed still propagating after %d "
            "rounds (%d labels changed in the last round): components may "
            "be split — raise max_rounds", max_rounds, n_changed)
    return labels


# --- SimHash ----------------------------------------------------------------

class SimHasher:
    """Actor stage: text → 64-bit simhash + banded bucket keys.

    Batched: one token-hash call for the whole batch, one (tokens × 64)
    bit expansion, and per-document bit-vote sums via
    ``np.add.reduceat`` at doc offsets — no per-document matrices."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = _stable_u64(toks)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    @classmethod
    def simhash_batch(cls, texts: list) -> np.ndarray:
        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        tok_lists = [(t or "").split() for t in texts]
        flat = [tok for toks in tok_lists for tok in toks]
        if not flat:
            return out
        hs = _stable_u64(flat)
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        nonempty = np.flatnonzero(lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[nonempty]
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        # chunk the (tokens × 64) int8 expansion to ~1 MB temporaries
        # (sweep-measured: cache-resident chunks are ~1.5-7× faster)
        chunk_toks = 1 << 14
        pos = 0
        votes = np.zeros((len(nonempty), 64), dtype=np.int64)
        while pos < len(nonempty):
            end = pos + 1
            while end < len(nonempty) and starts[end] - starts[pos] < chunk_toks:
                end += 1
            lo = starts[pos]
            hi = starts[end] if end < len(nonempty) else len(hs)
            bits = ((hs[lo:hi, None] >> shifts) & np.uint64(1)).astype(np.int8)
            # dtype=int64: reduceat would otherwise accumulate in int8
            # and overflow past 127 tokens
            np.add.reduceat(bits, starts[pos:end] - lo, axis=0,
                            dtype=np.int64, out=votes[pos:end])
            pos = end
        # majority vote: bit set when ones > half the tokens (strictly —
        # matches sum(2b-1) > 0 in the per-doc form)
        maj = (2 * votes) > lens[nonempty][:, None]
        out[nonempty] = (maj.astype(np.uint64)
                         << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sh = self.simhash_batch(texts)
        out = {self.id_col: batch.column(self.id_col),
               "simhash": pa.array(sh, type=pa.uint64())}
        for b in range(4):  # 4 bands × 16 bits: Hamming ≤ 3 ⇒ some band equal
            out[f"band{b}"] = pa.array((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF),
                                       type=pa.uint32())
        return pa.table(out)


def simhash_pairs(ds: Dataset, *, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  max_bucket: int = 200, concurrency=(1, 4),
                  stats: dict | None = None) -> Dataset:
    """Near-dup pairs by SimHash: banded buckets → Hamming verify.
    Hot-bucket truncation is logged + surfaced via ``stats``."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)

    def explode(batch: pa.Table) -> pa.Table:
        parts = []
        for b in range(4):
            parts.append(pa.table({
                "band": pa.array([b] * len(batch), type=pa.int32()),
                "bucket": batch.column(f"band{b}").cast(pa.uint32()),
                id_col: batch.column(id_col),
                "simhash": batch.column("simhash"),
            }))
        return pa.concat_tables(parts)

    banded = sigs.map_batches(explode, batch_format="pyarrow")

    def verify(group: pa.Table):
        g = group.sort_by(id_col).slice(0, max_bucket)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        sh = g.column("simhash").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        x = sh[:, None] ^ sh[None, :]
        ham = np.zeros(x.shape, dtype=np.int64)
        for b in range(64):
            ham += ((x >> np.uint64(b)) & 1).astype(np.int64)
        iu = np.triu_indices(len(ids), 1)
        keep = ham[iu] <= max_hamming
        return (ids[iu[0][keep]], ids[iu[1][keep]], ham[iu][keep],
                max(0, group.num_rows - max_bucket))

    pairs = _bucket_verify(banded, ["band", "bucket"], verify, "hamming",
                           stats=stats,
                           id_type=_col_type(ds, id_col),
                           raw_cap=max_bucket, raw_cap_col=id_col)
    return _dedup_pairs(pairs, "hamming")


# --- embedding cosine near-dup ----------------------------------------------

class HyperplaneLSH:
    """Actor stage: embedding → sign-bucket via random hyperplanes."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 29,
                 emb_col: str = "embedding", id_col: str = "vec_id") -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch.column(self.emb_col)
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = np.asarray(emb.flatten(), dtype=np.float32).reshape(len(batch), -1)
        bits = (mat @ self.planes) > 0
        bucket = (bits.astype(np.uint64)
                  << np.arange(bits.shape[1], dtype=np.uint64)[None, :]).sum(axis=1)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "bucket": pa.array(bucket, type=pa.uint64()),
            self.emb_col: emb,
        })


def embedding_neardup_pairs(ds: Dataset, *, dim: int, threshold: float = 0.95,
                            n_planes: int = 12, seed: int = 29,
                            emb_col: str = "embedding", id_col: str = "vec_id",
                            max_bucket: int = 500, concurrency=(1, 4),
                            stats: dict | None = None) -> Dataset:
    """Near-duplicate embedding pairs: hyperplane-LSH buckets →
    in-bucket pairwise cosine ≥ threshold."""
    bucketed = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "seed": seed,
                               "emb_col": emb_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)

    verify = _cosine_verify(threshold, id_col, emb_col, max_bucket)
    pairs = _bucket_verify(bucketed, ["bucket"], verify, "cosine", stats=stats,
                           id_type=_col_type(ds, id_col),
                           raw_cap=max_bucket, raw_cap_col=id_col)
    return _dedup_pairs(pairs, "cosine")


def _cosine_verify(threshold: float, id_col: str, emb_col: str,
                   max_bucket: int):
    """In-bucket pairwise-cosine verify kernel shared by the
    hyperplane-LSH and k-means-bucketed near-dup paths (one kernel so
    the two bucketings can never disagree on the similarity math)."""

    def verify(group: pa.Table):
        from .clustering import _emb_matrix

        g = group.sort_by(id_col).slice(0, max_bucket)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        mat = _emb_matrix(g, emb_col)  # list<float> → (m, dim) float64
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), 1)
        keep = sims[iu] >= threshold
        return (ids[iu[0][keep]], ids[iu[1][keep]], sims[iu][keep],
                max(0, group.num_rows - max_bucket))

    return verify


def embedding_neardup_kmeans_pairs(ds: Dataset, *, threshold: float = 0.95,
                                   k_cells: int = 16, iters: int = 3,
                                   nprobe: int = 2,
                                   emb_col: str = "embedding",
                                   id_col: str = "vec_id",
                                   max_bucket: int = 500,
                                   stats: dict | None = None) -> Dataset:
    """Near-duplicate embedding pairs with a k-means coarse quantizer
    instead of hyperplane LSH — the IVF-style scale path: cells track
    the data distribution, so bucket sizes stay balanced where random
    hyperplanes fragment dense regions.

    Each vector is MULTI-ASSIGNED to its ``nprobe`` nearest cells
    (a near-identical pair straddling a cell boundary still shares a
    second-nearest cell with high probability — the standard IVF
    multi-probe recall trick); duplicate pairs surfacing from two
    shared cells are collapsed by the same ``_dedup_pairs`` combine the
    LSH path uses. Centroids come from ``clustering.kmeans_fit`` (one
    extra corpus pass per Lloyd iteration; at 100 TB train on a
    deterministic-hash sample instead and pass fewer ``iters``)."""
    from .clustering import _emb_matrix, assign_topp_chunked, kmeans_fit

    # materialize the pruned projection ONCE and share it between the
    # fit and the bucketing pass — letting kmeans_fit materialize its
    # own copy would discard it and re-read the whole corpus here
    proj = ds.select_columns([id_col, emb_col]).materialize()
    fit = kmeans_fit(proj, k_cells, iters=iters, id_col=id_col,
                     emb_col=emb_col, materialize=False)
    cents = fit["centroids"]
    p = min(nprobe, len(cents))

    def bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        mat = _emb_matrix(batch, emb_col)
        # chunked kernel: the (chunk, k_cells, dim) distance temporary
        # is capped at ~64 MB (an unchunked broadcast here was ~400 MB
        # per 1024-row batch at dim=768, k=64 — a heap blowup exactly
        # at the scale this path exists for)
        idx = assign_topp_chunked(mat, cents, p)
        take = np.repeat(np.arange(batch.num_rows), p)
        sub = batch.take(pa.array(take))
        return sub.append_column("bucket", pa.array(idx.ravel()))

    bucketed = proj.map_batches(bucketize, batch_format="pyarrow")
    verify = _cosine_verify(threshold, id_col, emb_col, max_bucket)
    pairs = _bucket_verify(bucketed, ["bucket"], verify, "cosine", stats=stats,
                           id_type=_col_type(ds, id_col),
                           raw_cap=max_bucket, raw_cap_col=id_col)
    return _dedup_pairs(pairs, "cosine")
