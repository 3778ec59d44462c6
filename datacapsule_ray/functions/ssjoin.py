"""Exact set-similarity self-join (token-set Jaccard) via set collapse +
prefix filtering — the EXACT complement to the estimate-based
MinHash/SimHash near-dup family in ``dedup.py``.

Algorithm (all-pairs with prefix filtering; Bayardo/Ma/Srikant, "Scaling
Up All Pairs Similarity Search", WWW 2007; MapReduce formulation per
Vernica/Carey/Li, SIGMOD 2010; the identical-set collapse is the
standard "group by record" preprocessing from the latter):

1. tokenize → per-doc DISTINCT token-hash sets (one u64 hash call per
   batch, per-doc ``np.unique``), plus a 63-bit set fingerprint;
2. COLLAPSE identical sets: docs with equal token sets form a group
   (J = 1 pairwise); their pairs are enumerated directly per group, and
   only one representative per distinct set enters the filter. This is
   what keeps dup-heavy corpora (the common web case) tractable: a
   1000-copy template contributes ONE set to the quadratic stage;
3. document frequencies for FREQUENT tokens (``df > df_cutoff``, at
   distinct-set granularity) via a (token)-keyed count shuffle,
   broadcast via ``ray.put`` (the frequent-token table is at worst
   total_tokens/df_cutoff entries — dimension-sized, not corpus-sized);
4. each distinct set orders its tokens by the global key ``(df(t), t)``
   (rare first; any CONSISTENT total order is exact — frequency order is
   the pruning optimization) and emits its first
   ``|x| - ceil(tau*|x|) + 1`` tokens as prefix rows, each carrying the
   full value-sorted token set;
5. groupby(prefix token) buckets → in-bucket pairwise length filter
   (``tau*|x| <= |y|``) + exact sorted-array intersection. No false
   negatives: two sets with J >= tau must share a prefix token under a
   common total order; no false positives: the intersection is exact;
6. matching SET pairs expand back to doc pairs with two distributed
   joins on group membership (every member pair of two matching sets
   has the same exact (inter, union)).

Shuffles: the df count (u64 rows), one sort by set fingerprint (the
identical-group enumeration), the prefix-bucket groupby, and the two
membership joins — all over hashed-int tables, never the text. A prefix
row carries ~|set| u64s, so prefix-shuffle volume is
O(prefix_len x set_size) per DISTINCT set — same order as the MinHash
banded-signature shuffle. Hot buckets are impossible for tokens with
``df <= df_cutoff`` (bucket size <= df); a frequent token only enters a
prefix when a set consists almost entirely of even-more-frequent tokens,
and such degenerate buckets are capped by ``max_bucket`` with a logged
drop count (``stats['dropped_rows']``). Identical-set groups larger than
``max_bucket`` are likewise capped + logged (at that point the useful
representation is ``exact_dedup``-style keep/drop, not the pair list).

Thresholds are exact integer fractions (``tau = tau_num/tau_den``): the
keep test is ``tau_den*|inter| >= tau_num*|union|`` — bit-identical to a
SQL oracle's integer comparison, no float rounding anywhere. The 63-bit
set fingerprint treats distinct sets as distinct; at >>10^9 distinct
sets widen it to a two-column 128-bit key.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .dedup import _bucket_verify, _col_type, _dedup_pairs

logger = logging.getLogger(__name__)

# (inter, union) pairs ride one float64 through the shared bucket-verify
# machinery: code = inter * 2^26 + union, exact while union < 2^26
_IU_BASE = 67108864.0

# per-worker-process deserialization cache for broadcast ObjectRefs:
# ray.get inside a task re-deserializes the object on every call, which
# matters once the frequent-token dict stops being tiny. Bounded at a
# few entries (not one) so two pipelines sharing a worker pool don't
# thrash it into a per-batch deserialize.
_GET_CACHE: dict = {}
_GET_CACHE_MAX = 4


def _cached_get(ref):
    key = ref.hex()
    if key not in _GET_CACHE:
        if len(_GET_CACHE) >= _GET_CACHE_MAX:
            _GET_CACHE.pop(next(iter(_GET_CACHE)))  # oldest insert
        _GET_CACHE[key] = ray.get(ref)
    return _GET_CACHE[key]


def _doc_token_sets(ds: Dataset, text_col: str, id_col: str,
                    ngram: int = 1) -> Dataset:
    """(id, toks:binary, size, set_hash) — one u64 hash call per batch,
    per-doc unique over numpy slices, one 8-byte blake2b per doc for the
    set fingerprint. ``toks`` is the raw little-endian bytes of the
    value-sorted distinct u64 token hashes (binary rather than
    list<u64> so it survives Acero join payloads and the pandas
    raw-channel round trip; decode with ``np.frombuffer``).

    ``ngram > 1`` switches the set elements from tokens to word
    n-gram SHINGLES (polynomial hashes of n consecutive token hashes,
    ``decontam.flat_gram_hashes`` — vectorized, no shingle strings are
    materialized); equality then means equal space-joined shingles
    modulo hash collisions, the module-header stance."""

    def to_sets(batch: pa.Table) -> pa.Table:
        # ONE tokenize-and-hash implementation shared with the
        # decontamination pass (n=1 degenerates to plain token hashes),
        # so the cross-module gram-hash equality stance can't drift
        from .decontam import _batch_gram_hashes

        texts = batch.column(text_col).to_pylist()
        hs0, lens = _batch_gram_hashes(texts, ngram)
        # 63-bit token hashes: every downstream shuffle key (tok, ptok)
        # then fits int64, avoiding Arrow conversion fallbacks in the
        # groupby path; collision odds are unchanged in practice
        hs = hs0 >> np.uint64(1)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        uniq = [np.unique(hs[s:s + l]) for s, l in zip(starts, lens)]
        sizes = np.array([len(u) for u in uniq], dtype=np.int64)
        fps = np.array([
            int.from_bytes(hashlib.blake2b(u.tobytes(), digest_size=8)
                           .digest(), "big") >> 1
            for u in uniq], dtype=np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "toks": pa.array([u.tobytes() for u in uniq], type=pa.binary()),
            "size": pa.array(sizes),
            "set_hash": pa.array(fps),
        })

    return ds.map_batches(to_sets, batch_format="pyarrow")


def _frequent_token_df(reps: Dataset, df_cutoff: int,
                       probe_cap: int = 2_000_000
                       ) -> tuple[np.ndarray, np.ndarray]:
    """(sorted token hashes, dfs) over DISTINCT sets for tokens with
    df > ``df_cutoff``. The hot table is bounded by
    total_token_occurrences / df_cutoff entries and is broadcast, so it
    is driver-sized by construction; per-block PARTIAL counts (each set
    holds distinct tokens, so a block-local unique+count is exactly
    "sets in this block containing tok") are combined on the driver
    when they fit under ``probe_cap`` rows — one map stage instead of a
    full aggregate shuffle (the shuffle's fixed sort round-trip
    dominates at small scale). Past the probe the exact distributed
    groupby-sum runs instead."""

    def explode_counts(batch: pa.Table) -> pa.Table:
        bufs = batch.column("toks").to_pylist()
        flat = (np.frombuffer(b"".join(bufs), dtype=np.uint64) if bufs
                else np.zeros(0, dtype=np.uint64))
        uq, cnt = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(uq, type=pa.uint64()),
                         "df": pa.array(cnt.astype(np.int64))})

    partial = reps.select_columns(["toks"]).map_batches(
        explode_counts, batch_format="pyarrow")
    probe = partial.limit(probe_cap + 1).to_pandas()
    if len(probe) <= probe_cap:
        if probe.empty:
            return (np.zeros(0, dtype=np.uint64),
                    np.zeros(0, dtype=np.int64))
        agg = probe.groupby("tok", sort=True)["df"].sum()
        hot = agg[agg > int(df_cutoff)]
        return (hot.index.to_numpy().astype(np.uint64),
                hot.to_numpy().astype(np.int64))
    from ray.data.aggregate import Sum

    df = partial.groupby("tok").aggregate(Sum("df", alias_name="df"))
    hot = (df.filter(expr=f"df > {int(df_cutoff)}")
           .sort("tok").to_pandas())
    if "tok" not in hot.columns:  # empty result loses its schema
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    return (hot["tok"].to_numpy().astype(np.uint64),
            hot["df"].to_numpy().astype(np.int64))


def jaccard_ssjoin(ds: Dataset, *, tau_num: int = 9, tau_den: int = 10,
                   text_col: str = "text", id_col: str = "doc_id",
                   df_cutoff: int = 32, max_bucket: int = 4096,
                   num_partitions: int = 4, broadcast_cap: int = 2_000_000,
                   ngram: int = 1, stats: dict | None = None,
                   measure: str = "jaccard") -> Dataset:
    """All pairs (id_a < id_b) with token-set similarity >=
    tau_num/tau_den under ``measure``:

    - ``"jaccard"``: |inter| / |union|; prefix length
      ``n - ceil(tau*n) + 1`` (Bayardo/Ma/Srikant 2007, Table 1).
    - ``"cosine"``: |inter| / sqrt(|a|*|b|) (binary/Ochiai cosine);
      prefix length ``n - ceil(tau^2*n) + 1`` — complete because
      cos >= tau implies the size filter ``|b| >= tau^2*|a|`` and
      hence ``inter >= tau^2 * max(|a|, |b|)`` (same reference).

    Returns (id_a, id_b, n_inter, n_union) — exact integers, so a SQL
    oracle over the same tokenization matches hash-for-hash (the cosine
    keep test squares both sides: ``tau_den^2 * inter^2 >= tau_num^2 *
    |a| * |b|``, exact while set sizes stay < 2^24 tokens — the
    float32 incidence matmul in the bucket verify is the binding
    bound, not the int64 packing). Empty
    documents (no tokens) never pair. ``ngram > 1`` joins on
    word-shingle sets instead of token sets (exact n-gram similarity —
    the shingle complement of the MinHash estimate)."""
    if not (0 < tau_num <= tau_den):
        raise ValueError("tau must satisfy 0 < tau_num/tau_den <= 1")
    if measure not in ("jaccard", "cosine"):
        raise ValueError("measure must be 'jaccard' or 'cosine'")
    tau_num, tau_den = int(tau_num), int(tau_den)
    # prefix-length fraction: tau for jaccard, tau^2 for cosine
    pfx_num, pfx_den = ((tau_num, tau_den) if measure == "jaccard"
                        else (tau_num * tau_num, tau_den * tau_den))
    cosine = measure == "cosine"
    # ONE global sort by set_hash feeds everything downstream: the
    # identical-group enumeration scans the sorted blocks in place
    # (presorted _bucket_verify), and reps fall out of a per-block
    # distinct instead of a groupby+join (each shuffle round-trip costs
    # seconds of fixed overhead and an extra exchange at scale)
    docsets = _doc_token_sets(
        ds.select_columns([id_col, text_col]), text_col, id_col, ngram=ngram
    ).filter(expr="size > 0").sort("set_hash").materialize()
    # doc ids may be strings (the corpus fixtures' 'doc-00000000' shape)
    # or ints — the verify channel and the pair schema follow this type
    id_type = _col_type(docsets, id_col)

    # ---- identical-set groups: reps + direct J=1 pair enumeration ----
    members = docsets.select_columns(["set_hash", id_col])

    def ident_verify(group: pa.Table):
        g = group.sort_by(id_col).slice(0, max_bucket)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        size = g.column("size")[0].as_py()
        iu = np.triu_indices(len(ids), 1)
        code = float(size) * _IU_BASE + float(size)
        return (ids[iu[0]], ids[iu[1]], np.full(len(iu[0]), code),
                max(0, group.num_rows - max_bucket))

    ident_stats: dict = {}
    ident_pairs = _bucket_verify(
        docsets.select_columns(["set_hash", id_col, "size"]),
        ["set_hash"], ident_verify, "iu_code", stats=ident_stats,
        presorted=True, id_type=id_type,
        raw_cap=max_bucket, raw_cap_col=id_col)

    # one representative per distinct set: per-block first occurrence
    # over the sorted blocks. A set straddling a block boundary yields
    # ONE duplicate rep — harmless: all members carry identical toks,
    # so the dup produces only (s,s) self-pairs (filtered below) and
    # repeated (s,t) rows (collapsed by the pair dedup); df counts for
    # its tokens are off by one, which only perturbs the PRUNING order,
    # never exactness (any consistent total order is exact).
    def rep_scan(t: pa.Table) -> pa.Table:
        from .dedup import _run_change_mask

        hs = t.column("set_hash").to_numpy(zero_copy_only=False)
        sub = t.select(["set_hash", "toks", "size"])
        if len(hs) == 0:
            return sub
        return sub.take(pa.array(np.flatnonzero(_run_change_mask(hs))))

    reps = docsets.map_batches(
        rep_scan, batch_format="pyarrow").materialize()

    # ---- cross-set: prefix filtering over DISTINCT sets --------------
    df_ref = ray.put(_frequent_token_df(reps, df_cutoff))

    def emit_prefixes(batch: pa.Table) -> pa.Table:
        """Per-set (rarest-first) token ordering + prefix explosion.
        Stateless TASK stage (an actor pool paid ~2s spin-up the small
        df table never justified); the hot-token arrays are
        deserialized once per worker process via ``_cached_get`` and
        probed with one searchsorted per batch — no per-token Python."""
        hot_keys, hot_dfs = _cached_get(df_ref)
        bufs = batch.column("toks").to_pylist()
        hashes = batch.column("set_hash").to_numpy(zero_copy_only=False)
        sizes = batch.column("size").to_numpy(zero_copy_only=False)
        flat = (np.frombuffer(b"".join(bufs), dtype=np.uint64) if bufs
                else np.zeros(0, dtype=np.uint64))
        offs = np.concatenate(
            ([0], np.cumsum(sizes))).astype(np.int64)
        if len(hot_keys):
            idx = np.searchsorted(hot_keys, flat)
            idx_c = np.minimum(idx, len(hot_keys) - 1)
            dfv = np.where(hot_keys[idx_c] == flat, hot_dfs[idx_c], 0)
        else:  # no token crosses the cutoff: ties broken by value only
            dfv = np.zeros(len(flat), dtype=np.int64)
        out_ptok, out_id, out_size, out_toks = [], [], [], []
        for i in range(len(hashes)):
            s, e = offs[i], offs[i + 1]
            if e == s:
                continue
            n = int(sizes[i])
            p = n - (-((-pfx_num * n) // pfx_den)) + 1  # n - ceil + 1
            order = np.lexsort((flat[s:e], dfv[s:e]))
            prefix = flat[s:e][order[:max(p, 1)]]
            out_ptok.append(prefix)
            out_id.append(np.full(len(prefix), hashes[i], dtype=np.int64))
            out_size.append(np.full(len(prefix), n, dtype=np.int64))
            out_toks.extend([bufs[i]] * len(prefix))  # value-sorted
        cat = (lambda xs, dt: np.concatenate(xs) if xs
               else np.zeros(0, dtype=dt))
        return pa.table({
            "ptok": pa.array(cat(out_ptok, np.uint64)),
            "set_hash": pa.array(cat(out_id, np.int64)),
            "size": pa.array(cat(out_size, np.int64)),
            "toks": pa.array(out_toks, type=pa.binary()),
        })

    banded = reps.map_batches(emit_prefixes, batch_format="pyarrow")

    def cross_verify(group: pa.Table):
        """ALL pairwise intersection sizes for the bucket at once: build
        a bucket-local (set x vocab) incidence matrix and take M @ M.T
        (near-dup buckets share most tokens, so vocab ~ set size, and
        the matmul replaces C(m,2) merge-intersections — measured ~50x
        on 1000-set cliques). float32 accumulates exactly (< 2^24);
        vocab is chunked so the incidence slab stays < ~64 MB."""
        g = group.sort_by("set_hash").slice(0, max_bucket)
        m = g.num_rows
        dropped = max(0, group.num_rows - max_bucket)
        if m < 2:
            return [], [], [], dropped
        hs = g.column("set_hash").to_numpy(zero_copy_only=False)
        sizes = g.column("size").to_numpy(
            zero_copy_only=False).astype(np.int64)
        # zero-copy concatenated token-hash stream straight off the
        # binary column's offsets/data buffers (the pandas path boxed
        # every toks cell into a Python bytes object)
        toks = g.column("toks")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = np.frombuffer(toks.buffers()[1], dtype=np.int32)[
            toks.offset: toks.offset + m + 1].astype(np.int64)
        allt = np.frombuffer(toks.buffers()[2], dtype=np.uint64,
                             count=(off[-1] - off[0]) // 8,
                             offset=int(off[0]))
        vocab, inv = np.unique(allt, return_inverse=True)
        rows = np.repeat(np.arange(m), np.diff(off) // 8)
        inter = np.zeros((m, m), dtype=np.float32)
        chunk = max(1, (16 << 20) // max(m, 1))  # ~64 MB float32 slab
        for lo in range(0, len(vocab), chunk):
            hi = min(lo + chunk, len(vocab))
            sel = (inv >= lo) & (inv < hi)
            slab = np.zeros((m, hi - lo), dtype=np.float32)
            slab[rows[sel], inv[sel] - lo] = 1.0
            inter += slab @ slab.T
        inter_i = inter.astype(np.int64)
        iu, ju = np.triu_indices(m, 1)
        ia = inter_i[iu, ju]
        union = sizes[iu] + sizes[ju] - ia
        if cosine:
            keep = (tau_den * tau_den * ia * ia
                    >= tau_num * tau_num * sizes[iu] * sizes[ju])
        else:
            keep = tau_den * ia >= tau_num * union
        code = ia[keep].astype(np.float64) * _IU_BASE + union[keep]
        return hs[iu[keep]], hs[ju[keep]], code, dropped

    cross_stats: dict = {}
    set_pairs = _bucket_verify(banded, ["ptok"], cross_verify, "iu_code",
                               stats=cross_stats,
                               raw_cap=max_bucket, raw_cap_col="set_hash")
    if stats is not None:
        stats["dropped_rows"] = (ident_stats.get("dropped_rows", 0)
                                 + cross_stats.get("dropped_rows", 0))
    # a set pair can surface from several shared prefix tokens (and a
    # boundary-duplicated rep yields (s,s) self-pairs) — filter the
    # self-pairs, then dedup at SET granularity before the (possibly
    # large) member expansion. ``_dedup_pairs`` is the sorted-scan
    # combine (one range exchange, no aggregate-shuffle fixed cost).
    # Materialized once (inside drop_empty_blocks): the empty-schema
    # check below counts it, and the final plan reuses the same blocks.
    # Laundering matters here: the dedup's filter/union plan leaves
    # SCHEMA-LESS empty blocks on sparse inputs, which poison the
    # membership join's partitioner ("No match for key field id_a").
    from ..traverse import drop_empty_blocks

    set_pairs = drop_empty_blocks(_dedup_pairs(
        set_pairs.filter(expr="id_a != id_b"), "iu_code"))

    # ---- expand set pairs to doc pairs via membership joins ----------
    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        code = t.column("iu_code")
        inter = pc.cast(pc.floor(pc.divide(code, _IU_BASE)), pa.int64())
        union = pc.cast(pc.subtract(
            code, pc.multiply(pc.cast(inter, pa.float64()), _IU_BASE)),
            pa.int64())
        return pa.table({
            "id_a": t.column("id_a"), "id_b": t.column("id_b"),
            "n_inter": inter, "n_union": union,
        })

    # launder the ident channel too: a corpus with no identical sets
    # leaves only empty verify blocks here, and empty blocks BYPASS
    # map_batches — they'd ride past decode schema-less and union with
    # the decoded pairs as a different-schema RefBundle (Ray warns and
    # downstream consumers see a mixed stream). Materializing is cheap:
    # the channel is bounded by the identical-pair output.
    pair_schema = pa.schema([("id_a", id_type), ("id_b", id_type),
                             ("iu_code", pa.float64())])
    ident_pairs = drop_empty_blocks(
        ident_pairs.select_columns(["id_a", "id_b", "iu_code"]), pair_schema)
    n_ident = ident_pairs.count()
    n_set_pairs = set_pairs.count()

    def _empty_decoded() -> Dataset:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
            "n_inter": pa.array([], pa.int64()),
            "n_union": pa.array([], pa.int64())}))

    if n_set_pairs == 0:  # no cross-set candidates survived the filter
        if n_ident == 0:
            return _empty_decoded()
        return ident_pairs.map_batches(decode, batch_format="pyarrow")

    # ---- expansion strategy: broadcast when small, join at scale -----
    # the matched-membership table (docs belonging to sets that appear
    # in some matching pair) is bounded by the OUTPUT size, so when it
    # fits under ``broadcast_cap`` rows a broadcast dict + one map
    # replaces two Acero join exchanges (each ~2s fixed cost at small
    # scale); dup-heavy corpora exceed the probe and take the join path.
    cross_pairs = None
    if n_set_pairs <= broadcast_cap:
        pairs_df = set_pairs.to_pandas()
        hset = np.unique(np.concatenate([pairs_df["id_a"].to_numpy(),
                                         pairs_df["id_b"].to_numpy()]))
        hs_ref = ray.put(hset)

        def member_filter(t: pa.Table) -> pa.Table:
            hs = _cached_get(hs_ref)  # np.unique output → sorted
            x = t.column("set_hash").to_numpy(zero_copy_only=False)
            # searchsorted probe instead of np.isin (which re-sorts the
            # broadcast array on every batch); hs is non-empty here
            idx = np.searchsorted(hs, x)
            ok = idx < len(hs)
            idx[~ok] = 0
            mask = ok & (hs[idx] == x)
            return t.filter(pa.array(mask))

        # limit(cap+1) probes the size in the same pass that collects:
        # exactly cap+1 rows back ⇒ over the cap ⇒ join path
        mdf = (members.map_batches(member_filter, batch_format="pyarrow")
               .limit(broadcast_cap + 1).to_pandas())
        if len(mdf) <= broadcast_cap:
            # three FLAT arrays (sorted keys, member values, run starts)
            # instead of a per-set dict: ~2M one-element ndarray slices
            # in a dict cost hundreds of MB of object overhead to
            # pickle/deserialize; flat arrays ship as three buffers and
            # lookups become np.searchsorted
            keys = mdf["set_hash"].to_numpy()
            order = np.argsort(keys, kind="stable")
            keys = keys[order]
            vals = mdf[id_col].to_numpy()[order]
            starts = np.flatnonzero(
                np.concatenate(([True], keys[1:] != keys[:-1])))
            uniq = keys[starts]
            bounds = np.append(starts, len(keys))
            grp_ref = ray.put((uniq, bounds, vals))

            def _empty_ids(arr: np.ndarray) -> pa.Array:
                if arr.dtype == object:  # string doc ids
                    return pa.array([], type=pa.string())
                return pa.array(np.array([], dtype=arr.dtype))

            def expand_bcast(t: pa.Table) -> pa.Table:
                uq, bd, vl = _cached_get(grp_ref)
                ia = t.column("id_a").to_numpy(zero_copy_only=False)
                ib = t.column("id_b").to_numpy(zero_copy_only=False)
                code = t.column("iu_code").to_numpy(zero_copy_only=False)
                pa_, pb_ = np.searchsorted(uq, ia), np.searchsorted(uq, ib)
                outs_a, outs_b, outs_c = [], [], []
                for x, y, c in zip(pa_, pb_, code):
                    ma = vl[bd[x]:bd[x + 1]]
                    mb = vl[bd[y]:bd[y + 1]]
                    da = np.repeat(ma, len(mb))
                    db = np.tile(mb, len(ma))
                    outs_a.append(np.minimum(da, db))
                    outs_b.append(np.maximum(da, db))
                    outs_c.append(np.full(len(da), c))
                if not outs_a:
                    return pa.table({
                        "id_a": _empty_ids(vl), "id_b": _empty_ids(vl),
                        "iu_code": pa.array([], pa.float64())})
                # no astype: member ids keep their input dtype (uint64 /
                # string), matching the join path's behavior exactly
                return pa.table({
                    "id_a": pa.array(np.concatenate(outs_a)),
                    "id_b": pa.array(np.concatenate(outs_b)),
                    "iu_code": pa.array(np.concatenate(outs_c)),
                })

            cross_pairs = set_pairs.map_batches(
                expand_bcast, batch_format="pyarrow")

    if cross_pairs is None:
        mem_a = members.map_batches(
            lambda t: pa.table({"id_a": t.column("set_hash"),
                                "doc_a": t.column(id_col)}),
            batch_format="pyarrow")
        mem_b = members.map_batches(
            lambda t: pa.table({"id_b": t.column("set_hash"),
                                "doc_b": t.column(id_col)}),
            batch_format="pyarrow")
        j1 = set_pairs.join(mem_a, join_type="inner",
                            num_partitions=num_partitions, on=("id_a",))
        # launder between the chained joins: with few set pairs and
        # huge memberships (the exact regime this path serves), most
        # partitions of j1 receive nothing and Ray 2.49 materializes
        # them schema-less, poisoning the second join's partitioner
        # ("No match for key field") — see traverse.drop_empty_blocks
        j1 = drop_empty_blocks(j1)
        expanded = j1.join(mem_b, join_type="inner",
                           num_partitions=num_partitions, on=("id_b",))

        def orient(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            da, db = t.column("doc_a"), t.column("doc_b")
            return pa.table({
                "id_a": pc.min_element_wise(da, db),
                "id_b": pc.max_element_wise(da, db),
                "iu_code": t.column("iu_code"),
            })

        # launder the second join's output the same way as the first:
        # received-nothing partitions surface as schema-less empties
        # that would bypass orient/decode and pollute the union stream
        cross_pairs = drop_empty_blocks(
            expanded.map_batches(orient, batch_format="pyarrow"),
            pair_schema)
        if cross_pairs.count() == 0:
            if n_ident == 0:
                return _empty_decoded()
            return ident_pairs.map_batches(decode, batch_format="pyarrow")

    out = ident_pairs.union(cross_pairs) if n_ident else cross_pairs
    return out.map_batches(decode, batch_format="pyarrow")
