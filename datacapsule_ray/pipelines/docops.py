"""Document/embedding-table operators wired for the driver's test tables
(documents: doc_id,text,lang,source,n_chars; embeddings: vec_id,
embedding list<float>[64], label). Each paired with a DuckDB oracle in
``__ray_entry__`` unless inherently non-SQL (LSH flavors, IVF)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from ..functions import dedup, similarity, ssjoin, text


def _docs(sf_dir: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


_PAIRS_CACHE: dict[str, Dataset] = {}


def _jaccard_pairs(sf_dir: str) -> Dataset:
    """The exact token-set Jaccard >= 0.9 self-join pair graph,
    materialized ONCE per corpus and shared by the whole neardup family
    (ssjoin_jaccard_docs, triangles, kcore, components, cluster sizes)
    — the way a real pipeline materializes its dup graph once and fans
    analyses out from it, and the _KG_CACHE/_FRAME_CACHE convention.
    The pair set is orders of magnitude smaller than the corpus
    (near-dup pairs are rare), so holding its blocks in the object
    store across queries is cheap; each consumer still streams."""
    if sf_dir not in _PAIRS_CACHE:
        _PAIRS_CACHE[sf_dir] = ssjoin.jaccard_ssjoin(
            _docs(sf_dir, ["doc_id", "text"]),
            tau_num=9, tau_den=10).materialize()
    return _PAIRS_CACHE[sf_dir]


def doc_token_stats(sf_dir: str) -> Dataset:
    return text.token_stats(_docs(sf_dir, ["doc_id", "text"]))


def doc_fingerprint(sf_dir: str) -> Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text.fingerprint_batch, batch_format="pyarrow")


def doc_lang_marker_counts(sf_dir: str) -> Dataset:
    """Per-doc stopword-profile hit counts (the lang-ID evidence columns,
    integer so the SQL oracle matches exactly). Counting kernel shared
    with the lang-ID stage (``text.lang_hit_counts``)."""

    # built once per task closure, not per batch (the arrays are
    # batch-invariant; LangIdActor does the same in __init__)
    profiles = {lang: pa.array(sorted(words))
                for lang, words in text.LANG_PROFILES.items()}

    def counts(batch: pa.Table) -> pa.Table:
        scores = text.lang_hit_counts(batch.column("text"), profiles)
        out = {"doc_id": batch.column("doc_id")}
        for j, lang in enumerate(profiles):
            out[f"{lang}_hits"] = pa.array(scores[:, j])
        return pa.table(out)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(counts, batch_format="pyarrow")


def doc_pack_plan(sf_dir: str, cap: int = 256) -> Dataset:
    """Sequence-packing plan over the documents table: token counts →
    per-partition greedy bins of <= cap tokens (functions/packing.py).
    Rows-only driver check (packing is a sequential scan, not SQL);
    exact per-partition semantics pinned by tests/test_functions.py."""
    from ..functions.packing import pack_sequences

    stats = text.token_stats(_docs(sf_dir, ["doc_id", "text"]))
    return pack_sequences(stats, token_col="n_tokens", id_col="doc_id",
                          cap=cap)


def doc_quality_filter(sf_dir: str) -> Dataset:
    """Pre-training quality filter: keep docs with 50..200 tokens and a
    stopword share of at least 5% (integer arithmetic: 20*stop >= tokens,
    so the SQL oracle matches bit-for-bit)."""
    import pyarrow.compute as pc

    stats = text.token_stats(_docs(sf_dir, ["doc_id", "text"]))

    def keep(t: pa.Table) -> pa.Table:
        n = t.column("n_tokens")
        s = t.column("n_stop_en")
        mask = pc.and_(pc.and_(pc.greater_equal(n, 50), pc.less_equal(n, 200)),
                       pc.greater_equal(pc.multiply(s, 20), n))
        return t.filter(mask).select(["doc_id", "n_tokens", "n_stop_en"])

    return stats.map_batches(keep, batch_format="pyarrow")


def dedup_exact_docs(sf_dir: str) -> Dataset:
    return dedup.exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def dedup_keep_best_docs(sf_dir: str) -> Dataset:
    """Quality-aware exact dedup: per content-hash group keep the doc
    with the most tokens (tie → smallest doc_id), with the group size.
    The keep-POLICY half of the dedup family (pairs → components →
    which copy survives); integer score so the SQL oracle matches
    exactly."""
    def prep(batch: pa.Table) -> pa.Table:
        stats = text.token_stats_batch(batch)
        fp = text.fingerprint_batch(batch)  # ONE content-key definition
        return pa.table({
            "fingerprint": fp.column("fingerprint"),
            "doc_id": batch.column("doc_id"),
            "n_tokens": stats.column("n_tokens"),
        })

    scored = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        prep, batch_format="pyarrow")
    out = dedup.keep_best_dedup(scored, group_col="fingerprint",
                                score_col="n_tokens", id_col="doc_id")
    return out.map_batches(
        lambda t: t.rename_columns(
            ["fingerprint", "keep_id", "keep_n_tokens", "n_copies"]),
        batch_format="pyarrow")


def ssjoin_jaccard_docs(sf_dir: str) -> Dataset:
    """EXACT token-set Jaccard >= 0.9 self-join (set collapse + prefix
    filtering + bucket matmul verify) — integer (n_inter, n_union)
    output, SQL-oracle-checkable, unlike the MinHash/SimHash estimates."""
    return _jaccard_pairs(sf_dir)


def ssjoin_cosine_docs(sf_dir: str) -> Dataset:
    """EXACT binary-cosine (Ochiai) >= 0.95 self-join — the set-cosine
    face of the same prefix-filter machinery (shorter prefixes than the
    equivalent Jaccard: ceil(tau^2 n) vs ceil(tau n)), with the keep
    test squared into pure int64 so the SQL oracle matches bit-exactly.
    Catches asymmetric-size near-dups Jaccard misses (a doc plus its
    50%-longer superset can have cos 0.95 but J 0.65)."""
    return ssjoin.jaccard_ssjoin(
        _docs(sf_dir, ["doc_id", "text"]),
        tau_num=19, tau_den=20, measure="cosine")


def neardup_triangles(sf_dir: str) -> "pd.DataFrame":
    """Dup-cluster transitivity audit: exact triangle/wedge counts on
    the low-degree part of the exact Jaccard>=0.9 graph (hub mass
    reported, not silently dropped — functions/triangles.py has the
    degree-split rationale). One row of BIGINT counters."""
    from ..functions.triangles import triangle_count_lowdeg

    pairs = _jaccard_pairs(sf_dir)
    return triangle_count_lowdeg(pairs, deg_cap=64).to_pandas()


def neardup_kcore(sf_dir: str, k: int = 2, rounds: int = 4) -> Dataset:
    """2-core of the exact Jaccard>=0.9 graph: dup CLUSTERS (nodes that
    keep >=2 dup partners after hangers-on peel away) vs pair noise.
    Fixed ``rounds`` synchronous peels with edge-count early stop —
    deterministic and mirrored by the unrolled SQL oracle
    (functions/kcore.py; the pagerank fixed-iteration convention)."""
    from ..functions.kcore import kcore

    pairs = _jaccard_pairs(sf_dir)
    return kcore(pairs, k=k, rounds=rounds)


def neardup_components_exact(sf_dir: str, rounds: int = 8) -> Dataset:
    """Connected components of the exact Jaccard>=0.9 graph via bounded
    min-label propagation — the SQL-checkable CC face
    (functions/minlabel.py): rounds=8 covers the measured max
    eccentricity (7) across the test corpora, where the result equals
    exact CC (pinned vs ``connected_components`` in pytest). Output:
    (doc_id, component=min doc_id in component) for edge-touched docs."""
    from ..functions.minlabel import minlabel_components

    pairs = _jaccard_pairs(sf_dir)
    lab = minlabel_components(pairs, rounds=rounds)
    return lab.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "component": t.column("lbl")}),
        batch_format="pyarrow")


def dedup_final_docs(sf_dir: str, rounds: int = 8,
                     num_partitions: int = 4) -> Dataset:
    """The dedup CAPSTONE a corpus pipeline actually ships: the final
    keep set after the whole near-dup chain — exact Jaccard>=0.9 pair
    graph (identical docs pair at J=1, so exact dups are subsumed) →
    bounded min-label components → keep each component's minimum doc id
    plus every untouched doc. One LEFT join of the corpus ids against
    the component labels; the labels table is dup-sized, the corpus
    streams. Fully SQL-expressible: the oracle reuses the unrolled
    8-round propagation CTE with a final keep filter."""
    from ..functions.minlabel import minlabel_components
    from ..traverse import drop_empty_blocks

    pairs = _jaccard_pairs(sf_dir)
    lab = minlabel_components(pairs, rounds=rounds)
    ids = _docs(sf_dir, ["doc_id"])
    joined = drop_empty_blocks(
        ids.join(lab, join_type="left_outer",
                 num_partitions=num_partitions,
                 on=("doc_id",), right_on=("node",)),
        pa.schema([("doc_id", pa.int64()), ("lbl", pa.int64())]))

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        did = t.column("doc_id")
        lbl = t.column("lbl")
        mask = pc.or_kleene(pc.is_null(lbl), pc.equal(lbl, did))
        return pa.table({"doc_id": did}).filter(
            pc.fill_null(mask, True))

    return joined.map_batches(keep, batch_format="pyarrow")


def neardup_cluster_sizes(sf_dir: str, rounds: int = 8) -> Dataset:
    """Dup-cluster size histogram — the dedup-QA table (how much mass
    sits in 2-doc pairs vs giant cliques decides the dedup strategy):
    (cluster_size, n_clusters) over the exact Jaccard>=0.9 components.
    Two node-keyed groupbys on top of ``neardup_components_exact``'s
    bounded min-label propagation; output is at most |distinct sizes|
    rows, so nothing downstream is ever large."""
    from ..functions.minlabel import minlabel_components
    from ..traverse import drop_empty_blocks

    pairs = _jaccard_pairs(sf_dir)
    lab = minlabel_components(pairs, rounds=rounds)
    sizes = drop_empty_blocks(
        lab.groupby("lbl").count(),
        pa.schema([("lbl", pa.int64()), ("count()", pa.int64())]))

    def rename(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"cluster_size": pc.cast(t.column("count()"),
                                                 pa.int64())})

    hist = (sizes.map_batches(rename, batch_format="pyarrow")
            .groupby("cluster_size").count())

    def final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "cluster_size": t.column("cluster_size"),
            "n_clusters": pc.cast(t.column("count()"), pa.int64())})

    return drop_empty_blocks(
        hist.map_batches(final, batch_format="pyarrow"),
        pa.schema([("cluster_size", pa.int64()),
                   ("n_clusters", pa.int64())]))


def neardup_bfs_levels(sf_dir: str, max_hops: int = 6) -> Dataset:
    """BFS hop levels from the dup graph's minimum doc id — "how far
    does this duplication neighborhood reach" (the traversal J3 face
    over the neardup family's shared pair graph). Bounded min-plus
    propagation mirrored by a hop-bounded WITH RECURSIVE oracle; runs
    on the memoized exact Jaccard>=0.9 pair Dataset, so the ssjoin is
    never recomputed."""
    from ..functions.bfslevels import bfs_levels

    return bfs_levels(_jaccard_pairs(sf_dir), max_hops=max_hops)


def weighted_sample_docs(sf_dir: str, scale_chars: int = 2000) -> Dataset:
    """Deterministic importance sampling: keep each doc with
    probability min(1, n_chars/scale_chars) decided by its id-hash —
    the size-weighted Bernoulli a training mix uses to upsample long
    documents, with the split_docs_hash reproducibility properties
    (stable across runs/engines, no shuffle, adding docs never flips
    old decisions). The first 8 md5 hex digits read as a uint32 are
    the uniform draw; the SQL oracle reconstructs the same integer
    digit-by-digit."""

    def keep(batch: pa.Table) -> pa.Table:
        import numpy as np

        hexes = _id_hexes(batch)
        u = np.array([int(h[:8], 16) for h in hexes], dtype=np.float64)
        n = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.float64)
        w = np.minimum(1.0, n / float(scale_chars)) * 4294967296.0
        return batch.filter(pa.array(u < w))

    return _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        keep, batch_format="pyarrow")


def docs_snapshot_diff(sf_dir: str, num_partitions: int = 4) -> Dataset:
    """Snapshot diff (change-data-capture): (doc_id, change) between
    two deterministic corpus snapshots — 'old' keeps doc_id % 7 != 0,
    'new' keeps doc_id % 3 != 0 and rewrites every doc_id % 5 == 0
    text — classifying added / removed / changed by content hash via
    ONE distributed full-outer join on the key. Unchanged rows are
    dropped at the join output, so the result is delta-sized: the op
    a daily-refresh pipeline runs to avoid reprocessing 100 TB when
    0.1%% changed. Hash = md5(text), the dedup_exact content-key
    convention, so the SQL oracle mirrors bit-for-bit."""
    import pyarrow.compute as pc

    from ..functions.text import md5_hex_batch
    from ..traverse import drop_empty_blocks

    def _mod(col, k: int):
        # pyarrow.compute has no modulo kernel in this version:
        # x - (x // k) * k via trunc division (ids are non-negative)
        q = pc.divide(col, k)
        return pc.subtract(col, pc.multiply(q, k))

    def snap(keep_mod: int, rewrite: bool, fp_col: str):
        def fn(t: pa.Table) -> pa.Table:
            did = t.column("doc_id")
            t = t.filter(pc.not_equal(_mod(did, keep_mod), 0))
            txt = t.column("text")
            if rewrite:
                mod5 = pc.equal(_mod(t.column("doc_id"), 5), 0)
                txt = pc.if_else(
                    mod5,
                    pc.binary_join_element_wise(
                        pc.cast(txt, pa.string()), "v2", " "),
                    pc.cast(txt, pa.string()))
            return pa.table({
                "doc_id": t.column("doc_id"),
                fp_col: pa.array(md5_hex_batch(txt), type=pa.string())})
        return fn

    docs = _docs(sf_dir, ["doc_id", "text"])
    old = docs.map_batches(snap(7, False, "fp_old"),
                           batch_format="pyarrow")
    new = docs.map_batches(snap(3, True, "fp_new"),
                           batch_format="pyarrow")
    joined = drop_empty_blocks(
        old.join(new, join_type="full_outer",
                 num_partitions=num_partitions, on=("doc_id",)),
        pa.schema([("doc_id", pa.int64()), ("fp_old", pa.string()),
                   ("fp_new", pa.string())]))

    def classify(t: pa.Table) -> pa.Table:
        fo, fn_ = t.column("fp_old"), t.column("fp_new")
        change = pc.if_else(
            pc.is_null(fo), pa.scalar("added", type=pa.string()),
            pc.if_else(pc.is_null(fn_),
                       pa.scalar("removed", type=pa.string()),
                       pc.if_else(pc.not_equal(fo, fn_),
                                  pa.scalar("changed", type=pa.string()),
                                  pa.scalar(None, type=pa.string()))))
        out = pa.table({"doc_id": t.column("doc_id"),
                        "change": change})
        return out.filter(pc.is_valid(out.column("change")))

    return joined.map_batches(classify, batch_format="pyarrow")


def neardup_minhash_eval(sf_dir: str) -> "pd.DataFrame":
    """Dedup-QA scorecard: precision/recall of the MinHash+LSH
    candidate generator against the EXACT Jaccard>=0.9 pair graph —
    the measurement that decides band/row parameters before trusting
    the sketch at scale. One two-key inner join between the two pair
    sets (both orders of magnitude smaller than the corpus); all
    outputs are integers (counts + basis points), so the single-row
    result is deterministic. Rows-only oracle story (the minhash side
    has no SQL form). On dup-heavy corpora (the driver tables) the
    sketch's hot-bucket caps drop most candidates and recall is low —
    the exact signal this scorecard surfaces; realistic-density recall
    is pinned by the scale_shuffle_probe curve in BASELINE.md."""
    exact = _jaccard_pairs(sf_dir)
    cand = dedup_minhash_docs(sf_dir)  # memoized + materialized
    n_exact = exact.count()
    n_cand = cand.count()
    tp = cand.select_columns(["id_a", "id_b"]).join(
        exact.select_columns(["id_a", "id_b"]), join_type="inner",
        num_partitions=4, on=("id_a", "id_b")).count()
    return pd.DataFrame({
        "n_exact": [n_exact], "n_candidates": [n_cand], "n_tp": [tp],
        "n_fp": [n_cand - tp], "n_fn": [n_exact - tp],
        "precision_bp": [10000 * tp // n_cand if n_cand else 0],
        "recall_bp": [10000 * tp // n_exact if n_exact else 0],
    }).astype("int64")


def doc_rolling_fingerprints(sf_dir: str) -> Dataset:
    """Winnowed rolling-hash fingerprints, one row per (doc, fingerprint)
    — the local-similarity channel for plagiarism-style matching."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text.rolling_fingerprints_batch, batch_format="pyarrow")


def _typed_pairs(ds: Dataset, value_col: str,
                 value_type: "pa.DataType") -> Dataset:
    """Launder a pair result into a Dataset with a stable schema even
    when zero pairs survive (an empty Dataset loses its schema). Stays
    distributed: at 100× a dup-heavy corpus the pair output is
    unbounded, so the caller decides whether to collect it (VERDICT r3
    item 4 — mirrors ``ssjoin_jaccard_docs``)."""
    from ..traverse import drop_empty_blocks

    empty = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       (value_col, value_type)])
    out = drop_empty_blocks(ds, empty)
    if out.count() == 0:
        # Ray's to_pandas drops the columns of an all-empty dataset;
        # a typed empty frame keeps the schema stable for the gate
        # (count() is free here — drop_empty_blocks materialized)
        return empty.empty_table().to_pandas()
    return out


_MINHASH_CACHE: dict[str, Dataset] = {}


def dedup_minhash_docs(sf_dir: str) -> Dataset:
    """MinHash+LSH candidate pairs, materialized ONCE per corpus (the
    _jaccard_pairs convention) — shared by the QA scorecard
    (neardup_minhash_eval) and any direct consumer; the candidate set
    is dup-sized, cheap to pin in the object store."""
    if sf_dir not in _MINHASH_CACHE:
        out = _typed_pairs(
            dedup.minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                    threshold=0.7),
            "est_jaccard", pa.float64())
        if isinstance(out, Dataset):
            out = out.materialize()
        _MINHASH_CACHE[sf_dir] = out
    return _MINHASH_CACHE[sf_dir]


def dedup_minhash_components(sf_dir: str) -> Dataset:
    """The FULL near-dup dedup pipeline: MinHash+LSH candidate pairs →
    min-label connected components → per-doc keep/drop decision (keep =
    the component's min-hash id). One row per document that belongs to
    a multi-doc near-dup cluster, mapped back to string doc_ids with
    distributed joins — the id↔surrogate mapping never lands on the
    driver (doc_ids are fact-scale at 100×). Returns a DATASET: the
    drop list is unbounded at scale (every near-dup member), so the
    caller decides whether to collect it."""
    import pyarrow as _pa

    docs = _docs(sf_dir, ["doc_id", "text"])

    def with_idx(t: _pa.Table) -> _pa.Table:
        # stable 63-bit surrogate: min-label CC needs a total order,
        # any deterministic one works
        h = pd.util.hash_pandas_object(
            pd.Series(t.column("doc_id").to_pylist(), dtype=object),
            index=False).to_numpy() >> np.uint64(1)
        return t.append_column("doc_idx", _pa.array(h.astype(np.int64)))

    mapped = docs.map_batches(with_idx, batch_format="pyarrow")
    pairs = dedup.minhash_lsh_pairs(mapped, threshold=0.7, id_col="doc_idx")
    labels = dedup.connected_components(
        pairs, mapped.select_columns(["doc_idx"]), id_col="doc_idx")
    import pyarrow.compute as _pc

    dups = labels.map_batches(
        lambda t: t.filter(_pc.not_equal(t.column("comp"), t.column("id"))),
        batch_format="pyarrow").materialize()
    out_schema = _pa.schema([("doc_id", _pa.string()),
                             ("keep_id", _pa.string())])
    from ..traverse import drop_empty_blocks

    if dups.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    mapping = mapped.select_columns(["doc_idx", "doc_id"])
    a = dups.join(mapping, join_type="inner", num_partitions=2,
                  on=("id",), right_on=("doc_idx",))
    # launder between the chained joins: a sparse dup set can leave a
    # received-nothing partition in `a`, which Ray 2.49 materializes
    # schema-less and which poisons the second join's partitioner
    a = drop_empty_blocks(a)
    b = a.join(mapping, join_type="inner", num_partitions=2,
               on=("comp",), right_on=("doc_idx",),
               left_suffix="", right_suffix="_keep")
    out = b.map_batches(
        lambda t: _pa.table({"doc_id": t.column("doc_id"),
                             "keep_id": t.column("doc_id_keep")}),
        batch_format="pyarrow")
    return drop_empty_blocks(out, out_schema)


def dedup_simhash_docs(sf_dir: str) -> Dataset:
    return _typed_pairs(dedup.simhash_pairs(_docs(sf_dir, ["doc_id", "text"])),
                        "hamming", pa.int64())


def neardup_embeddings(sf_dir: str) -> Dataset:
    return _typed_pairs(
        dedup.embedding_neardup_pairs(_emb(sf_dir), dim=64, threshold=0.95),
        "cosine", pa.float64())


def neardup_embeddings_kmeans(sf_dir: str) -> Dataset:
    """k-means-bucketed variant of the embedding near-dup (IVF-style
    scale path; rows-only — recall/bucketing pinned by pytest)."""
    return _typed_pairs(
        dedup.embedding_neardup_kmeans_pairs(_emb(sf_dir), threshold=0.95),
        "cosine", pa.float64())


def _query_vec(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t.column("vec_id").to_pylist().index(0)
    return np.asarray(t.column("embedding").to_pylist()[idx], dtype=np.float64)


def sim_topk_embeddings(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Exact top-k cosine vs the vec_id=0 embedding, rounded for stable
    cross-engine comparison."""
    q = _query_vec(sf_dir)
    # over-fetch, round, then re-rank on the rounded value with vec_id
    # tiebreak — matches the SQL oracle's ORDER BY sim_r DESC, vec_id
    df = similarity.topk_cosine(_emb(sf_dir), q, max(k * 5, 50))
    out = df[["vec_id", "sim"]].copy()
    out["sim_r"] = out["sim"].round(4)
    out = out.sort_values(["sim_r", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
    return out[["vec_id", "sim_r"]].reset_index(drop=True)


def sim_ivf_topk_embeddings(sf_dir: str, k: int = 10) -> pd.DataFrame:
    q = _query_vec(sf_dir)
    df = similarity.ivf_topk_cosine(_emb(sf_dir), q, k, n_cells=8, nprobe=4)
    out = df[["vec_id", "sim"]].copy()
    out["sim_r"] = out["sim"].round(4)
    return out[["vec_id", "sim_r"]].reset_index(drop=True)


def sim_ivf_exhaustive_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """IVF with nprobe = n_cells (every cell probed) is EXACT, so the
    whole IVF machinery — centroid training, cell assignment, union
    prefilter, per-query probe mask, per-block partial top-k, final
    merge — carries the full brute-force SQL oracle. The nprobe=4 twin
    above exercises the approximate path (rows-only + recall test)."""
    q = _query_vec(sf_dir)
    df = similarity.ivf_topk_cosine(_emb(sf_dir), q, max(k * 5, 50),
                                    n_cells=8, nprobe=8)
    out = df[["vec_id", "sim"]].copy()
    out["sim_r"] = out["sim"].round(4)
    out = out.sort_values(["sim_r", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
    return out[["vec_id", "sim_r"]].reset_index(drop=True)


def media_features_demo(sf_dir: str) -> Dataset:
    """Multimodal plumbing demo over a deterministic media table derived
    from documents (payload = utf-8 text bytes standing in for image
    bytes; the decode step is the documented stub)."""
    from ..functions import multimodal as mm

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table({
            "media_ref": pa.array([f"media://doc/{i}" for i in ids]),
            "kind": pa.array(["image"] * len(ids)),
            "payload": pa.array([(t or "").encode() for t in texts], type=pa.binary()),
            "meta": pa.array([{"width": 64, "height": 64, "duration_ms": 4000}] * len(ids)),
        })

    media = _docs(sf_dir, ["doc_id", "text"]).map_batches(to_media, batch_format="pyarrow")
    return mm.extract_media_features(media, out_dim=16)


def media_resize_plan(sf_dir: str) -> Dataset:
    """Aspect-preserving resize into a 224×224 box over a media table
    with doc_id-derived dimensions. The geometry columns are exact
    integer arithmetic → full SQL oracle; the resampled payload (the
    stubbed codec half) is dropped from the checked projection."""
    from ..functions import multimodal as mm

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table({
            "media_ref": pa.array([f"media://img/{i}" for i in ids]),
            "kind": pa.array(["image"] * len(ids)),
            "payload": pa.array([(t or "").encode() for t in texts],
                                type=pa.binary()),
            "meta": pa.array([
                {"width": 320 + (int(i) % 5) * 80,
                 "height": 200 + (int(i) % 7) * 60,
                 "duration_ms": 0} for i in ids]),
        })

    media = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow")
    return mm.resize_media(media, max_w=224, max_h=224).drop_columns(
        ["payload"])


_FRAME_CACHE: dict[str, Dataset] = {}


def frame_sample_demo(sf_dir: str) -> Dataset:
    # materialized + cached: the driver gate runs both `frame_sample`
    # and `frame_sample_plan` (a projection of this result) — without
    # the cache the media pipeline executes twice per gate run
    if sf_dir in _FRAME_CACHE:
        return _FRAME_CACHE[sf_dir]
    from ..functions import multimodal as mm

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table({
            "media_ref": pa.array([f"media://vid/{i}" for i in ids]),
            "kind": pa.array(["video"] * len(ids)),
            "payload": pa.array([(t or "").encode() for t in texts], type=pa.binary()),
            "meta": pa.array([{"width": 64, "height": 64,
                               "duration_ms": 3000 + 500 * (int(i) % 4)} for i in ids]),
        })

    media = _docs(sf_dir, ["doc_id", "text"]).map_batches(to_media, batch_format="pyarrow")
    _FRAME_CACHE[sf_dir] = mm.sample_frames(media, every_ms=1000).materialize()
    return _FRAME_CACHE[sf_dir]


def doc_top_bigrams(sf_dir: str) -> Dataset:
    """Top-20 corpus bigrams, deterministic (n DESC, bigram ASC)."""
    return text.bigram_counts(_docs(sf_dir, ["doc_id", "text"]), top_n=20)


def doc_top_tokens(sf_dir: str) -> pd.DataFrame:
    """Corpus top-20 tokens via the bounded-memory heavy-hitters sketch
    (functions/sketches.py): per-block truncated exact counts + a
    per-block drop bound. Exact at test scale (every block holds its
    full vocabulary → the SQL oracle hash-matches, including the
    count_hi/exact columns); at web scale the [lo, hi] interval widens
    honestly instead of OOMing on the value domain."""
    from ..functions.sketches import heavy_hitters

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # the Arrow-native tokenize kernel (same null/empty semantics
        # as text.py's token_stats): no per-doc Python loop
        texts = pc.fill_null(t.column("text"), "")
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
        flat = pc.list_flatten(toks)
        return pa.table({"token": flat.combine_chunks()
                         if isinstance(flat, pa.ChunkedArray) else flat})

    toks = _docs(sf_dir, ["text"]).map_batches(explode,
                                               batch_format="pyarrow")
    return heavy_hitters(toks, "token", k=50000, top=20)


def doc_top_terms(sf_dir: str) -> Dataset:
    """Per-doc most distinctive term (tf DESC, df ASC, token ASC —
    float-free TF-IDF ranking, SQL-oracle-checkable)."""
    return text.top_distinctive_terms(_docs(sf_dir, ["doc_id", "text"]))


def doc_oov_stats(sf_dir: str, min_df: int = 3,
                  num_partitions: int = 2) -> Dataset:
    """Tokenizer-coverage statistics: per doc, total token occurrences
    and how many fall outside the corpus vocabulary (tokens appearing
    in >= ``min_df`` docs) — the OOV-rate gate of a training-data
    pipeline. One vectorized explode gives exact per-(doc, token)
    occurrence rows (each doc lives in one block, so block partials are
    final); document frequency is a token-keyed groupby over those
    rows; OOV mass is a token-keyed LEFT ANTI join against the
    vocabulary (kept distributed — a real vocabulary outgrows any
    broadcast) plus one doc-keyed sum. Docs with zero tokens surface
    with (0, 0) via a final doc-keyed left join from the corpus."""
    import pyarrow.compute as pc

    from ..traverse import drop_empty_blocks

    docs = _docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        n = t.num_rows
        flat = toks.flatten()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(n, dtype=np.int64), lengths)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            parent = parent[keep]
        if not len(flat):
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "token": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        grp, counts = np.unique(parent * k + codes, return_counts=True)
        return pa.table({
            "doc_id": pa.array(ids[grp // k]),
            "token": enc.dictionary.take(pa.array(grp % k)),
            "c": pa.array(counts.astype(np.int64))})

    occ_schema = pa.schema([("doc_id", pa.int64()),
                            ("token", pa.string()), ("c", pa.int64())])
    occ = drop_empty_blocks(
        docs.map_batches(explode, batch_format="pyarrow"),
        occ_schema).materialize()
    from ray.data.aggregate import Count

    vocab = drop_empty_blocks(
        occ.groupby("token").aggregate(Count(alias_name="_df"))
        .filter(expr=f"_df >= {min_df}").select_columns(["token"]),
        pa.schema([("token", pa.string())]))
    tot = drop_empty_blocks(
        occ.groupby("doc_id").sum("c")
        .map_batches(lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(t.column("sum(c)"), pa.int64())}),
            batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())]))
    oov = drop_empty_blocks(
        occ.join(vocab, join_type="left_anti",
                 num_partitions=num_partitions, on=("token",))
        .groupby("doc_id").sum("c")
        .map_batches(lambda t: pa.table({
            "oov_doc": t.column("doc_id"),
            "n_oov": pc.cast(t.column("sum(c)"), pa.int64())}),
            batch_format="pyarrow"),
        pa.schema([("oov_doc", pa.int64()), ("n_oov", pa.int64())])
    ).materialize()
    base = drop_empty_blocks(
        _docs(sf_dir, ["doc_id"]).join(
            tot, join_type="left_outer", num_partitions=num_partitions,
            on=("doc_id",)),
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())]))
    if oov.count() == 0:
        # fully-in-vocabulary corpus: joining against an all-empty
        # right side crashes the hash-shuffle aggregator (kcore note)
        def final0(t: pa.Table) -> pa.Table:
            filled = pc.fill_null(pc.cast(t.column("n_tokens"),
                                          pa.int64()), 0)
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_tokens": filled,
                "n_oov": pa.array(np.zeros(t.num_rows, dtype=np.int64))})

        return base.map_batches(final0, batch_format="pyarrow")
    out = drop_empty_blocks(
        base.join(oov, join_type="left_outer",
                  num_partitions=num_partitions,
                  on=("doc_id",), right_on=("oov_doc",)))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.fill_null(pc.cast(t.column("n_tokens"),
                                             pa.int64()), 0),
            "n_oov": pc.fill_null(pc.cast(t.column("n_oov"),
                                          pa.int64()), 0)})

    return drop_empty_blocks(
        out.map_batches(final, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                   ("n_oov", pa.int64())]))


def sample_docs_hash(sf_dir: str) -> Dataset:
    """Deterministic ~1/16 uniform sample: keep docs whose id-hash first
    hex digit is '0'. Reproducible across runs/engines (the property a
    training-data sample needs — rerunning the pipeline yields the SAME
    subset), embarrassingly parallel, no shuffle."""
    import pyarrow.compute as pc

    from ..functions.text import md5_hex_batch

    def pick(batch: pa.Table) -> pa.Table:
        hexes = md5_hex_batch(pc.cast(batch.column("doc_id"), pa.string()))
        keep = [h[0] == "0" for h in hexes]
        return batch.filter(pa.array(keep))

    return _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        pick, batch_format="pyarrow")


def sample_docs_stratified(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Deterministic stratified sample: per language, the k docs with
    the smallest id-hash (a seedless 'random' pick that is stable across
    engines). Per-batch partial top-k per stratum (Arrow sort + run-
    boundary head-k — no pandas boxing in the distributed pass), then a
    driver merge over O(blocks x strata x k) rows — never the table."""
    import pyarrow.compute as pc

    from ..functions.text import md5_hex_batch

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "lang": t.column("lang"),
            "doc_id": t.column("doc_id"),
            "h": md5_hex_batch(pc.cast(t.column("doc_id"), pa.string()))})
        srt = tt.take(pc.sort_indices(tt, sort_keys=[
            ("lang", "ascending"), ("h", "ascending"),
            ("doc_id", "ascending")]))
        lang = srt.column("lang").to_numpy(zero_copy_only=False)
        n = len(lang)
        if n == 0:
            return srt
        new = np.ones(n, dtype=bool)
        new[1:] = lang[1:] != lang[:-1]
        starts = np.flatnonzero(new)
        pos = np.arange(n) - starts[np.cumsum(new) - 1]  # rank in stratum
        return srt.filter(pa.array(pos < k))

    parts = (_docs(sf_dir, ["doc_id", "lang"])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    out = (parts.sort_values(["lang", "h", "doc_id"], kind="stable")
           .groupby("lang").head(k))
    return out[["lang", "doc_id"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Quality / scrubbing / clustering additions (round 3)
# ---------------------------------------------------------------------------

def doc_repetition_stats(sf_dir: str) -> Dataset:
    """Gopher-style per-doc token-repetition signal (all-integer; full
    SQL oracle)."""
    return text.repetition_stats(_docs(sf_dir, ["doc_id", "text"]))


# fires on the synthetic corpus (no real PII in the test tables); the
# email/url/ipv4/phone presets are pinned by tests/test_functions.py
REDACT_DEMO_PATTERN = r"\b(customer|spark)\b"


def docs_redacted(sf_dir: str) -> Dataset:
    """C4-style regex scrub as one RE2 kernel call per batch; the gate
    query uses a corpus-firing pattern so the oracle exercises real
    replacements (DuckDB regexp_replace 'g' == pc.replace_substring_regex,
    both RE2)."""
    return text.redact(_docs(sf_dir, ["doc_id", "text"]),
                       [REDACT_DEMO_PATTERN], "<ENT>")


def embedding_dim_stats(sf_dir: str, dim: int = 64) -> Dataset:
    """Per-dimension corpus statistics over the embedding column — the
    normalization pre-pass of an embedding pipeline (whitening, scaling,
    drift checks). Each block contributes one d-row partial (dimension,
    Σ round(x·1e6), Σ round(x·1e3)², count) — all exact int64, so the
    merge is order-independent and the result hash-matches SQL; means /
    variances are one division away for the caller. The combine is a
    d-row groupby: shuffle volume is O(blocks·d), never O(rows)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    emb = _emb(sf_dir, ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        flat = pc.list_flatten(col)
        f64 = pc.cast(flat, pa.float64())
        # same quantization path as the cents convention: pc.round
        # half_towards_infinity == SQL ROUND (relational._cents note)
        q6 = pc.cast(pc.round(pc.multiply(f64, 1e6),
                              round_mode="half_towards_infinity"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        q3 = pc.cast(pc.round(pc.multiply(f64, 1e3),
                              round_mode="half_towards_infinity"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        n = t.num_rows
        m6 = q6.reshape(n, dim)
        m3 = q3.reshape(n, dim)
        return pa.table({
            "i": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
            "s6": pa.array(m6.sum(axis=0, dtype=np.int64)),
            "sq3": pa.array((m3 * m3).sum(axis=0, dtype=np.int64)),
            "cnt": pa.array(np.full(dim, n, dtype=np.int64)),
        })

    agg = (emb.map_batches(partial, batch_format="pyarrow")
           .groupby("i")
           .aggregate(Sum("s6", alias_name="sum_e6"),
                      Sum("sq3", alias_name="sumsq_e3"),
                      Sum("cnt", alias_name="n")))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"i": t.column("i"),
                         "sum_e6": pc.cast(t.column("sum_e6"), pa.int64()),
                         "sumsq_e3": pc.cast(t.column("sumsq_e3"),
                                             pa.int64()),
                         "n": pc.cast(t.column("n"), pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")


def doc_lm_scores(sf_dir: str) -> Dataset:
    """Corpus-trained bigram-LM scoring (CCNet-style perplexity
    filter): every doc's mean negative log2 smoothed bigram
    probability under the corpus's own counts (functions/lm.py).
    Rows-only oracle story (log floats); pure-python reference parity
    pinned by pytest."""
    from ..functions.lm import bigram_lm_scores

    return bigram_lm_scores(_docs(sf_dir, ["doc_id", "text"]))


def embedding_top_pc(sf_dir: str, dim: int = 64,
                     iters: int = 8) -> "pd.DataFrame":
    """Dominant PCA direction of the embedding corpus via distributed
    power iteration (functions/linalg.py) — the drift-axis/whitening
    probe of an embedding QA pass. One pass per iteration; each block
    ships a d-float partial, vectors never leave the workers. Rows-only
    oracle story (iterative float linear algebra has no SQL form);
    numpy eigendecomposition parity is pinned by pytest."""
    from ..functions.linalg import top_principal_direction

    v, lam, n = top_principal_direction(
        _emb(sf_dir, ["embedding"]), dim=dim, iters=iters)
    return pd.DataFrame({
        "i": np.arange(dim, dtype=np.int64),
        "loading": v,
        "eigenvalue": np.full(dim, lam),
        "n_rows": np.full(dim, n, dtype=np.int64)})


def cluster_assign_embeddings(sf_dir: str, k: int = 8) -> Dataset:
    """Fixed-centroid nearest-neighbor assignment (the SQL-checkable
    half of k-means): centroids are the embeddings of the k smallest
    vec_ids, clusters labeled by seed id so the output is pure
    integers."""
    from ..functions import clustering

    emb = _emb(sf_dir, ["vec_id", "embedding"])
    ids, cents = clustering.seed_centroids(emb, k)
    return clustering.kmeans_assign(emb, cents, labels=ids,
                                    out_col="centroid_id")


def diverse_sample_embeddings(sf_dir: str, k: int = 8,
                              cap: int = 5) -> Dataset:
    """Cluster-capped diversity sampling: nearest-centroid assignment
    (the SQL-checkable cluster_assign_embeddings face) then at most
    ``cap`` rows per cell chosen by id-hash order — the "spread the
    sample across embedding space" selection a training mix uses
    instead of uniform sampling, with the split_docs_hash determinism
    properties. One assignment pass + one range-partitioned sort;
    output is k*cap rows."""
    from ..functions import clustering
    from ..functions.text import md5_hex_batch
    from ..functions.topk import per_group_topk

    emb = _emb(sf_dir, ["vec_id", "embedding"])
    ids, cents = clustering.seed_centroids(emb, k)
    assigned = clustering.kmeans_assign(emb, cents, labels=ids,
                                        out_col="centroid_id")

    def add_hash(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        h = md5_hex_batch(pc.cast(t.column("vec_id"), pa.string()))
        return pa.table({"centroid_id": t.column("centroid_id"),
                         "vec_id": t.column("vec_id"),
                         "h": pa.array(h, type=pa.string())})

    picked = per_group_topk(
        assigned.map_batches(add_hash, batch_format="pyarrow"),
        group_col="centroid_id", order_cols=["h", "vec_id"],
        descending=[False, False], k=cap)
    return picked.map_batches(
        lambda t: t.select(["centroid_id", "vec_id"]),
        batch_format="pyarrow")


def kmeans_clusters_embeddings(sf_dir: str, k: int = 8,
                               iters: int = 5) -> Dataset:
    """Full Lloyd's k-means (iterative — rows-only driver check; exact
    sequential-reference parity pinned in tests/test_functions.py)."""
    from ..functions import clustering

    emb = _emb(sf_dir, ["vec_id", "embedding"])
    fit = clustering.kmeans_fit(emb, k, iters=iters)
    return clustering.kmeans_assign(emb, fit["centroids"])


def _id_hexes(batch: pa.Table, id_col: str = "doc_id") -> list[str]:
    """md5 hex digests of the stringified id column — the shared key
    the split, mixture and sampling rules all derive from."""
    import pyarrow.compute as pc

    from ..functions.text import md5_hex_batch

    return md5_hex_batch(pc.cast(batch.column(id_col), pa.string()))


def _split_of(hexes: list[str]) -> pa.Array:
    """train/val/test by the id-hash's first hex digit (12/2/2
    sixteenths) — ORACLE-PINNED: the 'cd'/'ef' digit sets appear
    verbatim in every split oracle; change both together."""
    return pa.array(["val" if h[0] in "cd" else "test" if h[0] in "ef"
                     else "train" for h in hexes], type=pa.string())


def _mix_keep(hexes: list[str], source_col) -> pa.Array:
    """Weighted-mixture acceptance: id-hash byte < rate·256 with
    rate = (src_number % 4 + 1)/4 — ORACLE-PINNED threshold (the
    64·(n%4+1) constant appears verbatim in the mixture oracles)."""
    import pyarrow.compute as pc

    byte = np.array([int(h[:2], 16) for h in hexes], dtype=np.int64)
    srcn = pc.cast(pc.utf8_slice_codeunits(source_col, start=3),
                   pa.int64()).to_numpy(zero_copy_only=False)
    # numpy '%' is floor-mod (sign follows divisor) while the oracle's
    # DuckDB '%' truncates (sign follows dividend): the two diverge on
    # negative suffixes, so the 'srcN, N >= 0' naming contract is
    # enforced rather than assumed
    if len(srcn) and srcn.min() < 0:
        raise ValueError(
            "mixture_sample_docs requires non-negative 'srcN' source "
            f"suffixes (got min {srcn.min()}): Python floor-mod and SQL "
            "truncating-mod diverge below zero")
    return pa.array(byte < (srcn % 4 + 1) * 64)


def split_docs_hash(sf_dir: str) -> Dataset:
    """Deterministic train/val/test split (12/2/2 sixteenths) keyed on
    the id-hash's first hex digit — reproducible across engines and
    runs, embarrassingly parallel, no shuffle; the property a
    training-data split needs (re-running the pipeline puts every doc
    in the SAME split, and adding docs never reassigns old ones)."""

    def assign(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "split": _split_of(_id_hexes(batch))})

    return _docs(sf_dir, ["doc_id"]).map_batches(assign,
                                                 batch_format="pyarrow")


def source_cap_docs(sf_dir: str, k: int = 2) -> Dataset:
    """Per-source document cap (keep each source's k longest docs,
    doc_id tiebreak) — the per-domain cap every web pipeline applies so
    one hot domain can't dominate the training mix. Distributed
    per-group top-k via functions/topk.py (sort + run-boundary take,
    O(blocks) driver fixup)."""
    from ..functions.topk import per_group_topk

    return per_group_topk(_docs(sf_dir, ["source", "doc_id", "n_chars"]),
                          group_col="source",
                          order_cols=["n_chars", "doc_id"],
                          descending=[True, False], k=k)


def decontaminate_docs(sf_dir: str, n: int = 4) -> Dataset:
    """Benchmark decontamination over the documents table: docs with
    ``doc_id % 101 == 0`` stand in for the eval set; every other doc
    sharing a word 4-gram with them is flagged with its distinct-gram
    hit count (functions/decontam.py — broadcast gram set + one
    shuffle-free streaming scan). Real pipelines use 8–13-grams; n=4
    because the synthetic vocabulary is tiny."""
    from ..functions.decontam import decontaminate

    def is_bench(batch: pa.Table) -> pa.Array:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.array(ids % 101 == 0)

    return decontaminate(_docs(sf_dir, ["doc_id", "text"]), is_bench, n=n)


def docs_normalized(sf_dir: str) -> Dataset:
    """Canonical normalization fingerprints (lower/collapse-ws/trim →
    md5) — the pre-dedup normalization pass."""
    return text.normalize(_docs(sf_dir, ["doc_id", "text"]))


def ssjoin_ngram_docs(sf_dir: str) -> Dataset:
    """EXACT word-3-gram-shingle Jaccard >= 0.5 self-join — the n-gram
    Jaccard dedup flavor (same prefix-filter engine as the token-set
    join, sets swapped for shingle sets)."""
    return ssjoin.jaccard_ssjoin(_docs(sf_dir, ["doc_id", "text"]),
                                 tau_num=1, tau_den=2, ngram=3)


def mixture_sample_docs(sf_dir: str) -> Dataset:
    """Weighted training-mix composer: each source gets a deterministic
    acceptance rate (here (src_number % 4 + 1)/4 — the shape of a real
    mix table: upsample curated sources, downsample crawl) and a doc is
    kept iff its id-hash byte falls under rate*256. Same id-hash
    acceptance as ``sample_docs_hash`` but per-source — deterministic,
    shuffle-free, stable under corpus growth, and composable with the
    split (the split and the mix key off the same id so membership
    never drifts between runs). At 100 TB this is one streaming filter;
    the weight table is a broadcast-sized dict by construction (one
    entry per source/domain)."""

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(
            _mix_keep(_id_hexes(batch), batch.column("source")))

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        pick, batch_format="pyarrow")


def training_mix_docs(sf_dir: str, num_partitions: int = 4) -> Dataset:
    """The CAPSTONE hygiene pipeline — every stage composed end-to-end
    the way a real pre-training mix build chains them, with a single
    nested-CTE SQL oracle over the whole composition:

      1. absolute quality gate (n_chars >= 100; pruned at the read),
      2. benchmark decontamination (eval = doc_id % 101 == 0; drop the
         eval docs AND every doc sharing a word 4-gram with them —
         broadcast gram set, one streaming scan; the hit list is then
         anti-applied as a broadcast filter while it fits 2M ids, and
         as a distributed LEFT ANTI join past that),
      3. exact dedup over NORMALIZED text (lower/collapse-ws/trim →
         md5; keep the smallest doc_id) via ``per_group_topk(k=1)`` —
         one sort exchange, the winner row keeps its source column so
         no recovery join is needed,
      4. weighted per-source mixture (id-hash byte < rate·256),
      5. deterministic train/val/test split label.

    Returns (doc_id, source, split). ONE shuffle end to end in the
    usual regime (the dedup sort; the contamination drop is a
    broadcast filter); everything else is streaming maps over Arrow
    batches. Stage order is load-bearing: dedup runs AFTER the
    contamination drop so a contaminated copy can never shadow a clean
    duplicate out of the mix."""
    from ..functions.decontam import decontaminate
    from ..functions.text import normalize_batch
    from ..functions.topk import per_group_topk
    from ..traverse import drop_empty_blocks

    docs = _docs(sf_dir, ["doc_id", "source", "text", "n_chars"])

    def is_bench(batch: pa.Table) -> pa.Array:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.array(ids % 101 == 0)

    # hit list from the UNGATED corpus (the eval set is external in
    # reality — the gate applies to mix candidates, not to it).
    # Laundered: most scan batches yield 0 hits, their 0-row outputs
    # bypass the Project and reach the anti-join schema-less, poisoning
    # its partitioner ("No match for key field doc_id").
    hits = drop_empty_blocks(
        decontaminate(docs, is_bench, n=4).select_columns(["doc_id"]),
        pa.schema([("doc_id", pa.int64())]))
    n_hits = hits.count()  # free: materialized by the laundering

    def gate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ok = pc.and_(pa.array(ids % 101 != 0),
                     pc.greater_equal(batch.column("n_chars"), 100))
        return batch.filter(ok).select(["doc_id", "source", "text"])

    cand = docs.map_batches(gate, batch_format="pyarrow")
    if n_hits <= 2_000_000:
        # the usual regime: contamination is rare, the hit list is a
        # broadcast-sized int array — one streaming anti-filter beats a
        # hash-join exchange (and a sparse/empty right side would leave
        # Ray 2.49's per-partition join builds schema-less)
        import ray as _ray

        hit_ids = (np.sort(hits.to_pandas()["doc_id"].to_numpy())
                   if n_hits else np.zeros(0, dtype=np.int64))
        hit_ref = _ray.put(hit_ids)

        def drop_hits(batch: pa.Table) -> pa.Table:
            h = _ray.get(hit_ref)
            if len(h) == 0:
                return batch
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(h, ids)
            pos[pos == len(h)] = 0
            return batch.filter(pa.array(~(h[pos] == ids)))

        clean = cand.map_batches(drop_hits, batch_format="pyarrow")
    else:
        clean = drop_empty_blocks(cand.join(
            hits, join_type="left_anti", num_partitions=num_partitions,
            on=("doc_id",)))

    def add_fp(batch: pa.Table) -> pa.Table:
        nb = normalize_batch(batch)  # (doc_id, norm_fp, n_chars_norm)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "source": batch.column("source"),
                         "norm_fp": nb.column("norm_fp")})

    winners = per_group_topk(
        clean.map_batches(add_fp, batch_format="pyarrow"),
        group_col="norm_fp", order_cols=["doc_id"],
        descending=[False], k=1)

    def mix_and_split(batch: pa.Table) -> pa.Table:
        hexes = _id_hexes(batch)
        out = pa.table({"doc_id": batch.column("doc_id"),
                        "source": batch.column("source"),
                        "split": _split_of(hexes)})
        return out.filter(_mix_keep(hexes, batch.column("source")))

    return winners.map_batches(mix_and_split, batch_format="pyarrow")


def incremental_dedup_docs(sf_dir: str, num_partitions: int = 4) -> Dataset:
    """Incremental-ingest dedup: which rows of a NEW shard (odd
    doc_ids stand in for it) survive against the EXISTING corpus (even
    doc_ids)? A new doc is dropped iff its normalized fingerprint
    already exists in the corpus. Unlike the benchmark-decontamination
    hit list, the existing-fp side is CORPUS-scale — never
    broadcastable at 100 TB — so this is a distributed LEFT ANTI hash
    join on the fingerprint, with the existing side pre-deduped per
    batch so the shuffle ships distinct fps, not one row per document
    (the ``customers_without_orders`` shape over content hashes). The
    docops complement of the KG pipeline's incremental shard append."""
    from ..functions.text import normalize_batch
    from ..traverse import drop_empty_blocks

    docs = _docs(sf_dir, ["doc_id", "text"])

    def new_fps(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nb = normalize_batch(batch.filter(pa.array(ids % 2 == 1)))
        return nb.select(["doc_id", "norm_fp"])

    def old_fps(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nb = normalize_batch(batch.filter(pa.array(ids % 2 == 0)))
        fps = nb.column("norm_fp").to_pandas()
        return pa.table({"old_fp": pa.array(pd.unique(fps.dropna()),
                                            type=pa.string())})

    new = drop_empty_blocks(
        docs.map_batches(new_fps, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("norm_fp", pa.string())]))
    old = drop_empty_blocks(
        docs.map_batches(old_fps, batch_format="pyarrow"),
        pa.schema([("old_fp", pa.string())]))
    surv = new.join(old, join_type="left_anti",
                    num_partitions=num_partitions,
                    on=("norm_fp",), right_on=("old_fp",))
    return drop_empty_blocks(
        surv.select_columns(["doc_id"]),
        pa.schema([("doc_id", pa.int64())]))


def doc_quality_percentile_filter(sf_dir: str, num: int = 1,
                                  den: int = 10) -> Dataset:
    """Global-percentile quality gate (two-pass broadcast-threshold
    pattern): pass 1 materializes the per-doc integer stats table
    (~1% of corpus volume) and computes the EXACT global num/den
    token-count quantile via the two-phase value histogram
    (functions/quantiles.py — shuffle volume O(distinct values), not
    rows); pass 2 is a streaming filter of the stats table against the
    broadcast scalar. Matches DuckDB ``quantile_disc`` (same ceil-rank
    definition the events_value_quantiles oracle pins)."""
    from ..functions.quantiles import grouped_exact_quantiles

    stats = text.token_stats(_docs(sf_dir, ["doc_id", "text"])).materialize()
    keyed = stats.map_batches(
        lambda t: t.append_column(
            "g", pa.array(np.zeros(t.num_rows, dtype=np.int32))),
        batch_format="pyarrow")
    thr = int(grouped_exact_quantiles(
        keyed, "g", "n_tokens", [(num, den, "p")])["p"].iloc[0])
    def gate(t: pa.Table) -> pa.Table:
        # filter + project in one kernel (traverse.filter_select note:
        # fused Filter->Project leaves empty filter results unprojected)
        import pyarrow.compute as pc

        return (t.filter(pc.greater_equal(t.column("n_tokens"), thr))
                .select(["doc_id", "n_tokens"]))

    return stats.map_batches(gate, batch_format="pyarrow")


def doc_chunk_dedup(sf_dir: str) -> Dataset:
    """C4-style sub-document dedup: drop every 3-word chunk whose exact
    text occurs in >= 4 distinct docs (boilerplate removal), reassemble
    the survivors in order (functions/chunkdedup.py — one df shuffle +
    one sort exchange, hot set broadcast with a join fallback)."""
    from ..functions.chunkdedup import chunk_dedup

    return chunk_dedup(_docs(sf_dir, ["doc_id", "text"]),
                       width=3, min_df=4)


def incremental_dedup_bloom(sf_dir: str, num_partitions: int = 4) -> Dataset:
    """``incremental_dedup_docs`` with a Bloom membership pre-filter
    (functions/bloom.py): the corpus fingerprints build one mergeable
    bitmap; new-shard rows that MISS the bloom are guaranteed novel and
    skip the shuffle entirely; only bloom-HIT rows (real dups + false
    positives) reach the exact LEFT ANTI verification, so the join's
    left side shrinks from |shard| to ~|dups|. Same output — and the
    same SQL oracle — as the plain variant: false positives cost only
    verify work, never correctness."""
    import ray

    from ..functions.bloom import bloom_build, bloom_contains
    from ..functions.text import normalize_batch
    from ..traverse import drop_empty_blocks

    docs = _docs(sf_dir, ["doc_id", "text"])

    def new_fps(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nb = normalize_batch(batch.filter(pa.array(ids % 2 == 1)))
        return nb.select(["doc_id", "norm_fp"])

    def old_fps(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nb = normalize_batch(batch.filter(pa.array(ids % 2 == 0)))
        fps = nb.column("norm_fp").to_pandas()
        return pa.table({"old_fp": pa.array(pd.unique(fps.dropna()),
                                            type=pa.string())})

    old = drop_empty_blocks(
        docs.map_batches(old_fps, batch_format="pyarrow"),
        pa.schema([("old_fp", pa.string())]))
    bm_ref = ray.put(bloom_build(old, "old_fp"))

    new = drop_empty_blocks(
        docs.map_batches(new_fps, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("norm_fp", pa.string())]))

    def split_miss(t: pa.Table) -> pa.Table:
        hit = bloom_contains(ray.get(bm_ref), t.column("norm_fp"))
        return t.filter(pa.array(~hit)).select(["doc_id"])

    def split_hit(t: pa.Table) -> pa.Table:
        hit = bloom_contains(ray.get(bm_ref), t.column("norm_fp"))
        return t.filter(pa.array(hit))

    definite_new = drop_empty_blocks(
        new.map_batches(split_miss, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64())]))
    candidates = drop_empty_blocks(
        new.map_batches(split_hit, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("norm_fp", pa.string())]))
    n_cand = candidates.count()  # free: the laundering materialized it
    if n_cand == 0:
        # Ray's hash join crashes on a fully-empty left side (a
        # received-nothing partition finalizes as a schema-less table);
        # zero candidates also simply MEANS nothing needs verifying
        return definite_new
    # few candidates across many partitions leave some partitions with
    # an empty (schema-less) left side — shrink the partition count so
    # every partition sees left rows
    parts = min(num_partitions, max(1, n_cand // 1000 + 1))
    verified = drop_empty_blocks(
        candidates.join(old, join_type="left_anti",
                        num_partitions=parts,
                        on=("norm_fp",), right_on=("old_fp",))
        .select_columns(["doc_id"]),
        pa.schema([("doc_id", pa.int64())]))
    return definite_new.union(verified)
