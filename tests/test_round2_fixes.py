"""Round-2 hardening: per-query IVF probe semantics, LSH hot-bucket
drop accounting, connected-components non-convergence warning, stable
doc_num for non-numeric doc ids, and crash-window resume between the
emissions and records partition commits."""

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# --- IVF: per-query probe masking -------------------------------------------

def test_ivf_multi_query_probe_isolation():
    """A vector in a cell probed by query A but NOT by query B must never
    appear in B's results, even when B's own probed cell has fewer than k
    vectors (the old union-of-cells scan leaked exactly here)."""
    from datacapsule_ray.functions.similarity import ivf_topk_cosine

    rng = np.random.default_rng(5)
    dim = 8
    c1 = np.zeros(dim); c1[0] = 1.0
    c2 = np.zeros(dim); c2[1] = 1.0
    big = c1 + rng.normal(0, 0.01, size=(40, dim))     # cluster 1: 40 vecs
    small = c2 + rng.normal(0, 0.01, size=(3, dim))    # cluster 2: 3 vecs
    mat = np.vstack([big, small]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), type=pa.float32()), dim),
    })
    ds = rd.from_arrow(tbl)
    queries = np.stack([c1, c2])
    df = ivf_topk_cosine(ds, queries, k=5, n_cells=2, nprobe=1, seed=11)
    got_b = df[df["query_id"] == 1]
    # query B probes only the small cluster's cell: exactly its 3 vectors
    assert set(got_b["vec_id"]) == {40, 41, 42}
    got_a = df[df["query_id"] == 0]
    assert len(got_a) == 5 and set(got_a["vec_id"]) <= set(range(40))


# --- LSH: hot-bucket truncation is surfaced ---------------------------------

def test_minhash_hot_bucket_drop_count(caplog):
    from datacapsule_ray.functions.dedup import minhash_lsh_pairs

    texts = ["the same exact document body repeated verbatim many times"] * 30
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(30, dtype=np.int64), "text": texts}))
    stats: dict = {}
    with caplog.at_level(logging.WARNING, "datacapsule_ray.functions.dedup"):
        pairs = minhash_lsh_pairs(ds, max_bucket=10, stats=stats).to_pandas()
    assert stats["dropped_rows"] > 0
    assert any("truncated" in r.message for r in caplog.records)
    # surviving pairs only among the first max_bucket ids per bucket
    assert pairs["id_b"].max() <= 9


def test_minhash_no_drop_stats_zero():
    from datacapsule_ray.functions.dedup import minhash_lsh_pairs

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [f"totally different document number {i} "
                 f"with unique words {i*7} {i*13}" for i in range(6)]}))
    stats: dict = {}
    minhash_lsh_pairs(ds, max_bucket=10, stats=stats).to_pandas()
    assert stats["dropped_rows"] == 0


# --- connected components: non-convergence warning --------------------------

def _chain(n):
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": np.arange(n - 1, dtype=np.int64),
        "id_b": np.arange(1, n, dtype=np.int64),
        "est_jaccard": np.ones(n - 1)}))
    ids = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)}))
    return pairs, ids


def test_cc_nonconvergence_warns(caplog):
    from datacapsule_ray.functions.dedup import connected_components

    pairs, ids = _chain(30)
    with caplog.at_level(logging.WARNING, "datacapsule_ray.functions.dedup"):
        out = connected_components(pairs, ids, max_rounds=2).to_pandas()
    assert any("converge" in r.message for r in caplog.records)
    assert out["comp"].nunique() > 1  # genuinely split — the warning is real


def test_cc_converged_no_warning(caplog):
    from datacapsule_ray.functions.dedup import connected_components

    pairs, ids = _chain(5)
    with caplog.at_level(logging.WARNING, "datacapsule_ray.functions.dedup"):
        out = connected_components(pairs, ids, max_rounds=10).to_pandas()
    assert not any("converge" in r.message for r in caplog.records)
    assert out["comp"].nunique() == 1


def test_cc_distributed_nonconvergence_warns(caplog):
    from datacapsule_ray.functions.dedup import connected_components_distributed

    pairs, ids = _chain(30)
    with caplog.at_level(logging.WARNING, "datacapsule_ray.functions.dedup"):
        connected_components_distributed(pairs, ids, max_rounds=2)
    assert any("propagating" in r.message for r in caplog.records)


# --- stable doc_num for non-numeric doc ids ---------------------------------

def test_doc_num_stable_hash_for_nonnumeric_ids():
    from datacapsule_ray.stages.extract import parse_documents_batch

    spans_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    batch = pa.table({
        "doc_id": pa.array(["alpha", "doc-xyz", "doc-12"]),
        "spans": pa.array([
            [{"kind": "text", "text": "中文学名：A", "media_ref": "", "offset": 0}],
            [{"kind": "text", "text": "中文学名：B", "media_ref": "", "offset": 0}],
            [{"kind": "text", "text": "中文学名：C", "media_ref": "", "offset": 0}],
        ], type=spans_type),
    })
    rec = parse_documents_batch(batch)
    nums = rec.column("doc_num").to_pylist()
    expect = [
        int.from_bytes(hashlib.sha1(b"alpha").digest()[:5], "big"),
        int.from_bytes(hashlib.sha1(b"doc-xyz").digest()[:5], "big"),
        12,
    ]
    assert nums == expect
    assert all(0 <= v < (1 << 40) for v in nums)  # fits the 15-digit rank


# --- crash between emissions and records commits ----------------------------

def test_resume_rebuilds_missing_records_partition(tmp_path):
    """emissions/part committed but records/part lost (the crash window
    between the two commits): the partition must be pending again and the
    records checkpoint rebuilt on resume — otherwise the star schema
    silently loses those documents."""
    import shutil

    from datacapsule_ray.fixtures import write_corpus
    from datacapsule_ray.pipelines.build_graph import KGPipeline

    files = write_corpus(str(tmp_path / "c"), 40, seed=9, docs_per_file=10)
    pipe = KGPipeline(str(tmp_path / "ck"))
    pipe.run_extraction(files, files_per_partition=1)
    n_records = sum(r["rows_out"] for r in pipe.store.lineage("records"))

    # simulate the crash window for partition 1
    shutil.rmtree(pipe.store.partition_dir("records", 1))
    import os
    os.remove(pipe.store._stage_manifest("records"))
    os.remove(pipe.store._stage_manifest("emissions"))

    pipe2 = KGPipeline(str(tmp_path / "ck"))
    pipe2.run_extraction(files, files_per_partition=1)
    assert pipe2.store.partition_done("records", 1)
    assert sum(r["rows_out"] for r in pipe2.store.lineage("records")) == n_records
    assert pipe2.store.stage_done("records") and pipe2.store.stage_done("emissions")


# --- int64 id precision through the mixed pair/raw channel ------------------

def test_minhash_pairs_preserve_large_int64_ids():
    """ids above 2^53 must survive the pair pipeline exactly (the mixed
    pair/raw pandas channel used to promote them to float64, rounding
    the low bits away)."""
    from datacapsule_ray.functions.dedup import minhash_lsh_pairs

    base = (1 << 62) + 12345  # far beyond float64's 53-bit mantissa
    ids = np.array([base + i for i in range(6)], dtype=np.int64)
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": ids,
        "text": [text] * 3 + [f"unique text {i} {i*3} {i*7} x y z w v u t"
                              for i in range(3)]}))
    pairs = minhash_lsh_pairs(ds, threshold=0.9).to_pandas()
    got = set(pairs["id_a"]) | set(pairs["id_b"])
    assert got == {int(ids[0]), int(ids[1]), int(ids[2])}
    assert all(isinstance(v, (int, np.integer)) for v in got)


def test_dedup_minhash_components_pipeline():
    """Full dedup: pairs → components → keep/drop, mapped back to the
    original ids via distributed joins."""
    from datacapsule_ray.pipelines.docops import dedup_minhash_components

    from tests.conftest import SF_DIR

    out = dedup_minhash_components(SF_DIR).to_pandas()
    assert len(out) > 0  # the corpus plants near-dups; empty = broken
    # every listed doc has a keeper different from itself, and keepers
    # are never themselves listed as drops (min-label consistency)
    assert (out["doc_id"] != out["keep_id"]).all()
    assert not set(out["keep_id"]) & set(out["doc_id"])
