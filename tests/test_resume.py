"""Resume + shuffle-correctness (SURVEY.md §5.4/§5.5): a killed run
resumed from checkpoints must produce byte-identical outputs, and the
triple set must be invariant to partitioning/batch size."""

import pandas as pd

from datacapsule_ray.fixtures import write_corpus
from datacapsule_ray.pipelines.build_graph import KGPipeline


def _triples_sorted(pipe: KGPipeline) -> pd.DataFrame:
    df = pipe.triples().to_pandas()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_resume_after_partial_run(tmp_path):
    files = write_corpus(str(tmp_path / "c"), 60, seed=3, docs_per_file=15)

    # uninterrupted reference run
    full = KGPipeline(str(tmp_path / "ck_full"))
    full.run_all(files, files_per_partition=1, with_vectors=False)

    # "killed" run: only the first two partitions complete
    part = KGPipeline(str(tmp_path / "ck_part"))
    part.run_extraction(files[:2], files_per_partition=1)
    assert part.store.pending_partitions("emissions", [0, 1, 2, 3]) == [2, 3]

    # resume: pending partitions only are reprocessed, then shuffles run
    lineage_before = {r["partition_id"]: r["content_hash"]
                      for r in part.store.lineage("emissions")}
    part.run_all(files, files_per_partition=1, with_vectors=False)
    lineage_after = {r["partition_id"]: r["content_hash"]
                     for r in part.store.lineage("emissions")}
    for pid, h in lineage_before.items():
        assert lineage_after[pid] == h  # completed partitions untouched

    pd.testing.assert_frame_equal(_triples_sorted(part), _triples_sorted(full))
    for stage in ("edges", "nodes"):
        a = part.store.read_stage(stage).to_pandas()
        b = full.store.read_stage(stage).to_pandas()
        a = a.sort_values(list(a.columns), kind="stable").reset_index(drop=True)
        b = b.sort_values(list(b.columns), kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_partitioned_shuffle_resume(tmp_path):
    """Hash-range-partitioned shuffle stages: identical results to the
    single-pass path, and a killed run resumes skipping completed
    ranges."""
    files = write_corpus(str(tmp_path / "c"), 60, seed=3, docs_per_file=15)

    single = KGPipeline(str(tmp_path / "ck_single"))
    single.run_extraction(files, 1)
    s_out = single.run_graph()

    part = KGPipeline(str(tmp_path / "ck_part"))
    part.run_extraction(files, 1)
    # simulate a crash: only range 0 of 4 completes (a real run stamps
    # the partitioning scheme before writing any range)
    from datacapsule_ray.stages import graph as g

    part.store.set_stage_scheme("edges", "range:4")
    part.store.write_partition(
        "edges", 0,
        g.dedup_edges(g.split_emissions(part.emissions())[0], key_filter=(0, 4)),
        ["edges:emissions:range=0/4"])
    assert part.store.pending_partitions("edges", [0, 1, 2, 3]) == [1, 2, 3]
    h0 = part.store.lineage("edges")[0]["content_hash"]

    p_out = part.run_graph(shuffle_partitions=4)
    assert part.store.lineage("edges")[0]["content_hash"] == h0  # untouched

    for key, cols in (("edges", ["src", "rel", "dst", "n_dups"]),
                      ("nodes", ["node_id", "node_type"])):
        a = s_out[key].to_pandas()[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        b = p_out[key].to_pandas()[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_partitioning_invariance(tmp_path):
    """Same triple set at different partition grouping and batch size
    (shuffle correctness across the salted two-phase aggregates)."""
    files = write_corpus(str(tmp_path / "c"), 60, seed=3, docs_per_file=10)

    a = KGPipeline(str(tmp_path / "ck_a"), batch_size=7)
    a.run_extraction(files, files_per_partition=1)   # 6 partitions
    b = KGPipeline(str(tmp_path / "ck_b"), batch_size=512)
    b.run_extraction(files, files_per_partition=3)   # 2 partitions

    ta, tb = _triples_sorted(a), _triples_sorted(b)
    pd.testing.assert_frame_equal(ta, tb)

    ea = a.run_graph()["edges"].to_pandas().sort_values(
        ["src", "rel", "dst"], kind="stable").reset_index(drop=True)
    eb = b.run_graph()["edges"].to_pandas().sort_values(
        ["src", "rel", "dst"], kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(ea, eb)

    na = a.run_graph()["nodes"].to_pandas().sort_values("node_id").reset_index(drop=True)
    nb = b.run_graph()["nodes"].to_pandas().sort_values("node_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(na, nb)


def test_append_shards_rebuilds_downstream(tmp_path):
    """Appending corpus shards to a FINISHED build must re-extract only
    the new partitions (old lineage untouched) and rebuild every
    derived stage — without the invalidation, the committed shuffle
    stages would silently exclude the appended documents."""
    d = str(tmp_path / "corpus")
    files_all = write_corpus(d, 120, seed=9, docs_per_file=40)  # 3 shards
    ck = str(tmp_path / "ck")

    pipe = KGPipeline(ck)
    pipe.run_all(files_all[:2], files_per_partition=1, with_vectors=False)
    n_triples_before = pipe.triples().count()
    hashes_before = {r["partition_id"]: r["content_hash"]
                     for r in pipe.store.lineage("records")}

    pipe2 = KGPipeline(ck)
    out = pipe2.run_all(files_all, files_per_partition=1, with_vectors=False)
    hashes_after = {r["partition_id"]: r["content_hash"]
                    for r in pipe2.store.lineage("records")}
    # old partitions were NOT re-extracted, the new one was added
    assert hashes_after[0] == hashes_before[0]
    assert hashes_after[1] == hashes_before[1]
    assert set(hashes_after) == {0, 1, 2}
    # downstream rebuilt over the full corpus: species covers 120 docs
    # and the triple count strictly grew
    assert out["species"].count() == 120
    assert pipe2.triples().count() > n_triples_before
    # the full-corpus result equals a from-scratch build
    ck2 = str(tmp_path / "ck_fresh")
    fresh = KGPipeline(ck2).run_all(files_all, files_per_partition=1,
                                    with_vectors=False)
    assert fresh["edges"].count() == out["edges"].count()
    assert fresh["nodes"].count() == out["nodes"].count()


def test_append_grows_last_partition(tmp_path):
    """Append where the prior file count is NOT a multiple of
    files_per_partition: the last partition's file list GROWS, so an
    existence-only pending check would silently skip the new files —
    the fragment-list comparison must re-extract that partition."""
    d = str(tmp_path / "corpus")
    files_all = write_corpus(d, 120, seed=12, docs_per_file=30)  # 4 shards
    ck = str(tmp_path / "ck")

    pipe = KGPipeline(ck)
    # 3 shards at fpp=2 → partitions [s0,s1], [s2] (s2 alone in part 1)
    pipe.run_all(files_all[:3], files_per_partition=2, with_vectors=False)
    h_before = {r["partition_id"]: r["content_hash"]
                for r in pipe.store.lineage("records")}

    # append shard 4 → partition 1 becomes [s2, s3]: must re-extract
    pipe2 = KGPipeline(ck)
    out = pipe2.run_all(files_all, files_per_partition=2, with_vectors=False)
    h_after = {r["partition_id"]: r["content_hash"]
               for r in pipe2.store.lineage("records")}
    assert h_after[0] == h_before[0]          # untouched
    assert h_after[1] != h_before[1]          # grew → re-extracted
    assert out["species"].count() == 120      # nothing silently dropped


def test_scheme_change_wipes_stale_partitions(tmp_path):
    """Resuming an UNCOMMITTED shuffle stage under a different
    partitioning scheme must rebuild from scratch: a part written as
    hash-range slice 0/4 is neither slice 0/2 nor the single-part
    layout — keeping it would duplicate its keys (read_stage serves it
    alongside the new parts) or drop the rest of its range."""
    files = write_corpus(str(tmp_path / "c"), 60, seed=3, docs_per_file=15)
    from datacapsule_ray.stages import graph as g

    expected = KGPipeline(str(tmp_path / "ck_ref"))
    expected.run_extraction(files, 1)
    e_edges = expected.run_graph()["edges"].to_pandas()

    def crashed_pipe(name: str, scheme: str, key_filter):
        p = KGPipeline(str(tmp_path / name))
        p.run_extraction(files, 1)
        p.store.set_stage_scheme("edges", scheme)
        p.store.write_partition(
            "edges", 0,
            g.dedup_edges(g.split_emissions(p.emissions())[0],
                          key_filter=key_filter),
            [f"edges:emissions:{scheme}:0"])
        return p

    # crashed range:4 run resumed as single-part
    a = crashed_pipe("ck_a", "range:4", (0, 4))
    a_edges = a.run_graph(shuffle_partitions=1)["edges"].to_pandas()
    assert len(a_edges) == len(e_edges)
    assert a.store.stage_scheme("edges") == "single"

    # crashed single run resumed as range:2 — part 0 held the FULL key
    # set; without the wipe it would be kept as "slice 0/2" and every
    # key in slice 1/2 would be served twice
    b = crashed_pipe("ck_b", "single", None)
    b_edges = b.run_graph(shuffle_partitions=2)["edges"].to_pandas()
    assert len(b_edges) == len(e_edges)

    # crashed range:4 resumed as range:2 — slice 0/4 is not slice 0/2;
    # without the wipe half of slice 0/2's keys would be missing
    c = crashed_pipe("ck_c", "range:4", (0, 4))
    c_edges = c.run_graph(shuffle_partitions=2)["edges"].to_pandas()
    assert len(c_edges) == len(e_edges)


def test_shrink_inputs_drops_orphan_partitions(tmp_path):
    """Re-running over FEWER input files: committed partitions beyond
    the new map are orphans — without pruning, read_stage serves their
    documents alongside the new layout (duplicates), and a pure
    tail-shrink (pending empty) would leave derived stages stale."""
    d = str(tmp_path / "corpus")
    files_all = write_corpus(d, 120, seed=9, docs_per_file=40)  # 3 shards
    ck = str(tmp_path / "ck")

    pipe = KGPipeline(ck)
    pipe.run_all(files_all, files_per_partition=1, with_vectors=False)

    # tail-shrink: drop the last shard; partitions 0/1 fragments are
    # unchanged, so `pending` is empty — only the orphan check fires
    pipe2 = KGPipeline(ck)
    out = pipe2.run_all(files_all[:2], files_per_partition=1,
                        with_vectors=False)
    assert out["species"].count() == 80          # no duplicate/stale docs
    assert {r["partition_id"] for r in pipe2.store.lineage("records")} == {0, 1}

    # result equals a from-scratch build over the shrunk input
    fresh = KGPipeline(str(tmp_path / "ck_fresh")).run_all(
        files_all[:2], files_per_partition=1, with_vectors=False)
    for stage in ("edges", "nodes"):
        assert out[stage].count() == fresh[stage].count()


def test_empty_external_partition_commits(tmp_path):
    """A fused-stage partition whose tasks produced zero rows side-writes
    nothing — not even the tmp dir. Finalizing it must still commit an
    empty partition (sparse input) instead of crashing."""
    from datacapsule_ray.state.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path))
    tmp = store.partition_dir("records", 0) + ".tmp"   # never created
    row = store.finalize_external_partition("records", 0, tmp, ["f0"])
    assert row.rows_out == 0
    assert store.partition_done("records", 0)
    assert store.pending_partitions("records", [0]) == []


def test_crash_leftover_tmp_dirs_are_never_read(tmp_path):
    """A part-*.tmp dir from an interrupted write must be invisible to
    stage_files/lineage — reading it would serve partial rows, and
    lineage-ing it would re-commit stale data as fresh."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datacapsule_ray.state.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path))
    import ray.data as rd

    store.write_partition("s", 0, rd.from_items([{"x": 1}]), ["f"])
    tmp = store.partition_dir("s", 1) + ".tmp"
    os.makedirs(tmp)
    pq.write_table(pa.table({"x": [99]}), os.path.join(tmp, "junk.parquet"))
    with open(os.path.join(tmp, "_lineage.json"), "w") as f:
        f.write('{"stage": "s", "partition_id": 1}')
    assert all(".tmp" not in p for p in store.stage_files("s"))
    assert [r["partition_id"] for r in store.lineage("s")] == [0]
    assert store.read_stage("s").to_pandas()["x"].tolist() == [1]
