"""Regression tests for the round-3 review findings: the sorted
combine's empty-block schema, the compaction-lock keepalive, the
chunked top-p assignment kernel, the user_event_paths id-type fixup,
and the shared-projection k-means fit."""

import threading
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _empty_slice_for(triples_tbl, n_slices: int) -> int:
    """A hash-range slice index that matches NONE of the table's keys
    (exists for any small table once n_slices >> distinct keys)."""
    from datacapsule_ray.stages.graph import _local_edge_dedup

    for i in range(n_slices):
        if _local_edge_dedup(triples_tbl, (i, n_slices)).num_rows == 0:
            return i
    raise AssertionError("no empty slice found — enlarge n_slices")


def test_combine_sorted_empty_blocks_emit_string_key():
    """An all-empty hash-range slice must flow through the sorted
    combine and unpack without a null-type schema clash: the empty
    pandas frame's object columns decay to Arrow null type unless the
    combine pins them back to string (pc.split_pattern on a null column
    raises ArrowNotImplementedError)."""
    from datacapsule_ray.stages import graph

    t = pa.table({
        "subj": ["a", "b", "a"] * 20,
        "pred": ["r", "r", "r"] * 20,
        "obj": ["x", "y", "x"] * 20,
    })
    i = _empty_slice_for(t, 64)
    out = graph.dedup_edges(rd.from_arrow(t), key_filter=(i, 64))
    assert len(out.to_pandas()) == 0
    # 2 distinct keys range-partitioned into 8 sort blocks → most blocks
    # empty, some not: before the fix the null-typed empty blocks
    # schema-clash with the string-typed ones (ArrowInvalid on concat)
    ds = rd.from_arrow(t).repartition(8)
    got = graph.dedup_edges(ds).to_pandas().sort_values("src")
    assert got["src"].tolist() == ["a", "b"]
    assert got["n_dups"].tolist() == [40, 20]
    # and a slice that DOES hold keys still reduces correctly
    total = sum(
        graph.dedup_edges(rd.from_arrow(t), key_filter=(j, 4)).count()
        for j in range(4))
    assert total == 2


def test_compact_keepalive_prevents_lock_steal(tmp_path):
    """A compact() running longer than _LOCK_STALE_S must keep its lock
    fresh (mtime heartbeat) so a waiting writer never declares it
    crashed and steals the lock mid-fold."""
    from datacapsule_ray.state.interactions import InteractionStore

    store = InteractionStore(str(tmp_path / "store"))
    store.append([{"id": "a"}])
    store.append([{"id": "b"}])

    store._LOCK_STALE_S = 0.3  # instance override: 0.1s heartbeat
    real_scan = store.scan

    def slow_scan(*a, **kw):
        time.sleep(1.0)  # 3x past staleness — heartbeat must cover it
        return real_scan(*a, **kw)

    store.scan = slow_scan
    err: list[BaseException] = []

    def run():
        try:
            store.compact(grace_s=0.0)
        except BaseException as e:  # surfaced below
            err.append(e)

    th = threading.Thread(target=run)
    th.start()
    try:
        deadline = time.monotonic() + 2.0
        while not store._lock_held() and time.monotonic() < deadline:
            time.sleep(0.01)
        assert store._lock_held()
        time.sleep(0.5)  # well past the (patched) staleness window
        waiter = InteractionStore(store.root)
        waiter._LOCK_STALE_S = 0.3
        # the lock must still be held AND look fresh: the waiter times
        # out instead of rmdir-ing it (pre-fix it stole the lock here)
        with pytest.raises(TimeoutError):
            waiter._wait_lock_clear(timeout=0.2)
        assert store._lock_held()
    finally:
        th.join(timeout=30)
    assert not err, err
    assert not store._lock_held()
    got = store.scan().to_pandas().sort_values("id")
    assert got["id"].tolist() == ["a", "b"]


def test_assign_topp_chunked_matches_bruteforce(monkeypatch):
    from datacapsule_ray.functions import clustering

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(57, 16))
    cents = rng.normal(size=(9, 16))
    want = np.argsort(((mat[:, None, :] - cents[None, :, :]) ** 2).sum(2),
                      axis=1)[:, :3]
    # force many chunks through the tiny-cap path
    monkeypatch.setattr(clustering, "_DIST_TEMP_BYTES", 4096)
    got = clustering.assign_topp_chunked(mat, cents, 3)
    assert got.shape == (57, 3)
    for g, w in zip(got, want):
        assert set(g) == set(w)  # unordered set contract
    # p > k clamps to k
    got_all = clustering.assign_topp_chunked(mat, cents, 99)
    assert got_all.shape == (57, 9)
    assert all(set(r) == set(range(9)) for r in got_all)


def test_kmeans_fit_shared_projection_matches_default():
    """materialize=False on a pre-materialized projection must be
    bit-identical to the default path (it only skips the internal
    copy)."""
    from datacapsule_ray.functions import clustering

    rng = np.random.default_rng(5)
    emb = rng.normal(size=(200, 8))
    t = pa.table({
        "vec_id": pa.array(np.arange(200, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel(), type=pa.float32()), 8),
    })
    ds = rd.from_arrow(t)
    a = clustering.kmeans_fit(ds, 4, iters=3)
    proj = ds.select_columns(["vec_id", "embedding"]).materialize()
    b = clustering.kmeans_fit(proj, 4, iters=3, materialize=False)
    np.testing.assert_array_equal(a["centroids"], b["centroids"])
    np.testing.assert_array_equal(a["counts"], b["counts"])
    assert a["inertia"] == b["inertia"]


def test_user_event_paths_string_user_ids(tmp_path):
    """The boundary-fixup channel must carry the INPUT's user_id type
    (block_partial derives its schema from the data; a hardcoded int64
    fixed table would fail outright on string ids)."""
    from datacapsule_ray.pipelines.relational import user_event_paths

    rng = np.random.default_rng(3)
    n = 600
    uid = np.repeat([f"u{i:03d}" for i in range(12)], 50)
    base = pd.Timestamp("2024-01-01")
    ts = base + pd.to_timedelta(np.cumsum(rng.integers(1, 900, n)), unit="s")
    ev = pd.DataFrame({
        "user_id": uid, "ts": ts,
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["view", "click", "buy"], size=n),
    }).sample(frac=1.0, random_state=9).reset_index(drop=True)
    ed = tmp_path / "events.parquet"
    ed.mkdir()
    for i, chunk in enumerate(np.array_split(ev, 6)):
        chunk.to_parquet(ed / f"part-{i}.parquet", index=False)

    out = (user_event_paths(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ref = (ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
           .groupby("user_id").head(10)
           .groupby("user_id")["event_type"]
           .agg(lambda s: "->".join(s)).reset_index(name="path")
           .sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["path"].tolist() == ref["path"].tolist()
