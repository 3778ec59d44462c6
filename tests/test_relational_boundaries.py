"""Block-boundary correctness for the sorted-run relational operators.

``user_sessions`` and ``top3_orders_per_customer`` reduce sorted runs
per block and fix up the ≤2 boundary runs driver-side; these tests force
MANY blocks (events/orders written as a directory of small parquet
shards, keys interleaved across shards so sorted runs straddle block
boundaries) and compare against a pandas oracle. Also covers the
nonzero-result path of the distributed anti-join."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("relshards")

    # events: 40 users × 50 events, timestamps with >30min gaps; rows
    # interleaved across 8 shards so each user's run straddles blocks
    n = 2000
    uid = np.repeat(np.arange(40), 50)
    base = pd.Timestamp("2024-01-01")
    offs = np.cumsum(rng.integers(60, 4000, size=n))  # seconds, many >1800 gaps
    ts = base + pd.to_timedelta(offs - offs[0], unit="s")
    ev = pd.DataFrame({"user_id": uid, "ts": ts,
                       "event_id": np.arange(n, dtype=np.int64)})
    ev = ev.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ed = root / "events.parquet"
    ed.mkdir()
    for i, chunk in enumerate(np.array_split(ev, 8)):
        chunk.to_parquet(ed / f"part-{i}.parquet", index=False)

    # orders: 60 customers × ~30 orders (runs straddle), 10 customers
    # with no orders at all (anti-join nonzero path)
    m = 1800
    ck = rng.integers(0, 60, size=m).astype(np.int64)
    od = pd.DataFrame({
        "o_custkey": ck,
        "o_orderkey": np.arange(m, dtype=np.int64),
        "o_totalprice": rng.uniform(10, 90000, size=m).round(2),
    })
    odir = root / "orders.parquet"
    odir.mkdir()
    for i, chunk in enumerate(np.array_split(od, 8)):
        chunk.to_parquet(odir / f"part-{i}.parquet", index=False)

    cust = pd.DataFrame({
        "c_custkey": np.arange(70, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(70)],
    })
    cust.to_parquet(root / "customer.parquet", index=False)
    return str(root), ev, od, cust


def test_user_sessions_many_blocks(shard_dir):
    from datacapsule_ray.pipelines.relational import user_sessions

    root, ev, _, _ = shard_dir
    got = user_sessions(root).to_pandas().sort_values(
        "user_id").reset_index(drop=True)

    def oracle(g):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        gaps = g["ts"].diff().dt.total_seconds() > 1800
        return pd.Series({"n_events": len(g), "n_sessions": 1 + int(gaps.sum())})

    want = (ev.groupby("user_id").apply(oracle, include_groups=False)
            .reset_index().astype({"n_events": "int64", "n_sessions": "int64"}))
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64", "n_sessions": "int64"}), want)


def test_top3_many_blocks(shard_dir):
    from datacapsule_ray.pipelines.relational import top3_orders_per_customer

    root, _, od, _ = shard_dir
    got = top3_orders_per_customer(root).to_pandas().sort_values(
        ["o_custkey", "price_c", "o_orderkey"],
        ascending=[True, False, True]).reset_index(drop=True)
    odc = od.assign(price_c=(od["o_totalprice"] * 100).round().astype(np.int64))
    want = (odc.sort_values(["o_custkey", "price_c", "o_orderkey"],
                            ascending=[True, False, True], kind="stable")
            .groupby("o_custkey", group_keys=False).head(3)
            [["o_custkey", "o_orderkey", "price_c"]].reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_anti_join_nonzero(shard_dir):
    from datacapsule_ray.pipelines.relational import customers_without_orders

    root, _, od, cust = shard_dir
    got = customers_without_orders(root).to_pandas()
    got = got.sort_values("c_custkey").reset_index(drop=True)
    want = cust[~cust["c_custkey"].isin(od["o_custkey"])].reset_index(drop=True)
    assert len(want) == 10
    pd.testing.assert_frame_equal(got, want)


def test_user_event_paths_multiblock_matches_pandas():
    """Force tiny sort blocks so user runs straddle block boundaries,
    then compare the ordered-collect against a driver-side reference."""
    from ray.data import DataContext

    from datacapsule_ray.pipelines.relational import user_event_paths
    from tests.conftest import SF_DIR

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024
    try:
        out = (user_event_paths(SF_DIR).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
    finally:
        ctx.target_max_block_size = old
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    ref = (ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
           .groupby("user_id").head(10)
           .groupby("user_id")["event_type"]
           .agg(lambda s: "->".join(s)).reset_index(name="path")
           .sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["path"].tolist() == ref["path"].tolist()
