"""Operator-coverage queries over the driver's TPC-H-ish parquet tables.

Each function takes ``sf_dir`` and returns a Dataset/DataFrame whose
rows exactly match the DuckDB oracle in ``__ray_entry__.oracle_sql``.
Money/quantity aggregates are computed in integer cents (ROUND(x*100) →
int64) so sums are order-independent and hash-identical to SQL — summing
doubles in different orders is not.

The ``kg_rel_*`` family re-expresses the engine's KG-construction
operators (flat-map triple emission M3-style, node dedup G1, degree G2)
over relational inputs, where a SQL oracle can check them end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum


def _t(sf_dir: str, name: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _cents(col: pa.ChunkedArray) -> pa.Array:
    # half_towards_infinity == SQL ROUND's half-away-from-zero (Arrow's
    # default half_to_even would diverge from DuckDB on exact .5 values)
    return pc.cast(
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64())


# --- classic relational -----------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> Dataset:
    """Grouped aggregate with filter pushdown (integer-cents sums)."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"),
                                   pa.scalar(pd.Timestamp("1998-09-02"))))
        disc = pc.multiply(t.column("l_extendedprice"),
                           pc.subtract(1.0, t.column("l_discount")))
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty_c": _cents(t.column("l_quantity")),
            "price_c": _cents(t.column("l_extendedprice")),
            "disc_price_c": _cents(disc),
        })

    return ds.map_batches(prep, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c", alias_name="sum_qty_cents"),
        Sum("price_c", alias_name="sum_price_cents"),
        Sum("disc_price_c", alias_name="sum_disc_price_cents"),
        Count(alias_name="n_rows"),
    )


def revenue_by_nation(sf_dir: str, num_partitions: int = 8) -> Dataset:
    """lineitem ⋈ orders ⋈ customer as distributed hash joins (the
    fact⋈fact edges never land on the driver), with only the genuinely
    dimension-sized nation table broadcast via ray.put.

    Shuffle hygiene for scale: lineitem rows pre-combine per l_orderkey
    inside each batch before the join (≈4× smaller shuffle), and the
    per-customer aggregate shrinks the second join's left side to
    |customers| rows that stay distributed."""
    import ray

    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_ref = ray.put(dict(zip(nation["n_nationkey"].astype(int),
                             nation["n_name"])))

    def li_prep(t: pa.Table) -> pa.Table:
        # local partial combine per l_orderkey, Arrow-native (no pandas
        # boxing on the headline join path — r4 verdict item 3)
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(1.0, t.column("l_discount")))
        g = (pa.table({"l_orderkey": t.column("l_orderkey"),
                       "rev_c": _cents(rev)})
             .group_by("l_orderkey")
             .aggregate([("rev_c", "sum"), ("rev_c", "count")]))
        return pa.table({
            "l_orderkey": g.column("l_orderkey"),
            "rev_c": g.column("rev_c_sum"),
            "n_items": pc.cast(g.column("rev_c_count"), pa.int64())})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        li_prep, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(orders, join_type="inner", num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def cust_combine(t: pa.Table) -> pa.Table:
        # local partial combine per o_custkey: the customer join below
        # hash-shuffles by the same key, so a GLOBAL pre-aggregate would
        # only add a redundant shuffle — sums are additive through the
        # join + final groupby
        g = (t.select(["o_custkey", "rev_c", "n_items"])
             .group_by("o_custkey")
             .aggregate([("rev_c", "sum"), ("n_items", "sum")]))
        return pa.table({
            "o_custkey": g.column("o_custkey"),
            "rev_c": g.column("rev_c_sum"),
            "n_items": g.column("n_items_sum")})

    spend = joined.map_batches(cust_combine, batch_format="pyarrow",
                               batch_size=65536)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    by_cust = spend.join(cust, join_type="inner", num_partitions=num_partitions,
                         on=("o_custkey",), right_on=("c_custkey",))

    class Annotate:
        def __init__(self) -> None:
            # broadcast dict → Arrow lookup arrays once per actor; the
            # per-batch lookup is then one index_in + take (vectorized)
            n = ray.get(n_ref)
            self.keys = pa.array(list(n.keys()), type=pa.int64())
            self.names = pa.array(list(n.values()), type=pa.string())

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column("c_nationkey").cast(pa.int64()),
                              value_set=self.keys)
            return pa.table({
                "n_name": pc.take(self.names, idx),
                "rev_c": t.column("rev_c"),
                "n_items": t.column("n_items"),
            })

    return by_cust.map_batches(Annotate, batch_format="pyarrow",
                               concurrency=(1, 4)).groupby("n_name").aggregate(
        Sum("rev_c", alias_name="revenue_cents"),
        Sum("n_items", alias_name="n_items"))


def top10_customers(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """Distributed aggregate → distributed hash join on customer →
    per-block partial top-10 → tiny global resolve (blocks × 10 rows is
    all the driver ever sees — the similarity.py:47 partial-top-k shape,
    safe at unbounded |customers|)."""
    spend = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table({"o_custkey": t.column("o_custkey"),
                            "spend_c": _cents(t.column("o_totalprice"))}),
        batch_format="pyarrow",
    ).groupby("o_custkey").aggregate(Sum("spend_c", alias_name="spend_cents"),
                                     Count(alias_name="n_orders"))
    names = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    named = spend.join(names, join_type="inner", num_partitions=num_partitions,
                       on=("o_custkey",), right_on=("c_custkey",))

    def block_top(t: pa.Table) -> pa.Table:
        return t.sort_by([("spend_cents", "descending"),
                          ("o_custkey", "ascending")]).slice(0, 10)

    df = named.map_batches(block_top, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["spend_cents", "o_custkey"], ascending=[False, True],
                        kind="stable").head(10)
    return df[["o_custkey", "c_name", "spend_cents", "n_orders"]].reset_index(drop=True)


def order_priority_count(sf_dir: str) -> Dataset:
    ds = _t(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])
    lo = pa.scalar(pd.Timestamp("1995-01-01"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"))
    return ds.map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t.column("o_orderdate"), lo),
                                   pc.less(t.column("o_orderdate"), hi))),
        batch_format="pyarrow",
    ).groupby("o_orderpriority").count().map_batches(
        lambda t: t.rename_columns(["o_orderpriority", "n_orders"]),
        batch_format="pyarrow")


def part_brand_stats(sf_dir: str) -> Dataset:
    ds = _t(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])
    return ds.map_batches(
        lambda t: pa.table({"p_brand": t.column("p_brand"),
                            "price_c": _cents(t.column("p_retailprice")),
                            "p_size": t.column("p_size")}),
        batch_format="pyarrow",
    ).groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Min("price_c", alias_name="min_price_cents"),
        Max("price_c", alias_name="max_price_cents"),
        Max("p_size", alias_name="max_size"),
    )


def supplier_nation_balance(sf_dir: str) -> Dataset:
    """Broadcast dimension join + grouped aggregate over supplier."""
    import ray

    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    ref = ray.put(dict(zip(nation["n_nationkey"].astype(int), nation["n_name"])))

    class Annotate:
        def __init__(self) -> None:
            n = ray.get(ref)
            self.keys = pa.array(list(n.keys()), type=pa.int64())
            self.names = pa.array(list(n.values()), type=pa.string())

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column("s_nationkey").cast(pa.int64()),
                              value_set=self.keys)
            return pa.table({
                "n_name": pc.take(self.names, idx),
                "bal_c": _cents(t.column("s_acctbal")),
            })

    return _t(sf_dir, "supplier", ["s_nationkey", "s_acctbal"]).map_batches(
        Annotate, batch_format="pyarrow", concurrency=(1, 2)
    ).groupby("n_name").aggregate(
        Sum("bal_c", alias_name="total_balance_cents"),
        Count(alias_name="n_suppliers"))


# --- events: windows + sessionization ---------------------------------------

def events_daily(sf_dir: str) -> Dataset:
    """Tumbling daily window per event_type (derive window key, groupby)."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"), format="%Y-%m-%d")
        return pa.table({
            "event_type": t.column("event_type"),
            "day": day,
            "value_c": _cents(t.column("value")),
        })

    return ds.map_batches(prep, batch_format="pyarrow").groupby(
        ["event_type", "day"]).aggregate(
        Count(alias_name="n_events"), Sum("value_c", alias_name="sum_value_cents"))


def user_sessions(sf_dir: str, gap_s: int = 1800) -> Dataset:
    """Sessionization as sort + vectorized run-boundary reduction (the
    stages/graph.py::_combine_sorted shape) instead of one Python call
    and one pandas frame per user (``groupby().map_groups`` was measured
    as the hottest stage shape in the graph build):

    1. global ``sort(user_id, ts, event_id)`` — range-partitioned,
       vectorized;
    2. one map over the sorted blocks reduces each user run with numpy
       ``reduceat`` (events, internal >gap_s gaps);
    3. the ≤2 runs touching each block boundary ride a raw channel and
       are re-reduced driver-side (first/last ts per partial gives the
       cross-block gap) — the driver sees O(blocks) rows, never O(users).
    """
    import ray.data as rd

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])
    srt = ds.sort(["user_id", "ts", "event_id"])

    def block_partial(t: pa.Table) -> pa.Table:
        # Arrow in, Arrow out: every block carries ONE schema (a pandas
        # partial here emitted PandasBlockSchema blocks that union with
        # the Arrow interior/fixup channels and trip Ray's mixed-schema
        # warning)
        out_schema = pa.schema([
            ("user_id", t.schema.field("user_id").type),
            ("n_events", pa.int64()),
            ("n_gaps", pa.int64()),
            ("first_ts", t.schema.field("ts").type),
            ("last_ts", t.schema.field("ts").type),
            ("edge", pa.bool_()),
        ])
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = uid[1:] != uid[:-1]
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = (((ts[1:] - ts[:-1]) / np.timedelta64(1, "s")) > gap_s) & ~new_run[1:]
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n)
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = edge[-1] = True  # runs touching a block boundary
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "n_gaps": pa.array(np.add.reduceat(gap, starts)),
            "first_ts": pa.array(ts[starts]),
            "last_ts": pa.array(ts[ends - 1]),
            "edge": pa.array(edge),
        }, schema=out_schema)

    from ..traverse import drop_empty_blocks as _deb

    # drop empty sorted partitions: they bypass kernels and ride
    # downstream as schema-less blocks (dedup._bucket_verify note)
    partial = _deb(srt.map_batches(block_partial, batch_format="pyarrow"))

    def interior_fn(t: pa.Table) -> pa.Table:
        # filter + project in ONE kernel: Ray's fused Filter->Map passes
        # empty filter results through unprojected (see
        # traverse.filter_select), which leaves marker columns on 0-row
        # blocks and makes block schemas disagree
        t = t.filter(pc.equal(t.column("edge"), False))
        return pa.table({
            "user_id": t.column("user_id"),
            "n_events": t.column("n_events"),
            "n_sessions": pc.add(t.column("n_gaps"), 1),
        })

    interior = partial.map_batches(interior_fn, batch_format="pyarrow")
    edge_df = partial.filter(expr="edge == True").to_pandas()
    if not len(edge_df):
        return interior
    edge_df = edge_df.sort_values(["user_id", "first_ts", "last_ts"],
                                  kind="stable")
    uid = edge_df["user_id"].to_numpy()
    same = np.zeros(len(edge_df), dtype=bool)
    same[1:] = uid[1:] == uid[:-1]
    boundary_gap = np.zeros(len(edge_df), dtype=np.int64)
    prev_last = edge_df["last_ts"].to_numpy()[:-1]
    cur_first = edge_df["first_ts"].to_numpy()[1:]
    boundary_gap[1:] = (((cur_first - prev_last) / np.timedelta64(1, "s")) > gap_s) & same[1:]
    g = edge_df.assign(bgap=boundary_gap).groupby("user_id", sort=False)
    fixed = pa.table({
        "user_id": pa.array(g["user_id"].first().to_numpy()),
        "n_events": pa.array(g["n_events"].sum().to_numpy().astype(np.int64)),
        "n_sessions": pa.array((1 + g["n_gaps"].sum().to_numpy()
                                + g["bgap"].sum().to_numpy()).astype(np.int64)),
    })
    return interior.union(rd.from_arrow(fixed))


def user_day_streaks(sf_dir: str) -> Dataset:
    """Gaps-and-islands — each user's LONGEST run of consecutive active
    days (the classic streak query; SQL mirror is the ``d - ROW_NUMBER()
    OVER (...)`` island-anchor trick). Unlike ``user_sessions`` the
    target (a MAX over island lengths) is not additively combinable
    from per-fragment counters, so boundary runs carry a segment
    SEMIRING instead: (prefix streak, suffix streak, best interior
    streak, span). Plan:

    1. exact distinct (user, epoch-day) — vectorized local dedup, one
       keys×days-bounded shuffle (the distinct_users_by_type shape);
    2. global ``sort(user_id, day)``, per-block vectorized island scan
       (``np.diff == 1`` runs via reduceat);
    3. the ≤2 runs touching each block edge ride a raw channel with
       their semiring tuple; the driver folds each user's fragments in
       day order — O(blocks) rows, never O(users) or O(days)."""
    import ray.data as rd

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def to_days(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        us = ts.astype("datetime64[us]").view(np.int64)
        days = pa.array(us // 86_400_000_000)
        return (pa.table({"user_id": t.column("user_id"), "day": days})
                .group_by(["user_id", "day"], use_threads=False)
                .aggregate([]))

    days = (ds.map_batches(to_days, batch_format="pyarrow")
            .groupby(["user_id", "day"]).count()
            .map_batches(lambda t: t.select(["user_id", "day"]),
                         batch_format="pyarrow"))
    srt = days.sort(["user_id", "day"])

    def block_partial(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("user_id", t.schema.field("user_id").type),
            ("first_day", pa.int64()), ("last_day", pa.int64()),
            ("prefix", pa.int64()), ("suffix", pa.int64()),
            ("best", pa.int64()), ("edge", pa.bool_()),
        ])
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = uid[1:] != uid[:-1]
        # island starts: new user OR a >1-day gap
        isl_start = new_run.copy()
        isl_start[1:] |= (d[1:] - d[:-1]) != 1
        isl_id = np.cumsum(isl_start) - 1
        isl_len = np.bincount(isl_id)  # length of every island
        run_starts = np.flatnonzero(new_run)
        run_ends = np.append(run_starts[1:], n)
        # per user-run: first/last island ids give prefix/suffix;
        # best = max island length inside the run (reduceat over the
        # contiguous island-length slice)
        first_isl = isl_id[run_starts]
        last_isl = isl_id[run_ends - 1]
        # islands never cross run boundaries (a new user starts a new
        # island), so runs own CONTIGUOUS island-id slices and reduceat
        # over isl_len at the run's first island ids is the exact
        # segmented max (every run has >= 1 island, so no empty slice)
        best = np.maximum.reduceat(isl_len, first_isl).astype(np.int64)
        edge = np.zeros(len(run_starts), dtype=bool)
        edge[0] = edge[-1] = True
        return pa.table({
            "user_id": pa.array(uid[run_starts]),
            "first_day": pa.array(d[run_starts].astype(np.int64)),
            "last_day": pa.array(d[run_ends - 1].astype(np.int64)),
            "prefix": pa.array(isl_len[first_isl].astype(np.int64)),
            "suffix": pa.array(isl_len[last_isl].astype(np.int64)),
            "best": pa.array(best),
            "edge": pa.array(edge),
        }, schema=out_schema)

    from ..traverse import drop_empty_blocks as _deb

    partial = _deb(srt.map_batches(block_partial, batch_format="pyarrow"))

    def interior_fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("edge"), False))
        return pa.table({"user_id": t.column("user_id"),
                         "max_streak_days": t.column("best")})

    interior = partial.map_batches(interior_fn, batch_format="pyarrow")
    edge_df = partial.filter(expr="edge == True").to_pandas()
    if not len(edge_df):
        return interior
    edge_df = edge_df.sort_values(["user_id", "first_day"], kind="stable")
    rows = []
    for user, sub in edge_df.groupby("user_id", sort=False):
        pfx = sfx = best = span0 = None
        for frag in sub.itertuples(index=False):
            if pfx is None:
                pfx, sfx, best = frag.prefix, frag.suffix, frag.best
                last = frag.last_day
                span0 = frag.last_day - frag.first_day + 1
                all_one = pfx == span0  # fragment is one island
                continue
            connected = frag.first_day == last + 1
            join = (sfx + frag.prefix) if connected else 0
            f_span = frag.last_day - frag.first_day + 1
            f_all_one = frag.prefix == f_span == frag.best
            new_best = max(best, frag.best, join)
            # prefix grows only while everything so far is one island
            new_pfx = pfx + frag.prefix if (connected and all_one) else pfx
            new_sfx = (sfx + frag.prefix if (connected and f_all_one)
                       else frag.suffix)
            pfx, sfx, best = new_pfx, new_sfx, max(new_best, new_pfx,
                                                   new_sfx)
            all_one = all_one and connected and f_all_one
            last = frag.last_day
        rows.append({"user_id": user,
                     "max_streak_days": int(max(best, pfx, sfx))})
    uid_type = pa.Table.from_pandas(
        edge_df[["user_id"]], preserve_index=False).schema.field(
        "user_id").type
    fixed = pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], type=uid_type),
        "max_streak_days": pa.array(
            [r["max_streak_days"] for r in rows], type=pa.int64()),
    })
    return interior.union(rd.from_arrow(fixed))


def distinct_users_by_type(sf_dir: str) -> Dataset:
    """Exact COUNT(DISTINCT) per key: vectorized local (key, user) dedup
    inside map_batches (the salt-by-batch pattern again), then one
    groupby over the much smaller distinct pairs."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def local_distinct(t: pa.Table) -> pa.Table:
        # Arrow-native distinct: group_by with no aggregates (no pandas
        # string boxing on the hot event_type column)
        return (t.select(["event_type", "user_id"])
                 .group_by(["event_type", "user_id"], use_threads=False)
                 .aggregate([]))

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow",
                           batch_size=65536)
    return pairs.groupby(["event_type", "user_id"]).count().map_batches(
        lambda t: t.select(["event_type", "user_id"]), batch_format="pyarrow"
    ).groupby("event_type").count().map_batches(
        lambda t: t.rename_columns(["event_type", "n_users"]),
        batch_format="pyarrow")


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """HLL companion to distinct_users_by_type (rows-only check: the
    estimate is within ~3% of exact but not hash-identical)."""
    from ..functions.sketches import hll_distinct_by_key

    out = hll_distinct_by_key(_t(sf_dir, "events", ["event_type", "user_id"]),
                              "event_type", "user_id", p=12)
    out["approx_distinct"] = out["approx_distinct"].round(1)
    return out


def events_sliding_2h(sf_dir: str) -> Dataset:
    """Sliding (hopping) window: size 2h, hop 1h — each event lands in
    two windows, expressed as a vectorized flat-map that duplicates rows
    with shifted window keys, then one groupby. The streaming-window
    pattern for a batch engine without watermarks."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def explode(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        parts = []
        for off in (0, 1):
            start = pc.subtract(hour, pa.scalar(pd.Timedelta(hours=off)))
            parts.append(pa.table({
                "event_type": t.column("event_type"),
                "window_start": pc.strftime(start, format="%Y-%m-%d %H"),
            }))
        return pa.concat_tables(parts)

    return ds.map_batches(explode, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]).count().map_batches(
        lambda t: t.rename_columns(["event_type", "window_start", "n_events"]),
        batch_format="pyarrow")


def top3_orders_per_customer(sf_dir: str, k: int = 3) -> Dataset:
    """Per-group top-k over orders (each customer's k priciest orders,
    orderkey tiebreak) — delegates to the shared distributed kernel
    ``functions/topk.py::per_group_topk`` (one global sort, per-block
    first-k run take, O(blocks·k) driver fixup of edge-run prefixes).
    This query is where that kernel was first built; the hand-rolled
    copy it once carried is gone (two implementations of the same
    subtle edge-prefix argument invited silent divergence)."""
    from ..functions.topk import per_group_topk

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "o_orderkey": t.column("o_orderkey"),
                         "price_c": _cents(t.column("o_totalprice"))})

    return per_group_topk(ds.map_batches(prep, batch_format="pyarrow"),
                          group_col="o_custkey",
                          order_cols=["price_c", "o_orderkey"],
                          descending=[True, False], k=k)


def customers_without_orders(sf_dir: str,
                             num_partitions: int = 4) -> Dataset:
    """Distributed anti-join: customer LEFT ANTI orders on custkey — no
    driver-side key-set materialization (the orders custkey set is
    fact-sized at scale). Orders pre-dedup per batch so the shuffle ships
    distinct keys, not one row per order. Returns the surviving
    customers as a DATASET (the result is unbounded at 100× — the
    caller decides whether to collect); empty/schema-less join blocks
    are laundered with ``drop_empty_blocks`` so a zero-row result still
    carries the typed (c_custkey, c_name) schema."""
    from ..traverse import drop_empty_blocks

    def local_distinct(t: pa.Table) -> pa.Table:
        keys = pd.unique(t.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({"o_custkey": pa.array(keys, type=pa.int64())})

    okeys = _t(sf_dir, "orders", ["o_custkey"]).map_batches(
        local_distinct, batch_format="pyarrow", batch_size=65536)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    out = cust.join(okeys, join_type="left_anti",
                    num_partitions=num_partitions,
                    on=("c_custkey",), right_on=("o_custkey",))
    # select BEFORE laundering: empty blocks bypass map_batches, so a
    # projection after the typed-empty fallback would erase its schema
    out = out.map_batches(
        lambda t: t.select(["c_custkey", "c_name"]), batch_format="pyarrow")
    return drop_empty_blocks(out, pa.schema([("c_custkey", pa.int64()),
                                             ("c_name", pa.string())]))


def paginate(ds: Dataset, *, sort_key: str, descending: bool = True,
             offset: int = 0, limit: int = 20,
             tiebreak: str | None = None) -> pd.DataFrame:
    """T5/T6: ORDER BY <key> DESC LIMIT <limit> OFFSET <offset> —
    the reference pages interactions with SQL offset/limit over a
    timestamp sort (app.py:469-495). Distributed: global sort →
    ``limit(offset+limit)`` (per-block truncation under the hood) →
    driver drops the first ``offset`` rows of a page-sized frame.
    Driver residency is one page + offset, never the table."""
    keys = [sort_key] + ([tiebreak] if tiebreak else [])
    desc = [descending] + ([False] if tiebreak else [])
    page = ds.sort(keys, descending=desc).limit(offset + limit).to_pandas()
    return page.iloc[offset:offset + limit].reset_index(drop=True)


def events_page2(sf_dir: str) -> pd.DataFrame:
    """Driver-gate instance of paginate: page 2 (rows 20-39) of events
    ordered by ts DESC (oracle: ORDER BY ts DESC, event_id LIMIT 20
    OFFSET 20)."""
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id"])
    return paginate(ds, sort_key="ts", descending=True,
                    offset=20, limit=20, tiebreak="event_id")


def brand_nation_revenue(sf_dir: str, num_partitions: int = 8) -> Dataset:
    """TPC-H Q9-shaped 3-way join: lineitem ⋈ part (l_partkey) ⋈
    supplier (l_suppkey), nation broadcast, grouped by (brand, nation).
    Both joins are distributed hash joins — part and supplier are
    fact-scale at 100×; only the 25-row nation dict ships via ray.put."""
    import ray

    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_ref = ray.put(dict(zip(nation["n_nationkey"].astype(int),
                             nation["n_name"])))

    def li_prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(1.0, t.column("l_discount")))
        return pa.table({
            "l_partkey": t.column("l_partkey"),
            "l_suppkey": t.column("l_suppkey"),
            "rev_c": _cents(rev),
        })

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
            ).map_batches(li_prep, batch_format="pyarrow")
    withpart = li.join(
        _t(sf_dir, "part", ["p_partkey", "p_brand"]),
        join_type="inner", num_partitions=num_partitions,
        on=("l_partkey",), right_on=("p_partkey",))
    withsupp = withpart.join(
        _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        join_type="inner", num_partitions=num_partitions,
        on=("l_suppkey",), right_on=("s_suppkey",))

    class AnnotateCombine:
        """Nation lookup + PARTIAL (brand, nation) aggregation per
        batch: the final groupby shuffles <= |brands|x|nations| rows per
        batch instead of every joined row (the pre-aggregate-before-
        shuffle rule)."""

        def __init__(self) -> None:
            self.n = ray.get(n_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "p_brand": t.column("p_brand").to_pandas(),
                "n_name": pd.Series(t.column("s_nationkey")
                                    .to_numpy(zero_copy_only=False)
                                    ).map(self.n),
                "rev_c": t.column("rev_c").to_numpy(zero_copy_only=False),
            })
            g = (df.groupby(["p_brand", "n_name"], sort=False)["rev_c"]
                 .agg(["sum", "count"]).reset_index())
            return pa.table({
                "p_brand": pa.array(g["p_brand"], type=pa.string()),
                "n_name": pa.array(g["n_name"], type=pa.string()),
                "rev_c": pa.array(g["sum"].astype("int64")),
                "n_part": pa.array(g["count"].astype("int64")),
            })

    return withsupp.map_batches(AnnotateCombine, batch_format="pyarrow",
                                concurrency=(1, 4)).groupby(
        ["p_brand", "n_name"]).aggregate(
        Sum("rev_c", alias_name="revenue_cents"),
        Sum("n_part", alias_name="n_items"))


# --- KG construction over relational inputs (SQL-checkable) -----------------

_REL_TRIPLES_CACHE: dict[str, Dataset] = {}


def kg_rel_triples(sf_dir: str) -> Dataset:
    """Flat-map triple emission over the region→nation→customer→orders
    containment chain — the reference's taxonomy-chain operator (M3)
    expressed over relational input so DuckDB can oracle-check it.
    Materialized ONCE per input dir (the `_jaccard_pairs`/_KG_CACHE
    convention): the triple table is the shared intermediate that
    degree/pagerank/node queries fan out from, and it is orders-sized
    — cheap to keep in the object store while each consumer streams."""
    if sf_dir not in _REL_TRIPLES_CACHE:
        _REL_TRIPLES_CACHE[sf_dir] = _kg_rel_triples_build(
            sf_dir).materialize()
    return _REL_TRIPLES_CACHE[sf_dir]


def _kg_rel_triples_build(sf_dir: str) -> Dataset:
    region = _t(sf_dir, "region").to_pandas()
    nation = _t(sf_dir, "nation").to_pandas()
    rn = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    rn_map = dict(zip(rn["n_nationkey"], zip(rn["r_name"], rn["n_name"])))
    import ray

    rn_ref = ray.put(rn_map)

    t1 = rd.from_arrow(pa.table({
        "subj": rn["r_name"].astype(str),
        "pred": ["contains"] * len(rn),
        "obj": rn["n_name"].astype(str),
    }))

    class CustTriples:
        def __init__(self) -> None:
            n_name = {k: v[1] for k, v in ray.get(rn_ref).items()}
            self.keys = pa.array(list(n_name.keys()), type=pa.int64())
            self.names = pa.array(list(n_name.values()), type=pa.string())

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column("c_nationkey").cast(pa.int64()),
                              value_set=self.keys)
            return pa.table({
                "subj": pc.take(self.names, idx),
                "pred": pa.array(["contains"] * len(t)),
                "obj": t.column("c_name").cast(pa.string()),
            })

    t2 = _t(sf_dir, "customer", ["c_nationkey", "c_name"]).map_batches(
        CustTriples, batch_format="pyarrow", concurrency=(1, 2))

    # fact ⋈ fact: orders ⋈ customer is a distributed hash join — the
    # customer-name map is customer-table-sized and must never be a
    # driver-side broadcast dict at scale
    oc = _t(sf_dir, "orders", ["o_custkey", "o_orderkey"]).join(
        _t(sf_dir, "customer", ["c_custkey", "c_name"]),
        join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",))

    def order_triples(t: pa.Table) -> pa.Table:
        obj = pc.binary_join_element_wise(
            "order-", pc.cast(t.column("o_orderkey"), pa.string()), "")
        return pa.table({
            "subj": t.column("c_name").cast(pa.string()),
            "pred": pa.array(["placed"] * len(t)),
            "obj": obj,
        })

    t3 = oc.map_batches(order_triples, batch_format="pyarrow")
    return t1.union(t2).union(t3)


def kg_rel_nodes(sf_dir: str) -> Dataset:
    """Node dedup (G1) over the relational triple endpoints."""
    region = _t(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: pa.table({"node_id": t.column("r_name").cast(pa.string()),
                            "node_type": pa.array(["region"] * len(t))}),
        batch_format="pyarrow")
    nation = _t(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: pa.table({"node_id": t.column("n_name").cast(pa.string()),
                            "node_type": pa.array(["nation"] * len(t))}),
        batch_format="pyarrow")
    cust = _t(sf_dir, "customer", ["c_name"]).map_batches(
        lambda t: pa.table({"node_id": t.column("c_name").cast(pa.string()),
                            "node_type": pa.array(["customer"] * len(t))}),
        batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey"]).map_batches(
        lambda t: pa.table({
            "node_id": pa.array([f"order-{int(o)}" for o in
                                 t.column("o_orderkey").to_numpy(zero_copy_only=False)],
                                type=pa.string()),
            "node_type": pa.array(["order"] * len(t))}),
        batch_format="pyarrow")
    allnodes = region.union(nation).union(cust).union(orders)
    return allnodes.groupby(["node_id", "node_type"]).count().map_batches(
        lambda t: t.select(["node_id", "node_type"]), batch_format="pyarrow")


def kg_rel_degree(sf_dir: str) -> Dataset:
    """Out-degree per subject (adjacency-size stats, G2/G3 shape)."""
    return kg_rel_triples(sf_dir).groupby("subj").count().map_batches(
        lambda t: t.rename_columns(["subj", "out_degree"]), batch_format="pyarrow")


def events_asof_purchase(sf_dir: str) -> Dataset:
    """AS-OF join: every click event picks the user's most recent
    purchase at-or-before it (inner — clicks with no prior purchase
    drop). One range-partitioning sort + two block maps; driver state is
    O(blocks) (functions/asof.py)."""
    from ..functions.asof import asof_join

    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type",
                               "value"])
    from ..traverse import filter_select

    left = filter_select(ev, "event_type", "click",
                         columns=["event_id", "user_id", "ts"])
    right = filter_select(ev, "event_type", "purchase",
                          columns=["event_id", "user_id", "ts", "value"])
    return asof_join(left, right, key="user_id", ts_col="ts",
                     tiebreak_col="event_id", value_cols=["value"],
                     join_type="inner")


def events_asof_purchase_left(sf_dir: str) -> Dataset:
    """LEFT variant of the as-of join (ASOF LEFT JOIN): clicks with no
    prior purchase are KEPT with null ts_asof/value_asof — the other
    half of the join contract, oracle-checked so the null-padding path
    is driver-verified, not just unit-tested."""
    from ..functions.asof import asof_join

    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type",
                               "value"])
    from ..traverse import filter_select

    left = filter_select(ev, "event_type", "click",
                         columns=["event_id", "user_id", "ts"])
    right = filter_select(ev, "event_type", "purchase",
                          columns=["event_id", "user_id", "ts", "value"])
    return asof_join(left, right, key="user_id", ts_col="ts",
                     tiebreak_col="event_id", value_cols=["value"],
                     join_type="left")


def user_rolling_value(sf_dir: str, w: int = 3) -> Dataset:
    """Per-user rolling sum of the last w event values (ROWS frame,
    ts+event_id order) — the streaming-window aggregate, via the
    distributed kernel ``functions/window.py::rolling_sum`` (global
    sort + vectorized per-run cumsum windows; only 2(w-1) rows per
    block ride to the driver fixup). Integer cents for hash parity."""
    from ..functions.window import rolling_sum

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value")),
        })

    return rolling_sum(ds.map_batches(prep, batch_format="pyarrow"),
                       group_col="user_id", order_cols=["ts", "event_id"],
                       value_col="value_c", w=w, id_col="event_id",
                       out_col="roll_value_cents")


def _rolling_events(sf_dir: str, agg: str, out_col: str,
                    w: int = 3) -> Dataset:
    """Shared prep for the ROWS-frame rolling family (mean/min/max):
    same (user_id, ts, event_id) order and integer-cents values as
    ``user_rolling_value``."""
    from ..functions.window import rolling_agg

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value")),
        })

    return rolling_agg(ds.map_batches(prep, batch_format="pyarrow"),
                       group_col="user_id", order_cols=["ts", "event_id"],
                       value_col="value_c", w=w, id_col="event_id",
                       agg=agg, out_col=out_col)


def user_rolling_mean(sf_dir: str) -> Dataset:
    """AVG over the same 3-row frame (exact int sum / exact count — one
    float64 division, DuckDB integer-AVG parity)."""
    return _rolling_events(sf_dir, "mean", "roll_avg_cents")


def user_rolling_min(sf_dir: str) -> Dataset:
    return _rolling_events(sf_dir, "min", "roll_min_cents")


def user_rolling_max(sf_dir: str) -> Dataset:
    return _rolling_events(sf_dir, "max", "roll_max_cents")


def user_range_sum_30m(sf_dir: str) -> Dataset:
    """RANGE-frame (time-window) rolling sum: all events of the user in
    the 30 minutes up to and including each event's ts (SQL RANGE
    BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW — ORDER-BY
    peers included). The rate-limit / windowed-stats shape."""
    from ..functions.window import rolling_range_agg

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value")),
        })

    return rolling_range_agg(ds.map_batches(prep, batch_format="pyarrow"),
                             group_col="user_id", ts_col="ts",
                             value_col="value_c", delta=30 * 60 * 1_000_000,
                             id_col="event_id", agg="sum",
                             out_col="range_sum_cents")


def user_prev_value(sf_dir: str) -> Dataset:
    """SQL LAG(value_cents, 1) per user (ts+event_id order), -1 where no
    predecessor exists (COALESCE keeps the oracle hash int64-stable)."""
    from ..functions.window import lag_lead

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value")),
        })

    return lag_lead(ds.map_batches(prep, batch_format="pyarrow"),
                    group_col="user_id", order_cols=["ts", "event_id"],
                    value_col="value_c", offset=1, kind="lag",
                    id_col="event_id", default=-1,
                    out_col="prev_value_cents")


def user_next_value(sf_dir: str) -> Dataset:
    """SQL LEAD(value_cents, 1) per user — the forward-looking mirror
    (the boundary channel flips direction)."""
    from ..functions.window import lag_lead

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value")),
        })

    return lag_lead(ds.map_batches(prep, batch_format="pyarrow"),
                    group_col="user_id", order_cols=["ts", "event_id"],
                    value_col="value_c", offset=1, kind="lead",
                    id_col="event_id", default=-1,
                    out_col="next_value_cents")


def user_event_rownum(sf_dir: str) -> Dataset:
    """SQL ROW_NUMBER() per user over (ts, event_id) — the unbounded-
    frame ranking window (block-offset-chain operator; see
    functions/window.py::row_number for the partitioning assumption)."""
    from ..functions.window import row_number

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id"])
    return row_number(ds, group_col="user_id",
                      order_cols=["ts", "event_id"], id_col="event_id",
                      out_col="rn")


def _ranked_events(sf_dir: str, method: str, out_col: str) -> Dataset:
    """RANK/DENSE_RANK per user over value cents — ORDER BY a repeating
    value column so SQL tie semantics (shared ranks, gaps) are actually
    exercised, including ties spanning block boundaries."""
    from ..functions.window import rank_window

    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "value_c": _cents(t.column("value")),
        })

    return rank_window(ds.map_batches(prep, batch_format="pyarrow"),
                       group_col="user_id", order_cols=["value_c"],
                       id_col="event_id", method=method, out_col=out_col)


def user_running_value(sf_dir: str) -> Dataset:
    """Per-user running total of value cents (SQL SUM ... ROWS UNBOUNDED
    PRECEDING) — the cumulative companion of user_rolling_value, via the
    block-offset-chain running_sum."""
    from ..functions.window import running_sum

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value")),
        })

    return running_sum(ds.map_batches(prep, batch_format="pyarrow"),
                       group_col="user_id", order_cols=["ts", "event_id"],
                       value_col="value_c", id_col="event_id",
                       out_col="running_value_cents")


def user_value_rank(sf_dir: str) -> Dataset:
    return _ranked_events(sf_dir, "rank", "value_rank")


def user_value_dense_rank(sf_dir: str) -> Dataset:
    return _ranked_events(sf_dir, "dense_rank", "value_dense_rank")


def user_event_ntile4(sf_dir: str) -> Dataset:
    """SQL NTILE(4) per user over (ts, event_id) — quartile bucketing,
    composed from row_number + a group-size join."""
    from ..functions.window import ntile

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id"])
    return ntile(ds, group_col="user_id", order_cols=["ts", "event_id"],
                 id_col="event_id", k=4, out_col="quartile")


def user_value_percent_rank(sf_dir: str) -> Dataset:
    """SQL PERCENT_RANK() per user over value cents (tie-heavy order
    key — exercises shared ranks in the numerator)."""
    from ..functions.window import percent_rank

    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "value_c": _cents(t.column("value")),
        })

    return percent_rank(ds.map_batches(prep, batch_format="pyarrow"),
                        group_col="user_id", order_cols=["value_c"],
                        id_col="event_id", out_col="value_pct_rank")


def user_range_count_30m(sf_dir: str) -> Dataset:
    """RANGE-frame event count in the trailing 30-minute window — the
    canonical rate-limit counter."""
    from ..functions.window import rolling_range_agg

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id"])
    return rolling_range_agg(ds, group_col="user_id", ts_col="ts",
                             value_col=None, delta=30 * 60 * 1_000_000,
                             id_col="event_id", agg="count",
                             out_col="range_n_events")


def events_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-event-type median and p90 of value (in cents) via the
    distributed value-histogram aggregate (functions/quantiles.py) —
    no sort, no sketch; bit-identical to DuckDB quantile_disc."""
    from ..functions.quantiles import grouped_exact_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "cents": _cents(t.column("value"))})

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    return grouped_exact_quantiles(
        cents, "event_type", "cents",
        [(1, 2, "median_cents"), (9, 10, "p90_cents")])


def events_value_quantiles_cont(sf_dir: str) -> pd.DataFrame:
    """PERCENTILE_CONT companion to ``events_value_quantiles``:
    interpolated per-type median/p90 over the SAME two-phase exact
    histogram — DuckDB ``quantile_cont`` bit-parity via the float64
    ``q*(n-1)`` rank rule (functions/quantiles.py)."""
    from ..functions.quantiles import grouped_cont_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "cents": _cents(t.column("value"))})

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    return grouped_cont_quantiles(
        cents, "event_type", "cents",
        [(0.5, "median_cont_cents"), (0.9, "p90_cont_cents")])


def events_value_winsorized(sf_dir: str) -> Dataset:
    """Winsorized grouped mean — the outlier-clipping normalizer of a
    training-data pipeline (clip each value into its group's exact
    [p05, p95] band, then aggregate). Two passes: (1) the keys-sized
    exact quantile histogram (functions/quantiles.py — domain-bounded,
    never row-bounded), (2) the thresholds BROADCAST into a map_batches
    clip (keys are event types — a dict, not a shuffle join) feeding
    exact int64 partial sums; mean = one exact-int division at the end
    (the events_value_stats determinism rule)."""
    from ..functions.quantiles import grouped_exact_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "cents": _cents(t.column("value"))})

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    band = grouped_exact_quantiles(
        cents, "event_type", "cents", [(1, 20, "lo"), (19, 20, "hi")])
    lo_map = dict(zip(band["event_type"], band["lo"].astype(np.int64)))
    hi_map = dict(zip(band["event_type"], band["hi"].astype(np.int64)))

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        denc = et.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False)
        k = len(denc.dictionary)
        types = denc.dictionary.to_pylist()
        lo = np.array([lo_map[x] for x in types], dtype=np.int64)[idx]
        hi = np.array([hi_map[x] for x in types], dtype=np.int64)[idx]
        c = t.column("cents").to_numpy(zero_copy_only=False)
        w = np.minimum(np.maximum(c, lo), hi)
        return pa.table({
            "event_type": denc.dictionary,
            "n": pa.array(np.bincount(idx, minlength=k).astype(np.int64)),
            "wsum": pa.array(np.bincount(idx, weights=w, minlength=k)
                             .astype(np.int64)),
        })

    agg = (cents.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("wsum", alias_name="wsum")))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        s = t.column("wsum").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t.column("event_type"),
            "n_events": pc.cast(t.column("n"), pa.int64()),
            "wsum_cents": pc.cast(t.column("wsum"), pa.int64()),
            "winsorized_mean_cents": pa.array(
                s.astype(np.float64) / n.astype(np.float64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_type_diversity(sf_dir: str) -> Dataset:
    """Per-user label-diversity score — the Gini–Simpson index
    ``1 - Σ_t (c_t/n)²`` over the user's event-type distribution (the
    training-mix analogue: per-source/per-label diversity of a
    document shard). Deliberately Gini–Simpson and NOT Shannon entropy:
    the index is ONE float division of two exact int64 sums
    (``1 - Σc²/n²``), so it is bit-deterministic however Ray partitions
    the shuffle, where a log2-based entropy would hash-diverge from the
    oracle by libm ULPs. The type domain is pivoted into fixed integer
    Sum columns (the events_daily_pivot shape), so the whole op is one
    shuffle of exact partials."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id")
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        denc = uid.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False)
        k = len(denc.dictionary)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        cols = {"user_id": denc.dictionary}
        for name in _EVENT_TYPES:
            cols[f"c_{name}"] = pa.array(
                np.bincount(idx, weights=(et == name), minlength=k)
                .astype(np.int64))
        return pa.table(cols)

    aggs = [Sum(f"c_{n}", alias_name=f"c_{n}") for n in _EVENT_TYPES]
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("user_id").aggregate(*aggs))

    def finish(t: pa.Table) -> pa.Table:
        cs = [t.column(f"c_{n}").to_numpy(zero_copy_only=False)
              .astype(np.int64) for n in _EVENT_TYPES]
        n = cs[0] + cs[1] + cs[2] + cs[3] + cs[4]
        ssq = (cs[0] * cs[0] + cs[1] * cs[1] + cs[2] * cs[2]
               + cs[3] * cs[3] + cs[4] * cs[4])
        return pa.table({
            "user_id": t.column("user_id"),
            "n_events": pa.array(n),
            "type_diversity": pa.array(
                1.0 - ssq.astype(np.float64) / (n * n).astype(np.float64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def user_event_paths(sf_dir: str, k: int = 10) -> Dataset:
    """Grouped ORDERED collect (SQL ``string_agg(... ORDER BY) `` over
    the first k rows per key): each user's first-k event types in
    (ts, event_id) order, joined with '->'. Same shape as
    ``user_sessions``: global sort → per-block vectorized run collect →
    boundary runs re-assembled driver-side (fragments of a key that
    crosses blocks are contiguous in the sort, so concatenating them by
    first_ts restores the global order; the driver sees O(blocks) rows).
    """
    import ray.data as rd

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    srt = ds.sort(["user_id", "ts", "event_id"])

    def block_partial(t: pa.Table) -> pa.Table:
        # Arrow in/out (one schema across interior + fixup channels)
        out_schema = pa.schema([
            ("user_id", t.schema.field("user_id").type),
            ("path", pa.string()),
            ("n_run", pa.int64()),
            ("first_ts", t.schema.field("ts").type),
            ("first_id", t.schema.field("event_id").type),
            ("edge", pa.bool_()),
        ])
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n)
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = edge[-1] = True
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "path": pa.array(["->".join(et[s:min(e, s + k)]) for s, e in
                              zip(starts, ends)], type=pa.string()),
            "n_run": pa.array((ends - starts).astype(np.int64)),
            "first_ts": pa.array(t.column("ts").to_numpy(
                zero_copy_only=False)[starts]),
            "first_id": pa.array(t.column("event_id").to_numpy(
                zero_copy_only=False)[starts]),
            "edge": pa.array(edge),
        }, schema=out_schema)

    from ..traverse import drop_empty_blocks as _deb

    # drop empty sorted partitions: they bypass kernels and ride
    # downstream as schema-less blocks (dedup._bucket_verify note)
    partial = _deb(srt.map_batches(block_partial, batch_format="pyarrow"))
    from ..traverse import filter_select, gather_table

    interior = filter_select(partial, "edge", False,
                             columns=["user_id", "path"])

    # gather the O(blocks) edge rows as ARROW so the fixup channel keeps
    # the input's user_id type — block_partial derives out_schema from
    # the data precisely so non-int64 ids ride through, and a hardcoded
    # int64 here would schema-clash the union (or fail on string ids)
    edge_tbl = gather_table(partial.filter(expr="edge == True"))
    if not edge_tbl.num_rows:
        # before reading the schema: an all-empty input leaves only
        # schema-less 0-column blocks here, where .field() would raise
        return interior
    # Vectorized boundary re-assembly (r4 verdict item 7, the
    # per_group_topk run-boundary concat shape): sort the O(blocks)
    # edge rows, build one ListArray of each user's non-empty fragments
    # in order, then binary_join → split → list_slice(k) → binary_join
    # — no per-user Python loop.
    srt_edge = edge_tbl.take(pc.sort_indices(edge_tbl, sort_keys=[
        ("user_id", "ascending"), ("first_ts", "ascending"),
        ("first_id", "ascending")]))
    uid = srt_edge.column("user_id").to_numpy(zero_copy_only=False)
    paths = srt_edge.column("path").combine_chunks()
    n = len(uid)
    new = np.ones(n, dtype=bool)
    new[1:] = uid[1:] != uid[:-1]
    grp = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    # empty fragments (an edge run with no events of its own) contribute
    # zero tokens: drop them from the flat values but keep every user a
    # list slot so all-empty users still emit path=""
    nonempty = pc.not_equal(pc.fill_null(paths, ""), "").to_numpy(
        zero_copy_only=False)
    cnt = np.bincount(grp[nonempty], minlength=len(starts))
    offsets = pa.array(np.concatenate(([0], np.cumsum(cnt))),
                       type=pa.int32())
    frags = pa.ListArray.from_arrays(offsets,
                                     paths.filter(pa.array(nonempty)))
    tokens = pc.split_pattern(pc.binary_join(frags, "->"), "->")
    capped = pc.binary_join(pc.list_slice(tokens, 0, k), "->")
    fixed = pa.table({
        "user_id": srt_edge.column("user_id").take(pa.array(starts)),
        "path": capped,
    })
    return interior.union(rd.from_arrow(fixed))


def approx_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Sketch companion to ``events_value_quantiles`` for unbounded
    domains (rows-only driver check: ~1/(2k) rank error, not
    hash-identical; accuracy pinned by tests/test_sketches.py)."""
    from ..functions.sketches import approx_quantiles_by_key

    out = approx_quantiles_by_key(
        _t(sf_dir, "events", ["event_type", "value"]),
        "event_type", "value", [(0.5, "p50"), (0.9, "p90")], k=1024)
    out[["p50", "p90"]] = out[["p50", "p90"]].round(2)
    return out


def _parquet_column_bounds(path: str, col: str):
    """(min, max) of a flat column from parquet row-group statistics —
    reads metadata pages only, never column data. Returns None when any
    row group lacks min/max stats (caller falls back to a distributed
    aggregate)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    idx = pf.schema_arrow.get_field_index(col)
    lo = hi = None
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


def events_in_windows(sf_dir: str) -> Dataset:
    """Broadcast RANGE JOIN: events matched into a small interval table
    (here: the nightly 02:00-02:59 maintenance window per day, derived
    deterministically). The dimension intervals ship once via ray.put;
    each batch resolves membership with one vectorized searchsorted —
    the scale pattern for joining a fact stream against a bounded set
    of non-overlapping intervals (no shuffle at all)."""
    import ray

    ev = _t(sf_dir, "events", ["event_id", "ts", "event_type"])
    # windows: [day 02:00, day 03:00) for every day present — bounds
    # come from parquet row-group STATISTICS (metadata pages only; a
    # read_table here would pull the whole fact-table ts column onto
    # the driver), with a distributed min/max aggregate as the
    # fallback for stats-less files
    bounds = _parquet_column_bounds(f"{sf_dir}/events.parquet", "ts")
    if bounds is None:
        bounds = (ev.min("ts"), ev.max("ts"))
    lo = pd.Timestamp(bounds[0]).normalize()
    hi = pd.Timestamp(bounds[1]).normalize()
    days = pd.date_range(lo, hi, freq="D")
    starts = (days + pd.Timedelta(hours=2)).to_numpy()
    ends = (days + pd.Timedelta(hours=3)).to_numpy()
    w_ref = ray.put((starts, ends))

    class InWindow:
        def __init__(self) -> None:
            self.starts, self.ends = ray.get(w_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ts = t.column("ts").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.starts, ts, side="right") - 1
            idx_c = np.clip(idx, 0, len(self.starts) - 1)
            hit = (idx >= 0) & (ts < self.ends[idx_c])
            out = t.filter(pa.array(hit))
            widx = idx_c[hit]
            return out.append_column(
                "window_start", pa.array(self.starts[widx]))

    return ev.map_batches(InWindow, batch_format="pyarrow",
                          concurrency=(1, 4))


def events_daily_pivot(sf_dir: str) -> Dataset:
    """Conditional-aggregate PIVOT: one row per day with per-event-type
    counts as columns (SQL COUNT(*) FILTER ...). Per-batch partial
    pivot tables keep the shuffle at days x 1 rows per batch."""
    from ray.data.aggregate import Sum

    types = ["click", "view", "purchase", "signup", "error"]
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        # vectorized pivot without pandas: dictionary-encode the day,
        # then one bincount per event type over the day indices
        import pyarrow.compute as pc

        day = pc.strftime(t.column("ts"), format="%Y-%m-%d")
        if isinstance(day, pa.ChunkedArray):
            day = day.combine_chunks()
        denc = day.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False)
        udays = denc.dictionary
        k = len(udays)
        cols: dict[str, pa.Array] = {"day": udays}
        et = t.column("event_type")
        for ty in types:
            m = pc.equal(et, ty).to_numpy(zero_copy_only=False)
            cols[f"n_{ty}"] = pa.array(
                np.bincount(idx[m], minlength=k).astype(np.int64))
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day")
            .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in types]))


def events_daily_unpivot(sf_dir: str) -> Dataset:
    """UNPIVOT (wide→long reshape) — the inverse of
    ``events_daily_pivot``: each wide row (day, n_click, n_view, …)
    melts into one (day, event_type, n_events) row per measure column,
    zero counts included (UNPIVOT keeps non-null zeros, unlike a plain
    GROUP BY which would drop empty combinations). Pure per-batch
    column stacking: no shuffle beyond the pivot's own days-sized
    groupby; output stays a streaming Dataset at |days|×|types| rows."""
    types = ["click", "view", "purchase", "signup", "error"]
    wide = events_daily_pivot(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.concat_tables([
            pa.table({"day": t.column("day"),
                      "event_type": pa.array([ty] * n, type=pa.string()),
                      "n_events": t.column(f"n_{ty}")})
            for ty in types])

    return wide.map_batches(melt, batch_format="pyarrow")


def events_mode_value(sf_dir: str) -> pd.DataFrame:
    """Exact per-type mode of value-in-cents (deterministic tiebreak:
    smallest value) via the distributed histogram (quantiles module)."""
    from ..functions.quantiles import grouped_mode

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "cents": _cents(t.column("value"))})

    return grouped_mode(ds.map_batches(to_cents, batch_format="pyarrow"),
                        "event_type", "cents")


def user_first_last_value(sf_dir: str) -> Dataset:
    """FIRST_VALUE / LAST_VALUE over the whole partition (SQL
    ``FIRST_VALUE(v) OVER (PARTITION BY user_id ORDER BY ts, event_id)``
    + the UNBOUNDED FOLLOWING LAST_VALUE), collapsed to one row per
    user. Same sort + run-reduction shape as ``user_sessions``: one
    global sort, per-block first/last per run, and the ≤2 edge runs per
    block re-reduced driver-side (O(blocks) rows, never O(users))."""
    import ray.data as rd

    from ..traverse import drop_empty_blocks as _deb

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def to_sortable(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("user_id"),
                         "ts": t.column("ts"),
                         "event_id": t.column("event_id"),
                         "cents": _cents(t.column("value"))})

    srt = ds.map_batches(to_sortable, batch_format="pyarrow").sort(
        ["user_id", "ts", "event_id"])

    out_schema = pa.schema([
        ("user_id", pa.int64()),
        ("first_value_cents", pa.int64()),
        ("last_value_cents", pa.int64()),
        ("first_ts", pa.timestamp("us")),
        ("first_eid", pa.int64()),
        ("edge", pa.bool_()),
    ])

    def block_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n)
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = edge[-1] = True  # runs touching a block boundary
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "first_value_cents": pa.array(cents[starts]),
            "last_value_cents": pa.array(cents[ends - 1]),
            "first_ts": pa.array(ts[starts]),
            "first_eid": pa.array(eid[starts]),
            "edge": pa.array(edge),
        }, schema=out_schema)

    partial = _deb(srt.map_batches(block_partial, batch_format="pyarrow"))

    def interior_fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("edge"), False))
        return t.select(["user_id", "first_value_cents",
                         "last_value_cents"])

    interior = partial.map_batches(interior_fn, batch_format="pyarrow")
    edge_df = partial.filter(expr="edge == True").to_pandas()
    if not len(edge_df):
        return interior
    # blocks may arrive out of order (preserve_order is off): a user's
    # partials cover disjoint contiguous slices of their sorted run, so
    # ordering by the run's first (ts, event_id) restores global order —
    # first = first partial's first, last = last partial's last
    edge_df = edge_df.sort_values(["user_id", "first_ts", "first_eid"],
                                  kind="stable")
    g = edge_df.groupby("user_id", sort=False)
    fixed = pa.table({
        "user_id": pa.array(g["user_id"].first().to_numpy()),
        "first_value_cents": pa.array(
            g["first_value_cents"].first().to_numpy().astype(np.int64)),
        "last_value_cents": pa.array(
            g["last_value_cents"].last().to_numpy().astype(np.int64)),
    })
    return interior.union(rd.from_arrow(fixed))


def events_value_stats(sf_dir: str) -> Dataset:
    """Grouped second moments — STDDEV_SAMP(value) and CORR(value,
    hour-of-day) per event_type — as ONE pass of exact integer partial
    sums (n, Σc, Σc², Σh, Σh², Σch in int64 cents) combined with a
    keys-sized groupby, the float stats derived at the END from the
    exact sums. Summing doubles block-by-block is order-dependent (and
    would flunk the hash gate); integer sums are associative, so the
    result is bit-identical to the oracle's mirrored expression.

    Overflow bound: Σc² ≤ rows·(10⁵)² — int64-safe to ~10¹⁴ rows per
    group at TPC-H-ish value magnitudes; a 100-TB deployment with
    larger values would widen the partials to float128/two-int64."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        h = pc.hour(t.column("ts")).to_numpy(zero_copy_only=False).astype(np.int64)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        denc = et.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False)
        k = len(denc.dictionary)
        def bsum(v):
            return pa.array(np.bincount(idx, weights=v, minlength=k)
                            .astype(np.int64))
        return pa.table({
            "event_type": denc.dictionary,
            "n": pa.array(np.bincount(idx, minlength=k).astype(np.int64)),
            "sx": bsum(c), "sxx": bsum(c * c),
            "sh": bsum(h), "shh": bsum(h * h), "sxh": bsum(c * h),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "event_type").aggregate(
        *[Sum(c, alias_name=c) for c in ("n", "sx", "sxx", "sh", "shh", "sxh")])

    def finish(t: pa.Table) -> pa.Table:
        # float expressions mirror the oracle SQL token-for-token: both
        # sides evaluate the SAME IEEE tree over the SAME exact inputs
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False).astype(np.float64)
        sh = t.column("sh").to_numpy(zero_copy_only=False).astype(np.float64)
        shh = t.column("shh").to_numpy(zero_copy_only=False).astype(np.float64)
        sxh = t.column("sxh").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_type": t.column("event_type"),
            "n_events": pc.cast(t.column("n"), pa.int64()),
            "sum_value_cents": pc.cast(t.column("sx"), pa.int64()),
            "stddev_cents": pa.array(
                np.sqrt((n * sxx - sx * sx) / (n * (n - 1)))),
            "corr_value_hour": pa.array(
                (n * sxh - sx * sh)
                / np.sqrt((n * sxx - sx * sx) * (n * shh - sh * sh))),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): subtotal rows per
    returnflag and a grand total, NULL levels rendered 'ALL'. ONE
    shuffle at the finest grain (the only one whose cardinality scales
    with data); the coarser levels re-aggregate the keys-sized finest
    result driver-side — rollup over an aggregate is itself additive,
    so no second pass over the fact table ever happens."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(1.0, t.column("l_discount")))
        return pa.table({"l_returnflag": t.column("l_returnflag"),
                         "l_linestatus": t.column("l_linestatus"),
                         "rev_c": _cents(rev)})

    finest = (ds.map_batches(prep, batch_format="pyarrow")
              .groupby(["l_returnflag", "l_linestatus"])
              .aggregate(Sum("rev_c", alias_name="revenue_cents"),
                         Count(alias_name="n_rows"))
              .to_pandas())  # keys-sized: |returnflag|×|linestatus| rows
    lvl1 = (finest.groupby("l_returnflag", as_index=False)
            [["revenue_cents", "n_rows"]].sum()
            .assign(l_linestatus="ALL"))
    lvl0 = pd.DataFrame({
        "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
        "revenue_cents": [finest["revenue_cents"].sum()],
        "n_rows": [finest["n_rows"].sum()],
    })
    out = pd.concat([finest, lvl1, lvl0], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "revenue_cents", "n_rows"]]
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"],
                           ignore_index=True)


def customers_with_orders(sf_dir: str, num_partitions: int = 4) -> Dataset:
    """Distributed SEMI join (the anti-join's sibling): customers that
    placed at least one order, orders pre-deduped per batch so the
    shuffle ships distinct keys. Dataset out, laundered like
    ``customers_without_orders``."""
    from ..traverse import drop_empty_blocks

    def local_distinct(t: pa.Table) -> pa.Table:
        keys = pd.unique(t.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({"o_custkey": pa.array(keys, type=pa.int64())})

    okeys = _t(sf_dir, "orders", ["o_custkey"]).map_batches(
        local_distinct, batch_format="pyarrow", batch_size=65536)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    out = cust.join(okeys, join_type="left_semi",
                    num_partitions=num_partitions,
                    on=("c_custkey",), right_on=("o_custkey",))
    out = out.map_batches(
        lambda t: t.select(["c_custkey", "c_name"]), batch_format="pyarrow")
    return drop_empty_blocks(out, pa.schema([("c_custkey", pa.int64()),
                                             ("c_name", pa.string())]))


def _epoch_week(ts_col) -> np.ndarray:
    """Epoch-week index (floor(epoch_days / 7), Thursday-anchored) —
    pure integer arithmetic so the SQL mirror (`epoch(ts)` division)
    can never diverge on week-start conventions."""
    days = ts_col.to_numpy(zero_copy_only=False).astype(
        "datetime64[D]").astype(np.int64)
    return days // 7


def user_weekly_retention(sf_dir: str, num_partitions: int = 4) -> Dataset:
    """Cohort retention: users grouped by their first-activity week,
    counted per week offset — the classic analytics pipeline shape:

    1. per-user cohort week: per-batch partial MIN(week), then a
       users-sized groupby Min;
    2. events ⋈ cohorts as a distributed hash join on user_id (the
       cohort table is user-sized — broadcastable at bench scale but
       user tables at 100 TB are fact-sized, so it stays a join);
    3. COUNT(DISTINCT user) per (cohort_week, week_offset): local
       distinct triples inside map_batches, then the two-stage
       distinct-count groupby (``distinct_users_by_type`` pattern).
    """
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def week_partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        wk = _epoch_week(t.column("ts"))
        df = pd.DataFrame({"user_id": uid, "w": wk})
        g = df.groupby("user_id", sort=False)["w"].min()
        return pa.table({"user_id": pa.array(g.index.to_numpy()),
                         "cohort_week": pa.array(g.to_numpy())})

    cohorts = (ds.map_batches(week_partial, batch_format="pyarrow")
               .groupby("user_id")
               .aggregate(Min("cohort_week", alias_name="cohort_week")))

    def to_weeks(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("user_id"),
                         "week": pa.array(_epoch_week(t.column("ts")))})

    from ..traverse import drop_empty_blocks as _deb

    # launder: received-nothing join partitions are schema-less empty
    # blocks that poison the downstream groupby partitioner
    joined = _deb(ds.map_batches(to_weeks, batch_format="pyarrow").join(
        cohorts, join_type="inner", num_partitions=num_partitions,
        on=("user_id",)))

    def local_triples(t: pa.Table) -> pa.Table:
        off = pc.subtract(t.column("week"), t.column("cohort_week"))
        trip = pa.table({"cohort_week": t.column("cohort_week"),
                         "week_offset": off,
                         "user_id": t.column("user_id")})
        return trip.group_by(["cohort_week", "week_offset", "user_id"],
                             use_threads=False).aggregate([])

    triples = joined.map_batches(local_triples, batch_format="pyarrow")
    return (triples.groupby(["cohort_week", "week_offset", "user_id"])
            .count()
            .map_batches(lambda t: t.select(
                ["cohort_week", "week_offset", "user_id"]),
                batch_format="pyarrow")
            .groupby(["cohort_week", "week_offset"]).count()
            .map_batches(lambda t: t.rename_columns(
                ["cohort_week", "week_offset", "n_users"]),
                batch_format="pyarrow"))


def events_value_zscore(sf_dir: str) -> Dataset:
    """Per-row feature normalization: z-score of value-in-cents within
    its event_type — the training-data feature-scaling op. Two passes:
    exact integer (n, Σc, Σc²) per type (keys-sized), broadcast to a
    streaming map. Float math mirrors the oracle token-for-token over
    the exact sums, so rows are bit-identical to SQL."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        c = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        denc = et.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False)
        k = len(denc.dictionary)
        return pa.table({
            "event_type": denc.dictionary,
            "n": pa.array(np.bincount(idx, minlength=k).astype(np.int64)),
            "sx": pa.array(np.bincount(idx, weights=c, minlength=k)
                           .astype(np.int64)),
            "sxx": pa.array(np.bincount(idx, weights=c * c, minlength=k)
                            .astype(np.int64)),
        })

    stats = (ds.map_batches(moments, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sx", alias_name="sx"),
                        Sum("sxx", alias_name="sxx"))
             .to_pandas())  # keys-sized
    lut = {row.event_type: (float(row.n), float(row.sx), float(row.sxx))
           for row in stats.itertuples()}

    def z(t: pa.Table) -> pa.Table:
        c = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        n = np.empty(len(c)); sx = np.empty(len(c)); sxx = np.empty(len(c))
        for ty, (tn, tsx, tsxx) in lut.items():
            m = et == ty
            n[m], sx[m], sxx[m] = tn, tsx, tsxx
        zs = ((c.astype(np.float64) - sx / n)
              / np.sqrt((n * sxx - sx * sx) / (n * (n - 1))))
        return pa.table({"event_id": t.column("event_id"),
                         "value_z": pa.array(zs)})

    return ds.map_batches(z, batch_format="pyarrow")


def revenue_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(l_returnflag, l_linestatus): the full lattice —
    finest + both one-dimension subtotals + grand total, all derived
    from ONE finest-grain shuffle (cube over an additive aggregate
    re-aggregates the keys-sized finest result)."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(1.0, t.column("l_discount")))
        return pa.table({"l_returnflag": t.column("l_returnflag"),
                         "l_linestatus": t.column("l_linestatus"),
                         "rev_c": _cents(rev)})

    finest = (ds.map_batches(prep, batch_format="pyarrow")
              .groupby(["l_returnflag", "l_linestatus"])
              .aggregate(Sum("rev_c", alias_name="revenue_cents"),
                         Count(alias_name="n_rows"))
              .to_pandas())
    by_rf = (finest.groupby("l_returnflag", as_index=False)
             [["revenue_cents", "n_rows"]].sum().assign(l_linestatus="ALL"))
    by_ls = (finest.groupby("l_linestatus", as_index=False)
             [["revenue_cents", "n_rows"]].sum().assign(l_returnflag="ALL"))
    total = pd.DataFrame({
        "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
        "revenue_cents": [finest["revenue_cents"].sum()],
        "n_rows": [finest["n_rows"].sum()],
    })
    out = pd.concat([finest, by_rf, by_ls, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "revenue_cents", "n_rows"]]
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"],
                           ignore_index=True)


def _reaggregate_grouping_sets(finest: pd.DataFrame, key_cols: list,
                               sets: tuple, measure_cols: list
                               ) -> pd.DataFrame:
    """Generalized GROUPING SETS re-aggregation: ``finest`` is the
    keys-sized aggregate at the union-of-all-keys grain (the ONE
    shuffle whose cardinality scales with data); each requested set is
    an additive driver-side re-sum of it, aggregated-out key levels
    rendered 'ALL'. ROLLUP and CUBE are the two special cases of this
    (`revenue_rollup` / `revenue_cube` above); this takes arbitrary
    key subsets, so e.g. ((a,b),(a,c),(c,),()) needs no second pass
    over the fact table either."""
    frames = []
    for s in sets:
        keep = [c for c in key_cols if c in s]
        if keep:
            g = finest.groupby(keep, as_index=False)[measure_cols].sum()
        else:
            g = pd.DataFrame([finest[measure_cols].sum()])
        for c in key_cols:
            if c not in s:
                g[c] = "ALL"
        frames.append(g[key_cols + measure_cols])
    out = pd.concat(frames, ignore_index=True)
    for c in measure_cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(key_cols, ignore_index=True)


def revenue_grouping_sets(sf_dir: str) -> pd.DataFrame:
    """GROUP BY GROUPING SETS ((returnflag, linestatus),
    (returnflag, ship_year), (ship_year), ()): arbitrary-subset
    grouping lattice — the generalization ROLLUP/CUBE can't express
    (mixes two dimension pairs that are not nested). One finest-grain
    shuffle at (returnflag, linestatus, ship_year); every set is an
    additive re-aggregation of that keys-sized result."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_shipdate",
             "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(1.0, t.column("l_discount")))
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "ship_year": pc.cast(pc.year(t.column("l_shipdate")),
                                 pa.int64()),
            "rev_c": _cents(rev)})

    finest = (ds.map_batches(prep, batch_format="pyarrow")
              .groupby(["l_returnflag", "l_linestatus", "ship_year"])
              .aggregate(Sum("rev_c", alias_name="revenue_cents"),
                         Count(alias_name="n_rows"))
              .to_pandas())  # |rf|×|ls|×|years| rows — keys-sized
    finest["ship_year"] = finest["ship_year"].astype(np.int64).astype(str)
    return _reaggregate_grouping_sets(
        finest, ["l_returnflag", "l_linestatus", "ship_year"],
        (("l_returnflag", "l_linestatus"),
         ("l_returnflag", "ship_year"),
         ("ship_year",),
         ()),
        ["revenue_cents", "n_rows"])


def user_value_autocorr(sf_dir: str,
                        num_partitions: int = 4) -> pd.DataFrame:
    """Per-user lag-1 autocorrelation of value — the temporal-drift
    detector (is a user's spend momentum-driven or i.i.d.?): null-
    defaulted LAG pairs from the distributed lag machinery (null = no
    predecessor, unambiguous for any value range), then Pearson corr
    over the
    (prev, current) pairs from exact integer sum partials with the
    mirrored IEEE tree (events_hour_value_corr convention). Users
    whose pair count or variance is degenerate are filtered by the
    INTEGER conditions n*Sxx > Sx^2 and n*Syy > Sy^2 — exact on both
    sides, so no NaN ever reaches the hash."""
    from ..functions.window import lag_lead

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "c": _cents(t.column("value"))})

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    lagged = lag_lead(prepped, group_col="user_id",
                      order_cols=["ts", "event_id"], value_col="c",
                      offset=1, kind="lag", id_col="event_id",
                      default=None, out_col="prev")
    joined = prepped.join(lagged, join_type="inner",
                          num_partitions=num_partitions,
                          on=("event_id",))

    def partial(t: pa.Table) -> pa.Table:
        # null = no predecessor (a genuine -1-cent value must survive)
        t = t.filter(pc.is_valid(t.column("prev")))
        x = pc.cast(t.column("prev"), pa.int64())
        y = t.column("c")
        part = pa.table({
            "user_id": t.column("user_id"),
            "x": x, "y": y,
            "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y),
        }).group_by("user_id").aggregate(
            [("x", "sum"), ("y", "sum"), ("xx", "sum"),
             ("yy", "sum"), ("xy", "sum"), ("x", "count")])
        return pa.table({
            "user_id": part.column("user_id"),
            "sx": part.column("x_sum"), "sy": part.column("y_sum"),
            "sxx": part.column("xx_sum"), "syy": part.column("yy_sum"),
            "sxy": part.column("xy_sum"),
            "n": pc.cast(part.column("x_count"), pa.int64())})

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "user_id").aggregate(Sum("sx"), Sum("sy"), Sum("sxx"),
                             Sum("syy"), Sum("sxy"),
                             Sum("n")).to_pandas()
    n = agg["sum(n)"].to_numpy()
    sx = agg["sum(sx)"].to_numpy()
    sy = agg["sum(sy)"].to_numpy()
    sxx = agg["sum(sxx)"].to_numpy()
    syy = agg["sum(syy)"].to_numpy()
    sxy = agg["sum(sxy)"].to_numpy()
    ok = (n * sxx > sx * sx) & (n * syy > sy * sy)
    nf, sxf, syf = (a[ok].astype(np.float64) for a in (n, sx, sy))
    sxxf, syyf, sxyf = (a[ok].astype(np.float64)
                        for a in (sxx, syy, sxy))
    ac = (nf * sxyf - sxf * syf) / (np.sqrt(nf * sxxf - sxf * sxf)
                                    * np.sqrt(nf * syyf - syf * syf))
    return pd.DataFrame({"user_id": agg["user_id"][ok],
                         "autocorr": ac}).sort_values(
        "user_id").reset_index(drop=True)


def events_value_decile_stats(sf_dir: str, buckets: int = 10) -> Dataset:
    """Equi-DEPTH histogram (decile edges + per-bucket exact stats)
    over value cents — the complement of events_value_histogram's
    equi-width bins and the table a range-partitioner or quantile
    normalizer is built from. Rank-based bucketing (NTILE semantics
    via ``buckets*(rn-1)//n``) keeps everything integer: one global
    range-partitioned sort + row_number, then a buckets-sized integer
    groupby — hash-exact vs the SQL oracle."""
    from ..functions.window import row_number

    ds = _t(sf_dir, "events", ["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "c": _cents(t.column("value"))})

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    n = prepped.count()
    rn = row_number(prepped, group_col="one",
                    order_cols=["c", "event_id"], id_col="event_id",
                    out_col="rn")
    joined = prepped.join(rn, join_type="inner", num_partitions=4,
                          on=("event_id",))

    def partial(t: pa.Table) -> pa.Table:
        b = pc.divide(pc.multiply(
            pc.subtract(pc.cast(t.column("rn"), pa.int64()), 1),
            buckets), n)
        part = pa.table({"bucket": b, "c": t.column("c")}).group_by(
            "bucket").aggregate([("c", "min"), ("c", "max"),
                                 ("c", "sum"), ("c", "count")])
        return pa.table({
            "bucket": part.column("bucket"),
            "lo": part.column("c_min"), "hi": part.column("c_max"),
            "s": pc.cast(part.column("c_sum"), pa.int64()),
            "n": pc.cast(part.column("c_count"), pa.int64())})

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "bucket").aggregate(Min("lo"), Max("hi"), Sum("s"), Sum("n"))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": t.column("bucket"),
            "lo_c": pc.cast(t.column("min(lo)"), pa.int64()),
            "hi_c": pc.cast(t.column("max(hi)"), pa.int64()),
            "sum_c": pc.cast(t.column("sum(s)"), pa.int64()),
            "n_events": pc.cast(t.column("sum(n)"), pa.int64())})

    return agg.map_batches(final, batch_format="pyarrow")


def cohort_value_triangle(sf_dir: str,
                          num_partitions: int = 4) -> Dataset:
    """Cohort LTV triangle: exact integer value per (first-activity
    week, week offset) — user_weekly_retention's measure-carrying
    sibling (how much each weekly cohort SPENDS as it ages, the table
    an LTV model trains on). Same plan shape: per-batch MIN(week)
    partials -> users-sized cohort groupby -> one distributed hash
    join -> (cohort, offset)-keyed integer-sum groupby with block-local
    Arrow pre-aggregation."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def week_partial(t: pa.Table) -> pa.Table:
        part = pa.table({
            "user_id": t.column("user_id"),
            "w": pa.array(_epoch_week(t.column("ts"))),
        }).group_by("user_id", use_threads=False).aggregate(
            [("w", "min")])
        return pa.table({"user_id": part.column("user_id"),
                         "cohort_week": part.column("w_min")})

    cohorts = (ds.map_batches(week_partial, batch_format="pyarrow")
               .groupby("user_id")
               .aggregate(Min("cohort_week", alias_name="cohort_week")))

    def to_weeks(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("user_id"),
                         "week": pa.array(_epoch_week(t.column("ts"))),
                         "c": _cents(t.column("value"))})

    from ..traverse import drop_empty_blocks as _deb

    joined = _deb(ds.map_batches(to_weeks, batch_format="pyarrow").join(
        cohorts, join_type="inner", num_partitions=num_partitions,
        on=("user_id",)))

    def local_sum(t: pa.Table) -> pa.Table:
        part = pa.table({
            "cohort_week": t.column("cohort_week"),
            "week_offset": pc.subtract(t.column("week"),
                                       t.column("cohort_week")),
            "c": t.column("c"),
        }).group_by(["cohort_week", "week_offset"],
                    use_threads=False).aggregate(
            [("c", "sum"), ("c", "count")])
        return pa.table({
            "cohort_week": part.column("cohort_week"),
            "week_offset": part.column("week_offset"),
            "sc": pc.cast(part.column("c_sum"), pa.int64()),
            "n": pc.cast(part.column("c_count"), pa.int64())})

    agg = (joined.map_batches(local_sum, batch_format="pyarrow")
           .groupby(["cohort_week", "week_offset"])
           .aggregate(Sum("sc"), Sum("n")))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_week": t.column("cohort_week"),
            "week_offset": t.column("week_offset"),
            "value_cents": pc.cast(t.column("sum(sc)"), pa.int64()),
            "n_events": pc.cast(t.column("sum(n)"), pa.int64())})

    return agg.map_batches(final, batch_format="pyarrow")


def events_value_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of value per event type — the inequality/
    concentration profile of a measure column (is revenue spread
    evenly or does a tail of whale events carry it?). Computed from
    integer sufficient statistics via the sorted-rank identity
    G = 2*Sum(i*x_(i))/(n*Sum(x)) - (n+1)/n: one distributed
    row_number over (c, event_id), one groupby of int64 partials, and
    a mirrored IEEE division tree — hash-exact vs the SQL oracle.
    Rank ties over equal c permute equal x values, so Sum(i*x) is
    tie-order invariant. Scale bound: n*Sum(c) must fit int64
    (~10^9 rows/type at c~10^5) — the corr/trend-stats convention."""
    from ..functions.window import row_number

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "c": _cents(t.column("value"))})

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    rn = row_number(prepped, group_col="event_type",
                    order_cols=["c", "event_id"], id_col="event_id",
                    out_col="rn")
    joined = prepped.join(rn, join_type="inner", num_partitions=4,
                          on=("event_id",))

    def partial(t: pa.Table) -> pa.Table:
        part = pa.table({
            "event_type": t.column("event_type"),
            "c": t.column("c"),
            "rc": pc.multiply(pc.cast(t.column("rn"), pa.int64()),
                              t.column("c")),
        }).group_by("event_type").aggregate(
            [("c", "sum"), ("rc", "sum"), ("c", "count")])
        return pa.table({
            "event_type": part.column("event_type"),
            "s": part.column("c_sum"), "sr": part.column("rc_sum"),
            "n": pc.cast(part.column("c_count"), pa.int64())})

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "event_type").aggregate(Sum("s"), Sum("sr"),
                                Sum("n")).to_pandas()
    n = agg["sum(n)"].to_numpy()
    s = agg["sum(s)"].to_numpy()
    sr = agg["sum(sr)"].to_numpy()
    # mirrored tree: (2.0*sr)/double(n*s) - double(n+1)/double(n)
    gini = ((2.0 * sr.astype(np.float64)) / (n * s).astype(np.float64)
            - (n + 1).astype(np.float64) / n.astype(np.float64))
    return pd.DataFrame({"event_type": agg["event_type"],
                         "gini": gini}).sort_values(
        "event_type").reset_index(drop=True)


def kg_rel_pagerank(sf_dir: str, iters: int = 3) -> Dataset:
    """Fixed-point integer PageRank over the relational KG edge table
    (the kg_rel_triples containment graph) — graph centrality as a
    first-class distributed operator (functions/pagerank.py), with a
    FULL unrolled-CTE SQL oracle because every step is int64."""
    from ..functions.pagerank import pagerank_fixed

    edges = kg_rel_triples(sf_dir).map_batches(
        lambda t: t.select(["subj", "obj"]), batch_format="pyarrow")
    return pagerank_fixed(edges, src_col="subj", dst_col="obj",
                          iters=iters)


def kg_rel_ppr(sf_dir: str, iters: int = 3) -> Dataset:
    """Personalized PageRank seeded at the region roots of the
    relational KG — "relevance from these entry points" (the
    recommendation flavor of centrality; the reference's seeded
    neighbor expansion in `react_tools.py` asks the same question one
    hop at a time). Same all-int64 fixed-point spec as
    kg_rel_pagerank, so the unrolled-CTE oracle stays hash-exact."""
    from ..functions.pagerank import personalized_pagerank_fixed

    edges = kg_rel_triples(sf_dir).map_batches(
        lambda t: t.select(["subj", "obj"]), batch_format="pyarrow")
    seeds = _t(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: pa.table({"node": pc.cast(t.column("r_name"),
                                            pa.string())}),
        batch_format="pyarrow")
    return personalized_pagerank_fixed(edges, seeds, src_col="subj",
                                       dst_col="obj", iters=iters)


def _distinct_users_of(sf_dir: str, event_type: str) -> Dataset:
    """Globally distinct user_ids having an event of the given type:
    per-batch local dedup, then one keys-sized groupby."""
    from ..traverse import drop_empty_blocks

    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def local(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), event_type))
        keys = pd.unique(t.column("user_id").to_numpy(zero_copy_only=False))
        return pa.table({"user_id": pa.array(keys, type=pa.int64())})

    return drop_empty_blocks(
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("user_id").count()
        .map_batches(lambda t: t.select(["user_id"]),
                     batch_format="pyarrow"),
        pa.schema([("user_id", pa.int64())]))


def users_click_and_purchase(sf_dir: str, num_partitions: int = 2
                             ) -> Dataset:
    """Set INTERSECT as distributed distinct + SEMI join (both sides
    pre-deduped, so the shuffle ships user sets, not event streams)."""
    from ..traverse import drop_empty_blocks

    clicks = _distinct_users_of(sf_dir, "click")
    purch = _distinct_users_of(sf_dir, "purchase").map_batches(
        lambda t: t.rename_columns(["p_user"]), batch_format="pyarrow")
    out = clicks.join(purch, join_type="left_semi",
                      num_partitions=num_partitions,
                      on=("user_id",), right_on=("p_user",))
    return drop_empty_blocks(out, pa.schema([("user_id", pa.int64())]))


def users_click_not_purchase(sf_dir: str, num_partitions: int = 2
                             ) -> Dataset:
    """Set EXCEPT as distributed distinct + ANTI join."""
    from ..traverse import drop_empty_blocks

    clicks = _distinct_users_of(sf_dir, "click")
    purch = _distinct_users_of(sf_dir, "purchase").map_batches(
        lambda t: t.rename_columns(["p_user"]), batch_format="pyarrow")
    out = clicks.join(purch, join_type="left_anti",
                      num_partitions=num_partitions,
                      on=("user_id",), right_on=("p_user",))
    return drop_empty_blocks(out, pa.schema([("user_id", pa.int64())]))


def events_value_mad(sf_dir: str) -> pd.DataFrame:
    """Grouped robust statistics: median and median-absolute-deviation
    of value-in-cents per event_type, composed from TWO passes of the
    exact distributed value histogram (functions/quantiles.py): pass 1
    finds the median, which broadcasts (keys-sized) into the absolute-
    deviation map, pass 2 takes the median of |c - med|."""
    from ..functions.quantiles import grouped_exact_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "cents": _cents(t.column("value"))})

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    med = grouped_exact_quantiles(cents, "event_type", "cents",
                                  [(1, 2, "median_cents")])
    lut = dict(zip(med["event_type"], med["median_cents"].astype(np.int64)))

    def absdev(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        m = np.empty(len(c), dtype=np.int64)
        for ty, tm in lut.items():
            m[et == ty] = tm
        return pa.table({"event_type": t.column("event_type"),
                         "absdev": pa.array(np.abs(c - m))})

    mad = grouped_exact_quantiles(cents.map_batches(absdev,
                                                    batch_format="pyarrow"),
                                  "event_type", "absdev",
                                  [(1, 2, "mad_cents")])
    out = med.merge(mad, on="event_type")
    out["median_cents"] = out["median_cents"].astype(np.int64)
    out["mad_cents"] = out["mad_cents"].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


def events_in_windows_dist(sf_dir: str, num_partitions: int = 4) -> Dataset:
    """The DISTRIBUTED range join (events_in_windows' scale path for
    when the interval side outgrows a broadcast): both sides bucket by
    day — intervals replicate into every bucket they overlap (factor 1
    here; a flat-map in general) — then a bucket-hash join + residual
    bound filter. Shares events_in_windows' oracle: same output."""
    from ..traverse import drop_empty_blocks

    ev = _t(sf_dir, "events", ["event_id", "ts", "event_type"])
    bounds = _parquet_column_bounds(f"{sf_dir}/events.parquet", "ts")
    if bounds is None:
        bounds = (ev.min("ts"), ev.max("ts"))
    lo = pd.Timestamp(bounds[0]).normalize()
    hi = pd.Timestamp(bounds[1]).normalize()
    days = pd.date_range(lo, hi, freq="D")
    wtab = pa.table({
        "bucket": pa.array(days.to_numpy().astype("datetime64[D]")
                           .astype(np.int64)),
        # timestamp[us]: match the events ts unit (and the oracle's)
        "window_start": pa.array((days + pd.Timedelta(hours=2)).to_numpy()
                                 .astype("datetime64[us]")),
        "window_end": pa.array((days + pd.Timedelta(hours=3)).to_numpy()
                               .astype("datetime64[us]")),
    })
    wds = rd.from_arrow(wtab)

    def with_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("ts").to_numpy(zero_copy_only=False)
             .astype("datetime64[D]").astype(np.int64))
        return t.append_column("bucket", pa.array(b))

    joined = ev.map_batches(with_bucket, batch_format="pyarrow").join(
        wds, join_type="inner", num_partitions=num_partitions,
        on=("bucket",))

    def in_bounds(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        ok = pc.and_(pc.greater_equal(ts, t.column("window_start")),
                     pc.less(ts, t.column("window_end")))
        return t.filter(ok).select(
            ["event_id", "ts", "event_type", "window_start"])

    out = joined.map_batches(in_bounds, batch_format="pyarrow")
    return drop_empty_blocks(out, pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("event_type", pa.string()), ("window_start", pa.timestamp("us")),
    ]))


def _user_range_minmax(sf_dir: str, agg: str, out_col: str) -> Dataset:
    from ..functions.window import rolling_range_agg

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value")),
        })

    return rolling_range_agg(ds.map_batches(prep, batch_format="pyarrow"),
                             group_col="user_id", ts_col="ts",
                             value_col="value_c",
                             delta=30 * 60 * 1_000_000,
                             id_col="event_id", agg=agg, out_col=out_col)


def user_range_min_30m(sf_dir: str) -> Dataset:
    """RANGE-frame rolling MIN (time window): the variable-width frame
    has no cumsum shortcut — served by the sparse-table RMQ kernel
    (functions/window.py::_rmq)."""
    return _user_range_minmax(sf_dir, "min", "range_min_cents")


def user_range_max_30m(sf_dir: str) -> Dataset:
    """RANGE-frame rolling MAX — see user_range_min_30m."""
    return _user_range_minmax(sf_dir, "max", "range_max_cents")


def user_range_avg_30m(sf_dir: str) -> Dataset:
    """RANGE-frame rolling AVG (time window): the exact int64 cumsum
    window divided by the frame count ONCE — bit-identical to DuckDB's
    integer AVG (same rule as the ROWS-frame ``user_rolling_mean``)."""
    return _user_range_minmax(sf_dir, "mean", "range_avg_cents")


def event_type_cooccurrence(sf_dir: str, num_partitions: int = 2
                            ) -> Dataset:
    """Market-basket co-occurrence: for every unordered event-type pair,
    how many users produced BOTH (plus each type's own user count, so
    lift/confidence are one division away — kept integer for the hash
    gate). Shape: distinct (user, type) via groupby, a user-keyed
    self-join for the pairs, and the types-sized count dict stamped on
    in the final map; the distinct table is |users|·|types| rows and
    the wide ops stay user-key-partitioned, so the op survives any user
    cardinality (type cardinality is the small side by construction)."""
    from ..traverse import drop_empty_blocks

    ev = _t(sf_dir, "events", ["user_id", "event_type"])
    ut = drop_empty_blocks(
        ev.groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="_c")),
        pa.schema([("user_id", pa.int64()), ("event_type", pa.string()),
                   ("_c", pa.int64())])
    ).select_columns(["user_id", "event_type"])
    # per-type user counts are |event types|-sized BY CONSTRUCTION (the
    # domain of the pairing key, not of users) — a driver dict, not a
    # join side; the user-keyed self-join below is the only wide op
    per_df = (ut.groupby("event_type")
              .aggregate(Count(alias_name="n_users")).to_pandas())
    n_of = dict(zip(per_df["event_type"],
                    per_df["n_users"].astype(np.int64)))
    right = ut.map_batches(
        lambda t: pa.table({"user2": t.column("user_id"),
                            "type_b": t.column("event_type")}),
        batch_format="pyarrow")
    pairs = drop_empty_blocks(ut.join(
        right, join_type="inner", num_partitions=num_partitions,
        on=("user_id",), right_on=("user2",)))

    def ordered(t: pa.Table) -> pa.Table:
        keep = pc.less(t.column("event_type"), t.column("type_b"))
        t = t.filter(keep)
        return pa.table({"type_a": t.column("event_type"),
                         "type_b": t.column("type_b")})

    both = (pairs.map_batches(ordered, batch_format="pyarrow")
            .groupby(["type_a", "type_b"])
            .aggregate(Count(alias_name="n_both")))

    def final(t: pa.Table) -> pa.Table:
        ta = t.column("type_a").to_numpy(zero_copy_only=False)
        tb = t.column("type_b").to_numpy(zero_copy_only=False)
        return pa.table({
            "type_a": t.column("type_a"),
            "type_b": t.column("type_b"),
            "n_both": pc.cast(t.column("n_both"), pa.int64()),
            "n_a": pa.array([n_of[x] for x in ta], type=pa.int64()),
            "n_b": pa.array([n_of[x] for x in tb], type=pa.int64())})

    return drop_empty_blocks(
        both.map_batches(final, batch_format="pyarrow"),
        pa.schema([("type_a", pa.string()), ("type_b", pa.string()),
                   ("n_both", pa.int64()), ("n_a", pa.int64()),
                   ("n_b", pa.int64())]))


def user_value_trend_stats(sf_dir: str) -> Dataset:
    """Grouped OLS sufficient statistics — the distributed-regression
    shape: per user, exact-int64 (n, Σx, Σy, Σxy, Σx², Σy²) with
    x = HOURS since the user's first event (hour-bucket rebased) and
    y = cents. Slope / intercept / correlation are pure post-processing
    of these six integers, so the heavy pass is ONE map-side partial +
    one small groupby (no float accumulation, no second pass) and the
    result hash-matches SQL.

    Overflow discipline: the map-side partial accumulates x relative to
    a global epoch, which at second resolution wraps int64 for a user
    with a few thousand events a year out (x ~ 3e7, x² ~ 1e15).
    Hour buckets bound the *intermediate* Σx² at n·x_max² — safe up to
    ~1e7 events/user even at a 100-year span — and the per-user rebase
    to min(x) (an extra Min in the same groupby + an exact integer
    shift: Σx' = Σx − n·m, Σx'y = Σxy − m·Σy,
    Σx'² = Σx² − 2mΣx + nm²) keeps the *reported* stats small without a
    second shuffle."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])
    base_us = pd.Timestamp("2024-01-01").value // 1_000

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        x = (us - base_us) // 3_600_000_000  # hour buckets
        y = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t.column("user_id"),
            "n": pa.array(np.ones(len(x), dtype=np.int64)),
            "min_x": pa.array(x),
            "sum_x": pa.array(x),
            "sum_y": pa.array(y),
            "sum_xy": pa.array(x * y),
            "sum_x2": pa.array(x * x),
            "sum_y2": pa.array(y * y)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Sum("n", alias_name="n"),
                      Min("min_x", alias_name="min_x"),
                      Sum("sum_x", alias_name="sum_x"),
                      Sum("sum_y", alias_name="sum_y"),
                      Sum("sum_xy", alias_name="sum_xy"),
                      Sum("sum_x2", alias_name="sum_x2"),
                      Sum("sum_y2", alias_name="sum_y2")))

    def shift(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n"), pa.int64()).to_numpy(
            zero_copy_only=False)
        m = pc.cast(t.column("min_x"), pa.int64()).to_numpy(
            zero_copy_only=False)
        sx = pc.cast(t.column("sum_x"), pa.int64()).to_numpy(
            zero_copy_only=False)
        sy = pc.cast(t.column("sum_y"), pa.int64()).to_numpy(
            zero_copy_only=False)
        sxy = pc.cast(t.column("sum_xy"), pa.int64()).to_numpy(
            zero_copy_only=False)
        sx2 = pc.cast(t.column("sum_x2"), pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id": t.column("user_id"),
            "n": pa.array(n),
            "sum_x": pa.array(sx - n * m),
            "sum_y": pa.array(sy),
            "sum_xy": pa.array(sxy - m * sy),
            "sum_x2": pa.array(sx2 - 2 * m * sx + n * m * m),
            "sum_y2": pc.cast(t.column("sum_y2"), pa.int64())})

    return agg.map_batches(shift, batch_format="pyarrow")


def fuzzy_name_pairs(sf_dir: str) -> Dataset:
    """Fuzzy record linkage: every pair of distinct customer names at
    Levenshtein distance exactly 1, via the deletion-neighborhood
    blocking join (functions/fuzzyjoin.py — complete for distance 1,
    bucket sizes bounded by construction, exact vectorized one-edit
    verify)."""
    from ..functions.fuzzyjoin import lev1_name_pairs

    return lev1_name_pairs(_t(sf_dir, "customer", ["c_name"]),
                           name_col="c_name")


def users_pareto_front(sf_dir: str) -> Dataset:
    """Multi-criteria top set: users not dominated on (total spend,
    event count) — the 2-D skyline. One distributed groupby builds the
    per-user profile table; the two-phase skyline
    (functions/skyline.py) prunes each block to its local frontier
    before the tiny global merge."""
    from ..functions.skyline import pareto_front_2d
    from ..traverse import drop_empty_blocks

    ds = _t(sf_dir, "events", ["user_id", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("user_id"),
                         "cents": _cents(t.column("value"))})

    agg = (ds.map_batches(to_cents, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Sum("cents", alias_name="spend_cents"),
                      Count(alias_name="n_events")))

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "spend_cents": pc.cast(t.column("spend_cents"), pa.int64()),
            "n_events": pc.cast(t.column("n_events"), pa.int64())})

    prof = drop_empty_blocks(agg.map_batches(norm, batch_format="pyarrow"))
    return pareto_front_2d(prof, x_col="spend_cents", y_col="n_events")


def events_value_outliers(sf_dir: str) -> Dataset:
    """Robust per-row outlier flags: |cents - median(type)| >
    3·MAD(type), computed entirely in exact integers so the flag is
    bit-stable against the SQL oracle (no float tolerance games).
    Composes the two grouped exact-histogram passes of
    ``events_value_mad`` and broadcasts the keys-sized (|event types|)
    threshold table into a final vectorized flag map — the
    anomaly-detection shape: robust stats pass, then a streaming
    scoring pass that never re-shuffles the fact table."""
    from ..functions.quantiles import grouped_exact_quantiles

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "cents": _cents(t.column("value"))})

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    med = grouped_exact_quantiles(cents, "event_type", "cents",
                                  [(1, 2, "med")])
    med_lut = dict(zip(med["event_type"], med["med"].astype(np.int64)))

    def absdev(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        m = np.empty(len(c), dtype=np.int64)
        for ty, tm in med_lut.items():
            m[et == ty] = tm
        return pa.table({"event_type": t.column("event_type"),
                         "absdev": pa.array(np.abs(c - m))})

    mad = grouped_exact_quantiles(
        cents.map_batches(absdev, batch_format="pyarrow"),
        "event_type", "absdev", [(1, 2, "mad")])
    mad_lut = dict(zip(mad["event_type"], mad["mad"].astype(np.int64)))

    def flag(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        m = np.empty(len(c), dtype=np.int64)
        s = np.empty(len(c), dtype=np.int64)
        for ty in med_lut:
            sel = et == ty
            m[sel] = med_lut[ty]
            s[sel] = mad_lut[ty]
        out = (np.abs(c - m) > 3 * s).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "is_outlier": pa.array(out)})

    return cents.map_batches(flag, batch_format="pyarrow")


def user_funnel_stages(sf_dir: str, num_partitions: int = 2) -> pd.DataFrame:
    """Ordered conversion funnel (view → click → purchase): stage k+1
    counts users whose earliest stage-k+1 event is STRICTLY AFTER their
    earliest qualifying stage-k event — the standard product-analytics
    funnel. Each stage is one distributed filter + groupby-MIN plus one
    hash join against the previous stage's (user, ts) table; nothing is
    broadcast (stage tables are |users|-sized and stay distributed), so
    the funnel holds at any user cardinality. Output is 3 rows."""
    from ..traverse import drop_empty_blocks

    ev = _t(sf_dir, "events", ["user_id", "ts", "event_type"])

    def first_of(etype: str, ds: Dataset, ts_out: str) -> Dataset:
        return drop_empty_blocks(
            ds.filter(expr=f"event_type == '{etype}'")
            .groupby("user_id").aggregate(Min("ts", alias_name=ts_out)))

    def after(prev: Dataset, prev_ts: str, etype: str,
              ts_out: str) -> Dataset | None:
        # Ray 2.49's hash join crashes ("No match for key field" in the
        # shuffle aggregator) when either side is entirely empty, and a
        # corpus can legitimately have zero events of a stage's type (or
        # zero users surviving the previous stage). Probe both sides —
        # metadata-only counts on the already-materialized datasets —
        # and short-circuit the stage to None (n_users = 0).
        stage_ev = drop_empty_blocks(
            ev.filter(expr=f"event_type == '{etype}'"))
        if stage_ev.count() == 0:
            return None
        joined = stage_ev.join(
            prev.select_columns(["user_id", prev_ts]), join_type="inner",
            num_partitions=num_partitions, on=("user_id",))

        def strictly_after(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater(t.column("ts"), t.column(prev_ts)))

        out = drop_empty_blocks(
            joined.map_batches(strictly_after, batch_format="pyarrow")
            .groupby("user_id").aggregate(Min("ts", alias_name=ts_out)))
        return out if out.count() > 0 else None

    t1 = first_of("view", ev, "ts1")
    n1 = t1.count()
    t2 = after(t1, "ts1", "click", "ts2") if n1 else None
    n2 = t2.count() if t2 is not None else 0
    t3 = after(t2, "ts2", "purchase", "ts3") if n2 else None
    n3 = t3.count() if t3 is not None else 0
    return pd.DataFrame({
        "stage": ["1_view", "2_click_after_view", "3_purchase_after_click"],
        "n_users": np.array([n1, n2, n3], dtype=np.int64),
    })


def user_range_distinct_30m(sf_dir: str) -> Dataset:
    """RANGE-frame windowed COUNT DISTINCT: how many distinct event
    types each user produced in the 30 minutes up to each event — the
    burst-diversity / rate-limit-by-kind shape. Served by the shared
    RANGE boundary protocol with the chunked per-code prefix-sum kernel
    (functions/window.py::_window_ndistinct); event_type is the
    low-cardinality categorical the kernel is designed for."""
    from ..functions.window import rolling_range_agg

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return rolling_range_agg(ds, group_col="user_id", ts_col="ts",
                             value_col="event_type",
                             delta=30 * 60 * 1_000_000,
                             id_col="event_id", agg="ndistinct",
                             out_col="range_ndistinct_types")


def user_value_cume_dist(sf_dir: str) -> Dataset:
    """CUME_DIST per user over value-in-cents — completes the ranking
    family (ROW_NUMBER/RANK/DENSE_RANK/NTILE/PERCENT_RANK): descending
    rank over negated cents + a group-size join (functions/window.py::
    cume_dist)."""
    from ..functions.window import cume_dist

    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "cents": _cents(t.column("value"))})

    return cume_dist(ds.map_batches(prep, batch_format="pyarrow"),
                     group_col="user_id", order_cols=["cents"],
                     id_col="event_id", out_col="value_cume_dist")


def events_value_histogram(sf_dir: str, bucket_c: int = 500) -> Dataset:
    """Fixed-width binning (width_bucket semantics): $5 buckets over
    value-in-cents with per-bucket count and exact integer sum — the
    histogram/profiling operator a data-quality sweep runs before
    choosing thresholds. One block-local Arrow pre-aggregate then a
    tiny groupby (bucket cardinality is bounded by the value range, so
    the shuffle moves O(buckets x blocks) rows, never the events)."""
    ds = _t(sf_dir, "events", ["value"])

    def prep(t: pa.Table) -> pa.Table:
        c = _cents(t.column("value"))
        bucket = pc.divide(c, bucket_c)  # ints >= 0: trunc == floor
        part = pa.table({"bucket": bucket, "c": c}).group_by(
            "bucket").aggregate([("c", "sum"), ("c", "count")])
        return pa.table({
            "bucket": part.column("bucket"),
            "sum_c": pc.cast(part.column("c_sum"), pa.int64()),
            "n": pc.cast(part.column("c_count"), pa.int64())})

    agg = ds.map_batches(prep, batch_format="pyarrow").groupby(
        "bucket").aggregate(Sum("sum_c"), Sum("n"))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": t.column("bucket"),
            "n_events": pc.cast(t.column("sum(n)"), pa.int64()),
            "sum_value_c": pc.cast(t.column("sum(sum_c)"), pa.int64())})

    return agg.map_batches(final, batch_format="pyarrow")


def events_profile(sf_dir: str) -> pd.DataFrame:
    """Schema profiling: per-column null count and exact distinct count
    over the events dimensions — the dataset-card table. Distincts run
    as block-local ``pc.unique`` partials exploded into (col, val)
    pairs, then ONE global distinct+count shuffle over the already
    locally-deduplicated pairs (at 100 TB swap the exact count for the
    HLL sketch in functions/sketches.py; the plumbing is identical).
    Output is 3 rows — driver-side assembly is O(columns)."""
    cols = ["user_id", "event_type", "props"]
    ds = _t(sf_dir, "events", cols)

    def pairs(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            u = pc.unique(pc.cast(t.column(c), pa.string()))
            u = u.drop_null()
            names.append(pa.array([c] * len(u), type=pa.string()))
            vals.append(u)
        return pa.table({"col_name": pa.concat_arrays(names),
                         "val": pa.concat_arrays(
                             [v.combine_chunks() if hasattr(v, "combine_chunks")
                              else v for v in vals])})

    nd = (ds.map_batches(pairs, batch_format="pyarrow")
          .groupby(["col_name", "val"]).count()
          .groupby("col_name").count().to_pandas())
    nd = nd.rename(columns={"count()": "n_distinct"})[
        ["col_name", "n_distinct"]]
    # an all-null column contributes zero (col, val) pairs — it must
    # still report n_distinct = 0, not vanish from the profile
    nd = (nd.set_index("col_name").reindex(cols, fill_value=0)
          .reset_index())

    def null_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "col_name": pa.array(cols, type=pa.string()),
            "nn": pa.array([t.column(c).null_count for c in cols],
                           type=pa.int64())})

    nulls = (ds.map_batches(null_partial, batch_format="pyarrow")
             .groupby("col_name").sum("nn").to_pandas())
    nulls = nulls.rename(columns={"sum(nn)": "n_null"})
    out = nd.merge(nulls, on="col_name")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    return out.sort_values("col_name").reset_index(drop=True)


def events_hour_value_corr(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation of hour-of-day vs value per event type,
    computed from exact integer sum partials with a mirrored IEEE
    float tree (the events_value_zscore convention) so the result is
    bit-identical to the SQL oracle regardless of row order. Scale
    bound: sum(c*c) with c = value cents stays inside int64 up to
    ~9e5 rows per type at c~1e5 per cent^2 row — document-scale
    corpora rebase c first (see user_value_trend_stats)."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.hour(t.column("ts")), pa.int64())
        c = _cents(t.column("value"))
        part = pa.table({
            "event_type": t.column("event_type"),
            "h": h, "c": c,
            "hh": pc.multiply(h, h), "cc": pc.multiply(c, c),
            "hc": pc.multiply(h, c),
        }).group_by("event_type").aggregate(
            [("h", "sum"), ("c", "sum"), ("hh", "sum"),
             ("cc", "sum"), ("hc", "sum"), ("h", "count")])
        return pa.table({
            "event_type": part.column("event_type"),
            "sh": part.column("h_sum"), "sc": part.column("c_sum"),
            "shh": part.column("hh_sum"), "scc": part.column("cc_sum"),
            "shc": part.column("hc_sum"),
            "n": pc.cast(part.column("h_count"), pa.int64())})

    agg = ds.map_batches(prep, batch_format="pyarrow").groupby(
        "event_type").aggregate(
            Sum("sh"), Sum("sc"), Sum("shh"), Sum("scc"), Sum("shc"),
            Sum("n")).to_pandas()
    n = agg["sum(n)"].to_numpy().astype(np.float64)
    sh = agg["sum(sh)"].to_numpy().astype(np.float64)
    sc = agg["sum(sc)"].to_numpy().astype(np.float64)
    shh = agg["sum(shh)"].to_numpy().astype(np.float64)
    scc = agg["sum(scc)"].to_numpy().astype(np.float64)
    shc = agg["sum(shc)"].to_numpy().astype(np.float64)
    # mirrored tree: (n*shc - sh*sc) / (sqrt(n*shh - sh*sh) *
    #                                   sqrt(n*scc - sc*sc))
    corr = (n * shc - sh * sc) / (np.sqrt(n * shh - sh * sh)
                                  * np.sqrt(n * scc - sc * sc))
    return pd.DataFrame({"event_type": agg["event_type"],
                         "corr_hv": corr}).sort_values(
        "event_type").reset_index(drop=True)


def top_orders_with_ties(sf_dir: str, k: int = 2) -> Dataset:
    """Per-customer top-k orders by price bucket KEEPING TIES — SQL
    ``RANK() <= k``, the "everyone on the podium" semantics that
    ROW_NUMBER-based top-k (top3_orders_per_customer) cannot express.
    Prices bucket to whole hundred-dollar steps so rank ties actually
    recur; the tiny rnk<=k survivor set joins back for its payload."""
    from ..functions.window import rank_window

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        price_b = pc.divide(_cents(t.column("o_totalprice")), 10000)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "price_b": price_b,
            "neg_b": pc.negate_checked(price_b)})

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    ranked = rank_window(prepped, group_col="o_custkey",
                         order_cols=["neg_b"], id_col="o_orderkey",
                         method="rank", out_col="rnk")
    hits = ranked.filter(expr=f"rnk <= {k}")
    joined = prepped.join(hits, join_type="inner", num_partitions=4,
                          on=("o_orderkey",))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "o_orderkey": t.column("o_orderkey"),
            "price_b": t.column("price_b"),
            "rnk": pc.cast(t.column("rnk"), pa.int64())})

    return joined.map_batches(final, batch_format="pyarrow")


def kg_taxonomy_closure(sf_dir: str, max_depth: int = 3) -> Dataset:
    """Transitive closure (ancestor, descendant, depth) of the KG
    containment chain — the reference's taxonomy-path traversal
    (`react_tools.py` walking 种→属→科 upward) as a set-at-a-time
    operator: depth-1 edges are the memoized triple table, each deeper
    level is one distributed hash join of the previous level against
    the edges. The chain is layered (region→nation→customer→order) so
    depth is unique per pair and the result is ~3x the edge count, not
    combinatorial."""
    triples = kg_rel_triples(sf_dir)

    def as_level(t: pa.Table) -> pa.Table:
        return pa.table({
            "anc": pc.cast(t.column("subj"), pa.string()),
            "de": pc.cast(t.column("obj"), pa.string()),
            "depth": pa.array([1] * len(t), type=pa.int64())})

    level = triples.map_batches(as_level,
                                batch_format="pyarrow").materialize()
    out = level
    for _ in range(max_depth - 1):
        nxt = level.join(triples, join_type="inner", num_partitions=8,
                         on=("de",), right_on=("subj",))

        def extend(t: pa.Table) -> pa.Table:
            return pa.table({
                "anc": t.column("anc"),
                "de": pc.cast(t.column("obj"), pa.string()),
                "depth": pc.add(t.column("depth"), 1)})

        from ..traverse import drop_empty_blocks
        level = drop_empty_blocks(
            nxt.map_batches(extend, batch_format="pyarrow"),
            pa.schema([("anc", pa.string()), ("de", pa.string()),
                       ("depth", pa.int64())])).materialize()
        if level.count() == 0:
            break
        out = out.union(level)
    return out
