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


def revenue_by_nation(sf_dir: str) -> Dataset:
    """3-way join via broadcast of the small dimension chain
    (customer→nation lookup shipped once with ray.put, read per actor)."""
    import ray

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    lookup = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    cust_to_nation = dict(zip(lookup["c_custkey"], lookup["n_name"]))
    ref = ray.put(cust_to_nation)

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    lineitem = _t(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice", "l_discount"])
    order_cust = orders.to_pandas()
    order_to_cust = dict(zip(order_cust["o_orderkey"], order_cust["o_custkey"]))
    ref2 = ray.put(order_to_cust)

    class Annotate:
        def __init__(self) -> None:
            self.c2n = ray.get(ref)
            self.o2c = ray.get(ref2)

        def __call__(self, t: pa.Table) -> pa.Table:
            okeys = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            nations = [self.c2n.get(self.o2c.get(int(o))) for o in okeys]
            rev = pc.multiply(t.column("l_extendedprice"),
                              pc.subtract(1.0, t.column("l_discount")))
            return pa.table({
                "n_name": pa.array(nations, type=pa.string()),
                "rev_c": _cents(rev),
            })

    return lineitem.map_batches(Annotate, batch_format="pyarrow",
                                concurrency=(1, 4)).groupby("n_name").aggregate(
        Sum("rev_c", alias_name="revenue_cents"), Count(alias_name="n_items"))


def top10_customers(sf_dir: str) -> pd.DataFrame:
    """Aggregate → join small side → global sort → limit (T-family)."""
    spend = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table({"o_custkey": t.column("o_custkey"),
                            "spend_c": _cents(t.column("o_totalprice"))}),
        batch_format="pyarrow",
    ).groupby("o_custkey").aggregate(Sum("spend_c", alias_name="spend_cents"),
                                     Count(alias_name="n_orders"))
    df = spend.to_pandas()
    names = _t(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    df = df.merge(names, left_on="o_custkey", right_on="c_custkey")
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
            self.n = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t.column("s_nationkey").to_numpy(zero_copy_only=False)
            return pa.table({
                "n_name": pa.array([self.n.get(int(k)) for k in keys], type=pa.string()),
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
    """Sessionization: per-user sorted scan; a gap > 30 min starts a new
    session (groupby(key).map_groups over ts-sorted groups — the
    streaming-shaped pattern for Ray Data)."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        gaps = g["ts"].diff().dt.total_seconds() > gap_s
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_events": [len(g)],
            "n_sessions": [1 + int(gaps.sum())],
        })

    return ds.groupby("user_id").map_groups(sess, batch_format="pandas")


def distinct_users_by_type(sf_dir: str) -> Dataset:
    """Exact COUNT(DISTINCT) per key: vectorized local (key, user) dedup
    inside map_batches (the salt-by-batch pattern again), then one
    groupby over the much smaller distinct pairs."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def local_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["event_type", "user_id"])

    pairs = ds.map_batches(local_distinct, batch_format="pandas",
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


def top3_orders_per_customer(sf_dir: str) -> Dataset:
    """Per-group top-k: 3 priciest orders per customer (sorted-group scan
    — the groupby().map_groups shape)."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "o_orderkey": t.column("o_orderkey"),
                         "price_c": _cents(t.column("o_totalprice"))})

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["price_c", "o_orderkey"],
                             ascending=[False, True], kind="stable").head(3)

    return ds.map_batches(prep, batch_format="pyarrow").groupby(
        "o_custkey").map_groups(topk, batch_format="pandas")


def customers_without_orders(sf_dir: str) -> Dataset:
    """Broadcast anti-join: the order-holding custkey set ships once via
    ray.put; the filter is a vectorized is_in inside map_batches."""
    import ray

    okeys = _t(sf_dir, "orders", ["o_custkey"]).to_pandas()["o_custkey"].unique()
    ref = ray.put(set(int(k) for k in okeys))

    class AntiJoin:
        def __init__(self) -> None:
            self.keys = pa.array(sorted(ray.get(ref)), type=pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(t.column("c_custkey").cast(pa.int64()),
                                      value_set=self.keys))
            return t.filter(mask).select(["c_custkey", "c_name"])

    out = _t(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        AntiJoin, batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    if out.empty and len(out.columns) == 0:  # empty Datasets drop schema
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                            "c_name": pd.Series(dtype="object")})
    return out


# --- KG construction over relational inputs (SQL-checkable) -----------------

def kg_rel_triples(sf_dir: str) -> Dataset:
    """Flat-map triple emission over the region→nation→customer→orders
    containment chain — the reference's taxonomy-chain operator (M3)
    expressed over relational input so DuckDB can oracle-check it."""
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
            self.rn = ray.get(rn_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            nkeys = t.column("c_nationkey").to_numpy(zero_copy_only=False)
            subj = [self.rn[int(k)][1] for k in nkeys]
            return pa.table({
                "subj": pa.array(subj, type=pa.string()),
                "pred": pa.array(["contains"] * len(t)),
                "obj": t.column("c_name").cast(pa.string()),
            })

    t2 = _t(sf_dir, "customer", ["c_nationkey", "c_name"]).map_batches(
        CustTriples, batch_format="pyarrow", concurrency=(1, 2))

    cust_names = _t(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    cn_ref = ray.put(dict(zip(cust_names["c_custkey"], cust_names["c_name"])))

    class OrderTriples:
        def __init__(self) -> None:
            self.cn = ray.get(cn_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
            ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            return pa.table({
                "subj": pa.array([self.cn[int(c)] for c in ck], type=pa.string()),
                "pred": pa.array(["placed"] * len(t)),
                "obj": pa.array([f"order-{int(o)}" for o in ok], type=pa.string()),
            })

    t3 = _t(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        OrderTriples, batch_format="pyarrow", concurrency=(1, 2))
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
