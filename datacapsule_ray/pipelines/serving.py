"""Serving-side operators in the driver gate (A7/A8/S6) — each one an
oracle-checkable query over the driver's parquet tables.

These exercise the agent loop, the judge stage and the interaction
store end-to-end as *data* operators: deterministic inputs derived from
the TPC-H-ish tables, distributed execution through the real stages,
and a DuckDB-expressible contract so the driver's rows+schema+hash gate
applies (the same stance as the ``kg_rel_*`` family)."""

from __future__ import annotations

import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset


def _t(sf_dir: str, name: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def judge_scores(sf_dir: str) -> Dataset:
    """A8 in the gate: every document judged against its doc_id+1
    neighbor (standard = this text, predicted = next text, answers =
    the lang labels). Pairing is a distributed self-join on doc_id+1;
    scoring is the JudgeStage actor pool; scores are integer basis
    points, bit-identical to the SQL rubric
    (0.7·jaccard + 0.3·answer-match)."""
    from ..evaluation import RubricJudge, evaluate

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    left = docs.map_batches(
        lambda t: t.append_column(
            "partner", pc.add(t.column("doc_id"), 1)),
        batch_format="pyarrow")
    right = docs.map_batches(
        lambda t: pa.table({"doc_id_b": t.column("doc_id"),
                            "text_b": t.column("text"),
                            "lang_b": t.column("lang")}),
        batch_format="pyarrow")
    pairs = left.join(right, join_type="inner", num_partitions=4,
                      on=("partner",), right_on=("doc_id_b",))

    def to_eval(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "question": pc.binary_join_element_wise(
                "q-", pc.cast(t.column("doc_id"), pa.string()), ""),
            "standard_reasoning": t.column("text"),
            "predicted_reasoning": t.column("text_b"),
            "standard_answer": t.column("lang"),
            "predicted_answer": t.column("lang_b"),
        })

    scored = evaluate(pairs.map_batches(to_eval, batch_format="pyarrow"),
                      RubricJudge)
    return scored.map_batches(
        lambda t: t.select(["doc_id", "score_bp"]), batch_format="pyarrow")


AGENT_REL_HIERARCHY = {"region": 1, "nation": 2, "customer": 3}


def agent_nation_customers(sf_dir: str) -> pd.DataFrame:
    """A7 in the gate: one agent question per nation —
    「<nation>下有多少个customer？」 — answered by the distributed ReAct
    actor pool over the region→nation→customer graph (broadcast once via
    ray.put, the A4 tier; the planet-scale path is expand_frontier).
    Output (n_name, n_customers) equals the SQL LEFT JOIN count."""
    from ..agent import answer_questions
    from ..traverse import gather_table as gather

    region = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    # ONE nation scan carrying key, region FK and name together — a
    # second scan zipped by implicit row order would silently miswire
    # every customer edge if the two reads ever split differently
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_regionkey", "n_name"])
    cust = _t(sf_dir, "customer", ["c_nationkey", "c_name"])

    # node/edge tables built distributed, gathered only for the
    # broadcast (the graph IS the small side here)
    nation_t = gather(nation)
    region_t = gather(region)
    rmap = dict(zip(region_t.column("r_regionkey").to_pylist(),
                    region_t.column("r_name").to_pylist()))

    cust_nodes = gather(cust.map_batches(
        lambda t: pa.table({"node_id": t.column("c_name").cast(pa.string()),
                            "node_type": pa.array(["customer"] * len(t))}),
        batch_format="pyarrow"))
    nation_names = nation_t.column("n_name").to_pylist()
    nodes = pa.concat_tables([
        pa.table({"node_id": pa.array(list(rmap.values()), pa.string()),
                  "node_type": pa.array(["region"] * len(rmap))}),
        pa.table({"node_id": pa.array(nation_names, pa.string()),
                  "node_type": pa.array(["nation"] * len(nation_names))}),
        cust_nodes,
    ])

    nation_by_key = dict(zip(nation_t.column("n_nationkey").to_pylist(),
                             nation_names))
    cust_edges = gather(cust.map_batches(
        lambda t: pa.table({
            "src": pa.array([nation_by_key[int(k)] for k in
                             t.column("c_nationkey").to_pylist()], pa.string()),
            "rel": pa.array(["contains"] * len(t)),
            "dst": t.column("c_name").cast(pa.string())}),
        batch_format="pyarrow"))
    region_edges = pa.table({
        "src": pa.array([rmap[int(k)] for k in
                         nation_t.column("n_regionkey").to_pylist()], pa.string()),
        "rel": pa.array(["contains"] * len(nation_names)),
        "dst": pa.array(nation_names, pa.string())})
    edges = pa.concat_tables([region_edges, cust_edges])

    questions = rd.from_arrow(pa.table({
        "n_name": pa.array(sorted(nation_names), pa.string()),
        "question": pa.array([f"{n}下有多少个customer？"
                              for n in sorted(nation_names)], pa.string())}))
    answered = answer_questions(questions, nodes, edges,
                                hierarchy=AGENT_REL_HIERARCHY, leaf_level=3,
                                concurrency=(1, 4), batch_size=8)
    df = answered.to_pandas()
    out = pd.DataFrame({"n_name": df["n_name"],
                        "n_customers": df["answer"].astype("int64")})
    return out.sort_values("n_name", kind="stable").reset_index(drop=True)


def interactions_page(sf_dir: str) -> pd.DataFrame:
    """S6 in the gate: a full store lifecycle — distributed ingest of
    event-derived interactions, a distributed tombstone generation
    (event_id % 7), a distributed upsert generation (event_id % 5 →
    model 'm2', which also revives deleted %35 ids — last write wins),
    then the version-filtered page (app.py:443-498 contract:
    timestamp DESC, offset 10, limit 20)."""
    from ..state.interactions import InteractionStore

    from .relational import _cents

    import re

    root = "/tmp/dcray_interactions_" + re.sub(r"[^A-Za-z0-9.]+", "_", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    store = InteractionStore(root)

    ev = _t(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def to_interaction(model_tag: str):
        def inner(t: pa.Table) -> pa.Table:
            ids = pc.cast(t.column("event_id"), pa.string())
            return pa.table({
                "id": ids,
                "timestamp": pc.cast(t.column("ts"), pa.timestamp("us")),
                "question": pc.binary_join_element_wise("q-", ids, ""),
                "model": pa.array([model_tag] * len(t), pa.string()),
                "version": t.column("event_type").cast(pa.string()),
                "processingTime": _cents(t.column("value")),
                "tokens": pc.binary_join_element_wise(
                    '{"n": ', ids, "}", ""),
            })
        return inner

    def mod_is_zero(m: int):
        def inner(t: pa.Table) -> pa.Table:
            ids = t.column("event_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % m == 0))
        return inner

    store.append_dataset(ev.map_batches(to_interaction("m1"),
                                        batch_format="pyarrow"))
    store.delete_dataset(
        ev.map_batches(mod_is_zero(7), batch_format="pyarrow").map_batches(
            lambda t: pa.table({"id": pc.cast(t.column("event_id"),
                                              pa.string())}),
            batch_format="pyarrow"))
    store.append_dataset(
        ev.map_batches(mod_is_zero(5), batch_format="pyarrow").map_batches(
            to_interaction("m2"), batch_format="pyarrow"))

    page = store.by_version("click", offset=10, limit=20)
    return page[["id", "timestamp", "question", "model", "version",
                 "processingTime"]].reset_index(drop=True)
