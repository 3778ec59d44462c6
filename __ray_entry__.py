"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline (SURVEY.md §3.1)
over a deterministic interleaved-span corpus (the BASELINE.json
input_hint table shape, synthesized at small scale — the driver's
TPC-H-ish tables don't carry span documents). ``queries()`` spans the
operator inventory: classic relational ops, KG construction over
relational inputs (SQL-checkable), the full KG pipeline over the
synthetic corpus (rows-only), and the training-data ops (dedup /
similarity / text analysis / multimodal plumbing).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Any

_KG_CACHE: dict[int, dict] = {}


def _kg_outputs(sf_dir: str) -> dict:
    """Build (or reuse checkpoints of) the flagship KG pipeline at a scale
    derived from the sf directory name. Deterministic: seed 42."""
    from datacapsule_ray.fixtures import write_corpus
    from datacapsule_ray.pipelines.build_graph import KGPipeline

    m = re.search(r"sf([0-9.]+)", sf_dir or "")
    sf = float(m.group(1)) if m else 0.01
    n_docs = {0.001: 134, 0.01: 500, 0.1: 2000}.get(sf, max(134, int(sf * 20000)))
    if n_docs not in _KG_CACHE:
        root = f"/tmp/dcray_kg_{n_docs}"
        files = write_corpus(f"{root}/corpus", n_docs, seed=42,
                             docs_per_file=max(64, n_docs // 8))
        pipe = KGPipeline(f"{root}/ckpt")
        out = pipe.run_all(files, files_per_partition=1)
        out["_ckpt_root"] = f"{root}/ckpt"
        _KG_CACHE[n_docs] = out
    return _KG_CACHE[n_docs]


def _kg_nl_sql_family_counts(sf_dir: str) -> Any:
    """A6 end-to-end in the driver gate: NL question → generated SQL
    (location-LIKE contract, read-only guard) → executed over the star
    checkpoint (rows-only check; generation semantics pinned by
    tests/test_star_query.py)."""
    import pandas as pd

    from datacapsule_ray.pipelines.star_query import NLQueryEngine

    root = _kg_outputs(sf_dir)["_ckpt_root"]
    out = NLQueryEngine(root).query_database("各科的物种数量是多少？")
    assert out["success"], out
    return pd.DataFrame(out["results"])


def _kg_reference_demo18_triples(sf_dir: str) -> Any:
    """The reference's OWN shipped corpus (docs/demo_18.json) ingested
    via sources.io.ingest_reference_json and run through the full
    pipeline — rows-only here; exact triple-set equality vs the
    sequential reference-semantics oracle is asserted in
    tests/test_reference_parity.py (demo130 likewise: 2,019/2,019)."""
    from datacapsule_ray.pipelines.build_graph import KGPipeline
    from datacapsule_ray.sources.io import ingest_reference_json

    # fixed root (like _kg_outputs): the gate evaluates the query map at
    # several sf tiers and this result is sf-independent — checkpoint
    # resume makes repeat calls near-free instead of full rebuilds
    root = "/tmp/dcray_ref18"
    files = ingest_reference_json("/root/reference/docs/demo_18.json",
                                  f"{root}/corpus", docs_per_file=6)
    out = KGPipeline(f"{root}/ckpt").run_all(files, files_per_partition=1,
                                             with_vectors=False)
    return out["triples"]


def _kg_hot_node_neighbors(sf_dir: str) -> Any:
    """Distributed 1-hop expansion from the hottest node (动物界) over the
    materialized edges — the J3 frontier-join path in the driver gate."""
    import pandas as pd

    from datacapsule_ray.traverse import expand_frontier

    out = _kg_outputs(sf_dir)
    found = sorted(expand_frontier(out["edges"], {"动物界"}, rounds=1))
    return pd.DataFrame({"neighbor": found})


def _gather(ds):
    """Collect a small Dataset as one Arrow table, schema intact even
    at zero rows (Dataset.to_pandas() drops an empty result's columns)."""
    from datacapsule_ray.traverse import gather_table

    return gather_table(ds)


def entry() -> Any:
    """Flagship: interleaved documents → triples (runs full construction:
    parse → emit → link → dedup/merge shuffles → star schema → vectors)."""
    return _kg_outputs("/root/testdata/sf0.001")["triples"]


def queries() -> dict[str, Callable[[str], Any]]:
    from datacapsule_ray.pipelines import docops, relational as r, serving

    q: dict[str, Callable[[str], Any]] = {
        # classic relational operator coverage
        "q1_pricing_summary": r.q1_pricing_summary,
        "revenue_by_nation": r.revenue_by_nation,
        "top10_customers": r.top10_customers,
        "order_priority_count": r.order_priority_count,
        "part_brand_stats": r.part_brand_stats,
        "supplier_nation_balance": r.supplier_nation_balance,
        "events_daily": r.events_daily,
        "brand_nation_revenue": r.brand_nation_revenue,
        "events_sliding_2h": r.events_sliding_2h,
        "user_sessions": r.user_sessions,
        "distinct_users_by_type": r.distinct_users_by_type,
        "approx_distinct_users": r.approx_distinct_users,
        "approx_value_quantiles": r.approx_value_quantiles,
        "top3_orders_per_customer": r.top3_orders_per_customer,
        # gate adapter: the library fn returns a Dataset (unbounded at
        # scale — caller decides to collect); the gate collects it as
        # ARROW because Dataset.to_pandas() drops the schema of an
        # empty result and this query IS empty on the driver tables
        "customers_without_orders": lambda sf_dir: _gather(
            r.customers_without_orders(sf_dir)),
        "events_page2": r.events_page2,
        "events_asof_purchase": r.events_asof_purchase,
        "events_asof_purchase_left": r.events_asof_purchase_left,
        "events_value_quantiles": r.events_value_quantiles,
        "user_rolling_value": r.user_rolling_value,
        "user_rolling_mean": r.user_rolling_mean,
        "user_rolling_min": r.user_rolling_min,
        "user_rolling_max": r.user_rolling_max,
        "user_range_sum_30m": r.user_range_sum_30m,
        "user_range_count_30m": r.user_range_count_30m,
        "user_range_min_30m": r.user_range_min_30m,
        "user_range_max_30m": r.user_range_max_30m,
        # round 4c: RANGE-frame AVG, PERCENTILE_CONT, winsorized mean,
        # Gini–Simpson label diversity — all with full SQL oracles
        "user_range_avg_30m": r.user_range_avg_30m,
        "user_range_distinct_30m": r.user_range_distinct_30m,
        "user_funnel_stages": r.user_funnel_stages,
        "events_value_outliers": r.events_value_outliers,
        "users_pareto_front": r.users_pareto_front,
        "event_type_cooccurrence": r.event_type_cooccurrence,
        "user_value_trend_stats": r.user_value_trend_stats,
        "fuzzy_name_pairs": r.fuzzy_name_pairs,
        "events_value_quantiles_cont": r.events_value_quantiles_cont,
        "events_value_winsorized": r.events_value_winsorized,
        "user_type_diversity": r.user_type_diversity,
        "user_day_streaks": r.user_day_streaks,
        "user_prev_value": r.user_prev_value,
        "user_next_value": r.user_next_value,
        "user_event_rownum": r.user_event_rownum,
        "user_running_value": r.user_running_value,
        "user_event_ntile4": r.user_event_ntile4,
        "user_value_percent_rank": r.user_value_percent_rank,
        "user_value_rank": r.user_value_rank,
        "user_value_dense_rank": r.user_value_dense_rank,
        "user_value_cume_dist": r.user_value_cume_dist,
        "events_mode_value": r.events_mode_value,
        # round 4b: partition-frame window edges, exact grouped moments,
        # ROLLUP — all with full SQL oracles
        "user_first_last_value": r.user_first_last_value,
        "events_value_stats": r.events_value_stats,
        "revenue_rollup": r.revenue_rollup,
        "revenue_cube": r.revenue_cube,
        "events_value_zscore": r.events_value_zscore,
        "user_weekly_retention": r.user_weekly_retention,
        "customers_with_orders": lambda sf_dir: _gather(
            r.customers_with_orders(sf_dir)),
        # gate adapters: set differences can be EMPTY on the driver
        # tables and Dataset.to_pandas() drops an empty result's schema
        "users_click_and_purchase": lambda sf_dir: _gather(
            r.users_click_and_purchase(sf_dir)),
        "users_click_not_purchase": lambda sf_dir: _gather(
            r.users_click_not_purchase(sf_dir)),
        "events_value_mad": r.events_value_mad,
        "events_in_windows_dist": r.events_in_windows_dist,
        "user_event_paths": r.user_event_paths,
        "events_in_windows": r.events_in_windows,
        "events_daily_pivot": r.events_daily_pivot,
        # KG construction over relational inputs (SQL-checkable G1/G2/M3)
        "kg_rel_triples": r.kg_rel_triples,
        "kg_rel_nodes": r.kg_rel_nodes,
        "kg_rel_degree": r.kg_rel_degree,
        # round 4b: fixed-point integer PageRank (order-independent
        # int64 arithmetic -> full unrolled-CTE SQL oracle)
        "kg_rel_pagerank": r.kg_rel_pagerank,
        # serving-side operators as data ops (A7 agent loop, A8 judge
        # stage, S6 interaction store lifecycle) — all SQL-checkable
        "judge_scores": serving.judge_scores,
        "agent_nation_customers": serving.agent_nation_customers,
        "interactions_page": serving.interactions_page,
        # text analysis / fingerprinting / dedup / similarity
        "doc_token_stats": docops.doc_token_stats,
        "doc_fingerprint": docops.doc_fingerprint,
        "doc_lang_marker_counts": docops.doc_lang_marker_counts,
        "doc_quality_filter": docops.doc_quality_filter,
        "dedup_exact_docs": docops.dedup_exact_docs,
        "dedup_keep_best_docs": docops.dedup_keep_best_docs,
        "ssjoin_jaccard_docs": docops.ssjoin_jaccard_docs,
        "doc_top_bigrams": docops.doc_top_bigrams,
        "doc_top_tokens": docops.doc_top_tokens,
        "doc_top_terms": docops.doc_top_terms,
        "sample_docs_hash": docops.sample_docs_hash,
        "sample_docs_stratified": docops.sample_docs_stratified,
        "sim_topk_embeddings": docops.sim_topk_embeddings,
        "doc_repetition_stats": docops.doc_repetition_stats,
        "docs_redacted": docops.docs_redacted,
        "cluster_assign_embeddings": docops.cluster_assign_embeddings,
        "embedding_dim_stats": docops.embedding_dim_stats,
        "doc_quality_percentile_filter": docops.doc_quality_percentile_filter,
        # training-mix hygiene (round 3b): split / domain cap /
        # decontamination / normalization / n-gram Jaccard — all with
        # full SQL oracles
        "split_docs_hash": docops.split_docs_hash,
        "source_cap_docs": docops.source_cap_docs,
        "decontaminate_docs": docops.decontaminate_docs,
        "docs_normalized": docops.docs_normalized,
        "mixture_sample_docs": docops.mixture_sample_docs,
        "training_mix_docs": docops.training_mix_docs,
        "incremental_dedup_docs": docops.incremental_dedup_docs,
        "ssjoin_ngram_docs": docops.ssjoin_ngram_docs,
        # round 4b: C4-style sub-document (chunk) dedup, full SQL oracle
        "doc_chunk_dedup": docops.doc_chunk_dedup,
        # round 4c: degree-split exact triangle count on the dup graph
        "neardup_triangles": docops.neardup_triangles,
        "neardup_kcore": docops.neardup_kcore,
        "neardup_components_exact": docops.neardup_components_exact,
        "neardup_cluster_sizes": docops.neardup_cluster_sizes,
        "doc_oov_stats": docops.doc_oov_stats,
        # Bloom membership pre-filter composed with the exact verify —
        # output-identical to incremental_dedup_docs, same oracle
        "incremental_dedup_bloom": docops.incremental_dedup_bloom,
        # non-SQL-expressible (LSH / IVF / multimodal / flagship KG):
        # rows-only driver check; semantics pinned by tests/
        "doc_rolling_fingerprints": docops.doc_rolling_fingerprints,
        "doc_pack_plan": docops.doc_pack_plan,
        "dedup_minhash_docs": docops.dedup_minhash_docs,
        "dedup_minhash_components": docops.dedup_minhash_components,
        "dedup_simhash_docs": docops.dedup_simhash_docs,
        "neardup_embeddings": docops.neardup_embeddings,
        "neardup_embeddings_kmeans": docops.neardup_embeddings_kmeans,
        "sim_ivf_topk_embeddings": docops.sim_ivf_topk_embeddings,
        # nprobe = n_cells → exact; full SQL oracle over the IVF path
        "sim_ivf_exhaustive_topk": docops.sim_ivf_exhaustive_topk,
        # iterative Lloyd's — rows-only; sequential-reference parity in tests
        "kmeans_clusters_embeddings": docops.kmeans_clusters_embeddings,
        "media_features": docops.media_features_demo,
        "frame_sample": docops.frame_sample_demo,
        # resize geometry is integer arithmetic → full SQL oracle
        "media_resize_plan": docops.media_resize_plan,
        # the PLAN half of frame sampling (which frames, at which
        # timestamps) is deterministic from metadata → SQL-checkable;
        # only the stubbed frame fingerprint stays rows-only above
        "frame_sample_plan": lambda sf: docops.frame_sample_demo(sf)
            .drop_columns(["frame_fp"]),
        "kg_triples": lambda sf: _kg_outputs(sf)["triples"],
        "kg_nodes": lambda sf: _kg_outputs(sf)["nodes"],
        "kg_edges": lambda sf: _kg_outputs(sf)["edges"],
        # adjacency chunk boundaries depend on physical block splits;
        # report the deterministic per-source degree view instead
        "kg_adjacency": lambda sf: _kg_outputs(sf)["adjacency"]
            .drop_columns(["adj", "chunk"]).to_pandas()
            .drop_duplicates("src").sort_values("src").reset_index(drop=True),
        "kg_species": lambda sf: _kg_outputs(sf)["species"],
        "kg_distributions": lambda sf: _kg_outputs(sf)["distributions"],
        "kg_numerical_traits": lambda sf: _kg_outputs(sf)["numerical_traits"],
        "kg_descriptions": lambda sf: _kg_outputs(sf)["descriptions"],
        "kg_hot_node_neighbors": _kg_hot_node_neighbors,
        "kg_reference_demo18_triples": _kg_reference_demo18_triples,
        "kg_nl_sql_family_counts": _kg_nl_sql_family_counts,
        # round-5 additions: registered AFTER the never-driver-checked
        # r4 queries so the tie-break (stable sort, same round-0 group)
        # keeps those 10 at the head of the sample window
        "revenue_grouping_sets": r.revenue_grouping_sets,
        "events_daily_unpivot": r.events_daily_unpivot,
        "kg_entity_vectors": lambda sf: _kg_outputs(sf)["entity_vectors"].drop_columns(["embedding"]),
        "kg_relation_vectors": lambda sf: _kg_outputs(sf)["relation_vectors"].drop_columns(["embedding"]),
        # round-5b additions: reachability (BFS levels / transitive
        # closure), binning, profiling, corr-from-partials, importance
        # sampling, rank-with-ties top-k
        "neardup_bfs_levels": docops.neardup_bfs_levels,
        "ssjoin_cosine_docs": docops.ssjoin_cosine_docs,
        "kg_rel_ppr": r.kg_rel_ppr,
        "events_value_gini": r.events_value_gini,
        "cohort_value_triangle": r.cohort_value_triangle,
        "events_value_decile_stats": r.events_value_decile_stats,
        "user_value_autocorr": r.user_value_autocorr,
        "embedding_top_pc": docops.embedding_top_pc,
        "doc_lm_scores": docops.doc_lm_scores,
        "dedup_final_docs": docops.dedup_final_docs,
        "neardup_minhash_eval": docops.neardup_minhash_eval,
        "docs_snapshot_diff": docops.docs_snapshot_diff,
        "diverse_sample_embeddings": docops.diverse_sample_embeddings,
        "weighted_sample_docs": docops.weighted_sample_docs,
        "events_value_histogram": r.events_value_histogram,
        "events_profile": r.events_profile,
        "events_hour_value_corr": r.events_hour_value_corr,
        "top_orders_with_ties": r.top_orders_with_ties,
        "kg_taxonomy_closure": r.kg_taxonomy_closure,
    }
    # A sampling driver checks the FIRST ~50 entries: front-load the
    # queries with no recorded driver-green round yet, then the stalest
    # greens (r1 before r2 before r3), so every query earns a recent
    # driver row; per-query coverage is indexed in COVERAGE.md. Within
    # a same-round group, SQL-oracled queries sort before rows-only ones
    # — a hash-checked driver row is the stronger evidence, rows-only
    # entries lose least by waiting a round.
    oracles = oracle_sql()
    return dict(sorted(q.items(),
                       key=lambda kv: (_DRIVER_GREEN_ROUND.get(kv[0], 0),
                                       0 if kv[0] in oracles else 1)))


# last driver-green round per query (CORRECTNESS_r01..r04; green = rows+
# schema+hash match, or the documented rows-only check). Queries absent
# here have never had a driver row — they sort first: as of r5 that is
# exactly the 10 queries VERDICT r4 asked to land in the next sample
# window (neardup_components_exact, neardup_cluster_sizes, doc_oov_stats,
# incremental_dedup_bloom, media_resize_plan, frame_sample_plan,
# neardup_embeddings_kmeans, kmeans_clusters_embeddings,
# kg_reference_demo18_triples, kg_nl_sql_family_counts).
_DRIVER_GREEN_ROUND = {
    "agent_nation_customers": 3,
    "approx_distinct_users": 3,
    "approx_value_quantiles": 3,
    "brand_nation_revenue": 3,
    "cluster_assign_embeddings": 3,
    "customers_with_orders": 4,
    "customers_without_orders": 3,
    "decontaminate_docs": 3,
    "dedup_exact_docs": 3,
    "dedup_keep_best_docs": 3,
    "dedup_minhash_components": 2,
    "dedup_minhash_docs": 2,
    "dedup_simhash_docs": 2,
    "distinct_users_by_type": 3,
    "doc_chunk_dedup": 4,
    "doc_fingerprint": 3,
    "doc_lang_marker_counts": 3,
    "doc_pack_plan": 2,
    "doc_quality_filter": 3,
    "doc_quality_percentile_filter": 3,
    "doc_repetition_stats": 3,
    "doc_rolling_fingerprints": 2,
    "doc_token_stats": 3,
    "doc_top_bigrams": 3,
    "doc_top_terms": 3,
    "doc_top_tokens": 3,
    "docs_normalized": 4,
    "docs_redacted": 3,
    "embedding_dim_stats": 4,
    "event_type_cooccurrence": 4,
    "events_asof_purchase": 3,
    "events_asof_purchase_left": 3,
    "events_daily": 3,
    "events_daily_pivot": 3,
    "events_in_windows": 3,
    "events_in_windows_dist": 4,
    "events_mode_value": 3,
    "events_page2": 3,
    "events_sliding_2h": 3,
    "events_value_mad": 4,
    "events_value_outliers": 4,
    "events_value_quantiles": 3,
    "events_value_quantiles_cont": 4,
    "events_value_stats": 4,
    "events_value_winsorized": 4,
    "events_value_zscore": 4,
    "frame_sample": 1,
    "fuzzy_name_pairs": 4,
    "incremental_dedup_docs": 4,
    "interactions_page": 3,
    "judge_scores": 3,
    "kg_adjacency": 1,
    "kg_descriptions": 1,
    "kg_distributions": 1,
    "kg_edges": 1,
    "kg_entity_vectors": 1,
    "kg_hot_node_neighbors": 1,
    "kg_nodes": 1,
    "kg_numerical_traits": 1,
    "kg_rel_degree": 3,
    "kg_rel_nodes": 3,
    "kg_rel_pagerank": 4,
    "kg_rel_triples": 3,
    "kg_relation_vectors": 1,
    "kg_species": 1,
    "kg_triples": 1,
    "media_features": 1,
    "mixture_sample_docs": 4,
    "neardup_embeddings": 2,
    "neardup_kcore": 4,
    "neardup_triangles": 4,
    "order_priority_count": 3,
    "part_brand_stats": 3,
    "q1_pricing_summary": 3,
    "revenue_by_nation": 3,
    "revenue_cube": 4,
    "revenue_rollup": 4,
    "sample_docs_hash": 3,
    "sample_docs_stratified": 3,
    "sim_ivf_exhaustive_topk": 2,
    "sim_ivf_topk_embeddings": 2,
    "sim_topk_embeddings": 3,
    "source_cap_docs": 3,
    "split_docs_hash": 3,
    "ssjoin_jaccard_docs": 3,
    "ssjoin_ngram_docs": 4,
    "supplier_nation_balance": 3,
    "top10_customers": 3,
    "top3_orders_per_customer": 3,
    "training_mix_docs": 4,
    "user_day_streaks": 4,
    "user_event_ntile4": 4,
    "user_event_paths": 3,
    "user_event_rownum": 4,
    "user_first_last_value": 4,
    "user_funnel_stages": 4,
    "user_next_value": 4,
    "user_prev_value": 4,
    "user_range_avg_30m": 4,
    "user_range_count_30m": 4,
    "user_range_distinct_30m": 4,
    "user_range_max_30m": 4,
    "user_range_min_30m": 4,
    "user_range_sum_30m": 4,
    "user_rolling_max": 4,
    "user_rolling_mean": 4,
    "user_rolling_min": 4,
    "user_rolling_value": 4,
    "user_running_value": 4,
    "user_sessions": 3,
    "user_type_diversity": 4,
    "user_value_cume_dist": 4,
    "user_value_dense_rank": 4,
    "user_value_percent_rank": 4,
    "user_value_rank": 4,
    "user_value_trend_stats": 4,
    "user_weekly_retention": 4,
    "users_click_and_purchase": 4,
    "users_click_not_purchase": 4,
    "users_pareto_front": 4,
}


_STOPLIST_SQL = "('a','and','for','in','is','it','of','that','the','to')"

_KG_REL_TRIPLES_SQL = """
SELECT r_name AS subj, 'contains' AS pred, n_name AS obj
  FROM nation JOIN region ON n_regionkey = r_regionkey
UNION ALL
SELECT n_name, 'contains', c_name
  FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION ALL
SELECT c_name, 'placed', 'order-' || CAST(o_orderkey AS VARCHAR)
  FROM orders JOIN customer ON o_custkey = c_custkey
"""


def oracle_sql() -> dict[str, str]:
    out = {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top10_customers": """
            SELECT o_custkey, c_name,
                   CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS spend_cents,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY o_custkey, c_name
            ORDER BY spend_cents DESC, o_custkey
            LIMIT 10
        """,
        "order_priority_count": """
            SELECT o_orderpriority, COUNT(*) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY o_orderpriority
        """,
        "part_brand_stats": """
            SELECT p_brand, COUNT(*) AS n_parts,
                   MIN(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS min_price_cents,
                   MAX(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS max_price_cents,
                   MAX(p_size) AS max_size
            FROM part GROUP BY p_brand
        """,
        "supplier_nation_balance": """
            SELECT n_name,
                   CAST(SUM(CAST(ROUND(s_acctbal*100) AS BIGINT)) AS BIGINT) AS total_balance_cents,
                   COUNT(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "events_daily": """
            SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "brand_nation_revenue": """
            SELECT p_brand, n_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY p_brand, n_name
        """,
        "events_sliding_2h": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts) - INTERVAL (o) HOUR,
                            '%Y-%m-%d %H') AS window_start,
                   COUNT(*) AS n_events
            FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS o)
            GROUP BY 1, 2
        """,
        "top3_orders_per_customer": """
            SELECT o_custkey, o_orderkey, price_c
            FROM (SELECT o_custkey, o_orderkey,
                         CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c,
                         row_number() OVER (PARTITION BY o_custkey
                             ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC,
                                      o_orderkey) AS rn
                  FROM orders)
            WHERE rn <= 3
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders)
        """,
        "events_page2": """
            SELECT event_id, ts, user_id FROM events
            ORDER BY ts DESC, event_id
            LIMIT 20 OFFSET 20
        """,
        "events_asof_purchase": """
            SELECT e.event_id, e.user_id, e.ts,
                   p.ts AS ts_asof, p.value AS value_asof
            FROM events e ASOF JOIN (
                SELECT user_id, ts, value FROM events
                WHERE event_type = 'purchase') p
              ON e.user_id = p.user_id AND e.ts >= p.ts
            WHERE e.event_type = 'click'
        """,
        "events_asof_purchase_left": """
            SELECT e.event_id, e.user_id, e.ts,
                   p.ts AS ts_asof, p.value AS value_asof
            FROM events e ASOF LEFT JOIN (
                SELECT user_id, ts, value FROM events
                WHERE event_type = 'purchase') p
              ON e.user_id = p.user_id AND e.ts >= p.ts
            WHERE e.event_type = 'click'
        """,
        "events_in_windows": """
            WITH days AS (
                SELECT UNNEST(generate_series(
                    date_trunc('day', (SELECT min(ts) FROM events)),
                    date_trunc('day', (SELECT max(ts) FROM events)),
                    INTERVAL 1 DAY)) AS d
            ), w AS (
                SELECT d + INTERVAL 2 HOUR AS ws, d + INTERVAL 3 HOUR AS we
                FROM days)
            SELECT e.event_id, e.ts, e.event_type, w.ws AS window_start
            FROM events e JOIN w ON e.ts >= w.ws AND e.ts < w.we
        """,
        "events_daily_pivot": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   COUNT(*) FILTER (event_type = 'click') AS n_click,
                   COUNT(*) FILTER (event_type = 'view') AS n_view,
                   COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                   COUNT(*) FILTER (event_type = 'signup') AS n_signup,
                   COUNT(*) FILTER (event_type = 'error') AS n_error
            FROM events GROUP BY 1
        """,
        "user_event_paths": """
            SELECT user_id, string_agg(event_type, '->' ORDER BY ts, event_id)
                       AS path
            FROM (SELECT user_id, event_type, ts, event_id,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS rn
                  FROM events)
            WHERE rn <= 10
            GROUP BY user_id
        """,
        "events_mode_value": """
            SELECT event_type, mode_value, n_mode FROM (
                SELECT event_type,
                       CAST(ROUND(value*100) AS BIGINT) AS mode_value,
                       COUNT(*) AS n_mode,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY COUNT(*) DESC,
                                    CAST(ROUND(value*100) AS BIGINT) ASC
                       ) AS rn
                FROM events
                GROUP BY event_type, CAST(ROUND(value*100) AS BIGINT))
            WHERE rn = 1
        """,
        "user_rolling_value": """
            SELECT event_id,
                   -- outer CAST: DuckDB's windowed SUM(BIGINT) yields
                   -- HUGEINT, which pandas materializes as float64 and
                   -- the driver's representation-sensitive hash then
                   -- distinguishes from the engine's int64 (123.0 vs 123)
                   CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS roll_value_cents
            FROM events
        """,
        "user_rolling_mean": """
            SELECT event_id,
                   AVG(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS roll_avg_cents
            FROM events
        """,
        "user_rolling_min": """
            SELECT event_id,
                   MIN(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS roll_min_cents
            FROM events
        """,
        "user_rolling_max": """
            SELECT event_id,
                   MAX(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS roll_max_cents
            FROM events
        """,
        "user_range_sum_30m": """
            SELECT event_id,
                   -- outer CAST: windowed SUM(BIGINT) → HUGEINT →
                   -- float64 in pandas (see user_rolling_value)
                   CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                             AND CURRENT ROW)
                       AS BIGINT) AS range_sum_cents
            FROM events
        """,
        "user_range_min_30m": """
            SELECT event_id,
                   MIN(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                             AND CURRENT ROW) AS range_min_cents
            FROM events
        """,
        "user_range_max_30m": """
            SELECT event_id,
                   MAX(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                             AND CURRENT ROW) AS range_max_cents
            FROM events
        """,
        "user_range_count_30m": """
            SELECT event_id,
                   CAST(COUNT(*) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                             AND CURRENT ROW)
                       AS BIGINT) AS range_n_events
            FROM events
        """,
        "user_range_avg_30m": """
            SELECT event_id,
                   AVG(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                             AND CURRENT ROW) AS range_avg_cents
            FROM events
        """,
        "event_type_cooccurrence": """
            -- market-basket co-occurrence with per-type user counts
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
                 per AS (SELECT event_type,
                                CAST(COUNT(*) AS BIGINT) AS n_users
                         FROM ut GROUP BY event_type)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_both,
                   ANY_VALUE(pa.n_users) AS n_a,
                   ANY_VALUE(pb.n_users) AS n_b
            FROM ut a
            JOIN ut b ON a.user_id = b.user_id
                      AND a.event_type < b.event_type
            JOIN per pa ON pa.event_type = a.event_type
            JOIN per pb ON pb.event_type = b.event_type
            GROUP BY a.event_type, b.event_type
        """,
        "user_value_trend_stats": """
            -- OLS sufficient statistics in exact int64: x = hour
            -- buckets rebased to the user's first event (keeps every
            -- intermediate and reported sum provably inside int64 —
            -- second-resolution x*x wraps for active users), y = cents
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y,
                   CAST(SUM(x*y) AS BIGINT) AS sum_xy,
                   CAST(SUM(x*x) AS BIGINT) AS sum_x2,
                   CAST(SUM(y*y) AS BIGINT) AS sum_y2
            FROM (SELECT user_id,
                         xh - MIN(xh) OVER (PARTITION BY user_id) AS x,
                         y
                  FROM (SELECT user_id,
                               CAST(date_diff('hour',
                                    TIMESTAMP '2024-01-01', ts)
                                    AS BIGINT) AS xh,
                               CAST(ROUND(value*100) AS BIGINT) AS y
                        FROM events))
            GROUP BY user_id
        """,
        "fuzzy_name_pairs": """
            -- deletion-neighborhood blocking (complete for distance 1)
            -- + exact levenshtein verify — mirrors the engine exactly
            WITH n AS MATERIALIZED (SELECT DISTINCT c_name FROM customer),
            d AS MATERIALIZED (
              SELECT c_name,
                     unnest(list_append(
                         list_transform(generate_series(1, length(c_name)),
                             i -> substr(c_name, 1, i-1)
                                  || substr(c_name, i+1)),
                         c_name)) AS k
              FROM n),
            cand AS (
              SELECT DISTINCT a.c_name AS name_a, b.c_name AS name_b
              FROM d a JOIN d b ON a.k = b.k AND a.c_name < b.c_name)
            SELECT name_a, name_b FROM cand
            WHERE levenshtein(name_a, name_b) = 1
        """,
        "doc_oov_stats": r"""
            -- per-doc OOV occurrence mass vs the df>=3 vocabulary
            WITH toks AS MATERIALIZED (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(trim(text), '\s+'),
                           x -> x <> '')) AS token
                FROM documents),
            occ AS MATERIALIZED (
                SELECT doc_id, token, COUNT(*) AS c
                FROM toks GROUP BY doc_id, token),
            df AS (SELECT token, COUNT(*) AS df FROM occ GROUP BY token),
            vocab AS (SELECT token FROM df WHERE df >= 3),
            tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens
                    FROM occ GROUP BY doc_id),
            oov AS (SELECT o.doc_id, CAST(SUM(o.c) AS BIGINT) AS n_oov
                    FROM occ o LEFT JOIN vocab v USING (token)
                    WHERE v.token IS NULL GROUP BY o.doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(t.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(x.n_oov, 0) AS BIGINT) AS n_oov
            FROM documents d
            LEFT JOIN tot t USING (doc_id)
            LEFT JOIN oov x USING (doc_id)
        """,
        "users_pareto_front": """
            -- 2-D skyline / Pareto frontier under strict dominance
            WITH agg AS (
              SELECT user_id,
                     CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
                         AS spend_cents,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM events GROUP BY user_id)
            SELECT a.user_id, a.spend_cents, a.n_events
            FROM agg a
            WHERE NOT EXISTS (
              SELECT 1 FROM agg b
              WHERE b.spend_cents >= a.spend_cents
                AND b.n_events >= a.n_events
                AND (b.spend_cents > a.spend_cents
                     OR b.n_events > a.n_events))
        """,
        "events_value_outliers": """
            -- same robust-stats definition as events_value_mad; the
            -- flag compares exact integers, so no float tolerance
            WITH m AS (
              SELECT event_type,
                     quantile_disc(CAST(ROUND(value*100) AS BIGINT), 0.5)
                         AS med
              FROM events GROUP BY event_type),
            d AS (
              SELECT e.event_type,
                     quantile_disc(abs(CAST(ROUND(e.value*100) AS BIGINT)
                                       - m.med), 0.5) AS mad
              FROM events e JOIN m USING (event_type)
              GROUP BY e.event_type)
            SELECT e.event_id,
                   CAST(abs(CAST(ROUND(e.value*100) AS BIGINT) - m.med)
                        > 3 * d.mad AS BIGINT) AS is_outlier
            FROM events e
            JOIN m USING (event_type) JOIN d USING (event_type)
        """,
        "user_funnel_stages": """
            WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
                 t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2
                        FROM events e JOIN t1 USING (user_id)
                        WHERE e.event_type = 'click' AND e.ts > t1.ts1
                        GROUP BY e.user_id),
                 t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3
                        FROM events e JOIN t2 USING (user_id)
                        WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
                        GROUP BY e.user_id)
            SELECT '1_view' AS stage,
                   CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
            UNION ALL
            SELECT '2_click_after_view', CAST(COUNT(*) AS BIGINT) FROM t2
            UNION ALL
            SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM t3
        """,
        "user_range_distinct_30m": """
            SELECT event_id,
                   CAST(COUNT(DISTINCT event_type) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                             AND CURRENT ROW)
                       AS BIGINT) AS range_ndistinct_types
            FROM events
        """,
        "events_value_quantiles_cont": """
            SELECT event_type,
                   quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.5)
                       AS median_cont_cents,
                   quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.9)
                       AS p90_cont_cents
            FROM events GROUP BY event_type
        """,
        "events_value_winsorized": """
            WITH e AS (SELECT event_type,
                              CAST(ROUND(value*100) AS BIGINT) AS c
                       FROM events),
                 q AS (SELECT event_type,
                              quantile_disc(c, 0.05) AS lo,
                              quantile_disc(c, 0.95) AS hi
                       FROM e GROUP BY event_type)
            SELECT e.event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(GREATEST(q.lo, LEAST(q.hi, e.c)))
                       AS BIGINT) AS wsum_cents,
                   CAST(SUM(GREATEST(q.lo, LEAST(q.hi, e.c)))
                       AS DOUBLE) / COUNT(*) AS winsorized_mean_cents
            FROM e JOIN q USING (event_type)
            GROUP BY e.event_type
        """,
        "user_day_streaks": """
            -- gaps-and-islands: exact DATE-difference days (no float
            -- epoch division, whose ulp could flip a midnight floor)
            WITH days AS (SELECT DISTINCT user_id,
                          CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                               AS BIGINT) AS d
                          FROM events),
                 isl AS (SELECT user_id, d,
                         d - ROW_NUMBER() OVER (PARTITION BY user_id
                                                ORDER BY d) AS anchor
                         FROM days),
                 seg AS (SELECT user_id, anchor, COUNT(*) AS len
                         FROM isl GROUP BY user_id, anchor)
            SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak_days
            FROM seg GROUP BY user_id
        """,
        "user_type_diversity": """
            WITH c AS (SELECT user_id,
                   CAST(SUM(CASE WHEN event_type='click'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(SUM(CASE WHEN event_type='error'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                   CAST(SUM(CASE WHEN event_type='purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                   CAST(SUM(CASE WHEN event_type='signup'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c4,
                   CAST(SUM(CASE WHEN event_type='view'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c5
                   FROM events GROUP BY user_id)
            SELECT user_id,
                   CAST(c1+c2+c3+c4+c5 AS BIGINT) AS n_events,
                   -- ONE float division of exact int sums: the same
                   -- IEEE expression the Ray finish evaluates
                   1.0 - CAST(c1*c1+c2*c2+c3*c3+c4*c4+c5*c5 AS DOUBLE)
                       / CAST((c1+c2+c3+c4+c5)*(c1+c2+c3+c4+c5)
                              AS DOUBLE) AS type_diversity
            FROM c
        """,
        "user_prev_value": """
            SELECT event_id,
                   COALESCE(LAG(CAST(ROUND(value*100) AS BIGINT), 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id),
                       -1) AS prev_value_cents
            FROM events
        """,
        "user_next_value": """
            SELECT event_id,
                   COALESCE(LEAD(CAST(ROUND(value*100) AS BIGINT), 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id),
                       -1) AS next_value_cents
            FROM events
        """,
        "user_event_rownum": """
            SELECT event_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS BIGINT) AS rn
            FROM events
        """,
        "user_running_value": """
            SELECT event_id,
                   -- outer CAST: windowed SUM(BIGINT) → HUGEINT →
                   -- float64 in pandas (see user_rolling_value)
                   CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS running_value_cents
            FROM events
        """,
        "user_event_ntile4": """
            SELECT event_id,
                   CAST(NTILE(4) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS BIGINT) AS quartile
            FROM events
        """,
        "user_value_percent_rank": """
            SELECT event_id,
                   PERCENT_RANK() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ROUND(value*100) AS BIGINT))
                       AS value_pct_rank
            FROM events
        """,
        "user_value_rank": """
            SELECT event_id,
                   CAST(RANK() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ROUND(value*100) AS BIGINT))
                       AS BIGINT) AS value_rank
            FROM events
        """,
        "user_value_dense_rank": """
            SELECT event_id,
                   CAST(DENSE_RANK() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ROUND(value*100) AS BIGINT))
                       AS BIGINT) AS value_dense_rank
            FROM events
        """,
        "user_value_cume_dist": """
            SELECT event_id,
                   CUME_DIST() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ROUND(value*100) AS BIGINT))
                       AS value_cume_dist
            FROM events
        """,
        "user_first_last_value": """
            SELECT DISTINCT user_id,
                   FIRST_VALUE(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS first_value_cents,
                   LAST_VALUE(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING)
                       AS last_value_cents
            FROM events
        """,
        "events_value_stats": """
            -- exact integer partial sums; the float stats are computed
            -- from them with the SAME IEEE expression tree the engine
            -- uses, so the result is bit-identical (a native
            -- STDDEV/CORR would accumulate doubles in a different
            -- order and flunk the hash gate legitimately)
            WITH s AS (
              SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(c) AS DOUBLE) AS sx,
                     CAST(SUM(c*c) AS DOUBLE) AS sxx,
                     CAST(SUM(h) AS DOUBLE) AS sh,
                     CAST(SUM(h*h) AS DOUBLE) AS shh,
                     CAST(SUM(c*h) AS DOUBLE) AS sxh
              FROM (SELECT event_type,
                           CAST(ROUND(value*100) AS BIGINT) AS c,
                           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h
                    FROM events)
              GROUP BY event_type)
            SELECT event_type, CAST(n AS BIGINT) AS n_events,
                   CAST(sx AS BIGINT) AS sum_value_cents,
                   sqrt((n*sxx - sx*sx) / (n*(n-1))) AS stddev_cents,
                   (n*sxh - sx*sh)
                     / sqrt((n*sxx - sx*sx) * (n*shh - sh*sh))
                     AS corr_value_hour
            FROM s
        """,
        "revenue_rollup": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "revenue_cube": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "revenue_grouping_sets": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   COALESCE(CAST(ship_year AS VARCHAR), 'ALL') AS ship_year,
                   CAST(SUM(rev_c) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_rows
            FROM (SELECT l_returnflag, l_linestatus,
                         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
                             AS ship_year,
                         CAST(ROUND(l_extendedprice*(1-l_discount)*100)
                              AS BIGINT) AS rev_c
                  FROM lineitem)
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag, ship_year),
                                    (ship_year), ())
        """,
        "events_daily_unpivot": """
            WITH p AS (
              SELECT strftime(ts, '%Y-%m-%d') AS day,
                     COUNT(*) FILTER (event_type = 'click')    AS n_click,
                     COUNT(*) FILTER (event_type = 'view')     AS n_view,
                     COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                     COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
                     COUNT(*) FILTER (event_type = 'error')    AS n_error
              FROM events GROUP BY 1)
            SELECT day, substring(name, 3) AS event_type,
                   CAST(value AS BIGINT) AS n_events
            FROM (UNPIVOT p ON n_click, n_view, n_purchase, n_signup,
                               n_error
                  INTO NAME name VALUE value)
        """,
        "events_value_zscore": """
            -- mirrored IEEE tree over exact integer sums (see
            -- events_value_stats)
            WITH s AS (
              SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(c) AS DOUBLE) AS sx,
                     CAST(SUM(c*c) AS DOUBLE) AS sxx
              FROM (SELECT event_type,
                           CAST(ROUND(value*100) AS BIGINT) AS c
                    FROM events)
              GROUP BY event_type)
            SELECT e.event_id,
                   (CAST(CAST(ROUND(e.value*100) AS BIGINT) AS DOUBLE)
                      - s.sx/s.n)
                   / sqrt((s.n*s.sxx - s.sx*s.sx) / (s.n*(s.n-1)))
                       AS value_z
            FROM events e JOIN s USING (event_type)
        """,
        "user_weekly_retention": """
            -- epoch-week = floor(epoch_days/7): pure integer bucketing,
            -- immune to week-start conventions on both sides
            WITH ev AS (
              SELECT user_id,
                     CAST(floor(epoch(ts)/86400) AS BIGINT) // 7 AS week
              FROM events),
            firsts AS (
              SELECT user_id, MIN(week) AS cohort_week
              FROM ev GROUP BY user_id)
            SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
                   COUNT(DISTINCT e.user_id) AS n_users
            FROM ev e JOIN firsts f USING (user_id)
            GROUP BY 1, 2
        """,
        "customers_with_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders)
        """,
        "events_value_quantiles": """
            SELECT event_type,
                   quantile_disc(CAST(ROUND(value*100) AS BIGINT), 0.5)
                       AS median_cents,
                   quantile_disc(CAST(ROUND(value*100) AS BIGINT), 0.9)
                       AS p90_cents
            FROM events GROUP BY event_type
        """,
        "user_sessions": """
            SELECT user_id, COUNT(*) AS n_events,
                   -- exact elapsed microseconds, NOT date_diff('second')
                   -- (which counts whole-second BOUNDARY crossings and
                   -- diverges from true-elapsed-time sessionization for
                   -- gaps within ~1s of the threshold)
                   CAST(1 + SUM(CASE WHEN pts IS NOT NULL
                                      AND date_diff('microsecond', pts, ts)
                                          > 1800 * 1000000
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM (SELECT user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS pts
                  FROM events)
            GROUP BY user_id
        """,
        "distinct_users_by_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "kg_rel_triples": _KG_REL_TRIPLES_SQL,
        "judge_scores": """
            SELECT a.doc_id,
                   CAST(FLOOR((0.7 * jaccard(a.text, b.text)
                        + 0.3 * (CASE WHEN a.lang = b.lang
                                      THEN 1.0 ELSE 0.0 END)) * 10000
                        + 0.5) AS BIGINT) AS score_bp
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        """,
        "agent_nation_customers": """
            SELECT n_name, CAST(COUNT(c_custkey) AS BIGINT) AS n_customers
            FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "interactions_page": """
            WITH base AS (
                SELECT CAST(event_id AS VARCHAR) AS id,
                       ts AS "timestamp",
                       'q-' || CAST(event_id AS VARCHAR) AS question,
                       CASE WHEN event_id % 5 = 0 THEN 'm2'
                            ELSE 'm1' END AS model,
                       event_type AS version,
                       CAST(ROUND(value*100) AS BIGINT) AS processingTime,
                       event_id
                FROM events)
            SELECT id, "timestamp", question, model, version, processingTime
            FROM base
            WHERE version = 'click'
              AND (event_id % 7 != 0 OR event_id % 5 = 0)
            ORDER BY "timestamp" DESC, id
            LIMIT 20 OFFSET 10
        """,
        "kg_rel_nodes": """
            SELECT DISTINCT r_name AS node_id, 'region' AS node_type FROM region
            UNION SELECT DISTINCT n_name, 'nation' FROM nation
            UNION SELECT DISTINCT c_name, 'customer' FROM customer
            UNION SELECT DISTINCT 'order-' || CAST(o_orderkey AS VARCHAR), 'order' FROM orders
        """,
        "kg_rel_degree": f"""
            SELECT subj, COUNT(*) AS out_degree
            FROM ({_KG_REL_TRIPLES_SQL}) GROUP BY subj
        """,
        "kg_rel_pagerank": f"""
            -- fixed-point integer PageRank, 3 unrolled iterations:
            -- pr_0 = 10^9; pr_k+1 = floor(0.15*10^9)
            --   + SUM(pr_k(u)*85 // (100*outdeg(u))) over in-edges.
            -- all-int64 arithmetic is order-independent, which is what
            -- lets a DISTRIBUTED PageRank hash-match a SQL oracle
            WITH triples AS ({_KG_REL_TRIPLES_SQL}),
            edges AS (SELECT subj AS src, obj AS dst FROM triples),
            outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
            nodes AS (SELECT src AS node FROM edges
                      UNION SELECT dst FROM edges),
            pr0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr
                    FROM nodes),
            c1 AS (SELECT e.dst AS node,
                          CAST(SUM((p.pr * 85) // (100 * o.d)) AS BIGINT)
                              AS c
                   FROM edges e
                   JOIN pr0 p ON e.src = p.node
                   JOIN outdeg o ON e.src = o.src
                   GROUP BY e.dst),
            pr1 AS (SELECT n.node,
                           CAST(150000000 + COALESCE(c.c, 0) AS BIGINT)
                               AS pr
                    FROM nodes n LEFT JOIN c1 c USING (node)),
            c2 AS (SELECT e.dst AS node,
                          CAST(SUM((p.pr * 85) // (100 * o.d)) AS BIGINT)
                              AS c
                   FROM edges e
                   JOIN pr1 p ON e.src = p.node
                   JOIN outdeg o ON e.src = o.src
                   GROUP BY e.dst),
            pr2 AS (SELECT n.node,
                           CAST(150000000 + COALESCE(c.c, 0) AS BIGINT)
                               AS pr
                    FROM nodes n LEFT JOIN c2 c USING (node)),
            c3 AS (SELECT e.dst AS node,
                          CAST(SUM((p.pr * 85) // (100 * o.d)) AS BIGINT)
                              AS c
                   FROM edges e
                   JOIN pr2 p ON e.src = p.node
                   JOIN outdeg o ON e.src = o.src
                   GROUP BY e.dst),
            pr3 AS (SELECT n.node,
                           CAST(150000000 + COALESCE(c.c, 0) AS BIGINT)
                               AS pr
                    FROM nodes n LEFT JOIN c3 c USING (node))
            SELECT node, pr FROM pr3
        """,
        "doc_token_stats": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                   length(text) AS n_chars,
                   len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                   x -> x IN {_STOPLIST_SQL})) AS n_stop_en
            FROM documents
        """,
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
        "doc_repetition_stats": r"""
            WITH toks AS (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(trim(text), '\s+'),
                    x -> x <> '')) AS token
                FROM documents),
            per AS (SELECT doc_id, token, COUNT(*) AS c
                    FROM toks GROUP BY doc_id, token),
            agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                           CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
                           CAST(MAX(c) AS BIGINT) AS top_token_count
                    FROM per GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(a.n_distinct_tokens, 0) AS BIGINT)
                       AS n_distinct_tokens,
                   CAST(COALESCE(a.n_tokens - a.n_distinct_tokens, 0)
                       AS BIGINT) AS dup_token_count,
                   CAST(COALESCE(a.top_token_count, 0) AS BIGINT)
                       AS top_token_count
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "doc_quality_percentile_filter": r"""
            WITH s AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+'))
                       END AS n_tokens
                FROM documents)
            SELECT doc_id, n_tokens FROM s
            WHERE n_tokens >= (SELECT quantile_disc(n_tokens, 0.1) FROM s)
        """,
        "docs_redacted": r"""
            SELECT doc_id,
                   regexp_replace(text, '\b(customer|spark)\b', '<ENT>', 'g')
                       AS clean_text
            FROM documents
        """,
        "embedding_dim_stats": """
            -- per-dimension exact-integer moments (sum of round(x*1e6),
            -- sum of round(x*1e3)^2): integer partials make the
            -- distributed merge order-independent and hash-stable
            -- CAST to DOUBLE before scaling: bare embedding[i]*1e6
            -- would multiply in FLOAT32 and round differently from the
            -- engine's float64 path (float32*1e6 is exact in double)
            SELECT i,
                   CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE)
                                       * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_e6,
                   CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE)
                                       * 1000) AS BIGINT)
                            * CAST(ROUND(CAST(embedding[i] AS DOUBLE)
                                         * 1000) AS BIGINT))
                        AS BIGINT) AS sumsq_e3,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM embeddings, generate_series(1, 64) AS t(i)
            GROUP BY i
        """,
        "cluster_assign_embeddings": r"""
            WITH cent AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb
                FROM embeddings ORDER BY vec_id LIMIT 8)
            SELECT e.vec_id,
                   CAST((SELECT cid FROM cent
                         ORDER BY list_distance(
                             CAST(e.embedding AS DOUBLE[]), cemb), cid
                         LIMIT 1) AS BIGINT) AS centroid_id
            FROM embeddings e
        """,
        "doc_lang_marker_counts": """
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS en_hits,
                   len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS de_hits,
                   len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS fr_hits,
                   len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x IN ('el','la','los','y','es','un','una','en','por','para'))) AS es_hits
            FROM documents
        """,
        "doc_quality_filter": f"""
            WITH s AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                       len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                       x -> x IN {_STOPLIST_SQL})) AS n_stop_en
                FROM documents)
            SELECT doc_id, n_tokens, n_stop_en FROM s
            WHERE n_tokens BETWEEN 50 AND 200 AND 20*n_stop_en >= n_tokens
        """,
        "dedup_exact_docs": """
            SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_id,
                   COUNT(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_keep_best_docs": """
            WITH s AS (
                SELECT doc_id, md5(text) AS fingerprint,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents),
            r AS (
                SELECT *,
                       row_number() OVER (
                           PARTITION BY fingerprint
                           ORDER BY n_tokens DESC, doc_id) AS rn,
                       COUNT(*) OVER (PARTITION BY fingerprint) AS n_copies
                FROM s)
            SELECT fingerprint, doc_id AS keep_id,
                   n_tokens AS keep_n_tokens, n_copies
            FROM r WHERE rn = 1
        """,
        "frame_sample_plan": """
            SELECT 'media://vid/' || CAST(doc_id AS VARCHAR) AS media_ref,
                   CAST(i AS INTEGER) AS frame_idx,
                   CAST(i * 1000 AS INTEGER) AS ts_ms
            FROM documents
            CROSS JOIN unnest(generate_series(
                0, (3000 + 500 * (doc_id % 4) - 1) // 1000)) AS u(i)
        """,
        "media_resize_plan": """
            WITH m AS (
                SELECT 'media://img/' || CAST(doc_id AS VARCHAR) AS media_ref,
                       320 + (doc_id % 5) * 80 AS in_w,
                       200 + (doc_id % 7) * 60 AS in_h
                FROM documents)
            SELECT media_ref,
                   CAST(in_w AS INTEGER) AS in_w,
                   CAST(in_h AS INTEGER) AS in_h,
                   CAST(CASE WHEN in_w * 224 >= in_h * 224 THEN 224
                        ELSE GREATEST(1, (in_w * 224) // in_h)
                   END AS INTEGER) AS out_w,
                   CAST(CASE WHEN in_w * 224 >= in_h * 224
                        THEN GREATEST(1, (in_h * 224) // in_w)
                        ELSE 224
                   END AS INTEGER) AS out_h
            FROM m
        """,
        "sample_docs_hash": """
            SELECT doc_id, n_chars FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
        """,
        "sample_docs_stratified": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rn
                FROM documents)
            WHERE rn <= 3
        """,
        "doc_top_bigrams": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS ts
                FROM documents
            ), big AS (
                SELECT ts[i] || ' ' || ts[i+1] AS bigram
                FROM toks
                CROSS JOIN unnest(generate_series(1, len(ts) - 1)) AS u(i)
            )
            SELECT bigram, COUNT(*) AS n FROM big
            GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
        """,
        "doc_top_tokens": r"""
            WITH toks AS (
                SELECT unnest(list_filter(
                    regexp_split_to_array(text, '\s+'),
                    x -> x <> '')) AS token
                FROM documents)
            SELECT token, COUNT(*) AS count_lo, COUNT(*) AS count_hi,
                   TRUE AS exact
            FROM toks GROUP BY token
            ORDER BY count_lo DESC, token LIMIT 20
        """,
        "doc_top_terms": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS ts
                FROM documents
            ), tf AS (
                SELECT doc_id, t AS token, COUNT(*) AS tf
                FROM toks CROSS JOIN unnest(ts) AS u(t)
                GROUP BY doc_id, t
            ), df AS (
                SELECT token, COUNT(*) AS df FROM tf GROUP BY token
            )
            SELECT doc_id, token, tf, df FROM (
                SELECT tf.doc_id, tf.token, tf.tf, df.df,
                       row_number() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf DESC, df.df ASC, tf.token ASC
                       ) AS rn
                FROM tf JOIN df USING (token))
            WHERE rn = 1
        """,
        "neardup_triangles": r"""
            -- degree-split exact triangle count on the Jaccard>=0.9
            -- graph; the orient/wedge CTEs mirror the compact-forward
            -- (deg, id) total order of functions/triangles.py
            WITH toks AS (
                SELECT doc_id,
                       list_distinct(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS ts
                FROM documents
            ), ne AS (SELECT * FROM toks WHERE len(ts) > 0),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM ne a JOIN ne b ON a.doc_id < b.doc_id
                WHERE 10 * len(list_intersect(a.ts, b.ts))
                      >= 9 * (len(a.ts) + len(b.ts)
                              - len(list_intersect(a.ts, b.ts)))
            ),
            deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
                    FROM (SELECT id_a AS node FROM pairs
                          UNION ALL SELECT id_b AS node FROM pairs)
                    GROUP BY node),
            lowp AS (SELECT p.id_a, p.id_b,
                            da.deg AS deg_a, db.deg AS deg_b
                     FROM pairs p
                     JOIN deg da ON da.node = p.id_a
                     JOIN deg db ON db.node = p.id_b
                     WHERE da.deg <= 64 AND db.deg <= 64),
            orient AS (SELECT
                CASE WHEN (deg_a, id_a) < (deg_b, id_b)
                     THEN id_a ELSE id_b END AS src,
                CASE WHEN (deg_a, id_a) < (deg_b, id_b)
                     THEN id_b ELSE id_a END AS dst,
                CASE WHEN (deg_a, id_a) < (deg_b, id_b)
                     THEN deg_b ELSE deg_a END AS ddeg
                FROM lowp),
            wedges AS (SELECT o1.dst AS v, o2.dst AS w
                       FROM orient o1 JOIN orient o2
                       ON o1.src = o2.src
                       AND (o1.ddeg, o1.dst) < (o2.ddeg, o2.dst))
            SELECT
                CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
                CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
                CAST((SELECT COUNT(*) FROM deg WHERE deg > 64)
                    AS BIGINT) AS n_hub_nodes,
                CAST((SELECT COUNT(*) FROM lowp)
                    AS BIGINT) AS n_edges_low,
                CAST((SELECT COUNT(*) FROM wedges)
                    AS BIGINT) AS n_wedges_low,
                CAST((SELECT COUNT(*) FROM wedges wd
                      JOIN orient o3 ON o3.src = wd.v
                      AND o3.dst = wd.w) AS BIGINT) AS n_triangles_low
        """,
        "ssjoin_jaccard_docs": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_distinct(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS ts
                FROM documents
            ), ne AS (SELECT * FROM toks WHERE len(ts) > 0)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.ts, b.ts)) AS n_inter,
                   len(a.ts) + len(b.ts)
                       - len(list_intersect(a.ts, b.ts)) AS n_union
            FROM ne a JOIN ne b ON a.doc_id < b.doc_id
            WHERE 10 * len(list_intersect(a.ts, b.ts))
                  >= 9 * (len(a.ts) + len(b.ts)
                          - len(list_intersect(a.ts, b.ts)))
        """,
        "split_docs_hash": """
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('c', 'd') THEN 'val'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('e', 'f') THEN 'test'
                        ELSE 'train' END AS split
            FROM documents
        """,
        "source_cap_docs": """
            SELECT source, doc_id, n_chars FROM (
                SELECT source, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id) AS rn
                FROM documents)
            WHERE rn <= 2
        """,
        "decontaminate_docs": r"""
            WITH toks AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(text, '\s+'), x -> x <> '') AS ts
                FROM documents),
            grams AS (
                SELECT doc_id, array_to_string(ts[i:i+3], ' ') AS g
                FROM toks
                CROSS JOIN unnest(generate_series(1, len(ts) - 3)) AS u(i)
                WHERE len(ts) >= 4),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 101 = 0)
            SELECT g.doc_id, COUNT(DISTINCT g.g) AS n_hits
            FROM grams g JOIN bench b ON g.g = b.g
            WHERE g.doc_id % 101 <> 0
            GROUP BY g.doc_id
        """,
        "doc_chunk_dedup": """
            -- C4-style chunk dedup: 3-word disjoint windows; a chunk
            -- occurring in >= 4 distinct docs is boilerplate and is
            -- removed everywhere; docs reassemble from the survivors
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            chunks AS (
              SELECT doc_id, i AS ci,
                     array_to_string(w[(i*3+1):(i*3+3)], ' ') AS chunk
              FROM toks,
                   UNNEST(range(CAST(ceil(len(w)/3.0) AS BIGINT))) AS t(i)),
            hot AS (
              SELECT chunk FROM chunks
              GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 4),
            marked AS (
              SELECT c.doc_id, c.ci, c.chunk,
                     CASE WHEN h.chunk IS NULL THEN 1 ELSE 0 END AS keep
              FROM chunks c LEFT JOIN hot h USING (chunk))
            SELECT doc_id,
                   string_agg(chunk, ' ' ORDER BY ci)
                       FILTER (WHERE keep = 1) AS text_clean,
                   CAST(SUM(keep) AS BIGINT) AS n_kept,
                   CAST(SUM(1 - keep) AS BIGINT) AS n_removed
            FROM marked GROUP BY doc_id
            HAVING SUM(keep) > 0
        """,
        "docs_normalized": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                       AS norm_fp,
                   length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                       AS n_chars_norm
            FROM documents
        """,
        "mixture_sample_docs": """
            SELECT doc_id, source FROM documents
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                       AS INTEGER)
                  < 64 * (CAST(substr(source, 4) AS INTEGER) % 4 + 1)
        """,
        "incremental_dedup_docs": r"""
            WITH fp AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(lower(text), '\s+', ' ',
                                               'g'))) AS fp
                FROM documents),
            old AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0)
            SELECT f.doc_id FROM fp f
            WHERE f.doc_id % 2 = 1
              AND f.fp NOT IN (SELECT fp FROM old)
        """,
        "training_mix_docs": r"""
            WITH toks AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(text, '\s+'), x -> x <> '') AS ts
                FROM documents),
            grams AS (
                SELECT doc_id, array_to_string(ts[i:i+3], ' ') AS g
                FROM toks
                CROSS JOIN unnest(generate_series(1, len(ts) - 3)) AS u(i)
                WHERE len(ts) >= 4),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 101 = 0),
            contaminated AS (
                SELECT DISTINCT g.doc_id
                FROM grams g JOIN bench b ON g.g = b.g
                WHERE g.doc_id % 101 <> 0),
            cand AS (
                SELECT doc_id, source, text FROM documents
                WHERE n_chars >= 100 AND doc_id % 101 <> 0
                  AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
            kept AS (
                SELECT doc_id, source FROM (
                    SELECT doc_id, source, row_number() OVER (
                        PARTITION BY md5(trim(regexp_replace(
                            lower(text), '\s+', ' ', 'g')))
                        ORDER BY doc_id) AS rn
                    FROM cand)
                WHERE rn = 1)
            SELECT doc_id, source,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('c', 'd') THEN 'val'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('e', 'f') THEN 'test'
                        ELSE 'train' END AS split
            FROM kept
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                       AS INTEGER)
                  < 64 * (CAST(substr(source, 4) AS INTEGER) % 4 + 1)
        """,
        "ssjoin_ngram_docs": r"""
            WITH toks AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(text, '\s+'), x -> x <> '') AS ts
                FROM documents),
            sh AS (
                SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, len(ts) - 2),
                    i -> array_to_string(ts[i:i+2], ' '))) AS ss
                FROM toks WHERE len(ts) >= 3)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.ss, b.ss)) AS n_inter,
                   len(a.ss) + len(b.ss)
                       - len(list_intersect(a.ss, b.ss)) AS n_union
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE 2 * len(list_intersect(a.ss, b.ss))
                  >= 1 * (len(a.ss) + len(b.ss)
                          - len(list_intersect(a.ss, b.ss)))
        """,
        "sim_topk_embeddings": """
            SELECT e.vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
                   ), 4) AS sim_r
            FROM embeddings e
            ORDER BY sim_r DESC, e.vec_id
            LIMIT 10
        """,
        "sim_ivf_exhaustive_topk": """
            SELECT e.vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
                   ), 4) AS sim_r
            FROM embeddings e
            ORDER BY sim_r DESC, e.vec_id
            LIMIT 10
        """,
    }
    # the bloom pre-filter variant is output-identical to the plain
    # anti-join (false positives only cost verify work) — same oracle
    out["incremental_dedup_bloom"] = out["incremental_dedup_docs"]
    # the bucketed distributed range join is output-identical to the
    # broadcast variant — same oracle
    out["events_in_windows_dist"] = out["events_in_windows"]
    out["users_click_and_purchase"] = """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """
    out["users_click_not_purchase"] = """
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """
    out["events_value_mad"] = """
        -- robust stats: median + median-absolute-deviation, both via
        -- discrete (exact) quantiles over integer cents
        WITH m AS (
          SELECT event_type,
                 quantile_disc(CAST(ROUND(value*100) AS BIGINT), 0.5)
                     AS med
          FROM events GROUP BY event_type)
        SELECT e.event_type, m.med AS median_cents,
               quantile_disc(abs(CAST(ROUND(e.value*100) AS BIGINT)
                                 - m.med), 0.5) AS mad_cents
        FROM events e JOIN m USING (event_type)
        GROUP BY e.event_type, m.med
    """
    # k-core (k=2, 4 unrolled peel rounds) on the Jaccard>=0.9 graph —
    # the fixed-iteration convention of kg_rel_pagerank: the engine
    # early-stops when a round removes no edge, which leaves the result
    # identical to running all 4 no-op rounds here
    peel = [r"""
        WITH toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(
                       regexp_split_to_array(text, '\s+'),
                       x -> x <> '')) AS ts
            FROM documents
        ), ne AS MATERIALIZED (SELECT * FROM toks WHERE len(ts) > 0),
        e0 AS MATERIALIZED (
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM ne a JOIN ne b ON a.doc_id < b.doc_id
            WHERE 10 * len(list_intersect(a.ts, b.ts))
                  >= 9 * (len(a.ts) + len(b.ts)
                          - len(list_intersect(a.ts, b.ts)))
        )"""]
    for i in range(4):
        peel.append(f""",
        d{i} AS MATERIALIZED (SELECT node, COUNT(*) AS deg
                 FROM (SELECT a AS node FROM e{i}
                       UNION ALL SELECT b FROM e{i}) GROUP BY node),
        n{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= 2),
        e{i + 1} AS MATERIALIZED (SELECT a, b FROM e{i}
                     WHERE a IN (SELECT node FROM n{i})
                       AND b IN (SELECT node FROM n{i}))""")
    peel.append("""
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4)
        GROUP BY node""")
    out["neardup_kcore"] = "".join(peel)
    # bounded min-label propagation (8 unrolled rounds >= measured max
    # eccentricity 7) == exact connected components at test scales; the
    # engine early-stops on label-sum convergence, leaving the no-op
    # tail rounds identical
    prop = [r"""
        WITH toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(
                       regexp_split_to_array(text, '\s+'),
                       x -> x <> '')) AS ts
            FROM documents
        ), ne AS MATERIALIZED (SELECT * FROM toks WHERE len(ts) > 0),
        e AS MATERIALIZED (
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM ne a JOIN ne b ON a.doc_id < b.doc_id
            WHERE 10 * len(list_intersect(a.ts, b.ts))
                  >= 9 * (len(a.ts) + len(b.ts)
                          - len(list_intersect(a.ts, b.ts)))
        ),
        l0 AS MATERIALIZED (SELECT node, node AS lbl
               FROM (SELECT a AS node FROM e UNION SELECT b FROM e))"""]
    for i in range(8):
        prop.append(f""",
        l{i + 1} AS MATERIALIZED (SELECT node, MIN(lbl) AS lbl FROM (
            SELECT node, lbl FROM l{i}
            UNION ALL
            SELECT e.b AS node, l.lbl FROM e JOIN l{i} l ON l.node = e.a
            UNION ALL
            SELECT e.a AS node, l.lbl FROM e JOIN l{i} l ON l.node = e.b
        ) GROUP BY node)""")
    prop.append("""
        SELECT node AS doc_id, CAST(lbl AS BIGINT) AS component FROM l8""")
    out["neardup_components_exact"] = "".join(prop)
    # dedup capstone: keep untouched docs + each component's minimum
    # (same 8-round propagation; identical docs pair at J=1, so exact
    # dups are subsumed by the near-dup graph)
    out["dedup_final_docs"] = "".join(prop[:-1]) + """
        SELECT d.doc_id FROM documents d
        LEFT JOIN l8 ON l8.node = d.doc_id
        WHERE l8.lbl IS NULL OR l8.lbl = d.doc_id"""
    # dedup-QA histogram on top of the same propagation
    out["user_value_autocorr"] = """
        -- lag-1 Pearson autocorrelation from exact integer sums;
        -- degenerate users filtered by INTEGER variance conditions
        WITH p AS (SELECT user_id,
                          CAST(ROUND(value * 100) AS BIGINT) AS c,
                          LAG(CAST(ROUND(value * 100) AS BIGINT), 1)
                              OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
                   FROM events),
        q AS (SELECT user_id, prev AS x, c AS y FROM p
              WHERE prev IS NOT NULL),
        s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx,
                     CAST(SUM(y * y) AS BIGINT) AS syy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy
              FROM q GROUP BY user_id
              HAVING COUNT(*) * SUM(x * x) > SUM(x) * SUM(x)
                 AND COUNT(*) * SUM(y * y) > SUM(y) * SUM(y)),
        d AS (SELECT user_id, CAST(n AS DOUBLE) AS n,
                     CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
                     CAST(sxx AS DOUBLE) AS sxx,
                     CAST(syy AS DOUBLE) AS syy,
                     CAST(sxy AS DOUBLE) AS sxy
              FROM s)
        SELECT user_id,
               (n * sxy - sx * sy)
                   / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                   AS autocorr
        FROM d
    """
    out["events_value_decile_stats"] = """
        -- rank-based equi-depth buckets: 10*(rn-1)//n, all-integer
        WITH p AS (SELECT event_id,
                          CAST(ROUND(value * 100) AS BIGINT) AS c
                   FROM events),
        r AS (SELECT c,
                     row_number() OVER (ORDER BY c, event_id) AS rn,
                     (SELECT COUNT(*) FROM p) AS n
              FROM p)
        SELECT (10 * (rn - 1)) // n AS bucket,
               CAST(MIN(c) AS BIGINT) AS lo_c,
               CAST(MAX(c) AS BIGINT) AS hi_c,
               CAST(SUM(c) AS BIGINT) AS sum_c,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM r GROUP BY 1
    """
    out["cohort_value_triangle"] = """
        WITH ev AS (
          SELECT user_id,
                 CAST(floor(epoch(ts)/86400) AS BIGINT) // 7 AS week,
                 CAST(ROUND(value * 100) AS BIGINT) AS c
          FROM events),
        firsts AS (
          SELECT user_id, MIN(week) AS cohort_week
          FROM ev GROUP BY user_id)
        SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
               CAST(SUM(e.c) AS BIGINT) AS value_cents,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM ev e JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    """
    out["diverse_sample_embeddings"] = r"""
        WITH cent AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb
            FROM embeddings ORDER BY vec_id LIMIT 8),
        assign AS (
            SELECT e.vec_id,
                   CAST((SELECT cid FROM cent
                         ORDER BY list_distance(
                             CAST(e.embedding AS DOUBLE[]), cemb), cid
                         LIMIT 1) AS BIGINT) AS centroid_id
            FROM embeddings e),
        ranked AS (
            SELECT centroid_id, vec_id,
                   row_number() OVER (
                       PARTITION BY centroid_id
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                       AS rn
            FROM assign)
        SELECT centroid_id, vec_id FROM ranked WHERE rn <= 5
    """
    out["docs_snapshot_diff"] = """
        -- CDC diff of two deterministic snapshots via FULL OUTER JOIN
        WITH oldsnap AS (
            SELECT doc_id, md5(text) AS fp_old
            FROM documents WHERE doc_id % 7 <> 0),
        newsnap AS (
            SELECT doc_id,
                   md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                            ELSE text END) AS fp_new
            FROM documents WHERE doc_id % 3 <> 0),
        d AS (
            SELECT doc_id,
                   CASE WHEN fp_old IS NULL THEN 'added'
                        WHEN fp_new IS NULL THEN 'removed'
                        WHEN fp_old <> fp_new THEN 'changed'
                        END AS change
            FROM oldsnap FULL OUTER JOIN newsnap USING (doc_id))
        SELECT doc_id, change FROM d WHERE change IS NOT NULL
    """
    out["events_value_gini"] = """
        -- sorted-rank Gini from integer sufficient statistics;
        -- mirrored IEEE division tree (the corr/zscore convention)
        WITH p AS (SELECT event_type, event_id,
                          CAST(ROUND(value * 100) AS BIGINT) AS c
                   FROM events),
        r AS (SELECT event_type, c,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY c, event_id) AS rn
              FROM p),
        s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(c) AS BIGINT) AS s,
                     CAST(SUM(rn * c) AS BIGINT) AS sr
              FROM r GROUP BY event_type)
        SELECT event_type,
               (2.0 * sr) / CAST(n * s AS DOUBLE)
                   - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
        FROM s
    """
    # personalized PageRank, teleport restricted to the region roots:
    # kg_rel_pagerank's all-int64 fixed-point spec with pr_0 = unit*[v
    # in S] and base = 0.15*unit*[v in S]; 3 unrolled iterations
    _ppr = [f"""
        WITH triples AS MATERIALIZED ({_KG_REL_TRIPLES_SQL}),
        edges AS (SELECT subj AS src, obj AS dst FROM triples),
        outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        seeds AS (SELECT DISTINCT r_name AS node FROM region),
        flagged AS (SELECT n.node,
                           CASE WHEN s.node IS NULL THEN 0 ELSE 1 END
                               AS sv
                    FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
        pr0 AS (SELECT node, CAST(sv * 1000000000 AS BIGINT) AS pr
                FROM flagged)"""]
    for i in range(3):
        _ppr.append(f""",
        c{i + 1} AS (SELECT e.dst AS node,
                     CAST(SUM((p.pr * 85) // (100 * o.d)) AS BIGINT)
                         AS c
              FROM edges e
              JOIN pr{i} p ON e.src = p.node
              JOIN outdeg o ON e.src = o.src
              GROUP BY e.dst),
        pr{i + 1} AS (SELECT f.node,
                      CAST(f.sv * 150000000 + COALESCE(c.c, 0)
                           AS BIGINT) AS pr
               FROM flagged f LEFT JOIN c{i + 1} c USING (node))""")
    _ppr.append("""
        SELECT node, pr FROM pr3""")
    out["kg_rel_ppr"] = "".join(_ppr)
    # binary cosine (Ochiai): keep test squared into integers, n_union
    # still reported so the output schema matches the Jaccard join
    out["ssjoin_cosine_docs"] = r"""
        WITH toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(
                       regexp_split_to_array(text, '\s+'),
                       x -> x <> '')) AS ts
            FROM documents
        ), ne AS (SELECT * FROM toks WHERE len(ts) > 0)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.ts, b.ts)) AS n_inter,
               len(a.ts) + len(b.ts)
                   - len(list_intersect(a.ts, b.ts)) AS n_union
        FROM ne a JOIN ne b ON a.doc_id < b.doc_id
        WHERE 400 * len(list_intersect(a.ts, b.ts))
                  * len(list_intersect(a.ts, b.ts))
              >= 361 * len(a.ts) * len(b.ts)
    """
    # bounded BFS (6 hops >= measured pair-graph eccentricity) from the
    # dup graph's minimum doc id: hop-bounded WITH RECURSIVE over the
    # same ssjoin base; UNION dedups (node, hop) states so the
    # recursion terminates, MIN(hop) is the BFS level
    out["neardup_bfs_levels"] = r"""
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(
                       regexp_split_to_array(text, '\s+'),
                       x -> x <> '')) AS ts
            FROM documents
        ), ne AS MATERIALIZED (SELECT * FROM toks WHERE len(ts) > 0),
        pairs AS MATERIALIZED (
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM ne a JOIN ne b ON a.doc_id < b.doc_id
            WHERE 10 * len(list_intersect(a.ts, b.ts))
                  >= 9 * (len(a.ts) + len(b.ts)
                          - len(list_intersect(a.ts, b.ts)))
        ),
        edges AS MATERIALIZED (SELECT a AS u, b AS v FROM pairs
                               UNION ALL SELECT b, a FROM pairs),
        walk(node, hop) AS (
            SELECT (SELECT MIN(a) FROM pairs), CAST(0 AS BIGINT)
            UNION
            SELECT e.v, w.hop + 1
            FROM walk w JOIN edges e ON e.u = w.node
            WHERE w.hop < 6
        )
        SELECT node, MIN(hop) AS hop FROM walk
        WHERE node IS NOT NULL  -- empty pair graph: seed subquery
                                -- yields NULL; engine emits 0 rows
        GROUP BY node
    """
    # layered containment chain: depth-bounded recursion, UNION ALL
    # mirrors the engine's join-per-level exactly (no dedup on either
    # side; depth is unique per pair because the chain is a DAG of
    # strict layers)
    out["kg_taxonomy_closure"] = f"""
        WITH RECURSIVE triples AS MATERIALIZED ({_KG_REL_TRIPLES_SQL}),
        cl(anc, de, depth) AS (
            SELECT subj, obj, CAST(1 AS BIGINT) FROM triples
            UNION ALL
            SELECT c.anc, t.obj, c.depth + 1
            FROM cl c JOIN triples t ON t.subj = c.de
            WHERE c.depth < 3
        )
        SELECT anc, de, depth FROM cl
    """
    out["events_value_histogram"] = """
        SELECT c // 500 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(c) AS BIGINT) AS sum_value_c
        FROM (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events)
        GROUP BY bucket
    """
    out["events_profile"] = """
        SELECT 'event_type' AS col_name,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct,
               CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS n_null
        FROM events
        UNION ALL
        SELECT 'props', COUNT(DISTINCT props), COUNT(*) - COUNT(props)
        FROM events
        UNION ALL
        SELECT 'user_id', COUNT(DISTINCT user_id),
               COUNT(*) - COUNT(user_id)
        FROM events
    """
    out["events_hour_value_corr"] = """
        -- mirrored IEEE tree over exact integer sums (the
        -- events_value_zscore convention)
        WITH p AS (SELECT event_type,
                          CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
                          CAST(ROUND(value * 100) AS BIGINT) AS c
                   FROM events),
        s AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(h) AS DOUBLE) AS sh,
                     CAST(SUM(c) AS DOUBLE) AS sc,
                     CAST(SUM(h * h) AS DOUBLE) AS shh,
                     CAST(SUM(c * c) AS DOUBLE) AS scc,
                     CAST(SUM(h * c) AS DOUBLE) AS shc
              FROM p GROUP BY event_type)
        SELECT event_type,
               (n * shc - sh * sc)
                   / (sqrt(n * shh - sh * sh) * sqrt(n * scc - sc * sc))
                   AS corr_hv
        FROM s
    """
    out["top_orders_with_ties"] = """
        SELECT o_custkey, o_orderkey, price_b, rnk FROM (
            SELECT o_custkey, o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                       AS price_b,
                   CAST(rank() OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                // 10000 DESC) AS BIGINT) AS rnk
            FROM orders)
        WHERE rnk <= 2
    """
    # the uniform draw is the first 8 md5 hex digits read as a uint32,
    # reconstructed digit-by-digit (no hex->int builtin shared by both
    # engines); threshold arithmetic is double on both sides
    _digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1)"
        f" * CAST({16 ** (8 - i)} AS BIGINT)" for i in range(1, 9))
    out["weighted_sample_docs"] = f"""
        WITH h AS (SELECT doc_id, n_chars,
                          md5(CAST(doc_id AS VARCHAR)) AS hx
                   FROM documents)
        SELECT doc_id, n_chars FROM h
        WHERE CAST({_digits} AS DOUBLE)
              < LEAST(1.0, CAST(n_chars AS DOUBLE) / 2000.0)
                * 4294967296.0
    """
    out["neardup_cluster_sizes"] = "".join(prop[:-1]) + """,
        comp AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS cluster_size
                 FROM l8 GROUP BY lbl)
        SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
        FROM comp GROUP BY cluster_size"""
    return out
