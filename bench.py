"""Benchmark harness (driver contract).

Runs the headline KG-construction pipeline over a deterministic
interleaved corpus scaled to $GRAFT_SF_DIR, plus the relational/document
operator queries over the sf tables, and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "docs_per_s": ..., "triples_per_s": ...}

`python bench.py --scaling` re-runs the headline in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports throughputs +
scaling efficiency (the sandbox evidence for the N→4N cluster criterion;
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# corpus scale per sf tier (docs); ~17 emission rows/doc
_N_DOCS = {"0.001": 500, "0.01": 4000, "0.1": 20000}


def _sf_tag(sf_dir: str) -> str:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return m.group(1) if m else "0.1"


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from datacapsule_ray.fixtures import write_corpus
    from datacapsule_ray.pipelines import docops, relational as r
    from datacapsule_ray.pipelines.build_graph import KGPipeline

    sf = _sf_tag(SF_DIR)
    n_docs = int(os.environ.get("GRAFT_BENCH_DOCS", _N_DOCS.get(sf, 20000)))

    # corpus is content-addressed (seed, range) → generated once, reused;
    # warm the page cache with one untimed read
    corpus_dir = f"/tmp/dcray_bench_corpus_{n_docs}"
    files = write_corpus(corpus_dir, n_docs, seed=42, docs_per_file=2500)
    for f in files:
        with open(f, "rb") as fh:
            fh.read()

    results: dict[str, float] = {}

    # headline: full KG construction into a FRESH checkpoint root.
    # Run TWICE and report the min: this host shows heavy co-tenant
    # noise (the identical job has measured 17s and 30s minutes apart;
    # see BASELINE.md) and a single sample can misread a 2x-noisy
    # window as a regression. Both raw trials are emitted
    # (``kg_trials``) so the spread stays visible.
    # files_per_partition=16 → fewer, fatter partition executions: the
    # per-partition streaming-execution spin-up dominated at fpp=8
    # (measured 15.9s → 7.9s extraction at 160k docs); resume
    # granularity stays partition-level
    fpp = int(os.environ.get("GRAFT_BENCH_FPP", "16"))
    # emitter pool scaled to the corpus: a 28-actor pool pays ~2s of
    # spin-up that a 20k-doc run never amortizes (measured 5.5s -> 3.8s
    # extraction with a 10-actor cap); big corpora still get the full
    # pool
    pool_cap = min(max(2, NUM_CPUS - 4), max(4, n_docs // 2000))
    n_trials = max(1, int(os.environ.get("GRAFT_BENCH_TRIALS", "2")))
    kg_trials: list[float] = []
    for trial in range(n_trials):
        ck = f"/tmp/dcray_bench_ck_{os.getpid()}_{trial}"
        shutil.rmtree(ck, ignore_errors=True)
        t0 = time.monotonic()
        pipe = KGPipeline(ck, emitter_concurrency=(1, pool_cap),
                          batch_size=256)
        out = pipe.run_all(files, files_per_partition=fpp,
                           with_vectors=True)
        kg_trials.append(round(time.monotonic() - t0, 3))
        n_triples = sum(r_["rows_out"] for r_ in pipe.store.lineage("edges"))
        emissions_rows = sum(
            r_["rows_out"] for r_ in pipe.store.lineage("emissions"))
        shutil.rmtree(ck, ignore_errors=True)
    kg_sec = min(kg_trials)
    results["kg_pipeline"] = kg_sec

    def timed(name, fn):
        if os.environ.get("GRAFT_BENCH_SKIP_QUERIES"):
            return  # scaling trials time only the KG job (the metric)
        # min of 2 trials, same convention as the KG headline: this
        # host's co-tenant noise spans ±50% on single samples (a query
        # measured 3.3s and 11.7s in back-to-back sessions) and min is
        # the standard estimator for the noise-free cost
        trials = []
        for _ in range(int(os.environ.get("GRAFT_BENCH_QUERY_TRIALS",
                                          "2"))):
            t = time.monotonic()
            res = fn(SF_DIR)
            # consume lazily-built datasets
            if hasattr(res, "to_pandas"):
                res.to_pandas()
            trials.append(time.monotonic() - t)
        results[name] = round(min(trials), 3)

    timed("q1_pricing_summary", r.q1_pricing_summary)
    timed("revenue_by_nation", r.revenue_by_nation)
    timed("brand_nation_revenue", r.brand_nation_revenue)
    timed("top10_customers", r.top10_customers)
    timed("top3_orders_per_customer", r.top3_orders_per_customer)
    timed("events_daily", r.events_daily)
    timed("user_sessions", r.user_sessions)
    timed("kg_rel_degree", lambda s: r.kg_rel_degree(s))
    timed("doc_token_stats", docops.doc_token_stats)
    timed("dedup_exact_docs", docops.dedup_exact_docs)
    timed("dedup_minhash_docs", docops.dedup_minhash_docs)
    timed("dedup_simhash_docs", docops.dedup_simhash_docs)
    timed("ssjoin_jaccard_docs", docops.ssjoin_jaccard_docs)
    timed("doc_top_bigrams", docops.doc_top_bigrams)
    timed("doc_top_tokens", docops.doc_top_tokens)
    timed("doc_pack_plan", docops.doc_pack_plan)
    timed("doc_top_terms", docops.doc_top_terms)
    timed("user_event_paths", r.user_event_paths)
    timed("events_asof_purchase", r.events_asof_purchase)
    timed("events_value_quantiles", r.events_value_quantiles)
    timed("user_rolling_value", r.user_rolling_value)
    # round-4 window family: RANGE time frame, LAG/LEAD, ROW_NUMBER
    timed("user_range_sum_30m", r.user_range_sum_30m)
    timed("user_prev_value", r.user_prev_value)
    timed("user_event_rownum", r.user_event_rownum)
    timed("sim_topk_embeddings", docops.sim_topk_embeddings)
    timed("doc_repetition_stats", docops.doc_repetition_stats)
    timed("docs_redacted", docops.docs_redacted)
    timed("kmeans_clusters_embeddings", docops.kmeans_clusters_embeddings)

    # training-mix hygiene (round 3): deterministic split, per-source
    # cap, benchmark decontamination, normalization fingerprints, and
    # the exact n-gram-shingle Jaccard self-join
    timed("split_docs_hash", docops.split_docs_hash)
    timed("source_cap_docs", docops.source_cap_docs)
    timed("decontaminate_docs", docops.decontaminate_docs)
    timed("docs_normalized", docops.docs_normalized)
    timed("mixture_sample_docs", docops.mixture_sample_docs)
    timed("training_mix_docs", docops.training_mix_docs)
    timed("incremental_dedup_docs", docops.incremental_dedup_docs)
    timed("ssjoin_ngram_docs", docops.ssjoin_ngram_docs)

    # round 4b: chunk-level sub-document dedup, bloom-prefiltered
    # incremental dedup, cohort retention, z-score, window edges
    timed("doc_chunk_dedup", docops.doc_chunk_dedup)
    timed("incremental_dedup_bloom", docops.incremental_dedup_bloom)
    timed("user_weekly_retention", r.user_weekly_retention)
    timed("events_value_zscore", r.events_value_zscore)
    timed("user_first_last_value", r.user_first_last_value)

    # round 4c: windowed COUNT DISTINCT, funnel, robust outliers,
    # embedding moments, skyline, k-core, SQL-checkable components,
    # co-occurrence, OLS sufficient statistics
    timed("user_range_distinct_30m", r.user_range_distinct_30m)
    timed("user_funnel_stages", r.user_funnel_stages)
    timed("events_value_outliers", r.events_value_outliers)
    timed("embedding_dim_stats", docops.embedding_dim_stats)
    timed("users_pareto_front", r.users_pareto_front)
    timed("neardup_kcore", docops.neardup_kcore)
    timed("neardup_components_exact", docops.neardup_components_exact)
    timed("event_type_cooccurrence", r.event_type_cooccurrence)
    timed("user_value_trend_stats", r.user_value_trend_stats)
    timed("neardup_cluster_sizes", docops.neardup_cluster_sizes)
    timed("doc_oov_stats", docops.doc_oov_stats)
    timed("fuzzy_name_pairs", r.fuzzy_name_pairs)

    # round 5: GROUPING SETS lattice and the pivot inverse
    timed("revenue_grouping_sets", r.revenue_grouping_sets)
    timed("events_daily_unpivot", r.events_daily_unpivot)

    # round 5b: reachability (BFS levels over the memoized dup graph,
    # taxonomy closure), binning/profiling/corr, ties top-k, sampling
    timed("neardup_bfs_levels", docops.neardup_bfs_levels)
    timed("kg_taxonomy_closure", r.kg_taxonomy_closure)
    timed("events_value_histogram", r.events_value_histogram)
    timed("events_profile", r.events_profile)
    timed("events_hour_value_corr", r.events_hour_value_corr)
    timed("top_orders_with_ties", r.top_orders_with_ties)
    timed("weighted_sample_docs", docops.weighted_sample_docs)
    timed("ssjoin_cosine_docs", docops.ssjoin_cosine_docs)
    timed("kg_rel_ppr", r.kg_rel_ppr)
    timed("events_value_gini", r.events_value_gini)
    timed("embedding_top_pc", docops.embedding_top_pc)
    timed("diverse_sample_embeddings", docops.diverse_sample_embeddings)
    timed("cohort_value_triangle", r.cohort_value_triangle)
    timed("doc_lm_scores", docops.doc_lm_scores)
    timed("dedup_final_docs", docops.dedup_final_docs)
    timed("events_value_decile_stats", r.events_value_decile_stats)
    timed("user_value_autocorr", r.user_value_autocorr)
    timed("neardup_minhash_eval", docops.neardup_minhash_eval)
    timed("docs_snapshot_diff", docops.docs_snapshot_diff)

    # serving-side data operators (round 2): judge stage over doc
    # pairs, agent batch inference over the relational KG, and the full
    # interaction-store lifecycle (ingest + tombstones + upsert + page)
    from datacapsule_ray.pipelines import serving

    timed("judge_scores", serving.judge_scores)
    timed("agent_nation_customers", serving.agent_nation_customers)
    timed("interactions_page", serving.interactions_page)

    ray.shutdown()
    return {
        "metric": "kg_construction_e2e",
        "value": results["kg_pipeline"],
        "unit": "sec",
        "queries": results,
        "sf": float(sf),
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_s": round(n_docs / kg_sec, 1),
        "triples_per_s": round(emissions_rows / kg_sec, 1),
        "distinct_edges": int(n_triples),
        "kg_trials": kg_trials,
        "query_trials": int(os.environ.get("GRAFT_BENCH_QUERY_TRIALS",
                                           "2")),
    }


def run_scaling() -> None:
    """N→4N scaling evidence: ≥3 INTERLEAVED trials per CPU level (8,
    32, 8, 32, …) in one session so co-tenant noise hits both levels
    alike, reporting median (headline) and min plus every raw trial.
    This sandbox shows heavy co-tenant noise (the same config measured
    55s and 97s an hour apart) and all 32 logical CPUs share one memory
    bus — the full trial table is persisted so the spread is visible."""
    import statistics
    import subprocess

    def run_once(ncpu: int) -> dict:
        # the scaling evidence needs a compute-dominant corpus so fixed
        # per-stage overheads don't mask CPU scaling (they amortize away
        # entirely at real 100TB scale); default 160k docs
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_SKIP_QUERIES="1",
                   GRAFT_BENCH_DOCS=os.environ.get("GRAFT_BENCH_DOCS", "160000"))
        argv = [sys.executable, __file__]
        if os.environ.get("GRAFT_SCALING_PIN"):
            # ray.init(num_cpus=N) caps Ray's logical task slots but NOT
            # the process tree's CPU time — Arrow kernel thread pools and
            # Ray system processes still spread across every host core,
            # so the low leg runs faster than a true N-CPU node and the
            # measured efficiency is biased LOW. Pinning the whole tree
            # to N cores (taskset) emulates a fixed-size node honestly.
            argv = ["taskset", "-c", f"0-{ncpu - 1}"] + argv
        proc = subprocess.run(argv, env=env, capture_output=True, text=True)
        if proc.returncode != 0:
            # surface the child's tail — a bare CalledProcessError hides
            # the actual failure (OOM, spill error) behind "exit 1"
            raise RuntimeError(
                f"scaling leg ncpu={ncpu} failed (exit {proc.returncode}):\n"
                + proc.stderr[-2000:])
        return json.loads(proc.stdout.strip().splitlines()[-1])

    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))
    # N and 4N; default 8→32. GRAFT_SCALING_LEVELS="4,16" measures a
    # pair whose high leg stays below this host's shared-memory-bus
    # ceiling (all 32 logical CPUs share one bus — see BASELINE.md).
    lo_n, hi_n = (int(x) for x in
                  os.environ.get("GRAFT_SCALING_LEVELS", "8,32").split(","))
    raw: dict[int, list[dict]] = {lo_n: [], hi_n: []}
    for _ in range(trials):
        for ncpu in (lo_n, hi_n):  # interleaved
            raw[ncpu].append(run_once(ncpu))

    def stats(ncpu: int) -> tuple[float, float, dict]:
        vals = [r["value"] for r in raw[ncpu]]
        med = statistics.median(vals)
        best = min(raw[ncpu], key=lambda r: r["value"])
        return med, best["value"], best

    med_lo, min_lo, best_lo = stats(lo_n)
    med_hi, min_hi, best_hi = stats(hi_n)
    ratio = hi_n / lo_n
    print(json.dumps({
        "cpus_lo": lo_n, "cpus_hi": hi_n,
        f"sec_{lo_n}": med_lo, f"sec_{hi_n}": med_hi,
        f"sec_{lo_n}_min": min_lo, f"sec_{hi_n}_min": min_hi,
        f"docs_per_s_{lo_n}": round(best_lo["n_docs"] / med_lo, 1),
        f"docs_per_s_{hi_n}": round(best_hi["n_docs"] / med_hi, 1),
        # emission-row count is constant across trials; recover it from
        # the best trial and report throughput on the SAME median basis
        # as sec/docs_per_s (mixing min-trial throughput with median
        # times overstated the evidence)
        f"triples_per_s_{lo_n}": round(
            best_lo["triples_per_s"] * best_lo["value"] / med_lo, 1),
        f"triples_per_s_{hi_n}": round(
            best_hi["triples_per_s"] * best_hi["value"] / med_hi, 1),
        "scaling_efficiency": round((med_lo / med_hi) / ratio, 3),
        "scaling_efficiency_min": round((min_lo / min_hi) / ratio, 3),
        f"trials_sec_{lo_n}": [r["value"] for r in raw[lo_n]],
        f"trials_sec_{hi_n}": [r["value"] for r in raw[hi_n]],
        "sf": best_lo["sf"], "n_docs": best_lo["n_docs"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
