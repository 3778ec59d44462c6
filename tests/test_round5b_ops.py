"""Round-5b operators: BFS levels, taxonomy closure, binning,
profiling, corr-from-partials, rank-with-ties, importance sampling."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from tests.conftest import SF_DIR


def _edges(pairs):
    a, b = zip(*pairs)
    return rd.from_arrow(pa.table({
        "id_a": pa.array(a, type=pa.int64()),
        "id_b": pa.array(b, type=pa.int64())}))


class TestBfsLevels:
    def test_path_graph_levels(self):
        from datacapsule_ray.functions.bfslevels import bfs_levels

        # 1-2-3-4-5 path plus isolated pair 10-11
        got = bfs_levels(_edges([(1, 2), (2, 3), (3, 4), (4, 5),
                                 (10, 11)]), max_hops=3).to_pandas()
        lv = dict(zip(got["node"], got["hop"]))
        assert lv == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops: clipped

    def test_driver_vs_distributed_parity(self):
        from datacapsule_ray.functions.bfslevels import bfs_levels

        rng = np.random.default_rng(7)
        pairs = {(int(min(a, b)), int(max(a, b)))
                 for a, b in rng.integers(0, 40, size=(60, 2)) if a != b}
        e = list(pairs)
        drv = bfs_levels(_edges(e), max_hops=4).to_pandas()
        dst = bfs_levels(_edges(e), max_hops=4,
                         driver_limit=0).to_pandas()
        d1 = dict(zip(drv["node"], drv["hop"]))
        d2 = dict(zip(dst["node"], dst["hop"]))
        assert d1 == d2

    def test_seed_override_and_empty(self):
        from datacapsule_ray.functions.bfslevels import bfs_levels

        got = bfs_levels(_edges([(1, 2), (2, 3)]), max_hops=2,
                         seed=3).to_pandas()
        assert dict(zip(got["node"], got["hop"])) == {3: 0, 2: 1, 1: 2}
        empty = _edges([(1, 2)]).filter(expr="id_a > 100")
        assert bfs_levels(empty, max_hops=2).count() == 0


def test_taxonomy_closure_layers():
    from datacapsule_ray.pipelines import relational as r

    cl = r.kg_taxonomy_closure(SF_DIR).to_pandas()
    n1 = len(r.kg_rel_triples(SF_DIR).to_pandas())
    by_depth = cl.groupby("depth").size().to_dict()
    assert by_depth[1] == n1
    assert set(by_depth) == {1, 2, 3}
    # layered chain: depth-3 paths are exactly region->order, one per order
    d3 = cl[cl["depth"] == 3]
    assert d3["de"].str.startswith("order-").all()


def test_top_orders_with_ties_structure():
    from datacapsule_ray.pipelines import relational as r

    got = r.top_orders_with_ties(SF_DIR).to_pandas()
    assert (got["rnk"] >= 1).all() and (got["rnk"] <= 2).all()
    # rank 1 rows hold the per-customer max bucket
    mx = got.groupby("o_custkey")["price_b"].max()
    r1 = got[got["rnk"] == 1]
    assert (r1.set_index("o_custkey")["price_b"]
            == mx.loc[r1["o_custkey"]].to_numpy()).all()
    # SQL RANK semantics: if a customer has t>=2 rank-1 ties, it has
    # no rank-2 rows
    t1 = r1.groupby("o_custkey").size()
    for cust, n in t1.items():
        if n >= 2:
            assert not ((got["o_custkey"] == cust)
                        & (got["rnk"] == 2)).any()


def test_weighted_sample_keeps_all_long_docs():
    from datacapsule_ray.pipelines import docops

    got = docops.weighted_sample_docs(SF_DIR).to_pandas()
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "n_chars"]).to_pandas()
    long_ids = set(docs[docs["n_chars"] >= 2000]["doc_id"])
    assert long_ids <= set(got["doc_id"])
    # deterministic: a second run returns the identical id set
    again = docops.weighted_sample_docs(SF_DIR).to_pandas()
    assert set(got["doc_id"]) == set(again["doc_id"])


def test_events_profile_shape():
    from datacapsule_ray.pipelines import relational as r

    got = r.events_profile(SF_DIR)
    assert list(got["col_name"]) == ["event_type", "props", "user_id"]
    assert (got["n_null"] == 0).all()
    assert (got["n_distinct"] > 0).all()


def test_events_hour_value_corr_bounds():
    from datacapsule_ray.pipelines import relational as r

    got = r.events_hour_value_corr(SF_DIR)
    assert (got["corr_hv"].abs() <= 1.0 + 1e-12).all()


def test_events_value_histogram_totals():
    from datacapsule_ray.pipelines import relational as r

    got = r.events_value_histogram(SF_DIR).to_pandas()
    ev = rd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["value"]).to_pandas()
    assert got["n_events"].sum() == len(ev)
    assert (got["bucket"] >= 0).all()


@pytest.mark.parametrize("n_blocks", [1, 4])
def test_cosine_ssjoin_matches_bruteforce(n_blocks):
    import math

    from datacapsule_ray.functions.ssjoin import jaccard_ssjoin

    rng = np.random.default_rng(11)
    vocab = ["w%d" % i for i in range(20)]
    rows = []
    for did in range(50):
        k = int(rng.integers(3, 18))
        rows.append((did, " ".join(rng.choice(vocab, size=k))))
    # asymmetric-size plant: superset doc — high cosine, lower Jaccard
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    rows[40] = (40, base)
    rows[41] = (41, base + " w10")

    tau = 0.8
    ref = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a = set(rows[i][1].split())
            b = set(rows[j][1].split())
            if not a or not b:
                continue
            inter = len(a & b)
            # integer test, same algebra as the engine
            if 25 * inter * inter >= 16 * len(a) * len(b):
                ref[(rows[i][0], rows[j][0])] = (inter, len(a | b))
    assert (40, 41) in ref  # the plant fires
    a40 = set(rows[40][1].split())
    a41 = set(rows[41][1].split())
    assert len(a40 & a41) / math.sqrt(len(a40) * len(a41)) >= tau

    ds = rd.from_arrow(pa.table({
        "doc_id": [d for d, _ in rows],
        "text": [t for _, t in rows],
    })).repartition(n_blocks)
    got = jaccard_ssjoin(ds, tau_num=4, tau_den=5,
                         measure="cosine").to_pandas()
    got_map = {(min(a, b), max(a, b)): (i, u) for a, b, i, u in
               zip(got["id_a"], got["id_b"], got["n_inter"],
                   got["n_union"])}
    assert got_map == ref


def test_cosine_ssjoin_rejects_bad_measure():
    from datacapsule_ray.functions.ssjoin import jaccard_ssjoin

    with pytest.raises(ValueError):
        jaccard_ssjoin(rd.from_arrow(pa.table({"doc_id": [1],
                                               "text": ["a"]})),
                       measure="dice")


class TestPersonalizedPagerank:
    def _edges_tbl(self, pairs):
        s, d = zip(*pairs)
        return rd.from_arrow(pa.table({
            "src": pa.array(s, type=pa.string()),
            "dst": pa.array(d, type=pa.string())}))

    def test_seeds_all_equals_global_pagerank(self):
        from datacapsule_ray.functions.pagerank import (
            pagerank_fixed, personalized_pagerank_fixed)

        pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
                 ("d", "a")]
        e = self._edges_tbl(pairs)
        allnodes = rd.from_arrow(pa.table({
            "node": pa.array(["a", "b", "c", "d"], type=pa.string())}))
        glob = pagerank_fixed(e, iters=3).to_pandas()
        pers = personalized_pagerank_fixed(e, allnodes,
                                           iters=3).to_pandas()
        assert (dict(zip(glob["node"], glob["pr"]))
                == dict(zip(pers["node"], pers["pr"])))

    def test_unreached_nodes_are_zero(self):
        from datacapsule_ray.functions.pagerank import (
            personalized_pagerank_fixed)

        # two components; seed only in the first
        e = self._edges_tbl([("a", "b"), ("x", "y")])
        seeds = rd.from_arrow(pa.table({
            "node": pa.array(["a"], type=pa.string())}))
        got = personalized_pagerank_fixed(e, seeds, iters=3).to_pandas()
        pr = dict(zip(got["node"], got["pr"]))
        assert set(pr) == {"a", "b", "x", "y"}
        assert pr["x"] == 0 and pr["y"] == 0
        assert pr["a"] == 150_000_000  # base only (no in-edges)
        # b receives a's damped mass each round, holds no teleport
        assert pr["b"] > 0 and pr["b"] != pr["a"]


def test_events_value_gini_bounds_and_pandas_parity():
    from datacapsule_ray.pipelines import relational as r

    got = r.events_value_gini(SF_DIR)
    assert ((got["gini"] >= 0) & (got["gini"] < 1)).all()
    # pandas oracle: same sorted-rank identity per type
    import pandas as pd
    ev = rd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_id", "event_type",
                                  "value"]).to_pandas()
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    ref = {}
    for et, g in ev.groupby("event_type"):
        x = g.sort_values(["c", "event_id"])["c"].to_numpy()
        n = len(x)
        i = np.arange(1, n + 1, dtype=np.int64)
        ref[et] = ((2.0 * np.int64((i * x).sum()))
                   / np.float64(np.int64(n) * x.sum())
                   - np.float64(n + 1) / np.float64(n))
    for et, gv in zip(got["event_type"], got["gini"]):
        assert abs(ref[et] - gv) < 1e-12


class TestTopPrincipalDirection:
    def test_matches_numpy_eigendecomposition(self):
        from datacapsule_ray.functions.linalg import (
            top_principal_direction)

        rng = np.random.default_rng(3)
        # anisotropic cloud: strong direction planted along a random axis
        d, n = 16, 400
        axis = rng.normal(size=d)
        axis /= np.linalg.norm(axis)
        x = (rng.normal(size=(n, 1)) * 5.0) @ axis[None, :]
        x = x + rng.normal(size=(n, d)) * 0.3 + 2.0  # offset: centering matters
        ds = rd.from_arrow(pa.table({
            "embedding": pa.array([row.astype(np.float32) for row in x],
                                  type=pa.list_(pa.float32()))}))
        ds = ds.repartition(4)
        v, lam, cnt = top_principal_direction(ds, dim=d, iters=30)
        assert cnt == n
        xc = x.astype(np.float32).astype(np.float64)
        xc = xc - xc.mean(axis=0)
        w, vecs = np.linalg.eigh(xc.T @ xc)
        top = vecs[:, -1]
        if top[np.argmax(np.abs(top))] < 0:
            top = -top
        assert abs(abs(v @ top) - 1.0) < 1e-6
        assert abs(lam - w[-1]) / w[-1] < 1e-6

    def test_degenerate_constant_rows(self):
        from datacapsule_ray.functions.linalg import (
            top_principal_direction)

        ds = rd.from_arrow(pa.table({
            "embedding": pa.array([[1.0, 2.0]] * 10,
                                  type=pa.list_(pa.float32()))}))
        v, lam, n = top_principal_direction(ds, dim=2, iters=4)
        assert lam == 0.0 and n == 10


def test_diverse_sample_embeddings_caps_cells():
    from datacapsule_ray.pipelines import docops

    got = docops.diverse_sample_embeddings(SF_DIR).to_pandas()
    per_cell = got.groupby("centroid_id").size()
    assert (per_cell <= 5).all()
    assert got["vec_id"].is_unique
    # deterministic across runs
    again = docops.diverse_sample_embeddings(SF_DIR).to_pandas()
    assert sorted(map(tuple, got.to_numpy().tolist())) == \
        sorted(map(tuple, again.to_numpy().tolist()))


def test_cohort_value_triangle_invariants():
    from datacapsule_ray.pipelines import relational as r

    got = r.cohort_value_triangle(SF_DIR).to_pandas()
    ev = rd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["value"]).to_pandas()
    assert got["n_events"].sum() == len(ev)
    assert (got["week_offset"] >= 0).all()
    total_c = np.int64((ev["value"] * 100).round().astype("int64").sum())
    assert got["value_cents"].sum() == total_c


class TestBigramLmScores:
    def test_matches_pure_python_reference(self):
        import math

        from datacapsule_ray.functions.lm import bigram_lm_scores

        texts = ["a b c a b", "a b a b", "c c c", "x", "", "q r q r s"]
        ids = list(range(len(texts)))
        # pure-python add-one bigram LM over the same corpus
        from collections import Counter
        uni, bi = Counter(), Counter()
        for t in texts:
            toks = t.split()
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        v = len(uni)
        ref = {}
        for i, t in enumerate(texts):
            toks = t.split()
            pairs = list(zip(toks, toks[1:]))
            if not pairs:
                continue
            bits = [-math.log2((bi[p] + 1) / (uni[p[0]] + v))
                    for p in pairs]
            ref[i] = (len(pairs), sum(bits) / len(pairs))

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string())})).repartition(3)
        got = bigram_lm_scores(ds).to_pandas()
        got_map = {d: (n, s) for d, n, s in zip(
            got["doc_id"], got["n_bigrams"], got["nll_bits"])}
        assert set(got_map) == set(ref)
        for k in ref:
            assert got_map[k][0] == ref[k][0]
            assert abs(got_map[k][1] - ref[k][1]) < 1e-12

    def test_model_cap_drop_accounting(self):
        from datacapsule_ray.functions.lm import bigram_lm_scores

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["a b c d e", "a b x y z"],
                             type=pa.string())}))
        st = {}
        out = bigram_lm_scores(ds, model_cap=3, stats=st).to_pandas()
        assert st["dropped_model_entries"] > 0
        assert len(out) == 2


def test_dedup_final_docs_keep_semantics():
    from datacapsule_ray.pipelines import docops

    kept = set(docops.dedup_final_docs(SF_DIR).to_pandas()["doc_id"])
    comp = docops.neardup_components_exact(SF_DIR).to_pandas()
    docs = set(rd.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id"]).to_pandas()["doc_id"])
    touched = set(comp["doc_id"])
    canonical = set(comp[comp["doc_id"] == comp["component"]]["doc_id"])
    assert kept == (docs - touched) | canonical


def test_events_value_decile_stats_equidepth():
    from datacapsule_ray.pipelines import relational as r

    got = (r.events_value_decile_stats(SF_DIR).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    n = got["n_events"].sum()
    assert len(got) == 10
    # depth within 1 of n/10 (integer NTILE-style split)
    assert (got["n_events"].sub(n // 10).abs() <= 1).all()
    # edges are non-decreasing across buckets
    assert (got["lo_c"] <= got["hi_c"]).all()
    assert (got["hi_c"].iloc[:-1].to_numpy()
            <= got["lo_c"].iloc[1:].to_numpy()).all()


def test_user_value_autocorr_bounds_and_pandas_parity():
    from datacapsule_ray.pipelines import relational as r

    got = r.user_value_autocorr(SF_DIR)
    assert (got["autocorr"].abs() <= 1.0 + 1e-12).all()
    ev = rd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "value"]).to_pandas()
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    ref = {}
    for uid, g in ev.groupby("user_id"):
        c = g.sort_values(["ts", "event_id"])["c"].to_numpy()
        if len(c) < 2:
            continue
        x, y = c[:-1].astype(np.int64), c[1:].astype(np.int64)
        n = np.int64(len(x))
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        if not (n * sxx > sx * sx and n * syy > sy * sy):
            continue
        ref[uid] = ((np.float64(n) * sxy - np.float64(sx) * sy)
                    / (np.sqrt(np.float64(n) * sxx - np.float64(sx) * sx)
                       * np.sqrt(np.float64(n) * syy
                                 - np.float64(sy) * sy)))
    got_map = dict(zip(got["user_id"], got["autocorr"]))
    assert set(got_map) == set(ref)
    for k in ref:
        assert abs(got_map[k] - ref[k]) < 1e-12


def test_pagerank_driver_vs_distributed_parity():
    from datacapsule_ray.functions.pagerank import (
        pagerank_fixed, personalized_pagerank_fixed)

    rng = np.random.default_rng(9)
    pairs = [("n%d" % a, "n%d" % b)
             for a, b in rng.integers(0, 30, size=(80, 2)) if a != b]
    s, d = zip(*pairs)
    e = rd.from_arrow(pa.table({
        "src": pa.array(s, type=pa.string()),
        "dst": pa.array(d, type=pa.string())}))
    seeds = rd.from_arrow(pa.table({
        "node": pa.array(["n0", "n5", "n7"], type=pa.string())}))

    drv = pagerank_fixed(e, iters=3).to_pandas()
    dst = pagerank_fixed(e, iters=3, driver_limit=0).to_pandas()
    assert dict(zip(drv["node"], drv["pr"])) == \
        dict(zip(dst["node"], dst["pr"]))

    pdrv = personalized_pagerank_fixed(e, seeds, iters=3).to_pandas()
    pdst = personalized_pagerank_fixed(e, seeds, iters=3,
                                       driver_limit=0).to_pandas()
    assert dict(zip(pdrv["node"], pdrv["pr"])) == \
        dict(zip(pdst["node"], pdst["pr"]))
    # seeded result differs from global (teleport restricted)
    assert dict(zip(pdrv["node"], pdrv["pr"])) != \
        dict(zip(drv["node"], drv["pr"]))


def test_bfs_levels_noncanonical_edges_path_parity():
    from datacapsule_ray.functions.bfslevels import bfs_levels

    # b < a on some rows: min(id_a) is NOT the global min node
    e = [(5, 1), (5, 6), (6, 7), (9, 8)]
    drv = bfs_levels(_edges(e), max_hops=3).to_pandas()
    dst = bfs_levels(_edges(e), max_hops=3, driver_limit=0).to_pandas()
    assert dict(zip(drv["node"], drv["hop"])) == \
        dict(zip(dst["node"], dst["hop"]))
    assert dict(zip(drv["node"], drv["hop"]))[1] == 0  # true global min


def test_neardup_minhash_eval_consistency():
    from datacapsule_ray.pipelines import docops

    row = docops.neardup_minhash_eval(SF_DIR).iloc[0]
    assert row["n_tp"] + row["n_fp"] == row["n_candidates"]
    assert row["n_tp"] + row["n_fn"] == row["n_exact"]
    assert 0 <= row["precision_bp"] <= 10000
    assert 0 <= row["recall_bp"] <= 10000
    # the driver corpus is dup-HEAVY (tiny vocab, giant dup cliques):
    # minhash hot-bucket caps drop most candidates there (the logged
    # designed failure mode), so recall is LOW — which is exactly the
    # decision signal this scorecard exists to surface. The realistic-
    # density regime (high recall, 0 drops) is pinned by the
    # scale_shuffle_probe numbers in BASELINE.md instead.
    assert row["n_exact"] > 0


def test_bfs_levels_isolated_seed_both_paths():
    from datacapsule_ray.functions.bfslevels import bfs_levels

    e = [(10, 20), (20, 30)]
    for dl in (2_000_000, 0):
        got = bfs_levels(_edges(e), max_hops=2, seed=99,
                         driver_limit=dl).to_pandas()
        assert dict(zip(got["node"], got["hop"])) == {99: 0}, dl
    # a seed BETWEEN existing node ids (searchsorted insertion point
    # inside the array) must not alias onto a neighbor
    got = bfs_levels(_edges(e), max_hops=2, seed=15).to_pandas()
    assert dict(zip(got["node"], got["hop"])) == {15: 0}


def test_personalized_pagerank_duplicate_seeds_both_paths():
    from datacapsule_ray.functions.pagerank import (
        personalized_pagerank_fixed)

    e = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b"], type=pa.string()),
        "dst": pa.array(["b", "c"], type=pa.string())}))
    dup_seeds = rd.from_arrow(pa.table({
        "node": pa.array(["a", "a", "a"], type=pa.string())}))
    one_seed = rd.from_arrow(pa.table({
        "node": pa.array(["a"], type=pa.string())}))
    for dl in (2_000_000, 0):
        dup = personalized_pagerank_fixed(e, dup_seeds, iters=3,
                                          driver_limit=dl).to_pandas()
        ref = personalized_pagerank_fixed(e, one_seed, iters=3,
                                          driver_limit=dl).to_pandas()
        assert dict(zip(dup["node"], dup["pr"])) == \
            dict(zip(ref["node"], ref["pr"])), dl
        assert len(dup) == 3


def test_events_profile_all_null_column(tmp_path):
    import pyarrow.parquet as pq

    from datacapsule_ray.pipelines import relational as r

    t = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([0, 1], type=pa.timestamp("us")),
        "user_id": pa.array([7, 8], type=pa.int64()),
        "event_type": pa.array(["a", "b"], type=pa.string()),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array([None, None], type=pa.string())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = r.events_profile(str(tmp_path))
    row = got[got["col_name"] == "props"].iloc[0]
    assert row["n_distinct"] == 0 and row["n_null"] == 2
    assert len(got) == 3


def test_docs_snapshot_diff_classes():
    from datacapsule_ray.pipelines import docops

    got = docops.docs_snapshot_diff(SF_DIR).to_pandas()
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id"]).to_pandas()
    ids = docs["doc_id"].to_numpy()
    added = set(ids[(ids % 7 == 0) & (ids % 3 != 0)])
    removed = set(ids[(ids % 7 != 0) & (ids % 3 == 0)])
    changed = set(ids[(ids % 7 != 0) & (ids % 3 != 0) & (ids % 5 == 0)])
    by = {c: set(g["doc_id"]) for c, g in got.groupby("change")}
    assert by.get("added", set()) == added
    assert by.get("removed", set()) == removed
    assert by.get("changed", set()) == changed
