"""Algorithm-correctness tests for the training-data operators: planted
near-duplicates must be found (and only them), similarity search must
match brute force, text stats must be right on known inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from datacapsule_ray.functions import dedup, similarity, text


@pytest.fixture(scope="module")
def dup_docs():
    """60 docs: 50 distinct + 4 exact dup pairs + 6 near-dup variants."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(50):
        toks = rng.choice(vocab, size=60).tolist()
        rows.append({"doc_id": i, "text": " ".join(toks)})
    for j in range(4):  # exact duplicates of docs 0-3
        rows.append({"doc_id": 50 + j, "text": rows[j]["text"]})
    for j in range(6):  # near duplicates of docs 10-15: flip 3 tokens
        toks = rows[10 + j]["text"].split()
        for p in range(3):
            toks[7 * p] = "CHANGED%d" % p
        rows.append({"doc_id": 54 + j, "text": " ".join(toks)})
    return pd.DataFrame(rows)


def test_exact_dedup(dup_docs):
    out = dedup.exact_dedup(rd.from_pandas(dup_docs)).to_pandas()
    assert len(out) == 56  # 60 docs, 4 exact dups collapsed
    dups = out[out["n_copies"] > 1]
    assert sorted(dups["keep_id"]) == [0, 1, 2, 3]
    assert (dups["n_copies"] == 2).all()


def test_minhash_lsh_finds_planted_neardups(dup_docs):
    pairs = dedup.minhash_lsh_pairs(
        rd.from_pandas(dup_docs), threshold=0.5).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # every planted pair (exact + near) must be found
    want_exact = {(j, 50 + j) for j in range(4)}
    want_near = {(10 + j, 54 + j) for j in range(6)}
    assert want_exact <= got
    assert want_near <= got
    # and nothing between unrelated random docs
    unrelated = {p for p in got if p not in want_exact | want_near}
    assert not unrelated, unrelated


def test_minhash_lsh_uint64_ids(dup_docs):
    """Hashed uint64 doc ids >= 2^63 (the case dedup.py's raw channel
    explicitly supports) must flow through the pair channel too — the
    nullable-Int64 construction would raise TypeError on them."""
    docs = dup_docs.copy()
    docs["doc_id"] = (docs["doc_id"].to_numpy().astype(np.uint64)
                      + np.uint64(2**63))
    pairs = dedup.minhash_lsh_pairs(
        rd.from_pandas(docs), threshold=0.5).to_pandas()
    got = {tuple(sorted((int(a), int(b))))
           for a, b in zip(pairs["id_a"], pairs["id_b"])}
    base = 2**63
    want_exact = {(base + j, base + 50 + j) for j in range(4)}
    assert want_exact <= got
    assert all(x >= base for p in got for x in p)   # no wrap to negative


def test_minhash_estimates_jaccard(dup_docs):
    pairs = dedup.minhash_lsh_pairs(
        rd.from_pandas(dup_docs), threshold=0.5).to_pandas()
    exact = pairs[(pairs["id_a"] == 0) & (pairs["id_b"] == 50)]
    assert len(exact) == 1 and exact["est_jaccard"].iloc[0] == 1.0


def test_simhash_finds_exact_dups(dup_docs):
    pairs = dedup.simhash_pairs(rd.from_pandas(dup_docs)).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert {(j, 50 + j) for j in range(4)} <= got
    exact = pairs[(pairs["id_a"] == 0) & (pairs["id_b"] == 50)]
    assert exact["hamming"].iloc[0] == 0


def test_connected_components_distributed_matches_driver(dup_docs):
    """The all-Dataset label-propagation variant (scale path) must agree
    with the driver-side loop exactly."""
    pairs = dedup.minhash_lsh_pairs(rd.from_pandas(dup_docs), threshold=0.5)
    ids = rd.from_pandas(dup_docs)
    a = dedup.connected_components(pairs, ids).to_pandas().sort_values("id")
    b = dedup.connected_components_distributed(
        pairs, ids, num_partitions=2).to_pandas().sort_values("id")
    assert a["comp"].tolist() == b["comp"].tolist()
    assert a["id"].tolist() == b["id"].tolist()


def test_connected_components(dup_docs):
    pairs = dedup.minhash_lsh_pairs(rd.from_pandas(dup_docs), threshold=0.5)
    comp = dedup.connected_components(
        pairs, rd.from_pandas(dup_docs)).to_pandas()
    m = dict(zip(comp["id"], comp["comp"]))
    for j in range(4):
        assert m[50 + j] == j  # dup joins its original's component (min id)
    for j in range(6):
        assert m[54 + j] == 10 + j
    assert m[30] == 30  # singleton unchanged


@pytest.fixture(scope="module")
def emb_table():
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((300, 32)).astype(np.float32)
    # plant 3 near-dup rows of row 5 (tiny perturbation)
    for j in range(3):
        mat[250 + j] = mat[5] + 0.01 * rng.standard_normal(32).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(300), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), type=pa.float32()), 32),
    }), mat


def test_embedding_neardup(emb_table):
    t, mat = emb_table
    pairs = dedup.embedding_neardup_pairs(
        rd.from_arrow(t), dim=32, threshold=0.99).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    want = {(5, 250), (5, 251), (5, 252), (250, 251), (250, 252), (251, 252)}
    assert want <= got
    assert not (got - want)


def test_topk_cosine_matches_bruteforce(emb_table):
    t, mat = emb_table
    q = mat[7].astype(np.float64)
    got = similarity.topk_cosine(rd.from_arrow(t), q, k=10)
    m = mat.astype(np.float64)
    sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(sims)), -sims))[:10]
    assert got["vec_id"].tolist() == order.tolist()
    np.testing.assert_allclose(got["sim"].to_numpy(), sims[order], atol=1e-12)


def test_ivf_topk_recall(emb_table):
    t, mat = emb_table
    q = mat[7].astype(np.float64)
    exact = similarity.topk_cosine(rd.from_arrow(t), q, k=10)
    approx = similarity.ivf_topk_cosine(rd.from_arrow(t), q, k=10,
                                        n_cells=8, nprobe=4)
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.7  # nprobe=half the cells: high recall expected
    assert approx["vec_id"].iloc[0] == 7  # the vector itself always found


def test_token_stats():
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["the cat sat on the mat", "", "  a  b  "]})
    out = text.token_stats_batch(t)
    assert out.column("n_tokens").to_pylist() == [6, 0, 2]
    assert out.column("n_stop_en").to_pylist() == [2, 0, 1]
    assert out.column("n_chars").to_pylist() == [22, 0, 8]


def test_quality_score():
    t = pa.table({"doc_id": [1, 2],
                  "text": ["the cat is on the mat", "zzz"]})
    out = text.quality_score_batch(t)
    assert out.column("stop_ratio").to_pylist()[0] == pytest.approx(3 / 6)
    assert out.column("stop_ratio").to_pylist()[1] == 0.0
    mtl = out.column("mean_token_len").to_pylist()
    assert mtl[0] == pytest.approx(16 / 6)  # sum of token lengths / tokens
    assert mtl[1] == pytest.approx(3.0)

    # padded/double-spaced text must not inflate the mean (the old
    # chars-minus-separators formula gave 3.5 here)
    padded = text.quality_score_batch(
        pa.table({"doc_id": [1], "text": ["  a  b  "]}))
    assert padded.column("mean_token_len").to_pylist() == [1.0]


def test_sources_io_roundtrip(tmp_path):
    import ray.data as rd

    from datacapsule_ray.sources.io import read_table, write_table

    ds = rd.range(10)
    path = str(tmp_path / "t")
    write_table(ds, path)
    back = read_table(path)
    assert sorted(r["id"] for r in back.take_all()) == list(range(10))


def test_sources_io_lance_roundtrip(tmp_path):
    """Exercises the Lance branch of read_table/write_table when the
    package exists (skipped in containers without it — the branch is
    import-gated, sources/io.py:15-20)."""
    import importlib.util

    import pytest

    if importlib.util.find_spec("lance") is None:
        pytest.skip("lance package not installed in this container")
    import ray.data as rd

    from datacapsule_ray.sources.io import read_table, write_table

    ds = rd.range(10)
    path = str(tmp_path / "t.lance")
    write_table(ds, path)
    back = read_table(path, columns=["id"])
    assert sorted(r["id"] for r in back.take_all()) == list(range(10))


def test_lang_id():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["the cat is on the mat and it is big",
                 "der hund ist nicht auf das sofa und",
                 "le chat est dans la maison pour que",
                 "el perro es un animal en la casa",
                 "zzz qqq xxx"],
    })
    out = text.lang_id(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out["lang_guess"].tolist() == ["en", "de", "fr", "es", "und"]


def test_rolling_fingerprints_shift_invariant_overlap():
    t = pa.table({"doc_id": [1], "text": ["alpha beta gamma delta epsilon zeta eta theta " * 8]})
    out = text.rolling_fingerprints_batch(t, window=8)
    assert len(out) > 0
    t2 = pa.table({"doc_id": [2], "text": ["PREFIX " + t.column("text")[0].as_py()]})
    out2 = text.rolling_fingerprints_batch(t2, window=8)
    # winnowed fingerprints of near-identical docs overlap heavily
    overlap = set(out.column("fp").to_pylist()) & set(out2.column("fp").to_pylist())
    assert len(overlap) >= 1


def test_multimodal_plumbing():
    from datacapsule_ray.functions import multimodal as mm

    media = pa.table({
        "media_ref": ["m1", "m2"],
        "kind": ["image", "video"],
        "payload": pa.array([b"abc", b"def"], type=pa.binary()),
        "meta": [{"width": 8, "height": 8, "duration_ms": 2500},
                 {"width": 8, "height": 8, "duration_ms": 3500}],
    })
    feats = mm.extract_media_features(rd.from_arrow(media), out_dim=8).to_pandas()
    assert len(feats) == 2 and len(feats["feature"].iloc[0]) == 8
    # determinism: same payload → same feature
    feats2 = mm.extract_media_features(rd.from_arrow(media), out_dim=8).to_pandas()
    np.testing.assert_array_equal(np.stack(feats["feature"]),
                                  np.stack(feats2["feature"]))
    frames = mm.sample_frames(rd.from_arrow(media), every_ms=1000).to_pandas()
    by_ref = frames.groupby("media_ref").size()
    assert by_ref["m1"] == 3 and by_ref["m2"] == 4  # ceil(duration/1000)

    # decoder="real" is a working pixel path since r5
    # (tests/test_imagecodec.py); video frame extraction remains the
    # one guarded stub, and typos still fail fast
    with pytest.raises(NotImplementedError):
        mm.FrameSampler(decoder="real")
    with pytest.raises(ValueError):
        mm.MediaFeatureExtractor(decoder="reall")


def _brute_jaccard_pairs(df: pd.DataFrame, tau: float):
    """Reference all-pairs token-set Jaccard on the driver (exact)."""
    sets = {r.doc_id: set(r.text.split()) for r in df.itertuples()
            if r.text.split()}
    ids = sorted(sets)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter >= tau * union:
                out.append((a, b, inter, union))
    return sorted(out)


def test_jaccard_ssjoin_exact(dup_docs):
    """Exact vs brute force: identical-set pairs (word order shuffles
    too — same SET), near-dup pairs, and nothing else."""
    from datacapsule_ray.functions import ssjoin

    df = dup_docs.copy()
    # add a shuffled-word copy of doc 5: identical token SET, J=1
    toks = df.loc[df.doc_id == 5, "text"].iloc[0].split()
    df = pd.concat([df, pd.DataFrame(
        [{"doc_id": 97, "text": " ".join(sorted(toks))}])],
        ignore_index=True)
    stats = {}
    out = ssjoin.jaccard_ssjoin(
        rd.from_pandas(df), tau_num=4, tau_den=5, stats=stats).to_pandas()
    got = sorted(map(tuple, out[["id_a", "id_b", "n_inter", "n_union"]]
                     .to_numpy().tolist()))
    assert got == _brute_jaccard_pairs(df, 0.8)
    assert stats["dropped_rows"] == 0
    # the shuffled copy must pair with its source at J == 1
    j1 = out[(out.id_a == 5) & (out.id_b == 97)]
    assert len(j1) == 1 and (j1.n_inter == j1.n_union).all()


def test_jaccard_ssjoin_hot_bucket_drop_accounting():
    """An identical-set group larger than max_bucket is truncated WITH a
    surfaced drop count (never silently)."""
    from datacapsule_ray.functions import ssjoin

    df = pd.DataFrame({"doc_id": range(30),
                       "text": ["alpha beta gamma delta"] * 30})
    stats = {}
    out = ssjoin.jaccard_ssjoin(rd.from_pandas(df), tau_num=9, tau_den=10,
                                max_bucket=10, stats=stats).to_pandas()
    assert stats["dropped_rows"] > 0
    assert len(out) == 10 * 9 // 2  # pairs among the kept 10


def test_asof_join_matches_merge_asof_across_blocks():
    """asof_join vs pandas merge_asof on a corpus forced into MANY
    blocks, so key runs straddle block boundaries and the carry path
    (pass-1 summaries + backward scan) is exercised — including a key
    whose clicks precede any purchase (inner-drop) and equal-ts ties."""
    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 12, size=n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**9, size=n), unit="us"),
        "kind": rng.choice(["L", "R"], size=n, p=[0.8, 0.2]),
        "value": rng.random(n).round(3),
    })
    df.loc[df.user_id == 7, "kind"] = "L"  # user with no right rows
    # equal-ts tie: two right rows at the same (user, ts)
    df.loc[0, ["user_id", "ts", "kind"]] = [3, pd.Timestamp("2024-01-01"), "R"]
    df.loc[1, ["user_id", "ts", "kind"]] = [3, pd.Timestamp("2024-01-01"), "R"]
    from datacapsule_ray.functions.asof import asof_join

    left = df[df.kind == "L"][["event_id", "user_id", "ts"]]
    right = df[df.kind == "R"][["event_id", "user_id", "ts", "value"]]
    out = asof_join(
        rd.from_pandas(left).repartition(16),
        rd.from_pandas(right).repartition(4),
        key="user_id", ts_col="ts", tiebreak_col="event_id",
        value_cols=["value"], join_type="inner",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    # reference: merge_asof per user; ties broken by the LAST right row
    # in (ts, event_id) order — merge_asof's own tie rule
    ref = pd.merge_asof(
        left.sort_values(["ts", "event_id"], kind="stable"),
        right.sort_values(["ts", "event_id"], kind="stable")
        .rename(columns={"event_id": "r_event_id"}),
        on="ts", by="user_id", direction="backward",
        allow_exact_matches=True, suffixes=("", "_r"))
    ref = ref[ref["value"].notna()].sort_values("event_id").reset_index(drop=True)
    assert len(out) == len(ref)
    assert (out["event_id"].to_numpy() == ref["event_id"].to_numpy()).all()
    assert np.allclose(out["value_asof"].astype(float),
                       ref["value"].astype(float))


def test_asof_join_left_integer_ts_stable_dtype():
    """asof_join with INTEGER (epoch-ms) timestamps and join_type='left':
    unmatched left rows must not flip ts_asof/value_asof to object dtype
    in some batches only (NaT assigned into a non-datetime column) — the
    output dtype is ONE pandas nullable dtype across all blocks. Also
    exercises the O(#blocks) forward carry on a hot key whose single
    right row precedes a long run of right-less blocks."""
    from datacapsule_ray.functions.asof import asof_join

    n = 3000
    # hot key 0: one right row at ts=0, thousands of left rows after it;
    # key 1: left rows BEFORE its right row (unmatched → nulls)
    left = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": np.where(np.arange(n) % 10 == 0, 1, 0),
        "ts": np.arange(n, dtype=np.int64) * 1000 + 10,
    })
    right = pd.DataFrame({
        "event_id": np.arange(n, n + 2),
        "user_id": [0, 1],
        "ts": np.array([0, n * 1000 + 10**6], dtype=np.int64),
        "value": [1.5, 2.5],
    })
    out = asof_join(
        rd.from_pandas(left).repartition(24),
        rd.from_pandas(right),
        key="user_id", ts_col="ts", tiebreak_col="event_id",
        value_cols=["value"], join_type="left",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert len(out) == n                      # left join keeps all rows
    m0 = out["user_id"] == 0
    assert out.loc[m0, "value_asof"].astype(float).eq(1.5).all()
    assert out.loc[~m0, "value_asof"].isna().all()   # ts precedes right
    assert out["ts_asof"].dtype != object            # no object fallback


def test_grouped_exact_quantiles_matches_numpy_rank():
    """Histogram quantile vs direct rank selection on skewed
    multi-batch data (many duplicate values, uneven key sizes)."""
    from datacapsule_ray.functions.quantiles import grouped_exact_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=5000, p=[0.7, 0.2, 0.1]),
        "v": rng.integers(0, 40, size=5000),
    })
    out = grouped_exact_quantiles(
        rd.from_pandas(df).repartition(8), "k", "v",
        [(1, 2, "median"), (9, 10, "p90"), (1, 100, "p1")]
    ).set_index("k")
    for k, sub in df.groupby("k"):
        x = np.sort(sub["v"].to_numpy())
        n = len(x)
        for q_num, q_den, name in [(1, 2, "median"), (9, 10, "p90"),
                                   (1, 100, "p1")]:
            rank = -((-q_num * n) // q_den)
            assert out.loc[k, name] == x[rank - 1], (k, name)


def test_grouped_quantiles_null_keys_and_values():
    """SQL GROUP BY parity: a NULL key is a real group (pandas'
    dropna=True default silently discarded its rows), while NULL
    values are ignored like any SQL aggregate."""
    from datacapsule_ray.functions.quantiles import (grouped_exact_quantiles,
                                                     grouped_mode)

    df = pd.DataFrame({
        "k": ["a"] * 4 + [None] * 4 + ["b"] * 2,
        "v": [1, 2, 3, 4, 10, 20, 30, None, 5, None],
    })
    out = grouped_exact_quantiles(
        rd.from_pandas(df).repartition(3), "k", "v", [(1, 2, "median")])
    by_key = {("<null>" if pd.isna(k) else k): m
              for k, m in zip(out["k"], out["median"])}
    assert by_key == {"a": 2, "<null>": 20, "b": 5}
    mode = grouped_mode(rd.from_pandas(df).repartition(3), "k", "v")
    assert len(mode) == 3                       # null-key group present


def test_frame_sampler_zero_duration_emits_no_frames():
    """duration_ms of 0 or null (metadata-extraction failure) must not
    fabricate a frame_idx=0 row with a fingerprint of no actual frame."""
    from datacapsule_ray.functions.multimodal import sample_frames

    t = pa.table({
        "media_ref": pa.array(["m0", "m1", "m2"]),
        "kind": pa.array(["video"] * 3),
        "payload": pa.array([b"x", b"y", b"z"], type=pa.binary()),
        "meta": pa.array([{"duration_ms": 0}, None,
                          {"duration_ms": 2500}]),
    })
    out = sample_frames(rd.from_arrow(t), every_ms=1000).to_pandas()
    assert set(out["media_ref"]) == {"m2"}      # m0/m1 contribute nothing
    assert out["frame_idx"].tolist() == [0, 1, 2]


def test_stage_kernels_tolerate_empty_and_masked_batches():
    """The phase-1 combine kernels must emit TYPED empty tables for
    empty / fully-masked batches (null-typed columns fail schema
    unification downstream; indexing an empty lexsort crashed)."""
    from datacapsule_ray.stages.graph import (_local_edge_dedup,
                                              _local_node_best)
    from datacapsule_ray.stages.vectors import _topk_batch

    one = pa.table({"subj": ["a"], "pred": ["p"], "obj": ["b"]})
    # a 1-row batch whose key hashes outside every slice of some n
    for i in range(4):
        out = _local_edge_dedup(one, key_filter=(i, 4))
        assert out.schema.field("key").type == pa.string()
        assert out.schema.field("n_dups").type == pa.int64()
    empty = one.slice(0, 0)
    out = _local_edge_dedup(empty)
    assert len(out) == 0 and out.schema.field("key").type == pa.string()

    node = pa.table({"node_id": ["x"], "node_type": ["种"],
                     "name": ["x"], "中文学名": ["x"], "拉丁学名": ["X y"],
                     "命名年份": ["1901"], "作者": ["A"],
                     "prio": pa.array([0], type=pa.int8()),
                     "seq": pa.array([1], type=pa.int64())})
    for i in range(4):
        out = _local_node_best(node, key_filter=(i, 4))
        assert out.schema.field("packed").type == pa.string()

    emb = pa.table({"vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float32()))})
    out = _topk_batch(emb, np.ones(4, dtype=np.float32), 3, ["vec_id"])
    assert len(out) == 0


def test_parse_tolerates_null_span_text():
    """SPAN_STRUCT permits null text (a natural media-span encoding);
    the vectorized parse must treat it as empty, not crash or corrupt
    the value index of later spans."""
    from datacapsule_ray.schema import DOCUMENTS_SCHEMA
    from datacapsule_ray.stages.extract import parse_documents_batch

    batch = pa.Table.from_pydict({
        "doc_id": ["doc-00000001"],
        "spans": [[
            {"kind": "text", "text": "中文学名：测试鱼", "media_ref": "", "offset": 0},
            {"kind": "image", "text": None, "media_ref": "m://1", "offset": 9},
            {"kind": "text", "text": "界：动物界", "media_ref": "", "offset": 10},
        ]],
    }, schema=DOCUMENTS_SCHEMA)
    out = parse_documents_batch(batch)
    df = out.to_pandas()
    assert df["中文学名"].iloc[0] == "测试鱼"
    assert df["界"].iloc[0] == "动物界"  # index NOT corrupted by the null


def test_token_stats_null_text():
    """Null text counts as empty instead of crashing the stats kernel."""
    t = pa.table({"doc_id": [1, 2], "text": ["a b", None]})
    out = text.token_stats_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 2
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "n_chars"] == 0


def test_minhash_bands_must_divide_num_perm():
    with pytest.raises(ValueError, match="must divide"):
        dedup.minhash_lsh_pairs(
            rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]})),
            num_perm=64, bands=12)


def test_dedup_pairs_string_ids_and_int_dtype():
    """The sorted-scan pair combine keeps one block schema regardless of
    id dtype (strings included) and preserves an integer value column's
    dtype, matching the groupby-Min semantics it replaced."""
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": ["a", "a", "b", "c", "c", "c"],
        "id_b": ["x", "x", "y", "z", "z", "w"],
        "hamming": [3, 1, 2, 5, 4, 0],
    }))
    out = (dedup._dedup_pairs(pairs, "hamming").to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert out["hamming"].dtype == np.int64
    assert out.to_dict("records") == [
        {"id_a": "a", "id_b": "x", "hamming": 1},
        {"id_a": "b", "id_b": "y", "hamming": 2},
        {"id_a": "c", "id_b": "w", "hamming": 0},
        {"id_a": "c", "id_b": "z", "hamming": 4},
    ]


def test_dedup_pairs_empty_input():
    empty = rd.from_pandas(pd.DataFrame({
        "id_a": pd.Series(dtype="int64"),
        "id_b": pd.Series(dtype="int64"),
        "v": pd.Series(dtype="float64")}))
    assert len(dedup._dedup_pairs(empty, "v").to_pandas()) == 0


def test_keep_best_dedup_boundary_groups():
    """Quality-aware keep: max score wins, ties break to smallest id;
    groups deliberately straddle block boundaries (many tiny blocks) so
    the run-boundary raw channel is exercised."""
    rows = []
    for g in range(10):
        for m in range(7):  # 7 members per group, scores 0..6
            rows.append({"grp": f"g{g:02d}", "doc_id": 100 * g + m,
                         "score": (m * 3) % 7})
    # duplicate the top score so the id tiebreak matters
    rows.append({"grp": "g03", "doc_id": 999, "score": 6})
    df = pd.DataFrame(rows).sample(frac=1, random_state=5)
    ds = rd.from_pandas(df).repartition(13)
    out = (dedup.keep_best_dedup(ds, group_col="grp", score_col="score",
                                 id_col="doc_id")
           .to_pandas().sort_values("grp").reset_index(drop=True))
    assert len(out) == 10
    assert (out["n_copies"] == [7, 7, 7, 8] + [7] * 6).all()
    assert (out["score"] == 6).all()
    # g03 has scores 6 at doc 302 and 999 → keep 302
    assert out.loc[out["grp"] == "g03", "doc_id"].item() == 302
    exp = {f"g{g:02d}": 100 * g + 2 for g in range(10)}
    assert dict(zip(out["grp"], out["doc_id"])) == exp


def test_media_resizer_plan_geometry():
    from datacapsule_ray.functions import multimodal as mm

    r = mm.MediaResizer(max_w=224, max_h=224)
    assert r.plan(448, 224) == (224, 112)    # width binds
    assert r.plan(224, 448) == (112, 224)    # height binds
    assert r.plan(224, 224) == (224, 224)    # exact fit
    assert r.plan(0, 100) == (2, 224)        # degenerate width clamps to 1
    assert r.plan(10000, 1) == (224, 1)      # extreme aspect floors to >=1
    with pytest.raises(ValueError):
        mm.MediaResizer(decoder="reall")  # typo fails fast; "real" works
        # (pixel path covered in tests/test_imagecodec.py)
    out = mm.resize_media(rd.from_arrow(pa.table({
        "media_ref": ["m1"], "kind": ["image"], "payload": [b"xyz"],
        "meta": [{"width": 640, "height": 200, "duration_ms": 0}],
    })), max_w=224, max_h=224).to_pandas()
    assert out.loc[0, "out_w"] == 224 and out.loc[0, "out_h"] == 70
    assert len(out.loc[0, "payload"]) == 20  # sha1 stand-in payload


def test_repetition_stats_matches_python_reference():
    t = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a b a b a", "", "  x  ", None, "w1 w2 w3 w1 w1 w2"],
    })
    out = text.repetition_stats_batch(t).to_pandas().set_index("doc_id")
    from collections import Counter
    for did, txt in zip([1, 2, 3, 4, 5],
                        ["a b a b a", "", "  x  ", "", "w1 w2 w3 w1 w1 w2"]):
        c = Counter(txt.split())
        row = out.loc[did]
        assert row["n_tokens"] == sum(c.values())
        assert row["n_distinct_tokens"] == len(c)
        assert row["dup_token_count"] == sum(c.values()) - len(c)
        assert row["top_token_count"] == (max(c.values()) if c else 0)


def test_repetition_stats_partitioning_invariance(dup_docs, ray_session):
    one = text.repetition_stats(
        rd.from_pandas(dup_docs).repartition(1)).to_pandas()
    many = text.repetition_stats(
        rd.from_pandas(dup_docs).repartition(7)).to_pandas()
    pd.testing.assert_frame_equal(
        one.sort_values("doc_id").reset_index(drop=True),
        many.sort_values("doc_id").reset_index(drop=True))


def test_redact_presets_and_null_passthrough():
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["mail a.b+c@d-e.co or http://x.y/z?q=1 done",
                 "ip 10.0.0.1 tel +1(212)555-0100.",
                 None],
    })
    out = text.redact_batch(t).to_pandas()
    assert out["clean_text"].tolist()[:2] == [
        "mail <REDACTED> or <REDACTED> done",
        "ip <REDACTED> tel <REDACTED>.",
    ]
    assert out["clean_text"].isna().tolist() == [False, False, True]
    # custom pattern + replacement
    custom = text.redact_batch(t, [r"\bmail\b"], "X").to_pandas()
    assert custom["clean_text"][0].startswith("X a.b+c@d-e.co")


def test_kmeans_matches_sequential_reference_across_partitionings(ray_session):
    from datacapsule_ray.functions import clustering

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(240, 16))
    mat[:80] += 4.0  # three planted blobs
    mat[80:160] -= 4.0
    t = pa.table({
        "vec_id": pa.array(range(240), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), type=pa.float64()), 16),
    })

    # sequential Lloyd reference: same init (k smallest ids), same
    # tie rule (argmin -> lowest index), empty cluster keeps centroid
    k, iters = 6, 4
    cents = mat[:k].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                cents[j] = mat[m].mean(axis=0)
    ref_assign = (((mat[:, None, :] - cents[None, :, :]) ** 2)
                  .sum(axis=2).argmin(axis=1))

    for parts in (1, 5):
        ds = rd.from_arrow(t).repartition(parts)
        fit = clustering.kmeans_fit(ds, k, iters=iters)
        np.testing.assert_allclose(fit["centroids"], cents, atol=1e-9)
        got = (clustering.kmeans_assign(ds, fit["centroids"])
               .to_pandas().sort_values("vec_id"))
        assert got["cluster"].to_numpy().tolist() == ref_assign.tolist()
        assert fit["counts"].sum() == 240
        assert fit["inertia"] >= 0.0


def test_kmeans_assign_tie_breaks_to_lowest_index(ray_session):
    from datacapsule_ray.functions import clustering

    t = pa.table({
        "vec_id": pa.array([0, 1], type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array([1.0, 0.0, 0.0, 1.0], type=pa.float64()), 2),
    })
    cents = np.array([[0.0, 0.0], [0.0, 0.0], [9.0, 9.0]])  # 0 and 1 tie
    out = (clustering.kmeans_assign(rd.from_arrow(t), cents)
           .to_pandas().sort_values("vec_id"))
    assert out["cluster"].tolist() == [0, 0]


def test_kmeans_seed_centroids_partial_topk(ray_session):
    from datacapsule_ray.functions import clustering

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(50, 4))
    ids = rng.permutation(50) + 100
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), type=pa.float64()), 4),
    })
    sids, cents = clustering.seed_centroids(
        rd.from_arrow(t).repartition(6), 5)
    assert sids.tolist() == sorted(ids)[:5]
    want = mat[np.argsort(ids, kind="stable")[:5]]
    np.testing.assert_array_equal(cents, want)


def test_embedding_neardup_kmeans_matches_lsh_on_planted(emb_table):
    t, mat = emb_table
    pairs = dedup.embedding_neardup_kmeans_pairs(
        rd.from_arrow(t), threshold=0.99, k_cells=6, nprobe=2).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    want = {(5, 250), (5, 251), (5, 252), (250, 251), (250, 252), (251, 252)}
    assert want <= got
    assert not (got - want)
    # multi-probe duplicates collapsed: every pair appears once
    assert len(pairs) == len(got)


def test_ivf_pretrained_centroids_path(emb_table):
    t, mat = emb_table
    from datacapsule_ray.functions import clustering

    ds = rd.from_arrow(t)
    fit = clustering.kmeans_fit(ds, 8, iters=3)
    q = mat[7].astype(np.float64)
    exact = similarity.topk_cosine(ds, q, k=10)
    approx = similarity.ivf_topk_cosine(ds, q, k=10, nprobe=4,
                                        centroids=fit["centroids"])
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.7
    assert approx["vec_id"].iloc[0] == 7
