"""Fifth review-pass regressions: committed-only star views, untyped
start nodes in the distributed traversal, the distributed agent's
attribute contract, corpus-shard parameter staleness, and the all-empty
edges frontier guard."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


def test_connect_star_ignores_tmp_partition_dirs(tmp_path):
    """A crash between parquet write and the atomic partition rename
    leaves a part-NNNNN.tmp dir; the star SQL views must serve only
    committed partitions (the old part-* glob matched the leftover and
    silently duplicated rows)."""
    from datacapsule_ray.pipelines.star_query import connect_star
    from datacapsule_ray.state.checkpoint import CheckpointStore

    root = str(tmp_path / "ck")
    store = CheckpointStore(root)
    t = pa.table({"species_id": [1, 2], "latin_name": ["a", "b"]})
    for stage in ("species", "distributions", "numerical_traits",
                  "descriptions"):
        store.write_partition(stage, 0, rd.from_arrow(t), ["f0"])
    # plant a crash leftover: a full copy of partition 0 still in .tmp
    committed = os.path.join(root, "species", "part-00000")
    leftover = committed + ".tmp"
    shutil.copytree(committed, leftover)
    con = connect_star(root)
    n = con.sql("SELECT COUNT(*) AS n FROM species").df()["n"].iloc[0]
    assert int(n) == 2  # not 4: the .tmp copy must be invisible


def test_distributed_find_untyped_start_is_dead_end():
    """GraphIndex's DFS returns {} for a start node whose node_type is
    empty/null (`if not source_type: return`); the dataset-resident
    traversal must not expand such a node's neighbors instead."""
    from datacapsule_ray.traverse import (GraphIndex, build_typed_adjacency,
                                          find_nodes_by_type_distributed)

    nodes_t = pa.table({
        "node_id": ["untyped", "k1", "s1", "s2"],
        "node_type": ["", "科", "种", "种"],
    })
    edges_t = pa.table({
        "src": ["untyped", "k1", "k1"],
        "rel": ["r", "包含", "包含"],
        "dst": ["k1", "s1", "s2"],
    })
    hier = {"科": 6, "种": 7}
    gi = GraphIndex(nodes_t, edges_t, hierarchy=hier, leaf_level=7)
    assert gi.find_nodes_by_node_type("untyped", "种") == set()

    nodes_ds, edges_ds = rd.from_arrow(nodes_t), rd.from_arrow(edges_t)
    adj = build_typed_adjacency(nodes_ds, edges_ds, hierarchy=hier,
                                num_partitions=2).materialize()
    df = find_nodes_by_type_distributed(
        adj, nodes_ds, ["untyped"], "种", hierarchy=hier,
        leaf_level=7).to_pandas()
    got = set(df["node_id"]) if len(df) else set()
    assert got == set()  # parity: dead end, not {s1, s2} via k1
    # the typed start keeps working on the same adjacency
    df2 = find_nodes_by_type_distributed(
        adj, nodes_ds, ["k1"], "种", hierarchy=hier,
        leaf_level=7).to_pandas()
    assert set(df2["node_id"]) == {"s1", "s2"}


def test_distributed_agent_node_attribute_contract():
    """DistributedAgentTools.get_node_attribute must match GraphIndex's
    shape exactly: node_id popped, None-valued columns dropped (the
    observation text feeds planner prompts — the tiers may not differ)."""
    from datacapsule_ray.agent import DistributedAgentTools
    from datacapsule_ray.traverse import GraphIndex, build_typed_adjacency

    nodes_t = pa.table({
        "node_id": ["n1", "n2"],
        "node_type": ["种", "科"],
        "name": ["fish", None],
        "description": [None, "a family"],
    })
    edges_t = pa.table({"src": ["n2"], "rel": ["包含"], "dst": ["n1"]})
    hier = {"科": 6, "种": 7}
    gi = GraphIndex(nodes_t, edges_t, hierarchy=hier, leaf_level=7)
    nodes_ds, edges_ds = rd.from_arrow(nodes_t), rd.from_arrow(edges_t)
    adj = build_typed_adjacency(nodes_ds, edges_ds, hierarchy=hier,
                                num_partitions=2).materialize()
    tools = DistributedAgentTools(adj, nodes_ds, hierarchy=hier,
                                  leaf_level=7)
    for nid in ("n1", "n2"):
        assert tools.get_node_attribute(nid) == gi.get_node_attribute(nid)
    with pytest.raises(KeyError):
        tools.get_node_attribute("missing")


def test_write_corpus_regenerates_on_param_change(tmp_path):
    """Shard filenames encode neither seed nor docs_per_file; reuse must
    key on both (the old exists-check served a stale corpus after a
    parameter change)."""
    from datacapsule_ray.fixtures import write_corpus

    d = str(tmp_path / "corpus")
    files1 = write_corpus(d, 8, seed=1, docs_per_file=4)
    t1 = pq.read_table(files1[0])
    # same params → shards reused byte-identically
    write_corpus(d, 8, seed=1, docs_per_file=4)
    assert pq.read_table(files1[0]).equals(t1)
    # changed seed → shards regenerated with different content
    files2 = write_corpus(d, 8, seed=2, docs_per_file=4)
    assert files2 == files1
    assert not pq.read_table(files2[0]).equals(t1)
    # changed docs_per_file → repartitioned (different shard count)
    files3 = write_corpus(d, 8, seed=2, docs_per_file=2)
    assert len(files3) == 4


def test_expand_frontier_all_empty_edges():
    """An edges dataset whose blocks are all empty bypasses map_batches
    and lands on the driver with the raw edges schema — the frontier
    expansion must return no neighbors, not KeyError('node')."""
    from datacapsule_ray.traverse import expand_frontier

    edges = rd.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "rel": pa.array([], pa.string()),
        "dst": pa.array([], pa.string()),
    }))
    assert expand_frontier(edges, {"a"}, rounds=2) == set()


# --- second review batch ----------------------------------------------------

def test_complete_batch_positional_choices_and_short_response():
    """Servers that omit per-choice `index` rely on positional order —
    the client must not collapse the chunk onto slot 0; a short choices
    list must raise instead of silently degrading prompts to ''."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from datacapsule_ray.clients import OpenAICompatClient

    class H(BaseHTTPRequestHandler):
        short = False

        def log_message(self, *a):
            pass

        def do_POST(self):
            payload = json.loads(
                self.rfile.read(int(self.headers["Content-Length"])))
            prompts = payload["prompt"]
            choices = [{"text": f"answer-{p}"} for p in prompts]  # no index
            if H.short:
                choices = choices[:-1]
            body = json.dumps({"choices": choices}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        client = OpenAICompatClient(
            base_url=f"http://127.0.0.1:{srv.server_address[1]}")
        out = client.complete_batch(["a", "b", "c"])
        assert out == ["answer-a", "answer-b", "answer-c"]
        H.short = True
        with pytest.raises(ValueError, match="2 choices for 3 prompts"):
            client.complete_batch(["a", "b", "c"])
    finally:
        srv.shutdown()
        srv.server_close()


def test_remote_embedder_empty_batch_no_http():
    """An empty block must produce a (0, dim) matrix without any HTTP
    call (client.embed([]) returns shape (0,), failing the shape check)."""
    from datacapsule_ray.clients import RemoteEmbedder

    emb = RemoteEmbedder.__new__(RemoteEmbedder)  # skip client construction
    emb.dim = 32
    emb.client = None  # any attribute access would raise — proves no call
    out = emb._embed([])
    assert out.shape == (0, 32)


def test_hll_by_key_empty_blocks():
    """Empty blocks must emit typed empty partials (not zero-column
    frames), and an all-empty dataset returns an empty typed result."""
    from datacapsule_ray.functions.sketches import hll_distinct_by_key

    empty = pd.DataFrame({"k": pd.Series(dtype="object"),
                          "v": pd.Series(dtype="int64")})
    some = pd.DataFrame({"k": ["a"] * 5, "v": [1, 2, 3, 2, 1]})
    ds = rd.from_pandas([empty, some, empty])
    out = hll_distinct_by_key(ds, "k", "v", p=10)
    assert list(out["k"]) == ["a"]
    assert abs(out["approx_distinct"].iloc[0] - 3) < 1
    out2 = hll_distinct_by_key(rd.from_pandas(empty), "k", "v", p=10)
    assert len(out2) == 0 and list(out2.columns) == ["k", "approx_distinct"]


def test_user_sessions_oracle_parity_subsecond_boundary(tmp_path):
    """A same-user gap of 1800.3s (within the ~1s band around the
    threshold) must count as a session break in BOTH the engine and the
    declared SQL oracle — date_diff('second') semantics disagreed here."""
    import duckdb

    import __ray_entry__ as em
    from datacapsule_ray.pipelines import relational as r

    ts0 = pd.Timestamp("2024-01-01 02:00:00.100")
    events = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 8, 8],
        "ts": [ts0, ts0 + pd.Timedelta(seconds=1800.3),       # break
               ts0, ts0 + pd.Timedelta(seconds=1799.8)],      # same session
        "event_type": ["click"] * 4,
        "value": [1.0] * 4,
    })
    events["ts"] = events["ts"].astype("datetime64[us]")
    d = tmp_path / "sf"
    d.mkdir()
    events.to_parquet(d / "events.parquet", index=False)
    got = (r.user_sessions(str(d)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = (con.sql(em.oracle_sql()["user_sessions"]).df()
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["user_id", "n_events", "n_sessions"]].astype("int64"),
        want.astype("int64"))
    assert got["n_sessions"].tolist() == [2, 1]


def test_lsh_hot_bucket_boundary_cap_exact_and_accounted():
    """A hot bucket spanning block boundaries must (a) yield exactly the
    pairs of its max_bucket smallest ids — identical to the uncapped
    driver merge + head() — and (b) report the full uncapped drop count,
    while each boundary fragment ships at most max_bucket raw rows."""
    import numpy as np

    from datacapsule_ray.functions import dedup

    n, cap = 60, 10
    docs = pd.DataFrame({
        "doc_id": np.arange(n),
        "text": ["the same exact template text repeated many times"] * n,
    })
    stats = {}
    pairs = dedup.minhash_lsh_pairs(
        rd.from_pandas(docs).repartition(8), threshold=0.5,
        max_bucket=cap, stats=stats).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    want = {(i, j) for i in range(cap) for j in range(i + 1, cap)}
    assert got == want        # exactly the cap smallest ids' pairs
    # identical docs share one bucket per band: 16 bands × (60 - 10)
    assert stats["dropped_rows"] == 16 * (n - cap)


def test_asof_join_ns_epoch_int64_exact():
    """Nanosecond-epoch int64 timestamps (~1.7e18 > 2^53) and hashed
    63-bit ids must survive the as-of join EXACTLY — the pandas-block
    formulation rounded them through float64 (off by up to ~128 ns)."""
    from datacapsule_ray.functions.asof import asof_join

    base = 1_700_000_000_000_000_000              # ns epoch, > 2^53
    big_id = (1 << 62) + 12345                     # hashed-id scale
    left = pd.DataFrame({
        "event_id": np.array([big_id + i for i in range(6)], dtype=np.int64),
        "user_id": [1, 1, 1, 2, 2, 2],
        "ts": np.array([base + 10, base + 20, base + 30,
                        base + 10, base + 20, base + 30], dtype=np.int64),
    })
    right = pd.DataFrame({
        "event_id": np.array([big_id + 100, big_id + 101], dtype=np.int64),
        "user_id": [1, 2],
        # +13 and +21: odd offsets float64 would round at this magnitude
        "ts": np.array([base + 13, base + 21], dtype=np.int64),
        "value": np.array([base + 7, base + 9], dtype=np.int64),
    })
    ds = asof_join(
        rd.from_pandas(left).repartition(4), rd.from_pandas(right),
        key="user_id", ts_col="ts", tiebreak_col="event_id",
        value_cols=["value"], join_type="left")
    # gather as ARROW — a to_pandas() here would itself decay the
    # nullable int64 output to float64 and mask the regression
    from datacapsule_ray.traverse import gather_table

    rows = gather_table(ds).to_pylist()
    assert len(rows) == 6
    matched1 = {r["ts_asof"] for r in rows
                if r["user_id"] == 1 and r["ts_asof"] is not None}
    assert matched1 == {base + 13}
    vals1 = {r["value_asof"] for r in rows
             if r["user_id"] == 1 and r["value_asof"] is not None}
    assert vals1 == {base + 7}
    matched2 = {r["ts_asof"] for r in rows
                if r["user_id"] == 2 and r["ts_asof"] is not None}
    assert matched2 == {base + 21}
    # left ids preserved bit-for-bit
    assert {r["event_id"] for r in rows} == {big_id + i for i in range(6)}


def test_pack_sequences_matches_sequential_reference():
    """Per-partition greedy packing must equal the sequential reference
    exactly — including oversized docs (own bin) and zero-token docs."""
    from datacapsule_ray.functions.packing import (pack_sequences,
                                                   pack_sequences_ref)

    rng = np.random.default_rng(11)
    n = 500
    toks = rng.integers(0, 400, size=n).astype(np.int64)
    toks[50] = 5000            # oversized
    toks[51] = 0               # zero-token
    ids = [f"doc-{i:05d}" for i in range(n)]
    df = pd.DataFrame({"doc_id": ids, "n_tokens": toks})
    # ONE partition → global-sequential semantics apply exactly
    got = (pack_sequences(rd.from_pandas(df), cap=1000).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = pd.DataFrame(pack_sequences_ref(ids, toks.tolist(), 1000)) \
        .rename(columns={"id": "doc_id"}) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "bin_id", "bin_tokens", "n_docs_in_bin",
             "oversized"]], want, check_dtype=False)
    # invariants: no non-oversized bin exceeds cap; bins are contiguous
    per_bin = got.drop_duplicates("bin_id")
    ok = per_bin[~per_bin["oversized"]]
    assert (ok["bin_tokens"] <= 1000).all()

    # two partitions pack independently (the documented contract)
    df1, df2 = df.iloc[:250], df.iloc[250:]
    got2 = (pack_sequences(rd.from_pandas([df1, df2]), cap=1000)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want2 = pd.DataFrame(
        pack_sequences_ref(ids[:250], toks[:250].tolist(), 1000)
        + pack_sequences_ref(ids[250:], toks[250:].tolist(), 1000)) \
        .rename(columns={"id": "doc_id"}) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got2[["doc_id", "bin_id", "bin_tokens", "n_docs_in_bin",
              "oversized"]], want2, check_dtype=False)


def test_pack_sequences_null_tokens_are_zero():
    """A null token count packs as zero (NaN→int64 garbage would
    corrupt every bin in the block)."""
    from datacapsule_ray.functions.packing import pack_sequences

    t = pa.table({"doc_id": ["a", "b", "c"],
                  "n_tokens": pa.array([100, None, 50], pa.int64())})
    out = pack_sequences(rd.from_arrow(t), cap=120).to_pandas()
    assert out["bin_tokens"].tolist() == [100, 100, 50]
    assert out["bin_id"].tolist() == ["a", "a", "c"]


def test_write_corpus_shrink_and_regrow(tmp_path):
    """Shrinking n_docs removes orphan shards and fixes the tail shard;
    regrowing with a non-multiple tail regenerates the short shard."""
    from datacapsule_ray.fixtures import write_corpus

    d = str(tmp_path / "c")
    write_corpus(d, 10, seed=3, docs_per_file=4)   # shards of 4,4,2
    files = write_corpus(d, 6, seed=3, docs_per_file=4)  # shrink: 4,2
    assert len(files) == 2
    names = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    assert names == ["part-00000.parquet", "part-00001.parquet"]
    assert pq.read_metadata(files[-1]).num_rows == 2
    files = write_corpus(d, 10, seed=3, docs_per_file=4)  # regrow
    assert [pq.read_metadata(f).num_rows for f in files] == [4, 4, 2]


def test_interaction_store_concurrent_upsert_delete_distinct_seq(tmp_path):
    """An upsert and a delete racing to the same sequence number must
    commit under DIFFERENT numbers (the op-suffixed rename alone would
    let both commit seq N, leaving last-write-wins to alphabetics)."""
    import re

    from datacapsule_ray.state.interactions import InteractionStore

    d = str(tmp_path / "st")
    st = InteractionStore(d)
    st.append([{"id": "1", "question": "q", "model": "m", "version": "v",
                "modelResponse": "a", "reasoning": "r"}])
    # simulate the race: a concurrent writer claims the next seq before
    # our delete commits — the delete must slide to the following seq
    nxt = st._next_seq()
    os.mkdir(os.path.join(d, f".claim-{nxt:06d}"))
    st.delete(["1"])
    segs = [s for s in os.listdir(d) if s.startswith("seg-")]
    seqs = sorted(int(re.match(r"seg-(\d+)-", s).group(1)) for s in segs)
    assert seqs == sorted(set(seqs))          # all distinct
    assert max(seqs) == nxt + 1               # delete slid past the claim
    assert st.get("1") is None                # tombstone still wins


def test_heavy_hitters_exact_and_truncated():
    """Small-k truncation: the true heavy hitter still surfaces, its
    count interval [lo, hi] brackets the true count, and exact=False;
    with k large enough the result is exact (exact=True, lo==hi==true)."""
    from datacapsule_ray.functions.sketches import heavy_hitters

    rng = np.random.default_rng(7)
    # one dominant value + a long tail, spread over several blocks
    vals = ["HOT"] * 500 + [f"t{i}" for i in rng.integers(
        0, 400, size=2000)]
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    ds = rd.from_pandas([df.iloc[i::4].reset_index(drop=True)
                         for i in range(4)])

    exact = heavy_hitters(ds, "v", k=10_000, top=5)
    assert bool(exact["exact"].all())
    assert exact.iloc[0]["v"] == "HOT"
    assert exact.iloc[0]["count_lo"] == exact.iloc[0]["count_hi"] == 500

    trunc = heavy_hitters(ds, "v", k=20, top=5)
    assert not bool(trunc["exact"].any())
    assert trunc.iloc[0]["v"] == "HOT"          # survives truncation
    row = trunc.iloc[0]
    assert row["count_lo"] <= 500 <= row["count_hi"]


def test_heavy_hitters_int_column_and_empty():
    """Non-string columns must work (the marker row rides a None slot,
    not a string sentinel) and an all-empty dataset returns a typed
    empty frame instead of KeyError."""
    from datacapsule_ray.functions.sketches import heavy_hitters

    df = pd.DataFrame({"user_id": [7] * 10 + [1, 2, 3]})
    out = heavy_hitters(rd.from_pandas(df), "user_id", k=100, top=2)
    assert out.iloc[0]["user_id"] == 7
    assert out.iloc[0]["count_lo"] == 10
    assert bool(out["exact"].all())

    empty = pd.DataFrame({"v": pd.Series([], dtype=object)})
    out2 = heavy_hitters(rd.from_pandas(empty), "v", top=5)
    assert len(out2) == 0
    assert list(out2.columns) == ["v", "count_lo", "count_hi", "exact"]


def test_interaction_store_claim_is_permanent_until_compact(tmp_path):
    """The seq-claim marker must persist after commit (removing it
    reopens the duplicate-seq race for a descheduled writer); compact
    sweeps only claims below the newest committed seq."""
    from datacapsule_ray.state.interactions import InteractionStore

    d = str(tmp_path / "st")
    st = InteractionStore(d)
    st.append([{"id": "1", "question": "q", "model": "m", "version": "v",
                "modelResponse": "a", "reasoning": "r"}])
    st.append([{"id": "2", "question": "q", "model": "m", "version": "v",
                "modelResponse": "a", "reasoning": "r"}])
    claims = sorted(n for n in os.listdir(d) if n.startswith(".claim-"))
    assert claims == [".claim-000000", ".claim-000001"]
    st.compact()
    claims = sorted(n for n in os.listdir(d) if n.startswith(".claim-"))
    assert claims == [".claim-000002"]      # only the compact's own claim
    assert st.get("1") is not None and st.get("2") is not None


@pytest.mark.parametrize("seed,n,nkeys,nparts,join_type", [
    (1, 300, 3, 7, "left"),
    (2, 2000, 1, 24, "left"),      # one hot key across many blocks
    (3, 1500, 40, 5, "inner"),     # many keys, few rows each
    (4, 800, 6, 13, "inner"),
    (5, 50, 50, 9, "left"),        # mostly singleton keys
])
def test_asof_join_randomized_vs_merge_asof(seed, n, nkeys, nparts,
                                            join_type):
    """Randomized sweep of the Arrow as-of join against pandas
    merge_asof across key-cardinality / partitioning / join-type
    regimes (ties, right-less keys, and carry chains all arise by
    construction)."""
    from datacapsule_ray.functions.asof import asof_join

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, nkeys, size=n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 50, size=n), unit="s"),  # many ties
        "kind": rng.choice(["L", "R"], size=n, p=[0.75, 0.25]),
        "value": rng.integers(0, 1000, size=n).astype("int64"),
    })
    left = df[df.kind == "L"][["event_id", "user_id", "ts"]]
    right = df[df.kind == "R"][["event_id", "user_id", "ts", "value"]]
    if left.empty or right.empty:
        pytest.skip("degenerate draw")
    out = asof_join(
        rd.from_pandas(left).repartition(nparts),
        rd.from_pandas(right).repartition(3),
        key="user_id", ts_col="ts", tiebreak_col="event_id",
        value_cols=["value"], join_type=join_type,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    ref = pd.merge_asof(
        left.sort_values(["ts", "event_id"], kind="stable"),
        right.sort_values(["ts", "event_id"], kind="stable")
        .rename(columns={"event_id": "r_event_id"}),
        on="ts", by="user_id", direction="backward",
        allow_exact_matches=True, suffixes=("", "_r"))
    if join_type == "inner":
        ref = ref[ref["value"].notna()]
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert len(out) == len(ref), (len(out), len(ref))
    assert (out["event_id"].to_numpy() == ref["event_id"].to_numpy()).all()
    got_v = out["value_asof"].to_numpy(dtype="float64", na_value=np.nan)
    ref_v = ref["value"].to_numpy(dtype="float64", na_value=np.nan)
    np.testing.assert_array_equal(np.isnan(got_v), np.isnan(ref_v))
    np.testing.assert_array_equal(got_v[~np.isnan(got_v)],
                                  ref_v[~np.isnan(ref_v)])


def test_events_in_windows_statless_parquet_fallback(tmp_path):
    """A parquet file WITHOUT row-group statistics must take the
    distributed min/max fallback and produce the same window hits as
    the stats-driven path."""
    import pyarrow.parquet as pq_

    from datacapsule_ray.pipelines.relational import (
        _parquet_column_bounds, events_in_windows)

    ev = pd.DataFrame({
        "event_id": np.arange(100),
        "ts": pd.to_datetime("2024-03-01")
        + pd.to_timedelta(np.arange(100) * 37, unit="min"),
        "event_type": ["click"] * 100,
        "user_id": np.zeros(100, dtype=np.int64),
        "value": np.ones(100),
    })
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    d1, d2 = tmp_path / "with_stats", tmp_path / "no_stats"
    d1.mkdir(); d2.mkdir()
    t = pa.Table.from_pandas(ev, preserve_index=False)
    pq_.write_table(t, d1 / "events.parquet")
    pq_.write_table(t, d2 / "events.parquet", write_statistics=False)
    assert _parquet_column_bounds(str(d1 / "events.parquet"), "ts")
    assert _parquet_column_bounds(str(d2 / "events.parquet"), "ts") is None
    a = (events_in_windows(str(d1)).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (events_in_windows(str(d2)).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    assert len(a) > 0                      # some events land in 02:00-03:00
    pd.testing.assert_frame_equal(a, b)
