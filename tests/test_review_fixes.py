"""Second review-pass fixes: string doc ids through the pair-verify
channel, chained-join empty-partition laundering, null-text guards,
markdown-fence/NL-prefix robustness, quantile fraction validation, and
GraphML fallback parity."""

import json

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _ssjoin_docs():
    return rd.from_pandas(pd.DataFrame({
        "doc_id": ["d1", "d2", "d3", "d4", "d5"],
        "text": ["a b c", "a b c",
                 "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10",
                 "t1 t2 t3 t4 t5 t6 t7 t8 t9",
                 "zzz"],
    }))


_WANT_PAIRS = {("d1", "d2", 3, 3), ("d3", "d4", 9, 10)}


def _pairs_set(df: pd.DataFrame) -> set:
    return {(r.id_a, r.id_b, int(r.n_inter), int(r.n_union))
            for r in df.itertuples()}


def test_jaccard_ssjoin_string_ids_broadcast_path():
    """String doc ids (the corpus fixtures' shape) must flow through the
    identical-set verify channel — it used to coerce ids to Int64 and
    raise on the first string."""
    from datacapsule_ray.functions.ssjoin import jaccard_ssjoin

    out = jaccard_ssjoin(_ssjoin_docs(), tau_num=9, tau_den=10).to_pandas()
    assert _pairs_set(out) == _WANT_PAIRS


def test_jaccard_ssjoin_string_ids_join_path():
    """broadcast_cap=0 forces the membership-join expansion: exercises
    the empty-partition laundering between the two chained joins (a
    sparse set-pair table leaves received-nothing partitions that Ray
    2.49 materializes schema-less) and string min/max orientation."""
    from datacapsule_ray.functions.ssjoin import jaccard_ssjoin

    out = jaccard_ssjoin(_ssjoin_docs(), tau_num=9, tau_den=10,
                         broadcast_cap=0).to_pandas()
    assert _pairs_set(out) == _WANT_PAIRS


def test_minhash_pairs_string_ids():
    """The LSH pair pipeline shares the same verify channel — string ids
    must survive it with their values intact."""
    from datacapsule_ray.functions.dedup import minhash_lsh_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": ["doc-b", "doc-a", "doc-c"],
        "text": [text, text,
                 "unique words only here nothing shared at all x y z"]}))
    pairs = minhash_lsh_pairs(ds, threshold=0.9).to_pandas()
    assert len(pairs) == 1
    assert (pairs["id_a"].iloc[0], pairs["id_b"].iloc[0]) == ("doc-a", "doc-b")


def test_lang_marker_counts_null_text(tmp_path):
    """A NULL text row must count as empty (all-zero hits), not crash
    the parent-index build."""
    import pyarrow.parquet as pq

    from datacapsule_ray.pipelines.docops import doc_lang_marker_counts

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["the quick fox and the dog", None], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    out = (doc_lang_marker_counts(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["en_hits"].iloc[0] > 0
    hit_cols = [c for c in out.columns if c.endswith("_hits")]
    assert (out.loc[1, hit_cols] == 0).all()


def test_clean_sql_strips_json_fence():
    """The generator contract returns a JSON object, so ```json is the
    natural fence — it must strip to parseable JSON."""
    from datacapsule_ray.pipelines.star_query import clean_sql

    fenced = '```json\n{"sql": "SELECT 1 AS x", "explanation": "e"}\n```'
    assert json.loads(clean_sql(fenced))["sql"] == "SELECT 1 AS x"
    assert clean_sql("```sql\nSELECT 1\n```") == "SELECT 1"


def test_rules_sql_strips_polite_prefix():
    """'请问带鱼的分布' must bind the species as 带鱼, not 请问带鱼
    (a silently-empty result inside a success envelope)."""
    from datacapsule_ray.pipelines.star_query import RuleSQLGenerator

    sql, _ = RuleSQLGenerator().generate("请问带鱼的分布", "{}")
    assert "chinese_name = '带鱼'" in sql


def test_quantile_fraction_guard():
    """num > den used to silently report each key's MINIMUM."""
    from datacapsule_ray.functions.quantiles import grouped_exact_quantiles

    ds = rd.from_pandas(pd.DataFrame({"k": [1, 1], "v": [5, 9]}))
    with pytest.raises(ValueError, match="0 < num/den <= 1"):
        grouped_exact_quantiles(ds, "k", "v", [(11, 10, "p110")])


def test_graphml_fallback_matches_nx_on_edge_only_nodes(tmp_path, monkeypatch):
    """An edge endpoint absent from the nodes table must be emitted as an
    attribute-less node by BOTH writer paths (nx auto-adds it), so the
    artifact and the return count do not depend on whether networkx is
    installed."""
    import sys

    from datacapsule_ray.export import read_graphml, write_graphml

    nodes = pa.table({"node_id": ["A", "B"],
                      "node_type": ["种", "属"]})
    edges = pa.table({"src": ["A", "X"], "rel": ["r1", "r2"],
                      "dst": ["B", "A"]})

    nx_path = str(tmp_path / "nx.graphml")
    n_nx = write_graphml(nodes, edges, nx_path)

    monkeypatch.setitem(sys.modules, "networkx", None)  # force ImportError
    fb_path = str(tmp_path / "fb.graphml")
    n_fb = write_graphml(nodes, edges, fb_path)

    assert n_nx == n_fb == 3
    for path in (nx_path, fb_path):
        nt, et = read_graphml(path)
        assert set(nt.column("node_id").to_pylist()) == {"A", "B", "X"}
        assert et.num_rows == 2


def test_checkpoint_empty_partition_commits(tmp_path):
    """A 0-row partition (sparse hash range, all-failed docs) must
    commit cleanly — Ray's write_parquet creates no directory for it,
    which used to crash the lineage stamp with FileNotFoundError."""
    from datacapsule_ray.state.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path))
    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    row = store.write_partition("stg", 0, empty, ["frag-0"])
    assert row.rows_out == 0
    assert store.partition_done("stg", 0)
    # a stage with SOME data still reads (empty parts contribute nothing)
    store.write_partition("stg", 1, rd.from_arrow(
        pa.table({"x": pa.array([7], pa.int64())})), ["frag-1"])
    assert store.read_stage("stg").to_pandas()["x"].tolist() == [7]


def test_checkpoint_read_before_run_is_clear_error(tmp_path):
    from datacapsule_ray.state.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path))
    assert store.stage_files("never_ran") == []
    with pytest.raises(FileNotFoundError, match="never_ran"):
        store.read_stage("never_ran")


def test_lang_id_null_text():
    """NULL text must classify as 'und', not crash the parent-index
    build (the docops counter had the same bug)."""
    from datacapsule_ray.functions.text import LangIdActor

    out = LangIdActor()(pa.table({
        "doc_id": [1, 2],
        "text": pa.array(["the quick fox and the dog", None], pa.string())}))
    assert out.column("lang_guess").to_pylist() == ["en", "und"]


def test_top_distinctive_terms_string_ids():
    from datacapsule_ray.functions.text import top_distinctive_terms

    ds = rd.from_arrow(pa.table({
        "doc_id": ["doc-a", "doc-b"],
        "text": ["apple apple banana", "banana cherry cherry"]}))
    out = top_distinctive_terms(ds).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == ["doc-a", "doc-b"]
    assert out["token"].tolist() == ["apple", "cherry"]


def test_frame_sampler_rejects_unknown_decoder():
    from datacapsule_ray.functions.multimodal import FrameSampler

    with pytest.raises(ValueError, match="reall"):
        FrameSampler(decoder="reall")
