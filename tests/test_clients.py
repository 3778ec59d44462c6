"""A1/A2 client integration: the KG pipeline end-to-end with an
OpenAI-compatible mock HTTP endpoint (in-process ThreadingHTTPServer —
no network), asserting the LLM-backed run matches the deterministic
rule-splitter run exactly, per-item parse failures degrade to the M11
raw-text fallback, and the batched embeddings path reproduces the
HashEmbedder vectors."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pandas as pd
import pytest

from datacapsule_ray.functions import splitters as sp

POISON = "PARSE_POISON"  # mock returns non-JSON for prompts holding this


class _MockHandler(BaseHTTPRequestHandler):
    """Deterministic OpenAI-style endpoint: completions answer the
    task-tagged splitter prompts with the rule splitters' output as
    JSON; embeddings return the hash embedding — so the LLM-backed
    pipeline must reproduce the hermetic run bit-for-bit."""

    def log_message(self, *a):  # quiet
        pass

    def _reply(self, obj):
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if self.path == "/v1/completions":
            choices = []
            for i, prompt in enumerate(payload["prompt"]):
                task, _, text = prompt.partition("\n")
                try:
                    if POISON in text:
                        out = "this is not valid json {"
                    elif task == "NL_TO_SQL":
                        from datacapsule_ray.pipelines.star_query import (
                            RuleSQLGenerator)

                        question = text.splitlines()[-1]
                        sql, expl = RuleSQLGenerator().generate(question, "")
                        # fenced, as chat models love to do — the engine
                        # must strip this (dspy_query_db.py:119-121)
                        out = ("```sql\n"
                               + json.dumps({"sql": sql, "explanation": expl},
                                            ensure_ascii=False)
                               + "\n```")
                    elif task == "SPLIT_LOCATIONS":
                        out = json.dumps(sp.split_locations(text), ensure_ascii=False)
                    elif task == "SPLIT_HABITS":
                        out = json.dumps(vars(sp.split_habits(text)), ensure_ascii=False)
                    elif task == "SPLIT_FEATURES":
                        out = json.dumps(vars(sp.split_features(text)), ensure_ascii=False)
                    else:
                        out = "{}"
                except Exception:
                    # an LLM "refusal"/garbage answer for this item only —
                    # the client must degrade that document, not the batch
                    out = "EXTRACTOR FAILED {"
                choices.append({"index": i, "text": out})
            self._reply({"choices": choices})
        elif self.path == "/v1/embeddings":
            from datacapsule_ray.stages.vectors import _hash_matrix

            mat = _hash_matrix(payload["input"], 32)
            self._reply({"data": [{"index": i, "embedding": row.tolist()}
                                  for i, row in enumerate(mat)]})
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def mock_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _MockHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _sorted_df(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_kg_pipeline_with_http_client_matches_rules(mock_server, tmp_path):
    from datacapsule_ray.fixtures import write_corpus
    from datacapsule_ray.pipelines.build_graph import KGPipeline

    files = write_corpus(str(tmp_path / "c"), 40, seed=21, docs_per_file=20)
    rules = KGPipeline(str(tmp_path / "ck_rules"))
    out_r = rules.run_all(files, files_per_partition=1, with_vectors=True)

    from datacapsule_ray.clients import RemoteEmbedder

    llm = KGPipeline(
        str(tmp_path / "ck_llm"),
        emitter_kwargs={"splitter": "http",
                        "client_config": {"base_url": mock_server}},
        embedder_cls=RemoteEmbedder,
        embedder_kwargs={"client_config": {"base_url": mock_server,
                                           "max_batch": 100}})
    out_l = llm.run_all(files, files_per_partition=1, with_vectors=True)

    for key in ("triples", "edges", "nodes"):
        pd.testing.assert_frame_equal(_sorted_df(out_l[key]), _sorted_df(out_r[key]))

    ev_r = out_r["entity_vectors"].to_pandas().sort_values(
        "entity_id", kind="stable").reset_index(drop=True)
    ev_l = out_l["entity_vectors"].to_pandas().sort_values(
        "entity_id", kind="stable").reset_index(drop=True)
    assert ev_r["entity_id"].tolist() == ev_l["entity_id"].tolist()
    a = np.stack(ev_r["embedding"].to_numpy())
    b = np.stack(ev_l["embedding"].to_numpy())
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_http_parse_failure_degrades_to_raw_fallback(mock_server):
    """A poisoned completion (non-JSON) must produce the M11 raw-text
    triple for that document/field only — never a task failure."""
    import pyarrow as pa

    from datacapsule_ray.stages.extract import GraphEmitter

    def rec(doc_id, num, dist):
        return {"doc_id": doc_id, "doc_num": num, "中文学名": f"种{num}",
                "拉丁学名": "L", "命名年份": "1900", "作者": "A",
                "界": None, "门": None, "纲": None, "目": None, "科": None,
                "属": None, "自然分布地": dist, "生活习性": None, "生物特征": None}

    batch = pa.Table.from_pylist([
        rec("doc-1", 1, "东海，南海"),
        rec("doc-2", 2, f"北部湾 {POISON}"),
    ])
    em = GraphEmitter(splitter="http", client_config={"base_url": mock_server})
    out = em(batch).to_pylist()
    triples = [r for r in out if r["kind"] == "triple" and r["pred"] == "分布于"]
    objs = {r["obj"] for r in triples}
    assert {"东海", "南海"} <= objs            # parsed path
    assert f"北部湾 {POISON}" in objs          # raw-text fallback, unsplit


def test_transport_failure_degrades_per_document():
    """Endpoint unreachable → every document falls back (M11), the Ray
    task still succeeds."""
    import pyarrow as pa

    from datacapsule_ray.stages.extract import GraphEmitter

    em = GraphEmitter(splitter="http",
                      client_config={"base_url": "http://127.0.0.1:9",  # closed port
                                     "timeout": 0.5})
    batch = pa.Table.from_pylist([{
        "doc_id": "doc-1", "doc_num": 1, "中文学名": "种1", "拉丁学名": "L",
        "命名年份": "1900", "作者": "A", "界": None, "门": None, "纲": None,
        "目": None, "科": None, "属": None, "自然分布地": "东海，南海",
        "生活习性": None, "生物特征": None}])
    out = em(batch).to_pylist()
    objs = {r["obj"] for r in out if r["kind"] == "triple" and r["pred"] == "分布于"}
    assert objs == {"东海，南海"}  # whole field, unsplit


def test_nl_to_sql_http_generator(mock_server, tmp_path):
    """The A6 generation half over HTTP: schema introspection + hint +
    question → fenced JSON completion → cleaned, guarded, executed."""
    from datacapsule_ray.fixtures import write_corpus
    from datacapsule_ray.pipelines.build_graph import KGPipeline
    from datacapsule_ray.pipelines.star_query import (
        HTTPSQLGenerator, NLQueryEngine)

    files = write_corpus(str(tmp_path / "c"), 20, seed=33, docs_per_file=10)
    ck = str(tmp_path / "ck")
    KGPipeline(ck).run_all(files, files_per_partition=1, with_vectors=False)
    eng = NLQueryEngine(ck, generator=HTTPSQLGenerator(base_url=mock_server))
    out = eng.query_database("数据库里有多少种物种？")
    assert out["success"] and out["results"][0]["n_species"] == 20
    out2 = eng.query_database("分布在东海的物种有哪些？")
    assert out2["success"] and "LIKE '%东海%'" in out2["sql"]


def test_embed_batching_chunks(mock_server):
    """The embeddings client honors max_batch: 250 texts → 3 requests'
    worth of results, identical to the hash embedder."""
    from datacapsule_ray.clients import OpenAICompatClient
    from datacapsule_ray.stages.vectors import _hash_matrix

    c = OpenAICompatClient(base_url=mock_server, max_batch=100)
    texts = [f"text number {i}" for i in range(250)]
    mat = c.embed(texts)
    assert mat.shape == (250, 32)
    np.testing.assert_allclose(mat, _hash_matrix(texts, 32), rtol=0, atol=1e-6)


class _FlakyHandler(BaseHTTPRequestHandler):
    """Fails each DISTINCT request payload N times with a retryable
    status before answering — exercises the client's bounded-retry
    path. 400s (non-retryable) when the prompt asks for it."""

    fail_first = 2
    seen: dict = {}

    def log_message(self, *a):
        pass

    def do_POST(self):
        payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        key = json.dumps(payload, sort_keys=True)
        prompts = payload.get("prompt", [])
        if any("HARD_FAIL" in p for p in prompts):
            self.send_response(400)
            self.end_headers()
            return
        n = self.seen.get(key, 0)
        self.seen[key] = n + 1
        if n < self.fail_first:
            self.send_response(429)  # throttled — retryable
            self.end_headers()
            return
        body = json.dumps({"choices": [
            {"index": i, "text": f"ok:{p}"} for i, p in enumerate(prompts)
        ]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def flaky_server():
    _FlakyHandler.seen = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FlakyHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_retry_succeeds_after_transient_429s(flaky_server):
    """Two 429s then success: the client's backoff absorbs transient
    throttling without surfacing an error (VERDICT r2 hardening item)."""
    from datacapsule_ray.clients import OpenAICompatClient

    c = OpenAICompatClient(base_url=flaky_server, max_retries=3,
                           backoff_s=0.01)
    out = c.complete_batch(["hello"])
    assert out == ["ok:hello"]


def test_retry_budget_exhausted_raises(flaky_server):
    """More consecutive 429s than max_retries → the last HTTP error
    propagates (and the splitter backends would turn it into per-item
    M11 fallbacks, test_transport_failure_degrades_per_document)."""
    import urllib.error

    from datacapsule_ray.clients import OpenAICompatClient

    _FlakyHandler.seen = {}
    _FlakyHandler.fail_first = 99
    try:
        c = OpenAICompatClient(base_url=flaky_server, max_retries=2,
                               backoff_s=0.01)
        with pytest.raises(urllib.error.HTTPError):
            c.complete_batch(["hello"])
        # exactly 1 + max_retries attempts were made
        assert sum(_FlakyHandler.seen.values()) == 3
    finally:
        _FlakyHandler.fail_first = 2


def test_non_retryable_http_error_raises_immediately(flaky_server):
    """A 400 (bad request) must NOT burn the retry budget."""
    import urllib.error

    from datacapsule_ray.clients import OpenAICompatClient

    c = OpenAICompatClient(base_url=flaky_server, max_retries=3,
                           backoff_s=5.0)  # a retry would be visible
    import time

    t0 = time.monotonic()
    with pytest.raises(urllib.error.HTTPError):
        c.complete_batch(["HARD_FAIL please"])
    assert time.monotonic() - t0 < 2.0  # no backoff sleeps happened


def test_deadline_caps_retry_loop(flaky_server):
    """A deadline shorter than the backoff schedule stops retrying even
    with budget left (one slow endpoint can't wedge an actor)."""
    import time
    import urllib.error

    from datacapsule_ray.clients import OpenAICompatClient

    _FlakyHandler.seen = {}
    _FlakyHandler.fail_first = 99
    try:
        c = OpenAICompatClient(base_url=flaky_server, max_retries=50,
                               backoff_s=0.2, deadline_s=0.5)
        t0 = time.monotonic()
        with pytest.raises(urllib.error.HTTPError):
            c.complete_batch(["hello"])
        assert time.monotonic() - t0 < 5.0
        assert sum(_FlakyHandler.seen.values()) < 10
    finally:
        _FlakyHandler.fail_first = 2
