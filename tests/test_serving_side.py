"""Serving-side components (A7 agent, A8 judge, S6/S7 stores): unit +
mock-HTTP integration tests. The distributed/oracle halves are covered
by test_queries_oracle.py (judge_scores / agent_nation_customers /
interactions_page)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from datacapsule_ray.agent import (AgentTools, HTTPPlanner, ReActAgent,
                                   RulesPlanner, answer_questions)
from datacapsule_ray.evaluation import (HTTPJudge, RubricJudge, char_jaccard,
                                        evaluate, mean_score, rubric_score,
                                        score_to_bp)
from datacapsule_ray.state.interactions import (InteractionStore,
                                                SavedDataStore)
from datacapsule_ray.traverse import GraphIndex

# --- shared mock endpoint -----------------------------------------------------

JUDGE_POISON = "JUDGE_POISON"


class _Handler(BaseHTTPRequestHandler):
    """Judge prompts answered with the deterministic rubric × 100 (so the
    HTTP path must reproduce RubricJudge); ReAct prompts answered with a
    minimal two-step policy (tool call, then answer parsed from the
    observation)."""

    def log_message(self, *a):
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
        choices = []
        for i, prompt in enumerate(payload["prompt"]):
            task, _, rest = prompt.partition("\n")
            if task == "JUDGE_REASONING":
                if JUDGE_POISON in rest:
                    out = "the model refuses to emit a number"
                else:
                    fields = dict(line.split(": ", 1)
                                  for line in rest.splitlines())
                    # answers are JSON-encoded in the prompt (null ≠ "None")
                    s = rubric_score(fields["standard_reasoning"],
                                     fields["predicted_reasoning"],
                                     json.loads(fields["standard_answer"]),
                                     json.loads(fields["predicted_answer"]))
                    out = f"{s * 100:.6f}"
            elif task == "REACT_STEP":
                lines = dict(line.split(": ", 1)
                             for line in rest.splitlines())
                traj = json.loads(lines["trajectory"])
                if not traj:
                    q = lines["question"]
                    start = q.split("下有", 1)[0]
                    out = json.dumps({
                        "thought": "look up the nodes",
                        "tool": "find_nodes_by_node_type",
                        "args": {"start_node": start,
                                 "target_node_type": "customer"}})
                else:
                    obs = traj[-1]["observation"]  # repr of (count, [...])
                    count = obs.strip("()").split(",", 1)[0]
                    out = json.dumps({"thought": "done", "answer": count})
            else:
                out = "{}"
            choices.append({"index": i, "text": out})
        self._reply({"choices": choices})


@pytest.fixture(scope="module")
def mock_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


# --- A8 judge ----------------------------------------------------------------

def test_char_jaccard_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    cases = [("abc", "abd"), ("hello world", "dlrow olleh"), ("ab", "xy"),
             ("你好世界", "世界你好"), ("aAbB", "abc"), ("x", "x")]
    for a, b in cases:
        expect = con.sql("SELECT jaccard(?, ?)", params=[a, b]).fetchone()[0]
        assert char_jaccard(a, b) == expect, (a, b)


def test_rubric_missing_reasoning_degrades_to_exact_match():
    # dspy_evaluation.py:82-83: no reasoning → answer_exact_match → 1/0
    assert rubric_score(None, "r", "a", "a") == 1.0
    assert rubric_score("r", None, "a", "b") == 0.0
    assert rubric_score(None, None, None, None) == 0.0


def test_rubric_weights():
    # identical reasoning + wrong answer = 0.7; disjoint reasoning +
    # right answer = 0.3
    assert rubric_score("abc", "abc", "x", "y") == pytest.approx(0.7)
    assert rubric_score("abc", "xyz", "a", "a") == pytest.approx(0.3)
    assert score_to_bp(0.69999999) == 7000


def test_evaluate_dataset_and_mean():
    ds = rd.from_items([
        {"question": "q1", "standard_reasoning": "abc",
         "predicted_reasoning": "abc", "standard_answer": "a",
         "predicted_answer": "a"},
        {"question": "q2", "standard_reasoning": "abc",
         "predicted_reasoning": "xyz", "standard_answer": "a",
         "predicted_answer": "b"},
    ])
    scored = evaluate(ds, RubricJudge)
    df = scored.to_pandas().sort_values("question")
    assert df["score_bp"].tolist() == [10000, 0]
    assert mean_score(scored) == pytest.approx(0.5)


def test_http_judge_matches_rubric_and_degrades(mock_server):
    judge = HTTPJudge(base_url=mock_server)
    qs = ["q"] * 3
    std = ["abcdefg", "hello world", "same"]
    pred = ["abdxyz", "dlrow", "same"]
    got = judge.score_batch(qs, std, pred, [None] * 3, [None] * 3)
    want = RubricJudge().score_batch(qs, std, pred, [None] * 3, [None] * 3)
    assert [score_to_bp(g) for g in got] == [score_to_bp(w) for w in want]

    # the 30-point answer component must reach the judge: identical
    # reasoning, one right and one wrong answer → 10000 vs 7000 bp
    got = judge.score_batch(["q", "q"], ["abc", "abc"], ["abc", "abc"],
                            ["x", "x"], ["x", "y"])
    assert [score_to_bp(g) for g in got] == [10000, 7000]

    # non-numeric completion → 0.5 (dspy_evaluation.py:107-110 parity)
    got = judge.score_batch(["q"], [JUDGE_POISON], ["x"], [None], [None])
    assert got == [0.5]

    # transport failure → 0.5 for the whole batch (:111-114 parity)
    dead = HTTPJudge(base_url="http://127.0.0.1:9", timeout=0.2)
    assert dead.score_batch(["q"], ["a"], ["b"], [None], [None]) == [0.5]


# --- A7 agent ----------------------------------------------------------------

REL_HIER = {"region": 1, "nation": 2, "customer": 3}


def _rel_graph():
    nodes = pa.table({
        "node_id": ["ASIA", "CHINA", "JAPAN", "c1", "c2", "c3"],
        "node_type": ["region", "nation", "nation",
                      "customer", "customer", "customer"]})
    edges = pa.table({
        "src": ["ASIA", "ASIA", "CHINA", "CHINA", "JAPAN"],
        "rel": ["contains"] * 5,
        "dst": ["CHINA", "JAPAN", "c1", "c2", "c3"]})
    return nodes, edges


def _agent(planner=None, vector_search=None):
    nodes, edges = _rel_graph()
    idx = GraphIndex(nodes, edges, hierarchy=REL_HIER, leaf_level=3)
    return ReActAgent(AgentTools(idx, vector_search=vector_search),
                      planner or RulesPlanner())


def test_rules_agent_count_and_list():
    agent = _agent()
    out = agent("CHINA下有多少个customer？")
    assert out["ok"] and out["answer"] == "2"
    out = agent("JAPAN下有哪些customer？")
    assert out["ok"] and out["answer"] == "c3"
    out = agent("ASIA下有哪些nation？")
    assert out["ok"] and out["answer"] == "CHINA、JAPAN"


def test_rules_agent_vector_fallback():
    # a misspelled start node misses exact lookup; the planner must
    # canonicalize via vector search and retry (dspy_inference.py:48)
    agent = _agent(vector_search=lambda q, nt, k: ["CHINA"]
                   if q == "中国" else [])
    out = agent("中国下有多少个customer？")
    assert out["ok"] and out["answer"] == "2"
    assert "向量检索" in out["reasoning"]

    agent = _agent(vector_search=lambda q, nt, k: [])
    out = agent("火星下有多少个customer？")
    assert out["ok"] and out["answer"] == "0"


def test_agent_max_iters_exhaustion():
    class LoopPlanner:
        def step(self, question, trajectory):
            return {"thought": "again",
                    "tool": "nodes_count", "args": {"nodes": []}}

    nodes, edges = _rel_graph()
    idx = GraphIndex(nodes, edges, hierarchy=REL_HIER, leaf_level=3)
    agent = ReActAgent(AgentTools(idx), LoopPlanner(), max_iters=4)
    out = agent("whatever")
    assert not out["ok"] and out["n_steps"] == 4


def test_agent_tool_error_is_observation():
    agent = _agent()
    # get_node_attribute on a missing node raises inside the tool; the
    # loop must surface it as an observation, not crash
    class OnePlanner:
        def __init__(self):
            self.called = False

        def step(self, question, trajectory):
            if not self.called:
                self.called = True
                return {"tool": "get_node_attribute",
                        "args": {"node_id": "missing"}}
            assert "error" in str(trajectory[-1]["observation"])
            return {"answer": "done"}

    nodes, edges = _rel_graph()
    idx = GraphIndex(nodes, edges, hierarchy=REL_HIER, leaf_level=3)
    out = ReActAgent(AgentTools(idx), OnePlanner())("q")
    assert out["ok"] and out["answer"] == "done"


def test_http_planner_answers_over_mock(mock_server):
    nodes, edges = _rel_graph()
    idx = GraphIndex(nodes, edges, hierarchy=REL_HIER, leaf_level=3)
    agent = ReActAgent(AgentTools(idx),
                       HTTPPlanner(base_url=mock_server))
    out = agent("CHINA下有多少个customer？")
    assert out["ok"] and out["answer"] == "2"
    assert out["n_steps"] == 1


def test_answer_questions_distributed():
    nodes, edges = _rel_graph()
    qs = rd.from_items([{"question": "CHINA下有多少个customer？"},
                        {"question": "JAPAN下有多少个customer？"}])
    out = answer_questions(qs, nodes, edges, hierarchy=REL_HIER,
                           leaf_level=3, concurrency=(1, 2)).to_pandas()
    got = dict(zip(out["question"], out["answer"]))
    assert got["CHINA下有多少个customer？"] == "2"
    assert got["JAPAN下有多少个customer？"] == "1"


def test_distributed_agent_tools():
    """The agent over a dataset-resident graph: exact counts with a
    capped node sample, same planner, no GraphIndex broadcast."""
    from datacapsule_ray.agent import DistributedAgentTools
    from datacapsule_ray.traverse import build_typed_adjacency

    nodes_t, edges_t = _rel_graph()
    nodes_ds = rd.from_arrow(nodes_t)
    adj = build_typed_adjacency(nodes_ds, rd.from_arrow(edges_t),
                                hierarchy=REL_HIER).materialize()
    tools = DistributedAgentTools(adj, nodes_ds, hierarchy=REL_HIER,
                                  leaf_level=3, sample_cap=1)
    n, sample = tools.find_nodes_by_node_type("CHINA", "customer")
    assert n == 2 and sample == ["c1"]  # exact count, capped sample

    agent = ReActAgent(tools, RulesPlanner())
    out = agent("CHINA下有多少个customer？")
    assert out["ok"] and out["answer"] == "2"
    out = agent("ASIA下有多少个customer？")
    assert out["ok"] and out["answer"] == "3"

    assert tools.get_node_attribute("c1")["node_type"] == "customer"


# --- S6/S7 stores ------------------------------------------------------------

def _rec(i, version="v1", model="m1", ts="2024-01-01T00:00:00"):
    return {"id": str(i), "timestamp": pd.Timestamp(ts) + pd.Timedelta(seconds=i),
            "question": f"q{i}", "model": model, "version": version,
            "messages": [{"role": "user"}], "tokens": {"in": i},
            "processingTime": i}


def test_interaction_store_lifecycle(tmp_path):
    store = InteractionStore(str(tmp_path / "s"))
    store.append([_rec(i) for i in range(10)])
    store.append([_rec(3, model="m2"), _rec(11)])   # upsert + insert
    store.delete(["5", "6"])

    live = store.scan().to_pandas()
    assert sorted(live["id"].astype(int)) == [0, 1, 2, 3, 4, 7, 8, 9, 11]
    assert live.set_index("id").loc["3", "model"] == "m2"
    # JSON columns are encoded like the reference's (app.py:297-300)
    assert json.loads(live.set_index("id").loc["3", "messages"]) == [
        {"role": "user"}]

    got = store.get("3")
    assert got["model"] == "m2" and got["question"] == "q3"
    assert store.get("5") is None          # tombstoned
    assert store.get("404") is None        # never existed

    # delete → re-insert revives (last write wins)
    store.append([_rec(5, model="m3")])
    assert store.get("5")["model"] == "m3"


def test_interaction_store_by_version_page(tmp_path):
    store = InteractionStore(str(tmp_path / "s"))
    store.append([_rec(i, version="v1" if i % 2 else "v2")
                  for i in range(30)])
    page = store.by_version("v1", offset=2, limit=5)
    # v1 ids: odd 1..29, timestamp ascending with i → DESC order is
    # 29,27,...; offset 2 → 25,23,21,19,17
    assert page["id"].tolist() == ["25", "23", "21", "19", "17"]
    assert (page["version"] == "v1").all()


def test_interaction_store_compact(tmp_path):
    store = InteractionStore(str(tmp_path / "s"))
    store.append([_rec(i) for i in range(8)])
    store.delete(["2"])
    store.append([_rec(1, model="mX")])
    before = store.scan().to_pandas().sort_values("id").reset_index(drop=True)
    assert len(store._segments()) == 3
    store.compact()
    assert len(store._segments()) == 1
    after = store.scan().to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        before[sorted(before.columns)], after[sorted(after.columns)])
    assert store.get("1")["model"] == "mX"
    assert store.get("2") is None


def test_resolve_matches_pandas_reference(tmp_path):
    """Randomized multi-segment log vs a pandas last-write-wins oracle —
    pins the sort + run-boundary resolution across block boundaries."""
    import numpy as np

    rng = np.random.default_rng(7)
    store = InteractionStore(str(tmp_path / "s"))
    frames = []
    for gen in range(6):
        ids = rng.integers(0, 40, size=25)
        if gen % 3 == 2:
            store.delete([str(i) for i in ids])
            frames.append(pd.DataFrame({"id": [str(i) for i in ids],
                                        "op": "delete", "gen": gen,
                                        "model": None}))
        else:
            store.append([_rec(int(i), model=f"g{gen}") for i in ids])
            frames.append(pd.DataFrame({"id": [str(i) for i in ids],
                                        "op": "upsert", "gen": gen,
                                        "model": f"g{gen}"}))
    log = pd.concat(frames)
    # within one append call, later duplicates of an id overwrite
    # earlier ones only across segments; inside a segment the LAST
    # occurrence wins in pandas tail(1) — mirror the store by keeping
    # segment order then row order
    win = log.groupby("id").tail(1)
    expect = win[win["op"] == "upsert"].sort_values("id")

    live = store.scan().to_pandas().sort_values("id")
    assert live["id"].tolist() == expect["id"].tolist()
    assert live["model"].tolist() == expect["model"].tolist()


def test_training_set_export(tmp_path):
    store = InteractionStore(str(tmp_path / "s"))
    recs = [_rec(i) for i in range(6)]
    for r in recs:
        r["reasoning"] = f"think-{r['id']}"
        r["modelResponse"] = f"ans-{r['id']}"
    recs[4]["reasoning"] = None  # incomplete → skipped (app.py:703-713)
    recs[1]["modelResponse"] = ""  # empty string is falsy too → skipped
    store.append(recs)
    ts = store.training_set(["1", "3", "4", "999"]).to_pandas()
    assert sorted(ts["id"]) == ["3"]
    row = ts.set_index("id").loc["3"]
    assert row["standard_reasoning"] == "think-3"
    assert row["standard_answer"] == "ans-3"


def test_saved_data_same_counter_does_not_clobber(tmp_path):
    """Two writers that observed the same part count must both survive
    (unique suffix; the reference's single rewritten JSON array cannot
    make this guarantee)."""
    from datacapsule_ray.state.interactions import SavedDataStore

    import json as _json
    import os

    store = SavedDataStore(str(tmp_path / "sd"))
    p1 = store.save({"w": "a"})
    # emulate the racing writer: same counter prefix, different suffix
    # (exactly what a stale-count save produces post-fix)
    racer = os.path.join(os.path.dirname(p1), "part-000000-ffffffff.json")
    with open(racer, "w", encoding="utf-8") as f:
        _json.dump({"w": "b"}, f)
    got = sorted(r["w"] for r in store.load())
    assert got == ["a", "b"]  # both counter-0 parts coexist


def test_bootstrap_demos_selects_correct_examples():
    """The optimizer data loop end-to-end: agent predictions judged
    against logged standards; only examples the agent reproduces clear
    the threshold (BootstrapFewShot's metric-gated demo selection)."""
    from datacapsule_ray.evaluation import bootstrap_demos

    nodes, edges = _rel_graph()
    agent = _agent()
    good_reasoning = agent("CHINA下有多少个customer？")["reasoning"]

    examples = rd.from_items([
        {"question": "CHINA下有多少个customer？",
         "standard_reasoning": good_reasoning, "standard_answer": "2"},
        {"question": "JAPAN下有多少个customer？",
         "standard_reasoning": "完全不同的推理路径零重叠",
         "standard_answer": "999"},  # wrong answer, alien reasoning
    ])

    def run_pred(ds):
        out = answer_questions(ds, nodes, edges, hierarchy=REL_HIER,
                               leaf_level=3, concurrency=(1, 2))
        return out.map_batches(
            lambda t: (t.append_column("predicted_reasoning",
                                       t.column("reasoning"))
                        .append_column("predicted_answer",
                                       t.column("answer"))),
            batch_format="pyarrow")

    demos = bootstrap_demos(examples, run_pred, k=15,
                            threshold=0.9).to_pandas()
    assert demos["question"].tolist() == ["CHINA下有多少个customer？"]
    assert demos["score_bp"].tolist() == [10000]


def test_version_store(tmp_path):
    from datacapsule_ray.state.interactions import VersionStore

    vs = VersionStore(str(tmp_path / "v"))
    vs.register("1.0.0", "/models/a.json", "base")
    vs.register("1.1.0", "/models/b.json", "optimized")
    vs.register("1.0.0", "/models/a2.json", "re-registered")
    assert vs.get("1.0.0")["file_path"] == "/models/a2.json"
    assert vs.get("nope") is None
    assert [v["version"] for v in vs.list_versions()] == ["1.0.0", "1.1.0"]


def test_saved_data_store_roundtrip(tmp_path):
    store = SavedDataStore(str(tmp_path / "sd"))
    store.save({"question": "q1", "answer": "a1", "score": 1})
    store.save({"question": "q2", "answer": "a2", "score": 2})
    got = store.load()
    assert [g["question"] for g in got] == ["q1", "q2"]
    ds = store.load_dataset().to_pandas().sort_values("score")
    assert ds["answer"].tolist() == ["a1", "a2"]


def test_mean_score_empty_dataset_is_nan():
    import math

    scored = rd.from_arrow(pa.table({"score_bp": pa.array([], pa.int64())}))
    assert math.isnan(mean_score(scored))


def test_by_version_with_quote_is_safe(tmp_path):
    """version mirrors an HTTP query param — a quote must neither crash
    an expression parser nor change which rows are selected."""
    store = InteractionStore(str(tmp_path / "s"))
    store.append([_rec(1, version="o'clock"), _rec(2, version="v1")])
    page = store.by_version("o'clock", offset=0, limit=10)
    assert page["id"].tolist() == ["1"]
    assert store.by_version("x' OR version != '", limit=10).empty


def test_segment_seq_past_six_digits(tmp_path):
    """f'{seq:06d}' widens past 999,999 — segments with 7+ digits must
    stay visible (no silent data loss) and later commits must not
    collide with them."""
    import os

    root = str(tmp_path / "s")
    store = InteractionStore(root)
    store.append([_rec(1)])
    os.rename(os.path.join(root, "seg-000000-upsert"),
              os.path.join(root, "seg-1000000-upsert"))
    assert store.get("1") is not None              # still visible
    assert store._next_seq() == 1000001            # no rename collision
    store.append([_rec(1, model="m9"), _rec(2)])   # lands after it
    live = store.scan().to_pandas().sort_values("id")
    assert live["id"].tolist() == ["1", "2"]
    assert store.get("1")["model"] == "m9"         # later generation wins


def test_compact_lock_parks_concurrent_writer(tmp_path):
    """The compaction lock closes the seq-claim lost-update race: a
    writer that arrives while compact holds the lock parks, then
    commits ABOVE the compacted segment's seq — its data can never be
    shadowed by the fold."""
    import os
    import threading
    import time

    from datacapsule_ray.state.interactions import InteractionStore

    store = InteractionStore(str(tmp_path / "s"))
    store.append([{"id": "a", "question": "q1"}])
    os.mkdir(store._lock_path())  # simulate an in-flight compactor
    done = []
    t = threading.Thread(target=lambda: done.append(
        store.append([{"id": "b", "question": "q2"}])))
    t.start()
    time.sleep(0.4)
    assert not done  # writer is parked on the lock
    os.rmdir(store._lock_path())
    t.join(20)
    assert done
    assert store.get("b")["question"] == "q2"
    assert store.get("a")["question"] == "q1"


def test_compact_concurrent_appends_not_lost(tmp_path):
    """Appends racing a compaction land either inside the fold or in a
    segment sequenced above it — never shadowed (the ADVICE r2 race)."""
    import threading

    from datacapsule_ray.state.interactions import InteractionStore

    store = InteractionStore(str(tmp_path / "s"))
    for i in range(4):
        store.append([{"id": f"seed-{i}", "question": "base"}])

    errs = []

    def writer(lo, hi):
        try:
            for i in range(lo, hi):
                store.append([{"id": f"w-{i}", "question": f"v{i}"}])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def compactor():
        try:
            store.compact(grace_s=0.5)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(0, 8)),
               threading.Thread(target=writer, args=(8, 16)),
               threading.Thread(target=compactor)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errs, errs
    live = store.scan().to_pandas()
    ids = set(live["id"])
    assert {f"seed-{i}" for i in range(4)} <= ids
    assert {f"w-{i}" for i in range(16)} <= ids  # nothing lost


def test_second_concurrent_compact_raises(tmp_path):
    import os

    import pytest as _pytest

    from datacapsule_ray.state.interactions import InteractionStore

    store = InteractionStore(str(tmp_path / "s"))
    store.append([{"id": "a", "question": "q"}])
    os.mkdir(store._lock_path())
    try:
        with _pytest.raises(RuntimeError, match="compaction"):
            store.compact()
    finally:
        os.rmdir(store._lock_path())
