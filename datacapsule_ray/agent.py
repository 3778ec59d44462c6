"""ReAct agent loop (A7) — the reference's tool-calling inference layer
as a distributed batch stage with pluggable planner backends.

The reference wires six graph/vector/SQL tools into a dspy.ReAct module
with MAX_ITERS from env (dspy_inference.py:13, :190-211) and serves one
question at a time. Here the same tool surface runs over the engine's
materialized tables, and the agent loop itself becomes a Ray Data
operator: a corpus of questions is answered by an actor pool where each
actor holds the graph index + planner once (__init__) and answers a
batch of questions per call — batch inference over questions is the
data-pipeline form of the reference's serving loop.

Layers:
- ``AgentTools``: the reference's tool contract (names, arguments,
  return conventions — find_nodes_by_node_type returns ``(0, [])`` when
  empty, dspy_inference.py:57-62; vector-search errors degrade to ``[]``,
  :105-123) over a ``GraphIndex`` + optional vector search + optional
  NL→SQL engine.
- ``ReActAgent``: the thought→action→observation loop. Each step the
  planner returns either ``{"thought", "tool", "args"}`` or
  ``{"thought", "answer"}``; tool errors become observations (the loop
  continues); ``max_iters`` caps the trajectory; reasoning is the joined
  thoughts (the shape dspy.ReAct extracts from its trajectory).
- ``RulesPlanner``: deterministic planner for the reference's canonical
  question shapes (count/list of a node type under a start node, with
  the documented vector-search fallback when exact lookup misses —
  dspy_inference.py:48). The hermetic stand-in, same role as
  RuleSQLGenerator / RuleSplitterBackend.
- ``HTTPPlanner``: LLM planner over an OpenAI-compatible endpoint — one
  completion per step whose prompt carries the task tag, the tool
  catalog, and the trajectory JSON; the completion text must be a JSON
  action. Transport/parse failure ends the episode with an error answer
  (the serving layer's 500 envelope, app.py:248-249).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

TASK_REACT = "REACT_STEP"

TOOL_NAMES = (
    "find_nodes_by_node_type",
    "batch_find_nodes_by_node_type",
    "get_unique_vector_query_results",
    "get_node_attribute",
    "get_adjacent_node_descriptions",
    "nodes_count",
)


class AgentTools:
    """The six reference tools over engine state. ``index`` is a
    traverse.GraphIndex; ``vector_search`` is an optional callable
    ``(query, node_type, top_k) -> list[str]``; ``nl_query`` an optional
    star_query.NLQueryEngine."""

    def __init__(self, index, vector_search=None, nl_query=None) -> None:
        self.index = index
        self.vector_search = vector_search
        self.nl_query = nl_query

    def find_nodes_by_node_type(self, start_node: str,
                                target_node_type: str) -> tuple[int, list[str]]:
        nodes = self.index.find_nodes_by_node_type(start_node, target_node_type)
        if not nodes:
            return 0, []
        out = sorted(nodes)
        return len(out), out

    def batch_find_nodes_by_node_type(self, start_nodes: list[str],
                                      target_node_type: str) -> dict:
        # intended per-node semantics (the reference's loop passes the
        # whole list by mistake, dspy_inference.py:76 — documented
        # divergence, same stance as GraphIndex.batch_find...)
        out = {}
        for node in start_nodes:
            count, nodes = self.find_nodes_by_node_type(node, target_node_type)
            out[node] = {"count": count, "nodes": nodes}
        return out

    def get_unique_vector_query_results(self, query: str, node_type=None,
                                        search_type: str = "all",
                                        top_k: int = 1,
                                        better_than_threshold: float = 0.65):
        if self.vector_search is None:
            return []
        try:
            return self.vector_search(query, node_type, top_k)
        except Exception:  # noqa: BLE001 — reference returns [] on error
            return []

    def get_node_attribute(self, node_id: str) -> dict:
        return self.index.get_node_attribute(node_id)

    def get_adjacent_node_descriptions(self, nodenames: list[str]) -> list[str]:
        return self.index.get_adjacent_node_descriptions(nodenames)

    def nodes_count(self, nodes: list) -> int:
        return len(nodes) if nodes else 0


class DistributedAgentTools(AgentTools):
    """The same six-tool contract over a graph too large for one node:
    traversal runs dataset-resident (traverse.find_nodes_by_type_
    distributed — broadcast-frontier semi-joins, result never on the
    driver), and tool observations carry the exact COUNT plus a capped,
    deterministic sample of node ids (trajectories must stay bounded;
    the full result set remains available as a Dataset via
    ``last_result``)."""

    def __init__(self, typed_adj, nodes, *, hierarchy=None, leaf_level=7,
                 vector_search=None, nl_query=None,
                 sample_cap: int = 100) -> None:
        super().__init__(index=None, vector_search=vector_search,
                         nl_query=nl_query)
        self.typed_adj = typed_adj
        self.nodes = nodes
        self.hierarchy = hierarchy
        self.leaf_level = leaf_level
        self.sample_cap = sample_cap
        self.last_result = None

    def find_nodes_by_node_type(self, start_node: str,
                                target_node_type: str) -> tuple[int, list[str]]:
        from .traverse import find_nodes_by_type_distributed

        ds = find_nodes_by_type_distributed(
            self.typed_adj, self.nodes, [start_node], target_node_type,
            hierarchy=self.hierarchy, leaf_level=self.leaf_level).materialize()
        self.last_result = ds
        n = ds.count()
        if n == 0:
            return 0, []
        # deterministic bounded sample: distributed sort + limit — the
        # driver sees at most sample_cap rows, never the result set
        df = ds.sort("node_id").limit(self.sample_cap).to_pandas()
        return n, list(df["node_id"]) if len(df) else []

    def get_node_attribute(self, node_id: str) -> dict:
        import pyarrow.compute as pc

        # vectorized equality, NOT string-interpolated filter exprs —
        # extracted entity names may contain quotes/metacharacters
        want = pa.scalar(node_id, pa.string())
        hit = self.nodes.map_batches(
            lambda t: (t.filter(pc.equal(
                t.column("node_id").cast(pa.string()), want))
                if "node_id" in t.column_names else t.slice(0, 0)),
            batch_format="pyarrow").take(1)
        if not hit:
            raise KeyError(node_id)
        # GraphIndex contract (traverse.py:50-52): node_id popped, None
        # values dropped — the two tiers must produce identical
        # observations for the same question
        return {k: v for k, v in hit[0].items()
                if k != "node_id" and v is not None}

    def get_adjacent_node_descriptions(self, nodenames: list[str]) -> list[str]:
        import pyarrow.compute as pc

        names = pa.array(sorted(set(nodenames)), pa.string())

        def pick(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.table({"other": pa.array([], pa.string())})
            return pa.table({"other": t.filter(
                pc.is_in(t.column("node"), value_set=names)).column("other")})

        # bounded driver residency: per-batch unique, then a
        # distributed sort + limit — the observation is capped like the
        # node samples (the reference returns everything; a planet-scale
        # hub would otherwise land its whole neighborhood on the driver)
        neigh = self.typed_adj.map_batches(
            pick, batch_format="pyarrow").map_batches(
            lambda t: (pa.table({"other": pc.unique(t.column("other"))})
                       if "other" in t.column_names
                       else pa.table({"other": pa.array([], pa.string())})),
            batch_format="pyarrow")
        ndf = neigh.sort("other").limit(self.sample_cap * 10).to_pandas()
        if not len(ndf):
            return []
        nb = pa.array(sorted(set(ndf["other"])), pa.string())

        def descs(t: pa.Table) -> pa.Table:
            if ("description" not in t.column_names
                    or "node_id" not in t.column_names):
                return pa.table({"description": pa.array([], pa.string())})
            m = t.filter(pc.is_in(t.column("node_id"), value_set=nb))
            d = m.column("description")
            return pa.table({"description": d.filter(pc.is_valid(d))})

        ddf = self.nodes.map_batches(descs, batch_format="pyarrow").to_pandas()
        return sorted(set(ddf["description"])) if len(ddf) else []


class ReActAgent:
    """thought→action→observation loop with a step budget."""

    def __init__(self, tools: AgentTools, planner, max_iters: int = 10) -> None:
        self.tools = tools
        self.planner = planner
        self.max_iters = max_iters

    def __call__(self, question: str) -> dict:
        trajectory: list[dict] = []
        thoughts: list[str] = []
        for _ in range(self.max_iters):
            try:
                action = self.planner.step(question, trajectory)
            except Exception as e:  # noqa: BLE001 — planner failure → error envelope
                return {"answer": "", "reasoning": f"planner error: {e}",
                        "n_steps": len(trajectory), "ok": False}
            thought = str(action.get("thought", ""))
            if thought:
                thoughts.append(thought)
            if "answer" in action:
                return {"answer": str(action["answer"]),
                        "reasoning": "\n".join(thoughts),
                        "n_steps": len(trajectory), "ok": True}
            tool = action.get("tool")
            if tool not in TOOL_NAMES:
                obs = f"error: unknown tool {tool!r}"
            else:
                try:
                    obs = getattr(self.tools, tool)(**action.get("args", {}))
                except Exception as e:  # noqa: BLE001 — tool error is an observation
                    obs = f"error: {e}"
            trajectory.append({"thought": thought, "tool": tool,
                               "args": action.get("args", {}),
                               "observation": obs})
        return {"answer": "", "reasoning": "\n".join(thoughts)
                + "\nmax_iters exhausted",
                "n_steps": len(trajectory), "ok": False}


# --- planners ----------------------------------------------------------------

_COUNT_PAT = re.compile(r"^(.+?)(?:下|中)(?:有|包含)多少(?:个|种)?(.+?)(?:节点)?\s*[？?]?$")
_LIST_PAT = re.compile(r"^(.+?)(?:下|中)有哪些(.+?)(?:节点)?\s*[？?]?$")


class RulesPlanner:
    """Deterministic planner: parse the question into (start, target),
    traverse, optionally canonicalize a missed start node via vector
    search (the strategy the reference documents on the tool itself,
    dspy_inference.py:48), then count or list."""

    def step(self, question: str, trajectory: list[dict]) -> dict:
        m = _COUNT_PAT.match(question.strip())
        want_count = bool(m)
        if not m:
            m = _LIST_PAT.match(question.strip())
        if not m:
            raise ValueError(f"no question template matches: {question!r}")
        start, target = m.group(1).strip(), m.group(2).strip()

        if not trajectory:
            return {"thought": f"精确检索：从“{start}”查找类型为“{target}”的节点",
                    "tool": "find_nodes_by_node_type",
                    "args": {"start_node": start,
                             "target_node_type": target}}

        last = trajectory[-1]
        obs = last["observation"]
        if last["tool"] == "find_nodes_by_node_type":
            if isinstance(obs, tuple) and obs[0] == 0 and len(trajectory) == 1:
                # miss → canonicalize the start node, then retry
                return {"thought": f"精确检索为空，向量检索“{start}”的准确节点名",
                        "tool": "get_unique_vector_query_results",
                        "args": {"query": start, "top_k": 1}}
            if isinstance(obs, tuple):
                count, nodes = obs
                if want_count:
                    # answer from the tool's exact count, NOT
                    # len(nodes): distributed tools cap the node sample
                    # while count stays exact
                    return {"thought": f"共 {count} 个", "answer": str(count)}
                return {"thought": "整合节点列表作为答案",
                        "answer": "、".join(nodes)}
            return {"thought": f"检索失败（{obs}），返回空答案", "answer": ""}
        if last["tool"] == "get_unique_vector_query_results":
            hits = obs if isinstance(obs, list) else []
            if not hits:
                return {"thought": "向量检索也未命中，答案为 0",
                        "answer": "0" if want_count else ""}
            return {"thought": f"以向量检索到的“{hits[0]}”重试精确检索",
                    "tool": "find_nodes_by_node_type",
                    "args": {"start_node": str(hits[0]),
                             "target_node_type": target}}
        raise ValueError(f"unexpected trajectory state: {last['tool']}")


class HTTPPlanner:
    """LLM planner: one /v1/completions call per step; prompt = task tag
    + tool catalog + question + trajectory JSON; completion must be a
    JSON action object."""

    def __init__(self, client=None, **cfg) -> None:
        from .clients import OpenAICompatClient

        self.client = client or OpenAICompatClient(**cfg)

    def step(self, question: str, trajectory: list[dict]) -> dict:
        traj = [{k: t[k] for k in ("thought", "tool", "args")}
                | {"observation": repr(t["observation"])} for t in trajectory]
        prompt = (f"{TASK_REACT}\ntools: {', '.join(TOOL_NAMES)}\n"
                  f"question: {question}\ntrajectory: "
                  f"{json.dumps(traj, ensure_ascii=False)}")
        action = json.loads(self.client.complete_batch([prompt])[0])
        if not isinstance(action, dict):
            raise ValueError("planner completion is not a JSON object")
        return action


# --- distributed batch inference ---------------------------------------------

class AnswerStage:
    """map_batches actor: GraphIndex + planner built once per actor from
    broadcast node/edge tables (ray.put refs — the A4 shape: the graph
    ships to each actor once, not per batch)."""

    def __init__(self, nodes_ref, edges_ref, *, planner_factory=RulesPlanner,
                 planner_kwargs: dict | None = None,
                 hierarchy: dict | None = None, leaf_level: int = 7,
                 max_iters: int = 10, question_col: str = "question") -> None:
        import ray

        from .traverse import GraphIndex

        index = GraphIndex(ray.get(nodes_ref), ray.get(edges_ref),
                           hierarchy=hierarchy, leaf_level=leaf_level)
        planner = planner_factory(**(planner_kwargs or {}))
        self.agent = ReActAgent(AgentTools(index), planner,
                                max_iters=max_iters)
        self.question_col = question_col

    def __call__(self, t: pa.Table) -> pa.Table:
        questions = t.column(self.question_col).to_pylist()
        results = [self.agent(q) for q in questions]
        return (t.append_column("answer", pa.array(
                    [r["answer"] for r in results], type=pa.string()))
                 .append_column("reasoning", pa.array(
                    [r["reasoning"] for r in results], type=pa.string()))
                 .append_column("n_steps", pa.array(
                    [r["n_steps"] for r in results], type=pa.int64())))


def answer_questions(questions, nodes: pa.Table, edges: pa.Table, *,
                     concurrency=(1, 4), batch_size: int = 64,
                     **stage_kwargs):
    """Distributed agent inference: one broadcast of the graph tables,
    an actor pool answering question batches. ``questions`` is a Dataset
    with a ``question`` column; returns it with answer/reasoning/n_steps
    appended."""
    import ray

    nodes_ref = ray.put(nodes)
    edges_ref = ray.put(edges)
    return questions.map_batches(
        AnswerStage,
        fn_constructor_kwargs={"nodes_ref": nodes_ref,
                               "edges_ref": edges_ref, **stage_kwargs},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)
