"""LLM-judge evaluation (A8) — the reference's reasoning-quality metric
as a distributed Ray Data stage with pluggable judge backends.

The reference scores a predicted reasoning trace against a standard one
with a ChainOfThought judge over a 100-point rubric
(dspy_evaluation.py:22-114): retrieval-condition accuracy 20, demand
identification 10, strategy 40 (together 70 "process" points), result
correctness/completeness 30 ("answer" points); the score is normalized
to 0-1, a missing reasoning trace degrades to exact answer match → 1/0
(dspy_evaluation.py:82-83), and any judge failure returns 0.5
(dspy_evaluation.py:107-114).

Backends:
- ``RubricJudge``: the deterministic hermetic stand-in. Process points
  are a character-set Jaccard similarity between the two reasoning
  traces (exactly DuckDB's ``jaccard()``, so the driver can
  oracle-check the full distributed stage), answer points are exact
  match — combined with the reference's 0.7/0.3 process/answer split.
  Scores are emitted as integer basis points (``floor(x*1e4 + 0.5)``)
  so the driver's value-hash compare is float-rounding-proof.
- ``HTTPJudge``: the production path — one batched /v1/completions
  round trip per map_batches batch through clients.OpenAICompatClient;
  each completion must be a number 0-100 (the reference's
  evaluation_score output field). Parse/transport failures score 0.5,
  per the reference.

``JudgeStage`` is the map_batches actor: judge built once per actor in
``__init__`` (A1/A2 shape), one batch of (question, standard, predicted,
answers) scored per ``__call__``. Per-row Python set ops are inherent to
the modeled-LLM stage (same stance as stages/extract.GraphEmitter).
"""

from __future__ import annotations

import math

import pyarrow as pa

from ray.data import Dataset

PROCESS_WEIGHT = 0.7  # rubric: 20+10+40 process points of 100
ANSWER_WEIGHT = 0.3   # rubric: 30 result points of 100
TASK_JUDGE = "JUDGE_REASONING"


def char_jaccard(a: str, b: str) -> float:
    """Character-set Jaccard similarity — bit-identical to DuckDB's
    ``jaccard(a, b)`` (verified: set semantics, case-sensitive, Unicode
    code points; DuckDB raises on empty input, here empty∩empty = 1.0)."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def rubric_score(standard_reasoning: str | None, predicted_reasoning: str | None,
                 standard_answer: str | None, predicted_answer: str | None) -> float:
    """Deterministic rubric: 0.7·jaccard(reasonings) + 0.3·[answers ==].

    Missing reasoning on either side → exact answer match → 1.0/0.0
    (dspy_evaluation.py:82-83 parity)."""
    if standard_reasoning is None or predicted_reasoning is None:
        return 1.0 if (standard_answer is not None
                       and standard_answer == predicted_answer) else 0.0
    answer = 1.0 if (standard_answer is not None
                     and standard_answer == predicted_answer) else 0.0
    return (PROCESS_WEIGHT * char_jaccard(standard_reasoning, predicted_reasoning)
            + ANSWER_WEIGHT * answer)


def score_to_bp(score: float) -> int:
    """Integer basis points with half-up rounding — reproducible in SQL
    as ``CAST(FLOOR(score*10000 + 0.5) AS BIGINT)`` over the identical
    double."""
    return int(math.floor(score * 10000.0 + 0.5))


class RubricJudge:
    """Deterministic judge (hermetic stand-in for the LLM judge)."""

    def score_batch(self, questions: list, standards: list, predictions: list,
                    std_answers: list, pred_answers: list) -> list[float]:
        return [rubric_score(s, p, sa, pa_)
                for s, p, sa, pa_ in zip(standards, predictions,
                                         std_answers, pred_answers)]


class HTTPJudge:
    """LLM judge over an OpenAI-compatible endpoint: ONE batched
    completions call per map_batches batch (vs the reference's one
    ChainOfThought call per example). Completion text must parse as a
    0-100 number; any failure degrades that row to 0.5."""

    def __init__(self, client=None, **cfg) -> None:
        from .clients import OpenAICompatClient

        self.client = client or OpenAICompatClient(**cfg)

    def score_batch(self, questions: list, standards: list, predictions: list,
                    std_answers: list, pred_answers: list) -> list[float]:
        import json

        # answers ride in the prompt JSON-encoded (null ≠ the string
        # "None") — without them the LLM could never judge the 30-point
        # result component and two rows with identical reasoning but
        # opposite answer correctness would score the same
        prompts = [
            f"{TASK_JUDGE}\nquestion: {q}\nstandard_reasoning: {s}\n"
            f"predicted_reasoning: {p}\n"
            f"standard_answer: {json.dumps(sa, ensure_ascii=False)}\n"
            f"predicted_answer: {json.dumps(pa_, ensure_ascii=False)}"
            for q, s, p, sa, pa_ in zip(questions, standards, predictions,
                                        std_answers, pred_answers)]
        try:
            texts = self.client.complete_batch(prompts)
        except Exception:  # noqa: BLE001 — transport error → default score
            return [0.5] * len(prompts)
        out = []
        for t in texts:
            try:
                out.append(max(0.0, min(1.0, float(t.strip()) / 100.0)))
            except (TypeError, ValueError):
                out.append(0.5)  # dspy_evaluation.py:107-110 parity
        return out


class JudgeStage:
    """map_batches actor: judge state once per actor, one scored batch
    per call. Input columns: question, standard_reasoning,
    predicted_reasoning, standard_answer, predicted_answer. Answer
    columns may be omitted, but then the answer component scores 0 and
    the rubric CAPS at 0.7·jaccard — size any downstream threshold
    (e.g. bootstrap_demos) accordingly."""

    def __init__(self, judge_factory=RubricJudge, **judge_kwargs) -> None:
        self.judge = judge_factory(**judge_kwargs)

    def __call__(self, t: pa.Table) -> pa.Table:
        def col(name):
            if name in t.column_names:
                return t.column(name).to_pylist()
            return [None] * t.num_rows

        scores = self.judge.score_batch(
            col("question"), col("standard_reasoning"),
            col("predicted_reasoning"), col("standard_answer"),
            col("predicted_answer"))
        return t.append_column(
            "score_bp", pa.array([score_to_bp(s) for s in scores],
                                 type=pa.int64()))


def evaluate(ds: Dataset, judge_factory=RubricJudge, *, concurrency=(1, 4),
             batch_size: int = 1024, **judge_kwargs) -> Dataset:
    """Score every (standard, predicted) row; appends ``score_bp``."""
    return ds.map_batches(
        JudgeStage, fn_constructor_kwargs={"judge_factory": judge_factory,
                                           **judge_kwargs},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def mean_score(scored: Dataset) -> float:
    """Dataset-level metric (the reference's Evaluate aggregate): mean
    score in [0, 1] — a streaming aggregate, no materialization. An
    empty dataset (everything filtered upstream) yields NaN, not a
    TypeError (Dataset.mean returns None on zero rows)."""
    agg = scored.mean("score_bp")
    return float("nan") if agg is None else float(agg) / 10000.0


def bootstrap_demos(examples: Dataset, run_predictions, *,
                    judge_factory=RubricJudge, k: int = 15,
                    threshold: float = 0.9, **judge_kwargs) -> Dataset:
    """The optimizer's demo-selection loop (BootstrapFewShot with the
    judge metric, app.py:580-594 + max_labeled_demos=15) as a data
    pipeline: run the predictor over every candidate example, judge each
    prediction against the example's own reasoning/answer, keep
    examples whose score clears ``threshold``, and take the top ``k``
    deterministically (score desc, question asc). Every stage is a
    Dataset op — predictions and judging both distribute; the driver
    sees only the ≤k selected demos.

    ``examples`` columns: question, standard_reasoning, standard_answer
    (the dspy.Example fields built at app.py:554 from question /
    reasoning / modelResponse). ``run_predictions(ds) -> ds`` must
    append predicted_reasoning + predicted_answer (e.g. the A7 agent's
    batch inference mapped onto those names)."""
    scored = evaluate(run_predictions(examples), judge_factory,
                      **judge_kwargs)
    bp = score_to_bp(threshold)
    kept = scored.filter(expr=f"score_bp >= {bp}")
    return kept.sort(["score_bp", "question"],
                     descending=[True, False]).limit(k)
