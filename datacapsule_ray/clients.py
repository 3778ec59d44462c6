"""Pluggable extractor / embedder clients — the A1/A2 integration path.

The reference's extractors are LLM modules configured from env and
called over HTTP (DSPy setup at tools/entity_extraction.py:50-66 and
tools/entity_extraction_db.py:54-81; OpenAI-compatible embedding client
at react_tools.py:72-78, used per-text at :225-232 despite a declared
MAX_BATCH_SIZE=100). This module makes that integration path concrete
for the Ray engine:

- ``OpenAICompatClient``: minimal stdlib-HTTP client for the two public
  OpenAI-style endpoints the pipeline needs — ``/v1/completions`` with a
  batched ``prompt`` list and ``/v1/embeddings`` with a batched
  ``input`` list. Requests are chunked to ``max_batch`` (the reference's
  MAX_BATCH_SIZE contract, actually honored here).
- ``RuleSplitterBackend`` / ``HTTPSplitterBackend``: the splitter
  contract ``GraphEmitter`` consumes — three ``split_*_batch`` methods
  returning one entry per input text where a failed item is an
  ``Exception`` value, so the emitter's per-field raw-text fallback
  (M11) degrades that document only; a transport error never fails the
  Ray task.
- ``RemoteEmbedder``: drop-in for ``stages.vectors.HashEmbedder`` whose
  ``_embed`` goes through the batched embeddings endpoint.

Config via explicit kwargs or env: ``DCRAY_LLM_BASE_URL``,
``DCRAY_LLM_API_KEY``, ``DCRAY_LLM_MODEL``, ``DCRAY_EMBED_MODEL``,
``DCRAY_MAX_BATCH_SIZE``. The wire protocol for the splitters is a
task-tagged prompt (``SPLIT_LOCATIONS\\n<text>`` etc.) whose completion
text must be JSON — a list of strings for locations, an object with the
part fields for habits/features (mirroring the output schemas of the
reference's ClassifyDistribution/ClassifyHabits/ClassifyFeatures
signatures, tools/entity_extraction.py:7-25).
"""

from __future__ import annotations

import json
import os
import urllib.request

import numpy as np

from .functions import splitters as sp
from .schema import EMBED_DIM
from .stages.vectors import HashEmbedder

TASK_LOCATIONS = "SPLIT_LOCATIONS"
TASK_HABITS = "SPLIT_HABITS"
TASK_FEATURES = "SPLIT_FEATURES"


_RETRYABLE_HTTP = {429, 500, 502, 503, 504}


class OpenAICompatClient:
    """Batched HTTP client for an OpenAI-compatible endpoint (stdlib
    only — no SDK dependency). One instance per actor (A1/A2 state).

    Production hardening (a real endpoint throttles and flakes):
    - bounded RETRIES with exponential backoff on 429/5xx and transport
      errors (``max_retries`` total re-attempts per request);
    - a per-request DEADLINE (``deadline_s``, default 4× the socket
      timeout): once it passes, no further retry is attempted and the
      last error propagates — so one throttled request can't stall a
      whole actor-pool batch indefinitely;
    - request CONCURRENCY is governed where it belongs in Ray Data: by
      the actor-pool size (``map_batches(..., concurrency=(a, b))``) —
      each actor holds one client and issues one request at a time, so
      the endpoint sees at most ``b`` in-flight requests per stage.

    Non-retryable HTTP errors (4xx other than 429) raise immediately;
    the splitter backends turn any raise into per-item M11 fallbacks,
    so hardening changes latency behavior, never data semantics."""

    def __init__(self, base_url: str | None = None, api_key: str | None = None,
                 model: str | None = None, embed_model: str | None = None,
                 timeout: float = 60.0, max_batch: int | None = None,
                 max_retries: int = 3, backoff_s: float = 0.5,
                 deadline_s: float | None = None) -> None:
        self.base_url = (base_url or os.environ.get("DCRAY_LLM_BASE_URL", "")).rstrip("/")
        if not self.base_url:
            raise ValueError("no endpoint: pass base_url or set DCRAY_LLM_BASE_URL")
        self.api_key = api_key or os.environ.get("DCRAY_LLM_API_KEY", "")
        self.model = model or os.environ.get("DCRAY_LLM_MODEL", "default")
        self.embed_model = (embed_model
                            or os.environ.get("DCRAY_EMBED_MODEL", "default-embed"))
        self.timeout = timeout
        self.max_batch = max_batch or int(os.environ.get("DCRAY_MAX_BATCH_SIZE", "100"))
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.deadline_s = deadline_s if deadline_s is not None else 4 * timeout

    def _post(self, path: str, payload: dict) -> dict:
        import time
        import urllib.error

        req_data = json.dumps(payload).encode("utf-8")
        headers = {"Content-Type": "application/json",
                   "Authorization": f"Bearer {self.api_key}"}
        deadline = time.monotonic() + self.deadline_s
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            req = urllib.request.Request(self.base_url + path,
                                         data=req_data, headers=headers)
            try:
                timeout = min(self.timeout, max(0.001,
                                                deadline - time.monotonic()))
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code not in _RETRYABLE_HTTP:
                    raise  # 4xx (bad request/auth): retrying can't help
                last_err = e
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last_err = e  # transport flake — retryable
            if attempt >= self.max_retries:
                break
            sleep = min(self.backoff_s * (2 ** attempt), 30.0)
            if time.monotonic() + sleep > deadline:
                break  # no budget for another attempt
            time.sleep(sleep)
        raise last_err  # type: ignore[misc]

    def complete_batch(self, prompts: list[str]) -> list[str]:
        """/v1/completions with a list prompt; returns one completion
        text per prompt, chunked to max_batch prompts per request."""
        out: list[str] = [""] * len(prompts)
        for s in range(0, len(prompts), self.max_batch):
            chunk = prompts[s:s + self.max_batch]
            data = self._post("/v1/completions",
                              {"model": self.model, "prompt": chunk})
            choices = data["choices"]
            if len(choices) != len(chunk):
                # a silently short (or long) response would leave
                # prompts as "" and degrade whole docs to the raw-text
                # fallback with no signal — fail loudly instead
                raise ValueError(
                    f"endpoint returned {len(choices)} choices for "
                    f"{len(chunk)} prompts")
            for pos, ch in enumerate(choices):
                # several compat servers omit per-choice `index` and
                # rely on positional order; defaulting every choice to
                # index 0 would collapse the whole chunk onto one slot
                out[s + int(ch.get("index", pos))] = ch.get("text", "")
        return out

    def embed(self, texts: list[str]) -> np.ndarray:
        """/v1/embeddings with a list input (the batched path the
        reference declares but never uses — react_tools.py:225-232)."""
        vecs: list = [None] * len(texts)
        for s in range(0, len(texts), self.max_batch):
            chunk = texts[s:s + self.max_batch]
            data = self._post("/v1/embeddings",
                              {"model": self.embed_model, "input": chunk})
            for item in data["data"]:
                vecs[s + int(item["index"])] = item["embedding"]
        return np.asarray(vecs, dtype=np.float32)


def _try(fn, text):
    if text is None:
        return None
    try:
        return fn(text)
    except Exception as e:  # noqa: BLE001 — failure becomes data (M11)
        return e


class RuleSplitterBackend:
    """Deterministic splitters behind the batched backend contract."""

    def split_locations_batch(self, texts: list) -> list:
        return [_try(sp.split_locations, t) for t in texts]

    def split_habits_batch(self, texts: list) -> list:
        return [_try(sp.split_habits, t) for t in texts]

    def split_features_batch(self, texts: list) -> list:
        return [_try(sp.split_features, t) for t in texts]


class HTTPSplitterBackend:
    """LLM splitters over an OpenAI-compatible endpoint, batched per
    map_batches batch (one HTTP round-trip per field per batch instead
    of the reference's 3 sequential calls per document)."""

    def __init__(self, client: OpenAICompatClient | None = None, **cfg) -> None:
        self.client = client or OpenAICompatClient(**cfg)

    def _batch(self, texts: list, task: str, parse) -> list:
        idx = [i for i, t in enumerate(texts) if t is not None]
        out: list = [None] * len(texts)
        if not idx:
            return out
        try:
            res = self.client.complete_batch([f"{task}\n{texts[i]}" for i in idx])
        except Exception as e:  # noqa: BLE001 — transport error → per-doc fallback
            for i in idx:
                out[i] = e
            return out
        for i, r in zip(idx, res):
            out[i] = _try(parse, r)
        return out

    @staticmethod
    def _parse_locations(text: str) -> list[str]:
        vals = json.loads(text)
        if not isinstance(vals, list):
            raise ValueError(f"expected JSON list, got {type(vals).__name__}")
        # strip like the rules backend (splitters.split_locations):
        # un-stripped LLM output would create distinct ' 南海 ' nodes,
        # miss the alias dict, and sneak '无信息 ' past the LOC_INVALID
        # guard
        return [s for s in (str(v).strip() for v in vals) if s]

    @staticmethod
    def _parse_habits(text: str) -> sp.HabitParts:
        obj = json.loads(text)
        return sp.HabitParts(feeding=str(obj["feeding"]),
                             reproduction=str(obj["reproduction"]),
                             behavior=str(obj["behavior"]))

    @staticmethod
    def _parse_features(text: str) -> sp.FeatureParts:
        obj = json.loads(text)
        return sp.FeatureParts(body_shape=str(obj["body_shape"]),
                               body_color=str(obj["body_color"]),
                               body_size=str(obj["body_size"]),
                               special_features=str(obj["special_features"]))

    def split_locations_batch(self, texts: list) -> list:
        return self._batch(texts, TASK_LOCATIONS, self._parse_locations)

    def split_habits_batch(self, texts: list) -> list:
        return self._batch(texts, TASK_HABITS, self._parse_habits)

    def split_features_batch(self, texts: list) -> list:
        return self._batch(texts, TASK_FEATURES, self._parse_features)


def make_splitter_backend(splitter: str = "rules",
                          client_config: dict | None = None):
    if splitter == "rules":
        return RuleSplitterBackend()
    if splitter == "http":
        return HTTPSplitterBackend(**(client_config or {}))
    raise ValueError(f"unknown splitter backend {splitter!r}")


class RemoteEmbedder(HashEmbedder):
    """Actor-pool embedding stage backed by the batched /v1/embeddings
    endpoint — same map_batches interface as HashEmbedder (client built
    once per actor in __init__, the A2 shape)."""

    def __init__(self, dim: int = EMBED_DIM,
                 client_config: dict | None = None) -> None:
        super().__init__(dim)
        self.client = OpenAICompatClient(**(client_config or {}))

    def _embed(self, texts: list[str]) -> np.ndarray:
        if not texts:
            # no HTTP call for an empty block; client.embed([]) returns
            # shape (0,), not (0, dim), and would fail the check below
            return np.zeros((0, self.dim), dtype=np.float32)
        mat = self.client.embed(texts)
        if mat.shape != (len(texts), self.dim):
            raise ValueError(
                f"endpoint returned shape {mat.shape}, expected "
                f"({len(texts)}, {self.dim})")
        return mat
