"""Round-4 regression tests (VERDICT.md r3 "Next round" items).

1. connected_components small-pairs path must never materialize the
   full corpus id column on the driver — only edge-touched ids
   (bounded by 2·n_pairs) may be pulled.
2. The pair-family gate queries return Datasets (no full-result
   driver DataFrame).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd
from ray.data import Dataset


def test_cc_small_pairs_never_pulls_full_ids(monkeypatch):
    """Large id set, tiny pair set: the round-3 code pulled EVERY id to
    the driver (`ids.to_pandas()`) even on the small-pairs path — a
    driver OOM at 10^11 docs. The fix pulls only edge rows; this spy
    bounds every driver materialization during the call by the edge
    count, and the output must still label every id."""
    from datacapsule_ray.functions import dedup

    n_ids = 50_000
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": np.array([0, 1, 7], dtype=np.int64),
        "id_b": np.array([1, 2, 9], dtype=np.int64),
        "est_jaccard": np.ones(3)}))
    ids = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n_ids, dtype=np.int64)}))

    pulled: list[int] = []
    orig = Dataset.to_pandas

    def spy(self, *a, **k):
        df = orig(self, *a, **k)
        pulled.append(len(df))
        return df

    monkeypatch.setattr(Dataset, "to_pandas", spy)
    out = dedup.connected_components(pairs, ids)
    during = list(pulled)
    assert during, "edge pull expected"
    assert max(during) <= 3, (
        f"driver materialized {max(during)} rows during "
        f"connected_components — the full id column leaked to the driver")

    monkeypatch.setattr(Dataset, "to_pandas", orig)
    labels = out.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(labels) == n_ids
    m = dict(zip(labels["id"], labels["comp"]))
    assert m[0] == m[1] == m[2] == 0
    assert m[7] == m[9] == 7
    # untouched ids are their own component, dtype preserved (int64,
    # never NaN-float64)
    assert m[3] == 3 and m[49_999] == 49_999
    assert labels["comp"].dtype == np.int64
    assert labels["id"].dtype == np.int64


def test_cc_small_pairs_empty_pairs_streams():
    """Zero candidate pairs (common at scale): pure identity map, still
    one row per id."""
    from datacapsule_ray.functions import dedup

    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": np.array([], dtype=np.int64),
        "id_b": np.array([], dtype=np.int64),
        "est_jaccard": np.array([], dtype=np.float64)}))
    ids = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(1000, dtype=np.int64)}))
    out = dedup.connected_components(pairs, ids).to_pandas()
    assert len(out) == 1000
    assert (out["comp"] == out["id"]).all()


def test_cc_small_pairs_string_ids():
    """The overlay's sorted-array lookup must work for string ids too
    (docops feeds hashed int64 surrogates, but the operator is
    public API)."""
    from datacapsule_ray.functions import dedup

    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": ["a"], "id_b": ["c"], "est_jaccard": [1.0]}))
    ids = rd.from_pandas(pd.DataFrame({"doc_id": list("abcde")}))
    out = dedup.connected_components(pairs, ids).to_pandas()
    m = dict(zip(out["id"], out["comp"]))
    assert m == {"a": "a", "b": "b", "c": "a", "d": "d", "e": "e"}


@pytest.mark.parametrize("qname", [
    "dedup_minhash_docs", "dedup_simhash_docs",
    "neardup_embeddings", "neardup_embeddings_kmeans",
])
def test_pair_family_queries_return_datasets(qname):
    """VERDICT r3 item 4: the `_typed_pairs` gate wrappers collected
    pair results to a driver DataFrame; at 100× a dup-heavy corpus that
    output is unbounded. They must return Datasets like
    ssjoin_jaccard_docs does."""
    import __ray_entry__ as em

    out = em.queries()[qname]("/root/testdata/sf0.001")
    if isinstance(out, pd.DataFrame):
        # the one sanctioned DataFrame: a zero-row typed frame standing
        # in for an all-empty Dataset (Ray's to_pandas drops its columns)
        assert len(out) == 0 and list(out.columns), qname
    else:
        assert isinstance(out, Dataset), f"{qname} returned {type(out)}"
        assert out.count() >= 0
