"""HLL sketch accuracy vs exact distinct counts."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from datacapsule_ray.functions.sketches import hll_distinct, hll_distinct_by_key


def test_hll_distinct_accuracy():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50_000, size=200_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    exact = len(np.unique(vals))
    est = hll_distinct(ds, "v", p=12)
    assert abs(est - exact) / exact < 0.05  # 1.6% expected std at p=12


def test_hll_small_range():
    ds = rd.from_pandas(pd.DataFrame({"v": list(range(100)) * 5}))
    est = hll_distinct(ds, "v", p=12)
    assert abs(est - 100) / 100 < 0.05


def test_hll_by_key():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=60_000),
        "v": rng.integers(0, 5_000, size=60_000),
    })
    out = hll_distinct_by_key(rd.from_pandas(df), "k", "v", p=11)
    exact = df.groupby("k")["v"].nunique()
    for row in out.itertuples(index=False):
        e = exact[row.k]
        assert abs(row.approx_distinct - e) / e < 0.08, (row.k, row.approx_distinct, e)


def test_hll_merge_associative():
    """Sketch built from split batches equals sketch from one batch."""
    from datacapsule_ray.functions.sketches import _hll_estimate, _hll_registers

    rng = np.random.default_rng(9)
    s = pd.Series(rng.integers(0, 10_000, size=50_000))
    whole = _hll_registers(s, 12)
    parts = np.maximum(_hll_registers(s[:20_000], 12),
                       _hll_registers(s[20_000:], 12))
    assert np.array_equal(whole, parts)
    assert _hll_estimate(whole) == _hll_estimate(parts)


def test_approx_quantiles_rank_error_bound():
    """Equi-depth sketch: rank error of the reported quantile must stay
    within ~2/k of the target rank on a skewed distribution, across a
    many-block dataset."""
    import ray.data as rd

    from datacapsule_ray.functions.sketches import approx_quantiles_by_key

    rng = np.random.default_rng(17)
    vals = np.exp(rng.normal(0, 1.5, size=200_000))  # lognormal, heavy tail
    keys = rng.choice(["a", "b"], size=len(vals))
    df = pd.DataFrame({"k": keys, "v": vals})
    out = approx_quantiles_by_key(
        rd.from_pandas(df).repartition(32), "k", "v",
        [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")], k=1024,
    ).set_index("k")
    for kv, sub in df.groupby("k"):
        x = np.sort(sub["v"].to_numpy())
        n = len(x)
        for q, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            got = out.loc[kv, name]
            rank = np.searchsorted(x, got) / n
            assert abs(rank - q) < 2 / 1024, (kv, name, rank, q)


def test_approx_quantiles_partitioning_invariance():
    """Same data, different block layout → near-identical estimates
    (mergeability): p50 must agree within the rank-error bound."""
    import ray.data as rd

    from datacapsule_ray.functions.sketches import approx_quantiles_by_key

    rng = np.random.default_rng(23)
    df = pd.DataFrame({"k": ["x"] * 50_000,
                       "v": rng.random(50_000)})
    a = approx_quantiles_by_key(rd.from_pandas(df).repartition(4),
                                "k", "v", [(0.5, "p50")], k=512)
    b = approx_quantiles_by_key(rd.from_pandas(df).repartition(29),
                                "k", "v", [(0.5, "p50")], k=512)
    assert abs(a["p50"].iloc[0] - b["p50"].iloc[0]) < 0.01
