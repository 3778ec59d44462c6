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
