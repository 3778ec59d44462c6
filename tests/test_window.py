"""Distributed rolling-window aggregate (functions/window.py) pinned to
pandas groupby().rolling() across partitionings, window sizes, and a
single giant group spanning every block."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from datacapsule_ray.functions.window import rolling_sum


def _ref(df: pd.DataFrame, w: int) -> pd.DataFrame:
    srt = df.sort_values(["g", "ts", "id"], kind="stable")
    roll = (srt.groupby("g", group_keys=False, sort=False)["v"]
            .apply(lambda s: s.rolling(w, min_periods=1).sum())
            .astype(np.int64))
    return (pd.DataFrame({"id": srt["id"], "roll_sum": roll})
            .sort_values("id").reset_index(drop=True))


def _run(df: pd.DataFrame, w: int, n_blocks: int) -> pd.DataFrame:
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = rolling_sum(ds, group_col="g", order_cols=["ts", "id"],
                      value_col="v", w=w, id_col="id")
    return got.to_pandas().sort_values("id").reset_index(drop=True)


@pytest.mark.parametrize("n_blocks,w", [(1, 3), (5, 3), (9, 1), (7, 5)])
def test_rolling_sum_matches_pandas(n_blocks, w):
    rng = np.random.default_rng(31)
    n = 400
    df = pd.DataFrame({
        "g": rng.integers(0, 12, size=n),
        "ts": rng.integers(0, 50, size=n),   # heavy ts ties -> id breaks
        "id": np.arange(n),
        "v": rng.integers(-100, 100, size=n).astype(np.int64),
    })
    pd.testing.assert_frame_equal(_run(df, w, n_blocks), _ref(df, w),
                                  check_dtype=False)


def test_rolling_sum_single_giant_group():
    """One group across every block: every block boundary is a window
    boundary, the driver channel stays at 2(w-1) rows per block."""
    n = 256
    df = pd.DataFrame({"g": np.zeros(n, dtype=np.int64),
                       "ts": np.arange(n), "id": np.arange(n),
                       "v": np.arange(n, dtype=np.int64)})
    pd.testing.assert_frame_equal(_run(df, 4, 16), _ref(df, 4),
                                  check_dtype=False)
