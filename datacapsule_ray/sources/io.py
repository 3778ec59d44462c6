"""Table I/O — Lance when available, Parquet otherwise.

The north rule targets Lance tables of interleaved documents; this
container ships no ``lance`` package, so the reader/writer pair is gated
behind an import-try and falls back to Parquet with identical schemas and
directory layout. All pipeline code goes through these two functions, so
swapping the format is a one-module change.
"""

from __future__ import annotations

import ray.data as rd
from ray.data import Dataset

try:  # pragma: no cover - lance absent in this container
    import lance  # noqa: F401

    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


def read_table(path: str, columns: list[str] | None = None, **kwargs) -> Dataset:
    """Read a documents/derived table, pruning columns at the read."""
    if _HAVE_LANCE and path.endswith(".lance"):
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: Dataset, path: str, **kwargs) -> None:
    if _HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
