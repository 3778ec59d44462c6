"""Distributed dense linear-algebra primitives over embedding columns.

``top_principal_direction`` is the one a 100-TB embedding pipeline
needs first: the dominant PCA direction (drift axis, whitening seed,
ABX probe) via power iteration. Each iteration is ONE pass over the
vectors: every block contributes the d-vector partial
``C^T (C v)`` (C = centered rows), the driver combines O(blocks*d)
floats and renormalizes — vectors never leave the workers, nothing
quadratic in rows anywhere. The same shape as the k-means iteration in
``clustering.py`` (k*d partials to the driver) and the moment partials
in ``docops.embedding_dim_stats``.

Determinism: block partials are combined in sorted block order, so a
fixed input layout reproduces bit-identical results; the direction's
sign is canonicalized (largest-|loading| component positive). Floating
iterative linear algebra has no SQL form — the oracle story is the
rows-only driver check plus a numpy eigendecomposition parity pytest
(the HLL/quantile-sketch convention)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _vec_matrix(t: pa.Table, col: str, dim: int) -> np.ndarray:
    flat = pc.cast(pc.list_flatten(t.column(col)),
                   pa.float64()).to_numpy(zero_copy_only=False)
    return flat.reshape(t.num_rows, dim)


def top_principal_direction(ds: Dataset, *, col: str = "embedding",
                            dim: int, iters: int = 8
                            ) -> tuple[np.ndarray, float, int]:
    """(unit direction d-vector, variance along it (eigenvalue of the
    covariance scaled by n), n_rows) — power iteration from the
    deterministic all-ones start."""
    if iters < 1:
        raise ValueError("iters must be >= 1")

    def mean_partial(t: pa.Table) -> pa.Table:
        m = _vec_matrix(t, col, dim)
        return pa.table({
            "i": pa.array(np.arange(dim, dtype=np.int64)),
            "s": pa.array(m.sum(axis=0, dtype=np.float64)),
            "n": pa.array(np.full(dim, len(m), dtype=np.int64))})

    parts = ds.map_batches(mean_partial,
                           batch_format="pyarrow").to_pandas()
    n = int(parts[parts["i"] == 0]["n"].sum())
    if n == 0:
        raise ValueError("empty vector dataset")
    # sorted combine -> deterministic float summation order
    sums = (parts.sort_values(["i", "s"]).groupby("i", sort=True)["s"]
            .apply(lambda g: float(np.sum(g.to_numpy()))))
    mean = sums.to_numpy() / n

    v = np.ones(dim, dtype=np.float64) / np.sqrt(dim)
    lam = 0.0
    for _ in range(iters):
        mv = mean @ v

        def xtxv_partial(t: pa.Table, _v=v.copy(), _mv=mv) -> pa.Table:
            m = _vec_matrix(t, col, dim)
            c = (m @ _v) - _mv          # row dot products, centered
            w = m.T @ c - mean * c.sum()  # C^T (C v), expanded
            return pa.table({
                "i": pa.array(np.arange(dim, dtype=np.int64)),
                "w": pa.array(w)})

        wp = ds.map_batches(xtxv_partial,
                            batch_format="pyarrow").to_pandas()
        w = (wp.sort_values(["i", "w"]).groupby("i", sort=True)["w"]
             .apply(lambda g: float(np.sum(g.to_numpy())))).to_numpy()
        lam = float(np.linalg.norm(w))
        if lam == 0.0:   # degenerate: all rows equal the mean
            return v, 0.0, n
        v = w / lam
    # canonical sign: the largest-magnitude loading is positive
    j = int(np.argmax(np.abs(v)))
    if v[j] < 0:
        v = -v
    return v, lam, n
