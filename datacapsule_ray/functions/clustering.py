"""Distributed k-means over an embedding column (Lloyd's algorithm) —
the clustering companion to the ANN family in ``similarity.py`` (the
IVF coarse quantizer there uses seeded projections; this is the real
iterative refinement for when cluster quality matters: semantic dedup,
corpus bucketing, IVF index training).

Design for scale:

- The working set is the column-pruned ``(id, embedding)`` projection,
  materialized ONCE into the object store so the k iterations don't
  re-read the corpus (at 100 TB this would be a parquet checkpoint; the
  object store spills either way).
- Each Lloyd iteration is ONE ``map_batches`` pass emitting a partial
  ``(cluster, count, vsum)`` summary per block — at most k rows per
  block, so only ``k x blocks`` rows ever reach the driver, never the
  vectors themselves.
- Centroids ride to workers by closure capture of one small ``(k, dim)``
  ndarray (Ray serializes it once per stage, not per batch).
- Assignment is a chunked vectorized argmin over an ``(n, k)`` distance
  matrix (numpy broadcasting, no Python loop); chunking caps the
  temporary at ~64 MB so large k never blows a worker heap.
- Ties break toward the LOWEST centroid index (numpy ``argmin`` takes
  the first minimum), matching the SQL oracle's ``ORDER BY dist, cid``.
- Empty clusters keep their previous centroid (a common, deterministic
  choice; no resampling so reruns are bit-identical).

Init is deterministic: the embeddings of the ``k`` smallest ids
(per-block partial min-k, driver merge of ``blocks x k`` candidate
rows) — reproducible across partitionings, and SQL-expressible so the
fixed-centroid assignment has a full DuckDB oracle
(``cluster_assign_embeddings`` in ``__ray_entry__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..traverse import gather_table

# cap for the (chunk, k, dim) float64 distance temporary
_DIST_TEMP_BYTES = 64 << 20


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    """Decode a list<float> column to a contiguous (n, dim) float64
    matrix — same decode as ``similarity._cosine_sims`` so the two
    families can never disagree on dtype handling."""
    emb = batch.column(emb_col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    return np.asarray(emb.flatten(), dtype=np.float64).reshape(len(batch), -1)


def assign_chunked(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row by squared euclidean distance,
    computed as an explicit ``(x - c)**2`` sum (NOT the expanded
    ``|x|^2 - 2xc + |c|^2`` form) so it matches DuckDB's
    ``list_distance`` summation to the last ulp on typical data.
    Chunked so the (n, k, dim) temporary stays under ~64 MB."""
    n, dim = mat.shape
    k = centroids.shape[0]
    step = max(1, _DIST_TEMP_BYTES // (8 * k * dim))
    out = np.empty(n, dtype=np.int64)
    for lo in range(0, n, step):
        chunk = mat[lo:lo + step]
        d = ((chunk[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        out[lo:lo + step] = d.argmin(axis=1)
    return out


def assign_topp_chunked(mat: np.ndarray, centroids: np.ndarray,
                        p: int) -> np.ndarray:
    """(n, p) indices of each row's p nearest centroids (unordered
    within the p — IVF multi-probe only needs the SET). Same chunking
    contract as ``assign_chunked``: the (chunk, k, dim) distance
    temporary is capped at ~64 MB, so large k·dim never blows a worker
    heap."""
    n, dim = mat.shape
    k = centroids.shape[0]
    p = min(p, k)
    step = max(1, _DIST_TEMP_BYTES // (8 * k * dim))
    out = np.empty((n, p), dtype=np.int64)
    for lo in range(0, n, step):
        chunk = mat[lo:lo + step]
        d = ((chunk[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        out[lo:lo + step] = np.argpartition(d, p - 1, axis=1)[:, :p]
    return out


def seed_centroids(ds: Dataset, k: int, *, id_col: str = "vec_id",
                   emb_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """Deterministic init: the embeddings of the k smallest ids.

    Per-block partial min-k (each block contributes at most k rows),
    then a driver merge over ``blocks x k`` rows — the corpus itself
    never leaves the workers. Returns ``(seed_ids, (k, dim) matrix)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(order))

    cand = gather_table(ds.map_batches(partial, batch_format="pyarrow"))
    ids = cand.column(id_col).to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")[:k]
    if len(order) < k:
        raise ValueError(f"k={k} exceeds dataset size {len(order)}")
    top = cand.take(pa.array(order))
    return (top.column(id_col).to_numpy(zero_copy_only=False),
            _emb_matrix(top, emb_col))


def kmeans_fit(ds: Dataset, k: int, *, iters: int = 10,
               id_col: str = "vec_id", emb_col: str = "embedding",
               tol: float = 0.0, materialize: bool = True) -> dict:
    """Lloyd's k-means over ``ds[emb_col]``; returns
    ``{"centroids": (k, dim), "counts": (k,), "iters": int,
    "inertia": float}``.

    Each iteration ships only per-block (cluster, count, vsum) partials
    to the driver; see the module docstring for the scale contract.
    ``tol`` stops early when the max centroid shift (L2) falls to or
    below it (0.0 = run until assignments fix or ``iters`` exhaust).
    ``materialize=False`` skips the internal project+materialize for a
    caller that already holds the materialized (id, embedding)
    projection and will reuse it after the fit — without it the fit's
    copy is discarded and the caller's next pass re-reads the corpus.
    """
    proj = (ds if not materialize
            else ds.select_columns([id_col, emb_col]).materialize())
    _, cents = seed_centroids(proj, k, id_col=id_col, emb_col=emb_col)
    dim = cents.shape[1]
    counts = np.zeros(k, dtype=np.int64)
    inertia = float("nan")
    it = 0
    for it in range(1, iters + 1):
        frozen = cents  # bind the CURRENT centroids into this pass

        def partial(batch: pa.Table, cents=frozen) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({
                    "cluster": pa.array([], type=pa.int32()),
                    "count": pa.array([], type=pa.int64()),
                    "vsum": pa.array([], type=pa.list_(pa.float64(), dim)),
                    "sq": pa.array([], type=pa.float64()),
                })
            mat = _emb_matrix(batch, emb_col)
            a = assign_chunked(mat, cents)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, a, mat)
            n_per = np.bincount(a, minlength=k)
            sq = ((mat - cents[a]) ** 2).sum()
            nz = np.flatnonzero(n_per)
            return pa.table({
                "cluster": pa.array(nz, type=pa.int32()),
                "count": pa.array(n_per[nz], type=pa.int64()),
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums[nz].ravel(), type=pa.float64()), dim),
                # block-level inertia rides on the first row only
                "sq": pa.array(
                    [float(sq)] + [0.0] * (len(nz) - 1), type=pa.float64()),
            })

        t = gather_table(proj.map_batches(partial, batch_format="pyarrow"))
        total = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        if t.num_rows:
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            vs = np.asarray(t.column("vsum").combine_chunks().flatten(),
                            dtype=np.float64).reshape(len(cl), dim)
            np.add.at(total, cl, vs)
            np.add.at(counts, cl,
                      t.column("count").to_numpy(zero_copy_only=False))
            inertia = float(
                t.column("sq").to_numpy(zero_copy_only=False).sum())
        nz = counts > 0
        new = cents.copy()
        new[nz] = total[nz] / counts[nz, None]
        shift = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
        cents = new
        if shift <= tol:
            break
    return {"centroids": cents, "counts": counts, "iters": it,
            "inertia": inertia}


def kmeans_assign(ds: Dataset, centroids: np.ndarray, *,
                  id_col: str = "vec_id", emb_col: str = "embedding",
                  labels: np.ndarray | None = None,
                  out_col: str = "cluster") -> Dataset:
    """Per-row nearest-centroid assignment as a streaming map_batches
    pass; ``labels`` (optional, len k) relabels cluster index i to
    ``labels[i]`` (e.g. the seed ids, for the SQL-oracle variant).
    Output: (id_col, out_col int64)."""
    cents = np.asarray(centroids, dtype=np.float64)
    lab = (np.asarray(labels, dtype=np.int64)
           if labels is not None else None)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch.column(id_col),
                             out_col: pa.array([], type=pa.int64())})
        a = assign_chunked(_emb_matrix(batch, emb_col), cents)
        if lab is not None:
            a = lab[a]
        return pa.table({id_col: batch.column(id_col),
                         out_col: pa.array(a, type=pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")
