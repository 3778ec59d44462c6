"""Similarity search over embedding columns.

- ``topk_cosine``: distributed brute-force — per-block partial top-k via
  one numpy matmul against a broadcast query matrix, then a tiny global
  sort+limit over (blocks × k) partials. The baseline every ANN variant
  is checked against.
- ``ivf_topk_cosine``: the scale path — k-means-lite (seeded projection
  buckets) coarse quantizer; probes only the closest ``nprobe``
  partitions. Recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _cosine_sims(batch: pa.Table, qmat: np.ndarray,
                 emb_col: str) -> np.ndarray:
    """(n, q) cosine similarities of a block's embeddings vs the query
    matrix — the ONE decode/normalize/matmul kernel shared by the
    brute-force and IVF paths (so dtype/zero-norm handling can never
    diverge between the baseline and the ANN being measured against
    it)."""
    emb = batch.column(emb_col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    mat = np.asarray(emb.flatten(), dtype=np.float64).reshape(len(batch), -1)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0] = 1.0
    return (mat @ qmat.T) / (norms[:, None] * qn[None, :])


def _topk_table(sims: np.ndarray, ids: np.ndarray, k: int, id_col: str,
                valid: np.ndarray | None = None) -> pa.Table:
    """Per-query partial top-k rows from a block's sim matrix; ``valid``
    ((q, n) bool) restricts each query to its own candidate rows."""
    out_q, out_id, out_sim = [], [], []
    for qi in range(sims.shape[1]):
        if valid is None:
            s = sims[:, qi]
            idx = (np.argpartition(-s, k)[:k] if len(s) > k
                   else np.arange(len(s)))
        else:
            vi = np.flatnonzero(valid[qi])
            if len(vi) == 0:
                continue
            s = sims[vi, qi]
            idx = vi[np.argpartition(-s, k)[:k]] if len(s) > k else vi
        out_q.extend([qi] * len(idx))
        out_id.extend(ids[idx].tolist())
        out_sim.extend(sims[idx, qi].tolist())
    return pa.table({
        "query_id": pa.array(out_q, type=pa.int32()),
        id_col: pa.array(out_id),
        "sim": pa.array(out_sim, type=pa.float64()),
    })


def _finish_topk(df: pd.DataFrame, k: int, id_col: str) -> pd.DataFrame:
    """Driver-side finish over blocks x k partial rows; empty input
    (empty table, or every row filtered out) returns an empty frame
    with the contract columns instead of a sort KeyError."""
    if df.empty:
        return pd.DataFrame({"query_id": pd.Series(dtype="int32"),
                             id_col: pd.Series(dtype="object"),
                             "sim": pd.Series(dtype="float64")})
    df = df.sort_values(["query_id", "sim", id_col],
                        ascending=[True, False, True], kind="stable")
    return (df.groupby("query_id", group_keys=False).head(k)
            .reset_index(drop=True))


def _block_topk(batch: pa.Table, qmat: np.ndarray, k: int,
                id_col: str, emb_col: str) -> pa.Table:
    sims = _cosine_sims(batch, qmat, emb_col)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return _topk_table(sims, ids, k, id_col)


def topk_cosine(ds: Dataset, queries: np.ndarray, k: int = 10, *,
                id_col: str = "vec_id", emb_col: str = "embedding") -> pd.DataFrame:
    """Exact top-k cosine for each query row (queries: (q, dim) float).

    The query matrix rides into each task via closure capture of one
    small ndarray (Ray serializes it once into the object store), not
    per-batch."""
    qmat = np.asarray(queries, dtype=np.float64)
    if qmat.ndim == 1:
        qmat = qmat[None, :]
    partials = ds.map_batches(
        lambda t: _block_topk(t, qmat, k, id_col, emb_col),
        batch_format="pyarrow")
    return _finish_topk(partials.to_pandas(), k, id_col)


class _IVFAssign:
    """Assign each vector to its nearest coarse centroid (broadcast)."""

    def __init__(self, centroids_ref, emb_col: str, id_col: str) -> None:
        import ray

        self.centroids = ray.get(centroids_ref)  # (C, dim), unit norm
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch.column(self.emb_col)
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = np.asarray(emb.flatten(), dtype=np.float32).reshape(len(batch), -1)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cell = ((mat / norms) @ self.centroids.T).argmax(axis=1)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "cell": pa.array(cell.astype(np.int32())),
            self.emb_col: emb,
        })


def train_centroids(ds: Dataset, n_cells: int, dim: int, *, seed: int = 31,
                    sample: int = 4096, emb_col: str = "embedding") -> np.ndarray:
    """Coarse quantizer: k-means on a driver-side sample (n_cells ≤ a few
    thousand — the centroid table stays broadcast-small)."""
    n = ds.count()
    if n == 0:
        # empty (or fully filtered-upstream) table: no cells to train —
        # callers get an empty quantizer and ivf_topk_cosine returns an
        # empty frame, matching topk_cosine's empty-input contract
        return np.zeros((0, dim), dtype=np.float32)
    frac = min(1.0, sample / n)
    smp = ds.random_sample(frac, seed=seed).to_pandas()
    if not len(smp):
        # random_sample can land on zero rows for tiny inputs
        smp = ds.limit(min(n, sample)).to_pandas()
    mat = np.stack(smp[emb_col].to_numpy()).astype(np.float32)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-9)
    normed = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-9)
    for _ in range(5):  # a few Lloyd rounds on the sample
        assign = (normed @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = normed[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-9)
    return cent


def _block_topk_masked(batch: pa.Table, qmat: np.ndarray, k: int,
                       id_col: str, emb_col: str,
                       allowed: np.ndarray) -> pa.Table:
    """Per-block partial top-k where each query only sees rows whose
    ``cell`` is in that query's own probe set (``allowed``: (q, n_cells)
    bool) — proper IVF semantics per query, not the union."""
    sims = _cosine_sims(batch, qmat, emb_col)
    cells = batch.column("cell").to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return _topk_table(sims, ids, k, id_col, valid=allowed[:, cells])


def ivf_topk_cosine(ds: Dataset, queries: np.ndarray, k: int = 10, *,
                    n_cells: int = 16, nprobe: int = 4, seed: int = 31,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    concurrency=(1, 4),
                    centroids: np.ndarray | None = None) -> pd.DataFrame:
    """IVF-style approximate top-k: assign vectors to coarse cells once
    (actor pool, broadcast centroids), then scan only the nprobe closest
    cells PER QUERY (a row in a cell probed by query A but not query B
    can reach A's result list but never B's). Returns the same
    (query_id, id, sim) frame as ``topk_cosine`` for recall
    comparison."""
    import ray

    qmat = np.asarray(queries, dtype=np.float32)
    if qmat.ndim == 1:
        qmat = qmat[None, :]
    dim = qmat.shape[1]
    if centroids is not None:
        # pre-trained quantizer (e.g. clustering.kmeans_fit over the
        # full corpus — better cell balance than the sample trainer);
        # rows are L2-normalized because _IVFAssign and the probe
        # ranking both use normalized dot = cosine
        cent = np.asarray(centroids, dtype=np.float32)
        cent = cent / np.maximum(
            np.linalg.norm(cent, axis=1, keepdims=True), 1e-9)
    else:
        cent = train_centroids(ds, n_cells, dim, seed=seed, emb_col=emb_col)
    cent_ref = ray.put(cent)
    assigned = ds.map_batches(
        _IVFAssign, fn_constructor_kwargs={
            "centroids_ref": cent_ref, "emb_col": emb_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-9)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (q, nprobe)
    allowed = np.zeros((qmat.shape[0], len(cent)), dtype=bool)
    allowed[np.arange(len(probe))[:, None], probe] = True
    probe_cells = sorted({int(c) for row in probe for c in row})
    import pyarrow.compute as pc

    # cheap union prefilter (rows in NO query's probe set never scanned),
    # then the per-query mask inside the block top-k enforces real IVF
    # semantics
    sub = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t.column("cell"),
                                    value_set=pa.array(probe_cells, type=pa.int32()))),
        batch_format="pyarrow")
    qmat64 = qmat.astype(np.float64)
    partials = sub.map_batches(
        lambda t: _block_topk_masked(t, qmat64, k, id_col, emb_col, allowed),
        batch_format="pyarrow")
    return _finish_topk(partials.to_pandas(), k, id_col)
