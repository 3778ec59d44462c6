"""50×-bench-scale probe of the distributed k-means (round 3): 1M
64-dim vectors (500× the sf0.1 embeddings table) with planted Gaussian
blobs, k=64, 3 Lloyd iterations — reporting per-iteration wall time,
assignment-pass throughput, and the driver-side summary volume
(k × blocks rows), pinning the iteration cost curve before the
quantizer is trusted at 100 TB. Results recorded in BASELINE.md.

Usage: PYTHONPATH=/root/repo python scripts/kmeans_scale_probe.py
       [n_vecs] [k] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make_vectors(path: str, n: int, dim: int = 64, n_blobs: int = 64,
                 seed: int = 13, rows_per_file: int = 100_000) -> None:
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=4.0, size=(n_blobs, dim)).astype(np.float32)
    written = 0
    part = 0
    while written < n:
        m = min(rows_per_file, n - written)
        blob = rng.integers(0, n_blobs, size=m)
        mat = (centers[blob]
               + rng.normal(scale=1.0, size=(m, dim)).astype(np.float32))
        t = pa.table({
            "vec_id": pa.array(np.arange(written, written + m),
                               type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), type=pa.float32()), dim),
        })
        pq.write_table(t, f"{path}/part-{part:04d}.parquet")
        written += m
        part += 1


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/kmeans_probe_{n}"

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from datacapsule_ray.functions import clustering

    if not os.path.isdir(out) or not os.listdir(out):
        t0 = time.monotonic()
        make_vectors(out, n)
        print(f"corpus: {n} x 64 in {time.monotonic() - t0:.1f}s -> {out}",
              file=sys.stderr)

    ds = rd.read_parquet(out)

    # fit: per-iteration timing via iters=1..3 deltas would re-pay the
    # materialize; instead time the whole fit and one standalone
    # assignment pass (the per-iteration unit of work)
    t0 = time.monotonic()
    fit = clustering.kmeans_fit(ds, k, iters=3)
    fit_sec = time.monotonic() - t0

    t0 = time.monotonic()
    n_assigned = clustering.kmeans_assign(ds, fit["centroids"]).count()
    assign_sec = time.monotonic() - t0

    # lazy datasets don't expose num_blocks; the read splits each file
    # into >=1 block, so files is the lower bound on the partial count
    blocks = len(ds.input_files())
    rec = {
        "n_vecs": n, "dim": 64, "k": k, "iters": int(fit["iters"]),
        "fit_sec": round(fit_sec, 2),
        "sec_per_iteration": round(fit_sec / max(fit["iters"], 1), 2),
        "assign_sec": round(assign_sec, 2),
        "assign_vecs_per_s": round(n_assigned / assign_sec),
        "driver_summary_rows_per_iter_min": int(k) * int(blocks),
        "input_files": int(blocks),
        "inertia": round(float(fit["inertia"]), 1),
        "nonempty_clusters": int((fit["counts"] > 0).sum()),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    print(json.dumps(rec))
    ray.shutdown()
    if os.environ.get("KMEANS_PROBE_CLEAN"):
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
