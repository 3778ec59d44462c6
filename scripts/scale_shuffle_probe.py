"""10×-bench-scale probe of the similarity-shuffle family (VERDICT r2
item 7): generate a 50k-doc corpus (10× the sf0.1 documents table) with
planted near-dup clusters, run the exact Jaccard self-join, MinHash+LSH
and SimHash over it, and report wall time / pair counts / dropped_rows
— pinning the LSH band-shuffle volume curve before it is trusted at
100 TB. Results are recorded in BASELINE.md.

Usage: PYTHONPATH=/root/repo python scripts/scale_shuffle_probe.py
       [n_docs] [out_dir]

The corpus is deterministic (seeded): ~5% of docs form near-dup
clusters of size 2-6 (one base doc + light token perturbations, Jaccard
>= ~0.9), the rest draw 40-80 tokens from a 500-word vocabulary — so
true-pair volume stays bounded (realistic selectivity) while the
signature/band shuffle scales with the corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make_corpus(path: str, n_docs: int, seed: int = 11,
                vocab_size: int | None = None) -> None:
    rng = np.random.default_rng(seed)
    if vocab_size is None:
        # vocabulary grows with the corpus (Heaps' law): a FIXED small
        # vocab at large n makes every token a stopword (df ~10%),
        # which is the degenerate-bucket stress case, not the normal
        # one — pass vocab_size explicitly to probe that regime
        vocab_size = max(500, n_docs // 10)
    vocab = np.array([f"tok{i:05d}" for i in range(vocab_size)],
                     dtype=object)
    texts: list[str] = []
    doc_ids: list[int] = []
    i = 0
    while len(texts) < n_docs:
        base_len = int(rng.integers(40, 81))
        base = rng.choice(vocab, size=base_len, replace=True)
        if rng.random() < 0.018:  # a near-dup cluster (~5% of docs)
            k = int(rng.integers(2, 7))
            for _ in range(min(k, n_docs - len(texts))):
                mut = base.copy()
                # perturb ~3% of tokens — keeps token-set Jaccard ~>=0.9
                nmut = max(1, base_len // 33)
                pos = rng.integers(0, base_len, size=nmut)
                mut[pos] = rng.choice(vocab, size=nmut)
                texts.append(" ".join(mut))
                doc_ids.append(i)
                i += 1
        else:
            texts.append(" ".join(base))
            doc_ids.append(i)
            i += 1
    t = pa.table({
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(t, path)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe"
    vocab_size = int(sys.argv[3]) if len(sys.argv) > 3 else None
    path = os.path.join(out_dir, "documents.parquet")

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    make_corpus(path, n_docs, vocab_size=vocab_size)
    gen_s = time.perf_counter() - t0

    import ray.data as rd

    from datacapsule_ray.functions import dedup, ssjoin

    report: dict = {"n_docs": n_docs, "gen_s": round(gen_s, 2)}

    def docs():
        return rd.read_parquet(path)

    t0 = time.perf_counter()
    st: dict = {}
    n_pairs = ssjoin.jaccard_ssjoin(docs(), tau_num=9, tau_den=10,
                                    stats=st).count()
    report["ssjoin"] = {"pairs": int(n_pairs),
                       "dropped_rows": int(st.get("dropped_rows", 0)),
                       "wall_s": round(time.perf_counter() - t0, 2)}

    t0 = time.perf_counter()
    st = {}
    n_pairs = ssjoin.jaccard_ssjoin(docs(), tau_num=19, tau_den=20,
                                    measure="cosine", stats=st).count()
    report["ssjoin_cosine"] = {
        "pairs": int(n_pairs),
        "dropped_rows": int(st.get("dropped_rows", 0)),
        "wall_s": round(time.perf_counter() - t0, 2)}

    t0 = time.perf_counter()
    st = {}
    n_pairs = dedup.minhash_lsh_pairs(docs(), threshold=0.7,
                                      stats=st).count()
    report["minhash_lsh"] = {"pairs": int(n_pairs),
                             "dropped_rows": int(st.get("dropped_rows", 0)),
                             "wall_s": round(time.perf_counter() - t0, 2)}

    t0 = time.perf_counter()
    st = {}
    n_pairs = dedup.simhash_pairs(docs(), stats=st).count()
    report["simhash"] = {"pairs": int(n_pairs),
                         "dropped_rows": int(st.get("dropped_rows", 0)),
                         "wall_s": round(time.perf_counter() - t0, 2)}

    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
