"""CLI entry point for the KG-construction pipeline — the `ray job
submit` surface (north rule: "run via ray job submit on a fixed-size
cluster").

    ray job submit -- python scripts/run_pipeline.py \
        --input /data/documents --ckpt /data/ckpt [--n-docs 10000]

Owns its Ray session (unlike the library, which never calls ray.init).
With --n-docs and no --input, generates the deterministic synthetic
corpus first. Resumable: re-running with the same --ckpt skips
completed partitions/stages (see state/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="directory of documents parquet shards")
    ap.add_argument("--ckpt", required=True, help="checkpoint/output root")
    ap.add_argument("--n-docs", type=int, default=None,
                    help="generate a synthetic corpus of this size into --input")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--files-per-partition", type=int, default=2)
    ap.add_argument("--no-vectors", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from datacapsule_ray.fixtures import write_corpus
    from datacapsule_ray.pipelines.build_graph import KGPipeline

    input_dir = args.input or os.path.join(args.ckpt, "corpus")
    if args.n_docs:
        files = write_corpus(input_dir, args.n_docs, seed=args.seed)
    else:
        files = sorted(
            os.path.join(input_dir, f) for f in os.listdir(input_dir)
            if f.endswith(".parquet"))
    if not files:
        raise SystemExit(f"no parquet shards found in {input_dir}")

    pipe = KGPipeline(args.ckpt,
                      emitter_concurrency=(1, max(2, args.num_cpus - 4)))
    out = pipe.run_all(files, files_per_partition=args.files_per_partition,
                       with_vectors=not args.no_vectors)
    summary = {name: ds.count() for name, ds in out.items()
               if name not in ("records", "triples")}
    summary["lineage_rows"] = len(pipe.lineage())
    print(json.dumps(summary, ensure_ascii=False))
    ray.shutdown()


if __name__ == "__main__":
    main()
