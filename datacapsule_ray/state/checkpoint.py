"""Stage-boundary checkpoints with per-partition lineage + metrics.

The reference has no checkpointing — a crash loses everything
(SURVEY.md §4). Here every pipeline stage writes its output atomically
(temp dir → rename) under ``<root>/<stage>/``, records a lineage row per
partition (FIXTURES.md §6), and a resumed run skips stages/partitions
whose manifest entries exist (an anti-join of work against the manifest).

Layout:
    <root>/<stage>/part-<k>/*.parquet     partition output (atomic rename)
    <root>/<stage>/part-<k>/_lineage.json lineage row for that partition
    <root>/_manifest/<stage>.json         stage-level manifest (all partitions)
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass

import ray.data as rd
from ray.data import Dataset


@dataclass
class LineageRow:
    stage: str
    partition_id: int
    input_fragments: list[str]
    rows_in: int
    rows_out: int
    wall_ms: int
    content_hash: str


class CheckpointStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)

    # --- partition-level API -------------------------------------------------
    def partition_dir(self, stage: str, partition_id: int) -> str:
        return os.path.join(self.root, stage, f"part-{partition_id:05d}")

    def partition_done(self, stage: str, partition_id: int) -> bool:
        return os.path.exists(
            os.path.join(self.partition_dir(stage, partition_id), "_lineage.json")
        )

    def pending_partitions(self, stage: str, partition_ids: list[int]) -> list[int]:
        """The anti-join: partitions without a committed lineage row."""
        return [p for p in partition_ids if not self.partition_done(stage, p)]

    def write_partition(
        self,
        stage: str,
        partition_id: int,
        ds: Dataset,
        input_fragments: list[str],
        rows_in: int = -1,
    ) -> LineageRow:
        """Execute ``ds`` streaming into the partition dir, atomically."""
        final = self.partition_dir(stage, partition_id)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        t0 = time.monotonic()
        ds.write_parquet(tmp)
        # a 0-row dataset writes no files AND no directory (Ray 2.49);
        # an empty partition is still a valid commit (sparse hash range,
        # all-failed docs) — materialize the dir so the rename lands
        os.makedirs(tmp, exist_ok=True)
        rows_out, content_hash = _dir_stats(tmp)
        row = LineageRow(
            stage=stage,
            partition_id=partition_id,
            input_fragments=input_fragments,
            rows_in=rows_in,
            rows_out=rows_out,
            wall_ms=int((time.monotonic() - t0) * 1000),
            content_hash=content_hash,
        )
        with open(os.path.join(tmp, "_lineage.json"), "w") as f:
            json.dump(asdict(row), f, ensure_ascii=False)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return row

    def finalize_external_partition(
        self,
        stage: str,
        partition_id: int,
        tmp_dir: str,
        input_fragments: list[str],
        wall_ms: int = 0,
    ) -> LineageRow:
        """Commit a partition whose files were side-written by tasks
        (e.g. the fused parse stage): stamp lineage, atomic rename."""
        final = self.partition_dir(stage, partition_id)
        # a partition whose tasks produced zero rows side-writes nothing,
        # not even the dir — an empty partition is still a valid commit
        os.makedirs(tmp_dir, exist_ok=True)
        rows_out, content_hash = _dir_stats(tmp_dir)
        row = LineageRow(stage=stage, partition_id=partition_id,
                         input_fragments=input_fragments, rows_in=-1,
                         rows_out=rows_out, wall_ms=wall_ms,
                         content_hash=content_hash)
        with open(os.path.join(tmp_dir, "_lineage.json"), "w") as f:
            json.dump(asdict(row), f, ensure_ascii=False)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp_dir, final)
        return row

    def read_stage(self, stage: str, columns: list[str] | None = None) -> Dataset:
        paths = self.stage_files(stage)
        if not paths:
            # rd.read_parquet([]) fails with an unrelated error; name
            # the actual problem (stage never ran, or committed empty)
            raise FileNotFoundError(
                f"stage {stage!r} has no committed parquet output under "
                f"{os.path.join(self.root, stage)!r} — run the pipeline "
                "stage first (or it produced only empty partitions)")
        return rd.read_parquet(paths, columns=columns)

    def stage_files(self, stage: str) -> list[str]:
        stage_dir = os.path.join(self.root, stage)
        if not os.path.isdir(stage_dir):  # stage never ran
            return []
        out = []
        for part in sorted(os.listdir(stage_dir)):
            pdir = os.path.join(stage_dir, part)
            # '.tmp' dirs are crash leftovers from an interrupted
            # write_partition — NEVER read them: a resumed run that no
            # longer rewrites that partition id would otherwise serve
            # partial/duplicate rows silently
            if (part.startswith("part-") and not part.endswith(".tmp")
                    and os.path.isdir(pdir)):
                out.extend(
                    os.path.join(pdir, f)
                    for f in sorted(os.listdir(pdir))
                    if f.endswith(".parquet")
                )
        return out

    def drop_partition(self, stage: str, partition_id: int) -> None:
        """Remove one committed partition (output + lineage). Used to
        prune orphans when the partition map shrinks — a stale part-k
        would otherwise be re-manifested and served alongside the new
        layout, duplicating its rows."""
        shutil.rmtree(self.partition_dir(stage, partition_id),
                      ignore_errors=True)

    # --- partitioning-scheme marker -------------------------------------------
    # Partition ids are only comparable WITHIN one partitioning scheme
    # (hash-range slice i of n, or the single-part layout). Resuming an
    # uncommitted stage under a different scheme must not treat the old
    # parts as done — the caller records the scheme before writing and
    # wipes the stage when it changes.
    def stage_scheme(self, stage: str) -> str | None:
        p = os.path.join(self.root, stage, "_scheme.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["scheme"]

    def set_stage_scheme(self, stage: str, scheme: str) -> None:
        d = os.path.join(self.root, stage)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "_scheme.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"scheme": scheme}, f)
        os.rename(tmp, os.path.join(d, "_scheme.json"))

    # --- stage-level API -----------------------------------------------------
    def _stage_manifest(self, stage: str) -> str:
        return os.path.join(self.root, "_manifest", f"{stage}.json")

    def stage_done(self, stage: str) -> bool:
        return os.path.exists(self._stage_manifest(stage))

    def uncommit_stage(self, stage: str) -> None:
        """Remove just the stage manifest (partition outputs stay):
        reopens a committed stage whose input set changed (append), so
        finished partitions keep resuming while the stage re-commits
        after the new ones land."""
        m = self._stage_manifest(stage)
        if os.path.exists(m):
            os.remove(m)

    def invalidate_stage(self, stage: str) -> None:
        """Remove a stage's partition outputs AND manifest so the next
        run rebuilds it from scratch. Used when a stage's INPUT gained
        data (e.g. corpus shards appended after a completed build):
        lineage-based resume would otherwise treat the stale partitions
        as done and silently exclude the new rows.

        Order matters for crash safety: partition dirs first, manifest
        last. The reverse order could crash after the manifest removal
        with stale per-partition lineage surviving — a later run would
        then 're-commit' the stale outputs as fresh."""
        stage_dir = os.path.join(self.root, stage)
        if os.path.isdir(stage_dir):
            shutil.rmtree(stage_dir)
        m = self._stage_manifest(stage)
        if os.path.exists(m):
            os.remove(m)

    def commit_stage(self, stage: str, extra: dict | None = None) -> None:
        lineage = self.lineage(stage)
        with open(self._stage_manifest(stage) + ".tmp", "w") as f:
            json.dump(
                {"stage": stage, "partitions": lineage, **(extra or {})},
                f,
                ensure_ascii=False,
            )
        os.rename(self._stage_manifest(stage) + ".tmp", self._stage_manifest(stage))

    def lineage(self, stage: str) -> list[dict]:
        """Per-partition lineage + metrics rows for a stage."""
        stage_dir = os.path.join(self.root, stage)
        rows = []
        if not os.path.isdir(stage_dir):
            return rows
        for part in sorted(os.listdir(stage_dir)):
            if not part.startswith("part-") or part.endswith(".tmp"):
                continue  # skip crash-leftover tmp dirs (see stage_files)
            path = os.path.join(stage_dir, part, "_lineage.json")
            if os.path.exists(path):
                with open(path) as f:
                    rows.append(json.load(f))
        return rows


def _dir_stats(path: str) -> tuple[int, str]:
    """(total rows, content hash over file-level row/byte stats)."""
    import pyarrow.parquet as pq

    rows = 0
    h = hashlib.sha256()
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        fp = os.path.join(path, f)
        md = pq.ParquetFile(fp).metadata
        rows += md.num_rows
        h.update(f"{f}:{md.num_rows}:{os.path.getsize(fp)};".encode())
    return rows, h.hexdigest()[:16]
