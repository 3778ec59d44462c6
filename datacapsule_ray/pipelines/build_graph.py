"""End-to-end KG construction pipeline (SURVEY.md §3.1/§3.2, Ray-native).

    documents (interleaved spans, Lance/Parquet shards)
      → parse  (vectorized span→record, spans pass through)   [per-partition ckpt]
      → emit   (GraphEmitter actor pool: M1-M11 triple grammar)
      → link   (LinkerActor: broadcast alias dict, A3)         [per-partition ckpt]
      → edges  (salted two-phase dedup groupby)                [stage ckpt]
      → nodes  (merge-aggregate, species-priority)             [stage ckpt]
      → adjacency (groupby(src), chunked lists)                [stage ckpt]
      → star schema (4 column-pruned passes over records)      [stage ckpts]
      → entity/relation vectors (embedder actor pool)          [stage ckpts]

Extraction is embarrassingly parallel, so the parse→emit→link prefix runs
per input partition with atomic per-partition commits + lineage (resume =
anti-join pending partitions, state/checkpoint.py). The shuffle stages
consume the emissions checkpoint and commit at stage granularity.
"""

from __future__ import annotations

import ray
import ray.data as rd
from ray.data import Dataset

# Concurrent dataset creation from multiple threads races fsspec's
# lazily-imported (and, without aiohttp, always-failing) http module; the
# partial module then surfaces as "cannot import name 'HTTPFileSystem'"
# inside Ray's path resolution, which only catches ModuleNotFoundError.
# Make the import deterministic: if it can't succeed, register a stub
# whose sentinel HTTPFileSystem matches nothing in isinstance checks.
try:  # pragma: no cover
    import fsspec.implementations.http  # noqa: F401
except Exception:  # pragma: no cover
    import sys as _sys
    import types as _types

    _mod = _types.ModuleType("fsspec.implementations.http")

    class _StubHTTPFileSystem:
        pass

    _mod.HTTPFileSystem = _StubHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _mod

from ..fixtures import alias_table
from ..stages import graph as g
from ..stages import star, vectors
from ..stages.extract import GraphEmitter, make_parse_and_checkpoint
from ..stages.link import LinkerActor
from ..state.checkpoint import CheckpointStore

RECORD_COLS = ["doc_id", "doc_num", "中文学名", "拉丁学名", "命名年份", "作者",
               "界", "门", "纲", "目", "科", "属", "种",
               "自然分布地", "生活习性", "生物特征"]

# every stage derived from the extraction outputs — the single source of
# truth for append-time invalidation (a stage added to run_graph/
# run_star/run_vectors must be added here or appends would serve it
# stale)
DERIVED_STAGES = ("edges", "nodes", "adjacency", "species", "distributions",
                  "numerical_traits", "descriptions", "entity_vectors",
                  "relation_vectors")


def _pool_cap() -> int:
    """Actor-pool max size proportional to the session's CPUs."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(4, cpus // 2)


class KGPipeline:
    def __init__(self, ckpt_root: str, *, alias: dict[str, str] | None = None,
                 embed_dim: int = 32, emitter_concurrency: int | tuple = (1, 8),
                 batch_size: int = 1024,
                 emitter_kwargs: dict | None = None,
                 embedder_cls=None,
                 embedder_kwargs: dict | None = None) -> None:
        """``emitter_kwargs`` configures the GraphEmitter actors (e.g.
        ``{"splitter": "http", "client_config": {...}}`` routes the
        splitters through an OpenAI-compatible endpoint — clients.py);
        ``embedder_cls``/``embedder_kwargs`` likewise swap the vector
        stage's embedder (clients.RemoteEmbedder)."""
        self.store = CheckpointStore(ckpt_root)
        self.alias = alias if alias is not None else alias_table()
        self.embed_dim = embed_dim
        self.emitter_concurrency = emitter_concurrency
        self.batch_size = batch_size
        self.emitter_kwargs = emitter_kwargs or {}
        self.embedder_cls = embedder_cls
        self.embedder_kwargs = embedder_kwargs

    # ---- extraction prefix (per-partition, resumable) ----------------------
    def run_extraction(self, input_files: list[str],
                       files_per_partition: int = 1,
                       partition_parallelism: int = 4) -> None:
        """Process pending partitions concurrently (a thread per partition
        drives its own streaming execution; Ray schedules them onto the
        shared CPU pool). Each partition still commits atomically with its
        own lineage row, so resume granularity is unchanged."""
        from concurrent.futures import ThreadPoolExecutor

        parts = [input_files[i:i + files_per_partition]
                 for i in range(0, len(input_files), files_per_partition)]
        alias_ref = ray.put(self.alias)
        # a partition is pending unless BOTH its outputs committed WITH
        # the partition's CURRENT file list: the emissions partition is
        # written before the records partition is finalized, so a crash
        # between the two must re-run the partition (or the star-schema
        # stages would silently lose those documents); and an append
        # that grows the LAST partition (file count not a multiple of
        # files_per_partition) changes its fragment list, which an
        # existence-only check would miss — the new files would silently
        # never be extracted
        frags = {
            stage: {r["partition_id"]: r["input_fragments"]
                    for r in self.store.lineage(stage)}
            for stage in ("records", "emissions")
        }
        pending = [pid for pid in range(len(parts))
                   if frags["records"].get(pid) != parts[pid]
                   or frags["emissions"].get(pid) != parts[pid]]
        # input-set SHRINK: committed partitions beyond the new map
        # (fewer files, or a larger files_per_partition) are orphans —
        # commit_stage would re-manifest them and read_stage would serve
        # their rows alongside the regrouped layout, duplicating those
        # documents. A pure tail-shrink leaves `pending` empty, so
        # orphans must trigger the derived-stage invalidation on their
        # own.
        orphans = sorted({r["partition_id"]
                          for st in ("records", "emissions")
                          for r in self.store.lineage(st)
                          if r["partition_id"] >= len(parts)})

        def run_one(pid: int) -> None:
            import shutil
            import time as _time

            files = parts[pid]
            t0 = _time.monotonic()
            rec_tmp = self.store.partition_dir("records", pid) + ".tmp"
            shutil.rmtree(rec_tmp, ignore_errors=True)
            docs = rd.read_parquet(files)
            # fused: parse side-writes the records checkpoint (spans
            # pass-through invariant lives there) while streaming the
            # parsed batches straight into the emitter — one execution,
            # two outputs, no read-back
            emissions = docs.map_batches(
                make_parse_and_checkpoint(rec_tmp), batch_format="pyarrow",
                zero_copy_batch=True,
            ).select_columns(RECORD_COLS).map_batches(
                GraphEmitter, fn_constructor_kwargs=self.emitter_kwargs,
                batch_format="pyarrow", batch_size=self.batch_size,
                concurrency=self.emitter_concurrency,
            ).map_batches(
                LinkerActor, fn_constructor_kwargs={"alias_ref": alias_ref},
                batch_format="pyarrow", batch_size=8192,
                concurrency=(1, 4),
            )
            self.store.write_partition("emissions", pid, emissions, files)
            self.store.finalize_external_partition(
                "records", pid, rec_tmp, files,
                wall_ms=int((_time.monotonic() - t0) * 1000))

        if pending or orphans:
            # APPEND/SHRINK support, BEFORE any processing (crash-safe
            # order — worst case after a mid-sequence crash is an
            # unnecessary rebuild, never a stale result): pending work or
            # orphan partitions against already-committed extraction
            # stages mean the input set changed after a finished build,
            # so every derived stage was built over the OLD emissions and
            # must rebuild. Invalidate derived stages first, then reopen
            # the extraction stages; the durable predicates (fragment
            # mismatch / orphan lineage persist until the partitions are
            # rewritten/dropped, which only happens below) re-fire this
            # block on any crash-resume in between.
            if self.store.stage_done("emissions") or self.store.stage_done("records"):
                for st in DERIVED_STAGES:
                    if self.store.stage_done(st):
                        self.store.invalidate_stage(st)
                self.store.uncommit_stage("records")
                self.store.uncommit_stage("emissions")
            for pid in orphans:
                self.store.drop_partition("records", pid)
                self.store.drop_partition("emissions", pid)
            # each concurrent execution needs headroom (read+map+write tasks
            # plus an actor); on small sessions fall back to sequential or
            # the pipelines starve each other
            cpus = int(ray.cluster_resources().get("CPU", 4))
            workers = max(1, min(partition_parallelism, len(pending), cpus // 8))
            if workers == 1:
                for pid in pending:
                    run_one(pid)
            else:
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    list(pool.map(run_one, pending))
        if not self.store.stage_done("records"):
            self.store.commit_stage("records")
        if not self.store.stage_done("emissions"):
            self.store.commit_stage("emissions")

    # ---- shuffle stages ----------------------------------------------------
    def _ensure_scheme(self, name: str, scheme: str) -> None:
        """Partition ids are only comparable WITHIN one partitioning
        scheme. Resuming an uncommitted stage under a different scheme
        (hash-range slice of another n, or the single-part layout) must
        not keep the old parts: pending_partitions would treat slice
        i/n_old as slice i/n_new (missing keys), and read_stage would
        serve stale extra parts alongside the new layout (duplicate
        rows). Wipe the stage and restamp the scheme."""
        if self.store.stage_scheme(name) != scheme:
            self.store.invalidate_stage(name)
            self.store.set_stage_scheme(name, scheme)

    def _stage(self, name: str, build) -> Dataset:
        if not self.store.stage_done(name):
            self._ensure_scheme(name, "single")
            ds = build()
            self.store.write_partition(name, 0, ds, [name + ":emissions"])
            self.store.commit_stage(name)
        return self.store.read_stage(name)

    def emissions(self) -> Dataset:
        return self.store.read_stage("emissions")

    def triples(self) -> Dataset:
        t, _ = g.split_emissions(self.emissions())
        return t

    def _stage_partitioned(self, name: str, n_ranges: int, build_range) -> Dataset:
        """Shuffle stage committed per hash-range slice: each range runs
        its own combine over the key subset and commits atomically with a
        lineage row — partition-level resume for the wide stages, and the
        per-range combine bounds memory at scale. ``build_range(i, n)``
        builds the Dataset for slice i of n."""
        if not self.store.stage_done(name):
            self._ensure_scheme(name, f"range:{n_ranges}")
            for i in self.store.pending_partitions(name, list(range(n_ranges))):
                self.store.write_partition(
                    name, i, build_range(i, n_ranges),
                    [f"{name}:emissions:range={i}/{n_ranges}"])
            self.store.commit_stage(name)
        return self.store.read_stage(name)

    # ---- stage builders (single source of truth: run_graph/run_star/
    # run_vectors and run_all's dependency levels share these, so the
    # sequential and leveled code paths cannot drift) -------------------------
    def _records(self, cols: list[str]) -> Dataset:
        return self.store.read_stage("records", columns=cols)

    def _graph_builders(self) -> dict:
        return {
            "edges": lambda: g.dedup_edges(g.split_emissions(self.emissions())[0]),
            "nodes": lambda: g.merge_nodes(g.split_emissions(self.emissions())[1]),
        }

    def _star_builders(self, alias_ref, pool: int) -> dict:
        return {
            "species": lambda: self._records(star.SPECIES_INPUT_COLS).map_batches(
                star.species_batch, batch_format="pyarrow"),
            "distributions": lambda: self._records(
                ["doc_id", "自然分布地"]).map_batches(
                star.DistributionsEmitter,
                fn_constructor_kwargs={"alias_ref": alias_ref},
                batch_format="pyarrow", concurrency=(1, pool)),
            "numerical_traits": lambda: self._records(
                ["doc_id", "生活习性", "生物特征"]).map_batches(
                star.traits_batch, batch_format="pyarrow"),
            "descriptions": lambda: self._records(
                ["doc_id", "生活习性", "生物特征"]).map_batches(
                star.descriptions_batch, batch_format="pyarrow"),
        }

    def _adjacency_builder(self):
        return lambda: g.build_adjacency(
            self.store.read_stage("edges", columns=["src", "rel", "dst"]))

    def _vector_builders(self, pool: int) -> dict:
        return {
            "entity_vectors": lambda: vectors.build_entity_vectors(
                self.store.read_stage("nodes",
                                      columns=["node_id", "node_type", "name"]),
                dim=self.embed_dim, concurrency=(1, pool),
                embedder_cls=self.embedder_cls,
                embedder_kwargs=self.embedder_kwargs),
            "relation_vectors": lambda: vectors.build_relation_vectors(
                self.store.read_stage("edges", columns=["src", "rel", "dst"]),
                dim=self.embed_dim, concurrency=(1, pool),
                embedder_cls=self.embedder_cls,
                embedder_kwargs=self.embedder_kwargs),
        }

    def run_graph(self, shuffle_partitions: int = 1) -> dict[str, Dataset]:
        if shuffle_partitions > 1:
            edges = self._stage_partitioned(
                "edges", shuffle_partitions,
                lambda i, n: g.dedup_edges(
                    g.split_emissions(self.emissions())[0], key_filter=(i, n)))
            nodes = self._stage_partitioned(
                "nodes", shuffle_partitions,
                lambda i, n: g.merge_nodes(
                    g.split_emissions(self.emissions())[1], key_filter=(i, n)))
        else:
            builders = self._graph_builders()
            edges = self._stage("edges", builders["edges"])
            nodes = self._stage("nodes", builders["nodes"])
        adjacency = self._stage("adjacency", self._adjacency_builder())
        return {"edges": edges, "nodes": nodes, "adjacency": adjacency}

    def run_star(self) -> dict[str, Dataset]:
        builders = self._star_builders(ray.put(self.alias), _pool_cap())
        return {name: self._stage(name, build)
                for name, build in builders.items()}

    def run_vectors(self) -> dict[str, Dataset]:
        builders = self._vector_builders(_pool_cap())
        return {name: self._stage(name, build)
                for name, build in builders.items()}

    def run_all(self, input_files: list[str], files_per_partition: int = 1,
                with_vectors: bool = True,
                partition_parallelism: int = 4) -> dict[str, Dataset]:
        """Full build. After extraction, independent shuffle/sink stages
        run concurrently in dependency levels (each thread drives one
        streaming execution; the cluster CPU pool is shared):

            level A: edges, nodes, species, distributions, traits, descriptions
            level B: adjacency (←edges), entity_vectors (←nodes),
                     relation_vectors (←edges)
        """
        from concurrent.futures import ThreadPoolExecutor

        self.run_extraction(input_files, files_per_partition,
                            partition_parallelism)
        out: dict[str, Dataset] = {}
        # pool=4: six level-A stages share the CPU pool — a wider actor
        # pool here starves the siblings (A/B measured +3s)
        level_a = {**self._graph_builders(),
                   **self._star_builders(ray.put(self.alias), pool=4)}
        cpus = int(ray.cluster_resources().get("CPU", 4))

        def run_level(level: dict) -> None:
            workers = max(1, min(len(level), cpus // 8))
            if workers == 1:
                for name, build in level.items():
                    out[name] = self._stage(name, build)
                return
            with ThreadPoolExecutor(max_workers=workers) as pool:
                futs = {name: pool.submit(self._stage, name, build)
                        for name, build in level.items()}
                for name, fut in futs.items():
                    out[name] = fut.result()

        run_level(level_a)

        level_b = {"adjacency": self._adjacency_builder()}
        if with_vectors:
            level_b.update(self._vector_builders(pool=4))
        run_level(level_b)

        out["triples"] = self.triples()
        out["records"] = self.store.read_stage("records")
        return out

    def lineage(self) -> list[dict]:
        rows = []
        for stage in ("records", "emissions", "edges", "nodes", "adjacency",
                      "species", "distributions", "numerical_traits",
                      "descriptions", "entity_vectors", "relation_vectors"):
            rows.extend(self.store.lineage(stage))
        return rows
