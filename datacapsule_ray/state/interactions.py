"""Interaction + saved-data stores (S6/S7) — the reference's serving-side
persistence re-expressed as log-structured columnar stores a Ray cluster
can write concurrently.

The reference keeps interactions in a single SQLite table behind
SQLAlchemy (app.py:58-85: id/timestamp/question/model/version/messages/
retrievmethod/prompt/modelResponse/reasoning/processingTime/tokens) with
insert (app.py:279-325, duplicate ids rejected), update (:385-387),
delete (:329-351), point get (:401-432) and a version-filtered
offset/limit page (:443-498); saved data is one growing JSON array file
(app.py:253-276). A single mutable file is exactly what a multi-node
engine cannot share, so both become append-only segment logs:

- a *segment* is a directory of parquet files written atomically
  (tmp → rename, the checkpoint.py convention) with a monotonically
  increasing generation number and an op (``upsert``/``delete``) in its
  name. Distributed ingest is ``Dataset.write_parquet`` straight into a
  segment — no driver materialization, any number of part files.
- reads resolve *last write wins* per id: union of segments with their
  generation stamped on, one ``sort(id, seq)`` and a vectorized
  take-last-of-run per block; runs touching a block boundary are
  re-resolved driver-side (O(blocks) rows — the user_sessions /
  top3_orders_per_customer boundary pattern). A winning tombstone drops
  the id. Upsert-over-upsert reproduces the reference's update
  endpoint; the duplicate-id insert rejection becomes idempotent
  last-wins (documented divergence: a log store checks nothing at
  append time).
- ``compact()`` folds all segments into one resolved generation and
  removes the old ones (crash-safe: new segment renamed in before old
  ones are unlinked; a crash in between only leaves redundant rows that
  the next resolve collapses).

At 100 TB the id-hash could additionally bucket each segment's files so
resolution shuffles only within buckets; the sort-based resolve here is
the same shape Ray would execute for that — range-partition by id.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

INTERACTION_FIELDS = pa.schema([
    ("id", pa.string()),
    ("timestamp", pa.timestamp("us")),
    ("question", pa.string()),
    ("model", pa.string()),
    ("version", pa.string()),
    ("messages", pa.string()),       # JSON-encoded, like the reference's
    ("retrievmethod", pa.string()),  # JSON columns (app.py:77-78)
    ("prompt", pa.string()),
    ("modelResponse", pa.string()),
    ("reasoning", pa.string()),
    ("processingTime", pa.int64()),
    ("tokens", pa.string()),
])

# 6+ digits: the writer's f'{seq:06d}' widens past 999,999 instead of
# truncating — an exactly-6 anchor would make segment 1,000,000
# invisible (silent data loss) and wedge the next commit on a rename
# collision
_SEG_PAT = re.compile(r"^seg-(\d{6,})-(upsert|delete)$")


class InteractionStore:
    """Log-structured interaction store rooted at a directory."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- segment plumbing ----------------------------------------------------
    def _segments(self) -> list[tuple[int, str, str]]:
        """Sorted (seq, op, path) for committed segments."""
        out = []
        for name in os.listdir(self.root):
            m = _SEG_PAT.match(name)
            if m:
                out.append((int(m.group(1)), m.group(2),
                            os.path.join(self.root, name)))
        return sorted(out)

    def _next_seq(self) -> int:
        segs = self._segments()
        return (segs[-1][0] + 1) if segs else 0

    # --- compaction lock ------------------------------------------------------
    # Writers and compact() coordinate through one atomic-mkdir lock so
    # compact can never fold the log while a writer holds a claim BELOW
    # the compacted segment's seq: without it, a writer that claimed seq
    # S before compact claims N>S could rename seg-S in AFTER compact's
    # scan, and the compacted segment (older data, higher seq) would
    # permanently shadow seg-S under last-wins ordering (lost update).
    _LOCK_NAME = ".compact-lock"
    _LOCK_STALE_S = 600.0

    def _lock_path(self) -> str:
        return os.path.join(self.root, self._LOCK_NAME)

    def _lock_held(self) -> bool:
        return os.path.isdir(self._lock_path())

    def _wait_lock_clear(self, timeout: float = 120.0) -> None:
        import time

        deadline = time.monotonic() + timeout
        while self._lock_held():
            try:  # a crashed compactor must not wedge writers forever
                age = time.time() - os.path.getmtime(self._lock_path())
                if age > self._LOCK_STALE_S:
                    os.rmdir(self._lock_path())
                    break
            except OSError:
                break  # lock vanished between the checks
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"compaction lock {self._lock_path()!r} held past "
                    f"{timeout}s")
            time.sleep(0.05)

    def _commit_segment(self, op: str, write_fn,
                        empty_schema: pa.Schema | None = None,
                        ignore_lock: bool = False) -> str:
        """Atomic segment commit: write into a tmp dir, rename in. The
        rename IS the commit — a crash mid-write leaves only .tmp junk
        that is ignored by _segments and swept by compact().

        Two hardenings for the log contract:
        - a ZERO-ROW write (``write_parquet`` of an empty Dataset emits
          no files at all) still commits a schema-carrying empty parquet
          file — a file-less segment dir would poison every later
          ``get``/``scan`` with an empty-schema filter error;
        - the segment NUMBER is claimed with an atomic exclusive
          ``os.mkdir`` of an op-INDEPENDENT ``.claim-<seq>`` marker
          before the rename: the segment name encodes the op, so a
          rename-only claim would let a concurrent upsert and delete
          commit the SAME seq under different names (their last-wins
          order then decided alphabetically, not by commit). The claim
          loser retries with a fresh seq instead of discarding its
          fully-written data. The marker is PERMANENT: removing it
          after the rename would reopen the race for a writer that
          read _next_seq before the winner committed (nothing
          re-checks seg-<seq>-* after mkdir succeeds). A claim is one
          empty dir; ``compact()`` sweeps claims below the newest
          committed seq, which no writer can ever legitimately claim
          again (_next_seq only grows).

        Interaction with ``compact()``: the rename is gated on the
        compaction lock being clear AFTER the claim (claim → re-check
        lock → rename). If the lock appeared in between, the claim is
        burned and the writer waits the lock out, then retries with a
        fresh (now post-compaction) seq — so no segment ever commits
        below a concurrently compacted segment's seq. See the lock
        comment at _LOCK_NAME."""
        tmp = os.path.join(self.root, f"seg.tmp-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp)
        try:
            write_fn(tmp)
            if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
                pq.write_table(
                    (empty_schema or INTERACTION_FIELDS).empty_table(),
                    os.path.join(tmp, "part-0.parquet"))
            if not ignore_lock:
                self._wait_lock_clear()  # fast-path; racy, re-checked below
            seq = self._next_seq()
            for _ in range(50):
                claim = os.path.join(self.root, f".claim-{seq:06d}")
                try:
                    os.mkdir(claim)  # atomic-exclusive, op-independent
                except FileExistsError:
                    seq = max(self._next_seq(), seq + 1)
                    continue
                if not ignore_lock and self._lock_held():
                    # compact started after the fast-path check: burn
                    # this claim (one empty dir), wait the compaction
                    # out, re-claim above its output seq
                    self._wait_lock_clear()
                    seq = max(self._next_seq(), seq + 1)
                    continue
                final = os.path.join(self.root, f"seg-{seq:06d}-{op}")
                try:
                    os.rename(tmp, final)
                except OSError:
                    if not os.path.isdir(tmp):
                        # our staged data is GONE (e.g. an over-eager
                        # external cleanup) — retrying would spin
                        # through the claim space; surface it
                        raise OSError(
                            f"segment tmp dir {tmp!r} vanished before "
                            f"rename — staged write lost") from None
                    # defensive: a pre-claim-era segment already holds
                    # this seq — burn the claim, slide to the next
                    seq = max(self._next_seq(), seq + 1)
                    continue
                return final
            raise OSError(
                f"could not claim a segment number after 50 attempts "
                f"under {self.root!r}")
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise

    # --- writes --------------------------------------------------------------
    def append(self, records: list[dict]) -> str:
        """Driver-side ingest of a few records (the per-request serving
        path, app.py:279-325). Fields are normalized to the reference
        schema; dict-valued messages/retrievmethod/tokens are
        JSON-encoded like the reference does."""
        rows = []
        for r in records:
            row = {}
            for field in INTERACTION_FIELDS:
                v = r.get(field.name)
                if field.name in ("messages", "retrievmethod", "tokens") \
                        and v is not None and not isinstance(v, str):
                    v = json.dumps(v, ensure_ascii=False)
                row[field.name] = v
            if not row["id"]:
                row["id"] = str(uuid.uuid4())
            rows.append(row)
        # duplicate ids within ONE call: the later record wins,
        # deterministically (mirrors applying the upserts in sequence).
        # append_dataset makes no such promise — rows of one generation
        # share a _seq, so in-generation duplicates resolve arbitrarily
        # and distributed ingest callers must dedupe per generation.
        last = {r["id"]: r for r in rows}
        rows = [r for r in rows if last[r["id"]] is r]
        table = pa.Table.from_pylist(rows, schema=INTERACTION_FIELDS)
        return self._commit_segment(
            "upsert", lambda d: pq.write_table(table, f"{d}/part-0.parquet"))

    def append_dataset(self, ds: Dataset) -> str:
        """Distributed ingest: the Dataset's blocks stream straight into
        the segment's part files — no driver materialization.
        min_rows_per_file coalesces tiny upstream blocks so a segment
        is a handful of real files, not one sliver per block (every
        later scan/get opens each file)."""
        return self._commit_segment(
            "upsert", lambda d: ds.map_batches(
                _conform_batch, batch_format="pyarrow").write_parquet(
                d, min_rows_per_file=64_000))

    def delete(self, ids: list[str]) -> str:
        """Tombstone segment (app.py:329-351's delete endpoint)."""
        t = pa.table({"id": pa.array([str(i) for i in ids], type=pa.string())})
        return self._commit_segment(
            "delete", lambda d: pq.write_table(t, f"{d}/part-0.parquet"),
            empty_schema=t.schema)

    def delete_dataset(self, ids: Dataset) -> str:
        """Distributed tombstones from a Dataset with an ``id`` column."""
        return self._commit_segment(
            "delete", lambda d: ids.map_batches(
                lambda t: pa.table({"id": t.column("id").cast(pa.string())}),
                batch_format="pyarrow").write_parquet(
                d, min_rows_per_file=64_000),
            empty_schema=pa.schema([("id", pa.string())]))

    # --- reads ---------------------------------------------------------------
    def _read_segment(self, path: str) -> Dataset:
        """Segment read with byte-sized blocks: Ray's default parallelism
        heuristic splits EVERY read into ~2×CPU blocks regardless of
        size, so a store of K segments yields K×64 tiny blocks and the
        resolve sort + page sort drown in per-block overhead (measured
        3× the whole query's useful work at bench scale)."""
        size = sum(os.path.getsize(os.path.join(path, f))
                   for f in os.listdir(path) if f.endswith(".parquet"))
        blocks = max(1, size // (32 << 20))
        return rd.read_parquet(path, override_num_blocks=int(blocks))

    def scan(self) -> Dataset:
        """Live rows after last-write-wins resolution (distributed)."""
        segs = self._segments()
        if not segs:
            return rd.from_arrow(INTERACTION_FIELDS.empty_table())
        parts = []
        for seq, op, path in segs:
            if not _has_parquet(path):
                continue  # legacy file-less segment (pre-hardening)
            ds = self._read_segment(path)
            parts.append(ds.map_batches(
                _stamp(seq, op), batch_format="pyarrow"))
        if not parts:
            return rd.from_arrow(INTERACTION_FIELDS.empty_table())
        log = parts[0]
        for p in parts[1:]:
            log = log.union(p)
        # conform the resolved blocks back onto the interaction schema:
        # the boundary-fixup branch rides through pandas, which would
        # otherwise leak object/float dtypes for nullable int columns
        return _resolve_last_wins(log).map_batches(
            _conform_batch, batch_format="pyarrow")

    def get(self, interaction_id: str) -> dict | None:
        """Point lookup (app.py:401-432): predicate pushdown at the read
        — only matching row groups leave storage — then resolve the tiny
        survivor set driver-side."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        frames = []
        for seq, op, path in self._segments():
            if not _has_parquet(path):
                continue  # legacy file-less segment (pre-hardening)
            t = pads.dataset(path, format="parquet").to_table(
                filter=pc.field("id") == interaction_id)
            if t.num_rows:
                frames.append(_stamp(seq, op)(t))
        if not frames:
            return None
        allt = pa.concat_tables(frames, promote_options="default")
        win = allt.to_pylist()[int(np.argmax(allt.column("_seq").to_numpy()))]
        if win.pop("_op") == "delete":
            return None
        win.pop("_seq")
        return win

    def by_version(self, version: str, *, offset: int = 0,
                   limit: int = 20) -> pd.DataFrame:
        """Version-filtered page, timestamp DESC with id tiebreak
        (app.py:443-498's offset/limit contract). Distributed sort +
        limit — driver residency is one page + offset."""
        import pyarrow.compute as pc

        from ..pipelines.relational import paginate

        # vectorized equality, NOT a string-interpolated filter expr:
        # version mirrors an HTTP query param (app.py:443), so a quote
        # in it would crash the expression parser — or worse, select
        # the wrong rows
        want = pa.scalar(version, pa.string())
        live = self.scan().map_batches(
            lambda t: t.filter(pc.equal(t.column("version"), want)),
            batch_format="pyarrow")
        return paginate(live, sort_key="timestamp", descending=True,
                        offset=offset, limit=limit, tiebreak="id")

    def training_set(self, ids: list[str]) -> Dataset:
        """The /addtraining export (app.py:677-733): the selected
        interactions as dspy-Example-shaped rows (question / reasoning /
        modelResponse → question / standard_reasoning / standard_answer,
        app.py:554). The id set is the broadcast small side — a
        vectorized ``is_in`` semi-join against the resolved store, never
        a shuffle; rows missing any field are skipped like the
        reference's ``if x.question and x.reasoning and ...`` guard
        (app.py:703-713)."""
        import pyarrow.compute as pc

        wanted = pa.array(sorted({str(i) for i in ids}), type=pa.string())

        def pick(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("id"), value_set=wanted))
            for col in ("question", "reasoning", "modelResponse"):
                # truthiness like the reference: null AND empty-string
                # fields disqualify (an errored agent episode logs
                # modelResponse='' — it must not become a demo)
                c = t.column(col)
                t = t.filter(pc.and_(pc.is_valid(c), pc.not_equal(c, "")))
            return pa.table({
                "id": t.column("id"),
                "question": t.column("question"),
                "standard_reasoning": t.column("reasoning"),
                "standard_answer": t.column("modelResponse"),
            })

        return self.scan().map_batches(pick, batch_format="pyarrow")

    # --- maintenance ---------------------------------------------------------
    def _claim_seqs(self) -> set[int]:
        out = set()
        for name in os.listdir(self.root):
            if name.startswith(".claim-"):
                try:
                    out.add(int(name.split("-", 1)[1]))
                except ValueError:
                    pass
        return out

    def compact(self, grace_s: float = 2.0) -> str:
        """Fold the log into one resolved upsert segment and drop the
        old segments + stray tmp dirs. Safe to run concurrently with
        writers: the compaction lock (see _LOCK_NAME) stops new claims,
        and a bounded grace wait lets writers that claimed BEFORE the
        lock finish their rename (claim → rename is a few syscalls), so
        their segments are included in the fold instead of being
        shadowed by it. A writer stalled past ``grace_s`` between claim
        and rename is treated as crashed — the documented residual
        assumption. A second concurrent compact raises."""
        import threading
        import time

        try:
            os.mkdir(self._lock_path())
        except FileExistsError:
            raise RuntimeError(
                f"another compaction holds {self._lock_path()!r}") from None
        # keepalive: a fold longer than _LOCK_STALE_S would otherwise
        # look crashed to _wait_lock_clear, which would steal the lock
        # and reopen the lost-update race the lock exists to close —
        # refresh the lock mtime while compact runs so only genuinely
        # dead compactors age out
        stop = threading.Event()

        def _keepalive() -> None:
            while not stop.wait(self._LOCK_STALE_S / 3):
                try:
                    os.utime(self._lock_path())
                except FileNotFoundError:
                    return  # lock gone (stolen/removed) — nothing to refresh
                except OSError:
                    continue  # transient FS error — keep refreshing

        beat = threading.Thread(target=_keepalive, daemon=True)
        try:
            # start() inside the try: if it raises (thread exhaustion),
            # the finally still releases the lock instead of leaking it
            beat.start()
            # grace: wait for claims without a committed segment (an
            # in-flight writer between mkdir and rename) to resolve
            deadline = time.monotonic() + grace_s
            while time.monotonic() < deadline:
                committed = {s for s, _, _ in self._segments()}
                if not (self._claim_seqs() - committed):
                    break
                time.sleep(0.02)
            old = self._segments()
            resolved = self.scan()
            new = self._commit_segment(
                "upsert", lambda d: resolved.write_parquet(
                    d, min_rows_per_file=64_000), ignore_lock=True)
            for _, _, path in old:
                shutil.rmtree(path, ignore_errors=True)
            new_seq = int(os.path.basename(new).split("-")[1])
            now = time.time()
            for name in os.listdir(self.root):
                if ".tmp-" in name:
                    # sweep only STALE tmp dirs (crashed writers): a
                    # fresh tmp belongs to an in-flight writer parked on
                    # our lock — deleting it would destroy its staged
                    # segment and spin its rename loop
                    path = os.path.join(self.root, name)
                    try:
                        if now - os.path.getmtime(path) > self._LOCK_STALE_S:
                            shutil.rmtree(path, ignore_errors=True)
                    except OSError:
                        pass
                elif name.startswith(".claim-"):
                    # claims below the new seq can never be re-claimed
                    # (_next_seq only grows past it, and the lock stops
                    # pre-lock claimants from renaming under us) —
                    # sweep them; the newest claim stays (it IS `new`'s)
                    try:
                        if int(name.split("-", 1)[1]) < new_seq:
                            os.rmdir(os.path.join(self.root, name))
                    except (ValueError, OSError):
                        pass
            return new
        finally:
            stop.set()
            if beat.ident is not None:  # join() raises on unstarted threads
                beat.join(timeout=1.0)
            try:
                os.rmdir(self._lock_path())
            except OSError:
                pass


def _has_parquet(path: str) -> bool:
    return any(f.endswith(".parquet") for f in os.listdir(path))


def _conform_batch(t: pa.Table) -> pa.Table:
    """Project/cast an ingest batch onto the interaction schema (missing
    columns become nulls — the reference's nullable columns)."""
    cols = {}
    for field in INTERACTION_FIELDS:
        if field.name in t.column_names:
            cols[field.name] = t.column(field.name).cast(field.type)
        else:
            cols[field.name] = pa.nulls(t.num_rows, field.type)
    return pa.table(cols)


def _stamp(seq: int, op: str):
    def inner(t: pa.Table) -> pa.Table:
        if op == "delete":  # widen tombstones to the full schema
            t = _conform_batch(t)
        return (t.append_column("_seq", pa.array(
                    np.full(t.num_rows, seq, dtype=np.int64)))
                 .append_column("_op", pa.array([op] * t.num_rows,
                                                type=pa.string())))
    return inner


def _last_of_run_mask(ids: np.ndarray) -> np.ndarray:
    n = len(ids)
    last_of_run = np.ones(n, dtype=bool)
    last_of_run[:-1] = ids[:-1] != ids[1:]
    return last_of_run


def _resolve_last_wins(log: Dataset) -> Dataset:
    """sort(id, _seq) → vectorized take-last-of-run per block; boundary
    runs re-resolved driver-side (O(blocks) rows). Arrow end-to-end —
    both the per-block combine and the driver fixup emit Arrow blocks,
    so nullable int64 columns (processingTime) never ride through a
    pandas object/float promotion and every block carries ONE schema."""
    import pyarrow.compute as pc

    srt = log.sort(["id", "_seq"])

    def block_last(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("_edge", pa.array([], type=pa.bool_()))
        ids = t.column("id").to_numpy(zero_copy_only=False)
        keep = _last_of_run_mask(ids)
        keep[0] = keep[-1] = True  # boundary candidates ride along raw
        out = t.take(pa.array(np.flatnonzero(keep)))
        oid = out.column("id").to_numpy(zero_copy_only=False)
        edge = (oid == ids[0]) | (oid == ids[-1])
        return out.append_column("_edge", pa.array(edge))

    from ..traverse import drop_empty_blocks as _deb

    # drop empty sorted partitions: they bypass kernels and ride
    # downstream as schema-less blocks (dedup._bucket_verify note)
    partial = _deb(srt.map_batches(block_last, batch_format="pyarrow"))

    import pyarrow.compute as pc

    def pick_interior(t: pa.Table) -> pa.Table:
        # both filters + the projection in ONE kernel — chained
        # Filter->Project leaves empty filter results unprojected
        # (traverse.filter_select), so the marker columns would survive
        # on 0-row blocks and block schemas would disagree
        keep = pc.and_(pc.equal(t.column("_edge"), False),
                       pc.equal(t.column("_op"), "upsert"))
        return t.filter(keep).drop_columns(["_edge", "_seq", "_op"])

    interior = partial.map_batches(pick_interior, batch_format="pyarrow")
    from ..traverse import gather_table

    edge_t = gather_table(partial.filter(expr="_edge == True"))
    if not edge_t.num_rows:
        return interior
    # the same take-last-of-run, now over the globally re-sorted edge
    # fragments (sort_indices is stable, matching the distributed sort)
    order = pc.sort_indices(edge_t, sort_keys=[("id", "ascending"),
                                               ("_seq", "ascending")])
    edge_t = edge_t.take(order)
    ids = edge_t.column("id").to_numpy(zero_copy_only=False)
    fixed = edge_t.take(pa.array(np.flatnonzero(_last_of_run_mask(ids))))
    fixed = fixed.filter(pc.equal(fixed.column("_op"), "upsert")).drop_columns(
        ["_edge", "_seq", "_op"])
    if not fixed.num_rows:
        return interior
    return interior.union(rd.from_arrow(fixed))


class VersionStore:
    """The reference's ``versions`` model (app.py:88-94: version PK,
    file_path, description, created_at — one row per optimized-model
    artifact, written at app.py:629) as an append-only JSON-part log.
    Last write per version wins (re-registering a version updates it,
    mirroring SQLAlchemy merge semantics)."""

    def __init__(self, root: str) -> None:
        self._log = SavedDataStore(root)

    def register(self, version: str, file_path: str,
                 description: str = "", created_at: str | None = None) -> str:
        return self._log.save({"version": version, "file_path": file_path,
                               "description": description,
                               "created_at": created_at})

    def get(self, version: str) -> dict | None:
        hit = None
        for row in self._log.load():      # save order == write order
            if row.get("version") == version:
                hit = row
        return hit

    def list_versions(self) -> list[dict]:
        latest: dict[str, dict] = {}
        for row in self._log.load():
            latest[row.get("version")] = row
        return sorted(latest.values(), key=lambda r: r.get("version") or "")


class SavedDataStore:
    """S7: the saved_data.json append channel (app.py:253-276) as an
    append-only JSON-part log — same content as the reference's growing
    array, but each save is its own immutable part (atomic tmp→rename),
    so concurrent writers never rewrite shared state."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def save(self, data: dict) -> str:
        # part name = counter + random suffix: two concurrent writers
        # that observe the same count produce DISTINCT files instead of
        # the second rename silently clobbering the first; load order
        # stays name-sorted (counter first), ties ordered by suffix
        n = len([f for f in os.listdir(self.root) if f.endswith(".json")])
        final = os.path.join(self.root,
                             f"part-{n:06d}-{uuid.uuid4().hex[:8]}.json")
        tmp = f"{final}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(data, f, ensure_ascii=False, indent=2)
        os.rename(tmp, final)
        return final

    def load(self) -> list[dict]:
        """All saved records in save order (the reference returns the
        whole array; bounded by what was explicitly saved)."""
        out = []
        for name in sorted(os.listdir(self.root)):
            if name.endswith(".json"):
                with open(os.path.join(self.root, name),
                          encoding="utf-8") as f:
                    out.append(json.load(f))
        return out

    def load_dataset(self) -> Dataset:
        """The same records as a Dataset (distributed read)."""
        return rd.read_json(self.root)
