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


def ingest_reference_json(json_path: str, out_dir: str,
                          docs_per_file: int = 2000) -> list[str]:
    """Ingest a reference-format corpus (a JSON array of flat
    per-organism field dicts — the shape of the reference's
    docs/demo_18.json / demo130.json) into the interleaved-span
    documents table this engine consumes, sharded for partition-level
    checkpointing. Lets a user of the reference point their existing
    corpus files at this pipeline unchanged.

    Fields are encoded as ordered text spans "<field>：<value>" in the
    canonical span order (schema.DOC_FIELDS); unknown fields are
    dropped, values are str-coerced, and doc_ids carry a numeric suffix
    ("ref-<i>") so the merge tiebreak stays deterministic. Returns the
    shard file paths (same contract as fixtures.write_corpus)."""
    import json
    import os

    import pyarrow as pa

    from ..schema import DOC_FIELDS, DOCUMENTS_SCHEMA

    with open(json_path, encoding="utf-8") as f:
        recs = json.load(f)
    if not isinstance(recs, list):
        raise ValueError("expected a JSON array of record objects")
    doc_ids, spans_col = [], []
    for i, rec in enumerate(recs):
        spans = []
        offset = 0
        for field in DOC_FIELDS:
            if field not in rec or rec[field] is None:
                continue
            text = f"{field}：{rec[field]}"
            spans.append({"kind": "text", "text": text,
                          "media_ref": "", "offset": offset})
            offset += len(text) + 1
        doc_ids.append(f"ref-{i:08d}")
        spans_col.append(spans)
    table = pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans_col},
                                 schema=DOCUMENTS_SCHEMA)
    os.makedirs(out_dir, exist_ok=True)
    files = []
    for k in range(0, len(doc_ids), docs_per_file):
        shard = table.slice(k, docs_per_file)
        # ALWAYS parquet: the return contract is fixtures.write_corpus's
        # (shard paths the partition runner reads with rd.read_parquet),
        # so a lance-formatted shard here would be unreadable downstream.
        # The format-switching pair is read_table/write_table above.
        fp = os.path.join(out_dir, f"part-{k // docs_per_file:05d}.parquet")
        import pyarrow.parquet as pq

        pq.write_table(shard, fp)
        files.append(fp)
    return files
