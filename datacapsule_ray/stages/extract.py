"""Span parsing + triple/node emission stages (M1-M11).

`parse_documents_batch` is a vectorized Arrow transform: interleaved
span sequences → flat record columns, with the original `spans` column
passed through untouched (the per-row invariant).

`GraphEmitter` is the actor-pool stage (A1 shape,
SURVEY.md §2.3) that re-expresses the reference's per-document loop
(tools/entity_extraction.py:78-249) as a batched flat-map: one input
record → ~10-20 emission rows (triples + node candidates). The field
splitters are pluggable backends (clients.py): "rules" = deterministic
regex contract (hermetic tests), "http" = batched OpenAI-compatible
LLM calls — one request per field per batch instead of the reference's
3 sequential calls per doc; both are built once per actor in __init__.

Per-field failures degrade to the reference's raw-text fallback triples
(M11, entity_extraction.py:163-169/199-205/243-249) inside the UDF —
errors become data, never task failures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import DOC_FIELDS, LOC_INVALID, PART_GUARDS, TAXONOMY_LEVELS

# emissions table: a tagged union of triple rows and node-candidate rows,
# so extraction is ONE pass over the input (no re-read per sink)
EMISSIONS_SCHEMA = pa.schema([
    ("kind", pa.string()),  # 'triple' | 'node'
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("doc_id", pa.string()),
    ("node_id", pa.string()),
    ("node_type", pa.string()),
    ("name", pa.string()),
    ("中文学名", pa.string()),
    ("拉丁学名", pa.string()),
    ("命名年份", pa.string()),
    ("作者", pa.string()),
    ("prio", pa.int32()),
    ("seq", pa.int64()),
])

_RECORD_FIELDS = list(DOC_FIELDS)


def parse_documents_batch(batch: pa.Table) -> pa.Table:
    """Vectorized span→record parse (zero row-wise Python on the hot path).

    Flattens the list<struct> spans column, splits 'field：value' text spans
    on the first '：', and scatters values back to per-document columns via
    numpy. Media spans contribute nothing; `spans` passes through unchanged.
    """
    import pyarrow.compute as pc

    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = len(batch)
    # a NULL spans list (legal — the column is nullable) has length
    # None → float64 NaN, which crashes np.repeat; treat as zero spans
    # so the malformed doc degrades to all-None fields (errors become
    # data, never task failures)
    lengths = np.nan_to_num(
        spans.value_lengths().to_numpy(zero_copy_only=False),
        nan=0.0).astype(np.int64)
    parent = np.repeat(np.arange(n), lengths)

    flat = spans.flatten()  # struct array of all spans
    is_text = pc.equal(flat.field("kind"), "text").to_numpy(zero_copy_only=False)

    # split 'field：value' on the first '：' with one vectorized kernel.
    # Null span text (legal per SPAN_STRUCT; media spans may encode it
    # as null instead of "") must become "" first: a null split yields a
    # null list whose length is None, which both poisons the boolean
    # mask (None & bool raises) and NaN-corrupts the cumsum value index.
    parts = pc.split_pattern(pc.fill_null(flat.field("text"), ""),
                             "：", max_splits=1)
    has_value = pc.equal(pc.list_value_length(parts), 2).to_numpy(zero_copy_only=False)
    field_arr = pc.list_element(parts, 0)
    # list_element(_, 1) errors on short lists; the value of a length-2
    # split sits at flat offset cumsum(len)-1 — taken per field below so
    # only SELECTED values ever cross into Python (no full to_pylist of
    # every span token)
    flat_vals = parts.flatten()
    val_idx = np.cumsum(pc.list_value_length(parts).to_numpy(zero_copy_only=False)) - 1

    out_cols: dict[str, np.ndarray] = {
        f: np.full(n, None, dtype=object) for f in _RECORD_FIELDS
    }
    usable = is_text & has_value
    for f in _RECORD_FIELDS:
        eq = pc.fill_null(pc.equal(field_arr, f), False).to_numpy(zero_copy_only=False)
        sel = np.nonzero(usable & eq)[0]
        if len(sel) == 0:
            continue
        docs, first = np.unique(parent[sel], return_index=True)  # first span wins
        vals = flat_vals.take(pa.array(val_idx[sel[first]])).to_pylist()
        out_cols[f][docs] = np.asarray(vals, dtype=object)

    doc_ids = batch.column("doc_id").to_pylist()
    # doc_num is the node-merge tiebreak and feeds checkpoint content
    # hashes, so the non-numeric fallback must be a STABLE hash (Python's
    # str hash is salted per process — it would differ across Ray workers
    # / retries). Mirrors schema.species_id_of; both branches cap below
    # 2^40 so seq = doc_num*64 + k stays within the 15-digit rank prefix
    # in stages/graph._local_node_best.
    import hashlib as _hl

    def _num(d: str) -> int:
        tail = d.rsplit("-", 1)[-1]
        if tail.isdigit():
            return int(tail) % (1 << 40)
        return int.from_bytes(_hl.sha1(d.encode("utf-8")).digest()[:5], "big")

    doc_num = np.array([_num(d) for d in doc_ids], dtype=np.int64)
    cols: dict[str, object] = {"doc_id": batch.column("doc_id"), "doc_num": pa.array(doc_num)}
    for f in _RECORD_FIELDS:
        cols[f] = pa.array(out_cols[f], type=pa.string())
    cols["spans"] = spans  # pass-through invariant
    return pa.table(cols)


def make_parse_and_checkpoint(records_tmp_dir: str):
    """Fused parse stage (stateless task pool) that side-writes the
    records checkpoint while streaming parsed batches onward — one
    execution produces both the records table (spans pass-through,
    star-schema input) and feeds the emitter, instead of a write +
    read-back round trip.

    Idempotent under task retry: the output file name derives from the
    batch's first doc_id + row count, so a retried task overwrites its
    own file rather than duplicating rows."""

    def parse_and_checkpoint(batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        rec = parse_documents_batch(batch)
        if len(rec):
            os.makedirs(records_tmp_dir, exist_ok=True)
            first = rec.column("doc_id")[0].as_py()
            path = os.path.join(records_tmp_dir, f"{first}-{len(rec)}.parquet")
            pq.write_table(rec, path + ".inprogress")
            os.replace(path + ".inprogress", path)
        return rec

    return parse_and_checkpoint


class GraphEmitter:
    """Actor-pool stage: record batch → emissions batch (triples + nodes).

    State (splitter setup / compiled regexes — or an LLM client in
    production) is built once per actor in __init__ (A1,
    tools/entity_extraction.py:50-66)."""

    # emission buffer column order
    _COLS = [f.name for f in EMISSIONS_SCHEMA]

    def __init__(self, splitter: str = "rules",
                 client_config: dict | None = None) -> None:
        # backend built once per actor: compiled regexes for "rules", an
        # HTTP client (clients.OpenAICompatClient) for "http" — the spot
        # where the reference sets up its DSPy LM
        # (tools/entity_extraction.py:50-66)
        from ..clients import make_splitter_backend

        self.backend = make_splitter_backend(splitter, client_config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        buf: dict[str, list] = {c: [] for c in self._COLS}

        def emit_triple(subj, pred, obj, st, ot, doc_id):
            buf["kind"].append("triple")
            buf["subj"].append(subj); buf["pred"].append(pred); buf["obj"].append(obj)
            buf["subj_type"].append(st); buf["obj_type"].append(ot)
            buf["doc_id"].append(doc_id)
            for c in ("node_id", "node_type", "name", "中文学名", "拉丁学名", "命名年份", "作者"):
                buf[c].append(None)
            buf["prio"].append(None); buf["seq"].append(None)

        def emit_node(node_id, node_type, name, attrs, prio, seq):
            buf["kind"].append("node")
            for c in ("subj", "pred", "obj", "subj_type", "obj_type", "doc_id"):
                buf[c].append(None)
            buf["node_id"].append(node_id); buf["node_type"].append(node_type)
            buf["name"].append(name)
            a = attrs or {}
            buf["中文学名"].append(a.get("中文学名"))
            buf["拉丁学名"].append(a.get("拉丁学名"))
            buf["命名年份"].append(a.get("命名年份"))
            buf["作者"].append(a.get("作者"))
            buf["prio"].append(prio); buf["seq"].append(seq)

        cols = {name: batch.column(name).to_pylist() for name in
                ["doc_id", "doc_num", "中文学名", "拉丁学名", "命名年份", "作者",
                 "界", "门", "纲", "目", "科", "属",
                 "自然分布地", "生活习性", "生物特征"]}

        # splits are batched through the backend BEFORE the emission
        # loop: for the HTTP backend this is one request per field per
        # batch (vs the reference's 3 sequential LLM calls per doc);
        # failed items come back as Exception values and hit the M11
        # fallback per document below
        dist_res = self.backend.split_locations_batch(cols["自然分布地"])
        habit_res = self.backend.split_habits_batch(cols["生活习性"])
        feat_res = self.backend.split_features_batch(cols["生物特征"])

        for r in range(len(batch)):
            doc_id = cols["doc_id"][r]
            base_seq = cols["doc_num"][r] * 64  # deterministic global emission order
            k = 0

            def nseq():
                nonlocal k
                k += 1
                return base_seq + k

            entity_id = cols["中文学名"][r]
            if entity_id is None:
                continue  # malformed doc: no primary key (reference would KeyError)
            latin = cols["拉丁学名"][r] or ""
            naming_year = cols["命名年份"][r] if cols["命名年份"][r] is not None else "未知"
            author = cols["作者"][r] if cols["作者"][r] is not None else "未知"

            # M1 species node
            emit_node(entity_id, "种", None, {
                "中文学名": entity_id, "拉丁学名": latin,
                "命名年份": naming_year,
                "作者": cols["作者"][r] if cols["作者"][r] is not None else "",
            }, 0, nseq())
            # M2 typed value nodes + edges
            for node_id, name, ntype, rel in (
                (f"年份_{naming_year}", naming_year, "命名年份", "命名于"),
                (f"作者_{author}", author, "作者", "作者为"),
                (f"拉丁学名_{latin}", latin, "拉丁学名", "拉丁学名"),
            ):
                emit_node(node_id, ntype, name, None, 1, nseq())
                emit_triple(entity_id, rel, node_id, "种", ntype, doc_id)
            # M3 taxonomy chain
            prev_val = None
            for i, level in enumerate(TAXONOMY_LEVELS):
                value = cols[level][r]
                if value is None:
                    continue
                emit_node(value, level, None, None, 1, nseq())
                if i > 0 and prev_val is not None:
                    emit_triple(prev_val, "包含", value, TAXONOMY_LEVELS[i - 1], level, doc_id)
                prev_val = value
            genus = cols["属"][r]
            if genus is not None:
                emit_triple(genus, "包含", entity_id, "属", "种", doc_id)

            # M4-M6 distribution (+M11 fallback)
            dist_text = cols["自然分布地"][r]
            if dist_text is not None:
                locs = dist_res[r]
                if isinstance(locs, Exception):
                    emit_node(dist_text, "自然分布地", dist_text, None, 1, nseq())
                    emit_triple(entity_id, "分布于", dist_text, "种", "自然分布地", doc_id)
                else:
                    for loc in locs:
                        if loc and loc.strip() and loc not in LOC_INVALID:
                            emit_node(loc, "自然分布地", loc, None, 1, nseq())
                            emit_triple(entity_id, "分布于", loc, "种", "自然分布地", doc_id)

            # M7-M8 habits (+M11 fallback)
            habits_text = cols["生活习性"][r]
            if habits_text is not None:
                parts = habit_res[r]
                if isinstance(parts, Exception):
                    emit_node(habits_text, "生活习性", habits_text, None, 1, nseq())
                    emit_triple(entity_id, "生活习性", habits_text, "种", "生活习性", doc_id)
                else:
                    for part, rel in ((parts.feeding, "食性为"),
                                      (parts.reproduction, "繁殖特征"),
                                      (parts.behavior, "行为特征")):
                        if part and not any(g in part for g in PART_GUARDS):
                            emit_node(part, "生活习性", part, None, 1, nseq())
                            emit_triple(entity_id, rel, part, "种", "生活习性", doc_id)

            # M9-M10 features (+M11 fallback)
            feat_text = cols["生物特征"][r]
            if feat_text is not None:
                parts = feat_res[r]
                if isinstance(parts, Exception):
                    emit_node(feat_text, "生物特征", feat_text, None, 1, nseq())
                    emit_triple(entity_id, "生物特征", feat_text, "种", "生物特征", doc_id)
                else:
                    for part, rel in ((parts.body_shape, "体型为"),
                                      (parts.body_color, "体色为"),
                                      (parts.body_size, "体长为"),
                                      (parts.special_features, "特殊特征")):
                        if part and not any(g in part for g in PART_GUARDS):
                            emit_node(part, "生物特征", part, None, 1, nseq())
                            emit_triple(entity_id, rel, part, "种", "生物特征", doc_id)

        return pa.Table.from_pydict(buf, schema=EMISSIONS_SCHEMA)
