"""Schemas + constants for the Ray-Data-native KG-construction engine.

Mirrors the reference's data model (see SURVEY.md §1):
- node-type hierarchy: /root/reference/react_tools.py:19-40
- document fields: /root/reference/docs/demo130.json (14 flat fields)
- star schema DDL: /root/reference/tools/entity_extraction_db.py:85-137
- vector tables: /root/reference/nanovector_db.py:49-67
"""

from __future__ import annotations

import pyarrow as pa

# --- node-type hierarchy (react_tools.py:19-40) -----------------------------
NODE_HIERARCHY: dict[str, int] = {
    "界": 1,
    "门": 2,
    "纲": 3,
    "目": 4,
    "科": 5,
    "属": 6,
    "种": 7,
    "中文学名": 7,
    "自然分布地": 8,
    "生活习性": 8,
    "生物特征": 8,
    "经济性": 8,
    "保护信息": 8,
    "食性": 8,
    "繁殖特征": 8,
    "行为特征": 8,
    "体型": 8,
    "体色": 8,
    "体长": 8,
    "特殊特征": 8,
    # typed value nodes emitted by the reference grammar
    # (tools/entity_extraction.py:100-111)
    "命名年份": 8,
    "作者": 8,
    "拉丁学名": 8,
}

# document fields, in canonical span order (demo130.json field set)
TAXONOMY_LEVELS = ["界", "门", "纲", "目", "科", "属"]  # 种 excluded: entity_extraction.py:114
DOC_FIELDS = [
    "中文学名", "拉丁学名", "命名年份", "作者",
    "界", "门", "纲", "目", "科", "属", "种",
    "自然分布地", "生活习性", "生物特征",
]

# guard markers (tools/entity_extraction.py:158,180,187,194,217,...)
LOC_INVALID = {"无信息", "不明确"}
PART_GUARDS = ("无具体", "不明确")  # substring guards for habit/feature parts
NUM_INVALID = {"无", "未知", "不明确"}  # numeric-extractor guards (entity_extraction_db.py:217,...)

# sentinel that makes the deterministic extractor raise, exercising the
# reference's per-field fallback path (tools/entity_extraction.py:163-169)
FAIL_TOKEN = "【EXTRACT_FAIL】"

# --- Arrow schemas ----------------------------------------------------------

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

TRIPLES_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("doc_id", pa.string()),
])

# node candidate rows (pre-merge); prio/seq define the deterministic merge
# order replacing NetworkX first-write idempotency (SURVEY.md §7.4)
NODE_CANDIDATES_SCHEMA = pa.schema([
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

NODES_SCHEMA = pa.schema([
    ("node_id", pa.string()),
    ("node_type", pa.string()),
    ("name", pa.string()),
    ("中文学名", pa.string()),
    ("拉丁学名", pa.string()),
    ("命名年份", pa.string()),
    ("作者", pa.string()),
])

EDGES_SCHEMA = pa.schema([
    ("src", pa.string()),
    ("rel", pa.string()),
    ("dst", pa.string()),
    ("n_dups", pa.int64()),
])

SPECIES_SCHEMA = pa.schema([
    ("species_id", pa.int64()),
    ("latin_name", pa.string()),
    ("naming_year", pa.int64()),
    ("author", pa.string()),
    ("chinese_name", pa.string()),
    ("kingdom", pa.string()),
    ("phylum", pa.string()),
    ("class", pa.string()),
    ("order_name", pa.string()),
    ("family", pa.string()),
    ("genus", pa.string()),
    ("species_name", pa.string()),
    ("body_length", pa.string()),
])

DISTRIBUTIONS_SCHEMA = pa.schema([
    ("species_id", pa.int64()),
    ("location", pa.string()),
])

NUMERICAL_TRAITS_SCHEMA = pa.schema([
    ("species_id", pa.int64()),
    ("trait_type", pa.string()),
    ("trait_name", pa.string()),
    ("value", pa.float64()),
    ("unit", pa.string()),
])

DESCRIPTIONS_SCHEMA = pa.schema([
    ("species_id", pa.int64()),
    ("description_type", pa.string()),
    ("content", pa.string()),
])

EMBED_DIM = 32  # test default; production 1024 (.env.example EMBEDDING_DIM)


def entity_vectors_schema(dim: int = EMBED_DIM) -> pa.Schema:
    return pa.schema([
        ("entity_id", pa.string()),
        ("entity_type", pa.string()),
        ("entity_name", pa.string()),
        ("embedding", pa.list_(pa.float32(), dim)),
    ])


def relation_vectors_schema(dim: int = EMBED_DIM) -> pa.Schema:
    return pa.schema([
        ("source_id", pa.string()),
        ("target_id", pa.string()),
        ("relation_type", pa.string()),
        ("embedding", pa.list_(pa.float32(), dim)),
    ])


def species_id_of(doc_id: str) -> int:
    """Deterministic 63-bit species id replacing SQLite lastrowid
    (tools/entity_extraction_db.py:436) so every stage is idempotent."""
    import hashlib

    h = hashlib.sha1(doc_id.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF
