"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Emits the `documents` table per BASELINE.json input_hint:
    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

Text spans encode a reference-shaped organism record (the 14 fields of
/root/reference/docs/demo130.json) as "<field>：<value>"; media spans
interleave at deterministic positions and must pass through construction
byte-identical (the per-row invariant).

All randomness derives from (seed, doc index) — no wall clock, no global
RNG — so any shard can be regenerated independently (content-addressed).
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import DOCUMENTS_SCHEMA, FAIL_TOKEN

# --- value pools (all synthetic) -------------------------------------------

PHYLA = ["脊索动物门", "软体动物门"]
CLASSES = ["辐鳍鱼纲", "软骨鱼纲", "头足纲", "双壳纲"]
ORDERS = [f"合成{i:02d}目" for i in range(12)]
FAMILIES = [f"合成{i:02d}科" for i in range(36)]
GENERA = [f"合成{i:03d}属" for i in range(80)]
AUTHORS = [f"Author{i:02d}" for i in range(20)]

# canonical locations; index 0-2 are deliberately hot (Zipf head), mirroring
# the reference artifact's skew (台湾海域 degree 64 — BASELINE.md)
CANON_LOCATIONS = [
    "台湾海域", "日本南部海域", "中国南海", "东海", "黄海", "渤海",
    "南太平洋", "北太平洋", "印度洋", "大西洋西部", "珊瑚海", "白令海",
    "鄂霍次克海", "菲律宾海域", "马来群岛海域", "澳大利亚北部海域",
    "红海", "地中海", "加勒比海", "墨西哥湾", "秘鲁沿岸", "南极海域",
    "北冰洋边缘", "孟加拉湾", "阿拉伯海", "爪哇海", "苏禄海", "所罗门海域",
    "夏威夷海域", "加拉帕戈斯海域",
]

# alias surfaces → canonical (the construction-time alias/synonym dictionary
# the linker actor broadcasts; north-star extension of the reference's
# exact-string identity + query-time fuzzy link at dspy_inference.py:80)
def alias_table() -> dict[str, str]:
    aliases: dict[str, str] = {}
    for loc in CANON_LOCATIONS:
        aliases[loc + "附近"] = loc
        aliases[loc + "一带"] = loc
    aliases["台灣海域"] = "台湾海域"
    aliases["中國南海"] = "中国南海"
    return aliases


FEEDS = ["肉食性", "植食性", "杂食性", "滤食性"]
BEHAVIORS = ["群居", "洄游", "夜间活动", "底栖独居"]
SHAPES = ["侧扁", "纺锤形", "细长", "圆筒形"]
COLORS = ["银白色", "红褐色", "蓝黑色", "灰绿色"]
SPECIALS = ["发光器官", "毒刺", "吸盘", "电感受器"]


def _doc_record(seed: int, i: int) -> dict[str, str]:
    """The 14-field organism record for doc i (deterministic)."""
    rng = random.Random((seed << 20) ^ i)
    name = f"合成鱼{i:06d}"
    rec: dict[str, str] = {
        "中文学名": name,
        "拉丁学名": f"Synthetica piscis{i:06d}",
        "界": "动物界",  # hot key: appears in every record
        "门": PHYLA[i % len(PHYLA)],
        "纲": CLASSES[i % len(CLASSES)],
        "目": ORDERS[i % len(ORDERS)],
        "科": FAMILIES[i % len(FAMILIES)],
        "属": GENERA[i % len(GENERA)],
        "种": name + "种",
    }

    dirty = rng.random() < 0.10
    if not dirty:
        rec["命名年份"] = str(1758 + rng.randrange(260))
        rec["作者"] = rng.choice(AUTHORS)
    elif rng.random() < 0.5:
        rec["命名年份"] = "约十九世纪"  # non-numeric year → DB-path NULL (M15)
        # 作者 missing entirely → get() defaults

    # 自然分布地: Zipf-ish hot locations, mixed delimiters, alias surfaces,
    # occasional invalid markers (exercises M5/M6 guards)
    n_loc = 1 + rng.randrange(5)
    locs = []
    for _ in range(n_loc):
        z = rng.random()
        if z < 0.45:
            loc = CANON_LOCATIONS[rng.randrange(3)]  # hot head
        else:
            loc = CANON_LOCATIONS[rng.randrange(len(CANON_LOCATIONS))]
        if rng.random() < 0.15:  # alias surface
            loc = loc + ("附近" if rng.random() < 0.5 else "一带")
        locs.append(loc)
    if rng.random() < 0.08:
        locs.append("无信息")
    if rng.random() < 0.05:
        locs.append("不明确")
    parts = []
    for j, loc in enumerate(locs):
        if j > 0:
            parts.append(rng.choice(["、", "，", ","]))
            if j == len(locs) - 1 and rng.random() < 0.3:
                parts.append("以及")
        parts.append(loc)
    rec["自然分布地"] = "".join(parts)

    # 生活习性: labeled sentences; some parts omitted on dirty docs
    habit_sents = []
    if not dirty or rng.random() < 0.5:
        habit_sents.append(f"食性为{rng.choice(FEEDS)}")
    if rng.random() < 0.8:
        lo = 1 + rng.randrange(40)
        if rng.random() < 0.5:
            habit_sents.append(f"繁殖期产卵{lo}-{lo + rng.randrange(1, 60)}万粒")
        else:
            habit_sents.append(f"繁殖期产卵{lo * 100}粒")
    if rng.random() < 0.85:
        habit_sents.append(f"具有{rng.choice(BEHAVIORS)}行为")
    if rng.random() < 0.6:
        lo = 10 * (1 + rng.randrange(50))
        habit_sents.append(f"栖息水深{lo}-{lo + 10 * rng.randrange(1, 40)}米")
    if rng.random() < 0.4:
        lo = 4 + rng.randrange(20)
        habit_sents.append(f"适宜温度{lo}-{lo + rng.randrange(2, 10)}℃")
    rec["生活习性"] = "。".join(habit_sents) + "。" if habit_sents else "不明确"

    # 生物特征
    feat_sents = [f"体型{rng.choice(SHAPES)}", f"体色呈{rng.choice(COLORS)}"]
    r = rng.random()
    if r < 0.5:
        lo = 5 + rng.randrange(90)
        feat_sents.append(f"体长为{lo}-{lo + rng.randrange(5, 40)}厘米")
    elif r < 0.75:
        feat_sents.append(f"体长约{5 + rng.randrange(120)}厘米")
    elif r < 0.9:
        feat_sents.append(f"全长可达{1 + rng.randrange(4)}米")
    # else: no size sentence → "无具体体长信息" guard path
    if rng.random() < 0.7:
        feat_sents.append(f"具有{rng.choice(SPECIALS)}的特殊特征")
    if rng.random() < 0.3:
        lo = 1 + rng.randrange(20)
        if rng.random() < 0.5:
            feat_sents.append(f"体重{lo}-{lo + rng.randrange(1, 10)}千克")
        else:
            feat_sents.append(f"体重{lo * 50}克")
    rec["生物特征"] = "。".join(feat_sents) + "。"

    # ~2% poison one free-text field → per-field fallback path (M11)
    if rng.random() < 0.02:
        field = rng.choice(["自然分布地", "生活习性", "生物特征"])
        rec[field] = FAIL_TOKEN + rec[field]
    return rec


def _doc_spans(seed: int, i: int, rec: dict[str, str]) -> list[dict]:
    """Encode record fields as ordered text spans with interleaved media."""
    from .schema import DOC_FIELDS

    rng = random.Random((seed << 21) ^ (i * 2654435761))
    spans: list[dict] = []
    offset = 0
    media_idx = 0
    for field in DOC_FIELDS:
        if field not in rec:
            continue
        text = f"{field}：{rec[field]}"
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
        offset += len(text) + 1
        if rng.random() < 0.25:  # interleave a media span (no extractable content)
            kind = rng.choice(["image", "audio", "video"])
            spans.append({
                "kind": kind, "text": "",
                "media_ref": f"media://doc-{i:08d}/{media_idx}", "offset": offset,
            })
            offset += 1
            media_idx += 1
    return spans


def generate_documents(n_docs: int, seed: int = 42) -> pa.Table:
    """Build the interleaved documents table for docs [0, n_docs)."""
    return generate_documents_range(0, n_docs, seed)


def generate_documents_range(start: int, end: int, seed: int = 42) -> pa.Table:
    doc_ids, spans = [], []
    for i in range(start, end):
        rec = _doc_record(seed, i)
        doc_ids.append(f"doc-{i:08d}")
        spans.append(_doc_spans(seed, i, rec))
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans}, schema=DOCUMENTS_SCHEMA
    )


def records(n_docs: int, seed: int = 42) -> list[dict[str, str]]:
    """The underlying records (for the sequential oracle)."""
    return [_doc_record(seed, i) for i in range(n_docs)]


def write_corpus(path: str, n_docs: int, seed: int = 42, docs_per_file: int = 2000) -> list[str]:
    """Write the corpus as multiple parquet files (one per shard) so the
    pipeline has real partitions for checkpoint/resume tests.

    Shards are reused only when a ``_corpus.json`` marker records the
    same (seed, docs_per_file): a shard's CONTENT depends on both, but
    its filename encodes neither, so a bare exists-check would silently
    serve a stale corpus after a parameter change."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    marker = os.path.join(path, "_corpus.json")
    params = {"seed": int(seed), "docs_per_file": int(docs_per_file)}
    stale = True
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                stale = json.load(fh) != params
        except (OSError, ValueError):
            stale = True
    if stale:
        for old in os.listdir(path):
            if old.startswith("part-") and old.endswith(".parquet"):
                os.unlink(os.path.join(path, old))
        with open(marker + ".tmp", "w") as fh:
            json.dump(params, fh)
        os.replace(marker + ".tmp", marker)
    files = []
    for k, start in enumerate(range(0, n_docs, docs_per_file)):
        end = min(start + docs_per_file, n_docs)
        f = os.path.join(path, f"part-{k:05d}.parquet")
        # reuse iff the shard exists AND covers exactly [start, end) —
        # row count via metadata pages only. A short tail shard from a
        # smaller previous n_docs (grow), or a full shard where the new
        # tail is shorter (shrink), regenerates; everything else is
        # byte-identical by construction (same seed, dpf, range).
        if (not os.path.exists(f)
                or pq.read_metadata(f).num_rows != end - start):
            pq.write_table(generate_documents_range(start, end, seed), f)
        files.append(f)
    # a SHRUNK n_docs must not leave orphan higher-index shards: the
    # returned list is correct either way, but a directory-level reader
    # (glob / read_parquet on the dir) would silently see the old corpus
    n_shards = len(files)
    for name in os.listdir(path):
        if not (name.startswith("part-") and name.endswith(".parquet")):
            continue
        try:  # full stem, not a fixed 5-digit slice (f'{k:05d}' widens)
            idx = int(name[5:-len(".parquet")])
        except ValueError:
            continue
        if idx >= n_shards:
            os.unlink(os.path.join(path, name))
    return files
