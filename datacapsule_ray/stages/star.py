"""Star-schema materialization (the attribute/statistics recall channel).

Re-expresses tools/entity_extraction_db.py:380-517 as four column-pruned
``map_batches`` passes over the parsed-records checkpoint. ``species_id``
is a deterministic content hash of doc_id (schema.species_id_of),
replacing the serial ``cursor.lastrowid`` (entity_extraction_db.py:436) —
the only cross-row write dependency in the reference — so every partition
is independently re-runnable.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import numeric as num
from ..functions import splitters as sp
from ..schema import (
    DESCRIPTIONS_SCHEMA,
    DISTRIBUTIONS_SCHEMA,
    LOC_INVALID,
    NUMERICAL_TRAITS_SCHEMA,
    SPECIES_SCHEMA,
    species_id_of,
)

SPECIES_INPUT_COLS = ["doc_id", "中文学名", "拉丁学名", "命名年份", "作者",
                      "界", "门", "纲", "目", "科", "属", "种", "生物特征"]


def species_batch(batch: pa.Table) -> pa.Table:
    """species rows (entity_extraction_db.py:414-436, M15 year coercion)."""
    cols = {c: batch.column(c).to_pylist() for c in SPECIES_INPUT_COLS}
    out = {f.name: [] for f in SPECIES_SCHEMA}
    for r in range(len(batch)):
        year = cols["命名年份"][r]
        try:
            year_int = int(year) if year is not None else None
        except (ValueError, TypeError):
            year_int = None
        feat = cols["生物特征"][r]
        out["species_id"].append(species_id_of(cols["doc_id"][r]))
        out["latin_name"].append(cols["拉丁学名"][r] or "")
        out["naming_year"].append(year_int)
        out["author"].append(cols["作者"][r] or "")
        out["chinese_name"].append(cols["中文学名"][r] or "")
        out["kingdom"].append(cols["界"][r] or "")
        out["phylum"].append(cols["门"][r] or "")
        out["class"].append(cols["纲"][r] or "")
        out["order_name"].append(cols["目"][r] or "")
        out["family"].append(cols["科"][r] or "")
        out["genus"].append(cols["属"][r] or "")
        out["species_name"].append(cols["种"][r] or "")
        out["body_length"].append(num.extract_body_length_text(feat) if feat else None)
    return pa.Table.from_pydict(out, schema=SPECIES_SCHEMA)


class DistributionsEmitter:
    """Actor-pool stage: records → distribution rows, canonicalized through
    the broadcast alias dict (same A3 dictionary as the graph path)."""

    def __init__(self, alias_ref) -> None:
        import ray

        self.aliases: dict[str, str] = ray.get(alias_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("自然分布地").to_pylist()
        sids, locs = [], []
        for doc_id, text in zip(doc_ids, texts):
            if text is None:
                continue
            sid = species_id_of(doc_id)
            try:
                parts = sp.split_locations(text)
            except Exception:
                continue  # _extract_locations swallows errors → [] (db.py:199-201)
            for loc in parts:
                loc = self.aliases.get(loc, loc)
                if loc and loc.strip() and loc not in LOC_INVALID:
                    sids.append(sid)
                    locs.append(loc.strip())
        return pa.Table.from_pydict(
            {"species_id": sids, "location": locs}, schema=DISTRIBUTIONS_SCHEMA
        )


def traits_batch(batch: pa.Table) -> pa.Table:
    """numerical_traits rows (M13/M14, entity_extraction_db.py:460-498)."""
    doc_ids = batch.column("doc_id").to_pylist()
    habits = batch.column("生活习性").to_pylist()
    feats = batch.column("生物特征").to_pylist()
    out = {f.name: [] for f in NUMERICAL_TRAITS_SCHEMA}

    def add(sid, ttype, tname, value, unit):
        out["species_id"].append(sid)
        out["trait_type"].append(ttype)
        out["trait_name"].append(tname)
        out["value"].append(value)
        out["unit"].append(unit)

    for doc_id, habit, feat in zip(doc_ids, habits, feats):
        sid = species_id_of(doc_id)
        if habit is not None:
            try:
                hp = sp.split_habits_numeric(habit)
                for part, tname, parser in ((hp.depth, "栖息水深", num.parse_depth),
                                            (hp.temperature, "适宜温度", num.parse_temperature),
                                            (hp.egg_count, "产卵量", num.parse_egg_count)):
                    r = parser(part)
                    if r is not None:
                        add(sid, "生活习性", tname, r[0], r[1])
            except Exception:
                pass
        if feat is not None:
            try:
                fp = sp.split_features_numeric(feat)
                for part, tname, parser in ((fp.body_length, "体长", num.parse_body_length),
                                            (fp.body_weight, "体重", num.parse_body_weight)):
                    r = parser(part)
                    if r is not None:
                        add(sid, "生物特征", tname, r[0], r[1])
            except Exception:
                pass
    return pa.Table.from_pydict(out, schema=NUMERICAL_TRAITS_SCHEMA)


def descriptions_batch(batch: pa.Table) -> pa.Table:
    """descriptions rows (M16, entity_extraction_db.py:440-445)."""
    doc_ids = batch.column("doc_id").to_pylist()
    habits = batch.column("生活习性").to_pylist()
    feats = batch.column("生物特征").to_pylist()
    out = {f.name: [] for f in DESCRIPTIONS_SCHEMA}
    for doc_id, habit, feat in zip(doc_ids, habits, feats):
        sid = species_id_of(doc_id)
        for dtype, content in (("生活习性", habit), ("生物特征", feat)):
            if content is not None:
                out["species_id"].append(sid)
                out["description_type"].append(dtype)
                out["content"].append(content)
    return pa.Table.from_pydict(out, schema=DESCRIPTIONS_SCHEMA)
