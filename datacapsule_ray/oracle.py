"""Sequential conformance oracle (SURVEY.md §5, FIXTURES.md §2-4).

A direct, per-document reimplementation of the reference flow:
- graph path: tools/entity_extraction.py:78-249 (M1-M11 triple grammar,
  NetworkX add_node/add_edge dedup semantics)
- DB path:    tools/entity_extraction_db.py:395-498 (star schema, M12-M16)

It shares only the deterministic splitters / numeric parsers (the modeled
LLM) with the pipeline; the engine semantics under test — emission order,
guards, fallback, dedup, node-attr merge — are implemented here with plain
dicts/sets exactly as NetworkX would, independently of the Ray stages.

Extension over the reference (north rule): location mentions are
canonicalized through the alias/synonym dictionary at construction time;
the pipeline's linker actor applies the same dictionary.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .fixtures import alias_table
from .functions import numeric as num
from .functions import splitters as sp
from .schema import LOC_INVALID, PART_GUARDS, TAXONOMY_LEVELS, species_id_of


@dataclass
class OracleGraph:
    # node_id -> (node_type, name, attrs, prio, seq); first-wins with
    # species-priority (SURVEY.md §7.4 merge rule)
    nodes: dict[str, tuple] = field(default_factory=dict)
    edges: dict[tuple[str, str, str], int] = field(default_factory=dict)  # -> dup count
    triples: list[tuple] = field(default_factory=list)  # (subj,pred,obj,subj_type,obj_type,doc_id)
    species_rows: list[dict] = field(default_factory=list)
    distribution_rows: list[dict] = field(default_factory=list)
    trait_rows: list[dict] = field(default_factory=list)
    description_rows: list[dict] = field(default_factory=list)
    _seq: int = 0

    def add_node(self, node_id: str, node_type: str, name: str | None = None,
                 attrs: dict | None = None, prio: int = 1) -> None:
        self._seq += 1
        cur = self.nodes.get(node_id)
        cand = (node_type, name, attrs or {}, prio, self._seq)
        if cur is None or (prio, self._seq) < (cur[3], cur[4]):
            self.nodes[node_id] = cand

    def add_edge(self, src: str, rel: str, dst: str, src_type: str,
                 dst_type: str, doc_id: str) -> None:
        self.triples.append((src, rel, dst, src_type, dst_type, doc_id))
        self.edges[(src, rel, dst)] = self.edges.get((src, rel, dst), 0) + 1


def build_oracle(records: list[dict[str, str]], doc_ids: list[str]) -> OracleGraph:
    aliases = alias_table()
    g = OracleGraph()

    for doc_id, rec in zip(doc_ids, records):
        entity_id = rec["中文学名"]

        # M1 species node (entity_extraction.py:93-98)
        naming_year = rec.get("命名年份", "未知")
        author = rec.get("作者", "未知")
        g.add_node(entity_id, "种", None, {
            "中文学名": rec["中文学名"],
            "拉丁学名": rec["拉丁学名"],
            "命名年份": naming_year,
            "作者": rec.get("作者", ""),
        }, prio=0)

        # M2 year/author/latin typed nodes (entity_extraction.py:100-111)
        year_node = f"年份_{naming_year}"
        g.add_node(year_node, "命名年份", naming_year)
        g.add_edge(entity_id, "命名于", year_node, "种", "命名年份", doc_id)
        author_node = f"作者_{author}"
        g.add_node(author_node, "作者", author)
        g.add_edge(entity_id, "作者为", author_node, "种", "作者", doc_id)
        latin = rec["拉丁学名"]
        latin_node = f"拉丁学名_{latin}"
        g.add_node(latin_node, "拉丁学名", latin)
        g.add_edge(entity_id, "拉丁学名", latin_node, "种", "拉丁学名", doc_id)

        # M3 taxonomy chain (entity_extraction.py:113-133)
        for i, level in enumerate(TAXONOMY_LEVELS):
            value = rec[level]
            g.add_node(value, level, None)
            if i > 0:
                prev_level = TAXONOMY_LEVELS[i - 1]
                g.add_edge(rec[prev_level], "包含", value, prev_level, level, doc_id)
        g.add_edge(rec["属"], "包含", entity_id, "属", "种", doc_id)

        # M4-M6 distribution (entity_extraction.py:136-169)
        dist_text = rec["自然分布地"]
        try:
            locations = sp.split_locations(dist_text)
            for loc in locations:
                loc = aliases.get(loc, loc)  # A3 canonicalization
                if loc and loc.strip() and loc not in LOC_INVALID:
                    g.add_node(loc, "自然分布地", loc)
                    g.add_edge(entity_id, "分布于", loc, "种", "自然分布地", doc_id)
        except Exception:
            g.add_node(dist_text, "自然分布地", dist_text)
            g.add_edge(entity_id, "分布于", dist_text, "种", "自然分布地", doc_id)

        # M7-M8 habits (entity_extraction.py:172-205)
        habits_text = rec["生活习性"]
        try:
            parts = sp.split_habits(habits_text)
            for part, rel in ((parts.feeding, "食性为"),
                              (parts.reproduction, "繁殖特征"),
                              (parts.behavior, "行为特征")):
                if part and not any(gd in part for gd in PART_GUARDS):
                    g.add_node(part, "生活习性", part)
                    g.add_edge(entity_id, rel, part, "种", "生活习性", doc_id)
        except Exception:
            g.add_node(habits_text, "生活习性", habits_text)
            g.add_edge(entity_id, "生活习性", habits_text, "种", "生活习性", doc_id)

        # M9-M10 features (entity_extraction.py:209-249)
        feat_text = rec["生物特征"]
        try:
            parts = sp.split_features(feat_text)
            for part, rel in ((parts.body_shape, "体型为"),
                              (parts.body_color, "体色为"),
                              (parts.body_size, "体长为"),
                              (parts.special_features, "特殊特征")):
                if part and not any(gd in part for gd in PART_GUARDS):
                    g.add_node(part, "生物特征", part)
                    g.add_edge(entity_id, rel, part, "种", "生物特征", doc_id)
        except Exception:
            g.add_node(feat_text, "生物特征", feat_text)
            g.add_edge(entity_id, "生物特征", feat_text, "种", "生物特征", doc_id)

        # ---- DB path (entity_extraction_db.py:395-498) ----
        sid = species_id_of(doc_id)
        body_length = num.extract_body_length_text(feat_text)  # no fail guard: plain regex
        year_int: int | None
        try:
            year_int = int(naming_year) if rec.get("命名年份") is not None else None
        except (ValueError, TypeError):
            year_int = None
        g.species_rows.append({
            "species_id": sid,
            "latin_name": rec.get("拉丁学名", ""),
            "naming_year": year_int,
            "author": rec.get("作者", ""),
            "chinese_name": rec.get("中文学名", ""),
            "kingdom": rec.get("界", ""),
            "phylum": rec.get("门", ""),
            "class": rec.get("纲", ""),
            "order_name": rec.get("目", ""),
            "family": rec.get("科", ""),
            "genus": rec.get("属", ""),
            "species_name": rec.get("种", ""),
            "body_length": body_length,
        })
        for desc_type in ("生活习性", "生物特征"):
            if desc_type in rec:
                g.description_rows.append({
                    "species_id": sid, "description_type": desc_type,
                    "content": rec[desc_type],
                })
        try:
            locs = [aliases.get(l, l) for l in sp.split_locations(dist_text)]
            locs = [l.strip() for l in locs if l and l.strip() and l not in LOC_INVALID]
        except Exception:
            locs = []  # _extract_locations swallows errors → [] (db.py:199-201)
        for loc in locs:
            g.distribution_rows.append({"species_id": sid, "location": loc})
        try:
            hp = sp.split_habits_numeric(habits_text)
            for part, trait_name, parser in (
                (hp.depth, "栖息水深", num.parse_depth),
                (hp.temperature, "适宜温度", num.parse_temperature),
                (hp.egg_count, "产卵量", num.parse_egg_count),
            ):
                r = parser(part)
                if r is not None:
                    g.trait_rows.append({
                        "species_id": sid, "trait_type": "生活习性",
                        "trait_name": trait_name, "value": r[0], "unit": r[1],
                    })
        except Exception:
            pass
        try:
            fp = sp.split_features_numeric(feat_text)
            for part, trait_name, parser in (
                (fp.body_length, "体长", num.parse_body_length),
                (fp.body_weight, "体重", num.parse_body_weight),
            ):
                r = parser(part)
                if r is not None:
                    g.trait_rows.append({
                        "species_id": sid, "trait_type": "生物特征",
                        "trait_name": trait_name, "value": r[0], "unit": r[1],
                    })
        except Exception:
            pass

    return g
