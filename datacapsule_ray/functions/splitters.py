"""Deterministic field splitters — the rule-based stand-ins for the
reference's LLM span extractors.

The reference calls DSPy ``Predict`` modules to split the three free-text
fields (自然分布地 / 生活习性 / 生物特征) into parts
(tools/entity_extraction.py:7-25, tools/entity_extraction_db.py:9-27).
These functions implement the same *output contract* deterministically so
the conformance suite is hermetic; an LLM client can be slotted into the
same actor interface (stages/extract.py) without pipeline changes.

These splitters are shared by both the Ray pipeline and the sequential
oracle — they model the extractor, not the engine. The engine semantics
under test (triple grammar, guards, dedup/merge, numeric parsing) are
implemented independently in stages/ vs oracle.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..schema import FAIL_TOKEN

# location list splitting: the *intended* semantics of
# tools/entity_extraction.py:141-154 — the correct implementation at
# tools/entity_extraction_db.py:180-190 (split on both ',' and '，'; the
# graph-path's '，' re-split loop is a documented reference bug) — extended
# with the '、' enumerator and the '以及' conjunction our corpus uses.
_LOC_SPLIT = re.compile(r"[、，,]")
_LOC_PREFIX = re.compile(r"^(以及|及|和)")

_SENT_SPLIT = re.compile(r"[。；;]")


def _fail_guard(text: str) -> None:
    if FAIL_TOKEN in text:
        raise ValueError("extractor failure sentinel encountered")


def split_locations(text: str) -> list[str]:
    """自然分布地 text → location surface list (pre-guard-filter)."""
    _fail_guard(text)
    parts = [_LOC_PREFIX.sub("", p.strip()).strip() for p in _LOC_SPLIT.split(text)]
    return [p for p in parts if p]


def _sentences(text: str) -> list[str]:
    return [s.strip() for s in _SENT_SPLIT.split(text) if s.strip()]


def _first_with(sentences: list[str], keys: tuple[str, ...], default: str) -> str:
    for s in sentences:
        if any(k in s for k in keys):
            return s
    return default


@dataclass
class HabitParts:
    feeding: str
    reproduction: str
    behavior: str


def split_habits(text: str) -> HabitParts:
    """生活习性 text → feeding/reproduction/behavior parts
    (contract of ClassifyHabits, tools/entity_extraction.py:12-17)."""
    _fail_guard(text)
    sents = _sentences(text)
    return HabitParts(
        feeding=_first_with(sents, ("食性", "捕食", "摄食"), "无具体食性信息"),
        reproduction=_first_with(sents, ("繁殖", "产卵"), "无具体繁殖信息"),
        behavior=_first_with(sents, ("行为", "群居", "洄游", "独居"), "无具体行为特征"),
    )


@dataclass
class FeatureParts:
    body_shape: str
    body_color: str
    body_size: str
    special_features: str


def split_features(text: str) -> FeatureParts:
    """生物特征 text → shape/color/size/special parts
    (contract of ClassifyFeatures, tools/entity_extraction.py:19-25)."""
    _fail_guard(text)
    sents = _sentences(text)
    return FeatureParts(
        body_shape=_first_with(sents, ("体型",), "无具体体型信息"),
        body_color=_first_with(sents, ("体色",), "无具体体色信息"),
        body_size=_first_with(sents, ("体长", "全长"), "无具体体长信息"),
        special_features=_first_with(sents, ("特殊", "特征器官"), "无具体特殊特征"),
    )


@dataclass
class HabitNumericParts:
    depth: str
    temperature: str
    egg_count: str


def split_habits_numeric(text: str) -> HabitNumericParts:
    """生活习性 text → numeric-bearing parts (contract of the DB-path
    ClassifyHabits, tools/entity_extraction_db.py:14-20)."""
    _fail_guard(text)
    sents = _sentences(text)
    return HabitNumericParts(
        depth=_first_with(sents, ("水深",), "无"),
        temperature=_first_with(sents, ("温度", "水温"), "无"),
        egg_count=_first_with(sents, ("产卵",), "无"),
    )


@dataclass
class FeatureNumericParts:
    body_length: str
    body_weight: str


def split_features_numeric(text: str) -> FeatureNumericParts:
    """生物特征 text → numeric-bearing parts (contract of the DB-path
    ClassifyFeatures, tools/entity_extraction_db.py:22-27)."""
    _fail_guard(text)
    sents = _sentences(text)
    return FeatureNumericParts(
        body_length=_first_with(sents, ("体长", "全长"), "无"),
        body_weight=_first_with(sents, ("体重",), "无"),
    )
