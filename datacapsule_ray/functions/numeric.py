"""Numeric trait parsing (M12-M14) — pure functions mirroring the
reference's regex semantics line by line:

- body-length text extraction: tools/entity_extraction_db.py:139-164
- habit numeric traits (depth/temperature/egg count): :203-297
- feature numeric traits (body length/weight, unit normalization): :299-378

Range values take the midpoint; '万' multiplies by 10,000; units are
normalized cm/m → 厘米/米 and g/kg → 克/千克, exactly as the reference.
"""

from __future__ import annotations

import re

from ..schema import NUM_INVALID

# 7 body-length patterns (entity_extraction_db.py:149-157); first match wins,
# returning the raw range string (group 1), e.g. "40-60".
_NUM_RANGE = r"(\d+(?:[.．]\d+)?(?:\s*[-－~～至]\s*\d+(?:[.．]\d+)?)?)"
BODY_LENGTH_PATTERNS = [
    re.compile(p)
    for p in (
        rf"体长(?:为)?{_NUM_RANGE}\s*(?:厘米|cm|CM)",
        rf"体长(?:为)?约{_NUM_RANGE}\s*(?:厘米|cm|CM)",
        rf"全长(?:为)?{_NUM_RANGE}\s*(?:厘米|cm|CM)",
        rf"全长(?:为)?约{_NUM_RANGE}\s*(?:厘米|cm|CM)",
        rf"全长可达{_NUM_RANGE}\s*(?:米|m|M)",
        rf"体长约{_NUM_RANGE}\s*(?:厘米|cm|CM)",
        rf"全长约{_NUM_RANGE}\s*(?:厘米|cm|CM)",
    )
]

_VAL = r"(\d+(?:\.\d+)?(?:\s*[-~]\s*\d+(?:\.\d+)?)?)"
RE_DEPTH = re.compile(rf"{_VAL}\s*(米|m)")
RE_TEMP = re.compile(rf"{_VAL}\s*(°C|℃)")
RE_EGG = re.compile(rf"(\d+(?:\.\d+)?(?:\s*[-~]\s*\d+(?:\.\d+)?)?万?\s*)(粒|个)")
RE_LENGTH = re.compile(rf"{_VAL}\s*(厘米|cm|CM|米|m)")
RE_WEIGHT = re.compile(rf"{_VAL}\s*(克|g|千克|kg)")


def extract_body_length_text(text: str) -> str | None:
    """Raw body-length range string for species.body_length
    (entity_extraction_db.py:139-164)."""
    for pat in BODY_LENGTH_PATTERNS:
        m = pat.search(text)
        if m:
            return m.group(1)
    return None


def _range_midpoint(value_str: str) -> float:
    """Range 'a-b'/'a~b' → midpoint, else float (entity_extraction_db.py:225-232)."""
    if "-" in value_str or "~" in value_str:
        parts = re.split(r"[-~]", value_str)
        try:
            return (float(parts[0].strip()) + float(parts[1].strip())) / 2
        except (ValueError, IndexError):
            return float(parts[0].strip())
    return float(value_str)


def parse_depth(part: str) -> tuple[float, str] | None:
    if not part or part in NUM_INVALID:
        return None
    m = RE_DEPTH.search(part)
    if not m:
        return None
    return _range_midpoint(m.group(1)), m.group(2)


def parse_temperature(part: str) -> tuple[float, str] | None:
    if not part or part in NUM_INVALID:
        return None
    m = RE_TEMP.search(part)
    if not m:
        return None
    return _range_midpoint(m.group(1)), m.group(2)


def parse_egg_count(part: str) -> tuple[float, str] | None:
    """'万' multiplies by 10,000 after midpoint (entity_extraction_db.py:263-286)."""
    if not part or part in NUM_INVALID:
        return None
    m = RE_EGG.search(part)
    if not m:
        return None
    value_str, unit = m.group(1), m.group(2)
    multiplier = 10000 if "万" in value_str else 1
    value_str = value_str.replace("万", "").strip()
    return _range_midpoint(value_str) * multiplier, unit


def parse_body_length(part: str) -> tuple[float, str] | None:
    """Unit-normalizing body length (entity_extraction_db.py:313-339)."""
    if not part or part in NUM_INVALID:
        return None
    m = RE_LENGTH.search(part)
    if not m:
        return None
    unit = m.group(2)
    unit = "厘米" if unit.lower() in ("cm", "厘米") else ("米" if unit.lower() in ("m", "米") else unit)
    return _range_midpoint(m.group(1)), unit


def parse_body_weight(part: str) -> tuple[float, str] | None:
    """Unit-normalizing body weight (entity_extraction_db.py:342-367)."""
    if not part or part in NUM_INVALID:
        return None
    m = RE_WEIGHT.search(part)
    if not m:
        return None
    unit = m.group(2)
    unit = "克" if unit.lower() in ("g", "克") else ("千克" if unit.lower() in ("kg", "千克") else unit)
    return _range_midpoint(m.group(1)), unit
