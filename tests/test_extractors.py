"""Unit tests per operator (SURVEY.md §5.1): splitters, guard strings,
numeric regexes (midpoint, 万-multiplier, unit normalization), body-length
text patterns, and the year coercion."""

import pytest

from datacapsule_ray.functions import numeric as num
from datacapsule_ray.functions import splitters as sp
from datacapsule_ray.schema import FAIL_TOKEN


# --- M5/M6 location split + guards -----------------------------------------

def test_split_locations_mixed_delims():
    assert sp.split_locations("东海、黄海，渤海,南太平洋") == ["东海", "黄海", "渤海", "南太平洋"]


def test_split_locations_conjunction_stripped():
    assert sp.split_locations("东海，以及黄海") == ["东海", "黄海"]


def test_split_locations_fail_token_raises():
    with pytest.raises(ValueError):
        sp.split_locations(FAIL_TOKEN + "东海")


# --- M7-M10 habit/feature splitting ----------------------------------------

def test_split_habits():
    p = sp.split_habits("食性为肉食性。繁殖期产卵3-6万粒。具有群居行为。栖息水深200-600米。")
    assert p.feeding == "食性为肉食性"
    assert p.reproduction == "繁殖期产卵3-6万粒"
    assert p.behavior == "具有群居行为"


def test_split_habits_missing_parts_guarded():
    p = sp.split_habits("栖息水深200米。")
    assert p.feeding.startswith("无具体")
    assert p.reproduction.startswith("无具体")


def test_split_features():
    p = sp.split_features("体型侧扁。体色呈银白色。体长为40-60厘米。具有发光器官的特殊特征。")
    assert p.body_shape == "体型侧扁"
    assert p.body_color == "体色呈银白色"
    assert p.body_size == "体长为40-60厘米"
    assert p.special_features == "具有发光器官的特殊特征"


# --- M12 body-length patterns (entity_extraction_db.py:139-164) -------------

@pytest.mark.parametrize("text,want", [
    ("体长为40-60厘米", "40-60"),
    ("体长约50厘米", "50"),
    ("全长可达2米", "2"),
    ("全长约120厘米", "120"),
    ("体重5千克", None),
])
def test_extract_body_length_text(text, want):
    assert num.extract_body_length_text(text) == want


# --- M13/M14 numeric parsing -------------------------------------------------

def test_parse_depth_range_midpoint():
    assert num.parse_depth("栖息水深200-600米") == (400.0, "米")


def test_parse_temperature():
    assert num.parse_temperature("适宜温度8-14℃") == (11.0, "℃")


def test_parse_egg_count_wan_multiplier():
    value, unit = num.parse_egg_count("繁殖期产卵3-6万粒")
    assert value == 4.5 * 10000
    assert unit == "粒"


def test_parse_egg_count_plain():
    assert num.parse_egg_count("繁殖期产卵1200粒") == (1200.0, "粒")


def test_parse_body_length_unit_normalized():
    assert num.parse_body_length("体长为40-60厘米") == (50.0, "厘米")
    assert num.parse_body_length("全长可达2米") == (2.0, "米")


def test_parse_body_weight_units():
    assert num.parse_body_weight("体重3-5千克") == (4.0, "千克")
    assert num.parse_body_weight("体重500克") == (500.0, "克")


def test_guard_markers_rejected():
    assert num.parse_depth("无") is None
    assert num.parse_depth("未知") is None
    assert num.parse_egg_count("不明确") is None
