"""Property-based tests (hypothesis) for the deterministic extractors and
sketches — inputs beyond what the seeded corpus generator produces."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datacapsule_ray.functions import dedup, numeric, splitters as sp

loc_name = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Lo"),
                           blacklist_characters="、，,以及"),
    min_size=1, max_size=8).map(str.strip).filter(bool)


@given(st.lists(loc_name, min_size=1, max_size=6),
       st.sampled_from(["、", "，", ","]))
def test_split_locations_roundtrip(locs, delim):
    text = delim.join(locs)
    assert sp.split_locations(text) == locs


@given(st.floats(min_value=0.1, max_value=9999, allow_nan=False),
       st.floats(min_value=0.1, max_value=9999, allow_nan=False))
def test_range_midpoint_parse(a, b):
    lo, hi = sorted((round(a, 1), round(b, 1)))
    got = numeric.parse_depth(f"水深{lo}-{hi}米")
    assert got is not None
    assert abs(got[0] - (lo + hi) / 2) < 1e-9
    assert got[1] == "米"


@given(st.integers(min_value=1, max_value=500))
def test_egg_count_wan(n):
    got = numeric.parse_egg_count(f"产卵{n}万粒")
    assert got == (float(n) * 10000, "粒")


@settings(deadline=None, max_examples=20)
@given(st.lists(st.sampled_from([f"w{i}" for i in range(50)]),
                min_size=10, max_size=80),
       st.integers(min_value=0, max_value=9))
def test_minhash_jaccard_estimate(tokens, flips):
    """Signature-equality fraction approximates true shingle Jaccard."""
    a = " ".join(tokens)
    toks = list(tokens)
    for i in range(min(flips, len(toks))):
        toks[i * max(1, len(toks) // (flips + 1))] = f"X{i}"
    b = " ".join(toks)
    mh = dedup.MinHasher(num_perm=128, k=3)
    sa, sb = mh.signature(a), mh.signature(b)
    est = float((sa == sb).mean())
    sha = set(dedup._shingle_hashes(a, 3).tolist())
    shb = set(dedup._shingle_hashes(b, 3).tolist())
    true_j = len(sha & shb) / max(1, len(sha | shb))
    assert abs(est - true_j) < 0.25  # 128 perms → ~0.09 std


@given(st.text(max_size=40))
def test_simhash_self_identical(text):
    assert dedup.SimHasher.simhash(text) == dedup.SimHasher.simhash(text)


@given(st.text(min_size=1, max_size=30))
def test_hash_embed_unit_norm(text):
    from datacapsule_ray.stages.vectors import hash_embed

    v = hash_embed(text, 32)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


@given(st.lists(st.frozensets(st.integers(0, 60), min_size=1, max_size=30),
                min_size=2, max_size=12),
       st.sampled_from([(1, 2), (7, 10), (9, 10), (1, 1)]))
@settings(max_examples=200)
def test_prefix_filter_completeness(sets, tau):
    """The exactness theorem behind functions/ssjoin.py: under ANY
    consistent total token order, two sets with J >= tau_num/tau_den
    must share a token within each other's first n - ceil(tau*n) + 1
    tokens. An off-by-one in the prefix-length formula would break the
    ssjoin's zero-false-negative guarantee — this pins the formula
    itself, independent of the distributed machinery."""
    tau_num, tau_den = tau

    def prefix(s):
        toks = sorted(s)  # the consistent global order
        n = len(toks)
        p = n - (-((-tau_num * n) // tau_den)) + 1  # ssjoin's formula
        return set(toks[:max(p, 1)])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            union = len(a | b)
            if tau_den * inter >= tau_num * union:  # J >= tau
                assert prefix(a) & prefix(b), (
                    f"pair with J={inter}/{union} shares no prefix token")
