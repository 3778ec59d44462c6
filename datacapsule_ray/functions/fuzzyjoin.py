"""Distributed Levenshtein<=1 self-join over a name column — the fuzzy
record-linkage / entity-resolution member of the similarity family
(token-set Jaccard lives in ssjoin.py; this is its EDIT-DISTANCE
sibling for short identifier strings: names, SKUs, usernames).

Blocking: the deletion neighborhood (the SymSpell observation). Two
strings at Levenshtein distance exactly 1 always share a member of
D(s) ∪ {s}, where D(s) are the |s| single-character deletions:

* substitution at position i  → s minus i == t minus i;
* insertion/deletion          → the shorter string IS a deletion
                                variant of the longer.

So hashing every name into its |s|+1 deletion keys and verifying only
within shared-key buckets is COMPLETE for distance<=1 — no candidate is
ever missed, and bucket size is bounded BY CONSTRUCTION: the names that
can share a key of length L-1 are its one-character insertions, at most
L·|alphabet| strings — a hot bucket cannot exceed that regardless of
data skew, so no cap (and no drop accounting) is needed where ssjoin's
frequency-skewed token buckets need both.

Execution reuses the shared `_bucket_verify` chassis (sort by bucket
key, in-block bucket loop, boundary buckets re-verified driver-side),
with a fully vectorized one-edit checker: names become padded UTF-32
code-point matrices, equal-length pairs pass on Hamming<=1, and
length±1 pairs pass when prefix-mismatch + shifted-suffix agree (the
classic one-pass one-edit test, run on whole pair batches at once).

Operates on DISTINCT names (callers expand to row pairs through their
own id->name mapping): distance-0 duplicates are an exact-dedup
problem, already served by dedup.py, and keeping identity out of the
pair set keeps the bucket bound above airtight."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _utf32_matrix(names) -> tuple[np.ndarray, np.ndarray]:
    """(m × maxL uint32 code-point matrix zero-padded, lengths)."""
    arr = np.array(list(names), dtype="U")  # fixed-width UTF-32
    lens = np.char.str_len(arr).astype(np.int64)
    m = arr.view(np.uint32).reshape(len(arr), -1)
    return m, lens


def _one_edit_mask(mat: np.ndarray, lens: np.ndarray, iu: np.ndarray,
                   ju: np.ndarray) -> np.ndarray:
    """Vectorized Levenshtein==1 test for candidate pairs (iu, ju) that
    share a deletion key (so |len diff| <= 1 by construction)."""
    la, lb = lens[iu], lens[ju]
    out = np.zeros(len(iu), dtype=bool)

    same = la == lb
    if same.any():
        d = (mat[iu[same]] != mat[ju[same]]).sum(axis=1)
        out[same] = d == 1

    diff = ~same
    if diff.any():
        # orient: a = longer, b = shorter (padding keeps tails equal)
        swap = la[diff] < lb[diff]
        ia = np.where(swap, ju[diff], iu[diff])
        ib = np.where(swap, iu[diff], ju[diff])
        a, b = mat[ia], mat[ib]
        width = a.shape[1]
        eq = a == b
        # p = first mismatching position (len(short) if b is a prefix)
        p = np.where(eq.all(axis=1), lens[ib],
                     np.argmin(eq, axis=1))
        # after deleting a[p], the rest must match: a[:,1:] vs b[:,:-1]
        # must agree from position p on (padding zeros agree past the
        # short length)
        sufeq = a[:, 1:] == b[:, : width - 1]
        ok_from = np.flip(np.cumprod(np.flip(sufeq, axis=1), axis=1),
                          axis=1).astype(bool)
        padded = np.concatenate(
            [ok_from, np.ones((len(p), 1), dtype=bool)], axis=1)
        out[diff] = padded[np.arange(len(p)), np.minimum(p, width - 1)]
    return out


def _deletion_keys_table(t: pa.Table, name_col: str) -> pa.Table:
    """(bucket, name) rows: 64-bit hash of every deletion variant and
    of the name itself. A hash collision only adds a candidate pair the
    exact verifier then rejects — completeness is unaffected."""
    names = t.column(name_col).to_pylist()
    buckets: list[int] = []
    out_names: list[str] = []
    for s in names:
        variants = [s] + [s[:i] + s[i + 1:] for i in range(len(s))]
        for v in variants:
            h = hashlib.md5(v.encode("utf-8")).digest()
            buckets.append(int.from_bytes(h[:8], "little") >> 1)
        out_names.extend([s] * len(variants))
    return pa.table({
        "bucket": pa.array(np.array(buckets, dtype=np.int64)),
        "name": pa.array(out_names, type=pa.string()),
    })


def lev1_name_pairs(ds: Dataset, *, name_col: str,
                    num_partitions: int = 4) -> Dataset:
    """(name_a, name_b) — every unordered pair of DISTINCT values of
    ``name_col`` at Levenshtein distance exactly 1."""
    from ray.data.aggregate import Count

    from ..traverse import drop_empty_blocks
    from .dedup import _bucket_verify, _dedup_pairs

    distinct = drop_empty_blocks(
        ds.select_columns([name_col]).groupby(name_col)
        .aggregate(Count(alias_name="_c")).select_columns([name_col]),
        pa.schema([(name_col, pa.string())]))
    keyed = distinct.map_batches(
        lambda t: _deletion_keys_table(t, name_col),
        batch_format="pyarrow")

    def verify(sub: pa.Table):
        names = sub.column("name").to_pylist()
        uniq = sorted(set(names))
        m = len(uniq)
        if m < 2:
            return [], [], [], 0
        mat, lens = _utf32_matrix(uniq)
        iu, ju = np.triu_indices(m, 1)
        keep = _one_edit_mask(mat, lens, iu, ju)
        arr = np.array(uniq, dtype=object)
        return (arr[iu[keep]], arr[ju[keep]],
                np.ones(int(keep.sum()), dtype=np.float64), 0)

    pairs = _bucket_verify(keyed, ["bucket"], verify, "one",
                           id_type=pa.string())
    deduped = drop_empty_blocks(
        _dedup_pairs(pairs.filter(expr="id_a != id_b"), "one"))
    return deduped.map_batches(
        lambda t: pa.table({"name_a": t.column("id_a"),
                            "name_b": t.column("id_b")}),
        batch_format="pyarrow")
