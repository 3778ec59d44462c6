"""Mergeable Bloom filter — the membership sketch completing the
sketch family (functions/sketches.py: HLL distinct, quantile digests).

Per-block partial bitmaps are built vectorized inside ``map_batches``
(one fixed-size binary row per block) and OR-merged; OR is associative
and commutative, so partials merge in any order — the same
mergeable-summary contract as the HLL registers. The merged filter is
``ray.put`` once and read zero-copy in every probe task.

The flagship use is membership PRE-FILTERING for incremental dedup: a
Bloom miss is a guaranteed miss (no false negatives), so only the
bloom-HIT rows ever reach the exact verification shuffle. At 100 TB
that turns the anti-join's left side from "every new document" into
"new documents that look like dups" — typically a tiny fraction — for
the cost of one broadcast-sized bitmap. False positives only cost
verify work, never correctness, so the composed operator stays exact
(and shares its SQL oracle with the plain anti-join variant)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

DEFAULT_BITS = 1 << 20  # 128 KiB bitmap; size to ~10 bits/key at scale
DEFAULT_K = 4


def _hash_pairs(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """(n, 2) uint64 hash pairs per row, md5 sliced straight off the
    Arrow string buffer (the functions/text.py md5_hex_batch shape) —
    double hashing g_i = h1 + i*h2 derives all k probe positions from
    one digest (Kirsch–Mitzenmacher)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, 2), dtype=np.uint64)
    buffers = col.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32,
                            count=len(col) + 1 + col.offset)[col.offset:]
    data = memoryview(buffers[2])
    md5 = hashlib.md5
    digests = b"".join(md5(data[offsets[i]:offsets[i + 1]]).digest()
                       for i in range(len(col)))
    return np.frombuffer(digests, dtype=np.uint64).reshape(-1, 2)


def _probe_positions(pairs: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing."""
    i = np.arange(k, dtype=np.uint64)
    return (pairs[:, :1] + i * pairs[:, 1:2]) % np.uint64(n_bits)


def bloom_build(ds: Dataset, col: str, *, n_bits: int = DEFAULT_BITS,
                k: int = DEFAULT_K) -> np.ndarray:
    """Merged bitmap over every value of ``col``. Driver holds
    O(blocks) partial bitmaps transiently (n_bits/8 bytes each);
    gigabit-sized filters would OR in a tree of tasks instead."""

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        pos = _probe_positions(_hash_pairs(t.column(col)), n_bits, k)
        flat = pos.reshape(-1)
        np.bitwise_or.at(bm, (flat >> np.uint64(3)).astype(np.int64),
                         (1 << (flat & np.uint64(7))).astype(np.uint8))
        return pa.table({"bloom": pa.array([bm.tobytes()],
                                           type=pa.binary())})

    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for buf in b.column("bloom"):
            merged |= np.frombuffer(buf.as_py(), dtype=np.uint8)
    return merged


def bloom_contains(bitmap: np.ndarray, col: pa.Array | pa.ChunkedArray,
                   *, k: int = DEFAULT_K) -> np.ndarray:
    """Vectorized membership probe: True = maybe-present (verify),
    False = definitely absent."""
    n_bits = len(bitmap) * 8
    pos = _probe_positions(_hash_pairs(col), n_bits, k)
    bits = (bitmap[(pos >> np.uint64(3)).astype(np.int64)]
            >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    return bits.all(axis=1)
