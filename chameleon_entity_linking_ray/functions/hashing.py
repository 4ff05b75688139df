"""Deterministic vectorized hashing primitives.

All hashes are seeded and wall-clock free so reruns are byte-identical
(the resume / determinism invariants in BASELINE.md). String hashing uses
pandas' SipHash-based ``hash_array`` (vectorized, keyed); n-gram hashing is
a rolling polynomial over the raw utf-8 bytes in numpy uint64 arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# 16-byte key required by pd.util.hash_array
HASH_KEY = "chameleon-ray-01"

_FNV_PRIME = np.uint64(1099511628211)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash64(values, key: str = HASH_KEY) -> np.ndarray:
    """Vectorized keyed 64-bit hash of a string (or any object) array."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=key, categorize=False)


def node_id(values, key: str = HASH_KEY) -> np.ndarray:
    """Stable positive int64 node ids for CC (63-bit to stay Arrow-int64-safe).

    Collision note: 63-bit ids give a ~1e-7 collision probability per 1e6
    mentions; at 1e12-mention scale switch `hash_key` per-shard and treat
    ids as (shard, hash) — the CC loop is unchanged.
    """
    return (hash64(values, key) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def mix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """splitmix64-style avalanche; vectorized uint64 -> uint64 (wraparound intended)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _GOLDEN * np.uint64(seed + 1)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def flat_char_shingles(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash every CHARACTER k-gram of every string (no padding, zero
    shingles for rows shorter than k) — rolling hash over UTF-32 code
    points, so semantics match SQL ``substring(text, i, k)`` exactly
    (unlike ``flat_ngram_hashes``, which is byte-based and pads short
    rows for blocking robustness). Returns ``(hashes, offsets)`` like
    ``flat_ngram_hashes``."""
    lengths = np.fromiter((len(t) for t in texts), dtype=np.int64,
                          count=len(texts))
    counts = np.maximum(lengths - k + 1, 0)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    if offsets[-1] == 0:
        return np.empty(0, dtype=np.uint64), offsets
    # k-1 non-char sentinels between rows so no window crosses a boundary
    sep = "\U0010fffd" * (k - 1)
    joined = sep.join(texts)
    arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    n_windows = arr.size - k + 1
    acc = np.zeros(n_windows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * _FNV_PRIME + arr[j: j + n_windows]
    row_starts = np.zeros(len(texts), dtype=np.int64)
    row_starts[1:] = np.cumsum(lengths + k - 1)[:-1]
    idx = np.arange(offsets[-1], dtype=np.int64) + \
        np.repeat(row_starts - offsets[:-1], counts)
    return mix64(acc[idx]), offsets


def flat_ngram_hashes(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling-hash every char k-gram of every string, fully vectorized.

    Returns ``(hashes, offsets)`` where ``hashes`` is a flat uint64 array of
    all k-gram hashes (row-major) and ``offsets`` (len = n_rows + 1) slices it
    per row: row i's hashes are ``hashes[offsets[i]:offsets[i+1]]``.

    Strings shorter than ``k`` are right-padded with "_" so every row has at
    least one shingle (the reference's zero-vector fallback analog,
    /root/reference/BiEncoder/test_wikipedia2vec.py:63-67).
    """
    pad = "_" * k
    bufs = [(t if len(t) >= k else (t + pad)[:k]).encode("utf-8") for t in texts]
    lengths = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    # k-1 separator bytes between rows so no window crosses a row boundary
    sep = b"\xff" * (k - 1)
    joined = sep.join(bufs) if bufs else b""
    arr = np.frombuffer(joined, dtype=np.uint8).astype(np.uint64)

    counts = np.maximum(lengths - k + 1, 0)  # utf-8 len >= padded char len >= k
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])

    if arr.size == 0:
        return np.empty(0, dtype=np.uint64), offsets

    n_windows = arr.size - k + 1
    acc = np.zeros(n_windows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * _FNV_PRIME + arr[j : j + n_windows]

    # valid window start positions: row i occupies bytes starting at
    # start_i = cumsum(lengths + k - 1)[i-1]; its windows are start_i..start_i+counts_i
    row_starts = np.zeros(len(bufs), dtype=np.int64)
    row_starts[1:] = np.cumsum(lengths + k - 1)[:-1]
    idx = np.arange(offsets[-1], dtype=np.int64) + np.repeat(row_starts - offsets[:-1], counts)
    return mix64(acc[idx]), offsets
