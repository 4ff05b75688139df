"""MinHash signatures and LSH band keys — the engine's blocking sketch.

Replaces the reference's exhaustive FAISS candidate generation
(/root/reference/BiEncoder/test_retrieval.py:43-76) with a stateless,
shuffle-friendly hash: signatures are computed per batch in ``map_batches``
(zero driver state), band hashes become the blocking shuffle key.
"""

from __future__ import annotations

import numpy as np

from chameleon_entity_linking_ray.functions.hashing import flat_ngram_hashes, mix64

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    a = rng.randint(1, 1 << 62, size=num_perm, dtype=np.int64).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(texts, k: int, num_perm: int, seed: int) -> np.ndarray:
    """uint64[n_rows, num_perm] MinHash over char k-gram shingle sets."""
    flat, offsets = flat_ngram_hashes(texts, k)
    n = len(offsets) - 1
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    if n == 0:
        return sigs
    a, b = _perm_params(num_perm, seed)
    starts = offsets[:-1]
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            v = flat * a[p] + b[p]  # uint64 wraparound permutation
            sigs[:, p] = np.minimum.reduceat(v, starts)
    return sigs


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Pairwise Jaccard estimate from row-aligned signature matrices."""
    return (sig_a == sig_b).mean(axis=1).astype(np.float32)


def lsh_band_keys(sigs: np.ndarray, num_bands: int, seed: int) -> np.ndarray:
    """uint64[n_rows, num_bands] — one blocking key per band.

    Two rows share a band key iff their signatures agree on every row of that
    band; keys embed the band index so bands never collide with each other.
    """
    n, num_perm = sigs.shape
    rows_per_band = num_perm // num_bands
    keys = np.empty((n, num_bands), dtype=np.uint64)
    for band in range(num_bands):
        chunk = sigs[:, band * rows_per_band : (band + 1) * rows_per_band]
        acc = np.full(n, np.uint64(band * 2654435761 + 1), dtype=np.uint64)
        for r in range(rows_per_band):
            acc = mix64(acc ^ chunk[:, r], seed=seed + band)
        keys[:, band] = acc
    return keys


def feature_matrix(texts, dim: int, k: int, seed: int) -> np.ndarray:
    """L2-normalized hashed char-ngram count vectors, float32[n, dim].

    The deterministic CPU stand-in for the reference's encoder towers
    (/root/reference/BiEncoder/model.py:68-166): same actor-pool call shape,
    reproducible without model weights.
    """
    flat, offsets = flat_ngram_hashes(texts, k)
    n = len(offsets) - 1
    mat = np.zeros((n, dim), dtype=np.float32)
    if flat.size:
        cols = (mix64(flat, seed=seed) % np.uint64(dim)).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        np.add.at(mat, (rows, cols), 1.0)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    np.divide(mat, norms, out=mat, where=norms > 0)
    return mat


def cosine_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two row-aligned, already-normalized matrices."""
    return np.einsum("ij,ij->i", a, b).astype(np.float32)
