"""Vectorized text normalization & analysis kernels (pyarrow.compute / numpy).

Normalization never overwrites `text` — derived values go to new columns, so
the per-turn byte-equality invariant (BASELINE.md) holds end-to-end. The
reference's only normalizer is `.strip()` (/root/reference/BiEncoder/model.py:32);
ours adds casefold + whitespace/punct collapse for blocking robustness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """lowercase, strip edge punctuation, collapse internal whitespace."""
    out = pc.utf8_lower(arr)
    out = pc.replace_substring_regex(out, r"[^\w\s]+", " ")
    out = pc.replace_substring_regex(out, r"\s+", " ")
    return pc.utf8_trim_whitespace(out)


def normalize_list(texts: list[str]) -> list[str]:
    return normalize_array(pa.array(texts, type=pa.string())).to_pylist()


# --- text-analysis kernels for the training-data ops (documents table) ---

_STOPWORDS_EN = (
    "the of and a to in is was for on that with as it by at from this be are "
    "an or not his her they we you have had but which one all their has more "
    "will about when there can if no out so what up said who them some"
).split()
_STOPWORDS_DE = (
    "der die das und ist von zu den dem ein eine mit auf nicht sich des im "
    "als auch es an werden aus er hat dass sie nach bei um noch wie einem"
).split()
_STOPWORDS_FR = (
    "le la les de des et est un une du dans que qui pour sur pas au avec ne "
    "ce se il elle sont par plus mais ou comme je vous nous leur si"
).split()

LANG_STOPWORDS = {"en": _STOPWORDS_EN, "de": _STOPWORDS_DE, "fr": _STOPWORDS_FR}


def token_counts(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace token count per string (0 for empty), vectorized."""
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(arr), r"\s+")
    n = pc.list_value_length(toks)
    empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(arr)), 0)
    return pc.if_else(empty, pa.scalar(0, type=n.type), n)


def stopword_hit_counts(arr: pa.Array | pa.ChunkedArray, stopwords: list[str]) -> np.ndarray:
    """Count of stopword occurrences (as whole tokens) per string."""
    lowered = pc.utf8_lower(arr)
    total = np.zeros(len(arr), dtype=np.int64)
    for w in stopwords:
        hits = pc.count_substring_regex(lowered, rf"\b{w}\b")
        total += np.asarray(hits.to_numpy(zero_copy_only=False), dtype=np.int64)
    return total


def punct_counts(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    c = pc.count_substring_regex(arr, r"[^\w\s]")
    return np.asarray(c.to_numpy(zero_copy_only=False), dtype=np.int64)
