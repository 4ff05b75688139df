"""Mention extraction — stateless ``map_batches`` stage.

Engine analog of the reference's TAGME extractor
(/root/reference/utils/entity_extractor.py:22-39): instead of 125-way async
HTTP calls to an external annotator, a deterministic local recognizer finds
Capitalized token sequences and scores each with a confidence ``rho``; the
reference's ``rho > 0.26`` filter (:10,:32) is applied identically. The
async-batch concurrency pattern maps to Ray scheduling many `map_batches`
tasks concurrently.

Three shapes are produced:
- ``annotate``: adds a typed ``mentions`` list<struct> column to each turn
  row — the Arrow replacement for the reference's ``eval()``-parsed TSV
  annotation column (/root/reference/BiEncoder/train.py:67-82).
- ``explode``: one output row per mention (mention_id, conv_id, turn_idx,
  span, surface, norm, rho) — the full public shape.
- ``explode_lean``: the flagship's hot-path shape — only the
  non-derivable columns; ``restore_derived`` rebuilds the rest at output.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.functions.text import normalize_list

# Capitalized token, optionally followed by more capitalized tokens
# ("Stark", "Stark Ind", "Wayne Industries 3").
_MENTION_RE = re.compile(r"\b[A-Z][\w&.\-]*(?:\s+(?:[A-Z][\w&.\-]*|\d+))*")

MENTION_STRUCT = pa.struct([
    ("spot", pa.string()),
    ("title", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("rho", pa.float32()),
    ("page_id", pa.int64()),
])


def _rho(surface: str) -> float:
    """Deterministic confidence: longer, multi-token surfaces score higher
    (stand-in for TAGME's rho; same threshold semantics as the reference)."""
    n_tokens = surface.count(" ") + 1
    return min(0.99, 0.15 + 0.10 * n_tokens + 0.01 * len(surface))


def find_mentions(text: str, threshold: float) -> list[tuple[int, int, str, float]]:
    out = []
    for m in _MENTION_RE.finditer(text):
        surface = m.group(0)
        rho = _rho(surface)
        if rho > threshold:  # strict >, as /root/reference/utils/entity_extractor.py:32
            out.append((m.start(), m.end(), surface, rho))
    return out


def find_mentions_batch(texts: list[str], threshold: float):
    """Batch extraction: ONE ``finditer`` pass over the whole batch joined
    with ``\\0`` (non-word, non-space — the pattern can never cross it, so
    matches are identical to per-row scans), offsets mapped back to rows
    with ``searchsorted`` and rho computed vectorized (same IEEE operation
    order as ``_rho``, so the strict-> filter agrees bit-for-bit).

    Returns ``(row, start, end, surfaces, rho)`` — numpy arrays + list,
    already rho-filtered, in (row, start) order.
    """
    n = len(texts)
    row_off = np.zeros(n + 1, dtype=np.int64)
    if n:
        lens = np.fromiter((len(t) for t in texts), np.int64, n)
        np.cumsum(lens + 1, out=row_off[1:])  # +1 per "\0" separator
    joined = "\0".join(texts)
    ms, me, surfaces = [], [], []
    for m in _MENTION_RE.finditer(joined):
        ms.append(m.start())
        me.append(m.end())
        surfaces.append(m.group(0))
    if not ms:
        e = np.empty(0, np.int64)
        return e, e.astype(np.int32), e.astype(np.int32), [], np.empty(0, np.float32)
    ms = np.asarray(ms, np.int64)
    me = np.asarray(me, np.int64)
    row = np.searchsorted(row_off, ms, side="right") - 1
    start = (ms - row_off[row]).astype(np.int32)
    end = (me - row_off[row]).astype(np.int32)
    n_tok = np.fromiter((s.count(" ") for s in surfaces), np.int64,
                        len(surfaces)) + 1
    slen = me - ms
    rho = np.minimum(0.99, (0.15 + 0.10 * n_tok) + 0.01 * slen)
    keep = rho > threshold  # strict >, reference parity
    surfaces = [s for s, k in zip(surfaces, keep) if k]
    return (row[keep], start[keep], end[keep], surfaces,
            rho[keep].astype(np.float32))


def restore_derived(batch: pa.Table) -> pa.Table:
    """Rebuild the derivable mention columns (vectorized):
    ``mention_id = conv_id:turn_idx:span_start``, ``norm`` (when absent)
    and ``rho`` from the same IEEE operation order as ``_rho`` (float32 at
    the Arrow boundary, as the original explode emitted)."""
    if "mention_id" in batch.column_names:
        return batch
    from chameleon_entity_linking_ray.functions.text import normalize_array
    conv = batch.column("conv_id")
    mid = pc.binary_join_element_wise(
        conv.cast(pa.string()), pc.cast(batch.column("turn_idx"), pa.string()),
        pc.cast(batch.column("span_start"), pa.string()), ":")
    surf = batch.column("surface")
    n_tok = pc.add(pc.count_substring(surf, " "), 1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    slen = pc.utf8_length(surf).to_numpy(zero_copy_only=False).astype(np.int64)
    rho = np.minimum(0.99, (0.15 + 0.10 * n_tok) + 0.01 * slen) \
        .astype(np.float32)
    out = batch.add_column(0, "mention_id", mid)
    if "norm" not in batch.column_names:
        norm = normalize_array(surf)
        norm = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
        out = out.append_column("norm", norm)
    return out.append_column("rho", pa.array(rho, pa.float32()))


class MentionExtractor:
    """Callable for ``map_batches`` (stateless — regex compiled at module
    import; kept a class so config travels with the task)."""

    def __init__(self, config: LinkageConfig | None = None):
        self.config = config or LinkageConfig()

    def explode(self, batch: pa.Table) -> pa.Table:
        """One row per mention — fully batch-vectorized: one regex pass over
        the joined batch text, Arrow ``take`` for the carried columns, and
        ``binary_join_element_wise`` for the mention ids (no per-row Python
        beyond the C-level ``finditer``)."""
        return restore_derived(self.explode_lean(batch))

    def explode_lean(self, batch: pa.Table) -> pa.Table:
        """``explode`` minus the DERIVABLE columns (mention_id, rho, norm):
        the flagship materializes this table once and carries it through
        the whole pipeline, and all three are pure functions of the kept
        columns — they are recomputed where needed (vectorized, scales
        with CPUs) instead of riding the object store (~50% fewer mention
        bytes written + read; plasma bandwidth does not scale with CPUs
        on one node)."""
        texts = batch.column("text").to_pylist()
        row, start, end, surfaces, _rho_arr = find_mentions_batch(
            texts, self.config.rho_threshold)
        take = pa.array(row)
        return pa.table({
            "conv_id": batch.column("conv_id").take(take),
            "turn_idx": batch.column("turn_idx").take(take),
            "span_start": pa.array(start, pa.int32()),
            "span_end": pa.array(end, pa.int32()),
            "surface": pa.array(surfaces, pa.string()),
        })

    def annotate(self, batch: pa.Table) -> pa.Table:
        """Add a typed ``mentions`` list<struct> column (S2 parity shape) —
        built from the batch arrays via ListArray offsets, no per-row dicts."""
        texts = batch.column("text").to_pylist()
        row, start, end, surfaces, rho = find_mentions_batch(
            texts, self.config.rho_threshold)
        surf = pa.array(surfaces, pa.string())
        values = pa.StructArray.from_arrays(
            [surf, surf, pa.array(start, pa.int32()), pa.array(end, pa.int32()),
             pa.array(rho, pa.float32()),
             pa.array(np.full(len(row), -1, np.int64), pa.int64())],
            fields=list(MENTION_STRUCT))
        # finditer emits in (row, start) order -> offsets via bincount
        counts = np.bincount(row, minlength=len(texts)) if len(row) else \
            np.zeros(len(texts), np.int64)
        offsets = np.zeros(len(texts) + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        mentions = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
        return batch.append_column(
            "mentions", mentions.cast(pa.list_(MENTION_STRUCT)))

    # default map_batches entry point
    __call__ = explode
