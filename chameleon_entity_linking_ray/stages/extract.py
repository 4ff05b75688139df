"""Mention extraction — stateless ``map_batches`` stage.

Engine analog of the reference's TAGME extractor
(/root/reference/utils/entity_extractor.py:22-39): instead of 125-way async
HTTP calls to an external annotator, a deterministic local recognizer finds
Capitalized token sequences and scores each with a confidence ``rho``; the
reference's ``rho > 0.26`` filter (:10,:32) is applied identically. The
async-batch concurrency pattern maps to Ray scheduling many `map_batches`
tasks concurrently.

Two shapes are produced:
- ``annotate_batch``: adds a typed ``mentions`` list<struct> column to each
  turn row — the Arrow replacement for the reference's ``eval()``-parsed TSV
  annotation column (/root/reference/BiEncoder/train.py:67-82).
- ``explode_batch``: one output row per mention (mention_id, conv_id,
  turn_idx, span, surface, norm, rho) — the unit the blocking/scoring
  pipeline works on.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

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


class MentionExtractor:
    """Callable for ``map_batches`` (stateless — regex compiled at module
    import; kept a class so config travels with the task)."""

    def __init__(self, config: LinkageConfig | None = None):
        self.config = config or LinkageConfig()

    def explode(self, batch: pa.Table) -> pa.Table:
        """One row per mention; normalized surface computed vectorized."""
        texts = batch.column("text").to_pylist()
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        mid, conv_o, turn_o, starts, ends, surfaces, rhos = [], [], [], [], [], [], []
        thr = self.config.rho_threshold
        for i, text in enumerate(texts):
            for (s, e, surf, rho) in find_mentions(text, thr):
                mid.append(f"{conv[i]}:{turn[i]}:{s}")
                conv_o.append(conv[i])
                turn_o.append(turn[i])
                starts.append(s)
                ends.append(e)
                surfaces.append(surf)
                rhos.append(rho)
        return pa.table({
            "mention_id": pa.array(mid, pa.string()),
            "conv_id": pa.array(conv_o, pa.string()),
            "turn_idx": pa.array(turn_o, pa.int32()),
            "span_start": pa.array(starts, pa.int32()),
            "span_end": pa.array(ends, pa.int32()),
            "surface": pa.array(surfaces, pa.string()),
            "norm": pa.array(normalize_list(surfaces), pa.string()),
            "rho": pa.array(np.asarray(rhos, dtype=np.float32), pa.float32()),
        })

    def annotate(self, batch: pa.Table) -> pa.Table:
        """Add a typed ``mentions`` list<struct> column (S2 parity shape)."""
        texts = batch.column("text").to_pylist()
        thr = self.config.rho_threshold
        rows = []
        for text in texts:
            rows.append([
                {"spot": surf, "title": surf, "start": s, "end": e,
                 "rho": rho, "page_id": -1}
                for (s, e, surf, rho) in find_mentions(text, thr)
            ])
        return batch.append_column(
            "mentions", pa.array(rows, type=pa.list_(MENTION_STRUCT)))

    # default map_batches entry point
    __call__ = explode
