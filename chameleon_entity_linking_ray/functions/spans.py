"""Synthetic entity-span arithmetic (SURVEY.md M5) — the reference's
entities-only input builder: titles joined with ' ' and char spans
recomputed over the concatenation
(/root/reference/BiEncoder/model.py:168-186, duplicated
Fully/model.py:72-90).

Two modes:
- ``reference_parity=True`` (default): reproduces the reference arithmetic
  EXACTLY, including its two quirks — span end is ``len-1`` (inclusive),
  and the running offset for idx >= 2 accounts only for the PREVIOUS
  title's length (`elen = len(prev) + 1`), not the cumulative prefix, so
  third-and-later spans do not actually index the joined string.
- ``reference_parity=False``: the corrected cumulative arithmetic
  (half-open [start, end) spans that index the joined text).
"""

from __future__ import annotations


def synthetic_entity_spans(entity_lists: list[list[str]],
                           reference_parity: bool = True
                           ) -> tuple[list[str], list[list[tuple[int, int]]]]:
    """Per row: (joined text, per-entity (start, end) spans)."""
    texts, all_spans = [], []
    for entities in entity_lists:
        texts.append(" ".join(entities))
        spans: list[tuple[int, int]] = []
        if reference_parity:
            # faithful loop shape (model.py:175-180)
            for idx, ent in enumerate(entities):
                if idx == 0:
                    spans.append((0, len(ent) - 1))
                else:
                    elen = len(entities[idx - 1]) + 1
                    spans.append((elen, elen + len(ent) - 1))
        else:
            offset = 0
            for ent in entities:
                spans.append((offset, offset + len(ent)))
                offset += len(ent) + 1
        all_spans.append(spans)
    return texts, all_spans
