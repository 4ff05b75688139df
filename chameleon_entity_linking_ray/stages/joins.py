"""Distributed join / semi-join helpers.

The reference does every join as a driver-side dict lookup (SURVEY.md §2.4);
here the large-large case is Ray's hash-partitioned ``Dataset.join`` and the
small-side case is an object-store broadcast (``ray.put`` once, read inside
each task) — never re-shipped per batch, never a shuffle.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def hash_join(left: Dataset, right: Dataset, on: tuple[str, ...],
              join_type: str = "inner", num_partitions: int = 32,
              right_on: tuple[str, ...] | None = None,
              left_suffix: str = "", right_suffix: str = "_r") -> Dataset:
    """Hash-partitioned distributed join (both sides large)."""
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=tuple(on), right_on=tuple(right_on) if right_on else None,
                     left_suffix=left_suffix or None, right_suffix=right_suffix)


def broadcast_semi_join(ds: Dataset, keys: Iterable, key_col: str,
                        anti: bool = False) -> Dataset:
    """Semi/anti join against a small key set: the set is ``ray.put`` once;
    every task reads the same object-store copy (no shuffle, no re-ship).

    Engine form of the reference's prune filter
    (/root/reference/utils/prune_retrieved.py:19-26) and its merge anti-join
    (/root/reference/utils/merge_results.py:14-20).
    """
    ref = ray.put(frozenset(keys))

    class SemiFilter:
        def __init__(self):
            self.keys = ray.get(ref)  # once per actor/task, zero-copy handle

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(key_col).to_pylist()
            mask = np.fromiter((v in self.keys for v in vals), dtype=bool, count=len(vals))
            if anti:
                mask = ~mask
            return batch.filter(pa.array(mask))

    return ds.map_batches(SemiFilter, batch_format="pyarrow", concurrency=2)


def broadcast_lookup(ds: Dataset, mapping: dict, key_col: str, out_col: str,
                     default=None, concurrency: int = 2) -> Dataset:
    """Add a column by dict lookup against a broadcast small table — the
    engine form of the reference's `collection[pid]` /`queries[qid]` dict
    probes (/root/reference/CrossEncoder/test.py:80-99)."""
    ref = ray.put(mapping)

    class Lookup:
        def __init__(self):
            self.m = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(key_col).to_pylist()
            out = [self.m.get(v, default) for v in vals]
            return batch.append_column(out_col, pa.array(out))

    return ds.map_batches(Lookup, batch_format="pyarrow", concurrency=concurrency)
