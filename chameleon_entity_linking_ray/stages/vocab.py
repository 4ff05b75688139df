"""Surface vocabulary — collapse mentions to distinct normalized surfaces.

Cluster identity depends only on the normalized surface, so all expensive
work (blocking, pairing, scoring, CC) runs over DISTINCT surfaces: at
10^12-turn scale the vocabulary is orders of magnitude smaller than the
mention stream, and every mention with the same norm joins the same cluster
by construction (node = hash(norm)). This is the engine's answer to the
reference re-embedding every duplicated passage independently
(/root/reference/BiEncoder/test_retrieval.py:43-49).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count

from chameleon_entity_linking_ray.functions.hashing import node_id


def add_node_column(text_col: str = "norm", out_col: str = "node"):
    def fn(batch: pa.Table) -> pa.Table:
        ids = node_id(batch.column(text_col).to_pylist())
        return batch.append_column(out_col, pa.array(ids, pa.int64()))

    return fn


def build_vocab(mentions: Dataset, text_col: str = "norm") -> Dataset:
    """Distinct norms + occurrence counts (native vectorized groupby)."""
    vocab = mentions.groupby(text_col).aggregate(Count(alias_name="n_mentions"))
    return vocab.map_batches(add_node_column(text_col), batch_format="pyarrow")
