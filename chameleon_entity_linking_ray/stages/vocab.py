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
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from chameleon_entity_linking_ray.functions.hashing import hash64, mix64, node_id


def add_node_column(text_col: str = "norm", out_col: str = "node",
                    source_col: str = "surface"):
    """Attach node = hash(norm). When the stream carries only ``surface``
    (the lean mention table — norm is derivable and skipped at
    materialize), norm is recomputed vectorized here and kept on the
    stream for downstream consumers."""

    def fn(batch: pa.Table) -> pa.Table:
        if text_col not in batch.column_names:
            from chameleon_entity_linking_ray.functions.text import normalize_array
            norm = normalize_array(batch.column(source_col))
            if isinstance(norm, pa.ChunkedArray):
                norm = norm.combine_chunks()
            batch = batch.append_column(text_col, norm)
        ids = node_id(batch.column(text_col).to_pylist())
        return batch.append_column(out_col, pa.array(ids, pa.int64()))

    return fn


def build_vocab(mentions: Dataset, text_col: str = "norm",
                num_buckets: int = 64) -> Dataset:
    """Distinct norms + occurrence counts, combiner form: each input block
    collapses to its own partial (norm, count) table BEFORE the shuffle, so
    the exchange moves ~n_blocks x vocab rows instead of every mention —
    the difference between shuffling 10^12 rows and 10^7 at target scale."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if text_col not in df.columns:
            # lean mention stream: derive norm from surface (vectorized)
            from chameleon_entity_linking_ray.functions.text import normalize_list
            df = pd.DataFrame({text_col: normalize_list(df["surface"].tolist())})
        part = df.groupby(text_col, sort=False).size().rename("n_mentions") \
            .reset_index()
        b = (mix64(hash64(part[text_col].to_numpy(object)), seed=67) %
             np.uint64(num_buckets)).astype(np.int32)
        part["__vbucket"] = b
        return part

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(text_col, sort=False)["n_mentions"].sum().reset_index()
        out["n_mentions"] = out["n_mentions"].astype(np.int64)
        return out

    vocab = mentions.map_batches(partial, batch_format="pandas") \
        .groupby("__vbucket").map_groups(combine, batch_format="pandas")
    return vocab.map_batches(add_node_column(text_col), batch_format="pyarrow")
