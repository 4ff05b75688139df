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

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if batch.num_rows == 0:
            return pa.table({text_col: pa.array([], pa.string()),
                             "n_mentions": pa.array([], pa.int64()),
                             "__vbucket": pa.array([], pa.int32())})
        if text_col in batch.column_names:
            vc = pc.value_counts(batch.column(text_col).combine_chunks())
            part = pa.table({text_col: vc.field("values"),
                             "n_mentions": vc.field("counts").cast(pa.int64())})
        else:
            # lean mention stream: count DISTINCT raw surfaces first (Arrow
            # C value_counts over the 60M-row stream), then normalize only
            # the per-block distinct values — orders of magnitude fewer
            # regex passes than normalizing every mention row, and no
            # Arrow->pandas object conversion of the wide stream
            from chameleon_entity_linking_ray.functions.text import normalize_array
            vc = pc.value_counts(batch.column("surface").combine_chunks())
            norm = normalize_array(vc.field("values"))
            if isinstance(norm, pa.ChunkedArray):
                norm = norm.combine_chunks()
            # distinct surfaces can share a norm -> re-aggregate by norm
            part = pa.table({text_col: norm,
                             "n_mentions": vc.field("counts").cast(pa.int64())}) \
                .group_by(text_col).aggregate([("n_mentions", "sum")]) \
                .rename_columns([text_col, "n_mentions"])
        b = (mix64(hash64(part.column(text_col).to_pylist()), seed=67) %
             np.uint64(num_buckets)).astype(np.int32)
        return part.append_column("__vbucket", pa.array(b, pa.int32()))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(text_col, sort=False)["n_mentions"].sum().reset_index()
        out["n_mentions"] = out["n_mentions"].astype(np.int64)
        return out

    vocab = mentions.map_batches(partial, batch_format="pyarrow") \
        .groupby("__vbucket").map_groups(combine, batch_format="pandas")
    return vocab.map_batches(add_node_column(text_col), batch_format="pyarrow")
