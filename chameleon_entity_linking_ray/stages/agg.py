"""Partial (combiner-style) grouped aggregation.

The scalable grouped-aggregate pattern for wide data: aggregate INSIDE each
``map_batches`` task first (pandas vectorized), so the shuffle moves one row
per (group, block) instead of one per input row, then combine per hash
bucket. This is the engine-wide replacement for the reference's driver-side
counter dicts (e.g. /root/reference/CrossEncoder/train.py:77,109-112) and
grouped collects (/root/reference/BiEncoder/test.py:70-79).

At 100 TB the pre-aggregation is the difference between shuffling ~1e12 rows
and shuffling (n_groups x n_blocks) partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from chameleon_entity_linking_ray.functions.hashing import hash64, mix64

# out_col -> (src_col, kind); kind in {"sum", "count", "min", "max"}
AggSpec = dict[str, tuple[str | None, str]]

_COMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _bucket_of(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for i, k in enumerate(keys):
        vals = df[k].to_numpy()
        if np.issubdtype(vals.dtype, np.integer):
            h ^= mix64(vals.astype(np.uint64), seed=31 + i)
        else:
            h ^= mix64(hash64(vals.astype(object)), seed=31 + i)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def grouped_agg(ds: Dataset, keys: list[str], aggs: AggSpec,
                num_buckets: int = 32) -> Dataset:
    """ds -> one row per distinct key tuple with the named aggregates.

    Stage 1 (map_batches): vectorized pandas groupby per input block — the
    partial/combiner step. Stage 2: shuffle partials by key-hash bucket,
    combine per bucket (sum-of-sums, min-of-mins, ...).
    """
    plan = [(out, src, kind) for out, (src, kind) in aggs.items()]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        cols = {}
        for out, src, kind in plan:
            if kind == "count":
                cols[out] = g.size()
            else:
                cols[out] = g[src].agg(kind)
        part = pd.DataFrame(cols).reset_index()
        part["__abucket"] = _bucket_of(part, keys, num_buckets)
        return part

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False)
        cols = {out: gb[out].agg(_COMBINE[kind]) for out, _, kind in plan}
        return pd.DataFrame(cols).reset_index()

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__abucket").map_groups(combine, batch_format="pandas")


def distinct(ds: Dataset, keys: list[str], num_buckets: int = 32) -> Dataset:
    """Distinct key tuples — per-block drop_duplicates (the combiner) then a
    bucketed exact dedup; never a full-row global sort."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        part = df[keys].drop_duplicates()
        part["__abucket"] = _bucket_of(part, keys, num_buckets)
        return part

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g[keys].drop_duplicates()

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__abucket").map_groups(combine, batch_format="pandas")


def mean_pool_vectors(ds: Dataset, group_col: str, vec_col: str,
                      num_buckets: int = 16, round_to: int = 6,
                      all_groups: Dataset | None = None,
                      dim: int | None = None) -> Dataset:
    """Grouped element-wise mean of ``list<float>`` vectors — the engine
    form of the reference's per-doc entity-vector mean pool
    (/root/reference/BiEncoder/test_wikipedia2vec.py:56-67), combiner
    style: each block pre-aggregates (group, pos) partial sums + counts
    (one ``np.add.at`` scatter per block), the bucketed combine sums the
    partials, and the mean divides once. Emits LONG format
    (group, pos, mean_v) so results are scalar-comparable cross-engine.

    ``all_groups`` (a Dataset with ``group_col``): groups present there
    but with NO vector rows in ``ds`` emit a ZERO vector — the reference's
    zeros fallback for docs whose entities resolve to no embedding
    (/root/reference/BiEncoder/test_wikipedia2vec.py:63-67). ``dim`` pins
    the vector width for that case (required if ``ds`` can be empty)."""

    _partial_schema = pa.schema([(group_col, pa.int64()), ("pos", pa.int64()),
                                 ("s", pa.float64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty blocks occur after upstream filters
            return _partial_schema.empty_table()
        mat = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        gu, inv = np.unique(grp, return_inverse=True)
        dim = mat.shape[1]
        sums = np.zeros((len(gu), dim), np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table({
            group_col: pa.array(np.repeat(gu, dim), pa.int64()),
            "pos": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(gu)),
                            pa.int64()),
            "s": pa.array(sums.reshape(-1), pa.float64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
        })

    summed = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         keys=[group_col, "pos"],
                         aggs={"s": ("s", "sum"), "n": ("n", "sum")},
                         num_buckets=num_buckets)

    def mean(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, "pos"]].copy()
        out["mean_v"] = np.round(df["s"].to_numpy() /
                                 np.maximum(df["n"].to_numpy(), 1), round_to)
        return out

    pooled = summed.map_batches(mean, batch_format="pandas")
    if all_groups is None:
        return pooled

    from chameleon_entity_linking_ray.stages.joins import semi_join_ds
    pooled = pooled.materialize()  # consumed by the anti-join AND the union
    if dim is None:
        if pooled.count() == 0:
            raise ValueError("cannot infer vector dim from an empty input; "
                             "pass dim= explicitly")
        dim = int(pooled.max("pos")) + 1

    missing = semi_join_ds(all_groups.select_columns([group_col]), pooled,
                           group_col, anti=True)

    def zero_rows(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        return pa.table({
            group_col: pa.array(np.repeat(g, dim), pa.int64()),
            "pos": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(g)),
                            pa.int64()),
            "mean_v": pa.array(np.zeros(len(g) * dim), pa.float64()),
        })

    return pooled.union(missing.map_batches(zero_rows, batch_format="pyarrow"))


def top_k(ds: Dataset, by: list[str], ascending: list[bool], k: int) -> Dataset:
    """Global top-k with per-block pruning: each block keeps its own top-k
    (vectorized nsmallest/nlargest-style sort), then one tiny final sort.
    The Ray form of the reference's per-query rank cut
    (/root/reference/BiEncoder/test_retrieval.py:72-82)."""

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    pruned = ds.map_batches(prune, batch_format="pandas")
    out = pruned.sort(by, descending=[not a for a in ascending]).limit(k)
    return out


def grouped_top_k(ds: Dataset, group_keys: list[str], by: list[str],
                  ascending: list[bool], k: int, num_buckets: int = 32,
                  rank_col: str | None = None) -> Dataset:
    """Per-group top-k (the reference's per-query sort-desc + rank,
    /root/reference/CrossEncoder/test.py:102-106): top-k is a COMBINER,
    so each block first prunes to its own per-group top-k (the shuffle
    then moves <= k rows per (group, block) instead of every row), then
    groups are bucketed by key hash and finished with one vectorized
    sort + head(k) per bucket."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(group_keys + by,
                            ascending=[True] * len(group_keys) + ascending,
                            kind="mergesort") \
            .groupby(group_keys, sort=False).head(k)
        df = df.copy()
        df["__abucket"] = _bucket_of(df, group_keys, num_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(group_keys + by,
                          ascending=[True] * len(group_keys) + ascending,
                          kind="mergesort")
        out = g.groupby(group_keys, sort=False).head(k).drop(columns="__abucket")
        if rank_col:
            out[rank_col] = out.groupby(group_keys, sort=False).cumcount() + 1
        return out

    return ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby("__abucket").map_groups(per_bucket, batch_format="pandas")
