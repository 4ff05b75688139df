"""TREC run-file conformance: the reference's output format
``qid Q0 pid rank score tag`` (/root/reference/BiEncoder/test.py:128-132,
/root/reference/CrossEncoder/test.py:108-112, utils/merge_results.py:22-28).

The engine's canonical sink is partitioned Parquet; this module provides
(a) the per-group rank assignment (O1: per-query sort-desc + enumerate) and
(b) the golden text formatter for byte-level conformance with reference
tooling. The reference's string-sorted-score quirk in merge_results.py:24
(SURVEY.md O2) is intentionally NOT reproduced — ranking here is numeric.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from chameleon_entity_linking_ray.stages.agg import grouped_top_k


def rank_run(scored: Dataset, qid_col: str = "qid", pid_col: str = "pid",
             score_col: str = "score", k: int = 10) -> Dataset:
    """Per-query rank table: top-k by (score desc, pid asc), rank from 1."""
    return grouped_top_k(scored, group_keys=[qid_col],
                         by=[score_col, pid_col], ascending=[False, True],
                         k=k, rank_col="rank")


def format_trec(ranked: Dataset, tag: str = "chameleon-ray",
                qid_col: str = "qid", pid_col: str = "pid",
                score_col: str = "score") -> Dataset:
    """One ``line`` string column per ranked row, reference format."""

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        lines = [f"{q} Q0 {p} {r} {s} {tag}"
                 for q, p, r, s in zip(df[qid_col], df[pid_col],
                                       df["rank"], df[score_col])]
        return pd.DataFrame({"qid": df[qid_col].to_numpy(),
                             "rank": df["rank"].to_numpy(np.int64),
                             "line": lines})

    return ranked.map_batches(fmt, batch_format="pandas")


def write_trec(ranked: Dataset, path: str, tag: str = "chameleon-ray",
               qid_col: str = "qid", pid_col: str = "pid",
               score_col: str = "score") -> None:
    """Driver-side golden writer (small, conformance-only): rank-ordered per
    qid, file order = (qid, rank) — the reference's implicit contract."""
    lines = format_trec(ranked, tag, qid_col, pid_col, score_col) \
        .sort(["qid", "rank"]).to_pandas()["line"]
    with open(path, "w") as f:
        for line in lines:
            f.write(line + "\n")
