"""Dead-letter channel (SURVEY.md S9) — the engine form of the reference
extractor's error side-file (/root/reference/utils/entity_extractor.py:34-36:
failed ids appended to ``tagme_*_errors.txt`` while good rows continue).

Pattern: a fallible ingest/transform stage emits a ``status`` column
("ok" or an error message) instead of crashing the task or silently
dropping the row; ``split_dead_letters`` then forks the stream — ok rows
flow on, failed rows go to a side Parquet sink next to the output (the
resumable, inspectable replacement for an append-mode error file)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

STATUS_OK = "ok"


def split_dead_letters(ds: Dataset, status_col: str = "status",
                       dead_path: str | None = None,
                       drop_status: bool = True) -> tuple[Dataset, int]:
    """Fork a stream carrying a ``status`` column: returns ``(ok_rows,
    n_dead)``; failed rows are written to ``dead_path`` (partitioned
    Parquet) when given. The input is pinned once — it feeds two consumers."""
    ds = ds.materialize()

    def only(want_ok: bool):
        def fn(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch.column(status_col), STATUS_OK)
            if not want_ok:
                mask = pc.invert(mask)
            out = batch.filter(pc.fill_null(mask, not want_ok))
            if want_ok and drop_status:
                out = out.drop_columns([status_col])
            return out
        return fn

    dead = ds.map_batches(only(False), batch_format="pyarrow")
    n_dead = dead.count()
    if dead_path is not None and n_dead:
        dead.write_parquet(dead_path)
    return ds.map_batches(only(True), batch_format="pyarrow"), n_dead
