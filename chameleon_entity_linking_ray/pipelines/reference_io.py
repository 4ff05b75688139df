"""Reference-I/O pipelines: every query here ROUND-TRIPS through a real
reference-format artifact (TSV / entity-literal TSV / TREC run file /
gzip-JSONL / gzip-pickle) written under /tmp, re-read through the
``sources.ingest`` readers, and then verified value-for-value against a
DuckDB oracle computed straight from the parquet tables — proving the
readers parse what the reference tooling writes (SURVEY.md S1-S5).

Artifacts are derived deterministically from the sf tables, so the oracle
needs no access to the intermediate files.
"""

from __future__ import annotations

import gzip
import json
import os
import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset

from chameleon_entity_linking_ray.pipelines.analytics import read_table
from chameleon_entity_linking_ray.pipelines.corpus import _title_sentence
from chameleon_entity_linking_ray.stages.agg import grouped_agg, grouped_top_k


def _io_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = f"/tmp/graft_io/{tag}"
    os.makedirs(path, exist_ok=True)
    return path


# ------------------------------------------------------- S1: id\ttext TSV

def tsv_mentions(sf_dir: str) -> Dataset:
    """part -> ``collection.tsv``-format file -> ``read_id_text_tsv`` ->
    mention extraction. Same output contract as ``part_mentions``, but the
    corpus travels through the reference's TSV format (S1 parity,
    /root/reference/BiEncoder/train.py:49-55)."""
    from chameleon_entity_linking_ray.config import LinkageConfig
    from chameleon_entity_linking_ray.sources.ingest import read_id_text_tsv
    from chameleon_entity_linking_ray.stages.extract import find_mentions_batch

    parts = read_table(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])
    tdf = pa.concat_tables(
        [_title_sentence(b) for b in parts.iter_batches(batch_format="pyarrow")]
    ).to_pandas().sort_values("p_partkey")
    path = os.path.join(_io_dir(sf_dir), "parts_collection.tsv")
    with open(path, "w", encoding="utf8") as f:
        for pid, text in zip(tdf["p_partkey"], tdf["text"]):
            f.write(f"{pid}\t{text}\n")

    thr = LinkageConfig().rho_threshold

    def count_mentions(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        row, *_ = find_mentions_batch(texts, thr)
        counts = np.bincount(row, minlength=len(texts)).astype(np.int64)
        return pa.table({"p_partkey": batch.column("id").cast(pa.int64()),
                         "n_mentions": pa.array(counts, pa.int64())})

    return read_id_text_tsv(path).map_batches(count_mentions,
                                              batch_format="pyarrow")


# ------------------------------------- S2: entity-literal TSV (+ S9 sink)

def entity_tsv_stats(sf_dir: str) -> Dataset:
    """part -> entity-annotation TSV (second column a Python literal, the
    reference's ``eval()`` format) -> ``read_entity_literal_tsv`` (typed
    list<struct>, ``ast.literal_eval``) -> per-id stats. Oracle recomputes
    n_entities + max rho from the extraction formula directly."""
    from chameleon_entity_linking_ray.config import LinkageConfig
    from chameleon_entity_linking_ray.sources.ingest import read_entity_literal_tsv
    from chameleon_entity_linking_ray.stages.extract import find_mentions

    parts = read_table(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])
    tdf = pa.concat_tables(
        [_title_sentence(b) for b in parts.iter_batches(batch_format="pyarrow")]
    ).to_pandas().sort_values("p_partkey")
    thr = LinkageConfig().rho_threshold
    path = os.path.join(_io_dir(sf_dir), "parts_entities.tsv")
    with open(path, "w", encoding="utf8") as f:
        for pid, text in zip(tdf["p_partkey"], tdf["text"]):
            anns = [{"spot": s, "title": s, "start": a, "end": b,
                     "rho": r, "id": -1}
                    for (a, b, s, r) in find_mentions(text, thr)]
            f.write(f"{pid}\t{anns!r}\n")

    ds, _n_dead = _split_ok(read_entity_literal_tsv(path))

    def stats(batch: pa.Table) -> pa.Table:
        ents = batch.column("entities")
        n = pc.cast(pc.list_value_length(ents), pa.int64())
        rhos = [max((e["rho"] for e in row), default=0.0)
                for row in ents.to_pylist()]
        return pa.table({
            "p_partkey": batch.column("id").cast(pa.int64()),
            "n_entities": n,
            "max_rho": pa.array(np.round(np.asarray(rhos, np.float64), 6),
                                pa.float64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def _split_ok(ds: Dataset):
    from chameleon_entity_linking_ray.stages.deadletter import split_dead_letters
    return split_dead_letters(ds)


# ------------------------------------------------ S3+S7+D1: TREC run merge

def trec_merge(sf_dir: str) -> Dataset:
    """Write two real TREC run files (S7 writer), read them back (S3
    reader), merge with keep-first semantics (D1,
    /root/reference/utils/merge_results.py): the pruned run wins, the full
    run fills unseen (qid, pid). Output (qid, pid, src)."""
    from chameleon_entity_linking_ray.functions.runfile import rank_run, write_trec
    from chameleon_entity_linking_ray.sources.ingest import read_trec_run

    orders = read_table(sf_dir, "orders",
                        ["o_custkey", "o_orderkey", "o_totalprice",
                         "o_orderstatus"])

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({"qid": batch.column("o_custkey"),
                         "pid": batch.column("o_orderkey"),
                         "score": batch.column("o_totalprice"),
                         "status": batch.column("o_orderstatus")})

    run = orders.map_batches(shape, batch_format="pyarrow")
    pruned = rank_run(run.filter(expr="status == 'F'")
                      .drop_columns(["status"]), k=3)
    full = rank_run(run.drop_columns(["status"]), k=3)
    d = _io_dir(sf_dir)
    ppath, fpath = os.path.join(d, "run_pruned.txt"), os.path.join(d, "run_full.txt")
    write_trec(pruned, ppath, tag="pruned")
    write_trec(full, fpath, tag="full")

    def tag_src(src: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "qid": pc.cast(batch.column("qid"), pa.int64()),
                "pid": pc.cast(batch.column("pid"), pa.int64()),
                "src": pa.array(np.full(batch.num_rows, src, np.int64),
                                pa.int64()),
            })
        return fn

    both = read_trec_run(ppath).map_batches(tag_src(0), batch_format="pyarrow") \
        .union(read_trec_run(fpath).map_batches(tag_src(1),
                                                batch_format="pyarrow"))
    return grouped_agg(both, keys=["qid", "pid"], aggs={"src": ("src", "min")})


# ------------------------------------------- S4+O6: gzip-JSONL negatives

def hard_negative_pairs(sf_dir: str) -> Dataset:
    """Derive a reference-format hard-negatives ``jsonl.gz`` from orders
    (qid = custkey; pos = top order by price; neg systems 'price' = price
    ranks 2.., 'key' = smallest orderkeys excluding the positive), read it
    with the gzip-JSONL reader (S4), and run the reference's
    per-system/cross-system negative selection (O6-adjacent,
    /root/reference/BiEncoder/train.py:100-122). Output (qid, pid, label)."""
    from chameleon_entity_linking_ray.sources.ingest import (
        read_jsonl_gz, select_hard_negatives)

    orders = read_table(sf_dir, "orders",
                        ["o_custkey", "o_orderkey", "o_totalprice"]).to_pandas()
    orders = orders.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                                ascending=[True, False, True], kind="mergesort")
    path = os.path.join(_io_dir(sf_dir), "hard_negatives.jsonl.gz")
    with gzip.open(path, "wt") as f:
        for qid, grp in orders.groupby("o_custkey", sort=True):
            keys = grp["o_orderkey"].tolist()
            pos = keys[0]
            by_price = keys[1:7]
            by_key = sorted(k for k in keys if k != pos)[:6]
            if not by_price and not by_key:
                continue
            f.write(json.dumps({"qid": int(qid), "pos": [int(pos)],
                                "neg": {"price": [int(x) for x in by_price],
                                        "key": [int(x) for x in by_key]}})
                    + "\n")

    ds = read_jsonl_gz(path)
    return select_hard_negatives(ds, negs_to_use=["price", "key"],
                                 num_negs_per_system=4)


# ------------------------------------------------- T7/J7: teacher scores

def teacher_scores(sf_dir: str) -> Dataset:
    """Write a gzip-pickle teacher cache ((qid,pid)->score, the reference's
    ce_scores file format, /root/reference/BiEncoder/train.py:86-89), read
    it back (S5), and broadcast-join it onto the per-customer top-3 pair
    table (T7/J7). Pairs without a teacher score get -1.0."""
    from chameleon_entity_linking_ray.sources.ingest import (
        join_teacher_scores, read_score_pickle_gz)

    orders = read_table(sf_dir, "orders",
                        ["o_custkey", "o_orderkey", "o_totalprice",
                         "o_orderstatus"])
    odf = orders.to_pandas()
    fin = odf[odf["o_orderstatus"] == "F"]
    cache = {(int(q), int(p)): round(float(t) * 0.001, 6)
             for q, p, t in zip(fin["o_custkey"], fin["o_orderkey"],
                                fin["o_totalprice"])}
    path = os.path.join(_io_dir(sf_dir), "teacher_scores.pkl.gz")
    with gzip.open(path, "wb") as f:
        pickle.dump(cache, f)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({"qid": batch.column("o_custkey"),
                         "pid": batch.column("o_orderkey"),
                         "score": batch.column("o_totalprice")})

    pairs = grouped_top_k(orders.map_batches(shape, batch_format="pyarrow"),
                          group_keys=["qid"], by=["score", "pid"],
                          ascending=[False, True], k=3).drop_columns(["score"])
    scores = read_score_pickle_gz(path)
    out = join_teacher_scores(pairs, scores, default=-1.0)

    def final(batch: pa.Table) -> pa.Table:
        return pa.table({
            "qid": pc.cast(batch.column("qid"), pa.int64()),
            "pid": pc.cast(batch.column("pid"), pa.int64()),
            "ce_score": batch.column("ce_score"),
        })

    return out.map_batches(final, batch_format="pyarrow")


# --------------------------------------------------- A5: IR metric rollup

def ir_metrics(sf_dir: str, k: int = 10) -> Dataset:
    """Grouped IR metrics over a (run, qrels) pair derived from orders:
    run = every order of a customer scored by totalprice, qrels = finished
    orders (rel=1). One global row of means (stages/metrics.py; reference:
    ir_measures.calc_aggregate, /root/reference/BiEncoder/test.py:134-137)."""
    from chameleon_entity_linking_ray.stages.metrics import ir_metrics_aggregate

    orders = read_table(sf_dir, "orders",
                        ["o_custkey", "o_orderkey", "o_totalprice",
                         "o_orderstatus"])

    def run_rows(batch: pa.Table) -> pa.Table:
        # rel is derivable from the run rows here (qrels ⊆ run), so the
        # run carries it inline and the metric op skips its join
        rel = pc.cast(pc.equal(batch.column("o_orderstatus"), "F"),
                      pa.int64())
        return pa.table({"qid": pc.cast(batch.column("o_custkey"), pa.int64()),
                         "pid": pc.cast(batch.column("o_orderkey"), pa.int64()),
                         "score": batch.column("o_totalprice"),
                         "rel": rel})

    run = orders.map_batches(run_rows, batch_format="pyarrow")
    return ir_metrics_aggregate(run, None, k=k)


# ------------------------------- partitioned (hive) parquet sink roundtrip

def partitioned_docs(sf_dir: str) -> Dataset:
    """RESUMABLE-OUTPUT surface: documents written as hive-partitioned
    Parquet (one directory per ``lang`` — the layout that lets a failed
    100 TB run skip finished partitions and lets readers prune at the
    directory level), then read back with a PARTITION-PRUNED read (only
    en/de directories listed; fr/und never touched) and re-aggregated.
    The oracle computes the same per-lang stats straight from the source
    table, so the write->prune->read path is value-verified."""
    import shutil

    out = os.path.join(_io_dir(sf_dir), "docs_by_lang")
    shutil.rmtree(out, ignore_errors=True)
    docs = read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    docs.write_parquet(out, partition_cols=["lang"])

    # partition-pruned read: ONLY the en/de directories are listed; the
    # partition value lives in the directory name, so each pruned read
    # re-attaches it as a constant column (what a hive-aware reader does)
    def attach(lg: str):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "lang": pa.array([lg] * batch.num_rows, pa.string()),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            })
        return f

    parts = [ray.data.read_parquet(f"{out}/lang={lg}")
             .map_batches(attach(lg), batch_format="pyarrow")
             for lg in ("en", "de") if os.path.isdir(f"{out}/lang={lg}")]
    back = parts[0]
    for p in parts[1:]:
        back = back.union(p)

    return grouped_agg(back, keys=["lang"],
                       aggs={"n_docs": (None, "count"),
                             "sum_chars": ("n_chars", "sum"),
                             "max_doc": ("doc_id", "max")})


# --------------------------- M5: synthetic-span arithmetic conformance

def entity_span_quirk(sf_dir: str, max_doc: int = 200) -> Dataset:
    """M5 conformance, value-verified: the reference's entities-only
    span recomputation (/root/reference/BiEncoder/model.py:168-186,
    duplicated Fully/model.py:72-90) INCLUDING both faithful quirks —
    span end is ``start + len - 1`` (inclusive), and for idx >= 2 the
    start offset is ``len(previous entity) + 1`` only (NOT the
    cumulative prefix), so third-and-later spans do not actually index
    the joined string. Entity lists are the whitespace tokens of each
    document's text (idx = token ordinal), making the arithmetic
    SQL-expressible via LAG for the DuckDB oracle.

    One row per (doc, idx): (doc_id, idx, entity, start_q, end_q).
    Fully vectorized — the doc_token_rows offset-arithmetic explode plus
    shifted length arrays; the scalar reference-shaped loop lives in
    functions/spans.synthetic_entity_spans and is pytest-pinned equal.
    """
    docs = read_table(sf_dir, "documents", ["doc_id", "text"]) \
        .filter(expr=f"doc_id < {max_doc}")

    def spans(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "idx": pa.array([], pa.int64()),
                          "entity": pa.array([], pa.string()),
                          "start_q": pa.array([], pa.int64()),
                          "end_q": pa.array([], pa.int64())})
        text = pc.utf8_trim_whitespace(batch.column("text"))
        sub = batch.filter(pc.greater(pc.utf8_length(text), 0))
        if sub.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(sub.column("text")), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lens = np.diff(np.asarray(toks.offsets))
        total = int(lens.sum())
        if total == 0:
            return empty
        tl = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = sub.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = np.cumsum(lens) - lens
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        prev_tl = np.r_[np.int64(0), tl[:-1]]  # idx==0 rows ignore it
        start_q = np.where(idx == 0, 0, prev_tl + 1)
        end_q = start_q + tl - 1
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
            "idx": pa.array(idx, pa.int64()),
            "entity": flat,
            "start_q": pa.array(start_q.astype(np.int64), pa.int64()),
            "end_q": pa.array(end_q.astype(np.int64), pa.int64())})

    return docs.map_batches(spans, batch_format="pyarrow")


# -------------------- S6 format parity: page_link.tsv reversed edges

def page_link_degrees(sf_dir: str, max_part: int = 500) -> Dataset:
    """S6 format-parity roundtrip: the co-purchase edge set (bounded to
    parts < ``max_part`` so the artifact stays small at any sf) is
    written to a ``page_link.tsv``-format file — header line + one
    ``dst\\tsrc`` line per edge, the reference's storage convention —
    then re-read through ``sources.ingest.read_page_link_tsv`` (which
    performs the reversed-edge build of
    /root/reference/utils/entity_expander.py:31-35), and reduced to a
    per-source out-degree table the DuckDB oracle recomputes from
    lineitem directly. A wrong direction in either the writer or the
    reader flips src/dst and breaks the degree counts."""
    from chameleon_entity_linking_ray.sources.ingest import (
        read_page_link_tsv,
    )
    from chameleon_entity_linking_ray.stages.graph import copurchase_edges

    edges = copurchase_edges(sf_dir) \
        .filter(expr=f"src < {max_part} and dst < {max_part}")
    df = pa.concat_tables(
        [b for b in edges.iter_batches(batch_format="pyarrow")]
    ).to_pandas().sort_values(["src", "dst"])
    path = os.path.join(_io_dir(sf_dir), "page_link.tsv")
    with open(path, "w", encoding="utf8") as f:
        f.write("pl_to\tpl_from\n")  # header, skipped as lines[1:]
        for s, d in zip(df["src"], df["dst"]):
            f.write(f"{d}\t{s}\n")  # edge src->dst stored as "dst\tsrc"

    back = read_page_link_tsv(path)
    return grouped_agg(back, keys=["src"],
                       aggs={"out_degree": (None, "count")}) \
        .map_batches(lambda b: pa.table({
            "part": b.column("src").cast(pa.int64()),
            "out_degree": b.column("out_degree").cast(pa.int64())}),
            batch_format="pyarrow")
