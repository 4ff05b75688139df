"""Model-backed retrieval: the reference's end-to-end INFERENCE flow —
bi-encoder corpus encoding -> flat-index top-k search -> TREC-shaped run
-> cross-encoder rerank (/root/reference/BiEncoder/test_retrieval.py:18-88
+ /root/reference/CrossEncoder/test.py) — re-expressed Ray-Data-first:

- corpus encoding is an ACTOR-POOL ``map_batches`` (``ModelEmbedder``:
  weights broadcast once via ``ray.put``, fetched per actor in
  ``__init__``; tokenize + length-sorted padded collate + batched
  attention forward per batch) instead of the reference's 9x1M driver
  loop over ``model.encode``;
- the FAISS ``IndexFlatL2`` brute-force search is a broadcast-query
  matmul COMBINER: the (fixed, small) query matrix rides to every task,
  each corpus batch emits only its own per-query top-k, and one bucketed
  ``grouped_top_k`` finishes — the corpus embeddings stream and are never
  materialized (the scale path swaps the combiner for the IVF variant in
  ``pipelines/corpus.ann_ivf_topk``; the dataflow around it is unchanged);
- the rerank is a second actor pool in ``mode="cross"`` with entity
  markers on (M6) and the per-row text-only fallback column (M7).

Query count is a KNOB (fixed small set, reference dev.small style), so
the driver holds O(n_queries * top_k) rows at any corpus scale. Model
scores are not SQL-expressible: the driver gate records rows-only; value
conformance is pytest-pinned against a single-process recomputation with
the same seeded weights (tests/test_retrieval_pipeline.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from chameleon_entity_linking_ray.pipelines.analytics import read_table
from chameleon_entity_linking_ray.stages.agg import grouped_top_k


def make_queries(sf_dir: str, n_queries: int = 24,
                 q_tokens: int = 6) -> pd.DataFrame:
    """Deterministic dev-style query set: the first ``q_tokens`` tokens of
    the ``n_queries`` smallest doc_ids (qid = doc_id). Fixed-size by
    construction — the driver-held state is a knob, not the corpus."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def prefix(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.less(batch.column("doc_id"),
                                    pa.scalar(n_queries)))
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(keep.column("text")), r"\s+")
        qtext = pc.binary_join(pc.list_slice(toks, 0, q_tokens), " ")
        return pa.table({"qid": keep.column("doc_id").cast(pa.int64()),
                         "query": qtext.cast(pa.string())})

    out = docs.map_batches(prefix, batch_format="pyarrow").to_pandas()
    return out.sort_values("qid").reset_index(drop=True)


def model_retrieval_run(sf_dir: str, n_queries: int = 24, top_k: int = 10,
                        rerank: bool = True, snippet_tokens: int = 10,
                        concurrency: tuple = (1, 8), device: str = "cpu",
                        num_gpus: float = 0.0) -> Dataset:
    """Full retrieve(+rerank) run table: (qid, pid, rank_bi, score_bi
    [, score_ce, rank_ce, tok_fallback]). ``score_bi = 1/rank_bi`` is the
    reference's run-file score formula (test_retrieval.py:82).

    ``device`` / ``num_gpus``: GPU-readiness knobs for the encode pool —
    the device string resolves with the reference's cuda-if-available
    fallback (``stages.model.resolve_device``), ``num_gpus > 0`` reserves
    that fraction per encoder actor. CPU defaults leave the plan
    unchanged."""
    from chameleon_entity_linking_ray.stages.model import (
        ModelEmbedder,
        ModelPairScorer,
        SyntheticWeights,
    )

    weights = SyntheticWeights()
    w_ref = ray.put(weights)

    # ---- encode the query set once on the driver (Q rows, a knob) ----
    # the query encoder fetches the SAME broadcast weights the corpus
    # pool uses — one generation, no by-construction-identity assumption
    qdf = make_queries(sf_dir, n_queries=n_queries)
    enc = ModelEmbedder(weights_ref=w_ref)
    enc._embed_surfaces(qdf["query"].tolist())
    qmat = np.stack([enc._emb_cache[t]
                     for t in qdf["query"]]).astype(np.float32)
    q_ref = ray.put((qdf["qid"].to_numpy(np.int64), qmat,
                     qdf["query"].tolist()))

    # ---- corpus encoding: actor pool (the 9x1M encode loop) ----------
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    enc_extra: dict = {"num_gpus": num_gpus} if num_gpus > 0 else {}
    embedded = docs.map_batches(
        ModelEmbedder,
        fn_constructor_kwargs={"weights_ref": w_ref, "device": device},
        batch_format="pyarrow", batch_size=256, concurrency=concurrency,
        **enc_extra)

    # ---- IndexFlatL2 search: per-batch top-k combiner ----------------
    def search(batch: pa.Table) -> pa.Table:
        qids, qm, _ = ray.get(q_ref)
        n = batch.num_rows
        if n == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "pid": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.float64()),
                             "text": pa.array([], pa.string())})
        em = batch.column("embedding").combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(n, -1) \
            .astype(np.float64)
        # ||c - q||^2 = ||c||^2 - 2 c.q + ||q||^2, float64 accumulate
        d2 = (np.einsum("ij,ij->i", em, em)[:, None]
              - 2.0 * (em @ qm.T.astype(np.float64))
              + np.einsum("ij,ij->i", qm.astype(np.float64),
                          qm.astype(np.float64))[None, :])
        k = min(top_k, n)
        pids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        # per-query k smallest within this batch (ties -> smaller pid);
        # the loop is over the FIXED query set, not over rows
        out_rows, out_qj = [], []
        for j in range(len(qids)):
            sel = np.lexsort((pids, d2[:, j]))[:k]
            out_rows.append(sel)
            out_qj.append(np.full(k, j, np.int64))
        rows = np.concatenate(out_rows)
        qj = np.concatenate(out_qj)
        return pa.table({
            "qid": pa.array(qids[qj], pa.int64()),
            "pid": pa.array(pids[rows], pa.int64()),
            "dist": pa.array(d2[rows, qj], pa.float64()),
            "text": pa.array([texts[i] for i in rows], pa.string()),
        })

    cands = embedded.map_batches(search, batch_format="pyarrow")
    top = grouped_top_k(cands, ["qid"], by=["dist", "pid"],
                        ascending=[True, True], k=top_k,
                        rank_col="rank_bi")

    def bi_shape(batch: pa.Table) -> pa.Table:
        rank = batch.column("rank_bi").cast(pa.int64())
        return pa.table({
            "qid": batch.column("qid").cast(pa.int64()),
            "pid": batch.column("pid").cast(pa.int64()),
            "rank_bi": rank,
            "score_bi": pc.divide(pa.scalar(1.0),
                                  rank.cast(pa.float64())),
            "text": batch.column("text"),
        })

    # the run table is O(n_queries * top_k) — materializing it ENDS the
    # encode lineage (embed pool released) before the rerank pool starts;
    # without the cut both pools coexist and can starve a small cluster
    run = top.map_batches(bi_shape, batch_format="pyarrow").materialize()
    if not rerank:
        return run.drop_columns(["text"])

    # ---- cross-encoder rerank over the candidate run -----------------
    # the passage side is truncated to a snippet BEFORE tokenization (the
    # reference's max_seq_length truncation analog, test_retrieval.py:21);
    # short snippets take the entity-marked path (M6), long-word ones
    # overflow and surface the per-row text-only fallback (M7) — both
    # branches run in the same pool
    def pair_shape(batch: pa.Table) -> pa.Table:
        qids, _, qtexts = ray.get(q_ref)
        lut = dict(zip(qids.tolist(), qtexts))
        q = batch.column("qid").to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch.column("text")), r"\s+")
        snip = pc.binary_join(pc.list_slice(toks, 0, snippet_tokens), " ")
        return batch.append_column(
            "left_text", pa.array([lut[int(x)] for x in q], pa.string())) \
            .append_column("right_text", snip.cast(pa.string()))

    scored = run.map_batches(pair_shape, batch_format="pyarrow") \
        .map_batches(ModelPairScorer,
                     fn_constructor_kwargs={"weights_ref": w_ref,
                                            "mode": "cross",
                                            "use_entity_markers": True},
                     batch_format="pyarrow", batch_size=512,
                     concurrency=concurrency)

    def ce_shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "qid": batch.column("qid"),
            "pid": batch.column("pid"),
            "rank_bi": batch.column("rank_bi"),
            "score_bi": batch.column("score_bi"),
            "score_ce": batch.column("score").cast(pa.float64()),
            "tok_fallback": batch.column("tok_fallback"),
        })

    reranked = scored.map_batches(ce_shape, batch_format="pyarrow")
    return grouped_top_k(reranked, ["qid"],
                         by=["score_ce", "pid"], ascending=[False, True],
                         k=top_k, rank_col="rank_ce")
