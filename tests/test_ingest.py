"""Reference-format ingest readers (sources/ingest.py): TSV, entity-literal
TSV with the dead-letter channel, TREC runs, gzip-JSONL negatives, teacher
scores."""

import gzip
import json
import pickle

import numpy as np
import pytest
import ray.data as rd


class TestTsvReaders:
    def test_id_text_roundtrip(self, tmp_path):
        from chameleon_entity_linking_ray.sources.ingest import read_id_text_tsv
        p = tmp_path / "collection.tsv"
        rows = [(7, "hello world"), (13, "tab-free text"), (2, "a b c")]
        p.write_text("".join(f"{i}\t{t}\n" for i, t in rows))
        got = read_id_text_tsv(str(p)).to_pandas().sort_values("id")
        assert got["id"].tolist() == [2, 7, 13]
        assert got.set_index("id")["text"][7] == "hello world"

    def test_entity_literal_and_dead_letters(self, tmp_path):
        from chameleon_entity_linking_ray.sources.ingest import (
            read_entity_literal_tsv)
        from chameleon_entity_linking_ray.stages.deadletter import (
            split_dead_letters)
        p = tmp_path / "entities.tsv"
        good = [{"spot": "Wayne", "title": "Wayne Ind", "start": 3, "end": 8,
                 "rho": 0.5, "id": 42}]
        p.write_text(
            f"1\t{good!r}\n"
            "2\t[{'spot': 'NoTitle', 'start': 0, 'end': 7, 'rho': 0.3}]\n"
            "3\tnot [ a literal\n"
            "4\t[]\n")
        ds = read_entity_literal_tsv(str(p))
        dead_dir = str(tmp_path / "dead")
        ok, n_dead = split_dead_letters(ds, dead_path=dead_dir)
        assert n_dead == 1
        okdf = ok.to_pandas().sort_values("id").set_index("id")
        assert sorted(okdf.index) == [1, 2, 4]
        ents = okdf.loc[1, "entities"]
        assert ents[0]["title"] == "Wayne Ind" and ents[0]["page_id"] == 42
        # title falls back to spot (reference model.py:404 semantics)
        assert okdf.loc[2, "entities"][0]["title"] == "NoTitle"
        dead = rd.read_parquet(dead_dir).to_pandas()
        assert dead["id"].tolist() == [3]
        assert dead["status"].iloc[0].startswith("parse_error")

    def test_trec_run_roundtrip(self, tmp_path):
        from chameleon_entity_linking_ray.sources.ingest import read_trec_run
        p = tmp_path / "run.txt"
        p.write_text("q1 Q0 d9 1 3.25 tag\nq1 Q0 d2 2 1.5 tag\n"
                     "q2 Q0 d1 1 9.0 tag\n")
        got = read_trec_run(str(p)).to_pandas().sort_values(["qid", "rank"])
        assert got["pid"].tolist() == ["d9", "d2", "d1"]
        assert got["score"].tolist() == [3.25, 1.5, 9.0]


class TestHardNegatives:
    def test_jsonl_gz_and_selection(self, tmp_path):
        from chameleon_entity_linking_ray.sources.ingest import (
            read_jsonl_gz, select_hard_negatives)
        p = tmp_path / "negs.jsonl.gz"
        with gzip.open(p, "wt") as f:
            f.write(json.dumps({"qid": 1, "pos": [100],
                                "neg": {"sysA": [5, 6, 7, 8, 9, 10],
                                        "sysB": [7, 8, 20, 21, 22]}}) + "\n")
            f.write(json.dumps({"qid": 2, "pos": [200], "neg": {}}) + "\n")
        long = read_jsonl_gz(str(p)).to_pandas()
        assert len(long) == 13  # 2 pos + 6 + 5 neg rows
        out = select_hard_negatives(
            rd.from_pandas(long), negs_to_use=["sysA", "sysB"],
            num_negs_per_system=4).to_pandas()
        # qid 2 has no negatives -> dropped entirely (reference behavior)
        assert set(out["qid"]) == {1}
        negs = sorted(out.loc[out["label"] == 0.0, "pid"])
        # sysA contributes 5,6,7,8; sysB walks 7,8 (dups, skipped) then
        # 20,21,22 — only NEW pids count toward its cap of 4
        assert negs == [5, 6, 7, 8, 20, 21, 22]
        assert out.loc[out["label"] == 1.0, "pid"].tolist() == [100]


class TestTeacherScores:
    def test_pickle_roundtrip_and_join(self, tmp_path):
        from chameleon_entity_linking_ray.sources.ingest import (
            join_teacher_scores, read_score_pickle_gz)
        p = tmp_path / "scores.pkl.gz"
        with gzip.open(p, "wb") as f:
            pickle.dump({1: {10: 0.9, 11: 0.1}, 2: {10: 0.5}}, f)
        scores = read_score_pickle_gz(str(p))
        assert scores.count() == 3
        pairs = rd.from_items([{"qid": 1, "pid": 10}, {"qid": 1, "pid": 99},
                               {"qid": 2, "pid": 10}])
        out = join_teacher_scores(pairs, scores, default=-1.0).to_pandas() \
            .sort_values(["qid", "pid"])
        assert out["ce_score"].tolist() == [0.9, -1.0, 0.5]


class TestIrMetrics:
    def test_against_manual(self):
        from chameleon_entity_linking_ray.stages.metrics import (
            ir_metrics_aggregate, per_query_ir_metrics)
        # q1: rel docs at ranks 1 and 3 of 4; q2: no rel
        run = rd.from_items([
            {"qid": 1, "pid": p, "score": float(10 - p)} for p in range(4)
        ] + [{"qid": 2, "pid": p, "score": float(p)} for p in range(3)])
        qrels = rd.from_items([{"qid": 1, "pid": 0, "rel": 1},
                               {"qid": 1, "pid": 2, "rel": 1}])
        perq = per_query_ir_metrics(run, qrels, k=3).to_pandas() \
            .set_index("qid")
        # q1 ranking by score desc: pid 0 (rel), 1, 2 (rel), 3
        assert perq.loc[1, "p_at_k"] == pytest.approx(2 / 3)
        assert perq.loc[1, "rr"] == pytest.approx(1.0)
        assert perq.loc[1, "r_at_k"] == pytest.approx(1.0)
        assert perq.loc[1, "ap"] == pytest.approx((1 / 1 + 2 / 3) / 2)
        dcg = 1 / np.log2(2) + 1 / np.log2(4)
        idcg = 1 / np.log2(2) + 1 / np.log2(3)
        assert perq.loc[1, "ndcg"] == pytest.approx(dcg / idcg)
        for c in ["ndcg", "p_at_k", "ap", "rr", "r_at_k"]:
            assert perq.loc[2, c] == 0.0
        agg = ir_metrics_aggregate(run, qrels, k=3).to_pandas()
        assert int(agg["n_queries"].iloc[0]) == 2
        assert agg["rr"].iloc[0] == pytest.approx(0.5)

    def test_qrels_only_docs_count_in_recall(self):
        from chameleon_entity_linking_ray.stages.metrics import (
            per_query_ir_metrics)
        run = rd.from_items([{"qid": 1, "pid": 0, "score": 1.0}])
        qrels = rd.from_items([{"qid": 1, "pid": 0, "rel": 1},
                               {"qid": 1, "pid": 99, "rel": 1}])
        perq = per_query_ir_metrics(run, qrels, k=10).to_pandas()
        assert perq["r_at_k"].iloc[0] == pytest.approx(0.5)
