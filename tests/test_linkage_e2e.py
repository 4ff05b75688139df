"""Golden end-to-end tests (SURVEY.md §5): pairwise F1 vs planted truth,
per-turn invariants, determinism, skew, checkpoint resume."""

from itertools import combinations

import pandas as pd
import pytest
import ray.data as rd

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.pipelines.linkage import (
    annotate_transcripts,
    run_linkage,
    run_linkage_on_parquet,
)
from chameleon_entity_linking_ray.testing.synth import make_transcripts, write_fixture


def pairwise_f1(clustered: pd.DataFrame, truth: pd.DataFrame) -> tuple[float, float, float]:
    m = clustered.merge(truth[["mention_id", "entity_id"]], on="mention_id")

    def pairset(labels: pd.Series) -> set:
        out = set()
        for _, grp in labels.groupby(labels).groups.items():
            out.update(combinations(sorted(grp), 2))
        return out

    pred = pairset(m.set_index("mention_id")["cluster_id"])
    gold = pairset(m.set_index("mention_id")["entity_id"])
    tp = len(pred & gold)
    p = tp / max(1, len(pred))
    r = tp / max(1, len(gold))
    return p, r, 2 * p * r / max(1e-9, p + r)


@pytest.fixture(scope="module")
def small_case():
    transcripts, truth = make_transcripts(n_convs=40, n_entities=10, seed=42)
    ds = rd.from_arrow(transcripts).select_columns(["conv_id", "turn_idx", "text"])
    clustered, metrics = run_linkage(ds, LinkageConfig())
    return transcripts, truth.to_pandas(), clustered.to_pandas(), metrics


class TestGolden:
    def test_pairwise_f1_geq_099(self, small_case):
        _, truth, clustered, _ = small_case
        p, r, f1 = pairwise_f1(clustered, truth)
        assert f1 >= 0.99, (p, r, f1)

    def test_all_planted_mentions_extracted(self, small_case):
        _, truth, clustered, _ = small_case
        assert set(truth["mention_id"]) <= set(clustered["mention_id"])

    def test_output_sorted_stable(self, small_case):
        _, _, clustered, _ = small_case
        key = clustered[["conv_id", "turn_idx", "span_start"]]
        assert key.equals(key.sort_values(["conv_id", "turn_idx", "span_start"])
                          .reset_index(drop=True))

    def test_same_norm_same_cluster(self, small_case):
        _, _, clustered, _ = small_case
        assert (clustered.groupby("norm")["cluster_id"].nunique() == 1).all()


class TestDeterminism:
    def test_rerun_identical(self):
        transcripts, _ = make_transcripts(n_convs=10, n_entities=5, seed=7)
        ds = rd.from_arrow(transcripts).select_columns(["conv_id", "turn_idx", "text"])
        a, _ = run_linkage(ds, LinkageConfig())
        b, _ = run_linkage(ds, LinkageConfig())
        assert a.to_pandas().equals(b.to_pandas())


class TestTurnInvariant:
    def test_text_byte_equality_and_order(self):
        transcripts, _ = make_transcripts(n_convs=12, n_entities=5, seed=11)
        full = rd.from_arrow(transcripts)
        clustered, _ = run_linkage(
            full.select_columns(["conv_id", "turn_idx", "text"]), LinkageConfig())
        out = annotate_transcripts(full, clustered).to_pandas()
        inp = transcripts.to_pandas().sort_values(["conv_id", "turn_idx"]) \
            .reset_index(drop=True)
        out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert len(out) == len(inp)
        assert (out["text"] == inp["text"]).all()
        assert out["conv_id"].tolist() == inp["conv_id"].tolist()
        assert out["turn_idx"].tolist() == inp["turn_idx"].tolist()


class TestSkew:
    def test_hot_entity_completes_and_clusters(self):
        # one entity in ~40% of mention slots (hot tool-name scenario)
        transcripts, truth = make_transcripts(
            n_convs=40, n_entities=8, seed=13, hot_entity_mass=0.4)
        cfg = LinkageConfig(max_block_size=16, pair_window=4)
        ds = rd.from_arrow(transcripts).select_columns(["conv_id", "turn_idx", "text"])
        clustered, _ = run_linkage(ds, cfg)
        p, r, f1 = pairwise_f1(clustered.to_pandas(), truth.to_pandas())
        assert f1 >= 0.99, (p, r, f1)


class TestResume:
    def test_resume_byte_identical(self, tmp_path):
        tp, _ = write_fixture(str(tmp_path / "fix"), n_convs=8, n_entities=5, seed=3)
        ck = str(tmp_path / "ckpt")
        a, m1 = run_linkage_on_parquet(tp, LinkageConfig(), checkpoint_dir=ck)
        df_a = a.to_pandas()
        b, m2 = run_linkage_on_parquet(tp, LinkageConfig(), checkpoint_dir=ck)
        df_b = b.to_pandas()
        assert df_a.equals(df_b)
        assert all(v.get("resumed") for k, v in m2.items()
                   if k in ("mentions", "vocab", "pairs", "scores", "clusters"))

    def test_partial_resume_after_kill(self, tmp_path):
        """Simulate a kill after the pairs stage: later checkpoints absent."""
        import json
        import shutil

        tp, _ = write_fixture(str(tmp_path / "fix"), n_convs=8, n_entities=5, seed=3)
        ck = str(tmp_path / "ckpt")
        a, _ = run_linkage_on_parquet(tp, LinkageConfig(), checkpoint_dir=ck)
        df_a = a.to_pandas()
        # drop everything after "pairs" from disk + manifest
        mpath = f"{ck}/manifest.json"
        manifest = json.load(open(mpath))
        for stage in ("scores", "assignments", "clusters"):
            manifest["stages"].pop(stage, None)
            shutil.rmtree(f"{ck}/{stage}", ignore_errors=True)
        json.dump(manifest, open(mpath, "w"))
        b, m2 = run_linkage_on_parquet(tp, LinkageConfig(), checkpoint_dir=ck)
        assert m2["pairs"].get("resumed")
        assert b.to_pandas().equals(df_a)
