"""corpus_prep: composed filter -> fuzzy-dedup -> pack pipeline.
Checkpointed runs must resume after a kill at any stage boundary and
produce byte-identical output; pure runs must equal checkpointed runs.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id").reset_index(drop=True).astype(np.int64)


class TestCorpusPrep:
    def test_pure_equals_checkpointed(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.prep import corpus_prep
        pure = _sorted(corpus_prep(SF).to_pandas())
        ck = _sorted(corpus_prep(SF, ckpt_root=str(tmp_path / "ck"))
                     .to_pandas())
        pd.testing.assert_frame_equal(pure, ck)
        # survivors only, packing is monotone in doc_id order
        assert pure["seq_id"].is_monotonic_increasing

    def test_resume_skips_completed_stages_byte_identical(self, tmp_path):
        import json
        import shutil

        from chameleon_entity_linking_ray.pipelines.prep import corpus_prep
        root = str(tmp_path / "ck")
        full = _sorted(corpus_prep(SF, ckpt_root=root).to_pandas())

        manifest = json.load(open(f"{root}/manifest.json"))
        assert set(manifest["stages"]) == {"filtered", "dedup", "packed"}
        for name, ent in manifest["stages"].items():
            assert ent["rows"] >= 0 and "wall_sec" in ent \
                and "upstream" in ent

        # simulate a kill AFTER the dedup stage: the packed output is
        # gone, earlier checkpoints survive; the rerun must rebuild only
        # the missing stage and reproduce the bytes exactly
        shutil.rmtree(f"{root}/packed")
        filtered_mtime = __import__("os").path.getmtime(f"{root}/filtered")
        resumed = _sorted(corpus_prep(SF, ckpt_root=root).to_pandas())
        pd.testing.assert_frame_equal(resumed, full)
        # the filtered checkpoint was reused, not rewritten
        assert __import__("os").path.getmtime(f"{root}/filtered") \
            == filtered_mtime

    def test_config_change_invalidates_checkpoints(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.prep import corpus_prep
        root = str(tmp_path / "ck")
        a = corpus_prep(SF, ckpt_root=root, budget=256).to_pandas()
        b = corpus_prep(SF, ckpt_root=root, budget=128).to_pandas()
        # different fingerprint -> fresh run, and more bins at half budget
        assert b["seq_id"].max() > a["seq_id"].max()


class TestCurationFunnel:
    def test_flags_are_cumulative_and_dedup_keeps_first(self):
        import numpy as np
        from chameleon_entity_linking_ray.pipelines.prep import curation_funnel
        df = curation_funnel("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 500
        # cumulative funnel: each gate only narrows the previous one
        assert (df["pass_quality"] <= df["pass_lang"]).all()
        assert (df["pass_dedup"] <= df["pass_quality"]).all()
        assert (df["pass_sample"] <= df["pass_dedup"]).all()
        # every stage actually attrites on this corpus
        c = [df[c].sum() for c in
             ["pass_lang", "pass_quality", "pass_dedup", "pass_sample"]]
        assert len(df) > c[0] > c[1] > c[2] > c[3] > 0
