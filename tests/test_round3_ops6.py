"""HdrHistogram-class quantile sketch and the unnest/explode surface."""

import numpy as np
import pandas as pd
import pytest


def _write_li(tmp_path, vals):
    li = pd.DataFrame({"l_orderkey": np.arange(len(vals), dtype=np.int64),
                       "l_extendedprice": vals})
    d = tmp_path / "sf"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet")
    return str(d)


class TestHdrPercentiles:
    def test_relative_error_bound(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            hdr_percentiles,
        )
        rng = np.random.default_rng(71)
        # heavy-tailed values spanning many octaves
        vals = np.exp(rng.uniform(0, 16, 4000))
        d = _write_li(tmp_path, vals)
        got = hdr_percentiles(d).to_pandas()
        cents = np.trunc(vals * 100).astype(np.int64)
        cents = np.sort(cents[cents > 0])
        n = len(cents)
        for _, row in got.iterrows():
            exact = cents[int(np.floor(row["q"] * (n - 1)))]
            est = row["est_c"]
            # bucket lower bound: est <= exact, within one sub-bucket
            # (relative error <= ~2/32 with rounding slop)
            assert est <= exact
            assert est >= exact * (1 - 2.0 / 32) - 2

    def test_merge_invariant_under_partitioning(self, tmp_path):
        """The sketch is a sum of per-block histograms: any block split
        must give the identical estimate."""
        import ray.data as rd
        from chameleon_entity_linking_ray.pipelines.traindata import (
            hdr_percentiles,
        )
        rng = np.random.default_rng(73)
        vals = np.exp(rng.uniform(0, 12, 2000))
        d1 = _write_li(tmp_path, vals)
        a = hdr_percentiles(d1).to_pandas().sort_values("q")
        # same values, different file layout (many small row groups)
        d2 = tmp_path / "sf2"
        d2.mkdir()
        pd.DataFrame({"l_orderkey": np.arange(len(vals), dtype=np.int64),
                      "l_extendedprice": vals}) \
            .to_parquet(d2 / "lineitem.parquet", row_group_size=97)
        b = hdr_percentiles(str(d2)).to_pandas().sort_values("q")
        assert a["est_c"].tolist() == b["est_c"].tolist()


class TestDocTokenRows:
    def test_roundtrip_rebuilds_text(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.corpus import (
            doc_token_rows,
        )
        docs = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["alpha beta gamma", "  padded   tokens here ",
                     "", "single"],
            "lang": "en", "source": "s", "n_chars": 0,
        })
        d = tmp_path / "sf"
        d.mkdir()
        docs.to_parquet(d / "documents.parquet")
        got = doc_token_rows(str(d)).to_pandas() \
            .sort_values(["doc_id", "pos"])
        rebuilt = got.groupby("doc_id")["token"].agg(" ".join)
        assert rebuilt[0] == "alpha beta gamma"
        assert rebuilt[1] == "padded tokens here"  # \s+ split collapses
        assert 2 not in rebuilt.index               # empty doc: no rows
        assert rebuilt[3] == "single"
        # positions are 1..len per doc
        for did, sub in got.groupby("doc_id"):
            assert sub["pos"].tolist() == list(range(1, len(sub) + 1))


class TestPartitionedDocs:
    def test_write_prune_read_roundtrip(self, tmp_path, monkeypatch):
        import chameleon_entity_linking_ray.pipelines.reference_io as rio
        docs = pd.DataFrame({
            "doc_id": np.arange(12, dtype=np.int64),
            "text": "t", "source": "s",
            "lang": ["en", "de", "fr", "und"] * 3,
            "n_chars": np.arange(12, dtype=np.int64) * 10,
        })
        d = tmp_path / "sf"
        d.mkdir()
        docs.to_parquet(d / "documents.parquet")
        monkeypatch.setattr(rio, "_io_dir",
                            lambda sf: str(tmp_path / "io"))
        (tmp_path / "io").mkdir()
        got = rio.partitioned_docs(str(d)).to_pandas() \
            .sort_values("lang").reset_index(drop=True)
        # only the pruned partitions (en/de) ever come back
        assert got["lang"].tolist() == ["de", "en"]
        ref = docs[docs["lang"].isin(["en", "de"])].groupby("lang")
        assert got.set_index("lang")["n_docs"].to_dict() == \
            ref.size().to_dict()
        assert got.set_index("lang")["sum_chars"].to_dict() == \
            ref["n_chars"].sum().to_dict()
        # the fr/und directories exist on disk but were never read
        import os
        assert os.path.isdir(tmp_path / "io" / "docs_by_lang" / "lang=fr")
