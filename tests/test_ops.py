"""Tests for the query layer: partial aggregation, bucketed joins,
corpus ops (dedup / text analysis / ANN), multimodal plumbing, and the
distributed synth source."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from chameleon_entity_linking_ray.stages.agg import (
    distinct,
    grouped_agg,
    grouped_top_k,
    top_k,
)
from chameleon_entity_linking_ray.stages.joins import hash_join


@pytest.fixture(scope="module")
def sales():
    rng = np.random.RandomState(3)
    n = 5000
    return pd.DataFrame({
        "k": rng.randint(0, 7, n),
        "g": rng.choice(list("abc"), n),
        "v": rng.randint(0, 1000, n).astype(np.int64),
    })


class TestGroupedAgg:
    def test_matches_pandas(self, sales):
        ds = rd.from_pandas(sales)
        got = grouped_agg(ds, ["k", "g"], {
            "total": ("v", "sum"), "n": (None, "count"),
            "lo": ("v", "min"), "hi": ("v", "max")}).to_pandas()
        want = sales.groupby(["k", "g"]).agg(
            total=("v", "sum"), n=("v", "size"),
            lo=("v", "min"), hi=("v", "max")).reset_index()
        got = got.sort_values(["k", "g"]).reset_index(drop=True)[want.columns.tolist()]
        want = want.sort_values(["k", "g"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_distinct(self, sales):
        ds = rd.from_pandas(sales)
        got = distinct(ds, ["k", "g"]).to_pandas()
        assert len(got) == len(sales[["k", "g"]].drop_duplicates())

    def test_top_k(self, sales):
        ds = rd.from_pandas(sales)
        got = top_k(ds, by=["v", "k"], ascending=[False, True], k=10).to_pandas()
        want = sales.sort_values(["v", "k"], ascending=[False, True]).head(10)
        assert got["v"].tolist() == want["v"].tolist()

    def test_grouped_top_k_rank(self, sales):
        ds = rd.from_pandas(sales)
        got = grouped_top_k(ds, ["g"], by=["v"], ascending=[False], k=3,
                            rank_col="rnk").to_pandas()
        assert set(got["rnk"]) == {1, 2, 3}
        for g, sub in got.groupby("g"):
            want = sales[sales["g"] == g].nlargest(3, "v")["v"].tolist()
            assert sorted(sub["v"].tolist(), reverse=True) == want


class TestHashJoin:
    def test_inner_and_left(self):
        left = rd.from_items([{"k": i, "a": i * 2} for i in range(100)])
        right = rd.from_items([{"k": i, "b": i * 3} for i in range(0, 100, 2)])
        inner = hash_join(left, right, on=("k",), join_type="inner").to_pandas()
        assert len(inner) == 50
        assert (inner["b"] == inner["k"] * 3).all()
        louter = hash_join(left, right, on=("k",), join_type="left_outer").to_pandas()
        assert len(louter) == 100
        assert louter["b"].isna().sum() == 50

    def test_string_keys_and_rename(self):
        left = rd.from_items([{"name": f"x{i}", "v": i} for i in range(20)])
        right = rd.from_items([{"id": f"x{i}", "v": -i} for i in range(10)])
        j = hash_join(left, right, on=("name",), right_on=("id",),
                      join_type="inner").to_pandas()
        assert len(j) == 10
        assert "v_r" in j.columns
        assert (j["v"] == -j["v_r"]).all()

    def test_duplicate_keys_cross_product(self):
        left = rd.from_items([{"k": 1, "a": i} for i in range(3)])
        right = rd.from_items([{"k": 1, "b": i} for i in range(4)])
        j = hash_join(left, right, on=("k",), join_type="inner").to_pandas()
        assert len(j) == 12


SF = "/root/testdata/sf0.001"


class TestCorpusOps:
    def test_doc_tokens_deterministic(self):
        from chameleon_entity_linking_ray.pipelines.corpus import doc_tokens
        a = doc_tokens(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = doc_tokens(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)
        assert (a["n_tokens"] > 0).all()

    def test_dedup_exact_keeps_min(self):
        import pyarrow.parquet as pq
        from chameleon_entity_linking_ray.pipelines.corpus import dedup_exact
        got = dedup_exact(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        want = docs.groupby("text")["doc_id"].min()
        assert len(got) == len(want)
        merged = got.set_index("text")["keep_id"]
        assert (merged.sort_index() == want.sort_index()).all()

    def test_minhash_finds_planted_near_dups(self):
        """Plant true near-duplicates; LSH must surface them."""
        from chameleon_entity_linking_ray.config import LinkageConfig
        from chameleon_entity_linking_ray.functions.minhash import (
            lsh_band_keys, minhash_signatures)
        texts = ["the quick brown fox jumps over the lazy dog " * 3,
                 "the quick brown fox jumps over the lazy dogs " * 3,
                 "completely different content about ray data engines"]
        c = LinkageConfig()
        sigs = minhash_signatures(texts, c.shingle_k, c.num_perm, c.minhash_seed)
        keys = lsh_band_keys(sigs, c.num_bands, c.minhash_seed)
        shared01 = (keys[0] == keys[1]).sum()
        shared02 = (keys[0] == keys[2]).sum()
        assert shared01 > 0 and shared02 == 0

    def test_ann_topk_matches_bruteforce(self):
        import pyarrow.parquet as pq
        from chameleon_entity_linking_ray.pipelines.corpus import ann_topk
        got = ann_topk(SF, n_queries=3, k=4).to_pandas()
        emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
        mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        ids = emb["vec_id"].to_numpy()
        for q in range(3):
            qi = np.flatnonzero(ids == q)[0]
            scores = mat @ mat[qi]
            scores[qi] = -np.inf
            want = ids[np.argsort(-scores)[:4]]
            sub = got[got["query_id"] == q].sort_values("rnk")
            assert sub["vec_id"].tolist() == want.tolist()

    def test_simhash_near_dup_small_hamming(self):
        from chameleon_entity_linking_ray.pipelines.corpus import simhash_docs
        out = simhash_docs(SF).to_pandas()
        assert len(out) == 500
        assert out["simhash"].nunique() > 1


class TestMultimodal:
    def test_decode_schema_and_determinism(self):
        from chameleon_entity_linking_ray.stages.multimodal import (
            decode_media, synth_media)
        media = synth_media(50, seed=7)
        ds = rd.from_arrow(media)
        out = decode_media(ds, fake=True, feature_dim=8, concurrency=2).to_pandas()
        assert len(out) == 50
        assert set(out.columns) == {"media_id", "mean_intensity", "feature"}
        assert all(len(f) == 8 for f in out["feature"])
        out2 = decode_media(rd.from_arrow(media), fake=True, feature_dim=8,
                            concurrency=2).to_pandas()
        a = out.sort_values("media_id").reset_index(drop=True)
        b = out2.sort_values("media_id").reset_index(drop=True)
        assert (a["mean_intensity"] == b["mean_intensity"]).all()

    def test_strict_mode_raises(self):
        from chameleon_entity_linking_ray.stages.multimodal import MediaDecoder, synth_media
        dec = MediaDecoder(fake=False)
        with pytest.raises(NotImplementedError):
            dec(synth_media(2))

    def test_frame_sampler_layout(self):
        from chameleon_entity_linking_ray.stages.multimodal import (
            sample_frames, synth_media)
        ds = rd.from_arrow(synth_media(10, kind="video"))
        out = sample_frames(ds, n_frames=3).to_pandas()
        assert len(out) == 30
        assert set(out["frame_idx"]) == {0, 1, 2}


class TestSynthSource:
    def test_partitioning_invariant(self):
        """Same (seed, conv) content no matter how many blocks generate it."""
        from chameleon_entity_linking_ray.sources.synth import synth_transcripts
        a = synth_transcripts(40, n_entities=10, seed=5, num_blocks=2) \
            .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        b = synth_transcripts(40, n_entities=10, seed=5, num_blocks=13) \
            .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert a.equals(b)
        assert a["conv_id"].nunique() == 40
