"""Unit tests for the pure-numpy kernels (no Ray needed)."""

import numpy as np
import pytest

from chameleon_entity_linking_ray.functions.hashing import (
    flat_ngram_hashes,
    hash64,
    mix64,
    node_id,
)
from chameleon_entity_linking_ray.functions.minhash import (
    cosine_rows,
    estimate_jaccard,
    feature_matrix,
    lsh_band_keys,
    minhash_signatures,
)


def brute_shingles(s: str, k: int) -> set:
    s = (s if len(s) >= k else (s + "_" * k)[:k])
    return {s[i:i + k] for i in range(len(s) - k + 1)}


def brute_jaccard(a: str, b: str, k: int) -> float:
    sa, sb = brute_shingles(a, k), brute_shingles(b, k)
    return len(sa & sb) / len(sa | sb)


class TestHashing:
    def test_deterministic_across_calls(self):
        texts = ["alpha", "beta", "gamma"]
        assert np.array_equal(hash64(texts), hash64(texts))

    def test_distinct_strings_distinct_hashes(self):
        vals = hash64([f"tok{i}" for i in range(1000)])
        assert len(np.unique(vals)) == 1000

    def test_node_id_positive_int64(self):
        ids = node_id(["a", "b", "c"])
        assert ids.dtype == np.int64
        assert (ids >= 0).all()

    def test_mix64_avalanche(self):
        x = np.arange(100, dtype=np.uint64)
        m = mix64(x)
        assert len(np.unique(m)) == 100
        assert not np.array_equal(m, mix64(x, seed=1))

    def test_flat_ngram_offsets(self):
        texts = ["abcde", "xy", ""]
        flat, off = flat_ngram_hashes(texts, 3)
        # "abcde" -> 3 shingles; "xy" padded to "xy_" -> 1; "" -> "___" -> 1
        assert off.tolist() == [0, 3, 4, 5]
        assert len(flat) == 5

    def test_ngram_hash_row_independence(self):
        # a row's shingle hashes must not depend on its neighbors
        flat_a, _ = flat_ngram_hashes(["hello world"], 3)
        flat_b, off = flat_ngram_hashes(["zzz", "hello world", "qqq"], 3)
        assert np.array_equal(np.sort(flat_a), np.sort(flat_b[off[1]:off[2]]))

    def test_identical_strings_identical_shingle_sets(self):
        flat, off = flat_ngram_hashes(["apple inc", "apple inc"], 3)
        a = set(flat[off[0]:off[1]].tolist())
        b = set(flat[off[1]:off[2]].tolist())
        assert a == b


class TestMinHash:
    def test_signature_shape_and_determinism(self):
        texts = ["apple inc", "microsoft corp"]
        s1 = minhash_signatures(texts, 3, 64, 42)
        s2 = minhash_signatures(texts, 3, 64, 42)
        assert s1.shape == (2, 64)
        assert np.array_equal(s1, s2)

    def test_estimate_close_to_brute_jaccard(self):
        pairs = [("apple inc", "apple inc."), ("the weather company", "weather company"),
                 ("abcdefgh", "abcdefgh"), ("totally", "different")]
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        sa = minhash_signatures(a, 3, 256, 7)
        sb = minhash_signatures(b, 3, 256, 7)
        est = estimate_jaccard(sa, sb)
        for i, (x, y) in enumerate(pairs):
            assert abs(est[i] - brute_jaccard(x, y, 3)) < 0.15

    def test_band_keys_identical_for_identical_strings(self):
        sigs = minhash_signatures(["same text", "same text"], 3, 64, 1)
        keys = lsh_band_keys(sigs, 16, 1)
        assert np.array_equal(keys[0], keys[1])

    def test_band_keys_differ_across_bands(self):
        sigs = minhash_signatures(["some text"], 3, 64, 1)
        keys = lsh_band_keys(sigs, 16, 1)
        assert len(np.unique(keys[0])) == 16


class TestFeatures:
    def test_identical_cosine_one(self):
        m = feature_matrix(["acme corp", "acme corp"], 256, 3, 5)
        assert cosine_rows(m[[0]], m[[1]])[0] == pytest.approx(1.0, abs=1e-6)

    def test_disjoint_cosine_zero(self):
        m = feature_matrix(["aaaa", "zzzz"], 4096, 3, 5)
        assert cosine_rows(m[[0]], m[[1]])[0] == pytest.approx(0.0, abs=1e-3)


class TestSyntheticSpans:
    def test_reference_parity_arithmetic(self):
        """Exact reproduction of the reference loop
        (/root/reference/BiEncoder/model.py:175-180), including the
        inclusive len-1 ends and the prev-length-only offset quirk."""
        from chameleon_entity_linking_ray.functions.spans import (
            synthetic_entity_spans)
        texts, spans = synthetic_entity_spans([["Wayne", "Stark Ind", "LexCorp"]])
        assert texts == ["Wayne Stark Ind LexCorp"]
        # idx0: (0, 4); idx1: elen=len("Wayne")+1=6 -> (6, 14);
        # idx2: elen=len("Stark Ind")+1=10 -> (10, 16)  [the quirk]
        assert spans == [[(0, 4), (6, 14), (10, 16)]]

    def test_corrected_mode_indexes_text(self):
        from chameleon_entity_linking_ray.functions.spans import (
            synthetic_entity_spans)
        ents = ["Wayne", "Stark Ind", "LexCorp"]
        texts, spans = synthetic_entity_spans([ents], reference_parity=False)
        for (s, e), ent in zip(spans[0], ents):
            assert texts[0][s:e] == ent


class TestDualMeanScoreMode:
    def test_mean_of_towers(self):
        import numpy as np
        import pyarrow as pa
        from chameleon_entity_linking_ray.config import LinkageConfig
        from chameleon_entity_linking_ray.stages.scoring import PairScorer
        batch = pa.table({
            "left_text": ["wayne industries", "alpha beta"],
            "right_text": ["wayne industries", "gamma delta"],
        })
        out = PairScorer(LinkageConfig(score_mode="dual_mean"))(batch)
        t = out.column("text_score").to_numpy(zero_copy_only=False)
        e = out.column("entity_score").to_numpy(zero_copy_only=False)
        s = out.column("score").to_numpy(zero_copy_only=False)
        assert np.allclose(s, (t + e) / 2, atol=1e-6)
