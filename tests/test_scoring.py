"""PairScorer unit tests: protocol shape, identity/monotonicity, blend
semantics (0.9/0.1 per /root/reference/BiEncoder/test.py:120)."""

import numpy as np
import pyarrow as pa
import pytest

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.stages.scoring import PairScorer, edit_similarity


def pair_batch(pairs):
    return pa.table({
        "left_id": pa.array(range(len(pairs)), pa.int64()),
        "right_id": pa.array(range(len(pairs), 2 * len(pairs)), pa.int64()),
        "left_text": pa.array([p[0] for p in pairs], pa.string()),
        "right_text": pa.array([p[1] for p in pairs], pa.string()),
        "block_key": pa.array([0] * len(pairs), pa.int64()),
    })


class TestEditSimilarity:
    def test_identity(self):
        assert edit_similarity("acme", "acme") == 1.0

    def test_prefix_abbreviation(self):
        assert edit_similarity("ind", "industries") == pytest.approx(0.92)

    def test_single_typo(self):
        assert edit_similarity("wayne", "wbyne") == pytest.approx(0.8)

    def test_symmetry(self):
        assert edit_similarity("abc", "acbd") == edit_similarity("acbd", "abc")

    def test_unrelated_low(self):
        assert edit_similarity("aaaa", "zzzz") == 0.0


class TestPairScorer:
    def setup_method(self):
        self.scorer = PairScorer(LinkageConfig())

    def test_identical_pair_scores_one(self):
        out = self.scorer(pair_batch([("acme industries", "acme industries")]))
        assert out.column("score")[0].as_py() == pytest.approx(1.0, abs=1e-5)

    def test_output_columns(self):
        out = self.scorer(pair_batch([("a b", "a c")]))
        for col in ("text_score", "entity_score", "score"):
            assert col in out.column_names

    def test_blend_weights(self):
        out = self.scorer(pair_batch([("acme industries", "acme ind")]))
        t = out.column("text_score")[0].as_py()
        e = out.column("entity_score")[0].as_py()
        s = out.column("score")[0].as_py()
        assert s == pytest.approx(0.9 * t + 0.1 * e, abs=1e-5)

    def test_ordering_same_gt_diff(self):
        out = self.scorer(pair_batch([
            ("wayne industries", "wbyne industries"),  # typo alias
            ("wayne industries", "stark industries"),  # different entity
        ]))
        scores = out.column("score").to_pylist()
        assert scores[0] > scores[1]

    def test_empty_batch(self):
        out = self.scorer(pair_batch([]))
        assert out.num_rows == 0

    def test_deterministic(self):
        b = pair_batch([("hooli", "hooli industries"), ("x y", "y z")])
        s1 = self.scorer(b).column("score").to_pylist()
        s2 = PairScorer(LinkageConfig())(b).column("score").to_pylist()
        assert s1 == s2
