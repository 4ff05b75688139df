"""Mention extractor unit tests (reference parity: rho threshold semantics of
/root/reference/utils/entity_extractor.py:10,32)."""

import pyarrow as pa

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.stages.extract import MentionExtractor, find_mentions


def turn_batch(texts):
    return pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(texts))], pa.string()),
        "turn_idx": pa.array([0] * len(texts), pa.int32()),
        "text": pa.array(texts, pa.string()),
    })


class TestFindMentions:
    def test_finds_capitalized_sequences(self):
        out = find_mentions("we met Acme Industries and Globex yesterday", 0.26)
        surfaces = [m[2] for m in out]
        assert surfaces == ["Acme Industries", "Globex"]

    def test_rho_strict_threshold(self):
        # single 1-char token has rho 0.26 exactly -> excluded (strict >)
        out = find_mentions("a B c", 0.26)
        assert out == []

    def test_spans_match_text(self):
        text = "talk to Wayne Industries about Stark Ind"
        for (s, e, surf, _rho) in find_mentions(text, 0.26):
            assert text[s:e] == surf

    def test_deterministic(self):
        text = "Hooli and Pied Piper disagree"
        assert find_mentions(text, 0.26) == find_mentions(text, 0.26)


class TestExtractor:
    def test_explode_schema_and_norms(self):
        ex = MentionExtractor(LinkageConfig())
        out = ex.explode(turn_batch(["call Acme Industries now", "no caps here"]))
        assert out.column_names == ["mention_id", "conv_id", "turn_idx", "span_start",
                                    "span_end", "surface", "norm", "rho"]
        assert out.num_rows == 1
        assert out.column("surface")[0].as_py() == "Acme Industries"
        assert out.column("norm")[0].as_py() == "acme industries"
        assert out.column("mention_id")[0].as_py() == "c0:0:5"

    def test_annotate_list_struct_column(self):
        ex = MentionExtractor(LinkageConfig())
        out = ex.annotate(turn_batch(["Acme Industries called", "plain text"]))
        ments = out.column("mentions").to_pylist()
        assert ments[0][0]["spot"] == "Acme Industries"
        assert ments[0][0]["rho"] > 0.26
        assert ments[1] == []

    def test_empty_batch(self):
        ex = MentionExtractor(LinkageConfig())
        out = ex.explode(turn_batch([]))
        assert out.num_rows == 0
        assert "mention_id" in out.column_names
