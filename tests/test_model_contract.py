"""Real-model actor contract behind the PairScorer protocol.

The engine's scoring stage accepts ANY callable class with the protocol
  __init__(...)                    # heavy state: tokenizer/model, ONCE per actor
  __call__(pa.Table[left_text, right_text]) -> pa.Table + score columns
run as ``pairs.map_batches(Cls, concurrency=(a, b), batch_size=B)``.

This module pins that contract with a tokenizer-holding actor shaped like
the reference's LUKE pipeline (/root/reference/BiEncoder/model.py:68-166:
tokenizer loaded once, batch tokenize with padding/truncation, batched
model forward). The sandbox has no HF stack and no network, so the test
SKIPS unless ``transformers`` + a cached model are importable — the
protocol-conformance half runs everywhere via a stand-in tokenizer.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _hf_scorer_cls():
    """Build the HF-backed scorer class; import inside so collection
    never requires transformers."""
    from transformers import AutoTokenizer

    class HFPairScorer:
        # contract point 1: ALL heavy state loads once per actor
        def __init__(self, model_name: str = "bert-base-uncased",
                     max_length: int = 64):
            self.tok = AutoTokenizer.from_pretrained(
                model_name, local_files_only=True)
            self.max_length = max_length

        # contract point 2: one vectorized call per Arrow batch
        def __call__(self, batch: pa.Table) -> pa.Table:
            left = batch.column("left_text").to_pylist()
            right = batch.column("right_text").to_pylist()
            enc = self.tok(left, right, padding=True,
                           truncation="longest_first",
                           max_length=self.max_length,
                           return_tensors="np")
            # token-overlap score stands in for the model forward — the
            # contract under test is tokenize-once + batch shape, not
            # model quality
            ids = enc["input_ids"]
            score = np.fromiter(
                (len(set(a) & set(b)) / max(len(set(a) | set(b)), 1)
                 for a, b in zip(ids, ids)),
                np.float32, len(left))
            return batch.append_column("score", pa.array(score))

    return HFPairScorer


def _fake_scorer_cls():
    """Protocol stand-in: same shape as HFPairScorer with a trivial
    whitespace 'tokenizer' built in __init__ — runs in the hermetic
    sandbox so the actor-pool wiring is exercised on every CI run.
    Defined inside a factory so cloudpickle ships it BY VALUE (test
    modules are not importable on Ray workers)."""

    class _FakeTokenizerScorer:
        def __init__(self):
            self.vocab: dict[str, int] = {}

        def _encode(self, t: str) -> set[int]:
            return {self.vocab.setdefault(w, len(self.vocab))
                    for w in t.lower().split()}

        def __call__(self, batch: pa.Table) -> pa.Table:
            left = batch.column("left_text").to_pylist()
            right = batch.column("right_text").to_pylist()
            score = np.fromiter(
                (len(self._encode(a) & self._encode(b))
                 / max(len(self._encode(a) | self._encode(b)), 1)
                 for a, b in zip(left, right)),
                np.float32, len(left))
            return batch.append_column("score", pa.array(score))

    return _FakeTokenizerScorer


PAIRS = [
    {"left_text": "Acme Corp", "right_text": "Acme Corporation"},
    {"left_text": "Wayne Enterprises", "right_text": "Wayne Enterprises"},
    {"left_text": "Stark Industries", "right_text": "Globex"},
] * 8


class TestPairScorerProtocol:
    def test_actor_pool_wiring_with_stand_in(self):
        ds = rd.from_items(PAIRS)
        out = ds.map_batches(_fake_scorer_cls(), batch_format="pyarrow",
                             concurrency=(1, 2), batch_size=8).to_pandas()
        assert len(out) == len(PAIRS)
        assert out.loc[out["left_text"] == "Wayne Enterprises",
                       "score"].iloc[0] == 1.0
        assert out["score"].between(0, 1).all()

    def test_hf_tokenizer_actor(self):
        transformers = pytest.importorskip("transformers")
        try:
            cls = _hf_scorer_cls()
            cls()  # probes the local model cache
        except Exception:
            pytest.skip("no cached HF model available offline")
        ds = rd.from_items(PAIRS)
        out = ds.map_batches(cls, batch_format="pyarrow",
                             concurrency=(1, 2), batch_size=8).to_pandas()
        assert len(out) == len(PAIRS)
        assert out["score"].between(0, 1).all()
