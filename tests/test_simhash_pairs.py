"""SimHash near-dup pairs + repetition stats: brute-force pins for the
banded Hamming join (exactly-once emission, pigeonhole completeness)
and the Gopher-style repetition counters. The DuckDB value oracles in
__ray_entry__ are the second, independent check.
"""

import numpy as np
import pandas as pd
import pytest


def _docs_fixture(tmp_path, texts):
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": "en",
        "source": "t",
        "n_chars": [len(t) for t in texts],
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet")
    return str(sf)


def _brute_pairs(texts, max_hamming, width=16, n_bands=4):
    from chameleon_entity_linking_ray.pipelines.corpus import _simhash_u64
    sims = _simhash_u64(list(texts))
    mask = np.uint64((1 << width) - 1)
    out = []
    for i in range(len(sims)):
        for j in range(i + 1, len(sims)):
            hd = bin(int(sims[i] ^ sims[j])).count("1")
            shares = any(
                (sims[i] >> np.uint64(b * width)) & mask ==
                (sims[j] >> np.uint64(b * width)) & mask
                for b in range(n_bands))
            if shares and hd <= max_hamming:
                out.append((i, j, hd))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"]) \
        .astype(np.int64)


class TestSimhashDupPairs:
    def test_matches_bruteforce_exactly_once(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.corpus import (
            simhash_dup_pairs,
        )
        rng = np.random.default_rng(5)
        vocab = np.array(["sort", "scan", "merge", "join", "batch", "key",
                          "row", "hash", "agg", "part"], dtype=object)
        texts = [" ".join(rng.choice(vocab, rng.integers(3, 9)))
                 for _ in range(80)]
        # exact duplicates + one-token perturbations -> hamming 0 and small
        texts += [texts[0], texts[1] + " extra", texts[2]]
        sf = _docs_fixture(tmp_path, texts)
        got = simhash_dup_pairs(sf, max_hamming=3).to_pandas()
        # exactly-once: no duplicate (a, b) rows may survive the
        # first-matching-band rule
        assert not got.duplicated(["doc_a", "doc_b"]).any()
        got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        ref = _brute_pairs(texts, 3).sort_values(["doc_a", "doc_b"]) \
            .reset_index(drop=True)
        assert len(ref) > 0
        pd.testing.assert_frame_equal(got.astype(np.int64), ref)

    def test_pigeonhole_catches_all_low_hamming_pairs(self, tmp_path):
        # with 4 bands, ANY pair with hamming <= 3 must share a band, so
        # banding loses nothing vs the unblocked all-pairs scan
        from chameleon_entity_linking_ray.pipelines.corpus import (
            _simhash_u64,
            simhash_dup_pairs,
        )
        rng = np.random.default_rng(9)
        vocab = np.array(["a", "b", "c", "d", "e", "f"], dtype=object)
        texts = [" ".join(rng.choice(vocab, rng.integers(2, 6)))
                 for _ in range(60)]
        sf = _docs_fixture(tmp_path, texts)
        got = simhash_dup_pairs(sf, max_hamming=3).to_pandas()
        sims = _simhash_u64(texts)
        all_pairs = {(i, j)
                     for i in range(len(sims)) for j in range(i + 1, len(sims))
                     if bin(int(sims[i] ^ sims[j])).count("1") <= 3}
        assert set(map(tuple, got[["doc_a", "doc_b"]].values)) == all_pairs


class TestDocRepetition:
    def test_matches_bruteforce_counters(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.corpus import (
            doc_repetition,
        )
        texts = ["a a a b c", "x y z", "q q", "", "solo",
                 "w w w w", "m n m n m"]
        sf = _docs_fixture(tmp_path, texts)
        got = doc_repetition(sf).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        rows = []
        for i, t in enumerate(texts):
            toks = t.split()
            from collections import Counter
            c = Counter(toks)
            rows.append((i, len(toks), len(c),
                         max(c.values()) if c else 0,
                         sum(v for v in c.values() if v >= 2)))
        ref = pd.DataFrame(rows, columns=["doc_id", "n_words", "n_distinct",
                                          "top_word_n", "dup_word_n"])
        pd.testing.assert_frame_equal(got.astype(np.int64),
                                      ref.astype(np.int64))


class TestPopcount:
    def test_swar_matches_python_bincount(self):
        from chameleon_entity_linking_ray.pipelines.corpus import _popcount64
        rng = np.random.default_rng(3)
        v = rng.integers(0, 2**63, 1000).astype(np.uint64)
        v[:3] = [0, 1, 2**64 - 1]
        ref = np.array([bin(int(x)).count("1") for x in v], dtype=np.int64)
        assert (_popcount64(v) == ref).all()


class TestDedupFuzzy:
    def test_transitive_closure_and_canonical_election(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.corpus import (
            dedup_fuzzy_docs,
        )
        # A ~ B ~ C (chain via shared near-identical token sets), D alone:
        # the component must collapse transitively even though A and C
        # might not share a band directly
        texts = [
            "alpha beta gamma delta epsilon",          # 0
            "alpha beta gamma delta epsilon",          # 1 exact dup of 0
            "alpha beta gamma delta epsilon zeta",     # 2 near 0/1
            "completely different words entirely here",  # 3 singleton
        ]
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts, "lang": "en", "source": "t",
            "n_chars": [len(t) for t in texts],
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        got = dedup_fuzzy_docs(str(sf)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.loc[0, "cluster_id"] == 0 and bool(got.loc[0, "keep"])
        assert got.loc[1, "cluster_id"] == 0 and not bool(got.loc[1, "keep"])
        # doc 2 joins iff its simhash is within hamming 3 of 0's — with
        # one extra token over 5 it is; either way 3 stays a singleton
        assert got.loc[3, "cluster_id"] == 3 and bool(got.loc[3, "keep"])
        # exactly one keeper per cluster, keeper = min doc_id
        for cid, sub in got.groupby("cluster_id"):
            assert sub["keep"].sum() == 1
            assert sub.loc[sub["keep"], "doc_id"].iloc[0] == cid == \
                sub["doc_id"].min()
