"""Round-3 additions: no-sort global RANK/DENSE_RANK, CUBE grouping
sets, and benchmark n-gram decontamination — pinned against brute-force
references. The DuckDB value oracles in __ray_entry__ are the
independent check.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


class TestRankOrders:
    def test_matches_bruteforce_with_ties(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import rank_orders
        rng = np.random.default_rng(31)
        n = 400
        # coarse grid forces many exact ties
        total = rng.integers(10, 30, n) * 100.0
        orders = pd.DataFrame({
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.ones(n, dtype=np.int64),
            "o_orderstatus": "F",
            "o_totalprice": total,
            "o_orderdate": pd.Timestamp("2020-01-01"),
            "o_orderpriority": "1-URGENT",
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        orders.to_parquet(sf / "orders.parquet")
        got = rank_orders(str(sf)).to_pandas() \
            .sort_values("o_orderkey").reset_index(drop=True)
        cents = np.trunc(total * 100).astype(np.int64)
        ref_rnk = np.array([(cents < c).sum() + 1 for c in cents])
        uniq = np.unique(cents)
        ref_drnk = np.searchsorted(uniq, cents) + 1
        assert (got["total_c"].to_numpy() == cents).all()
        assert (got["rnk"].to_numpy() == ref_rnk).all()
        assert (got["drnk"].to_numpy() == ref_drnk).all()
        # tie groups share one rank; dense ranks are 1..#distinct
        by = got.groupby("total_c")
        assert (by["rnk"].nunique() == 1).all()
        assert sorted(got["drnk"].unique()) == list(range(1, len(uniq) + 1))


class TestCubeRevenue:
    def test_cube_levels_consistent(self):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            cube_revenue,
            rollup_revenue,
        )
        sf = "/root/testdata/sf0.001"
        cube = cube_revenue(sf).to_pandas()
        roll = rollup_revenue(sf).to_pandas()
        # CUBE = ROLLUP + the nation-subtotal grouping set
        cube_no2 = cube[cube.lvl != 2].sort_values(
            ["lvl", "r_name", "n_name"], na_position="last") \
            .reset_index(drop=True)
        roll_s = roll.sort_values(
            ["lvl", "r_name", "n_name"], na_position="last") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(cube_no2, roll_s)
        # every grouping set totals to the same grand sum
        detail = cube[cube.lvl == 0]
        grand = int(cube[cube.lvl == 3]["revenue_c"].iloc[0])
        assert int(detail["revenue_c"].sum()) == grand
        assert int(cube[cube.lvl == 1]["revenue_c"].sum()) == grand
        assert int(cube[cube.lvl == 2]["revenue_c"].sum()) == grand
        # nation subtotals equal detail rolled up by nation
        by_nation = detail.groupby("n_name")["revenue_c"].sum()
        lvl2 = cube[cube.lvl == 2].set_index("n_name")["revenue_c"]
        assert by_nation.sort_index().equals(lvl2.sort_index())


class TestDecontaminate:
    def _docs_ds(self, texts):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))

    def test_matches_bruteforce(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            decontaminate,
        )
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(12)]
        texts = [" ".join(rng.choice(vocab, rng.integers(3, 15)))
                 for _ in range(80)]
        # plant an exact eval copy in the training slice: doc 0 is eval
        # (0 % 4 == 0), doc 1 is a training dup of it
        texts[1] = texts[0]
        df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64),
                           "text": texts})
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")

        n, mod = 3, 4
        got = decontaminate(str(sf), n=n, eval_mod=mod).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

        def grams(t):
            toks = t.strip().split()
            return [" ".join(toks[i:i + n])
                    for i in range(max(len(toks) - n + 1, 0))]

        bench = {g for i, t in enumerate(texts)
                 if i % mod == 0 for g in grams(t)}
        ref = []
        for i, t in enumerate(texts):
            if i % mod == 0:
                continue
            gs = grams(t)
            m = sum(g in bench for g in gs)
            ref.append((i, len(gs), m, m > 0))
        ref = pd.DataFrame(ref, columns=["doc_id", "n_ngrams",
                                         "n_matched", "contaminated"])
        assert (got["doc_id"].to_numpy() == ref["doc_id"].to_numpy()).all()
        assert (got["n_ngrams"].to_numpy() == ref["n_ngrams"].to_numpy()).all()
        assert (got["n_matched"].to_numpy()
                == ref["n_matched"].to_numpy()).all()
        assert (got["contaminated"].to_numpy()
                == ref["contaminated"].to_numpy()).all()
        # the planted dup must be flagged; with a 12-word vocab and
        # 3-grams some training docs must still be clean
        assert bool(got.loc[got.doc_id == 1, "contaminated"].iloc[0])
        assert (~got["contaminated"]).any()

    def test_short_and_empty_docs_zero_grams(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            decontaminate,
        )
        texts = ["a b c d e f", "", "one two", "   ", "x y z q r s t"]
        df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                           "text": texts})
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        got = decontaminate(str(sf), n=5, eval_mod=5).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # doc 0 is eval; docs 1-4 are training
        assert got["doc_id"].tolist() == [1, 2, 3, 4]
        assert got["n_ngrams"].tolist() == [0, 0, 0, 3]
        assert got["n_matched"].tolist() == [0, 0, 0, 0]
        assert (~got["contaminated"]).all()


class TestDocLogprob:
    def test_matches_bruteforce(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            doc_logprob,
        )
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(9)]
        texts = [" ".join(rng.choice(vocab, rng.integers(2, 20)))
                 for _ in range(60)]
        texts[5] = ""      # empty docs are excluded (no tokens to score)
        texts[6] = "   "
        df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                           "text": texts})
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        got = doc_logprob(str(sf)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

        from collections import Counter
        all_toks = [t for s in texts if s.strip() for t in s.split()]
        c, total = Counter(all_toks), len(all_toks)
        ref = []
        for i, s in enumerate(texts):
            if not s.strip():
                continue
            toks = s.split()
            lp = float(np.mean([np.log(c[t] / total) for t in toks]))
            ref.append((i, len(toks), lp))
        ref = pd.DataFrame(ref, columns=["doc_id", "n_tokens", "logprob"])
        assert got["doc_id"].tolist() == ref["doc_id"].tolist()
        assert got["n_tokens"].tolist() == ref["n_tokens"].tolist()
        np.testing.assert_allclose(got["logprob"], ref["logprob"],
                                   rtol=0, atol=1e-12)
        # a doc of only the rarest token scores below one of the most
        # common token
        rare = min(c, key=lambda k: c[k])
        common = max(c, key=lambda k: c[k])
        assert np.log(c[rare] / total) < np.log(c[common] / total)


class TestDupSpans:
    def test_matches_bruteforce(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.traindata import dup_spans
        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(vocab, rng.integers(5, 25)))
                 for _ in range(50)]
        # plant a shared 6-token run inside two otherwise-different docs
        shared = "a b c d e f"
        texts[3] = texts[3] + " " + shared
        texts[9] = shared + " " + texts[9]
        df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                           "text": texts})
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")

        n = 4
        got = dup_spans(str(sf), n=n).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

        def grams(t):
            toks = t.strip().split()
            return [" ".join(toks[i:i + n])
                    for i in range(max(len(toks) - n + 1, 0))]

        from collections import defaultdict
        docs_of = defaultdict(set)
        for i, t in enumerate(texts):
            for g in grams(t):
                docs_of[g].add(i)
        ref = []
        for i, t in enumerate(texts):
            gs = grams(t)
            nd = sum(len(docs_of[g]) >= 2 for g in gs)
            ref.append((i, len(gs), nd,
                        nd / len(gs) if gs else 0.0))
        ref = pd.DataFrame(ref, columns=["doc_id", "n_ngrams", "n_dup",
                                         "dup_frac"])
        assert got["n_ngrams"].tolist() == ref["n_ngrams"].tolist()
        assert got["n_dup"].tolist() == ref["n_dup"].tolist()
        np.testing.assert_allclose(got["dup_frac"], ref["dup_frac"])
        # the planted shared run is detected in both hosts, and clean
        # docs exist
        assert got.loc[got.doc_id == 3, "n_dup"].iloc[0] >= 3
        assert got.loc[got.doc_id == 9, "n_dup"].iloc[0] >= 3
        assert (got["n_dup"] == 0).any()


class TestSourceMixBudgetSample:
    def test_source_mix_shares_and_weights(self):
        from chameleon_entity_linking_ray.pipelines.traindata import source_mix
        got = source_mix("/root/testdata/sf0.001").to_pandas()
        assert np.isclose(got["token_share"].sum(), 1.0)
        # uniform-target weights: weighted shares are equal across sources
        w = got["mix_weight"].to_numpy() * got["token_share"].to_numpy()
        assert np.allclose(w, 1.0 / len(got))

    def test_budget_sample_prefix_property(self, tmp_path):
        import hashlib
        from chameleon_entity_linking_ray.pipelines.traindata import (
            budget_sample,
        )
        rng = np.random.default_rng(19)
        n = 120
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "source": [f"s{i % 3}" for i in range(n)],
            "lang": "en",
            "text": [" ".join(["tok"] * int(rng.integers(5, 60)))
                     for _ in range(n)],
            "n_chars": 0,
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        budget = 300
        got = budget_sample(str(sf), token_budget=budget).to_pandas()
        toks = {r.doc_id: len(r.text.split()) for r in df.itertuples()}
        key = {i: (hashlib.md5(str(i).encode()).hexdigest(), i)
               for i in range(n)}
        for src, sub in got.groupby("source"):
            assert sub["cum_tokens"].max() <= budget
            # kept set is exactly the maximal hash-order prefix
            order = sorted(
                (i for i in range(n) if df.loc[i, "source"] == src),
                key=lambda i: key[i])
            cum, want = 0, []
            for i in order:
                cum += toks[i]
                if cum > budget:
                    break
                want.append(i)
            assert sorted(sub["doc_id"]) == sorted(want)


class TestApproxDistinct:
    def test_estimate_accuracy_and_partition_invariance(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            approx_distinct,
        )
        rng = np.random.default_rng(29)
        n, n_distinct = 4000, 1500
        pool = [f"text number {i} " + "pad " * int(rng.integers(0, 4))
                for i in range(n_distinct)]
        texts = [pool[int(i)] for i in rng.integers(0, n_distinct, n)]
        texts[:len(pool)] = pool  # every distinct value present
        df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                           "text": texts})
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        got = approx_distinct(str(sf), k=256).to_pandas()
        est = float(got["n_distinct_est"].iloc[0])
        # KMV standard error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
        assert abs(est - n_distinct) / n_distinct < 0.25
        assert int(got["n_hashes"].iloc[0]) == 256

        # sketch is partition-invariant: same rows in shuffled order and
        # different file layout yield the SAME estimate (hash-determined)
        df2 = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
        sf2 = tmp_path / "sf2"
        sf2.mkdir()
        half = len(df2) // 2
        import pyarrow.parquet as pq
        pq.write_table(pa.Table.from_pandas(df2, preserve_index=False),
                       sf2 / "documents.parquet",
                       row_group_size=97)
        got2 = approx_distinct(str(sf2), k=256).to_pandas()
        assert float(got2["n_distinct_est"].iloc[0]) == est

    def test_small_cardinality_is_exact(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            approx_distinct,
        )
        texts = [f"only {i % 7}" for i in range(100)]
        df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                           "text": texts})
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        got = approx_distinct(str(sf), k=256).to_pandas()
        # fewer distincts than k: the sketch IS the exact count
        assert float(got["n_distinct_est"].iloc[0]) == 7.0
        assert int(got["n_hashes"].iloc[0]) == 7
