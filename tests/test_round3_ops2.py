"""Round-3 batch-2 analytics operators (ROW_NUMBER/NTILE, LAG gaps,
grouped variance, arg_min/arg_max span, grouped mode, set ops, ordered
string_agg collect, Pareto frontier) pinned against brute-force pandas /
numpy references. The DuckDB value oracles in __ray_entry__ are the
independent cross-engine check.
"""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def sf(tmp_path):
    """Tiny star-schema dir with ties planted in every interesting place."""
    rng = np.random.default_rng(31)
    n = 400
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
        "o_custkey": rng.integers(1, 40, n).astype(np.int64),
        "o_orderstatus": rng.choice(["F", "O", "P"], n),
        # coarse grid -> many exact total ties
        "o_totalprice": rng.integers(10, 30, n) * 111.0,
        "o_orderdate": pd.Timestamp("2021-01-01")
        + pd.to_timedelta(rng.integers(0, 40, n), unit="D"),
        "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], n),
    })
    customer = pd.DataFrame({
        "c_custkey": np.arange(1, 40, dtype=np.int64),
        "c_mktsegment": [["BUILDING", "MACHINERY", "FURNITURE"][i % 3]
                         for i in range(39)],
        "c_nationkey": (np.arange(39) % 7).astype(np.int32),
    })
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(1, 11, dtype=np.int64),
        "s_nationkey": (np.arange(10) % 5 + 3).astype(np.int32),
    })
    m = 300
    events = pd.DataFrame({
        "event_id": np.arange(1, m + 1, dtype=np.int64),
        # coarse time grid -> duplicate timestamps within users
        "ts": pd.Timestamp("2022-03-01")
        + pd.to_timedelta(rng.integers(0, 500, m) * 600, unit="s"),
        "user_id": rng.integers(1, 25, m).astype(np.int64),
        "event_type": rng.choice(["view", "click", "buy"], m),
        "value": rng.uniform(0, 50, m),
    })
    part = pd.DataFrame({
        "p_partkey": np.arange(1, 101, dtype=np.int64),
        "p_size": rng.integers(1, 20, 100).astype(np.int32),
        "p_retailprice": rng.integers(100, 900, 100) / 10.0,
    })
    d = tmp_path / "sf"
    d.mkdir()
    for name, df in (("orders", orders), ("customer", customer),
                     ("supplier", supplier), ("events", events),
                     ("part", part)):
        df.to_parquet(d / f"{name}.parquet")
    return str(d), orders, customer, supplier, events, part


class TestRowNumberNtile:
    def test_matches_pandas_rank(self, sf):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            row_number_orders,
        )
        d, orders, *_ = sf
        got = row_number_orders(d, n_tiles=7).to_pandas() \
            .sort_values("o_orderkey").reset_index(drop=True)
        cents = np.trunc(orders["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        ref = pd.DataFrame({"o_orderkey": orders["o_orderkey"],
                            "total_c": cents}) \
            .sort_values(["total_c", "o_orderkey"], kind="mergesort")
        ref["rn"] = np.arange(1, len(ref) + 1, dtype=np.int64)
        n, t = len(ref), 7
        base, rem = divmod(n, t)
        sizes = np.r_[np.full(rem, base + 1), np.full(t - rem, base)]
        ref["tile"] = np.repeat(np.arange(1, t + 1), sizes).astype(np.int64)
        ref = ref.sort_values("o_orderkey").reset_index(drop=True)
        assert (got["rn"].to_numpy() == ref["rn"].to_numpy()).all()
        assert (got["tile"].to_numpy() == ref["tile"].to_numpy()).all()
        # rn is a permutation of 1..n
        assert sorted(got["rn"]) == list(range(1, n + 1))


class TestUserGaps:
    def test_matches_pandas_lag(self, sf):
        from chameleon_entity_linking_ray.pipelines.analytics import user_gaps
        d, _, _, _, events, _ = sf
        got = user_gaps(d).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        e = events.copy()
        e["ts_s"] = e["ts"].astype("int64") // 10**9
        e = e.sort_values(["user_id", "ts_s", "event_id"], kind="mergesort")
        e["gap_s"] = e.groupby("user_id")["ts_s"].diff()
        ref = e[e["gap_s"].notna()].sort_values("event_id")
        assert got["event_id"].tolist() == ref["event_id"].tolist()
        assert got["gap_s"].tolist() == ref["gap_s"].astype(int).tolist()


class TestSegmentStats:
    def test_matches_formula(self, sf):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            segment_stats,
        )
        d, orders, customer, *_ = sf
        got = segment_stats(d).to_pandas() \
            .sort_values("c_mktsegment").reset_index(drop=True)
        j = orders.merge(customer, left_on="o_custkey", right_on="c_custkey")
        j["d"] = np.trunc(j["o_totalprice"]).astype(np.int64)
        for _, row in got.iterrows():
            x = j.loc[j["c_mktsegment"] == row["c_mktsegment"], "d"]
            n = float(len(x))
            s, s2 = float(x.sum()), float((x * x).sum())
            assert row["n"] == len(x)
            assert row["sum_d"] == x.sum()
            assert row["mean_d"] == s / n
            assert row["var_d"] == (s2 - s * s / n) / n
            assert row["std_d"] == np.sqrt((s2 - s * s / n) / n)


class TestCustomerOrderSpan:
    def test_matches_pandas_argminmax(self, sf):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            customer_order_span,
        )
        d, orders, *_ = sf
        got = customer_order_span(d).to_pandas() \
            .sort_values("o_custkey").reset_index(drop=True)
        o = orders.copy()
        o["day"] = o["o_orderdate"].astype("int64") // (86400 * 10**9)
        o = o.sort_values(["day", "o_orderkey"], kind="mergesort")
        first = o.groupby("o_custkey").first()
        last = o.sort_values(["day", "o_orderkey"],
                             ascending=[False, False],
                             kind="mergesort").groupby("o_custkey").first()
        for _, row in got.iterrows():
            ck = row["o_custkey"]
            assert row["first_day"] == first.loc[ck, "day"]
            assert row["first_orderkey"] == first.loc[ck, "o_orderkey"]
            assert row["last_day"] == last.loc[ck, "day"]
            # last tie-break: max enc = max day, then MAX orderkey
            sub = o[(o["o_custkey"] == ck) & (o["day"] == row["last_day"])]
            assert row["last_orderkey"] == sub["o_orderkey"].max()


class TestPriorityMode:
    def test_tie_breaks_lexicographic(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            priority_mode,
        )
        orders = pd.DataFrame({
            "o_orderkey": np.arange(6, dtype=np.int64),
            "o_custkey": np.int64(1),
            "o_orderstatus": ["F", "F", "F", "F", "O", "O"],
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("2020-01-01"),
            # F: tie 2-2 between 1-URGENT and 2-HIGH -> pick 1-URGENT
            "o_orderpriority": ["2-HIGH", "1-URGENT", "2-HIGH", "1-URGENT",
                                "3-MEDIUM", "3-MEDIUM"],
        })
        d = tmp_path / "sf"
        d.mkdir()
        orders.to_parquet(d / "orders.parquet")
        got = priority_mode(str(d)).to_pandas() \
            .sort_values("o_orderstatus").reset_index(drop=True)
        assert got.loc[0, "o_orderstatus"] == "F"
        assert got.loc[0, "o_orderpriority"] == "1-URGENT"
        assert got.loc[0, "n"] == 2
        assert got.loc[1, "o_orderpriority"] == "3-MEDIUM"


class TestNationSetOps:
    def test_tags(self, sf):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            nation_set_ops,
        )
        d, _, customer, supplier, *_ = sf
        got = nation_set_ops(d).to_pandas() \
            .sort_values("nationkey").reset_index(drop=True)
        cset = set(customer["c_nationkey"].astype(int))
        sset = set(supplier["s_nationkey"].astype(int))
        ref = {k: (k in cset) + 2 * (k in sset) for k in cset | sset}
        assert dict(zip(got["nationkey"], got["tag"])) == ref
        # intersect/except derivable
        assert {k for k, t in ref.items() if t == 3} == cset & sset
        assert {k for k, t in ref.items() if t == 1} == cset - sset


class TestUserEventPaths:
    def test_matches_pandas(self, sf):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            user_event_paths,
        )
        d, _, _, _, events, _ = sf
        got = user_event_paths(d).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        e = events.copy()
        e["ts_s"] = e["ts"].astype("int64") // 10**9
        e = e.sort_values(["ts_s", "event_id"], kind="mergesort")
        ref = e.groupby("user_id")["event_type"].agg(",".join)
        assert dict(zip(got["user_id"], got["path"])) == ref.to_dict()
        assert (got["n_events"].to_numpy()
                == e.groupby("user_id").size().loc[got["user_id"]]
                .to_numpy()).all()


class TestParetoParts:
    def test_matches_bruteforce(self, sf):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            pareto_parts,
        )
        d, *_, part = sf
        got = pareto_parts(d).to_pandas()
        price = np.trunc(part["p_retailprice"].to_numpy() * 100) \
            .astype(np.int64)
        size = part["p_size"].to_numpy().astype(np.int64)
        keep = []
        for i in range(len(part)):
            dominated = ((price <= price[i]) & (size >= size[i])
                         & ((price < price[i]) | (size > size[i]))).any()
            if not dominated:
                keep.append(int(part["p_partkey"].iloc[i]))
        assert sorted(got["p_partkey"]) == sorted(keep)

    def test_duplicates_both_kept(self):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            _pareto_frontier,
        )
        df = pd.DataFrame({"p_partkey": [1, 2, 3],
                           "price_c": [100, 100, 200],
                           "p_size": np.array([5, 5, 4], np.int64)})
        out = _pareto_frontier(df)
        # the two identical (100,5) rows both survive; (200,4) is dominated
        assert sorted(out["p_partkey"]) == [1, 2]
