"""Window-class operators: RANGE-mode rolling aggregate, temporal
proximity self-join (interval band join), and ROLLUP grouping sets.

Each is pinned against a brute-force per-user Python reference on a
fixture that includes timestamp TIES, so RANGE peer semantics (equal-ts
rows share one window) and canonical pair ordering are exercised — the
DuckDB value oracle in __ray_entry__ is the second, independent check.
"""

import numpy as np
import pandas as pd
import pytest


def _events_fixture(tmp_path, seed=11, n=400, users=7):
    rng = np.random.default_rng(seed)
    ts_s = rng.integers(1_700_000_000, 1_700_000_000 + 40 * 86400, n)
    ts_s[50:60] = ts_s[40:50]  # force cross-row ties (same + mixed users)
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts_s, unit="s"),
        "user_id": rng.integers(1, users + 1, n).astype(np.int64),
        "value": rng.uniform(0, 50, n),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    ev.to_parquet(sf / "events.parquet")
    ev["ts_s"] = ev["ts"].astype(np.int64) // 10**9
    ev["cents"] = np.trunc(ev["value"].to_numpy() * 100).astype(np.int64)
    return str(sf), ev


class TestRollingUserWindow:
    def test_matches_bruteforce_range_semantics(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            rolling_user_window,
        )
        w = 5 * 86400
        sf, ev = _events_fixture(tmp_path)
        got = rolling_user_window(sf, window_s=w).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)

        rows = []
        for _, r in ev.iterrows():
            mask = (ev["user_id"] == r["user_id"]) & \
                (ev["ts_s"] >= r["ts_s"] - w) & (ev["ts_s"] <= r["ts_s"])
            rows.append((r["event_id"], r["user_id"], r["ts_s"],
                         int(ev.loc[mask, "cents"].sum()), int(mask.sum())))
        ref = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_s",
                                          "w_sum_c", "w_count"]) \
            .sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype(np.int64),
                                      ref.astype(np.int64))

    def test_ties_share_one_window(self, tmp_path):
        # all three rows at the same (user, ts): every row's window must
        # include all peers — RANGE, not ROWS, semantics
        from chameleon_entity_linking_ray.pipelines.analytics import (
            rolling_user_window,
        )
        ev = pd.DataFrame({
            "event_id": np.arange(3, dtype=np.int64),
            "ts": pd.to_datetime([1000, 1000, 1000], unit="s"),
            "user_id": np.array([1, 1, 1], dtype=np.int64),
            "value": [1.0, 2.0, 4.0],
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        ev.to_parquet(sf / "events.parquet")
        got = rolling_user_window(str(sf), window_s=10).to_pandas()
        assert (got["w_sum_c"] == 700).all()
        assert (got["w_count"] == 3).all()


class TestEventPairsWithin:
    def test_matches_bruteforce(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            event_pairs_within,
        )
        w = 2 * 86400
        sf, ev = _events_fixture(tmp_path)
        got = event_pairs_within(sf, window_s=w).to_pandas() \
            .sort_values(["event_a", "event_b"]).reset_index(drop=True)

        rows = []
        e = ev[["event_id", "user_id", "ts_s"]].to_numpy()
        for i in range(len(e)):
            for j in range(len(e)):
                if i == j or e[i, 1] != e[j, 1]:
                    continue
                lex = (e[i, 2], e[i, 0]) < (e[j, 2], e[j, 0])
                if lex and e[j, 2] - e[i, 2] <= w:
                    rows.append((e[i, 0], e[j, 0], e[j, 2] - e[i, 2]))
        ref = pd.DataFrame(rows, columns=["event_a", "event_b", "gap_s"]) \
            .sort_values(["event_a", "event_b"]).reset_index(drop=True)
        assert len(ref) > 0
        pd.testing.assert_frame_equal(got.astype(np.int64),
                                      ref.astype(np.int64))

    def test_each_pair_emitted_once_under_ties(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            event_pairs_within,
        )
        ev = pd.DataFrame({
            "event_id": np.array([5, 3, 9], dtype=np.int64),
            "ts": pd.to_datetime([100, 100, 100], unit="s"),
            "user_id": np.array([1, 1, 1], dtype=np.int64),
            "value": [0.0, 0.0, 0.0],
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        ev.to_parquet(sf / "events.parquet")
        got = event_pairs_within(str(sf), window_s=10).to_pandas() \
            .sort_values(["event_a", "event_b"]).reset_index(drop=True)
        # 3 tied rows -> exactly C(3,2) pairs, id-ordered, gap 0
        assert got.values.tolist() == [[3, 5, 0], [3, 9, 0], [5, 9, 0]]


class TestRollupRevenue:
    def test_levels_are_consistent(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            rollup_revenue,
        )
        got = rollup_revenue("/root/testdata/sf0.001").to_pandas()
        detail = got[got["lvl"] == 0]
        sub = got[got["lvl"] == 1]
        grand = got[got["lvl"] == 3]
        assert len(grand) == 1
        assert grand["revenue_c"].iloc[0] == detail["revenue_c"].sum()
        by_region = detail.groupby("r_name")["revenue_c"].sum()
        for _, r in sub.iterrows():
            assert r["revenue_c"] == by_region[r["r_name"]]
            assert pd.isna(r["n_name"])


class TestSegmentPercentiles:
    def test_matches_numpy_weighted_disc(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            segment_percentiles,
        )
        got = segment_percentiles("/root/testdata/sf0.001").to_pandas() \
            .sort_values("c_mktsegment").reset_index(drop=True)
        import pyarrow.parquet as pq
        o = pq.read_table("/root/testdata/sf0.001/orders.parquet") \
            .to_pandas()
        c = pq.read_table("/root/testdata/sf0.001/customer.parquet") \
            .to_pandas()
        j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
        j["total_c"] = np.trunc(j["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        rows = []
        for seg, sub in j.groupby("c_mktsegment"):
            v = np.sort(sub["total_c"].to_numpy())
            n = len(v)
            # PERCENTILE_DISC: min value whose cumulative count >= q*n
            pick = lambda q: int(v[int(np.ceil(q * n)) - 1])  # noqa: E731
            rows.append((seg, pick(0.25), pick(0.5), pick(0.75)))
        ref = pd.DataFrame(rows, columns=["c_mktsegment", "p25_c",
                                          "p50_c", "p75_c"]) \
            .sort_values("c_mktsegment").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)


class TestPivotRevenue:
    def test_row_sums_equal_rollup_detail(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            _SEGMENTS,
            pivot_revenue,
            segment_revenue,
        )
        wide = pivot_revenue("/root/testdata/sf0.001").to_pandas()
        by_seg = segment_revenue("/root/testdata/sf0.001").to_pandas() \
            .set_index("c_mktsegment")["sum_total_c"]
        # column sums of the pivot equal the per-segment aggregate
        for s in _SEGMENTS:
            assert wide[s].sum() == by_seg.get(s, 0)


class TestStringSortQuirk:
    def test_matches_reference_string_sort_loop(self):
        """Pin against the LITERAL reference control flow: scores kept as
        strings, sorted(key=str, reverse=True) per query
        (merge_results.py:24), stable on ties."""
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq
        from chameleon_entity_linking_ray.pipelines.analytics import (
            stringsort_rank_quirk)

        got = stringsort_rank_quirk("/root/testdata/sf0.001").to_pandas() \
            .sort_values(["qid", "rank_str"]).reset_index(drop=True)

        df = pq.read_table("/root/testdata/sf0.001/orders.parquet").to_pandas()
        rows = []
        for qid, g in df.groupby("o_custkey", sort=True):
            c = np.trunc(g["o_totalprice"].to_numpy() * 100).astype(np.int64)
            entries = sorted(
                zip(g["o_orderkey"], (f"{x // 100}.{x % 100:02d}"
                                      for x in c)),
                key=lambda t: t[0])  # insertion order: pid asc
            ranked = sorted(entries, key=lambda t: t[1], reverse=True)
            for r, (pid, s) in enumerate(ranked[:10], start=1):
                rows.append((int(qid), int(pid), s, r))
        want = pd.DataFrame(rows, columns=["qid", "pid", "score_str",
                                           "rank_str"]) \
            .sort_values(["qid", "rank_str"]).reset_index(drop=True)
        assert got["pid"].tolist() == want["pid"].tolist()
        assert got["score_str"].tolist() == want["score_str"].tolist()
        # the quirk must actually manifest on this data
        assert (got["rank_str"] != got["rank_num"]).any()


class TestPsiDrift:
    def test_contributions_nonnegative_and_buckets_complete(self):
        from chameleon_entity_linking_ray.pipelines.analytics import psi_drift
        df = psi_drift("/root/testdata/sf0.001").to_pandas() \
            .sort_values("bucket").reset_index(drop=True)
        assert df["bucket"].tolist() == list(range(10))
        # (p - q) * ln(p / q) is nonnegative term by term
        assert (df["contrib"] >= 0).all()
        assert df["n_ref"].sum() > 0 and df["n_cur"].sum() > 0
        assert df["n_ref"].sum() + df["n_cur"].sum() == 1500


class TestDqChecks:
    def test_clean_data_has_zero_violations(self):
        from chameleon_entity_linking_ray.pipelines.analytics import dq_checks
        df = dq_checks("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 5
        assert (df["violations"] == 0).all()
        assert (df["n_checked"] == 1500).all()

    def test_planted_violations_are_counted(self, tmp_path):
        import numpy as np
        import pandas as pd
        from chameleon_entity_linking_ray.pipelines.analytics import dq_checks

        pd.DataFrame({"c_custkey": np.array([1, 2, 3], np.int64)}) \
            .to_parquet(tmp_path / "customer.parquet")
        orders = pd.DataFrame({
            # one duplicate orderkey
            "o_orderkey": np.array([10, 10, 11, 12, 13], np.int64),
            # one unknown custkey (99), one NULL
            "o_custkey": pd.array([1, 2, 99, None, 3],
                                  dtype=pd.Int64Dtype()),
            # one negative price
            "o_totalprice": [5.0, 6.0, -1.0, 7.0, 8.0],
            # one out-of-range date
            "o_orderdate": pd.to_datetime(
                ["1995-06-01", "1996-06-01", "1997-06-01",
                 "1980-01-01", "1998-06-01"]),
        })
        orders.to_parquet(tmp_path / "orders.parquet")
        df = dq_checks(str(tmp_path)).to_pandas().set_index("rule")
        assert df.loc["unique_orderkey", "violations"] == 1
        # NULL custkey rows do not join customer either, so the FK rule
        # sees both the unknown key and the NULL (SQL LEFT JOIN parity)
        assert df.loc["fk_custkey_customer", "violations"] == 2
        assert df.loc["null_custkey", "violations"] == 1
        assert df.loc["nonneg_price", "violations"] == 1
        assert df.loc["date_in_range", "violations"] == 1
        assert (df["n_checked"] == 5).all()
