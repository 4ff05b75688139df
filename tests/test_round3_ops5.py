"""Forward as-of join, grouped Pearson correlation, and the dataset
profiler, pinned against brute-force references."""

import numpy as np
import pandas as pd
import pytest


class TestAsofNextEvent:
    def test_matches_pandas_forward_asof(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            asof_next_event_after_order,
        )
        rng = np.random.default_rng(61)
        n_o, n_e = 120, 200
        orders = pd.DataFrame({
            "o_orderkey": np.arange(1, n_o + 1, dtype=np.int64),
            "o_custkey": rng.integers(1, 15, n_o).astype(np.int64),
            "o_orderdate": pd.Timestamp("2023-01-01")
            + pd.to_timedelta(rng.integers(0, 100, n_o), unit="D"),
        })
        events = pd.DataFrame({
            "event_id": np.arange(1, n_e + 1, dtype=np.int64),
            # coarse grid -> same-second ties within users
            "ts": pd.Timestamp("2023-02-01")
            + pd.to_timedelta(rng.integers(0, 80, n_e) * 86400, unit="s"),
            "user_id": rng.integers(1, 15, n_e).astype(np.int64),
        })
        d = tmp_path / "sf"
        d.mkdir()
        orders.to_parquet(d / "orders.parquet")
        events.to_parquet(d / "events.parquet")
        got = asof_next_event_after_order(str(d)).to_pandas() \
            .sort_values("o_orderkey").reset_index(drop=True)

        ev = events.copy()
        ev["event_ts_s"] = ev["ts"].astype("int64") // 10**9
        ev = ev.groupby(["user_id", "event_ts_s"], as_index=False) \
            .agg(next_event=("event_id", "min")) \
            .sort_values("event_ts_s", kind="mergesort")
        od = orders.copy()
        od["order_ts_s"] = od["o_orderdate"].astype("int64") // 10**9
        ref = pd.merge_asof(od.sort_values("order_ts_s", kind="mergesort"),
                            ev, left_on="order_ts_s",
                            right_on="event_ts_s",
                            left_by="o_custkey", right_by="user_id",
                            direction="forward")
        ref = ref[ref["next_event"].notna()].sort_values("o_orderkey")
        assert got["o_orderkey"].tolist() == ref["o_orderkey"].tolist()
        assert got["next_event"].tolist() == \
            ref["next_event"].astype(int).tolist()
        assert got["event_ts_s"].tolist() == \
            ref["event_ts_s"].astype(int).tolist()
        assert len(got) > 0


class TestFlagCorr:
    def test_matches_formula(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            flag_corr,
        )
        rng = np.random.default_rng(67)
        n = 2000
        li = pd.DataFrame({
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_quantity": rng.integers(1, 50, n).astype(np.float64),
            "l_extendedprice": rng.uniform(1000, 90000, n),
        })
        d = tmp_path / "sf"
        d.mkdir()
        li.to_parquet(d / "lineitem.parquet")
        got = flag_corr(str(d)).to_pandas().set_index("l_returnflag")
        for flag, sub in li.groupby("l_returnflag"):
            x = np.trunc(sub["l_quantity"].to_numpy()).astype(np.int64)
            y = np.trunc(sub["l_extendedprice"].to_numpy()).astype(np.int64)
            nn = float(len(x))
            sx, sy = float(x.sum()), float(y.sum())
            sxx, syy = float((x * x).sum()), float((y * y).sum())
            sxy = float((x * y).sum())
            ref = (nn * sxy - sx * sy) / (np.sqrt(nn * sxx - sx * sx)
                                          * np.sqrt(nn * syy - sy * sy))
            assert got.loc[flag, "corr_qty_price"] == ref
            # sanity: agrees with np.corrcoef to float tolerance
            assert got.loc[flag, "corr_qty_price"] == pytest.approx(
                np.corrcoef(x, y)[0, 1], abs=1e-9)


class TestProfileOrders:
    def test_counts_nulls_distinct(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            profile_orders,
        )
        orders = pd.DataFrame({
            "o_orderkey": np.arange(1, 9, dtype=np.int64),
            "o_custkey": pd.array([1, 2, 2, None, 3, 3, 3, None],
                                  dtype="Int64"),
            "o_totalprice": [10.5, 10.5, 20.25, 30.0, 30.0, 40.75,
                             50.0, 60.125],
        })
        d = tmp_path / "sf"
        d.mkdir()
        orders.to_parquet(d / "orders.parquet")
        got = profile_orders(str(d)).to_pandas().set_index("col")
        assert got.loc["o_orderkey", "n"] == 8
        assert got.loc["o_orderkey", "n_null"] == 0
        assert got.loc["o_orderkey", "n_distinct"] == 8
        assert got.loc["o_orderkey", "min_v"] == 1
        assert got.loc["o_orderkey", "max_v"] == 8
        assert got.loc["o_custkey", "n_null"] == 2
        assert got.loc["o_custkey", "n_distinct"] == 3
        assert got.loc["o_custkey", "min_v"] == 1
        assert got.loc["o_custkey", "max_v"] == 3
        assert got.loc["o_totalprice_c", "n_distinct"] == 6
        assert got.loc["o_totalprice_c", "min_v"] == 1050
        assert got.loc["o_totalprice_c", "max_v"] == 6012


class TestZscoreEvents:
    def test_matches_formula_and_is_standardized(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            zscore_events,
        )
        rng = np.random.default_rng(83)
        m = 500
        events = pd.DataFrame({
            "event_id": np.arange(1, m + 1, dtype=np.int64),
            "ts": pd.Timestamp("2022-01-01"),
            "user_id": np.int64(1),
            "event_type": "view",
            "value": rng.uniform(0, 200, m),
        })
        d = tmp_path / "sf"
        d.mkdir()
        events.to_parquet(d / "events.parquet")
        got = zscore_events(str(d)).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        c = np.trunc(events["value"].to_numpy() * 100).astype(np.int64)
        n = len(c)
        mean = float(c.sum()) / n
        std = np.sqrt((float((c * c).sum())
                       - float(c.sum()) * float(c.sum()) / n) / n)
        assert (got["z"].to_numpy() == (c - mean) / std).all()
        # standardized: mean ~ 0, var ~ 1
        assert abs(got["z"].mean()) < 1e-12
        assert got["z"].std(ddof=0) == pytest.approx(1.0, abs=1e-12)
