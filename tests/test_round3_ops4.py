"""Full-outer join aggregate, interpolated percentiles, and block-mean
media resize, pinned against brute-force references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestNationBalanceFull:
    def test_missing_sides_are_null(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            nation_balance_full,
        )
        customer = pd.DataFrame({
            "c_custkey": np.arange(6, dtype=np.int64),
            # nation 3 filtered out entirely (balance below threshold),
            # nation 9 never appears -> supplier-only row
            "c_nationkey": np.array([1, 1, 2, 3, 2, 5], np.int32),
            "c_acctbal": [9000.0, 8000.5, 7000.25, 100.0, 6000.0, 5000.5],
        })
        supplier = pd.DataFrame({
            "s_suppkey": np.arange(3, dtype=np.int64),
            "s_nationkey": np.array([2, 9, 9], np.int32),
            "s_acctbal": [1000.5, 2000.25, 3000.0],
        })
        d = tmp_path / "sf"
        d.mkdir()
        customer.to_parquet(d / "customer.parquet")
        supplier.to_parquet(d / "supplier.parquet")
        got = nation_balance_full(str(d)).to_pandas() \
            .sort_values("nationkey").reset_index(drop=True)
        assert got["nationkey"].tolist() == [1, 2, 5, 9]
        row = got.set_index("nationkey")
        assert row.loc[1, "cust_bal_c"] == 900000 + 800050
        assert pd.isna(row.loc[1, "supp_bal_c"])      # customer-only
        assert row.loc[2, "supp_bal_c"] == 100050
        assert row.loc[2, "cust_bal_c"] == 700025 + 600000
        assert pd.isna(row.loc[9, "cust_bal_c"])      # supplier-only
        assert row.loc[9, "supp_bal_c"] == 200025 + 300000


class TestPercentilesCont:
    def test_matches_numpy_type7(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            percentiles_cont,
        )
        rng = np.random.default_rng(53)
        n = 5000
        li = pd.DataFrame({
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_extendedprice": rng.uniform(900, 105000, n),
        })
        d = tmp_path / "sf"
        d.mkdir()
        li.to_parquet(d / "lineitem.parquet")
        got = percentiles_cont(str(d)).to_pandas() \
            .sort_values("q").reset_index(drop=True)
        cents = np.trunc(li["l_extendedprice"].to_numpy() * 100) \
            .astype(np.int64)
        for _, row in got.iterrows():
            # numpy's default interpolation IS type-7 linear
            ref = np.quantile(cents, row["q"], method="linear")
            assert row["val_c"] == pytest.approx(ref, abs=1e-6)


class TestMediaResize:
    def test_matches_direct_blockmean(self):
        import ray.data as rd
        from chameleon_entity_linking_ray.stages.multimodal import (
            encode_bmp, resize_media,
        )
        rng = np.random.default_rng(59)
        rows = []
        pixmap = {}
        for mid, (h, w) in enumerate([(8, 8), (15, 9), (32, 11), (4, 4)]):
            px = rng.integers(0, 256, (h, w)).astype(np.uint8)
            pixmap[mid] = px
            rows.append({"media_id": mid, "payload": encode_bmp(px),
                         "width": w, "height": h})
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        got = resize_media(ds, out_w=4, out_h=4).to_pandas()
        for mid, px in pixmap.items():
            h, w = px.shape
            ry = (np.arange(h) * 4) // h
            rx = (np.arange(w) * 4) // w
            sub = got[got["media_id"] == mid]
            assert len(sub) == 16
            for _, r in sub.iterrows():
                cell = px[(ry == r["py"])][:, rx == r["px"]]
                s = float(cell.astype(np.float64).sum())
                assert r["v"] == s / cell.size

    def test_corrupt_payload_dead_letters(self):
        import ray.data as rd
        from chameleon_entity_linking_ray.stages.multimodal import (
            encode_bmp, resize_media,
        )
        good = encode_bmp(np.zeros((4, 4), np.uint8))
        ds = rd.from_arrow(pa.Table.from_pylist([
            {"media_id": 0, "payload": good},
            {"media_id": 1, "payload": b"not media"},
        ]))
        got = resize_media(ds).to_pandas()
        assert (got[got["media_id"] == 0]["v"] == 0.0).all()
        dead = got[got["media_id"] == 1]
        assert len(dead) == 1 and dead["py"].iloc[0] == -1
        assert np.isnan(dead["v"].iloc[0])
