"""O6 pos/neg training rotation (pipelines/traindata.py): each op pinned
against a LITERAL simulation of the reference's control flow — the global
counter loop (CrossEncoder/train.py:88-109) and the pop-and-append queue
rotation (BiEncoder/model.py:399-430) — rather than a closed form, so the
closed-form kernels are verified against the semantics they claim.
DuckDB value oracles live in __ray_entry__.oracle_sql()."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _ranked_orders() -> pd.DataFrame:
    df = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                        ascending=[True, False, True], kind="mergesort")
    df["rnk"] = df.groupby("o_custkey", sort=False).cumcount() + 1
    return df


class TestTrainInterleave:
    def test_matches_global_counter_simulation(self):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            train_interleave)
        got = train_interleave(SF).to_pandas().sort_values("ordinal") \
            .reset_index(drop=True)

        # literal reference loop: cnt % (ratio+1) picks pos vs neg
        df = _ranked_orders()
        rows = []
        cnt = 0
        for qid, g in df[df["rnk"] <= 5].groupby("o_custkey", sort=True):
            keys = g["o_orderkey"].tolist()
            pos, negs = keys[0], keys[1:]
            for neg in negs:
                pid = pos if cnt % 5 == 0 else neg
                rows.append((cnt, qid, pid, 1 if cnt % 5 == 0 else 0))
                cnt += 1
        want = pd.DataFrame(rows,
                            columns=["ordinal", "qid", "pid", "label"])
        assert len(got) == len(want)
        for c in want.columns:
            assert got[c].astype(np.int64).tolist() == \
                want[c].astype(np.int64).tolist(), c

    def test_small_range_size_exercises_multiple_ranges(self):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            train_interleave)
        a = train_interleave(SF).to_pandas() \
            .sort_values("ordinal").reset_index(drop=True)
        b = train_interleave(SF, range_size=16).to_pandas() \
            .sort_values("ordinal").reset_index(drop=True)
        assert a.equals(b)


class TestTrainRotation:
    def test_matches_pop_append_queue_simulation(self):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            train_rotation)
        got = train_rotation(SF).to_pandas() \
            .sort_values(["qid", "visit"]).reset_index(drop=True)

        # literal reference queues: pop(0) + append, two-neg fallback
        df = _ranked_orders()
        pool = df[df["rnk"] <= 8]
        rows = []
        for qid, g in pool.groupby("o_custkey", sort=True):
            fmask = (g["o_orderstatus"] == "F").to_numpy()
            pidx = np.flatnonzero(fmask)[:2]
            pmask = np.zeros(len(g), bool)
            pmask[pidx] = True
            P = g["o_orderkey"].to_numpy()[pmask].tolist()
            PT = np.round(
                g["o_totalprice"].to_numpy()[pmask] * 1e-3, 6).tolist()
            nidx = np.flatnonzero(~pmask)[:6]
            N = g["o_orderkey"].to_numpy()[nidx].tolist()
            NT = np.round(
                g["o_totalprice"].to_numpy()[nidx] * 1e-3, 6).tolist()
            if not N:
                continue
            for v in range(3):
                if P:
                    pos = P.pop(0); P.append(pos)
                    pt = PT.pop(0); PT.append(pt)
                else:
                    pos = N.pop(0); N.append(pos)
                    pt = NT.pop(0); NT.append(pt)
                neg = N.pop(0); N.append(neg)
                nt = NT.pop(0); NT.append(nt)
                rows.append((qid, v, pos, neg, pt - nt))
        want = pd.DataFrame(rows, columns=["qid", "visit", "pos_id",
                                           "neg_id", "margin"])
        assert len(got) == len(want)
        for c in ["qid", "visit", "pos_id", "neg_id"]:
            assert got[c].astype(np.int64).tolist() == \
                want[c].astype(np.int64).tolist(), c
        assert np.allclose(got["margin"], want["margin"], atol=1e-12)

    def test_two_negative_branch_is_exercised(self):
        # queries whose top-8 pool has no 'F' order take the two-neg path
        df = _ranked_orders()
        pool = df[df["rnk"] <= 8]
        nopos = pool.groupby("o_custkey")["o_orderstatus"] \
            .apply(lambda s: (s == "F").sum() == 0)
        assert nopos.any(), "fixture lost its zero-positive queries"
