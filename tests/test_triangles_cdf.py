"""Distributed triangle counting (degree-ordered orientation) and the
broadcast-CDF CUME_DIST operator, pinned against brute-force references.
The DuckDB value oracles in __ray_entry__ are the independent check.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


class TestTriangleCounts:
    def _edges_ds(self, und_pairs):
        # engine input is the symmetric directed edge set (both rows)
        rows = [{"src": int(a), "dst": int(b)} for a, b in und_pairs]
        rows += [{"src": int(b), "dst": int(a)} for a, b in und_pairs]
        return rd.from_items(rows)

    def _brute(self, und_pairs):
        es = {tuple(sorted(p)) for p in und_pairs}
        nodes = sorted({n for e in es for n in e})
        from collections import Counter
        c = Counter()
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                if (a, b) not in es:
                    continue
                for cn in nodes:
                    if cn <= b:
                        continue
                    if (a, cn) in es and (b, cn) in es:
                        c[a] += 1
                        c[b] += 1
                        c[cn] += 1
        return pd.DataFrame(sorted(c.items()),
                            columns=["node", "n_triangles"]) \
            .astype(np.int64)

    def test_matches_bruteforce_random_graph(self):
        from chameleon_entity_linking_ray.stages.graph import triangle_counts
        rng = np.random.default_rng(17)
        n = 40
        pairs = {tuple(sorted(rng.choice(n, 2, replace=False)))
                 for _ in range(220)}
        got = triangle_counts(self._edges_ds(pairs)).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        ref = self._brute(pairs)
        assert len(ref) > 0
        pd.testing.assert_frame_equal(got.astype(np.int64), ref)

    def test_hub_graph_skew(self):
        # star + one closing rim cycle: hub participates in every rim
        # triangle; degree orientation must not blow up or miscount
        from chameleon_entity_linking_ray.stages.graph import triangle_counts
        hub, rim = 0, list(range(1, 13))
        pairs = [(hub, r) for r in rim]
        pairs += [(rim[i], rim[(i + 1) % len(rim)]) for i in range(len(rim))]
        got = triangle_counts(self._edges_ds(pairs)).to_pandas() \
            .set_index("node")["n_triangles"]
        # each rim edge forms exactly one triangle with the hub
        assert got[hub] == len(rim)
        for r in rim:
            assert got[r] == 2  # two adjacent rim edges x hub


class TestCumeDist:
    def test_matches_bruteforce_with_ties(self, tmp_path):
        from chameleon_entity_linking_ray.pipelines.analytics import (
            cume_dist_orders,
        )
        rng = np.random.default_rng(23)
        n = 500
        # coarse grid forces many exact ties
        total = rng.integers(10, 40, n) * 100.0
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
        got = cume_dist_orders(str(sf)).to_pandas() \
            .sort_values("o_orderkey").reset_index(drop=True)
        cents = np.trunc(total * 100).astype(np.int64)
        ref_cd = np.array([(cents <= c).sum() for c in cents]) / n
        assert (got["total_c"].to_numpy() == cents).all()
        # bit-exact: both sides compute (#<=)/n in IEEE double
        assert (got["cume_dist"].to_numpy() == ref_cd).all()
        # tie groups share one value
        df = got.groupby("total_c")["cume_dist"].nunique()
        assert (df == 1).all()
