"""Blocking + pair generation tests: canonical ordering, no self-pairs,
dedup, windowed skew capping, and brute-force recall oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.functions.hashing import node_id
from chameleon_entity_linking_ray.stages.blocking import (
    LshBander,
    _run_pairs,
    dedup_pairs_fn,
    make_pair_generator,
)


def vocab_batch(norms):
    return pa.table({
        "norm": pa.array(norms, pa.string()),
        "node": pa.array(node_id(norms), pa.int64()),
    })


class TestRunPairs:
    def test_all_pairs_small_runs(self):
        li, ri = _run_pairs(np.array([3, 2]), window=8, max_block=64)
        pairs = set(zip(li.tolist(), ri.tolist()))
        assert pairs == {(0, 1), (0, 2), (1, 2), (3, 4)}

    def test_windowed_large_run(self):
        n = 100
        li, ri = _run_pairs(np.array([n]), window=2, max_block=10)
        # each i pairs with i+1, i+2 only
        assert len(li) == 2 * n - 3
        assert (ri - li).max() == 2
        # connectivity: consecutive chain present
        chain = set(zip(range(n - 1), range(1, n)))
        assert chain <= set(zip(li.tolist(), ri.tolist()))

    def test_empty(self):
        li, ri = _run_pairs(np.array([1]), window=8, max_block=64)
        assert len(li) == 0


class TestPairGeneration:
    def _pairs_for(self, norms, cfg=None):
        cfg = cfg or LinkageConfig()
        banded = LshBander(cfg)(vocab_batch(norms)).to_pandas()
        gen = make_pair_generator(cfg)
        out = [gen(g) for _, g in banded.groupby("bucket")]
        df = pd.concat(out, ignore_index=True) if out else pd.DataFrame()
        if len(df):
            df = dedup_pairs_fn()(df)
        return df

    def test_no_self_pairs_canonical_order(self):
        df = self._pairs_for(["acme industries", "acme ind", "acme", "globex corp"])
        assert (df["left_id"] < df["right_id"]).all()

    def test_token_blocking_catches_subset_alias(self):
        df = self._pairs_for(["hooli", "hooli industries"])
        # char-Jaccard is low but the shared token must block them together
        assert len(df) == 1

    def test_lsh_catches_typo_alias(self):
        df = self._pairs_for(["wayne industries", "wbyne industries"])
        assert len(df) == 1

    def test_dedup_unique_pairs(self):
        df = self._pairs_for(["acme industries", "acme industries x",
                              "acme industries y"])
        keys = list(zip(df["left_id"], df["right_id"]))
        assert len(keys) == len(set(keys))

    def test_disjoint_surfaces_not_paired(self):
        df = self._pairs_for(["qqqq zzzz", "wwww rrrr"])
        assert len(df) == 0

    def test_hot_block_capped(self):
        cfg = LinkageConfig(max_block_size=8, pair_window=2)
        norms = [f"hotword suffix{i:03d}" for i in range(50)]
        df = self._pairs_for(norms, cfg)
        # token block "hotword" has 50 members: windowed => <= ~n*W per block
        # (each surface also collides in other blocks; bound is loose but
    # far below the all-pairs 1225)
        assert 0 < len(df) < 400
