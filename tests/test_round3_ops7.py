"""Sorted-Neighborhood blocking (stages/blocking.py:sorted_neighborhood_pairs)."""

import numpy as np
import pandas as pd
import pytest


def _brute_snm(df: pd.DataFrame, window: int) -> set[tuple[int, int]]:
    s = df.sort_values(["key", "id"], kind="mergesort").reset_index(drop=True)
    ids = s["id"].to_numpy()
    out = set()
    for j in range(len(ids)):
        for i in range(max(0, j - window + 1), j):
            out.add((int(ids[i]), int(ids[j])))
    return out


class TestSortedNeighborhood:
    @pytest.mark.parametrize("window", [2, 4, 7])
    def test_matches_bruteforce_multiblock(self, window):
        import ray.data as rd
        from chameleon_entity_linking_ray.stages.blocking import (
            sorted_neighborhood_pairs,
        )
        rng = np.random.default_rng(41)
        n = 300
        # duplicate keys on purpose: the id tie-break must make the pair
        # set deterministic
        keys = [f"k{rng.integers(0, 80):03d}" for _ in range(n)]
        df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "key": keys})
        shuffled = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
        ds = rd.from_pandas(shuffled).repartition(11)
        got = sorted_neighborhood_pairs(ds, key_col="key", id_col="id",
                                        window=window).to_pandas()
        got_set = set(zip(got["left_id"].astype(int),
                          got["right_id"].astype(int)))
        assert got_set == _brute_snm(df, window)
        # exactly one row per in-window pair (no dupes across blocks)
        assert len(got) == len(got_set)

    def test_left_is_sort_earlier(self):
        import ray.data as rd
        from chameleon_entity_linking_ray.stages.blocking import (
            sorted_neighborhood_pairs,
        )
        # keys sort AGAINST id order: left_id > right_id is legitimate
        df = pd.DataFrame({"id": np.arange(5, dtype=np.int64),
                           "key": ["e", "d", "c", "b", "a"]})
        got = sorted_neighborhood_pairs(rd.from_pandas(df), "key", "id",
                                        window=2).to_pandas() \
            .sort_values(["left_id", "right_id"]).reset_index(drop=True)
        assert got["left_id"].tolist() == [1, 2, 3, 4]
        assert got["right_id"].tolist() == [0, 1, 2, 3]

    def test_window_must_be_ge_2(self):
        import ray.data as rd
        from chameleon_entity_linking_ray.stages.blocking import (
            sorted_neighborhood_pairs,
        )
        df = pd.DataFrame({"id": [1], "key": ["a"]})
        with pytest.raises(ValueError):
            sorted_neighborhood_pairs(rd.from_pandas(df), "key", "id",
                                      window=1)
