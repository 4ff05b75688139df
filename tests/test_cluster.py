"""Connected-components tests: union-find fast path AND the distributed
alternating-star loop, both checked against a brute-force oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from chameleon_entity_linking_ray.stages.cluster import connected_components


def brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def edges_ds(edges):
    return rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64()),
    }))


def check(edges, **kwargs):
    assignments, stats = connected_components(edges_ds(edges), num_partitions=4,
                                              **kwargs)
    got = {r["node"]: r["cluster"] for r in assignments.take_all()}
    expected = brute_components(edges)
    assert got == expected, (stats, got, expected)
    return stats


class TestUnionFindPath:
    def test_chain(self):
        check([(1, 2), (2, 3), (3, 4)])

    def test_two_components(self):
        check([(1, 2), (10, 20), (20, 30)])

    def test_duplicate_and_reversed_edges(self):
        check([(2, 1), (1, 2), (2, 3), (3, 2)])

    def test_empty(self):
        assignments, stats = connected_components(edges_ds([]), num_partitions=4)
        assert assignments.count() == 0


class TestStarLoopPath:
    """driver_threshold=0 forces the distributed alternating-star loop."""

    def test_chain(self):
        stats = check([(1, 2), (2, 3), (3, 4), (4, 5)], driver_threshold=0)
        assert stats["cc_mode"] == "star"

    def test_random_graph_matches_oracle(self):
        rng = np.random.RandomState(3)
        nodes = rng.choice(1000, size=(60, 2)).tolist()
        edges = [(int(a), int(b)) for a, b in nodes if a != b]
        check(edges, driver_threshold=0)

    def test_star_already(self):
        check([(1, 2), (1, 3), (1, 4)], driver_threshold=0)

    def test_two_cliques(self):
        c1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
        c2 = [(i, j) for i in range(100, 104) for j in range(i + 1, 104)]
        check(c1 + c2, driver_threshold=0)
