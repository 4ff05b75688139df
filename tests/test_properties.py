"""Property-based tests (SURVEY.md §5.6, hypothesis): clustering is a
valid partition, thresholds are monotone, and both CC paths agree with a
pure-python reachability oracle on random graphs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd
from hypothesis import given, settings, strategies as st

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.pipelines.linkage import run_linkage
from chameleon_entity_linking_ray.testing.synth import make_transcripts


def _clustered(seed: int, threshold: float) -> pd.DataFrame:
    transcripts, _ = make_transcripts(n_convs=10, n_entities=4, seed=seed)
    ds = rd.from_arrow(transcripts).select_columns(
        ["conv_id", "turn_idx", "text"])
    out, _ = run_linkage(ds, LinkageConfig(score_threshold=threshold))
    return out.to_pandas()


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 9999))
def test_clustering_is_valid_partition(seed):
    df = _clustered(seed, 0.70)
    # every mention appears exactly once (a partition, no dup/loss)
    assert df["mention_id"].is_unique
    # cluster identity is a function of the normalized surface
    assert (df.groupby("norm")["cluster_id"].nunique() == 1).all()
    # every cluster id is a member node id (min-node convention)
    assert set(df["cluster_id"]) <= set(df["node"])


@settings(max_examples=3, deadline=None)
@given(seed=st.integers(0, 9999))
def test_threshold_monotone_refinement(seed):
    """Raising theta never merges clusters: the high-theta clustering must
    be a refinement of the low-theta clustering."""
    lo = _clustered(seed, 0.60).set_index("mention_id")["cluster_id"]
    hi = _clustered(seed, 0.80).set_index("mention_id")["cluster_id"]
    joined = pd.DataFrame({"lo": lo, "hi": hi})
    assert (joined.groupby("hi")["lo"].nunique() == 1).all()


def _reach_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-python reachability oracle: cluster = min node per component."""
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    label: dict[int, int] = {}
    for start in adj:
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x] - seen:
                seen.add(y)
                stack.append(y)
        root = min(comp)
        for x in comp:
            label[x] = root
    return label


@settings(max_examples=3, deadline=None)
@given(seed=st.integers(0, 9999), n_nodes=st.integers(4, 40),
       n_edges=st.integers(1, 80))
@pytest.mark.parametrize("driver_threshold", [10**9, 0])
def test_cc_matches_reachability_oracle(driver_threshold, seed, n_nodes,
                                        n_edges):
    """Both CC paths (vectorized driver fast path AND the distributed
    large/small-star loop, forced via driver_threshold=0) must equal the
    reachability oracle on random graphs."""
    from chameleon_entity_linking_ray.stages.cluster import connected_components
    rng = np.random.RandomState(seed)
    edges = [(int(a), int(b)) for a, b in
             rng.randint(0, n_nodes, (n_edges, 2)) if a != b]
    if not edges:
        return
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["u", "v"]))
    got, stats = connected_components(ds, num_partitions=4,
                                      driver_threshold=driver_threshold)
    got_map = got.to_pandas().set_index("node")["cluster"].to_dict()
    want = _reach_components(edges)
    assert got_map == want, stats
