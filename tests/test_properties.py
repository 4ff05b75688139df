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


# --- round-4 kernels: pure-function property pins -------------------------


@settings(max_examples=200, deadline=None)
@given(npos=st.integers(0, 4), nneg=st.integers(1, 7),
       epochs=st.integers(1, 12))
def test_rotation_closed_form_equals_queue_simulation(npos, nneg, epochs):
    """The closed form behind traindata.train_rotation — P[v % |P|] /
    N[v % |N|], two-negative fallback N[2v % |N|] / N[(2v+1) % |N|] —
    must equal the reference's literal pop-and-append queues
    (BiEncoder/model.py:407-424) for every queue size and epoch count."""
    P0 = list(range(100, 100 + npos))
    N0 = list(range(200, 200 + nneg))
    P, N = list(P0), list(N0)
    for v in range(epochs):
        if P:
            pos = P.pop(0); P.append(pos)
        else:
            pos = N.pop(0); N.append(pos)
        neg = N.pop(0); N.append(neg)
        if npos > 0:
            want_pos = P0[v % npos]
            want_neg = N0[v % nneg]
        else:
            want_pos = N0[(2 * v) % nneg]
            want_neg = N0[(2 * v + 1) % nneg]
        assert (pos, neg) == (want_pos, want_neg), (v, npos, nneg)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.floats(-1e6, 1e6, allow_nan=False,
                                   width=32),
                         min_size=4, max_size=8),
                min_size=1, max_size=16))
def test_int8_quant_invariants(rows):
    """corpus._int8_quant: |q| <= 127 always; scale is max |x|; the
    all-zero vector quantizes to all zeros; reconstruction error is
    bounded by one quantization step (scale / 127)."""
    from chameleon_entity_linking_ray.pipelines.corpus import _int8_quant
    d = max(len(r) for r in rows)
    mat = np.zeros((len(rows), d), np.float64)
    for i, r in enumerate(rows):
        mat[i, :len(r)] = r
    q, mx = _int8_quant(mat)
    assert np.abs(q).max(initial=0) <= 127
    assert np.allclose(mx, np.abs(mat).max(axis=1))
    zero = mx == 0
    assert (q[zero] == 0).all()
    nz = ~zero
    if nz.any():
        recon = q[nz] * mx[nz, None] / 127.0
        step = mx[nz, None] / 127.0
        assert (np.abs(mat[nz] - recon) <= step + 1e-9).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(10_000_00, 99_999_99), min_size=2,
                max_size=20, unique=True))
def test_stringsort_quirk_vanishes_on_equal_digit_lengths(cents):
    """Lexicographic string descent equals numeric descent exactly when
    every score string has the same digit count — the boundary condition
    that makes analytics.stringsort_rank_quirk's rank_str == rank_num."""
    strs = [f"{c // 100}.{c % 100:02d}" for c in cents]
    by_str = sorted(range(len(cents)), key=lambda i: strs[i], reverse=True)
    by_num = sorted(range(len(cents)), key=lambda i: cents[i], reverse=True)
    assert by_str == by_num
