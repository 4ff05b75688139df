"""Transitive clustering: distributed connected components over matched pairs.

The engine generalization of the reference's per-query dedup/merge logic
(SURVEY.md §2.7): matched pairs (score > theta) are edges; clusters are the
connected components; cluster_id = min node id in the component.

Algorithm: alternating large-star / small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond" — see PAPERS.md), expressed
entirely as Ray Data shuffles: per round a symmetrize (`union`), a native
``groupby('u').aggregate(Min('v'))`` (vectorized partial-then-final — no
per-row Python), a hash-partitioned ``Dataset.join`` to attach each node's
min-neighbor, vectorized Arrow emits, and a multiset-stable checksum for
fixpoint detection. Converges in O(log n) rounds; every step streams —
no driver-side graph is ever built.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min

from chameleon_entity_linking_ray.functions.hashing import mix64
from chameleon_entity_linking_ray.stages.joins import hash_join

_M64 = (1 << 64) - 1


def _swap(batch: pa.Table) -> pa.Table:
    return pa.table({"u": batch.column("v"), "v": batch.column("u")})


def _symmetrize(edges: Dataset) -> Dataset:
    return edges.union(edges.map_batches(_swap, batch_format="pyarrow"))


def _canon_dedup(edges: Dataset, num_partitions: int) -> Dataset:
    """Canonicalize to (u=min, v=max) and exact-dedup via vectorized groupby."""

    def canon(batch: pa.Table) -> pa.Table:
        u = batch.column("u")
        v = batch.column("v")
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"u": lo, "v": hi})
        return t.filter(pc.not_equal(t.column("u"), t.column("v")))

    e = edges.map_batches(canon, batch_format="pyarrow")
    return e.groupby(["u", "v"]).aggregate(Min("v", alias_name="_d")).drop_columns(["_d"])


def _checksum(edges: Dataset) -> tuple[int, int]:
    """Order-independent (sum mod 2^64) multiset checksum + count."""

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = mix64(u ^ mix64(v, seed=3), seed=5)
        return pa.table({"h": pa.array([int(h.sum(dtype=np.uint64))], pa.uint64()),
                         "n": pa.array([len(u)], pa.int64())})

    parts = edges.map_batches(partial, batch_format="pyarrow").take_all()
    total_h = 0
    total_n = 0
    for row in parts:
        total_h = (total_h + int(row["h"])) & _M64
        total_n += int(row["n"])
    return total_h, total_n


def _attach_min(sym: Dataset, num_partitions: int) -> Dataset:
    """(u, v) -> (u, v, m) where m = min(neighbors(u) + {u})."""
    mins = sym.groupby("u").aggregate(Min("v", alias_name="mv"))
    joined = hash_join(sym, mins, on=("u",), num_partitions=num_partitions)

    def with_m(batch: pa.Table) -> pa.Table:
        m = pc.min_element_wise(batch.column("mv"), batch.column("u"))
        return batch.drop_columns(["mv"]).append_column("m", m)

    return joined.map_batches(with_m, batch_format="pyarrow")


def _large_star(edges: Dataset, num_partitions: int) -> Dataset:
    sym = _symmetrize(edges)
    t = _attach_min(sym, num_partitions)

    def emit(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column("v"), batch.column("u"))
        b = batch.filter(keep)
        out = pa.table({"u": b.column("v"), "v": b.column("m")})
        return out.filter(pc.not_equal(out.column("u"), out.column("v")))

    return t.map_batches(emit, batch_format="pyarrow")


def _small_star(edges: Dataset, num_partitions: int) -> Dataset:
    sym = _symmetrize(edges)
    small = sym.map_batches(
        lambda b: b.filter(pc.less(b.column("v"), b.column("u"))),
        batch_format="pyarrow")
    t = _attach_min(small, num_partitions)

    def emit(batch: pa.Table) -> pa.Table:
        # (v, m) for each small neighbor v, plus (u, m) — dedup of the (u, m)
        # rows happens in the canonical dedup pass after the round.
        out = pa.table({
            "u": pa.concat_arrays([pc.cast(c, pa.int64()) for c in
                                   (batch.column("v").combine_chunks(),
                                    batch.column("u").combine_chunks())]),
            "v": pa.concat_arrays([pc.cast(c, pa.int64()) for c in
                                   (batch.column("m").combine_chunks(),
                                    batch.column("m").combine_chunks())]),
        })
        return out.filter(pc.not_equal(out.column("u"), out.column("v")))

    return t.map_batches(emit, batch_format="pyarrow")


def _unionfind_assignments(edges: Dataset) -> Dataset:
    """Driver union-find over a provably-small edge set (streamed in
    batches): the sanctioned fast path when the matched-pair set fits one
    process — it avoids ~6 all-to-all ops per star round. cluster = min
    node in component (union by min keeps the root the minimum)."""
    import pandas as pd
    import ray.data

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for batch in edges.iter_batches(batch_size=65536, batch_format="pandas"):
        for u, v in zip(batch["u"].to_numpy(), batch["v"].to_numpy()):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
    if not parent:
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype=np.int64), "cluster": pd.Series(dtype=np.int64)}))
    nodes = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    roots = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64, count=len(nodes))
    uniq_roots = np.unique(roots)
    df = pd.DataFrame({"node": np.concatenate([nodes, uniq_roots]),
                       "cluster": np.concatenate([roots, uniq_roots])}) \
        .drop_duplicates("node")
    return ray.data.from_pandas(df)


def connected_components(edges: Dataset, num_partitions: int = 32,
                         max_rounds: int = 50,
                         driver_threshold: int = 2_000_000) -> tuple[Dataset, dict]:
    """edges(u:int64, v:int64) -> (assignments(node:int64, cluster:int64), stats).

    ``assignments`` covers every node that appears in an edge; singleton
    nodes (no edges) are their own cluster — callers fill them at join-back
    time (see pipelines/linkage.py). cluster = min node id in the component.

    Two execution paths:
    - edge count <= ``driver_threshold``: single-pass union-find streamed on
      the driver (matched edges after thresholding are a small fraction of
      the input).
    - larger: fully distributed alternating large-star/small-star loop —
      O(log n) rounds of groupby/join shuffles; nothing driver-side but an
      order-independent checksum per round.
    """
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        return _unionfind_assignments(edges), {
            "cc_rounds": 0, "cc_mode": "unionfind", "cc_edges": n_edges}
    # materialize() per round truncates the lazy lineage — without it every
    # checksum re-executes all previous rounds. The edge table is the only
    # pinned intermediate and shrinks toward one row per non-root node.
    edges = _canon_dedup(edges, num_partitions).materialize()
    prev = _checksum(edges)
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        e = _large_star(edges, num_partitions)
        e = _small_star(e, num_partitions)
        e = _canon_dedup(e, num_partitions).materialize()
        cur = _checksum(e)
        edges = e
        if cur == prev:
            break
        prev = cur

    # converged: every edge is (leaf, root) with root = component min.
    def leaf_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("v"), "cluster": batch.column("u")})

    leaves = edges.map_batches(leaf_rows, batch_format="pyarrow")
    roots = edges.groupby("u").aggregate(Min("v", alias_name="_x")).drop_columns(["_x"]) \
        .map_batches(lambda b: pa.table({"node": b.column("u"), "cluster": b.column("u")}),
                     batch_format="pyarrow")
    assignments = leaves.union(roots)
    return assignments, {"cc_rounds": rounds, "cc_mode": "star", "cc_edges": n_edges}
