"""Graph expansion: k-hop BFS and personalized PageRank over an edge
Dataset — the engine form of the reference's entity expander
(/root/reference/utils/entity_expander.py): its pickled adjacency dict +
scipy CSR PageRank (:24-77, :122-126) become (a) a broadcast adjacency for
small graphs and (b) iterative edge-join loops (the same skeleton as the
connected-components rounds) for graphs that exceed one node's RAM.

Edge tables are ``(src:int64, dst:int64)``; like the reference, expansion
follows REVERSED edges having been built that way upstream
(entity_expander.py:31-35 appends src to linked_pages[dst]).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data import Dataset

from chameleon_entity_linking_ray.functions.hashing import mix64


def _edges_to_csr(edges: Dataset):
    """Driver-side CSR for graphs that fit (reference parity path)."""
    df = edges.to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    si = np.fromiter((idx[int(s)] for s in src), np.int64, len(src))
    di = np.fromiter((idx[int(d)] for d in dst), np.int64, len(dst))
    return nodes, si, di


def bfs_expand(edges: Dataset, seeds: list[int], k: int = 2) -> Dataset:
    """All nodes within k hops of the seed set, with hop distance.

    Iterative frontier expansion, one round per hop: the frontier is
    broadcast (``ray.put``) and each edge block emits its frontier
    successors — a per-hop broadcast semi-join, never a driver adjacency
    scan. Returns (node:int64, hop:int32)."""
    edges = edges.materialize()
    visited: dict[int, int] = {int(s): 0 for s in seeds}
    frontier = set(visited)
    for hop in range(1, k + 1):
        ref = ray.put(frozenset(frontier))

        def step(batch: pa.Table) -> pa.Table:
            f = ray.get(ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            mask = np.fromiter((int(s) in f for s in src), bool, len(src))
            return pa.table({"node": pa.array(dst[mask], pa.int64())})

        nxt = edges.map_batches(step, batch_format="pyarrow")
        new_nodes = set()
        for b in nxt.iter_batches(batch_format="pyarrow"):
            new_nodes.update(int(x) for x in b.column("node").to_pylist())
        frontier = new_nodes - visited.keys()
        for n in frontier:
            visited[n] = hop
        if not frontier:
            break
    out = pd.DataFrame({"node": np.fromiter(visited.keys(), np.int64, len(visited)),
                        "hop": np.fromiter(visited.values(), np.int32, len(visited))})
    return ray.data.from_pandas(out)


def personalized_pagerank(edges: Dataset, seeds: list[int], alpha: float = 0.85,
                          iters: int = 20, num_buckets: int = 32) -> Dataset:
    """Distributed power iteration: rank table x edge table per round.

    Per round: join ranks to edges on src (bucketed shuffle), aggregate
    contributions per dst (combiner groupby), blend with the personalized
    restart vector. Same loop skeleton as the CC rounds (SURVEY.md A6) —
    only the per-round aggregate differs. Returns (node:int64, rank:float64).
    """
    edges = edges.materialize()

    # out-degree per src (one pass, combiner)
    deg: dict[int, int] = {}
    for b in edges.iter_batches(batch_format="pyarrow"):
        src = b.column("src").to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        for n, cnt in zip(u, c):
            deg[int(n)] = deg.get(int(n), 0) + int(cnt)

    nodes_set = set(deg)
    for b in edges.iter_batches(batch_format="pyarrow"):
        nodes_set.update(int(x) for x in b.column("dst").to_pylist())
    nodes = np.fromiter(sorted(nodes_set), np.int64, len(nodes_set))
    seed_arr = np.fromiter(sorted(set(int(s) for s in seeds)), np.int64)
    restart = np.isin(nodes, seed_arr).astype(np.float64)
    restart /= max(1.0, restart.sum())
    rank = restart.copy()
    deg_arr = np.array([deg.get(int(n), 0) for n in nodes], dtype=np.float64)

    for _ in range(iters):
        rank_ref = ray.put((nodes, np.divide(rank, deg_arr,
                                             out=np.zeros_like(rank),
                                             where=deg_arr > 0)))

        def contrib(batch: pa.Table) -> pa.Table:
            ns, shares = ray.get(rank_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ns, src)
            w = shares[np.clip(pos, 0, len(ns) - 1)]
            # partial per-dst sums inside the block (combiner)
            du, inv = np.unique(dst, return_inverse=True)
            sums = np.bincount(inv, weights=w)
            return pa.table({"node": pa.array(du, pa.int64()),
                             "w": pa.array(sums, pa.float64())})

        parts = edges.map_batches(contrib, batch_format="pyarrow")
        incoming = np.zeros(len(nodes), np.float64)
        for b in parts.iter_batches(batch_format="pyarrow"):
            n = b.column("node").to_numpy(zero_copy_only=False)
            w = b.column("w").to_numpy(zero_copy_only=False)
            # np.add.at, NOT fancy +=: a batch spans several blocks and can
            # repeat a node; fancy-index += keeps only the last duplicate
            np.add.at(incoming, np.searchsorted(nodes, n), w)
        # dangling mass redistributed to the restart vector, as
        # pagerank_power does (reference A6)
        dangling = rank[deg_arr == 0].sum()
        new_rank = alpha * (incoming + dangling * restart) + (1 - alpha) * restart
        if np.abs(new_rank - rank).sum() < 1e-12:
            rank = new_rank
            break
        rank = new_rank

    return ray.data.from_pandas(pd.DataFrame({"node": nodes, "rank": rank}))


def copurchase_edges(sf_dir: str) -> Dataset:
    """Part co-purchase graph from lineitem: (src part, dst part) for parts
    sharing an order, both directions, deduped — a self-join realized as a
    bucketed groupby over orders (never a cartesian across orders)."""
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])

    def bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        b = (mix64(ok.astype(np.uint64), seed=77) % np.uint64(32)).astype(np.int32)
        return batch.append_column("obucket", pa.array(b, pa.int32()))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby("l_orderkey", sort=False):
            parts = np.unique(sub["l_partkey"].to_numpy(np.int64))
            if len(parts) < 2:
                continue
            iu, ju = np.triu_indices(len(parts), k=1)
            outs.append(pd.DataFrame({"src": parts[iu], "dst": parts[ju]}))
        if not outs:
            return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                 "dst": pd.Series(dtype=np.int64)})
        df = pd.concat(outs)
        both = pd.concat([df, df.rename(columns={"src": "dst", "dst": "src"})])
        return both.drop_duplicates()

    def dedup_bucket(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        b = (mix64(s.astype(np.uint64), seed=79) % np.uint64(32)).astype(np.int32)
        return batch.append_column("ebucket", pa.array(b, pa.int32()))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["src", "dst"])[["src", "dst"]]

    return li.map_batches(bucket, batch_format="pyarrow") \
        .groupby("obucket").map_groups(pairs, batch_format="pandas") \
        .map_batches(dedup_bucket, batch_format="pyarrow") \
        .groupby("ebucket").map_groups(dedup, batch_format="pandas")


def bfs_copurchase(sf_dir: str, seed_part: int = 0, k: int = 2) -> Dataset:
    """k-hop BFS over the co-purchase graph (oracle: recursive CTE)."""
    out = bfs_expand(copurchase_edges(sf_dir), [seed_part], k=k)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node").cast(pa.int64()),
                         "hop": batch.column("hop").cast(pa.int64())})

    return out.map_batches(shape, batch_format="pyarrow")


def ppr_copurchase(sf_dir: str, seed_part: int = 0) -> Dataset:
    """Personalized PageRank over the co-purchase graph, top-20 by rank
    (rank values rounded; rows-only check — iterative, not SQL)."""
    ranks = personalized_pagerank(copurchase_edges(sf_dir), [seed_part],
                                  alpha=0.85, iters=15)

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["rank"] = np.round(df["rank"], 8)
        return df

    from chameleon_entity_linking_ray.stages.agg import top_k
    return top_k(ranks.map_batches(shape, batch_format="pandas"),
                 by=["rank", "node"], ascending=[False, True], k=20)
