"""Transitive clustering: distributed connected components over matched pairs.

The engine generalization of the reference's per-query dedup/merge logic
(SURVEY.md §2.7): matched pairs (score > theta) are edges; clusters are the
connected components; cluster_id = min node id in the component.

Algorithm: alternating large-star / small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond" — see PAPERS.md), expressed
entirely as BUCKETED Ray Data shuffles: each star step is one
``groupby(bucket).map_groups`` where bucket = hash(u) % B, so the Python
callback runs once per bucket and the per-node min-neighbor computation is a
vectorized pandas ``groupby('u').transform('min')`` inside. No joins, no
per-node Python calls, O(log n) rounds, nothing driver-side except an
order-independent checksum per round for fixpoint detection.

A driver union-find fast path handles provably-small edge sets (matched
pairs after thresholding are a small fraction of the input) in one pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from chameleon_entity_linking_ray.functions.hashing import mix64

_M64 = (1 << 64) - 1


def _sym_with_bucket(edges: Dataset, num_buckets: int) -> Dataset:
    """(u,v) -> both directions, plus bucket = hash(u) % B."""

    def expand(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        uu = np.concatenate([u, v])
        vv = np.concatenate([v, u])
        b = (mix64(uu.astype(np.uint64), seed=13) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({"u": pa.array(uu, pa.int64()),
                         "v": pa.array(vv, pa.int64()),
                         "bucket": pa.array(b, pa.int32())})

    return edges.map_batches(expand, batch_format="pyarrow")


_EMPTY_EDGES = {"u": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.int64)}


def _large_star_fn(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket: for each node u, connect neighbors v > u to
    m = min(neighbors(u) + {u}). Vectorized via groupby-transform."""
    m = g.groupby("u")["v"].transform("min")
    m = np.minimum(m.to_numpy(), g["u"].to_numpy())
    keep = g["v"].to_numpy() > g["u"].to_numpy()
    out_u = g["v"].to_numpy()[keep]
    out_v = m[keep]
    ok = out_u != out_v
    df = pd.DataFrame({"u": out_u[ok], "v": out_v[ok]})
    return df if len(df) else pd.DataFrame(_EMPTY_EDGES)


def _small_star_fn(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket: for each node u, connect smaller neighbors (and u itself)
    to m = min(smaller-neighbors + {u})."""
    g = g[g["v"].to_numpy() < g["u"].to_numpy()]
    if not len(g):
        return pd.DataFrame(_EMPTY_EDGES)
    m = g.groupby("u")["v"].transform("min")
    m = np.minimum(m.to_numpy(), g["u"].to_numpy())
    # (v, m) for each smaller neighbor + (u, m) once per u
    per_u = pd.DataFrame({"u": g["u"].to_numpy(), "v": m}).drop_duplicates("u")
    out_u = np.concatenate([g["v"].to_numpy(), per_u["u"].to_numpy()])
    out_v = np.concatenate([m, per_u["v"].to_numpy()])
    ok = out_u != out_v
    df = pd.DataFrame({"u": out_u[ok], "v": out_v[ok]})
    return df if len(df) else pd.DataFrame(_EMPTY_EDGES)


def _star_step(edges: Dataset, fn, num_buckets: int) -> Dataset:
    return _sym_with_bucket(edges, num_buckets).groupby("bucket") \
        .map_groups(fn, batch_format="pandas")


def _canon_dedup(edges: Dataset, num_buckets: int) -> Dataset:
    """Canonicalize to (u=min, v=max), drop self-loops, exact-dedup —
    bucketed by pair hash, vectorized drop_duplicates per bucket."""

    def canon(batch: pa.Table) -> pa.Table:
        u = batch.column("u")
        v = batch.column("v")
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"u": lo, "v": hi})
        t = t.filter(pc.not_equal(t.column("u"), t.column("v")))
        h = mix64(t.column("u").to_numpy(zero_copy_only=False).astype(np.uint64) ^
                  mix64(t.column("v").to_numpy(zero_copy_only=False).astype(np.uint64), seed=3),
                  seed=7)
        return t.append_column("bucket", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int32), pa.int32()))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["u", "v"])[["u", "v"]]
        return out if len(out) else pd.DataFrame(_EMPTY_EDGES)

    return edges.map_batches(canon, batch_format="pyarrow") \
        .groupby("bucket").map_groups(dedup, batch_format="pandas")


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


def _unionfind_assignments(edges: Dataset) -> Dataset:
    """Driver CC over a provably-small edge set — fully VECTORIZED min-label
    propagation with pointer jumping (no per-edge Python loop; ~10 O(E)
    numpy rounds for 1M edges): avoids the per-round shuffles when the
    matched-pair set fits one process. cluster = min node in component
    (labels start as compact indices of the SORTED node array, so the
    minimum label is the minimum node id)."""
    import ray.data

    parts_u, parts_v = [], []
    for batch in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        parts_u.append(batch.column("u").to_numpy(zero_copy_only=False))
        parts_v.append(batch.column("v").to_numpy(zero_copy_only=False))
    if not parts_u or not sum(len(p) for p in parts_u):
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype=np.int64), "cluster": pd.Series(dtype=np.int64)}))
    u = np.concatenate(parts_u)
    v = np.concatenate(parts_v)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        # scatter the edge-wise min label to both endpoints
        mn = np.minimum(label[ui], label[vi])
        before = label.copy()
        np.minimum.at(label, ui, mn)
        np.minimum.at(label, vi, mn)
        # pointer jumping: collapse label chains to their roots
        while True:
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, before):
            break
    return ray.data.from_pandas(pd.DataFrame({
        "node": nodes, "cluster": nodes[label]}))


def connected_components(edges: Dataset, num_partitions: int = 32,
                         max_rounds: int = 50,
                         driver_threshold: int = 2_000_000,
                         checkpoint_dir: str | None = None,
                         checkpoint_token: str = "",
                         _fail_after_round: int | None = None
                         ) -> tuple[Dataset, dict]:
    """edges(u:int64, v:int64) -> (assignments(node:int64, cluster:int64), stats).

    ``assignments`` covers every node that appears in an edge; singleton
    nodes (no edges) are their own cluster — callers fill them at join-back
    time (see pipelines/linkage.py). cluster = min node id in the component.

    Two execution paths:
    - edge count <= ``driver_threshold``: single-pass union-find streamed on
      the driver.
    - larger: fully distributed alternating star loop — O(log n) rounds of
      bucketed groupby shuffles; nothing driver-side but a checksum.

    With ``checkpoint_dir`` set (star path only — the driver-UF path is a
    single pass), every star round's contracted edge set is a per-round
    Parquet checkpoint whose manifest entry carries the round counter and
    the round's multiset checksum (lineage + metrics); a re-run with the
    same ``checkpoint_token`` after a mid-loop kill resumes from the
    latest completed round without touching the input edge stream.
    ``_fail_after_round`` is the resume test's fault-injection hook."""
    mgr = None
    if checkpoint_dir is not None:
        from chameleon_entity_linking_ray.state.checkpoint import (
            CheckpointManager,
            fingerprint,
        )
        mgr = CheckpointManager(
            checkpoint_dir,
            fingerprint("cc-star", num_partitions, max_rounds,
                        driver_threshold, checkpoint_token))

    start_round = 1
    prev = None
    n_edges = -1
    edges_m = None
    if mgr is not None:
        done = sorted(int(s.rsplit("_", 1)[1])
                      for s in mgr.manifest["stages"]
                      if s.startswith("star_round_") and mgr.has(s))
        if done:
            latest = done[-1]
            ent = mgr.manifest["stages"][f"star_round_{latest:03d}"]
            edges_m = mgr.load(f"star_round_{latest:03d}").materialize()
            prev = tuple(ent["checksum"])
            n_edges = int(ent["input_edges"])
            start_round = latest + 1
        elif mgr.has("canon_init"):
            ent = mgr.manifest["stages"]["canon_init"]
            edges_m = mgr.load("canon_init").materialize()
            prev = tuple(ent["checksum"])
            n_edges = int(ent["input_edges"])

    if edges_m is None:
        import time as _time

        n_edges = edges.count()
        if n_edges <= driver_threshold:
            return _unionfind_assignments(edges), {
                "cc_rounds": 0, "cc_mode": "unionfind", "cc_edges": n_edges,
                "cc_converged": True}

        # materialize() per round truncates the lazy lineage — without it
        # every checksum re-executes all previous rounds. The edge table is
        # the only pinned intermediate and shrinks toward one row per
        # non-root node.
        t0 = _time.time()
        edges_m = _canon_dedup(edges, num_partitions).materialize()
        prev = _checksum(edges_m)
        if mgr is not None:
            edges_m = mgr.save(
                "canon_init", edges_m, upstream=["input_edges"], t_start=t0,
                extra={"checksum": [int(prev[0]), int(prev[1])],
                       "input_edges": int(n_edges)}).materialize()

    edges = edges_m
    rounds = start_round - 1
    converged = False
    for rounds in range(start_round, max_rounds + 1):
        import time as _time
        t0 = _time.time()
        e = _star_step(edges, _large_star_fn, num_partitions)
        e = _star_step(e, _small_star_fn, num_partitions)
        e = _canon_dedup(e, num_partitions).materialize()
        cur = _checksum(e)
        if mgr is not None:
            upstream = [f"star_round_{rounds - 1:03d}"] if rounds > 1 \
                else ["canon_init"]
            e = mgr.save(
                f"star_round_{rounds:03d}", e, upstream=upstream,
                t_start=t0,
                extra={"round": rounds,
                       "checksum": [int(cur[0]), int(cur[1])],
                       "input_edges": int(n_edges)}).materialize()
            if _fail_after_round is not None and rounds >= _fail_after_round:
                raise RuntimeError(
                    f"injected failure after star round {rounds}")
        edges = e
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # assignments extracted from a non-converged edge set can split a
        # component — surface it loudly instead of returning silently
        import warnings
        warnings.warn(
            f"connected_components hit max_rounds={max_rounds} without "
            "checksum fixpoint; assignments may split components "
            "(raise max_rounds)", RuntimeWarning)

    # converged: every canonical edge is (root=u, leaf=v).
    def leaf_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("v"), "cluster": batch.column("u")})

    def root_rows(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["u"])
        return pd.DataFrame({"node": out["u"].to_numpy(),
                             "cluster": out["u"].to_numpy()})

    def add_root_bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (mix64(u, seed=17) % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    leaves = edges.map_batches(leaf_rows, batch_format="pyarrow")
    roots = edges.map_batches(add_root_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(root_rows, batch_format="pandas")
    assignments = leaves.union(roots)
    return assignments, {"cc_rounds": rounds, "cc_mode": "star",
                         "cc_edges": n_edges, "cc_converged": converged}


def attach_assignments(ds: Dataset, assignments: Dataset, id_col: str,
                       broadcast_threshold: int = 4_000_000,
                       num_partitions: int = 32) -> Dataset:
    """Attach CC cluster assignments to a row stream: ds + ``cluster_id``
    (component min-id; own id for singletons) + ``keep`` (is this row the
    component's canonical record).

    The threshold-or-join pattern shared with
    ``pipelines/linkage.assign_clusters``: up to ``broadcast_threshold``
    assignment rows the (node, cluster) map is broadcast ONCE via
    ``ray.put`` and probed with a per-batch sorted-array binary search —
    zero shuffle on the big side; beyond that (a 100 TB corpus with a
    high dup rate makes the assignment table proportional to the
    duplicated-row count, far past driver RAM) the bucketed
    ``hash_join`` takes over and the big side shuffles once.
    """
    import ray

    from chameleon_entity_linking_ray.stages.joins import hash_join

    n_assign = assignments.count()

    if n_assign == 0:
        def own_cluster(batch: pa.Table) -> pa.Table:
            ids = pc.cast(batch.column(id_col), pa.int64())
            out = batch.append_column("cluster_id", ids)
            return out.append_column(
                "keep", pa.array(np.ones(batch.num_rows, bool)))

        return ds.map_batches(own_cluster, batch_format="pyarrow")

    if n_assign <= broadcast_threshold:
        adf = assignments.to_pandas()
        nodes = adf["node"].to_numpy(np.int64)
        order_ix = np.argsort(nodes, kind="mergesort")
        ref = ray.put((nodes[order_ix],
                       adf["cluster"].to_numpy(np.int64)[order_ix]))

        def attach(batch: pa.Table) -> pa.Table:
            snodes, sclusters = ray.get(ref)
            ids = pc.cast(batch.column(id_col), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            pos = np.searchsorted(snodes, ids)
            pos = np.minimum(pos, max(len(snodes) - 1, 0))
            hit = (snodes[pos] == ids) if len(snodes) \
                else np.zeros(len(ids), bool)
            cluster = np.where(hit, sclusters[pos], ids)
            out = batch.append_column(
                "cluster_id", pa.array(cluster.astype(np.int64)))
            return out.append_column("keep",
                                     pa.array(cluster == ids, pa.bool_()))

        return ds.map_batches(attach, batch_format="pyarrow")

    joined = hash_join(ds, assignments, on=(id_col,), right_on=("node",),
                       join_type="left_outer",
                       num_partitions=num_partitions)

    def finalize(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_col), pa.int64())
        cluster = pc.cast(pc.coalesce(batch.column("cluster"), ids),
                          pa.int64())
        out = batch.drop_columns(["cluster"]) \
            .append_column("cluster_id", cluster)
        return out.append_column("keep", pc.equal(cluster, ids))

    return joined.map_batches(finalize, batch_format="pyarrow")
