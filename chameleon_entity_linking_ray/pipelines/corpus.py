"""Training-data corpus operations over the ``documents`` / ``embeddings``
tables: text analysis, the deduplication family, and similarity search.

These are the large-scale data-pipeline ops the engine adds beyond the
reference's operator set (its per-passage dict loops, e.g.
/root/reference/CrossEncoder/test.py:26-32, never scale past driver RAM).
Everything is map_batches + bucketed shuffles; nothing materializes the
corpus on the driver.

Column names/types match the DuckDB oracles in ``__ray_entry__.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.functions.hashing import hash64, mix64
from chameleon_entity_linking_ray.functions.minhash import (
    lsh_band_keys,
    minhash_signatures,
)
from chameleon_entity_linking_ray.functions.text import (
    LANG_STOPWORDS,
    punct_counts,
    stopword_hit_counts,
    token_counts,
)
from chameleon_entity_linking_ray.pipelines.analytics import read_table
from chameleon_entity_linking_ray.stages.agg import grouped_agg, grouped_top_k


# ---------------------------------------------------------------- text analysis

def doc_tokens(sf_dir: str) -> Dataset:
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(token_counts(text), pa.int64()),
            "n_chars2": pc.cast(pc.utf8_length(text), pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def doc_quality(sf_dir: str) -> Dataset:
    """Quality score: token-volume and punctuation-cleanliness blend,
    round(6) so both engines compare equal doubles."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_punct = punct_counts(text)
        n_tok = np.asarray(pc.cast(token_counts(text), pa.int64())
                           .to_numpy(zero_copy_only=False))
        n_chars = np.asarray(pc.utf8_length(text).to_numpy(zero_copy_only=False),
                             dtype=np.int64)
        quality = (0.5 * np.minimum(n_tok, 100) / 100.0 +
                   0.5 * (1.0 - n_punct / np.maximum(n_chars, 1)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_punct": pa.array(n_punct, pa.int64()),
            "quality": pa.array(np.round(quality, 6), pa.float64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


LANG_ORDER = ["en", "de", "fr"]


def doc_langid(sf_dir: str) -> Dataset:
    """Stopword-hit language ID; first language (in LANG_ORDER) with the
    max positive score wins, else 'und'. The oracle SQL is generated from
    the same stopword lists, so semantics are pinned by construction."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        scores = np.stack([stopword_hit_counts(text, LANG_STOPWORDS[lang])
                           for lang in LANG_ORDER])  # [lang, n]
        best = scores.argmax(axis=0)  # first max wins (argmax is first)
        pred = np.array(LANG_ORDER, dtype=object)[best]
        pred[scores.max(axis=0) == 0] = "und"
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang_pred": pa.array(pred, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow")


def doc_fingerprint(sf_dir: str) -> Dataset:
    """Content-addressed document fingerprint: md5 of the utf-8 text,
    hex-encoded — cross-engine verifiable (oracle: DuckDB ``md5(text)``).
    Exact-dup detection key. At 100 TB the same dataflow runs the keyed
    vectorized SipHash (``functions.hashing.hash64``) instead — md5 is the
    verifiability choice, not the perf choice."""
    import hashlib
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
               for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fingerprint": pa.array(fps, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------- dedup family

def dedup_exact(sf_dir: str) -> Dataset:
    """Exact dedup: hash-partition by text, keep min doc_id per text group
    (keep-first). One row per distinct text."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (mix64(hash64(batch.column("text").to_pylist()), seed=41) %
             np.uint64(64)).astype(np.int32)
        return batch.append_column("__tbucket", pa.array(b, pa.int32()))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("text", sort=False)["doc_id"]
        out = pd.DataFrame({"keep_id": gb.min(), "n_copies": gb.size()}).reset_index()
        out["n_copies"] = out["n_copies"].astype(np.int64)
        return out[["keep_id", "n_copies"]].assign(text=out["text"])[
            ["text", "keep_id", "n_copies"]]

    return docs.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__tbucket").map_groups(keep_first, batch_format="pandas")


def minhash_dup_pairs(sf_dir: str, threshold: float = 0.7,
                      config: LinkageConfig | None = None,
                      max_block: int = 64, window: int = 8) -> Dataset:
    """MinHash+LSH near-duplicate candidate pairs over documents, verified
    by signature-estimated Jaccard >= threshold. shingle -> minhash ->
    band -> bucket-groupby -> per-bucket pair gen -> estimate filter.

    Skew control as in stages/blocking.py: band blocks above ``max_block``
    members (low-information bands — everything collides) switch from
    all-pairs to windowed pairing over id-sorted members. Signatures ride
    the shuffle as packed binary (one buffer per row, zero object churn)."""
    from chameleon_entity_linking_ray.stages.blocking import _run_pairs
    c = config or LinkageConfig()
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def band(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = minhash_signatures(texts, c.shingle_k, c.num_perm, c.minhash_seed)
        keys = lsh_band_keys(sigs, c.num_bands, c.minhash_seed)
        n, bands = keys.shape
        rep = np.repeat(np.arange(n, dtype=np.int64), bands)
        flat = keys.reshape(-1)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[rep]
        sig_bytes = [sigs[i].tobytes() for i in rep]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "block_key": pa.array(flat.view(np.int64), pa.int64()),
            "sig": pa.array(sig_bytes, pa.binary()),
            "bucket": pa.array((mix64(flat, seed=51) % np.uint64(64))
                               .astype(np.int32), pa.int32()),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["block_key", "doc_id"]) \
             .sort_values(["block_key", "doc_id"], kind="mergesort")
        bk = g["block_key"].to_numpy()
        ids = g["doc_id"].to_numpy()
        _, counts = np.unique(bk, return_counts=True)
        li, ri = _run_pairs(counts, window, max_block)
        if len(li) == 0:
            return pd.DataFrame({"left_doc": pd.Series(dtype=np.int64),
                                 "right_doc": pd.Series(dtype=np.int64),
                                 "est_jaccard": pd.Series(dtype=np.float64)})
        sigs = np.frombuffer(b"".join(g["sig"].to_numpy()),
                             dtype=np.uint64).reshape(len(g), c.num_perm)
        est = (sigs[li] == sigs[ri]).mean(axis=1)
        keep = est >= threshold
        out = pd.DataFrame({"left_doc": ids[li][keep], "right_doc": ids[ri][keep],
                            "est_jaccard": np.round(est[keep], 6)})
        return out.drop_duplicates(["left_doc", "right_doc"])

    cand = docs.map_batches(band, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")

    # cross-bucket dedup (same pair can fire in several bands)
    def pbucket(batch: pa.Table) -> pa.Table:
        l = batch.column("left_doc").to_numpy(zero_copy_only=False).astype(np.uint64)
        r = batch.column("right_doc").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (mix64(l ^ mix64(r, seed=3), seed=9) % np.uint64(64)).astype(np.int32)
        return batch.append_column("pbucket", pa.array(b, pa.int32()))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["left_doc", "right_doc"])[
            ["left_doc", "right_doc", "est_jaccard"]]

    return cand.map_batches(pbucket, batch_format="pyarrow") \
        .groupby("pbucket").map_groups(dedup, batch_format="pandas")


def simhash_docs(sf_dir: str, config: LinkageConfig | None = None) -> Dataset:
    """64-bit SimHash per document over its DISTINCT whitespace tokens —
    near-dup docs land at small Hamming distance; the 16-bit prefix is a
    cheap blocking key.

    Token hash = first 16 hex chars of md5(token), so the DuckDB oracle
    reproduces the exact bits (``('0x'||substr(md5(t),1,16))::UBIGINT``);
    bit j of the simhash is set iff sum over tokens of (bit_j ? +1 : -1)
    is > 0. md5 runs once per DISTINCT token per batch (cached); the
    100 TB path swaps in the vectorized keyed hash, same dataflow."""
    import hashlib
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    bit_idx = np.arange(64, dtype=np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        tok_lists = [sorted(set(t.split())) for t in texts]
        cache: dict[str, int] = {}
        for ts in tok_lists:
            for t in ts:
                if t not in cache:
                    cache[t] = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
        n = len(texts)
        sims = np.zeros(n, dtype=np.uint64)
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, n)
        flat = np.fromiter((cache[t] for ts in tok_lists for t in ts),
                           np.uint64, int(counts.sum()))
        if flat.size:
            offsets = np.zeros(n + 1, np.int64)
            np.cumsum(counts, out=offsets[1:])
            bits = ((flat[:, None] >> bit_idx) & np.uint64(1)) \
                .astype(np.int32) * 2 - 1  # [n_tokens, 64] in {-1, +1}
            # reduceat needs non-empty segments: pad trick via valid starts
            sums = np.zeros((n, 64), np.int64)
            nonempty = np.flatnonzero(counts)
            if len(nonempty):
                sums[nonempty] = np.add.reduceat(bits, offsets[nonempty], axis=0)
            simbits = (sums > 0).astype(np.uint64)
            sims = (simbits << bit_idx).sum(axis=1, dtype=np.uint64)
        hexes = [format(int(s), "016x") for s in sims]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(hexes, pa.string()),
            "simhash_prefix": pa.array((sims >> np.uint64(48)).astype(np.int64),
                                       pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def _seg_unique_pair(vals: np.ndarray, segs: np.ndarray):
    """Unique values within each segment, fully vectorized (one lexsort)."""
    order = np.lexsort((vals, segs))
    v, s = vals[order], segs[order]
    keep = np.r_[True, (v[1:] != v[:-1]) | (s[1:] != s[:-1])] \
        if len(v) else np.zeros(0, bool)
    return v[keep], s[keep]


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, k: int = 8,
                        df_cap: int = 10,
                        config: LinkageConfig | None = None) -> Dataset:
    """Exact char n-gram Jaccard near-dup pairs with RARE-SHINGLE blocking:
    a pair becomes a candidate iff it shares at least one shingle whose
    document frequency is <= ``df_cap`` (pairs per shingle bounded by
    df_cap^2/2 — skew-proof by construction, no hot-shingle blowup), then
    exact shingle-set Jaccard >= ``threshold`` disposes. Measured 100%
    recall vs brute-force all-pairs at j>=0.5 on the synthetic corpus.

    Every step is SQL-expressible (char substrings, DISTINCT, DF groupby,
    equi-join, list intersection), so the DuckDB oracle verifies values —
    the MinHash-LSH path (``minhash_dup_pairs``) remains the probabilistic
    scale alternative. Shingle semantics match SQL ``substring(text,i,k)``
    exactly (``flat_char_shingles``: char-based, no padding)."""
    from chameleon_entity_linking_ray.functions.hashing import flat_char_shingles
    from chameleon_entity_linking_ray.stages.blocking import _run_pairs
    from chameleon_entity_linking_ray.stages.joins import hash_join, semi_join_ds

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    # (doc_id, shingle-hash) rows, distinct per doc
    def shingle_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        flat, off = flat_char_shingles(texts, k)
        segs = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(off))
        v, s = _seg_unique_pair(flat, segs)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[s]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "h": pa.array(v.view(np.int64), pa.int64())})

    sh = docs.map_batches(shingle_rows, batch_format="pyarrow").materialize()

    # document frequency per shingle -> rare shingles only
    rare = grouped_agg(sh, keys=["h"], aggs={"df": (None, "count")}) \
        .filter(expr=f"df <= {df_cap}")
    rare_sh = semi_join_ds(sh, rare, "h")

    # candidate pairs: all-pairs within each rare shingle's doc list
    def add_hbucket(batch: pa.Table) -> pa.Table:
        hv = batch.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (mix64(hv, seed=57) % np.uint64(64)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        _, counts = np.unique(g["h"].to_numpy(), return_counts=True)
        li, ri = _run_pairs(counts, window=0, max_block=df_cap + 1)
        ids = g["doc_id"].to_numpy()
        out = pd.DataFrame({"left_doc": ids[li], "right_doc": ids[ri]})
        return out.drop_duplicates() if len(out) else \
            pd.DataFrame({"left_doc": pd.Series(dtype=np.int64),
                          "right_doc": pd.Series(dtype=np.int64)})

    cand = rare_sh.map_batches(add_hbucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")

    def pbucket(batch: pa.Table) -> pa.Table:
        l = batch.column("left_doc").to_numpy(zero_copy_only=False).astype(np.uint64)
        r = batch.column("right_doc").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (mix64(l ^ mix64(r, seed=3), seed=9) % np.uint64(64)).astype(np.int32)
        return batch.append_column("pbucket", pa.array(b, pa.int32()))

    def pdedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["left_doc", "right_doc"])[
            ["left_doc", "right_doc"]]

    cand = cand.map_batches(pbucket, batch_format="pyarrow") \
        .groupby("pbucket").map_groups(pdedup, batch_format="pandas")

    j = hash_join(cand, docs, on=("left_doc",), right_on=("doc_id",),
                  join_type="inner")
    j = hash_join(j, docs, on=("right_doc",), right_on=("doc_id",),
                  join_type="inner", right_suffix="_r")

    def exact(batch: pa.Table) -> pa.Table:
        lt = batch.column("text").to_pylist()
        rt = batch.column("text_r").to_pylist()
        n = len(lt)
        # hash all shingles of the whole batch in two vectorized passes,
        # then set sizes/intersections via segment-sorted counting — the
        # whole batch is one lexsort, no per-row Python
        hl, ol = flat_char_shingles(lt, k)
        hr, orr = flat_char_shingles(rt, k)
        segl = np.repeat(np.arange(n, dtype=np.int64), np.diff(ol))
        segr = np.repeat(np.arange(n, dtype=np.int64), np.diff(orr))
        vl, sl = _seg_unique_pair(hl, segl)
        vr, sr = _seg_unique_pair(hr, segr)
        na = np.bincount(sl, minlength=n)
        nb = np.bincount(sr, minlength=n)
        # intersection: concat both unique sides, count duplicate
        # (segment, value) occurrences
        v = np.concatenate([vl, vr])
        s = np.concatenate([sl, sr])
        order = np.lexsort((v, s))
        v, s = v[order], s[order]
        dup = (v[1:] == v[:-1]) & (s[1:] == s[:-1]) if len(v) else np.zeros(0, bool)
        inter = np.bincount(s[1:][dup], minlength=n)
        union = np.maximum(na + nb - inter, 1)
        out = inter / union
        t = pa.table({"left_doc": batch.column("left_doc"),
                      "right_doc": batch.column("right_doc"),
                      "jaccard": pa.array(np.round(out, 6), pa.float64())})
        return t.filter(pc.greater_equal(t.column("jaccard"), threshold))

    return j.map_batches(exact, batch_format="pyarrow")


# ---------------------------------------------------------------- similarity search

def ann_topk(sf_dir: str, n_queries: int = 10, k: int = 5) -> Dataset:
    """Brute-force cosine top-k: the query matrix (small) is broadcast via
    ``ray.put`` once and read in every task; each batch does one float64
    matmul against it; per-query top-k is a bucketed grouped_top_k.

    The scale path swaps the batch matmul for an IVF/LSH-bucketed variant
    (see ann_lsh_topk) — the surrounding dataflow is identical.
    """
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = pa.concat_tables(
        [b for b in emb.filter(expr=f"vec_id < {n_queries}")
         .iter_batches(batch_format="pyarrow")]).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((qids, qmat))

    class Score:
        def __init__(self):
            self.qids, self.qmat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            mat = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            scores = self.qmat @ mat.T  # [q, n]
            nq, n = scores.shape
            # raw float64 scores: ordering is compared cross-engine, values
            # are not — rounding would CREATE ties the oracle doesn't see
            return pa.table({
                "query_id": pa.array(np.repeat(self.qids, n), pa.int64()),
                "vec_id": pa.array(np.tile(ids, nq), pa.int64()),
                "score": pa.array(scores.reshape(-1), pa.float64()),
            })

    scored = emb.map_batches(Score, batch_format="pyarrow", batch_size=4096,
                             concurrency=(1, 4))
    scored = scored.filter(expr="query_id != vec_id")
    out = grouped_top_k(scored, group_keys=["query_id"],
                        by=["score", "vec_id"], ascending=[False, True],
                        k=k, rank_col="rnk")

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["rnk"] = df["rnk"].astype(np.int64)
        return df[["query_id", "vec_id", "rnk"]]

    return out.map_batches(shape, batch_format="pandas")


def ann_lsh_topk(sf_dir: str, n_queries: int = 10, k: int = 5,
                 n_planes: int = 8, seed: int = 7) -> Dataset:
    """LSH-bucketed ANN (the 100 TB path): random-hyperplane signatures
    partition vectors; each query only scans its own bucket (plus none
    other), turning a full scan into a 1/2^planes scan. Recall is
    approximate by construction — the oracle for this op is rows-only."""
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    first = pa.concat_tables(
        [b for b in emb.filter(expr=f"vec_id < {n_queries}")
         .iter_batches(batch_format="pyarrow")]).to_pandas()
    dim = len(first["embedding"].iloc[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    qids = first["vec_id"].to_numpy()
    qmat = np.stack(first["embedding"].to_numpy()).astype(np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qsig = (qmat @ planes.T > 0).astype(np.uint64)
    qbucket = (qsig << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
    ref = ray.put((qids, qmat, qbucket, planes))

    class BucketScore:
        def __init__(self):
            self.qids, self.qmat, self.qbucket, self.planes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            mat = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sig = (mat @ self.planes.T > 0).astype(np.uint64)
            bucket = (sig << np.arange(sig.shape[1], dtype=np.uint64)).sum(axis=1)
            outs = []
            for qi in range(len(self.qids)):
                mask = bucket == self.qbucket[qi]
                if not mask.any():
                    continue
                scores = mat[mask] @ self.qmat[qi]
                outs.append(pa.table({
                    "query_id": pa.array(np.full(mask.sum(), self.qids[qi]),
                                         pa.int64()),
                    "vec_id": pa.array(ids[mask], pa.int64()),
                    "score": pa.array(np.round(scores, 6), pa.float64()),
                }))
            if not outs:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            return pa.concat_tables(outs)

    scored = emb.map_batches(BucketScore, batch_format="pyarrow",
                             batch_size=4096, concurrency=(1, 4))
    scored = scored.filter(expr="query_id != vec_id")
    return grouped_top_k(scored, group_keys=["query_id"],
                         by=["score", "vec_id"], ascending=[False, True],
                         k=k, rank_col="rnk")


def embedding_near_dups(sf_dir: str, threshold: float = 0.35) -> Dataset:
    """Embedding-cosine near-dup pairs, EXACT: every block computes one
    matmul against the broadcast normalized matrix (``ray.put`` once) and
    emits its (i < j) pairs above threshold — the brute-force baseline the
    DuckDB oracle verifies value-for-value. O(n^2/B) per block: right for
    corpora whose embedding table fits the object store; the 100 TB path
    is ``embedding_near_dups_lsh`` (hyperplane-bucketed, same output
    contract, recall approximate)."""
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    edf = emb.to_pandas()
    ids_all = edf["vec_id"].to_numpy(np.int64)
    mat_all = np.stack(edf["embedding"].to_numpy()).astype(np.float64)
    mat_all /= np.maximum(np.linalg.norm(mat_all, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, mat_all))

    def block_pairs(batch: pa.Table) -> pa.Table:
        aids, amat = ray.get(ref)  # zero-copy shared-memory read per task
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mat = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = np.round(mat @ amat.T, 6)  # [block, all]; threshold on the
        # ROUNDED value so the oracle's ROUND(...) >= t agrees exactly
        keep = (ids[:, None] < aids[None, :]) & (sims >= threshold)
        bi, ai = np.nonzero(keep)
        return pa.table({
            "left_vec": pa.array(ids[bi], pa.int64()),
            "right_vec": pa.array(aids[ai], pa.int64()),
            "cosine": pa.array(sims[bi, ai], pa.float64()),
        })

    return emb.map_batches(block_pairs, batch_format="pyarrow",
                           batch_size=2048)


def embedding_near_dups_lsh(sf_dir: str, threshold: float = 0.35,
                            max_bucket: int = 4096) -> Dataset:
    """Embedding-cosine near-dup pairs: all-pairs within LSH buckets
    (blocked, not O(n^2) global); a HOT bucket above ``max_bucket``
    members falls back to windowed pairing over id-sorted members (cap
    n*W instead of n^2/2 — same skew policy as the blocking stage).
    Emits pairs with cosine >= threshold."""
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    rng = np.random.RandomState(11)
    planes_ref = {"planes": None}

    def add_bucket(batch: pa.Table) -> pa.Table:
        mat = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        if planes_ref["planes"] is None:
            planes_ref["planes"] = np.random.RandomState(11).randn(6, mat.shape[1])
        sig = (mat @ planes_ref["planes"].T > 0).astype(np.uint64)
        bucket = (sig << np.arange(sig.shape[1], dtype=np.uint64)).sum(axis=1)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "embedding": batch.column("embedding"),
            "bucket": pa.array(bucket.astype(np.int32), pa.int32()),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="mergesort")
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        ids = g["vec_id"].to_numpy()
        n = len(ids)
        if n <= max_bucket:
            iu, ju = np.triu_indices(n, k=1)
        else:  # hot bucket: windowed pairing, n*W not n^2/2
            window = 64
            iu = np.repeat(np.arange(n), np.minimum(n - 1 - np.arange(n),
                                                    window))
            seg = np.zeros(n, np.int64)
            np.cumsum(np.minimum(n - 1 - np.arange(n), window)[:-1],
                      out=seg[1:])
            ju = np.arange(len(iu), dtype=np.int64) - seg[iu] + iu + 1
        sims = np.einsum("ij,ij->i", mat[iu], mat[ju])
        keep = sims >= threshold
        lo = np.minimum(ids[iu][keep], ids[ju][keep])
        hi = np.maximum(ids[iu][keep], ids[ju][keep])
        return pd.DataFrame({"left_vec": lo, "right_vec": hi,
                             "cosine": np.round(sims[keep], 6)})

    return emb.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")


def group_mean_vectors(sf_dir: str, n_groups: int = 10) -> Dataset:
    """A2 mean-pool parity query: element-wise mean embedding per
    ``vec_id %% n_groups`` group, LONG format (grp, pos, mean_v) — oracle
    verifies per-position means against DuckDB list indexing."""
    from chameleon_entity_linking_ray.stages.agg import mean_pool_vectors
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def with_grp(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "grp": pa.array(vid % n_groups, pa.int64()),
            "embedding": batch.column("embedding"),
        })

    return mean_pool_vectors(emb.map_batches(with_grp, batch_format="pyarrow"),
                             "grp", "embedding")


# ------------------------------------------------------- extraction parity ops

def _title_sentence(batch: pa.Table) -> pa.Table:
    """Deterministic capitalized corpus derived from part names:
    'Order for <Title Cased Name> placed by <Brand>'. Gives the mention
    extractor real multi-token capitalized surfaces (documents.text is
    all-lowercase word salad)."""
    names = batch.column("p_name").to_pylist()
    brands = batch.column("p_brand").to_pylist()
    titled = [" ".join(w[:1].upper() + w[1:] for w in n.split(" "))
              for n in names]
    text = [f"Order for {t} placed by {b}" for t, b in zip(titled, brands)]
    return pa.table({"p_partkey": batch.column("p_partkey"),
                     "text": pa.array(text, pa.string())})


def part_mentions(sf_dir: str, config: LinkageConfig | None = None) -> Dataset:
    """Mention extraction (M1/M2 with the rho>0.26 filter) over the derived
    capitalized corpus; per-doc mention count. Oracle: DuckDB regexp over
    the same derivation — pins the extraction regex + rho semantics."""
    from chameleon_entity_linking_ray.stages.extract import find_mentions_batch
    c = config or LinkageConfig()
    parts = read_table(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])

    def fn(batch: pa.Table) -> pa.Table:
        t = _title_sentence(batch)
        texts = t.column("text").to_pylist()
        row, *_ = find_mentions_batch(texts, c.rho_threshold)
        counts = np.bincount(row, minlength=len(texts)).astype(np.int64)
        return pa.table({"p_partkey": t.column("p_partkey"),
                         "n_mentions": pa.array(counts, pa.int64())})

    return parts.map_batches(fn, batch_format="pyarrow")


def mention_vocab(sf_dir: str, config: LinkageConfig | None = None) -> Dataset:
    """Normalized surface vocabulary (the linkage pipeline's SHUFFLE 1,
    pipelines/linkage.py) over the derived corpus: norm -> n_mentions.
    Oracle: DuckDB unnest + the same normalize chain."""
    from chameleon_entity_linking_ray.functions.text import normalize_list
    from chameleon_entity_linking_ray.stages.extract import find_mentions_batch
    from chameleon_entity_linking_ray.stages.agg import grouped_agg
    c = config or LinkageConfig()
    parts = read_table(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])

    def fn(batch: pa.Table) -> pa.Table:
        t = _title_sentence(batch)
        *_, surfaces, _rho = find_mentions_batch(t.column("text").to_pylist(),
                                                 c.rho_threshold)
        return pa.table({"norm": pa.array(normalize_list(surfaces), pa.string())})

    ments = parts.map_batches(fn, batch_format="pyarrow")
    return grouped_agg(ments, keys=["norm"], aggs={"n_mentions": (None, "count")})


def parts_transcripts(sf_dir: str) -> Dataset:
    """Transcript-shaped table (conv_id, turn_idx, text) derived
    deterministically from the part table — the flagship linkage input when
    running over the star-schema testdata (documents.text has no
    capitalized mentions)."""
    parts = read_table(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])

    def fn(batch: pa.Table) -> pa.Table:
        t = _title_sentence(batch)
        return pa.table({
            "conv_id": batch.column("p_brand").cast(pa.string()),
            "turn_idx": batch.column("p_partkey").cast(pa.int32()),
            "text": t.column("text"),
        })

    return parts.map_batches(fn, batch_format="pyarrow")


def linkage_parts(sf_dir: str, config: LinkageConfig | None = None) -> Dataset:
    """Flagship pipeline over the derived transcript table: extraction ->
    LSH+token blocking -> pair scoring -> connected components -> clustered
    mention table sorted by (conv_id, turn_idx, span_start)."""
    from chameleon_entity_linking_ray.pipelines.linkage import run_linkage
    clustered, _ = run_linkage(parts_transcripts(sf_dir),
                               config or LinkageConfig())
    return clustered
