"""Pairwise scoring — the stateful actor-pool stage.

Reproduces the reference's retrieve-then-rerank semantics with the same
call shape a GPU model stage would have: a callable CLASS passed to
``map_batches(PairScorer, concurrency=N, batch_size=B)`` whose ``__init__``
does the one-time setup (model-load analog: fetching the broadcast IDF
tables from the object store, priming caches) and whose ``__call__`` scores
an Arrow batch of candidate pairs.

Stage anatomy, mirroring the reference:
- **retrieve prefilter** (bi-encoder analog, /root/reference/BiEncoder/
  model.py:68-166): MinHash-estimated Jaccard — pairs below ``prefilter``
  skip the expensive path entirely.
- **rerank** (cross-encoder analog, /root/reference/CrossEncoder/
  model.py:36-62): ``text_score`` = IDF-weighted Monge-Elkan token
  alignment with edit-distance token similarity (the classic soft-TFIDF
  record-linkage scorer); ``entity_score`` = IDF-weighted hashed char-ngram
  cosine. Blended ``0.9*text + 0.1*entity`` exactly as
  /root/reference/BiEncoder/test.py:120.

Because scoring runs over DISTINCT surface pairs (see stages/vocab.py) the
per-pair token alignment cost is paid once per unique string pair; the
actor additionally memoizes token-pair similarities and per-surface token
decompositions across batches (state amortization — the point of the actor
pool). Swap in a real model by implementing the same protocol.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.functions.hashing import flat_ngram_hashes, hash64, mix64
from chameleon_entity_linking_ray.functions.minhash import (
    cosine_rows,
    estimate_jaccard,
    minhash_signatures,
)
from chameleon_entity_linking_ray.stages.stats import IdfStats

PREFILTER_DEFAULT = 0.03


def edit_similarity(a: str, b: str) -> float:
    """Normalized Levenshtein similarity with prefix/abbreviation boost:
    "ind" ~ "industries" -> 0.92 (abbreviation), "wbyne" ~ "wayne" -> 0.8."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if a.startswith(b) or b.startswith(a):
        return 0.92 if min(la, lb) >= 3 else 0.7
    if abs(la - lb) > 3:
        return 0.0
    prev = list(range(lb + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * lb
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return max(0.0, 1.0 - prev[lb] / max(la, lb))


def weighted_ngram_features(texts: list[str], dim: int, k: int, seed: int,
                            stats: IdfStats | None) -> np.ndarray:
    """L2-normalized hashed char-ngram vectors, IDF-weighted when stats given."""
    flat, offsets = flat_ngram_hashes(texts, k)
    n = len(offsets) - 1
    mat = np.zeros((n, dim), dtype=np.float32)
    if flat.size:
        cols = (mix64(flat, seed=seed) % np.uint64(dim)).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        w = stats.ngram_weights(flat) if stats is not None else np.ones(flat.size, np.float32)
        np.add.at(mat, (rows, cols), w)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    np.divide(mat, norms, out=mat, where=norms > 0)
    return mat


class PairScorer:
    def __init__(self, config: LinkageConfig | None = None,
                 stats_ref=None, prefilter: float = PREFILTER_DEFAULT):
        # runs ONCE per actor: fetch broadcast IDF tables (model-load analog)
        self.c = config or LinkageConfig()
        self.stats: IdfStats | None = ray.get(stats_ref) if stats_ref is not None else None
        self.prefilter = prefilter
        self._tok_cache: dict[str, tuple[list[str], np.ndarray]] = {}
        self._sim_cache: dict[tuple[str, str], float] = {}
        # memo caches are bounded: an actor lives for the whole stage, and
        # at 1e12-scale vocabularies unbounded memos are an OOM; reset-on-cap
        # keeps amortization within a working set without LRU bookkeeping
        self._cache_cap = 2_000_000

    def _tokens(self, text: str) -> tuple[list[str], np.ndarray]:
        hit = self._tok_cache.get(text)
        if hit is None:
            if len(self._tok_cache) >= self._cache_cap:
                self._tok_cache.clear()
            toks = text.split()
            if self.stats is not None and toks:
                w = self.stats.token_weights(hash64(toks)).astype(np.float64)
            else:
                w = np.ones(len(toks), dtype=np.float64)
            hit = (toks, w)
            self._tok_cache[text] = hit
        return hit

    def _tsim(self, a: str, b: str) -> float:
        key = (a, b) if a < b else (b, a)
        v = self._sim_cache.get(key)
        if v is None:
            if len(self._sim_cache) >= self._cache_cap:
                self._sim_cache.clear()
            v = edit_similarity(key[0], key[1])
            self._sim_cache[key] = v
        return v

    def _monge_elkan(self, left: str, right: str) -> float:
        """Symmetrized IDF-weighted Monge-Elkan token alignment (min of the
        two directions — the conservative choice for precision)."""
        lt, lw = self._tokens(left)
        rt, rw = self._tokens(right)
        if not lt or not rt:
            return 0.0

        def side(xs, ws, ys):
            num = den = 0.0
            for x, w in zip(xs, ws):
                num += w * max(self._tsim(x, y) for y in ys)
                den += w
            return num / den if den else 0.0

        return min(side(lt, lw, rt), side(rt, rw, lt))

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = self.c
        left = batch.column("left_text").to_pylist()
        right = batch.column("right_text").to_pylist()
        n = len(left)
        if n == 0:
            empty = pa.array([], pa.float32())
            return (batch.append_column("text_score", empty)
                    .append_column("entity_score", empty)
                    .append_column("score", empty))

        # --- retrieve prefilter (bi-encoder analog) ---
        sig_l = minhash_signatures(left, c.shingle_k, c.num_perm, c.minhash_seed)
        sig_r = minhash_signatures(right, c.shingle_k, c.num_perm, c.minhash_seed)
        jac = estimate_jaccard(sig_l, sig_r)
        # token-block pairs share a whole token: always worth reranking
        shares_token = np.fromiter(
            (not set(l.split()).isdisjoint(r.split()) for l, r in zip(left, right)),
            dtype=bool, count=n)
        survivors = np.flatnonzero((jac >= self.prefilter) | shares_token)

        text_score = np.zeros(n, dtype=np.float32)
        entity_score = np.zeros(n, dtype=np.float32)
        if survivors.size:
            sl = [left[i] for i in survivors]
            sr = [right[i] for i in survivors]
            # --- rerank (cross-encoder analog) ---
            text_score[survivors] = np.fromiter(
                (self._monge_elkan(a, b) for a, b in zip(sl, sr)),
                dtype=np.float32, count=len(sl))
            fl = weighted_ngram_features(sl, c.feature_dim, c.shingle_k,
                                         c.minhash_seed, self.stats)
            fr = weighted_ngram_features(sr, c.feature_dim, c.shingle_k,
                                         c.minhash_seed, self.stats)
            entity_score[survivors] = cosine_rows(fl, fr)

        score = (c.text_weight * text_score + c.entity_weight * entity_score).astype(np.float32)
        return (batch
                .append_column("text_score", pa.array(text_score, pa.float32()))
                .append_column("entity_score", pa.array(entity_score, pa.float32()))
                .append_column("score", pa.array(score, pa.float32())))
