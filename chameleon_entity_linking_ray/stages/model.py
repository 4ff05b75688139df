"""Synthetic-weight transformer scorer — the REAL-MODEL path through the
scoring actor pool.

The sandbox has no torch / transformers and no network, so the model is a
pure-numpy transformer encoder whose weights are drawn ONCE from a seeded
generator on the driver and broadcast via ``ray.put`` — every mechanical
element of a production model stage is real and exercised end-to-end:

- FastText-style subword tokenization (overlapping char 3-grams with
  ``<`` ``>`` word boundaries) with special tokens + hash-bucketed ids
  (no OOV table to ship; unknown subwords bucket deterministically),
- the reference's entity-aware tokenize-with-fallback: cross mode
  attempts tokenization with entity markers and falls back to plain text
  per row, surfaced in a ``tok_fallback`` column
  (/root/reference/CrossEncoder/model.py:25-28 — the try/except around
  ``self.tokenizer(*texts, *entity_spans, *entities, ...)``),
- LENGTH-SORTED batch collate (M8): descending-length sort, fixed-size
  sub-batches padded to their own max, inverse-permuted at the end —
  exactly /root/reference/BiEncoder/model.py:98-99
  (``length_sorted_idx = np.argsort([-self._text_length(sen) ...])``)
  and the ``np.argsort(length_sorted_idx)`` un-sort at :138,
- batched multi-head self-attention forward with padding masks,
- a per-actor EMBEDDING CACHE over the distinct-surface stream (T5 —
  the reference's ``{pid -> tensor}`` dict,
  /root/reference/BiEncoder/test.py:81-101, bounded here),
- IDF-weighted masked pooling (the engine's broadcast ``IdfStats``
  pattern — weights fetched once per actor in ``__init__``), cosine
  readout mapped to [0, 1].

Two scoring modes mirroring the reference's two model families:

- ``mode="bi"`` (default; /root/reference/BiEncoder/model.py:68-166):
  each distinct surface is encoded ALONE (``[CLS] grams [SEP]``), pooled
  and cached; the pair score is the cosine of the two cached embeddings.
- ``mode="cross"`` (/root/reference/CrossEncoder/model.py:36-62): the
  pair is one sequence ``[CLS] left [SEP] right [SEP]`` with token-type
  ids and (entity mode) ``[ENT]`` markers; full self-attention crosses
  the segments; the readout is the cosine of the two IDF-pooled segment
  states.

Weight init note: residual output projections (``wo``, ``w2``) are scaled
down GPT-2-style (by ``resid_scale``, default 0.25 ~ 0.5/sqrt(2L)) so the
residual stream stays dominated by token identity — with UNTRAINED
weights, that is what makes the pooled cosine a meaningful similarity
(random-feature embedding); trained weights would simply be loaded in
place of the generator draw. Only the learned values are synthetic; the
actor protocol matches ``stages/scoring.PairScorer`` (columns in:
left_text/right_text; out: + score float32, tok_fallback bool), so
``pipelines/linkage.run_linkage(scorer_cls=ModelPairScorer)`` runs the
flagship on it unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.functions.hashing import hash64
from chameleon_entity_linking_ray.stages.stats import IdfStats

PAD, CLS, SEP, ENT, UNK = 0, 1, 2, 3, 4
_N_SPECIAL = 5


def subword_ids(word: str, vocab_size: int, k: int = 3) -> np.ndarray:
    """FastText-style overlapping char ``k``-grams over ``<word>`` ->
    hash-bucketed ids. Shift-invariant: a one-char edit perturbs at most
    ``k`` grams, so shared substrings keep shared ids (the property the
    random-feature cosine readout relies on). Ids never collide with the
    special range."""
    w = "<" + word.lower() + ">"
    grams = [w[i:i + k] for i in range(max(1, len(w) - k + 1))]
    h = hash64(grams)
    return (_N_SPECIAL + (h % np.uint64(vocab_size - _N_SPECIAL))) \
        .astype(np.int64)


class SyntheticWeights:
    """Deterministic transformer weights. Generated once (driver), shipped
    via ``ray.put`` (model-broadcast pattern), fetched per actor. A
    trained checkpoint would replace the generator draws field-for-field.
    """

    def __init__(self, vocab_size: int = 4096, dim: int = 256,
                 n_heads: int = 4, n_layers: int = 2, max_len: int = 96,
                 seed: int = 0xC0FFEE, resid_scale: float = 0.25):
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(dim)
        f32 = np.float32
        self.vocab_size, self.dim = vocab_size, dim
        self.n_heads, self.n_layers, self.max_len = n_heads, n_layers, max_len
        self.tok = rng.standard_normal((vocab_size, dim)).astype(f32)
        self.pos = (rng.standard_normal((max_len, dim)) * 0.1).astype(f32)
        self.typ = (rng.standard_normal((2, dim)) * 0.1).astype(f32)
        self.layers = []
        for _ in range(n_layers):
            self.layers.append({
                "wq": (rng.standard_normal((dim, dim)) * s).astype(f32),
                "wk": (rng.standard_normal((dim, dim)) * s).astype(f32),
                "wv": (rng.standard_normal((dim, dim)) * s).astype(f32),
                # GPT-2-style scaled residual projections (see module doc)
                "wo": (rng.standard_normal((dim, dim)) * s
                       * resid_scale).astype(f32),
                "w1": (rng.standard_normal((dim, 4 * dim)) * s).astype(f32),
                "b1": np.zeros(4 * dim, f32),
                "w2": (rng.standard_normal((4 * dim, dim)) * s
                       * resid_scale).astype(f32),
                "b2": np.zeros(dim, f32),
                "g1": np.ones(dim, f32), "c1": np.zeros(dim, f32),
                "g2": np.ones(dim, f32), "c2": np.zeros(dim, f32),
            })


def _layer_norm(x: np.ndarray, g: np.ndarray, c: np.ndarray) -> np.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * g + c


def _gelu(x: np.ndarray) -> np.ndarray:
    return (0.5 * x * (1.0 + np.tanh(0.7978845608028654
                                     * (x + 0.044715 * x ** 3)))) \
        .astype(np.float32)


def transformer_forward(w: SyntheticWeights, ids: np.ndarray,
                        type_ids: np.ndarray,
                        mask: np.ndarray) -> np.ndarray:
    """Batched pre-LN encoder forward: (B, T) int ids -> (B, T, D) hidden
    states. ``mask`` is 1.0 for real tokens, 0.0 for padding; padded keys
    are excluded from attention with a -1e9 logit bias (the standard
    padding attention mask)."""
    B, T = ids.shape
    D, H = w.dim, w.n_heads
    dh = D // H
    x = (w.tok[ids] + w.pos[:T][None, :, :] + w.typ[type_ids]) \
        .astype(np.float32)
    neg = np.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(np.float32)
    for ly in w.layers:
        h = _layer_norm(x, ly["g1"], ly["c1"])
        q = (h @ ly["wq"]).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
        k = (h @ ly["wk"]).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
        v = (h @ ly["wv"]).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
        logits = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(dh) + neg
        logits -= logits.max(-1, keepdims=True)
        att = np.exp(logits)
        att /= att.sum(-1, keepdims=True)
        ctx = (att @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + ctx @ ly["wo"]
        h = _layer_norm(x, ly["g2"], ly["c2"])
        x = x + _gelu(h @ ly["w1"] + ly["b1"]) @ ly["w2"] + ly["b2"]
    return x * mask[:, :, None]


def _cosine_01(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    num = (a * b).sum(1)
    den = np.sqrt((a * a).sum(1)) * np.sqrt((b * b).sum(1))
    cos = np.where(den > 0, num / np.maximum(den, 1e-12), 0.0)
    return ((cos + 1.0) * 0.5).astype(np.float32)


def resolve_device(device: str) -> str:
    """Device knob with the reference's CPU-fallback semantics
    (``torch.device('cuda' if torch.cuda.is_available() else 'cpu')``,
    /root/reference/CrossEncoder/model.py:29-33 and
    /root/reference/BiEncoder/model.py:68-70): ``cuda``/``cuda:i`` is
    accepted only when a GPU array backend is importable, else falls back
    to ``cpu`` with a warning. The numpy forward always runs on CPU in
    this build — the day a GPU exists, this is the single switch point
    for the collate target."""
    if device == "cpu":
        return device
    if device == "cuda" or device.startswith("cuda:"):
        try:  # no torch/cupy in this sandbox; gate behind import-try
            import cupy  # noqa: F401
            return device
        except ImportError:
            import warnings
            warnings.warn(
                f"device={device!r} requested but no GPU backend is "
                "importable; falling back to cpu (reference semantics)",
                RuntimeWarning, stacklevel=2)
            return "cpu"
    raise ValueError(f"unknown device {device!r}; expected 'cpu', 'cuda' "
                     "or 'cuda:<i>'")


class ModelPairScorer:
    """Model-backed scoring actor over candidate pairs (protocol of
    ``stages/scoring.PairScorer``; see module docstring for anatomy).
    ``device`` mirrors the reference's collate target
    (CrossEncoder/model.py:29-33); resolved via ``resolve_device``."""

    def __init__(self, config: LinkageConfig | None = None,
                 weights_ref=None, stats_ref=None, mode: str = "bi",
                 infer_batch: int = 64, use_entity_markers: bool = True,
                 device: str = "cpu"):
        # once per actor: fetch broadcast weights + IDF stats (model load)
        self.c = config or LinkageConfig()
        self.device = resolve_device(device)
        self.w: SyntheticWeights = (ray.get(weights_ref)
                                    if weights_ref is not None
                                    else SyntheticWeights())
        self.stats: IdfStats | None = (ray.get(stats_ref)
                                       if stats_ref is not None else None)
        assert mode in ("bi", "cross")
        self.mode = mode
        self.infer_batch = infer_batch
        self.use_entity_markers = use_entity_markers
        self._tok_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # T5 embedding cache: {surface -> pooled vector}, reset-on-cap
        self._emb_cache: dict[str, np.ndarray] = {}
        self._cache_cap = 1_000_000

    # ---- tokenize -------------------------------------------------

    def _word_weight(self, word: str) -> float:
        if self.stats is None:
            return 1.0
        return float(self.stats.token_weights(hash64([word]))[0])

    def _encode_text(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """text -> (subword ids, per-subword IDF weights); cached."""
        hit = self._tok_cache.get(text)
        if hit is None:
            if len(self._tok_cache) >= self._cache_cap:
                self._tok_cache.clear()
            ids_parts, w_parts = [], []
            for word in text.split():
                sw = subword_ids(word, self.w.vocab_size)
                if len(sw) == 0:
                    sw = np.array([UNK], np.int64)
                ids_parts.append(sw)
                w_parts.append(np.full(len(sw), self._word_weight(word),
                                       np.float32))
            ids = (np.concatenate(ids_parts) if ids_parts
                   else np.empty(0, np.int64))
            ws = (np.concatenate(w_parts) if w_parts
                  else np.empty(0, np.float32))
            hit = (ids.astype(np.int64), ws.astype(np.float32))
            self._tok_cache[text] = hit
        return hit

    # ---- shared collate + forward ----------------------------------

    def _forward_pooled(self, toks: list) -> np.ndarray:
        """Length-sorted sub-batch collate + forward + IDF-weighted masked
        pooling. ``toks``: list of (ids, type_ids, pool_weights) per
        sequence; pooling weights are 0 on specials/padding. For cross
        mode the caller pools per segment by zeroing the other segment's
        weights. Returns (n, D) pooled states in INPUT order (descending-
        length sort exactly as BiEncoder/model.py:98-99, inverse-permuted
        as :138)."""
        n = len(toks)
        lens = np.fromiter((len(t[0]) for t in toks), np.int64, n)
        order = np.argsort(-lens, kind="stable")
        segs = max(1, toks[0][1].max() + 1) if n else 1
        pooled = np.empty((n, 2, self.w.dim), np.float32)
        for s0 in range(0, n, self.infer_batch):
            sel = order[s0:s0 + self.infer_batch]
            bmax = int(lens[sel].max())
            B = len(sel)
            ids = np.zeros((B, bmax), np.int64)  # PAD = 0
            typ = np.zeros((B, bmax), np.int64)
            wts = np.zeros((B, bmax), np.float32)
            mask = np.zeros((B, bmax), np.float32)
            for bi, i in enumerate(sel):
                ti, tt, tw = toks[i]
                L = len(ti)
                ids[bi, :L], typ[bi, :L], wts[bi, :L] = ti, tt, tw
                mask[bi, :L] = 1.0
            hs = transformer_forward(self.w, ids, typ, mask)
            for seg in range(2):
                wseg = wts * (typ == seg) * mask
                pooled[sel, seg] = (hs * wseg[:, :, None]).sum(1) / \
                    np.maximum(wseg.sum(1), 1e-6)[:, None]
        del segs
        return pooled

    # ---- bi mode ----------------------------------------------------

    def _embed_surfaces(self, texts: list[str]) -> None:
        """Encode not-yet-cached distinct surfaces: [CLS] grams [SEP],
        one sequence per surface, pooled over the gram tokens."""
        # Clear-on-cap BEFORE computing todo: if the clear ran after,
        # surfaces that were cache hits a line earlier would be evicted
        # without re-insertion and the caller's _emb_cache[t] lookup
        # would KeyError mid-stream (exactly the unbounded-distinct
        # corpus-encoding path that reaches the cap).
        if len(self._emb_cache) >= self._cache_cap:
            self._emb_cache.clear()
        todo = [t for t in dict.fromkeys(texts) if t not in self._emb_cache]
        if not todo:
            return
        toks = []
        for t in todo:
            ti, tw = self._encode_text(t)
            ids = np.concatenate([[CLS], ti, [SEP]]).astype(np.int64)
            wts = np.concatenate([[0.0], tw, [0.0]]).astype(np.float32)
            if len(ids) > self.w.max_len:  # truncation analog
                ids, wts = ids[:self.w.max_len], wts[:self.w.max_len]
            toks.append((ids, np.zeros(len(ids), np.int64), wts))
        pooled = self._forward_pooled(toks)[:, 0]
        for t, v in zip(todo, pooled):
            self._emb_cache[t] = v

    # ---- cross mode ---------------------------------------------------

    def _tokenize_pair(self, left: str, right: str
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
        """[CLS] left [SEP] right [SEP] with type ids and pooling weights.
        Entity-aware mode wraps each side in [ENT] markers (the whole
        surface IS the mention here); if the marked sequence would
        overflow max_len the row FALLS BACK to plain text-only
        tokenization — the reference's try/except fallback contract
        (CrossEncoder/model.py:25-28), surfaced per row."""
        li, lw = self._encode_text(left)
        ri, rw = self._encode_text(right)
        fallback = False
        if self.use_entity_markers:
            if 7 + len(li) + len(ri) <= self.w.max_len:
                ids = np.concatenate([
                    [CLS, ENT], li, [ENT, SEP, ENT], ri, [ENT, SEP]])
                wts = np.concatenate([
                    [0.0, 0.0], lw, [0.0, 0.0, 0.0], rw, [0.0, 0.0]])
                typ = np.concatenate([
                    np.zeros(2 + len(li) + 2, np.int64),
                    np.ones(1 + len(ri) + 2, np.int64)])
                return ids.astype(np.int64), typ, wts.astype(np.float32), \
                    False
            fallback = True
        ids = np.concatenate([[CLS], li, [SEP], ri, [SEP]])
        wts = np.concatenate([[0.0], lw, [0.0], rw, [0.0]])
        typ = np.concatenate([np.zeros(1 + len(li) + 1, np.int64),
                              np.ones(len(ri) + 1, np.int64)])
        if len(ids) > self.w.max_len:  # truncation='longest_first' analog
            ids, wts, typ = (a[:self.w.max_len] for a in (ids, wts, typ))
        return ids.astype(np.int64), typ, wts.astype(np.float32), fallback

    # ---- actor entry --------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        left = batch.column("left_text").to_pylist()
        right = batch.column("right_text").to_pylist()
        n = len(left)
        if n == 0:
            return (batch.append_column("score", pa.array([], pa.float32()))
                    .append_column("tok_fallback",
                                   pa.array([], pa.bool_())))
        if self.mode == "bi":
            # one embed call for BOTH sides: a second call's cap-clear
            # must never evict surfaces the first call just cached
            self._embed_surfaces(left + right)
            a = np.stack([self._emb_cache[t] for t in left])
            b = np.stack([self._emb_cache[t] for t in right])
            scores = _cosine_01(a, b)
            fb = np.zeros(n, bool)
        else:
            toks = [self._tokenize_pair(a, b)
                    for a, b in zip(left, right)]
            pooled = self._forward_pooled([t[:3] for t in toks])
            scores = _cosine_01(pooled[:, 0], pooled[:, 1])
            fb = np.fromiter((t[3] for t in toks), bool, n)
        return (batch.append_column("score", pa.array(scores, pa.float32()))
                .append_column("tok_fallback", pa.array(fb, pa.bool_())))


class ModelEmbedder(ModelPairScorer):
    """Embedding-only actor over a text column: the reference's corpus
    encoding loop (``model.encode(corpus[x*1e6:(x+1)*1e6], batch_size=128)``,
    /root/reference/BiEncoder/test_retrieval.py:46-49) as a Ray Data actor
    pool — weights fetched once per actor in ``__init__`` (inherited),
    per-batch tokenize + length-sorted collate + forward via the shared
    ``_embed_surfaces``. Appends a FixedSizeList<float32>[dim] column; the
    per-actor surface cache makes re-encoding repeated surfaces free."""

    def __init__(self, text_col: str = "text", out_col: str = "embedding",
                 **kw):
        super().__init__(**kw)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        texts = batch.column(self.text_col).to_pylist()
        if not texts:
            empty = pa.array([], pa.list_(pa.float32(), self.w.dim))
            return batch.append_column(self.out_col, empty)
        self._embed_surfaces(texts)
        em = np.stack([self._emb_cache[t] for t in texts]).astype(np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(em.reshape(-1), pa.float32()), self.w.dim)
        return batch.append_column(self.out_col, col)
