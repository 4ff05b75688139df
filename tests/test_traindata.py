"""Training-data prep operators (pipelines/traindata.py): each pinned
against an independent pandas/numpy reimplementation — the DuckDB value
oracles live in __ray_entry__.oracle_sql() and are exercised by
tools/check_oracle.py and the driver gate."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


class TestRedaction:
    def test_regex_redact_all_occurrences(self):
        from chameleon_entity_linking_ray.pipelines.traindata import regex_redact
        ds = rd.from_arrow(pa.table({
            "t": ["a 1234 b 99999", "no digits", "55555"]}))
        out = regex_redact(ds, "t", r"[0-9]{4,}", "[ID]").to_pandas()
        assert out["t"].tolist() == ["a [ID] b [ID]", "no digits", "[ID]"]

    def test_redact_ids_masks_customer_names(self):
        from chameleon_entity_linking_ray.pipelines.traindata import redact_ids
        out = redact_ids(SF).to_pandas()
        assert (out["name_redacted"] == "Customer#[ID]").all()


class TestSampling:
    def test_sample_documents_matches_md5_rule(self):
        from chameleon_entity_linking_ray.pipelines.traindata import sample_documents
        got = sample_documents(SF).to_pandas().sort_values("doc_id")
        docs = _docs()
        keys = docs["doc_id"].map(
            lambda d: hashlib.md5(str(d).encode()).hexdigest()[:4])
        want = docs[keys < "2800"].sort_values("doc_id")
        assert got["doc_id"].tolist() == want["doc_id"].tolist()

    def test_stratified_sample_per_group_rank(self):
        from chameleon_entity_linking_ray.pipelines.traindata import stratified_sample
        got = stratified_sample(SF, n_per_group=5).to_pandas()
        docs = _docs().copy()
        docs["skey"] = docs["doc_id"].map(
            lambda d: hashlib.md5(str(d).encode()).hexdigest())
        want = (docs.sort_values(["skey", "doc_id"])
                .groupby("lang").head(5))
        assert (got.groupby("lang").size() <= 5).all()
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])
        # rnk is the 1-based rank by (skey, doc_id) within the stratum
        merged = got.merge(docs[["doc_id", "skey"]], on="doc_id")
        for _, g in merged.groupby("lang"):
            assert (g.sort_values("rnk")["skey"].is_monotonic_increasing)


class TestPacking:
    def _want(self, budget: int) -> pd.DataFrame:
        docs = _docs().sort_values("doc_id")
        nt = docs["text"].str.strip().map(lambda t: len(t.split()) if t else 0)
        before = np.concatenate([[0], np.cumsum(nt.to_numpy())[:-1]])
        return pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(),
                             "seq_id": before // budget})

    def test_pack_sequences_matches_serial_cumsum(self):
        from chameleon_entity_linking_ray.pipelines.traindata import pack_sequences
        got = pack_sequences(SF, budget=256).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        want = self._want(256)
        assert got["seq_id"].tolist() == want["seq_id"].tolist()

    def test_pack_sequences_range_size_invariant(self):
        """The distributed prefix sum must not depend on the range knob."""
        from chameleon_entity_linking_ray.pipelines.traindata import pack_sequences
        a = pack_sequences(SF, budget=100, range_size=64).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = pack_sequences(SF, budget=100, range_size=1024).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestNgrams:
    def test_top_ngrams_matches_pandas(self):
        from chameleon_entity_linking_ray.pipelines.traindata import top_ngrams
        got = top_ngrams(SF, k=10).to_pandas()
        docs = _docs()
        cnt: dict[str, int] = {}
        for t in docs["text"]:
            toks = t.strip().split()
            for a, b in zip(toks, toks[1:]):
                cnt[f"{a} {b}"] = cnt.get(f"{a} {b}", 0) + 1
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(zip(got["bigram"], got["cnt"])) == want

    def test_doc_tokens_bpe_counts(self):
        from chameleon_entity_linking_ray.pipelines.traindata import (
            BPE_TOKEN_RE, doc_tokens_bpe)
        import re
        got = doc_tokens_bpe(SF).to_pandas().set_index("doc_id")
        docs = _docs().set_index("doc_id")
        pat = re.compile(BPE_TOKEN_RE)
        for d in list(docs.index)[:50]:
            assert got.loc[d, "n_bpe_tokens"] == len(pat.findall(docs.loc[d, "text"]))


class TestChunking:
    def test_doc_chunks_match_serial_windows(self):
        from chameleon_entity_linking_ray.pipelines.traindata import doc_chunks
        got = doc_chunks(SF, max_tokens=32, overlap=8).to_pandas() \
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
        docs = _docs().sort_values("doc_id")
        rows = []
        for _, r in docs.iterrows():
            toks = r["text"].strip().split() if r["text"].strip() else []
            n = len(toks)
            nch = 1 if n <= 32 else -(-(n - 32) // 24) + 1
            for i in range(nch):
                s = i * 24
                rows.append((r["doc_id"], i, s, max(min(s + 32, n) - s, 0),
                             " ".join(toks[s:min(s + 32, n)])))
        want = pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "start_tok",
                                           "n_chunk_tokens", "chunk_text"])
        assert len(got) == len(want)
        for c in want.columns:
            assert got[c].tolist() == want[c].tolist(), c

    def test_doc_chunks_cover_all_tokens_no_gaps(self):
        """Every token index is covered by >= 1 chunk; consecutive chunks
        overlap by exactly `overlap` except a short tail."""
        from chameleon_entity_linking_ray.pipelines.traindata import doc_chunks
        got = doc_chunks(SF, max_tokens=16, overlap=4).to_pandas()
        for _, g in got.groupby("doc_id"):
            g = g.sort_values("chunk_idx")
            covered = set()
            for _, r in g.iterrows():
                covered |= set(range(r["start_tok"],
                                     r["start_tok"] + r["n_chunk_tokens"]))
            n = (g["start_tok"] + g["n_chunk_tokens"]).max()
            assert covered == set(range(n))


class TestKeywords:
    def test_doc_keywords_match_pandas_tfidf(self):
        from chameleon_entity_linking_ray.pipelines.traindata import doc_keywords
        got = doc_keywords(SF, k=3).to_pandas() \
            .sort_values(["doc_id", "rnk"]).reset_index(drop=True)
        docs = _docs()
        n_docs = len(docs)
        rows = []
        for _, r in docs.iterrows():
            for w in set(r["text"].strip().split()):
                rows.append((r["doc_id"], w))
        pairs = pd.DataFrame(rows, columns=["doc_id", "term"])
        df_map = pairs.groupby("term").size()
        out = []
        for _, r in docs.iterrows():
            toks = r["text"].strip().split()
            tf = pd.Series(toks).value_counts()
            score = (tf * np.log(n_docs / df_map[tf.index])).round(6)
            top = sorted(zip(-score, tf.index))[:3]
            out.extend((r["doc_id"], t, -s) for s, t in top)
        want = pd.DataFrame(out, columns=["doc_id", "term", "tfidf"])
        assert got["term"].tolist() == want["term"].tolist()
        assert np.allclose(got["tfidf"], want["tfidf"], atol=1e-9)


class TestPercentiles:
    def test_exact_percentiles_match_numpy(self):
        from chameleon_entity_linking_ray.pipelines.traindata import exact_percentiles
        got = exact_percentiles(SF).to_pandas().set_index("q")["val_c"]
        v = np.sort(np.trunc(
            pq.read_table(f"{SF}/lineitem.parquet",
                          columns=["l_extendedprice"])
            .to_pandas()["l_extendedprice"].to_numpy() * 100).astype(np.int64))
        n = len(v)
        for q in (0.25, 0.5, 0.75, 0.9, 0.99):
            assert got[q] == v[int(np.floor(q * (n - 1)))]

    def test_exact_percentiles_bucket_knob_invariant(self):
        from chameleon_entity_linking_ray.pipelines.traindata import exact_percentiles
        a = exact_percentiles(SF, n_buckets=16).to_pandas()
        b = exact_percentiles(SF, n_buckets=512).to_pandas()
        assert a.equals(b)


class TestDsirLogratio:
    def test_target_language_docs_score_higher(self):
        from chameleon_entity_linking_ray.pipelines.traindata import dsir_logratio
        got = dsir_logratio(SF).to_pandas()
        docs = _docs()[["doc_id", "lang"]]
        m = got.merge(docs, on="doc_id")
        en = m.loc[m["lang"] == "en", "log_ratio"]
        rest = m.loc[m["lang"] != "en", "log_ratio"]
        assert len(en) and len(rest)
        # the importance weight must separate the target domain: the
        # synthetic corpus shares most template vocabulary across
        # languages, so the margin is small but the SIGN must split
        assert en.mean() > 0 > rest.mean()
        per_lang = m.groupby("lang")["log_ratio"].mean()
        assert (per_lang.drop("en") < per_lang["en"]).all()
