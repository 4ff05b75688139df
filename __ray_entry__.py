"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship linkage pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data ops (dedup family, similarity search,
text analysis) with DuckDB oracles where the semantics are SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# SQL fragments shared by several oracles (kept in lockstep with the Python
# kernels in chameleon_entity_linking_ray/functions/text.py and
# stages/extract.py — see each query's docstring for the pairing)
# ---------------------------------------------------------------------------

# stages/extract.py:_MENTION_RE (RE2-compatible; duckdb standard strings do
# not process backslashes, so \b etc. pass through verbatim)
_MENTION_RE_SQL = r"\b[A-Z][\w&.\-]*(?:\s+(?:[A-Z][\w&.\-]*|\d+))*"

# stages/extract.py:_rho — min(0.99, 0.15 + 0.10*ntok + 0.01*len) > 0.26,
# same operation order so the IEEE doubles agree bit-for-bit
_RHO_FILTER_SQL = ("LEAST(0.99, 0.15 + 0.10*(length(m) - "
                   "length(replace(m, ' ', '')) + 1) + 0.01*length(m)) > 0.26")

# pipelines/corpus.py:_title_sentence
_TITLE_TEXT_SQL = (
    "'Order for ' || array_to_string(list_transform(string_split(p_name, ' '), "
    "w -> upper(substring(w, 1, 1)) || substring(w, 2)), ' ') || "
    "' placed by ' || p_brand")

# functions/text.py:normalize_array
_NORM_SQL = ("trim(regexp_replace(regexp_replace(lower({col}), "
             r"'[^\w\s]+', ' ', 'g'), '\s+', ' ', 'g'))")


def _langid_sql() -> str:
    """Generated from the SAME stopword lists as the Python kernel
    (functions/text.py LANG_STOPWORDS), so semantics agree by construction."""
    from chameleon_entity_linking_ray.functions.text import LANG_STOPWORDS
    from chameleon_entity_linking_ray.pipelines.corpus import LANG_ORDER

    def score(lang: str) -> str:
        terms = [f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))"
                 for w in LANG_STOPWORDS[lang]]
        return "(" + " + ".join(terms) + ")"

    s = {lang: score(lang) for lang in LANG_ORDER}
    return f"""
    WITH s AS (SELECT doc_id, {s['en']} AS s_en, {s['de']} AS s_de,
                      {s['fr']} AS s_fr FROM documents)
    SELECT doc_id,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM s"""


def entry() -> Any:
    """Flagship linkage pipeline over a transcript table derived from
    sf0.001 (extraction -> blocking -> scoring -> clustering)."""
    from chameleon_entity_linking_ray.pipelines.corpus import linkage_parts
    return linkage_parts(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    from chameleon_entity_linking_ray.pipelines import analytics as A
    from chameleon_entity_linking_ray.pipelines import corpus as C

    return {
        # --- relational operator coverage (SURVEY.md §2.4-2.7) ---
        "q1_pricing": A.q1_pricing,
        "top_orders": A.top_orders,
        "segment_revenue": A.segment_revenue,
        "nation_customers": A.nation_customers,
        "events_daily": A.events_daily,
        "events_semi": A.events_semi,
        "customers_no_orders": A.customers_no_orders,
        "merge_runs": A.merge_runs,
        "topk_per_customer": A.topk_per_customer,
        "distinct_counts": A.distinct_counts,
        # --- text analysis (documents) ---
        "doc_tokens": C.doc_tokens,
        "doc_quality": C.doc_quality,
        "doc_langid": C.doc_langid,
        "doc_fingerprint": C.doc_fingerprint,
        # --- dedup family ---
        "dedup_exact": C.dedup_exact,
        "minhash_dup_pairs": C.minhash_dup_pairs,
        "simhash_docs": C.simhash_docs,
        "ngram_jaccard_pairs": C.ngram_jaccard_pairs,
        "embedding_near_dups": C.embedding_near_dups,
        # --- similarity search ---
        "ann_topk": C.ann_topk,
        "ann_lsh_topk": C.ann_lsh_topk,
        # --- graph expansion (reference entity_expander parity) ---
        "bfs_copurchase": _q_bfs,
        "ppr_copurchase": _q_ppr,
        # --- multimodal plumbing (decode stubs, deterministic fakes) ---
        "media_decode": _q_media,
        # --- extraction parity + flagship ---
        "part_mentions": C.part_mentions,
        "mention_vocab": C.mention_vocab,
        "linkage_parts": C.linkage_parts,
    }


def _q_bfs(sf_dir):
    from chameleon_entity_linking_ray.stages.graph import bfs_copurchase
    return bfs_copurchase(sf_dir, seed_part=0, k=2)


def _q_ppr(sf_dir):
    from chameleon_entity_linking_ray.stages.graph import ppr_copurchase
    return ppr_copurchase(sf_dir, seed_part=0)


def _q_media(sf_dir):
    # REAL pure-numpy BMP decode (stages/multimodal.py round-2 de-stub):
    # mean_intensity comes from actual decoded pixels
    import ray.data
    from chameleon_entity_linking_ray.stages.multimodal import (
        decode_media, synth_media)
    return decode_media(ray.data.from_arrow(synth_media(256, seed=7)),
                        feature_dim=16).drop_columns(["feature"])


def oracle_sql() -> dict[str, str]:
    title = _TITLE_TEXT_SQL
    norm = _NORM_SQL.format(col="surface")
    return {
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(trunc(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                   CAST(SUM(CAST(trunc(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
                   CAST(SUM(CAST(trunc(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "top_orders": """
            SELECT o_orderkey, o_custkey,
                   CAST(trunc(o_totalprice*100) AS BIGINT) AS total_c
            FROM orders
            ORDER BY total_c DESC, o_orderkey LIMIT 20""",
        "segment_revenue": """
            SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(trunc(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_c
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "nation_customers": """
            SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
                   CAST(SUM(CAST(trunc(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_acctbal_c
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name""",
        "events_daily": """
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(trunc(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
            FROM events GROUP BY event_type, day""",
        "events_semi": """
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events
            WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
            GROUP BY event_type""",
        "customers_no_orders": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)""",
        "merge_runs": """
            SELECT o_orderkey, CAST(MIN(src) AS BIGINT) AS src FROM (
                SELECT o_orderkey, 0 AS src FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT o_orderkey, 1 AS src FROM orders WHERE o_totalprice > 100000.0
            ) GROUP BY o_orderkey""",
        "topk_per_customer": """
            SELECT o_custkey, o_orderkey, total_c, CAST(rnk AS BIGINT) AS rnk
            FROM (SELECT o_custkey, o_orderkey,
                         CAST(trunc(o_totalprice*100) AS BIGINT) AS total_c,
                         ROW_NUMBER() OVER (
                             PARTITION BY o_custkey
                             ORDER BY CAST(trunc(o_totalprice*100) AS BIGINT) DESC,
                                      o_orderkey) AS rnk
                  FROM orders)
            WHERE rnk <= 3""",
        "distinct_counts": """
            SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events""",
        "doc_tokens": r"""
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                        AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars2
            FROM documents""",
        "doc_quality": r"""
            SELECT doc_id, CAST(n_punct AS BIGINT) AS n_punct,
                   ROUND(0.5 * LEAST(n_tokens, 100) / 100.0 +
                         0.5 * (1.0 - n_punct / GREATEST(n_chars, 1)), 6) AS quality
            FROM (SELECT doc_id,
                         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
                         CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE len(string_split_regex(trim(text), '\s+')) END
                              AS n_tokens,
                         length(text) AS n_chars
                  FROM documents)""",
        "doc_langid": _langid_sql(),
        "dedup_exact": """
            SELECT text, CAST(MIN(doc_id) AS BIGINT) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY text""",
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 10),
                 s AS (SELECT q.query_id, e.vec_id,
                              list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                                     CAST(e.embedding AS DOUBLE[])) AS score
                       FROM q CROSS JOIN embeddings e
                       WHERE e.vec_id != q.query_id)
            SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rnk
            FROM (SELECT query_id, vec_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY score DESC, vec_id) AS rnk
                  FROM s)
            WHERE rnk <= 5""",
        "part_mentions": f"""
            WITH t AS (SELECT p_partkey, {title} AS text FROM part)
            SELECT p_partkey,
                   CAST(len(list_filter(regexp_extract_all(text, '{_MENTION_RE_SQL}'),
                                        m -> {_RHO_FILTER_SQL})) AS BIGINT) AS n_mentions
            FROM t""",
        "mention_vocab": f"""
            WITH t AS (SELECT {title} AS text FROM part),
                 m AS (SELECT unnest(list_filter(
                           regexp_extract_all(text, '{_MENTION_RE_SQL}'),
                           m -> {_RHO_FILTER_SQL})) AS surface FROM t)
            SELECT {norm} AS norm, CAST(COUNT(*) AS BIGINT) AS n_mentions
            FROM m GROUP BY norm""",
        "bfs_copurchase": """
            WITH RECURSIVE pairs AS (
                SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
            ), r(node, hop) AS (
                SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT p.dst, r.hop + 1 FROM r JOIN pairs p ON p.src = r.node
                WHERE r.hop < 2
            )
            SELECT node, MIN(hop) AS hop FROM r GROUP BY node""",
        # minhash_dup_pairs / simhash_docs / ngram_jaccard_pairs /
        # embedding_near_dups / ann_lsh_topk / doc_fingerprint /
        # linkage_parts: sketch-based or iterative semantics, not
        # SQL-expressible -> rows-only checks.
    }
