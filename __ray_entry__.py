"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (full inverted-index build over
the sf0.001 documents table + BM25 top-k queries through the built
index).  ``queries()`` exposes one callable per implemented operator
from SURVEY.md §2 plus the training-data extensions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible entry.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the engine package) calls ray.init/ray.shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# DuckDB/RE2 tokenizer identical to engine.tokenize on ASCII corpora
# (CJK-unigram parity is pytest-verified on the webtext fixtures; the
# testdata text is ASCII so the simple pattern is exact here).
_TOK = r"regexp_extract_all(lower(text), '[\p{L}\p{N}]+')"

SESSION_GAP_S = 1800  # must match engine.docops.SESSION_GAP_S

_DE = "('der','die','das','und','ist','nicht','mit','ein','eine','für')"
_EN = "('the','of','and','to','a','in','is','it','that','for')"
_ES = "('el','la','los','las','y','es','un','una','para','con')"
_FR = "('le','la','les','et','est','un','une','pour','dans','que')"


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents (dedup ->
    tokenize -> partial-agg -> groupby(part) shuffle -> compressed
    segments), then answer BM25 queries through it."""
    import pandas as pd
    from engine.docops import docs_index

    idx = docs_index("/root/testdata/sf0.001")
    rows = []
    for q in ("hash join table", "sort merge", "window", "the of"):
        for rank, (doc_id, score) in enumerate(idx.search(q, k=10), 1):
            rows.append({"query": q, "rank": rank, "doc_id": doc_id,
                         "score": round(score, 6)})
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


def queries() -> dict[str, Callable[[str], Any]]:
    from engine import docops as d
    return {
        # tokenization + corpus statistics (SURVEY.md M9/G3/G5)
        "doclen_per_doc": d.q_doclen,
        "term_df_top100": d.q_term_df_top100,
        "term_cf_top100": d.q_term_cf_top100,
        "corpus_stats": d.q_corpus_stats,
        # the flagship engine: BM25 top-k + postings lookup (3.2, J3, T1)
        "bm25_topk": d.q_bm25_topk,
        "bm25_topk_stop": d.q_bm25_topk_stop,
        "term_top_docs": d.q_term_top_docs,
        "index_stats": d.q_index_stats,                   # rows-only
        # dedup family (D1/D3 extensions)
        "dedup_exact": d.q_dedup_exact,
        "minhash_candidates": d.q_minhash_candidates,     # rows-only
        "simhash": d.q_simhash,                           # rows-only
        "ngram_jaccard_adjacent": d.q_ngram_jaccard_adjacent,
        # similarity search over embeddings
        "knn_cosine": d.q_knn_cosine,
        "lsh_knn": d.q_lsh_knn,
        "ivf_knn": d.q_ivf_knn,
        "embed_neardup": d.q_embed_neardup,
        # text analysis
        "langid": d.q_langid,
        "quality": d.q_quality,
        "token_counts": d.q_token_counts,
        "fingerprints": d.q_fingerprints,                 # rows-only
        # chunking (M2/M3 + A7 semantic)
        "chunks_fixed": d.q_chunks_fixed,
        "chunks_markdown": d.q_chunks_markdown,           # rows-only
        "chunks_semantic": d.q_chunks_semantic,           # rows-only
        # embedding actor pool + rerank + hybrid (A1-A5, RRF)
        "embed_knn": d.q_embed_knn,                       # rows-only
        "rerank_topk": d.q_rerank_topk,                   # rows-only
        "hybrid_rrf": d.q_hybrid_rrf,                     # rows-only
        # multimodal actor-pool stages (stubbed decode, real plumbing)
        "image_features": d.q_image_features,             # rows-only
        "frame_samples": d.q_frame_samples,               # rows-only
        # windowed aggregate + sessionization over the events table
        "events_hourly": d.q_events_hourly,
        "events_sessions": d.q_events_sessions,
    }


def oracle_sql() -> dict[str, str]:
    k1, b = 1.2, 0.75
    return {
        "doclen_per_doc": f"""
            SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS doclen
            FROM documents""",

        "term_df_top100": f"""
            WITH t AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            SELECT term, count(DISTINCT doc_id) AS df FROM t
            GROUP BY term ORDER BY df DESC, term LIMIT 100""",

        "term_cf_top100": f"""
            WITH t AS (SELECT unnest({_TOK}) AS term FROM documents)
            SELECT term, count(*) AS cf FROM t
            GROUP BY term ORDER BY cf DESC, term LIMIT 100""",

        # avgdl as integer micro-units from the exact integer sum/count —
        # never a rounded float in the value hash (round-1 lesson)
        "corpus_stats": f"""
            WITH d AS (SELECT len({_TOK}) AS dl FROM documents)
            SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens,
                   CAST(round(CAST(sum(dl) AS DOUBLE) / count(*) * 1e6)
                        AS BIGINT) AS avgdl_micro FROM d""",

        "bm25_topk": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                   WHERE term IN ('hash','join','table') GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            sc AS (
              SELECT tf.doc_id,
                     sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf * ({k1} + 1)
                         / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / st.avgdl))
                     ) AS score
              FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
                   CROSS JOIN st
              GROUP BY tf.doc_id)
            SELECT doc_id, round(score, 6) AS score FROM sc
            ORDER BY score DESC, doc_id LIMIT 10""",

        "bm25_topk_stop": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                   WHERE term IN ('the','a','value') GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            sc AS (
              SELECT tf.doc_id,
                     sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf * ({k1} + 1)
                         / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / st.avgdl))
                     ) AS score
              FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
                   CROSS JOIN st
              GROUP BY tf.doc_id)
            SELECT doc_id, round(score, 6) AS score FROM sc
            ORDER BY score DESC, doc_id LIMIT 10""",

        "term_top_docs": f"""
            WITH t AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            SELECT doc_id, count(*) AS tf FROM t WHERE term = 'hash'
            GROUP BY doc_id ORDER BY tf DESC, doc_id LIMIT 20""",

        "dedup_exact": """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   count(*) AS n_dups
            FROM documents GROUP BY text""",

        "ngram_jaccard_adjacent": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            sh AS (SELECT doc_id,
                          list_distinct([array_to_string(toks[i:i+2], ' ')
                                         for i in range(1, len(toks) - 1)]) AS s
                   FROM t WHERE len(toks) >= 3)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))) * 1e6)
                        AS BIGINT) AS jaccard_ppm
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""",

        "knn_cosine": """
            SELECT CAST(0 AS BIGINT) AS query_id, b.vec_id,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a, embeddings b
            WHERE a.vec_id = 0 AND b.vec_id <> 0
            ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[]))
                     DESC, b.vec_id
            LIMIT 10""",

        "lsh_knn": """
            SELECT CAST(1 AS BIGINT) AS query_id, b.vec_id,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a, embeddings b
            WHERE a.vec_id = 1 AND b.vec_id <> 1
            ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[]))
                     DESC, b.vec_id
            LIMIT 10""",

        "ivf_knn": """
            SELECT CAST(2 AS BIGINT) AS query_id, b.vec_id,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a, embeddings b
            WHERE a.vec_id = 2 AND b.vec_id <> 2
            ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[]))
                     DESC, b.vec_id
            LIMIT 10""",

        "embed_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) > 0.3""",

        "langid": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            s AS (SELECT doc_id,
                len(list_filter(toks, x -> x IN {_DE})) AS s_de,
                len(list_filter(toks, x -> x IN {_EN})) AS s_en,
                len(list_filter(toks, x -> x IN {_ES})) AS s_es,
                len(list_filter(toks, x -> x IN {_FR})) AS s_fr
              FROM t)
            SELECT doc_id, CASE
                WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
                WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS pred_lang
            FROM s""",

        "quality": f"""
            WITH t AS (SELECT doc_id, text, {_TOK} AS toks FROM documents)
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(round(CAST(len(list_filter(toks, x -> x IN {_EN}))
                              AS DOUBLE) / greatest(len(toks), 1) * 1e6)
                        AS BIGINT) AS stopword_ratio_ppm,
                   CAST(round(CAST(length(regexp_replace(
                              text, '[^\\p{{L}}\\p{{N}}]', '', 'g'))
                              AS DOUBLE) / greatest(length(text), 1) * 1e6)
                        AS BIGINT) AS alnum_ratio_ppm
            FROM t""",

        "token_counts": r"""
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                        END AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(
                        text, '[\p{L}]+|[0-9]+|[^\p{L}\p{N}\s_]+'))
                        AS BIGINT) AS bpeish_tokens
            FROM documents""",

        # per-element micro-unit scaling BEFORE the sum: integer group
        # sums are exact and order-insensitive (DuckDB's float group-sum
        # addition order is arbitrary — the round-1 sessions flake)
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events,
                   sum(CAST(round(value * 1e6) AS BIGINT)) AS sum_value_micro
            FROM events GROUP BY event_type, date_trunc('hour', ts)""",

        "chunks_fixed": """
            WITH n AS (SELECT doc_id, text,
                              CAST(ceil(length(text) / 200.0) AS INT) AS k
                       FROM documents WHERE length(text) > 0)
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                   substr(text, CAST(i * 200 + 1 AS INT), 200) AS chunk,
                   CAST(length(substr(text, CAST(i * 200 + 1 AS INT), 200))
                        AS BIGINT) AS n_chars
            FROM n, unnest(range(k)) AS t(i)""",

        "events_sessions": f"""
            WITH o AS (
              SELECT user_id, ts, value, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts - lag(ts) OVER w) > {SESSION_GAP_S}
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT *, sum(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1
                        AS session_id
              FROM o)
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts) AS start_ts, max(ts) AS end_ts,
                   sum(CAST(round(value * 1e6) AS BIGINT)) AS sum_value_micro
            FROM s GROUP BY user_id, session_id""",
        # minhash_candidates / simhash / fingerprints: deterministic
        # SipHash-based sketches, not expressible in ANSI SQL -> driver
        # rows-only check; pytest verifies them against brute force.
    }
