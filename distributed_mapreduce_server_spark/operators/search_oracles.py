"""DuckDB oracle SQL for the retrieval operators (search.py).

Formulas are written with the identical literal constants and
operation order as the Spark expressions so the doubles agree
bit-for-bit before the final ROUND.
"""

from distributed_mapreduce_server_spark.operators.search import (
    BM25_B,
    BM25_K1,
    BM25_QUERY,
    HYBRID_QUERY_ID,
    HYBRID_TOP_K,
    RRF_K,
    SEARCH_TOP_K,
)

# the tokenizer fragment has ONE home (text_oracles) so a tokenizer
# change cannot silently desynchronize the BM25 oracle
from distributed_mapreduce_server_spark.operators.text_oracles import _TOKS

_TF_COLS = ", ".join(
    f"len(list_filter(toks, t -> t = '{term}')) AS tf{i}" for i, term in enumerate(BM25_QUERY)
)
_DF_COLS = ", ".join(
    f"SUM(CAST(tf{i} > 0 AS BIGINT)) AS df{i}" for i in range(len(BM25_QUERY))
)
_SCORE = " + ".join(
    f"ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) * CAST(tf{i} AS DOUBLE) * {BM25_K1 + 1.0} "
    f"/ (CAST(tf{i} AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl "
    f"/ (CAST(sum_dl AS DOUBLE) / n_docs)))"
    for i in range(len(BM25_QUERY))
)

_BM25_CTE = f"""
    per_doc AS (
        SELECT doc_id, len(toks) AS dl, {_TF_COLS}
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {_DF_COLS} FROM per_doc
    ),
    bm25_scored AS (
        SELECT doc_id, CAST(dl AS INTEGER) AS dl,
               ROUND({_SCORE}, 6) AS bm25
        FROM per_doc CROSS JOIN stats
    ),
    bm25_top AS (
        SELECT doc_id, dl, bm25 FROM bm25_scored
        WHERE bm25 > 0
        ORDER BY bm25 DESC, doc_id
        LIMIT {SEARCH_TOP_K}
    )
"""

SEARCH_ORACLES: dict[str, str] = {
    "text_bm25_search": f"""
        WITH {_BM25_CTE}
        SELECT doc_id, dl, bm25 FROM bm25_top
        ORDER BY bm25 DESC, doc_id
    """,
}

_DOT = (
    "list_sum(list_transform(range(1, len(q.embedding) + 1), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
)
_NORM_Q = "sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_NORM_C = "sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

SEARCH_ORACLES["sim_hybrid_search"] = f"""
    WITH {_BM25_CTE},
    lex AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS bm25_rank
        FROM bm25_top
    ),
    cos_top AS (
        SELECT c.vec_id AS doc_id,
               ROUND({_DOT} / ({_NORM_Q} * {_NORM_C}), 4) AS cos_sim
        FROM embeddings q JOIN embeddings c
          ON q.vec_id = {HYBRID_QUERY_ID} AND c.vec_id <> {HYBRID_QUERY_ID}
        ORDER BY cos_sim DESC, doc_id
        LIMIT {SEARCH_TOP_K}
    ),
    vec AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS INTEGER) AS cos_rank
        FROM cos_top
    )
    SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, bm25_rank, cos_rank,
           ROUND(COALESCE(1.0 / ({RRF_K} + bm25_rank), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + cos_rank), 0.0), 6) AS rrf
    FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT {HYBRID_TOP_K}
"""

from distributed_mapreduce_server_spark.operators.search import (  # noqa: E402
    PHRASE_QUERIES,
)

_PHRASE_LIST = ", ".join(f"'{p}'" for p in PHRASE_QUERIES)

# the oracle enumerates every adjacent-token bigram and filters to the
# query phrases — same token stream, no positional-join machinery.
SEARCH_ORACLES["text_phrase_search"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    p1 AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t),
    bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram FROM p1)
    SELECT bigram AS phrase,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM bg
    WHERE bigram IN ({_PHRASE_LIST})
    GROUP BY 1
    ORDER BY 1
"""
