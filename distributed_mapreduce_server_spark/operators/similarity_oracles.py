"""DuckDB oracle SQL for similarity search (§2.4).

sim_lsh_ann intentionally has no oracle (approximate, engine-shaped);
its recall is asserted in tests/test_similarity.py instead.
"""

from distributed_mapreduce_server_spark.operators.similarity import N_QUERIES, TOP_K

_DOT = (
    "list_sum(list_transform(range(1, len(q.embedding) + 1), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
)
_NORM_Q = "sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_NORM_C = "sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

SIMILARITY_ORACLES: dict[str, str] = {
    "sim_cosine_topk": f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND({_DOT} / ({_NORM_Q} * {_NORM_C}), 4) AS cos_sim
            FROM embeddings q
            JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
        ), ranked AS (
            SELECT query_id, neighbor_id, cos_sim,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos_sim, rank
        FROM ranked WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
}
