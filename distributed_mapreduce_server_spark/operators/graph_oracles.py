"""DuckDB oracle SQL for the graph operators (graph.py).

PageRank is unrolled into one CTE per iteration (recursive CTEs with
aggregation in the recursive term are non-standard), with the same
per-iteration ROUND(…, 10) the Spark loop applies.
"""

from distributed_mapreduce_server_spark.operators.graph import (
    PR_BASE,
    PR_DAMPING,
    PR_ITERATIONS,
)

_EDGES = """
    pairs AS (
        SELECT DISTINCT o_custkey * 2 AS cust_node, l_suppkey * 2 + 1 AS supp_node
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT cust_node AS src, supp_node AS dst FROM pairs
        UNION ALL
        SELECT supp_node AS src, cust_node AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY 1)
"""


def _pagerank_sql() -> str:
    steps = ["pr0 AS (SELECT src AS node, 1.0 AS pr FROM deg)"]
    for i in range(1, PR_ITERATIONS + 1):
        steps.append(
            f"""pr{i} AS (
        SELECT e.dst AS node,
               ROUND({PR_BASE} + {PR_DAMPING} * SUM(p.pr / d.out_deg), 10) AS pr
        FROM edges e
        JOIN pr{i - 1} p ON e.src = p.node
        JOIN deg d ON e.src = d.src
        GROUP BY 1
    )"""
        )
    return f"""
    WITH {_EDGES},
    {", ".join(steps)}
    SELECT node AS node_id,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           pr
    FROM pr{PR_ITERATIONS}
    ORDER BY node_id
"""


GRAPH_ORACLES: dict[str, str] = {
    "q_pagerank": _pagerank_sql(),
    "q_graph_degree_distribution": f"""
        WITH {_EDGES},
        d2 AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY 1)
        SELECT degree, COUNT(*) AS n_nodes
        FROM d2
        GROUP BY 1
        ORDER BY 1
    """,
}
