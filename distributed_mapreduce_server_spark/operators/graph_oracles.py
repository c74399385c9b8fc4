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


from distributed_mapreduce_server_spark.operators.graph import (  # noqa: E402
    CN_DEG_CAP,
    CN_TOP_K,
)

# one-mode projection: parts co-ordered in at least one order
# (u < v, distinct) — the triangle-bearing graph.
_COPURCHASE = """
    li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    ce AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    )
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
    # id-ordered 3-way self-join (u < v < w): a different enumeration
    # order than the Spark side's degree-ordered orientation, the same
    # triangle set — each triangle counted exactly once by both.
    "q_graph_triangles": f"""
        WITH {_COPURCHASE},
        tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM ce e1
            JOIN ce e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN ce e3 ON e3.u = e1.v AND e3.v = e2.v
        ),
        deg AS (
            SELECT node, COUNT(*) AS d
            FROM (SELECT u AS node FROM ce UNION ALL SELECT v AS node FROM ce)
            GROUP BY 1
        ),
        ns AS (
            SELECT COUNT(*) AS n_nodes,
                   CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
            FROM deg
        ),
        es AS (SELECT COUNT(*) AS n_edges FROM ce)
        SELECT n_nodes, n_edges, n_triangles, n_wedges,
               ROUND(3.0 * n_triangles / n_wedges, 6) AS global_clustering
        FROM ns, es, tri
    """,
    "q_graph_common_neighbors": f"""
        WITH cp AS (
            SELECT DISTINCT o_custkey AS c, l_partkey AS p
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        pdeg AS (SELECT p, COUNT(*) AS d FROM cp GROUP BY 1),
        capped AS (
            SELECT c, cp.p FROM cp
            JOIN pdeg ON cp.p = pdeg.p AND pdeg.d <= {CN_DEG_CAP}
        ),
        sz AS (SELECT c, COUNT(*) AS n_parts FROM capped GROUP BY 1),
        inter AS (
            SELECT a.c AS ca, b.c AS cb, COUNT(*) AS n_shared
            FROM capped a JOIN capped b ON a.p = b.p AND a.c < b.c
            GROUP BY 1, 2
        )
        SELECT ca AS cust_a, cb AS cust_b, n_shared,
               ROUND(CAST(n_shared AS DOUBLE)
                     / (sa.n_parts + sb.n_parts - n_shared), 6) AS jaccard
        FROM inter
        JOIN sz sa ON ca = sa.c
        JOIN sz sb ON cb = sb.c
        ORDER BY jaccard DESC, cust_a, cust_b
        LIMIT {CN_TOP_K}
    """,
}


from distributed_mapreduce_server_spark.operators.graph import (  # noqa: E402
    BFS_MAX_ROUNDS,
)


def _bfs_sql() -> str:
    """Unrolled BFS rounds (one frontier + one visited CTE per level,
    MATERIALIZED — each is referenced twice downstream and DuckDB
    inlines CTEs per reference site)."""
    steps = [
        "v0 AS MATERIALIZED (SELECT MIN(src) AS node, 0 AS level FROM edges)",
        "f0 AS MATERIALIZED (SELECT node FROM v0)",
    ]
    for i in range(1, BFS_MAX_ROUNDS + 1):
        steps.append(
            f"""f{i} AS MATERIALIZED (
        SELECT DISTINCT e.dst AS node
        FROM edges e JOIN f{i - 1} p ON e.src = p.node
        WHERE e.dst NOT IN (SELECT node FROM v{i - 1})
    )"""
        )
        steps.append(
            f"""v{i} AS MATERIALIZED (
        SELECT node, level FROM v{i - 1}
        UNION ALL
        SELECT node, {i} AS level FROM f{i}
    )"""
        )
    return f"""
    WITH {_EDGES},
    {", ".join(steps)}
    SELECT level, COUNT(*) AS n_nodes,
           MIN(node) AS min_node, MAX(node) AS max_node
    FROM v{BFS_MAX_ROUNDS}
    GROUP BY 1
    ORDER BY 1
"""


GRAPH_ORACLES["q_graph_bfs_levels"] = _bfs_sql()


from distributed_mapreduce_server_spark.operators.graph import AA_TOP_K  # noqa: E402

GRAPH_ORACLES["q_graph_assortativity"] = f"""
    WITH {_EDGES},
    ann AS (
        SELECT CAST(dx.out_deg AS DOUBLE) AS x, CAST(dy.out_deg AS DOUBLE) AS y
        FROM edges e
        JOIN deg dx ON e.src = dx.src
        JOIN deg dy ON e.dst = dy.src
    ),
    m AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM ann
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS assortativity
    FROM m
"""

GRAPH_ORACLES["q_graph_adamic_adar"] = f"""
    WITH cp AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    pdeg AS (SELECT p, COUNT(*) AS d FROM cp GROUP BY 1),
    capped AS (
        SELECT c, cp.p, 1.0 / ln(CAST(d AS DOUBLE)) AS w
        FROM cp JOIN pdeg ON cp.p = pdeg.p AND pdeg.d <= {CN_DEG_CAP}
    ),
    pairs AS (
        SELECT a.c AS ca, b.c AS cb, COUNT(*) AS n_shared,
               ROUND(SUM(a.w), 6) AS aa_score
        FROM capped a JOIN capped b ON a.p = b.p AND a.c < b.c
        GROUP BY 1, 2
    )
    SELECT ca AS cust_a, cb AS cust_b, n_shared, aa_score
    FROM pairs
    ORDER BY aa_score DESC, cust_a, cust_b
    LIMIT {AA_TOP_K}
"""


from distributed_mapreduce_server_spark.operators.graph import PPR_TOP_K  # noqa: E402


# PPR needs the edge frames MATERIALIZED: every unrolled round
# references edges+deg+seed, and DuckDB inlines CTEs per reference
# site — the measured cost of the inlined form was 264 s at sf0.1 vs
# ~2 s materialized (the cross-joined seed + two-key GROUP BY defeats
# the dedup that keeps the global-PageRank oracle fast).
_EDGES_MAT = _EDGES.replace(
    "pairs AS (", "pairs AS MATERIALIZED ("
).replace(
    "edges AS (", "edges AS MATERIALIZED ("
).replace(
    "deg AS (", "deg AS MATERIALIZED ("
)


def _ppr_sql() -> str:
    """Unrolled personalized-PageRank CTEs: teleport mass only at the
    seed (min customer node); per-round ROUND(...,10) as in the
    global PageRank oracle."""
    steps = [
        "seed AS (SELECT MIN(src) AS s FROM edges WHERE src % 2 = 0)",
        """pr0 AS (
        SELECT deg.src AS node,
               CASE WHEN deg.src = seed.s THEN 1.0 ELSE 0.0 END AS pr
        FROM deg, seed
    )""",
    ]
    for i in range(1, PR_ITERATIONS + 1):
        steps.append(
            f"""pr{i} AS (
        SELECT e.dst AS node,
               ROUND(CASE WHEN e.dst = seed.s THEN {PR_BASE} ELSE 0.0 END
                     + {PR_DAMPING} * SUM(p.pr / d.out_deg), 10) AS pr
        FROM edges e
        JOIN pr{i - 1} p ON e.src = p.node
        JOIN deg d ON e.src = d.src, seed
        GROUP BY e.dst, seed.s
    )"""
        )
    return f"""
    WITH {_EDGES_MAT},
    {", ".join(steps)}
    SELECT node AS node_id,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           pr
    FROM pr{PR_ITERATIONS}
    ORDER BY pr DESC, node_id
    LIMIT {PPR_TOP_K}
"""


GRAPH_ORACLES["q_personalized_pagerank"] = _ppr_sql()


GRAPH_ORACLES["q_graph_clustering_coefficient"] = f"""
    WITH {_COPURCHASE},
    tri AS MATERIALIZED (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM ce e1
        JOIN ce e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN ce e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    tn AS (
        SELECT node, COUNT(*) AS t
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT b AS node FROM tri
              UNION ALL SELECT c AS node FROM tri)
        GROUP BY 1
    ),
    deg AS (
        SELECT node, COUNT(*) AS d
        FROM (SELECT u AS node FROM ce UNION ALL SELECT v AS node FROM ce)
        GROUP BY 1
    ),
    per_deg AS (
        SELECT deg.d,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(COALESCE(tn.t, 0)) AS BIGINT) AS sum_t
        FROM deg LEFT JOIN tn USING (node)
        WHERE deg.d >= 2
        GROUP BY deg.d
    )
    -- Exact-integer group ratio (mirrors graph.py): one double
    -- division + one ROUND, no pre-rounded per-node ccs to tie on.
    SELECT d, n_nodes,
           ROUND(sum_t * 2 / CAST(n_nodes * d * (d - 1) AS DOUBLE), 6) AS avg_cc
    FROM per_deg
    ORDER BY d
"""


from distributed_mapreduce_server_spark.operators.graph import (  # noqa: E402
    KCORE_K,
    KCORE_ROUNDS,
)

_COPURCHASE_MAT = _COPURCHASE.replace("ce AS (", "ce AS MATERIALIZED (")


def _kcore_sql() -> str:
    """Unrolled fixed-round k-core peel (mirrors q_graph_kcore_peel):
    round r drops nodes with degree < KCORE_K from the round-(r-1)
    edge frame and restricts edges to survivors. Every CTE is
    MATERIALIZED — each round references the previous twice (degree
    union + edge restriction) and DuckDB inlines per reference site,
    which would make the peel exponential in rounds."""
    steps = ["e0 AS MATERIALIZED (SELECT u, v FROM ce)"]
    for r in range(1, KCORE_ROUNDS + 1):
        steps.append(
            f"""d{r} AS MATERIALIZED (
        SELECT node, COUNT(*) AS d
        FROM (SELECT u AS node FROM e{r - 1}
              UNION ALL SELECT v AS node FROM e{r - 1})
        GROUP BY 1
    )"""
        )
        steps.append(
            f"""k{r} AS MATERIALIZED (
        SELECT node FROM d{r} WHERE d >= {KCORE_K}
    )"""
        )
        steps.append(
            f"""e{r} AS MATERIALIZED (
        SELECT u, v FROM e{r - 1}
        WHERE u IN (SELECT node FROM k{r})
          AND v IN (SELECT node FROM k{r})
    )"""
        )
    rows = " UNION ALL ".join(
        f"""SELECT {r} AS round, {KCORE_K} AS k,
               (SELECT COUNT(*) FROM k{r}) AS n_nodes,
               (SELECT COUNT(*) FROM e{r}) AS n_edges"""
        for r in range(1, KCORE_ROUNDS + 1)
    )
    return f"""
    WITH {_COPURCHASE_MAT},
    {", ".join(steps)}
    SELECT * FROM ({rows})
    ORDER BY round
"""


GRAPH_ORACLES["q_graph_kcore_peel"] = _kcore_sql()


from distributed_mapreduce_server_spark.operators.graph import LPA_ROUNDS  # noqa: E402


def _lpa_sql() -> str:
    """Unrolled synchronous label propagation (mirrors
    q_graph_community_lpa): labels start as node ids over the
    co-purchase graph; per round every node takes its neighbors' most
    frequent label with ties to the smallest (ROW_NUMBER (c DESC,
    lbl ASC) == the Spark window). MATERIALIZED per round — each
    level is referenced by the next round's vote join."""
    steps = [
        """lund AS MATERIALIZED (
        SELECT u AS src, v AS dst FROM ce
        UNION ALL
        SELECT v AS src, u AS dst FROM ce
    )""",
        """lp0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, src AS lbl FROM lund
    )""",
    ]
    for r in range(1, LPA_ROUNDS + 1):
        steps.append(
            f"""lp{r} AS MATERIALIZED (
        SELECT node, lbl FROM (
            SELECT e.src AS node, l.lbl, COUNT(*) AS c,
                   ROW_NUMBER() OVER (PARTITION BY e.src
                       ORDER BY COUNT(*) DESC, l.lbl) AS rk
            FROM lund e JOIN lp{r - 1} l ON e.dst = l.node
            GROUP BY e.src, l.lbl
        ) WHERE rk = 1
    )"""
        )
    return f"""
    WITH {_COPURCHASE_MAT},
    {", ".join(steps)}
    SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM lp{LPA_ROUNDS}
    GROUP BY 1
    ORDER BY 1
"""


GRAPH_ORACLES["q_graph_community_lpa"] = _lpa_sql()
