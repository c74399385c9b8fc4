"""DuckDB oracle SQL, keyed identically to the queries() registry.

Each statement is the ANSI-SQL ground truth for one Spark operator.
Column aliases and rounding MUST match the Spark side exactly — the
driver sorts columns by name and hash-compares values.
"""

RELATIONAL_ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 2) AS avg_qty,
               ROUND(AVG(l_extendedprice), 2) AS avg_price,
               ROUND(AVG(l_discount), 2) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q6_revenue_forecast": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q_customers_no_orders": """
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "q_market_segment_sales": """
        SELECT c_mktsegment,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(DISTINCT o_orderkey) AS order_count,
               COUNT(*) AS lineitem_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q_top_customer_per_nation": """
        WITH spend AS (
            SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spend
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT n_name, c_custkey, c_name, total_spend,
                   ROW_NUMBER() OVER (PARTITION BY n_name
                                      ORDER BY total_spend DESC, c_custkey) AS rnk
            FROM spend
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT n_name, c_custkey, c_name, total_spend
        FROM ranked WHERE rnk = 1
        ORDER BY n_name
    """,
    "q_running_revenue": """
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS order_day,
                   ROUND(SUM(o_totalprice), 2) AS day_revenue
            FROM orders GROUP BY 1
        )
        SELECT order_day, day_revenue,
               ROUND(SUM(day_revenue) OVER (ORDER BY order_day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_revenue
        FROM daily
        ORDER BY order_day
    """,
    "q_moving_avg_events": """
        SELECT event_id, event_type, ts,
               ROUND(value, 2) AS value_r,
               ROUND(AVG(value) OVER w_frame, 4) AS moving_avg,
               ROUND(LAG(value, 1) OVER w, 2) AS prev_value,
               ROUND(LEAD(value, 1) OVER w, 2) AS next_value
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id),
               w_frame AS (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY event_type, ts, event_id
    """,
    "q_nation_rollup": """
        SELECT r_name, n_name,
               COUNT(*) AS customer_count,
               ROUND(SUM(c_acctbal), 2) AS total_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name, n_name
    """,
    "q_percentiles": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS p50_price,
               ROUND(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price,
               ROUND(quantile_cont(l_extendedprice, 0.99), 2) AS p99_price,
               ROUND(AVG(l_extendedprice), 2) AS avg_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q_full_outer_balance": """
        SELECT COALESCE(cb.c_nationkey, sb.s_nationkey) AS nationkey,
               customer_balance, supplier_balance
        FROM (SELECT c_nationkey, ROUND(SUM(c_acctbal), 2) AS customer_balance
              FROM customer GROUP BY c_nationkey) cb
        FULL OUTER JOIN
             (SELECT s_nationkey, ROUND(SUM(s_acctbal), 2) AS supplier_balance
              FROM supplier GROUP BY s_nationkey) sb
        ON cb.c_nationkey = sb.s_nationkey
        ORDER BY nationkey
    """,
    "q7_volume_shipping": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
            OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "q8_market_share": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               ROUND(SUM(CASE WHEN sn.n_name = 'NATION_5'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 2) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
        ORDER BY 1
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity * 0.1), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    "q13_order_count_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
                   ON c_custkey = o.o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q14_promo_revenue": """
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    "q16_supplier_part_variety": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 14, 19, 24)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q17_small_qty_revenue": """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM (
            SELECT l_extendedprice, l_quantity,
                   AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#3'
        )
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        FROM (
            SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING ROUND(SUM(l_quantity), 2) > 120
        )
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q19_disjunctive_filter": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,

    "q_region_cube": """
        SELECT r_name, c_mktsegment,
               COUNT(*) AS n_customers,
               ROUND(AVG(c_acctbal), 2) AS avg_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, c_mktsegment)
        ORDER BY r_name, c_mktsegment
    """,
    "q_salted_skew_join": """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q22_idle_customers": """
        SELECT c_nationkey, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_nationkey < 10
          AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0 AND c_nationkey < 10)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    "q_stats_suite": """
        SELECT l_returnflag,
               ROUND(CORR(l_extendedprice, l_quantity), 4) AS corr_price_qty,
               ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS covar_price_qty,
               ROUND(STDDEV_SAMP(l_extendedprice), 2) AS std_price,
               ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
               ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope_price_on_qty,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS intercept_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q_price_histogram": """
        SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bucket,
               COUNT(*) AS n,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi
        FROM orders
        GROUP BY 1
        ORDER BY 1
    """,
    "q_order_gaps": """
        WITH g AS (
            SELECT o_custkey,
                   date_diff('day',
                             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                    ORDER BY o_orderdate, o_orderkey),
                             o_orderdate) AS gap
            FROM orders
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_gaps,
               ROUND(AVG(gap), 2) AS avg_gap,
               CAST(MAX(gap) AS INTEGER) AS max_gap
        FROM g JOIN customer ON o_custkey = c_custkey
        WHERE gap IS NOT NULL
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q_customer_rfm": """
        WITH pc AS (
            SELECT o_custkey, MAX(o_orderdate) AS last_order,
                   COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
            FROM orders GROUP BY o_custkey
        ),
        a AS (SELECT MAX(o_orderdate) AS anchor FROM orders),
        scored AS (
            SELECT spend,
                   CASE WHEN date_diff('day', last_order, anchor) <= 180 THEN 4
                        WHEN date_diff('day', last_order, anchor) <= 730 THEN 3
                        WHEN date_diff('day', last_order, anchor) <= 1460 THEN 2
                        ELSE 1 END AS r,
                   CASE WHEN n_orders >= 15 THEN 4
                        WHEN n_orders >= 10 THEN 3
                        WHEN n_orders >= 5 THEN 2
                        ELSE 1 END AS f,
                   CASE WHEN spend >= 4000000 THEN 4
                        WHEN spend >= 2500000 THEN 3
                        WHEN spend >= 1000000 THEN 2
                        ELSE 1 END AS m
            FROM pc CROSS JOIN a
        )
        SELECT r, f, m,
               CASE WHEN r + f + m >= 10 THEN 'champion'
                    WHEN r + f + m >= 7 THEN 'loyal'
                    WHEN r + f + m >= 5 THEN 'at_risk'
                    ELSE 'hibernating' END AS segment,
               COUNT(*) AS n_customers,
               ROUND(CAST(SUM(spend) AS DOUBLE), 2) AS total_spend
        FROM scored
        GROUP BY r, f, m
        ORDER BY r, f, m
    """,
    "q_part_pairs": """
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_orders
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, part_a, part_b
        LIMIT 20
    """,
    "q_orders_yoy": """
        WITH yearly AS (
            SELECT c_mktsegment, EXTRACT(year FROM o_orderdate) AS yr,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        )
        SELECT c_mktsegment, CAST(yr AS INTEGER) AS yr,
               CAST(rev AS DOUBLE) AS revenue,
               n_orders,
               ROUND(CAST(rev - LAG(rev) OVER w AS DOUBLE)
                     / CAST(LAG(rev) OVER w AS DOUBLE) * 100, 4) AS yoy_pct
        FROM yearly
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY yr)
        ORDER BY c_mktsegment, yr
    """,
    "q_balance_percentiles": """
        SELECT c_custkey, c_nationkey,
               ROUND(c_acctbal, 2) AS acctbal,
               ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 4) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        ORDER BY c_nationkey, c_custkey
    """,
    # DECIMAL sums are exact in both engines, so the RANGE-frame
    # rolling sum needs no rounding tolerance; DuckDB's native
    # interval frame == Spark's rangeBetween on epoch seconds
    # (monotone key, 30 days = 2592000 s exactly).
    "q_rolling_revenue_30d": """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
                             AND CURRENT ROW) AS DOUBLE)
                   AS rolling_30d_revenue
        FROM orders
        ORDER BY o_orderkey
    """,
}

EVENTS_ORACLES: dict[str, str] = {
    "q_events_sessionize": """
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessioned AS (
            SELECT user_id, event_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               ROUND(SUM(value), 2) AS session_value
        FROM sessioned
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    "q_events_windowed": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value,
               COUNT(DISTINCT user_id) AS distinct_users
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    "q_events_pivot": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q_events_json_extract": """
        SELECT event_type,
               ROUND(AVG(k), 2) AS avg_k,
               MIN(k) AS min_k,
               MAX(k) AS max_k,
               COUNT(k) AS n_with_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        GROUP BY event_type
        ORDER BY event_type
    """,
"q_events_intersect_except": """
        SELECT user_id FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        )
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'error'
        GROUP BY user_id HAVING COUNT(*) > 12
        ORDER BY user_id
    """,
    "q_events_value_deciles": """
        SELECT event_type, decile, COUNT(*) AS n,
               ROUND(MIN(value), 2) AS lo, ROUND(MAX(value), 2) AS hi
        FROM (
            SELECT event_type, value,
                   CAST(NTILE(10) OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS INTEGER) AS decile
            FROM events
        )
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q_events_anomaly": """
        WITH stats AS (
            SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
            FROM events GROUP BY event_type
        )
        SELECT event_id, event_type,
               ROUND(value, 2) AS value_r,
               ROUND((value - mu) / sigma, 2) AS z_score
        FROM events JOIN stats USING (event_type)
        WHERE value > mu + 3 * sigma
        ORDER BY event_id
    """,
    "q_events_funnel": """
        WITH staged AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
            FROM events GROUP BY user_id
        )
        SELECT COUNT(*) AS n_users,
               CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
               CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                             AND first_purchase > first_click
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after_click
        FROM staged
    """,
    "q_events_retention": """
        WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        coh AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id),
        j AS (
            SELECT ud.user_id, cohort_day,
                   date_diff('day', cohort_day, day) AS day_n
            FROM ud JOIN coh USING (user_id)
        )
        SELECT cohort_day,
               COUNT(DISTINCT user_id) AS cohort_size,
               COUNT(DISTINCT CASE WHEN day_n = 1 THEN user_id END) AS d1_retained,
               COUNT(DISTINCT CASE WHEN day_n = 7 THEN user_id END) AS d7_retained
        FROM j GROUP BY cohort_day ORDER BY cohort_day
    """,
    "q_events_dau_wau": """
        WITH daily AS (
            SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
        ),
        dau AS (SELECT d, COUNT(*) AS dau FROM daily GROUP BY d),
        contrib AS (
            SELECT u.dd AS d, user_id
            FROM daily, UNNEST(generate_series(d, d + INTERVAL 6 DAY,
                                               INTERVAL 1 DAY)) AS u(dd)
        ),
        wau AS (
            SELECT c.d, COUNT(DISTINCT user_id) AS wau
            FROM contrib c
            WHERE c.d IN (SELECT d FROM dau)
            GROUP BY c.d
        )
        SELECT dau.d, dau.dau, wau.wau,
               ROUND(dau.dau / CAST(wau.wau AS DOUBLE), 4) AS stickiness
        FROM dau JOIN wau ON dau.d = wau.d
        ORDER BY dau.d
    """,
    "q_events_transitions": """
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        pairs AS (
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        ),
        tot AS (SELECT prev_type, SUM(n) AS tot FROM pairs GROUP BY 1)
        SELECT p.prev_type, p.next_type, p.n,
               ROUND(p.n / CAST(t.tot AS DOUBLE), 4) AS p_next
        FROM pairs p JOIN tot t ON p.prev_type = t.prev_type
        ORDER BY p.prev_type, p.next_type
    """,
}

RELATIONAL_ORACLES["q12_late_shipments"] = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""

RELATIONAL_ORACLES["q21_late_suppliers"] = """
    WITH per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                                   THEN l_suppkey END) AS n_late_supp,
               MIN(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                        THEN l_suppkey END) AS late_supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp >= 2 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""

EVENTS_ORACLES["q_events_paths"] = """
    WITH seq AS (
        SELECT event_type AS e1,
               LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
               LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        FROM events
    )
    SELECT concat(e1, ' > ', e2, ' > ', e3) AS path,
           COUNT(*) AS n_journeys
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n_journeys DESC, path
    LIMIT 20
"""

RELATIONAL_ORACLES["q2_min_cost_supplier"] = """
    WITH costs AS (
        SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name,
               MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
         AND p.p_type = 'ECONOMY' AND p.p_size < 15
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        GROUP BY 1, 2, 3, 4, 5
    ),
    mins AS (
        SELECT *, MIN(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
        FROM costs
    )
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(unit_cost, 2) AS unit_cost
    FROM mins
    WHERE unit_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""

RELATIONAL_ORACLES["q11_important_parts"] = """
    WITH per_part AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS value_dec
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
        GROUP BY 1
    ),
    tot AS (SELECT SUM(value_dec) AS total_dec FROM per_part)
    SELECT l_partkey AS p_partkey,
           ROUND(CAST(value_dec AS DOUBLE), 2) AS part_value
    FROM per_part, tot
    WHERE CAST(value_dec AS DOUBLE) > 0.0005 * CAST(total_dec AS DOUBLE)
    ORDER BY part_value DESC, p_partkey
"""

RELATIONAL_ORACLES["q20_promo_suppliers"] = """
    WITH qty AS (
        SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS q
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT *, SUM(q) OVER (PARTITION BY l_partkey) AS part_q,
               COUNT(*) OVER (PARTITION BY l_partkey) AS n_supp
        FROM qty
    )
    SELECT s_name, n_name, COUNT(*) AS n_parts_dominated
    FROM tot
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_supp >= 2 AND q > 0.5 * part_q
    GROUP BY 1, 2
    ORDER BY n_parts_dominated DESC, s_name
"""

EVENTS_ORACLES["q_events_latest_per_key"] = """
    SELECT user_id, event_type,
           latest_event_id, latest_ts, latest_value
    FROM (
        SELECT user_id, event_type, event_id AS latest_event_id,
               ts AS latest_ts, ROUND(value, 2) AS latest_value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id, event_type
"""

EVENTS_ORACLES["q_time_bucket_gapfill"] = """
    WITH agg AS (
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sum_v,
               ROUND(AVG(value), 4) AS avg_v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    grid AS (
        SELECT t.event_type,
               unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
        FROM (SELECT DISTINCT event_type FROM events) t, bounds b
    ),
    filled AS (
        SELECT grid.event_type, grid.bucket,
               COALESCE(agg.n, 0) AS n_events,
               COALESCE(agg.sum_v, 0.0) AS total_value,
               agg.avg_v
        FROM grid LEFT JOIN agg
          ON grid.bucket = agg.bucket AND grid.event_type = agg.event_type
    )
    SELECT event_type, bucket, n_events, total_value,
           LAST_VALUE(avg_v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS locf_avg_value
    FROM filled
    ORDER BY event_type, bucket
"""

EVENTS_ORACLES["q_events_scd2"] = """
    WITH changes AS (
        SELECT user_id, ts, event_id, event_type
        FROM (
            SELECT user_id, ts, event_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        )
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, version
"""

from distributed_mapreduce_server_spark.operators.events import (  # noqa: E402
    SNAPSHOT_LAG_DAYS as _SNAP_LAG,
)

EVENTS_ORACLES["q_snapshot_diff"] = f"""
    WITH cut AS (SELECT MAX(ts) - INTERVAL {_SNAP_LAG} DAY AS cutoff
                 FROM events),
    ranked AS (
        SELECT user_id, event_type, event_id, ts,
               CASE WHEN ts < cutoff THEN 1 ELSE 0 END AS is_pre,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY (CASE WHEN ts < cutoff THEN 1
                                            ELSE 0 END) DESC,
                                           ts DESC, event_id DESC) AS rn_pre
        FROM events, cut
    ),
    cur AS (SELECT user_id, event_type, event_id AS current_event_id
            FROM ranked WHERE rn = 1),
    prev AS (SELECT user_id, event_type, event_id AS prev_event_id
             FROM ranked WHERE rn_pre = 1 AND is_pre = 1)
    SELECT cur.user_id, cur.event_type, current_event_id, prev_event_id,
           CASE WHEN prev_event_id IS NULL THEN 'added'
                WHEN prev_event_id <> current_event_id THEN 'updated'
                ELSE 'unchanged' END AS change_type
    FROM cur LEFT JOIN prev
      ON cur.user_id = prev.user_id AND cur.event_type = prev.event_type
    ORDER BY cur.user_id, cur.event_type
"""

RELATIONAL_ORACLES["q_data_quality_audit"] = """
    WITH li AS (
        SELECT COUNT(*) AS n,
               AVG(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS null_ok,
               SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                        THEN 1 ELSE 0 END) AS bad_disc,
               SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS bad_qty
        FROM lineitem
    ),
    o AS (
        SELECT COUNT(*) AS n,
               AVG(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_ck,
               SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS bad_price,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_pk
        FROM orders
    ),
    c AS (
        SELECT COUNT(*) AS n,
               COUNT(*) - COUNT(DISTINCT c_custkey) AS dup_pk
        FROM customer
    ),
    orphli AS (SELECT COUNT(*) AS v FROM lineitem
               WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
    orpho AS (SELECT COUNT(*) AS v FROM orders
              WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
    SELECT "check", CAST(value AS DOUBLE) AS value FROM (
        SELECT 'lineitem.row_count' AS "check", n AS value FROM li
        UNION ALL SELECT 'lineitem.null_frac.l_orderkey', null_ok FROM li
        UNION ALL SELECT 'lineitem.range_violations.l_discount', bad_disc FROM li
        UNION ALL SELECT 'lineitem.range_violations.l_quantity', bad_qty FROM li
        UNION ALL SELECT 'orders.row_count', n FROM o
        UNION ALL SELECT 'orders.null_frac.o_custkey', null_ck FROM o
        UNION ALL SELECT 'orders.range_violations.o_totalprice', bad_price FROM o
        UNION ALL SELECT 'orders.duplicate_pk', dup_pk FROM o
        UNION ALL SELECT 'customer.row_count', n FROM c
        UNION ALL SELECT 'customer.duplicate_pk', dup_pk FROM c
        UNION ALL SELECT 'lineitem.orphans_vs_orders', v FROM orphli
        UNION ALL SELECT 'orders.orphans_vs_customer', v FROM orpho
    )
    ORDER BY "check"
"""

EVENTS_ORACLES["q_events_theta_setops"] = """
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT COUNT(*) FROM c) AS n_clickers,
           (SELECT COUNT(*) FROM p) AS n_purchasers,
           (SELECT COUNT(*) FROM c WHERE user_id IN (SELECT user_id FROM p))
               AS n_both,
           (SELECT COUNT(*) FROM (SELECT user_id FROM c
                                  UNION SELECT user_id FROM p))
               AS n_either,
           (SELECT COUNT(*) FROM c
            WHERE user_id NOT IN (SELECT user_id FROM p)) AS n_click_only
"""

EVENTS_ORACLES["q_events_approx_topk"] = """
    SELECT user_id, n AS est_count
    FROM (
        SELECT user_id, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rk
        FROM events GROUP BY user_id
    )
    WHERE rk <= 4
    ORDER BY est_count DESC, user_id
"""

EVENTS_ORACLES["q_shuffle_key_skew"] = """
    WITH per_key AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    stats AS (
        SELECT COUNT(*) AS n_keys, SUM(n) AS total_rows,
               ROUND(quantile_cont(n, 0.5), 4) AS p50_n,
               ROUND(quantile_cont(n, 0.99), 4) AS p99_n,
               ROUND(quantile_cont(n, 0.99) / quantile_cont(n, 0.5), 4)
                   AS skew_ratio
        FROM per_key
    )
    SELECT rank, user_id, n,
           ROUND(CAST(n AS DOUBLE) / total_rows, 6) AS share,
           n_keys, p50_n, p99_n, skew_ratio
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rank
        FROM per_key
    ), stats
    WHERE rank <= 10
    ORDER BY rank
"""


# --- round 4: EWMA smoothing + last-touch attribution ---------------------

RELATIONAL_ORACLES["q_ewma_revenue"] = """
    WITH RECURSIVE rev AS (
        SELECT n_name, date_trunc('month', o_orderdate) AS month,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    seq AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY month) AS rn
        FROM rev
    ),
    ew AS (
        SELECT n_name, month, revenue, rn, revenue AS ewma
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.n_name, s.month, s.revenue, s.rn,
               0.3 * s.revenue + 0.7 * e.ewma
        FROM seq s JOIN ew e ON s.n_name = e.n_name AND s.rn = e.rn + 1
    )
    SELECT n_name, month, revenue, ROUND(ewma, 6) AS ewma
    FROM ew
    ORDER BY n_name, month
"""

from distributed_mapreduce_server_spark.operators.events import (  # noqa: E402
    ATTRIBUTION_TOUCHES,
    ATTRIBUTION_WINDOW_H,
)

_TOUCH_LIST = ", ".join(f"'{t}'" for t in ATTRIBUTION_TOUCHES)

EVENTS_ORACLES["q_events_attribution"] = f"""
    WITH touched AS (
        SELECT user_id, ts, event_type, value,
               LAST_VALUE(CASE WHEN event_type IN ({_TOUCH_LIST})
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type,
               LAST_VALUE(CASE WHEN event_type IN ({_TOUCH_LIST})
                               THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ts
        FROM events
    )
    SELECT CASE WHEN lt_ts >= ts - INTERVAL {ATTRIBUTION_WINDOW_H} HOURS
                THEN lt_type ELSE 'direct' END AS channel,
           COUNT(*) AS n_purchases,
           ROUND(SUM(value), 2) AS attributed_value
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY 1
"""

RELATIONAL_ORACLES["q_grouping_sets"] = """
    SELECT n_name, o_orderpriority,
           CAST(GROUPING(n_name, o_orderpriority) AS INTEGER) AS gid,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority), ())
    ORDER BY gid, n_name, o_orderpriority
"""

RELATIONAL_ORACLES["q_window_suite"] = """
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER wf AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER wf AS second_price,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, rn
"""

RELATIONAL_ORACLES["q_unpivot_balance"] = """
    WITH cust AS (
        SELECT c_nationkey, ROUND(SUM(c_acctbal), 2) AS cust_balance,
               CAST(COUNT(*) AS DOUBLE) AS n_customers
        FROM customer GROUP BY 1
    ),
    supp AS (
        SELECT s_nationkey, ROUND(SUM(s_acctbal), 2) AS supp_balance,
               CAST(COUNT(*) AS DOUBLE) AS n_suppliers
        FROM supplier GROUP BY 1
    ),
    wide AS (
        SELECT n_name, cust_balance, n_customers, supp_balance, n_suppliers
        FROM nation
        LEFT JOIN cust ON n_nationkey = c_nationkey
        LEFT JOIN supp ON n_nationkey = s_nationkey
    )
    SELECT n_name, metric, value FROM (
        SELECT n_name, 'cust_balance' AS metric, cust_balance AS value FROM wide
        UNION ALL SELECT n_name, 'n_customers', n_customers FROM wide
        UNION ALL SELECT n_name, 'supp_balance', supp_balance FROM wide
        UNION ALL SELECT n_name, 'n_suppliers', n_suppliers FROM wide
    )
    ORDER BY n_name, metric
"""

EVENTS_ORACLES["q_events_cohort_ltv"] = """
    WITH first_week AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY 1
    ),
    purchases AS (
        SELECT user_id, date_trunc('week', ts) AS ev_week, value
        FROM events WHERE event_type = 'purchase'
    ),
    matrix AS (
        SELECT cohort_week,
               CAST(FLOOR((epoch(ev_week) - epoch(cohort_week)) / 604800) AS INTEGER)
                   AS age_weeks,
               COUNT(DISTINCT p.user_id) AS n_buyers,
               ROUND(SUM(value), 2) AS week_revenue
        FROM purchases p JOIN first_week f ON p.user_id = f.user_id
        GROUP BY 1, 2
    )
    SELECT cohort_week, age_weeks, n_buyers, week_revenue,
           ROUND(SUM(week_revenue) OVER (PARTITION BY cohort_week
                 ORDER BY age_weeks), 2) AS cum_ltv
    FROM matrix
    ORDER BY cohort_week, age_weeks
"""


# the SQL-interface oracles ARE the Spark query texts — one string,
# two engines (the front door's whole point).
from distributed_mapreduce_server_spark.operators.relational import (  # noqa: E402
    SQL_FRONT_DOOR,
    SQL_INTERFACE_QUERY,
)

RELATIONAL_ORACLES["q_sql_interface"] = SQL_INTERFACE_QUERY
RELATIONAL_ORACLES.update(SQL_FRONT_DOOR)

# q_sketch_error_bounds: the booleans are Spark-side live sketch-vs-
# exact checks pinned TRUE (a broken sketch hash-mismatches); the
# exact values are genuinely recomputed here. quantile_cont matches
# Spark's exact `percentile` linear interpolation.
RELATIONAL_ORACLES["q_sketch_error_bounds"] = """
    SELECT 'distinct_custkey_orders' AS check_name,
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS DOUBLE)
               AS exact_value,
           TRUE AS within_bound, 0.15 AS rel_bound
    UNION ALL
    SELECT 'distinct_users_events',
           CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS DOUBLE),
           TRUE, 0.15
    UNION ALL
    SELECT 'median_extendedprice',
           (SELECT ROUND(quantile_cont(l_extendedprice, 0.5), 2) FROM lineitem),
           TRUE, 0.01
    ORDER BY check_name
"""


EVENTS_ORACLES["q_scd2_pit_join"] = """
    WITH changes AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events WHERE event_type <> 'purchase'
    ),
    dim AS (
        SELECT user_id AS d_user,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
               event_type AS state,
               ts AS valid_from,
               LEAD(ts) OVER w AS valid_to
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT f.event_id AS purchase_id, f.user_id, f.ts,
           ROUND(f.value, 2) AS value,
           d.state AS state_at_purchase,
           d.version AS state_version
    FROM events f
    LEFT JOIN dim d
      ON f.user_id = d.d_user
     AND d.valid_from <= f.ts
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    WHERE f.event_type = 'purchase'
    ORDER BY purchase_id
"""

# Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6.
EVENTS_ORACLES["q_events_heatmap"] = """
    SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           CAST(hour(ts) AS INTEGER) AS hod,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

from distributed_mapreduce_server_spark.operators.relational import (  # noqa: E402
    MIN_PAIR_SUPPORT,
    RULES_TOP_K,
)

RELATIONAL_ORACLES["q_association_rules"] = f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_total FROM li),
    item AS (SELECT l_partkey, COUNT(*) AS n_item FROM li GROUP BY 1),
    b AS (SELECT l_orderkey, list(l_partkey) AS parts FROM li GROUP BY 1),
    p AS (
        SELECT a AS part_a, b2 AS part_b, COUNT(*) AS n_ab
        FROM (SELECT unnest(parts) AS a, parts FROM b), unnest(parts) AS t(b2)
        WHERE a < b2
        GROUP BY 1, 2
        HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
    ),
    d AS (
        SELECT part_a AS antecedent, part_b AS consequent, n_ab FROM p
        UNION ALL
        SELECT part_b, part_a, n_ab FROM p
    )
    SELECT antecedent, consequent, n_ab,
           ROUND(n_ab / ia.n_item, 4) AS confidence,
           ROUND((n_ab * n.n_total) / (ia.n_item * ic.n_item), 4) AS lift
    FROM d
    JOIN item ia ON antecedent = ia.l_partkey
    JOIN item ic ON consequent = ic.l_partkey
    CROSS JOIN n
    ORDER BY lift DESC, antecedent, consequent
    LIMIT {RULES_TOP_K}
"""


EVENTS_ORACLES["q_time_weighted_avg"] = """
    WITH timed AS (
        SELECT user_id, value,
               epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   // 1000000
                   - epoch_us(ts) // 1000000 AS dur_sec
        FROM events
    )
    SELECT user_id, COUNT(*) AS n_intervals,
           CAST(SUM(dur_sec) AS BIGINT) AS span_sec,
           ROUND(SUM(value * dur_sec) / SUM(dur_sec), 4) AS time_weighted_avg
    FROM timed
    WHERE dur_sec IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
"""


# brute-force dominance — deliberately a DIFFERENT formulation than
# the Spark window algorithm, so parity validates the algorithm.
RELATIONAL_ORACLES["q_skyline_parts"] = """
    SELECT a.p_partkey, ROUND(a.p_retailprice, 2) AS price, a.p_size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_partkey <> a.p_partkey
          AND b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    ORDER BY a.p_partkey
"""


from distributed_mapreduce_server_spark.operators.events import (  # noqa: E402
    FUNNEL_WINDOW_H,
)

EVENTS_ORACLES["q_window_funnel"] = f"""
    WITH w1 AS (
        SELECT user_id, ts, event_id, event_type,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np_ts
        FROM events
    ),
    w2 AS (
        SELECT user_id, ts, event_type,
               FIRST_VALUE(CASE WHEN event_type = 'click'
                                THEN {{'cts': ts, 'np': np_ts}} END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc
        FROM w1
    ),
    views AS (
        SELECT user_id,
               CASE WHEN nc IS NOT NULL AND nc.cts <= ts + INTERVAL {FUNNEL_WINDOW_H} HOURS
                         AND nc.np IS NOT NULL
                         AND nc.np <= ts + INTERVAL {FUNNEL_WINDOW_H} HOURS THEN 3
                    WHEN nc IS NOT NULL AND nc.cts <= ts + INTERVAL {FUNNEL_WINDOW_H} HOURS THEN 2
                    ELSE 1 END AS level
        FROM w2 WHERE event_type = 'view'
    ),
    per_user AS (SELECT user_id, MAX(level) AS max_level FROM views GROUP BY 1),
    leveled AS (
        SELECT CAST(COALESCE(p.max_level, 0) AS INTEGER) AS max_level
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN per_user p USING (user_id)
    )
    SELECT max_level, COUNT(*) AS n_users
    FROM leveled
    GROUP BY 1
    ORDER BY 1
"""


# arg_max with a composite (value, tiebreak) ordering via the
# MAX(struct) idiom — DuckDB's arg_max lacks struct-typed orderings,
# but struct MAX compares field-by-field, which is exactly Spark's
# max_by(x, struct(v, x)) with a unique tiebreak.
RELATIONAL_ORACLES["q_argmax_suite"] = """
    WITH best AS (
        SELECT o_custkey,
               (MAX({'v': o_totalprice, 'id': o_orderkey})).id AS best_order,
               ROUND(MAX(o_totalprice), 2) AS best_order_price
        FROM orders GROUP BY 1
    ),
    cust AS (
        SELECT n_name, c_custkey, c_acctbal, best_order, best_order_price
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        LEFT JOIN best ON c_custkey = o_custkey
    )
    SELECT n_name,
           (MAX({'v': c_acctbal, 'id': c_custkey})).id AS richest_customer,
           ROUND(MAX(c_acctbal), 2) AS max_balance,
           (MIN({'v': c_acctbal, 'id': c_custkey})).id AS poorest_customer,
           ROUND(MIN(c_acctbal), 2) AS min_balance,
           (MAX({'v': COALESCE(best_order_price, -1.0),
                 'id': COALESCE(best_order, -1)})).id AS top_order_key
    FROM cust
    GROUP BY 1
    ORDER BY 1
"""

from distributed_mapreduce_server_spark.operators.relational import (  # noqa: E402
    ABC_A_CUT,
    ABC_B_CUT,
)

RELATIONAL_ORACLES["q_abc_analysis"] = f"""
    WITH rev AS (
        SELECT l_partkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev
        FROM lineitem GROUP BY 1
    ),
    total AS (SELECT SUM(rev) AS total_rev FROM rev),
    classed AS (
        SELECT rev, total_rev,
               ROUND(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     / total_rev, 10) AS cum_share
        FROM rev CROSS JOIN total
    )
    SELECT CASE WHEN cum_share <= {ABC_A_CUT} THEN 'A'
                WHEN cum_share <= {ABC_B_CUT} THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           ROUND(SUM(rev), 2) AS class_revenue,
           ROUND(SUM(rev) / MAX(total_rev), 4) AS revenue_share
    FROM classed
    GROUP BY 1
    ORDER BY 1
"""


EVENTS_ORACLES["q_new_vs_returning"] = """
    WITH user_days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    flagged AS (
        SELECT day,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) = 1
                    AS BIGINT) AS is_new
        FROM user_days
    ),
    daily AS (
        SELECT day, SUM(is_new) AS new_users,
               SUM(1 - is_new) AS returning_users
        FROM flagged GROUP BY 1
    )
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(returning_users AS BIGINT) AS returning_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_distinct_users
    FROM daily
    ORDER BY day
"""

RELATIONAL_ORACLES["q_seasonality_index"] = """
    WITH monthly AS (
        SELECT CAST(month(o_orderdate) AS INTEGER) AS mon,
               COUNT(*) AS n_orders, SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    )
    SELECT mon, n_orders,
           ROUND(rev / n_orders, 2) AS avg_order_value,
           ROUND((rev / n_orders)
                 / (SUM(rev) OVER () / SUM(n_orders) OVER ()), 4)
               AS seasonality_index
    FROM monthly
    ORDER BY mon
"""


# brute interval-stabbing — an independent formulation from the
# operator's sweep-line algebra, so parity validates the algorithm.
RELATIONAL_ORACLES["q_open_order_backlog"] = """
    WITH li AS (
        SELECT o_orderdate, l_shipdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate
    ),
    b AS (
        SELECT date_trunc('month', min(o_orderdate)) AS lo,
               date_trunc('month', max(l_shipdate)) AS hi
        FROM li
    ),
    grid AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month FROM b
    )
    SELECT g.month,
           (SELECT COUNT(*) FROM li
            WHERE o_orderdate <= g.month
              AND o_orderdate > g.month - INTERVAL 1 MONTH) AS n_start,
           (SELECT COUNT(*) FROM li
            WHERE l_shipdate <= g.month
              AND l_shipdate > g.month - INTERVAL 1 MONTH) AS n_end,
           (SELECT COUNT(*) FROM li
            WHERE o_orderdate <= g.month AND l_shipdate > g.month) AS open_lineitems
    FROM grid g
    ORDER BY month
"""

# sweep-line peak concurrency: composed from the sessionize oracle
# (referenced twice by the delta union -> MATERIALIZED; same for the
# sweep, read by both the day agg and the carry-in join). Boundary
# order = (ts, delta DESC, user, seq): starts before ends at ties,
# mirroring the operator exactly.
EVENTS_ORACLES["q_concurrent_sessions"] = f"""
    WITH sess AS MATERIALIZED (
{EVENTS_ORACLES["q_events_sessionize"]}
    ),
    deltas AS (
        SELECT session_start AS ts, 1.0 AS delta, user_id, session_seq FROM sess
        UNION ALL
        SELECT session_end AS ts, -1.0 AS delta, user_id, session_seq FROM sess
    ),
    sweep AS MATERIALIZED (
        SELECT ts, delta,
               ROW_NUMBER() OVER (ORDER BY ts, delta DESC, user_id, session_seq) AS rn,
               SUM(delta) OVER (ORDER BY ts, delta DESC, user_id, session_seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM deltas
    ),
    agg AS (
        SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_boundaries,
               MAX(cum) AS mx, MIN(rn) AS rn0
        FROM sweep GROUP BY 1
    )
    SELECT a.day, CAST(a.n_boundaries AS BIGINT) AS n_boundaries,
           CAST(GREATEST(a.mx, s.cum - s.delta) AS INTEGER) AS max_concurrent
    FROM agg a JOIN sweep s ON s.rn = a.rn0
    ORDER BY a.day
"""

from distributed_mapreduce_server_spark.operators.events import (  # noqa: E402
    LATENESS_JITTER_MAX_S,
    LATENESS_JITTER_SEED,
)

EVENTS_ORACLES["q_events_lateness"] = f"""
    WITH arr AS (
        SELECT event_id, event_type, ts,
               epoch_us(ts)
               + (CAST(concat('0x', substr(md5(concat('{LATENESS_JITTER_SEED}|',
                       CAST(event_id AS VARCHAR))), 1, 15)) AS BIGINT)
                  % {LATENESS_JITTER_MAX_S}) * 1000000 AS arrival_us
        FROM events
    ),
    wm AS (
        SELECT event_type, ts,
               MAX(ts) OVER (ORDER BY arrival_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS frontier
        FROM arr
    ),
    lat AS (
        SELECT event_type,
               (epoch_us(frontier) - epoch_us(ts)) / 1000000.0 AS late_s
        FROM wm
    )
    SELECT event_type,
           CASE WHEN late_s <= 0 THEN '0_frontier'
                WHEN late_s <= 60 THEN '1_le_1m'
                WHEN late_s <= 300 THEN '2_le_5m'
                WHEN late_s <= 600 THEN '3_le_10m'
                ELSE '4_gt_10m' END AS lateness_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(MAX(late_s), 3) AS max_late_s
    FROM lat
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

# cascaded rollup: each level re-aggregates the previous level's
# partials with per-level 2 dp re-rounding (mirrors the operator's
# cascade exactly). minute is referenced by hour AND the final union
# -> MATERIALIZED (DuckDB inlines CTEs per reference site). DuckDB
# SUM(BIGINT) -> HUGEINT, so every rolled-up count is re-CAST.
EVENTS_ORACLES["q_events_hierarchical_rollup"] = """
    WITH minute AS MATERIALIZED (
        SELECT date_trunc('minute', ts) AS bucket_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1
    ),
    hour AS MATERIALIZED (
        SELECT date_trunc('hour', bucket_start) AS bucket_start,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               ROUND(SUM(total_value), 2) AS total_value
        FROM minute GROUP BY 1
    ),
    day AS (
        SELECT date_trunc('day', bucket_start) AS bucket_start,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               ROUND(SUM(total_value), 2) AS total_value
        FROM hour GROUP BY 1
    )
    SELECT '1_minute' AS level, bucket_start, n_events, total_value FROM minute
    UNION ALL
    SELECT '2_hour' AS level, bucket_start, n_events, total_value FROM hour
    UNION ALL
    SELECT '3_day' AS level, bucket_start, n_events, total_value FROM day
    ORDER BY level, bucket_start
"""

# A/B readout: same seeded md5 assignment, same per-user aggregation,
# same z-score expression tree — integer inputs, 6 dp rounding.
from distributed_mapreduce_server_spark.operators.events import (  # noqa: E402
    AB_CONV_MIN_PURCHASES,
    AB_SEED,
)

EVENTS_ORACLES["q_events_ab_test"] = f"""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                         >= {AB_CONV_MIN_PURCHASES} THEN 1 ELSE 0 END AS converted,
               ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
                   AS purchase_value
        FROM events GROUP BY 1
    ),
    tagged AS (
        SELECT *,
               CASE WHEN CAST(concat('0x', substr(md5(concat('{AB_SEED}|',
                        CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 2 = 0
                    THEN 'A' ELSE 'B' END AS variant
        FROM per_user
    ),
    agg AS (
        SELECT CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b,
               ROUND(SUM(CASE WHEN variant = 'A' THEN purchase_value ELSE 0.0 END), 2) AS rev_a,
               ROUND(SUM(CASE WHEN variant = 'B' THEN purchase_value ELSE 0.0 END), 2) AS rev_b
        FROM tagged
    )
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(conv_a / n_a, 6) AS rate_a,
           ROUND(conv_b / n_b, 6) AS rate_b,
           ROUND(conv_a / n_a - conv_b / n_b, 6) AS lift,
           CASE WHEN (conv_a + conv_b) / (n_a + n_b) > 0
                     AND (conv_a + conv_b) / (n_a + n_b) < 1
                THEN ROUND((conv_a / n_a - conv_b / n_b)
                     / sqrt(((conv_a + conv_b) / (n_a + n_b))
                            * (1.0 - (conv_a + conv_b) / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 6)
           END AS z_score,
           rev_a, rev_b
    FROM agg
"""


# stationary distribution: unrolled power-iteration CTEs (one per
# round, like the PageRank oracle) with per-round ROUND(...,10); the
# transition-probability frame is MATERIALIZED because every round
# references it (DuckDB inlines CTEs per reference site).
from distributed_mapreduce_server_spark.operators.events import MARKOV_ROUNDS  # noqa: E402


def _markov_stationary_sql() -> str:
    steps = ["pi0 AS (SELECT t, 1.0 / k AS pi FROM types, k)"]
    for i in range(1, MARKOV_ROUNDS + 1):
        steps.append(
            f"""pi{i} AS (
        SELECT p.next_type AS t, ROUND(SUM(pi{i - 1}.pi * p.p), 10) AS pi
        FROM p JOIN pi{i - 1} ON p.prev_type = pi{i - 1}.t
        GROUP BY 1
    )"""
        )
    return f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    pairs AS MATERIALIZED (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (SELECT prev_type, SUM(n) AS tot FROM pairs GROUP BY 1),
    p AS MATERIALIZED (
        SELECT pairs.prev_type, next_type, n / CAST(tot AS DOUBLE) AS p
        FROM pairs JOIN tot ON pairs.prev_type = tot.prev_type
    ),
    types AS MATERIALIZED (
        SELECT prev_type AS t FROM pairs
        UNION
        SELECT next_type AS t FROM pairs
    ),
    k AS (SELECT COUNT(*) AS k FROM types),
    {", ".join(steps)},
    emp AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
    te AS (SELECT SUM(n) AS s FROM emp)
    -- LEFT JOIN from types: a type that appears in pairs but never as
    -- a next_type drops out of pi1..piN (no incoming transitions), yet
    -- the Spark side keeps it with pi = 0.0 (the driver dict iterates
    -- all types) — COALESCE mirrors that instead of dropping the row.
    SELECT tt.t AS event_type,
           COALESCE(pi{MARKOV_ROUNDS}.pi, 0.0) AS pi,
           ROUND(COALESCE(emp.n, 0) / CAST(te.s AS DOUBLE), 10) AS emp_share,
           ROUND(ABS(COALESCE(pi{MARKOV_ROUNDS}.pi, 0.0)
                     - ROUND(COALESCE(emp.n, 0) / CAST(te.s AS DOUBLE), 10)),
                 10) AS gap
    FROM types tt
    LEFT JOIN pi{MARKOV_ROUNDS} ON tt.t = pi{MARKOV_ROUNDS}.t
    LEFT JOIN emp ON emp.event_type = tt.t, te
    ORDER BY tt.t
"""


EVENTS_ORACLES["q_events_markov_stationary"] = _markov_stationary_sql()

# grouped OLS trend: identical moments formula tree per event_type.
EVENTS_ORACLES["q_events_trend_fit"] = """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    anchor AS (SELECT MIN(day) AS day0 FROM daily),
    xy AS (
        SELECT event_type,
               CAST(date_diff('day', day0, day) AS DOUBLE) AS x,
               CAST(n AS DOUBLE) AS y
        FROM daily, anchor
    ),
    m AS (
        SELECT event_type,
               COUNT(*) AS n_days, MAX(x) AS xmax,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM xy GROUP BY 1
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           ROUND((n_days * sxy - sx * sy) / (n_days * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n_days * sxy - sx * sy) / (n_days * sxx - sx * sx)) * sx)
                 / n_days, 6) AS intercept,
           ROUND((n_days * sxy - sx * sy) * (n_days * sxy - sx * sy)
                 / ((n_days * sxx - sx * sx) * (n_days * syy - sy * sy)), 6) AS r2,
           ROUND((sy - ((n_days * sxy - sx * sy) / (n_days * sxx - sx * sx)) * sx)
                 / n_days
                 + ((n_days * sxy - sx * sy) / (n_days * sxx - sx * sx)) * (xmax + 1),
                 6) AS forecast_next
    FROM m
    ORDER BY event_type
"""

# IVM delta: the oracle takes the FULL join and keeps pairs touching a
# new row, tagging which side(s) are new — exactly the set the
# operator assembles from the three delta-sided joins (the bilinear
# IVM identity; the parity check IS the identity proof, executed).
from distributed_mapreduce_server_spark.operators.events import IVM_OLD_FRACTION  # noqa: E402

_IVM_NUM, _IVM_DEN = IVM_OLD_FRACTION
EVENTS_ORACLES["q_ivm_join_delta"] = f"""
    WITH cut AS (
        SELECT CAST(FLOOR(((MAX(event_id) + 1) * {_IVM_NUM}) / {_IVM_DEN}) AS BIGINT)
               AS cutoff
        FROM events
    ),
    c AS (
        SELECT user_id, event_id AS click_id, ts AS cts,
               event_id >= cutoff AS cn
        FROM events, cut WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id, event_id AS purchase_id, ts AS pts,
               event_id >= cutoff AS pn
        FROM events, cut WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT c.user_id, click_id, purchase_id,
               CAST(date_diff('second', cts, pts) AS BIGINT) AS delay_sec,
               cn, pn
        FROM c JOIN p ON c.user_id = p.user_id
         AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
    )
    SELECT user_id, click_id, purchase_id, delay_sec,
           CASE WHEN cn AND pn THEN 'new_new'
                WHEN cn THEN 'new_old'
                ELSE 'old_new' END AS delta_term
    FROM j
    WHERE cn OR pn
    ORDER BY user_id, click_id, purchase_id
"""


# bounce rate: composed from the sessionize oracle (MATERIALIZED —
# q_concurrent_sessions precedent), identical expressions.
EVENTS_ORACLES["q_sessions_bounce_rate"] = f"""
    WITH sess AS MATERIALIZED (
{EVENTS_ORACLES["q_events_sessionize"]}
    )
    SELECT date_trunc('day', session_start) AS day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) / COUNT(*), 6)
               AS bounce_rate,
           ROUND(AVG(n_events), 4) AS avg_session_events
    FROM sess
    GROUP BY 1
    ORDER BY 1
"""


# interval-overlap join: the oracle runs the naive inequality
# self-join (DuckDB IEJoin) over the SAME composed sessions; the
# operator's grid-bucketed candidates must verify to the identical
# pair set. Durations in exact integer microseconds.
EVENTS_ORACLES["q_session_overlap_join"] = f"""
    WITH sess AS MATERIALIZED (
{EVENTS_ORACLES["q_events_sessionize"]}
    ),
    pairs AS (
        SELECT a.session_start AS sta, a.session_end AS ena,
               b.session_start AS stb, b.session_end AS enb
        FROM sess a JOIN sess b
          ON a.user_id < b.user_id
         AND a.session_start <= b.session_end
         AND b.session_start <= a.session_end
    )
    SELECT date_trunc('day', greatest(sta, stb)) AS day,
           COUNT(*) AS n_overlapping_pairs,
           CAST(SUM(least(epoch_us(ena), epoch_us(enb))
                    - greatest(epoch_us(sta), epoch_us(stb))) AS BIGINT)
               AS total_overlap_us
    FROM pairs
    GROUP BY 1
    ORDER BY 1
"""


# join-size audit: identical count-product-sum per audited join.
def _join_audit_term(name: str, left: str, lk: str, right: str, rk: str) -> str:
    return f"""
    SELECT '{name}' AS join_name,
           CAST(SUM(ca * cb) AS BIGINT) AS n_join_rows,
           CAST(COUNT(*) AS BIGINT) AS n_matched_keys,
           CAST(MAX(ca * cb) AS BIGINT) AS max_key_fanout,
           ROUND(MAX(ca * cb) / (SUM(ca * cb) / COUNT(*)), 4) AS skew_ratio
    FROM (SELECT {lk} AS k, COUNT(*) AS ca FROM {left} GROUP BY 1) a
    JOIN (SELECT {rk} AS k, COUNT(*) AS cb FROM {right} GROUP BY 1) b USING (k)
"""


RELATIONAL_ORACLES["q_join_size_audit"] = " UNION ALL ".join(
    [
        _join_audit_term("orders_x_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
        _join_audit_term("customer_x_orders", "customer", "c_custkey", "orders", "o_custkey"),
        _join_audit_term("part_x_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
    ]
) + " ORDER BY join_name"


EVENTS_ORACLES["q_cohort_retention_matrix"] = """
    WITH user_days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(day) AS cohort_day FROM user_days GROUP BY 1
    ),
    cells AS (
        SELECT cohort_day,
               date_diff('day', cohort_day, day) AS day_n,
               COUNT(DISTINCT u.user_id) AS n_active
        FROM user_days u JOIN cohorts c ON u.user_id = c.user_id
        GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_day, n_active AS cohort_size FROM cells WHERE day_n = 0
    )
    SELECT cells.cohort_day, CAST(day_n AS INTEGER) AS day_n, n_active, cohort_size,
           ROUND(n_active / CAST(cohort_size AS DOUBLE), 6) AS retention
    FROM cells JOIN sizes ON cells.cohort_day = sizes.cohort_day
    ORDER BY 1, 2
"""


from distributed_mapreduce_server_spark.operators.events import ACF_LAGS  # noqa: E402

_ACF_TERMS = []
for _lag in ACF_LAGS:
    _ACF_TERMS.append(f"""
    SELECT event_type, {_lag} AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / sqrt((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                        * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))), 6) AS acf
    FROM (
        SELECT event_type, y,
               LAG(y, {_lag}) OVER (PARTITION BY event_type ORDER BY day) AS x
        FROM (
            SELECT date_trunc('day', ts) AS day, event_type,
                   CAST(COUNT(*) AS DOUBLE) AS y
            FROM events GROUP BY 1, 2
        )
    )
    WHERE x IS NOT NULL
    GROUP BY 1
""")
EVENTS_ORACLES["q_events_autocorrelation"] = (
    " UNION ALL ".join(_ACF_TERMS) + " ORDER BY event_type, lag"
)

RELATIONAL_ORACLES["q_benford_audit"] = """
    WITH counts AS (
        SELECT CAST(FLOOR(o_totalprice / POW(10.0, FLOOR(log10(o_totalprice))))
                    AS INTEGER) AS digit,
               COUNT(*) AS n
        FROM orders WHERE o_totalprice > 0
        GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tot FROM counts)
    SELECT digit, n,
           ROUND(n / CAST(tot AS DOUBLE), 6) AS observed_share,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_share,
           ROUND((n / CAST(tot AS DOUBLE) - log10(1.0 + 1.0 / digit))
                 * (n / CAST(tot AS DOUBLE) - log10(1.0 + 1.0 / digit))
                 / log10(1.0 + 1.0 / digit) * tot, 4) AS chi2_term
    FROM counts, tot
    ORDER BY digit
"""


from distributed_mapreduce_server_spark.operators.events import SLO_ERROR_RATE  # noqa: E402

EVENTS_ORACLES["q_events_error_rate_slo"] = f"""
    WITH hourly AS MATERIALIZED (
        SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n,
               ROUND(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS r
        FROM events GROUP BY 1
    ),
    daily AS MATERIALIZED (
        SELECT date_trunc('day', hour) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_hours,
               CAST(SUM(CASE WHEN r > {SLO_ERROR_RATE} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_breach_hours,
               MAX(r) AS max_error_rate
        FROM hourly GROUP BY 1
    ),
    worst AS (
        SELECT date_trunc('day', h.hour) AS day, MIN(h.hour) AS worst_hour
        FROM hourly h JOIN daily d
          ON date_trunc('day', h.hour) = d.day AND h.r = d.max_error_rate
        GROUP BY 1
    )
    SELECT daily.day, n_hours, n_breach_hours, max_error_rate, worst_hour
    FROM daily JOIN worst ON daily.day = worst.day
    ORDER BY 1
"""

EVENTS_ORACLES["q_events_sequential_pattern"] = """
    WITH tri AS (
        SELECT DISTINCT user_id,
               event_type || ' > ' || lead(event_type, 1) OVER w
                          || ' > ' || lead(event_type, 2) OVER w AS pattern
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT pattern,
           COUNT(*) AS n_users_with,
           ROUND(COUNT(*) / (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE)
                             FROM events), 4) AS support
    FROM tri
    WHERE pattern IS NOT NULL
    GROUP BY pattern
    ORDER BY n_users_with DESC, pattern
    LIMIT 20
"""

EVENTS_ORACLES["q_events_burst_detection"] = """
    WITH mc AS (
        SELECT event_type, date_trunc('hour', ts) AS m, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    st AS (SELECT event_type, AVG(n) AS mu FROM mc GROUP BY 1),
    hot AS (
        SELECT mc.event_type, mc.m, mc.n
        FROM mc JOIN st USING (event_type)
        WHERE mc.n > 1.3 * st.mu
    ),
    isl AS (
        SELECT event_type, m, n,
               CAST(epoch(m) / 3600 AS BIGINT)
                   - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m)
                   AS grp
        FROM hot
    )
    SELECT event_type,
           MIN(m) AS burst_start,
           MAX(m) AS burst_end,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(n) AS BIGINT) AS total_events,
           CAST(MAX(n) AS BIGINT) AS peak_events
    FROM isl
    GROUP BY event_type, grp
    ORDER BY event_type, burst_start
"""


from distributed_mapreduce_server_spark.operators.relational import (  # noqa: E402
    CORR_COLS,
    SURVIVAL_GRID_DAYS,
)

_SURV_GE = ", ".join(
    f"CAST(SUM(CASE WHEN gap_days >= {d} THEN 1 ELSE 0 END) AS BIGINT) AS ge_{d}"
    for d in SURVIVAL_GRID_DAYS
)
_SURV_ROWS = " UNION ALL ".join(
    f"""SELECT {d} AS horizon_days, n_gaps, ge_{d} AS n_surviving,
               ROUND(ge_{d} / n_gaps, 6) AS survival FROM agg"""
    for d in SURVIVAL_GRID_DAYS
)

RELATIONAL_ORACLES["q_repeat_purchase_survival"] = f"""
    WITH gaps AS (
        SELECT date_diff('day',
                   CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS DATE),
                   CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    ),
    g AS MATERIALIZED (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL),
    agg AS MATERIALIZED (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps, {_SURV_GE}
        FROM g
    )
    SELECT * FROM ({_SURV_ROWS})
    ORDER BY horizon_days
"""

RELATIONAL_ORACLES["q_chi2_segment_priority"] = """
    WITH cells AS MATERIALIZED (
        SELECT c_mktsegment, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS observed
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    enriched AS (
        SELECT c_mktsegment, o_orderpriority, observed,
               SUM(observed) OVER (PARTITION BY c_mktsegment)
                   * SUM(observed) OVER (PARTITION BY o_orderpriority)
                   / SUM(observed) OVER () AS expected
        FROM cells
    ),
    t AS (
        SELECT *, POWER(observed - expected, 2) / expected AS term
        FROM enriched
    )
    SELECT c_mktsegment, o_orderpriority, observed,
           ROUND(expected, 4) AS expected,
           ROUND(term, 6) AS chi2_term,
           ROUND(SUM(term) OVER (), 4) AS chi2_total
    FROM t
    ORDER BY c_mktsegment, o_orderpriority
"""

RELATIONAL_ORACLES["q_gini_revenue"] = """
    WITH rev AS (
        SELECT o_custkey,
               ROUND(SUM(o_totalprice), 2) AS rev,
               CAST(ROUND(ROUND(SUM(o_totalprice), 2) * 100) AS BIGINT) AS rev_c
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rk FROM rev
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               (SELECT SUM(rev_c) FROM rev) / 100.0 AS total,
               SUM(rk * rev) AS srx
        FROM ranked
    )
    SELECT n AS n_customers,
           total AS total_revenue,
           ROUND(2.0 * srx / (n * total) - (n + 1.0) / n, 6) AS gini
    FROM m
"""

RELATIONAL_ORACLES["q_supplier_hhi"] = """
    WITH sup AS (
        SELECT n_name, l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS srev
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    per_nation AS (
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               SUM(srev) AS nrev, SUM(srev * srev) AS s2
        FROM sup GROUP BY 1
    )
    SELECT n_name, n_suppliers,
           ROUND(nrev, 2) AS nation_revenue,
           ROUND(s2 / (nrev * nrev), 6) AS hhi
    FROM per_nation
    ORDER BY n_name
"""

_CORR_PAIRS = [
    (a, b) for i, a in enumerate(CORR_COLS) for b in CORR_COLS[i + 1 :]
]
_CORR_ROWS = " UNION ALL ".join(
    f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
               CAST(n AS BIGINT) AS n_rows,
               ROUND((n * sp_{a}_{b} - s_{a} * s_{b})
                     / SQRT((n * ss_{a} - s_{a} * s_{a})
                            * (n * ss_{b} - s_{b} * s_{b})), 6) AS corr
        FROM m"""
    for a, b in _CORR_PAIRS
)

RELATIONAL_ORACLES["q_corr_matrix"] = f"""
    WITH m AS MATERIALIZED (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               {", ".join(f"SUM({c}) AS s_{c}, SUM({c} * {c}) AS ss_{c}" for c in CORR_COLS)},
               {", ".join(f"SUM({a} * {b}) AS sp_{a}_{b}" for a, b in _CORR_PAIRS)}
        FROM lineitem
    )
    SELECT * FROM ({_CORR_ROWS})
    ORDER BY col_a, col_b
"""

from distributed_mapreduce_server_spark.operators.events import (  # noqa: E402
    BOT_CV_T,
    BOT_MIN_GAPS,
    ENTROPY_BUCKET_W,
)

assert ENTROPY_BUCKET_W == 0.02  # the 20 000-micro-nat divisor below

EVENTS_ORACLES["q_events_user_entropy"] = """
    WITH per_type AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    per_user AS (
        SELECT user_id, SUM(n) AS n_events,
               SUM(n * ln(n)) AS s_nlogn
        FROM per_type GROUP BY 1
    ),
    h AS (
        SELECT n_events,
               ROUND(ln(n_events) - s_nlogn / n_events, 6) AS entropy
        FROM per_user
    ),
    b AS (
        -- grid-exact bucket id: micro-nats // 20000 (mirrors events.py;
        -- floor(H/0.02) on doubles misbuckets exact edges)
        SELECT CAST((CAST(ROUND(entropy * 1000000) AS BIGINT) // 20000) * 2
                    AS DOUBLE) / 100.0 AS entropy_bucket,
               n_events
        FROM h
    )
    SELECT entropy_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(n_events), 4) AS avg_events
    FROM b
    GROUP BY 1
    ORDER BY 1
"""

EVENTS_ORACLES["q_events_bot_flags"] = f"""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) / 1000000.0
                   - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)) / 1000000.0
                   AS gap
        FROM events
    ),
    stats AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               SUM(gap) AS sg, SUM(gap * gap) AS sgg
        FROM gaps WHERE gap IS NOT NULL
        GROUP BY 1
    ),
    cv AS (
        SELECT user_id, n_gaps,
               ROUND(sg / n_gaps, 4) AS mean_gap_s,
               CASE WHEN sg = 0 THEN 0.0
                    ELSE ROUND(SQRT(GREATEST(sgg / n_gaps
                                             - (sg / n_gaps) * (sg / n_gaps),
                                             0.0)) / (sg / n_gaps), 6)
               END AS gap_cv
        FROM stats
    )
    SELECT user_id, n_gaps, mean_gap_s, gap_cv
    FROM cv
    WHERE n_gaps >= {BOT_MIN_GAPS} AND gap_cv < {BOT_CV_T}
    ORDER BY user_id
"""
