"""DuckDB oracle SQL for the temporal join operators.

DuckDB ships a native ASOF JOIN, which makes it a strong ground truth
for the Spark union+carry-forward realization.
"""

_PURCHASES = """
    SELECT event_id, user_id, ts FROM (
        SELECT event_id, user_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
"""

TEMPORAL_ORACLES: dict[str, str] = {
    "q_asof_last_purchase": f"""
        WITH p AS ({_PURCHASES}),
        c AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click')
        SELECT c.event_id, c.user_id, c.ts,
               p.event_id AS last_purchase_id,
               p.ts AS last_purchase_ts
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND p.ts <= c.ts
        ORDER BY c.event_id
    """,
    "q_asof_next_purchase": f"""
        WITH p AS ({_PURCHASES}),
        c AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click')
        SELECT c.event_id, c.user_id, c.ts,
               p.event_id AS next_purchase_id,
               p.ts AS next_purchase_ts
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND p.ts >= c.ts
        ORDER BY c.event_id
    """,
    "q_asof_nearest_purchase": f"""
        WITH p AS ({_PURCHASES}),
        c AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'),
        b AS (
            SELECT c.event_id, p.event_id AS bid, p.ts AS bts
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND p.ts <= c.ts
        ),
        f AS (
            SELECT c.event_id, p.event_id AS fid, p.ts AS fts
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND p.ts >= c.ts
        )
        SELECT c.event_id, c.user_id, c.ts,
               CASE WHEN bid IS NOT NULL AND (fid IS NULL OR
                         epoch_us(c.ts) - epoch_us(bts)
                         <= epoch_us(fts) - epoch_us(c.ts))
                    THEN bid ELSE fid END AS nearest_purchase_id,
               CASE WHEN bid IS NOT NULL AND (fid IS NULL OR
                         epoch_us(c.ts) - epoch_us(bts)
                         <= epoch_us(fts) - epoch_us(c.ts))
                    THEN bts ELSE fts END AS nearest_purchase_ts,
               CASE WHEN bid IS NOT NULL AND (fid IS NULL OR
                         epoch_us(c.ts) - epoch_us(bts)
                         <= epoch_us(fts) - epoch_us(c.ts))
                    THEN (epoch_us(c.ts) - epoch_us(bts)) // 1000000
                    ELSE (epoch_us(fts) - epoch_us(c.ts)) // 1000000 END AS delta_sec,
               CASE WHEN bid IS NOT NULL AND (fid IS NULL OR
                         epoch_us(c.ts) - epoch_us(bts)
                         <= epoch_us(fts) - epoch_us(c.ts))
                    THEN 'past' ELSE 'future' END AS direction
        FROM c JOIN b ON c.event_id = b.event_id
               JOIN f ON c.event_id = f.event_id
        ORDER BY c.event_id
    """,
    "q_conversion_delay_stats": f"""
        WITH p AS ({_PURCHASES}),
        c AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'),
        aj AS (
            SELECT c.event_id, c.ts, p.event_id AS next_purchase_id, p.ts AS next_ts
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND p.ts >= c.ts
        ),
        d AS (
            SELECT next_purchase_id IS NOT NULL AS converted,
                   epoch_us(next_ts) // 1000000 - epoch_us(ts) // 1000000 AS delay_sec
            FROM aj
        )
        SELECT COUNT(*) AS n_clicks,
               CAST(SUM(CAST(converted AS BIGINT)) AS BIGINT) AS n_converted,
               ROUND(SUM(CAST(converted AS BIGINT)) / COUNT(*), 4) AS conversion_rate,
               ROUND(quantile_cont(delay_sec, 0.5), 2) AS p50_delay_sec,
               ROUND(quantile_cont(delay_sec, 0.9), 2) AS p90_delay_sec,
               ROUND(quantile_cont(delay_sec, 0.99), 2) AS p99_delay_sec,
               ROUND(AVG(delay_sec), 2) AS avg_delay_sec
        FROM d
    """,
    "q_range_join_views_before_purchase": f"""
        WITH p AS ({_PURCHASES}),
        v AS (SELECT event_id AS view_id, user_id, ts FROM events
              WHERE event_type = 'view')
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
               COUNT(v.view_id) AS n_views_prior_hour
        FROM p LEFT JOIN v
          ON v.user_id = p.user_id
         AND v.ts >= p.ts - INTERVAL 1 HOUR
         AND v.ts < p.ts
        GROUP BY 1, 2, 3
        ORDER BY purchase_id
    """,
    # DuckDB's optimizer handles the keyless interval predicate
    # natively (IEJoin) — exactly the engine-side ground truth the
    # bucketed Spark realization needs.
    "q_range_join_keyless": """
        WITH p AS (SELECT event_id AS purchase_id, ts AS purchase_ts
                   FROM events WHERE event_type = 'purchase'),
        v AS (SELECT ts AS view_ts FROM events WHERE event_type = 'view')
        SELECT purchase_id, purchase_ts,
               COUNT(view_ts) AS n_views_prior_hour
        FROM p LEFT JOIN v
          ON v.view_ts >= p.purchase_ts - INTERVAL 1 HOUR
         AND v.view_ts < p.purchase_ts
        GROUP BY 1, 2
        ORDER BY purchase_id
    """,
}


def _asof_tolerance_oracle() -> str:
    from distributed_mapreduce_server_spark.operators.temporal import (
        ASOF_TOLERANCE_HOURS,
    )

    t = str(ASOF_TOLERANCE_HOURS)
    return f"""
        WITH p AS ({_PURCHASES}),
        c AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'),
        j AS (
            SELECT c.event_id, c.user_id, c.ts,
                   p.event_id AS pid, p.ts AS pts
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND p.ts <= c.ts
        )
        SELECT event_id, user_id, ts,
               CASE WHEN ts - pts <= INTERVAL {t} HOUR THEN pid END
                   AS last_purchase_id,
               CASE WHEN ts - pts <= INTERVAL {t} HOUR THEN pts END
                   AS last_purchase_ts
        FROM j
        ORDER BY event_id
    """


TEMPORAL_ORACLES["q_asof_tolerance"] = _asof_tolerance_oracle()
