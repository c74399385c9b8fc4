"""Temporal join operators Spark lacks natively (SURVEY.md §2.2b).

- as-of join: for each left row, the single most recent right row at
  or before its timestamp. Spark has no ASOF JOIN operator; the naive
  formulation (join on key + time inequality, then keep max) explodes
  to |left|x|orders-per-key| intermediate rows. The scale-correct
  realization is UNION + CARRY-FORWARD: tag both sides, union, and a
  per-key window ``last(value, ignorenulls=True)`` ordered by time
  carries the latest right-side attributes onto every later left row.
  ONE shuffle (the window's), zero join fan-out, works at any key
  skew because a key's rows stay a single sorted run.

- range join: left rows matched to right rows within a time interval.
  With an equality key this is a plain shuffle join + range filter;
  the docstring notes the bucketed variant for the keyless case.

Both have exact DuckDB twins (ASOF JOIN is native there) in
temporal_oracles.py — strong oracle coverage for an operator Spark
itself doesn't ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_mapreduce_server_spark.catalog import load_tables
from distributed_mapreduce_server_spark.functions import fround


def _purchases(events: DataFrame) -> DataFrame:
    """Purchase events, deduped to one per (user_id, ts) — max event_id
    wins — so the as-of match is deterministic in every engine."""
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        events.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts")
    )


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event annotated with the same user's most
    recent purchase at or before the click (attribution query).

    Union both sides with a src tag; within each user's time-sorted
    run, purchases (src=0) sort before clicks (src=1) at equal ts so
    the inclusive <= semantics match DuckDB's ASOF JOIN. A single
    ``last(ignorenulls)`` window carries the purchase forward.
    """
    events = load_tables(spark, sf_dir, register_views=False)["events"]
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = _purchases(events)
    u = purchases.select(
        "user_id",
        "ts",
        F.lit(0).alias("src"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts",
            F.lit(1).alias("src"),
            "event_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(None).cast("timestamp_ntz").alias("purchase_ts"),
        )
    )
    # purchase_id tie-break: _purchases already guarantees at most one
    # purchase per (user, ts), but a total ordering costs nothing and
    # keeps the carry deterministic even if that dedup is ever relaxed
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "purchase_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("last_purchase_id", F.last("purchase_id", ignorenulls=True).over(w))
        .withColumn("last_purchase_ts", F.last("purchase_ts", ignorenulls=True).over(w))
        .filter(F.col("src") == 1)
        .select("event_id", "user_id", "ts", "last_purchase_id", "last_purchase_ts")
        .orderBy("event_id")
    )


# fixed-width bucket for the keyless range join: equal to the query
# interval length, so every interval covers at most 2 buckets
RANGE_BUCKET_SECONDS = 3600


def q_range_join_keyless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval join: per purchase, how many view events — by
    ANY user — fall in the hour before it ([ts - 1h, ts)). No equality
    key exists, so a plain join degenerates to an O(n^2) nested-loop
    range predicate.

    The bucketed realization (the variant
    q_range_join_views_before_purchase's docstring promises): both
    sides map onto fixed-width epoch buckets (width == interval
    length, RANGE_BUCKET_SECONDS); each interval explodes into the
    <= 2 buckets it can touch, the point side keeps its single
    bucket, and the join runs on the bucket id — a normal shuffle
    hash join whose candidate fan-out per bucket is |intervals in
    bucket| x |points in bucket|, bounded by time locality instead of
    n^2. The exact range predicate then re-filters candidates, so
    results are exact. Zero-view purchases are restored with a final
    left join against the aggregated counts (broadcast-sized after
    aggregation at any corpus scale, since it is one row per
    purchase... the left join keys on purchase_id, co-partitioned).
    """
    events = load_tables(spark, sf_dir, register_views=False)["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    w = RANGE_BUCKET_SECONDS
    vb = views.withColumn("bucket", F.floor(F.col("view_ts").cast("long") / w))
    pe = F.col("purchase_ts").cast("long")
    pb = purchases.withColumn(
        "bucket",
        F.explode(F.array(F.floor((pe - w) / w), F.floor(pe / w))),
    )
    cand = pb.join(vb, "bucket").filter(
        (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("view_ts") < F.col("purchase_ts"))
    )
    counts = cand.groupBy("purchase_id").agg(F.count("*").alias("n_views"))
    return (
        purchases.join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "purchase_ts",
            F.coalesce(F.col("n_views"), F.lit(0)).alias("n_views_prior_hour"),
        )
        .orderBy("purchase_id")
    )


def q_range_join_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per purchase, how many of the user's view events
    fall in the hour before it ([ts - 1h, ts)).

    The user_id equality key makes this a standard shuffle join with
    the range as a join-time filter — no fan-out beyond true matches.
    (Keyless version at scale: explode each interval into fixed-width
    time buckets, join on bucket, re-filter exactly — bounds the
    candidate set per bucket instead of n².)
    """
    events = load_tables(spark, sf_dir, register_views=False)["events"]
    purchases = _purchases(events).withColumnsRenamed(
        {"event_id": "purchase_id", "ts": "purchase_ts", "user_id": "p_user"}
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    cond = (
        (views.user_id == purchases.p_user)
        & (views.ts >= purchases.purchase_ts - F.expr("INTERVAL 1 HOUR"))
        & (views.ts < purchases.purchase_ts)
    )
    return (
        purchases.join(views, cond, "left")
        .groupBy(
            "purchase_id",
            F.col("p_user").alias("user_id"),
            "purchase_ts",
        )
        .agg(F.count("view_id").alias("n_views_prior_hour"))
        .orderBy("purchase_id")
    )


# max staleness for the tolerance-bounded as-of join (pandas
# merge_asof(tolerance=...) / kdb wj semantics)
ASOF_TOLERANCE_HOURS = 24


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound: each click matched to the
    user's most recent prior purchase ONLY if it happened within the
    last ASOF_TOLERANCE_HOURS — older state is stale and nulls out
    (pandas merge_asof(tolerance=...) / kdb window-join semantics;
    the attribution-window rule ad pipelines actually apply).

    Same single-shuffle union + carry-forward realization as
    q_asof_last_purchase — the tolerance is a pure column predicate on
    the carried values, so the bound adds ZERO plan cost (same
    shuffle, same window); a join-based formulation would instead
    re-scan per tolerance change.
    """
    base = q_asof_last_purchase(spark, sf_dir)
    # exact microsecond comparison — a long cast would truncate to
    # seconds and keep matches up to 1s past the tolerance
    fresh = F.col("ts") <= F.col("last_purchase_ts") + F.expr(
        f"INTERVAL {ASOF_TOLERANCE_HOURS} HOURS"
    )
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("last_purchase_id")).alias("last_purchase_id"),
        F.when(fresh, F.col("last_purchase_ts")).alias("last_purchase_ts"),
    ).orderBy("event_id")


def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click annotated with the same user's
    NEXT purchase at or after the click (time-to-convert shape) — the
    mirror of q_asof_last_purchase, same single-shuffle union +
    carry-BACKWARD window realization: purchases (src=1) sort after
    clicks (src=0) at equal ts so the inclusive >= semantics match
    DuckDB's forward ASOF JOIN; first(ignorenulls) over the
    CURRENT-ROW..FOLLOWING frame carries the next purchase back."""
    events = load_tables(spark, sf_dir, register_views=False)["events"]
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = _purchases(events)
    u = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("src"),
        "event_id",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("timestamp_ntz").alias("purchase_ts"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(1).alias("src"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    # purchase_id tie-break mirrors q_asof_last_purchase: _purchases
    # guarantees one purchase per (user, ts), and the explicit total
    # ordering pins first() even if that dedup is ever relaxed
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "purchase_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        u.withColumn("next_purchase_id", F.first("purchase_id", ignorenulls=True).over(w))
        .withColumn("next_purchase_ts", F.first("purchase_ts", ignorenulls=True).over(w))
        .filter(F.col("src") == 0)
        .select("event_id", "user_id", "ts", "next_purchase_id", "next_purchase_ts")
        .orderBy("event_id")
    )


def q_conversion_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution on top of the forward as-of join:
    of all clicks, how many convert to a purchase, and how long does
    conversion take (exact p50/p90/p99 + mean of the delay). The
    one-row funnel-health summary the as-of join exists to feed;
    everything after the single as-of shuffle is a scalar aggregate."""
    asof = q_asof_next_purchase(spark, sf_dir)
    delay = (
        F.col("next_purchase_ts").cast("long") - F.col("ts").cast("long")
    ).alias("delay_sec")
    d = asof.select(F.col("next_purchase_id").isNotNull().alias("converted"), delay)
    return d.agg(
        F.count("*").alias("n_clicks"),
        F.sum(F.col("converted").cast("bigint")).alias("n_converted"),
        fround(F.sum(F.col("converted").cast("bigint")) / F.count("*"), 4).alias(
            "conversion_rate"
        ),
        fround(F.expr("percentile(delay_sec, 0.5)"), 2).alias("p50_delay_sec"),
        fround(F.expr("percentile(delay_sec, 0.9)"), 2).alias("p90_delay_sec"),
        fround(F.expr("percentile(delay_sec, 0.99)"), 2).alias("p99_delay_sec"),
        fround(F.avg("delay_sec"), 2).alias("avg_delay_sec"),
    )


def q_asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: each click annotated with the same user's
    closest purchase in EITHER direction, ties to the past — the
    "which transaction does this telemetry belong to" matcher.

    Fused single-shuffle realization: ONE union frame carries BOTH
    windows (backward last() over PRECEDING..CURRENT, forward first()
    over CURRENT..FOLLOWING) on the same (ts, src, purchase_id)
    ordering — purchases sort before clicks at equal ts, so the
    backward frame takes the equal-ts purchase (delta 0) and the
    forward frame's exclusion of it is unobservable because the past
    wins ties. Both windows share the user_id partitioning, so
    Catalyst plans one exchange; composing the two existing as-of
    operators would cost three. Deltas compare in exact integer
    microseconds."""
    events = load_tables(spark, sf_dir, register_views=False)["events"]
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = _purchases(events)
    u = purchases.select(
        "user_id",
        "ts",
        F.lit(0).alias("src"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts",
            F.lit(1).alias("src"),
            "event_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(None).cast("timestamp_ntz").alias("purchase_ts"),
        )
    )
    base = Window.partitionBy("user_id").orderBy("ts", "src", "purchase_id")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ann = (
        u.withColumn("bid", F.last("purchase_id", ignorenulls=True).over(wb))
        .withColumn("bts", F.last("purchase_ts", ignorenulls=True).over(wb))
        .withColumn("fid", F.first("purchase_id", ignorenulls=True).over(wf))
        .withColumn("fts", F.first("purchase_ts", ignorenulls=True).over(wf))
        .filter(F.col("src") == 1)
    )
    db = F.unix_micros("ts") - F.unix_micros("bts")
    df_ = F.unix_micros("fts") - F.unix_micros("ts")
    pick_back = F.col("bid").isNotNull() & (F.col("fid").isNull() | (db <= df_))
    return ann.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_back, F.col("bid")).otherwise(F.col("fid")).alias(
            "nearest_purchase_id"
        ),
        F.when(pick_back, F.col("bts")).otherwise(F.col("fts")).alias(
            "nearest_purchase_ts"
        ),
        F.expr(
            "CASE WHEN bid IS NOT NULL AND (fid IS NULL OR "
            "unix_micros(ts) - unix_micros(bts) <= unix_micros(fts) - unix_micros(ts)) "
            "THEN (unix_micros(ts) - unix_micros(bts)) div 1000000 "
            "ELSE (unix_micros(fts) - unix_micros(ts)) div 1000000 END"
        ).alias("delta_sec"),
        F.when(pick_back, F.lit("past")).otherwise(F.lit("future")).alias("direction"),
    ).orderBy("event_id")
