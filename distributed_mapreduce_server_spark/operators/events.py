"""Event-stream batch operators (SURVEY.md §2.2, events table).

Sessionization, tumbling windows, pivot, and JSON extraction — the
batch forms whose semantics the streaming module (§2.7) mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_mapreduce_server_spark.catalog import load_tables

SESSION_GAP_SECONDS = 1800


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session).

    Classic lag + cumulative-flag-sum; both windows share the
    (user_id, ts) partitioning so Spark plans ONE shuffle. Gap compare
    uses integer microseconds (unix_micros) so the oracle matches
    exactly — no float seconds.
    """
    ev = load_tables(spark, sf_dir, register_views=False)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts", 1).over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form of the stream).

    ``window()`` start == date_trunc('hour') for aligned windows, which
    is what the DuckDB oracle uses.
    """
    ev = load_tables(spark, sf_dir, register_views=False)["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("distinct_users"),
        )
        .orderBy("window_start", "event_type")
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type -> per-user count columns (conditional agg form,
    so column names are stable and oracle-matchable)."""
    ev = load_tables(spark, sf_dir, register_views=False)["events"]
    types = ["click", "error", "purchase", "signup", "view"]
    aggs = [
        F.sum(F.when(F.col("event_type") == tname, 1).otherwise(0)).alias(f"n_{tname}")
        for tname in types
    ]
    return (
        ev.groupBy("user_id")
        .agg(*aggs, F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("user_id")
    )


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column + aggregate over it."""
    ev = load_tables(spark, sf_dir, register_views=False)["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
        .orderBy("event_type")
    )
