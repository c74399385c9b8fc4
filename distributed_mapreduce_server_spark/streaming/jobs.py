"""Structured Streaming jobs (SURVEY.md §2.7).

The events table replayed as a file stream: watermarked tumbling-window
aggregation, and stateful gap sessionization via
applyInPandasWithState. Both run with the availableNow trigger so
batch-equivalence is testable (stream result == the batch operators in
operators/events.py), which is also how a backfill over 100 TB of
history would run: same code, bounded trigger.
"""

from __future__ import annotations

import math
import tempfile
import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from distributed_mapreduce_server_spark.operators.events import SESSION_GAP_SECONDS
from distributed_mapreduce_server_spark.functions import fround


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Match the batch catalog's timestamp normalization: the driver has
    shipped `ts` both as INT64 nanos (read as bigint under
    nanosAsLong) and as naive timestamp[us] (read as TIMESTAMP_NTZ).
    Either way, emit TIMESTAMP — value-preserving under the UTC
    session timezone."""
    dt = dict(df.dtypes)[col]
    if dt == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # schema must match the file exactly (ts is INT64 nanos on disk),
    # so take it from a raw batch read, not the converted catalog.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the sf dir holds one parquet file per table; the file-stream
    # source wants a directory, so glob-filter down to the events file.
    return _normalize_ts(
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Execute with availableNow into a memory sink; return the result
    as a batch DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dmrs_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def stream_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-h windowed aggregation with a 10-min watermark.

    Note: the raw events carry ns-precision parquet timestamps read as
    long; the stream converts exactly like the batch catalog does.
    """
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"), fround(F.sum("value"), 2).alias("total_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.orderBy("window_start", "event_type")


SESSION_OUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "session_start timestamp, session_end timestamp, session_value double"
)
SESSION_STATE_SCHEMA = "session_seq long, last_ts long, start_ts long, n long, value double"


def _sessionize_group(key, pdfs, state: GroupState):
    """Stateful reducer: one state row per user; closes a session when
    the gap exceeds SESSION_GAP_SECONDS, emits closed sessions."""
    (user_id,) = key
    if state.exists:
        session_seq, last_ts, start_ts, n, value = state.get
    else:
        session_seq, last_ts, start_ts, n, value = 0, None, None, 0, 0.0

    # Scaled half-away-from-zero like the batch operator's fround (the
    # DuckDB ROUND semantics) — Python's round() is banker's and
    # repr-HALF_UP misses scaled .5 ties; see functions.fround.
    def _round2(v: float) -> float:
        a = abs(v) * 100.0
        return math.copysign(math.floor(a + 0.5) / 100.0, v)

    gap_us = SESSION_GAP_SECONDS * 1_000_000
    closed = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, val in zip(pdf["ts"], pdf["value"]):
            ts_us = int(ts.value // 1000)
            if last_ts is None or ts_us - last_ts > gap_us:
                if last_ts is not None:
                    closed.append((user_id, session_seq, n, start_ts, last_ts, _round2(value)))
                session_seq += 1
                start_ts, n, value = ts_us, 0, 0.0
            n += 1
            value += float(val)
            last_ts = ts_us
    state.update((session_seq, last_ts, start_ts, n, value))
    if closed:
        yield pd.DataFrame(
            [
                {
                    "user_id": u,
                    "session_seq": s,
                    "n_events": n_,
                    "session_start": pd.Timestamp(st, unit="us"),
                    "session_end": pd.Timestamp(en, unit="us"),
                    "session_value": v,
                }
                for (u, s, n_, st, en, v) in closed
            ]
        )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: gap sessionization over the event
    stream (applyInPandasWithState). Emits sessions as they close;
    the final still-open session per user stays in state — asserted
    against the batch sessionizer in tests."""
    ev = _events_stream(spark, sf_dir)
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(sessions, "update")
    return out.orderBy("user_id", "session_seq")


def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the documents table replayed as a file
    stream, fingerprinted and reduced with a stateful streaming
    aggregation (complete mode).

    groupBy(fingerprint).agg(min, count) instead of dropDuplicates:
    arrival order inside a micro-batch is nondeterministic, so "first
    seen wins" would be flaky — the min-aggregation is deterministic
    and exactly equals the batch dedup_exact, which is also its
    oracle. On an unbounded stream this runs in update mode with a
    watermark on an ingest-time column to bound state.
    """
    from distributed_mapreduce_server_spark.functions import tokens

    docs = (
        spark.readStream.schema(spark.read.parquet(f"{sf_dir}/documents.parquet").schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    fp = F.md5(F.array_join(tokens("text"), " "))
    agg = (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
    )
    out = _run_to_memory(agg, "complete")
    return out.orderBy("keep_doc_id")


def stream_static_join_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched with the customer
    dim (a static broadcast side — Spark re-reads it per micro-batch,
    so slowly-changing dims stay fresh), then watermarked tumbling
    windows per market segment.

    Deterministic, so it carries a full SQL oracle like the batch ops.
    """
    from pyspark.sql.functions import broadcast

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ev = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ev = _normalize_ts(ev)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    joined = ev.join(broadcast(cust), ev.user_id == cust.c_custkey)
    agg = (
        joined.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"), "c_mktsegment")
        .agg(F.count("*").alias("n_events"), fround(F.sum("value"), 2).alias("total_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.orderBy("window_start", "c_mktsegment")


ATTRIBUTION_WINDOW = "1 hour"


def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    each purchase attributed to the same user's clicks in the prior
    hour (ad-attribution shape). Both sides are the event stream,
    filtered; watermarks + the time-range predicate bound the join
    state Spark keeps (without them state grows forever on an
    unbounded stream). Inner-join output is append-mode and
    deterministic, so this carries the full SQL oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def side(event_type: str, prefix: str) -> DataFrame:
        s = (
            spark.readStream.schema(raw_schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )
        s = _normalize_ts(s)
        s = s.filter(F.col("event_type") == event_type)
        return s.select(
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("ts").alias(f"{prefix}_ts"),
        ).withWatermark(f"{prefix}_ts", "1 day")

    clicks = side("click", "click")
    purchases = side("purchase", "purchase")
    joined = clicks.join(
        purchases,
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
    ).select(
        F.col("click_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.col("purchase_ts").cast("long") - F.col("click_ts").cast("long")).alias(
            "delay_sec"
        ),
    )
    out = _run_to_memory(joined, "append")
    return out.orderBy("user_id", "click_id", "purchase_id")


def stream_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship wordcount job as an incremental stream:
    documents replayed as a file stream, tokenized, reduced with a
    stateful streaming aggregation. This is the reference's map ->
    shuffle -> reduce pipeline (wc_map.sh | sort | wc_reduce.sh) in
    micro-batch form — new files only ever touch their own tokens, the
    running per-word state does the merge the reference re-sorts for.
    Deterministic (counts are order-insensitive), so unlike most
    streaming jobs it carries the FULL batch oracle (mr_wordcount's).
    """
    from distributed_mapreduce_server_spark.functions import tokens

    docs = (
        spark.readStream.schema(spark.read.parquet(f"{sf_dir}/documents.parquet").schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    agg = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    out = _run_to_memory(agg, "complete")
    return out.orderBy(F.desc("cnt"), "word")


def stream_ingest_partitioned(
    spark: SparkSession, sf_dir: str, out_dir: str, ckpt_dir: str
) -> None:
    """The canonical ingest pipeline: the event stream written to a
    date-partitioned parquet sink (hive layout, one directory per
    event_date) with the file sink's exactly-once manifest + the
    checkpoint for restart recovery. availableNow here; on an
    unbounded stream the same code runs with a processing-time
    trigger. Downstream batch queries on the sink get partition
    pruning on event_date for free."""
    ev = _events_stream(spark, sf_dir)
    q = (
        ev.withColumn("event_date", F.to_date("ts"))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .partitionBy("event_date")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
