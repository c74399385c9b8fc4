"""Table catalog: load the driver-generated parquet tables as DataFrames
and register temp views so operators can use either the DataFrame or
SQL API.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# The driver-generated parquet stores timestamps as INT64
# TIMESTAMP(NANOS), which Spark's vectorized reader rejects. We read
# them as raw nanos (legacy.parquet.nanosAsLong) and convert to
# microsecond timestamps here — lossless for this data (verified: no
# sub-microsecond components), and matches DuckDB's TIMESTAMP (us).
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# (application id, sf_dir) -> (owning session, table frames).
# DataFrames are immutable logical plans, so reusing them across
# operator invocations is safe and skips 10 parquet footer reads per
# call (a measurable fixed cost when a session runs hundreds of
# queries). The owning SparkSession rides along (a strong ref, so its
# identity can't be recycled) and is compared on every hit: a
# DIFFERENT session in the same context (spark.newSession()) must not
# reuse the frames — createOrReplaceTempView would register views in
# the owner's catalog, not the caller's. Source files are assumed
# immutable for the app's lifetime (testdata is); a mutable table
# would need refresh_tables().
_plan_cache: dict[tuple[str, str], tuple[SparkSession, dict[str, DataFrame]]] = {}


# Caches elsewhere in the package that derive from sf_dir contents
# (e.g. the trained-codebook memo in operators.similarity) register a
# clear callback here so refresh_tables() invalidates EVERYTHING that
# assumed source immutability — without catalog importing operator
# modules.
_refresh_hooks: list = []


def register_refresh_hook(fn) -> None:
    """Register a zero-arg callback run by refresh_tables(). Idempotent
    per function object (module reimport won't double-register)."""
    if fn not in _refresh_hooks:
        _refresh_hooks.append(fn)


def refresh_tables() -> None:
    """Drop all cached table plans (the REFRESH TABLE analog) — call
    after rewriting files under an sf_dir within one application.
    Also clears every registered derived cache (trained codebooks)."""
    _plan_cache.clear()
    _row_count_cache.clear()
    for fn in _refresh_hooks:
        fn()


# (abs sf_dir, table) -> row count, read from parquet FOOTERS — no
# Spark job at all (milliseconds vs a full count() stage). Operators
# that only need a SIZING hint (the blocked grid's adaptive B) must
# use this instead of DataFrame.count(): at 100 TB a count() is a
# full scan action per invocation; the footer metadata is exactly the
# statistic a lake catalog would serve. Same immutability contract as
# _plan_cache (refresh_tables() clears both).
_row_count_cache: dict[tuple[str, str], int] = {}


def table_row_count(sf_dir: str | None, name: str) -> int:
    """Exact row count of ``<sf_dir>/<name>.parquet`` from parquet
    footer metadata (file or directory-of-part-files), memoized.

    Accepts ``sf_dir=None`` with the same env-var/default fallback as
    :func:`load_tables`, so sizing-hint callers can pass through the
    caller's (possibly-None) sf_dir verbatim.
    """
    import pyarrow.parquet as pq

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    key = (os.path.abspath(sf_dir), name)
    hit = _row_count_cache.get(key)
    if hit is not None:
        return hit
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        n = sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        n = pq.ParquetFile(path).metadata.num_rows
    _row_count_cache[key] = n
    return n


def load_tables(spark: SparkSession, sf_dir: str | None = None, register_views: bool = True) -> dict[str, DataFrame]:
    """Load every test table from ``sf_dir`` (parquet scan, lazily).

    Column pruning + predicate pushdown happen at the scan because
    every operator selects/filters declaratively on these DataFrames.
    """
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _plan_cache.get(cache_key)
    if cached is not None and cached[0] is spark:
        frames = cached[1]
        if register_views:
            for name, df in frames.items():
                df.createOrReplaceTempView(name)
        return dict(frames)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        for col in _NANOS_TS_COLUMNS.get(name, ()):
            if col not in df.columns:
                # partial-schema synthetic dirs (scale rehearsals,
                # fixtures) may carry only an operator's columns
                continue
            field = df.schema[col]
            if isinstance(field.dataType, T.LongType):
                # integer `div`, not `/`: ns epoch values exceed 2^53 so
                # float division would be off by ±1us.
                df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        # Parquet written without isAdjustedToUTC reads as TIMESTAMP_NTZ;
        # normalize to TIMESTAMP so operators see one type either way.
        # Value-preserving: the session timezone is pinned to UTC.
        for field in df.schema.fields:
            if isinstance(field.dataType, T.TimestampNTZType):
                df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    _plan_cache[cache_key] = (spark, dict(out))
    return out
