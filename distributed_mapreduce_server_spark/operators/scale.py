"""Scale-shape kernels shared across operator families.

``two_phase_rank`` is the distributed replacement for the one window
shape that cannot survive 100 TB: a ``row_number``/``ntile``/
``percent_rank``/running-``sum`` window whose partition count is
bounded by a tiny dimension (or is global) while its input is
fact-sized — Spark sorts each window partition in ONE task, so ~5
event types or 25 nations means the whole fact stream funnels through
~5/25 tasks regardless of cluster width.

The two-phase shape (same machinery as a distributed sort /
TeraSort-style ranking):

1. range-partition the input on (group_cols, order_exprs) — sampled
   boundaries, every partition sorts in parallel;
2. per-(partition, group) counts / partial sums — ONE partial-agg
   shuffle whose result is ``n_partitions x n_groups`` rows. That
   collect is bounded by cluster width x group cardinality, never by
   data size — and the low-card-group premise is exactly what makes
   the naive window fatal, so the two bounds coincide;
3. broadcast the cumulative offsets back and rank / running-sum
   WITHIN each range partition in parallel.

Rank and running-sum values are independent of where the sampled
range boundaries land (offsets absorb the split), so results are
deterministic even though the partitioning is not.

The ungrouped form (``group_cols=()``) is the global-rank machinery
used by text_global_shuffle / text_perplexity_filter since round 3;
this module generalises it with per-group totals (for ntile /
percent_rank / cume_dist) and running sums (for cumulative-share
Pareto cuts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def two_phase_rank(
    spark: SparkSession,
    df: DataFrame,
    order_cols: list,
    group_cols: list | tuple = (),
    rn_col: str = "rn",
    sum_cols: list | tuple = (),
    n_col: str | None = None,
    materialize: bool = True,
):
    """1-based ``row_number`` within ``group_cols`` under ``order_cols``
    without a low-cardinality-partition window.

    ``order_cols``: column names or sort expressions (``F.desc(...)``
    works); used for BOTH the range partitioning and the
    within-partition ordering. The full ordering should be total
    (include a unique tie-break) — with ties, rows equal on the whole
    key still land in one range partition, but their relative ``rn``
    is then partitioning-dependent.

    ``sum_cols``: for each name ``c``, adds ``cum_<c>`` = running sum
    of ``c`` within the group under the same order (inclusive).
    ``n_col``: adds the per-group total row count (for ntile /
    percent_rank / cume_dist denominators).

    Returns ``(out_df, total_rows)`` with ``out_df`` persisted and
    already materialised (the caller may unpersist when done) —
    or, with ``materialize=False``, ``(out_df, total_rows, tagged)``
    where ``out_df`` is LAZY over the still-persisted ``tagged``
    range-partition cache: a caller that immediately folds the ranked
    frame to a small result (then eagerly checkpoints it) saves one
    full materialisation pass by reading the cache once and
    unpersisting ``tagged`` itself. ``total_rows`` is the overall
    input count either way.
    """
    group_cols = list(group_cols)
    sum_cols = list(sum_cols)
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_cols]

    n_parts = spark.sparkContext.defaultParallelism
    tagged = (
        df.repartitionByRange(n_parts, *[F.col(g) for g in group_cols], *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    aggs = [F.count("*").alias("__cnt")] + [
        F.sum(c).alias(f"__sum_{c}") for c in sum_cols
    ]
    stats = tagged.groupBy("__pid", *group_cols).agg(*aggs).collect()

    # per-group cumulative offsets over pid order (pids are ordered by
    # the range partitioner, so pid order == sort order)
    by_group: dict = {}
    for r in stats:
        key = tuple(r[g] for g in group_cols)
        by_group.setdefault(key, []).append(r)
    offset_rows = []
    total_rows = 0
    for key, rows in by_group.items():
        rows.sort(key=lambda r: r["__pid"])
        rn_off, sum_off = 0, [0.0] * len(sum_cols)
        g_total = sum(r["__cnt"] for r in rows)
        total_rows += g_total
        for r in rows:
            offset_rows.append(
                tuple([r["__pid"], *key, rn_off, *sum_off, g_total])
            )
            rn_off += r["__cnt"]
            sum_off = [
                s + (r[f"__sum_{c}"] or 0.0) for s, c in zip(sum_off, sum_cols)
            ]

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    off_schema = StructType(
        [StructField("__pid", IntegerType())]
        + [df.schema[g] for g in group_cols]
        + [StructField("__rn_off", LongType())]
        + [StructField(f"__off_{c}", DoubleType()) for c in sum_cols]
        + [StructField("__n_total", LongType())]
    )
    off = spark.createDataFrame(offset_rows, off_schema)

    w = Window.partitionBy("__pid", *group_cols).orderBy(*order_exprs)
    out = tagged.join(F.broadcast(off), ["__pid", *group_cols])
    out = out.withColumn(rn_col, F.row_number().over(w) + F.col("__rn_off"))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", F.sum(c).over(wsum) + F.col(f"__off_{c}")
        )
    if n_col is not None:
        out = out.withColumn(n_col, F.col("__n_total"))
    out = out.drop(
        "__pid", "__rn_off", "__n_total", *[f"__off_{c}" for c in sum_cols]
    )
    if not materialize:
        return out, total_rows, tagged
    out = out.persist()
    out.count()  # materialise through the cache BEFORE releasing input
    tagged.unpersist()
    return out, total_rows


def two_phase_sliding(
    spark: SparkSession,
    df: DataFrame,
    order_cols: list,
    group_cols: list | tuple,
    rows_before: int,
    rows_after: int,
    exprs,
) -> DataFrame:
    """Bounded-frame sliding window (moving avg / lag / lead) at
    cluster parallelism when the group key is a tiny dimension.

    ``Window.partitionBy(tiny_dim)`` sorts the whole fact stream in
    ~|dim| tasks. Instead: range-partition on (group, order) — every
    partition sorts in parallel — then replicate each partition's
    LAST ``rows_before`` rows into the next partition and FIRST
    ``rows_after`` rows into the previous one ("halo exchange", the
    stencil-computation pattern: a bounded 2·(before+after)·P-row
    duplication, independent of data size). The window then runs
    per (range-partition, group); halo copies supply the
    cross-boundary neighbours and are dropped from the output, so
    every surviving row sees exactly the frame it would have seen in
    the monolithic window.

    A halo row replicated into a partition where its group doesn't
    continue lands in its own (pid, group) window partition with no
    native rows and is simply dropped — group boundaries stay exact.

    ``exprs``: callable ``(w) -> list[Column]`` given the base window
    spec (partitioned by the range pid + group, ordered by
    ``order_cols``); use ``w.rowsBetween(-rows_before, rows_after)``
    inside for frames. Returned aliased columns are appended to
    ``df``'s columns.
    """
    group_cols = list(group_cols)
    order_cols = list(order_cols)  # plain column names, ascending order
    order_exprs = [F.col(c) for c in order_cols]

    n_parts = spark.sparkContext.defaultParallelism
    tagged = (
        df.repartitionByRange(n_parts, *[F.col(g) for g in group_cols], *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    w_head = Window.partitionBy("__pid", *group_cols).orderBy(*order_exprs)
    w_tail = Window.partitionBy("__pid", *group_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )

    native = tagged.withColumn("__halo", F.lit(False))
    halos = []
    if rows_before > 0:
        halos.append(
            tagged.withColumn("__rt", F.row_number().over(w_tail))
            .filter(F.col("__rt") <= rows_before)
            .drop("__rt")
            .withColumn("__pid", F.col("__pid") + 1)
            .withColumn("__halo", F.lit(True))
        )
    if rows_after > 0:
        halos.append(
            tagged.withColumn("__rh", F.row_number().over(w_head))
            .filter(F.col("__rh") <= rows_after)
            .drop("__rh")
            .withColumn("__pid", F.col("__pid") - 1)
            .withColumn("__halo", F.lit(True))
        )
    unioned = native
    for h in halos:
        unioned = unioned.unionByName(h)

    w = Window.partitionBy("__pid", *group_cols).orderBy(*order_exprs)
    out = unioned.select("*", *exprs(w)).filter(~F.col("__halo")).drop(
        "__pid", "__halo"
    )
    return out


def ntile_from_rank(rn, n, k: int):
    """Spark/ANSI ``ntile(k)`` from a 1-based total rank ``rn`` and the
    partition size ``n`` — the first ``n % k`` tiles get
    ``n div k + 1`` rows, the rest ``n div k``. Column-expression
    arithmetic only; pairs with :func:`two_phase_rank` so ntile never
    needs the single-task-per-group window."""
    q = F.floor(n / F.lit(k)).cast("long")
    rem = (n % F.lit(k)).cast("long")
    boundary = rem * (q + F.lit(1))
    return (
        F.when(rn <= boundary, F.ceil(rn / (q + F.lit(1))))
        .otherwise(rem + F.ceil((rn - boundary) / q))
        .cast("int")
    )
