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

class TwoPhaseTotals(int):
    """Grand totals the kernel's stats pass already paid for.

    Subclasses ``int`` (value = overall input row count) so existing
    consumers that used the old integer ``total_rows`` return slot —
    including f-string interpolation into oracle-matching expressions —
    keep working unchanged; ``sums[c]`` adds the global sum of each
    ``sum_cols`` entry so share-of-total consumers (Pareto/ABC cuts)
    never pay a second full aggregation."""

    def __new__(cls, rows: int, sums: dict):
        obj = super().__new__(cls, rows)
        obj.sums = sums
        return obj

    @property
    def rows(self) -> int:
        return int(self)


def two_phase_rank(
    spark: SparkSession,
    df: DataFrame,
    order_cols: list,
    group_cols: list | tuple = (),
    rn_col: str = "rn",
    sum_cols: list | tuple = (),
    n_col: str | None = None,
    max_cols: list | tuple = (),
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
    ``max_cols``: for each name ``c``, adds ``cummax_<c>`` = running
    max (inclusive) — the watermark/frontier shape; works for any
    orderable type (numeric, timestamp).
    ``n_col``: adds the per-group total row count (for ntile /
    percent_rank / cume_dist denominators).

    Returns ``(out_df, totals)`` where ``out_df`` is eagerly
    local-checkpointed — lineage is CUT, so the result can be
    re-collected at any later time without recomputing the sampled
    range shuffle (a recompute would re-sample boundaries, and the
    collected per-partition offsets would then describe a DIFFERENT
    ``__pid`` assignment: silently wrong ranks — fail-loud checkpoint
    blocks beat silent recompute here). No cache outlives the call.

    With ``materialize=False``: ``(out_df, totals, tagged)`` where
    ``out_df`` is LAZY over the still-persisted ``tagged``
    range-partition cache. CONTRACT: the caller must fold ``out_df``
    to its final frame, materialise it eagerly
    (``localCheckpoint(eager=True)``), and only THEN
    ``tagged.unpersist()`` — any action on a non-checkpointed
    descendant after the unpersist is INVALID (the recompute
    re-samples ``__pid`` boundaries against stale offsets), not
    merely slower. Every in-repo consumer follows this shape.

    ``totals`` (:class:`TwoPhaseTotals`) carries the grand totals the
    stats pass already paid for: ``rows`` (overall input count) and
    ``sums[c]`` (global sum of each ``sum_cols`` entry) — consumers
    that need a grand total (Pareto cuts, share-of-total) must NOT
    pay a second full aggregation for it.
    """
    group_cols = list(group_cols)
    sum_cols = list(sum_cols)
    max_cols = list(max_cols)
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_cols]

    n_parts = spark.sparkContext.defaultParallelism
    tagged = (
        df.repartitionByRange(n_parts, *[F.col(g) for g in group_cols], *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    aggs = (
        [F.count("*").alias("__cnt")]
        + [F.sum(c).alias(f"__sum_{c}") for c in sum_cols]
        + [F.max(c).alias(f"__max_{c}") for c in max_cols]
    )
    stats = tagged.groupBy("__pid", *group_cols).agg(*aggs).collect()

    # per-group cumulative offsets over pid order (pids are ordered by
    # the range partitioner, so pid order == sort order)
    by_group: dict = {}
    for r in stats:
        key = tuple(r[g] for g in group_cols)
        by_group.setdefault(key, []).append(r)
    offset_rows = []
    total_rows = 0
    grand_sums: dict = {c: 0 for c in sum_cols}
    for key, rows in by_group.items():
        rows.sort(key=lambda r: r["__pid"])
        rn_off, sum_off = 0, [0.0] * len(sum_cols)
        max_off: list = [None] * len(max_cols)
        g_total = sum(r["__cnt"] for r in rows)
        total_rows += g_total
        for c in sum_cols:
            # Integral partials (LONG sum_cols) fold in arbitrary-
            # precision Python ints, so grand totals of integer
            # columns are EXACT at any sf (ADVICE r8: the previous
            # all-float fold silently lapsed past 2^53 ≈ sf300 in
            # cents). Non-integer partials (double/Decimal) fold in
            # DOUBLE precision — the offset columns are DoubleType
            # throughout, so exact Decimal semantics are not
            # preserved; use a long column when exactness matters.
            vals = [r[f"__sum_{c}"] for r in rows if r[f"__sum_{c}"] is not None]
            if all(isinstance(v, int) for v in vals):
                grand_sums[c] += sum(vals)
            else:
                grand_sums[c] = float(grand_sums[c]) + float(
                    sum(float(v) for v in vals)
                )
        for r in rows:
            offset_rows.append(
                tuple([r["__pid"], *key, rn_off, *sum_off, *max_off, g_total])
            )
            rn_off += r["__cnt"]
            sum_off = [
                s + float(r[f"__sum_{c}"] or 0.0)
                for s, c in zip(sum_off, sum_cols)
            ]
            max_off = [
                m if (v := r[f"__max_{c}"]) is None
                else (v if m is None else max(m, v))
                for m, c in zip(max_off, max_cols)
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
        + [StructField(f"__maxoff_{c}", df.schema[c].dataType, True) for c in max_cols]
        + [StructField("__n_total", LongType())]
    )
    off = spark.createDataFrame(offset_rows, off_schema)

    w = Window.partitionBy("__pid", *group_cols).orderBy(*order_exprs)
    # NULL-SAFE group equality: a plain column-list equi-join would
    # silently drop every row whose group key is NULL (the monolithic
    # window this kernel replaces keeps NULL as its own partition)
    tg, offb = tagged.alias("__tg"), F.broadcast(off).alias("__off")
    cond = F.col("__tg.__pid") == F.col("__off.__pid")
    for g in group_cols:
        cond = cond & F.col(f"__tg.{g}").eqNullSafe(F.col(f"__off.{g}"))
    out = tg.join(offb, cond).drop(
        F.col("__off.__pid"), *[F.col(f"__off.{g}") for g in group_cols]
    )
    out = out.withColumn(rn_col, F.row_number().over(w) + F.col("__rn_off"))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", F.sum(c).over(wsum) + F.col(f"__off_{c}")
        )
    for c in max_cols:
        # greatest() skips NULLs, so a first-partition (null) offset
        # leaves the within-partition running max untouched
        out = out.withColumn(
            f"cummax_{c}",
            F.greatest(F.max(c).over(wsum), F.col(f"__maxoff_{c}")),
        )
    if n_col is not None:
        out = out.withColumn(n_col, F.col("__n_total"))
    out = out.drop(
        "__pid",
        "__rn_off",
        "__n_total",
        *[f"__off_{c}" for c in sum_cols],
        *[f"__maxoff_{c}" for c in max_cols],
    )
    totals = TwoPhaseTotals(rows=total_rows, sums=grand_sums)
    if not materialize:
        return out, totals, tagged
    # Eager localCheckpoint, not persist(): the checkpoint materialises
    # through the tagged cache in the same single pass, then CUTS
    # lineage — a later re-collection reads checkpoint blocks instead
    # of re-running the sampled range shuffle against stale offsets.
    out = out.localCheckpoint(eager=True)
    tagged.unpersist()
    return out, totals


def two_phase_sliding(
    spark: SparkSession,
    df: DataFrame,
    order_cols: list,
    group_cols: list | tuple,
    value_col: str,
    frame_before: int,
    frame_after: int = 0,
    lags: tuple = (),
    leads: tuple = (),
) -> DataFrame:
    """Bounded-frame sliding window (moving avg / lag / lead) at
    cluster parallelism when the group key is a tiny dimension.

    ``Window.partitionBy(tiny_dim)`` sorts the whole fact stream in
    ~|dim| tasks. Instead, a CONTRIBUTION formulation on top of the
    two-phase rank: every row learns its exact within-group position
    ``rn``, then explodes to the bounded offset set its frame/lag/
    lead neighbours need (each contributor row r reaches targets
    ``r + d``), a keyed aggregation folds each target's contributors,
    and one co-partitioned equi-join attaches the results back. The
    fan-out is ``|offsets|`` per row — a constant — and correctness
    is INDEPENDENT of where range-partition boundaries land or how
    sparse any (partition, group) run is (the round-5 review killed a
    halo-exchange variant here exactly because its one-partition-deep
    halo silently broke on sparse runs).

    Returns ``df``'s columns plus ``rn``, ``frame_avg`` (mean of
    ``value_col`` over ``rowsBetween(-frame_before, frame_after)``,
    partial at group edges exactly like the monolithic window) and
    ``lag_<k>`` / ``lead_<k>`` for each requested step.
    """
    group_cols = list(group_cols)
    ranked, _, tagged = two_phase_rank(
        spark,
        df,
        list(order_cols),
        group_cols=group_cols,
        rn_col="rn",
        materialize=False,
    )
    offs = sorted(
        set(range(-frame_after, frame_before + 1))
        | {int(k) for k in lags}
        | {-int(k) for k in leads}
    )
    d = F.col("__d")
    contrib = ranked.select(
        *group_cols,
        F.col("rn"),
        F.col(value_col).alias("__v"),
        F.explode(F.array(*[F.lit(o) for o in offs])).alias("__d"),
    ).withColumn("__t", F.col("rn") + d)
    in_frame = (d >= -frame_after) & (d <= frame_before)
    agg_cols = [F.avg(F.when(in_frame, F.col("__v"))).alias("frame_avg")]
    for k in lags:
        agg_cols.append(
            F.max(F.when(d == int(k), F.col("__v"))).alias(f"lag_{k}")
        )
    for k in leads:
        agg_cols.append(
            F.max(F.when(d == -int(k), F.col("__v"))).alias(f"lead_{k}")
        )
    folded = contrib.groupBy(*group_cols, "__t").agg(*agg_cols)

    # phantom targets past the group end have no rn partner and drop
    # out of this inner join; NULL-safe on the group key like the rank
    rk, fd = ranked.alias("__rk"), folded.alias("__fd")
    cond = F.col("__rk.rn") == F.col("__fd.__t")
    for g in group_cols:
        cond = cond & F.col(f"__rk.{g}").eqNullSafe(F.col(f"__fd.{g}"))
    out = rk.join(fd, cond).drop(
        F.col("__fd.__t"), *[F.col(f"__fd.{g}") for g in group_cols]
    )
    # the rank kernel's materialize=False contract: checkpoint the
    # result through the tagged cache (cuts lineage — both join sides
    # reference the SAME cached __pid assignment; ReuseExchange would
    # NOT dedupe a recompute and re-sampled boundaries would invalidate
    # the collected offsets), then release the cache.
    out = out.localCheckpoint(eager=True)
    tagged.unpersist()
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
