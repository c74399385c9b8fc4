"""Format registry: read/write any supported source by name.

Scale notes baked into the defaults:

- parquet is the only format used on the hot path (columnar, predicate
  pushdown, column pruning); csv/json/text exist for ingest/egress
  interop, matching the reference's text-file surface.
- csv/json readers take an explicit ``schema`` — schema inference is a
  full extra pass over the data, unacceptable at 100 TB. (Inference
  still works when ``schema=None`` for small interactive use.)
- writers default to ``mode="error"`` so a job never silently
  clobbers a dataset; pass mode="overwrite" deliberately.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SourceFormat:
    """One supported format: its Spark format name + default options."""

    name: str
    read_options: dict[str, str] = field(default_factory=dict)
    write_options: dict[str, str] = field(default_factory=dict)


FORMATS: dict[str, SourceFormat] = {
    "parquet": SourceFormat("parquet"),
    "csv": SourceFormat(
        "csv",
        read_options={"header": "true"},
        write_options={"header": "true"},
    ),
    "json": SourceFormat("json"),
    "orc": SourceFormat("orc"),
    # Line-oriented text: one row per line, the reference's native
    # input format (worker streams lines to the mapper executable).
    "text": SourceFormat("text"),
}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in format ``fmt``; lazily — filters/projections
    applied by the caller are pushed down into this scan by Catalyst."""
    sf = FORMATS[fmt]
    reader = spark.read.format(sf.name).options(**{**sf.read_options, **options})
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Reference-shaped text input: (file, line_no, line) rows.

    The reference mapper sees (one file, its lines, in order); Spark
    splits large files across tasks, so line_no is per-file via a
    window only when the caller needs ordering — here we expose the
    raw line plus its source file, which is what wordcount/grep need.
    """
    return (
        spark.read.format("text")
        .load(path)
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("line"),
        )
    )


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    **options: str,
) -> None:
    """Write ``df`` to ``path`` in ``fmt``. One output file per
    partition — shard count is controlled upstream (repartition /
    AQE coalescing), not here."""
    sf = FORMATS[fmt]
    df.write.format(sf.name).options(**{**sf.write_options, **options}).mode(mode).save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "error",
    **options: str,
) -> None:
    """Hive-style partitioned write (``path/col=value/...``).

    At scale this is the layout that makes downstream partition
    pruning free: a reader filtering on ``partition_by`` columns
    never opens the other directories. Callers should repartition by
    the partition columns first if the job would otherwise write one
    small file per (task, partition-value) pair.
    """
    sf = FORMATS[fmt]
    (
        df.write.format(sf.name)
        .options(**{**sf.write_options, **options})
        .partitionBy(*partition_by)
        .mode(mode)
        .save(path)
    )


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    n_files: int | None = None,
    mode: str = "error",
    **options: str,
) -> None:
    """Layout-optimized parquet: range-partition + sort by ``sort_by``
    before writing, so each file (and each row group inside it) covers
    a narrow key range and parquet min/max statistics let readers skip
    whole files/row groups for selective filters on those columns —
    the Z-order-lite clustering every 100 TB lake table wants on its
    dominant filter column. ``repartitionByRange`` + ``sortWithin``
    beats a global orderBy: same layout, no single-point sort."""
    out = df.repartitionByRange(*sort_by) if n_files is None else df.repartitionByRange(
        n_files, *sort_by
    )
    (
        out.sortWithinPartitions(*sort_by)
        .write.format("parquet")
        .options(**options)
        .mode(mode)
        .save(path)
    )


def swap_dataset_dir(tmp: str, path: str) -> None:
    """Install ``tmp`` at ``path`` with the smallest possible loss
    window: move the live dataset aside, move the replacement in, then
    delete the old copy. A crash between the two renames leaves BOTH
    copies on disk (recoverable); deleting the live dir before the
    replacement lands would not."""
    import os
    import shutil

    old = path.rstrip("/") + "._old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_files: int,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a dataset into ``target_files``
    output files per partition directory (read -> coalesce -> two-
    rename swap via swap_dataset_dir). The lake-maintenance job that
    keeps file counts sane when streaming ingest (e.g.
    stream_ingest_partitioned) leaves one file per micro-batch — at
    100 TB, listing and opening millions of tiny files costs more
    than the scan itself. Returns the data-file count after
    compaction. ``coalesce`` (not repartition): no shuffle, it just
    merges read splits into fewer write tasks.

    Pass ``partition_by`` for Hive-partitioned datasets — the rewrite
    preserves the col=value directory layout (without it the dataset
    would flatten and downstream partition pruning would be lost).
    """
    import glob
    import os

    sf = FORMATS[fmt]
    df = spark.read.format(sf.name).options(**sf.read_options).load(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    writer = (
        df.coalesce(target_files)
        .write.format(sf.name)
        .options(**sf.write_options)
        .mode("overwrite")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(tmp)
    swap_dataset_dir(tmp, path)
    pattern = (
        os.path.join(path, *(["*"] * len(partition_by)), "part-*")
        if partition_by
        else os.path.join(path, "part-*")
    )
    return len([p for p in glob.glob(pattern) if not p.endswith(".crc")])


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12):
    """Z-order (Morton) key expression over numeric ``cols``: each
    column min-max normalized into a ``bits``-bit integer, then the
    bits of all columns interleaved. Rows close in Z-value are close
    in EVERY ``cols`` dimension, so sorting by it clusters the data
    for multi-column skipping — the layout trick behind Delta/Iceberg
    OPTIMIZE ZORDER.

    The normalization stats are one tiny aggregate collect (2 scalars
    per column — a bounded driver artifact at any scale); the key
    itself is pure codegen arithmetic (shifts/masks), no UDF.
    ``bits`` is clamped so the interleaved key fits in the 63
    value bits of a signed long (shift amounts >= 64 would wrap mod
    64 in the JVM and bit 63 would flip the sort's sign — both
    silently corrupt the clustering). NULL cells and all-NULL
    columns normalize to bucket 0, so NULL rows cluster together at
    the low end instead of collapsing into a NULL key.
    Returns (key_column, stats_row).
    """
    n = len(cols)
    bits = min(bits, 63 // n)
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"mx_{c}")]
    stats = df.agg(*aggs).collect()[0]
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None:  # all-NULL column: constant bucket
            mn, mx = 0.0, 0.0
        span = (mx - mn) or 1.0
        scaled = F.least(
            F.lit(top).cast("long"),
            F.floor(
                (F.coalesce(F.col(c).cast("double"), F.lit(mn)) - F.lit(mn))
                / F.lit(span) * F.lit(top + 1)
            ).cast("long"),
        )
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(scaled, j).bitwiseAND(F.lit(1)), j * n + ci)
            )
    return z, stats


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 12,
    n_files: int | None = None,
    mode: str = "error",
    **options: str,
) -> None:
    """Multi-dimensional clustered parquet: range-partition + sort by
    a Z-order key over ``zorder_by`` before writing. Where
    write_sorted_parquet gives perfect skipping on ONE leading column,
    Z-order gives useful min/max skipping on ALL listed columns at
    once — the right layout when the dominant access pattern is a
    conjunctive box filter (e.g. part AND supplier, lat AND lon,
    time AND tenant). Same shuffle budget as a single-column sort:
    one range exchange on the key, per-partition sorts, no global
    single-point sort."""
    z, _ = zorder_key(df, zorder_by, bits)
    keyed = df.withColumn("_zorder", z)
    out = (
        keyed.repartitionByRange("_zorder")
        if n_files is None
        else keyed.repartitionByRange(n_files, "_zorder")
    )
    (
        out.sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.format("parquet")
        .options(**options)
        .mode(mode)
        .save(path)
    )
