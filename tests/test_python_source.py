"""Custom Python Data Source connector (§2.8): planner-time filter
pushdown, partition pruning, and read correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_server_spark.sources.python_source import (
    GreaterThanOrEqual,
    LessThan,
    QUERY_ID_LO,
    QUERY_PARTITIONS,
    QUERY_ROWS,
    RangeEventsReader,
    pysource_range_events,
    register_synth_source,
    SOURCE_NAME,
)


def test_push_filters_absorbs_ranges_and_prunes_partitions():
    r = RangeEventsReader({"n_rows": "20000", "n_partitions": "8"})
    unhandled = list(
        r.pushFilters(
            [GreaterThanOrEqual(("event_id",), 5000), LessThan(("event_id",), 7500)]
        )
    )
    assert unhandled == []
    assert (r.lo, r.hi) == (5000, 7500)
    parts = r.partitions()
    assert len(parts) == 1  # ids 5000..7499 live in partition [5000, 7500)
    assert (parts[0].lo, parts[0].hi) == (5000, 7500)


def test_push_filters_returns_unsupported_to_spark():
    from pyspark.sql.datasource import EqualTo, IsNotNull

    r = RangeEventsReader({"n_rows": "1000", "n_partitions": "4"})
    unhandled = list(
        r.pushFilters(
            [IsNotNull(("bucket",)), EqualTo(("bucket",), 3), EqualTo(("event_id",), 10)]
        )
    )
    # bucket predicates go back to Spark; the id equality is absorbed
    assert len(unhandled) == 2
    assert (r.lo, r.hi) == (10, 11)


def test_all_pruned_is_empty_not_error():
    r = RangeEventsReader({"n_rows": "100", "n_partitions": "4"})
    list(r.pushFilters([GreaterThanOrEqual(("event_id",), 500)]))
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].lo == parts[0].hi
    assert list(r.read(parts[0])) == []


def test_source_end_to_end_counts(spark):
    register_synth_source(spark)
    df = (
        spark.read.format(SOURCE_NAME)
        .option("n_rows", 1000)
        .option("n_partitions", 4)
        .load()
    )
    assert df.count() == 1000
    # spark-side residual filter on a non-pushable column still applies
    assert df.filter(F.col("bucket") == 3).count() == len(range(3, 1000, 16))
    # pushed range: exactly the generated remainder
    got = df.filter(F.col("event_id") >= 900).agg(
        F.count("*").alias("n"), F.min("event_id").alias("lo")
    ).collect()[0]
    assert (got["n"], got["lo"]) == (100, 900)


def test_registry_query_prunes_partitions(spark):
    """The registered query's pushed bound must cut the scan to the
    surviving id range: task count for the scan stage equals surviving
    partitions (2 of 8)."""
    df = pysource_range_events(spark, "unused")
    rows = df.collect()
    assert len(rows) == 16
    assert sum(r["n"] for r in rows) == QUERY_ROWS - QUERY_ID_LO
    r = RangeEventsReader(
        {"n_rows": str(QUERY_ROWS), "n_partitions": str(QUERY_PARTITIONS)}
    )
    list(r.pushFilters([GreaterThanOrEqual(("event_id",), QUERY_ID_LO)]))
    assert len(r.partitions()) == 2


def test_custom_sink_writes_reference_layout(spark, tmp_path):
    """The write path: df.write.format(sink) produces the reference
    manager's outputfileNN files plus a _MANIFEST, with staged files
    promoted only on commit (no _staging left behind)."""
    import json
    import os

    from distributed_mapreduce_server_spark.sources.python_source import (
        register_outputfiles_sink,
        SINK_NAME,
    )

    register_outputfiles_sink(spark)
    out = str(tmp_path / "job0")
    os.makedirs(out)
    df = (
        spark.range(100)
        .selectExpr("concat('key', id % 7) AS k", "CAST(id AS STRING) AS v")
        .repartition(3)
    )
    df.write.format(SINK_NAME).option("path", out).mode("append").save()
    files = sorted(os.listdir(out))
    assert files == ["_MANIFEST", "outputfile00", "outputfile01", "outputfile02"]
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert sum(m["n_rows"] for m in manifest) == 100
    lines = []
    for f in files[1:]:
        with open(os.path.join(out, f), encoding="utf-8") as fh:
            lines += [l.rstrip("\n") for l in fh]
    assert len(lines) == 100
    assert sorted(lines) == sorted(
        f"key{i % 7}\t{i}" for i in range(100)
    )


def test_custom_sink_overwrite_removes_stale_parts(spark, tmp_path):
    """mode('overwrite') must not leave a previous job's surplus
    outputfileNN behind: directory contents and _MANIFEST stay in
    agreement."""
    import json
    import os

    from distributed_mapreduce_server_spark.sources.python_source import (
        register_outputfiles_sink,
        SINK_NAME,
    )

    register_outputfiles_sink(spark)
    out = str(tmp_path / "job1")
    os.makedirs(out)
    wide = spark.range(60).selectExpr("'k' AS k", "CAST(id AS STRING) AS v")
    wide.repartition(6).write.format(SINK_NAME).option("path", out).mode(
        "append"
    ).save()
    assert len([f for f in os.listdir(out) if f.startswith("outputfile")]) == 6
    narrow = spark.range(30).selectExpr("'k' AS k", "CAST(id AS STRING) AS v")
    narrow.repartition(3).write.format(SINK_NAME).option("path", out).mode(
        "overwrite"
    ).save()
    files = sorted(f for f in os.listdir(out) if f.startswith("outputfile"))
    assert files == ["outputfile00", "outputfile01", "outputfile02"]
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert sorted(m["file"] for m in manifest) == files
    assert sum(m["n_rows"] for m in manifest) == 30
