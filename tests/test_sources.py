"""Round-trip tests for sources/ (SURVEY.md §2.8)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_server_spark.catalog import load_tables
from distributed_mapreduce_server_spark.sources import (
    FORMATS,
    read_source,
    read_text_lines,
    write_partitioned,
    write_sink,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return load_tables(spark, SF_DIR, register_views=False)["nation"]


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_round_trip(spark, nation, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("rt") / f"nation_{fmt}")
    write_sink(nation, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=nation.schema)
    assert back.count() == nation.count()
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )


def test_text_round_trip(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rt") / "lines")
    df = spark.createDataFrame([("alpha",), ("beta beta",), ("",)], ["value"])
    write_sink(df, path, fmt="text")
    back = read_text_lines(spark, path)
    assert back.columns == ["file", "line"]
    assert sorted(r["line"] for r in back.collect()) == ["", "alpha", "beta beta"]
    assert all(r["file"].endswith(".txt") for r in back.collect())


def test_partitioned_write_prunes(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pw") / "nation_by_region")
    write_partitioned(nation, path, ["n_regionkey"])
    # hive layout on disk
    subdirs = {d for d in os.listdir(path) if d.startswith("n_regionkey=")}
    assert len(subdirs) == 5
    back = read_source(spark, path)
    one = back.filter(F.col("n_regionkey") == 2)
    # partition pruning: the scan's partition filters mention the key
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "n_regionkey" in plan
    assert one.count() == nation.filter("n_regionkey = 2").count()


def test_overwrite_requires_opt_in(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ow") / "once")
    write_sink(nation, path)
    with pytest.raises(Exception):
        write_sink(nation, path)  # mode="error" default refuses clobber
    write_sink(nation.limit(3), path, mode="overwrite")
    assert read_source(spark, path).count() == 3


def test_registry_covers_reference_formats():
    assert {"parquet", "csv", "json", "text"} <= set(FORMATS)


def test_orc_round_trip(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rt") / "nation_orc")
    write_sink(nation, path, fmt="orc")
    back = read_source(spark, path, fmt="orc")
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_gzip_text_read(spark, tmp_path_factory):
    """Compressed line-oriented input (the reference's text inputs,
    gzipped as they arrive at scale) must read transparently."""
    import gzip
    import os

    d = str(tmp_path_factory.mktemp("gz_src"))
    with gzip.open(os.path.join(d, "in.txt.gz"), "wt", encoding="utf-8") as f:
        f.write("alpha beta\ngamma\n")
    lines = sorted(r["value"] for r in spark.read.text(d).collect())
    assert lines == ["alpha beta", "gamma"]


def test_write_sorted_parquet_enables_file_skipping(spark, tmp_path_factory):
    """Sort-on-write layout: with files range-partitioned on the filter
    column, a selective filter must read fewer rows than a scan of the
    unsorted layout would (parquet min/max stats skip whole files /
    row groups)."""
    import os

    from pyspark.sql import functions as F

    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.sources import write_sorted_parquet

    li = load_tables(spark, "/root/testdata/sf0.01", register_views=False)[
        "lineitem"
    ].select("l_orderkey", "l_shipdate", "l_quantity")
    d = str(tmp_path_factory.mktemp("sorted_pq")) + "/li"
    write_sorted_parquet(li, d, sort_by=["l_orderkey"], n_files=8)
    files = [f for f in os.listdir(d) if f.startswith("part-")]
    assert len(files) == 8

    # each file covers a disjoint orderkey range -> min/max stats of 7
    # of the 8 files exclude this point filter
    sorted_df = spark.read.parquet(d).filter(F.col("l_orderkey") == 1)
    expected = li.filter(F.col("l_orderkey") == 1).count()
    assert sorted_df.count() == expected

    import pyarrow.parquet as pq

    mins_maxs = []
    for f in files:
        md = pq.ParquetFile(os.path.join(d, f)).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_orderkey"
        )
        stats = md.row_group(0).column(col_idx).statistics
        mins_maxs.append((stats.min, stats.max))
    mins_maxs.sort()
    # ranges must be disjoint (clustered layout), so skipping is possible
    for (lo1, hi1), (lo2, hi2) in zip(mins_maxs, mins_maxs[1:]):
        assert hi1 <= lo2


def test_compact_small_files(spark, tmp_path_factory):
    """Compaction rewrites a fragmented dataset into target_files files
    with identical content."""
    import os

    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.sources import compact_small_files

    nat = load_tables(spark, "/root/testdata/sf0.01", register_views=False)["nation"]
    d = str(tmp_path_factory.mktemp("compact")) + "/nat"
    nat.repartition(16).write.parquet(d)
    before = [f for f in os.listdir(d) if f.startswith("part-")]
    assert len(before) == 16
    rows_before = sorted(map(tuple, spark.read.parquet(d).collect()))

    n_after = compact_small_files(spark, d, target_files=2)
    assert n_after <= 2
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == rows_before


def test_write_zorder_parquet_skips_on_both_dims(spark, tmp_path_factory):
    """Z-order layout: a conjunctive box filter on BOTH interleaved
    columns must be able to skip most files via min/max stats — which
    a single-column sort cannot do for the second column — and the
    data must round-trip exactly."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from distributed_mapreduce_server_spark.sources import (
        write_sorted_parquet,
        write_zorder_parquet,
    )

    # direct parquet read (not the catalog cache): the written layout
    # must not depend on whatever partitioning earlier tests cached
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    base = str(tmp_path_factory.mktemp("zorder_pq"))
    zd, sd = base + "/z", base + "/s"
    write_zorder_parquet(li, zd, zorder_by=["l_partkey", "l_suppkey"], n_files=32)
    write_sorted_parquet(li, sd, sort_by=["l_partkey"], n_files=32)

    # round-trip: same rows, and a box filter returns identical counts
    pk_hi = li.agg(F.max("l_partkey")).collect()[0][0]
    sk_hi = li.agg(F.max("l_suppkey")).collect()[0][0]
    box = (
        (F.col("l_partkey") < pk_hi * 0.25)
        & (F.col("l_suppkey") < sk_hi * 0.25)
    )
    expected = li.filter(box).count()
    assert spark.read.parquet(zd).filter(box).count() == expected
    assert spark.read.parquet(zd).count() == li.count()

    def overlapping_files(d: str) -> int:
        """Files whose min/max footer stats intersect the box filter —
        the files a stats-pruning reader must actually open."""
        n = 0
        for f in os.listdir(d):
            if not f.startswith("part-") or f.endswith(".crc"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            mins = {"l_partkey": [], "l_suppkey": []}
            for rg in range(md.num_row_groups):
                for j in range(md.num_columns):
                    c = md.row_group(rg).column(j)
                    if c.path_in_schema in mins:
                        mins[c.path_in_schema].append(c.statistics.min)
            if (
                min(mins["l_partkey"]) < pk_hi * 0.25
                and min(mins["l_suppkey"]) < sk_hi * 0.25
            ):
                n += 1
        return n

    z_overlap = overlapping_files(zd)
    s_overlap = overlapping_files(sd)
    # the partkey-sorted layout clusters ONLY partkey: every file spans
    # the full suppkey range, so ~all files whose partkey range touches
    # the box must be read. Z-order clusters both dims -> strictly
    # fewer candidate files for the 2-D box.
    assert z_overlap < s_overlap, (z_overlap, s_overlap)
    assert z_overlap <= 32 * 0.5


def test_zorder_key_matches_reference_interleave(spark):
    """Property check: the codegen Z-key equals a Python reference
    Morton interleave over the same min-max bucketing, including NULL
    cells (bucket 0) and the 63-bit clamp."""
    import random

    from distributed_mapreduce_server_spark.sources import zorder_key

    rnd = random.Random(7)
    rows = [(rnd.randint(0, 10_000), rnd.randint(-500, 500)) for _ in range(200)]
    rows += [(None, 123), (42, None), (None, None)]
    df = spark.createDataFrame(rows, "x int, y int")
    bits = 12
    z, stats = zorder_key(df, ["x", "y"], bits=bits)
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", z).collect()
    }

    top = (1 << bits) - 1

    def bucket(v, mn, mx):
        if v is None:
            v = mn
        span = (mx - mn) or 1.0
        return min(top, int(((v - mn) / span) * (top + 1)))

    def interleave(bx, by):
        out = 0
        for j in range(bits):
            out |= ((bx >> j) & 1) << (2 * j)
            out |= ((by >> j) & 1) << (2 * j + 1)
        return out

    mnx, mxx = stats["mn_x"], stats["mx_x"]
    mny, mxy = stats["mn_y"], stats["mx_y"]
    for (x, y), zv in got.items():
        assert zv == interleave(bucket(x, mnx, mxx), bucket(y, mny, mxy)), (x, y)


def test_zorder_key_clamps_bits_to_long_range(spark):
    """bits * n_cols > 63 must clamp, not wrap: keys stay non-negative
    and distinct dims still interleave."""
    from distributed_mapreduce_server_spark.sources import zorder_key

    df = spark.createDataFrame(
        [(i, j, k) for i in range(4) for j in range(4) for k in range(4)],
        "a int, b int, c int",
    )
    z, _ = zorder_key(df, ["a", "b", "c"], bits=32)  # would need 96 bits unclamped
    vals = [r["z"] for r in df.withColumn("z", z).collect()]
    assert all(v >= 0 for v in vals)
    assert len(set(vals)) == 64  # 4x4x4 distinct corner buckets stay distinct


def test_schema_evolution_merge(spark, nation, tmp_path_factory):
    """Lake-layout schema evolution: a dataset written in two waves —
    the second adding a column — must read back as the UNION schema
    under mergeSchema, with the old files' missing column as NULL,
    and as the cheap first-file schema without it (Spark's default:
    schema from a sample file, no per-file merge cost at scale)."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("evolve"))
    nation.select("n_nationkey", "n_name").write.parquet(d, mode="append")
    nation.select(
        "n_nationkey", "n_name", F.lit("eu").alias("zone")
    ).write.parquet(d, mode="append")

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"n_nationkey", "n_name", "zone"}
    n = nation.count()
    assert merged.count() == 2 * n
    # old wave surfaces as NULL zone; new wave keeps its value
    assert merged.filter(F.col("zone").isNull()).count() == n
    assert merged.filter(F.col("zone") == "eu").count() == n

    plain = spark.read.parquet(d)
    assert set(plain.columns) <= {"n_nationkey", "n_name", "zone"}
