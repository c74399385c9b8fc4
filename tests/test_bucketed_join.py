"""Bucketed co-located join (SURVEY.md §6): pre-bucketing both fact
tables on the join key lets the join run with NO exchange on either
side — at 100 TB this turns the biggest shuffle in the pipeline into
a local merge per bucket.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_server_spark.catalog import load_tables
from distributed_mapreduce_server_spark.plans import physical_plan

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark):
    # spark.sql.warehouse.dir is a static conf (can't move it on a live
    # session); the tables land in the default warehouse. A fresh
    # session's catalog doesn't know leftovers from a previous run, so
    # DROP TABLE alone isn't enough — clear the locations too.
    import shutil

    t = load_tables(spark, SF_DIR, register_views=False)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    (
        t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
    )
    return True


def test_bucketed_join_has_no_exchange(spark, warehouse):
    """Both sides bucketed by the join key with the same bucket count:
    the join plan must contain zero shuffle exchanges."""
    # disable AQE for this plan check: AQE wraps the plan before
    # execution and hides the (absent) exchanges either way; the
    # non-adaptive plan makes the assertion direct.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        o = spark.table("orders_b")
        l = spark.table("lineitem_b")
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
            F.count("*").alias("n")
        )
        plan = physical_plan(j)
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # the only exchange allowed is the final tiny groupBy on status
        assert plan.count("Exchange hashpartitioning") <= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_matches_unbucketed(spark, warehouse):
    t = load_tables(spark, SF_DIR, register_views=False)
    plain = (
        t["lineitem"].join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    bucketed = (
        spark.table("lineitem_b")
        .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, bucketed))
