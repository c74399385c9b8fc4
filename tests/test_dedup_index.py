"""Persistent dedup-index lifecycle (§2.3): build once, consume on the
day-2 path with batch-only compute."""

from __future__ import annotations

import os

from distributed_mapreduce_server_spark.operators import dedup

SF = "/root/testdata/sf0.01"


def test_indexed_matches_recompute(spark):
    """The indexed variant must produce exactly the recompute variant's
    rows (they also share one oracle object)."""
    a = [tuple(r) for r in dedup.dedup_incremental_neardup(spark, SF).collect()]
    b = [tuple(r) for r in dedup.dedup_incremental_neardup_indexed(spark, SF).collect()]
    assert a == b


def test_index_tables_on_disk_and_read(spark):
    """After a run the index dir holds the three clustered tables, and
    the day-2 plan actually scans them (no historical recompute)."""
    df = dedup.dedup_incremental_neardup_indexed(spark, SF)
    idx = dedup._default_index_dir(SF)
    for sub in ("bands", "shingles", "sizes"):
        assert os.path.exists(os.path.join(idx, sub, "_SUCCESS")), sub
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dmrs_dedup_index" in plan
    # the only documents-table scan feeding shingle computation is the
    # batch side; the index side must come from the stored parquet
    assert plan.count("dmrs_dedup_index") >= 2  # bands + shingles (+sizes)
