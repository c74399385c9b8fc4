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


def test_index_extend_covers_kept_batch(spark, tmp_path_factory):
    """After extend, the index holds one row set per retained doc:
    historical docs plus exactly the batch docs whose status was
    'kept' — near-dups never enter."""
    import shutil

    from pyspark.sql import functions as F

    idx_src = dedup._default_index_dir(SF)
    dedup.dedup_incremental_neardup_indexed(spark, SF).collect()  # ensure built
    idx = str(tmp_path_factory.mktemp("idx_ext")) + "/index"
    shutil.copytree(idx_src, idx)

    dedup.dedup_index_extend(spark, SF, idx)

    statuses = dedup.dedup_incremental_neardup_indexed(spark, SF)
    kept = {r["doc_id"] for r in statuses.filter(F.col("status") == "kept").collect()}
    sizes = spark.read.parquet(f"{idx}/sizes")
    indexed_ids = {r["doc_id"] for r in sizes.select("doc_id").distinct().collect()}
    hist_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{idx_src}/sizes").select("doc_id").collect()
    }
    # every kept batch doc (that has shingles) is now indexed; no
    # near-dup snuck in
    batch_indexed = indexed_ids - hist_ids
    assert batch_indexed <= kept
    assert sizes.count() == sizes.select("doc_id").distinct().count()
