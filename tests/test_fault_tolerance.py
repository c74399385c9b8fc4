"""Fault-tolerance parity (SURVEY.md §3): the reference's manager
redistributes tasks when a worker dies mid-job (reference:
mapreduce/manager/__main__.py heartbeat + task requeue, tested by its
test_manager_08/09 analogs). On Spark that guarantee is task re-execution
(spark.task.maxFailures) — demonstrated here by a task that CRASHES on
its first attempt and succeeds on retry, with the job completing and
producing exactly-correct results.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_task_retry_recovers_from_worker_failure(spark):
    marker_dir = tempfile.mkdtemp(prefix="dmrs_ft_")

    def flaky_once(it):
        # one partition "worker" dies on its first attempt; the marker
        # file makes the retry succeed — simulating the reference's
        # dead worker + task redistribution.
        import pandas as pd  # noqa: F401

        for pdf in it:
            marker = os.path.join(marker_dir, "attempted")
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("simulated worker death")
            yield pdf

    df = spark.range(0, 1000, numPartitions=1).selectExpr("id", "id % 7 AS k")
    out = df.mapInPandas(flaky_once, schema="id long, k long")
    agg = out.groupBy("k").agg(F.count("*").alias("n"), F.sum("id").alias("s"))
    rows = {r["k"]: (r["n"], r["s"]) for r in agg.collect()}

    expect = {}
    for i in range(1000):
        n, s = expect.get(i % 7, (0, 0))
        expect[i % 7] = (n + 1, s + i)
    assert rows == expect  # exactly-once results despite the crash
    assert os.path.exists(os.path.join(marker_dir, "attempted"))
