"""Solo re-measure of dedup_semantic_keep (VERDICT r7 "what's wrong"
#2: 1.01 s -> 1.95-3.39 s with zero code change beyond a
default-preserving threshold param).

Protocol (diag_drift style): warm codegen at sf0.001, then N timed
runs at sf0.1 with a pure-CPU calibration probe before and after each
run, so a load spike is visible per-sample. Run SOLO — concurrent
Spark work inflates times ~2x (verify-skill note).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_mapreduce_server_spark import get_spark, registry, retire_persistent_rdds  # noqa: E402
from bench import quick_probe  # noqa: E402

N_RUNS = 5
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("dmrs-semantic-keep")
spark.sparkContext.setLogLevel("ERROR")
q = registry.all_queries()["dedup_semantic_keep"]

# warm codegen + parquet footers outside the timed region
q(spark, "/root/testdata/sf0.001").count()
q(spark, sf_dir).count()
spark.catalog.clearCache()
retire_persistent_rdds(spark)

rows = []
for i in range(N_RUNS):
    p0 = quick_probe()
    spark.catalog.clearCache()
    retire_persistent_rdds(spark)
    t0 = time.perf_counter()
    q(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    p1 = quick_probe()
    rows.append((dt, p0, p1))
    print(f"run {i}: {dt:.3f}s  probe_before={p0}ms probe_after={p1}ms", flush=True)

ts = sorted(r[0] for r in rows)
print(
    f"min={ts[0]:.3f} median={statistics.median(ts):.3f} max={ts[-1]:.3f} "
    f"best_probe={min(min(r[1], r[2]) for r in rows)}ms"
)
