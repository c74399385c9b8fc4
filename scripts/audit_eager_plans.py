"""One-shot audit: run every EAGER op at sf0.001, capture executed
plans from the SQL status store, report cartesian + low-card-window
offenders per key (input for the test allowlists)."""
import sys, time, traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from distributed_mapreduce_server_spark import registry
from distributed_mapreduce_server_spark.plans import (
    cartesian_count_in,
    executed_plan_descriptions,
    latest_execution_id,
    window_partition_specs_in,
)
from distributed_mapreduce_server_spark.session import get_spark

from test_plans import EAGER_OPS, TINY_DIM_WINDOW_COLS  # noqa: E402

SF = "/root/testdata/sf0.001"


def main():
    spark = get_spark("audit-eager", shuffle_partitions=8)
    qs = registry.all_queries()
    for key in sorted(EAGER_OPS):
        w = latest_execution_id(spark)
        t0 = time.time()
        try:
            df = qs[key](spark, SF)
            df.collect()
        except Exception:
            print(f"{key}\tERROR")
            traceback.print_exc()
            continue
        plans = executed_plan_descriptions(spark, since=w)
        carts = sum(cartesian_count_in(p) for p in plans)
        bad_wins = []
        for p in plans:
            for cols in window_partition_specs_in(p):
                if (not cols) or set(cols) <= TINY_DIM_WINDOW_COLS:
                    bad_wins.append(cols)
        print(f"{key}\t{time.time()-t0:.1f}s\texecs={len(plans)}\tcartesians={carts}\tlowcard_windows={bad_wins}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
