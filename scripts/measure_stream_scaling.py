"""Scale rehearsal for the streaming near-dup ingest door (VERDICT
r12 task 5): SCALING.md covers batch families only; the growing
extension-index join inside neardup_apply_batch is the one streaming
path whose PER-MICRO-BATCH cost could creep with stream lifetime
(each batch reads the historical index plus every prior batch's
extension bands). This script measures per-batch wall vs prior-
extension size at 1x/3x/10x the sf0.1 corpus, on the same
deterministic corpora as scripts/measure_scaling.py.

Method: monkeypatch streaming.jobs.neardup_apply_batch with a timing
wrapper (the registry operator looks the factory up by module global,
so the stream path is otherwise untouched), run the registry key
end-to-end per scale, and record each micro-batch's wall bracketed by
quick-probes plus the extension-band rows visible to it.

Usage: python scripts/measure_stream_scaling.py [--scales 1,3,10]
Writes stream_scaling_results.json at the repo root; run on a QUIET
host (probe brackets are recorded so a loaded run is self-evident).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from measure_scaling import ensure_corpus, quick_probe  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from distributed_mapreduce_server_spark import get_spark, registry
    from distributed_mapreduce_server_spark.streaming import jobs

    spark = get_spark("dmrs-stream-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    orig_factory = jobs.neardup_apply_batch
    records: list[dict] = []

    def timing_factory(index_dir: str, state_dir: str, cutoff: int):
        inner = orig_factory(index_dir, state_dir, cutoff)

        def timed(batch_df, batch_id):
            sess = batch_df.sparkSession
            ext_dir = f"{state_dir}/ext_bands"
            ext_rows = 0
            if os.path.isdir(ext_dir):
                prior = [
                    x
                    for x in os.listdir(ext_dir)
                    if x.startswith("batch=")
                    and int(x.split("=", 1)[1]) < batch_id
                ]
                if prior:
                    ext_rows = sess.read.parquet(
                        *[f"{ext_dir}/{x}" for x in prior]
                    ).count()
            pb = quick_probe()
            t0 = time.perf_counter()
            inner(batch_df, batch_id)
            wall = round(time.perf_counter() - t0, 2)
            records.append(
                {
                    "batch_id": int(batch_id),
                    "batch_rows": batch_df.count(),
                    "ext_rows_prior": int(ext_rows),
                    "wall": wall,
                    "probe": [pb, quick_probe()],
                }
            )

        return timed

    out = []
    fn = registry.all_queries()["stream_neardup_ingest"]
    jobs.neardup_apply_batch = timing_factory
    try:
        for k in scales:
            d = ensure_corpus(k)
            records.clear()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, d).count()
            total = round(time.perf_counter() - t0, 2)
            out.append(
                {
                    "scale": k,
                    "status_rows": n,
                    "total_wall": total,
                    "batches": list(records),
                }
            )
            print(json.dumps(out[-1]), flush=True)
    finally:
        jobs.neardup_apply_batch = orig_factory
    with open(os.path.join(ROOT, "stream_scaling_results.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
