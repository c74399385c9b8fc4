"""Empirical scale rehearsal (VERDICT r11 task 6): measure the
scale-claimed operator families on deterministic synthetic corpora at
1x / 3x / 10x the sf0.1 row counts, so SCALING.md's growth curves are
measured rather than analytic.

Corpora are generated into /tmp/dmrs_scaling/scale<K>/ with the same
schemas and marginal shapes as the driver's testdata (documents:
31-word vocab, 8-110 word docs, planted exact-dup pairs at sf0.1's
rate; embeddings: near-isotropic 64-dim with planted near-dup pairs;
orders/lineitem: the bipartite purchase graph with custkeys/suppkeys
scaled with K so degrees stay constant — the scale-OUT direction a
real corpus grows in). Generation is numpy-PCG64 seeded per
(table, scale): rerunning the script regenerates byte-identical
corpora.

Measured families and their claimed complexity (what SCALING.md
checks):
- dedup_minhash_lsh / dedup_lsh_br_sweep  -> linear in docs (banded
  buckets; the (16,1) sweep arm's LSH_BUCKET_CAP must FIRE at 10x —
  the script reports the sweep's candidate counts so the cap's
  truncation is visible).
- text_global_shuffle                      -> linear (two-phase rank).
- q_graph_triangles / clustering coeff     -> m·sqrt(m) wedge bound;
  near-linear here because degrees are held constant.
- dedup_semantic_routed / _routed_nested   -> assignment O(n*K*d),
  candidates n^2*(P1P2)^2/(2*K1*K2): QUADRATIC at fixed K by design;
  the documented scale path grows K with n. The script measures BOTH
  regimes: fixed-K (1x/3x, formula check) and K-scaled-with-n at 10x
  (ROUTE_K/NESTED_K2 x10 -> cost per vector constant, wall
  near-linear).

Usage: python scripts/measure_scaling.py [--scales 1,3,10] [--runs 2]
Writes one JSON line per measurement to stdout and a summary to
scaling_results.json. Run on a QUIET host (quick-probe brackets are
recorded; see DRIFT.md for this box's tenant weather).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = "/tmp/dmrs_scaling"
# sf0.1 row counts (TESTDATA.md) — scale multiplies these.
N_DOCS, N_VECS, N_ORDERS, N_LINES = 5000, 2000, 150_000, 600_000
N_CUST, N_SUPP, N_PART = 15_000, 1_000, 20_000
VOCAB = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group vector query agg table the key filter customer stream big "
    "merge row window join data store"
).split()  # 31 words, the frozen corpus's observed vocabulary size
LANGS = ["en", "en", "en", "de", "es", "fr", "zh"]  # en-weighted
EXACT_DUP_RATE = 8 / 5000  # sf0.1: 8 exact-dup pairs / 5000 docs
NEAR_DUP_RATE = 0.05  # planted cos-pairs per vector (~sf0.1's density)


def _gen_documents(d: str, k: int) -> None:
    n = N_DOCS * k
    rng = np.random.default_rng(1200 + k)
    lengths = rng.integers(8, 111, n)
    words = rng.integers(0, len(VOCAB), int(lengths.sum()))
    texts, off = [], 0
    for ln in lengths:
        texts.append(" ".join(VOCAB[w] for w in words[off : off + ln]))
        off += ln
    for src in rng.integers(0, n, int(n * EXACT_DUP_RATE)):
        texts[(src + 1) % n] = texts[src]  # planted exact dup pair
    langs = [LANGS[i] for i in rng.integers(0, len(LANGS), n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(
                    [f"src{i}" for i in rng.integers(0, 20, n)], pa.string()
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )


def _gen_embeddings(d: str, k: int) -> None:
    n, dim = N_VECS * k, 64
    rng = np.random.default_rng(3400 + k)
    x = rng.uniform(-1.0, 1.0, (n, dim))
    n_pairs = int(n * NEAR_DUP_RATE)
    src = rng.integers(0, n, n_pairs)
    alpha = rng.uniform(0.5, 0.95, n_pairs)
    for s, a in zip(src, alpha):
        t = (s + 1) % n
        x[t] = a * x[s] + (1 - a) * x[t]  # planted near-dup pair
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in x],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(
                    rng.integers(0, 10, n).astype(np.int32), pa.int32()
                ),
            }
        ),
        f"{d}/embeddings.parquet",
    )


def _gen_purchases(d: str, k: int) -> None:
    """orders + lineitem with ONLY the purchase-graph columns; keys
    scale with K so cust/supp degrees stay constant (scale-out)."""
    rng = np.random.default_rng(5600 + k)
    n_o, n_l = N_ORDERS * k, N_LINES * k
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_o), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, N_CUST * k, n_o), pa.int64()
                ),
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_o, n_l), pa.int64()),
                "l_suppkey": pa.array(
                    rng.integers(0, N_SUPP * k, n_l), pa.int64()
                ),
                # co-purchase graph input (triangles/clustering):
                # parts scale with K so basket sizes AND per-part
                # degrees stay constant — edge count grows ~linearly
                "l_partkey": pa.array(
                    rng.integers(0, N_PART * k, n_l), pa.int64()
                ),
            }
        ),
        f"{d}/lineitem.parquet",
    )


def ensure_corpus(k: int) -> str:
    d = f"{BASE}/scale{k}"
    marker = f"{d}/.complete"
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    _gen_documents(d, k)
    _gen_embeddings(d, k)
    _gen_purchases(d, k)
    open(marker, "w").write("ok")
    return d


def quick_probe() -> float:
    rng = np.random.default_rng(7)
    a = rng.random((512, 512))
    b = rng.random((512, 512))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        (a @ b).sum()
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[1] * 1e3, 3)


FAMILIES = [
    # (key, table whose row count is the size axis)
    ("dedup_minhash_lsh", "documents"),
    ("dedup_lsh_br_sweep", "documents"),
    ("text_global_shuffle", "documents"),
    ("q_graph_triangles", "lineitem"),
    ("q_graph_clustering_coefficient", "lineitem"),
    ("dedup_semantic_routed", "embeddings"),
    ("dedup_semantic_routed_nested", "embeddings"),
]


def measure(spark, key: str, sf_dir: str, runs: int):
    from distributed_mapreduce_server_spark import registry, retire_persistent_rdds

    fn = registry.all_queries()[key]
    walls, n_rows = [], 0
    for _ in range(runs):
        spark.catalog.clearCache()
        retire_persistent_rdds(spark)
        pb = quick_probe()
        t0 = time.perf_counter()
        n_rows = fn(spark, sf_dir).count()
        walls.append(round(time.perf_counter() - t0, 2))
        pa_ = quick_probe()
    return {"rows": n_rows, "walls": walls, "probe": [pb, pa_]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--families", default="", help="comma list of keys (default: all)"
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    fams = FAMILIES
    if args.families:
        keep = set(args.families.split(","))
        fams = [f for f in FAMILIES if f[0] in keep]

    from distributed_mapreduce_server_spark import get_spark
    from distributed_mapreduce_server_spark.catalog import table_row_count
    from distributed_mapreduce_server_spark.operators import dedup
    from distributed_mapreduce_server_spark.operators.similarity import (
        release_codebook_caches,
    )

    spark = get_spark("dmrs-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for k in scales:
        d = ensure_corpus(k)
        for key, table in fams:
            if key.startswith("dedup_semantic_routed") and k > 3:
                # fixed-K routed dedup is candidate-quadratic BY
                # DESIGN (n^2 P^2 / 2K); past 3x only the documented
                # scale path (K grows with n, below) is measured.
                continue
            rec = {
                "scale": k,
                "key": key,
                "input_rows": table_row_count(d, table),
                **measure(spark, key, d, args.runs),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
        # The documented scale path for the routed family: the
        # codebook grows with the corpus (cells stay constant-size).
        # Measure it at the largest scale only, K scaled by k.
        if k == max(scales) and k > 1 and any(
            key.startswith("dedup_semantic_routed") for key, _ in fams
        ):
            saved = (dedup.ROUTE_K, dedup.NESTED_K2)
            dedup.ROUTE_K, dedup.NESTED_K2 = 64 * k, 128 * k
            release_codebook_caches()
            for key in ("dedup_semantic_routed", "dedup_semantic_routed_nested"):
                if any(f[0] == key for f in fams):
                    rec = {
                        "scale": k,
                        "key": f"{key}[K*{k}]",
                        "input_rows": table_row_count(d, "embeddings"),
                        **measure(spark, key, d, args.runs),
                    }
                    out.append(rec)
                    print(json.dumps(rec), flush=True)
            dedup.ROUTE_K, dedup.NESTED_K2 = saved
            release_codebook_caches()
    with open(os.path.join(ROOT, "scaling_results.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
