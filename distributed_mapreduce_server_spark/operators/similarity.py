"""Similarity search over embedding columns (SURVEY.md §2.4).

- sim_cosine_topk: exact brute-force top-k for a small query set —
  the query vectors broadcast to every partition, candidates stream
  through once, a per-query heap (TakeOrdered via window rank) picks
  k. This is the correctness baseline and is already 100 TB-shaped
  for small query sets: one scan, no shuffle of the candidate side.
- sim_lsh_ann: random-hyperplane LSH buckets -> candidates only
  compare within their bucket. Deterministic md5-seeded hyperplanes
  so results are reproducible across runs and engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from distributed_mapreduce_server_spark.catalog import load_tables
from distributed_mapreduce_server_spark.functions import cosine_sim

N_QUERIES = 5
TOP_K = 10
N_PLANES = 8
EMB_DIM = 64


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for query vectors (vec_id < 5)."""
    emb = load_tables(spark, sf_dir, register_views=False)["embeddings"]
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    scored = broadcast(q).crossJoin(c).withColumn(
        "cos_sim", F.round(cosine_sim(F.col("qe"), F.col("ce")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    )


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5(seed|dim):
    components in [-1, 1], reproducible everywhere."""
    planes = []
    for j in range(N_PLANES):
        row = []
        for d in range(EMB_DIM):
            h = int(hashlib.md5(f"{j}|{d}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 8-bit sign bucket, exact rerank
    within bucket. Rows-only check (approximate recall by design);
    tests assert bucket-recall against the exact top-k."""
    emb = load_tables(spark, sf_dir, register_views=False)["embeddings"]
    planes = _hyperplanes()

    def bucket(col):
        bits = []
        for j, plane in enumerate(planes):
            pl = F.array(*[F.lit(x) for x in plane])
            dot = F.aggregate(
                F.zip_with(col, pl, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    with_bucket = emb.select("vec_id", "embedding", bucket(F.col("embedding")).alias("bucket"))
    q = with_bucket.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), F.col("bucket").alias("qb")
    )
    c = with_bucket.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), F.col("bucket").alias("cb")
    )
    scored = (
        broadcast(q)
        .join(c, F.col("qb") == F.col("cb"))
        .withColumn("cos_sim", F.round(cosine_sim(F.col("qe"), F.col("ce")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    )
