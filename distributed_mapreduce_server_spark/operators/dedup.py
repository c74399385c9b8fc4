"""Deduplication operators for LLM-data pipelines (SURVEY.md §2.3).

Five dedup strategies, all avoiding O(n²) at scale:

- exact: hash-groupBy on a normalized fingerprint (one shuffle).
- ngram_jaccard: candidate pairs via an inverted shingle index
  (explode + self-join on shingle), so only docs *sharing* a shingle
  are compared — never the full cross product.
- minhash_lsh: 16 MinHash permutations -> 4 bands x 4 rows; only
  docs colliding in a band bucket are verified. The scale path: at
  100 TB the band join touches a tiny fraction of pairs.
- simhash: 32-bit SimHash, 2 x 16-bit band buckets, Hamming<=6 verify.
- embedding_cosine: near-dup by vector similarity (brute-force pair
  join bounded by id ordering here; the LSH-bucketed variant for real
  scale lives in similarity.py).

Everything is built-in column expressions (md5/conv/bit ops) — no
Python UDFs — with exact DuckDB twins in dedup_oracles.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_server_spark.catalog import load_tables
from distributed_mapreduce_server_spark.functions import (
    cosine_sim,
    md5_u60,
    seeded_u60,
    shingles,
    tokens,
)

SHINGLE_K = 3
JACCARD_T = 0.8
N_PERMS = 16
N_BANDS = 4
ROWS_PER_BAND = 4
SIMHASH_BITS = 32
HAMMING_T = 6
COSINE_DEDUP_T = 0.45


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    return docs.select(
        "doc_id", shingles(tokens("text"), SHINGLE_K).alias("sh")
    ).filter(F.size("sh") > 0)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 fingerprint of the normalized token stream,
    keep the lowest doc_id per group."""
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    fp = F.md5(F.array_join(tokens("text"), " "))
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("keep_doc_id")
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with 3-gram Jaccard >= 0.8 via inverted shingle
    index (compare only docs sharing at least one shingle)."""
    s = _doc_shingles(spark, sf_dir)
    e = s.select("doc_id", F.explode("sh").alias("g"))
    a, b = e.alias("a"), e.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sizes = s.select("doc_id", F.size("sh").alias("n_sh"))
    jac = (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "nb"}), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
    )
    return (
        jac.filter(F.col("jaccard") >= JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def _minhash_bands(s: DataFrame) -> DataFrame:
    """doc_id -> exploded (band_idx, band_sig) rows."""
    mh = [
        F.array_min(F.transform(F.col("sh"), lambda x, i=i: seeded_u60(x, i))).alias(f"mh{i}")
        for i in range(N_PERMS)
    ]
    sig = s.select("doc_id", *mh)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        ",", *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                    )
                ).alias("band_sig"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("band")).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_sig").alias("band_sig")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: band-bucket candidate pairs, verified with
    true Jaccard >= 0.8 on the shingle sets.

    Candidate generation is a self-join on (band_idx, band_sig) — a
    key-partitioned shuffle join whose fan-out is the bucket sizes, not
    n²; this is the strategy that survives 100 TB.
    """
    s = _doc_shingles(spark, sf_dir)
    bands = _minhash_bands(s)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = s.withColumnsRenamed({"doc_id": "doc_a", "sh": "sha"})
    sb = s.withColumnsRenamed({"doc_id": "doc_b", "sh": "shb"})
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.size("sha") + F.size("shb") - F.col("inter")), 4),
        )
    )
    return (
        verified.filter(F.col("jaccard") >= JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def _simhashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit SimHash from tf-weighted token hashes."""
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("w"))
    h32 = md5_u60(F.col("tok")).bitwiseAND(F.lit((1 << SIMHASH_BITS) - 1))
    tf = tf.withColumn("h", h32)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_sums)
    simhash = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") >= 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        simhash = term if simhash is None else simhash + term
    return sums.select("doc_id", simhash.alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 2 x 16-bit band buckets, Hamming <= 6 verify."""
    sh = _simhashes(spark, sf_dir)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band_idx"), F.col("simhash").bitwiseAND(F.lit(0xFFFF)).alias("band_val")),
                F.struct(F.lit(1).alias("band_idx"), F.shiftright("simhash", 16).bitwiseAND(F.lit(0xFFFF)).alias("band_val")),
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= HAMMING_T).orderBy("doc_a", "doc_b")


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: pairs with cosine >= 0.45.

    Correctness baseline is the id-ordered pair join; the sub-quadratic
    ANN path (random-hyperplane LSH buckets) is sim_lsh_ann in
    similarity.py.
    """
    emb = load_tables(spark, sf_dir, register_views=False)["embeddings"]
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b")).withColumn(
        "cos_sim", F.round(cosine_sim(F.col("ea"), F.col("eb")), 4)
    )
    return (
        pairs.filter(F.col("cos_sim") >= COSINE_DEDUP_T)
        .select("vec_a", "vec_b", "cos_sim")
        .orderBy("vec_a", "vec_b")
    )
