"""Full-text retrieval over the documents corpus (SURVEY.md §2.5).

The reference's grep job (reference mapreduce/submit.py:1-102 +
tests/testdata/exec/grep_map.py) is boolean line matching; these are
its ranked-retrieval successors — what a user actually runs against a
corpus once "does it match" becomes "which documents matter":

- text_bm25_search: BM25-ranked top-k for a fixed conjunctive query.
  Because the query is known at plan time, term frequencies are
  computed as per-document column expressions in the SAME scan that
  computes document length — no explode, no posting-list shuffle.
  Corpus statistics (N, Σdl, df per term) reduce to ONE 1-row
  aggregate that broadcasts back, so the whole query is: one
  codegen'd scan + one scalar agg + a TakeOrdered top-k. At 100 TB
  the only shuffled data is the 1-row stats frame and the final
  top-k heap merge.
- sim_hybrid_search: lexical arm (BM25 ranks) fused with a vector
  arm (exact cosine against one query embedding) via Reciprocal
  Rank Fusion (RRF, Cormack et al.) — the standard hybrid-search
  scorer. Both arms are top-k-bounded before the fuse, so the full
  outer join is k-vs-k sized regardless of corpus size.

Determinism: scores are fround'ed BEFORE ranking and every ordering
carries a doc_id tie-break, so ranks are reproducible across engines
(the same guard sim_cosine_topk uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from distributed_mapreduce_server_spark.catalog import load_tables
from distributed_mapreduce_server_spark.functions import cosine_sim, fround, tokens

# One rare discriminative term ("dup", df ~5%) + two common terms —
# exercises the idf spread.
BM25_QUERY: tuple[str, ...] = ("dup", "spark", "window")
BM25_K1 = 1.2
BM25_B = 0.75
SEARCH_TOP_K = 15
HYBRID_QUERY_ID = 0  # embeddings.vec_id used as the vector-arm query
RRF_K = 60
HYBRID_TOP_K = 10


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k documents for the fixed query ``BM25_QUERY``.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Robertson/Lucene).
    """
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    toks = tokens("text")
    # NB: the lambda must take exactly one parameter — F.filter binds a
    # second parameter to the element INDEX, so a `w=term` default
    # would capture the index column instead of the term literal.
    def _tf(term: str):
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    tf_cols = [_tf(term).alias(f"tf{i}") for i, term in enumerate(BM25_QUERY)]
    per_doc = docs.select("doc_id", F.size(toks).alias("dl"), *tf_cols)
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(BM25_QUERY))
        ],
    )
    scored = per_doc.crossJoin(broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = None
    for i in range(len(BM25_QUERY)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5)) / (F.col(f"df{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf{i}").cast("double")
        term_score = (
            idf
            * tf
            * F.lit(BM25_K1 + 1.0)
            / (tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl))
        )
        score = term_score if score is None else score + term_score
    return (
        scored.select("doc_id", F.col("dl").cast("integer").alias("dl"), fround(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(SEARCH_TOP_K)
    )


def sim_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: RRF-fuse BM25 ranks with exact-cosine ranks
    against the embedding of ``HYBRID_QUERY_ID`` (doc ids and vec ids
    are aligned in the test corpus).

    rrf(d) = Σ_arm 1/(RRF_K + rank_arm(d)), missing arm contributes 0.
    The single-partition row_number windows run over top-k-bounded
    frames (≤ SEARCH_TOP_K rows) — constant-size at any corpus scale.
    """
    emb = load_tables(spark, sf_dir, register_views=False)["embeddings"]

    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = text_bm25_search(spark, sf_dir).select(
        "doc_id", F.row_number().over(w_lex).cast("integer").alias("bm25_rank")
    )

    q = emb.filter(F.col("vec_id") == HYBRID_QUERY_ID).select(F.col("embedding").alias("qe"))
    c = emb.filter(F.col("vec_id") != HYBRID_QUERY_ID).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("ce")
    )
    cos_scored = (
        broadcast(q)
        .crossJoin(c)
        .select("doc_id", fround(cosine_sim(F.col("qe"), F.col("ce")), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(SEARCH_TOP_K)
    )
    w_vec = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    vec = cos_scored.select(
        "doc_id", F.row_number().over(w_vec).cast("integer").alias("cos_rank")
    )

    contrib = lambda col: F.when(  # noqa: E731
        F.col(col).isNull(), F.lit(0.0)
    ).otherwise(F.lit(1.0) / (F.lit(RRF_K) + F.col(col)))
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            "bm25_rank",
            "cos_rank",
            fround(contrib("bm25_rank") + contrib("cos_rank"), 6).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(HYBRID_TOP_K)
    )


# distinct-word phrases (w1 != w2 makes occurrences non-overlapping);
# all four occur at both test SFs, so the counts are non-vacuous.
PHRASE_QUERIES: tuple[str, ...] = ("fast table", "key agg", "merge batch", "row scan")


def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search via a POSITIONAL index — the capability
    BM25's bag-of-words scoring cannot express ("key agg" the phrase,
    not the two terms anywhere). One posexplode builds the
    (doc, position, term) index; both sides are then SEMI-FILTERED to
    query terms against the broadcast phrase table BEFORE the
    adjacency join (term-at-a-time evaluation: at real corpus scale
    query terms are rare, so the filter drops almost the whole index
    — the classic reason posting lists beat document scans), and the
    adjacency join is keyed on (doc, position), never a cross
    product. Output is the per-phrase hit summary."""
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    idx = docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
    ph = spark.createDataFrame(
        [(p, p.split()[0], p.split()[1]) for p in PHRASE_QUERIES],
        "phrase string, w1 string, w2 string",
    )
    first = idx.join(broadcast(ph), F.col("tok") == F.col("w1")).select(
        "doc_id", "pos", "phrase", "w2"
    )
    second = (
        idx.join(broadcast(ph.select("w2").distinct()), F.col("tok") == F.col("w2"), "semi")
        .select(
            F.col("doc_id").alias("d2"), F.col("pos").alias("p2"), F.col("tok").alias("t2")
        )
    )
    hits = first.join(
        second,
        (F.col("doc_id") == F.col("d2"))
        & (F.col("p2") == F.col("pos") + 1)
        & (F.col("t2") == F.col("w2")),
    )
    return (
        hits.groupBy("phrase")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occurrences"),
        )
        .orderBy("phrase")
    )
