"""Blocked all-pairs cosine grid — the shared cogroup scaffold behind
the exact embedding near-dup matmul (dedup.py) and the all-pairs k-NN
join (similarity.py).

Vectors hash into B blocks; every unordered block pair becomes one
cogrouped applyInPandas task that computes the cell's cosine
sub-matrix with a numpy matmul and hands it to an operator-specific
``cell_fn``. The shuffle is (B+1)-fold replication of the vectors,
per-task memory is two n/B-row blocks, and nothing corpus-sized ever
reaches the driver — B is the knob trading task count against
replication at any corpus size. The n² flop count is inherent to
EXACT all-pairs semantics; approximate regimes (LSH/IVF/PQ) live in
similarity.py's sim_*_ann family.

Scores are rounded to the 1e-4 grid half-away-from-zero (DuckDB ROUND
semantics — np.round is banker's at scaled .5 ties) BEFORE cell_fn
sees them, so selection/thresholding decisions are engine-stable and
both consumers keep full value parity with their oracles.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_server_spark.functions import fround_np


def blocked_cosine_grid(
    spark: SparkSession,
    emb: DataFrame,
    n_blocks: int,
    cell_fn: Callable,
    out_schema: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``cell_fn(diagonal, a_ids, b_ids, cos)`` over every
    unordered block pair of ``emb`` and union the emitted frames.

    ``cell_fn`` receives int64 id arrays for both blocks and the
    rounded cosine matrix (rows = a-block, cols = b-block); on a
    diagonal cell both blocks hold the same vectors. It must return a
    pandas DataFrame matching ``out_schema``.
    """
    import numpy as np
    import pandas as pd

    B = n_blocks
    grid = [(a * B + b, a, b) for a in range(B) for b in range(a, B)]
    a_side = spark.createDataFrame([(p, a) for p, a, _ in grid], "pid int, blk int")
    b_side = spark.createDataFrame([(p, b) for p, _, b in grid], "pid int, blk int")
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.pmod(F.col(id_col), F.lit(B)).cast("int").alias("blk"),
    )
    rep_a = e.join(F.broadcast(a_side), "blk").select("pid", "vec_id", "embedding")
    # fresh aliases on the b side: both cogroup inputs descend from the
    # same scan, and unaliased self-reference trips Spark's ambiguous
    # self-join analyzer inside flatMapCoGroupsInPandas
    rep_b = (
        e.withColumnsRenamed({"vec_id": "vec_id_b", "embedding": "embedding_b"})
        .join(F.broadcast(b_side), "blk")
        .select("pid", "vec_id_b", "embedding_b")
    )

    names = [c.strip().split()[0] for c in out_schema.split(",")]
    empty = pd.DataFrame({n: [] for n in names})

    def block_pair(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return empty
        (pid,) = key
        diagonal = (pid // B) == (pid % B)
        a_ids = left["vec_id"].to_numpy(dtype=np.int64)
        a_mat = np.stack(left["embedding"].to_numpy()).astype(np.float64)
        b_ids = right["vec_id_b"].to_numpy(dtype=np.int64)
        b_mat = np.stack(right["embedding_b"].to_numpy()).astype(np.float64)
        a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
        raw = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
        cos = fround_np(raw)
        return cell_fn(diagonal, a_ids, b_ids, cos)

    return (
        rep_a.groupby("pid")
        .cogroup(rep_b.groupby("pid"))
        .applyInPandas(block_pair, out_schema)
    )
