"""Blocked all-pairs cosine grid — the shared grid scaffold behind
the exact embedding near-dup matmul (dedup.py) and the all-pairs k-NN
join (similarity.py).

Vectors hash into B blocks; every unordered block pair becomes one
grouped applyInPandas task that computes the cell's cosine
sub-matrix with a numpy matmul and hands it to an operator-specific
``cell_fn``. Each vector explodes straight to its grid cells with a
side tag — ONE grouped shuffle of B-fold-replicated vectors (no
broadcast-join pair, no cogroup) — per-task memory is two n/B-row
blocks, and nothing corpus-sized ever reaches the driver. B is sized
adaptively from the corpus count (BLOCK_TARGET_ROWS per block), so
small corpora pay few tasks and big corpora bound per-task memory.
The n² flop count is inherent to EXACT all-pairs semantics;
approximate regimes (LSH/IVF/PQ) live in similarity.py's sim_*_ann
family. (Grid ids are BIGINT so huge adaptive B cannot overflow;
note the per-row cell list is O(B), so beyond B ~ 10^4 — already an
absurd ~10^16-flop exact job — the approximate arms are the answer,
not a bigger grid.)

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

# adaptive block sizing: aim for ~this many vectors per block. Small
# corpora collapse to a handful of cells (36 near-empty python tasks
# cost more than one matmul — measured 0.99 s -> ~0.6 s for
# dedup_semantic_keep at sf0.1), big corpora grow B linearly so
# per-task memory stays two TARGET-row blocks regardless of n.
BLOCK_TARGET_ROWS = 4096


def blocked_cosine_grid(
    spark: SparkSession,
    emb: DataFrame,
    n_blocks: int | None,
    cell_fn: Callable,
    out_schema: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_hint: int | None = None,
) -> DataFrame:
    """Run ``cell_fn(diagonal, a_ids, b_ids, cos)`` over every
    unordered block pair of ``emb`` and union the emitted frames.

    ``cell_fn`` receives int64 id arrays for both blocks and the
    rounded cosine matrix (rows = a-block, cols = b-block); on a
    diagonal cell both blocks hold the same vectors. It must return a
    pandas DataFrame matching ``out_schema``.

    ``n_blocks=None`` (the default callers use) sizes B adaptively:
    B = ceil(n / BLOCK_TARGET_ROWS), where n is ``n_hint`` when the
    caller supplies one (catalog.table_row_count reads it from parquet
    FOOTERS — no Spark action; an UPPER bound is fine since results
    are independent of B: every unordered pair lands in exactly one
    cell and each cosine is computed from the full vectors, so B is
    purely a latency/memory knob) and otherwise a count() of ``emb``
    — the slow path callers should avoid at scale.
    """
    import math

    import numpy as np
    import pandas as pd

    if n_blocks is None:
        n = n_hint if n_hint is not None else emb.count()
        n_blocks = max(1, math.ceil(n / BLOCK_TARGET_ROWS))
    B = n_blocks
    # Each vector replicates straight to its grid cells with an explode
    # — ONE shuffle (the grouped exchange), no broadcast-join pair and
    # no cogroup double machinery (measured ~0.5 s less overhead per
    # invocation than the former two-sided cogroup at sf0.1). A vector
    # in block k is the a-side of cells (k, b>=k) — including the
    # diagonal, whose b-side is reconstructed in-task — and the b-side
    # of cells (a<k, k): B-fold replication total.
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.pmod(F.col(id_col), F.lit(B)).cast("int").alias("blk"),
    )
    a_pids = F.transform(
        F.sequence(F.col("blk"), F.lit(B - 1)),
        lambda b: F.col("blk").cast("long") * B + b,
    )
    b_pids = F.when(
        F.col("blk") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("blk") - 1),
            lambda a: a.cast("long") * B + F.col("blk"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    rep = e.select(
        "vec_id",
        "embedding",
        F.explode(
            F.concat(
                F.transform(
                    a_pids, lambda p: F.struct(p.cast("long").alias("pid"), F.lit(True).alias("is_a"))
                ),
                F.transform(
                    b_pids, lambda p: F.struct(p.cast("long").alias("pid"), F.lit(False).alias("is_a"))
                ),
            )
        ).alias("cell"),
    ).select("vec_id", "embedding", F.col("cell.pid").alias("pid"), F.col("cell.is_a").alias("is_a"))

    names = [c.strip().split()[0] for c in out_schema.split(",")]
    empty = pd.DataFrame({n: [] for n in names})

    def block_pair(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (pid,) = key
        diagonal = (pid // B) == (pid % B)
        left = pdf[pdf["is_a"]]
        if left.empty:
            return empty
        a_ids = left["vec_id"].to_numpy(dtype=np.int64)
        a_mat = np.stack(left["embedding"].to_numpy()).astype(np.float64)
        if diagonal:
            b_ids, b_mat = a_ids, a_mat
        else:
            right = pdf[~pdf["is_a"]]
            if right.empty:
                return empty
            b_ids = right["vec_id"].to_numpy(dtype=np.int64)
            b_mat = np.stack(right["embedding"].to_numpy()).astype(np.float64)
        a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
        raw = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
        cos = fround_np(raw)
        return cell_fn(diagonal, a_ids, b_ids, cos)

    return rep.groupby("pid").applyInPandas(block_pair, out_schema)
