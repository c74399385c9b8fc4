"""Round-10 operator invariants: trained ANN codebooks (coarse IVF +
per-subspace PQ), the routed threshold sweep, and the round's new
operators."""

from __future__ import annotations

import numpy as np
import pytest

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_smoke():
    return SF_SMOKE


def test_ivf_codebook_driver_and_distributed_paths_identical(spark, sf_smoke):
    """The shared cosine-Lloyd trainer's two paths (driver numpy loop
    vs per-round distributed partial-agg) must produce the identical
    IVF coarse codebook — same discipline as the dedup routing
    codebook's forced-fallback test."""
    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.operators.similarity import (
        IVF_TRAIN_ITERS,
        N_CENTROIDS,
        N_QUERIES,
        _train_cosine_codebook,
    )
    from pyspark.sql import functions as F

    emb = load_tables(spark, sf_smoke, register_views=False)["embeddings"].select(
        "vec_id", "embedding"
    )
    cand = emb.filter(F.col("vec_id") >= N_QUERIES)
    ids_d, mat_d = _train_cosine_codebook(
        spark, cand, N_QUERIES + N_CENTROIDS, IVF_TRAIN_ITERS
    )
    ids_x, mat_x = _train_cosine_codebook(
        spark,
        cand,
        N_QUERIES + N_CENTROIDS,
        IVF_TRAIN_ITERS,
        force_distributed=True,
    )
    assert (ids_d == ids_x).all()
    assert np.array_equal(mat_d, mat_x)


def test_pq_codebook_driver_and_distributed_paths_identical(spark, sf_smoke):
    """Same forced-fallback discipline for the per-subspace PQ
    trainer: both paths land on the identical stitched codebook."""
    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.operators.similarity import (
        _pq_codebook,
    )

    emb = load_tables(spark, sf_smoke, register_views=False)["embeddings"]
    ids_d, mat_d = _pq_codebook(emb)
    ids_x, mat_x = _pq_codebook(emb, force_distributed=True)
    assert (ids_d == ids_x).all()
    assert np.array_equal(mat_d, mat_x)


def test_lr_training_loss_monotone_and_filter_consistent(spark, sf_smoke):
    """VERDICT r9 task 6 invariants: (1) full-batch GD loss is
    monotone nonincreasing over rounds (LR_RATE is sized under the
    smoothness bound, so a rise means a broken gradient); (2) the
    trajectory starts at the w=0 loss ln(2); (3) the trained filter's
    keep decisions agree with scoring the feature frame under the
    final trajectory weights; (4) training beats chance at imitating
    the heuristic label (accuracy > max(class prior))."""
    import math

    from distributed_mapreduce_server_spark.operators.text import (
        LR_TRAIN_ROUNDS,
        text_quality_train,
        text_quality_trained_filter,
    )

    rows = text_quality_train(spark, sf_smoke).collect()
    assert [r["round"] for r in rows] == list(range(LR_TRAIN_ROUNDS + 1))
    losses = [r["loss"] for r in rows]
    assert abs(losses[0] - round(math.log(2), 6)) < 1e-9
    for a, b in zip(losses, losses[1:]):
        assert b <= a + 1e-9, losses
    assert losses[-1] < losses[0]  # actually learned something
    filt = text_quality_trained_filter(spark, sf_smoke).collect()
    assert filt
    n = len(filt)
    pos = sum(1 for r in filt if r["heuristic_label"])
    prior = max(pos, n - pos) / n
    acc = sum(1 for r in filt if r["keep"] == r["heuristic_label"]) / n
    assert acc >= prior - 1e-9, (acc, prior)
    for r in filt:
        assert (r["model_score"] >= 0.5) == r["keep"]


def test_ivf_trained_codebook_recall_not_worse_than_standin(spark, sf_smoke):
    """Training exists to help routing: the trained coarse codebook's
    IVF recall@k must be >= the former fixed-subset stand-in's at the
    registry probe width (measured r9 stand-in recalls: ivf .42,
    ivfpq .24, pq_adc .22 at sf0.1)."""
    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.operators.similarity import (
        N_CENTROIDS,
        N_PROBE,
        N_QUERIES,
        _ivf_topk,
        sim_cosine_topk,
    )
    from pyspark.sql import functions as F

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_cosine_topk(spark, sf_smoke).collect()
    }
    emb = load_tables(spark, sf_smoke, register_views=False)["embeddings"]
    standin = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CENTROIDS)
    )
    from distributed_mapreduce_server_spark.operators.similarity import (
        _collect_matrix,
    )

    old = {
        (r["query_id"], r["neighbor_id"])
        for r in _ivf_topk(
            spark, sf_smoke, N_PROBE, centroids=_collect_matrix(standin)
        ).collect()
    }
    new = {
        (r["query_id"], r["neighbor_id"])
        for r in _ivf_topk(spark, sf_smoke, N_PROBE).collect()
    }
    assert len(new & exact) >= len(old & exact)
