"""Invariants for the round-8 wave (sequential patterns, span-clean
dedup, KL drift audit, kNN-distance outliers, residual IVF-PQ).

Oracle parity is covered by test_oracle_parity; these assert the
cross-operator consistency and semantic properties parity can't see —
the span surgery agrees with the detection pass it composes, KL obeys
Gibbs' inequality, the residual index actually re-ranks differently
from the raw-vector one.
"""

from __future__ import annotations

from distributed_mapreduce_server_spark.operators.dedup import (
    dedup_exact_substr,
    dedup_span_clean,
)
from distributed_mapreduce_server_spark.operators.events import (
    SEQ_PATTERN_TOP_K,
    q_events_sequential_pattern,
)
from distributed_mapreduce_server_spark.operators.similarity import (
    KNN_OUTLIER_SIGMA,
    TOP_K,
    emb_outlier_knn_distance,
    sim_ivfpq_ann,
    sim_ivfpq_residual,
)
from distributed_mapreduce_server_spark.operators.text import (
    text_source_kl_divergence,
)


def test_span_clean_agrees_with_exact_substr(spark, sf_smoke):
    """The surgery must remove EXACTLY the tokens the detection pass
    reports as covered: n_removed == dedup_exact_substr.n_dup_covered
    per doc, and the kept/removed split conserves the token count."""
    detect = {
        r["doc_id"]: r for r in dedup_exact_substr(spark, sf_smoke).collect()
    }
    cleaned = dedup_span_clean(spark, sf_smoke).collect()
    assert len(cleaned) == len(detect)
    for r in cleaned:
        d = detect[r["doc_id"]]
        assert r["n_removed"] == d["n_dup_covered"], r["doc_id"]
        assert r["n_kept"] + r["n_removed"] == r["n_tokens"] == d["n_tokens"]
    # non-vacuous both ways: some docs edited, some untouched
    assert any(r["n_removed"] > 0 for r in cleaned)
    assert any(r["n_removed"] == 0 for r in cleaned)
    # an untouched doc's fingerprint differs from an edited doc's
    fps = {r["clean_fp"] for r in cleaned}
    assert len(fps) > 1


def test_sequential_pattern_support_bounds(spark, sf_smoke):
    rows = q_events_sequential_pattern(spark, sf_smoke).collect()
    assert len(rows) == SEQ_PATTERN_TOP_K
    counts = [r["n_users_with"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0.0 < r["support"] <= 1.0
        assert r["pattern"].count(" > ") == 2


def test_kl_divergence_nonnegative_and_nonvacuous(spark, sf_smoke):
    """Gibbs' inequality: KL >= 0, and at least one source actually
    drifts (strictly positive) — a uniformly-zero column would mean
    the operator degenerated to comparing identical distributions."""
    rows = text_source_kl_divergence(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["kl_divergence"] >= 0.0, r
        assert r["n_tokens"] > 0
    assert any(r["kl_divergence"] > 0.0 for r in rows)


def test_knn_outliers_sit_below_the_gate(spark, sf_smoke):
    """Every flagged vector's z-score must clear the sigma gate, and
    the gate must be non-vacuous (some vectors flagged, most not)."""
    rows = emb_outlier_knn_distance(spark, sf_smoke).collect()
    assert rows, "gate vacuous at smoke SF — retune KNN_OUTLIER_SIGMA"
    for r in rows:
        assert r["z"] < -KNN_OUTLIER_SIGMA + 1e-9
    from distributed_mapreduce_server_spark.catalog import load_tables

    n_vec = load_tables(spark, sf_smoke, register_views=False)[
        "embeddings"
    ].count()
    assert len(rows) < n_vec / 4  # outliers, not a population split


def test_residual_ivfpq_full_slate_and_distinct_ranking(spark, sf_smoke):
    """Both IVFPQ arms emit a full TOP_K slate per query; the residual
    encoding must actually change distances (identical ADC columns
    would mean the residual subtraction is a no-op)."""
    plain = sim_ivfpq_ann(spark, sf_smoke).collect()
    res = sim_ivfpq_residual(spark, sf_smoke).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == TOP_K, q
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
            range(1, TOP_K + 1)
        )
        assert all(r["adc_dist"] >= 0.0 for r in rows)
    assert {(r["query_id"], r["rank"]) for r in plain} == {
        (r["query_id"], r["rank"]) for r in res
    }
    plain_d = {(r["query_id"], r["neighbor_id"]): r["adc_dist"] for r in plain}
    res_d = {(r["query_id"], r["neighbor_id"]): r["adc_dist"] for r in res}
    shared = set(plain_d) & set(res_d)
    assert shared and any(abs(plain_d[k] - res_d[k]) > 1e-6 for k in shared)


def test_stream_kl_drift_equals_batch(spark, sf_smoke):
    """The streaming drift monitor's drained state must yield exactly
    the batch audit's table (complete-mode availableNow == batch)."""
    from distributed_mapreduce_server_spark.streaming.jobs import stream_kl_drift

    stream = sorted(map(tuple, stream_kl_drift(spark, sf_smoke).collect()))
    batch = sorted(map(tuple, text_source_kl_divergence(spark, sf_smoke).collect()))
    assert stream == batch


def test_scene_segments_nonvacuous_and_bounded(spark, sf_smoke):
    """Both outcome classes occur (single-scene and multi-scene
    videos); boundaries list length always equals n_scenes - 1 and
    indices stay inside the frame range."""
    from distributed_mapreduce_server_spark.operators.multimodal import (
        N_FRAMES,
        mm_scene_segments,
    )

    rows = mm_scene_segments(spark, sf_smoke).collect()
    assert rows
    assert any(r["n_scenes"] == 1 for r in rows)
    assert any(r["n_scenes"] > 1 for r in rows)
    for r in rows:
        cuts = [int(x) for x in r["boundaries"].split(",") if x]
        assert len(cuts) == r["n_scenes"] - 1
        assert all(1 <= c < N_FRAMES for c in cuts)
        assert r["max_jump"] >= 0.0


def test_ivf_balance_accounts_for_whole_corpus(spark, sf_smoke):
    """Shares sum to 1, sizes sum to the candidate count, mean
    imbalance is 1 by construction — and the audit actually reports
    skew (not all lists equal)."""
    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.operators.similarity import (
        N_CENTROIDS,
        N_QUERIES,
        emb_ivf_balance,
    )
    from pyspark.sql import functions as F

    rows = emb_ivf_balance(spark, sf_smoke).collect()
    # trained coarse codebook (round 10): dead-at-train clusters drop,
    # so live K can be below N_CENTROIDS — never above
    assert 1 < len(rows) <= N_CENTROIDS
    emb = load_tables(spark, sf_smoke, register_views=False)["embeddings"]
    n_cand = emb.filter(F.col("vec_id") >= N_QUERIES).count()
    assert sum(r["n_vectors"] for r in rows) == n_cand
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    assert len({r["n_vectors"] for r in rows}) > 1  # skew visible


def test_ngram_novelty_bounds_and_first_doc(spark, sf_smoke):
    """Novelty in [0, 1]; the earliest doc with any trigrams scores
    exactly 1.0 (every one of its grams first-occurs in it); per-doc
    novel-gram counts sum to the corpus's distinct-trigram total."""
    from distributed_mapreduce_server_spark.operators.text import (
        text_ngram_novelty,
    )

    rows = text_ngram_novelty(spark, sf_smoke).collect()
    assert rows
    with_grams = [r for r in rows if r["n_grams"] > 0]
    assert with_grams
    first = min(with_grams, key=lambda r: r["doc_id"])
    assert first["novelty"] == 1.0
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert 0 <= r["n_novel"] <= r["n_grams"]
    # every distinct trigram is novel in exactly one doc
    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.functions import tokens
    from pyspark.sql import functions as F

    docs = load_tables(spark, sf_smoke, register_views=False)["documents"]
    total_grams = (
        docs.select(tokens("text").alias("toks"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(toks) - 2, 0)), "
                    "i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1]))"
                )
            ).alias("g")
        )
        .distinct()
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == total_grams


def test_burst_detection_islands_are_maximal(spark, sf_smoke):
    """Bursts are well-formed episodes: end >= start, span == n_hours,
    peak <= total, and two bursts of the same type never touch (a
    shared boundary would mean the island split a maximal run)."""
    from distributed_mapreduce_server_spark.operators.events import (
        q_events_burst_detection,
    )

    rows = q_events_burst_detection(spark, sf_smoke).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        span_h = (r["burst_end"] - r["burst_start"]).total_seconds() / 3600
        assert span_h == r["n_hours"] - 1
        assert r["peak_events"] <= r["total_events"]
        assert r["total_events"] >= r["n_hours"]  # >= 1 event per hot hour
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r["burst_start"])
        for a, b in zip(rs, rs[1:]):
            gap_h = (b["burst_start"] - a["burst_end"]).total_seconds() / 3600
            assert gap_h >= 2, "adjacent hot hours must share one island"


def test_minhash_estimator_matches_theory(spark, sf_smoke):
    """The K=16 estimator must be usable: a non-trivial pair count,
    MAE well under the single-coordinate granularity (1/16), and the
    estimate bounded to the [0, 1] grid."""
    from distributed_mapreduce_server_spark.operators.dedup import (
        dedup_minhash_est_eval,
    )

    (row,) = dedup_minhash_est_eval(spark, sf_smoke).collect()
    assert row["n_pairs"] > 0
    assert 0.0 <= row["avg_est"] <= 1.0 and 0.0 <= row["avg_exact"] <= 1.0
    assert 0.0 <= row["mae"] <= row["max_abs_err"] <= 1.0
    # K=16 binomial std at j~0.97 is ~0.04; MAE beyond 2 std of that
    # would mean the estimator is broken, not just noisy
    assert row["mae"] < 0.1


def test_bpe_fertility_bounds(spark, sf_smoke):
    """Fertility lies between 1 (every word a single symbol) and the
    average word length in chars (no merges applied at all); 10
    merges on this corpus must actually compress (fertility strictly
    below the raw char count per word)."""
    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.functions import tokens
    from distributed_mapreduce_server_spark.operators.text import (
        text_bpe_fertility,
    )
    from pyspark.sql import functions as F

    rows = text_bpe_fertility(spark, sf_smoke).collect()
    assert rows
    docs = load_tables(spark, sf_smoke, register_views=False)["documents"]
    raw = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .agg((F.sum(F.length("t")) / F.count("*")).alias("chars_per_word"))
        .collect()[0]["chars_per_word"]
    )
    for r in rows:
        assert 1.0 <= r["fertility"] < raw
        assert r["total_symbols"] >= r["n_words"]


def test_clustering_coefficient_curve_is_sane(spark, sf_smoke):
    """avg_cc in [0, 1] per degree bucket; node counts over the curve
    sum to the number of deg>=2 nodes; the curve is non-degenerate
    (more than one cc value across buckets)."""
    from distributed_mapreduce_server_spark.operators.graph import (
        q_graph_clustering_coefficient,
    )

    rows = q_graph_clustering_coefficient(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["avg_cc"] <= 1.0
        assert r["n_nodes"] >= 1 and r["d"] >= 2
    assert len({r["avg_cc"] for r in rows}) > 1


def test_payload_entropy_gate_nonvacuous(spark, sf_smoke):
    """Entropy bounded by log2(alphabet); both outcome classes occur
    (some low-entropy payloads flagged, most not); every media type
    reports."""
    from distributed_mapreduce_server_spark.operators.multimodal import (
        ENTROPY_LOW_T,
        mm_payload_entropy,
    )

    rows = mm_payload_entropy(spark, sf_smoke).collect()
    assert {r["media_type"] for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert 0.0 < r["min_entropy"] <= r["avg_entropy"] <= r["max_entropy"] <= 8.0
        assert 0 < r["n_low_entropy"] < r["n_items"]
        assert r["min_entropy"] < ENTROPY_LOW_T <= r["max_entropy"]


def test_stream_burst_detection_equals_batch(spark, sf_smoke):
    """The streaming burst monitor's drained state must yield exactly
    the batch episode table (complete-mode availableNow == batch)."""
    from distributed_mapreduce_server_spark.operators.events import (
        q_events_burst_detection,
    )
    from distributed_mapreduce_server_spark.streaming.jobs import (
        stream_burst_detection,
    )

    stream = sorted(map(tuple, stream_burst_detection(spark, sf_smoke).collect()))
    batch = sorted(map(tuple, q_events_burst_detection(spark, sf_smoke).collect()))
    assert stream == batch


def test_bpe_train_distributed_path_matches_driver_path(spark, sf_smoke, monkeypatch):
    """The bounded-vocab driver trainer and the distributed merge loop
    must be result-identical — forced by dropping the vocab limit
    (the exec-job BROADCAST_KEY_LIMIT fallback-test pattern)."""
    from distributed_mapreduce_server_spark.operators import text as text_mod

    fast = [tuple(r) for r in text_mod.text_bpe_train(spark, sf_smoke).collect()]
    monkeypatch.setattr(text_mod, "BPE_DRIVER_VOCAB_LIMIT", 0)
    slow = [tuple(r) for r in text_mod.text_bpe_train(spark, sf_smoke).collect()]
    assert fast == slow
