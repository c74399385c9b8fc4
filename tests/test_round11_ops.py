"""Round-11 contracts: the exact-eval sampling contract
(EXACT_EVAL_SAMPLE_BOUND hash-sample for the quadratic trust-row
baselines) and the LSH bucket fan-out cap (LSH_BUCKET_CAP) — the two
scale fixes of VERDICT r10 tasks 3/4. The parity suite already pins
the BELOW-bound path (identical to full exact); these tests force the
sampled/capped paths that the test SFs never reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_server_spark.operators import dedup


def _rows_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_forced_full_sample_is_byte_identical_routed_eval(spark, sf_smoke, monkeypatch):
    """Forcing the sample path with a target >= corpus keeps every
    vector, so dedup_routed_eval must return the exact same row as the
    unforced (full-exact) run — the sample predicate itself changes
    nothing but the plan."""
    full = _rows_sorted(dedup.dedup_routed_eval(spark, sf_smoke))
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_BOUND", 0)
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_TARGET", 10**9)
    forced = _rows_sorted(dedup.dedup_routed_eval(spark, sf_smoke))
    assert forced == full


def test_forced_subsample_routed_eval_contract(spark, sf_smoke, monkeypatch):
    """A genuine sub-corpus sample: the eval corpus shrinks, the
    full-corpus columns (n_candidates, n_brute_pairs) do not move, and
    recall stays a valid within-sample proportion."""
    full = dedup.dedup_routed_eval(spark, sf_smoke).collect()[0]
    n = full["n_eval_vecs"]
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_BOUND", 0)
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_TARGET", n // 2)
    s = dedup.dedup_routed_eval(spark, sf_smoke).collect()[0]
    assert 0 < s["n_eval_vecs"] < n
    assert s["n_exact_pairs"] <= full["n_exact_pairs"]
    assert s["n_routed_pairs"] <= s["n_exact_pairs"]  # routed ⊆ exact
    assert 0.0 <= s["recall"] <= 1.0
    assert s["n_candidates"] == full["n_candidates"]
    assert s["n_brute_pairs"] == full["n_brute_pairs"]


def test_forced_full_sample_is_byte_identical_probe_sweep(spark, sf_smoke, monkeypatch):
    full = _rows_sorted(dedup.dedup_routed_probe_sweep(spark, sf_smoke))
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_BOUND", 0)
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_TARGET", 10**9)
    forced = _rows_sorted(dedup.dedup_routed_probe_sweep(spark, sf_smoke))
    assert forced == full


def test_forced_full_sample_is_byte_identical_br_sweep(spark, sf_smoke, monkeypatch):
    full = _rows_sorted(dedup.dedup_lsh_br_sweep(spark, sf_smoke))
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_BOUND", 0)
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_TARGET", 10**9)
    forced = _rows_sorted(dedup.dedup_lsh_br_sweep(spark, sf_smoke))
    assert forced == full


def test_forced_subsample_br_sweep_recall_is_within_sample(spark, sf_smoke, monkeypatch):
    """Sub-sampled exhaustive baseline: recall stays a proportion, the
    layout's own output size (n_verified_pairs) and candidate budget
    are full-corpus and therefore unchanged."""
    full = {
        (r["n_bands"], r["rows_per_band"]): r
        for r in dedup.dedup_lsh_br_sweep(spark, sf_smoke).collect()
    }
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_BOUND", 0)
    monkeypatch.setattr(dedup, "EXACT_EVAL_SAMPLE_TARGET", 250)
    for r in dedup.dedup_lsh_br_sweep(spark, sf_smoke).collect():
        f = full[(r["n_bands"], r["rows_per_band"])]
        assert r["n_candidate_pairs"] == f["n_candidate_pairs"]
        assert r["n_verified_pairs"] == f["n_verified_pairs"]
        assert r["n_exact_pairs"] <= f["n_exact_pairs"]
        assert 0.0 <= r["recall"] <= 1.0


def test_sample_predicate_is_deterministic(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    a, sa = dedup._exact_eval_sample(emb, "vec_id", 500, bound=0, target=250)
    b, sb = dedup._exact_eval_sample(emb, "vec_id", 500, bound=0, target=250)
    assert sa and sb
    ra, rb = (sorted(r["vec_id"] for r in d.select("vec_id").collect()) for d in (a, b))
    assert ra == rb
    assert 0 < len(ra) < 500


def test_bucket_cap_bounds_hot_bucket_fanout(spark):
    """Synthetic hot bucket (VERDICT r10 task 4's unit test): one
    band value shared by 400 docs, one by 3. With cap=20, the hot
    bucket's self-join fan-out collapses from C(400,2) to ~C(20,2),
    the cold bucket is untouched, and the truncation is COUNTED."""
    rows = [(i, 0, "hot") for i in range(400)] + [
        (1000 + i, 0, "cold") for i in range(3)
    ]
    bands = spark.createDataFrame(
        rows, "doc_id long, band_idx int, band_sig string"
    )
    cand, n_capped, holder = dedup._capped_band_candidates(bands, cap=20)
    assert n_capped == 1
    pairs = cand.collect()
    cold = [p for p in pairs if p["doc_a"] >= 1000]
    assert len(cold) == 3  # C(3,2) — under-cap buckets keep all pairs
    hot = [p for p in pairs if p["doc_a"] < 1000]
    # expected kept ~ cap members -> ~C(cap,2) pairs; allow the
    # binomial tail but demand the quadratic blowup is gone
    assert len(hot) < 1000  # vs C(400,2) = 79800 uncapped
    # deterministic: second run bit-identical
    cand2, _, holder2 = dedup._capped_band_candidates(bands, cap=20)
    assert _rows_sorted(cand2) == _rows_sorted(cand)
    holder.unpersist()
    holder2.unpersist()


def test_bucket_cap_inactive_below_cap(spark):
    """No bucket over the cap -> the helper is a pure pass-through of
    the uncapped self-join (the test-SF regime the oracles pin)."""
    rows = [(i, b, f"s{i % 5}") for i in range(30) for b in (0, 1)]
    bands = spark.createDataFrame(
        rows, "doc_id long, band_idx int, band_sig string"
    )
    cand, n_capped, _holder = dedup._capped_band_candidates(bands, cap=4096)
    assert n_capped == 0
    ba, bb = bands.alias("a"), bands.alias("b")
    ref = (
        ba.join(
            bb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    assert _rows_sorted(cand) == _rows_sorted(ref)


def test_pca_invariants_all_true(spark, sf_smoke):
    """The oracle pins these TRUE; this is the local early-warning
    (and covers the PCA_K row-count contract)."""
    from distributed_mapreduce_server_spark.operators.similarity import (
        PCA_K,
        emb_pca_invariants,
    )

    rows = emb_pca_invariants(spark, sf_smoke).collect()
    assert len(rows) == PCA_K
    for r in rows:
        assert r["mean_zero"]
        assert r["var_matches_eigenvalue"]
        assert r["orthonormal"]
        assert r["variance_ordered"]
        assert r["cov_trace"] > 0


def test_nested_router_dominates_flat_at_smoke(spark, sf_smoke):
    """VERDICT r10 task 6's 'Done' bar, made executable: the nested
    router must match-or-beat the flat router's recall on no more
    candidates (measured sf0.1: 0.9653 @ 833,741 vs 0.9375 @
    1,124,809; smoke: 1.0 @ 60,607 vs 1.0 @ 69,738)."""
    from distributed_mapreduce_server_spark.operators.dedup import (
        dedup_routed_eval,
        dedup_routed_nested_eval,
    )

    flat = dedup_routed_eval(spark, sf_smoke).collect()[0]
    nested = dedup_routed_nested_eval(spark, sf_smoke).collect()[0]
    assert nested["recall"] >= flat["recall"]
    assert nested["n_candidates"] <= flat["n_candidates"]
    assert nested["n_exact_pairs"] == flat["n_exact_pairs"]


def test_nested_pairs_consistent_with_eval(spark, sf_smoke):
    """No sampling below the bound: the nested router's emitted pair
    count equals the eval row's numerator, and every pair is
    exact-verified at the dedup threshold."""
    from distributed_mapreduce_server_spark.operators.dedup import (
        COSINE_DEDUP_T,
        dedup_routed_nested_eval,
        dedup_semantic_routed_nested,
    )

    pairs = dedup_semantic_routed_nested(spark, sf_smoke).collect()
    ev = dedup_routed_nested_eval(spark, sf_smoke).collect()[0]
    assert len(pairs) == ev["n_routed_pairs"]
    assert all(p["cos_sim"] >= COSINE_DEDUP_T for p in pairs)
    assert all(p["vec_a"] < p["vec_b"] for p in pairs)


def test_ann_recall_on_clustered_geometry(spark, tmp_path_factory):
    """VERDICT r10 task 7: the ANN arms' absolute recall on the FROZEN
    corpus (.10-.48) is geometry-limited — near-isotropic 64-dim where
    no coarse partition can certify neighbors. Production embedding
    corpora are CLUSTERED; this fixture synthesizes that regime
    (46 well-separated centers, 11 members each, deterministic md5
    noise — cluster size 11 makes the exact top-10 exactly the rest of
    the query's cluster, so the eval measures cluster-level routing,
    the granularity an ANN index actually serves) and demands every
    arm, the quantized ivfpq/pq_adc ones explicitly, clears 0.8.
    Measured: all five arms at 1.0 (noise 0.2 and 0.3 both)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_mapreduce_server_spark.operators.similarity import (
        sim_ann_eval,
    )

    def u(s: str) -> float:
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16) / 16**12

    C, N, D, noise = 46, 506, 64, 0.2
    centers = np.array(
        [[2 * u(f"c{c},{d}") - 1 for d in range(D)] for c in range(C)]
    )
    X = np.empty((N, D))
    for i in range(N):
        X[i] = centers[i % C] + np.array(
            [noise * (u(f"v{i},{d}") - 0.5) for d in range(D)]
        )
    d = tmp_path_factory.mktemp("ann_clustered")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in X], pa.list_(pa.float32())
            ),
            "label": pa.array([i % C for i in range(N)], pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    recalls = {
        r["arm"]: r["recall_at_k"]
        for r in sim_ann_eval(spark, str(d)).collect()
    }
    assert recalls["ivfpq"] > 0.8, recalls
    assert recalls["pq_adc"] > 0.8, recalls
    assert all(v > 0.8 for v in recalls.values()), recalls


def test_nested_sweep_monotone_and_agrees_with_nested_eval(spark, sf_smoke):
    """Grid sanity: budgets and recalls are monotone in each width
    axis, and the widest (P1, P2) cell reproduces the nested eval
    row's candidate budget and recall exactly (same assignment, same
    exact baseline)."""
    from distributed_mapreduce_server_spark.operators.dedup import (
        NESTED_P1,
        NESTED_P2,
        NESTED_SWEEP_P1S,
        dedup_nested_probe_sweep,
        dedup_routed_nested_eval,
    )

    grid = {
        (r["p1"], r["p2"]): r
        for r in dedup_nested_probe_sweep(spark, sf_smoke).collect()
    }
    assert len(grid) == len(NESTED_SWEEP_P1S) * NESTED_P2
    for (p1, p2), r in grid.items():
        assert 0.0 <= r["recall"] <= 1.0
        for prev in ((p1 - 2, p2), (p1, p2 - 1)):
            if prev in grid:
                assert grid[prev]["n_candidates"] <= r["n_candidates"]
                assert grid[prev]["n_routed_pairs"] <= r["n_routed_pairs"]
    ev = dedup_routed_nested_eval(spark, sf_smoke).collect()[0]
    widest = grid[(NESTED_P1, NESTED_P2)]
    assert widest["n_candidates"] == ev["n_candidates"]
    assert widest["recall"] == ev["recall"]
    assert widest["n_exact_pairs"] == ev["n_exact_pairs"]


def test_sketch_error_bounds_all_within(spark, sf_smoke):
    """The oracle pins these TRUE; local early-warning plus the
    exact-value sanity (positive, median positive)."""
    from distributed_mapreduce_server_spark.operators.relational import (
        SKETCH_BOUNDS,
        q_sketch_error_bounds,
    )

    rows = q_sketch_error_bounds(spark, sf_smoke).collect()
    assert len(rows) == len(SKETCH_BOUNDS)
    for r in rows:
        assert r["within_bound"], r
        assert r["exact_value"] > 0
