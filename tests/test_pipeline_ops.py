"""Behavioral invariants for the round-3 pipeline operators — the
oracle-parity sweep proves value equality; these prove the operators
are NOT VACUOUS on the test corpora (gaps exist and get filled, the
tolerance actually nulls stale matches, every diff class occurs, the
sketch estimates sit in their exact regime, packing respects budgets).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_server_spark import registry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return registry.all_queries()


def test_gapfill_fills_real_gaps(spark, queries):
    """The dense grid must contain genuine gap buckets (n_events=0,
    zero additive value) AND carry the LOCF average across them."""
    df = queries["q_time_bucket_gapfill"](spark, SF).persist()
    try:
        gaps = df.filter(F.col("n_events") == 0)
        n_gaps = gaps.count()
        assert n_gaps > 0, "corpus has no empty hour buckets — test is vacuous"
        assert gaps.filter(F.col("total_value") != 0.0).count() == 0
        # after each type's first observed bucket, LOCF must be non-null
        filled = gaps.filter(F.col("locf_avg_value").isNotNull()).count()
        assert filled > 0
        # grid is dense: per type, bucket count == (max-min)/1h + 1
        spans = df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            (
                (F.unix_timestamp(F.max("bucket")) - F.unix_timestamp(F.min("bucket")))
                / 3600
                + 1
            ).cast("long").alias("expect"),
        )
        assert spans.filter(F.col("n") != F.col("expect")).count() == 0
    finally:
        df.unpersist()


def test_asof_tolerance_nulls_stale_matches(spark, queries):
    """The tolerance bound must actually fire: some clicks whose last
    purchase is older than the window lose their match vs the
    unbounded as-of."""
    base = queries["q_asof_last_purchase"](spark, SF)
    tol = queries["q_asof_tolerance"](spark, SF)
    n_base = base.filter(F.col("last_purchase_id").isNotNull()).count()
    n_tol = tol.filter(F.col("last_purchase_id").isNotNull()).count()
    assert 0 < n_tol < n_base


def test_scd2_versions_are_contiguous_intervals(spark, queries):
    """Validity intervals must tile each user's timeline: valid_to of
    version k equals valid_from of version k+1; exactly one current
    row per user; no zero-length runs (consecutive same states were
    collapsed)."""
    from pyspark.sql.window import Window

    df = queries["q_events_scd2"](spark, SF).persist()
    try:
        assert df.filter(F.col("is_current")).groupBy("user_id").count().filter(
            F.col("count") != 1
        ).count() == 0
        w = Window.partitionBy("user_id").orderBy("version")
        chained = df.withColumn("next_from", F.lead("valid_from").over(w))
        assert chained.filter(
            F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
        ).count() == 0
        run_change = df.withColumn("prev_state", F.lag("state").over(w))
        assert run_change.filter(
            F.col("prev_state").isNotNull() & (F.col("prev_state") == F.col("state"))
        ).count() == 0
    finally:
        df.unpersist()


def test_snapshot_diff_partitions_key_space(spark, queries):
    """The labeled keys must exactly cover the current-state key set;
    sf0.01's dense little corpus has no born-since keys (every key
    exists 14 days before the end), so 'added' is exercised at sf0.1
    in the companion test."""
    df = queries["q_snapshot_diff"](spark, SF).persist()
    try:
        kinds = {r["change_type"] for r in df.select("change_type").distinct().collect()}
        assert kinds == {"updated", "unchanged"}
        latest = queries["q_events_latest_per_key"](spark, SF)
        assert df.count() == latest.count()
    finally:
        df.unpersist()


def test_snapshot_diff_all_classes_at_sf01(spark, queries):
    """At sf0.1 the 14-day lag exercises every change class, including
    keys born after the previous snapshot."""
    df = queries["q_snapshot_diff"](spark, "/root/testdata/sf0.1")
    kinds = {r["change_type"] for r in df.select("change_type").distinct().collect()}
    assert kinds == {"added", "updated", "unchanged"}


def test_shard_manifest_respects_budget(spark, queries):
    """No shard may exceed the byte budget unless it holds a single
    oversized item, shards are modality-pure by construction, and
    shard ids are contiguous from 0 per type."""
    from distributed_mapreduce_server_spark.operators.multimodal import (
        SHARD_BYTE_BUDGET,
    )

    df = queries["mm_shard_manifest"](spark, SF).persist()
    try:
        per_shard = df.groupBy("media_type", "shard_id").agg(
            F.sum("n_bytes").alias("total"), F.count("*").alias("n_items")
        )
        assert per_shard.filter(
            (F.col("total") > SHARD_BYTE_BUDGET) & (F.col("n_items") > 1)
        ).count() == 0
        ids = per_shard.groupBy("media_type").agg(
            F.min("shard_id").alias("lo"),
            F.max("shard_id").alias("hi"),
            F.count("*").alias("n"),
        )
        assert ids.filter(
            (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)
        ).count() == 0
    finally:
        df.unpersist()


def test_theta_setops_algebra_consistent(spark, queries):
    """Inclusion-exclusion must hold exactly in the sketches' exact
    regime: either = clickers + purchasers - both; click_only =
    clickers - both."""
    row = queries["q_events_theta_setops"](spark, SF).collect()[0]
    assert row["n_either"] == row["n_clickers"] + row["n_purchasers"] - row["n_both"]
    assert row["n_click_only"] == row["n_clickers"] - row["n_both"]
    assert row["n_both"] > 0


def test_tokenize_ids_within_vocab_and_oov_consistent(spark, queries):
    """Every emitted id prefix stays within [0, VOCAB_SIZE]; documents
    with OOV tokens exist (the vocab is smaller than the token set),
    and n_oov never exceeds n_tokens."""
    from distributed_mapreduce_server_spark.operators.text import VOCAB_SIZE

    df = queries["text_tokenize_to_ids"](spark, SF).persist()
    try:
        assert df.filter(F.col("n_oov") > F.col("n_tokens")).count() == 0
        assert df.filter(F.col("n_oov") > 0).count() > 0
        bad = df.filter(
            F.exists(
                F.transform(
                    F.split("first_ids", ","), lambda s: s.cast("int")
                ),
                lambda i: (i < 0) | (i > VOCAB_SIZE),
            )
        )
        assert bad.count() == 0
    finally:
        df.unpersist()


def test_bpe_pairs_are_single_chars(spark, queries):
    """Merge-step-1 pairs are exactly two single-character symbols and
    strictly positive corpus-weighted counts, descending."""
    rows = queries["text_bpe_pair_counts"](spark, SF).collect()
    assert len(rows) == 20
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True) and cnts[-1] > 0
    for r in rows:
        a, b = r["pair"].split(" ")
        assert len(a) == 1 and len(b) == 1


def test_exact_substr_coverage_bounds(spark, queries):
    """Duplicate-span detection is non-vacuous (the corpus carries
    real duplicated >= L-token runs, including fully-covered docs)
    and structurally sound: coverage never exceeds the doc's token
    count, and sub-L docs are never covered. (sf0.01 has no exact
    whole-doc duplicate pairs, so the fully-covered docs here come
    from internal repetition — asserted below.)"""
    df = queries["dedup_exact_substr"](spark, SF).persist()
    try:
        assert df.filter(F.col("n_dup_covered") > F.col("n_tokens")).count() == 0
        flagged = df.filter(F.col("n_dup_covered") > 0)
        assert flagged.count() > 0
        # fully-covered docs exist (the corpus has no exact whole-doc
        # dups at sf0.01 — these are docs whose every L-gram repeats,
        # i.e. internal boilerplate repetition, exactly the pattern
        # span-removal dedup exists to catch and MinHash misses)
        assert df.filter(F.col("dup_frac") == 1.0).count() > 0
        # a doc shorter than L tokens can never be covered
        from distributed_mapreduce_server_spark.operators.dedup import SUBSTR_L

        assert df.filter(
            (F.col("n_tokens") < SUBSTR_L) & (F.col("n_dup_covered") > 0)
        ).count() == 0
    finally:
        df.unpersist()


def test_bpe_train_merge_table(spark, queries):
    """The trainer's round 1 must equal the standalone pair statistic's
    top pair; the table is well-formed (ranks 1..N, merged = left ||
    right, positive counts); and later merges may reference earlier
    merged symbols (that's what makes it BPE, not a bigram list)."""
    from distributed_mapreduce_server_spark.operators.text import (
        BPE_TRAIN_MERGES,
    )

    rows = queries["text_bpe_train"](spark, SF).collect()
    assert [r["merge_rank"] for r in rows] == list(
        range(1, BPE_TRAIN_MERGES + 1)
    )
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]
        assert r["weighted_count"] > 0
    top_pair = queries["text_bpe_pair_counts"](spark, SF).collect()[0]
    assert f"{rows[0]['left']} {rows[0]['right']}" == top_pair["pair"]
    assert rows[0]["weighted_count"] == top_pair["cnt"]
    symbols = {r["merged"] for r in rows}
    assert any(
        r["left"] in symbols or r["right"] in symbols for r in rows[1:]
    ), "no merge built on an earlier merge — degenerate corpus or bug"


def test_data_quality_audit_clean_corpus(spark, queries):
    """The synthetic corpus is clean: every violation/orphan/dup check
    must be exactly zero while the row counts are positive — and the
    check set is the full declared inventory."""
    rows = {r["check"]: r["value"] for r in queries["q_data_quality_audit"](spark, SF).collect()}
    assert len(rows) == 12
    for name, v in rows.items():
        if name.endswith("row_count"):
            assert v > 0, name
        else:
            assert v == 0.0, (name, v)


def test_decode_real_import_guard():
    """The real media decoder must raise MediaDecodeUnavailable when
    the lib is absent (so the pipeline's documented fallback path
    fires), decode a genuine payload when the lib IS present, and
    classify undecodable bytes as MediaDecodeError."""
    from distributed_mapreduce_server_spark.operators import multimodal as mm

    try:
        from PIL import Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    if has_pil:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (7, 5), (10, 20, 30)).save(buf, format="PNG")
        rec = mm._decode_real(buf.getvalue(), "image")
        assert (rec["width"], rec["height"]) == (7, 5)
        with pytest.raises(mm.MediaDecodeError):
            mm._decode_real(b"not an image", "image")
    else:
        with pytest.raises(mm.MediaDecodeUnavailable):
            mm._decode_real(b"not an image", "image")
    # no video decoder is ever vendored
    with pytest.raises(mm.MediaDecodeUnavailable):
        mm._decode_real(b"xx", "video")
