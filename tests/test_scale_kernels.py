"""Unit parity for the two-phase kernels (operators/scale.py): the
distributed rank / running-sum / sliding-window shapes must produce
bit-identical results to the monolithic window formulations they
replace, including across range-partition boundaries (the session
runs them over many more partitions than rows-per-group, so boundary
handling is exercised hard)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_mapreduce_server_spark.operators.scale import (
    ntile_from_rank,
    two_phase_rank,
    two_phase_sliding,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def toy(spark):
    # 3 groups x uneven sizes, deterministic values with ties in v
    rows = []
    for g in ("a", "b", "c"):
        n = {"a": 57, "b": 8, "c": 113}[g]
        for i in range(n):
            rows.append((g, float((i * 7) % 13), i))
    return spark.createDataFrame(rows, "g string, v double, id int").persist()


def test_grouped_rank_matches_window(spark, toy):
    ranked, total = two_phase_rank(
        spark, toy, ["v", "id"], group_cols=["g"], rn_col="rn",
        sum_cols=["v"], n_col="n_g",
    )
    w = Window.partitionBy("g").orderBy("v", "id")
    expect = (
        toy.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cum_v",
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("n_g", F.count("*").over(Window.partitionBy("g")))
    )
    got = {
        (r["g"], r["id"]): (r["rn"], round(r["cum_v"], 6), r["n_g"])
        for r in ranked.collect()
    }
    want = {
        (r["g"], r["id"]): (r["rn"], round(r["cum_v"], 6), r["n_g"])
        for r in expect.collect()
    }
    assert total == toy.count()
    assert got == want
    ranked.unpersist()


def test_ungrouped_rank_matches_window(spark, toy):
    ranked, total = two_phase_rank(spark, toy, ["v", "g", "id"], rn_col="rn")
    w = Window.orderBy("v", "g", "id")
    want = {
        (r["g"], r["id"]): r["rn"]
        for r in toy.withColumn("rn", F.row_number().over(w)).collect()
    }
    got = {(r["g"], r["id"]): r["rn"] for r in ranked.collect()}
    assert got == want and total == len(want)
    ranked.unpersist()


@pytest.mark.parametrize("n", [3, 10, 57, 113])
def test_ntile_formula_matches_spark_ntile(spark, n):
    df = spark.range(n).withColumn("v", (F.col("id") * 31) % 17)
    w = Window.orderBy("v", "id")
    expect = df.withColumn("t", F.ntile(10).over(w))
    got = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("t2", ntile_from_rank(F.col("rn"), F.lit(n), 10))
    )
    pairs = {r["id"]: r["t"] for r in expect.collect()}
    pairs2 = {r["id"]: r["t2"] for r in got.collect()}
    assert pairs == pairs2


def _sliding_vs_window(spark, df):
    slid = two_phase_sliding(
        spark, df, ["v", "id"], ["g"], "v",
        frame_before=3, frame_after=0, lags=(1,), leads=(1,),
    )
    w = Window.partitionBy("g").orderBy("v", "id")
    expect = (
        df.withColumn("frame_avg", F.avg("v").over(w.rowsBetween(-3, 0)))
        .withColumn("lag_1", F.lag("v", 1).over(w))
        .withColumn("lead_1", F.lead("v", 1).over(w))
    )
    key = lambda r: (r["g"], r["id"])  # noqa: E731
    norm = lambda r: (  # noqa: E731
        round(r["frame_avg"], 9),
        r["lag_1"],
        r["lead_1"],
    )
    got = {key(r): norm(r) for r in slid.collect()}
    want = {key(r): norm(r) for r in expect.collect()}
    assert got == want


def test_sliding_matches_window(spark, toy):
    _sliding_vs_window(spark, toy)


def test_sliding_sparse_partitions(spark):
    """The round-5 review's killer case for the old halo design: far
    fewer rows than range partitions, so every (partition, group) run
    is thinner than the frame depth. The contribution formulation
    must still produce the exact monolithic-window frames."""
    rows = [("g", float((i * 7) % 13), i) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, v double, id int")
    _sliding_vs_window(spark, df)


def test_grouped_rank_keeps_null_groups(spark):
    """A NULL group key is its own window partition in the monolithic
    formulation; the kernel's offset join must be null-safe or those
    rows silently vanish (round-5 review finding)."""
    df = spark.createDataFrame(
        [("a", 1.0, 1), (None, 2.0, 2), ("a", 3.0, 3), (None, 0.5, 4)],
        "g string, v double, id int",
    )
    ranked, total = two_phase_rank(
        spark, df, ["v", "id"], group_cols=["g"], rn_col="rn", n_col="n_g"
    )
    got = {(r["g"], r["id"]): (r["rn"], r["n_g"]) for r in ranked.collect()}
    ranked.unpersist()
    assert total == 4 and len(got) == 4
    assert got[(None, 4)] == (1, 2) and got[(None, 2)] == (2, 2)
    assert got[("a", 1)] == (1, 2) and got[("a", 3)] == (2, 2)


def test_two_phase_windows_partition_by_pid(spark):
    """The kernel's own windows must partition by the range pid —
    that's the whole point; pin it so a refactor can't quietly fall
    back to the low-cardinality partition spec. Inspected on the
    kernel's LAZY frame (materialize=False): the eager path
    localCheckpoints, which cuts lineage and hides the window."""
    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.plans import window_partition_specs

    cust = load_tables(spark, SF, register_views=False)["customer"]
    ranked, _, tagged = two_phase_rank(
        spark,
        cust.select("c_custkey", "c_nationkey", "c_acctbal"),
        ["c_acctbal", "c_custkey"],
        group_cols=["c_nationkey"],
        rn_col="rn",
        n_col="n_nat",
        materialize=False,
    )
    try:
        specs = window_partition_specs(ranked)
        assert specs, "expected at least one window in the plan"
        for cols in specs:
            assert "__pid" in cols, f"window not pid-partitioned: {cols}"
    finally:
        tagged.unpersist()


@pytest.fixture(scope="module")
def hot_user_dir(tmp_path_factory):
    """sf0.001 with one NEW user holding 20k 'view' events — a 20x
    corpus-dominating hot key. Existing users' event sequences are
    untouched, so per-user operators must return exactly their
    baseline results for everyone else."""
    import shutil

    import pandas as pd

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sfhot")
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copy(f"{src}/{t}.parquet", dst / f"{t}.parquet")
    ev = pd.read_parquet(f"{src}/events.parquet")
    n_hot = 20_000
    hot = pd.DataFrame(
        {
            "event_id": range(1_000_000, 1_000_000 + n_hot),
            "ts": pd.date_range("2024-01-01", periods=n_hot, freq="s"),
            "user_id": 999_999,
            "event_type": "view",
            "value": 1.0,
            "props": '{"k": 0}',
        }
    ).astype(ev.dtypes.to_dict())
    pd.concat([ev, hot], ignore_index=True).to_parquet(
        dst / "events.parquet", index=False
    )
    return str(dst)


def test_window_funnel_hot_user_isolated(spark, hot_user_dir):
    """One corpus-dominating user must shift q_window_funnel's level
    histogram by EXACTLY their own row (view-only -> level 1) and
    leave every other user's level untouched — per-user windows
    isolate skew by construction; this pins it."""
    from distributed_mapreduce_server_spark import registry

    q = registry.all_queries()["q_window_funnel"]
    base = {r["max_level"]: r["n_users"] for r in q(spark, "/root/testdata/sf0.001").collect()}
    hot = {r["max_level"]: r["n_users"] for r in q(spark, hot_user_dir).collect()}
    expected = dict(base)
    expected[1] = expected.get(1, 0) + 1
    assert hot == expected


def test_events_paths_hot_user_isolated(spark, hot_user_dir):
    """q_events_paths with the hot user: their 19,998 'view > view >
    view' journeys take rank 1; every other returned path must carry
    its exact baseline count (other users' sequences are untouched)."""
    from distributed_mapreduce_server_spark import registry

    q = registry.all_queries()["q_events_paths"]
    base = [(r["path"], r["n_journeys"]) for r in q(spark, "/root/testdata/sf0.001").collect()]
    hot = [(r["path"], r["n_journeys"]) for r in q(spark, hot_user_dir).collect()]
    # 19,998 hot journeys + however many baseline vvv journeys exist
    # (possibly below the baseline top-20 cutoff, so >=)
    assert hot[0][0] == "view > view > view" and hot[0][1] >= 19_998
    assert hot[1:] == [p for p in base if p[0] != "view > view > view"][: len(hot) - 1]


def test_grouped_rank_running_max_matches_window(spark, toy):
    """max_cols: the kernel's running max (frontier shape) must equal
    the monolithic cumulative-max window, including across range
    partition boundaries."""
    ranked, _ = two_phase_rank(
        spark, toy, ["id"], group_cols=["g"], rn_col="rn", max_cols=["v"]
    )
    w = (
        Window.partitionBy("g")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["g"], r["id"]): r["m"]
        for r in toy.withColumn("m", F.max("v").over(w)).collect()
    }
    got = {(r["g"], r["id"]): r["cummax_v"] for r in ranked.collect()}
    ranked.unpersist()
    assert got == want


def test_two_phase_totals_sums_match_direct_agg(spark):
    """TwoPhaseTotals.sums (grand sums accumulated driver-side from
    the stats pass's per-partition partials) must equal a direct
    aggregation — including NULL handling (`__sum_<c> or 0.0` must not
    turn an all-NULL group into a crash or a wrong total) and DECIMAL
    sum_cols (accumulated in double precision per the kernel's
    documented contract)."""
    from decimal import Decimal

    rows = [
        ("a", 1.5, Decimal("1.10"), 1),
        ("a", None, Decimal("2.20"), 2),
        ("b", 2.5, None, 3),
        ("b", -4.0, Decimal("-0.30"), 4),
        (None, None, None, 5),
    ]
    df = spark.createDataFrame(
        rows, "g string, v double, d decimal(10,2), id int"
    )
    ranked, totals = two_phase_rank(
        spark, df, ["id"], group_cols=["g"], rn_col="rn",
        sum_cols=["v", "d"],
    )
    direct = df.groupBy().agg(
        F.sum("v").alias("sv"), F.sum("d").alias("sd"), F.count("*").alias("n")
    ).collect()[0]
    ranked.unpersist()
    assert totals.rows == int(totals) == direct["n"] == 5
    assert abs(totals.sums["v"] - float(direct["sv"])) < 1e-9
    assert abs(totals.sums["d"] - float(direct["sd"])) < 1e-9
