"""Cross-engine parity for the rounding core every oracle depends on:
functions.fround (Column), functions.fround_np (numpy), and the
streaming jobs' inline _round2 must all equal DuckDB's ROUND on
doubles — including the scaled representable-.5 ties where Spark's
F.round and numpy's banker's rounding both diverge.

One batched Spark job + one DuckDB query per digit count (not
per-example round trips), over deterministic pseudorandom values plus
an adversarial tie family (k/2^m scalings land exactly on .5 after
scaling far more often than uniform doubles do).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from distributed_mapreduce_server_spark.functions import fround, fround_np


def _values() -> list[float]:
    rng = np.random.RandomState(42)
    vals = list(rng.uniform(-1000, 1000, 300))
    vals += list(rng.uniform(-1, 1, 200))
    # adversarial: dyadic rationals scale onto exact .5 ties
    vals += [k / 2**m for m in range(1, 12) for k in range(-8, 9) if k]
    # the documented F.round divergence case and its family
    vals += [0.058499999999999996, 58.5, -58.5, 2.675, -2.675, 0.5, -0.5, 1.5]
    return [float(v) for v in vals]


@pytest.mark.parametrize("nd", [0, 1, 2, 4, 6])
def test_fround_matches_duckdb_round(spark, nd):
    vals = _values()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, x double")
    got = {
        r["i"]: r["y"]
        for r in sdf.select("i", fround(F.col("x"), nd).alias("y")).collect()
    }
    con = duckdb.connect()
    expect = {
        i: con.execute(f"SELECT ROUND(CAST(? AS DOUBLE), {nd})", [v]).fetchone()[0]
        for i, v in enumerate(vals)
    }
    bad = [
        (i, vals[i], got[i], expect[i])
        for i in got
        if got[i] != expect[i] and not (math.isnan(got[i]) and math.isnan(expect[i]))
    ]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:3]}"


@pytest.mark.parametrize("nd", [0, 2, 4, 6])
def test_fround_np_and_round2_match_column_form(spark, nd):
    """The numpy kernel twin and the streaming inline rounder must be
    bit-identical to the Column form on the same inputs."""
    vals = _values()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, x double")
    col_form = {
        r["i"]: r["y"]
        for r in sdf.select("i", fround(F.col("x"), nd).alias("y")).collect()
    }
    np_form = fround_np(np.array(vals), nd)

    def _round_inline(v: float) -> float:
        scale = 10.0**nd
        a = abs(v) * scale
        return math.copysign(math.floor(a + 0.5) / scale, v)

    for i, v in enumerate(vals):
        assert col_form[i] == np_form[i] == _round_inline(v), (i, v, nd)
