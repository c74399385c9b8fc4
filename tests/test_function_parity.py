"""Cross-engine parity for the hash and tokenizer cores (beside the
rounding parity suite): functions.md5_u60 / seeded_u60 and
functions.tokens must equal their documented DuckDB twins on
adversarial inputs — unicode, punctuation runs, digits, empties —
because every oracle in the repo is built on those twins.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from distributed_mapreduce_server_spark.functions import (
    MINHASH_P32,
    md5_u60,
    perm_constants,
    seeded_u60,
    tokens,
)

ADVERSARIAL = [
    "",
    " ",
    "hello world",
    "HELLO-World_123",
    "   leading and trailing   ",
    "punct!!!only???",
    "tabs\tand\nnewlines\r\nmixed",
    "café naïve über 東京 مرحبا",
    "a" * 500,
    "0123456789",
    "CamelCase and ALLCAPS and miXEd",
    "emoji 🙂 inside 🚀 text",
    "null\x00byte",  # parquet-legal, regex-edge
    "quotes 'single' \"double\" `back`",
    "a-b-c-d-e-f",
    "ends with separator-",
    "-starts with separator",
]


@pytest.fixture(scope="module")
def frames(spark):
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "i int, text string"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(ADVERSARIAL))
    )
    return sdf, con


def test_md5_u60_matches_duckdb(frames):
    sdf, con = frames
    got = {
        r["i"]: r["h"] for r in sdf.select("i", md5_u60(F.col("text")).alias("h")).collect()
    }
    exp = dict(
        con.execute(
            "SELECT i, CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) FROM t"
        ).fetchall()
    )
    assert got == exp


def test_seeded_u60_matches_duckdb(frames):
    sdf, con = frames
    for seed in (0, 7, 123456):
        got = {
            r["i"]: r["h"]
            for r in sdf.select(
                "i", seeded_u60(F.col("text"), seed).alias("h")
            ).collect()
        }
        exp = dict(
            con.execute(
                "SELECT i, CAST(concat('0x', substr(md5(concat(?, text)), 1, 15))"
                " AS BIGINT) FROM t",
                [f"{seed}|"],
            ).fetchall()
        )
        assert got == exp, f"seed {seed}"


def test_tokens_matches_duckdb(frames):
    sdf, con = frames
    got = {
        r["i"]: list(r["t"])
        for r in sdf.select("i", tokens("text").alias("t")).collect()
    }
    exp = dict(
        con.execute(
            "SELECT i, list_filter(regexp_split_to_array(lower(text),"
            " '[^a-z0-9]+'), x -> x <> '') FROM t"
        ).fetchall()
    )
    assert got == {k: list(v) for k, v in exp.items()}


def test_minhash_permutation_exact_in_both_engines(frames):
    """perm(h) = (a*h + b) mod P32 over 32-bit base hashes must be
    exact BIGINT arithmetic in both engines (no double rounding)."""
    sdf, con = frames
    a, b = perm_constants(4)[3]
    h32 = md5_u60(F.col("text")).bitwiseAND(F.lit((1 << 32) - 1))
    got = {
        r["i"]: r["p"]
        for r in sdf.select(
            "i", ((F.lit(a) * h32 + F.lit(b)) % F.lit(MINHASH_P32)).alias("p")
        ).collect()
    }
    exp = dict(
        con.execute(
            f"SELECT i, ({a} * (CAST(concat('0x', substr(md5(text), 1, 15))"
            f" AS BIGINT) & 4294967295) + {b}) % {MINHASH_P32} FROM t"
        ).fetchall()
    )
    assert got == exp
