"""Shared column-expression helpers.

Everything here returns Column expressions built from
``pyspark.sql.functions`` so the hot path stays inside WholeStageCodegen
(no Python UDFs). Each helper has a DuckDB-equivalent SQL form used by
the oracle strings, so Spark results hash-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens: split on non-alphanumeric runs, drop empties.

    DuckDB equivalent:
    ``list_filter(regexp_split_to_array(lower(x), '[^a-z0-9]+'), t -> t <> '')``
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def md5_u60(col: Column | str) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5 as BIGINT.

    Deterministic and engine-agnostic (DuckDB:
    ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``), unlike
    Spark's ``hash``/``xxhash64`` which DuckDB cannot reproduce.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def seeded_u60(col: Column, seed: int) -> Column:
    """Seeded portable hash: md5 over 'seed|value' -> 60-bit BIGINT.

    Used as the MinHash permutation family — one independent hash per
    seed — because md5 is bit-identical across engines. (A production
    Spark-only path would use xxhash64(seed, col), ~10x cheaper; md5 is
    the oracle-parity choice.)
    """
    return md5_u60(F.concat(F.lit(f"{seed}|"), col))


def shingles(tok_col: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles from a token array.

    DuckDB equivalent:
    ``list_distinct(list_transform(range(1, greatest(len(t)-k+1,0)+1),
    i -> array_to_string(t[i:i+k-1], ' ')))``
    """
    n = F.size(tok_col)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(tok_col, i + 1, k)),
        )
    )
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns, computed in double.

    Sequential fold (left-to-right) matches DuckDB's
    ``list_dot_product``-free explicit form used in the oracles, so the
    float result is bit-comparable after rounding.
    """
    prod = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return prod / (na * nb)
