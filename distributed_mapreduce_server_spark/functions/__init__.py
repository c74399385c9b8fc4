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


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """Universal-hash permutation of a base hash: (a*h + b) mod p.

    p = 2^61 - 1 (Mersenne prime); arithmetic stays in BIGINT range
    because h < 2^60 and we take mod after each multiply via the
    double-precision-safe decomposition DuckDB mirrors exactly.
    """
    p = (1 << 61) - 1
    # (a * h) overflows 64-bit for 60-bit h; split h into hi/lo 30-bit
    # halves so every intermediate stays < 2^62. Same formula in SQL.
    hi = (h / F.lit(1 << 30)).cast("bigint")
    lo = h % F.lit(1 << 30)
    term = (F.lit(a % p) * hi % F.lit(p)) * F.lit((1 << 30) % p) % F.lit(p)
    return (term + F.lit(a % p) * lo % F.lit(p) + F.lit(b % p)) % F.lit(p)


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
