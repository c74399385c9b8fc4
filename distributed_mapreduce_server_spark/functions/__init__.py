"""Shared column-expression helpers.

Everything here returns Column expressions built from
``pyspark.sql.functions`` so the hot path stays inside WholeStageCodegen
(no Python UDFs). Each helper has a DuckDB-equivalent SQL form used by
the oracle strings, so Spark results hash-match the oracle.

One deliberate exception: :func:`fround_np`, the numpy twin of
:func:`fround` for Arrow-batched kernels — it lives here so the
rounding semantics have exactly one home per execution tier.
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

    One independent hash per seed, bit-identical across engines.
    """
    return md5_u60(F.concat(F.lit(f"{seed}|"), col))


# MinHash permutation family over 32-bit base hashes:
#   perm_i(h) = (a_i * h + b_i) mod P32
# with a_i, b_i < 2^31 and h < 2^32 every intermediate stays < 2^63,
# so the arithmetic is exact in BIGINT in both Spark and DuckDB —
# ONE md5 per shingle instead of one per (shingle, permutation).
MINHASH_P32 = 4294967311  # smallest prime > 2^32


def perm_constants(n: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs derived from md5(i) — fixed
    engine-independent constants, embedded as literals in oracle SQL."""
    import hashlib

    out = []
    for i in range(n):
        d = hashlib.md5(f"perm{i}".encode()).hexdigest()
        a = int(d[:8], 16) % (1 << 31) or 1
        b = int(d[8:16], 16) % (1 << 31)
        out.append((a, b))
    return out


def minhash_perm(h32: Column, a: int, b: int) -> Column:
    """perm(h) = (a*h + b) mod P32, exact in 64-bit."""
    return (F.lit(a) * h32 + F.lit(b)) % F.lit(MINHASH_P32)


def shingles(tok_col: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles from a token array.

    DuckDB equivalent:
    ``list_distinct(list_transform(range(1, greatest(len(t)-k+1,0)+1),
    i -> array_to_string(t[i:i+k-1], ' ')))``
    """
    n = F.size(tok_col)
    # element_at (O(1)) rather than slice-per-index (O(n) copy -> O(n²)
    # per document, which is 10x slower end-to-end on real doc sizes).
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tok_col, i + j + 1) for j in range(k)]
            ),
        )
    )
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns, computed in double.

    Sequential fold (left-to-right) matches DuckDB's
    ``list_dot_product``-free explicit form used in the oracles, so the
    float result is bit-comparable after rounding.

    The array lambdas execute interpreted (~35 us/pair on 64 dims), so
    this is for BOUNDED pair sets only — a handful of query vectors, a
    centroid codebook. All-pairs similarity goes through the vectorized
    numpy block-matmul kernel in operators/dedup.py instead.
    """
    prod = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return prod / (na * nb)


def fround(c: Column, nd: int = 0) -> Column:
    """ROUND with DuckDB's semantics on doubles: round the SCALED
    double half-away-from-zero (std::round(x * 10^nd) / 10^nd).

    Spark's F.round on doubles instead rounds the shortest-decimal
    repr (BigDecimal.valueOf), which disagrees exactly when x * 10^nd
    lands on a representable .5 tie — e.g. 0.058499999999999996
    scales to exactly 58.5, so DuckDB says 0.059 and F.round says
    0.058. Invisible at sf0.01, but real data at sf0.1 hit it in
    three operators. Use this for double-typed outputs compared
    against DuckDB oracles; keep F.round for decimal-typed columns
    (exact HALF_UP in both engines)."""
    c = F.col(c) if isinstance(c, str) else c
    scale = F.lit(float(10**nd))
    scaled = F.abs(c) * scale
    return F.signum(c) * F.floor(scaled + F.lit(0.5)) / scale


def fround_np(a, nd: int = 4):
    """Numpy twin of :func:`fround` for Pandas-UDF kernels: scaled
    half-away-from-zero rounding (DuckDB ROUND semantics; np.round is
    banker's at representable .5 ties). One definition so every
    vectorized kernel (blocked cosine grid, PQ encoder/ADC, centroid
    assignment) rounds identically to the Column form and the
    oracles."""
    import numpy as np

    scale = float(10**nd)
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale


def fround_scalar(v: float, nd: int = 2) -> float:
    """Scalar-Python twin of :func:`fround` / :func:`fround_np`
    (DuckDB ROUND semantics: scaled half-away-from-zero). The ONE
    home for the scalar tier — Pandas-UDF loops and driver-side
    kernels import this instead of re-rolling the tie handling."""
    import math

    s = 10.0**nd
    return math.copysign(math.floor(abs(v) * s + 0.5) / s, v)
