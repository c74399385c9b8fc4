"""Local replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle on the same sf dir and
compares row count, sorted column names, and order-insensitive values
(exact for non-floats, tiny tolerance for floats so we catch real
mismatches while ignoring representation noise smaller than the
rounding we already apply).
"""

from __future__ import annotations

import math

import duckdb

from distributed_mapreduce_server_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def compare(spark_df, con, sql: str, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    sdf = spark_df.toPandas()
    odf = con.execute(sql).fetchdf()

    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return [f"columns differ: spark={scols} oracle={ocols}"]
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")

    srows = sorted(
        (tuple(_norm_cell(v) for v in row) for row in sdf[scols].itertuples(index=False)),
        key=repr,
    )
    orows = sorted(
        (tuple(_norm_cell(v) for v in row) for row in odf[scols].itertuples(index=False)),
        key=repr,
    )
    n_bad = 0
    for i, (sr, orow) in enumerate(zip(srows, orows)):
        for c, (a, b) in zip(scols, zip(sr, orow)):
            ok = (
                a == b
                or (
                    isinstance(a, float)
                    and isinstance(b, float)
                    and math.isclose(a, b, rel_tol=float_tol, abs_tol=float_tol)
                )
            )
            if not ok:
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"row {i} col {c}: spark={a!r} oracle={b!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched cells total over {len(srows)} rows")
    return problems
