"""Primary gate: every registered query matches its DuckDB oracle at
sf0.01 — the same comparison the driver runs (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from distributed_mapreduce_server_spark import registry
from tests.oracle_utils import compare, duckdb_conn

ORACLES = registry.all_oracles()
QUERIES = registry.all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


# Keys intentionally WITHOUT a SQL oracle (approximate or
# non-SQL-expressible). Anything else missing an oracle is a silent
# downgrade to the weaker rows-only check — fail loudly instead:
# a mis-applied edit once dropped an oracle and the parametrized
# suite "passed" vacuously.
EXPECTED_ROWS_ONLY = {
    "q_approx_distinct",
    "q_approx_quantiles",  # sketch results are engine-specific
    "q_events_daily_sketch_rollup",  # HLL estimates are engine-specific
    # ONLY the signed projected coordinates remain unverifiable
    # (eigenvector sign, and order under equal eigenvalues, are
    # LAPACK-specific); every sign-invariant property of the solve —
    # variance==eigenvalue, orthonormality, zero-mean projections,
    # variance ordering, covariance trace — is oracle-gated by
    # emb_pca_invariants.
    "emb_pca_project",
    # text_bpe_train graduated to a full oracle in round 8 (unrolled
    # MATERIALIZED-CTE merges; greedy application == wrapped replace)
}


def test_every_query_has_oracle_unless_listed():
    missing = set(QUERIES) - set(ORACLES) - EXPECTED_ROWS_ONLY
    assert not missing, f"queries silently lacking an oracle: {sorted(missing)}"
    stale = EXPECTED_ROWS_ONLY & set(ORACLES)
    assert not stale, f"listed rows-only but an oracle exists: {sorted(stale)}"


def test_release_dedup_caches_empties_registry(spark, sf_smoke):
    """The dedup cache contract: operators leave only their (small)
    result frames cached, tracked for release."""
    from distributed_mapreduce_server_spark.operators import dedup

    dedup.dedup_ngram_jaccard(spark, sf_smoke).collect()
    assert dedup._result_caches
    dedup.release_dedup_caches()
    assert not dedup._result_caches
