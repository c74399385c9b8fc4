"""No-orphan lint: every public operator def is registered or
explicitly allowlisted.

Round 7 shipped nine finished operators that were in no registry, no
oracle, and no test — invisible to the driver, the parity sweep, and
bench (VERDICT r7 "What's missing" #1). This gate makes that state a
test failure: an operator-shaped public def (q_*/mr_*/dedup_*/... in
the package) must either appear in ``registry.all_queries()`` or be
named in ALLOWED_UNREGISTERED with a reason.
"""

from __future__ import annotations

import pathlib
import re

from distributed_mapreduce_server_spark import registry

PKG = pathlib.Path(__file__).resolve().parents[1] / "distributed_mapreduce_server_spark"

# Operator-shaped def prefixes (the registry's naming families).
_DEF_RE = re.compile(
    r"^def ((?:q_|mr_|dedup_|text_|sim_|emb_|mm_|stream_|src_|pysource_)\w+)",
    re.M,
)

# Known non-query defs that legitimately share an operator prefix.
# Every entry carries its reason — additions need one.
ALLOWED_UNREGISTERED = {
    # incremental-dedup building blocks: the registered operators
    # (dedup_incremental_neardup*) compose them; not standalone queries
    "dedup_index_build",
    "dedup_index_extend",
    # DuckDB-side oracle HELPERS (return SQL, not DataFrames)
    "pysource_oracle",
    "pysource_stream_oracle",
    # intentional exclusion: convergence-variant of q_pagerank whose
    # round count is data-dependent (no stable oracle); kept as the
    # documented iterate-until-tolerance reference implementation
    "q_pagerank_converged",
    # harness helper for the streaming ingest tests, not a query
    "stream_ingest_readback",
}


def _operator_defs(root: pathlib.Path = PKG) -> dict[str, str]:
    defs: dict[str, str] = {}
    for f in sorted(root.rglob("*.py")):
        for m in _DEF_RE.finditer(f.read_text()):
            defs.setdefault(m.group(1), str(f.relative_to(root.parent)))
    return defs


def test_every_operator_def_is_registered_or_allowlisted():
    registered = set(registry.all_queries())
    orphans = {
        n: f
        for n, f in _operator_defs().items()
        if n not in registered and n not in ALLOWED_UNREGISTERED
    }
    assert not orphans, (
        "operator defs reachable by no gate (register them with an "
        f"oracle + test, or allowlist with a reason): {orphans}"
    )


def test_allowlist_is_not_stale():
    """Allowlisted names must still exist and must NOT be registered —
    both directions of staleness fail loudly."""
    defs = _operator_defs()
    registered = set(registry.all_queries())
    gone = ALLOWED_UNREGISTERED - set(defs)
    assert not gone, f"allowlisted names no longer defined: {sorted(gone)}"
    promoted = ALLOWED_UNREGISTERED & registered
    assert not promoted, f"allowlisted but now registered: {sorted(promoted)}"


def test_lint_catches_a_synthetic_orphan(tmp_path):
    """The gate itself must fire: plant an operator-shaped def in a
    scratch scan root and assert the scan reports it."""
    scratch = tmp_path / "pkg"
    scratch.mkdir()
    (scratch / "planted.py").write_text(
        "def q_synthetic_orphan(spark, sf_dir):\n    return None\n"
    )
    defs = _operator_defs(root=scratch)
    assert "q_synthetic_orphan" in defs
    assert "q_synthetic_orphan" not in set(registry.all_queries())


def test_survey_section2_covers_every_registry_key():
    """SURVEY.md §2 is the judge's line-by-line coverage checklist —
    every registered key must appear there as a backticked token (the
    round-7 late wave shipped keys whose SURVEY rows lagged)."""
    survey = (PKG.parent / "SURVEY.md").read_text()
    start = survey.index("## §2")
    end = survey.index("## §3", start)
    section2 = survey[start:end]
    missing = {
        k for k in registry.all_queries() if f"`{k}`" not in section2
    }
    assert not missing, f"registry keys with no SURVEY §2 row: {sorted(missing)}"
