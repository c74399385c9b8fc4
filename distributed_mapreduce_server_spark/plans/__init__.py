"""Physical-plan introspection (SURVEY.md §3, §5, §6).

The reference hand-schedules its pipeline, so its "plan" is the code
itself (reference: mapreduce/manager/__main__.py:236-320 fixes the
map/group/reduce stages). On Spark the physical strategy is chosen by
Catalyst/AQE, so scale-readiness is asserted by *inspecting the plan*:
filters reached the parquet scan, small dims broadcast, aggregations
have a map-side partial phase, no accidental cartesian products.

Note (Spark 4.1.2 + AQE): WholeStageCodegen / `codegen id` markers do
NOT appear in plan strings even when codegen is active, so these
helpers rely on the markers that do — PushedFilters, PartitionFilters,
BroadcastHashJoin, partial_* aggregate functions, Exchange.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, execute: bool = False) -> str:
    """Physical plan string; with ``execute=True`` runs the query first
    so AQE's *final* plan (post runtime re-optimization) is returned.

    Requires ``spark.sql.maxMetadataStringLength`` raised above the
    100-char default (session.py does) — otherwise Spark truncates
    PushedFilters/ReadSchema mid-list and they can't be parsed."""
    if execute:
        df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """The data filters each scan pushed into the parquet reader."""
    plan = physical_plan(df)
    return [m.strip() for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()]


def partition_filters(df: DataFrame) -> list[str]:
    plan = physical_plan(df)
    return [m.strip() for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if m.strip()]


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning check: a scan
    listing columns the query never touches is reading wasted bytes."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def broadcast_join_count(df: DataFrame, execute: bool = False) -> int:
    """BroadcastHashJoin occurrences. With execute=True this counts
    AQE's final choice (it may upgrade sort-merge to broadcast at
    runtime once the built side's true size is known)."""
    return physical_plan(df, execute).count("BroadcastHashJoin")


def has_partial_agg(df: DataFrame) -> bool:
    """True when aggregation runs map-side first (partial_*), i.e. the
    shuffle moves pre-combined rows, not raw ones."""
    return "partial_" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the scale currency.
    Compare against the minimum the query semantically needs."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(df).count(
        "Exchange rangepartitioning"
    )


def cartesian_count(df: DataFrame) -> int:
    """Cartesian/broadcast-nested-loop joins — almost always a bug at
    scale unless one side is a deliberately tiny broadcast set."""
    plan = physical_plan(df)
    return plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin")


def window_partition_specs(df: DataFrame) -> list[list[str]]:
    """Partition columns of every window in the physical plan — the
    single-task-sort detector: a window whose partition spec is empty
    or a tiny dimension sorts its whole input in (at most) that many
    tasks, which is fatal when the input is fact-sized. Parsed from
    ``windowspecdefinition(part..., order ASC/DESC..., frame)``:
    partition columns are the leading args before the first sort
    marker."""
    plan = physical_plan(df)
    specs = []
    marker = "windowspecdefinition("
    i = plan.find(marker)
    while i != -1:
        # balanced-paren scan: partition expressions may themselves
        # contain calls (upper(col), pmod(a, b)) — a first-')' regex
        # would truncate mid-expression and silently mis-parse
        j = i + len(marker)
        depth, start, args = 1, j, []
        while j < len(plan) and depth > 0:
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args.append(plan[start:j])
            elif ch == "," and depth == 1:
                args.append(plan[start:j])
                start = j + 2 if plan[j : j + 2] == ", " else j + 1
            j += 1
        cols = []
        for arg in args:
            arg = arg.strip()
            if (
                " ASC" in arg
                or " DESC" in arg
                or arg.startswith("specifiedwindowframe")
            ):
                break
            # report the BASE columns a partition expression reads
            # (upper(event_type#3) partitions no finer than event_type)
            refs = re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", arg)
            if refs:
                cols.extend(refs)
            elif arg:
                cols.append(arg)
        specs.append(cols)
        i = plan.find(marker, i + len(marker))
    return specs
