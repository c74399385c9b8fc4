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
    for m in re.findall(r"windowspecdefinition\(([^)]*)", plan):
        cols = []
        for arg in m.split(", "):
            if " ASC" in arg or " DESC" in arg or arg.startswith(
                "specifiedwindowframe"
            ):
                break
            name = arg.split("#")[0].strip()
            if name:
                cols.append(name)
        specs.append(cols)
    return specs
