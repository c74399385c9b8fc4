"""Declarative MapReduce job API compiled to DataFrame plans.

The reference framework (mapreduce/manager/__main__.py:300-420,
mapreduce/worker/__main__.py:60-170) runs user executables in three
hand-scheduled stages: map over round-robin input partitions, merge-sort
of intermediate files keyed by line, reduce over key-partitioned sorted
streams. This API keeps that job *shape* — a mapper producing keyed
records, an optional key-partition count, a reducer over grouped keys —
but compiles to a Catalyst plan, so:

- the "sort + group" stage becomes a hash aggregation with map-side
  partial combine (no global sort needed for commutative reducers);
- reducers that genuinely need the sorted-stream semantics of the
  reference run via ``applyInPandas`` over key groups (Arrow-batched);
- scheduling / fault tolerance / speculative re-execution are Spark's.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class MapReduceJob:
    """A map -> shuffle -> reduce pipeline over a DataFrame.

    mapper: DataFrame -> DataFrame of keyed records (must contain
        ``key_cols``). The analog of the reference's mapper executable.
    reducer_aggs: aggregate Columns applied per key — the fast path;
        Catalyst plans a partial (combiner) + final aggregation, which
        is what wc_reduce.sh's ``uniq -c`` stream collapses to.
    num_reducers: optional explicit shuffle partition count for the
        reduce stage (the reference's --nreducers). Usually left None
        so AQE sizes the shuffle.
    """

    mapper: Callable[[DataFrame], DataFrame]
    key_cols: tuple[str, ...]
    reducer_aggs: tuple[Column, ...]
    num_reducers: int | None = None

    def run(self, input_df: DataFrame) -> DataFrame:
        mapped = self.mapper(input_df)
        missing = [k for k in self.key_cols if k not in mapped.columns]
        if missing:
            raise ValueError(f"mapper output missing key columns: {missing}")
        if self.num_reducers:
            mapped = mapped.repartition(self.num_reducers, *self.key_cols)
        return mapped.groupBy(*self.key_cols).agg(*self.reducer_aggs)

    def run_sorted_stream(
        self,
        input_df: DataFrame,
        sort_cols: tuple[str, ...],
        reduce_fn: Callable,
        output_schema: str,
    ) -> DataFrame:
        """Reference-faithful path: reducer sees each key's records as a
        sorted stream (pandas DataFrame), like a reducer executable
        reading sorted stdin. Arrow-batched; use only when the reduction
        is not expressible as aggregate Columns."""
        mapped = self.mapper(input_df)
        if self.num_reducers:
            # honor the reference's --nreducers here too, not just on
            # the aggregate path
            mapped = mapped.repartition(self.num_reducers, *self.key_cols)

        def _apply(pdf):
            return reduce_fn(pdf.sort_values(list(sort_cols)))

        grouped = mapped.groupBy(*[F.col(c) for c in self.key_cols])
        return grouped.applyInPandas(_apply, schema=output_schema)


def word_count_job(text_col: str = "text") -> MapReduceJob:
    """The reference's canonical wc job (wc_map.sh | sort | wc_reduce.sh)."""
    from distributed_mapreduce_server_spark.functions import tokens

    def mapper(df: DataFrame) -> DataFrame:
        return df.select(F.explode(tokens(text_col)).alias("key"))

    return MapReduceJob(
        mapper=mapper,
        key_cols=("key",),
        reducer_aggs=(F.count("*").alias("cnt"),),
    )


def grep_job(pattern: str, text_col: str = "text", id_col: str = "doc_id") -> MapReduceJob:
    """The reference's grep job (grep_map.py emits matching lines;
    grep_reduce.py passes them through)."""

    def mapper(df: DataFrame) -> DataFrame:
        lines = df.select(
            F.col(id_col).alias("key"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
        )
        return lines.filter(F.col("line").contains(pattern))

    return MapReduceJob(
        mapper=mapper,
        key_cols=("key", "line_no", "line"),
        reducer_aggs=(F.count("*").alias("n"),),
    )
