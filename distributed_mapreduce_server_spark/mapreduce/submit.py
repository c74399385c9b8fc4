"""Job submission mirroring the reference's surface.

The reference's submit client (reference: mapreduce/submit.py) posts
{input_directory, output_directory, mapper_executable,
reducer_executable, num_mappers, num_reducers} to the manager. Here
the same job description runs as one Spark action:

- input_directory  -> sources.read_text_lines (any split count; Spark
  decides "num_mappers" from file splits — the knob the reference
  needed is the one Spark makes automatic)
- mapper/reducer   -> a MapReduceJob (declarative columns, or the
  sorted-stream reducer for executable-faithful semantics)
- num_reducers     -> output shard count, honored through the write
- output_directory -> part files via sources.write_sink
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession

from distributed_mapreduce_server_spark.mapreduce.api import MapReduceJob
from distributed_mapreduce_server_spark.sources import read_text_lines, write_sink


@dataclass
class JobSpec:
    """The reference submit payload, Spark-shaped."""

    input_directory: str
    output_directory: str
    job: MapReduceJob
    num_reducers: int = 1
    output_format: str = "csv"


def submit(spark: SparkSession, spec: JobSpec) -> DataFrame:
    """Run the job and write ``num_reducers`` part files; returns the
    result DataFrame (already computed by the write action)."""
    lines = read_text_lines(spark, spec.input_directory)
    # replace(), not in-place mutation: a MapReduceJob shared across
    # JobSpecs must not inherit this spec's reducer count.
    job = replace(spec.job, num_reducers=spec.num_reducers)
    result = job.run(lines)
    write_sink(result, spec.output_directory, fmt=spec.output_format)
    return result
