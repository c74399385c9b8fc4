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


@dataclass
class ExecJobSpec:
    """The reference submit payload with REAL executables (reference:
    mapreduce/submit.py posts mapper_executable/reducer_executable;
    the manager pipes files through them). Runs via
    exec_job.run_executable_job."""

    input_directory: str
    output_directory: str
    mapper_executable: str
    reducer_executable: str
    num_mappers: int = 4
    num_reducers: int = 1
    # strict reference granularity: mapper invoked once per input file
    # (reference worker/__main__.py:137-183) — needed only for
    # stateful mappers; per-split piping is identical for stateless
    per_file: bool = False


def submit_exec(spark: SparkSession, spec: ExecJobSpec) -> DataFrame:
    """Run an executable job and wrap up like the reference manager:
    one ``outputfileNN`` per reducer group in the output directory
    (reference: mapreduce/manager/__main__.py:490-505 moves
    reducer-output files to outputfile01..NN).

    Reducer output is written EXECUTOR-SIDE via a hive-partitioned
    text write (``part=N`` directories, each filled by the reducer
    partition that owns it), then renamed to the reference's
    outputfileNN layout — the driver never materializes a single
    reducer line, so an identity reduce over a huge grep is bounded
    by the sink, not driver memory. Line order inside a file is the
    reducer's stdout order (the text writer preserves task row
    order), and empty reducer groups still get their (empty) file —
    the reference's wrap-up contract."""
    import glob
    import os
    import shutil

    from distributed_mapreduce_server_spark.mapreduce.exec_job import (
        run_executable_job,
    )

    result = run_executable_job(
        spark,
        spec.input_directory,
        spec.mapper_executable,
        spec.reducer_executable,
        num_mappers=spec.num_mappers,
        num_reducers=spec.num_reducers,
        per_file=spec.per_file,
    )
    os.makedirs(spec.output_directory, exist_ok=True)
    staging = os.path.join(spec.output_directory, "_spark_staging")
    shutil.rmtree(staging, ignore_errors=True)
    result.write.mode("overwrite").partitionBy("part").text(staging)
    for part in range(spec.num_reducers):
        dst = os.path.join(spec.output_directory, f"outputfile{part + 1:02d}")
        srcs = sorted(glob.glob(os.path.join(staging, f"part={part}", "part-*")))
        with open(dst, "wb") as out:
            for src in srcs:
                with open(src, "rb") as f:
                    shutil.copyfileobj(f, out)
    shutil.rmtree(staging, ignore_errors=True)
    return result


class JobState:
    """Reference manager job lifecycle states."""

    PENDING = "pending"
    RUNNING = "running"
    FINISHED = "finished"
    FAILED = "failed"


class JobQueue:
    """The reference manager's FIFO job queue on Spark's scheduler
    (reference: mapreduce/manager/__main__.py handles new jobs by
    queueing when busy and draining in arrival order; a failed job is
    recorded and the queue moves on).

    Worker liveness, heartbeats, and task redistribution — the rest of
    the manager — are Spark scheduler responsibilities (task retry is
    exercised in tests/test_fault_tolerance.py); what remains of the
    manager surface is exactly this queue + job states + wrap-up."""

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark
        self._queue: list[tuple[int, JobSpec | ExecJobSpec]] = []
        self._states: dict[int, str] = {}
        self._errors: dict[int, str] = {}
        self._next_id = 0

    def submit(self, spec: JobSpec | ExecJobSpec) -> int:
        """Enqueue; returns the job id (the reference's job-NN)."""
        job_id = self._next_id
        self._next_id += 1
        self._queue.append((job_id, spec))
        self._states[job_id] = JobState.PENDING
        return job_id

    def state(self, job_id: int) -> str:
        return self._states[job_id]

    def error(self, job_id: int) -> str | None:
        return self._errors.get(job_id)

    def run_all(self) -> dict[int, str]:
        """Drain the queue FIFO; returns {job_id: final state}. A
        failing job is marked FAILED (error recorded) and does not
        block later jobs."""
        while self._queue:
            job_id, spec = self._queue.pop(0)
            self._states[job_id] = JobState.RUNNING
            try:
                if isinstance(spec, ExecJobSpec):
                    submit_exec(self._spark, spec)
                else:
                    submit(self._spark, spec)
            except Exception as ex:  # noqa: BLE001 — any job failure is recorded
                self._states[job_id] = JobState.FAILED
                self._errors[job_id] = str(ex)[:500]
            else:
                self._states[job_id] = JobState.FINISHED
        return dict(self._states)
