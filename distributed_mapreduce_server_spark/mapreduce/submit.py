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


def submit_exec(spark: SparkSession, spec: ExecJobSpec) -> DataFrame:
    """Run an executable job and wrap up like the reference manager:
    one ``outputfileNN`` per reducer group in the output directory
    (reference: mapreduce/manager/__main__.py:490-505 moves
    reducer-output files to outputfile01..NN)."""
    import os

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
    )
    os.makedirs(spec.output_directory, exist_ok=True)
    # one driver pass, grouped by reducer index — output files are the
    # reference's contract (NN = reducer id + 1). Reducer output is
    # final-result sized; if that's ever too big to pass through the
    # driver, swap for a partitioned DFS write.
    rows = result.collect()
    by_part: dict[int, list[str]] = {i: [] for i in range(spec.num_reducers)}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r["line"])
    # every reducer group gets its file, empty groups included — the
    # reference's wrap-up produces exactly num_reducers output files
    for part, lines in by_part.items():
        path = os.path.join(
            spec.output_directory, f"outputfile{part + 1:02d}"
        )
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
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
