"""Executable mapper/reducer jobs via ``RDD.pipe`` — the Spark-native
realization of the reference's Hadoop-streaming contract (reference:
mapreduce/worker/__main__.py:137-183 pipes input files through a
mapper executable, sorts lines, and pipes merged groups through a
reducer executable; mapreduce/manager/__main__.py:436-461 assigns
keys to reducers round-robin in globally-sorted distinct-key order).

Semantics preserved:

- mapper executable reads raw lines on stdin, writes
  ``key<TAB>value`` lines on stdout;
- each reducer executable reads ITS keys' lines on stdin, sorted
  lexicographically (the "sorted stdin" contract reducers rely on);
- a key's lines all reach one reducer; keys are spread round-robin
  over reducers in sorted-key order (num_reducers output groups).

Mapper invocation granularity: by default Spark pipes once per SPLIT
(identical output for any stream-stateless mapper — the streaming
contract both wc_map.sh and grep_map.py satisfy, and the faster
path: splits parallelize inside big files). ``per_file=True`` selects
the reference's STRICT granularity — the mapper runs exactly once
per input file with that file's full content on stdin (reference
worker/__main__.py:137-183) — so stateful mappers emitting
per-invocation headers/footers match byte-for-byte.

Scale shape: the map pipe is embarrassingly parallel; the rank table
is distinct-key-sized and built with a shuffle of keys only, then
applied map-side from a broadcast dict (key sets up to
BROADCAST_KEY_LIMIT — the usual case) or joined back for huge key
sets where a driver dict would not fit.
``repartitionAndSortWithinPartitions`` gives each reducer its sorted
stream via Spark's external sort — no driver merge like the
reference's single-process heapq.merge bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# reducer-id assignment strategy switch: key sets up to this size
# broadcast as a driver dict (vocabulary-sized); larger ones use the
# RDD join (module-level so tests can force the fallback).
BROADCAST_KEY_LIMIT = 1_000_000


def _pipe_record(cmd: str):
    """One subprocess invocation per (filename, content) record — the
    reference worker's per-file mapper contract. Runs executor-side;
    raises like RDD.pipe's checkCode on a nonzero exit."""
    import shlex
    import subprocess

    argv = shlex.split(cmd)

    def run(record):
        fname, content = record
        # UTF-8 explicitly (matching the RDD.pipe path), never the
        # executor's locale — text=True alone means LANG=C containers
        # crash on non-ASCII input; and split records on '\n' only,
        # like pipe does (splitlines() also breaks on \x0b, \x0c,
        # U+2028 etc., which a mapper may legitimately emit inside
        # a value).
        proc = subprocess.run(
            argv, input=content, capture_output=True, encoding="utf-8"
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"mapper {cmd!r} exited {proc.returncode} on {fname}: "
                f"{proc.stderr[-500:]}"
            )
        out = proc.stdout
        if out.endswith("\n"):
            out = out[:-1]
        return out.split("\n") if out else []

    return run


def run_executable_job(
    spark: SparkSession,
    input_paths: list[str] | str,
    mapper_cmd: str,
    reducer_cmd: str,
    num_mappers: int = 4,
    num_reducers: int = 1,
    per_file: bool = False,
) -> DataFrame:
    """Run a reference-style executable job; returns a DataFrame of
    ``(part, line)`` — ``part`` is the reducer index (the reference's
    outputfileNN), ``line`` the reducer's raw stdout line.

    ``per_file=True``: strict reference granularity — the mapper runs
    once per input FILE over its whole content (wholeTextFiles, so a
    file is never split; use for stateful mappers; per-split piping
    is faster for large files and identical for stateless ones)."""
    sc = spark.sparkContext
    if isinstance(input_paths, list):
        input_paths = ",".join(input_paths)

    if per_file:
        files = sc.wholeTextFiles(input_paths, minPartitions=num_mappers)
        mapped = files.flatMap(_pipe_record(mapper_cmd))
    else:
        lines = sc.textFile(input_paths, minPartitions=num_mappers)
        mapped = lines.pipe(mapper_cmd, checkCode=True)

    # Persist the mapper output: the broadcast-branch key sample
    # below executes the mapper pipe through the distinct's map
    # stage, and the real reducer pass would otherwise run the SAME
    # pipe a second time over the whole input (the fallback branch's
    # shuffle reuse covers only itself — by_rid there consumes the
    # distinct shuffle, the broadcast branch's by_rid does not). The
    # cache holds one string per mapped line, the same bytes the
    # shuffle would spill; released after the result materializes.
    # MEMORY_AND_DISK (ADVICE r13): MEMORY_ONLY never spills — under
    # memory pressure evicted partitions silently RE-RUN the mapper
    # pipe (the exact double execution this persist removes, and a
    # non-deterministic mapper could then emit inconsistent lines
    # between the key-sample and reducer passes); disk overflow keeps
    # the pipe single-run.
    from pyspark import StorageLevel

    keyed = mapped.map(lambda ln: (ln.split("\t", 1)[0], ln)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Assign reducer ids map-side when the key set is small: a full
    # RDD join re-shuffles EVERY mapped line against a table that is
    # usually tiny (wordcount: a vocabulary), and measured 2x slower
    # than the single-process baseline at 48 MB; with the broadcast
    # the only line shuffle left is the reducer partitioning itself.
    # Large key sets (grep emitting near-unique keys) fall back to
    # the distributed rank join — a driver-side dict of hundreds of
    # millions of keys is the thing that does NOT scale. take(limit+1)
    # is both the size check and the data: it early-exits on huge key
    # sets and equals collect() on small ones — one job, not
    # count+collect.
    distinct_keys = keyed.keys().distinct()
    head = distinct_keys.take(BROADCAST_KEY_LIMIT + 1)
    if len(head) <= BROADCAST_KEY_LIMIT:
        # sorted-rank assignment happens ON THE DRIVER for the
        # bounded key set (exactly the reference manager's move —
        # it, too, ranks the distinct keys in one process): skips the
        # sortBy sample job + sort shuffle + zipWithIndex count job
        # the distributed ranking needs, measured ~0.6 s off
        # mr_exec_join at sf0.1.
        rank_map = sc.broadcast(
            {k: i % num_reducers for i, k in enumerate(sorted(head))}
        )
        # .get + drop matches the join's inner semantics for a key
        # that appears in the line stream but not the rank table
        # (possible only with a non-deterministic mapper or an input
        # mutated between the two passes) — the join path dropped
        # such lines; a raw dict lookup would kill the job instead.
        by_rid = (
            keyed.map(lambda kv: (rank_map.value.get(kv[0]), kv[1]))
            .filter(lambda kv: kv[0] is not None)
            .map(lambda kv: ((kv[0], kv[1]), None))
        )
    else:
        # rank of each key in global sorted order -> reducer id
        # (mod R); key-cardinality sized, never the line count. The
        # distinct shuffle above is REUSED (Spark skips recomputing
        # materialized shuffle map stages), so the mapper pipe does
        # not run an extra time for this branch.
        ranks = (
            distinct_keys.sortBy(lambda k: k)
            .zipWithIndex()
            .mapValues(lambda i: int(i) % num_reducers)
        )
        by_rid = keyed.join(ranks).map(lambda kv: ((kv[1][1], kv[1][0]), None))
    part_sorted = by_rid.repartitionAndSortWithinPartitions(
        numPartitions=num_reducers, partitionFunc=lambda key: key[0]
    )
    reduced = part_sorted.map(lambda kv: kv[0][1]).pipe(reducer_cmd, checkCode=True)
    # keep every reducer stdout line, empty ones included — a
    # reference reducer's output is reproduced byte-for-line
    tagged = reduced.mapPartitionsWithIndex(
        lambda idx, it: ((idx, ln) for ln in it)
    )
    # materialize the (reducer-output-sized) result THROUGH the cache
    # before releasing it — returning the lazy frame and unpersisting
    # would re-run both pipes at the caller's action.
    # Deliberate fault-tolerance trade (ADVICE r13): localCheckpoint
    # severs lineage, so losing an executor holding checkpoint
    # partitions AFTER return fails the caller's action instead of
    # recomputing — accepted because the alternative (keeping lineage
    # alive) would re-run the mapper/reducer subprocess pipes on
    # recompute, and a non-deterministic mapper could then silently
    # return different bytes than the job already reported; in
    # local[N] (this harness) executor loss is process death anyway.
    out = spark.createDataFrame(tagged, "part int, line string").localCheckpoint(
        eager=True
    )
    keyed.unpersist()
    return out
