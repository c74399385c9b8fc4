"""CLI submit client — the reference's front door, Spark-backed.

The reference ships a ``mapreduce-submit`` console script that posts
{input_directory, output_directory, mapper_executable,
reducer_executable, num_mappers, num_reducers} to the manager's TCP
port (reference: mapreduce/submit.py:1-102, setup.py:24-27). Here
Spark IS the manager, so the same flags run the job in-process and
wrap up the reference's outputfileNN layout; there is no ``--port``
because there is no separate server to contact.

Usage::

    python -m distributed_mapreduce_server_spark.submit \
        --input  tests/testdata/input \
        --output output \
        --mapper tests/testdata/exec/wc_map.sh \
        --reducer tests/testdata/exec/wc_reduce.sh \
        --nreducers 2

A reference user's mapper/reducer executable pair drops in unchanged
(Hadoop-streaming contract: raw lines on mapper stdin, ``key\\tvalue``
lines out, sorted stdin per reducer).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m distributed_mapreduce_server_spark.submit",
        description="Submit an executable MapReduce job to Spark "
        "(the reference's mapreduce-submit client, serverless).",
    )
    p.add_argument("-i", "--input", dest="input_directory", required=True,
                   help="Input directory of text files")
    p.add_argument("-o", "--output", dest="output_directory", required=True,
                   help="Output directory (outputfileNN files are written here)")
    p.add_argument("-m", "--mapper", dest="mapper_executable", required=True,
                   help="Mapper executable (reads lines on stdin, emits key\\tvalue)")
    p.add_argument("-r", "--reducer", dest="reducer_executable", required=True,
                   help="Reducer executable (reads its keys' sorted lines on stdin)")
    p.add_argument("--nmappers", dest="num_mappers", type=int, default=4,
                   help="Minimum input splits for the map stage, default=4")
    p.add_argument("--nreducers", dest="num_reducers", type=int, default=1,
                   help="Number of reducers / output files, default=1")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from distributed_mapreduce_server_spark.mapreduce.submit import (
        ExecJobSpec,
        submit_exec,
    )
    from distributed_mapreduce_server_spark.session import get_spark

    spark = get_spark(app_name="mapreduce-submit")
    submit_exec(
        spark,
        ExecJobSpec(
            input_directory=args.input_directory,
            output_directory=args.output_directory,
            mapper_executable=args.mapper_executable,
            reducer_executable=args.reducer_executable,
            num_mappers=args.num_mappers,
            num_reducers=args.num_reducers,
        ),
    )
    # the reference client's submission summary, minus the manager
    # host:port (the job has already run to completion here)
    print("Submitted job to Spark")
    print("input directory     ", args.input_directory)
    print("output directory    ", args.output_directory)
    print("mapper executable   ", args.mapper_executable)
    print("reducer executable  ", args.reducer_executable)
    print("num mappers         ", args.num_mappers)
    print("num reducers        ", args.num_reducers)
    return 0


if __name__ == "__main__":
    sys.exit(main())
