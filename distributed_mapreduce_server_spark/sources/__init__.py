"""Sources & sinks (SURVEY.md §2.8).

The reference ingests line-oriented text files and emits text part
files (reference: mapreduce/worker/__main__.py:88-118 streams input
lines through the mapper; manager round-robins files across mappers
at mapreduce/manager/__main__.py:236-255). Spark subsumes both ends:
``spark.read`` splits files across tasks, and writers shard output by
partition. This package is the one place that knows format names →
reader/writer wiring, so operators stay format-agnostic.
"""

from distributed_mapreduce_server_spark.sources.registry import (
    FORMATS,
    compact_small_files,
    read_source,
    read_text_lines,
    swap_dataset_dir,
    write_partitioned,
    write_sink,
    write_sorted_parquet,
    write_zorder_parquet,
    zorder_key,
)

__all__ = [
    "FORMATS",
    "compact_small_files",
    "read_source",
    "read_text_lines",
    "swap_dataset_dir",
    "write_partitioned",
    "write_sink",
    "write_sorted_parquet",
    "write_zorder_parquet",
    "zorder_key",
]
