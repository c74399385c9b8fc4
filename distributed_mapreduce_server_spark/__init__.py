"""PySpark-native analytics engine.

Re-expresses the query/data-processing surface of the reference
MapReduce framework (map -> shuffle/sort -> reduce over partitioned
data; see /root/reference/mapreduce/manager/__main__.py) as Spark
DataFrame plans, and extends it with the relational + LLM-data-pipeline
operator set inventoried in SURVEY.md §2.
"""

from distributed_mapreduce_server_spark.session import get_spark, retire_persistent_rdds
from distributed_mapreduce_server_spark.catalog import load_tables

__all__ = ["get_spark", "load_tables", "retire_persistent_rdds"]
