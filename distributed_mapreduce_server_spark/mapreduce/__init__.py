from distributed_mapreduce_server_spark.mapreduce.api import MapReduceJob

__all__ = ["MapReduceJob"]
