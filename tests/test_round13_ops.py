"""Round 13: data-sized shuffle partitions (SCALING.md finding 1 fed
back into code, VERDICT r12 task 2) and the rank-1 index-side probing
strategy for the nested router (task 3)."""

from __future__ import annotations

import pytest

from distributed_mapreduce_server_spark.session import (
    GRAPH_EDGE_ROWS_PER_TASK,
    MAX_SIZED_PARTITIONS,
    data_sized_shuffle,
    sized_shuffle_partitions,
)

SF_SMOKE = "/root/testdata/sf0.001"


class TestSizedShufflePartitions:
    def test_small_inputs_stay_at_cpu_floor(self):
        # sf0.1's measured 1.2M copurchase edges must NOT change the
        # shipped plans (the bench record's regime).
        assert sized_shuffle_partitions(1_196_000, GRAPH_EDGE_ROWS_PER_TASK, cpus=32) == 32
        assert sized_shuffle_partitions(0, GRAPH_EDGE_ROWS_PER_TASK, cpus=32) == 32
        assert sized_shuffle_partitions(1, GRAPH_EDGE_ROWS_PER_TASK, cpus=32) == 32

    def test_10x_corpus_hits_measured_fix(self):
        # The 10x rehearsal corpus measured 12.0M edges; SCALING.md
        # finding 1 measured 128 partitions recovering 260 s -> 108 s.
        # The formula must land exactly there with no manual knob.
        assert sized_shuffle_partitions(11_997_046, GRAPH_EDGE_ROWS_PER_TASK, cpus=32) == 128

    def test_3x_corpus_gets_intermediate_width(self):
        assert sized_shuffle_partitions(3_600_000, GRAPH_EDGE_ROWS_PER_TASK, cpus=32) == 64

    def test_power_of_two_and_cap(self):
        assert sized_shuffle_partitions(10**12, 1, cpus=32) == MAX_SIZED_PARTITIONS
        # pow2 rounding: just over a boundary doubles
        p = sized_shuffle_partitions(129 * GRAPH_EDGE_ROWS_PER_TASK, GRAPH_EDGE_ROWS_PER_TASK, cpus=32)
        assert p == 256

    def test_cluster_floor_follows_cores(self):
        # A 512-core cluster never drops below its core count even on
        # small inputs.
        assert sized_shuffle_partitions(1000, GRAPH_EDGE_ROWS_PER_TASK, cpus=512) == 512


class TestDataSizedShuffleScope:
    def test_sets_and_restores_conf(self, spark):
        key = "spark.sql.shuffle.partitions"
        before = spark.conf.get(key)
        with data_sized_shuffle(spark, 11_997_046, GRAPH_EDGE_ROWS_PER_TASK) as target:
            assert target == 128
            assert spark.conf.get(key) == "128"
        assert spark.conf.get(key) == before

    def test_restores_on_error(self, spark):
        key = "spark.sql.shuffle.partitions"
        before = spark.conf.get(key)
        with pytest.raises(RuntimeError):
            with data_sized_shuffle(spark, 10**9, GRAPH_EDGE_ROWS_PER_TASK):
                raise RuntimeError("boom")
        assert spark.conf.get(key) == before

    def test_graph_ops_leave_session_conf_unchanged(self, spark):
        # The four graph consumers wrap their materializing action in
        # data_sized_shuffle; after each op returns, the session conf
        # must be back at its configured value.
        from distributed_mapreduce_server_spark import registry

        key = "spark.sql.shuffle.partitions"
        before = spark.conf.get(key)
        queries = registry.all_queries()
        for k in (
            "q_graph_triangles",
            "q_graph_clustering_coefficient",
            "q_graph_kcore_peel",
            "q_graph_community_lpa",
        ):
            assert queries[k](spark, SF_SMOKE).count() >= 0
            assert spark.conf.get(key) == before, k
