"""Unit tests for the declarative MapReduceJob API (SURVEY.md §2.1),
mirroring the reference's worker/manager tests: the API must reproduce
what the mapper/reducer executables compute."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_server_spark.catalog import load_tables
from distributed_mapreduce_server_spark.mapreduce.api import MapReduceJob, grep_job, word_count_job


def test_word_count_job_matches_manual(spark, sf_smoke):
    docs = load_tables(spark, sf_smoke, register_views=False)["documents"]
    got = {r["key"]: r["cnt"] for r in word_count_job().run(docs).collect()}

    import re
    from collections import Counter

    want = Counter()
    for row in docs.select("text").collect():
        want.update(t for t in re.split(r"[^a-z0-9]+", row["text"].lower()) if t)
    assert got == dict(want)


def test_grep_job_finds_all_matching_lines(spark, sf_smoke):
    docs = load_tables(spark, sf_smoke, register_views=False)["documents"]
    out = grep_job("spark").run(docs)
    rows = out.collect()
    assert all("spark" in r["line"] for r in rows)
    want = sum(
        1
        for r in docs.select("text").collect()
        for line in r["text"].split("\n")
        if "spark" in line
    )
    assert len(rows) == want


def test_num_reducers_controls_shuffle_partitioning(spark, sf_smoke):
    docs = load_tables(spark, sf_smoke, register_views=False)["documents"]
    job = word_count_job()
    job.num_reducers = 3
    out = job.run(docs)
    assert out.count() > 0


def test_sorted_stream_reducer(spark, sf_smoke):
    """The reference reducer reads a per-key sorted stream; emulate
    'first event value per user' that genuinely needs ordering."""
    ev = load_tables(spark, sf_smoke, register_views=False)["events"]

    job = MapReduceJob(
        mapper=lambda df: df.select("user_id", "ts", "value"),
        key_cols=("user_id",),
        reducer_aggs=(),
    )

    def first_value(pdf):
        return pdf.head(1)[["user_id", "value"]]

    out = job.run_sorted_stream(ev, ("ts",), first_value, "user_id long, value double")
    got = {r["user_id"]: r["value"] for r in out.collect()}

    w_rows = ev.orderBy("ts").collect()
    want = {}
    for r in w_rows:
        want.setdefault(r["user_id"], r["value"])
    assert got == want


def test_num_reducers_controls_output_shards(spark, tmp_path_factory):
    """The reference's --nreducers writes exactly N part files
    (reference: mapreduce/manager/__main__.py partitions reduce output
    by task id). MapReduceJob.run(num_reducers=N) must keep N shards
    through a write."""
    from distributed_mapreduce_server_spark.catalog import load_tables
    from distributed_mapreduce_server_spark.mapreduce.api import word_count_job
    import os

    docs = load_tables(spark, "/root/testdata/sf0.001", register_views=False)["documents"]
    job = word_count_job()
    job.num_reducers = 3
    out = job.run(docs)
    path = str(tmp_path_factory.mktemp("nred") / "wc")
    out.write.format("csv").save(path)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 3


def test_mapreduce_job_matches_python_reference_on_random_corpora(spark):
    """Property-based parity with a pure-Python MapReduce evaluation
    (the reference's semantics): for random corpora, the DataFrame
    compilation of map -> shuffle -> reduce produces exactly the
    counts a hand-run mapper/reducer would."""
    import re
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    token = st.text(alphabet="ab z0.!", min_size=0, max_size=6)
    corpus = st.lists(token, min_size=1, max_size=12)

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(corpus)
    def check(texts):
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        got = {r["key"]: r["cnt"] for r in word_count_job().run(df).collect()}
        want = Counter()
        for t in texts:
            want.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
        assert got == dict(want)

    check()
