"""Streaming equivalence tests (SURVEY.md §5): availableNow streams
must reproduce the batch operators' results."""

from __future__ import annotations

from distributed_mapreduce_server_spark.operators.events import (
    q_events_sessionize,
    q_events_windowed,
)
from distributed_mapreduce_server_spark.streaming.jobs import (
    stream_events_windowed,
    stream_sessionize,
)


def test_stream_windowed_matches_batch(spark, sf_smoke):
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in q_events_windowed(spark, sf_smoke).collect()
    }
    stream = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in stream_events_windowed(spark, sf_smoke).collect()
    }
    assert stream == batch


def test_stream_sessionize_closed_sessions_match_batch(spark, sf_smoke):
    batch = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["session_start"], r["session_end"])
        for r in q_events_sessionize(spark, sf_smoke).collect()
    }
    stream_rows = stream_sessionize(spark, sf_smoke).collect()
    assert stream_rows, "stream emitted no closed sessions"
    for r in stream_rows:
        key = (r["user_id"], r["session_seq"])
        assert key in batch, f"stream session {key} unknown to batch"
        n, start, end = batch[key]
        assert r["n_events"] == n
        assert r["session_start"] == start
        assert r["session_end"] == end
    # every user's non-final session must have been emitted by the stream
    last_seq = {}
    for u, s in batch:
        last_seq[u] = max(last_seq.get(u, 0), s)
    expected_closed = {(u, s) for (u, s) in batch if s < last_seq[u]}
    got = {(r["user_id"], r["session_seq"]) for r in stream_rows}
    assert expected_closed <= got
