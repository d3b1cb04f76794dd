"""Structured Streaming (SURVEY §2.G): availableNow runs over the
events parquet must reproduce the batch inventory results."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from redmap_spark.inventory.analytic import q_sessionize, q_time_bucket
from redmap_spark.streaming.windowed import (
    events_stream,
    sessionize_stateful,
    windowed_counts,
)
from tests.conftest import SF_DIR


def _run_available_now(stream_df, name: str):
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)


def test_windowed_counts_match_batch(spark):
    stream = events_stream(spark, SF_DIR)
    _run_available_now(windowed_counts(stream), "win_counts")
    got = {
        r.day: (r.n_events, r.sum_value)
        for r in spark.sql("select * from win_counts").collect()
    }
    want = {r.day: (r.n_events, r.sum_value) for r in q_time_bucket(spark, SF_DIR).collect()}
    assert got == want


def test_stateful_sessionize_matches_batch(spark):
    stream = events_stream(spark, SF_DIR)
    _run_available_now(sessionize_stateful(stream), "sessions")
    got = {
        r.user_id: (r.n_sessions, r.max_session_events)
        for r in spark.sql("select * from sessions").collect()
    }
    want = {
        r.user_id: (r.n_sessions, r.max_session_events)
        for r in q_sessionize(spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_to_parquet_sink(spark, tmp_path):
    stream = events_stream(spark, SF_DIR)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream.filter(F.col("event_type") == "purchase")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.read.parquet(out).count()
    want = spark.read.parquet(f"{SF_DIR}/events.parquet").where("event_type = 'purchase'").count()
    assert n == want
