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


def test_stream_dedup(spark, tmp_path):
    """Duplicate the events file in a staging dir: the stream sees
    every event twice; dropDuplicatesWithinWatermark must restore the
    exact original multiset."""
    import shutil

    from redmap_spark.streaming.windowed import _events_raw_schema, dedup_stream, normalize_ts

    stage = tmp_path / "stage"
    stage.mkdir()
    src = f"{SF_DIR}/events.parquet"
    shutil.copy(src, stage / "events_a.parquet")
    shutil.copy(src, stage / "events_b.parquet")
    schema = _events_raw_schema(spark, SF_DIR)
    raw = normalize_ts(
        spark.readStream.schema(schema).parquet(f"{stage}/events_*.parquet"),
        schema,
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        dedup_stream(raw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n_src = spark.read.parquet(src).count()
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src


def test_stream_static_join_matches_batch(spark):
    from redmap_spark.catalog import Catalog
    from redmap_spark.streaming.windowed import events_stream, segment_value_counts

    c = Catalog(spark, SF_DIR)
    stream = events_stream(spark, SF_DIR)
    _run_available_now(segment_value_counts(stream, c.customer), "seg_counts")
    got = {
        r.c_mktsegment: (r.n_events, r.sum_value)
        for r in spark.sql("select * from seg_counts").collect()
    }
    batch = (
        c.events.join(
            c.customer.select(
                F.col("c_custkey").alias("user_id"), "c_mktsegment"
            ),
            "user_id",
            "left",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    want = {r.c_mktsegment: (r.n_events, r.sum_value) for r in batch.collect()}
    assert got == want


def test_foreachbatch_rollup_matches_batch(spark, tmp_path):
    """availableNow stream → foreachBatch → incremental day summary
    must equal the batch rollup for fully-covered days."""
    from redmap_spark.catalog import Catalog
    from redmap_spark.operators.incremental import daily_rollup
    from redmap_spark.streaming.windowed import events_stream, stream_to_daily_rollup

    summary = str(tmp_path / "summary")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream(spark, SF_DIR)
    q = (
        stream.writeStream.foreachBatch(stream_to_daily_rollup(stream, summary))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.day: (r.n_events, r.sum_value, r.n_users)
        for r in spark.read.parquet(summary)
        .withColumn("day", F.date_format("day", "yyyy-MM-dd"))
        .collect()
    }
    want = {
        r.day: (r.n_events, r.sum_value, r.n_users)
        for r in daily_rollup(Catalog(spark, SF_DIR).events).collect()
    }
    # days spanning micro-batches are recomputed from staging and
    # partition-overwritten, so EVERY day must match the batch rollup
    # exactly regardless of how availableNow splits the batches
    assert got == want


def test_foreachbatch_rollup_multibatch_day_and_retry(spark, tmp_path):
    """The bug class the bridge must survive: one day's events arriving
    across TWO micro-batches (second batch must not be dropped), and a
    foreachBatch RETRY re-delivering a batch (must stay exactly-once)."""
    from redmap_spark.streaming.windowed import stream_to_daily_rollup

    summary = str(tmp_path / "summary")
    sink = stream_to_daily_rollup(None, summary)
    schema = "event_id long, ts string, user_id long, value double"
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00", 10, 1.0), (2, "2024-01-01 02:00:00", 11, 2.0)],
        schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1 = spark.createDataFrame(
        [(3, "2024-01-01 20:00:00", 10, 4.0), (4, "2024-01-02 00:30:00", 12, 8.0)],
        schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # retry of batch 1 — must not double-count
    got = {
        r.day: (r.n_events, r.sum_value, r.n_users)
        for r in spark.read.parquet(summary)
        .withColumn("day", F.date_format("day", "yyyy-MM-dd"))
        .collect()
    }
    assert got == {
        "2024-01-01": (3, 7.0, 2),  # both batches' events, users {10, 11}
        "2024-01-02": (1, 8.0, 1),
    }


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream view→purchase correlation over an
    availableNow run must equal the identical batch range join."""
    from redmap_spark.catalog import Catalog
    from redmap_spark.streaming.windowed import correlate_streams, events_stream

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream(spark, SF_DIR)
    q = (
        correlate_streams(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.a_event_id, r.b_event_id)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.user_id, r.a_event_id, r.b_event_id)
        for r in correlate_streams(Catalog(spark, SF_DIR).events).collect()
    }
    assert got == want and len(want) > 0


def test_stream_sketch_table_matches_batch_and_retry_idempotent(spark, tmp_path):
    """Streaming per-day HLL sketch maintenance: estimates after the
    stream equal the batch-side sketch estimates exactly (same sketch
    algorithm, same lg_k), multi-batch days merge correctly, and a
    foreachBatch retry is a no-op (HLL union idempotence)."""
    from redmap_spark.catalog import Catalog
    from redmap_spark.streaming.windowed import (
        events_stream,
        sketch_table_estimates,
        stream_to_sketch_table,
    )

    sketches = str(tmp_path / "sketches")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream(spark, SF_DIR)
    q = (
        stream.writeStream.foreachBatch(stream_to_sketch_table(sketches))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.day: r.est_users for r in sketch_table_estimates(spark, sketches).collect()}
    e = Catalog(spark, SF_DIR).events
    want = {
        r.day: r.est
        for r in e.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).cast("long").alias("est"))
        .collect()
    }
    want["ALL"] = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).cast("long").alias("est")
    ).collect()[0].est
    assert got == want

    # retry idempotence: re-merging one day's events changes nothing
    sink = stream_to_sketch_table(sketches)
    sink(e.limit(500), 99)
    again = {r.day: r.est_users for r in sketch_table_estimates(spark, sketches).collect()}
    assert again == got


def test_stream_key_counts_topk_matches_batch_and_retry(spark, tmp_path):
    """Streaming key-count maintenance: after the stream drains, the
    counts table equals the batch groupBy exactly; top-k matches the
    batch top-k; a foreachBatch retry changes nothing (staged partials
    dedupe on (key, batch_id))."""
    from redmap_spark.catalog import Catalog
    from redmap_spark.streaming.windowed import (
        events_stream,
        key_counts_topk,
        stream_to_key_counts,
    )

    counts = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream(spark, SF_DIR)
    sink = stream_to_key_counts(counts)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    e = Catalog(spark, SF_DIR).events
    want = {r.user_id: r.n for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r.user_id: r.n for r in spark.read.parquet(counts).collect()}
    assert got == want

    top = key_counts_topk(spark, counts, k=5).collect()
    best = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.user_id, r.n) for r in top] == best

    # retry: foreachBatch re-delivers the SAME batch content under the
    # same batch_id — the staged partials are byte-identical and the
    # (key, batch_id) dedup makes the re-run a no-op
    sink(e, 0)
    again = {r.user_id: r.n for r in spark.read.parquet(counts).collect()}
    assert again == want


def test_stream_to_latest_state(spark, tmp_path):
    """Streaming CDC-apply: after draining the whole events file, the
    state table must hold exactly each user's max-(ts,event_id) event
    — identical to the batch groupBy answer."""
    from redmap_spark.streaming.windowed import events_stream, stream_to_latest_state

    state = str(tmp_path / "latest_state")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream(spark, SF_DIR)
    q = (
        stream.writeStream.foreachBatch(stream_to_latest_state(state))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(state).select("user_id", "ts", "event_id")
    from pyspark.sql import Window

    from redmap_spark.catalog import Catalog
    e = Catalog(spark, SF_DIR).events
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = (
        e.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("user_id", "ts", "event_id")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_stream_to_cms(spark, tmp_path):
    """Streaming CMS maintenance: after draining the events file, the
    maintained 4x512 grid must equal the one-shot batch sketch
    cell-for-cell (additive mergeability across micro-batches), the
    probed estimates must dominate exact counts, and a foreachBatch
    retry must be a no-op."""
    from redmap_spark.catalog import Catalog
    from redmap_spark.inventory.sketches import cms_cell
    from redmap_spark.streaming.windowed import (
        cms_estimates,
        events_stream,
        stream_to_cms,
    )

    cms = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream(spark, SF_DIR)
    sink = stream_to_cms(cms)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    e = Catalog(spark, SF_DIR).events
    depth = F.array(*[F.lit(i) for i in range(4)])
    batch_grid = {
        (r.i, r.c): r.n
        for r in e.select(F.explode(depth).alias("i"), F.col("user_id").alias("k"))
        .select("i", cms_cell(F.col("i"), F.col("k")).alias("c"))
        .groupBy("i", "c")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    streamed_grid = {
        (r.i, r.c): r.n for r in spark.read.parquet(cms).collect()
    }
    assert streamed_grid == batch_grid

    exact = {
        r.user_id: r.n
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    some = sorted(exact)[:20]
    never_seen = max(exact) + 999_983  # definitely not in the stream
    est = {
        r.k: r.cms_est
        for r in cms_estimates(spark, cms, some + [never_seen]).collect()
    }
    assert all(est[k] >= exact[k] for k in some)
    # a never-seen key must come back (not be dropped) and its
    # estimate is the min over its cells — 0 if any cell is empty
    assert never_seen in est and est[never_seen] >= 0

    # retry: re-delivering the SAME batch content under the SAME
    # batch_id must be a no-op. Delivered as an explicit extra batch
    # so the check holds regardless of how availableNow split the
    # stream into micro-batches.
    # deterministic subset (limit() could pick different rows on the
    # retry re-execution and break the byte-identical premise)
    extra = e.filter(F.col("event_id") % 20 == 0).select("user_id")
    sink(extra, 999)
    after_extra = {(r.i, r.c): r.n for r in spark.read.parquet(cms).collect()}
    assert after_extra != batch_grid  # the new batch did land
    sink(extra, 999)  # retry of batch 999: byte-identical staged rows
    again = {(r.i, r.c): r.n for r in spark.read.parquet(cms).collect()}
    assert again == after_extra


def test_stream_to_ewma(spark, tmp_path):
    """Streaming EWMA maintenance: after draining the events file,
    the state table's per-type EWMA must equal an independent pandas
    recomputation of the finite-horizon fold over the staged batch
    log, and replaying a batch (foreachBatch retry) must leave the
    state bit-identical — the ordered-log state is replay-safe even
    though the EWMA recursion itself is non-commutative."""
    import pandas as pd

    from redmap_spark.streaming.windowed import events_stream, stream_to_ewma

    state = str(tmp_path / "ewma")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream(spark, SF_DIR)
    sink = stream_to_ewma(state)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.event_type: r for r in spark.read.parquet(state).collect()}
    staged = (
        spark.read.parquet(state.rstrip("/") + "__staging_sums")
        .dropDuplicates(["event_type", "batch_id"])
        .toPandas()
    )
    weights = [0.5 ** j for j in range(8)]
    for et, grp in staged.groupby("event_type"):
        seq = [float(v) for v in grp.sort_values("batch_id")["rev"]]
        tail = seq[::-1][:8]  # newest first
        expect = sum(w * v for w, v in zip(weights, tail)) / sum(
            weights[: len(tail)]
        )
        assert abs(got[et].ewma - round(expect, 6)) < 1e-9, (et, got[et])
        assert got[et].batch_value == seq[-1]
        assert got[et].last_batch_id == grp["batch_id"].max()

    # retry idempotence: re-invoking the sink with the SAME batch id
    # and payload must converge to the same state (dedup on
    # (key, batch_id) makes the re-append a no-op).
    from pyspark.sql import Row

    replay = spark.createDataFrame(
        [Row(event_type="view", value=123.45), Row(event_type="view", value=1.0)]
    )
    sink(replay, batch_id=10_000)
    after_once = sorted(map(tuple, spark.read.parquet(state).collect()))
    sink(replay, batch_id=10_000)
    after_twice = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert after_once == after_twice
    pd.testing.assert_frame_equal(
        pd.DataFrame(after_once), pd.DataFrame(after_twice)
    )


def test_stream_to_quantile_sketch(spark, tmp_path):
    """Streaming bottom-k quantile sketch: after draining the events
    file, the maintained sample must equal the batch bottom-k sample
    row-for-row (union-then-rekeep mergeability across micro-batch
    boundaries), the probed order-stat estimates must match the batch
    computation, and a foreachBatch retry must be a no-op."""
    from pyspark.sql import Window

    from redmap_spark.catalog import Catalog
    from redmap_spark.inventory.sketches import QSK_K
    from redmap_spark.streaming.windowed import (
        events_stream,
        quantile_sketch_estimates,
        stream_to_quantile_sketch,
    )

    path = str(tmp_path / "qsk")
    ckpt = str(tmp_path / "ckpt")
    sink = stream_to_quantile_sketch(path)
    q = (
        events_stream(spark, SF_DIR)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    e = Catalog(spark, SF_DIR).events
    hv = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hv")
    )
    batch_sample = {
        (r.key, r.hv, r.value)
        for r in e.select(F.col("event_type").alias("key"), "value", hv)
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("key").orderBy("hv")),
        )
        .filter(F.col("rk") <= QSK_K)
        .drop("rk")
        .collect()
    }
    streamed = {
        (r.key, r.hv, r.value) for r in spark.read.parquet(path).collect()
    }
    assert streamed == batch_sample

    # estimates agree with q_quantile_sketch's sample-side order stats
    from redmap_spark.inventory import QUERIES

    batch_rows = {
        r.event_type: r for r in QUERIES["q_quantile_sketch"](spark, SF_DIR).collect()
    }
    for r in quantile_sketch_estimates(spark, path).collect():
        b = batch_rows[r.key]
        assert (r.p50_est, r.p90_est, r.p99_est) == (
            b.p50_est, b.p90_est, b.p99_est,
        ), r.key

    # retry: re-delivering the same rows under the same batch_id is a
    # no-op (byte-identical staged partials dedup away)
    extra = e.filter(F.col("event_id") % 20 == 0).select(
        "event_id", "event_type", "value"
    )
    sink(extra, 999)
    after_extra = {
        (r.key, r.hv, r.value) for r in spark.read.parquet(path).collect()
    }
    sink(extra, 999)
    again = {
        (r.key, r.hv, r.value) for r in spark.read.parquet(path).collect()
    }
    assert again == after_extra


def test_transitions_stateful_match_batch(spark):
    """Streaming per-user sequence-state transition deltas, summed,
    equal the batch first-order transition matrix counts."""
    from redmap_spark.inventory import QUERIES
    from redmap_spark.streaming.windowed import transitions_stateful

    stream = events_stream(spark, SF_DIR)
    _run_available_now(transitions_stateful(stream), "transitions")
    got = {
        (r.cur, r.nxt): r.total
        for r in spark.sql(
            "select cur, nxt, sum(n) as total from transitions group by 1, 2"
        ).collect()
    }
    want = {
        (r.cur, r.nxt): r.n
        for r in QUERIES["q_event_transitions"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_to_bloom_matches_batch(spark, tmp_path):
    """The streamed Bloom bit table equals the batch-computed bit set,
    and membership probes are exact for present keys (no false
    negatives) with the never-seen probe resolving by ALL-4-bits."""
    import tempfile

    from pyspark.sql import functions as F
    from redmap_spark.catalog import Catalog
    from redmap_spark.inventory.sketches import _bloom_pos
    from redmap_spark.streaming.windowed import (
        bloom_contains,
        stream_to_bloom,
    )

    bloom_path = str(tmp_path / "bloom")
    stream = events_stream(spark, SF_DIR)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(stream_to_bloom(bloom_path))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    e = Catalog(spark, SF_DIR).events
    hashes = F.array(*[F.lit(j) for j in range(4)])
    want_bits = {
        r.bit
        for r in e.select(F.col("user_id").alias("k"), F.explode(hashes).alias("j"))
        .select(_bloom_pos(F.col("k"), F.col("j")).alias("bit"))
        .distinct()
        .collect()
    }
    got_bits = {r.bit for r in spark.read.parquet(bloom_path).collect()}
    assert got_bits == want_bits

    present = [r.user_id for r in e.select("user_id").distinct().limit(5).collect()]
    absent = [10**12 + 7]  # far outside the user_id range
    got = {
        r.k: r.maybe_present
        for r in bloom_contains(spark, bloom_path, present + absent).collect()
    }
    assert all(got[k] == 1 for k in present)  # no false negatives
    assert set(got) == set(present + absent)


def test_stream_to_page_hinkley(spark, tmp_path):
    """Streaming Page-Hinkley drift state: after draining the events
    file, each key's (z, ph, ph_min, drift) must equal an independent
    Python recomputation of the normalized PH fold over the staged
    batch-mean log (HALF_UP rounding to mirror Spark's round()), and
    a foreachBatch retry must leave the state bit-identical."""
    from decimal import ROUND_HALF_UP, Decimal

    from redmap_spark.streaming.windowed import (
        events_stream,
        stream_to_page_hinkley,
    )

    def r(x, nd):
        q = Decimal(1).scaleb(-nd)
        return float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))

    state = str(tmp_path / "ph")
    ckpt = str(tmp_path / "ckpt")
    stream = events_stream(spark, SF_DIR)
    sink = stream_to_page_hinkley(state)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {row.event_type: row for row in spark.read.parquet(state).collect()}
    staged = (
        spark.read.parquet(state.rstrip("/") + "__staging_means")
        .dropDuplicates(["event_type", "batch_id"])
        .toPandas()
    )
    for et, grp in staged.groupby("event_type"):
        grp = grp.sort_values("batch_id")
        sums = [float(v) for v in grp["vsum"]]
        cnts = [int(v) for v in grp["vcnt"]]
        mu = sum(sums) / sum(cnts)
        cum_mean = 0.0
        ph_val, ph_min = 0.0, None
        for i, (s, c) in enumerate(zip(sums, cnts), start=1):
            z = s / c / mu
            cum_mean += r(s / c, 6)
            zbar = cum_mean / i / mu
            ph_val += r(z - zbar - 0.005, 9)
            ph_val = round(ph_val, 9)  # decimal cumsum stays exact
            ph_min = ph_val if ph_min is None else min(ph_min, ph_val)
        row = got[et]
        assert abs(row.z - r(z, 6)) < 1e-9, (et, row)
        assert abs(row.ph - r(ph_val, 6)) < 1e-9, (et, row)
        assert abs(row.ph_min - r(ph_min, 6)) < 1e-9, (et, row)
        assert row.drift == int(ph_val - ph_min > 0.25)
        assert row.n_batches == len(sums)
        assert row.last_batch_id == grp["batch_id"].max()

    # retry idempotence: same batch id + payload must be a no-op
    from pyspark.sql import Row

    replay = spark.createDataFrame(
        [Row(event_type="view", value=50.0), Row(event_type="view", value=70.0)]
    )
    sink(replay, batch_id=10_000)
    once = sorted(map(tuple, spark.read.parquet(state).collect()))
    sink(replay, batch_id=10_000)
    twice = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert once == twice


def test_transitions_stateful_drops_cross_batch_stragglers(spark, tmp_path):
    """An event arriving in a LATER micro-batch with an earlier
    (ts, event_id) than the stored last-event state is dropped, not
    counted out of order: summed deltas equal the batch matrix of the
    in-order subsequence (here A->C), never a spurious C->B."""
    import pandas as pd

    from redmap_spark.streaming.windowed import transitions_stateful

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, event_id long, event_type string, ts timestamp"

    def write_file(rows):
        pdf = pd.DataFrame(
            rows, columns=["user_id", "event_id", "event_type", "ts"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    deltas: list[tuple] = []

    def sink(batch_df, _bid):
        deltas.extend(
            (r.cur, r.nxt, r.n) for r in batch_df.collect()
        )

    def run_once():
        q = (
            transitions_stateful(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = "2024-01-01 00:00:0"
    write_file([(1, 10, "A", t + "1"), (1, 30, "C", t + "3")])
    run_once()
    # second run: a straggler file older than the stored state
    write_file([(1, 20, "B", t + "2")])
    run_once()
    got = {}
    for cur, nxt, n in deltas:
        got[(cur, nxt)] = got.get((cur, nxt), 0) + n
    assert got == {("A", "C"): 1}, got


def test_stream_stream_left_outer_join_emits_unmatched_on_watermark(
    spark, tmp_path
):
    """Watermarked LEFT OUTER stream-stream join: views with a
    purchase in-window emit joined; a view with NO purchase emits a
    NULL b-side row once a later batch advances the watermark past
    its (watermark + within) horizon."""
    import pandas as pd

    from redmap_spark.streaming.windowed import correlate_streams_outer

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = (
        "user_id long, event_id long, event_type string,"
        " ts timestamp, value double"
    )

    def write_file(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["user_id", "event_id", "event_type", "ts", "value"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_once():
        q = (
            correlate_streams_outer(
                spark.readStream.schema(schema).parquet(src)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_file(
        [
            (1, 10, "view", "2024-01-01 00:00:00", 0.0),
            (1, 11, "purchase", "2024-01-01 00:30:00", 9.5),
            (2, 20, "view", "2024-01-01 00:05:00", 0.0),
        ]
    )
    run_once()
    # later batches far enough ahead to move the watermark (2h) past
    # user 2's view + join horizon (1h). BOTH legs must advance: the
    # global watermark is the MIN over the two withWatermark
    # operators, so a view-only batch would hold it at the purchase
    # leg's last event. The watermark commits at batch END, so a
    # final batch performs the eviction-time null emission.
    write_file(
        [
            (9, 90, "view", "2024-01-02 00:00:00", 0.0),
            (9, 95, "purchase", "2024-01-02 00:00:00", 1.0),
        ]
    )
    run_once()
    write_file(
        [
            (9, 91, "view", "2024-01-02 01:00:00", 0.0),
            (9, 96, "purchase", "2024-01-02 01:00:00", 1.0),
        ]
    )
    run_once()
    rows = {
        (r.user_id, r.a_event_id, r.b_event_id)
        for r in spark.read.parquet(out).collect()
    }
    assert (1, 10, 11) in rows, rows  # matched pair
    assert (2, 20, None) in rows, rows  # watermark-expired unmatched view


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """The streaming session_window aggregate over an availableNow
    pass equals batch q_session_window row for row (same native
    aggregate, merged across micro-batches)."""
    from redmap_spark.inventory import QUERIES
    from redmap_spark.streaming.windowed import (
        events_stream,
        session_window_counts,
    )

    stream = events_stream(spark, SF_DIR)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            session_window_counts(stream)
            .writeStream.format("memory")
            .queryName("stream_sessions")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.sql("select * from stream_sessions").collect()
    }
    want = {
        (r.user_id, r.session_start, r.n_events)
        for r in QUERIES["q_session_window"](spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0
