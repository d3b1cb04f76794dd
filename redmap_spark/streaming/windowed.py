"""Structured Streaming operators (SURVEY §2.G).

The events table is an append stream shape: (event_id, ts, user_id,
event_type, value, props). These helpers build streaming plans that
are the exact streaming analogue of the batch q_time_bucket /
q_sessionize inventory queries — same aggregates, plus watermarks for
late data. Tests run them with Trigger.availableNow over the testdata
parquet and assert equality with the batch results.
"""

from __future__ import annotations

import pandas as pd
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_raw_schema(spark: SparkSession, sf_dir: str) -> StructType:
    """Schema as stored on disk. Testdata generations store ts either
    as TIMESTAMP(NANOS) (→ long under the nanosAsLong conf) or as
    TIMESTAMP(MICROS) NTZ; a file-footer peek (batch read resolves
    only the footer, no data scan) tells us which."""
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet").schema


def normalize_ts(raw: DataFrame, schema: StructType) -> DataFrame:
    """nanos-as-long → micros timestamp, or NTZ → session-TZ timestamp."""
    if isinstance(schema["ts"].dataType, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (at scale: a Kafka
    source with the same downstream plan)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _events_raw_schema(spark, sf_dir)
    # FileStreamSource force-sets basePath to the path unless it's a
    # glob — a glob pattern is the supported way to stream one file
    raw = (
        spark.readStream.schema(schema)
        .option("basePath", sf_dir.rstrip("/"))
        .parquet(f"{sf_dir.rstrip('/')}/events*.parquet")
    )
    return normalize_ts(raw, schema)


def windowed_counts(stream: DataFrame, window: str = "1 day", watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window agg with watermark — streaming analogue of the
    batch q_time_bucket query (same day/count/sum/users output)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
                "n_events", "sum_value", "approx_users")
    )


# ---------------------------------------------- stateful sessionization

SESSION_GAP_US = 6 * 3600 * 1_000_000

SESSION_STATE_SCHEMA = "last_us long, n_sessions long, cur_len long, max_len long"
SESSION_OUT_SCHEMA = "user_id long, n_sessions long, max_session_events long"


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    gap-based session counting with explicit state (the streaming
    analogue of batch q_sessionize; with availableNow + a single
    batch it reproduces it exactly)."""

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_us, n_sessions, cur_len, max_len = state.get
        else:
            last_us, n_sessions, cur_len, max_len = -1, 0, 0, 0
        rows = []
        for pdf in batches:
            rows.append(pdf[["us"]])
        us_sorted = pd.concat(rows)["us"].sort_values()
        for us in us_sorted:
            if last_us < 0 or us - last_us > SESSION_GAP_US:
                n_sessions += 1
                cur_len = 1
            else:
                cur_len += 1
            max_len = max(max_len, cur_len)
            last_us = int(us)
        state.update((last_us, n_sessions, cur_len, max_len))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sessions], "max_session_events": [max_len]}
        )

    with_us = events.select("user_id", F.unix_micros("ts").alias("us"))
    return with_us.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_STATE_SCHEMA = "last_us long, last_eid long, last_type string"
TRANSITION_OUT_SCHEMA = "user_id long, cur string, nxt string, n long"


def transitions_stateful(events: DataFrame) -> DataFrame:
    """Streaming first-order transition counting: per-user sequence
    state (the CONSTANT-SIZE last-event tuple — timestamp, id, type)
    carries across batches; each batch emits the (cur, nxt) pair
    DELTAS it observed, ordered by (ts, event_id) exactly like batch
    q_event_transitions. Summing the deltas over users/batches
    reproduces the batch transition matrix PROVIDED each user's
    events arrive in (ts, event_id) order across micro-batches (the
    same contract as sessionize_stateful); an event that arrives
    AFTER a later event has already advanced the state is a
    cross-batch straggler whose true predecessor is unrecoverable
    from constant-size state, so it is DROPPED (not mis-counted
    against the newer last-event) — deltas then match the batch
    matrix computed over the in-order subsequence. State never grows
    with history (the 25-cell count matrix lives in the downstream
    aggregation, not in per-user state)."""

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_us, last_eid, last_type = (
            state.get if state.exists else (-1, -1, None)
        )
        pdf = pd.concat(list(batches)).sort_values(["us", "event_id"])
        counts: dict[tuple, int] = {}
        for us, eid, typ in zip(pdf["us"], pdf["event_id"], pdf["event_type"]):
            if (int(us), int(eid)) <= (last_us, last_eid):
                continue  # cross-batch straggler: predecessor lost
            if last_type is not None:
                k = (last_type, typ)
                counts[k] = counts.get(k, 0) + 1
            last_us, last_eid, last_type = int(us), int(eid), typ
        state.update((last_us, last_eid, last_type))
        if counts:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(counts),
                    "cur": [c for c, _ in counts],
                    "nxt": [n for _, n in counts],
                    "n": list(counts.values()),
                }
            )

    with_us = events.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    return with_us.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRANSITION_OUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------- streaming dedup


def dedup_stream(
    stream: DataFrame, key_cols: tuple[str, ...] = ("event_id",), watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once streaming dedup: dropDuplicatesWithinWatermark
    keeps state only for the watermark horizon, so state size is
    bounded by (arrival rate × watermark), not by stream history —
    the property that makes streaming dedup viable on an unbounded
    100 TB/day feed. Keys should be the upstream idempotency key
    (event_id here) or a content fingerprint."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(key_cols))


# ------------------------------------------------- stream-static join


def enrich_with_customers(stream: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static broadcast join: each micro-batch joins against
    the (small, slowly-changing) customer dim — no stream-side state,
    no shuffle of the stream. The batch analogue is a plain broadcast
    join, which is exactly what each micro-batch plan contains."""
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
        )
    )
    return stream.join(dim, "user_id", "left")


def segment_value_counts(
    stream: DataFrame, customers: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Windowless running agg of enriched stream: per market segment
    event counts + exact decimal value sums (update mode)."""
    return (
        enrich_with_customers(stream.withWatermark("ts", watermark), customers)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------- stream-stream join


def correlate_streams(
    stream: DataFrame,
    type_a: str = "view",
    type_b: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream INNER join: for every ``type_a`` event,
    the ``type_b`` events by the same user within ``within`` afterwards
    (view→purchase attribution, error→retry correlation, …).

    The two legs carry their own watermarks and the join condition
    time-bounds b.ts to [a.ts, a.ts + within], so Spark can prove when
    either side's state is safe to evict: state size is bounded by
    (arrival rate × (watermark + within)), never by stream history —
    the property that lets this run forever on an unbounded feed. The
    batch analogue is the same equi+range join, which is exactly what
    each micro-batch executes."""
    a = (
        stream.filter(F.col("event_type") == type_a)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("a_event_id"),
            F.col("ts").alias("a_ts"),
        )
    )
    b = (
        stream.filter(F.col("event_type") == type_b)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("b_event_id"),
            F.col("ts").alias("b_ts"),
            F.col("value").alias("b_value"),
        )
    )
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select(
        F.col("a_user").alias("user_id"),
        "a_event_id",
        "b_event_id",
        F.col("a_ts").alias("ts_a"),
        F.col("b_ts").alias("ts_b"),
        "b_value",
    )


def correlate_streams_outer(
    stream: DataFrame,
    type_a: str = "view",
    type_b: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every ``type_a``
    event emits — joined to the ``type_b`` events by the same user
    within ``within`` afterwards when they exist, or with a NULL b
    side once the watermark proves no match can still arrive
    (view-without-purchase / error-without-retry detection).

    Same bounded-state shape as correlate_streams: the time-bound
    join condition plus both-side watermarks let Spark evict a-side
    state at (watermark + within) past event time, and the null
    emission fires exactly at that eviction — so "no purchase
    followed" is only ever asserted about a window the engine has
    proven complete. An unmatched view younger than the horizon
    stays in state, emitting nothing, until the watermark passes it."""
    a = (
        stream.filter(F.col("event_type") == type_a)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("a_event_id"),
            F.col("ts").alias("a_ts"),
        )
    )
    b = (
        stream.filter(F.col("event_type") == type_b)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("b_event_id"),
            F.col("ts").alias("b_ts"),
            F.col("value").alias("b_value"),
        )
    )
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {within}")),
        "leftOuter",
    ).select(
        F.col("a_user").alias("user_id"),
        "a_event_id",
        "b_event_id",
        F.col("a_ts").alias("ts_a"),
        F.col("b_ts").alias("ts_b"),
        "b_value",
    )


def session_window_counts(
    stream: DataFrame, gap: str = "6 hours", watermark: str = "1 day"
) -> DataFrame:
    """Streaming gap-based sessionization via Spark's NATIVE
    session_window aggregate — the SAME one-groupBy plan as batch
    q_session_window, so the streamed result (after all input is
    processed) equals the batch result row for row. Sessions merge
    across micro-batches inside the aggregation state; the watermark
    bounds state to sessions that can still grow. Scale: one shuffle
    on user_id, no window-function sort pass, state evicted as
    sessions close."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


# ------------------------------------------- foreachBatch → batch sink


def stream_to_daily_rollup(stream: DataFrame, summary_path: str):
    """Bridge a micro-batch stream into the day-partitioned summary via
    foreachBatch. Returns the SINK FUNCTION to attach with
    ``stream.writeStream.foreachBatch(sink)``.

    A day's events routinely span several micro-batches in live ingest,
    so skip-if-present maintenance (the batch backfill primitive) would
    freeze a day at its first partial write. Instead each batch:

    1. APPENDS its raw events to a day-partitioned staging store
       (bronze), tagged with batch_id;
    2. recomputes the summary for ONLY the touched days from all staged
       events of those days, deduped on event_id — so a foreachBatch
       RETRY that re-appends the same events stays exactly-once;
    3. dynamic-partition-OVERWRITES exactly those day partitions
       (sources.io.overwrite_partitions).

    Same summary schema as the batch path (operators/incremental.py),
    so backfill repairs and live ingest still converge on one table; at
    100 TB the staging store is the ingest bronze layer every such
    pipeline already keeps, and each batch touches only its own days'
    partitions."""
    from redmap_spark.operators.incremental import DAY_FMT, daily_rollup
    from redmap_spark.sources.io import overwrite_partitions

    staging_path = summary_path.rstrip("/") + "__staging_events"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        day = F.date_format(F.date_trunc("day", "ts"), DAY_FMT)
        staged_batch = batch_df.withColumn("day", day).withColumn(
            "batch_id", F.lit(batch_id)
        )
        staged_batch.write.mode("append").partitionBy("day").parquet(staging_path)
        touched = [r.day for r in staged_batch.select("day").distinct().collect()]
        if not touched:
            return
        all_staged = (
            spark.read.option("basePath", staging_path)
            .parquet(staging_path)
            .filter(F.col("day").isin(touched))  # partition-pruned scan
            .dropDuplicates(["event_id"])  # retry-idempotent
            .select(F.date_format("day", DAY_FMT).alias("day"), *batch_df.columns)
        )
        recomputed = daily_rollup(all_staged).filter(F.col("day").isin(touched))
        overwrite_partitions(recomputed, summary_path, partition_by=["day"])

    return sink


# ------------------------------------- foreachBatch → HLL sketch table


def stream_to_sketch_table(sketch_path: str, lg_k: int = 12):
    """Maintain a per-day HLL distinct-user sketch table from a
    micro-batch stream (the streaming form of the batch
    ``q_hll_rollup`` sketch-table pattern). Returns the sink function
    for ``writeStream.foreachBatch``.

    Unlike counts, sketches need NO staging bronze for exactly-once:
    HLL union is idempotent (merging the same items again is a
    no-op), so a foreachBatch RETRY that re-merges its batch leaves
    every register unchanged. Each batch:

    1. sketches its own events per day (partial agg, tiny output);
    2. unions with the stored sketches of ONLY the touched days
       (partition-pruned read) via ``hll_union_agg``;
    3. dynamic-partition-overwrites exactly those day partitions.

    Any grain coarser than a day (weekly/all-time uniques) is a pure
    sketch merge over this table — the fact stream is never replayed.
    The merged result is materialized (localCheckpoint) before the
    overwrite because its lineage reads the files being replaced."""
    from pyspark.errors import AnalysisException

    from redmap_spark.operators.incremental import DAY_FMT
    from redmap_spark.sources.io import overwrite_partitions

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        day = F.date_format(F.date_trunc("day", "ts"), DAY_FMT)
        batch_sk = batch_df.groupBy(day.alias("day")).agg(
            F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk")
        )
        try:
            existing = (
                spark.read.option("basePath", sketch_path)
                .parquet(sketch_path)
                .select(F.date_format("day", DAY_FMT).alias("day"), "sk")
            )
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            existing = None
        if existing is None:
            merged = batch_sk
        else:
            touched = [r.day for r in batch_sk.select("day").collect()]
            if not touched:
                return
            merged = (
                batch_sk.unionByName(existing.filter(F.col("day").isin(touched)))
                .groupBy("day")
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
        merged = merged.localCheckpoint(eager=True)
        overwrite_partitions(merged, sketch_path, partition_by=["day"])

    return sink


def sketch_table_estimates(spark, sketch_path: str) -> DataFrame:
    """(day, est_users) from the sketch table — and the all-time
    merge, showing the grain change without touching the stream."""
    sk = spark.read.parquet(sketch_path)
    daily = sk.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
    )
    total = sk.agg(
        F.lit("ALL").alias("day"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_users"),
    )
    return daily.unionByName(total)


# ------------------------------- foreachBatch → top-k key counts


N_COUNT_BUCKETS = 64


def stream_to_key_counts(counts_path: str, key_col: str = "user_id"):
    """Maintain an exact per-key count table from a micro-batch
    stream — the state behind a streaming top-k / trending view.
    Returns the foreachBatch sink.

    Counts are additive, so a naive read-add-overwrite double-counts
    on foreachBatch retries. Instead each batch:

    1. APPENDS its per-key partial aggregate to a staging store,
       tagged with batch_id and partitioned by a stable key-hash
       bucket (``pmod(xxhash64(key), 64)``). A retry re-appends
       byte-identical (bucket, key, batch_id, n) rows — removable.
    2. Recomputes ONLY the buckets its keys touch from staged
       partials, ``dropDuplicates([key, batch_id])`` making retries
       invisible, and dynamic-partition-overwrites those buckets of
       the counts table.

    Bucket partitioning bounds each batch's rewrite to the buckets it
    touched and gives the counts table a stable layout a top-k read
    can scan in parallel. At 100 TB the staging store gets compacted
    on a schedule (compact_parquet); the recompute is partial-agg
    friendly (sum of partials per key)."""
    from redmap_spark.sources.io import overwrite_partitions

    staging = counts_path.rstrip("/") + "__staging_counts"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = (
            batch_df.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("bucket", F.pmod(F.xxhash64(key_col), F.lit(N_COUNT_BUCKETS)))
            .withColumn("batch_id", F.lit(batch_id))
        )
        partial.write.mode("append").partitionBy("bucket").parquet(staging)
        touched = [r.bucket for r in partial.select("bucket").distinct().collect()]
        if not touched:
            return
        recomputed = (
            spark.read.option("basePath", staging)
            .parquet(staging)
            .filter(F.col("bucket").isin(touched))  # partition-pruned
            .dropDuplicates([key_col, "batch_id"])  # retry-idempotent
            .groupBy("bucket", key_col)
            .agg(F.sum("n").alias("n"))
        )
        overwrite_partitions(recomputed, counts_path, partition_by=["bucket"])

    return sink


def key_counts_topk(
    spark, counts_path: str, key_col: str = "user_id", k: int = 10
) -> DataFrame:
    """Exact top-k keys from the maintained counts table (a
    TakeOrdered over the bucket-partitioned state — no full sort)."""
    return (
        spark.read.parquet(counts_path)
        .orderBy(F.desc("n"), F.asc(key_col))
        .limit(k)
        .select(key_col, "n")
    )


# ------------------------------- foreachBatch → CDC upsert (latest state)


def stream_to_latest_state(state_path: str, partition_mod: int = 16):
    """Maintain a "latest event per user" lake table from the event
    stream — the streaming CDC-apply: each micro-batch is reduced to
    one change row per user (its max-(ts, event_id) event), then
    MERGEd into the state table via operators/incremental.merge_upsert,
    which rewrites only the hash partitions the batch touches.

    Idempotent under foreachBatch retries: re-merging the same batch
    compares the same (ts, event_id) ordering and converges to the
    same state. The partition column is a stable user_id hash bucket
    (pmod ``partition_mod``) — at 100 TB you size it so a partition
    rewrite is a bounded job, and only touched buckets are rewritten.
    Returns the sink for ``writeStream.foreachBatch``.
    """
    from pyspark.sql import Window

    from redmap_spark.operators.incremental import merge_upsert

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("bucket", F.pmod(F.col("user_id"), F.lit(partition_mod)).cast("int"))
        )
        # keep only updates that are NEWER than the stored state (an
        # out-of-order replay must not regress a user's latest row).
        # Only the first-batch missing-path case may be skipped; any other
        # read failure (corrupt footer, permissions) must fail the batch so
        # structured streaming retries it rather than silently dropping the
        # newer-than-stored filter.
        try:
            cur = latest.sparkSession.read.parquet(state_path).select(
                F.col("user_id").alias("_u"),
                F.col("ts").alias("_ts"),
                F.col("event_id").alias("_eid"),
            )
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            cur = None  # first batch: no state table yet
        if cur is not None:
            latest = (
                latest.join(cur, latest.user_id == cur._u, "left")
                .filter(
                    F.col("_u").isNull()
                    | (F.col("ts") > F.col("_ts"))
                    | ((F.col("ts") == F.col("_ts")) & (F.col("event_id") >= F.col("_eid")))
                )
                .drop("_u", "_ts", "_eid")
            )
        merge_upsert(
            latest.sparkSession, state_path, latest,
            key_cols=["user_id"], partition_col="bucket",
        )

    return sink


# ------------------------------- foreachBatch → count-min sketch table


def stream_to_cms(cms_path: str, key_col: str = "user_id"):
    """Maintain a count-min sketch table (the FIXED 4x512 additive
    counter grid of inventory/sketches.q_cms_sketch) from a
    micro-batch stream — constant-size frequency state where the
    exact key-count table (stream_to_key_counts) would grow with
    cardinality. Returns the foreachBatch sink.

    Cells are additive, so retries must not re-add: each batch
    APPENDS its per-cell partial grid tagged with batch_id (a retry
    re-appends byte-identical rows), and the table is recomputed from
    staged partials with a (i, c, batch_id) dedup — the same staging
    idempotence as stream_to_key_counts, but over a grid whose size
    is CONSTANT in both data and key cardinality (≤2048 rows + 2048
    per staged batch; compacted on a schedule at scale)."""
    from redmap_spark.inventory.sketches import cms_cell

    staging = cms_path.rstrip("/") + "__staging_cells"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        depth = F.array(*[F.lit(i) for i in range(4)])
        partial = (
            batch_df.select(F.col(key_col).alias("k"), F.explode(depth).alias("i"))
            .select("i", cms_cell(F.col("i"), F.col("k")).alias("c"))
            .groupBy("i", "c")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        partial.write.mode("append").partitionBy("i").parquet(staging)
        merged = (
            spark.read.option("basePath", staging)
            .parquet(staging)
            .dropDuplicates(["i", "c", "batch_id"])  # retry-idempotent
            .groupBy("i", "c")
            .agg(F.sum("n").alias("n"))
        )
        # no checkpoint needed: the lineage reads only the staging
        # dir, never the cms_path being overwritten
        merged.write.mode("overwrite").parquet(cms_path)

    return sink


def stream_to_bloom(bloom_path: str, key_col: str = "user_id"):
    """Maintain a Bloom-filter bit table (the md5-portable m=16384 /
    h=4 layout of inventory/sketches.q_bloom_join) from a micro-batch
    stream — the membership sibling of the CMS (frequency) and HLL
    (cardinality) sinks, completing the streaming sketch trio. Set
    bits are idempotent under OR, so retries are naturally safe; the
    staging append still tags batch_id and dedups (bit, batch_id) so
    the table rebuild never double-reads a replayed batch's rows, and
    the maintained table is just the DISTINCT set-bit list (≤ m rows,
    CONSTANT in data volume). A downstream batch join consumes it
    exactly like q_bloom_join's broadcast bit table."""
    from redmap_spark.inventory.sketches import _bloom_pos

    staging = bloom_path.rstrip("/") + "__staging_bits"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hashes = F.array(*[F.lit(j) for j in range(4)])
        partial = (
            batch_df.select(F.col(key_col).alias("k"),
                            F.explode(hashes).alias("j"))
            .select(_bloom_pos(F.col("k"), F.col("j")).alias("bit"))
            .distinct()
            .withColumn("batch_id", F.lit(batch_id))
        )
        partial.write.mode("append").parquet(staging)
        merged = (
            spark.read.parquet(staging)
            .dropDuplicates(["bit", "batch_id"])  # retry-idempotent
            .select("bit")
            .distinct()
        )
        merged.write.mode("overwrite").parquet(bloom_path)

    return sink


def bloom_contains(spark, bloom_path: str, keys) -> DataFrame:
    """(key, maybe_present) membership probes against the maintained
    bit table: present iff ALL 4 bit positions are set (one broadcast
    semi-join per probe batch, never a stream scan)."""
    from redmap_spark.inventory.sketches import _bloom_pos

    bits = spark.read.parquet(bloom_path)
    kdf = spark.createDataFrame([(k,) for k in keys], ["k"])
    hashes = F.array(*[F.lit(j) for j in range(4)])
    probes = kdf.select("k", F.explode(hashes).alias("j")).select(
        "k", _bloom_pos(F.col("k"), F.col("j")).alias("bit")
    )
    return (
        probes.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left")
        .groupBy("k")
        .agg(
            (F.sum(F.coalesce("hit", F.lit(0))) == 4).cast("int")
            .alias("maybe_present")
        )
    )


def cms_estimates(spark, cms_path: str, keys) -> DataFrame:
    """(key, cms_est) for the given keys from the maintained sketch
    table: probe the 4 cells per key, take the min — never touches
    the stream. ``keys`` is a list of key values of any type (the
    schema is inferred; hashing goes through the same string form as
    the build side). A cell absent from the table means no key ever
    hashed there — it counts as 0, so a never-seen key estimates 0
    instead of being dropped or inflated by collision survivors."""
    from redmap_spark.inventory.sketches import cms_cell

    sk = spark.read.parquet(cms_path)
    kdf = spark.createDataFrame([(k,) for k in keys], ["k"])
    depth = F.array(*[F.lit(i) for i in range(4)])
    probes = kdf.select("k", F.explode(depth).alias("i")).select(
        "k", "i", cms_cell(F.col("i"), F.col("k")).alias("c")
    )
    return (
        probes.join(F.broadcast(sk), ["i", "c"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("bigint").alias("cms_est"))
    )


# ------------------------------- foreachBatch → EWMA metric state


def stream_to_ewma(state_path: str, key_col: str = "event_type",
                   value_col: str = "value"):
    """Maintain per-key EWMA-smoothed batch metrics (finite-horizon,
    alpha = 1/2 — the streaming twin of inventory q_ewma). Returns
    the ``writeStream.foreachBatch`` sink.

    Unlike the additive sinks (key counts, HLL, CMS cells), the EWMA
    recursion is NON-commutative: replaying or reordering a batch
    through a read-modify-write scalar state would corrupt the
    smoothing. So the ordered staging log IS the state: each batch
    appends its per-key exact-decimal sum tagged with batch_id (a
    retry re-appends byte-identical rows, deduped on
    (key, batch_id)), and the published state table is recomputed as
    the weighted fold over the last 8 staged batches per key in
    batch_id order — replay-safe because the fold input, not the
    fold result, is what persists.

    Per-batch work is BOUNDED: the fold scans only the last
    ``HORIZON`` (64) batch-id partitions of the log (partition-pruned
    read), and keys idle longer than that carry their previous
    published row forward unchanged. A key whose 8 most recent
    appearances straddle the horizon loses only tail terms of weight
    ≤ (1/2)^j with the denominator renormalizing — a bounded-horizon
    approximation, not unbounded-log latency. Old partitions compact
    / expire on a schedule at scale.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import Window

    from redmap_spark.inventory.timeseries import ewma_cols

    staging = state_path.rstrip("/") + "__staging_sums"
    HORIZON = 64

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = (
            batch_df.groupBy(key_col)
            .agg(
                # keep the widened sum precision: narrowing to
                # DECIMAL(18,2) would silently NULL on overflow for a
                # hot key and drop the batch from the fold
                F.sum(F.col(value_col).cast("decimal(18,2)")).alias("rev")
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        partial.write.mode("append").partitionBy("batch_id").parquet(staging)
        w = Window.partitionBy(key_col).orderBy("batch_id")
        lagged = (
            spark.read.option("basePath", staging)
            .parquet(staging)
            .filter(F.col("batch_id") >= batch_id - (HORIZON - 1))
            .dropDuplicates([key_col, "batch_id"])  # retry-idempotent
            .select(
                key_col,
                "batch_id",
                F.col("rev").alias("r0"),
                *[F.lag("rev", j).over(w).alias(f"r{j}") for j in range(1, 8)],
            )
        )
        num, den = ewma_cols()
        fresh = (
            lagged.select(
                key_col,
                F.col("batch_id").cast("long").alias("last_batch_id"),
                F.col("r0").cast("double").alias("batch_value"),
                F.round(num.cast("double") / den.cast("double"), 6).alias("ewma"),
                F.row_number()
                .over(
                    Window.partitionBy(key_col).orderBy(F.desc("batch_id"))
                )
                .alias("_rk"),
            )
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        # keys with no appearance inside the horizon keep their last
        # published row; localCheckpoint breaks the read-then-overwrite
        # file dependency on state_path. Only the first-batch
        # missing-path case may be skipped (same contract as
        # stream_to_latest_state).
        try:
            prev = spark.read.parquet(state_path).localCheckpoint(eager=True)
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            prev = None
        if prev is not None:
            carried = prev.join(
                fresh.select(F.col(key_col).alias("_k")),
                prev[key_col] == F.col("_k"),
                "left_anti",
            )
            fresh = fresh.unionByName(carried)
        fresh.write.mode("overwrite").parquet(state_path)

    return sink


# ------------------------------- foreachBatch → bottom-k quantile sketch


def stream_to_quantile_sketch(sketch_path: str, key_col: str = "event_type",
                              id_col: str = "event_id",
                              value_col: str = "value", k: int = 256):
    """Maintain the bottom-k-by-hash quantile sketch of
    inventory/sketches.q_quantile_sketch from a micro-batch stream —
    constant-size per-key state (≤ k rows per key) where an exact
    quantile would need the full value log. Returns the
    ``writeStream.foreachBatch`` sink.

    Bottom-k samples merge by union-then-rekeep: each batch appends
    its LOCAL per-key bottom-k (≤ k·|keys| rows, constant in batch
    size) tagged with batch_id, and the sketch table is recomputed as
    the global bottom-k over staged partials. A retry re-appends
    byte-identical rows that the (key, hv, batch_id) dedup removes —
    the same staging idempotence as stream_to_cms. Because merge is
    associative and the hash is md5(event_id), the drained sketch is
    bit-identical to the batch sample regardless of micro-batch
    boundaries (asserted in tests/test_streaming.py)."""
    from pyspark.sql import Window as W

    staging = sketch_path.rstrip("/") + "__staging_mins"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hv = (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            ).cast("bigint").alias("hv")
        )
        partial = (
            batch_df.select(F.col(key_col).alias("key"), F.col(value_col).alias("value"), hv)
            .withColumn("rk", F.row_number().over(W.partitionBy("key").orderBy("hv")))
            .filter(F.col("rk") <= k)
            .drop("rk")
            .withColumn("batch_id", F.lit(batch_id))
        )
        partial.write.mode("append").parquet(staging)
        merged = (
            spark.read.parquet(staging)
            .dropDuplicates(["key", "hv", "batch_id"])  # retry-idempotent
            .dropDuplicates(["key", "hv"])  # same row seen in 2 batches
            .withColumn("rk", F.row_number().over(W.partitionBy("key").orderBy("hv")))
            .filter(F.col("rk") <= k)
            .drop("rk", "batch_id")
        )
        merged.write.mode("overwrite").parquet(sketch_path)

    return sink


def quantile_sketch_estimates(spark, sketch_path: str) -> DataFrame:
    """(key, m, p50_est, p90_est, p99_est) from the maintained sketch
    table: order statistics at rank ceil(q·m) over the ≤k sampled
    values per key — never touches the stream."""
    from pyspark.sql import Window as W

    sk = spark.read.parquet(sketch_path)
    wp = W.partitionBy("key")
    sized = sk.select(
        "key", "value",
        F.row_number().over(wp.orderBy("value")).alias("vrk"),
        F.count(F.lit(1)).over(wp).alias("m"),
    )

    def at(q):
        target = F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.lit(q) * F.col("m")).cast("bigint"),
        )
        return F.max(F.when(F.col("vrk") == target, F.col("value"))).alias(
            f"p{int(q * 100)}_est"
        )

    return sized.groupBy("key").agg(
        F.max("m").cast("bigint").alias("m"), at(0.5), at(0.9), at(0.99)
    )


# -------------------------- foreachBatch → Page–Hinkley drift state


def stream_to_page_hinkley(state_path: str, key_col: str = "event_type",
                           value_col: str = "value",
                           delta: float = 0.005, lam: float = 0.25):
    """Maintain a per-key Page–Hinkley drift statistic over the
    micro-batch mean of ``value_col`` (the streaming twin of
    inventory q_page_hinkley, at batch granularity). Returns the
    ``writeStream.foreachBatch`` sink.

    PH is a LEFT FOLD over history (running mean, cumulative slack
    sum, running minimum) — non-commutative like the EWMA, so the
    ordered staging log IS the state (the stream_to_ewma contract):
    each batch appends its per-key exact-decimal (sum, count) tagged
    with batch_id (a retry re-appends byte-identical rows, deduped
    on (key, batch_id)), and the published state recomputes the
    whole fold from the last ``HORIZON`` (256) staged batches in
    batch_id order. Batch means are normalized by the key's
    horizon-wide mean so delta/lambda live on the ~1.0 z scale at
    any traffic volume; every cumulative fold is an exact DECIMAL
    cumsum (per-term rounded to 9), so replays are bit-identical.
    Per-key state row: last batch, n_batches folded, z, ph, ph_min,
    and the drift flag ph − ph_min > lambda.
    """
    from pyspark.sql import Window

    staging = state_path.rstrip("/") + "__staging_means"
    HORIZON = 256

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = (
            batch_df.groupBy(key_col)
            .agg(
                F.sum(F.col(value_col).cast("decimal(18,2)"))
                .cast("decimal(28,2)").alias("vsum"),
                F.count(value_col).cast("bigint").alias("vcnt"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        partial.write.mode("append").partitionBy("batch_id").parquet(staging)
        log = (
            spark.read.option("basePath", staging)
            .parquet(staging)
            .filter(F.col("batch_id") >= batch_id - (HORIZON - 1))
            .dropDuplicates([key_col, "batch_id"])  # retry-idempotent
            .filter(F.col("vcnt") > 0)
        )
        wk = Window.partitionBy(key_col)
        wo = Window.partitionBy(key_col).orderBy("batch_id")
        mu = (
            F.sum("vsum").over(wk).cast("double")
            / F.sum("vcnt").over(wk)
        )
        grid = log.select(
            key_col, "batch_id",
            (F.col("vsum").cast("double") / F.col("vcnt") / mu).alias("z"),
            (
                F.sum(F.round(F.col("vsum").cast("double") / F.col("vcnt"),
                              6).cast("decimal(28,6)")).over(wo)
                .cast("double")
                / F.row_number().over(wo) / mu
            ).alias("zbar"),
            F.row_number().over(wo).alias("rn"),
        )
        terms = grid.select(
            key_col, "batch_id", "z", "rn",
            F.round(F.col("z") - F.col("zbar") - delta, 9)
            .cast("decimal(28,9)").alias("term"),
        )
        cum = terms.select(
            key_col, "batch_id", "z", "rn",
            F.sum("term").over(wo).cast("decimal(28,9)").alias("ph_dec"),
        )
        ph = cum.select(
            key_col, "batch_id", "z", "rn",
            F.col("ph_dec").cast("double").alias("ph"),
            F.min("ph_dec").over(wo).cast("double").alias("ph_min"),
        )
        fresh = (
            ph.withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy(key_col).orderBy(F.desc("batch_id"))
                ),
            )
            .filter(F.col("_rk") == 1)
            .select(
                key_col,
                F.col("batch_id").cast("long").alias("last_batch_id"),
                F.col("rn").cast("long").alias("n_batches"),
                F.round("z", 6).alias("z"),
                F.round("ph", 6).alias("ph"),
                F.round("ph_min", 6).alias("ph_min"),
                (F.col("ph") - F.col("ph_min") > lam).cast("int")
                .alias("drift"),
            )
        )
        # lineage reads only the staging dir, never state_path
        fresh.write.mode("overwrite").parquet(state_path)

    return sink
