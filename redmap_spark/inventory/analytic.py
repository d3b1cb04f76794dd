"""SURVEY §2.A continued — window functions, sessionization, as-of /
range joins, pivot/rollup/cube, histogram, JSON extraction.

Time values are compared as epoch microseconds (BIGINT) so Spark and
DuckDB never disagree on timestamp string formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, query

EVENT_ORDER = ["ts", "event_id"]

# -- q_window_running: running sum / rank / lag ------------------------

QWIN_SQL = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER w AS rn,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
       LAG(value) OVER w AS prev_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("q_window_running", oracle=QWIN_SQL)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.row_number().over(wo).alias("rn"),
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
        F.lag("value").over(wo).alias("prev_value"),
    )


# -- q_topk_per_group: row_number per-group top-k ----------------------

QTOPK_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
"""


@query("q_topk_per_group", oracle=QTOPK_SQL)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        c.orders.join(F.broadcast(c.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# -- q_rollup / q_cube -------------------------------------------------

QROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("q_rollup", oracle=QROLLUP_SQL)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).lineitem
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


QCUBE_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@query("q_cube", oracle=QCUBE_SQL)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("sum_total"),
    )


# -- q_pivot: event_type → columns -------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

QPIVOT_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


@query("q_pivot", oracle=QPIVOT_SQL)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)  # explicit values: no extra pass
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES]
    )


# -- q_histogram: width-bucket histogram -------------------------------

QHIST_SQL = """
SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_total,
       MAX(o_totalprice) AS max_total
FROM orders GROUP BY 1
"""


@query("q_histogram", oracle=QHIST_SQL)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast("long")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_total"),
        F.max("o_totalprice").alias("max_total"),
    )


# -- q_json_extract ----------------------------------------------------

QJSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events GROUP BY event_type
"""


@query("q_json_extract", oracle=QJSON_SQL)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


# -- q_sessionize: gap-based sessions (6h gap) -------------------------

GAP_US = 6 * 3600 * 1_000_000

QSESS_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > {GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e
), g AS (
  SELECT user_id, sess, COUNT(*) AS n FROM s GROUP BY user_id, sess
)
SELECT user_id, COUNT(*) AS n_sessions, CAST(MAX(n) AS BIGINT) AS max_session_events
FROM g GROUP BY user_id
"""


@query("q_sessionize", oracle=QSESS_SQL)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    brk = F.when(us - F.lag(us).over(wo) > GAP_US, 1).otherwise(0)
    sess = e.select("user_id", brk.alias("brk"), "ts", "event_id").select(
        "user_id", F.sum("brk").over(wsum).alias("sess")
    )
    per_session = sess.groupBy("user_id", "sess").agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n").cast("long").alias("max_session_events"),
    )


# -- q_asof_join: most recent click at-or-before each purchase ---------
# Implemented with the scalable union+carry-forward pattern (one shuffle
# on user_id, no row explosion) rather than a join — the plan a range
# join would explode at 100 TB.

QASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_q
  FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, ts, event_id, is_q,
         LAST_VALUE(click_id IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, is_q, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
  FROM tagged
)
SELECT event_id AS purchase_id, user_id,
       COALESCE(last_click_id, -1) AS last_click_id
FROM carried WHERE is_q = 1
"""


@query("q_asof_join", oracle=QASOF_SQL)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(F.col("event_type").isin("click", "purchase"))
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_q"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_q", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.select(
            "user_id",
            "event_id",
            "is_q",
            F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        )
        .filter(F.col("is_q") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.coalesce(F.col("last_click_id"), F.lit(-1)).alias("last_click_id"),
        )
    )


# -- q_range_join: clicks within 1h before each purchase ---------------

HOUR_US = 3600 * 1_000_000

QRANGE_SQL = f"""
WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS pus FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, epoch_us(ts) AS cus, value FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id,
       CAST(COUNT(c.cus) AS BIGINT) AS n_clicks,
       CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS sum_click_value
FROM p LEFT JOIN c
  ON p.user_id = c.user_id AND c.cus >= p.pus - {HOUR_US} AND c.cus < p.pus
GROUP BY p.event_id
"""


@query("q_range_join", oracle=QRANGE_SQL)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("pus")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.unix_micros("ts").alias("cus"), "value"
    )
    # equi-join on user_id keeps this a hash join; the range predicate
    # filters inside each user's partition (bounded fan-out per key).
    j = p.join(
        c,
        (p.user_id == c.c_user) & (c.cus >= p.pus - HOUR_US) & (c.cus < p.pus),
        "left",
    )
    return j.groupBy("event_id").agg(
        F.count("cus").cast("long").alias("n_clicks"),
        F.coalesce(F.sum(dec("value")), F.lit(0).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_click_value"),
    ).select(F.col("event_id").alias("purchase_id"), "n_clicks", "sum_click_value")


# -- q_time_bucket: tumbling 1-day window (streaming-parity shape) -----

QTB_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


@query("q_time_bucket", oracle=QTB_SQL)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# -- q_percentiles -----------------------------------------------------
#
# Exact interpolated percentiles (Spark `percentile` == DuckDB
# `quantile_cont`, both type-R7). At 100 TB the production variant is
# approx_percentile (t-digest style, mergeable partial state, no full
# sort); the exact version is the oracle-checkable form.

QPCT_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""


@query("q_percentiles", oracle=QPCT_SQL)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return c.events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


# -- q_outer_join ------------------------------------------------------

QFO_SQL = """
WITH s AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n_signups
  FROM events WHERE event_type = 'signup' GROUP BY 1),
p AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT COALESCE(s.day, p.day) AS day,
       COALESCE(n_signups, 0) AS n_signups,
       COALESCE(n_purchases, 0) AS n_purchases
FROM s FULL OUTER JOIN p ON s.day = p.day
"""


@query("q_outer_join", oracle=QFO_SQL)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two per-day aggregates (null-complete axes).
    At scale both sides are already shuffled on the join key by their
    groupBys — the outer join reuses that clustering (no extra
    exchange)."""
    e = Catalog(spark, sf_dir).events
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_signups"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        s.join(p, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_signups", F.lit(0)).alias("n_signups"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


# -- q_funnel ----------------------------------------------------------

QFUNNEL_SQL = """
WITH steps AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
       CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
       CAST(SUM(CASE WHEN t_purchase > t_click AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
FROM steps
"""


@query("q_funnel", oracle=QFUNNEL_SQL)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (first view → later first click →
    later first purchase). One shuffle on user_id for the step
    pivot, then a scalar roll-up — the standard two-phase funnel at
    any scale."""
    c = Catalog(spark, sf_dir)
    steps = c.events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    one = F.lit(1)
    zero = F.lit(0)
    return steps.agg(
        F.count(one).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), one).otherwise(zero)).alias("step_view"),
        F.sum(F.when(F.col("t_click") > F.col("t_view"), one).otherwise(zero)).alias(
            "step_click"
        ),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                one,
            ).otherwise(zero)
        ).alias("step_purchase"),
    )


# -- q_approx_users ----------------------------------------------------


@query("q_approx_users")  # approximate (HLL): verified by error-bound pytest
def q_approx_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event type (rsd 2%). The HLL
    sketch is mergeable partial state — per-partition sketches
    combine associatively at the reducer, so distinct-counting a
    100 TB stream needs one pass and kilobytes of state where exact
    countDistinct needs a full shuffle of every key. Exact variant
    appears in q_time_bucket (oracle-checked)."""
    c = Catalog(spark, sf_dir)
    return c.events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# -- q_grouping_sets ---------------------------------------------------

QGS_SQL = """
SELECT c_mktsegment, c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), (c_mktsegment, c_nationkey))
"""


@query("q_grouping_sets", oracle=QGS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the engine's SQL surface: the catalog
    registers every table as a view and the identical ANSI text runs
    on Spark SQL (one Expand + one aggregate — same plan shape as
    rollup/cube). Demonstrates full spark.sql parity with the
    DataFrame inventory."""
    Catalog(spark, sf_dir).register_all()
    return spark.sql(QGS_SQL)


# -- q_profile ---------------------------------------------------------

_PROF_COLS = ("c_mktsegment", "c_nationkey", "c_acctbal")

QPROF_SQL = " UNION ALL ".join(
    f"""SELECT '{c}' AS col,
               CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_v,
               CAST(MAX({c}) AS VARCHAR) AS max_v
        FROM customer"""
    for c in _PROF_COLS
)


@query("q_profile", oracle=QPROF_SQL)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (ANALYZE-style stats) in ONE pass over the
    table: all per-column aggregates run in a single aggregate node,
    then pivot to one row per column driver-side-free via explode of
    a struct array. At 100 TB this is one scan; the naive per-column
    UNION (what the SQL oracle spells) would be len(cols) scans."""
    c = Catalog(spark, sf_dir)
    aggs = []
    for col in _PROF_COLS:
        aggs += [
            F.count(col).alias(f"nn_{col}"),
            F.countDistinct(col).alias(f"nd_{col}"),
            F.min(col).cast("string").alias(f"mn_{col}"),
            F.max(col).cast("string").alias(f"mx_{col}"),
        ]
    one = c.customer.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(col).alias("col"),
                F.col(f"nn_{col}").alias("n_nonnull"),
                F.col(f"nd_{col}").alias("n_distinct"),
                F.col(f"mn_{col}").alias("min_v"),
                F.col(f"mx_{col}").alias("max_v"),
            )
            for col in _PROF_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


# -- q_window_frames ---------------------------------------------------

QWF_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pr,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("q_window_frames", oracle=QWF_SQL)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth: ntile quartiles, percent_rank, and an
    explicit ROWS-frame moving sum — all over ONE window ordering, so
    Spark evaluates them in a single sort/shuffle of orders."""
    from pyspark.sql import Window

    c = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(-2, 0)
    return c.orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.sum(dec("o_totalprice")).over(wf).cast("double").alias("moving_sum3"),
    )


# -- q_array_ops -------------------------------------------------------

QARR_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       list_sort(list_distinct(toks))[1] AS first_tok,
       CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT) AS n_long,
       round(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))), 6) AS total_chars
FROM t
"""


@query("q_array_ops", oracle=QARR_SQL)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-function breadth: size / array_distinct /
    array_sort / filter / aggregate — all JVM higher-order functions
    over a bound token array (one split per row)."""
    d = Catalog(spark, sf_dir).documents
    tok = d.select("doc_id", F.split("text", " ").alias("toks"))
    return tok.select(
        "doc_id",
        F.size("toks").cast("long").alias("n"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.element_at(F.array_sort(F.array_distinct("toks")), 1).alias("first_tok"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        F.round(
            F.aggregate(
                F.transform("toks", lambda x: F.length(x).cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("total_chars"),
    )


# -- q_session_window --------------------------------------------------

QSW_SQL = f"""
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts) >= {GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sess
"""


@query("q_session_window", oracle=QSW_SQL)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE session_window aggregate
    (one groupBy — works identically in batch and streaming, where it
    also merges across micro-batches). The oracle spells the same
    semantics as lag+cumsum; note Spark's session end is exclusive,
    so a gap of exactly 6h starts a new session (oracle breaks on
    >=). Scale: one shuffle on user_id, sessions merged inside the
    aggregate — no window-function sort pass."""
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


# q_heavy_hitters moved to redmap_spark/inventory/sketches.py (it is
# exact after refinement, so it carries a DuckDB oracle and registers
# inside the driver's CORRECTNESS window).


# -- q_unpivot ---------------------------------------------------------
#
# UNPIVOT / melt — the inverse reshape of q_pivot: a wide per-segment
# metrics row (order counts in three totalprice bands) melts back to
# long (segment, band, n_orders) tidy form via Spark's native
# DataFrame.unpivot (Catalyst Expand, one pass, no join). The oracle
# states the same melt as a UNION ALL of the three band columns —
# the engine-portable definition of unpivot. Counts are exact; no FP
# anywhere. Shape: one fact groupBy to the |segments| grid, then the
# constant ×3 Expand.

UNPIVOT_SQL = """
WITH wide AS (
  SELECT c_mktsegment,
         CAST(SUM(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END)
              AS BIGINT) AS band_low,
         CAST(SUM(CASE WHEN o_totalprice >= 100000
                        AND o_totalprice < 300000 THEN 1 ELSE 0 END)
              AS BIGINT) AS band_mid,
         CAST(SUM(CASE WHEN o_totalprice >= 300000 THEN 1 ELSE 0 END)
              AS BIGINT) AS band_high
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
)
SELECT c_mktsegment, 'band_low' AS band, band_low AS n_orders FROM wide
UNION ALL
SELECT c_mktsegment, 'band_mid', band_mid FROM wide
UNION ALL
SELECT c_mktsegment, 'band_high', band_high FROM wide
"""


@query("q_unpivot", oracle=UNPIVOT_SQL)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    o, cust = c.orders, c.customer
    tp = F.col("o_totalprice")
    wide = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(tp < 100000, 1).otherwise(0)).cast("bigint")
            .alias("band_low"),
            F.sum(F.when((tp >= 100000) & (tp < 300000), 1).otherwise(0))
            .cast("bigint").alias("band_mid"),
            F.sum(F.when(tp >= 300000, 1).otherwise(0)).cast("bigint")
            .alias("band_high"),
        )
    )
    return wide.unpivot(
        ["c_mktsegment"],
        ["band_low", "band_mid", "band_high"],
        "band",
        "n_orders",
    )
