"""SURVEY §2.A/§2.E additions — table-level data-quality constraint
checking and temperature-based mixture sampling (oracle-verified)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query
from redmap_spark.plans.prefix import two_phase_cumsum

# -- q_data_quality ----------------------------------------------------
#
# Declarative constraint suite over the lake (the Deequ shape): key
# uniqueness, value bounds, null checks, and FK referential integrity,
# emitted as one constraint-report table. Scale shape: all orders
# constraints come from ONE aggregated scan (count/distinct/violation
# counts share the pass); the FK check is a single left-anti join
# (orders side shuffles once, or broadcasts when it fits). The report
# is a UNION of 1-row aggregates — constant-size output however big
# the inputs.

DATA_QUALITY_SQL = """
WITH o AS (
  SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS nk,
         SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos,
         SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nulls
  FROM orders
), fk AS (
  SELECT COUNT(*) AS orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NULL
)
SELECT 'orders.o_orderkey is unique' AS check_name,
       nk = n AS passed, CAST(n - nk AS BIGINT) AS violations FROM o
UNION ALL
SELECT 'orders.o_totalprice > 0', nonpos = 0, CAST(nonpos AS BIGINT) FROM o
UNION ALL
SELECT 'orders.o_orderdate not null', nulls = 0, CAST(nulls AS BIGINT) FROM o
UNION ALL
SELECT 'lineitem.l_orderkey references orders', orphans = 0,
       CAST(orphans AS BIGINT) FROM fk
"""


@query("q_data_quality", oracle=DATA_QUALITY_SQL)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    o = c.orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("nk"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpos"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("nulls"),
    )
    li = c.lineitem.select("l_orderkey")
    fk = (
        li.join(
            c.orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("orphans"))
    )

    def row(src: DataFrame, name: str, passed, violations) -> DataFrame:
        return src.select(
            F.lit(name).alias("check_name"),
            passed.alias("passed"),
            violations.cast("long").alias("violations"),
        )

    return (
        row(o, "orders.o_orderkey is unique",
            F.col("nk") == F.col("n"), F.col("n") - F.col("nk"))
        .unionAll(row(o, "orders.o_totalprice > 0",
                      F.col("nonpos") == 0, F.col("nonpos")))
        .unionAll(row(o, "orders.o_orderdate not null",
                      F.col("nulls") == 0, F.col("nulls")))
        .unionAll(row(fk, "lineitem.l_orderkey references orders",
                      F.col("orphans") == 0, F.col("orphans")))
    )


# -- txt_temperature_sample --------------------------------------------
#
# Temperature-based mixture sampling (the multilingual-pretraining
# rebalance: sample source s with probability ∝ n_s^α, α=0.5, so
# small sources are up-weighted relative to their share). Per-source
# acceptance rates are computed from the per-source counts (tiny,
# broadcast); each doc accepts deterministically when its md5-derived
# uniform fraction falls under its source's rate — reproducible on
# any engine/partitioning, no rand(). One count pass + one
# rate-lookup pass; zero fact-sized shuffles (the counts groupBy
# moves |sources| rows).

TEMPERATURE_SQL = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1
), stats AS (
  SELECT CAST(SUM(n_s) AS DOUBLE) AS n_tot, SUM(pow(n_s, 0.5)) AS sum_w
  FROM counts
), rates AS (
  SELECT source, n_s,
         least(1.0, (0.4 * n_tot) * (pow(n_s, 0.5) / sum_w) / n_s) AS rate
  FROM counts CROSS JOIN stats
)
SELECT d.doc_id, d.source, round(r.rate, 6) AS rate
FROM documents d JOIN rates r USING (source)
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
        / 16777216.0 < r.rate
"""


@query("txt_temperature_sample", oracle=TEMPERATURE_SQL)
def txt_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    stats = counts.agg(
        F.sum("n_s").cast("double").alias("n_tot"),
        F.sum(F.pow("n_s", F.lit(0.5))).alias("sum_w"),
    )
    rates = counts.crossJoin(F.broadcast(stats)).select(
        "source",
        F.least(
            F.lit(1.0),
            (0.4 * F.col("n_tot"))
            * (F.pow("n_s", F.lit(0.5)) / F.col("sum_w"))
            / F.col("n_s"),
        ).alias("rate"),
    )
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") / F.lit(16777216.0)
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(frac < F.col("rate"))
        .select("doc_id", "source", F.round("rate", 6).alias("rate"))
    )


# -- q_fd_audit --------------------------------------------------------
#
# Functional-dependency profiling (the schema-discovery / data-quality
# audit Metanome-style tools run): for each declared candidate FD
# `det -> dep`, count how many determinant values map to more than one
# dependent value. Scale shape: each check is one partial-aggregated
# groupBy on the determinant (distinct-count of the dependent), then a
# constant-size fold — the report is |checks| rows however big the
# inputs. The key-derived FD o_orderkey->o_custkey HOLDS by
# construction (determinant is the primary key), while the
# nation/segment and customer/priority pairs are genuinely violated.

FD_AUDIT_SQL = """
WITH c1 AS (
  SELECT COUNT(*) AS nk, SUM(CASE WHEN g > 1 THEN 1 ELSE 0 END) AS nv,
         MAX(g) AS mf
  FROM (SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS g
        FROM customer GROUP BY 1) t
), c2 AS (
  SELECT COUNT(*) AS nk, SUM(CASE WHEN g > 1 THEN 1 ELSE 0 END) AS nv,
         MAX(g) AS mf
  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS g
        FROM orders GROUP BY 1) t
), c3 AS (
  SELECT COUNT(*) AS nk, SUM(CASE WHEN g > 1 THEN 1 ELSE 0 END) AS nv,
         MAX(g) AS mf
  FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS g
        FROM orders GROUP BY 1) t
), c4 AS (
  SELECT COUNT(*) AS nk, SUM(CASE WHEN g > 1 THEN 1 ELSE 0 END) AS nv,
         MAX(g) AS mf
  FROM (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS g
        FROM lineitem GROUP BY 1) t
)
SELECT 'customer: c_nationkey -> c_mktsegment' AS fd,
       CAST(nk AS BIGINT) AS n_keys, CAST(nv AS BIGINT) AS n_violating_keys,
       CAST(mf AS BIGINT) AS max_fanout, nv = 0 AS holds FROM c1
UNION ALL
SELECT 'orders: o_custkey -> o_orderpriority', CAST(nk AS BIGINT),
       CAST(nv AS BIGINT), CAST(mf AS BIGINT), nv = 0 FROM c2
UNION ALL
SELECT 'orders: o_orderkey -> o_custkey', CAST(nk AS BIGINT),
       CAST(nv AS BIGINT), CAST(mf AS BIGINT), nv = 0 FROM c3
UNION ALL
SELECT 'lineitem: l_partkey -> l_suppkey', CAST(nk AS BIGINT),
       CAST(nv AS BIGINT), CAST(mf AS BIGINT), nv = 0 FROM c4
"""


@query("q_fd_audit", oracle=FD_AUDIT_SQL)
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)

    def check(src: DataFrame, det: str, dep: str, label: str) -> DataFrame:
        g = src.groupBy(det).agg(F.countDistinct(dep).alias("g"))
        return g.agg(
            F.lit(label).alias("fd"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col("g") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_keys"),
            F.max("g").cast("bigint").alias("max_fanout"),
        ).withColumn("holds", F.col("n_violating_keys") == 0)

    return (
        check(c.customer, "c_nationkey", "c_mktsegment",
              "customer: c_nationkey -> c_mktsegment")
        .unionAll(check(c.orders, "o_custkey", "o_orderpriority",
                        "orders: o_custkey -> o_orderpriority"))
        .unionAll(check(c.orders, "o_orderkey", "o_custkey",
                        "orders: o_orderkey -> o_custkey"))
        .unionAll(check(c.lineitem, "l_partkey", "l_suppkey",
                        "lineitem: l_partkey -> l_suppkey"))
    )


# -- q_skew_report -----------------------------------------------------
#
# Join-key skew diagnostic over the lake's canonical shuffle keys
# (lineitem.l_partkey, orders.o_custkey, events.user_id): per key the
# distribution of per-value row counts — max/p99/p50 counts, top-1 and
# top-10 share, and the skew ratio max/avg that decides whether a join
# needs salting or AQE skew handling (the number the q_salted_join
# mitigation is justified by). Percentiles of the count distribution
# are order statistics at rank ceil(q·n_keys) (value-deterministic
# under ties); shares are exact-count double divisions. Shape: one
# groupBy per fact scan collapses to the key grid; everything after is
# |keys|-sized windows.

SKEW_SQL = """
WITH c AS (
  SELECT 'lineitem.l_partkey' AS key_name, l_partkey AS k,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
  UNION ALL
  SELECT 'orders.o_custkey', o_custkey, CAST(COUNT(*) AS BIGINT)
  FROM orders GROUP BY 1, 2
  UNION ALL
  SELECT 'events.user_id', user_id, CAST(COUNT(*) AS BIGINT)
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT key_name, c,
         ROW_NUMBER() OVER (PARTITION BY key_name ORDER BY c, k) AS vrk,
         CAST(COUNT(*) OVER (PARTITION BY key_name) AS BIGINT) AS nk,
         CAST(SUM(c) OVER (PARTITION BY key_name) AS BIGINT) AS n
  FROM c
)
SELECT key_name,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(MAX(nk) AS BIGINT) AS n_keys,
       MAX(CASE WHEN vrk = CAST(ceil(0.5 * nk) AS BIGINT) THEN c END)
         AS p50_rows_per_key,
       MAX(CASE WHEN vrk = CAST(ceil(0.99 * nk) AS BIGINT) THEN c END)
         AS p99_rows_per_key,
       MAX(c) AS max_rows_per_key,
       round(MAX(c) / CAST(MAX(n) AS DOUBLE), 6) AS top1_share,
       round(CAST(SUM(CASE WHEN vrk > nk - 10 THEN c ELSE 0 END) AS BIGINT)
             / CAST(MAX(n) AS DOUBLE), 6) AS top10_share,
       round(MAX(c) * CAST(MAX(nk) AS DOUBLE) / MAX(n), 6) AS skew_ratio
FROM r GROUP BY 1
"""


@query("q_skew_report", oracle=SKEW_SQL)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    parts = [
        ("lineitem.l_partkey", cat.lineitem.select(F.col("l_partkey").alias("k"))),
        ("orders.o_custkey", cat.orders.select(F.col("o_custkey").alias("k"))),
        ("events.user_id", cat.events.select(F.col("user_id").alias("k"))),
    ]
    counted = None
    for name, df in parts:
        g = df.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("c")) \
              .select(F.lit(name).alias("key_name"), "k", "c")
        counted = g if counted is None else counted.unionAll(g)
    wp = Window.partitionBy("key_name")
    r = counted.select(
        "key_name", "c",
        F.row_number().over(wp.orderBy("c", "k")).alias("vrk"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("nk"),
        F.sum("c").over(wp).cast("bigint").alias("n"),
    )
    def at(q):
        return F.max(
            F.when(
                F.col("vrk") == F.ceil(q * F.col("nk")).cast("bigint"),
                F.col("c"),
            )
        )
    return r.groupBy("key_name").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.max("nk").cast("bigint").alias("n_keys"),
        at(0.5).alias("p50_rows_per_key"),
        at(0.99).alias("p99_rows_per_key"),
        F.max("c").alias("max_rows_per_key"),
        F.round(F.max("c") / F.max("n").cast("double"), 6).alias("top1_share"),
        F.round(
            F.sum(
                F.when(F.col("vrk") > F.col("nk") - 10, F.col("c")).otherwise(0)
            ).cast("bigint")
            / F.max("n").cast("double"),
            6,
        ).alias("top10_share"),
        F.round(
            F.max("c") * F.max("nk").cast("double") / F.max("n"), 6
        ).alias("skew_ratio"),
    )


# -- q_join_size_estimate ----------------------------------------------
#
# Join-explosion planner: the exact output cardinality Σ|A_k|·|B_k|
# of the lineitem self-join on l_partkey (the candidate-pair blowup
# any naive co-occurrence/dedup pass would trigger), per-key
# contributions for the 10 worst keys, and the total again under the
# production df≤64 hub cap — the number consulted BEFORE running a
# pair-generating join, deciding between exact semantics and the
# capped variant (the dedup_jaccard_capped / mr_adamic_adar knob).
# Scale shape: one partial-aggregated groupBy to the |keys| grid; the
# totals are a broadcast 1-row aggregate; integers exact throughout.

JOIN_SIZE_SQL = """
WITH k AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_rows * n_rows) AS BIGINT) AS total_pairs,
         CAST(SUM(CASE WHEN n_rows <= 64
                       THEN n_rows * n_rows ELSE 0 END) AS BIGINT)
           AS capped_pairs
  FROM k
)
SELECT l_partkey, n_rows,
       CAST(n_rows * n_rows AS BIGINT) AS pairs,
       round(n_rows * n_rows / CAST(total_pairs AS DOUBLE), 6)
         AS share_of_total,
       total_pairs, capped_pairs
FROM k CROSS JOIN tot
ORDER BY pairs DESC, l_partkey
LIMIT 10
"""


@query("q_join_size_estimate", oracle=JOIN_SIZE_SQL)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    k = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    pairs = F.col("n_rows") * F.col("n_rows")
    tot = k.agg(
        F.sum(pairs).cast("bigint").alias("total_pairs"),
        F.sum(F.when(F.col("n_rows") <= 64, pairs).otherwise(0))
        .cast("bigint").alias("capped_pairs"),
    )
    return (
        k.join(F.broadcast(tot))
        .select(
            "l_partkey", "n_rows",
            pairs.cast("bigint").alias("pairs"),
            F.round(pairs / F.col("total_pairs").cast("double"), 6)
            .alias("share_of_total"),
            "total_pairs", "capped_pairs",
        )
        .orderBy(F.desc("pairs"), F.asc("l_partkey"))
        .limit(10)
    )


# -- q_sample_audit ----------------------------------------------------
#
# Sampler-bias audit: the deterministic md5 hash sampler (the
# q_hash_sample / q_temperature_sample keep-decision mechanism) at
# nominal rate p = 1/16 (first md5 hex nibble = '0'), audited per
# event type against the binomial expectation — observed k vs n·p
# and the normal-approximation z = (k−np)/√(np(1−p)) with a |z|≤4
# pass flag. This is the trust-but-verify run a pipeline does after
# switching samplers: a biased hash (or a correlated key) shows up
# here immediately. Exact integer counts; identical double z shape.

SAMPLE_AUDIT_SQL = """
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
                       THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM events GROUP BY 1
)
SELECT event_type, n, k,
       round(n / 16.0, 6) AS expected,
       round((k - n / 16.0) / sqrt(n * (1.0 / 16.0) * (15.0 / 16.0)), 6)
         AS z_bias,
       CAST(CASE WHEN abs((k - n / 16.0)
                          / sqrt(n * (1.0 / 16.0) * (15.0 / 16.0))) <= 4.0
            THEN 1 ELSE 0 END AS BIGINT) AS within_4sigma
FROM s
ORDER BY event_type
"""


@query("q_sample_audit", oracle=SAMPLE_AUDIT_SQL)
def q_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
                == "0",
                1,
            ).otherwise(0)
        ).cast("bigint").alias("k"),
    )
    n, k = F.col("n"), F.col("k")
    z = (k - n / 16.0) / F.sqrt(n * (1.0 / 16.0) * (15.0 / 16.0))
    return s.select(
        "event_type", "n", "k",
        F.round(n / 16.0, 6).alias("expected"),
        F.round(z, 6).alias("z_bias"),
        F.when(F.abs(z) <= 4.0, 1).otherwise(0).cast("bigint")
        .alias("within_4sigma"),
    ).orderBy("event_type")


# -- q_fk_orphans ------------------------------------------------------
#
# Referential-integrity audit: orphaned foreign keys across the star
# schema (lineitem→orders/part/supplier, orders→customer,
# customer/supplier→nation) — the conformance check a warehouse runs
# on every load; TPC-H data is clean, so non-zero rows here mean a
# broken ingest. Each FK is one left-anti count: the fact side
# partial-aggregates to distinct keys first (|keys| ≪ rows), the dim
# side is a broadcast semi-join probe. Exact integers only.

FK_ORPHANS_SQL = """
SELECT 'lineitem.l_orderkey->orders' AS fk,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem)
             WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
            AS BIGINT) AS n_orphan_keys
UNION ALL
SELECT 'lineitem.l_partkey->part',
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey FROM lineitem)
             WHERE l_partkey NOT IN (SELECT p_partkey FROM part)) AS BIGINT)
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem)
             WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
            AS BIGINT)
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders)
             WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
            AS BIGINT)
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer)
             WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
            AS BIGINT)
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT s_nationkey FROM supplier)
             WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation))
            AS BIGINT)
ORDER BY fk
"""


@query("q_fk_orphans", oracle=FK_ORPHANS_SQL)
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    checks = [
        ("lineitem.l_orderkey->orders", c.lineitem, "l_orderkey",
         c.orders, "o_orderkey"),
        ("lineitem.l_partkey->part", c.lineitem, "l_partkey",
         c.part, "p_partkey"),
        ("lineitem.l_suppkey->supplier", c.lineitem, "l_suppkey",
         c.supplier, "s_suppkey"),
        ("orders.o_custkey->customer", c.orders, "o_custkey",
         c.customer, "c_custkey"),
        ("customer.c_nationkey->nation", c.customer, "c_nationkey",
         c.nation, "n_nationkey"),
        ("supplier.s_nationkey->nation", c.supplier, "s_nationkey",
         c.nation, "n_nationkey"),
    ]
    out = None
    for name, fact, fk, dim, pk in checks:
        orphans = (
            fact.select(F.col(fk).alias("k")).distinct()
            .join(dim.select(F.col(pk).alias("k")), "k", "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphan_keys"))
            .select(F.lit(name).alias("fk"), "n_orphan_keys")
        )
        out = orphans if out is None else out.union(orphans)
    return out.orderBy("fk")


# -- q_watermark_planner -----------------------------------------------
#
# Watermark sizing from measured disorder: treating event_id as the
# arrival order (the append-log position) and ts as event time, how
# late do events actually arrive? Per type: the inversion share
# (events whose ts precedes the running arrival-order max — exactly
# the rows a too-tight watermark would drop) and the p50/p95/max
# lateness in seconds behind that running max, as exact order
# statistics on the |type × distinct-lateness| grid (the
# q_lateness_percentiles shape). This is THE number that sizes
# `withWatermark` for the §2.G streaming jobs — measured, not
# guessed. One arrival-order window per type; integer seconds exact.

WATERMARK_SQL = """
WITH a AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         MAX(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY event_id) AS runmax
  FROM events
), lat AS (
  SELECT event_type, runmax - sec AS late_s FROM a
), g AS (
  SELECT event_type, late_s, CAST(COUNT(*) AS BIGINT) AS c
  FROM lat GROUP BY 1, 2
), cg AS (
  SELECT event_type, late_s, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY late_s) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS m
  FROM g
)
SELECT event_type,
       CAST(MAX(m) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN late_s > 0 THEN c ELSE 0 END) AS BIGINT)
         AS n_late,
       round(SUM(CASE WHEN late_s > 0 THEN c ELSE 0 END)
             / CAST(MAX(m) AS DOUBLE), 6) AS late_share,
       CAST(MIN(CASE WHEN cum >= CAST(ceil(0.5 * m) AS BIGINT)
                     THEN late_s END) AS BIGINT) AS p50_late_s,
       CAST(MIN(CASE WHEN cum >= CAST(ceil(0.95 * m) AS BIGINT)
                     THEN late_s END) AS BIGINT) AS p95_late_s,
       CAST(MAX(late_s) AS BIGINT) AS max_late_s
FROM cg GROUP BY 1
ORDER BY event_type
"""


@query("q_watermark_planner", oracle=WATERMARK_SQL)
def q_watermark_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy("event_id")
    a = e.select(
        "event_type",
        F.col("ts").cast("long").alias("sec"),
        F.max(F.col("ts").cast("long")).over(w).alias("runmax"),
    )
    g = a.select(
        "event_type", (F.col("runmax") - F.col("sec")).alias("late_s")
    ).groupBy("event_type", "late_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wp = Window.partitionBy("event_type")
    cg = g.select(
        "event_type", "late_s", "c",
        F.sum("c").over(wp.orderBy("late_s")).alias("cum"),
        F.sum("c").over(wp).alias("m"),
    )

    def at(q):
        return F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("m")).cast("bigint"),
                F.col("late_s"),
            )
        ).cast("bigint")

    return cg.groupBy("event_type").agg(
        F.max("m").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_s") > 0, F.col("c")).otherwise(0))
        .cast("bigint").alias("n_late"),
        F.round(
            F.sum(F.when(F.col("late_s") > 0, F.col("c")).otherwise(0))
            / F.max("m").cast("double"),
            6,
        ).alias("late_share"),
        at(0.5).alias("p50_late_s"),
        at(0.95).alias("p95_late_s"),
        F.max("late_s").cast("bigint").alias("max_late_s"),
    ).orderBy("event_type")


# -- q_kanonymity ------------------------------------------------------
#
# k-anonymity / l-diversity audit before sharing a customer extract:
# with quasi-identifiers (nation, market segment, account-balance
# bucket of width 2000), how many equivalence classes fall below
# k = 5 members, how many customers are re-identifiable at each risk
# tier, and the l-diversity of the sensitive attribute (order
# priority of the customer's orders) inside small classes — the
# privacy gate a data-sharing pipeline runs before any export.
# Exact integer counts; the bucket edge uses floor on an exact
# decimal/integer ratio (identical both engines). Scale shape: one
# grouped pass to the |classes| grid, one distinct-count per class
# for l-diversity, broadcast totals.

KANON_SQL = """
WITH q AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) / 2000.0) AS BIGINT)
           AS bal_bucket
  FROM customer
), sens AS (
  SELECT q.c_custkey, c_nationkey, c_mktsegment, bal_bucket,
         o_orderpriority
  FROM q JOIN orders ON o_custkey = q.c_custkey
), cls AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS class_size,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l_diversity
  FROM sens GROUP BY 1, 2, 3
), tiers AS (
  SELECT CASE WHEN class_size < 2 THEN 'unique'
              WHEN class_size < 5 THEN 'small_2_4'
              WHEN class_size < 20 THEN 'medium_5_19'
              ELSE 'large_20plus' END AS risk_tier,
         class_size, l_diversity
  FROM cls
)
SELECT risk_tier,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_customers,
       round(SUM(class_size) / CAST((SELECT SUM(class_size) FROM tiers)
                                    AS DOUBLE), 6) AS customer_share,
       CAST(MIN(l_diversity) AS BIGINT) AS min_l_diversity,
       CAST(SUM(CASE WHEN l_diversity < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_diversity_classes
FROM tiers GROUP BY 1
ORDER BY risk_tier
"""


@query("q_kanonymity", oracle=KANON_SQL)
def q_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    q = c.customer.select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal").cast("decimal(18,2)") / 2000.0)
        .cast("bigint").alias("bal_bucket"),
    )
    sens = q.join(
        c.orders.select("o_custkey", "o_orderpriority"),
        q.c_custkey == F.col("o_custkey"),
    )
    cls = sens.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.countDistinct("c_custkey").cast("bigint").alias("class_size"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("l_diversity"),
    )
    tier = (
        F.when(F.col("class_size") < 2, "unique")
        .when(F.col("class_size") < 5, "small_2_4")
        .when(F.col("class_size") < 20, "medium_5_19")
        .otherwise("large_20plus")
    )
    tiers = cls.select(
        tier.alias("risk_tier"), "class_size", "l_diversity"
    ).localCheckpoint(eager=True)  # total + tier rollup both consume
    tot = tiers.agg(F.sum("class_size").cast("double").alias("tot"))
    return (
        tiers.groupBy("risk_tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_customers"),
            F.min("l_diversity").cast("bigint").alias("min_l_diversity"),
            F.sum(F.when(F.col("l_diversity") < 2, 1).otherwise(0))
            .cast("bigint").alias("n_low_diversity_classes"),
        )
        .join(F.broadcast(tot))
        .select(
            "risk_tier", "n_classes", "n_customers",
            F.round(F.col("n_customers") / F.col("tot"), 6)
            .alias("customer_share"),
            "min_l_diversity", "n_low_diversity_classes",
        )
        .orderBy("risk_tier")
    )


# -- q_mus_sampling ----------------------------------------------------
#
# Monetary-unit sampling (dollar-unit / PPS systematic audit
# sampling): every order's selection probability is proportional to
# its VALUE, by walking the cumulative cents of the o_orderkey-ordered
# population with a fixed step of total_cents ÷ 200 — an order is
# selected iff a sampling boundary falls inside its cents interval,
# i.e. ⌊cum/step⌋ > ⌊(cum−price)/step⌋, ALL IN BIGINT CENTS, so both
# engines agree bit-for-bit with no double boundary ambiguity (the
# audit-sampling standard beside q_weighted_sample's md5 Poisson
# draws — MUS guarantees every item above one step is selected).
# Output: per order priority, population vs selected counts/value and
# the value-coverage ratio. Scale: one running-sum window over the
# population order (the documented distributed-sort shape), then a
# grid rollup.

MUS_SQL = """
WITH pop AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS cents
  FROM orders
), cum AS (
  SELECT o_orderkey, o_orderpriority, cents,
         SUM(cents) OVER (ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS c
  FROM pop
), tot AS (
  SELECT CAST(SUM(cents) AS BIGINT) // 200 AS step FROM pop
), flagged AS (
  SELECT o_orderpriority, cents,
         CASE WHEN c // t.step > (c - cents) // t.step
              THEN 1 ELSE 0 END AS sel
  FROM cum CROSS JOIN tot t WHERE t.step > 0
)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS pop_n,
       round(CAST(SUM(cents) AS BIGINT) / 100.0, 2) AS pop_value,
       CAST(SUM(sel) AS BIGINT) AS n_selected,
       round(CAST(SUM(CASE WHEN sel = 1 THEN cents ELSE 0 END) AS BIGINT)
             / 100.0, 2) AS sampled_value,
       round(CAST(SUM(CASE WHEN sel = 1 THEN cents ELSE 0 END) AS BIGINT)
             / CAST(SUM(cents) AS DOUBLE), 6) AS value_coverage
FROM flagged
GROUP BY 1
ORDER BY 1
"""


@query("q_mus_sampling", oracle=MUS_SQL)
def q_mus_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    pop = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100.0, 0).cast("bigint").alias(
            "cents"
        ),
    )
    pop = pop.cache()  # feeds the running sum AND the step total
    # The MUS selection needs a GLOBAL running sum over the whole
    # population order — fact-scale, so it runs as the two-phase
    # prefix sum (plans/prefix.py): within floor(key/65536) buckets
    # plus broadcast offsets. Bucket count = keyspace/65536 (~2300 at
    # SF100), never a fact-sized SinglePartition pass. BIGINT cents
    # make the regrouped addition exact.
    cum = two_phase_cumsum(
        pop.select("o_orderkey", "o_orderpriority", "cents"),
        ["o_orderkey"], F.col("cents"),
        F.floor(F.col("o_orderkey") / 65536).cast("bigint"), out="c",
    )
    tot = pop.agg(
        F.expr("CAST(sum(cents) AS BIGINT) div 200").alias("step")
    )
    step = F.col("step")
    flagged = (
        cum.join(F.broadcast(tot.filter(step > 0)))
        .select(
            "o_orderpriority",
            "cents",
            F.when(
                F.expr("c div step") > F.expr("(c - cents) div step"), 1
            )
            .otherwise(0)
            .alias("sel"),
        )
    )
    sel = F.col("sel")
    return (
        flagged.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("pop_n"),
            F.round(F.sum("cents").cast("bigint") / 100.0, 2).alias(
                "pop_value"
            ),
            F.sum(sel).cast("bigint").alias("n_selected"),
            F.round(
                F.sum(F.when(sel == 1, F.col("cents")).otherwise(0))
                .cast("bigint")
                / 100.0,
                2,
            ).alias("sampled_value"),
            F.round(
                F.sum(F.when(sel == 1, F.col("cents")).otherwise(0))
                .cast("bigint")
                / F.sum("cents").cast("double"),
                6,
            ).alias("value_coverage"),
        )
        .orderBy("priority")
    )


# -- q_wilson_returns --------------------------------------------------
#
# Return-rate audit per brand with Wilson score intervals: the
# binomial CI that behaves at small n and extreme rates (the
# frequentist counterpart of q_eb_binomial's empirical-Bayes
# shrinkage — Wilson needs no prior and is the standard for flagging
# "is this brand's return rate credibly above the fleet rate").
# p̂ = returned lines / lines, z = 1.96:
# center = (p̂ + z²/2n)/(1 + z²/n), half = z·√(p̂(1−p̂)/n + z²/4n²)
# /(1+z²/n); a brand is flagged when its LOWER bound clears the
# pooled rate. Exact integer counts; one identical double chain.
# Scale: one lineitem⋈part scan → |brand| grid → grid algebra.

WILSON_SQL = """
WITH b AS (
  SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1
), pool AS (
  SELECT CAST(SUM(r) AS DOUBLE) / SUM(n) AS pooled FROM b
), wil AS (
  SELECT brand, n, r, pooled,
         r / CAST(n AS DOUBLE) AS p,
         (r / CAST(n AS DOUBLE) + 1.9208 / n)
           / (1.0 + 3.8416 / n) AS center,
         1.96 * sqrt(r / CAST(n AS DOUBLE) * (1.0 - r / CAST(n AS DOUBLE))
                     / n + 0.9604 / (CAST(n AS DOUBLE) * n))
           / (1.0 + 3.8416 / n) AS half
  FROM b CROSS JOIN pool WHERE n > 0
)
SELECT brand, n AS n_lines, r AS n_returned,
       round(p, 6) AS return_rate,
       round(center - half, 6) AS wilson_lo,
       round(center + half, 6) AS wilson_hi,
       round(pooled, 6) AS pooled_rate,
       CAST(CASE WHEN center - half > pooled THEN 1 ELSE 0 END AS INT)
         AS flag_high
FROM wil
ORDER BY brand
"""


@query("q_wilson_returns", oracle=WILSON_SQL)
def q_wilson_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    b = (
        c.lineitem.join(
            F.broadcast(c.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("r"),
        )
    )
    b = b.cache()  # 25-row grid feeds pooled rate AND the interval rows
    pool = b.agg(
        (F.sum("r").cast("double") / F.sum("n")).alias("pooled")
    )
    n, r = F.col("n"), F.col("r")
    p = r / n.cast("double")
    center = (p + 1.9208 / n) / (1.0 + 3.8416 / n)
    half = (
        1.96
        * F.sqrt(p * (1.0 - p) / n + 0.9604 / (n.cast("double") * n))
        / (1.0 + 3.8416 / n)
    )
    return (
        b.filter(n > 0)
        .join(F.broadcast(pool))
        .select(
            "brand",
            n.alias("n_lines"),
            r.alias("n_returned"),
            F.round(p, 6).alias("return_rate"),
            F.round(center - half, 6).alias("wilson_lo"),
            F.round(center + half, 6).alias("wilson_hi"),
            F.round("pooled", 6).alias("pooled_rate"),
            F.when(center - half > F.col("pooled"), 1)
            .otherwise(0)
            .cast("int")
            .alias("flag_high"),
        )
        .orderBy("brand")
    )


# -- q_duplicate_payments ----------------------------------------------
#
# Double-payment audit: pairs of orders from the SAME customer with
# the IDENTICAL total amount within a 7-day window — the classic AP
# duplicate-invoice screen (dedup_exact's forensic sibling on the
# transaction table). The pair join is bucketed on the natural
# (customer, exact DECIMAL(18,2) amount) key — cost Σ bucket², never
# |orders|² — with o_orderkey ordering deduplicating each pair once.
# Output: the 20 largest flagged pairs (amount DESC, key ties) plus
# the global flagged-pair count on every row. Scale: one shuffle on
# the composite key; date window applied inside buckets.

DUP_PAY_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS amt,
         CAST(o_orderdate AS DATE) AS day
  FROM orders
), pairs AS MATERIALIZED (
  SELECT a.o_custkey AS custkey,
         CAST(a.amt AS DOUBLE) AS amount,
         strftime(a.day, '%Y-%m-%d') AS day_a,
         strftime(b.day, '%Y-%m-%d') AS day_b,
         a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey AND a.amt = b.amt
   AND a.o_orderkey < b.o_orderkey
   AND abs(date_diff('day', a.day, b.day)) <= 7
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_flagged FROM pairs)
SELECT p.custkey, p.amount, p.day_a, p.day_b,
       p.orderkey_a, p.orderkey_b, t.n_flagged
FROM pairs p CROSS JOIN tot t
ORDER BY p.amount DESC, p.orderkey_a, p.orderkey_b
LIMIT 20
"""


@query("q_duplicate_payments", oracle=DUP_PAY_SQL)
def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("amt"),
        F.col("o_orderdate").cast("date").alias("day"),
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("amt"),
        F.col("day").alias("da"),
        F.col("o_orderkey").alias("orderkey_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck_b"),
        F.col("amt").alias("amt_b"),
        F.col("day").alias("db"),
        F.col("o_orderkey").alias("orderkey_b"),
    )
    pairs = a.join(
        b,
        (F.col("custkey") == F.col("ck_b"))
        & (F.col("amt") == F.col("amt_b"))
        & (F.col("orderkey_a") < F.col("orderkey_b"))
        & (F.abs(F.datediff(F.col("db"), F.col("da"))) <= 7),
    ).select(
        "custkey",
        F.col("amt").cast("double").alias("amount"),
        F.date_format("da", "yyyy-MM-dd").alias("day_a"),
        F.date_format("db", "yyyy-MM-dd").alias("day_b"),
        "orderkey_a",
        "orderkey_b",
    )
    pairs = pairs.cache()  # flagged set feeds the count AND the top-20
    tot = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_flagged"))
    return (
        pairs.join(F.broadcast(tot))
        .orderBy(F.desc("amount"), "orderkey_a", "orderkey_b")
        .limit(20)
    )


# -- q_benford_entity --------------------------------------------------
#
# Per-supplier Benford conformity screen: which suppliers' line
# amounts deviate most from the first-digit law (q_benford is the
# global test; forensic practice ranks ENTITIES by deviation to find
# fabricated pricing). For suppliers with ≥ 200 lines, the chi²
# statistic Σ(obs − n·p_d)²/(n·p_d) over digits 1–9 folds as
# 6-rounded decimal terms on the ≤|suppliers|×9 grid; top 10 by
# (chi² DESC, suppkey). Scale: one lineitem scan → digit grid →
# grid algebra.

_BENFORD_P = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}
_BENFORD_ENTITY_CASE = "CAST(CASE digit " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items()
) + " END AS DOUBLE)"

BENFORD_ENTITY_SQL = f"""
WITH d AS (
  SELECT l_suppkey AS suppkey,
         CAST(substr(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM lineitem
), g AS (
  SELECT suppkey, digit, CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY 1, 2
), tot AS (
  SELECT suppkey, CAST(SUM(n) AS BIGINT) AS nt FROM g GROUP BY 1
  HAVING SUM(n) >= 200
), chi AS (
  SELECT g.suppkey, t.nt,
         CAST(SUM(CAST(round(
             (g.n - t.nt * {_BENFORD_ENTITY_CASE})
             * (g.n - t.nt * {_BENFORD_ENTITY_CASE})
             / (t.nt * {_BENFORD_ENTITY_CASE}), 6)
           AS DECIMAL(28,6))) AS DOUBLE) AS chi2
  FROM g JOIN tot t ON g.suppkey = t.suppkey
  GROUP BY 1, 2
)
SELECT suppkey, nt AS n_lines, round(chi2, 6) AS chi2,
       CAST(CASE WHEN chi2 > 20.09 THEN 1 ELSE 0 END AS INT)
         AS reject_benford,
       CAST(ROW_NUMBER() OVER (ORDER BY round(chi2, 6) DESC, suppkey)
            AS BIGINT) AS rank
FROM chi
ORDER BY rank LIMIT 10
"""


@query("q_benford_entity", oracle=BENFORD_ENTITY_SQL)
def q_benford_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    d = li.select(
        F.col("l_suppkey").alias("suppkey"),
        F.substring(
            F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit"),
    )
    g = d.groupBy("suppkey", "digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    g = g.cache()  # digit grid feeds totals AND the chi2 fold
    tot = g.groupBy("suppkey").agg(
        F.sum("n").cast("bigint").alias("nt")
    ).filter(F.col("nt") >= 200)
    p = F.expr(_BENFORD_ENTITY_CASE)
    nt, n = F.col("nt"), F.col("n")
    term = F.round((n - nt * p) * (n - nt * p) / (nt * p), 6)
    chi = (
        g.join(tot, "suppkey")
        .groupBy("suppkey", "nt")
        .agg(
            F.sum(term.cast("decimal(28,6)")).cast("double").alias("chi2")
        )
    )
    return (
        chi.select(
            "suppkey",
            nt.alias("n_lines"),
            F.round("chi2", 6).alias("chi2"),
            F.when(F.col("chi2") > 20.09, 1)
            .otherwise(0)
            .cast("int")
            .alias("reject_benford"),
            F.row_number()
            .over(Window.orderBy(F.round(F.col("chi2"), 6).desc(), "suppkey"))
            .cast("bigint")
            .alias("rank"),
        )
        .orderBy("rank")
        .limit(10)
    )
