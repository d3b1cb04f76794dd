"""SURVEY §2.A additions — sequence analytics and record linkage
(oracle-verified)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- q_event_transitions -----------------------------------------------
#
# First-order Markov transition matrix over each user's event
# sequence: P(next event type | current) — the sequence-mining
# primitive behind funnel discovery and next-action models. Scale
# shape: ONE shuffle by user_id for the lead() window (output rows =
# |events|), then the (cur, nxt) groupBy collapses to the tiny
# |types|² grid; the probability window runs over that grid only.

TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), counts AS (
  SELECT cur, nxt, COUNT(*) AS n FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT cur, nxt, n,
       round(n / CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
FROM counts
"""


@query("q_event_transitions", oracle=TRANSITIONS_SQL)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    counts = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wc = Window.partitionBy("cur")
    return counts.select(
        "cur", "nxt", "n",
        F.round(F.col("n") / F.sum("n").over(wc).cast("double"), 6).alias("p"),
    )


# -- q_fuzzy_match -----------------------------------------------------
#
# Blocked fuzzy record linkage: find near-duplicate part names
# (levenshtein ≤ 2, not identical) WITHOUT an all-pairs scan — the
# entity-resolution shape (block → compare within block) that keeps
# linkage linear-ish at scale. The blocking key is the name's SECOND
# token (of the 5-token TPC-H p_name; split_part(...,2) / getItem(1)
# on both sides): only same-block names are compared, so the candidate
# join is an equi-join; the quadratic comparison happens per block,
# where real deployments bound block size. Pair symmetry is broken
# by name order (a < b) at the join predicate — no distinct() pass.

FUZZY_SQL = """
WITH names AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS blk, COUNT(*) AS n_parts
  FROM part GROUP BY 1, 2
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       a.n_parts AS n_a, b.n_parts AS n_b
FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@query("q_fuzzy_match", oracle=FUZZY_SQL)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    names = p.groupBy(
        F.col("p_name"), F.split("p_name", " ").getItem(1).alias("blk")
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("blk"), F.col("n_parts").alias("n_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("blk"), F.col("n_parts").alias("n_b")
    )
    return (
        a.join(b, ["blk"])
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 2)
        .select(
            "name_a", "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
            "n_a", "n_b",
        )
    )


# -- q_attribution -----------------------------------------------------
#
# First/last-touch attribution per user: which event type opened the
# journey and which closed it, plus purchase count — the min_by /
# max_by (arg_min/arg_max) aggregate shape, ONE partial-aggregated
# scan with no window sort at all (contrast q_scd2's window: argmin
# aggregates carry (key, value) partial state and merge, so the
# shuffle moves |users| rows, pre-combined map-side). The comparison
# key is a zero-padded (epoch_us, event_id) string so ordering is
# total and engine-identical.

ATTRIBUTION_SQL = """
SELECT user_id,
       arg_min(event_type, printf('%020d%020d', epoch_us(ts), event_id))
         AS first_touch,
       arg_max(event_type, printf('%020d%020d', epoch_us(ts), event_id))
         AS last_touch,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


@query("q_attribution", oracle=ATTRIBUTION_SQL)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    key = F.format_string("%020d%020d", F.unix_micros("ts"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_touch"),
        F.max_by("event_type", key).alias("last_touch"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.count(F.lit(1)).alias("n_events"),
    )


# -- q_audience_overlap ------------------------------------------------
#
# Segment-overlap matrix: for every event-type pair, how many
# distinct users did BOTH — the audience-intersection primitive
# behind campaign planning and cohort design. Scale shape: the fact
# stream collapses to distinct (user, type) FIRST (one shuffle, the
# only fact-proportional one); the self-join then runs on |users|×
# |types| rows keyed by user, and the pair groupBy output is the
# tiny |types|² grid. At sketch scale the same matrix comes from
# theta-sketch intersections; this is the exact form.

AUDIENCE_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_users
FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


@query("q_audience_overlap", oracle=AUDIENCE_SQL)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ut = e.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query("q_audience_overlap_approx")  # sketch-bound: HLL estimates, pytest error-bound
def q_audience_overlap_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate audience-overlap matrix — the 100 TB path for
    q_audience_overlap. One HLL sketch per event type (single scan,
    |types| rows out), then pairwise |A∩B| ≈ |A| + |B| − |A∪B| via
    sketch-union inclusion-exclusion on the (tiny) type×type cross of
    sketches. The exact version shuffles the distinct (user, type)
    table through a self-join — fact-scale work; this never touches
    the fact table again after the one sketch scan. Error bound vs
    exact is pytest-verified (tests/test_properties.py)."""
    e = Catalog(spark, sf_dir).events
    sk = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.approx_count_distinct("user_id", 0.01).alias("n_approx"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_approx").alias("n_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_approx").alias("n_b"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.greatest(
                F.col("n_a") + F.col("n_b")
                - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")),
                F.lit(0),
            ).cast("long").alias("n_users_approx"),
        )
    )


# -- q_salted_join -----------------------------------------------------
#
# Deterministic salted join as an inventory entry: events (big,
# power-law user activity) enriched with a per-user dimension, the
# shuffle key widened to (user_id, salt) so one hot user's rows
# spread over 8 even partitions instead of one hot reducer
# (operators/skew.py; SURVEY §6). Salting must be result-invariant —
# the oracle is the PLAIN join, which is exactly the property that
# makes the rewrite safe to apply at scale.

SALTED_SQL = """
WITH dim AS (
  SELECT user_id, epoch_us(MIN(ts)) AS first_seen_us, COUNT(*) AS n_total
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.event_type, dim.first_seen_us, dim.n_total
FROM events e JOIN dim USING (user_id)
"""


@query("q_salted_join", oracle=SALTED_SQL)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redmap_spark.operators.skew import salted_join

    e = Catalog(spark, sf_dir).events
    dim = e.groupBy("user_id").agg(
        F.unix_micros(F.min("ts")).alias("first_seen_us"),
        F.count(F.lit(1)).alias("n_total"),
    )
    big = e.select("event_id", "user_id", "event_type")
    return salted_join(big, dim, on="user_id", n_salts=8, big_stable_col="event_id")


# -- q_streaks ---------------------------------------------------------
#
# Gaps-and-islands: longest consecutive-day activity streak per user
# — the retention/engagement shape (login streaks, SLA continuity).
# Classic trick: within a user, day - row_number(day-order) is
# constant exactly on a consecutive run, so runs fall out of one
# groupBy on that anchor. Scale shape: distinct (user, day) collapses
# the event stream first; both windows partition by user_id — no
# global sort; the island groupBy reuses the user_id shuffle.

STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), isl AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) * INTERVAL 1 DAY AS anchor
  FROM days
), runs AS (
  SELECT user_id, anchor, COUNT(*) AS len FROM isl GROUP BY 1, 2
)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY user_id
"""


@query("q_streaks", oracle=STREAKS_SQL)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    days = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id", F.date_sub("day", F.row_number().over(w)).alias("anchor")
    )
    runs = isl.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


# -- q_event_paths -----------------------------------------------------
#
# Top event trigrams (3-step paths) across all user sequences — the
# sequence-mining summary behind funnel discovery (q_event_transitions
# is its first-order cousin). Scale shape: two leads share ONE
# user_id window sort; the path groupBy collapses to the ≤|types|³
# grid, and the global top-10 is a mergeable TakeOrdered, not a sort.

PATHS_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS a,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c
  FROM events
)
SELECT a || '>' || b || '>' || c AS path, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 10
"""


@query("q_event_paths", oracle=PATHS_SQL)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    return (
        seq.select(F.concat_ws(">", "a", "b", "c").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


# -- q_entity_survivorship ---------------------------------------------
#
# Golden-record survivorship on top of the blocked fuzzy linkage
# (q_fuzzy_match): for every near-duplicate name pair (levenshtein
# ≤ 2 within the blocking key), emit the merged record an MDM system
# keeps — survivor = the name backed by more parts (tie: lexical
# min), attributes merged as min price / max size / total count
# across both sides. Same scale shape as the linkage itself (blocked
# equi-join, per-name attrs pre-aggregated before the join); the
# merge adds zero extra shuffles.

SURVIVOR_SQL = """
WITH names AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS blk, COUNT(*) AS n_parts,
         MIN(p_retailprice) AS min_price, MAX(p_size) AS max_size
  FROM part GROUP BY 1, 2
)
SELECT CASE WHEN a.n_parts > b.n_parts
              OR (a.n_parts = b.n_parts AND a.p_name < b.p_name)
            THEN a.p_name ELSE b.p_name END AS survivor,
       CASE WHEN a.n_parts > b.n_parts
              OR (a.n_parts = b.n_parts AND a.p_name < b.p_name)
            THEN b.p_name ELSE a.p_name END AS merged_from,
       CAST(a.n_parts + b.n_parts AS BIGINT) AS n_parts_total,
       LEAST(a.min_price, b.min_price) AS min_price,
       CAST(GREATEST(a.max_size, b.max_size) AS BIGINT) AS max_size
FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@query("q_entity_survivorship", oracle=SURVIVOR_SQL)
def q_entity_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    names = p.groupBy(
        F.col("p_name"), F.split("p_name", " ").getItem(1).alias("blk")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_size").alias("max_size"),
    )
    a, b = names.alias("a"), names.alias("b")
    pair = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2)
    a_wins = (F.col("a.n_parts") > F.col("b.n_parts")) | (
        (F.col("a.n_parts") == F.col("b.n_parts"))
        & (F.col("a.p_name") < F.col("b.p_name"))
    )
    return pair.select(
        F.when(a_wins, F.col("a.p_name")).otherwise(F.col("b.p_name")).alias("survivor"),
        F.when(a_wins, F.col("b.p_name")).otherwise(F.col("a.p_name")).alias("merged_from"),
        (F.col("a.n_parts") + F.col("b.n_parts")).cast("bigint").alias("n_parts_total"),
        F.least(F.col("a.min_price"), F.col("b.min_price")).alias("min_price"),
        F.greatest(F.col("a.max_size"), F.col("b.max_size")).cast("bigint").alias("max_size"),
    )


# -- q_markov_stationary -----------------------------------------------
#
# Stationary distribution of the user-journey Markov chain: the
# q_event_transitions matrix row-normalized to P (entries rounded to
# DECIMAL(14,12) so both engines iterate identical values), then
# three power-iteration steps π_{k+1} = π_k·P from the uniform start —
# the "where does the journey settle" summary behind next-action
# models and PageRank itself. Every iteration sums EXACT decimal
# products (14,12)×(14,12) over the |types|² grid (order-independent)
# and re-rounds through one double round(...,12), so engines never
# drift. Scale shape: one user-partitioned lead() window over the
# fact stream; every iteration afterwards touches the |types|-sized
# grid only. Output: the 25-cell transition matrix with each source
# row's 3-step stationary mass.

MARKOV_SQL = """
WITH pairs AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events
), counts AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2
), p AS (
  SELECT cur, nxt, n,
         CAST(round(n / CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE), 12)
              AS DECIMAL(14,12)) AS pr
  FROM counts
), types AS (
  SELECT DISTINCT cur AS t FROM counts
), pi0 AS (
  SELECT t,
         CAST(round(1.0 / (SELECT COUNT(*) FROM types), 12)
              AS DECIMAL(14,12)) AS v
  FROM types
), pi1 AS (
  SELECT p.nxt AS t,
         CAST(round(CAST(SUM(pi0.v * p.pr) AS DOUBLE), 12)
              AS DECIMAL(14,12)) AS v
  FROM p JOIN pi0 ON pi0.t = p.cur GROUP BY 1
), pi2 AS (
  SELECT p.nxt AS t,
         CAST(round(CAST(SUM(pi1.v * p.pr) AS DOUBLE), 12)
              AS DECIMAL(14,12)) AS v
  FROM p JOIN pi1 ON pi1.t = p.cur GROUP BY 1
), pi3 AS (
  SELECT p.nxt AS t,
         CAST(round(CAST(SUM(pi2.v * p.pr) AS DOUBLE), 12)
              AS DECIMAL(14,12)) AS v
  FROM p JOIN pi2 ON pi2.t = p.cur GROUP BY 1
)
SELECT p.cur AS from_type, p.nxt AS to_type, p.n AS n_trans,
       round(CAST(p.pr AS DOUBLE), 6) AS p,
       round(CAST(pi3.v AS DOUBLE), 6) AS stationary_from
FROM p JOIN pi3 ON pi3.t = p.cur
ORDER BY from_type, to_type
"""


@query("q_markov_stationary", oracle=MARKOV_SQL)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = pairs.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wc = Window.partitionBy("cur")
    p = counts.select(
        "cur", "nxt", "n",
        F.round(F.col("n") / F.sum("n").over(wc).cast("double"), 12)
        .cast("decimal(14,12)").alias("pr"),
    ).localCheckpoint(eager=True)  # three consumers of the tiny grid
    types = p.select(F.col("cur").alias("t")).distinct()
    n_types = types.agg(F.count(F.lit(1)).alias("k"))
    pi = types.join(F.broadcast(n_types)).select(
        "t",
        F.round(F.lit(1.0) / F.col("k"), 12).cast("decimal(14,12)").alias("v"),
    )
    for _ in range(3):
        pi = (
            p.join(pi, p.cur == pi.t)
            .groupBy(F.col("nxt").alias("nt"))
            .agg(
                F.round(F.sum(F.col("v") * F.col("pr")).cast("double"), 12)
                .cast("decimal(14,12)").alias("nv")
            )
            .select(F.col("nt").alias("t"), F.col("nv").alias("v"))
        )
    return (
        p.join(pi, p.cur == pi.t)
        .select(
            F.col("cur").alias("from_type"),
            F.col("nxt").alias("to_type"),
            F.col("n").alias("n_trans"),
            F.round(F.col("pr").cast("double"), 6).alias("p"),
            F.round(F.col("v").cast("double"), 6).alias("stationary_from"),
        )
        .orderBy("from_type", "to_type")
    )


# -- q_markov_entropy --------------------------------------------------
#
# Entropy rate of the user-journey Markov chain: H = −Σᵢ πᵢ Σⱼ
# pᵢⱼ ln pᵢⱼ (bits per step, via ln/ln2) — how PREDICTABLE the next
# action is given the current one; the single number that says
# whether a next-action model can beat the base rate, and the
# information-theoretic companion of q_markov_stationary (same
# DECIMAL(14,12)-rounded matrix, same 3-step π). Per-row entropy
# terms round to DECIMAL(18,9) before exact sums; ln on identical
# rounded doubles. Output: per-state conditional entropy + π, with
# the chain-level rate on every row (broadcast 1-row aggregate).

MARKOV_ENTROPY_SQL = """
WITH pairs AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events
), counts AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2
), p AS (
  SELECT cur, nxt,
         CAST(round(n / CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE), 12)
              AS DECIMAL(14,12)) AS pr
  FROM counts
), types AS (SELECT DISTINCT cur AS t FROM counts),
pi0 AS (
  SELECT t, CAST(round(1.0 / (SELECT COUNT(*) FROM types), 12)
                 AS DECIMAL(14,12)) AS v FROM types
), pi1 AS (
  SELECT p.nxt AS t, CAST(round(CAST(SUM(pi0.v * p.pr) AS DOUBLE), 12)
                          AS DECIMAL(14,12)) AS v
  FROM p JOIN pi0 ON pi0.t = p.cur GROUP BY 1
), pi2 AS (
  SELECT p.nxt AS t, CAST(round(CAST(SUM(pi1.v * p.pr) AS DOUBLE), 12)
                          AS DECIMAL(14,12)) AS v
  FROM p JOIN pi1 ON pi1.t = p.cur GROUP BY 1
), pi3 AS (
  SELECT p.nxt AS t, CAST(round(CAST(SUM(pi2.v * p.pr) AS DOUBLE), 12)
                          AS DECIMAL(14,12)) AS v
  FROM p JOIN pi2 ON pi2.t = p.cur GROUP BY 1
), hrow AS (
  SELECT cur,
         CAST(SUM(CASE WHEN CAST(pr AS DOUBLE) > 0 THEN
           CAST(round(-CAST(pr AS DOUBLE) * ln(CAST(pr AS DOUBLE))
                      / ln(2.0), 9) AS DECIMAL(18,9)) END)
           AS DECIMAL(28,9)) AS h_cond
  FROM p GROUP BY 1
), rate AS (
  SELECT CAST(SUM(CAST(round(CAST(pi3.v AS DOUBLE)
                             * CAST(h_cond AS DOUBLE), 9)
                       AS DECIMAL(18,9))) AS DECIMAL(28,9)) AS h_rate
  FROM hrow JOIN pi3 ON pi3.t = hrow.cur
)
SELECT hrow.cur AS state,
       round(CAST(pi3.v AS DOUBLE), 6) AS stationary_p,
       round(CAST(h_cond AS DOUBLE), 6) AS conditional_entropy_bits,
       round(CAST(h_rate AS DOUBLE), 6) AS chain_entropy_rate_bits
FROM hrow JOIN pi3 ON pi3.t = hrow.cur
CROSS JOIN rate
ORDER BY state
"""


@query("q_markov_entropy", oracle=MARKOV_ENTROPY_SQL)
def q_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = pairs.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wc = Window.partitionBy("cur")
    p = counts.select(
        "cur", "nxt",
        F.round(F.col("n") / F.sum("n").over(wc).cast("double"), 12)
        .cast("decimal(14,12)").alias("pr"),
    ).localCheckpoint(eager=True)
    types = p.select(F.col("cur").alias("t")).distinct()
    n_types = types.agg(F.count(F.lit(1)).alias("k"))
    pi = types.join(F.broadcast(n_types)).select(
        "t",
        F.round(F.lit(1.0) / F.col("k"), 12).cast("decimal(14,12)").alias("v"),
    )
    for _ in range(3):
        pi = (
            p.join(pi, p.cur == pi.t)
            .groupBy(F.col("nxt").alias("nt"))
            .agg(
                F.round(F.sum(F.col("v") * F.col("pr")).cast("double"), 12)
                .cast("decimal(14,12)").alias("nv")
            )
            .select(F.col("nt").alias("t"), F.col("nv").alias("v"))
        )
    prd = F.col("pr").cast("double")
    hrow = p.groupBy("cur").agg(
        F.sum(
            F.when(
                prd > 0,
                F.round(-prd * F.log(prd) / F.log(F.lit(2.0)), 9)
                .cast("decimal(18,9)"),
            )
        ).cast("decimal(28,9)").alias("h_cond")
    )
    j = hrow.join(pi, hrow.cur == pi.t)
    rate = j.agg(
        F.sum(
            F.round(
                F.col("v").cast("double") * F.col("h_cond").cast("double"), 9
            ).cast("decimal(18,9)")
        ).cast("decimal(28,9)").alias("h_rate")
    )
    return (
        j.join(F.broadcast(rate))
        .select(
            F.col("cur").alias("state"),
            F.round(F.col("v").cast("double"), 6).alias("stationary_p"),
            F.round(F.col("h_cond").cast("double"), 6)
            .alias("conditional_entropy_bits"),
            F.round(F.col("h_rate").cast("double"), 6)
            .alias("chain_entropy_rate_bits"),
        )
        .orderBy("state")
    )
