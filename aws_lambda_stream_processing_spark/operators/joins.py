"""Join operators (SURVEY.md §2.C).

The reference architecture's "join" is a per-record DynamoDB/S3 lookup inside
the Lambda handler (reconstructed semantics, /root/reference/README.md:3-4).
Here joins are declared relationally and Catalyst picks the physical
strategy; the scale intent per query is noted in its docstring:

- fact × tiny dim  → broadcast-hash (no shuffle of the fact side),
- fact × fact      → sort-merge on the join key (AQE handles skew),
- θ / interval     → broadcast-nested-loop only when one side is small,
  otherwise banded equi-prejoin (see q_join_interval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.parity import dsum
from aws_lambda_stream_processing_spark.registry import query, track_cache
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    category="2.C",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join. At 100 TB both sides shuffle on the key into a
    sort-merge join; at test scale AQE converts to broadcast-hash."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    category="2.C",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × tiny dims with explicit broadcast() hints: zero shuffle of the
    customer side regardless of its size — the pattern for every dim join at
    100 TB."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    category="2.C",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — unmatched customers surface with NULL order cols."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    category="2.C",
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (planner canonicalizes to left-outer with sides
    swapped)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_name"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey, c.c_name
    FROM supplier s
    FULL JOIN (SELECT * FROM customer WHERE c_custkey >= 5) c
      ON s.s_suppkey = c.c_custkey
    """,
    category="2.C",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with misses on both sides (customer filtered so some
    suppliers are unmatched). Full-outer requires shuffle (sort-merge) — no
    broadcast variant exists."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") >= 5)
    return s.join(c, s.s_suppkey == c.c_custkey, "full").select(
        "s_suppkey", "s_name", "c_custkey", "c_name"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    category="2.C",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS): only left columns out, no row duplication — the
    planner can broadcast the deduped key set of the right side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    category="2.C",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti (NOT EXISTS): customers that never ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    category="2.C",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny dims (5 × 25). Guarded use only —
    a cross join of facts is never the plan at scale."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_theta",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey, s.s_acctbal, c.c_acctbal
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    """,
    category="2.C",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed equi+θ join: Catalyst hashes on the equi part (s_nationkey =
    c_nationkey) and applies the inequality as a post-join residual — so this
    stays a hash/sort-merge join, NOT a nested loop, and scales."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
    ).select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")


@query(
    "q_join_interval",
    oracle="""
    SELECT p.event_id AS purchase_id,
           e.event_id AS error_id,
           p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts
     AND e.ts < p.ts + INTERVAL 1 HOUR
    """,
    category="2.C",
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: errors within 1 h after each purchase, per user.

    The equi key (user_id) bounds the hash join; the time range is a
    residual. At 100 TB with high-cardinality time ranges and no equi key,
    the scale path is banding: join on (user_id, hour_bucket) for the 2
    candidate buckets, then apply the exact range — same results, bounded
    fan-out.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    err = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    joined = p.join(
        err,
        (p.user_id == err.e_user)
        & (err.e_ts >= p.p_ts)
        & (err.e_ts < p.p_ts + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select("purchase_id", "error_id", "user_id")


@query(
    "q_join_interval_binned",
    oracle="""
    SELECT p.event_id AS purchase_id,
           e.event_id AS error_id,
           p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts
     AND e.ts < p.ts + INTERVAL 1 HOUR
    """,
    category="2.C",
)
def q_join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same interval join as q_join_interval, implemented the way it
    must run at 100 TB: BANDED. The range predicate becomes an equi key —
    time is bucketed at the interval width (1 h), each probe row is
    replicated to the 2 buckets its interval can touch, and the join runs
    as a plain shuffle equi-join on (user_id, bucket) followed by the exact
    range filter. Fan-out is bounded at 2× regardless of data volume, every
    matching pair meets in exactly one bucket (the error's), and the
    physical plan is a hash/sort-merge join — never the nested-loop a big
    residual range forces. Identical results to q_join_interval (same
    oracle); a plan gate asserts no nested-loop join appears."""
    e = load_table(spark, sf_dir, "events")
    hour = F.floor(F.unix_timestamp("ts") / 3600)
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.explode(F.array(hour, hour + 1)).alias("bin"),
    )
    err = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        hour.alias("e_bin"),
    )
    joined = p.join(
        err,
        (p.user_id == err.e_user)
        & (p.bin == err.e_bin)
        & (err.e_ts >= p.p_ts)
        & (err.e_ts < p.p_ts + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select("purchase_id", "error_id", "user_id")


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           (SELECT max(c.event_id) FROM events c
            WHERE c.event_type = 'click'
              AND c.user_id = p.user_id
              AND c.ts <= p.ts) AS last_click_id
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    category="2.C",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no Spark native operator — SURVEY §4): for each purchase,
    the latest click by the same user at-or-before its timestamp.

    Implementation: union both sides tagged, one window pass per user ordered
    by (ts, side, event_id) carrying `last(click_id, ignorenulls)` — a single
    shuffle on user_id, O(n log n) per partition, no self-join blow-up. This
    is the standard scalable as-of pattern (equivalent to DuckDB ASOF JOIN;
    tie at equal ts resolves to the click because clicks sort before
    purchases at the same instant, matching `<=` semantics). `events.ts` is
    non-decreasing in event_id (FIXTURES.md §2), so max(event_id) is the
    as-of winner — the oracle exploits that for a deterministic tiebreak.
    """
    e = load_table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
        # clicks (0) sort before purchases (1) at identical ts → `<=` match
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.withColumn(
        "last_click_id", F.last("click_id", ignorenulls=True).over(w)
    )
    return enriched.where(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"), "user_id", "last_click_id"
    )


@query(
    "q_join_asof_forward",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           (SELECT min(c.event_id) FROM events c
            WHERE c.event_type = 'click'
              AND c.user_id = p.user_id
              AND c.ts >= p.ts) AS next_click_id
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    category="2.C",
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the EARLIEST click by the same
    user at-or-after its timestamp (the follow-up-attribution direction;
    q_join_asof is the backward twin). Same single-shuffle union+window
    pattern, mirrored: first(click_id IGNORE NULLS) over the frame from
    current row to the partition end, with purchases (0) sorting before
    clicks (1) at identical ts so `>=` ties match. events.ts is
    non-decreasing in event_id, so min(event_id) is the forward winner —
    the oracle's deterministic tiebreak."""
    e = load_table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
        # purchases (0) sort before clicks (1) at identical ts → `>=` match
        F.when(F.col("event_type") == "click", F.lit(1)).otherwise(0).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    enriched = tagged.withColumn(
        "next_click_id", F.first("click_id", ignorenulls=True).over(w)
    )
    return enriched.where(F.col("side") == 0).select(
        F.col("event_id").alias("purchase_id"), "user_id", "next_click_id"
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    category="2.C",
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-table join, dims broadcast, facts sort-merge on
    their FK chain, selective date filter pushed to the orders scan before
    the big join — the canonical star-schema plan at any scale."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"), F.count("*").alias("n_lines"))
    )


@query(
    "q_join_self",
    oracle="""
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, n1.n_regionkey AS regionkey
    FROM nation n1
    JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
    category="2.C",
)
def q_join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with aliasing: same-region nation pairs, deduped by key
    ordering (the canonical pair-generation pattern reused by the LLM dedup
    operators)."""
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(
        F.col("n1.n_name").alias("nation_a"),
        F.col("n2.n_name").alias("nation_b"),
        F.col("n1.n_regionkey").alias("regionkey"),
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN NULL
                  ELSE o_orderstatus END AS status_key
      FROM orders
    ),
    d AS (
      SELECT * FROM (VALUES ('O', 'open'), ('F', 'finished'),
                            (NULL, 'pending-unknown')) AS t(status_key, label)
    )
    SELECT o.o_orderkey, o.status_key, d.label
    FROM o JOIN d ON o.status_key IS NOT DISTINCT FROM d.status_key
    """,
    category="2.C",
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match NULL dimension rows instead of silently dropping — the dirty-data
    enrichment pattern (unknown category still gets a label). Spark plans
    `<=>` as a hash join (null-safe keys hash like values), so this stays
    broadcast/SMJ at scale rather than degenerating to a nested loop the
    way `a = b OR (a IS NULL AND b IS NULL)` would."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_key"),
    )
    d = spark.createDataFrame(
        [("O", "open"), ("F", "finished"), (None, "pending-unknown")],
        "status_key string, label string",
    )
    return o.join(
        F.broadcast(d), o.status_key.eqNullSafe(d.status_key)
    ).select("o_orderkey", o.status_key.alias("status_key"), "label")


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts,
             (SELECT max(c.event_id) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p0.user_id
                AND c.ts <= p0.ts) AS prev_id,
             (SELECT max(c.ts) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p0.user_id
                AND c.ts <= p0.ts) AS prev_ts,
             (SELECT min(c.event_id) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p0.user_id
                AND c.ts >= p0.ts) AS next_id,
             (SELECT min(c.ts) FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p0.user_id
                AND c.ts >= p0.ts) AS next_ts
      FROM events p0 WHERE event_type = 'purchase'
    )
    SELECT purchase_id, user_id,
           CASE WHEN prev_id IS NULL THEN next_id
                WHEN next_id IS NULL THEN prev_id
                WHEN epoch_us(next_ts) - epoch_us(ts)
                     < epoch_us(ts) - epoch_us(prev_ts) THEN next_id
                ELSE prev_id END AS nearest_click_id,
           CASE WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
                WHEN prev_id IS NULL THEN epoch_us(next_ts) - epoch_us(ts)
                WHEN next_id IS NULL THEN epoch_us(ts) - epoch_us(prev_ts)
                WHEN epoch_us(next_ts) - epoch_us(ts)
                     < epoch_us(ts) - epoch_us(prev_ts)
                THEN epoch_us(next_ts) - epoch_us(ts)
                ELSE epoch_us(ts) - epoch_us(prev_ts) END AS gap_us
    FROM p
    """,
    category="2.C",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join — the third direction (q_join_asof = backward,
    q_join_asof_forward = forward): each purchase matches the click with
    the smallest |Δt| in EITHER direction, ties to the backward match —
    the feature-store alignment rule when sensors can lag or lead. One
    union + ONE shuffle on user_id feeding two window passes (same
    partitioning, two sort orders: clicks sort before purchases at equal
    ts for the ≤ side, after for the ≥ side, so same-instant ties match
    both directions at gap 0 and resolve backward). Gaps are exact
    integer µs; at 100 TB this is the same single-exchange pattern as
    the other as-of directions — no range join, no explosion."""
    e = load_table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "click_id"
        ),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        # ≤ side: clicks (0) before purchases (1) at equal ts
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(1).alias(
            "side_b"
        ),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side_b", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ≥ side: purchases (side_b=1) sort before clicks via descending side_b
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("side_b"), F.asc("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    enriched = tagged.select(
        "*",
        F.last("click_id", ignorenulls=True).over(wb).alias("prev_id"),
        F.last("click_ts", ignorenulls=True).over(wb).alias("prev_ts"),
        F.first("click_id", ignorenulls=True).over(wf).alias("next_id"),
        F.first("click_ts", ignorenulls=True).over(wf).alias("next_ts"),
    ).where(F.col("side_b") == 1)
    gap_prev = F.unix_micros("ts") - F.unix_micros("prev_ts")
    gap_next = F.unix_micros("next_ts") - F.unix_micros("ts")
    forward_wins = F.col("next_id").isNotNull() & (
        F.col("prev_id").isNull() | (gap_next < gap_prev)
    )
    return enriched.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(forward_wins, F.col("next_id"))
        .otherwise(F.col("prev_id"))
        .alias("nearest_click_id"),
        F.when(
            F.col("prev_id").isNull() & F.col("next_id").isNull(),
            F.lit(None).cast("long"),
        )
        .when(forward_wins, gap_next)
        .otherwise(gap_prev)
        .alias("gap_us"),
    )


@query(
    "q_join_temporal_dim",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM flagged
    ),
    dim AS (
      SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             MIN(ts) AS valid_from
      FROM runs GROUP BY user_id, version, event_type
    ),
    hits AS (
      SELECT e.event_id, e.user_id, e.ts,
             MAX(d.version) AS dim_version
      FROM events e
      JOIN dim d ON d.user_id = e.user_id AND d.valid_from <= e.ts
      WHERE e.event_type = 'purchase'
      GROUP BY e.event_id, e.user_id, e.ts
    )
    SELECT h.event_id, h.user_id, h.ts, h.dim_version,
           d.event_type AS dim_state
    FROM hits h
    JOIN dim d ON d.user_id = h.user_id AND d.version = h.dim_version
    ORDER BY h.event_id
    """,
    category="2.C",
)
def q_join_temporal_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension join — the warehouse staple:
    each purchase event joins the SCD2 version of its user that was
    VALID AT the event's timestamp (valid_from <= ts < next
    valid_from). Executed as the AS-OF argmax formulation — equi-join
    on user_id with the half-open lower bound, then max(version) per
    event — so the matcher is a hash join + hash agg, never an
    interval nested-loop; fan-out is bounded by versions-per-user.
    The dimension here derives from the same stream (q_scd2_intervals'
    pipeline), making the oracle self-contained. At 100 TB both sides
    partition by user_id — one co-located shuffle."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
    ).cast("int")
    runs = e.select(
        "user_id", "ts", "event_type",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("version"),
    )
    dim = runs.groupBy(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "event_type",
    ).agg(F.min("ts").alias("valid_from"))
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    hits = (
        purchases.join(
            dim,
            (dim.user_id == F.col("pu"))
            & (dim.valid_from <= F.col("pts")),
        )
        .groupBy("event_id", "pu", "pts")
        .agg(F.max("version").alias("dim_version"))
    )
    state = dim.select(
        F.col("user_id").alias("du"),
        F.col("version").alias("dv"),
        F.col("event_type").alias("dim_state"),
    )
    return (
        hits.join(
            state,
            (F.col("pu") == F.col("du"))
            & (F.col("dim_version") == F.col("dv")),
        )
        .select(
            "event_id",
            F.col("pu").alias("user_id"),
            F.col("pts").alias("ts"),
            "dim_version",
            "dim_state",
        )
        .orderBy("event_id")
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           (SELECT max(c.event_id) FROM events c
            WHERE c.event_type = 'click'
              AND c.user_id = p.user_id
              AND c.ts <= p.ts
              AND c.ts >= p.ts - INTERVAL 1 HOUR) AS last_click_id
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    category="2.C",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness as-of join — q_join_asof with a tolerance: the
    latest click at-or-before each purchase, but ONLY if it is at most
    1 hour old (pandas merge_asof's `tolerance`; the market-data rule
    that a stale quote must not enrich a trade). Same single-shuffle
    union+window plan as the unbounded as-of — the window additionally
    carries the matched click's timestamp, and one codegen'd filter
    nulls the match when it exceeds the staleness bound. The oracle's
    correlated subquery gets the same window via its extra range
    predicate; max(event_id) stays the deterministic tie winner
    (events.ts non-decreasing in event_id, FIXTURES.md §2)."""
    e = load_table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "click_id"
        ),
        F.when(F.col("event_type") == "click", F.col("ts")).alias(
            "click_ts"
        ),
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(1).alias(
            "side"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "side",
        F.last("click_id", ignorenulls=True).over(w).alias("cand_id"),
        F.last("click_ts", ignorenulls=True).over(w).alias("cand_ts"),
    )
    fresh = F.col("cand_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return enriched.where(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(fresh, F.col("cand_id")).alias("last_click_id"),
    )


@query(
    "q_join_geo_radius",
    oracle="""
    WITH cust AS (
        SELECT c_custkey, c_nationkey,
               (c_custkey * 7919 % 1200) / 10.0 - 60.0   AS lat,
               (c_custkey * 104729 % 3600) / 10.0 - 180.0 AS lon
        FROM customer
    ),
    supp AS (
        SELECT s_suppkey,
               (s_suppkey * 12553 % 1200) / 10.0 - 60.0  AS lat,
               (s_suppkey * 30011 % 3600) / 10.0 - 180.0 AS lon
        FROM supplier
    ),
    pairs AS (
        SELECT c.c_nationkey,
               2.0 * 6371.0 * asin(sqrt(least(1.0,
                   sin(radians(s.lat - c.lat) / 2)
                     * sin(radians(s.lat - c.lat) / 2)
                   + cos(radians(c.lat)) * cos(radians(s.lat))
                     * sin(radians(s.lon - c.lon) / 2)
                     * sin(radians(s.lon - c.lon) / 2)))) AS dist_km
        FROM cust c, supp s
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(floor(dist_km * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS dist_cm_sum
    FROM pairs
    WHERE dist_km <= 150.0
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    category="2.C",
)
def q_join_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial radius join (customers within 150 km of a supplier)
    with GRID-CELL BLOCKING — the canonical spatial-join decomposition:
    synthetic-but-deterministic coordinates derive from the keys by
    pure modular arithmetic (identical expression both engines;
    latitudes capped to ±60° so a 150 km disc spans < 3° of longitude
    even at the cap). The small side explodes to its 3×3 cell
    neighborhood on a 3° grid — longitude cells wrap modulo 120 so
    antimeridian pairs are kept, matching haversine's inherent
    periodicity — then BROADCASTS; the probe is a cell equi-join
    followed by the exact haversine filter (guarded by least(1.0,·)
    against asin-domain float spill). The oracle brute-forces the
    cross join: the match proves the candidate set is LOSSLESS, i.e.
    blocking changed cost, not semantics. Scale: O(n·m) → O(matching
    cells); for fact-fact spatial joins the same cell key becomes the
    shuffle partition key instead of a broadcast — the plan shape big
    geo engines (Sedona et al.) bottom out to. Distances aggregate as
    exact integer centimeters-of-km; the single trig pipeline runs
    over identical operands on both engines."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        ((F.col("c_custkey") * 7919 % 1200) / 10.0 - 60.0).alias("lat"),
        ((F.col("c_custkey") * 104729 % 3600) / 10.0 - 180.0).alias("lon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 12553 % 1200) / 10.0 - 60.0).alias("lat"),
        ((F.col("s_suppkey") * 30011 % 3600) / 10.0 - 180.0).alias("lon"),
    )
    # 3° grid: lat cell is plain floor (no wrap needed at ±60), lon cell
    # wraps modulo 120 so the ±180° seam joins correctly.
    cust_cells = cust.select(
        "c_nationkey", "lat", "lon",
        F.floor(F.col("lat") / 3.0).alias("clat"),
        ((F.floor(F.col("lon") / 3.0) + 120) % 120).alias("clon"),
    )
    # 3×3 neighborhood via two generators (not a crossJoin): keeps the
    # physical plan free of nested-loop joins so the gate below can
    # assert the ONLY join is the broadcast hash probe on the cell key.
    supp_cells = supp.select(
        "*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dlat")
    ).select(
        "*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dlon")
    ).select(
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
        (F.floor(F.col("lat") / 3.0) + F.col("dlat")).alias("clat"),
        ((F.floor(F.col("lon") / 3.0) + F.col("dlon") + 240) % 120)
        .alias("clon"),
    )
    j = cust_cells.join(F.broadcast(supp_cells), ["clat", "clon"])
    dlat2 = F.radians(F.col("s_lat") - F.col("lat")) / 2
    dlon2 = F.radians(F.col("s_lon") - F.col("lon")) / 2
    a = F.least(
        F.lit(1.0),
        F.sin(dlat2) * F.sin(dlat2)
        + F.cos(F.radians(F.col("lat"))) * F.cos(F.radians(F.col("s_lat")))
        * F.sin(dlon2) * F.sin(dlon2),
    )
    dist = 2.0 * 6371.0 * F.asin(F.sqrt(a))
    return (
        j.select("c_nationkey", dist.alias("dist_km"))
        .where(F.col("dist_km") <= 150.0)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(F.floor(F.col("dist_km") * 100.0 + 0.5).cast("bigint"))
            .cast("bigint").alias("dist_cm_sum"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_join_geo_knn",
    oracle="""
    WITH cust AS (
        SELECT c_custkey,
               (c_custkey * 7919 % 1200) / 10.0 - 60.0   AS lat,
               (c_custkey * 104729 % 3600) / 10.0 - 180.0 AS lon
        FROM customer
    ),
    supp AS (
        SELECT s_suppkey,
               (s_suppkey * 12553 % 1200) / 10.0 - 60.0  AS lat,
               (s_suppkey * 30011 % 3600) / 10.0 - 180.0 AS lon
        FROM supplier
    ),
    pairs AS (
        SELECT c.c_custkey, s.s_suppkey,
               2.0 * 6371.0 * asin(sqrt(least(1.0,
                   sin(radians(s.lat - c.lat) / 2)
                     * sin(radians(s.lat - c.lat) / 2)
                   + cos(radians(c.lat)) * cos(radians(s.lat))
                     * sin(radians(s.lon - c.lon) / 2)
                     * sin(radians(s.lon - c.lon) / 2)))) AS dist_km
        FROM cust c, supp s
    ),
    ranked AS (
        SELECT c_custkey, s_suppkey,
               CAST(floor(dist_km * 100.0 + 0.5) AS BIGINT) AS dist_cm,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey
                   ORDER BY dist_km, s_suppkey) AS rn
        FROM pairs
        WHERE dist_km <= 150.0
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, dist_cm
    FROM ranked
    WHERE rn = 1
    ORDER BY c_custkey
    """,
    category="2.C",
)
def q_join_geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded nearest-neighbor join (k=1 within 150 km) — the second
    spatial shape after the radius join (q_join_geo_radius, which owns
    the blocking-losslessness proof): each customer's nearest supplier
    among the grid-blocked candidates, arg-min by (distance, suppkey)
    through a per-customer row_number window so haversine ties break on
    the unique key. The RADIUS BOUND is what makes grid blocking serve
    a kNN query exactly: an unbounded nearest-neighbor needs expanding-
    ring search (candidates may sit arbitrarily many cells away), while
    'nearest within R' only ever inspects the 3×3 neighborhood —
    bounded-kNN is the form that scales and the form most pipelines
    actually mean. Customers with no supplier in range drop out, same
    on both engines. Scale: candidates stream through the same
    broadcast cell join; the window partitions by customer — one
    shuffle on the probe key, state bounded by candidates-per-customer,
    with the min_by single-pass form as the k=1 specialization when
    the full ranking isn't needed."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919 % 1200) / 10.0 - 60.0).alias("lat"),
        ((F.col("c_custkey") * 104729 % 3600) / 10.0 - 180.0).alias("lon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 12553 % 1200) / 10.0 - 60.0).alias("lat"),
        ((F.col("s_suppkey") * 30011 % 3600) / 10.0 - 180.0).alias("lon"),
    )
    cust_cells = cust.select(
        "c_custkey", "lat", "lon",
        F.floor(F.col("lat") / 3.0).alias("clat"),
        ((F.floor(F.col("lon") / 3.0) + 120) % 120).alias("clon"),
    )
    supp_cells = supp.select(
        "*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dlat")
    ).select(
        "*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dlon")
    ).select(
        F.col("s_suppkey"),
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
        (F.floor(F.col("lat") / 3.0) + F.col("dlat")).alias("clat"),
        ((F.floor(F.col("lon") / 3.0) + F.col("dlon") + 240) % 120)
        .alias("clon"),
    )
    j = cust_cells.join(F.broadcast(supp_cells), ["clat", "clon"])
    dlat2 = F.radians(F.col("s_lat") - F.col("lat")) / 2
    dlon2 = F.radians(F.col("s_lon") - F.col("lon")) / 2
    a = F.least(
        F.lit(1.0),
        F.sin(dlat2) * F.sin(dlat2)
        + F.cos(F.radians(F.col("lat"))) * F.cos(F.radians(F.col("s_lat")))
        * F.sin(dlon2) * F.sin(dlon2),
    )
    cand = j.select(
        "c_custkey", "s_suppkey",
        (2.0 * 6371.0 * F.asin(F.sqrt(a))).alias("dist_km"),
    ).where(F.col("dist_km") <= 150.0)
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_suppkey"),
            F.floor(F.col("dist_km") * 100.0 + 0.5).cast("bigint")
            .alias("dist_cm"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_join_lateral_df",
    oracle="""
    SELECT n.n_name, t.c_name, t.bal_cents
    FROM nation n,
         LATERAL (
           SELECT c.c_name,
                  CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
           FROM customer c
           WHERE c.c_nationkey = n.n_nationkey
           ORDER BY CAST(round(c.c_acctbal * 100) AS BIGINT) DESC,
                    c.c_custkey
           LIMIT 2
         ) t
    """,
    category="2.C",
)
def q_join_lateral_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.lateralJoin (Spark 4.0) — the DATAFRAME-API spelling of
    the correlated top-k-per-group that q_join_lateral certifies
    through SQL: top-2 customers by account balance per nation, the
    right side referencing the outer row through Column.outer() (the
    r8 probe pinned the marker API). The point of the rung is the
    API surface itself: before 4.0 this shape forced either a string
    of SQL or a manual window rewrite; lateralJoin keeps it
    composable. Catalyst DECORRELATES the lateral limit into a join +
    windowed group limit exactly as for the SQL form — no per-outer-
    row re-execution — so the scale shape is one hash join on
    nationkey + a per-group cut; the fully deterministic ORDER BY
    (balance DESC, custkey) makes the cut engine-stable. Oracle is
    the equivalent SQL LATERAL in DuckDB."""
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    top2 = (
        cust.where(
            F.col("c_nationkey") == F.col("n_nationkey").outer()
        )
        .orderBy(F.col("bal_cents").desc(), F.col("c_custkey"))
        .limit(2)
        .select("c_name", "bal_cents")
    )
    return nat.lateralJoin(top2).select("n_name", "c_name", "bal_cents")


@query(
    "q_join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS day, MIN(ts) AS s, MAX(ts) AS e
      FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ),
    p AS (
      SELECT a.user_id, a.day, CAST(COUNT(*) AS BIGINT) AS n_partners
      FROM iv a JOIN iv b
        ON a.day = b.day AND a.user_id <> b.user_id
       AND a.s <= b.e AND b.s <= a.e
      GROUP BY 1, 2
    )
    SELECT i.user_id, CAST(i.day AS TIMESTAMP) AS day,
           CAST((epoch_us(i.e) - epoch_us(i.s)) // 1000000 AS BIGINT)
             AS dur_s,
           COALESCE(p.n_partners, 0) AS n_partners
    FROM iv i LEFT JOIN p ON i.user_id = p.user_id AND i.day = p.day
    ORDER BY i.user_id, i.day
    """,
    category="2.C",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join — both sides are intervals, no equi key
    between them: per (user, day) error-activity interval [first, last
    error], count how many OTHER users' intervals OVERLAP it (the
    concurrent-incident blast-radius question; q_join_interval is the
    point-in-range case WITH a user equi key, this is the harder
    interval×interval case without one).

    Scale shape — a per-day BOUNDARY SWEEP, not a candidate join (r13;
    the r12 form banded intervals to hour buckets and pair-joined the
    candidates, paying a ≤24× explode, a self-join and a DISTINCT over
    the pair relation). The pairwise predicate is never evaluated: for
    one day holding N intervals, the non-partners of a are exactly the
    DISJOINT union {b: s_b > e_a} ∪ {b: e_b < s_a} (if s_b > e_a then
    e_b ≥ s_b > e_a ≥ s_a, so no interval is in both), hence

        n_partners(a) = #{s_b ≤ e_a} − #{e_b < s_a} − 1 (self).

    Both counts are running ranks over the day's sorted boundary
    multiset: each interval contributes a START row (weight ws=1), an
    END row (we=1) and two QUERY rows (at v=e for the start-count, at
    v=s for the end-count), tags order equal values so that starts sort
    BEFORE the ≤-query and ends sort AFTER the <-query, and one
    day-partitioned cumulative-sum window prices every query row. Query
    rows carry weight 0, so tie order among them cannot change any sum.
    O(N log N) per day instead of the candidate join's quadratic-ish
    pair relation; the day-keyed window is the same partitioning the
    oracle's per-day join uses. The oracle keeps the quadratic
    formulation (fine at oracle scale); results are identical by the
    disjoint-complement identity above."""
    e = load_table(spark, sf_dir, "events")
    iv = (
        e.where(F.col("event_type") == "error")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    iv = iv.cache()
    track_cache(iv.unpersist)
    # tag ordering at equal v: start(0) < start-count query(1) <
    # end-count query(2) < end(3) — starts at v == e_a count (≤ is
    # inclusive), ends at v == s_a do not (< is strict).
    kinds = [
        (F.col("s"), 0, 1, 0),   # start boundary, ws = 1
        (F.col("e"), 1, 0, 0),   # query: n_le = # starts ≤ e
        (F.col("s"), 2, 0, 0),   # query: n_lt = # ends < s
        (F.col("e"), 3, 0, 1),   # end boundary, we = 1
    ]
    parts = [
        iv.select(
            "user_id", "day", v.alias("v"),
            F.lit(tag).alias("tag"),
            F.lit(ws).alias("ws"), F.lit(we).alias("we"),
        )
        for v, tag, ws, we in kinds
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w_day = (
        Window.partitionBy("day")
        .orderBy("v", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = u.select(
        "user_id", "day", "tag",
        F.sum("ws").over(w_day).alias("ca"),
        F.sum("we").over(w_day).alias("cb"),
    ).where(F.col("tag").isin(1, 2))
    counts = c.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("tag") == 1, F.col("ca"))).alias("n_le"),
        F.max(F.when(F.col("tag") == 2, F.col("cb"))).alias("n_lt"),
    )
    return (
        iv.join(counts, ["user_id", "day"])
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            F.expr(
                "CAST((unix_micros(e) - unix_micros(s)) DIV 1000000 "
                "AS BIGINT)"
            ).alias("dur_s"),
            (F.col("n_le") - F.col("n_lt") - 1).cast("long").alias(
                "n_partners"
            ),
        )
        .orderBy("user_id", "day")
    )
