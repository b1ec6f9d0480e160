"""Data-profiling / data-quality operators (SURVEY.md §2, round 2): the
queries a pipeline runs BEFORE trusting a 100 TB corpus — column profiles,
exact correlation, k-anonymity audit, event-cadence gaps, vocabulary
growth. Reference identity per SURVEY §0 [T1 README.md:3-4] (a stream
pipeline's landed data gets exactly this QA pass); semantics are the
public definitions (Heaps' law, Pearson r, k-anonymity).

Exactness discipline: every output is integers, strings, or a single
IEEE division/sqrt over exactly-summed integers (parity.py §: one float
op on identical operands is bit-deterministic); ratios round via
floor(x*10^k + 0.5)/10^k half-up on both engines — never engine ROUND,
whose tie behavior differs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table

_ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]


@query(
    "q_profile_table",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders"""
        for c in _ORDERS_COLS
    )
    + "\nORDER BY column_name",
    category="2.D",
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of `orders`: per-column row/null/distinct counts —
    the schema-drift smoke test every ingest runs. One Spark job computes
    ALL columns' stats in a single pass (one global aggregate emitting
    2+len(cols) exact counters, then a tiny explode to long form) — NOT a
    scan per column: at 100 TB that's 6 scans saved vs the naive UNION
    ALL the oracle uses. COUNT(DISTINCT c1), COUNT(DISTINCT c2), ... in
    one agg is planned by Spark as expand+partial-agg (one shuffle, no
    joins). Counts are exact integers."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _ORDERS_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = o.agg(*aggs)
    per_col = ", ".join(
        f"'{c}', struct(nn_{c} AS nn, nd_{c} AS nd)" for c in _ORDERS_COLS
    )
    return (
        wide.select(
            "n_rows",
            F.expr(f"explode(map({per_col})) AS (column_name, s)"),
        )
        .select(
            "column_name",
            "n_rows",
            (F.col("n_rows") - F.col("s.nn")).alias("n_null"),
            F.col("s.nd").alias("n_distinct"),
        )
        .orderBy("column_name")
    )


_CORR_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(round(l_discount * 1000) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(round(l_discount * 1000) AS BIGINT)
                  * CAST(round(l_discount * 1000) AS BIGINT)) AS BIGINT) AS syy,
         CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(round(l_discount * 1000) AS BIGINT)) AS BIGINT) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       floor((n * sxy - sx * sy)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000
             + CAST(0.5 AS DOUBLE))
       / CAST(1000000 AS DOUBLE) AS corr_qty_disc
FROM m
ORDER BY l_returnflag
"""


# Int64 moment-headroom guard (r8 verdict carried item 1 / ADVICE r8
# exemption closed in r9): every intermediate of the exact-moment
# correlation/regression math is bounded by n²·max|x|·max|y| (the sums
# are bounded by n·max, their pairwise products by n²·max²), so ONE
# comparison per max-pair, evaluated in double (which cannot overflow),
# proves no int64 intermediate can have wrapped. 2^62 leaves a 2×
# margin under the true 2^63 limit.
_INT64_HEADROOM = float(1 << 62)


def _int64_moment_guard(result: Column, bounds: list[Column],
                        ctx: str) -> Column:
    """Gate `result` on the documented int64 bound actually holding —
    raises instead of returning silently-wrapped moments. `bounds` are
    DOUBLE upper-bound expressions, one per worst intermediate of the
    caller's formula (e.g. n²·max|x|·max|y| for a moment product,
    n²·max|x|²·max|y| for a cubic cross term like sy·sxx): callers
    must enumerate every product their algebra forms — the r9
    first-cut guard checked only pairwise n²·a·b and silently missed
    linreg's cubic intercept intermediates."""
    ok = F.lit(True)
    for b in bounds:
        ok = ok & (b < F.lit(_INT64_HEADROOM))
    return F.when(ok, result).otherwise(
        F.raise_error(
            F.lit(
                f"{ctx}: int64 moment headroom exceeded "
                "(an intermediate bound reaches 2^62) — move moments "
                "to DECIMAL(38,0) for this data scale"
            )
        )
    )


def _exact_corr_frame(df: DataFrame, key: str, x: Column, y: Column,
                      out_name: str) -> DataFrame:
    """Guarded exact-integer-moment Pearson correlation per `key` group
    (see q_agg_corr_exact). Split out so the overflow guard can be
    exercised on a synthetic over-bound frame in tests."""
    m = df.groupBy(key).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
        F.max(F.abs(x)).alias("mx"),
        F.max(F.abs(y)).alias("my"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    r = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx).cast("double") * (n * syy - sy * sy).cast("double")
    )
    rounded = (
        F.floor(r * 1000000 + F.lit(0.5).cast("double"))
        / F.lit(1000000).cast("double")
    )
    # every corr intermediate (n·sxy, sx·sy, n·sxx, sx², n·syy, sy²)
    # is bounded by one of the pairwise n²·max·max products
    nn = n.cast("double")
    mx, my = F.col("mx").cast("double"), F.col("my").cast("double")
    guarded = _int64_moment_guard(
        rounded,
        [nn * nn * mx * mx, nn * nn * my * my, nn * nn * mx * my],
        "q_agg_corr_exact",
    )
    return m.select(key, "n", guarded.alias(out_name)).orderBy(key)


@query("q_agg_corr_exact", oracle=_CORR_ORACLE, category="2.D")
def q_agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of (quantity, discount) per returnflag from
    EXACT integer moments — not the engines' float `corr` aggregate,
    whose accumulation order differs run to run. Quantities are integral
    doubles and discounts live on a 0.001 grid, so the six moments
    (n, Sx, Sy, Sxx, Syy, Sxy) are exact int64 (bounds at sf0.1:
    Sxy <= 50*100*600k = 3e9, n*Sxy <= 1.8e15 — headroom; at true 100 TB
    the moments move to DECIMAL(38), same shape). Since r9 the bound is
    ASSERTED, not just documented: the agg also carries max|x|/max|y|
    and the result raises via _int64_moment_guard when n²·max·max
    leaves int64 headroom. The final r is a fixed IEEE expression over
    identical integers on both engines, rounded half-up to 6 decimals
    via the floor discipline. One hash agg, eight counters — the same
    map-side-partial shape as any SUM."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_discount") * 1000).cast("bigint")
    return _exact_corr_frame(li, "l_returnflag", x, y, "corr_qty_disc")


@query(
    "q_anon_kanonymity",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           COUNT(*) >= 5 AS k_anonymous
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    ORDER BY c_mktsegment, c_nationkey
    """,
    category="2.D",
)
def q_anon_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier pair
    (mktsegment, nationkey): a release is k-anonymous iff every
    quasi-identifier combination bucket holds >= k individuals. One hash
    agg; the flag is a pure integer comparison. At 100 TB the
    quasi-identifier domain is small (segments x nations), so the partial
    aggregate collapses each map task to the domain size before the
    shuffle — the audit costs one scan."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("group_size"))
        .select(
            "c_mktsegment",
            "c_nationkey",
            "group_size",
            (F.col("group_size") >= 5).alias("k_anonymous"),
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )


@query(
    "q_events_gap_stats",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           floor(SUM(gap_us) / CAST(COUNT(gap_us) AS DOUBLE) / 1000000
                 * 1000 + CAST(0.5 AS DOUBLE))
           / CAST(1000 AS DOUBLE) AS avg_gap_s
    FROM g
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    category="2.E",
)
def q_events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event cadence per user: consecutive-event gaps via lag over
    (user_id, ts, event_id) — event_id breaks ts ties so the lag pairing
    is deterministic — then max and mean gap. Gaps are exact integer
    microseconds (unix_micros, matching the oracle's epoch_us; the NANOS
    source column is already µs-truncated by tables.load_table); the mean
    is one division over exact ints, floor-rounded half-up to
    milliseconds. Scale: one shuffle on user_id shared by the window and
    the agg — Catalyst reuses the partitioning, so the whole op is a
    single exchange."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return (
        g.groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.max("gap_us").alias("max_gap_us"),
            F.sum("gap_us").alias("sum_us"),
        )
        .select(
            "user_id",
            "n_gaps",
            "max_gap_us",
            (
                F.floor(
                    F.col("sum_us") / F.col("n_gaps").cast("double")
                    / 1000000 * 1000
                    + F.lit(0.5).cast("double")
                )
                / F.lit(1000).cast("double")
            ).alias("avg_gap_s"),
        )
        .orderBy("user_id")
    )


@query(
    "q_llm_vocab_growth",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    first AS (
      SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token
    ),
    n AS (SELECT MAX(doc_id) + 1 AS nd FROM documents)
    SELECT CAST(t.d AS INTEGER) AS decile,
           CAST(SUM(CASE WHEN f.first_doc * 10 < t.d * n.nd
                         THEN 1 ELSE 0 END) AS BIGINT) AS vocab
    FROM first f CROSS JOIN n CROSS JOIN generate_series(1, 10) t(d)
    GROUP BY t.d
    ORDER BY decile
    """,
    category="2.J",
)
def q_llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct tokens seen within
    the first d/10 of the corpus (by doc_id), for d = 1..10 — the
    dedup-planning companion to the Zipf slope (`q_llm_zipf_slope`): a
    flattening curve says near-dup mass, a steep one says fresh text.

    Scale shape: explode to tokens, ONE hash agg to first-occurrence
    (token -> min doc_id; vocabulary-sized, not corpus-sized), then ten
    conditional sums in a single pass over that agg — threshold math is
    pure integers (first_doc*10 < d*nd), no division. The only joins are
    two broadcast attaches (the 1-row max and the 10-row decile spine);
    the token explode never shuffles raw text, only (token, doc_id)."""
    d = load_table(spark, sf_dir, "documents")
    first = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    nd = d.agg((F.max("doc_id") + 1).alias("nd"))
    deciles = spark.range(1, 11).select(F.col("id").cast("int").alias("d"))
    return (
        first.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(deciles))
        .groupBy("d")
        .agg(
            F.sum(
                F.when(
                    F.col("first_doc") * 10 < F.col("d") * F.col("nd"), 1
                ).otherwise(0)
            ).alias("vocab")
        )
        .select(F.col("d").alias("decile"), "vocab")
        .orderBy("decile")
    )


@query(
    "q_agg_linreg_exact",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (n * sxx - sx * sx) >= 0
                THEN floor(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (n * sxx - sx * sx) * 1000000.0 + 0.5) / 1000000.0
                ELSE ceil(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (n * sxx - sx * sx) * 1000000.0 - 0.5) / 1000000.0
           END AS slope_cents_day,
           CASE WHEN CAST(sy * sxx - sx * sxy AS DOUBLE)
                     / (n * sxx - sx * sx) >= 0
                THEN floor(CAST(sy * sxx - sx * sxy AS DOUBLE)
                     / (n * sxx - sx * sx) * 1000000.0 + 0.5) / 1000000.0
                ELSE ceil(CAST(sy * sxx - sx * sxy AS DOUBLE)
                     / (n * sxx - sx * sx) * 1000000.0 - 0.5) / 1000000.0
           END AS intercept_cents
    FROM m ORDER BY event_type
    """,
    category="2.D",
)
def q_agg_linreg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of spend over time from EXACT integer
    moments — regr_slope/regr_intercept semantics without the engines'
    float accumulators (whose summation order differs run to run).
    x = whole days since 2024-01-01 (≤ 31), y = integer cents (≤ 49k), so
    all five moments are exact int64 with wide headroom (n·Sxy ≈ 6e14 at
    sf0.1; the 100 TB version moves moments to DECIMAL(38), same shape).
    Slope and intercept are each ONE IEEE division of exact integers,
    rounded half-up-by-magnitude to 6dp with the floor/ceil pair (slope
    can be negative — bare fround would round toward +∞). One hash agg:
    the same map-side-partial shape as any SUM. Since r9 the int64
    bound is ASSERTED via _int64_moment_guard (see _exact_linreg_frame),
    not just documented."""
    e = load_table(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    return _exact_linreg_frame(
        e.select("event_type", x.alias("x"), y.alias("y")), "event_type"
    )


def _exact_linreg_frame(pts: DataFrame, key: str) -> DataFrame:
    """Guarded exact-integer-moment OLS per `key` group (see
    q_agg_linreg_exact). Input columns: key, x(long), y(long). Split out
    so the overflow guard can fire on a synthetic over-bound frame."""
    m = pts.groupBy(key).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.max(F.abs(F.col("x"))).alias("mx"),
        F.max(F.abs(F.col("y"))).alias("my"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    den = (n * sxx - sx * sx).cast("double")

    def _round6_signed(c):
        return F.when(
            c >= 0, F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0
        ).otherwise(F.ceil(c * 1000000.0 - F.lit(0.5)) / 1000000.0)

    slope = (n * sxy - sx * sy).cast("double") / den
    intercept = (sy * sxx - sx * sxy).cast("double") / den
    # slope/den intermediates are pairwise (n²·max·max); the intercept
    # numerator sy·sxx − sx·sxy is CUBIC — bounded by n²·mx²·my — and
    # the first-cut r9 guard missed it (round-9 review finding)
    nn = n.cast("double")
    mx, my = F.col("mx").cast("double"), F.col("my").cast("double")
    pairwise = [nn * nn * mx * mx, nn * nn * mx * my]
    cubic = [nn * nn * mx * mx * my]
    return m.select(
        key, "n",
        _int64_moment_guard(
            _round6_signed(slope), pairwise, "q_agg_linreg_exact"
        ).alias("slope_cents_day"),
        _int64_moment_guard(
            _round6_signed(intercept), pairwise + cubic,
            "q_agg_linreg_exact",
        ).alias("intercept_cents"),
    ).orderBy(key)


@query(
    "q_anon_ldiversity",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT floor(c_acctbal / 1000)) AS BIGINT)
               AS n_sensitive,
           COUNT(DISTINCT floor(c_acctbal / 1000)) >= 3 AS l_diverse
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    ORDER BY c_mktsegment, c_nationkey
    """,
    category="2.D",
)
def q_anon_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3) — k-anonymity's stronger sibling: each
    quasi-identifier bucket (mktsegment, nationkey) must contain at
    least l DISTINCT values of the sensitive attribute (account-balance
    band, $1000 granularity), or the bucket leaks the attribute even
    when it is k-anonymous. One hash agg with a distinct-count; the band
    floor() over a double is the identical IEEE op both engines. Same
    bounded-domain collapse as q_anon_kanonymity: segments × nations
    partial-aggregates map-side before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000)
    return (
        c.groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count("*").alias("group_size"),
            F.countDistinct(band).alias("n_sensitive"),
        )
        .select(
            "c_mktsegment", "c_nationkey", "group_size", "n_sensitive",
            (F.col("n_sensitive") >= 3).alias("l_diverse"),
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )


@query(
    "q_agg_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, event_type
    ),
    t AS (
      SELECT user_id, event_type, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS n
      FROM c
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(MAX(n) AS BIGINT) AS n_events,
           floor(CAST(-SUM(CAST((CAST(cnt AS DOUBLE) / n)
                           * ln(CAST(cnt AS DOUBLE) / n)
                           AS DECIMAL(38, 18))) AS DOUBLE)
                 * 100000000.0 + 0.5) / 100000000.0 AS entropy_nats
    FROM t GROUP BY user_id ORDER BY user_id
    """,
    category="2.D",
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral-
    diversity profile (bots score near 0, organic users near ln 5).
    Exactness: ln is TRANSCENDENTAL — JVM Math.log and DuckDB's libm
    disagree in the last ulp for some inputs (measured on this corpus),
    so no summation discipline alone can hash-match. The defense is
    layered: DECIMAL(38,18) summation removes order dependence, then the
    final value is floor-rounded half-up to 8dp — ulp noise is ~1e-16,
    eight orders below the rounding grid, so the boundary cannot be
    straddled in practice. One shuffle on user_id shared by the count, the window
    total, and the final agg."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    n = F.sum("cnt").over(Window.partitionBy("user_id"))
    p = F.col("cnt").cast("double") / F.col("n")
    term = (p * F.log(p)).cast("decimal(38,18)")
    return (
        c.withColumn("n", n)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_types"),
            F.max("n").alias("n_events"),
            (
                F.floor((-F.sum(term)).cast("double") * 100000000.0
                        + F.lit(0.5))
                / 100000000.0
            ).alias("entropy_nats"),
        )
        .orderBy("user_id")
    )


@query(
    "q_agg_winsorize",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
             CAST(row_number() OVER (PARTITION BY event_type
                 ORDER BY cents) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM base
    ),
    cuts AS (
      SELECT event_type, MAX(n) AS n,
             CAST(MAX(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END)
                  AS BIGINT) AS lo_cents,
             CAST(MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END)
                  AS BIGINT) AS hi_cents
      FROM ranked GROUP BY event_type
    )
    SELECT b.event_type, CAST(MAX(c.n) AS BIGINT) AS n,
           CAST(MAX(c.lo_cents) AS BIGINT) AS lo_cents,
           CAST(MAX(c.hi_cents) AS BIGINT) AS hi_cents,
           CAST(SUM(CASE WHEN b.cents < c.lo_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN b.cents > c.hi_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high,
           floor(CAST(SUM(least(greatest(b.cents, c.lo_cents), c.hi_cents))
                      AS DOUBLE) / MAX(c.n) * 10000.0 + 0.5) / 10000.0
               AS winsor_mean_cents
    FROM base b JOIN cuts c USING (event_type)
    GROUP BY b.event_type ORDER BY b.event_type
    """,
    category="2.D",
)
def q_agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%/95% winsorization per event type — the outlier-robust mean the
    feature pipeline uses before normalizing a heavy-tailed metric. The
    cutoffs are POSITION-based order statistics (rank ⌈0.05n⌉ / ⌈0.95n⌉
    computed in pure integer arithmetic, (5n+99) div 100 — no float
    quantile interpolation, so the cut values are actual data points and
    every downstream sum stays exact int64). Clipping, clip counts and
    the winsorized mean are integer ops + ONE division, floor-rounded
    half-up to 4dp. Scale: the raw stream is reduced ONCE to the
    (event_type, cents) HISTOGRAM — bounded by the cents value domain,
    not the row count (the q_agg_weighted_median trick) — and every
    ranking window, cutoff lookup and clipped sum folds over that
    histogram with multiplicities. A row_number over the raw stream
    partitioned by 5 event types would globally sort n/5 rows per task
    at 100x; nothing here touches row grain after the first agg."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    hist = base.groupBy("event_type", "cents").agg(F.count("*").alias("m"))
    wrank = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    # Rank span of each tie block: [lo_rn, hi_rn] in the per-type order.
    ranked = hist.select(
        "event_type", "cents", "m",
        F.sum("m").over(wrank).alias("hi_rn"),
        F.sum("m").over(wall).alias("n"),
    ).withColumn("lo_rn", F.col("hi_rn") - F.col("m") + 1)
    k_lo = F.expr("(n * 5 + 99) div 100")
    k_hi = F.expr("(n * 95 + 99) div 100")
    cuts = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(
                k_lo.between(F.col("lo_rn"), F.col("hi_rn")), F.col("cents")
            )
        ).alias("lo_cents"),
        F.max(
            F.when(
                k_hi.between(F.col("lo_rn"), F.col("hi_rn")), F.col("cents")
            )
        ).alias("hi_cents"),
    )
    clipped = hist.join(F.broadcast(cuts), "event_type").select(
        "event_type", "cents", "m", "n", "lo_cents", "hi_cents",
        (
            F.col("m")
            * F.least(
                F.greatest(F.col("cents"), F.col("lo_cents")),
                F.col("hi_cents"),
            )
        ).alias("wcents"),
    )
    wmean = F.sum("wcents").cast("double") / F.max("n")
    return (
        clipped.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("lo_cents").alias("lo_cents"),
            F.max("hi_cents").alias("hi_cents"),
            F.sum(
                F.when(F.col("cents") < F.col("lo_cents"), F.col("m"))
                .otherwise(0)
            ).alias("n_clipped_low"),
            F.sum(
                F.when(F.col("cents") > F.col("hi_cents"), F.col("m"))
                .otherwise(0)
            ).alias("n_clipped_high"),
            (F.floor(wmean * 10000.0 + F.lit(0.5)) / 10000.0).alias(
                "winsor_mean_cents"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_gini",
    oracle="""
    WITH x AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT cnt,
             CAST(row_number() OVER (ORDER BY cnt) AS BIGINT) AS rn
      FROM x
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(cnt) AS BIGINT) AS total_events,
           floor((CAST(2 * SUM(rn * cnt) - (COUNT(*) + 1) * SUM(cnt)
                       AS DOUBLE))
                 / (COUNT(*) * SUM(cnt)) * 1000000.0 + 0.5) / 1000000.0
               AS gini
    FROM r
    """,
    category="2.D",
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event concentration — the inequality
    statistic behind "do 10% of users generate 90% of traffic"
    (workload-skew QA: a high Gini predicts hot keys everywhere
    downstream). Closed form over rank-weighted sums:
    G = (2·Σ rn·x − (n+1)·Σx)/(n·Σx) with all sums exact int64; ties in
    x make rn assignment arbitrary but Σ rn·x is INVARIANT within a tie
    block (ranks c+1..c+m × equal value x sum to x·(m·c + m(m+1)/2)), so
    the ranking NEVER materializes per user: aggregate to the count
    HISTOGRAM (distinct per-user count → multiplicity m, bounded by the
    value domain, not the user count), take a distributed two-phase
    exclusive cumsum of m over it (operators/dprefix.py), and fold the
    closed form. Users scale with data; the histogram doesn't — no
    partition-less window, no user-grain sort, floor-rounded half-up to
    6dp (G ≥ 0 by sorted construction)."""
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_cumsum,
    )

    e = load_table(spark, sf_dir, "events")
    x = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    h = x.groupBy("cnt").agg(F.count("*").alias("m"))
    c = two_phase_cumsum(
        h, [("cnt", True)], "m", out="c", inclusive=False
    )
    n, sx = F.sum("m"), F.sum(F.col("m") * F.col("cnt"))
    # Σ rn·x folded per tie block: x · (m·c + m(m+1)/2).
    srx = F.sum(
        F.col("cnt")
        * (
            F.col("m") * F.col("c")
            + F.expr("m * (m + 1) div 2")
        )
    )
    gini = (2 * srx - (n + 1) * sx).cast("double") / (n * sx)
    return c.agg(
        n.alias("n_users"),
        sx.alias("total_events"),
        (F.floor(gini * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("gini"),
    )


# Benford first-digit probabilities log10(1+1/d), d=1..9, as shared
# 17-digit literals — IDENTICAL text in the Spark builder and the oracle,
# so both engines parse the same doubles (no runtime log10 divergence).
_BENFORD = {
    1: "0.30102999566398120", 2: "0.17609125905568124",
    3: "0.12493873660829993", 4: "0.09691001300805642",
    5: "0.07918124604762482", 6: "0.06694678963061322",
    7: "0.05799194697768673", 8: "0.05115252244738129",
    9: "0.04575749056067514",
}


@query(
    "q_agg_benford",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits GROUP BY d
    ),
    exp AS (
      {" UNION ALL ".join(f"SELECT {d} AS d, CAST({p} AS DOUBLE) AS p" for d, p in _BENFORD.items())}
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
    SELECT e.d, COALESCE(o.n_obs, 0) AS n_obs,
           CAST(floor(t.n * e.p + 0.5) AS BIGINT) AS n_expected,
           floor((COALESCE(o.n_obs, 0) - t.n * e.p)
                 * (COALESCE(o.n_obs, 0) - t.n * e.p)
                 / (t.n * e.p) * 10000.0 + 0.5) / 10000.0 AS chi2_term
    FROM exp e LEFT JOIN obs o ON o.d = e.d CROSS JOIN tot t
    ORDER BY e.d
    """,
    category="2.D",
)
def q_agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals — the classic fabricated-data
    detector (natural multiplicative amounts put ~30.1% of first digits
    at 1; uniform synthetics don't, and THIS corpus's uniform totals
    fail loudly — which is the point of the audit). First digit comes
    from exact integer cents stringified (no float log10); the nine
    expected probabilities are shared 17-digit literals so both engines
    parse identical doubles; each χ² term is a fixed IEEE expression
    over (exact count, n·p), floor-rounded to 4dp. One digit histogram
    agg + a 9-row broadcast — nothing scales with the corpus but the
    count."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1, 1,
        ).cast("long").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").alias("n_obs"))
    exp_rows = [(d, float(p)) for d, p in _BENFORD.items()]
    exp = spark.createDataFrame(exp_rows, "d long, p double")
    tot = obs.agg(F.sum("n_obs").alias("n"))
    j = (
        F.broadcast(exp)
        .join(obs, "d", "left")
        .crossJoin(F.broadcast(tot))
    )
    n_obs = F.coalesce(F.col("n_obs"), F.lit(0))
    npexp = F.col("n") * F.col("p")
    chi2 = (n_obs - npexp) * (n_obs - npexp) / npexp
    return j.select(
        "d",
        n_obs.alias("n_obs"),
        F.floor(npexp + F.lit(0.5)).alias("n_expected"),
        (F.floor(chi2 * 10000.0 + F.lit(0.5)) / 10000.0).alias("chi2_term"),
    ).orderBy("d")


@query(
    "q_agg_ks_test",
    oracle="""
    WITH tagged AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             user_id % 2 AS variant
      FROM events
    ),
    pts AS (
      SELECT cents,
             CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS b
      FROM tagged GROUP BY cents
    ),
    cum AS (
      SELECT cents,
             CAST(SUM(a) OVER (ORDER BY cents
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
             CAST(SUM(b) OVER (ORDER BY cents
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
      FROM pts
    ),
    tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM pts
    )
    SELECT t.na, t.nb,
           CAST(MAX(abs(c.ca * t.nb - c.cb * t.na)) AS BIGINT) AS d_num,
           floor(CAST(MAX(abs(c.ca * t.nb - c.cb * t.na)) AS DOUBLE)
                 / (t.na * t.nb) * 1000000.0 + 0.5) / 1000000.0 AS ks_d
    FROM cum c CROSS JOIN tot t
    GROUP BY t.na, t.nb
    """,
    category="2.D",
)
def q_agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the hash-variant
    value distributions — the distribution-level A/B check that catches
    shape shifts the mean-based z-test (q_events_ab_test) misses.
    ENTIRELY integer until the last step: D = max|F₁−F₂| evaluated at
    the distinct-value grid as max|c₁·n₂ − c₂·n₁| (exact int64 cumsums
    over exact cents), then ONE division floor-rounded to 6dp. One hash
    agg to the value grid, one cumulative window over that grid (≈
    distinct values, not rows), one max — at 100 TB the grid window is
    a range-partitioned sort of a bounded-cardinality relation."""
    e = load_table(spark, sf_dir, "events")
    tagged = e.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("user_id") % 2).alias("variant"),
    )
    pts = tagged.groupBy("cents").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("b"),
    )
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = pts.select(
        F.sum("a").over(wcum).alias("ca"),
        F.sum("b").over(wcum).alias("cb"),
    )
    tot = pts.agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    j = cum.crossJoin(F.broadcast(tot))
    dnum = F.max(
        F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    )
    return j.groupBy("na", "nb").agg(
        dnum.alias("d_num"),
        (
            F.floor(
                dnum.cast("double") / (F.col("na") * F.col("nb"))
                * 1000000.0 + F.lit(0.5)
            )
            / 1000000.0
        ).alias("ks_d"),
    )


@query(
    "q_agg_theil",
    oracle="""
    WITH x AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    h AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS m FROM x GROUP BY cnt),
    tot AS (
      SELECT CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(m * cnt) AS BIGINT) AS s
      FROM h
    )
    SELECT t.n AS n_users, t.s AS total_events,
           floor(CAST(SUM(CAST(
                   m * (CAST(cnt * t.n AS DOUBLE) / t.s)
                     * ln(CAST(cnt * t.n AS DOUBLE) / t.s)
                 AS DECIMAL(38, 18))) AS DOUBLE) / t.n
                 * 100000000.0 + 0.5) / 100000000.0 AS theil
    FROM h CROSS JOIN tot t
    GROUP BY t.n, t.s
    """,
    category="2.D",
)
def q_agg_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of per-user event concentration — the decomposable
    inequality statistic next to q_agg_gini: T = (1/n)·Σ (x/μ)·ln(x/μ).
    Same scale shape as the gini rewrite: the per-user ranking never
    materializes — aggregate to the count HISTOGRAM (value-domain-
    bounded), fold the closed form per tie block (m identical users
    contribute m · (x/μ)ln(x/μ)). The ln ratio x·n/Σx is a quotient of
    exact int64 products (identical doubles both engines); ln terms go
    through DECIMAL(38,18) sums + 8dp floor-round (law 18). Zero
    windows, two bounded hash-aggs, one broadcast scalar."""
    e = load_table(spark, sf_dir, "events")
    x = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    h = x.groupBy("cnt").agg(F.count("*").alias("m"))
    tot = h.agg(
        F.sum("m").alias("n"), F.sum(F.col("m") * F.col("cnt")).alias("s")
    )
    j = h.crossJoin(F.broadcast(tot))
    ratio = (F.col("cnt") * F.col("n")).cast("double") / F.col("s")
    term = (F.col("m") * ratio * F.log(ratio)).cast("decimal(38,18)")
    return j.groupBy("n", "s").agg(
        (
            F.floor(
                F.sum(term).cast("double") / F.col("n") * 100000000.0
                + F.lit(0.5)
            )
            / 100000000.0
        ).alias("theil")
    ).select(
        F.col("n").alias("n_users"),
        F.col("s").alias("total_events"),
        "theil",
    )


@query(
    "q_agg_hhi",
    oracle="""
    WITH x AS (
      SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(cnt) AS BIGINT) AS total_events,
           ROUND(CAST(10000 * SUM(cnt * cnt) AS DOUBLE)
                 / (SUM(cnt) * SUM(cnt)), 4) AS hhi
    FROM x GROUP BY event_type ORDER BY event_type
    """,
    category="2.D",
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of user activity per event
    type — "is this event type driven by a few heavy users?" on the
    0..10000 antitrust scale: HHI = 10⁴·Σ cntᵤ² / (Σ cntᵤ)². All
    moments exact int64 (Σcnt² ≤ n·max²; headroom through ~3e9 events
    per (type,user)); ONE division of identical integers → identical
    IEEE double, display-rounded. Two hash-aggs, both map-side
    combining; nothing scales past (types × users) and the final
    relation is |types| rows."""
    e = load_table(spark, sf_dir, "events")
    x = e.groupBy("event_type", "user_id").agg(F.count("*").alias("cnt"))
    return (
        x.groupBy("event_type")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("cnt").alias("total_events"),
            F.round(
                (10000 * F.sum(F.col("cnt") * F.col("cnt"))).cast("double")
                / (F.sum("cnt") * F.sum("cnt")),
                4,
            ).alias("hhi"),
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_skew_kurt",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS s1,
             CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS s2,
             CAST(SUM(CAST(x AS DECIMAL(38, 0)) * x * x) AS DOUBLE) AS s3,
             CAST(SUM(CAST(x * x AS DECIMAL(38, 0)) * (x * x)) AS DOUBLE)
               AS s4
      FROM c GROUP BY event_type
    )
    SELECT event_type, n,
           floor((s3 / n - 3 * (s1 / n) * (s2 / n)
                  + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * sqrt(s2 / n - (s1 / n) * (s1 / n)))
                 * 1000000.0 + 0.5) / 1000000.0 AS skewness,
           floor(((s4 / n - 4 * (s1 / n) * (s3 / n)
                   + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                   - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                  / ((s2 / n - (s1 / n) * (s1 / n))
                     * (s2 / n - (s1 / n) * (s1 / n))) - 3)
                 * 1000000.0 + 0.5) / 1000000.0 AS excess_kurtosis
    FROM m ORDER BY event_type
    """,
    category="2.D",
)
def q_agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per event type — the 3rd/4th
    standardized moments that tell a profiler whether z-score thresholds
    are even meaningful. NOT Spark's skewness()/kurtosis() builtins (their
    accumulation order is partition-dependent): power sums S1..S4 over
    int64 cents, S3/S4 in DECIMAL(38,0) because cents^4 exceeds 2^63
    (56021^4 = 9.8e18) while the decimal sum stays exact at any scale.
    Each sum casts to double ONCE (one deterministic rounding), the
    closed forms are identical IEEE expression trees on both engines
    (sqrt is correctly rounded; no pow()), floor-rounded 6dp. Scale: one
    map-side-combining hash-agg, 5-row output."""
    e = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    c = e.select("event_type", x.alias("x"))
    x2 = F.col("x") * F.col("x")
    m = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x") * F.col("x"))
        .cast("double").alias("s3"),
        F.sum(x2.cast("decimal(38,0)") * x2).cast("double").alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = (
        F.col("s3") / F.col("n")
        - 3 * mu * (F.col("s2") / F.col("n"))
        + 2 * mu * mu * mu
    )
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * mu * mu * (F.col("s2") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    return m.select(
        "event_type",
        "n",
        (F.floor(m3 / (m2 * F.sqrt(m2)) * 1000000.0 + F.lit(0.5))
         / 1000000.0).alias("skewness"),
        (F.floor((m4 / (m2 * m2) - 3) * 1000000.0 + F.lit(0.5))
         / 1000000.0).alias("excess_kurtosis"),
    ).orderBy("event_type")


@query(
    "q_agg_geo_harmonic",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      FROM events WHERE round(value * 100) >= 1
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pos,
           CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / COUNT(*)
             AS arith_mean_cents,
           floor(exp(CAST(SUM(CAST(ln(CAST(x AS DOUBLE))
                                   AS DECIMAL(38, 18))) AS DOUBLE)
                     / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0
             AS geo_mean_cents,
           floor(COUNT(*) / CAST(SUM(CAST(1.0 / x AS DECIMAL(38, 18)))
                                 AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS harm_mean_cents
    FROM c GROUP BY event_type ORDER BY event_type
    """,
    category="2.D",
)
def q_agg_geo_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pythagorean-mean profile per event type over positive cents —
    geometric (the right average for ratios/growth) and harmonic (the
    right average for rates), next to the arithmetic mean so AM >= GM >=
    HM is visible in one row. Law-18 discipline twice over: ln is
    transcendental (JVM vs libm last-ulp drift) so ln terms sum in
    DECIMAL(38,18) and the exp RESULT floor-rounds at 6dp; the harmonic
    denominator sums per-row 1/x doubles (identical IEEE divisions) in
    DECIMAL so order cannot matter. One hash-agg, bounded output."""
    e = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    c = e.select("event_type", x.alias("x")).where(F.col("x") >= 1)
    return (
        c.groupBy("event_type")
        .agg(
            F.count("*").alias("n_pos"),
            (F.sum("x").cast("double") / F.count("*"))
            .alias("arith_mean_cents"),
            (
                F.floor(
                    F.exp(
                        F.sum(
                            F.log(F.col("x").cast("double"))
                            .cast("decimal(38,18)")
                        ).cast("double")
                        / F.count("*")
                    )
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("geo_mean_cents"),
            (
                F.floor(
                    F.count("*")
                    / F.sum(
                        (F.lit(1.0) / F.col("x")).cast("decimal(38,18)")
                    ).cast("double")
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("harm_mean_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_chi2_indep",
    oracle="""
    WITH o AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS rt FROM o
          GROUP BY event_type),
    c AS (SELECT dow, CAST(SUM(obs) AS BIGINT) AS ct FROM o GROUP BY dow),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o),
    terms AS (
      SELECT o.obs, r.rt, c.ct, n.n,
             CAST(r.rt * c.ct AS DOUBLE) / n.n AS e
      FROM o JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           floor(CAST(SUM(CAST((obs - e) * (obs - e) / e
                   AS DECIMAL(38, 18))) AS DOUBLE)
                 * 100000000.0 + 0.5) / 100000000.0 AS chi2,
           CAST((SELECT COUNT(*) - 1 FROM r)
                * (SELECT COUNT(*) - 1 FROM c) AS BIGINT) AS dof
    FROM terms
    """,
    category="2.D",
)
def q_agg_chi2_indep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence, event_type x day-of-week — "does
    activity mix shift across the week?", the categorical-drift screen
    run before shipping a training batch. Expected counts e = r*c/n are
    ONE IEEE division of exact int64 products; the (o-e)^2/e terms are
    identical doubles on both engines, summed in DECIMAL(38,18) then
    floor-8dp (law 18 applies to the SUM order, not the terms). The
    contingency table collapses map-side to |types|x7 cells; row/col
    marginals and the scalar n are broadcast-sized."""
    e = load_table(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("obs"))
    r = o.groupBy("event_type").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("dow").agg(F.sum("obs").alias("ct"))
    n = o.agg(F.sum("obs").alias("n"))
    terms = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "e", (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
        )
    )
    dof = (
        r.crossJoin(c)
        .agg(
            (
                (F.count_distinct("event_type") - 1)
                * (F.count_distinct("dow") - 1)
            ).alias("dof")
        )
    )
    term = (F.col("obs") - F.col("e")) * (F.col("obs") - F.col("e")) / F.col("e")
    return (
        terms.agg(
            F.max("n").alias("n"),
            F.count("*").alias("n_cells"),
            (
                F.floor(
                    F.sum(term.cast("decimal(38,18)")).cast("double")
                    * 100000000.0
                    + F.lit(0.5)
                )
                / 100000000.0
            ).alias("chi2"),
        )
        .crossJoin(F.broadcast(dof))
        .select("n", "n_cells", "chi2", F.col("dof").cast("long").alias("dof"))
    )


@query(
    "q_agg_tukey_fences",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    hist AS (
      SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS m
      FROM c GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, cents, m,
             CAST(SUM(m) OVER (PARTITION BY event_type ORDER BY cents
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS hi_rn,
             CAST(SUM(m) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hist
    ),
    cuts AS (
      SELECT event_type, MAX(n) AS n,
             MAX(CASE WHEN (n + 3) // 4
                      BETWEEN hi_rn - m + 1 AND hi_rn
                      THEN cents END) AS q1,
             MAX(CASE WHEN (3 * n + 3) // 4
                      BETWEEN hi_rn - m + 1 AND hi_rn
                      THEN cents END) AS q3
      FROM ranked GROUP BY event_type
    )
    SELECT h.event_type, MAX(c.n) AS n,
           MAX(c.q1) AS q1_cents, MAX(c.q3) AS q3_cents,
           CAST(SUM(CASE WHEN 2 * h.cents < 5 * c.q1 - 3 * c.q3
                         THEN h.m ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN 2 * h.cents > 5 * c.q3 - 3 * c.q1
                         THEN h.m ELSE 0 END) AS BIGINT) AS n_high
    FROM hist h JOIN cuts c USING (event_type)
    GROUP BY h.event_type ORDER BY h.event_type
    """,
    category="2.D",
)
def q_agg_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's 1.5-IQR outlier fences per event type — the box-plot rule
    every data-quality report starts from. Quartiles are POSITION-based
    order statistics (rank ceil(n/4), ceil(3n/4)) picked from the
    (type, cents) HISTOGRAM — bounded by the value domain, never row
    grain (the q_agg_winsorize shape); the fences stay EXACT integers by
    doubling: x < q1 - 1.5 IQR  <=>  2x < 5 q1 - 3 q3. No float enters
    any comparison; outlier mass folds over histogram multiplicities."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    hist = base.groupBy("event_type", "cents").agg(F.count("*").alias("m"))
    wrank = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    ranked = hist.select(
        "event_type", "cents", "m",
        F.sum("m").over(wrank).alias("hi_rn"),
        F.sum("m").over(wall).alias("n"),
    )
    k1 = F.expr("(n + 3) div 4")
    k3 = F.expr("(3 * n + 3) div 4")
    lo_rn = F.col("hi_rn") - F.col("m") + 1
    cuts = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(k1.between(lo_rn, F.col("hi_rn")), F.col("cents"))
        ).alias("q1"),
        F.max(
            F.when(k3.between(lo_rn, F.col("hi_rn")), F.col("cents"))
        ).alias("q3"),
    )
    j = hist.join(F.broadcast(cuts), "event_type")
    low = 2 * F.col("cents") < 5 * F.col("q1") - 3 * F.col("q3")
    high = 2 * F.col("cents") > 5 * F.col("q3") - 3 * F.col("q1")
    return (
        j.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("q1").alias("q1_cents"),
            F.max("q3").alias("q3_cents"),
            F.sum(F.when(low, F.col("m")).otherwise(0)).alias("n_low"),
            F.sum(F.when(high, F.col("m")).otherwise(0)).alias("n_high"),
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_mann_whitney",
    oracle="""
    WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g2
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    hist AS (
      SELECT cents,
             CAST(SUM(g1) AS BIGINT) AS m1,
             CAST(SUM(g2) AS BIGINT) AS m2,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM c GROUP BY cents
    ),
    ranked AS (
      SELECT m1, m2, t,
             CAST(SUM(t) OVER (ORDER BY cents
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum
      FROM hist
    ),
    s AS (
      SELECT CAST(SUM(m1) AS BIGINT) AS n1,
             CAST(SUM(m2) AS BIGINT) AS n2,
             CAST(SUM(m1 + m2) AS BIGINT) AS nn,
             CAST(SUM(m1 * (2 * cum - t + 1)) AS BIGINT) AS r1x2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS ties
      FROM ranked
    )
    SELECT n1, n2,
           (r1x2 - n1 * (n1 + 1)) / 2.0 AS u1,
           (2 * n1 * n2 - r1x2 + n1 * (n1 + 1)) / 2.0 AS u2,
           floor(((r1x2 - n1 * (n1 + 1)) / 2.0
                  - CAST(n1 AS DOUBLE) * n2 / 2)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                        * ((nn + 1) - CAST(ties AS DOUBLE)
                                      / (CAST(nn AS DOUBLE) * (nn - 1))))
                 * 1000000.0 + 0.5) / 1000000.0 AS z
    FROM s
    """,
    category="2.D",
)
def q_agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test, purchase vs click values — the
    nonparametric two-sample drift test (the one to run when
    q_agg_skew_kurt says the distribution is nowhere near normal). Rank
    sums fold over the DISTINCT-cents histogram with tie-block midranks
    kept integral by doubling (2R1 = sum m1 (2 cum - t + 1)); U1/U2 are
    half-integer-exact; the tie-corrected normal z computes from exact
    int64 moments through one identical IEEE expression tree (sqrt is
    correctly rounded), floor-6dp. The running rank window is
    partition-less but runs over the DISTINCT VALUE GRID — bounded by
    the cents domain (<= 56k rows) regardless of data volume, the same
    boundedness argument as q_agg_ks_test (whitelisted in the plan
    audit)."""
    e = load_table(spark, sf_dir, "events")
    c = e.where(F.col("event_type").isin("purchase", "click")).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_type") == "purchase").cast("long").alias("g1"),
        (F.col("event_type") == "click").cast("long").alias("g2"),
    )
    hist = c.groupBy("cents").agg(
        F.sum("g1").alias("m1"),
        F.sum("g2").alias("m2"),
        F.count("*").alias("t"),
    )
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = hist.select(
        "m1", "m2", "t", F.sum("t").over(wcum).alias("cum")
    )
    s = ranked.agg(
        F.sum("m1").alias("n1"),
        F.sum("m2").alias("n2"),
        F.sum(F.col("m1") + F.col("m2")).alias("nn"),
        F.sum(
            F.col("m1") * (2 * F.col("cum") - F.col("t") + 1)
        ).alias("r1x2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("ties"),
    )
    u1 = (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)) / 2.0
    mu = F.col("n1").cast("double") * F.col("n2") / 2
    sig2 = (
        F.col("n1").cast("double") * F.col("n2") / 12
        * (
            (F.col("nn") + 1)
            - F.col("ties").cast("double")
            / (F.col("nn").cast("double") * (F.col("nn") - 1))
        )
    )
    return s.select(
        "n1",
        "n2",
        u1.alias("u1"),
        (
            (2 * F.col("n1") * F.col("n2") - F.col("r1x2")
             + F.col("n1") * (F.col("n1") + 1)) / 2.0
        ).alias("u2"),
        (
            F.floor((u1 - mu) / F.sqrt(sig2) * 1000000.0 + F.lit(0.5))
            / 1000000.0
        ).alias("z"),
    )


@query(
    "q_agg_spearman",
    oracle="""
    WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS x,
             CAST(hour(ts) AS BIGINT) AS y
      FROM events
    ),
    hx AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM c GROUP BY x
    ),
    rx AS (
      SELECT x, 2 * CAST(SUM(t) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - t + 1 AS r2
      FROM hx
    ),
    hy AS (
      SELECT y, CAST(COUNT(*) AS BIGINT) AS t FROM c GROUP BY y
    ),
    ry AS (
      SELECT y, 2 * CAST(SUM(t) OVER (ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - t + 1 AS r2
      FROM hy
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx.r2) AS BIGINT) AS sa,
             CAST(SUM(ry.r2) AS BIGINT) AS sb,
             CAST(SUM(rx.r2 * rx.r2) AS BIGINT) AS saa,
             CAST(SUM(ry.r2 * ry.r2) AS BIGINT) AS sbb,
             CAST(SUM(rx.r2 * ry.r2) AS BIGINT) AS sab
      FROM c JOIN rx USING (x) JOIN ry USING (y)
    )
    SELECT n,
           floor((CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
                 / sqrt((CAST(n AS DOUBLE) * saa
                         - CAST(sa AS DOUBLE) * sa)
                        * (CAST(n AS DOUBLE) * sbb
                           - CAST(sb AS DOUBLE) * sb))
                 * 1000000.0 + 0.5) / 1000000.0 AS spearman_rho
    FROM s
    """,
    category="2.D",
)
def q_agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and hour-of-day —
    the monotone-association twin of q_agg_corr_exact's Pearson (robust
    to the value tail, exactly what a diurnal-pattern screen wants).
    Ranks never materialize at row grain: midranks come from the two
    VALUE-DOMAIN histograms (cents grid <= 56k rows, hour grid = 24) as
    2*midrank = 2 cum - t + 1 (integral under ties), re-attached to rows
    by bounded hash joins; Pearson-on-ranks folds from five exact int64
    moments (every sum < 2^62 at any tested SF) through one IEEE tree,
    floor-6dp. The two rank windows run on bounded grids (whitelisted
    like q_agg_ks_test)."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.hour("ts").cast("long").alias("y"),
    )
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wy = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    rx = (
        c.groupBy("x").agg(F.count("*").alias("t"))
        .select("x", (2 * F.sum("t").over(wx) - F.col("t") + 1).alias("r2"))
    )
    ry = (
        c.groupBy("y").agg(F.count("*").alias("t"))
        .select("y", (2 * F.sum("t").over(wy) - F.col("t") + 1).alias("r2"))
    )
    j = (
        c.join(F.broadcast(rx), "x")
        .join(F.broadcast(ry.withColumnRenamed("r2", "r2y")), "y")
    )
    s = j.agg(
        F.count("*").alias("n"),
        F.sum("r2").alias("sa"),
        F.sum("r2y").alias("sb"),
        F.sum(F.col("r2") * F.col("r2")).alias("saa"),
        F.sum(F.col("r2y") * F.col("r2y")).alias("sbb"),
        F.sum(F.col("r2") * F.col("r2y")).alias("sab"),
    )
    nd = F.col("n").cast("double")
    sad, sbd = F.col("sa").cast("double"), F.col("sb").cast("double")
    rho = (nd * F.col("sab") - sad * F.col("sb")) / F.sqrt(
        (nd * F.col("saa") - sad * F.col("sa"))
        * (nd * F.col("sbb") - sbd * F.col("sb"))
    )
    return s.select(
        "n",
        (F.floor(rho * 1000000.0 + F.lit(0.5)) / 1000000.0).alias(
            "spearman_rho"
        ),
    )


@query(
    "q_agg_welch_t",
    oracle="""
    WITH s AS (
      SELECT
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT) END)
             AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN event_type = 'click'
                      THEN CAST(round(value * 100) AS BIGINT) END)
             AS BIGINT) AS s2,
        CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT) END
                      AS DECIMAL(38, 0)))
             AS DOUBLE) AS ss1,
        CAST(SUM(CAST(CASE WHEN event_type = 'click'
                      THEN CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT) END
                      AS DECIMAL(38, 0)))
             AS DOUBLE) AS ss2
      FROM events WHERE event_type IN ('purchase', 'click')
    )
    SELECT n1, n2,
           floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 / sqrt((CAST(ss1 AS DOUBLE) / n1
                         - (CAST(s1 AS DOUBLE) / n1)
                           * (CAST(s1 AS DOUBLE) / n1))
                        * n1 / (n1 - 1) / n1
                        + (CAST(ss2 AS DOUBLE) / n2
                           - (CAST(s2 AS DOUBLE) / n2)
                             * (CAST(s2 AS DOUBLE) / n2))
                          * n2 / (n2 - 1) / n2)
                 * 1000000.0 + 0.5) / 1000000.0 AS t,
           floor((((CAST(ss1 AS DOUBLE) / n1
                    - (CAST(s1 AS DOUBLE) / n1)
                      * (CAST(s1 AS DOUBLE) / n1)) * n1 / (n1 - 1) / n1)
                  + ((CAST(ss2 AS DOUBLE) / n2
                      - (CAST(s2 AS DOUBLE) / n2)
                        * (CAST(s2 AS DOUBLE) / n2)) * n2 / (n2 - 1) / n2))
                 * (((CAST(ss1 AS DOUBLE) / n1
                      - (CAST(s1 AS DOUBLE) / n1)
                        * (CAST(s1 AS DOUBLE) / n1)) * n1 / (n1 - 1) / n1)
                    + ((CAST(ss2 AS DOUBLE) / n2
                        - (CAST(s2 AS DOUBLE) / n2)
                          * (CAST(s2 AS DOUBLE) / n2)) * n2 / (n2 - 1) / n2))
                 / (((CAST(ss1 AS DOUBLE) / n1
                      - (CAST(s1 AS DOUBLE) / n1)
                        * (CAST(s1 AS DOUBLE) / n1)) * n1 / (n1 - 1) / n1)
                    * ((CAST(ss1 AS DOUBLE) / n1
                        - (CAST(s1 AS DOUBLE) / n1)
                          * (CAST(s1 AS DOUBLE) / n1)) * n1 / (n1 - 1) / n1)
                    / (n1 - 1)
                    + ((CAST(ss2 AS DOUBLE) / n2
                        - (CAST(s2 AS DOUBLE) / n2)
                          * (CAST(s2 AS DOUBLE) / n2)) * n2 / (n2 - 1) / n2)
                      * ((CAST(ss2 AS DOUBLE) / n2
                          - (CAST(s2 AS DOUBLE) / n2)
                            * (CAST(s2 AS DOUBLE) / n2)) * n2 / (n2 - 1)
                         / n2)
                      / (n2 - 1))
                 * 1000000.0 + 0.5) / 1000000.0 AS welch_df
    FROM s
    """,
    category="2.D",
)
def q_agg_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test, purchase vs click — the
    parametric twin of q_agg_mann_whitney (run both; agreement is the
    robustness signal). Six exact moments (counts/sums int64, squared
    sums DECIMAL(38,0) — the PMI overflow guard) come from ONE
    conditional-aggregation pass (no second scan, no join); the t
    statistic and Welch-Satterthwaite df evaluate as identical IEEE
    expression trees over those moments (sample variance written
    (ss/n - mean^2) * n/(n-1) to keep every intermediate a ratio of
    exact ints), floor-6dp. Scale: one map-side-combining agg, 1-row
    output — nothing else."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    is1 = F.col("event_type") == "purchase"
    is2 = F.col("event_type") == "click"
    s = e.where(F.col("event_type").isin("purchase", "click")).agg(
        F.sum(is1.cast("long")).alias("n1"),
        F.sum(is2.cast("long")).alias("n2"),
        F.sum(F.when(is1, cents)).alias("s1"),
        F.sum(F.when(is2, cents)).alias("s2"),
        # PMI-overflow class (r7 ADVICE): DECIMAL(38,0) accumulation,
        # one cast to double (ss only feeds the double Welch tree).
        F.sum(F.when(is1, cents * cents).cast("decimal(38,0)"))
        .cast("double").alias("ss1"),
        F.sum(F.when(is2, cents * cents).cast("decimal(38,0)"))
        .cast("double").alias("ss2"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    v1n = (
        (F.col("ss1").cast("double") / F.col("n1") - m1 * m1)
        * F.col("n1") / (F.col("n1") - 1) / F.col("n1")
    )
    v2n = (
        (F.col("ss2").cast("double") / F.col("n2") - m2 * m2)
        * F.col("n2") / (F.col("n2") - 1) / F.col("n2")
    )
    t = (m1 - m2) / F.sqrt(v1n + v2n)
    df = (v1n + v2n) * (v1n + v2n) / (
        v1n * v1n / (F.col("n1") - 1) + v2n * v2n / (F.col("n2") - 1)
    )
    return s.select(
        "n1",
        "n2",
        (F.floor(t * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("t"),
        (F.floor(df * 1000000.0 + F.lit(0.5)) / 1000000.0).alias(
            "welch_df"
        ),
    )


@query(
    "q_agg_bootstrap_ci",
    oracle="""
    WITH reps AS (SELECT unnest(range(0, 100)) AS r),
    w AS (
      SELECT reps.r,
             CAST(round(e.value * 100) AS BIGINT) AS cents,
             CASE WHEN (e.event_id * 2654435761 + reps.r * 40503)
                       % 1000003 % 10000 < 3679 THEN 0
                  WHEN (e.event_id * 2654435761 + reps.r * 40503)
                       % 1000003 % 10000 < 7358 THEN 1
                  WHEN (e.event_id * 2654435761 + reps.r * 40503)
                       % 1000003 % 10000 < 9197 THEN 2
                  WHEN (e.event_id * 2654435761 + reps.r * 40503)
                       % 1000003 % 10000 < 9810 THEN 3
                  WHEN (e.event_id * 2654435761 + reps.r * 40503)
                       % 1000003 % 10000 < 9963 THEN 4
                  WHEN (e.event_id * 2654435761 + reps.r * 40503)
                       % 1000003 % 10000 < 9994 THEN 5
                  ELSE 6 END AS wt
      FROM events e CROSS JOIN reps
    ),
    means AS (
      SELECT r,
             CAST(SUM(wt * cents) AS BIGINT) * 1.0
               / CAST(SUM(wt) AS BIGINT) AS m
      FROM w GROUP BY r
    ),
    pick AS (SELECT list_sort(list(m)) AS ms FROM means)
    SELECT (SELECT CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   * 1.0 / COUNT(*) FROM events) AS mean_cents,
           CAST(100 AS BIGINT) AS n_replicates,
           floor(ms[3] * 10000.0 + 0.5) / 10000.0 AS ci_lo,
           floor(ms[98] * 10000.0 + 0.5) / 10000.0 AS ci_hi
    FROM pick
    """,
    category="2.D",
)
def q_agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean event value — the
    resampling machinery production pipelines use when no closed form
    exists, made ENGINE-DETERMINISTIC: each (row, replicate) draws its
    Poisson(1) weight by pushing a Knuth hash through the fixed inverse-
    CDF thresholds (3679/7358/9197/9810/9963/9994 out of 10000 — Poisson
    masses as integer constants, so no RNG and no transcendentals at
    run time). This is exactly how a 100 TB bootstrap runs: the 100x
    replication happens in the MAP stage and collapses to 100 (replicate,
    sum, count) partials before any shuffle — never a materialized 100x
    copy. The 100 replicate means sort inside ONE array (bounded,
    sort_array + element_at picks ranks 3/98), so no window exists
    anywhere. Replicate means are exact int ratios; CI bounds floor-4dp."""
    e = load_table(spark, sf_dir, "events")
    reps = spark.range(0, 100).select(F.col("id").alias("r"))
    cents = F.round(F.col("value") * 100).cast("long")
    u = (
        (F.col("event_id") * F.lit(2654435761) + F.col("r") * F.lit(40503))
        % 1000003 % 10000
    )
    wt = (
        F.when(u < 3679, 0)
        .when(u < 7358, 1)
        .when(u < 9197, 2)
        .when(u < 9810, 3)
        .when(u < 9963, 4)
        .when(u < 9994, 5)
        .otherwise(6)
    )
    w = e.select("event_id", cents.alias("cents")).crossJoin(
        F.broadcast(reps)
    ).select("r", "cents", wt.alias("wt"))
    means = w.groupBy("r").agg(
        (
            F.sum(F.col("wt") * F.col("cents")) * 1.0 / F.sum("wt")
        ).alias("m")
    )
    pick = means.agg(F.sort_array(F.collect_list("m")).alias("ms"))
    base = e.agg(
        (F.sum(cents) * 1.0 / F.count("*")).alias("mean_cents")
    )
    return base.crossJoin(F.broadcast(pick)).select(
        "mean_cents",
        F.lit(100).cast("long").alias("n_replicates"),
        (
            F.floor(F.element_at("ms", 3) * 10000.0 + F.lit(0.5)) / 10000.0
        ).alias("ci_lo"),
        (
            F.floor(F.element_at("ms", 98) * 10000.0 + F.lit(0.5)) / 10000.0
        ).alias("ci_hi"),
    )


@query(
    "q_agg_median_of_means",
    oracle="""
    WITH b AS (
      SELECT (event_id * 2654435761) % 1000003 % 16 AS bucket,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    means AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) * 1.0 / COUNT(*) AS m
      FROM b GROUP BY bucket
    ),
    pick AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             list_sort(list(m)) AS ms,
             CAST(SUM(n) AS BIGINT) AS n_total
      FROM means
    )
    SELECT n_total, k AS n_buckets,
           floor((ms[CAST((k + 1) // 2 AS INTEGER)]
                  + ms[CAST(k // 2 + 1 AS INTEGER)]) / 2.0
                 * 10000.0 + 0.5) / 10000.0 AS mom_cents,
           (SELECT CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   * 1.0 / COUNT(*) FROM events) AS plain_mean_cents
    FROM pick
    """,
    category="2.D",
)
def q_agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means estimator — the heavy-tail-robust mean (the
    estimator of choice when a metric's variance is unbounded and a
    handful of outliers poison the plain mean): rows scatter into 16
    DETERMINISTIC hash buckets (Knuth hash of event_id — reproducible,
    unlike round-robin), each bucket's exact-int mean is computed
    map-side, and the median of the 16 means is a positional pick from
    ONE sorted bounded array (even-k: average the two central means).
    No window, no row-grain sort; the plain mean rides along for the
    robustness diff. Floor-4dp."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    b = e.select(
        ((F.col("event_id") * 2654435761) % 1000003 % 16).alias("bucket"),
        cents.alias("cents"),
    )
    means = b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        (F.sum("cents") * 1.0 / F.count("*")).alias("m"),
    )
    pick = means.agg(
        F.count("*").alias("k"),
        F.sort_array(F.collect_list("m")).alias("ms"),
        F.sum("n").alias("n_total"),
    )
    plain = e.agg(
        (F.sum(cents) * 1.0 / F.count("*")).alias("plain_mean_cents")
    )
    lo = F.element_at("ms", F.expr("cast((k + 1) div 2 as int)"))
    hi = F.element_at("ms", F.expr("cast(k div 2 + 1 as int)"))
    return pick.crossJoin(F.broadcast(plain)).select(
        "n_total",
        F.col("k").alias("n_buckets"),
        (
            F.floor((lo + hi) / 2.0 * 10000.0 + F.lit(0.5)) / 10000.0
        ).alias("mom_cents"),
        "plain_mean_cents",
    )


@query(
    "q_anon_tcloseness",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment AS seg,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    support AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS cg
      FROM c GROUP BY cents
    ),
    gcum AS (
      SELECT cents,
             CAST(SUM(cg) OVER (ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS c_cum
      FROM support
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(cg) AS BIGINT) AS n
      FROM support
    ),
    segs AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS ng FROM c GROUP BY seg
    ),
    gcnt AS (
      SELECT seg, cents, CAST(COUNT(*) AS BIGINT) AS k
      FROM c GROUP BY seg, cents
    ),
    grid AS (
      SELECT s.seg, g.cents, g.c_cum, s.ng,
             CAST(SUM(COALESCE(gc.k, 0)) OVER (
               PARTITION BY s.seg ORDER BY g.cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS g_cum
      FROM segs s
      CROSS JOIN gcum g
      LEFT JOIN gcnt gc ON gc.seg = s.seg AND gc.cents = g.cents
    )
    SELECT grid.seg, MAX(grid.ng) AS n_rows,
           floor(CAST(SUM(CAST(
                   abs(g_cum * t.n - c_cum * ng)
                   * 1.0 / (ng * t.n)
                 AS DECIMAL(38, 18))) AS DOUBLE) / (MAX(t.m) - 1)
                 * 1000000.0 + 0.5) / 1000000.0 AS t_closeness
    FROM grid CROSS JOIN tot t
    GROUP BY grid.seg ORDER BY grid.seg
    """,
    category="2.D",
)
def q_anon_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li et al. 2007) — the third rung of the anonymity
    ladder after q_anon_kanonymity and q_anon_ldiversity: per market
    segment, the Earth Mover's Distance between the group's account-
    balance distribution and the global one (ordered numeric ground
    distance, so 1-D EMD = mean |cumulative difference| over the
    support). Every cumulative is an exact int64 count on the
    VALUE-DOMAIN support grid (bounded by distinct cents, not rows);
    the per-support term |g_cum*N - C_cum*ng|/(ng*N) is one identical
    IEEE expression, DECIMAL-summed, /(m-1), floor-6dp. The global
    cum window runs on the bounded support grid (whitelisted like
    ks_test); the per-group cum partitions by the 5 segments over that
    same grid."""
    cst = load_table(spark, sf_dir, "customer")
    c = cst.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    support = c.groupBy("cents").agg(F.count("*").alias("cg"))
    wglob = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    glob = support.select(
        "cents", F.sum("cg").over(wglob).alias("c_cum")
    )
    tot = support.agg(
        F.count("*").alias("m"), F.sum("cg").alias("n")
    )
    segs = c.groupBy("seg").agg(F.count("*").alias("ng"))
    gcnt = c.groupBy("seg", "cents").agg(F.count("*").alias("k"))
    wseg = Window.partitionBy("seg").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    grid = (
        F.broadcast(segs)
        .crossJoin(glob)
        .join(gcnt, ["seg", "cents"], "left")
        .select(
            "seg", "cents", "c_cum", "ng",
            F.sum(F.coalesce(F.col("k"), F.lit(0)))
            .over(wseg).alias("g_cum"),
        )
    )
    term = (
        F.abs(F.col("g_cum") * F.col("n") - F.col("c_cum") * F.col("ng"))
        * F.lit(1.0)
        / (F.col("ng") * F.col("n"))
    )
    return (
        grid.crossJoin(F.broadcast(tot))
        .groupBy("seg")
        .agg(
            F.max("ng").alias("n_rows"),
            (
                F.floor(
                    F.sum(term.cast("decimal(38,18)")).cast("double")
                    / (F.max("m") - 1)
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("t_closeness"),
        )
        .orderBy("seg")
    )


@query(
    "q_anon_dp_counts",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, true_count,
             (ascii(substring(event_type, 1, 1)) * 31
              + length(event_type)) * 2654435761 % 1000003 % 10000 AS h
      FROM c
    )
    SELECT event_type, true_count,
           CAST(CASE WHEN h < 4624 THEN 0
                WHEN h < 6325 THEN 1   WHEN h < 8026 THEN -1
                WHEN h < 8652 THEN 2   WHEN h < 9278 THEN -2
                WHEN h < 9508 THEN 3   WHEN h < 9738 THEN -3
                WHEN h < 9823 THEN 4   WHEN h < 9908 THEN -4
                WHEN h < 9939 THEN 5   WHEN h < 9970 THEN -5
                WHEN h < 9985 THEN 6   ELSE -6 END AS BIGINT) AS noise,
           CAST(true_count + CASE WHEN h < 4624 THEN 0
                WHEN h < 6325 THEN 1   WHEN h < 8026 THEN -1
                WHEN h < 8652 THEN 2   WHEN h < 9278 THEN -2
                WHEN h < 9508 THEN 3   WHEN h < 9738 THEN -3
                WHEN h < 9823 THEN 4   WHEN h < 9908 THEN -4
                WHEN h < 9939 THEN 5   WHEN h < 9970 THEN -5
                WHEN h < 9985 THEN 6   ELSE -6 END AS BIGINT)
             AS noisy_count
    FROM u ORDER BY event_type
    """,
    category="2.D",
)
def q_anon_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private counts via the discrete Laplace (two-sided
    geometric) mechanism at epsilon=1 — the fourth rung of the privacy
    ladder (k-anon -> l-div -> t-close -> DP release). The noise draw is
    a hash of the group key pushed through FIXED inverse-CDF thresholds
    (the geometric masses of e^-1, precomputed to 4dp as integer
    constants — the q_agg_bootstrap_ci trick), making the release
    REPLAYABLE for this verification harness; a production release
    swaps the hash for a real RNG, everything else unchanged. Counts
    exact; the mechanism is one map over the |types|-row aggregate."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("event_type").agg(F.count("*").alias("true_count"))
    h = (
        (
            F.ascii(F.substring("event_type", 1, 1)) * 31
            + F.length("event_type")
        ).cast("long")
        * 2654435761
        % 1000003
        % 10000
    )
    noise = (
        F.when(h < 4624, 0)
        .when(h < 6325, 1).when(h < 8026, -1)
        .when(h < 8652, 2).when(h < 9278, -2)
        .when(h < 9508, 3).when(h < 9738, -3)
        .when(h < 9823, 4).when(h < 9908, -4)
        .when(h < 9939, 5).when(h < 9970, -5)
        .when(h < 9985, 6).otherwise(-6)
    ).cast("long")
    return c.select(
        "event_type",
        "true_count",
        noise.alias("noise"),
        (F.col("true_count") + noise).alias("noisy_count"),
    ).orderBy("event_type")


@query(
    "q_agg_runs_test",
    oracle="""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    hist AS (
      SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS m
      FROM c GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, cents, m,
             CAST(SUM(m) OVER (PARTITION BY event_type ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS hi_rn,
             CAST(SUM(m) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hist
    ),
    med AS (
      SELECT event_type,
             MAX(CASE WHEN (n + 1) // 2
                      BETWEEN hi_rn - m + 1 AND hi_rn
                      THEN cents END) AS median_cents
      FROM ranked GROUP BY event_type
    ),
    signs AS (
      SELECT c.event_type,
             CASE WHEN c.cents > md.median_cents THEN 1 ELSE 0 END AS s,
             lag(CASE WHEN c.cents > md.median_cents THEN 1 ELSE 0 END)
               OVER (PARTITION BY c.event_type ORDER BY c.ts, c.event_id)
               AS prev_s
      FROM c JOIN med md USING (event_type)
    ),
    agg AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN prev_s IS NULL
                           OR s <> prev_s THEN 1 ELSE 0 END) AS BIGINT)
               AS runs,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2
      FROM signs GROUP BY event_type
    )
    SELECT event_type, runs, n1, n2,
           floor((runs - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE))
                           * (n1 + n2) * (n1 + n2 - 1)))
                 * 1000000.0 + 0.5) / 1000000.0 AS z
    FROM agg ORDER BY event_type
    """,
    category="2.D",
)
def q_agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event type — "are above/below-median
    values randomly interleaved in time, or do they clump?" (the
    randomness check that catches serial correlation a mean/variance
    profile never sees). The median is a positional histogram pick
    (winsorize discipline); run boundaries count via lag on the
    time-ordered stream; the normal z evaluates one identical IEEE
    tree over exact int64 (runs, n1, n2), floor-6dp. One value-domain
    histogram + one (type)-keyed window + bounded agg."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    hist = c.groupBy("event_type", "cents").agg(F.count("*").alias("m"))
    wrank = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    ranked = hist.select(
        "event_type", "cents", "m",
        F.sum("m").over(wrank).alias("hi_rn"),
        F.sum("m").over(wall).alias("n"),
    )
    kmed = F.expr("(n + 1) div 2")
    lo_rn = F.col("hi_rn") - F.col("m") + 1
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(kmed.between(lo_rn, F.col("hi_rn")), F.col("cents"))
        ).alias("median_cents")
    )
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = (F.col("cents") > F.col("median_cents")).cast("int")
    signs = c.join(F.broadcast(med), "event_type").select(
        "event_type",
        s.alias("s"),
        F.lag(s).over(wt).alias("prev_s"),
    )
    agg = signs.groupBy("event_type").agg(
        F.sum(
            F.when(
                F.col("prev_s").isNull()
                | (F.col("s") != F.col("prev_s")),
                1,
            ).otherwise(0)
        ).alias("runs"),
        F.sum("s").alias("n1"),
        F.sum(1 - F.col("s")).alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    mu = 2.0 * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")) + 1
    var = (
        2.0 * F.col("n1") * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
        / (
            (n1d + F.col("n2"))
            * (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2") - 1)
        )
    )
    z = (F.col("runs") - mu) / F.sqrt(var)
    return agg.select(
        "event_type", "runs", "n1", "n2",
        (F.floor(z * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("z"),
    ).orderBy("event_type")


@query(
    "q_agg_quantile_normalization",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    th AS (
      SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS m
      FROM c GROUP BY 1, 2
    ),
    tr AS (
      SELECT event_type, cents, m,
             CAST(SUM(m) OVER (PARTITION BY event_type ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS hi_rn,
             CAST(SUM(m) OVER (PARTITION BY event_type) AS BIGINT) AS nt
      FROM th
    ),
    ph AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS m FROM c GROUP BY cents
    ),
    pr AS (
      SELECT cents AS pcents,
             CAST(SUM(m) OVER (ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) - m + 1 AS lo_rn
      FROM ph
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    u AS (
      SELECT lo_rn AS key, 1 AS is_block, pcents,
             NULL::VARCHAR AS event_type, NULL::BIGINT AS cents,
             NULL::BIGINT AS m
      FROM pr
      UNION ALL
      SELECT (tr.hi_rn * n.n + tr.nt - 1) // tr.nt AS key, 0, NULL,
             tr.event_type, tr.cents, tr.m
      FROM tr CROSS JOIN n
    ),
    f AS (
      SELECT event_type, cents, m, is_block,
             last_value(pcents IGNORE NULLS) OVER (
               ORDER BY key, is_block DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS norm_cents
      FROM u
    )
    SELECT event_type, cents, CAST(m AS BIGINT) AS m,
           CAST(norm_cents AS BIGINT) AS norm_cents
    FROM f WHERE is_block = 0
    ORDER BY event_type, cents
    """,
    category="2.D",
)
def q_agg_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization — map every event value to the POOLED
    distribution's value at the same within-type quantile (the
    bioinformatics/feature-prep transform that makes heterogeneous
    channels comparable without assuming any parametric form). Entirely
    on value-domain histograms: within-type tie-block rank r maps to
    pooled rank k = ceil(r*N/n_t) (exact int ceiling division), and the
    pooled VALUE at rank k resolves by a LOCF merge — pooled block
    starts and lookup keys union into ONE bounded sorted stream
    (blocks sort first at equal key) and last_value(ignore nulls)
    carries the covering block's value. No per-row join, no range
    join, no data-scaled sort: every relation is bounded by the cents
    domain (whitelisted windows, ks_test argument). Output at
    (type, cents) grain with multiplicities."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    th = c.groupBy("event_type", "cents").agg(F.count("*").alias("m"))
    wtr = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    tr = th.select(
        "event_type", "cents", "m",
        F.sum("m").over(wtr).alias("hi_rn"),
        F.sum("m").over(wall).alias("nt"),
    )
    ph = c.groupBy("cents").agg(F.count("*").alias("m"))
    wpr = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pr = ph.select(
        F.col("cents").alias("pcents"),
        (F.sum("m").over(wpr) - F.col("m") + 1).alias("lo_rn"),
    )
    n = c.agg(F.count("*").alias("n"))
    blocks = pr.select(
        F.col("lo_rn").alias("key"),
        F.lit(1).alias("is_block"),
        "pcents",
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("long").alias("cents"),
        F.lit(None).cast("long").alias("m"),
    )
    lookups = tr.crossJoin(F.broadcast(n)).select(
        F.expr("(hi_rn * n + nt - 1) div nt").alias("key"),
        F.lit(0).alias("is_block"),
        F.lit(None).cast("long").alias("pcents"),
        "event_type",
        "cents",
        "m",
    )
    u = blocks.unionByName(lookups)
    wl = Window.orderBy("key", F.desc("is_block")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    f = u.select(
        "event_type", "cents", "m", "is_block",
        F.last("pcents", ignorenulls=True).over(wl).alias("norm_cents"),
    )
    return (
        f.where(F.col("is_block") == 0)
        .select("event_type", "cents", "m", "norm_cents")
        .orderBy("event_type", "cents")
    )


@query(
    "q_agg_pchart",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS errs
      FROM events GROUP BY 1
    ),
    pooled AS (
      SELECT CAST(SUM(n) AS BIGINT) AS tot,
             CAST(SUM(errs) AS BIGINT) AS terr
      FROM daily
    )
    SELECT d.day, d.n, d.errs,
           floor(CAST(d.errs AS DOUBLE) / d.n * 1000000.0 + 0.5)
             / 1000000.0 AS p,
           floor((CAST(p.terr AS DOUBLE) / p.tot
                  + 3 * sqrt(CAST(p.terr AS DOUBLE) / p.tot
                             * (1 - CAST(p.terr AS DOUBLE) / p.tot)
                             / d.n))
                 * 1000000.0 + 0.5) / 1000000.0 AS ucl,
           CAST(CASE WHEN CAST(d.errs AS DOUBLE) / d.n
                     > CAST(p.terr AS DOUBLE) / p.tot
                       + 3 * sqrt(CAST(p.terr AS DOUBLE) / p.tot
                                  * (1 - CAST(p.terr AS DOUBLE) / p.tot)
                                  / d.n)
                THEN 1 ELSE 0 END AS INTEGER) AS out_of_control
    FROM daily d CROSS JOIN pooled p
    ORDER BY d.day
    """,
    category="2.D",
)
def q_agg_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart (attribute control chart, Shewhart SPC): daily error
    PROPORTION against the 3-sigma binomial upper control limit
    p-bar + 3 sqrt(p-bar (1-p-bar)/n_t) — the ops-dashboard primitive
    that separates common-cause noise from a real incident, with
    per-day limits that correctly widen on low-traffic days. All
    inputs exact int64; the limit and the flag evaluate the same IEEE
    tree on both engines (sqrt correctly rounded); displayed ratios
    floor-6dp. One daily rollup + one broadcast pooled scalar."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("timestamp").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("event_type") == "error").cast("long")
        ).alias("errs"),
    )
    pooled = daily.agg(
        F.sum("n").alias("tot"), F.sum("errs").alias("terr")
    )
    pbar = F.col("terr").cast("double") / F.col("tot")
    ucl = pbar + 3 * F.sqrt(pbar * (1 - pbar) / F.col("n"))
    pt = F.col("errs").cast("double") / F.col("n")
    return (
        daily.crossJoin(F.broadcast(pooled))
        .select(
            "day", "n", "errs",
            (F.floor(pt * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("p"),
            (F.floor(ucl * 1000000.0 + F.lit(0.5)) / 1000000.0).alias(
                "ucl"
            ),
            (pt > ucl).cast("int").alias("out_of_control"),
        )
        .orderBy("day")
    )


@query(
    "q_agg_theil_decomp",
    oracle="""
    WITH x AS (
      SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    h AS (
      SELECT event_type, cnt, CAST(COUNT(*) AS BIGINT) AS m
      FROM x GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type,
             CAST(SUM(m) AS BIGINT) AS ng,
             CAST(SUM(m * cnt) AS BIGINT) AS sg
      FROM h GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s
      FROM g
    ),
    t_tot AS (
      SELECT CAST(SUM(CAST(
               m * cnt * ln(CAST(cnt AS DOUBLE) * t.n / t.s)
             AS DECIMAL(38, 18))) AS DOUBLE) / MAX(t.s) AS v
      FROM h CROSS JOIN tot t
    ),
    t_win AS (
      SELECT CAST(SUM(CAST(
               m * cnt * ln(CAST(cnt AS DOUBLE) * g.ng / g.sg)
             AS DECIMAL(38, 18))) AS DOUBLE) / MAX(t.s) AS v
      FROM h JOIN g USING (event_type) CROSS JOIN tot t
    ),
    t_btw AS (
      SELECT CAST(SUM(CAST(
               g.sg * ln(CAST(g.sg AS DOUBLE) * t.n
                         / (CAST(t.s AS DOUBLE) * g.ng))
             AS DECIMAL(38, 18))) AS DOUBLE) / MAX(t.s) AS v
      FROM g CROSS JOIN tot t
    )
    SELECT t.n AS n_cells, t.s AS total_events,
           floor(t_tot.v * 100000000.0 + 0.5) / 100000000.0
             AS theil_total,
           floor(t_win.v * 100000000.0 + 0.5) / 100000000.0
             AS theil_within,
           floor(t_btw.v * 100000000.0 + 0.5) / 100000000.0
             AS theil_between
    FROM tot t CROSS JOIN t_tot CROSS JOIN t_win CROSS JOIN t_btw
    """,
    category="2.D",
)
def q_agg_theil_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil decomposition — the property Theil T has and Gini lacks:
    T_total = T_within + T_between EXACTLY, splitting activity
    inequality across (type,user) cells into "inequality among users
    inside each event type" vs "inequality between the types
    themselves". All three terms fold from the (type, count) HISTOGRAM
    with tie-block multiplicities (nothing ranks at cell grain); every
    ln takes a ratio of exact int64 products, terms sum in
    DECIMAL(38,18), floor-8dp (law 18). The additive identity holds to
    the rounding digit — a built-in self-check the oracle enforces on
    both engines."""
    e = load_table(spark, sf_dir, "events")
    x = e.groupBy("event_type", "user_id").agg(F.count("*").alias("cnt"))
    h = x.groupBy("event_type", "cnt").agg(F.count("*").alias("m"))
    g = h.groupBy("event_type").agg(
        F.sum("m").alias("ng"),
        F.sum(F.col("m") * F.col("cnt")).alias("sg"),
    )
    tot = g.agg(F.sum("ng").alias("n"), F.sum("sg").alias("s"))

    def dsum8(df, term):
        return (
            df.agg(
                (
                    F.sum(term.cast("decimal(38,18)")).cast("double")
                    / F.max("s")
                ).alias("v")
            )
        )

    ht = h.crossJoin(F.broadcast(tot))
    t_tot = dsum8(
        ht,
        F.col("m") * F.col("cnt")
        * F.log(F.col("cnt").cast("double") * F.col("n") / F.col("s")),
    )
    hg = h.join(F.broadcast(g), "event_type").crossJoin(F.broadcast(tot))
    t_win = dsum8(
        hg,
        F.col("m") * F.col("cnt")
        * F.log(F.col("cnt").cast("double") * F.col("ng") / F.col("sg")),
    )
    gt = g.crossJoin(F.broadcast(tot))
    t_btw = dsum8(
        gt,
        F.col("sg")
        * F.log(
            F.col("sg").cast("double") * F.col("n")
            / (F.col("s").cast("double") * F.col("ng"))
        ),
    )
    r8 = lambda c: F.floor(c * 100000000.0 + F.lit(0.5)) / 100000000.0
    return (
        tot.crossJoin(F.broadcast(t_tot.withColumnRenamed("v", "vt")))
        .crossJoin(F.broadcast(t_win.withColumnRenamed("v", "vw")))
        .crossJoin(F.broadcast(t_btw.withColumnRenamed("v", "vb")))
        .select(
            F.col("n").alias("n_cells"),
            F.col("s").alias("total_events"),
            r8(F.col("vt")).alias("theil_total"),
            r8(F.col("vw")).alias("theil_within"),
            r8(F.col("vb")).alias("theil_between"),
        )
    )


_CM_PAIRS = [
    ("qty", "disc"), ("qty", "tax"), ("qty", "dom"),
    ("disc", "tax"), ("disc", "dom"), ("tax", "dom"),
]


def _corr_matrix_oracle() -> str:
    arms = []
    for x, y in _CM_PAIRS:
        arms.append(f"""
      SELECT '{x}' AS x_name, '{y}' AS y_name, n,
             floor((n * s_{x}_{y} - s_{x} * s_{y})
                   / sqrt(CAST(n * s_{x}_{x} - s_{x} * s_{x} AS DOUBLE)
                          * CAST(n * s_{y}_{y} - s_{y} * s_{y} AS DOUBLE))
                   * 1000000 + 0.5) / 1000000 AS r
      FROM m""")
    sums = []
    meas = {
        "qty": "CAST(l_quantity AS BIGINT)",
        "disc": "CAST(round(l_discount * 1000) AS BIGINT)",
        "tax": "CAST(round(l_tax * 1000) AS BIGINT)",
        "dom": "CAST(date_part('day', l_shipdate) AS BIGINT)",
    }
    for k, e in meas.items():
        sums.append(f"SUM({e}) AS s_{k}")
        sums.append(f"SUM(({e}) * ({e})) AS s_{k}_{k}")
    for x, y in _CM_PAIRS:
        sums.append(f"SUM(({meas[x]}) * ({meas[y]})) AS s_{x}_{y}")
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, {", ".join(sums)}
      FROM lineitem
    )
    SELECT * FROM ({" UNION ALL ".join(arms)})
    ORDER BY x_name, y_name
    """


@query("q_agg_corr_matrix", oracle=_corr_matrix_oracle(), category="2.D")
def q_agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation MATRIX of four lineitem measures
    (quantity, discount mils, tax mils, ship day-of-month) in ONE scan:
    15 exact int64 moments (n, four sums, four sum-of-squares, six
    cross-products) accumulate in a single hash-agg pass — the
    q_agg_corr_exact discipline widened from one pair to the full
    matrix without extra scans. Every measure lives on a small integer
    grid (max 1000), so worst-case n·Sxy ≈ 6e5·(1000·1000·6e5) ≈ 4e17
    < 2^63 at sf0.1 with headroom; at 100 TB the moments move to
    DECIMAL(38), same single-pass shape. Each r is one fixed IEEE
    expression over identical integers, floor-6dp; the pair unpivot is
    a 6-element inline array explode of the one moments row — no
    joins, no second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    meas = {
        "qty": F.col("l_quantity").cast("bigint"),
        "disc": F.round(F.col("l_discount") * 1000).cast("bigint"),
        "tax": F.round(F.col("l_tax") * 1000).cast("bigint"),
        "dom": F.dayofmonth("l_shipdate").cast("bigint"),
    }
    aggs = [F.count("*").alias("n")]
    for k, e in meas.items():
        aggs.append(F.sum(e).alias(f"s_{k}"))
        aggs.append(F.sum(e * e).alias(f"s_{k}_{k}"))
    for x, y in _CM_PAIRS:
        aggs.append(F.sum(meas[x] * meas[y]).alias(f"s_{x}_{y}"))
    m = li.agg(*aggs)

    def r_expr(x: str, y: str):
        n = F.col("n")
        num = n * F.col(f"s_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        dx = (n * F.col(f"s_{x}_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}"))
        dy = (n * F.col(f"s_{y}_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}"))
        r = num / F.sqrt(dx.cast("double") * dy.cast("double"))
        return F.floor(r * 1000000 + F.lit(0.5)) / 1000000.0

    pairs = F.array(
        *[
            F.struct(
                F.lit(x).alias("x_name"),
                F.lit(y).alias("y_name"),
                F.col("n").alias("n"),
                r_expr(x, y).alias("r"),
            )
            for x, y in _CM_PAIRS
        ]
    )
    return (
        m.select(F.explode(pairs).alias("p"))
        .select("p.x_name", "p.y_name", "p.n", "p.r")
        .orderBy("x_name", "y_name")
    )


_GEN_K = 5


@query(
    "q_anon_generalization",
    oracle=f"""
    WITH l0 AS (
      SELECT CAST(c_nationkey AS VARCHAR) AS q1, c_mktsegment AS q2
      FROM customer
    ),
    l1 AS (
      SELECT CAST(n.n_regionkey AS VARCHAR) AS q1, c.c_mktsegment AS q2
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    l2 AS (
      SELECT CAST(n.n_regionkey AS VARCHAR) AS q1, '*' AS q2
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    rep AS (
      SELECT 0 AS level, q1, q2, COUNT(*) AS n FROM l0 GROUP BY q1, q2
      UNION ALL
      SELECT 1, q1, q2, COUNT(*) FROM l1 GROUP BY q1, q2
      UNION ALL
      SELECT 2, q1, q2, COUNT(*) FROM l2 GROUP BY q1, q2
    )
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < {_GEN_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(SUM(CASE WHEN n < {_GEN_K} THEN n ELSE 0 END) AS BIGINT)
             AS n_exposed_rows
    FROM rep
    GROUP BY level
    ORDER BY level
    """,
    category="2.D",
)
def q_anon_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier GENERALIZATION ladder — the anonymization move
    q_anon_kanonymity (which only reports) stops short of: walk a fixed
    domain hierarchy (nation → region → any; segment → any) and report,
    per generalization level, how many quasi-identifier groups remain,
    how many still violate k={k}, and how many rows those violations
    expose. The publisher picks the first level with zero exposure —
    the ladder makes the utility-vs-privacy tradeoff a table instead
    of a guess. All integer counts; the hierarchy step is a broadcast
    dim join (nation is 25 rows), each level one hash agg — three
    bounded-domain aggs and a 3-level rollup, shuffle volume capped by
    the QI domain, not the table.""".format(k=_GEN_K)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    cr = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    levels = [
        c.select(
            F.col("c_nationkey").cast("string").alias("q1"),
            F.col("c_mktsegment").alias("q2"),
        ).withColumn("level", F.lit(0)),
        cr.select(
            F.col("n_regionkey").cast("string").alias("q1"),
            F.col("c_mktsegment").alias("q2"),
        ).withColumn("level", F.lit(1)),
        cr.select(
            F.col("n_regionkey").cast("string").alias("q1"),
            F.lit("*").alias("q2"),
        ).withColumn("level", F.lit(2)),
    ]
    rep = levels[0].unionAll(levels[1]).unionAll(levels[2]).groupBy(
        "level", "q1", "q2"
    ).agg(F.count("*").alias("n"))
    k = F.lit(_GEN_K)
    return (
        rep.groupBy("level")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum((F.col("n") < k).cast("bigint")).alias("n_violating"),
            F.sum(
                F.when(F.col("n") < k, F.col("n")).otherwise(0)
            ).alias("n_exposed_rows"),
        )
        .orderBy("level")
    )


@query(
    "q_profile_psi_drift",
    oracle="""
    WITH ref AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY event_type
    ),
    cur AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY event_type
    ),
    tot AS (SELECT (SELECT SUM(n) FROM ref) AS rt,
                   (SELECT SUM(n) FROM cur) AS ct)
    SELECT ref.event_type,
           ref.n AS n_ref, cur.n AS n_cur,
           floor((CAST(cur.n AS DOUBLE) / ct - CAST(ref.n AS DOUBLE) / rt)
                 * ln((CAST(cur.n AS DOUBLE) / ct)
                      / (CAST(ref.n AS DOUBLE) / rt))
                 * 100000000.0 + 0.5) / 100000000.0 AS psi_term
    FROM ref JOIN cur USING (event_type) CROSS JOIN tot
    ORDER BY event_type
    """,
    category="2.D",
)
def q_profile_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the drift monitor every production
    scoring pipeline runs between a reference window and the current
    one: psi_term = (p_cur − p_ref) · ln(p_cur / p_ref) per category,
    summed for the drift verdict (>0.2 = retrain). Computed here over
    the event_type mix of the first vs second half-month. Two
    category-sized aggregates joined with two broadcast scalar totals —
    the whole monitor is one pass per window regardless of data volume,
    and at 100 TB the windows are partition-pruned date ranges of the
    same table. Shares and the log are evaluated in one fixed-shape
    IEEE expression (int64 counts in, round-half-up at 1e-8 — the repo
    float-emission convention; every category is present in both halves
    at every test SF, so no zero-share epsilon is needed and the oracle
    pins that too)."""
    e = load_table(spark, sf_dir, "events")
    cut = "2024-01-16 00:00:00"
    ref = (
        e.where(F.col("ts") < cut)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_ref"))
    )
    cur = (
        e.where(F.col("ts") >= cut)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_cur"))
    )
    joined = (
        ref.join(cur, "event_type")
        .crossJoin(
            F.broadcast(ref.agg(F.sum("n_ref").alias("rt")))
        )
        .crossJoin(
            F.broadcast(cur.agg(F.sum("n_cur").alias("ct")))
        )
    )
    p_ref = F.col("n_ref").cast("double") / F.col("rt")
    p_cur = F.col("n_cur").cast("double") / F.col("ct")
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return joined.select(
        "event_type",
        "n_ref",
        "n_cur",
        (F.floor(term * 100000000.0 + F.lit(0.5)) / 100000000.0)
        .alias("psi_term"),
    ).orderBy("event_type")


@query(
    "q_profile_constraint_audit",
    oracle="""
    SELECT 'orders_pk_unique' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_failed
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_not_null', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_fk_customer', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'orders_totalprice_le_500k', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice > 500000.0 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'events_pk_unique', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_value_in_band', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN value < 0.0 OR value > 450.0 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM events
    ORDER BY rule
    """,
    category="2.D",
)
def q_profile_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the dbt-test / Deequ pattern as
    one query): six constraints over two tables — primary-key
    uniqueness, NOT NULL, referential integrity (FK orphans via a
    broadcast left join's null count, never a per-row subquery), and
    two business-band expectations — each reported as (rule, n_checked,
    n_failed). The integrity rules pin ZERO failures (the corpus is
    clean and the audit proves it); the band expectations genuinely
    fire (totalprice > 500k and value > 450 rows exist at every SF), so
    a silently broken counter cannot hide in an all-zero report. Costs
    ONE aggregate pass per table plus one broadcast join — the audit a
    100 TB lake runs after every load, scaling with table count, not
    rule count. Uniqueness is counted as count − distinct inside the
    same pass (no self-join); every count is exact int64."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    e = load_table(spark, sf_dir, "events")
    n = F.count("*").cast("long")
    orders_rules = o.agg(
        n.alias("n_checked"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("long").alias("orders_pk_unique"),
        F.sum(F.col("o_custkey").isNull().cast("long"))
        .cast("long").alias("orders_custkey_not_null"),
        F.sum((F.col("o_totalprice") > 500000.0).cast("long"))
        .cast("long").alias("orders_totalprice_le_500k"),
    )
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .agg(
            n.alias("n_checked"),
            F.sum(F.col("c_custkey").isNull().cast("long"))
            .cast("long").alias("n_failed"),
        )
        .select(F.lit("orders_fk_customer").alias("rule"),
                "n_checked", "n_failed")
    )
    events_rules = e.agg(
        n.alias("n_checked"),
        (F.count("*") - F.countDistinct("event_id"))
        .cast("long").alias("events_pk_unique"),
        F.sum(((F.col("value") < 0.0) | (F.col("value") > 450.0))
              .cast("long")).cast("long").alias("events_value_in_band"),
    )

    def unpivot(agg_df: DataFrame, rules: list[str]) -> DataFrame:
        pairs = ", ".join(f"'{r}', {r}" for r in rules)
        return agg_df.selectExpr(
            f"stack({len(rules)}, {pairs}) AS (rule, n_failed)",
            "n_checked",
        ).select("rule", "n_checked", "n_failed")

    return (
        unpivot(orders_rules, [
            "orders_pk_unique",
            "orders_custkey_not_null",
            "orders_totalprice_le_500k",
        ])
        .unionByName(orphans)
        .unionByName(unpivot(events_rules, [
            "events_pk_unique", "events_value_in_band",
        ]))
        .orderBy("rule")
    )


@query(
    "q_agg_fdr_bh",
    oracle="""
    WITH cohorts AS (
        SELECT user_id % 20 AS cohort,
               CAST(COUNT(*) AS BIGINT) AS n_c,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s_c
        FROM events GROUP BY 1
    ),
    gstats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s_g,
               CAST(SUM(CAST(CAST(round(value * 100) AS BIGINT)
                             * CAST(round(value * 100) AS BIGINT)
                             AS DECIMAL(38, 0))) AS DOUBLE)
                   AS ss_g
        FROM events
    ),
    z AS (
        SELECT cohort, n_c,
               (s_c * 1.0 / n_c - s_g * 1.0 / n_g)
               / sqrt(((ss_g * 1.0 / n_g
                        - (s_g * 1.0 / n_g) * (s_g * 1.0 / n_g))
                       * n_g / (n_g - 1)) / n_c) AS zstat
        FROM cohorts CROSS JOIN gstats
    ),
    p AS (
        SELECT cohort, n_c, zstat, abs(zstat) / sqrt(2.0) AS x
        FROM z
    ),
    praw AS (
        SELECT cohort, n_c, zstat,
               (((((1.061405429 * (1.0 / (1.0 + 0.3275911 * x))
                    - 1.453152027) * (1.0 / (1.0 + 0.3275911 * x))
                   + 1.421413741) * (1.0 / (1.0 + 0.3275911 * x))
                  - 0.284496736) * (1.0 / (1.0 + 0.3275911 * x))
                 + 0.254829592) * (1.0 / (1.0 + 0.3275911 * x)))
               * exp(-x * x) AS pval
        FROM p
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER
                   (ORDER BY abs(zstat) DESC, cohort) AS rnk
        FROM praw
    ),
    adj AS (
        SELECT *, MIN(pval * 20.0 / rnk) OVER
                   (ORDER BY rnk DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cmin
        FROM ranked
    )
    SELECT cohort, n_c, CAST(rnk AS BIGINT) AS rnk,
           floor(pval * 1000000.0 + 0.5) / 1000000.0 AS pval,
           floor(least(cmin, 1.0) * 1000000.0 + 0.5) / 1000000.0 AS p_adj,
           floor(least(cmin, 1.0) * 1000000.0 + 0.5) / 1000000.0 <= 0.05
               AS reject_q05
    FROM adj
    ORDER BY cohort
    """,
    category="2.D",
)
def q_agg_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG FDR correction — the multiple-testing control
    every metrics platform needs the moment it tests 20 cohorts at
    once (at alpha=.05, one of 20 null cohorts "wins" by chance): each
    user cohort's mean spend gets a two-sided z-test against the
    global mean (p via the Abramowitz-Stegun 7.1.26 erfc polynomial —
    an explicit expression tree both engines evaluate identically; no
    library CDF), then the BH step-up adjustment p_adj(i) =
    min_{j>=i} p(j)*k/j as ONE reverse-cumulative-min window. The
    panel math follows the house moment discipline: exact int64 cents
    sums feed identical IEEE formulas, ranks order by |z| (pure
    div/sqrt, correctly rounded IEEE, engine-exact) rather than by the
    transcendental p, so rank assignment is immune to cross-engine
    exp() ulps, and only the final p columns round (floor-6dp). Scale:
    one map-side-combining pass over the fact gives 20 cohort rows +
    1 global row; the BH window runs on the k=20 HYPOTHESIS PANEL,
    not the data — single-partition by design and bounded by the
    number of tests (thousands at most), the standard shape for
    experiment-platform sweeps at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    cohorts = e.groupBy((F.col("user_id") % 20).alias("cohort")).agg(
        F.count("*").cast("long").alias("n_c"),
        F.sum(cents).cast("long").alias("s_c"),
    )
    glob = e.agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(cents).cast("long").alias("s_g"),
        # PMI-overflow class (r7 ADVICE): the corpus-wide sum of squared
        # cents accumulates in DECIMAL(38,0) (exact, order-free), then
        # ONE cast to double — int64 wraps silently in non-ANSI Spark
        # while DuckDB raises, a latent cross-engine divergence at
        # large SF. Per-row cents^2 stays int64-safe (value domain
        # < 2^31 cents).
        F.sum((cents * cents).cast("decimal(38,0)"))
        .cast("double").alias("ss_g"),
    )
    m_g = F.col("s_g").cast("double") / F.col("n_g")
    v_g = (
        (F.col("ss_g").cast("double") / F.col("n_g") - m_g * m_g)
        * F.col("n_g") / (F.col("n_g") - 1)
    )
    zstat = (
        (F.col("s_c").cast("double") / F.col("n_c") - m_g)
        / F.sqrt(v_g / F.col("n_c"))
    )
    t = 1.0 / (1.0 + 0.3275911 * F.col("x"))
    pval = (
        ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
          - 0.284496736) * t + 0.254829592) * t
        * F.exp(-F.col("x") * F.col("x"))
    )
    w_rank = Window.orderBy(F.abs(F.col("zstat")).desc(), "cohort")
    w_cmin = Window.orderBy(F.col("rnk").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cohorts.crossJoin(F.broadcast(glob))
        .select("cohort", "n_c", zstat.alias("zstat"))
        .withColumn("x", F.abs(F.col("zstat")) / F.sqrt(F.lit(2.0)))
        .withColumn("pval", pval)
        .withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .withColumn(
            "cmin",
            F.min(F.col("pval") * 20.0 / F.col("rnk")).over(w_cmin),
        )
        .select(
            "cohort",
            "n_c",
            "rnk",
            (F.floor(F.col("pval") * 1000000.0 + 0.5) / 1000000.0)
            .alias("pval"),
            (F.floor(F.least(F.col("cmin"), F.lit(1.0)) * 1000000.0
                     + 0.5) / 1000000.0).alias("p_adj"),
            # Compare the ROUNDED p_adj (r7 ADVICE): cmin derives from
            # exp(), which is not correctly-rounded IEEE, so a value a
            # ulp from 0.05 could flip the boolean on one engine only;
            # the floor-6dp columns absorb those ulps — the boolean
            # must read the same rounded value.
            (F.floor(F.least(F.col("cmin"), F.lit(1.0)) * 1000000.0
                     + 0.5) / 1000000.0 <= 0.05)
            .alias("reject_q05"),
        )
        .orderBy("cohort")
    )


@query(
    "q_agg_hodges_lehmann",
    oracle="""
    WITH panel AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER
                   (PARTITION BY event_type ORDER BY event_id) AS i
        FROM events
        QUALIFY i <= 60
    ),
    walsh AS (
        SELECT a.event_type, a.cents + b.cents AS s2
        FROM panel a JOIN panel b
          ON a.event_type = b.event_type AND a.i <= b.i
    ),
    ranked AS (
        SELECT event_type, s2,
               ROW_NUMBER() OVER
                   (PARTITION BY event_type ORDER BY s2) AS rnk
        FROM walsh
    )
    SELECT event_type,
           CAST(1830 AS BIGINT) AS n_pairs,
           (MAX(CASE WHEN rnk = 915 THEN s2 END)
            + MAX(CASE WHEN rnk = 916 THEN s2 END)) / 4.0 AS hl_cents
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
    category="2.D",
)
def q_agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HODGES-LEHMANN location estimator — the rank-based robust mean
    (median of all pairwise Walsh averages (x_i+x_j)/2, i<=j) that
    pairs with q_agg_mann_whitney the way the mean pairs with the
    t-test: ~29% outlier breakdown, yet fully efficient under
    symmetry, the estimator a metrics platform quotes when spend
    distributions have heavy tails. Pair space is PANEL-BOUNDED (the
    house Theil-Sen discipline): the first 60 events per type by
    event_id give exactly 60*61/2 = 1830 Walsh pairs per type — the
    O(n^2) lives on a fixed panel, never the corpus, and fans out as
    an equi-join on event_type with per-task work bounded by the
    panel, not the data. Exactness: pairs carry the INTEGER sum
    a+b (never the halved float), the median picks positions 915/916
    of the sorted integer multiset via row_number (no engine
    percentile semantics anywhere), and the only division — by 4.0,
    averaging the two central Walsh averages — is a power of two,
    IEEE-exact. At full scale the same shape runs per user segment:
    thousands of independent 1830-pair panels, one shuffle on the
    panel key."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    panel = (
        e.select(
            "event_type",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("i", F.row_number().over(w))
        .where(F.col("i") <= 60)
        .select("event_type", "cents", "i")
    )
    a = panel.alias("a")
    b = panel.alias("b")
    walsh = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.i") <= F.col("b.i")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("a.cents") + F.col("b.cents")).alias("s2"),
    )
    w_rank = Window.partitionBy("event_type").orderBy("s2")
    return (
        walsh.withColumn("rnk", F.row_number().over(w_rank))
        .groupBy("event_type")
        .agg(
            F.lit(1830).cast("long").alias("n_pairs"),
            (
                (
                    F.max(F.when(F.col("rnk") == 915, F.col("s2")))
                    + F.max(F.when(F.col("rnk") == 916, F.col("s2")))
                ) / 4.0
            ).alias("hl_cents"),
        )
        .orderBy("event_type")
    )


_BF_TYPES = ("click", "error", "purchase", "signup", "view")


def _bf_oracle() -> str:
    """Brown-Forsythe oracle: per-type lower discrete medians via
    row_number (no engine percentile semantics), absolute deviations
    as exact int64, and the final W assembled from the five types'
    integer moments in FIXED alphabetical order — the same expression
    tree the Spark side evaluates, so the float sums associate
    identically."""
    ssb = " + ".join(
        f"(n_{t} * (s_{t} * 1.0 / n_{t} - s_all * 1.0 / n_all)"
        f" * (s_{t} * 1.0 / n_{t} - s_all * 1.0 / n_all))"
        for t in _BF_TYPES
    )
    ssw = " + ".join(
        f"(zz_{t} - s_{t} * 1.0 * s_{t} / n_{t})" for t in _BF_TYPES
    )
    moments = ", ".join(
        f"MAX(CASE WHEN event_type = '{t}' THEN n END) AS n_{t}, "
        f"MAX(CASE WHEN event_type = '{t}' THEN s END) AS s_{t}, "
        f"MAX(CASE WHEN event_type = '{t}' THEN zz END) AS zz_{t}"
        for t in _BF_TYPES
    )
    return f"""
    WITH obs AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER
                   (PARTITION BY event_type ORDER BY
                    CAST(round(value * 100) AS BIGINT)) AS rnk,
               COUNT(*) OVER (PARTITION BY event_type) AS n_t
        FROM events
    ),
    med AS (
        SELECT event_type, CAST(MAX(CASE WHEN rnk = (n_t + 1) // 2
                                    THEN cents END) AS BIGINT) AS med
        FROM obs GROUP BY event_type
    ),
    dev AS (
        SELECT o.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(abs(o.cents - m.med)) AS BIGINT) AS s,
               CAST(SUM(CAST(abs(o.cents - m.med)
                             * abs(o.cents - m.med)
                             AS DECIMAL(38, 0))) AS DOUBLE) AS zz
        FROM obs o JOIN med m ON o.event_type = m.event_type
        GROUP BY o.event_type
    ),
    wide AS (
        SELECT {moments},
               CAST(SUM(n) AS BIGINT) AS n_all,
               CAST(SUM(s) AS BIGINT) AS s_all
        FROM dev
    )
    SELECT CAST(n_all AS BIGINT) AS n_obs,
           CAST(5 AS BIGINT) AS k_groups,
           floor((n_all - 5) * 1.0 / 4.0 * ({ssb}) / ({ssw})
                 * 1000000.0 + 0.5) / 1000000.0 AS bf_w
    FROM wide
    """


@query("q_agg_levene_bf", oracle=_bf_oracle(), category="2.D")
def q_agg_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEVENE / BROWN-FORSYTHE variance-homogeneity test — the guard
    every pooled-variance method in the repo (Welch aside: classic
    t, ANOVA q_ts_anova_hod, pooled CIs) silently assumes: a one-way
    ANOVA on the absolute deviations Z_ij = |y_ij - median_i|, whose
    W statistic blows up exactly when group spreads differ. The
    median-centered (Brown-Forsythe) variant is the robust standard.
    Engine-exactness discipline: group medians are LOWER DISCRETE
    medians picked by row_number position (n+1)//2 on the sorted
    int64 cents (no percentile builtin, no interpolation), deviations
    accumulate as exact int64 and their squares in exact DECIMAL(38,0)
    (one cast to double — the PMI overflow guard), and W's float
    expression references the FIVE KNOWN GROUPS as pivoted columns in
    fixed alphabetical order — a literal expression tree, not a
    float SUM whose association order the shuffle owns (the corr-
    matrix single-scan discipline). Scale: one window pass for
    medians (per-group sort, the shuffle key is the group), one join
    + agg for moments, 1-row output; group count is the bounded
    panel, never the corpus."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    obs = e.select("event_type", cents.alias("cents"))
    w_rnk = Window.partitionBy("event_type").orderBy("cents")
    w_n = Window.partitionBy("event_type")
    med = (
        obs.withColumn("rnk", F.row_number().over(w_rnk))
        .withColumn("n_t", F.count("*").over(w_n))
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(
                    F.col("rnk") == F.expr("(n_t + 1) div 2"),
                    F.col("cents"),
                )
            ).cast("long").alias("med")
        )
    )
    z = F.abs(F.col("cents") - F.col("med"))
    dev = (
        obs.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(z).cast("long").alias("s"),
            # PMI-overflow class (r7 ADVICE): squared-deviation sums
            # accumulate in DECIMAL(38,0), one cast to double — int64
            # wraps silently in non-ANSI Spark at large SF while
            # DuckDB raises. Per-row z^2 stays int64-safe.
            F.sum((z * z).cast("decimal(38,0)")).cast("double")
            .alias("zz"),
        )
    )
    aggs = [F.sum("n").cast("long").alias("n_all"),
            F.sum("s").cast("long").alias("s_all")]
    for t in _BF_TYPES:
        is_t = F.col("event_type") == t
        aggs += [
            F.max(F.when(is_t, F.col("n"))).alias(f"n_{t}"),
            F.max(F.when(is_t, F.col("s"))).alias(f"s_{t}"),
            F.max(F.when(is_t, F.col("zz"))).alias(f"zz_{t}"),
        ]
    wide = dev.agg(*aggs)
    mean_all = F.col("s_all") * 1.0 / F.col("n_all")
    ssb = None
    ssw = None
    for t in _BF_TYPES:
        d = F.col(f"s_{t}") * 1.0 / F.col(f"n_{t}") - mean_all
        term_b = F.col(f"n_{t}") * d * d
        term_w = (
            F.col(f"zz_{t}")
            - F.col(f"s_{t}") * 1.0 * F.col(f"s_{t}") / F.col(f"n_{t}")
        )
        ssb = term_b if ssb is None else ssb + term_b
        ssw = term_w if ssw is None else ssw + term_w
    bf_w = (F.col("n_all") - 5) * 1.0 / 4.0 * ssb / ssw
    return wide.select(
        F.col("n_all").alias("n_obs"),
        F.lit(5).cast("long").alias("k_groups"),
        (F.floor(bf_w * 1000000.0 + 0.5) / 1000000.0).alias("bf_w"),
    )


@query(
    "q_agg_cramers_v",
    oracle="""
    WITH o AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS rt FROM o
          GROUP BY event_type),
    c AS (SELECT dow, CAST(SUM(obs) AS BIGINT) AS ct FROM o GROUP BY dow),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o),
    terms AS (
      SELECT o.obs, n.n, CAST(r.rt * c.ct AS DOUBLE) / n.n AS e
      FROM o JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
    ),
    chi AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(CAST((obs - e) * (obs - e) / e
                     AS DECIMAL(38, 18))) AS DOUBLE) AS chi2,
             CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS r_k,
             CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS c_k
      FROM terms
    )
    SELECT n, r_k, c_k,
           floor(sqrt((chi2 / n) / least(r_k - 1, c_k - 1))
                 * 1000000.0 + 0.5) / 1000000.0 AS v,
           floor(sqrt(greatest(chi2 / n
                               - (r_k - 1.0) * (c_k - 1.0) / (n - 1),
                               0.0)
                      / least(r_k - (r_k - 1.0) * (r_k - 1.0) / (n - 1)
                              - 1.0,
                              c_k - (c_k - 1.0) * (c_k - 1.0) / (n - 1)
                              - 1.0))
                 * 1000000.0 + 0.5) / 1000000.0 AS v_corrected
    FROM chi
    """,
    category="2.D",
)
def q_agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMER'S V effect size — the missing half of the chi-square
    screen: q_agg_chi2_indep reports the TEST statistic, which at
    100 TB is always 'significant' (any drift is detectable at n =
    billions); V = sqrt(phi2 / min(r-1, c-1)) is the SIZE of the
    association on [0, 1], the number a drift monitor actually
    thresholds. Reported both plain and with the Bergsma-Warrens
    bias correction (phi2, r, c each shrunk by their (k-1)-style
    small-sample terms, clamped at 0) — the corrected form is what
    makes V comparable ACROSS tables of different shapes, the
    cross-dataset use a curation dashboard needs. Same exact
    machinery as the chi2 rung: int64 contingency cells, e as one
    IEEE division of exact products, terms DECIMAL(38,18)-summed (the
    order law applies to the SUM, not the terms), then V as one fixed
    expression tree, floor-6dp. One map-side contingency collapse +
    broadcast marginals — nothing scales with the corpus but the
    first agg."""
    e = load_table(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("obs"))
    r = o.groupBy("event_type").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("dow").agg(F.sum("obs").alias("ct"))
    n = o.agg(F.sum("obs").cast("long").alias("n"))
    rk = r.agg(F.count("*").cast("long").alias("r_k"))
    ck = c.agg(F.count("*").cast("long").alias("c_k"))
    terms = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "e", (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
        )
    )
    term = (
        (F.col("obs") - F.col("e"))
        * (F.col("obs") - F.col("e"))
        / F.col("e")
    )
    chi = (
        terms.agg(
            F.max("n").alias("n"),
            F.sum(term.cast("decimal(38,18)")).cast("double")
            .alias("chi2"),
        )
        .crossJoin(F.broadcast(rk))
        .crossJoin(F.broadcast(ck))
    )
    nn = F.col("n")
    r_k, c_k = F.col("r_k"), F.col("c_k")
    phi2 = F.col("chi2") / nn
    v = F.sqrt(phi2 / F.least(r_k - 1, c_k - 1))
    phi2c = F.greatest(
        phi2 - (r_k - 1.0) * (c_k - 1.0) / (nn - 1), F.lit(0.0)
    )
    vc = F.sqrt(
        phi2c
        / F.least(
            r_k - (r_k - 1.0) * (r_k - 1.0) / (nn - 1) - 1.0,
            c_k - (c_k - 1.0) * (c_k - 1.0) / (nn - 1) - 1.0,
        )
    )
    return chi.select(
        "n",
        "r_k",
        "c_k",
        (F.floor(v * 1000000.0 + 0.5) / 1000000.0).alias("v"),
        (F.floor(vc * 1000000.0 + 0.5) / 1000000.0)
        .alias("v_corrected"),
    )


@query(
    "q_agg_mcnemar",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'click' AND value > 300.0
                        THEN 1 ELSE 0 END) AS a,
               MAX(CASE WHEN event_type = 'purchase' AND value > 300.0
                        THEN 1 ELSE 0 END) AS p
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN a = 1 AND p = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN a = 0 AND p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
        FROM u
    )
    SELECT n_users, b, c,
           floor((b - c) * 1.0 * (b - c) / (b + c)
                 * 1000000.0 + 0.5) / 1000000.0 AS mcnemar,
           floor((abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c)
                 * 1000000.0 + 0.5) / 1000000.0 AS mcnemar_cc
    FROM cells
    """,
    category="2.D",
)
def q_agg_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST — the PAIRED-proportions member the two-sample
    suite (welch_t, mann_whitney: independent groups) lacks: same
    users, two binary outcomes (ever high-value-clicked vs ever
    high-value-purchased; the >300 threshold keeps the flags off the
    ceiling — unthresholded, every user trips both and the discordant
    cells are empty at every SF), and the question is marginal
    homogeneity — does the rate differ ON THE SAME POPULATION? Only
    the DISCORDANT cells carry information: b = clicked-never-
    purchased, c = purchased-never-clicked, chi2 = (b-c)^2/(b+c), reported with
    and without the Edwards continuity correction. The paired design
    removes between-user variance — the same reason CUPED (which
    needs a continuous covariate) wins; this is its binary-outcome
    sibling. Exactness: per-user flags collapse in one hash agg (MAX
    of indicators — associative, partitioning-immune), the 2x2
    discordant cells are exact int64, both statistics single IEEE
    trees floor-6dp. Scale: one shuffle on user_id, 1-row output —
    and the user-level flag frame is the same shape every funnel
    rung already builds."""
    e = load_table(spark, sf_dir, "events")
    hi = F.col("value") > 300.0
    u = e.groupBy("user_id").agg(
        F.max(((F.col("event_type") == "click") & hi).cast("int"))
        .alias("a"),
        F.max(((F.col("event_type") == "purchase") & hi).cast("int"))
        .alias("p"),
    )
    cells = u.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(((F.col("a") == 1) & (F.col("p") == 0)).cast("long"))
        .cast("long").alias("b"),
        F.sum(((F.col("a") == 0) & (F.col("p") == 1)).cast("long"))
        .cast("long").alias("c"),
    )
    b, c = F.col("b"), F.col("c")
    stat = (b - c) * 1.0 * (b - c) / (b + c)
    cc = (F.abs(b - c) - 1.0) * (F.abs(b - c) - 1.0) / (b + c)
    return cells.select(
        "n_users",
        "b",
        "c",
        (F.floor(stat * 1000000.0 + 0.5) / 1000000.0).alias("mcnemar"),
        (F.floor(cc * 1000000.0 + 0.5) / 1000000.0).alias("mcnemar_cc"),
    )


@query(
    "q_agg_anova2_unweighted",
    oracle="""
    WITH cells AS (
        SELECT dayofweek(ts) + 1 AS a, hour(ts) // 6 AS b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s,
               CAST(SUM(CAST(CAST(round(value * 100) AS BIGINT)
                             * CAST(round(value * 100) AS BIGINT)
                             AS DECIMAL(38, 0))) AS DOUBLE)
                   AS ss
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT a, b, n, s, ss, s * 1.0 / n AS mean
        FROM cells
    ),
    rows_ AS (
        SELECT a, CAST(SUM(CAST(mean AS DECIMAL(38, 18))) AS DOUBLE)
                  / 4.0 AS m_a
        FROM m GROUP BY a
    ),
    cols_ AS (
        SELECT b, CAST(SUM(CAST(mean AS DECIMAL(38, 18))) AS DOUBLE)
                  / 7.0 AS m_b
        FROM m GROUP BY b
    ),
    grand AS (
        SELECT CAST(SUM(CAST(mean AS DECIMAL(38, 18))) AS DOUBLE)
                   / 28.0 AS gm,
               28.0 / CAST(SUM(CAST(1.0 / n AS DECIMAL(38, 18)))
                           AS DOUBLE) AS n_h,
               CAST(SUM(n) AS BIGINT) AS n_obs,
               CAST(SUM(CAST(ss - s * 1.0 * s / n AS DECIMAL(38, 18)))
                    AS DOUBLE) AS ss_w
        FROM m
    ),
    parts AS (
        SELECT g.n_obs, g.n_h, g.ss_w,
               g.n_h * 4.0 * (
                   SELECT CAST(SUM(CAST((m_a - g.gm) * (m_a - g.gm)
                                        AS DECIMAL(38, 18))) AS DOUBLE)
                   FROM rows_) AS ss_a,
               g.n_h * 7.0 * (
                   SELECT CAST(SUM(CAST((m_b - g.gm) * (m_b - g.gm)
                                        AS DECIMAL(38, 18))) AS DOUBLE)
                   FROM cols_) AS ss_b,
               g.n_h * (
                   SELECT CAST(SUM(CAST(
                       (c.mean - r.m_a - c2.m_b + g.gm)
                       * (c.mean - r.m_a - c2.m_b + g.gm)
                       AS DECIMAL(38, 18))) AS DOUBLE)
                   FROM m c
                   JOIN rows_ r ON c.a = r.a
                   JOIN cols_ c2 ON c.b = c2.b) AS ss_ab
        FROM grand g
    )
    SELECT n_obs,
           floor(n_h * 1000000.0 + 0.5) / 1000000.0 AS n_h,
           floor(ss_a * 100.0 + 0.5) / 100.0 AS ss_a,
           floor(ss_b * 100.0 + 0.5) / 100.0 AS ss_b,
           floor(ss_ab * 100.0 + 0.5) / 100.0 AS ss_ab,
           floor(ss_w * 100.0 + 0.5) / 100.0 AS ss_w,
           floor((ss_a / 6.0) / (ss_w / (n_obs - 28))
                 * 1000000.0 + 0.5) / 1000000.0 AS f_a,
           floor((ss_b / 3.0) / (ss_w / (n_obs - 28))
                 * 1000000.0 + 0.5) / 1000000.0 AS f_b,
           floor((ss_ab / 18.0) / (ss_w / (n_obs - 28))
                 * 1000000.0 + 0.5) / 1000000.0 AS f_ab
    FROM parts
    """,
    category="2.D",
)
def q_agg_anova2_unweighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-WAY ANOVA with interaction (day-of-week x hour-band,
    unweighted-means analysis) — the factorial extension of
    q_ts_anova_hod's one-way screen: does the weekly pattern DIFFER
    by time of day (the interaction F), beyond the two main effects?
    Cell counts are unbalanced in observational data, so the classic
    unweighted-means analysis applies: every SS is computed over CELL
    MEANS with the harmonic mean n_h of cell counts as the effective
    replication — the standard factorial screen a metrics warehouse
    runs on activity data. Exactness discipline: per-cell (n, s) are
    exact int64 and ss exact DECIMAL(38,0) (the PMI overflow guard)
    from ONE scan; every mean is a deterministic
    double; every SUM over cells/rows/cols wraps its deterministic
    double terms in DECIMAL(38,18) (exact decimal addition — the
    chi2 rule: the order law applies to the SUM, not the terms); F
    ratios are single fixed trees, floor-6dp (SS floor-2dp — they
    are O(1e10) cents^2 magnitudes). The 28-cell panel is the
    calendar, never the corpus: one map-side agg, then arithmetic on
    28 rows."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    cells = e.groupBy(
        F.dayofweek("ts").alias("a"),
        (F.hour("ts") / 6).cast("int").alias("b"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s"),
        # PMI-overflow class (r7 ADVICE): per-cell sum of squared cents
        # in DECIMAL(38,0), one cast to double (ss only ever feeds the
        # double ss_w tree) — int64 wraps silently at large SF.
        F.sum((cents * cents).cast("decimal(38,0)")).cast("double")
        .alias("ss"),
    )
    m = cells.withColumn("mean", F.col("s") * 1.0 / F.col("n"))
    dec = lambda c: c.cast("decimal(38,18)")  # noqa: E731
    rows_ = m.groupBy("a").agg(
        (F.sum(dec(F.col("mean"))).cast("double") / 4.0).alias("m_a")
    )
    cols_ = m.groupBy("b").agg(
        (F.sum(dec(F.col("mean"))).cast("double") / 7.0).alias("m_b")
    )
    grand = m.agg(
        (F.sum(dec(F.col("mean"))).cast("double") / 28.0).alias("gm"),
        (28.0 / F.sum(dec(F.lit(1.0) / F.col("n"))).cast("double"))
        .alias("n_h"),
        F.sum("n").cast("long").alias("n_obs"),
        F.sum(
            dec(F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("n"))
        ).cast("double").alias("ss_w"),
    )
    ga = grand.alias("g")
    dev_a = (
        rows_.crossJoin(F.broadcast(ga))
        .agg(
            F.sum(
                dec(
                    (F.col("m_a") - F.col("gm"))
                    * (F.col("m_a") - F.col("gm"))
                )
            ).cast("double").alias("dev_a")
        )
    )
    dev_b = (
        cols_.crossJoin(F.broadcast(ga))
        .agg(
            F.sum(
                dec(
                    (F.col("m_b") - F.col("gm"))
                    * (F.col("m_b") - F.col("gm"))
                )
            ).cast("double").alias("dev_b")
        )
    )
    dev_ab = (
        m.join(F.broadcast(rows_), "a")
        .join(F.broadcast(cols_), "b")
        .crossJoin(F.broadcast(ga))
        .agg(
            F.sum(
                dec(
                    (F.col("mean") - F.col("m_a") - F.col("m_b")
                     + F.col("gm"))
                    * (F.col("mean") - F.col("m_a") - F.col("m_b")
                       + F.col("gm"))
                )
            ).cast("double").alias("dev_ab")
        )
    )
    wide = (
        grand.crossJoin(F.broadcast(dev_a))
        .crossJoin(F.broadcast(dev_b))
        .crossJoin(F.broadcast(dev_ab))
    )
    ss_a = F.col("n_h") * 4.0 * F.col("dev_a")
    ss_b = F.col("n_h") * 7.0 * F.col("dev_b")
    ss_ab = F.col("n_h") * F.col("dev_ab")
    msw = F.col("ss_w") / (F.col("n_obs") - 28)
    f2 = lambda c: F.floor(c * 100.0 + 0.5) / 100.0  # noqa: E731
    f6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return wide.select(
        "n_obs",
        f6(F.col("n_h")).alias("n_h"),
        f2(ss_a).alias("ss_a"),
        f2(ss_b).alias("ss_b"),
        f2(ss_ab).alias("ss_ab"),
        f2(F.col("ss_w")).alias("ss_w"),
        f6((ss_a / 6.0) / msw).alias("f_a"),
        f6((ss_b / 3.0) / msw).alias("f_b"),
        f6((ss_ab / 18.0) / msw).alias("f_ab"),
    )


@query(
    "q_agg_tost_equivalence",
    oracle="""
    WITH obs AS (
        SELECT event_type, user_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    grp AS (
        SELECT 'purchase_vs_click' AS comparison,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS g,
               cents
        FROM obs
        UNION ALL
        SELECT 'purchase_even_vs_odd',
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 2 END,
               cents
        FROM obs WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT comparison,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
               CAST(SUM(CASE WHEN g = 1 THEN cents END) AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN g = 2 THEN cents END) AS BIGINT) AS s2,
               CAST(SUM(CAST(CASE WHEN g = 1 THEN cents * cents END
                             AS DECIMAL(38, 0))) AS DOUBLE) AS ss1,
               CAST(SUM(CAST(CASE WHEN g = 2 THEN cents * cents END
                             AS DECIMAL(38, 0))) AS DOUBLE) AS ss2
        FROM grp GROUP BY comparison
    ),
    t AS (
        SELECT comparison, n1, n2,
               CASE WHEN comparison = 'purchase_vs_click'
                    THEN 50.0 ELSE 1000.0 END AS d,
               s1 * 1.0 / n1 - s2 * 1.0 / n2 AS diff,
               sqrt((ss1 * 1.0 / n1 - (s1 * 1.0 / n1) * (s1 * 1.0 / n1))
                    * n1 / (n1 - 1) / n1
                    + (ss2 * 1.0 / n2 - (s2 * 1.0 / n2) * (s2 * 1.0 / n2))
                      * n2 / (n2 - 1) / n2) AS se
        FROM m
    )
    SELECT comparison, n1, n2,
           floor(diff * 10000.0 + 0.5) / 10000.0 AS diff_cents,
           floor((diff + d) / se * 1000000.0 + 0.5) / 1000000.0
               AS t_lower,
           floor((diff - d) / se * 1000000.0 + 0.5) / 1000000.0
               AS t_upper,
           (diff + d) / se > 1.6448536269514722
               AND (diff - d) / se < -1.6448536269514722
               AS equivalent_z90
    FROM t
    ORDER BY comparison
    """,
    category="2.D",
)
def q_agg_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST EQUIVALENCE TEST (two one-sided tests, metric-specific
    margins)
    — the inferential DIRECTION the difference tests can't give: a
    non-significant Welch t never certifies 'no worse than'; TOST
    does, by requiring the difference to be significantly ABOVE -d
    AND significantly BELOW +d — the test behind every ship/no-ship
    'parity' launch review. Two comparisons so neither verdict is
    vacuous on this corpus: purchase-vs-click under a 50-cent margin
    (the mean gap reads ~-264 cents at sf0.01 and ~-72 at sf0.1 —
    always OUTSIDE 50, so NOT equivalent at every SF however tight
    se gets) and an A/A split
    of purchases by user parity under a 1000-cent margin (gap is
    sampling noise, inside -> equivalent once n gives se the power);
    a broken sign or flipped bound cannot hide in an all-FALSE or
    all-TRUE report. Margins are per-comparison because equivalence
    margins are METRIC decisions, not statistics.
    Welch machinery verbatim from q_agg_welch_t (six exact moments —
    squared sums in DECIMAL(38,0), the PMI overflow guard — per
    comparison from ONE conditional pass, identical IEEE
    trees, floor-6dp); the z-approximate 1.645 critical value is a
    shared literal on both engines and is documented as the
    large-n form (exact t-quantiles need a distribution table, not
    more data passes). Scale: one scan, two 1-row groups."""
    e = load_table(spark, sf_dir, "events")
    obs = e.where(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "event_type", "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    grp = obs.select(
        F.lit("purchase_vs_click").alias("comparison"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(2)
        .alias("g"),
        "cents",
    ).unionAll(
        obs.where(F.col("event_type") == "purchase").select(
            F.lit("purchase_even_vs_odd").alias("comparison"),
            F.when(F.col("user_id") % 2 == 0, 1).otherwise(2)
            .alias("g"),
            "cents",
        )
    )
    is1 = F.col("g") == 1
    is2 = F.col("g") == 2
    c = F.col("cents")
    m = grp.groupBy("comparison").agg(
        F.sum(is1.cast("long")).cast("long").alias("n1"),
        F.sum(is2.cast("long")).cast("long").alias("n2"),
        F.sum(F.when(is1, c)).cast("long").alias("s1"),
        F.sum(F.when(is2, c)).cast("long").alias("s2"),
        # PMI-overflow class (r7 ADVICE): DECIMAL(38,0) accumulation,
        # one cast to double (ss only feeds the double Welch tree).
        F.sum(F.when(is1, c * c).cast("decimal(38,0)")).cast("double")
        .alias("ss1"),
        F.sum(F.when(is2, c * c).cast("decimal(38,0)")).cast("double")
        .alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1") * 1.0 / n1
    m2 = F.col("s2") * 1.0 / n2
    diff = m1 - m2
    se = F.sqrt(
        (F.col("ss1") * 1.0 / n1 - m1 * m1) * n1 / (n1 - 1) / n1
        + (F.col("ss2") * 1.0 / n2 - m2 * m2) * n2 / (n2 - 1) / n2
    )
    zc = 1.6448536269514722
    d = F.when(
        F.col("comparison") == "purchase_vs_click", F.lit(50.0)
    ).otherwise(F.lit(1000.0))
    t_lo = (diff + d) / se
    t_hi = (diff - d) / se
    return m.select(
        "comparison",
        "n1",
        "n2",
        (F.floor(diff * 10000.0 + 0.5) / 10000.0).alias("diff_cents"),
        (F.floor(t_lo * 1000000.0 + 0.5) / 1000000.0).alias("t_lower"),
        (F.floor(t_hi * 1000000.0 + 0.5) / 1000000.0).alias("t_upper"),
        ((t_lo > zc) & (t_hi < -zc)).alias("equivalent_z90"),
    ).orderBy("comparison")


@query(
    "q_anon_microagg",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, c_custkey) AS rn
      FROM pts
    ),
    blocks AS (
      SELECT (rn - 1) // 5 AS block_id, cents FROM ranked
    )
    SELECT block_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(*) * SUM(cents * cents) - SUM(cents) * SUM(cents)
                AS BIGINT) AS sse_x_n2
    FROM blocks GROUP BY block_id ORDER BY block_id
    """,
    category="2.D",
)
def q_anon_microagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Microaggregation (k=5 fixed-size univariate blocks) — the
    disclosure-control transform that completes the anonymization
    family (k-anonymity / l-diversity / t-closeness / generalization /
    DP counts): sort the sensitive attribute, partition into blocks of
    k, and release per-block aggregates instead of raw values. Output
    per block: n, the exact integer cents sum (the released mean is
    sum/n), and the information-loss term SSE·n² = n·Σx² − (Σx)² —
    exact int64, no division, so negative balances need no signed
    rounding discipline.

    Scale: global ranking via dprefix.two_phase_row_number (range
    exchange + local window + broadcast offsets — no partition-less
    window, audit-clean), then one hash-agg on block_id. At 100 TB the
    same plan microaggregates any numeric column in two exchanges."""
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_row_number,
    )

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    ranked = two_phase_row_number(
        pts, [("cents", True), ("c_custkey", True)], rn="rn"
    )
    blocks = ranked.select(
        F.expr("(rn - 1) div 5").alias("block_id"), "cents"
    )
    return (
        blocks.groupBy("block_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
            (
                F.count("*") * F.sum(F.col("cents") * F.col("cents"))
                - F.sum("cents") * F.sum("cents")
            ).alias("sse_x_n2"),
        )
        .orderBy("block_id")
    )


@query(
    "q_anon_suppression",
    oracle="""
    WITH lv AS (
      SELECT c_custkey,
             CAST(0 AS INTEGER) AS level,
             c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR) || '|'
               || CAST(CAST(floor(c_acctbal / 100) AS BIGINT) AS VARCHAR)
               AS qi
      FROM customer
      UNION ALL
      SELECT c_custkey, 1,
             c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR) || '|'
               || CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR)
      FROM customer
      UNION ALL
      SELECT c_custkey, 2,
             c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR)
      FROM customer
    ),
    g AS (
      SELECT level, qi, CAST(COUNT(*) AS BIGINT) AS n
      FROM lv GROUP BY level, qi
    ),
    lad AS (
      SELECT level,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
               AS n_suppressed,
             CAST((2 * SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 10000
                   + SUM(n)) // (2 * SUM(n)) AS BIGINT) AS supp_bp
      FROM g GROUP BY level
    )
    SELECT level, n_classes, n_suppressed, supp_bp,
           supp_bp <= 500 AND COALESCE(SUM(CASE WHEN supp_bp <= 500
                                               THEN 1 END)
               OVER (ORDER BY level
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) = 0 AS chosen
    FROM lad ORDER BY level
    """,
    category="2.D",
)
def q_anon_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity SUPPRESSION ladder — the audit behind the release
    decision q_anon_kanonymity only flags: walk a 3-level
    generalization ladder over the quasi-identifier (mktsegment,
    nationkey, acctbal band: $100 bands → $1000 bands → attribute
    dropped), count at each level the rows living in classes of size
    < k=5 (the rows record-suppression would delete), and mark the
    FIRST level whose suppression rate meets the 5% (500 bp) release
    budget. This is the Datafly/Samarati trade made measurable:
    generalize more and suppress less, with the ladder itself as the
    release artifact.

    Scale shape: three hash aggs over one scan each (the UNION ALL of
    generalization levels is a projection fan-out, no join, no
    shuffle beyond the per-level group-by on the bounded QI domain);
    the ladder relation is |levels| rows, the window that picks the
    first qualifying level runs on 3 rows. Suppression rate is an
    exact round-half-up basis-point division; no float anywhere."""
    c = load_table(spark, sf_dir, "customer")
    qi0 = F.concat_ws(
        "|", "c_mktsegment", F.col("c_nationkey").cast("string"),
        F.floor(F.col("c_acctbal") / 100).cast("long").cast("string"),
    )
    qi1 = F.concat_ws(
        "|", "c_mktsegment", F.col("c_nationkey").cast("string"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").cast("string"),
    )
    qi2 = F.concat_ws(
        "|", "c_mktsegment", F.col("c_nationkey").cast("string")
    )
    lv = (
        c.select(F.lit(0).cast("int").alias("level"), qi0.alias("qi"))
        .unionByName(
            c.select(F.lit(1).cast("int").alias("level"), qi1.alias("qi"))
        )
        .unionByName(
            c.select(F.lit(2).cast("int").alias("level"), qi2.alias("qi"))
        )
    )
    g = lv.groupBy("level", "qi").agg(F.count("*").alias("n"))
    lad = g.groupBy("level").agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
        .cast("long").alias("n_suppressed"),
        F.expr(
            "CAST((2 * SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 10000"
            " + SUM(n)) DIV (2 * SUM(n)) AS BIGINT)"
        ).alias("supp_bp"),
    )
    w_prev = (
        Window.orderBy("level")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        lad.select(
            "level", "n_classes", "n_suppressed", "supp_bp",
            (
                (F.col("supp_bp") <= 500)
                & (
                    F.coalesce(
                        F.sum(
                            F.when(F.col("supp_bp") <= 500, 1)
                        ).over(w_prev),
                        F.lit(0),
                    )
                    == 0
                )
            ).alias("chosen"),
        )
        .orderBy("level")
    )
