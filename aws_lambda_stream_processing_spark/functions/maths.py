"""Math / conditional / cast function families (SURVEY.md §2.H: q_math_*,
q_cond_funcs, q_cast_types).

Parity traps handled:
  - floor/ceil: Spark returns BIGINT, DuckDB DOUBLE → oracle casts;
  - exp/ln/log10/pow are libm-dependent (not IEEE-correctly-rounded) →
    rounded to 4 decimals on both sides; sqrt IS correctly rounded → exact;
  - double→int casts: Spark truncates, DuckDB rounds → only applied to
    integral doubles (l_quantity) where both agree;
  - mod on negative operands differs in sign convention → operands here are
    non-negative (SURVEY §2.H note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.parity import fround
from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_math_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS ab,
           floor(l_extendedprice)::BIGINT AS fl,
           ceil(l_extendedprice)::BIGINT AS ce,
           sqrt(l_quantity) AS sq,
           floor(exp(l_discount) * 10000.0 + 0.5) / 10000.0 AS ex,
           floor(ln(l_quantity) * 10000.0 + 0.5) / 10000.0 AS ln_q,
           floor(log10(l_quantity) * 10000.0 + 0.5) / 10000.0 AS lg,
           floor(pow(l_quantity, 2) * 10000.0 + 0.5) / 10000.0 AS pw,
           l_quantity % 7 AS md,
           sign(l_discount - 0.05)::DOUBLE AS sg
    FROM lineitem
    """,
    category="2.H",
)
def q_math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/round/floor/ceil/sqrt/exp/ln/log10/pow/mod/sign family. The
    4-decimal normalizations use fround (floor-form rounding; operands all
    positive here) — Spark's round() is BigDecimal-per-row, 3× slower."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.sqrt("l_quantity").alias("sq"),
        fround(F.exp("l_discount"), 4, "ex"),
        fround(F.log("l_quantity"), 4, "ln_q"),
        fround(F.log10("l_quantity"), 4, "lg"),
        fround(F.pow("l_quantity", F.lit(2)), 4, "pw"),
        (F.col("l_quantity") % 7).alias("md"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
    )


@query(
    "q_math_misc",
    oracle="""
    SELECT c_custkey,
           greatest(c_acctbal, 1000.0) AS gr,
           least(c_acctbal, 1000.0) AS le,
           (c_custkey // 10) AS idiv,
           (c_custkey % 7) AS pm
    FROM customer
    """,
    category="2.H",
)
def q_math_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greatest/least, integer division, pmod (≡ % for the non-negative keys
    used here — sign conventions differ on negatives, so we don't feed any)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.greatest(F.col("c_acctbal"), F.lit(1000.0)).alias("gr"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("le"),
        F.expr("c_custkey div 10").alias("idiv"),
        F.pmod(F.col("c_custkey"), F.lit(7)).alias("pm"),
    )


@query(
    "q_cond_funcs",
    oracle="""
    SELECT c.c_custkey,
           coalesce(o.o_totalprice, 0.0) AS co,
           nullif(c.c_mktsegment, 'BUILDING') AS ni,
           coalesce(o.o_orderkey, -1) AS nv,
           CASE WHEN o.o_orderkey IS NULL THEN 'none' ELSE 'has' END AS iff
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
    category="2.H",
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/nvl/if over manufactured NULLs (selective left join —
    the corpus itself is NULL-free per FIXTURES.md)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000), "left"
    )
    return joined.select(
        "c_custkey",
        F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("co"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("ni"),
        F.nvl(F.col("o_orderkey"), F.lit(-1)).alias("nv"),
        F.when(F.col("o_orderkey").isNull(), "none").otherwise("has").alias("iff"),
    )


@query(
    "q_cast_types",
    oracle="""
    SELECT l_orderkey,
           l_quantity::INTEGER AS qi,
           l_orderkey::VARCHAR AS ks,
           l_orderkey::DOUBLE AS kd,
           l_shipdate::DATE::TIMESTAMP AS ship_day,
           TRY_CAST(l_returnflag AS INTEGER) AS bad_int,
           TRY_CAST(l_orderkey::VARCHAR AS INTEGER) AS roundtrip
    FROM lineitem
    """,
    category="2.H",
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix int↔double↔string↔timestamp + try_cast (overflow/garbage
    → NULL instead of ANSI error). l_quantity is integral, so Spark's
    truncating and DuckDB's rounding double→int casts agree."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qi"),
        F.col("l_orderkey").cast("string").alias("ks"),
        F.col("l_orderkey").cast("double").alias("kd"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("ship_day"),
        # regex-guard before try_cast: Spark's string→int try_cast failure
        # path is a caught JVM exception per row — on a 100%-non-numeric
        # column that's an exception storm (measured 9.5 s for 600k rows
        # vs 0.3 s guarded). Same NULL-on-garbage semantics.
        F.when(
            F.col("l_returnflag").rlike(r"^-?[0-9]+$"),
            F.col("l_returnflag").try_cast("int"),
        ).alias("bad_int"),
        F.col("l_orderkey").cast("string").try_cast("int").alias("roundtrip"),
    )


# --- round-2 function families ---------------------------------------------


@query(
    "q_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256
    FROM documents
    """,
    category="2.H",
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash family: md5 / sha256 of the document body. These
    are standards, so the cross-engine check is bit-exact by definition —
    the content-addressing primitives every exact-dedup and
    cache-key pipeline builds on (q_llm_exact_dedup hashes with sha2 for
    precisely this reason). Pure per-row scan, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    )


@query(
    "q_bitwise_funcs",
    oracle="""
    SELECT event_id,
           event_id & 255 AS b_and,
           event_id | 4096 AS b_or,
           xor(event_id, 1365) AS b_xor,
           CAST(event_id << 3 AS BIGINT) AS b_shl,
           event_id >> 2 AS b_shr,
           CAST(bit_count(event_id) AS INTEGER) AS b_pop
    FROM events
    """,
    category="2.H",
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family over int64 ids: and/or/xor, shifts,
    popcount — the building blocks of bitmap indexes, bloom-filter
    membership, and hash mixing. Integer ops are exact on both engines;
    event_id is non-negative so shifts stay in range."""
    e = load_table(spark, sf_dir, "events")
    c = F.col("event_id")
    return e.select(
        "event_id",
        c.bitwiseAND(F.lit(255)).alias("b_and"),
        c.bitwiseOR(F.lit(4096)).alias("b_or"),
        c.bitwiseXOR(F.lit(1365)).alias("b_xor"),
        F.shiftleft(c, 3).alias("b_shl"),
        F.shiftright(c, 2).alias("b_shr"),
        F.bit_count(c).alias("b_pop"),
    )


@query(
    "q_binary_funcs",
    oracle="""
    SELECT doc_id,
           base64(encode(text)) AS b64,
           hex(substring(text, 1, 8)) AS hx,
           CAST(bit_length(text) AS INTEGER) AS bl,
           CAST(octet_length(encode(text)) AS INTEGER) AS ol
    FROM documents WHERE doc_id < 100
    """,
    category="2.H",
)
def q_binary_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding function family: base64, hex, bit/octet length —
    the payload-encoding primitives of the reference architecture
    (Kinesis records arrive base64-encoded in the Lambda event; the
    envelope decode in q_source_kinesis_envelope is this family's
    consumer). RFC 4648 base64 and hex are standards → bit-exact across
    engines — EXCEPT that Spark's base64 uses the Java MIME encoder
    (CRLF every 76 chars) while DuckDB emits unchunked RFC 4648; the
    regexp_replace strips the line breaks to the canonical form."""
    d = load_table(spark, sf_dir, "documents")
    return d.where(F.col("doc_id") < 100).select(
        "doc_id",
        F.regexp_replace(
            F.base64(F.col("text").cast("binary")), "\r\n", ""
        ).alias("b64"),
        F.hex(F.substring("text", 1, 8).cast("binary")).alias("hx"),
        F.bit_length("text").alias("bl"),
        F.octet_length("text").alias("ol"),
    )


@query(
    "q_math_trig",
    oracle="""
    SELECT event_id,
           floor(sin(radians(CAST(event_id % 89 + 1 AS DOUBLE)))
                 * 100000000.0 + 0.5) / 100000000.0 AS sin_v,
           floor(cos(radians(CAST(event_id % 89 + 1 AS DOUBLE)))
                 * 100000000.0 + 0.5) / 100000000.0 AS cos_v,
           floor(atan2(CAST(event_id % 7 + 1 AS DOUBLE),
                       CAST(event_id % 5 + 1 AS DOUBLE))
                 * 100000000.0 + 0.5) / 100000000.0 AS atan2_v,
           floor(degrees(atan(CAST(event_id % 10 AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS deg_atan
    FROM events ORDER BY event_id
    """,
    category="2.H",
)
def q_math_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric function family — sin/cos/atan2/atan plus the
    radians/degrees converters, over deterministic integer-derived
    angles (1..89 degrees keeps every input far from the poles). Trig
    is transcendental: JVM Math and libm disagree in the last ulp for
    some inputs, so every value floor-rounds at 8dp (outputs are
    O(1)-magnitude, law-18 scale) before leaving the row. Pure columnar
    map, zero shuffles."""
    e = load_table(spark, sf_dir, "events")
    deg = (F.col("event_id") % 89 + 1).cast("double")
    r8 = lambda c: F.floor(c * 100000000.0 + F.lit(0.5)) / 100000000.0
    return e.select(
        "event_id",
        r8(F.sin(F.radians(deg))).alias("sin_v"),
        r8(F.cos(F.radians(deg))).alias("cos_v"),
        r8(
            F.atan2(
                (F.col("event_id") % 7 + 1).cast("double"),
                (F.col("event_id") % 5 + 1).cast("double"),
            )
        ).alias("atan2_v"),
        (
            F.floor(
                F.degrees(F.atan((F.col("event_id") % 10).cast("double")))
                * 1000000.0
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("deg_atan"),
    ).orderBy("event_id")


@query(
    "q_try_funcs",
    oracle="""
    SELECT event_id,
           TRY_CAST(props AS BIGINT) AS bad_int,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS good_int,
           CASE WHEN (event_id % 5) = 0 THEN NULL
                ELSE CAST(round(value * 100) AS BIGINT) / (event_id % 5)
           END AS safe_div,
           CAST(TRY_CAST(event_type AS DATE) AS VARCHAR) AS bad_date
    FROM events
    """,
    category="2.H",
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (try_cast / try_divide): malformed
    input yields NULL instead of a task-killing exception — the
    difference between one poison record failing a 100 TB job and one
    NULL flowing to the DLQ path (q_stream_dlq_routing is the routing
    twin; this is the expression-level surface). A JSON blob refuses to
    be an int (NULL), an extracted numeric field succeeds, division by
    a zero denominator yields NULL (both engines' try_divide/NULLIF
    semantics), a word refuses to be a date (NULL). Per-row codegen,
    no shuffle."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "event_id",
        F.try_to_number("props", F.lit("999999")).cast("long").alias(
            "bad_int"
        ),
        F.get_json_object("props", "$.k").try_cast("long").alias("good_int"),
        F.try_divide(cents, F.col("event_id") % 5).alias("safe_div"),
        F.col("event_type").try_cast("date").cast("string").alias("bad_date"),
    )


@query(
    "q_cast_decimal128",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(
               CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
               * CAST(round((1 - l_discount) * 10000) AS BIGINT)
               * CAST(round((1 + l_tax) * 10000) AS BIGINT)
               * 1000
           ) AS DECIMAL(38,0)) AS VARCHAR) AS revenue_units
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    category="2.H",
)
def q_cast_decimal128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-bit exact accumulation — the money-math discipline once a
    sum leaves int64 range: per-item revenue in 10⁻¹¹-dollar units
    (cents × two basis-point factors × 1000 ≈ 10¹⁵ per row) sums past
    2⁶³ at warehouse row counts, so the accumulator must be
    DECIMAL(38,0) — Spark's 128-bit decimal — against DuckDB's
    HUGEINT; rendered as VARCHAR because the certified property is the
    exact digit string, not a float approximation. Every factor is an
    exact integer derived by the same rounding on both engines (the
    2-decimal price and discount/tax rates make round() exact), so any
    divergence anywhere in the 128-bit multiply/accumulate pipeline
    breaks the match. Scale: Spark sums decimals with partial
    aggregation like any numeric — the map-side combine works in
    128-bit unsafe-row slots, no BigInteger boxing until overflow
    WOULD occur, at which point Spark 4's ANSI default raises instead
    of silently wrapping (the non-ANSI int64 wrap is the bug class
    q_scale_rendezvous_shard documents)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc = F.round((1 - F.col("l_discount")) * 10000).cast("bigint")
    tax = F.round((1 + F.col("l_tax")) * 10000).cast("bigint")
    unit = (
        cents.cast("decimal(38,0)") * disc * tax * F.lit(1000)
    ).cast("decimal(38,0)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(unit).cast("decimal(38,0)").cast("string")
            .alias("revenue_units")
        )
        .orderBy("l_returnflag")
    )
