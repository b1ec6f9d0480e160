"""JSON / map function families (SURVEY.md §2.H: q_map_funcs, q_json_funcs).

The Kinesis record body is JSON (`events.props`); this is the schema-on-read
surface the reference architecture lives on. All parsing is JVM-side
(from_json / get_json_object — codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS keys_joined,
           json_extract(props, '$.k')::INT AS k_val,
           len(json_keys(props))::INT AS n_keys
    FROM events
    """,
    category="2.H",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → MapType, then map_keys / element_at / size — the dynamic-
    keys view of the JSON payload (vs the fixed-schema view in
    q_source_json_props)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_joined"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_keys"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           json_extract(props, '$.k')::INT AS k_int,
           json_extract_string(props, '$.missing') AS absent
    FROM events
    """,
    category="2.H",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object (string out), typed extraction via from_json, and a
    missing-path probe (NULL on both engines)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


@query(
    "q_cast_variant",
    oracle="""
    WITH v AS (
      SELECT event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             json_extract(props, '$.missing') AS absent
      FROM events
    )
    SELECT k % 10 AS band,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(COUNT(absent) AS BIGINT) AS n_absent
    FROM v GROUP BY 1 ORDER BY 1
    """,
    category="2.H",
)
def q_cast_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4's semi-structured type): props parses
    ONCE into a VARIANT value — the open-schema landing format for
    JSON whose shape isn't known at write time — and fields extract
    with TYPED `variant_get` (no per-access string re-parse, unlike
    get_json_object) plus `try_variant_get` for a missing path (NULL,
    never error). The oracle is DuckDB's native JSON extraction — the
    semantics VARIANT must preserve. Banded integer aggregates pin the
    typed extraction end to end.

    Scale: VARIANT stores a parsed binary encoding, so N field reads
    cost one parse — the reason lakehouses land semi-structured
    columns as VARIANT instead of strings; extraction is
    scan-adjacent, the agg is one exchange."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_id", F.parse_json("props").alias("pv")
    ).select(
        "event_id",
        F.expr("variant_get(pv, '$.k', 'bigint')").alias("k"),
        F.expr("try_variant_get(pv, '$.missing', 'string')").alias(
            "absent"
        ),
    )
    return (
        v.groupBy((F.col("k") % 10).alias("band"))
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.count("absent").alias("n_absent"),
        )
        .orderBy("band")
    )


@query(
    "q_xml_funcs",
    oracle="""
    SELECT event_id,
           event_type AS xml_type,
           CAST(round(value * 100) AS BIGINT) AS xml_cents,
           event_type AS struct_type,
           CAST(round(value * 100) AS BIGINT) AS struct_cents
    FROM events
    WHERE event_type IN ('signup', 'error') AND event_id % 20 = 7
    ORDER BY event_id
    """,
    category="2.H",
)
def q_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scalar-function family (Spark 4 `to_xml` / `from_xml` /
    `xpath_*`) — the third semi-structured codec next to JSON and CSV:
    each event serializes to an XML fragment with to_xml(struct(…)),
    then comes back TWO independent ways — XPath point extraction
    (xpath_string / the xpath_long list form) and full from_xml parsing
    into a typed struct. The oracle is the plain projection of the
    source columns: matching both extraction paths proves the
    serialize→parse loop is lossless and the two readers agree with
    each other. DuckDB has no XML type, which is exactly why the oracle
    pins the ROUNDTRIP rather than the wire format. Scale: all three
    are codegen'd JVM expressions (no UDF boundary); from_xml with an
    explicit schema is the bulk path — per-field xpath re-parses the
    document per call, so wide extractions should parse once into a
    struct, which is the shape this rung demonstrates. Row count is
    bounded to a deterministic 1-in-20 slice: per-document XML parsing
    costs ~100 µs/row regardless of engine (measured 13.9 s on the full
    40k-row filter at sf0.1), and the rung certifies the CODEC, not
    bulk throughput — bulk semi-structured ingest belongs to the JSON
    and parquet paths."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "error")
        & (F.col("event_id") % 20 == 7)
    )
    xml = e.select(
        "event_id",
        F.to_xml(
            F.struct(
                F.col("event_type").alias("etype"),
                F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            )
        ).alias("doc"),
    )
    parsed = xml.select(
        "event_id",
        F.xpath_string(F.col("doc"), F.lit("/ROW/etype")).alias("xml_type"),
        F.xpath(F.col("doc"), F.lit("/ROW/cents/text()"))
        .getItem(0).cast("bigint").alias("xml_cents"),
        F.from_xml(
            F.col("doc"), "etype STRING, cents BIGINT"
        ).alias("s"),
    )
    return parsed.select(
        "event_id", "xml_type", "xml_cents",
        F.col("s.etype").alias("struct_type"),
        F.col("s.cents").alias("struct_cents"),
    ).orderBy("event_id")


@query(
    "q_json_variant_explode",
    oracle="""
    WITH p AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cents)
                - 1 AS BIGINT) AS pos,
           cents
    FROM p
    ORDER BY user_id, pos
    """,
    category="2.H",
)
def q_json_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT SHREDDING round-trip (`variant_explode`, Spark 4) — the
    table-function half of the VARIANT surface q_cast_variant opened
    with scalar variant_get: each user's purchase cents pack into a
    JSON array string, parse ONCE into a VARIANT, and the LATERAL
    variant_explode shreds it back to (pos, element) rows with the
    element extracted TYPED. The oracle is the rows the pipeline
    started from (pos = rank within the sorted array), so the match
    certifies the whole encode → parse → explode → typed-get cycle
    loses nothing — ordering, multiplicity, or type. This is the
    open-schema landing pattern at 100 TB: arrays of unknown shape
    land as VARIANT (binary-encoded, parsed once at ingest — not
    get_json_object re-parsing the string per access), and shredding
    is a LATERAL generator that fans out row-parallel, exactly like
    posexplode over native arrays (which remains the faster path
    when the schema IS known at write time — VARIANT buys schema
    freedom, not speed)."""
    e = load_table(spark, sf_dir, "events")
    packed = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.concat(
                F.lit("["),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.round(F.col("value") * 100)
                                .cast("bigint")
                            )
                        ),
                        lambda x: x.cast("string"),
                    ),
                ),
                F.lit("]"),
            ).alias("arr_json")
        )
    )
    packed.createOrReplaceTempView("ve_packed")
    return spark.sql(
        """
        SELECT p.user_id,
               CAST(x.pos AS BIGINT) AS pos,
               variant_get(x.value, '$', 'bigint') AS cents
        FROM (SELECT user_id, parse_json(arr_json) AS var
              FROM ve_packed) p,
             LATERAL variant_explode(p.var) AS x
        ORDER BY p.user_id, pos
        """
    )
